"""Streaming-plane tests beyond the graded queries: file sink, state
carry-over across real micro-batches, and batch/stream equivalence."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.streaming.core import run_to_memory, stream_table
from tests.conftest import SF_SMALL, TMP_ROOT


def test_stream_file_sink(spark, tmp_dir):
    """writeStream → parquet files (the stream_sink surface): the
    written dataset must equal the batch content."""
    out = os.path.join(tmp_dir, "out")
    checkpoint = os.path.join(tmp_dir, "ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(checkpoint, ignore_errors=True)
    ev = stream_table(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.parquet(out)
    batch = load_table(spark, SF_SMALL, "events")
    assert written.count() == batch.count()
    assert {r["event_id"] for r in written.select("event_id").collect()} == {
        r["event_id"] for r in batch.select("event_id").collect()
    }


def test_stateful_state_carries_across_microbatches(spark, tmp_dir):
    """Split events into 3 files and stream with maxFilesPerTrigger=1 so
    the state machine really runs over multiple micro-batches; final
    per-user counts must equal the batch groupBy."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = os.path.join(tmp_dir, "src")
    shutil.rmtree(src, ignore_errors=True)
    ev = load_table(spark, SF_SMALL, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def counter(key, pdfs, state):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    st = stream.groupBy("user_id").applyInPandasWithState(
        counter,
        "user_id bigint, n_events bigint",
        "n bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    result = run_to_memory(st, "mem_multibatch_state", "update")
    # More output rows than users proves multiple micro-batches ran.
    n_users = ev.select("user_id").distinct().count()
    assert result.count() > n_users, "expected multiple update emissions per user"
    final = (
        result.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    expected = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["user_id"]: r["n_events"] for r in final} == expected


def test_stream_tumbling_equals_batch(spark):
    """The streaming twin must produce exactly the batch result over the
    same files (complete mode, availableNow)."""
    ev_stream = stream_table(spark, SF_SMALL, "events").withWatermark("ts", "1 hour")
    agg = ev_stream.groupBy(F.window("ts", "10 minutes").alias("win")).agg(
        F.count(F.lit(1)).alias("n")
    )
    streamed = run_to_memory(agg, "mem_equiv_tumbling", "complete")
    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "10 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = {(r["win"]["start"], r["n"]) for r in streamed.collect()}
    b = {(r["win"]["start"], r["n"]) for r in batch.collect()}
    assert s == b
