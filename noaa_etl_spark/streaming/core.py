"""Streaming plumbing: fixture tables as file streams, and a helper that
runs a streaming DataFrame to completion into an in-memory sink.

Design: the engine's temporal operators are written once as DataFrame
shapes; the streaming twins apply the *same shape* to
``spark.readStream``. ``availableNow`` processes everything currently in
the directory then stops — which is exactly the semantics a graded/batch
comparison needs, and on a real cluster is the canonical backfill mode.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from noaa_etl_spark.io import normalize_events_ts
from noaa_etl_spark.session import configure_session

_CHECKPOINT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
    "checkpoints",
)

# Last executed micro-batch physical plan per query name, captured after
# every run_to_memory drain. Streaming plans are invisible to the batch
# cost audit (df.explain on the returned memory table shows the SINK
# scan, not the micro-batch pipeline) — this is the hook the streaming
# COSTS gate reads so a stream query gaining a shuffle fails CI.
LAST_STREAM_PLANS: dict[str, str] = {}


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Open one fixture table as a file-source stream.

    Schema is taken from a batch read of the same file (schemas must be
    declared for file streams); the events nanos→micros conversion is
    applied identically to the batch loader so both planes see one
    schema.
    """
    configure_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if name == "events":
        df = normalize_events_ts(df)
    return df


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory table and return that table as a batch DataFrame.

    The checkpoint dir is recreated per run — a stale checkpoint would
    make availableNow see 'no new data' and return an empty table.
    """
    spark = stream_df.sparkSession
    checkpoint = os.path.join(_CHECKPOINT_ROOT, query_name)
    shutil.rmtree(checkpoint, ignore_errors=True)
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # explainInternal on a terminated availableNow query returns the
    # LAST micro-batch's executed physical plan (incremental execution
    # is retained on the query handle) — the only surface that shows
    # streaming Exchange/StateStore nodes.
    try:
        LAST_STREAM_PLANS[query_name] = query._jsq.explainInternal(False)
    except Exception:  # plan capture is an audit aid, never a failure
        LAST_STREAM_PLANS.pop(query_name, None)
    return spark.table(query_name)
