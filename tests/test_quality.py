"""Tests for the data-quality assertion operator and the foreachBatch
incremental-maintenance pattern (streaming loads folding into rollup
state that always equals a from-scratch recompute)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.incremental import agg_state, finalize, merge_states
from noaa_etl_spark.operators.quality import DataQualityError, expect
from noaa_etl_spark.streaming.core import stream_table
from tests.conftest import SF_SMALL


def test_expect_passes_and_chains(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = expect(
        docs,
        {
            "doc_id_non_null": F.col("doc_id").isNotNull(),
            "n_chars_consistent": F.length("text") == F.col("n_chars"),
            "lang_known": F.col("lang").isin("en", "es", "de", "fr", "zh"),
        },
    )
    assert out.count() == docs.count()


def test_expect_raises_with_counts(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(DataQualityError) as err:
        expect(
            docs,
            {
                "always_ok": F.col("doc_id").isNotNull(),
                "impossible": F.col("n_chars") < 0,
                "mostly_false": F.col("lang") == "en",
            },
        )
    assert "impossible" in err.value.failures
    assert err.value.failures["impossible"] == docs.count()
    assert "mostly_false" in err.value.failures
    assert "always_ok" not in err.value.failures


def test_expect_tolerance(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    n_non_en = docs.filter(F.col("lang") != "en").count()
    # Tolerating exactly that many violations must pass.
    expect(docs, {"lang_en": F.col("lang") == "en"}, max_violations=n_non_en)
    with pytest.raises(DataQualityError):
        expect(docs, {"lang_en": F.col("lang") == "en"}, max_violations=n_non_en - 1)


def test_foreachbatch_incremental_maintenance(spark, tmp_dir):
    """Stream events through foreachBatch, folding each micro-batch into
    persisted rollup state; the final state must equal a from-scratch
    batch aggregate — the incremental-ETL load pattern end-to-end."""
    state_path = os.path.join(tmp_dir, "state")
    src_path = os.path.join(tmp_dir, "src")
    checkpoint = os.path.join(tmp_dir, "ckpt")
    for p in (state_path, src_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)

    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "fv", F.floor("value").cast("bigint")
    )
    ev.select("event_type", "fv").repartition(3).write.parquet(src_path)
    schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_path)
    )

    def fold(batch_df, batch_id):
        new_state = agg_state(batch_df, ["event_type"], "fv")
        if os.path.exists(state_path):
            old_state = batch_df.sparkSession.read.parquet(state_path)
            merged = merge_states(old_state, new_state)
        else:
            merged = new_state
        # localCheckpoint decouples from the incoming micro-batch plan so
        # the overwrite below cannot read-from-while-writing-to the path.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_path)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["event_type"], r["n_rows"], r["total"], r["min_value"], r["max_value"])
        for r in finalize(spark.read.parquet(state_path)).collect()
    }
    want = {
        (r["event_type"], r["n_rows"], r["total"], r["min_value"], r["max_value"])
        for r in (
            ev.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("fv").alias("total"),
                F.min("fv").alias("min_value"),
                F.max("fv").alias("max_value"),
            )
            .collect()
        )
    }
    assert got == want


def test_incremental_avg_ignores_nulls_like_spark_avg(spark):
    """finalize's avg must divide by the non-null value count (F.avg
    semantics), not the row count — fold == recompute on NULL-bearing
    columns."""
    rows = [("a", 10.0), ("a", None), ("a", 20.0), ("b", None), ("b", 4.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    old = df.filter(F.col("v").isNotNull() | F.col("k").eqNullSafe(F.lit("b")))
    delta = df.exceptAll(old)
    folded = finalize(merge_states(agg_state(old, ["k"], "v"), agg_state(delta, ["k"], "v")))
    recompute = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("total"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
        F.avg("v").alias("avg_value"),
    )
    f = {tuple(r) for r in folded.collect()}
    r = {tuple(r) for r in recompute.collect()}
    assert f == r


def test_incremental_all_null_group_yields_null_not_ansi_error(spark):
    """An all-NULL value group must finalize to NULL avg/mean/var/std —
    not throw DIVIDE_BY_ZERO under the pinned ANSI mode (ADVICE r6)."""
    from noaa_etl_spark.operators.incremental import (
        finalize_stats,
        merge_stats_states,
        stats_state,
    )

    rows = [("a", None), ("a", None), ("b", 4)]
    df = spark.createDataFrame(rows, "k string, v bigint")
    folded = finalize(merge_states(agg_state(df, ["k"], "v")))
    by_k = {r["k"]: r for r in folded.collect()}
    assert by_k["a"]["n_rows"] == 2 and by_k["a"]["avg_value"] is None
    assert by_k["b"]["avg_value"] == 4.0

    stats = finalize_stats(merge_stats_states(stats_state(df, ["k"], "v")))
    by_k = {r["k"]: r for r in stats.collect()}
    assert by_k["a"]["mean_value"] is None and by_k["a"]["var_pop"] is None
    assert by_k["a"]["std_pop"] is None
    assert by_k["b"]["mean_value"] == 4.0 and by_k["b"]["var_pop"] == 0.0


def test_linear_trend_single_day_group_yields_null_slope(spark, monkeypatch, tmp_path):
    """An event_type seen on exactly one distinct day has a zero
    least-squares denominator: slope/intercept must be NULL, not an
    ANSI DIVIDE_BY_ZERO abort (ADVICE r6). Synthesizes a one-day-only
    type alongside a normal one via a temp events table."""
    import pandas as pd_mod

    from noaa_etl_spark.queries.etl import q_linear_trend

    ts0 = pd_mod.Timestamp("2024-01-01 06:00:00")
    rows = [
        ("only_day", ts0, 1.00, 1, "{}"),
        ("only_day", ts0 + pd_mod.Timedelta(hours=1), 2.00, 1, "{}"),
        ("normal", ts0, 1.00, 2, "{}"),
        ("normal", ts0 + pd_mod.Timedelta(days=1), 3.00, 2, "{}"),
    ]
    pdf = pd_mod.DataFrame(
        rows, columns=["event_type", "ts", "value", "user_id", "props"]
    )
    pdf["event_id"] = range(len(pdf))
    out = str(tmp_path / "sf_tiny")
    import os

    os.makedirs(out, exist_ok=True)
    pdf.to_parquet(os.path.join(out, "events.parquet"), index=False)
    got = {r["event_type"]: r for r in q_linear_trend(spark, out).collect()}
    assert got["only_day"]["n_days"] == 1
    assert got["only_day"]["slope_cents_per_day"] is None
    assert got["only_day"]["intercept_cents"] is None
    assert got["normal"]["slope_cents_per_day"] == 200.0


def test_observe_quality_rides_the_action(spark, tmp_path):
    """observe_quality must deliver violation counts as a side effect of
    the sink write — no second scan — and flag violations post-action."""
    from noaa_etl_spark.operators.quality import assert_observed, observe_quality

    docs = load_table(spark, SF_SMALL, "documents")
    observed, obs = observe_quality(
        docs,
        {
            "doc_id_non_null": F.col("doc_id").isNotNull(),
            "n_chars_consistent": F.length("text") == F.col("n_chars"),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = assert_observed(obs)
    assert got["__total"] == docs.count()
    assert got["doc_id_non_null"] == 0

    observed2, obs2 = observe_quality(
        docs, {"impossible": F.col("n_chars") < 0}, name="q2"
    )
    observed2.write.mode("overwrite").parquet(str(tmp_path / "out2"))
    with pytest.raises(DataQualityError, match="impossible"):
        assert_observed(obs2)


def test_quality_gate_rules_discriminate(spark):
    """Each gate rule must actually drop documents at fixture scale —
    a rule that passes everything is a threshold bug, not a gate."""
    from noaa_etl_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q_quality_gate"](spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    for rule in ("r_len", "r_word_len", "r_stop"):
        failed = sum(0 if r[rule] else 1 for r in rows)
        assert 0 < failed < n, f"{rule} drops {failed}/{n} (non-discriminating)"
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < n


def test_repetition_filter_discriminates_and_is_consistent(spark):
    """keep must be exactly the advertised integer inequality, and both
    thresholds must bite at fixture scale."""
    from noaa_etl_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q_repetition_filter"](spark, SF_DIR).collect()
    assert len(rows) > 0
    dropped = [r for r in rows if not r["keep"]]
    assert 0 < len(dropped) < len(rows)
    for r in rows:
        word_ok = r["top_word_cnt"] * 8 <= r["n_tokens"]
        # keep implies the word-side inequality (bigram side is not
        # re-derivable from the report alone)
        if r["keep"]:
            assert word_ok
        # a doc failing the word rule can never be kept
        if not word_ok:
            assert not r["keep"]
    # top_word_cnt can never exceed n_tokens
    assert all(r["top_word_cnt"] <= r["n_tokens"] for r in rows)


def test_corpus_shuffle_shard_is_deterministic_partition(spark):
    """Shards partition the corpus exactly (counts sum to |docs|) and
    re-running yields the identical assignment (pure function of the
    key, no RNG state)."""
    from noaa_etl_spark.queries import QUERIES
    from tests.conftest import SF_DIR
    from noaa_etl_spark.io import load_table

    a = {r["shard"]: r for r in QUERIES["q_corpus_shuffle_shard"](spark, SF_DIR).collect()}
    b = {r["shard"]: r for r in QUERIES["q_corpus_shuffle_shard"](spark, SF_DIR).collect()}
    assert a.keys() == b.keys() == set(range(8))
    for s in a:
        assert a[s] == b[s]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in a.values()) == n_docs


def test_blocklist_folds_leetspeak(spark):
    """Obfuscated terms must fold to their canonical form and get
    flagged: 'v3ct0r' -> 'vector', '$p4rk' -> 'spark'; clean text with
    no term passes."""
    from noaa_etl_spark.queries.text import (
        BLOCKLIST_TERMS,
        _LEET_FROM,
        _LEET_TO,
    )
    from pyspark.sql import functions as F

    assert len(_LEET_FROM) == len(_LEET_TO)
    docs = spark.createDataFrame(
        [
            (1, "a V3CT0R walks into a bar"),
            (2, "pure $p4rk obfuscation"),
            (3, "wind0w shopping"),  # 0->o folds (1 folds to l, not i)
            (4, "nothing to see here"),
        ],
        "doc_id bigint, text string",
    )
    nt = F.translate(F.lower(F.col("text")), _LEET_FROM, _LEET_TO)
    flagged = {
        r["doc_id"]: r["hits"]
        for r in docs.select(
            "doc_id",
            F.filter(
                F.array(*[F.lit(t) for t in BLOCKLIST_TERMS]),
                lambda t: F.contains(nt, t),
            ).alias("hits"),
        ).collect()
    }
    assert flagged[1] == ["vector"]
    assert flagged[2] == ["spark"]
    assert flagged[3] == ["window"]
    assert flagged[4] == []
