"""As-of join variant tests: each variant checked against a brute-force
(join + window min/max) reference at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.asof import asof_join
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def sides(spark):
    ev = load_table(spark, SF_SMALL, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    build = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("b_user_id"),
        F.col("event_id").alias("b_event_id"),
        F.col("ts").alias("b_ts"),
    )
    return probe, build


def _bruteforce(spark, probe, build, direction: str, strict: bool):
    """Reference: all candidate pairs + pick the extreme ts (ties → the
    same tiebreak rule as asof_join: max b_event_id backward, min
    forward)."""
    if direction == "backward":
        cond = F.col("b_ts") < F.col("ts") if strict else F.col("b_ts") <= F.col("ts")
        order = [F.desc("b_ts"), F.desc("b_event_id")]
    else:
        cond = F.col("b_ts") > F.col("ts") if strict else F.col("b_ts") >= F.col("ts")
        order = [F.asc("b_ts"), F.asc("b_event_id")]
    pairs = probe.join(build, (probe.user_id == build.b_user_id) & cond, "left")
    w = Window.partitionBy("event_id").orderBy(*order)
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    return {
        r["event_id"]: r["b_event_id"]
        for r in ranked.filter(F.col("rn") == 1).collect()
    }


@pytest.mark.parametrize(
    "direction,strict",
    [("backward", False), ("backward", True), ("forward", False), ("forward", True)],
)
def test_asof_matches_bruteforce(spark, sides, direction, strict):
    probe, build = sides
    result = asof_join(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_ts"],
        tiebreak="b_event_id",
        direction=direction,
        strict=strict,
    )
    got = {r["event_id"]: r["b_event_id"] for r in result.collect()}
    want = _bruteforce(probe.sparkSession, probe, build, direction, strict)
    assert got == want


@pytest.mark.parametrize(
    "direction,strict",
    [("backward", False), ("backward", True), ("forward", False), ("forward", True)],
)
def test_asof_null_keys_and_ts_match_sql_semantics(spark, direction, strict):
    """NULL join keys / NULL timestamps must follow SQL ASOF semantics:
    NULL never matches (on either side), but probe rows are retained
    with NULL payload (left as-of). The brute-force reference gets this
    for free from Spark's NULL-rejecting join condition; the windowed
    asof_join must agree (NULL-key build rows would otherwise serve
    NULL-key probes, and NULL-ts build payloads would leak under the
    growing frame)."""
    from datetime import datetime

    def ts(h):
        return None if h is None else datetime(2024, 1, 1, h)

    probe = spark.createDataFrame(
        [
            (1, 10, ts(5)),     # normal
            (2, None, ts(5)),   # NULL key: must keep row, NULL payload
            (3, 10, ts(None)),  # NULL ts: must keep row, NULL payload
            (4, 20, ts(5)),     # key whose build rows are all NULL-ts
            (5, None, ts(None)),
        ],
        "event_id int, user_id int, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (10, 101, ts(4)),
            (10, 102, ts(6)),
            (None, 103, ts(4)),   # NULL key: matches nothing
            (10, 104, ts(None)),  # NULL ts: matches nothing
            (20, 105, ts(None)),
        ],
        "b_user_id int, b_event_id int, b_ts timestamp",
    )
    result = asof_join(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_ts"],
        tiebreak="b_event_id",
        direction=direction,
        strict=strict,
    )
    got = {r["event_id"]: r["b_event_id"] for r in result.collect()}
    want = _bruteforce(spark, probe, build, direction, strict)
    assert got == want
    # every probe row retained
    assert set(got) == {1, 2, 3, 4, 5}
    # NULL-key / NULL-ts probes and NULL-only-build keys got no payload
    for eid in (2, 3, 4, 5):
        assert got[eid] is None


def test_asof_tolerance_nulls_far_matches(spark, sides):
    probe, build = sides
    tol = 3600.0
    result = asof_join(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_ts"],
        tiebreak="b_event_id",
        tolerance_seconds=tol,
    )
    rows = result.collect()
    loose = asof_join(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_ts"],
        tiebreak="b_event_id",
    ).collect()
    loose_by_id = {r["event_id"]: r for r in loose}
    n_nulled = 0
    for r in rows:
        base = loose_by_id[r["event_id"]]
        if base["b_ts"] is None:
            assert r["b_event_id"] is None
            continue
        dist = abs((base["ts"] - base["b_ts"]).total_seconds())
        if dist <= tol:
            assert r["b_event_id"] == base["b_event_id"]
        else:
            assert r["b_event_id"] is None
            n_nulled += 1
    assert n_nulled > 0, "tolerance must actually null some far matches"


def _bruteforce_nearest(spark, probe, build):
    """Reference for nearest: all pairs, ordered by (|d|, backward-first,
    direction-appropriate tiebreak)."""
    pairs = probe.join(build, probe.user_id == build.b_user_id, "left")
    d = F.abs(F.unix_micros("b_ts") - F.unix_micros("ts"))
    direction = F.when(F.col("b_ts") <= F.col("ts"), 0).otherwise(1)
    tb = F.when(
        F.col("b_ts") <= F.col("ts"), -F.col("b_event_id")
    ).otherwise(F.col("b_event_id"))
    w = Window.partitionBy("event_id").orderBy(
        d.asc_nulls_last(), direction.asc_nulls_last(), tb.asc_nulls_last()
    )
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    return {
        r["event_id"]: (r["b_event_id"] if r["ts"] is not None else None)
        for r in ranked.filter(F.col("rn") == 1).collect()
    }


def test_asof_nearest_matches_bruteforce(spark, sides):
    from noaa_etl_spark.operators.asof import asof_join_nearest

    probe, build = sides
    result = asof_join_nearest(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_ts"],
        tiebreak="b_event_id",
    )
    got = {r["event_id"]: r["b_event_id"] for r in result.collect()}
    want = _bruteforce_nearest(probe.sparkSession, probe, build)
    assert got == want and got


def test_asof_nearest_ties_and_nulls(spark):
    """Exact-distance ties go backward; equal-ts ties follow the
    direction tiebreak; NULL keys/ts never match but probe rows are
    retained."""
    from datetime import datetime

    from noaa_etl_spark.operators.asof import asof_join_nearest

    def ts(h, m=0):
        return None if h is None else datetime(2024, 1, 1, h, m)

    probe = spark.createDataFrame(
        [
            (1, 10, ts(5)),    # equidistant builds at 4 and 6 → backward (4)
            (2, 10, ts(4)),    # exact-equal ts ties → max b_event_id
            (3, 10, ts(7)),    # nearest is forward (8) vs backward (6)
            (4, None, ts(5)),  # NULL key
            (5, 10, ts(None)), # NULL ts
            (6, 30, ts(5)),    # no build rows for key
        ],
        "event_id int, user_id int, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (10, 101, ts(4)),
            (10, 109, ts(4)),   # equal-ts twin: backward tie → max id = 109
            (10, 102, ts(6)),
            (10, 103, ts(8)),
            (10, 104, ts(7, 30)),  # 30 min after probe 3 → true nearest
            (None, 105, ts(5)),    # NULL build key matches nothing
            (10, 106, ts(None)),   # NULL build ts matches nothing
        ],
        "b_user_id int, b_event_id int, b_ts timestamp",
    )
    result = asof_join_nearest(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_ts"],
        tiebreak="b_event_id",
    )
    got = {r["event_id"]: r["b_event_id"] for r in result.collect()}
    assert got == {1: 109, 2: 109, 3: 104, 4: None, 5: None, 6: None}


def test_asof_null_payload_field_does_not_backfill(spark):
    """The matched build row must travel WHOLE: when the nearest build
    row has a NULL in one payload column, that column must come out
    NULL — never silently back-filled from an older build row
    (the payload is carried as one struct, not per-column lasts)."""
    from datetime import datetime

    from noaa_etl_spark.operators.asof import asof_join_nearest

    def ts(h):
        return datetime(2024, 1, 1, h)

    probe = spark.createDataFrame(
        [(1, 10, ts(5))], "event_id int, user_id int, ts timestamp"
    )
    build = spark.createDataFrame(
        [
            (10, 101, "old-label", ts(1)),   # far, fully populated
            (10, 102, None, ts(4)),          # nearest — label is NULL
        ],
        "b_user_id int, b_event_id int, b_label string, b_ts timestamp",
    )
    # backward join: nearest row (102) wins; its NULL label must stay NULL
    backward = asof_join(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_label", "b_ts"],
        tiebreak="b_event_id",
    ).collect()[0]
    assert backward["b_event_id"] == 102
    assert backward["b_label"] is None, "NULL payload field back-filled from an older build row"
    # nearest join: same contract through the two-direction pick
    nearest = asof_join_nearest(
        probe=probe,
        build=build,
        probe_keys=["user_id"],
        build_keys=["b_user_id"],
        probe_ts="ts",
        build_ts="b_ts",
        build_payload=["b_event_id", "b_label", "b_ts"],
        tiebreak="b_event_id",
    ).collect()[0]
    assert nearest["b_event_id"] == 102
    assert nearest["b_label"] is None
