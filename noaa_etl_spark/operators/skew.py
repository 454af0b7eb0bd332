"""Skew mitigation: salted two-phase aggregation and salted broadcast
join — the explicit recipes for keys too hot even for AQE's skew-join
splitting (SURVEY.md §4).

When to reach for these at 100 TB:

- ``salted_agg``: groupBy on a low-cardinality / power-law key (e.g.
  event_type, a celebrity user_id). Phase 1 aggregates (key, salt) so
  the hot key's rows spread over B reducers; phase 2 merges the B
  partials per key. Works for any algebra whose partial results merge
  (sum/count/min/max and anything built from them).
- ``replicated_broadcast_join``: a large fact joined to a *medium* dim
  too big to broadcast whole but with a few hot keys: split the dim,
  broadcast the hot-key slice, shuffle-join the cold remainder, union.
  (AQE's skew split covers most cases; this is the manual override.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: {output_name: (fn, input_col)} with fn ∈ sum/count/min/max.
    ``salt_col``: any roughly-uniform existing column; the salt is
    ``pmod(xxhash64(salt_col), buckets)`` — deterministic, no RNG.

    Result is identical to ``df.groupBy(keys).agg(...)``; only the
    shuffle layout changes (hot key fan-out bounded by ``buckets``).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("__salt")

    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        if fn not in _MERGEABLE and fn != "count":
            raise ValueError(f"{fn} is not mergeable; salted_agg supports {sorted(_MERGEABLE)}")
        partial = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        phase1_aggs.append(partial.alias(f"__p_{out}"))

    partials = df.groupBy(*keys, salt).agg(*phase1_aggs)

    phase2_aggs = []
    for out, (fn, _col) in aggs.items():
        merge = _MERGEABLE[fn]
        phase2_aggs.append(merge(f"__p_{out}").alias(out))
    return partials.groupBy(*keys).agg(*phase2_aggs)


def replicated_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_keys: list,
    how: str = "inner",
) -> DataFrame:
    """Hot/cold split join: broadcast the dim rows for ``hot_keys``;
    shuffle-join everything else; union the two result legs. Columns of
    both legs are aligned by name."""
    # NULL keys must survive the split: ~isin(...) is NULL (not true) for
    # NULL keys, which would silently drop those rows from BOTH legs —
    # under how='left' that loses fact rows a plain join would keep.
    # Route them to the cold leg (an equi-join never matches NULL anyway).
    hot_dim = dim.filter(F.col(dim_key).isin(hot_keys))
    cold_dim = dim.filter(F.col(dim_key).isNull() | ~F.col(dim_key).isin(hot_keys))
    hot_fact = fact.filter(F.col(fact_key).isin(hot_keys))
    cold_fact = fact.filter(F.col(fact_key).isNull() | ~F.col(fact_key).isin(hot_keys))

    hot = hot_fact.join(F.broadcast(hot_dim), hot_fact[fact_key] == hot_dim[dim_key], how)
    cold = cold_fact.join(cold_dim, cold_fact[fact_key] == cold_dim[dim_key], how)
    return hot.unionByName(cold)


def salted_shuffle_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    salt_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt-replicated shuffle join — the big×big skew join for when
    NEITHER side broadcasts and the hot key is too hot even for AQE's
    skew split (or AQE can't see stats at all: checkpoint scans carry
    none — the r9 basket_lift lesson).

    The fact side gains a deterministic salt (``pmod(xxhash64(salt_col),
    buckets)`` — no RNG, rerun-stable); the build side is replicated
    ×``buckets`` via one explode. The join key becomes (key, salt), so a
    celebrity key's fact rows spread over ``buckets`` reducers instead
    of melting one task, at the cost of shuffling the build side
    ``buckets`` times — profitable exactly when build ≪ fact/buckets,
    the usual medium-dim × skewed-fact regime. Results are identical to
    the plain join: every fact row carries exactly ONE salt and meets
    exactly one replica of each matching build row (``how='left'`` keeps
    that property; full/right outer would duplicate unmatched build
    rows per salt and are rejected).

    When to reach for it — MEASURED dispatch rule (SCALING.md r11,
    25%-hot key, AQE on): salted won 0.86×/0.75× at 10×/100× but LOST
    1.4× at 1000×, where the executed plan shows
    ``ShuffledHashJoin(skew=true)`` — AQE's OptimizeSkewedJoin only
    triggers once the hot partition crosses its advisory-size
    thresholds, and wherever it CAN act it beats manual salting. Salt
    for: (a) the mid-regime where the hot partition hurts wall-clock
    but sits under AQE's trigger sizes, (b) stats-free checkpoint
    scans, (c) plans where a same-key window/agg downstream
    re-concentrates AQE's sub-splits onto one reducer anyway.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_shuffle_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    f = fact.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(buckets)]))
    )
    # The shuffle_hash hint rides the BUILD side: Spark hashes the
    # hinted relation, and hashing the fact side dies on the hot
    # partition at scale (measured at 100×: "Can't acquire … bytes to
    # build hash relation" building a 15M-row fact partition). The
    # replicated build side stays `buckets × |build|` rows — the
    # relation that must fit a task's memory by the operator's own
    # profitability precondition (build ≪ fact/buckets).
    joined = f.join(
        b.hint("shuffle_hash"),
        (f[fact_key] == b[build_key]) & (f["__salt"] == b["__salt"]),
        how,
    )
    return joined.drop("__salt")
