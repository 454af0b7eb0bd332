"""Exact blocked fuzzy (edit-distance) self-join — entity resolution
over string keys without the O(N²) cross join.

Blocking is the positional q-gram count filter (Gravano et al., VLDB
2001): one edit operation destroys at most ``q`` of a string's q-grams
and shifts surviving grams by at most ``d`` positions, so two strings
within edit distance ``d`` must share at least

    max(len_a, len_b) - (q - 1) - d*q

q-gram occurrences whose positions differ by ≤ d. That is a NECESSARY
condition — the inverted-index join + count filter produces a candidate
superset, and the final ``levenshtein`` verify makes the result exactly
the brute-force answer (asserted against the cross join in tests).

Scale shape: the gram explode is narrow (id, len, pos, gram — never the
full string); the candidate join is an equi-join on gram bounded by
per-gram occupancy, and the verify join touches only surviving
candidate pairs. The same inverted-index pattern as the n-gram Jaccard
dedup (queries/text.py), specialized to edit distance.

LENGTH CONTRACT: the count-filter bound must be ≥ 1 for the join to be
lossless — a pair could otherwise share zero grams yet be within
distance d. That requires every string to satisfy
``len >= (q - 1) + d*q + 1`` (with q=2, d=2: len ≥ 6). ``fuzzy_self_join``
raises if any input string is shorter; callers with shorter keys must
fall back to length-band blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positional_qgrams(df: DataFrame, text_col: str, q: int) -> DataFrame:
    """(id=text, len, pos, gram) — one row per q-gram occurrence. The
    string itself is the join identity (inputs are distinct keys); only
    the narrow gram rows ride the candidate shuffle."""
    return df.select(
        F.col(text_col).alias("id"),
        F.length(text_col).alias("len"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - {q - 1}), "
                f"i -> substring({text_col}, i, {q}))"
            )
        ).alias("pos", "gram"),
    )


def fuzzy_self_join(
    names: DataFrame,
    text_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All unordered pairs of distinct ``text_col`` values within
    ``max_dist`` edit operations: (name_a, name_b, dist) with
    name_a < name_b. Exact — identical to the brute-force cross join.
    """
    min_len = (q - 1) + max_dist * q + 1
    shortest = names.agg(F.min(F.length(text_col)).alias("m")).collect()[0]["m"]
    if shortest is not None and shortest < min_len:
        raise ValueError(
            f"fuzzy_self_join q-gram blocking needs every string >= "
            f"{min_len} chars for q={q}, max_dist={max_dist} (got {shortest}); "
            "use length-band blocking for shorter keys"
        )
    distinct = names.select(text_col).distinct()
    g = _positional_qgrams(distinct, text_col, q)
    a = g.select(
        F.col("id").alias("name_a"),
        F.col("len").alias("len_a"),
        F.col("pos").alias("pos_a"),
        "gram",
    )
    b = g.select(
        F.col("id").alias("name_b"),
        F.col("len").alias("len_b"),
        F.col("pos").alias("pos_b"),
        "gram",
    )
    bound = (
        F.greatest(F.col("len_a"), F.col("len_b"))
        - F.lit(q - 1)
        - F.lit(max_dist * q)
    )
    cand = (
        a.join(
            b,
            (a["gram"] == b["gram"])
            & (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("pos_a") - F.col("pos_b")) <= max_dist),
        )
        .groupBy("name_a", "name_b", "len_a", "len_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= bound)
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
