"""Exact blocked fuzzy (edit-distance) self-join — entity resolution
over string keys without the O(N²) cross join.

Candidate generation is **prefix filtering** (Ed-Join family — Xiao et
al., VLDB 2008): each edit operation destroys at most ``q`` of a
string's q-grams, so strings within edit distance ``d`` share at least
``max(|G_a|,|G_b|) - d·q`` gram occurrences, and under a GLOBAL
ordering of gram elements (rarest first) they must therefore share at
least one element among the first ``π = q·d + 1`` elements of each
string's ordering. Gram elements are OCCURRENCE-INDEXED — ("00", 3rd
occurrence) — so the multiset intersection becomes a plain set
intersection and the prefix theorem applies verbatim even with
repeated grams; no position predicate is used (a position filter on
prefix matches is NOT sound: the prefix-overlap element need not be an
unedited occurrence, so its positions may legally differ by more than
d). The inverted index is built over each string's π rarest elements
only, and the final ``levenshtein`` verify makes the result exactly
the brute-force answer (asserted against the cross join in tests,
including an adversarial templated-suffix catalog).

Why prefix filtering and not the plain count filter: a naive inverted
index over ALL grams degenerates on low-entropy gram distributions —
measured here on a templated product catalog ("adj noun 00042"-style
names), where near-universal digit grams ("00" at adjacent positions in
almost every name) blow the gram join toward occupancy² ≈ N² rows
before any count filter can prune (the 3 000-name probe ran >20 CPU-min
and was killed). Rarest-first prefixes are immune by construction: a
hot gram sits at the END of the global ordering and never enters the
index, so per-gram occupancy in the index is bounded by how many
strings are RARE-anchored on it.

Scale shape: one tiny gram-frequency aggregate (|distinct grams| rows,
broadcast), a per-string top-π selection (window partitioned by the
string — no global sort), an equi-join on prefix grams bounded by
rare-gram occupancy, and a verify join on surviving candidates only.

LENGTH CONTRACT: every string must carry at least one q-gram and the
prefix theorem needs the gram sets non-degenerate; ``fuzzy_self_join``
requires ``len >= (q - 1) + d*q + 1`` (with q=2, d=2: len ≥ 6) so a
string's full gram set is never smaller than a single prefix position
would allow. Callers with shorter keys must fall back to length-band
blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


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

    # Occurrence-index each gram within its string: the element
    # ("00", occ=3) is a set member shared by two strings iff both
    # contain a third "00" — Σ min(count_a, count_b) set semantics.
    occ_w = Window.partitionBy("id", "gram").orderBy("pos")
    g = g.withColumn("occ", F.row_number().over(occ_w))

    # Global rarest-first element ordering. The frequency table is
    # |distinct grams| rows — tiny by nature (bounded by alphabet^q) —
    # so it broadcasts; the (gfreq, gram, occ) key is a property of the
    # ELEMENT (identical in every string that carries it), which is
    # what makes the prefix selection consistent across join sides.
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("gfreq"))
    prefix_len = q * max_dist + 1
    w = Window.partitionBy("id").orderBy("gfreq", "gram", "occ")
    # Persisted: both self-join sides derive from this ONE frame, so the
    # gram explode + two windows run once, not once per side (the same
    # shared-signature-pass pattern as lsh_candidate_pairs). Small by
    # construction: π rows per string.
    prefix = (
        g.join(F.broadcast(freq), "gram")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .drop("rn", "gfreq", "pos")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Materialize the cache eagerly: downstream actions then always read
    # the InMemoryTableScan, so the executed plan (and its gated
    # exchange count) is identical whether or not an earlier call in
    # the session already warmed an identical subtree.
    prefix.count()

    a = prefix.select(
        F.col("id").alias("name_a"), F.col("len").alias("len_a"), "gram", "occ"
    )
    b = prefix.select(
        F.col("id").alias("name_b"), F.col("len").alias("len_b"), "gram", "occ"
    )
    cand = (
        a.join(
            b,
            (a["gram"] == b["gram"])
            & (a["occ"] == b["occ"])
            & (F.col("name_a") < F.col("name_b"))
            # d edits change length by at most d — sound pre-verify prune
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist),
        )
        .select("name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
