"""Properties of the deterministic sampling / curation layer
(queries/sampling.py) beyond the oracle parity sweep: the structural
claims the docstrings make (nested samples, partition invariance,
packing invariants, decile population balance) are asserted here.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.queries import QUERIES
from noaa_etl_spark.queries.sampling import _hash_gate
from tests.conftest import SF_DIR


def test_hash_gate_samples_are_nested(spark):
    """Extending the hex threshold only ADDS rows — a '12.5% sample' is
    a strict subset of the '25% sample' by construction, which is what
    makes hash-gate sampling resumable (sample more later without
    re-drawing what was already taken)."""
    docs = load_table(spark, SF_DIR, "documents")
    gate = _hash_gate(F.col("doc_id"), "strat:")
    small = {r.doc_id for r in docs.where(gate < "2000").select("doc_id").collect()}
    large = {r.doc_id for r in docs.where(gate < "4000").select("doc_id").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_stratified_sample_rates_are_roughly_honored(spark):
    """Kept fraction per stratum tracks its threshold (16-bit gate ⇒
    binomial noise; bounds are loose at 500 fixture docs)."""
    docs = load_table(spark, SF_DIR, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.lang: r.n
        for r in QUERIES["q_stratified_sample"](spark, SF_DIR)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    en_frac = kept["en"] / totals["en"]
    assert 0.12 < en_frac < 0.40  # target 0.25
    rest_kept = sum(v for k, v in kept.items() if k != "en")
    rest_total = sum(v for k, v in totals.items() if k != "en")
    assert 0.60 < rest_kept / rest_total < 0.90  # target 0.75


def test_group_sample_is_partition_invariant(spark):
    """The same 20 docs per language survive regardless of how the
    input is partitioned — the determinism claim that seeded RNG
    sampling cannot make."""
    docs = load_table(spark, SF_DIR, "documents")
    w = Window.partitionBy("lang").orderBy(
        _hash_gate(F.col("doc_id"), "grp:"), F.col("doc_id")
    )

    def sample_of(df):
        return {
            (r.lang, r.doc_id)
            for r in df.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= 20)
            .collect()
        }

    assert sample_of(docs) == sample_of(docs.repartition(7, "source"))
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang: dict[str, int] = {}
    for lang, _ in sample_of(docs):
        per_lang[lang] = per_lang.get(lang, 0) + 1
    for lang, n in per_lang.items():
        assert n == min(20, sizes[lang])


def test_sequence_pack_invariants(spark):
    """Concat-split packing facts: chunk ranges are well-formed, each
    shard's chunk ids are contiguous from 0, and consecutive docs abut
    (doc i+1 starts in the chunk where doc i's last token landed, or
    the next one when doc i ended exactly on a boundary)."""
    rows = QUERIES["q_sequence_pack"](spark, SF_DIR).collect()
    assert len(rows) == 500
    by_shard: dict[str, list] = {}
    for r in rows:
        assert r.chunk_start <= r.chunk_end
        spanned_capacity = (r.chunk_end - r.chunk_start + 1) * 512
        assert r.n_tokens <= spanned_capacity
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        assert docs[0].chunk_start == 0
        cum = 0
        for r in docs:
            assert r.chunk_start == cum // 512
            cum += r.n_tokens
            assert r.chunk_end == (cum - 1) // 512


def test_quality_bins_are_balanced_and_ordered(spark):
    """ntile contract: bin populations differ by at most 1 and char
    envelopes are non-decreasing across bins."""
    rows = sorted(QUERIES["q_quality_bins"](spark, SF_DIR).collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(1, 11))
    counts = [r.n_docs for r in rows]
    assert max(counts) - min(counts) <= 1
    assert sum(counts) == 500
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_chars <= cur.min_chars


def test_approx_bins_track_exact_ntile(spark):
    """The scale form (broadcast approxQuantile cutpoints, scan-local
    assignment) matches exact ntile deciles to within sketch error:
    populations near N/10 and a shuffle-free plan for the bin column."""
    from noaa_etl_spark.operators.binning import with_approx_bins

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    binned = with_approx_bins(docs, "n_chars", n_bins=10, rel_err=0.001)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bin assignment is scan-local
    counts = {r.bin: r.n for r in binned.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(1, 11))
    n = sum(counts.values())
    assert n == 500
    for b, c in counts.items():
        # rel_err=0.001 on 500 rows ⇒ cutpoints are near-exact; ties in
        # n_chars are the only slack left
        assert abs(c - n / 10) <= 6, (b, counts)
    # ordering property: every bin's max score <= next bin's min score
    envel = (
        binned.groupBy("bin")
        .agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
        .collect()
    )
    envel.sort(key=lambda r: r.bin)
    for prev, cur in zip(envel, envel[1:]):
        assert prev.hi <= cur.lo


def test_mixture_epochs_explode_equals_algebraic(spark):
    """The physical epoch expansion (explode(sequence(1, copies))) must
    emit exactly the totals the graded report derives algebraically, and
    achieved epochs must track the target weight per source class."""
    report = {r["source"]: r for r in QUERIES["q_mixture_epochs"](spark, SF_DIR).collect()}

    docs = load_table(spark, SF_DIR, "documents")
    m = (F.substring("source", 4, 10).cast("int") % 4).alias("m")
    draw = _hash_gate(F.col("doc_id"), "epoch:")
    base = F.when(F.col("m") == 0, 0).when(F.col("m") == 1, 1).otherwise(2)
    thresh = (
        F.when(F.col("m") == 0, "8000")
        .when(F.col("m") == 1, "4000")
        .when(F.col("m") == 2, "0000")
        .otherwise("c000")
    )
    per_doc = docs.select("source", "n_chars", m, draw.alias("draw")).withColumn(
        "copies", base + F.when(F.col("draw") < thresh, 1).otherwise(0)
    )
    exploded = per_doc.filter(F.col("copies") > 0).withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.col("copies")))
    )
    phys = {
        r["source"]: r
        for r in exploded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_emitted"),
            F.sum("n_chars").cast("bigint").alias("chars_emitted"),
        )
        .collect()
    }
    assert set(phys) <= set(report)  # a source can vanish only if every doc gated out
    for src, rep in report.items():
        got = phys.get(src)
        n_emitted = got["n_emitted"] if got else 0
        chars = got["chars_emitted"] if got else 0
        assert n_emitted == rep["n_emitted"], src
        assert chars == rep["chars_emitted"], src
        # achieved epochs concentrate around the target weight
        m_cls = int(src[3:]) % 4
        target = 0.5 + m_cls * 0.75
        achieved = rep["n_emitted"] / rep["n_base"]
        assert abs(achieved - target) < 0.35, (src, achieved, target)


def test_weighted_sample_tracks_weights(spark):
    """Efraimidis–Spirakis hash sampling (q_weighted_sample's core):
    with two weight classes at 10:1, the heavy class must win far more
    of the k slots than its population share — and the selection must
    be exactly k, deterministic across repartitionings."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"),
    )
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("t:"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    key = -F.log((v + F.lit(1)) / F.lit(float(2**48))) / F.col("w")
    pick = df.select("doc_id", "w", key.alias("k")).orderBy("k").limit(200)
    rows = pick.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r.w == 10.0)
    # expected heavy share ≈ 10/11 ≈ 0.91; population share is 0.5
    assert heavy > 150, f"heavy class won only {heavy}/200 slots"
    again = df.repartition(13).select("doc_id", "w", key.alias("k")).orderBy("k").limit(200)
    assert sorted(r.doc_id for r in again.collect()) == sorted(r.doc_id for r in rows)
