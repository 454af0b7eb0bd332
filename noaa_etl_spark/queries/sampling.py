"""Deterministic sampling / corpus-mixing graded queries — the
training-data curation surface (SURVEY.md §2.I adjunct).

Real pipelines at 100 TB do not sample with RNG state: a seeded RNG is
partition-order-dependent (recompute after a lost executor re-draws
different rows) and unauditable. The industry-standard form is a
**hash gate**: keep a row iff a stable hash of its durable key falls
below a threshold. That predicate is

- stateless and scan-local — no shuffle, no driver coordination, no
  seed broadcast; Catalyst pushes the surviving-column pruning into the
  parquet scan;
- exactly reproducible across reruns, engines, and cluster sizes —
  which is why every query here is oracle-paired (DuckDB computes the
  identical md5 gate); ``q_sample`` (queries/scalars.py) uses the same
  gate for plain Bernoulli sampling;
- resumable: changing a stratum's rate re-gates only that stratum, and
  a later "sample 10% more" pass can extend the hex threshold without
  re-drawing the rows already taken (nested samples by construction).

md5 is used (not xxhash64) because both engines expose it with
identical semantics over the same UTF-8 bytes; the gate reads the first
4 hex chars = 16-bit resolution, plenty for corpus-mixing rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table, spread_small_scan
from noaa_etl_spark.registry import graded


def _hash_gate(key_col, salt: str):
    """First 4 hex chars of md5(salt || key) — a uniform 16-bit draw.

    Compare lexicographically against a 4-hex-char threshold: the gate
    keeps a fraction of int(threshold, 16) / 65536. Pure projection —
    whole-stage-codegen'd JVM-side, no Python, no state.
    """
    return F.substring(F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 4)


@graded(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4)
          < CASE WHEN lang = 'en' THEN '4000' ELSE 'c000' END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling by language: keep 25% of the dominant
    stratum ('en', 0x4000/0x10000) and 75% of everything else — the
    rebalancing step every multilingual training corpus runs.

    100 TB: the gate is a scan-local predicate over (doc_id, lang) —
    zero shuffle, zero RNG state, and the same rows survive on 1 or
    1000 executors. Rate changes are audit-diffable (the kept-set is a
    pure function of the threshold table).
    """
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit("4000")).otherwise(F.lit("c000"))
    return docs.where(_hash_gate(F.col("doc_id"), "strat:") < threshold).select(
        "doc_id", "lang", "source"
    )


@graded(
    "q_source_mix",
    oracle="""
    SELECT source,
           count(*)                         AS n_docs,
           CAST(sum(n_chars) AS BIGINT)     AS chars_total
    FROM documents
    WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4)
          < CASE CAST(substr(source, 4, 2) AS INT) % 3
              WHEN 0 THEN 'ffff'
              WHEN 1 THEN '8000'
              ELSE        '2000'
            END
    GROUP BY source
    ORDER BY source
    """,
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: re-weight a 20-source corpus with
    per-source keep rates (~100% / 50% / 12.5% by source tier) and
    report the post-mix composition — the "data mixture" knob of a
    pretraining pipeline, expressed as one gated scan + one tiny agg.

    100 TB: the gate filters at the scan (no shuffle); the composition
    report groups on ≤|sources| keys, so the agg is map-side-combined
    into a handful of rows regardless of input size. Changing the
    mixture = editing the rate CASE — no data movement until the next
    materialize.
    """
    docs = load_table(spark, sf_dir, "documents")
    tier = F.substring("source", 4, 2).cast("int") % 3
    threshold = (
        F.when(tier == 0, F.lit("ffff")).when(tier == 1, F.lit("8000")).otherwise(F.lit("2000"))
    )
    return (
        docs.where(_hash_gate(F.col("doc_id"), "mix:") < threshold)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("source")
    )


@graded(
    "q_group_sample",
    oracle="""
    SELECT doc_id, lang, CAST(rn AS INT) AS rn
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('grp:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 20
    """,
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-group sample: exactly min(k, |group|)
    docs per language, chosen as the k smallest md5 draws — reservoir
    sampling's job, without the reservoir (rank-by-hash IS a uniform
    k-sample, and it's stable under recompute and engine change).

    100 TB: one shuffle on lang, then a per-group sort the window
    truncates at k. For few huge groups the two-phase heap form
    (operators/topk.py: per-partition heap → merge) bounds memory at
    O(k) per partition instead of a full per-group sort — same contract,
    swap when |group| ≫ k·partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        _hash_gate(F.col("doc_id"), "grp:"), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
    )


@graded(
    "q_sequence_pack",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, shard, n_tokens,
           (cum_tokens - n_tokens) // 512 AS chunk_start,
           (cum_tokens - 1)        // 512 AS chunk_end
    FROM cum
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-and-split form: documents in each shard
    are concatenated in a deterministic order and split into fixed
    512-token training chunks; each doc reports the chunk range it lands
    in (a doc straddling a boundary spans multiple chunks — exactly what
    concat-split pretraining tokenization does).

    100 TB: packing state is a per-shard running sum — one shuffle on
    the shard key (md5 prefix ⇒ uniform), then a window cumsum. Shard
    count scales with data (16 here; thousands at 100 TB), so no global
    sequential pass exists anywhere; chunk ids are shard-local exactly
    like real packed-shard layouts. Token counts are whitespace counts
    (the fixtures are space-joined words); swap in the BPE-regex counter
    from q_token_stats for real corpora.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        _hash_gate(F.col("doc_id"), "pack:").substr(1, 1).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr("(cum_tokens - n_tokens) div 512").alias("chunk_start"),
        F.expr("(cum_tokens - 1) div 512").alias("chunk_end"),
    )


@graded(
    "q_quality_bins",
    oracle="""
    WITH binned AS (
      SELECT doc_id, n_chars,
             CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS bin
      FROM documents
    )
    SELECT bin,
           count(*)                     AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def q_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum / quality-decile binning: rank documents by a quality
    proxy (n_chars here; any scored column in practice), cut into 10
    equal-population bins, and report each bin's envelope — the step
    before per-bin sampling rates in curriculum data schedules.

    100 TB: a global ntile needs a total order — fine at survey scale
    but a single-point sort at 100 TB. The scale form replaces ntile
    with approx quantile cutpoints (percentile_approx on a sample →
    broadcast cutpoints → scan-local bin assignment), trading exact
    equal population for a shuffle-free bin column; the graded query
    keeps exact ntile so the oracle pins the semantics. Tie-break on
    doc_id makes bin assignment deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    binned = docs.select("doc_id", "n_chars", F.ntile(10).over(w).alias("bin"))
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("bin")
    )


@graded(
    "q_train_val_split",
    oracle="""
    WITH gated AS (
      SELECT doc_id, lang,
             substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS g
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN g < 'f5c2' THEN 'train'
                WHEN g < 'fae1' THEN 'val'
                ELSE 'test' END AS split
    FROM gated
    """,
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~96/2/2) by md5 range
    over the durable key — the split every training corpus needs, done
    the only way that survives re-ingestion: a document keeps its split
    forever (pure function of doc_id), new documents land in the right
    proportions, and no engine/run/partitioning changes membership.
    Range thresholds: 0xf5c2/0x10000 ≈ 96.0%, 0xfae1 ≈ 98.0%.

    100 TB: scan-local projection, zero shuffle; the split column is
    computable at read time by ANY engine that has md5 — the
    contamination-audit property (val/test membership is re-derivable,
    not an artifact of a lost RNG state).
    """
    docs = load_table(spark, sf_dir, "documents")
    g = _hash_gate(F.col("doc_id"), "split:")
    return docs.select(
        "doc_id",
        "lang",
        F.when(g < "f5c2", "train")
        .when(g < "fae1", "val")
        .otherwise("test")
        .alias("split"),
    )


@graded(
    "q_mixture_epochs",
    oracle="""
    WITH d AS (
      SELECT source, n_chars,
             CAST(substr(source, 4) AS INT) % 4 AS m,
             substr(md5('epoch:' || CAST(doc_id AS VARCHAR)), 1, 4) AS draw
      FROM documents
    ), c AS (
      SELECT source, n_chars,
             (CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END)
             + (CASE WHEN draw < (CASE m WHEN 0 THEN '8000'
                                         WHEN 1 THEN '4000'
                                         WHEN 2 THEN '0000'
                                         ELSE 'c000' END)
                     THEN 1 ELSE 0 END) AS copies
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT)              AS n_base,
           CAST(sum(copies) AS BIGINT)           AS n_emitted,
           CAST(sum(copies * n_chars) AS BIGINT) AS chars_emitted
    FROM c
    GROUP BY source
    ORDER BY source
    """,
)
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-expansion source mixing — the "source A is seen 2.25
    epochs, source B 0.5 epochs" step of assembling a training mix from
    weighted corpora. A fractional weight w means every doc is emitted
    floor(w) times plus ONE more with probability frac(w) — realized
    here as the deterministic md5 hash gate (draw < frac(w) in 16-bit
    hex), so the same docs get the extra copy on every engine, rerun,
    and cluster size, and the achieved epoch count concentrates tightly
    around w per source.

    Weights derive from the source id (w = 0.5 + (src_num % 4) * 0.75
    → 0.5 / 1.25 / 2.0 / 2.75) so both engines compute them without a
    side table; a real pipeline would broadcast-join a weights dim.

    The graded report aggregates per-doc copy counts ALGEBRAICALLY
    (sum(copies), sum(copies * n_chars)) — identical totals to
    physically exploding, without manufacturing rows: the scan-local
    projection computes copies, one map-side-combinable agg produces
    the mix report (zero pre-agg shuffle). The physical expansion for
    a writer is ``explode(sequence(1, copies))`` on the same per-doc
    frame — row inflation happens AFTER the gate, post-filter, never
    shuffled (tests/test_sampling.py asserts explode-form totals equal
    the algebraic ones).

    100 TB: copies is a pure function of (doc_id, source) — resumable,
    auditable, and recomputable at read time; no RNG state, no shuffle
    before the final tiny per-source agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = (F.substring("source", 4, 10).cast("int") % 4).alias("m")
    draw = _hash_gate(F.col("doc_id"), "epoch:")
    base = (
        F.when(F.col("m") == 0, 0)
        .when(F.col("m") == 1, 1)
        .otherwise(2)
    )
    thresh = (
        F.when(F.col("m") == 0, "8000")
        .when(F.col("m") == 1, "4000")
        .when(F.col("m") == 2, "0000")
        .otherwise("c000")
    )
    per_doc = docs.select("source", "n_chars", m, draw.alias("draw")).withColumn(
        "copies", base + F.when(F.col("draw") < thresh, 1).otherwise(0)
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_base"),
            F.sum("copies").cast("bigint").alias("n_emitted"),
            F.sum(F.col("copies") * F.col("n_chars")).cast("bigint").alias("chars_emitted"),
        )
        .orderBy("source")
    )


@graded(
    "q_corpus_shuffle_shard",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ), s AS (
      SELECT doc_id, n_chars, hx,
             CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) >> 1
                  AS INT) AS shard
      FROM h
    )
    SELECT shard,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS chars_total,
           arg_min(doc_id, hx)           AS first_doc_id,
           arg_max(doc_id, hx)           AS last_doc_id
    FROM s
    GROUP BY shard
    ORDER BY shard
    """,
)
def q_corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding — the global-shuffle step
    every training run needs, done without RNG state: each document's
    position key is md5('shuffle:' || doc_id) and its shard is the top
    hex nibble >> 1 (8 shards). Order and placement are pure functions
    of the durable key, so the shuffle is identical across engines,
    reruns, and cluster sizes, and any shard can be re-materialized
    alone. The graded report pins the assignment: per shard, the doc
    count, payload size, and the first/last document in shuffle order
    (md5 keys are unique per doc, so min_by/max_by are deterministic).

    100 TB: shard assignment is scan-local (no shuffle to DECIDE
    placement); materializing shards is repartition(shard) writes with
    in-partition sortWithinPartitions(hx) — one exchange, no global
    sort. The report itself is one tiny 8-row agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    nibble = F.conv(F.substring(F.col("hx"), 1, 1), 16, 10).cast("int")
    return (
        docs.select("doc_id", "n_chars", hx.alias("hx"))
        .select(
            "doc_id",
            "n_chars",
            "hx",
            F.shiftright(nibble, 1).alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.min_by("doc_id", F.col("hx")).alias("first_doc_id"),
            F.max_by("doc_id", F.col("hx")).alias("last_doc_id"),
        )
        .orderBy("shard")
    )


@graded(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               -ln((CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12)
                         AS UBIGINT) + 1) / 281474976710656.0)
                   / CAST(n_chars AS DOUBLE) AS k
        FROM documents
        -- w=0 docs can never be sampled under E-S (key -> +inf);
        -- excluding them up front mirrors that exactly and keeps ANSI
        -- Spark from aborting on the division if a regenerated fixture
        -- ever ships an empty document
        WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars
    FROM keyed
    ORDER BY k
    LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, RNG-free (Efraimidis–
    Spirakis via the exponential-race formulation): each doc draws
    u ∈ (0,1] from an md5 hash of its key and competes with key
    −ln(u)/w; the k smallest win. Inclusion probability is
    proportional-to-weight (here n_chars — longer docs favored, the
    length-weighted mixture knob), and unlike the Bernoulli md5 gates
    (q_sample, q_train_val_split) the output size is EXACTLY k.

    Determinism story shared with every gate in this engine: survivors
    are a pure function of the key — rerun-stable, engine-reproducible
    (the oracle replays the identical hash-to-uniform arithmetic),
    stable under cluster resizing and executor loss, and auditable
    after the fact.

    100 TB: the key is scan-local arithmetic; top-k is
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows) — no global sort, no shuffle of non-winners. Weighted
    PER-GROUP k-sampling composes the same key with the rank-by-hash
    window of q_group_sample.
    """
    # w=0 docs are unsampleable under E-S (key → +inf) — filter them
    # rather than divide by zero under ANSI (regen-robustness; oracle
    # mirrors).
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    u = (v + F.lit(1)) / F.lit(float(2**48))
    key = -F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy("k")
        .limit(100)
        .drop("k")
    )


@graded(
    "q_token_budget_select",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  w -> w <> '')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                                w -> w <> ''))) AS BIGINT) AS n_distinct
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             CAST(n_distinct AS DOUBLE) / n_tokens AS quality,
             -- zero-token docs are excluded below: they can't carry a
             -- quality ratio (ANSI Spark would abort on the division)
             -- and cost nothing against the budget either way
             CAST(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY CAST(n_distinct AS DOUBLE) / n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM scored WHERE n_tokens > 0
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           cum_tokens <= 2000 AS kept
    FROM ranked
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: within each source, rank documents
    by lexical-diversity quality (distinct-token ratio, tie-break
    doc_id) and keep the prefix whose running token total stays inside
    a per-source budget — the data-selection step every mixture-
    weighted pretraining run performs after quality scoring ("spend at
    most B tokens of src_k, best documents first").

    Determinism contract: the quality score is one double ratio of two
    scan-local integers (bit-identical cross-engine), so the window
    ORDER — and therefore the running sum and the kept set — is
    reproducible across engines and cluster sizes; no RNG anywhere.

    100 TB: token/distinct counts are scan-local array math; the only
    exchange is the per-source window shuffle (sources ≪ docs — skew
    bounded by the largest source; the sessionize-bucketed escape in
    operators/sessionize.py applies if one source dominates). Running
    totals combine map-side nothing — but the frame is the minimal
    (doc_id, source, 2×BIGINT) projection, never text.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != "")
    # zero-token docs excluded (regen-robustness: an all-numeric text
    # would otherwise ANSI-abort the quality division; such docs cost
    # nothing against a token budget anyway — oracle mirrors)
    scored = docs.select(
        "doc_id",
        "source",
        F.size(ws).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("n_distinct"),
    ).filter(F.col("n_tokens") > 0)
    quality = F.col("n_distinct").cast("double") / F.col("n_tokens")
    w = (
        Window.partitionBy("source")
        .orderBy(quality.desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    ).withColumn("kept", F.col("cum_tokens") <= F.lit(2000))


@graded(
    "q_curriculum_order",
    oracle="""
    SELECT doc_id, source, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT)
             AS position
    FROM documents
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: every document's 0-based global
    position under an easy→hard ordering (short documents first,
    doc_id tiebreak) — the deterministic sample-order construction
    curriculum-learning pipelines materialize before sharding (position
    div shard_size = shard, position mod = offset; shuffle_shard is the
    uniform-order sibling).

    The oracle is the textbook global row_number — which is exactly the
    plan this engine must NOT run at 100 TB (a global window = every
    row through one reducer). The engine computes IDENTICAL positions
    with operators/order_index.global_sort_index: range-repartition on
    the sort keys, one mapInPandas local-index pass, and a
    driver-collected per-partition offset map (bounded by the partition
    count — the RDD.zipWithIndex adjudication) applied as a literal
    projection. Total order (n_chars, doc_id unique) ⇒ positions are
    partition-boundary-independent, so the sampled range bounds cannot
    change the grade.

    Exactness: positions are a BIGINT permutation by construction.
    """
    from noaa_etl_spark.operators.order_index import global_sort_index

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return global_sort_index(
        docs, [("n_chars", True), ("doc_id", True)], out_col="position"
    )


@graded(
    "q_balanced_class_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    )
    SELECT doc_id, lang, source, rk FROM ranked WHERE rk <= 50
    """,
)
def q_balanced_class_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced class subsample: EXACTLY min(50, |class|) documents per
    language, selected by md5 rank — the class-rebalancing step for
    eval sets and contrastive training (stratified_sample rebalances by
    RATE; this guarantees equal COUNTS). Deterministic: the kept set is
    a pure function of doc_id, so reruns, engines, and cluster sizes
    agree; the md5 order makes it an unbiased draw without RNG state.

    Scale: exact-k-per-class needs a rank, and the class count is TINY
    (languages), so a naive per-class window is the celebrity shape —
    routed through grouped_topk_twophase instead: every input
    partition pre-prunes to ≤ k rows per class map-side (one
    mapInPandas pass), the exact rank window then runs over
    ≤ partitions×classes×k survivors. The md5 tiebreak (then doc_id)
    is a total order, so the two-phase result is identical to the
    oracle's global window.
    """
    from noaa_etl_spark.operators.topk import grouped_topk_twophase

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")).cast("binary")).alias("_h"),
    )
    picked = grouped_topk_twophase(
        docs, ["lang"], [("_h", True), ("doc_id", True)], 50, rank_col="rk"
    )
    return picked.select("doc_id", "lang", "source", F.col("rk").cast("bigint").alias("rk"))


@graded(
    "q_systematic_sample",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT)
                 AS position
      FROM documents
    )
    SELECT doc_id, source, position
    FROM ordered WHERE position % 16 = 0
    """,
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every-k-th) sampling under a global total order —
    the stratified-by-position design survey pipelines use when the
    order encodes difficulty/time (here the curriculum order: n_chars
    then doc_id), guaranteeing one sample per length stratum of k docs.

    The oracle ranks with the global row_number window this engine
    refuses at scale; the engine composes
    operators/order_index.global_sort_index (range repartition +
    mapInPandas local index + driver offset map — the q_curriculum_order
    machinery, REUSED) with a scan-local position % 16 filter, proving
    the order-index operator serves downstream consumers, not just its
    own grade. Exact-integer positions ⇒ identical survivor sets."""
    from noaa_etl_spark.operators.order_index import global_sort_index

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    idx = global_sort_index(
        docs, [("n_chars", True), ("doc_id", True)], out_col="position"
    )
    return idx.filter(F.col("position") % 16 == 0).select(
        "doc_id", "source", "position"
    )


# Deterministic "Poisson(1)" weight ladder: cumulative e^{-1}/k!
# thresholds as shared literals. Both engines map the SAME md5-derived
# u through the SAME ladder, so replicate weights are identical — the
# scheme is a deterministic weighting, graded exactly (true Poisson
# tails beyond w=6 are folded into the last rung; irrelevant to the
# contract since both engines use one ladder).
BOOT_LADDER = [
    (0.36787944117144233, 0),
    (0.7357588823428847, 1),
    (0.9196986029286058, 2),
    (0.9810118431238462, 3),
    (0.9963401531726563, 4),
    (0.9994058151824183, 5),
]
BOOT_B = 32


def boot_replicates(df: DataFrame, key_col: str) -> DataFrame:
    """df + (b, w): replicate ids 0..31 with their deterministic
    bootstrap weights. One md5 digest feeds FOUR replicates (8 hex
    chars = 32 bits of u each — the 7-rung ladder needs far less
    resolution), and the digest is computed at the 8-row stage BEFORE
    the slot explode, so each input row costs 8 digests, not 32 (the
    digest dominates the whole bootstrap's compute at scale; a
    per-replicate digest form measured ~4x the work for identical
    statistics)."""
    g = df.withColumn(
        "g", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B // 4 - 1)))
    ).withColumn(
        "hx",
        F.md5(
            F.concat(
                F.lit("boot:"),
                F.col("g").cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            )
        ),
    )
    r = g.withColumn("slot", F.explode(F.sequence(F.lit(0), F.lit(3))))
    v = F.conv(
        F.col("hx").substr((F.col("slot") * 8 + 1).cast("int"), F.lit(8)),
        16,
        10,
    ).cast("bigint")
    u = (v + F.lit(1)) / F.lit(float(2**32))
    w = F.lit(6)
    for t, k in reversed(BOOT_LADDER):
        w = F.when(u < F.lit(t), F.lit(k)).otherwise(w)
    return r.select(
        *df.columns,
        (F.col("g") * 4 + F.col("slot")).cast("int").alias("b"),
        w.cast("bigint").alias("w"),
    )


def _boot_ladder_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t!r} THEN {w}" for t, w in BOOT_LADDER
    )
    return f"(CASE {cases} ELSE 6 END)"


BOOTSTRAP_ORACLE = f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    rep AS (
      -- one md5 feeds FOUR replicates (8 hex chars = 32 bits each):
      -- the ladder needs far less than 32 bits of resolution, and the
      -- digest is the dominant compute at scale
      SELECT g.g * 4 + s.s AS b, o_orderkey, cents,
             {_boot_ladder_sql("(CAST('0x' || substr(md5('boot:' || CAST(g.g AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)), 1 + 8 * s.s, 8) AS UBIGINT) + 1) / 4294967296.0")}
               AS w
      FROM base,
           (SELECT unnest(range(8)) AS g) g,
           (SELECT unnest(range(4)) AS s) s
    ),
    per_b AS (
      SELECT b,
             CAST(sum(w * cents) AS BIGINT) AS wsum,
             CAST(sum(w) AS BIGINT)         AS wn,
             CAST(sum(cents) AS BIGINT)     AS total_cents,
             CAST(count(*) AS BIGINT)       AS n
      FROM rep GROUP BY b
    ),
    means AS (
      SELECT list(CAST(wsum AS DOUBLE) / wn ORDER BY CAST(wsum AS DOUBLE) / wn)
               AS ms,
             min(total_cents) AS total_cents,
             min(n) AS n
      FROM per_b
    )
    SELECT n,
           CAST(total_cents AS DOUBLE) / n AS mean_cents,
           ms[2]  AS ci_lo,
           ms[31] AS ci_hi
    FROM means
    """


@graded("q_bootstrap_ci", oracle=BOOTSTRAP_ORACLE)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean order value —
    the distributed bootstrap (Chamandy et al., Google): classic
    resampling needs n draws per replicate from one urn (undistributable);
    Poisson(1) per-row weights makes each replicate a SCAN-LOCAL weighting,
    so B=32 replicates ride ONE pass as a combinable (b, Σw·x, Σw) agg.
    Weights are md5-derived through a shared threshold ladder — RNG-free,
    rerun-stable, engine-reproducible (the md5-gate doctrine applied to
    RESAMPLING). CI = 2nd/31st order statistics of the replicate means
    (~94% interval at B=32), an exact selection over bit-equal doubles.

    Exactness: Σw·cents and Σw are BIGINTs; each replicate mean is one
    double division; sorting 32 bit-equal doubles is deterministic.

    Scale: replicate expansion is explode(0..31) BEFORE a map-side
    combinable agg — the shuffle carries 32 partial-state rows per
    partition, never 32× the data; global n and Σx ride the same agg
    (every replicate sees each row once ⇒ per-b copies are the global
    values — no second scan)."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # The 8-digest ladder is the dominant compute; a single-row-group
    # scan would run it all on one core (r15 opt: 6.7 s -> sub-second
    # at sf0.1). No-op on any multi-split real-volume input.
    base = spread_small_scan(base, "o_orderkey")
    rep = boot_replicates(base, "o_orderkey")
    per_b = (
        rep.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("wsum"),
            F.sum("w").cast("bigint").alias("wn"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    means = per_b.agg(
        F.array_sort(
            F.collect_list(F.col("wsum").cast("double") / F.col("wn"))
        ).alias("ms"),
        F.min("total_cents").alias("total_cents"),
        F.min("n").alias("n"),
    )
    return means.select(
        "n",
        (F.col("total_cents").cast("double") / F.col("n")).alias("mean_cents"),
        F.element_at("ms", 2).alias("ci_lo"),
        F.element_at("ms", 31).alias("ci_hi"),
    )


@graded(
    "q_negative_sampling",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 2) AS shard
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS anchor_id, n.doc_id AS negative_id,
             n.source AS negative_source,
             md5('neg:' || CAST(a.doc_id AS VARCHAR) || ':'
                 || CAST(n.doc_id AS VARCHAR)) AS r
      FROM d a JOIN d n
        ON a.shard = n.shard AND a.source <> n.source
    ),
    ranked AS (
      SELECT anchor_id, negative_id, negative_source,
             CAST(row_number() OVER (
               PARTITION BY anchor_id ORDER BY r, negative_id
             ) AS BIGINT) AS rk
      FROM pairs
    )
    SELECT anchor_id, negative_id, negative_source, rk
    FROM ranked WHERE rk <= 2
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE sampling for contrastive training pairs:
    each anchor document draws 2 negatives from OTHER sources inside
    its md5 shard — RNG-free (pair-digest ranked, rerun-stable,
    auditable: the same anchor always gets the same negatives), the
    md5-gate doctrine applied to PAIR construction. Cross-source
    restriction makes the negatives label-safe; shard blocking bounds
    the candidate space.

    Scale: the self-join is shard-blocked — pair volume is
    Σ_shard |shard|² like every blocked matcher here (fuzzy join,
    LSH bands), so the shard-prefix LENGTH must grow with the corpus
    (2 hex nibbles = 256 shards at fixture scale; production sizes
    shards to a per-block row budget exactly like the fuzzy-join
    q-gram order — the SCALING.md gram-universe rule). The rank window
    partitions by anchor_id — high cardinality, the scale-friendly
    window shape."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.substring(
            F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 2
        ).alias("shard"),
    )
    a = d.select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("a_source"),
        "shard",
    )
    n = d.select(
        F.col("doc_id").alias("negative_id"),
        F.col("source").alias("negative_source"),
        F.col("shard").alias("n_shard"),
    )
    pairs = a.join(
        n,
        (a["shard"] == n["n_shard"]) & (F.col("a_source") != F.col("negative_source")),
    ).select(
        "anchor_id",
        "negative_id",
        "negative_source",
        F.md5(
            F.concat(
                F.lit("neg:"),
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("negative_id").cast("string"),
            )
        ).alias("r"),
    )
    w = Window.partitionBy("anchor_id").orderBy("r", "negative_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 2)
        .drop("r")
    )


@graded(
    "q_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    mn AS (SELECT min(n_docs) AS n_min FROM counts),
    rates AS (
      SELECT source, n_docs,
             sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate
      FROM counts, mn
    )
    SELECT r.source, r.n_docs, r.rate,
           CAST(count(*) FILTER (
             WHERE CAST('0x' || substr(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 12)
                        AS UBIGINT)
                   < CAST(floor(r.rate * 281474976710656.0) AS UBIGINT)
           ) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY r.source, r.n_docs, r.rate
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (alpha = 0.5, the multilingual-
    corpus rebalancing rule): post-mix source shares go proportional to
    n_s^alpha instead of n_s, so dominant sources are downsampled and
    the tail is relatively upweighted. Per-doc keep rate r_s =
    sqrt(n_min / n_s) — the smallest source is kept whole (rate 1.0)
    and every larger source thinned toward the temperature target; the
    keep decision is the standard md5 gate (48-bit hash < floor(r_s *
    2^48)), deterministic and rerun-stable.

    Exactness: n_s are exact BIGINTs; rate = one IEEE division + one
    sqrt of identical doubles (bit-equal, the bollinger contract); the
    gate threshold floors that bit-equal double to an integer, so kept
    counts are exact in both engines — no tolerance anywhere.

    100 TB: pass 1 is a combinable per-source count (a |sources|-row
    relation); pass 2 broadcasts the rate table back onto the doc scan
    and filters scan-locally — no doc-grain shuffle at all; the gate is
    pure per-row arithmetic, stable under executor loss and cluster
    resize (the md5-gate determinism story shared by every sampler
    here)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # counts feeds both the min and the rate table — localCheckpoint the
    # |sources|-row relation so the count subtree plans once (the
    # multi-reader rule).
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).localCheckpoint()
    mn = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double")).alias(
            "rate"
        ),
    )
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    keep = v < F.floor(F.col("rate") * F.lit(float(2**48))).cast("bigint")
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "rate")
        .agg(F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"))
        .select("source", "n_docs", "rate", "n_kept")
    )


DSIR_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source, u.w AS w
      FROM documents,
           UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS u(w)
    ),
    db AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(w), 1, 4) AS INTEGER) % 64 AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, source, 3
    ),
    bs AS (
      SELECT b,
             CAST(sum(c) AS BIGINT) AS s_cnt,
             CAST(coalesce(sum(c) FILTER (
               WHERE substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
             ), 0) AS BIGINT) AS t_cnt
      FROM db GROUP BY b
    ),
    tot AS (
      SELECT CAST(sum(s_cnt) AS BIGINT) AS s_tot,
             CAST(sum(t_cnt) AS BIGINT) AS t_tot
      FROM bs
    ),
    terms AS (
      SELECT b,
             ln(CAST((t_cnt + 1) * (s_tot + 64) AS DOUBLE)
                / CAST((s_cnt + 1) * (t_tot + 64) AS DOUBLE)) AS term
      FROM bs, tot
    ),
    scored AS (
      SELECT d.doc_id, d.source,
             CAST(sum(d.c) AS BIGINT) AS n_tokens,
             round(sum(d.c * t.term ORDER BY d.b), 6) AS score
      FROM db d JOIN terms t ON d.b = t.b
      GROUP BY d.doc_id, d.source
    )
    SELECT doc_id, source, n_tokens, score, score > 0 AS selected
    FROM scored
"""


def dsir_doc_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, source, b, c) hashed-unigram bucket counts for DSIR —
    the only doc-grain shuffle of the pipeline (one combinable count)."""
    words = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
            )
        ).alias("w"),
    )
    return (
        words.select(
            "doc_id",
            "source",
            (F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int") % 64).alias(
                "b"
            ),
        )
        .groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


@graded("q_dsir_select", oracle=DSIR_ORACLE)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): score every corpus document by how much more likely its
    hashed-n-gram features are under a TARGET distribution (here a
    benchmark-like md5-gated 1/16 subset) than under the raw corpus,
    score(d) = Σ_w ln(p_target(b(w)) / p_source(b(w))) over a 64-bucket
    hashed unigram feature space with add-one smoothing — the published
    recipe for cheaply steering a 100 TB crawl toward a target domain
    without training a classifier. selected = score > 0 (doc looks more
    target-like than corpus-like).

    Float discipline (the keyword_extraction / perplexity lessons):
    the 64 per-bucket ln terms are ln of one exact-integer ratio each —
    cross-engine ln can differ by 1 ulp, so the per-doc score (a) sums
    its c_b·term_b contributions in DETERMINISTIC bucket-ascending
    order (sorted-array fold here == sum(x ORDER BY b) in the oracle),
    and (b) is graded ROUNDED at 6dp with `selected` derived from the
    rounded value — never rank or top-k on the raw ln sum.

    100 TB: pass 1 is the token explode collapsed to (doc, bucket)
    grain by a combinable count (the feature_hashing shape — the ONLY
    doc-grain shuffle); bucket stats reduce to a 64-row relation that
    BROADCASTS back, and the per-doc fold is scan-local over ≤64
    elements. Target counts come from the same pass via a conditional
    sum — the benchmark set never shuffles separately.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dsir_score_from_db(dsir_doc_buckets(docs))


def dsir_score_from_db(db: DataFrame) -> DataFrame:
    """DSIR scoring from a (doc_id, source, b, c) doc-bucket count
    relation — shared by the batch query and the streaming twin (each
    doc lands in exactly one micro-batch, so the unioned per-batch
    count partials ARE the batch relation; bucket stats and the ordered
    fold are then identical arithmetic over identical integers).

    db feeds BOTH the bucket-stats chain and the scoring join, and bs
    feeds BOTH totals and terms — un-checkpointed, Spark plans the
    tokenize+count subtree twice (measured: 14 executed exchanges vs 8;
    the r5 double-plan smell). localCheckpoint both (the multi-reader
    rule — persist would pollute the exchange accounting); at 100 TB
    the checkpointed db IS the materialized feature relation."""
    db = db.localCheckpoint()
    is_bench = (
        F.substring(
            F.md5(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))), 1, 1
        )
        == "0"
    )
    bs = db.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("s_cnt"),
        F.coalesce(F.sum(F.when(is_bench, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("t_cnt"),
    ).localCheckpoint()
    tot = bs.agg(
        F.sum("s_cnt").cast("bigint").alias("s_tot"),
        F.sum("t_cnt").cast("bigint").alias("t_tot"),
    )
    terms = bs.crossJoin(F.broadcast(tot)).select(
        "b",
        F.log(
            ((F.col("t_cnt") + 1) * (F.col("s_tot") + 64)).cast("double")
            / ((F.col("s_cnt") + 1) * (F.col("t_tot") + 64)).cast("double")
        ).alias("term"),
    )
    scored = (
        db.join(F.broadcast(terms), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("b"),
                                    (F.col("c") * F.col("term")).alias("x"),
                                )
                            )
                        ),
                        lambda s: s["x"],
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("score"),
        )
    )
    return scored.select(
        "doc_id", "source", "n_tokens", "score", (F.col("score") > 0).alias("selected")
    )


@graded(
    "q_temporal_split",
    oracle="""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
    ),
    labeled AS (
      SELECT e.event_type,
             CASE
               WHEN epoch_us(e.ts) <  b.t0 + (b.t1 - b.t0) * 4 // 5
                 THEN 'train'
               WHEN epoch_us(e.ts) < b.t0 + (b.t1 - b.t0) * 4 // 5
                                     + 86400000000
                 THEN 'embargo'
               ELSE 'val'
             END AS split,
             epoch_us(e.ts) AS t_us
      FROM events e, bounds b
    )
    SELECT split, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(t_us) AS BIGINT) AS min_t_us,
           CAST(max(t_us) AS BIGINT) AS max_t_us
    FROM labeled
    GROUP BY split, event_type
    ORDER BY split, event_type
    """,
)
def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free TEMPORAL train/val split with an embargo gap — the
    time-series counterpart of q_train_val_split's md5 split: models
    trained on events must be validated on STRICTLY LATER data, with an
    embargo band (1 day here) between the two so that any feature
    computed over trailing windows (rolling counts, sessions, as-of
    joins) cannot straddle the boundary and leak future information
    into training (the purged/embargoed split of de Prado's
    'Advances in Financial Machine Learning').

    Cutoff arithmetic is ALL-INTEGER: t_cut = t0 + (t1 − t0)·4 div 5 on
    epoch-micros BIGINTs (never a float quantile — percentile
    interpolation differs across engines; min/max + integer division
    cannot), embargo = cutoff + 86_400_000_000 µs. Graded output is the
    per-(split, event_type) count + boundary summary — verifying
    max_t_us(train) < min_t_us(val) makes the no-leakage property
    itself part of the grade.

    100 TB: one combinable min/max agg (one row, broadcast back), then
    a scan-local CASE label and one combinable count agg — two fact
    passes, zero wide shuffles beyond the tiny group-by. The label is a
    pure function of (ts, global bounds): recomputable by any engine,
    no RNG state.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t_us")
    )
    bounds = ev.agg(
        F.min("t_us").alias("t0"), F.max("t_us").alias("t1")
    )
    lab = ev.join(F.broadcast(bounds))
    cut = F.col("t0") + F.expr("(t1 - t0) * 4 div 5")
    split = (
        F.when(F.col("t_us") < cut, "train")
        .when(F.col("t_us") < cut + F.lit(86_400_000_000), "embargo")
        .otherwise("val")
    )
    return (
        lab.select(split.alias("split"), "event_type", "t_us")
        .groupBy("split", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("t_us").alias("min_t_us"),
            F.max("t_us").alias("max_t_us"),
        )
    )


SOURCE_ENTROPY_ORACLE = """
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS docs_total,
             CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM per_source
    ),
    terms AS (
      SELECT s.source,
             -(CAST(s.n_docs AS DOUBLE) / CAST(t.docs_total AS DOUBLE))
               * ln(CAST(s.n_docs AS DOUBLE) / CAST(t.docs_total AS DOUBLE)) AS h_doc,
             -(CAST(s.n_tokens AS DOUBLE) / CAST(t.tokens_total AS DOUBLE))
               * ln(CAST(s.n_tokens AS DOUBLE) / CAST(t.tokens_total AS DOUBLE)) AS h_tok
      FROM per_source s, tot t
    ),
    folded AS (
      SELECT round(sum(h_doc ORDER BY source), 9) AS h_docs,
             round(sum(h_tok ORDER BY source), 9) AS h_tokens
      FROM terms
    )
    SELECT t.n_sources, t.docs_total, t.tokens_total,
           f.h_docs, f.h_tokens,
           round(exp(f.h_docs), 6) AS eff_sources_docs,
           round(exp(f.h_tokens), 6) AS eff_sources_tokens
    FROM folded f, tot t
    """


def source_entropy_report(per_source: DataFrame) -> DataFrame:
    """Entropy finalize over a (source, n_docs, n_tokens) relation —
    shared by q_source_entropy and its streaming twin (per-source doc
    and token counts are pure-addition mergeable; the entropy terms and
    folds are computed only over the folded |sources|-row relation).

    per_source is localCheckpoint'd: it feeds the totals agg AND the
    term projection (and tot itself feeds two readers) — un-pinned,
    each reader re-plans the full source scan + agg (audited at 12
    executed exchanges for what is a 2-exchange computation; the
    multi-reader double-plan rule)."""
    per_source = per_source.localCheckpoint()
    # tot is itself two-reader (the term projection and the final
    # report) — checkpoint the 1-row frame too, or each reader re-runs
    # the totals exchange.
    tot = per_source.agg(
        F.sum("n_docs").cast("bigint").alias("docs_total"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    ).localCheckpoint()
    p_doc = F.col("n_docs").cast("double") / F.col("docs_total").cast("double")
    p_tok = F.col("n_tokens").cast("double") / F.col("tokens_total").cast("double")
    terms = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        (-p_doc * F.log(p_doc)).alias("h_doc"),
        (-p_tok * F.log(p_tok)).alias("h_tok"),
    )
    ser = terms.agg(
        F.array_sort(F.collect_list(F.struct("source", "h_doc", "h_tok"))).alias("xs")
    )
    h_docs = F.round(
        F.aggregate(F.col("xs"), F.lit(0.0), lambda acc, x: acc + x["h_doc"]), 9
    )
    h_tokens = F.round(
        F.aggregate(F.col("xs"), F.lit(0.0), lambda acc, x: acc + x["h_tok"]), 9
    )
    folded = ser.select(h_docs.alias("h_docs"), h_tokens.alias("h_tokens"))
    return folded.crossJoin(F.broadcast(tot)).select(
        "n_sources", "docs_total", "tokens_total", "h_docs", "h_tokens",
        F.round(F.exp(F.col("h_docs")), 6).alias("eff_sources_docs"),
        F.round(F.exp(F.col("h_tokens")), 6).alias("eff_sources_tokens"),
    )


@graded("q_source_entropy", oracle=SOURCE_ENTROPY_ORACLE)
def q_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix diversity report: Shannon entropy of the source
    distribution (by docs AND by tokens) plus the effective number of
    sources exp(H) — the one-row diagnostic a training-data pipeline
    watches to catch a mix collapsing onto one source (eff_sources ->
    1) or a token-vs-doc imbalance (H_tokens << H_docs means a few
    sources carry all the volume in long documents).

    Exactness: counts are exact BIGINTs; each entropy term -p*ln(p) is
    a double of exact integers with a 1-ulp ln() window, so the sums
    fold in ascending-source order on both engines (Spark: array_sort +
    F.aggregate; DuckDB: sum(x ORDER BY source)) and H is graded
    ROUNDED at 9dp with exp(H) derived from the ROUNDED value then
    rounded again (the perplexity/dsir ln doctrine — no raw
    transcendental is ever compared). Scale: one combinable
    source-grain agg; everything after runs on the |sources|-row
    relation."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(source_token_count()).cast("bigint").alias("n_tokens"),
    )
    return source_entropy_report(per_source)


def source_token_count():
    """Whitespace token count as a pure length expression (no split
    array materialized) — shared by the entropy pair."""
    return (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    ).cast("bigint")


@graded(
    "q_grouped_kfold",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(CAST('0x' || substr(md5('kfold:' || CAST(user_id AS VARCHAR)), 1, 12)
                  AS UBIGINT) AS BIGINT) % 5 AS fold
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT fold,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_clicks,
           CAST(count(*) FILTER (event_type = 'click') AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS click_rate
    FROM e GROUP BY fold ORDER BY fold
    """,
)
def q_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP k-fold assignment for cross-validation over grouped data:
    every event of a user lands in the same fold BY CONSTRUCTION (the
    fold is a pure function of user_id — an md5 gate, the RNG-free
    doctrine), which is the leakage guarantee row-level folding breaks
    (a user's events split across train and validation folds leak that
    user's behavior into validation). The graded report is the
    pre-flight balance check run before trusting the folds: per-fold
    user count, event count, and label (click) rate — exact BIGINTs
    plus one exact division.

    100 TB: fold assignment is scan-local (no shuffle to assign); the
    report is one combinable agg with a 5-group key plus a distinct-
    user count that rides the same exchange."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kfold:"), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    e = ev.select("user_id", "event_type", fold.alias("fold"))
    return (
        e.groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_if(F.col("event_type") == "click").cast("bigint").alias("n_clicks"),
            (
                F.count_if(F.col("event_type") == "click").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("click_rate"),
        )
        .orderBy("fold")
    )


@graded(
    "q_neyman_allocation",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM e GROUP BY event_type
    ),
    sd AS (
      SELECT event_type, n_h,
             CASE WHEN n_h > 1 THEN
               sqrt((CAST(n_h AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                    / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0)))
             ELSE 0.0 END AS sd_h
      FROM stats
    ),
    tot AS (
      SELECT sum(CAST(n_h AS DOUBLE) * sd_h ORDER BY event_type) AS total FROM sd
    )
    SELECT sd.event_type, sd.n_h, sd.sd_h,
           CASE WHEN tot.total > 0.0
                THEN CAST(sd.n_h AS DOUBLE) * sd.sd_h / tot.total END AS w_h,
           CASE WHEN tot.total > 0.0
                THEN CAST(floor(1000.0 * (CAST(sd.n_h AS DOUBLE) * sd.sd_h / tot.total))
                     AS BIGINT) END AS alloc
    FROM sd CROSS JOIN tot ORDER BY sd.event_type
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) allocation for stratified sampling: a budget of
    1000 samples is allocated across strata proportional to n_h·σ_h —
    the allocation that minimizes the variance of the stratified mean
    estimator (high-variance strata earn more than proportional share;
    the report a survey/eval-set designer runs before drawing with
    q_stratified_sample's md5 gates).

    σ_h from exact BIGINT moments with the n·ss product in DOUBLES (the
    finalize-product doctrine; the BIGINT Σcents² itself is safe to
    ~1000× fixture volume at the 25k-cent value bound). The
    denominator Σ n_h·σ_h is an ORDERED fold over strata (sum ORDER BY
    / sorted-struct aggregate — the ln/PSI doctrine applied to a sum of
    engine-computed doubles whose addition order is otherwise
    arbitrary), so w_h is one token-identical chain and alloc =
    floor(1000·w_h) of a bit-equal double is deterministic. Integer
    allocations floor (Σalloc ≤ 1000); largest-remainder topping-off is
    deliberately NOT graded — ranking on float remainders is the
    keyword-extraction ordering trap.

    100 TB: one combinable fact agg to |strata| rows; everything after
    is bounded-relation arithmetic (stats localCheckpoint'd — it feeds
    both the total fold and the per-stratum report)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    stats = (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_h"),
            F.sum("cents").cast("bigint").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
        )
    )
    nd = F.col("n_h").cast("double")
    sd_h = F.when(
        F.col("n_h") > 1,
        F.sqrt(
            (nd * F.col("ss") - F.col("s").cast("double") * F.col("s"))
            / (nd * (nd - F.lit(1.0)))
        ),
    ).otherwise(F.lit(0.0))
    sd = stats.select("event_type", "n_h", sd_h.alias("sd_h")).localCheckpoint()
    tot = sd.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("event_type").alias("e"),
                            (F.col("n_h").cast("double") * F.col("sd_h")).alias("v"),
                        )
                    )
                ),
                lambda x: x["v"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("total")
    )
    out = sd.crossJoin(F.broadcast(tot))
    # total == 0 (every stratum constant) would make w_h a 0/0 NaN whose
    # cross-engine hash is undefined — NULL the degenerate by CASE.
    w_raw = F.col("n_h").cast("double") * F.col("sd_h") / F.col("total")
    w_h = F.when(F.col("total") > 0.0, w_raw)
    alloc = F.when(
        F.col("total") > 0.0, F.floor(F.lit(1000.0) * w_raw).cast("bigint")
    )
    return out.select(
        "event_type", "n_h", "sd_h", w_h.alias("w_h"), alloc.alias("alloc"),
    ).orderBy("event_type")
