"""UDF / UDAF / UDTF surface (SURVEY.md §2.K) — the sanctioned Python
escape hatches, each exercised by a graded query:

- scalar pandas_udf (Arrow-vectorized, Series→Series)
- grouped-aggregate pandas_udf (Series→scalar, used in groupBy.agg)
- applyInPandas (grouped map, DataFrame→DataFrame per group)
- mapInPandas (partition-batch map)
- Python UDTF (row → rows table function, via SQL LATERAL)

Determinism discipline: every UDF here either produces exact integers
or matches the oracle's accumulation order explicitly (see
q_udaf_trimmed_mean) — a UDF that sums doubles in arbitrary order would
break the driver's value hash.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from noaa_etl_spark.io import load_table
from noaa_etl_spark.registry import graded


# --- row-at-a-time scalar UDF (the documented last resort) ------------


@graded(
    "q_scalar_udf_lastresort",
    oracle="""
    SELECT n_nationkey,
           upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
             AS name_title
    FROM nation
    ORDER BY n_nationkey
    """,
)
def q_scalar_udf_lastresort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (`F.udf`) — implemented ONCE, on a
    25-row dimension, to document the §2.K row and why it is the last
    resort: each row round-trips JVM→pickle→Python→pickle→JVM with no
    vectorization, 10-100× slower than a pandas_udf and worse than the
    pure-expression form (which this query is deliberately also
    expressible as — see the oracle). This is the engine's ONLY
    row-at-a-time UDF; every hot-path Python escape uses Arrow
    (pandas_udf / applyInPandas / mapInPandas). Use only for tiny
    bounded inputs calling a library that has no vectorized form."""

    def title_case(s: str) -> str:
        return s[:1].upper() + s[1:].lower() if s else s

    title_udf = F.udf(title_case, "string")
    nat = load_table(spark, sf_dir, "nation")
    return (
        nat.select("n_nationkey", title_udf("n_name").alias("name_title"))
        .orderBy("n_nationkey")
    )


# --- scalar pandas_udf ------------------------------------------------


@pandas_udf(DoubleType())
def _log1p_score(v: pd.Series) -> pd.Series:
    # numpy log over doubles matches libm/DuckDB ln bit-for-bit on this
    # domain; output is rounded Spark-side anyway.
    import numpy as np

    return pd.Series(np.log1p(v.to_numpy()))


@graded(
    "q_pandas_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           round(ln(1.0 + o_totalprice), 6) AS price_score
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF (Series→Series). The expression is
    native-expressible on purpose — the graded point is that the Arrow
    round trip is lossless and deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.round(_log1p_score(F.col("o_totalprice")), 6).alias("price_score"),
        )
        .orderBy("o_orderkey")
    )


# --- grouped-aggregate pandas_udf (UDAF) ------------------------------


@pandas_udf(DoubleType())
def _trimmed_count(v: pd.Series) -> float:
    n = len(v)
    return float(n - 2 * int(n * 0.05))


@pandas_udf(DoubleType())
def _trimmed_sum(v: pd.Series) -> float:
    """Sum of values strictly inside the [5%, 95%] rank band, accumulated
    sequentially in ascending order — mirrors the oracle's
    ``sum(x ORDER BY x)`` so double addition happens in the same order."""
    import numpy as np

    arr = np.sort(v.to_numpy())
    n = len(arr)
    k = int(n * 0.05)
    acc = 0.0
    for x in arr[k : n - k]:
        acc += float(x)
    return acc


@graded(
    "q_udaf_trimmed_mean",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*)    OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           count(*)                                        AS trimmed_n,
           round(sum(l_extendedprice ORDER BY l_extendedprice), 4) AS trimmed_sum
    FROM ranked
    -- floor, not CAST: DuckDB CAST-to-int rounds half away from zero,
    -- while the UDF's Python int() truncates — they diverge whenever
    -- n*0.05 has a fractional part >= 0.5.
    WHERE rn > CAST(floor(n * 0.05) AS BIGINT) AND rn <= n - CAST(floor(n * 0.05) AS BIGINT)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (trimmed sum/count: drop the 5% tails by rank)
    as a grouped-agg pandas UDF — the canonical 'robust statistic the
    built-ins lack' case (NOAA framing: trimmed mean of observations)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _trimmed_count(F.col("l_extendedprice")).cast("bigint").alias("trimmed_n"),
            F.round(_trimmed_sum(F.col("l_extendedprice")), 4).alias("trimmed_sum"),
        )
        .orderBy("l_returnflag")
    )


# --- applyInPandas (grouped map) --------------------------------------


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    m = pdf["o_totalprice"].mean()
    s = pdf["o_totalprice"].std(ddof=1)
    out = pd.DataFrame(
        {
            "o_orderkey": pdf["o_orderkey"],
            "z": (pdf["o_totalprice"] - m) / s,
        }
    )
    return out


@graded(
    "q_grouped_zscore",
    oracle="""
    WITH sized AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             count(*) OVER (PARTITION BY o_custkey) AS n
      FROM orders
    )
    SELECT o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_custkey))
                 / stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey), 6) AS z
    FROM sized
    WHERE n >= 2
    ORDER BY o_orderkey
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer z-score normalization via applyInPandas (grouped
    map). Groups are tiny (orders per customer) so per-group double sums
    agree with the window-SQL oracle at 6-decimal rounding.

    Scale: applyInPandas shuffles on the group key once; group state is
    bounded by the largest customer — the right tool only when the
    transform is genuinely non-expressible (here it is expressible; the
    graded point is the Arrow grouped-map path itself)."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    multi = orders.join(counts.filter(F.col("n") >= 2), "o_custkey")
    result = multi.select("o_custkey", "o_orderkey", "o_totalprice").groupBy("o_custkey").applyInPandas(
        _zscore_group, "o_orderkey bigint, z double"
    )
    return result.select("o_orderkey", F.round("z", 6).alias("z")).orderBy("o_orderkey")


# --- mapInPandas (partition-batch map) --------------------------------


def _vowel_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_vowels": pdf["text"].str.count(r"[aeiou]").astype("int64"),
            }
        )


@graded(
    "q_mapinpandas_vowels",
    oracle="""
    SELECT doc_id,
           length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels
    FROM documents
    ORDER BY doc_id
    """,
)
def q_mapinpandas_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-batch transform via mapInPandas (the batch-inference
    shape: Arrow batches in, Arrow batches out, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "text")
        .mapInPandas(_vowel_counts, "doc_id bigint, n_vowels bigint")
        .orderBy("doc_id")
    )


# --- co-grouped applyInPandas -----------------------------------------


def _merge_user_activity(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    uid = purchases["user_id"].iloc[0] if len(purchases) else clicks["user_id"].iloc[0]
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_purchases": [len(purchases)],
            "n_clicks": [len(clicks)],
            "purchase_floor_value": [int(purchases["fv"].sum()) if len(purchases) else 0],
        }
    )


@graded(
    "q_cogroup_merge",
    oracle="""
    WITH p AS (
      SELECT user_id, count(*) AS n_purchases,
             sum(CAST(floor(value) AS BIGINT)) AS purchase_floor_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    c AS (
      SELECT user_id, count(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT coalesce(p.user_id, c.user_id)          AS user_id,
           coalesce(p.n_purchases, 0)              AS n_purchases,
           coalesce(c.n_clicks, 0)                 AS n_clicks,
           CAST(coalesce(p.purchase_floor_value, 0) AS BIGINT) AS purchase_floor_value
    FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
    ORDER BY user_id
    """,
)
def q_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped applyInPandas: two grouped DataFrames (purchases,
    clicks) aligned per user and merged in one pandas function — the
    Arrow path for per-key multi-source reconciliation. The oracle is
    the relational full-outer-join equivalent."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "fv", F.floor("value").cast("bigint")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "fv")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "fv")
    merged = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            _merge_user_activity,
            "user_id bigint, n_purchases bigint, n_clicks bigint, purchase_floor_value bigint",
        )
    )
    return merged.orderBy("user_id")


# --- Python UDTF ------------------------------------------------------


@udtf(returnType="token_idx INT, token STRING")
class _SplitTokens:
    """Row → rows table function: emit (position, token) per word."""

    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok


@graded(
    "q_udtf_tokens",
    oracle="""
    -- Lockstep unnest of the token list and its 1-based index range.
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(unnest(range(1, len(l) + 1)) AS INT) AS token_idx,
           unnest(l)                                 AS token
    FROM t
    ORDER BY doc_id, token_idx
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding documents into (token_idx, token) rows via
    SQL LATERAL — the typed row→rows extension point."""
    spark.udtf.register("split_tokens", _SplitTokens)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 20).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.token_idx, s.token
        FROM udtf_docs d, LATERAL split_tokens(d.text) s
        ORDER BY d.doc_id, s.token_idx
        """
    )


# --- Python UDTF with dynamic schema (analyze) ------------------------


class _FixedSlices:
    """UDTF whose OUTPUT SCHEMA is computed at plan time from a constant
    argument: ``fixed_slices(text, 'head:16,mid:16')`` emits one column
    per spec entry. The ``analyze`` hook is the Spark-4 extension point
    for table functions whose shape depends on their arguments — the
    Python-side equivalent of a macro expanding to a typed projection.
    """

    @staticmethod
    def analyze(text, spec):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        schema = StructType()
        for part in spec.value.split(","):
            name, _width = part.split(":")
            schema = schema.add(name, StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text, spec):
        out, pos = [], 0
        for part in spec.split(","):
            _name, width = part.split(":")
            w = int(width)
            out.append((text or "")[pos : pos + w])
            pos += w
        yield tuple(out)


@graded(
    "q_udtf_dynamic_schema",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 16)  AS head,
           substr(text, 17, 16) AS mid
    FROM documents
    WHERE doc_id < 20
    ORDER BY doc_id
    """,
)
def q_udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema Python UDTF via the ``analyze`` hook: the output
    columns (head, mid — 16 chars each) exist only because the constant
    spec argument says so; change the spec literal and the plan gets a
    different schema with no Python-side code change. Oracle replays
    the slices as plain substr projections.

    100 TB: per-row work is a bounded string slice; the UDTF runs
    Arrow-batched like any Python UDTF — fine off the hot path, and the
    pattern's value is plan-time typing, not throughput."""
    spark.udtf.register("fixed_slices", udtf(_FixedSlices))
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 20).createOrReplaceTempView("udtf_dyn_docs")
    # No ORDER BY: the graded compare is order-insensitive (house rule).
    return spark.sql(
        """
        SELECT d.doc_id, s.head, s.mid
        FROM udtf_dyn_docs d,
             LATERAL fixed_slices(d.text, 'head:16,mid:16') s
        """
    )


@graded(
    "q_fuzzy_rank",
    oracle="""
    WITH cand AS (
        SELECT a.p_partkey AS left_key, b.p_partkey AS right_key,
               jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey <> b.p_partkey
        WHERE a.p_partkey <= 200 AND b.p_partkey <= 200
    ),
    ranked AS (
        SELECT left_key, right_key, jw,
               row_number() OVER (PARTITION BY left_key
                                  ORDER BY jw DESC, right_key) AS rnk
        FROM cand
    )
    SELECT left_key, right_key, jw, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY left_key, rnk
    """,
)
def q_fuzzy_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler similarity ranking (functions/strings.py): for each
    part in a bounded slice, the 3 most-similar same-brand part names —
    the "did you mean" / survivor-ranking step that runs AFTER a
    blocking join has bounded the candidate space. The UDF is
    calibrated bit-exactly against DuckDB's jaro_winkler_similarity
    (0.7 boost threshold, p=0.1, prefix cap 4 — 300+ randomized pairs
    in tests), so the similarity FLOATS themselves are graded, not just
    the ranks; ties at the rank boundary break on right_key for
    engine-agnostic determinism.

    100 TB: the brand equi-join does the heavy lifting (blocking =
    hash join, no cross join — same doctrine as operators/fuzzy.py);
    the Arrow-batched Python scorer touches only surviving pairs.
    Corpus-scale edit-distance joins stay on the JVM levenshtein path
    (q_fuzzy_name_match); this is the richer scorer for the bounded
    tail.
    """
    from noaa_etl_spark.functions.strings import jaro_winkler

    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_brand", "p_name")
    )
    a = part.select(
        F.col("p_partkey").alias("left_key"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("left_name"),
    )
    b = part.select(
        F.col("p_partkey").alias("right_key"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("right_name"),
    )
    cand = (
        a.join(b, "brand")
        .filter(F.col("left_key") != F.col("right_key"))
        .select(
            "left_key",
            "right_key",
            jaro_winkler("left_name", "right_name").alias("jw"),
        )
    )
    w = Window.partitionBy("left_key").orderBy(F.desc("jw"), F.asc("right_key"))
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .orderBy("left_key", "rnk")
    )


@graded(
    "q_mapinarrow_hist",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS floor_total
    FROM orders
    GROUP BY 1
    """,
)
def q_mapinarrow_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow partial aggregation (§2.K — the zero-copy tier below
    mapInPandas): per-Arrow-batch price-band histogram computed with
    pyarrow.compute kernels directly on the columnar buffers — no
    pandas materialization, no per-row Python — then ONE combinable
    Spark agg merges the per-batch partials. This is the map-side-
    combine pattern expressed in user code: the shuffle carries ≤
    |buckets| rows per batch instead of the fact table, exactly how a
    custom sketch/partial-agg should ride Arrow at 100 TB.

    Exactness: bucket = floor(price/50000) — one IEEE division + floor,
    identical in pyarrow/Spark/DuckDB; floor-cents totals are exact
    BIGINTs, merged by integer addition (order-free).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")

    def batch_hist(batches):
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            price = tbl.column("o_totalprice")
            part = pa.table(
                {
                    "bucket": pc.floor(pc.divide(price, 50000.0)).cast(pa.int64()),
                    "fp": pc.floor(price).cast(pa.int64()),
                }
            )
            g = part.group_by("bucket").aggregate(
                [("fp", "sum"), ("fp", "count")]
            )
            out = pa.table(
                {
                    "bucket": g["bucket"],
                    "n_part": g["fp_count"].cast(pa.int64()),
                    "floor_part": g["fp_sum"],
                }
            )
            yield from out.to_batches()

    partials = orders.mapInArrow(
        batch_hist, "bucket bigint, n_part bigint, floor_part bigint"
    )
    return partials.groupBy("bucket").agg(
        F.sum("n_part").cast("bigint").alias("n"),
        F.sum("floor_part").cast("bigint").alias("floor_total"),
    )


@graded(
    "q_applyinarrow_stats",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_applyinarrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInArrow (§2.K — the zero-copy tier below
    applyInPandas): each group arrives as a pyarrow.Table and the
    per-group statistic is computed with pyarrow.compute kernels
    directly on the buffers — the grouped sibling of q_mapinarrow_hist,
    for per-group logic the built-ins can't express (model fits,
    custom normalizations) when pandas materialization is pure
    overhead.

    Exactness: all outputs are exact integers (floor-cents min/max/sum,
    count) — Arrow integer kernels are order-free, so the grade needs
    no float discipline at all.

    Scale: one shuffle on the group key (identical to groupBy.agg's
    layout); per-group memory is the group's Arrow buffers — the same
    celebrity-key caveat as every grouped-map (route hot keys through
    combinable aggs instead; this surface is for logic that NEEDS the
    whole group).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )

    def group_stats(tbl: "pa.Table") -> "pa.Table":
        cents = tbl.column("cents")
        return pa.table(
            {
                "o_orderstatus": [tbl.column("o_orderstatus")[0].as_py()],
                "n": pa.array([tbl.num_rows], pa.int64()),
                "min_cents": pa.array([pc.min(cents).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
            }
        )

    return orders.groupBy("o_orderstatus").applyInArrow(
        group_stats,
        "o_orderstatus string, n bigint, min_cents bigint, "
        "max_cents bigint, sum_cents bigint",
    )


class _PartitionSummary:
    """Table-argument UDTF: one instance per PARTITION BY group; eval
    sees every row of its partition, terminate emits the summary row.
    math.floor keeps the cents total exact (int() truncation and
    DuckDB CAST round differently — the trimmed_mean lesson)."""

    def __init__(self):
        self._status = None
        self._n = 0
        self._floor_total = 0

    def eval(self, row):
        import math

        self._status = row["o_orderstatus"]
        self._n += 1
        self._floor_total += math.floor(row["o_totalprice"])

    def terminate(self):
        yield self._status, self._n, self._floor_total


@graded(
    "q_udtf_table_arg",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS floor_total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-argument UDTF with PARTITION BY (§2.K, Spark 3.5+/4): the
    SQL-callable per-group program — `FROM my_udtf(TABLE(t) PARTITION BY
    k)` hands each group to one UDTF instance (eval per row, terminate
    emits), the SQL surface twin of applyInPandas/applyInArrow for
    consumers who live in SQL. The summary here is deliberately
    integer-exact (count + floor-cents via math.floor — never int()
    truncation); custom sessionizers/legacy per-group programs are the
    real payload.

    Scale: PARTITION BY shuffles once on the group key — the same
    layout as groupBy; the UDTF streams its partition row-by-row
    (Python-rate, the honest cost of the SQL-callable escape hatch —
    push anything combinable into real aggs first)."""
    from pyspark.sql.functions import udtf

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "udtf_orders_v"
    )
    spark.udtf.register(
        "partition_summary",
        udtf(
            _PartitionSummary,
            returnType="status string, n bigint, floor_total bigint",
        ),
    )
    return spark.sql(
        "SELECT * FROM partition_summary(TABLE(udtf_orders_v) "
        "PARTITION BY o_orderstatus)"
    )


SQL_UDF_ORACLE = """
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS tier,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer GROUP BY 1
    """


@graded("q_sql_udf", oracle=SQL_UDF_ORACLE)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (Spark 4 CREATE FUNCTION ... RETURN <expr>) — the
    §2.K surface that is NOT an escape hatch: unlike every Python UDF
    variant, a SQL UDF's body is INLINED by Catalyst into the calling
    plan, so it optimizes like any expression (predicate pushdown
    through it, whole-stage codegen, no serialization boundary) — at
    100 TB this is the form a reusable business rule should take, with
    Python UDFs reserved for logic SQL cannot express. The sibling
    TABLE form (RETURNS TABLE ... RETURN SELECT) is exercised in
    tests/test_round15_ops.py.

    The oracle replays the CASE body inline — which is exactly the
    inlining contract being graded: calling the function must equal
    writing its body."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("sqludf_customer_v")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION balance_tier(b DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN b < 0 THEN 'debt' "
        "WHEN b < 5000 THEN 'low' ELSE 'high' END"
    )
    return spark.sql(
        "SELECT balance_tier(c_acctbal) AS tier, "
        "CAST(count(*) AS BIGINT) AS n_cust, "
        "CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) "
        "AS bal_cents "
        "FROM sqludf_customer_v GROUP BY balance_tier(c_acctbal)"
    )
