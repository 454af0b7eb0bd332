"""Global sort index: stable 0-based positions under a total order.

Spark has no DataFrame-native zipWithIndex, and the naive
``row_number() OVER (ORDER BY ...)`` plans a GLOBAL window — every row
through ONE reducer, the canonical scale cliff. This operator assigns
the identical positions with no single-task stage, using the classic
two-pass range scheme (the same structure RDD.zipWithIndex uses, kept
in DataFrame/Arrow land):

1. ``repartitionByRange`` on the sort keys (sampled contiguous ranges —
   partition i holds keys strictly below partition i+1), then
   ``sortWithinPartitions``.
2. ONE ``mapInPandas`` pass assigns per-partition local indexes (the
   generator is per-partition, so a running counter across Arrow
   batches is exact) and tags ``spark_partition_id``.
3. Per-partition row counts — bounded by the partition count, NOT the
   data — are collected to the driver (the zipWithIndex adjudication:
   ≤ a few thousand longs at any scale) and turned into a literal
   offset map; position = offset[pid] + local index, a pure projection.

Positions are deterministic iff the sort spec is a TOTAL order (pass a
unique tiebreaker); partition boundaries then cannot change any
position, only which task computes it.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_sort_index(
    df: DataFrame,
    sort_spec: list[tuple[str, bool]],
    out_col: str = "position",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Add ``out_col`` = the row's 0-based rank under ``sort_spec``
    ([(col, ascending), ...] — must be a total order), computed without
    a global single-reducer sort. Returns df's columns + ``out_col``.

    ``materialize=False`` skips the localCheckpoint so the FULL lazy
    plan (range exchange + mapInPandas, no Window/Join) stays visible —
    for plan tests only: the counts pass and the returned frame then
    each recompute the range shuffle + sort.
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order_cols = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in sort_spec
    ]
    ranged = df.repartitionByRange(p, *order_cols).sortWithinPartitions(*order_cols)
    tagged = ranged.withColumn("_pid", F.spark_partition_id().cast("bigint"))

    out_schema = StructType(
        tagged.schema.fields + [StructField("_lidx", LongType(), False)]
    )

    def assign(batches: Iterator) -> Iterator:
        import numpy as np

        n_seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_lidx"] = np.arange(n_seen, n_seen + len(pdf), dtype="int64")
            n_seen += len(pdf)
            yield pdf

    indexed = tagged.mapInPandas(assign, out_schema)
    if materialize:
        indexed = indexed.localCheckpoint()
    # Per-partition counts: bounded by the partition count (a few
    # thousand longs at any scale) — the one adjudicated collect, same
    # as RDD.zipWithIndex's count job. localCheckpoint above keeps the
    # range shuffle + sort from running twice (the Ed-Join lesson)
    # without leaking a cached frame per call (persist has no
    # unpersist point here — the counts collect AND the returned frame
    # both read it) and without persist's plan-accounting pollution.
    counts = {
        r["_pid"]: r["n"]
        for r in indexed.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:  # empty input: create_map() takes >=1 pair
        offsets = {0: 0}
    offset_map = F.create_map(
        *[F.lit(x).cast("bigint") for kv in sorted(offsets.items()) for x in kv]
    )
    keep = [c for c in df.columns]
    return indexed.select(
        *keep,
        (F.element_at(offset_map, F.col("_pid")) + F.col("_lidx"))
        .cast("bigint")
        .alias(out_col),
    )
