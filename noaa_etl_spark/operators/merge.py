"""Merge / upsert and slowly-changing-dimension primitives — the load
side of the reference ETL (idempotent re-loads, dimension versioning).

Spark core has no MERGE INTO (that is a table-format feature); the
engine provides the dataframe-level equivalent:

- ``merge_upsert``: replace-or-insert by key. One anti-join (shuffle on
  the key) + union — no driver involvement, deterministic.
- ``scd2_intervals``: turn a change log into SCD-type-2 validity
  intervals ([valid_from, valid_to), open-ended current row) with one
  lead() window — the standard dimension-history build.

At 100 TB: both are single-shuffle ops on the natural key; pair
``merge_upsert`` with partitioned parquet rewrites of only the
partitions containing matched keys (partition pruning on the write
side), which is what table formats automate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``source`` replace same-key rows in ``target``; source
    rows with new keys are appended. Schemas must match by name."""
    untouched = target.join(source.select(*keys), keys, "left_anti")
    return untouched.unionByName(source)


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Change log → SCD2 history: adds ``valid_from`` (the change ts),
    ``valid_to`` (next change ts within the key, NULL while current) and
    ``is_current``."""
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
