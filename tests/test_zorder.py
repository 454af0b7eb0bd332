"""Z-order layout test: after z-ordering lineitem by (l_partkey,
l_suppkey), per-file min/max spans must shrink on BOTH columns vs the
natural (orderkey) layout — the property that makes multi-column
data-skipping work."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.zorder import zorder_by
from tests.conftest import SF_DIR


def _mean_span(path: str, cols: list[str]) -> dict[str, float]:
    """Average (file min/max span / global span) per column across the
    parquet files under ``path``."""
    lo: dict[str, float] = {}
    hi: dict[str, float] = {}
    spans: dict[str, list[float]] = {c: [] for c in cols}
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 4, f"need several files for a meaningful test, got {len(files)}"
    metas = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        file_stats = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                s = col.statistics
                cur = file_stats.get(name)
                mn, mx = s.min, s.max
                if cur:
                    mn, mx = min(mn, cur[0]), max(mx, cur[1])
                file_stats[name] = (mn, mx)
        metas.append(file_stats)
        for name, (mn, mx) in file_stats.items():
            lo[name] = min(lo.get(name, mn), mn)
            hi[name] = max(hi.get(name, mx), mx)
    for file_stats in metas:
        for name, (mn, mx) in file_stats.items():
            spans[name].append((mx - mn) / max(hi[name] - lo[name], 1))
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_shrinks_file_spans_on_both_keys(spark, tmp_dir):
    cols = ["l_partkey", "l_suppkey"]
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", *cols)

    natural_path = os.path.join(tmp_dir, "natural")
    zorder_path = os.path.join(tmp_dir, "zordered")
    per_file = 4000

    (
        li.orderBy("l_orderkey")
        .coalesce(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(natural_path)
    )
    (
        zorder_by(li, cols)
        .coalesce(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(zorder_path)
    )

    natural = _mean_span(natural_path, cols)
    zordered = _mean_span(zorder_path, cols)
    for c in cols:
        assert zordered[c] < 0.6 * natural[c], (
            f"{c}: z-order span {zordered[c]:.3f} not < 0.6x natural {natural[c]:.3f}"
        )


def test_zorder_preserves_rows(spark, tmp_dir):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    z = zorder_by(li, ["l_partkey", "l_suppkey"])
    assert z.count() == li.count()
    assert sorted(z.columns) == sorted(li.columns)


def test_hilbert_shrinks_file_spans_on_both_keys(spark, tmp_dir):
    """Same layout property for the Hilbert gear: per-file spans must
    shrink on BOTH keys vs natural — and hold the same < 0.6x bar the
    Morton layout meets (adjacency makes its boxes tighter still; the
    EFFECT measurement lives in tools/zorder_bench.py's hilbert_xy
    leg)."""
    from noaa_etl_spark.operators.zorder import hilbert_by

    cols = ["l_partkey", "l_suppkey"]
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", *cols)

    natural_path = os.path.join(tmp_dir, "h_natural")
    hilbert_path = os.path.join(tmp_dir, "hilberted")
    per_file = 4000

    (
        li.orderBy("l_orderkey")
        .coalesce(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(natural_path)
    )
    (
        hilbert_by(li, cols)
        .coalesce(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", per_file)
        .parquet(hilbert_path)
    )

    natural = _mean_span(natural_path, cols)
    hilberted = _mean_span(hilbert_path, cols)
    for c in cols:
        assert hilberted[c] < 0.6 * natural[c], (
            f"{c}: hilbert span {hilberted[c]:.3f} not < 0.6x natural "
            f"{natural[c]:.3f}"
        )


def test_hilbert_preserves_rows(spark, tmp_dir):
    from noaa_etl_spark.operators.zorder import hilbert_by

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    h = hilbert_by(li, ["l_partkey", "l_suppkey"])
    assert h.count() == li.count()
    assert sorted(h.columns) == sorted(li.columns)
