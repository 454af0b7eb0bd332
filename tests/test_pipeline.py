"""GHCN pipeline end-to-end test (run_pipeline surface) and ingest
failure-mode tests (FAILFAST on malformed CSV)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.pipelines.ghcn import run_pipeline
from noaa_etl_spark.queries.noaa import _synth_obs, format_dly
from noaa_etl_spark.sources import read_csv
from tests.conftest import SF_SMALL


def test_run_pipeline_end_to_end(spark, tmp_dir):
    """run_pipeline over synthesized .dly files must produce partitioned
    observations and a monthly rollup consistent with the inputs."""
    dly_dir = os.path.join(tmp_dir, "dly")
    out_dir = os.path.join(tmp_dir, "out")
    obs = _synth_obs(spark, SF_SMALL)
    monthly = obs.groupBy("station_id", "year", "month", "element").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("day", F.struct("value_scaled", "qflag"))))
        ).alias("days")
    )
    format_dly(monthly).coalesce(1).write.mode("overwrite").text(dly_dir)

    run_pipeline(spark, dly_dir, out_dir)

    observations = spark.read.parquet(os.path.join(out_dir, "observations"))
    rollup = spark.read.parquet(os.path.join(out_dir, "monthly_climate"))
    # QC'd observation count equals the synthesized clean rows.
    expected_clean = obs.filter(F.col("qflag") == "").count()
    assert observations.count() == expected_clean
    # Year partitioning materialized as directories.
    years = {r["obs_year"] for r in observations.select("obs_year").distinct().collect()}
    dirs = {d for d in os.listdir(os.path.join(out_dir, "observations")) if d.startswith("obs_year=")}
    assert {f"obs_year={y}" for y in years} == dirs
    # Rollup keys cover every (station, month, element) present.
    assert rollup.count() == (
        observations.select(
            "station_id", F.year("obs_date"), F.month("obs_date"), "element"
        )
        .distinct()
        .count()
    )


def test_csv_failfast_raises_on_malformed(spark, tmp_dir):
    """FAILFAST ingest must raise on a malformed row rather than
    silently nulling it (the QC-grade ingest contract)."""
    path = os.path.join(tmp_dir, "bad.csv")
    with open(path, "w") as f:
        f.write("id,value\n1,10.5\n2,not_a_number\n3,30.25\n")
    df = read_csv(spark, path, "id BIGINT, value DOUBLE")
    with pytest.raises(Exception) as err:
        df.collect()
    assert "Malformed" in str(err.value) or "FAILFAST" in str(err.value)


def test_csv_permissive_mode_nulls_malformed(spark, tmp_dir):
    """The exploratory path: PERMISSIVE mode keeps the row with a NULL
    in the bad field instead of failing."""
    path = os.path.join(tmp_dir, "bad2.csv")
    with open(path, "w") as f:
        f.write("id,value\n1,10.5\n2,not_a_number\n3,30.25\n")
    df = (
        spark.read.schema("id BIGINT, value DOUBLE")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    rows = {r["id"]: r["value"] for r in df.collect()}
    assert rows[1] == 10.5
    assert rows[2] is None
    assert rows[3] == 30.25
