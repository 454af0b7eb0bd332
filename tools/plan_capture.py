#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python tools/plan_capture.py <tag> <suffix> [query ...]
e.g.   python tools/plan_capture.py r15 before q_pricing_summary ...
Writes plans/<tag>/<query>_<suffix>.txt. No job execution — plans only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noaa_etl_spark.plans.audit import formatted_plan  # noqa: E402
from noaa_etl_spark.queries import QUERIES  # noqa: E402
from noaa_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            plan = formatted_plan(QUERIES[name](spark, sf_dir))
        except Exception as ex:
            plan = f"ERROR: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
