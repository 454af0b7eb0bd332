#!/usr/bin/env python
"""Optimization-round probe: warm per-query wall times through the noop
sink (guide §1.4 — times the computation, not the sink/collect), in ONE
session so JIT warmth is shared and readings are comparable.

Usage: python tools/opt_probe.py [query ...]   (default: the target list)
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), OPT_PROBE_RUNS (default 3).

Prints per-query: median of N warm runs (first run discarded as warmup),
plus min/max. One line of JSON at the end for machine diffing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noaa_etl_spark.queries import QUERIES  # noqa: E402
from noaa_etl_spark.session import get_spark  # noqa: E402

# Headline set + the slowest COSTS.json walls (sf0.1 audit readings).
DEFAULT = [
    "q_pricing_summary",
    "q_join3_topk",
    "q_join5_region",
    "q_window_rank",
    "q_window_rolling_1h",
    "q_sessionize",
    "q_json_extract",
    "q_dedup_exact",
    "q_knn_cosine",
    "q_wordcount",
    # top non-headline walls from COSTS.json (cold-audit readings)
    "q_table_diff",
    "q_cms_frequencies",
    "q_dedup_ngram_jaccard_capped",
    "q_containment_dedup",
    "q_dq_checks",
    "q_bootstrap_ci",
    "q_geo_cluster",
    "q_wilcoxon_signed_rank",
    "q_kruskal_wallis",
    "q_cochran_armitage",
    "q_diff_in_diff",
    "q_proration_largest_remainder",
    "q_entity_resolution",
    "q_perplexity_filter",
    "q_rbo_rank_similarity",
    "q_repetition_filter",
    "q_stats_skipping",
    "q_conformal_interval",
    "q_friedman_test",
    "q_cramers_v",
    "q_ngram_novelty",
    "q_mcc_score",
    "q_fuzzy_name_match",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("OPT_PROBE_RUNS", "3"))
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        samples = []
        try:
            for i in range(runs + 1):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                if i > 0:  # discard the in-query warmup run
                    samples.append(dt)
            med = statistics.median(samples)
            out[name] = round(med, 3)
            print(
                f"{name}: {med:.3f}s  (min {min(samples):.3f} max {max(samples):.3f})",
                flush=True,
            )
        except Exception as ex:  # a probe must never abort the sweep
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "medians": out}))
    spark.stop()


if __name__ == "__main__":
    main()
