#!/usr/bin/env python
"""Surgical COSTS.json update: audit ONLY the named queries (batch
and/or streaming) and merge their entries into the existing file —
for late-round additions after a full tools/cost_audit.py run (the
round-12 precedent: a full regen costs ~an hour; a late op needs one
entry).

Usage: python tools/costs_surgical.py q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.cost_audit import SF_DIR, TEST_SF_DIR, audit_query


def main() -> None:
    names = sys.argv[1:]
    assert names, "pass query names"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "COSTS.json")
    with open(path) as f:
        payload = json.load(f)

    from noaa_etl_spark.plans.audit import stream_plan_exchange_counts
    from noaa_etl_spark.queries import QUERIES
    from noaa_etl_spark.registry import load_all_queries
    from noaa_etl_spark.session import get_spark
    from noaa_etl_spark.streaming.core import LAST_STREAM_PLANS, STREAM_PLAN_KEYS

    load_all_queries()
    spark = get_spark("costs-surgical", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    import time

    for name in names:
        if name in STREAM_PLAN_KEYS:
            t0 = time.perf_counter()
            QUERIES[name](spark, TEST_SF_DIR).collect()
            ex = bc = ru = state_ops = 0
            for key in STREAM_PLAN_KEYS[name]:
                plan = LAST_STREAM_PLANS.get(key)
                if plan is None:
                    raise RuntimeError(f"no captured plan {key!r} for {name}")
                e, b, r = stream_plan_exchange_counts(plan)
                ex, bc, ru = ex + e, bc + b, ru + r
                state_ops += plan.count("StateStore")
            payload["streaming_test_sf"][name] = {
                "exchanges": ex,
                "broadcast_exchanges": bc,
                "reused_exchanges": ru,
                "state_store_ops": state_ops,
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
            print("stream", name, json.dumps(payload["streaming_test_sf"][name]), flush=True)
        else:
            for section, sf_dir in [("queries", SF_DIR), ("queries_test_sf", TEST_SF_DIR)]:
                audit_query(spark, name, QUERIES[name], sf_dir)  # warm-up
                payload[section][name] = audit_query(spark, name, QUERIES[name], sf_dir)
                print(sf_dir, name, json.dumps(payload[section][name]), flush=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"merged {len(names)} entries into {path}")
    spark.stop()


if __name__ == "__main__":
    main()
