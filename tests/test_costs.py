"""Plan-shape regression gate against the committed COSTS.json.

Wall-clock at fixture scale hides plan regressions behind fixed
overhead; the shuffle count does not. A headline query that GAINS an
Exchange (or loses a ReusedExchange) versus the committed audit is a
100 TB regression even if sf0.1 latency looks flat — fail it here.

COSTS.json is regenerated deliberately via `python tools/cost_audit.py`
when a plan change is intended; this test only guards against
accidental regressions.
"""

from __future__ import annotations

import json
import os

import pytest

from noaa_etl_spark.plans.audit import executed_exchange_counts
from noaa_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR

_COSTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COSTS.json"
)
with open(_COSTS_PATH) as f:
    COSTS = json.load(f)["queries"]


@pytest.mark.parametrize("name", sorted(COSTS))
def test_no_new_shuffles_vs_committed_costs(spark, name):
    """Exchanges may only go DOWN vs the committed audit (AQE broadcasts
    more at the smaller test SF); any gain means a new shuffle crept in."""
    df = QUERIES[name](spark, SF_DIR)
    exchanges, reused = executed_exchange_counts(df)
    committed = COSTS[name]
    assert exchanges <= committed["exchanges"], (
        f"{name}: {exchanges} exchanges vs committed {committed['exchanges']} — "
        f"a shuffle was added; if intended, regenerate COSTS.json "
        f"(python tools/cost_audit.py)"
    )
    assert reused >= committed["reused_exchanges"], (
        f"{name}: lost a ReusedExchange ({reused} < {committed['reused_exchanges']})"
    )


def test_gate_catches_injected_repartition(spark):
    """Self-test: an injected repartition() must trip the gate."""
    df = QUERIES["q_pricing_summary"](spark, SF_DIR).repartition(8)
    exchanges, _ = executed_exchange_counts(df)
    assert exchanges > COSTS["q_pricing_summary"]["exchanges"]
