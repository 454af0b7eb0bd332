"""Pins promised by operators/graph.py docstrings (VERDICT r15 item 9 /
ADVICE r15): the driver union-find local path, the auto size dispatch
(both arms), and the bounded variant's over-cap raises — each equal to
the distributed loop's exact min-label fixpoint."""

import random

import pytest
from pyspark.sql import functions as F

from noaa_etl_spark.operators.graph import (
    _local_union_find,
    connected_components,
    connected_components_auto,
    connected_components_bounded,
)


def _random_edges(seed: int, n_nodes: int = 60, n_edges: int = 90):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def _reference_components(edges):
    """Pure-Python min-label reference (independent of _local_union_find)."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for start in adj:
        if start in out:
            continue
        seen, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(seen)
        for x in seen:
            out[x] = m
    return out


@pytest.mark.parametrize("seed", [1, 7])
def test_local_union_find_matches_distributed(spark, seed):
    """_local_union_find == the distributed loop's exact fixpoint
    (component = min reachable node id) on random multigraphs."""
    edges = _random_edges(seed)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ref = _reference_components(edges)
    dist = _labels(connected_components(df))
    local = dict(
        _local_union_find([{"u": u, "v": v} for u, v in edges])
    )
    assert dist == ref
    assert local == ref


def test_auto_takes_both_dispatch_arms_identically(spark):
    """connected_components_auto: local arm (default cap) and distributed
    arm (cap forced to 0) produce identical labels."""
    edges = _random_edges(3)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ref = _reference_components(edges)
    assert _labels(connected_components_auto(df)) == ref
    assert _labels(connected_components_auto(df, local_edge_cap=0)) == ref


def test_auto_dispatch_boundary_raw_rows(spark):
    """The r16 probe counts RAW rows (no distinct shuffle): duplicate
    edges can push a borderline graph to the distributed arm — both
    sides of the boundary stay label-identical."""
    edges = [(1, 2), (2, 3), (1, 2), (1, 2)]  # 4 raw rows, 2 distinct
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    ref = {1: 1, 2: 1, 3: 1}
    # cap 4 = raw count -> local arm; cap 3 < raw count -> distributed
    # (even though distinct count 2 <= 3: conservative by design).
    assert _labels(connected_components_auto(df, local_edge_cap=4)) == ref
    assert _labels(connected_components_auto(df, local_edge_cap=3)) == ref


def test_auto_distributed_arm_honors_round_cap(spark):
    """max_rounds reaches the distributed arm (local arm always
    converges; dedup.connected_components pins the explicit-cap raise)."""
    chain = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(chain, "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_auto(df, max_rounds=1, local_edge_cap=0)


def test_bounded_matches_distributed(spark):
    edges = _random_edges(11, n_nodes=30, n_edges=40)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    assert _labels(connected_components_bounded(df, max_nodes=30)) == (
        _reference_components(edges)
    )


def test_bounded_raises_on_overcap(spark):
    # node universe 12 > max_nodes 8 -> must raise, never mislabel
    edges = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    with pytest.raises(ValueError, match="use connected_components"):
        connected_components_bounded(df, max_nodes=8)
    # edge-cap guard: >4*max_nodes edges raises before collecting a
    # data-sized relation
    many = spark.range(0, 50).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(ValueError, match="not bounded"):
        connected_components_bounded(many, max_nodes=10)


def test_dedup_cc_explicit_cap_goes_distributed_default_local(spark):
    """dedup.connected_components: default (None) routes the auto local
    path; an explicit max_iter pins the distributed loop + raise
    contract (r16 reconciliation of the VERDICT r15 item-1 regression)."""
    from noaa_etl_spark.operators.dedup import connected_components as dedup_cc

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    expect = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    got_default = {r["id"]: r["component"] for r in dedup_cc(edges).collect()}
    got_explicit = {
        r["id"]: r["component"] for r in dedup_cc(edges, max_iter=10).collect()
    }
    assert got_default == expect
    assert got_explicit == expect
