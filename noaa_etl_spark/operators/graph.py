"""Connected components over an edge list — the graph primitive under
every dedup-cluster / entity-resolution job (SURVEY.md §2.I: the
MinHash-LSH dedup already runs a lineage-cut variant inside
operators/dedup.py; this is the standalone, reusable form).

Algorithm: iterated *hash-min label propagation with path compression*
(the DataFrame rendering of the classic MapReduce CC family — Kiveris
et al., "Connected Components in MapReduce and Beyond", SOCC'14; the
two-phase propagate+shortcut loop is equivalent to alternating their
large-star/small-star operations on the label forest):

  lab(u) ← u
  repeat:
    propagate: lab'(u) = min(lab(u), min_{(u,v)∈E} lab(v))
               — one shuffle: symmetrized edges equi-joined to labels
                 on the neighbor side, then a map-side-combinable min.
    shortcut:  lab''(u) = lab'(lab'(u))
               — one self-join of the label table: pointer jumping
                 halves the label-forest depth each round (the
                 operators/hierarchy.py trick), so convergence is
                 O(log diameter) rounds, not O(diameter).
  until no label changed (exact count of changed rows == 0).

Per round the shuffles move only (node, label) pairs — 16 bytes a row,
never adjacency payloads — and the edge table is re-used as-is (no
rewriting, unlike the pure star algorithms), so each round costs two
hash-partitioned joins on node id + one min agg. Skewed hubs (one node
in many edges) are plain aggregation skew: AQE skew-split handles the
join; the min agg combines map-side.

Termination: labels are monotonically non-increasing and bounded below
by each component's min node id; propagate can only copy a strictly
smaller label along an edge, shortcut only along an existing
label-pointer chain, so both preserve "lab(u) is reachable from u" and
the fixpoint is exactly lab(u) = min(component(u)).

Lineage is cut with localCheckpoint every round (iterative-plan
precedent: operators/hierarchy.py, operators/bpe.py).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id of its connected component.

    Returns (node BIGINT, component BIGINT). Isolated self-loops are
    fine; NULL endpoints are dropped (no NULL-keyed propagation —
    same contract as operators/asof.py). Raises after ``max_rounds``
    non-converged rounds (2·log2(n) rounds suffice for any graph that
    fits storage, so hitting the cap means a bug, not a big input).
    """
    labels, _ = connected_components_with_rounds(edges, src, dst, max_rounds)
    return labels


def connected_components_with_rounds(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> tuple[DataFrame, int]:
    """connected_components plus the number of propagate+shortcut
    rounds it took to converge — returned PER CALL (never via module
    state, so concurrent/nested calls can't clobber each other's
    reading). tools/graph_bench.py grades the O(log diameter) claim
    against this on pathological high-diameter graphs."""
    raw = (
        edges.select(F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    # Size the whole job to the GRAPH, not the session default: every
    # round's joins/aggs materialize through localCheckpoint, which is
    # the one shape AQE's advisory coalescing does not reach (the
    # checkpoint job runs the pre-coalesce partitioning) — and the
    # persisted edge table's partition count sets the map-side task
    # count of EVERY round's propagate join. A 200-way session default
    # costs rounds × 400 near-empty tasks on a small component graph;
    # a small default would underparallelize a 10^11-edge dedup graph.
    # ~500k edges per partition (pre-dedup count — an upper bound is
    # fine for sizing), floored at executor parallelism; scoped set +
    # restore (the test_runtime_bloom_filter pattern).
    with _graph_sized_shuffle(edges.sparkSession, raw.count()):
        labels, rounds = _cc_loop(raw, max_rounds)
    if labels is None:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return labels, rounds


@contextmanager
def _graph_sized_shuffle(spark, n_edges: int):
    """Scoped shuffle-partition sizing for the iterative graph loops
    (~500k edges/partition, floored at executor parallelism); restores
    the previous session value on exit."""
    part_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(part_key, None)
    n_parts = max(spark.sparkContext.defaultParallelism, n_edges // 500_000)
    spark.conf.set(part_key, str(n_parts))
    try:
        yield
    finally:
        if prev_parts is None:
            spark.conf.unset(part_key)
        else:
            spark.conf.set(part_key, prev_parts)


def _cc_loop(raw: DataFrame, max_rounds: int) -> tuple[DataFrame | None, int]:
    """The propagate+shortcut fixpoint loop; returns (labels, rounds),
    labels None on round-cap. Runs under the caller's graph-sized
    shuffle partitioning."""
    e = raw.distinct()
    # symmetrize once; reused by every round's propagate join.
    # try/finally (ADVICE r7): an exception mid-round (executor failure,
    # interrupt) must not leak the cached frame for the session lifetime
    # — the dedup path calls this repeatedly in long sessions.
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    try:
        return _cc_rounds(sym, max_rounds)
    finally:
        sym.unpersist()


def _cc_rounds(sym: DataFrame, max_rounds: int) -> tuple[DataFrame | None, int]:
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for rnd in range(max_rounds):
        # propagate: min label over {self} ∪ neighbors. The self rows are
        # tagged so the pre-round label rides the SAME aggregate as the
        # min (max of the only tagged value) — change detection costs no
        # extra join against the previous label table.
        nbr = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(sym["u"].alias("node"), "component", F.lit(0).alias("self"))
        )
        propagated = (
            labels.select("node", "component", F.lit(1).alias("self"))
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col("self") == 1, F.col("component"))).alias("old"),
            )
        )
        # shortcut: component ← label(component)  (pointer jumping)
        parent = propagated.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        jumped = (
            propagated.join(parent, propagated["component"] == parent["p_node"])
            .select("node", F.col("p_comp").alias("component"), "old")
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("component") != F.col("old")).limit(1).count()
        labels = jumped.drop("old")
        if changed == 0:
            return labels, rnd + 1
    return None, max_rounds


def _local_union_find(rows) -> list[tuple[int, int]]:
    """Min-label union-find over collected (u, v) edge rows → sorted
    (node, component) pairs; component = min node id reachable — the
    exact fixpoint of the distributed loop (equality pinned in
    tests/test_graph.py)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        u, v = r["u"], r["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # min-label union: the smaller root becomes the parent, so
            # every root IS its component's min node id at all times.
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return sorted((n, find(n)) for n in parent)


def connected_components_auto(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    local_edge_cap: int = 500_000,
) -> DataFrame:
    """connected_components with a SIZE DISPATCH (the sessionize_auto
    precedent): probe the RAW edge count with one early-terminating
    limit-collect; at or below ``local_edge_cap`` rows the labels come
    from driver-side union-find on the already-collected rows
    (duplicate edges are union no-ops, so the output is identical —
    none of the distributed loop's rounds x scheduling floor; r15 opt:
    the loop cost 3-5 s per call on fixture-sized dedup/ER graphs),
    above it the distributed O(log d) loop runs unchanged.

    The probe deliberately does NOT dedupe first (r16, VERDICT r15
    item 5): a ``distinct()`` under the limit pays a full map pass +
    shuffle write of the edge relation before a big graph's dispatch is
    even decided — the raw limit is a partial scan that early-
    terminates. Duplicates can only push a borderline graph to the
    distributed path (conservative, still correct). 500k rows collect
    to ~8 MB — far under any driver budget; a 100 TB dedup graph takes
    the distributed path off the same probe.

    ``max_rounds`` applies to the distributed arm only — the local
    union-find always returns the exact fixpoint."""
    raw = edges.select(
        F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
    ).filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    rows = raw.limit(local_edge_cap + 1).collect()
    if len(rows) <= local_edge_cap:
        labels = _local_union_find(rows)
        return edges.sparkSession.createDataFrame(
            labels, "node BIGINT, component BIGINT"
        )
    return connected_components(edges, src, dst, max_rounds)


def connected_components_bounded(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_nodes: int = 100_000,
) -> DataFrame:
    """connected_components for graphs whose NODE UNIVERSE is bounded by
    construction (a grid resolution, an enum domain) rather than by data
    volume: collect the edge list, union-find with min-label semantics on
    the driver, return the same (node BIGINT, component BIGINT) contract.

    Identical output to connected_components (equality pinned in
    tests/test_graph.py): component = min node id reachable, nodes =
    every edge endpoint. The distributed loop costs O(log d) rounds of
    2 joins + checkpoint each — pure scheduling floor on a
    bounded-universe graph (r15 opt: q_geo_cluster's 60x75-cell grid
    spent ~7 s in rounds for a <=4.5k-node graph). ``max_nodes`` guards
    the collect: exceeding it raises so an unbounded caller can never
    silently pull a data-sized graph onto the driver — use
    connected_components there.
    """
    rows = (
        edges.select(
            F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .limit(max_nodes * 4 + 1)
        .collect()
    )
    if len(rows) > max_nodes * 4:
        raise ValueError(
            f"connected_components_bounded: >{max_nodes * 4} edges — the node "
            "universe is not bounded; use connected_components"
        )
    labels = _local_union_find(rows)
    if len(labels) > max_nodes:
        raise ValueError(
            f"connected_components_bounded: {len(labels)} nodes > max_nodes="
            f"{max_nodes}; use connected_components"
        )
    spark = edges.sparkSession
    return spark.createDataFrame(labels, "node BIGINT, component BIGINT")


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 6,
) -> DataFrame:
    """Multi-source unweighted shortest-path (BFS hop distance) over an
    undirected edge list → (node BIGINT, hops INT), hops = distance to
    the NEAREST seed, nodes beyond ``max_hops`` absent.

    Frontier iteration, one co-partitioned join + one anti-join per
    hop: dist starts as {seed → 0}; hop h expands the PREVIOUS
    frontier only (never the full dist table) along symmetrized edges,
    and an anti-join against settled nodes keeps first-arrival (=
    minimal) distances — textbook level-synchronous BFS. Rounds are
    bounded by ``max_hops`` (the bounded-reach contract: "within N
    hops" queries — degrees-of-separation, blast-radius, fraud-ring
    neighborhoods — are the distributed-BFS shape worth running; an
    unbounded all-pairs reach is connected_components' job). Early-exit
    when a frontier drains.

    Per round only (node, hop) pairs shuffle — the CC cost model; hub
    fan-out is join-side skew AQE splits. Lineage cut per round
    (localCheckpoint), shuffles sized to the graph, symmetric edge
    table persisted across rounds (the round-9 minhash lesson:
    un-persisted multi-use subtrees replan per round).
    """
    raw = (
        edges.select(F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    seed_nodes = (
        seeds.select(F.col(node).cast("bigint").alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
    )
    with _graph_sized_shuffle(edges.sparkSession, raw.count()):
        e = raw.distinct()
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).persist()
        try:
            dist = seed_nodes.select(
                "node", F.lit(0).cast("int").alias("hops")
            ).localCheckpoint(eager=True)
            frontier = dist
            for h in range(1, max_hops + 1):
                nxt = (
                    sym.join(frontier, sym["u"] == frontier["node"])
                    .select(sym["v"].alias("node"))
                    .distinct()
                )
                new = (
                    nxt.join(dist, "node", "left_anti")
                    .select("node", F.lit(h).cast("int").alias("hops"))
                    .localCheckpoint(eager=True)
                )
                if new.limit(1).count() == 0:
                    break
                dist = dist.unionByName(new).localCheckpoint(eager=True)
                frontier = new
            return dist
        finally:
            sym.unpersist()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 15,
) -> DataFrame:
    """PageRank by power iteration over a DIRECTED edge list
    (Page/Brin/Motwani/Winograd '99) → (node BIGINT, rank DOUBLE) with
    Σ rank = N (dangling mass redistributed uniformly each step, the
    standard stochastic-completion fix).

    DataFrame rendering, one shuffle-join + one combinable agg per
    iteration:

      contrib(v) = Σ_{(u,v)∈E} rank(u) / outdeg(u)   — edges ⋈ ranks
                                                        on u, sum by v
      dangling   = Σ_{outdeg(u)=0} rank(u)           — one scalar agg
      rank'(v)   = (1−d) + d·(contrib(v) + dangling/N)

    (per-node mass normalized to 1 so ranks are in "expected visits
    per random surfer × N" units — Σ rank = N is preserved exactly up
    to float addition and tested to 1e-9·N.)

    Fixed n_iter (error ∝ damping^n_iter ≈ 0.85^15 = 0.087 of the gap,
    practically 1e-2-level rank movement on the tail — callers that
    need tighter ranks raise n_iter; determinism across reruns comes
    from the fixed round count, while float SUM order inside an
    iteration may vary at the last ulp — hence rows-only grading with
    a numpy-reference tolerance test, not a value-hash oracle).

    100 TB: per-iteration cost is one hash join of (node, rank) to
    edges plus a map-side-combinable sum — 16-byte rows, the CC cost
    model; hub in-degree skew is AQE-split aggregation skew. Lineage
    cut per round (localCheckpoint), shuffles sized to the graph.
    """
    raw = (
        edges.select(F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    with _graph_sized_shuffle(edges.sparkSession, raw.count()):
        return _pagerank_loop(raw, damping, n_iter)


def _pagerank_loop(raw: DataFrame, damping: float, n_iter: int) -> DataFrame:
    # try/finally (ADVICE r7): unpersist e/base on ALL exits, including
    # mid-iteration exceptions — see _cc_loop.
    e = raw.distinct().persist()
    try:
        nodes = (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        outdeg = e.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        # static per-node frame: degree (0 for dangling) — reused each round
        base = (
            nodes.join(outdeg, "node", "left")
            .select("node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
            .persist()
        )
        try:
            return _pagerank_rounds(e, base, nodes.count(), damping, n_iter)
        finally:
            base.unpersist()
    finally:
        e.unpersist()


def _pagerank_rounds(
    e: DataFrame, base: DataFrame, n: int, damping: float, n_iter: int
) -> DataFrame:
    base.count()
    ranks = base.select("node", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        with_deg = ranks.join(base, "node").select(
            "node", "rank", "deg"
        )
        dangling = (
            with_deg.filter(F.col("deg") == 0).agg(F.sum("rank").alias("s")).collect()[0]["s"]
            or 0.0
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("deg") > 0).select(
                    F.col("node").alias("u"), (F.col("rank") / F.col("deg")).alias("share")
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            base.select("node")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def kcore(edges: DataFrame, k: int, max_rounds: int = 64) -> DataFrame:
    """k-core: the maximal subgraph in which every node has degree ≥ k —
    the standard graph-density filter (spam rings, community seeds,
    engagement tiers). Input: canonical undirected (u, v) edges with
    u < v, deduped. Returns (node, core_deg) for surviving nodes, where
    core_deg is the node's degree WITHIN the core.

    Algorithm: iterative peeling — drop every node with current degree
    < k, restrict edges to surviving endpoints, repeat to fixpoint.
    The fixpoint is exactly the k-core (uniqueness: any subgraph with
    min-degree ≥ k survives peeling in full, and peeling only removes
    nodes provably outside every such subgraph). O(peel-depth) rounds,
    each one combinable degree agg + two semi-joins; per-round frames
    localCheckpoint like every iterative loop here (AQE coalescing does
    not reach checkpoint materialization — size shuffles from the data
    via the caller's scoped conf, the connected-components lesson).

    100 TB: rounds ≪ max-degree in practice (each round peels the
    whole current shell); the state that iterates is the shrinking edge
    list, co-partitioned on the node key throughout.
    """
    spark = edges.sparkSession
    with _graph_sized_shuffle(spark, edges.count()):
        cur = edges.localCheckpoint()
        n_cur = cur.count()
        converged = False
        for _ in range(max_rounds):
            deg = (
                cur.select(F.col("u").alias("node"))
                .unionByName(cur.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
            )
            keep = deg.filter(F.col("d") >= k).select("node").localCheckpoint()
            nxt = (
                cur.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
                .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint()
            )
            n_nxt = nxt.count()
            cur = nxt
            if n_nxt == n_cur:
                converged = True
                break
            n_cur = n_nxt
        if not converged:
            # A capped run is NOT the k-core (nodes that should peel
            # remain) — fail loudly rather than return a superset.
            raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
        return (
            cur.select(F.col("u").alias("node"))
            .unionByName(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
        )


def label_propagation(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """Synchronous label-propagation community detection (LPA,
    Raghavan et al. 2007) made DETERMINISTIC: every node starts as its
    own label; each round every node adopts the most frequent label
    among its neighbors, ties broken by SMALLEST label (classic LPA
    breaks ties randomly — engine-reproducibility demands a total
    order), for a FIXED number of synchronous rounds (sync LPA can
    2-cycle on bipartite-ish structure, so a fixpoint test would not
    terminate; a fixed round budget is the standard remedy and keeps
    the result a pure function of the graph). Input: canonical
    undirected (u, v) edges, u < v, deduped. Returns (node, label).

    Per round: one (node, label) hash join onto the symmetrized edge
    list + one combinable (node, label) count + one min_by argmax on
    the node grain — the CC cost model (16-byte rows, no adjacency
    materialization); per-round localCheckpoint and caller-scoped
    shuffle sizing (the iterative-loop rule). Isolated nodes keep
    their own label (LEFT join + coalesce).

    100 TB: rounds is a constant (5 recovers communities on
    small-world graphs; LPA's own literature uses <10); each round's
    shuffle moves degree-many (node, label) pairs.
    """
    raw = edges.select(F.col(edges.columns[0]).alias("u"), F.col(edges.columns[1]).alias("v"))
    with _graph_sized_shuffle(edges.sparkSession, raw.count()):
        sym = (
            raw.select(F.col("u").alias("src"), F.col("v").alias("dst"))
            .unionByName(raw.select(F.col("v").alias("src"), F.col("u").alias("dst")))
            .localCheckpoint()
        )
        nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
        labels = nodes.select("node", F.col("node").alias("label"))
        for _ in range(rounds):
            msgs = sym.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            ).select(F.col("src").alias("node"), "label")
            counts = msgs.groupBy("node", "label").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            new = counts.groupBy("node").agg(
                F.min_by(
                    "label", F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
                ).alias("new_label")
            )
            labels = (
                nodes.join(new, "node", "left")
                .select(
                    "node", F.coalesce("new_label", F.col("node")).alias("label")
                )
                .localCheckpoint()
            )
    return labels
