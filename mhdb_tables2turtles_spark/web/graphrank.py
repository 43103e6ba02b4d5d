"""Entity-importance ranking over the co-mention graph: fixed-iteration
PageRank in integer fixed-point arithmetic.

Why fixed-point: the driver's oracle hash-compares VALUES.  Float
PageRank sums contributions in engine-dependent order, so the last bits
(and after rounding, occasionally the 6th decimal) can differ between
Spark and DuckDB.  With ranks held in integer micro-units and every
division an explicit floor, both engines produce bit-identical longs —
associativity of integer addition makes the shuffle order irrelevant.

Update rule (damping 0.85, graph undirected so every node has degree
>= 1 and there are no dangling nodes)::

    r0(v)   = SCALE                     (1.0 in micro-units)
    r_t+1(v) = (15*SCALE) div 100
             + sum over in-neighbors u of (85 * r_t(u)) div (100 * deg(u))

Scale shape: one broadcast-sized degree table joined once into the
adjacency list, then each iteration is a single shuffle keyed by the
destination node (partial aggregation collapses contributions
map-side).  Hub skew is the classic PageRank hazard; contributions are
8-byte longs and AQE skew-split handles hot destinations — the same
posture as `web/canonicalize.py`'s salted CC, which is the heavier op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "SCALE",
    "pagerank_fixed",
    "ppr_fixed",
    "hits_fixed",
    "triangle_counts",
    "bfs_hops",
    "label_propagation",
    "link_predict",
    "kcore",
    "pagerank_directed",
]

SCALE = 1_000_000


def pagerank_fixed(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """(node, pr): integer micro-unit PageRank after ``iterations``
    synchronous updates over the undirected graph given as distinct
    ``(src, dst)`` pairs with ``src < dst``.

    ``div`` (Spark's integral division) truncates toward zero; all
    operands here are positive, so it coincides with DuckDB's floor
    division ``//`` and the oracle can unroll the same iterations as
    chained CTEs.
    """
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = both.groupBy("u").agg(F.count("*").alias("deg"))
    adj = both.join(deg, "u").cache()

    ranks = adj.select("u").distinct().select(
        F.col("u").alias("node"), F.lit(SCALE).cast("long").alias("pr")
    )
    base = (15 * SCALE) // 100
    for _ in range(iterations):
        ranks = (
            adj.join(ranks, adj["u"] == ranks["node"])
            .select(
                F.col("v"),
                F.expr("(85 * pr) div (100 * deg)").alias("contrib"),
            )
            .groupBy("v")
            .agg((F.lit(base) + F.sum("contrib")).alias("pr"))
            .select(F.col("v").alias("node"), "pr")
        )
    # materialize before releasing the cached adjacency: long-lived
    # sessions (bench/gate loops) otherwise accumulate pinned partitions
    ranks = ranks.localCheckpoint(eager=True)
    adj.unpersist()
    return ranks


def pagerank_directed(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """(node, pr): integer micro-unit PageRank over a DIRECTED graph of
    distinct ``(src, dst)`` pairs — the hyperlink case
    (:mod:`~mhdb_tables2turtles_spark.web.linkgraph`), where authority
    flows along the link, not both ways.

    Differences from :func:`pagerank_fixed` forced by direction: the
    node universe is pinned once (sources ∪ sinks) and every round
    LEFT-joins contributions onto it, so no-inlink nodes keep their
    base rank instead of silently dropping out of the ``groupBy(v)``
    output, and dangling nodes (no outlinks) simply contribute nothing
    — mass is not renormalized, which keeps every round in exact
    integer arithmetic (same determinism contract as the undirected
    twin).
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    adj = e.join(deg, "src").cache()
    base = (15 * SCALE) // 100

    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("pr"))
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("(85 * pr) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.coalesce(F.col("c"), F.lit(0))).alias("pr"),
        )
    ranks = ranks.localCheckpoint(eager=True)
    adj.unpersist()
    return ranks


def ppr_fixed(
    edges: DataFrame, seeds: DataFrame, iterations: int = 5
) -> DataFrame:
    """(node, pr): PERSONALIZED PageRank in integer micro-units over the
    undirected graph of distinct ``(src, dst)`` pairs — teleport mass
    restarts at the SEED set instead of uniformly, so rank measures
    importance RELATIVE to the seeds (topic-sensitive entity relevance,
    the standard KG recommendation primitive).

    Differences from :func:`pagerank_fixed` forced by personalization:
    ``r0`` is SCALE on seeds and 0 elsewhere, the per-round base term
    lands only on seeds, and the node universe is pinned once and
    LEFT-joined every round — a node all of whose in-neighbors hold
    zero rank must stay in the table at 0 (it can become reachable in a
    later round), where the uniform variant's inner-join shape would
    silently drop it.  Same exact-integer determinism contract: every
    division an explicit floor on positive operands, so the DuckDB
    oracle unrolls the identical iterations.

    ``seeds`` is a one-column DataFrame of node ids.
    """
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = both.groupBy("u").agg(F.count("*").alias("deg"))
    adj = both.join(deg, "u").cache()
    nodes = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .join(
            seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
            .withColumn("__seed", F.lit(1)),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("__seed"), F.lit(0)).alias("__seed"))
        .localCheckpoint(eager=True)
    )
    base = (15 * SCALE) // 100
    seed_base = F.when(F.col("__seed") == 1, F.lit(base)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        F.when(F.col("__seed") == 1, F.lit(SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pr"),
    )
    for _ in range(iterations):
        contrib = (
            adj.join(ranks, adj["u"] == ranks["node"])
            .select(
                F.col("v"),
                F.expr("(85 * pr) div (100 * deg)").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["v"], "left"
        ).select(
            "node",
            (seed_base + F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("pr"),
        )
    ranks = ranks.localCheckpoint(eager=True)
    adj.unpersist()
    return ranks


def hits_fixed(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """(node, hub, auth): Kleinberg HITS over a DIRECTED graph of
    distinct ``(src, dst)`` pairs — hubs point at good authorities,
    authorities are pointed at by good hubs.  The complement to
    :func:`pagerank_directed` for hyperlink analysis: PageRank measures
    endorsement flow, HITS separates the curator role (hub) from the
    destination role (authority).

    Determinism contract: UNNORMALIZED integer iterations — scores
    start at 1 and each round is two exact integer sum-joins
    (``auth = Σ hub(in-neighbors)``, then ``hub = Σ auth(out-
    neighbors)``), so the DuckDB oracle unrolls identically.  Classic
    HITS L2-normalizes per round purely for CONVERGENCE of the values;
    the RANKING after k rounds is identical without it (the iteration
    is the power method on AᵀA, scaling does not change eigvector
    direction).  Magnitudes grow ~(d_max²)^k, so iterations must stay
    small: k=2 on a graph with max degree 10^6 is ~10^24... beyond
    int64 — callers at web scale keep k<=2 and pre-cap hub degrees (the
    same ``link_predict`` treatment); overflow would surface loudly as
    a negative score, asserted in tests.

    Plan shape: two shuffle aggregations per round on near-uniform
    endpoint keys, node universe pinned once so sink/source nodes
    (no out/in edges) keep score 0 instead of dropping out.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    auth = None
    for _ in range(iterations):
        a = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
        )
        auth = nodes.join(a, nodes["node"] == a["dst"], "left").select(
            "node", F.coalesce(F.col("auth"), F.lit(0)).alias("auth")
        )
        h = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
        )
        hub = nodes.join(h, nodes["node"] == h["src"], "left").select(
            "node", F.coalesce(F.col("hub"), F.lit(0)).alias("hub")
        )
    out = hub.join(auth, "node").select(
        "node", "hub", "auth"
    ).localCheckpoint(eager=True)
    return out


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(node, community): synchronous label propagation over the
    undirected graph given as distinct ``(src, dst)`` pairs — the
    GraphFrames-style community detector, made DETERMINISTIC so the
    DuckDB oracle reproduces it: every node starts as its own label,
    and each round adopts the most frequent label among its neighbors,
    breaking count ties by minimum label (classic LPA leaves ties to
    hash order, which no oracle can mirror).

    Scale shape per round: one join keyed by the label-holder node, one
    (node, label) count aggregation with map-side partials, then the
    argmax folded INTO an aggregation — ``groupBy(v).agg(min_by(label,
    struct(-c, label)))`` — instead of a ``row_number`` window (round 3
    ran window-after-groupBy: a second full Exchange PLUS a sort per
    round; ``min_by`` is a partial-aggregating argmin, so the second
    exchange moves one candidate row per map partition per node and
    never sorts).  Hub skew lands on the count aggregation where AQE
    skew-split applies.  A fixed iteration cap (not convergence) bounds
    the rounds, as with :func:`pagerank_fixed`.
    """
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    both = both.cache()
    labels = both.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # min over (-count, label) == most frequent label, ties to min label
    order_key = F.struct((-F.col("c")).alias("nc"), F.col("label"))
    for _ in range(iterations):
        labels = (
            both.join(labels, both["u"] == labels["node"])
            .groupBy("v", "label")
            .agg(F.count("*").alias("c"))
            .groupBy("v")
            .agg(F.min_by("label", order_key).alias("label"))
            .select(F.col("v").alias("node"), "label")
        )
    out = labels.select(
        "node", F.col("label").alias("community")
    ).localCheckpoint(eager=True)
    both.unpersist()
    return out


def bfs_hops(
    edges: DataFrame, sources: DataFrame, max_hops: int = 4
) -> DataFrame:
    """(node, hops): shortest-path hop distance from a seed set over the
    undirected graph given as distinct ``(src, dst)`` pairs, capped at
    ``max_hops`` (unreached nodes are absent — emit-reached semantics,
    same as every distributed BFS).  ``sources`` is a one-column
    ``node`` DataFrame.

    FRONTIER iteration (the round-3 fix — the min-plus variant shuffled
    the entire reached set every round): each round expands only the
    nodes settled LAST round, dedups the neighbor set, and removes
    already-settled nodes.  In an unweighted graph a node adjacent to
    the hop-(h-1) frontier has true distance in {h-2, h-1, h}, so the
    settled-check needs only the two PREVIOUS frontiers — per-round
    shuffle traffic is proportional to the frontier and its edge
    neighborhood, never to the accumulated distance table.  Each layer
    is eagerly checkpointed (bounded lineage across rounds, and the
    empty-frontier early exit is a metadata check, not a recompute);
    the result is the union of the disjoint layers — identical to the
    synchronous min-plus fixed point, so the unrolled min-plus SQL
    oracle is unchanged.
    """
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    both = both.cache()
    seed = (
        sources.select(F.col("node"), F.lit(0).cast("int").alias("hops"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    layers = [seed]
    frontier = seed.select("node")
    prev = None  # frontier two rounds back
    for h in range(1, max_hops + 1):
        reached = (
            both.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        nxt = reached.join(frontier, "node", "left_anti")
        if prev is not None:
            nxt = nxt.join(prev, "node", "left_anti")
        nxt = nxt.withColumn("hops", F.lit(h).cast("int")).localCheckpoint(
            eager=True
        )
        if nxt.isEmpty():
            break
        layers.append(nxt)
        prev, frontier = frontier, nxt.select("node")
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    out = out.localCheckpoint(eager=True)
    both.unpersist()
    return out


def link_predict(
    edges: DataFrame, min_common: int = 1, hub_cap: int | None = None
) -> DataFrame:
    """KG-completion candidates by neighborhood overlap: for every
    NON-adjacent node pair (a < b) with >= ``min_common`` shared
    neighbors, emit (node_a, node_b, n_common, jaccard_bp) where
    ``jaccard_bp`` = |N(a) ∩ N(b)| / |N(a) ∪ N(b)| in integer basis
    points — the classic common-neighbors / Jaccard link predictor,
    fixed-point so the oracle is engine-exact.

    Scale shape: candidate pairs come from a self-join keyed by the
    SHARED NEIGHBOR (wedge enumeration) — never an all-pairs product;
    the anti-join against the edge set removes existing links.  A
    degree-d wedge center emits O(d^2) wedges, so ``hub_cap`` (the
    round-3 fix) bounds the blowup: every node keeps at most
    ``hub_cap`` adjacency rows for the SELF-JOIN ONLY, chosen by a
    deterministic hash order (hash60 of the edge, ties by neighbor) so
    both cluster runs and the test oracle pick the same sample — a
    capped hub contributes <= hub_cap^2 wedges instead of d^2.
    Degrees in the Jaccard denominator stay EXACT (computed before the
    cap); n_common is exact for every pair whose common neighbors are
    all below the cap and a documented underestimate through capped
    hubs — the standard degree-thresholded wedge sampling trade.
    ``hub_cap=None`` (the default, used by the driver fixture) is the
    exact path.  At 10^12 edges set it near p99 degree.
    """
    from mhdb_tables2turtles_spark.ops.common import hash60

    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    both = both.cache()
    deg = both.groupBy("u").agg(F.count("*").alias("deg"))

    adj = both
    if hub_cap is not None:
        w = Window.partitionBy("u").orderBy(
            hash60(F.concat_ws(" ", F.col("u"), F.col("v"))), F.col("v")
        )
        adj = (
            both.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= hub_cap)
            .drop("__rk")
        )
    a = adj.select(F.col("u").alias("w"), F.col("v").alias("a"))
    b = adj.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wedges = (
        a.join(b, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    existing = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    cand = wedges.join(existing, ["a", "b"], "left_anti")
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    out = (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "n_common",
            F.expr(
                "(10000 * n_common) div (deg_a + deg_b - n_common)"
            ).alias("jaccard_bp"),
        )
        .localCheckpoint(eager=True)
    )
    both.unpersist()
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles): triangles through each node of the
    undirected graph given as distinct ``(src, dst)``, ``src < dst``.

    Enumerate each triangle once as an ordered triple a < b < c via two
    joins on the ordered edge list, then credit all three corners.
    Join keys are node ids — at web scale order by degree first
    (degree-ordered orientation) so hubs sit on the small side of the
    joins; the co-mention vocab graph is far below that threshold.
    """
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ab = e
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tri = (
        ab.join(bc, "b")
        .join(
            ac,
            (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        )
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def kcore(
    edges: DataFrame, k: int = 3, rounds: int | None = 4
) -> DataFrame:
    """(node, core_degree): members of the k-core — the maximal subgraph
    in which every node has degree >= ``k`` — of the undirected graph
    given as distinct ``(src, dst)`` pairs, with each member's degree
    inside the core.  The standard peel: drop every node with degree
    < k, recompute degrees on the induced subgraph, repeat.

    ``rounds`` is a FIXED synchronous round count (like
    :func:`pagerank_fixed`) so the DuckDB oracle can unroll the same
    peel as chained CTEs; callers must pick it >= the peel cascade
    depth of their graph (tests assert one extra round is a no-op on
    the fixture).  ``rounds=None`` is the web-scale fixpoint mode: peel
    until the surviving edge count stops falling (the count is read
    from the round's own checkpoint materialization, not an extra
    scan-from-source job), which is exact for any cascade depth — the
    per-round cost shrinks with the surviving subgraph.

    Scale shape per round: one degree aggregation (map-side partials)
    + two semi-joins filtering the edge list on its endpoints.  The
    kept-node set only ever shrinks, so AQE's runtime size estimate
    flips the semi-joins to broadcast as soon as the survivor set is
    small; the degree agg is where hub skew lands, handled by AQE
    skew-split as in :func:`pagerank_fixed`.  Each round is eagerly
    checkpointed: bounded lineage, and no recompute amplification of
    the earlier rounds.
    """
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    cur = both.localCheckpoint(eager=True)
    fixpoint = rounds is None
    prev_edges = cur.count() if fixpoint else None
    i = 0
    while True:
        if not fixpoint and i >= rounds:
            break
        i += 1
        keep = (
            cur.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        cur = (
            cur.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        if fixpoint:
            n = cur.count()  # scans the fresh checkpoint, not the source
            if n == prev_edges:
                break
            prev_edges = n
    return cur.groupBy("u").agg(F.count("*").alias("core_degree")).select(
        F.col("u").alias("node"), "core_degree"
    )


def cocitation(
    edges: DataFrame,
    min_common: int = 1,
    hub_cap: int | None = None,
    mode: str = "cocitation",
) -> DataFrame:
    """``(node_a, node_b, n_common)`` — co-citation counts over the
    DIRECTED graph (Small 1973: pages cited together are related) or,
    with ``mode='coupling'``, bibliographic coupling (Kessler 1963:
    pages citing the same things are related) — the two classic
    link-analysis similarity kernels a web KG derives relatedness from.

    Co-citation pairs share an IN-neighbor, coupling pairs share an
    OUT-neighbor, so both are the wedge self-join keyed on the SHARED
    endpoint — never an all-pairs product (the link_predict shape, on
    the directed graph).  A degree-d wedge center emits O(d^2) pairs,
    so ``hub_cap`` bounds the blowup exactly as in :func:`link_predict`:
    at most ``hub_cap`` adjacency rows per center survive into the
    self-join, chosen by deterministic hash order — at web scale a
    mandatory setting (the head host links to millions of pages), at
    the driver fixture left above the max degree so the oracle sees the
    exact semantics.
    """
    if mode not in ("cocitation", "coupling"):
        raise ValueError(f"unknown mode {mode!r}")
    k, x = ("src", "dst") if mode == "cocitation" else ("dst", "src")
    adj = edges.select(F.col(k).alias("k"), F.col(x).alias("x")).distinct()
    if hub_cap is not None:
        from pyspark.sql.window import Window

        from mhdb_tables2turtles_spark.ops.common import hash60

        adj = (
            adj.withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("k").orderBy(
                        hash60(F.concat_ws(" ", F.col("k"), F.col("x"))),
                        F.col("x"),
                    )
                ),
            )
            .filter(F.col("__rk") <= hub_cap)
            .drop("__rk")
        )
    a, b = adj.alias("a"), adj.alias("b")
    return (
        a.join(b, "k")
        .filter(F.col("a.x") < F.col("b.x"))
        .groupBy(
            F.col("a.x").alias("node_a"), F.col("b.x").alias("node_b")
        )
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def adamic_adar(
    edges: DataFrame, hub_cap: int | None = None
) -> DataFrame:
    """``(node_a, node_b, n_common, aa_bp)`` — Adamic-Adar link
    prediction over the undirected graph: non-adjacent pairs scored by
    Σ over common neighbors z of 1/log(deg z), the classic
    rare-neighbors-matter refinement of :func:`link_predict`'s common
    -neighbor count.

    Engine-exact fixed point: libm ``log`` is not contractually
    bit-identical across engines, so the weight is integer
    ``10000 div max(1, floor(log2(deg z)))`` with
    ``floor(log2 x) = length(bin(x)) - 1`` — both Spark and DuckDB
    evaluate ``bin()`` identically, the same portable-log2 device as
    the degree histogram.  Same wedge shape and deterministic
    ``hub_cap`` as :func:`link_predict`; never all-pairs.
    """
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).distinct()
    deg = both.groupBy("u").agg(F.count("*").alias("deg"))
    adj = both.join(deg, "u").select(
        "u",
        "v",
        F.expr("10000 div greatest(1, length(bin(deg)) - 1)").alias(
            "w"
        ),
    )
    if hub_cap is not None:
        from pyspark.sql.window import Window

        from mhdb_tables2turtles_spark.ops.common import hash60

        adj = (
            adj.withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("u").orderBy(
                        hash60(F.concat_ws(" ", F.col("u"), F.col("v"))),
                        F.col("v"),
                    )
                ),
            )
            .filter(F.col("__rk") <= hub_cap)
            .drop("__rk")
        )
    a, b = adj.alias("a"), adj.alias("b")
    wedges = (
        a.join(b, "u")
        .filter(F.col("a.v") < F.col("b.v"))
        .groupBy(
            F.col("a.v").alias("node_a"), F.col("b.v").alias("node_b")
        )
        .agg(
            F.count("*").alias("n_common"),
            F.sum("a.w").alias("aa_bp"),
        )
    )
    existing = both.filter(F.col("u") < F.col("v")).select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b")
    )
    return wedges.join(existing, ["node_a", "node_b"], "left_anti")
