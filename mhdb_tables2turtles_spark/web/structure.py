"""Global structure of the directed web graph: strongly connected
components, Broder bow-tie decomposition, and the neighborhood
function (distance distribution).

The reference never sees graph structure (its KG is a forest of
spreadsheet rows), but every web-scale KG build does: the crawl's
hyperlink/entity graph decides canonicalization quality (SCCs are the
equivalence classes of mutual endorsement), crawl-frontier coverage
(the bow-tie's IN/OUT split — Broder et al., "Graph structure in the
web", WWW 2000, computed on exactly this kind of graph), and hub
distance statistics (the neighborhood function N(h) — Palmer et al.'s
ANF / Boldi & Vigna's HyperBall).

Scale posture shared by all three:

* Everything is frontier / delta iteration over ``(node)``-keyed joins
  and aggregations — per-round shuffle volume is proportional to the
  CHANGE set, never to the accumulated state (same discipline as
  web/graphrank.py::bfs_hops after the round-3 fix).
* Every round ends in an eager ``localCheckpoint`` — bounded lineage,
  and empty-delta termination tests are metadata checks.  On a real
  cluster these become ``checkpoint()`` against the job's Iceberg
  scratch volume (same stance as web/canonicalize.py).
* No step ever materializes an all-pairs product: SCC is coloring +
  same-color backward sweeps (Orzan 2004; the FW-BW-Trim family of
  Slota et al. is the same dataflow with pivot batching), bow-tie is
  four seeded BFS closures, and the neighborhood function unions
  per-node reachability SETS — exact array sets at fixture scale,
  HyperLogLog registers (Spark's built-in DataSketches ``hll_*``
  functions) at web scale, which is literally the HyperBall algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "strongly_connected_components",
    "bowtie_decomposition",
    "neighborhood_function",
    "closeness_exact",
    "reach_from",
]


def _nodes_of(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )


def reach_from(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """One-column ``node`` DataFrame: every node reachable from the
    ``seeds`` set along DIRECTED ``(src, dst)`` edges, seeds included.

    Frontier fixpoint (not capped): expands only last round's newly
    settled nodes, anti-joins the accumulated settled set, checkpoints
    each layer.  The settled set is re-checkpointed per round, so the
    anti-join's lineage stays flat; its size is monotone and bounded by
    |V|, which is the best any reachability closure can do.
    """
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    settled = seeds.select("node").distinct().localCheckpoint(eager=True)
    frontier = settled
    while True:
        nxt = (
            e.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return settled
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: "int | None" = None,
    stats: "dict | None" = None,
) -> DataFrame:
    """``(node, scc_id)`` over directed ``(src, dst)`` edges, where
    ``scc_id`` is the MINIMUM member id of the node's strongly
    connected component — a pure function of the graph, so the DuckDB
    oracle can compute it as mutual recursive-CTE reachability.

    Algorithm: iterative COLORING (Orzan 2004), the standard flat
    dataflow SCC:

    1. Color fixpoint — every node starts as its own color; colors
       propagate FORWARD along edges taking the max, so at fixpoint
       color(v) = max id that reaches v (within the remaining graph).
    2. Roots — nodes whose color is their own id.  Every root's SCC is
       exactly the nodes of its color that reach it, found by one
       BACKWARD frontier sweep restricted to same-colored nodes.  All
       roots sweep in the SAME round (pivot batching — this is what
       makes coloring converge in few rounds where single-pivot FW-BW
       needs one round per SCC).
    3. Peel the found SCCs off and repeat on the remainder.

    The max-id node is always a root, so every outer round removes at
    least one SCC; on web graphs the first round already peels the
    giant SCC plus every SCC whose upstream has smaller ids (Slota et
    al. measure a handful of rounds on billion-edge crawls).  Inner
    loops are frontier-shaped: the color fixpoint re-propagates only
    nodes whose color CHANGED last round.

    ROUND BOUND: each color fixpoint takes at most D+1 rounds and each
    backward sweep at most D+1, where D is the diameter of the
    remaining subgraph (a color/frontier moves one hop per round), so
    total inner rounds <= peels x 2(D+1).  Web crawls have small
    effective diameter, but an ADVERSARIAL high-diameter graph (a
    100k-node chain whose ids descend along edges) makes the color
    fixpoint O(|V|) rounds — unbounded wall-clock with no wrong
    answer.  ``max_rounds`` is the escape hatch: a cap on TOTAL inner
    rounds (color + sweep, across peels) that raises ``RuntimeError``
    instead of looping silently; size it at ~2x the expected effective
    diameter x expected peels.  ``stats`` (a caller dict) is filled
    with the measured ``color_rounds`` / ``sweep_rounds`` / ``peels``
    so tests and monitoring can pin the bound.
    """
    rounds = {"color_rounds": 0, "sweep_rounds": 0, "peels": 0}

    def _tick(kind: str) -> None:
        rounds[kind] += 1
        if (
            max_rounds is not None
            and rounds["color_rounds"] + rounds["sweep_rounds"]
            > max_rounds
        ):
            raise RuntimeError(
                f"strongly_connected_components exceeded max_rounds="
                f"{max_rounds} ({rounds}); the input's effective "
                "diameter is larger than expected — raise max_rounds "
                "or pre-contract long chains"
            )
    e0 = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = _nodes_of(e0).localCheckpoint(eager=True)
    e = e0
    found: list[DataFrame] = [
        nodes.limit(0).select(
            "node", F.col("node").alias("scc_id")
        )  # schema anchor; also the empty-graph result
    ]
    while not nodes.isEmpty():
        rounds["peels"] += 1
        # -- 1. forward max-color fixpoint (delta iteration) ---------
        colors = nodes.select("node", F.col("node").alias("color"))
        colors = colors.localCheckpoint(eager=True)
        changed = colors  # first round: everyone propagates
        while True:
            _tick("color_rounds")
            pushed = (
                e.join(
                    changed.withColumnRenamed("node", "u"), "u"
                )
                .groupBy(F.col("v").alias("node"))
                .agg(F.max("color").alias("cand"))
            )
            upd = (
                colors.join(pushed, "node", "left")
                .select(
                    "node",
                    F.greatest(
                        "color", F.coalesce("cand", "color")
                    ).alias("new_color"),
                    (F.coalesce("cand", "color") > F.col("color")).alias(
                        "__chg"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            changed = upd.filter("__chg").select(
                "node", F.col("new_color").alias("color")
            )
            colors = upd.select(
                "node", F.col("new_color").alias("color")
            )
            if changed.isEmpty():
                break
        colors = colors.localCheckpoint(eager=True)

        # -- 2. backward sweep from every root within its color ------
        roots = colors.filter(F.col("color") == F.col("node"))
        marked = roots.localCheckpoint(eager=True)
        frontier = marked
        while True:
            _tick("sweep_rounds")
            cand = (
                e.join(frontier.withColumnRenamed("node", "v"), "v")
                .select(F.col("u").alias("node"), "color")
                .distinct()
            )
            # u joins the sweep only if its own color matches
            nxt = (
                cand.join(colors, ["node", "color"])
                .join(marked.select("node"), "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            marked = marked.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt

        # -- 3. peel: scc_id = min member id per color ---------------
        ids = marked.groupBy("color").agg(F.min("node").alias("scc_id"))
        found.append(
            marked.join(ids, "color")
            .select("node", "scc_id")
            .localCheckpoint(eager=True)
        )
        nodes = nodes.join(marked.select("node"), "node", "left_anti")
        nodes = nodes.localCheckpoint(eager=True)
        e = (
            e.join(nodes.withColumnRenamed("node", "u"), "u")
            .join(nodes.withColumnRenamed("node", "v"), "v")
            .localCheckpoint(eager=True)
        )
    if stats is not None:
        stats.update(rounds)
    out = found[0]
    for part in found[1:]:
        out = out.unionByName(part)
    return out.localCheckpoint(eager=True)


_BOWTIE_CLASSES = (
    "CORE",
    "IN",
    "OUT",
    "TUBES",
    "TENDRILS",
    "DISCONNECTED",
)


def bowtie_decomposition(edges: DataFrame) -> DataFrame:
    """``(component, n_nodes)`` — the Broder et al. (WWW 2000) bow-tie
    decomposition of a directed graph, always exactly six rows (zero
    counts included, so the result schema is scale-independent):

    * CORE — the largest SCC (ties broken by smallest scc_id);
    * IN — reaches CORE, not in it;  OUT — reached from CORE;
    * TUBES — on an IN->OUT path that avoids CORE;
    * TENDRILS — reachable from IN or reaching OUT, but not both;
    * DISCONNECTED — everything else.

    Built from :func:`strongly_connected_components` plus four seeded
    :func:`reach_from` closures (forward/backward from CORE, forward
    from IN, backward from OUT).  Closures run on the FULL edge set —
    any path escaping through an already-classified node only reaches
    already-classified nodes (a node reachable from CORE is OUT by
    definition), so no path restriction is needed; set subtraction
    does the classification.  The only driver-side value is the single
    winning scc_id (a 1-row collect).
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    spark = edges.sparkSession
    scc = strongly_connected_components(e)
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("n"))
    top = sizes.orderBy(F.desc("n"), F.asc("scc_id")).limit(1).collect()
    if not top:
        empty = spark.createDataFrame(
            [(c, 0) for c in _BOWTIE_CLASSES], ["component", "n_nodes"]
        )
        return empty.select(
            "component", F.col("n_nodes").cast("long").alias("n_nodes")
        )
    core_id = top[0]["scc_id"]
    core = scc.filter(F.col("scc_id") == core_id).select("node")
    core = core.localCheckpoint(eager=True)

    fwd = reach_from(e, core)  # CORE + OUT
    bwd = reach_from(rev, core)  # CORE + IN
    out_ = fwd.join(core, "node", "left_anti").localCheckpoint(eager=True)
    in_ = bwd.join(core, "node", "left_anti").localCheckpoint(eager=True)
    classified = core.unionByName(out_).unionByName(in_)

    from_in = reach_from(e, in_).join(classified, "node", "left_anti")
    to_out = reach_from(rev, out_).join(classified, "node", "left_anti")
    tubes = from_in.join(to_out, "node")
    tendrils = (
        from_in.unionByName(to_out)
        .distinct()
        .join(tubes, "node", "left_anti")
    )
    disconnected = (
        scc.select("node")
        .join(classified, "node", "left_anti")
        .join(tubes, "node", "left_anti")
        .join(tendrils, "node", "left_anti")
    )

    counted = None
    for name, part in [
        ("CORE", core),
        ("IN", in_),
        ("OUT", out_),
        ("TUBES", tubes),
        ("TENDRILS", tendrils),
        ("DISCONNECTED", disconnected),
    ]:
        c = part.agg(
            F.lit(name).alias("component"),
            F.count("*").cast("long").alias("n_nodes"),
        )
        counted = c if counted is None else counted.unionByName(c)
    return counted


def neighborhood_function(
    edges: DataFrame, max_h: int = 3, mode: str = "exact"
) -> DataFrame:
    """``(hop, reachable_pairs)`` for hop = 0..``max_h`` over the
    UNDIRECTED graph of distinct ``(src, dst)`` pairs: the neighborhood
    function N(h) = number of ordered pairs (u, v) with d(u, v) <= h.
    N(0) = |V|; successive deltas are the distance distribution, and
    the smallest h with N(h) >= 0.9 * N(max) is the effective diameter.

    ``mode='exact'`` is the oracle path: per-node reachability SETS as
    sorted string arrays, one groupBy per hop unioning each node's set
    with its neighbors' (ball(v, h) = ball(v, h-1) ∪ ⋃ ball(nbr, h-1)).
    State is Θ(Σ|ball|) — fine at fixture scale, quadratic on a small
    diameter graph, NOT the web-scale plan.

    ``mode='hll'`` is the web-scale plan and is the HyperBall algorithm
    verbatim (Boldi & Vigna, 2011): the per-node set becomes a constant
    ~KB HyperLogLog register (Spark's built-in DataSketches
    ``hll_sketch_agg`` / ``hll_union_agg``), the union becomes register
    max, and N(h) sums per-node ``hll_sketch_estimate``.  State drops
    to Θ(|V|) regardless of diameter; counts are approximate (±~2%),
    so this mode feeds monitoring, not the value-hash gate — the exact
    twin on a sampled subgraph is the accuracy check
    (tests/test_graph.py::test_neighborhood_hll_close_to_exact).
    """
    both = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = _nodes_of(both)
    spark = edges.sparkSession

    rows = []
    if mode == "exact":
        balls = nodes.select(
            "node", F.array("node").alias("ball")
        ).localCheckpoint(eager=True)
        rows.append(balls.agg(F.count("*").cast("long")).collect()[0][0])
        for _ in range(max_h):
            nbr = both.join(
                balls.withColumnRenamed("node", "u"), "u"
            ).select(F.col("v").alias("node"), "ball")
            balls = (
                balls.unionByName(nbr)
                .groupBy("node")
                .agg(
                    F.array_distinct(
                        F.flatten(F.collect_list("ball"))
                    ).alias("ball")
                )
                .localCheckpoint(eager=True)
            )
            rows.append(
                balls.agg(
                    F.sum(F.size("ball")).cast("long")
                ).collect()[0][0]
            )
    elif mode == "hll":
        balls = nodes.groupBy("node").agg(
            F.hll_sketch_agg("node").alias("sk")
        )
        balls = balls.localCheckpoint(eager=True)
        rows.append(
            balls.agg(
                F.sum(F.hll_sketch_estimate("sk")).cast("long")
            ).collect()[0][0]
        )
        for _ in range(max_h):
            nbr = both.join(
                balls.withColumnRenamed("node", "u"), "u"
            ).select(F.col("v").alias("node"), "sk")
            balls = (
                balls.unionByName(nbr)
                .groupBy("node")
                .agg(F.hll_union_agg("sk").alias("sk"))
                .localCheckpoint(eager=True)
            )
            rows.append(
                balls.agg(
                    F.sum(F.hll_sketch_estimate("sk")).cast("long")
                ).collect()[0][0]
            )
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown mode {mode!r}")

    return spark.createDataFrame(
        [(h, int(n)) for h, n in enumerate(rows)],
        "hop int, reachable_pairs long",
    )


def closeness_exact(
    edges: DataFrame, max_h: int = 4, harmonic: bool = False
) -> DataFrame:
    """``(node, n_reached, dist_sum, ecc)`` — exact closeness-centrality
    ingredients per node over the undirected graph, capped at ``max_h``
    hops: nodes reached (self included, distance 0), the sum of
    shortest-path distances to them, and the eccentricity (max distance
    seen).  Closeness = (n_reached - 1) / dist_sum derives row-locally;
    the exact integer triple is what hashes against the oracle.

    ``harmonic=True`` appends ``harm_bp`` — harmonic centrality
    Σ 1/d(u, v) in integer basis points, accumulated per hop as
    ``(10000 div h) · newly_reached`` (exact; the same delta identity).
    Harmonic is the centrality Boldi & Vigna recommend over closeness
    at web scale because disconnected pairs contribute 0 instead of
    breaking the mean — with a hop cap the two coincide in spirit but
    harmonic needs no reachability normalization.

    Same ball iteration as :func:`neighborhood_function` (exact mode)
    with per-round DELTA accounting: newly reached at hop h contribute
    ``h * (|ball_h| - |ball_{h-1}|)`` to the distance sum — so the
    distance matrix is never materialized.  The web-scale twin swaps
    the exact sets for HyperBall registers exactly as in
    :func:`neighborhood_function` (Boldi & Vigna use this same delta
    identity to estimate closeness/harmonic at billion-node scale).
    """
    both = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = _nodes_of(both)
    state = nodes.select(
        "node",
        F.array("node").alias("ball"),
        F.lit(1).cast("long").alias("n_reached"),
        F.lit(0).cast("long").alias("dist_sum"),
        F.lit(0).cast("int").alias("ecc"),
        F.lit(0).cast("long").alias("harm_bp"),
    ).localCheckpoint(eager=True)
    for h in range(1, max_h + 1):
        nbr = both.join(
            state.select("node", "ball").withColumnRenamed("node", "u"),
            "u",
        ).select(F.col("v").alias("node"), "ball")
        grown = (
            state.select("node", "ball")
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.array_distinct(F.flatten(F.collect_list("ball"))).alias(
                    "ball"
                )
            )
        )
        state = (
            state.drop("ball")
            .join(grown, "node")
            .select(
                "node",
                "ball",
                F.size("ball").cast("long").alias("n_reached"),
                (
                    F.col("dist_sum")
                    + h * (F.size("ball") - F.col("n_reached"))
                ).alias("dist_sum"),
                F.when(
                    F.size("ball") > F.col("n_reached"), F.lit(h)
                )
                .otherwise(F.col("ecc"))
                .cast("int")
                .alias("ecc"),
                (
                    F.col("harm_bp")
                    + (10000 // h)
                    * (F.size("ball") - F.col("n_reached"))
                ).alias("harm_bp"),
            )
            .localCheckpoint(eager=True)
        )
    cols = ["node", "n_reached", "dist_sum", "ecc"]
    if harmonic:
        cols.append("harm_bp")
    return state.select(*cols)
