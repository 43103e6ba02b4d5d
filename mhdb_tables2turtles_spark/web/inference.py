"""Inference materialization over the triple table: transitive-closure
property paths and the RDFS subclass entailment rules.

The reference emits ``rdfs:subClassOf`` hierarchies from its disorder
worksheets (mhdb/write_ttl.py's class rows; the two-hop disorder
hierarchy joins in SURVEY.md §2.6 J6) but leaves closure to whatever
triple store loads the .ttl.  A KG *pipeline* that materializes triples
to a table must also materialize the entailments consumers expect —
``rdfs:subClassOf`` is transitive (RDFS rule rdfs11) and instance types
inherit up the hierarchy (rule rdfs9) — because SQL-layer consumers of
an Iceberg triple table have no reasoner.

Scale posture (the interesting part):

* :func:`transitive_closure` is SEMI-NAIVE Datalog evaluation: round
  ``t`` extends only the paths DISCOVERED in round ``t-1`` (the delta),
  never the whole accumulated closure — the same frontier discipline as
  ``web/graphrank.py::bfs_hops``.  Naive evaluation re-joins the full
  closure against the edge set every round and re-derives every path it
  already has; on a depth-``d`` hierarchy that is ``O(d)`` redundant
  full-closure joins.  The edge set here is an ONTOLOGY-sized relation
  (classes, not instances — thousands to millions of rows, not 10^12),
  so each round's join is small however many instance triples exist;
  the one instance-scale operation in :func:`rdfs_closure` is a single
  broadcast join of the closure onto the type triples.
* Rounds stop when the delta is EMPTY (a hierarchy's closure converges
  in ``ceil(log2(depth))``-ish rounds of growth, bounded by depth), and
  every round's delta is ``localCheckpoint``-ed so the lineage stays
  flat — the same eager-truncation discipline as the connected
  components loop in ``web/canonicalize.py``.
* Cycles are safe: set semantics (the anti-join against the
  accumulated closure) make the iteration monotone and finite — a
  cycle's members simply end up mutually reachable, matching the
  recursive-CTE ``UNION`` oracle semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["transitive_closure", "rdfs_closure", "owl_property_closure"]


def transitive_closure(
    edges: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """All ``(src, dst)`` pairs with a directed path ``src → … → dst``
    through ``edges`` — the SPARQL ``p+`` property path, materialized.

    Semi-naive iteration: ``delta`` holds only the pairs first derived
    in the previous round; each round extends ``delta`` one hop through
    the base edges and keeps the genuinely new pairs (left-anti against
    the accumulated closure).  Per-round cost is
    ``O(|delta| ⋈ |edges|)``, not ``O(|closure| ⋈ |edges|)``.

    ``max_rounds`` bounds the iteration for callers that want a
    depth-limited path (``p{1,k}``); the default runs to the fixpoint.

    Catalyst constraint propagation is disabled for the loop's plans
    (and restored after): iterative self-join/union plans make the
    analyzer's constraint inference quadratic-to-exponential in round
    count — the documented GraphFrames posture for exactly this shape —
    and Spark additionally mis-rewrites Union constraints over
    checkpointed legs of the loop (stale attribute ids surface as
    ``key not found`` analysis crashes).  The loop's joins are all on
    explicit keys, so no constraint-derived optimization is lost.
    """
    spark = edges.sparkSession
    conf_key = "spark.sql.constraintPropagation.enabled"
    prev_conf = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        e = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        acc = e
        delta = e
        rounds = 0
        while max_rounds is None or rounds < max_rounds:
            rounds += 1
            step = (
                delta.alias("d")
                .join(e.alias("e"), F.col("d.dst") == F.col("e.src"))
                .select(
                    F.col("d.src").alias("src"), F.col("e.dst").alias("dst")
                )
                .filter(F.col("src") != F.col("dst"))
                .distinct()
            )
            delta = step.join(
                acc, ["src", "dst"], "left_anti"
            ).localCheckpoint(eager=True)
            if delta.isEmpty():
                break
            acc = acc.unionByName(delta).localCheckpoint(eager=True)
    finally:
        spark.conf.set(conf_key, prev_conf)
    return acc


def rdfs_closure(
    triples: DataFrame,
    type_pred: str = "a",
    subclass_pred: str = "rdfs:subClassOf",
) -> DataFrame:
    """The RDFS-entailed graph: input triples plus rule rdfs11
    (``subClassOf`` transitivity) and rule rdfs9 (type inheritance —
    ``x a C . C subClassOf+ D  ⇒  x a D``), deduplicated.

    Plan shape: the subclass slice is predicate-filtered before the
    closure loop (partition pruning on a predicate-partitioned store)
    and is ontology-sized, so the whole iteration is small; the
    closure table is then broadcast-joined onto the instance-scale
    type slice ONCE — the only 10^12-row operation is that single
    broadcast join plus the final distinct.
    """
    sub = triples.filter(F.col("predicate") == subclass_pred).select(
        F.col("subject").alias("src"), F.col("object").alias("dst")
    )
    closure = transitive_closure(sub)
    sub_closed = closure.select(
        F.col("src").alias("subject"),
        F.lit(subclass_pred).alias("predicate"),
        F.col("dst").alias("object"),
    )
    types = triples.filter(F.col("predicate") == type_pred)
    inherited = types.join(
        F.broadcast(closure),
        types["object"] == closure["src"],
    ).select(
        types["subject"],
        F.lit(type_pred).alias("predicate"),
        closure["dst"].alias("object"),
    )
    return (
        triples.select("subject", "predicate", "object")
        .unionByName(sub_closed)
        .unionByName(inherited)
        .distinct()
    )


def owl_property_closure(
    triples: DataFrame,
    type_pred: str = "a",
    inverse_pred: str = "owl:inverseOf",
    symmetric_class: str = "owl:SymmetricProperty",
    transitive_class: str = "owl:TransitiveProperty",
    max_rounds: int = 8,
) -> DataFrame:
    """OWL 2 RL property-rule materialization: the input graph plus
    every triple entailed by rules prp-inv1/prp-inv2 (``p owl:inverseOf
    q . x p y ⇒ y q x`` and vice versa), prp-symp (``p a
    owl:SymmetricProperty . x p y ⇒ y p x``) and prp-trp (``p a
    owl:TransitiveProperty . x p y . y p z ⇒ x p z``), driven entirely
    by the ontology declarations INSIDE the triple table — the same
    self-describing posture as :func:`rdfs_closure` (reference
    mhdb/write_ttl.py emits owl:ObjectProperty rows; a store-side
    consumer expects their OWL semantics materialized).

    Evaluation order (a true fixpoint, not an approximation): the
    row-local rules (inverse + symmetric) iterate to their own fixpoint
    first, then each declared transitive predicate's edge slice runs
    one semi-naive :func:`transitive_closure`, then the row-local rules
    run to fixpoint once more.  That suffices because closure commutes
    with edge reversal: a transitive predicate's inverse (or its own
    symmetric re-orientation) of a CLOSED edge set is already closed,
    so no further transitive round can derive anything new.

    Scale posture: the ontology slices (inverse pairs, symmetric /
    transitive property lists) are predicate-filtered, ontology-sized,
    and broadcast; every instance-scale derivation is one broadcast
    semi/inner join + a column swap (zero shuffle beyond the final
    distinct).  The per-predicate transitive loops join ontology-
    declared slices only — the driver-side list of transitive
    predicates is ontology metadata (dozens, not data-scale), the one
    intentional ``collect`` here.  The row-local fixpoint is bounded by
    the property meta-graph's diameter (≤ 2 in any real ontology);
    ``max_rounds`` guards pathological inputs loudly.
    """
    t = triples.select("subject", "predicate", "object")
    inv = t.filter(F.col("predicate") == inverse_pred).select(
        F.col("subject").alias("__p"), F.col("object").alias("__q")
    )
    # inverseOf is itself symmetric (prp-inv2): close the pair set
    inv = inv.unionByName(
        inv.select(F.col("__q").alias("__p"), F.col("__p").alias("__q"))
    ).distinct()
    sym = t.filter(
        (F.col("predicate") == type_pred)
        & (F.col("object") == symmetric_class)
    ).select(F.col("subject").alias("__p"))
    trans = t.filter(
        (F.col("predicate") == type_pred)
        & (F.col("object") == transitive_class)
    ).select(F.col("subject").alias("__p"))

    def rowlocal_fixpoint(graph: DataFrame) -> DataFrame:
        graph = graph.localCheckpoint(eager=False)
        delta = graph
        for _ in range(max_rounds):
            inversed = delta.join(
                F.broadcast(inv), delta["predicate"] == inv["__p"]
            ).select(
                F.col("object").alias("subject"),
                F.col("__q").alias("predicate"),
                F.col("subject").alias("object"),
            )
            mirrored = delta.join(
                F.broadcast(sym), delta["predicate"] == sym["__p"]
            ).select(
                F.col("object").alias("subject"),
                "predicate",
                F.col("subject").alias("object"),
            )
            new = (
                inversed.unionByName(mirrored)
                .distinct()
                .join(
                    graph,
                    ["subject", "predicate", "object"],
                    "left_anti",
                )
                .localCheckpoint(eager=False)
            )
            if new.isEmpty():
                return graph
            graph = graph.unionByName(new).localCheckpoint(eager=False)
            delta = new
        raise RuntimeError(
            f"owl_property_closure: row-local rules did not converge in "
            f"{max_rounds} rounds — cyclic inverseOf meta-graph?"
        )

    graph = rowlocal_fixpoint(t)
    trans_preds = [r[0] for r in trans.distinct().collect()]  # ontology-sized
    for p in sorted(trans_preds):
        edges = graph.filter(F.col("predicate") == p).select(
            F.col("subject").alias("src"), F.col("object").alias("dst")
        )
        closed = transitive_closure(edges).select(
            F.col("src").alias("subject"),
            F.lit(p).alias("predicate"),
            F.col("dst").alias("object"),
        )
        graph = graph.unionByName(closed)
    graph = graph.distinct()
    if trans_preds:
        graph = rowlocal_fixpoint(graph)
    return graph
