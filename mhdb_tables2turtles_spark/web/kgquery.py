"""Query and maintenance operators over a MATERIALIZED triple table —
the consumer side of the KG-construction pipeline.

The reference stops at emitting Turtle (mhdb/write_ttl.py); a pipeline
that materializes (subject, predicate, object) rows to a table (our
``web/materialize.py`` stage) also needs the table to be queryable and
maintainable.  Three operators cover the core of that surface:

* :func:`bgp_star` — a star Basic Graph Pattern (the SPARQL shape
  ``?s p1 o1 . ?s p2 o2 . ...``) answered with ONE aggregation instead
  of the textbook chain of P-1 self-joins.
* :func:`triple_diff` — snapshot diff between two triple sets
  (added / removed / kept), the primitive behind incremental re-crawl
  updates of an Iceberg triple table.
* :func:`latest_state` — upsert-compaction: latest property value per
  (entity, property) as of a cutoff, i.e. the read-side view of a
  merge-on-read triple changelog.

All three are pure DataFrame compositions (no UDFs, whole-stage
codegen end to end) with exactly one shuffle each on a near-uniform
key, so they inherit AQE's skew handling and survive a 100x scale-up
unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bgp_star",
    "bgp_chain",
    "bgp_optional",
    "bgp_union",
    "compile_bgp",
    "compile_bgp_optimized",
    "construct",
    "describe",
    "group_solutions",
    "order_bgp",
    "predicate_counts",
    "property_table",
    "triple_diff",
    "latest_state",
    "solution_modifiers",
    "ask",
]


def bgp_star(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str]],
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """All triples of every subject matching a star BGP: ``patterns``
    is a list of ``(predicate, object)`` literal pairs and a subject
    matches when it has ALL of them (``?s p1 o1 . ?s p2 o2 . ...``).

    Plan shape: instead of P-1 self-joins on ``subject`` (one shuffle
    each, the naive SPARQL translation), tag each triple with the
    index of the pattern it satisfies, aggregate ONCE by subject
    counting distinct satisfied patterns, and keep subjects hitting
    all P — a single shuffle whose input is pre-filtered to only the
    pattern-matching rows (the filter pushes into the scan).  The
    matching-subject set then semi-joins back against the full table
    to return the whole star; star patterns are selective, so AQE's
    runtime size estimate turns that semi-join into a broadcast —
    at 10^12 triples the only full-size shuffle is the one
    aggregation.
    """
    if not patterns:
        raise ValueError("bgp_star needs at least one (predicate, object)")
    tag = F.lit(None).cast("int")
    for i, (p, o) in enumerate(patterns):
        tag = F.when(
            (F.col(predicate_col) == p) & (F.col(object_col) == o), F.lit(i)
        ).otherwise(tag)
    matched = (
        triples.withColumn("__pat", tag)
        .filter(F.col("__pat").isNotNull())
        .groupBy(subject_col)
        .agg(F.count_distinct("__pat").alias("__n"))
        .filter(F.col("__n") == len(patterns))
        .select(subject_col)
    )
    return triples.join(matched, subject_col, "left_semi")


def bgp_chain(
    triples: DataFrame,
    predicates: Sequence[str],
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    distinct: bool = True,
) -> DataFrame:
    """Property-path chain BGP: ``?x0 p1 ?x1 . ?x1 p2 ?x2 . ...`` —
    every path through the graph following ``predicates`` in order,
    returned as columns ``x0 .. xK``.

    Plan shape: each hop is the triple table FILTERED to one predicate
    before it joins — on a predicate-partitioned triple store (the
    standard physical layout for an Iceberg triple table: partition by
    predicate, sort by subject) that filter is partition pruning, so
    each hop scans only its predicate's slice instead of all 10^12
    triples.  The joins are equi-joins on entity IRIs: hub entities
    (owl:Thing-style) skew those keys, which is exactly the AQE
    skew-join case; at a known-pathological hub, pre-cap with the same
    degree-threshold treatment as
    :func:`~mhdb_tables2turtles_spark.web.graphrank.link_predict`.

    ``distinct`` collapses duplicate paths contributed by duplicate
    triples (set semantics, the SPARQL default); pass ``False`` for
    bag semantics.
    """
    if not predicates:
        raise ValueError("bgp_chain needs at least one predicate")
    cur = triples.filter(F.col(predicate_col) == predicates[0]).select(
        F.col(subject_col).alias("x0"), F.col(object_col).alias("x1")
    )
    if distinct:
        cur = cur.distinct()
    for i, p in enumerate(predicates[1:], start=2):
        hop = triples.filter(F.col(predicate_col) == p).select(
            F.col(subject_col).alias(f"x{i - 1}"),
            F.col(object_col).alias(f"x{i}"),
        )
        if distinct:
            hop = hop.distinct()
        cur = cur.join(hop, f"x{i - 1}")
        if distinct:
            cur = cur.distinct()
    # column order x0..xK regardless of join-key reordering
    return cur.select(*[f"x{i}" for i in range(len(predicates) + 1)])


def bgp_optional(
    triples: DataFrame,
    required: tuple[str, str],
    optional_pred: str,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """SPARQL OPTIONAL: ``?s req_p req_o . OPTIONAL { ?s opt_p ?v }`` —
    every subject matching the required pattern, with one row per
    optional-pattern binding and a single null-``v`` row when the
    subject has none (left-join semantics, the SPARQL spec behavior).

    Plan shape: both sides are predicate-filtered before the join
    (partition pruning on a predicate-partitioned store); the required
    side is distinct subjects (selective pattern → AQE broadcasts it),
    the optional side joins LEFT from it so unmatched subjects survive.
    """
    p, o = required
    subjects = (
        triples.filter(
            (F.col(predicate_col) == p) & (F.col(object_col) == o)
        )
        .select(F.col(subject_col).alias("s"))
        .distinct()
    )
    opt = triples.filter(F.col(predicate_col) == optional_pred).select(
        F.col(subject_col).alias("s"), F.col(object_col).alias("v")
    ).distinct()
    return subjects.join(opt, "s", "left")


def compile_bgp(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    optional: Sequence[tuple[str, str, str]] = (),
    minus: Sequence[tuple[str, str, str]] = (),
    filters: Sequence[str] = (),
    exists: Sequence[tuple[str, str, str]] = (),
    not_exists: Sequence[tuple[str, str, str]] = (),
    values: "dict[str, Sequence[str]] | None" = None,
    bind: "dict[str, str] | None" = None,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    distinct: bool = True,
) -> DataFrame:
    """General Basic Graph Pattern compiler: each pattern is an
    ``(s, p, o)`` term triple where terms starting with ``?`` are
    variables and anything else matches literally; the result has one
    column per variable (named without the ``?``, in first-appearance
    order).  ``optional`` patterns left-join after the required block
    (SPARQL OPTIONAL).  Subsumes :func:`bgp_star` (one variable,
    repeated) and :func:`bgp_chain` (a linear variable chain).

    ``minus`` is a second pattern block compiled the same way whose
    solutions REMOVE required-block bindings that agree on every shared
    variable — SPARQL MINUS.  Per the spec, a minus block sharing no
    variable with the required block removes nothing (it is ignored,
    not a cartesian filter).  ``filters`` are SQL boolean expressions
    over the variable names (SPARQL FILTER), applied after the joins so
    they may reference variables from any pattern; Catalyst pushes each
    one down as far as its column references allow.

    Compilation: each pattern becomes the triple table filtered on its
    literal positions and projected to its variable positions (a
    repeated variable inside one pattern compiles to an equality
    filter); patterns then natural-join on shared variables in the
    order given — write selective patterns first, though AQE's runtime
    statistics re-plan the join strategy (broadcast below threshold)
    either way.  Literal-predicate filters reach the scan, which on a
    predicate-partitioned triple store is partition pruning.  Patterns
    sharing no variable with the accumulated result produce an explicit
    crossJoin (the SPARQL cartesian case — caller's responsibility at
    scale).  MINUS compiles to a left-anti join on the shared
    variables — never a subtract over full rows, so only the shared
    columns shuffle.

    ``values`` is SPARQL VALUES in its per-variable form — inline data
    restricting each named variable to an enumerated set:
    ``{"e": [":A", ":B"]}``.  Each entry compiles to an IN-list
    predicate applied before OPTIONAL/MINUS, which Catalyst pushes
    below the joins into that variable's pattern scan (partition-level
    pruning on a predicate/subject-organized store) — strictly cheaper
    than the textbook literal-table join, sound because VALUES is an
    inner join in the SPARQL algebra and inner joins commute.
    Correlated multi-variable VALUES rows compose as a ``filters``
    disjunction.

    ``exists`` / ``not_exists`` are SPARQL ``FILTER (NOT) EXISTS``
    pattern blocks: a solution survives iff the block has a compatible
    solution (correlation = equality on the variables shared with the
    outer block; a shared variable left UNBOUND by OPTIONAL is free
    inside the block, per SPARQL substitution semantics), compiled as
    a left-SEMI / left-ANTI join on exactly the shared variables —
    only those columns shuffle, and the block's own bindings never
    widen the result.  Rows where an optional-bound shared variable is
    null take a null-aware nested-loop semi/anti join against the
    block's DISTINCT shared bindings instead of the equi join; that
    side is exactly the null-bearing rows, the rest stays on the
    shuffled fast path.  The spec's divergence from
    MINUS is preserved: with NO shared variable, EXISTS/NOT EXISTS
    degenerate to a boolean gate on whether the block has ANY solution
    (compiled as a 1-row LocalLimit broadcast — ``FILTER NOT EXISTS
    {{?x ?y ?z}}`` against a non-empty graph removes everything),
    whereas disjoint MINUS removes nothing.  ``bind`` is SPARQL BIND —
    each ``alias -> SQL
    expression`` over in-scope variables appends a new bound column
    (row-local, zero shuffle); binds evaluate in the given order after
    FILTER, so later binds may reference earlier ones.
    """
    if not patterns:
        raise ValueError("compile_bgp needs at least one required pattern")

    def compile_one(pat: tuple[str, str, str]) -> DataFrame:
        df = triples
        seen: dict[str, str] = {}  # var -> first physical column
        for term, col in zip(pat, (subject_col, predicate_col, object_col)):
            if term.startswith("?"):
                var = term[1:]
                if not var:
                    raise ValueError(f"bad variable in pattern {pat!r}")
                if var in seen:  # ?x p ?x — same-row equality
                    df = df.filter(F.col(seen[var]) == F.col(col))
                else:
                    seen[var] = col
            else:
                df = df.filter(F.col(col) == term)
        proj = df.select(
            *[F.col(col).alias(var) for var, col in seen.items()]
        )
        return proj.distinct() if distinct else proj

    order: list[str] = []

    def join_in(cur, pat, how):
        nxt = compile_one(pat)
        for v in nxt.columns:
            if v not in order:
                order.append(v)
        if cur is None:
            return nxt
        shared = [c for c in cur.columns if c in nxt.columns]
        if not shared:
            if how == "left":
                raise ValueError(
                    f"optional pattern {pat!r} shares no variable with "
                    "the required block"
                )
            return cur.crossJoin(nxt)
        return cur.join(nxt, shared, how)

    cur = None
    for pat in patterns:
        cur = join_in(cur, pat, "inner")
    for var, allowed in (values or {}).items():
        if var not in cur.columns:
            raise ValueError(f"VALUES variable ?{var} is not bound")
        if not allowed:
            raise ValueError(f"VALUES for ?{var} is empty")
        cur = cur.filter(F.col(var).isin(*allowed))
    if minus:
        neg = None
        for pat in minus:
            neg = join_in(neg, pat, "inner")
        # join_in appended the minus block's variables to the output
        # order; they bind nothing in the result — drop them again
        order = [v for v in order if v in cur.columns]
        shared = [c for c in cur.columns if c in neg.columns]
        if shared:  # disjoint MINUS removes nothing (SPARQL spec)
            cur = cur.join(neg.select(*shared), shared, "left_anti")
    bound_before_opt = set(cur.columns) if cur is not None else set()
    for pat in optional:
        cur = join_in(cur, pat, "left")
    # only variables INTRODUCED by OPTIONAL can be unbound: a variable
    # the required block already binds stays non-null through the left
    # joins, so keeping it out of opt_vars lets EXISTS blocks sharing
    # it compile to the plain equi semi/anti join instead of the
    # split solid/null-aware union plan
    opt_vars = {
        t[1:] for pat in optional for t in pat if t.startswith("?")
    } - bound_before_opt
    for block, keep in ((exists, True), (not_exists, False)):
        if not block:
            continue
        blk = None
        for pat in block:
            blk = join_in(blk, pat, "inner")
        order = [v for v in order if v in cur.columns]
        shared = [c for c in cur.columns if c in blk.columns]
        how = "left_semi" if keep else "left_anti"
        if shared:
            blk_s = blk.select(*shared).distinct()
            # SPARQL substitution semantics: a shared variable left
            # UNBOUND by OPTIONAL is free inside the block, not an
            # equality constraint — an equi semi/anti join would make
            # EXISTS drop such rows and NOT EXISTS always keep them.
            # Only optional-bound variables can be null, so the
            # null-aware path (IS NULL OR equal per variable — a
            # nested-loop join against the DISTINCT shared-binding
            # set) runs over just the null-bearing rows; everything
            # else takes the shuffled equi join.
            nullable = [c for c in shared if c in opt_vars]
            if not nullable:
                cur = cur.join(blk_s, shared, how)
            else:
                has_null = F.lit(False)
                for c in nullable:
                    has_null = has_null | F.col(c).isNull()
                solid = cur.filter(~has_null).join(blk_s, shared, how)
                o, b = cur.filter(has_null).alias("__o"), blk_s.alias(
                    "__b"
                )
                cond = F.lit(True)
                for c in shared:
                    cond = cond & (
                        F.col(f"__o.{c}").isNull()
                        | (F.col(f"__o.{c}") == F.col(f"__b.{c}"))
                    )
                cur = solid.unionByName(o.join(b, cond, how))
        else:
            gate = blk.limit(1).select(F.lit(1).alias("__gate"))
            cur = (
                cur.withColumn("__gate", F.lit(1))
                .join(gate, "__gate", how)
                .drop("__gate")
            )
    for expr in filters:
        cur = cur.filter(F.expr(expr))
    for alias, expr in (bind or {}).items():
        if alias in cur.columns:
            raise ValueError(f"BIND would rebind in-scope variable ?{alias}")
        cur = cur.withColumn(alias, F.expr(expr))
        order.append(alias)
    out = cur.select(*order)
    return out.distinct() if distinct else out


def predicate_counts(
    triples: DataFrame, predicate_col: str = "predicate"
) -> "dict[str, int]":
    """Triple count per predicate — the one-line VoID statistic every
    cost-based triple-store optimizer keeps (it is also the partition
    row count on the predicate-partitioned layout of web/store.py, so
    on a real catalog it reads from table metadata instead of a scan).
    The collect is predicate-cardinality-sized: dozens-to-thousands of
    rows in a web KG, never instance-scale."""
    return {
        r["p"]: r["n"]
        for r in triples.groupBy(F.col(predicate_col).alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    }


def _bgp_cost(pat: "tuple[str, str, str]", stats: "dict[str, int]", total: int) -> int:
    """Estimated binding count of one pattern: the predicate's triple
    count when the predicate is literal (unknown predicate -> 0 rows),
    else the table total; each further bound subject/object literal
    cuts the estimate by 10x (the classic fixed-selectivity heuristic —
    exact s/o histograms are what characteristic sets refine, but the
    predicate count alone already separates patterns by orders of
    magnitude in a heavy-tailed KG)."""
    s, p, o = pat
    card = total if p.startswith("?") else stats.get(p, 0)
    for term in (s, o):
        if not term.startswith("?"):
            card //= 10
    return card


def order_bgp(
    patterns: Sequence["tuple[str, str, str]"],
    stats: "dict[str, int]",
    total: int | None = None,
) -> "list[tuple[str, str, str]]":
    """Greedy selectivity join ordering for a BGP: start from the
    cheapest pattern, then repeatedly take the cheapest pattern that
    shares a variable with the bound set (connected joins stay
    equi-joins); a disconnected pattern is taken only when nothing
    connected remains (the unavoidable SPARQL cartesian case).
    Deterministic: ties break on input position.

    This is the textbook triple-store planner (RDF-3X's selectivity
    ordering over exact predicate counts) expressed as a pre-pass over
    :func:`compile_bgp`'s given-order compilation — Catalyst reorders
    join STRATEGY (broadcast vs shuffle, via AQE) but not multi-way
    join ORDER across the lazily-built tree, so pattern order is the
    one planning decision left to this layer.
    """
    if total is None:
        total = max(sum(stats.values()), 1)
    pats = list(patterns)
    if not pats:
        return pats

    def pat_vars(pat):
        return {t[1:] for t in pat if t.startswith("?") and len(t) > 1}

    costs = {i: _bgp_cost(pats[i], stats, total) for i in range(len(pats))}

    # connected components over shared variables: each component orders
    # independently (cheapest pattern anchors, then always a connected
    # pattern), and components concatenate cheapest-anchor-first — so
    # the only cross joins compile_bgp emits are between FULLY-REDUCED
    # component results at component boundaries, never mid-component
    remaining = set(range(len(pats)))
    components: "list[list[int]]" = []
    while remaining:
        seed = min(
            remaining, key=lambda i: (costs[i], i)
        )  # component anchor = its cheapest pattern
        comp = [seed]
        remaining.remove(seed)
        bound = pat_vars(pats[seed])
        while True:
            connected = [i for i in remaining if pat_vars(pats[i]) & bound]
            if not connected:
                break
            nxt = min(connected, key=lambda i: (costs[i], i))
            comp.append(nxt)
            remaining.remove(nxt)
            bound |= pat_vars(pats[nxt])
        components.append(comp)
    # components came out anchored-cheapest-first already (each seed was
    # the global min of what remained)
    return [pats[i] for comp in components for i in comp]


def compile_bgp_optimized(
    triples: DataFrame,
    patterns: Sequence["tuple[str, str, str]"],
    stats: "dict[str, int] | None" = None,
    **kwargs,
) -> DataFrame:
    """:func:`compile_bgp` behind :func:`order_bgp`: reorder the
    required block by estimated selectivity before compiling.  Only the
    required ``patterns`` reorder — OPTIONAL/MINUS blocks keep their
    SPARQL-mandated evaluation position.  ``stats`` defaults to one
    :func:`predicate_counts` pass over the table (metadata-cheap on a
    predicate-partitioned store).  Result set is order-independent, so
    this is a pure physical optimization — the driver oracle for it is
    the same SQL as the naive ordering."""
    if stats is None:
        stats = predicate_counts(triples)
    ordered = order_bgp(patterns, stats)
    return compile_bgp(triples, ordered, **kwargs)


def bgp_union(
    triples: DataFrame,
    blocks: Sequence[Sequence[tuple[str, str, str]]],
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    distinct: bool = True,
) -> DataFrame:
    """SPARQL UNION: solve each pattern block with :func:`compile_bgp`
    and union the solution sets.  Every block must bind the SAME
    variable set (the common SPARQL shape; general unions with unbound
    columns are an OPTIONAL restatement) — enforced loudly rather than
    silently null-padded.  Columns follow the first block's order.

    Plan shape: each branch is an independently compiled join tree —
    they parallelize as sibling stages — and the union itself is a
    zero-shuffle concatenation; only the final ``distinct`` (set
    semantics, the SPARQL default) shuffles, keyed by the full binding
    row.  Pass ``distinct=False`` for UNION ALL / bag semantics.
    """
    if not blocks:
        raise ValueError("bgp_union needs at least one pattern block")
    kw = dict(
        subject_col=subject_col,
        predicate_col=predicate_col,
        object_col=object_col,
        distinct=False,
    )
    parts = [compile_bgp(triples, b, **kw) for b in blocks]
    cols = parts[0].columns
    for i, p in enumerate(parts[1:], start=2):
        if set(p.columns) != set(cols):
            raise ValueError(
                f"bgp_union block {i} binds {sorted(p.columns)}, "
                f"block 1 binds {sorted(cols)} — blocks must agree"
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct() if distinct else out


def construct(
    triples: DataFrame,
    where: Sequence[tuple[str, str, str]],
    template: Sequence[tuple[str, str, str]],
    optional: Sequence[tuple[str, str, str]] = (),
) -> DataFrame:
    """SPARQL CONSTRUCT: solve the ``where`` BGP
    (:func:`compile_bgp`), then mint one triple per ``template``
    pattern per binding — variables substitute from the binding,
    non-variable terms pass through as constants.  Template rows whose
    variables are unbound (possible via ``optional``) are dropped, per
    the SPARQL spec.  Output is the deduplicated
    ``(subject, predicate, object)`` set — ready for
    :func:`triple_diff` / the materialize stages.

    This is the derived-graph primitive (inference rules, graph
    reshaping, view maintenance): the WHERE solve is one compiled join
    plan, and the template fan-out is a row-local projection + union —
    no additional shuffles beyond a final distinct."""
    bindings = compile_bgp(triples, where, optional=optional)

    def term(t: str):
        return F.col(t[1:]) if t.startswith("?") else F.lit(t)

    parts = []
    for s, p, o in template:
        row = bindings.select(
            term(s).alias("subject"),
            term(p).alias("predicate"),
            term(o).alias("object"),
        )
        parts.append(
            row.filter(
                F.col("subject").isNotNull()
                & F.col("predicate").isNotNull()
                & F.col("object").isNotNull()
            )
        )
    out = parts[0]
    for more in parts[1:]:
        out = out.unionAll(more)
    return out.distinct()


def describe(
    triples: DataFrame,
    focus: DataFrame,
    hops: int = 1,
) -> DataFrame:
    """SPARQL DESCRIBE as a Concise Bounded Description: every triple
    whose subject is a focus node, expanded ``hops`` levels through
    OBJECT links (the CBD's blank-node-closure generalized to an
    IRI-hop bound — this KG skolemizes everything, so a fixed hop bound
    replaces the bnode recursion).  ``focus`` is a one-column ``node``
    DataFrame; output is the deduplicated describing triple set.

    Plan shape: per hop, ONE left-semi join of the (predicate-pruned)
    triple table against the current focus set, then the next focus set
    is the objects just reached — frontier-style, like bfs_hops: each
    round's semi-join is proportional to the frontier, and the focus
    side broadcasts while it is small (the common case: DESCRIBE of a
    handful of entities)."""
    if hops < 1:
        raise ValueError("describe needs hops >= 1")
    cur = focus.select(F.col("node")).distinct()
    out = None
    for _ in range(hops):
        described = triples.join(
            cur, triples["subject"] == cur["node"], "left_semi"
        )
        out = described if out is None else out.unionByName(described)
        cur = described.select(F.col("object").alias("node")).distinct()
    return out.distinct()


def property_table(
    triples: DataFrame,
    predicates: Sequence[str],
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """Triple table → wide entity table: one row per subject, one
    column per requested predicate holding the MINIMUM object value
    (deterministic pick for multi-valued predicates) or null — the
    standard KG serving-layer layout (a "property table" in RDF-store
    terms).

    Plan shape: pre-filter to the requested predicates (partition
    pruning on a predicate-partitioned store), then ONE conditional
    aggregation keyed by subject — never one self-join per predicate.
    Column names strip a leading ``:`` so they stay SQL-friendly."""
    if not predicates:
        raise ValueError("property_table needs at least one predicate")
    base = triples.filter(F.col(predicate_col).isin(*predicates))
    aggs = [
        F.min(
            F.when(F.col(predicate_col) == p, F.col(object_col))
        ).alias(p.lstrip(":"))
        for p in predicates
    ]
    return base.groupBy(F.col(subject_col).alias("subject")).agg(*aggs)


def triple_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(subject, predicate, object, status): diff two triple snapshots —
    ``added`` (new only), ``removed`` (old only), ``kept`` (both).

    This is the maintenance primitive for incremental KG updates: a
    re-crawl batch produces a new per-page triple set; the diff against
    the committed snapshot is what gets merged into the Iceberg triple
    table (and what downstream consumers subscribe to).

    Plan shape: tag each side with presence flags, union, and take
    ``max`` per (s, p, o) — ONE shuffle keyed by the full triple
    (near-uniform; duplicate triples collapse map-side in the partial
    aggregation), versus the two shuffles of the naive
    full-outer-join formulation.
    """
    cols = ["subject", "predicate", "object"]
    tagged = old.select(
        *cols, F.lit(1).alias("__o"), F.lit(0).alias("__n")
    ).unionAll(new.select(*cols, F.lit(0).alias("__o"), F.lit(1).alias("__n")))
    return (
        tagged.groupBy(*cols)
        .agg(F.max("__o").alias("__o"), F.max("__n").alias("__n"))
        .select(
            *cols,
            F.when((F.col("__o") == 1) & (F.col("__n") == 1), F.lit("kept"))
            .when(F.col("__n") == 1, F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("status"),
        )
    )


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """One row per ``keys`` group: the ``value_cols`` of the row with
    the lexicographically greatest ``order_cols`` — upsert-compaction
    of a changelog (latest property value per entity as of whatever
    cutoff the caller pre-filtered to).

    ``order_cols`` must be unique per group (e.g. end with the event
    id) so the argmax is deterministic on both engines.

    Plan shape: ``max_by(struct(values), struct(order))`` — a partially
    aggregating argmax, ONE shuffle moving one candidate row per map
    partition per key, versus the ``row_number() over (partition by
    ...)`` formulation whose Exchange carries EVERY changelog row and
    then globally sorts each partition.  (Struct-typed buffers make
    Catalyst pick SortAggregate over HashAggregate — the sort is local
    to each already-reduced side, not the shuffle's.)  Keys are the
    entity id: near-uniform, AQE skew-split for the rest.
    """
    order_key = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in value_cols])
    picked = df.groupBy(*keys).agg(
        F.max_by(payload, order_key).alias("__last")
    )
    return picked.select(
        *keys, *[F.col(f"__last.{c}").alias(c) for c in value_cols]
    )


def group_solutions(
    solutions: DataFrame,
    group_by: Sequence[str],
    aggregates: "dict[str, str]",
    having: str | None = None,
) -> DataFrame:
    """SPARQL aggregation over a compiled solution set: ``GROUP BY`` the
    given variables, compute each ``alias -> SQL aggregate expression``
    pair (SPARQL's COUNT / SUM / MIN / MAX / AVG / SAMPLE /
    GROUP_CONCAT all map onto Spark SQL aggregates over the variable
    columns), and optionally apply a ``HAVING`` boolean that may
    reference both group keys and aggregate aliases.

    Composes with :func:`compile_bgp`: BGP solutions are a set (SPARQL
    default), so ``count(var)`` counts distinct bindings without a
    further DISTINCT.

    Plan shape: ONE aggregation — Catalyst partial-aggregates map-side
    before the single group-key shuffle, and HAVING evaluates post-
    aggregation on already-reduced rows (group keys in a web KG are
    entity-scale and near-uniform, so the shuffle inherits AQE's skew
    handling).  No window, no self-join — the textbook SPARQL-algebra
    translation (project + group) stays a single Exchange.
    """
    if not group_by:
        raise ValueError("group_solutions needs at least one group key")
    if not aggregates:
        raise ValueError("group_solutions needs at least one aggregate")
    out = solutions.groupBy(*group_by).agg(
        *[F.expr(expr).alias(name) for name, expr in aggregates.items()]
    )
    return out.filter(F.expr(having)) if having else out


def solution_modifiers(
    solutions: DataFrame,
    project: "Sequence[str] | None" = None,
    order_by: "Sequence[tuple[str, str]]" = (),
    limit: int | None = None,
    offset: int = 0,
    distinct: bool = False,
) -> DataFrame:
    """SPARQL solution modifiers: ``ORDER BY`` / ``LIMIT`` / ``OFFSET``
    / projection / ``DISTINCT``, applied in the spec's algebra order.

    ``order_by`` is ``(variable, 'asc'|'desc')`` pairs.  Without
    ``distinct``, ordering may reference non-projected variables
    (ORDER BY evaluates before projection per the spec), so the
    pipeline is order -> offset/limit -> project.  With ``distinct``,
    SPARQL requires every sort key to be visible in the projection
    (dedup happens on projected rows), so it becomes project ->
    distinct -> order -> offset/limit, and a sort key outside the
    projection is rejected loudly.

    Plan shape — the reason this is an operator and not a ``.sort()``
    habit: ORDER BY + LIMIT compiles to ``TakeOrderedAndProject``
    (per-partition top-k, then a size-k merge), NEVER a global
    range-partitioned sort — at web scale a top-10-of-10^12 costs one
    scan plus k rows of traffic, not a full-table shuffle
    (plan-asserted in tests/test_graph.py).  OFFSET pagination still
    materializes offset+limit rows per partition; deep pagination
    should keyset-paginate on the sort key instead (documented, not
    hidden).
    """
    out = solutions
    cols = set(out.columns)
    for var, _ in order_by:
        if var not in cols:
            raise ValueError(f"unknown sort variable {var!r}")
    if project:
        missing = [v for v in project if v not in cols]
        if missing:
            raise ValueError(f"unknown projection variables {missing}")

    def _sorted(df: DataFrame) -> DataFrame:
        keys = [
            F.col(v).desc() if direction == "desc" else F.col(v).asc()
            for v, direction in order_by
        ]
        return df.orderBy(*keys) if keys else df

    def _page(df: DataFrame) -> DataFrame:
        if offset:
            df = df.offset(offset)
        return df.limit(limit) if limit is not None else df

    if distinct:
        proj = list(project) if project else list(out.columns)
        outside = [v for v, _ in order_by if v not in proj]
        if outside:
            raise ValueError(
                f"DISTINCT projection hides sort variables {outside}"
            )
        return _page(_sorted(out.select(*proj).distinct()))
    out = _page(_sorted(out))
    return out.select(*project) if project else out


def ask(
    triples: DataFrame,
    patterns: "Sequence[tuple[str, str, str]]",
    **kwargs,
) -> DataFrame:
    """SPARQL ASK: one boolean row — does the BGP have any solution?

    Compiles the pattern with :func:`compile_bgp`, caps it at ONE row
    BEFORE aggregating (Spark's LocalLimit short-circuits each task at
    its first hit and the scan stops early — existence never pays for
    the full solution set), then reduces to ``exists``.
    """
    sol = compile_bgp(triples, patterns, **kwargs)
    return sol.limit(1).agg((F.count("*") > 0).alias("exists"))
