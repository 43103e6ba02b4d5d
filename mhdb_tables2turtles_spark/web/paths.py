"""SPARQL 1.1 property-path algebra over the materialized triple table.

The reference emits a static .ttl and leaves path queries to whatever
store loads it; this module gives the Iceberg-table consumer the same
navigational surface SPARQL 1.1 defines (W3C SPARQL 1.1 Query §9):
predicate steps, inverse (``^p``), sequence (``p/q``), alternation
(``p|q``), one-or-more (``p+``), zero-or-one (``p?``) and zero-or-more
(``p*``) — compiled to DataFrame operators, never row-at-a-time.

A path is a tiny AST built with the constructors below and evaluated by
:func:`eval_path` into a distinct ``(src, dst)`` pair set:

>>> eval_path(t, seq(pred(":mentions"), inv(pred(":mentions"))))

Plan shape per combinator (the 10^12-triple posture):

* ``pred`` — a predicate-literal filter on the scan; on a
  predicate-partitioned store (web/store.py) that is PARTITION PRUNING,
  so each step reads only its predicate's slice.
* ``inv`` — a column swap, zero cost.
* ``seq`` — one equi-join per step on entity keys (hub skew → AQE
  skew-join, same posture as kgquery.bgp_chain).
* ``alt`` — a zero-shuffle union; the final distinct is shared.
* ``plus`` — semi-naive :func:`~mhdb_tables2turtles_spark.web.
  inference.transitive_closure` (delta-proportional rounds).
* ``zero_or_one`` / ``zero_or_more`` — per the SPARQL spec the
  zero-length path matches EVERY graph node (``?x p? ?x`` binds all
  nodes), so both need the node universe: one distinct over the
  subject/object columns, computed once per evaluation.  At web scale
  prefer the bounded forms unless zero-length semantics are really
  wanted — the universe join is the one instance-scale distinct here.

All evaluation is set-semantics (SPARQL path results are node pairs,
not path multiplicities), matching the distinct-based oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pred",
    "npred",
    "inv",
    "seq",
    "alt",
    "plus",
    "zero_or_one",
    "zero_or_more",
    "eval_path",
]


def pred(p: str) -> tuple:
    """Atomic path step: the predicate ``p``."""
    return ("pred", p)


def npred(*ps: str) -> tuple:
    """Negated property set ``!(p1|p2|...)``: any FORWARD edge whose
    predicate is none of ``ps`` (SPARQL 1.1 §9.1).  The spec's mixed
    form with inverse members ``!(p|^q)`` splits into
    ``alt(npred(p...), inv(npred(q...)))`` — compose it from these
    primitives.  Plan note: unlike ``pred`` this cannot partition-prune
    a predicate-partitioned store down to one directory, but it still
    prunes the NAMED directories away (NOT IN over the partition
    column), which on a heavy-tailed store excluding the hot predicates
    skips most of the data."""
    if not ps:
        raise ValueError("npred needs at least one excluded predicate")
    return ("npred", tuple(ps))


def inv(x: tuple) -> tuple:
    """Inverse path ``^x``: swap source and destination."""
    return ("inv", x)


def seq(*xs: tuple) -> tuple:
    """Sequence path ``x1/x2/...``: destination of each step is the
    source of the next."""
    if not xs:
        raise ValueError("seq needs at least one step")
    return ("seq", xs)


def alt(*xs: tuple) -> tuple:
    """Alternative path ``x1|x2|...``: union of the pair sets."""
    if not xs:
        raise ValueError("alt needs at least one branch")
    return ("alt", xs)


def plus(x: tuple) -> tuple:
    """One-or-more path ``x+``: transitive closure.

    Deviation from the letter of the spec, shared with every closure in
    this repo (web/inference.py::transitive_closure and its recursive-
    CTE oracles): a cycle's self-pairs ``(x, x)`` are excluded — the
    closure answers reachability-to-a-DIFFERENT-node.  Spec-exact
    zero-length/self semantics are available via :func:`zero_or_more`,
    whose identity component covers every node including cycle members.
    """
    return ("plus", x)


def zero_or_one(x: tuple) -> tuple:
    """Zero-or-one path ``x?``: ``x`` plus the identity over every
    graph node (SPARQL zero-length-path semantics)."""
    return ("zero_or_one", x)


def zero_or_more(x: tuple) -> tuple:
    """Zero-or-more path ``x*``: ``x+`` plus the identity over every
    graph node."""
    return ("zero_or_more", x)


def _nodes(triples: DataFrame) -> DataFrame:
    """Every node of the graph (distinct subjects ∪ objects) as a
    one-column ``n`` DataFrame — the zero-length-path universe."""
    return (
        triples.select(F.col("subject").alias("n"))
        .unionByName(triples.select(F.col("object").alias("n")))
        .distinct()
    )


def eval_path(
    triples: DataFrame,
    path: tuple,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
) -> DataFrame:
    """Evaluate a path AST to its distinct ``(src, dst)`` pair set."""
    from mhdb_tables2turtles_spark.web.inference import transitive_closure

    t = triples.select(
        F.col(subject_col).alias("subject"),
        F.col(predicate_col).alias("predicate"),
        F.col(object_col).alias("object"),
    )

    def ev(node: tuple) -> DataFrame:
        kind, arg = node
        if kind == "pred":
            return t.filter(F.col("predicate") == arg).select(
                F.col("subject").alias("src"),
                F.col("object").alias("dst"),
            )
        if kind == "npred":
            return t.filter(~F.col("predicate").isin(*arg)).select(
                F.col("subject").alias("src"),
                F.col("object").alias("dst"),
            )
        if kind == "inv":
            return ev(arg).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        if kind == "seq":
            cur = ev(arg[0])
            for step in arg[1:]:
                nxt = ev(step)
                cur = (
                    cur.alias("l")
                    .join(nxt.alias("r"), F.col("l.dst") == F.col("r.src"))
                    .select(
                        F.col("l.src").alias("src"),
                        F.col("r.dst").alias("dst"),
                    )
                    .distinct()
                )
            return cur
        if kind == "alt":
            out = ev(arg[0])
            for branch in arg[1:]:
                out = out.unionByName(ev(branch))
            return out
        if kind == "plus":
            return transitive_closure(ev(arg).distinct())
        if kind in ("zero_or_one", "zero_or_more"):
            base = ev(arg)
            if kind == "zero_or_more":
                base = transitive_closure(base.distinct())
            ident = _nodes(t).select(
                F.col("n").alias("src"), F.col("n").alias("dst")
            )
            return base.unionByName(ident)
        raise ValueError(f"unknown path node {kind!r}")

    return ev(path).distinct()
