#!/usr/bin/env python3
"""Physical-plan audit: capture .explain("formatted") for the headline
queries and grep the properties that matter at 100 TB — parquet filter
pushdown / column pruning (ReadSchema), broadcast joins for dimension
tables, whole-stage codegen spans — into PLANS.md.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT = (
    "kg_triples",
    "sheet_nation_triples",
    "nation_revenue",
    "pricing_summary",
    "top_orders_per_customer",
    "dedup_minhash",
    "embed_topk",
    "j4_priority_resolve",
    "sheet_disorder_compound",
    "assessment_questions",
    "jaccard_pairs",
    "w1_running_counter",
    "w2_rdf_seq",
    # round-2 graph / cleaning / session families
    "kg_pagerank",
    "embed_ivf",
    "text_pii",
    "segment_dedup",
    "event_sessions",
    "dedup_clusters",
    "decontaminate",
    "url_canonical",
    "text_lm_surprise",
    "kg_hops",
    "events_range_join",
    "kg_lpa",
    "kg_link_predict",
    "mix_weights",
    "ann_recall",
    "corpus_curation",
    # round-4 additions
    "dedup_incremental",
    "text_line_repetition",
    "kg_star_join",
    "kg_chain_join",
    "kg_optional_join",
    "kg_triple_diff",
    "events_snapshot",
    "events_rollup",
    "kg_clustering",
    "kg_edge_lift",
    "kg_degree_hist",
    "kg_bgp_compile",
    "kg_construct_rule",
    "kg_property_table",
    # round-4b: SPARQL algebra, inference, shapes, personalization
    "kg_union_join",
    "kg_minus_filter",
    "kg_path_closure",
    "kg_rdfs_closure",
    "kg_shacl_report",
    "kg_ppr",
    "kg_canonical_triples",
    # round-4c: link analysis, dataset stats, provenance, structure
    "kg_hits",
    "kg_void_stats",
    "kg_rule_support",
    "kg_reciprocity",
    "kg_owl_closure",
    "kg_group_agg",
    "kg_char_sets",
    "kg_path_query",
    "kg_bgp_optimized",
    "kg_describe",
    "kg_assortativity",
    "kg_named_graphs",
    "kg_values_bind",
    # round-4d: global structure + SPARQL modifiers/existence
    "kg_scc",
    "kg_bowtie",
    "kg_top_entities",
    "kg_ask",
    "kg_filter_exists",
    "kg_subquery",
    "kg_shacl_path",
    "kg_walks",
    "kg_skipgram",
    "text_kn_lm",
    "text_bpe_encode",
    "kg_closeness",
    "kg_cocitation",
    "text_cdc_dedup",
    "kg_harmonic",
    "kg_adamic_adar",
    "events_rollup_refresh",
)

CHECKS = {
    # ORDER BY + LIMIT must be a top-k, never a global sort shuffle
    "kg_top_entities": ["TakeOrderedAndProject"],
    # EXISTS/NOT EXISTS are semi/anti joins on the shared variables
    "kg_filter_exists": ["LeftSemi", "LeftAnti"],
    # scalar-aggregate subquery is a 1-row broadcast, never a shuffle join
    "kg_subquery": ["BroadcastNestedLoopJoin"],
    # KN LM joins are aggregate-to-aggregate with map-side partials
    "text_kn_lm": ["HashAggregate"],
    # skip-gram pair extraction: one aggregation after the walk-id join
    "kg_skipgram": ["HashAggregate", "Generate"],
    # CDC chunk ids come from one per-doc running sum
    "text_cdc_dedup": ["Window"],
    # continuous-aggregate merge is a keyed outer join, no Window/CTE scan
    "events_rollup_refresh": ["HashAggregate"],
    "nation_revenue": ["BroadcastHashJoin", "PushedFilters"],
    "sheet_nation_triples": ["BroadcastHashJoin"],
    "pricing_summary": ["HashAggregate"],  # partial agg before Exchange; codegen not rendered in AQE formatted output pre-execution
    "top_orders_per_customer": ["Window"],
    "j4_priority_resolve": ["BroadcastHashJoin"],
    "embed_topk": ["BroadcastNestedLoopJoin"],
    # compound labels: severity dim must broadcast
    "sheet_disorder_compound": ["BroadcastHashJoin"],
    # the question-chain plan materializes its shared subplan
    # (localCheckpoint -> Scan ExistingRDD); the W1 Window / W2 Generate
    # execute inside that materialization and are audited standalone
    "assessment_questions": ["Union", "ArrowEvalPython"],
    "w1_running_counter": ["Window"],
    "w2_rdf_seq": ["Generate"],
    # assignment is a pure map stage (numpy kernel); no join anywhere
    "embed_ivf": ["MapInPandas"],
    # pure row-local projection: the ONLY Exchange is the fixture-spread
    # roundrobin repartition in _read_spread — the operator itself must
    # introduce no hash shuffle ("!" = must NOT appear in the plan)
    "text_pii": ["!Exchange hashpartitioning"],
    # row-local canonicalization: same contract as text_pii
    "url_canonical": ["!Exchange hashpartitioning"],
    "event_sessions": ["Window"],
    # eval-gram probe must be a broadcast join (text never shuffles)
    "decontaminate": ["BroadcastHashJoin"],
    # count-table joins partial-aggregate map-side before shuffling
    "text_lm_surprise": ["HashAggregate"],
    # frontier BFS / LPA iterate with per-round localCheckpoint, so the
    # FINAL plan is just the materialized scan; the per-round plan
    # properties (frontier-proportional shuffle, single Exchange per LPA
    # round) are asserted in tests/test_graph.py
    "kg_hops": ["Scan ExistingRDD"],
    # the banded interval join must never fall back to a per-key cross
    # product — that is its whole point
    "events_range_join": ["!BroadcastNestedLoopJoin", "!CartesianProduct"],
    "kg_link_predict": ["!CartesianProduct"],
    "kg_lpa": ["Scan ExistingRDD"],
    # star BGP: ONE aggregation + a semi-join back — never P-1 self-joins
    "kg_star_join": ["LeftSemi"],
    # diff folds both sides into one presence-flag aggregation — the
    # naive full-outer-join formulation must not appear
    "kg_triple_diff": ["!FullOuter", "HashAggregate"],
    # upsert compaction is a single argmax aggregation, never a Window
    "events_snapshot": ["!Window"],
    # grouping-sets rollup expands map-side into one aggregation
    "events_rollup": ["Expand", "!Window"],
    # df sides + corpus count broadcast; no shuffle joins on edge keys
    "kg_edge_lift": ["BroadcastHashJoin", "!SortMergeJoin"],
    "kg_degree_hist": ["HashAggregate"],
    # a 3-pattern BGP with shared variables never degenerates to a
    # cartesian plan
    "kg_bgp_compile": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    "kg_construct_rule": ["!CartesianProduct", "Union"],
    # ONE aggregation, never a per-predicate self-join chain (string-min
    # buffers are immutable, so Catalyst picks SortAggregate here —
    # "Aggregate" matches either physical choice)
    "kg_property_table": ["Aggregate", "!SortMergeJoin", "!Join"],
    # union branches concatenate without a join between them; the only
    # joins are within-branch and never cartesian
    "kg_union_join": ["Union", "!CartesianProduct"],
    # MINUS is a left-anti join on the shared variable only
    "kg_minus_filter": ["LeftAnti", "!CartesianProduct"],
    # fixpoint loops checkpoint per round; the final plan is the
    # materialized closure scan (per-round delta-proportional joins are
    # asserted in tests/test_graph.py)
    "kg_path_closure": ["Scan ExistingRDD"],
    # rdfs9's instance-scale join is a broadcast of the class closure
    "kg_rdfs_closure": ["BroadcastHashJoin"],
    # cardinality checks are aggregations; value checks add no join
    # against the focus universe beyond the left joins on focus keys
    "kg_shacl_report": ["HashAggregate", "Union", "!CartesianProduct"],
    "kg_ppr": ["Scan ExistingRDD"],
    # the canonical map applies as two broadcast left joins
    "kg_canonical_triples": ["BroadcastHashJoin", "!SortMergeJoin"],
    # power iterations checkpoint per round → final plan is a scan
    "kg_hits": ["Scan ExistingRDD"],
    # VoID stats are ONE predicate-keyed aggregation over the triple
    # fixture (whose construction joins; the stats themselves add none)
    "kg_void_stats": ["HashAggregate", "!CartesianProduct"],
    # witness counting aggregates the BGP binding set; the binding
    # joins are hash joins, never cartesian
    "kg_rule_support": ["HashAggregate", "!CartesianProduct"],
    # reciprocity = reversed-key self-semi-join + two 1-row counts;
    # the only nested-loop is the intended 1-row × 1-row crossJoin
    "kg_reciprocity": ["LeftSemi", "!CartesianProduct"],
    # rule fixpoints checkpoint per round → final plan is a scan
    "kg_owl_closure": ["Scan ExistingRDD"],
    # SPARQL GROUP BY/HAVING compiles to ONE aggregation, no window
    "kg_group_agg": ["HashAggregate", "!Window", "!CartesianProduct"],
    # two chained aggregations (subject-keyed, then set-keyed); the
    # string-set buffer makes Catalyst pick SortAggregate — match either
    "kg_char_sets": ["Aggregate", "!Window", "!CartesianProduct"],
    # property-path sequence compiles to equi-joins; the zero-or-one
    # identity is a union branch, never a cartesian expansion
    "kg_path_query": ["Union", "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # selectivity-reordered BGP stays all-equi-join
    "kg_bgp_optimized": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # CBD hops are frontier left-semi joins
    "kg_describe": ["LeftSemi", "!CartesianProduct"],
    # degree joins broadcast the entity-sized degree table
    "kg_assortativity": ["BroadcastHashJoin", "!SortMergeJoin", "!CartesianProduct"],
    # ONE aggregation after the uniform doc_id join; never a window
    "kg_named_graphs": ["ObjectHashAggregate", "!Window", "!CartesianProduct"],
    # VALUES is an IN predicate (no literal-table join); BIND row-local
    "kg_values_bind": ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
}


def main() -> None:
    from bench import build_spark
    from mhdb_tables2turtles_spark.queries import QUERIES

    spark = build_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    out = ["# PLANS — physical plan audit (`.explain(\"formatted\")`)\n"]
    out.append(
        "Auto-generated by `python scripts/plan_audit.py` at sf_dir="
        f"`{sf_dir}`.  Checked properties: broadcast joins for dims, "
        "parquet pushdown/pruning, whole-stage codegen, no cartesian "
        "products except the intended brute-force rerank.\n"
    )
    failures = []
    for name in AUDIT:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        for want in CHECKS.get(name, []):
            if want.startswith("!"):
                if want[1:] in plan:
                    failures.append(f"{name}: forbidden {want[1:]}")
            elif want not in plan:
                failures.append(f"{name}: missing {want}")
        # keep the operator tree, drop the verbose per-node detail
        tree = plan.split("\n\n")[0]
        out.append(f"\n## {name}\n\n```\n{tree}\n```\n")
        checks = CHECKS.get(name)
        if checks:
            def _mark(c: str) -> str:
                if c.startswith("!"):
                    return f"no-{c[1:]}={'yes' if c[1:] not in plan else 'NO'}"
                return f"{c}={'yes' if c in plan else 'NO'}"

            out.append("Checks: " + ", ".join(_mark(c) for c in checks) + "\n")

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("PLANS.md written;", "FAILURES: " + "; ".join(failures) if failures else "all checks pass")
    spark.stop()


if __name__ == "__main__":
    main()
