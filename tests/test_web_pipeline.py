"""Web-scale KG pipeline: extraction invariant, mention scan, linking,
connected components, staged resume."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.web import vocab as vocab_mod
from mhdb_tables2turtles_spark.web.canonicalize import connected_components
from mhdb_tables2turtles_spark.web.extract import extract_text, extract_text_col
from mhdb_tables2turtles_spark.web.mentions import scan_mentions
from mhdb_tables2turtles_spark.web.pipeline import KGPipeline, build_corpus
from mhdb_tables2turtles_spark.web.trie import AhoCorasick


# ---------- pure-Python kernels ----------

def test_extract_text_spec():
    html = (
        b"<html><head><style>x{}</style><script>var a=1;</script></head>"
        b"<body><!-- c --><h1>A &amp; B</h1><p>hello\n  world</p></body></html>"
    )
    assert extract_text(html) == "A & B hello world"
    assert extract_text(None) is None
    # deterministic on invalid utf-8
    assert extract_text(b"<p>a\xffb</p>") == "a�b"


def test_aho_corasick_word_boundaries():
    auto = AhoCorasick(["chill", "chills", "music", "go/no-go task"])
    text = "music gives chills; the chilly go/no-go task uses music"
    found = {(text[s:e], i) for s, e, i in auto.find_words(text)}
    surfaces = {f[0] for f in found}
    assert "chills" in surfaces and "music" in surfaces
    assert "chill" not in surfaces  # inside 'chills'/'chilly' is not a word hit
    assert "go/no-go task" in surfaces


def test_token_index_matcher_equals_aho_corasick():
    """The scan's hot path (TokenIndexMatcher) must emit the exact match
    SET the Aho-Corasick reference emits — nested phrases, overlapping
    occurrences, shared first tokens, separators inside patterns, and
    patterns starting with a non-word char (fallback path) included."""
    import random

    from mhdb_tables2turtles_spark.web.trie import TokenIndexMatcher

    vocab = [
        "chill", "chills", "music", "go/no-go task", "anxiety",
        "anxiety disorder", "generalized anxiety disorder", "panic",
        "panic attack", "panicattack", "st. john's wort", "adhd",
        "x", "x y", "x y z", "obsessive-compulsive", "self_report",
        "2-back", "n-back", "-leading", "'quoted",
    ]
    words = [
        "chill", "chills", "music", "go", "no", "task", "anxiety",
        "disorder", "generalized", "panic", "attack", "panicattack",
        "st", "john", "wort", "adhd", "x", "y", "z", "lorem",
        "self_report", "2", "n", "back", "obsessive", "compulsive",
        "leading", "quoted",
    ] + [f"w{i}" for i in range(40)]
    seps = [" ", "  ", "-", "/", ". ", "'", ", ", "\n"]
    auto = AhoCorasick(vocab)
    matcher = TokenIndexMatcher(vocab)
    rng = random.Random(7)
    for _ in range(200):
        text = "".join(
            rng.choice(words) + rng.choice(seps) for _ in range(400)
        ).lower()
        assert set(auto.find_words(text)) == set(matcher.find_words(text))
    # edge cases: text boundaries, empty text
    assert set(matcher.find_words("")) == set()
    assert set(auto.find_words("x y z")) == set(matcher.find_words("x y z"))


def test_vocabulary_from_golden():
    vf = vocab_mod.vocabulary_frame()
    assert len(vf) > 300
    assert set(vf.columns) == {"surface", "entity_iri", "entity_type", "is_alias"}
    assert (vf["surface"] == vf["surface"].str.lower()).all()
    # IRIs are minted from labels in this ontology, so a shared surface
    # collapses to one IRI (ambiguous linking is exercised synthetically
    # in test_linking_prefers_matching_profile)
    assert vf.groupby("surface")["entity_iri"].nunique().max() >= 1


# ---------- Spark stages ----------

@pytest.fixture(scope="module")
def corpus(spark):
    return build_corpus(spark, n_pages=60, seed=7, partitions=4).cache()


def test_pages_deterministic_and_invariant(spark, corpus):
    again = build_corpus(spark, n_pages=60, seed=7, partitions=2)
    a = {r.url: (r.text, bytes(r.html)) for r in corpus.collect()}
    b = {r.url: (r.text, bytes(r.html)) for r in again.collect()}
    assert a == b  # parallelism-independent generation
    # per-row invariant: stage-1 extraction reproduces the committed text
    mismatch = (
        corpus.withColumn("t2", extract_text_col(F.col("html")))
        .filter(F.col("t2") != F.col("text"))
        .count()
    )
    assert mismatch == 0


def test_scan_mentions_matches_python(spark, corpus):
    surfaces = ("music", "chills", "study")
    got = scan_mentions(corpus, surfaces).groupBy("surface").count().collect()
    got = {r.surface: r["count"] for r in got}
    auto = AhoCorasick(list(surfaces))
    want: dict[str, int] = {}
    for r in corpus.select("text").collect():
        for s, e, i in auto.find_words(r.text.lower()):
            want[surfaces[i]] = want.get(surfaces[i], 0) + 1
    assert got == want


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("f", "e"), ("x", "y")],
        ["src", "dst"],
    )
    comps = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert comps["a"] == comps["b"] == comps["c"] == "a"
    assert comps["d"] == comps["e"] == comps["f"] == "d"
    assert comps["x"] == comps["y"] == "x"


def test_connected_components_long_chain(spark):
    # pointer compression: a 40-node path converges within the cap
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(40)], ["src", "dst"]
    )
    comps = connected_components(edges)
    assert comps.select("component").distinct().count() == 1


def test_pipeline_end_to_end_and_resume(spark, corpus, tmp_path):
    wd = str(tmp_path / "kg")
    pipe = KGPipeline(spark, wd)
    out = pipe.run(corpus)
    triples = out["canonical"]
    assert triples.columns == ["subject", "predicate", "object"]
    n = triples.count()
    assert n > 0
    # every page minted a subject + type + URL triple
    n_pages_linked = out["linked"].select("url").distinct().count()
    assert (
        triples.filter(F.col("predicate") == "a").count() == n_pages_linked
    )
    counters = out["counters"]
    assert set(counters) == {"extract", "mentions", "linked", "triples", "canonical"}
    assert counters["extract"] == 60

    # resume: a fresh pipeline over the same workdir recomputes nothing
    pipe2 = KGPipeline(spark, wd)
    out2 = pipe2.run(corpus)
    assert all(step.startswith("resume:") for step in pipe2.staged.log)
    assert out2["canonical"].count() == n

    # lineage manifest shape
    man = pipe2.staged.manifest("mentions")
    assert man["rows"] == counters["mentions"]
    assert man["n_partitions"] >= 1
    assert sum(man["partitions"].values()) == man["rows"]

    # serving copy: export_store publishes the canonical graph in the
    # predicate-partitioned layout, value-identical to the staged table
    store_path = str(tmp_path / "store")
    pipe2.export_store(store_path)
    from mhdb_tables2turtles_spark.web.store import read_triple_store

    back = read_triple_store(spark, store_path)
    assert back.count() == n
    assert back.exceptAll(triples).count() == 0


def test_kill_mid_pipeline_resumes_from_last_commit(spark, corpus, tmp_path):
    """SURVEY §5.3-5: die after stage-2 commit, restart, identical final
    result with no recomputation of committed stages."""
    wd = str(tmp_path / "kgkill")
    # simulate a job killed after the first two stage commits
    from pyspark.sql import functions as F

    from mhdb_tables2turtles_spark.web.extract import extract_text_col
    from mhdb_tables2turtles_spark.web.mentions import scan_mentions

    dead = KGPipeline(spark, wd)
    extracted = dead.staged.stage(
        "extract",
        lambda: corpus.select(
            "url", "warc_ts", "lang", extract_text_col(F.col("html")).alias("text")
        ),
    )
    dead.staged.stage(
        "mentions", lambda: scan_mentions(extracted, dead.surfaces)
    )
    # process "dies" here; a fresh run picks up after the last commit
    pipe = KGPipeline(spark, wd)
    out = pipe.run(corpus)
    assert pipe.staged.log[:2] == ["resume:extract", "resume:mentions"]
    assert [s for s in pipe.staged.log if s.startswith("compute:")] == [
        "compute:linked",
        "compute:triples",
        "compute:canonical",
    ]
    # identical to a from-scratch run
    fresh = KGPipeline(spark, str(tmp_path / "kgfresh")).run(corpus)
    a = {(r.subject, r.predicate, r.object) for r in out["canonical"].collect()}
    b = {(r.subject, r.predicate, r.object) for r in fresh["canonical"].collect()}
    assert a == b


def test_canonicalization_merges_sameas(spark, corpus, tmp_path):
    pipe = KGPipeline(spark, str(tmp_path / "kg2"))
    # inject synthetic duplicates: two ontology IRIs declared equivalent
    some = pipe.vocab.limit(2).collect()
    a, b = some[0].entity_iri, some[1].entity_iri
    extra = spark.createDataFrame([(a, b)], ["src", "dst"])
    out = pipe.run(corpus, extra_equiv_edges=extra)
    objs = {
        r.object
        for r in out["canonical"].filter(F.col("predicate") == ":mentions").collect()
    }
    assert not (a in objs and b in objs)  # merged to one canonical IRI


def test_pipeline_with_ontology_and_turtle(spark, corpus, tmp_path):
    """P/R vs the reference graph: with include_ontology the canonical
    triple set contains every reference triple (recall 1.0) and the page
    triples never collide with reference IRI space (precision on the
    reference subset 1.0); ttl shards materialize."""
    import os

    from mhdb_tables2turtles_spark.sources.golden import load_golden_triples

    wd = str(tmp_path / "kg3")
    pipe = KGPipeline(spark, wd)
    out = pipe.run(corpus, include_ontology=True, write_turtle=True)
    ours = {
        (r.subject, r.predicate, r.object) for r in out["canonical"].collect()
    }
    golden = load_golden_triples()
    assert golden <= ours  # recall 1.0 vs reference triples
    assert os.path.exists(os.path.join(wd, "ttl", "_SUCCESS"))
    # shard contents parse back as subject blocks
    import glob

    text = "".join(
        open(p).read() for p in sorted(glob.glob(os.path.join(wd, "ttl", "part-*")))
    )
    assert " ;\n\t" in text and text.count(" .\n") >= out["counters"]["extract"]


def test_linking_prefers_matching_profile(spark):
    # two entities share surface 'sound'; page text overlaps entity A's profile
    vocab = spark.createDataFrame(
        pd.DataFrame(
            {
                "surface": ["sound", "sound"],
                "entity_iri": [":SoundMeasure", ":SoundStimulus"],
                "entity_type": [":Measure", ":StimulusCategory"],
                "is_alias": [False, False],
            }
        )
    )
    profiles = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_iri": [":SoundMeasure", ":SoundStimulus"],
                "profile_text": [
                    "sound measured decibel amplitude recording",
                    "sound stimulus auditory excerpt played",
                ],
            }
        )
    )
    pages = spark.createDataFrame(
        [
            ("u1", "the sound amplitude was measured in decibel units"),
            ("u2", "an auditory excerpt stimulus with sound was played"),
        ],
        ["url", "text"],
    )
    from mhdb_tables2turtles_spark.web.linking import link_mentions
    from mhdb_tables2turtles_spark.web.mentions import scan_mentions as scan

    mentions = scan(pages, ("sound",))
    linked = {
        r.url: r.entity_iri
        for r in link_mentions(mentions, vocab, pages, profiles).collect()
    }
    assert linked == {"u1": ":SoundMeasure", "u2": ":SoundStimulus"}


def test_token_idf_restriction_is_value_identical(spark):
    # pruning the token stream before the df aggregation must not change
    # idf for surviving tokens (the scale guard in link_mentions relies
    # on this: inner joins commute with the pre-shuffle semi-join)
    from mhdb_tables2turtles_spark.web.linking import token_idf

    pages = spark.createDataFrame(
        [
            ("u1", "alpha beta gamma alpha"),
            ("u2", "beta gamma delta"),
            ("u3", "gamma epsilon"),
        ],
        ["url", "text"],
    )
    keep = spark.createDataFrame([("beta",), ("gamma",)], ["token"])
    full = {r.token: r.idf for r in token_idf(pages).collect()}
    restricted = {
        r.token: r.idf for r in token_idf(pages, restrict_tokens=keep).collect()
    }
    assert set(restricted) == {"beta", "gamma"}
    assert restricted == {t: full[t] for t in restricted}


def test_page_entity_triples_join_strategy_by_scale(spark):
    """Below BROADCAST_MAX_URLS the IRI side broadcasts; above it the
    plan degrades to a shuffle equi-join on url — and both physical
    strategies produce the identical triple set."""
    from mhdb_tables2turtles_spark.web.mentions import (
        BROADCAST_MAX_URLS,
        page_entity_triples,
    )

    linked = spark.createDataFrame(
        [
            ("http://a.example/p1", ":Chills"),
            ("http://a.example/p1", ":Music"),
            ("http://b.example/p2", ":Chills"),
        ],
        ["url", "entity_iri"],
    )
    small = page_entity_triples(linked, n_urls=2)
    huge = page_entity_triples(linked, n_urls=BROADCAST_MAX_URLS + 1)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    plan_huge = huge._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small
    assert "BroadcastHashJoin" not in plan_huge  # SMJ/shuffled-hash on url
    a = {(r.subject, r.predicate, r.object) for r in small.collect()}
    b = {(r.subject, r.predicate, r.object) for r in huge.collect()}
    assert a == b and len(a) == 7  # 2 decls + 2 urls + 3 mentions


def test_token_idf_precomputed_count_is_value_identical(spark):
    # n_pages from a stage counter must reproduce the count() fallback
    # exactly (the pipeline passes the extract-manifest row count so the
    # linking plan adds no extra full-corpus pass)
    from mhdb_tables2turtles_spark.web.linking import token_idf

    pages = spark.createDataFrame(
        [("u1", "alpha beta"), ("u2", "beta gamma"), ("u3", "gamma gamma")],
        ["url", "text"],
    )
    counted = {r.token: r.idf for r in token_idf(pages).collect()}
    passed = {r.token: r.idf for r in token_idf(pages, n_pages=3).collect()}
    assert counted == passed


# ------------------------------------------------------------ link graph


def test_extract_links_quote_variants_and_entities():
    from mhdb_tables2turtles_spark.web.extract import extract_links

    html = (
        b'<p><a href="https://a.example/x?u=1&amp;v=2">x</a>'
        b"<a href='/rel'>r</a>"
        b"<A HREF=bare>b</A>"
        b'<a class="z" href="">empty</a>'
        b"<a name=anchor-only>no href</a></p>"
    )
    assert extract_links(html) == [
        "https://a.example/x?u=1&v=2",
        "/rel",
        "bare",
    ]
    assert extract_links(None) is None
    assert extract_links(b"<p>no anchors</p>") == []


def test_page_links_resolution_and_scheme_filter(spark):
    from mhdb_tables2turtles_spark.web.linkgraph import page_links

    pages = spark.createDataFrame(
        [
            (
                "https://h1.example/a/b",
                b'<a href="/root">r</a><a href="sib">s</a>'
                b'<a href="https://h2.example/z">abs</a>'
                b'<a href="mailto:x@y">m</a><a href="javascript:void(0)">j</a>',
            ),
            ("https://h3.example/", None),
        ],
        "url string, html binary",
    )
    got = {(r.url, r.link) for r in page_links(pages).collect()}
    assert got == {
        ("https://h1.example/a/b", "https://h1.example/root"),
        ("https://h1.example/a/b", "https://h1.example/a/sib"),
        ("https://h1.example/a/b", "https://h2.example/z"),
    }


def test_host_edges_drops_self_loops_and_counts(spark):
    from mhdb_tables2turtles_spark.web.linkgraph import host_edges

    mk = lambda *links: ("".join(
        f'<a href="{l}">l</a>' for l in links
    )).encode()
    pages = spark.createDataFrame(
        [
            ("https://a.example/1", mk("https://b.example/x",
                                       "https://b.example/y",
                                       "https://a.example/self")),
            ("https://a.example/2", mk("https://c.example/")),
        ],
        "url string, html binary",
    )
    got = {(r.src_host, r.dst_host): r.n_links for r in host_edges(pages).collect()}
    assert got == {("a.example", "b.example"): 2, ("a.example", "c.example"): 1}


def test_synth_links_deterministic_across_parallelism(spark):
    from mhdb_tables2turtles_spark.web.linkgraph import host_edges
    from mhdb_tables2turtles_spark.web.pages import synthesize_pages

    def run(parts):
        pages = synthesize_pages(
            spark, 300, seed=9, partitions=parts, with_links=True
        )
        return {
            (r.src_host, r.dst_host): r.n_links
            for r in host_edges(pages).collect()
        }

    e2, e8 = run(2), run(8)
    assert e2 == e8 and len(e2) > 10


def test_host_pagerank_directed_hub_skew(spark):
    from mhdb_tables2turtles_spark.web.linkgraph import host_pagerank
    from mhdb_tables2turtles_spark.web.pages import synthesize_pages, _N_HOSTS

    pages = synthesize_pages(spark, 300, seed=9, with_links=True)
    pr = {r.node: r.pr for r in host_pagerank(pages, iterations=4).collect()}
    assert len(pr) == _N_HOSTS
    # min-of-two target sampling makes low-id hosts authority hubs
    low = sum(pr[h] for h in pr if int(h[4:6]) < 5)
    high = sum(pr[h] for h in pr if int(h[4:6]) >= 32)
    assert low > high


def test_pagerank_directed_no_inlink_node_keeps_base(spark):
    from mhdb_tables2turtles_spark.web.graphrank import (
        SCALE,
        pagerank_directed,
    )

    edges = spark.createDataFrame(
        [("s", "t"), ("u", "t")], ["src", "dst"]
    )
    pr = {r.node: r.pr for r in pagerank_directed(edges, iterations=3).collect()}
    base = (15 * SCALE) // 100
    # sources have no inlinks -> exactly base; sink accumulates both
    assert pr["s"] == base and pr["u"] == base
    assert pr["t"] > base and set(pr) == {"s", "t", "u"}


# --------------------------------------------------- incremental update


def _unambiguous(pipe, spark):
    """Restrict the pipeline's dictionary to surfaces with exactly one
    entity: linking short-circuits the TF-IDF scorer, making triples a
    corpus-independent function of each page — the precondition for
    exact incremental-vs-full-rebuild equality (see update()'s
    docstring for why ambiguous surfaces may legitimately diverge)."""
    import pandas as pd

    vf = pipe.vocab.toPandas()
    keep = vf.groupby("surface")["entity_iri"].transform("nunique") == 1
    vf = vf[keep]
    pipe.vocab = spark.createDataFrame(vf)
    pipe.surfaces = tuple(sorted(set(vf["surface"])))
    return pipe


def test_update_equals_full_rebuild(spark, tmp_path):
    """run(A) + update(B) must equal run(A ∪ B) triple-for-triple,
    including the incremental canonicalization (disjoint equivalence
    batches E1 at base, E2 at update, vs E1 ∪ E2 from scratch)."""
    full_corpus = build_corpus(spark, n_pages=48, seed=7, partitions=4)
    half = F.col("url").substr(-1, 1).isin(*"01234")
    pages_a, pages_b = full_corpus.filter(half), full_corpus.filter(~half)

    pipe = _unambiguous(KGPipeline(spark, str(tmp_path / "kg_inc")), spark)
    iris = [r.entity_iri for r in pipe.vocab.limit(3).collect()]
    e1 = spark.createDataFrame([(iris[0], iris[1])], ["src", "dst"])
    e2 = spark.createDataFrame([(iris[1], iris[2])], ["src", "dst"])

    pipe.run(pages_a, extra_equiv_edges=e1, include_ontology=True)
    out = pipe.update(pages_b, "crawl_b", extra_equiv_edges=e2)

    fresh = _unambiguous(
        KGPipeline(spark, str(tmp_path / "kg_full")), spark
    ).run(
        full_corpus,
        extra_equiv_edges=e1.unionAll(e2),
        include_ontology=True,
    )
    got = {
        (r.subject, r.predicate, r.object) for r in out["canonical"].collect()
    }
    want = {
        (r.subject, r.predicate, r.object)
        for r in fresh["canonical"].collect()
    }
    assert got == want and len(got) > 0


def test_update_resumes_and_is_idempotent(spark, tmp_path):
    wd = str(tmp_path / "kg_inc2")
    corpus = build_corpus(spark, n_pages=30, seed=3, partitions=2)
    a = corpus.limit(20)
    b = corpus.subtract(a)

    pipe = KGPipeline(spark, wd)
    pipe.run(a, include_ontology=True)
    first = pipe.update(b, "b1")
    n1 = first["canonical"].count()

    # re-applying the same batch: every stage resumes, nothing recomputes,
    # identical output (the incremental_stage lineage marks b1 done)
    pipe2 = KGPipeline(spark, wd)
    again = pipe2.update(b, "b1")
    logs = pipe2.staged.log
    assert not any(s.startswith("compute:") for s in logs), logs
    assert again["canonical"].count() == n1
    assert pipe2._epochs() == ["b1"]


def test_update_requires_base_run(spark, tmp_path):
    import pytest as _pytest

    pipe = KGPipeline(spark, str(tmp_path / "kg_inc3"))
    pages = build_corpus(spark, n_pages=5, seed=1, partitions=1)
    with _pytest.raises(RuntimeError, match="run\\(\\) the base crawl"):
        pipe.update(pages, "x")


def test_canonical_asof_time_travel(spark, tmp_path):
    corpus = build_corpus(spark, n_pages=24, seed=5, partitions=2)
    third = F.col("url").substr(-1, 1)
    a = corpus.filter(third.isin(*"0123"))
    b = corpus.filter(third.isin(*"456"))
    c = corpus.filter(third.isin(*"789"))

    pipe = KGPipeline(spark, str(tmp_path / "kg_tt"))
    base = pipe.run(a)["canonical"].count()
    n1 = pipe.update(b, "e1")["canonical"].count()
    n2 = pipe.update(c, "e2")["canonical"].count()

    assert pipe.canonical_asof().count() == base
    assert pipe.canonical_asof("e1").count() == n1
    assert pipe.canonical_asof("e2").count() == n2
    assert base < n1 < n2
    import pytest as _pytest

    with _pytest.raises(KeyError):
        pipe.canonical_asof("nope")
