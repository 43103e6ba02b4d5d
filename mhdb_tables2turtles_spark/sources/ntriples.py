"""N-Triples SOURCE connector — the ingestion inverse of
``operators/serialize.py::write_ntriples``.

Why a KG-construction engine needs this: the web's big public graphs
ship as N-Triples/N-Quads dumps (Wikidata, DBpedia, WDC's Common-Crawl
microdata extractions), and bootstrapping or enriching a pipeline means
LOADING those dumps into the engine's triple-table representation.
N-Triples is the one RDF syntax that bulk-loads well at 100 TB: every
line is a self-contained triple — no header, no prefix state, no
multi-line constructs — so ``spark.read.text`` splits a dump into
line-aligned partitions and every partition parses independently.
(Turtle, by contrast, is document-stateful: its PREFIX block makes
naive splitting incorrect, which is why the Turtle path goes through
``operators/validate.py``'s full parser per document.)

Plan shape: text scan → one Arrow-batched ``mapInPandas`` parse →
``(subject, predicate, object)`` rows.  Zero shuffles, zero driver
state; malformed lines fail LOUDLY with line text in the error (a bulk
load that silently drops triples is corruption, not resilience) unless
the caller opts into ``on_error='skip'`` for crawl-grade dirty input.

Terms are stored in the engine's internal shapes (the same ones
``to_nt_term`` serializes FROM): prefixed names where the prefix map
covers the namespace (longest-namespace match), ``a`` for rdf:type in
predicate position, ``<absolute-iri>`` otherwise, and literals in
short Turtle form with ECHAR-escaped controls — so
``read_ntriples(write_ntriples(df)) == df`` for graphs in canonical
stored form (long literals normalize to the escaped short form; tests
pin the round trip).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_nt_line", "compact_iri", "read_ntriples"]

_IRI = r"<([^<>\"{}|^`\\\x00-\x20]*)>"
_BNODE = r"(_:[A-Za-z0-9](?:[A-Za-z0-9._-]*[A-Za-z0-9_-])?)"
_LIT = (
    r'"((?:[^"\\\n\r]|\\.)*)"'
    r"(?:@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)|\^\^" + _IRI + r")?"
)
_LINE_RE = re.compile(
    r"^[ \t]*"
    rf"(?:{_IRI}|{_BNODE})[ \t]+"
    rf"{_IRI}[ \t]+"
    rf"(?:{_IRI}|{_BNODE}|{_LIT})[ \t]*"
    r"\.[ \t]*(?:#.*)?$"
)
_BLANK_RE = re.compile(r"^[ \t]*(?:#.*)?$")

_UNESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|([tbnrf\"'\\]))"
)
_ECHAR_DECODE = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
# stored-literal escaping: the engine's short Turtle form keeps controls
# escaped (ECHAR), so a parsed lexical re-escapes before storage
_STORE_ESCAPES = (
    ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"),
    ("\t", "\\t"), ("\b", "\\b"), ("\f", "\\f"),
)


def _unescape(lexical: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        ch = m.group(3)
        if ch not in _ECHAR_DECODE:
            raise ValueError(f"bad escape \\{ch}")
        return _ECHAR_DECODE[ch]

    return _UNESCAPE_RE.sub(sub, lexical)


def compact_iri(iri: str, namespaces: list[tuple[str, str]]) -> str:
    """Absolute IRI → the engine's stored term: ``prefix:local`` under
    the LONGEST matching namespace (with a local part free of ``/ #``,
    so the pname round-trips through ``_expand_pname``), else
    ``<iri>``.  ``namespaces`` is (namespace, prefix) pairs sorted
    longest-namespace first."""
    for ns, prefix in namespaces:
        if iri.startswith(ns):
            local = iri[len(ns):]
            if local and not re.search(r"[/#<>\s]", local):
                return f"{prefix}:{local}"
    return f"<{iri}>"


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def parse_nt_line(
    line: str, namespaces: list[tuple[str, str]], compact: bool = True
) -> tuple[str, str, str] | None:
    """One N-Triples line → ``(subject, predicate, object)`` in stored
    term shapes, or ``None`` for blank/comment lines.  Raises
    ``ValueError`` with the offending text on malformed input."""
    if _BLANK_RE.match(line):
        return None
    m = _LINE_RE.match(line)
    if not m:
        raise ValueError(f"malformed N-Triples line: {line!r}")
    (s_iri, s_bn, p_iri, o_iri, o_bn, o_lex, o_lang, o_dt) = m.groups()

    def term_iri(iri: str) -> str:
        return compact_iri(iri, namespaces) if compact else f"<{iri}>"

    subject = s_bn if s_bn is not None else term_iri(s_iri)
    if compact and p_iri == _RDF_TYPE:
        predicate = "a"
    else:
        predicate = term_iri(p_iri)
    if o_lex is not None:
        lex = _unescape(o_lex)
        for raw, esc in _STORE_ESCAPES:
            lex = lex.replace(raw, esc)
        obj = f'"{lex}"'
        if o_lang:
            obj += f"@{o_lang}"
        elif o_dt:
            obj += f"^^{term_iri(o_dt)}"
    elif o_bn is not None:
        obj = o_bn
    else:
        obj = term_iri(o_iri)
    return subject, predicate, obj


def read_ntriples(
    spark: SparkSession,
    path: str,
    base_uri: str,
    prefixes=None,
    compact: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Load N-Triples part-files into a ``(subject, predicate, object)``
    DataFrame — ``spark.read.text`` (line-splittable at any scale) plus
    one Arrow-batched parse pass; no shuffle anywhere.

    ``prefixes`` / ``base_uri`` mirror :func:`write_ntriples`'s
    signature so a sink's exact configuration reads its output back.
    ``on_error='skip'`` tolerates malformed lines (dirty crawl dumps);
    the default raises with the line text.
    """
    from mhdb_tables2turtles_spark.operators.serialize import FIXED_PREFIXES

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    pmap = dict(FIXED_PREFIXES)
    if prefixes:
        pmap.update(dict(prefixes))
    pmap[""] = base_uri + "#"
    namespaces = sorted(
        ((ns, prefix) for prefix, ns in pmap.items()),
        key=lambda t: len(t[0]),
        reverse=True,
    )
    skip = on_error == "skip"

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                try:
                    t = parse_nt_line(line, namespaces, compact=compact)
                except ValueError:
                    if skip:
                        continue
                    raise
                if t is not None:
                    rows.append(t)
            yield pd.DataFrame(
                rows, columns=["subject", "predicate", "object"]
            )

    return spark.read.text(path).mapInPandas(
        parse, "subject string, predicate string, object string"
    )
