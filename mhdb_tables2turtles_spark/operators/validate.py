"""Strict Turtle grammar validation of emitted documents.

The reference validates its output with an external Turtle parser
(/root/reference/validate_turtle_files.sh:12-24 runs the ``ttl`` CLI over
every generated file).  The sandbox ships no Turtle library, so this
module is the stand-in: an independent recursive-descent parser for the
W3C Turtle 1.1 grammar (https://www.w3.org/TR/turtle/#sec-grammar) —
deliberately a *different* implementation from the lenient line-oriented
reader in ``sources/golden.py`` (which exists to extract triples from the
reference's files, and would round-trip malformed escapes undetected).

Covers the grammar productions the engine (and the reference) emit, and
validates them strictly:

* ``@prefix`` / ``@base`` and SPARQL-style ``PREFIX`` / ``BASE``
  directives (the reference emits SPARQL-style, create_mhdb:390-396);
* subject blocks with ``;`` predicate lists and ``,`` object lists;
* IRIREF character restrictions (no spaces/control/``<>"{}|^\\```);
* prefixed names per PN_PREFIX/PN_LOCAL incl. ``%XX`` and ``\\-escapes``,
  with the declared-prefix check (a PNAME whose prefix has no PREFIX
  directive is an error, exactly like real parsers);
* short/long string literals with ECHAR/UCHAR escape validation,
  language tags, ``^^`` datatypes;
* numeric/boolean literals, ``a``, blank nodes, collections, comments.

Validation is driver-side over rendered documents (header + body
shards); at 100 TB scale the same checker runs per-shard inside
``mapPartitions`` since every shard is a self-contained block sequence.
"""

from __future__ import annotations

import re

__all__ = [
    "TurtleSyntaxError",
    "parse_turtle",
    "validate_turtle",
    "validate_ttl_dir",
]


class TurtleSyntaxError(ValueError):
    def __init__(self, msg: str, line: int, col: int):
        super().__init__(f"line {line}:{col}: {msg}")
        self.line = line
        self.col = col


# --- terminal productions (Turtle 1.1 spec EBNF, ASCII + astral ranges) ---

_PN_CHARS_BASE = (
    "A-Za-z"
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D\u037F-\u1FFF"
    "\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF\uF900-\uFDCF"
    "\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = _PN_CHARS_U + r"0-9\-\u00B7\u0300-\u036F\u203F-\u2040"

_PN_PREFIX = rf"[{_PN_CHARS_BASE}](?:[{_PN_CHARS}.]*[{_PN_CHARS}])?"
_PLX = r"%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%]"
_PN_LOCAL = (
    rf"(?:[{_PN_CHARS_U}:0-9]|{_PLX})"
    rf"(?:(?:[{_PN_CHARS}.:]|{_PLX})*(?:[{_PN_CHARS}:]|{_PLX}))?"
)
_PNAME_NS = rf"(?:{_PN_PREFIX})?:"
_PNAME = rf"({_PNAME_NS})(?:{_PN_LOCAL})?"

_IRIREF = r'<(?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>'
_LANGTAG = r"@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*"
_ECHAR = r'\\[tbnrf"\'\\]'
_UCHAR = r"\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}"
_STRING_Q = rf'"(?:[^"\\\n\r]|{_ECHAR}|{_UCHAR})*"'
_STRING_SQ = rf"'(?:[^'\\\n\r]|{_ECHAR}|{_UCHAR})*'"
_STRING_LQ = rf'"""(?:(?:"|"")?(?:[^"\\]|{_ECHAR}|{_UCHAR}))*"""'
_STRING_LSQ = rf"'''(?:(?:'|'')?(?:[^'\\]|{_ECHAR}|{_UCHAR}))*'''"
# W3C INTEGER | DECIMAL | DOUBLE: DECIMAL requires digits AFTER the dot,
# so `1 .` terminating a statement never lexes the dot into the number
_NUMBER = (
    r"[+-]?(?:[0-9]+\.[0-9]*[eE][+-]?[0-9]+|\.[0-9]+[eE][+-]?[0-9]+"
    r"|[0-9]*\.[0-9]+|[0-9]+(?:[eE][+-]?[0-9]+)?)"
)
_BLANK = rf"_:[{_PN_CHARS_U}0-9](?:[{_PN_CHARS}.]*[{_PN_CHARS}])?"

_TOKEN = re.compile(
    "|".join(
        f"(?P<{name}>{pat})"
        for name, pat in (
            # order matters: longest/most-specific first
            ("COMMENT", r"#[^\n]*"),
            ("LONGSTR", f"(?:{_STRING_LQ})|(?:{_STRING_LSQ})"),
            ("STRING", f"(?:{_STRING_Q})|(?:{_STRING_SQ})"),
            ("IRIREF", _IRIREF),
            # negative lookahead, not \b: a LANGTAG may continue with
            # '-' (e.g. "x"@base-x is a valid tag, not a directive).
            # Exactly '@prefix'/'@base' lex as directives even after a
            # string — the W3C Turtle grammar notes sanction this
            # (neither is a registered language subtag; directives win).
            ("PREFIX_DIR", r"@prefix(?![A-Za-z0-9-])|PREFIX\b"),
            ("BASE_DIR", r"@base(?![A-Za-z0-9-])|BASE\b"),
            ("BLANK", _BLANK),
            # PNAME before BOOL/A_KW: `true:x` / `a:x` are prefixed names
            ("PNAME", _PNAME),
            ("BOOL", r"(?:true|false)\b"),
            ("A_KW", r"a(?![\w:])"),
            ("NUMBER", _NUMBER),
            ("LANGTAG", _LANGTAG),
            ("DTYPE", r"\^\^"),
            ("ANON", r"\[[ \t]*\]"),
            ("PUNCT", r"[.;,\[\]()]"),
            ("WS", r"[ \t\r\n]+"),
        )
    ),
    re.DOTALL,
)


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.tokens: list[tuple[str, str, int]] = []
        self._lex()

    def _lex(self) -> None:
        n = len(self.text)
        while self.pos < n:
            m = _TOKEN.match(self.text, self.pos)
            if m is None:
                line, col = _linecol(self.text, self.pos)
                snippet = self.text[self.pos : self.pos + 20]
                raise TurtleSyntaxError(
                    f"unrecognized input {snippet!r}", line, col
                )
            kind = m.lastgroup
            if kind not in ("WS", "COMMENT"):
                self.tokens.append((kind, m.group(), m.start()))
            self.pos = m.end()


def _linecol(text: str, pos: int) -> tuple[int, int]:
    line = text.count("\n", 0, pos) + 1
    col = pos - (text.rfind("\n", 0, pos) + 1) + 1
    return line, col


class _Parser:
    """turtleDoc ::= statement*  (recursive descent over the token list).

    With ``collect=True`` the parse also materializes the triples as
    surface-form ``(subject, predicate, object)`` term strings — the
    same convention the engine's triple tables and golden oracles use
    (prefixed names as written, literals with their quotes/langtag/
    datatype verbatim, ``a`` kept as ``a``).  Anonymous/nested blank
    nodes mint deterministic per-document ``_:genN`` labels; RDF
    collections are validated but refuse to collect (their rdf:first/
    rest expansion would invent terms under a prefix the document may
    not declare)."""

    def __init__(
        self, text: str, collect: bool = False, bnode_prefix: str = ""
    ):
        self.text = text
        self.toks = _Lexer(text).tokens
        self.i = 0
        self.prefixes: set[str] = set()
        self.collect = collect
        self.triples: list[tuple[str, str, str]] = []
        self._bnode_n = 0
        # distinguishes parser-MINTED anonymous labels from source
        # labels when several parses contribute to one logical document
        # (sources/turtle.py document scope): minted labels are
        # per-parse counters and must not collide across fragments
        self._bnode_prefix = bnode_prefix

    def _new_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:{self._bnode_prefix}gen{self._bnode_n}"

    # -- token helpers --
    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            line, col = _linecol(self.text, len(self.text))
            raise TurtleSyntaxError("unexpected end of document", line, col)
        self.i += 1
        return t

    def _err(self, msg: str, tok) -> TurtleSyntaxError:
        pos = tok[2] if tok else len(self.text)
        line, col = _linecol(self.text, pos)
        return TurtleSyntaxError(msg, line, col)

    def _expect_punct(self, ch: str):
        t = self._next()
        if t[0] != "PUNCT" or t[1] != ch:
            raise self._err(f"expected {ch!r}, got {t[1]!r}", t)

    # -- grammar --
    def parse(self) -> int:
        n_triples = 0
        while self._peek() is not None:
            t = self._peek()
            if t[0] == "PREFIX_DIR":
                self._prefix_directive()
            elif t[0] == "BASE_DIR":
                self._base_directive()
            else:
                n_triples += self._triples()
        return n_triples

    def _prefix_directive(self) -> None:
        d = self._next()
        ns = self._next()
        if ns[0] != "PNAME" or not ns[1].endswith(":") or ":" in ns[1][:-1]:
            raise self._err("expected PNAME_NS after PREFIX", ns)
        iri = self._next()
        if iri[0] != "IRIREF":
            raise self._err("expected IRIREF in PREFIX directive", iri)
        self.prefixes.add(ns[1][:-1])
        if d[1] == "@prefix":  # Turtle-style directive needs the dot
            self._expect_punct(".")

    def _base_directive(self) -> None:
        d = self._next()
        iri = self._next()
        if iri[0] != "IRIREF":
            raise self._err("expected IRIREF in BASE directive", iri)
        if d[1] == "@base":
            self._expect_punct(".")

    def _triples(self) -> int:
        subj = self._subject()
        n = self._predicate_object_list(subj)
        self._expect_punct(".")
        return n

    def _subject(self) -> str:
        t = self._next()
        if t[0] in ("IRIREF", "BLANK"):
            return t[1]
        if t[0] == "ANON":
            return self._new_bnode()
        if t[0] == "PNAME":
            self._check_pname(t)
            return t[1]
        if t[0] == "PUNCT" and t[1] == "(":
            self._collection_rest()
            return self._no_collect("collection subject")
        raise self._err(f"invalid subject {t[1]!r}", t)

    def _predicate_object_list(self, subj: str) -> int:
        n = self._verb_objects(subj)
        while True:
            t = self._peek()
            if t is None or t[0] != "PUNCT" or t[1] != ";":
                return n
            self._next()  # ';'
            t = self._peek()
            # trailing ';' before '.' is legal
            if t is None or (t[0] == "PUNCT" and t[1] in ".]"):
                return n
            n += self._verb_objects(subj)

    def _verb_objects(self, subj: str) -> int:
        t = self._next()
        if t[0] == "PNAME":
            self._check_pname(t)
        elif t[0] not in ("IRIREF", "A_KW"):
            raise self._err(f"invalid predicate {t[1]!r}", t)
        verb = t[1]
        n = 1
        self._emit(subj, verb, self._object())
        while True:
            p = self._peek()
            if p is None or p[0] != "PUNCT" or p[1] != ",":
                return n
            self._next()
            self._emit(subj, verb, self._object())
            n += 1

    def _emit(self, subj: str, verb: str, obj: str) -> None:
        if self.collect:
            self.triples.append((subj, verb, obj))

    def _no_collect(self, what: str) -> str:
        if self.collect:
            raise ValueError(
                f"parse_turtle does not collect RDF {what}s (their "
                "rdf:first/rest expansion mints terms under a prefix "
                "the document may not declare); validation-only parse "
                "accepts them"
            )
        return "()"

    def _object(self) -> str:
        t = self._next()
        if t[0] in ("IRIREF", "BLANK", "NUMBER", "BOOL"):
            return t[1]
        if t[0] == "ANON":
            return self._new_bnode()
        if t[0] == "PNAME":
            self._check_pname(t)
            return t[1]
        if t[0] in ("STRING", "LONGSTR"):
            surface = t[1]
            p = self._peek()
            if p is not None and p[0] == "LANGTAG":
                surface += self._next()[1]
            elif p is not None and p[0] == "DTYPE":
                self._next()
                dt = self._next()
                if dt[0] == "PNAME":
                    self._check_pname(dt)
                elif dt[0] != "IRIREF":
                    raise self._err("expected datatype IRI after ^^", dt)
                surface += "^^" + dt[1]
            return surface
        if t[0] == "PUNCT" and t[1] == "(":
            self._collection_rest()
            return self._no_collect("collection")
        if t[0] == "PUNCT" and t[1] == "[":
            bnode = self._new_bnode()
            self._predicate_object_list(bnode)
            self._expect_punct("]")
            return bnode
        raise self._err(f"invalid object {t[1]!r}", t)

    def _collection_rest(self) -> None:
        while True:
            t = self._peek()
            if t is None:
                raise self._err("unterminated collection", None)
            if t[0] == "PUNCT" and t[1] == ")":
                self._next()
                return
            self._object()

    def _check_pname(self, t) -> None:
        prefix = t[1].split(":", 1)[0]
        if prefix not in self.prefixes:
            raise self._err(f"undeclared prefix {prefix + ':'!r}", t)


def validate_turtle(
    text: str, extra_prefixes: tuple[str, ...] = ()
) -> int:
    """Parse ``text`` as a turtleDoc; return the number of
    predicate-object pairs, raise :class:`TurtleSyntaxError` on the first
    grammar violation.

    ``extra_prefixes`` pre-declares prefixes for validating body shards
    in isolation (their PREFIX directives live in the shared header).
    """
    p = _Parser(text)
    p.prefixes.update(extra_prefixes)
    return p.parse()


def parse_turtle(
    text: str,
    extra_prefixes: tuple[str, ...] = (),
    bnode_prefix: str = "",
) -> "list[tuple[str, str, str]]":
    """Parse ``text`` as a turtleDoc and return its triples as
    surface-form ``(subject, predicate, object)`` term strings — the
    grammar-exact counterpart of the layout-specific oracle parser
    ``sources/golden.py::parse_turtle_body``, and the kernel of the
    distributed Turtle source (sources/turtle.py).  Same strictness as
    :func:`validate_turtle`: any grammar violation raises
    :class:`TurtleSyntaxError`.  ``bnode_prefix`` uniquifies the
    parser-minted anonymous-node labels when several parses contribute
    to one logical document (see sources/turtle.py document scope)."""
    p = _Parser(text, collect=True, bnode_prefix=bnode_prefix)
    p.prefixes.update(extra_prefixes)
    p.parse()
    return p.triples


def validate_ttl_dir(ttl_dir: str) -> int:
    """Validate a sharded Turtle output directory (``header.ttl`` +
    ``part-*`` body shards).  Returns total predicate-object pairs.

    The header is parsed once and its declared prefixes carried into
    each shard via ``extra_prefixes``, so every shard validates in
    ISOLATION — driver memory is O(largest shard), not O(total output)
    (round-3 advice: the concatenate-everything form OOMs the driver on
    large outputs even though shards are self-contained by
    construction).  Equivalent to concatenated validation because body
    shards carry no PREFIX directives of their own — the renderer puts
    them all in the header."""
    import glob
    import os

    parts = sorted(glob.glob(os.path.join(ttl_dir, "part-*")))
    header = os.path.join(ttl_dir, "header.ttl")
    total = 0
    prefixes: tuple[str, ...] = ()
    if os.path.exists(header):
        with open(header, encoding="utf-8") as f:
            p = _Parser(f.read())
        total += p.parse()
        prefixes = tuple(p.prefixes)
    for part in parts:
        with open(part, encoding="utf-8") as f:
            total += validate_turtle(f.read(), extra_prefixes=prefixes)
    return total
