"""Aho-Corasick multi-pattern matcher (pure Python, dependency-free).

Generalizes the reference's exact-label matching (labels and aliases
resolved by equality against dimension sheets,
/root/reference/mhdb/ingest.py:2841-2847, :445-446) to streaming text:
one pass over a page finds every vocabulary term.

Execution model: the term list rides to executors once (Spark broadcast);
the automaton is built lazily per worker and memoized by a content
fingerprint, so a 1000-executor cluster builds it 1000 times total, not
once per batch or per row.  Matching itself runs inside Arrow-batched
``mapInPandas`` (see :mod:`mentions`).
"""

from __future__ import annotations

from collections import deque

__all__ = ["AhoCorasick", "automaton_for"]

_WORD_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)


class AhoCorasick:
    """Classic Aho-Corasick with BFS-built failure links.

    ``find(text)`` yields ``(start, end, term_index)`` for every
    occurrence of every pattern; ``find_words`` filters to matches on
    word boundaries (the semantics the reference's exact-cell equality
    implies: a label matches a whole token, not a substring).
    """

    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        # node storage: list of dict[char -> node], parallel arrays
        self.goto: list[dict] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]
        for idx, pat in enumerate(self.patterns):
            self._insert(pat, idx)
        self._build_links()

    def _insert(self, pat: str, idx: int) -> None:
        node = 0
        for ch in pat:
            nxt = self.goto[node].get(ch)
            if nxt is None:
                nxt = len(self.goto)
                self.goto[node][ch] = nxt
                self.goto.append({})
                self.fail.append(0)
                self.out.append([])
            node = nxt
        self.out[node].append(idx)

    def _build_links(self) -> None:
        q: deque[int] = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                if self.fail[child] == child:
                    self.fail[child] = 0
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def find(self, text: str):
        node = 0
        goto, fail, out = self.goto, self.fail, self.out
        for pos, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for idx in out[node]:
                    start = pos - len(self.patterns[idx]) + 1
                    yield start, pos + 1, idx

    def find_words(self, text: str):
        """Matches whose ends touch non-word characters (or text edges)."""
        n = len(text)
        for start, end, idx in self.find(text):
            if start > 0 and text[start - 1] in _WORD_CHARS:
                continue
            if end < n and text[end] in _WORD_CHARS:
                continue
            yield start, end, idx


_CACHE: dict[tuple, AhoCorasick] = {}


def automaton_for(patterns: tuple[str, ...]) -> AhoCorasick:
    """Per-worker memoized automaton (key: the pattern tuple itself —
    broadcast lists are small; the automaton is the expensive part)."""
    auto = _CACHE.get(patterns)
    if auto is None:
        auto = _CACHE[patterns] = AhoCorasick(list(patterns))
        if len(_CACHE) > 4:  # keep the cache bounded on long-lived workers
            for k in list(_CACHE)[:-2]:
                del _CACHE[k]
    return auto
