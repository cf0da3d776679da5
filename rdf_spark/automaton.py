"""Aho-Corasick multi-pattern string matching (pure Python, no deps).

The scalable engine behind :func:`rdf_spark.extraction.detect_mentions`
for large gazetteers: a single alternation regex is O(|alternatives|)
per scan position and its compiled form grows with the dictionary, so at
real entity-linking scale (10^5-10^7 surfaces) it stops working.  The
classic Aho-Corasick automaton (Aho & Corasick, CACM 1975) matches ALL
dictionary occurrences in one O(|text|) pass independent of dictionary
size; the extra :meth:`AhoCorasick.count_nonoverlapping` pass reduces
the all-occurrence stream to the exact semantics of a longest-first
non-overlapping alternation regex (leftmost scan; at each position the
longest matching surface wins; scanning resumes after the match), so
the two detect_mentions engines are interchangeable bit-for-bit.

Pure Python per-character matching is the honest trade-off in this
container (pyahocorasick is not installed and installs are disallowed):
it removes the dictionary-size wall, not the per-character constant.
The automaton is built once on the driver and shipped to executors in
the mapInPandas closure — build cost is O(total pattern length).
"""

from __future__ import annotations


class AhoCorasick:
    """Dictionary automaton over unicode characters.

    >>> ac = AhoCorasick(["ab", "bc", "abc"])
    >>> ac.count_nonoverlapping("xabcx")
    {'abc': 1}
    >>> sorted(ac.iter_matches("xabcx"))
    [(1, 'ab'), (1, 'abc'), (2, 'bc')]
    """

    def __init__(self, patterns: list[str]):
        patterns = [p for p in patterns if p]
        # trie: goto[state] is {char: next_state}
        goto: list[dict[str, int]] = [{}]
        out: list[list[str]] = [[]]
        for pat in patterns:
            state = 0
            for ch in pat:
                nxt = goto[state].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[state][ch] = nxt
                state = nxt
            out[state].append(pat)
        # failure links by BFS; output sets merged along failures
        fail = [0] * len(goto)
        queue: list[int] = []
        for st in goto[0].values():
            queue.append(st)
        qi = 0
        while qi < len(queue):
            state = queue[qi]
            qi += 1
            for ch, nxt in goto[state].items():
                queue.append(nxt)
                f = fail[state]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[nxt] = goto[f].get(ch, 0)
                if fail[nxt] == nxt:  # root self-transition guard
                    fail[nxt] = 0
                out[nxt] = out[nxt] + out[fail[nxt]]
        self._goto = goto
        self._fail = fail
        self._out = out

    def iter_matches(self, text: str):
        """Yield (start, pattern) for EVERY dictionary occurrence,
        including overlapping and nested ones."""
        goto, fail, out = self._goto, self._fail, self._out
        state = 0
        for i, ch in enumerate(text):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                for pat in out[state]:
                    yield (i - len(pat) + 1, pat)

    def count_nonoverlapping(self, text: str) -> dict[str, int]:
        """Per-pattern counts under longest-first non-overlapping
        alternation semantics: scan left to right, at each position the
        longest matching pattern wins, resume after the match — exactly
        what ``re.compile("(longest|...|shortest)").findall`` produces."""
        matches = sorted(
            self.iter_matches(text), key=lambda m: (m[0], -len(m[1]))
        )
        counts: dict[str, int] = {}
        last_end = 0
        for start, pat in matches:
            if start >= last_end:
                counts[pat] = counts.get(pat, 0) + 1
                last_end = start + len(pat)
        return counts
