"""RDFC-1.0 blank-node canonicalization and graph digests.

The reference engine (rdf.go:14-22) stops at parsing/serializing; a KG
platform also needs ISOMORPHISM-stable identity: two parses of the same
page must hash identically even though each minted different blank-node
labels.  This module implements the W3C RDF Dataset Canonicalization
algorithm (RDFC-1.0, https://www.w3.org/TR/rdf-canon/ — the finished
URDNA2015) per document graph, giving

* deterministic ``_:c14nN`` labels independent of parser label order,
* a per-document canonical N-Quads serialization, and
* a SHA-256 graph digest — content-addressed graph dedup across crawls.

Spark shape: canonicalization is a per-GRAPH algorithm with no
cross-document state, so it distributes as one groupBy(doc) shuffle and
an ``applyInPandas`` stage running the pure-Python algorithm on each
(small) document graph — the same per-doc-scope pattern as the parsers.
Pathological graphs (large blank-node automorphism orbits, the known
"poison" inputs) are bounded by a recursion budget and raise
:class:`CanonicalizationError` instead of burning a worker; real web
graphs never get near it.
"""

from __future__ import annotations

import hashlib
from itertools import permutations
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from rdf_spark.terms import KIND_BLANK, term_nt

__all__ = [
    "CanonicalizationError",
    "canonical_labels",
    "canonical_nquads",
    "canonicalize_blank_nodes",
    "graph_digest",
]

_MAX_NDEGREE_CALLS = 4000


class CanonicalizationError(ValueError):
    """Raised when a graph exceeds the canonicalization work budget."""


class _Issuer:
    """RDFC-1.0 §4.5 identifier issuer (insertion-ordered)."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.issued: dict[str, str] = {}

    def issue(self, node: str) -> str:
        got = self.issued.get(node)
        if got is None:
            got = f"{self.prefix}{len(self.issued)}"
            self.issued[node] = got
        return got

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.issued = dict(self.issued)
        return c


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _quad_line(t: Sequence, subst: dict[str, str]) -> str:
    """Canonical N-Quads line with blank labels substituted (spec
    hash-first-degree serialization; default graph → triple form)."""
    s, s_kind, p, o, o_kind, o_dt, o_lang = t[:7]
    s_txt = subst.get(s, s) if s_kind == KIND_BLANK else term_nt(s, s_kind)
    if o_kind == KIND_BLANK:
        o_txt = subst.get(o, o)
    else:
        o_txt = term_nt(o, o_kind, o_dt, o_lang)
    return f"{s_txt} <{p}> {o_txt} ."


def canonical_labels(triples: Iterable[Sequence]) -> dict[str, str]:
    """RDFC-1.0 §4.4 canonicalization over one graph's triples
    (7-tuples ``(s, s_kind, p, o, o_kind, o_datatype, o_lang)``; blank
    lexicals carry the ``_:`` prefix) → ``{_:label: _:c14nN}``."""
    triples = sorted({tuple(t[:7]) for t in triples})
    mentions: dict[str, list[tuple]] = {}
    for t in triples:
        if t[1] == KIND_BLANK:
            mentions.setdefault(t[0], []).append(t)
        if t[4] == KIND_BLANK and not (t[1] == KIND_BLANK and t[3] == t[0]):
            mentions.setdefault(t[3], []).append(t)

    def _blank_positions(q) -> list[tuple[str, str]]:
        out = []
        if q[1] == KIND_BLANK:
            out.append((q[0], "s"))
        if q[4] == KIND_BLANK:
            out.append((q[3], "o"))
        return out

    def first_degree(n: str) -> str:
        lines = sorted(
            _quad_line(
                q,
                {
                    lex: ("_:a" if lex == n else "_:z")
                    for lex, _ in _blank_positions(q)
                },
            )
            + "\n"
            for q in mentions[n]
        )
        return _sha256("".join(lines))

    canon = _Issuer("_:c14n")
    budget = [_MAX_NDEGREE_CALLS]

    def hash_related(related: str, quad: tuple, issuer: _Issuer,
                     position: str) -> str:
        inp = position
        if position != "g":
            inp += f"<{quad[2]}>"
        if related in canon.issued:
            ident = canon.issued[related]
        elif related in issuer.issued:
            ident = issuer.issued[related]
        else:
            ident = fdh[related]
        return _sha256(inp + ident)

    def hash_n_degree(node: str, issuer: _Issuer) -> tuple[str, _Issuer]:
        budget[0] -= 1
        if budget[0] < 0:
            raise CanonicalizationError(
                f"canonicalization work budget exceeded "
                f"({_MAX_NDEGREE_CALLS} n-degree calls)"
            )
        hn: dict[str, set[str]] = {}
        for q in mentions[node]:
            for lex, pos in _blank_positions(q):
                if lex != node:
                    hn.setdefault(
                        hash_related(lex, q, issuer, pos), set()
                    ).add(lex)
        data = []
        for rel_hash in sorted(hn):
            data.append(rel_hash)
            chosen_path = ""
            chosen_issuer = issuer
            for perm in permutations(sorted(hn[rel_hash])):
                issuer_copy = issuer.copy()
                path = ""
                recursion: list[str] = []
                skip = False
                for related in perm:
                    if related in canon.issued:
                        path += canon.issued[related]
                    else:
                        if related not in issuer_copy.issued:
                            recursion.append(related)
                        path += issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) \
                            and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                for related in recursion:
                    result_hash, result_issuer = hash_n_degree(
                        related, issuer_copy
                    )
                    path += issuer_copy.issue(related)
                    path += f"<{result_hash}>"
                    issuer_copy = result_issuer
                    if chosen_path and len(path) >= len(chosen_path) \
                            and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data.append(chosen_path)
            issuer = chosen_issuer
        return _sha256("".join(data)), issuer

    fdh = {n: first_degree(n) for n in mentions}
    by_hash: dict[str, list[str]] = {}
    for n, h in fdh.items():
        by_hash.setdefault(h, []).append(n)
    shared = []
    for h in sorted(by_hash):
        nodes = by_hash[h]
        if len(nodes) == 1:
            canon.issue(nodes[0])
        else:
            shared.append(nodes)
    for nodes in shared:
        results = []
        for n in nodes:
            if n in canon.issued:
                continue
            temp = _Issuer("_:b")
            temp.issue(n)
            results.append(hash_n_degree(n, temp))
        for _, result_issuer in sorted(results, key=lambda r: r[0]):
            for n in result_issuer.issued:
                canon.issue(n)
    return dict(canon.issued)


def canonical_nquads(triples: Iterable[Sequence]) -> str:
    """Canonical N-Quads serialization of one graph: blank labels
    replaced by their ``_:c14nN`` ids, lines sorted and deduplicated,
    each terminated with a newline (RDFC-1.0 §4.4 step 7)."""
    triples = [tuple(t[:7]) for t in triples]
    labels = canonical_labels(triples)
    return "".join(
        sorted({_quad_line(t, labels) + "\n" for t in triples})
    )


_TRIPLE_COLS = ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]


def _relabel_pdf(pdf, labels_fn):
    """Relabel one document's frame in place (test/back-compat seam;
    the Spark path batches many documents per frame instead)."""
    labels = labels_fn(list(pdf[_TRIPLE_COLS].itertuples(index=False)))
    if labels:
        s_blank = pdf["s_kind"] == KIND_BLANK
        o_blank = pdf["o_kind"] == KIND_BLANK
        pdf.loc[s_blank, "s"] = pdf.loc[s_blank, "s"].map(
            lambda x: labels.get(x, x)
        )
        pdf.loc[o_blank, "o"] = pdf.loc[o_blank, "o"].map(
            lambda x: labels.get(x, x)
        )
    return pdf


def canonicalize_blank_nodes(
    df: DataFrame, group_col: str = "doc", n_buckets: int = 256
) -> DataFrame:
    """Replace every blank-node label with its RDFC-1.0 canonical
    ``_:c14nN`` id, independently per ``group_col`` graph.  Output
    schema = input schema; one shuffle.

    Documents are HASH-BUCKETED into ``n_buckets`` ``applyInPandas``
    groups, labels computed per document inside the batch, and the
    relabel applied as ONE vectorized pass over the whole bucket frame
    keyed (doc, label) — one Arrow round trip per bucket instead of per
    document and no per-document pandas slicing (grouping directly by
    document measured 38 s for 5 000 tiny graphs at sf0.1; this shape
    is ~2 s, dominated by the algorithm itself)."""
    schema = StructType(list(df.schema))

    def run(pdf):
        # plain-python row bucketing: pandas per-group slicing costs
        # ~3 ms per tiny graph (profiled) — 6× the algorithm itself
        cols = [pdf[c] for c in (group_col, *_TRIPLE_COLS)]
        per_doc: dict = {}
        for row in zip(*cols):
            per_doc.setdefault(row[0], []).append(row[1:])
        sub: dict = {}
        for key, trs in per_doc.items():
            for a, b in canonical_labels(trs).items():
                sub[(key, a)] = b
        if sub:
            for col, kind_col in (("s", "s_kind"), ("o", "o_kind")):
                pdf[col] = [
                    sub.get((d, v), v) if k == KIND_BLANK else v
                    for d, v, k in zip(
                        pdf[group_col], pdf[col], pdf[kind_col]
                    )
                ]
        return pdf

    bucket = F.pmod(F.xxhash64(F.col(group_col)), F.lit(n_buckets))
    return df.groupBy(bucket.alias("_cb")).applyInPandas(run, schema)


def graph_digest(
    df: DataFrame, group_col: str = "doc", n_buckets: int = 256
) -> DataFrame:
    """Per-graph content address → ``(group_col, digest, n_triples)``:
    SHA-256 over the canonical N-Quads serialization, so isomorphic
    graphs (same triples, different blank labels / row order /
    duplication) collide exactly — the graph-level dedup key.  Same
    hash-bucketed batching as :func:`canonicalize_blank_nodes`."""
    from pyspark.sql.types import LongType, StringType, StructField

    schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField("digest", StringType()),
            StructField("n_triples", LongType()),
        ]
    )

    def run(pdf):
        import pandas as pd

        cols = [pdf[c] for c in (group_col, *_TRIPLE_COLS)]
        per_doc: dict = {}
        for row in zip(*cols):
            per_doc.setdefault(row[0], []).append(row[1:])
        keys, digests, counts = [], [], []
        for key, trs in per_doc.items():
            doc = canonical_nquads(trs)
            keys.append(key)
            digests.append(_sha256(doc))
            counts.append(doc.count("\n"))
        return pd.DataFrame(
            {group_col: keys, "digest": digests, "n_triples": counts}
        )

    bucket = F.pmod(F.xxhash64(F.col(group_col)), F.lit(n_buckets))
    return df.groupBy(bucket.alias("_cb")).applyInPandas(run, schema)
