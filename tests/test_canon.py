"""RDFC-1.0 canonicalization (rdf_spark/canon.py)."""
import hashlib
import random

import pytest

from rdf_spark.canon import (
    CanonicalizationError,
    canonical_labels,
    canonical_nquads,
    canonicalize_blank_nodes,
    graph_digest,
)
from rdf_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL


def _t(s, p, o, s_blank=True, o_blank=None, lang=None, dt=None):
    if o_blank:
        o_kind = KIND_BLANK
    elif o.startswith("urn:"):
        o_kind = KIND_IRI
    else:
        o_kind = KIND_LITERAL
    return (
        s,
        KIND_BLANK if s_blank else KIND_IRI,
        p,
        o,
        o_kind,
        dt,
        lang,
    )


def _relabel(triples, mapping):
    out = []
    for s, sk, p, o, ok, dt, lg in triples:
        out.append((
            mapping.get(s, s) if sk == KIND_BLANK else s,
            sk,
            p,
            mapping.get(o, o) if ok == KIND_BLANK else o,
            ok,
            dt,
            lg,
        ))
    return out


def _rand_graph(rng, n_blank=6, n_triples=14):
    bn = [f"_:n{i}" for i in range(n_blank)]
    preds = ["urn:p", "urn:q", "urn:r"]
    trs = set()
    while len(trs) < n_triples:
        kind = rng.randrange(3)
        if kind == 0:
            trs.add(_t(rng.choice(bn), rng.choice(preds),
                       rng.choice(bn), o_blank=True))
        elif kind == 1:
            trs.add(_t(rng.choice(bn), rng.choice(preds),
                       f"lit{rng.randrange(4)}"))
        else:
            trs.add(_t("urn:s", rng.choice(preds), rng.choice(bn),
                       s_blank=False, o_blank=True))
    return list(trs)


class TestCanonicalLabels:
    def test_single_bnode(self):
        assert canonical_labels([_t("_:x", "urn:p", "v")]) == {
            "_:x": "_:c14n0"
        }

    def test_first_degree_hash_order(self):
        # two independent bnodes: canonical index = code-point order of
        # the first-degree hashes, which we can compute by hand
        trs = [_t("_:x", "urn:p", "a"), _t("_:y", "urn:p", "b")]
        hx = hashlib.sha256(b'_:a <urn:p> "a" .\n').hexdigest()
        hy = hashlib.sha256(b'_:a <urn:p> "b" .\n').hexdigest()
        first = "_:x" if hx < hy else "_:y"
        got = canonical_labels(trs)
        assert got[first] == "_:c14n0"
        assert set(got.values()) == {"_:c14n0", "_:c14n1"}

    def test_ground_graph_untouched(self):
        trs = [_t("urn:s", "urn:p", "urn:o", s_blank=False, o_blank=False)]
        assert canonical_labels(trs) == {}
        assert canonical_nquads(trs) == "<urn:s> <urn:p> <urn:o> .\n"

    def test_symmetric_pair_stable(self):
        # _:x <p> _:y / _:y <p> _:x is automorphic: first-degree hashes
        # tie and the n-degree path breaks it deterministically
        trs = [
            _t("_:x", "urn:p", "_:y", o_blank=True),
            _t("_:y", "urn:p", "_:x", o_blank=True),
        ]
        doc = canonical_nquads(trs)
        swapped = _relabel(trs, {"_:x": "_:y", "_:y": "_:x"})
        assert canonical_nquads(swapped) == doc
        assert "_:c14n0 <urn:p> _:c14n1 .\n" in doc

    def test_self_loop_and_duplicates(self):
        trs = [
            _t("_:x", "urn:p", "_:x", o_blank=True),
            _t("_:x", "urn:p", "_:x", o_blank=True),
            _t("_:x", "urn:q", "v"),
        ]
        assert canonical_nquads(trs) == (
            '_:c14n0 <urn:p> _:c14n0 .\n_:c14n0 <urn:q> "v" .\n'
        )

    @pytest.mark.parametrize("seed", range(8))
    def test_relabel_and_order_invariance(self, seed):
        rng = random.Random(seed)
        trs = _rand_graph(rng)
        doc = canonical_nquads(trs)
        for _ in range(4):
            names = sorted({t[0] for t in trs if t[1] == KIND_BLANK}
                           | {t[3] for t in trs if t[4] == KIND_BLANK})
            shuffled = names[:]
            rng.shuffle(shuffled)
            mapping = {a: f"_:m{i}_{b[2:]}" for i, (a, b) in
                       enumerate(zip(names, shuffled))}
            relabeled = _relabel(trs, mapping)
            rng.shuffle(relabeled)
            assert canonical_nquads(relabeled) == doc

    def test_non_isomorphic_graphs_differ(self):
        chain = [
            _t("_:x", "urn:p", "_:y", o_blank=True),
            _t("_:y", "urn:p", "_:z", o_blank=True),
        ]
        fork = [
            _t("_:x", "urn:p", "_:y", o_blank=True),
            _t("_:x", "urn:p", "_:z", o_blank=True),
        ]
        assert canonical_nquads(chain) != canonical_nquads(fork)

    def test_poison_graph_bounded(self):
        # fully symmetric blank clique: every permutation path ties
        n = 8
        trs = [
            _t(f"_:k{i}", "urn:p", f"_:k{j}", o_blank=True)
            for i in range(n)
            for j in range(n)
            if i != j
        ]
        with pytest.raises(CanonicalizationError):
            canonical_labels(trs)


DDL = ("doc string, s string, s_kind tinyint, p string, o string, "
       "o_kind tinyint, o_datatype string, o_lang string")


def _sdf(spark, doc_triples):
    rows = [(d, *t) for d, trs in doc_triples.items() for t in trs]
    return spark.createDataFrame(rows, DDL)


class TestSparkCanon:
    def test_canonicalize_blank_nodes_per_doc(self, spark):
        rng = random.Random(7)
        trs = _rand_graph(rng, n_blank=4, n_triples=8)
        names = sorted({t[0] for t in trs if t[1] == KIND_BLANK}
                       | {t[3] for t in trs if t[4] == KIND_BLANK})
        mapping = dict(zip(names, reversed([f"_:r{i}" for i in
                                            range(len(names))])))
        df = _sdf(spark, {"d1": trs, "d2": _relabel(trs, mapping)})
        out = canonicalize_blank_nodes(df, "doc")
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r.doc, set()).add(
                (r.s, r.s_kind, r.p, r.o, r.o_kind))
        assert by_doc["d1"] == by_doc["d2"]
        assert any(s.startswith("_:c14n") for s, k, *_ in by_doc["d1"]
                   if k == KIND_BLANK)

    def test_graph_digest_isomorphism(self, spark):
        rng = random.Random(13)
        trs = _rand_graph(rng, n_blank=5, n_triples=10)
        names = sorted({t[0] for t in trs if t[1] == KIND_BLANK}
                       | {t[3] for t in trs if t[4] == KIND_BLANK})
        mapping = {n: f"_:zz{i}" for i, n in enumerate(reversed(names))}
        other = [_t("_:x", "urn:other", "v")]
        df = _sdf(spark, {
            "iso_a": trs,
            "iso_b": _relabel(trs, mapping),
            "diff": other,
        })
        got = {r.doc: (r.digest, r.n_triples)
               for r in graph_digest(df.repartition(5), "doc").collect()}
        assert got["iso_a"] == got["iso_b"]
        assert got["diff"][0] != got["iso_a"][0]
        assert got["diff"][1] == 1
