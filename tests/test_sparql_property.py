"""Differential property test for SPARQL property paths: the compiled
plans (fresh-var sequence rewriting, IN-list alternation, endpoint-swap
inverses, fixpoint closures) vs a 20-line naive Python evaluator over
random graphs.  Multiset semantics for sequences (SPARQL: a non-closure
path is exactly its triple-pattern expansion, so duplicate derivations
through different intermediates are REAL duplicate solutions); set
semantics for closures."""

import random

import pytest

from rdf_spark.sparql import sparql_select

SUBJECTS = [f"urn:s{i}" for i in range(6)]
PREDS = [f"urn:p{i}" for i in range(4)]
LITS = [f"lit{i}" for i in range(3)]


def _random_graph(rng: random.Random, n: int):
    triples = set()
    while len(triples) < n:
        s = rng.choice(SUBJECTS)
        p = rng.choice(PREDS)
        o = rng.choice(SUBJECTS + LITS)
        triples.add((s, p, o))
    return sorted(triples)


def _hops(triples, preds, inv):
    """One segment's (from, to) pairs (multiset)."""
    out = []
    for s, p, o in triples:
        if p in preds:
            out.append((o, s) if inv else (s, o))
    return out


def _eval_seq(triples, segs):
    """Chain segments: list of (a, b) WITH multiplicity."""
    chains = None
    for preds, inv in segs:
        hop = _hops(triples, preds, inv)
        if chains is None:
            chains = hop
        else:
            chains = [(a, d) for a, b in chains for c, d in hop if b == c]
    return chains


def _reach(triples, pred, start):
    """BFS transitive closure (≥1 step) from one anchor."""
    adj = {}
    for s, p, o in triples:
        if p == pred:
            adj.setdefault(s, set()).add(o)
    seen, frontier = set(), {start}
    while frontier:
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        frontier = nxt - seen
        seen |= nxt
    return seen


def _seg_str(preds, inv):
    mark = "^" if inv else ""
    return "|".join(f"{mark}<{p}>" for p in preds)


@pytest.fixture(scope="module")
def rng():
    return random.Random(42)


def test_path_compiler_matches_naive_evaluator(spark, rng):
    for case in range(25):
        triples = _random_graph(rng, rng.randint(8, 25))
        df = spark.createDataFrame(triples, "s string, p string, o string")
        n_segs = rng.randint(1, 3)
        segs = []
        for _ in range(n_segs):
            # alternation only as a whole single-segment path (grammar
            # rejects '|' inside '/'); inside sequences use single preds
            n_alts = rng.randint(1, 3) if n_segs == 1 else 1
            preds = rng.sample(PREDS, n_alts)
            segs.append((preds, rng.random() < 0.4))
        if n_segs == 1:
            path = _seg_str(*segs[0])
        else:
            path = "/".join(_seg_str(*s) for s in segs)
        q = f"SELECT ?a ?b WHERE {{ ?a {path} ?b }}"
        got = sorted(tuple(r) for r in sparql_select(df, q).collect())
        want = sorted(_eval_seq(triples, segs))
        assert got == want, f"case {case}: path {path!r}\n{got}\nvs\n{want}"


def test_closure_matches_bfs(spark, rng):
    for case in range(8):
        triples = _random_graph(rng, rng.randint(10, 25))
        df = spark.createDataFrame(triples, "s string, p string, o string")
        pred = rng.choice(PREDS)
        anchor = rng.choice(SUBJECTS)
        want = _reach(triples, pred, anchor)

        got = {r.x for r in sparql_select(
            df, f"SELECT ?x WHERE {{ <{anchor}> <{pred}>+ ?x }}"
        ).collect()}
        assert got == want, f"case {case}: {pred}+ from {anchor}"
        # star adds the anchor itself
        got_star = {r.x for r in sparql_select(
            df, f"SELECT ?x WHERE {{ <{anchor}> <{pred}>* ?x }}"
        ).collect()}
        assert got_star == want | {anchor}
        # inverse closure ≡ reversed-edge reachability
        rev = [(o, p, s) for s, p, o in triples]
        want_inv = _reach(rev, pred, anchor)
        got_inv = {r.x for r in sparql_select(
            df, f"SELECT ?x WHERE {{ <{anchor}> ^<{pred}>+ ?x }}"
        ).collect()}
        assert got_inv == want_inv, f"case {case}: ^{pred}+ from {anchor}"
