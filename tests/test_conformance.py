"""W3C RDF 1.1 conformance suites (unit oracle, BASELINE.md).

Fixtures are transcribed from the suites inlined in the reference tests
(nt_test.go:327, nq_test.go:52, ttl_test.go:539) by
tools/extract_fixtures.py.  Comparison is order-insensitive multiset
equality of triple rows, with the per-document blank-node counter reset
(SURVEY.md §4.3) — negative-syntax cases must raise ParseError.
"""

import json
import os

import pytest

from rdf_spark.parsing import ParseError, parse_nquads, parse_ntriples, parse_turtle

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

_PARSERS = {
    "ntriples": parse_ntriples,
    "nquads": parse_nquads,
    "turtle": parse_turtle,
}


def _load(name):
    with open(os.path.join(FIXDIR, name + ".jsonl"), encoding="utf-8") as f:
        return [json.loads(line) for line in f]


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def _run_case(case):
    parse = _PARSERS[case["format"]]
    if case["error"]:
        with pytest.raises(ParseError):
            parse(case["input"])
    else:
        got = parse(case["input"])
        expected = [tuple(r) for r in case["expected"] or []]
        assert _norm(got) == _norm(expected)


@pytest.mark.parametrize("case", _load("ntriples"), ids=lambda c: c["name"])
def test_ntriples_conformance(case):
    _run_case(case)


@pytest.mark.parametrize("case", _load("nquads"), ids=lambda c: c["name"])
def test_nquads_conformance(case):
    _run_case(case)


@pytest.mark.parametrize("case", _load("turtle"), ids=lambda c: c["name"])
def test_turtle_conformance(case):
    _run_case(case)
