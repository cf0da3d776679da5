"""RDF/XML conformance: the W3C suite + spec examples inlined in the
reference tests (rdfxml_test.go:556, harness 241-278).  Expected output is
canonical N-Triples text compared exactly after re-encoding; 'TODO' cases
are skipped exactly as the reference does (rdfxml_test.go:246-248)."""

import json
import os

import pytest

from rdf_spark.parsing import ParseError
from rdf_spark.rdfxml import parse_rdfxml
from rdf_spark.terms import triple_nt_line

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    with open(os.path.join(FIXDIR, name + ".jsonl"), encoding="utf-8") as f:
        return [json.loads(line) for line in f]


def _run(case):
    if case["error_text"] == "TODO":
        pytest.skip("TODO in reference suite")
    if case["error"]:
        with pytest.raises(ParseError):
            parse_rdfxml(case["input"], base=case["base"])
        return
    rows = parse_rdfxml(case["input"], base=case["base"])
    got = "".join(triple_nt_line(r) + "\n" for r in rows)
    assert got == case["expected_nt"]


@pytest.mark.parametrize("case", _load("rdfxml_ex"), ids=lambda c: c["name"])
def test_rdfxml_examples(case):
    _run(case)


@pytest.mark.parametrize("case", _load("rdfxml"), ids=lambda c: c["name"])
def test_rdfxml_w3c_suite(case):
    _run(case)
