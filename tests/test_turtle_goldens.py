"""Turtle encoder golden round-trips: decode ttlBenchInputs[i] → encode
must equal ttlBenchOutputs[i] byte-for-byte (reference TestEncodingTTL,
ttl_test.go:488-514, with the custom rdf: namespace mapping)."""

import json
import os

import pandas as pd
import pytest

from rdf_spark import terms
from rdf_spark.encoders import encode_turtle_pdf
from rdf_spark.parsing import parse_turtle

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load():
    with open(os.path.join(FIXDIR, "turtle_encode_goldens.jsonl"), encoding="utf-8") as f:
        return [json.loads(line) for line in f]


@pytest.mark.parametrize("case", _load(), ids=lambda c: c["name"])
def test_turtle_encode_golden(case):
    triples = parse_turtle(case["input"])
    pdf = pd.DataFrame(triples, columns=terms.TRIPLE_COLS)
    got = encode_turtle_pdf(
        pdf, namespaces={"http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf"}
    )
    if got == case["expected"]:
        return
    # Deliberate deviation: the reference never calls its escapeLocal
    # (encoder.go:323 TODO) and some goldens contain prefixed names that are
    # not valid Turtle (e.g. raw '?'/'=' locals, ttl_test.go golden [8]).
    # We emit PN_LOCAL-escaped (reparseable) output instead; accept the
    # deviation only when the golden itself does NOT reparse and our output
    # round-trips to the identical triple set.
    with pytest.raises(Exception):
        parse_turtle(case["expected"])
    assert sorted(set(parse_turtle(got))) == sorted(set(triples))
