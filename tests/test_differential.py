"""Differential tests between independent implementations of the same
contract — the strongest guard against fast-path unsoundness:

* arrow/RE2 line parser vs the exact tokenizer on random near-valid lines
* JVM column N-Triples serializer vs the pure-python serializer
"""

import random

import pyarrow as pa

from rdf_spark import encoders, terms
from rdf_spark.arrow_fast import parse_lines_arrow
from rdf_spark.parsing import ParseError, parse_nquads, parse_ntriples

_FRAGS = [
    '<http://s>', '<rel>', '_:b1', '_:b.x', '"lit"', '"l\\nit"', '"a"@en',
    '"a"@en-', '"x"^^<http://dt>', '.', ' ', '\t', '<http://a b>',
    '"unterminated', '_:', '<>', '# c', '', '<http://g>', '""', '"a" @en',
    '^^<http://dt>', '@en', '<http://s%2>', '_:b-', '<http://s\\u0041>',
    '"\\u00e9"', '<http://s\\u003e>', '"q\\"q"', "'sq'", '1.5', 'true',
]


def test_arrow_vs_exact_on_random_lines():
    rng = random.Random(9)
    for _ in range(4000):
        line = " ".join(rng.choices(_FRAGS, k=rng.randint(1, 7)))
        for fmt, parse in (("ntriples", parse_ntriples), ("nquads", parse_nquads)):
            res = parse_lines_arrow(pa.array([line]), fmt=fmt)
            a_err = len(res) - res.column("err").null_count
            ok = res.filter(res.column("err").is_null()).drop_columns(["err"])
            a_rows = sorted(tuple(r.values()) for r in ok.to_pylist())
            try:
                e_rows = sorted(tuple(r) for r in parse(line))
                e_err = 0
            except ParseError:
                e_rows, e_err = [], 1
            assert (a_err > 0) == (e_err > 0) and a_rows == e_rows, repr(line)


def test_jvm_vs_python_nt_serializer(spark):
    rng = random.Random(3)

    def rt():
        return "".join(rng.choices('ab"\\\n\r\t\x01é€😀@<>', k=rng.randint(0, 12)))

    rows = []
    for i in range(600):
        k = rng.random()
        if k < 0.3:
            o = (f"http://o/{i}", 1, None, None)
        elif k < 0.4:
            o = (f"_:b{i}", 0, None, None)
        elif k < 0.6:
            o = (rt(), 2, terms.XSD_STRING, None)
        elif k < 0.75:
            o = (rt(), 2, terms.RDF_LANG_STRING, "en")
        else:
            o = (rt(), 2, "http://dt/" + str(i % 5), None)
        s = (f"http://s/{i}", 1) if k < 0.5 else (f"_:s{i}", 0)
        rows.append((s[0], s[1], f"http://p/{i % 7}", o[0], o[1], o[2], o[3]))
    df = spark.createDataFrame(rows, terms.TRIPLE_DDL)
    jvm = sorted(r.line for r in df.select(encoders.nt_line_col().alias("line")).collect())
    py = sorted(terms.triple_nt_line(r) for r in rows)
    assert jvm == py


def test_nt_documents_parse_identically_as_turtle():
    """N-Triples is a Turtle subset: the line-mode and document-mode
    parsers must emit identical triples for every NT-valid input."""
    import json
    import os

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    from rdf_spark.parsing import parse_turtle

    with open(os.path.join(fixdir, "ntriples.jsonl"), encoding="utf-8") as f:
        for line in f:
            c = json.loads(line)
            try:
                nt = parse_ntriples(c["input"])
            except ParseError:
                continue
            assert sorted(nt) == sorted(parse_turtle(c["input"])), c["name"]


def test_turtle_flat_doc_fast_path_vs_exact_on_conformance():
    """Every Turtle conformance input through the flat-doc fast path: docs
    the arrow pattern claims as flat must yield EXACTLY the tokenizer's
    triples; error docs must never be claimed flat."""
    import json

    from rdf_spark.arrow_fast import parse_turtle_docs_arrow
    from rdf_spark.parsing import parse_turtle

    cases = [json.loads(l) for l in open("tests/fixtures/turtle.jsonl")]
    texts = [c["input"] for c in cases]
    urls = [c["name"] for c in cases]
    tbl, fallback = parse_turtle_docs_arrow(pa.array(urls), pa.array(texts))
    by_doc: dict[str, list] = {}
    for r in tbl.to_pylist():
        assert r.pop("err") is None
        by_doc.setdefault(r.pop("url"), []).append(tuple(r.values()))
    n_flat = 0
    for i, c in enumerate(cases):
        if fallback[i]:
            continue
        n_flat += 1
        assert not c["error"], f"{c['name']}: error doc claimed flat"
        exact = sorted(tuple(r) for r in parse_turtle(c["input"]))
        got = sorted(by_doc.get(c["name"], []))
        assert got == exact, c["name"]
    # the fast path must actually fire on a meaningful share of the corpus
    assert n_flat >= 30, n_flat


def test_turtle_flat_doc_fast_path_features():
    """Flat-doc coverage: 'a' sugar, numeric/boolean shorthand, lang/typed
    literals, bnode labels, comments; disqualifiers fall back whole-doc."""
    from rdf_spark.arrow_fast import parse_turtle_docs_arrow
    from rdf_spark.parsing import parse_turtle

    flat_doc = (
        "# header comment\n"
        '<http://s> a <http://T> .\n'
        "<http://s> <http://p> 42 .\n"
        "<http://s> <http://p> -3.5 .  # trailing\n"
        "<http://s> <http://p> 1.0e3 .\n"
        "<http://s> <http://p> true .\n"
        '_:x <http://p> "v"@en-GB .\n'
        '<http://s> <http://p> "t"^^<http://dt> .\n'
    )
    non_flat = [
        "@prefix ex: <http://e/> .\n<http://s> ex:p <http://o> .",
        "<http://s> <http://p> <http://o> ;\n  <http://q> <http://r> .",
        '<http://s> <http://p> """multi\n<http://x> <http://y> <http://z> .\n""" .',
        "<rel> <http://p> <http://o> .",
        "<http://s> <http://p> [ <http://q> <http://r> ] .",
        # malformed docs the bare-'a' pattern must NOT fabricate triples
        # from (round-2 ADVICE): exact tokenizer rejects all of these, so
        # the fast path must send them to fallback, never claim them flat
        "<http://s> atrue .",
        "<http://s> a42 .",
        "<http://s> a_:b1 .",
        "_:ba42 .",
        "_:ba 42 .",
        # abutting-but-VALID 'a' docs also fall back (sound-not-complete)
        "<http://s>a<http://T> .",
    ]
    texts = [flat_doc] + non_flat
    urls = [f"d{i}" for i in range(len(texts))]
    tbl, fb = parse_turtle_docs_arrow(pa.array(urls), pa.array(texts))
    assert list(fb) == [False] + [True] * len(non_flat)
    got = sorted(
        tuple(v for k, v in r.items() if k not in ("url", "err"))
        for r in tbl.to_pylist()
    )
    assert got == sorted(tuple(r) for r in parse_turtle(flat_doc))
