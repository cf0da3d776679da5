"""TriG decode/encode (EXCEEDS reference parity — knakk/rdf has no TriG,
rdf.go:14-22): named-graph blocks over the Turtle grammar, quad schema."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from rdf_spark import encoders, sources, terms
from rdf_spark.parsing import ParseError, parse_trig, parse_turtle

EX = "http://e/"


def test_trig_graph_block_forms():
    doc = (
        "@prefix ex: <http://e/> .\n"
        '<http://s0> ex:p "top" .\n'
        "GRAPH <http://g1> { <http://s1> ex:p 42 }\n"
        "graph _:gb { <http://s2> ex:p true . }\n"
        "<http://g2> { <http://s3> a ex:T . }\n"
        "ex:g3 { <http://s4> ex:p 1.5 }\n"
        '{ <http://s5> ex:p "default" . }\n'
    )
    got = sorted(parse_trig(doc))
    graphs = {(r[7], r[8]) for r in got}
    assert graphs == {
        (terms.DEFAULT_GRAPH, 0), ("http://g1", 1), ("_:gb", 0),
        ("http://g2", 1), ("http://e/g3", 1),
    }
    assert len(got) == 6
    # triple part matches the Turtle parse of each body
    assert got[0][:7] == parse_turtle('<http://s0> <http://e/p> "top" .')[0]


def test_trig_bnode_labels_document_scoped():
    doc = (
        "GRAPH <http://g1> { [] <http://p> <http://o> . }\n"
        "GRAPH <http://g2> { [] <http://p> <http://o> . }\n"
    )
    got = parse_trig(doc)
    # the per-document counter keeps minting across graphs: b1 then b2
    assert [r[0] for r in got] == ["_:b1", "_:b2"]


def test_trig_optional_trailing_dot_and_nesting():
    doc = 'GRAPH <http://g> { <http://s> <http://p> [ <http://q> "v" ] }'
    got = sorted(parse_trig(doc))
    assert len(got) == 2 and all(r[7] == "http://g" for r in got)


def test_trig_errors():
    with pytest.raises(ParseError):
        parse_trig("GRAPH <http://g> { <http://s> <http://p> <http://o> .")
    with pytest.raises(ParseError):
        parse_trig("GRAPH { <http://s> <http://p> <http://o> . }")
    with pytest.raises(ParseError):
        parse_trig('GRAPH "lit" { <http://s> <http://p> <http://o> . }')
    # turtle rejects trig syntax
    with pytest.raises(ParseError):
        parse_turtle("GRAPH <http://g> { <http://s> <http://p> <http://o> . }")
    with pytest.raises(ParseError):
        parse_turtle("{ <http://s> <http://p> <http://o> . }")


def test_trig_turtle_is_valid_trig():
    doc = (
        "@prefix ex: <http://e/> .\n"
        "<http://s> ex:p ( 1 2 ) ;\n  ex:q [ ex:r true ] .\n"
    )
    tri = sorted(r[:7] for r in parse_trig(doc))
    assert tri == sorted(parse_turtle(doc))
    assert all(r[7] == terms.DEFAULT_GRAPH for r in parse_trig(doc))


def test_trig_encode_roundtrip():
    quads = [
        ("http://s0", 1, EX + "p", "top", 2, terms.XSD_STRING, None,
         terms.DEFAULT_GRAPH, 0),
        ("http://s1", 1, EX + "p", "42", 2, terms.XSD_INTEGER, None, "http://g1", 1),
        ("http://s1", 1, EX + "q", "x", 2, terms.RDF_LANG_STRING, "en", "http://g1", 1),
        ("_:a", 0, EX + "p", 'y"z\n', 2, terms.XSD_STRING, None, "_:gb", 0),
    ]
    pdf = pd.DataFrame(quads, columns=terms.QUAD_COLS)
    text = encoders.encode_trig_pdf(pdf, namespaces={EX: "ex"})
    assert sorted(parse_trig(text)) == sorted(tuple(q) for q in quads)
    # and without any namespace map (no directives, full IRIs)
    text2 = encoders.encode_trig_pdf(pdf)
    assert "@prefix" not in text2
    assert sorted(parse_trig(text2)) == sorted(tuple(q) for q in quads)


def test_trig_encode_same_lexical_iri_and_blank_graph():
    """A lexical appearing as BOTH an IRI graph and a blank graph must not
    get its quads emitted twice (block selection filters graph AND kind)."""
    quads = [
        ("http://s1", 1, EX + "p", "http://o1", 1, None, None, "_:g", 1),
        ("http://s2", 1, EX + "p", "http://o2", 1, None, None, "_:g", 0),
    ]
    pdf = pd.DataFrame(quads, columns=terms.QUAD_COLS)
    text = encoders.encode_trig_pdf(pdf)
    assert text.count("http://s1") == 1
    assert text.count("http://s2") == 1
    # one block per (lexical, kind): '<_:g> {' for the IRI, '_:g {' blank
    assert text.count("<_:g> {") == 1
    assert text.count("\n_:g {") == 1


def test_trig_documents_spark(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            ("u:1", 'GRAPH <http://g1> { <http://s1> <http://p> "a" . }'),
            ("u:2", '<http://s2> <http://p> "b" .'),
            ("u:3", "GRAPH <http://g> { broken"),
        ],
        ["url", "text"],
    )
    out = sources.parse_documents(docs, fmt="trig", base_from_url=False)
    good = out.filter(F.col("err").isNull())
    assert set(good.columns) == {"url"} | set(terms.QUAD_COLS) | {"err"}
    rows = {(r.url, r.s, r.graph, int(r.graph_kind)) for r in good.collect()}
    assert rows == {
        ("u:1", "http://s1", "http://g1", 1),
        ("u:2", "http://s2", terms.DEFAULT_GRAPH, 0),
    }
    assert out.filter(F.col("err").isNotNull()).count() == 1

    # distributed encode: write one TriG doc, reparse it
    quads = good.select(*terms.QUAD_COLS)
    path = str(tmp_path / "out_trig")
    encoders.write_trig(quads, path)
    back = spark.read.text(path)
    text = "\n".join(r.value for r in back.collect())
    assert sorted(parse_trig(text)) == sorted(
        tuple(r) for r in quads.collect()
    )


def test_convert_trig_nquads_roundtrip(spark, tmp_path):
    from rdf_spark import convert

    src = str(tmp_path / "in.trig")
    with open(src, "w") as f:
        f.write(
            'GRAPH <http://g1> { <http://s1> <http://p> "a" . }\n'
            '<http://s2> <http://p> "b" .\n'
        )
    nq_out = str(tmp_path / "out_nq")
    n = convert.convert(spark, src, "trig", nq_out, "nquads", skolemize=False)
    assert n == 2
    back = sources.read_nquads(spark, nq_out).filter(F.col("err").isNull())
    got = {(r.s, r.graph) for r in back.collect()}
    assert got == {("http://s1", "http://g1"), ("http://s2", terms.DEFAULT_GRAPH)}

    trig_out = str(tmp_path / "out_trig2")
    n2 = convert.convert(spark, nq_out, "nquads", trig_out, "trig")
    assert n2 == 2
    back2 = convert.read_rdf(spark, trig_out, "trig").filter(F.col("err").isNull())
    assert {(r.s, r.graph) for r in back2.collect()} == got


def test_trig_review_regressions():
    """Round-2 code-review fixes: pname prefixes starting with 'graph',
    optional dot in DEFAULT blocks, anonymous-bnode graph labels."""
    # 'graph_' is a valid PN_PREFIX — must lex as a pname, not GRAPH
    assert parse_turtle(
        "@prefix graph_: <http://example/> .\ngraph_:s graph_:p graph_:o ."
    ) == [("http://example/s", 1, "http://example/p", "http://example/o", 1, None, None)]
    # default-graph block: final '.' optional
    assert parse_trig("{ <http://s> <http://p> <http://o> }") == [
        ("http://s", 1, "http://p", "http://o", 1, None, None, terms.DEFAULT_GRAPH, 0)
    ]
    # anonymous blank node as graph label (labelOrSubject includes ANON)
    got = parse_trig("[] { <http://s> <http://p> <http://o> . }")
    assert got[0][7] == "_:b1" and got[0][8] == 0
    # keyword abutting an <IRI> / block still lexes as GRAPH
    got2 = parse_trig("GRAPH<http://g>{<http://s> <http://p> <http://o>}")
    assert got2[0][7] == "http://g"
