"""JSON-LD core-subset decode/encode (EXCEEDS reference parity —
knakk/rdf has no JSON-LD, rdf.go:14-22)."""

import json

import pytest

from pyspark.sql import functions as F

from rdf_spark import sources, terms
from rdf_spark.jsonld import encode_jsonld, parse_jsonld
from rdf_spark.parsing import ParseError

XSD = "http://www.w3.org/2001/XMLSchema#"


def test_scalars_and_context():
    doc = json.dumps({
        "@context": {"ex": "http://e/", "@vocab": "http://v/"},
        "@id": "http://s",
        "ex:name": "Alice",
        "age": 25,
        "score": 1.5,
        "active": True,
    })
    got = {(r[2], r[3], r[5]) for r in parse_jsonld(doc)}
    assert got == {
        ("http://e/name", "Alice", XSD + "string"),
        ("http://v/age", "25", XSD + "integer"),
        ("http://v/score", "1.5", XSD + "double"),
        ("http://v/active", "true", XSD + "boolean"),
    }


def test_type_coercion_and_id_values():
    doc = json.dumps({
        "@context": {
            "knows": {"@id": "http://e/knows", "@type": "@id"},
            "born": {"@id": "http://e/born", "@type": XSD + "dateTime"},
        },
        "@id": "http://s",
        "@type": "http://e/T",
        "knows": ["http://o1", "_:b9"],
        "born": "2001-02-03T00:00:00",
    })
    rows = sorted(parse_jsonld(doc))
    by_p = {}
    for r in rows:
        by_p.setdefault(r[2], []).append(r)
    assert [(r[3], r[4]) for r in by_p["http://e/knows"]] == [("_:b9", 0), ("http://o1", 1)]
    assert by_p["http://e/born"][0][5] == XSD + "dateTime"
    assert by_p[terms.RDF_TYPE][0][3] == "http://e/T"


def test_value_objects_language_and_lists():
    doc = json.dumps({
        "@context": {"p": "http://p/", "@language": "en",
                     "tags": {"@id": "http://p/tags", "@container": "@list"}},
        "@id": "http://s",
        "p:note": {"@value": "hallo", "@language": "de"},
        "p:plain": "hi",
        "tags": ["a", "b"],
    })
    rows = parse_jsonld(doc)
    langs = {r[3]: r[6] for r in rows if r[4] == 2}
    assert langs["hallo"] == "de" and langs["hi"] == "en"
    firsts = [r for r in rows if r[2] == terms.RDF_FIRST]
    rests = [r for r in rows if r[2] == terms.RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(r[3] == terms.RDF_NIL for r in rests)


def test_nested_nodes_mint_document_scoped_bnodes():
    doc = json.dumps({
        "@context": {"p": "http://p/"},
        "@id": "http://s",
        "p:a": {"p:x": "1"},
        "p:b": {"p:x": "2"},
    })
    rows = parse_jsonld(doc)
    minted = sorted({r[0] for r in rows if r[1] == 0}
                    | {r[3] for r in rows if r[4] == 0})
    assert minted == ["_:b1", "_:b2"]


def test_named_graphs():
    doc = json.dumps([
        {"@context": {"p": "http://p/"},
         "@id": "http://g1", "@graph": [{"@id": "http://s1", "p:x": "a"}]},
        {"@context": {"p": "http://p/"},
         "@id": "http://s2", "p:x": "b"},
    ])
    rows = parse_jsonld(doc)
    graphs = {r[0]: (r[7], r[8]) for r in rows}
    assert graphs["http://s1"] == ("http://g1", 1)
    assert graphs["http://s2"] == (terms.DEFAULT_GRAPH, 0)


def test_base_resolution():
    doc = json.dumps({"@context": {"p": "http://p/"}, "@id": "page", "p:x": "v"})
    rows = parse_jsonld(doc, base="http://host/")
    assert rows[0][0] == "http://host/page"


def test_errors():
    for bad, msg in [
        ('{"@context": "http://remote.example/ctx"}', "remote"),
        ('{"@reverse": {}}', "@reverse"),
        ("[1, 2]", "object or array"),
        ("{not json", "invalid JSON"),
        ('{"@id": "http://s", "@context": {"p": "http://p/"}, "p:x": null}', "null"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_jsonld(bad)


def test_keyword_matrix_rejections():
    """Every 'rejected' row of the module-docstring keyword matrix: the
    parser must raise ParseError, never emit junk terms."""
    for bad in [
        '{"@id": "http://s", "@reverse": {"http://p": {"@id": "http://o"}}}',
        '{"@id": "http://s", "@index": "k"}',
        '{"@id": "http://s", "@nest": {}}',
        '{"@id": "http://s", "@included": []}',
        '{"@id": "http://s", "@direction": "ltr"}',
        '{"@id": "http://s", "@json": {}}',
        # @context-level keywords outside the supported trio
        '{"@context": {"@version": 1.1}, "@id": "http://s"}',
        '{"@context": {"@propagate": true}, "@id": "http://s"}',
        '{"@context": {"@import": "http://x/ctx"}, "@id": "http://s"}',
        # unsupported term-definition keywords
        '{"@context": {"p": {"@id": "http://p", "@reverse": true}}, "@id": "http://s"}',
        '{"@context": {"p": {"@id": "http://p", "@index": "k"}}, "@id": "http://s"}',
        # container maps other than @list/@set
        '{"@context": {"p": {"@id": "http://p", "@container": "@index"}}, "@id": "http://s"}',
        '{"@context": {"p": {"@id": "http://p", "@container": "@language"}}, "@id": "http://s"}',
        # a set object may carry only @set (+@index metadata)
        '{"@id": "http://s", "http://p": {"@set": ["x"], "@list": ["y"]}}',
        # keyword aliasing must raise, not emit an '@id' predicate
        '{"@context": {"id": "@id"}, "@id": "http://s", "id": "http://o"}',
        # JSON literals: @json as @value datatype and as term-def coercion
        '{"@id": "http://s", "http://p": {"@value": {"a": 1}, "@type": "@json"}}',
        '{"@context": {"p": {"@id": "http://p", "@type": "@json"}}, '
        '"@id": "http://s", "p": "x"}',
        # @type entries that expand to keywords
        '{"@context": {"T": "@json"}, "@id": "http://s", "@type": "T"}',
        # @none as a node key
        '{"@id": "http://s", "@none": "x"}',
    ]:
        with pytest.raises(ParseError):
            parse_jsonld(bad)


def test_keyword_matrix_supported():
    """Matrix rows not covered by the feature tests above: @index tolerated
    inside @value objects (pure metadata), null term-definition removal,
    term-def @language, @container @list."""
    # @index inside a @value object is ignored (spec: metadata only)
    got = parse_jsonld(
        '{"@id": "http://s", "http://p": '
        '{"@value": "v", "@index": "meta"}}'
    )
    assert got == [("http://s", 1, "http://p", "v", 2, XSD + "string", None,
                    terms.DEFAULT_GRAPH, 0)]
    # null term definition removes an inherited term: the property is then
    # undefined (no @vocab) and dropped per spec
    got = parse_jsonld(
        '{"@context": {"p": "http://p/"}, "@id": "http://s", '
        '"@graph": [{"@context": {"p": null}, "@id": "http://s2", "p": "v"}]}'
    )
    assert got == []  # no triples: dropped property, nothing else emitted
    # term-definition @language
    got = parse_jsonld(
        '{"@context": {"p": {"@id": "http://p", "@language": "fr"}}, '
        '"@id": "http://s", "p": "v"}'
    )
    assert got[0][3:7] == ("v", 2, terms.RDF_LANG_STRING, "fr")
    # @container @list builds an rdf list
    got = parse_jsonld(
        '{"@context": {"p": {"@id": "http://p", "@container": "@list"}}, '
        '"@id": "http://s", "p": [1, 2]}'
    )
    preds = {r[2] for r in got}
    assert terms.RDF_FIRST in preds and terms.RDF_REST in preds


def test_encode_roundtrip():
    quads = [
        ("http://s", 1, "http://p/a", "v", 2, XSD + "string", None,
         terms.DEFAULT_GRAPH, 0),
        ("http://s", 1, terms.RDF_TYPE, "http://T", 1, None, None,
         terms.DEFAULT_GRAPH, 0),
        ("_:b1", 0, "http://p/b", "x", 2, terms.RDF_LANG_STRING, "en",
         "http://g1", 1),
        ("http://s2", 1, "http://p/c", "7", 2, XSD + "integer", None,
         "http://g1", 1),
    ]
    text = encode_jsonld(quads, indent=2)
    assert sorted(parse_jsonld(text)) == sorted(quads)


def test_jsonld_documents_spark(spark):
    docs = spark.createDataFrame(
        [
            ("u:1", json.dumps({"@id": "http://s1", "http://p/x": "a"})),
            ("u:2", json.dumps({"@id": "http://g", "@graph": [
                {"@id": "http://s2", "http://p/x": {"@value": "b", "@language": "en"}}]})),
            ("u:3", "{broken"),
        ],
        ["url", "text"],
    )
    out = sources.parse_documents(docs, fmt="jsonld", base_from_url=False)
    good = out.filter(F.col("err").isNull())
    assert set(good.columns) == {"url"} | set(terms.QUAD_COLS) | {"err"}
    rows = {(r.url, r.s, r.graph) for r in good.collect()}
    assert rows == {("u:1", "http://s1", terms.DEFAULT_GRAPH),
                    ("u:2", "http://s2", "http://g")}
    assert out.filter(F.col("err").isNotNull()).count() == 1


def test_convert_jsonld_roundtrip(spark, tmp_path):
    from rdf_spark import convert

    src = str(tmp_path / "in.jsonld")
    with open(src, "w") as f:
        f.write(json.dumps([
            {"@id": "http://s1", "http://p/x": "a"},
            {"@id": "http://g", "@graph": [{"@id": "http://s2", "http://p/x": "b"}]},
        ]))
    nq_out = str(tmp_path / "out_nq")
    n = convert.convert(spark, src, "jsonld", nq_out, "nquads", skolemize=False)
    assert n == 2
    back = sources.read_nquads(spark, nq_out).filter(F.col("err").isNull())
    assert {(r.s, r.graph) for r in back.collect()} == {
        ("http://s1", terms.DEFAULT_GRAPH), ("http://s2", "http://g"),
    }
    jl_out = str(tmp_path / "out_jsonld")
    n2 = convert.convert(spark, nq_out, "nquads", jl_out, "jsonld")
    assert n2 == 2
    back2 = convert.read_rdf(spark, jl_out, "jsonld").filter(F.col("err").isNull())
    assert {(r.s, r.graph) for r in back2.collect()} == {
        ("http://s1", terms.DEFAULT_GRAPH), ("http://s2", "http://g"),
    }


def test_jsonld_review_regressions():
    """Round-2 code-review fixes: unresolvable prefix and cyclic @context
    must raise ParseError (never TypeError/RecursionError)."""
    with pytest.raises(ParseError, match="does not expand"):
        parse_jsonld('{"@context": {"p": {"@id": "notAbsolute"}}, '
                     '"@id": "http://s", "p:x": "v"}')
    with pytest.raises(ParseError, match="cyclic"):
        parse_jsonld('{"@context": {"x": "x"}, "@id": "http://s", "x": 1}')
    with pytest.raises(ParseError, match="cyclic"):
        parse_jsonld('{"@context": {"a": "b:x", "b": "a:y"}, '
                     '"@id": "http://s", "a:z": 1}')


def test_set_container_and_set_objects():
    """@set is pure syntax: identical triples to the bare array form."""
    from rdf_spark.terms import XSD_STRING

    plain = parse_jsonld(
        '{"@id": "http://s", "http://p": ["a", "b"]}'
    )
    via_obj = parse_jsonld(
        '{"@id": "http://s", "http://p": {"@set": ["a", "b"]}}'
    )
    via_container = parse_jsonld(
        '{"@context": {"p": {"@id": "http://p", "@container": "@set"}},'
        ' "@id": "http://s", "p": ["a", "b"]}'
    )
    assert sorted(plain) == sorted(via_obj) == sorted(via_container)
    assert {t[3] for t in plain} == {"a", "b"}
    assert all(t[5] == XSD_STRING for t in plain)
    # @index alongside @set is metadata, dropped like in @value objects
    with_idx = parse_jsonld(
        '{"@id": "http://s", "http://p": {"@set": ["a", "b"], "@index": "k"}}'
    )
    assert sorted(with_idx) == sorted(plain)
    # nested @set flattens like nested arrays
    nested = parse_jsonld(
        '{"@id": "http://s", "http://p": {"@set": [{"@set": ["a"]}, "b"]}}'
    )
    assert sorted(nested) == sorted(plain)
