"""Term-model unit tests, mirroring the reference's rdf_test.go:8-100
(IRI validity, lang-tag rules) and the canonical N-Triples serialization
goldens from nt_test.go:11-60 / rune.go:222-239 escaping."""

from rdf_spark import terms
from rdf_spark.chars import escape_literal, unescape_numeric, unescape_reserved


def test_iri_validity():
    assert terms.iri_is_valid("http://example.org/resource")
    assert not terms.iri_is_valid("")
    for bad in '<>"{}|^`\\':
        assert not terms.iri_is_valid("http://x/" + bad)
    assert not terms.iri_is_valid("http://x/a b")  # space
    assert not terms.iri_is_valid("http://x/\x07")  # control char


def test_iri_split():
    assert terms.iri_split("http://example.org/ns#name") == ("http://example.org/ns#", "name")
    assert terms.iri_split("http://example.org/a/b") == ("http://example.org/a/", "b")
    assert terms.iri_split("urn:uuid") == ("", "")


def test_lang_tag_validity():
    # rdf.go:365-392 — one dash max, digits only after dash
    assert terms.lang_tag_is_valid("en")
    assert terms.lang_tag_is_valid("en-GB")
    assert terms.lang_tag_is_valid("nb-no2")
    assert not terms.lang_tag_is_valid("-en")
    assert not terms.lang_tag_is_valid("en-")
    assert not terms.lang_tag_is_valid("en-gb-x")
    assert not terms.lang_tag_is_valid("en2")
    assert not terms.lang_tag_is_valid("")


def test_escape_literal_canonical():
    # exactly \n \r \" \\ are escaped; tab and unicode pass through raw
    assert escape_literal('a"b') == 'a\\"b'
    assert escape_literal("a\nb\rc") == "a\\nb\\rc"
    assert escape_literal("a\\b") == "a\\\\b"
    assert escape_literal("a\tb") == "a\tb"
    assert escape_literal("héllo") == "héllo"


def test_unescape_numeric():
    assert unescape_numeric(r"A") == "A"
    assert unescape_numeric(r"\U00000041") == "A"
    assert unescape_numeric(r"a\tb\nc") == "a\tb\nc"
    assert unescape_numeric(r"\\") == "\\"
    assert unescape_numeric("plain") == "plain"


def test_unescape_reserved():
    assert unescape_reserved(r"a\~b") == "a~b"
    assert unescape_reserved(r"x\.y\-z") == "x.y-z"


def test_triple_nt_line_goldens():
    # canonical lines per Triple.Serialize (rdf.go:435-457)
    t = ("http://example/s", terms.KIND_IRI, "http://example/p",
         "http://example/o", terms.KIND_IRI, None, None)
    assert terms.triple_nt_line(t) == "<http://example/s> <http://example/p> <http://example/o> ."
    t = ("_:b1", terms.KIND_BLANK, "http://example/p", "hi", terms.KIND_LITERAL,
         terms.XSD_STRING, None)
    assert terms.triple_nt_line(t) == '_:b1 <http://example/p> "hi" .'
    t = ("http://example/s", terms.KIND_IRI, "http://example/p", "hei", terms.KIND_LITERAL,
         terms.RDF_LANG_STRING, "nb-no")
    assert terms.triple_nt_line(t) == '<http://example/s> <http://example/p> "hei"@nb-no .'
    t = ("http://example/s", terms.KIND_IRI, "http://example/p", "42", terms.KIND_LITERAL,
         terms.XSD_INTEGER, None)
    assert (
        terms.triple_nt_line(t)
        == '<http://example/s> <http://example/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    )


def test_quad_nq_line():
    q = ("http://example/s", terms.KIND_IRI, "http://example/p",
         "http://example/o", terms.KIND_IRI, None, None,
         "http://example/g", terms.KIND_IRI)
    assert (
        terms.quad_nq_line(q)
        == "<http://example/s> <http://example/p> <http://example/o> <http://example/g> ."
    )
