"""Property-based round-trips (hypothesis): any valid triple must survive
canonical N-Triples serialize → parse unchanged.  This probes escape and
charset edges beyond the W3C suites (rune.go:222-239 escaping, IRI charset
rdf.go:224-239, lexer-accepted lang tags lex.go:851-879)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_spark import terms
from rdf_spark.parsing import parse_ntriples
from rdf_spark.terms import triple_nt_line

# IRIs: scheme + chars excluding the disallowed set (rdf.go:224-239)
_iri_char = st.characters(
    codec="utf-8",
    blacklist_characters=set('<>"{}|^`\\') | {chr(c) for c in range(0x21)},
    blacklist_categories=("Cs",),
)
iris = st.builds(
    lambda rest: "http://x/" + rest, st.text(_iri_char, min_size=0, max_size=30)
)

# literal lexical forms: any text without lone surrogates
literal_text = st.text(
    st.characters(codec="utf-8", blacklist_categories=("Cs",)), max_size=40
)

# lexer-accepted language tags: alpha+ ('-' [alnum-]+)?
lang_tags = st.one_of(
    st.text(string.ascii_letters, min_size=1, max_size=6),
    st.builds(
        lambda a, b: a + "-" + b,
        st.text(string.ascii_letters, min_size=1, max_size=4),
        st.text(string.ascii_letters + string.digits, min_size=1, max_size=4),
    ),
)

bnode_labels = st.builds(
    lambda first, rest: "_:" + first + rest,
    st.text(string.ascii_letters + "_", min_size=1, max_size=1),
    st.text(string.ascii_letters + string.digits + "_", max_size=8),
)

subjects = st.one_of(
    iris.map(lambda i: (i, terms.KIND_IRI)),
    bnode_labels.map(lambda b: (b, terms.KIND_BLANK)),
)

objects = st.one_of(
    iris.map(lambda i: (i, terms.KIND_IRI, None, None)),
    bnode_labels.map(lambda b: (b, terms.KIND_BLANK, None, None)),
    literal_text.map(lambda t: (t, terms.KIND_LITERAL, terms.XSD_STRING, None)),
    st.tuples(literal_text, lang_tags).map(
        lambda tl: (tl[0], terms.KIND_LITERAL, terms.RDF_LANG_STRING, tl[1])
    ),
    st.tuples(literal_text, iris).map(
        lambda td: (td[0], terms.KIND_LITERAL, td[1], None)
    ),
)


@settings(max_examples=300, deadline=None)
@given(subjects, iris, objects)
def test_serialize_parse_roundtrip(subj, pred, obj):
    t = (subj[0], subj[1], pred, obj[0], obj[1], obj[2], obj[3])
    line = triple_nt_line(t)
    back = parse_ntriples(line)
    assert len(back) == 1
    got = back[0]
    # normalize: parser reports explicit xsd:string for plain literals and
    # None datatype for IRIs/bnodes — same convention as the input
    assert got == t
