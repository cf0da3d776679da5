"""Fuzz: arbitrary byte-soup must never crash or hang a parser — every
input either parses or raises ParseError (the quarantine contract that
keeps one bad page from killing a 10^12-document job)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_spark.parsing import ParseError, parse_nquads, parse_ntriples, parse_turtle
from rdf_spark.rdfxml import parse_rdfxml

_garbage = st.text(
    st.characters(codec="utf-8", blacklist_categories=("Cs",)), max_size=200
)

# bias toward RDF-looking fragments to reach deeper parser states
_rdfish = st.lists(
    st.sampled_from([
        "<http://s>", "<p:q>", '"lit"', "'''long'''", "@prefix", "@base",
        "PREFIX", "p:x", "_:b1", "a", ";", ",", ".", "[", "]", "(", ")",
        "@en", "^^", "<", '"', "\\u0041", "\\", "123", "1.5e", "#c", "\n",
        "true", "false", "\t", "é",
    ]),
    max_size=25,
).map(" ".join)


@settings(max_examples=400, deadline=None)
@given(st.one_of(_garbage, _rdfish))
def test_parsers_never_crash(text):
    for parse in (parse_ntriples, parse_nquads, parse_turtle):
        try:
            parse(text)
        except ParseError:
            pass


@settings(max_examples=150, deadline=None)
@given(_garbage)
def test_rdfxml_never_crashes(text):
    try:
        parse_rdfxml(text, base="http://b/")
    except ParseError:
        pass
