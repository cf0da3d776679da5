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


_trigish = st.lists(
    st.sampled_from([
        "<http://s>", "<http://g>", '"lit"', "@prefix", "p:x", "_:b1", "a",
        ";", ",", ".", "{", "}", "GRAPH", "graph", "Graph", "[", "]",
        "(", ")", "@en", "^^", "123", "true", "\n", "#c",
    ]),
    max_size=25,
).map(" ".join)


@settings(max_examples=400, deadline=None)
@given(st.one_of(_garbage, _trigish))
def test_trig_never_crashes(text):
    from rdf_spark.parsing import parse_trig

    try:
        parse_trig(text)
    except ParseError:
        pass


_jsonish = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-99, 99),
              st.floats(allow_nan=False, allow_infinity=False),
              st.sampled_from(["@id", "@type", "@value", "@list", "@graph",
                               "http://x", "_:b", "p:x", "x", ""])),
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(
            st.sampled_from(["@context", "@id", "@type", "@value", "@language",
                             "@list", "@graph", "@vocab", "p", "http://p"]),
            kids, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=400, deadline=None)
@given(st.one_of(_garbage, _jsonish.map(lambda v: __import__("json").dumps(v))))
def test_jsonld_never_crashes(text):
    from rdf_spark.jsonld import parse_jsonld

    try:
        parse_jsonld(text)
    except ParseError:
        pass


# ---------------------------------------------------------------------------
# SPARQL parser fuzz: every input either parses or raises SparqlError —
# never IndexError/AttributeError/RecursionError (derandomized so the
# corpus is identical on every run)
# ---------------------------------------------------------------------------

_sparqlish = st.lists(
    st.sampled_from([
        "SELECT", "CONSTRUCT", "ASK", "DESCRIBE", "WHERE", "DISTINCT",
        "INSERT", "DELETE", "DATA", "FROM", "NAMED", "UNDEF", "REDUCED",
        "PREFIX", "ns:", "<urn:p>", "?x", "?y", "*", "{", "}", "(", ")",
        "FILTER", "OPTIONAL", "UNION", "MINUS", "GRAPH", "VALUES", "BIND",
        "AS", "NOT", "EXISTS", "GROUP", "BY", "HAVING", "ORDER", "ASC",
        "DESC", "LIMIT", "OFFSET", "COUNT", "SUM", "GROUP_CONCAT",
        "SEPARATOR", "SAMPLE", "LANG", "DATATYPE", "STR", "CONCAT",
        "SUBSTR", "REPLACE", "IN", "LANGMATCHES", "regex", "bound", "a",
        '"lit"', '"es\\caped"', "12", "1.5", ".", ",", ";", "=", "!=",
        "<", ">", "<=", ">=", "&&", "||", "!", "^", "/", "|", "+", "-",
    ]),
    max_size=30,
).map(" ".join)


@settings(max_examples=600, deadline=None, derandomize=True)
@given(st.one_of(_garbage, _sparqlish))
def test_sparql_parser_never_crashes(query):
    from rdf_spark import sparql as sq

    for entry in (
        lambda q: sq._Parser(q).query(),
        lambda q: sq._Parser(q).construct_query(),
        lambda q: sq._Parser(q).ask_query(),
        lambda q: sq._Parser(q).describe_query(),
        lambda q: sq._Parser(q).update_request(),
    ):
        try:
            entry(query)
        except sq.SparqlError:
            pass
