"""RDF term model: constants, canonical schemas, and row-level helpers.

Generalizes the reference's Term sum type (/root/reference/rdf.go:121-140)
into flat columns (kind discriminant + lexical string + datatype + lang),
per SURVEY.md §1.1/§1.4.  A triple is a plain tuple everywhere below the
DataFrame boundary:

    (s, s_kind, p, o, o_kind, o_datatype, o_lang)

and a quad adds ``graph`` / ``graph_kind``.  Kinds mirror TermType
(/root/reference/rdf.go:136-140): 0=blank, 1=iri, 2=literal.
"""

from __future__ import annotations

from rdf_spark.chars import escape_literal

KIND_BLANK = 0
KIND_IRI = 1
KIND_LITERAL = 2

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_DECIMAL = XSD + "decimal"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_FLOAT = XSD + "float"
XSD_DATETIME = XSD + "dateTime"
XSD_BYTE = XSD + "byte"
XSD_INT = XSD + "int"
RDF_LANG_STRING = RDF_NS + "langString"
RDF_XML_LITERAL = RDF_NS + "XMLLiteral"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

# Default graph label for N-Quads (mirrors /root/reference/decoder.go:89).
DEFAULT_GRAPH = "_:defaultGraph"

# Spark-side schema strings (kept as DDL so this module stays Spark-free).
TRIPLE_DDL = (
    "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
    "o_datatype string, o_lang string"
)
QUAD_DDL = TRIPLE_DDL + ", graph string, graph_kind tinyint"
TRIPLE_COLS = ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]
QUAD_COLS = TRIPLE_COLS + ["graph", "graph_kind"]

_BAD_IRI_SET = frozenset('<>"{}|^`\\')


def iri_is_valid(iri: str) -> bool:
    """NewIRI validity (/root/reference/rdf.go:224-239): non-empty, no
    control chars/space, none of <>\"{}|^`\\ ."""
    if not iri:
        return False
    for ch in iri:
        if "\x00" <= ch <= "\x20" or ch in _BAD_IRI_SET:
            return False
    return True


def iri_split(iri: str) -> tuple[str, str]:
    """Split at the last '/' or '#' (IRI.Split, /root/reference/rdf.go:208-219)."""
    for i in range(len(iri) - 1, -1, -1):
        if iri[i] in "/#":
            return iri[: i + 1], iri[i + 1 :]
    return "", ""


def lang_tag_is_valid(lang: str) -> bool:
    """NewLangLiteral tag rule (/root/reference/rdf.go:365-392): letters,
    at most one '-', digits only after the dash, no leading/trailing dash."""
    if not lang or lang[0] == "-" or lang[-1] == "-":
        return False
    after_dash = False
    for ch in lang:
        if ch.isascii() and ch.isalpha():
            continue
        if ch == "-":
            if after_dash:
                return False
            after_dash = True
            continue
        if ch.isascii() and ch.isdigit() and after_dash:
            continue
        return False
    return True


def term_nt(lex: str, kind: int, datatype: str | None = None, lang: str | None = None) -> str:
    """Canonical N-Triples serialization of one term (Term.Serialize for
    NTriples, /root/reference/rdf.go:202-204,154-156,260-284)."""
    if kind == KIND_IRI:
        return "<%s>" % lex
    if kind == KIND_BLANK:
        return lex  # stored with '_:' prefix
    if lang:
        return '"%s"@%s' % (escape_literal(lex), lang)
    if datatype and datatype != XSD_STRING:
        return '"%s"^^<%s>' % (escape_literal(lex), datatype)
    return '"%s"' % escape_literal(lex)


def triple_nt_line(t) -> str:
    """One canonical N-Triples line (Triple.Serialize, rdf.go:435-457),
    without the trailing newline."""
    s, s_kind, p, o, o_kind, o_dt, o_lang = t[:7]
    return "%s <%s> %s ." % (
        term_nt(s, s_kind),
        p,
        term_nt(o, o_kind, o_dt, o_lang),
    )


def quad_nq_line(q) -> str:
    """One canonical N-Quads line (Quad.Serialize, rdf.go:465-495)."""
    s, s_kind, p, o, o_kind, o_dt, o_lang, g, g_kind = q[:9]
    return "%s <%s> %s %s ." % (
        term_nt(s, s_kind),
        p,
        term_nt(o, o_kind, o_dt, o_lang),
        term_nt(g, g_kind),
    )
