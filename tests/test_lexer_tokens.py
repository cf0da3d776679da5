"""Token-level conformance against the reference's hand-written lexer
tables (lex_test.go:85-398): exact (type, text) sequences, stopping at the
first EOF or error token like the reference's collect()."""

import json
import os

import pytest

from rdf_spark import lexer as lx

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

_TYPE_MAP = {
    "tokenEOF": lx.EOF, "tokenEOL": lx.EOL, "tokenError": lx.ERROR,
    "tokenIRIAbs": lx.IRI_ABS, "tokenIRIRel": lx.IRI_REL,
    "tokenBNode": lx.BNODE, "tokenLiteral": lx.LITERAL,
    "tokenLiteral3": lx.LITERAL3,
    "tokenLiteralInteger": lx.LITERAL_INTEGER,
    "tokenLiteralDouble": lx.LITERAL_DOUBLE,
    "tokenLiteralDecimal": lx.LITERAL_DECIMAL,
    "tokenLiteralBoolean": lx.LITERAL_BOOLEAN,
    "tokenLangMarker": lx.LANG_MARKER, "tokenLang": lx.LANG,
    "tokenDataTypeMarker": lx.DT_MARKER, "tokenDot": lx.DOT,
    "tokenSemicolon": lx.SEMICOLON, "tokenComma": lx.COMMA,
    "tokenRDFType": lx.RDF_TYPE, "tokenPrefix": lx.PREFIX,
    "tokenPrefixLabel": lx.PREFIX_LABEL, "tokenIRISuffix": lx.IRI_SUFFIX,
    "tokenBase": lx.BASE, "tokenSparqlBase": lx.SPARQL_BASE,
    "tokenSparqlPrefix": lx.SPARQL_PREFIX, "tokenAnonBNode": lx.ANON_BNODE,
    "tokenPropertyListStart": lx.PLIST_START,
    "tokenPropertyListEnd": lx.PLIST_END,
    "tokenCollectionStart": lx.COLL_START,
    "tokenCollectionEnd": lx.COLL_END,
}


def _load():
    with open(os.path.join(FIXDIR, "lexer.jsonl"), encoding="utf-8") as f:
        return [json.loads(line) for line in f]


def _collect(text):
    lexer = lx.Lexer(text, line_mode=False)
    out = []
    while True:
        t = lexer.next_token()
        out.append((t.typ, t.text))
        if t.typ in (lx.EOF, lx.ERROR):
            return out


@pytest.mark.parametrize("case", _load(), ids=lambda c: c["name"])
def test_lexer_tokens(case):
    got = _collect(case["input"])
    want = [(_TYPE_MAP[t], txt) for t, txt in case["tokens"]]
    # error-token text is a message; match type only for errors
    norm_got = [(ty, "" if ty in (lx.ERROR, lx.EOF, lx.DOT) else tx) for ty, tx in got]
    norm_want = [(ty, "" if ty in (lx.ERROR, lx.EOF, lx.DOT) else tx) for ty, tx in want]
    assert norm_got == norm_want
