"""Out-of-range / surrogate \\U escapes must never raise bare ValueError.

Round-1 ADVICE (high): chr() on cp>0x10FFFF raised an uncaught ValueError
that escaped every quarantine wrapper.  The reference instead writes
U+FFFD (Go WriteRune, /root/reference/lex.go:177-182 via bytes.Buffer);
we match that for literals and emit a deterministic ParseError for IRIs.
"""

import pytest

from rdf_spark import chars, parsing


def test_literal_out_of_range_escape_is_fffd():
    rows = parsing.parse_ntriples('<http://a/x> <http://a/p> "\\U00110000" .')
    assert rows[0][3] == "�"


def test_literal_surrogate_escape_is_fffd():
    rows = parsing.parse_ntriples('<http://a/x> <http://a/p> "\\uD800" .')
    assert rows[0][3] == "�"


def test_iri_out_of_range_escape_is_parse_error():
    with pytest.raises(parsing.ParseError):
        parsing.parse_ntriples('<http://a/\\U00110000> <http://a/p> "o" .')


def test_turtle_out_of_range_escape_quarantines_not_crashes():
    # end-to-end through the document parser: must yield FFFD, not raise
    rows = parsing.parse_turtle('<http://a/x> <http://a/p> "\\U0011FFFF" .')
    assert rows[0][3] == "�"


def test_unescape_numeric_boundaries():
    assert chars.unescape_numeric("\\U0010FFFF") == "\U0010ffff"
    assert chars.unescape_numeric("\\U00110000") == "�"
    assert chars.unescape_numeric("\\uD7FF") == "퟿"
    assert chars.unescape_numeric("\\uE000") == ""
    assert chars.unescape_numeric("\\uDFFF") == "�"


def test_iri_escape_validates_exact_slice():
    # A followed by extra hex chars: the escaped codepoint is 'A'
    # (first 4 digits); trailing hex stays as literal IRI body characters.
    rows = parsing.parse_ntriples('<http://a/\\u0041003E> <http://a/p> "o" .')
    assert rows[0][0] == "http://a/A003E"
