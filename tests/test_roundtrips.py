"""Round-trip tests mirroring the reference's TestEncodeNQuads
(nq_test.go:1710-1753): decode → encode → decode equality."""

from rdf_spark import terms
from rdf_spark.parsing import parse_nquads, parse_ntriples
from rdf_spark.terms import quad_nq_line, triple_nt_line

NQ_INPUT = """<http://one.example/subject1> <http://one.example/predicate1> <http://one.example/object1> <http://example.org/graph3> . # comments here
# or on a line by themselves
_:subject1 <http://an.example/predicate1> "object1" <http://example.org/graph1> .
_:subject2 <http://an.example/predicate2> "object2" <http://example.org/graph5> .
<http://one.example/subject2> <http://one.example/predicate3> "xyz" . # use default graph
"""


def test_nquads_decode_encode_decode():
    quads = parse_nquads(NQ_INPUT)
    assert len(quads) == 4
    encoded = "".join(quad_nq_line(q) + "\n" for q in quads)
    quads2 = parse_nquads(encoded)
    assert quads == quads2


def test_ntriples_decode_encode_decode_with_escapes():
    nt = '\n'.join([
        '<http://s> <http://p> "line1\\nline2\\t end \\"q\\" and \\\\" .',
        '_:b <http://p> "\\u00e9\\U0001F600" .',
    ])
    triples = parse_ntriples(nt)
    encoded = "\n".join(triple_nt_line(t) for t in triples)
    assert parse_ntriples(encoded) == triples
    # canonical escaping: tab passes through raw, only \n \r \" \\ escaped
    assert "\\t" not in encoded and "\t" in encoded
