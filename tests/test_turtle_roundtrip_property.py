"""Property: ANY triple set must survive Turtle encode → parse with set
equality — including IRIs whose local names need PN_LOCAL escaping or the
full-<iri> fallback (the reference emits unparseable Turtle here; we fix
it while keeping byte-identical goldens for benign names)."""

from hypothesis import given, settings
from hypothesis import strategies as st

import pandas as pd

from rdf_spark import terms
from rdf_spark.encoders import encode_turtle_pdf
from rdf_spark.parsing import parse_turtle

_iri_chars = "abcXYZ019-._~!$&'()*+,;=:@%/?#"
iris = st.builds(
    lambda s: "http://x/" + s, st.text(_iri_chars, min_size=1, max_size=12)
)
texts = st.text(
    st.characters(codec="utf-8", blacklist_categories=("Cs",)), max_size=16
)
objects = st.one_of(
    iris.map(lambda i: (i, 1, None, None)),
    st.integers(1, 5).map(lambda i: (f"_:b{i}", 0, None, None)),
    texts.map(lambda t: (t, 2, terms.XSD_STRING, None)),
    texts.map(lambda t: (t, 2, terms.RDF_LANG_STRING, "en-US")),
    st.integers(-99, 99).map(lambda i: (str(i), 2, terms.XSD_INTEGER, None)),
    st.tuples(texts, iris).map(lambda ti: (ti[0], 2, ti[1], None)),
)
subjects = st.one_of(
    iris.map(lambda i: (i, 1)),
    st.integers(1, 3).map(lambda i: (f"_:s{i}", 0)),
)
triples = st.lists(
    st.tuples(subjects, iris, objects).map(
        lambda t: (t[0][0], t[0][1], t[1], t[2][0], t[2][1], t[2][2], t[2][3])
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=250, deadline=None)
@given(triples)
def test_turtle_encode_parse_set_roundtrip(rows):
    pdf = pd.DataFrame(rows, columns=terms.TRIPLE_COLS)
    ttl = encode_turtle_pdf(pdf)
    back = parse_turtle(ttl)
    assert sorted(set(back)) == sorted(set(map(tuple, rows)))


graphs = st.one_of(
    st.none(),
    iris.map(lambda i: (i, 1)),
    st.integers(1, 3).map(lambda i: (f"_:g{i}", 0)),
)
quads = st.lists(
    st.tuples(subjects, iris, objects, graphs).map(
        lambda t: (
            t[0][0], t[0][1], t[1], t[2][0], t[2][1], t[2][2], t[2][3],
            t[3][0] if t[3] else terms.DEFAULT_GRAPH,
            t[3][1] if t[3] else 0,
        )
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=250, deadline=None)
@given(quads)
def test_trig_encode_parse_set_roundtrip(rows):
    from rdf_spark.encoders import encode_trig_pdf
    from rdf_spark.parsing import parse_trig

    pdf = pd.DataFrame(rows, columns=terms.QUAD_COLS)
    trig = encode_trig_pdf(pdf)
    back = parse_trig(trig)
    assert sorted(set(back)) == sorted(set(map(tuple, rows)))


# --- round-5: partitioned (sharded) Turtle encode ------------------------

parts_assign = st.integers(0, 6)


@settings(max_examples=250, deadline=None)
@given(triples, st.lists(parts_assign, min_size=64, max_size=64))
def test_sharded_turtle_concat_roundtrip(rows, assign):
    """ANY partition of a triple set BY SUBJECT must concat-reparse to
    the same set: each shard is a complete canonical Turtle document;
    @prefix redeclaration rebinds; blank labels are corpus-global (never
    re-minted) so cross-shard occurrences merge correctly."""
    pdf = pd.DataFrame(rows, columns=terms.TRIPLE_COLS)
    # deterministic subject→shard map drawn by hypothesis
    subjects_list = sorted({(r[0], r[1]) for r in rows})
    shard_of = {s: assign[i % len(assign)] for i, s in enumerate(subjects_list)}
    docs = []
    for shard in sorted(set(shard_of.values())):
        part = pdf[[shard_of[(s, k)] == shard
                    for s, k in zip(pdf["s"], pdf["s_kind"])]]
        if len(part):
            docs.append(encode_turtle_pdf(part))
    back = parse_turtle("\n".join(docs))
    assert sorted(set(back)) == sorted(set(map(tuple, rows)))


def test_encode_turtle_partitioned_spark(spark):
    """The DataFrame operator end-to-end: shards of a multi-kind triple
    set concatenate (any order) into one document that re-parses to the
    identical set; bucket count does not change the parsed result."""
    from rdf_spark.encoders import encode_turtle_partitioned

    rows = []
    for i in range(60):
        s = (f"_:node{i % 7}", 0) if i % 5 == 0 else (f"http://x/s{i}", 1)
        rows.append((s[0], s[1], f"http://x/p{i % 4}",
                     f"value {i}", 2, terms.XSD_STRING, None))
        rows.append((s[0], s[1], "http://x/link",
                     f"_:node{(i + 1) % 7}", 0, None, None))
        rows.append((s[0], s[1], "http://x/n",
                     str(i), 2, terms.XSD_INTEGER, None))
    df = spark.createDataFrame(
        rows,
        "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
        "o_datatype string, o_lang string",
    )
    want = sorted(set(map(tuple, rows)))
    for n in (1, 4, 7):
        shards = encode_turtle_partitioned(df, n_buckets=n).collect()
        assert len(shards) <= n
        doc = "\n".join(r.value for r in sorted(shards, key=lambda r: r.bucket))
        assert sorted(set(parse_turtle(doc))) == want
        # reversed concatenation order parses identically (order-free)
        doc_rev = "\n".join(r.value for r in sorted(shards, key=lambda r: -r.bucket))
        assert sorted(set(parse_turtle(doc_rev))) == want
