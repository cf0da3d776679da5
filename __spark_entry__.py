"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data additions); ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL where the operator is SQL-expressible.  Column
names and rounding are aligned on both sides (the driver hashes values
order-insensitively but compares names/types exactly).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_spark import canonical, encoders, extraction, sources, terms
from rdf_spark.ops import ann, dedup
from rdf_spark.ops import text as textops

XSD_STRING = terms.XSD_STRING
XSD_INTEGER = terms.XSD_INTEGER
_XSD_DECIMAL = terms.XSD_DECIMAL
_RDF_LANG_STRING = terms.RDF_LANG_STRING


_SHIPPED_SESSIONS: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make rdf_spark importable inside executor Python workers regardless
    of the driver's cwd/PYTHONPATH (zip once, addPyFile)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    import shutil
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    zip_path = shutil.make_archive(
        os.path.join(tempfile.mkdtemp(), "rdf_spark_pkg"), "zip",
        root_dir=here, base_dir="rdf_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a synthesized input to the session's parallelism.

    The test tables are single small parquet files → one input split →
    any per-row Python stage would run on ONE core.  A real crawl input
    arrives as thousands of splits; this round-robin repartition puts the
    synthetic benchmark in the same regime.  Applied ONLY where per-row
    Python work dominates (document tokenizers, pandas UDF scans) — for
    the arrow/RE2 line parsers the extra shuffle costs more than the
    single-task parse."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# --- document/gazetteer fixtures shared by Spark and oracle sides ----------

MENTION_SURFACES = ["spark", "window", "merge", "batch", "scan"]
ALIASES = [
    ("spark", "urn:tool:spark", 0.9),
    ("window", "urn:op:window", 0.8),
    ("window", "urn:ui:window", 0.4),
    ("merge", "urn:op:merge", 0.7),
    ("batch", "urn:op:batch", 0.6),
    ("scan", "urn:op:scan", 0.85),
]


def _aliases_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ALIASES, "surface string, entity_iri string, prior double")


def _docs_as_urls(spark, sf_dir):
    return _spread(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("url"), F.col("text").alias("extracted_text")
    )


# ---------------------------------------------------------------------------
# RDF engine queries (SURVEY.md §2.1-2.4)
# ---------------------------------------------------------------------------


def q_nt_parse(spark, sf_dir):
    """S2: vectorized N-Triples decode of deterministically built lines."""
    lines = _t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("<urn:order:"), F.col("o_orderkey"), F.lit("> <urn:p:status> \""),
            F.col("o_orderstatus"), F.lit('" .'),
        ).alias("value")
    )
    tri = sources.parse_lines_df(lines, "ntriples")
    return tri.select("s", "p", "o", "o_datatype")


def q_nquads_parse(spark, sf_dir):
    """S4: N-Quads decode with graph term."""
    lines = _t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("<urn:order:"), F.col("o_orderkey"), F.lit("> <urn:p:prio> \""),
            F.col("o_orderpriority"), F.lit('" <urn:g:'), F.col("o_custkey"), F.lit("> ."),
        ).alias("value")
    )
    q = sources.parse_lines_df(lines, "nquads")
    return q.select("s", "p", "o", "graph")


def q_turtle_parse(spark, sf_dir):
    """S5: document-scoped Turtle decode (directives, pnames, 'a', ';' lists,
    lang tags, integer shorthand)."""
    docs = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("urn:doc:"), F.col("c_custkey")).alias("url"),
        F.concat(
            F.lit("@prefix ex: <urn:ex:> .\n<urn:cust:"), F.col("c_custkey"),
            F.lit('> ex:name "'), F.col("c_name"), F.lit('"@en ;\n  ex:nation '),
            F.col("c_nationkey"), F.lit(" ;\n  a ex:Customer .\n"),
        ).alias("text"),
    )
    tri = sources.parse_documents(_spread(docs), fmt="turtle", base_from_url=False)
    return tri.filter(F.col("err").isNull()).select(
        "s", "p", "o", F.col("o_kind").cast("int").alias("o_kind"), "o_datatype", "o_lang"
    )


def q_turtle_flat_parse(spark, sf_dir):
    """S5 fast path: FLAT Turtle documents ('a' sugar, numeric shorthand,
    plain statements) skip the Python tokenizer entirely via the arrow
    flat-doc path (arrow_fast.parse_turtle_docs_arrow) — differential-
    tested equivalent to the exact parser."""
    docs = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("urn:doc:"), F.col("o_orderkey")).alias("url"),
        F.concat(
            F.lit("<urn:order:"), F.col("o_orderkey"), F.lit("> a <urn:ex:Order> .\n"),
            F.lit("<urn:order:"), F.col("o_orderkey"), F.lit('> <urn:p:prio> "'),
            F.col("o_orderpriority"), F.lit('" .\n'),
            F.lit("<urn:order:"), F.col("o_orderkey"), F.lit("> <urn:p:total> "),
            F.col("o_totalprice").cast("decimal(12,2)").cast("string"), F.lit(" .\n"),
        ).alias("text"),
    )
    tri = sources.parse_documents(_spread(docs), fmt="turtle", base_from_url=False)
    return tri.filter(F.col("err").isNull()).select(
        "s", "p", "o", F.col("o_kind").cast("int").alias("o_kind"), "o_datatype"
    )


def q_trig_parse(spark, sf_dir):
    """TriG decode (EXCEEDS reference parity, rdf.go:14-22): named-graph
    blocks + default-graph statements → quad schema."""
    docs = _t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("urn:doc:"), F.col("s_suppkey")).alias("url"),
        F.concat(
            F.lit("GRAPH <urn:g:"), F.col("s_nationkey"),
            F.lit("> { <urn:sup:"), F.col("s_suppkey"), F.lit('> <urn:p:name> "'),
            F.col("s_name"), F.lit('" }\n<urn:sup:'), F.col("s_suppkey"),
            F.lit("> <urn:p:acct> "),
            F.col("s_acctbal").cast("decimal(12,2)").cast("string"), F.lit(" .\n"),
        ).alias("text"),
    )
    q = sources.parse_documents(_spread(docs), fmt="trig", base_from_url=False)
    return q.filter(F.col("err").isNull()).select(
        "s", "p", "o", F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype", "graph", F.col("graph_kind").cast("int").alias("graph_kind"),
    )


def q_jsonld_parse(spark, sf_dir):
    """JSON-LD core-subset decode (EXCEEDS reference parity): inline
    @context with compact IRIs, @type, typed scalars → quad schema."""
    docs = _t(spark, sf_dir, "part").select(
        F.concat(F.lit("urn:doc:"), F.col("p_partkey")).alias("url"),
        F.concat(
            F.lit('{"@context": {"v": "urn:v:"}, "@id": "urn:part:'),
            F.col("p_partkey"),
            F.lit('", "@type": "v:Part", "v:name": "'), F.col("p_name"),
            F.lit('", "v:size": '), F.col("p_size"), F.lit("}"),
        ).alias("text"),
    )
    q = sources.parse_documents(_spread(docs), fmt="jsonld", base_from_url=False)
    return q.filter(F.col("err").isNull()).select(
        "s", "p", "o", F.col("o_kind").cast("int").alias("o_kind"), "o_datatype"
    )


def q_rdfxml_parse(spark, sf_dir):
    """S6: RDF/XML decode (rdf:Description/about, property elements)."""
    docs = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("urn:doc:"), F.col("n_nationkey")).alias("url"),
        F.concat(
            F.lit('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
                  'xmlns:ex="http://ex.org/v#">\n<rdf:Description rdf:about="http://ex.org/nation/'),
            F.col("n_nationkey"),
            F.lit('">\n  <ex:name>'), F.col("n_name"),
            F.lit('</ex:name>\n  <ex:region rdf:resource="http://ex.org/region/'),
            F.col("n_regionkey"),
            F.lit('"/>\n</rdf:Description>\n</rdf:RDF>'),
        ).alias("text"),
    )
    tri = sources.parse_documents(_spread(docs), fmt="rdfxml", base_from_url=False)
    return tri.filter(F.col("err").isNull()).select("s", "p", "o", "o_datatype")


def q_nt_serialize(spark, sf_dir):
    """E1/T14: canonical N-Triples line serialization incl. exact escaping."""
    tri = _t(spark, sf_dir, "part").select(
        F.concat(F.lit("urn:part:"), F.col("p_partkey")).alias("s"),
        F.lit(1).cast("tinyint").alias("s_kind"),
        F.lit("urn:p:name").alias("p"),
        F.concat(F.col("p_name"), F.lit('"x\\y\n'), F.col("p_brand")).alias("o"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.lit(XSD_STRING).alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    return tri.select(F.col("s"), encoders.nt_line_col().alias("nt_line"))


def q_iri_split(spark, sf_dir):
    """C2: IRI prefix/suffix split at last '/' or '#'."""
    iri = F.concat(F.lit("http://ex.org/sup#"), F.regexp_replace("s_name", " ", "_"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", iri.alias("iri"))
    ns, local = canonical.iri_split_cols(F.col("iri"))
    return sup.select("s_suppkey", ns.alias("ns"), local.alias("local"))


def q_dedup_triples(spark, sf_dir):
    """E4: exact triple dedup over parsed lines (partial+final hash agg)."""
    # 600k synthesized lines from a single-split scan: spread so the
    # Arrow parse + partial agg run wide (1 task otherwise)
    lines = _spread(_t(spark, sf_dir, "lineitem")).select(
        F.concat(
            F.lit("<urn:order:"), F.col("l_orderkey"), F.lit("> <urn:p:flag> \""),
            F.col("l_returnflag"), F.lit('" .'),
        ).alias("value")
    )
    tri = sources.parse_lines_df(lines, "ntriples").drop("err")
    return canonical.dedup_triples(tri).select("s", "o")


def q_typed_literals(spark, sf_dir):
    """C9: lexical→typed conversion — xsd:dateTime (both layouts + a
    DateFormat-style override pattern, rdf.go:52) and xsd:byte→binary
    (rdf.go:327-328; surfaced as hex so the oracle can compare bytes)."""
    # oracle parity: DuckDB timestamps are UTC-naive; pin the session TZ so
    # date_format/to_timestamp render identically regardless of driver conf
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("lex"),
        F.date_format("o_orderdate", "MM/dd/yyyy HH:mm:ss").alias("lex_us"),
        F.col("o_orderpriority").alias("lex_bytes"),
    )
    ts = canonical.typed_object_col(terms.XSD_DATETIME)
    ts_custom = canonical.typed_object_col(
        terms.XSD_DATETIME, date_format="MM/dd/yyyy HH:mm:ss"
    )
    byte_typed = canonical.typed_object_col(terms.XSD_BYTE)
    return (
        o.withColumn("o", F.col("lex"))
        .withColumn("ts_typed", ts)
        .withColumn("o", F.col("lex_us"))
        .withColumn("ts_custom", ts_custom)
        .withColumn("o", F.col("lex_bytes"))
        .withColumn("byte_hex", F.hex(byte_typed))
        .select("o_orderkey", "lex", "ts_typed", "ts_custom", "byte_hex")
    )


def q_predicate_histogram(spark, sf_dir):
    """§2.5 aggregations: predicate histogram over parsed triples."""
    lines = _t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("<urn:order:"), F.col("o_orderkey"), F.lit("> <urn:p:prio-"),
            F.regexp_replace("o_orderpriority", "[^A-Z0-9]", "_"), F.lit("> \"x\" ."),
        ).alias("value")
    )
    tri = sources.parse_lines_df(lines, "ntriples")
    return canonical.predicate_histogram(tri).select("p", "n")


def q_namespace_histogram(spark, sf_dir):
    """E6 feeder: distinct-namespace stats over all IRI positions."""
    lines = _t(spark, sf_dir, "part").select(
        F.concat(
            F.lit("<http://ex.org/part/"), F.col("p_partkey"),
            F.lit("> <http://ex.org/v#size> <http://ex.org/size#"),
            F.col("p_size"), F.lit("> ."),
        ).alias("value")
    )
    tri = sources.parse_lines_df(lines, "ntriples")
    return canonical.namespace_histogram(tri).select("ns", "n")


def q_skolemize(spark, sf_dir):
    """C4: deterministic blank-node skolemization.  The hash itself has no
    DuckDB equivalent, so the oracle checks the structural invariants: the
    label suffix, term kinds, and that both blanks of one document share
    the same document-hash prefix."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit('_:a <urn:p:rel> _:b .\n_:b <urn:p:rel> "x" .').alias("text"),
    )
    tri = sources.parse_documents(_spread(docs), fmt="ntriples", base_from_url=False)
    sk = canonical.skolemize(tri.filter(F.col("err").isNull()))
    prefix = lambda c: F.regexp_extract(c, r"^urn:skolem:([0-9a-f]+):", 1)  # noqa: E731
    local = lambda c: F.regexp_extract(c, r"([^:]*)$", 1)  # noqa: E731
    return sk.select(
        "url",
        local(F.col("s")).alias("s_local"),
        F.when(F.col("o_kind") == 0, local(F.col("o"))).otherwise(F.col("o")).alias("o_local"),
        F.col("s_kind").cast("int").alias("s_kind"),
        F.col("o_kind").cast("int").alias("o_kind"),
        F.when(F.col("o_kind") == 0, prefix(F.col("s")) == prefix(F.col("o")))
        .otherwise(F.lit(True))
        .alias("hash_consistent"),
    )


def q_turtle_encode(spark, sf_dir):
    """E3/E5/E6: Turtle encoder round-trip — encode a small graph, reparse;
    the reparse must reproduce exactly the source projection (byte-level
    golden equality is covered in pytest).  The encode runs executor-side
    (encoders.encode_turtle_df mapInPandas) — no driver collect."""
    docs = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("urn:doc:"), F.col("n_nationkey")).alias("url"),
        F.concat(
            F.lit("<urn:nation:"), F.col("n_nationkey"), F.lit('> <urn:p:name> "'),
            F.col("n_name"), F.lit('" .'),
        ).alias("text"),
    )
    tri = sources.parse_documents(docs, fmt="ntriples", base_from_url=False).drop("url", "err")
    docs2 = encoders.encode_turtle_df(tri).select(
        F.lit("u").alias("url"), F.col("value").alias("text")
    )
    back = sources.parse_documents(docs2, fmt="turtle", base_from_url=False)
    return back.filter(F.col("err").isNull()).select("s", "p", "o")


# ---------------------------------------------------------------------------
# KG pipeline stages (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


def q_property_table(spark, sf_dir):
    """Graph accessor: subject × predicate pivot over parsed triples
    (conditional hash aggregation — ops.graph.property_table)."""
    from rdf_spark.ops import graph

    tri = q_turtle_parse(spark, sf_dir).withColumnRenamed("o_kind", "o_kind_i")
    tri = tri.withColumn("o_kind", F.col("o_kind_i").cast("tinyint"))
    pt = graph.property_table(
        tri, {"name": "urn:ex:name", "nation": "urn:ex:nation"}
    )
    return pt.select("s", "name", "nation")


def q_bgp_match(spark, sf_dir):
    """SPARQL-style basic-graph-pattern matching compiled to equi-joins
    (ops.graph.bgp_match): customers → their nation's name via a
    3-pattern BGP with two shared variables."""
    from rdf_spark.ops.graph import bgp_match

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    tri = (
        c.select(
            F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
            F.lit("rdf:type").alias("p"), F.lit("urn:ex:Customer").alias("o"),
        )
        .unionByName(c.select(
            F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
            F.lit("urn:ex:inNation").alias("p"),
            F.concat(F.lit("urn:nation:"), F.col("c_nationkey")).alias("o"),
        ))
        .unionByName(n.select(
            F.concat(F.lit("urn:nation:"), F.col("n_nationkey")).alias("s"),
            F.lit("urn:ex:name").alias("p"), F.col("n_name").alias("o"),
        ))
    )
    return bgp_match(tri, [
        ("?c", "rdf:type", "urn:ex:Customer"),
        ("?c", "urn:ex:inNation", "?n"),
        ("?n", "urn:ex:name", "?nm"),
    ])


def q_sparql_select(spark, sf_dir):
    """SPARQL SELECT subset (rdf_spark.sparql) compiled to Catalyst plans:
    3-pattern BGP + OPTIONAL (left join, exercised — some customers have
    no acctbal triple) + FILTER (string compare && negated regex) over
    the same customer/nation triple fixture as `bgp_match`."""
    from rdf_spark.sparql import sparql_select

    c = _t(spark, sf_dir, "customer")
    tri = _customer_triples(spark, sf_dir).unionByName(
        c.filter(F.col("c_acctbal") >= 0).select(
            F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
            F.lit("urn:ex:acctbal").alias("p"),
            F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("o"),
        )
    )
    return sparql_select(tri, """
        SELECT ?c ?nm ?bal WHERE {
            ?c <rdf:type> <urn:ex:Customer> .
            ?c <urn:ex:inNation> ?n .
            ?n <urn:ex:name> ?nm .
            OPTIONAL { ?c <urn:ex:acctbal> ?bal }
            FILTER(?nm >= "E" && !regex(?nm, "^IR"))
        }
    """)


def _customer_triples(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.select(
            F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
            F.lit("rdf:type").alias("p"), F.lit("urn:ex:Customer").alias("o"),
        )
        .unionByName(c.select(
            F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
            F.lit("urn:ex:inNation").alias("p"),
            F.concat(F.lit("urn:nation:"), F.col("c_nationkey")).alias("o"),
        ))
        .unionByName(n.select(
            F.concat(F.lit("urn:nation:"), F.col("n_nationkey")).alias("s"),
            F.lit("urn:ex:name").alias("p"), F.col("n_name").alias("o"),
        ))
    )


def q_sparql_agg(spark, sf_dir):
    """SPARQL GROUP BY aggregate (rdf_spark.sparql): customers per nation
    via a 3-pattern BGP + COUNT — compiles to the same partial+final
    hash aggregate a hand-written groupBy would."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?nm (COUNT(?c) AS ?n_cust) WHERE {
            ?c <rdf:type> <urn:ex:Customer> .
            ?c <urn:ex:inNation> ?n .
            ?n <urn:ex:name> ?nm
        } GROUP BY ?nm
    """)


def q_sparql_path(spark, sf_dir):
    """Anchored SPARQL property path (<p>+): transitive closure from one
    node, compiled to iterate-to-fixpoint BFS with per-round
    localCheckpoint — checked against a DuckDB WITH RECURSIVE oracle over
    a deterministic binary-tree graph (doc_id → 2·id+1, 2·id+2; depth ~8,
    so the fixpoint terminates in ~8 rounds at any scale)."""
    from rdf_spark.sparql import sparql_select

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tri = (
        d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 1).alias("o"),
        )
        .unionByName(d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 2).alias("o"),
        ))
    )
    return sparql_select(tri, "SELECT ?x WHERE { <urn:d0> <urn:child>+ ?x }")


def q_sparql_not_exists(spark, sf_dir):
    """SPARQL FILTER NOT EXISTS compiled to a left anti join (the
    canonical Spark translation, plan-asserted in tests): customers with
    no HIGH-VALUE order triple — the KG twin of TPC-H's classic
    anti-join.  The price threshold keeps the anti-join non-vacuous at
    every test scale (every customer has SOME order in this data; the
    unfiltered variant matched zero rows — a vacuous oracle)."""
    from rdf_spark.sparql import sparql_select

    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    tri = _customer_triples(spark, sf_dir).unionByName(o.select(
        F.concat(F.lit("urn:order:"), F.col("o_orderkey")).alias("s"),
        F.lit("urn:ex:bigorder_by").alias("p"),
        F.concat(F.lit("urn:cust:"), F.col("o_custkey")).alias("o"),
    ))
    return sparql_select(tri, """
        SELECT ?c WHERE {
            ?c <rdf:type> <urn:ex:Customer> .
            FILTER NOT EXISTS { ?o <urn:ex:bigorder_by> ?c }
        }
    """)


def q_sparql_bind(spark, sf_dir):
    """SPARQL BIND(expr AS ?v) + STRLEN/LCASE (round-4 usability slice):
    computed columns compiled to Catalyst withColumn expressions; a later
    FILTER consumes the BIND-introduced numeric.  The >= 9 threshold is
    selective-but-nonempty at every scale: NATION_0..9 are 8 chars (cut),
    NATION_10..24 are 9 (kept) — a lower bound would be vacuously true
    over all 25 names."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?nm ?lnm WHERE {
            ?n <urn:ex:name> ?nm .
            BIND(LCASE(?nm) AS ?lnm)
            BIND(STRLEN(?nm) AS ?len)
            FILTER(?len >= 9)
        }
    """)


def q_sparql_having(spark, sf_dir):
    """SPARQL HAVING over a GROUP BY aggregate (round-4 usability slice):
    the post-aggregation filter lands on the agg plan before projection —
    same partial+final hash aggregate as `sparql_agg`, plus one Filter."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?nm (COUNT(?c) AS ?n_cust) WHERE {
            ?c <rdf:type> <urn:ex:Customer> .
            ?c <urn:ex:inNation> ?n .
            ?n <urn:ex:name> ?nm
        } GROUP BY ?nm HAVING(?n_cust >= 5)
    """)


def _customer_meta_triples(spark, sf_dir):
    """Canonical-schema triples WITH term metadata columns (s_kind,
    o_kind, o_datatype, o_lang): customer names as literals lang-tagged
    'en' on even keys, balances as xsd:decimal typed literals, nation
    links as IRI objects — the store shape LANG()/DATATYPE() require."""
    from rdf_spark.terms import KIND_IRI, KIND_LITERAL, XSD_DECIMAL

    c = _t(spark, sf_dir, "customer")
    s = F.concat(F.lit("urn:cust:"), F.col("c_custkey"))
    ik = F.lit(KIND_IRI).cast("tinyint")
    lk = F.lit(KIND_LITERAL).cast("tinyint")
    nstr = F.lit(None).cast("string")
    name = c.select(
        s.alias("s"), ik.alias("s_kind"), F.lit("urn:ex:name").alias("p"),
        F.col("c_name").alias("o"), lk.alias("o_kind"),
        nstr.alias("o_datatype"),
        F.when(F.col("c_custkey") % 2 == 0, "en").alias("o_lang"),
    )
    bal = c.select(
        s.alias("s"), ik.alias("s_kind"), F.lit("urn:ex:bal").alias("p"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("o"),
        lk.alias("o_kind"), F.lit(XSD_DECIMAL).alias("o_datatype"),
        nstr.alias("o_lang"),
    )
    nat = c.select(
        s.alias("s"), ik.alias("s_kind"), F.lit("urn:ex:inNation").alias("p"),
        F.concat(F.lit("urn:nation:"), F.col("c_nationkey")).alias("o"),
        ik.alias("o_kind"), nstr.alias("o_datatype"), nstr.alias("o_lang"),
    )
    return name.unionByName(bal).unionByName(nat)


def q_sparql_lang(spark, sf_dir):
    """SPARQL LANG()/DATATYPE() term accessors (round-4 usability slice)
    over a canonical-metadata store: each solution row carries the tags
    of its OWN matched triple (bgp_match carry_meta=True), so the lang
    filter and the datatype projection are row-exact, not lookups."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_meta_triples(spark, sf_dir), """
        SELECT ?c ?nm ?dt WHERE {
            ?c <urn:ex:name> ?nm .
            BIND(DATATYPE(?nm) AS ?dt)
            FILTER(LANG(?nm) = "en")
        }
    """)


def q_sparql_path_seq(spark, sf_dir):
    """SPARQL path sequence (round-4): <p1>/<p2> rewritten to fresh-var
    equi-join hops (the exact SPARQL translation — both endpoints may be
    variables, unlike the closure paths)."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?c ?nm WHERE { ?c <urn:ex:inNation>/<urn:ex:name> ?nm }
    """)


def q_sparql_path_unanchored(spark, sf_dir):
    """Unanchored SPARQL property path ?a <p>+ ?b (round-5): the full
    transitive-closure pair set, compiled by iterative squaring
    (R ← R ∪ R∘R, O(log diameter) self-join rounds with per-round
    localCheckpoint — rdf_spark.sparql._closure_pairs) over the same
    deterministic binary tree as `sparql_path`; oracled against DuckDB
    WITH RECURSIVE over the identical edge set."""
    from rdf_spark.sparql import sparql_select

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tri = (
        d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 1).alias("o"),
        )
        .unionByName(d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 2).alias("o"),
        ))
    )
    return sparql_select(tri, "SELECT ?a ?b WHERE { ?a <urn:child>+ ?b }")


def q_sparql_path_in_blocks(spark, sf_dir):
    """Property-path closures INSIDE OPTIONAL and MINUS blocks (round-5
    late): the blocks compile through the same group compiler as the
    main WHERE, so `OPTIONAL { ?c <urn:child>+ ?d }` left-joins the
    closure pair table (NULL where a child has no descendants) and
    `MINUS { ?x <urn:child>/<urn:child>+ ?p }` anti-joins the ≥2-step
    reachability set (keeping only depth-0/1 parents).  Same
    deterministic binary tree as `sparql_path_unanchored`; DuckDB
    replays it with WITH RECURSIVE + LEFT JOIN + NOT IN."""
    from rdf_spark.sparql import sparql_select

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tri = (
        d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 1).alias("o"),
        )
        .unionByName(d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 2).alias("o"),
        ))
    )
    return sparql_select(tri, """
        SELECT ?p ?d WHERE {
            ?p <urn:child> ?c .
            OPTIONAL { ?c <urn:child>+ ?d }
            MINUS { ?x <urn:child>/<urn:child>+ ?p }
        }
    """)


def q_sparql_path_graph(spark, sf_dir):
    """Closure inside a GRAPH <iri> block (round-5 late): the binary
    tree's edges are split across two named graphs (even parents →
    urn:gA, odd → urn:gB) and the closure must run over urn:gA's edges
    ONLY — a closure evaluated over the union graph (the natural bug)
    reaches through odd-parent hops and produces extra pairs the
    DuckDB WITH RECURSIVE oracle (filtered edge CTE) rejects."""
    from rdf_spark.sparql import sparql_select

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    graph = F.when(F.col("doc_id") % 2 == 0, "urn:gA").otherwise("urn:gB")
    quads = (
        d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 1).alias("o"),
            graph.alias("graph"),
        )
        .unionByName(d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 2).alias("o"),
            graph.alias("graph"),
        ))
    )
    return sparql_select(quads, """
        SELECT ?a ?b WHERE { GRAPH <urn:gA> { ?a <urn:child>+ ?b } }
    """)


def q_sparql_path_zero_or_one(spark, sf_dir):
    """SPARQL ZeroOrOnePath `?a <p>? ?b` (round-5, §18.4): the DIRECT
    edge pairs unioned with the zero-length identity over every graph
    node — set semantics like the closures but NO fixpoint ever runs
    (rdf_spark.sparql._path_edges short-circuits the '?' modifier to
    `edges.distinct() ∪ identity`).  Same deterministic binary tree as
    `sparql_path_unanchored`; the oracle replays edges UNION node
    identity in plain SQL — no recursion needed, which is exactly the
    point of '?' vs '+'."""
    from rdf_spark.sparql import sparql_select

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tri = (
        d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 1).alias("o"),
        )
        .unionByName(d.select(
            F.concat(F.lit("urn:d"), F.col("doc_id")).alias("s"),
            F.lit("urn:child").alias("p"),
            F.concat(F.lit("urn:d"), F.col("doc_id") * 2 + 2).alias("o"),
        ))
    )
    return sparql_select(tri, "SELECT ?a ?b WHERE { ?a <urn:child>? ?b }")


def q_sparql_path_grouped(spark, sf_dir):
    """Grouped-path precedence (round-5): `<p1>/<p2>|<p3>` parses as
    `(<p1>/<p2>)|<p3>` per SPARQL 1.1 ('/' binds tighter than '|') —
    orders reach a nation through placed_by/inNation while customers
    reach it directly; the oracle is the UNION ALL of both derivations
    (path alternation is a bag union, §18.4)."""
    from rdf_spark.sparql import sparql_select

    o = _t(spark, sf_dir, "orders")
    tri = _customer_triples(spark, sf_dir).unionByName(o.select(
        F.concat(F.lit("urn:order:"), F.col("o_orderkey")).alias("s"),
        F.lit("urn:ex:placed_by").alias("p"),
        F.concat(F.lit("urn:cust:"), F.col("o_custkey")).alias("o"),
    ))
    return sparql_select(tri, """
        SELECT ?x ?n WHERE {
            ?x <urn:ex:placed_by>/<urn:ex:inNation>|<urn:ex:inNation> ?n
        }
    """)


def q_sparql_hash(spark, sf_dir):
    """SPARQL hash builtins (round-5, §17.4.4): MD5/SHA256 of the UTF-8
    lexical form, lowercase hex, composable — the MD5 feeds a
    STRSTARTS filter (~1/8 selective at every scale) while both digests
    project.  DuckDB's md5()/sha256() are byte-identical oracles;
    SHA1/384/512 have no DuckDB twin and are unit-tested against
    hashlib instead."""
    from rdf_spark.sparql import sparql_select

    c = _t(spark, sf_dir, "customer")
    tri = c.select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
        F.lit("urn:ex:name").alias("p"),
        F.col("c_name").alias("o"),
    )
    return sparql_select(tri, """
        SELECT ?c ?nm ?md ?sh WHERE {
            ?c <urn:ex:name> ?nm .
            BIND(MD5(?nm) AS ?md)
            BIND(SHA256(?nm) AS ?sh)
            FILTER(STRSTARTS(?md, "a") || STRSTARTS(?md, "b"))
        }
    """)


def q_sparql_sameterm(spark, sf_dir):
    """sameTerm (round-5, §17.4.1.8): exact RDF term identity over
    lexical + kind + datatype + lang via the carried metadata columns.
    Predicates urn:ex:a / urn:ex:b share every customer's name lexical,
    but b is lang-tagged 'en' on custkey%3=0 — plain '=' would keep all
    customers, sameTerm drops exactly the lang-mismatched third (the
    oracle replays that arithmetic closed-form)."""
    from rdf_spark.sparql import sparql_select
    from rdf_spark.terms import KIND_IRI, KIND_LITERAL

    c = _t(spark, sf_dir, "customer")
    s = F.concat(F.lit("urn:cust:"), F.col("c_custkey"))
    ik = F.lit(KIND_IRI).cast("tinyint")
    lk = F.lit(KIND_LITERAL).cast("tinyint")
    nstr = F.lit(None).cast("string")
    a = c.select(
        s.alias("s"), ik.alias("s_kind"), F.lit("urn:ex:a").alias("p"),
        F.col("c_name").alias("o"), lk.alias("o_kind"),
        nstr.alias("o_datatype"), nstr.alias("o_lang"),
    )
    b = c.select(
        s.alias("s"), ik.alias("s_kind"), F.lit("urn:ex:b").alias("p"),
        F.col("c_name").alias("o"), lk.alias("o_kind"),
        nstr.alias("o_datatype"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("en"))
        .otherwise(nstr).alias("o_lang"),
    )
    return sparql_select(a.unionByName(b), """
        SELECT ?c ?v WHERE {
            ?c <urn:ex:a> ?v . ?c <urn:ex:b> ?w .
            FILTER(SAMETERM(?v, ?w))
        }
    """)


def q_sparql_datetime(spark, sf_dir):
    """SPARQL date/time accessors (round-5, §17.4.5): xsd:dateTime
    lexicals minted from the events stream (second-truncated — SECONDS
    is integral here), all six components projected and MINUTES feeding
    a ~25%-selective filter (hour-based filters are scale-fragile: at
    sf0.1 the first 2000 events all land before 18:00).  Both engines
    re-parse the SAME truncated lexical, so every component is integer-
    exact — no rounding needed."""
    from rdf_spark.sparql import sparql_select

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    tri = e.select(
        F.concat(F.lit("urn:ev:"), F.col("event_id")).alias("s"),
        F.lit("urn:ex:at").alias("p"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("o"),
    )
    return sparql_select(tri, """
        SELECT ?e ?y ?mo ?d ?h ?mi ?sec WHERE {
            ?e <urn:ex:at> ?t .
            BIND(YEAR(?t) AS ?y)     BIND(MONTH(?t) AS ?mo)
            BIND(DAY(?t) AS ?d)      BIND(HOURS(?t) AS ?h)
            BIND(MINUTES(?t) AS ?mi) BIND(SECONDS(?t) AS ?sec)
            FILTER(MINUTES(?t) >= 45)
        }
    """)


def q_sparql_describe_var(spark, sf_dir):
    """DESCRIBE ?var WHERE (round-5): the variable's distinct bindings
    semi-join the triple table on subject and object — customer 1's
    nation is described by its name triple plus every inNation edge
    pointing at it.  No collect: the binding set stays a DataFrame."""
    from rdf_spark.sparql import sparql_describe

    return sparql_describe(_customer_triples(spark, sf_dir), """
        DESCRIBE ?n WHERE { <urn:cust:1> <urn:ex:inNation> ?n }
    """)


def q_sparql_arith(spark, sf_dir):
    """SPARQL numeric arithmetic (round-5): BIND(?b * 2 + 1) with
    standard precedence, consumed by a selective FILTER.  Both engines
    derive the score from the same 2-dp decimal lexical via correctly-
    rounded double conversion, then one exact ×2 scaling and one exact
    +1 — bit-identical IEEE on both sides, no rounding needed."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_meta_triples(spark, sf_dir), """
        SELECT ?c ?score WHERE {
            ?c <urn:ex:bal> ?b .
            BIND(?b * 2 + 1 AS ?score)
            FILTER(?score > 5000)
        }
    """)


def q_sparql_builtins(spark, sf_dir):
    """SPARQL builtin pack (round-5): term-kind tests (isLiteral /
    isNumeric over carried datatype metadata), numeric ABS/FLOOR/CEIL/
    ROUND (XPath ties-toward-+inf via floor(x+0.5), identical in both
    engines), and STRAFTER.  The ABS filter is genuinely selective
    (|bal| > 4000 keeps ~half the customers at every scale); the
    balances are 2-dp decimal lexicals so the double conversion is
    correctly-rounded and bit-identical on both sides."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_meta_triples(spark, sf_dir), """
        SELECT ?c ?idpart ?whole ?up ?rnd WHERE {
            ?c <urn:ex:name> ?nm .
            ?c <urn:ex:bal> ?b .
            FILTER(isLiteral(?nm) && !isNumeric(?nm) && isNumeric(?b)
                   && ABS(?b) > 4000)
            BIND(STRAFTER(?nm, "#") AS ?idpart)
            BIND(FLOOR(?b) AS ?whole)
            BIND(CEIL(?b) AS ?up)
            BIND(ROUND(?b) AS ?rnd)
        }
    """)


def q_sparql_subquery(spark, sf_dir):
    """SPARQL subquery (round-5): `{ SELECT ... GROUP BY ... }` inside
    WHERE — the inner aggregate (customers per nation) evaluates
    independently, then joins the outer pattern on its projected
    variable, annotating every customer with its nation's size.  Oracled
    against the equivalent derived-table join."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?c ?k WHERE {
            ?c <urn:ex:inNation> ?n .
            { SELECT ?n (COUNT(?x) AS ?k) WHERE { ?x <urn:ex:inNation> ?n }
              GROUP BY ?n }
        }
    """)


def q_sparql_update(spark, sf_dir):
    """SPARQL 1.1 Update subset (round-5): a ';'-chained request —
    DELETE DATA removes nation 0's name, then a DELETE/INSERT modify
    renames the NATION_1* name triples to urn:ex:label (delete anti-join
    + insert union-dedup, both from the pre-operation solutions).
    Returns the surviving name/label triples; oracled closed-form from
    the nation table."""
    from rdf_spark.sparql import sparql_update

    updated = sparql_update(_customer_triples(spark, sf_dir), """
        DELETE DATA { <urn:nation:0> <urn:ex:name> "NATION_0" } ;
        DELETE { ?n <urn:ex:name> ?nm } INSERT { ?n <urn:ex:label> ?nm }
        WHERE { ?n <urn:ex:name> ?nm FILTER(strstarts(?nm, "NATION_1")) }
    """)
    return updated.filter(
        F.col("p").isin("urn:ex:name", "urn:ex:label")
    ).select("s", "p", "o")


def q_sparql_group_expr(spark, sf_dir):
    """GROUP BY (expr AS ?v) group condition (§19.8, round-5): customers
    grouped by the 8-char nation-name prefix — 'NATION_1' pools nation 1
    WITH nations 10-19, so the expression key is semantically
    load-bearing, not a rename.  Same partial+final hash aggregate."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?init (COUNT(?c) AS ?n) WHERE {
            ?c <urn:ex:inNation> ?nn . ?nn <urn:ex:name> ?nm
        } GROUP BY (SUBSTR(?nm, 1, 8) AS ?init)
    """)


def q_sparql_dataset(spark, sf_dir):
    """SPARQL dataset clause (§13.2, round-5): the quad store keys
    customer names by market-segment graph and carries default-graph
    (NULL) nation rows as noise; FROM NAMED restricts GRAPH ?g to two
    segments (the scan filter is a pushed IN list) and the default-graph
    noise must stay invisible.  Counts per graph against a closed-form
    GROUP BY oracle."""
    from rdf_spark.sparql import sparql_select

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    quads = c.select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
        F.lit("urn:ex:name").alias("p"),
        F.col("c_name").alias("o"),
        F.concat(F.lit("urn:seg:"), F.col("c_mktsegment")).alias("graph"),
    ).unionByName(n.select(
        F.concat(F.lit("urn:nation:"), F.col("n_nationkey")).alias("s"),
        F.lit("urn:ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit(None).cast("string").alias("graph"),
    ))
    return sparql_select(quads, """
        SELECT ?g (COUNT(?c) AS ?n)
        FROM NAMED <urn:seg:AUTOMOBILE> FROM NAMED <urn:seg:HOUSEHOLD>
        WHERE { GRAPH ?g { ?c <urn:ex:name> ?nm } }
        GROUP BY ?g
    """)


def q_sparql_describe_cbd(spark, sf_dir):
    """DESCRIBE with Concise-Bounded-Description closure (round-5):
    each customer anchors a bnode chain cust→_:m→(_:n→leaf on even
    keys); odd customers' leaf rows exist but are UNREACHABLE, so the
    closure — not the symmetric seed — decides inclusion.  Two fixpoint
    rounds of left-semi joins with localCheckpoint truncation; oracle
    replays the reachable set closed-form."""
    from rdf_spark.sparql import sparql_describe

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    k = F.col("c_custkey")
    tri = (
        c.select(
            F.concat(F.lit("urn:cust:"), k).alias("s"),
            F.lit("urn:ex:meta").alias("p"),
            F.concat(F.lit("_:m"), k).alias("o"),
        )
        .unionByName(c.filter(k % 2 == 0).select(
            F.concat(F.lit("_:m"), k).alias("s"),
            F.lit("urn:ex:d2").alias("p"),
            F.concat(F.lit("_:n"), k).alias("o"),
        ))
        .unionByName(c.select(  # planted for ALL keys; odd unreachable
            F.concat(F.lit("_:n"), k).alias("s"),
            F.lit("urn:ex:leaf").alias("p"),
            F.concat(F.lit("v"), k).alias("o"),
        ))
    )
    return sparql_describe(
        tri, "DESCRIBE ?c WHERE { ?c <urn:ex:meta> ?m }", cbd=True
    )


def q_sparql_minus(spark, sf_dir):
    """SPARQL MINUS (round-4): anti join on the shared variable —
    customers not in nation 0.  Distinguished from NOT EXISTS by the
    disjoint-domain no-op rule (tested in tests/test_sparql.py)."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?c WHERE {
            ?c <rdf:type> <urn:ex:Customer> .
            MINUS { ?c <urn:ex:inNation> <urn:nation:0> }
        }
    """)


def q_sparql_graph(spark, sf_dir):
    """SPARQL GRAPH <iri> over a quad store (round-4): patterns become
    quad patterns matched against the graph column — the graph constant
    is a pushed-down scan filter, not a post-join filter."""
    from rdf_spark.sparql import sparql_select

    c = _t(spark, sf_dir, "customer")
    quads = c.select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
        F.lit("urn:ex:name").alias("p"),
        F.col("c_name").alias("o"),
        F.concat(F.lit("urn:seg:"), F.col("c_mktsegment")).alias("graph"),
    )
    return sparql_select(quads, """
        SELECT ?c ?nm WHERE { GRAPH <urn:seg:BUILDING> { ?c <urn:ex:name> ?nm } }
    """)


def q_sparql_funcs(spark, sf_dir):
    """SPARQL function pack (round-4): GROUP_CONCAT (sorted →
    deterministic), COUNT(DISTINCT), and SUBSTR+IN in FILTER — one
    aggregate query exercising the whole slice against a string_agg/
    COUNT(DISTINCT) oracle."""
    from rdf_spark.sparql import sparql_select

    c = _t(spark, sf_dir, "customer")
    tri = _customer_triples(spark, sf_dir).unionByName(c.select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey")).alias("s"),
        F.lit("urn:ex:cname").alias("p"), F.col("c_name").alias("o"),
    ))
    return sparql_select(tri, """
        SELECT ?nm (GROUP_CONCAT(?cn; SEPARATOR="|") AS ?names)
               (COUNT(DISTINCT ?c) AS ?n_cust)
        WHERE {
            ?c <urn:ex:cname> ?cn .
            ?c <urn:ex:inNation> ?nt .
            ?nt <urn:ex:name> ?nm .
            FILTER(SUBSTR(?nm, 8, 1) IN ("0", "1", "2"))
        } GROUP BY ?nm
    """)


def q_sparql_term_ctors(spark, sf_dir):
    """SPARQL term constructors (round-5 late, §17.4.2): IRI/STRDT/
    STRLANG over a PLAIN (s,p,o) store — the BIND site synthesizes the
    constructed term's kind/datatype/lang metadata, so STR/DATATYPE/
    LANG/isIRI work on the constructed vars without store meta columns.
    STRLEN filter keeps the 9-char nation names (selective-but-nonempty
    at all scales: NATION_0..9 are 8 chars, NATION_10..24 are 9).
    Oracle rebuilds all three constructed columns closed-form."""
    from rdf_spark.sparql import sparql_select

    n = _t(spark, sf_dir, "nation")
    tri = n.select(
        F.concat(F.lit("urn:nation:"), F.col("n_nationkey")).alias("s"),
        F.lit("urn:ex:name").alias("p"), F.col("n_name").alias("o"),
    )
    return sparql_select(tri, """
        SELECT ?nm ?iri ?dt ?lg WHERE {
            ?nt <urn:ex:name> ?nm .
            BIND(IRI(CONCAT("urn:geo:", ?nm)) AS ?g)
            BIND(STRDT(?nm, <urn:t:Name>) AS ?d)
            BIND(STRLANG(?nm, "en-GB") AS ?s)
            BIND(STR(?g) AS ?iri)
            BIND(DATATYPE(?d) AS ?dt)
            BIND(LANG(?s) AS ?lg)
            FILTER(isIRI(?g) && STRLEN(?nm) >= 9)
        }
    """)


def q_sparql_order_expr(spark, sf_dir):
    """ORDER BY over expressions (round-5 late, §15.1 OrderCondition):
    DESC(STRLEN(?nm)) with a plain-var tiebreak and LIMIT — the LIMIT
    makes the sort load-bearing in the value hash (a wrong order is a
    different top-5 SET, not just a different row order).  The 9-char
    names (NATION_10..24) win the length sort at every scale."""
    from rdf_spark.sparql import sparql_select

    n = _t(spark, sf_dir, "nation")
    tri = n.select(
        F.concat(F.lit("urn:nation:"), F.col("n_nationkey")).alias("s"),
        F.lit("urn:ex:name").alias("p"), F.col("n_name").alias("o"),
    )
    return sparql_select(tri, """
        SELECT ?nm WHERE { ?nt <urn:ex:name> ?nm }
        ORDER BY DESC(STRLEN(?nm)) ?nm LIMIT 5
    """)


def q_boilerplate_lines(spark, sf_dir):
    """Cross-corpus line-level boilerplate removal (ops.text.remove_
    boilerplate_lines, the CCNet/RefinedWeb cleaning step): a footer line
    planted into every document must be stripped corpus-wide; organic
    cross-document duplicate lines fall to the same threshold.  Hash-
    keyed shuffles; oracle replays the exact semantics over line text."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nCOMMON FOOTER (c) spark-graft"),
        ).alias("text"),
    )
    return textops.remove_boilerplate_lines(planted, min_docs=5)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (ops.contamination.ngram_contamination):
    8-gram collisions between the corpus and a held-out eval set (docs
    0-4) — eval grams broadcast, corpus side stays a narrow scan+explode;
    finds the eval docs themselves plus their organic near-copies."""
    from rdf_spark.ops.contamination import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    # single parquet file = ONE split: spread the corpus side before the
    # heavy JVM gram chain (the html_links lesson); the tiny eval side
    # stays unspread
    return ngram_contamination(
        _spread(d), d.filter(F.col("doc_id") < 5), n=8
    )


def q_url_normalize(spark, sf_dir):
    """URL canonicalization (ops.url.normalize_url): four messy-URL
    shapes planted per doc_id — mixed-case scheme/host + default port +
    unsorted query + tracking params + fragment; bare default-port
    origin; non-default port with a tracking-only query; unsorted
    params.  The oracle emits the expected canonical string CLOSED-FORM
    per shape (not a regex replay), so any rule regression —
    lowercasing, port stripping, param sorting/dropping, fragment
    removal, empty-path slash — breaks the match.  Row-local, zero
    shuffle at any corpus size."""
    from rdf_spark.ops import url as urlops

    d = _t(spark, sf_dir, "documents")
    dom = F.concat(F.lit("d"), F.col("doc_id") % 7, F.lit(".example.org"))
    k = F.col("doc_id") % 4
    url = (
        F.when(k == 0, F.concat(
            F.lit("HTTPS://"), F.upper(dom), F.lit(":443/Page/"),
            F.col("doc_id"), F.lit("?b=2&utm_source=x&a="),
            F.col("doc_id") % 3, F.lit("#frag")))
        .when(k == 1, F.concat(F.lit("http://"), dom, F.lit(":80")))
        .when(k == 2, F.concat(
            F.lit("http://"), dom, F.lit(":8080/p/"), F.col("doc_id"),
            F.lit("?utm_only=1")))
        .otherwise(F.concat(F.lit("https://"), dom, F.lit("/p?z=1&y=2&x=3")))
    )
    planted = d.select("doc_id", url.alias("url"))
    return urlops.normalize_url(planted).select("doc_id", "url_norm")


def q_unicode_normalize(spark, sf_dir):
    """Unicode NFC normalization (ops.text.unicode_normalize): three
    planted suffix shapes per doc_id — a DECOMPOSED e+COMBINING-ACUTE
    (must compose to the precomposed é), an already-NFC é (idempotence),
    and pure ASCII (exercises the batch fast-skip).  Oracle is DuckDB's
    utf8proc nfc_normalize over the identical planted input, so a
    regression in form handling or the ASCII-skip mask breaks the byte
    hash.  Arrow-batched pandas_udf, row-local, zero shuffle."""
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id") % 3
    suffix = (
        F.when(k == 0, F.lit(" cafe" + chr(0x0301)))  # decomposed
        .when(k == 1, F.lit(" caf" + chr(0xE9)))      # precomposed
        .otherwise(F.lit(" plain"))
    )
    planted = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return textops.unicode_normalize(planted).select("doc_id", "text_nfc")


def q_warc_parse(spark, sf_dir):
    """WARC source reader (rdf_spark.warc): every document is wrapped
    in a spec-exact WARC response record (version line, CRLF framing,
    byte Content-Length, embedded HTTP response); records are grouped
    into 8 multi-record 'files' each led by a warcinfo record, then
    parse_warc explodes them back — exercising record framing, the
    default type filter (warcinfo must vanish), HTTP status/charset
    split, and text decode.  Oracle is CLOSED-FORM (the planted fields
    straight from documents), not a replay of the parser.  The reader
    itself is a narrow binaryFile→mapInPandas stage, one task per file."""
    from rdf_spark import warc as warcmod

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\n"
              "Content-Type: text/plain; charset=utf-8\r\n\r\n"),
        F.col("text"),
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
        did,
        F.lit(">\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
              "WARC-Target-URI: https://example.org/doc/"),
        did,
        F.lit("\r\nContent-Type: application/http;msgtype=response\r\n"
              "Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    grouped = (
        d.select(
            (F.col("doc_id") % 8).alias("g"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
    )
    winfo = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:winfo:"),
        F.col("g").cast("string"),
        F.lit(">\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"),
    )
    files = grouped.select(
        F.concat(F.lit("mem://"), F.col("g").cast("string")).alias("path"),
        F.encode(
            F.concat(
                winfo,
                F.array_join(F.transform("ss", lambda s: s["rec"]), ""),
            ),
            "UTF-8",
        ).alias("content"),
    )
    parsed = warcmod.parse_warc(files)  # default types=('response',)
    return parsed.select(
        F.regexp_extract("target_uri", r"doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("http_status"),
        F.col("text"),
    )


def q_wet_pipeline(spark, sf_dir):
    """WET shard → KG links end-to-end (BASELINE.json's throughput metric
    is defined over exactly this input): every document's text is
    wrapped in a spec-exact WET ``conversion`` record (text/plain
    payload, NO HTTP envelope), grouped into 8 warcinfo-led 'files',
    then parse_warc(types=conversion) → pages_from_wet (html null, text
    = payload verbatim) → the fused extract/parse/link stage, whose
    WET route must use the provided text AS the extraction (no
    re-squash, no invariant row).  Oracle is CLOSED-FORM: a doc links
    to a surface's argmax-prior entity iff the surface occurs in the
    raw text — any framing, type-filter, decode, or extraction-route
    defect breaks the match."""
    from rdf_spark import extraction, warc as warcmod

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: <urn:doc:"),
        did,
        F.lit(">\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
              "WARC-Target-URI: https://example.org/doc/"),
        did,
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(F.col("text")).cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
        F.lit("\r\n\r\n"),
    )
    grouped = (
        d.select(
            (F.col("doc_id") % 8).alias("g"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
    )
    winfo = F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: "
                  "<urn:winfo:w>\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
    files = grouped.select(
        F.concat(F.lit("mem://wet/"), F.col("g").cast("string")).alias("path"),
        F.encode(
            F.concat(winfo, F.array_join(F.transform("ss", lambda s: s["rec"]), "")),
            "UTF-8",
        ).alias("content"),
    )
    pages = warcmod.pages_from_wet(
        warcmod.parse_warc(_spread(files), types=("conversion",))
    )
    tagged = extraction.fused_extract_parse_link(pages, ALIASES)
    return tagged.filter(F.col("err").isNull()).select(
        F.col("url"), F.col("o").alias("entity")
    )


def q_html_structured(spark, sf_dir):
    """HTML structured-data islands → triples (ops.html): every page
    carries TWO ``application/ld+json`` islands (mixed quote styles;
    combined per page into one array-document) and one ``text/turtle``
    block, all routed through the existing document parsers.  The
    oracle reconstructs the four expected triples per customer
    CLOSED-FORM, so island detection, per-format combination, JSON-LD
    typing (@type → rdf:type, integer → xsd:integer) and the turtle
    route are all load-bearing.  Island extraction is a single JVM
    projection; only the parse runs in the Arrow batch stage."""
    from rdf_spark.ops import html as htmlops

    c = _t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://h"), F.col("c_custkey") % 5,
        F.lit(".example.org/c/"), F.col("c_custkey"),
    )
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'
              '{"@context":{"v":"urn:v:"},"@id":"urn:cust:'),
        F.col("c_custkey"),
        F.lit('","@type":"v:Customer","v:name":"'), F.col("c_name"),
        F.lit("\"}</script><script type='application/ld+json'>"
              '{"@id":"urn:acct:'),
        F.col("c_custkey"),
        F.lit('","urn:v:nation":'), F.col("c_nationkey"),
        F.lit('}</script></head><body><script type="text/turtle"><urn:cust:'),
        F.col("c_custkey"),
        F.lit('> <urn:v:segment> "'), F.col("c_mktsegment"),
        F.lit('" .</script></body></html>'),
    )
    pages = c.select(url.alias("url"), html.alias("html"))
    out = htmlops.parse_html_structured(_spread(pages))
    return out.filter(F.col("err").isNull()).select(
        "url", "s", "p", "o",
        F.col("o_kind").cast("int").alias("o_kind"), "o_datatype", "fmt",
    )


def q_html_links(spark, sf_dir):
    """Host link graph from anchor tags (ops.html.host_link_graph):
    each order page plants a messy absolute anchor (upper-case host,
    default :443 port, tracking param), a same-host self link (must be
    dropped), and a protocol-relative CDN link.  The oracle aggregates
    the expected canonical host pairs closed-form, so href extraction,
    RFC-3986-lite resolution, URL canonicalization, and self-edge
    filtering all participate.  Pure JVM end-to-end; the only shuffle
    moves host-pair keys into a map-side-combinable count."""
    from rdf_spark.ops import html as htmlops

    o = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://s"), F.col("o_custkey") % 7,
        F.lit(".shop.example/ord/"), F.col("o_orderkey"),
    )
    html = F.concat(
        F.lit('<p><a href="https://S'), (F.col("o_custkey") + 1) % 7,
        F.lit('.SHOP.example:443/x?utm_s=1&a=2">p</a>'),
        F.lit('<a href="/ord/'), F.col("o_orderkey"), F.lit('">self</a>'),
        F.lit('<a href="//cdn'), F.col("o_orderkey") % 3,
        F.lit('.shop.example/l.js">c</a></p>'),
    )
    pages = _spread(o.select(url.alias("url"), html.alias("html")))
    return htmlops.host_link_graph(pages)


def q_html_charset(spark, sf_dir):
    """Charset-sniffing HTML decode (ops.html.decode_html): each
    document becomes a binary page in one of four encodings — utf-8
    with meta, iso-8859-1 meta whose bytes carry the cp1252-only €
    (the WHATWG latin-1→windows-1252 upgrade is load-bearing), a
    UTF-16LE BOM page (BOM must be consumed, not emitted), and a bare
    utf-8 default.  The oracle replays the expected decoded strings
    closed-form from the source text.  One Arrow-batched pandas_udf
    projection, zero shuffle."""
    from rdf_spark.ops import html as htmlops

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.pmod(F.col("doc_id"), F.lit(4))
    body = F.substring(F.col("text"), 1, 40)
    html = (
        F.when(m == 0, F.encode(F.concat(
            F.lit('<meta charset="utf-8"><p>'), body, F.lit(" café</p>")), "UTF-8"))
        .when(m == 1, F.encode(F.concat(
            F.lit('<meta charset="iso-8859-1"><p>'), body,
            F.lit(" \u0080é</p>")), "ISO-8859-1"))
        .when(m == 2, F.encode(F.concat(
            F.lit("\ufeff<p>"), body, F.lit(" ☃</p>")), "UTF-16LE"))
        .otherwise(F.encode(F.concat(
            F.lit("<p>"), body, F.lit(" ✓</p>")), "UTF-8"))
    )
    pages = _spread(d.select("doc_id", html.alias("html")))
    return htmlops.decode_html(pages).select(
        "doc_id", F.col("html_text").alias("decoded"))


def q_page_meta(spark, sf_dir):
    """Head-metadata extraction (ops.html.extract_page_meta): titles
    with entities + fold whitespace, descriptions in BOTH meta attribute
    orders (alternating by order key), canonical links only on every
    third order (absent → NULL, and relative → resolved against the
    page url).  Closed-form oracle from the orders table.  Pure JVM
    projection — zero Python, zero shuffle."""
    from rdf_spark.ops import html as htmlops

    o = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://s"), F.col("o_custkey") % 7,
        F.lit(".shop.example/ord/"), F.col("o_orderkey"),
    )
    desc = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(F.lit('<meta name="description" content="status '),
                 F.col("o_orderstatus"), F.lit('">')),
    ).otherwise(
        F.concat(F.lit('<meta content="status '), F.col("o_orderstatus"),
                 F.lit('" name="description">')),
    )
    canon = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(F.lit('<link rel="canonical" href="/canon/'),
                 F.col("o_orderkey"), F.lit('">')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<title> Order &amp;\n "), F.col("o_orderkey"),
        F.lit(" </title>"), desc, canon, F.lit("<p>body</p>"),
    )
    pages = _spread(o.select(url.alias("url"), html.alias("html")))
    return htmlops.extract_page_meta(pages)


def q_embedding_decontaminate(spark, sf_dir):
    """Semantic decontamination (ops.contamination.embedding_
    decontaminate): 16-basis synthetic embeddings give exactly three
    analytic cosines against the eval vector e0 — 0.894 (d=0, dropped
    at threshold 0.8), 0.447 (d=15, kept), 0 (rest, kept) — with wide
    float32 margins, so the survivor set is closed-form.  Eval matrix
    broadcast once; corpus side is one numpy matmul per Arrow batch,
    zero shuffle."""
    from rdf_spark.ops.contamination import embedding_decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.pmod(F.col("doc_id"), F.lit(16))
    vec = F.array(*[
        F.when(d == k, (d + F.lit(2.0)))
        .when(d == F.lit((k - 1) % 16), (d + F.lit(2.0)) / 2)
        .otherwise(F.lit(0.0)).cast("float")
        for k in range(16)
    ])
    corpus = _spread(docs.select("doc_id", vec.alias("embedding")))
    e0 = [0.0] * 16
    e0[0] = 3.0
    eval_set = spark.createDataFrame(
        [(0, e0)], "eval_id long, embedding array<float>")
    return embedding_decontaminate(
        corpus, eval_set, threshold=0.8).select("doc_id")


def q_weighted_repeat(spark, sf_dir):
    """Training-mix fractional upsampling (ops.sample.weighted_repeat):
    three synthetic domains at rates 2.25 / 0.5 / 1.0 (default) — two
    full copies plus an md5-gated quarter, a coin-flip single, and a
    pass-through.  The oracle replays the exact md5 thresholds and
    expands copies via UNNEST(range(n)).  Row-local CASE + explode:
    no shuffle, no Python."""
    from rdf_spark.ops.sample import weighted_repeat

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("d"), F.pmod(F.col("doc_id"), F.lit(3)))
        .alias("domain"),
    )
    out = weighted_repeat(d, {"d0": 2.25, "d1": 0.5}, strata_col="domain",
                          default_rate=1.0)
    return out.select("doc_id", F.col("copy").cast("int").alias("copy"))


def q_feed_parse(spark, sf_dir):
    """Feed parsing (rdf_spark.feeds): every order becomes an RSS item
    or an Atom entry (alternating by key parity) — the Atom side plants
    a rel=self plumbing link BEFORE the real alternate link, so link
    selection is load-bearing; published/guid/summary replay closed-form
    from the order row.  Arrow-batched per-feed documents, narrow."""
    from rdf_spark.feeds import parse_feeds

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.concat(F.lit("https://f.example/feed/"), k)
    link = F.concat(F.lit("https://f.example/o/"), k)
    pub = F.col("o_orderdate").cast("string")
    summ = F.concat(F.lit("status "), F.col("o_orderstatus"))
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><item><title>Order '), k,
        F.lit("</title><link>"), link, F.lit("</link><pubDate>"), pub,
        F.lit("</pubDate><guid>g"), k, F.lit("</guid><description>"),
        summ, F.lit("</description></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
              "<title>Order "), k,
        F.lit('</title><link rel="self" href="https://f.example/self"/>'
              '<link href="'), link,
        F.lit('"/><published>'), pub, F.lit("</published><id>a"), k,
        F.lit("</id><summary>"), summ,
        F.lit("</summary></entry></feed>"),
    )
    docs = _spread(o.select(
        url.alias("url"), F.when(k % 2 == 0, rss).otherwise(atom).alias("xml")
    ))
    return parse_feeds(docs).select(
        "url", "kind", "title", "link", "published", "entry_id", "summary")


def q_html_tables(spark, sf_dir):
    """HTML table mining (ops.content.extract_tables): every order page
    carries a 2×2 header+data table plus a single-cell second table and
    one STRAY td outside any table (must be dropped); cells replay
    closed-form from the order row.  Arrow-batched walk, zero shuffle,
    scalar-typed output (pivot-ready in plain SQL)."""
    from rdf_spark.ops.content import extract_tables

    o = _t(spark, sf_dir, "orders")
    url = F.concat(F.lit("https://t.example/o/"), F.col("o_orderkey"))
    html = F.concat(
        F.lit("<td>stray</td><table><tr><th>status</th><th>price</th></tr>"
              "<tr><td>"),
        F.col("o_orderstatus"),
        F.lit("</td><td>"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.lit("</td></tr></table><table><tr><td>key "),
        F.col("o_orderkey"),
        F.lit("</td></tr></table>"),
    )
    pages = _spread(o.select(url.alias("url"), html.alias("html")))
    return extract_tables(pages)


def q_canonical_dedup(spark, sf_dir):
    """Canonical-URL mirror dedup (ops.url.dedup_by_canonical): orders
    bucket into mirror groups of ~4 via their declared
    <link rel=canonical>; the authoritative copy (url == canonical) wins
    when the bucket contains it (sparse TPC-H order keys leave some
    buckets headless → md5-rank fallback, replayed verbatim in SQL).
    One shuffle on the canonical key into a map-side WindowGroupLimit."""
    from rdf_spark.ops.url import dedup_by_canonical

    o = _t(spark, sf_dir, "orders")
    url = F.concat(F.lit("https://d.example/o/"), F.col("o_orderkey"))
    canon = F.concat(
        F.lit("https://d.example/o/"),
        F.col("o_orderkey") - F.col("o_orderkey") % 4,
    )
    html = F.concat(F.lit('<link rel="canonical" href="'), canon,
                    F.lit('"><p>body</p>'))
    pages = _spread(o.select(url.alias("url"), html.alias("html")))
    return dedup_by_canonical(pages).select("url")


def q_main_text(spark, sf_dir):
    """Main-content extraction (ops.content.extract_main_text): every
    document is wrapped in full page chrome — nav links, breadcrumb
    div, hinted sidebar/comments copies of the SAME text (so a sloppy
    extractor double-counts), a linky related-posts block, and a
    footer.  Odd docs also carry a short headline that only survives
    via the neighbour-promotion rule.  The oracle states the expected
    main text closed-form from the source text.  One Arrow-batched
    mapInPandas projection, zero shuffle."""
    from rdf_spark.ops.content import extract_main_text

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.pmod(F.col("doc_id"), F.lit(2))
    head = F.when(
        m == 1,
        F.concat(F.lit("<h2>Doc "), F.col("doc_id"), F.lit("</h2>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
              '<div class="breadcrumb"><a href="/">Home</a> &gt; x</div>'),
        head,
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit('<div class="sidebar"><p>'), F.col("text"),
        F.lit('</p></div><div id="comments"><p>'), F.col("text"),
        F.lit('</p></div><p><a href="/x">read</a> <a href="/y">more</a>'
              '</p><footer><p>Copyright notice long enough to be a '
              "block.</p></footer>"),
    )
    pages = _spread(d.select("doc_id", html.alias("html")))
    return extract_main_text(pages).select("doc_id", "main_text")


def q_host_cap(spark, sf_dir):
    """Per-key quota cap (ops.sample.cap_per_key): at most 4 documents
    per synthetic host bucket, survivor set decided by the md5 rank so
    it is identical at any parallelism AND replayable verbatim in SQL.
    The row_number<=k filter compiles to a map-side WindowGroupLimit —
    a hot host's excess rows are truncated before the shuffle (the same
    skew guard as the LSH bucket pre-cap)."""
    from rdf_spark.ops.sample import cap_per_key

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(7)).alias("host")
    )
    return cap_per_key(d, "host", 4).select("doc_id", "host")


def q_sparql_agg_expr(spark, sf_dir):
    """SPARQL select expressions in aggregate queries (§18.2.4,
    round-5): a group-key expression (CONCAT over ?nm), an
    aggregate-alias expression (?n_cust * 2 — exact small-int double),
    and a chained expression alias (?dbl + 1) — all computed
    post-aggregation.  Same partial+final hash-aggregate plan as
    `sparql_agg`; the projections are row-local additions."""
    from rdf_spark.sparql import sparql_select

    return sparql_select(_customer_triples(spark, sf_dir), """
        SELECT ?nm (COUNT(?c) AS ?n_cust) (?n_cust * 2 AS ?dbl)
               (?dbl + 1 AS ?dblp) (CONCAT(?nm, "#") AS ?tag)
        WHERE {
            ?c <rdf:type> <urn:ex:Customer> .
            ?c <urn:ex:inNation> ?n .
            ?n <urn:ex:name> ?nm
        } GROUP BY ?nm
    """)


def q_sitemap_parse(spark, sf_dir):
    """Sitemap XML → URL seed rows (rdf_spark.sitemap): one urlset per
    part with a fully-attributed entry (lastmod/changefreq/priority)
    and a bare-loc entry, so field extraction, float priority parsing,
    and loc-less-entry dropping are load-bearing.  The oracle replays
    both rows closed-form (priority via decimal-string cast — parsing
    is correctly rounded in both engines).  Arrow-batched mapInPandas,
    narrow, no shuffle."""
    from rdf_spark import sitemap as smmod

    p = _t(spark, sf_dir, "part")
    day = F.lpad((F.col("p_partkey") % 28 + 1).cast("string"), 2, "0")
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>https://p"), F.col("p_partkey") % 4,
        F.lit(".example/parts/"), F.col("p_partkey"),
        F.lit("</loc><lastmod>2026-01-"), day,
        F.lit("</lastmod><changefreq>weekly</changefreq><priority>0."),
        F.col("p_partkey") % 10,
        F.lit("</priority></url><url><loc>https://p"), F.col("p_partkey") % 4,
        F.lit(".example/parts/"), F.col("p_partkey"),
        F.lit("/specs</loc></url><url><lastmod>dropped</lastmod></url>"
              "</urlset>"),
    )
    docs = p.select(
        F.concat(
            F.lit("https://p"), F.col("p_partkey") % 4,
            F.lit(".example/sitemap-"), F.col("p_partkey"), F.lit(".xml"),
        ).alias("url"),
        xml.alias("xml"),
    )
    out = smmod.parse_sitemaps(_spread(docs))
    return out.filter(F.col("err").isNull()).select(
        "url", "kind", "loc", "lastmod", "changefreq", "priority"
    )


def q_html_rdfa(spark, sf_dir):
    """RDFa Lite → RDF (rdf_spark.rdfa): every part page carries a
    vocab-scoped Product with a lang-tagged text property, a
    resolved-href IRI property, a meta content literal, and a CHAINED
    property+typeof Brand node (``_:ra1``) — so vocabulary scoping,
    xml:lang, per-element value rules, and chaining are each
    load-bearing.  Oracle reconstructs all seven triples closed-form.
    Arrow-batched mapInPandas walk — narrow, no shuffle."""
    from rdf_spark import rdfa as rdfamod

    p = _t(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://p"), F.col("p_partkey") % 4,
        F.lit(".example/parts/"), F.col("p_partkey"),
    )
    html = F.concat(
        F.lit('<html><body vocab="http://schema.org/">'
              '<div typeof="Product" about="urn:part:'),
        F.col("p_partkey"),
        F.lit('"><span property="name" xml:lang="en">'), F.col("p_name"),
        F.lit('</span><a property="url" href="/p/'), F.col("p_partkey"),
        F.lit('">x</a><meta property="size" content="'), F.col("p_size"),
        F.lit('"><div property="brand" typeof="Brand">'
              '<span property="name">'), F.col("p_brand"),
        F.lit("</span></div></div></body></html>"),
    )
    pages = p.select(url.alias("url"), html.alias("html"))
    out = rdfamod.parse_rdfa(_spread(pages))
    return out.filter(F.col("err").isNull()).select(
        "url", "s", "p", "o",
        F.col("o_kind").cast("int").alias("o_kind"), "o_datatype", "o_lang",
    )


def q_robots_gate(spark, sf_dir):
    """robots.txt politeness gate (ops.robots.robots_filter): hosts
    h0..h24 (from nation) publish rules — Disallow /private/, a longer
    Allow /private/pub/, and a wildcard-anchored Disallow /*.pdf$ —
    while order pages land on hosts h0..h29 with four path shapes, so
    longest-match precedence, the $ anchor, case-blind host matching,
    and the missing-robots default (hosts 25..29) are all load-bearing.
    The oracle states the RFC 9309 decision closed-form per shape.
    Rules parse once per host; the decision is a host join + JVM
    max(struct) — no broadcast of the rule table, no driver state."""
    from rdf_spark.ops import robots as robmod

    n = _t(spark, sf_dir, "nation")
    robots = n.select(
        F.concat(F.lit("h"), F.col("n_nationkey"), F.lit(".example")).alias("host"),
        F.lit("User-agent: *\nDisallow: /private/\n"
              "Allow: /private/pub/\nDisallow: /*.pdf$\n").alias("body"),
    )
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4
    path = (
        F.when(k == 0, F.concat(F.lit("/pub/"), F.col("o_orderkey")))
        .when(k == 1, F.concat(F.lit("/private/"), F.col("o_orderkey")))
        .when(k == 2, F.concat(F.lit("/private/pub/"), F.col("o_orderkey")))
        .otherwise(F.concat(F.lit("/files/"), F.col("o_orderkey"), F.lit(".pdf")))
    )
    pages = _spread(o.select(
        F.concat(
            F.lit("https://H"), F.col("o_custkey") % 30, F.lit(".example"), path
        ).alias("url")
    ))
    return robmod.robots_filter(pages, robots).select("url", "crawl_allowed")


def q_anchor_priors(spark, sf_dir):
    """Anchor-text link priors (ops.html.anchor_link_priors): each
    order page links surface 'entity {custkey%5}' to a target whose
    host varies by orderkey parity, carries a tracking param, and
    upper-cases its host — so extraction, resolution, canonicalization
    (param drop + host lowercase), pair counting, and the
    within-surface prior window are all load-bearing.  The oracle
    replays the count/prior algebra closed-form (single IEEE division
    of exact ints — bit-identical across engines)."""
    from rdf_spark.ops import html as htmlops

    o = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://a"), F.col("o_custkey") % 3,
        F.lit(".example/o/"), F.col("o_orderkey"),
    )
    html = F.concat(
        F.lit('<a href="https://T'), F.col("o_orderkey") % 2,
        F.lit(".example/e/"), F.col("o_custkey") % 5,
        F.lit('?utm_x=1">entity '), F.col("o_custkey") % 5, F.lit("</a>"),
    )
    pages = _spread(o.select(url.alias("url"), html.alias("html")))
    return htmlops.anchor_link_priors(pages)


def q_entity_disambiguation(spark, sf_dir):
    """Context-coherence entity disambiguation
    (extraction.disambiguate_mentions): every nation k gets one
    unambiguous surface NATION_k → urn:nation:k (prior 0.9) and one
    ambiguous surface AMB_k with a popular sense urn:ent:k:pop (0.6)
    and a contextual sense urn:ent:k:ctx (0.35) related to the nation
    entity.  Customers with c_custkey%5≠0 mention BOTH surfaces, so the
    unambiguous nation context flips AMB_k to the low-prior :ctx sense
    (0.35·ln2·(1+1) > 0.6·ln2); the %5=0 customers mention only AMB_k —
    no context, the prior wins and :pop survives.  The oracle replays
    the winner per branch closed-form (scores rounded to 6 dp: ln may
    differ 1 ulp between engines, the rounding absorbs it — CLAUDE.md
    reproducible-numerics pattern, floats injected via repr CAST)."""
    from rdf_spark.extraction import disambiguate_mentions

    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    nat_ent = F.concat(F.lit("urn:nation:"), F.col("n_nationkey"))
    aliases = (
        n.select(
            F.concat(F.lit("NATION_"), F.col("n_nationkey")).alias("surface"),
            nat_ent.alias("entity_iri"), F.lit(0.9).alias("prior"))
        .unionByName(n.select(
            F.concat(F.lit("AMB_"), F.col("n_nationkey")).alias("surface"),
            F.concat(F.lit("urn:ent:"), F.col("n_nationkey"),
                     F.lit(":pop")).alias("entity_iri"),
            F.lit(0.6).alias("prior")))
        .unionByName(n.select(
            F.concat(F.lit("AMB_"), F.col("n_nationkey")).alias("surface"),
            F.concat(F.lit("urn:ent:"), F.col("n_nationkey"),
                     F.lit(":ctx")).alias("entity_iri"),
            F.lit(0.35).alias("prior")))
    )
    rel = n.select(
        F.concat(F.lit("urn:ent:"), F.col("n_nationkey"),
                 F.lit(":ctx")).alias("entity_a"),
        nat_ent.alias("entity_b"),
    )
    url = F.concat(F.lit("urn:doc:"), F.col("c_custkey"))
    mentions = (
        c.filter(F.col("c_custkey") % 5 != 0).select(
            url.alias("url"),
            F.concat(F.lit("NATION_"), F.col("c_nationkey")).alias("surface"),
            (F.lit(1) + F.col("c_custkey") % 3).cast("long").alias("n_hits"))
        .unionByName(c.select(
            url.alias("url"),
            F.concat(F.lit("AMB_"), F.col("c_nationkey")).alias("surface"),
            F.lit(1).cast("long").alias("n_hits")))
    )
    out = disambiguate_mentions(mentions, aliases, rel, coherence_weight=1.0)
    return out.select(
        "url", "surface", "entity_iri", "n_hits", "prior", "coherence",
        F.round("score", 6).alias("score"),
    )


def q_html_microdata(spark, sf_dir):
    """Microdata → RDF (rdf_spark.microdata): every supplier page
    carries an itemscope/itemtype/itemid Organization with a text
    property (nested-tag stripping), a relative-href IRI property
    (urljoin against the page url), and an UNTYPED nested address item
    (vocabulary inheritance + ``_:md1`` blank minting).  The oracle
    reconstructs all five triples closed-form, so node identity, the
    vocabulary rule, per-element value extraction, and resolution are
    each load-bearing.  Arrow-batched mapInPandas walk — narrow, no
    shuffle."""
    from rdf_spark import microdata as mdmod

    sup = _t(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("https://md"), F.col("s_nationkey"),
        F.lit(".example.net/s/"), F.col("s_suppkey"),
    )
    html = F.concat(
        F.lit('<html><body><div itemscope '
              'itemtype="http://schema.org/Organization" itemid="urn:sup:'),
        F.col("s_suppkey"),
        F.lit('"><span itemprop="name">'), F.col("s_name"),
        F.lit('</span><a itemprop="url" href="/profile/'), F.col("s_suppkey"),
        F.lit('">p</a><div itemprop="address" itemscope>'
              '<span itemprop="addressCountry">nation-'), F.col("s_nationkey"),
        F.lit("</span></div></div></body></html>"),
    )
    pages = sup.select(url.alias("url"), html.alias("html"))
    out = mdmod.parse_microdata(_spread(pages))
    return out.filter(F.col("err").isNull()).select(
        "url", "s", "p", "o",
        F.col("o_kind").cast("int").alias("o_kind"), "o_datatype",
    )


def q_pii_redact(spark, sf_dir):
    """PII scrub (ops.text.redact_pii): emails/IPs/phones planted into
    every document are replaced with typed placeholders; per-category
    counts audit the scrub.  Pure JVM regexes shared verbatim with the
    oracle (the Java/RE2-common subset); the planted phone number
    clears the 9-digit minimum at every doc_id, so all three categories
    are non-vacuous at every scale."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com on 10.0."),
            F.pmod(F.col("doc_id"), F.lit(200)),
            F.lit(".7 or +49151123"), F.col("doc_id"),
        ).alias("text"),
    )
    return textops.redact_pii(planted)


def q_pack_sequences(spark, sf_dir):
    """Deterministic concat-then-chop sequence packing (ops.pack): each
    document's (shard, seq_id, seq_offset) slot in fixed-budget training
    sequences — one per-shard running-sum window, no global sort, byte-
    identical under any partitioning."""
    from rdf_spark.ops.pack import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, budget=512, n_shards=8)


def q_mention_count(spark, sf_dir):
    docs = _docs_as_urls(spark, sf_dir)
    m = extraction.detect_mentions(docs, _aliases_df(spark))
    return m.select("url", "surface", "n_hits")


def q_entity_link(spark, sf_dir):
    docs = _docs_as_urls(spark, sf_dir)
    m = extraction.detect_mentions(docs, _aliases_df(spark))
    links = extraction.link_entities(m, _aliases_df(spark))
    return links.select("url", "surface", "entity_iri", F.round("score", 6).alias("score"))


def q_pipeline_pr(spark, sf_dir):
    """Headline metric: triple P/R of the full pipeline vs the exact
    deterministic oracle — must be identically 1.0/1.0 (BASELINE.md)."""
    from rdf_spark import datagen, pipeline, scoring

    n = 300
    got, _ = pipeline.build_shard_triples(datagen.pages(spark, n), datagen.aliases(spark))
    s = scoring.pr_score(got, datagen.expected_triples(spark, n))
    return spark.createDataFrame(
        [(round(s.precision, 6), round(s.recall, 6))],
        "precision double, recall double",
    )


def q_kg_pipeline(spark, sf_dir):
    """Flagship end-to-end, fully SQL-oracled: pages built from the
    customer table (html with an embedded Turtle block + prose mention) →
    fused extract/parse/link → skolemize → validate → dedup.  The skolem
    hash itself is not SQL-expressible, so blank nodes are projected to
    their ':bN' locals plus a hash-consistency boolean (same device as
    q_skolemize); every other column is reconstructed exactly by the
    DuckDB oracle.  ~1/41 pages carry a malformed RDF block — those
    contribute only link triples (quarantine contract)."""
    from rdf_spark import pipeline
    from rdf_spark.canonical import SKOLEM_PREFIX

    c = _t(spark, sf_dir, "customer")
    surf = F.array(*[F.lit(s) for s in MENTION_SURFACES])
    surface = F.element_at(surf, (F.pmod(F.col("c_custkey"), F.lit(5)) + 1).cast("int"))
    prose = F.concat(F.lit("Doc about "), surface, F.lit(" engines."))
    rating = F.concat(F.col("c_nationkey").cast("string"), F.lit(".5"))
    turtle_ok = F.concat(
        F.lit('@prefix ex: <urn:ex:> .\n<#c> a ex:Customer ;\n  ex:name "'),
        F.col("c_name"),
        F.lit('" ;\n  ex:rating '), rating,
        F.lit(' ;\n  ex:addr [ ex:nation "'), F.col("c_nationkey").cast("string"),
        F.lit('"@en ] .\n'),
    )
    broken = F.pmod(F.col("c_custkey"), F.lit(41)) == 0
    turtle = F.when(broken, F.lit("@prefix broken .\n<oops")).otherwise(turtle_ok)
    html = F.concat(
        F.lit('<script type="text/turtle">\n'), turtle,
        F.lit("</script><p>"), prose, F.lit("</p>"),
    )
    pages = _spread(c.select(
        F.concat(F.lit("https://kg.test/c/"), F.col("c_custkey")).alias("url"),
        F.encode(html, "utf-8").alias("html"),
        prose.alias("text"),
    ))
    final, _ = pipeline.build_shard_triples(pages, _aliases_df(spark))

    sk_local = lambda col: F.regexp_extract(col, r"^urn:skolem:[0-9a-f]+:(.*)$", 1)  # noqa: E731
    sk_prefix = lambda col: F.regexp_extract(col, r"^urn:skolem:([0-9a-f]+):", 1)  # noqa: E731
    expected_hash = F.lower(F.hex(F.xxhash64(F.col("url"))))
    is_sk = lambda col: col.startswith(SKOLEM_PREFIX)  # noqa: E731
    s_proj = F.when((F.col("s_kind") == 0) & is_sk(F.col("s")), sk_local(F.col("s"))).otherwise(F.col("s"))
    o_proj = F.when((F.col("o_kind") == 0) & is_sk(F.col("o")), sk_local(F.col("o"))).otherwise(F.col("o"))
    hash_ok = (
        F.when(F.col("s_kind") == 0, sk_prefix(F.col("s")) == expected_hash).otherwise(F.lit(True))
        & F.when(F.col("o_kind") == 0, sk_prefix(F.col("o")) == expected_hash).otherwise(F.lit(True))
    )
    return final.select(
        "url",
        s_proj.alias("s"),
        F.col("s_kind").cast("int").alias("s_kind"),
        "p",
        o_proj.alias("o"),
        F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype",
        "o_lang",
        hash_ok.alias("hash_ok"),
    )


# ---------------------------------------------------------------------------
# Training-data operators
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents")).select("fp", "rep_id", "n_docs")


def q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", textops.fingerprint_col(F.col("text")).alias("fingerprint"))


def q_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textops.token_count_col(F.col("text")).cast("long").alias("n_ws_tokens"),
        textops.bpe_token_count_col(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def q_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = textops.quality_features(d)
    return out.select(
        "doc_id",
        F.col("q_chars").cast("long").alias("q_chars"),
        F.col("q_tokens").cast("long").alias("q_tokens"),
        "q_punct_ratio", "q_stopword_ratio", "q_score",
    )


def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", textops.lang_id_col(F.col("text")).alias("lang_guess"))


def q_lang_id_ngram(spark, sf_dir):
    """Character-trigram language-ID (pure JVM regexp counts + argmax)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", textops.lang_id_ngram_col(F.col("text")).alias("lang_guess")
    )


def q_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    ids = d.select(F.col("doc_id").alias("a"))
    cand = ids.crossJoin(d.select(F.col("doc_id").alias("b"))).filter(F.col("a") < F.col("b"))
    j = dedup.jaccard_verify(cand, d, threshold=0.0, ngram=1)
    return j.select("a", "b", "jaccard")


def q_span_dedup(spark, sf_dir):
    """Exact substring (duplicate-SPAN) removal — ops.dedup.
    remove_duplicate_spans, the Lee-et-al ExactSubstr step: a 5-token
    passage planted into every doc_id%4==0 document must be removed
    everywhere EXCEPT its globally-first occurrence (doc 0).  Filler
    tokens are doc-unique, so any window touching filler cannot repeat
    — the planted window is the ONLY duplicated gram and the oracle
    reconstructs every output text closed-form.  Plan: posexplode +
    per-doc sliding-window hash + keeper min-struct aggregate; no
    Python, no driver state."""
    from rdf_spark.ops.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")

    def tok(p):
        return F.concat(F.lit(p), did)

    head = F.concat_ws(" ", tok("a"), tok("b"), tok("c"))
    tail = F.concat_ws(" ", tok("d"), tok("e"), tok("f"), tok("g"), tok("h"))
    text = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat_ws(" ", head, F.lit("P0 P1 P2 P3 P4"), tail),
    ).otherwise(F.concat_ws(" ", head, tail))
    corpus = d.select("doc_id", text.alias("text"))
    return remove_duplicate_spans(corpus, ngram=5).select(
        "doc_id", "dedup_text", "n_removed_tokens"
    )


def q_minhash_near_dup(spark, sf_dir):
    """MinHash+LSH near-dup, self-verifying: exact-duplicate rows are
    planted (doc_id+1000000), and the query returns the planted pairs the
    full signature→band→candidate→verify path recovered.  Exact dups have
    identical signatures, so LSH recall on them is guaranteed 1.0 — the
    oracle is simply the planted set with jaccard 1.0.  (Organic-pair
    recall is covered by pytest on planted NEAR-duplicates.)"""
    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    pairs = dedup.minhash_near_duplicates(d.unionByName(dup), threshold=0.9)
    planted = pairs.filter((F.col("a") < 20) & (F.col("b") - F.col("a") == 1000000))
    return planted.select("a", "b", "jaccard")


def q_winnow_overlap(spark, sf_dir):
    """Winnowing (rolling-hash) fingerprint overlap, self-verifying:
    identical planted docs share their entire fingerprint set, so every
    planted pair must surface with containment exactly 1.0 (organic
    partial overlaps are covered by pytest)."""
    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    pairs = dedup.winnow_overlap_pairs(d.unionByName(dup), threshold=0.99)
    planted = pairs.filter((F.col("a") < 20) & (F.col("b") - F.col("a") == 1000000))
    return planted.select("a", "b", "containment")


def q_simhash(spark, sf_dir):
    """SimHash, self-verifying via two algebraic invariants: the 64-bit
    signature is a bag-of-words statistic, so (1) reversing token order
    and (2) doubling the document (every token count ×2, acc → 2·acc,
    same signs) must both leave it bit-identical.  Hamming distances are
    computed JVM-side (bit_count(xor)); the oracle is all-zeros."""
    import pandas as pd

    from rdf_spark.ops.dedup import simhash_col_pd

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")

    def run(it):
        for pdf in it:
            t = pdf["text"].fillna("")
            rev = t.str.split().map(lambda x: " ".join(reversed(x)))
            dbl = t + " " + t
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "sig": simhash_col_pd(t),
                "sig_rev": simhash_col_pd(rev),
                "sig_dbl": simhash_col_pd(dbl),
            })

    sigs = d.mapInPandas(run, "doc_id long, sig long, sig_rev long, sig_dbl long")
    return sigs.select(
        "doc_id",
        F.bit_count(F.col("sig").bitwiseXOR(F.col("sig_rev"))).cast("int").alias("hamming_rev"),
        F.bit_count(F.col("sig").bitwiseXOR(F.col("sig_dbl"))).cast("int").alias("hamming_dbl"),
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: pair graph → connected components (iterative
    min-label propagation) → (doc_id, cluster=min id).  The edge set is
    deterministic (planted duplicate pairs + an explicit chain, so the
    oracle can state the expected components in closed form; LSH pair
    RECOVERY is verified separately by minhash_near_dup)."""
    from rdf_spark.ops.graph import connected_components

    d = _t(spark, sf_dir, "documents").select("doc_id")
    planted = d.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 1000000).alias("b")
    )
    chain = d.filter((F.col("doc_id") >= 40) & (F.col("doc_id") <= 48)).select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b")
    )
    comps = connected_components(planted.unionByName(chain), "a", "b")
    nodes = d.select(F.col("doc_id").alias("node")).unionByName(
        d.filter(F.col("doc_id") < 20).select((F.col("doc_id") + 1000000).alias("node"))
    )
    out = nodes.join(comps.withColumnRenamed("node", "n"), nodes.node == F.col("n"), "left")
    return out.select(
        "node", F.coalesce("comp", F.col("node")).alias("cluster")
    )


def q_embedding_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann.brute_force_topk(emb, queries, k=3)
    return out.select("query_id", "vec_id", "sim", "rank")


def q_ivf_topk(spark, sf_dir):
    """IVF ANN (k-means inverted lists + probe + exact rerank),
    self-verifying: identical planted vectors always land in the same
    inverted list (deterministic argmax on identical inputs), so each
    query's top-2 must be itself (rank 1, ties broken by id) and its
    planted twin (rank 2), both at cosine exactly 1.0."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    both = emb.unionByName(dup)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann.ivf_topk(both, queries, dim=64, k=2, n_lists=16, n_probe=2)
    return out.select("query_id", "vec_id", "sim", "rank")


def q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ ANN (round-5: coarse lists + product-quantized ADC
    shortlist + exact rerank), self-verifying like ivf_topk: identical
    planted vectors land in the same inverted list AND get identical
    m-byte PQ codes, hence identical ADC scores — the (id-tiebroken)
    shortlist must contain both, so each query's top-2 after the exact
    rerank is itself and its twin at cosine exactly 1.0."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    both = emb.unionByName(dup)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann.ivf_pq_topk(
        both, queries, dim=64, k=2, n_lists=16, n_probe=2, m=8,
        shortlist=256,
    )
    return out.select("query_id", "vec_id", "sim", "rank")


def q_embedding_near_dup(spark, sf_dir):
    """LSH-bucketed cosine near-dup, self-verifying: identical embeddings
    are planted (vec_id+1000000); identical vectors always share every
    hyperplane bucket, so the bucketed path must recover each planted
    pair with cosine exactly 1.0 — the oracle is the planted set."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    pairs = ann.embedding_near_duplicates(emb.unionByName(dup), dim=64, threshold=0.999)
    planted = pairs.filter((F.col("a") < 10) & (F.col("b") - F.col("a") == 1000000))
    return planted.select("a", "b", "sim")


# ---------------------------------------------------------------------------
# General engine (joins/aggs/windows — §2.5 "ours to supply")
# ---------------------------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    agg = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    j = agg.join(F.broadcast(c), agg.o_custkey == c.c_custkey)
    w = Window.orderBy(F.desc("total"), F.asc("o_custkey"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(F.col("o_custkey").alias("custkey"), "c_name", "total", F.col("rk"))
    )


def q_events_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("session_id", F.sum("new_sess").over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_asof_join(spark, sf_dir):
    """Distributed as-of join (ops.temporal.asof_join, round-5): every
    event attaches the latest same-user snapshot (events with
    event_id % 7 == 0) at-or-before its timestamp — the sorted-merge
    union+window shape (one shuffle on user_id, never a per-key range
    explosion).  The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN``
    (inequality ``e.ts >= s.ts``, ties matched) — an independent
    engine's implementation of the same semantics, not a replay.  Lag
    emitted as exact integer microseconds (unix_micros/epoch_us) so no
    float seam exists; ~8% of events precede their user's first
    snapshot at every scale (non-vacuous null arm)."""
    from rdf_spark.ops.temporal import asof_join

    e = _t(spark, sf_dir, "events")
    snaps = e.filter(F.col("event_id") % 7 == 0).select(
        "user_id",
        "ts",
        F.col("event_id").alias("snap_id"),
        F.col("value").alias("snap_value"),
    )
    joined = asof_join(e.select("event_id", "user_id", "ts"), snaps,
                       on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        "snap_id",
        "snap_value",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_r").cast("timestamp"))
        ).alias("lag_us"),
    )


def q_range_join(spark, sf_dir):
    """Binned interval-containment join (ops.temporal.range_join,
    round-5): events where event_id % 11 == 0 open a same-user window
    of (event_id % 7 + 1) minutes; every event inside a window joins it.
    Intervals explode over 10-minute bins, points map to ONE bin, and
    the match is a plain equi-join on (user_id, bin) + residual filter —
    never the BroadcastNestedLoop a raw BETWEEN theta-join plans.
    Timestamps as exact integer micros on both sides (no float seam);
    oracle is DuckDB's plain BETWEEN join (independent spelling, not a
    replay).  92/914/9138 matches at the three scales."""
    from rdf_spark.ops.temporal import range_join

    e = _t(spark, sf_dir, "events")

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    pts = e.select("event_id", "user_id", us("ts").alias("x"))
    iv = e.filter(F.col("event_id") % 11 == 0).select(
        "user_id",
        us("ts").alias("w_lo"),
        (us("ts") + (F.col("event_id") % 7 + 1) * 60_000_000).alias("w_hi"),
        F.col("event_id").alias("win_id"),
    )
    out = range_join(pts, iv, "x", "w_lo", "w_hi", on="user_id",
                     bin_width=600e6)
    return out.select(
        "event_id",
        "user_id",
        "win_id",
        (F.col("x") - F.col("w_lo")).alias("off_us"),
    )


def q_repetition_filter(spark, sf_dir):
    """Gopher-style within-doc repetition signals (ops.text
    .repetition_features): duplicate-line/paragraph/token fractions +
    mean word length + keep flag — pure JVM array expressions, zero
    shuffle, zero Python."""
    from rdf_spark.ops.text import repetition_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = repetition_features(d)
    return out.select(
        "doc_id",
        F.col("rep_lines").cast("long").alias("rep_lines"),
        "rep_dup_line_frac", "rep_dup_para_frac", "rep_dup_token_frac",
        "rep_mean_word_len", "rep_keep",
    )


def q_deterministic_sample(spark, sf_dir):
    """Reproducible training-mix sampling (ops.sample): keep a row iff
    md5(key) < per-stratum hex threshold — a row-local scan-stage
    predicate selecting the SAME rows at any parallelism/partitioning
    (unlike df.sample, whose output changes with the split layout)."""
    from rdf_spark.ops.sample import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d, {"en": 1.0, "de": 0.5, "fr": 0.25}, strata_col="lang",
        key_col="doc_id", default_rate=0.1,
    )
    return out.select("doc_id", "lang")


def q_corpus_curate(spark, sf_dir):
    """End-to-end corpus curation audit (rdf_spark.curate): lang allow-list
    → quality floor → repetition filter → exact dedup (among survivors,
    keep-smallest-id) → MinHash near-dup clustering (round-5 stage) →
    deterministic sample; returns every doc with its drop_reason (null =
    kept).  Exact duplicates are planted (doc_id + 1000000 copies of the
    first 20 docs); NEAR-duplicates are the corpus's own datagen plants —
    docs whose text is another doc's text plus a repeated ' dup' suffix.
    The oracle reproduces the near-dup stage exactly: candidate pairs via
    the suffix rule, the operator's unigram-jaccard≥0.95 verify in closed
    form (suffix sets differ by at most the token 'dup'), then recursive
    min-label connected components among the exact-dedup survivors.  LSH
    banding recall on these near-identical shingle sets is deterministic
    and verified by the gate at all three scales (plus the
    minhash_near_dup planted contract)."""
    from rdf_spark import curate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    planted = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    rep = curate.curate_report(
        d.unionByName(planted), langs=("en", "de"), min_quality=0.7,
        sample_rate=0.8, near_dup=dict(threshold=0.95),
    )
    return rep.select("doc_id", "drop_reason")


def q_domain_stats(spark, sf_dir):
    """Per-domain corpus analytics (north rule: domain-skewed web data):
    doc counts, token mass, mean quality per source domain — one
    map-side-combined aggregation over scan-stage JVM features."""
    from rdf_spark.ops.text import quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    f = quality_features(d)
    # mean quality via an EXACT decimal sum (q_score is 6-dp already):
    # double summation is order-dependent across partitionings/engines,
    # decimal summation is not — the final division is one deterministic
    # IEEE op on identical inputs, so the oracle matches bit-for-bit.
    return f.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("q_tokens").cast("long")).alias("total_tokens"),
        F.round(
            F.sum(F.col("q_score").cast("decimal(12,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_quality"),
        F.countDistinct("lang").alias("n_langs"),
    )


def _hits_sql(n_iter: int = 2) -> str:
    """DuckDB replay of ops.graph.hits' exact numeric schedule over the
    q_pagerank synthetic edge families: decimal-exact raw sums, exact
    decimal L1 totals, one IEEE divide per score rounded to 12 dp."""
    blocks = []
    prev_h = "h0"
    prev_a = None
    for i in range(1, n_iter + 1):
        a, h = f"a{i}", f"h{i}"
        blocks.append(f"""
            {a}_raw AS (
                SELECT e.dst AS node,
                       SUM(CAST(round(x.hub, 14) AS DECIMAL(38,14))) AS raw
                FROM h_edges e JOIN {prev_h} x ON e.src = x.node
                GROUP BY e.dst),
            {a} AS (
                SELECT n.node,
                       round(CAST(COALESCE(s.raw, 0) AS DOUBLE)
                             / CAST(t.tot AS DOUBLE), 12) AS authority
                FROM h_nodes n
                LEFT JOIN {a}_raw s ON n.node = s.node
                CROSS JOIN (SELECT SUM(raw) AS tot FROM {a}_raw) t),
            {h}_raw AS (
                SELECT e.src AS node,
                       SUM(CAST(round(x.authority, 14)
                                AS DECIMAL(38,14))) AS raw
                FROM h_edges e JOIN {a} x ON e.dst = x.node
                GROUP BY e.src),
            {h} AS (
                SELECT n.node,
                       round(CAST(COALESCE(s.raw, 0) AS DOUBLE)
                             / CAST(t.tot AS DOUBLE), 12) AS hub
                FROM h_nodes n
                LEFT JOIN {h}_raw s ON n.node = s.node
                CROSS JOIN (SELECT SUM(raw) AS tot FROM {h}_raw) t)""")
        prev_h, prev_a = h, a
    return f"""
        WITH h_edges AS (
            SELECT doc_id AS src, (doc_id*3+7) % 401 AS dst FROM documents
            UNION ALL SELECT doc_id, (doc_id*7+11) % 403 FROM documents
            UNION ALL SELECT doc_id, (doc_id*13+5) % 407 FROM documents
        ),
        h_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM h_edges
                UNION ALL SELECT dst FROM h_edges)
        ),
        h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM h_nodes),
        {",".join(blocks)}
        SELECT n.node, h.hub, a.authority
        FROM h_nodes n JOIN {prev_h} h ON n.node = h.node
        JOIN {prev_a} a ON n.node = a.node
    """


def q_hits(spark, sf_dir):
    """HITS hubs/authorities (ops.graph.hits, round-5) over the same
    synthetic affine-modular edge families as q_pagerank: 2 iterations
    of the reproducible schedule (decimal-exact raw sums + exact L1
    totals, one IEEE divide rounded to 12 dp) — the DuckDB oracle
    replays it bit-for-bit."""
    from rdf_spark.ops.graph import hits

    d = _t(spark, sf_dir, "documents").select("doc_id")
    fams = [(3, 7, 401), (7, 11, 403), (13, 5, 407)]
    parts = [
        d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * a + b) % m).alias("dst"),
        )
        for a, b, m in fams
    ]
    edges = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return hits(edges, n_iter=2).select("node", "hub", "authority")


def q_pagerank(spark, sf_dir):
    """PageRank (ops.graph.pagerank) over a deterministic synthetic graph
    derived from doc ids (three affine-modular edge families — closed-form
    SQL-mirrorable, like dedup_clusters' graph).  3 power iterations with
    the operator's reproducible numeric schedule: contributions
    pre-rounded to 14 dp, per-node sums in exact DECIMAL(38,14), damped
    update as a single IEEE op — the DuckDB oracle replays the identical
    schedule and matches bit-for-bit."""
    from rdf_spark.ops.graph import pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id")
    fams = [(3, 7, 401), (7, 11, 403), (13, 5, 407)]
    parts = [
        d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * a + b) % m).alias("dst"),
        )
        for a, b, m in fams
    ]
    edges = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return pagerank(edges, n_iter=3).select("node", "rank")


def q_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (ops.graph.personalized_pagerank, round-5):
    the q_pagerank synthetic graph with teleport mass restricted to
    seeds {0..4} — the oracle replays the identical schedule with a
    CASE base (the damped constant written as the same IEEE
    subtraction/division chain Python performs)."""
    from rdf_spark.ops.graph import personalized_pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id")
    fams = [(3, 7, 401), (7, 11, 403), (13, 5, 407)]
    parts = [
        d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * a + b) % m).alias("dst"),
        )
        for a, b, m in fams
    ]
    edges = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return personalized_pagerank(
        edges, [0, 1, 2, 3, 4], n_iter=3
    ).select("node", "rank")


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 lexical retrieval (ops.retrieval.bm25_rank) for a fixed
    3-term query over the documents corpus — one tokenize-explode, then
    only map-side-combinable aggregations with the small sides broadcast;
    per-term partials pre-rounded and decimal-summed so scores are
    term-order- and partitioning-independent."""
    from rdf_spark.ops.retrieval import bm25_rank

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_rank(d, ["hash", "join", "spark"]).select("doc_id", "bm25")


def q_lm_score(spark, sf_dir):
    """CCNet-style LM quality signal (ops.retrieval.unigram_lm_nll): mean
    negative log-likelihood per token under the corpus's own smoothed
    unigram model — typical text scores low, keyword-stuffed junk scores
    high.  Two map-side-combinable passes + a broadcast totals row;
    decimal-summed so scores are partitioning-exact."""
    from rdf_spark.ops.retrieval import unigram_lm_nll

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_lm_nll(d).select("doc_id", "lm_nll", "n_tokens")


def q_bigram_lm(spark, sf_dir):
    """Interpolated bigram LM quality signal (ops.retrieval
    .bigram_lm_nll, round-5): Jelinek-Mercer λ·ML-bigram +
    (1−λ)·add-α-unigram over the corpus itself — the word-ORDER
    sharpening of `lm_score` (shuffled text keeps its unigram profile
    but not its transitions).  Bigrams built as a JVM filter→zip_with
    array expression; λ=0.75 / α=0.5 exact binary; decimal-summed
    per-doc so the oracle replays the identical schedule."""
    from rdf_spark.ops.retrieval import bigram_lm_nll

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_lm_nll(d).select("doc_id", "lm2_nll", "n_bigrams")


def q_rdf_canonicalize(spark, sf_dir):
    """RDFC-1.0 blank-node canonicalization (rdf_spark.canon, round-5):
    per document, three blank nodes each anchored by a distinct literal
    plus one blank-blank edge (_:0 <urn:q> _:1); input labels are
    scrambled by doc_id so identity labeling would fail.  Every node's
    first-degree hash is unique and CLOSED-FORM — the exact ``_:a``/
    ``_:z`` substituted N-Quads lines the algorithm hashes — so the
    oracle recomputes the same sha256 inputs in SQL and ranks them
    (step 5 of the spec; the shared-hash n-degree path is covered by
    the relabel-invariance property suite in test_canon)."""
    from rdf_spark.canon import canonicalize_blank_nodes

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id")
    j = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j")
    )
    label = F.concat(F.lit("_:in"), (F.col("j") + F.col("doc_id")) % 3)
    null_s = F.lit(None).cast("string")
    p_rows = j.select(
        "doc_id",
        label.alias("s"),
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.lit("urn:p").alias("p"),
        F.concat(F.lit("d"), F.col("doc_id"), F.lit("_v"),
                 F.col("j")).alias("o"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        null_s.alias("o_datatype"),
        null_s.alias("o_lang"),
    )
    edge = d.select(
        "doc_id",
        F.concat(F.lit("_:in"), F.col("doc_id") % 3).alias("s"),
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.lit("urn:q").alias("p"),
        F.concat(F.lit("_:in"), (F.col("doc_id") + 1) % 3).alias("o"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        null_s.alias("o_datatype"),
        null_s.alias("o_lang"),
    )
    out = canonicalize_blank_nodes(p_rows.unionByName(edge), "doc_id")
    return out.filter(F.col("p") == "urn:p").select(
        "doc_id", F.col("o").alias("lit"), F.col("s").alias("label")
    )


def q_c4_clean(spark, sf_dir):
    """C4 line/page cleaning (ops.text.c4_clean, round-5): the corpus
    has no newlines or punctuation, so lines are planted by a literal
    replace (' the ' → '.\\n' + 'the ') plus a final '.' — both engines'
    replace is the same greedy left-to-right.  Both keep arms and the
    line-drop rule fire at every scale (201/156/1837 keeps).  Pure JVM
    list expressions, zero shuffle; oracle replays the identical rules
    with DuckDB list lambdas."""
    from rdf_spark.ops.text import c4_clean

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.replace(F.col("text"), F.lit(" the "), F.lit(".\nthe ")),
            F.lit("."),
        ).alias("text"),
    )
    return c4_clean(d)


def q_duplicate_spans(spark, sf_dir):
    """Exact duplicated-substring spans (ops.dedup.duplicate_spans,
    round-5): every maximal token range whose 8-token windows repeat
    corpus-wide — the Lee-et-al exact-substring signal, surfaced
    organically by the datagen ' dup'-suffix near-duplicates (45/47/477
    spans at the three scales).  Window-hash counting joins each
    position to exactly ONE count row (no fanout on hot grams), spans
    merge via gaps-and-islands; the oracle replays the identical
    md5-keyed pipeline in SQL."""
    from rdf_spark.ops.dedup import duplicate_spans

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    return duplicate_spans(d, k=8)


def q_mixture_weights(spark, sf_dir):
    """Temperature mixing weights (ops.sample.mixture_weights,
    round-5): α=0.5 over planted skewed domains (least(doc_id%10, 3):
    10/10/10/70%), decimal-folded denominator, round-6 outputs; the
    oracle replays the identical pow→round9→decimal-sum schedule."""
    from rdf_spark.ops.sample import mixture_weights

    d = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("d"), F.least(F.col("doc_id") % 10, F.lit(3))
        ).alias("dom")
    )
    return mixture_weights(d, "dom", alpha=0.5)


def q_graph_digest(spark, sf_dir):
    """Isomorphism-stable graph digests (rdf_spark.canon.graph_digest,
    round-5): the q_rdf_canonicalize structure but with literals keyed
    by doc_id % 50, so every group's documents are isomorphic COPIES —
    their canonical N-Quads and digests must collide exactly.  The
    oracle CONSTRUCTS the canonical serialization in SQL (labels from
    the first-degree-hash rank, lines sorted, newline-terminated) and
    sha256-hashes it — an independent spelling of the whole digest
    path, not a replay of the operator's code."""
    from rdf_spark.canon import graph_digest

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id")
    g = (F.col("doc_id") % 50)
    j = d.select(
        "doc_id", g.alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"),
    )
    label = F.concat(F.lit("_:in"), (F.col("j") + F.col("doc_id")) % 3)
    null_s = F.lit(None).cast("string")
    p_rows = j.select(
        "doc_id",
        label.alias("s"),
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.lit("urn:p").alias("p"),
        F.concat(F.lit("g"), F.col("g"), F.lit("_v"),
                 F.col("j")).alias("o"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        null_s.alias("o_datatype"),
        null_s.alias("o_lang"),
    )
    edge = d.select(
        "doc_id",
        F.concat(F.lit("_:in"), F.col("doc_id") % 3).alias("s"),
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.lit("urn:q").alias("p"),
        F.concat(F.lit("_:in"), (F.col("doc_id") + 1) % 3).alias("o"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        null_s.alias("o_datatype"),
        null_s.alias("o_lang"),
    )
    return graph_digest(p_rows.unionByName(edge), "doc_id")


def q_duplicated_fraction(spark, sf_dir):
    """Per-doc memorization-risk score (ops.dedup.duplicated_fraction,
    round-5): the fraction of each document's tokens covered by
    duplicate_spans ranges — every doc emitted (span-free score 0.0),
    the same md5-keyed span pipeline joined back to token counts."""
    from rdf_spark.ops.dedup import duplicated_fraction

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    return duplicated_fraction(d, k=8)


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer training (ops.bpe.train_bpe, round-5): 8 merge
    rounds over the documents word-type vocabulary → the ordered merge
    table (step, x, y).  Separator-framed sequences make each merge a
    literal left-to-right ``replace`` with IDENTICAL greedy semantics
    in the JVM and DuckDB, so the oracle replays the full schedule as
    generated MATERIALIZED CTE rounds (pair-count → top-1 by
    count DESC / pair ASC → replace) — the k_core/pagerank replay
    pattern.  The corpus is ASCII (checked), so UTF-16 vs codepoint
    char-splitting cannot diverge."""
    from rdf_spark.ops.bpe import train_bpe

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    merges = train_bpe(d, n_merges=8)
    return spark.createDataFrame(
        [(i + 1, x, y) for i, (x, y) in enumerate(merges)],
        "step int, x string, y string",
    )


def q_media_near_dup(spark, sf_dir):
    """Multimodal near-dup contract: exact-duplicate media payloads are
    planted (media_id+1000000 copies, kind forced to image so the planted
    set is oracle-predictable) and must be recovered by the full
    decode→stub-feature→multi-table-LSH→exact-verify pipeline
    (ops.multimodal.media_near_duplicates) with sim exactly 1.0 —
    identical payloads give identical feature vectors, so recall on them
    is structurally guaranteed (same planted-pair scheme as
    `minhash_near_dup`/`embedding_near_dup`)."""
    from rdf_spark.ops import multimodal as mm

    media = mm.synthetic_media(spark, 1000).withColumn(
        "kind",
        F.when(F.col("media_id") < 20, "image").otherwise(F.col("kind")),
    )
    dup = media.filter(F.col("media_id") < 20).withColumn(
        "media_id", F.col("media_id") + 1000000
    )
    pairs = mm.media_near_duplicates(media.unionByName(dup))
    return pairs.filter(
        (F.col("a") < 20) & (F.col("b") - F.col("a") == 1000000)
    ).select("a", "b", "sim")


def q_quality_quantiles(spark, sf_dir):
    """Per-language quality-score distribution (p25/p50/p75/p95) — the
    corpus-health dashboard aggregate.  Uses EXACT percentile (Spark and
    DuckDB share type-7 linear interpolation, verified digit-for-digit);
    at 100 TB swap in approx_percentile(err) — same column contract,
    documented approximation, but no longer cross-engine-hashable.
    Emitted as one scalar row per (lang, quantile) — array cells are not
    hashable by the cross-engine comparator."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    f = textops.quality_features(d)
    qs = [0.25, 0.5, 0.75, 0.95]
    agg = f.groupBy("lang").agg(
        F.percentile(F.col("q_score"), F.lit(qs)).alias("_qarr"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return agg.select(
        "lang", F.posexplode("_qarr").alias("_pos", "_v"), "n_docs"
    ).select(
        "lang",
        F.element_at(F.lit(qs), F.col("_pos") + 1).alias("quantile"),
        F.round(F.col("_v"), 6).alias("q_value"),
        "n_docs",
    )


def q_vocab_stats(spark, sf_dir):
    """Per-language vocabulary analytics via the skew toolkit's two-phase
    salted distinct (ops.skew.salted_distinct_count): a hot language's
    distinct-token state is spread over n_salts reducers instead of one —
    the COUNT(DISTINCT) that survives a skewed 100 TB corpus."""
    from rdf_spark.ops.skew import salted_distinct_count

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            textops.tokens_col(F.coalesce(F.col("text"), F.lit("")))
        ).alias("token"),
    ).filter(F.col("token") != "")
    vocab = salted_distinct_count(toks, "lang", "token")
    tot = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n_tokens"))
    return tot.join(vocab, "lang").select(
        "lang", F.col("n_distinct").alias("n_distinct_tokens"), "n_tokens"
    )


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (ops.ann.label_centroids): pure JVM
    posexplode + map-side-combinable aggregations — the class-prototype
    operator that seeds IVF quantizers and label-balance audits.  Flat
    (label, pos, value, n_vecs) rows: one scalar row per dimension, so
    every cell is hashable by the cross-engine comparator."""
    from rdf_spark.ops.ann import label_centroids

    e = _t(spark, sf_dir, "embeddings")
    return label_centroids(e, flat=True).select("label", "pos", "value", "n_vecs")


def q_owl_closure(spark, sf_dir):
    """OWL property entailments (ops.reasoning.owl_property_closure,
    round-5): per document a 4-node u:next chain with u:next
    TransitiveProperty, u:prev its inverseOf, and one u:adj
    SymmetricProperty edge.  The rewrite algebra is closed schema-side
    ((pred, flip) orbit), the chain closure is closed-form — the oracle
    generates all i<j pairs per doc plus their prev-inverses and both
    adj directions, recursion-free (the rdfs_closure oracle pattern)."""
    from rdf_spark.ops.reasoning import (
        OWL_INVERSEOF,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        owl_property_closure,
    )
    from rdf_spark.terms import RDF_TYPE

    d = _t(spark, sf_dir, "documents").select("doc_id")
    node = lambda i: F.concat(  # noqa: E731
        F.lit("d"), F.col("doc_id"), F.lit("_"), i
    )
    chain = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i")
    ).select(
        node(F.col("i")).alias("s"),
        F.lit("u:next").alias("p"),
        node(F.col("i") + 1).alias("o"),
    )
    adj = d.select(
        node(F.lit(0)).alias("s"),
        F.lit("u:adj").alias("p"),
        node(F.lit(2)).alias("o"),
    )
    schema = spark.createDataFrame(
        [
            ("u:next", RDF_TYPE, OWL_TRANSITIVE),
            ("u:prev", OWL_INVERSEOF, "u:next"),
            ("u:adj", RDF_TYPE, OWL_SYMMETRIC),
        ],
        "s string, p string, o string",
    )
    return owl_property_closure(chain.unionByName(adj).unionByName(schema))


def q_rdfs_closure(spark, sf_dir):
    """ρdf RDFS materialization (ops.reasoning.rdfs_closure, round-5):
    a subclass chain u:C0 ⊑ … ⊑ u:C24 built from nation keys, one
    subPropertyOf edge with domain/range on the SUPER-property, and
    customer instances.  Exercises every ρdf rule and their ordering —
    rdfs2 fires only on an rdfs7-derived triple, rdfs9 only on an
    rdfs3-derived type.  The schema side is closed by iterative squaring
    and broadcast; the instance side is never shuffled until the final
    dedup.  DuckDB replays the chain closure CLOSED-FORM (all i<j key
    pairs) — an exact, recursion-free oracle."""
    from rdf_spark.ops.reasoning import (
        RDFS_DOMAIN,
        RDFS_RANGE,
        RDFS_SUBCLASSOF,
        RDFS_SUBPROPERTYOF,
        rdfs_closure,
    )
    from rdf_spark.terms import RDF_TYPE

    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sc_edges = nation.filter(F.col("n_nationkey") < 24).select(
        F.concat(F.lit("u:C"), F.col("n_nationkey")).alias("s"),
        F.lit(RDFS_SUBCLASSOF).alias("p"),
        F.concat(F.lit("u:C"), F.col("n_nationkey") + 1).alias("o"),
    )
    fixed = spark.createDataFrame(
        [
            ("u:memberOf", RDFS_SUBPROPERTYOF, "u:affiliatedWith"),
            ("u:affiliatedWith", RDFS_DOMAIN, "u:Buyer"),
            ("u:affiliatedWith", RDFS_RANGE, "u:C0"),
        ],
        "s string, p string, o string",
    )
    inst = cust.select(
        F.concat(F.lit("u:cust"), F.col("c_custkey")).alias("s"),
        F.lit("u:memberOf").alias("p"),
        F.concat(F.lit("u:nat"), F.col("c_nationkey")).alias("o"),
    ).unionByName(
        cust.select(
            F.concat(F.lit("u:cust"), F.col("c_custkey")).alias("s"),
            F.lit(RDF_TYPE).alias("p"),
            F.concat(F.lit("u:C"), F.col("c_nationkey")).alias("o"),
        )
    )
    return rdfs_closure(sc_edges.unionByName(fixed).unionByName(inst))


def q_classifier_score(spark, sf_dir):
    """Hashed linear classifier scoring (ops.text.hashed_classifier_score,
    round-5): the fastText-style quality-filter shape with a 64-bucket
    weight vector whose values are multiples of 1/64 (exact binary AND
    exact decimal — both engines' casts are lossless) derived closed-form
    from the bucket index, so the oracle needs no array literal.  The
    md5-prefix bucket hash parses identically in DuckDB; the decimal
    fold makes the sum token-order-independent; exp() ULP noise is
    absorbed by round-6 (the lm_score convention)."""
    from rdf_spark.ops.text import hashed_classifier_score

    d = _t(spark, sf_dir, "documents")
    weights = [(i % 13 - 6) / 64.0 for i in range(64)]
    return hashed_classifier_score(
        d.select("doc_id", "text"), weights, bias=0.25
    ).select("doc_id", "clf_score")


def _wheel_chain_edges(spark, sf_dir):
    """Shared synthetic graph for the iterative-graph contracts: 25
    wheels (hub + 5-cycle) with one depth-3 pendant chain per document
    hung off a hub — the same construction the k_core / LPA oracles
    regenerate in SQL."""
    nation = _t(spark, sf_dir, "nation")
    d = _t(spark, sf_dir, "documents")
    wheel = nation.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("s"),
    )
    spokes = wheel.select(
        F.concat(F.lit("h"), F.col("g")).alias("a"),
        F.concat(F.lit("w"), F.col("g"), F.lit("_"), F.col("s")).alias("b"),
    )
    rims = wheel.select(
        F.concat(F.lit("w"), F.col("g"), F.lit("_"), F.col("s")).alias("a"),
        F.concat(
            F.lit("w"), F.col("g"), F.lit("_"), (F.col("s") + 1) % 5
        ).alias("b"),
    )
    i = F.col("doc_id")
    chains = (
        d.select(
            F.concat(F.lit("h"), i % 25).alias("a"),
            F.concat(F.lit("p"), i).alias("b"),
        )
        .unionByName(d.select(
            F.concat(F.lit("p"), i).alias("a"),
            F.concat(F.lit("q"), i).alias("b"),
        ))
        .unionByName(d.select(
            F.concat(F.lit("q"), i).alias("a"),
            F.concat(F.lit("r"), i).alias("b"),
        ))
    )
    return spokes.unionByName(rims).unionByName(chains)


def q_k_core(spark, sf_dir):
    """3-core peeling (ops.graph.k_core, round-5): 25 wheel graphs (hub
    + 5-cycle — every wheel node has degree ≥3, the whole wheel IS its
    3-core) with one depth-3 pendant chain per document hung off a hub.
    The chains unravel in exactly 3 peel rounds at EVERY scale (peel
    depth is structural, not data-sized), so the oracle can replay the
    peeling round-by-round as 6 generated CTE rounds (the _pagerank_sql
    pattern) — fixpoint by round 4, identical node set."""
    from rdf_spark.ops.graph import k_core

    return k_core(_wheel_chain_edges(spark, sf_dir), k=3)


def q_k_truss(spark, sf_dir):
    """3-truss peeling (ops.graph.k_truss, round-5): wheels plus one
    triangle fan (hub, p_i, q_i) and one pendant (q_i, r_i) per
    document.  Every wheel and fan edge closes ≥1 triangle so the
    3-truss is closed-form (pendants peel in round 1 and their removal
    lowers no other edge's support — fixpoint in one round at every
    scale)."""
    from rdf_spark.ops.graph import k_truss

    nation = _t(spark, sf_dir, "nation")
    d = _t(spark, sf_dir, "documents")
    wheel = nation.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("s"),
    )
    spokes = wheel.select(
        F.concat(F.lit("h"), F.col("g")).alias("a"),
        F.concat(F.lit("w"), F.col("g"), F.lit("_"), F.col("s")).alias("b"),
    )
    rims = wheel.select(
        F.concat(F.lit("w"), F.col("g"), F.lit("_"), F.col("s")).alias("a"),
        F.concat(
            F.lit("w"), F.col("g"), F.lit("_"), (F.col("s") + 1) % 5
        ).alias("b"),
    )
    i = F.col("doc_id")
    hub = F.concat(F.lit("h"), i % 25)
    fans = (
        d.select(hub.alias("a"), F.concat(F.lit("p"), i).alias("b"))
        .unionByName(d.select(
            F.concat(F.lit("p"), i).alias("a"),
            F.concat(F.lit("q"), i).alias("b")))
        .unionByName(d.select(
            hub.alias("a"), F.concat(F.lit("q"), i).alias("b")))
        .unionByName(d.select(
            F.concat(F.lit("q"), i).alias("a"),
            F.concat(F.lit("r"), i).alias("b")))
    )
    return k_truss(spokes.unionByName(rims).unionByName(fans), k=3)


def q_label_propagation(spark, sf_dir):
    """Community detection (ops.graph.label_propagation, round-5): 3
    synchronous vote rounds (neighbor labels + one self-vote, ties to
    the smallest label) over the shared wheel+chain graph — the oracle
    replays the identical schedule as generated MATERIALIZED CTE
    rounds (the k_core pattern)."""
    from rdf_spark.ops.graph import label_propagation

    return label_propagation(_wheel_chain_edges(spark, sf_dir), n_iter=3)


def q_link_predict(spark, sf_dir):
    """Neighborhood link prediction (ops.graph.link_predict, round-5)
    over the shared wheel+chain graph with ``max_degree=8``: hubs
    (degree ≥25 at every scale) are excluded as wedge centers, so the
    candidates are closed-form — the 5 distance-2 rim pairs per wheel
    (center ``w_g_s``, degree 3) and per document ``(h_g, q_i)`` /
    ``(p_i, r_i)`` through the degree-2 chain nodes.  The oracle
    replays the full wedge-enumeration + decimal Adamic-Adar schedule
    in SQL (same round-9 pre-round, DECIMAL(24,9) sum, round-6
    finish)."""
    from rdf_spark.ops.graph import link_predict

    return link_predict(_wheel_chain_edges(spark, sf_dir), max_degree=8)


def q_scc(spark, sf_dir):
    """Directed SCC (ops.graph.strongly_connected_components, round-5):
    per document a 4-cycle (the planted spam ring) plus one DAG tail
    hanging off it.  The peeling depth is STRUCTURAL — every cycle
    resolves in phase 1 (tails are colored by the cycle min but can't
    reach back), tails self-resolve in phase 2 — so the oracle is
    closed-form: cycle members map to c<i>_0, tails to themselves."""
    from rdf_spark.ops.graph import strongly_connected_components

    d = _t(spark, sf_dir, "documents").select("doc_id")
    j = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    )
    node = lambda i: F.concat(  # noqa: E731
        F.lit("c"), F.col("doc_id"), F.lit("_"), i
    )
    cyc = j.select(
        node(F.col("j")).alias("src"),
        node((F.col("j") + 1) % 4).alias("dst"),
    )
    tail = d.select(
        node(F.lit(0)).alias("src"),
        F.concat(F.lit("t"), F.col("doc_id")).alias("dst"),
    )
    return strongly_connected_components(cyc.unionByName(tail))


def q_recrawl_stats(spark, sf_dir):
    """CDX change-rate statistics (cdx.recrawl_stats, round-5): capture
    histories synthesized by folding doc_ids onto 211 URLs; digests
    cycle mod 5 with a planted all-null arm (digest-less captures carry
    no change evidence — n_versions clamps to ≥1, never 0).  One hash
    aggregate; DuckDB replays the same GROUP BY with the same clamp and
    rounding."""
    from rdf_spark.cdx import recrawl_stats

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    caps = d.select(
        F.concat(F.lit("https://s.com/p"), i % 211).alias("url"),
        (i + F.lit(10000000000000)).cast("string").alias("ts"),
        F.when(i % 7 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("sha1:"), i % 5)
        ).alias("digest"),
    )
    return recrawl_stats(caps)


def q_fetch_plan(spark, sf_dir):
    """Politeness fetch scheduling (ops.fetchplan.plan_fetches,
    round-5): 37 synthetic hosts, robots Crawl-delay known for the 25
    nation-keyed ones (others take the default) — every URL gets a
    deterministic per-host queue slot (md5 order, the repo's sampling
    convention) and fetch_at_s = (slot−1)·delay.  DuckDB replays the
    identical window + join."""
    from rdf_spark.ops.fetchplan import plan_fetches

    d = _t(spark, sf_dir, "documents")
    nation = _t(spark, sf_dir, "nation")
    frontier = d.select(
        F.concat(
            F.lit("https://host"), F.col("doc_id") % 37,
            F.lit(".com/p/"), F.col("doc_id"),
        ).alias("url")
    )
    delays = nation.select(
        F.concat(F.lit("host"), F.col("n_nationkey"), F.lit(".com")).alias("host"),
        (F.col("n_nationkey") % 5 + 1).cast("double").alias("crawl_delay"),
    )
    return plan_fetches(frontier, delays=delays, default_delay=1.0)


def q_surt_key(spark, sf_dir):
    """SURT crawl-index keys (ops.url.surt_col, round-5): four planted
    URL shapes — www+default-port+unsorted-query+fragment, non-default
    port, empty path, and a relative URL (→ NULL).  The oracle states
    each shape's expected key closed-form; the operator must get host
    reversal, www/port dropping, query sorting and the NULL arm all
    right to match."""
    from rdf_spark.ops.url import surt_col

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = (
        F.when(i % 4 == 0, F.concat(
            F.lit("HTTP://WWW.Site"), i % 50,
            F.lit(".Example.COM:80/Page/"), i, F.lit("?b=2&a=1#frag"),
        ))
        .when(i % 4 == 1, F.concat(
            F.lit("https://sub.domain"), i % 30, F.lit(".org:8443/x"),
        ))
        .when(i % 4 == 2, F.concat(F.lit("http://host"), i, F.lit(".net")))
        .otherwise(F.concat(F.lit("relative/path"), i))
    )
    return d.select("doc_id", surt_col(url).alias("surt_key"))


def q_cdxj_parse(spark, sf_dir):
    """CDXJ crawl-index parsing (cdx.parse_cdxj, round-5): index lines
    synthesized per document — one in ten gets a malformed timestamp and
    must land in the quarantine ``err`` column with all data columns
    null; absent JSON fields (mime/digest) surface as NULL; numeric
    fields arrive as JSON strings and must try_cast.  Whole parse is
    JVM regexp + get_json_object — the oracle rebuilds every column
    closed-form from the same arithmetic."""
    from rdf_spark.cdx import parse_cdxj

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    ts = F.when(i % 10 == 0, F.lit("badts")).otherwise(
        F.concat(F.lit("2024010112000"), i % 10)
    )
    line = F.concat(
        F.lit("com,site"), i, F.lit(")/p "), ts,
        F.lit(' {"url": "https://site'), i,
        F.lit('.com/p", "status": "'), (i % 3) + 200,
        F.lit('", "offset": "'), i * 7,
        F.lit('", "length": "'), (i % 997) + 1,
        F.lit('", "filename": "c.warc.gz"}'),
    )
    return parse_cdxj(d.select(line.alias("value")))


def q_triangle_count(spark, sf_dir):
    """Per-node triangle counts (ops.graph.triangle_count, round-5):
    degree-ordered wedge counting — orientation bounds out-degree by
    O(√m), so hubs produce no wedges.  Input: a ladder of consecutive
    (i,i+1)/(i,i+2) links with planted reversed duplicates that the
    canonicalization must fold.  The DuckDB oracle replays the whole
    triangle enumeration with id-ordered joins — counts are
    orientation-invariant, so the two strategies must agree exactly."""
    from rdf_spark.ops.graph import triangle_count

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    n = lambda c: F.concat(F.lit("u:n"), c)  # noqa: E731
    edges = (
        d.select(n(F.col("doc_id")).alias("a"), n(F.col("doc_id") + 1).alias("b"))
        .unionByName(
            d.select(
                n(F.col("doc_id")).alias("a"), n(F.col("doc_id") + 2).alias("b")
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 3 == 0).select(
                n(F.col("doc_id") + 1).alias("a"), n(F.col("doc_id")).alias("b")
            )
        )
    )
    return triangle_count(edges, "a", "b")


def q_entity_resolve(spark, sf_dir):
    """Blocked-levenshtein entity resolution (ops.resolve, round-5):
    every part name gets a planted deletion typo (4th char dropped) and
    must resolve back through block → length-band prune → edit
    similarity → deterministic top-1.  The oracle replays the ENTIRE
    computation (DuckDB has the same `levenshtein`), so duplicate part
    names, tie-breaks and band-pruned candidates are all covered — not
    a modeled expectation."""
    from rdf_spark.ops.resolve import resolve_entities

    part = _t(spark, sf_dir, "part")
    surfaces = part.select(
        F.concat(
            F.substring("p_name", 1, 3), F.expr("substring(p_name, 5)")
        ).alias("surface")
    )
    catalog = part.select(
        F.concat(F.lit("u:part"), F.col("p_partkey")).alias("entity_iri"),
        F.col("p_name").alias("name"),
    )
    return resolve_entities(
        surfaces, catalog, threshold=0.75, block_len=2, topk=1
    )


def q_sameas_resolve(spark, sf_dir):
    """owl:sameAs identity resolution (ops.reasoning.sameas_resolve,
    round-5): every customer asserts sameAs to its nation's anchor IRI
    and anchors chain across nations k → k+5, so components span BOTH a
    star and a chain shape (the large-star/small-star CC must handle
    each).  The representative is the component's min IRI, which is
    closed-form here: anchor ids are ZERO-PADDED so lexicographic order
    equals numeric order ('u:anchor12' < 'u:anchor2' otherwise!) →
    rep(nationkey) = u:anchor0{nationkey%5}; order facts are rewritten
    to it.  DuckDB replays the rewrite as one join — no recursion needed
    because the component algebra is planted."""
    from rdf_spark.ops.reasoning import OWL_SAMEAS, sameas_resolve

    def anchor(k):
        return F.concat(F.lit("u:anchor"), F.lpad(k.cast("string"), 2, "0"))

    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    sa = cust.select(
        F.concat(F.lit("u:cust"), F.col("c_custkey")).alias("s"),
        F.lit(OWL_SAMEAS).alias("p"),
        anchor(F.col("c_nationkey")).alias("o"),
    )
    chain = nation.filter(F.col("n_nationkey") < 20).select(
        anchor(F.col("n_nationkey")).alias("s"),
        F.lit(OWL_SAMEAS).alias("p"),
        anchor(F.col("n_nationkey") + 5).alias("o"),
    )
    facts = orders.select(
        F.concat(F.lit("u:cust"), F.col("o_custkey")).alias("s"),
        F.lit("u:placed").alias("p"),
        F.concat(F.lit("u:order"), F.col("o_orderkey")).alias("o"),
    )
    return sameas_resolve(sa.unionByName(chain).unionByName(facts))


def _void_triples(spark, sf_dir):
    """Shared input for the VoID contracts: 3 N-Triples lines per
    customer (an rdf:type triple, a name literal, a nation link) parsed
    through the real decoder so the stats run over the canonical triple
    schema, not a shortcut frame."""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lines = c.select(
        F.explode(F.array(
            F.concat(F.lit("<urn:cust:"), k,
                     F.lit("> <" + terms.RDF_TYPE + "> <urn:class:"),
                     F.col("c_mktsegment"), F.lit("> .")),
            F.concat(F.lit("<urn:cust:"), k, F.lit('> <urn:p:name> "'),
                     F.col("c_name"), F.lit('" .')),
            F.concat(F.lit("<urn:cust:"), k,
                     F.lit("> <urn:p:nation> <urn:nation:"),
                     F.col("c_nationkey"), F.lit("> .")),
        )).alias("value")
    )
    return sources.parse_lines_df(lines, "ntriples").filter(F.col("err").isNull())


def q_void_summary(spark, sf_dir):
    """VoID dataset summary (ops.voidstats.void_summary, round-5): one
    row of whole-dataset statistics — each distinct-count its own
    scan-narrow two-phase HashAggregate, combined by 1-row cross joins
    (never one Expand-multiplying multi-countDistinct).  Closed-form
    oracle: customer keys/names are unique, segment and nation sets are
    the class / linked-entity partitions."""
    from rdf_spark.ops.voidstats import void_summary

    return void_summary(_void_triples(spark, sf_dir))


def q_void_property_partition(spark, sf_dir):
    """void:propertyPartition (ops.voidstats.property_partition,
    round-5): per-predicate triple counts and distinct subject/object
    counts, pre-aggregated per key before the (predicate-sized) join."""
    from rdf_spark.ops.voidstats import property_partition

    return property_partition(_void_triples(spark, sf_dir))


def q_void_class_partition(spark, sf_dir):
    """void:classPartition (ops.voidstats.class_partition, round-5):
    distinct typed entities per class IRI."""
    from rdf_spark.ops.voidstats import class_partition

    return class_partition(_void_triples(spark, sf_dir))


def q_shacl_report(spark, sf_dir):
    """SHACL-lite validation (ops.shacl.validate, round-5): an
    OrderShape with planted violations per constraint family —
    minCount (k%7: prio triple withheld), maxCount (k%11: duplicate
    prio), sh:class (cust%5: customer left untyped), sh:datatype
    (k%13: plain-string note instead of xsd:integer), sh:in (the rare
    'P' order status).  Triples go through the real N-Triples decoder;
    the oracle regenerates each violation row closed-form."""
    from rdf_spark.ops.shacl import validate

    # spread the single-split scan BEFORE the 7-way line explode so the
    # synthesis and the Python NT parse both run wide (1 task otherwise)
    o = _spread(_t(spark, sf_dir, "orders"))
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    order = F.concat(F.lit("<u:order:"), k, F.lit(">"))
    prio = F.concat(order, F.lit(' <u:p:prio> "'),
                    F.col("o_orderpriority"), F.lit('" .'))
    lines = o.select(
        F.explode(F.array_compact(F.array(
            F.concat(order, F.lit(" <" + terms.RDF_TYPE + "> <u:Order> .")),
            F.when(k % 7 != 0, prio),
            F.when((k % 11 == 0) & (k % 7 != 0), prio),
            F.concat(order, F.lit(" <u:p:cust> <u:cust:"), c, F.lit("> .")),
            F.when(c % 5 != 0, F.concat(
                F.lit("<u:cust:"), c,
                F.lit("> <" + terms.RDF_TYPE + "> <u:Customer> ."))),
            F.when(k % 13 == 0,
                   F.concat(order, F.lit(' <u:p:note> "note" .')))
            .otherwise(F.concat(
                order, F.lit(' <u:p:note> "'), k,
                F.lit('"^^<' + terms.XSD_INTEGER + "> ."))),
            F.concat(order, F.lit(' <u:p:flag> "'),
                     F.col("o_orderstatus"), F.lit('" .')),
        ))).alias("value")
    )
    tri = sources.parse_lines_df(lines, "ntriples").filter(
        F.col("err").isNull()
    )
    shapes = [{
        "id": "u:OrderShape",
        "target_class": "u:Order",
        "properties": [
            {"path": "u:p:prio", "min_count": 1, "max_count": 1},
            {"path": "u:p:cust", "class": "u:Customer"},
            {"path": "u:p:note", "datatype": terms.XSD_INTEGER},
            {"path": "u:p:flag", "in": ["O", "F"]},
        ],
    }]
    return validate(tri, shapes)


def q_chunk_documents(spark, sf_dir):
    """RAG chunking (ops.text.chunk_documents, round-5): 32-token
    windows with 8-token overlap (stride 24) over documents — docs are
    10..99 tokens at every scale, so the corpus mixes 1-chunk and
    4-chunk docs.  Pure row-local JVM split/sequence/explode/slice,
    zero shuffle; the oracle replays the identical integer window
    arithmetic with DuckDB list slicing."""
    from rdf_spark.ops.text import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(d, chunk_tokens=32, overlap=8)


_SHACL_LOGIC_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
<u:SOr> a sh:NodeShape ; sh:targetClass <u:C> ;
  sh:or ( [ sh:property [ sh:path <u:email> ; sh:minCount 1 ] ]
          [ sh:property [ sh:path <u:phone> ; sh:minCount 1 ] ] ) .
<u:SX> a sh:NodeShape ; sh:targetClass <u:C> ;
  sh:xone ( [ sh:property [ sh:path <u:email> ; sh:minCount 1 ] ]
            [ sh:property [ sh:path <u:phone> ; sh:minCount 1 ] ] ) .
<u:SN> a sh:NodeShape ; sh:targetClass <u:C> ;
  sh:not [ sh:property [ sh:path <u:flag> ; sh:minCount 1 ] ] .
<u:SV> a sh:NodeShape ; sh:targetClass <u:C> ;
  sh:property [ sh:path <u:val> ;
                sh:or ( [ sh:datatype xsd:integer ]
                        [ sh:nodeKind sh:IRI ] ) ] .
"""


def q_shacl_logic(spark, sf_dir):
    """SHACL logical combinators (rdf_spark.shacl, round-5): focus-level
    sh:or / sh:xone (email-or-phone over k%2 / k%3 emission — or fires
    on neither, xone on both and neither), sh:not (k%5 carries the
    forbidden u:flag), and value-level sh:or alternation compiled to one
    row-local predicate (u:val is a string / integer-literal / IRI by
    k%7; only the k%7==0 strings fail both alternatives).  Violator-set
    algebra replayed closed-form by the oracle."""
    from rdf_spark.shacl import shacl_validate

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")

    def st(p, o, kind, dt):
        return F.struct(
            p.alias("p"), o.alias("o"),
            F.lit(kind).cast("int").alias("o_kind")
            if not isinstance(kind, F.Column)
            else kind.cast("int").alias("o_kind"),
            (dt if isinstance(dt, F.Column)
             else F.lit(dt).cast("string")).alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )

    val = F.when(k % 7 == 0, st(
        F.lit("u:val"), F.concat(F.lit("bad"), k), 2, terms.XSD_STRING)) \
        .when(k % 7 <= 3, st(
            F.lit("u:val"), k.cast("string"), 2, terms.XSD_INTEGER)) \
        .otherwise(st(
            F.lit("u:val"), F.concat(F.lit("u:x:"), k), 1, None))
    tri = c.select(
        F.concat(F.lit("u:c:"), k).alias("s"),
        F.lit(1).cast("int").alias("s_kind"),
        F.explode(F.array_compact(F.array(
            st(F.lit(terms.RDF_TYPE), F.lit("u:C"), 1, None),
            F.when(k % 2 == 0, st(
                F.lit("u:email"), F.concat(F.lit("e"), k), 2,
                terms.XSD_STRING)),
            F.when(k % 3 == 0, st(
                F.lit("u:phone"), F.concat(F.lit("p"), k), 2,
                terms.XSD_STRING)),
            F.when(k % 5 == 0, st(
                F.lit("u:flag"), F.lit("on"), 2, terms.XSD_STRING)),
            val,
        ))).alias("t"),
    ).select("s", "s_kind", "t.*")
    return shacl_validate(tri, _SHACL_LOGIC_TTL)


def q_wat_links(spark, sf_dir):
    """WAT outlink extraction (warc.wat_links, round-5): per-doc
    synthesized Common-Crawl WAT envelopes (doc_id%3+1 links each,
    absolute hrefs) parsed JVM-side with a pruned from_json schema and
    exploded — the link-graph path that never re-reads the response
    corpus.  The oracle regenerates the link rows closed-form."""
    from rdf_spark.warc import wat_links

    d = _t(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id")
    entry = lambda jx: F.concat(  # noqa: E731
        F.lit('{"path":"A@/href","url":"http://h'), (k + jx) % 7,
        F.lit(".test/p"), jx, F.lit('","text":"a'), jx, F.lit('"}'))
    env = F.concat(
        F.lit('{"Envelope":{"Payload-Metadata":'
              '{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":['),
        F.array_join(
            F.transform(F.sequence(F.lit(1), (k % 3 + 1)), entry),
            ","),
        F.lit("]}}}}}"),
    )
    recs = d.select(
        F.concat(F.lit("http://src"), k % 5, F.lit(".test/d"), k)
        .alias("target_uri"),
        env.alias("text"),
        F.lit(None).cast("string").alias("err"),
    )
    return wat_links(recs)


def q_rdf_lists(spark, sf_dir):
    """rdf:List materialization (ops.rdflist.rdf_lists, round-5): one
    first/rest chain per customer, length k%5+1, planted malformations
    that must drop the WHOLE list — k%31 chains end in a dangling tail
    instead of rdf:nil; k%37 chains (length ≥ 2) carry a second
    rdf:first on cell 1.  Pointer-doubling spine closure (⌈log₂ 8⌉
    rounds at max_len=8); the oracle regenerates surviving lists
    closed-form."""
    from rdf_spark.ops.rdflist import (
        RDF_FIRST,
        RDF_NIL,
        RDF_REST,
        rdf_lists,
    )

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ln = (k % 5 + 1).alias("ln")
    j = F.col("j")
    cell = F.concat(F.lit("u:cell:"), k, F.lit(":"), j)
    nxt = F.when(
        j < F.col("ln") - 1,
        F.concat(F.lit("u:cell:"), k, F.lit(":"), j + 1),
    ).otherwise(F.when(k % 31 == 0,
                       F.concat(F.lit("u:dangle:"), k))
                .otherwise(F.lit(RDF_NIL)))

    def st(p, o, kind, dt):
        return F.struct(
            p.alias("p"), o.alias("o"),
            F.lit(kind).cast("int").alias("o_kind"),
            F.lit(dt).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )

    tri = (
        c.select(k, ln)
        .select(k, "ln",
                F.explode(F.sequence(F.lit(0), F.col("ln") - 1)).alias("j"))
        .select(
            cell.alias("s"),
            F.explode(F.array_compact(F.array(
                st(F.lit(RDF_FIRST),
                   F.concat(F.lit("item "), k, F.lit(":"), j), 2,
                   terms.XSD_STRING),
                st(F.lit(RDF_REST), nxt, 1, None),
                F.when((k % 37 == 0) & (j == 1),
                       st(F.lit(RDF_FIRST), F.lit("dup"), 2,
                          terms.XSD_STRING)),
            ))).alias("t"))
        .select("s", "t.*")
    )
    return rdf_lists(tri, max_len=8)


_SHACL_SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
<u:CustShape> a sh:NodeShape ; sh:targetClass <u:Customer> ;
  sh:closed true ; sh:ignoredProperties ( <u:note> ) ;
  sh:property [ sh:path <u:phone> ; sh:minCount 1 ] ;
  sh:property [ sh:path <u:name> ; sh:maxCount 1 ;
                sh:pattern "^Customer" ; sh:maxLength 18 ] ;
  sh:property [ sh:path <u:bal> ; sh:datatype xsd:decimal ;
                sh:minInclusive 0 ] ;
  sh:property [ sh:path <u:seg> ;
                sh:in ("AUTOMOBILE" "BUILDING" "FURNITURE" "HOUSEHOLD") ] ;
  sh:property [ sh:path <u:nat> ; sh:nodeKind sh:IRI ;
                sh:class <u:Nation> ] ;
  sh:property [ sh:path <u:tag> ; sh:hasValue "gold" ] .
<u:SQShape> a sh:NodeShape ; sh:targetClass <u:Customer> ;
  sh:sparql [ sh:message "machinery customers need a gold tag" ;
    sh:select '''SELECT $this ?value WHERE {
      $this <u:seg> ?value .
      FILTER(?value = "MACHINERY")
      FILTER NOT EXISTS { $this <u:tag> "gold" }
    }''' ] .
"""


def q_shacl_shapes(spark, sf_dir):
    """SHACL Turtle shapes-graph validation (rdf_spark.shacl, round-5):
    a real shapes graph parsed by the repo's own Turtle parser and
    compiled onto ops.shacl — one planted violation family per core
    constraint component, incl. the ones the dict contract
    (q_shacl_report) doesn't cover: closed shapes + ignoredProperties
    (k%17 carries an undeclared u:extra; u:note is ignored), hasValue
    (only k%3 customers are tagged "gold"), maxLength/pattern (k%5 gets
    a second "alt …" name that breaks both plus maxCount),
    minInclusive with the incomparable branch (k%13 balances are
    string-typed → incomparable; negatives fail the compare), and
    sh:class over a partially-typed nation set (keys ≥20 untyped;
    k%11 customers hold a literal instead of an IRI → nodeKind too).
    The oracle regenerates every violation row closed-form."""
    from rdf_spark.shacl import shacl_validate

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    k, nk = F.col("c_custkey"), F.col("c_nationkey")
    bal = F.col("c_acctbal").cast("decimal(12,2)").cast("string")
    XS, XD = terms.XSD_STRING, terms.XSD_DECIMAL

    def st(p, o, kind, dt):
        return F.struct(
            p.alias("p"), o.alias("o"),
            F.lit(kind).cast("int").alias("o_kind"),
            (dt if isinstance(dt, F.Column)
             else F.lit(dt).cast("string")).alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )

    cust = c.select(
        F.concat(F.lit("u:c:"), k).alias("s"),
        F.lit(1).cast("int").alias("s_kind"),
        F.explode(F.array_compact(F.array(
            st(F.lit(terms.RDF_TYPE), F.lit("u:Customer"), 1, None),
            st(F.lit("u:name"), F.col("c_name"), 2, XS),
            F.when(k % 5 == 0, st(
                F.lit("u:name"),
                F.concat(F.lit("alt "), F.col("c_name")), 2, XS)),
            st(F.lit("u:bal"), bal, 2,
               F.when(k % 13 == 0, XS).otherwise(XD)),
            st(F.lit("u:seg"), F.col("c_mktsegment"), 2, XS),
            F.when(k % 11 == 0, st(
                F.lit("u:nat"), F.concat(F.lit("NATION_"), nk), 2, XS))
            .otherwise(st(
                F.lit("u:nat"), F.concat(F.lit("u:n:"), nk), 1, None)),
            F.when(k % 7 != 0, st(
                F.lit("u:phone"), F.concat(F.lit("PH-"), k), 2, XS)),
            st(F.lit("u:note"), F.lit("ignored"), 2, XS),
            F.when(k % 3 == 0, st(F.lit("u:tag"), F.lit("gold"), 2, XS)),
            F.when(k % 17 == 0, st(
                F.lit("u:extra"), F.concat(F.lit("x"), k), 2, XS)),
        ))).alias("t"),
    ).select("s", "s_kind", "t.*")
    typed = n.filter(F.col("n_nationkey") < 20).select(
        F.concat(F.lit("u:n:"), F.col("n_nationkey")).alias("s"),
        F.lit(1).cast("int").alias("s_kind"),
        F.lit(terms.RDF_TYPE).alias("p"),
        F.lit("u:Nation").alias("o"),
        F.lit(1).cast("int").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    return shacl_validate(cust.unionByName(typed), _SHACL_SHAPES_TTL)


def q_store_diff(spark, sf_dir):
    """Snapshot delta (store.snapshot_diff, round-5): old snapshot has
    one status triple per order ('B' for k%7, else 'A'); the new
    snapshot drops every k%4 order and normalizes every status to 'A'.
    added = the k%7 survivors' new 'A' triples; removed = every k%4
    order's triple plus the replaced 'B' rows — regenerated closed-form
    by the oracle.  Null-safe set compare (o_lang is null throughout)."""
    from rdf_spark.store import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def st(df, val):
        return df.select(
            F.concat(F.lit("u:o:"), F.col("o_orderkey")).alias("s"),
            F.lit(1).cast("tinyint").alias("s_kind"),
            F.lit("u:p:st").alias("p"),
            val.alias("o"),
            F.lit(2).cast("tinyint").alias("o_kind"),
            F.lit(XSD_STRING).alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )

    old = st(o, F.when(k % 7 == 0, "B").otherwise("A"))
    new = st(o.filter(k % 4 != 0), F.lit("A"))
    d = snapshot_diff(old, new)
    return d.select(
        "change", "s", F.col("s_kind").cast("int").alias("s_kind"), "p",
        "o", F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype", "o_lang",
    )


def q_embedding_covariance(spark, sf_dir):
    """Exact embedding covariance (ops.ann.embedding_covariance,
    round-5): the PCA/whitening input for ANN preprocessing.  FULL
    replay oracle — float32→double widening is exact in both engines,
    the per-row products round at 12 dp into DECIMAL(38,12) sums, and
    the final Sxy/n − (Sx/n)(Sy/n) combine is IEEE-identical."""
    from rdf_spark.ops.ann import embedding_covariance

    e = _spread(_t(spark, sf_dir, "embeddings"))
    return embedding_covariance(e, dim=64)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (ops.dsir.dsir_weights, round-5): hashed
    bigram log importance of every document against the doc_id%10<2
    slice as the target corpus.  FULL replay oracle — identical gram
    extraction, md5 bucket, add-α smoothing (α·B written as the same
    IEEE product, never a decimal literal), ln rounded 9 dp (the only
    non-IEEE-exact op), count×weight products rounded 9 dp and summed
    as DECIMAL(38,9) (the retrieval.py reproducible-sum pattern)."""
    from rdf_spark.ops.dsir import dsir_weights

    d = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    target = d.filter(F.col("doc_id") % 10 < 2)
    return dsir_weights(d, target, n=2, n_buckets=4096, alpha=0.01)


def q_fuse_values(spark, sf_dir):
    """Truth-discovery fusion (ops.fusion.fuse_assertions, round-5):
    six synthetic sources assert each order's status/priority — one
    source votes TWICE (per-source dedup must count it once), src_c
    contradicts the status on every third order (trust 4 vs 3+2 — the
    majority coalition wins), and the priority ties 2-2 on every fifth
    order (lexicographic-min tie-break: '0AAA' sorts before the
    digit-led priorities).  FULL replay oracle: the same assertion set
    and the same three-level weighted vote in SQL.  Three map-side-
    combinable hash aggregations, no windows, no Python."""
    from rdf_spark.ops.fusion import fuse_assertions

    # spread the single-split scan so the 6-way vote explode and its
    # map-side aggregation run wide (1 task otherwise)
    o = _spread(_t(spark, sf_dir, "orders")).select(
        F.concat(F.lit("urn:o:"), F.col("o_orderkey")).alias("s"),
        "o_orderkey", "o_orderstatus", "o_orderpriority",
    )
    st = F.lit("urn:p:status")
    pr = F.lit("urn:p:prio")
    conflict = F.when(F.col("o_orderkey") % 3 == 0, F.lit("XX")) \
        .otherwise(F.col("o_orderstatus"))
    tie = F.when(F.col("o_orderkey") % 5 == 0, F.lit("0AAA")) \
        .otherwise(F.col("o_orderpriority"))

    def vote(p, val, src, trust):
        return F.struct(
            p.alias("p"), val.alias("o"),
            F.lit(src).alias("source"), F.lit(trust).alias("trust"),
        )

    # same six votes as the round-5 unionAll chain, built from ONE
    # orders scan via explode (the union re-read the table six times;
    # vote multiset, and therefore the fused output, is identical)
    assertions = o.select(
        "s",
        F.explode(F.array(
            vote(st, F.col("o_orderstatus"), "src_a", 3),
            vote(st, F.col("o_orderstatus"), "src_a", 3),
            vote(st, F.col("o_orderstatus"), "src_b", 2),
            vote(st, conflict, "src_c", 4),
            vote(pr, F.col("o_orderpriority"), "src_a", 2),
            vote(pr, tie, "src_c", 2),
        )).alias("_v"),
    ).select("s", "_v.p", "_v.o", "_v.source", "_v.trust")
    fused = fuse_assertions(assertions)
    return fused.select(
        "s", "p", "o",
        F.col("support").cast("double").alias("support"),
        F.col("total").cast("double").alias("total"),
        "confidence",
        F.col("n_values").cast("long").alias("n_values"),
        F.col("n_sources").cast("long").alias("n_sources"),
    )


def q_hearst_hyponyms(spark, sf_dir):
    """Hearst-pattern hyponymy mining (ops.relations.hearst_candidates,
    round-5): five planted sentence families over the ORGANIC document
    text (all-lowercase, so the capitalized-NP patterns cannot fire on
    it — every organic token is a live false-positive probe).  Each
    family exercises one pattern: `such as` with a 3-NP and-list,
    `and other` (hypernym trails), `including`, `, especially`, and
    `Such X as Y or Z` (or-list).  Closed-form oracle: the planted
    pairs replayed from doc_id arithmetic.  One narrow JVM regex
    projection, zero shuffle, zero Python."""
    from rdf_spark.ops.relations import hearst_candidates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id").cast("string")
    text = F.concat(
        F.col("text"),
        F.concat(F.lit(" Vendors such as Alpha"), i, F.lit(", Beta"), i,
                 F.lit(" and Gamma"), i, F.lit(" ship parts.")),
        F.when(F.col("doc_id") % 2 == 0, F.concat(
            F.lit(" Delta"), i, F.lit(" and other Carriers run routes."),
        )).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.concat(
            F.lit(" Tools including Epsilon"), i, F.lit(" work."),
        )).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.concat(
            F.lit(" Regions, especially Zeta"), i, F.lit(", grow."),
        )).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.concat(
            F.lit(" Such Firms as Eta"), i, F.lit(" or Theta"), i,
            F.lit(" exist."),
        )).otherwise(F.lit("")),
    )
    return hearst_candidates(d.select("doc_id", text.alias("text")))


def q_table_triples(spark, sf_dir):
    """Infobox mining (ops.content.table_to_triples, round-5): each
    order page carries a header table with two labeled columns (header
    slugging: 'Order Status' → order_status), a headerless third
    column (dropped), a second data row with an empty price cell
    (dropped), plus a header-only table and a stray td (both dropped
    by the extract/convert pair).  Closed-form oracle: three triples
    per order.  The cells self-join is the only exchange; the header
    side is 2/5 of the cell rows and AQE-sized."""
    from rdf_spark.ops.content import extract_tables, table_to_triples

    o = _t(spark, sf_dir, "orders")
    url = F.concat(F.lit("https://kb.example/o/"), F.col("o_orderkey"))
    html = F.concat(
        F.lit("<td>stray</td><table><tr><th>Order Status</th>"
              "<th>Total Price</th><th> </th></tr><tr><td>"),
        F.col("o_orderstatus"),
        F.lit("</td><td>"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.lit("</td><td>nohdr</td></tr><tr><td>P"),
        F.col("o_orderkey"),
        F.lit("</td><td></td></tr></table>"
              "<table><tr><th>loner</th></tr></table>"),
    )
    pages = _spread(o.select(url.alias("url"), html.alias("html")))
    t = table_to_triples(extract_tables(pages))
    return t.select(
        "url", "s", F.col("s_kind").cast("int").alias("s_kind"),
        "p", "o", F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype", "o_lang",
    )


def q_table_triples_keyed(spark, sf_dir):
    """Key-column infobox mining (table_to_triples
    subject_from_first_col=True, round-5): every part page's table
    names the entity in column 0 ('Part <key>' → subject slug
    part_<key>); column 0 emits no triple and a keyless second row is
    dropped whole.  Closed-form oracle: two triples per part."""
    from rdf_spark.ops.content import extract_tables, table_to_triples

    p = _t(spark, sf_dir, "part")
    url = F.concat(F.lit("https://kb.example/p/"), F.col("p_partkey"))
    html = F.concat(
        F.lit("<table><tr><th>Name</th><th>Retail Price</th>"
              "<th>Brand</th></tr><tr><td>Part "),
        F.col("p_partkey"),
        F.lit("</td><td>"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("string"),
        F.lit("</td><td>"),
        F.col("p_brand"),
        F.lit("</td></tr><tr><td> </td><td>keyless</td><td>x</td></tr>"
              "</table>"),
    )
    pages = _spread(p.select(url.alias("url"), html.alias("html")))
    t = table_to_triples(extract_tables(pages), subject_from_first_col=True)
    return t.select(
        "url", "s", F.col("s_kind").cast("int").alias("s_kind"),
        "p", "o", F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype", "o_lang",
    )


def q_turtle_star_parse(spark, sf_dir):
    """RDF-star decode (round-5): every order page asserts its price
    with a {| source ; confidence |} annotation block AND quotes its
    status unasserted via << >> subject position — so annotation
    emission, ground-statement-IRI minting (urn:rdfstar:<md5>), and
    memoized reification expansion are all load-bearing.  Closed-form
    oracle: DuckDB rebuilds the statement IRIs with ITS md5 over the
    same canonical key.  Same narrow mapInPandas stage as
    `turtle_parse`; `<<`/`{|` lines are provably unsafe for the arrow
    flat path (scheme-anchored IRI class) so the exact tokenizer runs."""
    docs = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("urn:doc:"), F.col("o_orderkey")).alias("url"),
        F.concat(
            F.lit("<urn:order:"), F.col("o_orderkey"),
            F.lit('> <urn:p:price> "'),
            F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
            F.lit('" {| <urn:p:src> <urn:crawl:'), F.col("o_orderkey") % 4,
            F.lit("> ; <urn:p:conf> 0.9 |} .\n"
                  "<< <urn:order:"), F.col("o_orderkey"),
            F.lit('> <urn:p:status> "'), F.col("o_orderstatus"),
            F.lit('" >> <urn:p:src> <urn:crawl:'), F.col("o_orderkey") % 4,
            F.lit("> .\n"),
        ).alias("text"),
    )
    tri = sources.parse_documents(_spread(docs), fmt="turtle",
                                  base_from_url=False)
    return tri.filter(F.col("err").isNull()).select(
        "s", "p", "o", F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype",
    )


def q_sparql_star(spark, sf_dir):
    """SPARQL-star quoted-triple patterns (round-5): two << ?ord
    <urn:p:price> ?price >> patterns (one joined to its source, one
    pinning confidence "0.9") over a store holding the reification
    encoding the star decoder emits.  Each quoted pattern desugars to a
    fresh ?_qt var + 4 reification patterns — a plain bgp_match
    equi-join tree, nothing stateful.  Closed-form oracle: the odd-key
    orders (the 0.9-confidence slice)."""
    from rdf_spark.sparql import sparql_select
    from rdf_spark.terms import KIND_IRI, KIND_LITERAL

    o = _t(spark, sf_dir, "orders")
    stmt = F.concat(F.lit("urn:stmt:"), F.col("o_orderkey"))
    ik = F.lit(KIND_IRI).cast("tinyint")
    lk = F.lit(KIND_LITERAL).cast("tinyint")
    nstr = F.lit(None).cast("string")
    price = F.col("o_totalprice").cast("decimal(12,2)").cast("string")
    conf = F.when(F.col("o_orderkey") % 2 == 1, "0.9").otherwise("0.4")

    def tri(p, obj, okind):
        return o.select(
            stmt.alias("s"), ik.alias("s_kind"), F.lit(p).alias("p"),
            obj.alias("o"), okind.alias("o_kind"),
            nstr.alias("o_datatype"), nstr.alias("o_lang"),
        )

    from rdf_spark.parsing import (
        RDF_OBJECT, RDF_PREDICATE, RDF_STATEMENT, RDF_SUBJECT,
    )
    from rdf_spark.terms import RDF_TYPE as _T

    store = (
        tri(_T, F.lit(RDF_STATEMENT), ik)
        .unionByName(tri(
            RDF_SUBJECT,
            F.concat(F.lit("urn:order:"), F.col("o_orderkey")), ik))
        .unionByName(tri(RDF_PREDICATE, F.lit("urn:p:price"), ik))
        .unionByName(tri(RDF_OBJECT, price, lk))
        .unionByName(tri(
            "urn:src",
            F.concat(F.lit("urn:crawl:"), F.col("o_orderkey") % 4), ik))
        .unionByName(tri("urn:conf", conf, lk))
    )
    return sparql_select(store, """
        SELECT ?ord ?price ?src WHERE {
            << ?ord <urn:p:price> ?price >> <urn:src> ?src .
            << ?ord <urn:p:price> ?price >> <urn:conf> "0.9"
        }
    """)


def q_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means (ops.cluster.kmeans, round-5): k=4,
    2 rounds from the lowest-vec_id seeds over the embeddings table.
    FULL replay oracle — distances are pre-rounded decimal sums
    (order-independent, bit-exact in both engines), argmin ties break
    on cluster id, centroid updates divide decimal sums as doubles,
    empty clusters keep their seed.  Per round: one narrow scan with k
    row-local distance folds + one map-side-combinable (cluster, dim)
    aggregation — only k x dim cells cross the shuffle."""
    from rdf_spark.ops.cluster import kmeans

    e = _spread(_t(spark, sf_dir, "embeddings"))
    assigned, _ = kmeans(e, k=4, n_iter=2)
    return assigned.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


def q_direct_map(spark, sf_dir):
    """W3C Direct Mapping (rdf_spark.directmap, round-5): the orders
    table → RDF with pk o_orderkey and fk o_custkey→customer, covering
    four datatype mappings (bigint→xsd:integer, varchar→plain,
    decimal→xsd:decimal, timestamp→xsd:dateTime) plus the rdf:type and
    ref- triples.  Closed-form oracle (6 UNION ALL branches).  ONE
    narrow scan — all of a row's triples are an exploded struct array,
    no per-column scan union, no shuffle."""
    from rdf_spark.directmap import direct_map

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_price"),
        "o_orderdate", "o_custkey",
    )
    t = direct_map(
        o, "orders", pk=["o_orderkey"],
        fks={"o_custkey": ("customer", "c_custkey")},
    )
    return t.select(
        "s", F.col("s_kind").cast("int").alias("s_kind"),
        "p", "o", F.col("o_kind").cast("int").alias("o_kind"),
        "o_datatype", "o_lang",
    )


def q_property_graph(spark, sf_dir):
    """RDF → labeled-property-graph projection
    (ops.propertygraph.to_property_graph, round-5): the three
    relational faces (typed nodes, literal properties, IRI edges) of a
    customer store, unioned as a kind-tagged scalar table so ONE oracle
    covers them.  Nodes = union + dedup hash-agg; properties/edges =
    pure filtered projections (predicate filters push into the
    scan)."""
    from rdf_spark.ops.propertygraph import to_property_graph
    from rdf_spark.terms import KIND_IRI, KIND_LITERAL, RDF_TYPE

    c = _t(spark, sf_dir, "customer")
    s = F.concat(F.lit("urn:cust/"), F.col("c_custkey"))
    ik = F.lit(KIND_IRI).cast("tinyint")
    lk = F.lit(KIND_LITERAL).cast("tinyint")
    nstr = F.lit(None).cast("string")
    triples = (
        c.select(
            s.alias("s"), ik.alias("s_kind"), F.lit(RDF_TYPE).alias("p"),
            F.lit("urn:ex#Customer").alias("o"), ik.alias("o_kind"),
            nstr.alias("o_datatype"), nstr.alias("o_lang"),
        )
        .unionByName(c.select(
            s.alias("s"), ik.alias("s_kind"),
            F.lit("urn:ex#name").alias("p"),
            F.col("c_name").alias("o"), lk.alias("o_kind"),
            nstr.alias("o_datatype"), nstr.alias("o_lang"),
        ))
        .unionByName(c.select(
            s.alias("s"), ik.alias("s_kind"),
            F.lit("urn:ex#inNation").alias("p"),
            F.concat(F.lit("urn:nation/"), F.col("c_nationkey")).alias("o"),
            ik.alias("o_kind"), nstr.alias("o_datatype"),
            nstr.alias("o_lang"),
        ))
    )
    nodes, props, edges = to_property_graph(triples)
    return (
        nodes.select(
            F.lit("node").alias("kind"), F.col("node_id").alias("a"),
            F.col("label").alias("b"), nstr.alias("c"),
        )
        .unionByName(props.select(
            F.lit("prop").alias("kind"), F.col("node_id").alias("a"),
            F.col("key").alias("b"), F.col("value").alias("c"),
        ))
        .unionByName(edges.select(
            F.lit("edge").alias("kind"), F.col("src").alias("a"),
            F.col("edge_type").alias("b"), F.col("dst").alias("c"),
        ))
    )


def q_graph_walks(spark, sf_dir):
    """Deterministic random walks (ops.walks.deterministic_walks,
    round-5): 2 walks of length 4 per start over a 20-node synthetic
    customer graph.  The per-step md5 hash lottery is replayed verbatim
    by the oracle (generated CTE rounds, min-md5 via rank window) — the
    walk corpus is identical at any parallelism.  Per step: one
    frontier-edges equi-join + one map-side-combinable min(struct)
    agg."""
    from rdf_spark.ops.walks import deterministic_walks

    c = _t(spark, sf_dir, "customer")
    edges = c.select(
        F.concat(F.lit("n"), F.col("c_custkey") % 20).alias("src"),
        F.concat(
            F.lit("n"),
            (F.col("c_custkey") % 20 + F.col("c_custkey") % 7 + 1) % 20,
        ).alias("dst"),
    )
    return deterministic_walks(edges, walk_len=4, n_walks=2)


_WALKS_SQL_ROUNDS = 4


def _walks_sql(rounds: int = _WALKS_SQL_ROUNDS) -> str:
    ctes = [
        """e AS (
            SELECT 'n' || (c_custkey % 20) AS src,
                   'n' || ((c_custkey % 20 + c_custkey % 7 + 1)
                           % 20) AS dst
            FROM customer
        )""",
        """f0 AS (
            SELECT DISTINCT src AS start, t.w AS walk, src AS node,
                   0 AS step
            FROM e, UNNEST([0, 1]) t(w)
        )""",
    ]
    for t in range(1, rounds):
        ctes.append(f"""f{t} AS (
            SELECT start, walk, v AS node, {t} AS step FROM (
                SELECT f.start, f.walk, e.dst AS v,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.start, f.walk
                           ORDER BY md5(f.start || '|' || f.walk
                                        || '|{t}|' || e.dst) ASC,
                                    e.dst ASC
                       ) AS rn
                FROM f{t - 1} f JOIN e ON f.node = e.src
            ) WHERE rn = 1
        )""")
    union = "\nUNION ALL\n".join(
        f"SELECT start, walk, step, node FROM f{t}" for t in range(rounds)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def q_shortest_paths(spark, sf_dir):
    """Weighted SSSP (ops.graph.shortest_paths, round-5): Bellman-Ford
    relaxation from n0 over a 20-node ring (weights 1-5 by residue)
    with weight-3 chords — shortcut-vs-ring tradeoffs make every
    relaxation round load-bearing.  Exact BIGINT distance sums; the
    oracle replays the rounds as generated MATERIALIZED CTEs (the
    k_core lesson: non-materialized round chains re-inline
    exponentially).  Per round: one frontier-edges equi-join + one
    map-side-combinable min agg."""
    from rdf_spark.ops.graph import shortest_paths

    c = _t(spark, sf_dir, "customer")
    r = F.col("c_custkey") % 20
    ring = c.select(
        F.concat(F.lit("n"), r).alias("src"),
        F.concat(F.lit("n"), (r + 1) % 20).alias("dst"),
        (r % 5 + 1).cast("bigint").alias("w"),
    )
    chord = c.select(
        F.concat(F.lit("n"), r).alias("src"),
        F.concat(F.lit("n"), (r + 5) % 20).alias("dst"),
        F.lit(3).cast("bigint").alias("w"),
    )
    srcs = spark.createDataFrame([("n0",)], "node string")
    return shortest_paths(
        ring.unionByName(chord), srcs, weight_col="w",
    )


def _sssp_sql(rounds: int = 20) -> str:
    ctes = [
        """nodes AS (SELECT DISTINCT c_custkey % 20 AS r FROM customer)""",
        """e AS MATERIALIZED (
            SELECT 'n' || r AS src, 'n' || ((r + 1) % 20) AS dst,
                   CAST(r % 5 + 1 AS BIGINT) AS w
            FROM nodes
            UNION ALL
            SELECT 'n' || r, 'n' || ((r + 5) % 20), 3 FROM nodes
        )""",
        """d0 AS (SELECT 'n0' AS node, CAST(0 AS BIGINT) AS dist)""",
    ]
    for t in range(rounds):
        ctes.append(f"""d{t + 1} AS MATERIALIZED (
            SELECT node, MIN(dist) AS dist FROM (
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d{t} d JOIN e ON d.node = e.src
                UNION ALL SELECT node, dist FROM d{t}
            ) GROUP BY node
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Turtle KG construction over sf0.001 (parse + canonical cols)."""
    _ship_package(spark)
    return q_turtle_parse(spark, "/root/testdata/sf0.001")


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _wrap(v) for k, v in _QUERIES.items()}


_QUERIES = {
        "nt_parse": q_nt_parse,
        "nquads_parse": q_nquads_parse,
        "turtle_parse": q_turtle_parse,
        "turtle_flat_parse": q_turtle_flat_parse,
        "trig_parse": q_trig_parse,
        "jsonld_parse": q_jsonld_parse,
        "rdfxml_parse": q_rdfxml_parse,
        "nt_serialize": q_nt_serialize,
        "iri_split": q_iri_split,
        "dedup_triples": q_dedup_triples,
        "typed_literals": q_typed_literals,
        "predicate_histogram": q_predicate_histogram,
        "namespace_histogram": q_namespace_histogram,
        "skolemize": q_skolemize,
        "turtle_encode": q_turtle_encode,
        "property_table": q_property_table,
        "bgp_match": q_bgp_match,
        "mention_count": q_mention_count,
        "entity_link": q_entity_link,
        "kg_pipeline": q_kg_pipeline,
        "pipeline_pr": q_pipeline_pr,
        "dedup_exact": q_dedup_exact,
        "fingerprint": q_fingerprint,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "lang_id_ngram": q_lang_id_ngram,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_near_dup": q_minhash_near_dup,
        "span_dedup": q_span_dedup,
        "dedup_clusters": q_dedup_clusters,
        "simhash": q_simhash,
        "winnow_overlap": q_winnow_overlap,
        "embedding_topk": q_embedding_topk,
        "ivf_topk": q_ivf_topk,
        "ivf_pq_topk": q_ivf_pq_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "tpch_q1": q_tpch_q1,
        "top_customers": q_top_customers,
        "events_sessionize": q_events_sessionize,
        "repetition_filter": q_repetition_filter,
        "deterministic_sample": q_deterministic_sample,
        "corpus_curate": q_corpus_curate,
        "domain_stats": q_domain_stats,
        "vocab_stats": q_vocab_stats,
        "label_centroids": q_label_centroids,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "bm25_search": q_bm25_search,
        "lm_score": q_lm_score,
        "quality_quantiles": q_quality_quantiles,
        "media_near_dup": q_media_near_dup,
        "sparql_select": q_sparql_select,
        "sparql_agg": q_sparql_agg,
        "sparql_path": q_sparql_path,
        "sparql_not_exists": q_sparql_not_exists,
        "sparql_bind": q_sparql_bind,
        "sparql_having": q_sparql_having,
        "sparql_lang": q_sparql_lang,
        "sparql_path_seq": q_sparql_path_seq,
        "sparql_path_unanchored": q_sparql_path_unanchored,
        "sparql_path_in_blocks": q_sparql_path_in_blocks,
        "sparql_path_graph": q_sparql_path_graph,
        "sparql_path_zero_or_one": q_sparql_path_zero_or_one,
        "sparql_path_grouped": q_sparql_path_grouped,
        "sparql_subquery": q_sparql_subquery,
        "sparql_update": q_sparql_update,
        "sparql_dataset": q_sparql_dataset,
        "sparql_describe_cbd": q_sparql_describe_cbd,
        "sparql_group_expr": q_sparql_group_expr,
        "sparql_hash": q_sparql_hash,
        "sparql_sameterm": q_sparql_sameterm,
        "sparql_datetime": q_sparql_datetime,
        "sparql_arith": q_sparql_arith,
        "sparql_builtins": q_sparql_builtins,
        "sparql_describe_var": q_sparql_describe_var,
        "sparql_minus": q_sparql_minus,
        "sparql_graph": q_sparql_graph,
        "sparql_funcs": q_sparql_funcs,
        "sparql_term_ctors": q_sparql_term_ctors,
        "sparql_order_expr": q_sparql_order_expr,
        "boilerplate_lines": q_boilerplate_lines,
        "decontaminate": q_decontaminate,
        "pack_sequences": q_pack_sequences,
        "pii_redact": q_pii_redact,
        "url_normalize": q_url_normalize,
        "unicode_normalize": q_unicode_normalize,
        "warc_parse": q_warc_parse,
        "wet_pipeline": q_wet_pipeline,
        "html_structured": q_html_structured,
        "html_links": q_html_links,
        "html_charset": q_html_charset,
        "main_text": q_main_text,
        "page_meta": q_page_meta,
        "canonical_dedup": q_canonical_dedup,
        "weighted_repeat": q_weighted_repeat,
        "embedding_decontaminate": q_embedding_decontaminate,
        "html_tables": q_html_tables,
        "feed_parse": q_feed_parse,
        "html_microdata": q_html_microdata,
        "anchor_priors": q_anchor_priors,
        "entity_disambiguation": q_entity_disambiguation,
        "robots_gate": q_robots_gate,
        "html_rdfa": q_html_rdfa,
        "sitemap_parse": q_sitemap_parse,
        "sparql_agg_expr": q_sparql_agg_expr,
        "host_cap": q_host_cap,
        "rdfs_closure": q_rdfs_closure,
        "sameas_resolve": q_sameas_resolve,
        "entity_resolve": q_entity_resolve,
        "triangle_count": q_triangle_count,
        "surt_key": q_surt_key,
        "cdxj_parse": q_cdxj_parse,
        "fetch_plan": q_fetch_plan,
        "recrawl_stats": q_recrawl_stats,
        "k_core": q_k_core,
        "classifier_score": q_classifier_score,
        "void_summary": q_void_summary,
        "void_property_partition": q_void_property_partition,
        "void_class_partition": q_void_class_partition,
        "shacl_report": q_shacl_report,
        "shacl_shapes": q_shacl_shapes,
        "chunk_documents": q_chunk_documents,
        "rdf_lists": q_rdf_lists,
        "wat_links": q_wat_links,
        "shacl_logic": q_shacl_logic,
        "dsir_weights": q_dsir_weights,
        "store_diff": q_store_diff,
        "label_propagation": q_label_propagation,
        "link_predict": q_link_predict,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "bigram_lm": q_bigram_lm,
        "rdf_canonicalize": q_rdf_canonicalize,
        "bpe_train": q_bpe_train,
        "duplicate_spans": q_duplicate_spans,
        "c4_clean": q_c4_clean,
        "owl_closure": q_owl_closure,
        "graph_digest": q_graph_digest,
        "mixture_weights": q_mixture_weights,
        "personalized_pagerank": q_personalized_pagerank,
        "scc": q_scc,
        "duplicated_fraction": q_duplicated_fraction,
        "embedding_covariance": q_embedding_covariance,
        "k_truss": q_k_truss,
        "turtle_star_parse": q_turtle_star_parse,
        "sparql_star": q_sparql_star,
        "kmeans": q_kmeans,
        "direct_map": q_direct_map,
        "property_graph": q_property_graph,
        "graph_walks": q_graph_walks,
        "shortest_paths": q_shortest_paths,
        "fuse_values": q_fuse_values,
        "hearst_hyponyms": q_hearst_hyponyms,
        "table_triples": q_table_triples,
        "table_triples_keyed": q_table_triples_keyed,
    }


from rdf_spark.terms import RDF_LANG_STRING as _RDF_LANG_STRING  # noqa: E402

_TG = textops.TRIGRAM_PATTERNS
_EN_STOP_SQL = "|".join(textops.EN_STOPWORDS)
_DE_STOP_SQL = "|".join(textops.DE_STOPWORDS)
_ALIAS_VALUES = ", ".join(f"('{s}', '{e}', {p})" for s, e, p in ALIASES)
_SURFACE_VALUES = ", ".join(f"('{s}')" for s in MENTION_SURFACES)
_NORM_TEXT = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

# deterministic-sample thresholds shared verbatim with ops.sample
from rdf_spark.ops.sample import md5_threshold as _md5_thr  # noqa: E402


def _bm25_sql() -> str:
    """DuckDB replay of ops.retrieval.bm25_rank for q_bm25_search.  Every
    float constant is the repr() of the exact double the Spark side uses
    (string→double parsing round-trips; native decimal literals differ
    at 1e-17), and per-term partials are pre-rounded + DECIMAL-summed so
    aggregation order cannot perturb the result."""
    from rdf_spark.ops.retrieval import bm25_constants

    c = bm25_constants()
    return rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
            FROM documents
        ),
        tok2 AS (SELECT * FROM toks WHERE term <> ''),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok2
               WHERE term IN ('hash', 'join', 'spark') GROUP BY doc_id, term),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        scored AS (
            SELECT t.doc_id,
                   round(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                         * t.tf * CAST('{c["k1_plus_1"]!r}' AS DOUBLE)
                         / (t.tf + CAST('{c["k1"]!r}' AS DOUBLE)
                            * (CAST('{c["one_minus_b"]!r}' AS DOUBLE)
                               + CAST('{c["b"]!r}' AS DOUBLE)
                                 * (d.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))),
                         9) AS ps
            FROM tf t JOIN dl d USING (doc_id) JOIN dfreq f USING (term)
            CROSS JOIN stats s
        )
        SELECT doc_id,
               round(CAST(SUM(CAST(ps AS DECIMAL(24,9))) AS DOUBLE), 6) AS bm25
        FROM scored GROUP BY doc_id
    """


_WHEEL_CHAIN_SQL = """w AS MATERIALIZED (
        SELECT n_nationkey AS g, s
        FROM nation CROSS JOIN (SELECT unnest(range(5)) AS s) t
    ),
    raw AS MATERIALIZED (
        SELECT 'h' || g AS a, 'w' || g || '_' || s AS b FROM w
        UNION ALL
        SELECT 'w' || g || '_' || s, 'w' || g || '_' || ((s + 1) % 5)
        FROM w
        UNION ALL SELECT 'h' || (doc_id % 25), 'p' || doc_id FROM documents
        UNION ALL SELECT 'p' || doc_id, 'q' || doc_id FROM documents
        UNION ALL SELECT 'q' || doc_id, 'r' || doc_id FROM documents
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        FROM raw WHERE a <> b
    )"""


def _lpa_sql(rounds: int = 3) -> str:
    """DuckDB replay of ops.graph.label_propagation's exact schedule
    over the shared wheel+chain graph: per round, neighbor-label votes
    + one self-vote, top-1 by (count DESC, label ASC)."""
    ctes = [_WHEEL_CHAIN_SQL, """adj AS MATERIALIZED (
        SELECT u AS node, v AS nbr FROM e0
        UNION ALL SELECT v, u FROM e0
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT node, node AS label FROM adj
    )"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""t{r} AS MATERIALIZED (
        SELECT node, label, COUNT(*) AS c FROM (
            SELECT a.node, l.label
            FROM adj a JOIN l{r - 1} l ON a.nbr = l.node
            UNION ALL SELECT node, label FROM l{r - 1}
        ) GROUP BY node, label
    ),
    l{r} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label ASC) AS rn
            FROM t{r}
        ) WHERE rn = 1
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, label FROM l{rounds}"
    )


def _link_predict_sql(max_degree: int = 8) -> str:
    """DuckDB replay of ops.graph.link_predict's wedge enumeration over
    the shared wheel+chain graph: same center-degree gate, same
    pre-rounded DECIMAL(24,9) Adamic-Adar fold (1 ulp of ln() absorbed
    by the 9-dp round), same cast-to-double Jaccard."""
    return f"""WITH {_WHEEL_CHAIN_SQL},
    adj AS MATERIALIZED (
        SELECT u AS node, v AS nbr FROM e0
        UNION ALL SELECT v, u FROM e0
    ),
    deg AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY node
    ),
    centers AS (
        SELECT a.node AS z, a.nbr, d.deg AS degz
        FROM adj a JOIN deg d USING (node)
        WHERE d.deg BETWEEN 2 AND {max_degree}
    ),
    pairs AS (
        SELECT l.nbr AS a, r.nbr AS b,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               round(CAST(SUM(CAST(round(
                   1.0 / ln(CAST(l.degz AS DOUBLE)), 9)
                   AS DECIMAL(24,9))) AS DOUBLE), 6) AS adamic_adar
        FROM centers l JOIN centers r ON l.z = r.z AND l.nbr < r.nbr
        GROUP BY l.nbr, r.nbr
    ),
    fresh AS (
        SELECT p.* FROM pairs p
        WHERE NOT EXISTS (
            SELECT 1 FROM e0 WHERE e0.u = p.a AND e0.v = p.b
        )
    )
    SELECT f.a, f.b, f.n_common,
           round(f.n_common
                 / CAST(da.deg + db.deg - f.n_common AS DOUBLE), 6)
               AS jaccard,
           f.adamic_adar
    FROM fresh f
    JOIN deg da ON da.node = f.a
    JOIN deg db ON db.node = f.b"""


def _ppr_sql(n_iter: int = 3) -> str:
    """DuckDB replay of ops.graph.personalized_pagerank over the
    q_pagerank synthetic graph with seeds {0..4}: CASE-gated restart
    mass, otherwise the exact _pagerank_sql numeric schedule (the
    damped constants written as the same IEEE op chain Python runs:
    (1.0-0.85)/5 and 1.0/5)."""
    seeds = "(0, 1, 2, 3, 4)"
    base = ("(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / 5")
    iters = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"it{i}"
        iters.append(f"""
            {cur} AS (
                SELECT n.node,
                       round(CASE WHEN n.node IN {seeds}
                                  THEN {base}
                                  ELSE CAST(0.0 AS DOUBLE) END
                             + CAST(0.85 AS DOUBLE)
                               * CAST(COALESCE(s.m, 0) AS DOUBLE), 12)
                           AS rank
                FROM pr_nodes n LEFT JOIN (
                    SELECT e.dst AS node,
                           SUM(CAST(round(r.rank / d.od, 14)
                                    AS DECIMAL(38,14))) AS m
                    FROM pr_edges e
                    JOIN {prev} r ON e.src = r.node
                    JOIN pr_deg d ON e.src = d.node
                    GROUP BY e.dst) s ON n.node = s.node
            )""")
        prev = cur
    return f"""
        WITH pr_edges AS (
            SELECT doc_id AS src, (doc_id*3+7) % 401 AS dst FROM documents
            UNION ALL SELECT doc_id, (doc_id*7+11) % 403 FROM documents
            UNION ALL SELECT doc_id, (doc_id*13+5) % 407 FROM documents
        ),
        pr_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM pr_edges
                UNION ALL SELECT dst FROM pr_edges)
        ),
        pr_deg AS (SELECT src AS node, COUNT(*) AS od
                   FROM pr_edges GROUP BY src),
        r0 AS (SELECT node,
                      CASE WHEN node IN {seeds}
                           THEN CAST(1.0 AS DOUBLE) / 5
                           ELSE CAST(0.0 AS DOUBLE) END AS rank
               FROM pr_nodes),
        {",".join(iters)}
        SELECT node, rank FROM {prev}
    """


def _bpe_sql(rounds: int = 8) -> str:
    """DuckDB replay of ops.bpe.train_bpe's exact merge schedule:
    per generated round, pair counts over the framed word-type
    vocabulary, top-1 by (count DESC, x, y), literal replace — the
    same greedy left-to-right semantics as the JVM replace."""
    s2 = "chr(31) || chr(31)"
    ctes = [f"""v0 AS MATERIALIZED (
        SELECT {s2} || array_to_string(string_split(w, ''), {s2}) || {s2}
                   AS seq,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                                '\\s+')) AS w
            FROM documents
        )
        WHERE w <> '' AND NOT contains(w, chr(31))
        GROUP BY w
    )"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""p{r} AS (
        SELECT a[i] AS x, a[i + 1] AS y, CAST(SUM(n) AS BIGINT) AS cnt
        FROM (
            SELECT list_filter(string_split(seq, {s2}), t -> t <> '') AS a,
                   n
            FROM v{r - 1}
        ) d, UNNEST(range(1, len(a))) AS u(i)
        GROUP BY 1, 2
    ),
    t{r} AS MATERIALIZED (
        SELECT {r} AS step, x, y FROM p{r}
        ORDER BY cnt DESC, x ASC, y ASC LIMIT 1
    ),
    v{r} AS MATERIALIZED (
        SELECT replace(seq,
                       chr(31) || x || {s2} || y || chr(31),
                       chr(31) || x || y || chr(31)) AS seq,
               n
        FROM v{r - 1} CROSS JOIN t{r}
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT CAST(step AS INT) AS step, x, y FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


def _kcore_sql(k: int = 3, rounds: int = 6) -> str:
    """DuckDB replay of ops.graph.k_core's peel schedule over the
    q_k_core synthetic graph: each generated round recomputes degrees
    over the surviving edge set and drops sub-k nodes — the planted
    pendant chains have structural peel depth 3, so 6 rounds are past
    the fixpoint at every scale."""
    ctes = ["""w AS MATERIALIZED (
        SELECT n_nationkey AS g, s
        FROM nation CROSS JOIN (SELECT unnest(range(5)) AS s) t
    ),
    raw AS MATERIALIZED (
        SELECT 'h' || g AS a, 'w' || g || '_' || s AS b FROM w
        UNION ALL
        SELECT 'w' || g || '_' || s, 'w' || g || '_' || ((s + 1) % 5)
        FROM w
        UNION ALL SELECT 'h' || (doc_id % 25), 'p' || doc_id FROM documents
        UNION ALL SELECT 'p' || doc_id, 'q' || doc_id FROM documents
        UNION ALL SELECT 'q' || doc_id, 'r' || doc_id FROM documents
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
        FROM raw WHERE a <> b
    )"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""n{r} AS MATERIALIZED (
        SELECT node FROM (
            SELECT u AS node FROM e{r - 1}
            UNION ALL SELECT v FROM e{r - 1}
        ) GROUP BY node HAVING COUNT(*) >= {k}
    ),
    e{r} AS MATERIALIZED (
        SELECT u, v FROM e{r - 1}
        WHERE u IN (SELECT node FROM n{r})
          AND v IN (SELECT node FROM n{r})
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT DISTINCT node FROM (
        SELECT u AS node FROM e{rounds}
        UNION ALL SELECT v FROM e{rounds}
    ) t"""
    )


def _pagerank_sql(n_iter: int = 3) -> str:
    """DuckDB replay of ops.graph.pagerank's exact numeric schedule over
    the q_pagerank synthetic graph.  The damped-base constant is written
    as CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE) so the engine performs
    the SAME IEEE subtraction Python does ((1.0-0.85) =
    0.15000000000000002 — a DuckDB decimal literal 0.15 would differ at
    1e-17 and occasionally flip the 12-dp rounding)."""
    iters = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"it{i}"
        iters.append(f"""
            {cur} AS (
                SELECT n.node,
                       round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / m.n
                             + CAST(0.85 AS DOUBLE)
                               * CAST(COALESCE(s.m, 0) AS DOUBLE), 12) AS rank
                FROM pr_nodes n CROSS JOIN pr_meta m LEFT JOIN (
                    SELECT e.dst AS node,
                           SUM(CAST(round(r.rank / d.od, 14)
                                    AS DECIMAL(38,14))) AS m
                    FROM pr_edges e
                    JOIN {prev} r ON e.src = r.node
                    JOIN pr_deg d ON e.src = d.node
                    GROUP BY e.dst) s ON n.node = s.node
            )""")
        prev = cur
    return f"""
        WITH pr_edges AS (
            SELECT doc_id AS src, (doc_id*3+7) % 401 AS dst FROM documents
            UNION ALL SELECT doc_id, (doc_id*7+11) % 403 FROM documents
            UNION ALL SELECT doc_id, (doc_id*13+5) % 407 FROM documents
        ),
        pr_nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM pr_edges
                UNION ALL SELECT dst FROM pr_edges)
        ),
        pr_meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pr_nodes),
        pr_deg AS (SELECT src AS node, COUNT(*) AS od FROM pr_edges GROUP BY src),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / m.n AS rank
               FROM pr_nodes CROSS JOIN pr_meta m),
        {",".join(iters)}
        SELECT node, rank FROM {prev}
    """

# repetition signals over a `docs(doc_id, text, ...)` relation — the SQL
# mirror of ops.text.repetition_features' JVM expressions.  Guards follow
# token_count_col (trimmed-empty text → 0 tokens).
_REP_RAW = r"""
    SELECT *,
           list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS _lines,
           list_filter(string_split(text, chr(10) || chr(10)),
                       x -> trim(x) <> '') AS _paras,
           regexp_split_to_array(trim(text), '\s+') AS _toks,
           CASE WHEN trim(text) = '' THEN 0
                ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS _ntok
"""
_REP_SIGNALS = """
    SELECT *,
           length(_lines) AS n_lines,
           CASE WHEN length(_lines) > 0
                THEN (length(_lines) - length(list_distinct(_lines))) / length(_lines)
                ELSE 0 END AS dl,
           CASE WHEN length(_paras) > 0
                THEN (length(_paras) - length(list_distinct(_paras))) / length(_paras)
                ELSE 0 END AS dp,
           CASE WHEN _ntok > 0
                THEN (_ntok - length(list_distinct(_toks))) / _ntok
                ELSE 0 END AS dt,
           CASE WHEN _ntok > 0
                THEN list_sum(list_transform(_toks, x -> length(x))) / _ntok
                ELSE 0 END AS mwl
"""
_REP_KEEP = "(dl <= 0.3 AND dp <= 0.3 AND dt <= 0.6 AND mwl >= 2.0 AND mwl <= 12.0)"

# quality-score expression pieces (same formula as the quality_score oracle)
_Q_FEATURES = rf"""
    SELECT *,
           length(text) AS _nch,
           length(regexp_extract_all(text, '[^\w\s]')) AS _npu,
           length(regexp_extract_all(lower(text), '\b({_EN_STOP_SQL})\b')) AS _nst
"""
_Q_SCORE = """
    round(0.4 * least(_ntok / 64.0, 1.0)
        + 0.3 * (1.0 - CASE WHEN _nch > 0 THEN _npu / _nch ELSE 0 END)
        + 0.3 * least(CASE WHEN _ntok > 0 THEN _nst / _ntok ELSE 0 END * 8.0,
                      1.0), 6)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "nt_parse": f"""
            SELECT 'urn:order:' || o_orderkey AS s, 'urn:p:status' AS p,
                   o_orderstatus AS o,
                   '{XSD_STRING}' AS o_datatype
            FROM orders
        """,
        "nquads_parse": """
            SELECT 'urn:order:' || o_orderkey AS s, 'urn:p:prio' AS p,
                   o_orderpriority AS o, 'urn:g:' || o_custkey AS graph
            FROM orders
        """,
        "turtle_parse": f"""
            SELECT 'urn:cust:' || c_custkey AS s, 'urn:ex:name' AS p,
                   c_name AS o, 2 AS o_kind,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString' AS o_datatype,
                   'en' AS o_lang
            FROM customer
            UNION ALL
            SELECT 'urn:cust:' || c_custkey, 'urn:ex:nation',
                   CAST(c_nationkey AS VARCHAR), 2,
                   '{XSD_INTEGER}', NULL
            FROM customer
            UNION ALL
            SELECT 'urn:cust:' || c_custkey,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                   'urn:ex:Customer', 1, NULL, NULL
            FROM customer
        """,
        "turtle_flat_parse": f"""
            SELECT 'urn:order:' || o_orderkey AS s,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'urn:ex:Order' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype
            FROM orders
            UNION ALL
            SELECT 'urn:order:' || o_orderkey, 'urn:p:prio',
                   o_orderpriority, 2, '{XSD_STRING}'
            FROM orders
            UNION ALL
            SELECT 'urn:order:' || o_orderkey, 'urn:p:total',
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 2,
                   '{_XSD_DECIMAL}'
            FROM orders
        """,
        "trig_parse": f"""
            SELECT 'urn:sup:' || s_suppkey AS s, 'urn:p:name' AS p,
                   s_name AS o, 2 AS o_kind, '{XSD_STRING}' AS o_datatype,
                   'urn:g:' || s_nationkey AS graph, 1 AS graph_kind
            FROM supplier
            UNION ALL
            SELECT 'urn:sup:' || s_suppkey, 'urn:p:acct',
                   CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS VARCHAR), 2,
                   '{_XSD_DECIMAL}', '_:defaultGraph', 0
            FROM supplier
        """,
        "jsonld_parse": f"""
            SELECT 'urn:part:' || p_partkey AS s,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'urn:v:Part' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype
            FROM part
            UNION ALL
            SELECT 'urn:part:' || p_partkey, 'urn:v:name', p_name, 2,
                   '{XSD_STRING}'
            FROM part
            UNION ALL
            SELECT 'urn:part:' || p_partkey, 'urn:v:size',
                   CAST(p_size AS VARCHAR), 2, '{XSD_INTEGER}'
            FROM part
        """,
        "rdfxml_parse": f"""
            SELECT 'http://ex.org/nation/' || n_nationkey AS s,
                   'http://ex.org/v#name' AS p,
                   n_name AS o, '{XSD_STRING}' AS o_datatype
            FROM nation
            UNION ALL
            SELECT 'http://ex.org/nation/' || n_nationkey, 'http://ex.org/v#region',
                   'http://ex.org/region/' || n_regionkey, NULL
            FROM nation
        """,
        "nt_serialize": """
            SELECT 'urn:part:' || p_partkey AS s,
                   '<urn:part:' || p_partkey || '> <urn:p:name> "' ||
                   replace(replace(replace(replace(
                       p_name || '"x\\y' || chr(10) || p_brand,
                       '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'), chr(13), '\\r')
                   || '" .' AS nt_line
            FROM part
        """,
        "iri_split": """
            SELECT s_suppkey,
                   regexp_extract('http://ex.org/sup#' || replace(s_name, ' ', '_'),
                                  '^(.*[/#])[^/#]*$', 1) AS ns,
                   regexp_extract('http://ex.org/sup#' || replace(s_name, ' ', '_'),
                                  '^.*[/#]([^/#]*)$', 1) AS local
            FROM supplier
        """,
        "dedup_triples": """
            SELECT DISTINCT 'urn:order:' || l_orderkey AS s, l_returnflag AS o
            FROM lineitem
        """,
        "typed_literals": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS lex,
                   o_orderdate AS ts_typed,
                   o_orderdate AS ts_custom,
                   hex(encode(o_orderpriority)) AS byte_hex
            FROM orders
        """,
        "predicate_histogram": """
            SELECT 'urn:p:prio-' || regexp_replace(o_orderpriority, '[^A-Z0-9]', '_', 'g') AS p,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1
        """,
        "namespace_histogram": """
            WITH iris AS (
                SELECT 'http://ex.org/part/' || p_partkey AS iri FROM part
                UNION ALL SELECT 'http://ex.org/v#size' FROM part
                UNION ALL SELECT 'http://ex.org/size#' || p_size FROM part
            )
            SELECT regexp_extract(iri, '^(.*[/#])[^/#]*$', 1) AS ns,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM iris GROUP BY 1
        """,
        "skolemize": """
            SELECT CAST(doc_id AS VARCHAR) AS url, 'a' AS s_local, 'b' AS o_local,
                   0 AS s_kind, 0 AS o_kind, TRUE AS hash_consistent
            FROM documents
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'b', 'x', 0, 2, TRUE
            FROM documents
        """,
        "turtle_encode": """
            SELECT 'urn:nation:' || n_nationkey AS s, 'urn:p:name' AS p,
                   n_name AS o
            FROM nation
        """,
        "property_table": """
            SELECT 'urn:cust:' || c_custkey AS s, c_name AS name,
                   CAST(c_nationkey AS VARCHAR) AS nation
            FROM customer
        """,
        "bgp_match": """
            SELECT DISTINCT 'urn:cust:' || c_custkey AS c,
                   'urn:nation:' || c_nationkey AS n,
                   n_name AS nm
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
        "mention_count": f"""
            WITH s(surface) AS (VALUES {_SURFACE_VALUES})
            SELECT CAST(d.doc_id AS VARCHAR) AS url, s.surface,
                   CAST(length(regexp_extract_all(d.text, s.surface)) AS BIGINT) AS n_hits
            FROM documents d CROSS JOIN s
            WHERE length(regexp_extract_all(d.text, s.surface)) > 0
        """,
        "entity_link": f"""
            WITH s(surface) AS (VALUES {_SURFACE_VALUES}),
            m AS (
                SELECT CAST(d.doc_id AS VARCHAR) AS url, s.surface,
                       length(regexp_extract_all(d.text, s.surface)) AS n_hits
                FROM documents d CROSS JOIN s
                WHERE length(regexp_extract_all(d.text, s.surface)) > 0
            ),
            a(surface, entity_iri, prior) AS (VALUES {_ALIAS_VALUES}),
            scored AS (
                SELECT m.url, m.surface, a.entity_iri,
                       a.prior * ln(1 + m.n_hits) AS score,
                       row_number() OVER (PARTITION BY m.url, m.surface
                                          ORDER BY a.prior * ln(1 + m.n_hits) DESC,
                                                   a.entity_iri) AS rk
                FROM m JOIN a USING (surface)
            )
            SELECT url, surface, entity_iri, round(score, 6) AS score
            FROM scored WHERE rk = 1
        """,
        "pipeline_pr": """
            SELECT CAST(1.0 AS DOUBLE) AS precision,
                   CAST(1.0 AS DOUBLE) AS recall
        """,
        "kg_pipeline": f"""
            WITH c AS (
                SELECT c_custkey, c_name, c_nationkey,
                       'https://kg.test/c/' || c_custkey AS url,
                       (c_custkey % 41 = 0) AS broken,
                       (['spark','window','merge','batch','scan'])[(c_custkey % 5) + 1]
                           AS surface
                FROM customer
            ),
            best(surface, entity) AS (VALUES
                ('spark','urn:tool:spark'), ('window','urn:op:window'),
                ('merge','urn:op:merge'), ('batch','urn:op:batch'),
                ('scan','urn:op:scan'))
            SELECT url, url || '#c' AS s, 1 AS s_kind,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'urn:ex:Customer' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype,
                   CAST(NULL AS VARCHAR) AS o_lang, TRUE AS hash_ok
            FROM c WHERE NOT broken
            UNION ALL
            SELECT url, url || '#c', 1, 'urn:ex:name', c_name, 2,
                   '{XSD_STRING}', NULL, TRUE
            FROM c WHERE NOT broken
            UNION ALL
            SELECT url, url || '#c', 1, 'urn:ex:rating',
                   c_nationkey || '.5', 2, '{_XSD_DECIMAL}', NULL, TRUE
            FROM c WHERE NOT broken
            UNION ALL
            SELECT url, url || '#c', 1, 'urn:ex:addr', 'b1', 0, NULL, NULL, TRUE
            FROM c WHERE NOT broken
            UNION ALL
            SELECT url, 'b1', 0, 'urn:ex:nation', CAST(c_nationkey AS VARCHAR), 2,
                   '{_RDF_LANG_STRING}', 'en', TRUE
            FROM c WHERE NOT broken
            UNION ALL
            SELECT url, url, 1, 'http://kg.example/vocab#mentions',
                   b.entity, 1, NULL, NULL, TRUE
            FROM c JOIN best b USING (surface)
        """,
        # closed-form: the planted 5-gram is the only duplicated window
        # (filler tokens are doc-unique); keeper = globally-first (doc 0)
        "span_dedup": """
            WITH base AS (
                SELECT doc_id,
                       'a'||doc_id||' b'||doc_id||' c'||doc_id AS head,
                       'd'||doc_id||' e'||doc_id||' f'||doc_id||' g'
                         ||doc_id||' h'||doc_id AS tail
                FROM documents
            )
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 4 = 0 AND doc_id = 0
                       THEN head||' P0 P1 P2 P3 P4 '||tail
                     ELSE head||' '||tail
                   END AS dedup_text,
                   CAST(CASE WHEN doc_id % 4 = 0 AND doc_id != 0
                             THEN 5 ELSE 0 END AS BIGINT) AS n_removed_tokens
            FROM base
        """,
        "minhash_near_dup": """
            SELECT doc_id AS a, doc_id + 1000000 AS b,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM documents WHERE doc_id < 20
        """,
        "dedup_clusters": """
            WITH nodes AS (
                SELECT doc_id AS node FROM documents
                UNION ALL
                SELECT doc_id + 1000000 FROM documents WHERE doc_id < 20
            )
            SELECT node,
                   CASE
                       WHEN node >= 1000000 THEN node - 1000000
                       WHEN node BETWEEN 40 AND 49 THEN 40
                       ELSE node
                   END AS cluster
            FROM nodes
        """,
        "winnow_overlap": """
            SELECT doc_id AS a, doc_id + 1000000 AS b,
                   CAST(1.0 AS DOUBLE) AS containment
            FROM documents WHERE doc_id < 20
        """,
        "simhash": """
            SELECT doc_id, CAST(0 AS INTEGER) AS hamming_rev,
                   CAST(0 AS INTEGER) AS hamming_dbl
            FROM documents
        """,
        "embedding_near_dup": """
            SELECT vec_id AS a, vec_id + 1000000 AS b,
                   CAST(1.0 AS DOUBLE) AS sim
            FROM embeddings WHERE vec_id < 10
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM_TEXT}) AS fp,
                   MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1
        """,
        "fingerprint": f"""
            SELECT doc_id, md5({_NORM_TEXT}) AS fingerprint FROM documents
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                       AS n_ws_tokens,
                   CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                       AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "quality_score": rf"""
            WITH f AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                       length(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                       length(regexp_extract_all(lower(text), '\b({_EN_STOP_SQL})\b'))
                           AS n_stop
                FROM documents
            )
            SELECT doc_id,
                   CAST(n_chars AS BIGINT) AS q_chars,
                   CAST(n_tokens AS BIGINT) AS q_tokens,
                   round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END, 6)
                       AS q_punct_ratio,
                   round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END, 6)
                       AS q_stopword_ratio,
                   round(0.4 * least(n_tokens / 64.0, 1.0)
                       + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END)
                       + 0.3 * least(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END
                                     * 8.0, 1.0), 6) AS q_score
            FROM f
        """,
        "lang_id": rf"""
            WITH f AS (
                SELECT doc_id,
                       length(regexp_extract_all(lower(text), '\b({_EN_STOP_SQL})\b')) AS en,
                       length(regexp_extract_all(lower(text), '\b({_DE_STOP_SQL})\b')) AS de
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN en > de AND en > 0 THEN 'en'
                        WHEN de > en AND de > 0 THEN 'de'
                        ELSE 'und' END AS lang_guess
            FROM f
        """,
        "lang_id_ngram": rf"""
            WITH s AS (
                SELECT doc_id,
                       length(regexp_extract_all(' ' || lower(text) || ' ',
                           '{_TG["en"]}')) AS en,
                       length(regexp_extract_all(' ' || lower(text) || ' ',
                           '{_TG["de"]}')) AS de,
                       length(regexp_extract_all(' ' || lower(text) || ' ',
                           '{_TG["fr"]}')) AS fr,
                       length(regexp_extract_all(' ' || lower(text) || ' ',
                           '{_TG["es"]}')) AS es
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                        WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                        WHEN fr >= es AND fr > 0 THEN 'fr'
                        WHEN es > 0 THEN 'es'
                        ELSE 'und' END AS lang_guess
            FROM s
        """,
        "ngram_jaccard": r"""
            WITH t AS (
                SELECT doc_id,
                       list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
                FROM documents WHERE doc_id < 40
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(CAST(length(list_intersect(a.toks, b.toks)) AS DOUBLE)
                         / length(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
            FROM t a JOIN t b ON a.doc_id < b.doc_id
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])), 6) AS sim
                FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
                SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id) AS INT) AS rank
                FROM scored
            )
            SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 3
        """,
        "ivf_topk": """
            SELECT vec_id AS query_id, vec_id,
                   CAST(1.0 AS DOUBLE) AS sim, 1 AS rank
            FROM embeddings WHERE vec_id < 5
            UNION ALL
            SELECT vec_id, vec_id + 1000000, CAST(1.0 AS DOUBLE), 2
            FROM embeddings WHERE vec_id < 5
        """,
        "ivf_pq_topk": """
            SELECT vec_id AS query_id, vec_id,
                   CAST(1.0 AS DOUBLE) AS sim, 1 AS rank
            FROM embeddings WHERE vec_id < 5
            UNION ALL
            SELECT vec_id, vec_id + 1000000, CAST(1.0 AS DOUBLE), 2
            FROM embeddings WHERE vec_id < 5
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(SUM(l_quantity), 2) AS sum_qty,
                   round(SUM(l_extendedprice), 2) AS sum_base_price,
                   round(AVG(l_discount), 6) AS avg_disc,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            WITH agg AS (
                SELECT o_custkey, round(SUM(o_totalprice), 2) AS total
                FROM orders GROUP BY o_custkey
            ),
            ranked AS (
                SELECT o_custkey AS custkey, c_name, total,
                       CAST(row_number() OVER (ORDER BY total DESC, o_custkey) AS INT) AS rk
                FROM agg JOIN customer ON o_custkey = c_custkey
            )
            SELECT custkey, c_name, total, rk FROM ranked WHERE rk <= 10
        """,
        "events_sessionize": """
            WITH g AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               IS NULL
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            ),
            s AS (
                SELECT user_id, value,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM g
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   round(SUM(value), 4) AS sum_value
            FROM s GROUP BY user_id, session_id
        """,
        "repetition_filter": f"""
            WITH raw AS ({_REP_RAW} FROM documents),
            sig AS ({_REP_SIGNALS} FROM raw)
            SELECT doc_id,
                   CAST(n_lines AS BIGINT) AS rep_lines,
                   round(dl, 6) AS rep_dup_line_frac,
                   round(dp, 6) AS rep_dup_para_frac,
                   round(dt, 6) AS rep_dup_token_frac,
                   round(mwl, 6) AS rep_mean_word_len,
                   {_REP_KEEP} AS rep_keep
            FROM sig
        """,
        "deterministic_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) <
                  CASE lang WHEN 'en' THEN '{_md5_thr(1.0)}'
                            WHEN 'de' THEN '{_md5_thr(0.5)}'
                            WHEN 'fr' THEN '{_md5_thr(0.25)}'
                            ELSE '{_md5_thr(0.1)}' END
        """,
        "corpus_curate": f"""
            WITH RECURSIVE docs AS (
                SELECT doc_id, text, lang FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text, lang FROM documents
                WHERE doc_id < 20
            ),
            raw AS ({_REP_RAW} FROM docs),
            qf AS ({_Q_FEATURES} FROM raw),
            sig AS ({_REP_SIGNALS} FROM qf),
            flags AS (
                SELECT doc_id, lang,
                       md5({_NORM_TEXT}) AS fp,
                       COALESCE(lang IN ('en', 'de'), FALSE) AS lang_ok,
                       ({_Q_SCORE} >= 0.7) AS qual_ok,
                       {_REP_KEEP} AS rep_ok
                FROM sig
            ),
            reps AS (
                SELECT fp, MIN(doc_id) AS rep_id FROM flags
                WHERE lang_ok AND qual_ok AND rep_ok GROUP BY fp
            ),
            survivors AS (
                SELECT f.doc_id, d.text FROM flags f
                JOIN reps r ON f.fp = r.fp AND f.doc_id = r.rep_id
                JOIN docs d ON d.doc_id = f.doc_id
                WHERE f.lang_ok AND f.qual_ok AND f.rep_ok
            ),
            -- near-dup stage oracle: the datagen near-dups append ' dup'
            -- k times; the operator's unigram-jaccard verify reduces to
            -- a closed form (token sets differ by at most 'dup')
            nd_cand AS (
                SELECT s1.doc_id AS a, s2.doc_id AS b, s1.text AS ta
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup dup dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup dup dup dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup dup dup dup dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup dup dup dup dup dup'
                UNION ALL SELECT s1.doc_id, s2.doc_id, s1.text
                FROM survivors s1 JOIN survivors s2
                  ON s2.text = s1.text || ' dup dup dup dup dup dup dup dup'
            ),
            nd_edge AS (
                SELECT a, b FROM (
                    SELECT a, b,
                           list_distinct(regexp_split_to_array(
                               trim(lower(ta)), '\\s+')) AS toks
                    FROM nd_cand) t
                WHERE list_contains(toks, 'dup')
                   OR round(len(toks) * 1.0 / (len(toks) + 1), 6) >= 0.95
            ),
            nd_bi AS (
                SELECT a, b FROM nd_edge UNION SELECT b, a FROM nd_edge
            ),
            nd_reach AS (
                SELECT a AS node, a AS r FROM nd_bi
                UNION
                SELECT nr.node, e.b FROM nd_reach nr
                JOIN nd_bi e ON e.a = nr.r
            ),
            nd_drop AS (
                SELECT node FROM (
                    SELECT node, MIN(r) AS comp FROM nd_reach GROUP BY node
                ) c WHERE node <> comp
            )
            SELECT f.doc_id,
                   CASE WHEN NOT f.lang_ok THEN 'lang'
                        WHEN NOT f.qual_ok THEN 'quality'
                        WHEN NOT f.rep_ok THEN 'repetition'
                        WHEN f.doc_id <> r.rep_id THEN 'duplicate'
                        WHEN nd.node IS NOT NULL THEN 'near_dup'
                        WHEN md5(CAST(f.doc_id AS VARCHAR)) >= '{_md5_thr(0.8)}'
                             THEN 'sampled_out'
                        ELSE NULL END AS drop_reason
            FROM flags f LEFT JOIN reps r ON f.fp = r.fp
            LEFT JOIN nd_drop nd ON f.doc_id = nd.node
        """,
        "domain_stats": f"""
            WITH raw AS ({_REP_RAW} FROM documents),
            qf AS ({_Q_FEATURES} FROM raw),
            perdoc AS (
                SELECT source, lang, _ntok, {_Q_SCORE} AS q FROM qf
            )
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(_ntok) AS BIGINT) AS total_tokens,
                   round(CAST(SUM(CAST(q AS DECIMAL(12,6))) AS DOUBLE)
                         / COUNT(*), 6) AS avg_quality,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
            FROM perdoc GROUP BY source
        """,
        "vocab_stats": r"""
            WITH toks AS (
                SELECT lang,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                FROM documents
            )
            SELECT lang,
                   CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM toks WHERE token <> '' GROUP BY lang
        """,
        # dim=64 is the testdata embedding dimensionality (DuckDB's range()
        # cannot take a lateral len(embedding) argument)
        "label_centroids": """
            WITH ex AS (
                SELECT label, i AS pos, embedding[i+1] AS v
                FROM embeddings CROSS JOIN range(64) AS t(i)
            ),
            agg AS (
                SELECT label, pos, round(AVG(v), 6) AS v
                FROM ex GROUP BY label, pos
            )
            SELECT a.label, CAST(a.pos AS INT) AS pos, a.v AS value, n.n_vecs
            FROM agg a
            JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
                  FROM embeddings GROUP BY label) n USING (label)
        """,
        "pagerank": _pagerank_sql(3),
        "hits": _hits_sql(2),
        "bm25_search": _bm25_sql(),
        "lm_score": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                FROM documents
            ),
            tok2 AS (SELECT * FROM toks WHERE term <> ''),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM tok2 GROUP BY doc_id, term),
            cstats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ct
                       FROM tok2 GROUP BY term),
            totals AS (SELECT CAST(SUM(ct) AS BIGINT) AS t_total,
                              CAST(COUNT(*) AS BIGINT) AS v_size FROM cstats),
            term_nll AS (
                SELECT term,
                       round(-ln((ct + 0.5)
                                 / (CAST(t_total AS DOUBLE) + 0.5 * v_size)),
                             12) AS nll
                FROM cstats CROSS JOIN totals
            ),
            contrib AS (
                SELECT t.doc_id,
                       CAST(round(t.tf * n.nll, 9) AS DECIMAL(28,9)) AS c,
                       t.tf
                FROM tf t JOIN term_nll n USING (term)
            )
            SELECT doc_id,
                   round(CAST(SUM(c) AS DOUBLE) / SUM(tf), 6) AS lm_nll,
                   CAST(SUM(tf) AS BIGINT) AS n_tokens
            FROM contrib GROUP BY doc_id
        """,
        # recompute the exact RDFC-1.0 first-degree hash inputs (_:a/_:z
        # substituted N-Quads, sorted, newline-terminated) and rank them
        "rdf_canonicalize": """
            WITH b AS (
                SELECT doc_id, r.j, 'd' || doc_id || '_v' || r.j AS lit
                FROM documents, UNNEST(range(3)) AS r(j)
            ),
            h AS (
                SELECT doc_id, lit,
                       CASE j
                           WHEN 0 THEN sha256(
                               '_:a <urn:p> "' || lit || '" .' || chr(10)
                               || '_:a <urn:q> _:z .' || chr(10))
                           WHEN 1 THEN sha256(
                               '_:a <urn:p> "' || lit || '" .' || chr(10)
                               || '_:z <urn:q> _:a .' || chr(10))
                           ELSE sha256(
                               '_:a <urn:p> "' || lit || '" .' || chr(10))
                       END AS fdh
                FROM b
            )
            SELECT doc_id, lit,
                   '_:c14n' || CAST(ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY fdh) - 1 AS VARCHAR)
                       AS label
            FROM h
        """,
        # same pow→round9→decimal-sum schedule, alpha literal 0.5 exact
        "mixture_weights": """
            WITH c AS (
                SELECT 'd' || least(doc_id % 10, 3) AS dom,
                       CAST(COUNT(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY 1
            ),
            w AS (
                SELECT dom, n_docs,
                       CAST(round(pow(CAST(n_docs AS DOUBLE), 0.5), 9)
                            AS DECIMAL(28,9)) AS c
                FROM c
            ),
            t AS (SELECT SUM(c) AS den, SUM(n_docs) AS n FROM w)
            SELECT dom, n_docs,
                   round(CAST(c AS DOUBLE) / CAST(den AS DOUBLE), 6)
                       AS weight,
                   round(CAST(c AS DOUBLE) / CAST(den AS DOUBLE)
                         * CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                       AS repeat_factor
            FROM w CROSS JOIN t
        """,
        # construct the canonical N-Quads doc in SQL (ranked labels,
        # sorted newline-terminated lines) and sha256 it independently
        "graph_digest": """
            WITH b AS (
                SELECT doc_id, r.j AS j,
                       'g' || (doc_id % 50) || '_v' || r.j AS lit
                FROM documents, UNNEST(range(3)) AS r(j)
            ),
            h AS (
                SELECT doc_id, j, lit,
                       CASE j
                           WHEN 0 THEN sha256(
                               '_:a <urn:p> "' || lit || '" .' || chr(10)
                               || '_:a <urn:q> _:z .' || chr(10))
                           WHEN 1 THEN sha256(
                               '_:a <urn:p> "' || lit || '" .' || chr(10)
                               || '_:z <urn:q> _:a .' || chr(10))
                           ELSE sha256(
                               '_:a <urn:p> "' || lit || '" .' || chr(10))
                       END AS fdh
                FROM b
            ),
            lab AS (
                SELECT doc_id, j, lit,
                       '_:c14n' || CAST(ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY fdh) - 1
                           AS VARCHAR) AS label
                FROM h
            ),
            lines AS (
                SELECT doc_id,
                       label || ' <urn:p> "' || lit || '" .' || chr(10)
                           AS line
                FROM lab
                UNION ALL
                SELECT a.doc_id,
                       a.label || ' <urn:q> ' || b.label || ' .'
                           || chr(10)
                FROM lab a JOIN lab b
                  ON a.doc_id = b.doc_id AND a.j = 0 AND b.j = 1
            )
            SELECT doc_id,
                   sha256(array_to_string(list_sort(list(line)), ''))
                       AS digest,
                   CAST(4 AS BIGINT) AS n_triples
            FROM lines GROUP BY doc_id
        """,
        # same interpolation arithmetic order, same 12/9-dp rounds,
        # same DECIMAL(28,9) fold as the Spark side (lm_score pattern)
        "bigram_lm": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS a
                FROM documents
            ),
            big AS (
                SELECT doc_id, a[i] AS v, a[i + 1] AS w
                FROM docs, UNNEST(range(1, len(a))) AS r(i)
            ),
            tf AS (SELECT doc_id, v, w, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM big GROUP BY 1, 2, 3),
            cvw AS (SELECT v, w, CAST(COUNT(*) AS BIGINT) AS cvw
                    FROM big GROUP BY 1, 2),
            cleft AS (SELECT v, CAST(SUM(cvw) AS BIGINT) AS cl
                      FROM cvw GROUP BY 1),
            toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)),
                                                    '\s+')) AS term
                FROM documents
            ),
            tok2 AS (SELECT * FROM toks WHERE term <> ''),
            cstats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ct
                       FROM tok2 GROUP BY term),
            totals AS (SELECT CAST(SUM(ct) AS BIGINT) AS t_total,
                              CAST(COUNT(*) AS BIGINT) AS v_size
                       FROM cstats),
            types AS (
                SELECT c.v, c.w,
                       round(-ln(0.75 * (CAST(c.cvw AS DOUBLE) / l.cl)
                                 + 0.25 * ((s.ct + 0.5)
                                           / (CAST(t.t_total AS DOUBLE)
                                              + 0.5 * t.v_size))),
                             12) AS nll
                FROM cvw c JOIN cleft l USING (v)
                JOIN cstats s ON s.term = c.w
                CROSS JOIN totals t
            ),
            contrib AS (
                SELECT f.doc_id,
                       CAST(round(f.tf * y.nll, 9) AS DECIMAL(28,9)) AS c,
                       f.tf
                FROM tf f JOIN types y USING (v, w)
            )
            SELECT doc_id,
                   round(CAST(SUM(c) AS DOUBLE) / SUM(tf), 6) AS lm2_nll,
                   CAST(SUM(tf) AS BIGINT) AS n_bigrams
            FROM contrib GROUP BY doc_id
        """,
        "media_near_dup": """
            SELECT doc_id AS a, doc_id + 1000000 AS b,
                   CAST(1.0 AS DOUBLE) AS sim
            FROM documents WHERE doc_id < 20
        """,
        "sparql_select": """
            SELECT 'urn:cust:' || c.c_custkey AS c, n.n_name AS nm,
                   CASE WHEN c.c_acctbal >= 0
                        THEN CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
                   END AS bal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_name >= 'E' AND NOT regexp_matches(n.n_name, '^IR')
        """,
        "sparql_agg": """
            SELECT n.n_name AS nm, CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "sparql_path": """
            WITH RECURSIVE edges AS (
                SELECT 'urn:d' || doc_id AS s, 'urn:d' || (2*doc_id+1) AS o
                FROM documents WHERE doc_id < 200
                UNION ALL
                SELECT 'urn:d' || doc_id, 'urn:d' || (2*doc_id+2)
                FROM documents WHERE doc_id < 200
            ),
            reach AS (
                SELECT o AS x FROM edges WHERE s = 'urn:d0'
                UNION
                SELECT e.o FROM edges e JOIN reach r ON e.s = r.x
            )
            SELECT x FROM reach
        """,
        "sparql_not_exists": """
            SELECT 'urn:cust:' || c_custkey AS c FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = customer.c_custkey
                                AND o.o_totalprice > 300000)
        """,
        "sparql_bind": """
            SELECT n_name AS nm, lower(n_name) AS lnm
            FROM nation WHERE length(n_name) >= 9
        """,
        "sparql_having": """
            SELECT n.n_name AS nm, CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name HAVING COUNT(*) >= 5
        """,
        # verbatim replay of the md5 rank-window quota
        "host_cap": """
            SELECT doc_id, host FROM (
              SELECT doc_id, doc_id % 7 AS host,
                     ROW_NUMBER() OVER (
                       PARTITION BY doc_id % 7
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                CAST(doc_id AS VARCHAR) ASC
                     ) AS rn
              FROM documents
            ) WHERE rn <= 4
        """,
        # select expressions over the group: count doubled (exact
        # small-int double), chained +1, and a key concat
        "sparql_agg_expr": """
            SELECT n.n_name AS nm, CAST(COUNT(*) AS BIGINT) AS n_cust,
                   CAST(COUNT(*) AS DOUBLE) * 2 AS dbl,
                   CAST(COUNT(*) AS DOUBLE) * 2 + 1 AS dblp,
                   n.n_name || '#' AS tag
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        # ρdf replay: the chain closure is ALL i<j nation-key pairs
        # (closed form — no recursion), every rule's output enumerated.
        # Overlaps between the arms (e.g. direct subclass edges vs the
        # closure pairs) collapse under the final DISTINCT, exactly like
        # the operator's dedup_triples key.
        # closed-form chain closure: all i<j pairs + inverses + both
        # symmetric directions + pass-through schema rows
        "owl_closure": """
            WITH pairs AS (
                SELECT doc_id, i.i AS i, j.j AS j
                FROM documents,
                     UNNEST(range(4)) AS i(i),
                     UNNEST(range(4)) AS j(j)
                WHERE i.i < j.j
            )
            SELECT 'd' || doc_id || '_' || i AS s, 'u:next' AS p,
                   'd' || doc_id || '_' || j AS o
            FROM pairs
            UNION ALL
            SELECT 'd' || doc_id || '_' || j, 'u:prev',
                   'd' || doc_id || '_' || i
            FROM pairs
            UNION ALL
            SELECT 'd' || doc_id || '_0', 'u:adj', 'd' || doc_id || '_2'
            FROM documents
            UNION ALL
            SELECT 'd' || doc_id || '_2', 'u:adj', 'd' || doc_id || '_0'
            FROM documents
            UNION ALL
            SELECT * FROM (VALUES
                ('u:next', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                 'http://www.w3.org/2002/07/owl#TransitiveProperty'),
                ('u:prev', 'http://www.w3.org/2002/07/owl#inverseOf',
                 'u:next'),
                ('u:adj', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                 'http://www.w3.org/2002/07/owl#SymmetricProperty')
            ) t(s, p, o)
        """,
        "rdfs_closure": """
            WITH keys AS (SELECT n_nationkey AS k FROM nation),
                 custs AS (SELECT c_custkey AS ck, c_nationkey AS nk
                           FROM customer),
                 nats AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
                 scp AS (SELECT a.k AS i, b.k AS j
                         FROM keys a, keys b WHERE a.k < b.k)
            SELECT DISTINCT s, p, o FROM (
                SELECT 'u:C' || k,
                       'http://www.w3.org/2000/01/rdf-schema#subClassOf',
                       'u:C' || (k + 1)
                FROM keys WHERE k < 24
                UNION ALL SELECT 'u:memberOf',
                       'http://www.w3.org/2000/01/rdf-schema#subPropertyOf',
                       'u:affiliatedWith'
                UNION ALL SELECT 'u:affiliatedWith',
                       'http://www.w3.org/2000/01/rdf-schema#domain',
                       'u:Buyer'
                UNION ALL SELECT 'u:affiliatedWith',
                       'http://www.w3.org/2000/01/rdf-schema#range',
                       'u:C0'
                UNION ALL SELECT 'u:cust' || ck, 'u:memberOf', 'u:nat' || nk
                FROM custs
                UNION ALL SELECT 'u:cust' || ck,
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                       'u:C' || nk
                FROM custs
                UNION ALL SELECT 'u:cust' || ck, 'u:affiliatedWith',
                       'u:nat' || nk
                FROM custs
                UNION ALL SELECT 'u:cust' || ck,
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                       'u:Buyer'
                FROM custs
                UNION ALL SELECT 'u:nat' || nk,
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                       'u:C' || k
                FROM nats CROSS JOIN keys
                UNION ALL SELECT 'u:cust' || c.ck,
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                       'u:C' || scp.j
                FROM custs c JOIN scp ON scp.i = c.nk
                UNION ALL SELECT 'u:C' || i,
                       'http://www.w3.org/2000/01/rdf-schema#subClassOf',
                       'u:C' || j
                FROM scp
            ) t(s, p, o)
        """,
        "k_core": _kcore_sql(),
        "label_propagation": _lpa_sql(),
        "link_predict": _link_predict_sql(),
        "bpe_train": _bpe_sql(),
        "personalized_pagerank": _ppr_sql(),
        # closed-form: cycle members → c<i>_0, tails → themselves
        "scc": """
            SELECT 'c' || doc_id || '_' || r.j AS node,
                   'c' || doc_id || '_0' AS scc
            FROM documents, UNNEST(range(4)) AS r(j)
            UNION ALL
            SELECT 't' || doc_id, 't' || doc_id FROM documents
        """,
        # identical line rules via DuckDB list lambdas; RE2 vs Java
        # regex agree on the ASCII [.!?]"?$ anchor
        "c4_clean": r"""
            WITH prep AS (
                SELECT doc_id,
                       replace(text, ' the ', '.' || chr(10) || 'the ')
                           || '.' AS t
                FROM documents
            ),
            c AS (
                SELECT doc_id,
                       list_filter(string_split(t, chr(10)),
                           ln -> len(list_filter(
                                     regexp_split_to_array(trim(ln),
                                                           '\s+'),
                                     w -> w <> '')) >= 5
                                 AND regexp_matches(rtrim(ln),
                                                    '[.!?]"?$')) AS kept,
                       len(string_split(t, chr(10))) AS n_all,
                       t
                FROM prep
            )
            SELECT doc_id,
                   -- DuckDB array_to_string([]) is NULL, Spark's is ''
                   coalesce(array_to_string(kept, chr(10)), '')
                       AS clean_text,
                   CAST(len(kept) AS BIGINT) AS n_lines_kept,
                   CAST(n_all - len(kept) AS BIGINT) AS n_lines_dropped,
                   len(kept) >= 3
                       AND NOT contains(lower(t), 'lorem ipsum')
                       AND NOT contains(t, '{') AS keep
            FROM c
        """,
        # duplicate_spans pipeline + join back to per-doc token counts
        "duplicated_fraction": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(trim(lower(
                               coalesce(text, ''))), '\s+'),
                           x -> x <> '') AS a
                FROM documents
            ),
            grams AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(a[i : i + 7], ' ')) AS h
                FROM docs, UNNEST(range(1, len(a) - 6)) AS r(i)
            ),
            counts AS (
                SELECT h, CAST(COUNT(*) AS BIGINT) AS c
                FROM grams GROUP BY h
            ),
            dup AS (
                SELECT doc_id, pos FROM grams JOIN counts USING (h)
                WHERE c >= 2
            ),
            isl AS (
                SELECT doc_id, pos,
                       pos - ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY pos) AS grp
                FROM dup
            ),
            spans AS (
                SELECT doc_id, MAX(pos) - MIN(pos) + 8 AS n_tokens
                FROM isl GROUP BY doc_id, grp
            ),
            per_doc AS (
                SELECT doc_id, CAST(SUM(n_tokens) AS BIGINT) AS dup_tokens
                FROM spans GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(len(d.a) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
                   CASE WHEN len(d.a) > 0
                        THEN round(COALESCE(p.dup_tokens, 0)
                                   / CAST(len(d.a) AS DOUBLE), 6)
                        ELSE CAST(0.0 AS DOUBLE) END AS dup_fraction
            FROM docs d LEFT JOIN per_doc p USING (doc_id)
        """,
        # identical md5-keyed window pipeline; pos 0-based both sides
        "duplicate_spans": r"""
            WITH docs AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS a
                FROM documents
            ),
            grams AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(a[i : i + 7], ' ')) AS h
                FROM docs, UNNEST(range(1, len(a) - 6)) AS r(i)
            ),
            counts AS (
                SELECT h, CAST(COUNT(*) AS BIGINT) AS c
                FROM grams GROUP BY h
            ),
            dup AS (
                SELECT doc_id, pos FROM grams JOIN counts USING (h)
                WHERE c >= 2
            ),
            isl AS (
                SELECT doc_id, pos,
                       pos - ROW_NUMBER() OVER (
                           PARTITION BY doc_id ORDER BY pos) AS grp
                FROM dup
            )
            SELECT doc_id,
                   MIN(pos) AS span_start,
                   MAX(pos) + 7 AS span_end,
                   MAX(pos) - MIN(pos) + 8 AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_windows
            FROM isl GROUP BY doc_id, grp
        """,
        # DuckDB's native ASOF LEFT JOIN — an independent implementation
        # of the same semantics, not a schedule replay
        "asof_join": """
            WITH snaps AS (
                SELECT user_id, ts, event_id AS snap_id,
                       value AS snap_value
                FROM events WHERE event_id % 7 = 0
            )
            SELECT e.event_id, e.user_id, s.snap_id, s.snap_value,
                   epoch_us(e.ts) - epoch_us(s.ts) AS lag_us
            FROM events e ASOF LEFT JOIN snaps s
              ON e.user_id = s.user_id AND e.ts >= s.ts
        """,
        # independent spelling: plain BETWEEN theta-join (DuckDB plans
        # its own IEJoin); ours is the binned equi-join
        "range_join": """
            WITH pts AS (
                SELECT event_id, user_id, epoch_us(ts) AS x FROM events
            ),
            w AS (
                SELECT user_id, epoch_us(ts) AS w_lo,
                       epoch_us(ts) + (event_id % 7 + 1) * 60000000
                           AS w_hi,
                       event_id AS win_id
                FROM events WHERE event_id % 11 = 0
            )
            SELECT p.event_id, p.user_id, w.win_id,
                   p.x - w.w_lo AS off_us
            FROM pts p JOIN w ON p.user_id = w.user_id
                             AND p.x BETWEEN w.w_lo AND w.w_hi
        """,
        # closed-form: wheels + fan triangles survive, pendants peel
        "k_truss": """
            WITH w AS (
                SELECT n_nationkey AS g, s
                FROM nation CROSS JOIN (SELECT unnest(range(5)) AS s) t
            )
            SELECT 'h' || g AS u, 'w' || g || '_' || s AS v FROM w
            UNION ALL
            SELECT least('w' || g || '_' || s,
                         'w' || g || '_' || ((s + 1) % 5)),
                   greatest('w' || g || '_' || s,
                            'w' || g || '_' || ((s + 1) % 5))
            FROM w
            UNION ALL
            SELECT 'h' || (doc_id % 25), 'p' || doc_id FROM documents
            UNION ALL
            SELECT 'p' || doc_id, 'q' || doc_id FROM documents
            UNION ALL
            SELECT 'h' || (doc_id % 25), 'q' || doc_id FROM documents
        """,
        # same bucket hash (md5 hex prefix → int), same closed-form
        # weights (b%13-6)/64 (exact in binary and decimal), same
        # decimal-fold → single-divide → sigmoid → round-6 schedule
        "classifier_score": r"""
            WITH toks AS (
                SELECT doc_id, t
                FROM documents,
                     UNNEST(regexp_split_to_array(trim(text), '\s+'))
                         AS u(t)
                WHERE t <> ''
            ),
            sums AS (
                SELECT doc_id,
                       SUM(CAST(
                           CAST((CAST(('0x' || substr(md5(t), 1, 15))
                                      AS BIGINT) % 64) % 13 - 6 AS DOUBLE)
                           / 64 AS DECIMAL(20,10))) AS s,
                       COUNT(*) AS n
                FROM toks GROUP BY doc_id
            )
            SELECT d.doc_id,
                   round(1.0 / (1.0 + exp(-(
                       CASE WHEN s.n > 0
                            THEN 0.25 + CAST(s.s AS DOUBLE) / s.n
                            ELSE 0.25 END))), 6) AS clf_score
            FROM documents d LEFT JOIN sums s USING (doc_id)
        """,
        # same GROUP BY, same n_versions>=1 clamp, same rounding
        "recrawl_stats": """
            SELECT 'https://s.com/p' || (doc_id % 211) AS url,
                   CAST(COUNT(*) AS BIGINT) AS n_captures,
                   GREATEST(COUNT(DISTINCT CASE WHEN doc_id % 7 = 0
                                THEN NULL
                                ELSE 'sha1:' || (doc_id % 5) END),
                            1) AS n_versions,
                   CASE WHEN COUNT(*) > 1 THEN
                        round(CAST(GREATEST(COUNT(DISTINCT
                                  CASE WHEN doc_id % 7 = 0 THEN NULL
                                       ELSE 'sha1:' || (doc_id % 5) END),
                              1) - 1 AS DOUBLE)
                              / (COUNT(*) - 1), 6)
                   ELSE CAST(0.0 AS DOUBLE) END AS change_rate,
                   MIN(CAST(doc_id + 10000000000000 AS VARCHAR))
                       AS first_ts,
                   MAX(CAST(doc_id + 10000000000000 AS VARCHAR))
                       AS last_ts
            FROM documents
            GROUP BY 1
        """,
        # identical window + join replay: md5-ordered per-host queue,
        # known delays for the 25 nation hosts, default 1.0 elsewhere
        "fetch_plan": """
            WITH f AS (
                SELECT 'https://host' || (doc_id % 37) || '.com/p/' || doc_id
                           AS url,
                       'host' || (doc_id % 37) || '.com' AS host
                FROM documents
            ),
            d AS (
                SELECT 'host' || n_nationkey || '.com' AS host,
                       CAST(n_nationkey % 5 + 1 AS DOUBLE) AS delay
                FROM nation
            ),
            r AS (
                SELECT f.url, f.host,
                       ROW_NUMBER() OVER (
                           PARTITION BY f.host ORDER BY md5(f.url), f.url
                       ) AS slot,
                       COALESCE(d.delay, CAST(1.0 AS DOUBLE)) AS delay
                FROM f LEFT JOIN d USING (host)
            )
            SELECT url, host, CAST(slot AS INTEGER) AS slot,
                   (slot - 1) * delay AS fetch_at_s
            FROM r
        """,
        # closed-form expected SURT key per planted URL shape
        "surt_key": """
            SELECT doc_id,
                   CASE doc_id % 4
                       WHEN 0 THEN 'com,example,site' || (doc_id % 50)
                                   || ')/page/' || doc_id || '?a=1&b=2'
                       WHEN 1 THEN 'org,domain' || (doc_id % 30)
                                   || ',sub:8443)/x'
                       WHEN 2 THEN 'net,host' || doc_id || ')/'
                       ELSE NULL
                   END AS surt_key
            FROM documents
        """,
        # every parsed CDXJ column rebuilt from the same arithmetic;
        # the doc_id % 10 = 0 arm reconstructs the malformed line
        # verbatim into err with all data columns NULL
        "cdxj_parse": """
            SELECT
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE 'com,site' || doc_id || ')/p' END AS surt_key,
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE '2024010112000' || (doc_id % 10) END AS ts,
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE 'https://site' || doc_id || '.com/p' END AS url,
                CAST(NULL AS VARCHAR) AS mime,
                CAST(NULL AS VARCHAR) AS digest,
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE 'c.warc.gz' END AS filename,
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE CAST(doc_id % 3 + 200 AS VARCHAR) END AS status_raw,
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE CAST(doc_id % 3 + 200 AS INTEGER) END AS status,
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE CAST(doc_id * 7 AS BIGINT) END AS "offset",
                CASE WHEN doc_id % 10 = 0 THEN NULL
                     ELSE CAST(doc_id % 997 + 1 AS BIGINT) END AS "length",
                CASE WHEN doc_id % 10 = 0 THEN
                     'com,site' || doc_id || ')/p badts {"url": "https://site'
                     || doc_id || '.com/p", "status": "' || (doc_id % 3 + 200)
                     || '", "offset": "' || (doc_id * 7)
                     || '", "length": "' || (doc_id % 997 + 1)
                     || '", "filename": "c.warc.gz"}'
                     ELSE NULL END AS err
            FROM documents
        """,
        # id-ordered triangle enumeration: every triangle {a<b<c} appears
        # exactly once as (a,b),(b,c),(a,c) in the canonical edge set —
        # counts are orientation-invariant vs the degree-ordered operator
        "triangle_count": """
            WITH raw AS (
                SELECT 'u:n' || doc_id AS a, 'u:n' || (doc_id + 1) AS b
                FROM documents WHERE doc_id < 500
                UNION ALL
                SELECT 'u:n' || doc_id, 'u:n' || (doc_id + 2)
                FROM documents WHERE doc_id < 500
                UNION ALL
                SELECT 'u:n' || (doc_id + 1), 'u:n' || doc_id
                FROM documents WHERE doc_id < 500 AND doc_id % 3 = 0
            ),
            und AS (
                SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
                FROM raw WHERE a <> b
            ),
            nodes AS (
                SELECT u AS node FROM und UNION SELECT v FROM und
            ),
            tri AS (
                SELECT e1.u AS x, e1.v AS y, e2.v AS z
                FROM und e1
                JOIN und e2 ON e2.u = e1.v
                JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            corners AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            ),
            cnt AS (
                SELECT node, CAST(COUNT(*) AS BIGINT) AS n
                FROM corners GROUP BY node
            )
            SELECT n.node AS node, COALESCE(c.n, 0) AS triangles
            FROM nodes n LEFT JOIN cnt c ON c.node = n.node
        """,
        # full replay of the blocked resolver: same blocking key, same
        # length-band prune, same levenshtein similarity (CAST the
        # division — DuckDB '/' on integers truncates), same
        # (sim DESC, id ASC) deterministic top-1
        "entity_resolve": """
            WITH s AS (
                SELECT DISTINCT
                       substr(p_name, 1, 3) || substr(p_name, 5) AS surface
                FROM part
                WHERE p_name IS NOT NULL AND p_name <> ''
            ),
            sk AS (
                SELECT surface, lower(surface) AS slc,
                       substr(lower(surface), 1, 2) AS sblk,
                       length(surface) AS slen
                FROM s WHERE surface <> ''
            ),
            c AS (
                SELECT 'u:part' || p_partkey AS entity_iri,
                       p_name AS matched_name, lower(p_name) AS clc,
                       substr(lower(p_name), 1, 2) AS cblk,
                       length(p_name) AS clen
                FROM part WHERE p_name IS NOT NULL AND p_name <> ''
            ),
            scored AS (
                SELECT surface, entity_iri, matched_name,
                       round(1.0 - CAST(levenshtein(slc, clc) AS DOUBLE)
                                   / greatest(slen, clen), 6) AS sim
                FROM sk JOIN c ON sblk = cblk
                    AND abs(slen - clen) <= 0.25 * greatest(slen, clen)
            ),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY surface
                           ORDER BY sim DESC, entity_iri ASC) AS rank
                FROM scored WHERE sim >= 0.75
            )
            SELECT surface, entity_iri, matched_name, sim,
                   CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 1
        """,
        # planted component algebra: star(custs→anchor_nk) + chain
        # (anchor_k→anchor_{k+5}) merge to rep = u:anchor0{nk % 5}
        # (zero-padded so lexicographic min == numeric min); only the
        # rewritten order facts survive (sameAs edges are consumed)
        "sameas_resolve": """
            SELECT 'u:anchor0' || (c_nationkey % 5) AS s,
                   'u:placed' AS p,
                   'u:order' || o_orderkey AS o
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "sparql_lang": f"""
            SELECT 'urn:cust:' || c_custkey AS c, c_name AS nm,
                   '{_RDF_LANG_STRING}' AS dt
            FROM customer WHERE c_custkey % 2 = 0
        """,
        "sparql_path_seq": """
            SELECT 'urn:cust:' || c.c_custkey AS c, n.n_name AS nm
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "sparql_path_unanchored": """
            WITH RECURSIVE edges AS (
                SELECT 'urn:d' || doc_id AS src,
                       'urn:d' || (doc_id * 2 + 1) AS dst
                FROM documents WHERE doc_id < 200
                UNION ALL
                SELECT 'urn:d' || doc_id, 'urn:d' || (doc_id * 2 + 2)
                FROM documents WHERE doc_id < 200
            ), reach AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT src AS a, dst AS b FROM reach
        """,
        # the closure must see ONLY gA's edges (even parents)
        "sparql_path_graph": """
            WITH RECURSIVE edges AS (
                SELECT 'urn:d' || doc_id AS src,
                       'urn:d' || (doc_id * 2 + 1) AS dst
                FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0
                UNION ALL
                SELECT 'urn:d' || doc_id, 'urn:d' || (doc_id * 2 + 2)
                FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0
            ), reach AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT src AS a, dst AS b FROM reach
        """,
        # closures inside OPTIONAL (left join on the closure pair set,
        # NULL where no descendant) and MINUS (anti join on the ≥2-step
        # reachability set): keeps only depth-0/1 parents
        "sparql_path_in_blocks": """
            WITH RECURSIVE edges AS (
                SELECT 'urn:d' || doc_id AS src,
                       'urn:d' || (doc_id * 2 + 1) AS dst
                FROM documents WHERE doc_id < 200
                UNION ALL
                SELECT 'urn:d' || doc_id, 'urn:d' || (doc_id * 2 + 2)
                FROM documents WHERE doc_id < 200
            ), reach AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT e.src AS p, r.dst AS d
            FROM edges e LEFT JOIN reach r ON r.src = e.dst
            WHERE e.src NOT IN (
                SELECT r2.dst FROM edges e2 JOIN reach r2 ON r2.src = e2.dst
            )
        """,
        "sparql_path_zero_or_one": """
            WITH edges AS (
                SELECT 'urn:d' || doc_id AS a,
                       'urn:d' || (doc_id * 2 + 1) AS b
                FROM documents WHERE doc_id < 200
                UNION ALL
                SELECT 'urn:d' || doc_id, 'urn:d' || (doc_id * 2 + 2)
                FROM documents WHERE doc_id < 200
            ), nodes AS (
                SELECT a AS n FROM edges UNION SELECT b FROM edges
            )
            SELECT a, b FROM edges
            UNION
            SELECT n AS a, n AS b FROM nodes
        """,
        "sparql_path_grouped": """
            SELECT 'urn:order:' || o.o_orderkey AS x,
                   'urn:nation:' || c.c_nationkey AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            UNION ALL
            SELECT 'urn:cust:' || c_custkey, 'urn:nation:' || c_nationkey
            FROM customer
        """,
        "sparql_subquery": """
            SELECT 'urn:cust:' || c.c_custkey AS c, t.k AS k
            FROM customer c JOIN (
                SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS k
                FROM customer GROUP BY c_nationkey
            ) t ON c.c_nationkey = t.c_nationkey
        """,
        # the 8-char prefix pools NATION_1 with NATION_10..19 (ditto
        # NATION_2/20..24) — a rename-style key would mismatch
        "sparql_group_expr": """
            SELECT substr(n.n_name, 1, 8) AS init,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY substr(n.n_name, 1, 8)
        """,
        # closed-form CBD reachability: meta rows for every customer,
        # d2 + leaf rows only where the even-key chain makes the leaf
        # reachable — the planted odd-key leaves must be absent
        "sparql_describe_cbd": """
            SELECT 'urn:cust:' || c_custkey AS s, 'urn:ex:meta' AS p,
                   '_:m' || c_custkey AS o
            FROM customer
            UNION ALL
            SELECT '_:m' || c_custkey, 'urn:ex:d2', '_:n' || c_custkey
            FROM customer WHERE c_custkey % 2 = 0
            UNION ALL
            SELECT '_:n' || c_custkey, 'urn:ex:leaf', 'v' || c_custkey
            FROM customer WHERE c_custkey % 2 = 0
        """,
        # closed-form dataset-clause semantics: only the two FROM NAMED
        # segment graphs are countable; BUILDING/FURNITURE/MACHINERY and
        # the default-graph nation rows must be invisible
        "sparql_dataset": """
            SELECT 'urn:seg:' || c_mktsegment AS g,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer
            WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
            GROUP BY c_mktsegment
        """,
        # closed-form update semantics: nation 0's name triple deleted,
        # NATION_1* names renamed to urn:ex:label, the rest untouched
        "sparql_update": """
            SELECT 'urn:nation:' || n_nationkey AS s,
                   CASE WHEN starts_with(n_name, 'NATION_1')
                        THEN 'urn:ex:label' ELSE 'urn:ex:name' END AS p,
                   n_name AS o
            FROM nation WHERE n_nationkey <> 0
        """,
        "sparql_hash": """
            SELECT 'urn:cust:' || c_custkey AS c, c_name AS nm,
                   md5(c_name) AS md, sha256(c_name) AS sh
            FROM customer
            WHERE md5(c_name) LIKE 'a%' OR md5(c_name) LIKE 'b%'
        """,
        # closed-form: sameTerm keeps exactly the customers whose 'b'
        # name triple is NOT lang-tagged (custkey%3 != 0)
        "sparql_sameterm": """
            SELECT 'urn:cust:' || c_custkey AS c, c_name AS v
            FROM customer WHERE c_custkey % 3 <> 0
        """,
        # both engines re-parse the SAME second-truncated lexical, so
        # every component is integer-exact
        "sparql_datetime": """
            WITH ev AS (
                SELECT event_id,
                       CAST(strftime(ts, '%Y-%m-%dT%H:%M:%S')
                            AS TIMESTAMP) AS t
                FROM events WHERE event_id < 2000
            )
            SELECT 'urn:ev:' || event_id AS e,
                   CAST(year(t) AS BIGINT) AS y,
                   CAST(month(t) AS BIGINT) AS mo,
                   CAST(day(t) AS BIGINT) AS d,
                   CAST(hour(t) AS BIGINT) AS h,
                   CAST(minute(t) AS BIGINT) AS mi,
                   CAST(second(t) AS BIGINT) AS sec
            FROM ev WHERE minute(t) >= 45
        """,
        "sparql_arith": """
            SELECT 'urn:cust:' || c_custkey AS c,
                   CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) * 2 + 1
                       AS score
            FROM customer
            WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) * 2 + 1
                  > 5000
        """,
        "sparql_builtins": """
            WITH b AS (
                SELECT c_custkey, c_name,
                       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS v
                FROM customer
            )
            SELECT 'urn:cust:' || c_custkey AS c,
                   substr(c_name, strpos(c_name, '#') + 1) AS idpart,
                   FLOOR(v) AS whole,
                   CEIL(v) AS up,
                   FLOOR(v + 0.5) AS rnd
            FROM b WHERE ABS(v) > 4000
        """,
        "sparql_describe_var": """
            WITH tri AS (
                SELECT 'urn:cust:' || c_custkey AS s, 'rdf:type' AS p,
                       'urn:ex:Customer' AS o FROM customer
                UNION ALL
                SELECT 'urn:cust:' || c_custkey, 'urn:ex:inNation',
                       'urn:nation:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'urn:nation:' || n_nationkey, 'urn:ex:name', n_name
                FROM nation
            ),
            target AS (
                SELECT 'urn:nation:' || c_nationkey AS nid FROM customer
                WHERE c_custkey = 1
            )
            SELECT DISTINCT s, p, o FROM tri
            WHERE s IN (SELECT nid FROM target)
               OR o IN (SELECT nid FROM target)
        """,
        "sparql_minus": """
            SELECT 'urn:cust:' || c_custkey AS c FROM customer
            WHERE c_nationkey <> 0
        """,
        "sparql_graph": """
            SELECT 'urn:cust:' || c_custkey AS c, c_name AS nm
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "sparql_order_expr": """
            SELECT n_name AS nm FROM nation
            ORDER BY length(n_name) DESC, n_name LIMIT 5
        """,
        # term constructors rebuilt closed-form: IRI lexical = concat,
        # STRDT datatype = the constant tag, STRLANG lang = the constant
        "sparql_term_ctors": """
            SELECT n_name AS nm, 'urn:geo:' || n_name AS iri,
                   'urn:t:Name' AS dt, 'en-GB' AS lg
            FROM nation WHERE length(n_name) >= 9
        """,
        "sparql_funcs": """
            SELECT n.n_name AS nm,
                   string_agg(c.c_name, '|' ORDER BY c.c_name) AS names,
                   CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE substr(n.n_name, 8, 1) IN ('0', '1', '2')
            GROUP BY n.n_name
        """,
        "boilerplate_lines": r"""
            WITH base AS (
                SELECT doc_id, COALESCE(text, '') || chr(10)
                       || 'COMMON FOOTER (c) spark-graft' AS t
                FROM documents
            ),
            lines AS (
                SELECT doc_id,
                       unnest(string_split(t, chr(10))) AS line,
                       unnest(range(len(string_split(t, chr(10))))) AS ln
                FROM base
            ),
            tl AS (SELECT doc_id, ln, line, trim(line) AS tline FROM lines),
            counts AS (
                SELECT tline, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
                FROM tl WHERE tline <> '' GROUP BY tline
            ),
            bp AS (SELECT tline FROM counts WHERE nd >= 5),
            kept AS (
                SELECT t.doc_id, t.ln, t.line FROM tl t
                LEFT JOIN bp ON t.tline = bp.tline
                WHERE bp.tline IS NULL
            ),
            agg AS (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY ln) AS clean_text,
                       CAST(COUNT(*) AS BIGINT) AS n_kept
                FROM kept GROUP BY doc_id
            ),
            tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
                    FROM tl GROUP BY doc_id)
            SELECT tot.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
                   COALESCE(agg.n_kept, 0) AS n_kept,
                   tot.n_total - COALESCE(agg.n_kept, 0) AS n_removed
            FROM tot LEFT JOIN agg USING (doc_id)
        """,
        # PII patterns injected verbatim from ops.text.PII_PATTERNS (the
        # Java/RE2-common subset); DuckDB regexp_replace needs the 'g'
        # flag (Spark replaces globally by default)
        "url_normalize": """
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN 'https://d' || (doc_id % 7)
                          || '.example.org/Page/' || doc_id
                          || '?a=' || (doc_id % 3) || '&b=2'
                     WHEN 1 THEN 'http://d' || (doc_id % 7)
                          || '.example.org/'
                     WHEN 2 THEN 'http://d' || (doc_id % 7)
                          || '.example.org:8080/p/' || doc_id
                     ELSE 'https://d' || (doc_id % 7)
                          || '.example.org/p?x=3&y=2&z=1'
                   END AS url_norm
            FROM documents
        """,
        # closed-form: the WARC wrap/parse round-trip must hand back
        # exactly the planted (doc_id, 200, text) rows
        "warc_parse": """
            SELECT doc_id, 200 AS http_status, text FROM documents
        """,
        # closed-form: link iff the surface occurs in the RAW doc text
        # (WET text is the extraction verbatim); entity = argmax-prior
        # sense, ties by min IRI — the fused stage's context-free rule
        "wet_pipeline": f"""
            WITH a(surface, entity_iri, prior) AS (VALUES {_ALIAS_VALUES}),
            best AS (
                SELECT surface, entity_iri FROM (
                    SELECT surface, entity_iri,
                           row_number() OVER (PARTITION BY surface
                                              ORDER BY prior DESC,
                                                       entity_iri) AS rk
                    FROM a) WHERE rk = 1
            )
            SELECT 'https://example.org/doc/' || d.doc_id AS url,
                   b.entity_iri AS entity
            FROM documents d CROSS JOIN best b
            WHERE length(regexp_extract_all(d.text, b.surface)) > 0
        """,
        # closed-form: the four triples each page's three islands carry
        "html_structured": """
            WITH c AS (
              SELECT c_custkey AS k, c_name, c_mktsegment, c_nationkey,
                     'https://h' || (c_custkey % 5) || '.example.org/c/'
                       || c_custkey AS url
              FROM customer
            )
            SELECT url, 'urn:cust:' || k AS s,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'urn:v:Customer' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype, 'jsonld' AS fmt
            FROM c
            UNION ALL
            SELECT url, 'urn:cust:' || k, 'urn:v:name', c_name, 2,
                   'http://www.w3.org/2001/XMLSchema#string', 'jsonld'
            FROM c
            UNION ALL
            SELECT url, 'urn:acct:' || k, 'urn:v:nation',
                   CAST(c_nationkey AS VARCHAR), 2,
                   'http://www.w3.org/2001/XMLSchema#integer', 'jsonld'
            FROM c
            UNION ALL
            SELECT url, 'urn:cust:' || k, 'urn:v:segment', c_mktsegment, 2,
                   'http://www.w3.org/2001/XMLSchema#string', 'turtle'
            FROM c
        """,
        # closed-form replay of both sitemap entries per part (the
        # loc-less third entry must be dropped)
        "sitemap_parse": """
            WITH p AS (
              SELECT p_partkey AS k,
                     'https://p' || (p_partkey % 4) || '.example' AS origin,
                     'https://p' || (p_partkey % 4) || '.example/sitemap-'
                       || p_partkey || '.xml' AS url
              FROM part
            )
            SELECT url, 'urlset' AS kind,
                   origin || '/parts/' || k AS loc,
                   '2026-01-' || lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0')
                     AS lastmod,
                   'weekly' AS changefreq,
                   CAST('0.' || (k % 10) AS DOUBLE) AS priority
            FROM p
            UNION ALL
            SELECT url, 'urlset', origin || '/parts/' || k || '/specs',
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                   CAST(NULL AS DOUBLE)
            FROM p
        """,
        # closed-form: the seven RDFa triples per part page — type,
        # lang-tagged name, resolved href, meta content, chained Brand
        "html_rdfa": """
            WITH p AS (
              SELECT p_partkey AS k, p_name, p_brand, p_size,
                     'https://p' || (p_partkey % 4) || '.example/parts/'
                       || p_partkey AS url
              FROM part
            )
            SELECT url, 'urn:part:' || k AS s,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'http://schema.org/Product' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype,
                   CAST(NULL AS VARCHAR) AS o_lang
            FROM p
            UNION ALL
            SELECT url, 'urn:part:' || k, 'http://schema.org/name', p_name, 2,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString',
                   'en'
            FROM p
            UNION ALL
            SELECT url, 'urn:part:' || k, 'http://schema.org/url',
                   'https://p' || (k % 4) || '.example/p/' || k, 1,
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM p
            UNION ALL
            SELECT url, 'urn:part:' || k, 'http://schema.org/size',
                   CAST(p_size AS VARCHAR), 2,
                   'http://www.w3.org/2001/XMLSchema#string',
                   CAST(NULL AS VARCHAR)
            FROM p
            UNION ALL
            SELECT url, '_:ra1',
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                   'http://schema.org/Brand', 1,
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM p
            UNION ALL
            SELECT url, 'urn:part:' || k, 'http://schema.org/brand',
                   '_:ra1', 0, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM p
            UNION ALL
            SELECT url, '_:ra1', 'http://schema.org/name', p_brand, 2,
                   'http://www.w3.org/2001/XMLSchema#string',
                   CAST(NULL AS VARCHAR)
            FROM p
        """,
        # closed-form RFC 9309 decision per planted path shape: /private/
        # denied, /private/pub/ re-allowed by the longer Allow, *.pdf$
        # denied, /pub/ untouched; hosts 25..29 have no robots.txt
        "robots_gate": """
            SELECT 'https://H' || (o_custkey % 30) || '.example'
                   || CASE o_orderkey % 4
                        WHEN 0 THEN '/pub/' || o_orderkey
                        WHEN 1 THEN '/private/' || o_orderkey
                        WHEN 2 THEN '/private/pub/' || o_orderkey
                        ELSE '/files/' || o_orderkey || '.pdf'
                      END AS url,
                   (o_custkey % 30) >= 25 OR (o_orderkey % 4) IN (0, 2)
                     AS crawl_allowed
            FROM orders
        """,
        # closed-form replay of the anchor-prior algebra over the
        # canonical (post-normalization) targets
        "anchor_priors": """
            WITH a AS (
              SELECT 'entity ' || (o_custkey % 5) AS surface,
                     'https://t' || (o_orderkey % 2) || '.example/e/'
                       || (o_custkey % 5) AS entity_iri
              FROM orders
            ), c AS (
              SELECT surface, entity_iri, COUNT(*) AS n
              FROM a GROUP BY surface, entity_iri
            )
            SELECT surface, entity_iri, n,
                   CAST(n AS DOUBLE)
                     / SUM(n) OVER (PARTITION BY surface) AS prior
            FROM c
        """,
        # closed-form winner per branch: with nation context the AMB
        # surface flips to the :ctx sense (coherence 1 doubles its
        # score), without context the :pop prior wins; scores rounded
        # to 6 dp so the ≤1-ulp ln() difference between engines is
        # absorbed, float constants injected via repr CAST
        "entity_disambiguation": """
            WITH co AS (
                SELECT c_custkey AS ck, c_nationkey AS nk FROM customer
            )
            SELECT 'urn:doc:' || ck AS url,
                   'NATION_' || nk AS surface,
                   'urn:nation:' || nk AS entity_iri,
                   CAST(1 + ck % 3 AS BIGINT) AS n_hits,
                   CAST('0.9' AS DOUBLE) AS prior,
                   CAST(0 AS BIGINT) AS coherence,
                   round(CAST('0.9' AS DOUBLE) * ln(2 + ck % 3), 6)
                       AS score
            FROM co WHERE ck % 5 <> 0
            UNION ALL
            SELECT 'urn:doc:' || ck, 'AMB_' || nk,
                   'urn:ent:' || nk || ':ctx',
                   CAST(1 AS BIGINT), CAST('0.35' AS DOUBLE),
                   CAST(1 AS BIGINT),
                   round(CAST('0.35' AS DOUBLE) * ln(2) * 2, 6)
            FROM co WHERE ck % 5 <> 0
            UNION ALL
            SELECT 'urn:doc:' || ck, 'AMB_' || nk,
                   'urn:ent:' || nk || ':pop',
                   CAST(1 AS BIGINT), CAST('0.6' AS DOUBLE),
                   CAST(0 AS BIGINT),
                   round(CAST('0.6' AS DOUBLE) * ln(2), 6)
            FROM co WHERE ck % 5 = 0
        """,
        # closed-form: the five microdata triples per supplier page —
        # type, stripped text, resolved href IRI, nested blank, and the
        # vocabulary-inherited nested property
        "html_microdata": """
            WITH s AS (
              SELECT s_suppkey AS k, s_name, s_nationkey,
                     'https://md' || s_nationkey || '.example.net/s/'
                       || s_suppkey AS url
              FROM supplier
            )
            SELECT url, 'urn:sup:' || k AS s,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   'http://schema.org/Organization' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype
            FROM s
            UNION ALL
            SELECT url, 'urn:sup:' || k, 'http://schema.org/name', s_name, 2,
                   'http://www.w3.org/2001/XMLSchema#string'
            FROM s
            UNION ALL
            SELECT url, 'urn:sup:' || k, 'http://schema.org/url',
                   'https://md' || s_nationkey || '.example.net/profile/' || k,
                   1, CAST(NULL AS VARCHAR)
            FROM s
            UNION ALL
            SELECT url, 'urn:sup:' || k, 'http://schema.org/address',
                   '_:md1', 0, CAST(NULL AS VARCHAR)
            FROM s
            UNION ALL
            SELECT url, '_:md1', 'http://schema.org/addressCountry',
                   'nation-' || s_nationkey, 2,
                   'http://www.w3.org/2001/XMLSchema#string'
            FROM s
        """,
        # closed-form host pairs: absolute anchor → next customer-bucket
        # host (canonicalized), cdn anchor → orderkey-bucket host; the
        # same-host self anchor is filtered and must NOT appear
        # one entry per order feed: rss on even keys, atom on odd (whose
        # rel=self plumbing link must lose to the alternate link)
        "feed_parse": """
            SELECT 'https://f.example/feed/' || o_orderkey AS url,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'rss'
                        ELSE 'atom' END AS kind,
                   'Order ' || o_orderkey AS title,
                   'https://f.example/o/' || o_orderkey AS link,
                   CAST(o_orderdate AS VARCHAR) AS published,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'g' ELSE 'a' END
                       || o_orderkey AS entry_id,
                   'status ' || o_orderstatus AS summary
            FROM orders
        """,
        # five cells per order page, replayed closed-form; the stray
        # outside-table td must contribute nothing
        "html_tables": """
            WITH p AS (
                SELECT 'https://t.example/o/' || o_orderkey AS url,
                       o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2))
                            AS VARCHAR) AS pr,
                       'key ' || o_orderkey AS k2
                FROM orders
            )
            SELECT url, 0 AS "table", 0 AS row, 0 AS col, 'status' AS cell
            FROM p
            UNION ALL SELECT url, 0, 0, 1, 'price' FROM p
            UNION ALL SELECT url, 0, 1, 0, st FROM p
            UNION ALL SELECT url, 0, 1, 1, pr FROM p
            UNION ALL SELECT url, 1, 0, 0, k2 FROM p
        """,
        # the analytic cosine against e0 is 0.894 only for d=0 rows —
        # every other row clears threshold 0.8 by a wide float32 margin
        "embedding_decontaminate": """
            SELECT doc_id FROM documents WHERE doc_id % 16 <> 0
        """,
        # exact replay of the upsampler: same md5 fractional gates
        # (thresholds are ops.sample.md5_threshold(0.25)/(0.5) verbatim),
        # copies expanded via UNNEST(range(n))
        "weighted_repeat": """
            WITH d AS (
                SELECT doc_id,
                       CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 0
                            ELSE 1 END
                       + CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
                                CASE doc_id % 3
                                  WHEN 0 THEN '40000000000000000000000000000000'
                                  WHEN 1 THEN '80000000000000000000000000000000'
                                  ELSE '00000000000000000000000000000000' END
                              THEN 1 ELSE 0 END AS n
                FROM documents
            )
            SELECT doc_id, CAST(UNNEST(range(n)) AS INT) AS copy
            FROM d WHERE n > 0
        """,
        # closed-form mirror-dedup replay: same bucket key, same
        # authoritative-first/(int,md5)-rank winner rule in plain SQL
        "canonical_dedup": """
            WITH p AS (
                SELECT 'https://d.example/o/' || o_orderkey AS url,
                       'https://d.example/o/'
                           || (o_orderkey - o_orderkey % 4) AS ckey
                FROM orders
            ), r AS (
                SELECT url,
                       ROW_NUMBER() OVER (
                           PARTITION BY ckey
                           ORDER BY CAST(url <> ckey AS INT), md5(url)
                       ) AS rn
                FROM p
            )
            SELECT url FROM r WHERE rn = 1
        """,
        # closed-form head-metadata replay: entity-decoded folded title,
        # description from either attribute order, canonical resolved
        # against the page origin on o_orderkey%3=0 and NULL otherwise
        "page_meta": """
            SELECT 'https://s' || (o_custkey % 7)
                       || '.shop.example/ord/' || o_orderkey AS url,
                   'Order & ' || o_orderkey AS title,
                   'status ' || o_orderstatus AS description,
                   CASE WHEN o_orderkey % 3 = 0
                        THEN 'https://s' || (o_custkey % 7)
                             || '.shop.example/canon/' || o_orderkey
                        END AS canonical,
                   CAST(NULL AS VARCHAR) AS og_title
            FROM orders
        """,
        # closed-form main-content expectation: the article paragraph
        # (plus the promoted headline on odd docs); every boilerplate
        # block — including the sidebar/comments COPIES of the text —
        # must be absent, so any double-keep breaks the hash
        "main_text": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 1
                        THEN 'Doc ' || doc_id || chr(10) || text
                        ELSE text END AS main_text
            FROM documents
        """,
        # closed-form replay of the four charset shapes: what the bytes
        # SHOULD decode to, built from the same source text (the € case
        # fails under a blind latin-1/utf-8 decode, the BOM case fails
        # if the BOM leaks into content)
        "html_charset": """
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN '<meta charset="utf-8"><p>'
                                 || substr(text, 1, 40) || ' café</p>'
                     WHEN 1 THEN '<meta charset="iso-8859-1"><p>'
                                 || substr(text, 1, 40) || ' €é</p>'
                     WHEN 2 THEN '<p>' || substr(text, 1, 40) || ' ☃</p>'
                     ELSE '<p>' || substr(text, 1, 40) || ' ✓</p>'
                   END AS decoded
            FROM documents
        """,
        "html_links": """
            WITH o AS (
              SELECT 's' || (o_custkey % 7) || '.shop.example' AS src,
                     's' || ((o_custkey + 1) % 7) || '.shop.example' AS d1,
                     'cdn' || (o_orderkey % 3) || '.shop.example' AS d2
              FROM orders
            ), e AS (
              SELECT src, d1 AS dst FROM o
              UNION ALL
              SELECT src, d2 FROM o
            )
            SELECT src, dst, COUNT(*) AS n_links FROM e GROUP BY src, dst
        """,
        # chr(769)=U+0301 COMBINING ACUTE, chr(233)=U+00E9 precomposed é
        "unicode_normalize": """
            SELECT doc_id,
                   nfc_normalize(text || CASE doc_id % 3
                     WHEN 0 THEN ' cafe' || chr(769)
                     WHEN 1 THEN ' caf' || chr(233)
                     ELSE ' plain' END) AS text_nfc
            FROM documents
        """,
        "pii_redact": r"""
            WITH base AS (
                SELECT doc_id,
                       COALESCE(text, '') || ' contact user' || doc_id
                       || '@example.com on 10.0.' || (doc_id % 200)
                       || '.7 or +49151123' || doc_id AS t
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       t, 'EMAILPAT', '<EMAIL>', 'g'),
                       'IPPAT', '<IP>', 'g'),
                       'PHONEPAT', '<PHONE>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(t, 'EMAILPAT')) AS BIGINT)
                       AS n_email,
                   CAST(len(regexp_extract_all(t, 'IPPAT')) AS BIGINT)
                       AS n_ip,
                   CAST(len(regexp_extract_all(t, 'PHONEPAT')) AS BIGINT)
                       AS n_phone
            FROM base
        """.replace("EMAILPAT", textops.PII_PATTERNS[0][1])
           .replace("IPPAT", textops.PII_PATTERNS[1][1])
           .replace("PHONEPAT", textops.PII_PATTERNS[2][1]),
        "pack_sequences": r"""
            WITH base AS (
                SELECT doc_id,
                       CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+'))
                       END AS n_tokens,
                       CAST(doc_id % 8 AS INT) AS shard
                FROM documents
            ),
            win AS (
                SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                                PARTITION BY shard ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS BIGINT)
                           AS s
                FROM base
            )
            SELECT doc_id, shard, n_tokens,
                   CAST(floor(s / 512) AS BIGINT) AS seq_id,
                   CAST(s % 512 AS BIGINT) AS seq_offset
            FROM win
        """,
        "decontaminate": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x <> '') AS ts
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       unnest([array_to_string(ts[i+1:i+8], ' ')
                               FOR i IN range(len(ts) - 7)]) AS g
                FROM toks WHERE len(ts) >= 8
            ),
            eg AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5),
            hits AS (SELECT DISTINCT d.doc_id, d.g FROM grams d JOIN eg USING (g))
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM hits GROUP BY doc_id
        """,
        # quantile fractions re-materialized as string→double CASTs so the
        # emitted `quantile` column is DOUBLE with the exact same bits as
        # Spark's F.lit list (a bare 0.95 literal would be DECIMAL(3,2))
        "quality_quantiles": rf"""
            WITH raw AS ({_REP_RAW} FROM documents),
            qf AS ({_Q_FEATURES} FROM raw),
            q AS (SELECT lang, {_Q_SCORE} AS qs FROM qf),
            agg AS (
                SELECT lang,
                       quantile_cont(qs, [0.25, 0.5, 0.75, 0.95]) AS qarr,
                       CAST(COUNT(*) AS BIGINT) AS n_docs
                FROM q GROUP BY lang
            )
            SELECT lang,
                   [CAST('0.25' AS DOUBLE), CAST('0.5' AS DOUBLE),
                    CAST('0.75' AS DOUBLE), CAST('0.95' AS DOUBLE)][i+1]
                       AS quantile,
                   round(qarr[i+1], 6) AS q_value,
                   n_docs
            FROM agg CROSS JOIN range(4) AS t(i)
        """,
        # closed-form over the synthesis: custkeys and names are unique
        # per row, segments are the classes, nations the linked IRIs —
        # the three object namespaces never collide
        "void_summary": """
            SELECT CAST(3 * COUNT(*) AS BIGINT) AS n_triples,
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
                       AS distinct_subjects,
                   CAST(3 AS BIGINT) AS properties,
                   CAST(COUNT(DISTINCT c_mktsegment)
                        + COUNT(DISTINCT c_name)
                        + COUNT(DISTINCT c_nationkey) AS BIGINT)
                       AS distinct_objects,
                   CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS classes,
                   CAST(COUNT(DISTINCT c_custkey)
                        + COUNT(DISTINCT c_mktsegment)
                        + COUNT(DISTINCT c_nationkey) AS BIGINT)
                       AS entities,
                   CAST(COUNT(*) AS BIGINT) AS literals
            FROM customer
        """,
        "void_property_partition": """
            SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                   CAST(COUNT(*) AS BIGINT) AS triples,
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
                       AS distinct_subjects,
                   CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
                       AS distinct_objects
            FROM customer
            UNION ALL
            SELECT 'urn:p:name', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
                   CAST(COUNT(DISTINCT c_name) AS BIGINT)
            FROM customer
            UNION ALL
            SELECT 'urn:p:nation', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
                   CAST(COUNT(DISTINCT c_nationkey) AS BIGINT)
            FROM customer
        """,
        "void_class_partition": """
            SELECT 'urn:class:' || c_mktsegment AS class_iri,
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS entities
            FROM customer
            GROUP BY c_mktsegment
        """,
        # each planted violation family regenerated closed-form
        "shacl_report": f"""
            SELECT 'u:order:' || o_orderkey AS focus,
                   'u:OrderShape' AS shape_id, 'u:p:prio' AS path,
                   'minCount' AS "constraint", '0' AS value,
                   '1' AS expected
            FROM orders WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT 'u:order:' || o_orderkey, 'u:OrderShape', 'u:p:prio',
                   'maxCount', '2', '1'
            FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
            UNION ALL
            SELECT 'u:order:' || o_orderkey, 'u:OrderShape', 'u:p:cust',
                   'class', 'u:cust:' || o_custkey, 'u:Customer'
            FROM orders WHERE o_custkey % 5 = 0
            UNION ALL
            SELECT 'u:order:' || o_orderkey, 'u:OrderShape', 'u:p:note',
                   'datatype', 'note', '{XSD_INTEGER}'
            FROM orders WHERE o_orderkey % 13 = 0
            UNION ALL
            SELECT 'u:order:' || o_orderkey, 'u:OrderShape', 'u:p:flag',
                   'in', o_orderstatus, '(O F)'
            FROM orders WHERE o_orderstatus NOT IN ('O', 'F')
        """,
        # every planted violation family regenerated closed-form; the
        # negative-balance test mirrors the engine exactly (compare the
        # DECIMAL(12,2) lexical re-cast to DECIMAL(38,9), not the raw
        # double, so a hypothetical -0.004 balance can't diverge)
        "shacl_shapes": f"""
            WITH c AS (
                SELECT c_custkey AS k, c_name, c_nationkey AS nk,
                       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
                           AS bal,
                       c_mktsegment AS seg
                FROM customer
            )
            SELECT 'u:c:' || k AS focus, 'u:CustShape' AS shape_id,
                   'u:phone' AS path, 'minCount' AS "constraint",
                   '0' AS value, '1' AS expected
            FROM c WHERE k % 7 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:name', 'maxCount',
                   '2', '1'
            FROM c WHERE k % 5 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:name', 'pattern',
                   'alt ' || c_name, '^Customer'
            FROM c WHERE k % 5 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:name', 'maxLength',
                   'alt ' || c_name, '18'
            FROM c WHERE k % 5 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:bal', 'datatype',
                   bal, '{terms.XSD_DECIMAL}'
            FROM c WHERE k % 13 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:bal', 'minInclusive',
                   bal, '0'
            FROM c WHERE k % 13 = 0
               OR CAST(bal AS DECIMAL(38,9)) < 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:seg', 'in', seg,
                   '(AUTOMOBILE BUILDING FURNITURE HOUSEHOLD)'
            FROM c WHERE seg NOT IN
                ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD')
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:nat', 'nodeKind',
                   'NATION_' || nk, 'IRI'
            FROM c WHERE k % 11 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:nat', 'class',
                   CASE WHEN k % 11 = 0 THEN 'NATION_' || nk
                        ELSE 'u:n:' || nk END, 'u:Nation'
            FROM c WHERE k % 11 = 0 OR nk >= 20
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:tag', 'hasValue',
                   CAST(NULL AS VARCHAR), 'gold'
            FROM c WHERE k % 3 <> 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:CustShape', 'u:extra', 'closed',
                   'x' || k, 'closed'
            FROM c WHERE k % 17 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:SQShape', NULL, 'sparql',
                   seg, 'machinery customers need a gold tag'
            FROM c WHERE seg = 'MACHINERY' AND k % 3 <> 0
        """,
        # identical integer window arithmetic: stride 24 = 32 − 8,
        # n_chunks = 1 + (max(n−32,0) + 23) // 24, DuckDB list slices
        # are 1-based inclusive and end-clamped like Spark's slice()
        "chunk_documents": r"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text),
                                                         '\s+'),
                                   x -> x <> '') AS t
                FROM documents
            ),
            n AS (
                SELECT doc_id, t, len(t) AS n,
                       1 + (greatest(len(t) - 32, 0) + 23) // 24
                           AS n_chunks
                FROM tk WHERE len(t) > 0
            )
            SELECT doc_id, CAST(i AS INT) AS chunk_ix,
                   CAST(i * 24 AS BIGINT) AS begin_token,
                   CAST(least(32, n - i * 24) AS BIGINT) AS n_tokens,
                   array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ')
                       AS chunk_text
            FROM n, UNNEST(range(0, n_chunks)) AS u(i)
        """,
        # surviving lists regenerated closed-form: k%31 (dangling tail)
        # and k%37 with length ≥ 2 (duplicate rdf:first) are dropped
        "rdf_lists": f"""
            SELECT 'u:cell:' || k || ':0' AS head, CAST(j AS INT) AS ix,
                   'item ' || k || ':' || j AS member,
                   CAST(2 AS INT) AS member_kind,
                   '{XSD_STRING}' AS member_datatype,
                   CAST(NULL AS VARCHAR) AS member_lang
            FROM (SELECT c_custkey AS k, c_custkey % 5 + 1 AS ln
                  FROM customer
                  WHERE c_custkey % 31 <> 0
                    AND NOT (c_custkey % 37 = 0 AND c_custkey % 5 >= 1)),
                 UNNEST(range(0, ln)) AS u(j)
        """,
        # violator-set algebra closed-form: or = neither contact, xone =
        # both or neither, not = has the forbidden flag, value-or = the
        # k%7 strings that fail both alternatives
        "shacl_logic": """
            WITH c AS (SELECT c_custkey AS k FROM customer)
            SELECT 'u:c:' || k AS focus, 'u:SOr' AS shape_id,
                   CAST(NULL AS VARCHAR) AS path, 'or' AS "constraint",
                   CAST(NULL AS VARCHAR) AS value,
                   '(2 operand shapes)' AS expected
            FROM c WHERE k % 2 <> 0 AND k % 3 <> 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:SX', CAST(NULL AS VARCHAR), 'xone',
                   CAST(NULL AS VARCHAR), '(2 operand shapes)'
            FROM c WHERE k % 6 = 0 OR (k % 2 <> 0 AND k % 3 <> 0)
            UNION ALL
            SELECT 'u:c:' || k, 'u:SN', CAST(NULL AS VARCHAR), 'not',
                   CAST(NULL AS VARCHAR), 'sh:not operand'
            FROM c WHERE k % 5 = 0
            UNION ALL
            SELECT 'u:c:' || k, 'u:SV', 'u:val', 'or', 'bad' || k,
                   '(2 alternatives)'
            FROM c WHERE k % 7 = 0
        """,
        "wat_links": """
            SELECT 'http://src' || (doc_id % 5) || '.test/d' || doc_id
                       AS url,
                   'http://h' || ((doc_id + j) % 7) || '.test/p' || j
                       AS href,
                   'a' || j AS anchor, 'A@/href' AS link_path
            FROM (SELECT doc_id, doc_id % 3 + 1 AS n FROM documents),
                 UNNEST(range(1, n + 1)) AS u(j)
        """,
        # FULL replay: same md5 bucket, same α smoothing (α·B as the
        # runtime IEEE product — a 40.96 literal would differ at 1e-15),
        # ln rounded 9 dp, count×weight rounded 9 dp, DECIMAL(38,9) sum
        "dsir_weights": r"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text),
                                                         '\s+'),
                                   x -> x <> '') AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
                FROM tk, UNNEST(range(1, len(t))) AS u(i)
            ),
            db AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                           % 4096 AS b,
                       COUNT(*) AS cnt
                FROM grams GROUP BY 1, 2
            ),
            rb AS (SELECT b, CAST(SUM(cnt) AS DOUBLE) AS cr
                   FROM db GROUP BY b),
            tb AS (SELECT b, CAST(SUM(cnt) AS DOUBLE) AS ct
                   FROM db WHERE doc_id % 10 < 2 GROUP BY b),
            nr AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM db),
            nt AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n
                   FROM db WHERE doc_id % 10 < 2),
            w AS (
                SELECT COALESCE(tb.b, rb.b) AS b,
                       round(
                           ln((COALESCE(tb.ct, 0)
                               + CAST('0.01' AS DOUBLE))
                              / (nt.n + CAST('0.01' AS DOUBLE) * 4096))
                         - ln((COALESCE(rb.cr, 0)
                               + CAST('0.01' AS DOUBLE))
                              / (nr.n + CAST('0.01' AS DOUBLE) * 4096)),
                           9) AS w
                FROM rb FULL JOIN tb ON rb.b = tb.b
                CROSS JOIN nt CROSS JOIN nr
            ),
            s AS (
                SELECT db.doc_id,
                       SUM(CAST(round(db.cnt * w.w, 9)
                                AS DECIMAL(38,9))) AS s,
                       CAST(SUM(db.cnt) AS BIGINT) AS n_grams
                FROM db JOIN w USING (b) GROUP BY db.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(round(CAST(s.s AS DOUBLE), 6), 0.0)
                       AS dsir_logw,
                   COALESCE(s.n_grams, 0) AS n_grams
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN s USING (doc_id)
        """,
        # each delta row regenerated closed-form from the plant rules
        "store_diff": f"""
            SELECT 'added' AS change, 'u:o:' || o_orderkey AS s,
                   1 AS s_kind, 'u:p:st' AS p, 'A' AS o, 2 AS o_kind,
                   '{XSD_STRING}' AS o_datatype,
                   CAST(NULL AS VARCHAR) AS o_lang
            FROM orders WHERE o_orderkey % 4 <> 0 AND o_orderkey % 7 = 0
            UNION ALL
            SELECT 'removed', 'u:o:' || o_orderkey, 1, 'u:p:st',
                   CASE WHEN o_orderkey % 7 = 0 THEN 'B' ELSE 'A' END,
                   2, '{XSD_STRING}', NULL
            FROM orders WHERE o_orderkey % 4 = 0
            UNION ALL
            SELECT 'removed', 'u:o:' || o_orderkey, 1, 'u:p:st', 'B',
                   2, '{XSD_STRING}', NULL
            FROM orders WHERE o_orderkey % 4 <> 0 AND o_orderkey % 7 = 0
        """,
        # FULL replay: exact f32→f64 widening, round-12 DECIMAL sums,
        # IEEE final combine rounded 9 dp
        "embedding_covariance": """
            WITH e AS (
                SELECT embedding AS v FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64
            ),
            cells AS (
                SELECT t.i, u.j,
                       CAST(round(CAST(v[t.i + 1] AS DOUBLE)
                                  * CAST(v[u.j + 1] AS DOUBLE), 12)
                            AS DECIMAL(38,12)) AS p
                FROM e, UNNEST(range(64)) t(i), UNNEST(range(64)) u(j)
                WHERE u.j >= t.i
            ),
            sxy AS (SELECT i, j, SUM(p) AS sxy FROM cells GROUP BY i, j),
            sx AS (
                SELECT t.i,
                       SUM(CAST(round(CAST(v[t.i + 1] AS DOUBLE), 12)
                                AS DECIMAL(38,12))) AS sx
                FROM e, UNNEST(range(64)) t(i) GROUP BY t.i
            ),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM e)
            SELECT CAST(s.i AS INTEGER) AS i, CAST(s.j AS INTEGER) AS j,
                   round(CAST(s.sxy AS DOUBLE) / n.c
                         - (CAST(a.sx AS DOUBLE) / n.c)
                         * (CAST(b.sx AS DOUBLE) / n.c), 9) AS cov
            FROM sxy s JOIN sx a ON s.i = a.i JOIN sx b ON s.j = b.i
            CROSS JOIN n
        """,
        # closed-form replay of the reification expansion; DuckDB's
        # md5() rebuilds the ground statement IRIs from the identical
        # canonical N-Triples key
        "turtle_star_parse": f"""
            WITH o AS (
                SELECT 'urn:order:' || o_orderkey AS subj,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2))
                            AS VARCHAR) AS pr,
                       o_orderstatus AS st,
                       'urn:crawl:' || (o_orderkey % 4) AS src
                FROM orders
            ), q AS (
                SELECT subj, pr, st, src,
                       'urn:rdfstar:' || md5('<' || subj ||
                           '> <urn:p:price> "' || pr || '"') AS qt1,
                       'urn:rdfstar:' || md5('<' || subj ||
                           '> <urn:p:status> "' || st || '"') AS qt2
                FROM o
            )
            SELECT subj AS s, 'urn:p:price' AS p, pr AS o, 2 AS o_kind,
                   '{XSD_STRING}' AS o_datatype FROM q
            UNION ALL SELECT qt1,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#Statement',
                1, NULL FROM q
            UNION ALL SELECT qt1,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#subject',
                subj, 1, NULL FROM q
            UNION ALL SELECT qt1,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate',
                'urn:p:price', 1, NULL FROM q
            UNION ALL SELECT qt1,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#object',
                pr, 2, '{XSD_STRING}' FROM q
            UNION ALL SELECT qt1, 'urn:p:src', src, 1, NULL FROM q
            UNION ALL SELECT qt1, 'urn:p:conf', '0.9', 2,
                '{terms.XSD_DECIMAL}' FROM q
            UNION ALL SELECT qt2,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#Statement',
                1, NULL FROM q
            UNION ALL SELECT qt2,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#subject',
                subj, 1, NULL FROM q
            UNION ALL SELECT qt2,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate',
                'urn:p:status', 1, NULL FROM q
            UNION ALL SELECT qt2,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#object',
                st, 2, '{XSD_STRING}' FROM q
            UNION ALL SELECT qt2, 'urn:p:src', src, 1, NULL FROM q
        """,
        # FULL replay of the md5 walk lottery as generated CTE rounds
        "graph_walks": _walks_sql(),
        # Bellman-Ford fixpoint as generated MATERIALIZED CTE rounds
        "shortest_paths": _sssp_sql(),
        # closed-form LPG projection: customer nodes labeled by the
        # rdf:type local name, DISTINCT nation nodes unlabeled, one
        # name property and one inNation edge per customer
        "property_graph": """
            SELECT 'node' AS kind, 'urn:cust/' || c_custkey AS a,
                   'Customer' AS b, CAST(NULL AS VARCHAR) AS c
            FROM customer
            UNION ALL
            SELECT DISTINCT 'node', 'urn:nation/' || c_nationkey,
                   NULL, NULL
            FROM customer
            UNION ALL
            SELECT 'prop', 'urn:cust/' || c_custkey, 'name', c_name
            FROM customer
            UNION ALL
            SELECT 'edge', 'urn:cust/' || c_custkey, 'inNation',
                   'urn:nation/' || c_nationkey
            FROM customer
        """,
        # closed-form Direct Mapping replay: 6 triples per order (type,
        # 4 typed/plain literals, 1 ref)
        "direct_map": f"""
            WITH o AS (
                SELECT 'urn:dm:orders/o_orderkey=' || o_orderkey AS s,
                       o_orderkey AS k, o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2))
                            AS VARCHAR) AS pr,
                       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS dt,
                       o_custkey AS ck
                FROM orders
            )
            SELECT s, 1 AS s_kind,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                       AS p,
                   'urn:dm:orders' AS o, 1 AS o_kind,
                   CAST(NULL AS VARCHAR) AS o_datatype,
                   CAST(NULL AS VARCHAR) AS o_lang
            FROM o
            UNION ALL SELECT s, 1, 'urn:dm:orders#o_orderkey',
                CAST(k AS VARCHAR), 2, '{terms.XSD}integer', NULL FROM o
            UNION ALL SELECT s, 1, 'urn:dm:orders#o_orderstatus',
                st, 2, NULL, NULL FROM o
            UNION ALL SELECT s, 1, 'urn:dm:orders#o_price',
                pr, 2, '{terms.XSD}decimal', NULL FROM o
            UNION ALL SELECT s, 1, 'urn:dm:orders#o_orderdate',
                dt, 2, '{terms.XSD}dateTime', NULL FROM o
            UNION ALL SELECT s, 1, 'urn:dm:orders#o_custkey',
                CAST(ck AS VARCHAR), 2, '{terms.XSD}integer', NULL FROM o
            UNION ALL SELECT s, 1, 'urn:dm:orders#ref-o_custkey',
                'urn:dm:customer/c_custkey=' || ck, 1, NULL, NULL FROM o
        """,
        # FULL Lloyd replay: same decimal distance sums, argmin with
        # cluster-id tie-break, double centroid means, seed fallback for
        # empty clusters — two rounds as chained CTEs
        "kmeans": """
            WITH e AS (
                SELECT vec_id, embedding AS v FROM embeddings
                WHERE embedding IS NOT NULL
            ),
            seeds AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v
                FROM e ORDER BY vec_id LIMIT 4
            ),
            c0 AS (
                SELECT cl, t.i AS i, CAST(v[t.i + 1] AS DOUBLE) AS c
                FROM seeds, UNNEST(range(64)) t(i)
            ),
            d1 AS (
                SELECT e.vec_id, c0.cl,
                       SUM(CAST(round(
                           (CAST(e.v[c0.i + 1] AS DOUBLE) - c0.c)
                           * (CAST(e.v[c0.i + 1] AS DOUBLE) - c0.c), 12)
                           AS DECIMAL(38,12))) AS dist
                FROM e, c0 GROUP BY e.vec_id, c0.cl
            ),
            a1 AS (
                SELECT vec_id, cl FROM (
                    SELECT vec_id, cl, row_number() OVER (
                        PARTITION BY vec_id ORDER BY dist ASC, cl ASC
                    ) AS rn FROM d1
                ) WHERE rn = 1
            ),
            m1 AS (
                SELECT a1.cl AS cl, t.i AS i,
                       CAST(SUM(CAST(round(CAST(e.v[t.i + 1] AS DOUBLE),
                                           12) AS DECIMAL(38,12)))
                            AS DOUBLE) / COUNT(*) AS mean
                FROM a1 JOIN e USING (vec_id), UNNEST(range(64)) t(i)
                GROUP BY a1.cl, t.i
            ),
            c1 AS (
                SELECT c0.cl, c0.i, COALESCE(m1.mean, c0.c) AS c
                FROM c0 LEFT JOIN m1 ON m1.cl = c0.cl AND m1.i = c0.i
            ),
            d2 AS (
                SELECT e.vec_id, c1.cl,
                       SUM(CAST(round(
                           (CAST(e.v[c1.i + 1] AS DOUBLE) - c1.c)
                           * (CAST(e.v[c1.i + 1] AS DOUBLE) - c1.c), 12)
                           AS DECIMAL(38,12))) AS dist
                FROM e, c1 GROUP BY e.vec_id, c1.cl
            )
            SELECT vec_id, CAST(cl AS INTEGER) AS cluster FROM (
                SELECT vec_id, cl, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist ASC, cl ASC
                ) AS rn FROM d2
            ) WHERE rn = 1
        """,
        # closed-form: the odd-key (confidence-0.9) orders
        "sparql_star": """
            SELECT 'urn:order:' || o_orderkey AS ord,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
                       AS price,
                   'urn:crawl:' || (o_orderkey % 4) AS src
            FROM orders WHERE o_orderkey % 2 = 1
        """,
        # FULL replay of the weighted vote: same assertion synthesis
        # (incl. the duplicate src_a vote), per-source dedup, per-value
        # support sums, and the (w DESC, o ASC) winner rule; confidence
        # is the same IEEE double division of exact integer sums
        "fuse_values": """
            WITH src AS (
                SELECT 'urn:o:' || o_orderkey AS s, o_orderkey AS k,
                       o_orderstatus AS st, o_orderpriority AS pr
                FROM orders
            ),
            a AS (
                SELECT s, 'urn:p:status' AS p, st AS o,
                       'src_a' AS source, 3 AS trust FROM src
                UNION ALL SELECT s, 'urn:p:status', st, 'src_a', 3 FROM src
                UNION ALL SELECT s, 'urn:p:status', st, 'src_b', 2 FROM src
                UNION ALL SELECT s, 'urn:p:status',
                    CASE WHEN k % 3 = 0 THEN 'XX' ELSE st END,
                    'src_c', 4 FROM src
                UNION ALL SELECT s, 'urn:p:prio', pr, 'src_a', 2 FROM src
                UNION ALL SELECT s, 'urn:p:prio',
                    CASE WHEN k % 5 = 0 THEN '0AAA' ELSE pr END,
                    'src_c', 2 FROM src
            ),
            ps AS (
                SELECT s, p, o, source, MAX(trust) AS trust
                FROM a GROUP BY s, p, o, source
            ),
            sup AS (
                SELECT s, p, o, SUM(trust) AS w, COUNT(*) AS ns
                FROM ps GROUP BY s, p, o
            ),
            win AS (
                SELECT s, p, o, w, ns,
                       ROW_NUMBER() OVER (PARTITION BY s, p
                                          ORDER BY w DESC, o ASC) AS rn,
                       SUM(w) OVER (PARTITION BY s, p) AS total,
                       COUNT(*) OVER (PARTITION BY s, p) AS n_values,
                       SUM(ns) OVER (PARTITION BY s, p) AS n_sources
                FROM sup
            )
            SELECT s, p, o,
                   CAST(w AS DOUBLE) AS support,
                   CAST(total AS DOUBLE) AS total,
                   CAST(w AS DOUBLE) / CAST(total AS DOUBLE)
                       AS confidence,
                   CAST(n_values AS BIGINT) AS n_values,
                   CAST(n_sources AS BIGINT) AS n_sources
            FROM win WHERE rn = 1
        """,
        # closed-form: the planted pairs from doc_id arithmetic; the
        # organic text is all-lowercase so the capitalized-NP patterns
        # cannot add rows beyond these
        "hearst_hyponyms": """
            SELECT doc_id, 'Alpha' || doc_id AS hyponym,
                   'Vendors' AS hypernym, 'such_as' AS pattern
            FROM documents
            UNION ALL SELECT doc_id, 'Beta' || doc_id, 'Vendors',
                'such_as' FROM documents
            UNION ALL SELECT doc_id, 'Gamma' || doc_id, 'Vendors',
                'such_as' FROM documents
            UNION ALL SELECT doc_id, 'Delta' || doc_id, 'Carriers',
                'and_other' FROM documents WHERE doc_id % 2 = 0
            UNION ALL SELECT doc_id, 'Epsilon' || doc_id, 'Tools',
                'including' FROM documents WHERE doc_id % 3 = 0
            UNION ALL SELECT doc_id, 'Zeta' || doc_id, 'Regions',
                'especially' FROM documents WHERE doc_id % 5 = 0
            UNION ALL SELECT doc_id, 'Eta' || doc_id, 'Firms',
                'such_np_as' FROM documents WHERE doc_id % 7 = 0
            UNION ALL SELECT doc_id, 'Theta' || doc_id, 'Firms',
                'such_np_as' FROM documents WHERE doc_id % 7 = 0
        """,
        # closed-form: 3 triples per order (header slugs, row-2 empty
        # price dropped, headerless col / header-only table / stray td
        # all absent)
        "table_triples": """
            WITH o AS (
                SELECT 'https://kb.example/o/' || o_orderkey AS url,
                       o_orderkey AS k, o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2))
                            AS VARCHAR) AS pr
                FROM orders
            )
            SELECT url, url || '#table-0-row-1' AS s, 1 AS s_kind,
                   'urn:table:p:order_status' AS p, st AS o,
                   2 AS o_kind, CAST(NULL AS VARCHAR) AS o_datatype,
                   CAST(NULL AS VARCHAR) AS o_lang
            FROM o
            UNION ALL SELECT url, url || '#table-0-row-1', 1,
                'urn:table:p:total_price', pr, 2, NULL, NULL FROM o
            UNION ALL SELECT url, url || '#table-0-row-2', 1,
                'urn:table:p:order_status', 'P' || k, 2, NULL, NULL
            FROM o
        """,
        # closed-form: 2 triples per part, subject minted from the
        # slugged column-0 cell ('Part 7' -> part_7); the keyless
        # second row vanishes whole
        "table_triples_keyed": """
            WITH p AS (
                SELECT 'https://kb.example/p/' || p_partkey AS url,
                       p_partkey AS k, p_brand AS br,
                       CAST(CAST(p_retailprice AS DECIMAL(12,2))
                            AS VARCHAR) AS pr
                FROM part
            )
            SELECT url, url || '#part_' || k AS s, 1 AS s_kind,
                   'urn:table:p:retail_price' AS p, pr AS o,
                   2 AS o_kind, CAST(NULL AS VARCHAR) AS o_datatype,
                   CAST(NULL AS VARCHAR) AS o_lang
            FROM p
            UNION ALL SELECT url, url || '#part_' || k, 1,
                'urn:table:p:brand', br, 2, NULL, NULL FROM p
        """,
    }
