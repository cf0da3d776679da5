"""Format conversion — the distributed analogue of the reference's rdf2rdf
companion tool (cited in /root/reference/rdf.go:38): read any supported
serialization, write any supported serialization, at cluster scale.

Support matrix: decode NT/NQ/Turtle/TriG/JSON-LD/RDF-XML, encode all
six (the reference decodes 4 / encodes 3, rdf.go:14-22 — TriG, JSON-LD,
and the RDF/XML encoder exceed parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_spark import encoders, sources

DECODERS = {"ntriples", "nquads", "turtle", "trig", "jsonld", "rdfxml"}
ENCODERS = {"ntriples", "nquads", "turtle", "trig", "jsonld", "rdfxml",
            "ntriples-star"}


def read_rdf(spark: SparkSession, path: str, fmt: str, base: str = "",
             errors: str = "quarantine") -> DataFrame:
    """Read RDF file(s) of any supported format into the canonical schema.

    Line formats split at line boundaries (fully parallel); document
    formats read whole files (one document per file) via binaryFile.
    """
    if fmt not in DECODERS:
        raise ValueError(f"no decoder for format: {fmt}")
    if fmt == "ntriples":
        return sources.read_ntriples(spark, path, errors=errors)
    if fmt == "nquads":
        return sources.read_nquads(spark, path, errors=errors)
    docs = (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.col("path").alias("url"),
            F.decode(F.col("content"), "utf-8").alias("text"),
        )
    )
    return sources.parse_documents(
        docs, fmt=fmt, base_from_url=not base, base=base, errors=errors
    ).drop("url")


def _ensure_graph_cols(df: DataFrame) -> DataFrame:
    """Add the default-graph columns when a triples DF feeds a quad sink."""
    if "graph" in df.columns:
        return df
    from rdf_spark import terms

    return df.withColumn("graph", F.lit(terms.DEFAULT_GRAPH)).withColumn(
        "graph_kind", F.lit(0).cast("tinyint")
    )


def write_rdf(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in ENCODERS:
        raise ValueError(f"no encoder for format: {fmt}")
    if fmt == "ntriples":
        encoders.write_ntriples(df, path)
    elif fmt == "ntriples-star":
        # fold reification statements back into << >> quoted terms
        from rdf_spark.rdfstar import write_ntriples_star

        write_ntriples_star(df, path)
    elif fmt == "nquads":
        encoders.write_nquads(_ensure_graph_cols(df), path)
    elif fmt == "jsonld":
        encoders.write_jsonld(df, path)
    elif fmt == "rdfxml":
        encoders.write_rdfxml(df, path)
    elif fmt == "trig":
        encoders.write_trig(_ensure_graph_cols(df), path)
    else:
        encoders.write_turtle(df, path)


def convert(spark: SparkSession, in_path: str, in_fmt: str, out_path: str,
            out_fmt: str, base: str = "", skolemize: bool = True,
            infer: str | None = None, schema_path: str = "",
            schema_format: str = "turtle", resolve_sameas: bool = False,
            keep_sameas_links: bool = False,
            canonicalize: bool = False) -> int:
    """Convert between serializations; returns the triple count written.

    ``infer="rdfs"`` materializes the ρdf closure between decode and
    encode (ops/reasoning.py) — the distributed analogue of
    ``riot --rdfs``; the ontology defaults to the input itself, or pass
    ``schema_path``/``schema_format`` to reason against an external
    vocabulary.  ``resolve_sameas=True`` rewrites owl:sameAs components
    to their canonical representative first (``keep_sameas_links``
    keeps the provenance triples).

    ``canonicalize=True`` (requires ``skolemize=False``) relabels blank
    nodes to their RDFC-1.0 canonical ``_:c14nN`` ids per input
    document (rdf_spark/canon.py) — the byte-reproducible variant of
    label preservation: two conversions of isomorphic inputs emit
    identical labels.  Like ``skolemize=False`` itself, it is meant for
    single-document conversions (canonical labels are per-document and
    would collide across merged documents; skolemization is the
    merge-safe mode).

    ``skolemize=True`` (default) rewrites blank labels to per-document
    skolem IRIs: blank labels are only unique within one input document
    (rdf.go:497-508), so merging many files without skolemization would
    collide ``_:b1`` across documents — for line formats this routes
    through the per-FILE document parser so labels get the correct
    file scope.  Pass False for single-document conversions that must
    preserve labels (reference-rdf2rdf behavior; line formats then take
    the fully line-parallel fast path).
    """
    if canonicalize and skolemize:
        raise ValueError(
            "canonicalize rewrites blank labels in place — pass "
            "skolemize=False (--keep-blank-labels)"
        )
    if in_fmt in ("ntriples", "nquads") and not skolemize \
            and not canonicalize:
        # label-preserving fast path: fully line-parallel (the right mode
        # for single-document conversions, matching rdf2rdf)
        df = read_rdf(spark, in_path, in_fmt, base=base)
        good = df.filter(F.col("err").isNull()).drop("err")
    else:
        if in_fmt not in DECODERS:
            raise ValueError(f"no decoder for format: {in_fmt}")
        docs = (
            spark.read.format("binaryFile")
            .load(in_path)
            .select(
                F.col("path").alias("url"),
                F.decode(F.col("content"), "utf-8").alias("text"),
            )
        )
        parsed = sources.parse_documents(
            docs, fmt=in_fmt, base_from_url=not base, base=base
        )
        good = parsed.filter(F.col("err").isNull()).drop("err")
        if skolemize:
            from rdf_spark import canonical

            good = canonical.skolemize(good)
        elif canonicalize:
            from rdf_spark.canon import canonicalize_blank_nodes

            good = canonicalize_blank_nodes(good, "url")
        good = good.drop("url")
    if resolve_sameas:
        from rdf_spark.ops.reasoning import sameas_resolve

        good = sameas_resolve(good, keep_links=keep_sameas_links)
    if infer in ("rdfs", "owl", "rdfs+owl"):
        from rdf_spark.ops.reasoning import owl_property_closure, rdfs_closure

        schema = None
        if schema_path:
            schema = read_rdf(spark, schema_path, schema_format).filter(
                F.col("err").isNull()
            ).drop("err")
        # property algebra first: inverse/symmetric/transitive edges
        # then feed rdfs7 inheritance and domain/range typing
        if infer in ("owl", "rdfs+owl"):
            good = owl_property_closure(good, schema=schema)
        if infer in ("rdfs", "rdfs+owl"):
            good = rdfs_closure(good, schema=schema)
    elif infer:
        raise ValueError(f"unknown inference profile: {infer}")
    write_rdf(good, out_path, out_fmt)
    return good.count()
