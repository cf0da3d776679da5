"""W3C Direct Mapping: relational DataFrames → RDF triples.

Implements the core of the W3C "A Direct Mapping of Relational Data to
RDF" recommendation (https://www.w3.org/TR/rdb-direct-mapping/) over
Spark DataFrames — the standard tabular→KG on-ramp (CSV dumps, parquet
lakes, database exports) that complements the HTML-side
ops/content.table_to_triples.  No reference analogue: /root/reference
parses serialized RDF only (rdf.go:14-22).

Per the recommendation, for a table T with primary key columns pk:

* row node: ``<base>T/pk1=v1;pk2=v2`` (values percent-encoded with the
  RFC 3986 unreserved set — the same recipe as SPARQL ENCODE_FOR_URI);
  a table WITHOUT a primary key maps rows to blank nodes.  DEVIATION
  (documented): the spec mints a FRESH blank per row, which is
  impossible to do deterministically in a distributed, re-runnable
  job — we mint ``_:dm<md5 of all column lexicals>`` instead, so
  byte-identical duplicate rows merge (deterministic, and the behavior
  a KG pipeline wants anyway).
* one ``rdf:type <base>T`` triple per row;
* one literal triple ``<base>T#col`` per non-null column, datatyped by
  the column's Spark type (integer family → xsd:integer, double/float
  → xsd:double, decimal → xsd:decimal, boolean → xsd:boolean, date →
  xsd:date, timestamp → xsd:dateTime, binary → xsd:hexBinary, string →
  plain);
* one reference triple ``<base>T#ref-col`` per non-null foreign key,
  pointing at the referenced table's row node.

Scale shape: ONE narrow scan — all triples of a row are built as an
array of structs in a single projection and exploded (no per-column
scan union, no shuffle, no Python).  Output is the canonical triple
schema (s, s_kind, p, o, o_kind, o_datatype, o_lang).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from rdf_spark.terms import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    XSD,
    XSD_BOOLEAN,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
)

XSD_DATE = XSD + "date"
XSD_HEX_BINARY = XSD + "hexBinary"


def percent_encode(c: Column) -> Column:
    """RFC 3986 unreserved-set percent-encoding (uppercase hex) — the
    SPARQL ENCODE_FOR_URI recipe (sparql.py §17.4.2.8 compile): Java
    url_encode with its three divergences fixed up."""
    enc = F.url_encode(c)
    enc = F.replace(enc, F.lit("+"), F.lit("%20"))
    enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
    return F.replace(enc, F.lit("%7E"), F.lit("~"))


def _lexical(c: Column, dtype: T.DataType) -> tuple[Column, str | None]:
    """(lexical-form column, o_datatype) for one relational column
    (null o_datatype ⇒ plain xsd:string, the canonical-schema rule)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return c.cast("string"), XSD_INTEGER
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return c.cast("double").cast("string"), XSD_DOUBLE
    if isinstance(dtype, T.DecimalType):
        return c.cast("string"), XSD_DECIMAL
    if isinstance(dtype, T.BooleanType):
        return c.cast("string"), XSD_BOOLEAN
    if isinstance(dtype, T.DateType):
        return c.cast("string"), XSD_DATE
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return (
            F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss"),
            XSD_DATETIME,
        )
    if isinstance(dtype, T.BinaryType):
        return F.lower(F.hex(c)), XSD_HEX_BINARY
    return c.cast("string"), None


def _row_node(
    df: DataFrame, table: str, base: str, pk: list[str] | None
) -> tuple[Column, int]:
    if pk:
        parts: list[Column] = []
        for i, col in enumerate(pk):
            if i:
                parts.append(F.lit(";"))
            parts.append(F.lit(col + "="))
            parts.append(percent_encode(F.col(col).cast("string")))
        return F.concat(F.lit(base + table + "/"), *parts), KIND_IRI
    # to_json over the full-row struct: null columns and separator-like
    # characters are quoted unambiguously, so ONLY byte-identical rows
    # share a key (concat_ws would silently skip nulls and collide
    # ('x', NULL) with (NULL, 'x'))
    key = F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    return F.concat(F.lit("_:dm"), key), KIND_BLANK


def direct_map(
    df: DataFrame,
    table: str,
    base: str = "urn:dm:",
    pk: list[str] | None = None,
    fks: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Direct-map one DataFrame (see module docstring).

    ``pk``: primary-key column names (order defines the row-node IRI).
    ``fks``: ``{col: (ref_table, ref_pk_col)}`` foreign keys — each
    emits a ``<base>table#ref-col`` triple to the referenced row node
    (single-column references; the referenced table is assumed to use
    ``[ref_pk_col]`` as its ``pk``).
    """
    if pk:
        missing = [c for c in pk if c not in df.columns]
        if missing:
            raise ValueError(f"pk columns not in DataFrame: {missing}")
    for col in (fks or {}):
        if col not in df.columns:
            raise ValueError(f"fk column not in DataFrame: {col}")
    subject, s_kind = _row_node(df, table, base, pk)
    nstr = F.lit(None).cast("string")

    def entry(p: Column, o: Column, o_kind: int, o_dt) -> Column:
        return F.struct(
            p.alias("p"),
            o.alias("o"),
            F.lit(o_kind).cast("tinyint").alias("o_kind"),
            (F.lit(o_dt) if o_dt is not None else nstr)
            .alias("o_datatype"),
        )

    entries = [entry(
        F.lit(RDF_TYPE), F.lit(base + table), KIND_IRI, None)]
    for field in df.schema.fields:
        lex, dt = _lexical(F.col(field.name), field.dataType)
        entries.append(entry(
            F.lit(base + table + "#" + field.name), lex, KIND_LITERAL, dt,
        ))
    for col, (ref_table, ref_col) in (fks or {}).items():
        ref = F.when(
            F.col(col).isNotNull(),
            F.concat(
                F.lit(base + ref_table + "/" + ref_col + "="),
                percent_encode(F.col(col).cast("string")),
            ),
        )
        entries.append(entry(
            F.lit(base + table + "#ref-" + col), ref, KIND_IRI, None))

    return (
        df.select(
            subject.alias("s"),
            F.lit(s_kind).cast("tinyint").alias("s_kind"),
            F.explode(F.array(*entries)).alias("_e"),
        )
        # a NULL pk value yields a NULL subject — a relational pk is
        # non-null by definition, so such rows are data errors and are
        # DROPPED rather than emitted as schema-violating null-s triples
        .filter(F.col("s").isNotNull() & F.col("_e.o").isNotNull())
        .select(
            "s", "s_kind",
            F.col("_e.p").alias("p"),
            F.col("_e.o").alias("o"),
            F.col("_e.o_kind").alias("o_kind"),
            F.col("_e.o_datatype").alias("o_datatype"),
            nstr.alias("o_lang"),
        )
    )
