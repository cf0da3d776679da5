"""Canonicalization operators: skolemization, validation, dedup, metrics.

These are the pipeline stages between parse and materialize (SURVEY.md
§2.6): everything here is pure DataFrame expressions (JVM-side, AQE- and
pushdown-friendly) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_spark import terms
from rdf_spark.terms import KIND_BLANK, KIND_IRI

SKOLEM_PREFIX = "urn:skolem:"


def _skolem_col(lex: Column, kind: Column, url: Column) -> Column:
    """Blank label + document url → globally-unique deterministic IRI.

    The reference mints ``_:b%d`` per document (ttl.go:244-245); labels are
    only meaningful within one document (rdf.go:497-508), so cross-document
    merges skolemize to a pure function of (url, label): SURVEY.md §4.3.
    Keeps kind=0 so provenance as a blank node is preserved (§1.4).
    """
    skolem = F.concat(
        F.lit(SKOLEM_PREFIX),
        F.lower(F.hex(F.xxhash64(url))),
        F.lit(":"),
        F.substring(lex, 3, 2**30),  # strip '_:'
    )
    return F.when((kind == KIND_BLANK) & lex.startswith("_:"), skolem).otherwise(lex)


def skolemize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Rewrite every blank-node label into a skolem IRI keyed by (url, label)."""
    url = F.col(url_col)
    out = df.withColumn("s", _skolem_col(F.col("s"), F.col("s_kind"), url)).withColumn(
        "o", _skolem_col(F.col("o"), F.col("o_kind"), url)
    )
    if "graph" in df.columns:
        # the default-graph sentinel is a dataset-level constant
        # (decoder.go:89), NOT a document-scoped label — never skolemize it
        out = out.withColumn(
            "graph",
            F.when(
                F.col("graph") == terms.DEFAULT_GRAPH, F.col("graph")
            ).otherwise(_skolem_col(F.col("graph"), F.col("graph_kind"), url)),
        )
    return out


# IRI validity (NewIRI, rdf.go:224-239) as a single JVM regex.
_BAD_IRI_RE = '[\\x00-\\x20<>"{}|^`\\\\]'


def iri_valid_col(c: Column) -> Column:
    return c.isNotNull() & (c != "") & ~c.rlike(_BAD_IRI_RE)


def lang_valid_col(c: Column) -> Column:
    """NewLangLiteral rule (rdf.go:365-392): one dash max, digits only
    after the dash."""
    return c.rlike("^[A-Za-z]+(-[A-Za-z0-9]+)?$")


def validate_triples(df: DataFrame) -> DataFrame:
    """Append a ``valid`` boolean column enforcing the positional constraints
    of the term model (rdf.go:400-415) plus IRI wellformedness — the
    DataFrame analogue of the reference's compile-time marker interfaces."""
    s_ok = F.when(
        F.col("s_kind") == KIND_IRI, iri_valid_col(F.col("s"))
    ).otherwise(F.col("s").isNotNull() & (F.col("s") != ""))
    p_ok = iri_valid_col(F.col("p"))
    o_ok = F.when(F.col("o_kind") == KIND_IRI, iri_valid_col(F.col("o"))).otherwise(
        F.col("o").isNotNull()
    )
    lang_ok = F.when(
        F.col("o_lang").isNotNull() & (F.col("o_lang") != ""), lang_valid_col(F.col("o_lang"))
    ).otherwise(F.lit(True))
    return df.withColumn("valid", s_ok & p_ok & o_ok & lang_ok)


_DEDUP_KEY = ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]


def dedup_key(columns) -> list[str]:
    """The full triple/quad identity key present in ``columns`` — the ONE
    definition every dedup/merge path must share (a triple and the same
    triple in another graph are different quads)."""
    key = [k for k in _DEDUP_KEY if k in columns]
    if "graph" in columns:
        key += ["graph", "graph_kind"]
    return key


def dedup_triples(df: DataFrame, keep_lineage: bool = False) -> DataFrame:
    """Exact triple dedup (generalizes encode-dedup E4, encoder.go:158-161).

    ``dropDuplicates`` compiles to a partial+final hash aggregate: each
    input partition dedups map-side before the shuffle, so hot triples
    collapse before moving — no manual salting needed for *exact* dedup at
    scale (the post-shuffle volume is already distinct keys).  With
    ``keep_lineage`` the first-seen url and a source count are kept.
    """
    key = dedup_key(df.columns)
    if keep_lineage and "url" in df.columns:
        if keep_lineage == "hash":
            # long-typed agg buffer keeps the plan in HashAggregate (a
            # var-len min(url) string buffer would force SortAggregate —
            # an extra sort per side of the exchange at 10^12 rows)
            aggs = [
                F.min(F.xxhash64("url")).alias("url_hash"),
                F.count(F.lit(1)).alias("n_sources"),
            ]
        else:
            aggs = [F.min("url").alias("url"), F.count(F.lit(1)).alias("n_sources")]
        return df.groupBy(*key).agg(*aggs)
    return df.dropDuplicates(key)


def iri_split_cols(c: Column) -> tuple[Column, Column]:
    """Prefix/suffix at the last '/' or '#' (IRI.Split rdf.go:208-219)."""
    prefix = F.regexp_extract(c, r"^(.*[/#])[^/#]*$", 1)
    suffix = F.regexp_extract(c, r"^.*[/#]([^/#]*)$", 1)
    return prefix, suffix


def typed_object_col(datatype: str, date_format: str | None = None) -> Column:
    """Lazy lexical→typed view of the object column (Literal.Typed
    rdf.go:303-335); improves on the reference by using DecimalType for
    xsd:decimal instead of float64.  ``date_format`` mirrors the
    package-level ``DateFormat`` override (rdf.go:52): when given, that
    Spark pattern is tried first for xsd:dateTime."""
    # try_cast throughout: under ANSI mode a plain cast THROWS on malformed
    # lexical values — a single bad literal must not kill the job (the
    # reference returns a per-value error from Typed(); our analogue is null)
    o = F.col("o")
    if datatype in (terms.XSD_INTEGER,):
        return o.try_cast("long")
    if datatype in (terms.XSD_INT,):
        return o.try_cast("int")
    if datatype in (terms.XSD_DOUBLE, terms.XSD_FLOAT):
        return o.try_cast("double")
    if datatype == terms.XSD_DECIMAL:
        return o.try_cast("decimal(38,18)")
    if datatype == terms.XSD_BOOLEAN:
        return o.try_cast("boolean")
    if datatype == terms.XSD_BYTE:
        # Typed() maps xsd:byte to the raw bytes of the lexical form
        # ([]byte(l.str), rdf.go:327-328) → BinaryType (UTF-8 bytes)
        return o.try_cast("binary")
    if datatype == terms.XSD_DATETIME:
        # RFC3339 first, then the reference's no-TZ fallback (ttl.go:574-585);
        # try_* because ANSI mode makes to_timestamp throw on non-matches
        patterns = ["yyyy-MM-dd'T'HH:mm:ssXXX", "yyyy-MM-dd'T'HH:mm:ss"]
        if date_format:
            patterns.insert(0, date_format)
        return F.coalesce(*[F.try_to_timestamp(o, F.lit(p)) for p in patterns])
    return o


def literal_object_cols(
    df: DataFrame, colname: str, date_format: str = "yyyy-MM-dd'T'HH:mm:ssXXX"
) -> dict[str, Column]:
    """Infer (lexical, datatype) literal columns from a TYPED DataFrame
    column — the NewLiteral inference table (rdf.go:342-359) mapped onto
    Spark types:

        boolean            → xsd:boolean
        byte/short/int/long → xsd:integer   (Go int/int32/int64)
        float/double       → xsd:double
        decimal            → xsd:decimal    (no Go analogue; SURVEY §1.2)
        string             → xsd:string
        timestamp/date     → xsd:dateTime   (lexical via ``date_format``,
                                             mirroring DateFormat rdf.go:52)
        binary             → xsd:byte       ([]byte, rdf.go:354-355)

    Returns the four object columns ``{o, o_kind, o_datatype, o_lang}``
    ready to splice into a canonical triple projection.  Unsupported
    Spark types raise ValueError (rdf.go:356-357).
    """
    from pyspark.sql import types as T

    dt = df.schema[colname].dataType
    c = F.col(colname)
    if isinstance(dt, T.BooleanType):
        lex, xsd = c.cast("string"), terms.XSD_BOOLEAN
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        lex, xsd = c.cast("string"), terms.XSD_INTEGER
    elif isinstance(dt, (T.FloatType, T.DoubleType)):
        lex, xsd = c.cast("string"), terms.XSD_DOUBLE
    elif isinstance(dt, T.DecimalType):
        lex, xsd = c.cast("string"), terms.XSD_DECIMAL
    elif isinstance(dt, T.StringType):
        lex, xsd = c, terms.XSD_STRING
    elif isinstance(dt, (T.TimestampType, T.DateType)):
        lex, xsd = F.date_format(c, date_format), terms.XSD_DATETIME
    elif isinstance(dt, T.BinaryType):
        lex, xsd = c.cast("string"), terms.XSD_BYTE
    else:
        raise ValueError(f"cannot infer XSD datatype from Spark type {dt.simpleString()}")
    return {
        "o": lex,
        "o_kind": F.lit(terms.KIND_LITERAL).cast("tinyint"),
        "o_datatype": F.lit(xsd),
        "o_lang": F.lit(None).cast("string"),
    }


def predicate_histogram(df: DataFrame) -> DataFrame:
    """Diagnostic: triples per predicate (no reference analogue — §2.5)."""
    return df.groupBy("p").agg(F.count(F.lit(1)).alias("n")).orderBy(F.desc("n"), F.asc("p"))


def namespace_histogram(df: DataFrame) -> DataFrame:
    """Distinct-namespace stats over all IRI positions (feeds prefix minting E6)."""
    prefixes = []
    for col, kind in (("s", "s_kind"), ("p", None), ("o", "o_kind")):
        c = df
        if kind is not None:
            c = c.filter(F.col(kind) == KIND_IRI)
        ns, _ = iri_split_cols(F.col(col))
        prefixes.append(c.select(ns.alias("ns")))
    allns = prefixes[0].unionAll(prefixes[1]).unionAll(prefixes[2])
    return (
        allns.filter(F.col("ns") != "")
        .groupBy("ns")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("ns"))
    )
