"""Sinks: triples → canonical text (SURVEY.md §2.2).

N-Triples / N-Quads serialization (E1/E2) is a pure column projection —
whole-stage-codegen JVM expressions, no Python in the hot path.

Encoders assume VALID terms (IRIs pass canonical.iri_valid_col) — run
validate_triples first; an IRI with, e.g., an embedded space cannot be
serialized in any RDF syntax.  The
Turtle encoder (E3/E5/E6: subject/predicate sort, ';'/',' list compression,
auto ``ns%d`` prefix minting) is a per-partition ``applyInPandas`` stage;
golden single-document output requires a single partition, which is how
the reference behaves anyway (one writer — encoder.go:128-216).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_spark import terms
from rdf_spark.chars import escape_literal
from rdf_spark.terms import KIND_IRI, KIND_LITERAL, XSD_STRING


def escape_literal_col(c: Column) -> Column:
    """Canonical N-Triples escaping (only \\n \\r \\\" \\\\ — rune.go:222-239)
    as a JVM-side expression chain."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return c


def term_nt_col(lex: Column, kind: Column, dt: Column = None, lang: Column = None) -> Column:
    """Serialize one term position to its canonical N-Triples form
    (Term.Serialize — rdf.go:202-204, 154-156, 260-284).

    Blank nodes print their stored ``_:label``; skolemized blanks (kind=0
    but an IRI lexical form, SURVEY.md §1.4) print as ``<iri>``.
    """
    esc = escape_literal_col(lex)
    if dt is None:
        dt = F.lit(None).cast("string")
    if lang is None:
        lang = F.lit(None).cast("string")
    literal_form = (
        F.when(lang.isNotNull() & (lang != ""), F.concat(F.lit('"'), esc, F.lit('"@'), lang))
        .when(
            dt.isNotNull() & (dt != XSD_STRING),
            F.concat(F.lit('"'), esc, F.lit('"^^<'), dt, F.lit(">")),
        )
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    )
    return (
        F.when(kind == KIND_IRI, F.concat(F.lit("<"), lex, F.lit(">")))
        .when(kind == KIND_LITERAL, literal_form)
        .otherwise(
            F.when(lex.startswith("_:"), lex).otherwise(F.concat(F.lit("<"), lex, F.lit(">")))
        )
    )


def nt_line_col(df_or_prefix=None) -> Column:
    """Column producing the canonical N-Triples line for the standard
    triple schema columns (without trailing newline)."""
    return F.concat_ws(
        " ",
        term_nt_col(F.col("s"), F.col("s_kind")),
        F.concat(F.lit("<"), F.col("p"), F.lit(">")),
        term_nt_col(F.col("o"), F.col("o_kind"), F.col("o_datatype"), F.col("o_lang")),
        F.lit("."),
    )


def nq_line_col() -> Column:
    """Canonical N-Quads line column (Quad.Serialize rdf.go:465-495)."""
    return F.concat_ws(
        " ",
        term_nt_col(F.col("s"), F.col("s_kind")),
        F.concat(F.lit("<"), F.col("p"), F.lit(">")),
        term_nt_col(F.col("o"), F.col("o_kind"), F.col("o_datatype"), F.col("o_lang")),
        term_nt_col(F.col("graph"), F.col("graph_kind")),
        F.lit("."),
    )


def write_ntriples(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize a triples DataFrame to N-Triples text files (E1)."""
    df.select(nt_line_col().alias("value")).write.mode(mode).text(path)


def write_nquads(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.select(nq_line_col().alias("value")).write.mode(mode).text(path)


# ---------------------------------------------------------------------------
# Turtle encoder (E3/E5/E6) — per-group stateful compression
# ---------------------------------------------------------------------------


def _escape_local(rest: str) -> str | None:
    """PN_LOCAL-escape a local name (E7, the reference's escapeLocal —
    encoder.go:305-325 — which it defines but never calls, emitting
    unparseable Turtle for reserved chars; we improve on that).  Returns
    None when the local cannot form a valid PN_LOCAL even with escaping
    (caller falls back to the full ``<iri>`` form)."""
    from rdf_spark import chars as _chars

    if rest == "":
        return ""
    out = []
    n = len(rest)
    for i, ch in enumerate(rest):
        # prefer the raw char when it's already valid at this position
        # (keeps golden-byte parity with the reference for benign names);
        # '%' raw needs %HH and '\' raw starts an escape — never emit raw
        raw_ok = ch not in "%\\" and bool(
            _chars.PN_LOCAL_FIRST_RE.match(ch)
            if i == 0
            else _chars.PN_LOCAL_MID_RE.match(ch)
        )
        if ch == "." and (i == 0 or i == n - 1):
            raw_ok = False  # leading/trailing dot is not PN_LOCAL
        if raw_ok:
            out.append(ch)
        elif ch in _chars.PN_LOCAL_ESC:
            out.append("\\" + ch)
        else:
            return None
    return "".join(out)


def _py_term_turtle(lex, kind, dt, lang, ns, ns_count, generate, custom):
    """Turtle form of one term with prefix compression (prefixify,
    encoder.go:235-303).  ns_count is a 1-element list: the generated-name
    counter only advances for ns%d prefixes, not custom ones
    (encoder.go:256-257).  Returns (text, directive_or_None)."""
    directive = None
    if kind == terms.KIND_IRI:
        if lex == terms.RDF_TYPE:
            return "a", None
        first, rest = terms.iri_split(lex)
        if first == "":
            return "<%s>" % lex, None
        rest = _escape_local(rest)
        if rest is None:
            return "<%s>" % lex, None
        prefix = ns.get(first)
        if prefix is None:
            prefix = custom.get(first)
            if prefix is None:
                if not generate:
                    return "<%s>" % lex, None
                prefix = "ns%d" % ns_count[0]
                ns_count[0] += 1
            ns[first] = prefix
            directive = "@prefix %s:\t<%s> .\n" % (prefix, first)
        return "%s:%s" % (prefix, rest), directive
    if kind == terms.KIND_BLANK:
        return (lex if lex.startswith("_:") else "<%s>" % lex), None
    # literal (Literal.Serialize Turtle shortcuts, rdf.go:271-278)
    if lang:
        return '"%s"@%s' % (escape_literal(lex), lang), None
    if dt and dt != terms.XSD_STRING:
        if dt in (terms.XSD_INTEGER, terms.XSD_DECIMAL, terms.XSD_BOOLEAN, terms.XSD_DOUBLE):
            return lex, None
        first, rest = terms.iri_split(dt)
        if first == "":
            return '"%s"^^<%s>' % (escape_literal(lex), dt), None
        rest = _escape_local(rest)
        if rest is None:
            return '"%s"^^<%s>' % (escape_literal(lex), dt), None
        prefix = ns.get(first)
        if prefix is None:
            prefix = custom.get(first)
            if prefix is None:
                if not generate:
                    return '"%s"^^<%s>' % (escape_literal(lex), dt), None
                prefix = "ns%d" % ns_count[0]
                ns_count[0] += 1
            ns[first] = prefix
            directive = "@prefix %s:\t<%s> .\n" % (prefix, first)
        if dt == terms.XSD_DATETIME:
            return '"%s"^^%s:%s' % (lex, prefix, rest), directive
        return '"%s"^^%s:%s' % (escape_literal(lex), prefix, rest), directive
    return '"%s"' % escape_literal(lex), None


def encode_turtle_pdf(pdf: pd.DataFrame, namespaces: dict | None = None,
                      generate_namespaces: bool = True,
                      _declared: dict | None = None) -> str:
    """Encode a pandas batch of triples into one Turtle document.

    Mirrors TripleEncoder.EncodeAll (encoder.go:128-216): sort by
    (subject, predicate) serialized form, compress into ';' predicate
    lists and ',' object lists, skip adjacent duplicates, emit @prefix
    directives lazily (closing any open statement first).  ``_declared``
    pre-seeds namespaces whose directives were already emitted by the
    caller (the TriG encoder hoists them above the graph blocks, where
    directives are illegal).
    """
    custom = dict(namespaces or {})
    rows = list(
        pdf[["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]].itertuples(index=False)
    )
    rows.sort(key=lambda r: (terms.term_nt(r[0], r[1]), "<%s>" % r[2]))

    ns: dict[str, str] = dict(_declared or {})
    ns_count = [0]
    out: list[str] = []
    cur_s = cur_p = None
    open_stmt = False
    prev = None

    def render(lex, kind, dt=None, lang=None):
        nonlocal open_stmt
        text, directive = _py_term_turtle(lex, kind, dt, lang, ns, ns_count,
                                          generate_namespaces, custom)
        if directive is not None:
            if open_stmt:
                out.append(" .\n")
                open_stmt = False
            out.append(directive)
        return text

    for r in rows:
        s, s_kind, p, o, o_kind, o_dt, o_lang = r
        o_txt = render(o, o_kind, o_dt, o_lang)
        if open_stmt and (s, s_kind) == cur_s:
            if (p,) == cur_p:
                if prev is not None and (o, o_kind, o_dt, o_lang) == prev:
                    continue  # adjacent duplicate (encoder.go:158-161)
                s_txt, p_txt = " ,\n\t", ""
            else:
                p_txt = render(p, terms.KIND_IRI)
                if open_stmt:
                    s_txt = " ;\n"
                else:
                    s_txt = render(s, s_kind)
                cur_p = (p,)
        else:
            if open_stmt:
                out.append(" .\n")
                open_stmt = False
            p_txt = render(p, terms.KIND_IRI)
            s_txt = render(s, s_kind)
            cur_s, cur_p = (s, s_kind), (p,)
        open_stmt = True
        prev = (o, o_kind, o_dt, o_lang)
        out.append(s_txt)
        out.append("\t")
        out.append(p_txt)
        out.append("\t")
        out.append(o_txt)

    if open_stmt:
        out.append(" .")
    return "".join(out)


def encode_trig_pdf(pdf: pd.DataFrame, namespaces: dict | None = None) -> str:
    """Encode a pandas batch of QUADS into one TriG document (EXCEEDS
    reference parity — the reference has no TriG encoder, rdf.go:14-22).

    Default-graph quads (null graph or ``_:defaultGraph``) render as
    top-level Turtle statements; each named graph becomes a
    ``label { … }`` block, blocks sorted by serialized label.  ``@prefix``
    directives are legal only at document level in TriG, so they are
    emitted up front for the namespaces the caller passes (ns-IRI →
    prefix) and NOT auto-minted inside blocks.
    """
    custom = dict(namespaces or {})
    out: list[str] = []
    for ns_iri, prefix in custom.items():
        out.append("@prefix %s:\t<%s> .\n" % (prefix, ns_iri))

    tcols = ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]
    if "graph" in pdf.columns:
        g = pdf["graph"]
        default_mask = g.isna() | (g == terms.DEFAULT_GRAPH)
    else:
        default_mask = pd.Series(True, index=pdf.index)

    def enc(sub: pd.DataFrame) -> str:
        return encode_turtle_pdf(sub[tcols], namespaces=custom,
                                 generate_namespaces=False, _declared=custom)

    default = pdf[default_mask]
    if len(default):
        out.append(enc(default))
        out.append("\n")
    named = pdf[~default_mask]
    if len(named):
        labels = sorted(
            {(r.graph, int(r.graph_kind)) for r in
             named[["graph", "graph_kind"]].itertuples(index=False)},
            key=lambda t: terms.term_nt(t[0], t[1]),
        )
        for lex, kind in labels:
            # filter on BOTH columns: the same lexical can name an IRI
            # graph and a blank graph; matching on lexical alone would
            # emit those quads twice, once under each label
            block = named[(named["graph"] == lex) & (named["graph_kind"] == kind)]
            label = "<%s>" % lex if kind == terms.KIND_IRI else lex
            out.append("%s {\n%s\n}\n" % (label, enc(block)))
    return "".join(out)


def write_trig(df: DataFrame, path: str, namespaces: dict | None = None) -> None:
    """Write a (small) quads DataFrame as a single TriG document
    (executor-side encode, one writer — same contract as write_turtle)."""
    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it]
        pdf = pd.concat(parts) if parts else pd.DataFrame(columns=terms.QUAD_COLS)
        yield pd.DataFrame({"value": [encode_trig_pdf(pdf, namespaces)]})

    df.coalesce(1).mapInPandas(enc, "value string").write.mode("overwrite").text(path)


def write_jsonld(df: DataFrame, path: str, indent: int | None = None) -> None:
    """Write a (small) triples/quads DataFrame as one expanded-form
    JSON-LD document (executor-side encode, one writer)."""
    from rdf_spark.jsonld import encode_jsonld

    cols = terms.QUAD_COLS if "graph" in df.columns else terms.TRIPLE_COLS

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it]
        pdf = pd.concat(parts) if parts else pd.DataFrame(columns=cols)
        rows = list(pdf[cols].itertuples(index=False))
        yield pd.DataFrame({"value": [encode_jsonld(rows, indent=indent)]})

    df.coalesce(1).mapInPandas(enc, "value string").write.mode("overwrite").text(path)


def write_rdfxml(df: DataFrame, path: str, namespaces: dict | None = None) -> None:
    """Write a (small) triples DataFrame as one RDF/XML document
    (executor-side encode, one writer — same contract as write_turtle)."""
    from rdf_spark.rdfxml import encode_rdfxml_pdf

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it]
        pdf = pd.concat(parts) if parts else pd.DataFrame(columns=terms.TRIPLE_COLS)
        yield pd.DataFrame({"value": [encode_rdfxml_pdf(pdf, namespaces)]})

    df.coalesce(1).mapInPandas(enc, "value string").write.mode("overwrite").text(path)


def encode_turtle_df(df: DataFrame, namespaces: dict | None = None) -> DataFrame:
    """Encode a triples DataFrame into ONE Turtle document, executor-side.

    Returns a one-row DataFrame (``value string``).  The encode runs in a
    ``mapInPandas`` stage on the executors — no driver-side collect — and
    ``coalesce(1)`` is inherent to the output contract (a single document
    must be written by a single writer, SURVEY.md §3.3).  For large
    graphs, group by subject bucket and call :func:`encode_turtle_pdf`
    per group instead.
    """
    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it]
        pdf = pd.concat(parts) if parts else pd.DataFrame(columns=terms.TRIPLE_COLS)
        yield pd.DataFrame({"value": [encode_turtle_pdf(pdf, namespaces)]})

    return df.coalesce(1).mapInPandas(enc, "value string")


def write_turtle(df: DataFrame, path: str, namespaces: dict | None = None) -> None:
    """Write a (small) triples DataFrame as a single Turtle document.

    Golden-file-equal output needs one writer (SURVEY.md §3.3); at scale
    prefer :func:`write_ntriples` or :func:`encode_turtle_partitioned`.
    """
    encode_turtle_df(df, namespaces).write.mode("overwrite").text(path)


def encode_turtle_partitioned(
    df: DataFrame,
    n_buckets: int = 16,
    namespaces: dict | None = None,
    generate_namespaces: bool = True,
) -> DataFrame:
    """Scale-out Turtle encode: subject-hash-bucketed shards, each a
    complete canonical Turtle document → ``(bucket int, value string)``.

    Why concatenating the shards (any order) is ONE valid Turtle document
    that re-parses to the identical triple set:

    - bucketing is on ``(s, s_kind)``, so every subject's triples are
      co-located — the ``;``/``,`` predicate/object compression each
      shard applies is exactly the single-stream encoder's for that
      subject, and no statement straddles a shard boundary;
    - each shard mints its own ``ns%d`` prefixes; ``@prefix``
      redeclaration mid-document is legal Turtle and REBINDS, and every
      shard's statements follow its own directives, so pname expansion
      is shard-locally correct regardless of concatenation order;
    - blank-node labels are the stored corpus-global lexicals
      (skolemized or parser-assigned; never re-minted at encode time,
      rdf.go:271-273 parity), so the same label in two shards denotes
      the same node — merging on re-parse is correct, and distinct nodes
      never collide.

    The single-stream golden (encode_turtle_df) stays byte-canonical;
    this output is canonical PER SHARD (same sort, same compression) but
    shard concatenation order is bucket order, not global subject order —
    the contract is set-equal re-parse, property-tested in
    tests/test_turtle_roundtrip_property.py.
    """
    bucketed = df.withColumn(
        "_bkt",
        F.pmod(F.xxhash64(F.col("s"), F.col("s_kind")), F.lit(n_buckets)).cast("int"),
    )

    def enc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": [int(key[0])],
            "value": [encode_turtle_pdf(pdf, namespaces, generate_namespaces)],
        })

    return bucketed.groupBy("_bkt").applyInPandas(enc, "bucket int, value string")


def write_turtle_partitioned(
    df: DataFrame,
    path: str,
    n_buckets: int = 16,
    namespaces: dict | None = None,
) -> None:
    """Write a large triples DataFrame as ``n_buckets`` Turtle shard
    documents (one text row per shard; files concatenate into one valid
    document — see :func:`encode_turtle_partitioned`)."""
    (
        encode_turtle_partitioned(df, n_buckets, namespaces)
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )
