"""Lexical retrieval scoring over document corpora (graft addition — the
reference, rdf.go:14-22, stops at parsing; a training-data platform also
needs to FIND documents: BM25 is the standard lexical ranking function,
and per-term corpus statistics are the building block for tf-idf
features, stopword discovery, and quality heuristics).

Scale shape: one narrow tokenize-explode, then only map-side-combinable
aggregations.  The per-query-term frequency table is filtered BEFORE its
shuffle (the term list is tiny), document-frequency and corpus stats are
single-row/handful-row aggregates joined back via broadcast, and the
final score is a doc-keyed sum — no skew exposure, no Python anywhere.

Reproducibility: every floating-point constant is computed once in
Python and re-used verbatim by the SQL oracle (engine literal parsing of
decimals differs at 1e-17); per-term scores are pre-rounded and summed
in exact DECIMAL so the doc score is independent of term order and
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize_lower(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, term) rows: lowercased whitespace tokens, empties dropped."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")


def term_corpus_stats(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-term corpus statistics: document frequency and total count —
    the tf-idf/vocabulary building block (one explode, one hash agg)."""
    toks = tokenize_lower(docs, text_col, id_col)
    return toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("df"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """BM25 scores for every document matching ≥1 query term →
    ``(id, bm25)``.

    Okapi BM25 with the +1 idf variant (always positive):
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``;
    ``score = Σ_t idf·tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))``.

    Per-term partial scores are rounded to 9 dp and summed as
    DECIMAL(24,9), so a document's score does not depend on the order
    its matching terms are aggregated in.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = tokenize_lower(docs, text_col, id_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    # constants computed HERE and reused by the oracle (bm25_constants)
    c = bm25_constants(k1, b)
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + F.lit(c["k1"]) * (
        F.lit(c["one_minus_b"]) + F.lit(c["b"]) * (F.col("dl") / avgdl)
    )
    ps = F.round(idf * F.col("tf") * F.lit(c["k1_plus_1"]) / denom, 9)
    return (
        scored.select(F.col(id_col), ps.cast("decimal(24,9)").alias("ps"))
        .groupBy(id_col)
        .agg(F.round(F.sum("ps").cast("double"), round_to).alias("bm25"))
    )


def bm25_constants(k1: float = 1.2, b: float = 0.75) -> dict[str, float]:
    """The exact doubles used in :func:`bm25_rank` — an oracle embeds
    ``repr()`` of these (string→double parsing round-trips exactly;
    engine-native decimal literals differ at 1e-17)."""
    return {"k1": k1, "b": b, "k1_plus_1": k1 + 1.0, "one_minus_b": 1.0 - b}


def unigram_lm_nll(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log-likelihood (nats/token) under the
    corpus's own add-α-smoothed unigram model → ``(id, lm_nll,
    n_tokens)``.

    The CCNet-style quality signal: documents whose token distribution is
    typical of the corpus score LOW (head), keyword-stuffed or junk pages
    score HIGH (tail) — threshold or bucket on ``lm_nll`` to filter.  A
    real KenLM would be a 5-gram model behind the same column contract;
    the unigram variant is self-contained, deterministic, and needs no
    model artifact.

    Two passes, both map-side-combinable: term counts (vocabulary-keyed)
    and per-doc term frequencies (doc-keyed); the corpus totals row is
    broadcast.  Per-term nll values are rounded to 12 dp, per-doc
    contributions (tf × nll) to 9 dp and summed as DECIMAL(28,9) — the
    doc score is independent of partitioning and aggregation order, so a
    SQL engine replaying the schedule matches exactly (α=0.5 is a power
    of two: exact in every engine's literal).
    """
    toks = tokenize_lower(docs, text_col, id_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    cstats = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    totals = cstats.agg(
        F.sum("ct").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )
    denom = F.col("t_total").cast("double") + F.lit(alpha) * F.col("v_size")
    nll = F.round(-F.log((F.col("ct") + F.lit(alpha)) / denom), 12)
    term_nll = cstats.crossJoin(F.broadcast(totals)).select(
        "term", nll.alias("nll")
    )
    contrib = tf.join(term_nll, "term").select(
        F.col(id_col),
        F.round(F.col("tf") * F.col("nll"), 9).cast("decimal(28,9)").alias("c"),
        F.col("tf"),
    )
    return contrib.groupBy(id_col).agg(
        F.round(F.sum("c").cast("double") / F.sum("tf"), round_to).alias("lm_nll"),
        F.sum("tf").alias("n_tokens"),
    )


def bigram_lm_nll(
    docs: DataFrame,
    lam: float = 0.75,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log-likelihood (nats/bigram position)
    under the corpus's own INTERPOLATED bigram model → ``(id, lm2_nll,
    n_bigrams)``; documents with fewer than 2 tokens are omitted.

    ``P(w|v) = λ·c(v,w)/c_left(v) + (1−λ)·(c(w)+α)/(T+αV)`` — the
    Jelinek-Mercer interpolation of the ML bigram with the
    add-α-smoothed unigram (the :func:`unigram_lm_nll` model), so the
    score sharpens the CCNet-style signal with local word ORDER:
    shuffled or keyword-stuffed text keeps a plausible unigram profile
    but improbable transitions.  λ=0.75 and α=0.5 are exact binary
    fractions (reproducible across engines).

    Scale shape: bigrams are built inside a JVM array expression
    (filter → zip_with of two slices — zero Python, zero extra
    shuffle), then everything is map-side-combinable aggregation: the
    (v,w)-type table is the only large shuffle and is corpus-vocabulary
    sized, not corpus sized.  Determinism: per-type nll rounded 12 dp,
    per-doc contributions (tf × nll) rounded 9 dp and summed as
    DECIMAL(28,9) — partitioning- and order-independent, SQL-replayable
    (the unigram_lm_nll convention; ln() 1-ulp differences are absorbed
    by the 12 dp round).
    """
    arr = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        lambda t: t != "",
    )
    toks_arr = docs.select(F.col(id_col), arr.alias("a")).filter(
        F.size("a") >= 2
    )
    big = toks_arr.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("a", F.lit(1), F.size("a") - 1),
                F.slice("a", F.lit(2), F.size("a") - 1),
                lambda x, y: F.struct(x.alias("v"), y.alias("w")),
            )
        ).alias("b"),
    ).select(id_col, "b.v", "b.w")

    tf = big.groupBy(id_col, "v", "w").agg(F.count(F.lit(1)).alias("tf"))
    # corpus type counts reduce the ALREADY-aggregated per-doc counts
    # instead of re-running the tokenize+zip_with explode a second time
    # (Σ_doc tf = corpus count, exactly)
    cvw = tf.groupBy("v", "w").agg(F.sum("tf").alias("cvw"))
    cleft = cvw.groupBy("v").agg(F.sum("cvw").alias("cl"))

    toks = tokenize_lower(docs, text_col, id_col)
    cstats = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    totals = cstats.agg(
        F.sum("ct").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )

    one_minus = 1.0 - lam  # computed once, shared verbatim with SQL
    denom = F.col("t_total").cast("double") + F.lit(alpha) * F.col("v_size")
    p = F.lit(lam) * (F.col("cvw").cast("double") / F.col("cl")) + F.lit(
        one_minus
    ) * ((F.col("ct") + F.lit(alpha)) / denom)
    types = (
        cvw.join(cleft, "v")
        .join(cstats.withColumnRenamed("term", "w"), "w")
        .crossJoin(F.broadcast(totals))
        .select("v", "w", F.round(-F.log(p), 12).alias("nll"))
    )
    contrib = tf.join(types, ["v", "w"]).select(
        F.col(id_col),
        F.round(F.col("tf") * F.col("nll"), 9).cast("decimal(28,9)").alias("c"),
        F.col("tf"),
    )
    return contrib.groupBy(id_col).agg(
        F.round(F.sum("c").cast("double") / F.sum("tf"), round_to).alias(
            "lm2_nll"
        ),
        F.sum("tf").alias("n_bigrams"),
    )
