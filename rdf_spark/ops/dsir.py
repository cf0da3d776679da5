"""DSIR-style importance weighting for training-data selection.

Graft addition — no reference analogue.  Implements the hashed n-gram
importance-resampling scheme of Xie et al., "Data Selection for
Language Models via Importance Resampling" (NeurIPS 2023): estimate
bag-of-hashed-n-gram distributions for a small TARGET corpus (the
domain you want more of) and the RAW corpus, score every raw document
by its log importance weight sum_g log(p_target(b(g)) / p_raw(b(g))),
and resample via the Gumbel-top-k trick.  This is the standard
"make web data look like Wikipedia/books" selection step of modern
pretraining pipelines.

Spark shape (100 TB raw corpus, MB..GB target):

- Both distribution estimates are one scan → explode(n-grams) →
  bucket-hash → partial+final HashAggregate over ``n_buckets`` keys
  (bounded state, no skew — buckets are md5-uniform).
- The learned weight table is ``n_buckets`` rows (10^4), joined
  broadcast against the per-(doc, bucket) counts; the raw corpus is
  shuffled only by the per-doc aggregation of ALREADY-reduced
  (doc, bucket) rows — never raw grams.
- Selection is a rounded-key TakeOrdered top-k (no full sort
  materialization).

Reproducible-numerics contract (the repo's standard): per-bucket log
ratios are rounded to 9 dp (ln() is the ONLY non-IEEE-exact op here
and may differ 1 ulp between engines — 9 dp is the lm_score
precedent; +,−,×,÷ are correctly-rounded IEEE and bit-identical), the
per-(doc, bucket) contribution count × weight is an IEEE product
rounded to 9 dp and summed as exact DECIMAL(38,9) — token order and
partitioning cannot change the sum (the retrieval.py tf×nll
pattern; a decimal×integral product would hit Spark's precision-loss
scale truncation instead).  The bucket hash is the md5 15-hex-digit prefix
(DuckDB-parseable, audit-replayable) — same convention as
``ops.text.hashed_classifier_score``.  The Gumbel noise for selection
is md5-derived (deterministic, replayable), NOT rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_spark.ops.contamination import _ngrams_col

GUMBEL_SALT = ":dsir"
_HEX13 = 16 ** 13  # md5 13-hex-digit prefix range (fits double exactly)


def _bucket(gram: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")
        % n_buckets
    )


def _doc_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, n: int, n_buckets: int
) -> DataFrame:
    grams = df.select(
        F.col(id_col),
        F.explode(_ngrams_col(F.col(text_col), n)).alias("_gram"),
    )
    return (
        grams.select(id_col, _bucket(F.col("_gram"), n_buckets).alias("_b"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 8192,
    alpha: float = 0.01,
) -> DataFrame:
    """Per-document log importance weight under hashed ``n``-gram
    bag models: (id, dsir_logw, n_grams).

    ``dsir_logw = round(Σ_b round(cnt_{d,b} · round(log pt(b) −
    log pr(b), 9), 9), 6)`` with add-``alpha`` smoothing on both
    sides; documents with no n-grams score 0.0 with ``n_grams = 0``.
    """
    from rdf_spark.ops.planutil import materialize_for_fanout

    # each (doc, bucket) table feeds 2-3 consumers (corpus totals, gram
    # totals, scoring); without materialization every consumer re-runs
    # the gram explode + md5 map stage — Catalyst's exchange reuse does
    # NOT fire across these AQE-compiled branches (observed: the raw
    # explode stage executed twice per run).  The reduced table is ~50x
    # smaller than the gram stream, so one checkpoint beats re-scanning.
    raw_db = materialize_for_fanout(
        _doc_bucket_counts(raw, text_col, id_col, n, n_buckets))
    tgt_db = materialize_for_fanout(
        _doc_bucket_counts(target, text_col, id_col, n, n_buckets))
    # corpus-level bucket counts reuse the per-doc reduction (map-side
    # combined twice rather than re-scanning text)
    raw_b = raw_db.groupBy("_b").agg(
        F.sum("_cnt").cast("double").alias("_cr"))
    tgt_b = tgt_db.groupBy("_b").agg(
        F.sum("_cnt").cast("double").alias("_ct"))
    nr = raw_db.agg(F.sum("_cnt").cast("double").alias("_NR"))
    nt = tgt_db.agg(F.sum("_cnt").cast("double").alias("_NT"))
    # full outer on the bucket tables (both ≤ n_buckets rows); a bucket
    # absent on one side takes that side's smoothing floor (count 0)
    w = (
        tgt_b.join(raw_b, "_b", "full_outer")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "_b",
            F.round(
                F.log((F.coalesce(F.col("_ct"), F.lit(0.0)) + F.lit(alpha))
                      / (F.col("_NT") + F.lit(alpha * n_buckets)))
                - F.log((F.coalesce(F.col("_cr"), F.lit(0.0)) + F.lit(alpha))
                        / (F.col("_NR") + F.lit(alpha * n_buckets))),
                9,
            ).alias("_w"),
        )
    )
    scored = (
        raw_db.join(F.broadcast(w), "_b")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.round(F.col("_cnt") * F.col("_w"), 9)
                .cast("decimal(38,9)")
            ).alias("_s"),
            F.sum("_cnt").cast("long").alias("n_grams"),
        )
        .select(
            id_col,
            F.round(F.col("_s").cast("double"), 6).alias("dsir_logw"),
            "n_grams",
        )
    )
    ids = raw.select(id_col).distinct()
    return ids.join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("dsir_logw"), F.lit(0.0)).alias("dsir_logw"),
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
    )


def gumbel_key_col(id_col: str = "doc_id") -> Column:
    """Deterministic Gumbel(0,1) noise from the id's salted md5 — the
    replayable stand-in for rand() in Gumbel-top-k resampling."""
    u = (
        (F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                       F.lit(GUMBEL_SALT))), 1, 13),
            16, 10,
        ).cast("double") + F.lit(1.0))
        / F.lit(float(_HEX13 + 1))
    )
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 8192,
    alpha: float = 0.01,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the ``k`` documents
    with the largest ``dsir_logw / temperature + Gumbel`` key —
    equivalent to sampling without replacement with probability
    ∝ exp(logw/T) (Gumbel-max trick), but fully deterministic.  The
    key is rounded to 6 dp and tie-broken by id, so the selected SET
    is engine- and partitioning-exact."""
    if k <= 0:
        raise ValueError("k must be positive")
    scored = dsir_weights(raw, target, text_col, id_col, n, n_buckets, alpha)
    keyed = scored.select(
        id_col, "dsir_logw",
        F.round(
            F.col("dsir_logw") / F.lit(float(temperature))
            + gumbel_key_col(id_col),
            6,
        ).alias("select_key"),
    )
    return (
        keyed.orderBy(F.col("select_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
