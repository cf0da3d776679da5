"""Composed corpus curation: the end-to-end "web crawl → training mix"
selection pipeline (graft addition — the reference, rdf.go:14-22, stops
at parsing; a 100 TB pipeline must also decide which documents to keep).

Stage order (fixed, documented — the audit column says exactly why each
document left):

1. ``lang``        — language not in the allow-list (ops.text.lang_id
                     or a trusted upstream column).
2. ``quality``     — composite quality score below threshold
                     (ops.text.quality_features).
3. ``repetition``  — Gopher-style within-doc repetition filter
                     (ops.text.repetition_features).
4. ``duplicate``   — exact content duplicate (normalized-text md5) of a
                     *surviving* earlier document; the smallest doc_id in
                     each duplicate class is kept.  Dedup runs among
                     stage-1..3 survivors so a filtered-out page can
                     never shadow a keepable one.
5. ``sampled_out`` — deterministic md5-threshold sample (ops.sample):
                     the reproducible training-mix knob.

Scale shape: stages 1-3 and 5 are row-local JVM expressions fused into
the scan (zero shuffle, zero Python).  Stage 4 is the pipeline's ONLY
shuffle — a partial-aggregated ``groupBy(fingerprint).min(doc_id)``
joined back on fingerprint.  min-per-key is chosen over a window
``row_number`` deliberately: the aggregate combines map-side, so a hot
fingerprint (a boilerplate page duplicated 10^6×) arrives at one reducer
as per-mapper partial minima, not 10^6 buffered rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_spark.ops import sample as smp
from rdf_spark.ops import text as txt


def curate_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    sample_rate: float = 1.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Audit view: every input row with ``drop_reason`` (null = kept).

    Deterministic on any cluster at any parallelism: every stage is a
    pure function of row content except dedup, whose keep-the-smallest-id
    rule is order-free.
    """
    feat = txt.repetition_features(txt.quality_features(df, text_col), text_col)
    feat = feat.withColumn("_fp", txt.fingerprint_col(F.coalesce(F.col(text_col), F.lit(""))))
    lang_ok = F.col(lang_col).isin(*langs)
    qual_ok = F.col("q_score") >= min_quality
    rep_ok = F.col("rep_keep")
    eligible = lang_ok & qual_ok & rep_ok
    feat = feat.withColumn("_eligible", eligible)

    reps = (
        feat.filter(F.col("_eligible"))
        .groupBy("_fp")
        .agg(F.min(key_col).alias("_rep_id"))
    )
    out = feat.join(reps, on="_fp", how="left")
    reason = (
        F.when(~lang_ok, "lang")
        .when(~qual_ok, "quality")
        .when(~rep_ok, "repetition")
        .when(F.col(key_col) != F.col("_rep_id"), "duplicate")
        .when(~smp.sample_predicate(F.col(key_col), sample_rate), "sampled_out")
        .otherwise(F.lit(None).cast("string"))
    )
    return out.withColumn("drop_reason", reason).drop("_fp", "_eligible", "_rep_id")


def curate_corpus(df: DataFrame, **kwargs) -> DataFrame:
    """The kept rows only (original columns + quality/repetition signals)."""
    return curate_report(df, **kwargs).filter(F.col("drop_reason").isNull()).drop(
        "drop_reason"
    )


def curate_stats(df: DataFrame, **kwargs) -> DataFrame:
    """Per-stage drop counters — the pipeline's audit aggregate."""
    return (
        curate_report(df, **kwargs)
        .groupBy(F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("stage"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
