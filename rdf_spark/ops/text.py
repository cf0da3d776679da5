"""Text-analysis operators for training-data pipelines (graft additions —
no reference analogue; SURVEY.md §2.5 notes the gaps these fill).

Everything here is pure JVM column expressions (whole-stage codegen): at
100 TB these run inside the scan stage with zero Python and zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny, fixed stopword lists — a deterministic heuristic, not a model.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "was", "for", "on"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.split(F.trim(text), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens_col(text)))


def bpe_token_count_col(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-style regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def _stopword_hits(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_id_col(text: Column) -> Column:
    """n-gram/stopword language heuristic → 'en' | 'de' | 'und' (unknown).

    Deterministic and cheap; a real model would be a pandas UDF behind the
    same column contract.
    """
    en = _stopword_hits(text, EN_STOPWORDS)
    de = _stopword_hits(text, DE_STOPWORDS)
    return (
        F.when((en > de) & (en > 0), "en")
        .when((de > en) & (de > 0), "de")
        .otherwise("und")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals + a composite score.

    Score formula (fixed, documented so the DuckDB oracle can mirror it):
      0.4 * clamp(n_tokens/64)            # enough content
    + 0.3 * (1 - punct_ratio)             # not symbol soup
    + 0.3 * clamp(stopword_ratio * 8)     # natural-language-ish
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # null text scores like empty
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = _stopword_hits(t, EN_STOPWORDS)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    score = (
        0.4 * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(stop_ratio * 8.0, F.lit(1.0))
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (A content-defined rolling-hash variant lives in ops.dedup.simhash.)"""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: tokens, language guess, fingerprint, quality."""
    out = quality_features(df, text_col)
    t = F.coalesce(F.col(text_col), F.lit(""))
    return out.withColumn("lang_guess", lang_id_col(t)).withColumn(
        "fingerprint", fingerprint_col(t)
    )
