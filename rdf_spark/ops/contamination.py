"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set (graft addition — no reference analogue; the
GPT-3/PaLM-style 13-gram collision check every training-data pipeline
runs before a model sees the corpus).

Everything is JVM column expressions — token split, n-gram assembly via
``transform(sequence(...), slice)``, explode, join — no Python in the
hot path.  Scale shape (100 TB corpus vs a small eval set): the eval
side's distinct n-grams are broadcast (eval sets are MBs by
construction), so the corpus side stays a narrow scan → explode →
broadcast-hash-join with NO corpus-wide shuffle; the only shuffle is the
per-document aggregation of the (tiny) matching rows.  Dedup of
overlapping grams happens AFTER the join, when volume has collapsed from
|corpus n-grams| to |hits|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngrams_col(text: Column, n: int) -> Column:
    """Array of space-joined n-token grams of ``text`` (whitespace
    tokens); empty array when the document has fewer than ``n`` tokens."""
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination report: how many DISTINCT ``n``-gram
    collisions each corpus document has with the eval set.

    Returns ``(id_col, n_overlap)`` for contaminated documents only
    (clean documents produce no row — at 10^12 documents the clean set
    is the overwhelming majority and materializing it is pure waste;
    anti-join this result against the corpus to drop contaminated docs).

    ``broadcast_eval=False`` falls back to a shuffle join for the rare
    eval set too big to broadcast.
    """
    etc = eval_text_col or text_col
    eval_grams = eval_set.select(
        F.explode(_ngrams_col(F.col(etc), n)).alias("_g")
    ).distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    doc_grams = corpus.select(
        F.col(id_col), F.explode(_ngrams_col(F.col(text_col), n)).alias("_g")
    )
    # join first, dedup after: hits are tiny compared to corpus n-grams
    hits = doc_grams.join(eval_grams, "_g").select(id_col, "_g").distinct()
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_overlap"))
