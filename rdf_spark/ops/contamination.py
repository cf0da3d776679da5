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


def embedding_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    eval_vec_col: str | None = None,
    max_eval: int = 2_000_000,
    keep_contaminated: bool = False,
) -> DataFrame:
    """Semantic decontamination: drop corpus rows whose embedding has
    cosine similarity >= ``threshold`` with ANY eval-set embedding —
    the vector-space sibling of :func:`ngram_contamination`, catching
    paraphrased/reformatted benchmark leakage that exact n-grams miss.

    Scale shape (100 TB corpus vs a small eval set, same asymmetry as
    the n-gram path): the eval matrix is collected once, L2-normalized,
    and shipped via ``sc.broadcast``; each Arrow batch then does ONE
    numpy matmul (batch × evalᵀ) — the corpus side is a narrow
    mapInPandas scan with no shuffle at all.  ``max_eval`` guards the
    driver collect (a 2M × 768-float32 eval matrix is ~6 GB — beyond
    that, decontaminate per eval shard and union the drop sets).
    With ``keep_contaminated=True`` rows are kept and flagged
    ``contaminated`` instead of dropped (audit mode).
    """
    import numpy as np

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    evc = eval_vec_col or vec_col
    n_eval = eval_set.count()
    if n_eval > max_eval:
        raise ValueError(
            f"eval set has {n_eval} rows > max_eval={max_eval}; "
            "decontaminate per eval shard and union the drop sets"
        )
    rows = eval_set.select(evc).collect()
    em = np.asarray([r[0] for r in rows], dtype=np.float32)
    norms = np.linalg.norm(em, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    em = em / norms
    bc = corpus.sparkSession.sparkContext.broadcast(em.T.copy())

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = corpus.schema
    if keep_contaminated:
        # build an independent StructType: .add() mutates in place and
        # would corrupt the input DataFrame's cached schema
        schema = StructType(
            list(schema.fields) + [StructField("contaminated", BooleanType())]
        )
    cols = [f.name for f in corpus.schema.fields]

    def run(batches):
        et = bc.value  # (dim, n_eval), unit columns
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf if not keep_contaminated else pdf.assign(
                    contaminated=np.array([], dtype=bool))
                continue
            m = np.asarray(list(pdf[vec_col]), dtype=np.float32)
            mn = np.linalg.norm(m, axis=1, keepdims=True)
            mn[mn == 0.0] = 1.0
            best = ((m / mn) @ et).max(axis=1)
            hit = best >= threshold
            out = pdf[cols]
            if keep_contaminated:
                out = out.assign(contaminated=hit)
                yield out
            else:
                yield out[~hit]

    return corpus.mapInPandas(run, schema=schema)
