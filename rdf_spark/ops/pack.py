"""Deterministic sequence packing for LM training (graft addition — no
reference analogue): assign every document a (shard, seq_id, seq_offset)
slot in fixed-token-budget training sequences.

This is concat-then-chop packing (the GPT-style recipe): within a
shard, documents are concatenated in doc-id order and chopped into
``budget``-token sequences; a document may straddle a sequence boundary
(its ``seq_offset`` + ``n_tokens`` can exceed ``budget`` — the trainer
continues it in ``seq_id + 1``).  Boundary-respecting first-fit would
need an iterative pass; the chop variant is one window function and is
what large-scale pipelines actually run.

Scale shape (100 TB): the only wide operation is a running-sum window
PARTITIONED BY shard — each shard sorts independently, so parallelism
is ``n_shards`` and no global sort exists.  Sharding is ``doc_id mod
n_shards`` (dense ids spread evenly, and the assignment is replayable
by any engine); swap in a hash of the id when ids are clustered.
Everything is deterministic: same input → same packing, regardless of
partitioning — a training run can be resumed or re-materialized
byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf_spark.ops.text import token_count_col


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """→ (id_col, shard, n_tokens, seq_id, seq_offset): the slot of each
    document in its shard's chopped token stream.

    ``seq_id`` = which ``budget``-token sequence the document STARTS in;
    ``seq_offset`` = its first token's position within that sequence.
    Duplicate ids within a shard each get their OWN slot (ROWS frame),
    but which duplicate gets which slot is unspecified — the
    determinism guarantee assumes unique ids.
    """
    base = df.select(
        F.col(id_col),
        token_count_col(F.coalesce(F.col(text_col), F.lit(""))).alias(
            "n_tokens"
        ),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
    )
    # ROWS frame, not Spark's default RANGE frame: RANGE sums ALL
    # order-by ties together, so duplicate ids in one shard would diverge
    # from the oracle's ROWS semantics and overlap sequence slots
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix sum: tokens of all earlier docs in the shard
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return base.select(
        id_col,
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("seq_offset"),
    )
