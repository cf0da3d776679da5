"""spark-submit entry point for training-sequence packing
(rdf_spark.ops.pack) — assign every document its slot in fixed-token
training sequences:

    spark-submit --py-files /tmp/rdf_spark.zip jobs/pack_job.py \\
        --in <docs.parquet> --out <dir> \\
        [--budget 2048] [--n-shards 64] \\
        [--text-col text] [--key-col doc_id]

Writes the packing table (key, shard, n_tokens, seq_id, seq_offset) to
--out and prints one JSON line with the sequence counts.  The packing
is deterministic under any partitioning, so a resumed or re-run job
re-materializes the identical layout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--out", dest="out_path", required=True)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-col", default="doc_id")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("pack-sequences").getOrCreate()

    from rdf_spark.ops.pack import pack_sequences

    docs = spark.read.parquet(args.in_path)
    packed = pack_sequences(
        docs,
        text_col=args.text_col,
        id_col=args.key_col,
        budget=args.budget,
        n_shards=args.n_shards,
    )
    packed.write.mode("overwrite").parquet(args.out_path)
    packed = spark.read.parquet(args.out_path)
    agg = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.count_distinct("shard", "seq_id").alias("sequences"),
    ).collect()[0]
    print(json.dumps({
        "out": args.out_path, "budget": args.budget,
        "docs": agg.docs, "tokens": agg.tokens, "sequences": agg.sequences,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
