"""spark-submit entry point for corpus curation — the training-data
selection pipeline (rdf_spark.curate) as a batch job:

    spark-submit --py-files /tmp/rdf_spark.zip jobs/curate_job.py \\
        --in <docs.parquet> --out <dir> \\
        [--langs en,de] [--min-quality 0.5] [--sample-rate 1.0] \\
        [--text-col text] [--lang-col lang] [--key-col doc_id] \\
        [--strip-boilerplate N]   # stage 0: drop lines in >=N docs
        [--scrub-pii]             # redact emails/IPs/phones pre-flags
        [--span-dedup-ngram N]    # remove >=N-token spans seen elsewhere
        [--near-dup-threshold J]  # MinHash near-dup stage at jaccard>=J

Writes three outputs under --out:
  kept/    the curated corpus (original + quality/repetition signals)
  report/  every input row with its drop_reason (null = kept) — the audit
  stats/   per-stage drop counters

Prints one JSON line with the per-stage counts.  All selection logic is
deterministic (see curate.curate_report), so re-running over the same
input on any cluster reproduces the identical corpus.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--out", dest="out_path", required=True)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--c4", nargs="?", const="5:3", default=None,
                    metavar="MINWORDS:MINLINES",
                    help="first stage: C4 line/page rules (default "
                         "5:3 = >=5 words + terminal punct per line, "
                         ">=3 surviving lines per page)")
    ap.add_argument("--strip-boilerplate", type=int, default=None)
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--span-dedup-ngram", type=int, default=None)
    ap.add_argument("--near-dup-threshold", type=float, default=None)
    ap.add_argument("--host-cap", default=None, metavar="COL:N",
                    help="final per-host quota: keep at most N rows per "
                    "distinct COL value (drop_reason=host_capped)")
    ap.add_argument("--clf-weights", default=None, metavar="JSON_FILE",
                    help="model-based quality gate: JSON file with a "
                         "weight list (hashed linear classifier, "
                         "ops.text.hashed_classifier_score)")
    ap.add_argument("--clf-min-score", type=float, default=0.5,
                    help="with --clf-weights: drop docs scoring below "
                         "this (drop_reason=classifier)")
    ap.add_argument("--clf-bias", type=float, default=0.0)
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="DSIR importance gate: parquet of target-domain "
                         "documents (same text/key columns); rows whose "
                         "hashed-n-gram log importance weight falls "
                         "below --dsir-min-logw drop (drop_reason=dsir)")
    ap.add_argument("--dsir-min-logw", type=float, default=0.0,
                    help="with --dsir-target: keep docs with "
                         "dsir_logw >= this (default 0.0)")
    ap.add_argument("--dsir-ngram", type=int, default=2)
    ap.add_argument("--dsir-buckets", type=int, default=8192)
    ap.add_argument("--repeat", default=None,
                    metavar="COL:K=R[,K=R...][:DEFAULT]",
                    help="write repeated/ (training-mix upsampling of "
                         "kept/): per-stratum fractional epoch rates, "
                         "e.g. lang:en=2.5,de=1.0:0.3 "
                         "(ops.sample.weighted_repeat)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("corpus-curate").getOrCreate()

    from rdf_spark import curate

    kwargs = dict(
        text_col=args.text_col,
        lang_col=args.lang_col,
        langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        sample_rate=args.sample_rate,
        key_col=args.key_col,
        strip_boilerplate=args.strip_boilerplate,
        scrub_pii=args.scrub_pii,
        c4=(
            dict(zip(("min_words_per_line", "min_lines"),
                     (int(x) for x in args.c4.split(":"))))
            if args.c4 is not None else None
        ),
        span_dedup_ngram=args.span_dedup_ngram,
        near_dup=(
            dict(threshold=args.near_dup_threshold)
            if args.near_dup_threshold is not None else None
        ),
    )
    if args.clf_weights is not None:
        with open(args.clf_weights) as fh:
            weights = json.load(fh)
        if not isinstance(weights, list) or not weights:
            ap.error("--clf-weights file must hold a non-empty JSON list")
        kwargs["classifier"] = dict(
            weights=[float(w) for w in weights],
            min_score=args.clf_min_score,
            bias=args.clf_bias,
        )
    if args.dsir_target is not None:
        kwargs["dsir"] = dict(
            target=spark.read.parquet(args.dsir_target),
            min_logw=args.dsir_min_logw,
            n=args.dsir_ngram,
            n_buckets=args.dsir_buckets,
        )
    if args.host_cap is not None:
        col, _, n = args.host_cap.rpartition(":")
        if not col or not n.isdigit():
            ap.error("--host-cap expects COL:N (e.g. source:1000)")
        kwargs["host_cap"] = (col, int(n))
    docs = spark.read.parquet(args.in_path)
    report = curate.curate_report(docs, **kwargs)
    # one computation, two consumers: persist the report, derive the rest
    report.write.mode("overwrite").parquet(f"{args.out_path}/report")
    report = spark.read.parquet(f"{args.out_path}/report")
    report.filter(F.col("drop_reason").isNull()).drop("drop_reason").write.mode(
        "overwrite"
    ).parquet(f"{args.out_path}/kept")
    stats_df = report.groupBy(
        F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("stage")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    stats_df.write.mode("overwrite").parquet(f"{args.out_path}/stats")
    stats = {r.stage: r.n_docs for r in stats_df.collect()}
    result = {"out": args.out_path, "stages": stats}
    if args.repeat is not None:
        from rdf_spark.ops.sample import weighted_repeat

        try:
            head, _, default_s = args.repeat.rpartition(":")
            if "=" in default_s:  # no default given
                head, default_s = args.repeat, "1.0"
            col, _, pairs = head.partition(":")
            rates = {}
            for kv in pairs.split(","):
                k, _, r = kv.partition("=")
                rates[k] = float(r)
            default_rate = float(default_s)
        except ValueError:
            ap.error("--repeat expects COL:K=R[,K=R...][:DEFAULT]")
        kept = spark.read.parquet(f"{args.out_path}/kept")
        rep = weighted_repeat(kept, rates, strata_col=col,
                              key_col=args.key_col,
                              default_rate=default_rate)
        rep.write.mode("overwrite").parquet(f"{args.out_path}/repeated")
        result["repeated"] = spark.read.parquet(
            f"{args.out_path}/repeated").count()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
