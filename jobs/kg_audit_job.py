"""spark-submit entry point for KG publish auditing — the gate between
a materialized triple store and its consumers:

    spark-submit --py-files /tmp/rdf_spark.zip jobs/kg_audit_job.py \\
        --triples <parquet dir of canonical triples> \\
        --out <dir> \\
        [--void]                  # VoID summary + property/class partitions
        [--shapes shapes.json|shapes.ttl]  # SHACL shapes: ops.shacl
                                  # JSON spec, or a real Turtle shapes
                                  # graph (sniffed; .ttl/.turtle forced)
        [--lists]                 # rdf:List well-formedness audit
        [--fail-on-violation]     # exit 1 when the report is non-empty

Outputs under --out: ``void_summary/``, ``property_partition/``,
``class_partition/`` (with --void), ``shacl_report/`` (with --shapes)
and ``rdf_lists/`` (with --lists; dropped-head count in the summary).
Prints one JSON line with the audit counts — the numbers a publish
pipeline logs and alerts on.  Rows with a non-null ``err`` column are
excluded from all audits (they never made it into the graph).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_shapes(path: str):
    """JSON spec or Turtle shapes graph → ops.shacl spec list."""
    with open(path) as fh:
        text = fh.read()
    if not path.endswith((".ttl", ".turtle")):
        try:
            return json.loads(text)
        except json.JSONDecodeError:
            pass  # fall through to Turtle
    from rdf_spark.shacl import parse_shapes

    return parse_shapes(text)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--void", action="store_true")
    ap.add_argument("--shapes",
                    help="SHACL shapes: JSON spec or Turtle shapes graph")
    ap.add_argument("--lists", action="store_true",
                    help="materialize well-formed rdf:Lists + drop audit")
    ap.add_argument("--report-graph", action="store_true",
                    help="also write the report as sh:ValidationReport "
                         "triples (canonical store schema + N-Triples)")
    ap.add_argument("--fail-on-violation", action="store_true")
    args = ap.parse_args(argv)
    if not args.void and not args.shapes and not args.lists:
        ap.error("nothing to do: pass --void, --shapes and/or --lists")

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("kg-audit").getOrCreate()
    triples = spark.read.parquet(args.triples)
    if "err" in triples.columns:
        triples = triples.filter(F.col("err").isNull())

    summary: dict = {"out": args.out}

    if args.void:
        from rdf_spark.ops.voidstats import (
            class_partition,
            property_partition,
            void_summary,
        )

        vs = void_summary(triples)
        vs.write.mode("overwrite").parquet(args.out + "/void_summary")
        property_partition(triples).write.mode("overwrite").parquet(
            args.out + "/property_partition"
        )
        class_partition(triples).write.mode("overwrite").parquet(
            args.out + "/class_partition"
        )
        row = spark.read.parquet(args.out + "/void_summary").collect()[0]
        summary["void"] = row.asDict()

    if args.lists:
        from rdf_spark.ops.rdflist import rdf_lists

        rdf_lists(triples).write.mode("overwrite").parquet(
            args.out + "/rdf_lists"
        )
        stats = rdf_lists(triples, stats=True).collect()[0]
        summary["lists"] = stats.asDict()

    n_violations = 0
    if args.shapes:
        from rdf_spark.ops.shacl import validate

        shapes = _load_shapes(args.shapes)
        report = validate(triples, shapes)
        report.write.mode("overwrite").parquet(args.out + "/shacl_report")
        if args.report_graph:
            from rdf_spark.encoders import write_ntriples
            from rdf_spark.ops.shacl import report_graph

            g = report_graph(
                spark.read.parquet(args.out + "/shacl_report"))
            g.write.mode("overwrite").parquet(
                args.out + "/shacl_report_graph")
            write_ntriples(g, args.out + "/shacl_report_nt")
        by = (
            spark.read.parquet(args.out + "/shacl_report")
            .groupBy("constraint")
            .count()
            .collect()
        )
        summary["violations_by_constraint"] = {
            r["constraint"]: r["count"] for r in by
        }
        n_violations = sum(r["count"] for r in by)
        summary["violations"] = n_violations
        summary["conforms"] = n_violations == 0

    print(json.dumps(summary))
    return 1 if (args.fail_on_violation and n_violations) else 0


if __name__ == "__main__":
    sys.exit(main())
