"""spark-submit entry point for RDF format conversion — the distributed
analogue of the reference's rdf2rdf companion CLI (cited in
/root/reference/rdf.go:38), over the full six-format matrix:

    spark-submit --py-files /tmp/rdf_spark.zip jobs/rdf_convert_job.py \\
        --in  <path> --in-format  turtle \\
        --out <path> --out-format nquads \\
        [--base <iri>] [--keep-blank-labels]

Decode: ntriples nquads turtle trig jsonld rdfxml; encode: all six.
Blank labels are skolemized by default (labels are only unique within
one input document); --keep-blank-labels preserves them for
single-document conversions, matching rdf2rdf.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    from rdf_spark.convert import DECODERS, ENCODERS

    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--in-format", required=True, choices=sorted(DECODERS))
    ap.add_argument("--out", dest="out_path", required=True)
    ap.add_argument("--out-format", required=True, choices=sorted(ENCODERS))
    ap.add_argument("--base", default="")
    ap.add_argument("--keep-blank-labels", action="store_true")
    ap.add_argument("--infer", choices=["rdfs", "owl", "rdfs+owl"],
                    help="materialize entailments between decode and "
                         "encode: rdfs = rho-df hierarchy closure, owl = "
                         "inverseOf/Symmetric/Transitive property algebra, "
                         "rdfs+owl = property algebra then hierarchy")
    ap.add_argument("--schema",
                    help="external ontology for --infer (defaults to the "
                         "input data itself)")
    ap.add_argument("--schema-format", default="turtle",
                    choices=sorted(DECODERS))
    ap.add_argument("--resolve-sameas", action="store_true",
                    help="rewrite owl:sameAs components to their canonical "
                         "representative before encoding")
    ap.add_argument("--keep-sameas-links", action="store_true",
                    help="with --resolve-sameas: keep (rep, sameAs, member) "
                         "provenance triples")
    ap.add_argument("--canonicalize-bnodes", action="store_true",
                    help="relabel blank nodes to RDFC-1.0 _:c14nN ids per "
                         "input document (implies --keep-blank-labels; for "
                         "single-document conversions)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("rdf-convert").getOrCreate()

    from rdf_spark import convert

    n = convert.convert(
        spark,
        args.in_path,
        args.in_format,
        args.out_path,
        args.out_format,
        base=args.base,
        skolemize=not (args.keep_blank_labels or args.canonicalize_bnodes),
        canonicalize=args.canonicalize_bnodes,
        infer=args.infer,
        schema_path=args.schema or "",
        schema_format=args.schema_format,
        resolve_sameas=args.resolve_sameas,
        keep_sameas_links=args.keep_sameas_links,
    )
    print(json.dumps({"triples": n, "out": args.out_path,
                      "format": args.out_format}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
