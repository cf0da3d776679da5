"""spark-submit entry point for the KG construction pipeline.

Cluster usage (north_rule: spark-submit --py-files at 10^12-doc scale —
one submit per shard-batch, orchestrated externally; resume is free via
the shard manifests):

    cd <repo> && zip -r /tmp/rdf_spark.zip rdf_spark
    spark-submit --py-files /tmp/rdf_spark.zip jobs/kg_construct_job.py \\
        --pages <pages parquet/iceberg path> \\
        --out   <store dir> \\
        --shards 16 --buckets 256

For a smoke run without an input table, pass --synthetic N to generate
N deterministic pages instead of reading --pages.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="input pages table (parquet path)")
    ap.add_argument("--warc", help="input crawl segments (.warc/.warc.gz "
                    "path/glob) instead of --pages")
    ap.add_argument("--wet", help="input extracted-text segments "
                    "(.wet/.wet.gz path/glob, WARC conversion records) "
                    "instead of --pages; payloads feed the pipeline as "
                    "pre-extracted text")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of reading --pages")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--structured", action="append", default=[],
                    choices=["jsonld", "microdata", "rdfa"],
                    help="also parse embedded structured-data islands of "
                    "this format (repeatable); turtle blocks are always on")
    ap.add_argument("--link-graph",
                    help="also write the host-level <a href> link graph "
                    "(src, dst, n_links) to this parquet path")
    ap.add_argument("--anchor-priors",
                    help="also write the anchor-text link-prior dictionary "
                    "(surface, entity_iri, n, prior) to this parquet path — "
                    "gazetteer-shaped, reusable as the next run's aliases")
    ap.add_argument("--link-scc",
                    help="also write host-level strongly connected "
                         "components (mutual-link rings; (host, scc) "
                         "parquet dir)")
    ap.add_argument("--link-rank",
                    help="also write host-level pagerank + HITS scores "
                         "of the --link-graph edge set (ops.graph) — "
                         "(host, rank, hub, authority) parquet")
    ap.add_argument("--robots",
                    help="(host, body) robots.txt parquet: drop pages "
                         "the RFC 9309 rules deny before the pipeline "
                         "(ops.robots.robots_filter)")
    ap.add_argument("--robots-agent", default="*",
                    help="user-agent token for --robots group selection")
    ap.add_argument("--canonical-dedup", action="store_true",
                    help="collapse mirrored/parameter-variant pages onto "
                         "their <link rel=canonical> target before the "
                         "pipeline (ops.url.dedup_by_canonical)")
    ap.add_argument("--page-meta",
                    help="also write (url, title, description, canonical,"
                         " og_title) parquet head metadata (ops.html."
                         "extract_page_meta)")
    ap.add_argument("--main-text",
                    help="also write (url, main_text) parquet: each "
                         "page's extracted article text with nav/footer/"
                         "sidebar chrome dropped (ops.content) — the "
                         "corpus-side output of a crawl")
    ap.add_argument("--sniff-charset", action="store_true",
                    help="decode a binary html column with charset "
                         "sniffing (BOM > meta prescan > utf-8-replace) "
                         "before any extraction (ops.html.decode_html)")
    ap.add_argument("--normalize-urls", action="store_true",
                    help="canonicalize page URLs (ops.url rules) before "
                    "sharding, so lookalike spellings co-locate and collapse")
    ap.add_argument("--hearst",
                    help="also write Hearst-pattern hyponymy candidates "
                         "mined from the page text ((url, hyponym, "
                         "hypernym, pattern) parquet; ops.relations) — "
                         "taxonomy-candidate input for a fusion pass")
    ap.add_argument("--infobox-triples",
                    help="also write triples mined from header-row HTML "
                         "tables ((url, s, ..., o_lang) parquet; "
                         "ops.content.table_to_triples)")
    ap.add_argument("--infobox-key-col", action="store_true",
                    help="with --infobox-triples: treat each table's "
                         "first column as the entity key column")
    ap.add_argument("--aliases",
                    help="gazetteer parquet (surface, entity_iri, prior) — "
                    "e.g. a previous run's --anchor-priors output; default "
                    "is the built-in synthetic dictionary")
    ap.add_argument("--relatedness",
                    help="entity-relatedness edge parquet (entity_a, "
                    "entity_b); switches linking to context-coherence "
                    "disambiguation (extraction.disambiguate_mentions)")
    ap.add_argument("--coherence-weight", type=float, default=1.0,
                    help="coherence vote weight for --relatedness linking")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kg-construct").getOrCreate()

    from rdf_spark import datagen, pipeline

    if args.synthetic:
        pages = datagen.pages(spark, args.synthetic)
    elif args.warc:
        from rdf_spark import warc

        pages = warc.pages_from_warc(warc.read_warc(spark, args.warc))
    elif args.wet:
        from rdf_spark import warc

        pages = warc.pages_from_wet(warc.read_wet(spark, args.wet))
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages, --warc, --wet or --synthetic is required")

    if args.sniff_charset:
        from rdf_spark.ops.html import decode_html

        pages = (decode_html(pages, out_col="_decoded")
                 .drop("html")
                 .withColumnRenamed("_decoded", "html"))

    if args.normalize_urls:
        from pyspark.sql import functions as F

        from rdf_spark.ops.url import normalize_url_col

        pages = pages.withColumn("url", normalize_url_col(F.col("url")))

    if args.canonical_dedup:
        from rdf_spark.ops.url import dedup_by_canonical

        pages = dedup_by_canonical(pages)

    if args.robots:
        from rdf_spark.ops.robots import robots_filter

        pages = robots_filter(
            pages, spark.read.parquet(args.robots),
            agent=args.robots_agent, keep_denied=False,
        )

    aliases = (spark.read.parquet(args.aliases) if args.aliases
               else datagen.aliases(spark))
    relatedness = (spark.read.parquet(args.relatedness)
                   if args.relatedness else None)
    results = pipeline.run_pipeline(
        spark, pages, aliases, args.out,
        n_shards=args.shards, n_buckets=args.buckets,
        resume=not args.no_resume,
        extra_fmts=tuple(args.structured),
        relatedness=relatedness,
        coherence_weight=args.coherence_weight,
    )
    if args.hearst:
        from rdf_spark.ops.relations import hearst_candidates

        hearst_candidates(
            pages, text_col="text", id_col="url"
        ).withColumnRenamed("doc_id", "url").write.mode(
            "overwrite"
        ).parquet(args.hearst)
    if args.infobox_triples:
        from rdf_spark.ops.content import extract_tables, table_to_triples

        table_to_triples(
            extract_tables(pages),
            subject_from_first_col=args.infobox_key_col,
        ).write.mode("overwrite").parquet(args.infobox_triples)
    if args.page_meta:
        from rdf_spark.ops.html import extract_page_meta

        extract_page_meta(pages).write.mode("overwrite").parquet(
            args.page_meta
        )
    if args.main_text:
        from rdf_spark.ops.content import extract_main_text

        extract_main_text(pages).select("url", "main_text").write.mode(
            "overwrite"
        ).parquet(args.main_text)
    if args.link_graph:
        from rdf_spark.ops import html as htmlops

        htmlops.host_link_graph(pages).write.mode("overwrite").parquet(
            args.link_graph
        )
    if args.link_rank:
        from rdf_spark.ops import html as htmlops
        from rdf_spark.ops.graph import hits, pagerank

        edges = htmlops.host_link_graph(pages)
        pr = pagerank(edges)
        hs = hits(edges)
        pr.join(hs, "node").withColumnRenamed("node", "host").write.mode(
            "overwrite"
        ).parquet(args.link_rank)
    if args.link_scc:
        from rdf_spark.ops import html as htmlops
        from rdf_spark.ops.graph import strongly_connected_components

        edges = htmlops.host_link_graph(pages)
        strongly_connected_components(edges).withColumnRenamed(
            "node", "host"
        ).write.mode("overwrite").parquet(args.link_scc)
    if args.anchor_priors:
        from rdf_spark.ops import html as htmlops

        htmlops.anchor_link_priors(pages).write.mode("overwrite").parquet(
            args.anchor_priors
        )
    summary = {
        "shards": len(results),
        "pages": sum(r.n_pages for r in results),
        "triples": sum(r.n_triples_final for r in results),
        "parse_errors": sum(r.n_parse_errors for r in results),
        "skipped": sum(1 for r in results if r.skipped),
        "wall_s": round(sum(r.wall_s for r in results), 2),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
