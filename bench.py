"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "nt_triples_per_sec": ..., "kg_pages_per_sec": ...}

Each query is forced end-to-end with the noop sink (no result IO, full
computation — projections are not pruned away as they would be by count()).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _force(df):
    df.write.format("noop").mode("overwrite").save()


# throughput fixtures — defined ONCE here; bench_quiet.py imports them so
# its BENCH_QUIET.json numbers stay comparable to this file's artifacts
NT_FIXTURE_LINES = 12_000_000
KG_FIXTURE_PAGES = 60_000
WET_FIXTURE_PAGES = 60_000


def nt_fixture(spark, cpus: int):
    """~12M synthetic N-Triples lines → parsed triples (narrow plan)."""
    from rdf_spark import sources

    lines = spark.range(NT_FIXTURE_LINES, numPartitions=cpus * 2).select(
        F.concat(
            F.lit("<urn:order:"), F.col("id"), F.lit("> <urn:p:qty> \""),
            F.pmod(F.col("id"), F.lit(50)),
            F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer> .'),
        ).alias("value")
    )
    return sources.parse_lines_df(lines, "ntriples")


def kg_fixture(spark):
    """60k synthetic pages → the fused KG construction pipeline."""
    from rdf_spark import datagen, pipeline

    pages = datagen.pages(spark, KG_FIXTURE_PAGES)
    final, _ = pipeline.build_shard_triples(pages, datagen.aliases(spark))
    return final


def wet_fixture(spark, cpus: int, n_pages: int | None = None):
    """Synthetic WET conversion records (real WARC bytes on the
    wire: framing, Content-Length, warcinfo-free files) → parse →
    pages_from_wet → the fused KG construction pipeline.
    BASELINE.json's throughput metric ("triples/sec ... on a
    Common-Crawl WET shard") is defined over exactly this input.
    Shared with bench_scaling.py (which sizes n_pages up)."""
    from rdf_spark import datagen, pipeline, warc

    if n_pages is None:
        n_pages = WET_FIXTURE_PAGES
    surfaces = F.array(*[F.lit(s) for s, _, _ in datagen.ENTITIES])
    n = F.col("id")
    text = F.concat(
        F.lit("Profile "), n, F.lit(": "),
        F.element_at(surfaces, (F.pmod(n, F.lit(10)) + 1).cast("int")),
        F.lit(" worked with "),
        F.element_at(surfaces, (F.pmod(n + 3, F.lit(10)) + 1).cast("int")),
        F.lit(" on item "), n, F.lit("."),
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: <urn:w:"),
        n,
        F.lit(">\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
              "WARC-Target-URI: https://example.org/p/"),
        n,
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"), text, F.lit("\r\n\r\n"),
    )
    files = (
        spark.range(n_pages)
        .select(F.pmod(F.col("id"), F.lit(cpus * 4)).alias("g"),
                F.struct("id", rec.alias("rec")).alias("s"))
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            F.concat(F.lit("mem://wet/"), F.col("g")).alias("path"),
            F.encode(
                F.array_join(F.transform("ss", lambda s: s["rec"]), ""),
                "UTF-8",
            ).alias("content"),
        )
    )
    pages = warc.pages_from_wet(warc.parse_warc(files, types=("conversion",)))
    final, _ = pipeline.build_shard_triples(pages, datagen.aliases(spark))
    return final


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from rdf_spark.session import get_spark

    spark = get_spark("rdf_spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qfns = entry.queries()

    # headline set: parse throughput, KG pipeline, dedup, ANN, SQL classics
    bench_queries = [
        "nt_parse",
        "nquads_parse",
        "turtle_parse",
        "turtle_flat_parse",
        "trig_parse",
        "jsonld_parse",
        "nt_serialize",
        "dedup_triples",
        "mention_count",
        "entity_link",
        "dedup_exact",
        "quality_score",
        "minhash_near_dup",
        "simhash",
        "embedding_topk",
        "embedding_near_dup",
        "ngram_jaccard",
        "tpch_q1",
        "top_customers",
        "events_sessionize",
        "corpus_curate",
        "deterministic_sample",
        "bm25_search",
        "lm_score",
        "sparql_select",
        "sparql_not_exists",
        "sparql_having",
        "sparql_lang",
        "sparql_path_unanchored",
        "boilerplate_lines",
        "decontaminate",
        "pack_sequences",
        "pii_redact",
        "html_structured",
        "html_links",
        "html_microdata",
        "robots_gate",
        "html_rdfa",
        "anchor_priors",
        "sitemap_parse",
        "sparql_agg_expr",
        "host_cap",
        "wet_pipeline",
        "sparql_path_in_blocks",
        "span_dedup",
        "sparql_update",
        "html_charset",
        "main_text",
        "page_meta",
        "canonical_dedup",
        "weighted_repeat",
        "embedding_decontaminate",
        "hits",
        "html_tables",
        "rdfs_closure",
        "sameas_resolve",
        "entity_resolve",
        "triangle_count",
        "surt_key",
        "cdxj_parse",
        "fetch_plan",
        "recrawl_stats",
        "k_core",
        "classifier_score",
        "void_summary",
        "shacl_report",
        "dsir_weights",
        "store_diff",
        "label_propagation",
        "embedding_covariance",
        "k_truss",
        "link_predict",
        "asof_join",
        "range_join",
        "bigram_lm",
        "rdf_canonicalize",
        "bpe_train",
        "duplicate_spans",
        "c4_clean",
        "owl_closure",
        "graph_digest",
        "mixture_weights",
        "personalized_pagerank",
        "scc",
        "duplicated_fraction",
        "shacl_shapes",
        "shacl_logic",
        "chunk_documents",
        "rdf_lists",
        "wat_links",
        "turtle_star_parse",
        "sparql_star",
        "fuse_values",
        "hearst_hyponyms",
        "table_triples",
        "kmeans",
        "direct_map",
        "property_graph",
        "graph_walks",
        "shortest_paths",
    ]

    timings: dict[str, float] = {}

    # warm the JVM/python workers once (excluded from timings)
    _force(qfns["tpch_q1"](spark, sf_dir))

    for name in bench_queries:
        t0 = time.time()
        _force(qfns[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # NT parse throughput in triples/sec (the BASELINE.json headline unit).
    # Sized so compute dominates fixed stage costs (~12M lines, ~4 s @32c).
    n_lines = NT_FIXTURE_LINES
    parsed = nt_fixture(spark, cpus)
    _force(parsed)  # warm python workers
    t0 = time.time()
    _force(parsed)
    nt_wall = time.time() - t0
    timings["nt_parse_throughput"] = round(nt_wall, 3)
    nt_tps = round(n_lines / nt_wall, 1)

    # KG pipeline end-to-end throughput (pages/sec), synthetic corpus
    n_pages = KG_FIXTURE_PAGES
    final = kg_fixture(spark)
    _force(final)  # warm (plan + python workers) so the recorded number is stable
    t0 = time.time()
    _force(final)
    kg_wall = time.time() - t0
    timings["kg_pipeline_60k"] = round(kg_wall, 3)

    # WET shard → KG end-to-end throughput (pages/sec): the BASELINE.json
    # metric input shape (real WARC conversion-record bytes parsed back)
    wfinal = wet_fixture(spark, cpus)
    _force(wfinal)  # warm
    t0 = time.time()
    _force(wfinal)
    wet_wall = time.time() - t0
    timings["wet_pipeline_60k"] = round(wet_wall, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "nt_triples_per_sec": nt_tps,
                "kg_pages_per_sec": round(n_pages / kg_wall, 1),
                "wet_pages_per_sec": round(WET_FIXTURE_PAGES / wet_wall, 1),
                "cpus": cpus,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
