"""Triple P/R vs the deterministic reference oracle (BASELINE.md headline:
P/R ≥ 0.95 on a held-out shard; the synthetic corpus is exact, so the
pipeline must score 1.0 — anything less is a real defect)."""

from pyspark.sql import functions as F

from rdf_spark import datagen, pipeline, scoring


def test_pipeline_pr_is_perfect(spark):
    n = 400
    pages = datagen.pages(spark, n)
    expected = datagen.expected_triples(spark, n)
    got, quarantine = pipeline.build_shard_triples(pages, datagen.aliases(spark))
    score = scoring.pr_score(got, expected)
    if score.precision < 1.0 or score.recall < 1.0:
        spurious, missing = scoring.diff_triples(got, expected)
        print("SPURIOUS:", [r.line for r in spurious.limit(5).collect()])
        print("MISSING:", [r.line for r in missing.limit(5).collect()])
    assert score.precision == 1.0
    assert score.recall == 1.0
    # the corpus plants malformed RDF blocks on ~1/41 of pages — they must
    # be quarantined, never silently dropped or fatal
    n_broken = pages.filter(F.contains(F.decode("html", "utf-8"), F.lit("broken"))).count()
    assert quarantine.count() == n_broken > 0


def test_pr_score_detects_differences(spark):
    n = 50
    expected = datagen.expected_triples(spark, n)
    # drop some rows and corrupt others → P/R must reflect it
    mutated = expected.filter(F.xxhash64("s", "p", "o") % 10 != 0)
    score = scoring.pr_score(mutated, expected)
    assert score.precision == 1.0
    assert score.recall < 1.0
    corrupted = expected.withColumn(
        "o", F.when(F.col("o_kind") == 2, F.concat(F.col("o"), F.lit("!"))).otherwise(F.col("o"))
    )
    score2 = scoring.pr_score(corrupted, expected)
    assert score2.precision < 1.0
