"""Corpus-curation operators: repetition signals, deterministic sampling,
and the composed curate pipeline (lang → quality → repetition → dedup →
sample with an auditable drop_reason per document)."""

import os

import pytest

from pyspark.sql import functions as F

from rdf_spark import curate
from rdf_spark.ops import sample as smp
from rdf_spark.ops import text as textops

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------------------
# repetition features
# ---------------------------------------------------------------------------


def test_repetition_features_handcrafted(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, one duplicate; 2 paragraphs, distinct
            (1, "spam line\nreal text\nspam line\nmore text\n\nsecond para"),
            # heavy token repetition
            (2, "buy buy buy buy buy now"),
            # clean doc
            (3, "a perfectly ordinary sentence with varied words"),
            (4, ""),
            (5, None),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in textops.repetition_features(df).collect()}
    r1 = out[1]
    assert r1.rep_lines == 5  # blank line between paras filtered out
    assert r1.rep_dup_line_frac == pytest.approx(1 / 5, abs=1e-6)
    assert r1.rep_dup_para_frac == 0.0
    r2 = out[2]
    assert r2.rep_dup_token_frac == pytest.approx(4 / 6, abs=1e-6)
    assert not r2.rep_keep  # 0.667 > 0.6 threshold
    r3 = out[3]
    assert r3.rep_dup_token_frac == 0.0
    assert r3.rep_keep
    for empty_id in (4, 5):
        r = out[empty_id]
        assert r.rep_lines == 0
        assert r.rep_dup_line_frac == 0.0
        assert r.rep_mean_word_len == 0.0
        assert not r.rep_keep  # mean word len 0 < lo bound


def test_repetition_paragraph_dup(spark):
    df = spark.createDataFrame(
        [(1, "same para\n\nsame para\n\nother para")], "doc_id int, text string"
    )
    r = textops.repetition_features(df).collect()[0]
    assert r.rep_dup_para_frac == pytest.approx(1 / 3, abs=1e-6)
    assert not r.rep_keep  # 0.333 > 0.3


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


def test_md5_threshold_edges():
    assert smp.md5_threshold(0.0) == "0" * 32
    assert smp.md5_threshold(1.0) == "g" * 32
    with pytest.raises(ValueError):
        smp.md5_threshold(1.5)


def test_deterministic_sample_invariant_to_partitioning(spark, documents):
    a = sorted(
        r.doc_id for r in smp.deterministic_sample(documents, 0.4).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in smp.deterministic_sample(documents.repartition(13), 0.4)
        .select("doc_id")
        .collect()
    )
    assert a == b and 0 < len(a) < documents.count()


def test_deterministic_sample_nested_and_rate(spark, documents):
    n = documents.count()
    k20 = smp.deterministic_sample(documents, 0.2).count()
    k60 = smp.deterministic_sample(documents, 0.6).count()
    # monotone nesting: the 20% slice is a subset of the 60% slice
    s20 = {r.doc_id for r in smp.deterministic_sample(documents, 0.2).collect()}
    s60 = {r.doc_id for r in smp.deterministic_sample(documents, 0.6).collect()}
    assert s20 <= s60
    assert k20 < k60 < n
    assert abs(k60 / n - 0.6) < 0.25  # expected-rate ballpark at small n


def test_stratified_matches_per_stratum_uniform(spark, documents):
    rates = {"en": 0.8, "de": 0.3}
    strat = smp.stratified_sample(documents, rates, default_rate=0.0)
    got = sorted(r.doc_id for r in strat.select("doc_id").collect())
    want = []
    for lang, rate in rates.items():
        sub = documents.filter(F.col("lang") == lang)
        want += [r.doc_id for r in smp.deterministic_sample(sub, rate).collect()]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# composed curation
# ---------------------------------------------------------------------------


def _corpus(spark):
    good = "the cat and the dog were friends in the park for a while"
    return spark.createDataFrame(
        [
            (1, good, "en"),                       # kept
            (2, good + " extra tail words here", "zh"),  # lang
            (3, ";;;; !!!! ???? ::::", "en"),       # quality (symbol soup)
            # passes the quality floor (stopword-rich, 15 tokens) but
            # trips the dup-token filter: 12/15 = 0.8 > 0.6
            (4, "the cat and the cat and the cat and the cat and the cat and", "en"),
            (5, good, "en"),                        # duplicate of 1
            (6, good, "zh"),                        # lang (dup text but lang drops first)
        ],
        "doc_id int, text string, lang string",
    )


def test_curate_report_reasons(spark):
    rep = curate.curate_report(
        _corpus(spark), langs=("en",), min_quality=0.5, sample_rate=1.0
    )
    got = {r.doc_id: r.drop_reason for r in rep.collect()}
    assert got == {
        1: None,
        2: "lang",
        3: "quality",
        4: "repetition",
        5: "duplicate",
        6: "lang",
    }


def test_curate_dropped_doc_never_shadows(spark):
    # the duplicate-class representative is chosen among SURVIVORS: a
    # same-text doc dropped for lang must not shadow the eligible copy
    df = spark.createDataFrame(
        [(1, "the cat and the dog were friends in the park", "zh"),
         (2, "the cat and the dog were friends in the park", "en")],
        "doc_id int, text string, lang string",
    )
    rep = curate.curate_report(df, langs=("en",), min_quality=0.0, sample_rate=1.0)
    got = {r.doc_id: r.drop_reason for r in rep.collect()}
    assert got == {1: "lang", 2: None}


def test_curate_stats_partition(spark):
    stats = {
        r.stage: r.n_docs
        for r in curate.curate_stats(
            _corpus(spark), langs=("en",), min_quality=0.5, sample_rate=1.0
        ).collect()
    }
    assert sum(stats.values()) == 6
    assert stats["kept"] == 1 and stats["lang"] == 2


def test_curate_corpus_matches_report(spark, documents):
    d = documents.select("doc_id", "text", "lang")
    kept = curate.curate_corpus(d, langs=("en", "de"), min_quality=0.6, sample_rate=0.5)
    rep = curate.curate_report(d, langs=("en", "de"), min_quality=0.6, sample_rate=0.5)
    assert kept.count() == rep.filter(F.col("drop_reason").isNull()).count()
    # every surviving fingerprint is unique
    fps = kept.select(textops.fingerprint_col(F.col("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()


def test_curate_job_entrypoint(spark, tmp_path):
    """The spark-submit curation CLI end-to-end."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    src = str(tmp_path / "docs_in_job")
    _corpus(spark).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "curated_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", out,
            "--langs", "en", "--min-quality", "0.5", "--sample-rate", "1.0",
        ])
    assert rc == 0
    stages = json.loads(buf.getvalue().strip().splitlines()[-1])["stages"]
    assert stages == {"kept": 1, "lang": 2, "quality": 1,
                      "repetition": 1, "duplicate": 1}
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.count() == 1 and kept.collect()[0].doc_id == 1
    report = spark.read.parquet(f"{out}/report")
    assert report.count() == 6

    # --strip-boilerplate plumbs through to the stage-0 knob
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", str(tmp_path / "curated_bp"),
            "--langs", "en", "--min-quality", "0.0",
            "--strip-boilerplate", "100",   # threshold never met → no-op
            "--scrub-pii",
        ])
    assert rc == 0
    assert json.loads(buf.getvalue().strip().splitlines()[-1])["stages"]


def test_curate_null_lang_dropped_as_lang(spark):
    """A NULL lang must drop as 'lang' (isin(NULL) is NULL, which would
    otherwise slip through every NOT-guard in the reason cascade and keep
    an allow-list-violating doc — regression test for that bug)."""
    good = "the cat and the dog were friends in the park for a while"
    df = spark.createDataFrame(
        [(1, good, None), (2, good + " and then some more of it", None)],
        "doc_id int, text string, lang string",
    )
    rep = curate.curate_report(df, langs=("en",), min_quality=0.5, sample_rate=1.0)
    assert {r.doc_id: r.drop_reason for r in rep.collect()} == {1: "lang", 2: "lang"}


def test_strip_boilerplate_stage(spark):
    """Optional stage 0: corpus-wide chrome lines are removed BEFORE the
    flags, so boilerplate stops inflating repetition fractions and stops
    splitting duplicate content into distinct fingerprints."""
    from rdf_spark.curate import curate_corpus, curate_report

    body = "genuine unique content about topic %d with enough words here"
    footer = "SITE NAV | HOME | ABOUT | CONTACT"
    rows = [
        (i, "en", "\n".join([body % i, footer, footer, footer, footer]))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    kept = curate_corpus(
        df, min_quality=0.0, strip_boilerplate=3
    ).collect()
    assert len(kept) == 6
    assert all(footer not in r.text for r in kept)
    # same corpus WITHOUT stripping: the repeated footer dominates the
    # line-duplication fraction and the repetition stage kills every doc
    rep = curate_report(df, min_quality=0.0)
    reasons = {r.doc_id: r.drop_reason for r in rep.collect()}
    assert set(reasons.values()) == {"repetition"}
    # dedup now sees cleaned text: two docs differing ONLY in chrome
    # become duplicates once stripped
    # the shared body appears in only TWO docs (below min_docs=3), the
    # footer in four (stripped): docs 0 and 2 differ only in where the
    # chrome sat — after stage 0 they are exact duplicates
    shared = "the same body text appears here with plenty of real words"
    rows2 = [
        (0, "en", shared + "\n" + footer),
        (2, "en", footer + "\n" + shared),
        (3, "en", "a different body with its own genuine words\n" + footer),
        (4, "en", "yet more unrelated content and words\n" + footer),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, lang string, text string")
    rep2 = {r.doc_id: r.drop_reason for r in curate_report(
        df2, min_quality=0.0, strip_boilerplate=3
    ).collect()}
    assert rep2[0] is None and rep2[2] == "duplicate"
    assert rep2[3] is None and rep2[4] is None


def test_scrub_pii_stage(spark):
    """scrub_pii=True: redaction happens before fingerprinting, so pages
    differing only in a contact email become duplicates, and the kept
    corpus carries placeholders instead of raw identifiers."""
    from rdf_spark.curate import curate_corpus, curate_report

    body = "a perfectly ordinary page with plenty of genuine words in it"
    rows = [
        (0, "en", body + " write to alice@example.org"),
        (1, "en", body + " write to bob@example.net"),
        (2, "en", "another page with different content and words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rep = {r.doc_id: r for r in curate_report(
        df, min_quality=0.0, scrub_pii=True
    ).collect()}
    assert rep[0].drop_reason is None
    assert rep[1].drop_reason == "duplicate"  # emails redacted → same text
    assert rep[2].drop_reason is None
    kept = curate_corpus(df, min_quality=0.0, scrub_pii=True).collect()
    assert all("@example" not in r.text for r in kept)
    assert any("<EMAIL>" in r.text for r in kept)
    # without the stage, the two pages stay distinct
    rep_off = {r.doc_id: r.drop_reason for r in curate_report(
        df, min_quality=0.0
    ).collect()}
    assert rep_off[1] is None


def test_strip_boilerplate_keeps_null_keyed_rows(spark):
    """The audit contract: every input row appears in the report, even a
    null-keyed one (plain-equality joins would drop it — review r4)."""
    from rdf_spark.curate import curate_report

    rows = [
        (0, "en", "a genuine page with plenty of ordinary words in it"),
        (None, "en", "another genuine page with its own distinct words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rep = curate_report(df, min_quality=0.0, strip_boilerplate=5)
    assert rep.count() == 2
    assert rep.filter(F.col("doc_id").isNull()).count() == 1


def test_curate_near_dup_stage(spark):
    """Round-5: optional MinHash near-dup stage — clusters among the
    exact-dedup survivors keep their min doc_id; drop_reason='near_dup'
    for the rest; exact duplicates still drop as 'duplicate' first."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    rows = [
        (1, base, "en"),
        (2, base, "en"),                      # exact dup of 1 → 'duplicate'
        (3, base + " tonight", "en"),         # near dup of 1 → 'near_dup'
        (4, "completely different text about database query engines "
            "and distributed shuffle execution plans for analytics", "en"),
        (5, base + " forest", "fr"),          # near dup but lang-dropped
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    rep = curate.curate_report(
        df, min_quality=0.0, near_dup=dict(threshold=0.9, n_bands=32,
                                           n_hashes=64)
    )
    got = {r.doc_id: r.drop_reason for r in rep.collect()}
    assert got == {1: None, 2: "duplicate", 3: "near_dup", 4: None, 5: "lang"}
    # without the stage, doc 3 is kept — the near_dup reason is opt-in
    rep0 = curate.curate_report(df, min_quality=0.0)
    got0 = {r.doc_id: r.drop_reason for r in rep0.collect()}
    assert got0[3] is None and "near_dup" not in set(got0.values())


def test_cap_per_key_deterministic_and_mapside(spark, documents):
    from rdf_spark.ops.sample import cap_per_key

    keyed = documents.withColumn("host", F.pmod("doc_id", F.lit(5)))
    capped = cap_per_key(keyed, "host", 4)
    counts = {r.host: r.n for r in
              capped.groupBy("host").agg(F.count("*").alias("n")).collect()}
    totals = {r.host: r.n for r in
              keyed.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert all(counts[h] == min(4, totals[h]) for h in totals)
    # identical survivors under a different partitioning (audit contract)
    again = cap_per_key(keyed.repartition(13), "host", 4)
    assert sorted(r.doc_id for r in capped.collect()) == \
        sorted(r.doc_id for r in again.collect())
    # the skew guard: row_number<=k compiles to a map-side WindowGroupLimit
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    import pytest
    with pytest.raises(ValueError):
        cap_per_key(keyed, "host", 0)


def test_curate_host_cap_stage(spark, documents):
    keyed = documents.withColumn("source", F.pmod("doc_id", F.lit(3)))
    rep = curate.curate_report(keyed, host_cap=("source", 2))
    kept = rep.filter(F.col("drop_reason").isNull())
    per_host = {r.source: r.n for r in
                kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 2 for n in per_host.values()) and per_host
    capped = rep.filter(F.col("drop_reason") == "host_capped")
    # quota only demotes rows every earlier stage kept
    base = curate.curate_report(keyed)
    base_kept = {r.doc_id for r in
                 base.filter(F.col("drop_reason").isNull()).collect()}
    assert {r.doc_id for r in capped.collect()} <= base_kept
    # other reasons unchanged by the cap stage
    a = {(r.doc_id, r.drop_reason) for r in base.collect()
         if r.drop_reason is not None}
    b = {(r.doc_id, r.drop_reason) for r in rep.collect()
         if r.drop_reason not in (None, "host_capped")}
    assert a == b
    # deterministic survivors under different partitioning
    again = curate.curate_report(keyed.repartition(11), host_cap=("source", 2))
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in
        again.filter(F.col("drop_reason").isNull()).collect())
    import pytest
    with pytest.raises(ValueError):
        curate.curate_report(keyed, host_cap=("source", 0))


def test_curate_job_host_cap_flag(spark, tmp_path, documents):
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    src = str(tmp_path / "docs_cap_in")
    documents.withColumn("source", F.pmod("doc_id", F.lit(2))).write.parquet(src)
    out = str(tmp_path / "docs_cap_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", out, "--langs", "en,de",
            "--min-quality", "0.0", "--host-cap", "source:3",
        ])
    assert rc == 0
    stages = json.loads(buf.getvalue().strip().splitlines()[-1])["stages"]
    assert stages.get("host_capped", 0) > 0
    kept = spark.read.parquet(f"{out}/kept")
    per = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 for n in per.values())
    import pytest
    with pytest.raises(SystemExit):
        curate_job.main(["--in", src, "--out", out, "--host-cap", "nope"])


def test_span_dedup_stage(spark):
    """span_dedup_ngram=N: a passage repeated across docs is removed
    from all but its globally-first occurrence BEFORE the flags, so
    despanned text drives fingerprints; runs after the PII scrub so
    spans differing only in redacted identifiers collapse."""
    from rdf_spark.curate import curate_corpus, curate_report

    passage = "this exact promotional passage repeats across many pages verbatim"
    rows = [
        (0, "en", "alpha body zero keeps going " + passage),
        (1, "en", "beta body one rolls onward " + passage),
        (2, "en", "gamma entirely different genuine words here throughout"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = {r.doc_id: r.text for r in curate_corpus(
        df, min_quality=0.0, span_dedup_ngram=9
    ).collect()}
    assert passage in kept[0]          # globally-first occurrence kept
    assert passage not in kept[1]      # removed from the later doc
    assert kept[1] == "beta body one rolls onward"
    assert kept[2] == rows[2][2]       # untouched
    # composes with scrub_pii: the span differs only in an email, which
    # the (earlier) PII stage normalizes — so it still collapses
    rowsp = [
        (0, "en", "alpha intro words " + passage + " mail alice@example.org"),
        (1, "en", "beta intro words " + passage + " mail bob@example.net"),
    ]
    dfp = spark.createDataFrame(rowsp, "doc_id long, lang string, text string")
    keptp = {r.doc_id: r.text for r in curate_corpus(
        dfp, min_quality=0.0, scrub_pii=True, span_dedup_ngram=9
    ).collect()}
    assert passage in keptp[0] and "<EMAIL>" in keptp[0]
    assert passage not in keptp[1]


def test_curate_job_span_dedup_flag(spark, tmp_path):
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    passage = "the shared campaign paragraph spreads over every mirror site"
    rows = [
        (0, "en", "origin page body text " + passage),
        (1, "en", "mirror page body text " + passage),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.parquet(src)
    out = str(tmp_path / "cur")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main(["--in", src, "--out", out,
                              "--min-quality", "0.0",
                              "--span-dedup-ngram", "9"])
    assert rc == 0
    texts = {r.doc_id: r.text
             for r in spark.read.parquet(out + "/kept").collect()}
    assert passage in texts[0] and passage not in texts[1]


def test_curate_job_repeat_output(spark, tmp_path):
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    rows = [(i, "the quick brown fox jumps over the lazy dog again and "
                "again with plenty of words " + str(i),
             "en" if i % 2 == 0 else "de") for i in range(40)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(src)
    out = str(tmp_path / "cur")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", out, "--langs", "en,de",
            "--min-quality", "0.0", "--repeat", "lang:en=2.0,de=1.0",
        ])
    assert rc == 0
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    kept = spark.read.parquet(f"{out}/kept")
    n_en = kept.filter("lang = 'en'").count()
    n_de = kept.filter("lang = 'de'").count()
    rep = spark.read.parquet(f"{out}/repeated")
    assert res["repeated"] == rep.count() == 2 * n_en + n_de
    assert "copy" in rep.columns


def test_curate_classifier_stage(spark):
    """Model-based quality gate: all-negative weights force scores below
    0.5 → reason 'classifier'; evaluated after the heuristic quality
    floor and before repetition, and clf-dropped docs never become
    dedup representatives."""
    df = spark.createDataFrame(
        [(1, "the cat and the dog were friends in the park", "en"),
         (2, "the cat and the dog were friends in the park", "en")],
        "doc_id int, text string, lang string",
    )
    rep = curate.curate_report(
        df, langs=("en",), min_quality=0.0, sample_rate=1.0,
        classifier=dict(weights=[-1.0] * 16, min_score=0.5),
    )
    got = {r.doc_id: r.drop_reason for r in rep.collect()}
    # sigmoid(mean of -1.0) < 0.5 for every doc → both drop as classifier
    assert got == {1: "classifier", 2: "classifier"}
    # positive weights keep everything; clf_score column is surfaced
    rep2 = curate.curate_report(
        df, langs=("en",), min_quality=0.0, sample_rate=1.0,
        classifier=dict(weights=[1.0] * 16, min_score=0.5),
    )
    rows = rep2.collect()
    assert {r.drop_reason for r in rows} == {None, "duplicate"}
    assert all(r.clf_score > 0.5 for r in rows)


def test_curate_classifier_job_cli(spark, tmp_path):
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    docs = spark.createDataFrame(
        [(1, "the cat and the dog were friends in the park", "en"),
         (2, "completely different words entirely here again", "en")],
        "doc_id int, text string, lang string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    wfile = tmp_path / "w.json"
    wfile.write_text(_json.dumps([-1.0] * 16))
    out = str(tmp_path / "out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", out, "--min-quality", "0.0",
            "--clf-weights", str(wfile), "--clf-min-score", "0.5",
        ])
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])["stages"]
    assert stats.get("classifier") == 2


def test_curate_dsir_stage(spark):
    """DSIR importance gate: off-target-vocabulary docs drop with
    reason 'dsir', dsir_logw surfaces as a signal column, and the gate
    runs after dedup (a duplicate stays 'duplicate', never 'dsir')."""
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat with the cat", "en"),
         (2, "the cat sat on the mat with the cat", "en"),  # exact dup
         (3, "zzz qqq vvv kkk jjj xxx www yyy uuu", "en")],
        "doc_id int, text string, lang string",
    )
    target = spark.createDataFrame(
        [(100, "the cat sat on a mat and the cat purred")],
        "doc_id int, text string",
    )
    rep = curate.curate_report(
        df, langs=("en",), min_quality=0.0, sample_rate=1.0,
        dsir=dict(target=target, min_logw=-10.0, n=1, n_buckets=64),
    )
    got = {r.doc_id: r.drop_reason for r in rep.collect()}
    assert got == {1: None, 2: "duplicate", 3: "dsir"}
    logw = {r.doc_id: r.dsir_logw for r in rep.collect()}
    assert logw[1] > -10.0 > logw[3]


def test_curate_dsir_job_cli(spark, tmp_path):
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat with the cat", "en"),
         (3, "zzz qqq vvv kkk jjj xxx www yyy uuu", "en")],
        "doc_id int, text string, lang string",
    )
    tgt = spark.createDataFrame(
        [(100, "the cat sat on a mat and the cat purred")],
        "doc_id int, text string",
    )
    src, tpath = str(tmp_path / "docs"), str(tmp_path / "tgt")
    docs.write.parquet(src)
    tgt.write.parquet(tpath)
    out = str(tmp_path / "out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", out, "--min-quality", "0.0",
            "--dsir-target", tpath, "--dsir-min-logw", "-10.0",
            "--dsir-ngram", "1", "--dsir-buckets", "64",
        ])
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])["stages"]
    assert stats.get("dsir") == 1 and stats.get("kept") == 1


def test_curate_c4_stage(spark):
    g1 = "the quick brown fox jumps over the lazy dog today."
    g2 = "every good sentence carries at least five real words!"
    g3 = "what does a terminal question mark look like here?"
    junk = "click here"
    df = spark.createDataFrame(
        [
            # enough surviving lines -> kept, junk line stripped
            (1, "\n".join([g1, junk, g2, g3]), "en"),
            # too few surviving lines -> c4_page
            (2, "\n".join([g1, junk]), "en"),
            # identical to doc 1 AFTER line cleaning -> duplicate
            (3, "\n".join([g1, g2, g3, "buy now"]), "en"),
            # page rule: brace -> c4_page even with enough lines
            (4, "\n".join([g1 + " { x }", g1, g2, g3]), "en"),
        ],
        "doc_id long, text string, lang string",
    )
    rep = curate.curate_report(df, langs=("en",), min_quality=0.0,
                               sample_rate=1.0, c4=True)
    got = {r.doc_id: r.drop_reason for r in rep.collect()}
    assert got == {1: None, 2: "c4_page", 3: "duplicate", 4: "c4_page"}
    texts = {r.doc_id: r.text for r in rep.collect()}
    assert texts[1] == "\n".join([g1, g2, g3])
    # the junk lines were stripped from BOTH duplicate-class members
    assert texts[3] == texts[1]


def test_curate_job_c4_flag(spark, tmp_path):
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import curate_job

    g1 = "alpha beta gamma delta epsilon zeta."
    g2 = "one two three four five six seven eight."
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "\n".join([g1, g2]), "en"), (2, g1, "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    out = str(tmp_path / "out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = curate_job.main([
            "--in", src, "--out", out, "--min-quality", "0.0",
            "--c4", "5:2",
        ])
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["stages"].get("c4_page") == 1
    assert stats["stages"].get("kept") == 1
