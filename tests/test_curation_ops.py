"""Unit oracles for the round-6 curation operators (decontaminate,
repetition_ratio, sample_to_budget, tfidf_top_terms) — tiny hand-checkable
corpora; the sf0.01 hash gate covers them at scale."""

from __future__ import annotations

import hashlib

import pytest

from latex_ocr_spark.operators import text_analysis as TA


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "an entirely different sentence with no overlap at all here"),
        (3, "the quick brown fox jumps over the lazy dog tonight instead"),
        (4, "spam spam spam spam spam spam spam spam"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_shingles(spark, docs):
    """Doc 3 shares the 5-gram 'the quick brown fox jumps' (and more) with
    benchmark doc 1; doc 2 and doc 4 share none."""
    bench = docs.filter("doc_id = 1")
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in TA.decontaminate(docs, bench, n=5).collect()}
    assert got[2] == (0, False)
    assert got[4] == (0, False)
    # doc 1 is the benchmark itself: every one of its 6 distinct 5-grams hits
    assert got[1] == (6, True)
    # doc 3 shares exactly the 5 five-grams of the common 9-word prefix
    assert got[3] == (5, True)


def test_decontaminate_oversized_benchmark_degrades_to_shuffle_join(
    spark, docs
):
    """No unconditional broadcast hint on the benchmark side (house rule:
    data-dependent sides get none): with broadcast planning disabled — the
    stand-in for a benchmark union too big to fit the driver — the shingle
    join degrades to a shuffle join instead of OOMing, and the answer is
    unchanged."""
    bench = docs.filter("doc_id = 1")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        out = TA.decontaminate(docs, bench, n=5)
        got = {r.doc_id: r.contaminated for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    assert got == {1: True, 2: False, 3: True, 4: False}
    assert "BroadcastHashJoin" not in plan, (
        "benchmark side was force-broadcast despite disabled thresholds — "
        "an unconditional hint is back"
    )


def test_repetition_ratio_bounds(spark, docs):
    got = {r.doc_id: (r.n_grams, r.rep_ratio)
           for r in TA.repetition_ratio(docs, n=2).collect()}
    # doc 4: 7 bigrams, all 'spam spam' -> ratio 1 - 1/7
    assert got[4] == (7, round(1 - 1 / 7, 4))
    # doc 2: no repeated bigram
    assert got[2][1] == 0.0
    # doc 1: 9 bigrams, all distinct ('the quick' vs 'the lazy' differ)
    assert got[1] == (9, 0.0)


def test_repetition_ratio_empty_doc(spark):
    one = spark.createDataFrame([(9, "word")], "doc_id long, text string")
    got = TA.repetition_ratio(one, n=2).collect()[0]
    assert (got.n_grams, got.rep_ratio) == (0, 0.0)


def test_sample_to_budget_deterministic_and_rate(spark):
    """The md5-threshold test reproduces exactly the python-side rule, and
    rate = min(1, budget/total) per stratum."""
    rows = [(i, "the a of and to in is was for on with as by at it from")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budgets = {"en": 800}  # total = 200 docs * 16 words; rate = 0.25
    out = TA.sample_to_budget(docs, budgets).collect()
    assert out and all(r.lang == "en" and r.rate == 0.25 for r in out)
    threshold = format(int(0.25 * 2**32), "08x")
    # keep test hashes the doc_id ALONE: uniform + deterministic already,
    # and hashing text would cost a second full-text CPU pass at 100 TB
    expect = {
        i for i, _text in rows
        if hashlib.md5(str(i).encode()).hexdigest()[:8] < threshold
    }
    assert {r.doc_id for r in out} == expect
    # rerun is byte-identical (no RNG anywhere)
    assert {r.doc_id for r in TA.sample_to_budget(docs, budgets).collect()} == expect


def test_tfidf_top_terms_orders_by_discriminative_weight(spark):
    rows = [
        (1, "alpha alpha alpha shared shared"),
        (2, "beta beta shared shared shared"),
        (3, "gamma shared"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = TA.tfidf_top_terms(docs, k=1).collect()
    top = {r.doc_id: r.term for r in got}
    # 'shared' has df=3 (idf floor); each doc's unique term wins rank 1
    assert top == {1: "alpha", 2: "beta", 3: "gamma"}
    assert all(r.rank == 1 for r in got)


def test_quality_weighted_sample_rates_and_determinism(spark):
    """Keep probability interpolates with quality: a long natural-English
    doc gets a higher rate than a short stopword-free one, and the md5 keep
    test mirrors the python rule exactly."""
    natural = "the cat sat of the mat and a dog ran to the park in town " * 4
    rows = [(i, natural) for i in range(100)] + [
        (i, "xyzzy plugh") for i in range(100, 200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in TA.quality_weighted_sample(docs).collect()}
    hi = next(r for i, r in out.items() if i < 100)
    lo = next((r for i, r in out.items() if i >= 100), None)
    assert hi.rate > 0.9  # 64 words, stopword-rich -> near the high end
    if lo is not None:
        assert lo.rate < 0.2  # 2 words, zero stopwords -> near the floor
    # survivors match the python-side rule exactly
    for i, r in out.items():
        t = format(min(int(r.rate * 2**32), 2**32 - 1), "08x")
        assert hashlib.md5(str(i).encode()).hexdigest()[:8] < t
    # rerun is byte-identical
    again = {r.doc_id for r in TA.quality_weighted_sample(docs).collect()}
    assert again == set(out)


@pytest.fixture(scope="module")
def web_docs(spark):
    """60 docs over 3 domains (one hot: 40 docs) with a lang column."""
    rows = [
        (i,
         f"document body number {i} with some words",
         ["en", "zh", "fr", "es"][i % 4],
         "hot.example" if i < 40 else ("a.example" if i < 50 else "b.example"))
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_domain_cap_exact_and_partition_invariant(spark, web_docs):
    """The two-phase (domain, pid) pre-prune must be byte-identical to the
    naive single-window top-N, at every physical partitioning."""
    from pyspark.sql import Window, functions as F

    rk = F.md5(F.col("doc_id").cast("string"))
    naive = {
        (r.doc_id, r.domain, r.domain_rank)
        for r in web_docs.select(
            "doc_id", F.col("source").alias("domain"), rk.alias("rk")
        )
        .withColumn(
            "domain_rank",
            F.row_number()
            .over(Window.partitionBy("domain").orderBy("rk", "doc_id"))
            .cast("int"),
        )
        .filter("domain_rank <= 7")
        .drop("rk")
        .collect()
    }
    for n_parts in (1, 3, 16):
        got = {
            (r.doc_id, r.domain, r.domain_rank)
            for r in TA.domain_cap(
                web_docs.repartition(n_parts), max_per_domain=7
            ).collect()
        }
        assert got == naive
    # the cap holds: hot domain trimmed 40 -> 7, small domain b kept whole
    per_dom = {}
    for _, dom, _ in naive:
        per_dom[dom] = per_dom.get(dom, 0) + 1
    assert per_dom == {"hot.example": 7, "a.example": 7, "b.example": 7}


def test_domain_cap_keeps_small_domains_whole(spark, web_docs):
    got = TA.domain_cap(web_docs, max_per_domain=25).groupBy("domain").count()
    assert {r.domain: r["count"] for r in got.collect()} == {
        "hot.example": 25, "a.example": 10, "b.example": 10}


def test_upsample_mix_copy_counts_and_determinism(spark, web_docs):
    """floor(f) copies always emit; the fractional extra follows the md5
    threshold exactly; absent strata emit nothing; epochs number 1..n."""
    import hashlib

    factors = {"en": 2.5, "zh": 1.0, "fr": 0.25}
    out = TA.upsample_mix(web_docs, factors).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    langs = {r.doc_id: r.lang for r in web_docs.select("doc_id", "lang").collect()}
    for doc_id, lang in langs.items():
        f = factors.get(lang, 0.0)
        frac = f - int(f)
        thr = format(min(int(frac * 4294967296.0), 4294967295), "08x")
        expect = int(f) + (
            1 if hashlib.md5(str(doc_id).encode()).hexdigest()[:8] < thr else 0
        )
        got = sorted(by_doc.get(doc_id, []))
        assert got == list(range(1, expect + 1)), (doc_id, lang, f)
    # es absent from factors -> zero copies
    assert all(langs[d] != "es" for d in by_doc)
    # deterministic under repartition
    again = {
        (r.doc_id, r.epoch)
        for r in TA.upsample_mix(web_docs.repartition(11), factors).collect()
    }
    assert again == {(r.doc_id, r.epoch) for r in out}
