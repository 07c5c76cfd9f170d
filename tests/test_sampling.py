"""Deterministic sampling operators (operators/sampling.py)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.operators import sampling as SA


def _docs(spark, n=400):
    rows = [(i, ["en", "de", "zh", "fr"][i % 4], f"doc {i}")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")


def _py_bucket(i, seed=0):
    return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)


def test_hash_bucket_matches_python_md5(spark):
    got = {r["doc_id"]: r["b"]
           for r in _docs(spark, 50)
           .select("doc_id", SA.hash_bucket(F.col("doc_id"), 7).alias("b"))
           .collect()}
    assert got == {i: _py_bucket(i, 7) for i in range(50)}


def test_bernoulli_partition_invariant_and_exact(spark):
    d = _docs(spark)
    want = sorted(i for i in range(400) if _py_bucket(i) < SA.threshold(0.3))
    for parts in (1, 7):
        got = sorted(r["doc_id"] for r in
                     SA.bernoulli_sample(d.repartition(parts), "doc_id", 0.3)
                     .collect())
        assert got == want
    assert 0.2 < len(want) / 400 < 0.4  # rate roughly honored


def test_bernoulli_nested_subsets(spark):
    """Threshold hashing gives monotone samples: rate 0.1 ⊆ rate 0.5."""
    d = _docs(spark)
    small = {r["doc_id"] for r in
             SA.bernoulli_sample(d, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in
           SA.bernoulli_sample(d, "doc_id", 0.5).collect()}
    assert small < big


def test_seed_changes_selection(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in
         SA.bernoulli_sample(d, "doc_id", 0.3, seed=0).collect()}
    b = {r["doc_id"] for r in
         SA.bernoulli_sample(d, "doc_id", 0.3, seed=1).collect()}
    assert a != b


def test_stratified_rates_and_default(spark):
    d = _docs(spark)
    out = SA.stratified_sample(d, "lang", "doc_id",
                               {"en": 1.0, "de": 0.25}, default_rate=0.0)
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert by_lang["en"] == {i for i in range(400) if i % 4 == 0}
    assert by_lang["de"] == {i for i in range(400) if i % 4 == 1
                             and _py_bucket(i) < SA.threshold(0.25)}
    assert "zh" not in by_lang and "fr" not in by_lang


def test_topk_exact_counts_and_partition_invariance(spark):
    d = _docs(spark)
    want = {}
    for lang_idx, lang in enumerate(["en", "de", "zh", "fr"]):
        ids = [i for i in range(400) if i % 4 == lang_idx]
        want[lang] = sorted(ids, key=lambda i: (_py_bucket(i), i))[:15]
    for parts in (1, 5):
        out = SA.topk_per_stratum(d.repartition(parts), "lang", "doc_id", 15)
        rows = out.collect()
        assert len(rows) == 60
        got = {}
        for r in rows:
            got.setdefault(r["lang"], []).append((r["sample_rank"], r["doc_id"]))
        for lang, pairs in got.items():
            pairs.sort()
            assert [p[1] for p in pairs] == want[lang]
            assert [p[0] for p in pairs] == list(range(1, 16))


def test_topk_small_stratum_keeps_all(spark):
    d = _docs(spark, 10)  # strata of size 2-3
    out = SA.topk_per_stratum(d, "lang", "doc_id", 15)
    assert out.count() == 10


def test_bad_args(spark):
    d = _docs(spark, 4)
    with pytest.raises(ValueError):
        SA.bernoulli_sample(d, "doc_id", 1.5)
    with pytest.raises(ValueError):
        SA.topk_per_stratum(d, "lang", "doc_id", 0)


# --- DSIR importance resampling ---------------------------------------------

def _dsir_corpus(spark):
    """60 'wiki-like' docs (share the target's vocabulary) + 140 'spam'
    docs, plus a tiny target drawn from the wiki vocabulary."""
    wiki_words = ["the", "history", "of", "science", "article", "cited"]
    spam_words = ["buy", "cheap", "pills", "now", "click", "winner"]
    rows = []
    for i in range(200):
        words = wiki_words if i < 60 else spam_words
        text = " ".join(words[(i + j) % len(words)] for j in range(12))
        rows.append((i, text))
    corpus = spark.createDataFrame(rows, "doc_id: long, text: string")
    trows = [(1000 + i,
              " ".join(wiki_words[(i + j) % len(wiki_words)]
                       for j in range(12))) for i in range(10)]
    target = spark.createDataFrame(trows, "doc_id: long, text: string")
    return corpus, target


def test_dsir_weights_separate_target_like_docs(spark):
    corpus, target = _dsir_corpus(spark)
    w = {r["doc_id"]: r["logw_fp"] for r in
         SA.dsir_weights(corpus, target, n_buckets=256).collect()}
    assert len(w) == 200
    wiki = [w[i] for i in range(60)]
    spam = [w[i] for i in range(60, 200)]
    # every target-like doc outweighs every spam doc
    assert min(wiki) > max(spam)


def test_dsir_resample_prefers_target_like_and_is_exact_k(spark):
    corpus, target = _dsir_corpus(spark)
    got = SA.dsir_resample(corpus, target, k=50, n_buckets=256,
                           seed=3).collect()
    ids = {r["doc_id"] for r in got}
    assert len(got) == 50 and len(ids) == 50
    # Gumbel noise spans a few units; the wiki/spam weight gap is huge,
    # so the selection should be (almost) entirely wiki docs.
    assert sum(1 for i in ids if i < 60) >= 45


def test_dsir_partition_and_seed_behavior(spark):
    corpus, target = _dsir_corpus(spark)
    a = sorted(r["doc_id"] for r in
               SA.dsir_resample(corpus, target, 30, n_buckets=256,
                                seed=3).collect())
    b = sorted(r["doc_id"] for r in
               SA.dsir_resample(corpus.repartition(7), target, 30,
                                n_buckets=256, seed=3).collect())
    assert a == b  # partition-independent
    c = sorted(r["doc_id"] for r in
               SA.dsir_resample(corpus, target, 30, n_buckets=256,
                                seed=4).collect())
    assert a != c  # seed matters (noise re-drawn)


def test_dsir_empty_target_and_bad_k(spark):
    corpus, target = _dsir_corpus(spark)
    empty = target.filter(F.col("doc_id") < 0)
    out = SA.dsir_resample(corpus, empty, 5, n_buckets=256)
    assert out.count() == 5  # degenerate but defined: uniform-ish prior
    with pytest.raises(ValueError):
        SA.dsir_resample(corpus, target, 0)


# --- temperature mix rebalancing ---------------------------------------------

def _skewed(spark):
    rows = ([(i, "en") for i in range(300)]
            + [(1000 + i, "de") for i in range(80)]
            + [(2000 + i, "sw") for i in range(20)])
    return spark.createDataFrame(rows, "doc_id: long, lang: string")


def test_temperature_thresholds_rarest_keeps_all(spark):
    d = _skewed(spark)
    thr = {r["lang"]: r["thr"] for r in
           SA.temperature_thresholds(d, "lang", 0.5).collect()}
    assert thr["sw"] == 1 << 32            # rarest: rate 1
    assert thr["en"] < thr["de"] < thr["sw"]
    # en rate should be sqrt(20/300) of sw's
    assert abs(thr["en"] / (1 << 32) - (20 / 300) ** 0.5) < 1e-6


def test_temperature_sample_flattens_mix(spark):
    d = _skewed(spark)
    from collections import Counter
    got = Counter(r["lang"] for r in
                  SA.temperature_sample(d, "lang", "doc_id", 0.5).collect())
    assert got["sw"] == 20                 # kept whole
    # expected en ≈ 300·sqrt(20/300) ≈ 77, de ≈ 80·sqrt(20/80) = 40
    assert 55 <= got["en"] <= 100 and 25 <= got["de"] <= 55
    # alpha=1 keeps everything
    assert SA.temperature_sample(d, "lang", "doc_id", 1.0).count() == 400


def test_temperature_partition_invariant_and_bad_alpha(spark):
    d = _skewed(spark)
    a = sorted(r["doc_id"] for r in
               SA.temperature_sample(d, "lang", "doc_id", 0.3).collect())
    b = sorted(r["doc_id"] for r in
               SA.temperature_sample(d.repartition(7), "lang", "doc_id",
                                     0.3).collect())
    assert a == b
    with pytest.raises(ValueError):
        SA.temperature_sample(d, "lang", "doc_id", 0.0)
