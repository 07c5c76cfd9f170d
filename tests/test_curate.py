"""Curation funnel (tinyetl_spark/curate.py) and the `curate` CLI."""

import os

import pytest

from tinyetl_spark.curate import curate_corpus


GOOD = ("the quick brown fox jumps over the lazy dog and naps in the "
        "warm sun of a long afternoon in the quiet valley")


@pytest.fixture()
def corpus(spark):
    rows = (
        [(i, GOOD + f" take {i} of the story") for i in range(20)]
        # exact dup of doc 3
        + [(100, GOOD + " take 3 of the story")]
        # junk: repetition
        + [(200, "\n".join(["spam line"] * 6))]
        # PII in an otherwise-good doc
        + [(300, GOOD + " take 300 with mail bob@example.com attached")]
    )
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_funnel_stages_and_counts(spark, corpus):
    bench = spark.createDataFrame(
        [(GOOD + " take 7 of the story",)], "text: string")
    res = curate_corpus(corpus, quality_params={"min_words": 10},
                        redact_pii=True, dedup="exact",
                        bench=bench, ngram=28, sample_rate=None)
    funnel = dict(res.funnel())
    assert funnel["input"] == 23
    assert funnel["quality"] == 22          # repetition doc rejected
    assert funnel["pii_redact"] == 22       # redaction never drops rows
    assert funnel["dedup_exact"] == 21      # doc 100 collapses into 3
    assert funnel["decontaminate"] == 20    # doc 7 quoted by the bench
    ids = sorted(r["doc_id"] for r in res.df.collect())
    assert 100 not in ids and 200 not in ids and 7 not in ids
    # PII got scrubbed in place, schema unchanged
    red = res.df.filter("doc_id = 300").first()["text"]
    assert "[EMAIL]" in red and "bob@example.com" not in red
    assert res.df.columns == ["doc_id", "text"]


def test_sampling_stage_is_deterministic(spark, corpus):
    a = curate_corpus(corpus, quality=False, dedup="off",
                      sample_rate=0.5, seed=7).df
    b = curate_corpus(corpus.repartition(5), quality=False, dedup="off",
                      sample_rate=0.5, seed=7).df
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())
    assert 0 < a.count() < 23


def test_cluster_dedup_mode(spark):
    # three exact copies: the LSH is guaranteed to pair them, and the
    # 0~1, 1~2, 0~2 edges collapse to one component (chain semantics are
    # covered in test_components on explicit edges)
    rows = [(i, GOOD) for i in range(3)] + [(10, "unrelated words only")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    res = curate_corpus(df, quality=False, dedup="cluster")
    assert sorted(r["doc_id"] for r in res.df.collect()) == [0, 10]


def test_bad_dedup_mode_raises(spark, corpus):
    with pytest.raises(ValueError, match="unknown dedup mode"):
        curate_corpus(corpus, dedup="fuzzy")


def test_cli_curate(spark, corpus, tmpdir_path):
    from tinyetl_spark.cli import main
    # extension names the format (bare dirs mean the eventlog source)
    src = os.path.join(tmpdir_path, "in.parquet")
    dst = os.path.join(tmpdir_path, "out")
    corpus.write.parquet(src)
    rc = main(["curate", src, dst, "--min-words", "10",
               "--redact-pii", "--dedup", "exact"])
    assert rc == 0
    back = spark.read.parquet(dst)
    assert back.count() == 21
    assert back.columns == ["doc_id", "text"]


def test_blocklist_and_nfc_stages(spark):
    rows = [
        (1, "https://ok.org/a", GOOD + " one"),
        (2, "https://bad.example/x", GOOD + " two"),      # exact block
        (3, "https://sub.bad.example/y", GOOD + " three"),  # subdomain
        (4, "https://notbad.example/z",
         GOOD + " café four"),                        # decomposed
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    res = curate_corpus(df, blocklist=["bad.example"], nfc=True,
                        quality_params={"min_words": 10}, dedup="exact")
    funnel = dict(res.funnel())
    assert funnel["input"] == 4
    assert funnel["blocklist"] == 2          # docs 2 and 3 dropped
    assert "nfc" in funnel                   # stage ran, no row change
    ids = sorted(r["doc_id"] for r in res.df.collect())
    assert ids == [1, 4]
    t4 = res.df.filter("doc_id = 4").first()["text"]
    assert "café" in t4 and "café" not in t4
    assert res.df.columns == ["doc_id", "url", "text"]


def test_nfc_merges_decomposed_duplicates(spark):
    """Composed and decomposed spellings of the SAME doc must collapse
    to one row once nfc=True runs before exact dedup."""
    rows = [(1, GOOD + " café story"),
            (2, GOOD + " café story")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    no_nfc = curate_corpus(df, quality_params={"min_words": 10},
                           dedup="exact")
    with_nfc = curate_corpus(df, nfc=True,
                             quality_params={"min_words": 10},
                             dedup="exact")
    assert no_nfc.df.count() == 2
    assert with_nfc.df.count() == 1


def test_dedup_lines_stage_strips_boilerplate(spark):
    """Docs 1 and 2 share a boilerplate line (doc 1 keeps it, being
    globally first); doc 3 is ALL duplicated lines so the pass leaves it
    empty and the stage drops it as pure boilerplate."""
    body1 = GOOD + " take one of the story"
    body2 = GOOD + " take two of the story"
    rows = [
        (1, "HOME | ABOUT\n" + body1),
        (2, "HOME | ABOUT\n" + body2),
        (3, body1),                      # every line already seen
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate_corpus(df, dedup_lines=True, dedup="exact",
                        quality_params={"min_words": 5})
    funnel = dict(res.funnel())
    assert funnel["dedup_lines"] == 2        # doc 3 emptied -> dropped
    assert funnel["dedup_exact"] == 2
    texts = {r["doc_id"]: r["text"] for r in res.df.collect()}
    assert texts[1] == "HOME | ABOUT\n" + body1   # first keeps everything
    assert texts[2] == body2                      # boilerplate stripped
    assert 3 not in texts


def test_dedup_spans_stage_removes_cross_doc_spans(spark):
    """Docs 1 and 2 share a 6-token slogan mid-text that does NOT align
    to a line boundary (line dedup would miss it); the span pass removes
    it from BOTH (all occurrences), and a doc that is nothing but the
    shared span empties out and drops."""
    slogan = "subscribe now to our premium newsletter today"   # 7 tokens
    rows = [
        (1, GOOD + " " + slogan + " take one of the story"),
        (2, GOOD + " " + slogan + " take two of the story"),
        (3, slogan),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate_corpus(df, dedup_spans=6, dedup="off", quality=False)
    funnel = dict(res.funnel())
    assert funnel["dedup_spans"] == 2            # doc 3 emptied -> dropped
    texts = {r["doc_id"]: r["text"] for r in res.df.collect()}
    # the whole shared prefix (GOOD + slogan + the common "take") is
    # covered by cross-doc 6-grams and goes from both docs; only the
    # tokens after the first doc-unique word survive
    assert texts[1] == "one of the story"
    assert texts[2] == "two of the story"
    assert 3 not in texts


def test_lm_filter_stage_drops_outlier_docs(spark):
    # 20 in-distribution docs + one gibberish doc whose tokens are all
    # out-of-vocab for an LM trained on the corpus itself
    rows = [(i, GOOD + f" take {i}") for i in range(20)]
    rows.append((900, "zxq vvk qqj xxo wploc mmzr kkt yyb zzgr hhq pqw "
                      "rrt eez uui oopml ppq"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    res = curate_corpus(df, quality=False, dedup="off",
                        lm_max_nll=4.0, lm_vocab_k=30)
    names = [n for n, _ in res.stages]
    assert "lm_filter" in names
    kept = {r["doc_id"] for r in res.df.collect()}
    assert 900 not in kept
    assert len(kept) == 20

    # CLI flag wiring
    from tinyetl_spark.cli import main
    import tempfile
    d = tempfile.mkdtemp()
    src, dst = f"{d}/in.parquet", f"{d}/out"
    df.write.parquet(src)
    rc = main(["curate", src, dst, "--no-quality", "--dedup", "off",
               "--max-nll", "4.0", "--lm-vocab-k", "30", "--no-report"])
    assert rc == 0
    assert spark.read.parquet(dst).count() == 20
