"""Gopher/C4 quality-filter rules (operators/quality.py) and benchmark
decontamination (operators/decontam.py)."""

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.operators import decontam as DC
from tinyetl_spark.operators import quality as Q


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [
        (1, "The quick brown fox jumps over the lazy dog and runs away "
            "to the hills of the north"),
        (2, "- bullet one\n- bullet two\n- bullet three\nplain tail"),
        (3, "first line...\nsecond line...\nthird line...\nclean end"),
        (4, "repeat me\nrepeat me\nrepeat me\nunique line"),
        (5, "short\n\n  \nshort"),            # blank lines ignored, dup pair
        (6, ""),                               # empty doc
        (7, "### markup #### heavy ## doc with ... lots ... of symbols"),
        (8, "a b c d e f g 1 2 3 !! ?? ,, .."),   # low alpha-word fraction
    ])


def _one(df, doc_id):
    return df.filter(F.col("doc_id") == doc_id).collect()[0].asDict()


def test_line_structure_rules(spark, corpus):
    m = Q.gopher_metrics(corpus)
    r2 = _one(m, 2)
    assert r2["bullet_line_frac"] == 0.75
    r3 = _one(m, 3)
    assert r3["ellipsis_line_frac"] == 0.75
    r4 = _one(m, 4)
    assert r4["dup_line_frac"] == 0.5          # 4 lines, 2 survive distinct
    # dup char mass: 3x"repeat me"(9) + "unique line"(11) = 38 total,
    # distinct = 20, repeated mass 18/38
    assert r4["dup_line_char_frac"] == round(18 / 38, 6)


def test_blank_lines_ignored_and_empty_doc(spark, corpus):
    m = Q.gopher_metrics(corpus)
    r5 = _one(m, 5)
    assert r5["dup_line_frac"] == 0.5          # 2 non-empty lines, 1 distinct
    r6 = _one(m, 6)
    assert r6["n_words"] == 0
    assert r6["dup_line_frac"] == 0.0          # empty: no lines, no dups
    assert r6["dup_line_char_frac"] == 0.0
    assert r6["mean_word_len"] == 0.0


def test_symbol_and_alpha_rules(spark, corpus):
    m = Q.gopher_metrics(corpus)
    r7 = _one(m, 7)
    # 9 '#' chars + 2 '...' runs over 12 words
    assert r7["symbol_word_ratio"] == round(11 / 12, 6)
    r8 = _one(m, 8)
    assert r8["alpha_word_frac"] == round(7 / 14, 6)


def test_symbol_overlap_is_left_greedy(spark):
    # '....' contains ONE non-overlapping '...' in both engines
    d = _docs(spark, [(1, "w ....")])
    assert _one(Q.gopher_metrics(d), 1)["symbol_word_ratio"] == 0.5


def test_keep_is_conjunction_and_overrides(spark, corpus):
    out = Q.gopher_keep(corpus, min_words=3)
    r1 = _one(out, 1)
    assert r1["keep"] and all(r1[k] for k in r1 if k.startswith("ok_"))
    r4 = _one(out, 4)
    assert not r4["ok_dup_lines"] and not r4["keep"]
    # loosening the one violated rule flips keep for the dup doc only
    loose = Q.gopher_keep(corpus, min_words=3, max_dup_line_frac=1.0,
                          max_dup_line_char_frac=1.0, min_stop_hits=0)
    assert _one(loose, 4)["keep"]


def test_dedup_lines_keeps_first_occurrence(spark):
    d = _docs(spark, [(1, "b\na\nb\nc\na")])
    got = d.select(Q.dedup_lines(F.col("text")).alias("t")).first()["t"]
    assert got == "b\na\nc"


# ----------------------------------------------------- decontamination

def test_ngram_count_and_short_docs(spark):
    d = _docs(spark, [(1, "one two three four five"), (2, "one two")])
    g = d.select(F.size(DC.ngram_hashes(F.col("text"), 3)).alias("n"))
    assert [r["n"] for r in g.orderBy(F.col("n").desc()).collect()] == [3, 0]


def test_mark_and_remove_contaminated(spark):
    docs = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "zzz alpha beta gamma delta yyy"),      # shares 4-gram with 1
        (3, "totally different words here entirely"),
        (4, "alpha beta gamma"),                     # < n words: never hits
    ])
    bench = docs.filter("doc_id = 1").select("text")
    marked = {r["doc_id"]: r["contaminated"]
              for r in DC.mark_contaminated(docs, bench, n=4).collect()}
    assert marked == {1: True, 2: True, 3: False, 4: False}
    clean = DC.decontaminate(docs, bench, n=4)
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4]
    # column set is preserved on the clean corpus
    assert clean.columns == docs.columns


def test_contamination_plan_is_broadcast_semi_join(spark):
    docs = _docs(spark, [(i, f"w{i} x{i} y{i} z{i} q{i}")
                         for i in range(20)])
    bench = docs.filter("doc_id < 2").select("text")
    plan = (DC.contaminated_ids(docs, bench, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the corpus side must not shuffle before the semi join: the only
    # shuffles allowed are the bench-side distinct (inside the broadcast
    # subtree) and the final distinct over the bounded hit set
    assert plan.count("Exchange hashpartitioning") == 2


# ----------------------------------------------------- PII redaction

def test_pii_redact_all_kinds(spark):
    from tinyetl_spark.operators import pii as P
    d = _docs(spark, [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "server at 10.0.255.7 port open"),
        (3, "call +1 415-555 0199 today"),
        (4, "clean text with no pii at all"),
        (5, "a@b.io via 1.2.3.4 or +49 30 1234567"),
    ])
    out = {r["doc_id"]: r for r in P.redact_frame(d).collect()}
    assert out[1]["text"] == "mail [EMAIL] now" and out[1]["n_email"] == 1
    assert out[2]["text"] == "server at [IP] port open"
    assert out[3]["text"] == "call [PHONE] today" and out[3]["n_phone"] == 1
    assert out[4]["text"] == "clean text with no pii at all"
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    assert out[5]["text"] == "[EMAIL] via [IP] or [PHONE]"


def test_pii_redact_kind_subset_preserves_order(spark):
    from tinyetl_spark.operators import pii as P
    import pyspark.sql.functions as FF
    d = _docs(spark, [(1, "a@b.io via 1.2.3.4")])
    got = d.select(P.redact(FF.col("text"), kinds=("ipv4",)).alias("t")) \
           .first()["t"]
    assert got == "a@b.io via [IP]"


# ----------------------------------------------------- n-gram repetition

def test_repetition_metrics_hand_computed(spark):
    d = _docs(spark, [
        (1, "a b a b a b"),              # top 2-gram "a b" x3, mass 9/11
        (2, "x y z x y z x y z x y z"),  # every 5-gram duplicated
        (3, "all distinct words right here"),
        (4, "a b"),                       # single 2-gram, no 5-grams
        (5, ""),
    ])
    got = {r["doc_id"]: r for r in Q.repetition_metrics(d).collect()}
    assert got[1]["top_ngram_char_frac"] == round(9 / 11, 6)
    assert got[1]["dup_ngram_char_frac"] == 0.0
    # 8 sliding 5-grams over a 4x-repeated triple: counts 3+3+2, len 9
    assert got[2]["dup_ngram_char_frac"] == round(72 / 23, 6)  # > 1 by design
    assert got[3]["dup_ngram_char_frac"] == 0.0
    assert got[3]["top_ngram_char_frac"] < 0.5
    assert got[4]["top_ngram_char_frac"] == 1.0
    assert got[4]["dup_ngram_char_frac"] == 0.0
    assert got[5]["top_ngram_char_frac"] == 0.0
    assert got[5]["dup_ngram_char_frac"] == 0.0


def test_host_rollup_flags_mirror_host(spark):
    from tinyetl_spark.operators.quality import host_rollup
    good = ("the quick brown fox jumps over the lazy dog near the "
            "river bank in the late afternoon light")
    rows = (
        [(f"https://mirror.example/p/{i}", "same mirror page body")
         for i in range(4)]
        + [(f"https://fresh.example/a/{i}", good + f" take {i}")
           for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["url", "text"])
    out = {r["host"]: r for r in host_rollup(df).collect()}
    m, f = out["mirror.example"], out["fresh.example"]
    assert (m["n_docs"], m["n_unique"]) == (4, 1)
    assert m["dup_frac"] == 0.75
    assert (f["n_docs"], f["n_unique"]) == (4, 4)
    assert f["dup_frac"] == 0.0
    assert f["avg_quality"] > m["avg_quality"]   # real text scores higher
    assert f["avg_tokens"] > m["avg_tokens"]


def test_boilerplate_ngrams_ranks_by_document_frequency(spark):
    from tinyetl_spark.operators.quality import boilerplate_ngrams
    rows = [
        (1, "all rights reserved all rights reserved unique alpha"),
        (2, "all rights reserved unique beta content here"),
        (3, "all rights reserved unique gamma content here"),
        (4, "totally different text with nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = boilerplate_ngrams(df, n=3, min_df=2, top_k=5).collect()
    ranked = [(r["gram"], r["df"]) for r in out]
    # doc 1 repeats the phrase but counts ONCE (document frequency)
    assert ranked[0] == ("all rights reserved", 3)
    assert ("content here", 2) not in ranked          # bigram, not trigram
    assert all(r[1] >= 2 for r in ranked)
    # deterministic tie-break: df desc then gram asc
    dfs = [r[1] for r in ranked]
    assert dfs == sorted(dfs, reverse=True)


# ------------------------------------------- semantic decontamination

def _emb(spark):
    """Corpus of unit-ish vectors: ids 0-3 near e1 (paraphrase cluster
    around bench doc 100), ids 4-7 near e2 (clean), bench = {100, 101}
    where 101 is also IN the corpus (self-pair exclusion path)."""
    rows = [
        (0, [1.0, 0.05, 0.0]), (1, [0.98, 0.1, 0.0]),
        (2, [1.0, 0.0, 0.08]), (3, [0.9, 0.2, 0.0]),
        (4, [0.0, 1.0, 0.0]), (5, [0.05, 0.95, 0.1]),
        (6, [0.0, 0.9, 0.3]), (7, [0.1, 0.0, 1.0]),
        (101, [0.0, 0.0, 1.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0])],
        "vec_id: long, embedding: array<double>")
    return corpus, bench


def test_semantic_contaminated_flags_near_bench(spark):
    corpus, bench = _emb(spark)
    out = {r["vec_id"]: (r["contaminated"], r["nearest_bench_id"],
                         r["max_cos"])
           for r in DC.semantic_contaminated(corpus, bench, 0.9).collect()}
    assert len(out) == 9
    for i in (0, 1, 2, 3):          # paraphrase cluster → flagged vs 100
        assert out[i][0] and out[i][1] == 100
    for i in (4, 5, 6):             # clean cluster
        assert not out[i][0]
    # id 7 is cos≈0.99 to bench 101 → flagged by the OTHER bench doc
    assert out[7][0] and out[7][1] == 101
    # id 101 is IN the bench: its self-pair is excluded, nearest is 100
    assert out[101][1] == 100 and not out[101][0]


def test_semantic_contaminated_tie_breaks_to_smallest_bid(spark):
    corpus = spark.createDataFrame([(0, [1.0, 0.0])],
                                   "vec_id: long, embedding: array<double>")
    bench = spark.createDataFrame(
        [(9, [2.0, 0.0]), (5, [3.0, 0.0])],  # both cos=1.0 exactly
        "vec_id: long, embedding: array<double>")
    r = DC.semantic_contaminated(corpus, bench, 0.5).collect()[0]
    assert r["nearest_bench_id"] == 5 and r["contaminated"]


def test_semantic_contaminated_plan_is_map_only(spark):
    """The corpus side must not shuffle: bench packs to one broadcast
    row and the scoring is a projection."""
    corpus, bench = _emb(spark)
    plan = DC.semantic_contaminated(corpus.repartition(4), bench, 0.9) \
             ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan  # no corpus shuffle
