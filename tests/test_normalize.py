"""operators/normalize.py — Unicode NFC + domain blocklist.

Hand-computed expectations throughout; the sf-scale oracle rows are
``text_unicode_nfc`` / ``text_domain_blocklist`` in __spark_entry__.
"""

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.operators import normalize as N


def _texts(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id long, text string")


def test_nfc_composes_and_strips_controls(spark):
    rows = [
        "cafe\u0301",            # e + combining acute -> \u00e9
        "A\u030a ring",          # A + combining ring -> \u00c5
        "\u212bngstrom",         # ANGSTROM SIGN singleton -> \u00c5
        "bell\u0007 tab\tkeeps",  # BEL stripped, tab kept
        "already \u00e9 fine",
        None,
    ]
    out = {r["doc_id"]: r["text_nfc"]
           for r in N.nfc_normalize_frame(_texts(spark, rows)).collect()}
    assert out[0] == "caf\u00e9"
    assert out[1] == "\u00c5 ring"
    assert out[2] == "\u00c5ngstrom"
    assert out[3] == "bell tab\tkeeps"
    assert out[4] == "already \u00e9 fine"
    assert out[5] is None


def test_nfc_matches_python_unicodedata(spark):
    import unicodedata
    rows = ["o\u0323\u0308 mixed", "\ufb01ligature stays",  # NFC != NFKC
            "plain ascii", "e\u0301e\u0301e\u0301"]
    got = [r["text_nfc"]
           for r in N.nfc_normalize_frame(_texts(spark, rows))
                     .orderBy("doc_id").collect()]
    assert got == [unicodedata.normalize("NFC", t) for t in rows]


def test_url_host_and_suffixes(spark):
    df = spark.createDataFrame(
        [("https://Sub.Example.COM:8443/p?q=1",),
         ("http://plain.org/",), ("no-scheme.net/path",)], "url string")
    rows = df.select("url", N.url_host(F.col("url")).alias("h")).collect()
    assert {r["url"]: r["h"] for r in rows} == {
        "https://Sub.Example.COM:8443/p?q=1": "sub.example.com",
        "http://plain.org/": "plain.org",
        "no-scheme.net/path": "no-scheme.net"}
    sufs = (df.filter(F.col("url").startswith("https"))
              .select(N.host_suffixes(N.url_host(F.col("url"))).alias("s"))
              .collect()[0]["s"])
    assert sufs == ["sub.example.com", "example.com", "com"]


BLOCKED = ["bad.example", "tracker.net"]
HOSTS = [
    ("https://bad.example/x", False),          # exact
    ("https://a.bad.example/x", False),        # subdomain
    ("https://notbad.example/x", True),        # not a dot-suffix
    ("https://bad.example.org/x", True),       # blocked dom embedded left
    ("https://sub.tracker.net/x", False),
    ("https://good.org/x", True),
]


def test_blocklist_literal_and_dataframe_paths_agree(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOSTS], "url string")
    expect_kept = sorted(u for u, k in HOSTS if k)
    lit_kept = sorted(r["url"]
                      for r in N.blocklist_filter(df, BLOCKED).collect())
    bl = spark.createDataFrame([(d,) for d in BLOCKED], "domain string")
    df_kept = sorted(r["url"]
                     for r in N.blocklist_filter(df, bl).collect())
    assert lit_kept == expect_kept
    assert df_kept == expect_kept
    # keep_col variants mark instead of filter, same verdicts
    marked = {r["url"]: r["kept"]
              for r in N.blocklist_filter(df, BLOCKED,
                                          keep_col="kept").collect()}
    assert marked == dict(HOSTS)
    marked2 = {r["url"]: r["kept"]
               for r in N.blocklist_filter(df, bl, keep_col="kept").collect()}
    assert marked2 == dict(HOSTS)


def test_blocklist_empty_list_keeps_all(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOSTS], "url string")
    assert N.blocklist_filter(df, []).count() == len(HOSTS)


def test_blocklist_df_path_never_shuffles_corpus_for_probe(spark):
    """The suffix probe must be a broadcast hash join (left_semi) — the
    corpus side of the probe carries no Exchange below it."""
    df = spark.createDataFrame([(u,) for u, _ in HOSTS], "url string")
    bl = spark.createDataFrame([(d,) for d in BLOCKED], "domain string")
    plan = (N.blocklist_filter(df, bl)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_literal_path_is_join_free(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOSTS], "url string")
    plan = (N.blocklist_filter(df, BLOCKED)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "Exchange" not in plan
