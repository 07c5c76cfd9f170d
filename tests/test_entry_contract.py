"""Replicates the driver's correctness gate: run every queries() entry at
sf0.01 and compare row-count + order-insensitive value content against
oracle_sql() through DuckDB."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return con


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, oracle, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    got_cols = sorted(df.columns)
    got = canon([r.asDict() for r in df.collect()], got_cols)
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(got) > 0, f"{name}: rows-only check needs rows"
        return
    rel = oracle.sql(sql)
    exp_cols_all = list(rel.columns)
    assert sorted(exp_cols_all) == got_cols, f"{name}: column mismatch {exp_cols_all} vs {df.columns}"
    exp_rows = [dict(zip(exp_cols_all, r)) for r in rel.fetchall()]
    exp = canon(exp_rows, got_cols)
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    assert got == exp, f"{name}: value mismatch; first diff: " + next(
        (f"got={g} exp={e}" for g, e in zip(got, exp) if g != e), "tail")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns


def test_registry_cache_lifecycle(spark):
    """A long-lived session running the dedup/LSH family repeatedly must
    hold zero persisted RDDs after the registry-level release_caches()
    (round-5 verdict #8) — leaked caches pin executor memory forever on
    a streaming driver."""
    qs = entrymod.queries()
    for name in ("dedup_minhash_jaccard", "simhash_near_dups"):
        qs[name](spark, SF).count()
        assert len(spark.sparkContext._jsc.getPersistentRDDs()) > 0, \
            f"{name}: expected live caches while the query family is hot"
    released = entrymod.release_caches()
    assert released > 0
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0
    # idempotent: a second release finds nothing
    assert entrymod.release_caches() == 0
