"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
at sf0.01, compare row count / column names / values (columns sorted by
name, rows sorted by all columns, driver-tolerated dtype widenings
applied). Usage:

    python tools/oracle_check.py [query ...]      # default: all
"""

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tinyetl_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import datetime as _dt
            first = df[c].dropna()
            if len(first) and isinstance(first.iloc[0], _dt.date) \
                    and not isinstance(first.iloc[0], _dt.datetime):
                # Spark DateType -> datetime.date objects; DuckDB DATE ->
                # datetime64 — same values, different carriers
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
                continue
            # decimal.Decimal from DuckDB etc.
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, sdf, sql, con):
    s = _norm(sdf.toPandas())
    o = _norm(con.execute(sql).df())
    out = {"name": name, "spark_rows": len(s), "oracle_rows": len(o),
           "rows_match": len(s) == len(o),
           "schema_match": list(s.columns) == list(o.columns)}
    if not out["schema_match"]:
        out["spark_cols"] = list(s.columns)
        out["oracle_cols"] = list(o.columns)
        return out
    if not out["rows_match"]:
        return out
    bad = []
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = np.allclose(a.astype("float64"), b.astype("float64"),
                             rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = a.equals(b.astype(a.dtype)) if a.dtype != b.dtype else a.equals(b)
        if not ok:
            bad.append(c)
    out["hash_match"] = not bad
    if bad:
        out["bad_cols"] = bad
        c = bad[0]
        m = (s[c] != o[c]) if s[c].dtype.kind != "f" else ~np.isclose(
            s[c].astype("float64"), o[c].astype("float64"), rtol=0, atol=1e-9)
        out["example"] = {"col": c,
                          "spark": s[c][m].head(3).tolist(),
                          "oracle": o[c][m].head(3).tolist()}
    return out


def main():
    want = sys.argv[1:]
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = 0
    for name, fn in queries.items():
        if want and name not in want:
            continue
        sql = oracles.get(name)
        if sql is None:
            print(json.dumps({"name": name, "err": "no_oracle"}))
            continue
        try:
            r = compare(name, fn(spark, SF), sql, con)
        except Exception as e:  # noqa: BLE001 - report and continue
            r = {"name": name, "err": f"{type(e).__name__}: {e}"[:400]}
        ok = r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
        if not ok:
            fails += 1
        print(json.dumps(r, default=str))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
