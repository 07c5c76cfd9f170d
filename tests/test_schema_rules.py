"""DeclaredSchema validation stage (reference P6: type/nullable/pattern/
default, src/schema.rs:63-164) — dedicated unit coverage beyond the
oracle query."""

import pytest

from tinyetl_spark.schema import DeclaredSchema


def make(spark):
    return spark.createDataFrame(
        [(1, "click", "3.5"), (2, "HACK", None), (3, None, "7"), (None, "view", "x")],
        "id long, kind string, amount string")


DECL = {"columns": {
    "id": {"type": "long", "nullable": False},
    "kind": {"type": "string", "pattern": "^(click|view)$"},
    "amount": {"type": "string", "default": "0"},
}}


def test_drop_mode_quarantines_bad_rows(spark):
    out = DeclaredSchema.from_dict(DECL).apply(make(spark), on_violation="drop")
    rows = {r["id"]: r for r in out.collect()}
    # id=2 dropped (pattern), id=None dropped (non-nullable)
    assert set(rows) == {1, 3}
    assert rows[3]["kind"] is None          # null passes the pattern check
    assert rows[1]["amount"] == "3.5"


def test_error_mode_halts_on_first_violation(spark):
    with pytest.raises(ValueError, match="schema validation failed"):
        DeclaredSchema.from_dict(DECL).apply(make(spark)).collect()


def test_defaults_fill_nulls_before_validation(spark):
    out = DeclaredSchema.from_dict(DECL).apply(
        make(spark).filter("id in (1, 3)"))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[3]["amount"] == "7"
    good = spark.createDataFrame([(9, "view", None)],
                                 "id long, kind string, amount string")
    got = DeclaredSchema.from_dict(DECL).apply(good).first()
    assert got["amount"] == "0"             # default applied


def test_missing_column_materializes_as_default_or_null(spark):
    df = spark.createDataFrame([(5, "click")], "id long, kind string")
    out = DeclaredSchema.from_dict(DECL).apply(df)
    r = out.first()
    assert r["amount"] == "0" and out.columns == ["id", "kind", "amount"]


def test_type_casting_and_projection(spark):
    decl = {"columns": {"id": {"type": "long"}, "flag": {"type": "boolean"}}}
    df = spark.createDataFrame([("7", "true", "extra")],
                               "id string, flag string, junk string")
    out = DeclaredSchema.from_dict(decl).apply(df)
    r = out.first()
    assert r["id"] == 7 and r["flag"] is True
    assert out.columns == ["id", "flag"]    # extras projected away
