"""Avro container-file codec: roundtrip through our reader/writer AND
format-conformance cross-checks against the JVM Avro library
(avro-1.12.1.jar, bundled with Spark) via py4j — an independent
implementation of the same public spec."""

import datetime
import json
import os

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.sources.avro_py import (avro_to_spark_schema,
                                           decode_container, encode_container,
                                           read_avro, spark_to_avro_schema,
                                           write_avro)
from tinyetl_spark.sources.files import read_source, write_sink


def sample_df(spark):
    rows = [
        (1, "ann", 1.5, True, b"\x00\x01", datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
         datetime.date(2023, 5, 6), [0.5, -1.25]),
        (2, None, -2.25, False, None, None, None, None),
        (3, "bob", 0.0, None, b"xyz", datetime.datetime(1969, 12, 31, 23, 59, 59),
         datetime.date(1969, 1, 1), []),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, score double, flag boolean, blob binary, "
              "ts timestamp, d date, vec array<double>")


def as_tuples(df):
    out = []
    for r in df.orderBy("id").collect():
        vec = None if r["vec"] is None else [round(v, 9) for v in r["vec"]]
        out.append((r["id"], r["name"], r["score"], r["flag"],
                    bytes(r["blob"]) if r["blob"] is not None else None,
                    r["ts"], r["d"], vec))
    return out


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip_all_types(spark, tmpdir_path, codec):
    df = sample_df(spark)
    out = f"{tmpdir_path}/rt.avro"
    write_avro(df, out, codec=codec)
    back = read_avro(spark, out)
    assert as_tuples(back) == as_tuples(df)
    # schema survives the trip (names + types)
    assert [(f.name, f.dataType.typeName()) for f in back.schema.fields] == \
           [(f.name, f.dataType.typeName()) for f in df.schema.fields]


def test_write_sink_read_source_dispatch(spark, tmpdir_path):
    """The .avro extension must round-trip through the connector factory
    (spark-avro absent here -> pure-Python fallback engages)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = f"{tmpdir_path}/rt2.avro"
    write_sink(df, out)
    back = read_source(spark, out)
    assert back.count() == 2
    assert {r["s"] for r in back.collect()} == {"a", "b"}


def test_jvm_avro_reads_our_files(spark, tmpdir_path):
    """Format conformance: the reference JVM implementation must parse a
    container file produced by our pure-Python writer."""
    df = sample_df(spark)
    out = f"{tmpdir_path}/ours.avro"
    write_avro(df, out, codec="deflate")
    jvm = spark._jvm
    rows = []
    for fn in sorted(os.listdir(out)):
        if not fn.endswith(".avro"):
            continue
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(os.path.join(out, fn)),
            jvm.org.apache.avro.generic.GenericDatumReader())
        while rdr.hasNext():
            rec = rdr.next()
            name = rec.get("name")
            rows.append((rec.get("id"),
                         None if name is None else str(name),
                         rec.get("score")))
        rdr.close()
    rows.sort()
    assert rows == [(1, "ann", 1.5), (2, None, -2.25), (3, "bob", 0.0)]


def test_our_reader_reads_jvm_files(spark, tmpdir_path):
    """And the other direction: a file written by the JVM library (with
    deflate) must decode through our reader."""
    jvm = spark._jvm
    schema_json = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": ["null", "int"], "default": None},
            {"name": "s", "type": ["null", "string"], "default": None}]})
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    wtr = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    wtr.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = f"{tmpdir_path}/theirs.avro"
    wtr.create(sch, jvm.java.io.File(path))
    for i, s in [(1, "x"), (2, None), (3, "z")]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("id", i)   # py4j ships python ints as java Integer
        rec.put("s", s)
        wtr.append(rec)
    wtr.close()
    back = read_avro(spark, path)
    got = sorted((r["id"], r["s"]) for r in back.collect())
    assert got == [(1, "x"), (2, None), (3, "z")]


def test_jvm_complex_types_flatten_to_json(spark, tmpdir_path):
    """Reference parity (avro.rs:105-144): map/record values flatten to
    compact JSON strings on read, enum to its symbol string, fixed to
    bytes — cross-checked against a container file written by the
    independent JVM avro library (named types + nested union included)."""
    jvm = spark._jvm
    schema_json = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": "int"},
            {"name": "m", "type": ["null", {"type": "map", "values": "string"}],
             "default": None},
            {"name": "rec", "type": ["null", {
                "type": "record", "name": "inner", "fields": [
                    {"name": "a", "type": "string"},
                    {"name": "b", "type": ["null", "long"], "default": None}]}],
             "default": None},
            {"name": "e", "type": {"type": "enum", "name": "color",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
        ]})
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    gd = jvm.org.apache.avro.generic.GenericData
    wtr = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    path = f"{tmpdir_path}/complex.avro"
    wtr.create(sch, jvm.java.io.File(path))
    inner_sch = sch.getField("rec").schema().getTypes().get(1)

    def mk(id_, m, rec, sym, fx):
        r = gd.Record(sch)
        r.put("id", id_)
        if m is not None:
            h = jvm.java.util.LinkedHashMap()
            for k, v in m.items():
                h.put(k, v)
            r.put("m", h)
        if rec is not None:
            ir = gd.Record(inner_sch)
            ir.put("a", rec["a"])
            if rec.get("b") is not None:
                ir.put("b", jvm.java.lang.Long.parseLong(str(rec["b"])))
            r.put("rec", ir)
        r.put("e", gd.EnumSymbol(sch.getField("e").schema(), sym))
        r.put("fx", gd.Fixed(sch.getField("fx").schema(), bytearray(fx)))
        wtr.append(r)

    mk(1, {"k1": "v1", "k2": "v2"}, {"a": "x", "b": 2 ** 40}, "RED",
       b"\x00\x01\x02\x03")
    mk(2, None, {"a": "y"}, "BLUE", b"abcd")
    wtr.close()

    back = read_avro(spark, path)
    types = {f.name: f.dataType.typeName() for f in back.schema.fields}
    assert types == {"id": "integer", "m": "string", "rec": "string",
                     "e": "string", "fx": "binary"}
    rows = {r["id"]: r for r in back.collect()}
    assert json.loads(rows[1]["m"]) == {"k1": "v1", "k2": "v2"}
    assert json.loads(rows[1]["rec"]) == {"a": "x", "b": 2 ** 40}
    assert rows[1]["e"] == "RED" and bytes(rows[1]["fx"]) == b"\x00\x01\x02\x03"
    assert rows[2]["m"] is None
    assert json.loads(rows[2]["rec"]) == {"a": "y", "b": None}
    assert rows[2]["e"] == "BLUE" and bytes(rows[2]["fx"]) == b"abcd"


def test_jvm_mixed_union_flattens_to_json(spark, tmpdir_path):
    """A multi-branch union field (["null","int","string"]) becomes a
    string column whose values are JSON-encoded per branch — the Spark
    analogue of the reference's per-value union unwrap (avro.rs:109)."""
    jvm = spark._jvm
    schema_json = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": "int"},
            {"name": "u", "type": ["null", "int", "string"],
             "default": None}]})
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    gd = jvm.org.apache.avro.generic.GenericData
    wtr = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    path = f"{tmpdir_path}/mixed.avro"
    wtr.create(sch, jvm.java.io.File(path))
    for i, v in [(1, 5), (2, "x"), (3, None)]:
        rec = gd.Record(sch)
        rec.put("id", i)
        rec.put("u", v)
        wtr.append(rec)
    wtr.close()
    back = read_avro(spark, path)
    assert back.schema["u"].dataType.typeName() == "string"
    got = {r["id"]: r["u"] for r in back.collect()}
    assert got == {1: "5", 2: '"x"', 3: None}


def test_container_primitives():
    import pandas as pd
    schema = spark_to_avro_schema(
        __import__("pyspark.sql.types", fromlist=["StructType"]).StructType.fromDDL(
            "a long, b string"))
    pdf = pd.DataFrame({"a": [0, -1, 2**40, None], "b": ["", "ü☃", None, "q"]})
    raw = encode_container(pdf, schema, codec="null")
    sch2, rows = decode_container(raw)
    assert avro_to_spark_schema(sch2).fieldNames() == ["a", "b"]
    assert [r["a"] for r in rows] == [0, -1, 2**40, None]
    assert [r["b"] for r in rows] == ["", "ü☃", None, "q"]
