"""Pure-Python Avro Object Container File reader/writer.

Reference surface: TinyETL's Avro connector
(/root/reference/src/connectors/avro.rs:233-400 read, 403-700 write).
Spark normally covers this with the spark-avro data source; this sandbox
has no spark-avro jar and no network, so this module implements the
container-file format from the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) and distributes it
Spark-natively:

- **read**: ``spark.read.format("binaryFile")`` over ``*.avro`` →
  ``mapInPandas`` decode per file (parallelism = per-file, like the
  reference's whole-file reader);
- **write**: ``df.mapInPandas`` writes one container file per partition
  into the target directory (shared-FS contract, same as parquet).

``read_avro``/``write_avro`` are the no-jar fallback wired into
``read_source``/``write_sink``; when spark-avro IS on the classpath the
dispatcher prefers it. Format conformance is proven in
tests/test_avro.py by round-tripping through the JVM Avro library
(avro-1.12.1.jar ships with Spark) via py4j.

Supported types (the reference's matrix, avro.rs:233-400): boolean, int,
long, float, double, string, bytes, date, timestamp(-micros, both tz and
ntz), and arrays thereof; every field nullable via union ["null", T].
Complex values follow the reference's flatten-on-read contract
(avro.rs:105-144): ``map``/``record`` decode to compact JSON strings
(bytes inside become JSON int arrays, temporal values ISO strings),
``enum`` decodes to its symbol string, ``fixed`` to binary. Named-type
references and multi-branch unions inside those values are resolved.
Codecs: null, deflate (raw zlib — the spec's required pair).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, BinaryType, BooleanType, DataType,
                               DateType, DoubleType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType,
                               TimestampNTZType, TimestampType)

MAGIC = b"Obj\x01"

# ------------------------------------------------------------ schema bridge

_SPARK_TO_AVRO = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "string": "string",
    "binary": "bytes",
}


def _avro_type_of(dt: DataType):
    name = dt.typeName()
    if name in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[name]
    if name == "date":
        return {"type": "int", "logicalType": "date"}
    if name == "timestamp":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if name == "timestamp_ntz":
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if name == "array":
        return {"type": "array", "items": _avro_type_of(dt.elementType)}
    raise ValueError(f"avro_py: unsupported Spark type {name}")


def spark_to_avro_schema(schema: StructType, name: str = "topLevelRecord") -> dict:
    return {"type": "record", "name": name, "fields": [
        {"name": f.name, "type": ["null", _avro_type_of(f.dataType)],
         "default": None}
        for f in schema.fields]}


_PRIM_SPARK = {"boolean": BooleanType(), "int": IntegerType(),
               "long": LongType(), "float": FloatType(),
               "double": DoubleType(), "string": StringType(),
               "bytes": BinaryType()}


def _collect_named(at, reg: dict) -> None:
    """Register record/enum/fixed definitions by name so later references
    by bare name (the spec's named-type reuse) resolve."""
    if isinstance(at, list):
        for t in at:
            _collect_named(t, reg)
    elif isinstance(at, dict):
        t = at.get("type")
        if t in ("record", "enum", "fixed") and "name" in at:
            reg[at["name"]] = at
        if t == "record":
            for f in at.get("fields", []):
                _collect_named(f["type"], reg)
        elif t == "array":
            _collect_named(at.get("items"), reg)
        elif t == "map":
            _collect_named(at.get("values"), reg)


def _spark_type_of(at, names: dict | None = None) -> DataType:
    names = names or {}
    if isinstance(at, str) and at in names:
        at = names[at]                            # named-type reference
    if isinstance(at, list):                      # union — strip null branch
        non_null = [t for t in at if t != "null"]
        if len(non_null) != 1:
            # multi-branch union: one Spark type when all branches agree,
            # else flatten every value to a JSON string (the reference
            # unwraps unions per VALUE into a dynamically-typed cell,
            # avro.rs:109 — a fixed-schema column can't, so it stringifies)
            kinds = {_spark_type_of(t, names).simpleString() for t in non_null}
            if len(kinds) > 1:
                return StringType()
        return _spark_type_of(non_null[0], names)
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "date":
            return DateType()
        if lt == "timestamp-micros":
            return TimestampType()
        if lt == "local-timestamp-micros":
            return TimestampNTZType()
        t = at.get("type")
        if t == "array":
            return ArrayType(_spark_type_of(at["items"], names))
        if t in ("map", "record", "enum"):
            # reference flatten-on-read contract (avro.rs:105-144):
            # map/record -> JSON string, enum -> its symbol
            return StringType()
        if t == "fixed":
            return BinaryType()
        return _spark_type_of(t, names)
    if at in _PRIM_SPARK:
        return _PRIM_SPARK[at]
    raise ValueError(f"avro_py: unsupported avro type {at!r}")


def avro_to_spark_schema(avro_schema: dict) -> StructType:
    if avro_schema.get("type") != "record":
        raise ValueError("avro_py: top-level schema must be a record")
    names: dict = {}
    _collect_named(avro_schema, names)
    return StructType([
        StructField(f["name"], _spark_type_of(f["type"], names), True)
        for f in avro_schema["fields"]])


# --------------------------------------------------------------- primitives

def _write_long(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)                       # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(mv, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encoder_for(at):
    """value-encoder for a NON-NULL avro type (unions handled by caller)."""
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "date":
            def enc(buf, v):
                import datetime
                if hasattr(v, "date") and not isinstance(v, datetime.date):
                    v = v.date()
                _write_long(buf, (v - datetime.date(1970, 1, 1)).days)
            return enc
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            def enc(buf, v):
                import pandas as pd
                _write_long(buf, pd.Timestamp(v).value // 1000)
            return enc
        if at.get("type") == "array":
            item = _encoder_for(at["items"])

            def enc(buf, v):
                v = list(v)
                if v:
                    _write_long(buf, len(v))
                    for x in v:
                        item(buf, x)
                _write_long(buf, 0)
            return enc
        return _encoder_for(at["type"])
    if at == "boolean":
        return lambda buf, v: buf.append(1 if v else 0)
    if at in ("int", "long"):
        return lambda buf, v: _write_long(buf, int(v))
    if at == "float":
        return lambda buf, v: buf.extend(struct.pack("<f", float(v)))
    if at == "double":
        return lambda buf, v: buf.extend(struct.pack("<d", float(v)))
    if at == "string":
        def enc(buf, v):
            raw = str(v).encode("utf-8")
            _write_long(buf, len(raw))
            buf.extend(raw)
        return enc
    if at == "bytes":
        def enc(buf, v):
            raw = bytes(v)
            _write_long(buf, len(raw))
            buf.extend(raw)
        return enc
    raise ValueError(f"avro_py: cannot encode type {at!r}")


def _json_default(v):
    """JSON fallbacks inside flattened map/record values: bytes -> int
    array (serde-style), temporal values -> ISO-ish strings."""
    if isinstance(v, (bytes, bytearray)):
        return list(v)
    return str(v)


def _blocked(item_dec, keyed: bool):
    """Decoder for the spec's blocked sequences (arrays and maps)."""
    def dec(mv, pos):
        out = {} if keyed else []
        while True:
            n, pos = _read_long(mv, pos)
            if n == 0:
                break
            if n < 0:                               # block with byte-size
                n = -n
                _, pos = _read_long(mv, pos)
            for _ in range(n):
                if keyed:
                    kl, pos = _read_long(mv, pos)
                    k = bytes(mv[pos:pos + kl]).decode("utf-8")
                    pos += kl
                    out[k], pos = item_dec(mv, pos)
                else:
                    v, pos = item_dec(mv, pos)
                    out.append(v)
        return out, pos
    return dec


def _decoder_raw(at, names: dict):
    """(mv, pos) -> (python value, pos) for ANY avro type — used inside
    flattened map/record values, so complex types stay python-native
    (dict/list/str/bytes) for one json.dumps at the field boundary."""
    if isinstance(at, str) and at in names:
        at = names[at]
    if isinstance(at, list):                        # general union
        branches = [None if t == "null" else _decoder_raw(t, names)
                    for t in at]

        def dec(mv, pos):
            idx, pos = _read_long(mv, pos)
            b = branches[idx]
            return (None, pos) if b is None else b(mv, pos)
        return dec
    if isinstance(at, dict):
        t = at.get("type")
        if t == "map":
            return _blocked(_decoder_raw(at["values"], names), keyed=True)
        if t == "record":
            fds = [(f["name"], _decoder_raw(f["type"], names))
                   for f in at["fields"]]

            def dec(mv, pos):
                row = {}
                for name, d in fds:
                    row[name], pos = d(mv, pos)
                return row, pos
            return dec
        if t == "enum":
            syms = at["symbols"]

            def dec(mv, pos):
                i, pos = _read_long(mv, pos)
                return syms[i], pos
            return dec
        if t == "fixed":
            size = int(at["size"])
            return lambda mv, pos: (bytes(mv[pos:pos + size]), pos + size)
        if t == "array":
            return _blocked(_decoder_raw(at["items"], names), keyed=False)
    return _decoder_for(at, names)                  # logicals + primitives


def _decoder_for(at, names: dict | None = None):
    """(mv, pos) -> (value, pos) producing the SPARK-facing value for a
    field type: unions read their branch index, map/record flatten to a
    compact JSON string (reference avro.rs:105-144), enum to its symbol,
    fixed to bytes."""
    names = names or {}
    if isinstance(at, str) and at in names:
        at = names[at]
    if isinstance(at, list):                        # union incl. null branch
        non_null = [t for t in at if t != "null"]
        mixed = len({_spark_type_of(t, names).simpleString()
                     for t in non_null}) > 1

        def branch_dec(t):
            if not mixed:
                return _decoder_for(t, names)
            raw = _decoder_raw(t, names)            # mixed union -> every

            def dec_json(mv, pos, raw=raw):         # value becomes JSON
                v, pos = raw(mv, pos)
                return json.dumps(v, default=_json_default,
                                  separators=(",", ":")), pos
            return dec_json

        branches = [None if t == "null" else branch_dec(t) for t in at]

        def dec(mv, pos):
            idx, pos = _read_long(mv, pos)
            b = branches[idx]
            return (None, pos) if b is None else b(mv, pos)
        return dec
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "date":
            def dec(mv, pos):
                import datetime
                days, pos = _read_long(mv, pos)
                return datetime.date(1970, 1, 1) + datetime.timedelta(days=days), pos
            return dec
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            def dec(mv, pos):
                import pandas as pd
                us, pos = _read_long(mv, pos)
                return pd.Timestamp(us * 1000), pos
            return dec
        t = at.get("type")
        if t == "array":
            return _blocked(_decoder_for(at["items"], names), keyed=False)
        if t in ("map", "record"):
            raw = _decoder_raw(at, names)

            def dec(mv, pos):
                v, pos = raw(mv, pos)
                return json.dumps(v, default=_json_default,
                                  separators=(",", ":")), pos
            return dec
        if t in ("enum", "fixed"):
            return _decoder_raw(at, names)
        return _decoder_for(t, names)
    if at == "boolean":
        return lambda mv, pos: (bool(mv[pos]), pos + 1)
    if at in ("int", "long"):
        return _read_long
    if at == "float":
        return lambda mv, pos: (struct.unpack_from("<f", mv, pos)[0], pos + 4)
    if at == "double":
        return lambda mv, pos: (struct.unpack_from("<d", mv, pos)[0], pos + 8)
    if at == "string":
        def dec(mv, pos):
            n, pos = _read_long(mv, pos)
            return bytes(mv[pos:pos + n]).decode("utf-8"), pos + n
        return dec
    if at == "bytes":
        def dec(mv, pos):
            n, pos = _read_long(mv, pos)
            return bytes(mv[pos:pos + n]), pos + n
        return dec
    raise ValueError(f"avro_py: cannot decode type {at!r}")


def _union_parts(ft):
    """(nullable, non-null type) of a field type."""
    if isinstance(ft, list):
        non_null = [t for t in ft if t != "null"]
        if len(non_null) != 1:
            raise ValueError(f"avro_py: unsupported union {ft}")
        return "null" in ft, non_null[0]
    return False, ft


# ------------------------------------------------------------ file encoding

def encode_container(pdf, avro_schema: dict, codec: str = "deflate",
                     sync: bytes | None = None) -> bytes:
    """pandas DataFrame -> avro container file bytes."""
    import numpy as np
    import pandas as pd
    sync = sync or os.urandom(16)
    head = bytearray()
    head.extend(MAGIC)
    meta = {"avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(head, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(head, len(kb))
        head.extend(kb)
        _write_long(head, len(v))
        head.extend(v)
    _write_long(head, 0)
    head.extend(sync)

    fields = avro_schema["fields"]
    cols = []
    for f in fields:
        nullable, t = _union_parts(f["type"])
        is_array = isinstance(t, dict) and t.get("type") == "array"
        cols.append((f["name"], nullable, is_array, _encoder_for(t)))

    body = bytearray()
    n = len(pdf)
    series = {name: pdf[name] for name, *_ in cols}
    for i in range(n):
        for name, nullable, is_array, enc in cols:
            v = series[name].iloc[i]
            if is_array:
                is_null = v is None or (np.isscalar(v) and pd.isna(v))
            else:
                is_null = v is None or pd.isna(v)
            if nullable:
                if is_null:
                    _write_long(body, 0)
                    continue
                _write_long(body, 1)
            enc(body, v)
    payload = zlib.compress(bytes(body))[2:-4] if codec == "deflate" else bytes(body)
    block = bytearray()
    _write_long(block, n)
    _write_long(block, len(payload))
    block.extend(payload)
    block.extend(sync)
    return bytes(head) + bytes(block)


def decode_container(raw: bytes):
    """avro container file bytes -> (avro_schema dict, list[dict] rows)."""
    mv = memoryview(raw)
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("avro_py: bad magic — not an avro container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_long(mv, pos)
        if cnt == 0:
            break
        if cnt < 0:                                 # block form: skip size
            cnt = -cnt
            _, pos = _read_long(mv, pos)
        for _ in range(cnt):
            kl, pos = _read_long(mv, pos)
            k = bytes(mv[pos:pos + kl]).decode()
            pos += kl
            vl, pos = _read_long(mv, pos)
            meta[k] = bytes(mv[pos:pos + vl])
            pos += vl
    sync = bytes(mv[pos:pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    names: dict = {}
    _collect_named(schema, names)
    # the decoder handles the union branch index itself (correct for any
    # branch order, e.g. ["long","null"] as well as ["null","long"])
    fields = [(f["name"], _decoder_for(f["type"], names))
              for f in schema["fields"]]

    rows = []
    end = len(raw)
    while pos < end:
        n, pos = _read_long(mv, pos)
        size, pos = _read_long(mv, pos)
        payload = mv[pos:pos + size]
        pos += size
        if bytes(mv[pos:pos + 16]) != sync:
            raise ValueError("avro_py: sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = memoryview(zlib.decompress(bytes(payload), wbits=-15))
        elif codec != "null":
            raise ValueError(f"avro_py: unsupported codec {codec!r}")
        p = 0
        for _ in range(n):
            row = {}
            for name, dec in fields:
                row[name], p = dec(payload, p)
            rows.append(row)
    return schema, rows


# ---------------------------------------------------------- spark plumbing

def read_avro(spark: SparkSession, uri: str) -> DataFrame:
    """Distributed avro read: binaryFile scan -> per-file python decode."""
    path = uri
    if os.path.isdir(uri):
        path = os.path.join(uri, "*.avro")
    bf = spark.read.format("binaryFile").load(path)
    first = bf.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"avro_py: no avro files at {uri}")
    avro_schema, _ = decode_container(bytes(first[0]["content"]))
    out_schema = avro_to_spark_schema(avro_schema)

    def decode(batches):
        import pandas as pd
        for pdf in batches:
            for raw in pdf["content"]:
                _, rows = decode_container(bytes(raw))
                yield pd.DataFrame(
                    {f.name: [r[f.name] for r in rows] for f in out_schema.fields}
                    if rows else {f.name: [] for f in out_schema.fields})

    return bf.select("content").mapInPandas(decode, schema=out_schema)


def write_avro(df: DataFrame, uri: str, mode: str = "append",
               codec: str = "deflate") -> int:
    """Distributed avro write: one container file per partition into
    ``uri`` (directory). Returns the number of files written."""
    import uuid as _uuid
    if mode == "overwrite" and os.path.isdir(uri):
        for fn in os.listdir(uri):
            if fn.endswith(".avro"):
                os.remove(os.path.join(uri, fn))
    os.makedirs(uri, exist_ok=True)
    avro_schema = spark_to_avro_schema(df.schema)
    job = _uuid.uuid4().hex[:8]

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext
        parts = [pdf for pdf in batches if len(pdf)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            pid = TaskContext.get().partitionId()
            path = os.path.join(uri, f"part-{pid:05d}-{job}.avro")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(encode_container(pdf, avro_schema, codec=codec))
            os.replace(tmp, path)
            yield pd.DataFrame({"path": [path], "rows": [len(pdf)]})

    manifest = df.mapInPandas(write_part, schema="path string, rows long")
    return manifest.count()
