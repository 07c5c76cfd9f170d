"""HTTP(S) source protocol — fetch-to-staging, then the normal readers.

Reference surface: /root/reference/src/protocols/http.rs:30-171 — GET with
custom headers, Basic/Bearer auth, and format sniffing from the URL path
or the Content-Type header. The Spark translation: the driver stages the
payload to a local/staging file (the reference does the same download-to-
tempfile), then hands it to ``read_source`` so the usual format dispatch,
schema inference and date sniffing apply.

Scale note: an HTTP endpoint is a single stream — the download itself
cannot be distributed (same limitation as the reference). For large-file
cluster use, stage to a shared filesystem path via ``staging_dir`` so
executors can read the result; the subsequent scan parallelizes normally.
``file://`` URLs work through the same path (used by the no-network test
suite; on a real deployment https works identically through urllib).
"""

from __future__ import annotations

import base64
import os
import shutil
import tempfile
import urllib.request
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

_CT_EXT = {"text/csv": ".csv", "application/json": ".json",
           "application/x-ndjson": ".ndjson",
           "application/vnd.apache.parquet": ".parquet",
           "application/octet-stream": ""}


def _sniff_ext(url: str, content_type: str | None, head: bytes) -> str:
    ext = os.path.splitext(urlparse(url).path)[1].lower()
    if ext in (".csv", ".tsv", ".json", ".ndjson", ".parquet", ".avro"):
        return ext
    if content_type:
        ct = content_type.split(";")[0].strip().lower()
        if ct in _CT_EXT and _CT_EXT[ct]:
            return _CT_EXT[ct]
    if head.startswith(b"PAR1"):
        return ".parquet"
    if head.startswith(b"Obj\x01"):
        return ".avro"
    if head.lstrip()[:1] in (b"{", b"["):
        return ".json"
    return ".csv"                                    # reference default


def fetch_to_staging(url: str, headers: dict | None = None,
                     basic_auth: tuple[str, str] | None = None,
                     bearer_token: str | None = None,
                     staging_dir: str | None = None,
                     timeout: int = 60) -> str:
    """Download ``url`` to a staging file; returns the local path (with a
    format-sniffed extension so ``read_source`` dispatches correctly)."""
    req = urllib.request.Request(url)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    if basic_auth:
        tok = base64.b64encode(f"{basic_auth[0]}:{basic_auth[1]}".encode()).decode()
        req.add_header("Authorization", f"Basic {tok}")
    elif bearer_token:
        req.add_header("Authorization", f"Bearer {bearer_token}")
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="tinyetl_http_")
    os.makedirs(staging_dir, exist_ok=True)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        head = resp.read(64)
        ct = resp.headers.get("Content-Type") if hasattr(resp, "headers") else None
        ext = _sniff_ext(url, ct, head)
        fd, path = tempfile.mkstemp(suffix=ext, dir=staging_dir)
        with os.fdopen(fd, "wb") as out:
            out.write(head)
            shutil.copyfileobj(resp, out)
    return path


def read_http(spark: SparkSession, url: str, options: dict | None = None,
              **read_kwargs) -> DataFrame:
    """GET → staging file → ``read_source`` (format dispatch + inference).

    Options understood (string-valued, from job YAML): ``header.<Name>``,
    ``basic_user`` + ``basic_password``, ``bearer_token``,
    ``staging_dir``."""
    from tinyetl_spark.sources.files import read_source
    options = dict(options or {})
    headers = {k[len("header."):]: v for k, v in options.items()
               if k.startswith("header.")}
    basic = None
    if "basic_user" in options:
        basic = (options.pop("basic_user"), options.pop("basic_password", ""))
    path = fetch_to_staging(
        url, headers=headers or None, basic_auth=basic,
        bearer_token=options.pop("bearer_token", None),
        staging_dir=options.pop("staging_dir", None))
    passthrough = {k: v for k, v in options.items()
                   if not k.startswith("header.")}
    return read_source(spark, path, options=passthrough, **read_kwargs)
