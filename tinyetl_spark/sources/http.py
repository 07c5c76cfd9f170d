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
import http.client
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


_RETRYABLE_CODES = {408, 429, 500, 502, 503, 504}


def fetch_to_staging(url: str, headers: dict | None = None,
                     basic_auth: tuple[str, str] | None = None,
                     bearer_token: str | None = None,
                     staging_dir: str | None = None,
                     timeout: int = 60, retries: int = 3,
                     backoff: float = 0.5) -> str:
    """Download ``url`` to a staging file; returns the local path (with a
    format-sniffed extension so ``read_source`` dispatches correctly).

    Hardened for the large-file driver-side staging path: transient
    failures (connection errors, timeouts, 408/429/5xx) are retried up
    to ``retries`` times with exponential backoff; a mid-stream failure
    resumes with a ``Range`` request from the bytes already staged when
    the server honors it (206), else restarts the body. Permanent HTTP
    errors (4xx other than 408/429) raise immediately. Redirects follow
    urllib's standard handler (bounded at 10 hops)."""
    import time as _time
    import urllib.error

    def _mk_req(extra: dict | None = None) -> urllib.request.Request:
        req = urllib.request.Request(url)
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        if basic_auth:
            tok = base64.b64encode(
                f"{basic_auth[0]}:{basic_auth[1]}".encode()).decode()
            req.add_header("Authorization", f"Basic {tok}")
        elif bearer_token:
            req.add_header("Authorization", f"Bearer {bearer_token}")
        for k, v in (extra or {}).items():
            req.add_header(k, v)
        return req

    staging_dir = staging_dir or tempfile.mkdtemp(prefix="tinyetl_http_")
    os.makedirs(staging_dir, exist_ok=True)
    path: str | None = None
    written = 0
    last_err: Exception | None = None
    for attempt in range(retries + 1):
        if attempt:
            _time.sleep(backoff * (2 ** (attempt - 1)))
        try:
            extra = {"Range": f"bytes={written}-"} if written else None
            with urllib.request.urlopen(_mk_req(extra),
                                        timeout=timeout) as resp:
                status = getattr(resp, "status", 200) or 200
                if written and status != 206:
                    written = 0            # server ignored Range: restart
                clen = None
                if hasattr(resp, "headers"):
                    try:
                        clen = int(resp.headers.get("Content-Length", ""))
                    except (TypeError, ValueError):
                        clen = None
                if path is None:
                    head = resp.read(64)
                    ct = (resp.headers.get("Content-Type")
                          if hasattr(resp, "headers") else None)
                    ext = _sniff_ext(url, ct, head)
                    fd, path = tempfile.mkstemp(suffix=ext, dir=staging_dir)
                    os.close(fd)
                else:
                    head = b"" if written else resp.read(64)
                base = written
                mode = "r+b" if written else "wb"
                with open(path, mode) as out:
                    if written:
                        out.seek(written)
                        out.truncate()
                    out.write(head)
                    shutil.copyfileobj(resp, out)
                    written = out.tell()
                # a dropped connection TRUNCATES silently: read(amt)
                # returns short and then b"" without IncompleteRead —
                # verify against Content-Length and retry-resume short
                # bodies like any other transient failure
                if clen is not None and written - base != clen:
                    raise http.client.IncompleteRead(
                        b"", clen - (written - base))
            return path
        except urllib.error.HTTPError as e:
            last_err = e
            if e.code not in _RETRYABLE_CODES:
                raise
        except (urllib.error.URLError, ConnectionError, TimeoutError,
                OSError, http.client.HTTPException) as e:
            last_err = e
            # a mid-body failure leaves `written` bytes staged — the next
            # attempt resumes from there via Range
            if path is not None and os.path.exists(path):
                written = os.path.getsize(path)
    raise RuntimeError(
        f"http fetch failed after {retries + 1} attempts: {url}"
    ) from last_err


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
