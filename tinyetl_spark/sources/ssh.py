"""SSH/SCP protocol — fetch-to-staging source, upload-after-write sink.

Reference surface: /root/reference/src/protocols/ssh.rs:29-187 —
``ssh://user@host:port/path`` is downloaded with the SYSTEM scp client
(``scp -P port -o StrictHostKeyChecking=no -o UserKnownHostsFile=/dev/null
-q user@host:path local``) into a temp file carrying the remote path's
extension, then handed to the normal format dispatch; targets write
locally first and scp the file up. The Spark translation is the same
staging pattern as :mod:`tinyetl_spark.sources.http`: the driver stages
the payload, then ``read_source`` applies the usual format dispatch,
schema inference and date sniffing.

URL validation mirrors the reference exactly: a host, a username and a
non-root path are all required (ssh.rs raises Configuration errors for
each).

Scale note: like the reference (and like any single scp stream), the
transfer itself is not distributed. For large files point ``staging_dir``
at a shared filesystem so every executor can read the staged copy; the
scan that follows parallelizes normally.

No network in the test suite: ``scp`` is resolved from ``PATH``, so the
tests install a fake ``scp`` executable that serves a local fixture tree
and records its argv — the command construction, URL parsing and error
paths are covered without a server.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

SSH_SCHEMES = ("ssh", "scp", "sftp")


def parse_ssh_url(url: str) -> tuple[str, str, int, str]:
    """-> (user, host, port, remote_path); reference error parity."""
    u = urlparse(url)
    if u.scheme not in SSH_SCHEMES:
        raise ValueError(f"not an ssh url: {url!r}")
    if not u.hostname:
        raise ValueError("SSH URL must specify a host")
    if not u.username:
        raise ValueError("SSH URL must specify a username (ssh://user@host/path)")
    path = unquote(u.path or "")
    if path in ("", "/"):
        raise ValueError("SSH URL must specify a file path")
    return unquote(u.username), u.hostname, u.port or 22, path


def _remote_ext(path: str) -> str:
    """Reference extract_extension_from_path: the last dot-suffix of the
    final path component, <= 10 chars (ssh.rs:156-166)."""
    name = path.rsplit("/", 1)[-1]
    ext = name.rsplit(".", 1)[-1] if "." in name else ""
    return f".{ext.lower()}" if ext and len(ext) <= 10 and ext != name else ""


def _scp_cmd(port: int, identity_file: str | None) -> list[str]:
    cmd = ["scp", "-P", str(port),
           "-o", "StrictHostKeyChecking=no",
           "-o", "UserKnownHostsFile=/dev/null", "-q"]
    if identity_file:
        cmd += ["-i", identity_file]
    return cmd


def _run_scp(cmd: list[str], what: str) -> None:
    try:
        p = subprocess.run(cmd, capture_output=True, text=True)
    except FileNotFoundError as e:
        raise RuntimeError("scp client not found on PATH") from e
    if p.returncode != 0:
        raise RuntimeError(f"SCP failed to {what}: {p.stderr.strip()}")


def scp_fetch(url: str, identity_file: str | None = None,
              staging_dir: str | None = None) -> str:
    """Download ``ssh://user@host:port/path`` to a staging file; returns
    the local path (remote extension preserved for format dispatch)."""
    user, host, port, rpath = parse_ssh_url(url)
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="tinyetl_ssh_")
    os.makedirs(staging_dir, exist_ok=True)
    fd, local = tempfile.mkstemp(suffix=_remote_ext(rpath), dir=staging_dir)
    os.close(fd)
    src = f"{user}@{host}:{rpath}"
    _run_scp(_scp_cmd(port, identity_file) + [src, local],
             f"download file from {src}")
    return local


def scp_upload(local_path: str, url: str,
               identity_file: str | None = None) -> None:
    """Upload a local file to ``ssh://user@host:port/path``."""
    user, host, port, rpath = parse_ssh_url(url)
    dst = f"{user}@{host}:{rpath}"
    _run_scp(_scp_cmd(port, identity_file) + [local_path, dst],
             f"upload file to {dst}")


def read_ssh(spark: SparkSession, url: str, options: dict | None = None,
             **read_kwargs) -> DataFrame:
    """SCP → staging file → ``read_source`` (format dispatch + inference).

    Options (string-valued, from job YAML): ``identity_file``,
    ``staging_dir``; the rest pass through to the format reader."""
    from tinyetl_spark.sources.files import read_source
    options = dict(options or {})
    path = scp_fetch(url, identity_file=options.pop("identity_file", None),
                     staging_dir=options.pop("staging_dir", None))
    return read_source(spark, path, options=options, **read_kwargs)


def write_ssh(df: DataFrame, url: str, options: dict | None = None,
              truncate: bool = False) -> None:
    """Write ``df`` as ONE local file in the remote path's format, then
    scp it up (the reference target writes a temp file and uploads it —
    a single remote file is the contract of an scp destination, so the
    frame is coalesced to one part; an scp sink is a small-export path,
    not a big-data path)."""
    from tinyetl_spark.sources.files import write_sink
    options = dict(options or {})
    identity = options.pop("identity_file", None)
    staging_dir = options.pop("staging_dir", None) \
        or tempfile.mkdtemp(prefix="tinyetl_ssh_out_")
    _, _, _, rpath = parse_ssh_url(url)
    ext = _remote_ext(rpath)
    if ext not in (".csv", ".tsv", ".json", ".ndjson", ".parquet", ".avro"):
        raise ValueError(f"ssh sink needs a file extension to pick the "
                         f"format: {url!r}")
    out = os.path.join(staging_dir, f"stage{ext}")
    write_sink(df.coalesce(1), out, options=options, truncate=truncate)
    # spark writes a directory; upload its single part file
    if os.path.isdir(out):
        parts = [f for f in sorted(os.listdir(out))
                 if f.startswith("part-") and not f.endswith(".crc")]
        if len(parts) != 1:
            raise RuntimeError(f"expected one part file in {out}, "
                               f"found {parts}")
        local = os.path.join(out, parts[0])
    else:
        local = out
    scp_upload(local, url, identity_file=identity)
