"""Job configuration: YAML spec + ${VAR} env substitution + secrets.

Parity with the reference's config surface:
- YAML job spec with version/source/target/options
  (/root/reference/src/yaml_config.rs:9-172);
- ``${VAR}`` environment substitution in every string field including
  transform bodies (yaml_config.rs:144-160);
- secret resolution: ``TINYETL_SECRET_<id>`` env vars injected as the URL
  password, with a plaintext-password warning
  (/root/reference/src/secrets.rs:6-86);
- defaults: batch size 10000, schema inference on
  (/root/reference/src/cli.rs:30-31, src/config.rs:32).
"""

from __future__ import annotations

import os
import re
import sys
import warnings
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import urlparse, urlunparse

_VAR_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")
_SECRET_RE = re.compile(r"^secret:([A-Za-z0-9_]+)$")


def substitute_env(value: Any) -> Any:
    """Recursive ``${VAR}`` substitution over strings / dicts / lists.
    Unknown variables raise (silent empty-string substitution hides
    misconfiguration — the reference errors too)."""
    if isinstance(value, str):
        def repl(m):
            name = m.group(1)
            if name not in os.environ:
                raise KeyError(f"environment variable not set: {name}")
            return os.environ[name]
        return _VAR_RE.sub(repl, value)
    if isinstance(value, dict):
        return {k: substitute_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [substitute_env(v) for v in value]
    return value


def resolve_secret(url: str) -> str:
    """Inject ``TINYETL_SECRET_<id>`` as the URL password when the
    password field is ``secret:<id>``; warn on plaintext passwords in
    URLs (reference secrets.rs behavior)."""
    parsed = urlparse(url)
    if parsed.password:
        m = _SECRET_RE.match(parsed.password)
        if m:
            secret = os.environ.get(f"TINYETL_SECRET_{m.group(1)}")
            if secret is None:
                raise KeyError(f"secret not set: TINYETL_SECRET_{m.group(1)}")
            netloc = f"{parsed.username}:{secret}@{parsed.hostname}"
            if parsed.port:
                netloc += f":{parsed.port}"
            return urlunparse(parsed._replace(netloc=netloc))
        warnings.warn(
            "plaintext password in connection URL; prefer secret:<id> + "
            "TINYETL_SECRET_<id>", stacklevel=2)
    return url


@dataclass
class Endpoint:
    uri: str
    options: dict[str, str] = field(default_factory=dict)
    table: str | None = None       # for `target#table` style refs


@dataclass
class JobConfig:
    """The engine's job spec — the reference's Config struct is its IR
    (src/cli.rs:176-211); ours adds the CDC-specific fields."""
    source: Endpoint
    target: Endpoint
    batch_size: int = 10000
    infer_schema: bool = True
    transform: str | None = None        # inline expression map (see transform.py)
    transform_file: str | None = None
    schema_file: str | None = None
    truncate: bool = False
    preview: int | None = None
    dry_run: bool = False
    # CDC extensions (north rule)
    mode: str = "batch"                 # batch | stream
    checkpoint_dir: str | None = None
    key_col: str = "url"
    num_buckets: int = 16
    max_files_per_trigger: int | None = None
    quarantine_dir: str | None = None   # dead-letter queue for bad events
    auto_rescale_rows_per_bucket: int | None = None  # bucket-spec growth
    source_format: str = "eventlog"     # eventlog | debezium | maxwell | canal

    @staticmethod
    def from_yaml(path: str) -> "JobConfig":
        import yaml  # PyYAML ships with pyspark's transitive deps
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        raw = substitute_env(raw)
        version = raw.get("version", 1)
        if int(version) != 1:
            raise ValueError(f"unsupported config version: {version}")

        def endpoint(section: dict | str) -> Endpoint:
            if isinstance(section, str):
                section = {"uri": section}
            uri = resolve_secret(section["uri"])
            table = None
            if "#" in uri:
                uri, table = uri.rsplit("#", 1)
            return Endpoint(uri=uri, options=dict(section.get("options", {})),
                            table=section.get("table", table))

        opts = raw.get("options", {})
        return JobConfig(
            source=endpoint(raw["source"]),
            target=endpoint(raw["target"]),
            batch_size=int(opts.get("batch_size", 10000)),
            infer_schema=bool(opts.get("infer_schema", True)),
            transform=opts.get("transform"),
            transform_file=opts.get("transform_file"),
            schema_file=opts.get("schema_file"),
            truncate=bool(opts.get("truncate", False)),
            mode=opts.get("mode", "batch"),
            checkpoint_dir=opts.get("checkpoint_dir"),
            key_col=opts.get("key_col", "url"),
            num_buckets=int(opts.get("num_buckets", 16)),
            max_files_per_trigger=(int(opts["max_files_per_trigger"])
                                   if "max_files_per_trigger" in opts else None),
            quarantine_dir=opts.get("quarantine_dir"),
            auto_rescale_rows_per_bucket=(
                int(opts["auto_rescale_rows_per_bucket"])
                if "auto_rescale_rows_per_bucket" in opts else None),
            source_format=opts.get("source_format", "eventlog"),
        )


def generate_default_config() -> str:
    """`init-config` output (reference main.rs:40-155)."""
    return """\
version: 1
source:
  uri: ./events/            # change-event log dir, or file.csv/.json/.parquet/.avro
target:
  uri: ./lake/pages         # LakeTable root, or file sink by extension
options:
  mode: stream              # batch | stream
  checkpoint_dir: ./ckpt
  key_col: url
  num_buckets: 16
  batch_size: 10000
  infer_schema: true
  # transform: "text_len = length(text); lang_up = upper(lang)"
  # schema_file: ./schema.yaml
  # quarantine_dir: ./quarantine    # dead-letter queue for bad events
  # auto_rescale_rows_per_bucket: 1000000  # double buckets past this mean
  # source_format: debezium   # or maxwell | canal envelope zone (default: eventlog)
"""
