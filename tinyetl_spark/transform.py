"""Row-transform stage — the reference's Lua engine re-expressed as
Catalyst expressions (P1-P5).

The reference embeds Lua 5.4 and calls a function once per row
(/root/reference/src/transformer.rs:38-430). That per-row interpreter is
the exact anti-pattern the input_hint bans; the same capability surface
maps onto Spark SQL expressions, which run compiled and columnar:

- P1 inline derive: ``"a = expr; b = expr"`` — preserves ALL input
  columns then overlays, like the reference's inline mode (generated Lua
  copy loop, transformer.rs:186-191);
- P2 projection-by-construction: ``select=...`` keeps ONLY the listed
  columns, like the reference's file mode (README.md:465-466);
- P3 row filter: ``where=...`` predicate, like returning nil from Lua
  (transformer.rs:340-356) — inline mode never filters (README.md:585),
  so the CLI only wires ``where`` for file-mode specs;
- P4 scalar engine: full Spark SQL expression language (upper/lower/
  substring/regexp_*/length/concat/floor/ceil/abs/cast/CASE WHEN ...) —
  a strict superset of the Lua stdlib subset the reference documents
  (README.md:550-556);
- P5 coercion: SQL casts; the pandas/Arrow bridge is only entered for
  logic SQL cannot express, via ``python_file`` (a ``transform(df)`` df-
  level hook — still vectorized, never per-row).

Schema drift parity: the reference re-infers the output schema from the
first transformed row and coerces later rows to it
(transformer.rs:288-316, 464-488). Spark's analyzer resolves the output
schema statically from the expressions — same contract, no probe needed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_ASSIGN_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$", re.S)


@dataclass
class TransformSpec:
    assignments: list[tuple[str, str]] = field(default_factory=list)
    select: list[str] | None = None      # file-mode projection
    where: str | None = None             # file-mode filter

    @staticmethod
    def parse_inline(body: str) -> "TransformSpec":
        """``"a = upper(name); b = age * 2"`` → assignments. Statements
        split on ';' / newlines; each must be ``ident = sql-expr``."""
        spec = TransformSpec()
        for stmt in re.split(r"[;\n]+", body):
            if not stmt.strip():
                continue
            m = _ASSIGN_RE.match(stmt)
            if not m:
                raise ValueError(f"bad transform statement: {stmt!r} "
                                 "(expected `column = <sql expression>`)")
            spec.assignments.append((m.group(1), m.group(2)))
        return spec

    @staticmethod
    def parse_file(path: str) -> "TransformSpec":
        """Transform file: assignment lines plus optional directives
        ``select: a, b, c`` and ``where: <predicate>``."""
        spec = TransformSpec()
        for line in open(path):
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            if s.lower().startswith("select:"):
                spec.select = [c.strip() for c in s[7:].split(",") if c.strip()]
            elif s.lower().startswith("where:"):
                spec.where = s[6:].strip()
            else:
                spec.assignments.extend(TransformSpec.parse_inline(s).assignments)
        return spec

    def apply(self, df: DataFrame) -> DataFrame:
        for name, expr in self.assignments:
            df = df.withColumn(name, F.expr(expr))
        if self.where:
            df = df.filter(self.where)
        if self.select:
            df = df.select(*self.select)
        return df


def load_python_transform(path: str):
    """df-level escape hatch: a python file defining ``transform(df)``.
    For logic SQL can't express — implementations should use pandas UDFs /
    mapInPandas internally, never row loops."""
    ns: dict = {}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), ns)  # noqa: S102 - user-authored job code
    if "transform" not in ns or not callable(ns["transform"]):
        raise ValueError(f"{path} must define transform(df) -> df")
    return ns["transform"]
