"""Preview rendering parity: the reference's box-drawing schema table and
fixed-width data grid (/root/reference/src/transfer.rs:242-336) instead of
``df.printSchema()`` / ``df.show()``. Driver-side only — preview is a
bounded ``limit(n)`` sample by definition, never a table scan."""

from __future__ import annotations

from pyspark.sql import DataFrame

_CELL = 15            # reference truncates every value to 15 chars


def schema_grid(df: DataFrame) -> str:
    """Column / Type / Nullable table, reference layout (19/13/8 cells)."""
    lines = [
        "┌─────────────────────┬───────────────┬──────────┐",
        "│ Column              │ Type          │ Nullable │",
        "├─────────────────────┼───────────────┼──────────┤",
    ]
    for f in df.schema.fields:
        lines.append(f"│ {f.name:<19.19} │ {f.dataType.simpleString():<13.13}"
                     f" │ {str(f.nullable).lower():<8} │")
    lines.append("└─────────────────────┴───────────────┴──────────┘")
    return "\n".join(lines)


def data_grid(df: DataFrame, n: int) -> str:
    """First ``n`` rows as the reference's fixed 15-char grid (one
    ``limit(n)`` collect — the same bounded sample the reference's
    ``read_batch(preview_rows)`` takes)."""
    rows = df.limit(n).collect()
    if not rows:
        return "No data to display"
    headers = df.columns
    seg = "─" * (_CELL + 2)

    def border(l: str, m: str, r: str) -> str:
        return l + m.join(seg for _ in headers) + r

    def cells(vals) -> str:
        out = "│"
        for v in vals:
            s = "NULL" if v is None else str(v)
            out += f" {s[:_CELL]:<{_CELL}} │"
        return out

    lines = [border("┌", "┬", "┐"), cells(headers), border("├", "┼", "┤")]
    lines += [cells([r[c] for c in headers]) for r in rows]
    lines.append(border("└", "┴", "┘"))
    return "\n".join(lines)
