"""Multi-format trial date parsing — reference parity (P7).

Mirrors the reference's format list and trial ORDER exactly
(/root/reference/src/date_parser.rs:11-116): RFC3339 → ISO-without-tz →
date-only formats (MM/DD before DD/MM — the documented ambiguity rule) →
datetime formats. Re-expressed as a single Catalyst ``coalesce`` of
``try_to_timestamp`` calls, so the whole trial chain runs JVM-side inside
whole-stage codegen (the reference runs it per row in Rust; the per-value
semantics are identical, the execution is columnar).

The ``might_be_date`` pre-filter heuristic
(/root/reference/src/date_parser.rs:119-173) becomes a cheap boolean
Column used to skip the parse chain for obvious non-dates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# chrono → JVM DateTimeFormatter pattern translation of the reference's
# lists, same order. (%-d style day-padding differences do not arise: the
# reference uses zero-padded directives throughout.)
ISO_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss",        # ISO datetime, no tz
    "yyyy-MM-dd'T'HH:mm:ss.SSS",    # + millis
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", # + micros
]

DATE_FORMATS = [
    "yyyy-MM-dd",
    "MM/dd/yyyy",     # tried BEFORE dd/MM/yyyy — reference ambiguity rule
    "dd/MM/yyyy",
    "MM-dd-yyyy",
    "dd-MM-yyyy",
    "yyyy/MM/dd",
    "dd.MM.yyyy",
    "yyyy.MM.dd",
    "MMM dd, yyyy",
    "MMMM dd, yyyy",
    "dd MMM yyyy",
    "dd MMMM yyyy",
]

DATETIME_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "MM/dd/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "MM/dd/yyyy HH:mm",
    "dd/MM/yyyy HH:mm",
    "yyyy-MM-dd hh:mm:ss a",
    "MM/dd/yyyy hh:mm:ss a",
    "dd/MM/yyyy hh:mm:ss a",
    "yyyy-MM-dd hh:mm a",
    "MM/dd/yyyy hh:mm a",
    "dd/MM/yyyy hh:mm a",
]

ALL_FORMATS = ISO_FORMATS + DATE_FORMATS + DATETIME_FORMATS


def try_parse_date(col: Column) -> Column:
    """The full trial chain: RFC3339/ISO first (Spark's bare
    ``try_to_timestamp`` handles RFC3339 with offset), then each format in
    reference order. Null when nothing matches — callers decide fallback
    (the reference keeps the value as String)."""
    c = F.trim(col)
    tries = [F.try_to_timestamp(c)]  # RFC3339 / ISO-with-offset default
    tries += [F.try_to_timestamp(c, F.lit(fmt)) for fmt in ALL_FORMATS]
    return F.coalesce(*tries)


def might_be_date(col: Column) -> Column:
    """Pre-filter heuristic (reference date_parser.rs:119-173): length in
    [6, 30], not a pure decimal number, contains a date-ish separator."""
    c = F.trim(col)
    ln = F.length(c)
    pure_decimal = c.rlike(r"^[0-9]+\.[0-9]+$")
    has_sep = c.rlike(r"[-/.: ]")
    return (ln >= 6) & (ln <= 30) & ~pure_decimal & has_sep


def parse_or_keep(col: Column) -> Column:
    """Reference CSV-cell behavior: parse if it looks like a date, else
    keep null (the caller falls back to the string value)."""
    return F.when(might_be_date(col), try_parse_date(col))
