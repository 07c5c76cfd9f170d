"""PII redaction for web-text curation — emails, IPv4 addresses and
international phone numbers scrubbed before training.

Pure Catalyst ``regexp_replace`` chains (JVM-side, no Python, no
shuffle — fuses into the scan like the quality rules). The patterns
deliberately use only the regex subset where Java's backtracking
engine (Spark) and RE2 (DuckDB) agree — character classes, greedy
counted quantifiers, no alternation inside quantifiers, no
look-around — so the SQL oracle reproduces every replacement
byte-for-byte.

Application order is fixed (email → ipv4 → phone): the classes can
overlap on digit runs, and a fixed sequential order is what makes the
output deterministic and oracle-reproducible.

No reference equivalent; part of the training-data surface
(SURVEY.md §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# ordered: each entry is (kind, pattern, replacement token)
PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "[IP]"),
    # leading '+' required: bare digit runs are too false-positive-prone
    ("phone", r"\+[0-9][0-9 \-]{6,}[0-9]", "[PHONE]"),
]


def redact(col: Column, kinds: tuple = ("email", "ipv4", "phone")) -> Column:
    """Replace every PII match with its kind token, in the fixed
    email→ipv4→phone order (subset selectable, order preserved)."""
    out = col
    for kind, pat, tok in PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """kind -> match-count Column (counted on the ORIGINAL text)."""
    return {kind: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
                   .cast("long")
            for kind, pat, _ in PATTERNS}


def redact_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text replaced in place + n_email/n_ipv4/n_phone count columns."""
    c = F.col(text_col)
    out = df
    for kind, cnt in pii_counts(c).items():
        out = out.withColumn(f"n_{kind}", cnt)
    return out.withColumn(text_col, redact(c))
