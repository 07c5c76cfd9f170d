"""Unicode normalization + URL/domain blocklist filtering for web-text
curation — the two cleanup stages that run BEFORE every other operator
in a crawl pipeline (mojibake-era HTML yields decomposed codepoints and
stray control bytes that break tokenizers and dedup keys; UT1-style
domain blocklists reject whole hosts before any text work is paid).

Unicode NFC has no Catalyst builtin, so it is the one place in the text
surface that uses Python — as a vectorized Arrow-batched pandas UDF
(``pandas.Series.str.normalize`` is a C-level loop; never per-row
Python), per the engine-wide UDF rule (SURVEY.md §4). Control-char
stripping and all URL/host work are pure Catalyst expressions.

Oracle story: DuckDB ships ``nfc_normalize``; control stripping is the
same RE2-safe character class in both engines, so the round-trip is
byte-exact and hash-verified (``text_unicode_nfc`` contract row). The
blocklist uses host-suffix expansion, reproducible in SQL with a list
comprehension (``text_domain_blocklist`` row).

No reference equivalent (TinyETL has no text analytics,
/root/reference/src/transformer.rs is a scalar Lua derive stage); part
of the training-data surface the build plan adds (SURVEY.md §2.2).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# C0 controls minus \t \n \r, plus DEL. NO C1 range: those are valid
# continuation bytes' codepoints in latin-1-mojibake text and stripping
# them is a destructive judgement call a curation default shouldn't
# make. The class is RE2 ∩ Java-regex safe so the oracle replays it.
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


@pandas_udf(StringType())
def nfc_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched NFC normalization (composes e + U+0301 -> é etc.).
    ``Series.str.normalize`` loops in C over the block; nulls pass
    through as nulls."""
    return s.str.normalize("NFC")


def strip_controls(col: Column) -> Column:
    """Remove C0 control chars (except tab/newline/CR) and DEL — pure
    Catalyst, fuses into the scan."""
    return F.regexp_replace(col, _CONTROL_CLASS, "")


def nfc_normalize_frame(df: DataFrame, text_col: str = "text",
                        out_col: str = "text_nfc") -> DataFrame:
    """Attach the canonical Unicode form: control-strip (JVM) then NFC
    (Arrow batch). Strip-first keeps the UDF's input smaller; control
    chars are NFC-invariant so the order can't change the result."""
    return df.withColumn(out_col, nfc_udf(strip_controls(F.col(text_col))))


# --- URL host / domain blocklist ------------------------------------

def url_host(col: Column) -> Column:
    """Lowercased host of a URL (port stripped). Same extraction as
    canonical_url's host step (operators/text.py:130), factored so the
    blocklist keys on exactly the dedup-canonical host."""
    rest = F.regexp_replace(F.trim(col), r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    return F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))


def host_suffixes(host: Column) -> Column:
    """All dot-suffix domains of a host: ``a.b.example.com`` ->
    [a.b.example.com, b.example.com, example.com, com]. Bounded by the
    label count (crawl hosts: ~4), built with array HOFs inside codegen
    — this is what turns suffix-match blocking into an EQUI join/lookup
    instead of an O(n·m) LIKE scan."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."))


def blocklist_filter(df: DataFrame, blocked, url_col: str = "url",
                     keep_col: str | None = None) -> DataFrame:
    """Drop rows whose URL host equals a blocked domain or is a
    subdomain of one (UT1-blocklist semantics).

    ``blocked`` is either a small python list — compiled to a literal
    array membership test, zero joins, whole-stage codegen — or a
    DataFrame with a ``domain`` column for real blocklists (UT1 is
    millions of rows): explode the host suffixes and LEFT ANTI
    broadcast-hash-join on the suffix, so the corpus never shuffles and
    the match is an equi-probe, never a LIKE cross-product.

    ``keep_col``: instead of filtering, attach a boolean (for audits).
    """
    host = url_host(F.col(url_col))
    sufs = host_suffixes(host)
    if isinstance(blocked, (list, tuple, set)):
        doms = sorted({d.strip().lower().lstrip(".") for d in blocked if d})
        hit = F.arrays_overlap(
            sufs, F.lit(doms).cast("array<string>")) if doms else F.lit(False)
        if keep_col:
            return df.withColumn(keep_col, ~hit)
        return df.filter(~hit)
    # DataFrame path: explode ONLY (url, suffix) — never the payload
    # columns (html/text would multiply through the explode) — broadcast
    # the blocklist for the suffix equi-probe, reduce to the distinct
    # blocked-url set, and anti-join the corpus on url. The suffix probe
    # is a BroadcastHashJoin (corpus side never shuffles for it); the
    # final anti-join is on the table's own partition key and its right
    # side is url-only, so AQE broadcasts it when the blocked set is
    # small and shuffles co-located otherwise.
    bl = (blocked.select(F.lower(F.trim(F.col("domain"))).alias("_dom"))
                 .filter(F.col("_dom") != "").distinct())
    sufd = df.select(F.col(url_col), F.explode(sufs).alias("_suf"))
    hits = (sufd.join(F.broadcast(bl), sufd["_suf"] == bl["_dom"],
                      "left_semi")
                .select(url_col).distinct())
    if keep_col:
        return (df.join(hits.withColumn("_hit", F.lit(True)),
                        on=url_col, how="left")
                  .withColumn(keep_col, F.col("_hit").isNull())
                  .drop("_hit"))
    return df.join(hits, on=url_col, how="left_anti")
