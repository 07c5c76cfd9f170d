"""Text-analysis operators for a training-data pipeline.

All JVM-side Catalyst expressions (no Python in the hot path) and each
deliberately expressible in ANSI SQL so the DuckDB oracle can verify
values bit-for-bit: hashing uses md5 hex (identical in both engines),
floats are rounded at the output boundary.

Reference parallel: these play the role of TinyETL's per-row Lua derive
stage (/root/reference/src/transformer.rs:171-221) but as whole-column
expressions inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# language marker words → deterministic n-gram-style heuristic.
# On synthetic corpora this is a *deterministic scoring rule*, which is the
# point: same answer in Spark and the SQL oracle.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def norm_text(col: Column) -> Column:
    """lower + collapse whitespace + trim — the canonical form every
    text operator keys on."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def token_count(col: Column) -> Column:
    """Whitespace tokenization; empty string → 0 tokens."""
    n = norm_text(col)
    return F.when(n == "", F.lit(0)).otherwise(F.size(F.split(n, " "))).cast("long")


# BPE-style pre-tokenization (the GPT-2 pattern's regex-only core): runs
# of letters, runs of digits, single non-space punctuation — a much better
# LLM-token-cost estimate than whitespace words (punctuation and numbers
# tokenize separately). Pure Catalyst regexp, reproducible in DuckDB.
_BPE_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_token_estimate(col: Column) -> Column:
    """Approximate LLM token count via BPE-ish pre-tokenization pieces."""
    return F.size(F.regexp_extract_all(norm_text(col), F.lit(_BPE_PAT),
                                       F.lit(0))).cast("long")


def marker_hits(col: Column, words: list[str]) -> Column:
    """Total occurrences of any marker word (word-boundary regex)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(norm_text(col), F.lit(pat), F.lit(1))).cast("long")


def lang_id(col: Column) -> Column:
    """Pick the language with the most marker hits; ties break by the
    priority order en > de > fr > es; 'und' when no marker hits at all.
    Written as an explicit CASE cascade so the SQL oracle is literally
    the same decision procedure."""
    langs = list(LANG_MARKERS)
    hits = {lang: marker_hits(col, words) for lang, words in LANG_MARKERS.items()}
    expr = F.lit("und")
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = hits[lang] > 0
        for later in langs[i + 1:]:
            cond = cond & (hits[lang] >= hits[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: Column) -> Column:
    """Document quality in [0,1]: length saturation x (1 - stopword
    ratio) x alpha ratio. Rounded to 6dp at the boundary so oracle
    hashing is stable."""
    n = norm_text(col)
    toks = token_count(col)
    stop = marker_hits(col, STOPWORDS)
    alpha = F.length(F.regexp_replace(n, r"[^a-z]", ""))
    total = F.greatest(F.length(n), F.lit(1))
    score = (
        F.least(toks.cast("double") / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - stop.cast("double") / F.greatest(toks, F.lit(1)).cast("double"))
        * (alpha.cast("double") / total.cast("double"))
    )
    return F.round(score, 6)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text —
    identical hex in Spark and DuckDB, the key for exact dedup."""
    return F.md5(norm_text(col))


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns in one pass."""
    c = F.col(text_col)
    return (df.withColumn("n_tokens", token_count(c))
              .withColumn("n_bpe", bpe_token_estimate(c))
              .withColumn("lang_pred", lang_id(c))
              .withColumn("quality", quality_score(c))
              .withColumn("fp", fingerprint(c)))


def canonical_url(col: Column) -> Column:
    """Canonical URL form for dedup keying — the normalization every
    web-crawl pipeline applies before hashing urls (no reference
    equivalent; part of the training-data surface):

    - scheme and host lowercased; default ports (http:80, https:443)
      stripped; fragment dropped;
    - ``utm_*`` tracking params dropped, remaining query params sorted
      (param order never changes the resource);
    - empty path becomes ``/``, empty query drops its ``?``.

    Pure Catalyst expressions (regexp + higher-order functions): runs
    JVM-side in whole-stage codegen, no Python in the plan."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r'^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))
    rest = F.regexp_replace(u, r'^[A-Za-z][A-Za-z0-9+.\-]*://', '')
    rest = F.regexp_replace(rest, r'#.*$', '')
    hostport = F.regexp_extract(rest, r'^([^/?]*)', 1)
    host = F.lower(F.regexp_extract(hostport, r'^([^:]*)', 1))
    port = F.regexp_extract(hostport, r':([0-9]+)$', 1)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    path = F.regexp_extract(rest, r'^[^/?]*([^?]*)', 1)
    query = F.regexp_extract(rest, r'\?(.*)$', 1)
    params = F.filter(
        F.split(query, '&'),
        lambda x: (x != F.lit("")) & ~F.startswith(x, F.lit("utm_")))
    q2 = F.array_join(F.array_sort(params), '&')
    return F.concat(
        F.when(scheme == "", F.lit("")).otherwise(F.concat(scheme, F.lit("://"))),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)))


# ---------------------------------------------------------------------------
# Unicode script detection — the language-routing signal a web-crawl
# pipeline computes BEFORE any model-based lang-id: which writing system
# dominates the page. Deterministic BMP code-point ranges (the major
# scripts of the crawl), so both Spark (Java regex, literal range chars)
# and the DuckDB oracle (RE2 \x{....} escapes) count identically.
# No reference equivalent; part of the training-data surface.

SCRIPT_RANGES: dict[str, str] = {
    # Latin letters incl. Latin-1 Supplement + Extended-A/B, minus the
    # x/÷ signs embedded in the letter block (U+00D7, U+00F7).
    "latin": "A-Za-zÀ-ÖØ-öø-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    # Han + Hiragana + Katakana (the CJK page signal).
    "cjk": "぀-ヿ一-鿿",
    "hangul": "가-힯",
}

# Priority order for dominant-script tie-breaks (same CASE-cascade
# technique as lang_id so the SQL oracle is the identical procedure).
SCRIPT_ORDER = ["latin", "cyrillic", "greek", "arabic", "cjk", "hangul"]


def script_char_count(col: Column, script: str) -> Column:
    """Number of characters of ``script`` in the raw text (count by
    removal + length: reproducible in any engine that has
    regexp_replace, unlike regexp_count)."""
    rng = SCRIPT_RANGES[script]
    return F.length(F.regexp_replace(col, f"[^{rng}]", "")).cast("long")


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-script fractions + dominant script.

    Output columns: ``script_chars`` (total chars in any known script),
    ``<script>_frac`` for each entry of SCRIPT_RANGES (6dp, fraction of
    script_chars), and ``dominant_script`` (priority-ordered argmax;
    'und' when the text has no script characters at all).
    """
    c = F.col(text_col)
    cnt = {s: script_char_count(c, s) for s in SCRIPT_ORDER}
    out = df
    for s in SCRIPT_ORDER:
        out = out.withColumn(f"_n_{s}", cnt[s])
    total = sum((F.col(f"_n_{s}") for s in SCRIPT_ORDER[1:]),
                F.col(f"_n_{SCRIPT_ORDER[0]}"))
    out = out.withColumn("script_chars", total.cast("long"))
    denom = F.greatest(F.col("script_chars"), F.lit(1)).cast("double")
    for s in SCRIPT_ORDER:
        out = out.withColumn(
            f"{s}_frac", F.round(F.col(f"_n_{s}").cast("double") / denom, 6))
    dom = F.lit("und")
    for i in range(len(SCRIPT_ORDER) - 1, -1, -1):
        s = SCRIPT_ORDER[i]
        cond = F.col(f"_n_{s}") > 0
        for later in SCRIPT_ORDER[i + 1:]:
            cond = cond & (F.col(f"_n_{s}") >= F.col(f"_n_{later}"))
        dom = F.when(cond, F.lit(s)).otherwise(dom)
    out = out.withColumn("dominant_script", dom)
    return out.drop(*[f"_n_{s}" for s in SCRIPT_ORDER])


# ---------------------------------------------------------------------------
# Shannon-entropy quality signals — the classic gibberish / boilerplate
# detector (low char entropy = repeated filler, low word entropy =
# template pages). Pure Catalyst higher-order functions over one row at
# a time: O(alphabet x length) per document, zero shuffle — a scan-speed
# pass at any corpus size. Expressible 1:1 in DuckDB list functions, so
# the oracle verifies values to 6dp (both sides sort the distinct list
# first: double summation order must be identical for bit-stable sums).

def _entropy(items: Column) -> Column:
    """Shannon entropy (bits) of the multiset in ``items``."""
    n = F.size(items)
    dd = F.array_sort(F.array_distinct(items))
    terms = F.transform(
        dd,
        lambda c: (F.size(F.filter(items, lambda x: x == c))
                   .cast("double") / n)
        * F.log2(F.size(F.filter(items, lambda x: x == c))
                 .cast("double") / n))
    h = -F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    return F.when(n > 0, F.round(h, 6)).otherwise(F.lit(0.0))


def entropy_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``char_entropy`` / ``word_entropy`` (bits) and the distinct
    counts they normalize against. Characters come from the normalized
    text via the RE2-and-Java-compatible ``.`` extraction (whitespace is
    already collapsed to single spaces, so no newlines)."""
    nt = norm_text(F.col(text_col))
    chars = F.regexp_extract_all(nt, F.lit("."), F.lit(0))
    words = F.filter(F.split(nt, " "), lambda w: w != "")
    return (df
            .withColumn("char_entropy", _entropy(chars))
            .withColumn("word_entropy", _entropy(words))
            .withColumn("distinct_chars",
                        F.size(F.array_distinct(chars)).cast("long"))
            .withColumn("distinct_words",
                        F.size(F.array_distinct(words)).cast("long")))
