"""Byte-identity of vectorized extraction vs the reference extractor —
the north rule's per-row invariant."""

import pyspark.sql.functions as F
import pytest

from tinyetl_spark import datagen
from tinyetl_spark.extract import reference_extract_text, with_extracted_text

EDGE_CASES = [
    b"<html><body>hello</body></html>",
    b"<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;</p>",
    b"<script>ignore me</script><style>p{}</style>real",
    b"<SCRIPT>upper</SCRIPT>text",
    b"no tags at all",
    b"",
    b"nul\x00byte",
    b"bad utf8 \xff\xfe here",
    b"  lots   of\n\t whitespace  ",
    "unicode éè café 中文".encode(),
    b"<div><p>nested<span>tags</span></p></div>",
    b"<p>unclosed tag <b>bold",
    b"<!-- comment --><p>after</p>",
    # adversarial entity sequences: the fused single-pass substitution in
    # extract_series must match the reference's sequential replaces
    # (&amp; last) — neither may rescan its own output.
    b"&amp;lt;x&amp;gt; &amp;quot; &amp;amp; &amp;#39;",
    b"&amp;&amp;lt;&lt;&amp;gt;",
    # whitespace-adversarial: the hot path collapses runs with
    # " ".join(s.split()) instead of the oracle's \s+ regex — exercise
    # exotic Unicode whitespace (NBSP, ideographic space, NEL, FS-US)
    "a b　c\x85d\x1c\x1d\x1e\x1fe f".encode(),
    " 　 leading and trailing   ".encode(),
]


def test_ws_collapse_equivalence():
    """The hot path's `" ".join(s.split())` equals the oracle's
    `_RE_WS.sub(" ", s).strip()` iff re's \\s and str.isspace agree —
    assert that exhaustively over the BMP plus astral samples."""
    import re
    ws = re.compile(r"\s")
    for cp in list(range(0x11000)) + [0x1D7FF, 0x1F600]:
        ch = chr(cp)
        assert bool(ws.fullmatch(ch)) == ch.isspace(), hex(cp)


def test_reference_extractor_edge_cases():
    assert reference_extract_text(None) is None
    assert reference_extract_text(b"") == ""
    assert reference_extract_text(b"<script>x</script>hi") == "hi"
    assert reference_extract_text(b"a &amp;amp; b") == "a &amp; b"  # no double-unescape
    assert "\x00" not in reference_extract_text(b"a\x00b")


def test_udf_byte_identical_on_edge_cases(spark):
    df = spark.createDataFrame([(i, b) for i, b in enumerate(EDGE_CASES)],
                               "id int, html binary")
    rows = with_extracted_text(df).orderBy("id").collect()
    for r in rows:
        expected = reference_extract_text(bytes(r["html"]) if r["html"] is not None else None)
        got = r["text"]
        assert got == expected, f"mismatch on case {r['id']}: {got!r} != {expected!r}"
        assert got.encode("utf-8", "surrogatepass") == expected.encode("utf-8", "surrogatepass")


def test_udf_byte_identical_on_generated_pages(spark):
    ev = datagen.change_events(spark, 500, 100, seed=7).filter("html is not null")
    rows = with_extracted_text(ev).select("url", "html", "text").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["text"] == reference_extract_text(bytes(r["html"]))


def test_null_html_gives_null_text(spark):
    ev = datagen.change_events(spark, 300, 50, seed=1)
    deleted = with_extracted_text(ev).filter("op = 'delete'")
    assert deleted.filter(F.col("text").isNotNull()).count() == 0
