"""Corpus-curation funnel: quality filter → PII redaction → dedup →
decontamination → deterministic sampling, as one composable call.

Each stage is an existing operator (operators/quality.py, pii.py,
dedup.py, components.py, decontam.py, sampling.py); this module only
sequences them in the order real pre-training pipelines run (cheap
map-side rejects first, shuffling stages later, so rejected docs never
reach a shuffle) and reports the funnel.

Scale shape: quality + PII are map-only and fuse into the scan; exact
dedup is one hash-shuffle on the fingerprint; cluster dedup is
LSH-bucketed (never all-pairs) + O(log n) CC rounds; the line and span
passes are map-side-combined hash aggregations (never a corpus-wide
window or suffix sort); decontamination is a broadcast semi-join;
sampling is map-only. Stage COUNTS are an
optional extra job per stage — skip the report at 100 TB or pay one
cached pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class CurateResult:
    df: DataFrame                    # the curated corpus
    stages: list = field(default_factory=list)   # [(stage_name, DataFrame)]

    def funnel(self) -> list[tuple[str, int]]:
        """[(stage, surviving_rows)] — one count job per stage."""
        return [(name, f.count()) for name, f in self.stages]


def curate_corpus(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  blocklist=None, url_col: str = "url",
                  nfc: bool = False,
                  quality: bool = True, quality_params: dict | None = None,
                  redact_pii: bool = False,
                  dedup_lines: bool = False,
                  dedup_spans: int | None = None,
                  dedup: str = "exact",           # exact | cluster | off
                  bench: DataFrame | None = None, ngram: int = 13,
                  lm_max_nll: float | None = None,
                  lm_vocab_k: int = 50_000,
                  sample_rate: float | None = None,
                  seed: int = 0) -> CurateResult:
    from tinyetl_spark.operators import decontam as DCON
    from tinyetl_spark.operators import dedup as D
    from tinyetl_spark.operators import normalize as NORM
    from tinyetl_spark.operators import pii as PII
    from tinyetl_spark.operators import quality as Q
    from tinyetl_spark.operators import sampling as SA
    from tinyetl_spark.operators.components import dedup_canonical

    cols = df.columns
    res = CurateResult(df, [("input", df)])
    cur = df
    if blocklist is not None:
        # cheapest reject first: drops whole hosts before any text work
        cur = NORM.blocklist_filter(cur, blocklist, url_col=url_col)
        res.stages.append(("blocklist", cur))
    if nfc:
        # canonical Unicode BEFORE quality/dedup so composed and
        # decomposed spellings of the same doc share one fingerprint
        cur = (NORM.nfc_normalize_frame(cur, text_col, out_col="_nfc")
                   .withColumn(text_col, F.col("_nfc")).drop("_nfc"))
        res.stages.append(("nfc", cur))
    if quality:
        cur = (Q.gopher_keep(cur, text_col, **(quality_params or {}))
                .filter("keep").select(*cols))
        res.stages.append(("quality", cur))
    if redact_pii:
        cur = (PII.redact_frame(cur, text_col)
                  .select(*cols))   # counts dropped: columns stay stable
        res.stages.append(("pii_redact", cur))
    if dedup_lines:
        # CCNet/C4 line pass BEFORE doc-level dedup: stripping shared
        # boilerplate lines first makes near-identical docs exactly
        # identical, so the cheaper exact pass catches them. Docs left
        # EMPTY by the pass were pure boilerplate — dropped here.
        deduped = D.dedup_lines_global(cur, id_col, text_col)
        cur = (cur.drop(text_col)
                  .join(deduped.filter(F.col(text_col) != "")
                               .select(id_col, text_col), id_col)
                  .select(*cols))
        res.stages.append(("dedup_lines", cur))
    if dedup_spans is not None:
        # Lee et al. exact-substring pass at word k-gram granularity:
        # removes duplicated SPANS (every occurrence) that line dedup
        # misses when boilerplate doesn't align to line boundaries.
        # Runs before doc-level dedup for the same reason as the line
        # pass; docs emptied by it were pure boilerplate.
        deduped = D.dedup_ngram_spans(cur, id_col, text_col,
                                      k=dedup_spans)
        cur = (cur.drop(text_col)
                  .join(deduped.filter(F.col(text_col) != "")
                               .select(id_col, text_col), id_col)
                  .select(*cols))
        res.stages.append(("dedup_spans", cur))
    if dedup == "exact":
        cur = D.exact_dedup(cur, id_col, text_col).select(*cols)
        res.stages.append(("dedup_exact", cur))
    elif dedup == "cluster":
        pairs = D.ngram_jaccard_pairs(cur, id_col, text_col)
        cur = (dedup_canonical(cur, pairs, id_col)
               .filter("is_canonical").select(*cols))
        res.stages.append(("dedup_cluster", cur))
    elif dedup not in (None, "off"):
        raise ValueError(f"unknown dedup mode {dedup!r}")
    if lm_max_nll is not None:
        # CCNet LM-perplexity filter AFTER dedup: training the unigram
        # LM on deduped text keeps boilerplate from dominating the
        # vocabulary and making spam look in-distribution
        from tinyetl_spark.operators import ranking as RK
        scored = RK.lm_score(cur, text_col=text_col, id_col=id_col,
                             vocab_k=lm_vocab_k)
        cur = (cur.join(scored.filter(F.col("mean_nll") <= lm_max_nll)
                              .select(id_col), id_col)
                  .select(*cols))
        res.stages.append(("lm_filter", cur))
    if bench is not None:
        cur = DCON.decontaminate(cur, bench, text_col, id_col, n=ngram)
        res.stages.append(("decontaminate", cur))
    if sample_rate is not None:
        cur = SA.bernoulli_sample(cur, id_col, sample_rate, seed)
        res.stages.append(("sample", cur))
    res.df = cur
    return res
