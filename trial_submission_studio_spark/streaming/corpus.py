"""Streaming corpus preparation — the stateless/stream-static subset
of `corpus.prepare_corpus` for continuous ingest.

A crawl pipeline doesn't arrive as one batch: WARC segments land
continuously, and the cheap row-local quality stages should run AS
data arrives so only survivors hit storage and the (batch or
`streaming/ingest.py`) dedup tiers. This module applies exactly the
stages that are legal in a stateless Structured Streaming plan:

- C4 line quality — rebuilt via the `qualityfilter.kept_lines`
  EXPRESSION (the batch path joins two branches of the corpus by id;
  two branches of one stream cannot re-join statelessly);
- document-quality gates — the SAME `corpus.doc_quality_predicate`
  column batch uses, so batch and stream agree rule-for-rule;
- PII count filter, blocklist filter, compression band, learned
  quality model (all row-local, Arrow-batched where Python);
- language routing — `langid.classify_language_rowlocal`, the
  per-row kernel twin of the batch explode+join classifier;
- final PII redaction.

Corpus-WIDE stages (paragraph/substring dedup, exact/near dedup,
contamination, perplexity banding, source caps, mix rebalancing) are
structurally cross-row: they need a shuffle over the whole corpus,
which a stateless stream cannot express. Enabling any of them in the
config RAISES (the prepare_corpus loud-failure discipline — silently
skipping dedup is the worst corpus bug). Run them downstream: exact +
near dedup continuously via `streaming.ingest` (cross-run state,
replay-safe), the rest on the accumulated table per snapshot.

``streaming_corpus_config()`` returns a `CorpusConfig` with every
corpus-wide stage pre-disabled so callers opt INTO row-local knobs.

The returned DataFrame is a plain transformation: attach any sink
(`writeStream`, or reuse on a batch frame — the plan is identical,
which is how the tests pin batch/stream equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CorpusConfig, doc_quality_predicate

__all__ = ["streaming_corpus_config", "streaming_prepare_corpus"]


def streaming_corpus_config(**overrides) -> CorpusConfig:
    """A `CorpusConfig` whose corpus-wide stages are OFF (the batch
    defaults enable paragraph dedup, exact+near dedup and
    contamination — all illegal on a stateless stream). Pass the
    row-local knobs as overrides."""
    base = dict(
        paragraph_max_docs=None,
        substring_w=None,
        exact_dedup=False,
        near_dedup=False,
        contamination_threshold=None,
        max_ppl=None,
        source_cap=None,
        target_mix=None,
    )
    base.update(overrides)
    return CorpusConfig(**base)


def _reject_corpus_wide(cfg: CorpusConfig) -> None:
    offenders = [
        name
        for name, on in (
            ("paragraph_max_docs", cfg.paragraph_max_docs is not None),
            ("substring_w", cfg.substring_w is not None),
            ("exact_dedup", cfg.exact_dedup),
            ("near_dedup", cfg.near_dedup),
            (
                "contamination_threshold",
                cfg.contamination_threshold is not None,
            ),
            ("max_ppl", cfg.max_ppl is not None),
            ("source_cap", cfg.source_cap is not None),
            ("target_mix", cfg.target_mix is not None),
        )
        if on
    ]
    if offenders:
        raise ValueError(
            "corpus-wide stages cannot run in a stateless stream: "
            + ", ".join(offenders)
            + " — disable them (streaming_corpus_config()) and run "
            "dedup via streaming.ingest / the rest per snapshot"
        )


def streaming_prepare_corpus(
    docs: DataFrame,
    text_col: str,
    config: CorpusConfig | None = None,
    lang_profiles=None,
    quality_model=None,
) -> DataFrame:
    """Apply the row-local corpus-prep stages to ``docs`` (a
    streaming OR batch frame — same plan either way) in
    `prepare_corpus` order: line quality → doc-quality gates → PII
    filter → blocklist → language routing → learned quality model →
    compression band → final PII redaction. Returns the frame with
    ``text_col`` rewritten by the line stage and rows dropped by the
    filters; schema is otherwise unchanged.

    ``lang_profiles`` may be the trained profile DataFrame or a
    pre-collected `langid.collect_profiles` dict (collect it once
    outside the stream — the DataFrame form triggers a driver
    collect at plan-build time, which is fine for a one-shot plan
    but wasteful if rebuilt per trigger)."""
    cfg = config or streaming_corpus_config()
    _reject_corpus_wide(cfg)
    if cfg.lang_allowlist is not None and lang_profiles is None:
        raise ValueError(
            "lang_allowlist is set but no lang_profiles= was passed"
        )
    if cfg.min_model_quality is not None and quality_model is None:
        raise ValueError(
            "min_model_quality is set but no quality_model= was passed"
        )

    out = docs
    if cfg.min_line_words is not None:
        from ..operators.qualityfilter import kept_lines

        out = out.withColumn(
            text_col,
            F.concat_ws(
                "\n",
                kept_lines(
                    text_col,
                    min_words=cfg.min_line_words,
                    require_terminal_punct=False,
                ),
            ),
        )

    pred = doc_quality_predicate(cfg, text_col)
    if pred is not None:
        out = out.filter(pred)

    if cfg.pii_max_total is not None:
        from ..operators.pii import pii_filter

        out = pii_filter(out, text_col, max_total=cfg.pii_max_total)

    if cfg.blocklist_words is not None:
        from ..operators.qualityfilter import blocklist_filter

        out = blocklist_filter(
            out,
            text_col,
            cfg.blocklist_words,
            max_hits=cfg.blocklist_max_hits,
            max_density=cfg.blocklist_max_density,
        )

    if cfg.lang_allowlist is not None:
        from ..operators.langid import classify_language_rowlocal

        cols = out.columns
        out = (
            classify_language_rowlocal(
                out, lang_profiles, text_col, out_col="__lang"
            )
            .filter(F.col("__lang").isin(*cfg.lang_allowlist))
            .select(*cols)
        )

    if cfg.min_model_quality is not None:
        from ..operators.qualitymodel import quality_model_filter

        out = quality_model_filter(
            out, quality_model, text_col, min_prob=cfg.min_model_quality
        )

    if cfg.compression_band is not None:
        from ..operators.textstats import compression_filter

        lo, hi = cfg.compression_band
        out = compression_filter(out, text_col, min_ratio=lo, max_ratio=hi)

    if cfg.pii_redact:
        from ..operators.pii import redact_pii

        out = out.withColumn(text_col, redact_pii(text_col))

    return out
