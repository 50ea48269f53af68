"""End-to-end pretraining-corpus preparation pipeline.

Composes the engine's corpus operators into the canonical web-scale
recipe (C4 → CCNet → Gopher → RefinedWeb lineage), in the order the
literature converged on — cheap row-local filters first, corpus-wide
shuffling stages last, so every shuffle sees the smallest possible
corpus:

1. **Line quality** (C4 rules) — row-local, zero shuffle.
2. **Document quality gates** (length, stopword-ratio language ID,
   Gopher repetition) — row-local, zero shuffle.
3. **Language routing** (trainable char-n-gram classifier +
   allowlist) — broadcast join.
3b. **Learned quality model** (hashed-n-gram logistic classifier,
   the CCNet/fastText stage) — row-local scoring, zero shuffle.
4. **Paragraph boilerplate removal** — first corpus-wide stage.
5. **Repeated-substring removal** (ExactSubstr window variant).
6. **Exact dedup** (normalized fingerprint, min-id survivor).
7. **Near dedup** (MinHash → LSH → Jaccard verify → connected
   components → one survivor per group).
8. **Decontamination** against a benchmark set (word n-gram overlap).
9. **Perplexity filter** (bigram LM vs a reference corpus).
10. **Source quota caps** and **target-mix rebalancing** (optional).

Every stage is the already-tested operator — this module only
sequences them and threads a stats accumulator so pipelines can log
per-stage retention (the number one debugging need in corpus work:
"where did my data go?"). Stage toggles take ``None`` to skip.

At 100 TB each numbered stage is a separate checkpointed table in
practice; ``prepare_corpus`` returns lazily-composed DataFrames, so
callers insert persistence wherever their orchestration wants it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.contamination import contamination_overlap
from .operators.dedup import dedup_exact, dedup_near
from .operators.paragraphs import paragraph_dedup
from .operators.qualityfilter import line_quality_filter
from .operators.sampling import cap_per_key, rebalance_to_target
from .operators.textstats import (
    alpha_word_fraction_e4,
    bullet_line_fraction_e4,
    ellipsis_line_fraction_e4,
    quality_score,
    stopword_ratio,
    symbol_word_ratio_e4,
    token_count,
)


@dataclass
class CorpusConfig:
    """Stage knobs; ``None`` disables the stage."""

    min_line_words: int | None = 3
    min_doc_tokens: int | None = 10
    min_stopword_ratio: float | None = None
    min_quality: float | None = None
    compression_band: tuple[float, float] | None = None
    # Gopher formatting rules (fractions in [0,1]; None disables)
    max_symbol_ratio: float | None = None
    max_bullet_fraction: float | None = None
    max_ellipsis_fraction: float | None = None
    min_alpha_fraction: float | None = None
    lang_allowlist: tuple[str, ...] | None = None
    # wordlist content filter (C4 bad-words stage; list is
    # user-supplied — policy belongs to the caller)
    blocklist_words: tuple[str, ...] | None = None
    blocklist_max_hits: int = 0
    blocklist_max_density: float | None = None
    min_model_quality: float | None = None
    paragraph_max_docs: int | None = 5
    substring_w: int | None = None
    substring_min_doc_freq: int = 2
    exact_dedup: bool = True
    near_dedup: bool = True
    minhash_k: int = 5
    contamination_threshold: float | None = 0.5
    contamination_ngram: int = 8
    max_ppl: float | None = None
    source_cap: int | None = None
    source_col: str = "source"
    target_mix: dict[str, float] | None = None
    # PII scrub (operators/pii.py): max_total drops documents whose
    # detector-match count exceeds it (row-local filter with the
    # other doc filters); redact=True rewrites the surviving text at
    # the END of the pipeline (the Stack/FineWeb convention — scrub
    # what ships, after dedup/mix decisions are made on raw text)
    pii_max_total: int | None = None
    pii_redact: bool = False
    # pseudonymize instead of blanket-redact: consistent salted-hash
    # tokens (same value -> same token corpus-wide) so coreference
    # and post-scrub dedup equality survive; mutually exclusive with
    # pii_redact
    pii_pseudonymize_salt: str | None = None
    stats: dict[str, int] = field(default_factory=dict)


def doc_quality_predicate(cfg: CorpusConfig, text_col: str):
    """Row-local keep predicate for the document-quality gates
    (token floor, stopword ratio, heuristic quality score, Gopher
    formatting rules) — one Column, or None when every knob is off.
    Shared by :func:`prepare_corpus` and the streaming twin
    (`streaming/corpus.py`) so batch and stream agree rule-for-rule."""
    doc_pred = None
    if cfg.min_doc_tokens is not None:
        doc_pred = token_count(text_col) >= cfg.min_doc_tokens
    if cfg.min_stopword_ratio is not None:
        p = stopword_ratio(text_col) >= cfg.min_stopword_ratio
        doc_pred = p if doc_pred is None else (doc_pred & p)
    if cfg.min_quality is not None:
        p = quality_score(text_col) >= cfg.min_quality
        doc_pred = p if doc_pred is None else (doc_pred & p)
    # Gopher formatting rules share the same row-local predicate pass
    # (e4 fixed-point metrics vs e4-scaled thresholds — no float drift)
    for metric, threshold, keep_at_most in (
        (symbol_word_ratio_e4, cfg.max_symbol_ratio, True),
        (bullet_line_fraction_e4, cfg.max_bullet_fraction, True),
        (ellipsis_line_fraction_e4, cfg.max_ellipsis_fraction, True),
        (alpha_word_fraction_e4, cfg.min_alpha_fraction, False),
    ):
        if threshold is None:
            continue
        bound = int(threshold * 10000)
        m = metric(text_col)
        p = (m <= bound) if keep_at_most else (m >= bound)
        doc_pred = p if doc_pred is None else (doc_pred & p)
    return doc_pred


def prepare_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    config: CorpusConfig | None = None,
    benchmark: DataFrame | None = None,
    lang_profiles: DataFrame | None = None,
    lm_model: tuple[DataFrame, DataFrame] | None = None,
    quality_model=None,
    collect_stats: bool = False,
    attribution: bool = False,
) -> DataFrame:
    """Run the composed pipeline; returns the cleaned corpus with the
    original columns (text rewritten by paragraph dedup when enabled).

    ``collect_stats=True`` counts survivors after every stage into
    ``config.stats`` (one action per stage — debugging/reporting mode;
    leave False in production and count the final table only).

    ``attribution=True`` returns ``(corpus, dropped)`` instead, where
    ``dropped`` is an ``(id, dropped_at)`` frame naming the FIRST
    stage that removed each non-surviving document — the "why was my
    document removed" audit every pipeline debugging session starts
    with, and the ground truth for tuning a single stage without
    re-ablating the whole pipeline. Cost shape: each enabled stage's
    id column is persisted (ids only — 8-byte keys, never text) and
    the per-stage drop set is one left-anti join between consecutive
    id sets; everything stays lazy until the caller acts on
    ``dropped``. Batch-mode only (the streaming twin is stateless
    row-local and rejects corpus-wide stages anyway)."""
    cfg = config or CorpusConfig()
    # a stage the config enables but whose companion input is missing
    # must FAIL, not silently no-op — contaminated / wrong-language /
    # high-perplexity docs flowing through unreported is the worst
    # failure mode a corpus pipeline has
    if cfg.contamination_threshold is not None and benchmark is None:
        raise ValueError(
            "contamination_threshold is set but no benchmark= was passed"
        )
    if cfg.lang_allowlist is not None and lang_profiles is None:
        raise ValueError(
            "lang_allowlist is set but no lang_profiles= was passed"
        )
    if cfg.max_ppl is not None and lm_model is None:
        raise ValueError("max_ppl is set but no lm_model= was passed")
    if cfg.min_model_quality is not None and quality_model is None:
        raise ValueError(
            "min_model_quality is set but no quality_model= was passed"
        )

    dropped_frames: list[DataFrame] = []
    prev_ids: list[DataFrame] = []

    def _mark(stage: str, df: DataFrame) -> DataFrame:
        if collect_stats:
            cfg.stats[stage] = df.count()
        if attribution:
            cur = df.select(F.col(id_col)).persist()
            if prev_ids:
                dropped_frames.append(
                    prev_ids[-1]
                    .join(cur, id_col, "left_anti")
                    .withColumn("dropped_at", F.lit(stage))
                )
            prev_ids.append(cur)
        return df

    out = _mark("input", docs)

    if cfg.min_line_words is not None:
        kept = line_quality_filter(
            out, id_col, text_col,
            min_words=cfg.min_line_words,
            require_terminal_punct=False,
            keep_text=True,
        ).select(id_col, F.col("kept_text").alias(text_col))
        out = _mark(
            "line_quality",
            out.drop(text_col).join(kept, id_col),
        )

    doc_pred = doc_quality_predicate(cfg, text_col)
    if doc_pred is not None:
        out = _mark("doc_quality", out.filter(doc_pred))

    if cfg.pii_max_total is not None:
        from .operators.pii import pii_filter

        out = _mark(
            "pii_filtered",
            pii_filter(out, text_col, max_total=cfg.pii_max_total),
        )

    if cfg.blocklist_words is not None:
        from .operators.qualityfilter import blocklist_filter

        out = _mark(
            "blocklist",
            blocklist_filter(
                out, text_col, cfg.blocklist_words,
                max_hits=cfg.blocklist_max_hits,
                max_density=cfg.blocklist_max_density,
            ),
        )

    if cfg.lang_allowlist is not None and lang_profiles is not None:
        from .operators.langid import classify_language

        langs = classify_language(out, lang_profiles, id_col, text_col)
        allowed = langs.filter(
            F.col("lang").isin(*cfg.lang_allowlist)
        ).select(id_col)
        out = _mark("lang_routed", out.join(allowed, id_col, "left_semi"))

    if cfg.min_model_quality is not None and quality_model is not None:
        from .operators.qualitymodel import quality_model_filter

        out = _mark(
            "model_quality",
            quality_model_filter(
                out, quality_model, text_col, min_prob=cfg.min_model_quality
            ),
        )

    if cfg.compression_band is not None:
        # the one Python (Arrow-batched) row-local stage — placed
        # after the codegen filters so only their survivors pay the
        # udf, and before the corpus-wide shuffles like every other
        # row-local stage
        from .operators.textstats import compression_filter

        lo, hi = cfg.compression_band
        out = _mark(
            "compression_band",
            compression_filter(out, text_col, min_ratio=lo, max_ratio=hi),
        )

    if cfg.paragraph_max_docs is not None:
        cleaned = paragraph_dedup(
            out, id_col, text_col, max_docs=cfg.paragraph_max_docs
        ).select(id_col, text_col)
        out = _mark(
            "paragraph_dedup", out.drop(text_col).join(cleaned, id_col)
        )

    if cfg.substring_w is not None:
        from .operators.substrings import remove_repeated_substrings

        cleaned = remove_repeated_substrings(
            out, id_col, text_col,
            w=cfg.substring_w, min_doc_freq=cfg.substring_min_doc_freq,
        ).select(id_col, text_col)
        out = _mark(
            "substring_dedup", out.drop(text_col).join(cleaned, id_col)
        )

    if cfg.exact_dedup:
        out = _mark("exact_dedup", dedup_exact(out, id_col, text_col))

    if cfg.near_dedup:
        out = _mark(
            "near_dedup", dedup_near(out, id_col, text_col, k=cfg.minhash_k)
        )

    if cfg.contamination_threshold is not None and benchmark is not None:
        flags = contamination_overlap(
            out, benchmark, id_col, text_col,
            n=cfg.contamination_ngram,
            threshold=cfg.contamination_threshold,
        )
        dirty = flags.filter(F.col("contaminated") == 1).select(id_col)
        out = _mark("decontaminated", out.join(dirty, id_col, "left_anti"))

    if cfg.max_ppl is not None and lm_model is not None:
        from .operators.lm import perplexity_filter

        uni, bi = lm_model
        out = _mark(
            "ppl_filtered",
            perplexity_filter(
                out, uni, bi, id_col, text_col, max_ppl=cfg.max_ppl
            ),
        )

    if cfg.source_cap is not None:
        out = _mark(
            "source_cap",
            cap_per_key(out, cfg.source_col, cfg.source_cap, id_col),
        )

    if cfg.target_mix is not None:
        out, _ = rebalance_to_target(
            out, cfg.source_col, cfg.target_mix, key_col=id_col
        )
        out = _mark("rebalanced", out)

    if cfg.pii_redact and cfg.pii_pseudonymize_salt is not None:
        raise ValueError(
            "pick ONE of pii_redact / pii_pseudonymize_salt"
        )
    if cfg.pii_redact:
        from .operators.pii import redact_pii

        out = _mark(
            "pii_redacted", out.withColumn(text_col, redact_pii(text_col))
        )
    elif cfg.pii_pseudonymize_salt is not None:
        from .operators.pii import pseudonymize_pii

        out = _mark(
            "pii_pseudonymized",
            out.withColumn(
                text_col,
                pseudonymize_pii(text_col, salt=cfg.pii_pseudonymize_salt),
            ),
        )

    if attribution:
        if dropped_frames:
            dropped = dropped_frames[0]
            for f in dropped_frames[1:]:
                dropped = dropped.unionByName(f)
        else:
            dropped = (
                docs.select(F.col(id_col))
                .limit(0)
                .withColumn("dropped_at", F.lit(""))
            )
        return out, dropped
    return out


def corpus_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    strata_cols: tuple[str, ...] = ("source",),
    bpe_merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-stratum corpus composition report — the table every mix
    decision starts from: document/token counts, length distribution,
    mean quality, and the exact-duplicate rate (1 - distinct
    fingerprints / docs).

    One grouped aggregation over the scan (token/quality are pure
    expressions; the fingerprint feeds a count-distinct) — no second
    pass, no collect of data-sized results. ``bpe_merges`` (from
    :func:`.operators.bpe.train_bpe`) adds ``n_bpe_tokens`` — the
    learned-tokenizer total a training run actually bills by — as one
    more aggregate in the same pass.
    """
    from .operators.dedup import fingerprint
    from .operators.textstats import quality_score, token_count

    toks = token_count(text_col)
    extra = []
    if bpe_merges is not None:
        from .operators.bpe import bpe_token_count

        extra.append(
            F.sum(bpe_token_count(text_col, bpe_merges))
            .cast("long")
            .alias("n_bpe_tokens")
        )
    return docs.groupBy(*[F.col(c) for c in strata_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        *extra,
        F.min(toks).cast("long").alias("min_tokens"),
        F.round(F.avg(toks), 2).alias("avg_tokens"),
        F.max(toks).cast("long").alias("max_tokens"),
        F.round(F.avg(quality_score(text_col)), 4).alias("avg_quality"),
        F.round(
            F.lit(1.0)
            - F.countDistinct(fingerprint(text_col)) / F.count(F.lit(1)),
            4,
        ).alias("dup_rate"),
    )
