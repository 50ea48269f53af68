"""N-gram language-model perplexity scoring (the CCNet filter stage).

CCNet (Wenzek et al., 2020) buckets web documents by the perplexity
of a KenLM 5-gram model trained on a clean reference corpus; the
low-perplexity bucket becomes training data. KenLM itself is a
single-node C++ artifact — this module implements the same pipeline
stage as pure DataFrame algebra: a token bigram model with add-k
smoothing, trained distributed (two groupBy counts), scored
distributed (explode + two broadcast-or-shuffle joins + one
aggregation).

Determinism note: per-bigram log-probabilities are summed as e6
fixed-point INTEGERS, not floats — integer addition is associative,
so scores are bit-identical across partitionings, engines, and
retries (the same trick as text_analysis_gates' e4 quality sums).

Scale shape:

- The model is two count tables bounded by vocabulary size (unigrams)
  and observed-bigram count — corpus-sublinear, join-key width is one
  or two tokens. Broadcast when the model fits (a 10⁶-bigram model is
  ~tens of MB); shuffle-join otherwise.
- Scoring explodes documents to bigram rows once; both joins key on
  the same exploded frame, and the final per-doc aggregation is
  map-side combined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: auto-switch bound for the model-side broadcast: a model whose
#: LARGEST count table holds at most this many rows broadcasts (a
#: 10⁶-row bigram table is ~tens of MB serialized — comfortably
#: executor-resident); anything bigger takes the shuffle join
#: automatically, so a CCNet-style web-scale reference LM (bigram
#: table = vocabulary²-tail-sized, GBs) can never OOM an executor
#: through the default path. Same discipline as
#: `similarity.AUTO_DISTRIBUTE_QUERIES`.
AUTO_BROADCAST_MODEL_ROWS = 1_000_000


def _resolve_broadcast_model(model_table: DataFrame, broadcast_model) -> bool:
    """``"auto"``/``None`` = probe the largest model table with an
    early-stopping ``limit(n+1).count()`` (bounded work even against
    a web-scale model — the scan stops once n+1 rows surface) and
    broadcast only when it fits under
    :data:`AUTO_BROADCAST_MODEL_ROWS`. Explicit ``True``/``False``
    is honored unchanged."""
    if broadcast_model is True or broadcast_model is False:
        return broadcast_model
    if broadcast_model not in (None, "auto"):
        raise ValueError(
            "broadcast_model must be True, False, or 'auto'; got "
            f"{broadcast_model!r}"
        )
    bound = AUTO_BROADCAST_MODEL_ROWS
    return model_table.limit(bound + 1).count() <= bound


def _tokens(
    text_col: str, lowercase: bool, token_pattern: str | None = None
) -> Column:
    # shared lexical-family tokenizer (same convention as bm25 and
    # contamination); token_pattern=None keeps the whitespace split
    from .tokenize import words

    return words(text_col, lowercase=lowercase, token_pattern=token_pattern)


def _doc_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool,
    token_pattern: str | None = None,
) -> DataFrame:
    # codegen shape (explode positions + element_at), not an
    # interpreted higher-order transform lambda — this is the per-row
    # hot path of both training and scoring
    toks = _tokens(text_col, lowercase, token_pattern)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(
            id_col,
            "__toks",
            F.explode(F.sequence(F.lit(1), F.size("__toks") - 1)).alias("__i"),
        )
        .select(
            id_col,
            F.element_at("__toks", F.col("__i")).alias("tok_a"),
            F.element_at("__toks", F.col("__i") + 1).alias("tok_b"),
        )
    )


def train_bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
    token_pattern: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Count tables (unigrams: tok_a, uni_count; bigrams: tok_a,
    tok_b, bi_count) from a reference corpus. Persist both between
    runs — training is two shuffles, scoring reuses the tables.
    ``uni_count`` is the CONTEXT count Σ_w2 c(w1 w2) (tok_a
    occurrences in bigram rows), which is what exact normalization
    needs — not the raw token frequency. ``token_pattern`` (see
    `tokenize.words`) must match between training and scoring."""
    bg = _doc_bigrams(df, id_col, text_col, lowercase, token_pattern)
    bigrams = bg.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("long").alias("bi_count")
    )
    unigrams = bg.groupBy("tok_a").agg(
        F.count(F.lit(1)).cast("long").alias("uni_count")
    )
    return unigrams, bigrams


def bigram_logprob_scores(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 1.0,
    vocab_size: int | None = None,
    lowercase: bool = True,
    broadcast_model: bool | str = "auto",
    token_pattern: str | None = None,
) -> DataFrame:
    """Per-document bigram log-likelihood under the trained model.

    Add-k smoothing: ln((c_ab + k) / (c_a + k·V)) per bigram, with
    unseen tokens/bigrams falling back to counts of 0. Output one row
    per doc: (id, n_bigrams, sum_logprob_e6, avg_logprob, ppl) where
    sum_logprob_e6 is the deterministic fixed-point integer sum and
    avg/ppl are derived from it (ppl = exp(-avg), the CCNet bucketing
    statistic; lower = more reference-like).

    ``broadcast_model="auto"`` (default) size-probes the bigram
    table (the largest of the two) and broadcasts only when it fits
    — see :func:`_resolve_broadcast_model`.
    """
    broadcast_model = _resolve_broadcast_model(bigrams, broadcast_model)
    v = int(vocab_size) if vocab_size is not None else unigrams.count()
    uni = unigrams.withColumnRenamed("uni_count", "__ca")
    bi = bigrams.withColumnRenamed("bi_count", "__cab")
    if broadcast_model:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    bg = _doc_bigrams(df, id_col, text_col, lowercase, token_pattern)
    scored = (
        bg.join(bi, ["tok_a", "tok_b"], "left")
        .join(uni, ["tok_a"], "left")
        .select(
            F.col(id_col),
            F.floor(
                F.log(
                    (F.coalesce(F.col("__cab"), F.lit(0)) + F.lit(float(k)))
                    / (F.coalesce(F.col("__ca"), F.lit(0)) + F.lit(float(k) * v))
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__lp_e6"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__lp_e6").cast("long").alias("sum_logprob_e6"),
    )
    # docs with < 2 tokens have no bigrams: re-join so they score NULL
    base = df.select(F.col(id_col)).distinct()
    out = base.join(per_doc, id_col, "left")
    avg = F.col("sum_logprob_e6") / (F.col("n_bigrams") * F.lit(1e6))
    return out.select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "sum_logprob_e6",
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("ppl"),
    )


def perplexity_filter(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str,
    text_col: str,
    max_ppl: float,
    scorer=None,
    **score_kwargs,
) -> DataFrame:
    """Keep documents scoring at or below ``max_ppl`` (docs too short
    to score are dropped — no evidence either way, CCNet discards
    them too). ``scorer`` defaults to the add-k
    :func:`bigram_logprob_scores`; pass :func:`kn_logprob_scores`
    (optionally with ``modified=True`` in ``score_kwargs``) to band
    on Kneser-Ney perplexities with the same call shape."""
    score_fn = scorer if scorer is not None else bigram_logprob_scores
    scores = score_fn(df, unigrams, bigrams, id_col, text_col, **score_kwargs)
    keep = scores.filter(F.col("ppl") <= max_ppl).select(id_col)
    return df.join(keep, id_col, "left_semi")


def kn_logprob_scores(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    epsilon: float = 1e-10,
    lowercase: bool = True,
    broadcast_model: bool | str = "auto",
    modified: bool = False,
    token_pattern: str | None = None,
) -> DataFrame:
    """Per-document log-likelihood under INTERPOLATED KNESER-NEY
    smoothing — the quality upgrade over add-k (`
    bigram_logprob_scores`) that Chen & Goodman (1999) established
    as the strong n-gram baseline; KenLM (the model CCNet actually
    runs) uses modified KN.

    P(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
               + D·N1+(w1,·)/c(w1) · P_cont(w2),
    P_cont(w2) = N1+(·,w2)/N1+(·,·)  (how many CONTEXTS a word
    completes — the "Francisco" fix: frequent-but-predictable words
    get low continuation mass). Unseen contexts back off to P_cont
    directly; ``epsilon`` floors fully-OOV words so log stays
    finite.

    The three KN statistics (distinct followers per context,
    distinct predecessors per word, total bigram types) derive from
    the SAME count tables `train_bigram_lm` returns — three
    model-sized aggregations here, no new corpus pass. Output
    schema, e6 fixed-point determinism, and the short-doc NULL
    convention match `bigram_logprob_scores` exactly, so
    `perplexity_filter`-style banding composes unchanged.

    ``modified=True`` switches to MODIFIED Kneser-Ney (Chen &
    Goodman's final form; KenLM's default): three count-dependent
    discounts D1/D2/D3+ estimated from the bigram count-of-counts
    (Y = n1/(n1+2n2); Dk = k − (k+1)·Y·n_{k+1}/n_k), with the
    per-context backoff mass Σ_k Dk·Nk(w1,·)/c(w1); ``discount`` is
    then ignored. Degenerate count-of-counts (tiny corpora) clamp
    the discounts into [0, k]."""
    d = float(discount)
    if not 0 < d < 1:
        raise ValueError("discount must be in (0, 1)")
    broadcast_model = _resolve_broadcast_model(bigrams, broadcast_model)
    followers = bigrams.groupBy("tok_a").agg(
        F.count(F.lit(1)).cast("long").alias("__n1p_fw"),
        F.sum((F.col("bi_count") == 1).cast("long")).alias("__n1_fw"),
        F.sum((F.col("bi_count") == 2).cast("long")).alias("__n2_fw"),
        F.sum((F.col("bi_count") >= 3).cast("long")).alias("__n3p_fw"),
    )
    predecessors = bigrams.groupBy("tok_b").agg(
        F.count(F.lit(1)).cast("long").alias("__n1p_bw")
    )
    total_types = bigrams.count()
    # Context denominator c(w1) = Σ_w2 c(w1 w2), derived from the
    # BIGRAM table (like trigram_kn_scores derives its context counts
    # from the trigram table) rather than trusting the caller's
    # unigram table. When `unigrams` comes from train_bigram_lm the
    # two are identical; when a caller passes raw token counts this
    # keeps Σ_w2 P(w2|w1) = 1 exact instead of leaking
    # end-of-sequence mass for document-final words.
    uni = bigrams.groupBy("tok_a").agg(F.sum("bi_count").alias("__ca"))
    bi = bigrams.withColumnRenamed("bi_count", "__cab")
    if broadcast_model:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
        followers, predecessors = F.broadcast(followers), F.broadcast(predecessors)
    bg = _doc_bigrams(df, id_col, text_col, lowercase, token_pattern)
    ca = F.coalesce(F.col("__ca"), F.lit(0)).cast("double")
    cab = F.coalesce(F.col("__cab"), F.lit(0)).cast("double")
    n1p_fw = F.coalesce(F.col("__n1p_fw"), F.lit(0)).cast("double")
    p_cont = (
        F.coalesce(F.col("__n1p_bw"), F.lit(0)).cast("double")
        / F.lit(float(total_types))
    )
    if modified:
        # count-of-counts over bigram types (4 scalars, one agg)
        cc = {
            int(r["c"]): int(r["n"])
            for r in bigrams.groupBy(F.col("bi_count").alias("c"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n1, n2, n3, n4 = (cc.get(k, 0) for k in (1, 2, 3, 4))
        y = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5
        d1 = min(max(1 - 2.0 * y * n2 / n1 if n1 else 0.5, 0.0), 1.0)
        d2 = min(max(2 - 3.0 * y * n3 / n2 if n2 else 1.0, 0.0), 2.0)
        d3 = min(max(3 - 4.0 * y * n4 / n3 if n3 else 1.5, 0.0), 3.0)
        disc = (
            F.when(cab >= 3, F.lit(d3))
            .when(cab == 2, F.lit(d2))
            .when(cab == 1, F.lit(d1))
            .otherwise(F.lit(0.0))
        )
        gamma = (
            F.lit(d1) * F.coalesce(F.col("__n1_fw"), F.lit(0))
            + F.lit(d2) * F.coalesce(F.col("__n2_fw"), F.lit(0))
            + F.lit(d3) * F.coalesce(F.col("__n3p_fw"), F.lit(0))
        )
        p_kn = F.when(
            ca > 0,
            F.greatest(cab - disc, F.lit(0.0)) / ca + gamma / ca * p_cont,
        ).otherwise(p_cont)
    else:
        p_kn = F.when(
            ca > 0,
            F.greatest(cab - F.lit(d), F.lit(0.0)) / ca
            + F.lit(d) * n1p_fw / ca * p_cont,
        ).otherwise(p_cont)
    scored = (
        bg.join(bi, ["tok_a", "tok_b"], "left")
        .join(uni, ["tok_a"], "left")
        .join(followers, ["tok_a"], "left")
        .join(predecessors, ["tok_b"], "left")
        .select(
            F.col(id_col),
            F.floor(
                F.log(p_kn + F.lit(float(epsilon))) * 1e6 + F.lit(0.5)
            )
            .cast("long")
            .alias("__lp_e6"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__lp_e6").cast("long").alias("sum_logprob_e6"),
    )
    base = df.select(F.col(id_col)).distinct()
    out = base.join(per_doc, id_col, "left")
    avg = F.col("sum_logprob_e6") / (F.col("n_bigrams") * F.lit(1e6))
    return out.select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "sum_logprob_e6",
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("ppl"),
    )


def _doc_trigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool,
    token_pattern: str | None = None,
) -> DataFrame:
    toks = _tokens(text_col, lowercase, token_pattern)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= 3)
        .select(
            id_col,
            "__toks",
            F.explode(F.sequence(F.lit(1), F.size("__toks") - 2)).alias("__i"),
        )
        .select(
            id_col,
            F.element_at("__toks", F.col("__i")).alias("tok_a"),
            F.element_at("__toks", F.col("__i") + 1).alias("tok_b"),
            F.element_at("__toks", F.col("__i") + 2).alias("tok_c"),
        )
    )


def train_trigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lowercase: bool = True,
    token_pattern: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (unigrams, bigrams, trigrams) count tables — the bigram
    tables are `train_bigram_lm`'s exactly, plus
    ``(tok_a, tok_b, tok_c, tri_count)``. One extra corpus pass."""
    uni, bi = train_bigram_lm(df, id_col, text_col, lowercase, token_pattern)
    tri = (
        _doc_trigrams(df, id_col, text_col, lowercase, token_pattern)
        .groupBy("tok_a", "tok_b", "tok_c")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_count"))
    )
    return uni, bi, tri


def trigram_kn_scores(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    trigrams: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    epsilon: float = 1e-10,
    lowercase: bool = True,
    broadcast_model: bool | str = "auto",
    token_pattern: str | None = None,
) -> DataFrame:
    """Per-document log-likelihood under ORDER-3 interpolated
    Kneser-Ney — one step closer to the KenLM 5-gram CCNet runs:

    P3(c|ab) = max(c(abc)−D,0)/c(ab) + D·N1+(ab·)/c(ab)·P2(c|b)
    P2(c|b)  = max(N1+(·bc)−D,0)/N1+(·b·)
               + D·N1+(b·)/N1+(·b·)·Pcont(c)
    Pcont(c) = N1+(·c)/N1+(··)

    — the mid level uses CONTINUATION (type) counts, the textbook
    recursion. Unseen (a,b) context backs off to P2; unseen b to
    Pcont; ``epsilon`` floors OOV. Every statistic derives from the
    trigram/bigram count tables via model-sized aggregations (no
    extra corpus pass); scoring is one explode + six
    broadcast-or-shuffle joins + the e6 fixed-point sum, mirroring
    the bigram scorers' contract (docs with < 3 tokens score NULL)."""
    d = float(discount)
    if not 0 < d < 1:
        raise ValueError("discount must be in (0, 1)")
    # probe the TRIGRAM table — the largest of the three model tables
    broadcast_model = _resolve_broadcast_model(trigrams, broadcast_model)
    tri_abc = trigrams.select(
        "tok_a", "tok_b", "tok_c", F.col("tri_count").alias("__cabc")
    )
    # top-level context count = Σ_c c(abc), NOT the raw bigram count:
    # a bigram occurring at sequence end has no continuation, and
    # dividing by the raw count leaks that mass (the </s> accounting
    # the sentence-marker formulation solves; deriving the context
    # count from the trigram table is the marker-free equivalent and
    # keeps Σ_c P(c|ab) = 1 exactly)
    fw_ab = trigrams.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("long").alias("__n1p_ab"),
        F.sum("tri_count").cast("long").alias("__cab"),
    )
    mid_bc = trigrams.groupBy(
        F.col("tok_b").alias("tok_b"), F.col("tok_c").alias("tok_c")
    ).agg(F.count(F.lit(1)).cast("long").alias("__nmid_bc"))
    mid_b = mid_bc.groupBy("tok_b").agg(
        F.sum("__nmid_bc").cast("long").alias("__nmid_b")
    )
    # mid-level backoff weight: distinct continuations of b IN THE
    # CONTINUATION TABLE (|{c : N1+(·bc) > 0}|) — using the raw
    # bigram follower count here would break normalization, since
    # bigrams seen only without a predecessor have no continuation
    # row to discount against
    fw_b = mid_bc.groupBy("tok_b").agg(
        F.count(F.lit(1)).cast("long").alias("__n1p_b_fw")
    )
    pred_c = bigrams.groupBy(F.col("tok_b").alias("tok_c")).agg(
        F.count(F.lit(1)).cast("long").alias("__n1p_c_bw")
    )
    total_types = bigrams.count()
    if broadcast_model:
        tri_abc = F.broadcast(tri_abc)
        fw_ab, mid_bc, mid_b = (
            F.broadcast(fw_ab), F.broadcast(mid_bc), F.broadcast(mid_b),
        )
        fw_b, pred_c = F.broadcast(fw_b), F.broadcast(pred_c)

    tg = _doc_trigrams(df, id_col, text_col, lowercase, token_pattern)
    joined = (
        tg.join(tri_abc, ["tok_a", "tok_b", "tok_c"], "left")
        .join(fw_ab, ["tok_a", "tok_b"], "left")
        .join(mid_bc, ["tok_b", "tok_c"], "left")
        .join(mid_b, ["tok_b"], "left")
        .join(fw_b, ["tok_b"], "left")
        .join(pred_c, ["tok_c"], "left")
    )
    cabc = F.coalesce(F.col("__cabc"), F.lit(0)).cast("double")
    cab = F.coalesce(F.col("__cab"), F.lit(0)).cast("double")
    n1p_ab = F.coalesce(F.col("__n1p_ab"), F.lit(0)).cast("double")
    nmid_bc = F.coalesce(F.col("__nmid_bc"), F.lit(0)).cast("double")
    nmid_b = F.coalesce(F.col("__nmid_b"), F.lit(0)).cast("double")
    n1p_b_fw = F.coalesce(F.col("__n1p_b_fw"), F.lit(0)).cast("double")
    p_cont = (
        F.coalesce(F.col("__n1p_c_bw"), F.lit(0)).cast("double")
        / F.lit(float(total_types))
    )
    p2 = F.when(
        nmid_b > 0,
        F.greatest(nmid_bc - F.lit(d), F.lit(0.0)) / nmid_b
        + F.lit(d) * n1p_b_fw / nmid_b * p_cont,
    ).otherwise(p_cont)
    p3 = F.when(
        cab > 0,
        F.greatest(cabc - F.lit(d), F.lit(0.0)) / cab
        + F.lit(d) * n1p_ab / cab * p2,
    ).otherwise(p2)
    scored = joined.select(
        F.col(id_col),
        F.floor(F.log(p3 + F.lit(float(epsilon))) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("__lp_e6"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("__lp_e6").cast("long").alias("sum_logprob_e6"),
    )
    base = df.select(F.col(id_col)).distinct()
    out = base.join(per_doc, id_col, "left")
    avg = F.col("sum_logprob_e6") / (F.col("n_trigrams") * F.lit(1e6))
    return out.select(
        id_col,
        F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
        "sum_logprob_e6",
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("ppl"),
    )


def perplexity_buckets(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lang_col: str | None = None,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    scorer=None,
    **score_kwargs,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by perplexity
    quantile, per language when ``lang_col`` is given (CCNet cuts
    within each language because absolute perplexities aren't
    comparable across reference LMs). Returns
    ``(id_col[, lang_col], ppl, bucket)``; docs too short to score
    are dropped, mirroring :func:`perplexity_filter`.

    Cutoffs are ``percentile_disc`` — ACTUAL dataset values (the
    `operators/outliers.py` discipline), so the same cut reproduces
    bit-for-bit in any engine; a doc exactly ON a cutoff goes to the
    lower bucket (``ppl <= cutoff``).

    Scale shape: one corpus-grain scoring pass (the chosen scorer),
    ONE aggregation to language grain for all cutoffs, a broadcast
    join back (languages = config-sized), and a codegen CASE — no
    window over the corpus, no global sort (an ntile() would need
    one; quantile cutoffs don't)."""
    if len(labels) != len(fractions) + 1:
        raise ValueError("need exactly len(fractions)+1 labels")
    if list(fractions) != sorted(set(fractions)) or not all(
        0 < f < 1 for f in fractions
    ):
        raise ValueError("fractions must be strictly increasing, in (0,1)")
    score_fn = scorer if scorer is not None else bigram_logprob_scores
    scores = score_fn(df, unigrams, bigrams, id_col, text_col, **score_kwargs)
    keyed = scores.filter(F.col("ppl").isNotNull()).select(id_col, "ppl")
    if lang_col is not None:
        keyed = keyed.join(df.select(id_col, lang_col), id_col)
        grp = keyed.groupBy(lang_col)
    else:
        grp = keyed.groupBy()
    cuts = grp.agg(
        *[
            F.expr(
                f"percentile_disc({f!r}) WITHIN GROUP (ORDER BY ppl)"
            ).alias(f"__cut{i}")
            for i, f in enumerate(fractions)
        ]
    )
    joined = (
        keyed.join(F.broadcast(cuts), lang_col)
        if lang_col is not None
        else keyed.crossJoin(F.broadcast(cuts))
    )
    bucket = F.lit(labels[-1])
    for i in range(len(fractions) - 1, -1, -1):
        bucket = F.when(
            F.col("ppl") <= F.col(f"__cut{i}"), F.lit(labels[i])
        ).otherwise(bucket)
    out_cols = [id_col] + ([lang_col] if lang_col else []) + [
        F.col("ppl"), bucket.alias("bucket"),
    ]
    return joined.select(*out_cols)
