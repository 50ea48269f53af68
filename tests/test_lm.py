"""Bigram LM perplexity scoring vs a pure-Python reference."""

import math

import pytest

from trial_submission_studio_spark.operators.lm import (
    bigram_logprob_scores,
    perplexity_filter,
    train_bigram_lm,
)

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog"),
]


def _py_model(texts):
    uni, bi = {}, {}
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            uni[a] = uni.get(a, 0) + 1
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi


def _py_score(text, uni, bi, v, k=1.0):
    toks = text.lower().split()
    lps = [
        math.floor(
            math.log(
                (bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * v)
            )
            * 1e6
            + 0.5
        )
        for a, b in zip(toks, toks[1:])
    ]
    return len(lps), sum(lps)


def test_bigram_scores_match_python_reference(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")
    v = unigrams.count()
    uni, bi = _py_model([t for _, t in REF])
    assert v == len(uni)

    queries = REF + [(4, "the cat sat on the mat"), (5, "zebra quux unseen")]
    q = spark.createDataFrame(queries, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logprob_e6"])
        for r in bigram_logprob_scores(
            q, unigrams, bigrams, "doc_id", "text"
        ).collect()
    }
    for doc_id, text in queries:
        assert got[doc_id] == _py_score(text, uni, bi, v), doc_id


def test_short_docs_score_null_and_filter_drops_them(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")
    q = spark.createDataFrame(
        REF + [(9, "solo"), (10, "")], "doc_id long, text string"
    )
    scores = {r["doc_id"]: r for r in bigram_logprob_scores(
        q, unigrams, bigrams, "doc_id", "text"
    ).collect()}
    assert scores[9]["n_bigrams"] == 0 and scores[9]["ppl"] is None
    assert scores[10]["n_bigrams"] == 0

    # in-domain docs have lower ppl than an unseen-vocab doc
    q2 = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (5, "zebra quux unseen vocab")],
        "doc_id long, text string",
    )
    s2 = {r["doc_id"]: r["ppl"] for r in bigram_logprob_scores(
        q2, unigrams, bigrams, "doc_id", "text"
    ).collect()}
    assert s2[1] < s2[5]
    kept = perplexity_filter(
        q2, unigrams, bigrams, "doc_id", "text", max_ppl=(s2[1] + s2[5]) / 2
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_scores_partition_invariant(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")
    a = sorted(
        tuple(r)
        for r in bigram_logprob_scores(
            df, unigrams, bigrams, "doc_id", "text"
        ).select("doc_id", "n_bigrams", "sum_logprob_e6").collect()
    )
    b = sorted(
        tuple(r)
        for r in bigram_logprob_scores(
            df.repartition(7), unigrams, bigrams, "doc_id", "text", broadcast_model=False
        ).select("doc_id", "n_bigrams", "sum_logprob_e6").collect()
    )
    assert a == b


def test_kn_scores_match_python_reference(spark):
    """Interpolated Kneser-Ney: e6-exact parity with a from-scratch
    Python implementation, incl. unseen contexts backing off to the
    continuation distribution."""
    import math

    from trial_submission_studio_spark.operators.lm import (
        kn_logprob_scores,
        train_bigram_lm,
    )

    train_texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train, "doc_id", "text")
    score_texts = {
        10: "the cat sat",
        11: "dog on mat",          # seen words, mostly unseen bigrams
        12: "zzz unknownword the", # unseen context -> continuation
    }
    test = spark.createDataFrame(
        list(score_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logprob_e6"])
        for r in kn_logprob_scores(
            test, uni, bi, "doc_id", "text", discount=0.75
        ).collect()
    }

    # reference model from the same training tokens
    D, EPS = 0.75, 1e-10
    toks = [t.split() for t in train_texts]
    ca, cab, fw, bw = {}, {}, {}, {}
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            ca[a] = ca.get(a, 0) + 1
            if (a, b) not in cab:
                fw[a] = fw.get(a, 0) + 1
                bw[b] = bw.get(b, 0) + 1
            cab[(a, b)] = cab.get((a, b), 0) + 1
    total_types = len(cab)

    def p_kn(a, b):
        pc = bw.get(b, 0) / total_types
        if ca.get(a, 0) == 0:
            return pc
        return max(cab.get((a, b), 0) - D, 0) / ca[a] + D * fw.get(a, 0) / ca[a] * pc

    for did, text in score_texts.items():
        ts = text.split()
        expect = sum(
            math.floor(math.log(p_kn(a, b) + EPS) * 1e6 + 0.5)
            for a, b in zip(ts, ts[1:])
        )
        assert got[did] == (len(ts) - 1, expect), did


def test_kn_is_a_proper_distribution(spark):
    """For a seen context, Σ_w P_KN(w|context) over the vocabulary =
    1 − mass assigned outside V via continuation ≈ 1 (exact when
    every vocab word has predecessors)."""
    from trial_submission_studio_spark.operators.lm import (
        kn_logprob_scores,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(0, "a b a c a b c b c a")], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train, "doc_id", "text")
    vocab = ["a", "b", "c"]
    probe = spark.createDataFrame(
        [(i, f"a {w}") for i, w in enumerate(vocab)], "doc_id long, text string"
    )
    import math

    rows = kn_logprob_scores(probe, uni, bi, "doc_id", "text").collect()
    total = sum(math.exp(r["sum_logprob_e6"] / 1e6) for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)


def test_kn_discount_validation(spark):
    from trial_submission_studio_spark.operators.lm import (
        kn_logprob_scores,
        train_bigram_lm,
    )

    train = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    uni, bi = train_bigram_lm(train, "doc_id", "text")
    with pytest.raises(ValueError):
        kn_logprob_scores(train, uni, bi, "doc_id", "text", discount=1.5)


def test_modified_kn_matches_python_reference(spark):
    """Modified KN (count-dependent D1/D2/D3+ from count-of-counts)
    e6-exact vs a from-scratch reference, and Σ P(w|ctx) ≈ 1."""
    from trial_submission_studio_spark.operators.lm import (
        kn_logprob_scores,
        train_bigram_lm,
    )

    train_texts = [
        "a b a b a c a b c b",
        "b c b a b a a c c a",
        "c a b b a c a b a b",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train, "doc_id", "text")

    # reference statistics
    toks = [t.split() for t in train_texts]
    ca, cab, bw = {}, {}, {}
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            ca[a] = ca.get(a, 0) + 1
            if (a, b) not in cab:
                bw[b] = bw.get(b, 0) + 1
            cab[(a, b)] = cab.get((a, b), 0) + 1
    total_types = len(cab)
    cc = {}
    for c in cab.values():
        cc[c] = cc.get(c, 0) + 1
    n1, n2, n3, n4 = (cc.get(k, 0) for k in (1, 2, 3, 4))
    y = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) else 0.5
    d1 = min(max(1 - 2 * y * n2 / n1 if n1 else 0.5, 0.0), 1.0)
    d2 = min(max(2 - 3 * y * n3 / n2 if n2 else 1.0, 0.0), 2.0)
    d3 = min(max(3 - 4 * y * n4 / n3 if n3 else 1.5, 0.0), 3.0)

    def disc(c):
        return d3 if c >= 3 else (d2 if c == 2 else (d1 if c == 1 else 0.0))

    def gamma(a):
        g = 0.0
        for (x, _b), c in cab.items():
            if x == a:
                g += disc(c) if c >= 1 else 0.0
        return g

    def p_mkn(a, b):
        pc = bw.get(b, 0) / total_types
        if ca.get(a, 0) == 0:
            return pc
        return (
            max(cab.get((a, b), 0) - disc(cab.get((a, b), 0)), 0) / ca[a]
            + gamma(a) / ca[a] * pc
        )

    import math

    probe_texts = {10: "a b c", 11: "c c a", 12: "zzz a b"}
    probe = spark.createDataFrame(
        list(probe_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logprob_e6"])
        for r in kn_logprob_scores(
            probe, uni, bi, "doc_id", "text", modified=True
        ).collect()
    }
    EPS = 1e-10
    for did, text in probe_texts.items():
        ts = text.split()
        expect = sum(
            math.floor(math.log(p_mkn(a, b) + EPS) * 1e6 + 0.5)
            for a, b in zip(ts, ts[1:])
        )
        assert got[did] == (len(ts) - 1, expect), did

    # proper distribution for a seen context
    vocab = ["a", "b", "c"]
    dist = spark.createDataFrame(
        [(i, f"a {w}") for i, w in enumerate(vocab)], "doc_id long, text string"
    )
    rows = kn_logprob_scores(dist, uni, bi, "doc_id", "text", modified=True).collect()
    total = sum(math.exp(r["sum_logprob_e6"] / 1e6) for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)


def test_trigram_kn_matches_python_reference(spark):
    """Order-3 interpolated KN: e6-exact parity with a from-scratch
    reference across seen trigrams, unseen (a,b) contexts (backoff
    to the type-count bigram level), unseen b (continuation), and
    full OOV."""
    from trial_submission_studio_spark.operators.lm import (
        train_trigram_lm,
        trigram_kn_scores,
    )

    train_texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "the cat ran on the rug",
        "a dog and a cat played",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    uni, bi, tri = train_trigram_lm(train, "doc_id", "text")

    D, EPS = 0.75, 1e-10
    toks = [t.split() for t in train_texts]
    cab, cabc, bw = {}, {}, {}
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            cab[(a, b)] = cab.get((a, b), 0) + 1
            if (a, b) not in [k for k in ()]:
                pass
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            cabc[(a, b, c)] = cabc.get((a, b, c), 0) + 1
    seen_bi = set()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            if (a, b) not in seen_bi:
                seen_bi.add((a, b))
                bw[b] = bw.get(b, 0) + 1
    total_types = len(seen_bi)
    n1p_ab = {}
    nmid_bc = {}
    for (a, b, c) in cabc:
        n1p_ab[(a, b)] = n1p_ab.get((a, b), 0) + 1
        nmid_bc[(b, c)] = nmid_bc.get((b, c), 0) + 1
    nmid_b = {}
    for (b, c), v in nmid_bc.items():
        nmid_b[b] = nmid_b.get(b, 0) + v
    n1p_b_fw = {}
    for (b, c) in nmid_bc:
        n1p_b_fw[b] = n1p_b_fw.get(b, 0) + 1

    def p_cont(c):
        return bw.get(c, 0) / total_types

    def p2(b, c):
        if nmid_b.get(b, 0) == 0:
            return p_cont(c)
        return (
            max(nmid_bc.get((b, c), 0) - D, 0) / nmid_b[b]
            + D * n1p_b_fw.get(b, 0) / nmid_b[b] * p_cont(c)
        )

    ctx_ab = {}
    for (a, b, c), v in cabc.items():
        ctx_ab[(a, b)] = ctx_ab.get((a, b), 0) + v

    def p3(a, b, c):
        if ctx_ab.get((a, b), 0) == 0:
            return p2(b, c)
        return (
            max(cabc.get((a, b, c), 0) - D, 0) / ctx_ab[(a, b)]
            + D * n1p_ab.get((a, b), 0) / ctx_ab[(a, b)] * p2(b, c)
        )

    import math

    probe_texts = {
        10: "the cat sat on",        # seen trigrams
        11: "mat the cat",           # unseen (a,b) context
        12: "zzz qqq the",           # unseen b → continuation
        13: "on the rug",
    }
    probe = spark.createDataFrame(
        list(probe_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["sum_logprob_e6"])
        for r in trigram_kn_scores(
            probe, uni, bi, tri, "doc_id", "text", discount=D
        ).collect()
    }
    for did, text in probe_texts.items():
        ts = text.split()
        expect = sum(
            math.floor(math.log(p3(a, b, c) + EPS) * 1e6 + 0.5)
            for a, b, c in zip(ts, ts[1:], ts[2:])
        )
        assert got[did] == (len(ts) - 2, expect), did


def test_trigram_kn_distribution_and_short_docs(spark):
    from trial_submission_studio_spark.operators.lm import (
        train_trigram_lm,
        trigram_kn_scores,
    )

    train = spark.createDataFrame(
        [(0, "a b c a b a c b a b c c a b")], "doc_id long, text string"
    )
    uni, bi, tri = train_trigram_lm(train, "doc_id", "text")
    import math

    vocab = ["a", "b", "c"]
    probe = spark.createDataFrame(
        [(i, f"a b {w}") for i, w in enumerate(vocab)], "doc_id long, text string"
    )
    rows = trigram_kn_scores(probe, uni, bi, tri, "doc_id", "text").collect()
    total = sum(math.exp(r["sum_logprob_e6"] / 1e6) for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)
    short = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    r = trigram_kn_scores(short, uni, bi, tri, "doc_id", "text").collect()[0]
    assert r["n_trigrams"] == 0 and r["sum_logprob_e6"] is None


def test_perplexity_filter_with_kn_scorer(spark):
    """perplexity_filter(scorer=kn_logprob_scores): the banding
    wrapper composes with the KN scorers unchanged."""
    from trial_submission_studio_spark.operators.lm import (
        kn_logprob_scores,
        perplexity_filter,
        train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat " * 5)], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train, "doc_id", "text")
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zz qq ww ee rr tt")],
        "doc_id long, text string",
    )
    kept = perplexity_filter(
        docs, uni, bi, "doc_id", "text", max_ppl=50.0,
        scorer=kn_logprob_scores, modified=True,
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_kn_context_counts_derived_from_bigrams(spark):
    """ADVICE r8: kn_logprob_scores derives c(w1) from the bigram
    table itself, so a caller passing RAW token counts (not
    train_bigram_lm's context counts) gets identical, exactly
    normalized scores."""
    from trial_submission_studio_spark.operators.lm import kn_logprob_scores

    df = spark.createDataFrame(REF, "doc_id long, text string")
    uni, bi = train_bigram_lm(df, "doc_id", "text")
    good = sorted(
        (r["doc_id"], r["sum_logprob_e6"])
        for r in kn_logprob_scores(df, uni, bi, "doc_id", "text").collect()
    )
    # raw token counts (counts every token, incl. document-final)
    from pyspark.sql import functions as F

    raw = (
        df.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok_a"))
        .groupBy("tok_a")
        .agg(F.count(F.lit(1)).alias("uni_count"))
    )
    got = sorted(
        (r["doc_id"], r["sum_logprob_e6"])
        for r in kn_logprob_scores(df, raw, bi, "doc_id", "text").collect()
    )
    assert got == good


def test_token_pattern_strips_punctuation(spark):
    """Regex tokenization ('word.' == 'word') via the shared
    tokenize.WORD_PATTERN flows through training and scoring."""
    from trial_submission_studio_spark.operators.tokenize import WORD_PATTERN

    punct = [(1, "The cat, sat. On the mat!"), (2, "the dog; sat on: the rug?")]
    clean = [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")]
    dfp = spark.createDataFrame(punct, "doc_id long, text string")
    dfc = spark.createDataFrame(clean, "doc_id long, text string")
    unip, bip = train_bigram_lm(dfp, "doc_id", "text", token_pattern=WORD_PATTERN)
    unic, bic = train_bigram_lm(dfc, "doc_id", "text")
    got = sorted(
        (r["doc_id"], r["sum_logprob_e6"])
        for r in bigram_logprob_scores(
            dfp, unip, bip, "doc_id", "text", token_pattern=WORD_PATTERN
        ).collect()
    )
    want = sorted(
        (r["doc_id"], r["sum_logprob_e6"])
        for r in bigram_logprob_scores(
            dfc, unic, bic, "doc_id", "text"
        ).collect()
    )
    assert got == want


def test_broadcast_model_auto_switch(spark, monkeypatch):
    """broadcast_model='auto' must (a) give identical scores in both
    regimes and (b) actually drop the model-side BroadcastExchange
    when the model exceeds the bound — the web-scale-LM OOM guard."""
    import trial_submission_studio_spark.operators.lm as lm_mod
    from trial_submission_studio_spark.operators.lm import kn_logprob_scores

    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")

    def plan(q):
        return q._jdf.queryExecution().executedPlan().toString()

    # small model, auto → broadcast path (scores match explicit True)
    q_auto = bigram_logprob_scores(df, unigrams, bigrams, "doc_id", "text")
    q_true = bigram_logprob_scores(
        df, unigrams, bigrams, "doc_id", "text", broadcast_model=True
    )
    rows_auto = sorted((r["doc_id"], r["sum_logprob_e6"]) for r in q_auto.collect())
    assert rows_auto == sorted(
        (r["doc_id"], r["sum_logprob_e6"]) for r in q_true.collect()
    )
    assert "BroadcastExchange" in plan(q_auto)

    # shrink the bound so THIS model counts as web-scale → auto picks
    # the shuffle join; scores are unchanged
    monkeypatch.setattr(lm_mod, "AUTO_BROADCAST_MODEL_ROWS", 2)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q_big = bigram_logprob_scores(df, unigrams, bigrams, "doc_id", "text")
        assert "BroadcastExchange" not in plan(q_big)
        assert rows_auto == sorted(
            (r["doc_id"], r["sum_logprob_e6"]) for r in q_big.collect()
        )
        q_kn = kn_logprob_scores(df, unigrams, bigrams, "doc_id", "text")
        assert "BroadcastExchange" not in plan(q_kn)
        want_kn = sorted(
            (r["doc_id"], r["sum_logprob_e6"])
            for r in kn_logprob_scores(
                df, unigrams, bigrams, "doc_id", "text", broadcast_model=True
            ).collect()
        )
        assert want_kn == sorted(
            (r["doc_id"], r["sum_logprob_e6"]) for r in q_kn.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    with pytest.raises(ValueError, match="broadcast_model"):
        bigram_logprob_scores(
            df, unigrams, bigrams, "doc_id", "text", broadcast_model="yes"
        )


def test_perplexity_buckets_global_terciles(spark):
    """head/middle/tail respect percentile_disc cutoffs computed over
    the scored population; exact-cutoff docs land in the LOWER
    bucket; unscoreable docs are dropped."""
    from trial_submission_studio_spark.operators.lm import perplexity_buckets

    train = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(train, "doc_id", "text")
    docs = spark.createDataFrame(
        REF
        + [
            (4, "the cat sat on the mat"),
            (5, "zebra quux unseen walrus"),
            (6, "dog"),  # 1 token: unscoreable
        ],
        "doc_id long, text string",
    )
    out = perplexity_buckets(
        docs, unigrams, bigrams, "doc_id", "text"
    ).collect()
    got = {r.doc_id: r.bucket for r in out}
    assert 6 not in got and len(got) == 5
    ppls = {
        r["doc_id"]: r["ppl"]
        for r in bigram_logprob_scores(
            docs, unigrams, bigrams, "doc_id", "text"
        ).collect()
        if r["ppl"] is not None
    }
    import math as _m

    vals = sorted(ppls.values())
    # percentile_disc(f): smallest value with cum. fraction >= f
    def _disc(f):
        return vals[_m.ceil(f * len(vals)) - 1]

    c1, c2 = _disc(1 / 3), _disc(2 / 3)
    for doc_id, p in ppls.items():
        want = "head" if p <= c1 else ("middle" if p <= c2 else "tail")
        assert got[doc_id] == want, (doc_id, p, c1, c2, got[doc_id])
    assert set(got.values()) == {"head", "middle", "tail"}


def test_perplexity_buckets_per_language(spark):
    """Cutoffs are computed WITHIN each language group, so a doc's
    bucket depends only on its own language's distribution."""
    from trial_submission_studio_spark.operators.lm import perplexity_buckets

    train = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(train, "doc_id", "text")
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the dog sat on the rug", "en"),
            (3, "a cat and a dog", "en"),
            # same texts tagged 'xx': same ppls, independent cutoffs
            (11, "the cat sat on the mat", "xx"),
            (12, "the dog sat on the rug", "xx"),
            (13, "a cat and a dog", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    out = perplexity_buckets(
        docs, unigrams, bigrams, "doc_id", "text",
        lang_col="lang", fractions=(0.5,), labels=("head", "tail"),
    ).collect()
    got = {r.doc_id: (r.lang, r.bucket) for r in out}
    assert len(got) == 6
    # identical distributions -> identical bucketing per mirror pair
    for a, b in ((1, 11), (2, 12), (3, 13)):
        assert got[a][1] == got[b][1]
    assert {v for _, v in got.values()} == {"head", "tail"}


def test_perplexity_buckets_validations(spark):
    from trial_submission_studio_spark.operators.lm import perplexity_buckets

    train = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(train, "doc_id", "text")
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(
            train, unigrams, bigrams, "doc_id", "text", labels=("a", "b")
        )
    with pytest.raises(ValueError, match="increasing"):
        perplexity_buckets(
            train, unigrams, bigrams, "doc_id", "text",
            fractions=(0.6, 0.4), labels=("a", "b", "c"),
        )
