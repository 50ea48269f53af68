"""Corpus-governance operators: paragraph-frequency dedup (boilerplate
removal), SemDeDup semantic dedup, and per-key quota capping."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows
from trial_submission_studio_spark.operators.paragraphs import (
    paragraph_dedup,
    paragraph_doc_freq,
    split_paragraphs,
)
from trial_submission_studio_spark.operators.sampling import cap_per_key
from trial_submission_studio_spark.operators.similarity import (
    semantic_dedup,
    semantic_dup_pairs,
)

BOILER = "subscribe to our newsletter."


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"alpha beta\n{BOILER}\ngamma delta"),
            (2, f"epsilon zeta\n{BOILER}"),
            (3, f"{BOILER}\neta theta"),
            (4, BOILER),  # nothing but boilerplate
            (5, "iota kappa\nlambda mu"),
        ],
        "doc_id long, text string",
    )


def test_paragraph_dedup_drops_boilerplate_keeps_order(spark):
    out = paragraph_dedup(_docs(spark), "doc_id", "text", max_docs=2)
    got = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"]) for r in out.collect()}
    assert got[1] == ("alpha beta\ngamma delta", 2, 1)
    assert got[2] == ("epsilon zeta", 1, 1)
    assert got[3] == ("eta theta", 1, 1)
    assert got[4] == ("", 0, 1)  # all-boilerplate doc survives as empty
    assert got[5] == ("iota kappa\nlambda mu", 2, 0)


def test_paragraph_dedup_normalization_folds_case(spark):
    df = spark.createDataFrame(
        [(1, "Shared Para\nunique one"), (2, "  shared para \nunique two")],
        "doc_id long, text string",
    )
    out = paragraph_dedup(df, "doc_id", "text", max_docs=1)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # normalized forms collide -> doc_freq 2 -> dropped; originals differ
    assert got == {1: "unique one", 2: "unique two"}
    raw = paragraph_dedup(df, "doc_id", "text", max_docs=1, normalize=False)
    gotr = {r["doc_id"]: r["text"] for r in raw.collect()}
    assert gotr[1] == "Shared Para\nunique one"


def test_paragraph_doc_freq_counts_documents_not_occurrences(spark):
    # the same paragraph twice in ONE doc must count once
    df = spark.createDataFrame([(1, "x\nx"), (2, "x\ny")], "doc_id long, text string")
    ex = split_paragraphs(df, "doc_id", "text")
    freq = {r["doc_freq"] for r in paragraph_doc_freq(ex, "doc_id").collect()}
    assert freq == {2, 1}  # 'x' in 2 docs (not 3 occurrences), 'y' in 1


def test_paragraph_dedup_partition_invariant(spark):
    d = _docs(spark)
    a = rows(paragraph_dedup(d, "doc_id", "text", max_docs=2))
    b = rows(paragraph_dedup(d.repartition(7), "doc_id", "text", max_docs=2))
    assert a == b


def test_semantic_dedup_drops_planted_keeps_min_id(spark):
    base = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    planted = [(101, [2.0, 0.0, 0.0, 0.0]), (102, [0.0, 3.0, 0.0, 0.0])]
    df = spark.createDataFrame(
        base + planted, "vec_id long, embedding array<float>"
    )
    pairs = rows(
        semantic_dup_pairs(df, threshold=0.99, n_centroids=3), "id_a", "id_b"
    )
    assert (1, 101) in pairs and (2, 102) in pairs
    surv = semantic_dedup(df, threshold=0.99, n_centroids=3)
    assert sorted(r["vec_id"] for r in surv.collect()) == [1, 2, 3]


def test_semantic_dedup_clique_keeps_exactly_one(spark):
    df = spark.createDataFrame(
        [
            (10, [1.0, 1.0]),
            (20, [2.0, 2.0]),
            (30, [5.0, 5.0]),
            (40, [-1.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    surv = semantic_dedup(df, threshold=0.999, n_centroids=2)
    assert sorted(r["vec_id"] for r in surv.collect()) == [10, 40]


def test_cap_per_key_enforces_quota_deterministically(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    out = cap_per_key(df, "source", 10, "doc_id")
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"big": 10, "small": 10}
    # identical selection across partitionings (hash priority is pure)
    again = cap_per_key(df.repartition(13), "source", 10, "doc_id")
    assert rows(out) == rows(again)


def test_cap_per_key_priority_expression(spark):
    df = spark.createDataFrame(
        [(i, "s", float(i)) for i in range(10)],
        "doc_id long, source string, score double",
    )
    best = cap_per_key(df, "source", 3, "doc_id", priority=F.desc("score"))
    assert sorted(r["doc_id"] for r in best.collect()) == [7, 8, 9]
    with pytest.raises(ValueError):
        cap_per_key(df, "source", 0, "doc_id")


def test_rebalance_to_target_distribution(spark):
    from trial_submission_studio_spark.operators.sampling import (
        rebalance_to_target,
    )

    data = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "fr") for i in range(100)]
        + [(2000 + i, "de") for i in range(100)]
    )
    df = spark.createDataFrame(data, "doc_id long, lang string")
    out, fracs = rebalance_to_target(
        df, "lang", {"en": 0.5, "fr": 0.5}, key_col="doc_id"
    )
    # fr is limiting: N = 100/0.5 = 200 -> fr keeps all, en keeps 1/4
    assert fracs["fr"] == 1.0 and abs(fracs["en"] - 0.25) < 1e-9
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "de" not in got and got["fr"] == 100
    assert abs(got["en"] - 100) <= 20  # hash selection is approximate
    # deterministic across partitionings
    out2, _ = rebalance_to_target(
        df.repartition(9), "lang", {"en": 0.5, "fr": 0.5}, key_col="doc_id"
    )
    assert rows(out) == rows(out2)
    with pytest.raises(ValueError):
        rebalance_to_target(df, "lang", {"xx": 1.0}, key_col="doc_id")


def test_paragraph_dedup_identity_property(spark):
    """Property: with max_docs >= corpus size nothing is ever dropped,
    and reassembly is byte-lossless for any text (including empty
    paragraphs, repeated separators, trailing newlines)."""
    from hypothesis import given, settings, strategies as st

    para = st.text(alphabet="ab X.", min_size=0, max_size=12)
    doc = st.lists(para, min_size=1, max_size=6).map("\n".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = paragraph_dedup(df, "doc_id", "text", max_docs=len(texts))
        got = {r["doc_id"]: (r["text"], r["n_dropped"]) for r in out.collect()}
        for i, t in enumerate(texts):
            assert got[i] == (t, 0), (t, got[i])

    run()


def test_remove_repeated_substrings_identity_property(spark):
    """Property: a doc-frequency bar no corpus can meet means nothing
    is excised — output is exactly the whitespace-normalized input."""
    from hypothesis import given, settings, strategies as st

    from trial_submission_studio_spark.operators.substrings import (
        remove_repeated_substrings,
    )

    word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
    doc = st.lists(word, min_size=0, max_size=15).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = remove_repeated_substrings(
            df, "doc_id", "text", w=3, min_doc_freq=len(texts) + 1
        )
        got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in out.collect()}
        for i, t in enumerate(texts):
            norm = " ".join(t.split())
            assert got[i] == (norm, 0), (t, got[i])

    run()


def test_split_corpus_disjoint_exhaustive_stable(spark):
    from trial_submission_studio_spark.operators.sampling import split_corpus

    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    splits = split_corpus(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    ids = {k: {r["doc_id"] for r in v.collect()} for k, v in splits.items()}
    assert sum(len(s) for s in ids.values()) == 500  # exhaustive
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    assert 320 <= len(ids["train"]) <= 470  # ~80%, hash-approximate
    # growing the corpus never reassigns an existing key (no leakage)
    grown = spark.createDataFrame([(i,) for i in range(800)], "doc_id long")
    splits2 = split_corpus(grown, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    ids2 = {k: {r["doc_id"] for r in v.collect()} for k, v in splits2.items()}
    for k in ids:
        assert ids[k] <= ids2[k]
    with pytest.raises(ValueError):
        split_corpus(df, "doc_id", {})


def test_paragraph_dedup_null_text_survives_as_empty(spark):
    df = spark.createDataFrame(
        [(1, "real\ncontent"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in
           paragraph_dedup(df, "doc_id", "text", max_docs=5).collect()}
    assert out == {1: "real\ncontent", 2: ""}


def test_shuffle_deterministic_partition_invariant(spark):
    from trial_submission_studio_spark.operators.sampling import (
        shuffle_deterministic,
    )

    df = spark.createDataFrame([(i, f"d{i}") for i in range(60)], "doc_id long, text string")
    o1 = [r["doc_id"] for r in shuffle_deterministic(df.repartition(1), "doc_id", seed=7).collect()]
    o7 = [r["doc_id"] for r in shuffle_deterministic(df.repartition(7), "doc_id", seed=7).collect()]
    assert o1 == o7
    assert sorted(o1) == list(range(60))
    assert o1 != list(range(60))  # actually permuted
    o_other = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", seed=8).collect()]
    assert o_other != o1  # a new seed is a new epoch order


def test_calibrate_lsh_s_curve():
    """Calibration picks factorizations whose S-curve crosses near
    the requested threshold, monotonically in the threshold, and
    matches a brute-force MinHash simulation."""
    import itertools
    import random

    import pytest

    from trial_submission_studio_spark.operators.dedup import calibrate_lsh

    lo = calibrate_lsh(0.3, num_hashes=32)
    hi = calibrate_lsh(0.9, num_hashes=32)
    # low thresholds want many bands (few rows); high want the reverse
    assert lo["bands"] > hi["bands"]
    assert lo["bands"] * lo["rows_per_band"] == 32
    assert hi["bands"] * hi["rows_per_band"] == 32
    # the half-probability point of the chosen curve is near the ask
    for cfg, t in ((lo, 0.3), (hi, 0.9)):
        p = cfg["candidate_prob"]
        crossing = next(s / 1000 for s in range(1, 1000) if p(s / 1000) >= 0.5)
        assert abs(crossing - t) < 0.15
    # candidate_prob matches a simulated banded MinHash within noise
    rng = random.Random(7)
    cfg = calibrate_lsh(0.5, num_hashes=16)
    b, r = cfg["bands"], cfg["rows_per_band"]
    s = 0.6
    trials = 2000
    hits = 0
    for _ in range(trials):
        # each hash agrees independently w.p. s (the MinHash property)
        agree = [rng.random() < s for _ in range(16)]
        if any(all(agree[i * r : (i + 1) * r]) for i in range(b)):
            hits += 1
    assert hits / trials == pytest.approx(cfg["candidate_prob"](s), abs=0.05)
    with pytest.raises(ValueError):
        calibrate_lsh(1.5)


def test_split_corpus_grouped_no_near_dup_leakage(spark):
    """Members of a near-duplicate component never straddle splits;
    the plain id-hash split demonstrably leaks on the same data."""
    from trial_submission_studio_spark.operators.dedup import duplicate_groups
    from trial_submission_studio_spark.operators.sampling import (
        split_corpus,
        split_corpus_grouped,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    # planted near-dup chains: (3k, 3k+1, 3k+2) for k < 40
    pairs = spark.createDataFrame(
        [(3 * k, 3 * k + 1) for k in range(40)]
        + [(3 * k + 1, 3 * k + 2) for k in range(40)],
        "id_a long, id_b long",
    )
    groups = duplicate_groups(pairs)
    weights = {"train": 0.6, "val": 0.2, "test": 0.2}
    grouped = split_corpus_grouped(docs, "doc_id", weights, groups)
    # disjoint + exhaustive
    total = sum(d.count() for d in grouped.values())
    assert total == 300
    split_of = {}
    for name, d in grouped.items():
        for r in d.collect():
            split_of[r["doc_id"]] = name
    for k in range(40):
        trio = {split_of[3 * k], split_of[3 * k + 1], split_of[3 * k + 2]}
        assert len(trio) == 1, f"component {k} straddles splits: {trio}"
    # plain split leaks at least one component on this data
    plain = split_corpus(
        docs.withColumn("k", docs.doc_id.cast("string")), "k", weights
    )
    plain_of = {}
    for name, d in plain.items():
        for r in d.collect():
            plain_of[r["doc_id"]] = name
    leaked = sum(
        1
        for k in range(40)
        if len({plain_of[3 * k], plain_of[3 * k + 1], plain_of[3 * k + 2]}) > 1
    )
    assert leaked > 0


def test_blocklist_filter_word_boundaries(spark):
    """Blocklist filtering: word-boundary matches only (no substring
    hits), case-insensitive, density mode, empty-list guard."""
    import pytest

    from trial_submission_studio_spark.operators.qualityfilter import (
        blocklist_filter,
        blocklist_word_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean text about scuntthorpe classics"),  # substring only
            (2, "BADWORD appears once in a long enough sentence here"),
            (3, "badword badword badword short"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    stats = {
        r["doc_id"]: (r["blocked_hits"], r["blocked_density"])
        for r in blocklist_word_stats(docs, "text", ["badword", "cunt"]).collect()
    }
    assert stats[1][0] == 0  # 'scuntthorpe' does NOT match \bcunt\b
    assert stats[2][0] == 1 and stats[3][0] == 3
    assert stats[3][1] == pytest.approx(0.75)
    kept = {r["doc_id"] for r in blocklist_filter(docs, "text", ["badword"]).collect()}
    assert kept == {1, 4}
    dense = {
        r["doc_id"]
        for r in blocklist_filter(
            docs, "text", ["badword"], max_hits=10, max_density=0.2
        ).collect()
    }
    assert dense == {1, 2, 4}  # doc 3's density 0.75 exceeds
    with pytest.raises(ValueError):
        blocklist_filter(docs, "text", [])


def test_temperature_mix_flattens_shares(spark):
    from trial_submission_studio_spark.operators.sampling import (
        temperature_mix,
    )

    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(90)]
        + [(2000 + i, "small") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out, target, fractions = temperature_mix(
        df, "source", "doc_id", alpha=0.5
    )
    # alpha=1 keeps natural shares
    _, t1, f1 = temperature_mix(df, "source", "doc_id", alpha=1.0)
    assert t1["big"] == pytest.approx(0.9)
    assert all(f == pytest.approx(1.0) for f in f1.values())
    # alpha<1 flattens: small's share rises, big's falls
    assert target["small"] > 0.01 and target["big"] < 0.9
    import math

    z = sum(n ** 0.5 for n in (900, 90, 10))
    for s, n in (("big", 900), ("mid", 90), ("small", 10)):
        assert target[s] == pytest.approx(math.sqrt(n) / z, rel=1e-12)
    # realized output approximates the target mix (small caps N)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    tot = sum(got.values())
    assert got["small"] == 10  # the limiting stratum keeps everything
    for s in target:
        assert got[s] / tot == pytest.approx(target[s], abs=0.05)
    # deterministic across calls
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in temperature_mix(df, "source", "doc_id", alpha=0.5)[0].collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        temperature_mix(df, "source", "doc_id", alpha=0.0)
    with pytest.raises(ValueError):
        temperature_mix(df, "source", "doc_id", alpha=1.5)
