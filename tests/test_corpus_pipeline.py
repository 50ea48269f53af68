"""Composed pretraining-corpus pipeline: every planted defect class is
removed by its stage, clean docs survive end to end."""

from trial_submission_studio_spark.corpus import CorpusConfig, prepare_corpus

LONG = " ".join(f"token{i}" for i in range(30))
BOILER = "all rights reserved copyright notice."


def _corpus(spark):
    return spark.createDataFrame(
        [
            # clean survivors
            (1, f"{LONG} alpha ending.", "src0"),
            (2, f"{LONG.replace('token', 'word')} beta ending.", "src0"),
            # near-dup of 1 (tiny suffix) -> near_dedup drops it
            (3, f"{LONG} alpha ending. zq", "src0"),
            # exact dup of 2 (case) -> exact_dedup drops it
            (4, f"{LONG.replace('token', 'word')} beta ending.".upper(), "src0"),
            # too short -> doc_quality drops it
            (5, "tiny doc.", "src0"),
            # boilerplate-carrying docs (3 sources of the same paragraph)
            (6, f"unique six {LONG.replace('token', 'sixish')}\n{BOILER}", "src1"),
            (7, f"unique seven {LONG.replace('token', 'tok')}\n{BOILER}", "src1"),
            (8, f"unique eight {LONG.replace('token', 'tk')}\n{BOILER}", "src1"),
            # contaminated against the benchmark -> decontamination drops it
            # contaminated doc must CLEAR doc_quality (>= 10 tokens) so
            # the decontamination stage is what actually drops it — the
            # attribution audit caught the 9-token version dying at
            # doc_quality instead
            (9, "the exact benchmark passage appears verbatim right here today. indeed", "src1"),
        ],
        "doc_id long, text string, source string",
    )


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, "the exact benchmark passage appears verbatim right here today.")],
        "doc_id long, text string",
    )


def test_prepare_corpus_each_stage_removes_its_defect(spark):
    cfg = CorpusConfig(
        min_line_words=2,
        min_doc_tokens=10,
        paragraph_max_docs=2,
        contamination_threshold=0.5,
        contamination_ngram=8,
    )
    out = prepare_corpus(
        _corpus(spark), "doc_id", "text", cfg,
        benchmark=_benchmark(spark), collect_stats=True,
    )
    survivors = {r["doc_id"]: r["text"] for r in out.collect()}
    assert sorted(survivors) == [1, 2, 6, 7, 8]
    # boilerplate paragraph excised, unique content kept
    assert BOILER not in survivors[6] and "unique six" in survivors[6]
    # retention ledger is monotone non-increasing and complete
    s = cfg.stats
    order = [
        "input", "line_quality", "doc_quality", "paragraph_dedup",
        "exact_dedup", "near_dedup", "decontaminated",
    ]
    assert list(s) == order
    assert all(s[a] >= s[b] for a, b in zip(order, order[1:]))
    assert s["input"] == 9 and s["decontaminated"] == 5


def test_prepare_corpus_quota_and_mix(spark):
    docs = spark.createDataFrame(
        [(i, f"{LONG} doc {i} ending.", "src0" if i < 80 else "src1")
         for i in range(100)],
        "doc_id long, text string, source string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None,
        paragraph_max_docs=None, exact_dedup=False, near_dedup=False,
        contamination_threshold=None,
        source_cap=30, target_mix={"src0": 0.5, "src1": 0.5},
    )
    out = prepare_corpus(docs, "doc_id", "text", cfg)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # cap: 30 per source; mix: both equal-limited -> roughly balanced
    assert counts["src0"] <= 30 and counts["src1"] <= 30
    assert abs(counts["src0"] - counts["src1"]) <= 12


def test_prepare_corpus_all_stages_off_is_identity(spark):
    docs = _corpus(spark)
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
    )
    out = prepare_corpus(docs, "doc_id", "text", cfg)
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(1, 10))


def test_write_corpus_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from trial_submission_studio_spark.io.corpus_shards import (
        write_corpus_shards,
    )
    from trial_submission_studio_spark.operators.textstats import token_count

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 5 + 1))) for i in range(200)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    manifest = write_corpus_shards(
        docs.withColumn("n_tok", token_count("text")),
        out, "doc_id", n_shards=4, token_col="n_tok",
    ).collect()
    assert [r["shard"] for r in manifest] == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in manifest) == 200
    assert sum(r["n_tokens"] for r in manifest) == sum(i % 5 + 1 for i in range(200))
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("shard").distinct().count() == 4
    # determinism: a re-export assigns every doc the same shard
    again = write_corpus_shards(
        docs.withColumn("n_tok", token_count("text")),
        str(tmp_path / "shards2"), "doc_id", n_shards=4, token_col="n_tok",
    ).collect()
    assert [tuple(r) for r in manifest] == [tuple(r) for r in again]


def test_prepare_corpus_lang_substring_and_ppl_stages(spark):
    from trial_submission_studio_spark.operators.langid import (
        train_language_profiles,
    )
    from trial_submission_studio_spark.operators.lm import train_bigram_lm

    en = "the dog and the fox play in the garden with friends today"
    fr = "le chien et le renard jouent dans le jardin avec des amis"
    legal = " ".join(f"legal{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, f"{en} {legal}", "src0"),
            (2, f"{legal} {en.replace('garden', 'meadow')}", "src0"),
            (3, fr, "src0"),  # lang-routed out
            (4, "zz qq xx totally out of domain words repeated zz qq", "src0"),
        ],
        "doc_id long, text string, source string",
    )
    labeled = spark.createDataFrame(
        [("en", en), ("en", "this is another english sentence with words"),
         ("fr", fr), ("fr", "ceci est une autre phrase avec des mots")],
        "lang string, text string",
    )
    profiles = train_language_profiles(labeled, "lang", "text", top_k=200)
    ref = spark.createDataFrame(
        [(100, en), (101, "the fox and the dog are friends in the garden")],
        "doc_id long, text string",
    )
    uni, bi = train_bigram_lm(ref, "doc_id", "text")

    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
        lang_allowlist=("en",), substring_w=8, substring_min_doc_freq=2,
        max_ppl=8.5,  # in-domain docs score ~7, the OOD doc ~10 (≈uniform 1/V)
    )
    out = prepare_corpus(
        docs, "doc_id", "text", cfg,
        lang_profiles=profiles, lm_model=(uni, bi), collect_stats=True,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    # 3 dropped by language, 4 by perplexity; legal run excised from 1+2
    assert sorted(got) == [1, 2]
    assert "legal0" not in got[1] and "legal0" not in got[2]
    assert cfg.stats["lang_routed"] == 3
    assert cfg.stats["substring_dedup"] == 3
    assert cfg.stats["ppl_filtered"] == 2


def test_prepare_corpus_raises_on_enabled_stage_missing_input(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="benchmark"):
        prepare_corpus(docs, "doc_id", "text", CorpusConfig())
    with pytest.raises(ValueError, match="lang_profiles"):
        prepare_corpus(
            docs, "doc_id", "text",
            CorpusConfig(contamination_threshold=None, lang_allowlist=("en",)),
        )
    with pytest.raises(ValueError, match="lm_model"):
        prepare_corpus(
            docs, "doc_id", "text",
            CorpusConfig(contamination_threshold=None, max_ppl=5.0),
        )


def test_corpus_report_composition(spark):
    from trial_submission_studio_spark.corpus import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "one two three four", "a"),
            (2, "one two three four", "a"),   # exact dup of 1
            (3, "five six", "a"),
            (4, "seven eight nine", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rep = {r["source"]: r for r in corpus_report(docs, "doc_id", "text").collect()}
    assert rep["a"]["n_docs"] == 3 and rep["a"]["n_tokens"] == 10
    assert rep["a"]["min_tokens"] == 2 and rep["a"]["max_tokens"] == 4
    assert rep["a"]["dup_rate"] == round(1 - 2 / 3, 4)
    assert rep["b"]["n_docs"] == 1 and rep["b"]["dup_rate"] == 0.0


def test_write_corpus_shards_shuffle_seed_epoch_order(spark, tmp_path):
    from trial_submission_studio_spark.io.corpus_shards import (
        write_corpus_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    ids_in_file_order = {}
    for run, seed in (("e1", 11), ("e1b", 11), ("e2", 12)):
        out = str(tmp_path / run)
        write_corpus_shards(docs, out, "doc_id", n_shards=2, shuffle_seed=seed)
        per_shard = []
        for shard in (0, 1):
            got = spark.read.parquet(f"{out}/shard={shard}")
            per_shard.append([r["doc_id"] for r in got.collect()])
        ids_in_file_order[run] = per_shard
    # same seed → identical shard membership AND identical order
    assert ids_in_file_order["e1"] == ids_in_file_order["e1b"]
    # new seed → same membership, different order
    assert [sorted(s) for s in ids_in_file_order["e1"]] == [
        sorted(s) for s in ids_in_file_order["e2"]
    ]
    assert ids_in_file_order["e1"] != ids_in_file_order["e2"]
    # the written order is actually shuffled, not insertion order
    assert ids_in_file_order["e1"][0] != sorted(ids_in_file_order["e1"][0])


def test_prepare_corpus_model_quality_stage_and_guard(spark):
    import pytest

    from trial_submission_studio_spark.operators.qualitymodel import (
        train_quality_model,
    )

    good = (
        "the quick brown fox jumps over the lazy dog near the old town "
        "square while many people walk past the market and talk about "
        "bread fruit coffee and the fine spring weather this afternoon"
    )
    bad = "@#$% ^&*! @#$% ^&*! @#$% ^&*! @#$% ^&*! @#$% ^&*!"
    labeled = spark.createDataFrame(
        [(i, good + f" extra{i}", 1.0) for i in range(15)]
        + [(100 + i, bad + f" junk{i}", 0.0) for i in range(15)],
        "doc_id long, text string, label double",
    )
    model = train_quality_model(labeled, "text", num_features=1 << 12, max_iter=30)

    docs = spark.createDataFrame(
        [(1, good + " held out", "s"), (2, bad + " held out", "s")],
        "doc_id long, text string, source string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
        min_model_quality=0.5,
    )
    out = prepare_corpus(
        docs, "doc_id", "text", cfg, quality_model=model, collect_stats=True,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]
    assert cfg.stats["model_quality"] == 1
    assert out.columns == docs.columns

    with pytest.raises(ValueError, match="quality_model"):
        prepare_corpus(
            docs, "doc_id", "text",
            CorpusConfig(contamination_threshold=None, min_model_quality=0.5),
        )


def test_corpus_report_bpe_token_accounting(spark):
    from trial_submission_studio_spark.corpus import corpus_report
    from trial_submission_studio_spark.operators.bpe import (
        bpe_token_count,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "lower newer lower", "a"), (2, "lowest newest", "a"), (3, "low new", "b")],
        "doc_id long, text string, source string",
    )
    merges, _ = train_bpe(docs, "text", num_merges=15)
    rep = {
        r["source"]: r
        for r in corpus_report(docs, "doc_id", "text", bpe_merges=merges).collect()
    }
    per_doc = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count("text", merges).alias("n")
        ).collect()
    }
    assert rep["a"]["n_bpe_tokens"] == per_doc[1] + per_doc[2]
    assert rep["b"]["n_bpe_tokens"] == per_doc[3]
    assert rep["a"]["n_tokens"] == 5  # whitespace accounting still present


def test_crawl_to_training_shards_end_to_end(spark, tmp_path):
    """The whole ingestion story composes: WARC → HTML text → URL
    governance (blocklist + canonical dedup) → corpus pipeline →
    BPE-accounted report → deterministically shuffled shards."""
    from test_warc import _http_response, _record

    from trial_submission_studio_spark.io.corpus_shards import (
        write_corpus_shards,
    )
    from trial_submission_studio_spark.operators.bpe import train_bpe
    from trial_submission_studio_spark.operators.textclean import html_to_text
    from trial_submission_studio_spark.operators.urls import (
        domain_blocklist_filter,
        url_dedup,
    )
    from trial_submission_studio_spark.sources.warc import read_warc
    import pyspark.sql.functions as F

    from trial_submission_studio_spark.corpus import (
        CorpusConfig,
        corpus_report,
        prepare_corpus,
    )

    def page(body_text):
        return (
            "<html><head><style>x{}</style></head><body><p>"
            + body_text
            + "</p></body></html>"
        ).encode()

    good = "the quick brown fox jumps over the lazy dog in the old town square today"
    records = b""
    urls = [
        ("https://www.good.org/a?utm_source=t", good + " alpha page"),
        ("https://good.org/a", good + " alpha page"),          # dup canonical URL
        ("https://good.org/b", good + " beta page content"),
        ("https://spam.bad.com/x", good + " spam page"),       # blocked domain
        ("https://good.org/tiny", "tiny"),                     # fails token gate
    ]
    for i, (u, body) in enumerate(urls):
        records += _record(
            b"response", f"r{i}".encode(),
            extra_headers=b"WARC-Target-URI: " + u.encode() + b"\r\n",
            payload=_http_response(page(body)),
        )
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "seg-0.warc").write_bytes(records)

    pages = (
        read_warc(spark, str(warc_dir))
        .filter(F.col("http_status") == 200)
        .select(
            F.monotonically_increasing_id().alias("__row"),
            "url",
            html_to_text("text").alias("text"),
        )
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn("source", F.lit("crawl"))
    )
    governed = url_dedup(
        domain_blocklist_filter(pages, "url", ["bad.com"]), "doc_id", "url"
    ).select("doc_id", "source", "text")

    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=5, paragraph_max_docs=None,
        exact_dedup=True, near_dedup=False, contamination_threshold=None,
    )
    corpus = prepare_corpus(governed, "doc_id", "text", cfg)
    texts = sorted(r["text"] for r in corpus.collect())
    assert len(texts) == 2  # alpha (one survivor) + beta; spam blocked; tiny gated
    assert any("alpha page" in t for t in texts)
    assert any("beta page" in t for t in texts)
    assert not any("spam" in t for t in texts)

    merges, _ = train_bpe(corpus, "text", num_merges=50)
    rep = corpus_report(corpus, "doc_id", "text", bpe_merges=merges).collect()
    assert len(rep) == 1 and rep[0]["n_docs"] == 2
    assert rep[0]["n_bpe_tokens"] > 0 and rep[0]["dup_rate"] == 0.0

    manifest = write_corpus_shards(
        corpus, str(tmp_path / "shards"), "doc_id", n_shards=2, shuffle_seed=3,
    ).collect()
    assert sum(r["n_rows"] for r in manifest) == 2
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == 2


def test_prepare_corpus_compression_band_stage(spark):
    docs = spark.createDataFrame(
        [
            (1, "a sensible paragraph of natural language text with "
                "varied words and ordinary sentence structure in it."),
            (2, "buy now " * 400),                       # repetitive spam
            (3, "q8Zp!x2Lw9@rT4#mK7$vB1%nH6^jD3&gF5*sA0"),  # high entropy
        ],
        "doc_id long, text string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
        compression_band=(0.25, 0.95),
    )
    out = prepare_corpus(docs, "doc_id", "text", cfg, collect_stats=True)
    assert sorted(r["doc_id"] for r in out.collect()) == [1]
    assert list(cfg.stats) == ["input", "compression_band"]
    assert cfg.stats["compression_band"] == 1


def test_prepare_corpus_gopher_formatting_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "a plain paragraph of ordinary readable words here"),
            (2, "• one\n• two\n• three\n• four"),            # all-bullets
            (3, "snippet cut off...\nanother teaser…\nmore..."),  # ellipses
            (4, "### #### ## # ## #### ## #"),                # symbol soup
            (5, "1234 5678 9012 3456 7890 2345"),             # no letters
        ],
        "doc_id long, text string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
        max_symbol_ratio=0.1, max_bullet_fraction=0.9,
        max_ellipsis_fraction=0.3, min_alpha_fraction=0.8,
    )
    out = prepare_corpus(docs, "doc_id", "text", cfg)
    assert sorted(r["doc_id"] for r in out.collect()) == [1]


def test_prepare_corpus_blocklist_stage(spark):
    """The blocklist stage drops flagged docs and appears in the
    retention ledger between doc_quality and the dedup stages."""
    docs = spark.createDataFrame(
        [
            (1, "perfectly ordinary document with plenty of words inside here"),
            (2, "spamword laden document with plenty of other words in here"),
            (3, "another clean document that has plenty of words to count"),
        ],
        "doc_id long, text string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=5, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
        blocklist_words=("spamword",),
    )
    out = prepare_corpus(docs, "doc_id", "text", cfg, collect_stats=True)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    assert list(cfg.stats) == ["input", "doc_quality", "blocklist"]
    assert cfg.stats["blocklist"] == 2


def test_pii_stages(spark):
    """pii_max_total drops PII-heavy docs; pii_redact rewrites the
    survivors' text at the end of the pipeline."""
    from trial_submission_studio_spark.corpus import CorpusConfig, prepare_corpus

    docs = spark.createDataFrame(
        [
            (1, "clean words only in this document here", "a"),
            (2, "leaky doc mail me at a@b.com or x@y.org today ok", "a"),
            (3, "one address c@d.net padding words to pass filters", "a"),
        ],
        "doc_id long, text string, source string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=3, exact_dedup=False,
        near_dedup=False, contamination_threshold=None,
        paragraph_max_docs=None, pii_max_total=1, pii_redact=True,
    )
    out = prepare_corpus(docs, "doc_id", "text", cfg).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3]  # doc 2 exceeds max_total=1
    red = {r["doc_id"]: r["text"] for r in out}
    assert "[EMAIL]" in red[3] and "c@d.net" not in red[3]
    assert red[1].startswith("clean words")


def test_prepare_corpus_drop_attribution(spark):
    """attribution=True names the FIRST stage that removed each
    non-surviving document; survivors never appear; input partitions
    exactly into survivors + attributed drops."""
    cfg = CorpusConfig(
        min_line_words=2,
        min_doc_tokens=10,
        paragraph_max_docs=2,
        contamination_threshold=0.5,
        contamination_ngram=8,
    )
    out, dropped = prepare_corpus(
        _corpus(spark), "doc_id", "text", cfg,
        benchmark=_benchmark(spark), attribution=True,
    )
    survivors = sorted(r["doc_id"] for r in out.collect())
    att = {r["doc_id"]: r["dropped_at"] for r in dropped.collect()}
    assert survivors == [1, 2, 6, 7, 8]
    assert att == {
        5: "doc_quality",
        4: "exact_dedup",
        3: "near_dedup",
        9: "decontaminated",
    }
    assert set(att) | set(survivors) == set(range(1, 10))
    assert not (set(att) & set(survivors))

    # no stages enabled: empty attribution frame, right schema
    out2, dropped2 = prepare_corpus(
        _corpus(spark), "doc_id", "text",
        CorpusConfig(
            min_line_words=None, min_doc_tokens=None,
            paragraph_max_docs=None, exact_dedup=False, near_dedup=False,
            contamination_threshold=None,
        ),
        attribution=True,
    )
    assert dropped2.columns == ["doc_id", "dropped_at"]
    assert dropped2.count() == 0
    assert out2.count() == 9


def test_prepare_corpus_pseudonymize_stage(spark):
    """pii_pseudonymize_salt rewrites surviving text with consistent
    tokens at the END of the pipeline (same email → same token across
    documents); mutually exclusive with pii_redact."""
    import re

    import pytest

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(12)) + " mail a@x.com now.", "s"),
            (2, " ".join(f"v{i}" for i in range(12)) + " mail a@x.com too.", "s"),
        ],
        "doc_id long, text string, source string",
    )
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        exact_dedup=False, near_dedup=False, contamination_threshold=None,
        pii_pseudonymize_salt="r10",
    )
    out = {r["doc_id"]: r["text"] for r in
           prepare_corpus(docs, "doc_id", "text", cfg).collect()}
    t1 = re.findall(r"<EMAIL_[0-9a-f]{8}>", out[1])
    t2 = re.findall(r"<EMAIL_[0-9a-f]{8}>", out[2])
    assert t1 and t1 == t2            # cross-doc consistency
    assert "a@x.com" not in out[1]
    with pytest.raises(ValueError, match="ONE of"):
        prepare_corpus(
            docs, "doc_id", "text",
            CorpusConfig(
                min_line_words=None, min_doc_tokens=None,
                paragraph_max_docs=None, exact_dedup=False,
                near_dedup=False, contamination_threshold=None,
                pii_redact=True, pii_pseudonymize_salt="x",
            ),
        )
