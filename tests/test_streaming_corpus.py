"""Streaming corpus-prep twin: row-local langid kernel parity with
the batch classifier, batch/stream plan equivalence on a real file
stream, loud rejection of corpus-wide stages, and stage semantics
matching prepare_corpus's row-local subset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.corpus import CorpusConfig, prepare_corpus
from trial_submission_studio_spark.operators.langid import (
    classify_language,
    classify_language_rowlocal,
    collect_profiles,
    train_language_profiles,
)
from trial_submission_studio_spark.sources.local import values_df
from trial_submission_studio_spark.streaming.corpus import (
    streaming_corpus_config,
    streaming_prepare_corpus,
)

LABELED = [
    ("en", "the quick brown fox jumps over the lazy dog and runs away"),
    ("en", "this is another english sentence with many common words"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund"),
    ("de", "dies ist ein weiterer deutscher satz mit vielen worten"),
]

DOCS = [
    (1, "the dog runs over the lazy fox and jumps quickly today"),
    (2, "der hund springt schnell ueber den braunen fuchs heute"),
    (3, "zz qq xx jj vv ww"),  # matches nothing much
    (4, None),
]


@pytest.fixture(scope="module")
def profiles(spark):
    labeled = values_df(spark, LABELED, "lang string, text string")
    return train_language_profiles(labeled, "lang", "text", n=3, top_k=200)


def test_rowlocal_langid_matches_batch_classifier(spark, profiles):
    docs = values_df(spark, DOCS, "doc_id long, text string")
    batch = {
        r["doc_id"]: (r["lang"], r["score"])
        for r in classify_language(
            docs, profiles, "doc_id", "text", min_score=0.05
        ).collect()
    }
    rowlocal = {
        r["doc_id"]: (r["lang"], r["lang_score"])
        for r in classify_language_rowlocal(
            docs, profiles, "text", min_score=0.05
        ).collect()
    }
    assert set(batch) == set(rowlocal)
    for d in batch:
        assert rowlocal[d][0] == batch[d][0], d
        if batch[d][1] is None:
            assert rowlocal[d][1] is None, d
        else:
            assert rowlocal[d][1] == pytest.approx(batch[d][1], rel=1e-9), d
    # the dict form gives the same answers (pre-collected reuse path)
    as_dict = classify_language_rowlocal(
        docs, collect_profiles(profiles), "text", min_score=0.05
    )
    got = {r["doc_id"]: r["lang"] for r in as_dict.collect()}
    assert got == {d: v[0] for d, v in batch.items()}


CORPUS = [
    (1, "Good long sentence one here today.\nshort\n"
        "Another quality line with words.", "crawl"),
    (2, "der hund springt schnell ueber den braunen fuchs "
        "heute wieder einmal schnell", "crawl"),
    (3, "the quick brown fox jumps over the lazy dog and keeps "
        "running through the field all afternoon", "books"),
    (4, "x", "crawl"),  # fails the token floor
    (5, "contact me at alice@example.com for the quick brown fox "
        "details and the lazy dog papers today", "crawl"),
]
SCHEMA = "doc_id long, text string, source string"


def _cfg():
    return streaming_corpus_config(
        min_line_words=3,
        min_doc_tokens=5,
        pii_max_total=0,
        lang_allowlist=("en",),
    )


def test_streaming_rejects_corpus_wide_stages(spark):
    docs = values_df(spark, CORPUS, SCHEMA)
    with pytest.raises(ValueError, match="exact_dedup"):
        streaming_prepare_corpus(docs, "text", CorpusConfig())
    with pytest.raises(ValueError, match="lang_profiles"):
        streaming_prepare_corpus(
            docs, "text", streaming_corpus_config(lang_allowlist=("en",))
        )


def test_batch_semantics_match_prepare_corpus(spark, profiles):
    """On a batch frame the twin's survivors and rewritten text equal
    prepare_corpus with the same row-local knobs (corpus-wide stages
    disabled)."""
    docs = values_df(spark, CORPUS, SCHEMA)
    cfg = _cfg()
    got = streaming_prepare_corpus(
        docs, "text", cfg, lang_profiles=profiles
    )
    want = prepare_corpus(
        docs,
        "doc_id",
        "text",
        config=streaming_corpus_config(
            min_line_words=3,
            min_doc_tokens=5,
            pii_max_total=0,
            lang_allowlist=("en",),
        ),
        lang_profiles=profiles,
    )
    g = {(r["doc_id"], r["text"]) for r in got.collect()}
    w = {(r["doc_id"], r["text"]) for r in want.collect()}
    assert g == w
    # sanity on content: doc 4 fails the floor, doc 5 is PII-dropped,
    # doc 2 routes out as German
    ids = {d for d, _ in g}
    assert 4 not in ids and 5 not in ids and 2 not in ids
    assert {1, 3} <= ids


def test_stream_file_source_end_to_end(spark, profiles, tmp_path):
    """The same plan over a real file stream produces the batch
    result (one-pass micro-batch; memory sink)."""
    src = str(tmp_path / "in")
    docs = values_df(spark, CORPUS, SCHEMA)
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    prof_dict = collect_profiles(profiles)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    assert stream.isStreaming
    out = streaming_prepare_corpus(
        stream, "text", _cfg(), lang_profiles=prof_dict
    )
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_prep_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["text"])
            for r in spark.sql(
                "SELECT * FROM corpus_prep_stream"
            ).collect()
        }
    finally:
        q.stop()
    want = {
        (r["doc_id"], r["text"])
        for r in streaming_prepare_corpus(
            docs, "text", _cfg(), lang_profiles=prof_dict
        ).collect()
    }
    assert got == want and got


def test_redaction_and_blocklist_stages(spark):
    docs = values_df(
        spark,
        [
            (1, "call me on 555-123-4567 about the quick brown fox "
                "and the lazy dog today", "crawl"),
            (2, "the casino jackpot spam spam spam words here "
                "today again and more", "crawl"),
        ],
        SCHEMA,
    )
    cfg = streaming_corpus_config(
        min_line_words=None,
        min_doc_tokens=None,
        blocklist_words=("casino",),
        pii_redact=True,
    )
    got = {r["doc_id"]: r["text"] for r in
           streaming_prepare_corpus(docs, "text", cfg).collect()}
    assert set(got) == {1}
    assert "555-123-4567" not in got[1] and "[" in got[1]
