"""BM25 retrieval tests: exact score parity with a pure-Python
reference implementation, ranking semantics, and the
decontamination-by-retrieval use case."""

from __future__ import annotations

import math

import pytest

from trial_submission_studio_spark.operators.bm25 import (
    bm25_topk,
    build_bm25_index,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sat on the mat"),
    (3, "foxes and dogs are common animals"),
    (4, "completely unrelated text about quantum physics"),
    (5, "the the the the the"),  # stop-wordy, long on 'the'
]


def _ref_bm25(docs, query, k1=1.2, b=0.75):
    """Pure-Python Okapi BM25 (idf = ln(1+(N-df+.5)/(df+.5)))."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(query.lower().split()):
            tf = t.count(term)
            if tf == 0 or term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_bm25_index(docs, "doc_id", "text")


def test_index_stats(index):
    assert index["n_docs"] == 5
    total = sum(len(t.split()) for _, t in DOCS)
    assert index["avgdl"] == pytest.approx(total / 5)
    dfs = {r["term"]: r["df"] for r in index["term_dfs"].collect()}
    assert dfs["the"] == 3 and dfs["quick"] == 2 and dfs["quantum"] == 1


def test_scores_match_reference(spark, index):
    queries = spark.createDataFrame(
        [(10, "quick fox"), (11, "quantum physics"), (12, "the dog")],
        "qid long, qtext string",
    )
    got = {}
    for r in bm25_topk(index, queries, "qid", "qtext", k=10).collect():
        got.setdefault(r["qid"], {})[r["doc_id"]] = r["score"]
    for qid, qtext in [(10, "quick fox"), (11, "quantum physics"), (12, "the dog")]:
        expect = _ref_bm25(DOCS, qtext)
        assert set(got.get(qid, {})) == set(expect)
        for d, s in expect.items():
            assert got[qid][d] == pytest.approx(s, rel=1e-9)


def test_repeated_query_terms_count_once(spark, index):
    q1 = spark.createDataFrame([(1, "fox fox fox")], "qid long, qtext string")
    q2 = spark.createDataFrame([(1, "fox")], "qid long, qtext string")
    s1 = {r["doc_id"]: r["score"] for r in bm25_topk(index, q1, "qid", "qtext").collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_topk(index, q2, "qid", "qtext").collect()}
    assert s1 == s2


def test_topk_rank_and_tiebreak(spark, index):
    queries = spark.createDataFrame([(1, "quick brown")], "qid long, qtext string")
    rows = bm25_topk(index, queries, "qid", "qtext", k=1).collect()
    assert len(rows) == 1 and rows[0]["rank"] == 1
    # doc 2 is shorter → higher score than doc 1 for shared terms
    assert rows[0]["doc_id"] == 2
    with pytest.raises(ValueError):
        bm25_topk(index, queries, "qid", "qtext", k=0)


def test_oov_query_returns_nothing(spark, index):
    queries = spark.createDataFrame(
        [(9, "zzz qqq www")], "qid long, qtext string"
    )
    assert bm25_topk(index, queries, "qid", "qtext").count() == 0


def test_decontamination_by_retrieval(spark):
    """A benchmark item whose wording only PARTIALLY overlaps a
    corpus document is still retrieved as the top hit — the recall
    case exact shingle overlap can miss."""
    corpus = spark.createDataFrame(
        [(i, f"filler document number {i} about miscellaneous topics") for i in range(50)]
        + [(99, "what is the capital city of france paris answer")],
        "doc_id long, text string",
    )
    idx = build_bm25_index(corpus, "doc_id", "text")
    bench = spark.createDataFrame(
        [(1, "capital of france")], "qid long, qtext string"
    )
    top = bm25_topk(idx, bench, "qid", "qtext", k=3).collect()
    assert top[0]["doc_id"] == 99


def test_plan_broadcasts_query_terms(spark, index):
    queries = spark.createDataFrame([(1, "quick fox")], "qid long, qtext string")
    plan = (
        bm25_topk(index, queries, "qid", "qtext")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_token_pattern_lifts_punctuated_recall(spark):
    """VERDICT r8 wrong#1: 'word.' misses 'word' under the default
    whitespace tokenizer; WORD_PATTERN recovers the match. Also pins
    that term_dfs is reduced to query vocabulary BEFORE broadcast
    (the q_dfs semi-join plan shape)."""
    from trial_submission_studio_spark.operators.bm25 import (
        bm25_topk,
        build_bm25_index,
    )
    from trial_submission_studio_spark.operators.tokenize import WORD_PATTERN

    docs = spark.createDataFrame(
        [(1, "the quick brown fox."), (2, "lazy dogs sleep soundly.")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(9, "fox")], "qid long, qtext string")
    # whitespace index: "fox." != "fox" -> no hit
    idx_ws = build_bm25_index(docs, "doc_id", "text")
    assert bm25_topk(idx_ws, q, "qid", "qtext", k=5).count() == 0
    # regex index: hit on doc 1
    idx_re = build_bm25_index(docs, "doc_id", "text", token_pattern=WORD_PATTERN)
    hits = bm25_topk(
        idx_re, q, "qid", "qtext", k=5, token_pattern=WORD_PATTERN
    ).collect()
    assert [r["doc_id"] for r in hits] == [1]


def test_save_load_roundtrip_same_scores(spark, index, tmp_path):
    """A saved+reopened index returns byte-identical topk results,
    and the reopened postings scan is PRUNED to the query-term hash
    buckets (PartitionFilters on __tb — the 100 TB read path)."""
    from trial_submission_studio_spark.operators.bm25 import (
        load_bm25_index,
        save_bm25_index,
    )

    path = str(tmp_path / "bm25_idx")
    save_bm25_index(index, path, term_buckets=8)
    idx2 = load_bm25_index(spark, path)
    assert idx2["n_docs"] == index["n_docs"]
    assert idx2["avgdl"] == pytest.approx(index["avgdl"])
    assert idx2["term_buckets"] == 8
    queries = spark.createDataFrame(
        [(10, "quick fox"), (11, "quantum physics"), (12, "the dog")],
        "qid long, qtext string",
    )
    want = sorted(
        map(tuple, bm25_topk(index, queries, "qid", "qtext", k=10).collect())
    )
    got_df = bm25_topk(idx2, queries, "qid", "qtext", k=10)
    got = sorted(map(tuple, got_df.collect()))
    assert len(want) == len(got)
    for w, g in zip(want, got):
        assert w[:2] == g[:2] and w[3] == g[3]
        assert g[2] == pytest.approx(w[2], rel=1e-12)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__tb" in plan


def test_saved_index_prunes_buckets(spark, index, tmp_path):
    """Only the buckets containing query terms are read: a 1-term
    query's pruned postings scan returns a strict subset of the
    postings rows, and still scores exactly."""
    from trial_submission_studio_spark.operators.bm25 import (
        load_bm25_index,
        save_bm25_index,
    )

    path = str(tmp_path / "bm25_idx2")
    save_bm25_index(index, path, term_buckets=16)
    idx2 = load_bm25_index(spark, path)
    q = spark.createDataFrame([(1, "quantum")], "qid long, qtext string")
    rows = bm25_topk(idx2, q, "qid", "qtext", k=5).collect()
    assert [r["doc_id"] for r in rows] == [4]
    ref = _ref_bm25(DOCS, "quantum")
    assert rows[0]["score"] == pytest.approx(ref[4], rel=1e-9)


def test_term_dfs_semi_joined_before_broadcast(spark, index):
    """The vocabulary-sized term_dfs table must never broadcast whole
    (ADVICE r8): the plan's broadcast of df-values sits above a
    LeftSemi against the query vocabulary."""
    q = spark.createDataFrame([(1, "quick fox")], "qid long, qtext string")
    from trial_submission_studio_spark.operators.bm25 import bm25_topk

    plan = (
        bm25_topk(index, q, "qid", "qtext", k=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


NEW_DOCS = [
    (6, "fresh crawl snapshot about foxes and quantum dogs"),
    (7, "the newest quick fox"),
]


def _topk_rows(idx, spark, k=10):
    queries = spark.createDataFrame(
        [(10, "quick fox"), (11, "quantum physics"), (12, "the dog")],
        "qid long, qtext string",
    )
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in bm25_topk(idx, queries, "qid", "qtext", k=k).collect()
    )


def test_append_matches_full_rebuild(spark, index):
    """append_bm25_index(old, new) scores EXACTLY like a one-shot
    build over old ∪ new: integer count tables merge losslessly and
    avgdl comes from the exact dl_sum, so there is no float drift
    beyond summation order (pinned at 1e-12)."""
    from trial_submission_studio_spark.operators.bm25 import (
        append_bm25_index,
    )

    new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    merged = append_bm25_index(index, new, "text")
    full = build_bm25_index(
        spark.createDataFrame(DOCS + NEW_DOCS, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    assert merged["n_docs"] == full["n_docs"] == 7
    assert merged["dl_sum"] == full["dl_sum"]
    assert merged["avgdl"] == pytest.approx(full["avgdl"], rel=0)
    mdfs = {r["term"]: r["df"] for r in merged["term_dfs"].collect()}
    fdfs = {r["term"]: r["df"] for r in full["term_dfs"].collect()}
    assert mdfs == fdfs
    a = _topk_rows(merged, spark)
    b = _topk_rows(full, spark)
    assert a == b
    with pytest.raises(ValueError, match="id column"):
        append_bm25_index(
            index, new.withColumnRenamed("doc_id", "other"), "text"
        )


def test_append_saved_index_incremental(spark, index, tmp_path):
    """append_saved_bm25_index appends postings/doc_lens/df-delta
    files (no rewrite of existing data), readers sum the df deltas,
    stats carry exact merged totals, pruning still works, and scores
    equal the full in-memory rebuild."""
    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )
    import os

    path = str(tmp_path / "bm25_inc")
    save_bm25_index(index, path, term_buckets=8)
    before = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(f"{path}/postings")
        for f in fs
        if f.endswith(".parquet")
    }
    new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    idx2 = append_saved_bm25_index(spark, path, new, "text")
    after = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(f"{path}/postings")
        for f in fs
        if f.endswith(".parquet")
    }
    assert before < after  # strictly appended, nothing rewritten
    full = build_bm25_index(
        spark.createDataFrame(DOCS + NEW_DOCS, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    assert idx2["n_docs"] == 7 and idx2["dl_sum"] == full["dl_sum"]
    assert idx2["avgdl"] == pytest.approx(full["avgdl"], rel=0)
    # df deltas sum correctly across increments
    dfs = {r["term"]: r["df"] for r in idx2["term_dfs"].collect()}
    want = {r["term"]: r["df"] for r in full["term_dfs"].collect()}
    assert dfs == want
    a = _topk_rows(idx2, spark)
    b = _topk_rows(full, spark)
    assert a == b
    # pruning survives the append: partition filters still reach
    # the (now multi-increment) postings scan
    q = spark.createDataFrame([(1, "quantum")], "qid long, qtext string")
    got = bm25_topk(idx2, q, "qid", "qtext", k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__tb" in plan
    assert sorted(r["doc_id"] for r in got.collect()) == [4, 6]


def test_append_twice_stays_exact(spark, tmp_path):
    """Two successive increments: df rows stack per term and the
    summed value still matches a one-shot build."""
    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        save_bm25_index,
    )

    part1 = DOCS[:2]
    part2 = DOCS[2:4]
    part3 = DOCS[4:] + NEW_DOCS
    path = str(tmp_path / "bm25_inc2")
    idx = build_bm25_index(
        spark.createDataFrame(part1, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    save_bm25_index(idx, path, term_buckets=4)
    for part in (part2, part3):
        idx = append_saved_bm25_index(
            spark,
            path,
            spark.createDataFrame(part, "doc_id long, text string"),
            "text",
        )
    full = build_bm25_index(
        spark.createDataFrame(DOCS + NEW_DOCS, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    assert idx["n_docs"] == full["n_docs"]
    assert idx["dl_sum"] == full["dl_sum"]
    dfs = {r["term"]: r["df"] for r in idx["term_dfs"].collect()}
    assert dfs == {r["term"]: r["df"] for r in full["term_dfs"].collect()}
    assert _topk_rows(idx, spark) == _topk_rows(full, spark)


def test_append_crash_leaves_readable_consistent_index(
    spark, index, tmp_path, monkeypatch
):
    """Crash injection: kill the append between the data-file write
    and the manifest swap. The READABLE index must stay exactly the
    pre-append version (stats consistent with data — the torn-write
    class the manifest protocol exists to kill), and the next
    successful append must NOT pick up the crashed run's orphan
    files."""
    import trial_submission_studio_spark.io.versioned as ver
    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    path = str(tmp_path / "bm25_crash")
    save_bm25_index(index, path, term_buckets=8)
    baseline = _topk_rows(load_bm25_index(spark, path), spark)
    v1 = ver.current_version(path)

    new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    real_publish = ver.publish_files

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest swap")

    monkeypatch.setattr(ver, "publish_files", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        append_saved_bm25_index(spark, path, new, "text")
    monkeypatch.setattr(ver, "publish_files", real_publish)

    # data files from the crashed run exist on disk...
    assert ver.current_version(path) == v1
    idx = load_bm25_index(spark, path)
    # ...but the readable index is bit-identical to pre-append:
    # stats AND visible rows
    assert idx["n_docs"] == index["n_docs"]
    assert idx["dl_sum"] == index["dl_sum"]
    assert _topk_rows(idx, spark) == baseline

    # a subsequent successful append skips the orphan run entirely:
    # scores equal ONE clean append over the same docs, not a
    # double-counted one
    idx2 = append_saved_bm25_index(spark, path, new, "text")
    full = build_bm25_index(
        spark.createDataFrame(DOCS + NEW_DOCS, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    assert idx2["n_docs"] == full["n_docs"]
    assert idx2["dl_sum"] == full["dl_sum"]
    assert _topk_rows(idx2, spark) == _topk_rows(full, spark)


def test_concurrent_reader_isolated_from_append(spark, index, tmp_path):
    """A reader that opened the index BEFORE an append commits keeps
    scoring the old snapshot (explicit manifest file list, not a
    directory listing): its stats and its rows stay mutually
    consistent even though new files landed in the same tree."""
    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    path = str(tmp_path / "bm25_iso")
    save_bm25_index(index, path, term_buckets=8)
    reader = load_bm25_index(spark, path)  # lazy plans pinned to v1 files
    want = _topk_rows(reader, spark)

    new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    append_saved_bm25_index(spark, path, new, "text")

    # old handle: unchanged stats, unchanged rows (evaluated AFTER
    # the append committed)
    assert reader["n_docs"] == index["n_docs"]
    assert _topk_rows(reader, spark) == want
    # fresh handle: sees the append
    assert load_bm25_index(spark, path)["n_docs"] == index["n_docs"] + len(
        NEW_DOCS
    )


def test_append_refuses_legacy_layout(spark, index, tmp_path):
    """Pre-manifest directories can't append atomically — the call
    must refuse loudly instead of torn-writing in place."""
    import shutil

    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    path = str(tmp_path / "bm25_legacy")
    save_bm25_index(index, path, term_buckets=4)
    # fabricate the r9 layout: stats dir, no _versions manifest
    idx = load_bm25_index(spark, path)
    legacy = str(tmp_path / "bm25_legacy_flat")
    spark.createDataFrame(
        [(idx["n_docs"], idx["avgdl"], idx["dl_sum"], 4, "doc_id")],
        "n_docs long, avgdl double, dl_sum long, term_buckets int, id_col string",
    ).coalesce(1).write.json(f"{legacy}/stats")
    idx["postings"].write.partitionBy("__tb").parquet(f"{legacy}/postings")
    idx["term_dfs"].write.partitionBy("__tb").parquet(f"{legacy}/term_dfs")
    idx["doc_lens"].write.parquet(f"{legacy}/doc_lens")
    shutil.rmtree(f"{legacy}/_versions", ignore_errors=True)

    # legacy READ still works...
    old = load_bm25_index(spark, legacy)
    assert old["n_docs"] == idx["n_docs"]
    # ...legacy APPEND refuses
    new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="pre-manifest"):
        append_saved_bm25_index(spark, legacy, new, "text")


def test_vacuum_reclaims_crashed_append_orphans(
    spark, index, tmp_path, monkeypatch
):
    """The cleanup half of the atomic-append protocol: a crashed
    append's unpublished run directories vacuum away (age-guarded),
    live files are untouched, and scores are unchanged."""
    import os

    import trial_submission_studio_spark.io.versioned as ver
    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        load_bm25_index,
        save_bm25_index,
        vacuum_bm25_index,
    )

    path = str(tmp_path / "bm25_vac")
    save_bm25_index(index, path, term_buckets=8)
    baseline = _topk_rows(load_bm25_index(spark, path), spark)

    new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    monkeypatch.setattr(
        ver, "publish_files",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError):
        append_saved_bm25_index(spark, path, new, "text")
    monkeypatch.undo()

    # young files are protected by default...
    assert vacuum_bm25_index(path) == []
    # ...but vacuum with age 0 (no writer active) reclaims the orphans
    doomed = vacuum_bm25_index(path, min_age_seconds=0, dry_run=True)
    assert doomed and all(
        d.split(os.sep)[0] in ("postings", "term_dfs", "doc_lens")
        for d in doomed
    )
    deleted = vacuum_bm25_index(path, min_age_seconds=0)
    assert deleted == doomed
    # orphan run dirs are gone wholesale; live runs remain
    for table in ("postings", "term_dfs", "doc_lens"):
        runs = [
            r for r in os.listdir(os.path.join(path, table))
            if r.startswith("run=")
        ]
        assert len(runs) == 1, table
    assert _topk_rows(load_bm25_index(spark, path), spark) == baseline
    # a legacy (manifest-less) dir refuses to vacuum
    with pytest.raises(ValueError, match="no published manifest"):
        vacuum_bm25_index(str(tmp_path / "nothing_here"))


def test_compact_bm25_index_folds_increments(spark, index, tmp_path):
    """After two appends, compaction rewrites the index as ONE run:
    scores stay byte-identical, df deltas collapse to one row per
    term, pruning still reaches the scan, time travel to the
    pre-compaction version still resolves, and retire+vacuum
    reclaims the old runs."""
    import os

    import trial_submission_studio_spark.io.versioned as ver
    from trial_submission_studio_spark.operators.bm25 import (
        append_saved_bm25_index,
        compact_bm25_index,
        load_bm25_index,
        save_bm25_index,
        vacuum_bm25_index,
    )

    path = str(tmp_path / "bm25_opt")
    save_bm25_index(index, path, term_buckets=8)
    n1 = spark.createDataFrame(NEW_DOCS[:1], "doc_id long, text string")
    n2 = spark.createDataFrame(NEW_DOCS[1:], "doc_id long, text string")
    append_saved_bm25_index(spark, path, n1, "text")
    idx_pre = append_saved_bm25_index(spark, path, n2, "text")
    want = _topk_rows(idx_pre, spark)
    pre_version = ver.current_version(path)
    # a term seen in several increments has several delta rows on disk
    raw_rows = spark.read.parquet(f"{path}/term_dfs").count()
    distinct_terms = idx_pre["term_dfs"].count()
    assert raw_rows > distinct_terms

    idx_c = compact_bm25_index(spark, path)
    assert _topk_rows(idx_c, spark) == want
    assert idx_c["n_docs"] == idx_pre["n_docs"]
    assert idx_c["dl_sum"] == idx_pre["dl_sum"]
    # one run per table now referenced; df deltas collapsed
    m = ver.read_manifest(path)
    runs = {f.split(os.sep)[1] for f in m["files"] if f.startswith("postings/")}
    assert len(runs) == 1
    assert (
        spark.read.parquet(
            *[os.path.join(path, f) for f in m["files"] if f.startswith("term_dfs/")]
        ).count()
        == distinct_terms
    )
    # pruning still plan-visible
    q = spark.createDataFrame([(1, "quantum")], "qid long, qtext string")
    got = bm25_topk(idx_c, q, "qid", "qtext", k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__tb" in plan
    # time travel: the pre-compaction version still reads
    old_files = ver.read_manifest(path, pre_version)["files"]
    assert all(os.path.exists(os.path.join(path, f)) for f in old_files)
    # retire + vacuum reclaims the superseded runs
    ver.retire_versions(path, keep_latest=1)
    deleted = vacuum_bm25_index(path, min_age_seconds=0)
    assert deleted
    assert _topk_rows(load_bm25_index(spark, path), spark) == want
