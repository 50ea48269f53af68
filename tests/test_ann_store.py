"""Persisted IVF vector store (operators/ann_store.py): build /
append / tombstone-delete / cell-pruned query; equivalence with the
in-memory ivf_topk under frozen centroids."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.ann_store import (
    _pruned_vector_files,
    append_ivf_corpus,
    delete_ivf_vectors,
    save_ivf_corpus,
    saved_ivf_topk,
)
from trial_submission_studio_spark.operators.similarity import ivf_topk
from trial_submission_studio_spark.io.versioned import read_manifest

DIM = 8


def _vecs(spark, lo, hi):
    """Deterministic spread-out unit-ish vectors."""
    return spark.range(lo, hi).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(0, {DIM - 1}), j ->
             CAST(sin(id * 0.7 + j * 1.3) + 0.1 * j AS DOUBLE))
           AS embedding""",
    )


def _topk_rows(df):
    return {
        (r.query_id, r.rank): (r.vec_id, r.sim) for r in df.collect()
    }


def test_saved_matches_in_memory_ivf(spark, tmp_path):
    root = str(tmp_path / "ann")
    corpus = _vecs(spark, 0, 400)
    queries = _vecs(spark, 1000, 1006)
    m = save_ivf_corpus(corpus, root, n_centroids=8)
    cents = m["metadata"]["ivf"]["centroids"]
    got = saved_ivf_topk(spark, root, queries, k=5, n_probe=3)
    want = ivf_topk(corpus, queries, k=5, n_probe=3, centroids=cents)
    assert _topk_rows(got) == _topk_rows(want)


def test_append_equals_build_all_at_once(spark, tmp_path):
    """Frozen centroids make append ≡ rebuild: store(half)+append(half)
    answers exactly like store(all) under the SAME centroids."""
    root_a, root_b = str(tmp_path / "a"), str(tmp_path / "b")
    all_v = _vecs(spark, 0, 300)
    m = save_ivf_corpus(all_v, root_b, n_centroids=8)
    cents = m["metadata"]["ivf"]["centroids"]
    save_ivf_corpus(
        _vecs(spark, 0, 150), root_a, centroids=cents
    )
    append_ivf_corpus(_vecs(spark, 150, 300), root_a)
    queries = _vecs(spark, 2000, 2004)
    a = saved_ivf_topk(spark, root_a, queries, k=7, n_probe=8)
    b = saved_ivf_topk(spark, root_b, queries, k=7, n_probe=8)
    assert _topk_rows(a) == _topk_rows(b)


def test_query_prunes_to_probed_cells(spark, tmp_path):
    root = str(tmp_path / "ann")
    save_ivf_corpus(_vecs(spark, 0, 400), root, n_centroids=8)
    m = read_manifest(root)
    vec_files = [f for f in m["files"] if f.startswith("vectors/")]
    pruned = _pruned_vector_files(m["files"], {0, 3})
    assert 0 < len(pruned) < len(vec_files)
    assert all(("__cell=0/" in f) or ("__cell=3/" in f) for f in pruned)


def test_tombstone_delete_hides_ids(spark, tmp_path):
    root = str(tmp_path / "ann")
    corpus = _vecs(spark, 0, 200)
    save_ivf_corpus(corpus, root, n_centroids=4)
    queries = _vecs(spark, 0, 3)  # self-queries: id i's top-1 is i
    before = saved_ivf_topk(spark, root, queries, k=1, n_probe=4)
    assert {r.vec_id for r in before.collect()} == {0, 1, 2}
    delete_ivf_vectors(
        spark.createDataFrame([(0,), (2,)], "vec_id long"), root
    )
    after = saved_ivf_topk(spark, root, queries, k=1, n_probe=4)
    got = {r.query_id: r.vec_id for r in after.collect()}
    assert got[1] == 1 and got[0] != 0 and got[2] != 2


def test_upsert_replaces_across_cells_and_revives(spark, tmp_path):
    """LSM semantics: an upserted id serves ONLY its newest vector
    even when the replacement lands in a different cell, and a
    delete followed by a later upsert revives the id."""
    from trial_submission_studio_spark.operators.ann_store import (
        upsert_ivf_vectors,
    )

    root = str(tmp_path / "ann")
    save_ivf_corpus(_vecs(spark, 0, 200), root, n_centroids=4)
    # replace id 1 with id 150's vector (very likely a different cell)
    repl = _vecs(spark, 150, 151).selectExpr(
        "CAST(1 AS LONG) AS vec_id", "embedding"
    )
    upsert_ivf_vectors(repl, root)
    q = _vecs(spark, 150, 151)  # query WITH the replacement vector
    top = saved_ivf_topk(spark, root, q, k=2, n_probe=4).collect()
    ids = [r.vec_id for r in sorted(top, key=lambda r: r.rank)]
    assert set(ids) == {150, 1}  # both the original and the clone
    assert abs(top[0].sim - top[1].sim) < 1e-6
    # the OLD vector of id 1 must be gone: querying it finds id 1
    # only via the new position
    q_old = _vecs(spark, 1, 2)
    old_hits = {
        r.vec_id
        for r in saved_ivf_topk(spark, root, q_old, k=3, n_probe=4).collect()
    }
    assert 1 not in old_hits
    # delete then revive
    delete_ivf_vectors(spark.createDataFrame([(1,)], "vec_id long"), root)
    assert 1 not in {
        r.vec_id
        for r in saved_ivf_topk(spark, root, q, k=5, n_probe=4).collect()
    }
    upsert_ivf_vectors(repl, root)
    assert 1 in {
        r.vec_id
        for r in saved_ivf_topk(spark, root, q, k=5, n_probe=4).collect()
    }


def test_sync_from_versioned_embeddings(spark, tmp_path):
    """Change-feed-driven incremental maintenance: merge into the
    base table, sync, and the store answers for the new state."""
    from trial_submission_studio_spark.io.merge import merge_version
    from trial_submission_studio_spark.io.versioned import (
        new_data_dir,
        publish_version,
    )
    from trial_submission_studio_spark.operators.ann_store import (
        sync_ivf_store,
    )

    base = str(tmp_path / "emb")
    root = str(tmp_path / "ann")
    os.makedirs(base)
    d = new_data_dir(base)
    _vecs(spark, 0, 200).repartition(2).write.parquet(d, mode="append")
    v1 = publish_version(base, d)["version"]
    from trial_submission_studio_spark.io.versioned import read_version

    save_ivf_corpus(read_version(spark, base), root, n_centroids=4)

    # base changes: id 3 gets id 170's vector; id 5 deleted; 300 new
    changes = (
        _vecs(spark, 170, 171)
        .selectExpr("CAST(3 AS LONG) AS vec_id", "embedding")
        .unionByName(_vecs(spark, 300, 301))
        .withColumn("is_del", F.lit(False))
        .unionByName(
            _vecs(spark, 5, 6).withColumn("is_del", F.lit(True))
        )
    )
    v2 = merge_version(spark, base, changes, "vec_id", delete_col="is_del")[
        "version"
    ]
    s = sync_ivf_store(spark, base, root, v1, v2)
    assert s["upserted"] == 2 and s["deleted"] == 1

    hits = {
        r.vec_id
        for r in saved_ivf_topk(
            spark, root, _vecs(spark, 170, 171), k=3, n_probe=4
        ).collect()
    }
    assert 3 in hits and 170 in hits
    all_q = saved_ivf_topk(spark, root, _vecs(spark, 5, 6), k=5, n_probe=4)
    assert 5 not in {r.vec_id for r in all_q.collect()}
    assert 300 in {
        r.vec_id
        for r in saved_ivf_topk(
            spark, root, _vecs(spark, 300, 301), k=1, n_probe=4
        ).collect()
    }


def test_commits_are_versioned(spark, tmp_path):
    root = str(tmp_path / "ann")
    save_ivf_corpus(_vecs(spark, 0, 100), root, n_centroids=4)
    append_ivf_corpus(_vecs(spark, 100, 150), root)
    delete_ivf_vectors(spark.createDataFrame([(5,)], "vec_id long"), root)
    assert read_manifest(root)["version"] == 3
    # centroids identical across all commits (frozen)
    c1 = read_manifest(root, 1)["metadata"]["ivf"]["centroids"]
    c3 = read_manifest(root, 3)["metadata"]["ivf"]["centroids"]
    assert c1 == c3


def test_compaction_preserves_answers_and_drops_tombstones(spark, tmp_path):
    from trial_submission_studio_spark.operators.ann_store import (
        compact_ivf_store,
        upsert_ivf_vectors,
    )

    root = str(tmp_path / "ann")
    save_ivf_corpus(_vecs(spark, 0, 150), root, n_centroids=4)
    append_ivf_corpus(_vecs(spark, 150, 200), root)
    upsert_ivf_vectors(
        _vecs(spark, 170, 171).selectExpr(
            "CAST(7 AS LONG) AS vec_id", "embedding"
        ),
        root,
    )
    delete_ivf_vectors(spark.createDataFrame([(9,)], "vec_id long"), root)
    queries = _vecs(spark, 1000, 1005)
    before = _topk_rows(saved_ivf_topk(spark, root, queries, k=8, n_probe=4))
    m = compact_ivf_store(spark, root)
    assert m["metadata"]["compaction_of"] == 4
    assert not [f for f in m["files"] if f.startswith("deletes/")]
    # exactly one vectors run remains
    runs = {f.split("/")[1] for f in m["files"] if f.startswith("vectors/")}
    assert len(runs) == 1
    after = _topk_rows(saved_ivf_topk(spark, root, queries, k=8, n_probe=4))
    assert before == after
    # the dead id stays dead, the upsert stays upserted
    assert 9 not in {
        r.vec_id
        for r in saved_ivf_topk(
            spark, root, _vecs(spark, 9, 10), k=5, n_probe=4
        ).collect()
    }


def test_vacuum_reclaims_retired_runs(spark, tmp_path):
    from trial_submission_studio_spark.io.versioned import retire_versions
    from trial_submission_studio_spark.operators.ann_store import (
        compact_ivf_store,
        vacuum_ivf_store,
    )

    root = str(tmp_path / "ann")
    save_ivf_corpus(_vecs(spark, 0, 100), root, n_centroids=4)
    append_ivf_corpus(_vecs(spark, 100, 140), root)
    delete_ivf_vectors(spark.createDataFrame([(3,)], "vec_id long"), root)
    compact_ivf_store(spark, root)
    queries = _vecs(spark, 1000, 1003)
    before = _topk_rows(saved_ivf_topk(spark, root, queries, k=5, n_probe=4))
    # young files are protected
    assert vacuum_ivf_store(root, dry_run=True) == []
    retire_versions(root, keep_latest=1)
    doomed = vacuum_ivf_store(root, min_age_seconds=0)
    assert doomed  # pre-compaction runs + tombstones reclaimed
    after = _topk_rows(saved_ivf_topk(spark, root, queries, k=5, n_probe=4))
    assert before == after


def test_ivfpq_store_matches_in_memory_and_upserts(spark, tmp_path):
    """PQ mode: saved ADC answers ≡ similarity.ivfpq_topk under the
    same frozen artifacts; upsert replaces codes across cells; the
    persisted table holds CODES, never embeddings."""
    from trial_submission_studio_spark.operators.ann_store import (
        save_ivfpq_corpus,
        saved_ivfpq_topk,
        upsert_ivfpq_vectors,
    )
    from trial_submission_studio_spark.operators.similarity import ivfpq_topk

    root = str(tmp_path / "pq")
    corpus = _vecs(spark, 0, 300)
    queries = _vecs(spark, 1000, 1004)
    m = save_ivfpq_corpus(corpus, root, n_centroids=4, m=2, n_codes=8)
    meta = m["metadata"]["ivfpq"]
    got = saved_ivfpq_topk(spark, root, queries, k=5, n_probe=2)
    want = ivfpq_topk(
        corpus, queries, k=5, n_centroids=4, n_probe=2,
        centroids=meta["centroids"], codebooks=meta["codebooks"],
    )
    assert {
        (r.query_id, r.rank): (r.vec_id, r.adist) for r in got.collect()
    } == {
        (r.query_id, r.rank): (r.vec_id, r.adist) for r in want.collect()
    }
    # codes-only persistence: no embedding column on disk
    vec_files = [f for f in m["files"] if f.startswith("vectors/")]
    cols = {
        f["name"]
        for f in __import__(
            "trial_submission_studio_spark.io.table_schema",
            fromlist=["file_schema"],
        ).file_schema(os.path.join(root, vec_files[0]))
    }
    assert "codes" in cols and "embedding" not in cols

    # upsert id 7 with id 250's vector -> query near 250 finds 7
    upsert_ivfpq_vectors(
        _vecs(spark, 250, 251).selectExpr(
            "CAST(7 AS LONG) AS vec_id", "embedding"
        ),
        root,
    )
    # _vec is ~periodic in id (sin(0.7 i): 0.7*9 ≈ 2π), so ~30 ids
    # tie at the same coarse codes; ties break by id asc — assert
    # membership at a k wide enough to cover the tie family
    res = saved_ivfpq_topk(
        spark, root, _vecs(spark, 250, 251), k=60, n_probe=4
    ).collect()
    hits = {r.vec_id for r in res}
    assert 7 in hits and 250 in hits
    ad = {r.vec_id: r.adist for r in res}
    assert ad[7] == ad[250]  # identical codes -> identical distance


def _drift_vecs(spark, lo, hi, shift):
    """Vectors concentrated in a shifted region — the drift shape:
    later appends cluster somewhere the build-time sample never saw."""
    return spark.range(lo, hi).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(0, {DIM - 1}), j ->
             CAST({shift} + 0.01 * sin(id * 0.7 + j * 1.3) AS DOUBLE))
           AS embedding""",
    )


def test_retrain_restores_cell_balance_and_answers(spark, tmp_path):
    """The r11 verdict task-6 contract: drifted appends degrade cell
    balance; retrain_ivf_store restores it in ONE atomic commit;
    answers stay ≡ brute-force cosine before AND after; the
    pre-retrain version still time-travels with its OLD centroids."""
    from trial_submission_studio_spark.operators.ann_store import (
        ivf_cell_balance,
        retrain_ivf_store,
    )
    from trial_submission_studio_spark.io import versioned as _ver

    root = str(tmp_path / "ann")
    base = _vecs(spark, 0, 200)
    save_ivf_corpus(base, root, n_centroids=8)
    balanced = ivf_cell_balance(spark, root)

    # appends from a distribution the build never saw: they all land
    # in whichever frozen cell is nearest to the drifted region
    drift = _drift_vecs(spark, 200, 600, shift=5.0)
    append_ivf_corpus(drift, root)
    skewed = ivf_cell_balance(spark, root)
    assert skewed["skew"] > 2 * balanced["skew"], (balanced, skewed)
    assert skewed["n_rows"] == 600

    pre_version = read_manifest(root)["version"]
    pre_centroids = read_manifest(root)["metadata"]["ivf"]["centroids"]

    corpus = base.unionByName(drift)
    queries = _vecs(spark, 1000, 1004).unionByName(
        _drift_vecs(spark, 2000, 2004, shift=5.0)
    )
    # exact baseline: full-probe in-memory IVF over the RAW corpus
    # frame (every cell probed = brute-force cosine), independent of
    # the persisted store and its centroids
    m_now = read_manifest(root)["metadata"]["ivf"]
    want = _topk_rows(
        ivf_topk(corpus, queries, k=5, n_probe=8,
                 centroids=m_now["centroids"])
    )
    # full-probe answers are exact vs brute force BEFORE retrain
    got_pre = saved_ivf_topk(spark, root, queries, k=5, n_probe=8)
    assert _topk_rows(got_pre) == want

    m2 = retrain_ivf_store(spark, root)
    assert m2["metadata"]["retrain_of"] == pre_version
    assert m2["metadata"]["ivf"]["centroids"] != pre_centroids
    healed = ivf_cell_balance(spark, root)
    assert healed["skew"] < skewed["skew"] / 2, (skewed, healed)
    assert healed["n_rows"] == 600  # nothing lost in the rewrite

    # answers are exact vs brute force AFTER retrain too
    got_post = saved_ivf_topk(spark, root, queries, k=5, n_probe=8)
    assert _topk_rows(got_post) == want
    # and the retrained index serves the drifted region from its own
    # cells now: a LOW-probe query there is exact post-retrain
    drift_q = _drift_vecs(spark, 2000, 2004, shift=5.0)
    narrow = saved_ivf_topk(spark, root, drift_q, k=3, n_probe=2)
    post_cents = read_manifest(root)["metadata"]["ivf"]["centroids"]
    want_n = _topk_rows(
        ivf_topk(corpus, drift_q, k=3, n_probe=len(post_cents),
                 centroids=post_cents)
    )
    assert _topk_rows(narrow) == want_n

    # time travel: the pre-retrain manifest still pairs OLD centroids
    # with OLD files (mixed state never existed on disk)
    old_m = _ver.read_manifest(root, pre_version)
    assert old_m["metadata"]["ivf"]["centroids"] == pre_centroids
    assert all(os.path.exists(os.path.join(root, f)) for f in old_m["files"])


def test_retrain_refuses_ivfpq(spark, tmp_path):
    from trial_submission_studio_spark.operators.ann_store import (
        retrain_ivf_store,
        save_ivfpq_corpus,
    )

    root = str(tmp_path / "pq")
    save_ivfpq_corpus(_vecs(spark, 0, 100), root, n_centroids=4, m=4)
    with pytest.raises(ValueError, match="rebuild via save_ivfpq_corpus"):
        retrain_ivf_store(spark, root)
