"""Persisted IVF vector store: build once, append forever, query by
probing cells — the ANN serving layout for a living corpus (the
dense-retrieval sibling of `operators/bm25.py`'s persisted lexical
index, same commit protocol, same pruning discipline).

Layout (mirrors bm25's ``run=<id>/__tb=N``)::

    root/
      vectors/run=<id>/__cell=N/part-*.parquet   id + embedding,
                                                 cell-partitioned
      deletes/run=<id>/part-*.parquet            id tombstones
      _versions/...                              manifest swaps

- **Centroids are FROZEN between retrains** and ride the manifest
  metadata (KB-scale JSON for typical n_centroids×dim). Appends
  assign new vectors to the existing cells — this is how FAISS-style
  IVF serves streams too: the coarse quantizer is trained once;
  drift is handled by PERIODIC retrain, never per-batch (a centroid
  swap without rewriting assignments would silently invalidate every
  stored row). :func:`retrain_ivf_store` is that periodic step — new
  centroids + full clustered rewrite in ONE atomic commit, triggered
  when :func:`ivf_cell_balance` reports skew.
- **Queries prune at the FILE LIST**: the probed cells (n_probe
  nearest centroids per query, unioned over the batch) select
  ``__cell=N`` files from the explicit manifest list before Spark
  plans the scan — directory-grain pruning with no metastore and no
  listing, on top of which the cell equi-join and bounded per-query
  window do the rest. A 100 TB vector table reads ~n_probe/
  n_centroids of its bytes per batch.
- **Mutations are LSM-style**: every commit carries a sequence
  number (its manifest version). ``delete_ivf_vectors`` appends id
  tombstones at that seq; ``upsert_ivf_vectors`` appends the new
  rows AND a tombstone at the SAME seq (alive iff
  ``row_seq >= newest tombstone seq`` for the id) — which is what
  makes replacement correct even when the new vector lands in a
  DIFFERENT cell: a probe that only sees the stale cell still sees
  the (global, broadcast-sized) tombstone and drops the old row.
  Re-adding a deleted id is just a later upsert. The tombstone
  table is the usual compaction candidate when it grows.
- Every mutation is an atomic manifest swap (`io/versioned.py`):
  readers never see a torn index; crashed writers leave the
  previous version intact; `versioned.vacuum` reclaims orphans.

Query batches are expected to be interactive-sized (the probed-cell
union is collected driver-side, bounded by n_centroids); for bulk
offline sweeps use `similarity.ivf_topk` directly over the loaded
table, which never collects.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..io import versioned as _ver
from .similarity import (
    _nearest_cells,
    cosine_pairwise,
    train_ivf_centroids,
)

__all__ = [
    "save_ivf_corpus",
    "append_ivf_corpus",
    "upsert_ivf_vectors",
    "delete_ivf_vectors",
    "saved_ivf_topk",
    "sync_ivf_store",
    "compact_ivf_store",
    "retrain_ivf_store",
    "ivf_cell_balance",
    "vacuum_ivf_store",
    "save_ivfpq_corpus",
    "saved_ivfpq_topk",
    "upsert_ivfpq_vectors",
]

_CELL = "__cell"
_SEQ = "__seq"


def _write_vector_run(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    seq: int,
) -> list[str]:
    run_dir = f"{path}/vectors/run={uuid.uuid4().hex[:16]}"
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_cells(centroids, 1)(F.col(vec_col))[0].alias(_CELL),
        F.lit(seq).cast("long").alias(_SEQ),
    )
    (
        assigned.repartition(F.col(_CELL))
        .sortWithinPartitions(_CELL, id_col)
        .write.partitionBy(_CELL)
        .parquet(run_dir)
    )
    return sorted(
        os.path.relpath(p, path) for p in _ver.data_files(run_dir)
    )


def save_ivf_corpus(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> dict:
    """Build the store: train (or take) centroids, write the
    cell-partitioned vector table, commit. Returns the manifest."""
    cents = centroids or train_ivf_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col
    )
    files = _write_vector_run(corpus, path, cents, id_col, vec_col, seq=1)
    meta = {
        "ivf": {
            "centroids": cents,
            "n_centroids": len(cents),
            "id_col": id_col,
            "vec_col": vec_col,
        }
    }
    return _ver.publish_files(path, files, metadata=meta)


def _meta(path: str) -> tuple[dict, dict]:
    """(manifest, store-meta) for either store kind; the meta dict
    carries ``kind`` ∈ {"ivf", "ivfpq"}."""
    m = _ver.read_manifest(path)
    md = m["metadata"]
    if "ivf" in md:
        return m, {**md["ivf"], "kind": "ivf"}
    if "ivfpq" in md:
        return m, {**md["ivfpq"], "kind": "ivfpq"}
    raise ValueError(f"{path} is not an ANN store (no ivf/ivfpq metadata)")


def append_ivf_corpus(new_vectors: DataFrame, path: str) -> dict:
    """Assign NEW-id vectors to the FROZEN centroids, append a run,
    commit. Same cells, same pruning, zero retraining. For ids that
    may already exist use :func:`upsert_ivf_vectors` (a bare append
    of an existing id would serve both versions)."""
    m, ivf = _meta(path)
    files = _write_vector_run(
        new_vectors, path, ivf["centroids"], ivf["id_col"],
        ivf["vec_col"], seq=m["version"] + 1,
    )
    return _ver.publish_files(
        path, m["files"] + files, metadata=m["metadata"]
    )


def _write_tombstones(ids: DataFrame, path: str, id_col: str, seq: int):
    run_dir = f"{path}/deletes/run={uuid.uuid4().hex[:16]}"
    ids.select(
        id_col, F.lit(seq).cast("long").alias(_SEQ)
    ).write.parquet(run_dir)
    return sorted(os.path.relpath(p, path) for p in _ver.data_files(run_dir))


def delete_ivf_vectors(ids: DataFrame, path: str) -> dict:
    """Append an id tombstone run at this commit's seq. Deleted ids
    stop appearing immediately; a LATER upsert of the same id brings
    it back (LSM rule: alive iff row_seq >= newest tombstone seq)."""
    m, ivf = _meta(path)
    fresh = _write_tombstones(ids, path, ivf["id_col"], m["version"] + 1)
    return _ver.publish_files(
        path, m["files"] + fresh, metadata=m["metadata"]
    )


def upsert_ivf_vectors(new_vectors: DataFrame, path: str) -> dict:
    """Replace-or-insert: ONE commit appends the new rows AND an id
    tombstone at the same seq, so any older version of these ids —
    in whatever cell it sits — is dead, and the new rows (seq equal
    to the tombstone) are alive."""
    m, ivf = _meta(path)
    seq = m["version"] + 1
    files = _write_vector_run(
        new_vectors, path, ivf["centroids"], ivf["id_col"],
        ivf["vec_col"], seq=seq,
    )
    files += _write_tombstones(
        new_vectors.select(ivf["id_col"]), path, ivf["id_col"], seq
    )
    return _ver.publish_files(
        path, m["files"] + files, metadata=m["metadata"]
    )


def _pruned_vector_files(
    files: list[str], probed_cells: set[int]
) -> list[str]:
    """Manifest entries of probed ``__cell`` partitions — the
    driver-side file-grain prune (rel paths carry ``__cell=N/``)."""
    keep = tuple(f"{_CELL}={c}/" for c in sorted(probed_cells))
    return [
        f
        for f in files
        if f.startswith("vectors/") and any(k in f for k in keep)
    ]


def saved_ivf_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k cosine neighbors from the persisted store:
    ``(query_id, <id_col>, sim, rank)`` — identical contract to
    `similarity.ivf_topk` under the same centroids. Scans ONLY the
    probed cells' files from the CURRENT manifest."""
    m, ivf = _meta(path)
    cents, id_col, vec_col = ivf["centroids"], ivf["id_col"], ivf["vec_col"]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(_nearest_cells(cents, n_probe)(F.col(vec_col))).alias(
            _CELL
        ),
    )
    probed = {r[_CELL] for r in q.select(_CELL).distinct().collect()}
    mine = _pruned_vector_files(m["files"], probed)
    if not mine:
        return (
            q.select("query_id")
            .withColumn(id_col, F.lit(None).cast("long"))
            .withColumn("sim", F.lit(0.0))
            .withColumn("rank", F.lit(0))
            .limit(0)
        )
    vectors = (
        spark.read.option("basePath", os.path.join(path, "vectors"))
        .parquet(*[os.path.join(path, f) for f in mine])
        .drop("run")
    )
    del_files = [f for f in m["files"] if f.startswith("deletes/")]
    if del_files:
        # newest tombstone per id; a row survives iff its seq is >=
        # that (upserts commit row+tombstone at the SAME seq)
        tomb = (
            spark.read.parquet(*[os.path.join(path, f) for f in del_files])
            .groupBy(id_col)
            .agg(F.max(_SEQ).alias("__tseq"))
        )
        vectors = (
            vectors.join(F.broadcast(tomb), id_col, "left")
            .filter(
                F.col("__tseq").isNull() | (F.col(_SEQ) >= F.col("__tseq"))
            )
            .drop("__tseq")
        )
    joined = q.join(vectors, _CELL).withColumn(
        "sim", cosine_pairwise(F.col("__qvec"), F.col(vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("sim", 6).alias("sim"), "rank")
    )


def sync_ivf_store(
    spark: SparkSession,
    base_root: str,
    ann_root: str,
    v_from: int,
    v_to: int | None = None,
    *,
    auto_retrain_skew: float | None = None,
) -> dict:
    """Bring the vector store up to date with a versioned embeddings
    table (`io/versioned.py` snapshot whose rows carry the store's
    id and vector columns) using the row-level change feed
    (`io/changefeed.py`) — the incremental-consumer loop:

        inserts + updates -> upsert_ivf_vectors (fetched from the
                             target version, so the feed only moves
                             keys);  deletes -> tombstones.

    Work scales with |changed rows|, not |corpus|. Returns
    ``{"upserted", "deleted", "from", "to", "retrained"}``.

    ``auto_retrain_skew`` wires the drift SENSOR to its ACTUATOR:
    after applying the feed, :func:`ivf_cell_balance` is probed and
    when ``skew`` (max/mean live cell size) exceeds the threshold the
    store is atomically retrained (:func:`retrain_ivf_store`) — the
    maintenance loop that keeps probe pruning honest without a human
    watching the audit. Float-IVF stores only (a PQ retrain is a
    rebuild — codes are codebook-bound), so asking for it on an
    ivfpq store raises rather than silently skipping the policy.
    A reasonable threshold is 3–5: below it a retrain buys little;
    a pile-up cell reads 10x+."""
    from ..io.changefeed import change_feed

    _, ivf = _meta(ann_root)
    id_col, vec_col = ivf["id_col"], ivf["vec_col"]
    if auto_retrain_skew is not None and ivf["kind"] != "ivf":
        raise ValueError(
            "auto_retrain_skew is float-IVF-only (ivfpq codes are "
            "codebook-bound; rebuild via save_ivfpq_corpus)"
        )
    if v_to is None:
        v_to = _ver.current_version(base_root)
    feed = change_feed(spark, base_root, v_from, v_to, id_col)
    ups = feed.filter(F.col("_change") != "delete").select(id_col)
    dels = feed.filter(F.col("_change") == "delete").select(id_col)
    n_up, n_del = ups.count(), dels.count()
    if n_up:
        rows = (
            _ver.read_version(spark, base_root, v_to)
            .join(F.broadcast(ups), id_col, "left_semi")
            .select(id_col, vec_col)
        )
        upsert_ivf_vectors(rows, ann_root)
    if n_del:
        delete_ivf_vectors(dels, ann_root)
    out = {"upserted": n_up, "deleted": n_del, "from": v_from, "to": v_to,
           "retrained": False}
    if auto_retrain_skew is not None and (n_up or n_del):
        bal = ivf_cell_balance(spark, ann_root)
        out["balance"] = bal
        if bal["skew"] > auto_retrain_skew and bal["n_rows"]:
            retrain_ivf_store(spark, ann_root)
            out["retrained"] = True
            out["balance_after"] = ivf_cell_balance(spark, ann_root)
    return out


def _live_rows(spark: SparkSession, path: str, m: dict, id_col: str):
    """Tombstone-resolved view of the store's CURRENT rows (the LSM
    read path shared by compact/retrain)."""
    vec_files = [f for f in m["files"] if f.startswith("vectors/")]
    vectors = (
        spark.read.option("basePath", os.path.join(path, "vectors"))
        .parquet(*[os.path.join(path, f) for f in vec_files])
        .drop("run")
    )
    del_files = [f for f in m["files"] if f.startswith("deletes/")]
    if del_files:
        tomb = (
            spark.read.parquet(*[os.path.join(path, f) for f in del_files])
            .groupBy(id_col)
            .agg(F.max(_SEQ).alias("__tseq"))
        )
        vectors = (
            vectors.join(F.broadcast(tomb), id_col, "left")
            .filter(
                F.col("__tseq").isNull() | (F.col(_SEQ) >= F.col("__tseq"))
            )
            .drop("__tseq")
        )
    return vectors


def compact_ivf_store(spark: SparkSession, path: str) -> dict:
    """Fold the LSM state: resolve tombstones, rewrite the live rows
    as ONE fresh run (same frozen centroids, same cell layout), drop
    the tombstone files from the manifest. Query results are
    unchanged; what changes is cost — a long-lived store accumulates
    a run dir per mutation and a growing tombstone broadcast, and
    this is the standard LSM answer. Old versions stay readable
    until retired+vacuumed (append-only commit, like
    `io/versioned.compact_version`)."""
    m, ivf = _meta(path)
    id_col, vec_col = ivf["id_col"], ivf["vec_col"]
    live = _live_rows(spark, path, m, id_col).select(id_col, vec_col)
    files = _write_vector_run(
        live, path, ivf["centroids"], id_col, vec_col, seq=m["version"] + 1
    )
    meta = dict(m["metadata"])
    meta["compaction_of"] = m["version"]
    return _ver.publish_files(path, files, metadata=meta)


def ivf_cell_balance(spark: SparkSession, path: str) -> dict:
    """Cell-balance audit of the CURRENT (tombstone-resolved) store:
    ``{"n_cells", "n_rows", "max_cell", "mean_cell", "skew"}`` where
    ``skew = max/mean`` over the store's TRAINED cell count (empty
    cells count toward the mean — a store whose appends all pile
    into one cell must read as skewed, not as 'one perfectly
    balanced cell'). Probe cost ≈ the skew: a 10x-overfull cell
    makes every query probing it scan 10x its fair share, which is
    the signal to :func:`retrain_ivf_store`."""
    m, meta = _meta(path)
    n_cells = len(meta["centroids"])
    counts = {
        r[_CELL]: r["n"]
        for r in _live_rows(spark, path, m, meta["id_col"])
        .groupBy(_CELL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_rows = int(sum(counts.values()))
    mean = n_rows / n_cells if n_cells else 0.0
    mx = max(counts.values(), default=0)
    return {
        "n_cells": n_cells,
        "n_rows": n_rows,
        "max_cell": int(mx),
        "mean_cell": mean,
        "skew": (mx / mean) if mean else 0.0,
    }


def retrain_ivf_store(
    spark: SparkSession,
    path: str,
    *,
    n_centroids: int | None = None,
    sample_size: int = 4096,
) -> dict:
    """Refresh the coarse quantizer against the store's CURRENT
    distribution: sample-based spherical k-means retrain
    (`similarity.train_ivf_centroids` over the live rows) + a full
    clustered rewrite under the new centroids, committed ATOMICALLY
    as one manifest swap that also replaces the recorded centroids —
    the ``optimize_version`` shape (`io/versioned.py`). This is the
    drift answer the frozen-at-build design defers to (module
    docstring): appends that pile into a few stale cells degrade
    probe pruning (watch :func:`ivf_cell_balance`); a retrain
    restores balance WITHOUT ever serving mixed state, because
    assignments and centroids swap in the same commit. Old versions
    still time-travel: their manifests carry the OLD centroids with
    the OLD files. IVF-PQ stores refuse — codes are only comparable
    under the codebooks that produced them, so a PQ retrain is a
    rebuild (`save_ivfpq_corpus` docstring)."""
    m, meta = _meta(path)
    if meta["kind"] != "ivf":
        raise ValueError(
            "retrain_ivf_store is float-IVF-only; an ivfpq retrain is a "
            "rebuild via save_ivfpq_corpus (codes are codebook-bound)"
        )
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    live = _live_rows(spark, path, m, id_col).select(id_col, vec_col)
    live = live.persist()  # train samples it, the rewrite scans it
    try:
        cents = train_ivf_centroids(
            live,
            n_centroids or len(meta["centroids"]),
            sample_size=sample_size,
            id_col=id_col,
            vec_col=vec_col,
        )
        files = _write_vector_run(
            live, path, cents, id_col, vec_col, seq=m["version"] + 1
        )
    finally:
        live.unpersist()
    new_meta = {
        "ivf": {
            "centroids": cents,
            "n_centroids": len(cents),
            "id_col": id_col,
            "vec_col": vec_col,
        },
        "retrain_of": m["version"],
    }
    return _ver.publish_files(path, files, metadata=new_meta)


def vacuum_ivf_store(
    path: str,
    *,
    min_age_seconds: float = _ver.VACUUM_MIN_AGE_SECONDS,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim runs no surviving manifest references (crashed
    writers; compacted-away history after
    ``versioned.retire_versions``) — `versioned.vacuum_tables` over
    this store's two table trees."""
    return _ver.vacuum_tables(
        path,
        ("vectors", "deletes"),
        min_age_seconds=min_age_seconds,
        dry_run=dry_run,
    )


# --- IVF-PQ mode: codes-only persistence --------------------------------


def _write_pq_run(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    seq: int,
) -> list[str]:
    """One immutable run of (id, codes, __cell, __seq) — floats are
    consumed at encode time and never persisted."""
    from .similarity import pq_encode

    run_dir = f"{path}/vectors/run={uuid.uuid4().hex[:16]}"
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    assigned = (
        corpus.select(
            F.col(id_col),
            _nearest_cells(centroids, 1)(F.col(vec_col))[0].alias(_CELL),
        )
        .join(codes, id_col)
        .withColumn(_SEQ, F.lit(seq).cast("long"))
    )
    (
        assigned.repartition(F.col(_CELL))
        .sortWithinPartitions(_CELL, id_col)
        .write.partitionBy(_CELL)
        .parquet(run_dir)
    )
    return sorted(
        os.path.relpath(p, path) for p in _ver.data_files(run_dir)
    )


def save_ivfpq_corpus(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int = 16,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> dict:
    """The codes-only sibling of :func:`save_ivf_corpus` — FAISS
    ``IVFx,PQy`` as a persisted table: the store holds m one-byte
    codes per vector instead of dim floats (the 100 TB memory
    story), under the same frozen-artifact + LSM + file-prune
    machinery. Both artifacts (centroids AND codebooks) freeze at
    build time: codes are only comparable under the codebooks that
    produced them (`similarity.save_index` docstring), so a retrain
    is a REBUILD, never an append."""
    from .similarity import train_pq_codebooks

    cents = centroids or train_ivf_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col
    )
    books = codebooks or train_pq_codebooks(
        corpus, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col
    )
    files = _write_pq_run(corpus, path, cents, books, id_col, vec_col, seq=1)
    meta = {
        "ivfpq": {
            "centroids": cents,
            "codebooks": books,
            "id_col": id_col,
            "vec_col": vec_col,
        }
    }
    return _ver.publish_files(path, files, metadata=meta)


def upsert_ivfpq_vectors(new_vectors: DataFrame, path: str) -> dict:
    """LSM upsert for the PQ store: encode with the FROZEN codebooks,
    assign with the frozen centroids, commit rows + same-seq
    tombstone (see :func:`upsert_ivf_vectors` for why that is
    correct across cells)."""
    m, meta = _meta(path)
    if meta["kind"] != "ivfpq":
        raise ValueError("not an ivfpq store; use upsert_ivf_vectors")
    seq = m["version"] + 1
    files = _write_pq_run(
        new_vectors, path, meta["centroids"], meta["codebooks"],
        meta["id_col"], meta["vec_col"], seq,
    )
    files += _write_tombstones(
        new_vectors.select(meta["id_col"]), path, meta["id_col"], seq
    )
    return _ver.publish_files(
        path, m["files"] + files, metadata=m["metadata"]
    )


def saved_ivfpq_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """ADC top-k from the persisted codes: probed-cell file pruning +
    LSM tombstone resolution, then `similarity.pq_topk` over exactly
    the surviving code rows — ``(query_id, <id_col>, adist, rank)``,
    ascending distance. Identical contract to `similarity.ivfpq_topk`
    under the same frozen artifacts."""
    from .similarity import pq_topk

    m, meta = _meta(path)
    if meta["kind"] != "ivfpq":
        raise ValueError("not an ivfpq store; use saved_ivf_topk")
    cents, books = meta["centroids"], meta["codebooks"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    q_cells = queries.select(
        F.explode(_nearest_cells(cents, n_probe)(F.col(vec_col))).alias(
            _CELL
        )
    )
    probed = {r[_CELL] for r in q_cells.distinct().collect()}
    mine = _pruned_vector_files(m["files"], probed)
    if not mine:
        return (
            queries.select(F.col(id_col).alias("query_id"))
            .withColumn(id_col, F.lit(None).cast("long"))
            .withColumn("adist", F.lit(0.0))
            .withColumn("rank", F.lit(0))
            .limit(0)
        )
    codes = (
        spark.read.option("basePath", os.path.join(path, "vectors"))
        .parquet(*[os.path.join(path, f) for f in mine])
        .drop("run")
    )
    del_files = [f for f in m["files"] if f.startswith("deletes/")]
    if del_files:
        tomb = (
            spark.read.parquet(*[os.path.join(path, f) for f in del_files])
            .groupBy(id_col)
            .agg(F.max(_SEQ).alias("__tseq"))
        )
        codes = (
            codes.join(F.broadcast(tomb), id_col, "left")
            .filter(
                F.col("__tseq").isNull() | (F.col(_SEQ) >= F.col("__tseq"))
            )
            .drop("__tseq")
        )
    return pq_topk(
        codes.select(id_col, "codes"), queries, books, k=k,
        id_col=id_col, vec_col=vec_col,
    )
