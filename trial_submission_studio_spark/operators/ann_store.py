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

- **Centroids are FROZEN at build time** and ride the manifest
  metadata (KB-scale JSON for typical n_centroids×dim). Appends
  assign new vectors to the existing cells — this is how FAISS-style
  IVF serves streams too: the coarse quantizer is trained once;
  drift is handled by periodic rebuild, not per-batch retrain
  (retraining would silently invalidate every stored assignment).
- **Queries prune at the FILE LIST**: the probed cells (n_probe
  nearest centroids per query, unioned over the batch) select
  ``__cell=N`` files from the explicit manifest list before Spark
  plans the scan — directory-grain pruning with no metastore and no
  listing, on top of which the cell equi-join and bounded per-query
  window do the rest. A 100 TB vector table reads ~n_probe/
  n_centroids of its bytes per batch.
- **Deletes are tombstones**: an id set appended under ``deletes/``,
  anti-joined at query time (tombstone-sized). Terminal for those
  ids — re-adding a deleted id requires a rebuild; the tombstone
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
    "delete_ivf_vectors",
    "saved_ivf_topk",
]

_CELL = "__cell"


def _write_vector_run(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> list[str]:
    run_dir = f"{path}/vectors/run={uuid.uuid4().hex[:16]}"
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_cells(centroids, 1)(F.col(vec_col))[0].alias(_CELL),
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
    files = _write_vector_run(corpus, path, cents, id_col, vec_col)
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
    m = _ver.read_manifest(path)
    return m, m["metadata"]["ivf"]


def append_ivf_corpus(new_vectors: DataFrame, path: str) -> dict:
    """Assign new vectors to the FROZEN centroids, append a run,
    commit. Same cells, same pruning, zero retraining."""
    m, ivf = _meta(path)
    files = _write_vector_run(
        new_vectors, path, ivf["centroids"], ivf["id_col"], ivf["vec_col"]
    )
    return _ver.publish_files(
        path, m["files"] + files, metadata=m["metadata"]
    )


def delete_ivf_vectors(ids: DataFrame, path: str) -> dict:
    """Append an id tombstone run (single column named ``id_col``).
    Deleted ids stop appearing in query results immediately;
    re-adding them needs a rebuild (documented tombstone
    semantics)."""
    m, ivf = _meta(path)
    run_dir = f"{path}/deletes/run={uuid.uuid4().hex[:16]}"
    ids.select(ivf["id_col"]).write.parquet(run_dir)
    fresh = sorted(os.path.relpath(p, path) for p in _ver.data_files(run_dir))
    return _ver.publish_files(
        path, m["files"] + fresh, metadata=m["metadata"]
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
        tombstones = spark.read.parquet(
            *[os.path.join(path, f) for f in del_files]
        ).select(id_col)
        vectors = vectors.join(F.broadcast(tombstones), id_col, "left_anti")
    joined = q.join(vectors, _CELL).withColumn(
        "sim", cosine_pairwise(F.col("__qvec"), F.col(vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("sim", 6).alias("sim"), "rank")
    )
