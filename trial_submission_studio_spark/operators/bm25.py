"""BM25 full-text retrieval as DataFrame algebra — the inverted
index as a postings TABLE.

Training-data pipelines use lexical retrieval for
decontamination-by-retrieval (find corpus documents that nearly
contain a benchmark item even when shingle-exact overlap misses),
targeted curation ("more documents like these"), and counterfactual
audits. A single-node Lucene index cannot hold a 100 TB corpus; the
distributed formulation keeps the same math over join-shaped data:

- **Index** = three DataFrames: postings ``(term, id, tf)``
  (shuffled/bucketable on term), doc lengths ``(id, dl)``, and
  term document-frequencies ``(term, df)`` — plus two scalars
  (N, avgdl). All persistable as parquet; bucket postings by
  ``term`` to make query joins shuffle-free.
- **Scoring** (Robertson/Okapi BM25):
  ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``,
  ``score(q, d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``.
  Query terms are a tiny table — broadcast; the per-(query, doc)
  sum is map-side combined; top-k is a per-query window.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no retrieval surface;
this extends the text/curation family (SURVEY.md §2.13) beside the
n-gram contamination probe (`contamination.py` — exact shingles;
BM25 is its recall-oriented complement) and the ANN family
(`similarity.py` — dense vectors; BM25 is the lexical leg).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import versioned as _ver
from .tokenize import words as _tok_words

__all__ = [
    "build_bm25_index",
    "bm25_topk",
    "save_bm25_index",
    "load_bm25_index",
    "append_bm25_index",
    "append_saved_bm25_index",
    "compact_bm25_index",
    "vacuum_bm25_index",
]


def _words(text_col: str, token_pattern: str | None = None) -> Column:
    return _tok_words(text_col, lowercase=True, token_pattern=token_pattern)


def build_bm25_index(
    docs: DataFrame, id_col: str, text_col: str,
    token_pattern: str | None = None,
) -> dict:
    """→ ``{"postings", "doc_lens", "term_dfs", "n_docs", "avgdl"}``.
    One explode pass + three aggregations; the two scalars are the
    only driver-side values (1-row collect).

    ``token_pattern`` (default None = whitespace split, the shared
    lexical-family convention) switches to regex token extraction —
    pass :data:`tokenize.WORD_PATTERN` so "word." matches "word" and
    decontamination recall recovers on punctuated benchmark text.
    Index and queries must use the SAME pattern."""
    toks = docs.select(
        F.col(id_col), F.explode(_words(text_col, token_pattern)).alias("term")
    )
    postings = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    doc_lens = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    term_dfs = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    stats = doc_lens.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("dl_sum"),
    ).collect()[0]
    return {
        "postings": postings,
        "doc_lens": doc_lens,
        "term_dfs": term_dfs,
        "n_docs": int(stats["n"]),
        "avgdl": float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0,
        # exact integer token total — lets incremental appends
        # recompute avgdl EXACTLY (never from the rounded float)
        "dl_sum": int(stats["dl_sum"]) if stats["dl_sum"] is not None else 0,
    }


_TB = "__tb"  # hash-bucket partition column of a SAVED index


def _term_bucket(nb: int) -> Column:
    return F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")


def save_bm25_index(index: dict, path: str, term_buckets: int = 64) -> None:
    """Persist an index from :func:`build_bm25_index` as parquet
    under ``path`` — build once, query many times (the
    decontamination shape: one corpus index, many benchmark sweeps).

    The scale-critical piece is the LAYOUT: ``postings`` and
    ``term_dfs`` are written partitioned by ``__tb =
    pmod(xxhash64(term), term_buckets)`` and sorted by ``term``
    within partitions. :func:`bm25_topk` then prunes the scan to the
    buckets that contain query terms — directory-level partition
    pruning that needs no metastore (unlike ``bucketBy`` +
    ``saveAsTable``) and survives sessions, so a 100 TB postings
    table reads ~|query vocab| / ``term_buckets`` of its files per
    sweep, with the within-partition sort giving row-group min/max
    pruning on ``term`` on top.

    COMMIT PROTOCOL: data files are immutable (each write run lands
    under ``<table>/run=<id>/``) and the index becomes visible only
    through an atomic manifest swap (`io/versioned.py` — explicit
    file list + the index scalars as manifest metadata). A reader
    never sees a torn index, a crashed writer leaves the previous
    version fully readable, and stats can never disagree with the
    data files they describe (they commit in the SAME rename)."""
    if term_buckets < 1:
        raise ValueError("term_buckets must be >= 1")
    files = _write_index_run(index, path, term_buckets)
    _ver.publish_files(
        path, files, metadata={"bm25_stats": _stats_meta(index, term_buckets)}
    )


def _stats_meta(index: dict, term_buckets: int) -> dict:
    return {
        "n_docs": int(index["n_docs"]),
        "avgdl": float(index["avgdl"]),
        "dl_sum": int(index.get("dl_sum", 0)),
        "term_buckets": int(term_buckets),
        "id_col": _postings_id_col(index["postings"]),
    }


def _write_index_run(index: dict, path: str, term_buckets: int) -> list[str]:
    """Write one increment's three tables into fresh immutable
    ``run=<id>`` directories; return the root-relative data files
    written. The writer-added sort on the partition column is
    satisfied by leading with ``__tb``, so the within-partition
    (term, id) order SURVIVES into row groups (a trailing-sort-only
    spec gets shadowed by the writer's own partition-column sort —
    see the verify-skill gotcha) — that order is what gives row-group
    min/max pruning on ``term``."""
    postings, doc_lens, term_dfs = (
        index["postings"],
        index["doc_lens"],
        index["term_dfs"],
    )
    id_col = _postings_id_col(postings)
    run = uuid.uuid4().hex[:16]
    run_dirs = {
        "postings": f"{path}/postings/run={run}",
        "term_dfs": f"{path}/term_dfs/run={run}",
        "doc_lens": f"{path}/doc_lens/run={run}",
    }
    (
        postings.withColumn(_TB, _term_bucket(term_buckets))
        .repartition(F.col(_TB))
        .sortWithinPartitions(_TB, "term", id_col)
        .write.partitionBy(_TB)
        .parquet(run_dirs["postings"])
    )
    (
        term_dfs.withColumn(_TB, _term_bucket(term_buckets))
        .repartition(F.col(_TB))
        .sortWithinPartitions(_TB, "term")
        .write.partitionBy(_TB)
        .parquet(run_dirs["term_dfs"])
    )
    doc_lens.write.parquet(run_dirs["doc_lens"])
    files: list[str] = []
    for d in run_dirs.values():
        files.extend(os.path.relpath(p, path) for p in _ver.data_files(d))
    return sorted(files)


def _read_versioned_table(
    spark: SparkSession, path: str, table: str, files: list[str]
) -> DataFrame | None:
    mine = [os.path.join(path, f) for f in files if f.startswith(table + "/")]
    if not mine:
        return None
    # explicit manifest file list + basePath keeps the run/__tb
    # partition columns (and __tb partition PRUNING) without any
    # directory listing — the torn-read-free read path
    df = spark.read.option("basePath", os.path.join(path, table)).parquet(*mine)
    return df.drop("run")


def load_bm25_index(spark: SparkSession, path: str) -> dict:
    """Reopen a :func:`save_bm25_index` directory → the same dict
    shape `bm25_topk` takes, plus ``term_buckets`` so the query path
    can prune. Table reads are lazy and come from the CURRENT
    manifest's EXPLICIT file list (no directory listing) — a
    concurrent append can commit mid-query without this reader ever
    mixing old stats with new rows. Scalars come from the manifest
    metadata (driver-side JSON, no Spark job).

    ``term_dfs`` is re-aggregated by (bucket, term) on read:
    :func:`append_saved_bm25_index` writes df DELTAS append-only
    (rewriting a vocabulary-sized table per increment would defeat
    incremental indexing), so a term's true df is the SUM of its
    rows. Single-write indexes aggregate to themselves; the grouping
    keeps ``__tb`` so partition pruning still reaches the scan.

    Pre-round-10 directories (``path/stats`` JSON, no ``_versions``
    manifest) still load via the legacy directory-listing path."""
    if _ver.current_version(path) is None:
        return _load_legacy_index(spark, path)
    m = _ver.read_manifest(path)
    meta = m["metadata"]["bm25_stats"]
    files = m["files"]
    postings = _read_versioned_table(spark, path, "postings", files)
    doc_lens = _read_versioned_table(spark, path, "doc_lens", files)
    term_dfs = _read_versioned_table(spark, path, "term_dfs", files)
    if postings is None or doc_lens is None or term_dfs is None:
        raise FileNotFoundError(
            f"manifest v{m['version']} under {path} is missing index tables"
        )
    return {
        "postings": postings,
        "doc_lens": doc_lens,
        "term_dfs": term_dfs.groupBy(_TB, "term").agg(
            F.sum("df").cast("long").alias("df")
        ),
        "n_docs": int(meta["n_docs"]),
        "avgdl": float(meta["avgdl"]),
        "dl_sum": int(meta["dl_sum"]),
        "term_buckets": int(meta["term_buckets"]),
    }


def _load_legacy_index(spark: SparkSession, path: str) -> dict:
    stats = spark.read.json(f"{path}/stats").collect()[0]
    term_dfs = (
        spark.read.parquet(f"{path}/term_dfs")
        .groupBy(_TB, "term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    doc_lens = spark.read.parquet(f"{path}/doc_lens")
    fields = set(stats.__fields__)
    if "dl_sum" in fields and stats["dl_sum"] is not None:
        dl_sum = int(stats["dl_sum"])
    else:  # pre-dl_sum index layout: one exact agg over doc_lens
        row = doc_lens.agg(F.sum("dl").alias("s")).collect()[0]
        dl_sum = int(row["s"]) if row["s"] is not None else 0
    return {
        "postings": spark.read.parquet(f"{path}/postings"),
        "doc_lens": doc_lens,
        "term_dfs": term_dfs,
        "n_docs": int(stats["n_docs"]),
        "avgdl": float(stats["avgdl"]),
        "dl_sum": dl_sum,
        "term_buckets": int(stats["term_buckets"]),
    }


def append_bm25_index(
    index: dict,
    new_docs: DataFrame,
    text_col: str,
    token_pattern: str | None = None,
) -> dict:
    """Merge ``new_docs`` into an in-memory index dict → a NEW dict
    whose scores are EXACTLY those of a full rebuild over old ∪ new:
    postings/doc_lens union (ids must be new — the caller's append
    contract; an id reused across increments double-counts),
    term_dfs merged by summation, and avgdl recomputed from exact
    integer totals (``dl_sum``), never from the rounded float.

    The merge costs one vocabulary-grain aggregation over the
    combined df tables plus the new docs' tokenize pass — nothing
    corpus-sized recomputes. ``token_pattern`` must match the
    original build."""
    id_col = _postings_id_col(index["postings"])
    if id_col not in new_docs.columns:
        raise ValueError(
            f"new_docs must carry the index id column {id_col!r}"
        )
    delta = build_bm25_index(
        new_docs, id_col, text_col, token_pattern=token_pattern
    )
    n_docs = int(index["n_docs"]) + int(delta["n_docs"])
    dl_sum = int(index.get("dl_sum", 0)) + int(delta["dl_sum"])
    # a LOADED index carries the __tb layout column; the in-memory
    # merge loses the on-disk layout, so drop it (and the pruning
    # metadata) — use append_saved_bm25_index to keep pruning
    old_postings = index["postings"]
    if _TB in old_postings.columns:
        old_postings = old_postings.drop(_TB)
    return {
        "postings": old_postings.unionByName(delta["postings"]),
        "doc_lens": index["doc_lens"].unionByName(delta["doc_lens"]),
        "term_dfs": (
            index["term_dfs"]
            .select("term", "df")
            .unionByName(delta["term_dfs"])
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
        ),
        "n_docs": n_docs,
        "avgdl": (dl_sum / n_docs) if n_docs else 0.0,
        "dl_sum": dl_sum,
    }


def append_saved_bm25_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    text_col: str,
    token_pattern: str | None = None,
) -> dict:
    """Append an increment to a :func:`save_bm25_index` directory
    WITHOUT rewriting the existing corpus-sized tables — the
    build-once/append-forever decontamination-index shape:

    - new postings and doc_lens rows land in a fresh immutable
      ``run=<id>`` directory in the same ``__tb`` bucket layout
      (pruning keeps working across increments);
    - term document-frequencies append as DELTAS; readers sum them
      (see :func:`load_bm25_index`) — a term present in k increments
      has k rows, never a wrong value;
    - the COMMIT is one atomic manifest swap: previous file list +
      this run's files + exact merged scalars publish together. A
      crash anywhere before the swap leaves the previous version
      fully readable (the half-written run directory is unreferenced
      and gets skipped by every reader — including the NEXT
      successful append, which unions from the manifest, never from
      a directory listing); a concurrent reader holding the old
      manifest keeps consistent stats+data throughout.

    Ids must be new (the append contract). Returns the reopened
    index dict. Pre-round-10 directories must be migrated once
    (``save_bm25_index(load_bm25_index(spark, old), new_path)``) —
    appending in place to a listing-based layout cannot be atomic,
    so this refuses rather than torn-write."""
    if _ver.current_version(path) is None:
        raise ValueError(
            f"{path} is a pre-manifest bm25 index; atomic appends need "
            "the versioned layout - re-save it once via "
            "save_bm25_index(load_bm25_index(spark, path), new_path)"
        )
    m = _ver.read_manifest(path)
    meta = m["metadata"]["bm25_stats"]
    id_col = str(meta["id_col"])
    nb = int(meta["term_buckets"])
    if id_col not in new_docs.columns:
        raise ValueError(
            f"new_docs must carry the index id column {id_col!r}"
        )
    delta = build_bm25_index(
        new_docs, id_col, text_col, token_pattern=token_pattern
    )
    new_files = _write_index_run(delta, path, nb)
    n_docs = int(meta["n_docs"]) + int(delta["n_docs"])
    dl_sum = int(meta["dl_sum"]) + int(delta["dl_sum"])
    merged_meta = {
        "n_docs": n_docs,
        "avgdl": (dl_sum / n_docs) if n_docs else 0.0,
        "dl_sum": dl_sum,
        "term_buckets": nb,
        "id_col": id_col,
    }
    _ver.publish_files(
        path,
        sorted(m["files"] + new_files),
        metadata={
            "bm25_stats": merged_meta,
            "append_of": m["version"],
            "n_new_files": len(new_files),
        },
    )
    return load_bm25_index(spark, path)


def compact_bm25_index(spark: SparkSession, path: str) -> dict:
    """Fold an append-forever index back into ONE run — the OPTIMIZE
    twin of `io/versioned.py:compact_version` for the bm25 layout.

    After k increments a term's postings live in up to k small files
    per bucket and its document frequency is spread over up to k
    delta rows; queries pay k file opens per pruned bucket and the
    within-partition (term, id) row-group sort only holds per
    increment. Compaction reads the CURRENT manifest, sums the df
    deltas to one row per term, rewrites all three tables as a fresh
    immutable run (restoring the global bucket sort), and publishes
    a new manifest referencing only that run — an ordinary
    append-only commit, so time travel to pre-compaction versions
    still works until they are retired and the old runs vacuumed
    (`io.versioned.retire_versions` + :func:`vacuum_bm25_index`).
    Scalars are unchanged (compaction moves bytes, not statistics).

    Returns the reopened index dict."""
    idx = load_bm25_index(spark, path)
    nb = int(idx["term_buckets"])
    m = _ver.read_manifest(path)
    compacted = {
        "postings": idx["postings"].drop(_TB),
        "doc_lens": idx["doc_lens"],
        # load_bm25_index already re-aggregates the deltas: one row
        # per (bucket, term) lands in the rewrite
        "term_dfs": idx["term_dfs"].drop(_TB),
        "n_docs": idx["n_docs"],
        "avgdl": idx["avgdl"],
        "dl_sum": idx["dl_sum"],
    }
    files = _write_index_run(compacted, path, nb)
    _ver.publish_files(
        path,
        files,
        metadata={
            "bm25_stats": _stats_meta(compacted, nb),
            "compaction_of": m["version"],
        },
    )
    return load_bm25_index(spark, path)


def vacuum_bm25_index(
    path: str,
    *,
    min_age_seconds: float = _ver.VACUUM_MIN_AGE_SECONDS,
    dry_run: bool = False,
) -> list[str]:
    """Delete index data files referenced by NO surviving manifest —
    the cleanup half of the atomic-append protocol: a crashed
    :func:`append_saved_bm25_index` leaves a fully-written but
    never-published ``run=<id>`` directory that every reader skips;
    this reclaims it. Combine with ``io.versioned.retire_versions``
    to also drop files only old manifests reference (time-travel
    retirement).

    Same safety rule as `io/versioned.py:vacuum`: files younger than
    ``min_age_seconds`` are always kept, because an IN-FLIGHT append
    is unreferenced on purpose until its manifest swap commits —
    pass 0 only when no writer can be active. Walks the three table
    trees + the manifests only (metadata-scale at any index size).
    Returns root-relative deleted (or deletable) paths."""
    import shutil
    import time as _time

    live: set[str] = set()
    for v in _ver.list_versions(path):
        live.update(_ver.read_manifest(path, v)["files"])
    if not live:
        raise ValueError(
            f"{path} has no published manifest - refusing to vacuum "
            "(a legacy index would be deleted wholesale)"
        )
    cutoff = _time.time() - min_age_seconds
    doomed: list[str] = []
    young_runs: set[str] = set()
    for table in ("postings", "term_dfs", "doc_lens"):
        troot = os.path.join(path, table)
        if not os.path.isdir(troot):
            continue
        for cur, _dirs, names in os.walk(troot):
            for n in names:
                if n.startswith((".", "_")):
                    continue
                full = os.path.join(cur, n)
                rel = os.path.relpath(full, path)
                if rel in live:
                    continue
                run_dir = os.path.relpath(cur, path).split(os.sep)
                run_key = os.sep.join(run_dir[:2])  # "<table>/run=<id>"
                if os.path.getmtime(full) > cutoff:
                    young_runs.add(run_key)
                    continue
                doomed.append(rel)
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(path, rel))
        # sweep now-dead run dirs (markers incl.) unless young or live
        for table in ("postings", "term_dfs", "doc_lens"):
            troot = os.path.join(path, table)
            if not os.path.isdir(troot):
                continue
            for run in os.listdir(troot):
                if not run.startswith("run="):
                    continue
                key = os.path.join(table, run)
                prefix = key + os.sep
                if key in young_runs or any(f.startswith(prefix) for f in live):
                    continue
                shutil.rmtree(os.path.join(troot, run))
    return sorted(doomed)


def _postings_id_col(postings: DataFrame) -> str:
    return [c for c in postings.columns if c not in ("term", "tf", _TB)][0]


def bm25_topk(
    index: dict,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    token_pattern: str | None = None,
) -> DataFrame:
    """→ ``(query_id, id, score, rank)``: top-k corpus documents per
    query. Query-side weights: repeated query terms count once (the
    standard short-query convention). OOV query terms contribute
    nothing; ties break on ascending doc id for determinism.

    On an index opened with :func:`load_bm25_index`, the postings and
    term_dfs scans are pruned to the ``__tb`` hash buckets containing
    query terms (partition-filter literals computed from the query
    vocabulary — one driver action over the tiny vocab table)."""
    if k <= 0:
        raise ValueError("k must be positive")
    postings, doc_lens, term_dfs = (
        index["postings"],
        index["doc_lens"],
        index["term_dfs"],
    )
    n_docs, avgdl = index["n_docs"], index["avgdl"]
    id_col = _postings_id_col(postings)
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(_words(query_text_col, token_pattern))
        ).alias("term"),
    )
    if _TB in postings.columns:
        nb = int(index["term_buckets"])
        # literal bucket list so Catalyst turns it into PartitionFilters
        # (an isin against a subquery would not prune directories)
        tbs = [
            r["tb"]
            for r in qterms.select(_term_bucket(nb).alias("tb"))
            .distinct()
            .collect()
        ]
        postings = postings.filter(F.col(_TB).isin(tbs)).drop(_TB)
        if _TB in term_dfs.columns:
            term_dfs = term_dfs.filter(F.col(_TB).isin(tbs)).drop(_TB)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # term_dfs is VOCABULARY-sized (can be 10⁸ rows on a web corpus)
    # — never broadcast it whole. Only query terms need df values, so
    # semi-join it down to the (tiny) query vocabulary first; the
    # reduced table is bounded by the number of distinct query terms
    # and broadcasts safely.
    qvocab = qterms.select("term").distinct()
    q_dfs = term_dfs.join(F.broadcast(qvocab), "term", "left_semi")
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(q_dfs), "term")
        .join(doc_lens, id_col)
        .withColumn(
            "__s",
            idf
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(max(avgdl, 1e-12)))
            ),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__s").alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
