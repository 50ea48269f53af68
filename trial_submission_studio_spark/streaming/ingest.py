"""Continuous corpus ingest: streaming micro-batches deduped against
the WHOLE persisted corpus (north-star extension; the reference is
batch-only — SURVEY.md §2.12).

:mod:`.events` covers exactly-once dedup WITHIN a watermark — state
the state store can hold. A crawl corpus needs the other guarantee:
never re-admit a document ingested in ANY previous batch, hours or
months ago. That state is corpus-sized, so it cannot live in a state
store; the standard Spark pattern is ``foreachBatch`` over a
PERSISTED fingerprint table:

- each micro-batch anti-joins the fingerprint table
  (:func:`..operators.dedup.incremental_exact_dedup` — 16-byte keys,
  shuffle width independent of document size);
- novel documents append to the corpus sink, novel fingerprints to
  the state table — both written under ``batch_id=N`` directories and
  with ``mode("overwrite")`` of that directory, so a replayed batch
  (failure between write and checkpoint commit) rewrites the same
  paths instead of duplicating: the sink stays exactly-once across
  restarts without a transactional table format;
- the fingerprint read is partition-discovered off the same layout,
  so state grows append-only — the corpus is never rewritten.

At 100 TB the fingerprint table is bucketed by ``fp`` (the docstring
of ``incremental_exact_dedup`` covers the shuffle-free variant);
everything here is layout, not new shuffle shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from trial_submission_studio_spark.operators.dedup import (
    fingerprint,
    incremental_exact_dedup,
)

__all__ = ["start_dedup_ingest", "compact_ingest_state"]


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _merged_bloom(bloom_dir: str, exclude_batch: int):
    """OR-merge the per-batch bloom sidecars, excluding the current
    batch (the same replay fence as the fp partitions: a recovered
    batch must not probe against its own prior contribution)."""
    from trial_submission_studio_spark.operators.bloom import (
        load_bloom,
        merge_blooms,
    )

    if not os.path.isdir(bloom_dir):
        return None
    filters = []
    for name in sorted(os.listdir(bloom_dir)):
        if not name.endswith(".json") or not name.startswith("batch_"):
            continue
        bid = int(name[len("batch_") : -len(".json")])
        if bid == exclude_batch:
            continue
        filters.append(load_bloom(os.path.join(bloom_dir, name[: -len(".json")])))
    return merge_blooms(filters) if filters else None


def _batch_dirs(table_dir: str) -> dict[int, str]:
    """{batch_id: abs_dir} for the ``batch_id=N`` partitions of one
    state table (negative ids are prior compaction epochs)."""
    out: dict[int, str] = {}
    if not os.path.isdir(table_dir):
        return out
    for name in os.listdir(table_dir):
        if name.startswith("batch_id="):
            try:
                out[int(name[len("batch_id=") :])] = os.path.join(
                    table_dir, name
                )
            except ValueError:
                continue
    return out


def _compact_state_table(
    spark, table_dir: str, keep_latest: int, target_files: int
) -> int:
    """Fold all compactable ``batch_id`` partitions of one state
    table into a single fresh NEGATIVE-id partition, then delete the
    sources. Returns the number of folded partitions (0 = nothing to
    do).

    Crash-safe by argument, not by transaction: dedup state is a SET
    — a reader that sees both the compacted copy and a not-yet-
    deleted source partition merely anti-joins/bucket-probes against
    duplicate rows, which changes nothing (`incremental_exact_dedup`
    is an anti-join; `incremental_minhash_dedup` re-``distinct``s its
    candidate and hit sets). So the order is: write the merged
    partition (visible), then remove sources one by one; a crash at
    any point leaves a correct, possibly-redundant table that the
    next compaction folds again.

    The NEWEST ``keep_latest`` positive partitions are never touched:
    the replay fence (``batch_id != current``) needs a replayed
    batch's own delta to keep its real id — foreachBatch can only
    replay the last uncommitted batch, so everything older is
    fence-dead and safe to fold into the (never-matching) negative
    sentinel."""
    import shutil

    dirs = _batch_dirs(table_dir)
    positives = sorted(b for b in dirs if b >= 0)
    protected = set(positives[len(positives) - keep_latest :]) if keep_latest else set()
    fold = sorted(b for b in dirs if b not in protected)
    if len(fold) < 2:
        return 0
    sentinel = min((b for b in dirs if b < 0), default=0) - 1
    merged = spark.read.parquet(*[dirs[b] for b in fold])
    out_dir = os.path.join(table_dir, f"batch_id={sentinel}")
    merged.repartition(max(1, int(target_files))).write.mode(
        "error"
    ).parquet(out_dir)
    for b in fold:
        shutil.rmtree(dirs[b])
    return len(fold)


def compact_ingest_state(
    spark,
    state_dir: str,
    mode: str = "exact",
    keep_latest: int = 1,
    target_files: int = 4,
) -> dict[str, int]:
    """Bound the state-table file count of a long-running
    :func:`start_dedup_ingest` stream.

    Each accepted batch appends one ``batch_id=N`` partition to every
    state table (fingerprints, or LSH buckets + signatures) — after
    10k micro-batches that is 10k directories of small files, paying
    listing/open/footer costs on EVERY batch's state read and
    starving scan parallelism (the same small-file failure
    `io/versioned.py:compact_version` handles for corpus snapshots;
    state tables are partition-fenced rather than manifest-published,
    so they get this twin instead). Run it between batches, from a
    maintenance cron, or whenever ``len(_batch_dirs(...))`` crosses a
    threshold — any moment is safe except concurrently with an
    in-flight ``process_batch`` writing the same tables
    (single-writer, like the manifest protocol).

    Folded partitions land under a fresh negative ``batch_id``
    (compaction epoch), which no real batch id ever equals, so the
    replay fence and partition pruning keep working unchanged; the
    newest ``keep_latest`` batches are left untouched because only
    the last uncommitted batch can ever replay. Exact-mode Bloom
    sidecars (``_bloom/batch_N.json``) OR-merge into the same
    negative epoch — a merged filter that happens to contain a
    replaying batch's own fingerprints only costs verify work, never
    correctness (Bloom is a pruning hint; maybe-seen rows still pass
    through the fence-filtered anti-join).

    Returns ``{table: folded_partition_count}``."""
    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1 (replay fence)")
    out: dict[str, int] = {}
    if mode == "near":
        for tab in ("buckets", "sigs"):
            out[tab] = _compact_state_table(
                spark, os.path.join(state_dir, tab), keep_latest, target_files
            )
        return out
    if mode != "exact":
        raise ValueError(f"mode must be 'exact' or 'near', got {mode!r}")
    out["fp"] = _compact_state_table(
        spark, state_dir, keep_latest, target_files
    )
    bloom_dir = os.path.join(state_dir, "_bloom")
    out["bloom"] = 0
    if os.path.isdir(bloom_dir):
        from trial_submission_studio_spark.operators.bloom import (
            load_bloom,
            merge_blooms,
            save_bloom,
        )

        ids = []
        for name in os.listdir(bloom_dir):
            if name.startswith("batch_") and name.endswith(".json"):
                try:
                    ids.append(int(name[len("batch_") : -len(".json")]))
                except ValueError:
                    continue
        positives = sorted(b for b in ids if b >= 0)
        protected = set(positives[len(positives) - keep_latest :])
        fold = sorted(b for b in ids if b not in protected)
        if len(fold) >= 2:
            sentinel = min((b for b in ids if b < 0), default=0) - 1
            merged = merge_blooms(
                [
                    load_bloom(os.path.join(bloom_dir, f"batch_{b}"))
                    for b in fold
                ]
            )
            save_bloom(merged, os.path.join(bloom_dir, f"batch_{sentinel}"))
            for b in fold:
                os.remove(os.path.join(bloom_dir, f"batch_{b}.json"))
            out["bloom"] = len(fold)
    return out


def start_dedup_ingest(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    corpus_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    publish_versions: bool = False,
    mode: str = "exact",
    minhash: dict | None = None,
    bloom: dict | None = None,
):
    """Start the continuous dedup-ingest query; returns the
    StreamingQuery. ``corpus_dir`` receives novel documents,
    ``state_dir`` the fingerprint table; both are batch-id-fenced for
    replay idempotency. ``trigger_available_now`` drains what exists
    and stops (the incremental-job deployment mode); pass False for a
    continuously running query.

    ``publish_versions=True`` additionally publishes an atomic
    snapshot manifest (`io/versioned.py`) under
    ``corpus_dir/_versions`` after each accepted batch, so training
    jobs can read a STABLE explicit file list while ingestion keeps
    appending (the underscore prefix keeps discovery-based readers
    from seeing the metadata dir). Replay-safe: a replayed batch
    replaces its own ``batch_id=N/`` prefix in the file list (the
    overwrite regenerates part-file names, so the stale entries must
    go), leaving every other batch's files untouched.

    ``mode="near"`` rejects NEAR-duplicates (MinHash LSH banding
    with signature-estimated-Jaccard verification,
    ``incremental_minhash_dedup``) instead of exact fingerprints:
    state becomes two partition-discovered tables under
    ``state_dir/buckets`` and ``state_dir/sigs`` (id-carrying band
    buckets + signatures; KBs per document, text never persisted),
    each batch appending only its own delta under a fenced
    ``batch_id=N`` directory. ``minhash`` passes operator options
    (k, num_hashes, bands, rows_per_band, sig_threshold); a
    ``threshold`` entry instead auto-picks (bands, rows_per_band)
    via ``dedup.calibrate_lsh`` for that target Jaccard similarity
    (and doubles as ``sig_threshold`` unless one is given).

    ``bloom`` (exact mode only), e.g. ``{"capacity": 1_000_000,
    "fpp": 0.01}``, maintains a per-batch Bloom sidecar under
    ``state_dir/_bloom`` (underscore → invisible to discovery
    readers): each batch OR-merges the other batches' filters and
    prunes the corpus anti-join to maybe-seen rows only
    (``operators/bloom.py``); its own novel fps become the next
    sidecar. ``capacity`` sizes EACH batch's filter — undersizing
    only raises the verify fraction, never changes results. Replay
    uses the same fence as the fp partitions (own batch excluded
    from the merge; the rebuilt sidecar overwrites deterministically).
    """
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame")
    if mode not in ("exact", "near"):
        raise ValueError(f"mode must be 'exact' or 'near', got {mode!r}")
    if bloom is not None and mode != "exact":
        raise ValueError("bloom pruning applies to exact mode only")
    if minhash and "threshold" in minhash:
        from trial_submission_studio_spark.operators.dedup import calibrate_lsh

        minhash = dict(minhash)
        thr = minhash.pop("threshold")
        cal = calibrate_lsh(thr, num_hashes=minhash.get("num_hashes", 32))
        minhash.setdefault("bands", cal["bands"])
        minhash.setdefault("rows_per_band", cal["rows_per_band"])
        minhash.setdefault("sig_threshold", thr)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_dir = os.path.join(corpus_dir, f"batch_id={batch_id}")
        if mode == "near":
            from trial_submission_studio_spark.operators.dedup import (
                incremental_minhash_dedup,
            )

            buckets_dir = os.path.join(state_dir, "buckets")
            sigs_dir = os.path.join(state_dir, "sigs")
            # Replay fence: a recovered batch N re-runs while its OWN
            # batch_id=N state delta is already on disk; reading it
            # back would make every replayed document self-match
            # (sig-Jaccard 1.0 vs its own signature), empty `novel`,
            # and the fenced overwrite below would then wipe the
            # corpus batch. Keep the discovered batch_id partition
            # column and exclude the current batch so a replay
            # recomputes the SAME novel set (partition pruning makes
            # the filter free — the batch_id=N dirs are skipped at
            # scan planning, not scanned-then-filtered).
            seen_b = (
                spark.read.parquet(buckets_dir)
                .filter(F.col("batch_id") != batch_id)
                .select("band", "bucket", id_col)
                if _has_parquet(buckets_dir)
                else None
            )
            seen_s = (
                spark.read.parquet(sigs_dir)
                .filter(F.col("batch_id") != batch_id)
                .select(id_col, "sig")
                if _has_parquet(sigs_dir)
                else None
            )
            novel, d_buckets, d_sigs = incremental_minhash_dedup(
                batch_df,
                seen_b,
                id_col,
                text_col,
                seen_sigs=seen_s,
                track_ids=True,
                deltas=True,
                **(minhash or {}),
            )
            novel = novel.persist()
            try:
                novel.write.mode("overwrite").parquet(batch_dir)
                d_buckets.write.mode("overwrite").parquet(
                    os.path.join(buckets_dir, f"batch_id={batch_id}")
                )
                d_sigs.write.mode("overwrite").parquet(
                    os.path.join(sigs_dir, f"batch_id={batch_id}")
                )
            finally:
                novel.unpersist()
        else:
            # Same replay fence as near mode: exclude this batch's own
            # persisted fingerprints so recovery recomputes the same
            # novel set instead of self-matching to an empty one.
            seen = (
                spark.read.parquet(state_dir)
                .filter(F.col("batch_id") != batch_id)
                .select("fp")
                if _has_parquet(state_dir)
                else None
            )
            bf = (
                _merged_bloom(os.path.join(state_dir, "_bloom"), batch_id)
                if bloom is not None
                else None
            )
            novel, _ = incremental_exact_dedup(
                batch_df, seen, id_col, text_col, bloom=bf
            )
            novel = novel.persist()
            try:
                novel.write.mode("overwrite").parquet(batch_dir)
                novel.select(fingerprint(text_col).alias("fp")).write.mode(
                    "overwrite"
                ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))
                if bloom is not None:
                    from trial_submission_studio_spark.operators.bloom import (
                        build_bloom,
                        save_bloom,
                    )

                    delta = build_bloom(
                        novel.select(fingerprint(text_col).alias("fp")),
                        "fp",
                        capacity=bloom.get("capacity", 1_000_000),
                        fpp=bloom.get("fpp", 0.01),
                    )
                    save_bloom(
                        delta,
                        os.path.join(state_dir, "_bloom", f"batch_{batch_id}"),
                    )
            finally:
                novel.unpersist()
        if publish_versions:
            from trial_submission_studio_spark.io import versioned as V

            cur = V.current_version(corpus_dir)
            base_m = {} if cur is None else V.read_manifest(corpus_dir, cur)
            base = base_m.get("files", [])
            base_dv = base_m.get("dv") or {}
            prefix = f"batch_id={batch_id}/"
            replaced = [f for f in base if f.startswith(prefix)]
            fresh = [
                os.path.relpath(p, corpus_dir) for p in V.data_files(batch_dir)
            ]
            if fresh and cur is None:
                V.publish_files(
                    corpus_dir, fresh, metadata={"batch_id": batch_id}
                )
            elif fresh and any(f in base_dv for f in replaced):
                # a REPLAY of a batch whose files have since been
                # TOMBSTONED (io/deletion_vectors.py — e.g. a GDPR
                # erasure hit this batch): replacing them would drop
                # their deletion vectors and resurrect the erased
                # rows. The batch's content is already published, so
                # the correct replay effect is nothing; the
                # recomputed run dir stays unreferenced (vacuumable).
                pass
            elif fresh:
                # multi-writer commit loop: a normal batch is a pure
                # append (rebases over concurrent compaction); a
                # REPLAY replaces its own prefix's files —
                # row-preserving, so "maintenance" — and correctly
                # conflicts if a concurrent compaction already folded
                # those files into mixed-batch outputs
                V.commit_files(
                    corpus_dir,
                    base_version=cur,
                    kind="maintenance" if replaced else "append",
                    add_files=fresh,
                    remove_files=replaced,
                    metadata={"batch_id": batch_id},
                    spark=spark,
                )

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
