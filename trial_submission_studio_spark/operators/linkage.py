"""Record linkage / entity resolution — match rows that describe the
same real-world entity across (or within) sources despite typos and
format drift, then assign stable entity ids.

The classic Fellegi-Sunter shape (1969), engine-idiomatic: BLOCK to
bound the quadratic (candidate pairs only within a shared blocking
key — an equi-join, never a cross join), COMPARE with per-field edit
similarity (Spark's JVM ``levenshtein``), SCORE as a weighted mean,
THRESHOLD, then RESOLVE matched pairs into entities with the same
pointer-jumping connected-components loop the dedup family uses
(:func:`..dedup.duplicate_groups` — matching, like near-duplication,
is not transitive-closed in the pair list).

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) applies Jaro-Winkler to COLUMN
mapping (`crates/tss-submit/src/mapping/`, mirrored in
``trial_submission_studio_spark.mapping``); ROW-level linkage extends
that idea to the data plane for both tracks (clinical: same subject
enrolled twice / cross-registry reconciliation; LLM pipelines:
author/source reconciliation before per-entity governance caps).

Scale shape (100 TB): one shuffle on the blocking key; within-block
pair fan-out is sum(n_b^2) — bounded by the blocking design, audited
by :func:`oversized_blocks` and optionally capped LOUDLY via
``max_block_size`` (dropped blocks are countable, never silent).
Similarity is all JVM codegen (levenshtein + arithmetic); the only
iterative stage is the O(log diameter) CC loop on matched pairs,
which are a tiny fraction of candidates.

Engine-portability: ``levenshtein`` is the standard unit-cost edit
distance in both Spark and DuckDB, lengths are exact ints, and the
weighted mean is built as an EXPLICIT fold in ``compare_cols`` order
— so scores are bit-identical across engines and the threshold cut
selects the same pair set (the contract-gate requirement).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "candidate_pairs",
    "pair_scores",
    "link_records",
    "resolve_entities",
    "oversized_blocks",
]


def _check(block_cols, compare_cols) -> tuple[list[str], list[str]]:
    b, c = list(block_cols), list(compare_cols)
    if not b:
        raise ValueError("need at least one blocking column")
    if not c:
        raise ValueError("need at least one compare column")
    return b, c


def oversized_blocks(
    df: DataFrame, block_cols: Sequence[str], max_block_size: int
) -> DataFrame:
    """Blocks whose row count exceeds ``max_block_size`` (the rows a
    cap would exclude from pairing) — run this audit whenever a cap
    is in force; a hot block usually means the blocking key needs
    another component, not a bigger cap."""
    return (
        df.groupBy(*block_cols)
        .agg(F.count("*").cast("long").alias("block_size"))
        .filter(F.col("block_size") > max_block_size)
    )


def candidate_pairs(
    a: DataFrame,
    b: DataFrame | None = None,
    *,
    id_col: str = "id",
    block_cols: Sequence[str],
    compare_cols: Sequence[str],
    max_block_size: int | None = None,
) -> DataFrame:
    """Equi-join candidate generation: every pair sharing a blocking
    tuple, as ``(id_a, id_b, <c>_a, <c>_b, ...)``.

    One frame → self-linkage (``id_a < id_b``: each unordered pair
    once, no self-pairs). Two frames → cross-source linkage (ids may
    collide across sources; disambiguate upstream if needed).
    NULL blocking values never pair (SQL join semantics — both
    engines agree). ``max_block_size`` drops oversized blocks from
    BOTH sides; pair it with :func:`oversized_blocks` so the drop is
    observable."""
    blocks, cmps = _check(block_cols, compare_cols)
    self_link = b is None
    if b is None:
        b = a
    if max_block_size is not None:
        if max_block_size < 1:
            raise ValueError("max_block_size must be >= 1")
        big_a = oversized_blocks(a, blocks, max_block_size).select(*blocks)
        a = a.join(F.broadcast(big_a), blocks, "left_anti")
        b = a if self_link else b.join(
            F.broadcast(
                oversized_blocks(b, blocks, max_block_size).select(*blocks)
            ),
            blocks,
            "left_anti",
        )
    left = a.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in cmps],
        *blocks,
    )
    # the block join's probe-side partitioning carries through to the
    # downstream per-pair scoring (edit distances — CPU-dense); a
    # narrow local scan would run it nearly serially, so widen the
    # projected probe rows (no-op at real scale)
    from trial_submission_studio_spark.operators.partitioning import (
        widen_if_narrow,
    )

    left = widen_if_narrow(left, "id_a")
    right = b.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in cmps],
        *blocks,
    )
    pairs = left.join(right, blocks)
    if self_link:
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    return pairs.drop(*blocks)


def pair_scores(
    pairs: DataFrame,
    compare_cols: Sequence[str],
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Append per-field ``sim_<c>`` = 1 − levenshtein/max-length
    (NULL compares as empty; two empties are a perfect 1.0) and the
    weighted mean ``sim``. The mean is an explicit left fold in
    ``compare_cols`` order so both engines sum in the same order —
    scores stay bit-comparable."""
    cmps = list(compare_cols)
    if not cmps:
        raise ValueError("need at least one compare column")
    w = {c: 1.0 for c in cmps}
    if weights:
        unknown = set(weights) - set(cmps)
        if unknown:
            raise ValueError(f"weights for non-compare columns: {sorted(unknown)}")
        w.update(weights)
    out = pairs
    for c in cmps:
        ca = F.coalesce(F.col(f"{c}_a").cast("string"), F.lit(""))
        cb = F.coalesce(F.col(f"{c}_b").cast("string"), F.lit(""))
        mx = F.greatest(F.length(ca), F.length(cb))
        out = out.withColumn(
            f"sim_{c}",
            F.when(mx == 0, F.lit(1.0)).otherwise(
                F.lit(1.0) - F.levenshtein(ca, cb) / mx.cast("double")
            ),
        )
    total_w = sum(w.values())
    acc = None
    for c in cmps:  # explicit in-order fold (engine-portable sums)
        term = F.col(f"sim_{c}") * F.lit(float(w[c]))
        acc = term if acc is None else acc + term
    return out.withColumn("sim", acc / F.lit(float(total_w)))


def link_records(
    a: DataFrame,
    b: DataFrame | None = None,
    *,
    id_col: str = "id",
    block_cols: Sequence[str],
    compare_cols: Sequence[str],
    threshold: float = 0.85,
    weights: dict[str, float] | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Block → compare → score → threshold: matched pairs
    ``(id_a, id_b, sim_<c>..., sim)`` with ``sim >= threshold``."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [0, 1]")
    pairs = candidate_pairs(
        a,
        b,
        id_col=id_col,
        block_cols=block_cols,
        compare_cols=compare_cols,
        max_block_size=max_block_size,
    )
    scored = pair_scores(pairs, compare_cols, weights)
    return scored.filter(F.col("sim") >= F.lit(float(threshold)))


def resolve_entities(
    df: DataFrame, matches: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Assign ``entity_id`` to EVERY row of ``df``: the minimum id
    reachable through the match graph (connected components via
    :func:`..dedup.duplicate_groups`), unmatched rows being their own
    entity. Survivor selection is then ``id == entity_id``; entity
    grain for governance is ``groupBy("entity_id")``."""
    from trial_submission_studio_spark.operators.dedup import duplicate_groups

    comps = duplicate_groups(matches.select("id_a", "id_b"))
    return (
        df.join(
            comps.select(
                F.col("id").alias(id_col), F.col("rep").alias("__rep")
            ),
            id_col,
            "left",
        )
        .withColumn("entity_id", F.coalesce("__rep", F.col(id_col)))
        .drop("__rep")
    )
