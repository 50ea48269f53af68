"""Link-graph ranking: distributed PageRank over an edge DataFrame —
the CommonCrawl-style domain/page authority signal a crawl-governance
pipeline uses next to content quality (rank feeds crawl scheduling,
spam-domain downweighting, and corpus mix priors).

Spark-first shape:

- The graph IS two DataFrames: ``edges(src, dst)`` and the derived
  out-degree table. Each power-iteration step is one broadcast-free
  equi-join (edge × current rank, co-partitioned on ``src`` after the
  first iteration — Spark reuses the hash partitioning) plus one
  ``groupBy(dst).sum`` with map-side partial aggregation. No
  adjacency lists in driver memory, no RDDs.
- **Dangling nodes** (no out-edges) are handled the standard way:
  their rank mass is summed (a 1-row aggregate) and redistributed
  uniformly each iteration, so ranks stay a probability distribution
  (asserted in tests to 1e-9).
- **Lineage control**: every iteration ends in ``localCheckpoint``
  (same discipline as connected components, `dedup.py`) so the plan
  stays O(1) deep instead of O(iterations).
- At 100 TB-scale graphs the per-iteration cost is the edge shuffle;
  a production run co-partitions edges once (``repartition(src)``)
  and every subsequent join reuses that layout. Hot destination
  pages (the whole web links to them) are absorbed by map-side
  combine in the sum — the classic reason PageRank fits
  shuffle-reduce engines.

Pairs with `sources/warc.py` + `textclean.html_links` (page → hrefs)
and `urls.url_registered_domain` (page graph → domain graph). The
reference engine has no graph surface; this belongs to the
training-data extension family (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    dedup_edges: bool = True,
    tol: float | None = None,
) -> DataFrame:
    """Rank every node of ``edges`` (directed, undeduped OK) by
    power-iteration PageRank. Returns ``(node, rank)`` with ranks
    summing to 1.

    ``dedup_edges=True`` collapses duplicate (src, dst) pairs first
    (a page linking twice is one edge, the usual web-graph
    convention; pass False to weight by multiplicity). Self-loops
    are kept (they contribute rank to their own node, matching the
    standard matrix formulation on the deduped adjacency).

    ``tol``: convergence-based early exit — stop once
    ``max |Δrank| < tol`` (∞-norm), at most ``iterations`` steps.
    The check joins the two ALREADY-MATERIALIZED localCheckpoints
    (one O(nodes) job over cached blocks, no lineage recompute); the
    default ``None`` keeps the fixed-iteration behavior with zero
    per-iteration actions beyond the checkpoint itself.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if dedup_edges:
        e = e.distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # co-partition the (edge ⋈ out_deg) build once; every iteration's
    # rank join then lands on this layout
    ed = (
        e.join(out_deg, "src")
        .repartition(F.col("src"))
        .localCheckpoint()
    )
    # dangling-node SET is iteration-invariant — compute it once; on
    # dangling-free graphs (most web graphs after edge cleanup) the
    # per-iteration driver action disappears entirely
    dangling_nodes = nodes.join(
        out_deg, nodes["node"] == out_deg["src"], "left_anti"
    ).localCheckpoint()
    has_dangling = dangling_nodes.count() > 0
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint()
    for _ in range(iterations):
        prev = ranks
        ranks = _pagerank_step(
            nodes,
            ed,
            prev,
            dangling_nodes if has_dangling else None,
            n_nodes,
            damping,
        ).localCheckpoint()
        if tol is not None:
            delta = (
                ranks.join(
                    prev.select("node", F.col("rank").alias("__prev")), "node"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("__prev"))).alias("d"))
                .collect()[0]["d"]
            )
            if delta is not None and delta < tol:
                break
    return ranks


def _pagerank_step(
    nodes: DataFrame,
    ed: DataFrame,
    ranks: DataFrame,
    dangling_nodes: DataFrame | None,
    n_nodes: int,
    damping: float,
) -> DataFrame:
    """One un-checkpointed power-iteration step (exposed so tests can
    assert the iteration's PLAN — the public loop checkpoints every
    step, which hides the plan behind an RDD scan).

    Dangling mass is a 1-row broadcast crossJoin INSIDE the plan, not
    a driver action: each iteration costs exactly one job (the
    checkpoint), even on dangling-heavy graphs."""
    base = (1.0 - damping) / n_nodes
    contribs = (
        ed.join(ranks, ed["src"] == ranks["node"])
        .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("in_mass"))
    )
    updated = nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
    if dangling_nodes is not None:
        dmass = ranks.join(dangling_nodes.select("node"), "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dmass")
        )
        spread_col = F.lit(damping) * F.col("__dmass") / F.lit(float(n_nodes))
        updated = updated.crossJoin(F.broadcast(dmass))
    else:
        spread_col = F.lit(0.0)
    return updated.select(
        "node",
        (
            F.lit(base)
            + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
            + spread_col
        ).alias("rank"),
    )
