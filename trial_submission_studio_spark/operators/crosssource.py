"""Cross-source duplication audit — "how much of source A is already
in source B?" for multi-source corpus assembly.

Pretraining corpora are mixes (CommonCrawl snapshots, curated webtext,
books, code, wiki); the same document routinely arrives through
several of them. Before choosing mixing weights (`sampling.py`,
`dsir.py`) a pipeline needs the OVERLAP MATRIX between sources —
double-counted mass silently re-weights the mix and inflates epoch
counts on the duplicated slice. This module answers it as pure
DataFrame algebra over a shared-key table:

- :func:`source_overlap_matrix` — the generic kernel: given
  ``(key, source)`` rows (one per document), produce every ordered
  source pair's ``(shared_keys, docs_a_shared, frac_a_shared)``.
- :func:`cross_source_duplication` — exact-duplicate instantiation:
  key = the 16-byte normalized-text fingerprint (`dedup.fingerprint`).
- :func:`cross_source_near_duplication` — near-duplicate
  instantiation: key = the connected-component id from
  `dedup.duplicate_groups` (MinHash→LSH→verify→components), so
  fuzzy rewrites across sources count too.

Scale shape: one groupBy to key grain, then a key-equi self-join
whose fan-out per key is bounded by the NUMBER OF SOURCES carrying
that key (≤ a few dozen in practice — never documents × documents),
then a pair-grain aggregation. Text never shuffles; only 16-byte
keys and source labels do. The output is sources² rows — driver-safe
at any corpus size.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no corpus surface; this
extends the governance family (SURVEY.md §2.13) beside the drift
audit (`drift.py`) and the incremental dedup path (`dedup.py`,
`bloom.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fingerprint

__all__ = [
    "source_overlap_matrix",
    "cross_source_duplication",
    "cross_source_near_duplication",
]


def source_overlap_matrix(
    keyed: DataFrame,
    key_col: str,
    source_col: str,
    totals: DataFrame | None = None,
) -> DataFrame:
    """``(key, source)`` rows (one per document; duplicates within a
    source allowed) → one row per ORDERED source pair (a, b) that
    shares at least one key:

    - ``shared_keys``: distinct keys present in both a and b;
    - ``docs_a_shared``: documents of a whose key also occurs in b
      (the mass of a that b already covers);
    - ``total_docs_a``: all documents of a;
    - ``frac_a_shared``: docs_a_shared / total_docs_a.

    Both orientations are emitted because the relation is
    asymmetric: a 1k-doc curated set fully contained in a 1B-doc
    crawl is 100% covered one way and ~0% the other.

    ``totals`` overrides the denominator table — pass
    ``(source, n)``-shaped counts over the FULL corpus when
    ``keyed`` covers only a subset of documents (the near-dup
    instantiation, where singleton documents carry no key)."""
    per = keyed.groupBy(
        F.col(key_col).alias("__key"), F.col(source_col).alias("__src")
    ).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    a = per.select(
        "__key",
        F.col("__src").alias("source_a"),
        F.col("__n").alias("__na"),
    )
    b = per.select("__key", F.col("__src").alias("source_b"))
    pairs = (
        a.join(b, "__key")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_keys"),
            F.sum("__na").cast("long").alias("docs_a_shared"),
        )
    )
    if totals is None:
        totals = keyed.groupBy(F.col(source_col).alias("source_a")).agg(
            F.count(F.lit(1)).cast("long").alias("total_docs_a")
        )
    else:
        tc = [c for c in totals.columns]
        totals = totals.select(
            F.col(tc[0]).alias("source_a"),
            F.col(tc[1]).cast("long").alias("total_docs_a"),
        )
    return pairs.join(F.broadcast(totals), "source_a").select(
        "source_a",
        "source_b",
        "shared_keys",
        "docs_a_shared",
        "total_docs_a",
        (F.col("docs_a_shared") / F.col("total_docs_a")).alias(
            "frac_a_shared"
        ),
    )


def cross_source_duplication(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
) -> DataFrame:
    """Exact cross-source overlap: two documents count as the same
    when their normalized-text fingerprints match (the `dedup_exact`
    key, so this audit and the dedup stage agree on identity).
    Returns :func:`source_overlap_matrix` output."""
    keyed = docs.select(
        fingerprint(text_col).alias("__fp"), F.col(source_col)
    )
    return source_overlap_matrix(keyed, "__fp", source_col)


def cross_source_near_duplication(
    groups: DataFrame,
    docs: DataFrame,
    id_col: str,
    source_col: str,
    group_col: str = "rep",
) -> DataFrame:
    """Near-duplicate cross-source overlap: ``groups`` is the
    ``(id, rep)`` component assignment from
    `dedup.duplicate_groups` over verified near-dup pairs (it emits
    only documents that HAVE a near-duplicate), joined back to
    ``docs`` for the source label. Fractions are relative to each
    source's FULL document count (singletons included), so
    ``frac_a_shared`` reads as "share of a's corpus with a near-dup
    in b". ``groups``' id column must be named ``id_col``."""
    keyed = groups.select(
        F.col(id_col), F.col(group_col).alias("__gid")
    ).join(docs.select(F.col(id_col), F.col(source_col)), id_col)
    totals = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return source_overlap_matrix(
        keyed, "__gid", source_col, totals=totals
    )
