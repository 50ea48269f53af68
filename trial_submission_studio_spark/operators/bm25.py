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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_bm25_index", "bm25_topk"]


def _words(text_col: str) -> Column:
    t = F.lower(F.trim(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def build_bm25_index(
    docs: DataFrame, id_col: str, text_col: str
) -> dict:
    """→ ``{"postings", "doc_lens", "term_dfs", "n_docs", "avgdl"}``.
    One explode pass + three aggregations; the two scalars are the
    only driver-side values (1-row collect)."""
    toks = docs.select(F.col(id_col), F.explode(_words(text_col)).alias("term"))
    postings = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    doc_lens = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    term_dfs = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    stats = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return {
        "postings": postings,
        "doc_lens": doc_lens,
        "term_dfs": term_dfs,
        "n_docs": int(stats["n"]),
        "avgdl": float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0,
    }


def bm25_topk(
    index: dict,
    queries: DataFrame,
    query_id_col: str,
    query_text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """→ ``(query_id, id, score, rank)``: top-k corpus documents per
    query. Query-side weights: repeated query terms count once (the
    standard short-query convention). OOV query terms contribute
    nothing; ties break on ascending doc id for determinism."""
    if k <= 0:
        raise ValueError("k must be positive")
    postings, doc_lens, term_dfs = (
        index["postings"],
        index["doc_lens"],
        index["term_dfs"],
    )
    n_docs, avgdl = index["n_docs"], index["avgdl"]
    id_col = [c for c in postings.columns if c not in ("term", "tf")][0]
    qterms = queries.select(
        F.col(query_id_col), F.explode(F.array_distinct(_words(query_text_col))).alias("term")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(term_dfs), "term")
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
