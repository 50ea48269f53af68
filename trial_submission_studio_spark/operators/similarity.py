"""Similarity search over embedding columns (north-star extension).

- :func:`cosine_similarity` — expression-only dot/norm over
  ``array<float>`` (``zip_with`` + ``aggregate``), computed in double
  precision for oracle-stable results.
- :func:`brute_force_topk` — exact top-k neighbors of a query vector:
  one narrow map over the corpus + a k-limit. The baseline ANN path.
- :func:`lsh_bucket_topk` — scale path: random-hyperplane LSH
  signatures bucket the corpus; top-k runs inside the probe's bucket
  only. Hyperplanes are derived deterministically from a seed via
  xxhash64, so plans are reproducible without Math.random.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (id, sim) ordered desc, id tiebreak.

    The query vector ships as a literal array (no join); the scan is
    one narrow stage; the global top-k is a TakeOrdered — no full
    sort, no shuffle of the corpus.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = corpus.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), q).alias("sim"),
    )
    return scored.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


def hyperplane_signature(
    vec: Column | str, dim: int, bits: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id (int) for a vector column.

    Hyperplane component h[b][i] ∈ {-1, +1} is derived from
    xxhash64(b, i, seed) — deterministic, no stored model. Bucket =
    sum over bits of sign(dot(vec, h_b)) << b.
    """
    v = F.col(vec) if isinstance(vec, str) else vec
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        comp = F.zip_with(
            v,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, i: F.when(
                F.xxhash64(F.lit(b), i, F.lit(seed)).bitwiseAND(F.lit(1)) == 1,
                x.cast("double"),
            ).otherwise(-x.cast("double")),
        )
        dot = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k per query via shared-bucket equi-join.

    Output: (query_id, id, sim, rank ≤ k). The join shuffles on the
    bucket id only; within-bucket ranking is a bounded window.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cvec"),
        hyperplane_signature(vec_col, dim, bits, seed).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"),
        hyperplane_signature(vec_col, dim, bits, seed).alias("__bucket"),
    )
    joined = q.join(c, "__bucket").withColumn(
        "sim", cosine_similarity(F.col("__qvec"), F.col("__cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("sim", 6).alias("sim"), "rank")
    )


def ivf_assign_cell(
    vec: Column | str, centroids: list[list[float]]
) -> Column:
    """Cell id = argmax cosine similarity over the centroid list.

    Centroids ship as literals (an IVF index is schema-sized); the
    argmax is a ``greatest`` over (sim, idx) structs — pure JVM.
    """
    v = F.col(vec) if isinstance(vec, str) else vec
    scored = [
        F.struct(
            cosine_similarity(v, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.greatest(*scored)["i"]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into centroid cells, search
    only the query's ``n_probe`` nearest cells.

    Round-1 index: centroids are the first ``n_centroids`` corpus
    vectors by id (deterministic; a production index would k-means a
    sample). The cell join shuffles on the cell id only; per-query
    ranking is a bounded window. Output: (query_id, id, sim, rank).
    """
    from pyspark.sql import Window

    cents = [
        [float(x) for x in r[vec_col]]
        for r in corpus.orderBy(id_col).limit(n_centroids).collect()
    ]
    assigned = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cvec"),
        ivf_assign_cell(vec_col, cents).alias("__cell"),
    )
    # query side: the n_probe best cells via sorted (sim, idx) structs
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    cell_scores = F.array(
        *[
            F.struct(
                cosine_similarity(F.col("__qvec"), F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(cents)
        ]
    )
    q = q.withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(cell_scores)), 1, n_probe),
                lambda s: s["i"],
            )
        ),
    )
    joined = q.join(assigned, "__cell").withColumn(
        "sim", cosine_similarity(F.col("__qvec"), F.col("__cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("sim", 6).alias("sim"), "rank")
    )
