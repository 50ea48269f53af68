"""Embedding-column utilities: L2 normalization and int8 quantization.

A 100-TB corpus with a 1-kB float32 embedding per document carries
~100 TB of raw text AND tens of TB of vectors; before ANN indexing or
shipping vectors to a training mix, pipelines (a) L2-normalize so
cosine becomes dot product, and (b) quantize to int8 (4× smaller,
SIMD-friendly at serving time).

Everything here is a pure higher-order array expression — codegen,
no UDF, no shuffle — designed to compose with the
:mod:`~trial_submission_studio_spark.operators.similarity` ANN family
(which consumes normalized vectors) in the same projection.

Quantization contract (symmetric, per-vector scale):

- ``scale = max(|v_i|) / 127`` (a zero vector quantizes to zeros
  with scale 0 rather than dividing by zero);
- ``q_i = floor(v_i / scale + 0.5)`` — round-half-up via ``floor``
  because it is bit-deterministic and engine-portable (`round`
  half-even vs half-away differs across engines); the result is
  always in [-127, 127] so no clip is needed.

Scale note: these are composable Column factories, and Catalyst's
CollapseProject re-inlines them — referencing ``quantize_int8`` N
times recomputes the scale N times (visible in ``.explain``). Per
row that is still O(N·dim) scalar work inside codegen (microseconds
at dim 64–4096), but the canonical 100-TB pattern is to WRITE the
quantized struct column once and read codes downstream, not to
recompute quantization per consumer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dvec(c: Column | str) -> Column:
    """Cast any numeric array to array<double> (embeddings land as
    float32 from parquet; all math runs in double for portability)."""
    return F.transform(_c(c), lambda x: x.cast("double"))


def l2_norm(c: Column | str) -> Column:
    """Euclidean norm of a vector column (double)."""
    v = _dvec(c)
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(c: Column | str) -> Column:
    """Unit-norm copy of the vector (zero vectors pass through as
    zeros — NULL-poisoning a whole embedding column over one bad row
    is worse than an un-normalized zero)."""
    v = _dvec(c)
    n = l2_norm(c)
    return F.when(n == 0, v).otherwise(
        F.transform(v, lambda x: x / n)
    )


def quantize_int8(c: Column | str) -> Column:
    """Symmetric int8 quantization →
    ``struct(q: array<int>, scale: double)``.

    Dequantize with :func:`dequantize_int8`; worst-case element error
    is ``scale / 2``. The scale is per-vector (per-row), which beats
    a global scale on heterogeneous corpora and needs no second pass.
    """
    v = _dvec(c)
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(amax == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return F.struct(q.alias("q"), scale.alias("scale"))


def dequantize_int8(q: Column | str, scale: Column | str) -> Column:
    """Reconstruct the (lossy) double vector from int8 codes."""
    s = _c(scale)
    return F.transform(_c(q), lambda x: x.cast("double") * s)


def pool_embeddings(
    df,
    id_col: str,
    vec_col: str,
    weight_col: str | None = None,
    out_col: str = "vec",
):
    """Pool per-chunk vectors back to one vector per document —
    the standard step after encoding `chunking.chunk_documents`
    output with a context-window-bounded embedder (mean pooling, or
    token-count-weighted mean with ``weight_col`` so short tail
    chunks don't dominate).

    ONE shuffle on the document key, then a numpy kernel per group
    (``applyInPandas``, Arrow-batched, closure-factory rule — the
    worker imports nothing from this package). Returns
    ``(id, out_col array<double>, n_pooled)``; NULL vectors are
    skipped, an all-NULL group yields a NULL vector, and mixed
    dimensions in one group raise (a real pipeline bug worth failing
    loudly on).

    Scale: per-group state is one accumulator vector — group size
    (chunks per doc) is bounded by design, and hot documents don't
    exist (chunk counts are data-independent of corpus size).
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_field.name, id_field.dataType, id_field.nullable),
            StructField(out_col, ArrayType(DoubleType()), True),
            StructField("n_pooled", LongType(), False),
        ]
    )
    id_name, vec_name, w_name = id_col, vec_col, weight_col

    def pool(pdf):
        import numpy as np
        import pandas as pd

        keep = pdf[pdf[vec_name].notna()]
        key = pdf[id_name].iloc[0]
        if len(keep) == 0:
            return pd.DataFrame({id_name: [key], "v": [None], "n": [0]}).rename(
                columns={"v": out_col, "n": "n_pooled"}
            )
        dims = {len(v) for v in keep[vec_name]}
        if len(dims) != 1:
            raise ValueError(
                f"mixed embedding dims {sorted(dims)} for {id_name}={key!r}"
            )
        mat = np.array([np.asarray(v, dtype=np.float64) for v in keep[vec_name]])
        if w_name is not None:
            w = keep[w_name].to_numpy(dtype=np.float64)
            tot = w.sum()
            pooled = (mat * w[:, None]).sum(axis=0) / tot if tot > 0 else mat.mean(axis=0)
        else:
            pooled = mat.mean(axis=0)
        return pd.DataFrame(
            {id_name: [key], out_col: [pooled.tolist()], "n_pooled": [len(keep)]}
        )

    return df.groupBy(id_col).applyInPandas(pool, out_schema)
