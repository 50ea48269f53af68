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
