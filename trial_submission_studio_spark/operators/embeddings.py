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

    ONE shuffle on the document key (``repartition``), then a
    BATCH-vectorized ``mapInPandas`` accumulation: per Arrow batch,
    rows sort by id and per-group partial sums come from one
    ``np.add.reduceat`` pass — merging into a per-partition
    accumulator keyed by id. No per-group Python function calls
    (the earlier ``applyInPandas`` formulation paid ~0.3 ms of
    pandas overhead per DOCUMENT — 15 s at 50k docs; this shape
    measured 16.7 s → ~2 s at sf0.1). Returns
    ``(id, out_col array<double>, n_pooled)``; NULL vectors are
    skipped, an all-NULL group yields a NULL vector, and mixed
    dimensions in one group raise (a real pipeline bug worth failing
    loudly on).

    Scale: per-partition state is one accumulator vector per doc in
    the partition — the POOLED result size, which is what the stage
    emits anyway; chunks-per-doc is bounded by design.
    """
    from pyspark.sql import functions as F
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

    def pool(batches):
        import numpy as np
        import pandas as pd

        # id -> [vsum_w, wsum, vsum_plain, cnt] (all-NULL ids -> None)
        acc: dict = {}

        def merge(key, vw, ws, vp, n):
            hit = acc.get(key)
            if hit is None:
                acc[key] = [vw, ws, vp, n]
                return
            if hit[2].shape != vp.shape:
                raise ValueError(
                    f"mixed embedding dims ({hit[2].size} vs {vp.size}) "
                    f"for {id_name}={key!r}"
                )
            hit[0] += vw
            hit[1] += ws
            hit[2] += vp
            hit[3] += n

        for pdf in batches:
            if not len(pdf):
                continue
            nulls = pdf[vec_name].isna()
            for key in pdf.loc[nulls, id_name]:
                acc.setdefault(key, None)
            keep = pdf[~nulls]
            if not len(keep):
                continue
            vecs = [np.asarray(v, dtype=np.float64) for v in keep[vec_name]]
            lens = {v.size for v in vecs}
            ids = keep[id_name].to_numpy()
            w = (
                keep[w_name].to_numpy(dtype=np.float64)
                if w_name is not None
                else np.ones(len(keep))
            )
            if len(lens) == 1:
                # fast path: one stack + one reduceat per batch
                mat = np.stack(vecs)
                order = np.argsort(ids, kind="stable")
                sid, smat, sw = ids[order], mat[order], w[order]
                uniq, starts = np.unique(sid, return_index=True)
                vw = np.add.reduceat(smat * sw[:, None], starts, axis=0)
                vp = np.add.reduceat(smat, starts, axis=0)
                ws = np.add.reduceat(sw, starts)
                cnts = np.diff(np.append(starts, len(sid)))
                for j, key in enumerate(uniq):
                    merge(key, vw[j].copy(), float(ws[j]), vp[j].copy(), int(cnts[j]))
            else:
                # heterogeneous dims across docs in one batch: row path
                for key, v, wi in zip(ids, vecs, w):
                    merge(key, v * wi, float(wi), v.copy(), 1)

        rows_id, rows_vec, rows_n = [], [], []
        for key, hit in acc.items():
            rows_id.append(key)
            if hit is None:
                rows_vec.append(None)
                rows_n.append(0)
            else:
                vw, ws, vp, n = hit
                pooled = vw / ws if ws > 0 else vp / n
                rows_vec.append(pooled.tolist())
                rows_n.append(n)
        yield pd.DataFrame(
            {id_name: rows_id, out_col: rows_vec, "n_pooled": rows_n}
        )

    return df.select(
        id_col, vec_col, *( [w_name] if w_name else [] )
    ).repartition(F.col(id_col)).mapInPandas(pool, out_schema)
