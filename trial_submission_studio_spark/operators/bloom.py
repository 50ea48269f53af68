"""Distributed Bloom filters — constant-size mergeable membership
state for incremental corpus dedup.

The daily-crawl problem at 100 TB: `incremental_exact_dedup`
(`dedup.py`) anti-joins every increment against the full corpus
fingerprint table — correct, but the join touches a corpus-sized
table each run. A Bloom filter summarizes that table into a
fixed-size bitmap (~1.2 GB per 10⁹ keys at 1% fpp, linearly less at
higher fpp), giving each increment row a free three-way triage:

- **bit miss** → *definitely new*: ships with NO join at all;
- **bit hit** → *maybe seen*: only this ~(dups + fpp) slice goes
  through the exact anti-join, so the expensive path shrinks from
  |increment| to |true dups| + fpp·|increment|.

Semantics are EXACTLY those of the plain anti-join (the filter only
prunes; `bloom_incremental_dedup` verifies every maybe-hit), so the
composition is oracle-checkable against ordinary SQL.

Engineering shape:

- Bit positions are computed JVM-side (two ``xxhash64`` passes +
  Kirsch–Mitzenmacher double hashing, whole-stage codegen); Python
  only ORs numpy bitmaps per partition (build) or tests bits
  against a broadcast bitmap (probe) — no per-row Python hashing.
- Build is one ``mapInPandas`` pass yielding one bitmap row per
  partition, OR-merged on the driver: collect volume is
  ``n_partitions × m/8`` bytes. For multi-GB bitmaps coalesce the
  position stream first or build per-day filters and
  :func:`merge_blooms` them (OR is exact and associative — filters
  with identical (m, k) merge losslessly, the same contract as the
  HLL/KLL sketches in `sketches.py`).
- Persistence is a side-file pair (json params + raw bitmap), like
  the ANN index artifacts in `similarity.py`.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no streaming/incremental
surface; this extends the training-data extension family
(SURVEY.md §2.13) next to `incremental_exact_dedup` and the
mergeable sketches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BloomFilter",
    "bloom_params",
    "build_bloom",
    "merge_blooms",
    "save_bloom",
    "load_bloom",
    "bloom_maybe_seen",
    "bloom_incremental_dedup",
]


@dataclass
class BloomFilter:
    """m-bit filter with k hash functions; ``bitmap`` is the packed
    little-endian bit array (numpy uint8, ``m/8`` bytes)."""

    m_bits: int
    k: int
    bitmap: bytes
    n_added: int = 0

    def fpp_estimate(self) -> float:
        """Observed false-positive probability from bitmap load:
        (set_bits / m) ** k — the standard occupancy estimate."""
        import numpy as np

        load = np.unpackbits(np.frombuffer(self.bitmap, dtype=np.uint8)).mean()
        return float(load**self.k)


def bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for a target capacity and false-positive rate —
    the textbook optimum m = -n·ln p / ln²2, k = (m/n)·ln 2.
    m is rounded up to a byte multiple."""
    if not 0 < fpp < 1 or capacity <= 0:
        raise ValueError("need capacity > 0 and 0 < fpp < 1")
    m = math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _positions_col(key_col: str, m_bits: int, k: int):
    """array<long> of the k bit positions for a key — all JVM
    expressions (two xxhash64 evaluations, Kirsch–Mitzenmacher
    h1 + i·h2 double hashing). Both hashes are reduced mod m BEFORE
    combining so k·m stays far under int64 — raw xxhash64 sums would
    overflow, which THROWS under Spark 4's default ANSI mode."""
    h1 = F.pmod(F.xxhash64(F.col(key_col)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(F.col(key_col), F.lit(0x9E3779B9)), F.lit(m_bits))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    capacity: int,
    fpp: float = 0.01,
) -> BloomFilter:
    """One distributed pass over ``df[key_col]`` → a BloomFilter.

    Plan: JVM computes each key's k positions; a mapInPandas kernel
    ORs them into one numpy bitmap per partition; the driver ORs the
    per-partition bitmaps (collect volume n_partitions × m/8 bytes).
    """
    import numpy as np

    m_bits, k = bloom_params(capacity, fpp)
    nbytes = m_bits // 8
    pos_df = df.select(_positions_col(key_col, m_bits, k).alias("pos"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        bitmap = np.zeros(nbytes, dtype=np.uint8)
        n = 0
        for pdf in batches:
            for arr in pdf["pos"]:
                a = np.asarray(arr, dtype=np.int64)
                np.bitwise_or.at(bitmap, a >> 3, (1 << (a & 7)).astype(np.uint8))
                n += 1
        yield pd.DataFrame({"bitmap": [bitmap.tobytes()], "n": [n]})

    rows = pos_df.mapInPandas(kernel, "bitmap binary, n long").collect()
    merged = np.zeros(nbytes, dtype=np.uint8)
    total = 0
    for r in rows:
        merged |= np.frombuffer(r["bitmap"], dtype=np.uint8)
        total += r["n"]
    return BloomFilter(m_bits, k, merged.tobytes(), total)


def merge_blooms(filters) -> BloomFilter:
    """OR-merge filters built with identical (m, k) — exact and
    associative, the sketch-merge contract."""
    import numpy as np

    filters = list(filters)
    if not filters:
        raise ValueError("nothing to merge")
    m, k = filters[0].m_bits, filters[0].k
    out = np.zeros(m // 8, dtype=np.uint8)
    n = 0
    for f in filters:
        if (f.m_bits, f.k) != (m, k):
            raise ValueError("can only merge filters with identical (m, k)")
        out |= np.frombuffer(f.bitmap, dtype=np.uint8)
        n += f.n_added
    return BloomFilter(m, k, out.tobytes(), n)


def save_bloom(bf: BloomFilter, path: str) -> None:
    """Persist as <path>.json (params) + <path>.bits (raw bitmap)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".json", "w") as fh:
        json.dump({"m_bits": bf.m_bits, "k": bf.k, "n_added": bf.n_added}, fh)
    with open(path + ".bits", "wb") as fh:
        fh.write(bf.bitmap)


def load_bloom(path: str) -> BloomFilter:
    import json

    with open(path + ".json") as fh:
        meta = json.load(fh)
    with open(path + ".bits", "rb") as fh:
        bitmap = fh.read()
    if len(bitmap) * 8 != meta["m_bits"]:
        raise ValueError("bitmap size does not match recorded m_bits")
    return BloomFilter(meta["m_bits"], meta["k"], bitmap, meta["n_added"])


def bloom_maybe_seen(
    df: DataFrame,
    key_col: str,
    bf: BloomFilter,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Adds boolean ``out_col``: True iff all k bits are set (maybe
    in the corpus), False → definitely not. Positions are JVM
    expressions; the bitmap ships ONCE per executor via a Spark
    broadcast and the Arrow-batched probe only tests bits."""
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    sc = SparkSession.getActiveSession().sparkContext
    bc = sc.broadcast(bf.bitmap)

    @pandas_udf("boolean")
    def probe(pos_series):
        import numpy as np
        import pandas as pd

        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        out = []
        for arr in pos_series:
            a = np.asarray(arr, dtype=np.int64)
            out.append(bool(((bitmap[a >> 3] >> (a & 7)) & 1).all()))
        return pd.Series(out)

    return df.withColumn(
        out_col, probe(_positions_col(key_col, bf.m_bits, bf.k))
    )


def bloom_incremental_dedup(
    new_df: DataFrame,
    seen_keys: DataFrame | None,
    bf: BloomFilter,
    key_col: str,
) -> DataFrame:
    """Exact incremental dedup with Bloom pruning: rows whose filter
    probe misses bypass the anti-join entirely; only maybe-seen rows
    (true dups + the fpp slice) are verified against ``seen_keys``
    (a 1-column DataFrame named ``key_col``). Returns the novel
    rows — IDENTICAL to a plain anti-join of ``new_df`` against
    ``seen_keys`` (the filter must contain every seen key; extra
    keys only cost verification work, never correctness)."""
    probed = bloom_maybe_seen(new_df, key_col, bf, "__maybe")
    definitely_new = probed.filter(~F.col("__maybe")).drop("__maybe")
    if seen_keys is None:
        return probed.drop("__maybe")
    maybe = probed.filter(F.col("__maybe")).drop("__maybe")
    verified_new = maybe.join(seen_keys, key_col, "left_anti")
    return definitely_new.unionByName(verified_new)
