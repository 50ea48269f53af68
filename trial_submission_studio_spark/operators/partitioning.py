"""Partition-layout guards shared by the CPU-heavy operators.

One scan task per parquet row group is correct for IO-bound reads,
but a *small* file (one row group) starves a wide cluster when the
next stage does real per-row CPU work — shingle explosion + hashing,
regex ladders, Arrow kernel UDFs. These helpers widen such inputs
conditionally, so the guard is a no-op wherever the data already
arrives with enough splits (any real deployment).

r16: the guard itself must be cheap. The original
``df.rdd.getNumPartitions()`` probe forces full physical planning
PLUS the Python-RDD conversion — measured ~0.55 s of driver time per
call on a windowed frame, charged to every widened query per run.
The guard now decides from the ANALYZED logical plan (cheap, cached
on the DataFrame) and the source files:

- a frame whose lineage contains a shuffle-introducing operator
  (Window/Aggregate/Repartition/Sort/Deduplicate) already runs at
  ``spark.sql.shuffle.partitions`` — never widen;
- otherwise the frame is a narrow chain over its sources, and its
  parallelism is the SCAN parallelism: for local parquet the total
  row-group count (byte splits beyond the row-group grain are empty
  tasks, not parallelism), for splittable text formats Spark's own
  split formula;
- remote/unknown sources fall back to the exact (expensive) probe —
  rare, and real deployments take the many-files early exit first.
"""

from __future__ import annotations

import math
import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: logical operators that introduce a shuffle boundary beneath the
#: point of the probe (joins are deliberately absent: a broadcast
#: join keeps the probe side's narrow scan parallelism, which is
#: exactly the case that needs widening)
_WIDE_NODE_RE = re.compile(
    r"(?m)^[\s:+\-]*(Window|Aggregate|RepartitionByExpression|"
    r"Repartition|RebalancePartitions|Deduplicate|Sort)\W"
)


def _local_paths(files: list[str]) -> list[str] | None:
    """file:-scheme URIs → local paths; None if any file is remote."""
    out = []
    for uri in files:
        if uri.startswith("file:"):
            path = uri[5:]
            while path.startswith("//"):
                path = path[1:]
            out.append(path)
        elif "://" in uri:
            return None
        else:
            out.append(uri)
    return out


def _scan_parallelism(spark, files: list[str], slots: int) -> int | None:
    """Effective scan parallelism for a narrow file-backed frame;
    None when unknowable cheaply."""
    if len(files) >= slots:
        return slots
    paths = _local_paths(files)
    if paths is None:
        return None
    if all(p.split("?")[0].endswith(".parquet") for p in paths):
        try:
            import pyarrow.parquet as pq

            total = 0
            for p in paths:
                total += pq.ParquetFile(p).metadata.num_row_groups
                if total >= slots:
                    return slots
            return total
        except Exception:
            return None
    # splittable text sources: Spark's own split-size formula
    try:
        conf = spark.conf
        max_pb = _to_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        open_cost = _to_bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
        sizes = [os.path.getsize(p) for p in paths]
    except Exception:
        return None
    if any(p.endswith((".gz", ".zst", ".bz2")) for p in paths):
        return len(paths)  # unsplittable compressed files: 1 task each
    total_weighted = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_pb, max(open_cost, total_weighted // max(slots, 1)))
    return sum(
        max(1, math.ceil(s / max(max_split, 1))) for s in sizes
    )


def _to_bytes(v: str) -> int:
    s = str(v).strip().lower()
    for suf, mul in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mul)
    return int(s)


def widen_if_narrow(df: DataFrame, key_col) -> DataFrame:
    """Repartition by key to the cluster's slot count ONLY when the
    input has fewer *effective* partitions than slots.

    ``key_col`` may be a column name or a Column expression (r17: the
    normalization compiler keys the widen on the --SEQ window's
    partition expression so both share one exchange).

    The repartition shuffles the NARROW pre-explode rows once; at
    real scale (inputs with thousands of splits) the condition is
    false and no shuffle is added. See the module docstring for how
    the probe stays O(ms)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if _WIDE_NODE_RE.search(plan):
            return df  # already behind a shuffle boundary
        files = df.inputFiles()
    except Exception:
        files = None
    eff = None
    if files:
        eff = _scan_parallelism(df.sparkSession, files, p)
    if eff is None:
        # unknown source shape (non-file relation, remote FS):
        # exact-but-expensive fallback, the pre-r16 behavior
        eff = df.rdd.getNumPartitions()
    if eff >= p:
        return df
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    # explicit numPartitions (REPARTITION_BY_NUM): the widen exists
    # because the downstream stage is CPU-dense on byte-light rows —
    # exactly the case AQE's byte-based coalescing mis-sizes (an r17
    # trial with REPARTITION_BY_COL let AQE fold 0.9 MB shuffles to
    # ~11 tasks and measurably slowed the regex/shingle extras).
    return df.repartition(p, key)
