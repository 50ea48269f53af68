"""Materialize a larger scale factor from a base testdata dir by
K-way replication with key-shifted replicas (`sf0.1 × 10 → sf1`-shaped
data for the bench's scale sweep).

Every key/id column shifts by ``replica * OFFSET`` (one GLOBAL offset,
so cross-table joins stay consistent: a replica's orders reference the
same replica's customers). Non-key payloads replicate verbatim —
exact duplicate groups are bounded at K+1 members, the realistic
crawl-corpus shape for the dedup operators. Dimension tables
(region/nation) don't scale, like TPC-H.

Event TIMESTAMPS shift by ``replica * 31 days`` so the time axis
EXTENDS as the table grows — the realistic shape (a 10× events table
is 10 more months of history, not 10× the density of one month).
This is what makes the sf1 sweep meaningful for time-windowed
operators: a fixed query window (the zonemap bench's last-day slice)
keeps a fixed row count while the table grows, so manifest-level file
skipping shows up as a ~flat pruned scan against a ~10× full scan.

Usage: ``python tools/make_scale_data.py <base_sf_dir> <out_dir> <K>``
(also importable: :func:`make_scale_data`).
"""

from __future__ import annotations

import os
import sys

#: added to every key column per replica — far above any base key
OFFSET = 100_000_000

#: key columns to shift, per table; tables absent here copy verbatim
KEY_COLS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "region": (),
    "nation": (),
}

#: timestamp columns shifted by replica * 31 days (see module doc)
TS_SHIFT_COLS = {"events": ("ts",)}


def make_scale_data(spark, base_dir: str, out_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for table, keys in KEY_COLS.items():
        src = os.path.join(base_dir, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(src)
        if not keys:  # dimension table: verbatim copy
            df.write.mode("overwrite").parquet(dst)
            continue
        parts = []
        for i in range(k):
            rep = df
            for c in keys:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            for c in TS_SHIFT_COLS.get(table, ()):
                rep = rep.withColumn(
                    c, F.col(c) + F.expr(f"INTERVAL {i * 31} DAY")
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # spread row groups so downstream scans parallelize like a
        # real large table (one input file would serialize the scan)
        out.repartition(32).write.mode("overwrite").parquet(dst)


def main() -> None:
    base, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from trial_submission_studio_spark import get_spark

    spark = get_spark(app_name="make_scale_data")
    make_scale_data(spark, base, out, k)
    spark.stop()


if __name__ == "__main__":
    main()
