"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive canonicalized value dump.

Usage:
    python tools/check_oracle.py [query ...]        # default: all, sf0.01
    SF_DIR=/root/testdata/sf0.001 python tools/check_oracle.py
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from trial_submission_studio_spark import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "Y" if v else "N"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_frame(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(spdf)} rows (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            opdf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        s_cols, s_rows = canon_frame(spdf)
        o_cols, o_rows = canon_frame(opdf)
        ok = True
        msgs = []
        if s_cols != o_cols:
            ok = False
            msgs.append(f"columns {s_cols} != {o_cols}")
        if len(s_rows) != len(o_rows):
            ok = False
            msgs.append(f"rowcount {len(s_rows)} != {len(o_rows)}")
        elif s_cols == o_cols and s_rows != o_rows:
            ok = False
            diffs = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][:3]
            msgs.append(f"values differ; first diffs: {diffs}")
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
