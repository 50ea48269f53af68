"""Z-order layout clustering + min-max pruning audit
(operators/layout.py).

Pins: Morton key bit-exactness vs a pure-Python reference,
bucket clamp/NULL edges, validation errors, and the measurable
point of the operator — that clustering on two columns makes parquet
row-group min/max stats prunable on BOTH, where the unclustered
layout prunes neither.
"""

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.layout import (
    bucketize,
    minmax_prune_fraction,
    zorder_key,
    zorder_layout,
)

from tests.conftest import rows


def _py_bucket(x, lo, hi, bits):
    if x is None:
        return 0
    import math

    n = 1 << bits
    raw = math.floor((float(x) - lo) / (hi - lo) * n)
    return max(0, min(n - 1, raw))


def _py_zkey(vals, bounds, bits):
    bs = [_py_bucket(v, lo, hi, bits) for v, (lo, hi) in zip(vals, bounds)]
    k = len(bs)
    out = 0
    for i in range(bits):
        for j, b in enumerate(bs):
            out |= ((b >> i) & 1) << (i * k + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    bounds = [(0.0, 100.0), (-50.0, 50.0)]
    bits = 6
    data = [
        (1, 0.0, -50.0),
        (2, 99.999, 49.999),
        (3, 42.5, 7.25),
        (4, -10.0, 500.0),  # clamps both ways
        (5, None, 0.0),  # NULL -> bucket 0
        (6, 100.0, -50.0),  # hi edge clamps to n-1
    ]
    df = spark.createDataFrame(data, "id long, a double, b double")
    got = rows(
        df.select(
            "id",
            zorder_key(
                [
                    bucketize("a", *bounds[0], bits=bits),
                    bucketize("b", *bounds[1], bits=bits),
                ],
                bits,
            ).alias("zkey"),
        )
    )
    want = sorted((i, _py_zkey((a, b), bounds, bits)) for i, a, b in data)
    assert got == want


def test_bucketize_edges(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 9.999), (4, 10.0), (5, 25.0), (6, None)],
        "id long, x double",
    )
    got = rows(df.select("id", bucketize("x", 0.0, 10.0, 3).alias("b")))
    # n=8 buckets over [0,10): clamp low->0, hi edge and beyond -> 7
    assert got == [(1, 0), (2, 0), (3, 7), (4, 7), (5, 7), (6, 0)]


def test_zorder_validations(spark):
    with pytest.raises(ValueError, match="lo < hi"):
        bucketize("x", 5.0, 5.0, 4)
    with pytest.raises(ValueError, match="bits"):
        bucketize("x", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], 8)
    with pytest.raises(ValueError, match="> 63"):
        zorder_key([F.lit(0)] * 8, 8)


def test_zorder_layout_improves_pruning(spark, tmp_path):
    """The operator's reason to exist: after clustering, a narrow
    range predicate on EITHER clustered column can skip most row
    groups from footer stats; the round-robin layout prunes zero."""
    li = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )
    flat_dir = str(tmp_path / "flat")
    zord_dir = str(tmp_path / "zorder")
    # round-robin baseline: every file spans the full value range
    li.repartition(16).write.parquet(flat_dir)
    clustered = zorder_layout(
        li,
        {"l_quantity": (1.0, 51.0), "l_extendedprice": (900.0, 105000.0)},
        bits=8,
        # 32 partitions: repartitionByRange samples boundaries, and at 16
        # files a lucky sample occasionally leaves one file straddling the
        # probe window (measured q-fraction 0.44-0.56); at 32 the measured
        # floor is 0.59 across repeated runs, so the >=0.5 assertions are
        # variance-proof without weakening what they assert.
        num_partitions=32,
    )
    clustered.write.parquet(zord_dir)

    flat_q = minmax_prune_fraction(flat_dir, "l_quantity", 10.0, 12.0)
    zord_q = minmax_prune_fraction(zord_dir, "l_quantity", 10.0, 12.0)
    flat_p = minmax_prune_fraction(flat_dir, "l_extendedprice", 2000.0, 4000.0)
    zord_p = minmax_prune_fraction(zord_dir, "l_extendedprice", 2000.0, 4000.0)

    assert flat_q["fraction"] == 0.0
    assert flat_p["fraction"] == 0.0
    # both clustered dims prune simultaneously — the Z-order property
    assert zord_q["fraction"] >= 0.5
    assert zord_p["fraction"] >= 0.5

    # layout is a reshuffle, never a row change
    assert clustered.count() == li.count()
    back = spark.read.parquet(zord_dir).drop("_zkey")
    assert rows(back) == rows(li)
