"""Model-based test of the ANN store's LSM semantics: random
append / upsert / delete / compact sequences vs a dict model; after
every commit a FULL-probe query must retrieve exactly the model's
live ids ranked by true cosine (full probe removes the ANN
approximation, so any divergence is a correctness bug in the
seq/tombstone resolution, not recall)."""

import math
import random

import pytest

from trial_submission_studio_spark.operators.ann_store import (
    append_ivf_corpus,
    compact_ivf_store,
    delete_ivf_vectors,
    save_ivf_corpus,
    saved_ivf_topk,
    upsert_ivf_vectors,
)

DIM = 6
N_CELLS = 4


def _vec(i):
    return [math.sin(i * 0.7 + j * 1.3) + 0.1 * j for j in range(DIM)]


def _vdf(spark, items):
    return spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in items],
        "vec_id long, embedding array<double>",
    )


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else 0.0


def _expected_topk(model, qvec, k):
    # rank by UNROUNDED sim (the store's window ranks before the
    # display rounding), ties by id asc
    scored = sorted(
        ((_cos(qvec, v), i) for i, v in model.items()),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    return [i for _, i in scored]


@pytest.mark.parametrize("seed", [11])
def test_random_lsm_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / "ann")

    model = {i: _vec(i) for i in range(30)}
    save_ivf_corpus(_vdf(spark, model.items()), root, n_centroids=N_CELLS)
    next_id = 30

    for step in range(8):
        op = rng.choice(["append", "upsert", "delete", "compact"])
        if op == "append":
            fresh = {next_id + i: _vec(next_id + i) for i in range(3)}
            next_id += 3
            append_ivf_corpus(_vdf(spark, fresh.items()), root)
            model.update(fresh)
        elif op == "upsert":
            # replace 2 existing (or deleted-then-revived) ids with
            # vectors from a far id -> often a different cell
            targets = rng.sample(range(next_id), 2)
            ups = {t: _vec(t + 500) for t in targets}
            upsert_ivf_vectors(_vdf(spark, ups.items()), root)
            model.update(ups)
        elif op == "delete":
            if len(model) <= 8:
                continue
            dels = rng.sample(sorted(model), 2)
            delete_ivf_vectors(
                spark.createDataFrame([(d,) for d in dels], "vec_id long"),
                root,
            )
            for d in dels:
                model.pop(d)
        else:
            compact_ivf_store(spark, root)

        # verify on 3 probe queries with FULL probing
        queries = [(9000 + j, _vec(50 + 17 * j)) for j in range(3)]
        got = saved_ivf_topk(
            spark, root, _vdf(spark, queries), k=5, n_probe=N_CELLS
        ).collect()
        by_q = {}
        for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
            by_q.setdefault(r.query_id, []).append(r.vec_id)
        for qid, qvec in queries:
            want = _expected_topk(model, qvec, 5)
            assert by_q.get(qid, []) == want, (seed, step, op, qid)
