"""Record linkage / entity resolution (operators/linkage.py)."""

import pytest

from trial_submission_studio_spark.operators.linkage import (
    candidate_pairs,
    link_records,
    oversized_blocks,
    pair_scores,
    resolve_entities,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def people(spark):
    # blocking key = (city); "Jon Smith"/"John Smith" is the classic
    # near-match, ids 4/5 are distinct people sharing a block
    data = [
        (1, "john smith", "12 main st", "boston"),
        (2, "jon smith", "12 main st.", "boston"),
        (3, "john smith", "99 elm ave", "denver"),
        (4, "alice jones", "7 oak rd", "boston"),
        (5, "robert brown", "misc", "boston"),
        (6, None, None, "boston"),
    ]
    return spark.createDataFrame(data, "id long, name string, addr string, city string")


def test_candidate_pairs_block_and_order(people):
    p = candidate_pairs(
        people, id_col="id", block_cols=["city"], compare_cols=["name"]
    )
    got = sorted((r.id_a, r.id_b) for r in p.collect())
    # boston block = {1,2,4,5,6} -> C(5,2)=10 ordered pairs; denver singleton none
    assert len(got) == 10
    assert all(a < b for a, b in got)
    assert (1, 2) in got and (3, 1) not in got and (1, 3) not in got


def test_two_source_linkage(spark, people):
    other = spark.createDataFrame(
        [(101, "john smith", "boston")], "id long, name string, city string"
    )
    p = candidate_pairs(
        people, other, id_col="id", block_cols=["city"], compare_cols=["name"]
    )
    assert sorted((r.id_a, r.id_b) for r in p.collect()) == [
        (i, 101) for i in (1, 2, 4, 5, 6)
    ]


def test_pair_scores_levenshtein_ratio(people):
    scored = pair_scores(
        candidate_pairs(
            people, id_col="id", block_cols=["city"], compare_cols=["name"]
        ),
        ["name"],
    )
    by_pair = {(r.id_a, r.id_b): r for r in scored.collect()}
    # "john smith" vs "jon smith": lev 1, maxlen 10
    assert by_pair[(1, 2)].sim_name == pytest.approx(0.9)
    assert by_pair[(1, 2)].sim == pytest.approx(0.9)
    # NULL compares as empty: lev("john smith","")=10 -> 0.0
    assert by_pair[(1, 6)].sim_name == 0.0


def test_both_null_is_perfect(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, None, "x")], "id long, name string, blk string"
    )
    scored = pair_scores(
        candidate_pairs(df, id_col="id", block_cols=["blk"], compare_cols=["name"]),
        ["name"],
    )
    assert scored.collect()[0].sim_name == 1.0


def test_weights_shift_the_mean(people):
    pairs = candidate_pairs(
        people, id_col="id", block_cols=["city"], compare_cols=["name", "addr"]
    )
    even = pair_scores(pairs, ["name", "addr"])
    heavy = pair_scores(pairs, ["name", "addr"], weights={"name": 3.0})
    e = {(r.id_a, r.id_b): r for r in even.collect()}[(1, 2)]
    h = {(r.id_a, r.id_b): r for r in heavy.collect()}[(1, 2)]
    assert e.sim == pytest.approx((e.sim_name + e.sim_addr) / 2)
    assert h.sim == pytest.approx((3 * h.sim_name + h.sim_addr) / 4)
    with pytest.raises(ValueError):
        pair_scores(pairs, ["name"], weights={"nope": 1.0})


def test_link_records_threshold(people):
    m = link_records(
        people,
        id_col="id",
        block_cols=["city"],
        compare_cols=["name", "addr"],
        threshold=0.85,
    )
    assert sorted((r.id_a, r.id_b) for r in m.collect()) == [(1, 2)]


def test_resolve_entities_assigns_components(spark, people):
    matches = spark.createDataFrame(
        [(1, 2), (2, 5)], "id_a long, id_b long"
    )  # chain 1-2-5 -> entity 1; others singletons
    ents = resolve_entities(people, matches, id_col="id")
    got = {r.id: r.entity_id for r in ents.collect()}
    assert got == {1: 1, 2: 1, 5: 1, 3: 3, 4: 4, 6: 6}
    assert "entity_id" in ents.columns and "__rep" not in ents.columns


def test_max_block_size_caps_loudly(spark, people):
    # boston has 5 rows -> capped out at max_block_size=4; denver pairs remain none
    assert candidate_pairs(
        people,
        id_col="id",
        block_cols=["city"],
        compare_cols=["name"],
        max_block_size=4,
    ).count() == 0
    audit = oversized_blocks(people, ["city"], 4).collect()
    assert [(r.city, r.block_size) for r in audit] == [("boston", 5)]


def test_null_blocks_never_pair(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None)], "id long, name string, blk string"
    )
    assert candidate_pairs(
        df, id_col="id", block_cols=["blk"], compare_cols=["name"]
    ).count() == 0


def test_validation_errors(people):
    with pytest.raises(ValueError):
        candidate_pairs(people, id_col="id", block_cols=[], compare_cols=["name"])
    with pytest.raises(ValueError):
        candidate_pairs(people, id_col="id", block_cols=["city"], compare_cols=[])
    with pytest.raises(ValueError):
        link_records(
            people,
            id_col="id",
            block_cols=["city"],
            compare_cols=["name"],
            threshold=1.5,
        )


def test_plan_no_cartesian_and_blocked_join(people):
    plan = (
        link_records(
            people, id_col="id", block_cols=["city"], compare_cols=["name"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan  # JVM expression, no Python eval
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_property_similarity_bounds_and_identity(spark):
    """Property: sim_<c> is in [0, 1]; equal strings score exactly 1;
    the score is symmetric in the pair orientation."""
    from hypothesis import given, settings, strategies as st

    words = st.text(alphabet="abcdef ", min_size=0, max_size=12)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(words, words), min_size=1, max_size=10))
    def run(pairs):
        rows = [
            (i, a, i + 1000, b, "blk") for i, (a, b) in enumerate(pairs)
        ]
        df = spark.createDataFrame(
            rows, "id_a long, name_a string, id_b long, name_b string, blk string"
        )
        scored = pair_scores(df, ["name"]).collect()
        rev = pair_scores(
            df.selectExpr(
                "id_b AS id_a", "name_b AS name_a",
                "id_a AS id_b", "name_a AS name_b", "blk",
            ),
            ["name"],
        ).collect()
        for r, rr in zip(
            sorted(scored, key=lambda r: r.id_a),
            sorted(rev, key=lambda r: r.id_b),
        ):
            assert 0.0 <= r.sim_name <= 1.0
            assert r.sim == r.sim_name
            assert r.sim_name == rr.sim_name  # symmetric
        for r, (a, b) in zip(sorted(scored, key=lambda r: r.id_a), pairs):
            if (a or "") == (b or ""):
                assert r.sim_name == 1.0

    run()
