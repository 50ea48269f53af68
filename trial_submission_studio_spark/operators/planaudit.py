"""Physical-plan audit — structured facts about what a DataFrame
will actually DO, for CI gates and scale reviews.

The engine's internal discipline (tests/test_plan_shapes.py) is that
every operator's plan is inspected, not assumed: filters reach the
scan, joins broadcast when they should, nothing goes cartesian,
Python stays off the hot path. This module packages that discipline
as a library API so a pipeline can assert the same properties about
ITS OWN composed queries — the difference between "ran fine at 1 GB"
and "will survive 100 TB" is usually visible in exactly these counts.

:func:`plan_facts` parses the compiled physical plan into a dict of
counts and scan details; :func:`assert_plan` turns bounds on those
facts into a hard failure whose message carries the summary. Both
inspect the INITIAL compiled plan (before AQE runtime re-planning,
which only ever removes/downgrades exchanges) without running the
query — safe to call on anything, costs only planning time.

Heuristics note: facts are derived from the plan's text rendering
(the only stable public surface), so node names track the Spark
version; the parser keys on long-lived prefixes (``Exchange``,
``BroadcastExchange``, ``*Join``, ``FileScan``,
``WholeStageCodegen``, ``ArrowEvalPython``...) that have been stable
across Spark 3.x-4.x.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

__all__ = ["plan_facts", "assert_plan"]

_JOIN_RE = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\b"
)


def _node(line: str) -> str:
    """Strip tree-drawing characters and wholestage star markers."""
    s = line.lstrip(" :+-")
    if s.startswith("*(") :  # e.g. "*(3) HashAggregate("
        s = s.split(") ", 1)[1] if ") " in s else s
    return s


def plan_facts(df: DataFrame) -> dict[str, Any]:
    """Counts and scan details of the compiled physical plan:

    - ``shuffle_exchanges`` / ``broadcast_exchanges`` / ``sorts``
    - ``joins``: occurrence count per join strategy
    - ``has_cartesian``: CartesianProduct or BroadcastNestedLoopJoin
      with a non-trivial build side can blow up quadratically
    - ``python_evals``: Arrow/row Python eval nodes in the plan (the
      slow path; 0 for all-JVM queries)
    - ``scans``: one entry per FileScan with ``pushed_filters`` /
      ``partition_filters`` / ``read_schema`` (column pruning)
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    facts: dict[str, Any] = {
        "shuffle_exchanges": 0,
        "broadcast_exchanges": 0,
        "sorts": 0,
        "joins": {},
        "has_cartesian": False,
        "python_evals": 0,
        "scans": [],
        # DataSource-v2 scans (e.g. the `tss` Python DataSource):
        # their file pruning happens inside the source, so the plan
        # string carries no PushedFilters — io/datasource.plan_files
        # is the audit for those; this fact makes the scan VISIBLE
        "datasource_scans": [],
    }
    for raw in lines:
        s = _node(raw)
        if s.startswith("Exchange "):
            facts["shuffle_exchanges"] += 1
        elif s.startswith("BroadcastExchange"):
            facts["broadcast_exchanges"] += 1
        elif s.startswith("Sort "):
            facts["sorts"] += 1
        elif s.startswith(("ArrowEvalPython", "BatchEvalPython",
                           "MapInPandas", "FlatMapGroupsInPandas")):
            facts["python_evals"] += 1
        elif s.startswith("BatchScan"):
            facts["datasource_scans"].append(s[:200])
        m = _JOIN_RE.search(s)
        if m and s.startswith(m.group(1)):
            facts["joins"][m.group(1)] = facts["joins"].get(m.group(1), 0) + 1
            if m.group(1) == "CartesianProduct":
                facts["has_cartesian"] = True
        if s.startswith("FileScan"):
            scan: dict[str, Any] = {"line": s[:200]}
            for key, name in (
                ("PushedFilters", "pushed_filters"),
                ("PartitionFilters", "partition_filters"),
                ("ReadSchema", "read_schema"),
            ):
                mm = re.search(rf"{key}: (\[[^\]]*\]|struct<[^>]*>)", s)
                scan[name] = mm.group(1) if mm else None
            facts["scans"].append(scan)
    return facts


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    forbid_cartesian: bool = True,
    max_python_evals: int | None = 0,
    require_pushed_filters: bool = False,
    require_broadcast_joins: int | None = None,
) -> dict[str, Any]:
    """Raise ``AssertionError`` (message = offending fact + the full
    facts dict) when the compiled plan violates the stated bounds;
    returns the facts on success. Defaults encode the engine's house
    rules: no cartesian products, no Python in the plan.

    - ``max_shuffles``: upper bound on shuffle Exchanges.
    - ``max_python_evals``: bound on Python eval nodes (None = any;
      raise the bound explicitly for intentionally-Arrow operators).
    - ``require_pushed_filters``: every FileScan must carry at least
      one pushed filter (use on filtered scans to catch pushdown
      regressions — an always-true assert on unfiltered reads).
    - ``require_broadcast_joins``: at least N broadcast hash joins
      (dimension joins that silently degrade to SMJ shuffle the big
      side).
    """
    facts = plan_facts(df)

    def fail(msg: str) -> None:
        raise AssertionError(f"plan audit: {msg}; facts={facts}")

    if forbid_cartesian and facts["has_cartesian"]:
        fail("plan contains a CartesianProduct")
    if max_shuffles is not None and facts["shuffle_exchanges"] > max_shuffles:
        fail(
            f"{facts['shuffle_exchanges']} shuffle exchanges "
            f"(max {max_shuffles})"
        )
    if (
        max_python_evals is not None
        and facts["python_evals"] > max_python_evals
    ):
        fail(
            f"{facts['python_evals']} Python eval nodes "
            f"(max {max_python_evals})"
        )
    if require_pushed_filters:
        for scan in facts["scans"]:
            if scan["pushed_filters"] in (None, "[]"):
                fail(f"scan without pushed filters: {scan['line']}")
    if require_broadcast_joins is not None:
        got = facts["joins"].get("BroadcastHashJoin", 0)
        if got < require_broadcast_joins:
            fail(
                f"{got} BroadcastHashJoins "
                f"(required >= {require_broadcast_joins})"
            )
    return facts
