"""Session-scoped memo for driver-built Column expression trees.

Column-API construction costs one py4j round trip per operator
(guide §7.3 "planning time itself becomes the bottleneck"): a
normalization rule's expression is ~10-60 round trips, and a domain
compile rebuilds every rule's tree on every call although the trees
are pure functions of (column NAMES + literal params). This memo
returns the previously built JVM expression tree for an identical
key — safe because:

- only trees built from *string column names* are memoized (unbound
  ``F.col(name)`` resolves by name against whichever plan uses it;
  plan-bound ``df["x"]`` attributes are never cached — callers must
  not put Columns in keys);
- Catalyst treats expression trees as immutable (every plan that
  embeds one re-analyzes it), so sharing one tree across plans is
  exactly as safe as sharing the module-level ladder memo r16 shipped
  (functions/datetime_iso.py);
- entries are invalidated wholesale when the active SparkContext
  changes (weakref identity), so a JVM/gateway restart can never
  serve a dead py4j reference.

This is driver METADATA only — no data, no results, rebuilt from the
key on first use per session.
"""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark.sql import Column

_CACHE: dict[tuple, Column] = {}
_CACHE_MAX = 512
_CTX: "weakref.ref | None" = None


def memo_column(key: tuple, build: Callable[[], Column]) -> Column:
    """Return the memoized Column for ``key``, building it once per
    SparkContext. ``key`` must fully determine the expression tree
    and contain only hashable driver values (no Columns)."""
    global _CTX
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return build()
    if _CTX is None or _CTX() is not sc:
        _CACHE.clear()
        _CTX = weakref.ref(sc)
    got = _CACHE.get(key)
    if got is None:
        got = build()
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.clear()
        _CACHE[key] = got
    return got
