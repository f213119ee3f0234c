"""Module-level cache for STATIC Column expression trees.

Building a large literal expression through the pyspark Column API
costs one py4j round-trip per Column call (hundreds per tree), and
``F.expr`` over a big SQL text costs one JVM parse per invocation —
either way the IDENTICAL tree is rebuilt on every plan construction
(measured r12→r13: ~1.8 s of er3+er4's and ~0.8 s of d3's per-call
build time, pure driver work under guide §5). A Column is an
immutable wrapper over an unresolved JVM expression tree, so a tree
that references nothing caller-specific (literal params arrays,
literal variant maps, lane-key SQL keyed only by static column
names) can be built once per JVM and reused by every plan.

Cache entries are keyed on the py4j gateway identity as well: if the
JVM gateway is ever torn down and relaunched, stale JavaObject
handles must never leak into the new JVM.
"""

from __future__ import annotations

from typing import Callable

from pyspark import SparkContext
from pyspark.sql import Column

_CACHE: dict[tuple, Column] = {}


def cached_column(key: tuple, builder: Callable[[], Column]) -> Column:
    """Return the memoized Column for ``key``, building it once per
    (gateway, key). ``builder`` must construct a tree with no free
    references to caller state beyond what ``key`` encodes."""
    gw = SparkContext._gateway
    full = (id(gw) if gw is not None else None, *key)
    col = _CACHE.get(full)
    if col is None:
        if len(_CACHE) > 512:  # keys are static; this never triggers
            _CACHE.clear()  # pragma: no cover
        col = builder()
        _CACHE[full] = col
    return col
