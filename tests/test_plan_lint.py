"""Registry-wide physical-plan lint: structural anti-patterns that are
individually asserted for a handful of queries (tests/test_physical_plans.py)
are enforced here for EVERY registry entry, so a future query can't
reintroduce them unnoticed.

- ``CartesianProduct``: an unpartitionable O(N·M) row-by-row loop — never
  acceptable; intentional small-side cross joins must go through
  ``F.broadcast`` (→ BroadcastNestedLoopJoin, which is bounded by the
  broadcast side and appears only where a side is provably tiny).
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan — the slow
  path this repo bans; Python stages must be Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are fine).

Building each entry's DataFrame at sf0.001 (some registry functions run
bounded driver-side jobs — kmeans fit, BPE rounds, report counts — so
this sweep costs ~a minute; the plan inspection itself is free).
"""

from __future__ import annotations

import pytest

from etl_project_gcp_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def registry():
    return Q.queries()


def test_no_cartesian_product_or_rowwise_python_anywhere(spark, registry):
    bad: dict[str, list[str]] = {}
    for name, fn in registry.items():
        plan = _plan(fn(spark, SF))
        smells = [
            s
            for s in ("CartesianProduct", "BatchEvalPython")
            if s in plan
        ]
        if smells:
            bad[name] = smells
    assert not bad, f"plan anti-patterns found: {bad}"
