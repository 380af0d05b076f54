"""Repo-wide physical-plan lint over EVERY registered query.

Complements test_plans.py (which pins specific plan shapes): this walks
the full ``queries()`` registry — the exact surface the driver grades —
and rejects plan nodes that are categorically wrong at 100 TB:

- ``BatchEvalPython``: a row-at-a-time Python UDF stage. Banned
  outright — the engine's only Python stages are Arrow-batched
  (``ArrowEvalPython`` pandas UDFs for the parse contract,
  ``MapInPandas`` for multimodal plumbing), which ARE the sanctioned
  fast path and are allowed anywhere downstream queries compose them.
- ``CartesianProduct``: an unbroadcast cross join is a |n|x|m| shuffle;
  every intentional all-pairs op here broadcasts one side
  (BroadcastNestedLoopJoin) and documents why.

A new query that sneaks a Python row loop or a cartesian join into the
registry fails here before it ever reaches the bench.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from logzilla_spark.testdata import ensure_pages

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module", autouse=True)
def _data(spark):
    ensure_pages(SF)


def _registry():
    return sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _registry(), ids=[n for n, _ in _registry()])
def test_query_plan_lint(spark, name, fn):
    plan = _plan(fn(spark, SF))
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan\n{plan}"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: unbroadcast cartesian join in plan\n{plan}"
    )
