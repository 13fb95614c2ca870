"""Structural plan guards over the ENTIRE driver query surface: every
registered query's physical plan must be free of

- ``CartesianProduct`` — an un-broadcast cross join is never intended
  here (the LM-family 1-row total crossJoins broadcast deliberately and
  plan as BroadcastNestedLoopJoin, which is allowed);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any plan is the
  slow path the engine bans (Arrow kernels plan as ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas and are allowed).

This is the ".explain audit" as a regression test: a future edit that
accidentally drops a broadcast hint or introduces a python UDF fails CI
instead of surfacing as a 100x slowdown at scale."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

BANNED = ("CartesianProduct", "BatchEvalPython")


def _names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_plan_has_no_banned_nodes(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in BANNED:
        assert bad not in plan, f"{name}: {bad} in physical plan"
