"""Plan-stability gate (reference analog: PlanStabilitySuite.scala +
tpcds-plan-stability resources): every registered query's physical
plan signature must match tests/plan_goldens.json. A broadcast
flipping to sort-merge, a new shuffle, or a lost pushed filter fails
here with a readable diff instead of surfacing as a silent 100 TB
regression.

After an INTENTIONAL plan change:
    python -m gazelle_plugin_spark.plans.stability
and review the golden diff in git.
"""

from __future__ import annotations

import json

import pytest

from gazelle_plugin_spark.plans import all_queries
from gazelle_plugin_spark.plans.stability import GOLDEN_PATH, plan_signature
from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_goldens_cover_every_query(goldens):
    missing = sorted(set(all_queries()) - set(goldens))
    assert not missing, (
        f"queries without a plan golden: {missing} — run "
        "python -m gazelle_plugin_spark.plans.stability"
    )


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_plan_matches_golden(name, goldens, spark):
    if name not in goldens:
        pytest.skip("covered by test_goldens_cover_every_query")
    actual = plan_signature(all_queries()[name](spark, SF_MED))
    expected = goldens[name]
    if actual != expected:
        diff = {
            k: (expected.get(k), actual.get(k))
            for k in set(expected) | set(actual)
            if expected.get(k) != actual.get(k)
        }
        raise AssertionError(
            f"plan drift for {name} (golden, actual): {diff} — if intentional, "
            "regenerate with python -m gazelle_plugin_spark.plans.stability"
        )
