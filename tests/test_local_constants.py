"""Gate-boundary parity: the driver-local (pandas) constants path must be
row-identical to the distributed Spark path on the same input.

The local path (mining/local_constants.py) is also pinned by the golden /
refexec suites (which now run through it at their small inputs); this test
is the direct cross-path check: mine_constants and confidences_constants
executed BOTH ways — local_threshold=0 forces distributed — on one KG,
for both specs and both injectivity modes.
"""

from __future__ import annotations

import random

import pytest

from rdfrules_spark.mining.amie import MiningParams
from rdfrules_spark.mining.constants import mine_constants
from rdfrules_spark.mining.measures_constants import confidences_constants


@pytest.fixture(scope="module")
def kg(spark):
    rng = random.Random(7)
    ents = [f"e{i}" for i in range(40)]
    preds = [f"p{i}" for i in range(6)]
    rows = {
        (rng.choice(ents), rng.choice(preds), rng.choice(ents))
        for _ in range(700)
    }
    return spark.createDataFrame(
        sorted(rows), "s string, p string, o string"
    ).cache()


def _rule_key(r):
    return (r["head"], tuple(r["atoms"]), r["shape"])


def _mine_both(kg, constants, quasi_binding, injective):
    params = MiningParams(min_head_size=5, min_support=2,
                          min_head_coverage=0.05, injective=injective)
    loc = mine_constants(kg, params, constants=constants,
                         quasi_binding=quasi_binding)
    dist = mine_constants(kg, params, constants=constants,
                          quasi_binding=quasi_binding, local_threshold=0)
    return loc, dist


@pytest.mark.parametrize("constants,qb,inj", [
    ("anywhere", False, False),
    ("anywhere", True, True),
    ("object", True, True),
    ("lcs", True, False),
])
def test_miner_local_equals_distributed(spark, kg, constants, qb, inj):
    loc, dist = _mine_both(kg, constants, qb, inj)
    lrows = {_rule_key(r): (r["support"], r["head_size"])
             for r in loc.collect()}
    drows = {_rule_key(r): (r["support"], r["head_size"])
             for r in dist.collect()}
    assert lrows, "empty ruleset would make the test vacuous"
    assert lrows == drows


@pytest.mark.parametrize("inj", [False, True])
def test_confidences_local_equals_distributed(spark, kg, inj):
    rules = mine_constants(
        kg,
        MiningParams(min_head_size=5, min_support=2,
                     min_head_coverage=0.05, injective=inj),
        constants="anywhere", quasi_binding=True,
    ).cache()

    def collect(df):
        out = {}
        for r in df.collect():
            out[r["rid"]] = (
                r["body_size"], r["pca_body_size"],
                None if r["cwa_confidence"] is None
                else round(r["cwa_confidence"], 9),
                None if r["pca_confidence"] is None
                else round(r["pca_confidence"], 9),
            )
        return out

    loc = collect(confidences_constants(rules, kg, injective=inj))
    dist = collect(
        confidences_constants(rules, kg, injective=inj, local_threshold=0)
    )
    assert loc, "empty confidence set would make the test vacuous"
    assert set(loc) == set(dist)
    diffs = {k: (loc[k], dist[k]) for k in loc if loc[k] != dist[k]}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {list(diffs.items())[:3]}"
