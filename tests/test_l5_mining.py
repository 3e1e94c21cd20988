"""maxRuleLength = 5 (beyond the reference's own test coverage, which stops
at maxLen 4 — Amie.scala:184-231 supports any length).

Evidence at L5 where no reference golden exists:
  * every mined 4-atom-body rule's support is re-derived EXACTLY by an
    independent pure-Python existential-CQ evaluator (backtracking join,
    shares no code with the Spark miner). no-duplicate-predicates makes
    the distinct-triple law vacuous, so plain CQ semantics is the correct
    oracle;
  * prefix consistency: the maxLen-4 run's rules are a subset of the
    maxLen-5 run's with identical supports (support is per-rule, the
    length budget only widens reachability).
Completeness at L <= 4 is pinned separately by the yago goldens
(tests/test_l4_mining.py: 30/98 exact).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict

from pyspark.sql import functions as F

from rdfrules_spark.corpus import synth_kg
from rdfrules_spark.mining.amie import MiningParams
from rdfrules_spark.mining.shapes import mine_upto


def _sat(atoms, bind, rel):
    if not atoms:
        return True
    atoms = sorted(atoms, key=lambda t: -((t[0] in bind) + (t[1] in bind)))
    (u, v, q, d), rest = atoms[0], atoms[1:]
    pairs = rel[(q, d)]
    if u in bind and v in bind:
        return (bind[u], bind[v]) in pairs and _sat(rest, bind, rel)
    if u in bind:
        return any(
            x == bind[u] and _sat(rest, {**bind, v: y}, rel)
            for (x, y) in pairs
        )
    if v in bind:
        return any(
            y == bind[v] and _sat(rest, {**bind, u: x}, rel)
            for (x, y) in pairs
        )
    return any(_sat(rest, {**bind, u: x, v: y}, rel) for (x, y) in pairs)


def test_l5_supports_match_cq_oracle(spark):
    t = synth_kg(
        spark, 1000, n_entities=140, n_predicates=6
    ).distinct().cache()
    rel = defaultdict(set)
    for s, p, o in [(r.s, r.p, r.o) for r in t.collect()]:
        rel[(p, "f")].add((s, o))
        rel[(p, "i")].add((o, s))
    params = MiningParams(
        min_head_size=30, min_support=3, min_head_coverage=0.1,
        max_rule_length=5, with_duplicate_predicates=False,
    )
    r5 = mine_upto(t, params).cache()
    l5 = r5.where(F.size(F.split("body", ";")) == 4).collect()
    assert len(l5) > 20, "the fixture must exercise genuine L5 rules"
    for r in l5:
        atoms = []
        for a in r["body"].split(";"):
            vars_, q, d = a.split(" ")
            atoms.append((vars_[0], vars_[1], q, d))
        got = sum(
            1 for (a, b) in rel[(r["p"], "f")]
            if _sat(atoms, {"a": a, "b": b}, rel)
        )
        assert got == r["support"], (r["p"], r["body"], r["support"], got)

    r4 = mine_upto(t, dataclasses.replace(params, max_rule_length=4))
    k5 = {(x["p"], x["body"], x["support"]) for x in r5.collect()}
    k4 = {(x["p"], x["body"], x["support"]) for x in r4.collect()}
    assert k4 <= k5
    r5.unpersist()
    t.unpersist()
