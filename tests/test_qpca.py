"""QPCA confidence (RuleCounting.scala:298-380) pinned against a pure-Python
replica of the reference's sequential budget loop (order-independent, so the
replica IS the reference semantics)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2
from rdfrules_spark.mining.measures import qpca_confidence


def _qpca_brute(triples, rules):
    """Reference loop replica: iterate distinct predicted pairs, positives
    always count, negatives consume the per-entity budget first."""
    po = defaultdict(set)
    for s, p, o in triples:
        po[p].add((s, o))
    stats = {}
    for p, pairs in po.items():
        subs = defaultdict(set)
        objs = defaultdict(set)
        for s, o in pairs:
            subs[s].add(o)
            objs[o].add(s)
        ns, no = len(subs), len(objs)
        side = "subject" if ns >= no else "object"
        import math

        avg = (
            math.floor(len(pairs) / ns + 0.5) if side == "subject"
            else math.floor(len(pairs) / no + 0.5)
        )
        stats[p] = (side, avg, subs, objs)
    out = {}
    for (p, q, d1) in rules:
        body = {
            ((s, o) if d1 == "f" else (o, s))
            for s2, p2, o2 in triples if p2 == q
            for (s, o) in [(s2, o2)]
        }
        side, avg, subs, objs = stats[p]
        size = 0
        budget = {}
        for (a, b) in sorted(body):
            ent, partner = (a, b) if side == "subject" else (b, a)
            known = subs[ent] if side == "subject" else objs[ent]
            if ent not in budget:
                budget[ent] = len(known)
            if partner in known:
                size += 1
            elif budget[ent] >= avg:
                size += 1
            else:
                budget[ent] += 1
        out[(p, q, d1)] = size
    return out


@pytest.fixture(scope="module")
def kg(spark):
    import random

    random.seed(3)
    triples = set()
    for i in range(400):
        s, o = f"e{i % 60}", f"f{i % 45}"
        triples.add((s, "works", o))
        if i % 3:
            triples.add((s, "likes", o))
        if i % 4:
            triples.add((o, "near", f"e{(i + 1) % 60}"))
    for _ in range(300):
        triples.add((f"e{random.randrange(60)}", "likes", f"f{random.randrange(45)}"))
    return sorted(triples)


def test_qpca_matches_brute(spark, kg):
    t = spark.createDataFrame(kg, "s string, p string, o string")
    params = MiningParams(min_head_size=20, min_support=1,
                          min_head_coverage=0.01)
    rules = mine_l2(t, head_sizes(t, params), params)
    got = {
        (r.p, r.q, r.d1): (r.qpca_body_size, r.qpca_confidence)
        for r in qpca_confidence(rules, t).collect()
    }
    assert got
    want = _qpca_brute(kg, list(got))
    for key, (size, conf) in got.items():
        assert size == want[key], key
        assert conf == pytest.approx(
            0.0 if size == 0 else
            next(r for r in rules.collect()
                 if (r.p, r.q, r.d1) == key).support / size
        )
