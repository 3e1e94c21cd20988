"""Brute-force in-memory rule miner — the mining-correctness oracle.

Enumerates the same closed-rule space as mining/amie.py by direct set
arithmetic over a list of (s, p, o) triples. Quadratic/cubic; only for
test-scale KGs (<= ~20k triples). Independent implementation: no DataFrames,
no shared code with the Spark miner beyond the semantics contract.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations


def mine_brute(
    triples: list[tuple],
    min_head_size: int = 100,
    min_support: int = 1,
    min_hc: float = 0.01,
    max_len: int = 3,
) -> dict[tuple, dict]:
    """-> {(p, shape, q, d1, r, d2): {support, head_size, hc,
          body_size, pca_body_size}}"""
    triples = sorted(set(triples))
    by_p = defaultdict(set)
    for s, p, o in triples:
        by_p[p].add((s, o))
    heads = {p: pairs for p, pairs in by_p.items() if len(pairs) >= min_head_size}

    # direction-tagged pair sets per (q, d)
    rel = {}
    for q, pairs in by_p.items():
        rel[(q, "f")] = pairs
        rel[(q, "i")] = {(o, s) for s, o in pairs}

    # adjacency for the 3-var shape: x -> {c} per (q, d)
    adj = defaultdict(lambda: defaultdict(set))
    for (q, d), pairs in rel.items():
        for x, c in pairs:
            adj[(q, d)][x].add(c)

    subs = defaultdict(set)
    objs = defaultdict(set)
    for s, p, o in triples:
        subs[p].add(s)
        objs[p].add(o)

    def pca_set(p):
        ns, no = len(subs[p]), len(objs[p])
        return ("subject", subs[p]) if ns >= no else ("object", objs[p])

    rules = {}

    def emit(p, shape, q, d1, r, d2, support, body_pairs_set):
        hs = len(heads[p])
        hc = support / hs
        if support < min_support or hc < min_hc:
            return
        side, entities = pca_set(p)
        idx = 0 if side == "subject" else 1
        pca_bs = sum(1 for pr in body_pairs_set if pr[idx] in entities)
        rules[(p, shape, q, d1, r, d2)] = {
            "support": support,
            "head_size": hs,
            "head_coverage": hc,
            "body_size": len(body_pairs_set),
            "pca_body_size": pca_bs,
        }

    atoms = sorted(rel)  # [(q, d)]
    for p, hp in heads.items():
        # L2
        for q, d in atoms:
            if q == p and d == "f":
                continue
            body = rel[(q, d)]
            support = len(hp & body)
            emit(p, "l2", q, d, None, None, support, body)
        if max_len < 3:
            continue
        # L3 2-var: unordered distinct atom pairs
        valid = [a for a in atoms if a != (p, "f")]
        for a1, a2 in combinations(valid, 2):
            body = rel[a1] & rel[a2]
            support = len(hp & body)
            emit(p, "l3v2", a1[0], a1[1], a2[0], a2[1], support, body)
        # L3 3-var
        for q, d1 in atoms:
            a1 = adj[(q, d1)]
            for r, d2 in atoms:
                a2 = adj[(r, d2)]
                support = sum(
                    1 for (a, b_) in hp if a1.get(a, set()) & a2.get(b_, set())
                )
                body = {
                    (a, b_)
                    for a in a1
                    for b_ in a2
                    if a1[a] & a2[b_]
                }
                emit(p, "l3v3", q, d1, r, d2, support, body)
    return rules
