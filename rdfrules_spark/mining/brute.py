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

    def vvt(a, b, q, d):  # the KG triple a (q,d) atom binds for pair (a, b)
        return (a, q, b) if d == "f" else (b, q, a)

    atoms = sorted(rel)  # [(q, d)]
    # distinct-triple SUPPORT (body sizes stay plain: the reference allows
    # duplicate triple bindings for bodySize counting — VariableMap.scala:12)
    for p, hp in heads.items():
        # L2
        for q, d in atoms:
            if q == p and d == "f":
                continue
            body = rel[(q, d)]
            support = sum(
                1 for (a, b_) in hp & body if vvt(a, b_, q, d) != (a, p, b_)
            )
            emit(p, "l2", q, d, None, None, support, body)
        if max_len < 3:
            continue
        # L3 2-var: unordered distinct atom pairs
        valid = [a for a in atoms if a != (p, "f")]
        for a1, a2 in combinations(valid, 2):
            body = rel[a1] & rel[a2]
            support = sum(
                1 for (a, b_) in hp & body
                if len({vvt(a, b_, *a1), vvt(a, b_, *a2), (a, p, b_)}) == 3
            )
            emit(p, "l3v2", a1[0], a1[1], a2[0], a2[1], support, body)
        # L3 3-var
        for q, d1 in atoms:
            a1 = adj[(q, d1)]
            for r, d2 in atoms:
                a2 = adj[(r, d2)]
                support = sum(
                    1 for (a, b_) in hp
                    if any(
                        len({vvt(a, c, q, d1), vvt(b_, c, r, d2),
                             (a, p, b_)}) == 3
                        for c in a1.get(a, set()) & a2.get(b_, set())
                    )
                )
                body = {
                    (a, b_)
                    for a in a1
                    for b_ in a2
                    if a1[a] & a2[b_]
                }
                emit(p, "l3v3", q, d1, r, d2, support, body)
    return rules


# --------------------------------------------------------------------------
# Constants (instantiated-atom) mining oracle — reference semantics:
# HeadsFetcher.scala:24-92 (instantiated heads keep headSize = |p|),
# RuleRefinement instantiation of the dangling variable, closed = every
# VARIABLE appears >= 2x, atoms within a rule pairwise distinct and != head.
# --------------------------------------------------------------------------


def _lower_side(subs_p: set, objs_p: set) -> str:
    # TripleIndex.scala:155-159: ns >= no -> Object else Subject
    return "o" if len(subs_p) >= len(objs_p) else "s"


def _term_str(x) -> str:
    return f"C={x[1]}" if isinstance(x, tuple) else x


def _atom_str(a) -> str:
    """Canonical atom string — identical to mining/constants.py encoding."""
    return f"{_term_str(a[0])}|{a[1]}|{_term_str(a[2])}"


def mine_brute_constants(
    triples: list[tuple],
    min_head_size: int = 100,
    min_support: int = 1,
    min_hc: float = 0.01,
    max_len: int = 3,
    constants: str = "anywhere",   # anywhere | subject | object | lcs | nowhere
    with_dup: bool = True,
    constants_for_predicates: dict | None = None,
) -> dict:
    """-> {(head, frozenset(body)): support}; head/atom terms are '?a'/'?b'/
    '?c' or ('C', value)."""
    triples = sorted(set(triples))
    by_p = defaultdict(set)
    by_subj = defaultdict(list)   # ent -> [(q, o)]
    by_obj = defaultdict(list)    # ent -> [(q, s)]
    subs = defaultdict(set)
    objs = defaultdict(set)
    for s, p, o in triples:
        by_p[p].add((s, o))
        by_subj[s].append((p, o))
        by_obj[o].append((p, s))
        subs[p].add(s)
        objs[p].add(o)
    heads = {p: prs for p, prs in by_p.items() if len(prs) >= min_head_size}

    lside = {p: _lower_side(subs[p], objs[p]) for p in by_p}

    def const_ok(pred, pos):  # pos: position of the CONSTANT in the atom
        if constants_for_predicates is not None and pred in constants_for_predicates:
            cp = constants_for_predicates[pred]
            if cp == "both":
                return True
            if cp == "lcs":
                return pos == lside[pred]
            return (cp == "subject") == (pos == "s")
        if constants == "anywhere":
            return True
        if constants == "nowhere":
            return False
        if constants == "subject":
            return pos == "s"
        if constants == "object":
            return pos == "o"
        return pos == lside[pred]  # lcs

    rel = {}
    adj = defaultdict(lambda: defaultdict(set))
    for q, pairs in by_p.items():
        rel[(q, "f")] = pairs
        rel[(q, "i")] = {(o, s) for s, o in pairs}
    for (q, d), pairs in rel.items():
        for x, c in pairs:
            adj[(q, d)][x].add(c)

    def vv(x, y, q, d):  # var-var atom
        return (x, q, y) if d == "f" else (y, q, x)

    def vvt(a, b, q, d):  # the KG triple a (q,d) atom binds for pair (a, b)
        return (a, q, b) if d == "f" else (b, q, a)

    def catoms(ent, var):
        """All (instantiated atom, bound KG triple) pairs binding `var` to
        facts of `ent`. The triple is tracked for the distinct-triple
        support semantics (see constants.py module docstring)."""
        out = []
        for q, o in by_subj[ent]:
            if const_ok(q, "o"):
                out.append(((var, q, ("C", o)), (ent, q, o)))
        for q, s in by_obj[ent]:
            if const_ok(q, "s"):
                out.append(((("C", s), q, var), (s, q, ent)))
        return out

    def preds_of(atoms):
        return [a[1] for a in atoms]

    rules = {}

    def emit(p, head, body, support, head_size):
        if support < max(min_support, min_hc * head_size):
            return
        if not with_dup:
            ps = preds_of(body) + [p]
            if len(set(ps)) != len(ps):
                return
        rules[(head, frozenset(body))] = support

    atoms_vv = sorted(rel)
    for p, hp in heads.items():
        hs = len(hp)
        thr = max(min_support, min_hc * hs)
        head0 = ("?a", p, "?b")
        # ---- H0 shapes ----  (distinct-triple: no atom binds the head
        # triple or another atom's triple — see constants.py docstring)
        for q, d in atoms_vv:
            if (q, d) == (p, "f"):
                continue
            body = rel[(q, d)]
            sup = sum(
                1 for (a, b) in hp & body
                if vvt(a, b, q, d) != (a, p, b)
            )
            emit(p, head0, [vv("?a", "?b", q, d)], sup, hs)
        if max_len >= 3:
            valid = [a for a in atoms_vv if a != (p, "f")]
            for a1, a2 in combinations(valid, 2):
                sup = sum(
                    1 for (a, b) in hp & rel[a1] & rel[a2]
                    if len({vvt(a, b, *a1), vvt(a, b, *a2), (a, p, b)}) == 3
                )
                emit(p, head0,
                     [vv("?a", "?b", *a1), vv("?a", "?b", *a2)], sup, hs)
            for q, d1 in atoms_vv:
                a1m = adj[(q, d1)]
                for r, d2 in atoms_vv:
                    a2m = adj[(r, d2)]
                    sup = sum(
                        1 for (a, b) in hp
                        if any(
                            len({vvt(a, c, q, d1), vvt(b, c, r, d2),
                                 (a, p, b)}) == 3
                            for c in a1m.get(a, set()) & a2m.get(b, set())
                        )
                    )
                    emit(p, head0,
                         [vv("?a", "?c", q, d1), vv("?b", "?c", r, d2)],
                         sup, hs)
            # S4: closed VV + instantiated atom on a or b
            s4 = defaultdict(set)
            for q, d in valid:
                for (a, b) in hp & rel[(q, d)]:
                    ht, vt = (a, p, b), vvt(a, b, q, d)
                    if vt == ht:
                        continue
                    for var, ent in (("?a", a), ("?b", b)):
                        for ca, ct in catoms(ent, var):
                            if ct != ht and ct != vt:
                                s4[(vv("?a", "?b", q, d), ca)].add((a, b))
            for (vatom, catom), prs in s4.items():
                emit(p, head0, [vatom, catom], len(prs), hs)
            # S5: instantiated on a + instantiated on b
            s5 = defaultdict(set)
            for (a, b) in hp:
                ht = (a, p, b)
                for ca, cta in catoms(a, "?a"):
                    if cta == ht:
                        continue
                    for cb, ctb in catoms(b, "?b"):
                        if ctb != ht and ctb != cta:
                            s5[(ca, cb)].add((a, b))
            for (ca, cb), prs in s5.items():
                emit(p, head0, [ca, cb], len(prs), hs)
        # ---- instantiated heads ----
        for head_var, fixed_pos in (("?b", "s"), ("?a", "o")):
            if not const_ok(p, fixed_pos):
                continue
            # group head triples by the fixed constant
            grouped = defaultdict(set)
            for s, o in hp:
                if fixed_pos == "s":
                    grouped[s].add(o)     # head (C p ?b), free var = object
                else:
                    grouped[o].add(s)     # head (?a p C), free var = subject
            for A, frees in grouped.items():
                head = (("C", A), p, head_var) if fixed_pos == "s" else (
                    head_var, p, ("C", A))

                def head_t(e):
                    return (A, p, e) if fixed_pos == "s" else (e, p, A)

                # L2: one instantiated atom on the free var
                s6 = defaultdict(set)
                for e in frees:
                    for ca, ct in catoms(e, head_var):
                        if ca == head or ct == head_t(e):
                            continue
                        s6[ca].add(e)
                for ca, es in s6.items():
                    emit(p, head, [ca], len(es), hs)
                if max_len < 3:
                    continue
                # S7: two VV atoms over (free, c)
                for a1, a2 in combinations(atoms_vv, 2):
                    m1, m2 = adj[a1], adj[a2]
                    es = {
                        e for e in frees
                        if any(
                            len({vvt(e, c, *a1), vvt(e, c, *a2),
                                 head_t(e)}) == 3
                            for c in m1.get(e, set()) & m2.get(e, set())
                        )
                    }
                    emit(p, head,
                         [vv(head_var, "?c", *a1), vv(head_var, "?c", *a2)],
                         len(es), hs)
                # S8: VV(free, c) + instantiated atom on c
                s8 = defaultdict(set)
                for e in frees:
                    ht = head_t(e)
                    for q, d in atoms_vv:
                        for c in adj[(q, d)].get(e, set()):
                            vt = vvt(e, c, q, d)
                            if vt == ht:
                                continue
                            for ca, ct in catoms(c, "?c"):
                                if ct != ht and ct != vt:
                                    s8[(vv(head_var, "?c", q, d), ca)].add(e)
                for (vatom, catom), es in s8.items():
                    emit(p, head, [vatom, catom], len(es), hs)
                # S9: two instantiated atoms on the free var
                s9 = defaultdict(set)
                for e in frees:
                    ht = head_t(e)
                    cas = {
                        ca: ct for ca, ct in catoms(e, head_var)
                        if ca != head and ct != ht
                    }
                    for c1, c2 in combinations(sorted(cas, key=_atom_str), 2):
                        if cas[c1] != cas[c2]:
                            s9[(c1, c2)].add(e)
                for (c1, c2), es in s9.items():
                    emit(p, head, [c1, c2], len(es), hs)
    return rules
