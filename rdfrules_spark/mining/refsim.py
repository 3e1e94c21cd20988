"""Faithful pure-Python simulator of the reference's rule GENERATION ORDER.

Diagnostic oracle (not a production miner): ports the exact candidate
generation machinery of core:algorithm/amie/ so deviations between the
declarative Spark miner and the reference BFS can be localized:

  * FreshAtomGenerator.getPossibleFreshAtoms (FreshAtomGenerator.scala:96-166)
    — non-decreasing var-pair ordering, dangling-variable naming, the
    subjectIsLower/objectIsLower closability check, maxPossibleDanglings
    and maxDanglingVariables (= floor(2*maxLen/3), AmieSettings.scala:24),
    last-atom closing restrictions;
  * isValidFreshPredicate (FreshAtomGenerator.scala:52-88) — same-var-pair
    predicate ordering (maxPredicates), atom duplicity / unique-predicate
    checks;
  * RuleExpansion.expand (RuleExpansion.scala:22-36) — dangling bookkeeping;
  * Amie.executeStage (Amie.scala:184-231) — level-synchronous BFS with a
    per-stage unique set; rule equality is variable-renaming-invariant with
    head variables pinned (RuleContent.scala:29-38).

Support counting is the standard existential count (one per head pair with
a joint binding of body+fresh atom), which matches RuleRefinement's
projection counting semantics for non-injective mapping.

Variables are ints: 0='a' (head subject), 1='b' (head object), 2='c', ...
Atoms are (s, p, o) with s/o ints (variables); constants are not simulated
in this var-only version.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class SimParams:
    min_head_size: int = 100
    min_support: int = 1
    min_head_coverage: float = 0.01
    max_rule_length: int = 3
    with_duplicate_predicates: bool = True
    only_predicates: set | None = None
    without_predicates: set | None = None

    @property
    def max_dangling_variables(self) -> int:
        return (self.max_rule_length * 2) // 3

    def is_valid_predicate(self, p) -> bool:
        if self.only_predicates is not None and p not in self.only_predicates:
            return False
        if self.without_predicates is not None and p in self.without_predicates:
            return False
        return True


@dataclass
class Rule:
    head: tuple  # (0, p, 1)
    body: tuple  # prepend order: body[0] is the newest atom
    danglings: tuple  # var ids occurring exactly once (incl. head vars)
    max_variable: int
    support: int = 0
    head_size: int = 0

    @property
    def rule_length(self) -> int:
        return len(self.body) + 1

    @property
    def is_closed(self) -> bool:
        return not self.danglings

    def canon(self) -> tuple:
        """Variable-renaming-invariant identity with head vars pinned
        (RuleContent.checkRuleContentsEquality): canonical relabeling of
        vars >= 2 chosen to minimize the sorted body."""
        from itertools import permutations

        extras = sorted({x for a in self.body for x in (a[0], a[2]) if x >= 2})
        if not extras:
            return (self.head, tuple(sorted(self.body)))
        best = None
        for perm in permutations(range(2, 2 + len(extras))):
            m = dict(zip(extras, perm))
            relabeled = tuple(sorted(
                (m.get(s, s), p, m.get(o, o)) for s, p, o in self.body
            ))
            if best is None or relabeled < best:
                best = relabeled
        return (self.head, best)


class Index:
    def __init__(self, triples):
        self.po = defaultdict(lambda: defaultdict(set))  # p -> s -> {o}
        self.ps = defaultdict(lambda: defaultdict(set))  # p -> o -> {s}
        self.psize = defaultdict(int)
        self.sp = defaultdict(set)       # subject value -> {p}
        self.op = defaultdict(set)       # object value -> {p}
        self.sop = defaultdict(set)      # (s, o) -> {p}
        for s, p, o in triples:
            if o not in self.po[p][s]:
                self.po[p][s].add(o)
                self.ps[p][o].add(s)
                self.psize[p] += 1
                self.sp[s].add(p)
                self.op[o].add(p)
                self.sop[(s, o)].add(p)

    def bindings(self, atoms, binding):
        """Generator of full bindings (dicts) for the atom list."""
        if not atoms:
            yield binding
            return

        def score(a):
            s, p, o = a
            sb, ob = s in binding, o in binding
            return 0 if (sb and ob) else (1 if (sb or ob) else 2)

        atoms = sorted(atoms, key=score)
        s, p, o = atoms[0]
        rest = atoms[1:]
        sb, ob = binding.get(s), binding.get(o)
        if sb is not None and ob is not None:
            if ob in self.po[p].get(sb, ()):
                yield from self.bindings(rest, binding)
        elif sb is not None:
            for oo in self.po[p].get(sb, ()):
                b2 = dict(binding)
                b2[o] = oo
                yield from self.bindings(rest, b2)
        elif ob is not None:
            for ss in self.ps[p].get(ob, ()):
                b2 = dict(binding)
                b2[s] = ss
                yield from self.bindings(rest, b2)
        else:
            for ss, oos in self.po[p].items():
                for oo in oos:
                    b2 = dict(binding)
                    b2[s] = ss
                    b2[o] = oo
                    yield from self.bindings(rest, b2)

    def exists(self, atoms, binding) -> bool:
        """Backtracking existence check: atoms is a list of (s,p,o) var
        atoms; binding maps var -> constant."""
        if not atoms:
            return True
        # pick the most-bound atom first
        def score(a):
            s, p, o = a
            sb, ob = s in binding, o in binding
            if sb and ob:
                return 0
            if sb or ob:
                return 1
            return 2

        atoms = sorted(atoms, key=score)
        s, p, o = atoms[0]
        rest = atoms[1:]
        sb, ob = binding.get(s), binding.get(o)
        if sb is not None and ob is not None:
            return ob in self.po[p].get(sb, ()) and self.exists(rest, binding)
        if sb is not None:
            for oo in self.po[p].get(sb, ()):
                b2 = dict(binding)
                b2[o] = oo
                if self.exists(rest, b2):
                    return True
            return False
        if ob is not None:
            for ss in self.ps[p].get(ob, ()):
                b2 = dict(binding)
                b2[s] = ss
                if self.exists(rest, b2):
                    return True
            return False
        for ss, oos in self.po[p].items():
            for oo in oos:
                b2 = dict(binding)
                b2[s] = ss
                b2[o] = oo
                if self.exists(rest, b2):
                    return True
        return False


def _possible_fresh_atoms(rule: Rule, params: SimParams):
    """Port of getPossibleFreshAtoms (var-only, constants Nowhere)."""
    last = rule.body[0] if rule.body else rule.head
    x, y = min(last[0], last[2]), max(last[0], last[2])
    dangling = rule.max_variable + 1
    max_possible_danglings = (params.max_rule_length - rule.rule_length - 1) * 2
    is_last = rule.rule_length + 1 >= params.max_rule_length

    # at most ONE extra (non-head) variable may be dangling at a time: a
    # fresh atom cannot open a new dangling while an extra var is still
    # unclosed. This is pinned EMPIRICALLY by the reference goldens
    # (AmieSpec: maxLen2=30, maxLen3 67/124, maxLen4=98 — the 98 excludes
    # exactly the two-extra-variable path shape ac-bd-cd, which the
    # literal reading of FreshAtomGenerator.scala:110-122 would admit).
    has_extra_dangling = any(d >= 2 for d in rule.danglings)

    def check_right_danglings(s, o):
        if rule.is_closed:
            return True
        if (s == dangling or o == dangling) and has_extra_dangling:
            return False
        s_low, o_low, rem = True, True, 0
        for d in rule.danglings:
            s_low = s_low and s <= d
            o_low = o_low and o <= d
            if d != s and d != o:
                rem += 1
        additional = 1 if (s == dangling or o == dangling) else 0
        return (
            rem <= max_possible_danglings
            and (s_low or o_low)
            and rem + additional <= params.max_dangling_variables
        )

    def check_last_atom(s, o):
        if not is_last:
            return True
        # constants Nowhere: the closing atom may not open a new dangling
        return s != dangling and o != dangling

    for i in range(x, dangling):
        for j in range(x + 1, dangling + 1):
            if i < j and ((i == x and j >= y) or i > x):
                for s, o in ((i, j), (j, i)):
                    if check_right_danglings(s, o) and check_last_atom(s, o):
                        yield (s, o)


def _is_valid_fresh_predicate(rule: Rule, fresh, p, params: SimParams) -> bool:
    """Port of isValidFreshPredicate."""
    if not params.is_valid_predicate(p):
        return False
    # same-var-set predicate ordering (maxPredicates)
    fvars = frozenset(fresh)
    mx = None
    for s, q, o in rule.body:
        if frozenset((s, o)) == fvars:
            mx = q if mx is None else max(mx, q)
    if mx is not None and not (p >= mx):
        return False
    if params.with_duplicate_predicates:
        # atom duplicity: same (subject position, predicate, object)
        for s, q, o in rule.body:
            if q == p and s == fresh[0] and o == fresh[1]:
                return False
        if rule.head == (fresh[0], p, fresh[1]):
            return False
    else:
        used = {q for _, q, _ in rule.body} | {rule.head[1]}
        if p in used:
            return False
    return True


def _expand(rule: Rule, atom, support: int) -> Rule:
    s, _, o = atom
    dangling = rule.max_variable + 1
    head_dangling = [dangling] if (s == dangling or o == dangling) else []
    second = [d for d in rule.danglings if d != s and d != o]
    return Rule(
        head=rule.head,
        body=(atom,) + rule.body,
        danglings=tuple(head_dangling + second),
        max_variable=max(rule.max_variable, s, o),
        support=support,
        head_size=rule.head_size,
    )


def mine_reference_order(triples, params: SimParams | None = None):
    """Run the staged BFS exactly as Amie.executeStage; returns the list of
    closed rules (as Rule objects, deduped by renaming-invariant canon)."""
    params = params or SimParams()
    triples = [
        t for t in triples
        if params.is_valid_predicate(t[1])
    ]
    idx = Index(triples)
    # heads (HeadsFetcher: var-only logical heads)
    queue = []
    for p, size in idx.psize.items():
        if size >= params.min_head_size and size >= max(
            params.min_support, params.min_head_coverage * size
        ):
            queue.append(Rule(
                head=(0, p, 1), body=(), danglings=(1, 0),
                max_variable=1, support=size, head_size=size,
            ))
    closed: dict = {}
    stage = 1
    while stage < params.max_rule_length and queue:
        next_set: dict = {}
        for rule in queue:
            min_sup = max(
                params.min_support,
                params.min_head_coverage * rule.head_size,
            )
            head_pairs = [
                (s, o)
                for s, os_ in idx.po[rule.head[1]].items()
                for o in os_
            ]
            body = list(rule.body)
            for fresh in _possible_fresh_atoms(rule, params):
                all_set = {
                    p for p in idx.psize
                    if _is_valid_fresh_predicate(rule, fresh, p, params)
                }
                if not all_set:
                    continue
                u, v = fresh
                counts = defaultdict(int)
                for (a, b) in head_pairs:
                    found = set()
                    for bd in idx.bindings(body, {0: a, 1: b}):
                        ub, vb = bd.get(u), bd.get(v)
                        if ub is not None and vb is not None:
                            found |= idx.sop.get((ub, vb), set()) & all_set
                        elif ub is not None:
                            found |= idx.sp.get(ub, set()) & all_set
                        elif vb is not None:
                            found |= idx.op.get(vb, set()) & all_set
                        if len(found) == len(all_set):
                            break
                    for p in found:
                        counts[p] += 1
                for p, support in counts.items():
                    if support >= min_sup:
                        atom = (u, p, v)
                        new = _expand(rule, atom, support)
                        key = (new.is_closed, new.canon())
                        if key not in next_set:
                            next_set[key] = new
                            if new.is_closed:
                                closed[new.canon()] = new
        queue = list(next_set.values())
        stage += 1
    return list(closed.values())
