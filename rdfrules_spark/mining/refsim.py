"""Faithful pure-Python simulator of the reference's rule GENERATION ORDER.

Diagnostic oracle (not a production miner): ports the exact candidate
generation machinery of core:algorithm/amie/ so deviations between the
declarative Spark miner and the reference BFS can be localized:

  * FreshAtomGenerator.getPossibleFreshAtoms (FreshAtomGenerator.scala:96-166)
    — non-decreasing var-pair ordering, dangling-variable naming, the
    subjectIsLower/objectIsLower closability check, maxPossibleDanglings
    and maxDanglingVariables (= floor(2*maxLen/3), AmieSettings.scala:24),
    last-atom restrictions (constants allow a dangling in the closing atom,
    variables don't — RuleRefinement.scala:352 and checkLastAtom);
  * the empirically pinned at-most-one-open-extra-dangling law: a fresh
    atom may not open a NEW dangling while a non-head variable is still
    dangling (AmieSpec maxLen goldens 30/67/124/98 — the literal reading
    of checkRightDanglings would admit the ac-bd-cd path shape at L4,
    which the reference's 98 excludes);
  * isValidFreshPredicate (FreshAtomGenerator.scala:52-88) — same-var-set
    predicate ordering (maxPredicates), atom duplicity / unique-predicate
    checks;
  * constants: instantiated head atoms (HeadsFetcher.scala:24-70 — full
    predicate size kept as headSize, constant-restricted support),
    instantiated dangling projections with per-(position, predicate)
    constant ordering (maxConstants, RuleRefinement.scala:29-45,340-365)
    and ConstantsAtPosition policies;
  * DISTINCT-TRIPLE support counting: a binding may not map two atoms of
    the rule (head included) to the same KG triple — the reference bans
    "two identical instantiated atoms in the rule" (RuleFilter.scala
    NoRepeatedGroups deprecation note; VariableMap.scala:5-12). This is
    what separates the dup+constants golden (51,143 @ minHC 0.02) from
    the plain enumeration (78,597): this simulator lands at 51,136 (7
    duplicate-predicate rules short, 0.014% — open residual), nodup
    subset exact;
  * RuleExpansion.expand (RuleExpansion.scala:22-36) — dangling bookkeeping;
  * Amie.executeStage (Amie.scala:184-231) — level-synchronous BFS with a
    per-stage unique set; rule equality is variable-renaming-invariant with
    head variables pinned (RuleContent.scala:29-38).

Support counting is the standard existential count (one per head pair with
a joint binding of body+fresh atom), which matches RuleRefinement's
projection counting semantics for non-injective mapping.

Variables are ints: 0='a' (head subject), 1='b' (head object), 2='c', ...
Constants are ('c', value) tuples; atoms are (s, p, o).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass


def is_var(x) -> bool:
    return isinstance(x, int)


@dataclass
class SimParams:
    min_head_size: int = 100
    min_support: int = 1
    min_head_coverage: float = 0.01
    max_rule_length: int = 3
    with_duplicate_predicates: bool = True
    only_predicates: set | None = None
    without_predicates: set | None = None
    #: 'nowhere' (no constants), None (both positions), 'subject', 'object',
    #: 'lower' (predicate's lowerCardinalitySide)
    constants_position: str | None = "nowhere"
    #: distinct-triple support counting (no binding maps two atoms of the
    #: rule, head included, to one KG triple). Diagnostic switch.
    ndt: bool = True
    #: when ndt: seed the used-triple set with the bound HEAD triple (body
    #: atoms may not rebind it). Diagnostic switch for the 51,143 residual —
    #: False = body atoms pairwise distinct only.
    ndt_head: bool = True
    #: further residual diagnostics ('B' = status quo): 'E' = the head
    #: triple is forbidden only for the FRESH atom (earlier body atoms may
    #: rebind it); 'F' = forbidden only for earlier body atoms (the fresh
    #: atom may rebind it); 'G' = the head triple is forbidden for EVERY
    #: atom (body + fresh) but body atoms may collide with each other.
    ndt_variant: str = "B"
    #: faithful QuasiBindingFilter (RuleFilter.scala:334-343): a NEW atom
    #: containing a constant must admit >= 2 distinct bindings of its
    #: variable over (parent body + new atom), head EXCLUDED, counted with
    #: plain non-injective semantics. Applied at every refinement step.
    quasi: bool = False

    @property
    def max_dangling_variables(self) -> int:
        return (self.max_rule_length * 2) // 3

    @property
    def with_instances(self) -> bool:
        return self.constants_position != "nowhere"

    def is_valid_predicate(self, p) -> bool:
        if self.only_predicates is not None and p not in self.only_predicates:
            return False
        if self.without_predicates is not None and p in self.without_predicates:
            return False
        return True


@dataclass
class Rule:
    head: tuple  # (item, p, item); var head = (0, p, 1)
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

    @property
    def head_vars(self) -> set:
        return {x for x in (self.head[0], self.head[2]) if is_var(x)}

    def canon(self) -> tuple:
        """Variable-renaming-invariant identity with head vars pinned
        (RuleContent.checkRuleContentsEquality)."""
        from itertools import permutations

        hv = self.head_vars
        extras = sorted({
            x for a in self.body for x in (a[0], a[2])
            if is_var(x) and x not in hv
        })
        base = 2 if hv == {0, 1} else 1

        def enc(x, m):
            if is_var(x):
                return ("v", m.get(x, x))
            return x

        if not extras:
            return (self.head, tuple(sorted(
                (enc(s, {}), p, enc(o, {})) for s, p, o in self.body
            )))
        best = None
        for perm in permutations(range(base, base + len(extras))):
            m = dict(zip(extras, perm))
            relabeled = tuple(sorted(
                (enc(s, m), p, enc(o, m)) for s, p, o in self.body
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

    def lower_side(self, p) -> str:
        ns, no = len(self.po[p]), len(self.ps[p])
        return "object" if ns >= no else "subject"

    def bindings(self, atoms, binding, used: frozenset | None = frozenset(),
                 accumulate: bool = True):
        """Generator of (binding, used_triples) for the atom list (constant
        items fixed). DISTINCT-TRIPLE semantics: no atom may bind a triple
        in ``used`` (seed with the head triple), and no two atoms may bind
        the same triple — the reference bans "two identical instantiated
        atoms in the rule" (RuleFilter.scala NoRepeatedGroups deprecation
        note; VariableMap.scala:5-12 commentary; pinned empirically by the
        AmieSpec dup+constants golden 51143, see mine_reference_order).
        ``used=None`` disables the tracking entirely (plain existential
        counting — NonInjectiveMapping, VariableMap.scala:378-407); the
        yielded used-set is then always empty."""
        if not atoms:
            yield binding, (used if used is not None else frozenset())
            return

        def val(x, b):
            if is_var(x):
                return b.get(x)
            return x[1]

        def score(a):
            s, p, o = a
            sb, ob = val(s, binding) is not None, val(o, binding) is not None
            return 0 if (sb and ob) else (1 if (sb or ob) else 2)

        atoms = sorted(atoms, key=score)
        s, p, o = atoms[0]
        rest = atoms[1:]
        sb, ob = val(s, binding), val(o, binding)

        def emit(ss, oo):
            if used is None:
                b2 = dict(binding)
                if is_var(s):
                    b2[s] = ss
                if is_var(o):
                    b2[o] = oo
                yield from self.bindings(rest, b2, None)
                return
            t = (ss, p, oo)
            if t in used:
                return
            b2 = dict(binding)
            if is_var(s):
                b2[s] = ss
            if is_var(o):
                b2[o] = oo
            yield from self.bindings(
                rest, b2, used | {t} if accumulate else used, accumulate
            )

        if sb is not None and ob is not None:
            if ob in self.po[p].get(sb, ()):
                yield from emit(sb, ob)
        elif sb is not None:
            for oo in self.po[p].get(sb, ()):
                yield from emit(sb, oo)
        elif ob is not None:
            for ss in self.ps[p].get(ob, ()):
                yield from emit(ss, ob)
        else:
            for ss, oos in self.po[p].items():
                for oo in oos:
                    yield from emit(ss, oo)

    def exists(self, atoms, binding, used: frozenset = frozenset()) -> bool:
        for _ in self.bindings(atoms, binding, used):
            return True
        return False


def _inst_position(idx: Index, params: SimParams, p) -> str | None:
    """Allowed instantiation position for predicate p: 'subject', 'object',
    None = both (instantiatedPosition, RuleRefinement.scala:63-90).
    Returns 'none' when instantiation is disabled."""
    cp = params.constants_position
    if cp == "nowhere":
        return "none"
    if cp is None:
        return None
    if cp == "lower":
        return idx.lower_side(p)
    return cp


def _possible_fresh_atoms(rule: Rule, params: SimParams):
    """Port of getPossibleFreshAtoms (+ the pinned one-open-extra law)."""
    last = rule.body[0] if rule.body else rule.head
    dangling = rule.max_variable + 1
    ls, lo = last[0], last[2]
    if is_var(ls) and is_var(lo):
        x, y = min(ls, lo), max(ls, lo)
    elif is_var(ls):
        x, y = ls, dangling
    else:
        x, y = lo, dangling
    max_possible_danglings = (params.max_rule_length - rule.rule_length - 1) * 2
    is_last = rule.rule_length + 1 >= params.max_rule_length
    hv = rule.head_vars
    has_extra_dangling = any(d not in hv for d in rule.danglings)

    def check_right_danglings(s, o):
        if rule.is_closed:
            return True
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
        if not params.with_instances:
            # constants Nowhere: the closing atom may not open a dangling
            return s != dangling and o != dangling
        # with instances the dangling gets instantiated; ConstantsAtPosition
        # Subject forbids the dangling at object and vice versa
        # (FreshAtomGenerator.scala:133-141)
        if params.constants_position == "subject" and o == dangling:
            return False
        if params.constants_position == "object" and s == dangling:
            return False
        return True

    for i in range(x, dangling):
        for j in range(x + 1, dangling + 1):
            if i < j and ((i == x and j >= y) or i > x):
                for s, o in ((i, j), (j, i)):
                    if check_right_danglings(s, o) and check_last_atom(s, o):
                        # pinned one-open-extra-dangling law: an atom that
                        # OPENS a new dangling while an extra (non-head)
                        # var is still dangling may only be emitted
                        # INSTANTIATED (the constant consumes the dangling)
                        # — its variable projection never materializes.
                        # Var-only evidence: AmieSpec maxLen4 golden (98,
                        # path shape excluded); constants evidence: the
                        # {VV,CAtom} rule family requires the instantiated
                        # side (AmieSpec 51143/211527 configs).
                        inst_only = (
                            (s == dangling or o == dangling)
                            and has_extra_dangling
                        )
                        yield (s, o, inst_only)


def _max_predicates(rule: Rule):
    """maxPredicates: var-SET -> max predicate over body atoms
    (FreshAtomGenerator.scala:20-32)."""
    out = {}
    for s, q, o in rule.body:
        key = frozenset(x for x in (s, o) if is_var(x))
        if key not in out or q > out[key]:
            out[key] = q
    return out


def _max_constants(rule: Rule):
    """maxConstants: (var-position, predicate) -> max constant
    (RuleRefinement.scala:29-45). Position key: ('s', var) means the atom's
    SUBJECT is the variable (constant at object), ('o', var) the reverse."""
    out = {}
    for s, q, o in rule.body:
        if is_var(s) and not is_var(o):
            key = (("s", s), q)
            if key not in out or o[1] > out[key]:
                out[key] = o[1]
        elif not is_var(s) and is_var(o):
            key = (("o", o), q)
            if key not in out or s[1] > out[key]:
                out[key] = s[1]
    return out


def _is_valid_fresh_predicate(rule: Rule, max_preds, fresh, p, params) -> bool:
    """Port of isValidFreshPredicate (predicate-level checks; the atom-level
    duplicity of instantiated atoms is checked at emission)."""
    if not params.is_valid_predicate(p):
        return False
    mx = max_preds.get(frozenset(fresh))
    if mx is not None and not (p >= mx):
        return False
    if params.with_duplicate_predicates:
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
    avars = {x for x in (s, o) if is_var(x)}
    head_dangling = [dangling] if dangling in avars else []
    second = [d for d in rule.danglings if d not in avars]
    return Rule(
        head=rule.head,
        body=(atom,) + rule.body,
        danglings=tuple(head_dangling + second),
        max_variable=max([rule.max_variable] + [x for x in avars]),
        support=support,
        head_size=rule.head_size,
    )


def _quasi_ok(idx: Index, body: list, atom) -> bool:
    """QuasiBindingFilter (RuleFilter.scala:334-343): the new instantiated
    atom must admit >= 2 distinct bindings of its variable over
    (parent body + new atom). The pseudo-head is (subject, ZERO, object) of
    the new atom, so only its variable side is counted; the rule head is
    NOT part of the counted atom set; counting is plain non-injective
    (countDistinctPairs with VariableMap(injectiveMapping=false)) and stops
    as soon as 2 distinct values are found (maxCount=1.0)."""
    var = atom[0] if is_var(atom[0]) else atom[2]
    seen = set()
    for bd, _ in idx.bindings(body + [atom], {}, None):
        seen.add(bd[var])
        if len(seen) > 1:
            return True
    return False


def _head_rules(idx: Index, params: SimParams):
    """HeadsFetcher: variable heads + instantiated variants."""
    rules = []
    for p, size in idx.psize.items():
        if not params.is_valid_predicate(p):
            continue
        if size < params.min_head_size:
            continue
        thr = max(params.min_support, params.min_head_coverage * size)
        if size >= thr:
            rules.append(Rule(
                head=(0, p, 1), body=(), danglings=(1, 0),
                max_variable=1, support=size, head_size=size,
            ))
        ip = _inst_position(idx, params, p)
        if ip == "none":
            continue
        if ip in (None, "subject"):
            for c, objs in idx.po[p].items():
                if len(objs) >= thr:
                    rules.append(Rule(
                        head=(("c", c), p, 0), body=(), danglings=(0,),
                        max_variable=0, support=len(objs), head_size=size,
                    ))
        if ip in (None, "object"):
            for c, subs in idx.ps[p].items():
                if len(subs) >= thr:
                    rules.append(Rule(
                        head=(0, p, ("c", c)), body=(), danglings=(0,),
                        max_variable=0, support=len(subs), head_size=size,
                    ))
    return rules


def _head_bindings(idx: Index, rule: Rule):
    """(binding, head_triple) per head fact."""
    hs, p, ho = rule.head
    if is_var(hs) and is_var(ho):
        return [
            ({hs: s, ho: o}, (s, p, o))
            for s, os_ in idx.po[p].items() for o in os_
        ]
    if is_var(ho):  # subject instantiated
        c = rule.head[0][1]
        return [({ho: o}, (c, p, o)) for o in idx.po[p].get(c, ())]
    c = rule.head[2][1]
    return [({hs: s}, (s, p, c)) for s in idx.ps[p].get(c, ())]


def mine_reference_order(triples, params: SimParams | None = None):
    """Run the staged BFS exactly as Amie.executeStage; returns the list of
    closed rules (deduped by renaming-invariant canon)."""
    params = params or SimParams()
    triples = [t for t in triples if params.is_valid_predicate(t[1])]
    idx = Index(triples)
    queue = _head_rules(idx, params)
    closed: dict = {}
    stage = 1
    while stage < params.max_rule_length and queue:
        next_set: dict = {}
        for rule in queue:
            min_sup = max(
                params.min_support,
                params.min_head_coverage * rule.head_size,
            )
            max_preds = _max_predicates(rule)
            max_consts = _max_constants(rule)
            body = list(rule.body)
            head_bindings = _head_bindings(idx, rule)
            is_last = rule.rule_length + 1 >= params.max_rule_length
            dangling = rule.max_variable + 1
            for u, v, inst_only in _possible_fresh_atoms(rule, params):
                fresh = (u, v)
                all_set = {
                    p for p in idx.psize
                    if _is_valid_fresh_predicate(rule, max_preds, fresh, p, params)
                }
                if not all_set:
                    continue
                counts = defaultdict(int)
                for hb, ht in head_bindings:
                    found = set()
                    if not params.ndt:
                        seed = None
                    elif params.ndt_variant == "E" or not params.ndt_head:
                        seed = frozenset()
                    else:
                        seed = frozenset((ht,))
                    acc = params.ndt_variant != "G"
                    for bd, body_used in idx.bindings(
                        body, dict(hb), seed, acc
                    ):
                        if params.ndt_variant == "E":
                            used = body_used | {ht}
                        elif params.ndt_variant == "F":
                            used = body_used - {ht}
                        else:
                            used = body_used
                        ub = bd.get(u) if u != dangling else None
                        vb = bd.get(v) if v != dangling else None
                        if ub is not None and vb is not None:
                            for p in idx.sop.get((ub, vb), set()) & all_set:
                                if (ub, p, vb) not in used:
                                    found.add((u, p, v))
                        elif ub is not None:
                            # dangling at object
                            for p in idx.sp.get(ub, set()) & all_set:
                                objs = idx.po[p].get(ub, ())
                                free = [
                                    c for c in objs if (ub, p, c) not in used
                                ] if len(objs) <= len(used) + 1 else objs
                                if not free:
                                    continue
                                # variable projection (not at last stage:
                                # RuleRefinement.scala:352 / checkLastAtom)
                                if not is_last and not inst_only:
                                    found.add((u, p, v))
                                ip = _inst_position(idx, params, p)
                                if ip in (None, "object"):
                                    mx = max_consts.get((("s", u), p))
                                    for c in objs:
                                        if mx is not None and not (c > mx):
                                            continue
                                        if (ub, p, c) in used:
                                            continue
                                        found.add((u, p, ("c", c)))
                        elif vb is not None:
                            # dangling at subject
                            for p in idx.op.get(vb, set()) & all_set:
                                subs = idx.ps[p].get(vb, ())
                                free = [
                                    c for c in subs if (c, p, vb) not in used
                                ] if len(subs) <= len(used) + 1 else subs
                                if not free:
                                    continue
                                if not is_last and not inst_only:
                                    found.add((u, p, v))
                                ip = _inst_position(idx, params, p)
                                if ip in (None, "subject"):
                                    mx = max_consts.get((("o", v), p))
                                    for c in subs:
                                        if mx is not None and not (c > mx):
                                            continue
                                        if (c, p, vb) in used:
                                            continue
                                        found.add((("c", c), p, v))
                    for atom in found:
                        counts[atom] += 1
                for atom, support in counts.items():
                    if support < min_sup:
                        continue
                    has_const = not (is_var(atom[0]) and is_var(atom[2]))
                    if has_const and params.quasi and not _quasi_ok(
                        idx, body, atom
                    ):
                        continue
                    if has_const:
                        # exact-duplicate instantiated atom in the rule —
                        # rulePredicates includes the HEAD atom, so a body
                        # atom equal to an instantiated head is a duplicate
                        # (isDuplicateInstantiatedAtom via RuleEnhancement
                        # rulePredicates, RuleEnhancement.scala:21-37)
                        if atom in rule.body or atom == rule.head:
                            continue
                    new = _expand(rule, atom, support)
                    key = (new.is_closed, new.canon())
                    if key not in next_set:
                        next_set[key] = new
                        if new.is_closed:
                            closed[new.canon()] = new
        queue = list(next_set.values())
        stage += 1
    return list(closed.values())
