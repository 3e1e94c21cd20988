"""Rule patterns (reference core:rule/RulePattern.scala, AtomPattern.scala;
matchers core:rule/MappedAtomPatternMatcher.scala; enforcement
RuleRefinement.scala:99-114, RuleFilter.scala:65-300).

Declarative form: the reference prunes the BFS with patterns during
generation; over the complete mined ruleset the same result is a
post-filter. Semantics pinned against ALL 11 golden counts of
AmieSpec.scala:298-399 (10826/15/1549/10229/597/33/2/50/11443/1784/36):

  * an antecedent AtomPattern matches a rule iff SOME body atom matches it
    AND that atom contains at least one HEAD variable — the reference only
    matches the pattern against the first-generated atom, and the first
    fresh atom must connect to the head (FreshAtomGenerator
    .getPossibleFreshAtoms); an atom whose variables are all
    body-introduced (e.g. the (?c r C) atom of a path shape) can never be
    generated first;
  * multiple antecedent patterns must match distinct body atoms
    (injectively), at least one of them head-connected;
  * a consequent AtomPattern constrains the head atom;
  * `exact` requires rule length == #pattern atoms + 1 (RulePattern
    .withExact, AmieSpec:367-373);
  * variables in patterns use the reference naming: instantiated heads
    normalize their free variable to ?a and the body fresh variable to ?b
    (HeadsFetcher.scala:40-44 `transform(object = Variable(0))`); two-var
    heads are (?a p ?b) with fresh variable ?c.

Works on the canonical rule rows of mining/constants.mine_constants
(head string "s|p|o", atoms array<string>).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANY = "__any__"
ANY_VARIABLE = "__any_var__"
ANY_CONSTANT = "__any_const__"


@dataclass
class AtomPattern:
    """Pattern for one atom; item patterns: None/ANY (anything),
    ANY_VARIABLE, ANY_CONSTANT, '?x' (concrete variable), 'C=<v>'
    (concrete constant). predicate: None, a string, OneOf list, or
    NoneOf via `predicate_none_of`.

    ``graph`` / ``graph_none_of`` (AtomPattern(graph=...),
    MappedAtomPatternMatcher.scala:35-48): a graph pattern matches iff the
    atom's graph set CONTAINS the named graph (Constant/OneOf), or contains
    none of them (NoneOf) — the atom's graph set is the set of graphs its
    predicate occurs in (Atom.toGraphAwareAtom; predicate-level — pass
    `predicate_graphs` to filter_rules). Executed-reference-verified on a
    two-graph union incl. a shared predicate, which distinguishes
    contains- from only-semantics (tests/test_refexec_parity.py)."""

    predicate: str | list | None = None
    predicate_none_of: list | None = field(default=None)
    subject: str | None = None
    object: str | None = None
    graph: str | list | None = None
    graph_none_of: list | None = field(default=None)


def normalize_vars(head_col: Column, atoms_col: Column) -> tuple[Column, Column]:
    """Rename to the reference convention for instantiated heads:
    free var -> ?a, fresh var -> ?b."""
    hs = F.split(head_col, "\\|")[0]
    ho = F.split(head_col, "\\|")[2]
    inst = hs.startswith("C=") | ho.startswith("C=")
    free = F.when(hs.startswith("C="), ho).otherwise(hs)

    def ren(c: Column) -> Column:
        repl = F.replace(
            F.replace(c, free, F.lit("?a")), F.lit("?c"), F.lit("?b")
        )
        return F.when(inst, repl).otherwise(c)

    return ren(head_col), F.transform(atoms_col, ren)


def _term_match(term: Column, pat: str | None) -> Column:
    if pat is None or pat == ANY:
        return F.lit(True)
    if pat == ANY_VARIABLE:
        return term.startswith("?")
    if pat == ANY_CONSTANT:
        return term.startswith("C=")
    return term == F.lit(pat)


def _atom_match(
    atom: Column, p: AtomPattern, pg_map: Column | None = None
) -> Column:
    s = F.split(atom, "\\|")[0]
    q = F.split(atom, "\\|")[1]
    o = F.split(atom, "\\|")[2]
    cond = F.lit(True)
    if p.predicate is not None:
        if isinstance(p.predicate, (list, tuple)):
            cond = cond & q.isin(list(p.predicate))
        else:
            cond = cond & (q == F.lit(p.predicate))
    if p.predicate_none_of:
        cond = cond & ~q.isin(list(p.predicate_none_of))
    if p.graph is not None or p.graph_none_of:
        if pg_map is None:
            raise ValueError(
                "graph patterns need filter_rules(predicate_graphs=...)"
            )
        graphs = F.try_element_at(pg_map, q)
        if p.graph is not None:
            one_of = (
                list(p.graph)
                if isinstance(p.graph, (list, tuple))
                else [p.graph]
            )
            any_in = F.lit(False)
            for g in one_of:
                any_in = any_in | F.coalesce(
                    F.array_contains(graphs, g), F.lit(False)
                )
            cond = cond & any_in
        if p.graph_none_of:
            for g in p.graph_none_of:
                cond = cond & ~F.coalesce(
                    F.array_contains(graphs, g), F.lit(False)
                )
    cond = cond & _term_match(s, p.subject) & _term_match(o, p.object)
    return cond


def _head_connected(atom: Column, head: Column) -> Column:
    hs = F.split(head, "\\|")[0]
    ho = F.split(head, "\\|")[2]
    s = F.split(atom, "\\|")[0]
    o = F.split(atom, "\\|")[2]
    hv = F.filter(F.array(hs, ho), lambda x: x.startswith("?"))
    return F.arrays_overlap(hv, F.array(s, o))


def filter_rules(
    rules: DataFrame,
    body: list[AtomPattern] | AtomPattern | None = None,
    head: AtomPattern | None = None,
    exact: bool = False,
    orderless: bool = False,
    head_col: str = "head",
    atoms_col: str = "atoms",
    predicate_graphs: dict | None = None,
    max_body_atoms: int = 4,
) -> DataFrame:
    """Keep rules matching the pattern (see module docstring for exact
    semantics and golden pinning).

    ``max_body_atoms``: position bound for the k>=3 injective-assignment
    expansion (default 4 = maxRuleLength 5); bodies longer than this are
    only matched at their first ``max_body_atoms`` positions, so raise it
    when filtering longer rules.

    ``orderless`` (RulePattern.withOrderless, RulePattern.scala:36-44):
    pattern atoms may match ANY body atom — the default (gradual) mode
    additionally requires a matched atom in the head-adjacent position,
    mirroring the reference's level-by-level pattern matching during
    refinement (PatternsSpec orderless-partial golden: 129 vs 18 gradual).

    ``predicate_graphs``: {predicate: [graph, ...]} (collect
    multigraph.predicate_graphs — broadcast-sized at any corpus scale),
    required when any pattern uses graph / graph_none_of."""
    if isinstance(body, AtomPattern):
        body = [body]
    body = body or []
    pg_map = None
    if predicate_graphs is not None:
        entries = [
            F.struct(
                F.lit(p).alias("k"),
                F.array(*[F.lit(g) for g in gs]).alias("v"),
            )
            for p, gs in sorted(predicate_graphs.items())
        ]
        pg_map = F.map_from_entries(F.array(*entries))
    h, a = normalize_vars(F.col(head_col), F.col(atoms_col))
    out = rules.withColumn("_h", h).withColumn("_a", a)
    cond = F.lit(True)
    if head is not None:
        cond = cond & _atom_match(F.col("_h"), head, pg_map)
    if len(body) == 1:
        p = body[0]
        if orderless:
            cond = cond & F.exists(
                F.col("_a"), lambda x: _atom_match(x, p, pg_map)
            )
        else:
            cond = cond & F.exists(
                F.col("_a"),
                lambda x: _atom_match(x, p, pg_map)
                & _head_connected(x, F.col("_h")),
            )
    elif len(body) == 2:
        p1, p2 = body
        # injective assignment of the two patterns to two distinct atoms;
        # gradual mode: at least one matched atom head-connected (the
        # first-generated one)
        def pair(i, j):
            # F.get: null (not ANSI error) when the body has < 2 atoms
            ai, aj = F.get(F.col("_a"), i), F.get(F.col("_a"), j)
            m = _atom_match(ai, p1, pg_map) & _atom_match(aj, p2, pg_map)
            if not orderless:
                m = m & (
                    _head_connected(ai, F.col("_h"))
                    | _head_connected(aj, F.col("_h"))
                )
            return m

        cond = cond & (F.size(F.col("_a")) >= 2) & (pair(0, 1) | pair(1, 0))
    elif len(body) > 2:
        # k >= 3 body patterns (rules from maxRuleLength >= 4). Injective
        # assignment of the k patterns to k distinct body positions,
        # expanded as an OR over position permutations (bounded by
        # max_body_atoms, so the expression stays a fixed-size JVM
        # whole-stage-codegen predicate — no shuffle, no UDF).
        #
        # Semantics note (pinned vs the executed reference, see
        # tests/test_pattern_filters.py): orderless and exact modes
        # reproduce the reference's mining output EXACTLY (fixtures
        # pat_o1/pat_e1). Gradual (ordered) matching for k >= 3 is
        # generation-order-dependent in the reference (Amie.scala:206
        # right-aligns the STORED body order of whichever refinement path
        # reached the rule first, and intermediate rules must pass
        # minHeadCoverage along that path) — irreproducible over a
        # set-level ruleset, so gradual here is the order-free superset:
        # injective assignment with at least one matched atom
        # head-connected, the same law the k <= 2 goldens pinned.
        k = len(body)
        if k > max_body_atoms:
            raise ValueError(
                f"{k} body patterns > max_body_atoms={max_body_atoms}; "
                "raise max_body_atoms to the ruleset's max body length"
            )
        perms = []
        for perm in itertools.permutations(range(max_body_atoms), k):
            atoms = [F.get(F.col("_a"), i) for i in perm]
            m = F.size(F.col("_a")) > F.lit(max(perm))
            for a, p in zip(atoms, body):
                m = m & F.coalesce(_atom_match(a, p, pg_map), F.lit(False))
            if not orderless:
                m = m & F.coalesce(
                    reduce(
                        lambda x, y: x | y,
                        [_head_connected(a, F.col("_h")) for a in atoms],
                    ),
                    F.lit(False),
                )
            perms.append(m)
        cond = cond & (F.size(F.col("_a")) >= k) & reduce(
            lambda x, y: x | y, perms
        )
    if exact:
        cond = cond & (F.size(F.col(atoms_col)) == F.lit(len(body)))
    return out.where(cond).drop("_h", "_a")


@dataclass
class RulePattern:
    """Rule pattern for the ruleset POST-filter (reference
    ruleset/RulePattern.scala + Ruleset.scala:76-84). `body` atoms match
    orderless-injectively (Ruleset.filter FORCES withOrderless()), `head`
    constrains the head atom, `exact` pins rule length == len(body) + 1
    (otherwise >=). Unlike the mining-time AtomPattern semantics of
    filter_rules, concrete '?x' variables here are ALIASES
    (RulePatternMatcher/PatternMatcher.Aliases): a pattern variable may
    match ANY rule variable, but the pattern-var <-> rule-var mapping must
    be a bijection across the head and all matched body atoms."""

    body: list[AtomPattern] = field(default_factory=list)
    head: AtomPattern | None = None
    exact: bool = False


def _is_pattern_var(t) -> bool:
    return (
        isinstance(t, str)
        and t not in (ANY, ANY_VARIABLE, ANY_CONSTANT)
        and t.startswith("?")
    )


def _struct_pattern(p: AtomPattern) -> AtomPattern:
    """Structural part of an alias-mode pattern: a concrete '?x' only
    requires the term to BE a variable; the binding itself is added as
    alias-consistency constraints."""

    def scrub(t):
        return ANY_VARIABLE if _is_pattern_var(t) else t

    return AtomPattern(
        predicate=p.predicate,
        predicate_none_of=p.predicate_none_of,
        subject=scrub(p.subject),
        object=scrub(p.object),
        graph=p.graph,
        graph_none_of=p.graph_none_of,
    )


def _var_pairs(p: AtomPattern, atom: Column) -> list[tuple[Column, str]]:
    """(rule-term expression, pattern-variable name) pairs contributed by
    one matched atom."""
    s = F.split(atom, "\\|")[0]
    o = F.split(atom, "\\|")[2]
    out = []
    if _is_pattern_var(p.subject):
        out.append((s, p.subject))
    if _is_pattern_var(p.object):
        out.append((o, p.object))
    return out


def _alias_consistent(pairs: list[tuple[Column, str]]) -> Column:
    """Bijection law of PatternMatcher.Aliases: equal pattern variables
    must bind the same rule variable, distinct pattern variables distinct
    rule variables."""
    cond = F.lit(True)
    for (t1, v1), (t2, v2) in itertools.combinations(pairs, 2):
        if v1 == v2:
            cond = cond & (t1 == t2)
        else:
            cond = cond & (t1 != t2)
    return cond


def filter_resolved(
    rules: DataFrame,
    patterns: list[RulePattern] | RulePattern,
    head_col: str = "head",
    atoms_col: str = "atoms",
    predicate_graphs: dict | None = None,
    max_body_atoms: int = 4,
) -> DataFrame:
    """Ruleset.filter(pattern, ...) of the reference (Ruleset.scala:76-84):
    keep rules matching ANY of the given RulePatterns under
    RulePatternMatcher semantics — length law (exact: len(body) ==
    #pattern atoms, else >=), head-atom pattern, and orderless INJECTIVE
    body matching with pattern-variable aliasing. Matched rule-for-rule
    against the executed reference on the L4 yago ruleset
    (tests/fixtures/refexec/pat_pf1..pf4, tests/test_pattern_filters.py).

    Scale: the filter compiles to one OR-of-permutations predicate over
    the atoms array — whole-stage-codegen, no shuffle, no Python row path;
    position expansion bounded by ``max_body_atoms`` (default 4 =
    maxRuleLength 5)."""
    if isinstance(patterns, RulePattern):
        patterns = [patterns]
    pg_map = None
    if predicate_graphs is not None:
        entries = [
            F.struct(
                F.lit(p).alias("k"),
                F.array(*[F.lit(g) for g in gs]).alias("v"),
            )
            for p, gs in sorted(predicate_graphs.items())
        ]
        pg_map = F.map_from_entries(F.array(*entries))

    atoms = F.col(atoms_col)
    head = F.col(head_col)
    any_pattern = F.lit(False)
    for rp in patterns:
        k = len(rp.body)
        if k > max_body_atoms:
            raise ValueError(
                f"{k} body patterns > max_body_atoms={max_body_atoms}; "
                "raise max_body_atoms to the ruleset's max body length"
            )
        cond = F.size(atoms) == k if rp.exact else F.size(atoms) >= k
        head_pairs: list[tuple[Column, str]] = []
        if rp.head is not None:
            cond = cond & _atom_match(head, _struct_pattern(rp.head), pg_map)
            head_pairs = _var_pairs(rp.head, head)
        if k == 0:
            cond = cond & _alias_consistent(head_pairs)
            any_pattern = any_pattern | cond
            continue
        assigns = []
        for perm in itertools.permutations(range(max_body_atoms), k):
            m = F.size(atoms) > F.lit(max(perm))
            pairs = list(head_pairs)
            for p, pos in zip(rp.body, perm):
                a = F.get(atoms, pos)
                m = m & F.coalesce(
                    _atom_match(a, _struct_pattern(p), pg_map), F.lit(False)
                )
                pairs.extend(_var_pairs(p, a))
            m = m & F.coalesce(_alias_consistent(pairs), F.lit(False))
            assigns.append(m)
        cond = cond & reduce(lambda x, y: x | y, assigns)
        any_pattern = any_pattern | cond
    return rules.where(any_pattern)
