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

from dataclasses import dataclass, field

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
) -> DataFrame:
    """Keep rules matching the pattern (see module docstring for exact
    semantics and golden pinning).

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
        raise NotImplementedError("max 2 body patterns (maxRuleLength 3)")
    if exact:
        cond = cond & (F.size(F.col(atoms_col)) == F.lit(len(body)))
    return out.where(cond).drop("_h", "_a")
