"""Rule-pattern filters with >= 3 body atoms, pinned rule-for-rule against
the EXECUTED reference engine (tools/refexec) on the yago L4 var-only
ruleset (139 rules at the executable spec, fixture nodup_novar_l4):

  * filter_resolved — Ruleset.filter(pattern) semantics
    (Ruleset.scala:76-84 forces withOrderless(); RulePatternMatcher.scala
    orderless-injective matching with PatternMatcher.Aliases bijection;
    exact/partial length law). Fixtures pat_pf1..pf4 are dumps of
    `MineHarness --postfilter=...` which invokes the reference's own
    mappedRulePatternMatcher on the mined rules.
  * filter_rules — mining-time pattern semantics (Amie.addPattern;
    RuleRefinement.scala:99-114 + the output gate Amie.scala:206) for the
    orderless and exact modes, which are generation-order-free and
    reproduce the reference's patterned-mining output EXACTLY
    (fixtures pat_o1 / pat_e1, dumps of `MineHarness --pattern=...`).
    Gradual (ordered) k>=3 is generation-order-dependent in the reference
    (verified: pattern p1&p2&p3 vs p3&p2&p1 each yield a DIFFERENT single
    rule out of the 9 orderless matches, selected by which refinement path
    passes minHeadCoverage first) — filter_rules documents and implements
    the order-free superset there, asserted as a superset here.
"""

from __future__ import annotations

import gzip
import re

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rdfrules_spark.mining.patterns import (
    ANY_VARIABLE,
    AtomPattern,
    RulePattern,
    filter_resolved,
    filter_rules,
)

FIXTURES = "/root/repo/tests/fixtures/refexec"
ATOM = re.compile(r"^\(\s*(\S+)\s+(.+?)\s+(\S+)\s*\)$")


def _term(x: str) -> str:
    return x if x.startswith("?") else "C=" + x[1:-1]


def _atom(s: str) -> str:
    m = ATOM.match(s.strip())
    assert m, s
    su, p, o = m.groups()
    return f"{_term(su)}|{p[1:-1]}|{_term(o)}"


def load_rules(name: str) -> dict[tuple, int]:
    """{(head, frozenset(atoms)): support} — bodies in the dumps are
    sorted strings, var naming is the reference resolver's and therefore
    identical for the same rule across dumps."""
    out = {}
    with gzip.open(f"{FIXTURES}/{name}.tsv.gz", "rt", encoding="utf-8") as f:
        for line in f:
            head, _, body, sup, _hs, _hc = line.rstrip("\n").split("\t")
            atoms = frozenset(_atom(a) for a in body.split(" ^ "))
            out[(_atom(head), atoms)] = int(sup)
    assert out
    return out


@pytest.fixture(scope="module")
def l4_rules(spark):
    rows = [
        (h, sorted(atoms))
        for (h, atoms) in load_rules("nodup_novar_l4")
    ]
    assert len(rows) == 139
    return spark.createDataFrame(
        rows, "head string, atoms array<string>"
    ).cache()


def keys(df) -> set[tuple]:
    return {
        (r["head"], frozenset(r["atoms"])) for r in df.collect()
    }


# --- filter_resolved vs MineHarness --postfilter dumps -------------------

PF_CASES = [
    # pf1: ?a;*;?c & ?b;*;?c & ?c;*;?b  (5 rules)
    (
        "pat_pf1",
        RulePattern(body=[
            AtomPattern(subject="?a", object="?c"),
            AtomPattern(subject="?b", object="?c"),
            AtomPattern(subject="?c", object="?b"),
        ]),
    ),
    # pf2: three predicate constants (4 rules)
    (
        "pat_pf2",
        RulePattern(body=[
            AtomPattern(predicate="<isCitizenOf>"),
            AtomPattern(predicate="<isLocatedIn>"),
            AtomPattern(predicate="<hasCapital>"),
        ]),
    ),
    # pf3: chain body + head with shared aliases (15 rules)
    (
        "pat_pf3",
        RulePattern(
            body=[
                AtomPattern(subject="?a", object="?b"),
                AtomPattern(subject="?b", object="?c"),
            ],
            head=AtomPattern(subject="?a", object="?c"),
        ),
    ),
    # pf4: alias + AnyVariable + NoneOf mix (16 rules)
    (
        "pat_pf4",
        RulePattern(body=[
            AtomPattern(
                subject="?a", predicate="<isLocatedIn>", object=ANY_VARIABLE
            ),
            AtomPattern(
                predicate_none_of=["<hasCapital>", "<isLocatedIn>"],
                object="?a",
            ),
        ]),
    ),
]


@pytest.mark.parametrize("dump,pattern", PF_CASES, ids=[c[0] for c in PF_CASES])
def test_filter_resolved_matches_executed_reference(l4_rules, dump, pattern):
    got = keys(filter_resolved(l4_rules, pattern))
    want = set(load_rules(dump))
    assert got == want, (
        f"{dump}: {len(got - want)} extra, {len(want - got)} missing; "
        f"e.g. {sorted(got - want)[:2]} / {sorted(want - got)[:2]}"
    )


def test_filter_resolved_multiple_patterns_union(l4_rules):
    pats = [PF_CASES[1][1], PF_CASES[2][1]]
    got = keys(filter_resolved(l4_rules, pats))
    want = set(load_rules("pat_pf2")) | set(load_rules("pat_pf3"))
    assert got == want


def test_filter_resolved_exact_length_law(l4_rules):
    # exact: rule length == len(body) + 1; the pf3 chain pattern has 13 of
    # its 15 matches at exactly 2 body atoms (the 3-atom matches drop)
    pat = PF_CASES[2][1]
    exact = RulePattern(body=pat.body, head=pat.head, exact=True)
    got = keys(filter_resolved(l4_rules, exact))
    want = {k for k in load_rules("pat_pf3") if len(k[1]) == 2}
    assert got == want


# --- filter_rules (mining-time) vs MineHarness --pattern dumps -----------


def test_filter_rules_orderless_3atoms_matches_executed_reference(l4_rules):
    got = keys(filter_rules(
        l4_rules,
        body=[
            AtomPattern(predicate="<actedIn>"),
            AtomPattern(predicate="<created>"),
            AtomPattern(predicate="<produced>"),
        ],
        orderless=True,
    ))
    assert got == set(load_rules("pat_o1"))
    assert len(got) == 9


def test_filter_rules_exact_3any_head_matches_executed_reference(l4_rules):
    got = keys(filter_rules(
        l4_rules,
        body=[AtomPattern(), AtomPattern(), AtomPattern()],
        head=AtomPattern(predicate="<directed>"),
        exact=True,
    ))
    assert got == set(load_rules("pat_e1"))
    assert len(got) == 12


def test_filter_rules_gradual_3atoms_is_orderfree_superset(l4_rules):
    # the reference's gradual k>=3 output is a generation-order-dependent
    # SUBSET of the orderless matches (1 of 9 for this pattern, and a
    # DIFFERENT 1 when the pattern order is reversed); filter_rules
    # implements the documented order-free law = the 9-rule orderless set
    # (every atom pattern head-connect-compatible here)
    body = [
        AtomPattern(predicate="<actedIn>"),
        AtomPattern(predicate="<created>"),
        AtomPattern(predicate="<produced>"),
    ]
    got = keys(filter_rules(l4_rules, body=body))
    assert got >= set(load_rules("pat_o1")) - set()  # superset of ref subset
    assert got == set(load_rules("pat_o1"))


def test_filter_rules_max_body_atoms_guard(l4_rules):
    with pytest.raises(ValueError, match="max_body_atoms"):
        filter_rules(
            l4_rules, body=[AtomPattern()] * 5, max_body_atoms=4
        )
    with pytest.raises(ValueError, match="max_body_atoms"):
        filter_resolved(
            l4_rules, RulePattern(body=[AtomPattern()] * 5), max_body_atoms=4
        )
