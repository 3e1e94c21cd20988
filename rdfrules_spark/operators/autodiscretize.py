"""Auto-discretization of an indexed dataset (reference
core:index/ops/DiscretizationOps.scala:18-247, DiscretizationTask.scala).

For every numeric predicate that can matter to mining, build an
EquisizeTree interval tree over its object values and emit NEW quads
``(s, <p>#discretized_level_<L>, "[lo;hi]")`` for every tree level L >= 1,
so rules can use coarse-to-fine interval atoms.

Semantics ported:
  * minSupportLower(p) = ceil(minHC * min head-size among predicates within
    (maxRuleLength-1) hops of p in the predicate-neighbour graph, sizes
    below minHeadSize excluded)  (getMinSupportLower:219-236); a predicate
    with no qualifying neighbour is skipped (bound = +inf);
  * minSupportUpper(p) = same with max                  (getMinSupportUpper);
  * numeric predicates = those whose numeric-object fact count reaches
    minSupportLower(p)                                  (getNumericPredicates);
  * per predicate: EquisizeTree(minSupportLower(p), arity) in RANK space —
    a node covering ranks [lo, hi) splits into `arity` even chunks iff
    every chunk still holds >= support rows              (buildDiscretizedTree);
  * removeDuplicitIntervals: a child whose value-interval equals its
    parent's is dropped (node with no surviving children becomes a leaf);
  * cut-off: a node ALL of whose children hold >= minSupportUpper(p) rows
    is not emitted at its level (the finer level is already frequent
    enough everywhere)                                   (isCutOff);
  * emitted object literal is the canonical interval string of
    operators/discretize.interval_literal; closed bounds; a value on a
    shared boundary goes to the FIRST interval (reference `find`).

Scale design: the predicate-neighbour graph, head sizes and hop-bounded
min/max run as DataFrame jobs; only the per-predicate VALUE HISTOGRAMS
(|distinct values| rows, metadata-scale) and the predicate table itself
are collected — the tree recursion is O(intervals) driver work, exactly
like the reference's in-memory builder. Interval assignment is ONE
broadcast range join over all predicates and levels (intervals are tiny),
so the data-scale cost is a single scan of the numeric triples.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.operators.discretize import interval_literal

LEVEL_SUFFIX = "#discretized_level_"


def predicate_neighbors(triples: DataFrame) -> DataFrame:
    """Symmetric (p, q) neighbour pairs: predicates sharing at least one
    entity on any side (neighboursSO/SS/OS/OO, TripleIndex.scala). Distinct
    (entity, predicate) incidence first, so a hub entity contributes at
    most |predicates|^2 pairs, not degree^2."""
    inc = (
        triples.select(F.col("s").alias("e"), "p")
        .unionByName(triples.select(F.col("o").alias("e"), "p"))
        .distinct()
    )
    pairs = (
        inc.join(inc.withColumnRenamed("p", "q"), "e")
        .where(F.col("p") != F.col("q"))
        .select("p", "q")
        .distinct()
    )
    return pairs


@dataclass
class AutoDiscretizationTask:
    """AutoDiscretizationTask (core:data/DiscretizationTask.scala:40-59)."""

    min_head_size: int = 100
    min_head_coverage: float = 0.01
    max_rule_length: int = 3
    arity: int = 2
    min_support_lower_bound_on: bool = True
    min_support_upper_bound_on: bool = True
    #: only these predicates (None = all)
    predicates: list[str] | None = None
    max_distinct: int = 2_000_000


def _support_bounds(
    triples: DataFrame, task: AutoDiscretizationTask
) -> dict[str, tuple[int, float]]:
    """{p: (minSupportLower, minSupportUpper)} via hop-bounded min/max
    propagation over the predicate-neighbour graph. Predicate count is
    schema-scale, so the propagation runs driver-side on the collected
    neighbour list (the reference walks the same in-memory graph)."""
    import math

    sizes = {
        r["p"]: r["n"]
        for r in triples.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    neigh: dict[str, set[str]] = {p: set() for p in sizes}
    for r in predicate_neighbors(triples).collect():
        neigh[r["p"]].add(r["q"])
    hops = task.max_rule_length - 1
    hc = task.min_head_coverage
    qualify = {p: n for p, n in sizes.items() if n >= task.min_head_size}
    out: dict[str, tuple[int, float]] = {}
    for p in sizes:
        # reachable predicates within `hops` (p itself included)
        seen = {p}
        frontier = {p}
        for _ in range(hops):
            frontier = {q for f in frontier for q in neigh[f]} - seen
            if not frontier:
                break
            seen |= frontier
        vals = [qualify[q] for q in seen if q in qualify]
        if task.min_support_lower_bound_on:
            lower = math.ceil(min(vals) * hc) if vals else None
        else:
            lower = 1
        if task.min_support_upper_bound_on:
            upper = math.ceil(max(vals) * hc) if vals else float("-inf")
        else:
            upper = float("inf")
        if lower is not None:
            out[p] = (max(lower, 1), upper)
    return out


def _tree_nodes(cum: list[tuple[float, int]], support: int, arity: int):
    """All tree nodes as (depth, lo_rank, hi_rank) over the cumulative
    value histogram; root = depth 0. Children recorded before cut-off /
    dedup decisions (those need the full structure)."""
    n = cum[-1][1]
    nodes: list[tuple[int, int, int]] = []

    def split(lo: int, hi: int, depth: int) -> None:
        nodes.append((depth, lo, hi))
        bounds = [lo + ((hi - lo) * j) // arity for j in range(arity + 1)]
        sizes = [bounds[j + 1] - bounds[j] for j in range(arity)]
        if min(sizes) >= support:
            for j in range(arity):
                split(bounds[j], bounds[j + 1], depth + 1)

    split(0, n, 0)
    return nodes


def _value_at(cum: list[tuple[float, int]], rank: int) -> float:
    import bisect

    i = bisect.bisect_right([c for _, c in cum], rank)
    return cum[i][0]


def auto_discretize(
    triples: DataFrame, task: AutoDiscretizationTask | None = None
) -> DataFrame:
    """New interval quads for every qualifying numeric predicate; union the
    result with the original triples to mine over them. Columns (s, p, o)."""
    task = task or AutoDiscretizationTask()
    spark = triples.sparkSession
    bounds = _support_bounds(triples, task)
    if task.predicates is not None:
        bounds = {p: b for p, b in bounds.items() if p in task.predicates}
    numeric = triples.select(
        "s", "p", F.col("o").try_cast("double").alias("v")
    ).where(F.col("v").isNotNull())
    hist_rows = (
        numeric.where(F.col("p").isin(*bounds.keys()) if bounds else F.lit(False))
        .groupBy("p", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    hists: dict[str, list[tuple[float, int]]] = {}
    for r in hist_rows:
        hists.setdefault(r["p"], []).append((r["v"], r["c"]))
    intervals: list[tuple[str, int, int, float, float]] = []
    for p, hist in hists.items():
        lower, upper = bounds[p]
        hist.sort()
        if len(hist) > task.max_distinct:
            raise ValueError(f"{p}: more than {task.max_distinct} distinct values")
        total = sum(c for _, c in hist)
        if total < lower:  # getNumericPredicates: numeric facts >= lower
            continue
        cum, acc = [], 0
        for v, c in hist:
            acc += c
            cum.append((v, acc))
        nodes = _tree_nodes(cum, lower, task.arity)
        # value intervals per node; children sorted under their parent
        by_depth: dict[int, list[tuple[int, int]]] = {}
        for d, lo, hi in nodes:
            by_depth.setdefault(d, []).append((lo, hi))
        val = {
            (lo, hi): (_value_at(cum, lo), _value_at(cum, hi - 1))
            for _, lo, hi in nodes
        }

        def children(d: int, lo: int, hi: int):
            return [
                (l2, h2)
                for l2, h2 in by_depth.get(d + 1, [])
                if lo <= l2 and h2 <= hi
            ]

        # removeDuplicitIntervals: drop children equal to their parent
        dropped: set[tuple[int, int]] = set()
        for d, lo, hi in sorted(nodes):
            for l2, h2 in children(d, lo, hi):
                if val[(l2, h2)] == val[(lo, hi)]:
                    dropped.add((l2, h2))

        def alive_children(d: int, lo: int, hi: int):
            return [c for c in children(d, lo, hi) if c not in dropped]

        for d, lo, hi in nodes:
            if d == 0 or (lo, hi) in dropped:
                continue
            kids = alive_children(d, lo, hi)
            cut = bool(kids) and all(h2 - l2 >= upper for l2, h2 in kids)
            if cut:
                continue
            vlo, vhi = val[(lo, hi)]
            intervals.append((p, d, len(intervals), vlo, vhi))
    if not intervals:
        return spark.createDataFrame(
            [], "s string, p string, o string"
        )
    idf = spark.createDataFrame(
        intervals, "p string, level int, bin int, lo double, hi double"
    )
    joined = numeric.join(
        F.broadcast(idf),
        ["p"],
    ).where((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
    # FIRST matching interval per (row, level) — reference `find`
    first = joined.groupBy("s", "p", "v", "level").agg(
        F.min_by(F.struct("bin", "lo", "hi"), "bin").alias("_iv")
    )
    return first.select(
        "s",
        F.concat(F.col("p"), F.lit(LEVEL_SUFFIX), F.col("level")).alias("p"),
        interval_literal(F.col("_iv.lo"), F.col("_iv.hi")).alias("o"),
    )
