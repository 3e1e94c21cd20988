"""Multi-graph mining + graph-aware rules.

Reference: Dataset = quads (s,p,o,g); mining runs over the distinct triple
projection of all graphs merged (AmieSpec.scala:401-416 "mine across two
graphs"); `graphAwareRules` (Ruleset.scala:160-170) re-attaches to every
atom the set of graphs its PREDICATE occurs in (toGraphAwareAtom /
TripleIndex.getGraphs — the two-graph pattern test reads
`thi.getGraphs(head.predicate)`, AmieSpec.scala:418-441). Graph-position
atom patterns (AtomPattern(graph=...)) filter rules by those per-predicate
graph sets.

The reference's own 400-rule two-graph golden needs the dbpedia.ttl fixture
that is stripped from this snapshot (.MISSING_LARGE_BLOBS); the semantics
here are pinned by a synthetic two-graph fixture (tests/test_multigraph.py)
plus the DuckDB oracle (registry `multigraph_mine`).

Scale: the per-predicate graph map is #predicates x #graphs rows —
broadcast-sized at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.mining.amie import MiningParams, mine


def quads_triples(quads: DataFrame) -> DataFrame:
    """Distinct triple projection of a quad dataset (merged graphs)."""
    return quads.select("s", "p", "o").distinct()


def mine_quads(quads: DataFrame, params: MiningParams | None = None) -> DataFrame:
    """Mine across all graphs of a quad dataset (Dataset.index + mine)."""
    return mine(quads_triples(quads), params)


def predicate_graphs(quads: DataFrame) -> DataFrame:
    """(p, graphs array<string> sorted) — the graphs each predicate occurs
    in (TripleIndex.getGraphs)."""
    return quads.groupBy("p").agg(
        F.array_sort(F.collect_set("g")).alias("graphs")
    )


def graph_aware_rules(rules: DataFrame, quads: DataFrame) -> DataFrame:
    """Attach per-atom graph sets: g_head for the head predicate, g1/g2 for
    the body atoms (null where the atom is absent) — Ruleset.scala:160-170."""
    pg = predicate_graphs(quads)
    out = rules.join(
        F.broadcast(pg.select(F.col("p"), F.col("graphs").alias("g_head"))),
        "p", "left",
    ).join(
        F.broadcast(pg.select(F.col("p").alias("q"), F.col("graphs").alias("g1"))),
        "q", "left",
    )
    if "r" in rules.columns:
        out = out.join(
            F.broadcast(
                pg.select(F.col("p").alias("r"), F.col("graphs").alias("g2"))
            ),
            "r", "left",
        )
    return out


def filter_by_graph(
    rules: DataFrame, quads: DataFrame, graph: str, mode: str = "only"
) -> DataFrame:
    """Graph-position atom patterns over ALL atoms of the rule
    (AtomPattern(graph=...) / OneOf / NoneOf):

      mode='only'     every atom's predicate occurs ONLY in `graph`
                      (the AmieSpec two-graph pattern outcome: each matched
                      rule's getGraphs == {yago});
      mode='contains' every atom's predicate occurs in `graph` (possibly
                      among others);
      mode='none'     no atom's predicate occurs in `graph` (NoneOf).
    """
    ga = graph_aware_rules(rules, quads)
    cols = [c for c in ("g_head", "g1", "g2") if c in ga.columns]

    def per_atom(c):
        col = F.col(c)
        if mode == "only":
            return col.isNull() | (col == F.array(F.lit(graph)))
        if mode == "contains":
            return col.isNull() | F.array_contains(col, graph)
        if mode == "none":
            return col.isNull() | ~F.array_contains(col, graph)
        raise ValueError(mode)

    cond = per_atom(cols[0])
    for c in cols[1:]:
        cond = cond & per_atom(c)
    return ga.where(cond).select(*rules.columns)
