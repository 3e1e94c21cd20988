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
here are pinned three ways: a synthetic two-graph fixture
(tests/test_multigraph_quasi_anytime.py), the DuckDB oracle (registry
`multigraph_l2_rules`), and rule-for-rule parity against the EXECUTED
reference on a derived yago+graph2 union — 139 var-only + 4,567
object-constants rules with per-atom graph sets, incl. the
position-restricted sets of instantiated atoms (graph_aware_atoms below;
tests/test_refexec_parity.py::test_multigraph_*, fixtures built by
tools/refexec/make_graph2.py + MineHarness --graph2 --graphaware).

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

def graph_aware_atoms(rules: DataFrame, quads: DataFrame) -> DataFrame:
    """Per-atom graph sets for INSTANTIATED rules (constants miner schema:
    ``head`` = 'term|p|term', ``atoms`` = array<string>, terms '?x' or
    'C=value'), with the reference's position-restricted semantics
    (Atom.toGraphAwareAtom, rule/Atom.scala:34-43):

      var  p var    -> getGraphs(p)                   key  P|p
      C=c  p var    -> getGraphs(p, Subject(c))       key  S|p|c
      var  p C=c    -> getGraphs(p, Object(c))        key  O|p|c
      C=s  p C=o    -> getGraphs(s, p, o)             key  T|s|p|o

    Adds ``head_graphs`` (array<string>, sorted) and ``atom_graphs``
    (array<array<string>> aligned with ``atoms``).

    Scale: the key->graphs table is <= 4x|quads| rows built by ONE groupBy
    (map-side combined; graph sets per key are tiny); the attach is a
    posexplode + one equi-join on the key + a regroup by the rule columns —
    no quad-side explosion, AQE splits skewed predicate keys.
    """
    key_graphs = (
        quads.select(F.concat_ws("|", F.lit("P"), "p").alias("k"), "g")
        .union(quads.select(F.concat_ws("|", F.lit("S"), "p", "s"), "g"))
        .union(quads.select(F.concat_ws("|", F.lit("O"), "p", "o"), "g"))
        .union(quads.select(F.concat_ws("|", F.lit("T"), "s", "p", "o"), "g"))
        .groupBy("k")
        .agg(F.array_sort(F.collect_set("g")).alias("graphs"))
    )

    def atom_key(atom):
        t = F.split(atom, r"\|")
        su, q, ob = t[0], t[1], t[2]
        s_const = su.startswith("C=")
        o_const = ob.startswith("C=")
        s_val = F.substring(su, 3, 1 << 20)
        o_val = F.substring(ob, 3, 1 << 20)
        return (
            F.when(s_const & o_const,
                   F.concat_ws("|", F.lit("T"), s_val, q, o_val))
            .when(s_const, F.concat_ws("|", F.lit("S"), q, s_val))
            .when(o_const, F.concat_ws("|", F.lit("O"), q, o_val))
            .otherwise(F.concat_ws("|", F.lit("P"), q))
        )

    exploded = (
        rules.select(
            "head", "atoms",
            F.posexplode(F.concat(F.array(F.col("head")), F.col("atoms")))
            .alias("pos", "_atom"),
        )
        .withColumn("k", atom_key(F.col("_atom")))
        .join(key_graphs, "k", "left")
        .groupBy("head", "atoms")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "graphs"))),
                lambda x: x["graphs"],
            ).alias("_g")
        )
        .select(
            "head", "atoms",
            F.col("_g")[0].alias("head_graphs"),
            F.slice(F.col("_g"), 2, F.size("_g") - 1).alias("atom_graphs"),
        )
    )
    return rules.join(exploded, ["head", "atoms"])
