"""Stage 3: entity canonicalization — distributed connected components.

Spark analog of RDFRules' owl:sameAs resolution (reference
core:index/TripleItemHashIndex.scala:68-82 aliases the object id to the
subject id; core:index/TripleHashIndex.scala:258-304 rewrites all facts).
Semantics here: every connected component of the sameAs edge graph collapses
to its minimum member (min-lexicographic == the reference's subject-side
canonical under our grammar, see reference_extractor.py).

Algorithm: iterative min-label propagation + pointer jumping (label
shortcutting), O(log n) rounds on long chains, 1-2 rounds on the star-shaped
alias clusters this pipeline produces. Scale notes:
  * the min() aggregation does map-side partial aggregation, so celebrity
    nodes (Zipf skew) never concentrate raw edges on one reducer;
  * each round is localCheckpoint()ed — truncates lineage so plans stay
    constant-size across iterations (the classic iterative-algorithm trap);
  * convergence is detected with a cheap count of changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(pairs) -> list[tuple[str, str]]:
    """Union-find with path compression over collected (src, dst) pairs;
    -> [(node, component_min)] — identical semantics to the distributed
    min-label propagation (component representative = lexicographic min)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comp_min: dict[str, str] = {}
    nodes = set(parent)
    for s, d in pairs:
        nodes.add(s)
        nodes.add(d)
    roots = {n: find(n) for n in nodes}
    for n, r in roots.items():
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return [(n, comp_min[r]) for n, r in roots.items()]


def _driver_cc_numpy(src, dst):
    """Vectorized driver-side CC: same (node, component-min) semantics as
    :func:`_driver_union_find` but in numpy — min-label propagation with
    pointer jumping over integer codes (``pd.factorize`` codes are
    first-occurrence order, so a final rank-by-string stage maps the
    component-min CODE to the lexicographic-min node). ~10x the pure-Python
    union-find (3.2 s -> ~0.3 s at 600k edges), which was the single
    largest serial (non-scaling) component of the KG pipeline."""
    import numpy as np
    import pandas as pd

    codes, nodes = pd.factorize(np.concatenate([src, dst]))
    nodes = np.asarray(nodes, dtype=object)
    n = len(nodes)
    e_src = codes[: len(src)]
    e_dst = codes[len(src):]
    # symmetric closure; sort the edge list by source ONCE so every
    # round's grouped neighbour-min is an O(E) reduceat over presorted
    # runs (np.minimum.at is an order of magnitude slower)
    a = np.concatenate([e_src, e_dst])
    b = np.concatenate([e_dst, e_src])
    order = np.argsort(a, kind="stable")
    a_sorted = a[order]
    b_sorted = b[order]
    starts = np.flatnonzero(
        np.r_[True, a_sorted[1:] != a_sorted[:-1]]
    )
    group_keys = a_sorted[starts]
    lab = np.arange(n)
    while True:
        gmin = np.minimum.reduceat(lab[b_sorted], starts)
        new = lab.copy()
        np.minimum(new[group_keys], gmin, out=gmin)
        new[group_keys] = gmin
        # pointer jumping (label <- label(label)), a few hops per round
        for _ in range(3):
            new = new[new]
        if np.array_equal(new, lab):
            break
        lab = new
    # factorize codes are hash-ordered, so the converged per-component min
    # CODE is arbitrary — pick the representative as the lexicographic min
    # node string per component. Rank strings once via a fixed-width
    # numpy sort (C memcmp; same code-point order as Python str — the
    # \0 padding of shorter strings sorts first, preserving prefix<longer),
    # then the per-component min is an int reduceat (a pandas groupby.min
    # on object strings measured 4 s alone at 500k nodes).
    nodes_u = np.asarray(nodes, dtype=str)
    str_order = np.argsort(nodes_u, kind="stable")
    str_rank = np.empty(n, dtype=np.int64)
    str_rank[str_order] = np.arange(n)
    lab_order = np.argsort(lab, kind="stable")
    lab_sorted = lab[lab_order]
    starts2 = np.flatnonzero(
        np.r_[True, lab_sorted[1:] != lab_sorted[:-1]]
    )
    min_rank = np.minimum.reduceat(str_rank[lab_order], starts2)
    rep_idx = np.empty(n, dtype=np.int64)
    rep_idx[lab_sorted[starts2]] = str_order[min_rank]
    return pd.DataFrame({"node": nodes, "canon": nodes[rep_idx[lab]]})


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    a: str = "a",
    b: str = "b",
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """-> canon_map(node, canon) for every node that appears in ``edges``.

    Nodes in singleton components (no edges) are absent: callers coalesce.

    Adaptive: a sameAs graph of <= ``driver_threshold`` edges (one count
    over the — usually already materialized — input) is solved with exact
    union-find on the driver in one job: the iterative distributed rounds
    cost 4-5 job barriers EACH, pure serial latency that dominated the
    pipeline's scaling profile while the edge set was a few 100k rows
    (~1-2%% of statements). Past the gate (the 100 TB posture: billions of
    owl:sameAs links) the distributed min-label-propagation loop below
    runs unchanged. Same adaptivity argument as AQE's runtime re-planning;
    both paths produce the identical (node, component-min) map."""
    # materialize the (small relative to the fact stream) edge set ONCE:
    # the path decision (count), the driver collect, and the distributed
    # loop's symmetric-closure seed all read the checkpoint — the upstream
    # relation is scanned exactly once. (A limit(T+1).collect() probe was
    # measured SLOWER here: CollectLimit evaluates partition batches
    # serially — 1, 4, 16, ... — while this is one fully-parallel pass.)
    # distinct() BEFORE materializing: sameAs evidence repeats heavily
    # (every aka mention of the same alias pair is one edge — ~8x
    # duplication under the alias grammar, worse at web scale), and CC
    # only needs the edge SET. The dedup is a parallel map-side-combined
    # shuffle; everything serial downstream (the driver collect + numpy
    # CC) shrinks by the duplication factor.
    edges2 = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if driver_threshold > 0 and edges2.count() <= driver_threshold:
        spark = edges.sparkSession
        # Arrow collect (toPandas) + vectorized numpy CC: the row-object
        # .collect() + pure-Python union-find pair cost ~4-5 s serial at
        # 600k edges — the pipeline's largest non-scaling component.
        pdf_in = edges2.toPandas()
        if pdf_in.empty:
            return spark.createDataFrame([], "node string, canon string")
        pdf = _driver_cc_numpy(
            pdf_in["src"].to_numpy(dtype=object),
            pdf_in["dst"].to_numpy(dtype=object),
        )
        # Arrow-path createDataFrame + eager checkpoint: the map feeds two
        # broadcast joins downstream (s-side, o-side); a plain LocalRelation
        # would re-pickle the whole list from the driver per broadcast
        # exchange, while a checkpointed relation broadcasts from block-
        # manager blocks (and the Arrow conversion is ~10x the pickle path)
        return spark.createDataFrame(pdf).localCheckpoint(eager=True)
    sym = (
        edges2.unionAll(
            edges2.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min over neighbours' labels (map-side combine keeps skew off reducers)
        neigh = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        prop = (
            labels.join(neigh, "node", "left")
            .select(
                "node", F.col("label").alias("old"),
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
            )
        )
        # pointer jumping: label <- label(label); the old label rides along
        # so convergence needs NO second join+count job per round — one
        # materialization plus a take(1) probe (early-exits on first hit)
        jump = (
            prop.join(
                prop.select(
                    F.col("node").alias("label"), F.col("label").alias("label2")
                ),
                "label",
                "left",
            )
            .select("node", "old", F.coalesce("label2", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = bool(
            jump.where(F.col("label") != F.col("old")).take(1)
        )
        labels = jump.drop("old")
        if not changed:
            break
    return labels.select("node", F.col("label").alias("canon"))


def canonicalize_triples(
    relations: DataFrame, sameas: DataFrame, rewrite_predicates: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Rewrite s and o (and optionally p — reference merges predicate ids
    through the same dictionary, e.g. `<p> owl:sameAs <x>` in
    sameastest.tsv) of ``relations(doc_id?, s, p, o)`` through the canon
    map built from ``sameas(a, b)``. Returns (canonical_relations,
    canon_map). Canonical representative = component minimum (deterministic;
    the reference's subject-side-wins pick is insertion-order-dependent —
    counts and component structure are identical)."""
    canon = connected_components(sameas)
    s_map = canon.select(F.col("node").alias("s"), F.col("canon").alias("s_canon"))
    o_map = canon.select(F.col("node").alias("o"), F.col("canon").alias("o_canon"))
    out = relations.join(s_map, "s", "left").join(o_map, "o", "left")
    p_col = F.col("p")
    if rewrite_predicates:
        p_map = canon.select(
            F.col("node").alias("p"), F.col("canon").alias("p_canon")
        )
        out = out.join(p_map, "p", "left")
        p_col = F.coalesce("p_canon", "p")
    out = out.select(
        *[c for c in relations.columns if c not in ("s", "p", "o")],
        F.coalesce("s_canon", "s").alias("s"),
        p_col.alias("p"),
        F.coalesce("o_canon", "o").alias("o"),
    )
    return out, canon
