"""Ruleset post-processing (reference core:ruleset/Ruleset.scala).

rule_similarity  pairwise rule similarity within head-predicate groups —
                 content similarity (shared body atoms, SimilarityCounting
                 .scala:18-142 AtomsSimilarityCounting) blended with measure
                 proximity (support/HC distance).
dbscan_clusters  DBSCAN over the similarity graph (DbScan.scala:10-57),
                 grouped by head predicate like makeClusters' default
                 (Ruleset.scala:230-245): epsilon-graph -> core points
                 (>= min_neighbours neighbours) -> connected components of
                 the core-core subgraph -> border points join a neighbouring
                 core's cluster; noise points get their own singleton id.
cba_prune        CBA data-coverage pruning (Ruleset.scala:123-149): walk
                 rules in priority order, keep a rule iff it predicts at
                 least one not-yet-covered head triple. Distributed form:
                 per predicted triple, the best-priority covering rule gets
                 the credit (window rank 1) — identical kept-set because
                 coverage only ever removes triples from later rules.
find_similar     k nearest rules to a given rule by the same similarity.

Scale notes:
  * pairwise similarity is confined to head-predicate groups (reference
    default `byHeadPredicate`) and capped by `max_group` top rules per
    group (the reference's own tests cluster top-500 only,
    RulesetSpec.scala:86) — the quadratic blowup is bounded by construction;
  * DBSCAN's transitive closure is the same iterative min-label propagation
    used for entity canonicalization (one implementation, two call sites);
  * cba_prune is two shuffles (predict join + window), no driver iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdfrules_spark.canonicalize import connected_components

RULE_KEY = ["p", "shape", "q", "d1", "r", "d2"]


def _rid(prefix: str = "") -> F.Column:
    return F.concat_ws(
        "|",
        *[F.coalesce(F.col(prefix + c).cast("string"), F.lit("-")) for c in
          ["p", "shape", "q", "d1", "r", "d2"]],
    )


def _atoms(prefix: str = "") -> F.Column:
    """Body atoms as a comparable set: {'q|d1', 'r|d2'} (null r dropped)."""
    a1 = F.concat_ws("|", F.col(prefix + "q").cast("string"), F.col(prefix + "d1"))
    a2 = F.when(
        F.col(prefix + "r").isNotNull(),
        F.concat_ws("|", F.col(prefix + "r").cast("string"), F.col(prefix + "d2")),
    )
    return F.array_distinct(F.filter(F.array(a1, a2), lambda x: x.isNotNull()))


def rule_similarity(
    rules: DataFrame,
    max_group: int = 500,
    content_weight: float = 0.5,
) -> DataFrame:
    """Pairwise (rid_a, rid_b, sim) within head-predicate groups, a < b.

    sim = content_weight * Jaccard(body atoms) +
          (1-content_weight) * (1 - |hc_a - hc_b|).
    """
    w = Window.partitionBy("p").orderBy(F.desc("head_coverage"), _rid())
    base = (
        rules.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_group)
        .select(
            "p", _rid().alias("rid"), _atoms().alias("atoms"),
            F.col("head_coverage").alias("hc"),
        )
    )
    a = base.select(
        "p", F.col("rid").alias("rid_a"), F.col("atoms").alias("atoms_a"),
        F.col("hc").alias("hc_a"),
    )
    b = base.select(
        "p", F.col("rid").alias("rid_b"), F.col("atoms").alias("atoms_b"),
        F.col("hc").alias("hc_b"),
    )
    inter = F.size(F.array_intersect("atoms_a", "atoms_b"))
    union = F.size(F.array_union("atoms_a", "atoms_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        a.join(b, "p")
        .where(F.col("rid_a") < F.col("rid_b"))
        .select(
            "p", "rid_a", "rid_b",
            (content_weight * jac
             + (1.0 - content_weight) * (1.0 - F.abs(F.col("hc_a") - F.col("hc_b"))))
            .alias("sim"),
        )
    )


def _dbscan_labels(
    sims: DataFrame, min_similarity: float, min_neighbours: int
) -> DataFrame:
    """(node, label) cluster labels from a pairwise-similarity relation
    (rid_a, rid_b, sim): epsilon-graph -> core points -> CC of the
    core-core subgraph -> border points adopt a neighbouring core's label.
    Nodes absent from the result are noise (callers give them singleton
    ids)."""
    # materialize the epsilon graph ONCE: the degree/core/border branches
    # below would each re-run the quadratic pair-similarity join otherwise
    # (the surviving edge set is tiny relative to the pair join)
    edges = (
        sims.where(F.col("sim") >= min_similarity)
        .select(F.col("rid_a").alias("a"), F.col("rid_b").alias("b"))
        .localCheckpoint(eager=True)
    )
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("_deg"))
    core = deg.where(F.col("_deg") >= min_neighbours).select(F.col("a").alias("n"))
    core_edges = (
        edges.join(core.withColumnRenamed("n", "a"), "a", "left_semi")
        .join(core.withColumnRenamed("n", "b"), "b", "left_semi")
    )
    cc = connected_components(core_edges.select("a", "b")).select(
        "node", F.col("canon").alias("label")
    )
    # singleton core points (core by degree but no core-core edge)
    lone_core = core.join(
        cc.select(F.col("node").alias("n")), "n", "left_anti"
    ).select(F.col("n").alias("node"), F.col("n").alias("label"))
    cc = cc.unionByName(lone_core)
    # border points: non-core with a core neighbour -> that core's cluster
    border = (
        sym.join(core.withColumnRenamed("n", "b"), "b", "left_semi")
        .join(core.withColumnRenamed("n", "a"), "a", "left_anti")
        .join(cc.withColumnRenamed("node", "b"), "b")
        .groupBy("a").agg(F.min("label").alias("label"))
        .select(F.col("a").alias("node"), "label")
    )
    return cc.unionByName(border)


def dbscan_clusters(
    rules: DataFrame,
    min_similarity: float = 0.5,
    min_neighbours: int = 1,
    max_group: int = 500,
) -> DataFrame:
    """rules + cluster id (reference Measure.Cluster). Noise = singleton."""
    sims = rule_similarity(rules, max_group=max_group)
    labels = _dbscan_labels(sims, min_similarity, min_neighbours)
    out = rules.withColumn("rid", _rid()).join(
        labels.withColumnRenamed("node", "rid"), "rid", "left"
    )
    return out.withColumn(
        "cluster", F.coalesce(F.col("label"), F.col("rid"))
    ).drop("label")


# -- reference-exact AllAtoms similarity over resolved rules -----------------

def _atom_sim(a: F.Column, b: F.Column) -> F.Column:
    """atomsSimilarity (SimilarityCounting.scala:45-61) over two resolved
    atom strings ('s|p|o', items '?v' or 'C=<const>'), range [0,3]:
    psim (1 if same predicate) + per-position item similarity — same
    predicate: var/var 1, var/const 0.5, const/const eq?1:0; different
    predicate: const/const eq?1:0, anything else 0."""
    pa, pb = F.split(a, r"\|", 3), F.split(b, r"\|", 3)
    same_p = F.get(pa, 1) == F.get(pb, 1)

    def item(x, y):
        xc, yc = x.startswith("C="), y.startswith("C=")
        ceq = F.when(x == y, F.lit(1.0)).otherwise(F.lit(0.0))
        return F.when(
            same_p,
            F.when(~xc & ~yc, F.lit(1.0))
            .when(xc & yc, ceq)
            .otherwise(F.lit(0.5)),
        ).otherwise(F.when(xc & yc, ceq).otherwise(F.lit(0.0)))

    return (
        F.when(same_p, F.lit(1.0)).otherwise(F.lit(0.0))
        + item(F.get(pa, 0), F.get(pb, 0))
        + item(F.get(pa, 2), F.get(pb, 2))
    )


#: bodies up to this many atoms are supported by all_atoms_similarity
#: (injective assignments are unrolled; 3 covers maxRuleLength 4)
MAX_SIM_BODY = 3


def all_atoms_similarity(
    head_a: F.Column, atoms_a: F.Column, head_b: F.Column, atoms_b: F.Column
) -> F.Column:
    """AllAtomsSimilarityCounting (SimilarityCounting.scala:41-110) as one
    JVM-side column expression: head-atom similarity + the best injective
    assignment of the shorter body's atoms onto the longer body's atoms,
    normalized by 3 * (shorter rule length incl. head). Assignments are
    unrolled for bodies up to MAX_SIM_BODY atoms."""
    import itertools

    na, nb = F.size(atoms_a), F.size(atoms_b)
    main = F.when(na > nb, atoms_a).otherwise(atoms_b)
    sec = F.when(na > nb, atoms_b).otherwise(atoms_a)
    n_sec, n_main = F.least(na, nb), F.greatest(na, nb)

    best = F.lit(0.0)
    for m in range(1, MAX_SIM_BODY + 1):
        for s in range(1, m + 1):
            cands = [
                sum(
                    (_atom_sim(F.get(main, i), F.get(sec, j))
                     for j, i in enumerate(perm)),
                    start=F.lit(0.0),
                )
                for perm in itertools.permutations(range(m), s)
            ]
            c = F.greatest(*cands) if len(cands) > 1 else cands[0]
            best = F.when((n_main == m) & (n_sec == s), c).otherwise(best)
    return (best + _atom_sim(head_a, head_b)) / ((n_sec + 1) * 3)


def _resolved_rid() -> F.Column:
    return F.concat_ws(
        "&", F.col("head"), F.concat_ws("^", F.col("atoms"))
    )


def resolved_rule_similarity(
    rules: DataFrame, max_group: int = 500
) -> DataFrame:
    """Pairwise (rid_a, rid_b, sim) within head-predicate groups over the
    resolved schema (head, atoms, head_coverage), using the reference's
    exact AllAtoms similarity. Top ``max_group`` rules per group by head
    coverage bound the quadratic pair join (the reference's own spec
    clusters top-500 only, RulesetSpec.scala:86)."""
    hp = F.get(F.split(F.col("head"), r"\|", 3), 1)
    base = rules.select(
        hp.alias("hp"), _resolved_rid().alias("rid"), "head", "atoms",
        "head_coverage",
    )
    w = Window.partitionBy("hp").orderBy(F.desc("head_coverage"), "rid")
    base = base.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= max_group
    )
    a = base.select(
        "hp", F.col("rid").alias("rid_a"), F.col("head").alias("head_a"),
        F.col("atoms").alias("atoms_a"),
    )
    b = base.select(
        "hp", F.col("rid").alias("rid_b"), F.col("head").alias("head_b"),
        F.col("atoms").alias("atoms_b"),
    )
    return (
        a.join(b, "hp")
        .where(F.col("rid_a") < F.col("rid_b"))
        .select(
            "rid_a", "rid_b",
            all_atoms_similarity(
                F.col("head_a"), F.col("atoms_a"),
                F.col("head_b"), F.col("atoms_b"),
            ).alias("sim"),
        )
    )


def dbscan_clusters_resolved(
    rules: DataFrame,
    min_similarity: float = 0.9,
    min_neighbours: int = 5,
    max_group: int = 500,
) -> DataFrame:
    """makeClusters(DbScan()) with the reference's defaults
    (DbScan.scala:86 minNeighbours=5 minSimilarity=0.9, Rule.scala:112
    AllAtomsSimilarityCounting, grouped by head predicate) over resolved
    (head, atoms) rules. Set-oriented epsilon-graph DBSCAN — cluster
    MEMBERSHIP can differ from the reference's order-dependent greedy
    expansion on border points, but core connectivity is identical; noise
    points get singleton cluster ids."""
    # materialize once: rules is usually a lazy mining DAG and is read by
    # both pair-join sides, the degree/label graph, and the final join
    rules = rules.localCheckpoint(eager=True)
    sims = resolved_rule_similarity(rules, max_group)
    labels = _dbscan_labels(sims, min_similarity, min_neighbours)
    out = rules.withColumn("rid", _resolved_rid()).join(
        labels.withColumnRenamed("node", "rid"), "rid", "left"
    )
    return out.withColumn(
        "cluster", F.coalesce(F.col("label"), F.col("rid"))
    ).drop("label")


def cba_prune(
    predictions: DataFrame,
    rules: DataFrame,
    only_existing: bool = True,
) -> DataFrame:
    """Keep rules that cover >= 1 new head triple in priority order.

    `predictions` = predict_triples() output (s,p,o + rule key + result);
    priority = default measure ordering (Measure.scala:144-154): higher
    cwa_confidence, then head_coverage, then support, ties broken by rid.

    The priority rank uses the per-partition-offset global rank (VERDICT
    r01: a bare Window.orderBy funnels every rule through ONE task — fine
    at 10^3 rules, a bottleneck at the reference's task13 1.8M-rule scale).
    """
    from rdfrules_spark.operators.shrink import with_global_rank

    pri = with_global_rank(
        rules.select(
            *RULE_KEY, "cwa_confidence", "head_coverage", "support"
        ),
        F.desc(F.coalesce(F.col("cwa_confidence"), F.lit(0.0))),
        F.desc("head_coverage"), F.desc("support"), _rid(),
        rank_col="_pri",
    ).select(*RULE_KEY, "_pri")
    preds = predictions
    if only_existing:
        preds = preds.where(F.col("result") == "Positive")
    ren = pri
    for k in RULE_KEY:
        ren = ren.withColumnRenamed(k, "_" + k)
    cond = None
    for k in RULE_KEY:
        c = F.col(k).eqNullSafe(F.col("_" + k))
        cond = c if cond is None else cond & c
    j = preds.join(ren, cond).drop(*["_" + k for k in RULE_KEY])
    w = Window.partitionBy("s", "p", "o").orderBy("_pri")
    credited = (
        j.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(*RULE_KEY).distinct()
    )
    ren2 = credited
    for k in RULE_KEY:
        ren2 = ren2.withColumnRenamed(k, "_" + k)
    cond2 = None
    for k in RULE_KEY:
        c = F.col(k).eqNullSafe(F.col("_" + k))
        cond2 = c if cond2 is None else cond2 & c
    return rules.join(ren2, cond2, "left_semi")


def find_similar(
    rules: DataFrame, rule_row: dict, k: int = 10, dissimilar: bool = False
) -> DataFrame:
    """k most (dis)similar rules to `rule_row` (same head predicate group)."""
    spark = rules.sparkSession
    one = spark.createDataFrame(
        [tuple(rule_row.get(c) for c in RULE_KEY) + (rule_row["head_coverage"],)],
        "p string, shape string, q string, d1 string, r string, d2 string, "
        "head_coverage double",
    )
    # cast key columns to match rules dtypes
    for c in RULE_KEY + ["head_coverage"]:
        one = one.withColumn(c, F.col(c).cast(dict(rules.dtypes)[c]))
    target = one.select(
        "p", _rid().alias("rid_t"), _atoms().alias("atoms_t"),
        F.col("head_coverage").alias("hc_t"),
    )
    cand = rules.select(
        "p", _rid().alias("rid"), _atoms().alias("atoms"),
        F.col("head_coverage").alias("hc"),
    )
    inter = F.size(F.array_intersect("atoms", "atoms_t"))
    union = F.size(F.array_union("atoms", "atoms_t"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    sims = (
        cand.join(F.broadcast(target), "p")
        .where(F.col("rid") != F.col("rid_t"))
        .select(
            "rid",
            (0.5 * jac + 0.5 * (1.0 - F.abs(F.col("hc") - F.col("hc_t"))))
            .alias("sim"),
        )
    )
    order = F.asc("sim") if dissimilar else F.desc("sim")
    return sims.orderBy(order, "rid").limit(k)


def find_similar_resolved(
    rules: DataFrame,
    head: str,
    atoms: list[str],
    k: int = 10,
    dissimilar: bool = False,
) -> DataFrame:
    """Ruleset.findSimilar / findDissimilar (Ruleset.scala:247-268) over
    resolved (head, atoms) rules with the reference's implicit AllAtoms
    similarity (Rule.scala:112): a one-vs-all scan — no head-predicate
    grouping, unlike makeClusters — ordered by similarity (ascending for
    dissimilar), the target rule itself excluded. The target is a literal,
    so this is a single narrow map over the ruleset + a top-k."""
    target_head = F.lit(head)
    target_atoms = F.array(*[F.lit(a) for a in atoms])
    sim = all_atoms_similarity(
        F.col("head"), F.col("atoms"), target_head, target_atoms
    )
    t_rid = head + "&" + "^".join(atoms)
    out = rules.withColumn("sim", sim).where(_resolved_rid() != F.lit(t_rid))
    order = F.asc("sim") if dissimilar else F.desc("sim")
    return out.orderBy(order, _resolved_rid()).limit(k)


def instantiate_rules(rules: DataFrame, triples: DataFrame) -> DataFrame:
    """InstantiatedRuleset (Ruleset.scala:222-224,
    prediction/Instantiation.scala:59-80): expand every rule to its concrete
    variable bindings. Output rows carry the rule key + the binding of each
    variable (?a, ?b and — for the 3-variable shape — ?c; null otherwise).
    One job per shape over the same body joins the miner uses."""
    from rdfrules_spark.mining.amie import _b

    b = _b(triples)
    out = None
    for shape in ("l2", "l3v2", "l3v3"):
        shaped = rules.where(F.col("shape") == shape).select(*RULE_KEY)
        if shape == "l2":
            inst = shaped.join(
                b.withColumnRenamed("q", "_q").withColumnRenamed("d", "_d"),
                (F.col("q") == F.col("_q")) & (F.col("d1") == F.col("_d")),
            ).select(
                *RULE_KEY, F.col("x").alias("va"), F.col("y").alias("vb"),
                F.lit(None).cast(dict(triples.dtypes)["s"]).alias("vc"),
            )
        elif shape == "l3v2":
            b1 = b.select(F.col("x").alias("va"), F.col("y").alias("vb"),
                          F.col("q").alias("_q1"), F.col("d").alias("_d1"))
            b2 = b.select(F.col("x").alias("va"), F.col("y").alias("vb"),
                          F.col("q").alias("_q2"), F.col("d").alias("_d2"))
            inst = shaped.join(
                b1, (F.col("q") == F.col("_q1")) & (F.col("d1") == F.col("_d1"))
            ).join(b2, ["va", "vb"]).where(
                (F.col("r") == F.col("_q2")) & (F.col("d2") == F.col("_d2"))
            ).select(
                *RULE_KEY, "va", "vb",
                F.lit(None).cast(dict(triples.dtypes)["s"]).alias("vc"),
            )
        else:
            b1 = b.select(F.col("x").alias("va"), F.col("y").alias("vc"),
                          F.col("q").alias("_q1"), F.col("d").alias("_d1"))
            b2 = b.select(F.col("x").alias("vb"), F.col("y").alias("vc"),
                          F.col("q").alias("_q2"), F.col("d").alias("_d2"))
            inst = shaped.join(
                b1, (F.col("q") == F.col("_q1")) & (F.col("d1") == F.col("_d1"))
            ).join(b2, "vc").where(
                (F.col("r") == F.col("_q2")) & (F.col("d2") == F.col("_d2"))
            ).select(*RULE_KEY, "va", "vb", "vc")
        inst = inst.drop(*[c for c in inst.columns if c.startswith("_")])
        out = inst if out is None else out.unionByName(inst)
    return out


def rule_parents(rules: DataFrame) -> DataFrame:
    """Rule lattice edges (ruleset/ops/Treeable.scala:14-60): (child, parent)
    where the parent is a CLOSED rule over the same head whose body atoms
    are a subset of the child's. For the L<=3 schema the closed sub-rules
    of an l3v2 rule are the two l2 rules over its atoms; l2 and l3v3 rules
    have no closed proper sub-rule."""
    l2 = rules.where(F.col("shape") == "l2").select(
        F.col("p").alias("_pp"), F.col("q").alias("_pq"),
        F.col("d1").alias("_pd"),
    )
    child = rules.where(F.col("shape") == "l3v2")
    via_first = child.join(
        l2,
        (F.col("p") == F.col("_pp")) & (F.col("q") == F.col("_pq"))
        & (F.col("d1") == F.col("_pd")),
    )
    via_second = child.join(
        l2,
        (F.col("p") == F.col("_pp")) & (F.col("r") == F.col("_pq"))
        & (F.col("d2") == F.col("_pd")),
    )
    edges = via_first.unionByName(via_second).select(
        *[F.col(c).alias("child_" + c) for c in RULE_KEY],
        F.col("_pp").alias("parent_p"),
        F.lit("l2").alias("parent_shape"),
        F.col("_pq").alias("parent_q"),
        F.col("_pd").alias("parent_d1"),
    )
    return edges.distinct()


# -- TreeBasedDbScan (hierarchical online clustering) -------------------------

def _py_atom_sim(a: str, b: str) -> float:
    """atomsSimilarity (SimilarityCounting.scala:46-61) over resolved atom
    strings 's|p|o' (items '?v' or 'C=<const>') — Python twin of the column
    expression `_atom_sim` above, for the inherently-sequential tree
    insertion below."""
    sa, pa, oa = a.split("|", 2)
    sb, pb, ob = b.split("|", 2)
    same_p = pa == pb

    def item(x: str, y: str) -> float:
        xc, yc = x.startswith("C="), y.startswith("C=")
        if same_p:
            if not xc and not yc:
                return 1.0
            if xc and yc:
                return 1.0 if x == y else 0.0
            return 0.5
        return 1.0 if (xc and yc and x == y) else 0.0

    return (1.0 if same_p else 0.0) + item(sa, sb) + item(oa, ob)


def _py_all_atoms_sim(rule_a, rule_b) -> float:
    """AllAtomsSimilarityCounting.apply (SimilarityCounting.scala:63-110):
    head similarity + the best injective assignment of the SHORTER body
    onto the longer one, normalized by 3 * (shorter rule length)."""
    import itertools

    (ha, ba), (hb, bb) = rule_a, rule_b
    if len(ba) > len(bb):
        main, sec, hm, hs = ba, bb, ha, hb
    else:
        main, sec, hm, hs = bb, ba, hb, ha
    max_matches = (len(sec) + 1) * 3
    head_sim = _py_atom_sim(hm, hs)
    best = max(
        sum(_py_atom_sim(main[i], sec[j]) for j, i in enumerate(perm))
        for perm in itertools.permutations(range(len(main)), len(sec))
    )
    return (best + head_sim) / max_matches


class _TreeCluster:
    """One node of the TreeBasedDbScan tree (TreeBasedDbScan.scala): a
    cluster with a main element, gathered members, and `arity` child
    cluster slots."""

    __slots__ = ("main", "elems", "children")

    def __init__(self, main, arity: int):
        self.main = main
        self.elems: list = []
        self.children: list = [None] * arity

    def similarity(self, elem, deep_sim: bool, sim) -> float:
        s = sim(self.main[1], elem[1])
        if deep_sim and self.elems:
            return max(s, max(sim(e[1], elem[1]) for e in self.elems))
        return s


def _tree_insert(children, elem, arity, threshold, deep_sim, sim):
    """Node.recAddToChildren: pick the max-similarity child slot (an empty
    slot scores exactly `threshold`; Scala maxBy keeps the FIRST maximum),
    create/join/descend."""
    while True:
        best_i, best_s = 0, None
        for i in range(arity):
            child = children[i]
            s = threshold if child is None else child.similarity(
                elem, deep_sim, sim
            )
            if best_s is None or s > best_s:
                best_i, best_s = i, s
        child = children[best_i]
        if child is None:
            children[best_i] = _TreeCluster(elem, arity)
            return
        if best_s >= threshold:
            child.elems.append(elem)
            return
        children = child.children


def _tree_clusters(children):
    """Node.clusters: stack-of-iterators DFS over the cluster tree,
    yielding each cluster's element list (main first)."""
    stack = [[c for c in children if c is not None]]
    pos = [0]
    while stack:
        level, i = stack[-1], pos[-1]
        if i >= len(level):
            break  # mirrors the Scala iterator's hasNext-on-top-only law
        cluster = level[i]
        pos[-1] += 1
        yield [cluster.main] + cluster.elems
        if pos[-1] >= len(stack[-1]):
            stack.pop()
            pos.pop()
        kids = [c for c in cluster.children if c is not None]
        if kids:
            stack.append(kids)
            pos.append(0)


#: tree clustering is inherently sequential (online insertion) and runs
#: driver-side like the reference's in-memory IndexedSeq — bound it loudly
MAX_TREE_RULES = 100_000


def tree_dbscan_clusters_resolved(
    rules: DataFrame,
    arity: int = 2,
    min_similarity: float = 0.8,
    deep_sim: bool = False,
    grouped_by_head: bool = True,
    order_cols: list | None = None,
    max_rules: int = MAX_TREE_RULES,
) -> DataFrame:
    """makeClusters(TreeBasedDbScan()) (TreeBasedDbScan.scala, defaults
    arity=2 simThreshold=0.8 deepSim=false; AllAtoms similarity,
    Rule.scala:112; grouped by head predicate, Ruleset.scala:230-245):
    ONLINE hierarchical insertion — each rule goes to the most-similar
    child cluster of the current node (empty slot counts simThreshold),
    joining it when similarity >= threshold, else descending. The result is
    ORDER-DEPENDENT by construction, so insertion order is pinned by
    ``order_cols`` (default: head_coverage DESC then head, atoms — the
    reference clusters its sorted in-memory ruleset).

    Scale: the algorithm is sequential by definition (the reference runs it
    on a driver-side IndexedSeq too); this collects at most ``max_rules``
    rules (loud ValueError past that) and joins the labels back
    broadcast-style. Cluster ids are deterministic: DFS order within each
    head-predicate group, groups in lexicographic head order."""
    cols = rules.columns
    if order_cols is None:
        order = (
            [F.desc("head_coverage")] if "head_coverage" in cols else []
        ) + [F.col("head"), F.col("atoms")]
    else:
        order = [F.col(c) for c in order_cols]
    n = rules.count()
    if n > max_rules:
        raise ValueError(
            f"tree_dbscan_clusters_resolved: {n} rules > max_rules="
            f"{max_rules}; tree clustering is sequential — shrink the "
            "ruleset (e.g. topK) or raise max_rules explicitly"
        )
    rows = (
        rules.withColumn("rid", _resolved_rid())
        .select("rid", "head", "atoms", *[c for c in cols if c not in
                                          ("head", "atoms")])
        .orderBy(*order)
        .collect()
    )
    sim = _py_all_atoms_sim
    groups: dict[str, list] = {}
    for r in rows:
        key = r["head"].split("|")[1] if grouped_by_head else ""
        groups.setdefault(key, []).append(
            (r["rid"], (r["head"], tuple(r["atoms"])))
        )
    labels: dict[str, int] = {}
    next_id = 0
    for key in sorted(groups):
        children = [None] * arity
        for elem in groups[key]:
            _tree_insert(children, elem, arity, min_similarity, deep_sim, sim)
        for cluster in _tree_clusters(children):
            for rid, _ in cluster:
                # first assignment wins (rids are unique per canonical rule)
                labels.setdefault(rid, next_id)
            next_id += 1
    spark = rules.sparkSession
    label_df = spark.createDataFrame(
        list(labels.items()), "rid string, cluster long"
    )
    return rules.withColumn("rid", _resolved_rid()).join(
        F.broadcast(label_df), "rid", "left"
    )
