"""Rule confidence measures (reference core:algorithm/amie/RuleCounting.scala;
definitions README.md:227-241):

  CWA confidence  = support / bodySize
  PCA confidence  = support / pcaBodySize, where pcaBodySize counts only
                    body bindings whose head entity on the predicate's
                    higherCardinalitySide exists for that predicate
                    (RuleCounting.scala:235-296; side per
                    core:index/TripleIndex.scala:155-169)

bodySize = #distinct (?a,?b) bindings of the body alone. The reference caps
counting at support/minConf+1 (perf trick, RuleCounting.scala:79-83); we
compute exact counts but only for the rules that survived mining — the
body-pair joins are semi-filtered by the surviving (q,d1,r,d2) combos, so
the heavy path join never runs for pruned rules.

Join discipline: every rule-key join goes through _combo_join, which renames
the right side's key columns before the null-safe equi-join. Joining two
DataFrames that share rule-table lineage on `left[k] == right[k]` silently
degenerates (Spark resolves both sides to one attribute -> trivially-true
predicate -> broadcast nested loop); the rename keeps the attributes
distinct so Catalyst plans a proper hash join.

`confidences()` computes CWA + PCA in ONE pass: body pairs per shape are
materialized once (cached) and both sizes are derived from them — halves
the dominant path-join cost vs calling the two functions separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.mining.amie import _b

COMBO = ["q", "d1", "r", "d2"]


def _combo_join(
    left: DataFrame, right: DataFrame, keys: list[str],
    how: str = "inner", broadcast_right: bool = False,
) -> DataFrame:
    """Null-safe equi-join with the right side's keys renamed first (see
    module docstring)."""
    ren = right
    for k in keys:
        ren = ren.withColumnRenamed(k, "_" + k)
    if broadcast_right:
        ren = F.broadcast(ren)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col("_" + k))
        cond = c if cond is None else cond & c
    return left.join(ren, cond, how).drop(*["_" + k for k in keys])


def _body_rel(
    triples: DataFrame, rules: DataFrame, shape: str,
    injective: bool = False,
) -> DataFrame:
    """Raw (?a,?b) body bindings per surviving rule combo of a shape
    (NOT deduplicated — callers either .distinct() for the pair relation
    or aggregate countDistinct for sizes)."""
    b = _b(triples)
    combos = rules.where(F.col("shape") == shape).select(*COMBO).distinct()
    if shape == "l2":
        bb = _combo_join(
            b.withColumnRenamed("d", "d1"),
            combos.select("q", "d1"), ["q", "d1"], broadcast_right=True,
        )
        if injective:
            bb = bb.where(F.col("x") != F.col("y"))
        p_type = dict(triples.dtypes)["p"]
        return bb.select(
            "q", "d1", F.lit(None).cast(p_type).alias("r"),
            F.lit(None).cast("string").alias("d2"),
            F.col("x").alias("a"), F.col("y").alias("b"),
        )
    if shape == "l3v2":
        b1 = _combo_join(
            b.select(F.col("x").alias("a"), F.col("y").alias("b"),
                     "q", F.col("d").alias("d1")),
            combos.select("q", "d1").distinct(), ["q", "d1"],
            broadcast_right=True,
        )
        b2 = _combo_join(
            b.select(F.col("x").alias("a"), F.col("y").alias("b"),
                     F.col("q").alias("r"), F.col("d").alias("d2")),
            combos.select("r", "d2").distinct(), ["r", "d2"],
            broadcast_right=True,
        )
        j = _combo_join(b1.join(b2, ["a", "b"]), combos, COMBO,
                        broadcast_right=True)
        if injective:
            j = j.where(F.col("a") != F.col("b"))
        return j.select(*COMBO, "a", "b")
    if shape == "l3v3":
        b1 = _combo_join(
            b.select(F.col("x").alias("a"), F.col("y").alias("c"),
                     "q", F.col("d").alias("d1")),
            combos.select("q", "d1").distinct(), ["q", "d1"],
            broadcast_right=True,
        )
        b2 = _combo_join(
            b.select(F.col("x").alias("b"), F.col("y").alias("c"),
                     F.col("q").alias("r"), F.col("d").alias("d2")),
            combos.select("r", "d2").distinct(), ["r", "d2"],
            broadcast_right=True,
        )
        j = _combo_join(b1.join(b2, "c"), combos, COMBO, broadcast_right=True)
        if injective:
            j = j.where(
                (F.col("a") != F.col("b"))
                & (F.col("c") != F.col("a")) & (F.col("c") != F.col("b"))
            )
        return j.select(*COMBO, "a", "b")
    raise ValueError(shape)


def body_pairs(
    triples: DataFrame, rules: DataFrame, shape: str,
    injective: bool = False,
) -> DataFrame:
    """Distinct (?a,?b) body bindings per surviving rule combo of a shape.

    ``injective``: pairwise-distinct variable bindings (reference
    Ruleset.computeConfidence defaults injectiveMapping=true even though
    mining counts support non-injectively — Ruleset.scala:186).
    """
    return _body_rel(triples, rules, shape, injective=injective).distinct()


def body_sizes(
    triples: DataFrame, rules: DataFrame, shape: str,
    injective: bool = False,
) -> DataFrame:
    """(combo, body_size) per surviving rule combo — bodySize = #distinct
    (?a,?b) body bindings (RuleCounting.scala:66-96).

    l2 fast path: the body is ONE atom, so its distinct (a,b) bindings are
    exactly the predicate's distinct facts — body_size = |q| (direction is
    a bijection; injective drops reflexive facts). No join, no shuffle of
    the pair relation: a predicate-size aggregation broadcast onto the
    combos. l3v2/l3v3 aggregate countDistinct over the raw body join
    (one partial-aggregated shuffle — never a materialized pair set)."""
    if shape == "l2":
        combos = rules.where(F.col("shape") == "l2").select(*COMBO).distinct()
        base = (
            triples.where(F.col("s") != F.col("o")) if injective else triples
        )
        psz = base.groupBy(F.col("p").alias("q")).agg(
            F.count(F.lit(1)).alias("body_size")
        )
        return combos.join(F.broadcast(psz), "q").select(*COMBO, "body_size")
    rel = _body_rel(triples, rules, shape, injective=injective)
    return rel.groupBy(*COMBO).agg(
        F.countDistinct("a", "b").alias("body_size")
    )


def _head_side(triples: DataFrame) -> DataFrame:
    """higherCardinalitySide per predicate (TripleIndex.scala:155-169)."""
    return triples.groupBy("p").agg(
        F.countDistinct("s").alias("ns"), F.countDistinct("o").alias("no")
    ).select(
        "p",
        F.when(F.col("ns") >= F.col("no"), "subject").otherwise("object")
        .alias("side"),
    )


def _pca_sizes(
    pairs: DataFrame, shaped: DataFrame, triples: DataFrame, side: DataFrame
) -> DataFrame:
    """pca_body_size per (shape, p, combo): expand pairs to the combo's
    head predicates (tiny broadcast), keep pairs whose head entity on the
    higherCardinalitySide exists for p, count."""
    combo_heads = shaped.select("shape", "p", *COMBO).distinct().join(
        F.broadcast(side), "p"
    )
    expanded = _combo_join(
        pairs, combo_heads, ["shape", *COMBO], broadcast_right=True
    )
    subs = triples.select("p", F.col("s").alias("a")).distinct()
    objs = triples.select("p", F.col("o").alias("b")).distinct()
    sub_side = expanded.where(F.col("side") == "subject").join(
        subs, ["p", "a"], "left_semi"
    )
    obj_side = expanded.where(F.col("side") == "object").join(
        objs, ["p", "b"], "left_semi"
    )
    return (
        sub_side.unionByName(obj_side)
        .groupBy("shape", "p", *COMBO)
        .agg(F.count(F.lit(1)).alias("pca_body_size"))
    )


def _l3v3_lower_bounds(
    triples: DataFrame, combos: DataFrame, injective: bool = False
) -> DataFrame:
    """Cheap per-combo lower bound on the l3v3 body size, WITHOUT the path
    join: for any shared-var value c, the pairs A_c x B_c are all distinct,
    so bodySize >= max_c |A_c| * |B_c|. Built from two degree tables (one
    groupBy each) — O(|triples|), never O(sum deg^2).

    ``injective``: the injective body count excludes a=c, b=c and the a=b
    diagonal, so the product bound would OVER-estimate it and wrongly prune
    rules whose injective confidence meets the threshold. Use the sound
    under-approximation max(0,|A_c|-2) * max(0,|B_c|-2): dropping a=c costs
    <=1 from A_c, b=c <=1 from B_c, and the diagonal <= min side — together
    bounded by shrinking each side by 2 (pairs >= (n1-1)(n2-1)-(n2-1)
    >= (n1-2)(n2-2) for the nonneg case)."""
    b = _b(triples)
    d1 = b.groupBy(F.col("q"), F.col("d").alias("d1"), F.col("y").alias("c")).agg(
        F.count(F.lit(1)).alias("n1")
    )
    d2 = b.groupBy(
        F.col("q").alias("r"), F.col("d").alias("d2"), F.col("y").alias("c")
    ).agg(F.count(F.lit(1)).alias("n2"))
    prod = (
        _combo_join(d1, F.broadcast(combos.select("q", "d1").distinct()),
                    ["q", "d1"])
        .join(
            _combo_join(d2, F.broadcast(combos.select("r", "d2").distinct()),
                        ["r", "d2"]),
            "c",
        )
        .groupBy("q", "d1", "r", "d2")
        .agg(
            F.max(
                (F.greatest(F.col("n1") - 2, F.lit(0))
                 * F.greatest(F.col("n2") - 2, F.lit(0)))
                if injective else (F.col("n1") * F.col("n2"))
            ).alias("lb_body_size")
        )
    )
    return _combo_join(combos, prod, COMBO, "left")


def confidences(
    rules: DataFrame,
    triples: DataFrame,
    cwa: bool = True,
    pca: bool = True,
    min_confidence: float = 0.0,
    injective: bool = False,
) -> DataFrame:
    """Attach body_size/cwa_confidence and/or pca_body_size/pca_confidence.

    One pass: per shape the body-pair relation is computed once (cached) and
    both measures read it.

    ``min_confidence > 0`` (requires ``cwa``) is the distributed analog of
    the reference's capped counting (RuleCounting.scala:79-83: stop counting
    bodySize past support/minConf+1 and discard the rule). Exact counting
    with per-group early exit is inexpressible in Spark aggregations, so we
    prune with a PROVABLE lower bound instead: an l3v3 rule whose
    lb_body_size already exceeds support/min_confidence can never reach the
    threshold and is dropped before the quadratic path join runs — on
    Zipf-skewed KGs this removes exactly the hub-dominated combos whose
    sum-of-deg^2 join would explode. Surviving rules get EXACT counts, and
    the result is filtered to cwa_confidence >= min_confidence — the same
    final ruleset as Ruleset.computeConfidence(min) in the reference.
    """
    if min_confidence > 0.0 and not cwa:
        raise ValueError("min_confidence pruning requires cwa=True")
    # materialize the ruleset ONCE: rules is usually a lazy mining DAG, and
    # every downstream derivation (per-shape combos for body_pairs, the
    # l3v3 lower bounds, the final measure join) would otherwise re-execute
    # the full mining self-joins — measured ~4x redundant mining work on
    # the 1M-triple flagship (57 s -> ~20 s for the confidence pass)
    rules = rules.localCheckpoint(eager=True)
    side = _head_side(triples) if pca else None
    # ONE materialization for the whole measure pass: every shape's body
    # pairs are computed in a single union job (shape-tagged), then both
    # measures aggregate the checkpointed relation. The per-shape /
    # per-measure eager checkpoints this replaces cost ~10 job barriers —
    # pure driver latency on small rulesets (VERDICT r01 perf note).
    shaped_parts = []
    for shape in ("l2", "l3v2", "l3v3"):
        shaped = rules.where(F.col("shape") == shape)
        if shape == "l3v3" and min_confidence > 0.0:
            combos = shaped.select(*COMBO).distinct()
            lbs = _l3v3_lower_bounds(triples, combos, injective=injective)
            shaped = _combo_join(shaped, lbs, COMBO, "left").where(
                F.coalesce(F.col("lb_body_size"), F.lit(0))
                <= F.col("support") / min_confidence
            ).drop("lb_body_size")
            shaped = shaped.localCheckpoint(eager=True)
        shaped_parts.append(shaped)
    out = shaped_parts[0]
    for part in shaped_parts[1:]:
        out = out.unionByName(part)
    if cwa:
        # body sizes per shape: l2 is a broadcast-joined predicate-size
        # lookup (no pair shuffle at all); l3v2/l3v3 one partial-aggregated
        # countDistinct each — all three branches fuse into one union job
        size_parts = [
            body_sizes(triples, shaped, shape, injective=injective)
            .withColumn("shape", F.lit(shape))
            for shape, shaped in zip(("l2", "l3v2", "l3v3"), shaped_parts)
        ]
        sizes = size_parts[0]
        for part in size_parts[1:]:
            sizes = sizes.unionByName(part)
        out = _combo_join(out, sizes, ["shape", *COMBO], "left")
    if pca:
        pair_parts = [
            body_pairs(triples, shaped, shape, injective=injective)
            .withColumn("shape", F.lit(shape))
            for shape, shaped in zip(("l2", "l3v2", "l3v3"), shaped_parts)
        ]
        pairs = pair_parts[0]
        for part in pair_parts[1:]:
            pairs = pairs.unionByName(part)
        psizes = _pca_sizes(pairs, out, triples, side)
        out = _combo_join(out, psizes, ["shape", "p", *COMBO], "left")
    if cwa:
        out = out.withColumn(
            "cwa_confidence", F.col("support") / F.col("body_size")
        )
        if min_confidence > 0.0:
            out = out.where(F.col("cwa_confidence") >= min_confidence)
    if pca:
        out = out.withColumn(
            "pca_confidence", F.col("support") / F.col("pca_body_size")
        )
    return out


def qpca_confidence(
    rules: DataFrame, triples: DataFrame, injective: bool = False
) -> DataFrame:
    """Attach qpca_body_size + qpca_confidence (RuleCounting.scala:298-380).

    QPCA counts the distinct predicted head pairs of the body, but caps the
    NEGATIVE examples per head entity on the higherCardinalitySide by that
    entity's remaining "cardinality budget": an entity with existing
    cardinality e (distinct partners for the head predicate) absorbs
    max(0, A - e) negatives for free, where A = averageCardinality of the
    predicate on that side (round(size / #distinct entities),
    TripleIndex.scala:97-109); positives always count. The reference's
    sequential budget loop is order-independent, so the whole measure is
    one aggregation:

      qpca_body_size = sum over entities of
        pos_e + max(0, neg_e - max(0, A - e_card))
    """
    side = _head_side(triples)  # higherCardinalitySide per predicate
    # per-(p, side-entity) existing cardinality + per-p average cardinality
    scard = triples.groupBy("p", F.col("s").alias("ent")).agg(
        F.countDistinct("o").alias("ecard")
    ).withColumn("eside", F.lit("subject"))
    ocard = triples.groupBy("p", F.col("o").alias("ent")).agg(
        F.countDistinct("s").alias("ecard")
    ).withColumn("eside", F.lit("object"))
    ecards = scard.unionByName(ocard)
    avg_c = triples.groupBy("p").agg(
        F.round(F.count(F.lit(1)) / F.countDistinct("s")).cast("long").alias("avg_s"),
        F.round(F.count(F.lit(1)) / F.countDistinct("o")).cast("long").alias("avg_o"),
    ).join(side, "p").select(
        "p",
        F.when(F.col("side") == "subject", F.col("avg_s"))
        .otherwise(F.col("avg_o")).alias("avg_card"),
    )
    head = triples.select("p", F.col("s").alias("a"), F.col("o").alias("b"))
    out = None
    for shape in ("l2", "l3v2", "l3v3"):
        shaped = rules.where(F.col("shape") == shape)
        pairs = body_pairs(triples, shaped, shape, injective=injective)
        combo_heads = shaped.select("p", *COMBO).join(F.broadcast(side), "p")
        expanded = _combo_join(pairs, combo_heads, COMBO, broadcast_right=True)
        tagged = expanded.join(
            head.withColumn("_pos", F.lit(True)), ["p", "a", "b"], "left"
        ).withColumn("_pos", F.coalesce(F.col("_pos"), F.lit(False)))
        ent = F.when(F.col("side") == "subject", F.col("a")).otherwise(F.col("b"))
        per_ent = tagged.groupBy(
            "p", *COMBO, F.col("side").alias("eside"), ent.alias("ent")
        ).agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("pos"),
            F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("neg"),
        )
        sized = (
            per_ent.join(ecards, ["p", "eside", "ent"], "left")
            .withColumn("ecard", F.coalesce(F.col("ecard"), F.lit(0)))
            .join(F.broadcast(avg_c), "p")
            .withColumn(
                "counted",
                F.col("pos") + F.greatest(
                    F.lit(0),
                    F.col("neg") - F.greatest(
                        F.lit(0), F.col("avg_card") - F.col("ecard")
                    ),
                ),
            )
            .groupBy("p", *COMBO)
            .agg(F.sum("counted").alias("qpca_body_size"))
            .localCheckpoint(eager=True)
        )
        withsize = _combo_join(shaped, sized, ["p", *COMBO], "left")
        out = withsize if out is None else out.unionByName(withsize)
    return out.withColumn(
        "qpca_confidence",
        F.when(
            F.coalesce(F.col("qpca_body_size"), F.lit(0)) == 0, F.lit(0.0)
        ).otherwise(F.col("support") / F.col("qpca_body_size")),
    )


def cwa_confidence(rules: DataFrame, triples: DataFrame) -> DataFrame:
    """Attach body_size + cwa_confidence to every rule."""
    return confidences(rules, triples, cwa=True, pca=False)


def pca_confidence(rules: DataFrame, triples: DataFrame) -> DataFrame:
    """Attach pca_body_size + pca_confidence to every rule."""
    return confidences(rules, triples, cwa=False, pca=True)


def lift(
    rules: DataFrame, triples: DataFrame, conf_col: str = "cwa_confidence"
) -> DataFrame:
    """Attach mode_probability + lift = confidence / modeProbability
    (RuleCounting.scala:127-141; modeProbability per
    core:index/TripleIndex.scala:113-117: the lowerCardinalitySide's most
    frequent entity's fact count / predicate size, both INCLUDING reflexive
    triples — mode() and the denominator use size(false), i.e. full counts
    (IndexCollections.scala:32). lowerCardinalitySide is Object when
    subjectRelativeCardinality >= objectRelativeCardinality
    (TripleIndex.scala:155-159), so the subject mode applies only at
    ns < no — strict, ties go to the object mode.
    Variable-only heads (this tier); constant heads use per-constant
    probabilities in the reference."""
    card = triples.groupBy("p").agg(
        F.countDistinct("s").alias("ns"), F.countDistinct("o").alias("no")
    )
    smode = (
        triples.groupBy("p", "s").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("p").agg(F.max("c").alias("smode"))
    )
    omode = (
        triples.groupBy("p", "o").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("p").agg(F.max("c").alias("omode"))
    )
    size_full = triples.groupBy("p").agg(F.count(F.lit(1)).alias("size_full"))
    mp = (
        card.join(smode, "p", "left").join(omode, "p", "left")
        .join(size_full, "p", "left")
        .select(
            "p",
            (
                F.when(F.col("ns") < F.col("no"), F.col("smode"))
                .otherwise(F.col("omode")) / F.col("size_full")
            ).alias("mode_probability"),
        )
    )
    return rules.join(F.broadcast(mp), "p", "left").withColumn(
        "lift", F.col(conf_col) / F.col("mode_probability")
    )


def recount_support(rules: DataFrame, triples: DataFrame) -> DataFrame:
    """computeSupport / computeHeadCoverage on a (possibly different)
    triple set (Ruleset.scala:172-184): re-derive support and head size for
    the EXISTING rule keys against `triples`, keeping every rule row (a
    rule with no matches gets support 0). Same distinct-triple semantics
    as mining. One job per shape, semi-filtered to the surviving combos —
    never a full re-mine."""
    from rdfrules_spark.mining.amie import _htid

    head = triples.select(
        F.col("s").alias("a"), F.col("o").alias("b"), "p"
    ).withColumn("_ht", _htid())
    new_hs = triples.groupBy("p").agg(F.count(F.lit(1)).alias("_nhs"))
    out = None
    for shape in ("l2", "l3v2", "l3v3"):
        shaped = rules.where(F.col("shape") == shape)
        pairs = body_pairs(triples, shaped, shape)
        support = (
            _combo_join(
                head.join(
                    pairs.withColumnRenamed("a", "_a").withColumnRenamed(
                        "b", "_b"
                    ),
                    (F.col("a") == F.col("_a")) & (F.col("b") == F.col("_b")),
                ),
                shaped.select("p", *COMBO).distinct(), ["p", *COMBO],
                broadcast_right=True,
            )
            .groupBy("p", *COMBO)
            .agg(F.countDistinct("a", "b").alias("_nsup"))
        )
        part = _combo_join(shaped, support, ["p", *COMBO], "left")
        out = part if out is None else out.unionByName(part)
    return (
        out.join(F.broadcast(new_hs), "p", "left")
        .withColumn("support", F.coalesce(F.col("_nsup"), F.lit(0)))
        .withColumn("head_size", F.coalesce(F.col("_nhs"), F.lit(0)))
        .withColumn(
            "head_coverage",
            F.when(F.col("head_size") > 0,
                   F.col("support") / F.col("head_size")).otherwise(0.0),
        )
        .drop("_nsup", "_nhs")
    )
