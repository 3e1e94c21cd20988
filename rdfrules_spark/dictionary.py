"""Stage 4: dictionary encoding + predicate-bucketed triple store + stats.

Spark analog of the reference index layer:
  * dict(id, item, kind)        ~ TripleItemHashIndex (core:index/
    TripleItemHashIndex.scala:32-53 — hashCode+probing there; here stable
    64-bit xxhash64 ids with explicit collision detection, so ids are
    deterministic across runs/partitions → resumable checkpoints)
  * triples(s, p, o, g, pred_bucket) written bucketed by predicate hash
    ~ TripleHashIndex's predicate-first forests (core:index/
    TripleHashIndex.scala:22-24); in Spark the six in-memory permutations
    are replaced by partition pruning on pred_bucket + join planning.
  * pred_stats               ~ per-predicate lazy statistics
    (core:index/TripleIndex.scala:47-174) — every mining measure reads these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PRED_BUCKETS = 64


def term_kind(col):
    """Literal typing per reference core:data/TripleItem.scala (uri / text /
    number / boolean / interval)."""
    return (
        F.when(col.rlike(r"^-?[0-9]+(\.[0-9]+)?$"), F.lit("number"))
        .when(col.isin("true", "false"), F.lit("boolean"))
        .when(col.rlike(r"^\[[^;]*;[^\]]*\)$"), F.lit("interval"))
        .when(col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:") | col.startswith("_:"), F.lit("uri"))
        .otherwise(F.lit("text"))
    )


def _stable_id(item_col):
    return F.xxhash64(item_col)


def build_dictionary(triples_str: DataFrame) -> DataFrame:
    """dict(id, item, kind) over all distinct terms of s, p, o.

    Ids are xxhash64(item): deterministic, partition-order-independent,
    join-free to recompute. 64-bit collisions are detected (assert-style
    count) rather than silently accepted; at ~10^10 distinct terms the
    birthday bound is ~1e-2 collisions — the check below is the guard rail
    and a salt-rehash would be the remediation.
    """
    terms = (
        triples_str.select(F.col("s").alias("item"))
        .unionAll(triples_str.select(F.col("p").alias("item")))
        .unionAll(triples_str.select(F.col("o").alias("item")))
        .distinct()
    )
    return dictionary_from_terms(terms)


def dictionary_from_terms(terms: DataFrame) -> DataFrame:
    """dict(id, item, kind) from an (already distinct) ``item`` column —
    the id/kind half of :func:`build_dictionary`, exposed for callers that
    can enumerate the term set from a dimension table instead of scanning
    the full triple stream (pipeline.run_pipeline's link-map fast path)."""
    return terms.select(
        _stable_id(F.col("item")).alias("id"),
        "item",
        term_kind(F.col("item")).alias("kind"),
    )


def assert_no_collisions(dictionary: DataFrame) -> int:
    return (
        dictionary.groupBy("id")
        .agg(F.countDistinct("item").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )


def encode_triples(triples_str: DataFrame, graph_id: int = 0) -> DataFrame:
    """triples_str(s,p,o[,g]) -> triples(s,p,o,g,pred_bucket) as longs.

    Encoding is computed, not joined: ids are content hashes, so the
    dictionary is only needed for *decoding*. This removes three big
    shuffle joins from the hot path — at 100 TB that is the difference
    between 1 pass and 4.
    """
    g = F.col("g").cast("int") if "g" in triples_str.columns else F.lit(graph_id)
    return triples_str.select(
        _stable_id(F.col("s")).alias("s"),
        _stable_id(F.col("p")).alias("p"),
        _stable_id(F.col("o")).alias("o"),
        g.alias("g"),
        F.pmod(F.xxhash64(F.col("p")), F.lit(N_PRED_BUCKETS))
        .cast("int")
        .alias("pred_bucket"),
    )


def decode_triples(triples: DataFrame, dictionary: DataFrame) -> DataFrame:
    """triples(s,p,o,...) longs -> strings via dict joins (reference
    core:index/ops/QuadsIndex.scala index->dataset)."""
    d = dictionary.select("id", "item")
    for c in ("s", "p", "o"):
        d_c = d.select(F.col("id").alias(c), F.col("item").alias(f"{c}_str"))
        triples = triples.join(d_c, c, "left")
    return triples.select(
        F.col("s_str").alias("s"), F.col("p_str").alias("p"), F.col("o_str").alias("o")
    )


def write_triple_store(triples: DataFrame, path: str) -> None:
    """Materialize predicate-bucketed: partition pruning gives per-predicate
    scans (the Spark replacement for the reference's p-first hash forests)."""
    triples.write.mode("overwrite").partitionBy("pred_bucket").parquet(path)


def predicate_neighbours(triples: DataFrame) -> DataFrame:
    """Per-predicate-pair join-size estimates (reference
    core:index/TripleIndex.scala:58-95: neighboursSS/SO/OO/OS) — the
    selectivity statistics the reference's experimental refinement uses to
    order atom joins.

    For predicates p, q and shared entity e:
      SS = sum_e |objs_p(e)| * |objs_q(e)|   (e subject of both;
           q == p uses |objs_p(e)| * (|objs_p(e)|-1), the self-join size
           minus the diagonal, as in the reference)
      SO = sum_e |objs_p(e)| * |subjs_q(e)|  (e subject of p, object of q)
      OO = sum_e |subjs_p(e)| * |subjs_q(e)| (e object of both; q == p
           diagonal-corrected)
      OS = sum_e |subjs_p(e)| * |objs_q(e)|  (e object of p, subject of q)

    Scale: two groupBy pre-aggregations then equi-joins keyed by entity —
    per-entity fan-out is (#predicates at the entity)^2, bounded by the
    schema, never by the fact count; AQE splits skewed hub entities.
    Output is at most 4 * |P|^2 rows.
    """
    ps = triples.groupBy("p", "s").agg(F.countDistinct("o").alias("c"))
    po = triples.groupBy("p", "o").agg(F.countDistinct("s").alias("c"))
    ps_e = ps.select(F.col("p"), F.col("s").alias("e"), F.col("c"))
    po_e = po.select(F.col("p"), F.col("o").alias("e"), F.col("c"))

    def _pair(left, right, mode, diagonal):
        a = left.select(
            F.col("p").alias("p"), F.col("e"), F.col("c").alias("ca")
        )
        b = right.select(
            F.col("p").alias("q"), F.col("e"), F.col("c").alias("cb")
        )
        cross = F.col("ca") * F.col("cb")
        est = (
            F.when(F.col("p") == F.col("q"),
                   F.col("ca") * (F.col("ca") - 1)).otherwise(cross)
            if diagonal
            else cross
        )
        return (
            a.join(b, "e")
            .groupBy("p", "q")
            .agg(F.sum(est).alias("est"))
            .select("p", "q", F.lit(mode).alias("mode"), "est")
        )

    return (
        _pair(ps_e, ps_e, "SS", True)
        .unionByName(_pair(ps_e, po_e, "SO", False))
        .unionByName(_pair(po_e, po_e, "OO", True))
        .unionByName(_pair(po_e, ps_e, "OS", False))
    )


def predicate_stats(triples: DataFrame) -> DataFrame:
    """Per-predicate statistics table (reference core:index/TripleIndex.scala:
    47-174). One shuffle on p; mode via max_by over a (p,o)/(p,s) pre-agg.

    Columns: p, size, size_nonreflexive, n_subjects, n_objects,
    subj_rel_card, obj_rel_card, higher_card_side, avg_subj_card,
    avg_obj_card, subject_mode, object_mode, mode_prob, pca_negatives.
    """
    base = triples.groupBy("p").agg(
        F.count(F.lit(1)).alias("size"),
        F.sum(F.when(F.col("s") != F.col("o"), 1).otherwise(0)).alias(
            "size_nonreflexive"
        ),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o").alias("n_objects"),
    )
    # per-(p,s) and per-(p,o) fact counts — feed avg cardinalities, modes,
    # and PCA negatives (TripleIndex.scala:97-145)
    ps = triples.groupBy("p", "s").agg(F.count(F.lit(1)).alias("cnt"))
    po = triples.groupBy("p", "o").agg(F.count(F.lit(1)).alias("cnt"))
    ps_agg = ps.groupBy("p").agg(
        F.avg("cnt").alias("_avg_obj_per_subj"),
        F.max_by("s", "cnt").alias("subject_mode"),
        F.max("cnt").alias("_subj_mode_cnt"),
    )
    po_agg = po.groupBy("p").agg(
        F.avg("cnt").alias("_avg_subj_per_obj"),
        F.max_by("o", "cnt").alias("object_mode"),
        F.max("cnt").alias("_obj_mode_cnt"),
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_n_obj_keys"),
    )
    out = (
        base.join(ps_agg, "p")
        .join(po_agg, "p")
        .select(
            "p",
            "size",
            "size_nonreflexive",
            "n_subjects",
            "n_objects",
            (F.col("n_subjects") / F.col("size")).alias("subj_rel_card"),
            (F.col("n_objects") / F.col("size")).alias("obj_rel_card"),
            # side with MORE distinct values per fact = higher cardinality
            # (TripleIndex.scala:155-169: lowerCardinalitySide is the other)
            F.when(F.col("n_subjects") >= F.col("n_objects"), "subject")
            .otherwise("object")
            .alias("higher_card_side"),
            F.round(F.col("_avg_obj_per_subj")).cast("long").alias("avg_subj_card"),
            F.round(F.col("_avg_subj_per_obj")).cast("long").alias("avg_obj_card"),
            "subject_mode",
            "object_mode",
            (
                F.greatest("_subj_mode_cnt", "_obj_mode_cnt") / F.col("size")
            ).alias("mode_prob"),
            # pcaNegatives = sum_s (n_objects - objects_of(p,s))
            # (TripleIndex.scala:129-145)
            (F.col("n_subjects") * F.col("n_objects") - F.col("size")).alias(
                "pca_negatives_ub"
            ),
        )
    )
    return out
