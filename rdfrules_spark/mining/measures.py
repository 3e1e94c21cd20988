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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.mining.amie import _b


def body_pairs(triples: DataFrame, rules: DataFrame, shape: str) -> DataFrame:
    """Distinct (?a,?b) body bindings per surviving rule combo of a shape."""
    b = _b(triples)
    combos = rules.where(F.col("shape") == shape).select(
        "q", "d1", "r", "d2"
    ).distinct()
    if shape == "l2":
        bb = b.withColumnRenamed("d", "d1").join(
            F.broadcast(combos.select("q", "d1")), ["q", "d1"]
        )
        return bb.select(
            "q", "d1", F.lit(None).cast("long").alias("r"),
            F.lit(None).cast("string").alias("d2"),
            F.col("x").alias("a"), F.col("y").alias("b"),
        ).distinct()
    if shape == "l3v2":
        b1 = b.select(F.col("x").alias("a"), F.col("y").alias("b"),
                      F.col("q"), F.col("d").alias("d1"))
        b2 = b.select(F.col("x").alias("a"), F.col("y").alias("b"),
                      F.col("q").alias("r"), F.col("d").alias("d2"))
        j = b1.join(b2, ["a", "b"]).join(F.broadcast(combos), ["q", "d1", "r", "d2"])
        return j.select("q", "d1", "r", "d2", "a", "b").distinct()
    if shape == "l3v3":
        b1 = b.select(F.col("x").alias("a"), F.col("y").alias("c"),
                      F.col("q"), F.col("d").alias("d1"))
        b2 = b.select(F.col("x").alias("b"), F.col("y").alias("c"),
                      F.col("q").alias("r"), F.col("d").alias("d2"))
        b1 = b1.join(F.broadcast(combos.select("q", "d1").distinct()), ["q", "d1"])
        b2 = b2.join(F.broadcast(combos.select("r", "d2").distinct()), ["r", "d2"])
        j = b1.join(b2, "c").join(F.broadcast(combos), ["q", "d1", "r", "d2"])
        return j.select("q", "d1", "r", "d2", "a", "b").distinct()
    raise ValueError(shape)


def _with_body_size(rules: DataFrame, pairs: DataFrame, out_col: str) -> DataFrame:
    sizes = pairs.groupBy("q", "d1", "r", "d2").agg(
        F.count(F.lit(1)).alias(out_col)
    )
    return rules.join(
        sizes,
        (rules["q"].eqNullSafe(sizes["q"]))
        & (rules["d1"].eqNullSafe(sizes["d1"]))
        & (rules["r"].eqNullSafe(sizes["r"]))
        & (rules["d2"].eqNullSafe(sizes["d2"])),
        "left",
    ).drop(sizes["q"]).drop(sizes["d1"]).drop(sizes["r"]).drop(sizes["d2"])


def cwa_confidence(rules: DataFrame, triples: DataFrame) -> DataFrame:
    """Attach body_size + cwa_confidence to every rule."""
    out = None
    for shape in ("l2", "l3v2", "l3v3"):
        shaped = rules.where(F.col("shape") == shape)
        pairs = body_pairs(triples, shaped, shape)
        withsize = _with_body_size(shaped, pairs, "body_size")
        out = withsize if out is None else out.unionByName(withsize)
    return out.withColumn(
        "cwa_confidence", F.col("support") / F.col("body_size")
    )


def pca_confidence(rules: DataFrame, triples: DataFrame) -> DataFrame:
    """Attach pca_body_size + pca_confidence. Needs rules x body pairs per
    head predicate: the existential check keys on the head predicate's
    higherCardinalitySide entity."""
    stats = triples.groupBy("p").agg(
        F.countDistinct("s").alias("ns"), F.countDistinct("o").alias("no")
    ).select(
        "p",
        F.when(F.col("ns") >= F.col("no"), "subject").otherwise("object").alias(
            "side"
        ),
    )
    subs = triples.select("p", F.col("s").alias("e")).distinct()
    objs = triples.select("p", F.col("o").alias("e")).distinct()

    out = None
    for shape in ("l2", "l3v2", "l3v3"):
        shaped = rules.where(F.col("shape") == shape)
        pairs = body_pairs(triples, shaped, shape)
        # expand pairs per head predicate of surviving rules of this combo
        # (null-safe: r/d2 are null for l2)
        lhs = shaped.select("p", "q", "d1", "r", "d2")
        keyed = lhs.join(
            pairs.withColumnsRenamed(
                {"q": "_q", "d1": "_d1", "r": "_r", "d2": "_d2"}
            ),
            lhs["q"].eqNullSafe(F.col("_q"))
            & lhs["d1"].eqNullSafe(F.col("_d1"))
            & lhs["r"].eqNullSafe(F.col("_r"))
            & lhs["d2"].eqNullSafe(F.col("_d2")),
        ).drop("_q", "_d1", "_r", "_d2").join(F.broadcast(stats), "p")
        sub_side = keyed.where(F.col("side") == "subject").join(
            subs.withColumnRenamed("e", "a"), ["p", "a"], "left_semi"
        )
        obj_side = keyed.where(F.col("side") == "object").join(
            objs.withColumnRenamed("e", "b"), ["p", "b"], "left_semi"
        )
        sizes = (
            sub_side.unionByName(obj_side)
            .groupBy("p", "q", "d1", "r", "d2")
            .agg(F.count(F.lit(1)).alias("pca_body_size"))
        )
        withsize = shaped.join(
            sizes,
            (shaped["p"] == sizes["p"])
            & shaped["q"].eqNullSafe(sizes["q"])
            & shaped["d1"].eqNullSafe(sizes["d1"])
            & shaped["r"].eqNullSafe(sizes["r"])
            & shaped["d2"].eqNullSafe(sizes["d2"]),
            "left",
        ).drop(sizes["p"]).drop(sizes["q"]).drop(sizes["d1"]).drop(sizes["r"]).drop(
            sizes["d2"]
        )
        out = withsize if out is None else out.unionByName(withsize)
    return out.withColumn(
        "pca_confidence", F.col("support") / F.col("pca_body_size")
    )
