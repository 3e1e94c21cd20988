"""Pre-processing analytics (reference core:data/ops/TriplesOps.scala).

histogram(s?,p?,o?)     — TriplesOps.scala:22-32 / Histogram.scala:9-28:
                          count quads grouped by any subset of {s,p,o}.
properties()            — TriplesOps.scala:40 / Properties.scala:28-38:
                          per-predicate counts by object *type*.
property_cardinalities  — core:index/PropertyCardinalities.scala:
                          per-predicate size, #distinct subjects/objects,
                          functionality ratios.

All are single-shuffle groupBy aggregations; map-side partial aggregation
keeps Zipf-skewed predicates off single reducers. The histogram over all
masks at once is expressed with cube() (one pass instead of 2^3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.dictionary import term_kind


def histogram(quads: DataFrame, *cols: str) -> DataFrame:
    """Count grouped by the chosen subset of columns (any of s, p, o, g)."""
    return quads.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_cube(quads: DataFrame, *cols: str) -> DataFrame:
    """All grouping masks in one pass (grouping-sets superset of the
    reference's one-mask-at-a-time histogram)."""
    return quads.cube(*cols).agg(F.count(F.lit(1)).alias("cnt"))


def properties(quads: DataFrame, p: str = "p", o: str = "o") -> DataFrame:
    """Per-predicate object-type counts (uri/text/number/boolean/interval)."""
    return (
        quads.withColumn("okind", term_kind(F.col(o)))
        .groupBy(p, "okind")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def property_cardinalities(
    quads: DataFrame, s: str = "s", p: str = "p", o: str = "o"
) -> DataFrame:
    return quads.groupBy(p).agg(
        F.count(F.lit(1)).alias("size"),
        F.countDistinct(s).alias("n_subjects"),
        F.countDistinct(o).alias("n_objects"),
        (F.countDistinct(s) / F.count(F.lit(1))).alias("subj_rel_card"),
        (F.countDistinct(o) / F.count(F.lit(1))).alias("obj_rel_card"),
    )
