"""Top-k / sort / mode / grouped-aggregation operators (reference
core:utils/TopKQueue.scala, core:ruleset/ops/Sortable.scala:17-21,
mode stats core:index/TripleIndex.scala:114-127, grouped predictions
core:prediction/PredictedTriples.scala:88-90).

All are Window.partitionBy(...).orderBy(...) + rank / max_by in Spark —
the distributed replacement for the reference's bounded priority queues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, k: int, *order_cols) -> DataFrame:
    """Global top-k (TopKQueue semantics): per-partition local top-k then a
    single merge — expressed as orderBy().limit(), which Spark executes as
    TakeOrderedAndProject (no global sort materialization)."""
    return df.orderBy(*order_cols).limit(k)


def topk_per_group(df: DataFrame, group_cols: list[str], k: int, *order_cols) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def mode_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Most frequent value per group + its probability
    (subjectMode/objectMode + modeProbability, TripleIndex.scala:114-127).
    Ties break on the smaller value for cross-engine determinism."""
    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), value_col)
    total = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.withColumn("r", F.row_number().over(w))
        .where("r = 1")
        .join(total, group_col)
        .select(
            group_col,
            F.col(value_col).alias("mode_value"),
            "cnt",
            (F.col("cnt") / F.col("total")).alias("mode_prob"),
        )
    )


def noisy_or(conf_col) -> "F.Column":
    """NoisyOr score aggregation: 1 - prod(1 - conf)
    (core:prediction/aggregator/NoisyOrScorer.scala:9-24), expressed as
    1 - exp(sum(ln(1-conf))) so it runs as a distributive aggregate."""
    return 1.0 - F.exp(F.sum(F.log(1.0 - conf_col)))
