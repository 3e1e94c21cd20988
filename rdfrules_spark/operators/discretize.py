"""Discretization of numeric columns into intervals (reference
core:data/ops/Discretizable.scala:28-72, core:data/DiscretizationTask.scala;
interval literal semantics core:data/TripleItem.scala:147-183).

Tasks:
  equidistance(k)  — k equal-width bins over [min, max]
  equifrequency(k) — k equal-count bins (ntile; exact, not approxQuantile,
                     so the DuckDB oracle matches bit-for-bit)
  equisize(minSupportRatio) — greedy equifrequency with a support floor:
                     start from equifrequency(ceil(1/ratio)) bins.

`discretize` rewrites the numeric column to its interval literal "[lo;hi)"
exactly like the reference replaces numeric objects by Interval items.

Scale: equidistance = one min/max aggregate + arithmetic (no shuffle of the
data); equifrequency = one global sort of the *column* (window ntile) — at
100 TB swap ntile for approxQuantile boundaries (documented perf-only
deviation, reference uses exact external sort too: Discretizable.scala:29-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equidistance_intervals(df: DataFrame, col: str, k: int) -> DataFrame:
    """-> (bin, lo, hi, cnt): k equal-width bins."""
    mm = df.agg(
        F.min(col).cast("double").alias("mn"), F.max(col).cast("double").alias("mx")
    )
    binned = df.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor((F.col(col) - F.col("mn")) / ((F.col("mx") - F.col("mn")) / k)),
            F.lit(k - 1),
        )
        .cast("int")
        .alias("bin"),
        "mn",
        "mx",
    )
    return (
        binned.groupBy("bin", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            (F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn")) / k).alias("lo"),
            (F.col("mn") + (F.col("bin") + 1) * (F.col("mx") - F.col("mn")) / k).alias("hi"),
            "cnt",
        )
    )


def equifrequency_intervals(df: DataFrame, col: str, k: int) -> DataFrame:
    """-> (bin, lo, hi, cnt): k equal-count bins via exact ntile."""
    w = Window.orderBy(F.col(col).cast("double"))
    tiled = df.select(F.col(col).cast("double").alias("v")).withColumn(
        "bin", F.ntile(k).over(w) - 1
    )
    return tiled.groupBy("bin").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("cnt")
    )


def equisize_intervals(df: DataFrame, col: str, min_support_ratio: float) -> DataFrame:
    """Bins each holding >= min_support_ratio of rows (Equisize task):
    equifrequency with k = floor(1 / ratio) guarantees the floor."""
    k = max(1, int(1.0 / min_support_ratio))
    return equifrequency_intervals(df, col, k)


def interval_literal(lo, hi) -> "F.Column":
    """Canonical interval literal "[lo;hi)" (TripleItem.Interval string
    form, TripleItem.scala:147-156)."""
    return F.concat(F.lit("["), lo.cast("string"), F.lit(";"), hi.cast("string"), F.lit(")"))


def discretize_equidistance(df: DataFrame, col: str, k: int) -> DataFrame:
    """Replace the numeric column by its equidistance-interval literal."""
    mm = df.agg(
        F.min(col).cast("double").alias("mn"), F.max(col).cast("double").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / k
    b = F.least(F.floor((F.col(col) - F.col("mn")) / width), F.lit(k - 1)).cast("int")
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn(
            col,
            interval_literal(F.col("mn") + b * width, F.col("mn") + (b + 1) * width),
        )
        .drop("mn", "mx")
    )
