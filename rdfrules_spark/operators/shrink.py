"""Positional windows over an explicit ordering (reference
core:data/ops/Transformable.scala:20-26 take/drop/slice, "shrink" tasks
http:task/CommonShrink.scala).

RDFRules' streams have an inherent order; distributed DataFrames do not, so
each shrink takes explicit sort keys — same contract as the reference's
deterministic file order. take/limit stays a driver-free LIMIT; drop/slice
use a global row_number window, which at cluster scale should be applied
after heavy filtering (a global window is a single-partition sort of the
*keys*, not the payload, thanks to range partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def take(df: DataFrame, n: int, *order_cols) -> DataFrame:
    return df.orderBy(*order_cols).limit(n)


def slice_rows(df: DataFrame, start: int, end: int, *order_cols) -> DataFrame:
    """Rows with positions in [start, end) under the given ordering."""
    w = Window.orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .where((F.col("_rn") >= start) & (F.col("_rn") < end))
        .drop("_rn")
    )


def drop_rows(df: DataFrame, n: int, *order_cols) -> DataFrame:
    return slice_rows(df, n, 1 << 62, *order_cols)
