"""Sampling / splits (reference core:data/ops/Sampleable.scala:32-97:
stratified-by-predicate shuffle into 1-3 parts, bootstrap; Dataset.index
train/test split by graph membership, Dataset.scala:74-87).

Determinism contract: splits are *hash-based*, not rand()-based — the part
of a row is a pure function of its key, so the same row lands in the same
part on any cluster size, any partitioning, and in the DuckDB oracle.
(rand(seed) is partition-order dependent in Spark; useless for resumable
100 TB jobs and unverifiable cross-engine.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.functions.hashing import h60


def hash_split(
    df: DataFrame, key: str, fractions: list[float], salt: str = "split"
) -> list[DataFrame]:
    """Deterministic split into len(fractions) parts by key hash."""
    bucket = h60(F.concat(F.lit(salt), F.col(key).cast("string"))) % 10_000
    parts, lo = [], 0
    for frac in fractions:
        hi = lo + int(frac * 10_000)
        parts.append(df.where((bucket >= lo) & (bucket < hi)))
        lo = hi
    return parts


def stratified_split(
    df: DataFrame,
    strat_col: str,
    key: str,
    fraction: float,
    salt: str = "strat",
) -> tuple[DataFrame, DataFrame]:
    """Per-stratum deterministic split (the reference's samplingDistributor
    stratifies by predicate, Dataset.scala:48): within each strat_col value,
    ~fraction of rows (by key hash) go to part 1."""
    bucket = h60(
        F.concat(F.lit(salt), F.col(strat_col).cast("string"), F.col(key).cast("string"))
    ) % 10_000
    left = df.where(bucket < int(fraction * 10_000))
    right = df.where(bucket >= int(fraction * 10_000))
    return left, right


def graph_split(quads: DataFrame, train_g: str, test_g: str):
    """Dataset.index(trainGraph, testGraph) by graph membership
    (core:data/Dataset.scala:74-87 / index/TrainTestIndex): the train part
    is every quad in ``train_g``, the test part every quad in ``test_g``;
    both are plain partition-pruned filters on the graph column (no
    shuffle). Returns (train, test) triple DataFrames."""
    train = quads.where(F.col("g") == train_g).select("s", "p", "o")
    test = quads.where(F.col("g") == test_g).select("s", "p", "o")
    return train, test


def bootstrap(df: DataFrame, key: str, copies: int = 3, salt: str = "boot") -> DataFrame:
    """Sampling with replacement (Sampleable.scala:54-97), deterministic:
    each row appears k times where k ~ its hash over `copies` slots —
    expected size == input size, multiplicities vary like a bootstrap."""
    mult = (
        h60(F.concat(F.lit(salt), F.col(key).cast("string"))) % (copies + 1)
    ).cast("int")
    return df.withColumn("_m", mult).where(F.col("_m") > 0).withColumn(
        "_i", F.explode(F.sequence(F.lit(1), F.col("_m")))
    ).drop("_m", "_i")
