"""TSV triple reader/writer (reference core:data/formats/Tsv.scala:15-120;
format dispatch core:data/RdfSource.scala:52-67).

Line format: ``<subject>\\t<predicate>\\t<object>.`` — URIs in angle
brackets, literals bare (numbers, quoted strings, booleans). Parsing modes
mirror the reference: Raw (keep lexical forms) and ParsedLiterals (strip
angle brackets, type literals). Reading is a plain distributed CSV scan —
Spark splits the file across tasks; no driver-side parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfrules_spark.dictionary import term_kind


def read_tsv(
    spark: SparkSession, path: str, parse_uris: bool = True
) -> DataFrame:
    """-> triples_str(s, p, o, okind)."""
    raw = (
        spark.read.option("sep", "\t")
        .csv(path, schema="s string, p string, o string")
    )
    strip = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"\.\s*$", ""), r"^<|>$", ""
    )
    if parse_uris:
        df = raw.select(
            strip(F.col("s")).alias("s"),
            strip(F.col("p")).alias("p"),
            strip(F.col("o")).alias("o"),
        )
    else:
        df = raw.select("s", "p", F.regexp_replace("o", r"\.\s*$", "").alias("o"))
    return df.withColumn("okind", term_kind(F.col("o")))


def write_tsv(df: DataFrame, path: str) -> None:
    """Graph export (reference core:data/Graph.scala:52-60, RdfWriter)."""
    out = df.select(
        F.concat(F.lit("<"), "s", F.lit(">")).alias("s"),
        F.concat(F.lit("<"), "p", F.lit(">")).alias("p"),
        F.when(
            F.col("okind") == "uri", F.concat(F.lit("<"), "o", F.lit(">."))
        ).otherwise(F.concat(F.col("o"), F.lit("."))).alias("o"),
    )
    out.write.mode("overwrite").option("sep", "\t").csv(path)
