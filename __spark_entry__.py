"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship KG-construction pipeline over the sf0.001 corpus:
    documents.parquet -> derive interleaved spans (input_hint shape)
    -> window-3 extraction -> sameAs split ('dup' cue) -> connected-components
    canonicalization -> per-predicate aggregate.
queries()/oracle_sql() — one entry per implemented operator (SURVEY.md §2),
    each checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-corpus KG pipeline: documents -> canonical string triples."""
    from rdfrules_spark.canonicalize import canonicalize_triples
    from rdfrules_spark.corpus import derive_documents
    from rdfrules_spark.extraction import extract_window3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans_docs = derive_documents(docs)
    stmts = extract_window3(spans_docs)
    iri = lambda c: F.concat(F.lit("w:"), F.col(c))  # noqa: E731
    linked = stmts.select(
        "doc_id", iri("s_surf").alias("s"), F.col("p"), iri("o_surf").alias("o")
    )
    rels = linked.where(F.col("p") != "dup")
    sameas = linked.where(F.col("p") == "dup").select(
        F.col("s").alias("a"), F.col("o").alias("b")
    )
    canon_rels, _ = canonicalize_triples(rels, sameas)
    return canon_rels


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    triples = _kg_triples(spark, SF0001)
    return (
        triples.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_statements"),
            F.countDistinct("s", "o").alias("n_triples"),
            F.countDistinct("s").alias("n_subjects"),
            F.countDistinct("o").alias("n_objects"),
        )
        .orderBy(F.desc("n_triples"), "p")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    from rdfrules_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (pre-registered views:
    region nation customer supplier part orders lineitem events documents
    embeddings)."""
    from rdfrules_spark.registry import ORACLES

    return dict(ORACLES)
