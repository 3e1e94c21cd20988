"""Relational -> triples conversion (reference core:data/formats/Sql.scala:
26-52: PK -> subject IRI, each column -> predicate, FK columns -> object
links to the referenced table's subject IRI).

Spark-first: a stack()-style unpivot in one projection — no shuffle at all;
the 100 TB version is a pure map over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_to_triples(
    df: DataFrame,
    table: str,
    pk: str,
    fk_refs: dict[str, str] | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """-> triples(s, p, o, okind) for one relational table.

    fk_refs maps column -> referenced table name (object becomes an IRI
    ``<ref_table>:<value>``); other columns become literals.
    """
    fk_refs = fk_refs or {}
    if value_cols is None:
        value_cols = [c for c in df.columns if c != pk]
    subj = F.concat(F.lit(f"{table}:"), F.col(pk).cast("string"))
    parts = []
    for c in value_cols:
        if c in fk_refs:
            obj = F.concat(F.lit(f"{fk_refs[c]}:"), F.col(c).cast("string"))
            kind = F.lit("uri")
        else:
            obj = F.col(c).cast("string")
            kind = (
                F.lit("number")
                if dict(df.dtypes)[c] in ("bigint", "int", "double", "float", "decimal")
                else F.lit("text")
            )
        parts.append(
            F.struct(
                subj.alias("s"), F.lit(c).alias("p"), obj.alias("o"), kind.alias("okind")
            )
        )
    return (
        df.select(F.explode(F.array(*parts)).alias("t"))
        .select("t.s", "t.p", "t.o", "t.okind")
        .where(F.col("o").isNotNull())
    )


def tpch_triples(spark, sf_dir: str) -> DataFrame:
    """The TPC-H-ish star schema as one triple dataset (multi-graph analog:
    graph = source table)."""
    load = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    specs = [
        ("customer", "c_custkey", {"c_nationkey": "nation"}),
        ("orders", "o_orderkey", {"o_custkey": "customer"}),
        ("supplier", "s_suppkey", {"s_nationkey": "nation"}),
        ("nation", "n_nationkey", {"n_regionkey": "region"}),
        ("region", "r_regionkey", {}),
        ("part", "p_partkey", {}),
    ]
    out = None
    for table, pk, fks in specs:
        t = table_to_triples(load(table), table, pk, fks).withColumn("g", F.lit(table))
        out = t if out is None else out.unionByName(t)
    return out
