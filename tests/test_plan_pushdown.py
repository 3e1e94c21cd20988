"""Physical-plan guarantees on the predicate-bucketed triple store.

The 100 TB contract is that per-predicate access is a PRUNED scan, not a
full pass: pred_bucket is a partition column (PartitionFilters), the
predicate-id filter reaches the parquet reader (PushedFilters), and column
pruning narrows ReadSchema to the projected columns. These assertions pin
the plan, so a regression that silently widens the scan fails loudly.
(Spark analog of the reference's p-first hash forests —
core:index/TripleHashIndex.scala.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfrules_spark import dictionary
from rdfrules_spark.corpus import synth_kg


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_triple_store_scan_is_pruned(spark, tmp_path):
    triples = dictionary.encode_triples(
        synth_kg(spark, 5000).select("s", "p", "o")
    ).distinct()
    path = str(tmp_path / "store")
    dictionary.write_triple_store(triples, path)

    store = spark.read.parquet(path)
    some = store.select("p", "pred_bucket").head()
    q = store.where(
        (F.col("pred_bucket") == some["pred_bucket"])
        & (F.col("p") == some["p"])
    ).select("s", "o")
    plan = _plan(q)

    # partition pruning: the bucket predicate is a PartitionFilter, so
    # only matching directories are listed/scanned
    assert "PartitionFilters" in plan and "pred_bucket" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    # predicate pushdown: the p filter reaches the parquet reader
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "p" in pushed and "IsNotNull" in pushed or "EqualTo" in pushed
    # column pruning: the scan reads only the projected + filter columns,
    # never the full row
    read_schema = plan.split("ReadSchema", 1)[1].splitlines()[0]
    fields = [
        f.split(":")[0]
        for f in read_schema.split("<", 1)[1].rstrip(">").split(",")
    ]
    assert "s" in fields and "o" in fields
    assert "g" not in fields

    # and the pruned scan returns exactly the per-predicate slice
    expected = triples.where(F.col("p") == some["p"]).count()
    assert q.count() == expected
