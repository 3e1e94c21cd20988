"""Stage checkpointing with resume + per-partition lineage/metrics.

North-star requirement (BASELINE.json): "every stage must be resumable from
checkpoint with per-partition lineage and metrics". Reference analog: the
HTTP pipeline's cache short-circuit (http:task/Pipeline.scala:40-46 — a
CacheTask replaces its whole prefix with a cache load) and the binary cache
ops (core:data/ops/Cacheable.scala:29-70).

Model: a *stage* is a named DataFrame with a `fingerprint` — a dict of
everything that determines its content (upstream stage fingerprints, params,
input snapshot ids). `write_stage` materializes it under
``<workdir>/<name>/`` as parquet plus:

  _MANIFEST.json   {name, fingerprint, schema, n_rows, n_partitions,
                    written_utc}
  _METRICS.json    per-partition lineage: [{partition, rows}] gathered with
                   spark_partition_id() in the SAME job that writes (one
                   extra narrow aggregation, no second scan of the input).

Resume: if the stage directory holds a manifest whose fingerprint matches,
the parquet is read back and the upstream plan is never executed — the
whole-pipeline analog of Pipeline's cache short-circuit. Works per stage, so
a 5-stage job killed after stage 3 re-runs only stages 4-5.

Scale notes: the metrics aggregation is `groupBy(spark_partition_id)` —
map-side combinable, output rows = #partitions, negligible at any scale.
The parquet write is the checkpoint barrier that truncates lineage for
downstream stages (same role as localCheckpoint but durable + resumable).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _canon(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def stage_is_current(workdir: str, name: str, fingerprint: dict) -> bool:
    mpath = os.path.join(workdir, name, "_MANIFEST.json")
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return _canon(manifest.get("fingerprint")) == _canon(fingerprint)


def write_stage(
    df: DataFrame,
    workdir: str,
    name: str,
    fingerprint: dict,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Materialize ``df`` as stage ``name``; resume if already current.

    Returns the stage read back from parquet (downstream plans start from
    the checkpoint, not the upstream lineage).
    """
    spark = df.sparkSession
    path = os.path.join(workdir, name)
    data_path = os.path.join(path, "data")
    if stage_is_current(workdir, name, fingerprint):
        return spark.read.parquet(data_path)

    os.makedirs(path, exist_ok=True)
    # invalidate FIRST: the old manifest must be gone before any data byte
    # changes, else a crash mid-overwrite leaves the previous fingerprint's
    # manifest next to partial new data and a later run with that old
    # fingerprint (e.g. a reverted parameter) would resume the corrupt stage
    mpath = os.path.join(path, "_MANIFEST.json")
    if os.path.exists(mpath):
        os.remove(mpath)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_path)

    # per-partition lineage/metrics on the materialized stage (reads the
    # just-written parquet footers + one narrow aggregation)
    out = spark.read.parquet(data_path)
    metrics = [
        {"partition": r["pid"], "rows": r["rows"]}
        for r in out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    ]
    n_rows = sum(m["rows"] for m in metrics)
    with open(os.path.join(path, "_METRICS.json"), "w") as f:
        json.dump(metrics, f)
    # manifest LAST (and removed before the overwrite above): its
    # presence-and-match is the commit point, so a crash at ANY point
    # between invalidation and here leaves a non-resumable stage, never a
    # resumable-but-corrupt one
    with open(mpath, "w") as f:
        json.dump(
            {
                "name": name,
                "fingerprint": fingerprint,
                "schema": out.schema.jsonValue(),
                "n_rows": n_rows,
                "n_partitions": len(metrics),
                "written_utc": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            },
            f,
        )
    return out


def read_stage_manifest(workdir: str, name: str) -> dict | None:
    mpath = os.path.join(workdir, name, "_MANIFEST.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


def run_pipeline_checkpointed(
    spark: SparkSession,
    documents: DataFrame,
    workdir: str,
    n_entities: int,
    corpus_fingerprint: dict,
):
    """The north-star pipeline with a durable checkpoint after every stage.

    Each stage's fingerprint chains the upstream one, so editing any
    upstream parameter invalidates exactly the suffix that depends on it.
    Returns a dict of stage name -> DataFrame (all checkpoint-backed).
    """
    from rdfrules_spark import dictionary, extraction, linking
    from rdfrules_spark.canonicalize import canonicalize_triples

    fp0 = {"corpus": corpus_fingerprint, "v": 1}
    statements = write_stage(
        extraction.extract_statements(documents), workdir, "statements", fp0
    )

    fp1 = {"up": fp0, "op": "link", "n_entities": n_entities}
    candidates = linking.alias_candidates(spark, n_entities)
    linked = write_stage(
        linking.link_statements(statements, candidates), workdir, "linked", fp1
    )

    rels, sameas = linking.split_sameas(linked)
    fp2 = {"up": fp1, "op": "canonicalize"}
    canon_rels, canon_map = canonicalize_triples(rels, sameas)
    relations = write_stage(
        canon_rels.select("doc_id", "s", "p", "o"), workdir, "relations", fp2
    )
    canon = write_stage(
        canon_map, workdir, "canon_map", {"up": fp2, "out": "canon_map"}
    )

    fp3 = {"up": fp2, "op": "triple_store"}
    triples_str = relations.select("s", "p", "o")
    dict_df = write_stage(
        dictionary.build_dictionary(triples_str), workdir, "dictionary",
        {"up": fp3, "out": "dict"},
    )
    # dedup after hash-encoding: fixed-width long shuffle, same result
    # (ids are deterministic content hashes) — see pipeline.run_pipeline
    triples = write_stage(
        dictionary.encode_triples(triples_str).distinct(), workdir,
        "triples", fp3, partition_by=["pred_bucket"],
    )
    stats = write_stage(
        dictionary.predicate_stats(triples), workdir, "pred_stats",
        {"up": fp3, "out": "stats"},
    )
    return {
        "statements": statements,
        "linked": linked,
        "relations": relations,
        "canon_map": canon,
        "dictionary": dict_df,
        "triples": triples,
        "pred_stats": stats,
    }
