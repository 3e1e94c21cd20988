"""Checkpoint/resume + per-partition lineage metrics (north-star
requirement; reference analog http:task/Pipeline.scala:40-46)."""

from __future__ import annotations

import json
import os

from rdfrules_spark import corpus
from rdfrules_spark.checkpointing import (
    read_stage_manifest,
    run_pipeline_checkpointed,
    write_stage,
)

FP = {"docs": 120, "seed": corpus.SEED}


def test_write_stage_resume_and_metrics(spark, tmp_path):
    wd = str(tmp_path)
    df = spark.range(0, 1000).selectExpr("id", "id % 7 as k")
    out1 = write_stage(df, wd, "s1", {"v": 1})
    assert out1.count() == 1000

    manifest = read_stage_manifest(wd, "s1")
    assert manifest["n_rows"] == 1000
    with open(os.path.join(wd, "s1", "_METRICS.json")) as f:
        metrics = json.load(f)
    assert sum(m["rows"] for m in metrics) == 1000
    assert len(metrics) == manifest["n_partitions"]

    # resume: same fingerprint -> parquet read back, manifest untouched
    mtime = os.path.getmtime(os.path.join(wd, "s1", "_MANIFEST.json"))
    out2 = write_stage(spark.range(0, 5).toDF("id"), wd, "s1", {"v": 1})
    assert out2.count() == 1000  # the NEW df was never executed
    assert os.path.getmtime(os.path.join(wd, "s1", "_MANIFEST.json")) == mtime

    # changed fingerprint -> recompute
    out3 = write_stage(spark.range(0, 5).toDF("id"), wd, "s1", {"v": 2})
    assert out3.count() == 5


def test_pipeline_checkpointed_end_to_end(spark, tmp_path):
    wd = str(tmp_path)
    docs = corpus.synth_documents(spark, 120)
    stages = run_pipeline_checkpointed(spark, docs, wd, 60, FP)
    n1 = stages["triples"].count()
    assert n1 > 0
    assert stages["pred_stats"].count() > 0
    # triple store is predicate-bucketed on disk (partition pruning works)
    assert any(
        e.startswith("pred_bucket=")
        for e in os.listdir(os.path.join(wd, "triples", "data"))
    )

    # second run resumes every stage (no manifest rewrite)
    mtimes = {
        n: os.path.getmtime(os.path.join(wd, n, "_MANIFEST.json"))
        for n in stages
    }
    stages2 = run_pipeline_checkpointed(spark, docs, wd, 60, FP)
    assert stages2["triples"].count() == n1
    for n in stages:
        assert os.path.getmtime(
            os.path.join(wd, n, "_MANIFEST.json")
        ) == mtimes[n], f"stage {n} was not resumed"
