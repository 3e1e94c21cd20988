"""spark-submit entry point for the KG-construction pipeline.

Packaging evidence for the north-star launch requirement:

    cd /root/repo && zip -qr /tmp/rdfrules_spark.zip rdfrules_spark
    spark-submit --master 'local[8]' --py-files /tmp/rdfrules_spark.zip \
        tools/submit_job.py <n_docs> [workdir]

On a real cluster the same command targets yarn/k8s; the package rides in
--py-files, the checkpoint workdir moves to object storage. Prints one JSON
line with stage row counts from the checkpoint manifests.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="kg_stages_"
    )
    spark = SparkSession.builder.appName("rdfrules-kg-submit").getOrCreate()

    from rdfrules_spark import corpus
    from rdfrules_spark.checkpointing import (
        read_stage_manifest,
        run_pipeline_checkpointed,
    )

    docs = corpus.synth_documents(spark, n_docs)
    stages = run_pipeline_checkpointed(
        spark, docs, workdir, corpus.n_entities_for(n_docs),
        {"n_docs": n_docs, "seed": corpus.SEED},
    )
    out = {
        name: (read_stage_manifest(workdir, name) or {}).get("n_rows")
        for name in stages
    }
    out["workdir"] = workdir
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
