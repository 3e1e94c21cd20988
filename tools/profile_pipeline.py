"""Stage-level wall-clock profile of the KG-construction pipeline.

Usage: python tools/profile_pipeline.py <master> <n_docs>
Prints one JSON line of per-stage seconds — the decomposition tool behind
BENCH.md's scaling analysis (which stages are per-byte vs per-job).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000

    from pyspark.sql import functions as F

    from rdfrules_spark import corpus, dictionary, extraction, linking
    from rdfrules_spark.canonicalize import canonicalize_triples
    from rdfrules_spark.session import get_spark

    # shuffle partitions from total cores of the topology
    if master.startswith("local-cluster"):
        n_exec, n_cores = master.split("[")[1].rstrip("]").split(",")[:2]
        total = int(n_exec) * int(n_cores)
    else:
        total = int(master.split("[")[1].rstrip("]"))
    # local-cluster executors run separate JVMs whose Python workers don't
    # inherit the driver's sys.path — ship the package path explicitly
    # (the spark-submit analog is --py-files, tools/submit_job.py)
    spark = get_spark(
        "profile",
        master=master,
        shuffle_partitions=total,
        extra_conf={
            "spark.executorEnv.PYTHONPATH": "/root/repo",
            # match bench.py: keep the small-file doc-table scan wide
            "spark.sql.files.maxPartitionBytes": str(16 << 20),
        },
    )
    t: dict[str, float] = {}

    def tick(name: str, t0: float) -> float:
        t[name] = round(time.perf_counter() - t0, 2)
        return time.perf_counter()

    # input = materialized IceTable of interleaved docs (north-rule input
    # contract; generation is untimed scaffolding — see bench.prepare_kg_docs)
    from bench import prepare_kg_docs
    from rdfrules_spark.sources.icetable import IceTable

    docs_path = prepare_kg_docs(spark, n_docs)
    # untimed warm-up (same rationale as bench.run_bench)
    extraction.extract_statements(
        corpus.synth_documents(spark, 2000)
    ).groupBy("p").count().count()
    t0 = time.perf_counter()
    docs = IceTable.load(spark, docs_path).scan()
    candidates = linking.alias_candidates(
        spark, corpus.n_entities_for(n_docs)
    )
    statements = extraction.extract_statements(docs).localCheckpoint(
        eager=True
    )
    t0 = tick("extract_ckpt", t0)
    # round-4 pipeline shape: only the link MAP is materialized; the
    # linked stream is a lazy broadcast-probe over the statements
    # checkpoint (see pipeline.run_pipeline)
    link = linking.build_link_map(statements, candidates).localCheckpoint(
        eager=True
    )
    n_map = link.count()
    linked = linking.apply_link_map(statements, link, n_map)
    t0 = tick("link_map_ckpt", t0)
    rels, sameas = linking.split_sameas(linked)
    canon_rels, canon_map = canonicalize_triples(rels, sameas)
    t0 = tick("cc_canon_plan", t0)
    triples_str = canon_rels.select("s", "p", "o").distinct()
    dict_df = dictionary.build_dictionary(triples_str)
    triples = dictionary.encode_triples(triples_str)
    n = triples.count()
    t0 = tick("rewrite_distinct_encode_count", t0)
    n_stmt = linked.count()
    t0 = tick("linked_count", t0)
    out = {
        "master": master,
        "n_docs": n_docs,
        "triples": n,
        "statements": n_stmt,
        "total_sec": round(sum(t.values()), 2),
        "stages": t,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
