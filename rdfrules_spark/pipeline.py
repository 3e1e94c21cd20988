"""End-to-end KG-construction pipeline (the north-star job).

documents -> extraction -> linking -> canonicalization -> triple store.

Each stage is a pure DataFrame->DataFrame function; `run_pipeline` composes
them lazily (one Catalyst plan up to the CC iteration, which is inherently
iterative). `materialize` adds checkpoint/lineage manifests (plans/).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfrules_spark import corpus, dictionary, extraction, linking
from rdfrules_spark.canonicalize import canonicalize_triples


@dataclass
class PipelineResult:
    statements: DataFrame
    relations: DataFrame          # canonical string triples (doc_id, s, p, o)
    canon_map: DataFrame
    triples: DataFrame            # encoded (s, p, o, g, pred_bucket)
    dict_df: DataFrame
    pred_stats: DataFrame
    # checkpointed linked statements (doc_id, stmt_no, s, p, o): counting
    # this is free; counting `statements` replays generation + the
    # extraction UDF (it is the only pre-checkpoint handle)
    linked: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    candidates: DataFrame | None = None,
    n_entities: int | None = None,
) -> PipelineResult:
    if candidates is None:
        if n_entities is None:
            raise ValueError("need candidates or n_entities")
        candidates = linking.alias_candidates(spark, n_entities)

    # materialize the extracted statements ONCE: the link stage consumes
    # them three times (s-surface scan + o-surface scan inside the link
    # map's distinct, then the join probe), and a lazy plan re-executes the
    # per-doc generation + extraction UDF — the single most expensive
    # compute — once per consumer (measured 3x at 960k docs)
    statements = extraction.extract_statements(documents).localCheckpoint(
        eager=True
    )
    # materialize the linked statements ONCE: the CC stage consumes them
    # three times (node seed, symmetric edge set, final rewrite join) and a
    # lazy plan would replay the extraction pandas UDF + link join per
    # consumer — a serial re-execution that caps scaling efficiency (the
    # N-vs-4N criterion) well below 0.8. One barrier here buys
    # single-execution lineage for every downstream stage; the durable
    # variant (checkpointing.run_pipeline_checkpointed) persists the same
    # cut to parquet with a manifest.
    # The checkpoint freezes the link join's output partitioning for every
    # downstream first stage. With statements checkpointed wide (above),
    # a broadcast link join preserves that width and no shuffle is needed;
    # but if the plan came back narrow (AQE coalescing, a shuffle-join link
    # at huge map sizes), re-cut at session parallelism — measured 8
    # frozen partitions / 1.56M rows at local[32] before this guard, which
    # flattened the N-vs-4N speedup to ~1x.
    linked = linking.link_statements(statements, candidates).localCheckpoint(
        eager=True
    )
    parallelism = spark.sparkContext.defaultParallelism
    if linked.rdd.getNumPartitions() < parallelism:
        linked = linked.repartition(parallelism, "doc_id").localCheckpoint(
            eager=True
        )
    rels, sameas = linking.split_sameas(linked)
    canon_rels, canon_map = canonicalize_triples(rels, sameas)
    canon_rels = canon_rels.select("doc_id", "s", "p", "o")

    triples_str = canon_rels.select("s", "p", "o")
    dict_df = dictionary.build_dictionary(triples_str)
    # dedup AFTER hash-encoding: ids are deterministic content hashes, so
    # encode-then-distinct == distinct-then-encode, and the distinct
    # shuffles fixed-width longs (~36 B/row) instead of IRI strings
    # (~2-3x the bytes) — the dominant shuffle of the pipeline tail
    triples = dictionary.encode_triples(triples_str).distinct()
    stats = dictionary.predicate_stats(triples)
    return PipelineResult(
        statements, canon_rels, canon_map, triples, dict_df, stats, linked
    )


def flagship_query(result: PipelineResult) -> DataFrame:
    """Headline validation aggregate: canonical triple count + distinct
    subjects/objects per predicate, ordered by count desc."""
    return (
        result.relations.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_statements"),
            F.countDistinct("s", "o").alias("n_triples"),
            F.countDistinct("s").alias("n_subjects"),
            F.countDistinct("o").alias("n_objects"),
        )
        .orderBy(F.desc("n_triples"), "p")
    )


def synth_pipeline(
    spark: SparkSession, n_docs: int, seed: int = corpus.SEED
) -> PipelineResult:
    docs = corpus.synth_documents(spark, n_docs, seed)
    return run_pipeline(spark, docs, n_entities=corpus.n_entities_for(n_docs))
