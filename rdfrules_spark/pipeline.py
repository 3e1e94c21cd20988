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

    statements = extraction.extract_statements(documents)
    # materialize the linked statements ONCE: the CC stage consumes them
    # three times (node seed, symmetric edge set, final rewrite join) and a
    # lazy plan would replay the extraction pandas UDF + link join per
    # consumer — a serial re-execution that caps scaling efficiency (the
    # N-vs-4N criterion) well below 0.8. One barrier here buys
    # single-execution lineage for every downstream stage; the durable
    # variant (checkpointing.run_pipeline_checkpointed) persists the same
    # cut to parquet with a manifest.
    # Repartition to the session parallelism before the cut: the link
    # join's output partitioning (a broadcast join inherits it from
    # upstream, AQE may have coalesced it) is frozen by the checkpoint and
    # every downstream first stage is capped at that width — measured 8
    # partitions / 1.56M rows at local[32], which flattened the N-vs-4N
    # speedup to ~1x. Hash by doc_id so per-doc locality survives.
    linked = (
        linking.link_statements(statements, candidates)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .localCheckpoint(eager=True)
    )
    rels, sameas = linking.split_sameas(linked)
    canon_rels, canon_map = canonicalize_triples(rels, sameas)
    canon_rels = canon_rels.select("doc_id", "s", "p", "o")

    triples_str = canon_rels.select("s", "p", "o").distinct()
    dict_df = dictionary.build_dictionary(triples_str)
    triples = dictionary.encode_triples(triples_str)
    stats = dictionary.predicate_stats(triples)
    return PipelineResult(statements, canon_rels, canon_map, triples, dict_df, stats)


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
