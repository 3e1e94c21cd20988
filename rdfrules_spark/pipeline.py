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
    # linked statements (doc_id, stmt_no, s, p, o): a LAZY broadcast-probe
    # plan over the statements checkpoint — an action re-runs one cheap
    # map-side pass (never the extraction UDF; that sits behind the
    # checkpoint). `statements` is the only pre-checkpoint handle — an
    # action on it replays generation + extraction.
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
    # compute — once per consumer (measured 3x at 960k docs). This is the
    # pipeline's ONLY full-width barrier: everything downstream is either
    # a small materialization (link map, sameAs edges, canon map) or a
    # lazy re-probe of this checkpoint.
    # Materialized via the SQL columnar cache (persist + eager count), not
    # localCheckpoint: InMemoryRelation stores dictionary/RLE-compressed
    # column batches, so each of the ~4 downstream scans moves a fraction
    # of the bytes an UnsafeRow block scan would — on one box every
    # executor shares a single memory bus, and at 32 cores the pipeline is
    # bandwidth-bound, not core-bound (BENCH.md round 4). No eager count:
    # the first consumer (the link-map build, a SINGLE scan since its
    # surface explode) populates the cache as a side effect — one fewer
    # full pass and job barrier.
    statements = extraction.extract_statements(documents).persist()
    # The link map (distinct surfaces -> best candidate IRI) is small
    # relative to the stream (432k rows for 6.2M statements at 960k docs)
    # and feeds THREE consumers: the s-side join, the o-side join, and the
    # dictionary fast path below — one eager cut, reused everywhere.
    link = linking.build_link_map(statements, candidates).localCheckpoint(
        eager=True
    )
    n_map = link.count()
    # The linked stream is LAZY in the broadcast regime, materialized in
    # the shuffle regime — a cost-based rule on the measured 1M-row
    # broadcast/shuffle-hash crossover (linking.apply_link_map):
    #   * link map fits a broadcast: re-deriving `linked` is one map-side
    #     pass over the statements checkpoint (probe two broadcast hash
    #     tables, zero shuffle) — cheap perfectly-parallel work, so the
    #     ~3 downstream consumers (sameAs edge scan, triple tail,
    #     statement count) just re-run it. Round 3 checkpointed here
    #     unconditionally, and that 25M-row full-width write through one
    #     box's block manager profiled as the worst-scaling component of
    #     the N-vs-4N topology (~1.3x from 8 to 32 cores).
    #   * link map too big to broadcast (the 100 TB posture): the join is
    #     two data-wide shuffles; re-executing THOSE per consumer is the
    #     expensive path, so the join output is cut once and consumers
    #     scan the checkpoint (measured at 3.84M docs / 2.2M-row map:
    #     repeated shuffle joins put a 25M-row double shuffle in every
    #     downstream action).
    linked = linking.apply_link_map(statements, link, n_map)
    # NOTE the 1M persist gate is deliberately LOWER than apply_link_map's
    # 4M broadcast crossover: between 1M and 4M map rows the join is still
    # a broadcast probe, but the ~3 downstream consumers re-probing two
    # 80MB+ hash tables over the full statements cache cost more than one
    # persist (measured round 5 at 3.84M docs / 1.63M-row map, 16 cores:
    # re-probe regime 36.4 s vs persist regime 24.3 s min-of-3).
    if n_map > 1_000_000:
        linked = linked.persist()
        linked.count()
    rels, sameas = linking.split_sameas(linked)
    canon_rels, canon_map = canonicalize_triples(rels, sameas)
    canon_rels = canon_rels.select("doc_id", "s", "p", "o")

    triples_str = canon_rels.select("s", "p", "o")
    # Dictionary fast path: every s/o term of canon_rels is by construction
    # canon(link.iri) — the link map assigns every distinct surface an IRI
    # and canonicalization rewrites through the canon map — so the term
    # dictionary is derivable from the SMALL side (|link map| + |predicate
    # vocabulary|) instead of a distinct-shuffle over the full triple
    # stream (3 columns x 25M rows). At the 100 TB posture this turns the
    # dictionary build from a second full-data shuffle into a dimension-
    # table pass. Superset note: an IRI whose surfaces occur ONLY in aka
    # statements contributes a dictionary row without a triple — same
    # items the reference's TripleItemHashIndex interns (it dictionaries
    # sameAs statement terms before collapsing them,
    # core:index/TripleItemHashIndex.scala:68-82).
    dict_df = dictionary.dictionary_from_terms(
        link.select(F.col("iri").alias("node"))
        .distinct()
        .join(canon_map, "node", "left")
        .select(F.coalesce("canon", "node").alias("item"))
        .unionAll(
            # the sameAs cue predicate never becomes a triple (split_sameas
            # drops it, as the reference drops owl:sameAs statements) — keep
            # it out of the dictionary like the stream scan would
            statements.where(F.col("p") != linking.AKA)
            .select(F.col("p").alias("item"))
            .distinct()
        )
        .distinct()
    )
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
