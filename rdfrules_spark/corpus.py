"""Deterministic synthetic corpus of interleaved text+media documents.

Input contract (BASELINE.json input_hint): a table
  documents(doc_id string, spans array<struct<kind string, text string,
                                              media_ref string, offset int>>)
with text spans embedding extractable entity mentions / relation cues and
media spans interleaved between them (FIXTURES.md §1).

Two producers:
  * :func:`synth_documents` — grammar-based corpus with Zipf-skewed entities,
    alias ("aka" / owl:sameAs cue) statements, media spans. Generated
    distributedly via ``mapInPandas`` over ``spark.range`` — per-doc RNG is
    counter-based (numpy Philox keyed by (seed, doc_idx)) so any partitioning
    of the id range yields byte-identical documents: no driver-side loop, no
    cross-partition coordination, linear scale-out.
  * :func:`derive_documents` — deterministic reshaping of the driver-provided
    ``documents.parquet`` (plain text rows) into the interleaved-span shape,
    pure DataFrame ops (no UDF), used by ``__spark_entry__.entry``/bench.

Grammar (mirrors the *role* of RDFRules' RDF input — each sentence is one
triple statement; ``aka`` plays owl:sameAs, cf. reference
core:data/TripleItem.scala:24 special-casing of sameAs):

    filler* <SURF> PREDICATE <SURF> .

where SURF is an entity surface form; entities with ``idx % ALIAS_MOD == 3``
also have an alias surface ``E{idx}x`` introduced by ``aka`` sentences.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42

# Relation predicates, most-frequent first; sampled with Zipf(1.1) weights so
# predicate frequencies are skewed (FIXTURES.md §1 skew requirement).
PREDICATES = [
    "works_for", "born_in", "located_in", "ceo_of", "part_of", "member_of",
    "owns", "founded", "studied_at", "married_to", "influenced", "adjacent_to",
]
AKA = "aka"          # the owl:sameAs cue
AKA_PROB = 0.10      # fraction of sentences that are alias statements
ALIAS_MOD = 7        # entities with idx % ALIAS_MOD == 3 have an alias surface
MEDIA_KINDS = ["image", "video", "audio"]
MEDIA_PROB = 0.4     # chance of a media span in each inter-text gap
FILLERS = ["meanwhile", "reportedly", "sources", "confirm", "that", "today"]
ZIPF_A = 1.1

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)
DOCUMENTS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.StringType()), T.StructField("spans", SPAN_SCHEMA)]
)


def n_entities_for(n_docs: int) -> int:
    return max(50, n_docs // 2)


def has_alias(idx: int) -> bool:
    return idx % ALIAS_MOD == 3


def surface(idx: int, alias: bool = False) -> str:
    return f"E{idx}x" if alias else f"E{idx}"


def iri(surf: str) -> str:
    return f"ent:{surf}"


def _zipf_cdf(n: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), ZIPF_A)
    return np.cumsum(w / w.sum())


def _zipf_sample(rng, cdf: np.ndarray, size: int) -> np.ndarray:
    return np.searchsorted(cdf, rng.random(size), side="right")


def gen_doc(doc_idx: int, n_ent: int, seed: int = SEED,
            ent_cdf: np.ndarray | None = None,
            pred_cdf: np.ndarray | None = None) -> tuple[str, list[tuple]]:
    """Generate one document. Pure + deterministic in (seed, doc_idx, n_ent).

    Returns (doc_id, [(kind, text, media_ref, offset), ...]).
    """
    if ent_cdf is None:
        ent_cdf = _zipf_cdf(n_ent)
    if pred_cdf is None:
        pred_cdf = _zipf_cdf(len(PREDICATES))
    rng = np.random.Generator(np.random.Philox(key=[seed, doc_idx]))
    n_sent = int(3 + rng.integers(0, 8))

    subs = _zipf_sample(rng, ent_cdf, n_sent)
    objs = _zipf_sample(rng, ent_cdf, n_sent)
    preds = _zipf_sample(rng, pred_cdf, n_sent)
    is_aka = rng.random(n_sent) < AKA_PROB
    use_alias_s = rng.random(n_sent) < 0.3
    use_alias_o = rng.random(n_sent) < 0.3
    n_fill = rng.integers(0, 3, n_sent)
    fill_pick = rng.integers(0, len(FILLERS), (n_sent, 2))

    sentences: list[str] = []
    for i in range(n_sent):
        s_idx, o_idx = int(subs[i]), int(objs[i])
        if is_aka[i] and has_alias(s_idx):
            # canonical-subject aka alias-object: object id merges into
            # subject id (reference TripleItemHashIndex.scala:68-82).
            sent = f"<{surface(s_idx)}> {AKA} <{surface(s_idx, True)}> ."
        else:
            s_surf = surface(s_idx, use_alias_s[i] and has_alias(s_idx))
            o_surf = surface(o_idx, use_alias_o[i] and has_alias(o_idx))
            sent = f"<{s_surf}> {PREDICATES[int(preds[i])]} <{o_surf}> ."
        fillers = " ".join(FILLERS[int(fill_pick[i, j])] for j in range(int(n_fill[i])))
        sentences.append((fillers + " " + sent).strip())

    # Group sentences into text spans of 1-3 sentences, interleave media spans.
    spans: list[tuple] = []
    offset = 0
    i = 0
    gap = 0
    while i < n_sent:
        take = int(1 + rng.integers(0, 3))
        text = " ".join(sentences[i : i + take])
        spans.append(("text", text, "", offset))
        offset += len(text) + 1
        i += take
        if rng.random() < MEDIA_PROB:
            kind = MEDIA_KINDS[int(rng.integers(0, len(MEDIA_KINDS)))]
            ref = f"media://{doc_idx}/{gap}.{kind[:3]}"
            spans.append((kind, "", ref, offset))
            offset += 1
        gap += 1
    return f"doc_{doc_idx:08d}", spans


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = SEED,
    n_entities: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: same (seed, n_docs) → same table."""
    n_ent = n_entities or n_entities_for(n_docs)
    if partitions is None:
        partitions = max(1, min(64, n_docs // 250 or 1))

    def gen_batches(batches):
        ent_cdf = _zipf_cdf(n_ent)
        pred_cdf = _zipf_cdf(len(PREDICATES))
        import pandas as pd

        for pdf in batches:
            rows = [
                gen_doc(int(idx), n_ent, seed, ent_cdf, pred_cdf)
                for idx in pdf["id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "spans": [
                        [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in r[1]
                        ]
                        for r in rows
                    ],
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen_batches, schema=DOCUMENTS_SCHEMA)
    )


def derive_documents(docs: DataFrame, sentence_tokens: int = 9) -> DataFrame:
    """Reshape the driver's plain-text documents table into the interleaved
    span shape — pure DataFrame ops, fully deterministic, no UDF.

    Text is chunked into sentences of ``sentence_tokens`` tokens (each later
    yields triples via the window-3 extraction rule); a media span is
    interleaved after sentence j when (doc_id*31 + j) % 3 == 0.
    """
    toks = F.split(F.col("text"), " ")
    n_sent = F.ceil(F.size(toks) / F.lit(sentence_tokens)).cast("int")
    sent_idx = F.sequence(F.lit(0), n_sent - 1)

    sentence = lambda j: F.concat_ws(  # noqa: E731
        " ", F.slice(toks, j * sentence_tokens + 1, sentence_tokens)
    )
    with_media = lambda j: (F.col("doc_id") * 31 + j) % 3 == 0  # noqa: E731

    spans = F.flatten(
        F.transform(
            sent_idx,
            lambda j: F.when(
                with_media(j),
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        sentence(j).alias("text"),
                        F.lit("").alias("media_ref"),
                        (j * 100).cast("int").alias("offset"),
                    ),
                    F.struct(
                        F.lit("image").alias("kind"),
                        F.lit("").alias("text"),
                        F.concat(
                            F.lit("media://"), F.col("doc_id"), F.lit("/"), j
                        ).alias("media_ref"),
                        (j * 100 + 50).cast("int").alias("offset"),
                    ),
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        sentence(j).alias("text"),
                        F.lit("").alias("media_ref"),
                        (j * 100).cast("int").alias("offset"),
                    )
                )
            ),
        )
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans")
    )
