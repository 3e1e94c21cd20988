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
        # ~1k docs per task: small enough that a stage is many waves deep
        # at any local[N] (64 partitions = exactly 2 waves at 32 threads,
        # and per-task skew in the Python generation left most threads
        # idle in the last wave — measured local[32] SLOWER than local[8]
        # at 960k docs), large enough that Arrow batching stays efficient.
        partitions = max(1, min(512, n_docs // 1000 or 1))

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
    # the token array is bound as a lambda variable so the split runs once
    # per document — F.slice(toks, ...) inside the per-sentence lambda would
    # otherwise re-split the whole text per sentence (no CSE through lambda
    # bodies; same pitfall as operators/dedup.shingles)
    def spans_of(toks):
        n_sent = F.ceil(F.size(toks) / F.lit(sentence_tokens)).cast("int")
        sent_idx = F.sequence(F.lit(0), n_sent - 1)

        sentence = lambda j: F.concat_ws(  # noqa: E731
            " ", F.slice(toks, j * sentence_tokens + 1, sentence_tokens)
        )
        with_media = lambda j: (F.col("doc_id") * 31 + j) % 3 == 0  # noqa: E731

        return F.flatten(
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

    spans = F.get(
        F.transform(F.array(F.split(F.col("text"), " ")), spans_of), 0
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans")
    )


# --------------------------------------------------------------------------
# Direct synthetic KG (mining benchmark input — the analog of the
# reference's yago2core ~1M-triple benchmark dataset, experiments/README.md:53)
# --------------------------------------------------------------------------

_SM1 = np.uint64(0x9E3779B97F4A7C15)
_SM2 = np.uint64(0xBF58476D1CE4E5B9)
_SM3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized counter-based hashing, so the
    generated KG is identical under ANY partitioning of the id range."""
    with np.errstate(over="ignore"):
        x = (x + _SM1).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _SM2
        x ^= x >> np.uint64(27)
        x *= _SM3
        x ^= x >> np.uint64(31)
    return x


def _u01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    h = _mix64(
        ids.astype(np.uint64)
        * np.uint64(1_000_003) + np.uint64(stream * 7_919 + seed)
    )
    return h.astype(np.float64) / 18_446_744_073_709_551_616.0


def synth_kg(
    spark: SparkSession,
    n_triples: int,
    n_entities: int | None = None,
    n_predicates: int = 40,
    entity_zipf: float = 0.5,
    predicate_zipf: float = 1.1,
    copy_frac: float = 0.3,
    seed: int = SEED,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic (s, p, o) string-triple generator with tunable skew
    and REAL rule structure.

    entity_zipf defaults to 0.5 (mild, yago-like hub structure); the corpus
    pipeline's Zipf-1.1 entities are deliberately harsher (they exercise the
    skew handling of CC/extraction), which makes exact rule mining
    quadratic in hub degree — mining benchmarks use this generator instead.

    ``copy_frac`` of the rows restate a *donor* triple (donor id = hash of
    own id; a pure function, so still partitioning-independent) under a
    partner predicate: same-direction partner ``p^1`` for even/odd pairs, or
    the inverse partner ``(p+2) % n_predicates`` with (s,o) swapped. This
    plants mineable rules (?a p1 ?b) <= (?a p0 ?b) and (?a p2 ?b) <=
    (?b p0 ?a) whose support/confidence scale with copy_frac.
    """
    n_ent = n_entities or max(1000, n_triples // 10)
    if partitions is None:
        partitions = max(4, min(64, n_triples // 50_000 or 4))

    def gen(batches):
        import pandas as pd

        w_e = 1.0 / np.power(np.arange(1, n_ent + 1, dtype=np.float64),
                             entity_zipf)
        ent_cdf = np.cumsum(w_e / w_e.sum())
        w_p = 1.0 / np.power(np.arange(1, n_predicates + 1, dtype=np.float64),
                             predicate_zipf)
        pred_cdf = np.cumsum(w_p / w_p.sum())
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            is_copy = _u01(ids, 3, seed) < copy_frac
            donor = (_mix64(ids.astype(np.uint64) + np.uint64(seed))
                     % np.uint64(n_triples)).astype(np.int64)
            src = np.where(is_copy, donor, ids)
            s = np.searchsorted(ent_cdf, _u01(src, 0, seed), side="right")
            p = np.searchsorted(pred_cdf, _u01(src, 1, seed), side="right")
            o = np.searchsorted(ent_cdf, _u01(src, 2, seed), side="right")
            inverse = is_copy & (_u01(ids, 4, seed) < 0.5)
            samedir = is_copy & ~inverse
            p = np.where(samedir, p ^ 1, p)
            p = np.where(inverse, (p + 2) % n_predicates, p)
            s2 = np.where(inverse, o, s)
            o2 = np.where(inverse, s, o)
            yield pd.DataFrame(
                {
                    "s": [f"e{v}" for v in s2],
                    "p": [f"p{v}" for v in p],
                    "o": [f"e{v}" for v in o2],
                }
            )

    return (
        spark.range(0, n_triples, numPartitions=partitions)
        .mapInPandas(gen, schema="s string, p string, o string")
    )
