"""Deduplication suite (driver-mandated first-class components).

exact_dedup        — hash-groupBy on content (one shuffle, map-side combine)
minhash_lsh_pairs  — shingle -> k MinHashes -> band buckets -> bucket join;
                     candidate pairs whose estimated Jaccard >= threshold.
simhash64          — 64-bit sign-aggregated token hash; near-dups = pairs
                     within Hamming distance d (banded by 16-bit chunks).
ngram_jaccard_pairs— exact n-gram Jaccard via shingle co-occurrence join.
embedding_near_dup — cosine near-duplicates over an embedding column.

Scale notes (the reason these shapes were chosen):
  * every pair-generation step goes through a *bucket join* (shingle, band,
    or hamming-chunk key) — never a cross join;
  * a degenerate bucket (e.g. every near-empty doc hashing to the same band
    key, or a boilerplate shingle shared by 1M docs) makes that bucket's
    self-join O(n^2). Every pair generator therefore takes a per-bucket
    membership cap ``max_bucket`` (for :func:`ngram_jaccard_pairs` the
    analogous shingle document-frequency cap ``max_df``): buckets above the
    cap are DROPPED before the self-join — the classic LSH hot-bucket
    guard. The cap is never silent: :func:`hot_bucket_report` returns the
    dropped buckets with their sizes for the same inputs, so a pipeline can
    materialize/log exactly what was skipped.
  * all hashes are md5-60bit (functions/hashing.py) so the DuckDB oracle
    reproduces candidates exactly (the oracle SQL applies the same cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.functions.hashing import P, h60, hk_from_base
from rdfrules_spark.operators.textops import tokens

#: default per-bucket membership cap for all LSH pair generators. 1000 keeps
#: the worst bucket's self-join at <=10^6 candidate pairs per bucket — cheap
#: for one task — while far exceeding any genuine near-dup cluster we want.
DEFAULT_MAX_BUCKET = 1000


def _cap_buckets(
    buckets: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop rows of buckets whose key has > max_bucket members.

    One groupBy (map-side combinable, output = #buckets rows) + a semi-join
    on the same key the pair join shuffles on — no extra shuffle pattern.
    """
    if max_bucket is None:
        return buckets
    ok = (
        buckets.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    return buckets.join(ok, keys, "left_semi")


def hot_bucket_report(
    buckets: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """(key..., n_members) for every bucket the cap would drop — the
    observability side of _cap_buckets ("no silent caps")."""
    return (
        buckets.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > max_bucket)
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per distinct content hash."""
    return (
        df.groupBy(h60(F.col(content_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )


def shingles(text_col: str, n: int = 3) -> "F.Column":
    """Word n-gram shingles of a text column (distinct, order-free set).

    The token array is BOUND as a lambda variable (via a single-element
    array transform) so the regex tokenization runs once per document:
    Catalyst does not CSE expressions through lambda bodies, so the naive
    form — ``F.get(tokens(text), i + j)`` inside the element lambda —
    re-tokenizes the whole document for every shingle position
    (O(len^2) per doc; measured 12.5 s -> 0.9 s on the sf0.1 corpus)."""
    def from_toks(toks):
        k = F.size(toks) - (n - 1)
        return F.array_distinct(
            F.when(
                k > 0,
                F.transform(
                    F.sequence(F.lit(0), k - 1),
                    lambda i: F.concat_ws(
                        " ", *[F.get(toks, i + j) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )

    return F.get(F.transform(F.array(tokens(text_col)), from_toks), 0)


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """-> (id, mh_0..mh_{k-1}): per-doc MinHash signature. Computed by
    explode + groupBy-min (map-side combine) rather than per-row UDF."""
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, shingle_n)).alias("sh"),
    ).select("id", (h60(F.col("sh")) % P).alias("_hp"))
    # one md5 per shingle row, k affine variants of it — not k md5s
    # (aggregate expressions are not CSE'd across each other)
    aggs = [
        F.min(hk_from_base(F.col("_hp"), i)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return ex.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    band bucket key = struct(band_no, hash(minhashes of the band)); docs
    sharing any band bucket become candidates; est_jaccard = fraction of
    equal signature components. Band buckets with > max_bucket members are
    dropped before the self-join (hot-bucket guard, see module docstring).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    band_key = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "_",
                        *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
                    ).alias("key"),
                )
                for b in range(bands)
            ]
        )
    )
    buckets = _cap_buckets(
        sig.select("*", band_key.alias("bk")), ["bk"], max_bucket
    )
    left = buckets.select(
        F.col("bk"), F.col("id").alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    right = buckets.select(
        F.col("bk"), F.col("id").alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    eq = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        left.join(right, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (eq / num_hashes).alias("est_jaccard"))
        .distinct()
        .where(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1 shingle.

    |A∩B| from the shingle co-occurrence join; |A∪B| = |A|+|B|−|A∩B|.

    ``max_df``: shingles appearing in more than max_df documents are removed
    BEFORE the co-occurrence self-join (the standard exact-Jaccard df-cap: a
    boilerplate shingle shared by 1M docs would make the join O(df^2)).
    Jaccard is then computed over the capped shingle universe — both the
    intersection AND the per-doc sizes exclude stop-shingles, so the measure
    stays a true Jaccard on the reduced sets. Pass None for the uncapped
    exact measure (small data / oracle mode).
    """
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("sh")
    ).distinct()
    ex = _cap_buckets(ex, ["sh"], max_df)
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "sh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 48  # stays clear of bigint sign bit (ANSI overflow) and
                   # bands into 3 exact 16-bit chunks


def simhash(text_col: str, bits: int = SIMHASH_BITS) -> "F.Column":
    """SimHash of the token stream: bit j of the result is the sign of
    sum over tokens of (+1 if bit j of h(token) else -1)."""
    # hash each token ONCE (the 48 per-bit tests below would otherwise each
    # recompute the md5 — higher-order lambdas are not CSE'd)
    hashed = F.transform(tokens(text_col), lambda t: h60(t))
    # accumulate `bits` counters as an array<int>; JVM-side aggregate expr.
    # bit positions are unrolled as literals (shiftright requires a literal).
    counters = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, j) % 2 == 1, 1).otherwise(-1)
                    for j in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    terms = [
        F.when(F.get(counters, j) > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        for j in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 2,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs within Hamming distance d over SimHash, banded by the
    three 16-bit chunks (any pair within d<=2 shares at least one chunk).
    Chunk buckets with > max_bucket members are dropped (hot-bucket guard)."""
    sigs = df.select(F.col(id_col).alias("id"), simhash(text_col).alias("sig"))
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        (F.shiftrightunsigned("sig", 16 * c) % 65536).alias("v"),
                    )
                    for c in range(SIMHASH_BITS // 16)
                ]
            )
        ).alias("ck"),
    )
    chunks = _cap_buckets(chunks, ["ck"], max_bucket)
    a = chunks.select("ck", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = chunks.select("ck", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, "ck")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane matrix from the shared hash family
    (computable identically in Python/Spark/DuckDB oracle)."""
    from rdfrules_spark.functions.hashing import hk_py

    return [
        [1.0 if hk_py(f"plane_{i}_{j}", i) % 2 == 0 else -1.0 for j in range(dim)]
        for i in range(n_planes)
    ]


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    n_planes: int = 8, dim: int = 64,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Cosine near-duplicates over array<float> embeddings: random-hyperplane
    LSH bucket key (deterministic literal planes), then exact cosine within
    buckets. The plane dot products and cosines are ordered double folds —
    bit-identical across engines. Buckets with > max_bucket members are
    dropped (hot-bucket guard — e.g. the all-zero-embedding bucket)."""
    planes = lsh_planes(n_planes, dim)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    key = F.concat_ws(
        "",
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec_d,
                        F.array(*[F.lit(c) for c in planes[i]]),
                        lambda v, c: v * c,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                "1",
            ).otherwise("0")
            for i in range(n_planes)
        ],
    )
    with_key = _cap_buckets(
        df.select(F.col(id_col).alias("id"), vec_d.alias("v"), key.alias("bk")),
        ["bk"], max_bucket,
    )
    a = with_key.select("bk", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = with_key.select("bk", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a_, x: a_ + x)
    )
    return (
        a.join(b, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (dot / (norm(F.col("va")) * norm(F.col("vb")))).alias("cosine"))
        .distinct()
        .where(F.col("cosine") >= threshold)
    )
