"""k-means codebook training + IVF probe (operators/similarity.py).

The IVF contract (bucket-probe top-k) is oracle-checked by the driver
(registry entries ivf_topk / ivf_kmeans_topk); here we pin the Lloyd
iteration semantics themselves: determinism, empty-cluster handling, and
that training actually moves centroids and does not hurt probe recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfrules_spark.operators.similarity import (
    cosine_topk,
    deterministic_centroids,
    ivf_topk,
    kmeans_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )


def test_kmeans_deterministic_and_moves(spark):
    emb = _emb(spark)
    c1 = kmeans_centroids(emb, 8, iters=2)
    c2 = kmeans_centroids(emb, 8, iters=2)
    rows1 = {r["c_id"]: r["c_vec"] for r in c1.collect()}
    rows2 = {r["c_id"]: r["c_vec"] for r in c2.collect()}
    assert rows1 == rows2  # bit-identical across runs
    assert len(rows1) == 8  # empty clusters keep previous centroid: k fixed
    init = {
        r["c_id"]: r["c_vec"]
        for r in deterministic_centroids(emb, 8).collect()
    }
    moved = sum(1 for k in init if rows1[k] != init[k])
    assert moved >= 1  # Lloyd update actually changed centroids


def test_kmeans_centroid_is_cluster_mean(spark):
    emb = _emb(spark)
    c0 = deterministic_centroids(emb, 4)
    c1 = kmeans_centroids(emb, 4, iters=1)
    # recompute the expected means in pandas from the first assignment
    from rdfrules_spark.operators.similarity import ivf_assign

    a = ivf_assign(emb, c0).toPandas()
    got = {r["c_id"]: r["c_vec"] for r in c1.collect()}
    for bucket, grp in a.groupby("bucket"):
        vecs = grp["embedding"].tolist()
        mean = [sum(v[i] for v in vecs) / len(vecs) for i in range(len(vecs[0]))]
        assert got[bucket] == [
            sum(v[i] for v in vecs) / len(vecs) for i in range(len(vecs[0]))
        ] or max(abs(x - y) for x, y in zip(got[bucket], mean)) < 1e-9


def test_trained_ivf_recall_not_worse(spark):
    emb = _emb(spark)
    qs = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in cosine_topk(emb, qs, k=10).collect()
    }

    def recall(cents):
        hits = {
            (r["q_id"], r["vec_id"])
            for r in ivf_topk(
                emb, qs, k=10, n_centroids=8, nprobe=2, centroids=cents
            ).collect()
        }
        return len(hits & exact) / len(exact)

    r_init = recall(deterministic_centroids(emb, 8))
    r_trained = recall(kmeans_centroids(emb, 8, iters=2))
    assert r_trained >= 0.5
    assert r_trained >= r_init - 0.2  # training must not collapse recall
