"""Hot-bucket / document-frequency caps in the dedup suite.

VERDICT r01 flagged that the caps claimed in operators/dedup.py's docstring
were not implemented; these tests pin the now-real behavior on a fixture
with a boilerplate shingle shared by every doc (the degenerate O(n^2)
bucket) plus small genuine near-dup clusters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.operators.dedup import (
    hot_bucket_report,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_dup_pairs,
)

BOILER = "terms of service apply to all content"


@pytest.fixture(scope="module")
def docs(spark):
    # 12 docs: every one ends with the same boilerplate sentence; docs 0-2
    # share a genuine body, docs 3-5 share another, the rest are unique.
    rows = []
    for i in range(12):
        if i < 3:
            body = "alpha beta gamma delta epsilon zeta"
        elif i < 6:
            body = "one two three four five six seven"
        else:
            body = f"unique{i} text{i} words{i} here{i} now{i} end{i}"
        rows.append((f"d{i:02d}", f"{body} {BOILER}"))
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_ngram_df_cap_removes_boilerplate_pairs(docs):
    # uncapped: the boilerplate shingles connect ALL 12 docs -> 66 pairs
    uncapped = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, max_df=None
    )
    assert uncapped.count() == 66
    # df-cap 3: boilerplate shingles (df=12) and cross-boundary shingles
    # drop; only the two genuine 3-doc clusters remain connected
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, max_df=3
    ).cache()
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert pairs == {
        ("d00", "d01"), ("d00", "d02"), ("d01", "d02"),
        ("d03", "d04"), ("d03", "d05"), ("d04", "d05"),
    }
    # within a surviving cluster the capped universe is identical per doc
    # -> jaccard is exactly 1.0 for same-body pairs
    assert all(r.jaccard == pytest.approx(1.0) for r in capped.collect())
    capped.unpersist()


def test_ngram_cap_report_not_silent(docs):
    ex = docs.select(
        "doc_id", F.explode(shingles("text", 3)).alias("sh")
    ).distinct()
    report = hot_bucket_report(ex, ["sh"], max_bucket=3)
    dropped = {r.sh for r in report.collect()}
    # every pure-boilerplate shingle is reported with its df
    assert "terms of service" in dropped
    assert "of service apply" in dropped
    assert report.where(F.col("n_members") != 12).where(
        F.col("sh") == "terms of service"
    ).count() == 0


def test_minhash_bucket_cap(docs):
    # With identical boilerplate tails, some band buckets exceed 3 members;
    # the cap must remove those buckets' contribution but keep exact-dup
    # clusters (whose FULL signatures agree -> they also share small
    # buckets? no: identical docs share ALL buckets, so a hot bucket of 12
    # would be capped away together). Use docs where only the genuine
    # clusters share full signatures.
    uncapped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.0, max_bucket=None
    )
    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.0, max_bucket=3
    )
    nu, nc = uncapped.count(), capped.count()
    assert nc <= nu
    # capped result is a subset of the uncapped candidates
    assert capped.join(
        uncapped.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    ).count() == 0


def test_simhash_bucket_cap_subset(docs):
    uncapped = simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=48, max_bucket=None
    )
    capped = simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=48, max_bucket=3
    )
    assert capped.count() <= uncapped.count()
    assert capped.join(
        uncapped.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    ).count() == 0
