"""Prediction + evaluation (§2.9) and ruleset post-processing (§2.8) tests.

Tiny hand-computed goldens pin the semantics (reference
core:prediction/Instantiation.scala:37-53, eval builders, Ruleset pruning);
property checks on the synthetic KG pin the distributed plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.mining.amie import MiningParams, mine
from rdfrules_spark.mining.measures import cwa_confidence
from rdfrules_spark.prediction import (
    evaluate_completeness,
    evaluate_ranking,
    predict_triples,
    prediction_tasks,
    predict_triples as _pt,
    score_predictions,
)
from rdfrules_spark.ruleset import cba_prune, dbscan_clusters, find_similar


@pytest.fixture(scope="module")
def kg(spark):
    from rdfrules_spark.pipeline import synth_pipeline

    res = synth_pipeline(spark, 400)
    t = res.triples.select("s", "p", "o").cache()
    t.count()
    return t


@pytest.fixture(scope="module")
def rules(kg):
    params = MiningParams(min_head_size=30, min_support=2, min_head_coverage=0.02)
    r = cwa_confidence(mine(kg, params), kg).cache()
    assert r.count() > 0
    return r


def test_predict_positive_tagging(kg, rules):
    preds = predict_triples(rules, kg).cache()
    n = preds.count()
    assert n > 0
    # every Positive prediction is literally in the KG; no Negative is
    pos = preds.where("result = 'Positive'").select("s", "p", "o").distinct()
    assert pos.join(kg, ["s", "p", "o"], "left_anti").count() == 0
    neg = preds.where("result != 'Positive'").select("s", "p", "o").distinct()
    assert neg.join(kg, ["s", "p", "o"], "left_semi").count() == 0
    # l2 rule semantics: prediction set == body pair set mapped to head
    one = rules.where("shape = 'l2'").orderBy("p", "q", "d1").first()
    got = {
        (r.s, r.o)
        for r in preds.where(
            (F.col("shape") == "l2")
            & (F.col("p") == one.p) & (F.col("q") == one.q)
            & (F.col("d1") == one.d1)
        ).collect()
    }
    body = kg.where(F.col("p") == one.q)
    expect = {
        ((r.s, r.o) if one.d1 == "f" else (r.o, r.s)) for r in body.collect()
    }
    assert got == expect
    preds.unpersist()


def test_score_predictions_noisy_or(kg, rules):
    preds = predict_triples(rules, kg)
    scored = score_predictions(preds).cache()
    rows = scored.where("n_rules >= 2").limit(5).collect()
    for r in rows:
        assert r.noisy_or >= r.max_score - 1e-9
        assert r.noisy_or <= 1.0 + 1e-9
        assert len(r.top_rules) <= 3
    scored.unpersist()


def test_prediction_tasks_ranked(kg, rules):
    scored = score_predictions(predict_triples(rules, kg))
    tasks = prediction_tasks(scored, kg, top_k=5).cache()
    assert tasks.count() > 0
    # ranks within a task are 1..k, contiguous, scores non-increasing
    bad = (
        tasks.groupBy("p", "predict_side", "fixed_entity")
        .agg(F.max("rank").alias("mx"), F.count(F.lit(1)).alias("n"))
        .where((F.col("mx") != F.col("n")) | (F.col("mx") > 5))
    )
    assert bad.count() == 0
    tasks.unpersist()


def test_evaluate_ranking_golden(spark):
    ranked = spark.createDataFrame(
        [
            ("p1", "subject", "e1", "a", 1),
            ("p1", "subject", "e1", "b", 2),
            ("p1", "subject", "e2", "c", 1),
        ],
        "p string, predict_side string, fixed_entity string, "
        "candidate string, rank int",
    )
    # truths: (b,p1,e1) rank 2; (x,p1,e2) unranked (miss)
    test = spark.createDataFrame(
        [("b", "p1", "e1"), ("x", "p1", "e2")], "s string, p string, o string"
    )
    row = evaluate_ranking(ranked, test, ks=(1, 3)).first()
    assert row.n_tasks == 2
    assert row.mrr == pytest.approx((1 / 2 + 0) / 2)
    assert row.hits_1 == pytest.approx(0.0)
    assert row.hits_3 == pytest.approx(0.5)
    assert row.mr_found == pytest.approx(2.0)


def test_evaluate_completeness_golden(spark):
    pred = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("x", "q", "y")],
        "s string, p string, o string",
    )
    test = spark.createDataFrame(
        [("a", "p", "b"), ("m", "p", "n")], "s string, p string, o string"
    )
    row = evaluate_completeness(pred, test).first()
    assert (row.tp, row.fp, row.fn) == (1, 2, 1)
    assert row.precision == pytest.approx(1 / 3)
    assert row.recall == pytest.approx(1 / 2)


def _mk_rules(spark, rows):
    return spark.createDataFrame(
        rows,
        "p string, shape string, q string, d1 string, r string, d2 string, "
        "head_size long, support long, head_coverage double, "
        "cwa_confidence double",
    )


def test_cba_prune_golden(spark):
    # rule A (higher conf) predicts t1,t2; rule B predicts t2 only -> B pruned
    rules = _mk_rules(
        spark,
        [
            ("p", "l2", "qa", "f", None, None, 10, 5, 0.5, 0.9),
            ("p", "l2", "qb", "f", None, None, 10, 5, 0.5, 0.5),
        ],
    )
    preds = spark.createDataFrame(
        [
            ("s1", "p", "o1", "l2", "qa", "f", None, None, 0.9, "Positive"),
            ("s2", "p", "o2", "l2", "qa", "f", None, None, 0.9, "Positive"),
            ("s2", "p", "o2", "l2", "qb", "f", None, None, 0.5, "Positive"),
        ],
        "s string, p string, o string, shape string, q string, d1 string, "
        "r string, d2 string, conf double, result string",
    )
    kept = cba_prune(preds, rules).collect()
    assert len(kept) == 1 and kept[0].q == "qa"
    # if B also uniquely predicts t3, both survive
    preds2 = preds.unionByName(
        spark.createDataFrame(
            [("s3", "p", "o3", "l2", "qb", "f", None, None, 0.5, "Positive")],
            preds.schema,
        )
    )
    assert cba_prune(preds2, rules).count() == 2


def test_dbscan_clusters_golden(spark):
    # two tight pairs sharing an atom + one isolated rule
    rules = _mk_rules(
        spark,
        [
            ("p", "l2", "q1", "f", None, None, 10, 5, 0.50, 0.5),
            ("p", "l3v2", "q1", "f", "q2", "i", 10, 5, 0.52, 0.5),
            ("p", "l2", "q9", "i", None, None, 10, 5, 0.10, 0.5),
        ],
    ).drop("cwa_confidence")
    out = dbscan_clusters(rules, min_similarity=0.5, min_neighbours=1).collect()
    by_q = {(r.shape, r.q): r.cluster for r in out}
    assert by_q[("l2", "q1")] == by_q[("l3v2", "q1")]
    assert by_q[("l2", "q9")] != by_q[("l2", "q1")]


def test_find_similar(spark):
    rules = _mk_rules(
        spark,
        [
            ("p", "l2", "q1", "f", None, None, 10, 5, 0.50, 0.5),
            ("p", "l3v2", "q1", "f", "q2", "i", 10, 5, 0.52, 0.5),
            ("p", "l2", "q9", "i", None, None, 10, 5, 0.10, 0.5),
        ],
    ).drop("cwa_confidence")
    target = {"p": "p", "shape": "l2", "q": "q1", "d1": "f", "r": None,
              "d2": None, "head_coverage": 0.50}
    top = find_similar(rules, target, k=2).collect()
    assert len(top) == 2
    assert "l3v2|q1" in top[0].rid.replace("p|", "")
