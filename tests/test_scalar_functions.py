"""Scalar-function surface (SURVEY §2.10): URI explode, interval literals,
arithmetic eval (reference TripleItem.scala:53-65,147-183;
http:util/ArithmeticEval.scala), and the prediction stats/conversions tail
(eval/StatsBuilder.scala, predictionTasks/ToDataset.scala)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rdfrules_spark.functions.scalar import (
    arithmetic_eval,
    interval_contains,
    parse_interval,
    uri_explode,
)


def test_arithmetic_eval_reference_grammar():
    # precedence + brackets (ArithmeticEval.scala evalExps)
    assert arithmetic_eval("1+2*3") == 7.0
    assert arithmetic_eval("(1+2)*3") == 9.0
    assert arithmetic_eval("2*3+4*5") == 26.0
    assert arithmetic_eval("100/4/5") == 5.0
    # '-' directly after an operator folds into the number literal
    assert arithmetic_eval("2*-3") == -6.0
    assert arithmetic_eval("-3+4") == 1.0
    # left association of +/-
    assert arithmetic_eval("1-2-3") == -4.0
    # scientific notation literal
    assert arithmetic_eval("1e2+1") == 101.0
    # unmatched ')' collapses the accumulated prefix, parsing continues
    assert arithmetic_eval("1+2)*3") == 9.0
    # nested brackets
    assert arithmetic_eval("((2+3)*(4-1))") == 15.0
    # plain number
    assert arithmetic_eval("42") == 42.0
    assert arithmetic_eval("  3.5 ") == 3.5
    # unparseable -> None (reference returns None, not an exception)
    assert arithmetic_eval("foo") is None
    assert arithmetic_eval("") is None
    assert arithmetic_eval("1 + x") is None
    # IEEE division like Scala Double
    assert arithmetic_eval("1/0") == float("inf")
    assert math.isnan(arithmetic_eval("0/0"))


def test_uri_explode(spark):
    rows = (
        spark.createDataFrame(
            [
                ("http://a.org/b/c",),
                ("http://a.org/b#frag",),
                ("noseparator",),
                ("dbpedia:Praha",),  # no '/' or '#': whole uri as local
            ],
            ["uri"],
        )
        .select(F.col("uri"), uri_explode("uri").alias("x"))
        .select("uri", "x.name_space", "x.local_name")
        .collect()
    )
    got = {r["uri"]: (r["name_space"], r["local_name"]) for r in rows}
    # greedy split on the LAST '/' or '#' (TripleItem.explode)
    assert got["http://a.org/b/c"] == ("http://a.org/b/", "c")
    assert got["http://a.org/b#frag"] == ("http://a.org/b#", "frag")
    assert got["noseparator"] == ("", "noseparator")
    assert got["dbpedia:Praha"] == ("", "dbpedia:Praha")


def test_interval_parse_and_contains(spark):
    df = spark.createDataFrame(
        [
            ("[1;3]", 3.0),
            ("[1;3)", 3.0),
            ("( 1.5 ; 2.5 ]", 1.5),
            ("(1.5;2.5]", 2.5),
            ('"[1;3]"', 2.0),  # quote-wrapped: full-string match fails -> null
            ("[a;b]", 1.0),  # non-numeric bounds -> null
            ("whatever", 1.0),
        ],
        ["txt", "v"],
    ).select(
        "txt",
        parse_interval("txt").alias("ivl"),
        "v",
    )
    out = df.select(
        "txt",
        F.col("ivl").isNotNull().alias("ok"),
        interval_contains(F.col("ivl"), "v").alias("member"),
    ).collect()
    got = {r["txt"]: (r["ok"], r["member"]) for r in out}
    assert got["[1;3]"] == (True, True)
    assert got["[1;3)"] == (True, False)  # exclusive right bound
    assert got["( 1.5 ; 2.5 ]"] == (True, False)  # exclusive left bound
    assert got["(1.5;2.5]"] == (True, True)
    assert got['"[1;3]"'] == (False, None)
    assert got["[a;b]"] == (False, None)
    assert got["whatever"] == (False, None)


def test_prediction_stats_and_conversions(spark):
    from rdfrules_spark.prediction import (
        prediction_task_stats,
        tasks_to_dataset,
    )

    ranked = spark.createDataFrame(
        [
            # p, predict_side, fixed_entity, candidate, score, rank
            ("p1", "subject", "e1", "c1", 0.9, 1),
            ("p1", "subject", "e1", "c2", 0.8, 2),
            ("p1", "subject", "e2", "c1", 0.7, 1),
            ("p2", "object", "e9", "c9", 0.6, 1),
        ],
        ["p", "predict_side", "fixed_entity", "candidate", "score", "rank"],
    )
    stats = prediction_task_stats(ranked).collect()[0]
    assert stats["n_tasks"] == 3
    assert stats["n_candidates"] == 4
    assert stats["n_predicates"] == 2
    assert abs(stats["avg_candidates"] - 4 / 3) < 1e-6

    ds = {(r["s"], r["p"], r["o"]) for r in tasks_to_dataset(ranked).collect()}
    # subject-side: candidate is the subject; object-side: candidate object
    assert ds == {
        ("c1", "p1", "e1"),
        ("c2", "p1", "e1"),
        ("c1", "p1", "e2"),
        ("e9", "p2", "c9"),
    }


def test_predicate_neighbours_hand_golden(spark):
    """neighboursSS/SO/OO/OS (TripleIndex.scala:58-95) on a 4-triple KG,
    every mode hand-computed, incl. the q == p diagonal correction."""
    from rdfrules_spark.dictionary import predicate_neighbours

    t = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("a", "q", "b"), ("b", "q", "c")],
        ["s", "p", "o"],
    )
    got = {
        (r["p"], r["q"], r["mode"]): r["est"]
        for r in predicate_neighbours(t).collect()
    }
    assert got == {
        # subject a: objs_p(a)=2, objs_q(a)=1; subject b: objs_q(b)=1
        ("p", "p", "SS"): 2, ("p", "q", "SS"): 2,
        ("q", "p", "SS"): 2, ("q", "q", "SS"): 0,
        # b is subject of q and object of p/q
        ("q", "p", "SO"): 1, ("q", "q", "SO"): 1,
        # objects b, c each reached by p once and q once
        ("p", "p", "OO"): 0, ("p", "q", "OO"): 2,
        ("q", "p", "OO"): 2, ("q", "q", "OO"): 0,
        ("p", "q", "OS"): 1, ("q", "q", "OS"): 1,
    }
