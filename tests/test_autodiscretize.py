"""Auto-discretization (index/ops/DiscretizationOps.scala), graph split
(TrainTestIndex), and NonRedundantTopRules aggregator tests — hand-computed
goldens."""

from __future__ import annotations

from rdfrules_spark.operators.autodiscretize import (
    AutoDiscretizationTask,
    auto_discretize,
)


def test_auto_discretize_equisize_tree_golden(spark):
    # age: values 1..40 once each (40 facts); knows: 20 facts sharing the
    # subject entities.  min_head_size=10, hc=0.5, hops=2 =>
    # lower(age)=ceil(0.5*min(40,20))=10, upper(age)=ceil(0.5*40)=20.
    # EquisizeTree over 40 ranks, support 10, arity 2:
    #   depth1: [0,20),[20,40)  (children 10 >= 10 -> split again)
    #   depth2: [0,10),[10,20),[20,30),[30,40)  (children 5 < 10 -> leaves)
    # upper=20 > 10 so no cut-off; values distinct so no duplicit intervals.
    rows = [(f"e{i}", "age", str(float(i + 1))) for i in range(40)] + [
        (f"e{i}", "knows", f"e{i + 1}") for i in range(20)
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string")
    out = auto_discretize(
        t,
        AutoDiscretizationTask(
            min_head_size=10, min_head_coverage=0.5, max_rule_length=3, arity=2
        ),
    ).cache()
    preds = {r["p"] for r in out.select("p").distinct().collect()}
    assert preds == {"age#discretized_level_1", "age#discretized_level_2"}
    assert out.count() == 80  # every fact at both levels
    got = {
        (r["s"], r["p"]): r["o"]
        for r in out.collect()
    }
    assert got[("e0", "age#discretized_level_1")] == "[1.0;20.0)"
    assert got[("e0", "age#discretized_level_2")] == "[1.0;10.0)"
    assert got[("e19", "age#discretized_level_1")] == "[1.0;20.0)"
    assert got[("e20", "age#discretized_level_1")] == "[21.0;40.0)"
    assert got[("e39", "age#discretized_level_2")] == "[31.0;40.0)"
    # knows is non-numeric -> never discretized; each level-2 bin holds 10
    lvl2 = [o for (s, p), o in got.items() if p.endswith("_2")]
    assert len(lvl2) == 40 and len(set(lvl2)) == 4
    out.unpersist()


def test_auto_discretize_cutoff(spark):
    # age 40 facts + knows 20 facts, hc=0.25 => lower=5, upper=10.
    # Tree (support 5): depth1 [0,20)x2, depth2 [0,10)x4, depth3 [0,5)x8.
    # Cut-off: depth-1 nodes' children all hold 10 >= upper=10 -> level 1
    # NOT emitted; depth-2 children hold 5 < 10 -> levels 2 and 3 emitted.
    rows = [(f"e{i}", "age", str(float(i + 1))) for i in range(40)] + [
        (f"e{i}", "knows", f"e{i + 1}") for i in range(20)
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string")
    out = auto_discretize(
        t,
        AutoDiscretizationTask(
            min_head_size=10, min_head_coverage=0.25, max_rule_length=3
        ),
    ).cache()
    preds = {r["p"] for r in out.select("p").distinct().collect()}
    assert preds == {"age#discretized_level_2", "age#discretized_level_3"}
    assert out.count() == 80
    got = {(r["s"], r["p"]): r["o"] for r in out.collect()}
    assert got[("e0", "age#discretized_level_3")] == "[1.0;5.0)"
    assert got[("e39", "age#discretized_level_2")] == "[31.0;40.0)"
    out.unpersist()


def test_auto_discretize_below_min_head_size_skipped(spark):
    # 5 numeric facts < min_head_size=10 -> no qualifying neighbour -> no
    # support bound -> predicate skipped entirely.
    rows = [(f"s{i}", "v", str(float(i))) for i in range(5)]
    t = spark.createDataFrame(rows, "s string, p string, o string")
    out = auto_discretize(
        t, AutoDiscretizationTask(min_head_size=10, min_head_coverage=0.5)
    )
    assert out.count() == 0


def test_graph_split(spark):
    from rdfrules_spark.operators.sampling import graph_split

    q = spark.createDataFrame(
        [("a", "p", "b", "train"), ("b", "p", "c", "train"),
         ("c", "p", "d", "test"), ("x", "q", "y", "other")],
        "s string, p string, o string, g string",
    )
    train, test = graph_split(q, "train", "test")
    assert train.count() == 2 and test.count() == 1
    assert test.collect()[0]["s"] == "c"
    assert train.columns == ["s", "p", "o"]


def test_non_redundant_top_rules(spark):
    from rdfrules_spark.prediction import non_redundant_top_rules

    # One predicted triple (a,p,b) from three rules: R1(0.9) and R2(0.8)
    # share cluster c1, R3(0.7) is cluster c2, R4(0.6) has NO cluster row.
    schema = (
        "s string, p string, o string, shape string, q string, d1 string,"
        " r string, d2 string, conf double"
    )
    preds = spark.createDataFrame(
        [
            ("a", "p", "b", "l2", "q1", "f", None, None, 0.9),
            ("a", "p", "b", "l2", "q2", "f", None, None, 0.8),
            ("a", "p", "b", "l2", "q3", "f", None, None, 0.7),
            ("a", "p", "b", "l2", "q4", "f", None, None, 0.6),
        ],
        schema,
    )
    clusters = spark.createDataFrame(
        [
            ("p", "l2", "q1", "f", None, None, "c1"),
            ("p", "l2", "q2", "f", None, None, "c1"),
            ("p", "l2", "q3", "f", None, None, "c2"),
        ],
        "p string, shape string, q string, d1 string, r string, d2 string,"
        " cluster string",
    )
    best = non_redundant_top_rules(preds, clusters)
    got = {(r["q"], r["conf"]) for r in best.collect()}
    # best of c1 (R1), best of c2 (R3), the unclustered R4 (bucket -1)
    assert got == {("q1", 0.9), ("q3", 0.7), ("q4", 0.6)}
    top1 = non_redundant_top_rules(preds, clusters, k=1)
    assert [r["q"] for r in top1.collect()] == ["q1"]
