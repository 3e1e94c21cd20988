"""Constants (instantiated-atom) mining: brute-oracle equality on a small
KG for every ConstantsAtPosition mode, plus the reference's own yago golden
counts (AmieSpec.scala:110-124 and :175-193)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.corpus import synth_kg
from rdfrules_spark.mining.amie import MiningParams
from rdfrules_spark.mining.brute import _atom_str, mine_brute_constants
from rdfrules_spark.mining.constants import mine_constants

YAGO = "/root/reference/core/src/test/resources/yago.tsv"


@pytest.mark.parametrize("constants,with_dup", [
    ("anywhere", True), ("anywhere", False),
    ("object", False), ("subject", False), ("lcs", False),
])
def test_brute_equality_small_kg(spark, constants, with_dup):
    t = synth_kg(spark, 2000, n_entities=200, n_predicates=6).distinct().cache()
    rows = [(r.s, r.p, r.o) for r in t.collect()]
    brute = mine_brute_constants(
        rows, min_head_size=40, min_support=2, min_hc=0.02,
        constants=constants, with_dup=with_dup,
    )
    bset = {(_atom_str(h), tuple(sorted(_atom_str(a) for a in body)), sup)
            for (h, body), sup in brute.items()}
    params = MiningParams(min_head_size=40, min_support=2,
                          min_head_coverage=0.02,
                          with_duplicate_predicates=with_dup)
    out = mine_constants(t, params, constants=constants).collect()
    sset = {(r.head, tuple(sorted(r.atoms)), r.support) for r in out}
    assert sset == bset
    t.unpersist()


@pytest.mark.skipif(not os.path.exists(YAGO), reason="yago fixture absent")
def test_yago_constants_211527(spark):
    # AmieSpec.scala:110-124 ("mine with instances")
    from rdfrules_spark.sources.tsv import read_tsv

    t = read_tsv(spark, YAGO).select("s", "p", "o").distinct().cache()
    params = MiningParams(min_head_size=100, min_support=1,
                          min_head_coverage=0.01,
                          with_duplicate_predicates=False)
    assert mine_constants(t, params, constants="anywhere").count() == 211527
    t.unpersist()


@pytest.mark.skipif(not os.path.exists(YAGO), reason="yago fixture absent")
def test_yago_object_constants_74993(spark):
    # AmieSpec.scala:175-193 ("mine only with object instances")
    from rdfrules_spark.sources.tsv import read_tsv

    t = read_tsv(spark, YAGO).select("s", "p", "o").distinct().cache()
    params = MiningParams(min_head_size=100, min_support=1,
                          min_head_coverage=0.01,
                          with_duplicate_predicates=False)
    out = mine_constants(t, params, constants="object").cache()
    assert out.count() == 74993
    hcs = [r.head_coverage for r in
           out.orderBy(F.desc("head_coverage")).limit(2).collect()]
    assert hcs[1] == 0.22784810126582278
    out.unpersist()
    t.unpersist()
