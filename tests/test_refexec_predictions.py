"""Prediction parity against the executed reference.

tools/refexec's PredHarness runs the reference's full prediction pipeline
(Ruleset.predict defaults: injective bindings, merged train index,
onlyTestCoveredPredictions with test == train) on the var-only yago
ruleset with CWA >= 0.001 and dumps (a) every distinct predicted triple
with its Positive/PcaPositive/Negative tag and (b) NoisyOr-grouped scores
per triple. These tests pin our prediction.predict_triples +
score_predictions to those dumps triple-for-triple.
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.mining.amie import MiningParams, mine
from rdfrules_spark.mining.measures import confidences
from rdfrules_spark.prediction import predict_triples, score_predictions

from test_refexec_parity import YAGO, yago_df

FIXTURES = "/root/repo/tests/fixtures/refexec"
pytestmark = pytest.mark.skipif(
    not os.path.exists(YAGO), reason="yago fixture absent"
)


def _term(x: str) -> str:
    # resolver prints <<name>> for the raw value <name>
    return x[1:-1]


@pytest.fixture(scope="module")
def predicted(spark):
    t = yago_df(spark).cache()
    params = MiningParams(min_head_size=100, min_support=1,
                          min_head_coverage=0.01,
                          with_duplicate_predicates=False)
    rules = mine(t, params)
    conf = confidences(rules, t, injective=True).where(
        F.col("cwa_confidence") >= 0.001
    )
    preds = predict_triples(
        conf, t, conf_col="cwa_confidence", injective=True,
        only_covered=True,
    ).cache()
    yield t, preds
    preds.unpersist()
    t.unpersist()


def test_tagged_predictions_match(predicted):
    _, preds = predicted
    dump = set()
    with gzip.open(f"{FIXTURES}/pred_novar_tagged.tsv.gz", "rt",
                   encoding="utf-8") as f:
        for line in f:
            s, p, o, tag = line.rstrip("\n").split("\t")
            dump.add((_term(s), _term(p), _term(o), tag))
    ours = {
        (r["s"], r["p"], r["o"], r["result"])
        for r in preds.select("s", "p", "o", "result").distinct().collect()
    }
    only_dump = dump - ours
    only_ours = ours - dump
    assert not only_dump and not only_ours, (
        f"{len(only_dump)} only in reference, {len(only_ours)} only ours; "
        f"e.g. {list(only_dump)[:3]} / {list(only_ours)[:3]}"
    )


def test_noisy_or_scores_match(predicted):
    _, preds = predicted
    dump = {}
    with gzip.open(f"{FIXTURES}/pred_novar_noisyor.tsv.gz", "rt",
                   encoding="utf-8") as f:
        for line in f:
            s, p, o, tag, score, n = line.rstrip("\n").split("\t")
            dump[(_term(s), _term(p), _term(o))] = (
                tag, float(score), int(n)
            )
    scored = score_predictions(preds)
    errs = []
    seen = set()
    for r in scored.collect():
        k = (r["s"], r["p"], r["o"])
        seen.add(k)
        tag, score, n = dump[k]
        if r["result"] != tag or r["n_rules"] != n:
            errs.append((k, r["result"], tag, r["n_rules"], n))
        elif abs(r["noisy_or"] - score) > 1e-8:
            errs.append((k, r["noisy_or"], score))
    assert seen == set(dump)
    assert not errs, f"{len(errs)} mismatches, e.g. {errs[:5]}"
