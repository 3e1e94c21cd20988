"""RDF format readers (NT/NQ/TTL subset) and ruleset export/import
round-trips (RdfSource.scala:52-67, ruleset/formats/, RulesetReader)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

NT = """\
<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> .
<http://ex.org/b> <http://ex.org/name> "Bob \\"B\\"." .
<http://ex.org/b> <http://ex.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:x1 <http://ex.org/label> "hello"@en .

# a comment-ish junk line that must be ignored
not a triple
"""

NQ = """\
<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> <http://ex.org/g1> .
<http://ex.org/a> <http://ex.org/knows> <http://ex.org/c> .
"""

TTL = """\
@prefix ex: <http://ex.org/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .

ex:a ex:knows ex:b .
ex:a a ex:Person .
ex:b ex:name "Bob" ;
     ex:knows ex:a , ex:c .
<http://ex.org/c> ex:age 42 .
"""


def test_read_nt(spark, tmp_path):
    from rdfrules_spark.sources.rdf import read_nt

    f = tmp_path / "t.nt"
    f.write_text(NT)
    rows = {tuple(r) for r in read_nt(spark, str(f)).collect()}
    assert ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b",
            "uri") in rows
    assert ("http://ex.org/b", "http://ex.org/name", 'Bob "B".',
            "text") in rows
    assert ("http://ex.org/b", "http://ex.org/age", "42", "number") in rows
    assert ("_:x1", "http://ex.org/label", "hello", "text") in rows
    assert len(rows) == 4  # junk line dropped


def test_read_nq(spark, tmp_path):
    from rdfrules_spark.sources.rdf import read_nq

    f = tmp_path / "t.nq"
    f.write_text(NQ)
    rows = {(r.s, r.o, r.g) for r in read_nq(spark, str(f)).collect()}
    assert ("http://ex.org/a", "http://ex.org/b", "http://ex.org/g1") in rows
    assert ("http://ex.org/a", "http://ex.org/c", "") in rows


def test_read_ttl_subset(spark, tmp_path):
    from rdfrules_spark.sources.rdf import read_ttl

    f = tmp_path / "t.ttl"
    f.write_text(TTL)
    rows = {(r.s, r.p, r.o) for r in read_ttl(spark, str(f)).collect()}
    assert rows == {
        ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b"),
        ("http://ex.org/a",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://ex.org/Person"),
        ("http://ex.org/b", "http://ex.org/name", "Bob"),
        ("http://ex.org/b", "http://ex.org/knows", "http://ex.org/a"),
        ("http://ex.org/b", "http://ex.org/knows", "http://ex.org/c"),
        ("http://ex.org/c", "http://ex.org/age", "42"),
    }


def test_nt_write_read_roundtrip(spark, tmp_path):
    from rdfrules_spark.sources.rdf import read_nt, write_nt

    df = spark.createDataFrame(
        [("e:a", "e:p", "e:b", "uri"), ("e:a", "e:name", 'say "hi"', "text")],
        "s string, p string, o string, okind string",
    )
    path = str(tmp_path / "out_nt")
    write_nt(df, path)
    back = {tuple(r) for r in read_nt(spark, path).collect()}
    assert back == {("e:a", "e:p", "e:b", "uri"),
                    ("e:a", "e:name", 'say "hi"', "text")}


def test_read_rdf_dispatch(spark, tmp_path):
    from rdfrules_spark.sources.rdf import read_rdf

    f = tmp_path / "x.nt"
    f.write_text(NT)
    assert read_rdf(spark, str(f)).count() == 4
    with pytest.raises(ValueError):
        read_rdf(spark, "file.unknown-ext")


@pytest.fixture(scope="module")
def rules(spark):
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2
    from rdfrules_spark.mining.measures import cwa_confidence

    triples = [
        (f"e{i}", p, f"e{(i * k) % 40}")
        for i in range(40)
        for k, p in ((1, "p1"), (2, "p2"), (3, "p3"))
    ]
    t = spark.createDataFrame(triples, "s string, p string, o string")
    params = MiningParams(min_head_size=10, min_support=1,
                          min_head_coverage=0.01)
    return cwa_confidence(
        mine_l2(t, head_sizes(t, params), params), t
    ).cache()


def _key_set(df):
    return {
        (r.p, r.q, r.d1, r.support, r.head_size, r.body_size)
        for r in df.collect()
    }


def test_ruleset_ndjson_roundtrip(spark, tmp_path, rules):
    from rdfrules_spark.ruleset_io import export_ndjson, import_ndjson

    path = str(tmp_path / "rules_ndjson")
    export_ndjson(rules, path)
    back = import_ndjson(spark, path)
    assert _key_set(back) == _key_set(rules)
    # absent measures stay null
    assert back.where(F.col("lift").isNotNull()).count() == 0


def test_ruleset_json_roundtrip(spark, tmp_path, rules):
    from rdfrules_spark.ruleset_io import export_json, import_json

    path = str(tmp_path / "rules.json")
    export_json(rules, path)
    assert _key_set(import_json(spark, path)) == _key_set(rules)


def test_ruleset_text_export(spark, tmp_path, rules):
    from rdfrules_spark.ruleset_io import export_text

    path = str(tmp_path / "rules_txt")
    export_text(rules, path)
    lines = [r.value for r in spark.read.text(path).collect()]
    assert len(lines) == rules.count()
    assert all(" -> (?a <" in ln and "| support: " in ln for ln in lines)


def test_prediction_ndjson_roundtrip(spark, tmp_path):
    from rdfrules_spark.ruleset_io import (
        export_predictions_ndjson,
        import_predictions_ndjson,
    )

    preds = spark.createDataFrame(
        [("a", "p", "b", "Positive", 0.9), ("c", "p", "d", "Negative", 0.1)],
        "s string, p string, o string, result string, noisy_or double",
    )
    path = str(tmp_path / "preds")
    export_predictions_ndjson(preds, path, score_col="noisy_or")
    back = import_predictions_ndjson(spark, path)
    assert {tuple(r) for r in back.collect()} == {
        ("a", "p", "b", "Positive", 0.9), ("c", "p", "d", "Negative", 0.1)
    }


def test_tsv_gz_compression_roundtrip(spark, tmp_path):
    """Compression wrapper (reference core:data/Compression.scala, applied
    in RdfSource dispatch): Spark's codec layer handles gz transparently on
    read AND write — a .tsv.gz round-trips to the identical triple set."""
    import gzip
    import os

    from rdfrules_spark.sources.tsv import read_tsv, write_tsv

    rows = [
        ("<e:a>\t<p:x>\t<e:b>.", ),
        ("<e:b>\t<p:y>\t\"lit\".", ),
        ("<e:c>\t<p:x>\t42.", ),
    ]
    src = tmp_path / "in.tsv.gz"
    with gzip.open(src, "wt", encoding="utf-8") as f:
        f.write("\n".join(r[0] for r in rows) + "\n")
    df = read_tsv(spark, str(src))
    got = {tuple(r) for r in df.select("s", "p", "o").collect()}
    assert got == {("e:a", "p:x", "e:b"), ("e:b", "p:y", '"lit"'),
                   ("e:c", "p:x", "42")}
    # gz write via the same codec layer
    out = str(tmp_path / "out")
    (df.select("s", "p", "o", "okind").write.mode("overwrite")
     .option("sep", "\t").option("compression", "gzip").csv(out))
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = (spark.read.option("sep", "\t")
            .csv(out, schema="s string, p string, o string, okind string"))
    assert {tuple(r) for r in back.select("s", "p", "o").collect()} == got
    # write_tsv export shape still round-trips through read_tsv
    exp = str(tmp_path / "exp")
    write_tsv(df.where(F.col("okind") == "uri"), exp)
    again = read_tsv(spark, exp)
    assert {tuple(r) for r in again.select("s", "p", "o").collect()} == {
        ("e:a", "p:x", "e:b")
    }


ANYBURL = """\
27\t13\t0.4814814\thasCurrency(X,Y) <= dealsWith(X,A), hasCurrency(A,Y)
113\t113\t1.0\tisCitizenOf(X,United_States) <= livesIn(X,New_York)
5\t2\t0.4\tlivesIn(X,Y) <= wasBornIn(X,Y)
"""


def test_anyburl_import_and_roundtrip(spark, tmp_path):
    """experiments_kgc:AnyBurlRulesetFormat.scala:10-33 — AnyBURL lines
    parse to resolved rules (uppercase single letter = variable, lowered;
    predicted/correct/confidence -> BodySize/Support/CwaConfidence)."""
    from rdfrules_spark.ruleset_io import export_anyburl, import_anyburl

    f = tmp_path / "rules.txt"
    f.write_text(ANYBURL)
    df = import_anyburl(spark, str(f))
    rows = {
        (r.head, tuple(r.atoms), r.support, r.body_size, r.cwa_confidence)
        for r in df.collect()
    }
    assert (
        "?x|hasCurrency|?y",
        ("?x|dealsWith|?a", "?a|hasCurrency|?y"),
        13, 27, 0.4814814,
    ) in rows
    assert (
        "?x|isCitizenOf|C=United_States",
        ("?x|livesIn|C=New_York",),
        113, 113, 1.0,
    ) in rows
    assert len(rows) == 3

    out = str(tmp_path / "rules_out")
    export_anyburl(df, out)
    back = import_anyburl(spark, out)
    assert {
        (r.head, tuple(r.atoms), r.support, r.body_size, r.cwa_confidence)
        for r in back.collect()
    } == rows
