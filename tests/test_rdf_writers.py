"""Writer round-trips: Turtle / RDF/XML / JSON-LD export -> this repo's own
full-grammar readers -> the original triple set (reference exports any Jena
format, core:data/Graph.scala:52-60 / RdfWriter.scala; read side verified
against spec corpora in test_turtle_full / test_rdfxml_jsonld_full).

Every part file must also be a complete standalone document (per-partition
header/footer), so single-file parses of each part succeed too.
"""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.sources.formats import read_jsonld, read_rdfxml
from rdfrules_spark.sources.rdf import read_ttl
from rdfrules_spark.sources.rdf_writers import (
    auto_prefixes,
    write_jsonld,
    write_rdfxml,
    write_ttl,
)

ROWS = [
    # uri objects in two namespaces, multiple preds per subject
    ("http://ex.com/a", "http://ex.com/p", "http://ex.com/b", "uri"),
    ("http://ex.com/a", "http://ex.com/p", "http://other.org/x#y", "uri"),
    ("http://ex.com/a", "http://ex.com/q", "http://ex.com/c", "uri"),
    ("http://ex.com/b", "http://ex.com/p", "http://ex.com/a", "uri"),
    # literals: text with escapes, number, boolean
    ("http://ex.com/a", "http://ex.com/name", 'say "hi"\nnow\\ok', "text"),
    ("http://ex.com/b", "http://ex.com/age", "42", "number"),
    ("http://ex.com/b", "http://ex.com/tall", "true", "boolean"),
    ("http://ex.com/b", "http://ex.com/note", "<&> été", "text"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(ROWS, "s string, p string, o string, okind string")


def _set(df):
    return {(r["s"], r["p"], r["o"]) for r in df.select("s", "p", "o").collect()}


EXPECTED = {(s, p, o) for s, p, o, _k in ROWS}


def test_ttl_roundtrip(spark, triples, tmp_path):
    path = str(tmp_path / "out.ttl")
    write_ttl(triples, path)
    assert _set(read_ttl(spark, path)) == EXPECTED
    # prefix compaction actually happened
    text = "".join(open(f).read() for f in glob.glob(path + "/part-*"))
    assert "@prefix ns1:" in text and "ns1:p" in text.replace("\n", " ")
    # every non-empty part file is a standalone Turtle document
    from rdfrules_spark.sources.turtle import parse_turtle

    for f in glob.glob(path + "/part-*"):
        parse_turtle(open(f).read())


def test_ttl_explicit_prefixes_and_number_forms(spark, triples, tmp_path):
    path = str(tmp_path / "out2.ttl")
    write_ttl(triples, path, prefixes={"ex": "http://ex.com/"})
    text = "".join(open(f).read() for f in glob.glob(path + "/part-*"))
    assert "ex:a" in text and "42" in text and "true" in text
    assert _set(read_ttl(spark, path)) == EXPECTED


def test_rdfxml_roundtrip(spark, triples, tmp_path):
    path = str(tmp_path / "out.xml")
    write_rdfxml(triples, path)
    assert _set(read_rdfxml(spark, path)) == EXPECTED
    # standalone well-formed XML per part
    import xml.dom.minidom

    for f in glob.glob(path + "/part-*"):
        xml.dom.minidom.parse(f)


def test_jsonld_roundtrip(spark, triples, tmp_path):
    path = str(tmp_path / "out.jsonld")
    write_jsonld(triples, path)
    assert _set(read_jsonld(spark, path)) == EXPECTED
    # every part is valid JSON (array form)
    for f in glob.glob(path + "/part-*"):
        assert isinstance(json.load(open(f)), list)


def test_bnodes_rdfxml_and_ttl(spark, tmp_path):
    rows = [
        ("_:b1", "http://ex.com/p", "http://ex.com/a", "uri"),
        ("http://ex.com/a", "http://ex.com/q", "_:b1", "uri"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, okind string")
    px = str(tmp_path / "b.xml")
    write_rdfxml(df, px)
    got = _set(read_rdfxml(spark, px))
    # bnode labels may be renamed by the reader; compare shapes
    assert len(got) == 2
    assert any(s.startswith("_:") and o == "http://ex.com/a" for s, p, o in got)
    assert any(o.startswith("_:") and s == "http://ex.com/a" for s, p, o in got)
    # Turtle: bnodes must serialize as bare `_:label`, never `<_:label>`
    # (a relative IRI to a conforming parser)
    pt = str(tmp_path / "b.ttl")
    write_ttl(df, pt, prefixes={"ex": "http://ex.com/"})
    text = "".join(open(f).read() for f in glob.glob(pt + "/part-*"))
    assert "_:b1" in text and "<_:" not in text
    gott = _set(read_ttl(spark, pt))
    assert len(gott) == 2
    assert any(s.startswith("_:") and o == "http://ex.com/a" for s, p, o in gott)
    assert any(o.startswith("_:") and s == "http://ex.com/a" for s, p, o in gott)


def test_jsonld_noncanonical_numbers(spark, tmp_path):
    """Lexical forms that would be mangled (or invalid) as native JSON
    scalars fall back to the quoted @value form; the round-trip keeps the
    exact lexical form, and every part file stays valid JSON."""
    rows = [
        ("http://ex.com/a", "http://ex.com/v", "007", "number"),
        ("http://ex.com/a", "http://ex.com/v", "1.50", "number"),
        ("http://ex.com/a", "http://ex.com/v", "1.0", "number"),
        ("http://ex.com/a", "http://ex.com/v", "-0", "number"),
        ("http://ex.com/a", "http://ex.com/v", "42", "number"),
        ("http://ex.com/a", "http://ex.com/v", "-2.5", "number"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, okind string")
    path = str(tmp_path / "n.jsonld")
    write_jsonld(df, path)
    for f in glob.glob(path + "/part-*"):
        json.load(open(f))  # would raise on a raw 007 scalar
    got = _set(read_jsonld(spark, path))
    assert got == {(s, p, o) for s, p, o, _k in rows}
    text = "".join(open(f).read() for f in glob.glob(path + "/part-*"))
    # canonical forms stay native scalars, the rest are quoted
    assert '{"@value":42}' in text and '{"@value":-2.5}' in text
    assert '{"@value":"007"}' in text and '{"@value":"1.50"}' in text


def test_write_rdf_dispatch(spark, triples, tmp_path):
    from rdfrules_spark.sources.rdf import read_rdf, write_rdf

    for name in ("d.ttl", "d.xml", "d.jsonld", "d.trix"):
        path = str(tmp_path / name)
        write_rdf(triples, path)
        assert _set(read_rdf(spark, path)) == EXPECTED


def test_auto_prefixes_bound(spark):
    df = spark.range(0, 10).select(
        F.lit("s").alias("s"),
        F.concat(F.lit("http://ex.com/p"), F.col("id")).alias("p"),
        F.lit("o").alias("o"),
    )
    with pytest.raises(ValueError, match="distinct predicates"):
        auto_prefixes(df, max_predicates=5)
