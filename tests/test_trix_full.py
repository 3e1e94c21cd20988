"""TriX reader audit vs the W3C TriX note's document shape (+ writer
round-trip): term kinds, graph naming, multiple graphs, namespaces,
blank-node scoping, malformed-document loudness. Reference dispatch:
RdfSource.scala:52-67 via Jena Lang.TRIX."""

from __future__ import annotations

import glob
import xml.dom.minidom

import pytest

from rdfrules_spark.sources.formats import read_trix
from rdfrules_spark.sources.rdf_writers import write_trix

NS = 'xmlns="http://www.w3.org/2004/03/trix/trix-1/"'

SPEC_DOC = f"""<?xml version="1.0"?>
<TriX {NS}>
  <!-- unnamed graph: default graph -->
  <graph>
    <triple>
      <uri>http://example.org/Bob</uri>
      <uri>http://example.org/wife</uri>
      <uri>http://example.org/Mary</uri>
    </triple>
    <triple>
      <uri>http://example.org/Bob</uri>
      <uri>http://example.org/name</uri>
      <plainLiteral xml:lang="en">Bob</plainLiteral>
    </triple>
    <triple>
      <uri>http://example.org/Bob</uri>
      <uri>http://example.org/age</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">32</typedLiteral>
    </triple>
  </graph>
  <graph>
    <!-- the name may follow the triples -->
    <triple>
      <id>x</id>
      <uri>http://example.org/knows</uri>
      <id>_:y</id>
    </triple>
    <uri>http://example.org/graph2</uri>
  </graph>
</TriX>
"""


def _read(spark, tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return read_trix(spark, str(p))


def test_spec_document(spark, tmp_path):
    df = _read(spark, tmp_path, "spec.trix", SPEC_DOC)
    rows = {(r["s"], r["p"], r["o"], r["g"], r["okind"]) for r in df.collect()}
    ex = "http://example.org/"
    assert (f"{ex}Bob", f"{ex}wife", f"{ex}Mary", "", "uri") in rows
    # literals keep lexical forms, tags dropped; kinds typed by content
    assert (f"{ex}Bob", f"{ex}name", "Bob", "", "text") in rows
    assert (f"{ex}Bob", f"{ex}age", "32", "", "number") in rows
    # graph name applies even when declared after the triples
    named = [r for r in rows if r[3] == f"{ex}graph2"]
    assert len(named) == 1
    s, p, o, g, k = named[0]
    assert s.startswith("_:x") and o.startswith("_:y") and p == f"{ex}knows"


def test_bnode_labels_scoped_per_file(spark, tmp_path):
    doc = f"""<TriX {NS}><graph><triple>
      <id>b</id><uri>http://p</uri><uri>http://o</uri>
    </triple></graph></TriX>"""
    (tmp_path / "d").mkdir()
    (tmp_path / "d" / "a.trix").write_text(doc)
    (tmp_path / "d" / "b.trix").write_text(doc)
    df = read_trix(spark, str(tmp_path / "d"))
    subs = {r["s"] for r in df.collect()}
    assert len(subs) == 2, "equal bnode labels in different files must not merge"


def test_namespace_prefixed_tags(spark, tmp_path):
    doc = """<t:TriX xmlns:t="http://www.w3.org/2004/03/trix/trix-1/">
      <t:graph><t:triple>
        <t:uri>http://s</t:uri><t:uri>http://p</t:uri>
        <t:plainLiteral>v</t:plainLiteral>
      </t:triple></t:graph></t:TriX>"""
    df = _read(spark, tmp_path, "ns.trix", doc)
    assert [(r["s"], r["p"], r["o"]) for r in df.collect()] == [
        ("http://s", "http://p", "v")
    ]


def test_malformed_documents_raise(spark, tmp_path):
    bad_root = f"<graph {NS}></graph>"
    with pytest.raises(Exception, match="expected <TriX>"):
        _read(spark, tmp_path, "badroot.trix", bad_root).collect()
    two_terms = f"""<TriX {NS}><graph><triple>
      <uri>http://s</uri><uri>http://p</uri>
    </triple></graph></TriX>"""
    with pytest.raises(Exception, match="triple with 2 terms"):
        _read(spark, tmp_path, "two.trix", two_terms).collect()
    unknown = f"""<TriX {NS}><graph><triple>
      <uri>http://s</uri><uri>http://p</uri><thing>v</thing>
    </triple></graph></TriX>"""
    with pytest.raises(Exception, match="unknown term"):
        _read(spark, tmp_path, "unk.trix", unknown).collect()


def test_writer_roundtrip(spark, tmp_path):
    rows = [
        ("http://ex/a", "http://ex/p", "http://ex/b", "uri"),
        ("http://ex/a", "http://ex/n", "say <&> ok", "text"),
        ("http://ex/b", "http://ex/age", "7", "number"),
        ("_:z", "http://ex/p", "http://ex/a", "uri"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, okind string")
    path = str(tmp_path / "out.trix")
    write_trix(df, path)
    back = read_trix(spark, path)
    got = {(r["s"].split("-")[0] if r["s"].startswith("_:") else r["s"],
            r["p"], r["o"]) for r in back.collect()}
    assert got == {(s, p, o) for s, p, o, _ in rows}
    for f in glob.glob(path + "/part-*"):
        xml.dom.minidom.parse(f)  # each part is well-formed XML


def test_writer_named_graph_and_multi_graph_guard(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://s", "http://p", "http://o", "http://g1")],
        "s string, p string, o string, g string",
    )
    path = str(tmp_path / "g.trix")
    write_trix(df, path)
    back = read_trix(spark, path).collect()
    assert back[0]["g"] == "http://g1"
    two = spark.createDataFrame(
        [("s", "p", "o", "g1"), ("s", "p", "o", "g2")],
        "s string, p string, o string, g string",
    )
    with pytest.raises(ValueError, match="one graph per call"):
        write_trix(two, str(tmp_path / "two.trix"))
