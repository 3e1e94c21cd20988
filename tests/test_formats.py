"""Format readers beyond NT/NQ/TTL: TriG, TriX, JSON-LD, RDF/XML, SQL dump
(reference dispatch core:data/RdfSource.scala:52-67; SQL semantics
core:data/formats/Sql.scala:134-166). Hand-computed goldens over tiny
fixtures written to tmp_path."""

from __future__ import annotations

from rdfrules_spark.sources.formats import (
    read_jsonld,
    read_rdfxml,
    read_sql_dump,
    read_trig,
    read_trix,
)
from rdfrules_spark.sources.rdf import read_rdf

TRIG = """\
@prefix ex: <http://ex.org/> .
ex:top ex:p ex:global .
ex:g1 {
  ex:a ex:knows ex:b ;
       ex:name "Al\\"ice" .
  ex:b a ex:Person .
}
GRAPH <http://ex.org/g2> {
  ex:c ex:knows ex:a , ex:b .
}
"""


def test_read_trig(spark, tmp_path):
    f = tmp_path / "data.trig"
    f.write_text(TRIG)
    rows = {
        (r.s, r.p, r.o, r.g)
        for r in read_trig(spark, str(f)).collect()
    }
    ex = "http://ex.org/"
    assert rows == {
        (f"{ex}top", f"{ex}p", f"{ex}global", ""),
        (f"{ex}a", f"{ex}knows", f"{ex}b", f"{ex}g1"),
        (f"{ex}a", f"{ex}name", 'Al"ice', f"{ex}g1"),
        (f"{ex}b", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         f"{ex}Person", f"{ex}g1"),
        (f"{ex}c", f"{ex}knows", f"{ex}a", f"{ex}g2"),
        (f"{ex}c", f"{ex}knows", f"{ex}b", f"{ex}g2"),
    }


TRIX = """\
<?xml version="1.0"?>
<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  <graph>
    <uri>http://ex.org/g1</uri>
    <triple>
      <uri>http://ex.org/a</uri>
      <uri>http://ex.org/knows</uri>
      <uri>http://ex.org/b</uri>
    </triple>
    <triple>
      <id>n1</id>
      <uri>http://ex.org/age</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#int">42</typedLiteral>
    </triple>
  </graph>
  <graph>
    <triple>
      <uri>http://ex.org/c</uri>
      <uri>http://ex.org/name</uri>
      <plainLiteral>Carol</plainLiteral>
    </triple>
  </graph>
</TriX>
"""


def test_read_trix(spark, tmp_path):
    f = tmp_path / "data.trix"
    f.write_text(TRIX)
    # blank-node labels are file-scoped (salted) since the round-4 spec
    # audit — normalize the salt off before comparing
    rows = {
        (r.s.split("-")[0] if r.s.startswith("_:") else r.s, r.p, r.o, r.g)
        for r in read_trix(spark, str(f)).collect()
    }
    assert rows == {
        ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b",
         "http://ex.org/g1"),
        ("_:n1", "http://ex.org/age", "42", "http://ex.org/g1"),
        ("http://ex.org/c", "http://ex.org/name", "Carol", ""),
    }


JSONLD = """\
{
  "@context": {"knows": "http://ex.org/knows", "name": "http://ex.org/name",
               "Person": "http://ex.org/Person"},
  "@graph": [
    {"@id": "http://ex.org/a", "@type": "Person",
     "knows": [{"@id": "http://ex.org/b"},
               {"name": "Anon"}],
     "name": {"@value": "Alice", "@language": "en"}},
    {"@id": "http://ex.org/b", "name": "Bob", "http://ex.org/age": 33}
  ]
}
"""


def test_read_jsonld(spark, tmp_path):
    f = tmp_path / "data.jsonld"
    f.write_text(JSONLD)
    rows = {(r.s, r.p, r.o) for r in read_jsonld(spark, str(f)).collect()}
    assert ("http://ex.org/a",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://ex.org/Person") in rows
    assert ("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b") in rows
    assert ("http://ex.org/a", "http://ex.org/name", "Alice") in rows
    assert ("http://ex.org/b", "http://ex.org/name", "Bob") in rows
    assert ("http://ex.org/b", "http://ex.org/age", "33") in rows
    # the nested anonymous node: a knows _:b1, and _:b1 has the name
    anon = [o for s, p, o in rows
            if s == "http://ex.org/a" and p == "http://ex.org/knows"
            and o.startswith("_:")]
    assert len(anon) == 1
    assert (anon[0], "http://ex.org/name", "Anon") in rows
    assert len(rows) == 7


RDFXML = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.org/">
  <rdf:Description rdf:about="http://ex.org/a">
    <ex:knows rdf:resource="http://ex.org/b"/>
    <ex:name>Alice</ex:name>
    <ex:friend>
      <rdf:Description rdf:about="http://ex.org/c">
        <ex:name>Carol</ex:name>
      </rdf:Description>
    </ex:friend>
  </rdf:Description>
  <ex:Person rdf:about="http://ex.org/b">
    <ex:name>Bob</ex:name>
  </ex:Person>
</rdf:RDF>
"""


def test_read_rdfxml(spark, tmp_path):
    f = tmp_path / "data.xml"
    f.write_text(RDFXML)
    rows = {(r.s, r.p, r.o) for r in read_rdfxml(spark, str(f)).collect()}
    ex = "http://ex.org/"
    assert rows == {
        (f"{ex}a", f"{ex}knows", f"{ex}b"),
        (f"{ex}a", f"{ex}name", "Alice"),
        (f"{ex}a", f"{ex}friend", f"{ex}c"),
        (f"{ex}c", f"{ex}name", "Carol"),
        (f"{ex}b", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         f"{ex}Person"),
        (f"{ex}b", f"{ex}name", "Bob"),
    }


SQL_DUMP = """\
CREATE TABLE `person` (
  `id` INT PRIMARY KEY,
  `name` VARCHAR(40),
  `age` INT,
  `score` DOUBLE,
  `active` BOOLEAN,
  `city_id` INT,
  FOREIGN KEY (`city_id`) REFERENCES `city` (`cid`)
);
CREATE TABLE city (cid INT, cname TEXT, PRIMARY KEY (cid));
INSERT INTO `person` VALUES (1, 'Alice, ''A''', 30, 9.5, true, 10), (2, 'Bob', 41, 7.25, false, 20);
INSERT INTO person (id, name) VALUES (3, 'Carol');
INSERT INTO city VALUES (10, 'Oslo'), (20, 'Rio');
"""


def test_read_sql_dump(spark, tmp_path):
    f = tmp_path / "dump.sql"
    f.write_text(SQL_DUMP)
    for per_line in (False, True):
        rows = {
            (r.s, r.p, r.o)
            for r in read_sql_dump(spark, str(f), per_line=per_line).collect()
        }
        # subject = table/pkcol/value (URL-encoded); FK -> ftable/fcol/value;
        # PK column itself is never a predicate (Sql.scala Row.toTriples)
        assert rows == {
            ("person/id/1", "name", "Alice, 'A'"),
            ("person/id/1", "age", "30"),
            ("person/id/1", "score", "9.5"),
            ("person/id/1", "active", "true"),
            ("person/id/1", "city_id", "city/cid/10"),
            ("person/id/2", "name", "Bob"),
            ("person/id/2", "age", "41"),
            ("person/id/2", "score", "7.25"),
            ("person/id/2", "active", "false"),
            ("person/id/2", "city_id", "city/cid/20"),
            ("person/id/3", "name", "Carol"),
            ("city/cid/10", "cname", "Oslo"),
            ("city/cid/20", "cname", "Rio"),
        }, f"per_line={per_line}"


def test_read_rdf_dispatch(spark, tmp_path):
    (tmp_path / "x.trig").write_text(TRIG)
    (tmp_path / "x.trix").write_text(TRIX)
    (tmp_path / "x.jsonld").write_text(JSONLD)
    (tmp_path / "x.rdf").write_text(RDFXML)
    (tmp_path / "x.sql").write_text(SQL_DUMP)
    assert read_rdf(spark, str(tmp_path / "x.trig")).count() == 6
    assert read_rdf(spark, str(tmp_path / "x.trix")).count() == 3
    assert read_rdf(spark, str(tmp_path / "x.jsonld")).count() == 7
    assert read_rdf(spark, str(tmp_path / "x.rdf")).count() == 6
    assert read_rdf(spark, str(tmp_path / "x.sql")).count() == 13
    try:
        read_rdf(spark, str(tmp_path / "x.bogus"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
