"""Extra SQL-dump reader cases (quoted escapes, typed literals, multi-row
inserts, column-level FOREIGN KEY, PK-less tables) on top of
test_formats.py's suite — sources/formats.read_sql_dump, Sql.scala
semantics."""

from __future__ import annotations

import pytest

from rdfrules_spark.sources.formats import read_sql_dump

DUMP = """-- test dump
CREATE TABLE city (id INT PRIMARY KEY, name VARCHAR(40));
CREATE TABLE person (id INT PRIMARY KEY, name VARCHAR(40), age INT, score DOUBLE, vip BOOLEAN, city_id INT FOREIGN KEY REFERENCES city (id));
CREATE TABLE log (msg VARCHAR(99));
INSERT INTO city (id, name) VALUES (7, 'Springfield');
INSERT INTO person (id, name, age, score, vip, city_id) VALUES (1, 'Ann O''Hara', 34, 1.5, true, 7), (2, 'Bob', NULL, NULL, false, NULL);
INSERT INTO person VALUES (3, 'Cid', 20, 2.0, false, 7);
INSERT INTO log (msg) VALUES ('no pk -> no triples');
"""

EXPECTED = {
    ("city/id/7", "name", "Springfield", "text"),
    ("person/id/1", "name", "Ann O'Hara", "text"),
    ("person/id/1", "age", "34", "number"),
    ("person/id/1", "score", "1.5", "number"),
    ("person/id/1", "vip", "true", "boolean"),
    ("person/id/1", "city_id", "city/id/7", "text"),
    ("person/id/2", "name", "Bob", "text"),
    ("person/id/2", "vip", "false", "boolean"),
    # the reference materializes NULL tokens as text (Sql.scala Row:
    # jsqlparser Expression.toString for NULL -> Text("NULL")), incl. the
    # FK link against the literal value
    ("person/id/2", "age", "NULL", "text"),
    ("person/id/2", "score", "NULL", "text"),
    ("person/id/2", "city_id", "city/id/NULL", "text"),
    ("person/id/3", "name", "Cid", "text"),
    ("person/id/3", "age", "20", "number"),
    ("person/id/3", "score", "2.0", "number"),
    ("person/id/3", "vip", "false", "boolean"),
    ("person/id/3", "city_id", "city/id/7", "text"),
}


def test_read_sql_dump(spark, tmp_path):
    path = tmp_path / "dump.sql"
    path.write_text(DUMP, encoding="utf-8")
    got = {
        (r["s"], r["p"], r["o"], r["okind"])
        for r in read_sql_dump(spark, str(path)).collect()
    }
    assert got == EXPECTED




def test_whole_file_bound_errors_loudly(spark, tmp_path, monkeypatch):
    from rdfrules_spark.sources import formats

    monkeypatch.setattr(formats, "_WHOLE_FILE_BOUND", 10)
    path = tmp_path / "big.sql"
    path.write_text(DUMP, encoding="utf-8")
    with pytest.raises(Exception, match="whole-file parse"):
        formats.read_sql_dump(spark, str(path)).collect()


def test_create_scan_bound_errors_loudly(spark, tmp_path, monkeypatch):
    from rdfrules_spark.sources import formats

    monkeypatch.setattr(formats, "_CREATE_SCAN_BOUND", 2)
    path = tmp_path / "dump.sql"
    path.write_text(DUMP, encoding="utf-8")
    with pytest.raises(ValueError, match="CREATE-TABLE header lines"):
        formats.read_sql_dump(spark, str(path), per_line=True)
