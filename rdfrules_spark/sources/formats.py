"""Non-line-oriented RDF format readers: TriG, TriX, JSON-LD, RDF/XML —
plus the SQL-dump reader (relational dump -> triples).

Reference surface: format dispatch core:data/RdfSource.scala:52-67 (nt, nq,
ttl, json/jsonld, xml/rdf/owl, trig, trix, tsv, sql, cache); SQL-dump
semantics core:data/formats/Sql.scala:134-166 (PK column -> subject URI
``table/pkcol/value``, FK column -> object URI ``ftable/fcol/value``,
remaining columns -> typed literals; components URL-encoded). The reference
parses every one of these through Jena / JSqlParser as a SINGLE sequential
stream per file; none of them is line-splittable, so the honest Spark
parallelism unit is the FILE: ``spark.read.text(path, wholetext=True)``
yields one row per file and the parse fans out across files (a directory of
dumps parses with full parallelism; one giant file is one task, exactly
like Jena). For bulk data at cluster scale use NT/NQ (line-parallel,
sources/rdf.py) — this mirrors the reference's own guidance.

The SQL-dump INSERT parser additionally supports a LINE-PARALLEL mode
(``read_sql_dump(..., per_line=True)``) for mysqldump-style files where
every INSERT statement sits on one line: CREATE TABLE headers are collected
driver-side (schema-scale), then INSERT lines parse distributed.
"""

from __future__ import annotations

import json
import re
from urllib.parse import quote_plus
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfrules_spark.dictionary import term_kind

_TRIPLE_SCHEMA = "s string, p string, o string"
_QUAD_SCHEMA = "s string, p string, o string, g string"


def _whole_files(spark: SparkSession, path: str) -> DataFrame:
    """One row per file — the parallelism unit for stream-parsed formats."""
    return spark.read.text(path, wholetext=True)


# --------------------------------------------------------------------------
# TriG (full Turtle grammar + named graph blocks, sources/turtle.py)
# --------------------------------------------------------------------------


def read_trig(spark: SparkSession, path: str) -> DataFrame:
    """Full-spec TriG -> (s, p, o, g, okind): the complete Turtle grammar
    (sources/turtle.py — bnode property lists, collections, directives
    anywhere) plus ``{ … }`` / ``<g> { … }`` / ``GRAPH <g> { … }`` blocks
    and default-graph statements (g='')."""

    def parse(rows):
        import hashlib

        from rdfrules_spark.sources.turtle import parse_turtle

        for r in rows:
            salt = "-" + hashlib.md5(r["file"].encode()).hexdigest()[:8]
            yield from parse_turtle(r["value"], salt=salt, trig=True)

    files = _whole_files(spark, path).select(
        "value", F.input_file_name().alias("file")
    )
    out = spark.createDataFrame(files.rdd.mapPartitions(parse), _QUAD_SCHEMA)
    return out.withColumn("okind", term_kind(F.col("o")))


# --------------------------------------------------------------------------
# TriX (XML quads)
# --------------------------------------------------------------------------


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _trix_term(el) -> str:
    kind = _strip_ns(el.tag)
    text = el.text or ""
    if kind == "uri":
        return text
    if kind == "id":
        return text if text.startswith("_:") else f"_:{text}"
    return text  # plainLiteral / typedLiteral keep the lexical form


def read_trix(spark: SparkSession, path: str) -> DataFrame:
    """TriX -> (s, p, o, g, okind). <graph><uri>g</uri><triple>t t t</triple>
    ...</graph>; a graph without a uri is the default graph (g='')."""

    def parse(rows):
        for r in rows:
            root = ElementTree.fromstring(r["value"])
            for graph in root:
                if _strip_ns(graph.tag) != "graph":
                    continue
                g = ""
                for child in graph:
                    tag = _strip_ns(child.tag)
                    if tag == "uri":
                        g = child.text or ""
                    elif tag == "triple":
                        terms = [_trix_term(t) for t in child]
                        if len(terms) == 3:
                            yield (*terms, g)

    out = spark.createDataFrame(
        _whole_files(spark, path).rdd.mapPartitions(parse), _QUAD_SCHEMA
    )
    return out.withColumn("okind", term_kind(F.col("o")))


# --------------------------------------------------------------------------
# JSON-LD (expanded/compacted subset)
# --------------------------------------------------------------------------


def _jsonld_nodes(doc):
    if isinstance(doc, list):
        for x in doc:
            yield from _jsonld_nodes(x)
    elif isinstance(doc, dict):
        if "@graph" in doc:
            yield from _jsonld_nodes(doc["@graph"])
        elif "@id" in doc or any(not k.startswith("@") for k in doc):
            yield doc


def _jsonld_value(v):
    """Object value -> (object_string, nested_node_or_None)."""
    if isinstance(v, dict):
        if "@value" in v:
            return str(v["@value"]), None
        if set(v) == {"@id"}:
            return v["@id"], None
        return None, v  # nested node object
    if isinstance(v, bool):
        return ("true" if v else "false"), None
    return str(v), None


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """JSON-LD subset -> (s, p, o, okind): top-level node array / @graph,
    simple string @context term mappings, @id / @value / @type / nested node
    objects (blank-node ids assigned per file)."""

    def parse(rows):
        for r in rows:
            doc = json.loads(r["value"])
            ctx = {}
            if isinstance(doc, dict) and isinstance(doc.get("@context"), dict):
                ctx = {
                    k: v
                    for k, v in doc["@context"].items()
                    if isinstance(v, str)
                }
            counter = [0]

            def expand(term):
                return ctx.get(term, term)

            def walk(node):
                sid = node.get("@id")
                if sid is None:
                    counter[0] += 1
                    sid = f"_:b{counter[0]}"
                for key, vals in node.items():
                    if key == "@type":
                        types = vals if isinstance(vals, list) else [vals]
                        for t in types:
                            yield (
                                sid,
                                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                                expand(t),
                            )
                        continue
                    if key.startswith("@"):
                        continue
                    pred = expand(key)
                    items = vals if isinstance(vals, list) else [vals]
                    for v in items:
                        obj, nested = _jsonld_value(v)
                        if nested is not None:
                            sub = list(walk(nested))
                            if sub:
                                yield (sid, pred, sub[0][0])
                                yield from sub
                        else:
                            yield (sid, pred, obj)

            for node in _jsonld_nodes(doc):
                yield from walk(node)

    out = spark.createDataFrame(
        _whole_files(spark, path).rdd.mapPartitions(parse), _TRIPLE_SCHEMA
    )
    return out.withColumn("okind", term_kind(F.col("o")))


# --------------------------------------------------------------------------
# RDF/XML (subset)
# --------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """RDF/XML subset -> (s, p, o, okind): rdf:Description + typed node
    elements, rdf:about/rdf:nodeID subjects, rdf:resource / text-literal /
    nested-node property elements, rdf:type from typed nodes."""

    def parse(rows):
        for r in rows:
            root = ElementTree.fromstring(r["value"])
            counter = [0]

            def node_id(el):
                about = el.get(f"{{{_RDF_NS}}}about")
                if about is not None:
                    return about
                nid = el.get(f"{{{_RDF_NS}}}nodeID")
                if nid is not None:
                    return f"_:{nid}"
                rid = el.get(f"{{{_RDF_NS}}}ID")
                if rid is not None:
                    return rid
                counter[0] += 1
                return f"_:b{counter[0]}"

            def qname(tag):
                if tag.startswith("{"):
                    ns, local = tag[1:].split("}", 1)
                    return ns + local
                return tag

            def walk(el):
                sid = node_id(el)
                if qname(el.tag) != f"{_RDF_NS}Description":
                    yield (sid, f"{_RDF_NS}type", qname(el.tag))
                for prop in el:
                    pred = qname(prop.tag)
                    res = prop.get(f"{{{_RDF_NS}}}resource")
                    nid = prop.get(f"{{{_RDF_NS}}}nodeID")
                    children = list(prop)
                    if res is not None:
                        yield (sid, pred, res)
                    elif nid is not None:
                        yield (sid, pred, f"_:{nid}")
                    elif children:
                        for child in children:
                            sub = list(walk(child))
                            if sub:
                                yield (sid, pred, sub[0][0])
                                yield from sub
                    else:
                        yield (sid, pred, (prop.text or "").strip())

            for el in root:
                yield from walk(el)

    out = spark.createDataFrame(
        _whole_files(spark, path).rdd.mapPartitions(parse), _TRIPLE_SCHEMA
    )
    return out.withColumn("okind", term_kind(F.col("o")))


# --------------------------------------------------------------------------
# SQL dump (relational -> triples, Sql.scala semantics)
# --------------------------------------------------------------------------

_INT_TYPES = {
    "BIT", "BYTE", "SINGLE", "TINYINT", "SMALLINT", "MEDIUMINT", "INT",
    "INTEGER",
}
_DOUBLE_TYPES = {
    "BIGINT", "FLOAT", "DOUBLE", "DECIMAL", "NUMERIC", "REAL", "LONG",
    "NUMBER",
}
_BOOL_TYPES = {"BOOL", "BOOLEAN"}

_CREATE_RE = re.compile(
    r"create\s+table\s+`?(\w+)`?\s*\((.*?)\)\s*(?:engine|;|$)",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"insert\s+into\s+`?(\w+)`?\s*(?:\(([^)]*)\))?\s*values\s*(.*)",
    re.IGNORECASE | re.DOTALL,
)


def _split_top(text: str, sep: str = ","):
    """Split on `sep` outside quotes/parens."""
    out, depth, buf, i, n = [], 0, [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(text[i:j + 1])
            i = j + 1
        elif ch == "(":
            depth += 1
            buf.append(ch)
            i += 1
        elif ch == ")":
            depth -= 1
            buf.append(ch)
            i += 1
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    if buf:
        out.append("".join(buf))
    return out


def _parse_create(stmt: str):
    """CREATE TABLE -> (table, [(col, type, index)]); index is 'pk',
    ('fk', table, col) or None (Sql.scala Table/Col/Index)."""
    m = _CREATE_RE.search(stmt)
    if not m:
        return None
    table, body = m.group(1), m.group(2)
    cols, fks, pks = [], {}, set()
    for item in _split_top(body):
        item = item.strip()
        iu = item.upper()
        fk = re.match(
            r"(?:CONSTRAINT\s+\S+\s+)?FOREIGN\s+KEY\s*\(\s*`?(\w+)`?\s*\)\s*"
            r"REFERENCES\s+`?(\w+)`?\s*\(\s*`?(\w+)`?\s*\)",
            iu and item, re.IGNORECASE,
        )
        if fk:
            fks[fk.group(1)] = (fk.group(2), fk.group(3))
            continue
        pk = re.match(r"PRIMARY\s+KEY\s*\(\s*`?(\w+)`?", item, re.IGNORECASE)
        if pk:
            pks.add(pk.group(1))
            continue
        cm = re.match(r"`?(\w+)`?\s+(\w+)", item)
        if not cm or cm.group(1).upper() in (
            "KEY", "INDEX", "UNIQUE", "CONSTRAINT", "CHECK"
        ):
            continue
        name, sqltype = cm.group(1), cm.group(2).upper()
        idx = None
        if "PRIMARY KEY" in iu:
            idx = "pk"
        refm = re.search(
            r"REFERENCES\s+`?(\w+)`?\s*\(\s*`?(\w+)`?\s*\)", item, re.IGNORECASE
        )
        if idx is None and refm:
            idx = ("fk", refm.group(1), refm.group(2))
        if sqltype in _INT_TYPES:
            typ = "int"
        elif sqltype in _DOUBLE_TYPES:
            typ = "double"
        elif sqltype in _BOOL_TYPES:
            typ = "bool"
        else:
            typ = "text"
        cols.append([name, typ, idx])
    for c in cols:
        if c[0] in pks and c[2] is None:
            c[2] = "pk"
        if c[0] in fks and c[2] is None:
            c[2] = ("fk", *fks[c[0]])
    return table, [tuple(c) for c in cols]


def _unquote_sql(v: str) -> str:
    v = v.strip()
    if v.startswith("'") and v.endswith("'"):
        v = v[1:-1].replace("''", "'").replace("\\'", "'")
    return v


def _row_triples(table: str, cols, values):
    """Sql.scala Row.toTriples: subject from the first PK column;
    FK -> object URI ``ftable/fcol/value``; plain cols typed literals."""
    enc = quote_plus
    pairs = list(zip(cols, values))
    subj = None
    for (name, _typ, idx), v in pairs:
        if idx == "pk":
            subj = f"{enc(table)}/{enc(name)}/{enc(_unquote_sql(v))}"
            break
    if subj is None:
        return
    for (name, typ, idx), v in pairs:
        if idx == "pk":
            continue
        if isinstance(idx, tuple):
            _, ftable, fcol = idx
            yield (
                subj, enc(name),
                f"{enc(ftable)}/{enc(fcol)}/{enc(_unquote_sql(v))}",
            )
            continue
        raw = v.strip()
        if typ == "int":
            try:
                yield (subj, enc(name), str(int(raw)))
                continue
            except ValueError:
                pass
        elif typ == "double":
            try:
                yield (subj, enc(name), str(float(raw)))
                continue
            except ValueError:
                pass
        elif typ == "bool":
            if raw.lower() in ("true", "false"):
                yield (subj, enc(name), raw.lower())
                continue
            if raw in ("0", "1"):
                yield (subj, enc(name), "true" if raw == "1" else "false")
                continue
        yield (subj, enc(name), _unquote_sql(v))


def _parse_inserts(text: str, meta: dict):
    # statements split on top-level ';' first (quote/paren-aware) — a
    # greedy DOTALL match across statements would swallow the rest of the
    # chunk into the first INSERT's VALUES part
    for stmt in _split_top(text, ";"):
        m = _INSERT_RE.search(stmt)
        if not m:
            continue
        table = m.group(1)
        if table not in meta:
            continue
        schema = meta[table]
        if m.group(2):
            wanted = [c.strip().strip("`") for c in m.group(2).split(",")]
            by_name = {c[0]: c for c in schema}
            cols = [by_name[w] for w in wanted if w in by_name]
        else:
            cols = schema
        values_part = m.group(3).rstrip().rstrip(";")
        for tup in _split_top(values_part):
            tup = tup.strip()
            if not (tup.startswith("(") and tup.endswith(")")):
                continue
            vals = [x.strip() for x in _split_top(tup[1:-1])]
            if len(vals) != len(cols):
                continue
            yield from _row_triples(table, cols, vals)


# explicit, loudly-enforced parse bounds (the reference streams these
# formats single-threaded through JSqlParser; we bound instead of degrade)
_CREATE_SCAN_BOUND = 100_000  # driver-collected CREATE-header lines
_WHOLE_FILE_BOUND = 1 << 30  # 1 GiB of one-task whole-file SQL text


def read_sql_dump(
    spark: SparkSession, path: str, per_line: bool = False
) -> DataFrame:
    """SQL dump -> (s, p, o, okind) triples with the reference's Sql.scala
    row semantics. ``per_line=True`` parses INSERT lines distributed
    (mysqldump one-statement-per-line layout); CREATE TABLE metadata is
    always collected driver-side (schema-scale, bounded by
    ``_CREATE_SCAN_BOUND`` with a loud ValueError past it). Whole-file mode
    refuses files over ``_WHOLE_FILE_BOUND`` instead of silently running a
    multi-GiB single-task parse."""
    if per_line:
        lines = spark.read.text(path)
        head_rows = lines.where(
            F.upper("value").rlike("CREATE TABLE|PRIMARY KEY|FOREIGN KEY|REFERENCES|^\\s*`|\\)\\s*;?\\s*$")
        ).limit(_CREATE_SCAN_BOUND + 1).collect()
        if len(head_rows) > _CREATE_SCAN_BOUND:
            raise ValueError(
                f"read_sql_dump(per_line=True): more than "
                f"{_CREATE_SCAN_BOUND} CREATE-TABLE header lines — the "
                "driver-side schema scan would be unbounded; split the "
                "dump or trim non-INSERT preamble"
            )
        heads = "\n".join(r["value"] for r in head_rows)
        meta = dict(
            t for t in (
                _parse_create(s) for s in heads.split(";")
            ) if t
        )
        bc = spark.sparkContext.broadcast(meta)

        def parse_lines(rows):
            m = bc.value
            for r in rows:
                yield from _parse_inserts(r["value"], m)

        out = spark.createDataFrame(
            lines.rdd.mapPartitions(parse_lines), _TRIPLE_SCHEMA
        )
    else:
        whole_bound = _WHOLE_FILE_BOUND  # captured by value for executors

        def parse_files(rows):
            for r in rows:
                text = r["value"]
                if len(text) > whole_bound:
                    raise ValueError(
                        f"read_sql_dump: file exceeds the whole-file parse "
                        f"bound ({whole_bound} bytes) — use "
                        "per_line=True for mysqldump-style "
                        "one-statement-per-line dumps"
                    )
                meta = dict(
                    t for t in (
                        _parse_create(s) for s in text.split(";")
                    ) if t
                )
                yield from _parse_inserts(text, meta)

        out = spark.createDataFrame(
            _whole_files(spark, path).rdd.mapPartitions(parse_files),
            _TRIPLE_SCHEMA,
        )
    return out.withColumn("okind", term_kind(F.col("o")))
