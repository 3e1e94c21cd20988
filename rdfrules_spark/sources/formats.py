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


_TRIX_TERMS = {"uri", "id", "plainLiteral", "typedLiteral"}


def _trix_term(el, salt: str) -> str:
    kind = _strip_ns(el.tag)
    if kind not in _TRIX_TERMS:
        raise ValueError(f"TriX: unknown term element <{kind}>")
    text = el.text or ""
    if kind == "uri":
        return text
    if kind == "id":
        # blank-node labels are DOCUMENT-scoped (TriX spec §2 / Jena
        # reader): salt per file so equal labels in different files never
        # merge (same contract as the Turtle reader)
        label = text[2:] if text.startswith("_:") else text
        return f"_:{label}{salt}"
    return text  # plainLiteral / typedLiteral keep the lexical form


def read_trix(spark: SparkSession, path: str) -> DataFrame:
    """TriX -> (s, p, o, g, okind): <TriX><graph><uri>g</uri>
    <triple>t t t</triple>...</graph>...</TriX> (W3C TriX note;
    reference dispatch RdfSource.scala:52-67 via Jena Lang.TRIX).

    Spec points covered (tests/test_trix_full.py): graph name anywhere in
    the graph element (not just before the first triple), unnamed graph =
    default graph (g=''), multiple graphs per document, all four term
    kinds (uri / id / plainLiteral[@xml:lang] / typedLiteral[@datatype] —
    lexical forms kept, tags dropped, per the repo-wide ParsedLiterals
    convention), namespace-prefixed element names, comments ignored,
    per-file blank-node scoping. A <triple> without exactly 3 term
    children or an unknown term element raises (malformed document —
    Jena errors too, silent skips would hide data loss)."""

    def parse(rows):
        import hashlib

        for r in rows:
            salt = "-" + hashlib.md5(r["file"].encode()).hexdigest()[:8]
            root = ElementTree.fromstring(r["value"])
            if _strip_ns(root.tag) != "TriX":
                raise ValueError(
                    f"TriX: root element is <{_strip_ns(root.tag)}>,"
                    " expected <TriX>"
                )
            for graph in root:
                if _strip_ns(graph.tag) != "graph":
                    continue
                # the graph NAME may appear anywhere among the children;
                # resolve it before emitting any of the graph's triples
                g = ""
                for child in graph:
                    if _strip_ns(child.tag) == "uri":
                        g = child.text or ""
                for child in graph:
                    if _strip_ns(child.tag) == "triple":
                        terms = [_trix_term(t, salt) for t in child]
                        if len(terms) != 3:
                            raise ValueError(
                                f"TriX: triple with {len(terms)} terms"
                            )
                        yield (*terms, g)

    files = _whole_files(spark, path).select(
        "value", F.input_file_name().alias("file")
    )
    out = spark.createDataFrame(
        files.rdd.mapPartitions(parse), _QUAD_SCHEMA
    )
    return out.withColumn("okind", term_kind(F.col("o")))


# --------------------------------------------------------------------------
# JSON-LD (expanded/compacted subset)
# --------------------------------------------------------------------------


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
_JSONLD_KEYWORDS = {
    "@id", "@type", "@value", "@language", "@list", "@set", "@graph",
    "@context", "@reverse", "@index", "@vocab", "@base", "@container",
    "@nest", "@json", "@none",
}


class _JsonLdCtx:
    """Active JSON-LD context: term definitions + @vocab/@base + keyword
    aliases, with compact-IRI and vocab/document-relative expansion
    (JSON-LD 1.1 context processing, the surface Jena's Titanium parser
    covers for the reference's 'json/jsonld' dispatch)."""

    def __init__(self):
        self.terms: dict[str, dict] = {}
        self.vocab = ""
        self.base = ""
        self.aliases: dict[str, str] = {}

    def load(self, ctx) -> "_JsonLdCtx":
        if ctx is None:
            return self
        if isinstance(ctx, list):
            for c in ctx:
                self.load(c)
            return self
        if not isinstance(ctx, dict):
            return self  # remote context IRIs are out of scope offline
        for k, v in ctx.items():
            if k == "@vocab":
                self.vocab = v or ""
            elif k == "@base":
                self.base = v or ""
            elif isinstance(v, str):
                if v in _JSONLD_KEYWORDS:
                    self.aliases[k] = v
                else:
                    self.terms[k] = {"id": v}
        # second pass: dict term definitions may reference other terms
        for k, v in ctx.items():
            if isinstance(v, dict):
                d = {"id": self.expand_iri(v.get("@id", k), vocab=True)}
                if "@type" in v:
                    d["type"] = (
                        "@id" if v["@type"] in ("@id", "@vocab")
                        else self.expand_iri(v["@type"], vocab=True)
                    )
                if "@container" in v:
                    cont = v["@container"]
                    d["container"] = (
                        cont if isinstance(cont, str) else
                        next(iter(cont), None)
                    )
                if "@reverse" in v:
                    d = {"id": self.expand_iri(v["@reverse"], vocab=True),
                         "reverse": True}
                self.terms[k] = d
        return self

    def norm_key(self, key: str) -> str:
        """Map a node key to the keyword it aliases ('id' -> '@id'), or
        itself (keywords and ordinary terms pass through)."""
        if key.startswith("@"):
            return key
        return self.aliases.get(key, key)

    def get_kw(self, node: dict, kw: str):
        """Fetch a keyword's value from a node, alias-aware."""
        if kw in node:
            return node[kw]
        for k, v in node.items():
            if not k.startswith("@") and self.aliases.get(k) == kw:
                return v
        return None

    def has_kw(self, node: dict, kw: str) -> bool:
        """True iff the keyword KEY is present (alias-aware) — distinct
        from get_kw returning None, which also covers an explicit JSON
        null value (``{"@value": null}``)."""
        if kw in node:
            return True
        return any(
            not k.startswith("@") and self.aliases.get(k) == kw
            for k in node
        )

    def expand_iri(self, term: str, vocab: bool = False,
                   doc_relative: bool = False) -> str:
        from urllib.parse import urljoin

        if not isinstance(term, str) or term.startswith("@"):
            return term
        if term in self.terms:
            return self.terms[term]["id"]
        if ":" in term:
            prefix, local = term.split(":", 1)
            if local.startswith("//"):
                return term  # absolute IRI with authority
            if prefix in self.terms:
                return self.terms[prefix]["id"] + local
            if prefix == "_":
                return term  # blank node
            return term
        if vocab and self.vocab:
            return self.vocab + term
        if doc_relative and self.base:
            return urljoin(self.base, term)
        return term


def _jsonld_literal(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """JSON-LD -> (s, p, o, okind): @context processing (term defs incl.
    dict definitions with @type/@container/@reverse, @vocab, @base,
    keyword aliases, compact IRIs), node arrays / nested @graph
    flattening, @id / @type coercion, value objects (@value with
    @type/@language — lexical form kept, tags dropped: the
    ParsedLiterals convention), @list -> rdf:first/rest/nil chains,
    @set flattening, @reverse edges, nested node objects; blank-node ids
    assigned per file. Reference dispatch: 'json/jsonld' in
    core:data/RdfSource.scala:52-67 (Jena RIOT)."""

    def parse(rows):
        for r in rows:
            doc = json.loads(r["value"])
            counter = [0]

            def new_bnode():
                counter[0] += 1
                return f"_:b{counter[0]}"

            def node_ref(node, ctx):
                sid = ctx.get_kw(node, "@id") if isinstance(
                    node, dict
                ) else None
                if sid is None:
                    return new_bnode()
                return ctx.expand_iri(sid, doc_relative=True)

            def as_list(v):
                return v if isinstance(v, list) else [v]

            def emit_list(items, ctx, tdef):
                """@list -> first/rest chain; returns the head. Null
                entries (expansion drops them) are skipped."""
                resolved = []
                for item in items:
                    oid, sub = obj_of(item, ctx, tdef)
                    if oid is not None:
                        resolved.append((oid, sub))
                cells = [new_bnode() for _ in resolved]
                prev = _RDF_NIL
                out = []
                for cell, (oid, sub) in zip(
                    reversed(cells), reversed(resolved)
                ):
                    out.append((cell, _RDF_FIRST, oid))
                    out.append((cell, _RDF_REST, prev))
                    out.extend(sub)
                    prev = cell
                head = cells[0] if cells else _RDF_NIL
                return head, out

            def obj_of(v, ctx, tdef):
                """One value -> (object term, extra triples); (None, [])
                when JSON-LD expansion drops the statement (explicit
                ``"@value": null``)."""
                if isinstance(v, dict):
                    if ctx.has_kw(v, "@value"):
                        val = ctx.get_kw(v, "@value")
                        if val is None:
                            return None, []
                        return _jsonld_literal(val), []
                    lst = ctx.get_kw(v, "@list")
                    if lst is not None:
                        return emit_list(as_list(lst), ctx, None)
                    norm = {ctx.norm_key(k) for k in v}
                    if norm <= {"@id", "@index"}:
                        return node_ref(v, ctx), []
                    sid = node_ref(v, ctx)
                    return sid, list(walk(v, ctx, sid))
                if tdef and tdef.get("type") == "@id" and isinstance(
                    v, str
                ):
                    return ctx.expand_iri(v, doc_relative=True), []
                return _jsonld_literal(v), []

            def walk(node, ctx, sid=None):
                if isinstance(node.get("@context"), (dict, list, str)):
                    # a local context EXTENDS the active one (JSON-LD §4.1)
                    child = _JsonLdCtx()
                    child.terms = dict(ctx.terms)
                    child.aliases = dict(ctx.aliases)
                    child.vocab, child.base = ctx.vocab, ctx.base
                    ctx = child.load(node["@context"])
                if sid is None:
                    sid = node_ref(node, ctx)
                for key, vals in node.items():
                    k = ctx.norm_key(key)
                    if k in ("@context", "@id"):
                        continue
                    if k == "@type":
                        for t in as_list(vals):
                            yield (
                                sid, _RDF_TYPE,
                                ctx.expand_iri(t, vocab=True,
                                               doc_relative=True),
                            )
                        continue
                    if k == "@graph":
                        for sub in as_list(vals):
                            yield from walk(sub, ctx)
                        continue
                    if k == "@reverse":
                        for rkey, rvals in vals.items():
                            pred = ctx.expand_iri(rkey, vocab=True)
                            for v in as_list(rvals):
                                oid, sub = obj_of(v, ctx, None)
                                if oid is not None:
                                    yield (oid, pred, sid)
                                yield from sub
                        continue
                    if k.startswith("@") and k in _JSONLD_KEYWORDS:
                        continue
                    tdef = ctx.terms.get(key)
                    pred = ctx.expand_iri(key, vocab=True)
                    if tdef and tdef.get("reverse"):
                        for v in as_list(vals):
                            oid, sub = obj_of(v, ctx, None)
                            if oid is not None:
                                yield (oid, pred, sid)
                            yield from sub
                        continue
                    if tdef and tdef.get("container") == "@list" and \
                            isinstance(vals, list):
                        head, sub = emit_list(vals, ctx, tdef)
                        yield (sid, pred, head)
                        yield from sub
                        continue
                    for v in as_list(vals):
                        oid, sub = obj_of(v, ctx, tdef)
                        if oid is not None:
                            yield (sid, pred, oid)
                        yield from sub

            ctx0 = _JsonLdCtx()
            if isinstance(doc, dict):
                ctx0.load(doc.get("@context"))
            top = doc
            if isinstance(doc, dict):
                graph = ctx0.get_kw(doc, "@graph")
                # a top-level @graph wrapper with no @id of its own is the
                # default graph; with an @id (or other props) it is a node
                if graph is not None and ctx0.get_kw(doc, "@id") is None:
                    top = graph
                else:
                    top = [doc]
            for node in (top if isinstance(top, list) else [top]):
                if isinstance(node, dict):
                    yield from walk(node, ctx0)

    out = spark.createDataFrame(
        _whole_files(spark, path).rdd.mapPartitions(parse), _TRIPLE_SCHEMA
    )
    return out.withColumn("okind", term_kind(F.col("o")))


# --------------------------------------------------------------------------
# RDF/XML (subset)
# --------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"

# rdf: attributes that are syntax, never property attributes
_RDFXML_SYNTAX_ATTRS = {
    f"{{{_RDF_NS}}}{a}"
    for a in ("about", "ID", "nodeID", "resource", "datatype", "parseType",
              "aboutEach", "aboutEachPrefix", "bagID")
}
_XML_SYNTAX_ATTRS = {f"{{{_XML_NS}}}base", f"{{{_XML_NS}}}lang",
                     f"{{{_XML_NS}}}space"}


def _xml_qname(tag: str) -> str:
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _rdfxml_triples(text: str):
    """Full-grammar RDF/XML walk (the surface Jena RIOT parses; reference
    dispatch 'xml/rdf/owl' in core:data/RdfSource.scala:52-67):
    rdf:Description + typed nodes; rdf:about / rdf:ID / rdf:nodeID
    subjects; xml:base scoping with relative-IRI resolution; property
    elements with rdf:resource / rdf:nodeID; property ATTRIBUTES on node
    elements and on empty property elements (fresh blank node per spec
    §2.12); rdf:datatype + xml:lang (lexical form kept, tags dropped —
    the ParsedLiterals convention, Tsv.scala:15-120); parseType Resource /
    Literal / Collection; rdf:li -> rdf:_n container items; rdf:type
    attribute; reification quads for rdf:ID on property elements."""
    from urllib.parse import urljoin

    root = ElementTree.fromstring(text)
    counter = [0]

    def new_bnode():
        counter[0] += 1
        return f"_:b{counter[0]}"

    def node_id(el, base):
        about = el.get(f"{{{_RDF_NS}}}about")
        if about is not None:
            return urljoin(base, about) if base else about
        rid = el.get(f"{{{_RDF_NS}}}ID")
        if rid is not None:
            return urljoin(base, f"#{rid}") if base else f"#{rid}"
        nid = el.get(f"{{{_RDF_NS}}}nodeID")
        if nid is not None:
            return f"_:{nid}"
        return new_bnode()

    def attr_triples(el, sid, base):
        """Property attributes on a node (or object) element."""
        for k, v in el.attrib.items():
            if k in _RDFXML_SYNTAX_ATTRS or k in _XML_SYNTAX_ATTRS:
                continue
            if not k.startswith("{"):  # unqualified attr: not a property
                continue
            pred = _xml_qname(k)
            if pred == f"{_RDF_NS}type":
                yield (sid, pred, urljoin(base, v) if base else v)
            else:
                yield (sid, pred, v)

    def serialize_literal(el) -> str:
        """parseType='Literal': inner XML exactly as written."""
        parts = [el.text or ""]
        for child in el:
            parts.append(
                ElementTree.tostring(child, encoding="unicode")
            )
        return "".join(parts)

    def walk_node(el, base):
        base = el.get(f"{{{_XML_NS}}}base", base)
        sid = node_id(el, base)
        tag = _xml_qname(el.tag)
        if tag != f"{_RDF_NS}Description":
            yield (sid, f"{_RDF_NS}type", tag)
        yield from attr_triples(el, sid, base)
        li_no = [0]
        for prop in el:
            yield from walk_prop(sid, prop, base, li_no)

    def walk_prop(sid, prop, base, li_no):
        base = prop.get(f"{{{_XML_NS}}}base", base)
        pred = _xml_qname(prop.tag)
        if pred == f"{_RDF_NS}li":
            li_no[0] += 1
            pred = f"{_RDF_NS}_{li_no[0]}"
        rid = prop.get(f"{{{_RDF_NS}}}ID")
        parse_type = prop.get(f"{{{_RDF_NS}}}parseType")
        res = prop.get(f"{{{_RDF_NS}}}resource")
        nid = prop.get(f"{{{_RDF_NS}}}nodeID")
        children = list(prop)
        prop_attrs = [
            (k, v) for k, v in prop.attrib.items()
            if k not in _RDFXML_SYNTAX_ATTRS
            and k not in _XML_SYNTAX_ATTRS and k.startswith("{")
        ]

        out: list[tuple] = []
        if parse_type == "Resource":
            oid = new_bnode()
            out.append((sid, pred, oid))
            inner_li = [0]
            for child in prop:
                out.extend(walk_prop(oid, child, base, inner_li))
        elif parse_type == "Literal":
            out.append((sid, pred, serialize_literal(prop)))
        elif parse_type == "Collection":
            items = []
            for child in children:
                sub = list(walk_node(child, base))
                items.append(sub[0][0] if sub else node_id(child, base))
                out.extend(sub)
            prev = None
            head = f"{_RDF_NS}nil"
            for item in reversed(items):
                cell = new_bnode()
                out.append((cell, f"{_RDF_NS}first", item))
                out.append(
                    (cell, f"{_RDF_NS}rest",
                     prev if prev else f"{_RDF_NS}nil")
                )
                prev = cell
                head = cell
            out.append((sid, pred, head))
        elif res is not None:
            oid = urljoin(base, res) if base else res
            out.append((sid, pred, oid))
            for k, v in prop_attrs:  # attrs describe the object node
                ap = _xml_qname(k)
                out.append(
                    (oid, ap, urljoin(base, v)
                     if ap == f"{_RDF_NS}type" and base else v)
                )
        elif nid is not None:
            oid = f"_:{nid}"
            out.append((sid, pred, oid))
            for k, v in prop_attrs:
                out.append((oid, _xml_qname(k), v))
        elif children:
            for child in children:
                sub = list(walk_node(child, base))
                # a bare rdf:Description object yields no triples of its
                # own, but the membership triple still exists (Jena does)
                oid = sub[0][0] if sub else node_id(child, base)
                out.append((sid, pred, oid))
                out.extend(sub)
        elif prop_attrs:
            # empty property element with property attributes (§2.12):
            # the object is a fresh blank node described by the attrs
            oid = new_bnode()
            out.append((sid, pred, oid))
            for k, v in prop_attrs:
                ap = _xml_qname(k)
                out.append(
                    (oid, ap, v) if ap != f"{_RDF_NS}type"
                    else (oid, ap, urljoin(base, v) if base else v)
                )
        else:
            # text literal; rdf:datatype kept as lexical form only
            out.append((sid, pred, prop.text or ""))

        yield from out
        if rid is not None:  # reification (§2.17)
            stmt = urljoin(base, f"#{rid}") if base else f"#{rid}"
            # reify the asserted MEMBERSHIP triple (sid, pred, ...) — in
            # the Collection branch out[0] is an rdf:first cell, not it
            s0, p0, o0 = next(
                t for t in out if t[0] == sid and t[1] == pred
            )
            yield (stmt, f"{_RDF_NS}type", f"{_RDF_NS}Statement")
            yield (stmt, f"{_RDF_NS}subject", s0)
            yield (stmt, f"{_RDF_NS}predicate", p0)
            yield (stmt, f"{_RDF_NS}object", o0)

    base0 = root.get(f"{{{_XML_NS}}}base", "")
    if _xml_qname(root.tag) == f"{_RDF_NS}RDF":
        for el in root:
            yield from walk_node(el, base0)
    else:  # document whose root is a single node element
        yield from walk_node(root, base0)


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """RDF/XML -> (s, p, o, okind); grammar surface in
    :func:`_rdfxml_triples`. Whole-file parse per task (RDF/XML is a
    sequential format — same parallelism unit as Jena RIOT)."""

    def parse(rows):
        for r in rows:
            yield from _rdfxml_triples(r["value"])

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
