"""RDF text-format WRITERS: Turtle (with prefix compaction), RDF/XML,
JSON-LD — the export half of the full-grammar readers in sources/turtle.py
and sources/formats.py.

Reference parity: the reference exports a Graph/Dataset in any Jena format
(core:data/Graph.scala:52-60, core:data/RdfWriter.scala) with prefix
compaction from the attached prefix map. Jena streams one file on one
thread; the Spark-first contract here is stronger: each output PART FILE
is a complete, valid standalone document of the format (the prefix /
header block is repeated per partition, and RDF/XML / JSON-LD close their
root element per partition), so the output directory both parses fully
parallel with this repo's own readers AND any single part file is
independently consumable by a spec parser. Semantically the directory is
the same graph — RDF is a set union over documents.

Scale notes:
  * body text is built entirely JVM-side (concat/when/collect_list inside
    whole-stage codegen); the only Python on the path is the per-partition
    header/footer injection — pure-JVM for Turtle (first-row-in-partition
    detection via monotonically_increasing_id), an Arrow-batched
    passthrough (mapInPandas) for RDF/XML + JSON-LD which need a footer
    after the last row;
  * subject grouping is two partial-aggregated groupBys — no driver
    materialization of data rows;
  * auto-derived prefixes collect the distinct PREDICATE namespaces only
    (the repo-wide small-predicate-vocabulary assumption; loud ValueError
    past ``max_predicates``) — subject/object namespaces compact when the
    caller passes an explicit prefix map, exactly like Jena only compacts
    registered prefixes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.dictionary import term_kind
from rdfrules_spark.sources.prefixes import _ordered

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
# conservative PN_LOCAL / NCName-safe local part (no % or escapes — terms
# that need them fall back to the full-IRI form)
_PN_LOCAL = r"^[A-Za-z0-9_][A-Za-z0-9_.\-]*$"
_NCNAME = r"^[A-Za-z_][A-Za-z0-9_.\-]*$"

_NUM_RE = r"^-?[0-9]+(\.[0-9]+)?$"


def _okind(df: DataFrame) -> Column:
    return df["okind"] if "okind" in df.columns else term_kind(F.col("o"))


def _first_in_partition() -> Column:
    """True on the first row of every partition: monotonically_increasing_id
    is partition_id * 2^33 + row_index, so row 0 is the only row whose id
    is a multiple of 2^33 — a pure-JVM way to prepend a per-file header."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(1 << 33)) == 0


def _wrap_partitions(lines: DataFrame, header: str, footer: str) -> DataFrame:
    """Emit header before and footer after each partition's rows (Arrow
    passthrough — body strings are already built JVM-side)."""
    import pandas as pd

    def gen(batches):
        yield pd.DataFrame({"value": [header]})
        for b in batches:
            yield b
        yield pd.DataFrame({"value": [footer]})

    return lines.mapInPandas(gen, "value string")


def _ttl_iri(c: Column, prefixes: dict[str, str]) -> Column:
    """<full-iri> or compacted pfx:local when a namespace matches and the
    local part is PN_LOCAL-safe (longest namespace wins, like Jena)."""
    out = F.concat(F.lit("<"), c, F.lit(">"))
    for pfx, ns in reversed(_ordered(prefixes)):
        local = F.substring(c, len(ns) + 1, 1 << 20)
        cond = c.startswith(ns) & local.rlike(_PN_LOCAL) & ~local.endswith(".")
        out = F.when(cond, F.concat(F.lit(pfx + ":"), local)).otherwise(out)
    # blank nodes keep the bare `_:label` Turtle form — `<_:label>` would be
    # a relative IRI to a conforming parser, not a bnode
    return F.when(c.startswith("_:"), c).otherwise(out)


def _ttl_obj(o: Column, okind: Column, prefixes: dict[str, str]) -> Column:
    from rdfrules_spark.sources.rdf import _nt_escape

    return (
        F.when(okind == "uri", _ttl_iri(o, prefixes))
        # Turtle short forms for the reference's parsed-literal kinds —
        # round-trips through the cooperative-numeric TSV convention
        .when(okind == "number", o)
        .when(okind == "boolean", o)
        .otherwise(F.concat(F.lit('"'), _nt_escape(o), F.lit('"')))
    )


def auto_prefixes(df: DataFrame, max_predicates: int = 4096) -> dict[str, str]:
    """Derive a prefix map from the distinct predicate namespaces (split at
    the last ``#`` or ``/``), named ns1..nsK in sorted-namespace order.
    Predicates are a vocabulary, not data — the distinct is tiny; a graph
    exceeding ``max_predicates`` distinct predicates raises loudly rather
    than silently collecting unbounded rows to the driver."""
    rows = (
        df.select(F.col("p").alias("p")).distinct().limit(max_predicates + 1)
    ).collect()
    if len(rows) > max_predicates:
        raise ValueError(
            f"auto_prefixes: >{max_predicates} distinct predicates; pass an "
            "explicit prefix map"
        )
    nss = set()
    for r in rows:
        m = re.match(r"^(.*[#/])[^#/]+$", r["p"])
        if m and re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", m.group(1)):
            nss.add(m.group(1))
    return {f"ns{i + 1}": ns for i, ns in enumerate(sorted(nss))}


def write_ttl(
    df: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
) -> None:
    """Turtle export with prefix compaction and subject grouping
    (``<s> p o1, o2 ;\\n    p2 o3 .``). Deterministic output: predicate and
    object lists are array_sort()ed inside each block.

    Reference: Graph.export to Lang.TTL (core:data/Graph.scala:52-60);
    prefix compaction per the attached prefix map (PrefixesOps.scala)."""
    if prefixes is None:
        prefixes = auto_prefixes(df)
    okind = _okind(df)
    base = df.select(
        _ttl_iri(F.col("s"), prefixes).alias("st"),
        _ttl_iri(F.col("p"), prefixes).alias("pt"),
        _ttl_obj(F.col("o"), okind, prefixes).alias("ot"),
    )
    po = base.groupBy("st", "pt").agg(
        F.array_join(F.array_sort(F.collect_list("ot")), ", ").alias("objs")
    )
    blocks = po.groupBy("st").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.concat("pt", F.lit(" "), "objs"))),
            " ;\n    ",
        ).alias("body")
    )
    header = "".join(
        f"@prefix {pfx}: <{ns}> .\n" for pfx, ns in sorted(prefixes.items())
    )
    line = F.concat("st", F.lit(" "), "body", F.lit(" ."))
    out = blocks.select(
        F.when(_first_in_partition(), F.concat(F.lit(header + "\n"), line))
        .otherwise(line)
        .alias("value")
    )
    out.write.mode("overwrite").text(path)


def _xml_escape(c: Column, attr: bool = False) -> Column:
    out = F.regexp_replace(c, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    if attr:
        out = F.regexp_replace(out, '"', "&quot;")
    return out


def _qname_prefixes(df: DataFrame, max_predicates: int = 4096):
    """(prefix map, ns list) where every distinct predicate splits into a
    declared namespace + NCName local — RDF/XML requires QName property
    elements. Loud ValueError for an unsplittable predicate."""
    rows = (
        df.select(F.col("p").alias("p")).distinct().limit(max_predicates + 1)
    ).collect()
    if len(rows) > max_predicates:
        raise ValueError(
            f"write_rdfxml: >{max_predicates} distinct predicates"
        )
    nss = set()
    for r in rows:
        m = re.match(r"^(.*[#/:])([^#/:]+)$", r["p"])
        if not (m and re.match(_NCNAME, m.group(2))):
            raise ValueError(
                f"write_rdfxml: predicate {r['p']!r} has no QName split"
            )
        nss.add(m.group(1))
    return {ns: f"ns{i + 1}" for i, ns in enumerate(sorted(nss))}


def write_rdfxml(df: DataFrame, path: str) -> None:
    """RDF/XML export: one <rdf:Description> per subject, property elements
    as QNames over auto-declared namespaces, rdf:resource for URI objects /
    rdf:nodeID for blank nodes / text content for literals. Each part file
    is a complete <rdf:RDF> document.

    Reference: Graph.export to Lang.RDFXML (core:data/Graph.scala:52-60)."""
    ns_map = _qname_prefixes(df)
    okind = _okind(df)

    # predicate -> "pfx:local" (chain of whens over the small ns map)
    pq = F.lit(None).cast("string")
    for ns, pfx in sorted(ns_map.items(), key=lambda kv: -len(kv[0])):
        local = F.substring(F.col("p"), len(ns) + 1, 1 << 20)
        pq = F.when(
            F.col("p").startswith(ns) & local.rlike(_NCNAME),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(pq)

    s_attr = F.when(
        F.col("s").startswith("_:"),
        F.concat(
            F.lit('rdf:nodeID="'),
            _xml_escape(F.substring(F.col("s"), 3, 1 << 20), attr=True),
            F.lit('"'),
        ),
    ).otherwise(
        F.concat(F.lit('rdf:about="'), _xml_escape(F.col("s"), attr=True),
                 F.lit('"'))
    )
    child = (
        F.when(
            okind == "uri",
            F.when(
                F.col("o").startswith("_:"),
                F.concat(
                    F.lit("    <"), pq, F.lit(' rdf:nodeID="'),
                    _xml_escape(F.substring(F.col("o"), 3, 1 << 20),
                                attr=True),
                    F.lit('"/>'),
                ),
            ).otherwise(
                F.concat(
                    F.lit("    <"), pq, F.lit(' rdf:resource="'),
                    _xml_escape(F.col("o"), attr=True), F.lit('"/>'),
                )
            ),
        )
        .otherwise(
            F.concat(
                F.lit("    <"), pq, F.lit(">"), _xml_escape(F.col("o")),
                F.lit("</"), pq, F.lit(">"),
            )
        )
    )
    blocks = (
        df.select(s_attr.alias("sa"), child.alias("ch"))
        .groupBy("sa")
        .agg(F.array_join(F.array_sort(F.collect_list("ch")), "\n")
             .alias("body"))
        .select(
            F.concat(
                F.lit("  <rdf:Description "), "sa", F.lit(">\n"), "body",
                F.lit("\n  </rdf:Description>"),
            ).alias("value")
        )
    )
    decls = "".join(
        f'\n    xmlns:{pfx}="{ns}"' for ns, pfx in sorted(ns_map.items())
    )
    header = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<rdf:RDF xmlns:rdf="{_RDF_NS}"{decls}>'
    )
    _wrap_partitions(blocks, header, "</rdf:RDF>").write.mode(
        "overwrite"
    ).text(path)


def _json_quoted(c: Column) -> Column:
    """JSON-escaped, quoted string via to_json (JVM-side escaping):
    to_json(struct(c as v)) == '{"v":"..."}' — strip the 5-char '{"v":'
    prefix and the trailing '}'."""
    j = F.to_json(F.struct(c.alias("v")))
    return j.substr(F.lit(6), F.length(j) - 6)


def write_jsonld(df: DataFrame, path: str) -> None:
    """JSON-LD export: a top-level array of node objects, one per subject,
    ``{"@id": s, p: [{"@id": o} | {"@value": v}, ...], ...}``. URI objects
    emit @id references; number/boolean literals emit native JSON scalars;
    text literals emit JSON strings. Each part file is a complete JSON-LD
    document (array form).

    Reference: Graph.export to Lang.JSONLD (core:data/Graph.scala:52-60)."""
    okind = _okind(df)
    # A number is emitted as a NATIVE JSON scalar only when its lexical form
    # survives a JSON parse round-trip exactly: canonical integers (no
    # leading zeros, no '-0' — arbitrary length, JSON ints are exact), and
    # trailing-zero-free decimals with <= 15 digits (distinct <=15-digit
    # decimals map to distinct doubles, so shortest-repr gives back the
    # same lexical form). Everything else ('007', '1.50', '-0') falls back
    # to the quoted @value string form — still read back as a number by the
    # term_kind convention, and valid JSON in every part file.
    o = F.col("o")
    json_int = o.rlike(r"^-?(0|[1-9][0-9]*)$") & (o != "-0")
    json_dec = o.rlike(r"^-?(0|[1-9][0-9]*)\.[0-9]*[1-9]$") & (
        F.length(F.translate(o, "-.", "")) <= 15
    )
    vobj = (
        F.when(okind == "uri",
               F.concat(F.lit('{"@id":'), _json_quoted(F.col("o")),
                        F.lit("}")))
        .when((okind == "number") & (json_int | json_dec),
              F.concat(F.lit('{"@value":'), F.col("o"), F.lit("}")))
        .when(okind == "boolean",
              F.concat(F.lit('{"@value":'), F.col("o"), F.lit("}")))
        .otherwise(F.concat(F.lit('{"@value":'), _json_quoted(F.col("o")),
                            F.lit("}")))
    )
    pairs = (
        df.select(
            F.col("s"), _json_quoted(F.col("p")).alias("pk"),
            vobj.alias("vo"),
        )
        .groupBy("s", "pk")
        .agg(F.array_join(F.array_sort(F.collect_list("vo")), ",")
             .alias("vals"))
        .select(
            "s",
            F.concat("pk", F.lit(":["), "vals", F.lit("]")).alias("pair"),
        )
    )
    nodes = (
        pairs.groupBy("s")
        .agg(F.array_join(F.array_sort(F.collect_list("pair")), ",")
             .alias("body"))
        .select(
            F.concat(
                F.lit('{"@id":'), _json_quoted(F.col("s")), F.lit(","),
                "body", F.lit("}"),
            ).alias("value")
        )
    )
    # comma before every node except the first in its partition, then wrap
    # the partition in the array brackets
    out = nodes.select(
        F.when(_first_in_partition(), F.col("value"))
        .otherwise(F.concat(F.lit(","), "value"))
        .alias("value")
    )
    _wrap_partitions(out, "[", "]").write.mode("overwrite").text(path)


def write_trix(df: DataFrame, path: str) -> None:
    """TriX export (W3C TriX note; reference Graph.export to Lang.TRIX):
    one <graph> per part file wrapping <triple> elements with
    uri / id / plainLiteral terms. Quads (a ``g`` column) write their
    graph name; without one the graph is unnamed (default graph). Each
    part file is a complete TriX document; term text is XML-escaped
    JVM-side."""
    has_g = "g" in df.columns
    okind = _okind(df)

    def term(c: Column, kind: Column | None = None) -> Column:
        uri = F.concat(F.lit("<uri>"), _xml_escape(c), F.lit("</uri>"))
        bnode = F.concat(
            F.lit("<id>"), _xml_escape(F.substring(c, 3, 1 << 20)),
            F.lit("</id>"),
        )
        if kind is None:  # subject/predicate position: uri or bnode
            return F.when(c.startswith("_:"), bnode).otherwise(uri)
        lit = F.concat(
            F.lit("<plainLiteral>"), _xml_escape(c),
            F.lit("</plainLiteral>"),
        )
        return (
            F.when(kind == "uri",
                   F.when(c.startswith("_:"), bnode).otherwise(uri))
            .otherwise(lit)
        )

    line = F.concat(
        F.lit("    <triple>"),
        term(F.col("s")), term(F.col("p")), term(F.col("o"), okind),
        F.lit("</triple>"),
    )
    rows = df.select(line.alias("value"))
    gname = ""
    if has_g:
        gs = [r[0] for r in df.select("g").distinct().limit(2).collect()]
        if len(gs) > 1:
            raise ValueError(
                "write_trix: one graph per call — split by g first"
            )
        if gs and gs[0]:
            from xml.sax.saxutils import escape

            gname = f"\n    <uri>{escape(gs[0])}</uri>"
    header = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">\n'
        f"  <graph>{gname}"
    )
    _wrap_partitions(rows, header, "  </graph>\n</TriX>").write.mode(
        "overwrite"
    ).text(path)
