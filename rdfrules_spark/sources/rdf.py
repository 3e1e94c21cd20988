"""RDF text-format readers/writers: N-Triples, N-Quads, and a Turtle subset.

Reference: format dispatch core:data/RdfSource.scala:52-67; Jena-based
parsing core:data/formats/JenaLang.scala. Apache Jena is a JVM dependency we
do not carry, so the line-oriented formats (NT, NQ) are parsed DISTRIBUTED
with Spark regex machinery (spark.read.text splits the file across tasks —
each N-Triples/N-Quads line is a self-contained statement, so the parse is
embarrassingly parallel and whole-stage-codegen'd; .gz/.bz2 ride Spark's
codec support transparently, matching core:data/Compression.scala).

Turtle is NOT line-oriented (directive state, ';'/',' continuations,
multi-line strings), so the TTL reader parses per-FILE with the full
Turtle 1.1 grammar (sources/turtle.py — directives anywhere, blank-node
property lists, collections, long strings). A directory of TTL files
parses fully parallel; a single giant file is one task, exactly like
Jena RIOT's one-stream-per-file model.

Term encoding matches the TSV reader: URIs bare (no angle brackets),
blank nodes keep the ``_:`` sigil, plain/lang literals keep their lexical
form, numeric literals their lexical value — so `dictionary.term_kind`
types them identically to the reference's Raw/ParsedLiterals modes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdfrules_spark.dictionary import term_kind

# one NT/NQ term: uri | blank | literal(with optional datatype/lang)
_TERM = (
    r"(?:<[^>]*>"
    r"|_:[^\s]+"
    r'|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?'
    r")"
)
_NT_LINE = rf"^\s*({_TERM})\s+({_TERM})\s+({_TERM})\s*\.\s*$"
_NQ_LINE = rf"^\s*({_TERM})\s+({_TERM})\s+({_TERM})(?:\s+({_TERM}))?\s*\.\s*$"


def _nt_unescape_str(s: str) -> str:
    """Single-pass N-Triples string unescape: ECHAR (\\t \\b \\n \\r \\f
    \\" \\' \\\\) + \\uXXXX/\\UXXXXXXXX numeric escapes (the full grammar
    Jena decodes; unknown escapes pass through leniently)."""
    from rdfrules_spark.sources.turtle import _ECHAR, _ESCAPE_RE

    def sub(m):
        e = m.group(1)
        if e[0] == "u" and len(e) == 5:
            return chr(int(e[1:], 16))
        if e[0] == "U" and len(e) == 9:
            return chr(int(e[1:], 16))
        return _ECHAR.get(e, "\\" + e)

    return _ESCAPE_RE.sub(sub, s)


# DataType object (not a DDL string) so the udf builds without a session
@F.pandas_udf(T.StringType())
def _nt_unescape_udf(col):
    return col.map(
        lambda s: _nt_unescape_str(s) if s is not None else None
    )


def _decode_term(col):
    """Strip <> from URIs; unquote literals (keep lexical form; drop
    datatype/lang tags like the reference's ParsedLiterals mode keeps the
    typed VALUE, core:data/formats/Tsv.scala:15-120).

    Escape decoding is two-tier: literals WITHOUT a backslash (the bulk)
    stay entirely JVM-side; only escaped literals route through the
    Arrow-vectorized single-pass decoder (chained regexp_replace cannot
    decode ECHAR correctly — '\\\\n' must stay backslash-n — and cannot
    decode \\uXXXX at all)."""
    uri = F.regexp_replace(col, r"^<|>$", "")
    lit = F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1)
    unescaped = F.when(
        lit.contains("\\"), _nt_unescape_udf(lit)
    ).otherwise(lit)
    return F.when(col.startswith("<"), uri).when(
        col.startswith('"'), unescaped
    ).otherwise(col)


def read_nt(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples -> (s, p, o, okind). Distributed line parse."""
    raw = spark.read.text(path)
    parsed = raw.select(
        *[
            F.regexp_extract("value", _NT_LINE, i).alias(c)
            for i, c in ((1, "s"), (2, "p"), (3, "o"))
        ]
    ).where(F.col("p") != "")
    out = parsed.select(
        _decode_term(F.col("s")).alias("s"),
        _decode_term(F.col("p")).alias("p"),
        _decode_term(F.col("o")).alias("o"),
    )
    return out.withColumn("okind", term_kind(F.col("o")))


def read_nq(spark: SparkSession, path: str) -> DataFrame:
    """N-Quads -> (s, p, o, okind, g); default graph when absent."""
    raw = spark.read.text(path)
    parsed = raw.select(
        *[
            F.regexp_extract("value", _NQ_LINE, i).alias(c)
            for i, c in ((1, "s"), (2, "p"), (3, "o"), (4, "g"))
        ]
    ).where(F.col("p") != "")
    out = parsed.select(
        _decode_term(F.col("s")).alias("s"),
        _decode_term(F.col("p")).alias("p"),
        _decode_term(F.col("o")).alias("o"),
        F.when(F.col("g") == "", F.lit("")).otherwise(
            _decode_term(F.col("g"))
        ).alias("g"),
    )
    return out.withColumn("okind", term_kind(F.col("o")))


def read_ttl(
    spark: SparkSession, path: str, single_partition: bool = False
) -> DataFrame:
    """Full-spec Turtle -> (s, p, o, okind): directives anywhere
    (@prefix/@base + SPARQL PREFIX/BASE), blank-node property lists,
    collections, all string/numeric forms — sources/turtle.py. The
    parallelism unit is the FILE (wholetext), matching Jena RIOT's
    one-stream-per-file model; ``single_partition`` is accepted for
    back-compat and is a no-op (per-file parsing is always
    statement-safe)."""
    del single_partition
    from rdfrules_spark.sources.turtle import parse_turtle

    raw = spark.read.text(path, wholetext=True).select(
        "value", F.input_file_name().alias("file")
    )

    def parse_partition(rows):
        import hashlib

        for r in rows:
            salt = "-" + hashlib.md5(r["file"].encode()).hexdigest()[:8]
            for s, p, o, _g in parse_turtle(r["value"], salt=salt):
                yield (s, p, o)

    out = spark.createDataFrame(
        raw.rdd.mapPartitions(parse_partition),
        "s string, p string, o string",
    )
    return out.withColumn("okind", term_kind(F.col("o")))


def read_rdf(spark: SparkSession, path: str, **kw) -> DataFrame:
    """Extension dispatch (core:data/RdfSource.scala:52-67): nt, nq, ttl,
    json/jsonld, xml/rdf/owl, trig, trix, sql, tsv (+ .gz/.bz2 via Spark
    codecs). Unknown extensions raise — same contract as the reference."""
    from rdfrules_spark.sources import formats
    from rdfrules_spark.sources.tsv import read_tsv

    base = re.sub(r"\.(gz|bz2)$", "", path.lower())
    ext = base.rsplit(".", 1)[-1]
    if ext == "nt":
        return read_nt(spark, path)
    if ext == "nq":
        return read_nq(spark, path)
    if ext == "ttl":
        return read_ttl(spark, path, **kw)
    if ext in ("json", "jsonld"):
        return formats.read_jsonld(spark, path)
    if ext in ("xml", "rdf", "owl"):
        return formats.read_rdfxml(spark, path)
    if ext == "trig":
        return formats.read_trig(spark, path)
    if ext == "trix":
        return formats.read_trix(spark, path)
    if ext == "sql":
        return formats.read_sql_dump(spark, path, **kw)
    if ext == "tsv":
        return read_tsv(spark, path, **kw)
    if ext == "parquet":
        # the engine's native cache format (analog of the reference's
        # binary cache, RdfSource "cache"): columnar (s, p, o[, g])
        df = spark.read.parquet(path)
        cols = ["s", "p", "o"] + (["g"] if "g" in df.columns else [])
        return df.select(*cols)
    raise ValueError(f"unsupported RDF extension: {path}")


def _nt_escape(c):
    """ECHAR-escape a literal for N-Triples/N-Quads output: backslash
    FIRST (later passes only introduce fresh backslashes before safe
    chars), then quote and the control chars whose raw form would break
    the line-oriented format (NT spec: \\n \\r \\t \\b \\f). All
    JVM-side. NB replacement strings are Java Matcher replacements:
    backslashes are doubled there too ('\\\\\\\\' emits one literal)."""
    out = F.regexp_replace(c, r"\\", r"\\\\")
    for pat, rep in (
        ('"', r'\\"'), ("\n", r"\\n"), ("\r", r"\\r"),
        ("\t", r"\\t"), ("\b", r"\\b"), ("\f", r"\\f"),
    ):
        out = F.regexp_replace(out, pat, rep)
    return out


def write_nt(df: DataFrame, path: str) -> None:
    """Graph export as N-Triples (core:data/Graph.scala:52-60). URIs get
    angle brackets; non-uri objects are written as quoted literals."""
    esc = _nt_escape
    okind = df["okind"] if "okind" in df.columns else term_kind(F.col("o"))
    line = F.concat(
        F.lit("<"), "s", F.lit("> <"), "p", F.lit("> "),
        F.when(okind == "uri", F.concat(F.lit("<"), "o", F.lit(">")))
        .otherwise(F.concat(F.lit('"'), esc(F.col("o")), F.lit('"'))),
        F.lit(" ."),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def write_nq(df: DataFrame, path: str) -> None:
    """Dataset export as N-Quads (core:data/Dataset.scala export;
    DatasetSpec.scala:51-65 writes test.nq with its graphs). Same term
    rules as write_nt plus the graph label before the final dot."""
    esc = _nt_escape
    okind = df["okind"] if "okind" in df.columns else term_kind(F.col("o"))
    line = F.concat(
        F.lit("<"), "s", F.lit("> <"), "p", F.lit("> "),
        F.when(okind == "uri", F.concat(F.lit("<"), "o", F.lit(">")))
        .otherwise(F.concat(F.lit('"'), esc(F.col("o")), F.lit('"'))),
        F.lit(" <"), "g", F.lit("> ."),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def write_rdf(df: DataFrame, path: str) -> None:
    """Writer extension dispatch (the export side of read_rdf): nt, nq,
    ttl (prefix compaction), xml/rdf/owl (RDF/XML), json(ld), tsv, parquet
    (native cache). A path ending .nq keeps graphs; the other text forms
    drop them like the reference's Graph export (Graph.scala:52-60)."""
    from rdfrules_spark.sources.tsv import write_tsv

    from rdfrules_spark.sources import rdf_writers

    base = re.sub(r"\.(gz|bz2)$", "", path.lower())
    ext = base.rsplit(".", 1)[-1]
    if ext == "nq":
        write_nq(df, path)
    elif ext == "nt":
        write_nt(df.select("s", "p", "o"), path)
    elif ext == "ttl":
        rdf_writers.write_ttl(df, path)
    elif ext in ("xml", "rdf", "owl"):
        rdf_writers.write_rdfxml(df, path)
    elif ext in ("json", "jsonld"):
        rdf_writers.write_jsonld(df, path)
    elif ext == "trix":
        rdf_writers.write_trix(df, path)
    elif ext == "tsv":
        t = df if "okind" in df.columns else df.withColumn(
            "okind", term_kind(F.col("o"))
        )
        write_tsv(t.select("s", "p", "o", "okind"), path)
    elif ext == "parquet":
        df.write.mode("overwrite").parquet(path)
    else:
        raise ValueError(f"unsupported RDF export extension: {path}")
