"""Ruleset export/import: Text, JSON, NDJSON (+ prediction export/load).

Reference: core:ruleset/formats/{Text,Json,NDJson}.scala,
core:ruleset/RulesetWriter.scala, core:ruleset/RulesetReader.scala;
predictions core:prediction/formats/{Json,NDJson}.scala.

Formats over the repo's rule schema
(p, shape, q, d1, r, d2, head_size, support, head_coverage [, measures...]):

  * NDJSON — one JSON object per line, written/read DISTRIBUTED with
    df.write.json / spark.read.json(schema-pinned). The scale path: a
    billion-rule set streams through without touching the driver.
  * JSON — a single JSON array file like the reference's Json format.
    Array syntax is inherently single-writer, so this is a driver-side
    write guarded by ``max_rows`` (the reference also materializes the
    whole ruleset for it).
  * Text — the human-readable form of ruleset/formats/Text.scala:20-66:
    ``(?a <q> ?b) -> (?a <p> ?b) | support: 5, headCoverage: 0.2``.

Round-trip guarantee: import(export(rules)) equals the original rows —
pinned by tests/test_io_formats.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical serialized schema (measures nullable — absent ones stay null)
RULE_SCHEMA = T.StructType([
    T.StructField("p", T.StringType()),
    T.StructField("shape", T.StringType()),
    T.StructField("q", T.StringType()),
    T.StructField("d1", T.StringType()),
    T.StructField("r", T.StringType()),
    T.StructField("d2", T.StringType()),
    T.StructField("head_size", T.LongType()),
    T.StructField("support", T.LongType()),
    T.StructField("head_coverage", T.DoubleType()),
    T.StructField("body_size", T.LongType()),
    T.StructField("cwa_confidence", T.DoubleType()),
    T.StructField("pca_body_size", T.LongType()),
    T.StructField("pca_confidence", T.DoubleType()),
    T.StructField("qpca_body_size", T.LongType()),
    T.StructField("qpca_confidence", T.DoubleType()),
    T.StructField("lift", T.DoubleType()),
])

_COLS = [f.name for f in RULE_SCHEMA.fields]


def _conform(rules: DataFrame) -> DataFrame:
    cols = []
    for f in RULE_SCHEMA.fields:
        if f.name in rules.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return rules.select(*cols)


def export_ndjson(rules: DataFrame, path: str) -> None:
    _conform(rules).write.mode("overwrite").json(path)


def import_ndjson(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RULE_SCHEMA).json(path)


#: resolved-rule serialized schema (ruleset/formats/NDJson.scala writes
#: RESOLVED rules — head + body atoms — one object per line; this is the
#: same content over the engine's canonical atom strings, kept distributed)
RESOLVED_RULE_SCHEMA = T.StructType([
    T.StructField("head", T.StringType()),
    T.StructField("atoms", T.ArrayType(T.StringType())),
    T.StructField("head_size", T.LongType()),
    T.StructField("support", T.LongType()),
    T.StructField("head_coverage", T.DoubleType()),
    T.StructField("body_size", T.LongType()),
    T.StructField("cwa_confidence", T.DoubleType()),
    T.StructField("pca_body_size", T.LongType()),
    T.StructField("pca_confidence", T.DoubleType()),
    T.StructField("qpca_body_size", T.LongType()),
    T.StructField("qpca_confidence", T.DoubleType()),
    T.StructField("lift", T.DoubleType()),
])


def _conform_resolved(rules: DataFrame) -> DataFrame:
    cols = []
    for f in RESOLVED_RULE_SCHEMA.fields:
        if f.name in rules.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return rules.select(*cols)


def export_resolved_ndjson(rules: DataFrame, path: str) -> None:
    """Distributed NDJSON over the canonical (head, atoms) resolved schema
    (the HTTP pipeline's ExportRules 'ndjson'; a billion-rule set streams
    through without touching the driver)."""
    _conform_resolved(rules).write.mode("overwrite").json(path)


def import_resolved_ndjson(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RESOLVED_RULE_SCHEMA).json(path)


def export_json(rules: DataFrame, path: str, max_rows: int = 1_000_000) -> None:
    """Single JSON array file (driver-side; the array format is not
    splittable). Raises above max_rows — use NDJSON at scale."""
    rows = _conform(rules).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"ruleset exceeds max_rows={max_rows}; use export_ndjson"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump([r.asDict() for r in rows], f)


def import_json(spark: SparkSession, path: str) -> DataFrame:
    with open(path) as f:
        rows = json.load(f)
    if not rows:
        return spark.createDataFrame([], RULE_SCHEMA)
    return spark.createDataFrame(rows, RULE_SCHEMA)


def rule_text_column() -> F.Column:
    """Human-readable rule string (Text.scala:20-66 style) for the staged
    L<=3 schema: body atoms from (q,d1) and optional (r,d2), head from p."""
    def atom(pred, d, a, b):
        return F.concat(
            F.lit("("), F.when(F.col(d) == "f", F.lit(a)).otherwise(F.lit(b)),
            F.lit(" <"), F.col(pred), F.lit("> "),
            F.when(F.col(d) == "f", F.lit(b)).otherwise(F.lit(a)),
            F.lit(")"),
        )

    head = F.concat(F.lit("(?a <"), F.col("p"), F.lit("> ?b)"))
    a1_l3v3 = atom("q", "d1", "?a", "?c")
    a2_l3v3 = atom("r", "d2", "?b", "?c")
    a1_ab = atom("q", "d1", "?a", "?b")
    a2_ab = atom("r", "d2", "?a", "?b")
    body = (
        F.when(F.col("shape") == "l2", a1_ab)
        .when(F.col("shape") == "l3v2", F.concat(a1_ab, F.lit(" ^ "), a2_ab))
        .otherwise(F.concat(a1_l3v3, F.lit(" ^ "), a2_l3v3))
    )
    meas = F.concat(
        F.lit(" | support: "), F.col("support").cast("string"),
        F.lit(", headCoverage: "), F.col("head_coverage").cast("string"),
    )
    return F.concat(body, F.lit(" -> "), head, meas)


def export_text(rules: DataFrame, path: str) -> None:
    rules.select(rule_text_column().alias("value")).write.mode(
        "overwrite"
    ).text(path)


def export_text_resolved(rules: DataFrame, path: str) -> None:
    """Human Text format over the canonical (head, atoms) resolved schema
    (Text.scala:20-66) — handles instantiated atoms (C=...) and any rule
    length; round-trips through :func:`import_text`. All JVM-side
    (higher-order transform + concat), streams distributed."""
    def term(t):
        return F.when(
            t.startswith("C="), F.substring(t, 3, 1 << 20)
        ).otherwise(t)

    def atom_text(a):
        parts = F.split(a, r"\|")
        return F.concat(
            F.lit("("), term(parts[0]), F.lit(" <"), parts[1], F.lit("> "),
            term(parts[2]), F.lit(")"),
        )

    body = F.array_join(
        F.transform(F.col("atoms"), atom_text), " ^ "
    )
    meas = []
    seen = set()
    for name, col in _TEXT_MEASURES.items():
        if col in seen or col not in rules.columns:
            continue
        seen.add(col)
        meas.append(
            F.when(
                F.col(col).isNotNull(),
                F.concat(F.lit(f"{name}: "), F.col(col).cast("string")),
            )
        )
    tail = (
        F.concat(
            F.lit(" | "),
            F.array_join(F.array_compact(F.array(*meas)), ", "),
        )
        if meas
        else F.lit("")
    )
    line = F.concat(
        body, F.lit(" -> "), atom_text(F.col("head")), tail
    )
    rules.select(line.alias("value")).write.mode("overwrite").text(path)


#: measure text names (Measure.scala toString) -> rule-schema columns
_TEXT_MEASURES = {
    "support": "support",
    "headSize": "head_size",
    "headCoverage": "head_coverage",
    "bodySize": "body_size",
    "confidence": "cwa_confidence",
    "cwaConfidence": "cwa_confidence",
    "pcaBodySize": "pca_body_size",
    "pcaConfidence": "pca_confidence",
    "qpcaBodySize": "qpca_body_size",
    "qpcaConfidence": "qpca_confidence",
    "lift": "lift",
}

_TEXT_ATOM_RE = r"\(([^()<>\s]+) <([^<>]+)> ([^()<>\s]+)\)"


def import_text(spark: SparkSession, path: str) -> DataFrame:
    """Read the human Text ruleset format (ruleset/formats/Text.scala:20-66 /
    RulesetSource.Text) back to the canonical (head, atoms) schema.

    ``(?a <q> ?b) ^ ... -> (?a <p> ?b) | support: 5, headCoverage: 0.2``

    A ``?``-prefixed term is a variable, anything else a constant (C=).
    Whole parse is JVM-side (text read + regexp + higher-order transform),
    so a billion-rule file streams through distributed."""
    raw = spark.read.text(path)
    halves = F.split(F.col("value"), r" -> ", 2)
    body_txt = F.get(halves, 0)
    tail = F.split(F.get(halves, 1), r" \| ", 2)

    def term(t):
        return F.when(t.startswith("?"), t).otherwise(F.concat(F.lit("C="), t))

    def atoms_of(segment):
        return F.transform(
            F.regexp_extract_all(segment, F.lit(_TEXT_ATOM_RE), 0),
            lambda a: F.concat_ws(
                "|",
                term(F.regexp_extract(a, _TEXT_ATOM_RE, 1)),
                F.regexp_extract(a, _TEXT_ATOM_RE, 2),
                term(F.regexp_extract(a, _TEXT_ATOM_RE, 3)),
            ),
        )

    # "k: v, k: v" -> map via str_to_map (JVM built-in)
    # str_to_map's delimiters are Column parameters — bare strings would be
    # resolved as column NAMES
    meas = F.str_to_map(
        F.coalesce(F.get(tail, 1), F.lit("")), F.lit(", "), F.lit(": ")
    )
    cols = [
        F.get(atoms_of(F.get(tail, 0)), 0).alias("head"),
        atoms_of(body_txt).alias("atoms"),
    ]
    seen = set()
    for name, col in _TEXT_MEASURES.items():
        if col in seen:
            continue
        seen.add(col)
        # coalesce alternate spellings of the same column
        spellings = [k for k, v in _TEXT_MEASURES.items() if v == col]
        cols.append(
            F.coalesce(*[meas.getItem(s).cast("double") for s in spellings])
            .alias(col)
        )
    out = raw.where(F.col("value").rlike(" -> ")).select(*cols)
    for c in ("support", "head_size", "body_size", "pca_body_size",
              "qpca_body_size"):
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


# -- reference-format JSON (ruleset/formats/Json.scala) ----------------------
#
# The reference's Ruleset.export("*.json") writes a JSON ARRAY of resolved
# rules, each pretty-printed with spray-json's PrettyPrinter: objects are
# multi-line (2-space indent, one member per line), arrays are single-line
# (elements joined by ", "), leaves inline. File framing (Json.scala:20-31):
# a '[' line, each rule printed via println(sep + pretty) with sep "," from
# the second rule on, then a ']' line. RulesetSpec.scala:117-134 pins the
# resulting LINE COUNT of the lcs ruleset export to 35,226 (and 37,613 for
# the graph-aware variant) — reproduced bit-for-line by this writer
# (tests/test_ruleset_confidences.py).
#
# Rule JSON schema (rule/ResolvedRule.scala:80-86, ResolvedAtom.scala:96-172,
# rule/Measure.scala:181-196):
#   {"head": <atom>, "body": [<atom>...], "measures": [<measure>...]}
#   atom    = {"subject": <item>, "predicate": <uri-leaf>, "object": <item>
#              [, "graphs": [<uri-leaf>...]]}
#   item    = {"type": "variable"|"constant", "value": <leaf>}
#   measure = {"name": "Support"|..., "value": <number>}
# Constant values are emitted as raw term strings (the reference's
# TripleItem.toJson renders numbers as JsNumber; we keep the lexical form so
# import(export(x)) == x bit-for-bit — a leaf either way, so the pinned line
# counts are unaffected).

#: measures attached by mining, in reference insertion order
#: (HeadCoverage, HeadSize, Support on every freshly mined rule)
_MINED_MEASURES = (
    ("HeadCoverage", "head_coverage"),
    ("HeadSize", "head_size"),
    ("Support", "support"),
)


def _pretty(v, indent: int = 0) -> str:
    """spray-json PrettyPrinter: multi-line objects, single-line arrays."""
    if isinstance(v, dict):
        inner = ",\n".join(
            " " * (indent + 2) + json.dumps(k) + ": " + _pretty(x, indent + 2)
            for k, x in v.items()
        )
        return "{\n" + inner + "\n" + " " * indent + "}"
    if isinstance(v, list):
        return "[" + ", ".join(_pretty(x, indent) for x in v) + "]"
    return json.dumps(v)


def _atom_obj(atom: str, graphs: list[str] | None):
    s, p, o = atom.split("|", 2)

    def item(t):
        if t.startswith("C="):
            return {"type": "constant", "value": t[2:]}
        return {"type": "variable", "value": t}

    out = {"subject": item(s), "predicate": p, "object": item(o)}
    if graphs is not None:
        out["graphs"] = list(graphs)
    return out


def _atom_str(obj: dict) -> str:
    def term(it):
        if it["type"] == "constant":
            return "C=" + str(it["value"])
        return it["value"]

    return f'{term(obj["subject"])}|{obj["predicate"]}|{term(obj["object"])}'


def export_reference_json(
    rules: DataFrame,
    path: str,
    graphs: list[str] | None = None,
    max_rows: int = 1_000_000,
) -> None:
    """Write the reference's pretty-printed JSON-array ruleset format over
    the resolved-rule schema (head, atoms, support, head_size,
    head_coverage). ``graphs`` switches to the graph-aware atom schema
    (Ruleset.graphAwareRules.export — every atom gains a "graphs" array).
    Driver-side by necessity (one JSON array is single-writer; the
    reference materializes the ruleset the same way) — use export_ndjson
    at billion-rule scale."""
    rows = (
        rules.select("head", "atoms", "support", "head_size",
                     "head_coverage")
        .orderBy("head", "atoms")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"ruleset exceeds max_rows={max_rows}; use export_ndjson"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("[\n")
        sep = ""
        for r in rows:
            obj = {
                "head": _atom_obj(r["head"], graphs),
                "body": [_atom_obj(a, graphs) for a in r["atoms"]],
                "measures": [
                    {"name": n, "value": r[c]} for n, c in _MINED_MEASURES
                ],
            }
            f.write(sep + _pretty(obj) + "\n")
            sep = ","
        f.write("]\n")


def import_reference_json(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference JSON-array ruleset format back to the resolved
    schema (the file is one valid JSON document — Json.scala:34-43 parses
    it the same way)."""
    with open(path) as f:
        objs = json.load(f)
    return rules_from_objs(spark, objs)


def rules_from_objs(spark: SparkSession, objs: list) -> DataFrame:
    """Resolved-rule JSON objects ({head, body, measures}) -> canonical
    (head, atoms) rows. Also serves inline rulesets (LoadRuleset's
    ``rules`` parameter, http:task/ruleset/LoadRuleset.scala)."""
    schema = T.StructType([
        T.StructField("head", T.StringType()),
        T.StructField("atoms", T.ArrayType(T.StringType())),
        T.StructField("support", T.LongType()),
        T.StructField("head_size", T.LongType()),
        T.StructField("head_coverage", T.DoubleType()),
    ])
    rows = []
    for o in objs:
        meas = {m["name"]: m["value"] for m in o.get("measures", [])}
        rows.append((
            _atom_str(o["head"]),
            [_atom_str(a) for a in o["body"]],
            int(meas.get("Support", 0)),
            int(meas.get("HeadSize", 0)),
            float(meas.get("HeadCoverage", 0.0)),
        ))
    return spark.createDataFrame(rows, schema)


# -- AnyBURL ruleset format --------------------------------------------------
#
# The reference's KGC experiments import AnyBURL-mined rules
# (experiments_kgc:AnyBurlRulesetFormat.scala:10-33): each line of the
# public AnyBURL rule file is
#
#     predicted \t correctlyPredicted \t confidence \t rule
#
# with ``rule = head(L,R) <= b1(L,R), b2(L,R), ...``; an argument is a
# VARIABLE iff it is a single uppercase letter (AnyBURL's variable
# alphabet), else a constant. The adapter maps variable ``X`` to the
# resolved variable ``x`` (atom.getLeft.head.toLower) and the three
# numbers to BodySize / Support / CwaConfidence respectively
# (AnyBurlRulesetFormat.scala:25). Here the whole parse is JVM-side
# (csv read + regexp + higher-order transform) so a billion-rule AnyBURL
# file streams through distributed — no driver materialization.

_ANYBURL_ATOM_RE = r"([^\s,()]+)\(([^,()]+),([^,()]+)\)"


def _anyburl_term(t):
    """AnyBURL argument -> resolved term: single uppercase letter is a
    variable (lowercased, '?'-prefixed); anything else a constant."""
    return F.when(
        t.rlike("^[A-Z]$"), F.concat(F.lit("?"), F.lower(t))
    ).otherwise(F.concat(F.lit("C="), t))


def import_anyburl(spark: SparkSession, path: str) -> DataFrame:
    """Read an AnyBURL rule file to the resolved-rule schema
    (head, atoms, support, body_size, cwa_confidence)."""
    raw = (
        spark.read.option("sep", "\t")
        .schema(
            "predicted LONG, correct LONG, confidence DOUBLE, rule STRING"
        )
        .csv(path)
    )
    parts = F.split(F.col("rule"), r" <= ", 2)

    def atoms_of(segment):
        return F.transform(
            F.regexp_extract_all(segment, F.lit(_ANYBURL_ATOM_RE), 0),
            lambda a: F.concat_ws(
                "|",
                _anyburl_term(F.regexp_extract(a, _ANYBURL_ATOM_RE, 2)),
                F.regexp_extract(a, _ANYBURL_ATOM_RE, 1),
                _anyburl_term(F.regexp_extract(a, _ANYBURL_ATOM_RE, 3)),
            ),
        )

    return raw.select(
        F.get(atoms_of(F.get(parts, 0)), 0).alias("head"),
        atoms_of(F.get(parts, 1)).alias("atoms"),
        F.col("correct").alias("support"),
        F.col("predicted").alias("body_size"),
        F.col("confidence").alias("cwa_confidence"),
    ).where(F.col("head").isNotNull())


def export_anyburl(rules: DataFrame, path: str) -> None:
    """Write resolved rules (head, atoms [, support, body_size,
    cwa_confidence]) as AnyBURL rule lines — the inverse of
    import_anyburl, distributed via df.write.text."""
    def term(t):
        return F.when(
            t.startswith("C="), F.substring(t, 3, 2_000_000)
        ).otherwise(F.upper(F.substring(t, 2, 2_000_000)))

    def atom_text(a):
        p = F.split(a, r"\|", 3)
        return F.concat(
            F.get(p, 1), F.lit("("), term(F.get(p, 0)), F.lit(","),
            term(F.get(p, 2)), F.lit(")"),
        )

    cols = dict(
        (c, F.col(c)) if c in rules.columns
        else (c, F.lit(0) if c != "cwa_confidence" else F.lit(0.0))
        for c in ("support", "body_size", "cwa_confidence")
    )
    line = F.concat_ws(
        "\t",
        cols["body_size"].cast("string"),
        cols["support"].cast("string"),
        cols["cwa_confidence"].cast("string"),
        F.concat(
            atom_text(F.col("head")),
            F.lit(" <= "),
            F.concat_ws(
                ", ", F.transform(F.col("atoms"), atom_text)
            ),
        ),
    )
    rules.select(line.alias("value")).write.mode("overwrite").text(path)


# -- predictions (core:prediction/formats/) ---------------------------------

PREDICTION_SCHEMA = T.StructType([
    T.StructField("s", T.StringType()),
    T.StructField("p", T.StringType()),
    T.StructField("o", T.StringType()),
    T.StructField("result", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def export_predictions_ndjson(
    preds: DataFrame, path: str, score_col: str = "score"
) -> None:
    cols = []
    for f in PREDICTION_SCHEMA.fields:
        src = score_col if f.name == "score" else f.name
        if src in preds.columns:
            cols.append(F.col(src).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    preds.select(*cols).write.mode("overwrite").json(path)


def import_predictions_ndjson(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PREDICTION_SCHEMA).json(path)
