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
