"""Stage 1: vectorized mention detection / statement extraction.

documents(doc_id, spans) -> statements(doc_id, stmt_no, s_surf, p, o_surf)

Implemented as an Arrow-batched pandas UDF over the spans column (no per-row
Python in the driver contract sense — one Python invocation per Arrow batch,
pandas string ops inside). The per-row span-sequence invariant is checked by
:func:`span_sequence_invariant`: extraction never mutates the spans column, so
(kind, text, media_ref, order) must round-trip exactly.

Reference semantics: each sentence of a text span is one statement, cf. the
reference's one-triple-per-line TSV ingestion (core:data/formats/Tsv.scala)
with owl:sameAs special-casing deferred to canonicalization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdfrules_spark.reference_extractor import STMT_RE

STATEMENTS_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("s_surf", T.StringType()),
            T.StructField("p", T.StringType()),
            T.StructField("o_surf", T.StringType()),
        ]
    )
)


@F.pandas_udf(STATEMENTS_T)
def _extract_from_text(joined: pd.Series) -> pd.Series:
    # One vectorized findall over the pre-joined text (pandas .str — the
    # C row loop, no Python lambda on the hot side), then the tuple->struct
    # reshape the Arrow return type needs.
    return joined.str.findall(STMT_RE).map(
        lambda ms: [
            {"s_surf": a, "p": b, "o_surf": c} for (a, b, c) in ms
        ]
    )


def extract_statements(documents: DataFrame) -> DataFrame:
    """Explode per-doc statement arrays into one row per statement.

    The span filter/join runs JVM-side (filter/transform/array_join inside
    whole-stage codegen) so only ONE string column crosses the Arrow
    boundary — shipping the full nested spans column cost more in
    Arrow-to-pandas conversion of per-span Python dicts than the regex
    itself (measured ~2x the stage time at 960k docs). The separator
    cannot span a statement boundary, so per-doc results are identical to
    a per-span parse."""
    joined = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
        "\n",
    )
    stmts = documents.select(
        "doc_id",
        F.posexplode(_extract_from_text(joined)).alias("stmt_no", "st"),
    )
    return stmts.select(
        "doc_id",
        "stmt_no",
        F.col("st.s_surf").alias("s_surf"),
        F.col("st.p").alias("p"),
        F.col("st.o_surf").alias("o_surf"),
    )


def extract_window3(documents: DataFrame, stride: int = 3) -> DataFrame:
    """Extraction rule for *derived* corpora (plain-text docs reshaped by
    corpus.derive_documents): within each text span, token windows of 3 with
    the given stride emit (tok[i], tok[i+1], tok[i+2]) as
    (s_surf, p, o_surf). Deterministic, SQL-expressible (DuckDB oracle), and
    entirely JVM-side — no UDF, stays in whole-stage codegen.

    The middle token ``dup`` is the sameAs cue of this grammar (analog of the
    synthetic corpus's ``aka``).
    """
    # the token array is bound as a lambda variable so the split runs once
    # per span — F.get(toks, ...) inside the element lambda would otherwise
    # re-split the whole span text per window position (no CSE through
    # lambda bodies; same pitfall as operators/dedup.shingles)
    def wins_of(toks):
        n_win = F.floor(F.size(toks) / stride).cast("int")
        return F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_win - 1, F.lit(-1))),
                lambda i: F.struct(
                    F.get(toks, i * stride).alias("s_surf"),
                    F.get(toks, i * stride + 1).alias("p"),
                    F.get(toks, i * stride + 2).alias("o_surf"),
                ),
            ),
            lambda w: w["o_surf"].isNotNull(),
        )

    wins = F.get(
        F.transform(
            F.array(F.split(F.col("span.text"), " ")), wins_of
        ),
        0,
    )
    return (
        documents.select(
            "doc_id", F.posexplode("spans").alias("span_no", "span")
        )
        .where(F.col("span.kind") == "text")
        .select("doc_id", "span_no", F.posexplode(wins).alias("win_no", "w"))
        .select(
            "doc_id",
            (F.col("span_no") * 1000 + F.col("win_no")).alias("stmt_no"),
            F.col("w.s_surf").alias("s_surf"),
            F.col("w.p").alias("p"),
            F.col("w.o_surf").alias("o_surf"),
        )
    )


def span_sequence_invariant(source: DataFrame, processed: DataFrame) -> int:
    """#rows violating span-sequence equality (kind, text, media_ref, order).

    ``processed`` is any stage output that still carries (doc_id, spans).
    Returns 0 when every doc's span sequence survived untouched.
    """
    key = lambda df, n: df.select(  # noqa: E731
        "doc_id",
        F.transform(
            "spans", lambda s: F.struct(s["kind"], s["text"], s["media_ref"])
        ).alias(n),
    )
    joined = key(source, "src").join(key(processed, "out"), "doc_id", "full")
    return joined.where(
        F.col("src").isNull()
        | F.col("out").isNull()
        | (F.col("src") != F.col("out"))
    ).count()
