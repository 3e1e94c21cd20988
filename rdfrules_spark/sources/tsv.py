"""TSV triple reader/writer (reference core:data/formats/Tsv.scala:15-120;
format dispatch core:data/RdfSource.scala:52-67).

Line format: ``<subject>\\t<predicate>\\t<object>.`` — URIs in angle
brackets, literals bare (numbers, quoted strings, booleans). Parsing modes
mirror the reference: Raw (keep lexical forms) and ParsedLiterals (strip
angle brackets, type literals). Reading is a plain distributed CSV scan —
Spark splits the file across tasks; no driver-side parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfrules_spark.dictionary import term_kind


def read_tsv(
    spark: SparkSession, path: str, parse_uris: bool = True,
    parse_literals: bool = False,
) -> DataFrame:
    """-> triples_str(s, p, o, okind).

    ``parse_literals=True`` is the reference's ParsedLiterals mode
    (Tsv.scala parseLiteral + parseTriple line law: the LINE is trimmed
    before splitting — a leading tab like yagoFacts.tsv's id column
    vanishes — fields are trimmed, and only exactly-3-field lines parse;
    quoted literals lose their quotes, ``"lex"^^dt`` keeps the inner
    lexical form). Distributed text scan either way — no driver parsing."""
    strip = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"\.\s*$", ""), r"^<|>$", ""
    )
    if parse_literals:
        # Scala String.trim strips ALL chars <= 0x20 (incl. tabs) — Spark's
        # trim() only strips spaces, so use a regex whitespace strip
        wtrim = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")  # noqa: E731
        parts = F.split(wtrim(F.col("value")), "\t")
        raw = (
            spark.read.text(path)
            .select(F.transform(parts, wtrim).alias("a"))
            .where(F.size("a") == 3)
            .select(
                F.col("a")[0].alias("s"),
                F.col("a")[1].alias("p"),
                F.regexp_replace(F.col("a")[2], r"\.\s*$", "").alias("o"),
            )
        )
        o = F.col("o")

        def canon_number(c):
            """stringToNumber + BasicFunctions.parseNumber: candidate
            strings (digit/'-' head) parse Int-else-Double (decimal point
            forces Double) and print via toString — '413800000000'
            overflows Int and becomes '4.138E11', '01' becomes '1'. The
            double->string cast is Java Double.toString in Spark too."""
            int_form = c.rlike(r"^-?\d+$")
            as_long = c.cast("long")
            fits_int = (
                int_form
                & as_long.isNotNull()
                & (as_long >= -2147483648)
                & (as_long <= 2147483647)
            )
            dbl_form = c.rlike(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
            as_dbl = c.cast("double")
            # Scala's cooperative numeric equality makes TripleItem.Number(1)
            # == Number(1.0) (BoxesRunTime.equals + Statics.anyHash agree),
            # so the reference's TripleItemHashIndex merges the int and the
            # integral-double lexical forms into ONE dictionary item. Our
            # string-identity engine implements the same value law by
            # collapsing integral doubles in int range to the int form.
            dbl_integral = (
                (as_dbl == F.floor(as_dbl).cast("double"))
                & (as_dbl >= -2147483648.0)
                & (as_dbl <= 2147483647.0)
            )
            return (
                F.when(fits_int, as_long.cast("string"))
                .when(
                    dbl_form & as_dbl.isNotNull() & dbl_integral,
                    as_dbl.cast("long").cast("string"),
                )
                .when(dbl_form & as_dbl.isNotNull(), as_dbl.cast("string"))
                .otherwise(c)
            )

        # `"lex"^^datatype` -> lex, number-canonicalized (greedy group =
        # lastIndexOf('"^^')); `"text"` -> text (stripMargins incl. trim);
        # bare number-candidates canonicalized; else verbatim
        typed = F.regexp_extract(o, r'^"(.*)"\^\^.*$', 1)
        quoted = F.trim(F.regexp_extract(o, r'^"(.*)"$', 1))
        obj = (
            F.when(o.rlike(r'^".*"\^\^'), canon_number(typed))
            .when(o.rlike(r'^".*"$'), quoted)
            .when(o.rlike(r"^[-0-9]"), canon_number(strip(o)))
            .otherwise(strip(o))
        )
        df = raw.select(
            strip(F.col("s")).alias("s"),
            strip(F.col("p")).alias("p"),
            obj.alias("o"),
        )
        return df.withColumn("okind", term_kind(F.col("o")))
    raw = (
        spark.read.option("sep", "\t")
        .csv(path, schema="s string, p string, o string")
    )
    if parse_uris:
        df = raw.select(
            strip(F.col("s")).alias("s"),
            strip(F.col("p")).alias("p"),
            strip(F.col("o")).alias("o"),
        )
    else:
        df = raw.select("s", "p", F.regexp_replace("o", r"\.\s*$", "").alias("o"))
    return df.withColumn("okind", term_kind(F.col("o")))


def write_tsv(df: DataFrame, path: str) -> None:
    """Graph export (reference core:data/Graph.scala:52-60, RdfWriter)."""
    out = df.select(
        F.concat(F.lit("<"), "s", F.lit(">")).alias("s"),
        F.concat(F.lit("<"), "p", F.lit(">")).alias("p"),
        F.when(
            F.col("okind") == "uri", F.concat(F.lit("<"), "o", F.lit(">."))
        ).otherwise(F.concat(F.col("o"), F.lit("."))).alias("o"),
    )
    out.write.mode("overwrite").option("sep", "\t").csv(path)
