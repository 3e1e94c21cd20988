"""Text analysis for training-data pipelines (driver-mandated first-class
components): language-ID, quality scoring, token counting, fingerprinting.

All JVM-side built-ins (regexp / aggregate expressions) — no Python in the
hot path; at 100 TB these run inside whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdfrules_spark.functions.hashing import h60

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
FP_P = 1_000_000_007
FP_B = 31


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace/punct token count (BPE-ish proxy: alnum runs)."""
    return F.size(tokens(text))


def lang_id(text: Column | str) -> Column:
    """Stopword-ratio heuristic language ID: argmax over per-language
    stopword hit counts; 'und' (undetermined) when nothing hits."""
    toks = tokens(text)

    # NB: a default-arg lambda (lambda t, sw=sw: ...) would be seen by
    # F.filter as a 2-arg (element, index) function — closure factory instead
    def contains(sw):
        return lambda t: t.isin(sw)

    scores = [
        (lang, F.size(F.filter(toks, contains(sw))))
        for lang, sw in LANG_STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str) -> Column:
    """Length/punctuation/stopword-ratio quality score in [0,1]
    (composition mirrors C4/Gopher-style heuristics)."""
    text = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(text)
    toks = tokens(text)
    n_toks = F.size(toks)
    mean_tok_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    punct_ratio = (
        F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / F.greatest(n_chars, F.lit(1))
    )
    all_sw = [w for sw in LANG_STOPWORDS.values() for w in sw]
    sw_ratio = F.size(F.filter(toks, lambda t: t.isin(all_sw))) / F.greatest(
        n_toks, F.lit(1)
    )
    len_score = F.least(n_toks / F.lit(50.0), F.lit(1.0))
    tok_len_score = F.when(
        (mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0
    ).otherwise(0.5)
    punct_score = F.when(punct_ratio <= 0.1, 1.0).otherwise(0.5)
    return F.round(
        0.4 * len_score + 0.2 * tok_len_score + 0.2 * punct_score + 0.2 * sw_ratio, 6
    )


def fingerprint(text: Column | str) -> Column:
    """Rolling polynomial hash of the token stream, mod 1e9+7 — order-
    sensitive document fingerprint (same value in the DuckDB oracle via
    list_reduce)."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FP_B + h60(t) % FP_P) % FP_P,
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        lang_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fp"),
    )
