"""Text analysis for large-scale training-data pipelines.

All operators are pure Catalyst expressions (JVM-side, whole-stage
codegen'd, no Python in the hot path) over a string column — the shapes a
100 TB text-cleaning pipeline needs:

* token counting (whitespace + a BPE-ish subword estimate),
* quality scoring (length/punctuation/digit/stopword ratios),
* language identification (stopword-hit heuristic over en/pt/es),
* document fingerprinting (normalized-content hash; rolling-hash simhash is
  in :mod:`crawler_seo_spark.operators.dedup`).

Every function is written with an eye to DuckDB-replicable semantics
(replace-based substring counting, regexp classes common to both engines)
so the driver's SQL oracle can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny public stopword lists (top function words) for the language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "that"],
    "pt": ["de", "que", "não", "uma", "para", "com", "os"],
    "es": ["el", "la", "los", "las", "una", "por", "para"],
}


def _count_occurrences(padded: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via length-difference — identical semantics
    in Spark and DuckDB (no regex dialect risk)."""
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(needle))))
            / len(needle)).cast("int")


def marker_hits(text: Column, lang: str) -> Column:
    """Total stopword occurrences for one language (word-boundary via
    space padding of a lowercased, punctuation-stripped text)."""
    padded = F.concat(F.lit(" "),
                      F.regexp_replace(F.lower(text), r"[^\p{L}\p{N} ]", " "),
                      F.lit(" "))
    out = F.lit(0)
    for wordform in LANG_MARKERS[lang]:
        out = out + _count_occurrences(padded, f" {wordform} ")
    return out


def language_id_col(text: Column) -> Column:
    """Argmax language over the marker counts; ``und`` when no hits.

    Tie-break: fixed language order (en > pt > es), deterministic.
    """
    en, pt, es = (marker_hits(text, l) for l in ("en", "pt", "es"))
    return (
        F.when((en >= pt) & (en >= es) & (en > 0), "en")
        .when((pt >= es) & (pt > 0), "pt")
        .when(es > 0, "es")
        .otherwise("und")
    )


def token_count_col(text: Column) -> Column:
    """Whitespace token count (0 for blank)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))).cast("int")


def subword_estimate_col(text: Column, chars_per_token: float = 3.6) -> Column:
    """BPE-ish token estimate: max(word count, ceil(chars/3.6)) — the
    standard public heuristic for budgeting LLM token counts."""
    return F.greatest(
        token_count_col(text),
        F.ceil(F.length(text) / chars_per_token).cast("int"))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-signal ratios (all doubles rounded to 6 dp for cross-engine
    comparability)."""
    n = F.greatest(F.length(text), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    tokens = token_count_col(text)
    mean_tok = F.round(F.length(text) / F.greatest(tokens, F.lit(1)), 6)
    return {
        "n_chars_m": F.length(text).cast("int"),
        "n_tokens": tokens,
        "punct_ratio": F.round(punct / n, 6),
        "digit_ratio": F.round(digits / n, 6),
        "upper_ratio": F.round(upper / n, 6),
        "mean_token_len": mean_tok,
        "stopword_hits": marker_hits(text, "en"),
    }


def quality_score_col(text: Column) -> Column:
    """0-100 quality score: rewards length & stopword density, penalizes
    punctuation/digit noise. Deterministic integer output."""
    q = quality_columns(text)
    score = (
        F.least(q["n_tokens"], F.lit(50)) * 1
        + F.least(q["stopword_hits"] * 5, F.lit(25))
        - F.least(F.round(q["punct_ratio"] * 100, 0).cast("int"), F.lit(25))
        - F.least(F.round(q["digit_ratio"] * 100, 0).cast("int"), F.lit(25))
        + F.lit(25)
    )
    return F.greatest(F.lit(0), F.least(score, F.lit(100))).cast("int")


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of the casefolded, punctuation-stripped,
    whitespace-collapsed text — the exact-dedup key that survives
    formatting noise."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " "), r"\s+", " "))
    return F.md5(norm)


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set."""
    t = F.col(text_col)
    q = quality_columns(t)
    out = df
    for name, col in q.items():
        out = out.withColumn(name, col)
    return (out
            .withColumn("lang_id", language_id_col(t))
            .withColumn("subword_tokens", subword_estimate_col(t))
            .withColumn("quality_score", quality_score_col(t))
            .withColumn("fingerprint", fingerprint_col(t)))
