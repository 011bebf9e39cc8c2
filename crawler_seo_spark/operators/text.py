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
    # digit/upper counts: the regex classes are exact ASCII sets, so a
    # single-pass translate-delete (no regex engine) counts identically
    # to length(regexp_replace(text, '[^0-9]'/'[^A-Z]', ''))
    digits = F.length(text) - F.length(F.translate(text, "0123456789", ""))
    upper = F.length(text) - F.length(
        F.translate(text, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", ""))
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
    # one regex pass: [^\p{L}\p{N}]+ already collapses whitespace runs
    # to one space (see dedup.normalized_text_col — the historical second
    # \s+ pass was a provable identity; output byte-identical)
    norm = F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " "))
    return F.md5(norm)


# Expression-forest cache for with_text_analysis: the added columns
# reference nothing but the text column, so the ~0.5 s of py4j chatter
# building them (profiled at sf1: more than a third of the query's wall
# time) is paid once per (SparkContext, text_col) instead of per call.
# Expressions only — every call still plans/executes on its own input.
_TA_CACHE: tuple | None = None


def _text_analysis_cols(sc, text_col: str) -> list:
    global _TA_CACHE
    if (_TA_CACHE is None or _TA_CACHE[0] is not sc
            or _TA_CACHE[1] != text_col):
        t = F.col(text_col)
        cols = [col.alias(name) for name, col in quality_columns(t).items()]
        cols += [language_id_col(t).alias("lang_id"),
                 subword_estimate_col(t).alias("subword_tokens"),
                 quality_score_col(t).alias("quality_score"),
                 fingerprint_col(t).alias("fingerprint")]
        _TA_CACHE = (sc, text_col, cols)
    return _TA_CACHE[2]


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set. The projection is
    regex-heavy per row, so a tiny single-file input is widened first
    (guide §2.5 — otherwise the whole pass runs in one scan task)."""
    from .partitioning import widen_small_input
    df = widen_small_input(df)
    cols = _text_analysis_cols(df.sparkSession.sparkContext, text_col)
    added = ("n_chars_m", "n_tokens", "punct_ratio", "digit_ratio",
             "upper_ratio", "mean_token_len", "stopword_hits", "lang_id",
             "subword_tokens", "quality_score", "fingerprint")
    if any(n in df.columns for n in added):
        # collision with an existing column: SELECT *,… would duplicate
        # the name where withColumn replaces it — keep the replace
        # semantics on that (rare) path
        out = df
        t = F.col(text_col)
        for name, col in quality_columns(t).items():
            out = out.withColumn(name, col)
        return (out
                .withColumn("lang_id", language_id_col(t))
                .withColumn("subword_tokens", subword_estimate_col(t))
                .withColumn("quality_score", quality_score_col(t))
                .withColumn("fingerprint", fingerprint_col(t)))
    return df.select("*", *cols)


# ---------------------------------------------------------------------------
# Gopher-style document quality gates (Rae et al. 2021, table A1 — the
# published rule set every large text pipeline reimplements)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word: float = 3.0,
                         max_mean_word: float = 10.0,
                         max_symbol_word_ratio: float = 0.1,
                         max_bullet_line_frac: float = 0.9,
                         max_ellipsis_line_frac: float = 0.3,
                         min_alpha_word_frac: float = 0.8,
                         min_stopword_kinds: int = 2) -> DataFrame:
    """Per-rule boolean gates + the combined ``keep`` flag, all pure
    Catalyst (whole-stage codegen; array lambdas are element-local —
    never slicing an outer array, the O(n²) inlining trap). Thresholds
    default to the published Gopher values. Each rule is its own column
    so a pipeline can report WHY documents were dropped (the reject-log
    discipline the crawl engine uses for URL filters).

    Rules: word count bounds; mean word length bounds; symbol-to-word
    ratio (``#`` and ``...``); bullet-started line fraction;
    ellipsis-ended line fraction; alphabetic-word fraction; minimum
    distinct-stopword kinds present."""
    from .partitioning import widen_small_input
    df = widen_small_input(df)
    t = F.col(text_col)
    trimmed = F.trim(t)
    words = F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))
    n_words = F.size(words)
    nw1 = F.greatest(n_words, F.lit(1))
    word_chars = F.aggregate(words, F.lit(0).cast("long"),
                             lambda a, x: a + F.length(x))
    mean_word = F.round(word_chars / nw1, 6)
    hashes = _count_occurrences(t, "#")
    ellipses = _count_occurrences(t, "...")
    symbol_ratio = F.round((hashes + ellipses) / nw1, 6)
    lines = F.filter(F.transform(F.split(t, "\n"), F.trim),
                     lambda ln: ln != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.round(F.size(F.filter(
        lines, lambda ln: ln.startswith("-") | ln.startswith("*")
        | ln.startswith("•"))) / n_lines, 6)
    ellipsis_frac = F.round(F.size(F.filter(
        lines, lambda ln: ln.endswith("...") | ln.endswith("…")))
        / n_lines, 6)
    alpha_frac = F.round(F.size(F.filter(
        words, lambda w: w.rlike(r"[\p{L}]"))) / nw1, 6)
    padded = F.concat(F.lit(" "),
                      F.regexp_replace(F.lower(t), r"[^\p{L}\p{N} ]", " "),
                      F.lit(" "))
    kinds = F.lit(0)
    for w in GOPHER_STOPWORDS:
        kinds = kinds + F.when(
            padded.contains(f" {w} "), 1).otherwise(0)
    out = (df
           .withColumn("n_words", n_words)
           .withColumn("mean_word_len", mean_word)
           .withColumn("pass_word_count",
                       (n_words >= min_words) & (n_words <= max_words))
           .withColumn("pass_mean_word_len",
                       (mean_word >= min_mean_word)
                       & (mean_word <= max_mean_word))
           .withColumn("pass_symbol_ratio",
                       symbol_ratio <= max_symbol_word_ratio)
           .withColumn("pass_bullet_lines",
                       bullet_frac <= max_bullet_line_frac)
           .withColumn("pass_ellipsis_lines",
                       ellipsis_frac <= max_ellipsis_line_frac)
           .withColumn("pass_alpha_words",
                       alpha_frac >= min_alpha_word_frac)
           .withColumn("pass_stopwords", kinds >= min_stopword_kinds))
    return out.withColumn(
        "keep",
        F.col("pass_word_count") & F.col("pass_mean_word_len")
        & F.col("pass_symbol_ratio") & F.col("pass_bullet_lines")
        & F.col("pass_ellipsis_lines") & F.col("pass_alpha_words")
        & F.col("pass_stopwords"))


# ---------------------------------------------------------------------------
# PII scrubbing — the redaction pass a training pipeline runs before the
# final mix (regex families chosen to be portable across Java regex and
# RE2/DuckDB: no lookbehind, no backrefs)
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (kind, pattern, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d().-]{7,}\d", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4 addresses / international-format phone
    numbers with redaction tokens and count each kind. Counts are
    matches against the ORIGINAL text per pattern; replacement applies
    the patterns in the fixed ``PII_PATTERNS`` order (email first, so
    an address never survives inside a larger match). Pure Catalyst —
    ``regexp_replace``/``regexp_count`` run in whole-stage codegen, and
    the same expressions reproduce verbatim in the DuckDB oracle.

    Scope note (deliberate): the phone family matches only
    ``+``-prefixed international format — the bare 10-digit forms
    collide with ids/quantities at an unacceptable false-positive rate
    for corpus scrubbing; callers needing locale rules extend
    ``PII_PATTERNS``."""
    from .partitioning import widen_small_input
    df = widen_small_input(df)
    t = F.col(text_col)
    scrubbed = t
    counts = []
    for kind, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat))
                      .cast("int").alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select("*", scrubbed.alias(f"{text_col}_scrubbed"),
                     *counts)


def gopher_repetition_flags(df: DataFrame, text_col: str = "text",
                            max_dup_line_frac: float = 0.30,
                            max_dup_line_char_frac: float = 0.20,
                            max_dup_para_frac: float = 0.30,
                            max_dup_para_char_frac: float = 0.20,
                            max_top2gram_char_frac: float = 0.20,
                            max_dup5gram_char_frac: float = 0.15) \
        -> DataFrame:
    """WITHIN-document repetition signals (the second half of the Gopher
    rule set; the corpus-level repeats are the span/paragraph dedup
    family). Exact definitions (all fractions rounded to 6 dp, 0 for
    empty documents; the DuckDB oracle reproduces them value-for-value):

    * lines / paragraphs: ``\\n`` / ``\\n\\n`` splits, trimmed,
      non-empty. ``dup_*_frac`` counts occurrences beyond each group's
      first (Σ (c−1) over groups with c>1, over total); ``*_char_frac``
      weighs those occurrences by their character length over total
      line/paragraph characters.
    * ``top2gram_char_frac``: over normalized-token word 2-grams, the
      maximum of ``count × gram_length`` divided by the normalized text
      length — "the 2-gram covering the most characters" (max of the
      product, not argmax-of-count, so the metric is deterministic
      under count ties on every engine).
    * ``dup5gram_char_frac``: Σ ``count × gram_length`` over word
      5-grams occurring more than once, divided by normalized length
      (overlapping occurrences double-count characters — the standard
      form of this rule; values may exceed 1 on degenerate docs).

    Kernel: one Arrow pandas UDF computes all six signals in a single
    per-document pass (Counter over lines/paragraphs/grams — within-doc
    signals need no shuffle at all); the flags are Catalyst columns."""
    import pandas as pd

    @F.pandas_udf("struct<dup_line_frac:double,dup_line_char_frac:double,"
                  "dup_para_frac:double,dup_para_char_frac:double,"
                  "top2gram_char_frac:double,dup5gram_char_frac:double>")
    def signals(texts, norms):
        import math
        from collections import Counter

        def r6(x):
            # half-AWAY-from-zero at 6 dp — what SQL round() does on
            # both engines; Python's round() is banker's and diverges on
            # exact binary ties like 13/128 = 0.1015625
            return math.floor(x * 1e6 + 0.5) / 1e6

        rows = []
        for t, nm in zip(texts, norms):
            t = t or ""
            nm = nm or ""

            def dup_stats(parts):
                # strip SPACES only — SQL trim() (DuckDB/Spark) does not
                # touch \t/\r, so neither may the kernel
                parts = [p.strip(" ") for p in parts]
                parts = [p for p in parts if p]
                if not parts:
                    return 0.0, 0.0
                c = Counter(parts)
                extra = sum(v - 1 for v in c.values() if v > 1)
                extra_ch = sum((v - 1) * len(k)
                               for k, v in c.items() if v > 1)
                tot_ch = sum(len(p) for p in parts)
                return (r6(extra / len(parts)),
                        r6(extra_ch / tot_ch) if tot_ch else 0.0)

            lf, lcf = dup_stats(t.split("\n"))
            pf, pcf = dup_stats(t.split("\n\n"))
            toks = nm.split(" ") if nm else []
            n_ch = len(nm)
            top2 = 0.0
            dup5 = 0.0
            if n_ch:
                if len(toks) >= 2:
                    g2 = Counter(" ".join(toks[i:i + 2])
                                 for i in range(len(toks) - 1))
                    top2 = r6(max(v * len(k)
                                  for k, v in g2.items()) / n_ch)
                if len(toks) >= 5:
                    g5 = Counter(" ".join(toks[i:i + 5])
                                 for i in range(len(toks) - 4))
                    dup5 = r6(sum(v * len(k) for k, v in g5.items()
                                  if v > 1) / n_ch)
            rows.append((lf, lcf, pf, pcf, top2, dup5))
        return pd.DataFrame(rows, columns=[
            "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
            "dup_para_char_frac", "top2gram_char_frac",
            "dup5gram_char_frac"])

    from .partitioning import widen_small_input
    df = widen_small_input(df)
    # single-pass normalization — identical output to the historical
    # two-pass chain (see dedup.normalized_text_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   r"[^\p{L}\p{N}]+", " "))
    out = df.withColumn("_s", signals(F.col(text_col), norm))
    for f in ("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
              "dup_para_char_frac", "top2gram_char_frac",
              "dup5gram_char_frac"):
        out = out.withColumn(f, F.col(f"_s.{f}"))
    return (out.drop("_s")
            .withColumn("pass_dup_lines",
                        F.col("dup_line_frac") <= max_dup_line_frac)
            .withColumn("pass_dup_line_chars",
                        F.col("dup_line_char_frac")
                        <= max_dup_line_char_frac)
            .withColumn("pass_dup_paras",
                        F.col("dup_para_frac") <= max_dup_para_frac)
            .withColumn("pass_dup_para_chars",
                        F.col("dup_para_char_frac")
                        <= max_dup_para_char_frac)
            .withColumn("pass_top2gram",
                        F.col("top2gram_char_frac")
                        <= max_top2gram_char_frac)
            .withColumn("pass_dup5gram",
                        F.col("dup5gram_char_frac")
                        <= max_dup5gram_char_frac)
            .withColumn("keep_repetition",
                        F.col("pass_dup_lines")
                        & F.col("pass_dup_line_chars")
                        & F.col("pass_dup_paras")
                        & F.col("pass_dup_para_chars")
                        & F.col("pass_top2gram")
                        & F.col("pass_dup5gram")))
