"""Test-set decontamination — flag training documents that share word
n-grams with a benchmark/evaluation corpus (the GPT-3 appendix-C /
Pile-style decontamination stage every LLM training pipeline runs before
the final mix).

Shape at the 100-TB design point:

* The benchmark side is SMALL (eval suites are 10^4-10^6 documents); its
  distinct n-gram set is built once and **broadcast** — the training
  corpus never shuffles for the membership probe.
* The corpus side explodes each document into distinct word n-grams;
  the per-document ``distinct`` is the one shuffle (on ``(id, gram
  key)``), map-side combined.
* ``key="hash"`` (production): membership probes on ``xxhash64`` of the
  n-token slice, computed map-side BEFORE the distinct — no gram string
  is ever built, the per-doc distinct shuffles 8-byte ints, and the
  broadcast table holds 8-byte keys instead of variable-length strings
  (~10× smaller for 8-grams); a 2^-64-scale collision can only
  over-flag, never miss. ``key="text"`` joins on the n-gram string
  itself — cross-engine reproducible, used by the DuckDB oracle query.

Reference N/A: the reference crawler has no training-data hygiene stage
(SURVEY.md §2.7 extension, same family as dedup/quality).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text_col
from .hashutil import POLY64 as _GRAM_POLY
from .hashutil import splitmix64 as _splitmix64


def word_ngrams_col(text: Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) over the normalized
    text. Documents with fewer than ``n`` tokens yield an EMPTY array —
    never a padded partial gram.

    Kernel note: the obvious Catalyst form —
    ``transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))``
    — hits the documented higher-order-lambda inlining trap
    (``operators/dedup.py`` module notes): ``toks`` is re-evaluated
    (re-split, re-normalized) PER ELEMENT, O(tokens²) per document. The
    token array is instead materialized ONCE as the input of an Arrow
    pandas UDF that joins the windows linearly."""

    @F.pandas_udf("array<string>")
    def _grams(toks: pd.Series) -> pd.Series:
        out = []
        for tk in toks:
            if tk is None or len(tk) < n:
                out.append([])
                continue
            tl = list(tk)
            out.append([" ".join(tl[i:i + n])
                        for i in range(len(tl) - n + 1)])
        return pd.Series(out)

    # empty tokens filtered exactly like word_ngram_keys_col (r5 advisor
    # finding): a whitespace-only document must yield NO grams on either
    # key path (split("") produces [""], which at n=1 became one ''-gram
    # here while the hash path produced none)
    return _grams(F.array_remove(F.split(normalized_text_col(text), " "),
                                 ""))


def word_ngram_keys_col(text: Column, n: int) -> Column:
    """Array of 64-bit n-gram keys over the normalized token stream —
    the production key form. No gram string is ever built, and keys are
    computed BEFORE any exchange, so the per-doc ``distinct`` shuffles
    8-byte ints instead of ~50-char strings. Token-sequence equality ⇔
    joined-string equality (tokens contain no spaces), so membership
    semantics match ``key="text"`` exactly up to 2^-64-scale collisions
    (which can only over-flag, never miss).

    Kernel shape (the dedup word-shingle discipline — see
    ``operators/dedup.py`` module notes): per-token FULL-WIDTH xxhash64
    via an element-local Catalyst lambda (anything slicing the token
    array inside a lambda is re-evaluated per element —
    ``xxhash64(slice(...))`` measured ~6 s over sf0.1 vs ~1 s for this
    form; and unlike ``token_hashes_col`` no mod-2^31 reduction — a
    31-bit token space would put gram collisions at 2^-31-scale, ~10^9×
    the stated bound), then the n-token windowed polynomial combine +
    splitmix finalize runs vectorized in numpy over Arrow batches."""
    toks = F.array_remove(F.split(normalized_text_col(text), " "), "")
    tok = F.transform(toks, lambda t: F.xxhash64(t, F.lit(42)))

    # Batch form (r6): one windowed polynomial combine over the batch's
    # CONCATENATED token-hash stream, per-doc key arrays sliced back out
    # (windows never cross a doc boundary — each doc's slice starts at
    # its own offset and stops n-1 short of its end). A window's value
    # only reads its own n tokens, so keys are identical to the r5
    # per-document form, which paid ~n numpy dispatches per document.
    @F.pandas_udf("array<long>")
    def _keys(hh: pd.Series) -> pd.Series:
        import numpy as np
        base = np.uint64(_GRAM_POLY)
        out = [None] * len(hh)
        arrs, idx = [], []
        for i, h in enumerate(hh):
            if h is None or len(h) < n:
                out[i] = []
            else:
                arrs.append(np.asarray(h, dtype=np.int64).view(np.uint64))
                idx.append(i)
        if arrs:
            lens = np.asarray([len(a) for a in arrs], dtype=np.int64)
            starts = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            big = np.concatenate(arrs)
            T = len(big)
            with np.errstate(over="ignore"):
                acc = big[: T - n + 1].copy()
                for j in range(1, n):
                    acc = acc * base + big[j: T - n + 1 + j]
            # shared finalizer (hashutil.splitmix64): uniform 64-bit keys
            keys = _splitmix64(acc).astype(np.int64)
            for d, i in enumerate(idx):
                s = starts[d]
                out[i] = keys[s: s + lens[d] - n + 1]
        return pd.Series(out)

    return _keys(tok)


def _distinct_grams(df: DataFrame, id_col: str | None, text_col: str,
                    n: int, key: str) -> DataFrame:
    from .partitioning import widen_small_input
    df = widen_small_input(df)
    gram = (word_ngram_keys_col if key == "hash"
            else word_ngrams_col)(F.col(text_col), n)
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(gram).alias("_k")]
    return df.select(*cols).distinct()


def contamination_ratios(docs: DataFrame, benchmark: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         bench_text_col: str = "text", n: int = 8,
                         key: str = "hash") -> DataFrame:
    """Per-document ``(id, n_ngrams, n_contaminated,
    contamination_ratio)``: the fraction of the document's DISTINCT word
    ``n``-grams that occur anywhere in ``benchmark``. Documents with
    fewer than ``n`` tokens produce no row (nothing to measure —
    consistent with the other stats operators)."""
    if key not in ("hash", "text"):
        raise ValueError(f"key must be 'hash' or 'text': {key}")
    grams = _distinct_grams(docs, id_col, text_col, n, key)
    bench = _distinct_grams(benchmark, None, bench_text_col, n, key)
    hits = bench.withColumn("_hit", F.lit(1))
    return (grams.join(F.broadcast(hits), "_k", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_ngrams"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                 .alias("n_contaminated"))
            .withColumn("contamination_ratio",
                        F.round(F.col("n_contaminated")
                                / F.col("n_ngrams"), 6)))


def drop_contaminated(docs: DataFrame, benchmark: DataFrame,
                      threshold: float = 0.05, id_col: str = "doc_id",
                      text_col: str = "text",
                      bench_text_col: str = "text", n: int = 8,
                      key: str = "hash") -> DataFrame:
    """The decontaminated corpus: drop documents whose contamination
    ratio is ≥ ``threshold``. Documents with no measurable n-grams are
    KEPT (they cannot be contaminated at this n). The anti-join is left
    to AQE: the flagged id set is usually tiny (few docs overlap eval
    suites) and becomes a runtime broadcast, but it is NOT forced — a
    pathological corpus could flag millions of ids, and a forced
    broadcast would OOM the executors where a shuffled anti-join
    degrades gracefully."""
    flagged = (contamination_ratios(docs, benchmark, id_col, text_col,
                                    bench_text_col, n, key)
               .filter(F.col("contamination_ratio") >= threshold)
               .select(id_col))
    return docs.join(flagged, id_col, "left_anti")
