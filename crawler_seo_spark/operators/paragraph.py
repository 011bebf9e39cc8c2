"""Paragraph-level exact dedup — the sub-document operator family a
training-data pipeline runs after doc-level dedup: boilerplate headers,
license blocks, and templated sections repeat across documents that are
not near-duplicates as wholes.

Shape (all bucketed, never all-pairs):

* :func:`paragraph_occurrences` — explode each document into trimmed,
  non-empty paragraphs with a stable ``(doc, para_idx)`` position and an
  md5 content hash (md5 for cross-engine oracle parity; swap
  ``xxhash64`` in production for speed — same plan).
* :func:`mark_duplicate_paragraphs` — the FIRST global occurrence of each
  hash (ordered by ``(doc_id, para_idx)``) is the keeper; every later
  occurrence is a duplicate. First-occurrence selection is
  ``min(struct(doc, idx)) OVER (PARTITION BY hash)`` — ONE exchange of
  the occurrence rows on the hash. (The r5 groupBy-then-join form read
  the occurrence subtree twice — its two consumers hash-partitioned
  different child plans, so the explode+md5 pipeline executed once per
  consumer; the map-side combine it bought only shrank the small count
  exchange, not the duplicated upstream work.)
* :func:`paragraph_stats` — per-document containment: paragraph count,
  duplicated-paragraph count, duplicate ratio.
* :func:`drop_duplicate_paragraphs` — the paragraph-dedup'd corpus: keep
  only first occurrences, reassemble per document in paragraph order
  (paragraphs come back trimmed, joined by the delimiter; documents whose
  every paragraph was a duplicate keep an empty text). Reassembly is the
  one stage that shuffles text — unavoidable for output, single pass.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashutil import POLY64 as _RK_BASE
from .hashutil import POLY64_INV as _RK_BASE_INV
from .hashutil import splitmix64 as _splitmix64
from .partitioning import widen_small_input

PARA_DELIM = "\n\n"


def paragraph_occurrences(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          delimiter: str = PARA_DELIM) -> DataFrame:
    """(id, para_idx, para, para_hash) — trimmed non-empty paragraphs.

    ``para_idx`` is the paragraph's position in the ORIGINAL split (before
    empty-paragraph removal), so reassembly order and the DuckDB oracle's
    ordinality agree."""
    df = widen_small_input(df)
    return (df.select(
        F.col(id_col),
        # F.split takes a Java regex; the delimiter is a LITERAL string
        # (reassembly joins with it verbatim), so escape it — an unescaped
        # "|" or "." would split between every character
        F.posexplode(F.split(F.col(text_col), re.escape(delimiter)))
        .alias("para_idx", "_raw"))
        .withColumn("para", F.trim(F.col("_raw")))
        .filter(F.length("para") > 0)
        .select(id_col, "para_idx", "para",
                F.md5(F.col("para")).alias("para_hash")))


def mark_duplicate_paragraphs(occ: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """Add ``is_dup``: true for every occurrence after the global first
    (ordered by ``(id, para_idx)``) of the same paragraph hash. One
    window pass over the hash partitioning — the occurrence subtree is
    read exactly once (see module docstring)."""
    from pyspark.sql import Window

    first = F.min(F.struct(F.col(id_col), F.col("para_idx"))) \
        .over(Window.partitionBy("para_hash"))
    return occ.withColumn(
        "is_dup",
        ~((F.col(id_col) == first[id_col])
          & (F.col("para_idx") == first["para_idx"])))


def paragraph_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    delimiter: str = PARA_DELIM) -> DataFrame:
    """(id, n_paras, n_dup_paras, dup_ratio) per document. Documents with
    no non-empty paragraphs produce no row (nothing to measure)."""
    marked = mark_duplicate_paragraphs(
        paragraph_occurrences(df, id_col, text_col, delimiter), id_col)
    return (marked.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_paras"),
                 F.sum(F.col("is_dup").cast("long")).alias("n_dup_paras"))
            .withColumn("dup_ratio",
                        F.round(F.col("n_dup_paras")
                                / F.col("n_paras"), 6)))


def corpus_from_marked(doc_ids: DataFrame, marked: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       delimiter: str = PARA_DELIM) -> DataFrame:
    """Reassemble (id, text) from ``is_dup``-marked occurrences: keep
    non-duplicates, rejoin in paragraph order; every id in ``doc_ids``
    appears (empty text when nothing survives). Shared by the one-shot
    (:func:`drop_duplicate_paragraphs`) and incremental
    (:class:`~crawler_seo_spark.operators.incremental.ParagraphIndex`)
    paths."""
    kept = (marked.filter(~F.col("is_dup"))
            .groupBy(id_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("para_idx", "para"))),
                    lambda s: s["para"]),
                delimiter).alias("_text")))
    return (doc_ids.select(id_col)
            .join(kept, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("_text"), F.lit(""))
                    .alias(text_col)))


def drop_duplicate_paragraphs(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              delimiter: str = PARA_DELIM) -> DataFrame:
    """(id, text) with every non-first paragraph occurrence removed and
    the survivors rejoined by ``delimiter`` in original order. Every input
    document appears (empty text when nothing survives)."""
    marked = mark_duplicate_paragraphs(
        paragraph_occurrences(df, id_col, text_col, delimiter), id_col)
    return corpus_from_marked(df, marked, id_col, text_col, delimiter)


# ---------------------------------------------------------------------------
# Substring-level (n-gram span) repetition — finer than paragraphs
# ---------------------------------------------------------------------------

# Rabin-Karp base for the vectorized rolling selector: POLY64 is odd
# (invertible mod 2^64) so prefix differences can be rebased with the
# modular inverse (see hashutil).


def _rolling_window_hashes(cp, width):
    """Vectorized 64-bit polynomial hashes of every ``width``-length
    window of the uint64 code-point array ``cp`` (wraparound arithmetic —
    numpy uint64 ops are mod-2^64 by construction, deterministic on every
    platform). H(p) = Σ cp[p+i]·B^(w−1−i); computed from one cumsum of
    cp[i]·B^(−i) rebased by B^(p+w−1), then finalizer-mixed so the low
    bits used for mod selection carry every position's contribution."""
    import numpy as np
    n = len(cp)
    with np.errstate(over="ignore"):
        base = np.uint64(_RK_BASE)
        binv = np.uint64(_RK_BASE_INV)
        # ipow[i] = B^-i, bpow[i] = B^i  (cumprod, wraps mod 2^64)
        ipow = np.empty(n, dtype=np.uint64)
        bpow = np.empty(n, dtype=np.uint64)
        ipow[0] = 1
        bpow[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, binv, dtype=np.uint64),
                       out=ipow[1:])
            np.cumprod(np.full(n - 1, base, dtype=np.uint64),
                       out=bpow[1:])
        pref = np.cumsum(cp * ipow, dtype=np.uint64)
        n_win = n - width + 1
        win = np.empty(n_win, dtype=np.uint64)
        win[0] = pref[width - 1]
        win[1:] = pref[width:] - pref[:n_win - 1]
        h = win * bpow[width - 1:]
    # shared finalizer: low bits become uniform (hashutil.splitmix64)
    return _splitmix64(h)


def _span_occurrences_rolling(df: DataFrame, id_col: str, text_col: str,
                              width: int, sample_mod: int | None,
                              normalize: bool = True) -> DataFrame:
    """Flat ``(_id, pos, h64)`` for the production rolling selector —
    int64 fingerprints only, no strings anywhere: numpy selects AND
    fingerprints the windows, ``mapInPandas`` ships three flat columns
    over Arrow, and downstream consumers group/join on the 8-byte key
    (:func:`span_occurrences` stringifies JVM-side only when the public
    string form is asked for). Docs shorter than ``width`` keep the
    md5-prefix SELECTION rule (cross-engine-stable for the one whole-text
    window) and emit the first 8 md5 bytes as their int64 fingerprint —
    same 64-bit namespace; a chance collision with a rolling hash is
    2^-64-scale, negligible against the stats these feed.
    ``sample_mod=None`` keeps EVERY window — dense exact mode at numpy
    speed, the fast path for extent extraction."""
    from .dedup import normalized_text_col

    t_col = (normalized_text_col(F.col(text_col)) if normalize
             else F.col(text_col))
    norm = widen_small_input(
        df.select(F.col(id_col).alias("_id"), t_col.alias("_t")))
    id_dt = norm.schema["_id"].dataType.simpleString()
    mod = sample_mod
    # chunk bound for the concatenated code-point array: caps the numpy
    # working set (~6 arrays × 8 B/char) at ~50 MB per task while still
    # amortizing the per-call numpy overhead over ~10^6 elements — the
    # r5 per-document form paid ~15 numpy dispatches per (often ~10^3
    # char) document, which dominated the kernel at bench scale.
    chunk_chars = 1 << 20

    def _flush(ids_l, texts_l, lens_l, out):
        """Vectorize ONE chunk: concatenate the docs, roll hashes over
        the joined array once, and mask windows that cross a document
        boundary. Window g (global) of the concatenation hashes to
        exactly the per-document hash of window (g - start_d): the
        prefix-difference rebase cancels the global offset (see
        _rolling_window_hashes), so values are identical to the
        per-document form."""
        import numpy as np
        cp = np.frombuffer("".join(texts_l).encode("utf-32-le"),
                           dtype="<u4").astype(np.uint64)
        lens = np.asarray(lens_l, dtype=np.int64)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        h = _rolling_window_hashes(cp, width)
        n_win = len(h)
        # doc index per window start (docs are contiguous; every doc in
        # this chunk has len >= width)
        doc_idx = np.repeat(np.arange(len(lens)), lens)[:n_win]
        valid = (np.arange(n_win) - starts[doc_idx]) <= (lens[doc_idx]
                                                         - width)
        if mod is None:
            sel = np.nonzero(valid)[0]
        else:
            sel = np.nonzero(valid & (h % np.uint64(mod)
                                      == np.uint64(0)))[0]
        if len(sel):
            d = doc_idx[sel]
            out[0].append(np.asarray(ids_l)[d])
            out[1].append((sel - starts[d] + 1).astype(np.int32))
            # label only — signed view of the uint64
            out[2].append(h[sel].astype(np.int64))

    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = ([], [], [])  # ids, poss, h64s
            ids_l, texts_l, lens_l, n_ch = [], [], [], 0
            for did, t in zip(pdf["_id"], pdf["_t"]):
                t = t or ""
                if not t:
                    # empty normalized text yields NO windows — two
                    # blank docs must not "repeat" via md5('')
                    continue
                if len(t) >= width:
                    ids_l.append(did)
                    texts_l.append(t)
                    lens_l.append(len(t))
                    n_ch += len(t)
                    if n_ch >= chunk_chars:
                        _flush(ids_l, texts_l, lens_l, out)
                        ids_l, texts_l, lens_l, n_ch = [], [], [], 0
                else:
                    # short docs keep the md5-prefix selection rule
                    # (cross-engine-stable single whole-text window)
                    dig = hashlib.md5(t.encode()).digest()
                    if mod is None or int.from_bytes(dig[:4],
                                                     "big") % mod == 0:
                        out[0].append(np.full(1, did))
                        out[1].append(np.array([1], dtype=np.int32))
                        out[2].append(np.frombuffer(dig[:8],
                                                    dtype=">i8")
                                      .astype(np.int64))
            if texts_l:
                _flush(ids_l, texts_l, lens_l, out)
            if out[0]:
                yield pd.DataFrame({"_id": np.concatenate(out[0]),
                                    "pos": np.concatenate(out[1]),
                                    "h64": np.concatenate(out[2])})

    return norm.mapInPandas(kernel,
                            schema=f"_id {id_dt}, pos int, h64 long")


def span_occurrences(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", width: int = 40,
                     stride: int = 1,
                     sample_mod: int | None = None,
                     selector: str = "md5",
                     normalize: bool = True) -> DataFrame:
    """(id, pos, span_hash) — md5 of each ``width``-char window of the
    NORMALIZED text at ``stride`` spacing (``normalize=False`` hashes the
    raw text instead — positions then index the original string, the form
    :func:`drop_repeated_spans` splices with).

    ``stride=1`` (default) is EXACT: any repeated run ≥ ``width`` chars
    shares a full window wherever it sits — the hash-window form of
    suffix-array substring dedup, at one row per character (the price of
    exactness). ``stride>1`` samples ALIGNED windows — only repeats whose
    offsets agree mod stride are found; the alignment-robust sampler is
    ``sample_mod``: keep only windows whose 32-bit md5 prefix ≡ 0 mod
    ``sample_mod`` (expected density 1/mod). Selection depends on CONTENT
    alone, so both copies of a repeated run keep the same windows
    wherever the run sits — the mod-p fingerprinting scheme (rsync/CDC
    lineage); a repeated run is detected when it contains ≥1 selected
    window (probability 1-(1-1/mod)^(run_len-width+1)).

    ``selector`` picks HOW sampled windows are chosen (both are
    content-defined, so alignment-robustness holds for either):

    * ``"md5"`` (default, ORACLE PARITY): keep windows whose 32-bit md5
      prefix ≡ 0 mod ``sample_mod`` — reproducible in DuckDB SQL, but it
      pays a Python-loop md5 for EVERY stride-1 window even in sampled
      mode (selection needs the digest).
    * ``"rolling"`` (PRODUCTION): a vectorized numpy Rabin-Karp rolling
      fingerprint over the code-point array both SELECTS the ~n/mod
      windows and IS the emitted ``span_hash`` (``"r" + signed decimal``
      of the mixed 64-bit hash — the prefix keeps it disjoint from md5
      hex) — zero per-window Python: the kernel is numpy passes feeding
      a ``mapInPandas`` that ships flat int64 columns over Arrow, and
      the int→string labelling runs JVM-side in whole-stage codegen.
      Repeat detection across documents is identical in kind (equal
      window content ⇔ equal fingerprint); the 64-bit space makes a
      corpus-wide false collision negligible for stats (birthday bound
      ≈ 3% at 10^9 windows for ONE colliding pair — irrelevant to
      threshold-style repeat ratios; use the md5 selector where
      exactness matters). Docs shorter than ``width`` keep the md5
      single-window SELECTION rule and fingerprint as their truncated
      md5 (see :func:`_span_occurrences_rolling`), so a repeated short
      text is still detected across docs. Not expressible in DuckDB —
      oracle queries pin ``selector="md5"``.

    Kernel: normalization runs ONCE per document JVM-side, then an Arrow
    pandas UDF hashes the windows (hashlib md5 — byte-identical to
    Spark/DuckDB md5 over UTF-8). The pure-Catalyst form
    (explode(sequence) → md5(substring(_t, pos, w))) was measured 38
    µs/window: CollapseProject inlines the normalized-text alias past
    the Generate, re-running both normalization regexes for EVERY window
    row — the same alias-inlining trap as the round-1 MinHash fold.
    Mod-filtering happens inside the kernel, so sampled mode ships only
    selected windows out of Python. Tail windows may be shorter than
    ``width`` (slice truncates) — deterministic on both engines."""
    import hashlib

    from .dedup import normalized_text_col

    if selector not in ("md5", "rolling"):
        raise ValueError(f"selector must be 'md5' or 'rolling': {selector}")
    if selector == "rolling" and stride != 1:
        # falling back to md5 silently would change both the cost
        # profile (per-window Python) and the span_hash namespace
        raise ValueError("selector='rolling' requires stride=1 — "
                         "use sample_mod for density control (content-"
                         "defined, alignment-robust; aligned stride "
                         "sampling is the md5 selector's mode)")
    rolling = selector == "rolling"

    if rolling:
        flat = _span_occurrences_rolling(df, id_col, text_col, width,
                                         sample_mod, normalize)
        return flat.select(
            F.col("_id").alias(id_col), "pos",
            F.concat(F.lit("r"), F.col("h64").cast("string"))
            .alias("span_hash"))

    @F.pandas_udf("array<struct<pos:int,h:string>>")
    def spans(ts):
        import pandas as pd
        out = []
        for t in ts:
            t = t or ""
            if not t:
                # empty normalized text yields NO windows — two blank
                # docs must not "repeat" via a shared md5('')
                out.append([])
                continue
            upper = max(len(t) - (width - 1), 1)
            lst = []
            for p in range(1, upper + 1, stride):
                h = hashlib.md5(t[p - 1:p - 1 + width].encode()).hexdigest()
                if sample_mod is None or int(h[:8], 16) % sample_mod == 0:
                    lst.append({"pos": p, "h": h})
            out.append(lst)
        return pd.Series(out)

    src = (normalized_text_col(F.col(text_col)) if normalize
           else F.col(text_col))
    df = widen_small_input(df)
    return (df.select(F.col(id_col), spans(src).alias("_s"))
            .select(id_col, F.explode("_s").alias("_e"))
            .select(id_col, F.col("_e.pos").alias("pos"),
                    F.col("_e.h").alias("span_hash")))


def _raw_or_string_occurrences(df: DataFrame, id_col: str, text_col: str,
                               width: int, stride: int,
                               sample_mod: int | None, selector: str,
                               normalize: bool = True) -> DataFrame:
    """(id, pos, span_hash) where span_hash is the raw int64 fingerprint
    on the rolling path (8-byte shuffle keys, no strings) and the md5
    hex string otherwise — for consumers that only group/join on the
    hash and never emit it."""
    if selector == "rolling" and stride == 1:
        return (_span_occurrences_rolling(df, id_col, text_col, width,
                                          sample_mod, normalize)
                .select(F.col("_id").alias(id_col), "pos",
                        F.col("h64").alias("span_hash")))
    return span_occurrences(df, id_col, text_col, width, stride,
                            sample_mod, selector, normalize)


def repeated_span_stats(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", width: int = 40,
                        stride: int = 1,
                        sample_mod: int | None = None,
                        selector: str = "md5") -> DataFrame:
    """Per-document substring-repetition stats: ``n_spans`` windows,
    ``n_repeated`` whose hash occurs ≥2 times ANYWHERE in the corpus
    (other docs or elsewhere in the same doc), and their ratio — the
    span-level containment signal a training pipeline thresholds on
    before the expensive exact-extent pass. Documents whose normalized
    text is empty produce no row (no windows — consistent with
    paragraph_stats). Shuffles: ONE exchange of the flat (id, pos, hash)
    occurrence rows on the 8-byte hash — the corpus-wide occurrence
    count rides a window over that partitioning, then the per-doc
    aggregation combines map-side. (The r5 groupBy-then-join form read
    the occurrence subtree TWICE — its two consumers hash-partitioned
    different child plans, so no exchange reuse: the span kernel, the
    dominant cost, executed once per consumer.) With the production
    rolling selector the whole pipeline stays on the raw int64
    fingerprint — span_hash strings are never built, since they don't
    appear in the output."""
    from pyspark.sql import Window

    occ = _raw_or_string_occurrences(df, id_col, text_col, width, stride,
                                     sample_mod, selector)
    w_h = Window.partitionBy("span_hash")
    return (occ.withColumn("_n", F.count(F.lit(1)).over(w_h))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum(F.when(F.col("_n") > 1, 1).otherwise(0))
                 .alias("n_repeated"))
            .withColumn("repeat_ratio",
                        F.round(F.col("n_repeated") / F.col("n_spans"), 6)))


def repeated_span_extents(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", width: int = 40,
                          sample_mod: int | None = None,
                          selector: str = "md5",
                          normalize: bool = True) -> DataFrame:
    """Maximal repeated character ranges per document — the exact-extent
    pass run after :func:`repeated_span_stats` flags a corpus: every
    window whose fingerprint occurs ≥2 times anywhere in the corpus is
    an interval ``[pos, pos+width-1]`` over the NORMALIZED text
    (1-based), and overlapping-or-touching intervals merge into one
    extent (gaps-and-islands: a window starts a new extent iff its
    start exceeds the running max end + 1). Output per extent:
    ``(id, start_pos, end_pos, span_len, n_windows)``.

    Dense mode (``sample_mod=None``) is exact: a repeated run of length
    L ≥ width yields one extent covering it in both copies. Sampled mode
    gives conservative inner extents (only selected windows witness the
    run). Use ``selector="rolling"`` in production — dense selection is
    a pure numpy pass and the merge needs no strings.

    Scale shape: repeat flagging is ONE exchange of the flat occurrence
    rows on the hash (window count over that partitioning — the r5
    vocabulary-join form executed the span kernel once per consumer,
    see repeated_span_stats); the interval merge is one window function
    partitioned by document (per-doc sequential, distributed across
    docs — no global ordering anywhere). Reference N/A: the reference
    has no sub-document repetition analysis (SURVEY.md §2.7 extension).
    """
    from pyspark.sql import Window

    occ = _raw_or_string_occurrences(df, id_col, text_col, width, 1,
                                     sample_mod, selector, normalize)
    w_h = Window.partitionBy("span_hash")
    rep_occ = (occ.withColumn("_n", F.count(F.lit(1)).over(w_h))
               .filter(F.col("_n") > 1)
               .select(id_col, "pos"))
    w = Window.partitionBy(id_col).orderBy("pos")
    run_end = F.col("pos") + F.lit(width - 1)
    prev_max_end = F.max(run_end).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    return (rep_occ
            .withColumn("_new", F.when(prev_max_end.isNull()
                                       | (F.col("pos")
                                          > prev_max_end + 1), 1)
                        .otherwise(0))
            .withColumn("_isl", F.sum("_new").over(w))
            .groupBy(id_col, "_isl")
            .agg(F.min("pos").alias("start_pos"),
                 (F.max("pos") + F.lit(width - 1)).alias("end_pos"),
                 F.count(F.lit(1)).alias("n_windows"))
            .withColumn("span_len",
                        F.col("end_pos") - F.col("start_pos") + 1)
            .select(id_col, "start_pos", "end_pos", "span_len",
                    "n_windows"))


def drop_repeated_spans(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", width: int = 40,
                        sample_mod: int | None = None,
                        selector: str = "md5",
                        normalize: bool = False) -> DataFrame:
    """Repetition-scrubbed corpus ``(id, text)``: EVERY maximal repeated
    extent (see :func:`repeated_span_extents`) is excised from every
    document that carries it — the boilerplate-removal transform
    (keep-one-copy dedup is :func:`drop_duplicate_paragraphs`; this one
    targets license blocks / templated runs that should survive in NO
    copy). Documents with no repeated extents pass through unchanged.

    ``normalize=False`` (default here, unlike the analysis ops) computes
    windows over the RAW text so extent positions index the original
    string and splicing is exact. With ``normalize=True`` the returned
    text is the scrubbed NORMALIZED form.

    Scale shape: extents per doc are collected into ONE array row
    (bounded by doc length / width), the complement segments are built
    with element-local lambdas over that array, and the substring
    assembly runs where the doc's text row already lives — the only
    text movement is the broadcast-or-shuffle of the (id, extents)
    pairs, never text duplication per extent."""
    from .dedup import normalized_text_col

    ext = repeated_span_extents(df, id_col, text_col, width, sample_mod,
                                selector, normalize)
    per_doc = (ext.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col("start_pos").alias("s"),
                            F.col("end_pos").alias("e"))))
                   .alias("_ex")))
    src = (normalized_text_col(F.col(text_col)) if normalize
           else F.col(text_col))
    base = df.select(F.col(id_col), src.alias("_t"))
    # complement of the sorted extents: segment starts are 1 and each
    # extent's end+1; segment ends are each extent's start-1 and len(t)
    starts = F.concat(F.array(F.lit(1)),
                      F.transform(F.col("_ex"), lambda x: x["e"] + 1))
    ends = F.concat(F.transform(F.col("_ex"), lambda x: x["s"] - 1),
                    F.array(F.length("_t")))
    kept = F.filter(F.zip_with(starts, ends,
                               lambda s, e: F.struct(s.alias("s"),
                                                     e.alias("e"))),
                    lambda seg: seg["e"] >= seg["s"])
    return (base.join(per_doc, id_col, "left")
            .withColumn(
                text_col,
                F.when(F.col("_ex").isNull(), F.col("_t"))
                .otherwise(F.array_join(
                    F.transform(kept, lambda seg: F.col("_t").substr(
                        seg["s"], seg["e"] - seg["s"] + 1)), "")))
            .select(id_col, text_col))
