"""Deduplication operators for training-data pipelines.

Five families, each chosen for a different scale/recall point:

* :func:`exact_duplicates` — hash-groupBy on a normalized fingerprint.
  One shuffle on the 16-byte key; the baseline for byte-near-identical text.
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash + LSH
  banding. Signatures are PER-ROW array expressions (shingle → 32-bit hash →
  k affine permutations → min), no shuffle until the band-bucket join; the
  band join touches only colliding pairs — the classic near-dup design for
  10^9+ documents (Broder's construction).
* :func:`simhash64` — 64-bit SimHash from token hashes, per-row; Hamming
  proximity via band-of-bits join.
* :func:`ngram_jaccard_pairs` — exact Jaccard verification on candidate
  pairs (the LSH post-filter; also usable stand-alone at small scale).
* :func:`embedding_near_duplicates` — cosine near-dup over an embedding
  column via per-row norm + bucketed self-join (see similarity.py for ANN).

Hash primitive: the low 32 bits of md5 — available bit-identically in both
Spark and DuckDB (the driver's oracle), unlike xxhash64/murmur which differ
across engines. Affine permutation params are seeded literals so the oracle
SQL can embed the same constants.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint_col

MERSENNE31 = (1 << 31) - 1  # modulus for affine MinHash permutations


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs, a in [1, 2^20) keeps a*h below 2^51."""
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 20), rng.randrange(0, MERSENNE31))
            for _ in range(k)]


def md5_hash32(col: Column) -> Column:
    """Low-ish 32 bits of md5 — cross-engine reproducible string hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def normalized_text_col(text: Column) -> Column:
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " "), r"\s+", " "))


def shingles_col(text: Column, n: int = 5) -> Column:
    """Character n-gram shingle array over the normalized text (per-row)."""
    norm = normalized_text_col(text)
    count = F.greatest(F.length(norm) - (n - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), count),
                       lambda i: F.substring(norm, i, n))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by content fingerprint: one row per group with
    size > 1, canonical keeper = min id (deterministic)."""
    fp = df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fp"))
    return (fp.groupBy("fp")
              .agg(F.count("*").alias("dup_count"),
                   F.min(id_col).alias("keeper_id"))
              .filter(F.col("dup_count") > 1))


def drop_exact_duplicates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per fingerprint (the global dedup pass)."""
    w = Window.partitionBy(fingerprint_col(F.col(text_col))).orderBy(id_col)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 32,
                       shingle_n: int = 5, seed: int = 42) -> DataFrame:
    """(id, signature array<long>) — fully per-row, zero shuffles."""
    sh = shingles_col(F.col(text_col), shingle_n)
    hashes = F.transform(sh, lambda s: md5_hash32(s) % MERSENNE31)
    params = minhash_params(k, seed)
    sig = F.array(*[
        F.array_min(F.transform(
            hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE31))
        for a, b in params
    ])
    return df.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and self-join on (band, band-key).

    k/bands rows per band; documents agreeing on any full band collide.
    The join is an equi-join on the band hash — the only shuffle, and it
    moves (band, key, id) triples, never the signatures or the text.
    """
    sig_len_expr = signatures.select(
        F.size("signature").alias("n")).limit(1)
    k = sig_len_expr.collect()[0]["n"]
    rows_per_band = k // bands
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.md5(F.concat_ws(",", *[
                F.col("signature").getItem(b * rows_per_band + r)
                for r in range(rows_per_band)]))
            for b in range(bands)
        ])).alias("band", "band_key"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col(f"l.band") == F.col("r.band"))
                      & (F.col("l.band_key") == F.col("r.band_key"))
                      & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens of the normalized text (per-row).

    For each bit position b, the bit is 1 iff more token hashes have bit b
    set than unset (Charikar's construction). 32 bits by default — enough
    Hamming resolution for near-dup bucketing while staying in exact int64
    arithmetic on both engines.
    """
    norm = normalized_text_col(text)
    tokens = F.filter(F.split(norm, " "), lambda t: t != "")
    hashes = F.transform(tokens, lambda t: md5_hash32(t))
    n = F.size(hashes)
    bit_vals = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.aggregate(
                hashes, F.lit(0).cast("long"),
                lambda acc, h: acc + F.floor(h / F.pow(F.lit(2.0), b)
                                             .cast("long")).cast("long") % 2
            ) * 2 > n, F.lit(1)).otherwise(F.lit(0)))
    return F.aggregate(
        bit_vals, F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit)


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = 32,
                  band_bits: int = 8, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the hash into ``bits/band_bits``
    chunks (pigeonhole: hamming ≤ bands-1 guarantees a shared band), join on
    any equal band, verify Hamming distance exactly via bit_count(xor)."""
    h = df.select(F.col(id_col), simhash64(F.col(text_col), bits).alias("sh"))
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = h.select(
        id_col, "sh",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sh"), b * band_bits).bitwiseAND(F.lit(mask))
            for b in range(n_bands)
        ])).alias("band", "band_key"))
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (l.join(r, (F.col("l.band") == F.col("r.band"))
                    & (F.col("l.band_key") == F.col("r.band_key"))
                    & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"),
                     F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
                     .alias("hamming"))
             .distinct())
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification / small-scale stand-alone)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 5,
                        threshold: float = 0.6) -> DataFrame:
    """Exact Jaccard over distinct character n-grams via explode +
    pair-count aggregation: |A∩B| from a shingle equi-join, |A∪B| =
    |A|+|B|−|A∩B|. The shingle join is the scale limiter — use it as the
    verifier behind :func:`lsh_candidate_pairs` at size."""
    sh = (df.select(F.col(id_col),
                    F.explode(F.array_distinct(
                        shingles_col(F.col(text_col), n))).alias("s")))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (l.join(r, (F.col("l.s") == F.col("r.s"))
                    & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
             .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                      F.col(f"r.{id_col}").alias("id_b"))
             .agg(F.count("*").alias("n_common")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common")
                                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                                6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(df: DataFrame, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.95,
                              block_col: str | None = None) -> DataFrame:
    """Pairs with cosine ≥ threshold. ``block_col`` (e.g. an LSH bucket or a
    label) restricts the self-join to blocks — without it this is the O(n²)
    exact variant for verification scale."""
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))
    base = df.select(F.col(id_col), F.col(vec_col).alias("v"),
                     norm.alias("nrm"),
                     *([F.col(block_col).alias("blk")] if block_col else []))
    l, r = base.alias("l"), base.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    if block_col:
        cond = cond & (F.col("l.blk") == F.col("r.blk"))
    dot = F.aggregate(
        F.zip_with(F.col("l.v"), F.col("r.v"),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    return (l.join(r, cond)
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"),
                    F.round(dot / (F.col("l.nrm") * F.col("r.nrm")), 6)
                    .alias("cosine"))
            .filter(F.col("cosine") >= threshold))
