"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata — the shape
a 100 TB multimodal training pipeline uses. The Spark-side plumbing here is
REAL and tested: schemas, Arrow batch flow through ``mapInPandas``, UDF
signatures, partition sizing. Where this container lacks media libraries,
the decode kernels delegate to :mod:`crawler_seo_spark.sources.images`
(real PNG, clearly-marked stand-in lossy codecs) — on a production cluster
those two functions swap for Pillow/libvips/ffmpeg and nothing else changes.

Operators:

* :func:`decode_images` — bytes → (h, w, mean/std stats, ok flag).
* :func:`validate_images` — the BASELINE input_hint invariant: decoded
  pixels vs the deterministic reference (exact for lossless, PSNR ≥ 40 dB
  for lossy), caption equality, phash equality.
* :func:`resize_images` — nearest-neighbor resize (numpy strided), batch in
  / batch out.
* :func:`frame_sample` — video frame sampling, EXPERIMENTAL: a real
  ffmpeg-CLI kernel gated behind a ``shutil.which("ffmpeg")`` probe —
  raises only when no ffmpeg binary exists on the worker (this container
  has none, so its test is skipif-gated); the operator plumbing (schema,
  batching, per-row error isolation) runs either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.images import ahash64, decode_image, encode_image, psnr

DECODE_SCHEMA = ("image_id string, fmt string, ok boolean, h int, w int, "
                 "mean double, std double, err string")


def decode_images(df: DataFrame) -> DataFrame:
    """Decode + per-image stats via ``mapInPandas`` (Arrow batches in/out,
    one decode call per image inside the batch, no per-row serde)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    out.append((iid, fmt, True, px.shape[0], px.shape[1],
                                round(float(px.mean()), 6),
                                round(float(px.std()), 6), ""))
                except Exception as e:  # corrupt payloads must not kill the job
                    out.append((iid, fmt, False, -1, -1, 0.0, 0.0, str(e)[:200]))
            yield pd.DataFrame(out, columns=[
                "image_id", "fmt", "ok", "h", "w", "mean", "std", "err"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel, schema=DECODE_SCHEMA)


VALIDATE_SCHEMA = ("image_id string, fmt string, decode_ok boolean, "
                   "pixels_ok boolean, psnr double, phash_ok boolean, "
                   "caption_ok boolean")


def validate_images(df: DataFrame, seed: int = 42,
                    min_psnr: float = 40.0) -> DataFrame:
    """Row-for-row payload validation against the deterministic reference
    (input_hint invariant): lossless → exact pixels; lossy → PSNR ≥ 40 dB;
    phash recomputed from decoded pixels must equal the column; caption must
    equal the seeded generator's phrase."""
    from ..sources.images import LOSSY_FORMATS, make_caption, reference_pixels

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                idx = int(rec.image_id.split("-")[1])
                try:
                    px = decode_image(bytes(rec.bytes), rec.fmt)
                    ref = reference_pixels(idx, rec.w, rec.h, seed)
                    if rec.fmt in LOSSY_FORMATS:
                        p = psnr(ref, px)
                        pixels_ok = bool(p >= min_psnr)
                    else:
                        pixels_ok = bool(np.array_equal(ref, px))
                        p = float("inf") if pixels_ok else psnr(ref, px)
                    rows.append((rec.image_id, rec.fmt, True, pixels_ok,
                                 round(min(p, 99.0), 3),
                                 ahash64(px) == rec.phash,
                                 make_caption(idx) == rec.caption))
                except Exception:
                    rows.append((rec.image_id, rec.fmt, False, False, 0.0,
                                 False, False))
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "decode_ok", "pixels_ok", "psnr",
                "phash_ok", "caption_ok"])

    return df.mapInPandas(kernel, schema=VALIDATE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  out_fmt: str = "png") -> DataFrame:
    """Nearest-neighbor resize, re-encoded — the canonical map-only media
    transform (embarrassingly parallel; partition sizing is the only scale
    knob)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                px = decode_image(bytes(rec.bytes), rec.fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = px[yi][:, xi]
                out.append((rec.image_id, encode_image(resized, out_fmt),
                            out_w, out_h, out_fmt))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel,
        schema="image_id string, bytes binary, w int, h int, fmt string")


def frame_sample(df: DataFrame, every_n: int = 30, width: int = 64,
                 height: int = 64) -> DataFrame:
    """EXPERIMENTAL video frame sampling: every ``every_n``-th frame,
    scaled to ``width``×``height`` rgb24 raw bytes.

    The decode kernel is gated on an OPTIONAL dependency probe: when the
    ``ffmpeg`` CLI is on PATH in the worker environment, each task pipes
    the payload through ``ffmpeg -f rawvideo`` with a ``select=not(mod(n,
    every_n))`` filter; when it is not (this container has no video
    codec), the task raises ``NotImplementedError`` — the operator never
    silently returns wrong/empty frames. Schema, batching, and the
    per-row error contract are the stable surface; the ffmpeg path is
    exercised only by the skipif-gated test (tests/test_images.py)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import shutil
        import subprocess
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is None:
            raise NotImplementedError(
                "video decode requires the ffmpeg CLI on PATH — "
                "unavailable in this container; frame_sample is "
                "EXPERIMENTAL until a codec is present")
        frame_bytes = width * height * 3
        for pdf in batches:
            ids, nos, payloads = [], [], []
            for row in pdf.itertuples(index=False):
                proc = subprocess.run(
                    [ffmpeg, "-v", "error", "-i", "pipe:0",
                     "-vf", (f"select=not(mod(n\\,{every_n})),"
                             f"scale={width}:{height}"),
                     "-fps_mode", "vfr", "-f", "rawvideo",
                     "-pix_fmt", "rgb24", "pipe:1"],
                    input=bytes(row.bytes), capture_output=True)
                frames = proc.stdout if proc.returncode == 0 else b""
                for k in range(len(frames) // frame_bytes):
                    ids.append(row.image_id)
                    nos.append(k * every_n)
                    payloads.append(
                        frames[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame({"image_id": pd.Series(ids, dtype=object),
                                "frame_no": pd.Series(nos, dtype="int32"),
                                "bytes": pd.Series(payloads, dtype=object)})

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        kernel,
        schema="image_id string, frame_no int, bytes binary")


def caption_validation(results: DataFrame, images: DataFrame) -> DataFrame:
    """Crawl ⋈ image-table caption validation (north-star invariant).

    Explodes the image references extracted from crawled pages
    (``analysis.images``: data-image-id + alt text) and joins them against
    the image+caption table: a reference is valid iff the page's alt text
    equals the table's caption for that image_id. The join broadcasts
    nothing by default — both sides can be huge; Catalyst picks the
    strategy (AQE handles skewed image popularity).

    Returns one row per (url, image_id) reference with ``caption_ok`` and
    ``known_image`` flags.
    """
    refs = (results
            .filter(F.col("analysis").isNotNull())
            .select(F.col("url"),
                    F.explode(F.coalesce(
                        F.col("analysis.images"),
                        F.array().cast("array<struct<image_id:string,"
                                       "alt:string,src:string>>")))
                    .alias("ref"))
            .select("url", F.col("ref.image_id").alias("image_id"),
                    F.col("ref.alt").alias("alt")))
    return (refs.join(images.select("image_id", "caption"), "image_id",
                      "left")
            .select("url", "image_id", "alt",
                    F.col("caption").isNotNull().alias("known_image"),
                    (F.col("caption").isNotNull()
                     & (F.col("alt") == F.col("caption")))
                    .alias("caption_ok")))
