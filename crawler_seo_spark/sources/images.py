"""Image + caption table: codecs, perceptual hash, deterministic generator.

The authoritative input table shape (BASELINE.json ``input_hint``)::

    image_id: string, bytes: binary, w: int, h: int, fmt: string,
    caption: string, phash: long

Codecs
------
This container ships no image libraries (no PIL/libjpeg/libwebp), so:

* ``png``  — REAL minimal PNG (8-bit RGB, filter 0, zlib), encoder and
  decoder written against the public PNG spec. Lossless round-trip.
* ``jpeg``/``webp`` — STAND-IN LOSSY CODECS (clearly marked): deterministic
  quantization of the low 2 bits per channel plus the container magic bytes.
  This is NOT a real JPEG/WebP bitstream; it exists so the *Spark-side
  plumbing* (binary column, Arrow batches, PSNR validation ≥ 40 dB for lossy
  formats, phash checks) is real and testable. Swap ``encode_image`` /
  ``decode_image`` for Pillow calls on a real cluster — every call site goes
  through this module.

Quantizing to 4 levels-per-channel steps of 4 gives MSE ≈ (q²−1)/12 ≈ 1.25
→ PSNR ≈ 47 dB, comfortably over the 40 dB gate, with genuinely lossy
behavior (decoded ≠ original bytes).

The perceptual hash is a 64-bit average-hash (8×8 mean threshold over the
grayscale downsample) — standard public aHash construction.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

LOSSY_FORMATS = frozenset({"jpeg", "webp"})
_FAKE_MAGIC = {"jpeg": b"FJPG", "webp": b"FWEBP"}
_QUANT_STEP = 4  # stand-in lossy codec: round each channel to multiples of 4


# ---------------------------------------------------------------------------
# PNG (real, minimal: 8-bit RGB, no interlace, filter 0)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG byte string."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = b"".join(b"\x00" + pixels[row].tobytes() for row in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode a minimal RGB PNG produced by :func:`encode_png` (supports
    filter types 0-2, which covers our encoder's output)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w = 8, 0
    idat = b""
    h = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for row in range(h):
        ftype = raw[row * (stride + 1)]
        line = np.frombuffer(
            raw[row * (stride + 1) + 1:(row + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (int(line[i]) + int(line[i - 3])) & 0xFF
        elif ftype == 2:  # Up
            line = ((line.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[row] = line.reshape(w, 3)
        prev = line
    return out


# ---------------------------------------------------------------------------
# Stand-in lossy codec (jpeg/webp placeholders — see module docstring)
# ---------------------------------------------------------------------------

def _encode_fake_lossy(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    quant = (pixels.astype(np.uint16) // _QUANT_STEP * _QUANT_STEP).astype(np.uint8)
    quant = np.minimum(quant + _QUANT_STEP // 2, 255).astype(np.uint8)
    return (_FAKE_MAGIC[fmt] + struct.pack(">II", w, h)
            + zlib.compress(quant.tobytes(), 6))


def _decode_fake_lossy(data: bytes, fmt: str) -> np.ndarray:
    magic = _FAKE_MAGIC[fmt]
    assert data[:len(magic)] == magic, f"not a stand-in {fmt}"
    w, h = struct.unpack(">II", data[len(magic):len(magic) + 8])
    raw = zlib.decompress(data[len(magic) + 8:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Unified codec surface (the swap point for real image libraries)
# ---------------------------------------------------------------------------

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt in LOSSY_FORMATS:
        return _encode_fake_lossy(pixels, fmt)
    raise NotImplementedError(
        f"format {fmt!r}: real codecs unavailable in this container — "
        "plug Pillow/libvips here on a production cluster")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in LOSSY_FORMATS:
        return _decode_fake_lossy(data, fmt)
    raise NotImplementedError(
        f"format {fmt!r}: real codecs unavailable in this container — "
        "plug Pillow/libvips here on a production cluster")


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block means → mean threshold.

    Signed 64-bit (two's complement) so it fits a Spark ``LongType``.
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


# ---------------------------------------------------------------------------
# Deterministic generator (seed 42 by default; no external data)
# ---------------------------------------------------------------------------

_CAPTION_VOCAB = [
    "aerial", "amber", "ancient", "bright", "coastal", "crimson", "dappled",
    "dusty", "foggy", "gilded", "glassy", "jagged", "lunar", "mossy",
    "neon", "quiet", "rustic", "silver", "sunlit", "winding",
]
_CAPTION_NOUNS = [
    "archway", "bridge", "canyon", "harbor", "lantern", "market", "meadow",
    "orchard", "plaza", "ridge", "rooftop", "shoreline", "staircase",
    "terrace", "valley", "waterfall", "window", "workshop", "garden", "tower",
]
_FORMATS = ["png", "jpeg", "webp"]


def make_caption(i: int) -> str:
    """Seeded phrase, unique per image index."""
    a = _CAPTION_VOCAB[i % len(_CAPTION_VOCAB)]
    n = _CAPTION_NOUNS[(i // len(_CAPTION_VOCAB)) % len(_CAPTION_NOUNS)]
    b = _CAPTION_VOCAB[(i * 7 + 3) % len(_CAPTION_VOCAB)]
    return f"{a} {n} with {b} light #{i}"


def make_image_row(i: int, seed: int = 42, size_range: tuple[int, int] = (16, 48)
                   ) -> dict:
    """One deterministic image+caption row (pixels from a counter-seeded RNG,
    phash computed from the decoded pixels, never random)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    lo, hi = size_range
    w = int(rng.integers(lo, hi + 1))
    h = int(rng.integers(lo, hi + 1))
    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fmt = _FORMATS[i % len(_FORMATS)]
    data = encode_image(pixels, fmt)
    decoded = decode_image(data, fmt)
    return {
        "image_id": f"img-{i:010d}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": make_caption(i),
        "phash": ahash64(decoded),
    }


def reference_pixels(i: int, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Re-derive the pre-encode pixels for row *i* (oracle side of the
    decoded-pixel allclose / PSNR invariant)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    rw = int(rng.integers(16, 49))
    rh = int(rng.integers(16, 49))
    assert (rw, rh) == (w, h), "size mismatch — wrong seed or index"
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def generate_images(n: int, seed: int = 42) -> list[dict]:
    return [make_image_row(i, seed) for i in range(n)]
