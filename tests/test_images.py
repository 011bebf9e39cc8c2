"""Image payload invariants (BASELINE input_hint): decoded-pixel allclose
(PSNR ≥ 40 dB for lossy formats), caption equality, phash equality."""

import numpy as np

from crawler_seo_spark.sources.images import (
    ahash64,
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    generate_images,
    make_caption,
    psnr,
    reference_pixels,
)


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_lossy_psnr_gate():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    for fmt in ("jpeg", "webp"):
        out = decode_image(encode_image(px, fmt), fmt)
        assert out.shape == px.shape
        assert not np.array_equal(out, px), "stand-in codec must be lossy"
        assert psnr(px, out) >= 40.0


def test_generated_rows_validate():
    rows = generate_images(30)
    for i, row in enumerate(rows):
        ref = reference_pixels(i, row["w"], row["h"])
        dec = decode_image(row["bytes"], row["fmt"])
        assert dec.shape == (row["h"], row["w"], 3)
        if row["fmt"] == "png":
            assert np.array_equal(dec, ref)
        else:
            assert psnr(ref, dec) >= 40.0
        assert row["caption"] == make_caption(i)
        assert row["phash"] == ahash64(dec)
        assert -(1 << 63) <= row["phash"] < (1 << 63)


def test_determinism():
    a = generate_images(10)
    b = generate_images(10)
    for ra, rb in zip(a, b):
        assert ra["bytes"] == rb["bytes"]
        assert ra["phash"] == rb["phash"]


def test_unknown_format_raises():
    import pytest
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((4, 4, 3), dtype=np.uint8), "avif")
