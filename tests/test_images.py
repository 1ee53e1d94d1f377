"""Image codec + per-row content invariant (BASELINE.json input_hint:
decoded-pixel exact for lossless, PSNR>=40dB for the (stub) lossy codec,
caption byte-equality)."""

from __future__ import annotations

import numpy as np

from zeno_spark.fixtures import caption_for, dims_for
from zeno_spark.functions.images import (
    decode_image,
    decode_png,
    encode_fake_jpeg,
    encode_png,
    generate_pixels,
    phash64,
    psnr,
)


def test_png_roundtrip_exact():
    px = generate_pixels(12345, 33, 21)
    assert px.shape == (21, 33, 3)
    out = decode_png(encode_png(px))
    assert (out == px).all()


def test_fake_jpeg_psnr_above_40db():
    px = generate_pixels(777, 64, 48)
    decoded = decode_image(encode_fake_jpeg(px), "jpeg")
    assert psnr(px, decoded) >= 40.0
    assert np.allclose(px, decoded, atol=3)  # quantization step 4


def test_determinism_pure_function_of_seed():
    a = generate_pixels(42, 20, 20)
    b = generate_pixels(42, 20, 20)
    c = generate_pixels(43, 20, 20)
    assert (a == b).all()
    assert (a != c).any()
    assert phash64(a) == phash64(b)
    assert caption_for("img-7") == caption_for("img-7")
    assert dims_for("img-7") == dims_for("img-7")


def test_phash_signed64_range():
    v = phash64(generate_pixels(9, 32, 32))
    assert -(1 << 63) <= v < (1 << 63)
