"""Deterministic image codec + perceptual hash for the image+caption corpus.

BASELINE.json input_hint requires binary image payloads with a
decoded-pixel invariant (exact for lossless, PSNR>=40dB for lossy).
This container has no image libraries (no PIL/opencv/libjpeg), so:

* ``png``  — a REAL minimal PNG codec (8-bit RGB, filter 0, one IDAT),
  pure numpy+zlib, lossless round-trip.  Standard PNG: any external
  decoder can read our bytes.
* ``jpeg`` — STUB LOSSY CODEC: real JPEG entropy coding is out of scope
  without libjpeg, so "jpeg" rows carry PNG-encoded pixels quantized to
  multiples of 4 (max per-channel error 3 => PSNR ~= 43dB > 40dB, inside
  the input_hint tolerance).  The Spark-side plumbing (binary column,
  batch decode inside mapInPandas/applyInPandas, PSNR check) is real and
  tested; only the entropy-coding step is faked.  Marked here and in
  fixtures.py.

phash: 64-bit average-hash — downsample decoded pixels to 8x8 grayscale,
threshold at the mean, pack 64 bits.  Deterministic, pure numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) -> PNG bytes (filter type 0 per scanline)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3)")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes (as produced by encode_png: RGB8, filter 0) -> (h, w, 3)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError("decoder supports RGB8 only")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters = raw[:, 0]
    if (filters != 0).any():
        raise NotImplementedError("decoder supports filter 0 only")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """STUB lossy codec (see module docstring): quantize channels to
    multiples of 4, PNG-encode.  PSNR(original, decoded) ~= 43dB."""
    quantized = (pixels.astype(np.uint16) // 4 * 4).astype(np.uint8)
    return encode_png(quantized)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Route by fmt — both sandbox formats decode through the PNG path
    (the corpus's "jpeg" is the PNG-framed encode_fake_jpeg construct,
    FIXTURES.md §1); a GENUINE JPEG byte stream (SOI marker) is the
    libjpeg dispatch slot, raised as NotImplementedError so the verify
    tier captures it unverified instead of misclassifying it as a
    corrupt payload (ValueError)."""
    if fmt == "jpeg" and data[:2] == b"\xff\xd8":
        raise NotImplementedError("real JPEG decode needs libjpeg")
    if fmt in ("png", "jpeg"):
        return decode_png(data)
    raise NotImplementedError(f"unsupported fmt {fmt!r}")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_fake_jpeg(pixels)
    raise NotImplementedError(f"unsupported fmt {fmt!r}")


def generate_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB image, pure function of (seed, w, h): a seeded
    gradient + PCG64 noise (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash of decoded pixels -> signed int64 (fits the
    `phash:int64` column of BASELINE.json input_hint)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h // 8, np.minimum((np.arange(8) + 1) * h // 8, h))
    xs = (np.arange(8) * w // 8, np.minimum((np.arange(8) + 1) * w // 8, w))
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            block = gray[ys[0][i] : max(ys[1][i], ys[0][i] + 1),
                         xs[0][j] : max(xs[1][j], xs[0][j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
