"""Minimal pure-numpy YUV4MPEG2 (.y4m) video codec.

Y4M is ffmpeg's standard uncompressed interchange container: an ASCII
header ``YUV4MPEG2 W<w> H<h> F<num>:<den> ...`` then, per frame, the
ASCII marker ``FRAME`` (+ optional params) ``\\n`` followed by raw
planar YUV.  Like the PNG (functions/images.py) and WAV
(functions/audio.py) codecs, this gives the multimodal pipeline a REAL
end-to-end decode path in an environment without ffmpeg/pyav — a
deployment swaps this module for a libav binding without touching the
Spark plumbing (datapipe/multimodal.py).

Supported colourspaces: C420 (default, BT.601 chroma subsampled 2x2)
and C444.  Reference for the parity target: the reference crawler
captures video payloads opaquely (capture.go WARC sink); frame
sampling itself is a training-data-pipeline addition per the graft
brief.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 full-swing YCbCr -> RGB, uint8 (h, w, 3)."""
    yf = y.astype(np.float64)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _rgb_to_yuv(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BT.601 full-swing RGB -> (Y, U, V) uint8 planes (no subsampling)."""
    rf = rgb[..., 0].astype(np.float64)
    gf = rgb[..., 1].astype(np.float64)
    bf = rgb[..., 2].astype(np.float64)
    y = 0.299 * rf + 0.587 * gf + 0.114 * bf
    u = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
    v = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
    to8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(u), to8(v)


def parse_y4m_header(data: bytes) -> tuple[int, int, float, str, int]:
    """-> (width, height, fps, colourspace, header_end_offset)."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = None
    fps = 30.0
    cs = "C420"
    for tok in data[len(_MAGIC):nl].split():
        t = tok.decode("ascii", "replace")
        # malformed tokens (non-numeric dims, F30:0, bad ratios) must
        # surface as ValueError — the crawl/datapipe tiers treat
        # ValueError as "corrupt payload" (fetch.py's 422 discipline);
        # a raw int()/ZeroDivisionError would crash the Spark task
        try:
            if t.startswith("W"):
                w = int(t[1:])
            elif t.startswith("H"):
                h = int(t[1:])
            elif t.startswith("F"):
                num, den = t[1:].split(":")
                if int(den) == 0:
                    raise ValueError("zero fps denominator")
                fps = int(num) / int(den)
            elif t.startswith("C"):
                cs = t
        except ValueError as exc:
            raise ValueError(f"malformed y4m header token {t!r}") from exc
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("y4m header missing/invalid W/H")
    if not (cs.startswith("C420") or cs == "C444"):
        raise ValueError(f"unsupported y4m colourspace {cs}")
    return w, h, fps, cs, nl + 1


def iter_y4m_frames(data: bytes):
    """Yield (frame_idx, rgb uint8 (h, w, 3)) for every frame."""
    w, h, _fps, cs, off = parse_y4m_header(data)
    if cs == "C444":
        ylen = ulen = w * h
        uw, uh = w, h
    else:  # C420*
        ylen = w * h
        uw, uh = w // 2, h // 2
        ulen = uw * uh
    frame_size = ylen + 2 * ulen
    idx = 0
    n = len(data)
    while off < n:
        nl = data.index(b"\n", off)
        if not data[off:nl].startswith(b"FRAME"):
            raise ValueError(f"bad frame marker at offset {off}")
        off = nl + 1
        if off + frame_size > n:
            raise ValueError("truncated y4m frame")
        y = np.frombuffer(data, np.uint8, ylen, off).reshape(h, w)
        u = np.frombuffer(data, np.uint8, ulen, off + ylen).reshape(uh, uw)
        v = np.frombuffer(data, np.uint8, ulen, off + ylen + ulen).reshape(uh, uw)
        if cs != "C444":  # upsample 2x2 chroma
            u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
            v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
        yield idx, _yuv_to_rgb(y, u, v)
        idx += 1
        off += frame_size


def video_info(data: bytes) -> tuple[int, int, float, int]:
    """-> (width, height, fps, n_frames) without materializing pixels."""
    w, h, fps, cs, off = parse_y4m_header(data)
    if cs == "C444":
        frame_size = 3 * w * h
    else:
        frame_size = w * h + 2 * ((w // 2) * (h // 2))
    n = 0
    total = len(data)
    while off < total:
        nl = data.index(b"\n", off)
        off = nl + 1 + frame_size
        n += 1
    return w, h, fps, n


def encode_y4m(
    frames: list[np.ndarray], fps: int = 30, colourspace: str = "C444"
) -> bytes:
    """RGB uint8 frames (h, w, 3) -> .y4m bytes.  C444 is lossless in
    chroma (fixture/test use); C420 matches what cameras ship."""
    h, w = frames[0].shape[:2]
    out = [
        b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 %s\n"
        % (w, h, fps, colourspace.encode())
    ]
    for f in frames:
        y, u, v = _rgb_to_yuv(f)
        if colourspace == "C444":
            planes = (y, u, v)
        else:  # C420: average 2x2 blocks
            sub = lambda p: (  # noqa: E731
                p.astype(np.float64)
                .reshape(h // 2, 2, w // 2, 2)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
            planes = (y, sub(u), sub(v))
        out.append(b"FRAME\n")
        out.extend(p.tobytes() for p in planes)
    return b"".join(out)
