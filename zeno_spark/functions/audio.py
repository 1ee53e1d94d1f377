"""Pure-stdlib WAV (RIFF PCM) codec — the audio analogue of the numpy
PNG codec in functions/images.py: real decode for the one container the
standard library can parse (wave module + struct), so the audio feature
path runs end-to-end in-sandbox; compressed formats stay behind the
gated stub in datapipe/multimodal.py.

decode_wav returns float64 samples in [-1, 1], shape (n_frames,
n_channels); encode_wav writes 16-bit PCM.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_WIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> (samples float64 [-1,1] of shape (frames, channels), rate).

    Malformed containers raise ValueError (never wave.Error/EOFError/
    ZeroDivisionError): the datapipe operators and the fetch verify
    tier key "corrupt payload, skip/422" on ValueError, and anything
    else would crash the Spark task instead."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, OSError, RuntimeError, struct.error) as exc:
        # stdlib wave leaks more than wave.Error on crafted headers:
        # hypothesis found a RIFF prefix that raises bare RuntimeError
        # (wave.py initfp), and chunk/struct can raise EOFError/
        # struct.error on truncated sizes
        raise ValueError(f"malformed WAV container: {exc}") from exc
    if n_ch <= 0 or rate <= 0:
        raise ValueError(f"invalid WAV params: channels={n_ch} rate={rate}")
    if width == 3:  # 24-bit: widen to int32 (stdlib gives raw bytes)
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        samples = ints.astype(np.float64) / float(1 << 23)
    elif width in _WIDTH_DTYPE:
        ints = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width])
        if width == 1:  # 8-bit WAV is unsigned, midpoint 128
            samples = (ints.astype(np.float64) - 128.0) / 128.0
        else:
            samples = ints.astype(np.float64) / float(1 << (8 * width - 1))
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    return samples.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float [-1,1] (frames,) or (frames, channels) -> 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    ints = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(ints.tobytes())
    return buf.getvalue()
