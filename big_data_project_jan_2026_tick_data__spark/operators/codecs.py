"""Pure-numpy media codecs for the multimodal pipeline.

The container has no PIL/librosa/av, but that only rules out the *exotic*
formats: binary P6 PPM (images), RIFF/WAVE PCM16 (audio) and a
length-prefixed concatenation of PPM frames (video) are fully specified
byte formats parseable with ``struct``/numpy alone. These decoders are
REAL — they parse headers, validate magic numbers, and reconstruct pixel
/ sample arrays — so the multimodal operators exercise an honest
decode→featurize path end to end. Formats outside this set still raise,
exactly where PIL/librosa/av would be invoked in a full deployment.

Encoders exist so the synthetic test corpus is generated in the same
formats the decoders parse (round-trip-tested).
"""

from __future__ import annotations

import struct

import numpy as np


# -- P6 PPM (binary RGB) ------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 PPM bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("P6 PPM requires 3 channels")
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → (H, W, 3) uint8. Parses the real format:
    magic, ASCII dimensions/maxval with whitespace/comment handling,
    then raw big-endian RGB samples."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: three ASCII ints after the magic, comments
    # (# ... \n) allowed anywhere in the header per the spec
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index sampling — the numpy
    equivalent of PIL's NEAREST resample."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[rows][:, cols]


# -- RIFF/WAVE PCM16 ----------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """mono int16 samples → RIFF/WAVE PCM bytes (fmt + data chunks)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_len = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data_chunk


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → (mono float64 samples in [-1, 1),
    sample_rate). Walks the real chunk structure — fmt before data,
    unknown chunks skipped by their declared size."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    sample_rate = None
    bits = None
    channels = None
    samples = None
    while i + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, i)
        i += 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, i
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=i)
        i += size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples.astype(np.float64) / 32768.0, sample_rate


# -- length-prefixed PPM frame sequence (toy video container) -----------------


def encode_ppmseq(frames: list[np.ndarray]) -> bytes:
    """Concatenate PPM frames, each preceded by a u32 byte length — a
    minimal self-describing video container the demuxer below walks."""
    out = [struct.pack("<4sI", b"PSEQ", len(frames))]
    for f in frames:
        blob = encode_ppm(f)
        out.append(struct.pack("<I", len(blob)))
        out.append(blob)
    return b"".join(out)


def demux_ppmseq(payload: bytes) -> list[bytes]:
    """PSEQ bytes → list of per-frame PPM blobs (no pixel decode — the
    demux/decode split real containers have)."""
    if payload[:4] != b"PSEQ":
        raise ValueError("not a PSEQ payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames = []
    i = 8
    for _ in range(n):
        (size,) = struct.unpack_from("<I", payload, i)
        i += 4
        frames.append(payload[i : i + size])
        i += size
    return frames
