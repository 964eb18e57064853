"""Pure-numpy media codecs for UNCOMPRESSED public container formats.

These make the multimodal decode stage REAL (not stubbed) wherever the
format needs no compression library: binary PPM (P6) and 24-bit
uncompressed BMP for images, 16-bit PCM WAV for audio — all fully
specified public formats decodable with struct + numpy, which this
container ships. Compressed formats (JPEG/PNG/MP3/...) remain
library-gated in multimodal._decode_real: real-library-first, and the
plumbing is identical either way.

Everything here is a pure function of the payload bytes — replays and
re-partitionings produce identical features (the same determinism contract
as the engine's replay path).

Reference analogue: the reference decodes opaque Oracle column payloads
into typed values inside the Builder (src/builder/Builder.cpp:168-580);
here the opaque payload is a media container and the typed value is a
pixel/sample array plus features.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- PPM


def decode_ppm(b: bytes) -> np.ndarray | None:
    """Binary PPM (P6): header ``P6 <w> <h> <maxval>`` (whitespace/comment
    separated) then w*h*3 raw RGB bytes. Returns (h, w, 3) uint8 or None if
    ``b`` is not a P6 stream."""
    if not b.startswith(b"P6"):
        return None
    # tokenize the header: three ints after the magic, '#' starts a comment
    vals: list[int] = []
    i = 2
    while len(vals) < 3 and i < len(b):
        c = b[i:i + 1]
        if c == b"#":
            i = b.find(b"\n", i)
            if i < 0:
                return None
            i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(b) and b[j:j + 1].isdigit():
                j += 1
            vals.append(int(b[i:j]))
            i = j
        else:
            return None
    if len(vals) < 3 or i >= len(b) or not b[i:i + 1].isspace():
        return None
    w, h, maxval = vals
    if w <= 0 or h <= 0 or maxval != 255:
        return None
    start = i + 1  # exactly ONE whitespace byte after maxval per the spec
    need = w * h * 3
    if len(b) - start < need:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=need, offset=start).reshape(
        h, w, 3
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → P6 bytes (test fixtures + round-trip checks)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


# --------------------------------------------------------------------- BMP


def decode_bmp(b: bytes) -> np.ndarray | None:
    """24-bit uncompressed (BI_RGB) BITMAPINFOHEADER BMP → (h, w, 3) uint8
    RGB (BMP stores BGR, bottom-up when height > 0). None for any other BMP
    flavor — compressed/paletted BMPs are out of scope by design."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        return None
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(b) - data_off < stride * h:
        return None
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes (test fixtures)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    raw = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raw), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835,
                      2835, 0, 0)
    return header + dib + raw


# --------------------------------------------------------------------- WAV


def decode_wav(b: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAVE with 16-bit PCM (format tag 1): returns (samples, rate)
    where samples is (n, channels) int16. None for non-PCM encodings."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, rate, channels, bits, data = 12, None, None, None, None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        (size,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8:i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if tag != 1:
                return None
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None or bits != 16 or not channels:
        return None
    n = len(data) // (2 * channels)
    samples = np.frombuffer(data, dtype="<i2", count=n * channels).reshape(
        n, channels
    )
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 → 16-bit PCM WAV bytes (test fixtures)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ----------------------------------------------------------------- kernels


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize by index gather — the vectorized per-batch
    image kernel (one fancy-index per image, no Python pixel loop)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def image_grid_embedding(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Content-real image feature: grayscale mean over a grid×grid cell
    partition (resize-to-grid-multiple then block mean), L2-normalized
    float32[grid²]. Deterministic, vectorized, and actually discriminative —
    near-duplicate images land near each other in the ANN operators."""
    gray = resize_nearest(img, grid * 8, grid * 8).astype(np.float64).mean(
        axis=2
    )
    cells = gray.reshape(grid, 8, grid, 8).mean(axis=(1, 3)).ravel()
    v = cells.astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def audio_energy_embedding(
    samples: np.ndarray, n_bins: int = 16
) -> np.ndarray:
    """Content-real audio feature: RMS energy over n_bins equal time
    windows (mono mix first), L2-normalized float32[n_bins]."""
    mono = samples.astype(np.float64).mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(n_bins, dtype=np.float32)
    edges = (np.arange(n_bins + 1) * n) // n_bins
    rms = np.array([
        np.sqrt(np.mean(np.square(mono[edges[i]:max(edges[i + 1], edges[i] + 1)])))
        for i in range(n_bins)
    ])
    v = rms.astype(np.float32)
    norm = float(np.linalg.norm(v))
    return v / norm if norm else v
