"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

Decode is REAL for uncompressed public container formats — binary PPM (P6)
and 24-bit BMP images, 16-bit PCM WAV audio — via the pure-numpy codecs in
``media_codecs`` (this container ships numpy; no media library needed), and
the extracted embedding for those is content-real (grid grayscale means /
windowed RMS energy), so near-duplicate media actually cluster in the ANN
operators. COMPRESSED formats (JPEG/PNG/MP3/...) stay library-gated in
``_decode_real`` (real-library-first, NotImplementedError fallback), and a
deterministic FAKE container exercises the video frame-sampling path.
Everything Spark-side — schema contract, partitioning, UDF signatures, batch
shapes, feature output feeding the ANN operators — is identical across the
three paths and tested.

Schema contract for a media table:

    media:  media_id long, kind string ('image'|'audio'|'video'),
            payload binary, meta struct<mime:string, width:int, height:int,
                                        sample_rate:int, n_frames:int>

Fake container format (deterministic test payloads, produced by
``fake_payload``):  b"FAKE" + kind[0] + width(u16) + height(u16) +
n_frames(u16) + sample_rate(u32) + body bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURES_DDL = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, n_bytes long, content_sha string, embedding array<float>"
)

_MAGIC = b"FAKE"
EMBED_DIM = 16


def fake_payload(kind: str, width: int = 0, height: int = 0, n_frames: int = 1,
                 sample_rate: int = 0, body: bytes = b"") -> bytes:
    return (
        _MAGIC + kind[:1].encode()
        + struct.pack(">HHHI", width, height, n_frames, sample_rate)
        + body
    )


def _parse_fake_header(b: bytes) -> dict | None:
    if b is None or len(b) < 15 or b[:4] != _MAGIC:
        return None
    width, height, n_frames, sample_rate = struct.unpack(">HHHI", b[5:15])
    return {
        "kind": chr(b[4]),
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "body": b[15:],
    }


def _deterministic_embedding(body: bytes) -> np.ndarray:
    """Stand-in feature extractor: md5-seeded unit vector — pure function of
    the bytes, so replays/partitionings produce identical features."""
    seed = int.from_bytes(hashlib.md5(body).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(EMBED_DIM).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def _decode_uncompressed(payload: bytes) -> dict | None:
    """Pure-numpy decode of the uncompressed public formats (PPM/BMP/WAV,
    media_codecs) → header dict + a CONTENT-REAL embedding; None when the
    payload is none of them."""
    from . import media_codecs as MC

    img = MC.decode_ppm(payload)
    if img is None:
        img = MC.decode_bmp(payload)
    if img is not None:
        h, w = img.shape[:2]
        return {
            "width": int(w), "height": int(h), "n_frames": 1,
            "sample_rate": 0,
            "embedding": MC.image_grid_embedding(img, grid=4),
        }
    wav = MC.decode_wav(payload)
    if wav is not None:
        samples, rate = wav
        return {
            "width": 0, "height": 0, "n_frames": int(samples.shape[0]),
            "sample_rate": int(rate),
            "embedding": MC.audio_energy_embedding(samples, n_bins=EMBED_DIM),
        }
    return None


def _decode_real(payload: bytes, kind: str):  # pragma: no cover - no libs here
    if kind == "image":
        try:
            import io

            from PIL import Image  # noqa
        except ImportError as e:
            raise NotImplementedError(
                "compressed image decode requires Pillow (not in this "
                "container); PPM/BMP decode without it via media_codecs"
            ) from e
        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height}
    raise NotImplementedError(f"real decode for kind={kind} not available")


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: per Arrow batch, parse headers,
    hash content, compute the (stubbed) embedding. One output row per input
    row; batch shape preserved — the pattern scales by input partitioning
    (repartition upstream by media_id for balance, no shuffle needed here)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                hdr = _parse_fake_header(b)
                if hdr is None:
                    hdr = _decode_uncompressed(b)  # real numpy decode path
                if hdr is None:
                    try:
                        hdr = {**_decode_real(b, kind), "n_frames": 1,
                               "sample_rate": 0, "body": b}
                    except NotImplementedError:
                        hdr = {"width": 0, "height": 0, "n_frames": 0,
                               "sample_rate": 0, "body": b}
                emb = hdr.get("embedding")
                if emb is None:
                    emb = _deterministic_embedding(hdr.get("body", b))
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": hdr.get("width", 0),
                        "height": hdr.get("height", 0),
                        "n_frames": hdr.get("n_frames", 0),
                        "sample_rate": hdr.get("sample_rate", 0),
                        "n_bytes": len(b),
                        "content_sha": hashlib.sha1(b).hexdigest(),
                        "embedding": emb,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, FEATURES_DDL)


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stage for video payloads: splits the body into n_frames
    equal chunks, keeps every nth, emits one row per sampled frame (1:N
    mapInPandas — the row-explosion shape). Decode of the frame bytes is the
    stubbed part; the chunking/explosion plumbing is real."""
    out_ddl = "media_id long, frame_idx int, frame_sha string, frame_bytes long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                hdr = _parse_fake_header(b)
                if hdr is None or hdr["n_frames"] <= 0:
                    continue
                body, n = hdr["body"], hdr["n_frames"]
                size = max(1, len(body) // n)
                for i in range(0, n, every_nth):
                    chunk = body[i * size:(i + 1) * size]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_sha": hashlib.sha1(chunk).hexdigest(),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha", "frame_bytes"]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(gen, out_ddl)
