"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md §2.B north-star additions;
reference pipelines caption/embed such payloads via the Stage API,
e.g. /root/reference/examples/simple_vlm_inference.py:55-61).

The decode kernels (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode step is stubbed: ``decode_image_stub`` raises
``NotImplementedError`` unless given the deterministic fake header, and
``fake_image``/``fake_audio`` produce deterministic payloads for tests.
Everything Spark-side — schema, batching, partition flow, UDF
signatures — is real and tested; swapping the stub body for a PIL/
ffmpeg call is a one-function change on the executors.

Design for 100 TB: payloads never hit the driver; feature extraction is
``mapInPandas`` (Arrow zero-copy for binary), frame sampling fans out
rows executor-side, and metadata-only queries (width/height filters)
read the typed columns without touching bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAGIC = b"FAKEIMG1"


def fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic stand-in payload: header + pseudo-pixel bytes."""
    body = hashlib.sha256(f"{width}x{height}:{seed}".encode()).digest()
    n = width * height
    pixels = (body * (n // len(body) + 1))[:n]
    return _MAGIC + struct.pack("<II", width, height) + pixels


def decode_image_stub(payload: bytes) -> tuple[int, int, bytes]:
    """'Decode' an image payload -> (width, height, pixels).

    Real decode (PIL.Image.open) is unavailable in this container; only
    the deterministic fake format is accepted.
    """
    if payload[: len(_MAGIC)] != _MAGIC:
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg — not available in "
            "this environment; payload is not a FAKEIMG1 test image"
        )
    w, h = struct.unpack("<II", payload[len(_MAGIC) : len(_MAGIC) + 8])
    pixels = payload[len(_MAGIC) + 8 :]
    return w, h, pixels


IMAGE_META_SCHEMA = (
    "id long, width long, height long, n_bytes long, content_sha256 string"
)


def extract_image_metadata(df: DataFrame, id_col: str = "id", image_col: str = "image") -> DataFrame:
    """Decode-and-describe: (id, width, height, n_bytes, sha256).

    The canonical multimodal map stage — Arrow-batched, binary column
    in, typed metadata out.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[image_col]):
                w, h, _ = decode_image_stub(bytes(payload))
                rows.append(
                    (
                        i,
                        w,
                        h,
                        len(payload),
                        hashlib.sha256(bytes(payload)).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "n_bytes", "content_sha256"]
            )

    return df.mapInPandas(fn, schema=IMAGE_META_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "id", image_col: str = "image"
) -> DataFrame:
    """Resize stage: nearest-neighbor over the fake pixel grid (a real
    deployment swaps the kernel; the batching/schema contract is the
    operator)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_imgs = [], []
            for i, payload in zip(pdf[id_col], pdf[image_col]):
                w, h, pixels = decode_image_stub(bytes(payload))
                # numpy fancy-indexing: one gather per image, no Python
                # pixel loop (per-pixel loops are catastrophic on real
                # frames even inside mapInPandas).
                grid = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w)
                sy = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
                sx = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
                resized = grid[sy][:, sx].tobytes()
                out_ids.append(i)
                out_imgs.append(_MAGIC + struct.pack("<II", target_w, target_h) + resized)
            yield pd.DataFrame({"id": out_ids, "image": out_imgs})

    return df.mapInPandas(fn, schema="id long, image binary")


def sample_video_frames(
    df: DataFrame, every_n: int, id_col: str = "id", frames_col: str = "frames"
) -> DataFrame:
    """Frame-sampling fan-out: one row per kept frame.

    Input: (id, frames array<binary>); output: (id, frame_idx, frame).
    Executor-side explode — row counts multiply without driver traffic.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, fr in zip(pdf[id_col], pdf[frames_col]):
                for j, frame in enumerate(fr):
                    if j % every_n == 0:
                        ids.append(i)
                        idxs.append(j)
                        frames.append(bytes(frame))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(fn, schema="id long, frame_idx long, frame binary")

def attach_fake_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test/demo ingestion: derive a deterministic fake image per row —
    width = id % 16 + 4, height = id % 8 + 4, seeded by id. Output
    (id, image). Stands in for a binaryFile scan in environments
    without real payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            imgs = [fake_image(i % 16 + 4, i % 8 + 4, seed=i) for i in ids]
            yield pd.DataFrame({"id": ids, "image": imgs})

    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    # payload synthesis multiplies bytes ~100x: spread a small id scan
    # across cores first (no-op when the scan already has splits)
    return ensure_parallelism(df).mapInPandas(fn, schema="id long, image binary")


def attach_fake_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test/demo ingestion: id % 5 + 1 fake frames per row. Output
    (id, frames array<binary>)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            frames = [
                [fake_image(4, 4, seed=i * 100 + j) for j in range(i % 5 + 1)]
                for i in ids
            ]
            yield pd.DataFrame({"id": ids, "frames": frames})

    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(fn, schema="id long, frames array<binary>")
