"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md §2.B north-star additions;
reference pipelines caption/embed such payloads via the Stage API,
e.g. /root/reference/examples/simple_vlm_inference.py:55-61).

The decode kernels (PIL/ffmpeg/torchaudio) are NOT in this container,
so the default decode accepts the deterministic fake format
(``fake_image``/``fake_audio``), auto-upgrades to PIL when importable,
and raises ``NotImplementedError`` otherwise. The kernel is a
pluggable seam: ``set_image_decoder`` registers a replacement that
every image operator captures at plan-build time — no operator edits
when a deployment brings its own codec. Everything Spark-side —
schema, batching, partition flow, UDF signatures — is real and tested.

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

    Accepts the deterministic fake format; for anything else, tries
    PIL if importable (grayscale-converted real decode — zero code
    change the day the container gains it) and otherwise raises.
    """
    if payload[: len(_MAGIC)] == _MAGIC:
        w, h = struct.unpack("<II", payload[len(_MAGIC) : len(_MAGIC) + 8])
        pixels = payload[len(_MAGIC) + 8 :]
        return w, h, pixels
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg — not available in "
            "this environment; payload is not a FAKEIMG1 test image"
        ) from None
    im = Image.open(io.BytesIO(payload)).convert("L")
    return im.width, im.height, im.tobytes()


# Pluggable decode seam: queries capture the CURRENT decoder at plan-
# build time (driver side) so the callable ships to executors inside
# the UDF closure — a deployment with its own codec registers it once
# and every multimodal operator picks it up, no operator edits.
_image_decoder = decode_image_stub


def set_image_decoder(fn) -> None:
    """Register a replacement ``payload -> (width, height, pixels)``
    decode kernel (must be serializable — a top-level function)."""
    global _image_decoder
    _image_decoder = fn


def get_image_decoder():
    return _image_decoder


IMAGE_META_SCHEMA = (
    "id long, width long, height long, n_bytes long, content_sha256 string"
)


def extract_image_metadata(df: DataFrame, id_col: str = "id", image_col: str = "image") -> DataFrame:
    """Decode-and-describe: (id, width, height, n_bytes, sha256).

    The canonical multimodal map stage — Arrow-batched, binary column
    in, typed metadata out.
    """
    decode = get_image_decoder()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[image_col]):
                w, h, _ = decode(bytes(payload))
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
    decode = get_image_decoder()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_imgs = [], []
            for i, payload in zip(pdf[id_col], pdf[image_col]):
                w, h, pixels = decode(bytes(payload))
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

# --- audio ------------------------------------------------------------------
# Same stub discipline as images: a deterministic fake payload carries a
# real header (magic + sample rate + sample count) and pseudo-PCM bytes;
# decode raises on anything that isn't the fake format (no libsndfile /
# torchaudio in this container). The Spark-side plumbing — binary column,
# Arrow batching, typed metadata extraction, windowed energy — is real.

_AUDIO_MAGIC = b"FAKEAUD1"


def fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """Deterministic stand-in audio payload: header + pseudo-PCM (u8)."""
    body = hashlib.sha256(f"{sample_rate}:{n_samples}:{seed}".encode()).digest()
    pcm = (body * (n_samples // len(body) + 1))[:n_samples]
    return _AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm


def decode_audio_stub(payload: bytes) -> tuple[int, int, bytes]:
    """'Decode' audio -> (sample_rate, n_samples, pcm bytes)."""
    if payload[: len(_AUDIO_MAGIC)] != _AUDIO_MAGIC:
        raise NotImplementedError(
            "real audio decoding requires libsndfile/ffmpeg — not available "
            "in this environment; payload is not a FAKEAUD1 test clip"
        )
    sr, n = struct.unpack("<II", payload[len(_AUDIO_MAGIC) : len(_AUDIO_MAGIC) + 8])
    return sr, n, payload[len(_AUDIO_MAGIC) + 8 :]


AUDIO_META_SCHEMA = (
    "id long, sample_rate long, n_samples long, duration_s double, "
    "mean_amp double, peak_amp long"
)


def extract_audio_metadata(
    df: DataFrame, id_col: str = "id", audio_col: str = "audio"
) -> DataFrame:
    """Decode-and-describe for audio: duration + amplitude stats.

    Amplitude stats are numpy-vectorized over the PCM buffer (never a
    per-sample Python loop); integer mean (sum/len in exact int then
    one double division) keeps the value engine-reproducible.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[audio_col]):
                sr, n, pcm = decode_audio_stub(bytes(payload))
                arr = np.frombuffer(pcm, dtype=np.uint8)
                rows.append(
                    (
                        i,
                        sr,
                        n,
                        n / sr,
                        float(int(arr.sum(dtype=np.int64))) / n if n else 0.0,
                        int(arr.max()) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "sample_rate", "n_samples", "duration_s",
                    "mean_amp", "peak_amp",
                ],
            )

    return df.mapInPandas(fn, schema=AUDIO_META_SCHEMA)


def audio_window_energy(
    df: DataFrame, window_samples: int, id_col: str = "id", audio_col: str = "audio"
) -> DataFrame:
    """Windowed energy fan-out: one row per fixed-size PCM window —
    (id, win_idx, n_in_win, energy). The audio analogue of video frame
    sampling: executor-side row multiplication, numpy-vectorized sums."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, energies = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[audio_col]):
                _, n, pcm = decode_audio_stub(bytes(payload))
                arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64)
                for w in range(0, n, window_samples):
                    chunk = arr[w : w + window_samples]
                    ids.append(i)
                    idxs.append(w // window_samples)
                    ns.append(len(chunk))
                    energies.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {"id": ids, "win_idx": idxs, "n_in_win": ns, "energy": energies}
            )

    return df.mapInPandas(
        fn, schema="id long, win_idx long, n_in_win long, energy long"
    )


def attach_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test/demo ingestion: sample_rate = 8000, n_samples = (id % 50 + 10)
    * 100, seeded by id. Output (id, audio)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            clips = [fake_audio(8000, (i % 50 + 10) * 100, seed=i) for i in ids]
            yield pd.DataFrame({"id": ids, "audio": clips})

    from cosmos_xenna_spark.operators.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(fn, schema="id long, audio binary")


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
