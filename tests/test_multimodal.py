"""Byte-level multimodal operator tests (the registry queries check the
typed-metadata arithmetic; these check the payloads themselves)."""

from __future__ import annotations

import pytest

from cosmos_xenna_spark.operators.multimodal import (
    attach_fake_images,
    decode_image_stub,
    extract_image_metadata,
    fake_image,
    resize_images,
)


def test_decode_roundtrip():
    img = fake_image(12, 7, seed=3)
    w, h, pixels = decode_image_stub(img)
    assert (w, h, len(pixels)) == (12, 7, 84)


def test_decode_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_resize_distributed(spark, sf_dir):
    from cosmos_xenna_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(20)
    resized = resize_images(attach_fake_images(docs), target_w=6, target_h=5)
    meta = extract_image_metadata(resized)
    rows = meta.collect()
    assert len(rows) == 20
    assert all(r.width == 6 and r.height == 5 and r.n_bytes == 16 + 30 for r in rows)


def test_resize_identity_preserves_pixels():
    img = fake_image(9, 4, seed=1)
    w, h, pixels = decode_image_stub(img)
    # nearest-neighbor at the same size must be the identity mapping
    sx = [min(int(x * w / w), w - 1) for x in range(w)]
    assert sx == list(range(w))


def test_audio_decode_roundtrip():
    from cosmos_xenna_spark.operators.multimodal import decode_audio_stub, fake_audio

    payload = fake_audio(16000, 3200, seed=9)
    sr, n, pcm = decode_audio_stub(payload)
    assert (sr, n) == (16000, 3200)
    assert len(pcm) == 3200


def test_audio_decode_rejects_real_formats():
    import pytest

    from cosmos_xenna_spark.operators.multimodal import decode_audio_stub

    with pytest.raises(NotImplementedError):
        decode_audio_stub(b"RIFF....WAVEfmt ")  # real WAV header


def test_audio_metadata_and_windows(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.multimodal import (
        attach_fake_audio,
        audio_window_energy,
        decode_audio_stub,
        extract_audio_metadata,
        fake_audio,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(20)
    meta = extract_audio_metadata(attach_fake_audio(docs)).collect()
    assert len(meta) == 20
    for r in meta:
        expect_n = (r.id % 50 + 10) * 100
        assert r.sample_rate == 8000 and r.n_samples == expect_n
        assert abs(r.duration_s - expect_n / 8000) < 1e-12
        # recompute amplitude stats locally from the same deterministic payload
        _, _, pcm = decode_audio_stub(fake_audio(8000, expect_n, seed=r.id))
        arr = np.frombuffer(pcm, dtype=np.uint8)
        assert r.peak_amp == int(arr.max())
        assert abs(r.mean_amp - int(arr.sum(dtype=np.int64)) / expect_n) < 1e-12

    wins = audio_window_energy(attach_fake_audio(docs), window_samples=1500)
    agg = wins.groupBy("id").agg(
        F.sum("n_in_win").alias("total"), F.count(F.lit(1)).alias("n_win")
    )
    for r in agg.collect():
        expect_n = (r.id % 50 + 10) * 100
        assert r.total == expect_n  # windows tile the clip exactly
        assert r.n_win == -(-expect_n // 1500)


def test_image_decoder_is_pluggable(spark):
    """set_image_decoder must reach the executors through the UDF
    closure — the day a real codec exists, registration is the only
    code change."""
    from cosmos_xenna_spark.operators.multimodal import (
        decode_image_stub,
        extract_image_metadata,
        fake_image,
        set_image_decoder,
    )

    def _header_only_decoder(payload: bytes):
        # swap-in kernel: trusts the FAKEIMG1 header, never touches
        # pixels; nested so cloudpickle ships it by value
        import struct as _struct

        from cosmos_xenna_spark.operators.multimodal import _MAGIC

        w, h = _struct.unpack("<II", payload[len(_MAGIC) : len(_MAGIC) + 8])
        return w + 1000, h + 1000, b""  # offset proves THIS kernel ran

    df = spark.createDataFrame(
        [(1, fake_image(8, 6, seed=1))], "id long, image binary"
    )
    set_image_decoder(_header_only_decoder)
    try:
        row = extract_image_metadata(df).collect()[0]
        assert (row.width, row.height) == (1008, 1006)
    finally:
        set_image_decoder(decode_image_stub)
    row = extract_image_metadata(df).collect()[0]
    assert (row.width, row.height) == (8, 6)


def test_real_codec_decodes_when_available(spark):
    """Skip-if-absent: with PIL installed the DEFAULT kernel decodes a
    real PNG with zero configuration."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from cosmos_xenna_spark.operators.multimodal import extract_image_metadata

    buf = io.BytesIO()
    Image.new("L", (5, 4)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, buf.getvalue())], "id long, image binary")
    row = extract_image_metadata(df).collect()[0]
    assert (row.width, row.height) == (5, 4)
