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
