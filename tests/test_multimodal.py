"""Byte-level multimodal operator tests (the registry queries check the
typed-metadata arithmetic; these check the payloads themselves)."""

from __future__ import annotations

import numpy as np
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


def test_decode_rejects_unsupported_formats():
    # WebP still honestly raises behind the pluggable seam (no codec)
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 24)
    # PNG and JPEG are now real decoders: malformed bytes are loud errors
    with pytest.raises(ValueError, match="IHDR"):
        decode_image_stub(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image_stub(b"\xff\xd8\xff\xc2" + b"\x00" * 32)  # progressive SOF2


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


def test_audio_decode_rejects_compressed_formats():
    import pytest

    from cosmos_xenna_spark.operators.multimodal import decode_audio_stub

    # PCM WAV is now decoded for real (stdlib wave); compressed codecs
    # still honestly raise
    with pytest.raises(NotImplementedError):
        decode_audio_stub(b"OggS" + b"\x00" * 32)  # ogg/vorbis header
    with pytest.raises(NotImplementedError):
        decode_audio_stub(b"ID3\x04" + b"\x00" * 32)  # mp3 with ID3 tag


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


def _make_bmp24(width, height, rgb_rows):
    """Hand-pack a real 24-bit uncompressed BMP (bottom-up rows)."""
    import struct as _struct

    row_bytes = (width * 3 + 3) & ~3
    body = b""
    for row in reversed(rgb_rows):  # BMP stores bottom-up
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)
        body += line + b"\x00" * (row_bytes - len(line))
    pixel_offset = 14 + 40
    size = pixel_offset + len(body)
    header = b"BM" + _struct.pack("<IHHI", size, 0, 0, pixel_offset)
    dib = _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + dib + body


def test_decode_real_bmp_bytes(spark):
    from cosmos_xenna_spark.operators.multimodal import (
        decode_bmp,
        extract_image_metadata,
    )

    # 3x2 image with known colors: white, black, mid-gray / r, g, b
    rows = [
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    ]
    payload = _make_bmp24(3, 2, rows)
    w, h, pixels = decode_bmp(payload)
    assert (w, h) == (3, 2)
    grid = list(pixels)
    # ITU-R 601 integer luma, row-major top-down
    assert grid[:3] == [255, 0, 128]
    assert grid[3:] == [299 * 255 // 1000, 587 * 255 // 1000, 114 * 255 // 1000]
    # and through the Spark operator: a REAL image byte stream flows
    # the full Arrow-batched path
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, image binary")
    meta = extract_image_metadata(df).collect()[0]
    assert (meta.width, meta.height, meta.n_bytes) == (3, 2, len(payload))


def test_resize_real_bmp_through_stage(spark):
    from cosmos_xenna_spark.operators.multimodal import (
        extract_image_metadata,
        resize_images,
    )

    rows = [[(x * 16, x * 16, x * 16) for x in range(8)] for _ in range(4)]
    payload = _make_bmp24(8, 4, rows)
    df = spark.createDataFrame([(7, bytearray(payload))], "id long, image binary")
    resized = resize_images(df, target_w=4, target_h=2)
    meta = extract_image_metadata(resized).collect()[0]
    assert (meta.width, meta.height) == (4, 2)


def test_decode_real_wav_bytes(spark):
    import io
    import wave as wave_mod

    import numpy as np

    from cosmos_xenna_spark.operators.multimodal import (
        audio_window_energy,
        decode_wav,
        extract_audio_metadata,
    )

    # 16-bit mono 8 kHz ramp
    samples = np.arange(-1000, 1000, 10, dtype="<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    payload = buf.getvalue()
    sr, n, pcm = decode_wav(payload)
    assert (sr, n) == (8000, len(samples))
    want = ((samples.astype(np.int64) >> 8) + 128).astype(np.uint8)
    assert np.frombuffer(pcm, dtype=np.uint8).tolist() == want.tolist()
    # full Spark path: metadata + windowed energy over real WAV bytes
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, audio binary")
    meta = extract_audio_metadata(df).collect()[0]
    assert (meta.sample_rate, meta.n_samples) == (8000, len(samples))
    assert meta.peak_amp == int(want.max())
    wins = audio_window_energy(df, window_samples=64).collect()
    assert sum(r.n_in_win for r in wins) == len(samples)


def test_decode_real_wav_stereo_downmix():
    import io
    import wave as wave_mod

    import numpy as np

    from cosmos_xenna_spark.operators.multimodal import decode_wav

    left = np.full(100, 1000, dtype="<i2")
    right = np.full(100, -1000, dtype="<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    sr, n, pcm = decode_wav(buf.getvalue())
    assert (sr, n) == (16000, 100)
    lu = (1000 >> 8) + 128
    ru = (-1000 >> 8) + 128
    assert np.frombuffer(pcm, dtype=np.uint8).tolist() == [(lu + ru) // 2] * 100


def _make_png(width, height, pixels, color_type, filters=None, palette=None):
    """Hand-pack a real PNG: zlib-compressed scanlines with chosen
    per-row filter types (encoder side of the spec, exercised so the
    decoder's unfilter paths see genuine filtered bytes)."""
    import struct as _struct
    import zlib as _zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = width * channels
    filters = filters or [0] * height
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        cur, f = arr[y], filters[y]
        raw.append(f)
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(channels, np.uint8), cur[:-channels]])
            enc = cur - left
        elif f == 2:  # Up
            enc = cur - prev
        elif f == 3:  # Average
            enc = np.zeros(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                enc[i] = (int(cur[i]) - (a + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            enc = np.zeros(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (int(cur[i]) - pred) & 0xFF
        raw += enc.tobytes()
        prev = cur

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", _zlib.crc32(ctype + data))
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", _struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", _zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_decode_real_png_all_filters():
    """RGB PNG exercising every filter type (None/Sub/Up/Average/Paeth)
    decodes to the same luma values as the BMP path."""
    from cosmos_xenna_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4 * 3), dtype=np.uint8)
    payload = _make_png(4, 5, px, color_type=2, filters=[0, 1, 2, 3, 4])
    w, h, pixels = decode_png(payload)
    assert (w, h) == (4, 5)
    rgb = px.reshape(5, 4, 3).astype(np.uint32)
    want = ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000).astype(
        np.uint8
    )
    assert list(pixels) == list(want.reshape(-1))


def test_decode_png_gray_palette_rgba():
    from cosmos_xenna_spark.operators.multimodal import decode_png

    # grayscale passthrough (filters Sub + Paeth)
    g = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    w, h, pixels = decode_png(_make_png(3, 2, g, color_type=0, filters=[1, 4]))
    assert (w, h) == (3, 2) and list(pixels) == [10, 20, 30, 40, 50, 60]
    # palette: index i -> pure green intensity
    pal = bytearray()
    for i in range(256):
        pal += bytes((0, i, 0))
    payload = _make_png(2, 1, np.array([[100, 200]], np.uint8), 3, palette=pal)
    _, _, pixels = decode_png(payload)
    assert list(pixels) == [587 * 100 // 1000, 587 * 200 // 1000]
    # RGBA: alpha ignored
    rgba = np.array([[255, 0, 0, 7, 0, 255, 0, 9]], np.uint8)
    _, _, pixels = decode_png(_make_png(2, 1, rgba, color_type=6, filters=[4]))
    assert list(pixels) == [299 * 255 // 1000, 587 * 255 // 1000]


def test_png_through_image_operator_chain(spark):
    """A REAL compressed PNG flows the full Arrow path of
    q_multimodal_image_meta's operator (extract_image_metadata) and the
    resize stage — the compressed-codec seam is no longer stub-only."""
    from cosmos_xenna_spark.operators.multimodal import (
        extract_image_metadata,
        resize_images,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(4, 8 * 3), dtype=np.uint8)
    payload = _make_png(8, 4, px, color_type=2, filters=[4, 3, 2, 1])
    df = spark.createDataFrame([(3, bytearray(payload))], "id long, image binary")
    meta = extract_image_metadata(df).collect()[0]
    assert (meta.width, meta.height, meta.n_bytes) == (8, 4, len(payload))
    resized = resize_images(df, target_w=4, target_h=2)
    rmeta = extract_image_metadata(resized).collect()[0]
    assert (rmeta.width, rmeta.height) == (4, 2)


def _ima_encode(samples, block_samples=505):
    """Test-side mono IMA ADPCM encoder (greedy nibble choice per spec)."""
    import struct as _struct

    from cosmos_xenna_spark.operators.multimodal import _IMA_INDEX, _IMA_STEP

    blocks = []
    i = 0
    index = 0
    while i < len(samples):
        chunk = samples[i : i + block_samples]
        i += block_samples
        pred = int(chunk[0])
        hdr = _struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEP[index])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            d = step >> 3
            if diff >= step:
                nib |= 4
                diff -= step
                d += step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
                d += step >> 1
            if diff >= step >> 2:
                nib |= 1
                d += step >> 2
            pred = pred - d if nib & 8 else pred + d
            pred = min(max(pred, -32768), 32767)
            index = min(max(index + int(_IMA_INDEX[nib]), 0), 88)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        body = bytes((nibbles[j] | (nibbles[j + 1] << 4)) for j in range(0, len(nibbles), 2))
        blocks.append(hdr + body)
    return b"".join(blocks), 4 + (block_samples - 1 + 1) // 2


def _wav_adpcm(samples, sr=8000, block_samples=505):
    import struct as _struct

    data, block_align = _ima_encode(samples, block_samples)
    fmt = _struct.pack("<HHIIHH", 0x11, 1, sr, sr * block_align // block_samples, block_align, 4)
    out = b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    out += b"data" + _struct.pack("<I", len(data)) + data
    return b"RIFF" + _struct.pack("<I", len(out) + 4) + b"WAVE" + out


def test_ima_adpcm_wav_decode():
    """A real compressed-audio codec through the decode seam: IMA ADPCM
    tracks a sine within the codec's adaptive-step error envelope."""
    from cosmos_xenna_spark.operators.multimodal import decode_audio_stub

    t = np.arange(2000)
    sine = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    payload = _wav_adpcm(sine)
    sr, n, pcm = decode_audio_stub(payload)
    assert sr == 8000 and n >= 2000
    got = np.frombuffer(pcm, np.uint8)[:2000].astype(np.float64)
    want = ((sine >> 8) + 128).astype(np.float64)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.99, corr
    assert np.abs(got - want).mean() < 6.0


def test_ima_adpcm_through_audio_operators(spark):
    from cosmos_xenna_spark.operators.multimodal import extract_audio_metadata

    t = np.arange(1010)
    tri = (8000 * np.abs((t % 200) - 100) / 100 - 4000).astype(np.int64)
    payload = _wav_adpcm(tri)
    df = spark.createDataFrame([(5, bytearray(payload))], "id long, audio binary")
    row = extract_audio_metadata(df).collect()[0]
    assert row.sample_rate == 8000
    assert row.n_samples >= 1010  # last block zero-padded to the block size


def test_audio_spectral_pure_tone(spark):
    """A pure 1 kHz tone's spectral centroid must land on 1 kHz in every
    window (the FFT-feature correctness anchor; no SQL oracle exists for
    FFT output, so this property IS the gate)."""
    import struct as _struct

    from cosmos_xenna_spark.operators.multimodal import audio_spectral_features

    sr, n = 8000, 2048
    t = np.arange(n)
    tone = (100 * np.sin(2 * np.pi * 1000 * t / sr) + 128).astype(np.uint8)
    # wrap as 8-bit PCM WAV (stdlib-wave-readable)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id long, audio binary")
    rows = audio_spectral_features(df, window_samples=512).collect()
    assert len(rows) == 4
    for r in rows:
        # magnitude-weighted centroid sits slightly above the tone: the
        # u8 quantization noise floor is flat across the spectrum and
        # the band above 1 kHz is 3x wider than below (sr/2 = 4 kHz)
        assert abs(r.centroid_hz - 1000.0) < 60.0, r.centroid_hz
        assert 950.0 <= r.rolloff_hz <= 1100.0
        assert 60.0 < r.rms < 90.0  # sin amplitude 100 -> rms ~70.7


def test_image_ahash_real_bmp_and_pairs(spark):
    """aHash over REAL BMP bytes: identical images hash identically
    (hamming 0), a lightly-perturbed copy lands within the hamming
    budget, and an unrelated image does not pair."""
    from cosmos_xenna_spark.operators.multimodal import image_ahash, image_hash_pairs

    # 8x8 half-bright/half-dark: ahash = low half 0, high half 1
    base = [[(200, 200, 200)] * 8 if y < 4 else [(10, 10, 10)] * 8 for y in range(8)]
    # perturb two cells -> hamming 2 from base
    pert = [row[:] for row in base]
    pert[0][0] = (0, 0, 0)
    pert[7][7] = (255, 255, 255)
    # unrelated: vertical stripes -> far away
    other = [[(250, 250, 250), (5, 5, 5)] * 4 for _ in range(8)]
    rows = [
        (1, _make_bmp24(8, 8, base)),
        (2, _make_bmp24(8, 8, base)),
        (3, _make_bmp24(8, 8, pert)),
        (4, _make_bmp24(8, 8, other)),
    ]
    df = spark.createDataFrame(rows, "id long, image binary")
    hashes = image_ahash(df)
    hv = {r.id: r.ahash for r in hashes.collect()}
    assert hv[1] == hv[2]
    assert bin((hv[1] ^ hv[3]) & ((1 << 64) - 1)).count("1") == 2
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_hash_pairs(hashes, max_hamming=3, n_bands=4).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 2 and pairs[(2, 3)] == 2
    assert not any(4 in p for p in pairs)


def test_image_hash_pairs_partitioning_invariant(spark):
    from cosmos_xenna_spark.operators.multimodal import (
        attach_fake_image_corpus,
        image_ahash,
        image_hash_pairs,
    )

    ids = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    hashes = image_ahash(attach_fake_image_corpus(ids))
    p1 = set(
        (r.doc_a, r.doc_b, r.hamming)
        for r in image_hash_pairs(hashes.repartition(1)).collect()
    )
    p13 = set(
        (r.doc_a, r.doc_b, r.hamming)
        for r in image_hash_pairs(hashes.repartition(13, "id")).collect()
    )
    assert p1 == p13 and len(p1) > 0


def test_video_scene_cuts_planted(spark):
    """A video of [A, A, B, B, A] must cut exactly at frames 2 and 4."""
    from cosmos_xenna_spark.operators.multimodal import (
        build_avi_mjpeg,
        fake_image,
        video_scene_cuts,
    )

    a = fake_image(8, 6, seed=1)
    b = fake_image(8, 6, seed=2)
    video = build_avi_mjpeg([a, a, b, b, a], 8, 6)
    df = spark.createDataFrame([(7, video)], "id long, video binary")
    cuts = sorted(
        (r.frame_idx, r.hamming > 0) for r in video_scene_cuts(df, min_hamming=5).collect()
    )
    assert [i for i, _ in cuts] == [2, 4]
    assert all(h for _, h in cuts)


def test_image_hash_pairs_mega_cluster_streams(spark):
    """Regression for the r8 100x OOM: a single exact-dup cluster far
    beyond nested-transform comfort must emit all C(n,2) pairs through
    the streaming hash self-join."""
    from pyspark.sql import functions as F

    from cosmos_xenna_spark.operators.multimodal import image_hash_pairs

    n = 200
    hashes = spark.range(n).select(
        F.col("id"), F.lit(0x0123456789ABCDEF).cast("long").alias("ahash")
    )
    out = image_hash_pairs(hashes, max_hamming=3, n_bands=4)
    assert out.count() == n * (n - 1) // 2
    row = out.agg(F.max("hamming").alias("m"), F.min("hamming").alias("lo")).first()
    assert (row.m, row.lo) == (0, 0)


def _filter_rows(arr, channels, filters):
    """Encoder-side filtering of one (sub-)image — mirror of the
    decoder's unfilter, shared by the sequential and Adam7 builders."""
    height, stride = arr.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        cur, f = arr[y], filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            left = np.concatenate([np.zeros(channels, np.uint8), cur[:-channels]])
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = np.zeros(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                enc[i] = (int(cur[i]) - (a + int(prev[i])) // 2) & 0xFF
        else:
            enc = np.zeros(stride, np.uint8)
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (int(cur[i]) - pred) & 0xFF
        raw += enc.tobytes()
        prev = cur
    return bytes(raw)


def _make_png_adam7(width, height, pixels, color_type, filters=(0, 1, 2, 3, 4)):
    """Hand-pack a REAL Adam7-interlaced PNG: the seven spec passes,
    each filtered as an independent sub-image (cycling filter types so
    every unfilter path runs inside passes too)."""
    import struct as _struct
    import zlib as _zlib

    from cosmos_xenna_spark.operators.multimodal import _ADAM7

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width, channels)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = arr[y0::dy, x0::dx, :]
        ph, pw = sub.shape[0], sub.shape[1]
        if ph == 0 or pw == 0:
            continue
        raw += _filter_rows(
            sub.reshape(ph, pw * channels).copy(), channels, filters
        )

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", _zlib.crc32(ctype + data))
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(
        b"IHDR", _struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    )
    out += chunk(b"IDAT", _zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize(
    "width,height", [(8, 8), (5, 3), (13, 9), (1, 1), (2, 2), (3, 10)]
)
def test_decode_png_adam7_matches_sequential(width, height):
    """Interlaced and sequential encodings of the same pixels must
    decode identically — including sizes where some Adam7 passes are
    empty (1x1 has six empty passes)."""
    from cosmos_xenna_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(width * 100 + height)
    px = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    seq = _make_png(
        width, height, px, color_type=2, filters=([0, 1, 2, 3, 4] * height)[:height]
    )
    il = _make_png_adam7(width, height, px, color_type=2)
    assert decode_png(il) == decode_png(seq)
    w, h, gray = decode_png(il)
    assert (w, h) == (width, height)
    rgb = px.astype(np.uint32)
    want = (
        (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    ).astype(np.uint8)
    assert gray == want.tobytes()


def test_decode_png_adam7_gray_paeth_only():
    from cosmos_xenna_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(11, 7, 1), dtype=np.uint8)
    il = _make_png_adam7(7, 11, px, color_type=0, filters=(4,))
    w, h, gray = decode_png(il)
    assert (w, h, gray) == (7, 11, px.tobytes())


def test_decode_png_adam7_truncated_payload_raises():
    from cosmos_xenna_spark.operators.multimodal import decode_png

    px = np.zeros((8, 8, 1), dtype=np.uint8)
    il = bytearray(_make_png_adam7(8, 8, px, color_type=0, filters=(0,)))
    # corrupt the IHDR height upward so the pass arithmetic expects
    # more bytes than the IDAT stream carries
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">IIBBBBB", 8, 16, 8, 0, 0, 0, 1)
    new_chunk = (
        _struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr))
    )
    il[8 : 8 + len(new_chunk)] = new_chunk
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(bytes(il))
