"""Z-order layout tests: Morton-key math plus the MEASURABLE skipping
claim — z-ordered files are small rectangles in BOTH dimensions, where
a single-column sort leaves the other dimension's per-file span at
full width."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.layout import layout_by_zorder, zorder_key


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1023, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y), (x, y)


def test_zorder_layout_bounds_both_dimensions(spark):
    """The skipping claim, measured: per-partition span of EACH dim
    under z-order is a small fraction of the domain; a single-dim sort
    leaves the other dim at ~full width."""
    n, side = 4096, 64
    rows = [((i * 2654435761) % side, (i * 40503) % side) for i in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")

    def spans(frame):
        stats = (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        return (
            float(np.mean([r.sx for r in stats])),
            float(np.mean([r.sy for r in stats])),
        )

    zx, zy = spans(layout_by_zorder(df, ["x", "y"], n_files=16, bits=6))
    ox, oy = spans(df.repartitionByRange(16, "x").sortWithinPartitions("x"))
    # z-order: BOTH dims bounded well below the domain width
    # (measured ~23% of a 64-wide domain for each)
    assert zx < side * 0.35 and zy < side * 0.35, (zx, zy)
    # single-dim layout: x tight but y wide (measured ~73% of domain)
    assert ox < side * 0.1
    assert oy > side * 0.6
    # and z-order's worse dim beats single-dim's worse dim by 1.7x+
    assert max(zx, zy) * 1.7 < max(ox, oy), (zx, zy, ox, oy)


def _xy2d(order_n, x, y):
    d, s = 0, order_n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = order_n - 1 - x, order_n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_and_is_bijective(spark):
    from cosmos_xenna_spark.operators.layout import hilbert_key

    side = 32
    pts = spark.createDataFrame(
        [(x * side + y, x, y) for x in range(side) for y in range(side)],
        "pid long, hx long, hy long",
    )
    rows = hilbert_key(pts, ["pid", "hx", "hy"], "hx", "hy", bits=5).collect()
    got = {(r.hx, r.hy): r.hkey for r in rows}
    assert got == {
        (x, y): _xy2d(side, x, y) for x in range(side) for y in range(side)
    }
    assert sorted(got.values()) == list(range(side * side))


def test_hilbert_consecutive_keys_are_adjacent_cells(spark):
    """The locality property that justifies Hilbert over Morton:
    consecutive key values are ALWAYS 4-neighbors (Morton violates
    this at every power-of-two boundary jump)."""
    from cosmos_xenna_spark.operators.layout import hilbert_key

    side = 16
    pts = spark.createDataFrame(
        [(x, y) for x in range(side) for y in range(side)], "hx long, hy long"
    )
    rows = hilbert_key(pts, ["hx", "hy"], "hx", "hy", bits=4).collect()
    by_key = {r.hkey: (r.hx, r.hy) for r in rows}
    for k in range(side * side - 1):
        (x1, y1), (x2, y2) = by_key[k], by_key[k + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (k, by_key[k], by_key[k + 1])


def test_hilbert_skips_more_files_than_morton(spark, sf_dir):
    """The quantified locality claim: on a non-power-of-two file count
    (files cross block boundaries) with an unaligned rectangle, the
    Hilbert layout touches STRICTLY fewer files and scans strictly
    fewer rows than Morton for the same predicate — while both return
    the identical matched rows."""
    from cosmos_xenna_spark.queries import load_registry

    rows = {
        r.layout: (r.files_touched, r.rows_scanned, r.rows_matched)
        for r in load_registry()["q_layout_skipping_eval"]
        .builder(spark, sf_dir)
        .collect()
    }
    h, z = rows["hilbert"], rows["zorder"]
    assert h[2] == z[2]  # same ground truth
    assert h[0] < z[0] and h[1] < z[1], rows


@pytest.mark.parametrize("seed", [7, 29])
def test_bloom_skipping_eval_matches_python(spark, seed):
    import hashlib
    import random as _random

    from cosmos_xenna_spark.operators.layout import bloom_skipping_eval

    rng = _random.Random(seed)
    rows = [(i, rng.randrange(0, 64)) for i in range(200)]
    probes = (1, 7, 13, 40, 63)
    df = spark.createDataFrame(rows, "rid long, k long")
    got = {
        r.probe_key: (r.n_files, r.minmax_touched, r.bloom_touched,
                      r.true_files, r.bloom_fp)
        for r in bloom_skipping_eval(df, "rid", "k", probes,
                                     rows_per_file=16).collect()
    }

    def bit(i, v):
        h = int(hashlib.md5(f"b{i}|{v}".encode()).hexdigest()[:15], 16)
        return h % 256

    files: dict = {}
    for rid, k in rows:
        files.setdefault(rid // 16, []).append(k)
    want = {}
    for pk in probes:
        mm = sum(1 for ks in files.values() if min(ks) <= pk <= max(ks))
        bl = sum(
            1
            for ks in files.values()
            if {bit(0, pk), bit(1, pk)}
            <= {bit(i, v) for v in ks for i in (0, 1)}
        )
        tr = sum(1 for ks in files.values() if pk in ks)
        want[pk] = (len(files), mm, bl, tr, bl - tr)
    assert got == want
    # Bloom never false-negatives and beats zone maps on point lookups
    for pk in probes:
        assert want[pk][2] >= want[pk][3]
        assert want[pk][2] <= want[pk][1] + want[pk][4]
