"""Behavioral tests for linear interpolation."""

from __future__ import annotations

import datetime as dt

import pytest

from cosmos_xenna_spark.operators.timeseries import interpolate_linear


def _series(spark, rows):
    """rows: (key, seconds, value-or-None)"""
    data = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v) for k, s, v in rows
    ]
    return spark.createDataFrame(data, "k string, ts timestamp, v double")


def _filled(spark, rows):
    df = interpolate_linear(_series(spark, rows), ["k"], "ts", "v")
    return {
        (r["k"], r["ts"].second + r["ts"].minute * 60): r["value_filled"]
        for r in df.collect()
    }


def test_interior_gap_interpolates(spark):
    got = _filled(spark, [("a", 0, 10.0), ("a", 10, None), ("a", 40, 70.0)])
    assert got[("a", 10)] == pytest.approx(10.0 + (70.0 - 10.0) * 10 / 40)


def test_multiple_gap_rows_share_bracket(spark):
    got = _filled(
        spark, [("a", 0, 0.0), ("a", 1, None), ("a", 2, None), ("a", 3, None), ("a", 4, 8.0)]
    )
    assert [got[("a", s)] for s in range(5)] == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_leading_and_trailing_gaps_fill_flat(spark):
    got = _filled(spark, [("a", 0, None), ("a", 5, 3.0), ("a", 9, None)])
    assert got[("a", 0)] == 3.0  # back-fill
    assert got[("a", 9)] == 3.0  # forward-fill


def test_all_null_series_stays_null(spark):
    got = _filled(spark, [("a", 0, None), ("a", 5, None)])
    assert got[("a", 0)] is None and got[("a", 5)] is None


def test_keys_do_not_leak(spark):
    got = _filled(spark, [("a", 0, 1.0), ("b", 0, 100.0), ("b", 5, None)])
    assert got[("b", 5)] == 100.0  # b's trailing fill, never a's value


def test_observed_values_untouched(spark):
    rows = [("a", i, float(i * i)) for i in range(6)]
    got = _filled(spark, rows)
    assert all(got[("a", i)] == i * i for i in range(6))


def test_seasonal_baseline_matches_python(spark):
    import datetime as dt
    import random

    from cosmos_xenna_spark.operators.timeseries import seasonal_baseline

    rng = random.Random(31)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            f"u{rng.randrange(3)}",
            base + dt.timedelta(hours=rng.randrange(24 * 28)),
            round(rng.uniform(0, 50), 2),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_id long, u string, ts timestamp, v double")
    out = seasonal_baseline(df, ["u"], "ts", "v", n_prev=3, order_tiebreak=["event_id"])
    got = {r.event_id: (r.slot_how, r.baseline, r.deviation) for r in out.collect()}

    import math

    hist: dict[tuple, list] = {}
    for i, u, ts, v in sorted(rows, key=lambda r: (r[2], r[0])):
        # Spark dayofweek: Sunday=1..Saturday=7; python weekday(): Monday=0
        dow = (ts.weekday() + 1) % 7 + 1
        slot = dow * 24 + ts.hour
        key = (u, slot)
        prev = hist.setdefault(key, [])
        window = prev[-3:]
        c = math.floor(v * 100)
        if window:
            s = sum(window)
            n = len(window)
            baseline = s / (n * 100.0)
            deviation = c / 100.0 - baseline
        else:
            baseline = deviation = None
        g_slot, g_base, g_dev = got[i]
        assert g_slot == slot, (i, g_slot, slot)
        if baseline is None:
            assert g_base is None and g_dev is None
        else:
            assert g_base == baseline and g_dev == deviation
        prev.append(c)


def test_rolling_distinct_matches_python(spark):
    import random

    from cosmos_xenna_spark.operators.eventops import rolling_distinct_count

    rng = random.Random(53)
    rows = [(i, f"u{rng.randrange(4)}", i * 10 + rng.randrange(5), f"t{rng.randrange(6)}") for i in range(300)]
    df = spark.createDataFrame(rows, "i long, u string, ts long, t string")
    out = rolling_distinct_count(df, ["u"], "ts", "t", window_rows=4, order_tiebreak=["i"])
    got = {r.i: r.n_distinct for r in out.collect()}

    by_u: dict[str, list] = {}
    for i, u, ts, t in sorted(rows, key=lambda r: (r[2], r[0])):
        seq = by_u.setdefault(u, [])
        seq.append((i, t))
        window = [t2 for _, t2 in seq[-4:]]
        assert got[i] == len(set(window)), (i, window)


def test_cusum_matches_python_recurrence(spark):
    import random

    from cosmos_xenna_spark.operators.timeseries import cusum_changepoint

    rng = random.Random(61)
    rows = [
        (i, f"u{i % 5}", i * 10, round(rng.uniform(0, 12), 2)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "i long, u string, ts long, v double")
    out = cusum_changepoint(
        df, ["u"], "ts", "v", drift_cents=600, threshold_cents=2000, order_tiebreak=["i"]
    )
    got = {r.i: (r.cusum, r.alarm) for r in out.collect()}

    state: dict[str, int] = {}
    import math
    for i, u, ts, v in sorted(rows, key=lambda r: (r[2], r[0])):
        c = math.floor(v * 100) - 600
        s = max(0, state.get(u, 0) + c)
        state[u] = s
        assert got[i] == (s, 1 if s >= 2000 else 0), (i, u)


def test_autocorrelation_matches_python(spark):
    import math
    import random

    from cosmos_xenna_spark.operators.timeseries import autocorrelation

    rng = random.Random(67)
    rows = []
    prev = {f"s{j}": 50.0 for j in range(3)}
    for i in range(600):
        k = f"s{i % 3}"
        prev[k] = 0.7 * prev[k] + rng.uniform(0, 30)  # AR(1) per series
        rows.append((i, k, i, round(prev[k], 2)))
    df = spark.createDataFrame(rows, "i long, k string, ts long, v double")
    got = {
        (r.k, r.lag): (r.n_pairs, r.acf)
        for r in autocorrelation(df, ["k"], "ts", "v", max_lag=3, order_tiebreak=["i"]).collect()
    }

    series: dict[str, list[int]] = {}
    for i, k, ts, v in sorted(rows, key=lambda r: (r[2], r[0])):
        series.setdefault(k, []).append(math.floor(v * 100))
    for k, xs in series.items():
        for lag in (1, 2, 3):
            pairs = [(xs[t], xs[t - lag]) for t in range(lag, len(xs))]
            n = float(len(pairs))
            sx = float(sum(p[0] for p in pairs))
            sy = float(sum(p[1] for p in pairs))
            sxx = float(sum(p[0] * p[0] for p in pairs))
            syy = float(sum(p[1] * p[1] for p in pairs))
            sxy = float(sum(p[0] * p[1] for p in pairs))
            r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            gn, gr = got[(k, lag)]
            assert gn == len(pairs)
            assert gr == r, (k, lag)
            assert gr > 0.0  # AR(1) with phi>0: positive at every lag
        assert got[(k, 1)][1] > 0.5  # lag-1 acf ~ phi = 0.7


def test_resample_ffill_matches_python(spark):
    import datetime
    import random

    from cosmos_xenna_spark.operators.timeseries import resample_ffill

    rng = random.Random(77)
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (
            i,
            f"u{rng.randrange(5)}",
            base + datetime.timedelta(seconds=rng.randrange(0, 500000)),
            round(rng.uniform(0, 100), 2),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "i long, u string, ts timestamp, v double")
    step = 3600
    out = resample_ffill(df, ["u"], "ts", "v", step_secs=step, order_tiebreak=["i"])
    got = {(r.u, r.grid_ts): r.value_ffill for r in out.collect()}

    by_u: dict[str, list] = {}
    for i, u, ts, v in rows:
        by_u.setdefault(u, []).append((ts, i, v))
    want = {}
    epoch = datetime.datetime(1970, 1, 1)
    for u, evs in by_u.items():
        evs.sort()
        lo = min(e[0] for e in evs)
        hi = max(e[0] for e in evs)
        k_lo = -(-int((lo - epoch).total_seconds()) // step)
        k_hi = int((hi - epoch).total_seconds()) // step
        for k in range(k_lo, k_hi + 1):
            t = epoch + datetime.timedelta(seconds=k * step)
            last = max((e for e in evs if e[0] <= t), key=lambda e: (e[0], e[1]))
            want[(u, t)] = last[2]
    assert got == want and len(got) > 0
