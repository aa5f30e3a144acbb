"""The timestamp-encoding contract (round-3 postmortem): the events
table's ``ts`` column has shipped as TIMESTAMP(NANOS)->bigint,
timestamp_ntz, and plain timestamp across test-data generations.
``catalog.normalize_ts`` must map ALL of them to the same session-UTC
``timestamp`` values, and the streaming file source must agree with
the batch path on the same files.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table, normalize_ts

UTC = datetime.timezone.utc
T0 = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
T0_NS = int(T0.replace(tzinfo=UTC).timestamp() * 1_000_000) * 1000 + 789


def test_bigint_nanos_truncate_to_micros(spark):
    df = spark.createDataFrame([(1, T0_NS)], "event_id long, ts long")
    got = normalize_ts(df).collect()[0]["ts"]
    assert got == T0  # ns -> us floor truncation, sub-us digits dropped


def test_timestamp_ntz_cast_preserves_wall_clock(spark):
    df = spark.createDataFrame([(1, T0)], "event_id long, ts timestamp_ntz")
    out = normalize_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.collect()[0]["ts"] == T0  # session TZ pinned UTC


def test_timestamp_passthrough_unchanged(spark):
    df = spark.createDataFrame([(1, T0)], "event_id long, ts timestamp")
    out = normalize_ts(df)
    assert out.collect()[0]["ts"] == T0
    # passthrough adds no projection at all
    assert out is df


def test_streaming_schema_agrees_with_batch(spark, sf_dir, tmp_path):
    """The streaming replay source and catalog.load_table must produce
    identical (event_id, ts) pairs from the same directory — the
    round-3 failure was a 1000x disagreement here."""
    import os
    import shutil

    from cosmos_xenna_spark.streaming import events_file_stream

    # FileStreamSource needs a directory; the sf dir stores a single file
    events_dir = str(tmp_path / "events_replay")
    os.makedirs(events_dir)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(events_dir, "events.parquet"),
    )
    batch = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, sf_dir, "events").select("event_id", "ts").collect()
    }
    stream = events_file_stream(spark, events_dir)
    q = (
        stream.select("event_id", "ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ts_contract")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r["event_id"]: r["ts"]
            for r in spark.table("ts_contract").collect()
        }
    finally:
        q.stop()
    assert streamed == batch
