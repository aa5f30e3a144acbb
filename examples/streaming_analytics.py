#!/usr/bin/env python
"""Live event analytics end-to-end: one replayed event stream feeding
three streaming operators concurrently — OHLC bars (windowed
aggregation), last-touch attribution (custom keyed state), and
abandoned-cart detection (event-time timeouts firing on the ABSENCE
of an event).

Batch/stream parity is the engine contract: the bars and attribution
rows printed here are bit-identical to their batch operators over the
same events (pinned by tests/test_streaming.py); this example shows
the three state flavors running as a user would run them.

Run:  python examples/streaming_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.session import get_spark
from cosmos_xenna_spark.streaming import (
    events_file_stream,
    streaming_abandoned_carts,
    streaming_last_touch_attribution,
    streaming_ohlc_bars,
    to_memory_sink,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming_analytics")

    # stage the events table as a file-stream directory (stand-in for
    # a Kafka topic / landing bucket)
    d = tempfile.mkdtemp(prefix="cxs_stream_example_")
    stream_dir = os.path.join(d, "events")
    os.makedirs(stream_dir)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    try:
        queries = [
            to_memory_sink(
                streaming_ohlc_bars(events_file_stream(spark, stream_dir)),
                "ohlc",
                "complete",
            ),
            to_memory_sink(
                streaming_last_touch_attribution(
                    events_file_stream(spark, stream_dir)
                ),
                "attr",
                "append",
            ),
            to_memory_sink(
                streaming_abandoned_carts(
                    events_file_stream(spark, stream_dir), timeout_secs=1800
                ),
                "abandoned",
                "append",
            ),
        ]
        for q in queries:
            q.processAllAvailable()

        n_bars = spark.sql("SELECT COUNT(*) AS n FROM ohlc").collect()[0].n
        attr = spark.sql(
            "SELECT COUNT(*) AS n, SUM(CAST(src_event_id IS NOT NULL AS BIGINT)) AS hit FROM attr"
        ).collect()[0]
        n_abandoned = spark.sql("SELECT COUNT(*) AS n FROM abandoned").collect()[0].n
        print(f"live OHLC bars: {n_bars}")
        print(f"conversions: {attr.n} ({attr.hit} attributed)")
        print(f"abandoned carts so far: {n_abandoned} (more fire as the watermark advances)")
        for q in queries:
            q.stop()
            q.awaitTermination(30)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
