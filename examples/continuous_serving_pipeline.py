#!/usr/bin/env python
"""A9 continuous stage on a LIVE serving stream, end to end: clients
push requests onto a named queue; Spark's custom ``cxs_serving``
DataSource drains it into micro-batches; an async ``ContinuousStage``
(the decoupled request/response shape continuous-batching inference
servers use — the coroutine emits results whenever ready, no 1:1
batch correspondence) processes them; a ``serve`` sink pushes
responses back out.

This mirrors the reference's continuous_wrapped_stage composition
(reference ``cosmos_xenna/ray_utils/continuous_stage.py:68-79``
pumped by ``stage_worker.py:821-957``, SERVING mode poll loop
``pipelines/private/streaming.py:992-1004``) re-expressed on Spark 4
Python DataSources + Structured Streaming + mapInPandas.

Run:  python examples/continuous_serving_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.operators.continuous import (
    ContinuousStage,
    apply_continuous_stage,
)
from cosmos_xenna_spark.session import get_spark
from cosmos_xenna_spark.streaming import serve
from cosmos_xenna_spark.streaming.serving_source import (
    QueueServingDataSource,
    ServingQueueServer,
)


class AsyncScore(ContinuousStage):
    """Continuous scorer: accumulates requests off the input queue and
    emits scored frames as they are ready — the response cadence is the
    stage's own choice, not the engine's batch boundary."""

    async def run_continuous(self, input_q, output_q) -> None:
        pending = []
        while True:
            batch = await input_q.get()
            if batch is None:
                break
            pending.append(batch)
            # flush every 2 accumulated frames (continuous batching)
            if len(pending) >= 2:
                for b in pending:
                    b = b.copy()
                    b["n_tokens"] = [len(t.split()) for t in b["text"]]
                    await output_q.put(b)
                pending = []
        for b in pending:  # end-of-stream flush
            b = b.copy()
            b["n_tokens"] = [len(t.split()) for t in b["text"]]
            await output_q.put(b)
        await output_q.put(None)


def main() -> None:
    spark = get_spark(app_name="continuous_serving_pipeline")
    server = ServingQueueServer()
    responses: list[int] = []
    try:
        q = server.queue("requests")
        spark.dataSource.register(QueueServingDataSource)
        stream = (
            spark.readStream.format("cxs_serving")
            .schema("id long, text string")
            .options(**server.options("requests"))
            .load()
        )
        scored = apply_continuous_stage(
            stream, AsyncScore, "id long, text string, n_tokens long"
        )
        handle = serve(scored, lambda df, _bid: responses.append(df.count()))
        try:
            n = 0
            for wave in range(3):  # three client request waves
                for i in range(200):
                    q.put((wave * 1000 + i, f"request body text {wave} {i}"))
                    n += 1
                handle.processAllAvailable()
                print(f"wave {wave}: served so far {sum(responses)}")
        finally:
            handle.stop()
            handle.awaitTermination(30)
            spark.streams.resetTerminated()
    finally:
        server.shutdown()
    assert sum(responses) == n, (sum(responses), n)
    print(f"continuous serving done: {n} requests scored")
    spark.stop()


if __name__ == "__main__":
    main()
