"""Continuous (asyncio) stages: reference A9 full API parity.

The reference lets a stage own an async loop fed by the engine
(``ContinuousInterface.run_continuous(input_q, output_q)``, reference
``cosmos_xenna/ray_utils/continuous_stage.py:68-79``; pumped by the
worker at ``stage_worker.py:821-957``) — the shape used for
continuous-batching inference servers (vLLM) where requests and
responses decouple.

Spark mapping: the ``mapInPandas`` UDF is a synchronous generator, so
the adapter runs the user's coroutine on a dedicated thread's event
loop and bridges both directions through bounded sync queues —
backpressure included (a slow consumer blocks the feeder, exactly the
reference's bounded asyncio.Queue behavior).

Contract (mirrors the reference):
- the engine puts ``pandas.DataFrame`` batches on ``input_q`` and a
  ``None`` sentinel at end-of-partition;
- ``run_continuous`` consumes until the sentinel, puts result frames
  on ``output_q`` whenever ready (no 1:1 batch correspondence
  required), puts ``None`` when done, and returns.
"""

from __future__ import annotations

import asyncio
import queue as _q
import threading
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cosmos_xenna_spark.operators.stage import Stage


class ContinuousStage(Stage):
    """Subclass and implement ``run_continuous``; ``process_data`` is
    synthesized by the adapter and must not be overridden."""

    async def run_continuous(
        self, input_q: "asyncio.Queue", output_q: "asyncio.Queue"
    ) -> None:
        raise NotImplementedError

    def process_data(self, batch: pd.DataFrame):  # pragma: no cover
        raise RuntimeError("continuous stages run via apply_continuous_stage")


def apply_continuous_stage(df: DataFrame, stage_factory, output_schema) -> DataFrame:
    """Run a ContinuousStage over a DataFrame (batch or streaming)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stage: ContinuousStage = stage_factory()
        stage.setup()
        in_sync: _q.Queue = _q.Queue(maxsize=8)
        out_sync: _q.Queue = _q.Queue(maxsize=8)

        def runner() -> None:
            async def main() -> None:
                loop = asyncio.get_running_loop()
                in_q: asyncio.Queue = asyncio.Queue(maxsize=4)
                out_q: asyncio.Queue = asyncio.Queue(maxsize=4)

                async def feeder() -> None:
                    while True:
                        item = await loop.run_in_executor(None, in_sync.get)
                        await in_q.put(item)
                        if item is None:
                            return

                async def drainer() -> None:
                    while True:
                        item = await out_q.get()
                        if item is None:
                            return
                        await loop.run_in_executor(None, out_sync.put, item)

                feed = asyncio.create_task(feeder())
                drain = asyncio.create_task(drainer())
                await stage.run_continuous(in_q, out_q)
                await feed
                await drain

            try:
                asyncio.run(main())
            except BaseException as e:  # surfaced to the Spark task
                out_sync.put(("__error__", e))
            finally:
                out_sync.put(None)

        t = threading.Thread(target=runner, daemon=True)
        t.start()

        def check(item):
            if isinstance(item, tuple) and item and item[0] == "__error__":
                raise item[1]
            return item

        def pump_and_yield():
            it = iter(batches)
            feeding = True
            while feeding:
                try:
                    pending = next(it)
                except StopIteration:
                    pending = None
                    feeding = False
                # timeout-put so a full in_sync never deadlocks against a
                # full out_sync: drain between attempts
                while True:
                    try:
                        in_sync.put(pending, timeout=0.05)
                        break
                    except _q.Full:
                        while True:
                            try:
                                item = out_sync.get_nowait()
                            except _q.Empty:
                                break
                            if item is None:
                                return
                            yield check(item)
                while True:
                    try:
                        item = out_sync.get_nowait()
                    except _q.Empty:
                        break
                    if item is None:
                        return
                    yield check(item)
            while True:  # input exhausted: blocking drain to the sentinel
                item = out_sync.get()
                if item is None:
                    return
                yield check(item)

        try:
            yield from pump_and_yield()
        finally:
            t.join(timeout=30)
            stage.destroy()

    return df.mapInPandas(fn, schema=output_schema)
