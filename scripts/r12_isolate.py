"""Isolated per-query timing: N noop-sink runs of each named query in a
fresh session, printing every sample (cold first-run visible).

Usage: python scripts/r12_isolate.py <runs> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_isolate")
    reg = load_registry()
    for name in names:
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = reg[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples.append(dt)
            df = None
        med = sorted(samples)[len(samples) // 2]
        print(
            f"{name}: median={med:.3f}s samples="
            + " ".join(f"{s:.3f}" for s in samples),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
