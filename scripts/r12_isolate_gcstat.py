"""Like r12_isolate.py but printing the JVM GC-time delta next to each
wall sample, to attribute intra-session spikes (JIT vs GC vs plan).

Usage: python scripts/r12_isolate_gcstat.py <runs> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def _jvm_gc_ms(spark) -> int:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()  # noqa: SLF001
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_isolate_gcstat")
    reg = load_registry()
    for name in names:
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            gc0 = _jvm_gc_ms(spark)
            t0 = time.perf_counter()
            df = reg[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            gc1 = _jvm_gc_ms(spark)
            print(f"{name} run{i}: wall={dt:.3f}s gc_delta={gc1 - gc0}ms", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
