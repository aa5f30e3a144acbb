"""Per-run wall time vs JVM counters (GC time, JIT compilation time,
code-cache / metaspace pool usage, storage-memory status) to attribute
intra-session spikes.

Usage: python scripts/r12_isolate_jitstat.py <runs> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def _mf(spark):
    return spark.sparkContext._jvm.java.lang.management.ManagementFactory  # noqa: SLF001


def _gc_ms(spark) -> int:
    total = 0
    it = _mf(spark).getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total


def _jit_ms(spark) -> int:
    return _mf(spark).getCompilationMXBean().getTotalCompilationTime()


def _pools(spark) -> dict:
    out = {}
    it = _mf(spark).getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name or name == "Compressed Class Space":
            u = p.getUsage()
            out[name] = u.getUsed() // (1024 * 1024)
    return out


def _storage(spark) -> str:
    try:
        status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()  # noqa: SLF001
        s = status.toString()
        return s[:120]
    except Exception:  # noqa: BLE001
        return "?"


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_isolate_jitstat")
    reg = load_registry()
    for name in names:
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            gc0, jit0 = _gc_ms(spark), _jit_ms(spark)
            t0 = time.perf_counter()
            df = reg[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            gc1, jit1 = _gc_ms(spark), _jit_ms(spark)
            pools = _pools(spark)
            pstr = " ".join(f"{k.replace(' ', '_')}={v}M" for k, v in sorted(pools.items()))
            print(
                f"{name} run{i}: wall={dt:.3f}s gc_d={gc1 - gc0}ms jit_d={jit1 - jit0}ms {pstr}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
