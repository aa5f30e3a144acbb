"""Like r12_isolate.py but with optional per-run GC (python + JVM) to
probe block-manager / finalizer pollution across queries in one session.

Usage: python scripts/r12_isolate_gc.py <gc:0|1> <runs> <query> [query ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def main() -> None:
    do_gc = sys.argv[1] == "1"
    runs = int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_isolate_gc")
    reg = load_registry()
    for name in names:
        samples = []
        for i in range(runs):
            t0 = time.perf_counter()
            df = reg[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            df = None
            if do_gc:
                gc.collect()
                try:
                    spark.sparkContext._jvm.System.gc()  # noqa: SLF001
                except Exception:  # noqa: BLE001
                    pass
        print(
            f"{name}: samples=" + " ".join(f"{s:.3f}" for s in samples),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
