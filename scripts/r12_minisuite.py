"""Bench-protocol probe: interleaved passes over a fixed mini-suite,
optional per-query GC, optional extra driver JVM opts.

Usage: r12_minisuite.py <gc:0|1> <passes>   (suite is fixed below)
Env: SPARK_GRAFT_XJAVA extra driver JVM options.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402

SUITE = [
    "q_dsir_weights",
    "q_rfm_scores",
    "q_eccentricity_probes",
    "q_kmv_set_ops",
    "q_image_phash_pairs",
    "q_setsim_prefix_join",
    "q_golden_record",
    "q_simhash_pairs",
]


def main() -> None:
    do_gc = sys.argv[1] == "1"
    passes = int(sys.argv[2])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {}
    if os.environ.get("SPARK_GRAFT_XJAVA"):
        extra["spark.driver.extraJavaOptions"] = os.environ["SPARK_GRAFT_XJAVA"]
    spark = get_spark(app_name="r12_minisuite", extra_confs=extra)
    reg = load_registry()
    # warm-up pass (untimed)
    for name in SUITE:
        reg[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        if do_gc:
            gc.collect()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    samples: dict[str, list[float]] = {n: [] for n in SUITE}
    for _ in range(passes):
        for name in SUITE:
            t0 = time.perf_counter()
            df = reg[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            df = None
            if do_gc:
                gc.collect()
                spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    tot = 0.0
    for n, ss in samples.items():
        med = sorted(ss)[len(ss) // 2]
        tot += med
        print(f"{n}: median={med:.3f} samples=" + " ".join(f"{s:.2f}" for s in ss))
    print(f"TOTAL_MEDIANS={tot:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
