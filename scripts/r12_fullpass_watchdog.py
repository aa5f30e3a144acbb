"""Full bench-shaped pass (warm-up + N timed passes over bench.HEADLINE)
with a watchdog: any query exceeding <threshold_s> gets a mid-flight
jstack + Python dump into /tmp/spike_dumps/.

Usage: python scripts/r12_fullpass_watchdog.py <passes> <threshold_s>
"""

from __future__ import annotations

import faulthandler
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402

DUMP_DIR = "/tmp/spike_dumps"


def _jvm_pid() -> int | None:
    me = os.getpid()
    out = subprocess.run(
        ["ps", "-eo", "pid,ppid,cmd"], capture_output=True, text=True
    ).stdout
    for line in out.splitlines():
        parts = line.split(None, 2)
        if len(parts) == 3 and parts[1] == str(me) and "java" in parts[2]:
            return int(parts[0])
    return None


def main() -> None:
    passes = int(sys.argv[1])
    threshold = float(sys.argv[2])
    os.makedirs(DUMP_DIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_fullpass_watchdog")
    jpid = _jvm_pid()
    print(f"jvm pid: {jpid}", flush=True)
    reg = load_registry()

    def run_one(name: str, tag: str, timed: bool) -> float:
        done = threading.Event()

        def watchdog():
            for k in range(3):
                if done.wait(threshold if k == 0 else 10.0):
                    return
                stamp = f"{tag}_cap{k}"
                print(f"WATCHDOG firing: {stamp}", flush=True)
                if jpid:
                    with open(f"{DUMP_DIR}/{stamp}.jstack", "w") as f:
                        subprocess.run(["jstack", str(jpid)], stdout=f, stderr=f)
                with open(f"{DUMP_DIR}/{stamp}.pystack", "w") as f:
                    faulthandler.dump_traceback(file=f, all_threads=True)

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        df = reg[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        done.set()
        return dt

    for name in bench.HEADLINE:
        dt = run_one(name, f"warmup_{name}", timed=False)
        if dt > threshold:
            print(f"warmup {name}: {dt:.2f}s SLOW", flush=True)
    print("warm-up done", flush=True)
    for p in range(passes):
        for name in bench.HEADLINE:
            dt = run_one(name, f"p{p}_{name}", timed=True)
            flag = " SLOW" if dt > threshold else ""
            print(f"p{p} {name}: {dt:.2f}s{flag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
