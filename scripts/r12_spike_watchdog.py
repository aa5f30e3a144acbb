"""Reproduce the stochastic mega-spike with a watchdog: when a run
exceeds THRESHOLD seconds, capture a JVM jstack + Python thread dump
mid-flight so the stall is attributable.

Usage: python scripts/r12_spike_watchdog.py <runs> <threshold_s> <query> [query ...]
Dumps land in /tmp/spike_dumps/.
"""

from __future__ import annotations

import faulthandler
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    runs = int(sys.argv[1])
    threshold = float(sys.argv[2])
    names = sys.argv[3:]
    os.makedirs(DUMP_DIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_spike_watchdog")
    jpid = _jvm_pid()
    print(f"jvm pid: {jpid}", flush=True)
    reg = load_registry()

    for name in names:
        for i in range(runs):
            done = threading.Event()
            tag = f"{name}_run{i}"

            def watchdog(tag=tag):
                # two captures: at threshold and threshold+10s
                for k in range(2):
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
            print(f"{tag}: wall={dt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
