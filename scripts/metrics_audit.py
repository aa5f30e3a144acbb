"""Runtime shuffle/spill audit of the bench headline queries.

Where ``plan_audit.py`` counts STATIC plan nodes, this executes each
headline query once and records the RUNTIME totals the Spark UI would
show — rows produced, bytes written to shuffle, spill — the numbers
that actually predict network cost at 100 TB.  Writes METRICS.json at
the repo root; diff it round-over-round alongside PLANS.json.

A query whose wall-time looks fine at sf0.1 but whose shuffle volume
is a large multiple of its input is the one that falls over at 1000x —
this artifact is how that is caught from a laptop-scale run.

Usage:  python scripts/metrics_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from cosmos_xenna_spark.monitoring import query_metrics, summarize  # noqa: E402
from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="metrics_audit")
    reg = load_registry()
    out: dict[str, dict] = {}
    for name in HEADLINE:
        try:
            df = reg[name].builder(spark, sf_dir)
            out[name] = summarize(query_metrics(df))
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        finally:
            df = None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "METRICS.json"
    )
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "metrics": out}, f, indent=1, sort_keys=True)
    ok = {n: m for n, m in out.items() if "error" not in m}
    print(f"audited {len(ok)}/{len(out)} queries -> {path}")
    print("largest shuffle writers:")
    for n, m in sorted(ok.items(), key=lambda kv: -kv[1]["shuffle_bytes_written"])[:10]:
        print(
            f"  {n:<28} shuffleMB={m['shuffle_bytes_written'] / 1e6:<10.2f}"
            f" rows={m['output_rows']:<12} spillMB={m['spill_bytes'] / 1e6:.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
