"""Registry-wide physical-plan audit — the 100 TB scale report.

For every registered query, compile the physical plan at the given
scale factor and record the metrics that predict cluster behavior:

  - shuffles: hash/range exchanges (each is a full network pass);
  - single_partition: SinglePartition exchanges (all-to-one-task —
    acceptable only for final tiny aggregates);
  - broadcasts: BroadcastExchange nodes (small-side joins, good);
  - parquet_scans: distinct FileScan nodes (InMemoryTableScan
    children are display copies of the cached build plan, not real
    re-scans, and are excluded);
  - bnlj / cartesian: quadratic join fallbacks (must stay on the
    tests/test_plans.py allowlist);
  - codegen_spans: WholeStageCodegen regions (wider = more of the
    query runs fused JVM loops);
  - python_evals: ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    nodes (the deliberate Python islands — Stage API, multimodal).

Writes one JSON object per query to PLANS.json at the repo root and
prints a worst-offenders summary.  Run after adding operators; diff
the committed file to see plan drift round-over-round.

Usage:  python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict[str, int]:
    # Drop the InMemoryTableScan subtrees' display copies: everything
    # printed below an InMemoryTableScan node is the cached plan, not
    # executed again at runtime.
    lines = plan.splitlines()
    kept: list[str] = []
    skip_indent = None
    for ln in lines:
        indent = len(ln) - len(ln.lstrip(" :+-"))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryTableScan" in ln:
            skip_indent = indent
        kept.append(ln)
    body = "\n".join(kept)
    return {
        "shuffles": len(re.findall(r"Exchange (hash|range)partitioning", body)),
        "single_partition": body.count("Exchange SinglePartition"),
        "broadcasts": body.count("BroadcastExchange"),
        "parquet_scans": body.count("Scan parquet"),
        "inmemory_reads": plan.count("InMemoryTableScan"),
        "bnlj": body.count("BroadcastNestedLoopJoin"),
        "cartesian": body.count("CartesianProduct"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", body))),
        "python_evals": sum(
            body.count(n)
            for n in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "BatchEvalPython")
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_audit")
    out: dict[str, dict] = {}
    for name, spec in sorted(load_registry().items()):
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = audit_plan(plan)
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        finally:
            df = None
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "plans": out}, f, indent=1, sort_keys=True)
    ok = {n: m for n, m in out.items() if "error" not in m}
    print(f"audited {len(ok)}/{len(out)} queries -> {path}")
    print("most shuffles:")
    for n, m in sorted(ok.items(), key=lambda kv: -kv[1]["shuffles"])[:10]:
        print(f"  {n:<30} shuffles={m['shuffles']:<3} scans={m['parquet_scans']:<2} "
              f"bc={m['broadcasts']:<2} 1p={m['single_partition']}")
    errs = {n: m["error"] for n, m in out.items() if "error" in m}
    if errs:
        print("errors:", errs)
    spark.stop()


if __name__ == "__main__":
    main()
