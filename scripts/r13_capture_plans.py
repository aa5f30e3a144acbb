"""Capture .explain("formatted") for a set of queries into plans/r13/.

Usage: python scripts/r13_capture_plans.py <before|after> [query ...]
With no query names, captures the whole bench HEADLINE set.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r13_capture_plans")
    reg = load_registry()
    for name in names:
        try:
            df = reg[name].builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"captured {name}")
        except Exception as exc:  # noqa: BLE001 — record, keep capturing
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
        finally:
            df = None
    spark.stop()


if __name__ == "__main__":
    main()
