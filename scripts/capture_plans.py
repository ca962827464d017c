"""Capture .explain('formatted') for headline queries into plans/$SPARK_GRAFT_PLANS_ROUND/ (default r15).

Usage: python scripts/capture_plans.py before|after [name ...]
Writes plans/<round>/<query>_<tag>.txt for each headline query (or the named
subset). Plan capture is driver-side analysis only — no job runs — so it
is safe to run alongside other Spark work without poisoning timings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from streaming_ml_with_ksql_spark import registry  # noqa: E402
from streaming_ml_with_ksql_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    qs = registry.queries()
    for name in names:
        if name not in qs:
            print(f"  {name}: NOT REGISTERED", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"  {name}: {len(plan)} chars -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
