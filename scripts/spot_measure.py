"""Spot-measure named registry queries: warm once, then median of N timed
noop-sink runs each (CLAUDE.md stall discipline — never believe one
reading). Prints one line per query: name median [samples].

Usage: python scripts/spot_measure.py q1 q2 ... [--runs N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _reset_state, _run  # noqa: E402
from streaming_ml_with_ksql_spark import registry  # noqa: E402
from streaming_ml_with_ksql_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="spot-measure")
    qs = registry.queries()
    for name in args:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"spot:{name}:warm")
        _run(qs[name](spark, sf_dir))
        _reset_state(spark)
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"spot:{name}:{i}")
            t0 = time.perf_counter()
            _run(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            _reset_state(spark)
        med = statistics.median(samples)
        print(
            f"SPOT {name}: median {med:.2f}s  "
            f"[{', '.join(f'{s:.2f}' for s in samples)}]"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
