"""Time individual registry queries in a checked window.

Usage: python tools/qbench.py [-n RUNS] name [name ...]

Prints one line per query: name, cold (first run), warm (min of the
remaining runs), plus the 1-minute loadavg sampled before the query —
an in-flight measurement is only citable when the window is quiet
(load well under the core count and the q1 sentinel lands in band).

Always appends a q1_pricing_summary sentinel so every measurement
carries its own contamination check (VERDICT r8 wrong #1: numbers
from a noisy window were committed as the round record).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _force  # noqa: E402
from bd_spark.queries import registry  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402

SENTINEL = "q1_pricing_summary"
SENTINEL_WARM_MAX = 1.0  # sec; driver history: 0.6-0.95 at sf0.1


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args or ["jq_paths"]
    if SENTINEL not in names:
        names = names + [SENTINEL]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = dict(registry.all_queries())
    qs.update(registry.extra_queries())
    qs.update(registry.bench_only_queries())
    spark = get_spark("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    next(iter(qs.values()))(spark, sf_dir).limit(1).collect()
    for name in names:
        fn = qs[name]
        load = os.getloadavg()[0]
        times = []
        for _ in range(runs):
            # same cache discipline as bench.py (r10): operators that
            # persist() otherwise leak caches across reps AND across
            # queries, inflating later rows ~1.6x
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        warm = min(times[1:]) if len(times) > 1 else times[0]
        flag = ""
        if name == SENTINEL and warm > SENTINEL_WARM_MAX:
            flag = "  << SENTINEL OUT OF BAND: window contaminated"
        print(
            f"{name:28s} cold={times[0]:7.2f}  warm={warm:7.2f}"
            f"  load@start={load:5.2f}{flag}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
