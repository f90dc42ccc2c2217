"""Compare staged vs interp tier warm exec for registry jq queries.

Usage: python tools/tierprobe.py [-n RUNS] name [name ...]

For each query name, times min-warm exec (fresh DataFrame per rep,
clearCache per rep, build excluded) under TIER_OVERRIDE=None (cost
model / staged) and TIER_OVERRIDE="interp", and compares row counts.
Diagnostic only — feeds the compile_query cost-router evidence
(SCALE.md r11)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _force  # noqa: E402
from bd_spark.jsonq import compiler  # noqa: E402
from bd_spark.queries.registry import all_queries, extra_queries  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    # -t a,b picks the two compared tiers (staged|interp|auto).
    # Default auto,interp predates the r11 scalar-dispatch signal;
    # for rows the cost model now routes, compare staged,auto or the
    # probe measures the interp tier against itself.
    tiers: list[str | None] = [None, "interp"]
    if args and args[0] == "-t":
        tiers = [
            None if t == "auto" else t for t in args[1].split(",")
        ]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tierprobe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**all_queries(), **extra_queries()}
    print(f"load={os.getloadavg()[0]:.2f} sf={sf_dir} runs={n}")
    for name in args:
        fn = qs[name]
        row = {}
        for tier in tiers:
            compiler.TIER_OVERRIDE = tier
            try:
                times = []
                rows = -1
                build = 0.0
                for _ in range(n):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    t1 = time.perf_counter()
                    _force(df)
                    times.append(time.perf_counter() - t1)
                    build = t1 - t0
                rows = fn(spark, sf_dir).count()
                row[tier or "auto"] = (
                    build, times[0], min(times[1:] or times), rows
                )
            finally:
                compiler.TIER_OVERRIDE = None
        la, lb = (t or "auto" for t in tiers)
        a, b = row[la], row[lb]
        flag = "" if a[3] == b[3] else "  ROWS-MISMATCH"
        print(
            f"{name:18s} {la}: build={a[0]:5.2f} warm={a[2]:5.2f} | "
            f"{lb}: build={b[0]:5.2f} warm={b[2]:5.2f} "
            f"rows={a[3]}/{b[3]} load={os.getloadavg()[0]:.2f}{flag}"
        )


if __name__ == "__main__":
    main()
