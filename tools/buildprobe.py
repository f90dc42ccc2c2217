"""Count + time driver-side DataFrame ops during a query's plan BUILD.

Usage: python tools/buildprobe.py [name ...]   (default: jq_paths)

Monkeypatches DataFrame.withColumn/withColumns/select/where/drop/
unionByName and Column ops counting to attribute plan-build wall time
to call sites. Diagnostic only — never imported by the engine."""

from __future__ import annotations

import collections
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from bd_spark.queries import registry  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402

COUNTS: dict[str, int] = collections.Counter()
TIMES: dict[str, float] = collections.Counter()
SITES: dict[tuple[str, str], float] = collections.Counter()
SITE_N: dict[tuple[str, str], int] = collections.Counter()


def _wrap(name):
    orig = getattr(DataFrame, name)

    def wrapped(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        dt = time.perf_counter() - t0
        COUNTS[name] += 1
        TIMES[name] += dt
        # nearest caller inside bd_spark
        for fr in reversed(traceback.extract_stack(limit=25)):
            if "bd_spark" in fr.filename:
                key = (name, f"{os.path.basename(fr.filename)}:{fr.lineno}")
                SITES[key] += dt
                SITE_N[key] += 1
                break
        return out

    setattr(DataFrame, name, wrapped)


def main() -> None:
    names = sys.argv[1:] or ["jq_paths"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = dict(registry.all_queries())
    qs.update(registry.extra_queries())
    qs.update(registry.bench_only_queries())
    spark = get_spark("buildprobe")
    spark.sparkContext.setLogLevel("ERROR")
    next(iter(qs.values()))(spark, sf_dir).limit(1).collect()  # JVM warm
    for m in ("withColumn", "withColumns", "select", "where", "filter",
              "drop", "unionByName", "repartition"):
        _wrap(m)
    for name in names:
        COUNTS.clear(); TIMES.clear(); SITES.clear(); SITE_N.clear()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.schema  # noqa: B018
        analyze = time.perf_counter() - t0
        print(f"\n== {name}: build={build:.2f}s analyze={analyze:.2f}s "
              f"load={os.getloadavg()[0]:.2f}")
        for m in sorted(TIMES, key=TIMES.get, reverse=True):
            print(f"  {m:14s} n={COUNTS[m]:4d} t={TIMES[m]:6.2f}s")
        top = sorted(SITES.items(), key=lambda kv: kv[1], reverse=True)[:14]
        for (m, site), t in top:
            print(f"    {t:6.2f}s n={SITE_N[(m, site)]:4d} {m:12s} {site}")


if __name__ == "__main__":
    main()
