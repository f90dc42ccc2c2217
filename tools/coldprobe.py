"""Break a query's COLD time into build / analyze / plan / first-exec
phases, and report first-exec codegen size.

Usage: python tools/coldprobe.py [name ...]   (default: jq_paths)

Phases per query (fresh session state, first touch):
  build    — Python-side DataFrame construction (Py4J round-trips)
  analyze  — df.schema (analysis)
  plan     — optimizer + physical planning (executedPlan)
  codegen  — WholeStageCodegen source generation + size (debug
             codegenString over the executed plan; compile happens
             lazily at first execution, so this approximates it)
  exec1    — first real execution (_force), includes Janino compile
  exec2    — second execution of a FRESH DataFrame (warm floor)

Run exclusively (no concurrent Spark) and check the printed loadavg;
numbers from a loaded window are not citable
(bench-measurement-discipline)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _force  # noqa: E402
from bd_spark.queries import registry  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["jq_paths"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = dict(registry.all_queries())
    qs.update(registry.extra_queries())
    qs.update(registry.bench_only_queries())
    spark = get_spark("coldprobe")
    spark.sparkContext.setLogLevel("ERROR")
    next(iter(qs.values()))(spark, sf_dir).limit(1).collect()  # JVM warm
    print(f"load={os.getloadavg()[0]:.2f} sf={sf_dir}")
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.schema  # noqa: B018 - forces analysis
        t2 = time.perf_counter()
        jqe = df._jdf.queryExecution()
        jplan = jqe.executedPlan()
        t3 = time.perf_counter()
        try:
            jvm = spark.sparkContext._jvm
            pkg = getattr(
                getattr(jvm.org.apache.spark.sql.execution.debug, "package$"),
                "MODULE$",
            )
            code = pkg.codegenString(jplan)
            nbytes = len(code)
            nunits = code.count("WholeStageCodegen subtree")
        except Exception:  # noqa: BLE001
            nbytes, nunits = -1, -1
        t4 = time.perf_counter()
        _force(df)
        t5 = time.perf_counter()
        _force(fn(spark, sf_dir))  # fresh DataFrame: true warm floor
        t6 = time.perf_counter()
        print(
            f"{name:24s} build={t1 - t0:6.2f} analyze={t2 - t1:6.2f} "
            f"plan={t3 - t2:6.2f} cgen={t4 - t3:6.2f} exec1={t5 - t4:6.2f} "
            f"exec2={t6 - t5:6.2f} codegen={nbytes / 1024:.0f}KB/{nunits}u "
            f"load={os.getloadavg()[0]:.2f}"
        )


if __name__ == "__main__":
    main()
