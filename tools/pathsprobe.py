"""Decompose jq_paths warm exec: time each dict component alone.

Usage: python tools/pathsprobe.py [-n RUNS]

Runs the full jq_paths dict plus one-key variants (flat / k2 / upd /
nkeys) at $SPARK_GRAFT_SF_DIR, each as min-warm over RUNS fresh
DataFrames. Diagnostic only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _force  # noqa: E402
from bd_spark.jsonq.runtime import JsonQ  # noqa: E402
from bd_spark.catalog import table  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402

VARIANTS = {
    "full": '{flat: ([leaf_paths | join("/")] | join(",")),'
            ' k2: getpath(["k"]),'
            ' upd: (setpath(["k2"]; getpath(["k"]) * 2) | tojson),'
            ' nkeys: (foreach paths as $p (0; . + 1))}',
    "flat": '{flat: ([leaf_paths | join("/")] | join(","))}',
    "k2": '{k2: getpath(["k"])}',
    "upd": '{upd: (setpath(["k2"]; getpath(["k"]) * 2) | tojson)}',
    "nkeys": '{nkeys: (foreach paths as $p (0; . + 1))}',
    "flat+nkeys": '{flat: ([leaf_paths | join("/")] | join(",")),'
                  ' nkeys: (foreach paths as $p (0; . + 1))}',
    "upd_nojson": '{upd: setpath(["k2"]; getpath(["k"]) * 2)}',
    "tojson": '{t: tojson}',
}


def main() -> None:
    n = 3
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n = int(sys.argv[2])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pathsprobe")
    spark.sparkContext.setLogLevel("ERROR")
    ev = table(spark, "events", sf_dir).select("event_id", "props")
    jq = JsonQ(spark)
    jq.run(".", jq.stream_from_text_column(
        ev.limit(10), "props", seq_col="event_id"), ordered=False).collect()
    print(f"load={os.getloadavg()[0]:.2f} sf={sf_dir} runs={n}")
    for name, q in VARIANTS.items():
        times = []
        build = 0.0
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            stream = jq.stream_from_text_column(ev, "props", seq_col="event_id")
            df = jq.run(q, stream, ordered=False)
            t1 = time.perf_counter()
            _force(df)
            times.append(time.perf_counter() - t1)
            build = t1 - t0
        print(f"{name:12s} build={build:6.2f} exec1={times[0]:6.2f} "
              f"warm={min(times[1:] or times):6.2f} load={os.getloadavg()[0]:.2f}")
    # whole-query Arrow interp tier on the FULL program, for comparison
    from bd_spark.jsonq import compiler, parser

    times = []
    for _ in range(n):
        spark.catalog.clearCache()
        stream = jq.stream_from_text_column(ev, "props", seq_col="event_id")
        t1 = time.perf_counter()
        df = compiler._interp_tier(parser.parse(VARIANTS["full"]))(stream)
        _force(df)
        times.append(time.perf_counter() - t1)
    print(f"{'full@interp':12s} build=  0.00 exec1={times[0]:6.2f} "
          f"warm={min(times[1:] or times):6.2f} load={os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
