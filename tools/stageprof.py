"""Profile one registry query's stages via the Spark event log.

Usage: python tools/stageprof.py <query_name> [reps]

Runs the query reps+1 times (cold + reps warm, clearCache per rep)
in a session with the event log on (SPARK_GRAFT_EXTRA_CONFS), then
parses the log for the LAST rep: per-stage wall duration, task
count, and stage name.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGDIR = "/tmp/sparklogs"


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR, exist_ok=True)
    os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
        f"spark.eventLog.enabled=true;spark.eventLog.dir=file://{LOGDIR}"
        ";spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"
    )

    from bench import _force
    from bd_spark.queries import registry
    from bd_spark.session import get_spark

    spark = get_spark("stageprof")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.eventLog.enabled") == "true"
    qs = dict(registry.all_queries())
    qs.update(registry.extra_queries())
    qs.update(registry.bench_only_queries())
    fn = qs[name]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    marks = []
    for i in range(reps + 1):
        spark.catalog.clearCache()
        t0 = time.time()
        _force(fn(spark, sf_dir))
        dt = time.time() - t0
        marks.append((t0 * 1000, dt))
        print(f"rep {i}: {dt:.2f}s")
    spark.stop()

    last_start = marks[-1][0]
    files = []
    for root, _dirs, fnames in os.walk(LOGDIR):
        for f in fnames:
            if f.startswith(".") or f.endswith(".crc"):
                continue
            files.append(os.path.join(root, f))
    rows = []
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if not sub or sub < last_start:
                    continue
                rows.append((
                    sub, (comp - sub) / 1000.0,
                    si.get("Number of Tasks"),
                    si.get("Stage Name", "")[:100],
                ))
    rows.sort()
    total = 0.0
    for sub, dur, ntasks, sname in rows:
        total += dur
        print(f"+{(sub - last_start)/1000.0:6.2f}s  dur={dur:6.2f}s "
              f"tasks={ntasks:4d}  {sname}")
    print(f"sum of stage durations: {total:.2f}s (wall {marks[-1][1]:.2f}s)")


if __name__ == "__main__":
    main()
