"""Dump .explain("formatted") for registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt per query — the physical plan the
judge checks optimization claims against (plans/r11/*_before.txt /
*_after.txt). Run from the repo revision whose plans you want: a
worktree of the pre-round commit for "before", HEAD for "after".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bd_spark.queries import registry  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = dict(registry.all_queries())
    qs.update(registry.extra_queries())
    qs.update(registry.bench_only_queries())
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    import io
    from contextlib import redirect_stdout

    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
