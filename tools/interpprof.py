"""Profile the interp tier's per-row cost WITHOUT Spark (guide §1:
measure first). Reads the parquet input directly with pyarrow,
reconstructs the stream docs the way runtime.stream_from_table does,
and times the three per-row components of _interp_tier.batches —
json.loads, interp.run, dumps_tagged — plus an optional cProfile of
interp.run.

Usage: python tools/interpprof.py [-n ROWS] [--profile] QUERY
where QUERY is a registry jq row name (program extracted from
jsonq_queries.py via tools/routercount.py)."""

from __future__ import annotations

import cProfile
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bd_spark.jsonq import interp, parser  # noqa: E402
from tools.routercount import extract_programs  # noqa: E402

# registry jq rows -> (table, columns, mode) their stream is built
# from (mirrors each query fn: "row" = stream_from_table full-row
# docs; "text:COL" = stream_from_text_column docs, i.e. the parsed
# JSON text of that column)
_STREAMS = {
    "jq_formats": ("events", ["event_id", "event_type", "props"], "row"),
    "jq_datetime": ("events", ["event_id", "props"], "row"),
    "jq_bitwise": ("events", ["props"], "text:props"),
    "jq_overloads": (
        "documents", ["doc_id", "lang", "text", "n_chars"], "row"
    ),
    "jq_defs": (
        "documents", ["doc_id", "text", "lang", "source", "n_chars"], "row"
    ),
    "jq_slices": ("documents", ["doc_id", "text"], "row"),
    "jq_paths": ("events", ["event_id", "props"], "row"),
    "jq_regex": ("documents", ["doc_id", "lang", "text"], "row"),
    "jq_update": ("documents", ["doc_id", "text"], "row"),
    "jq_recurse_props": ("events", ["event_id", "props"], "row"),
}


def docs_for(name: str, sf_dir: str, limit: int) -> list[str]:
    import pyarrow.parquet as pq

    tbl, cols, mode = _STREAMS[name]
    path = os.path.join(sf_dir, f"{tbl}.parquet")
    t = pq.read_table(path, columns=cols)
    rows = t.slice(0, limit).to_pylist()
    if mode.startswith("text:"):
        col = mode.split(":", 1)[1]
        return [r[col] for r in rows]
    return [
        json.dumps(r, ensure_ascii=False, separators=(",", ":"))
        for r in rows
    ]


def main() -> None:
    args = sys.argv[1:]
    n = 20000
    prof = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            n = int(args[i + 1])
            i += 2
        elif args[i] == "--profile":
            prof = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    progs = extract_programs(
        os.path.join(here, "bd_spark", "queries", "jsonq_queries.py")
    )
    for name in names:
        node = parser.parse(progs[name][0])
        vjs = docs_for(name, sf_dir, n)
        t0 = time.perf_counter()
        docs = [json.loads(vj) for vj in vjs]
        t_loads = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [interp.run(node, d) for d in docs]
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        ndump = 0
        for entries in outs:
            for v, e in entries:
                if e is None:
                    interp.dumps_tagged(v)
                    ndump += 1
        t_dump = time.perf_counter() - t0
        print(
            f"{name:16s} rows={len(vjs)} loads={t_loads:.3f}s "
            f"run={t_run:.3f}s dumps={t_dump:.3f}s outs={ndump}"
        )
        if prof:
            pr = cProfile.Profile()
            pr.enable()
            for d in docs[: min(len(docs), 5000)]:
                interp.run(node, d)
            pr.disable()
            st = pstats.Stats(pr)
            st.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
