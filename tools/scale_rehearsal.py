"""Empirical scale rehearsal (SCALE.md; VERDICT r3 item 9).

Runs the heaviest queries at sf0.1 and at a locally generated larger
SF (tools/gen_scale_data.py), reports per-query wall time and the
fitted scaling exponent alpha where t ~ data_size^alpha
(alpha = log(t_big/t_small) / log(K)).  alpha <= ~1 means the
operator scales (at most) linearly in data size on fixed cores;
alpha >> 1 flags a super-linear candidate-generation or shuffle
blow-up that would not survive 100 TB.

Usage: python tools/scale_rehearsal.py [big_dir] [K] [runs]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bd_spark.queries import registry  # noqa: E402
from bd_spark.session import get_spark  # noqa: E402

HEAVY = [
    "q1_pricing_summary",      # relational baseline (scan+agg)
    "q3_shipping_priority",    # join+agg
    "pipe_dedup_minhash",
    "pipe_dedup_simhash",
    "pipe_dedup_ngram",
    "pipe_dedup_clusters",
    "pipe_embed_neardup",
    "pipe_ann_topk",
    "pipe_ann_ivf",
    "pipe_pq_topk",
    "pipe_curate",
    "pipe_chunk_pack",
    "jq_builtins",
    "jq_canonical",
    "jq_canonical_floats",      # full-input Python {:e} sink (r5)
    "jq_iter_list",
    "q_stream_attribution",
    "pipe_token_budget",        # two-phase bucketed prefix sum (r5)
    "pipe_ann_ivf_trained",     # k-means training iterations (r5)
    "pipe_semantic_dedup",      # SemDeDup clusters + in-cluster pairs (r5)
    "pipe_bpe",                 # BPE training + corpus encoding (r5)
    "pipe_dedup_lines",         # corpus-level line dedup (r5)
    "jq_regex",                 # regex/string builtin batch (r5)
    "pipe_dsir_select",         # DSIR importance resampling (r5)
    "pipe_dedup_substring",     # anchored-window substring dedup (r5)
    "pipe_image_neardup",       # dHash + Hamming pigeonhole (r5)
    "jq_formats",               # math/date/format builtin batch (r5)
    "jq_fold",                  # typed fold lane (r7)
    "jq_sort_ops",              # typed sort-family lane (r7)
    "jq_overloads",             # let-bound array diff (r7)
    "jq_paths",                 # static-path lanes + lean dict (r7)
    "jq_interp_recurse",        # whole-query Arrow interp tier (r7)
    "jq_tostream",              # stream-event round-trip, interp tier (r8)
    "pipe_dedup_incremental",   # shard vs fingerprint index (r9)
]


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    small = "/root/testdata/sf0.1"
    spark = get_spark("scale_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(registry.all_queries())
    qs.update(registry.extra_queries())

    # r7: evaluation-forcing action (bench._force) instead of
    # .count() — count lets Catalyst prune projection-only queries
    # to a bare scan (jq rows measured 0.31 s at BOTH scales, alpha
    # 0.00), so the old jq rehearsal rows measured nothing
    from bench import _force

    def best(fn, sf_dir: str) -> float:
        b = None
        for _ in range(runs):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            b = dt if b is None or dt < b else b
        return b

    out = {}
    for name in HEAVY:
        if only is not None and name not in only:
            continue
        fn = qs[name]
        try:
            t_small = best(fn, small)
            t_big = best(fn, big)
            alpha = math.log(t_big / t_small) / math.log(k)
            out[name] = {
                "t_sf0.1": round(t_small, 2),
                "t_big": round(t_big, 2),
                "alpha": round(alpha, 2),
            }
            print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s  alpha={alpha:.2f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
