"""10x per-op blowup sweep (VERDICT r4 #5): time the most expensive
bench ops at sf0.01 and sf0.1 (exactly 10x the rows in every table) and
report sec ratios. An op whose wall time grows >12x at 10x data is
superlinear and gets flagged for treatment.

Runs reps interleaved (small, big, small, big, ...) per op so both
levels sample the same host-drift window; per-op MIN over reps is
reported (correct lower bound under co-tenant noise).

Usage: python tools/blowup_sweep.py [op ...]   (default: the top-cost set)
Prints one JSON line: {op: {"t_small": s, "t_big": s, "ratio": r}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT_OPS = (
    "span_box_join track_dtw dbscan kmeans video_frames media_features "
    "lifecycle_query knn_geo priority_fill_rate batch_query_lists "
    "returned_cust_revenue ngram_jaccard market_share large_orders "
    "covisit_triangles boxes_union_area spatial_join box_count "
    "nation_trade_pairs minhash_pairs colocation_pairs mutual_nn "
    "track_hausdorff cluster_size_hist"
).split()

SMALL = os.environ.get("GRAFT_SWEEP_SMALL", "/root/testdata/sf0.01")
BIG = os.environ.get("GRAFT_SWEEP_BIG", "/root/testdata/sf0.1")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    ops = sys.argv[1:] or DEFAULT_OPS
    reps = int(os.environ.get("GRAFT_SWEEP_REPS", "2"))
    # warm the worker pool
    ray.data.range(100_000, override_num_blocks=32).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    out: dict[str, dict] = {}
    for op in ops:
        fn = qs[op]
        ts, tb = [], []
        for _ in range(reps):
            for sf, acc in ((SMALL, ts), (BIG, tb)):
                t0 = time.time()
                res = fn(sf)
                if hasattr(res, "count"):
                    res.count()
                acc.append(time.time() - t0)
        t_small, t_big = min(ts), min(tb)
        out[op] = {
            "t_small": round(t_small, 3),
            "t_big": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }
        print(f"{op}: {out[op]}", file=sys.stderr)
    flagged = {k: v for k, v in out.items() if v["ratio"] > 12}
    print(json.dumps({"ops": out, "superlinear": flagged}))
    ray.shutdown()


if __name__ == "__main__":
    main()
