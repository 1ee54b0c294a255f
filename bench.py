"""Benchmark harness.

Headline pipeline (the BASELINE.json metric): synthesize the interleaved
text+media document corpus (sf-proportional), georeference every doc's
spans, assign H3/S2-style tiles, and spatial-join against derived query
regions — reporting docs/sec end to end.

Also times each oracle-checked operator pipeline over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "headline_docs": N}

--scaling: runs the headline twice in fresh processes (num_cpus=8 and
32) on the same input and reports throughput at both plus scaling
efficiency = (T_8 / T_32) / 4 — the sandbox stand-in for the N vs 4N
node criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def headline(sf_dir: str, num_cpus: int, mult: int = 1) -> dict:
    """Interleaved corpus → georef → tile-cover → spatial join; fully
    streaming (consumed by count(), never materialized on the driver)."""
    import pyarrow.parquet as pq

    from python_prtree_ray.sources.synth import interleaved_docs, georef_batch
    from python_prtree_ray.sources import tables
    from python_prtree_ray.pipelines.spatial_join import broadcast_join
    from python_prtree_ray.pipelines.tiling import tile_cover

    import ray

    n_docs = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows * 4 * mult
    # warm up the worker pool so the timing reflects steady-state
    # throughput, not Ray worker cold-start
    ray.data.range(100_000, override_num_blocks=num_cpus).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    t0 = time.time()
    docs = interleaved_docs(n_docs, override_num_blocks=max(num_cpus * 4, 16))
    geo = docs.map_batches(georef_batch, batch_format="pyarrow", zero_copy_batch=True)
    # Materialize the derived boxes ONCE (25 B/doc projection — the heavy
    # interleaved spans are dropped first and never recomputed) and feed
    # both consumers from the object store. On a multi-node cluster the
    # object store is distributed, so this handoff scales with nodes;
    # the durable variant (write_parquet + read_parquet, resumable) is
    # exercised by the persistence pipeline/tests instead.
    boxes = geo.select_columns(["idx", "xmin", "ymin", "xmax", "ymax"]).materialize()
    n_tiles, ck_tiles = _consume(tile_cover(boxes, res=6))
    n_pairs, ck_pairs = _consume(broadcast_join(boxes, tables.query_boxes_table(sf_dir)))
    wall = time.time() - t0
    return {
        "sec": wall,
        "docs": n_docs,
        "docs_per_sec": n_docs / wall,
        "tile_assignments": n_tiles,
        "join_pairs": n_pairs,
        "tile_checksum": ck_tiles,
        "pair_checksum": ck_pairs,
    }


def _consume(ds) -> tuple[int, int]:
    """Row count + order-independent XOR checksum, reduced INSIDE the
    producing tasks (Ray fuses the map stages), so the full result rows
    are computed but never shipped through the object store — the
    single-box stand-in for each node writing its shard to local/cloud
    storage. The checksum pins value-level determinism across runs and
    parallelism levels; full values are oracle-checked at sf0.01."""
    import numpy as np
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        ck = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in t.column_names:
                col = t.column(c).to_numpy(zero_copy_only=False)
                if col.dtype.kind in "iu" and col.size:
                    # mix position-independently: hash each value, xor-reduce
                    h = col.astype(np.int64).view(np.uint64) * np.uint64(
                        0x9E3779B97F4A7C15
                    )
                    h ^= h >> np.uint64(29)
                    ck ^= np.bitwise_xor.reduce(h)
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "ck": pa.array([int(ck)], type=pa.uint64()),
            }
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = sum(r["n"] for r in rows)
    ck = 0
    for r in rows:
        ck ^= r["ck"]
    return n, ck


QUERY_SUBSET = (
    "spatial_join self_join point_query knn pip tile_points tile_cover "
    "dedup_exact token_stats quality_score lang_id events_window ann_topk "
    "minhash_pairs simhash ngram_jaccard events_hopping events_session "
    "top_events spatial_join_obj batch_query_lists spatial_join_3d"
).split()


def run_queries(sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in QUERY_SUBSET:
        fn = qs[name]
        t0 = time.time()
        res = fn(sf_dir)
        # consume the pipeline (Dataset is lazy)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # Scaling criterion: the SAME job at 8 vs 32 CPUs in fresh
        # processes. The corpus is enlarged (GRAFT_SCALE_MULT x the
        # per-sf doc count, default 16x -> ~9.6M docs at sf0.1) so wall
        # time is dominated by the pipeline, not session fixed costs —
        # the regime a real 100 TB run is always in.
        results = {}
        for n in (8, 32):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(n)
            env["GRAFT_SF_DIR"] = sf_dir
            env["GRAFT_HEADLINE_MULT"] = os.environ.get("GRAFT_SCALE_MULT", "16")
            best = None
            for _rep in range(2):  # best-of-2: the sandbox VM is noisy
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--headline-only"],
                    env=env,
                    capture_output=True,
                    text=True,
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                if best is None or r["value"] < best["value"]:
                    best = r
            results[n] = best
        t8 = results[8]["value"]
        t32 = results[32]["value"]
        eff = (t8 / t32) / 4.0
        print(
            json.dumps(
                {
                    "metric": "headline_scaling",
                    "sf_dir": sf_dir,
                    "docs": results[32]["headline_docs"],
                    "t_8cpu_sec": t8,
                    "t_32cpu_sec": t32,
                    "docs_per_sec_8cpu": results[8]["docs_per_sec"],
                    "docs_per_sec_32cpu": results[32]["docs_per_sec"],
                    "scaling_efficiency": round(eff, 3),
                    # identical result checksums at both parallelism levels
                    # == value-level determinism across cluster sizes
                    "deterministic_across_parallelism": (
                        results[8]["tile_checksum"] == results[32]["tile_checksum"]
                        and results[8]["pair_checksum"] == results[32]["pair_checksum"]
                    ),
                }
            )
        )
        return

    _init_ray(num_cpus)
    import ray

    h = headline(sf_dir, num_cpus, mult=int(os.environ.get("GRAFT_HEADLINE_MULT", "1")))
    queries = {} if "--headline-only" in sys.argv else run_queries(sf_dir)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "interleaved_spatial_join_tile_headline",
                "value": round(h["sec"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "num_cpus": num_cpus,
                "docs_per_sec": round(h["docs_per_sec"], 1),
                "headline_docs": h["docs"],
                "tile_assignments": h["tile_assignments"],
                "join_pairs": h["join_pairs"],
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
