"""Resumable spatial-join runs — checkpoint at partition granularity.

North-rule contract: a 100-TB join run must survive preemption and
resume WITHOUT redoing finished work. The unit of resumption is a
query-hash partition:

1. queries are assigned to ``n_parts`` stable hash partitions;
2. on (re)start, partitions already marked done in the manifest are
   dropped from the QUERY SIDE BEFORE the join — their compute is
   skipped entirely, not just their write;
3. each finished partition lands as one parquet file + a manifest entry
   carrying lineage (rows, bytes, order-independent checksum, wall
   seconds) via :mod:`..state.manifest`.

The partition function depends only on ``query_id``, so any two runs —
at any parallelism — produce bit-identical partition contents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions.buckets import bucket_of
from ..state import manifest as mf
from . import spatial_join as sj

N_PARTS_DEFAULT = 64


def _qpart(qids: np.ndarray, n_parts: int) -> np.ndarray:
    return bucket_of(qids, n_parts)


def resumable_join(
    boxes: Dataset,
    queries: Dataset,
    path: str,
    res: int = sj.DEFAULT_RES,
    n_parts: int = N_PARTS_DEFAULT,
    **join_kw,
) -> dict:
    """Run (or resume) ``spatial_join(boxes, queries)`` writing results
    to ``path`` partitioned by query hash. Returns the manifest. Safe to
    call repeatedly: finished partitions are skipped before any join
    compute happens."""
    man = mf._load_manifest(path)
    if man["partitions"] and man.get("n_parts") not in (None, n_parts):
        # a resume in a different hash space would skip the wrong queries
        # and overwrite colliding file names with mismatched contents
        raise ValueError(
            f"checkpoint at {path} was written with n_parts="
            f"{man.get('n_parts')}; resume must use the same value "
            f"(got {n_parts})"
        )
    done = {
        int(k) for k, v in man["partitions"].items() if v.get("status") == "done"
    }
    pending_queries = queries
    if done:
        done_arr = np.fromiter(done, dtype=np.int64)

        def drop_done(tbl: pa.Table) -> pa.Table:
            q = tbl.column("query_id").to_numpy(zero_copy_only=False)
            return tbl.filter(pa.array(~np.isin(_qpart(q, n_parts), done_arr)))

        pending_queries = queries.map_batches(
            drop_done, batch_format="pyarrow", zero_copy_batch=True
        )

    pairs = sj.spatial_join(boxes, pending_queries, res=res, **join_kw)

    def part_fn(tbl: pa.Table) -> np.ndarray:
        return _qpart(tbl.column("query_id").to_numpy(zero_copy_only=False), n_parts)

    man = mf.write_partitioned(
        pairs, path, part_fn, coarse_res=0, extra={"kind": "join", "n_parts": n_parts}
    )
    # partitions whose queries matched nothing produce no output group;
    # once the run completes they are done too — record them so resumes
    # don't recompute empty work forever
    changed = False
    for p in range(n_parts):
        if str(p) not in man["partitions"]:
            man["partitions"][str(p)] = {
                "file": None,
                "rows": 0,
                "bytes": 0,
                "checksum": 0,
                "secs": 0.0,
                "status": "done",
            }
            changed = True
    if changed:
        mf._store_manifest(path, man)
    return man


def read_join(path: str, verify: bool = True) -> Dataset:
    return mf.read_partitioned(path, verify=verify)
