"""Trajectory operators over georeferenced event streams.

``trajectory_length`` is the track-statistics op of a movement-data
pipeline (fleet telemetry, check-in streams): per entity, order its
points in time and fold consecutive-point displacements. Distances are
L1 on an integer grid so every sum is exact int64 — the SQL oracle
(``LAG`` window + ``GROUP BY``) matches bit-for-bit, and the result is
independent of partitioning.

Scale shape: ONE coarse key-hash bucket shuffle of (key, ts, seq, gx,
gy) — five fixed-width columns, never payloads — then each bucket is
sorted and folded in one vectorized pass (lexsort + diff + reduceat),
exactly the sessionization machinery (`windows.session_window_agg`).
Buckets are independent, so skewed entities salt the same way sessions
do. Reference parity: none (beyond-reference north-rule spatio-temporal
surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of


def trajectory_length(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-key L1 path length over points ordered by (ts, seq):
    ``(key, n_moves, l1_len)``; keys with a single point are absent
    (zero moves). ``gx``/``gy`` must be integer grid coordinates."""
    tune_context()

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(k, n_buckets)))

    def fold(group: pa.Table) -> pa.Table:
        key = group.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column(seq_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gx = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gy = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n_moves": pa.array([], pa.int64()),
                "l1_len": pa.array([], pa.int64()),
            }
        )
        if key.size < 2:
            return empty
        order = np.lexsort((seq, ts, key))
        k_s, gx_s, gy_s = key[order], gx[order], gy[order]
        same = k_s[1:] == k_s[:-1]  # consecutive rows, same key
        if not same.any():
            return empty
        step = np.abs(np.diff(gx_s)) + np.abs(np.diff(gy_s))
        owner = k_s[1:][same]  # sorted, since k_s is sorted
        step = step[same]
        starts = np.flatnonzero(np.r_[True, owner[1:] != owner[:-1]])
        return pa.table(
            {
                key_col: pa.array(owner[starts], pa.int64()),
                "n_moves": pa.array(
                    np.diff(np.r_[starts, owner.size]).astype(np.int64)
                ),
                "l1_len": pa.array(np.add.reduceat(step, starts), pa.int64()),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
