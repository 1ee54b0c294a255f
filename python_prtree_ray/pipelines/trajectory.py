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


def _dp_keep(x: np.ndarray, y: np.ndarray, eps: int) -> np.ndarray:
    """Douglas-Peucker keep mask over ONE track (points in path order).

    Exact integer arithmetic: a point survives a segment (a, b) when its
    perpendicular deviation exceeds eps, tested as
    ``cross(p-a, b-a)^2 > eps^2 * |b-a|^2`` (degenerate a==b falls back
    to squared point distance) — no floats, so the result is bitwise
    reproducible and partitioning-invariant. With grid coords < 2^20
    every term fits int64. Recursion is an explicit stack; the
    per-segment deviation scan is vectorized."""
    n = x.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = np.int64(eps) * np.int64(eps)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        dx, dy = bx - ax, by - ay
        px = x[i + 1 : j] - ax
        py = y[i + 1 : j] - ay
        l2 = dx * dx + dy * dy
        if l2 == 0:
            num = px * px + py * py
            den = np.int64(1)
        else:
            cr = px * dy - py * dx
            num = cr * cr
            den = l2
        m = int(np.argmax(num))  # first max: deterministic split point
        if num[m] > eps2 * den:
            k = i + 1 + m
            keep[k] = True
            stack.append((k, j))
            stack.append((i, k))
    return keep


def trajectory_simplify(
    tracks: Dataset,
    eps: int = 2,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-key Douglas-Peucker line simplification over points ordered
    by (ts, seq): the kept points ``(key, seq, gx, gy)`` of every track
    (track endpoints always kept; single-point tracks kept whole).

    The movement-data compaction op: telemetry tracks shrink to their
    shape-defining vertices before storage/rendering. Scale shape is
    :func:`trajectory_length`'s — ONE coarse key-hash shuffle of five
    fixed-width int columns, then per-bucket lexsort + per-track
    vectorized DP (tracks within a bucket are independent; the
    per-track loop is over TRACKS, not rows). Integer deviation test →
    bitwise-identical output at any parallelism (pytest-oracled against
    a recursive reference implementation; no SQL twin — recursive
    geometry is outside the oracle dialect).
    """
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
        if key.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    seq_col: pa.array([], pa.int64()),
                    x_col: pa.array([], pa.int64()),
                    y_col: pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((seq, ts, key))
        k_s, s_s = key[order], seq[order]
        gx_s, gy_s = gx[order], gy[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        ends = np.r_[starts[1:], k_s.size]
        keep = np.zeros(k_s.size, dtype=bool)
        for a, b in zip(starts, ends):  # loop over tracks, not rows
            keep[a:b] = _dp_keep(gx_s[a:b], gy_s[a:b], eps)
        return pa.table(
            {
                key_col: pa.array(k_s[keep], pa.int64()),
                seq_col: pa.array(s_s[keep], pa.int64()),
                x_col: pa.array(gx_s[keep], pa.int64()),
                y_col: pa.array(gy_s[keep], pa.int64()),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
