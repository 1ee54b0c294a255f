"""Distributed as-of (point-in-time) join — an operator Ray Data lacks.

For every left row, find the LATEST right row of the same key with
``right.ts <= left.ts`` (inner semantics: unmatched lefts drop).

Shape: both sides shuffle ONCE by a coarse key-hash bucket (same key →
same bucket, so correctness never crosses group boundaries); inside a
group the whole match is a vectorized sort + ``searchsorted`` over a
packed (key_rank, ts_rank) int64 key — no per-key loop, no global
sort. Right rows that tie on (key, ts) are deduplicated to the max
right-id first, making the result deterministic (and the SQL oracle
well-defined).

Partitioning assumption (documented per the custom-operator contract):
the only requirement is same-key co-location, provided by the bucket
hash; skewed keys cost only within-group sort time, not correctness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import tune_context
from ..functions.buckets import bucket_of

N_BUCKETS = 256


def asof_join(
    left: Dataset,
    right: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "l_id",
    right_id: str = "r_id",
) -> Dataset:
    """left(key, ts, l_id) ASOF right(key, ts, r_id) →
    (l_id, key, l_ts, r_id, r_ts)."""
    tune_context()

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "b": bucket_of(k, N_BUCKETS),
                    "side": np.full(tbl.num_rows, side, dtype=np.int8),
                    "key": k,
                    "ts": tbl.column(ts_col).cast(pa.timestamp("us")),
                    "rid": tbl.column(left_id if side == 0 else right_id).cast(
                        pa.int64()
                    ),
                }
            )

        return fn

    union = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))

    def match(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        rid = group.column("rid").to_numpy(zero_copy_only=False)
        lm = side == 0
        empty = pa.table(
            {
                "l_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "l_ts": pa.array([], pa.timestamp("us")),
                "r_id": pa.array([], pa.int64()),
                "r_ts": pa.array([], pa.timestamp("us")),
            }
        )
        if not lm.any() or lm.all():
            return empty
        lk, lt, lid_ = key[lm], ts[lm], rid[lm]
        rk, rt, rid_ = key[~lm], ts[~lm], rid[~lm]
        # dedup right per (key, ts): keep max rid (deterministic ties)
        order = np.lexsort((rid_, rt, rk))
        rk, rt, rid_ = rk[order], rt[order], rid_[order]
        last = np.ones(rk.shape[0], dtype=bool)
        last[:-1] = (np.diff(rk) != 0) | (np.diff(rt) != 0)
        rk, rt, rid_ = rk[last], rt[last], rid_[last]
        # pack (key_rank, ts_RANK) into one monotonic int64 — ranks, not
        # microsecond offsets, so the product is bounded by (rows/bucket)²
        # instead of n_keys × time-span-µs (which overflows at ~400k keys
        # over 30 years). Equal timestamps share a rank, so <=-ordering is
        # preserved exactly.
        all_keys = np.unique(np.concatenate([lk, rk]))
        all_ts = np.unique(np.concatenate([lt, rt]))
        span = np.int64(all_ts.shape[0] + 1)
        if all_keys.shape[0] < (1 << 62) // span:
            r_packed = np.searchsorted(all_keys, rk) * span + np.searchsorted(
                all_ts, rt
            )
            l_packed = np.searchsorted(all_keys, lk) * span + np.searchsorted(
                all_ts, lt
            )
            pos = np.searchsorted(r_packed, l_packed, side="right") - 1
            valid = pos >= 0
            valid[valid] &= rk[pos[valid]] == lk[valid]
        else:
            # overflow-proof fallback (only reachable at ~2^31 rows in ONE
            # bucket): per-key segment searchsorted
            pos = np.full(lk.shape[0], -1, dtype=np.int64)
            seg_lo = np.searchsorted(rk, lk, side="left")
            seg_hi = np.searchsorted(rk, lk, side="right")
            for key in np.unique(lk):
                sel = lk == key
                lo, hi = seg_lo[sel][0], seg_hi[sel][0]
                if hi > lo:
                    p = lo + np.searchsorted(rt[lo:hi], lt[sel], side="right") - 1
                    p[p < lo] = -1
                    pos[sel] = p
            valid = pos >= 0
        pos_v = pos[valid]
        return pa.table(
            {
                "l_id": pa.array(lid_[valid], pa.int64()),
                "key": pa.array(lk[valid], pa.int64()),
                "l_ts": pa.array(
                    lt[valid].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "r_id": pa.array(rid_[pos_v], pa.int64()),
                "r_ts": pa.array(
                    rt[pos_v].astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return union.groupby("b").map_groups(match, batch_format="pyarrow")


def band_join(
    left: Dataset,
    right: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "l_id",
    right_id: str = "r_id",
    lo_offset_us: int = -3_600_000_000,
    hi_offset_us: int = 0,
) -> Dataset:
    """Time-BAND join: every (left, right) pair of the same key with
    ``left.ts + lo_offset <= right.ts <= left.ts + hi_offset`` (both ends
    inclusive; the default band is "right events in the hour BEFORE each
    left event"). The 1:N windowed sibling of :func:`asof_join` (which
    keeps only the latest match).

    Same shape: ONE coarse key-hash-bucket shuffle of both sides, then a
    fully vectorized in-bucket range match — right sorted by (key, ts)
    once, per-left [lo, hi) bounds via rank-packed ``searchsorted``, and
    a repeat/arange expansion (the same walk as the hash join's
    duplicate-key expansion). No per-key loop, no global sort."""
    tune_context()
    if lo_offset_us > hi_offset_us:
        raise ValueError("lo_offset_us must be <= hi_offset_us")

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "b": bucket_of(k, N_BUCKETS),
                    "side": np.full(tbl.num_rows, side, dtype=np.int8),
                    "key": k,
                    "ts": tbl.column(ts_col).cast(pa.timestamp("us")),
                    "rid": tbl.column(left_id if side == 0 else right_id).cast(
                        pa.int64()
                    ),
                }
            )

        return fn

    union = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))

    def match(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        rid = group.column("rid").to_numpy(zero_copy_only=False)
        lm = side == 0
        empty = pa.table(
            {
                "l_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "l_ts": pa.array([], pa.timestamp("us")),
                "r_id": pa.array([], pa.int64()),
                "r_ts": pa.array([], pa.timestamp("us")),
            }
        )
        if not lm.any() or lm.all():
            return empty
        lk, lt, lid_ = key[lm], ts[lm], rid[lm]
        rk, rt, rid_ = key[~lm], ts[~lm], rid[~lm]
        order = np.lexsort((rid_, rt, rk))
        rk, rt, rid_ = rk[order], rt[order], rid_[order]
        lo_val, hi_val = lt + lo_offset_us, lt + hi_offset_us
        # rank-pack (key, ts) so ONE sorted array answers every range
        # (see asof_join's overflow note: ranks, not raw microseconds)
        all_keys = np.unique(np.concatenate([lk, rk]))
        all_ts = np.unique(np.concatenate([rt, lo_val, hi_val]))
        span = np.int64(all_ts.shape[0] + 1)
        if all_keys.shape[0] >= (1 << 62) // span:  # ~2^31 rows in a bucket
            raise ValueError("band_join bucket too large to rank-pack")
        kr_r = np.searchsorted(all_keys, rk) * span
        r_packed = kr_r + np.searchsorted(all_ts, rt)
        kr_l = np.searchsorted(all_keys, lk) * span
        lo = np.searchsorted(r_packed, kr_l + np.searchsorted(all_ts, lo_val), "left")
        hi = np.searchsorted(r_packed, kr_l + np.searchsorted(all_ts, hi_val), "right")
        cnt = hi - lo
        li = np.repeat(np.arange(lk.shape[0]), cnt)
        ri = (
            np.arange(int(cnt.sum()))
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(lo, cnt)
        )
        return pa.table(
            {
                "l_id": pa.array(lid_[li], pa.int64()),
                "key": pa.array(lk[li], pa.int64()),
                "l_ts": pa.array(lt[li].astype("datetime64[us]"), pa.timestamp("us")),
                "r_id": pa.array(rid_[ri], pa.int64()),
                "r_ts": pa.array(rt[ri].astype("datetime64[us]"), pa.timestamp("us")),
            }
        )

    return union.groupby("b").map_groups(match, batch_format="pyarrow")


def next_event_join(
    left: Dataset,
    right: Dataset,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "l_id",
    right_id: str = "r_id",
) -> Dataset:
    """FORWARD-first as-of join: for every left row, the EARLIEST right
    row of the same key with ``left.ts < right.ts <= left.ts +
    window_us`` — the conversion-attribution primitive ("first purchase
    after each view within T"). Inner semantics (unmatched lefts drop);
    right rows tying on (key, ts) dedup to the MIN right-id, and the
    winner is the (ts, r_id)-smallest match, so the result is
    deterministic and the SQL oracle well-defined. Output:
    ``(l_id, key, l_ts, r_id, r_ts, gap_us)``.

    Same physical shape as :func:`asof_join`: ONE coarse key-hash
    bucket shuffle, then a vectorized packed-(key_rank, ts_rank)
    ``searchsorted`` per group — no per-key loop. The distinction from
    :func:`band_join` is the 1:1 first-match fold riding the probe
    itself (no pair fan-out to reduce afterwards)."""
    tune_context()
    win = np.int64(window_us)

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "b": bucket_of(k, N_BUCKETS),
                    "side": np.full(tbl.num_rows, side, dtype=np.int8),
                    "key": k,
                    "ts": tbl.column(ts_col).cast(pa.timestamp("us")),
                    "rid": tbl.column(left_id if side == 0 else right_id).cast(
                        pa.int64()
                    ),
                }
            )

        return fn

    union = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))

    def match(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        rid = group.column("rid").to_numpy(zero_copy_only=False)
        lm = side == 0
        empty = pa.table(
            {
                "l_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "l_ts": pa.array([], pa.timestamp("us")),
                "r_id": pa.array([], pa.int64()),
                "r_ts": pa.array([], pa.timestamp("us")),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if not lm.any() or lm.all():
            return empty
        lk, lt, lid_ = key[lm], ts[lm], rid[lm]
        rk, rt, rid_ = key[~lm], ts[~lm], rid[~lm]
        # dedup right per (key, ts): keep MIN rid (deterministic ties)
        order = np.lexsort((rid_, rt, rk))
        rk, rt, rid_ = rk[order], rt[order], rid_[order]
        first = np.ones(rk.shape[0], dtype=bool)
        first[1:] = (np.diff(rk) != 0) | (np.diff(rt) != 0)
        rk, rt, rid_ = rk[first], rt[first], rid_[first]
        # packed (key_rank, ts_rank) probe — ranks, not µs offsets, so
        # the product stays bounded (see asof_join)
        all_keys = np.unique(np.concatenate([lk, rk]))
        all_ts = np.unique(np.concatenate([lt, rt]))
        span = np.int64(all_ts.shape[0] + 1)
        if all_keys.shape[0] < (1 << 62) // span:
            r_packed = np.searchsorted(all_keys, rk) * span + np.searchsorted(
                all_ts, rt
            )
            l_packed = np.searchsorted(all_keys, lk) * span + np.searchsorted(
                all_ts, lt
            )
            # first right strictly after (key, l_ts)
            pos = np.searchsorted(r_packed, l_packed, side="right")
            valid = pos < r_packed.shape[0]
            pv = np.minimum(pos, r_packed.shape[0] - 1)
            valid &= (rk[pv] == lk) & (rt[pv] - lt <= win) & (rt[pv] > lt)
        else:
            pos = np.full(lk.shape[0], -1, dtype=np.int64)
            seg_lo = np.searchsorted(rk, lk, side="left")
            seg_hi = np.searchsorted(rk, lk, side="right")
            for k_ in np.unique(lk):
                sel = lk == k_
                lo, hi = seg_lo[sel][0], seg_hi[sel][0]
                if hi > lo:
                    p = lo + np.searchsorted(rt[lo:hi], lt[sel], side="right")
                    p[p >= hi] = -1
                    pos[sel] = p
            valid = pos >= 0
            pv = np.maximum(pos, 0)
            valid &= (rt[pv] - lt <= win) & (rt[pv] > lt)
        pos_v = pv[valid]
        return pa.table(
            {
                "l_id": pa.array(lid_[valid], pa.int64()),
                "key": pa.array(lk[valid], pa.int64()),
                "l_ts": pa.array(
                    lt[valid].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "r_id": pa.array(rid_[pos_v], pa.int64()),
                "r_ts": pa.array(
                    rt[pos_v].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "gap_us": pa.array(rt[pos_v] - lt[valid], pa.int64()),
            }
        )

    return union.groupby("b").map_groups(match, batch_format="pyarrow")
