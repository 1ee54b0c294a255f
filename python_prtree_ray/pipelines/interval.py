"""Interval joins as a degenerate case of the spatial join.

A per-key temporal interval join — "every right event whose timestamp
falls inside a left event's [ts, ts + window] interval, same key" — maps
EXACTLY onto the 2D box join the engine already has:

- x axis: time. Left rows become boxes ``[ts, ts + window]``; right rows
  degenerate boxes ``[ts, ts]``.
- y axis: the key, embedded as a point: ``y = (key * a + b) % MOD`` on a
  derive channel — injective for keys below MOD (the same int64 key
  domain note as :mod:`..functions.derive`), so two rows intersect on y
  iff they share the key.

No new join machinery — the composition reuses
:func:`..pipelines.spatial_join.spatial_join`:

- **Broadcast path** (default): raw int64-microsecond timestamps ride as
  float64 (exact below 2^53, i.e. until year 2255), so the
  closed-interval intersection is bitwise the SQL ``BETWEEN``. The left
  side is collected (bounded; raises loudly past
  ``FORCE_BROADCAST_LIMIT``) and the right side streams.
- **Cell path** (``broadcast=False``, both sides huge): grid cells need
  the unit square, so coordinates are normalized EXACTLY first — a tiny
  min/max aggregate over both sides picks an int64 origin, and the
  shift-then-multiply by a power of two (``(ts - origin) * 2**-k``) is
  an exact monotone bijection, so the closed-interval semantics are
  bit-preserved. Costs one extra metadata-sized pass for the bounds.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max as _Max, Min as _Min

from ..functions import derive
from . import spatial_join as sj

KEY_CHANNEL = 7  # same multiply-mod family as every other derived axis


def _key_y(k: np.ndarray) -> np.ndarray:
    a, b = derive.CHANNELS[KEY_CHANNEL]
    return ((k.astype(np.int64) * a + b) % derive.MOD).astype(np.float64)


def _ts_us(tbl: pa.Table, ts_col: str) -> np.ndarray:
    import pyarrow.compute as pc

    return (
        pc.cast(tbl.column(ts_col), pa.timestamp("us"))
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )


def interval_point_join(
    left: Dataset,
    right: Dataset,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "l_id",
    right_id: str = "r_id",
    broadcast: bool | None = None,
) -> Dataset:
    """(l_id, r_id) for every right row with ``l.ts <= r.ts <= l.ts +
    window_us`` and equal ``key_col`` (closed interval, like SQL
    BETWEEN). ``left``/``right`` need columns (left_id/right_id,
    key_col, ts_col). ``broadcast=None``/``True`` collect the left side
    (bounded, loud on overflow); ``broadcast=False`` runs the
    cell-shuffle path on exactly-normalized coordinates."""
    if broadcast is False:
        # bounds for the exact normalization: int64 origin + power-of-two
        # scale (metadata-sized aggregate over both sides' ts column)
        b_l = left.aggregate(_Min(ts_col, alias_name="lo"), _Max(ts_col, alias_name="hi"))
        b_r = right.aggregate(_Min(ts_col, alias_name="lo"), _Max(ts_col, alias_name="hi"))

        def _us(v) -> int:
            return int(np.datetime64(v, "us").astype(np.int64))

        los = [b["lo"] for b in (b_l, b_r) if b and b.get("lo") is not None]
        his = [b["hi"] for b in (b_l, b_r) if b and b.get("hi") is not None]
        if not los:  # one/both sides empty: any exact transform works
            origin, xscale, yscale = 0, 1.0, 1.0
        else:
            origin = min(_us(v) for v in los)
            span = max(max(_us(v) for v in his) + int(window_us) - origin, 1)
            # (ts-origin)*xscale in [0,1)
            xscale = 2.0 ** -(int(span).bit_length())
            # h*2^-30 in [0,1)
            yscale = 2.0 ** -math.ceil(math.log2(derive.MOD))
    else:
        origin, xscale, yscale = 0, 1.0, 1.0

    lq = _boxes(left, left_id, key_col, ts_col, window_us, origin, xscale, yscale, "query_id")
    rb = _boxes(right, right_id, key_col, ts_col, None, origin, xscale, yscale, "idx")
    force = True if broadcast is None else broadcast
    pairs = sj.spatial_join(rb, lq, broadcast=force)
    # Ray quirk: rename_columns on a ZERO-row dataset reports the original
    # schema (the projection never runs over zero blocks) — a zero-pair
    # result keeps the generic (query_id, idx) names; any non-empty result
    # carries (left_id, right_id).
    return pairs.rename_columns({"query_id": left_id, "idx": right_id})


def _boxes(
    ds: Dataset,
    id_col: str,
    key_col: str,
    ts_col: str,
    window_us: int | None,
    origin: int,
    xscale: float,
    yscale: float,
    out_id: str | None = None,
):
    """Rows → 2D boxes: x = exactly-scaled time (interval when
    ``window_us`` is given, point otherwise), y = key-hash point."""

    def mk(tbl: pa.Table) -> pa.Table:
        ts = _ts_us(tbl, ts_col)
        x0 = (ts - np.int64(origin)).astype(np.float64) * xscale
        x1 = (
            (ts - np.int64(origin) + np.int64(window_us)).astype(np.float64) * xscale
            if window_us is not None
            else x0
        )
        y = _key_y(tbl.column(key_col).to_numpy(zero_copy_only=False)) * yscale
        return pa.table(
            {
                out_id or id_col: tbl.column(id_col),
                "xmin": x0,
                "ymin": y,
                "xmax": x1,
                "ymax": y,
            }
        )

    return ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


def interval_union_len(
    events: Dataset,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 256,
) -> Dataset:
    """Per-key UNION length of overlapping activity intervals: each
    event opens ``[ts, ts + window_us)``; overlaps within a key merge —
    ``(user_id, n_intervals, covered_us)``, exact int64 microseconds.
    The classic sorted sweep (contribution of interval i in start order
    is ``max(0, e_i − max(s_i, running_max_end))``), whose sum is
    order-invariant under start ties, so the SQL window twin matches
    exactly despite nondeterministic tie order.

    Scale shape: ONE entity-bucket shuffle of (key, ts) pairs; each
    bucket folds in one lexsort + reset-able running-max pass (the
    cummax resets at key boundaries via an exact int64 offset trick —
    no Python loop) and collapses to one row per key; no further
    shuffle (keys are unique across buckets)."""
    from ..config import COMBINE_BATCH, tune_context
    from ..functions.buckets import bucket_of

    tune_context()
    w = np.int64(window_us)
    if w <= 0:
        raise ValueError(f"interval_union_len: window_us must be > 0, got {window_us}")

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": k,
                "s": _ts_us(tbl, ts_col),
                "bucket": bucket_of(k, n_buckets),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_intervals": pa.array([], pa.int64()),
            "covered_us": pa.array([], pa.int64()),
        }
    )

    def fold(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return empty
        s = group.column("s").to_numpy(zero_copy_only=False)
        e = s + w
        order = np.lexsort((e, s, key))
        k_s, s_s, e_s = key[order], s[order], e[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        seg = np.cumsum(np.r_[False, k_s[1:] != k_s[:-1]]).astype(np.int64)
        # reset-able running max of ends per key segment: shift each
        # segment into its own disjoint value band, one global cummax
        lo = np.int64(s_s.min())
        band = np.int64(int(e_s.max()) - int(lo) + 1)
        if (int(seg[-1]) + 1) * int(band) >= 1 << 62:
            # banded offsets would overflow int64 (astronomical keys-per-
            # bucket x time-range product): shrink buckets, never wrap
            raise ValueError(
                "interval_union_len: per-bucket key count x time range "
                "overflows the banded cummax; raise n_buckets"
            )
        m = np.maximum.accumulate(e_s - lo + seg * band)
        # previous running max (exclusive); first of each segment has none
        pm = np.empty_like(m)
        pm[1:] = m[:-1]
        pm[starts] = -1  # sentinel: no predecessor in segment
        prev_end = np.where(pm >= seg * band, pm - seg * band + lo, s_s)
        contrib = np.maximum(e_s - np.maximum(s_s, prev_end), 0)
        return pa.table(
            {
                "user_id": k_s[starts],
                "n_intervals": np.diff(np.r_[starts, k_s.size]).astype(np.int64),
                "covered_us": np.add.reduceat(contrib, starts).astype(np.int64),
            }
        )

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def interval_union_len_sql(window_us: int) -> str:
    """DuckDB twin of :func:`interval_union_len` over the events table."""
    return f"""
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {int(window_us)} AS e
            FROM events),
m AS (SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM iv)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pm, s)), 0))
            AS BIGINT) AS covered_us
FROM m GROUP BY user_id
"""
