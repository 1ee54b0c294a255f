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
