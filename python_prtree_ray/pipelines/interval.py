"""Interval joins as a degenerate case of the spatial join.

A per-key temporal interval join — "every right event whose timestamp
falls inside a left event's [ts, ts + window] interval, same key" — maps
EXACTLY onto the 2D box join the engine already has:

- x axis: time. Left rows become boxes ``[ts, ts + window]``; right rows
  degenerate boxes ``[ts, ts]``. Timestamps ride as raw int64
  microseconds cast to float64 (exact below 2^53, i.e. until year 2255),
  so the closed-interval intersection is bitwise the SQL ``BETWEEN``.
- y axis: the key, embedded as a point: ``y = hash(key) / MOD`` on a
  derive channel. Two rows intersect on y iff they collide on the hash —
  i.e. (modulo a 1/MOD hash collision, absent for keys < MOD, which the
  int64 key domain note in :mod:`..functions.derive` already bounds)
  iff they share the key.

No new join machinery: the composition reuses
:func:`..pipelines.spatial_join.spatial_join`'s broadcast path (left
side collected + ``ray.put`` once; right side streams). This is the
Ray-Data-first answer to a windowed equi-join — express it as the
existing batch transform, don't build a new operator. For a cell-shuffle
variant, normalize x into the unit square first (the broadcast path
needs no normalization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions import derive
from . import spatial_join as sj

KEY_CHANNEL = 7  # same multiply-mod family as every other derived axis


def _key_y(k: np.ndarray) -> np.ndarray:
    a, b = derive.CHANNELS[KEY_CHANNEL]
    return ((k.astype(np.int64) * a + b) % derive.MOD).astype(np.float64)


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
    key_col, ts_col)."""

    def _us(tbl: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return (
            pc.cast(tbl.column(ts_col), pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            .astype(np.float64)
        )

    def lbox(tbl: pa.Table) -> pa.Table:
        ts = _us(tbl)
        y = _key_y(tbl.column(key_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "query_id": tbl.column(left_id),
                "xmin": ts,
                "ymin": y,
                "xmax": ts + float(window_us),
                "ymax": y,
            }
        )

    def rbox(tbl: pa.Table) -> pa.Table:
        ts = _us(tbl)
        y = _key_y(tbl.column(key_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "idx": tbl.column(right_id),
                "xmin": ts,
                "ymin": y,
                "xmax": ts,
                "ymax": y,
            }
        )

    lq = left.map_batches(lbox, batch_format="pyarrow", zero_copy_batch=True)
    rb = right.map_batches(rbox, batch_format="pyarrow", zero_copy_batch=True)
    pairs = sj.spatial_join(rb, lq, broadcast=broadcast)
    # Ray quirk: rename_columns on a ZERO-row dataset reports the original
    # schema (the projection never runs over zero blocks) — a zero-pair
    # result keeps the generic (query_id, idx) names; any non-empty result
    # carries (left_id, right_id).
    return pairs.rename_columns({"query_id": left_id, "idx": right_id})
