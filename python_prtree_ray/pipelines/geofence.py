"""Geofencing over georeferenced event streams.

Two trajectory-geometry operators beyond the reference's box surface
(reference scope is boxes/points only — ``src/python_prtree/core.py``
exposes no polygon or segment predicates); both follow the engine's
movement-fold scale shape (`pipelines/movement.py`).

- ``geofence_events``: per-entity zone ENTRY/EXIT transitions against a
  small broadcast polygon set — the alerting primitive of a geofencing
  pipeline. Zone membership is the exact closed convex half-plane test
  shared with :func:`pip.pip_join`, so the SQL oracle reproduces it
  bitwise; transitions are integer comparisons on top.
- ``segment_crossings``: pairs of DIFFERENT entities whose consecutive-
  event movement segments intersect (closed semantics, touching counts)
  — the path-conflict join. Exact int64 orientation tests on the
  integer grid: parallelism-invariant, no epsilon.

Scale shape:
- ``geofence_events``: polygon set broadcasts via ``ray.put`` (zero
  shuffle), zone resolves batch-locally, then ONE coarse entity-hash
  bucket shuffle of four fixed-width int columns; per-bucket lexsort +
  consecutive-pair mask. Identical to ``od_matrix``'s shuffle budget.
- ``segment_crossings``: segments gated to L-inf length <= ``max_move``
  grid units resolve batch-locally after the same ONE entity-bucket
  shuffle, then replicate to the coarse tiles their bbox covers
  (<= ~(max_move/tile + 2)^2 tiles each; pick ``bucket_res`` so the
  tile edge is >= max_move) and pair-test within each tile. A pair is
  emitted only by the tile owning the intersection of the two bboxes'
  (xmin, ymin) corner — exactly-once without a dedup shuffle. Hot
  tiles behave like hot cells in ``self_join``: density is bounded by
  the gate at uniform scale; for adversarial skew route through
  ``compute_salt_plan`` (documented, not wired — crossings inputs are
  per-entity moves, already salted upstream by the entity shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions import geom
from ..functions.buckets import bucket_of

_EMPTY_GEOFENCE = pa.table(
    {
        "user_id": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "from_zone": pa.array([], pa.int64()),
        "to_zone": pa.array([], pa.int64()),
    }
)


def geofence_events(
    points: Dataset,
    polygons: list[tuple[int, np.ndarray]] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "px",
    y_col: str = "py",
    n_buckets: int = 256,
) -> Dataset:
    """Zone-transition events: ``(user_id, event_id, from_zone, to_zone)``
    for every consecutive same-entity event pair whose zone changed,
    attributed to the LATER event (the one that crossed). Zone is the
    id of the containing convex polygon, or -1 outside every polygon;
    the polygon set must be disjoint (first containing polygon wins
    ascending poly_id, matching the SQL oracle's MIN(poly_id))."""
    tune_context()
    from ..functions import derive

    polys = polygons if polygons is not None else derive.polygon_arrays()
    packed = [
        (pid, v, v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max())
        for pid, v in sorted(polys, key=lambda kv: kv[0])
    ]
    polys_ref = ray.put(packed)

    def zone_batch(tbl: pa.Table) -> pa.Table:
        plist = ray.get(polys_ref)
        px = tbl.column(x_col).to_numpy(zero_copy_only=False)
        py = tbl.column(y_col).to_numpy(zero_copy_only=False)
        zone = np.full(px.shape[0], -1, dtype=np.int64)
        unresolved = np.ones(px.shape[0], dtype=bool)
        for pid, verts, x0, y0, x1, y1 in plist:
            cand = unresolved & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not cand.any():
                continue
            sel = np.nonzero(cand)[0]
            inside = geom.point_in_convex_polygon(px[sel], py[sel], verts)
            hit = sel[inside]
            zone[hit] = pid
            unresolved[hit] = False
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": k,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "zone": zone,
                "bucket": bucket_of(k, n_buckets),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size < 2:
            return _EMPTY_GEOFENCE
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        zone = group.column("zone").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s, s_s, z_s = key[order], seq[order], zone[order]
        change = (k_s[1:] == k_s[:-1]) & (z_s[1:] != z_s[:-1])
        if not change.any():
            return _EMPTY_GEOFENCE
        i = np.flatnonzero(change) + 1
        return pa.table(
            {
                "user_id": k_s[i],
                "event_id": s_s[i],
                "from_zone": z_s[i - 1],
                "to_zone": z_s[i],
            }
        )

    keyed = points.map_batches(
        zone_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def _segments_intersect(
    ax1, ay1, ax2, ay2, bx1, by1, bx2, by2
) -> np.ndarray:
    """Vectorized exact closed segment-intersection test on int64 grids.

    Standard four-orientation predicate with collinear-touch handling;
    all products fit int64 for coordinates < 2^20."""

    def orient(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    o1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    o2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    o3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    o4 = orient(bx1, by1, bx2, by2, ax2, ay2)

    proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )

    def on_seg(sx1, sy1, sx2, sy2, px, py):
        return (
            (px >= np.minimum(sx1, sx2))
            & (px <= np.maximum(sx1, sx2))
            & (py >= np.minimum(sy1, sy2))
            & (py <= np.maximum(sy1, sy2))
        )

    touch = (
        ((o1 == 0) & on_seg(ax1, ay1, ax2, ay2, bx1, by1))
        | ((o2 == 0) & on_seg(ax1, ay1, ax2, ay2, bx2, by2))
        | ((o3 == 0) & on_seg(bx1, by1, bx2, by2, ax1, ay1))
        | ((o4 == 0) & on_seg(bx1, by1, bx2, by2, ax2, ay2))
    )
    return proper | touch


_EMPTY_SEGMENTS = pa.table(
    {
        "user": pa.array([], pa.int64()),
        "seq": pa.array([], pa.int64()),
        "x1": pa.array([], pa.int64()),
        "y1": pa.array([], pa.int64()),
        "x2": pa.array([], pa.int64()),
        "y2": pa.array([], pa.int64()),
    }
)

_EMPTY_CROSSINGS = pa.table(
    {
        "user_a": pa.array([], pa.int64()),
        "seq_a": pa.array([], pa.int64()),
        "user_b": pa.array([], pa.int64()),
        "seq_b": pa.array([], pa.int64()),
    }
)


def segment_crossings(
    tracks: Dataset,
    max_move: int = 128,
    res: int = 10,
    bucket_res: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Path-conflict join: ``(user_a, seq_a, user_b, seq_b)`` for every
    pair of movement segments of DIFFERENT entities that intersect
    (closed semantics — touching endpoints count), ``user_a < user_b``,
    each segment keyed by its EARLIER event's seq.

    Segments longer than ``max_move`` in L-inf grid units are excluded
    (teleport gate — also what bounds tile fan-out and pair density at
    scale). ``bucket_res`` coarse tiles must be at least ``max_move``
    wide (asserted) so a segment covers at most ~2x2 tiles + slack.
    """
    tune_context()
    if not 0 <= bucket_res <= res:
        raise ValueError(f"segment_crossings: need 0 <= bucket_res <= res")
    shift = res - bucket_res
    if max_move > (1 << shift):
        raise ValueError(
            f"segment_crossings: max_move={max_move} exceeds the bucket tile "
            f"edge 2^{shift}; raise shift (lower bucket_res) or lower max_move"
        )
    gb = np.int64(1 << bucket_res)

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "key": k,
            "ts": tbl.column(ts_col),
            "seq": tbl.column(seq_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "gx": tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64),
            "gy": tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64),
            "bucket": bucket_of(k, n_buckets),
        }
        return pa.table(out)

    def to_segments(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size < 2:
            return _EMPTY_SEGMENTS
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s, s_s = key[order], seq[order]
        x_s, y_s = gx[order], gy[order]
        same = k_s[1:] == k_s[:-1]
        short = (np.abs(np.diff(x_s)) <= max_move) & (
            np.abs(np.diff(y_s)) <= max_move
        )
        m = same & short
        if not m.any():
            return _EMPTY_SEGMENTS
        i = np.flatnonzero(m)
        return pa.table(
            {
                "user": k_s[i],
                "seq": s_s[i],
                "x1": x_s[i],
                "y1": y_s[i],
                "x2": x_s[i + 1],
                "y2": y_s[i + 1],
            }
        )

    def to_tiles(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column("tile", pa.array([], pa.int64()))
        x1 = tbl.column("x1").to_numpy(zero_copy_only=False)
        y1 = tbl.column("y1").to_numpy(zero_copy_only=False)
        x2 = tbl.column("x2").to_numpy(zero_copy_only=False)
        y2 = tbl.column("y2").to_numpy(zero_copy_only=False)
        tx0 = np.minimum(x1, x2) >> shift
        tx1 = np.maximum(x1, x2) >> shift
        ty0 = np.minimum(y1, y2) >> shift
        ty1 = np.maximum(y1, y2) >> shift
        # bbox tile cover: max_move <= tile edge => at most 2x2 tiles
        rows, tiles = [], []
        for dx in (0, 1):
            for dy in (0, 1):
                tx = np.minimum(tx0 + dx, tx1)
                ty = np.minimum(ty0 + dy, ty1)
                t = tx * gb + ty
                keep = (
                    np.ones(t.shape[0], dtype=bool)
                    if dx == 0 and dy == 0
                    else ((dx == 0) | (tx0 + dx <= tx1))
                    & ((dy == 0) | (ty0 + dy <= ty1))
                )
                idx = np.flatnonzero(keep)
                rows.append(idx)
                tiles.append(t[idx])
        idx = np.concatenate(rows)
        tile = np.concatenate(tiles)
        out = tbl.take(pa.array(idx))
        return out.append_column("tile", pa.array(tile, pa.int64()))

    def pair_tile(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _EMPTY_CROSSINGS
        tile = int(group.column("tile")[0].as_py())
        tx, ty = tile // int(gb), tile % int(gb)
        user = group.column("user").to_numpy(zero_copy_only=False)
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        x1 = group.column("x1").to_numpy(zero_copy_only=False)
        y1 = group.column("y1").to_numpy(zero_copy_only=False)
        x2 = group.column("x2").to_numpy(zero_copy_only=False)
        y2 = group.column("y2").to_numpy(zero_copy_only=False)
        ia, ib = np.triu_indices(n, k=1)
        diff = user[ia] != user[ib]
        ia, ib = ia[diff], ib[diff]
        if ia.size == 0:
            return _EMPTY_CROSSINGS
        hit = _segments_intersect(
            x1[ia], y1[ia], x2[ia], y2[ia], x1[ib], y1[ib], x2[ib], y2[ib]
        )
        ia, ib = ia[hit], ib[hit]
        if ia.size == 0:
            return _EMPTY_CROSSINGS
        # exactly-once: emit only from the tile that owns the pair's
        # joint-bbox-intersection (xmin, ymin) corner
        ox = np.maximum(np.minimum(x1[ia], x2[ia]), np.minimum(x1[ib], x2[ib]))
        oy = np.maximum(np.minimum(y1[ia], y2[ia]), np.minimum(y1[ib], y2[ib]))
        own = ((ox >> shift) == tx) & ((oy >> shift) == ty)
        ia, ib = ia[own], ib[own]
        if ia.size == 0:
            return _EMPTY_CROSSINGS
        swap = user[ia] > user[ib]
        ua = np.where(swap, user[ib], user[ia])
        ub = np.where(swap, user[ia], user[ib])
        sa = np.where(swap, seq[ib], seq[ia])
        sb = np.where(swap, seq[ia], seq[ib])
        return pa.table(
            {"user_a": ua, "seq_a": sa, "user_b": ub, "seq_b": sb}
        )

    keyed = tracks.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    segs = keyed.groupby("bucket").map_groups(to_segments, batch_format="pyarrow")
    tiled = segs.map_batches(to_tiles, batch_format="pyarrow", zero_copy_batch=True)
    return tiled.groupby("tile").map_groups(pair_tile, batch_format="pyarrow")
