"""Distributed kNN over box centroids.

Distributed analog of a per-query nearest-neighbor search; the
ring-expansion radius bound mirrors the reference insert's geometrically
expanding candidate search (``prtree.h:336-369``) but is computed from a
per-cell histogram instead of repeated probes:

1. Histogram pass: per-cell centroid counts, pre-aggregated per batch,
   tiny global sum, broadcast to all tasks via ``ray.put``.
2. Radius bound per query: smallest Chebyshev ring R of cells around the
   query's cell whose cumulative count >= k. All those centroids lie
   within Euclidean distance (R+1)*cellw*sqrt(2), so the true k-th
   neighbor distance is bounded by it (k-th smallest of a candidate
   SUPERSET's distances bounds the true k-th from above).
3. Radius join: each query becomes the box [p-rad, p+rad]² and flows
   through the standard cell-shuffle join, emitting candidate distances.
4. Coarse-bucket (256-way query hash) vectorized top-k with the
   deterministic (dist2, idx) tie-break — never per-query map_groups.

Two shuffles total (cell join + per-query top-k); the histogram is
metadata-sized. dist2 is computed as ``(qx-cx)*(qx-cx)+(qy-cy)*(qy-cy)``
— the exact SQL-oracle expression, so ordering ties out bitwise.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions import cells as cellmod
from ..config import tune_context
from ..stages import spatial as st


def _centroid_histogram(boxes: Dataset, res: int) -> np.ndarray:
    """Dense (g*g,) centroid counts. Grid stays metadata-sized because
    ``res`` is chosen so cells hold ~1e5 boxes; at res<=10 this is <=1M
    int64 — broadcastable. (Sparse dict fallback would cover higher res.)"""

    def partial(tbl: pa.Table) -> pa.Table:
        b = st.boxes_np(tbl)
        cx = (b[:, 0] + b[:, 2]) * 0.5
        cy = (b[:, 1] + b[:, 3]) * 0.5
        cell = cellmod.cell_of_points(cx, cy, res)
        uc, counts = np.unique(cell, return_counts=True)
        return pa.table({"cell": uc, "n": counts.astype(np.int64)})

    rows = (
        boxes.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    g = 1 << res
    grid = np.zeros(g * g, dtype=np.int64)
    for r in rows:
        grid[int(r["cell"])] = int(r["n"])
    return grid


def _ring_for_k(grid: np.ndarray, res: int, k_eff: int) -> np.ndarray:
    """Per-cell smallest Chebyshev ring R whose cumulative centroid count
    >= k_eff, via a 2-D summed-area table. Early-exits as soon as every
    cell is settled — memory stays O(g²) (one ring at a time), never the
    (g², g) table a precomputed cumcount matrix would need at high res."""
    g = 1 << res
    dense = grid.reshape(g, g)
    sat = np.zeros((g + 1, g + 1), dtype=np.int64)
    sat[1:, 1:] = dense.cumsum(0).cumsum(1)
    ix, iy = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    ring = np.full(g * g, g, dtype=np.int64)
    unset = np.ones(g * g, dtype=bool)
    for r in range(g + 1):
        x0 = np.clip(ix - r, 0, g)
        x1 = np.clip(ix + r + 1, 0, g)
        y0 = np.clip(iy - r, 0, g)
        y1 = np.clip(iy + r + 1, 0, g)
        s = (sat[x1, y1] - sat[x0, y1] - sat[x1, y0] + sat[x0, y0]).ravel()
        hit = unset & (s >= k_eff)
        ring[hit] = r
        unset &= ~hit
        if not unset.any():
            break
    return ring


# Broadcast path bound: at m<=this many query points, a per-batch local
# top-k scan (O(m * batch) distances) is cheaper than the 3-shuffle ring
# path — and is exact at any box count. Above it, ring expansion wins.
KNN_BROADCAST_LIMIT = 100_000


def _try_collect_points(points: Dataset, limit: int) -> pa.Table | None:
    batches: list[pa.Table] = []
    n = 0
    for b in points.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
        if n > limit:
            return None
        batches.append(b)
    return pa.concat_tables(batches) if batches else pa.table({})


def _local_knn_candidates(
    cx: np.ndarray, cy: np.ndarray, qx: np.ndarray, qy: np.ndarray, kk: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact threshold-inclusive local top-k: for each query point, every
    centroid position with dist2 <= the local k-th smallest (ties kept).
    Returns (query_row, centroid_pos, dist2).

    Expanding-radius search over a packed PR-tree of the batch's
    centroids — the vectorized analog of the reference insert's
    geometrically expanding candidate loop (``prtree.h:336-369``). A
    radius-r probe returns all points with Chebyshev distance <= r, so
    once >= k hits exist and the k-th EUCLIDEAN distance dk <= r, no
    point outside the box can beat it; otherwise one re-probe at
    r = sqrt(dk) settles it."""
    from ..functions.prtree import PRTree

    B = cx.shape[0]
    tree = PRTree(
        np.arange(B, dtype=np.int64), np.stack([cx, cy, cx, cy], axis=1)
    )
    m = qx.shape[0]
    rad = np.full(m, max(math.sqrt(kk / max(B, 1)), 1e-6))
    alive = np.arange(m, dtype=np.int64)
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    for _round in range(64):  # hard cap; stragglers fall back to brute force
        if not alive.size:
            break
        ax, ay, ar = qx[alive], qy[alive], rad[alive]
        qi, ppos = tree.batch_query_positions(
            np.stack([ax - ar, ay - ar, ax + ar, ay + ar], axis=1)
        )
        pos = tree.idx[ppos]  # packed position -> original centroid row
        cnt = np.bincount(qi, minlength=alive.size)
        dx = ax[qi] - cx[pos]
        dy = ay[qi] - cy[pos]
        d2 = dx * dx + dy * dy
        order = np.lexsort((d2, qi))  # sort by (query, dist2)
        qi_s, pos_s, d2_s = qi[order], pos[order], d2[order]
        starts = np.searchsorted(qi_s, np.arange(alive.size + 1))
        enough = cnt >= kk
        kth = np.full(alive.size, np.inf)
        rows = np.nonzero(enough)[0]
        kth[rows] = d2_s[starts[rows] + kk - 1]
        settled = enough & (kth <= ar * ar)
        # emit threshold-inclusive hits of settled queries (vectorized)
        keep = settled[qi_s] & (d2_s <= kth[qi_s])
        out_q.append(alive[qi_s[keep]])
        out_p.append(pos_s[keep])
        out_d.append(d2_s[keep])
        # unsettled: tighten to sqrt(dk) if enough hits, else double.
        # sqrt(x)^2 can round BELOW x (1 ulp), which would leave the
        # settle test false forever — bump such radii one ulp up.
        grow = ~settled
        r_k = np.sqrt(np.where(np.isfinite(kth), kth, 1.0))
        bump = r_k * r_k < np.where(np.isfinite(kth), kth, 0.0)
        r_k[bump] = np.nextafter(r_k[bump], np.inf)
        new_rad = np.where(enough, r_k, ar * 2.0)
        rad[alive[grow]] = new_rad[grow]
        alive = alive[grow]
    for a in alive:  # brute-force any capped stragglers (defensive; rare)
        d2 = (qx[a] - cx) ** 2 + (qy[a] - cy) ** 2
        thr = np.partition(d2, kk - 1)[kk - 1]
        hit = np.nonzero(d2 <= thr)[0]
        out_q.append(np.full(hit.shape[0], a, dtype=np.int64))
        out_p.append(hit)
        out_d.append(d2[hit])
    return (
        np.concatenate(out_q) if out_q else np.empty(0, np.int64),
        np.concatenate(out_p) if out_p else np.empty(0, np.int64),
        np.concatenate(out_d) if out_d else np.empty(0, np.float64),
    )


def knn_broadcast(boxes: Dataset, points_table: pa.Table, k: int) -> Dataset:
    """Zero-shuffle-build kNN for a small query side: per batch of boxes,
    each query keeps every candidate with dist2 <= its local k-th
    smallest (ties INCLUDED, so the global merge can apply the exact
    (dist2, idx) order) → one tiny ``groupby(query_id)`` merge of ~k
    rows per query per batch. One small shuffle total."""
    tune_context()
    if points_table.num_rows == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("query_id", pa.int64()), ("idx", pa.int64()), ("rank", pa.int64())]
            ).empty_table()
        )
    qids = points_table.column("query_id").to_numpy(zero_copy_only=False)
    px = points_table.column("px").to_numpy(zero_copy_only=False)
    py = points_table.column("py").to_numpy(zero_copy_only=False)
    side_ref = ray.put((qids.astype(np.int64), px, py))

    def local_topk(tbl: pa.Table) -> pa.Table:
        q_ids, qx, qy = ray.get(side_ref)
        b = st.boxes_np(tbl)
        ids = st.col_np(tbl, "idx")
        cx = (b[:, 0] + b[:, 2]) * 0.5
        cy = (b[:, 1] + b[:, 3]) * 0.5
        kk = min(k, cx.shape[0])
        qrow, pos, d2 = _local_knn_candidates(cx, cy, qx, qy, kk)
        return pa.table(
            {"query_id": q_ids[qrow], "idx": ids[pos], "dist2": d2}
        )

    partials = boxes.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=16384
    )
    return _bucketed_topk(partials, k)


def _bucketed_topk(partials: Dataset, k: int) -> Dataset:
    """(query_id, idx, dist2) partials → (query_id, idx, rank) via the
    shared coarse-bucket merge (dist2 ASC, idx tie-break)."""
    from .merge import bucketed_topk

    return bucketed_topk(partials, k, id_col="idx", value_col="dist2", descending=False)


def knn_join(
    boxes: Dataset,
    points: Dataset,
    k: int,
    res: int = 5,
    broadcast: bool | None = None,
) -> Dataset:
    """k nearest box centroids per query point → (query_id, idx, rank).

    Small point sides (``KNN_BROADCAST_LIMIT``) take the one-shuffle
    broadcast local-top-k path; large ones the histogram ring-expansion
    cell join."""
    if broadcast is not False:
        ptbl = _try_collect_points(
            points, KNN_BROADCAST_LIMIT if broadcast is None else (1 << 62)
        )
        if ptbl is not None:
            return knn_broadcast(boxes, ptbl, k)
    tune_context()
    g = 1 << res
    cellw = 1.0 / g
    grid = _centroid_histogram(boxes, res)
    # smallest ring with >= k candidates, per cell (k capped at total)
    k_eff = min(k, int(grid.sum())) or 1
    ring = _ring_for_k(grid, res, k_eff)
    ring_ref = ray.put(ring)

    def to_radius_boxes(tbl: pa.Table) -> pa.Table:
        rng = ray.get(ring_ref)
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        cell = cellmod.cell_of_points(px, py, res)
        rad = (rng[cell] + 1).astype(np.float64) * cellw * math.sqrt(2.0)
        return pa.table(
            {
                "query_id": st.col_np(tbl, "query_id"),
                "xmin": px - rad,
                "ymin": py - rad,
                "xmax": px + rad,
                "ymax": py + rad,
                "px": px,
                "py": py,
            }
        )

    qboxes = points.map_batches(
        to_radius_boxes, batch_format="pyarrow", zero_copy_batch=True
    )

    # centroids as degenerate boxes through the cell join; carry coords
    def centroid_rows(tbl: pa.Table) -> pa.Table:
        b = st.boxes_np(tbl)
        cx = (b[:, 0] + b[:, 2]) * 0.5
        cy = (b[:, 1] + b[:, 3]) * 0.5
        return pa.table(
            {
                "idx": st.col_np(tbl, "idx"),
                "xmin": cx,
                "ymin": cy,
                "xmax": cx,
                "ymax": cy,
            }
        )

    cents = boxes.map_batches(
        centroid_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def expand_build_with_coords(tbl: pa.Table) -> pa.Table:
        # emit px/py explicitly (zeros) so build and probe rows union with
        # an IDENTICAL schema — no reliance on implicit null-promotion
        out = st.expand_boxes_to_cells(
            tbl, res=res, side=st.SIDE_BUILD, id_col="idx"
        )
        zeros = pa.array(np.zeros(out.num_rows, dtype=np.float64))
        return out.append_column("px", zeros).append_column("py", zeros)

    build = cents.map_batches(
        expand_build_with_coords,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # probe rows need px/py alongside; expand then re-derive px/py from the
    # (degenerate-free) radius box center: px = (xmin+xmax)*0.5 is exact
    # only if rad subtraction/addition round-trips — it need not. Carry
    # px/py explicitly instead.
    probe = qboxes.map_batches(
        _expand_probe_with_coords,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(res=res),
    )
    union = build.union(probe)
    pairs = union.groupby("key").map_groups(
        _make_knn_cell(res), batch_format="pyarrow"
    )
    return _bucketed_topk(pairs, k)


def _expand_probe_with_coords(tbl: pa.Table, res: int) -> pa.Table:
    b = st.boxes_np(tbl)
    ids = st.col_np(tbl, "query_id")
    px = st.col_np(tbl, "px")
    py = st.col_np(tbl, "py")
    row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, 2], b[:, 3], res)
    out = {
        "key": cell * st.MAX_SALT,
        "cell": cell,
        "side": np.full(cell.shape[0], st.SIDE_PROBE, dtype=np.int8),
        "id": ids[row],
        "xmin": b[row, 0],
        "ymin": b[row, 1],
        "xmax": b[row, 2],
        "ymax": b[row, 3],
        "px": px[row],
        "py": py[row],
    }
    return pa.table(out)


def _make_knn_cell(res: int):
    def knn_cell(group: pa.Table) -> pa.Table:
        side = st.col_np(group, "side")
        ids = st.col_np(group, "id")
        b = st.boxes_np(group)
        bmask = side == st.SIDE_BUILD
        empty = pa.table(
            {
                "query_id": np.empty(0, np.int64),
                "idx": np.empty(0, np.int64),
                "dist2": np.empty(0, np.float64),
            }
        )
        if not bmask.any() or bmask.all():
            return empty
        qsel = np.nonzero(~bmask)[0]
        from ..functions.prtree import PRTree

        tree = PRTree(ids[bmask], b[bmask])
        qi, pos = tree.batch_query_positions(b[qsel])
        if qi.size == 0:
            return empty
        # owner-cell dedup (centroid = degenerate box, lies in ONE cell, but
        # probe radius boxes span many cells → dedup by centroid's cell)
        cell_val = int(group.column("cell")[0].as_py())
        owner = cellmod.cell_of_points(tree.boxes[pos, 0], tree.boxes[pos, 1], res)
        keep = owner == cell_val
        qi, pos = qi[keep], pos[keep]
        if qi.size == 0:
            return empty
        px = st.col_np(group, "px")[qsel][qi]
        py = st.col_np(group, "py")[qsel][qi]
        cx = tree.boxes[pos, 0]
        cy = tree.boxes[pos, 1]
        dx = px - cx
        dy = py - cy
        d2 = dx * dx + dy * dy
        return pa.table(
            {"query_id": ids[qsel][qi], "idx": tree.idx[pos], "dist2": d2}
        )

    return knn_cell
