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
from ..config import COMBINE_BATCH, tune_context
from ..stages import spatial as st


def _centroids(b: np.ndarray) -> np.ndarray:
    """(n, 2D) box matrix → (n, D) centroid matrix. For D=2 this is
    bitwise ``(xmin+xmax)*0.5`` / ``(ymin+ymax)*0.5`` — the SQL-oracle
    expressions."""
    d = b.shape[1] // 2
    return np.stack([(b[:, j] + b[:, d + j]) * 0.5 for j in range(d)], axis=1)


def _cell_nd(P: np.ndarray, res: int) -> np.ndarray:
    """(n, D) points → flat row-major D-dim cell index (matches
    ``grid.reshape((g,)*D)`` raveling; for D=2 equals
    ``cells.cell_of_points``)."""
    g = 1 << res
    idx = np.clip(np.floor(P * g).astype(np.int64), 0, g - 1)
    flat = np.zeros(P.shape[0], dtype=np.int64)
    for d in range(P.shape[1]):
        flat = flat * g + idx[:, d]
    return flat


def _centroid_histogram(
    boxes: Dataset, res: int, box_cols: tuple = st.BOX_COLS
) -> np.ndarray:
    """Dense (g^D,) centroid counts over the FULL-D grid (a 2-D histogram
    cannot bound D-dim distance). Stays metadata-sized: pick ``res`` so
    g^D <= ~1M (res 5 covers 2D/3D; use res<=5 for 4D)."""

    def partial(tbl: pa.Table) -> pa.Table:
        C = _centroids(st.boxes_np(tbl, box_cols))
        cell = _cell_nd(C, res)
        uc, counts = np.unique(cell, return_counts=True)
        return pa.table({"cell": uc, "n": counts.astype(np.int64)})

    partials = boxes.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    g = 1 << res
    dims = len(box_cols) // 2
    grid = np.zeros(g**dims, dtype=np.int64)
    # each partial batch is <= g^D rows, so up to ~CAP rows the driver
    # fold is a metadata-sized stream — one executor run, no Aggregate
    # shuffle round. Past the cap (thousands of blocks — the true
    # 100-TB regime) fall back to the distributed groupby sum.
    CAP = 2_000_000
    seen = 0
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        seen += b.num_rows
        if seen > CAP:
            break
        c = b.column("cell").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        np.add.at(grid, c, n)
    else:
        return grid
    rows = (
        partials.groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    grid[:] = 0
    for r in rows:
        grid[int(r["cell"])] = int(r["n"])
    return grid


def _ring_for_k(grid: np.ndarray, res: int, k_eff: int, dims: int = 2) -> np.ndarray:
    """Per-cell smallest Chebyshev ring R whose cumulative centroid count
    >= k_eff, via a D-dim summed-area table (inclusion-exclusion over the
    2^D box corners). Early-exits as soon as every cell is settled —
    memory stays O(g^D) (one ring at a time)."""
    g = 1 << res
    dense = grid.reshape((g,) * dims)
    sat = np.zeros((g + 1,) * dims, dtype=np.int64)
    sat[(slice(1, None),) * dims] = dense
    for ax in range(dims):
        np.cumsum(sat, axis=ax, out=sat)
    idx = np.indices((g,) * dims)
    ring = np.full(g**dims, g, dtype=np.int64)
    unset = np.ones(g**dims, dtype=bool)
    for r in range(g + 1):
        lo = [np.clip(idx[d] - r, 0, g) for d in range(dims)]
        hi = [np.clip(idx[d] + r + 1, 0, g) for d in range(dims)]
        s = np.zeros((g,) * dims, dtype=np.int64)
        for mask in range(1 << dims):
            sel = tuple(lo[d] if (mask >> d) & 1 else hi[d] for d in range(dims))
            if bin(mask).count("1") % 2:
                s -= sat[sel]
            else:
                s += sat[sel]
        s = s.ravel()
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


def _dist2(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Row-wise squared distance of two (n, D) matrices, accumulated
    dim-by-dim — for D=2 this is bitwise ``dx*dx + dy*dy``, the SQL-
    oracle expression."""
    d = Q[:, 0] - C[:, 0]
    acc = d * d
    for j in range(1, Q.shape[1]):
        d = Q[:, j] - C[:, j]
        acc = acc + d * d
    return acc


def _local_knn_candidates(
    C: np.ndarray, Q: np.ndarray, kk: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact threshold-inclusive local top-k: for each query point (row of
    ``Q``, shape (m, D)), every centroid (row of ``C``, shape (B, D))
    with dist2 <= the local k-th smallest (ties kept).
    Returns (query_row, centroid_pos, dist2).

    Expanding-radius search over a packed PR-tree of the batch's
    centroids — the vectorized analog of the reference insert's
    geometrically expanding candidate loop (``prtree.h:336-369``). A
    radius-r probe returns all points with Chebyshev distance <= r, so
    once >= k hits exist and the k-th EUCLIDEAN distance dk <= r, no
    point outside the box can beat it; otherwise one re-probe at
    r = sqrt(dk) settles it. D-generic (reference kNN workloads are 2D;
    3D/4D ride the same kernel)."""
    from ..functions.prtree import PRTree

    B, dims = C.shape
    tree = PRTree(np.arange(B, dtype=np.int64), np.hstack([C, C]))
    m = Q.shape[0]
    rad = np.full(m, max((kk / max(B, 1)) ** (1.0 / dims), 1e-6))
    alive = np.arange(m, dtype=np.int64)
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    for _round in range(64):  # hard cap; stragglers fall back to brute force
        if not alive.size:
            break
        aq, ar = Q[alive], rad[alive]
        qi, ppos = tree.batch_query_positions(
            np.hstack([aq - ar[:, None], aq + ar[:, None]])
        )
        pos = tree.idx[ppos]  # packed position -> original centroid row
        cnt = np.bincount(qi, minlength=alive.size)
        d2 = _dist2(aq[qi], C[pos])
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
        d2 = _dist2(np.broadcast_to(Q[a], C.shape), C)
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


POINT_COLS = ("px", "py")
POINT3D_COLS = ("px", "py", "pz")
POINT4D_COLS = ("px", "py", "pz", "pt")


def knn_broadcast(
    boxes: Dataset,
    points_table: pa.Table,
    k: int,
    box_cols: tuple = st.BOX_COLS,
    point_cols: tuple = POINT_COLS,
    with_dist: bool = False,
) -> Dataset:
    """Zero-shuffle-build kNN for a small query side: per batch of boxes,
    each query keeps every candidate with dist2 <= its local k-th
    smallest (ties INCLUDED, so the global merge can apply the exact
    (dist2, idx) order) → one tiny ``groupby(query_id)`` merge of ~k
    rows per query per batch. One small shuffle total. D-generic via
    ``box_cols``/``point_cols`` (6/3 names for 3D, 8/4 for 4D)."""
    tune_context()
    if points_table.num_rows == 0:
        fields = [
            ("query_id", pa.int64()),
            ("idx", pa.int64()),
            ("rank", pa.int64()),
        ]
        if with_dist:
            fields.append(("dist2", pa.float64()))
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    qids = points_table.column("query_id").to_numpy(zero_copy_only=False)
    Q = np.stack(
        [
            points_table.column(c).to_numpy(zero_copy_only=False)
            for c in point_cols
        ],
        axis=1,
    )
    side_ref = ray.put((qids.astype(np.int64), Q))

    def local_topk(tbl: pa.Table) -> pa.Table:
        q_ids, qm = ray.get(side_ref)
        C = _centroids(st.boxes_np(tbl, box_cols))
        ids = st.col_np(tbl, "idx")
        kk = min(k, C.shape[0])
        qrow, pos, d2 = _local_knn_candidates(C, qm, kk)
        return pa.table(
            {"query_id": q_ids[qrow], "idx": ids[pos], "dist2": d2}
        )

    partials = boxes.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=16384
    )
    return _bucketed_topk(partials, k, with_dist)


def _bucketed_topk(
    partials: Dataset, k: int, with_dist: bool = False
) -> Dataset:
    """(query_id, idx, dist2) partials → (query_id, idx, rank[, dist2])
    via the shared coarse-bucket merge (dist2 ASC, idx tie-break)."""
    from .merge import bucketed_topk

    return bucketed_topk(
        partials,
        k,
        id_col="idx",
        value_col="dist2",
        descending=False,
        keep_value="dist2" if with_dist else None,
    )


def knn_join(
    boxes: Dataset,
    points: Dataset,
    k: int,
    res: int = 5,
    broadcast: bool | None = None,
    box_cols: tuple = st.BOX_COLS,
    point_cols: tuple = POINT_COLS,
    with_dist: bool = False,
) -> Dataset:
    """k nearest box centroids per query point → (query_id, idx, rank)
    — plus the exact float64 ``dist2`` when ``with_dist`` is set (the
    sklearn-kneighbors-style contract; both physical paths emit it).

    Small point sides (``KNN_BROADCAST_LIMIT``) take the one-shuffle
    broadcast local-top-k path; large ones the histogram ring-expansion
    cell join. Both paths are D-generic (``box_cols``/``point_cols``:
    6/3 names for 3D, 8/4 for 4D); the cell join partitions on x/y only
    (like the spatial join) while the radius bound comes from a FULL-D
    histogram — keep ``res`` small enough that g^D stays metadata-sized
    (res<=5 for 4D)."""
    dims = len(point_cols)
    if broadcast is not False:
        from .spatial_join import FORCE_BROADCAST_LIMIT

        cap = KNN_BROADCAST_LIMIT if broadcast is None else FORCE_BROADCAST_LIMIT
        ptbl = _try_collect_points(points, cap)
        if ptbl is not None:
            return knn_broadcast(boxes, ptbl, k, box_cols, point_cols, with_dist)
        if broadcast is True:
            raise ValueError(
                f"knn_join(broadcast=True): point side exceeds "
                f"FORCE_BROADCAST_LIMIT ({FORCE_BROADCAST_LIMIT} rows); "
                f"use broadcast=None (auto) or broadcast=False (ring path)"
            )
    tune_context()
    g = 1 << res
    cellw = 1.0 / g
    grid = _centroid_histogram(boxes, res, box_cols)
    # smallest ring with >= k candidates, per cell (k capped at total)
    k_eff = min(k, int(grid.sum())) or 1
    ring = _ring_for_k(grid, res, k_eff, dims)
    ring_ref = ray.put(ring)
    d = dims
    mins, maxs = box_cols[:d], box_cols[d:]

    def to_radius_boxes(tbl: pa.Table) -> pa.Table:
        rng = ray.get(ring_ref)
        P = np.stack([st.col_np(tbl, c) for c in point_cols], axis=1)
        cell = _cell_nd(P, res)
        rad = (rng[cell] + 1).astype(np.float64) * cellw * math.sqrt(float(d))
        cols = {"query_id": st.col_np(tbl, "query_id")}
        for j, c in enumerate(mins):
            cols[c] = P[:, j] - rad
        for j, c in enumerate(maxs):
            cols[c] = P[:, j] + rad
        for j, c in enumerate(point_cols):
            cols[c] = P[:, j]
        return pa.table(cols)

    qboxes = points.map_batches(
        to_radius_boxes, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = _cell_dist_pairs(
        boxes, qboxes, res, box_cols, point_cols, prune_k=k_eff
    )
    return _bucketed_topk(pairs, k, with_dist)


def _cell_dist_pairs(
    boxes: Dataset,
    qboxes: Dataset,
    res: int,
    box_cols: tuple = st.BOX_COLS,
    point_cols: tuple = POINT_COLS,
    prune_k: int | None = None,
) -> Dataset:
    """Cell-shuffle (query point, box centroid, dist2) candidates.

    ``qboxes`` carries per-query search boxes (*box_cols*) plus the point
    coordinates (*point_cols*); every centroid falling inside a query's
    search box is emitted once (owner-cell dedup) with its exact dist2.
    Shared by the kNN ring path (per-query adaptive radius → top-k merge)
    and :func:`radius_join` (constant radius → threshold filter).

    ``prune_k``: keep only each query's ``k`` best candidates PER CELL
    (same (dist2, idx) total order as the downstream merge). Owner-cell
    dedup makes per-cell sets disjoint, so the global top-k over pruned
    sets equals the top-k over everything — but the merge shuffle ships
    O(queries x cells_touched x k) rows instead of every centroid in
    every search disc (the kNN path's dominant volume). Must stay None
    for threshold consumers (radius_join needs ALL in-disc rows)."""
    d = len(point_cols)
    mins, maxs = box_cols[:d], box_cols[d:]

    # centroids as degenerate boxes through the cell join; carry coords
    def centroid_rows(tbl: pa.Table) -> pa.Table:
        C = _centroids(st.boxes_np(tbl, box_cols))
        cols = {"idx": st.col_np(tbl, "idx")}
        for j, c in enumerate(mins):
            cols[c] = C[:, j]
        for j, c in enumerate(maxs):
            cols[c] = C[:, j]
        return pa.table(cols)

    cents = boxes.map_batches(
        centroid_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def expand_build_with_coords(tbl: pa.Table) -> pa.Table:
        # emit point cols explicitly (zeros) so build and probe rows union
        # with an IDENTICAL schema — no reliance on implicit null-promotion
        out = st.expand_boxes_to_cells(
            tbl, res=res, side=st.SIDE_BUILD, id_col="idx", box_cols=box_cols
        )
        zeros = pa.array(np.zeros(out.num_rows, dtype=np.float64))
        for c in point_cols:
            out = out.append_column(c, zeros)
        return out

    build = cents.map_batches(
        expand_build_with_coords,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    # probe rows need the point coords alongside; expand then re-derive
    # from the radius box center would need rad add/sub to round-trip —
    # it need not. Carry the coords explicitly instead.
    probe = qboxes.map_batches(
        _expand_probe_with_coords,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
        fn_kwargs=dict(res=res, box_cols=box_cols, point_cols=point_cols),
    )
    union = build.union(probe)
    return union.groupby("key").map_groups(
        _make_knn_cell(res, box_cols, point_cols, prune_k), batch_format="pyarrow"
    )


def radius_join(
    boxes: Dataset,
    points: Dataset,
    radius: float,
    res: int = 5,
    broadcast: bool | None = None,
    box_cols: tuple = st.BOX_COLS,
    point_cols: tuple = POINT_COLS,
) -> Dataset:
    """Within-distance join: every (query_id, idx, dist2) with the
    EUCLIDEAN distance from the query point to the box centroid
    <= ``radius`` — the fixed-radius sibling of :func:`knn_join`
    (reference analog: a ``batch_query`` over ``[p-r, p+r]`` boxes,
    ``prtree.h:587-729``, tightened from the Chebyshev superset to the
    exact circle).

    Small point sides broadcast (map-only, ZERO shuffle — the threshold
    is a global constant, so no per-query merge is needed, unlike kNN);
    large ones take the one-shuffle cell path. dist2 is computed as the
    literal per-dim ``(p-c)*(p-c)`` sum — the SQL-oracle expression —
    so results tie out bitwise."""
    tune_context()
    from ..functions.prtree import PRTree

    d = len(point_cols)
    mins, maxs = box_cols[:d], box_cols[d:]
    r2 = radius * radius

    if broadcast is not False:
        from .spatial_join import FORCE_BROADCAST_LIMIT

        cap = KNN_BROADCAST_LIMIT if broadcast is None else FORCE_BROADCAST_LIMIT
        ptbl = _try_collect_points(points, cap)
        if ptbl is None:
            if broadcast is True:
                raise ValueError(
                    f"radius_join(broadcast=True): point side exceeds "
                    f"FORCE_BROADCAST_LIMIT ({FORCE_BROADCAST_LIMIT} rows); "
                    f"use broadcast=None (auto) or broadcast=False (cell path)"
                )
        else:
            if ptbl.num_rows == 0:
                return ray.data.from_arrow(
                    pa.schema(
                        [
                            ("query_id", pa.int64()),
                            ("idx", pa.int64()),
                            ("dist2", pa.float64()),
                        ]
                    ).empty_table()
                )
            qids = (
                ptbl.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            Q = np.stack(
                [ptbl.column(c).to_numpy(zero_copy_only=False) for c in point_cols],
                axis=1,
            )
            # Chebyshev superset boxes once, driver-side (small by contract)
            qb = np.hstack([Q - radius, Q + radius])
            side_ref = ray.put((qids, Q, qb))

            def probe(tbl: pa.Table) -> pa.Table:
                q_ids, qm, qbx = ray.get(side_ref)
                C = _centroids(st.boxes_np(tbl, box_cols))
                ids = st.col_np(tbl, "idx")
                tree = PRTree(np.arange(C.shape[0], dtype=np.int64), np.hstack([C, C]))
                qi, ppos = tree.batch_query_positions(qbx)
                pos = tree.idx[ppos]
                d2 = _dist2(qm[qi], C[pos])
                keep = d2 <= r2
                return pa.table(
                    {
                        "query_id": q_ids[qi[keep]],
                        "idx": ids[pos[keep]],
                        "dist2": d2[keep],
                    }
                )

            return boxes.map_batches(
                probe,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=16384,
            )

    # cell path: constant-radius search boxes through the shared kernel
    def to_search_boxes(tbl: pa.Table) -> pa.Table:
        P = np.stack([st.col_np(tbl, c) for c in point_cols], axis=1)
        cols = {"query_id": st.col_np(tbl, "query_id")}
        for j, c in enumerate(mins):
            cols[c] = P[:, j] - radius
        for j, c in enumerate(maxs):
            cols[c] = P[:, j] + radius
        for j, c in enumerate(point_cols):
            cols[c] = P[:, j]
        return pa.table(cols)

    qboxes = points.map_batches(
        to_search_boxes, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = _cell_dist_pairs(boxes, qboxes, res, box_cols, point_cols)

    def threshold(tbl: pa.Table) -> pa.Table:
        d2 = st.col_np(tbl, "dist2")
        return tbl.filter(pa.array(d2 <= r2))

    return pairs.map_batches(threshold, batch_format="pyarrow", zero_copy_batch=True)


def _expand_probe_with_coords(
    tbl: pa.Table,
    res: int,
    box_cols: tuple = st.BOX_COLS,
    point_cols: tuple = POINT_COLS,
) -> pa.Table:
    b = st.boxes_np(tbl, box_cols)
    ids = st.col_np(tbl, "query_id")
    d = len(point_cols)
    # cell partitioning on x/y only (dims 0/1), like the spatial join
    row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, d], b[:, d + 1], res)
    out = {
        "key": cell * st.MAX_SALT,
        "cell": cell,
        "side": np.full(cell.shape[0], st.SIDE_PROBE, dtype=np.int8),
        "id": ids[row],
    }
    for j, c in enumerate(box_cols):
        out[c] = b[row, j]
    for c in point_cols:
        out[c] = st.col_np(tbl, c)[row]
    return pa.table(out)


def _make_knn_cell(
    res: int,
    box_cols: tuple = st.BOX_COLS,
    point_cols: tuple = POINT_COLS,
    prune_k: int | None = None,
):
    d = len(point_cols)

    def knn_cell(group: pa.Table) -> pa.Table:
        side = st.col_np(group, "side")
        ids = st.col_np(group, "id")
        b = st.boxes_np(group, box_cols)
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
        # owner-cell dedup (centroid = degenerate box, lies in ONE x/y
        # cell, but probe radius boxes span many cells)
        cell_val = int(group.column("cell")[0].as_py())
        owner = cellmod.cell_of_points(tree.boxes[pos, 0], tree.boxes[pos, 1], res)
        keep = owner == cell_val
        qi, pos = qi[keep], pos[keep]
        if qi.size == 0:
            return empty
        P = np.stack(
            [st.col_np(group, c)[qsel][qi] for c in point_cols], axis=1
        )
        C = tree.boxes[pos, :d]  # degenerate box mins == centroid coords
        d2 = _dist2(P, C)
        qids, idxs = ids[qsel][qi], tree.idx[pos]
        if prune_k is not None and qids.size > prune_k:
            # per-query top-k inside this cell, in the EXACT
            # (dist2, idx) order bucketed_topk uses — disjoint per-cell
            # candidate sets (owner dedup) make this lossless
            order = np.lexsort((idxs, d2, qids))
            q_s = qids[order]
            starts = np.concatenate([[0], np.nonzero(np.diff(q_s))[0] + 1])
            sizes = np.diff(np.concatenate([starts, [q_s.shape[0]]]))
            rank = np.arange(q_s.shape[0]) - np.repeat(starts, sizes)
            keep = order[rank < prune_k]
            qids, idxs, d2 = qids[keep], idxs[keep], d2[keep]
        return pa.table({"query_id": qids, "idx": idxs, "dist2": d2})

    return knn_cell


def nn_pairs(
    points: Dataset,
    res: int = 5,
    broadcast: bool | None = None,
    id_col: str = "query_id",
) -> Dataset:
    """Nearest-OTHER-point per point — ``(query_id, nn_id)`` with the
    exact (dist2, id) order, the self-kNN building block of spatial
    outlier / nn-distance statistics.

    Composition, not new machinery: the point set doubles as a
    degenerate-box tree side (xmin=xmax=px, so the centroid is exactly
    the point), :func:`knn_join` finds the top-2 per query (self is the
    dist2=0 candidate unless coordinates collide), the self row drops,
    and one tiny fixed-width-row merge keeps the best survivor. Both
    knn physical paths (broadcast / histogram ring) work unchanged."""
    tune_context()
    import pyarrow.compute as pc

    from .merge import bucketed_topk

    def as_boxes(tbl: pa.Table) -> pa.Table:
        px, py = tbl.column("px"), tbl.column("py")
        return pa.table(
            {
                "idx": tbl.column(id_col).cast(pa.int64()),
                "xmin": px,
                "ymin": py,
                "xmax": px,
                "ymax": py,
            }
        )

    boxes = points.map_batches(
        as_boxes, batch_format="pyarrow", zero_copy_batch=True
    )
    top2 = knn_join(boxes, points, k=2, res=res, broadcast=broadcast)

    def drop_self(tbl: pa.Table) -> pa.Table:
        return tbl.filter(
            pc.not_equal(tbl.column("idx"), tbl.column("query_id"))
        )

    cand = top2.map_batches(drop_self, batch_format="pyarrow", zero_copy_batch=True)
    best = bucketed_topk(cand, k=1, id_col="idx", value_col="rank", descending=False)

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"query_id": tbl.column("query_id"), "nn_id": tbl.column("idx")}
        )

    return best.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def clark_evans(
    points: Dataset,
    res: int = 5,
    broadcast: bool | None = None,
    coords=None,
) -> Dataset:
    """Clark–Evans-style nearest-neighbor CSR index, squared-distance
    variant: ONE row ``(n_points, sum_nn_s, ce_ratio)`` where
    ``ce_ratio = mean(d²_nn) / E_CSR[d²_nn]`` (< 1 clustered, ≈ 1
    random, > 1 dispersed — the NN-distance companion of the quadrat
    and autocorrelation tests). For N points in the unit square the
    CSR expectation is E[d²_nn] = 1/(π·N), so the ratio collapses to
    ``S · π / MOD²`` with S the exact-integer scaled distance sum.

    Exactness contract: per-pair d² is ONE double expression
    (``dx·dx + dy·dy``) evaluated identically by NumPy and DuckDB,
    then scaled by the fixed constant MOD² and FLOORED to an int64 —
    so the per-point minima are bitwise identical both sides and the
    global sum is an order-independent exact integer; π enters once
    in the final fixed expression (``PI()`` and ``math.pi`` are the
    same double). ``coords(ids) -> {px, py}`` recomputes coordinates
    from ids (default: the derive channels the oracle tables use).

    Scale shape: rides :func:`nn_pairs` (cell/ring kNN, no all-pairs);
    the reduction is a per-batch 2-int partial fold — the driver sums
    block partials, never rows.
    """
    import math

    from ..functions import derive

    if coords is None:
        coords = derive.derive_points
    MOD2 = 1000000007.0 * 1000000007.0

    nn = nn_pairs(points, res=res, broadcast=broadcast)
    INT64_MAX = (1 << 63) - 1

    def scaled(tbl: pa.Table) -> pa.Table:
        q = tbl.column("query_id").to_numpy(zero_copy_only=False)
        m = tbl.column("nn_id").to_numpy(zero_copy_only=False)
        pq, pm = coords(q), coords(m)
        dx = pq["px"] - pm["px"]
        dy = pq["py"] - pm["py"]
        s = np.floor((dx * dx + dy * dy) * MOD2).astype(np.int64)
        tot = int(s.astype(object).sum()) if s.size else 0
        if tot > INT64_MAX:
            raise ValueError(
                "clark_evans: per-batch scaled-distance partial overflows "
                "int64 (pathologically dispersed input)"
            )
        return pa.table(
            {
                "n": pa.array([int(s.size)], pa.int64()),
                "s": pa.array([tot], pa.int64()),
            }
        )

    parts = nn.map_batches(
        scaled, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    import pyarrow.compute as pc

    n = s = 0
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        n += int(pc.sum(t.column("n")).as_py() or 0)
        s += int(pc.sum(t.column("s")).as_py() or 0)
    ratio = (float(s) * math.pi) / MOD2 if n else None
    return ray.data.from_arrow(
        pa.table(
            {
                "n_points": pa.array([n], pa.int64()),
                "sum_nn_s": pa.array([s], pa.int64()),
                "ce_ratio": pa.array([ratio], pa.float64()),
            }
        )
    )


def clark_evans_sql(points_cte: str) -> str:
    """DuckDB twin of :func:`clark_evans` — identical double d²
    expression, identical FLOOR scaling, HUGEINT-exact sum, one fixed
    final expression (CAST · PI() / MOD²)."""
    return """
WITH p AS ({cte}),
d AS (SELECT a.query_id AS id,
             MIN((a.px - b.px) * (a.px - b.px)
                 + (a.py - b.py) * (a.py - b.py)) AS d2
      FROM p a JOIN p b ON a.query_id <> b.query_id
      GROUP BY a.query_id),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CAST(FLOOR(
               d2 * (CAST(1000000007 AS DOUBLE) * CAST(1000000007 AS DOUBLE))) AS BIGINT)), 0)
               AS HUGEINT) AS s
      FROM d)
SELECT n AS n_points,
       CAST(s AS BIGINT) AS sum_nn_s,
       CASE WHEN n > 0
            THEN (CAST(s AS DOUBLE) * PI())
                 / (CAST(1000000007 AS DOUBLE) * CAST(1000000007 AS DOUBLE))
       ELSE NULL END AS ce_ratio
FROM g
""".format(cte=points_cte)


def nn_histogram(
    points: Dataset,
    res: int = 5,
    broadcast: bool | None = None,
    coords=None,
) -> Dataset:
    """Nearest-neighbor distance distribution — the empirical
    G-function of point-pattern analysis, binned in log₂-spaced lags
    of the FLOOR-scaled squared NN distance: ``(bin, n)`` with
    ``bin = ⌊log₂ s⌋`` for ``s = ⌊d²_nn · MOD²⌋`` and ``bin = -1``
    for exactly-coincident neighbors (s = 0). Mass at low bins =
    clustering, high bins = dispersion — the distributional
    companion of the scalar :func:`clark_evans` ratio.

    Exactness: d² is the ONE shared double expression, the scale/FLOOR
    step matches :func:`clark_evans` bit for bit, and the bin comes
    from exact INTEGER comparisons against powers of two (no libm log,
    no float exponent — s can exceed 2⁵³ where float rounding could
    cross a power-of-two boundary); the SQL twin is a generated
    power-of-two CASE ladder on the same BIGINT.

    Scale shape: rides :func:`nn_pairs` (cell/ring kNN, never
    all-pairs); per-batch (bin, n) partials, ONE tiny bucketed fold —
    output is ≤63 rows at any size.
    """
    from ..functions import derive
    from .merge import bucketed_sum

    if coords is None:
        coords = derive.derive_points
    MOD2 = 1000000007.0 * 1000000007.0
    # s = floor(d2 * MOD2) <= floor(2 * MOD2) < 2^61
    pows = (np.int64(1) << np.arange(62, dtype=np.int64))

    nn = nn_pairs(points, res=res, broadcast=broadcast)

    def binned(tbl: pa.Table) -> pa.Table:
        q = tbl.column("query_id").to_numpy(zero_copy_only=False)
        m = tbl.column("nn_id").to_numpy(zero_copy_only=False)
        pq, pm = coords(q), coords(m)
        dx = pq["px"] - pm["px"]
        dy = pq["py"] - pm["py"]
        s = np.floor((dx * dx + dy * dy) * MOD2).astype(np.int64)
        # exact floor(log2): count powers of two <= s; s = 0 -> -1
        bins = (s[:, None] >= pows[None, :]).sum(axis=1).astype(np.int64) - 1
        key, inv = np.unique(bins, return_inverse=True)
        n = np.bincount(inv, minlength=key.size).astype(np.int64)
        return pa.table({"bin": key, "n": n})

    parts = nn.map_batches(
        binned, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return bucketed_sum(parts, key_col="bin", value_cols=("n",), n_buckets=16)


def nn_histogram_sql(points_cte: str) -> str:
    """DuckDB twin of :func:`nn_histogram` — MIN-d² per point (nn-tie
    proof: the histogram depends only on the minimum), identical FLOOR
    scaling, generated power-of-two CASE ladder on the exact BIGINT."""
    ladder = " ".join(
        f"WHEN s < {1 << (k + 1)} THEN {k}" for k in range(62)
    )
    return f"""
WITH p AS ({points_cte}),
d AS (SELECT MIN((a.px - b.px) * (a.px - b.px)
                 + (a.py - b.py) * (a.py - b.py)) AS d2
      FROM p a JOIN p b ON a.query_id <> b.query_id
      GROUP BY a.query_id),
s AS (SELECT CAST(FLOOR(d2 * (CAST(1000000007 AS DOUBLE)
                              * CAST(1000000007 AS DOUBLE))) AS BIGINT) AS s
      FROM d),
b AS (SELECT CASE WHEN s = 0 THEN -1 {ladder} END AS bin FROM s)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY bin
"""


def knn_regress(
    boxes: Dataset,
    points: Dataset,
    k: int,
    res: int = 5,
    broadcast: bool | None = None,
    measure=None,
    n_buckets: int = 256,
) -> Dataset:
    """k-nearest-neighbor regression — predict each query point's
    value as the MEAN of its k nearest data items' integer measures
    (the classic non-parametric spatial predictor; the supervised
    companion of :func:`knn_join`). Output ``(query_id, n_nb, sum_v,
    pred)`` with ``pred = sum_v / n_nb`` (n_nb < k only when the data
    side itself is smaller than k).

    Exactness: neighbor selection is the deterministic (dist2, idx)
    kNN order shared with the SQL twin; measures are exact ints
    (``measure(idx) -> int64``, default the derive channel), so sum_v
    is exact and pred is ONE double division — bitwise-equal to SQL.

    Scale shape: rides :func:`knn_join` (broadcast or histogram-ring
    path); per-batch (query, n, Σv) partials collapse the k rows per
    query before ONE tiny bucketed fold. Raw candidates never reach
    the driver.
    """
    tune_context()
    from ..functions import derive
    from .merge import bucketed_sum

    if measure is None:
        measure = derive.point_measure

    top = knn_join(boxes, points, k=k, res=res, broadcast=broadcast)

    def partial(tbl: pa.Table) -> pa.Table:
        q = tbl.column("query_id").to_numpy(zero_copy_only=False)
        idx = tbl.column("idx").to_numpy(zero_copy_only=False)
        v = measure(idx).astype(np.int64)
        key, inv = np.unique(q, return_inverse=True)
        n = np.bincount(inv, minlength=key.size).astype(np.int64)
        sv = np.bincount(inv, weights=v.astype(np.float64), minlength=key.size)
        # measure < 1000 and <= k rows per query per batch: the float64
        # pathway through bincount stays far below 2^53 (exact)
        return pa.table(
            {"query_id": key, "n": n, "sv": sv.astype(np.int64)}
        )

    summed = bucketed_sum(
        top.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="query_id",
        value_cols=("n", "sv"),
        n_buckets=n_buckets,
    )

    def finish(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        sv = tbl.column("sv").to_numpy(zero_copy_only=False)
        # int64→float64 conversion is round-to-nearest (same as SQL's
        # CAST), then ONE IEEE division per query row — vectorized
        pred = sv.astype(np.float64) / n.astype(np.float64)
        return pa.table(
            {
                "query_id": tbl.column("query_id"),
                "n_nb": pa.array(n, pa.int64()),
                "sum_v": pa.array(sv, pa.int64()),
                "pred": pa.array(pred, pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)

def closest_pair(
    points: Dataset,
    res: int = 5,
    broadcast: bool | None = None,
    coords=None,
) -> Dataset:
    """GLOBAL closest pair of a point set: ONE row ``(id_a, id_b, d2)``
    with ``id_a < id_b`` — the corpus-wide minimum-separation scalar
    (the min-companion of :func:`points_diameter`'s max).

    Exactness: the global closest pair (a*, b*) is each other's nearest
    neighbor (nothing sits closer to a* than b*), so the pair is IN the
    :func:`nn_pairs` stream — no all-pairs sweep. ``d2`` is recomputed
    per candidate from the ids (``coords(ids) -> {px, py}``, defaulting
    to the derive channels the oracle tables use) as the ONE double
    expression ``dx*dx + dy*dy`` — IEEE negation symmetry makes the two
    orientations of a pair bitwise equal, and double comparison (unlike
    summation) is order-independent, so the per-batch argmin partials
    and the final single-group min pick the identical winner at any
    parallelism. Deterministic tie-break: (d2, id_a, id_b).

    Scale shape: rides nn_pairs (cell/ring kNN); each candidate batch
    folds to a 1-row partial; the final merge sees one row per block."""
    from ..functions import derive

    if coords is None:
        coords = derive.derive_points

    nn = nn_pairs(points, res=res, broadcast=broadcast)

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "d2": pa.array([], pa.float64()),
            }
        )
        q = tbl.column("query_id").to_numpy(zero_copy_only=False)
        if q.size == 0:
            return empty
        m = tbl.column("nn_id").to_numpy(zero_copy_only=False)
        cq, cm = coords(q), coords(m)
        dx = cq["px"] - cm["px"]
        dy = cq["py"] - cm["py"]
        d2 = dx * dx + dy * dy
        a, b = np.minimum(q, m), np.maximum(q, m)
        i = np.lexsort((b, a, d2))[0]
        return pa.table(
            {
                "k": pa.array([np.int64(0)], pa.int64()),
                "id_a": pa.array([a[i]], pa.int64()),
                "id_b": pa.array([b[i]], pa.int64()),
                "d2": pa.array([d2[i]], pa.float64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        a = group.column("id_a").to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        b = group.column("id_b").to_numpy(zero_copy_only=False)
        d2 = group.column("d2").to_numpy(zero_copy_only=False)
        i = np.lexsort((b, a, d2))[0]
        return pa.table(
            {
                "id_a": pa.array([a[i]], pa.int64()),
                "id_b": pa.array([b[i]], pa.int64()),
                "d2": pa.array([d2[i]], pa.float64()),
            }
        )

    return (
        nn.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["id_a", "id_b", "d2"])
    )


def closest_pair_sql(points_cte: str) -> str:
    """DuckDB twin of :func:`closest_pair` — the O(n²) min self-join
    (oracle baseline, not the scale path); same single-expression d2
    and the same (d2, id_a, id_b) tie-break."""
    return f"""
WITH p AS ({points_cte}),
d AS (
  SELECT a.query_id AS id_a, b.query_id AS id_b,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id < b.query_id
)
SELECT id_a, id_b, d2 FROM d ORDER BY d2, id_a, id_b LIMIT 1
"""
