"""H3/S2-style tile-assignment pipelines (stateless map_batches).

Tile assignments are pure functions of geometry → deterministic across
runs, block orders, and parallelism levels (north-rule requirement:
"identical H3/S2 tile assignments"). No shuffle — embarrassingly
parallel over batches.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH
from ..functions import cells as cellmod
from ..functions import derive
from ..stages import spatial as st


def tile_centroids(boxes: Dataset, res: int) -> Dataset:
    """(idx, cell): tile of each box's centroid — the 1:1 assignment."""

    def assign(tbl: pa.Table) -> pa.Table:
        b = st.boxes_np(tbl)
        cx = (b[:, 0] + b[:, 2]) * 0.5
        cy = (b[:, 1] + b[:, 3]) * 0.5
        cell = derive.tile_cell(cx, cy, res)
        return pa.table({"idx": st.col_np(tbl, "idx"), "cell": cell})

    return boxes.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def tile_cover(boxes: Dataset, res: int) -> Dataset:
    """(idx, cell): every tile each box overlaps (1:N, closed-interval —
    a box edge exactly on a tile boundary belongs to both tiles)."""

    def assign(tbl: pa.Table) -> pa.Table:
        b = st.boxes_np(tbl)
        ids = st.col_np(tbl, "idx")
        row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, 2], b[:, 3], res)
        return pa.table({"idx": ids[row], "cell": cell})

    return boxes.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def tile_points(points: Dataset, res: int) -> Dataset:
    """(query_id, cell) for point rows (px, py)."""

    def assign(tbl: pa.Table) -> pa.Table:
        cell = derive.tile_cell(st.col_np(tbl, "px"), st.col_np(tbl, "py"), res)
        return pa.table({"query_id": st.col_np(tbl, "query_id"), "cell": cell})

    return points.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def raster_tile_join(boxes: Dataset, res: int) -> Dataset:
    """Raster↔vector assignment: procedurally-generated raster tile grid at
    resolution ``res`` joined against vector boxes — reduces to the cover
    expansion plus tile extent columns (no materialized raster table; the
    grid exists only as arithmetic, which is what makes this scale)."""

    def assign(tbl: pa.Table) -> pa.Table:
        b = st.boxes_np(tbl)
        ids = st.col_np(tbl, "idx")
        row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, 2], b[:, 3], res)
        ext = cellmod.cell_bounds(cell, res)
        return pa.table(
            {
                "idx": ids[row],
                "cell": cell,
                "tile_xmin": ext[:, 0],
                "tile_ymin": ext[:, 1],
                "tile_xmax": ext[:, 2],
                "tile_ymax": ext[:, 3],
            }
        )

    return boxes.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def tile_extent(boxes: Dataset, res: int) -> Dataset:
    """Per-tile box statistics: ``(cell, n_boxes, env_xmin, env_ymin,
    env_xmax, env_ymax)`` — the count and the envelope (bounding-box
    union) of every box overlapping each tile.

    Scale shape: each batch reduces its cover expansion to ONE row per
    distinct cell (sorted-run ``reduceat``, no Python loop), so the
    global groupby shuffles at most one row per (cell, batch); count and
    min/max are order-independent, so results are bitwise-stable across
    partitionings."""
    import numpy as np

    from ray.data.aggregate import Max, Min, Sum

    def partial(tbl: pa.Table) -> pa.Table:
        b = st.boxes_np(tbl)
        row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, 2], b[:, 3], res)
        if not cell.size:
            return pa.table(
                {
                    "cell": np.empty(0, np.int64),
                    "n": np.empty(0, np.int64),
                    "env_xmin": np.empty(0, np.float64),
                    "env_ymin": np.empty(0, np.float64),
                    "env_xmax": np.empty(0, np.float64),
                    "env_ymax": np.empty(0, np.float64),
                }
            )
        order = np.argsort(cell, kind="stable")
        cs, rs = cell[order], row[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        return pa.table(
            {
                "cell": cs[starts],
                "n": np.diff(np.r_[starts, cs.size]).astype(np.int64),
                "env_xmin": np.minimum.reduceat(b[rs, 0], starts),
                "env_ymin": np.minimum.reduceat(b[rs, 1], starts),
                "env_xmax": np.maximum.reduceat(b[rs, 2], starts),
                "env_ymax": np.maximum.reduceat(b[rs, 3], starts),
            }
        )

    partials = boxes.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return partials.groupby("cell").aggregate(
        Sum("n", alias_name="n_boxes"),
        Min("env_xmin", alias_name="env_xmin"),
        Min("env_ymin", alias_name="env_ymin"),
        Max("env_xmax", alias_name="env_xmax"),
        Max("env_ymax", alias_name="env_ymax"),
    )


def cell_histogram(boxes: Dataset, res: int) -> Dataset:
    """(cell, n_boxes): per-cell box-cover counts — the engine's salting /
    kNN histogram as a user-facing aggregate. Counts pre-reduce inside
    each batch, so the global groupby shuffles at most one row per
    distinct cell per batch."""
    from ray.data.aggregate import Sum

    from ..stages import spatial as st

    partial = boxes.map_batches(
        st.cell_count_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
        fn_kwargs=dict(res=res),
    )
    return (
        partial.groupby("cell")
        .aggregate(Sum("n", alias_name="n_boxes"))
        .select_columns(["cell", "n_boxes"])
    )


def tile_pyramid(points: Dataset, res: int) -> Dataset:
    """Multi-resolution tile-count pyramid: ``(res, cell, n_points)`` for
    EVERY resolution ``res .. 0`` (the zoom-pyramid build step of a tile
    server / heatmap pipeline).

    Scale shape: ONE pass over the points emits per-batch pre-combined
    counts for ALL levels at once (floor-division nesting makes each
    coarse count the exact rollup of its 4 children, so no per-level
    re-read), packed into a single ``cell*16+res`` int64 key; ONE
    coarse-bucket shuffle sums them. Partial rows per batch are bounded
    by ~4/3 x the batch's distinct finest cells — tile-sized, never
    point-sized."""
    import numpy as np

    from ..functions.cells import cell_of_points, parent_cell
    from .merge import bucketed_sum

    if not 0 <= res < 16:
        raise ValueError(f"res must be in [0, 16): {res}")

    def partial(tbl: pa.Table) -> pa.Table:
        px = tbl.column("px").to_numpy(zero_copy_only=False)
        py = tbl.column("py").to_numpy(zero_copy_only=False)
        c, n = np.unique(cell_of_points(px, py, res), return_counts=True)
        keys, counts = [], []
        for r in range(res, -1, -1):
            keys.append(c * np.int64(16) + np.int64(r))
            counts.append(n)
            if r and c.size:
                # roll distinct-cell counts up one level (children of
                # different cells can share a parent: sort + reduceat)
                p = parent_cell(c, r)
                order = np.argsort(p, kind="stable")
                ps = p[order]
                starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
                n = np.add.reduceat(n[order], starts)
                c = ps[starts]
        return pa.table(
            {"key": np.concatenate(keys), "n": np.concatenate(counts)}
        )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "res": key % np.int64(16),
                "cell": key // np.int64(16),
                "n_points": tbl.column("n"),
            }
        )

    partials = points.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    summed = bucketed_sum(partials, key_col="key", value_cols=("n",))
    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def hotspot_cells(points: Dataset, res: int) -> Dataset:
    """Focal (3x3 neighborhood) point-density per tile — the raster
    hotspot / Getis-Ord-style smoothing op of a heatmap pipeline:
    ``(cell, n_points, focal_sum)`` for every NON-EMPTY cell, where
    ``focal_sum`` counts points in the cell and its in-grid Chebyshev-1
    neighbors (border cells simply have fewer neighbors — no wrap).

    Scale shape: ONE pass collapses each batch to distinct-cell counts;
    each distinct cell emits its own count row plus <=9 neighbor
    contribution rows (tile-sized partials, never point-sized); ONE
    coarse-bucket shuffle sums both columns; empty cells drop at the
    end. Exact int64 throughout -> SQL-oracle hash-green."""
    import numpy as np

    from ..functions.cells import cell_of_points, neighbor_cells
    from .merge import bucketed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        px = tbl.column("px").to_numpy(zero_copy_only=False)
        py = tbl.column("py").to_numpy(zero_copy_only=False)
        c, n = np.unique(cell_of_points(px, py, res), return_counts=True)
        n = n.astype(np.int64)
        row, nb = neighbor_cells(c, res, ring=1)  # includes the cell itself
        return pa.table(
            {
                "cell": np.concatenate([c, nb]),
                "n_points": np.concatenate([n, np.zeros(nb.size, np.int64)]),
                "focal_sum": np.concatenate([np.zeros(c.size, np.int64), n[row]]),
            }
        )

    def nonempty(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tbl.filter(pc.greater(tbl.column("n_points"), 0))

    partials = points.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    summed = bucketed_sum(
        partials, key_col="cell", value_cols=("n_points", "focal_sum")
    )
    return summed.map_batches(nonempty, batch_format="pyarrow", zero_copy_batch=True)


def tile_neighbors(points: Dataset, res: int) -> Dataset:
    """Occupied-cell adjacency statistic: for every OCCUPIED tile, how
    many of its 8 in-grid neighbors are also occupied —
    ``(cell, n_neighbors)``, zeros included. The binary-occupancy
    complement of :func:`hotspot_cells` (which sums point DENSITY over
    the same neighborhood); this is the join-contiguity / cluster-edge
    statistic of a tiling pipeline.

    Occupancy is a global property, so a single-pass partial sum would
    double-count a neighbor seen in two batches. Shape: pass 1 dedups to
    the distinct occupied cell set (coarse-bucket groupby over int64
    cells — tile-sized, never point-sized); pass 2 each distinct cell
    emits one occupancy marker plus ≤8 neighbor offers, and a second
    cell-bucket groupby counts offers landing on occupied cells. Two
    metadata-sized shuffles; points themselves never shuffle.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells

    def batch_cells(tbl: pa.Table) -> pa.Table:
        px = tbl.column("px").to_numpy(zero_copy_only=False)
        py = tbl.column("py").to_numpy(zero_copy_only=False)
        c = np.unique(cell_of_points(px, py, res))
        return pa.table({"bucket": bucket_of(c, 256), "cell": c})

    def dedup(group: pa.Table) -> pa.Table:
        c = np.unique(group.column("cell").to_numpy(zero_copy_only=False))
        return pa.table({"cell": c})

    occupied = (
        points.map_batches(
            batch_cells,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(dedup, batch_format="pyarrow")
    )

    def offers(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cell").to_numpy(zero_copy_only=False)
        row, nb = neighbor_cells(c, res, ring=1)
        off = nb[nb != c[row]]  # drop the self cell from each ring
        cells = np.concatenate([c, off])
        return pa.table(
            {
                "bucket": bucket_of(cells, 256),
                "cell": cells,
                "is_occ": np.concatenate(
                    [np.ones(c.size, np.int8), np.zeros(off.size, np.int8)]
                ),
            }
        )

    def count_occupied(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        occ = group.column("is_occ").to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c_s, occ_s = c[order], occ[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(c_s))[0] + 1])
        counts = np.diff(np.concatenate([starts, [c_s.shape[0]]]))
        has_marker = np.add.reduceat(occ_s.astype(np.int64), starts) > 0
        # every occupied source emits exactly one marker, so offers per
        # group = group size minus its marker
        n_nb = counts - 1
        return pa.table(
            {
                "cell": c_s[starts][has_marker],
                "n_neighbors": n_nb[has_marker].astype(np.int64),
            }
        )

    return (
        occupied.map_batches(offers, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(count_occupied, batch_format="pyarrow")
    )


def tile_topk(points: Dataset, res: int, k: int = 3) -> Dataset:
    """(cell, query_id, score, rank): top-k points per tile by score —
    the "k best POIs per map tile" primitive (reference's per-cell result
    ranking done tile-local instead of global).

    Scale shape: tile assignment is a stateless map; the per-tile rank
    reuses :func:`~.merge.grouped_topk`, which prunes every batch to k
    rows per cell map-side before ONE coarse cell-hash shuffle — raw
    points never shuffle. SQL twin: ``ROW_NUMBER() OVER (PARTITION BY
    cell ORDER BY score DESC, query_id) <= k``.
    """
    from .merge import grouped_topk

    def assign(tbl: pa.Table) -> pa.Table:
        qid = st.col_np(tbl, "query_id")
        cell = derive.tile_cell(
            st.col_np(tbl, "px"), st.col_np(tbl, "py"), res
        )
        return pa.table(
            {
                "cell": cell,
                "query_id": qid,
                "score": derive.point_score(qid),
            }
        )

    scored = points.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_topk(
        scored, k=k, key_col="cell", id_col="query_id", value_col="score"
    )


def tile_quantiles(points: Dataset, res: int, qs=(0.5, 0.9, 0.99)) -> Dataset:
    """(cell, p50, p90, p99): exact per-tile R-7 quantiles of the derived
    integer point measure (per-tile sensor-value distribution — zonal
    statistics beyond count/extent).

    Scale shape: stateless tile assign, then :func:`~.quantiles.
    int_quantiles` — per-batch (cell, value) count histograms combine
    map-side, so the shuffle carries one row per distinct (cell, value)
    per batch, bounded by measure cardinality (1000), never by points.
    """
    from .quantiles import int_quantiles

    def assign(tbl: pa.Table) -> pa.Table:
        qid = st.col_np(tbl, "query_id")
        cell = derive.tile_cell(
            st.col_np(tbl, "px"), st.col_np(tbl, "py"), res
        )
        return pa.table({"cell": cell, "v": derive.point_measure(qid)})

    assigned = points.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return int_quantiles(assigned, key_col="cell", int_col="v", qs=qs)


def tile_quadkey(points: Dataset, res: int) -> Dataset:
    """(query_id, cell, quadkey): the Bing-maps quadkey string token of
    each point's tile — the interop form of the engine's integer cell
    ids (H3/S2-style systems exchange cells as string tokens; a quadkey
    digit interleaves one x-bit and one y-bit per zoom level, MSB
    first). Stateless map, zero shuffle; the digit math is pure int64
    and the string build is one Arrow cast + lpad, so the SQL twin
    (same arithmetic, CAST + lpad) matches exactly."""
    if not 1 <= res <= 18:
        raise ValueError(f"quadkey res must be in [1, 18], got {res}")

    def assign(tbl: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        qid = st.col_np(tbl, "query_id")
        px, py = st.col_np(tbl, "px"), st.col_np(tbl, "py")
        ix = derive.tile_index(px, res)
        iy = derive.tile_index(py, res)
        qint = np.zeros(qid.shape[0], np.int64)
        for b in range(res - 1, -1, -1):
            # zoom level (res-1-b) reads bit b — MSB first, so bit b
            # lands at decimal place 10^b
            digit = ((ix >> b) & 1) + 2 * ((iy >> b) & 1)
            qint = qint + digit * (10 ** b)
        g = 1 << res
        return pa.table(
            {
                "query_id": pa.array(qid),
                "cell": pa.array(ix * g + iy),
                "quadkey": pc.utf8_lpad(
                    pc.cast(pa.array(qint), pa.string()), res, "0"
                ),
            }
        )

    return points.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
