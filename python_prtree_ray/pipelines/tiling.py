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
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]][: cs.size])
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
                starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]][: ps.size])
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


def _autocorr_stats(points: Dataset, res: int, n_buckets: int):
    """Shared exact-integer machinery of the global spatial-
    autocorrelation statistics (:func:`morans_i`, :func:`gearys_c`):
    queen contiguity (8 in-grid neighbors), binary weights, OCCUPIED
    cells only (enumerating empty cells is lattice-sized, which at res
    16+ dwarfs the data; the occupied-cell variant is standard for
    sparse grids and the SQL twins compute the same set).

    Returns the Python-int tuple ``(N, S, SX2, W, P, Q, C2)``: N
    occupied cells with counts x_i, S = Σx, SX2 = Σx², and over the W
    ordered neighbor pairs P = Σ x_i·x_j, Q = Σ (x_i+x_j),
    C2 = Σ (x_i−x_j)² — everything either statistic needs, all exact.

    Scale shape: pass 1 collapses each point batch to distinct-cell
    counts and folds them exactly via ``bucketed_sum`` (tile-sized,
    never point-sized). Pass 2 streams the cell table: each cell emits
    one occupancy row plus ≤8 neighbor offers carrying its count; ONE
    cell-bucket groupby matches offers to occupied cells (vectorized
    searchsorted) and collapses each bucket to a single 7-number partial
    row. The driver folds ≤``n_buckets`` partial rows — never cells,
    never points. Per-bucket int64 partials are overflow-guarded (P is
    bounded by S², checked loudly): corpora past that bound should
    raise ``res`` so counts spread across more cells.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells
    from .merge import bucketed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    def offers(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        row, nb = neighbor_cells(c, res, ring=1)  # includes self
        off = nb != c[row]
        cells = np.concatenate([c, nb[off]])
        xv = np.concatenate([x, x[row][off]])
        is_occ = np.concatenate(
            [np.ones(c.size, np.int8), np.zeros(nb[off].size, np.int8)]
        )
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "xv": xv,
                "is_occ": is_occ,
            }
        )

    INT64_MAX = (1 << 63) - 1

    def fold(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        xv = group.column("xv").to_numpy(zero_copy_only=False)
        occ = group.column("is_occ").to_numpy(zero_copy_only=False) == 1
        oc, ox = c[occ], xv[occ]
        so = np.argsort(oc)
        oc_s, ox_s = oc[so], ox[so]
        fc, fx = c[~occ], xv[~occ]
        pos = np.searchsorted(oc_s, fc)
        pos_c = np.minimum(pos, max(oc_s.size - 1, 0))
        hit = (
            (pos < oc_s.size) & (oc_s[pos_c] == fc)
            if oc_s.size
            else np.zeros(fc.size, bool)
        )
        xd = ox_s[pos_c[hit]].astype(object)  # destination cell count
        xs = fx[hit].astype(object)  # source cell count
        # exact Python-int partials on metadata-sized arrays (<= 9 rows
        # per occupied cell in this bucket) — immune to int64 overflow
        # in the SUM; each per-bucket total is then range-checked back
        # into int64 for the tiny partial row
        vals = {
            "n": int(oc.size),
            "s": int(ox.astype(object).sum()) if ox.size else 0,
            "sx2": int((ox.astype(object) * ox).sum()) if ox.size else 0,
            "w": int(hit.sum()),
            "p": int((xd * xs).sum()) if xd.size else 0,
            "q": int((xd + xs).sum()) if xd.size else 0,
            "c2": int(((xd - xs) * (xd - xs)).sum()) if xd.size else 0,
        }
        for k, v in vals.items():
            if v > INT64_MAX:
                raise ValueError(
                    f"spatial autocorrelation: per-bucket partial {k} "
                    f"overflows int64; raise res so per-cell counts "
                    f"spread thinner"
                )
        return pa.table({k: pa.array([v], pa.int64()) for k, v in vals.items()})

    parts = (
        counts.map_batches(
            offers,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )

    import ray
    import pyarrow.compute as pc

    acc = {k: 0 for k in ("n", "s", "sx2", "w", "p", "q", "c2")}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for k in acc:
            acc[k] += int(pc.sum(t.column(k)).as_py() or 0)
    return (
        acc["n"],
        acc["s"],
        acc["sx2"],
        acc["w"],
        acc["p"],
        acc["q"],
        acc["c2"],
    )


def _one_row(n: int, w: int, stat_name: str, value) -> Dataset:
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([n], pa.int64()),
                "w_pairs": pa.array([w], pa.int64()),
                stat_name: pa.array([value], pa.float64()),
            }
        )
    )


def morans_i(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """Global Moran's I spatial autocorrelation of tile point-densities
    — the classic "is this heatmap clustered or random?" statistic of a
    spatial-statistics pipeline. ONE row: ``(n_cells, w_pairs,
    morans_i)``; weights/cell-set semantics and the distributed shape
    live in :func:`_autocorr_stats`.

    Exactness: the common N² factor cancels to

        I = (N²·P − N·S·Q + S²·W) / (W · (N·SX2 − S²))

    where numerator and denominator are exact integers (arbitrary-
    precision Python ints at the metadata-sized fold) and the ONE float
    op is the final division — so the DuckDB twin (HUGEINT sums, one
    CAST-to-DOUBLE division) matches bitwise. Degenerate inputs (no
    neighbor pairs, or zero variance) yield NULL, never inf/NaN.
    """
    N, S, SX2, W, P, Q, _ = _autocorr_stats(points, res, n_buckets)
    num = N * N * P - N * S * Q + S * S * W
    den = W * (N * SX2 - S * S)
    return _one_row(N, W, "morans_i", float(num) / float(den) if den else None)


def gearys_c(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """Global Geary's C of tile point-densities — Moran's I's
    difference-based companion (sensitive to local rather than global
    structure; C < 1 clustered, C ≈ 1 random, C > 1 dispersed). ONE
    row: ``(n_cells, w_pairs, gearys_c)``; semantics and distributed
    shape shared with :func:`morans_i` via :func:`_autocorr_stats`.

    Exactness: with C2 = Σ_w (x_i−x_j)² over the W ordered neighbor
    pairs,

        C = ((N−1)·N·C2) / (2·W·(N·SX2 − S²))

    — exact-integer numerator and denominator, ONE float division, so
    the DuckDB twin matches bitwise."""
    N, S, SX2, W, _, _, C2 = _autocorr_stats(points, res, n_buckets)
    num = (N - 1) * N * C2
    den = 2 * W * (N * SX2 - S * S)
    return _one_row(N, W, "gearys_c", float(num) / float(den) if den else None)


def morans_i_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`morans_i` — HUGEINT-exact sums, one final
    CAST-to-DOUBLE division (both sides round-to-nearest-even)."""
    g = 1 << res
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {ix} AS ix, {iy} AS iy, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1, 2),
gsum AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(x) AS HUGEINT) AS s,
                CAST(SUM(x * x) AS HUGEINT) AS sx2 FROM c),
e AS (SELECT CAST(COUNT(*) AS HUGEINT) AS w,
             CAST(COALESCE(SUM(a.x * b.x), 0) AS HUGEINT) AS p,
             CAST(COALESCE(SUM(a.x + b.x), 0) AS HUGEINT) AS q
      FROM c a JOIN c b
      ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1
         AND NOT (a.ix = b.ix AND a.iy = b.iy))
SELECT CAST(gsum.n AS BIGINT) AS n_cells,
       CAST(e.w AS BIGINT) AS w_pairs,
       CAST(gsum.n * gsum.n * e.p - gsum.n * gsum.s * e.q
            + gsum.s * gsum.s * e.w AS DOUBLE)
       / CAST(e.w * (gsum.n * gsum.sx2 - gsum.s * gsum.s) AS DOUBLE)
       AS morans_i
FROM gsum, e
"""

def gearys_c_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`gearys_c` — HUGEINT-exact sums, one final
    CAST-to-DOUBLE division."""
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {ix} AS ix, {iy} AS iy, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1, 2),
gsum AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(x) AS HUGEINT) AS s,
                CAST(SUM(x * x) AS HUGEINT) AS sx2 FROM c),
e AS (SELECT CAST(COUNT(*) AS HUGEINT) AS w,
             CAST(COALESCE(SUM((a.x - b.x) * (a.x - b.x)), 0) AS HUGEINT)
             AS c2
      FROM c a JOIN c b
      ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1
         AND NOT (a.ix = b.ix AND a.iy = b.iy))
SELECT CAST(gsum.n AS BIGINT) AS n_cells,
       CAST(e.w AS BIGINT) AS w_pairs,
       CAST((gsum.n - 1) * gsum.n * e.c2 AS DOUBLE)
       / CAST(2 * e.w * (gsum.n * gsum.sx2 - gsum.s * gsum.s) AS DOUBLE)
       AS gearys_c
FROM gsum, e
"""

def ripley_k(
    points: Dataset,
    radius: float,
    res: int | None = None,
    n_buckets: int = 256,
) -> Dataset:
    """Ripley's K point-pattern statistic at one radius (naive
    estimator, unit-square window, no edge correction — the variant
    whose SQL twin is a plain self-join count):
    ``K̂(r) = A·Σ_{i≠j} 1(d_ij ≤ r) / N²`` with A = 1. K̂ > πr² means
    clustering at scale r, < πr² dispersion. ONE row:
    ``(n_points, n_pairs, k_r)``.

    Exactness: the pair count is an exact integer (the comparison
    ``dx²+dy² ≤ r²`` uses the identical subtraction/product/sum shapes
    and the identical ``r*r`` double both sides), and K̂ is ONE float
    division of exact ints — bitwise-equal to DuckDB.

    Scale shape: the all-pairs-within-r problem cell-bucketed — grid
    resolution is chosen (or given) so the cell width ≥ r, each point
    lands in its own cell as OWNER plus its ≤8 in-grid neighbor cells
    as GHOST, so every qualifying pair is owner-local to exactly one
    cell. ONE cell-bucket shuffle of (cell, id, px, py); per-bucket
    counting is vectorized owner×candidate chunks (64-row owner chunks
    bound the band matrix); the driver folds one 2-int partial per
    bucket. Hot cells pay quadratic candidate work — inherent to the
    statistic (the SQL is the same self-join); production corpora
    should pick r (and thus res) so cells stay batch-sized.
    """
    import math

    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells

    if res is None:
        # the widest grid whose cell width still covers the radius
        res = max(int(math.floor(math.log2(1.0 / radius))), 0)
    if (1.0 / (1 << res)) < radius:
        raise ValueError(
            f"ripley_k: cell width {1.0 / (1 << res)} at res {res} is "
            f"smaller than radius {radius}; pairs would be missed"
        )
    r2 = float(radius) * float(radius)

    def assign(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        qid = st.col_np(tbl, "query_id")
        own = cell_of_points(px, py, res)
        row, nb = neighbor_cells(own, res, ring=1)  # includes self cell
        ghost = nb != own[row]
        grow = row[ghost]
        cells = np.concatenate([own, nb[ghost]])
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "qid": np.concatenate([qid, qid[grow]]),
                "px": np.concatenate([px, px[grow]]),
                "py": np.concatenate([py, py[grow]]),
                "own": np.concatenate(
                    [np.ones(own.size, np.int8), np.zeros(grow.size, np.int8)]
                ),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        px = group.column("px").to_numpy(zero_copy_only=False)
        py = group.column("py").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]][: cell_s.size])
        ends = np.r_[starts[1:], cell_s.size]
        pairs = 0
        n_own = int(own.sum())
        for a, b in zip(starts, ends):
            sl = order[a:b]
            o = sl[own[sl]]
            if o.size == 0:
                continue
            cx, cy = px[sl], py[sl]
            for c0 in range(0, o.size, 64):
                osl = o[c0 : c0 + 64]
                dx = px[osl][:, None] - cx[None, :]
                dy = py[osl][:, None] - cy[None, :]
                pairs += int((dx * dx + dy * dy <= r2).sum())
        # every owner also appears once as its own candidate (d = 0):
        # subtract exactly that self-pair; coincident DISTINCT points
        # keep counting, as the SQL a.id <> b.id join does
        pairs -= n_own
        return pa.table(
            {
                "pairs": pa.array([pairs], pa.int64()),
                "n_own": pa.array([n_own], pa.int64()),
            }
        )

    parts = (
        points.map_batches(
            assign,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )

    import pyarrow.compute as pc
    import ray

    P = N = 0
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        P += int(pc.sum(t.column("pairs")).as_py() or 0)
        N += int(pc.sum(t.column("n_own")).as_py() or 0)
    k = float(P) / float(N * N) if N else None
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "n_points": pa.array([N], pa.int64()),
                "n_pairs": pa.array([P], pa.int64()),
                "k_r": pa.array([k], pa.float64()),
            }
        )
    )


def ripley_k_sql(points_cte: str, radius: float) -> str:
    """DuckDB twin of :func:`ripley_k` — exact self-join pair count,
    one CAST-to-DOUBLE division."""
    r2 = float(radius) * float(radius)
    return f"""
WITH p AS ({points_cte}),
e AS (SELECT CAST(COUNT(*) AS HUGEINT) AS pairs
      FROM p a JOIN p b
      ON a.query_id <> b.query_id
         AND (a.px - b.px) * (a.px - b.px)
             + (a.py - b.py) * (a.py - b.py) <= {r2!r}),
g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM p)
SELECT CAST(g.n AS BIGINT) AS n_points,
       CAST(e.pairs AS BIGINT) AS n_pairs,
       CAST(e.pairs AS DOUBLE) / CAST(g.n * g.n AS DOUBLE) AS k_r
FROM g, e
"""

def local_morans(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """Local Moran's I (LISA) per occupied tile — the per-cell
    hot-spot / cold-spot / outlier decomposition of :func:`morans_i`:
    ``(cell, n_points, n_neighbors, local_i)`` where positive local_i
    marks a cell whose density agrees with its neighborhood (hot-hot /
    cold-cold) and negative marks spatial outliers. Queen contiguity,
    binary weights, occupied cells only (same weight semantics as
    :func:`_autocorr_stats`).

    Exactness: with global N, S = Σx, SX2 = Σx² and per-cell neighbor
    aggregates TJ_i = Σ_{j∈nb(i)} x_j, k_i = |nb(i)|, the N factors
    clear to

        I_i = (N·x_i − S)·(N·TJ_i − k_i·S) / (N·SX2 − S²)

    — exact-integer numerator (arbitrary-precision per cell) and
    denominator, ONE double division per row, so the DuckDB twin
    (HUGEINT arithmetic + CAST) matches bitwise.

    Scale shape: the exact cell-count table is built once and pinned
    (``materialize`` — tile-sized, the broadcast-small-side pattern,
    never points); one metadata fold computes the three global scalars;
    ONE cell-bucket shuffle of occupancy rows + ≤8 count-carrying
    neighbor offers computes (TJ_i, k_i) per cell via sorted reduceat;
    a stateless final map emits the per-cell statistic. Output is
    tile-sized.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells
    from .merge import bucketed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    ).materialize()  # tile-sized; consumed twice (scalars + offers)

    import pyarrow.compute as pc
    import ray

    N = S = SX2 = 0
    for ref in counts.to_arrow_refs():
        t = ray.get(ref)
        x = t.column("x")
        N += t.num_rows
        S += int(pc.sum(x).as_py() or 0)
        SX2 += int(pc.sum(pc.multiply(x, x)).as_py() or 0)
    den = N * SX2 - S * S

    def offers(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        row, nb = neighbor_cells(c, res, ring=1)  # includes self
        off = nb != c[row]
        cells = np.concatenate([c, nb[off]])
        xv = np.concatenate([x, x[row][off]])
        is_occ = np.concatenate(
            [np.ones(c.size, np.int8), np.zeros(nb[off].size, np.int8)]
        )
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "xv": xv,
                "is_occ": is_occ,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        xv = group.column("xv").to_numpy(zero_copy_only=False)
        occ = group.column("is_occ").to_numpy(zero_copy_only=False) == 1
        order = np.lexsort((~occ, c))  # per cell: occupancy row first
        c_s, x_s, occ_s = c[order], xv[order], occ[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        sizes = np.diff(np.r_[starts, c_s.size])
        has_occ = occ_s[starts]  # offers to empty cells have no marker
        tj_all = np.add.reduceat(x_s, starts)
        cell_o = c_s[starts][has_occ]
        x_o = x_s[starts][has_occ]
        tj = (tj_all[has_occ] - x_o).astype(np.int64)  # minus own row
        k = (sizes[has_occ] - 1).astype(np.int64)
        return pa.table({"cell": cell_o, "x": x_o, "tj": tj, "k": k})

    percell = (
        counts.map_batches(
            offers,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        tj = tbl.column("tj").to_numpy(zero_copy_only=False)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        # exact big-int numerator per row (object dtype: the two factors
        # fit int64 but their PRODUCT may not), then one rounding each
        # to double — identical to DuckDB's HUGEINT CASTs
        f1 = N * x.astype(object) - S
        f2 = N * tj.astype(object) - k.astype(object) * S
        num = (f1 * f2).astype(np.float64)
        li = num / float(den) if den else np.full(x.size, np.nan)
        return pa.table(
            {
                "cell": tbl.column("cell"),
                "n_points": tbl.column("x"),
                "n_neighbors": tbl.column("k"),
                "local_i": pa.array(li, pa.float64()),
            }
        )

    return percell.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def local_morans_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`local_morans` — HUGEINT-exact per-cell
    numerator, one CAST-to-DOUBLE division per row."""
    g = 1 << res
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {ix} AS ix, {iy} AS iy, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1, 2),
gsum AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(x) AS HUGEINT) AS s,
                CAST(SUM(x * x) AS HUGEINT) AS sx2 FROM c),
nb AS (SELECT a.ix AS ix, a.iy AS iy, ANY_VALUE(a.x) AS x,
              CAST(COUNT(b.x) AS HUGEINT) AS k,
              CAST(COALESCE(SUM(b.x), 0) AS HUGEINT) AS tj
       FROM c a LEFT JOIN c b
       ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1
          AND NOT (a.ix = b.ix AND a.iy = b.iy)
       GROUP BY a.ix, a.iy)
SELECT nb.ix * {g} + nb.iy AS cell,
       CAST(nb.x AS BIGINT) AS n_points,
       CAST(nb.k AS BIGINT) AS n_neighbors,
       CAST((gsum.n * nb.x - gsum.s) * (gsum.n * nb.tj - nb.k * gsum.s)
            AS DOUBLE)
       / CAST(gsum.n * gsum.sx2 - gsum.s * gsum.s AS DOUBLE) AS local_i
FROM nb, gsum
"""

def getis_ord(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """Getis–Ord Gi* hot-spot z-score per occupied tile — the
    significance-scored member of the hotspot family
    (:func:`hotspot_cells` gives raw focal sums; this standardizes
    them): ``(cell, n_points, focal_sum, gi_star)``. Star variant (the
    cell's own count is in its neighborhood); queen contiguity over
    OCCUPIED cells, consistent with :func:`morans_i` /
    :func:`local_morans` (an empty neighbor has x = 0 AND is excluded
    from the weight count — the sparse-grid convention, which the SQL
    twin shares).

    Float parity: the inputs (focal sum G_i, weight count k_i+1, global
    N, S, SX2) are exact integers; Gi* is then a FIXED expression tree
    of correctly-rounded IEEE ops (two divisions, one sqrt each side of
    the quotient) evaluated with identical association in NumPy and
    DuckDB, so the doubles match bitwise:

        x̄ = S/N;  s = sqrt(SX2/N − x̄·x̄);  m = k_i + 1
        Gi* = (G_i − x̄·m) / (s · sqrt((N·m − m·m) / (N − 1.0)))

    Scale shape: identical to :func:`local_morans` — pinned tile-sized
    count table, metadata scalar fold, ONE cell-bucket offer shuffle,
    stateless per-cell finish. Output is tile-sized. Degenerate N ≤ 1
    or zero variance yields NULL scores, never inf/NaN.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells
    from .merge import bucketed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    ).materialize()  # tile-sized; consumed twice (scalars + offers)

    import pyarrow.compute as pc
    import ray

    N = S = SX2 = 0
    for ref in counts.to_arrow_refs():
        t = ray.get(ref)
        x = t.column("x")
        N += t.num_rows
        S += int(pc.sum(x).as_py() or 0)
        SX2 += int(pc.sum(pc.multiply(x, x)).as_py() or 0)

    def offers(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        row, nb = neighbor_cells(c, res, ring=1)  # includes self
        off = nb != c[row]
        cells = np.concatenate([c, nb[off]])
        xv = np.concatenate([x, x[row][off]])
        is_occ = np.concatenate(
            [np.ones(c.size, np.int8), np.zeros(nb[off].size, np.int8)]
        )
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "xv": xv,
                "is_occ": is_occ,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        xv = group.column("xv").to_numpy(zero_copy_only=False)
        occ = group.column("is_occ").to_numpy(zero_copy_only=False) == 1
        order = np.lexsort((~occ, c))
        c_s, x_s, occ_s = c[order], xv[order], occ[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        sizes = np.diff(np.r_[starts, c_s.size])
        has_occ = occ_s[starts]
        g_all = np.add.reduceat(x_s, starts)
        return pa.table(
            {
                "cell": c_s[starts][has_occ],
                "x": x_s[starts][has_occ],
                "g": g_all[has_occ].astype(np.int64),  # focal incl self
                "m": sizes[has_occ].astype(np.int64),  # weights incl self
            }
        )

    percell = (
        counts.map_batches(
            offers,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        g = tbl.column("g").to_numpy(zero_copy_only=False).astype(np.float64)
        m = tbl.column("m").to_numpy(zero_copy_only=False).astype(np.float64)
        if N > 1:
            nf, sf, sx2f = float(N), float(S), float(SX2)
            xbar = sf / nf
            sdev = np.sqrt(sx2f / nf - xbar * xbar)
            denom = sdev * np.sqrt((nf * m - m * m) / (nf - 1.0))
            with np.errstate(divide="ignore", invalid="ignore"):
                gi = (g - xbar * m) / denom
            gi = np.where(denom > 0.0, gi, np.nan)
            arr = pa.array(gi, pa.float64())
            arr = pc.if_else(pc.is_nan(arr), pa.nulls(len(arr), pa.float64()), arr)
        else:
            arr = pa.nulls(tbl.num_rows, pa.float64())
        return pa.table(
            {
                "cell": tbl.column("cell"),
                "n_points": tbl.column("x"),
                "focal_sum": tbl.column("g"),
                "gi_star": arr,
            }
        )

    return percell.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def getis_ord_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`getis_ord` — identical expression tree of
    correctly-rounded IEEE ops over exact-integer inputs."""
    g = 1 << res
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {ix} AS ix, {iy} AS iy, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1, 2),
gsum AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nf,
                CAST(SUM(x) AS DOUBLE) AS sf,
                CAST(SUM(x * x) AS DOUBLE) AS sx2f FROM c),
nb AS (SELECT a.ix AS ix, a.iy AS iy, ANY_VALUE(a.x) AS x,
              ANY_VALUE(a.x) + CAST(COALESCE(SUM(b.x), 0) AS BIGINT) AS gfoc,
              1 + CAST(COUNT(b.x) AS BIGINT) AS m
       FROM c a LEFT JOIN c b
       ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1
          AND NOT (a.ix = b.ix AND a.iy = b.iy)
       GROUP BY a.ix, a.iy)
SELECT nb.ix * {g} + nb.iy AS cell,
       CAST(nb.x AS BIGINT) AS n_points,
       CAST(nb.gfoc AS BIGINT) AS focal_sum,
       CASE WHEN gsum.nf > 1
                 AND SQRT(gsum.sx2f / gsum.nf
                          - (gsum.sf / gsum.nf) * (gsum.sf / gsum.nf))
                     * SQRT((gsum.nf * CAST(nb.m AS DOUBLE)
                             - CAST(nb.m AS DOUBLE) * CAST(nb.m AS DOUBLE))
                            / (gsum.nf - 1.0)) > 0.0
       THEN (CAST(nb.gfoc AS DOUBLE)
             - (gsum.sf / gsum.nf) * CAST(nb.m AS DOUBLE))
            / (SQRT(gsum.sx2f / gsum.nf
                    - (gsum.sf / gsum.nf) * (gsum.sf / gsum.nf))
               * SQRT((gsum.nf * CAST(nb.m AS DOUBLE)
                       - CAST(nb.m AS DOUBLE) * CAST(nb.m AS DOUBLE))
                      / (gsum.nf - 1.0)))
       ELSE NULL END AS gi_star
FROM nb, gsum
"""


def hilbert_d(ix: "np.ndarray", iy: "np.ndarray", res: int) -> "np.ndarray":
    """Vectorized Hilbert-curve index (xy2d) of grid cells at
    resolution ``res`` (grid edge 2**res). Pure int64 bit arithmetic —
    ``res`` iterations of whole-array ops, no Python row loop. The
    classic top-down formulation: at each level read one x-bit and one
    y-bit, accumulate the quadrant's rank on the curve, then rotate /
    reflect the frame for the next level. Matches
    :func:`tile_hilbert_sql`'s unrolled CTE chain exactly (both sides
    are pure integer ops, so parity is trivially bitwise)."""
    import numpy as np

    if not 1 <= res <= 31:
        raise ValueError(f"hilbert res must be in [1, 31], got {res}")
    x = ix.astype(np.int64).copy()
    y = iy.astype(np.int64).copy()
    d = np.zeros(x.shape, np.int64)
    s = np.int64(1) << (res - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # drop the consumed bit so coords stay in [0, s) — keeps the
        # reflection below nonnegative (and therefore expressible with
        # SQL floor-div/mod, which has no two's-complement semantics)
        x &= s - 1
        y &= s - 1
        # rotate/reflect the lower quadrant frame (only when ry == 0)
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def tile_hilbert(points: Dataset, res: int) -> Dataset:
    """(query_id, cell, hilbert): the Hilbert space-filling-curve index
    of each point's tile — the engine's LOCALITY-PRESERVING partition
    key. Unlike the quadkey/Z-order cell id (``ix * g + iy``), sorting
    or range-partitioning by the Hilbert index keeps every partition
    spatially contiguous with NO long jumps (consecutive indices are
    always 4-neighbor cells), which is what bounds the ghost-cell /
    neighbor-exchange fan-out when a 100-TB corpus is range-sharded by
    this key. Stateless map, zero shuffle.
    """

    def assign(tbl: pa.Table) -> pa.Table:
        import numpy as np

        qid = st.col_np(tbl, "query_id")
        px, py = st.col_np(tbl, "px"), st.col_np(tbl, "py")
        ix = derive.tile_index(px, res)
        iy = derive.tile_index(py, res)
        g = np.int64(1) << res
        return pa.table(
            {
                "query_id": pa.array(qid),
                "cell": pa.array(ix * g + iy),
                "hilbert": pa.array(hilbert_d(ix, iy, res)),
            }
        )

    return points.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def tile_hilbert_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_hilbert`: the xy2d level loop unrolled
    into one generated CTE per level, each carrying (x, y, d) — pure
    integer CASE arithmetic, bitwise-equal to the NumPy side."""
    g = 1 << res
    ctes = [
        f"""lvl0 AS (SELECT query_id,
       {derive.tile_index_sql('px', res)} * {g}
       + {derive.tile_index_sql('py', res)} AS cell,
       {derive.tile_index_sql('px', res)} AS x,
       {derive.tile_index_sql('py', res)} AS y,
       CAST(0 AS BIGINT) AS d
FROM p0)"""
    ]
    for i in range(res):
        s = 1 << (res - 1 - i)
        prev = f"lvl{i}"
        # rx/ry: bit `s` of x/y; quadrant rank (3*rx) XOR ry expanded.
        # (x % s) masks off the consumed bit — mirrors `x &= s - 1` on
        # the NumPy side, keeping every value in [0, s) and nonnegative.
        rx = f"((x // {s}) % 2)"
        ry = f"((y // {s}) % 2)"
        ctes.append(
            f"""lvl{i + 1} AS (SELECT query_id, cell,
       CASE WHEN {ry} = 1 THEN x % {s}
            WHEN {rx} = 1 THEN {s - 1} - (y % {s}) ELSE y % {s} END AS x,
       CASE WHEN {ry} = 1 THEN y % {s}
            WHEN {rx} = 1 THEN {s - 1} - (x % {s}) ELSE x % {s} END AS y,
       d + {s * s} * (CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0
                           WHEN {rx} = 0 THEN 1
                           WHEN {ry} = 0 THEN 3 ELSE 2 END) AS d
FROM {prev})"""
        )
    chain = ",\n".join(ctes)
    return f"""
WITH p0 AS ({points_cte}),
{chain}
SELECT query_id, cell, d AS hilbert FROM lvl{res}
"""


def hilbert_ranges(points: Dataset, res: int, n_parts: int) -> Dataset:
    """The range-partition PLANNER over :func:`tile_hilbert` keys:
    ``(part, lo, hi, n_points)`` — ``n_parts`` contiguous Hilbert-index
    ranges with near-equal point counts. A tile (one Hilbert key) is
    atomic and lands in part ``(n_parts * count_before_key) // N`` —
    exact integer arithmetic, deterministic at any parallelism, and
    identical to the SQL twin's window-cumsum formulation. Because the
    Hilbert curve is a Hamiltonian 4-neighbor path, every planned part
    is a spatially CONTIGUOUS region — the shard map a 100-TB corpus
    would be re-sharded by (ghost/neighbor exchange stays intra-part
    except at ``n_parts − 1`` curve cuts). Empty parts (possible when a
    single hot tile spans several quantiles) are absent.

    Scale shape: per-batch (hilbert, count) partials → ONE coarse-bucket
    sum → the OCCUPIED-tile count table (≤ 4^res rows, metadata-sized by
    the repo's tile-table convention) folds on the driver with one
    cumsum. Points never shuffle.
    """
    import numpy as np
    import ray

    from .merge import bucketed_sum

    if n_parts < 1:
        raise ValueError(f"hilbert_ranges: n_parts must be >= 1, got {n_parts}")

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        h = hilbert_d(
            derive.tile_index(px, res), derive.tile_index(py, res), res
        )
        key, n = np.unique(h, return_counts=True)
        return pa.table({"hilbert": key, "c": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="hilbert",
        value_cols=("c",),
    )
    parts = [
        t
        for t in ray.get(counts.to_arrow_refs())
        if t.num_rows
    ]
    empty = pa.table(
        {
            "part": pa.array([], pa.int64()),
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return ray.data.from_arrow(empty)
    tbl = pa.concat_tables(parts)
    h = tbl.column("hilbert").to_numpy(zero_copy_only=False)
    c = tbl.column("c").to_numpy(zero_copy_only=False)
    order = np.argsort(h)
    h, c = h[order], c[order]
    n_total = int(c.sum())
    before = np.cumsum(c) - c  # count strictly before each key
    part = (np.int64(n_parts) * before) // np.int64(n_total)
    starts = np.flatnonzero(np.r_[True, part[1:] != part[:-1]][: part.size])
    ends = np.r_[starts[1:], h.size]
    return ray.data.from_arrow(
        pa.table(
            {
                "part": part[starts],
                "lo": h[starts],
                "hi": h[ends - 1],
                "n_points": np.add.reduceat(c, starts).astype(np.int64),
            }
        )
    )


def hilbert_ranges_sql(points_cte: str, res: int, n_parts: int) -> str:
    """DuckDB twin of :func:`hilbert_ranges` — the same unrolled-CTE
    Hilbert encode (:func:`tile_hilbert_sql`) + window cumsum + integer
    part assignment."""
    hil = tile_hilbert_sql(points_cte, res)
    return f"""
WITH hsrc AS ({hil}),
k AS (SELECT hilbert, CAST(COUNT(*) AS BIGINT) AS c
      FROM hsrc GROUP BY hilbert),
cum AS (SELECT hilbert, c,
               COALESCE(SUM(c) OVER (ORDER BY hilbert
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cb,
               (SELECT SUM(c) FROM k) AS n
        FROM k)
SELECT CAST(({n_parts} * cb) // n AS BIGINT) AS part,
       MIN(hilbert) AS lo, MAX(hilbert) AS hi,
       CAST(SUM(c) AS BIGINT) AS n_points
FROM cum GROUP BY ({n_parts} * cb) // n
"""


def knox_stat(
    points: Dataset,
    radius: float,
    tau_us: int,
    res: int | None = None,
    n_buckets: int = 256,
    ts_col: str = "ts",
) -> Dataset:
    """Knox space-time interaction test (epidemiology / crime-series
    detection): over ordered pairs i≠j, count pairs close in SPACE
    (d ≤ radius), close in TIME (|Δt| ≤ tau_us), and close in BOTH —
    ONE row ``(n_points, n_space, n_time, n_spacetime, knox_ratio)``
    with ``knox_ratio = (X·P) / (S·T)`` (P = N(N−1) ordered pairs;
    ratio > 1 ⇒ space-time clustering beyond what the marginals
    explain). All four counts are exact integers; the ratio is a fixed
    expression of four exact-int→double casts (each < 2⁵³), so the SQL
    twin matches bitwise with no overflow at any N.

    Scale shape: the space and space-time counts ride
    :func:`ripley_k`'s owner/ghost cell-bucket fold (cell width ≥
    radius ⇒ every qualifying pair owner-local to one cell) with the
    timestamp carried alongside; the time marginal uses the SAME
    owner/ghost trick in 1D (τ-width time cells, ±1 ghosts) — no
    global sort, no all-pairs. Three bucket shuffles of fixed-width
    columns; the driver folds ≤ 2·n_buckets 2-int partials.
    """
    import math

    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells

    if res is None:
        res = max(int(math.floor(math.log2(1.0 / radius))), 0)
    if (1.0 / (1 << res)) < radius:
        raise ValueError(
            f"knox_stat: cell width {1.0 / (1 << res)} at res {res} is "
            f"smaller than radius {radius}; pairs would be missed"
        )
    r2 = float(radius) * float(radius)
    tau = np.int64(tau_us)
    if tau <= 0:
        raise ValueError(f"knox_stat: tau_us must be > 0, got {tau_us}")

    def ts_us(tbl: pa.Table) -> "np.ndarray":
        return (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )

    # ---- space + space-time: owner/ghost 2D cells carrying t ----
    def assign_sp(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        t = ts_us(tbl)
        own = cell_of_points(px, py, res)
        row, nb = neighbor_cells(own, res, ring=1)
        ghost = nb != own[row]
        grow = row[ghost]
        cells = np.concatenate([own, nb[ghost]])
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "px": np.concatenate([px, px[grow]]),
                "py": np.concatenate([py, py[grow]]),
                "t": np.concatenate([t, t[grow]]),
                "own": np.concatenate(
                    [np.ones(own.size, np.int8), np.zeros(grow.size, np.int8)]
                ),
            }
        )

    def fold_sp(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        px = group.column("px").to_numpy(zero_copy_only=False)
        py = group.column("py").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]][: cell_s.size])
        ends = np.r_[starts[1:], cell_s.size]
        n_s = n_st = 0
        n_own = int(own.sum())
        for a, b in zip(starts, ends):
            sl = order[a:b]
            o = sl[own[sl]]
            if o.size == 0:
                continue
            cx, cy, ct = px[sl], py[sl], t[sl]
            for c0 in range(0, o.size, 64):
                osl = o[c0 : c0 + 64]
                dx = px[osl][:, None] - cx[None, :]
                dy = py[osl][:, None] - cy[None, :]
                close = dx * dx + dy * dy <= r2
                n_s += int(close.sum())
                dt = np.abs(t[osl][:, None] - ct[None, :])
                n_st += int((close & (dt <= tau)).sum())
        # each owner meets itself once (d=0, dt=0): subtract the self-pair
        return pa.table(
            {
                "n_s": pa.array([n_s - n_own], pa.int64()),
                "n_st": pa.array([n_st - n_own], pa.int64()),
                "n_own": pa.array([n_own], pa.int64()),
            }
        )

    # ---- time marginal: owner/ghost 1D τ-cells ----
    def assign_t(tbl: pa.Table) -> pa.Table:
        t = ts_us(tbl)
        own = t // tau
        cells = np.concatenate([own, own - 1, own + 1])
        t3 = np.concatenate([t, t, t])
        is_own = np.concatenate(
            [
                np.ones(t.size, np.int8),
                np.zeros(2 * t.size, np.int8),
            ]
        )
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "t": t3,
                "own": is_own,
            }
        )

    def fold_t(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]][: cell_s.size])
        ends = np.r_[starts[1:], cell_s.size]
        n_t = 0
        n_own = int(own.sum())
        for a, b in zip(starts, ends):
            sl = order[a:b]
            o = sl[own[sl]]
            if o.size == 0:
                continue
            ct = np.sort(t[sl])
            to = t[o]
            # vectorized |Δt| <= tau count via two searchsorted calls
            n_t += int(
                (
                    np.searchsorted(ct, to + tau, side="right")
                    - np.searchsorted(ct, to - tau, side="left")
                ).sum()
            )
        return pa.table(
            {"n_t": pa.array([n_t - n_own], pa.int64())}
        )

    import ray

    sp = (
        points.map_batches(
            assign_sp,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold_sp, batch_format="pyarrow")
    )
    tm = (
        points.map_batches(
            assign_t,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold_t, batch_format="pyarrow")
    )
    N = S = X = 0
    for tb in ray.get(sp.to_arrow_refs()):
        if tb.num_rows == 0:
            continue
        import pyarrow.compute as pc

        S += int(pc.sum(tb.column("n_s")).as_py() or 0)
        X += int(pc.sum(tb.column("n_st")).as_py() or 0)
        N += int(pc.sum(tb.column("n_own")).as_py() or 0)
    T = 0
    for tb in ray.get(tm.to_arrow_refs()):
        if tb.num_rows == 0:
            continue
        import pyarrow.compute as pc

        T += int(pc.sum(tb.column("n_t")).as_py() or 0)
    P = N * (N - 1)
    if S > 0 and T > 0:
        ratio = (float(X) * float(P)) / (float(S) * float(T))
        ratio_arr = pa.array([ratio], pa.float64())
    else:
        ratio_arr = pa.nulls(1, pa.float64())
    return ray.data.from_arrow(
        pa.table(
            {
                "n_points": pa.array([N], pa.int64()),
                "n_space": pa.array([S], pa.int64()),
                "n_time": pa.array([T], pa.int64()),
                "n_spacetime": pa.array([X], pa.int64()),
                "knox_ratio": ratio_arr,
            }
        )
    )


def knox_stat_sql(points_cte: str, radius: float, tau_us: int) -> str:
    """DuckDB twin of :func:`knox_stat`: three exact self-join counts
    over the SAME derived points (which must carry event ts via the
    events join), identical double expression for the ratio."""
    r2 = float(radius) * float(radius)
    return f"""
WITH p0 AS ({points_cte}),
p AS (SELECT p0.query_id AS id, p0.px AS px, p0.py AS py,
             epoch_us(e.ts) AS t
      FROM p0 JOIN events e ON e.event_id = p0.query_id),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS c FROM p a JOIN p b
      ON a.id <> b.id
         AND (a.px - b.px) * (a.px - b.px)
             + (a.py - b.py) * (a.py - b.py) <= {r2!r}),
x AS (SELECT CAST(COUNT(*) AS HUGEINT) AS c FROM p a JOIN p b
      ON a.id <> b.id
         AND (a.px - b.px) * (a.px - b.px)
             + (a.py - b.py) * (a.py - b.py) <= {r2!r}
         AND ABS(a.t - b.t) <= {int(tau_us)}),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS c FROM p a JOIN p b
      ON a.id <> b.id AND ABS(a.t - b.t) <= {int(tau_us)}),
g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM p)
SELECT CAST(g.n AS BIGINT) AS n_points,
       CAST(s.c AS BIGINT) AS n_space,
       CAST(t.c AS BIGINT) AS n_time,
       CAST(x.c AS BIGINT) AS n_spacetime,
       CASE WHEN s.c > 0 AND t.c > 0
            THEN (CAST(x.c AS DOUBLE) * CAST(g.n * (g.n - 1) AS DOUBLE))
                 / (CAST(s.c AS DOUBLE) * CAST(t.c AS DOUBLE))
       ELSE NULL END AS knox_ratio
FROM g, s, x, t
"""


def quadrat_test(points: Dataset, res: int, n_buckets: int = 512) -> Dataset:
    """Quadrat-count chi-square test of complete spatial randomness
    (CSR) over the FULL ``4^res``-quadrat lattice — the classic "are
    these points uniform?" screen run before the heavier
    autocorrelation statistics. ONE row ``(n_points, n_quadrats,
    n_occupied, chi2)``.

    Exactness: with quadrat counts c_i (empty quadrats included) and
    m = N / n_q, the statistic Σ (c_i − m)² / m collapses to

        chi2 = (n_q · Σc² − N²) / N

    — empty quadrats enter only through n_q, so only OCCUPIED-cell
    counts are ever computed, and numerator/denominator are exact
    integers (arbitrary-precision at the fold) with ONE final double
    division, so the DuckDB twin (HUGEINT sums, one CAST-to-DOUBLE
    division) matches bitwise.

    Scale shape: each point batch collapses to distinct-cell partial
    counts, :func:`~.merge.bucketed_sum` folds them exactly in ONE
    coarse-bucket shuffle, and each cell-table block reduces to a
    3-int partial row — the driver folds block counts, never cells,
    never points.
    """
    import numpy as np

    from .merge import bucketed_sum

    if not 0 <= res <= 15:
        raise ValueError(f"quadrat_test: res must be in [0, 15], got {res}")
    n_q = 1 << (2 * res)

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    INT64_MAX = (1 << 63) - 1

    def fold(tbl: pa.Table) -> pa.Table:
        x = tbl.column("x").to_numpy(zero_copy_only=False).astype(object)
        vals = {
            "nocc": int(x.size),
            "s": int(x.sum()) if x.size else 0,
            "sx2": int((x * x).sum()) if x.size else 0,
        }
        for k, v in vals.items():
            if v > INT64_MAX:
                raise ValueError(
                    f"quadrat_test: per-block partial {k} overflows int64; "
                    f"raise res so per-cell counts spread thinner"
                )
        return pa.table({k: pa.array([v], pa.int64()) for k, v in vals.items()})

    parts = counts.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)

    import ray
    import pyarrow.compute as pc

    nocc = s = sx2 = 0
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        nocc += int(pc.sum(t.column("nocc")).as_py() or 0)
        s += int(pc.sum(t.column("s")).as_py() or 0)
        sx2 += int(pc.sum(t.column("sx2")).as_py() or 0)
    chi2 = float(n_q * sx2 - s * s) / float(s) if s else None
    return ray.data.from_arrow(
        pa.table(
            {
                "n_points": pa.array([s], pa.int64()),
                "n_quadrats": pa.array([n_q], pa.int64()),
                "n_occupied": pa.array([nocc], pa.int64()),
                "chi2": pa.array([chi2], pa.float64()),
            }
        )
    )


def quadrat_test_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`quadrat_test` — HUGEINT-exact sums, one
    final CAST-to-DOUBLE division."""
    n_q = 1 << (2 * res)
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nocc,
             CAST(COALESCE(SUM(x), 0) AS HUGEINT) AS s,
             CAST(COALESCE(SUM(x * x), 0) AS HUGEINT) AS sx2 FROM c)
SELECT CAST(s AS BIGINT) AS n_points,
       CAST({n_q} AS BIGINT) AS n_quadrats,
       CAST(nocc AS BIGINT) AS n_occupied,
       CASE WHEN s > 0
            THEN CAST({n_q} * sx2 - s * s AS DOUBLE) / CAST(s AS DOUBLE)
       ELSE NULL END AS chi2
FROM g
"""


def join_counts(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """Join-count statistics of the OCCUPIED/EMPTY binary marking of
    the ``res``-grid under queen contiguity — the binary-mark
    companion of :func:`morans_i` (epidemiology / land-cover
    adjacency analysis). ONE row ``(n_occupied, n_quadrats,
    total_pairs, bb, bw, ww)`` — every value an EXACT integer (no
    float anywhere), so the DuckDB twin matches trivially.

    With B = occupied ("black") and W = empty ("white") cells on the
    full g×g lattice: ``bb`` = unordered adjacent B–B pairs, ``bw`` =
    adjacent B–W pairs, ``ww`` = the remainder of the
    ``total_pairs = 2(g−1)(2g−1)`` lattice adjacencies. Only occupied
    cells are ever enumerated: bb comes from the ordered occupied
    neighbor-pair count W₀ (= 2·bb), bw from Σ degree(occupied) − W₀
    (each B–W pair has exactly one occupied endpoint), and ww by
    subtraction — the empty side never materializes.

    Scale shape: identical to :func:`_autocorr_stats` — per-batch
    distinct-cell counts, one exact bucketed fold to the cell table,
    one owner/ghost cell-bucket groupby for the neighbor matching,
    driver folds ≤``n_buckets`` 3-int partial rows.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from .merge import bucketed_sum

    if not 1 <= res <= 15:
        raise ValueError(f"join_counts: res must be in [1, 15], got {res}")
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c = np.unique(cellmod.cell_of_points(px, py, res))
        return pa.table({"cell": c, "x": np.ones(c.size, np.int64)})

    # occupancy only: min-fold keeps one row per occupied cell
    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
        reduce="min",
    )

    def offers(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cell").to_numpy(zero_copy_only=False)
        row, nb = cellmod.neighbor_cells(c, res, ring=1)  # includes self
        off = nb != c[row]
        cells = np.concatenate([c, nb[off]])
        is_occ = np.concatenate(
            [np.ones(c.size, np.int8), np.zeros(nb[off].size, np.int8)]
        )
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "is_occ": is_occ,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        occ = group.column("is_occ").to_numpy(zero_copy_only=False) == 1
        oc = np.sort(c[occ])
        fc = c[~occ]
        pos = np.searchsorted(oc, fc)
        pos_c = np.minimum(pos, max(oc.size - 1, 0))
        hit = (
            (pos < oc.size) & (oc[pos_c] == fc)
            if oc.size
            else np.zeros(fc.size, bool)
        )
        # queen degree of each occupied cell (in-grid neighbor count)
        ix, iy = oc // g, oc % g
        spanx = 3 - (ix == 0).astype(np.int64) - (ix == g - 1).astype(np.int64)
        spany = 3 - (iy == 0).astype(np.int64) - (iy == g - 1).astype(np.int64)
        deg = spanx * spany - 1
        return pa.table(
            {
                "n": pa.array([int(oc.size)], pa.int64()),
                "w": pa.array([int(hit.sum())], pa.int64()),
                "d": pa.array([int(deg.sum())], pa.int64()),
            }
        )

    parts = (
        counts.map_batches(
            offers,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )

    import ray
    import pyarrow.compute as pc

    n = w = d = 0
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        n += int(pc.sum(t.column("n")).as_py() or 0)
        w += int(pc.sum(t.column("w")).as_py() or 0)
        d += int(pc.sum(t.column("d")).as_py() or 0)
    total = 2 * (g - 1) * (2 * g - 1)
    bb = w // 2
    bw = d - w
    ww = total - bb - bw
    return ray.data.from_arrow(
        pa.table(
            {
                "n_occupied": pa.array([n], pa.int64()),
                "n_quadrats": pa.array([g * g], pa.int64()),
                "total_pairs": pa.array([total], pa.int64()),
                "bb": pa.array([bb], pa.int64()),
                "bw": pa.array([bw], pa.int64()),
                "ww": pa.array([ww], pa.int64()),
            }
        )
    )


def join_counts_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`join_counts` — pure integer arithmetic
    end to end (COUNT/SUM over occupied cells + fixed lattice totals)."""
    g = 1 << res
    total = 2 * (g - 1) * (2 * g - 1)
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT DISTINCT {ix} AS ix, {iy} AS iy FROM p0),
n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nocc FROM c),
w AS (SELECT CAST(COUNT(*) AS HUGEINT) AS w0 FROM c a JOIN c b
      ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1
         AND NOT (a.ix = b.ix AND a.iy = b.iy)),
d AS (SELECT CAST(COALESCE(SUM(
        (3 - CASE WHEN ix = 0 THEN 1 ELSE 0 END
           - CASE WHEN ix = {g - 1} THEN 1 ELSE 0 END)
      * (3 - CASE WHEN iy = 0 THEN 1 ELSE 0 END
           - CASE WHEN iy = {g - 1} THEN 1 ELSE 0 END) - 1), 0) AS HUGEINT)
      AS dsum FROM c)
SELECT CAST(n.nocc AS BIGINT) AS n_occupied,
       CAST({g * g} AS BIGINT) AS n_quadrats,
       CAST({total} AS BIGINT) AS total_pairs,
       CAST(w.w0 // 2 AS BIGINT) AS bb,
       CAST(d.dsum - w.w0 AS BIGINT) AS bw,
       CAST({total} - w.w0 // 2 - (d.dsum - w.w0) AS BIGINT) AS ww
FROM n, w, d
"""


def raster_regions(
    points: Dataset,
    res: int,
    min_count: int,
    n_buckets: int = 256,
) -> Dataset:
    """Raster→VECTOR segmentation — the inverse of
    :func:`raster_tile_join`: threshold the per-tile density raster at
    ``min_count`` points, label queen-connected components of the
    active tiles, and emit one vector summary row per region:
    ``(region_id, n_cells, n_points, ix_min, iy_min, ix_max, iy_max)``
    with ``region_id`` = the smallest member cell id. Every output is
    an exact integer, so the DuckDB twin (recursive-CTE label closure)
    matches trivially.

    Scale shape: points collapse to distinct-cell counts
    (:func:`~.merge.bucketed_sum`, ONE coarse shuffle); active-cell
    EDGES come from one owner/ghost cell-bucket matching (the
    join_counts pattern, emitting pairs instead of counts); labels run
    through the shared :func:`~.graph.connected_components`
    (2 shuffles/round over cell-sized rows, O(log diameter) rounds);
    isolated actives keep their own id via a LEFT hash join. Points
    never shuffle; everything after pass 1 is tile-sized.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from .graph import connected_components
    from .join import hash_equi_join
    from .merge import bucketed_sum

    if not 1 <= res <= 15:
        raise ValueError(f"raster_regions: res must be in [1, 15], got {res}")
    if min_count < 1:
        raise ValueError(f"raster_regions: min_count must be >= 1, got {min_count}")
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    import pyarrow.compute as pc

    def threshold(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.greater_equal(tbl.column("x"), min_count))

    active = counts.map_batches(
        threshold, batch_format="pyarrow", zero_copy_batch=True
    )

    # ---- edges between active cells: owner/ghost neighbor matching ----
    def offers(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cell").to_numpy(zero_copy_only=False)
        row, nb = cellmod.neighbor_cells(c, res, ring=1)  # includes self
        off = nb != c[row]
        cells = np.concatenate([c, nb[off]])
        src = np.concatenate([np.full(c.size, -1, np.int64), c[row][off]])
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "src": src,  # -1 marks the occupancy row
            }
        )

    def match(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        src = group.column("src").to_numpy(zero_copy_only=False)
        occ = src == -1
        oc = np.sort(c[occ])
        fc, fs = c[~occ], src[~occ]
        pos = np.searchsorted(oc, fc)
        pos_c = np.minimum(pos, max(oc.size - 1, 0))
        hit = (
            (pos < oc.size) & (oc[pos_c] == fc)
            if oc.size
            else np.zeros(fc.size, bool)
        )
        a, b = fs[hit], fc[hit]
        keep = a < b  # one direction; CC symmetrizes internally
        return pa.table({"id_a": a[keep], "id_b": b[keep]})

    edges = (
        active.map_batches(
            offers,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(match, batch_format="pyarrow")
    )

    labels = connected_components(edges)

    def rename(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"cell": tbl.column("doc_id"), "region": tbl.column("cluster_id")}
        )

    lab = labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    # an edgeless raster (all regions singleton) yields a block-less label
    # dataset with no schema — seed it with an empty typed table so the
    # LEFT join below can resolve its right-side column types
    import ray

    lab = ray.data.from_arrow(
        pa.table(
            {"cell": pa.array([], pa.int64()), "region": pa.array([], pa.int64())}
        )
    ).union(lab)
    joined = hash_equi_join(
        active, lab, on="cell", left_cols=("x",), right_cols=("region",),
        how="left",
    )

    def region_partial(tbl: pa.Table) -> pa.Table:
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        # isolated active cells never entered the pair graph: own label
        reg = (
            pc.coalesce(tbl.column("region"), tbl.column("cell"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ix, iy = cell // g, cell % g
        order = np.argsort(reg, kind="stable")
        r_s = reg[order]
        starts = np.flatnonzero(np.r_[True, r_s[1:] != r_s[:-1]][: r_s.size])
        red = np.minimum.reduceat
        redmax = np.maximum.reduceat
        addred = np.add.reduceat
        return pa.table(
            {
                "region_id": r_s[starts],
                "n_cells": addred(np.ones(reg.size, np.int64)[order], starts),
                "n_points": addred(x[order], starts),
                "ix_min": red(ix[order], starts),
                "iy_min": red(iy[order], starts),
                "ix_max": redmax(ix[order], starts),
                "iy_max": redmax(iy[order], starts),
            }
        )

    parts = joined.map_batches(
        region_partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    def fold(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return pa.table(
            {
                "region_id": pa.array(
                    [group.column("region_id")[0].as_py()], pa.int64()
                ),
                "n_cells": pa.array(
                    [pc2.sum(group.column("n_cells")).as_py()], pa.int64()
                ),
                "n_points": pa.array(
                    [pc2.sum(group.column("n_points")).as_py()], pa.int64()
                ),
                "ix_min": pa.array(
                    [pc2.min(group.column("ix_min")).as_py()], pa.int64()
                ),
                "iy_min": pa.array(
                    [pc2.min(group.column("iy_min")).as_py()], pa.int64()
                ),
                "ix_max": pa.array(
                    [pc2.max(group.column("ix_max")).as_py()], pa.int64()
                ),
                "iy_max": pa.array(
                    [pc2.max(group.column("iy_max")).as_py()], pa.int64()
                ),
            }
        )

    return parts.groupby("region_id").map_groups(fold, batch_format="pyarrow")


def raster_regions_sql(points_cte: str, res: int, min_count: int) -> str:
    """DuckDB twin of :func:`raster_regions` — recursive-CTE label
    closure (min reachable cell id per component), pure integers."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH RECURSIVE
p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
a AS (SELECT cell, x FROM c WHERE x >= {min_count}),
e AS (SELECT a1.cell AS src, a2.cell AS dst FROM a a1 JOIN a a2
      ON ABS(a1.cell // {g} - a2.cell // {g}) <= 1
         AND ABS(a1.cell % {g} - a2.cell % {g}) <= 1
         AND a1.cell <> a2.cell),
lab AS (
  SELECT cell, cell AS lbl FROM a
  UNION
  SELECT e.dst AS cell, lab.lbl FROM lab JOIN e ON e.src = lab.cell
),
m AS (SELECT cell, MIN(lbl) AS region FROM lab GROUP BY cell)
SELECT CAST(m.region AS BIGINT) AS region_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(a.x) AS BIGINT) AS n_points,
       CAST(MIN(a.cell // {g}) AS BIGINT) AS ix_min,
       CAST(MIN(a.cell % {g}) AS BIGINT) AS iy_min,
       CAST(MAX(a.cell // {g}) AS BIGINT) AS ix_max,
       CAST(MAX(a.cell % {g}) AS BIGINT) AS iy_max
FROM m JOIN a ON a.cell = m.cell
GROUP BY m.region
"""


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def tile_geohash(points: Dataset, nchars: int = 6) -> Dataset:
    """(query_id, geohash): the standard base32 geohash token of each
    point over the unit square — the third interop token format next
    to :func:`tile_quadkey` (Bing) and :func:`tile_hilbert` (range
    keys). Geohash semantics: bits interleave x-first MSB-first, 5
    bits per character, classic ``0-9 b-z`` (no a/i/l/o) alphabet;
    with ``nchars`` characters x gets ⌈5n/2⌉ bits and y ⌊5n/2⌋.
    (Standard lon/lat geohash is this exact token after the affine map
    lon = 360·px − 180, lat = 180·py − 90.)

    Stateless map, zero shuffle, pure int64 bit math; the string build
    is one fixed-width uint8 gather (no per-row Python). The SQL twin
    unrolls the per-character bit arithmetic into generated
    expressions over the same clamped floor grid indices, so tokens
    match exactly."""
    import numpy as np

    if not 1 <= nchars <= 12:
        raise ValueError(f"tile_geohash: nchars must be in [1, 12], got {nchars}")
    total = 5 * nchars
    bx = (total + 1) // 2
    by = total // 2
    alpha = np.frombuffer(_GEOHASH32.encode(), dtype=np.uint8)

    # per character, the (source, bit) list: source 0 = x, 1 = y
    char_bits: list[list[tuple[int, int]]] = []
    xi = yi = 0
    for c in range(nchars):
        bits = []
        for j in range(5):
            k = 5 * c + j
            if k % 2 == 0:
                bits.append((0, bx - 1 - xi))
                xi += 1
            else:
                bits.append((1, by - 1 - yi))
                yi += 1
        char_bits.append(bits)

    def assign(tbl: pa.Table) -> pa.Table:
        qid = st.col_np(tbl, "query_id")
        px, py = st.col_np(tbl, "px"), st.col_np(tbl, "py")
        ix = derive.tile_index(px, bx)
        iy = derive.tile_index(py, by)
        n = qid.shape[0]
        buf = np.empty((n, nchars), dtype=np.uint8)
        for c, bits in enumerate(char_bits):
            val = np.zeros(n, np.int64)
            for j, (src, b) in enumerate(bits):
                src_arr = ix if src == 0 else iy
                val = val + (((src_arr >> b) & 1) << (4 - j))
            buf[:, c] = alpha[val]
        offsets = np.arange(0, (n + 1) * nchars, nchars, dtype=np.int32)
        gh = pa.Array.from_buffers(
            pa.string(),
            n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
        )
        return pa.table({"query_id": pa.array(qid), "geohash": gh})

    return points.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def tile_geohash_sql(points_cte: str, nchars: int = 6) -> str:
    """DuckDB twin of :func:`tile_geohash` — the per-character bit
    arithmetic unrolled into generated expressions."""
    total = 5 * nchars
    bx = (total + 1) // 2
    by = total // 2
    ix = derive.tile_index_sql("px", bx)
    iy = derive.tile_index_sql("py", by)
    chars = []
    xi = yi = 0
    for c in range(nchars):
        terms = []
        for j in range(5):
            k = 5 * c + j
            if k % 2 == 0:
                terms.append(f"(((ix >> {bx - 1 - xi}) & 1) << {4 - j})")
                xi += 1
            else:
                terms.append(f"(((iy >> {by - 1 - yi}) & 1) << {4 - j})")
                yi += 1
        chars.append(
            "substr('" + _GEOHASH32 + "', CAST("
            + " + ".join(terms)
            + " AS INTEGER) + 1, 1)"
        )
    concat = " || ".join(chars)
    return f"""
WITH p0 AS ({points_cte}),
g AS (SELECT query_id, {ix} AS ix, {iy} AS iy FROM p0)
SELECT query_id, {concat} AS geohash FROM g
"""


def tile_distinct_users(
    points: Dataset,
    res: int,
    user_col: str = "user_id",
    n_buckets: int = 256,
) -> Dataset:
    """Exact distinct-visitor count per tile — ``(cell, n_users,
    n_points)`` — the spatial cardinality primitive (unique devices
    per cell, footfall dedup). Exact integers throughout.

    Scale shape: each batch collapses to DISTINCT (cell, user) pairs
    with a per-pair point count; ONE cell-bucket shuffle of those
    fixed-width pair partials (bounded by the distinct-pair count,
    never the event count — raw rows and user payloads never move);
    the fold re-dedups pairs per cell with one lexsort+reduceat pass.
    For cardinalities where even distinct pairs are too heavy, the
    HLL sketch path (`pipelines/sketch.py`) is the approximate
    fallback — this op is its exact twin.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    if not 0 <= res <= 15:
        raise ValueError(f"tile_distinct_users: res must be in [0, 15], got {res}")

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        u = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = cellmod.cell_of_points(px, py, res)
        order = np.lexsort((u, cell))
        c_s, u_s = cell[order], u[order]
        new = np.r_[True, (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])][: c_s.size]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, c_s.size])
        return pa.table(
            {
                "bucket": bucket_of(c_s[starts], n_buckets),
                "cell": c_s[starts],
                "user": u_s[starts],
                "n": n.astype(np.int64),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        user = group.column("user").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((user, cell))
        c_s, u_s, n_s = cell[order], user[order], n[order]
        new_pair = np.r_[True, (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])][: c_s.size]
        pair_starts = np.flatnonzero(new_pair)
        pc_ = c_s[pair_starts]
        new_cell = np.r_[True, pc_[1:] != pc_[:-1]][: pc_.size]
        cell_starts = np.flatnonzero(new_cell)
        n_users = np.diff(np.r_[cell_starts, pc_.size])
        # per-pair point sums, then regrouped to cells
        per_pair = np.add.reduceat(n_s, pair_starts)
        n_points_per_cell = np.add.reduceat(per_pair, cell_starts)
        return pa.table(
            {
                "cell": pa.array(pc_[cell_starts], pa.int64()),
                "n_users": pa.array(n_users.astype(np.int64), pa.int64()),
                "n_points": pa.array(n_points_per_cell, pa.int64()),
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def tile_distinct_users_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_distinct_users`."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte})
SELECT {cell} AS cell,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM p0 GROUP BY 1
"""


def tile_buffer(points: Dataset, res: int, max_d: int = 2) -> Dataset:
    """Buffer / proximity raster (GIS buffer zone as a distance
    transform, bounded): for every tile within Chebyshev distance
    ``max_d`` of an OCCUPIED tile, the distance to the nearest
    occupied tile — ``(cell, dist)`` with dist 0 = occupied, exact
    integers. The raster-morphology companion of
    :func:`raster_regions` (dilation by ``max_d`` with distance
    labels).

    Scale shape: ONE shuffle. Each batch collapses to its distinct
    occupied cells and immediately emits (neighbor, distance) offers
    for the (2·max_d+1)² Chebyshev disc; a single
    :func:`~.merge.bucketed_sum` min-fold keeps the nearest-occupied
    distance per cell (duplicate offers across batches collapse in
    the fold — no occupancy pre-pass needed). Offer fan-out is
    (2·max_d+1)² per occupied cell; keep ``max_d`` small (bounded
    transforms are the streaming-friendly form — an unbounded
    transform needs iterative frontier rounds like
    connected_components).
    """
    import numpy as np

    from .merge import bucketed_sum

    if not 1 <= res <= 15:
        raise ValueError(f"tile_buffer: res must be in [1, 15], got {res}")
    if not 1 <= max_d <= 8:
        raise ValueError(f"tile_buffer: max_d must be in [1, 8], got {max_d}")
    g = 1 << res

    def offers(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c = np.unique(cellmod.cell_of_points(px, py, res))
        row, nb = cellmod.neighbor_cells(c, res, ring=max_d)  # incl. self
        six, siy = c[row] // g, c[row] % g
        nix, niy = nb // g, nb % g
        dist = np.maximum(np.abs(nix - six), np.abs(niy - siy))
        return pa.table({"cell": nb, "dist": dist.astype(np.int64)})

    return bucketed_sum(
        points.map_batches(
            offers,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("dist",),
        reduce="min",
    )


def tile_buffer_sql(points_cte: str, res: int, max_d: int = 2) -> str:
    """DuckDB twin of :func:`tile_buffer` — Chebyshev disc cross join
    over distinct occupied tiles, MIN per cell, pure integers."""
    g = 1 << res
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT DISTINCT {ix} AS ix, {iy} AS iy FROM p0),
offs AS (
  SELECT c.ix + dx.range AS nix, c.iy + dy.range AS niy,
         GREATEST(ABS(dx.range), ABS(dy.range)) AS dist
  FROM c, range(-{max_d}, {max_d + 1}) dx, range(-{max_d}, {max_d + 1}) dy
  WHERE c.ix + dx.range BETWEEN 0 AND {g - 1}
    AND c.iy + dy.range BETWEEN 0 AND {g - 1}
)
SELECT CAST(nix * {g} + niy AS BIGINT) AS cell,
       CAST(MIN(dist) AS BIGINT) AS dist
FROM offs GROUP BY 1
"""


def tile_gini(points: Dataset, res: int) -> Dataset:
    """Spatial-concentration Gini coefficient of the OCCUPIED-tile
    density distribution — the standard "how unevenly is activity
    spread over space?" inequality measure (0 = uniform across
    occupied tiles, →1 = concentrated in few). ONE row
    ``(n_cells, n_points, gini)``.

    Exactness: with the occupied-cell counts x sorted ascending,

        gini = Σᵢ (2i − n + 1)·xᵢ / (n · Σx)        (i zero-based)

    — numerator and denominator exact integers (the coefficient form
    is invariant to tie order, so the SQL twin's ROW_NUMBER tie
    arbitrariness cannot change the value), ONE double division.

    Scale shape: points collapse to per-batch distinct-cell counts,
    ONE exact bucketed fold to the occupied-tile table, and the
    driver sorts that OCCUPIED-TILE-SIZED multiset (the same driver
    bound as :func:`hilbert_ranges` — tiles, never points; a global
    sort is inherent to rank statistics).
    """
    import numpy as np

    from .merge import bucketed_sum

    if not 0 <= res <= 15:
        raise ValueError(f"tile_gini: res must be in [0, 15], got {res}")

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    import ray

    xs = []
    for ref in counts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            xs.append(t.column("x").to_numpy(zero_copy_only=False))
    if not xs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_cells": pa.array([0], pa.int64()),
                    "n_points": pa.array([0], pa.int64()),
                    "gini": pa.nulls(1, pa.float64()),
                }
            )
        )
    x = np.sort(np.concatenate(xs)).astype(object)
    n = x.size
    s = int(x.sum())
    coef = 2 * np.arange(n, dtype=object) - n + 1
    num = int((coef * x).sum())
    den = n * s
    return ray.data.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([n], pa.int64()),
                "n_points": pa.array([s], pa.int64()),
                "gini": pa.array(
                    [float(num) / float(den) if den else None], pa.float64()
                ),
            }
        )
    )


def tile_gini_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_gini` — HUGEINT-exact rank-weighted
    sum, one CAST-to-DOUBLE division."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(COALESCE(SUM(x), 0) AS HUGEINT) AS s FROM c),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM c),
g AS (SELECT CAST(COALESCE(SUM(
        (2 * CAST(rn - 1 AS HUGEINT) - (SELECT n FROM m) + 1) * x), 0)
        AS HUGEINT) AS num
      FROM r)
SELECT CAST(m.n AS BIGINT) AS n_cells,
       CAST(m.s AS BIGINT) AS n_points,
       CASE WHEN m.n * m.s > 0
            THEN CAST(g.num AS DOUBLE) / CAST(m.n * m.s AS DOUBLE)
       ELSE NULL END AS gini
FROM m, g
"""


def std_ellipse(points: Dataset, grid_res: int = 12) -> Dataset:
    """Standard deviational ellipse of a point pattern — the classic
    directional-dispersion summary (mean center + variance/covariance
    + orientation of the 1-σ ellipse). ONE row ``(n_points, mean_x,
    mean_y, var_x, var_y, cov_xy, tan2theta)`` over the FLOOR grid at
    ``grid_res`` (same integer-coordinate contract as
    :func:`~python_prtree_ray.pipelines.movement.radius_of_gyration`).

    Exactness: with integer grid coords and exact sums
    (n, Σx, Σy, Σx², Σy², Σxy),

        mean_x  = Σx / n
        var_x   = (n·Σx² − (Σx)²) / n²          (population variance)
        cov_xy  = (n·Σxy − Σx·Σy) / n²
        tan2θ   = 2·(n·Σxy − Σx·Σy)
                  / ((n·Σx² − (Σx)²) − (n·Σy² − (Σy)²))

    — every numerator/denominator an exact (arbitrary-precision)
    integer, ONE double division per output value, so the HUGEINT SQL
    twin matches bitwise. The orientation is reported as ``tan2theta``
    (NULL when the variance difference is exactly 0) rather than θ
    itself — atan2 is not correctly rounded in libm, the ratio is.

    Scale shape: per-batch 6-int partials, driver folds ONE row per
    block. Raw rows never shuffle.
    """
    import numpy as np

    def partial(tbl: pa.Table) -> pa.Table:
        x = derive.tile_index(st.col_np(tbl, "px"), grid_res)
        y = derive.tile_index(st.col_np(tbl, "py"), grid_res)
        # x < 2^grid_res <= 2^15, so x² < 2^30 and per-batch int64 sums
        # stay far below overflow (COMBINE_BATCH·2^30 ≈ 2^46)
        return pa.table(
            {
                "n": pa.array([x.size], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    if not 0 <= grid_res <= 15:
        raise ValueError(f"std_ellipse: grid_res must be in [0, 15], got {grid_res}")

    parts = points.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    import pyarrow.compute as pc
    import ray

    n = sx = sy = sxx = syy = sxy = 0
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            n += int(pc.sum(t.column("n")).as_py() or 0)
            sx += int(pc.sum(t.column("sx")).as_py() or 0)
            sy += int(pc.sum(t.column("sy")).as_py() or 0)
            sxx += int(pc.sum(t.column("sxx")).as_py() or 0)
            syy += int(pc.sum(t.column("syy")).as_py() or 0)
            sxy += int(pc.sum(t.column("sxy")).as_py() or 0)

    if n == 0:
        mean_x = mean_y = var_x = var_y = cov = tan2 = None
    else:
        vx_num = n * sxx - sx * sx
        vy_num = n * syy - sy * sy
        cv_num = n * sxy - sx * sy
        den = n * n
        mean_x = float(sx) / float(n)
        mean_y = float(sy) / float(n)
        var_x = float(vx_num) / float(den)
        var_y = float(vy_num) / float(den)
        cov = float(cv_num) / float(den)
        t_den = vx_num - vy_num
        tan2 = float(2 * cv_num) / float(t_den) if t_den != 0 else None

    return ray.data.from_arrow(
        pa.table(
            {
                "n_points": pa.array([n], pa.int64()),
                "mean_x": pa.array([mean_x], pa.float64()),
                "mean_y": pa.array([mean_y], pa.float64()),
                "var_x": pa.array([var_x], pa.float64()),
                "var_y": pa.array([var_y], pa.float64()),
                "cov_xy": pa.array([cov], pa.float64()),
                "tan2theta": pa.array([tan2], pa.float64()),
            }
        )
    )


def std_ellipse_sql(points_cte: str, grid_res: int) -> str:
    """DuckDB twin of :func:`std_ellipse` — HUGEINT-exact moment sums,
    one CAST-to-DOUBLE division per output value."""
    gx = derive.tile_index_sql("px", grid_res)
    gy = derive.tile_index_sql("py", grid_res)
    return f"""
WITH p0 AS ({points_cte}),
g AS (SELECT {gx} AS x, {gy} AS y FROM p0),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(COALESCE(SUM(x), 0) AS HUGEINT) AS sx,
             CAST(COALESCE(SUM(y), 0) AS HUGEINT) AS sy,
             CAST(COALESCE(SUM(x * x), 0) AS HUGEINT) AS sxx,
             CAST(COALESCE(SUM(y * y), 0) AS HUGEINT) AS syy,
             CAST(COALESCE(SUM(x * y), 0) AS HUGEINT) AS sxy
      FROM g)
SELECT CAST(n AS BIGINT) AS n_points,
       CASE WHEN n > 0 THEN CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) END AS mean_x,
       CASE WHEN n > 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) END AS mean_y,
       CASE WHEN n > 0 THEN CAST(n * sxx - sx * sx AS DOUBLE)
                            / CAST(n * n AS DOUBLE) END AS var_x,
       CASE WHEN n > 0 THEN CAST(n * syy - sy * sy AS DOUBLE)
                            / CAST(n * n AS DOUBLE) END AS var_y,
       CASE WHEN n > 0 THEN CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * n AS DOUBLE) END AS cov_xy,
       CASE WHEN n > 0 AND (n * sxx - sx * sx) <> (n * syy - sy * sy)
            THEN CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
                 / CAST((n * sxx - sx * sx) - (n * syy - sy * sy) AS DOUBLE)
       END AS tan2theta
FROM s
"""


def flow_direction(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """D8 flow direction over the point-density raster — the classic
    raster flow-routing operator (steepest DESCENT variant, unit
    neighbor weights): for every occupied tile, the 8-neighborhood
    direction its density gradient drains toward. One row per occupied
    tile ``(cell, x, flow_dir, drop_n)`` where ``flow_dir`` is the
    direction code ``(dx+1)*3 + (dy+1)`` (dx, dy ∈ {-1,0,1}, so codes
    {0,1,2,3,5,6,7,8}) of the IN-GRID neighbor with the smallest
    density (unoccupied in-grid neighbors count 0; off-grid neighbors
    are not candidates — the grid-edge convention), tie-broken by the
    smallest code; ``flow_dir = -1`` (a sink) when no in-grid neighbor
    is strictly lower. ``drop_n = x − min_neighbor`` when flowing,
    else 0. All-integer → bitwise-trivially exact vs the SQL twin.

    Scale shape: points collapse to the exact occupied-tile count
    table (per-batch distinct-cell partials + ONE bucketed fold); each
    occupied tile then offers its count to its ≤8 in-grid neighbors —
    ONE cell-bucket shuffle of (cell, code, count) int rows, with the
    tile's own row riding the same shuffle — and a sorted
    lexsort/argmin fold per bucket emits the per-tile direction.
    Output is tile-sized; raw points never shuffle.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from .merge import bucketed_sum

    if not 0 <= res <= 15:
        raise ValueError(f"flow_direction: res must be in [0, 15], got {res}")
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    # offsets (dx, dy) and the code the RECEIVER sees for an offer
    # arriving from (dx, dy): the direction receiver→sender.
    d = np.array([-1, 0, 1], np.int64)
    ddx, ddy = np.meshgrid(d, d, indexing="ij")
    ddx, ddy = ddx.ravel(), ddy.ravel()
    keep = ~((ddx == 0) & (ddy == 0))
    ddx, ddy = ddx[keep], ddy[keep]
    recv_code = (ddx + 1) * 3 + (ddy + 1)  # code of sender as seen from receiver

    def offers(tbl: pa.Table) -> pa.Table:
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        ix, iy = cell // g, cell % g
        # offer rows: sender c at (ix,iy) → receiver r = c + (-dx,-dy)
        # so that from r's perspective the sender sits at (dx, dy)
        nx = ix[:, None] - ddx[None, :]
        ny = iy[:, None] - ddy[None, :]
        ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
        row = np.repeat(np.arange(cell.size, dtype=np.int64), ok.sum(axis=1))
        rcell = (nx * g + ny)[ok]
        code = np.broadcast_to(recv_code, ok.shape)[ok]
        out_cell = np.concatenate([cell, rcell])
        out_code = np.concatenate([np.full(cell.size, -1, np.int64), code])
        out_x = np.concatenate([x, x[row]])
        return pa.table(
            {
                "bucket": bucket_of(out_cell, n_buckets),
                "cell": out_cell,
                "code": out_code,
                "x": out_x,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        code = group.column("code").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        own = code == -1
        occ = cell[own]
        if occ.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "flow_dir": pa.array([], pa.int64()),
                    "drop_n": pa.array([], pa.int64()),
                }
            )
        occ_x = x[own]
        o = np.argsort(occ, kind="stable")
        occ, occ_x = occ[o], occ_x[o]
        # zero placeholders for every in-grid direction of each
        # occupied receiver; real offers override by summing (each
        # (cell, code) has at most one offer)
        ix, iy = occ // g, occ % g
        nx = ix[:, None] + ddx[None, :]
        ny = iy[:, None] + ddy[None, :]
        ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
        zrow = np.repeat(np.arange(occ.size, dtype=np.int64), ok.sum(axis=1))
        zcode = np.broadcast_to(recv_code, ok.shape)[ok]
        # offers addressed to occupied receivers in this bucket
        off = ~own
        if occ.size:
            pos = np.searchsorted(occ, cell[off])
            pos_ok = (pos < occ.size) & (
                occ[np.minimum(pos, occ.size - 1)] == cell[off]
            )
        else:  # offers into a bucket with no occupied receiver
            pos = np.zeros(int(off.sum()), np.int64)
            pos_ok = np.zeros(int(off.sum()), np.bool_)
        orow = pos[pos_ok]
        ocode = code[off][pos_ok]
        ox = x[off][pos_ok]
        arow = np.concatenate([zrow, orow])
        acode = np.concatenate([zcode, ocode])
        ax = np.concatenate([np.zeros(zrow.size, np.int64), ox])
        # per (receiver, code): value = sum (placeholder 0 + optional offer)
        order = np.lexsort((acode, arow))
        arow, acode, ax = arow[order], acode[order], ax[order]
        starts = np.flatnonzero(
            np.r_[True, (arow[1:] != arow[:-1]) | (acode[1:] != acode[:-1])][: arow.size]
        )
        rrow = arow[starts]
        rcode2 = acode[starts]
        rval = np.add.reduceat(ax, starts)
        # per receiver: argmin by (value, code) — lexsort then first
        order2 = np.lexsort((rcode2, rval, rrow))
        rrow, rcode2, rval = rrow[order2], rcode2[order2], rval[order2]
        first = np.flatnonzero(np.r_[True, rrow[1:] != rrow[:-1]][: rrow.size])
        win_row = rrow[first]
        win_code = rcode2[first]
        win_val = rval[first]
        self_x = occ_x[win_row]
        flows = win_val < self_x
        return pa.table(
            {
                "cell": occ[win_row],
                "x": self_x,
                "flow_dir": np.where(flows, win_code, np.int64(-1)),
                "drop_n": np.where(flows, self_x - win_val, np.int64(0)),
            }
        )

    return (
        counts.map_batches(offers, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def flow_direction_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`flow_direction` — occupied-cell counts,
    generated 8-offset neighbor join, ROW_NUMBER argmin."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    dirs = ", ".join(
        f"({(dx + 1) * 3 + (dy + 1)}, {dx}, {dy})"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
d(code, dx, dy) AS (VALUES {dirs}),
n AS (SELECT c.cell, d.code,
             (c.cell // {g}) + d.dx AS nx, (c.cell % {g}) + d.dy AS ny
      FROM c CROSS JOIN d),
f AS (SELECT n.cell, n.code, COALESCE(cn.x, 0) AS nbx
      FROM n LEFT JOIN c cn ON cn.cell = n.nx * {g} + n.ny
      WHERE n.nx BETWEEN 0 AND {g - 1} AND n.ny BETWEEN 0 AND {g - 1}),
r AS (SELECT cell, code, nbx,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY nbx, code) AS rn
      FROM f)
SELECT c.cell, c.x,
       CAST(CASE WHEN r.nbx < c.x THEN r.code ELSE -1 END AS BIGINT) AS flow_dir,
       CAST(CASE WHEN r.nbx < c.x THEN c.x - r.nbx ELSE 0 END AS BIGINT) AS drop_n
FROM c JOIN r ON r.cell = c.cell AND r.rn = 1
"""


def cross_k(
    points_a: Dataset,
    points_b: Dataset,
    radius: float,
    res: int | None = None,
    n_buckets: int = 256,
) -> Dataset:
    """Bivariate (cross-type) Ripley's K at one radius — the standard
    two-population interaction statistic (naive estimator, unit-square
    window, no edge correction, same conventions as :func:`ripley_k`):
    ``K̂_AB(r) = Σ_{i∈A, j∈B} 1(d_ij ≤ r) / (n_A · n_B)``. K̂ > πr²
    means attraction between the two types at scale r, < πr²
    repulsion. ONE row ``(n_a, n_b, n_pairs, k_ab)``.

    Exactness: the pair count is an exact integer (identical
    ``dx²+dy² ≤ r²`` double shapes both sides) and K̂ is ONE float
    division of exact ints — bitwise-equal to DuckDB. Coincident A/B
    points count (there is no self-pair to exclude across types).

    Scale shape: the A side lands once in its own cell as OWNER; the
    B side lands in its cell plus ≤8 ring-1 neighbors as CANDIDATE
    (cell width ≥ r, so every qualifying pair is owner-local to
    exactly one cell). ONE cell-bucket shuffle, vectorized owner×
    candidate chunks per bucket, one 3-int partial per bucket folded
    on the driver.
    """
    import math

    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells

    if res is None:
        res = max(int(math.floor(math.log2(1.0 / radius))), 0)
    if (1.0 / (1 << res)) < radius:
        raise ValueError(
            f"cross_k: cell width {1.0 / (1 << res)} at res {res} is "
            f"smaller than radius {radius}; pairs would be missed"
        )
    r2 = float(radius) * float(radius)

    def assign_a(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        cells = cell_of_points(px, py, res)
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "px": px,
                "py": py,
                # 0 = A owner; 1 = B ghost candidate; 2 = B own candidate
                "role": np.zeros(px.size, np.int8),
            }
        )

    def assign_b(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        own = cell_of_points(px, py, res)
        row, nb = neighbor_cells(own, res, ring=1)  # includes self cell
        role = np.where(nb == own[row], np.int8(2), np.int8(1))
        return pa.table(
            {
                "bucket": bucket_of(nb, n_buckets),
                "cell": nb,
                "px": px[row],
                "py": py[row],
                "role": role,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        px = group.column("px").to_numpy(zero_copy_only=False)
        py = group.column("py").to_numpy(zero_copy_only=False)
        role = group.column("role").to_numpy(zero_copy_only=False)
        owners = role == 0
        cands = role >= 1
        n_a = int(owners.sum())
        n_b = int((role == 2).sum())
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]][: cell_s.size])
        ends = np.r_[starts[1:], cell_s.size]
        pairs = 0
        for a, b in zip(starts, ends):
            sl = order[a:b]
            o = sl[owners[sl]]
            c = sl[cands[sl]]
            if o.size == 0 or c.size == 0:
                continue
            cx, cy = px[c], py[c]
            for c0 in range(0, o.size, 64):
                osl = o[c0 : c0 + 64]
                dx = px[osl][:, None] - cx[None, :]
                dy = py[osl][:, None] - cy[None, :]
                pairs += int((dx * dx + dy * dy <= r2).sum())
        return pa.table(
            {
                "pairs": pa.array([pairs], pa.int64()),
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
            }
        )

    a = points_a.map_batches(
        assign_a,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    b = points_b.map_batches(
        assign_b,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    parts = a.union(b).groupby("bucket").map_groups(fold, batch_format="pyarrow")

    import pyarrow.compute as pc
    import ray

    P = NA = NB = 0
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        P += int(pc.sum(t.column("pairs")).as_py() or 0)
        NA += int(pc.sum(t.column("n_a")).as_py() or 0)
        NB += int(pc.sum(t.column("n_b")).as_py() or 0)
    k = float(P) / float(NA * NB) if NA and NB else None
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([NA], pa.int64()),
                "n_b": pa.array([NB], pa.int64()),
                "n_pairs": pa.array([P], pa.int64()),
                "k_ab": pa.array([k], pa.float64()),
            }
        )
    )


def cross_k_sql(points_a_cte: str, points_b_cte: str, radius: float) -> str:
    """DuckDB twin of :func:`cross_k` — exact cross-join pair count,
    one CAST-to-DOUBLE division."""
    r2 = float(radius) * float(radius)
    return f"""
WITH pa AS ({points_a_cte}),
pb AS ({points_b_cte}),
e AS (SELECT CAST(COUNT(*) AS HUGEINT) AS pairs
      FROM pa a JOIN pb b
      ON (a.px - b.px) * (a.px - b.px)
         + (a.py - b.py) * (a.py - b.py) <= {r2!r}),
ga AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM pa),
gb AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM pb)
SELECT CAST(ga.n AS BIGINT) AS n_a,
       CAST(gb.n AS BIGINT) AS n_b,
       CAST(e.pairs AS BIGINT) AS n_pairs,
       CASE WHEN ga.n * gb.n > 0
            THEN CAST(e.pairs AS DOUBLE) / CAST(ga.n * gb.n AS DOUBLE)
       END AS k_ab
FROM ga, gb, e
"""


def semivariogram(
    points: Dataset,
    radius: float,
    n_bins: int = 8,
    res: int | None = None,
    n_buckets: int = 256,
) -> Dataset:
    """Experimental (empirical) semivariogram — the geostatistics
    spatial-continuity summary: for ordered point pairs (i ≠ j) within
    ``radius``, binned by distance into ``n_bins`` equal-width lags,
    ``γ(h) = Σ (z_i − z_j)² / (2·N(h))``. One row per occupied bin
    ``(bin, n_pairs, sum_dz2, gamma)``; small γ at short lags with
    growth toward a sill is the classic spatially-autocorrelated-field
    signature. ``z`` is the integer ``pz`` column.

    Exactness: the pair predicate and the bin index compare the ONE
    double expression ``dx²+dy²`` against Python-repr'd squared lag
    edges embedded verbatim in the SQL (``bin = Σ_k 1(d² > e_k)``), so
    binning is bitwise-identical; N(h) and Σdz² are exact ints and γ is
    ONE double division. Self-pairs (d²=0, dz²=0) are excluded exactly
    (the owner count is subtracted from bin 0, matching the SQL
    ``a.query_id <> b.query_id``); coincident DISTINCT points keep
    counting both sides.

    Scale shape: identical to :func:`ripley_k` — owner-in-own-cell +
    ring-1 ghost candidates (cell width ≥ radius), ONE cell-bucket
    shuffle, vectorized owner×candidate chunks, per-bucket
    ``(bin, n, Σdz²)`` partials folded by ONE tiny bucketed sum.
    """
    import math

    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells
    from .merge import bucketed_sum

    if res is None:
        res = max(int(math.floor(math.log2(1.0 / radius))), 0)
    if (1.0 / (1 << res)) < radius:
        raise ValueError(
            f"semivariogram: cell width {1.0 / (1 << res)} at res {res} is "
            f"smaller than radius {radius}; pairs would be missed"
        )
    if n_bins < 1:
        raise ValueError(f"semivariogram: n_bins must be >= 1, got {n_bins}")
    r2 = float(radius) * float(radius)
    # interior squared lag edges e_1..e_{n_bins-1}; bin = #edges below d²
    edges = np.array(
        [(radius * k / n_bins) ** 2 for k in range(1, n_bins)], np.float64
    )

    def assign(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        z = st.col_np(tbl, "pz").astype(np.int64)
        own = cell_of_points(px, py, res)
        row, nb = neighbor_cells(own, res, ring=1)
        ghost = nb != own[row]
        grow = row[ghost]
        cells = np.concatenate([own, nb[ghost]])
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "px": np.concatenate([px, px[grow]]),
                "py": np.concatenate([py, py[grow]]),
                "z": np.concatenate([z, z[grow]]),
                "own": np.concatenate(
                    [np.ones(own.size, np.int8), np.zeros(grow.size, np.int8)]
                ),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        px = group.column("px").to_numpy(zero_copy_only=False)
        py = group.column("py").to_numpy(zero_copy_only=False)
        z = group.column("z").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]][: cell_s.size])
        ends = np.r_[starts[1:], cell_s.size]
        n = np.zeros(n_bins, np.int64)
        s = np.zeros(n_bins, np.int64)
        n_own = int(own.sum())
        for a, b in zip(starts, ends):
            sl = order[a:b]
            o = sl[own[sl]]
            if o.size == 0:
                continue
            cx, cy, cz = px[sl], py[sl], z[sl]
            for c0 in range(0, o.size, 64):
                osl = o[c0 : c0 + 64]
                dx = px[osl][:, None] - cx[None, :]
                dy = py[osl][:, None] - cy[None, :]
                d2 = dx * dx + dy * dy
                hit = d2 <= r2
                d2h = d2[hit]
                if d2h.size == 0:
                    continue
                dz = z[osl][:, None] - cz[None, :]
                dz2 = (dz * dz)[hit]
                bins = (d2h[:, None] > edges[None, :]).sum(axis=1)
                n += np.bincount(bins, minlength=n_bins)
                s += np.bincount(bins, weights=dz2.astype(np.float64),
                                 minlength=n_bins).astype(np.int64)
        # each owner pairs with its own candidate copy once: d²=0,
        # dz²=0 → bin 0 count only (sum unaffected), exactly the SQL
        # a.query_id <> b.query_id exclusion
        n[0] -= n_own
        keep = n > 0
        return pa.table(
            {
                "bin": np.flatnonzero(keep).astype(np.int64),
                "n": n[keep],
                "s": s[keep],
            }
        )

    parts = (
        points.map_batches(
            assign,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    summed = bucketed_sum(parts, key_col="bin", value_cols=("n", "s"), n_buckets=16)

    def finish(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        s = tbl.column("s").to_numpy(zero_copy_only=False)
        keep = n > 0
        gamma = np.zeros(keep.sum(), np.float64)
        nk, sk = n[keep], s[keep]
        for i in range(nk.size):
            gamma[i] = float(int(sk[i])) / float(2 * int(nk[i]))
        return pa.table(
            {
                "bin": tbl.column("bin").filter(pa.array(keep)),
                "n_pairs": pa.array(nk, pa.int64()),
                "sum_dz2": pa.array(sk, pa.int64()),
                "gamma": pa.array(gamma, pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def semivariogram_sql(points_cte: str, radius: float, n_bins: int = 8) -> str:
    """DuckDB twin of :func:`semivariogram` — exact self-join with the
    same repr'd squared lag edges, HUGEINT sums, one division."""
    r2 = float(radius) * float(radius)
    edges = [(radius * k / n_bins) ** 2 for k in range(1, n_bins)]
    bin_expr = " + ".join(
        f"(CASE WHEN d2 > {e!r} THEN 1 ELSE 0 END)" for e in edges
    ) or "0"
    return f"""
WITH p AS ({points_cte}),
pr AS (SELECT (a.px - b.px) * (a.px - b.px)
              + (a.py - b.py) * (a.py - b.py) AS d2,
              (a.pz - b.pz) * (a.pz - b.pz) AS dz2
       FROM p a JOIN p b ON a.query_id <> b.query_id),
f AS (SELECT {bin_expr} AS bin, dz2 FROM pr WHERE d2 <= {r2!r})
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(dz2) AS BIGINT) AS sum_dz2,
       CAST(SUM(dz2) AS DOUBLE) / CAST(2 * COUNT(*) AS DOUBLE) AS gamma
FROM f GROUP BY bin
"""


def contour_cases(points: Dataset, res: int, threshold: int, n_buckets: int = 256) -> Dataset:
    """Marching-squares case classification of the point-density
    raster — the raster→vector contouring primitive: for every 2×2
    corner block of the grid, the 4-bit case code of "corner density
    ≥ threshold" (bit 8 = corner (0,0), 4 = (1,0), 2 = (1,1),
    1 = (0,1)), keeping the blocks the iso-line actually crosses
    (``0 < case < 15``). Output ``(block, case_code)`` with ``block``
    the anchor-corner cell id. All-integer → trivially exact vs SQL.

    Scale shape: points collapse to the exact occupied-tile counts
    (ONE bucketed fold); only ABOVE-threshold tiles then offer their
    corner bit-weight to their ≤4 containing blocks — ONE
    (block, weight) int shuffle summed by a second tiny fold, so
    all-below blocks never materialize and all-above blocks are
    filtered by the case range. Output is iso-line-sized.
    """
    import numpy as np

    from .merge import bucketed_sum

    if not 1 <= res <= 15:
        raise ValueError(f"contour_cases: res must be in [1, 15], got {res}")
    if threshold < 1:
        raise ValueError(
            f"contour_cases: threshold must be >= 1, got {threshold}"
        )
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    # corner (dx, dy) of a block → case bit weight
    ddx = np.array([0, 1, 1, 0], np.int64)
    ddy = np.array([0, 0, 1, 1], np.int64)
    wts = np.array([8, 4, 2, 1], np.int64)

    def offers(tbl: pa.Table) -> pa.Table:
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        hot = x >= threshold
        cell = cell[hot]
        ix, iy = cell // g, cell % g
        bx = ix[:, None] - ddx[None, :]
        by = iy[:, None] - ddy[None, :]
        ok = (bx >= 0) & (bx <= g - 2) & (by >= 0) & (by <= g - 2)
        block = (bx * g + by)[ok]
        w = np.broadcast_to(wts, ok.shape)[ok]
        return pa.table({"block": block, "w": w})

    summed = bucketed_sum(
        counts.map_batches(offers, batch_format="pyarrow", zero_copy_batch=True),
        key_col="block",
        value_cols=("w",),
        n_buckets=n_buckets,
    )

    def finish(tbl: pa.Table) -> pa.Table:
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        keep = pa.array((w > 0) & (w < 15))
        out = tbl.filter(keep)
        return pa.table(
            {
                "block": out.column("block"),
                "case_code": out.column("w"),
            }
        )

    out = summed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    # Schema anchor: when NO tile clears the threshold (tiny inputs) the
    # shuffle emits only schema-less empty blocks and the dataset would
    # surface with no schema at all; union one typed empty block FIRST so
    # downstream readers always see (block, case_code) even for a
    # zero-row iso-line.
    import ray

    anchor = ray.data.from_arrow(
        pa.table(
            {
                "block": pa.array([], pa.int64()),
                "case_code": pa.array([], pa.int64()),
            }
        )
    )
    return anchor.union(out)


def contour_cases_sql(points_cte: str, res: int, threshold: int) -> str:
    """DuckDB twin of :func:`contour_cases` — above-threshold cells,
    4-corner offset join, case-range filter."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    corners = ", ".join(
        f"({w}, {dx}, {dy})"
        for w, dx, dy in ((8, 0, 0), (4, 1, 0), (2, 1, 1), (1, 0, 1))
    )
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
hot AS (SELECT cell FROM c WHERE x >= {threshold}),
k(w, dx, dy) AS (VALUES {corners}),
o AS (SELECT ((hot.cell // {g}) - k.dx) * {g} + ((hot.cell % {g}) - k.dy) AS block,
             k.w AS w
      FROM hot CROSS JOIN k
      WHERE (hot.cell // {g}) - k.dx BETWEEN 0 AND {g - 2}
        AND (hot.cell % {g}) - k.dy BETWEEN 0 AND {g - 2})
SELECT block, CAST(SUM(w) AS BIGINT) AS case_code
FROM o GROUP BY block
HAVING SUM(w) > 0 AND SUM(w) < 15
"""


def tile_majority(
    points: Dataset, res: int, class_col: str = "cls", n_buckets: int = 256
) -> Dataset:
    """Majority class per occupied tile — the zonal-MODE raster
    aggregate (dominant land-use / dominant event type per cell):
    ``(cell, cls, n)`` with the winner's count, ties broken by the
    smallest class string. Exact integers + deterministic tie order →
    bitwise SQL twin.

    Scale shape: per-batch (cell, class) partial counts collapse
    inside the batch (lexsort + reduceat — one row per distinct pair
    per batch, never per point), ONE cell-bucket shuffle of those
    metadata-sized partials (class cardinality is small; the strings
    that ship are distinct values, not rows), per-bucket exact sum +
    per-cell argmax. Output is tile-sized.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.buckets import bucket_of

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        cell = cellmod.cell_of_points(px, py, res)
        enc = pc.dictionary_encode(tbl.column(class_col)).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((code, cell))
        c_s, k_s = cell[order], code[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])][: c_s.size]
        )
        n = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
        return pa.table(
            {
                "bucket": bucket_of(c_s[starts], n_buckets),
                "cell": c_s[starts],
                "cls": enc.dictionary.take(pa.array(k_s[starts])),
                "n": n,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "cls": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        cls = group.column("cls").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        # exact per-(cell, cls) totals
        order = np.lexsort((cls, cell))
        c_s, k_s, n_s = cell[order], cls[order], n[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])][: c_s.size]
        )
        tot = np.add.reduceat(n_s, starts)
        c_u, k_u = c_s[starts], k_s[starts]
        # per-cell argmax by (n DESC, cls ASC)
        order2 = np.lexsort((k_u, -tot, c_u))
        c_o, k_o, t_o = c_u[order2], k_u[order2], tot[order2]
        first = np.flatnonzero(np.r_[True, c_o[1:] != c_o[:-1]][: c_o.size])
        return pa.table(
            {
                "cell": c_o[first],
                "cls": pa.array(k_o[first], pa.string()),
                "n": t_o[first],
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def tile_majority_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_majority` — counts + ROW_NUMBER
    argmax with the identical (n DESC, cls ASC) tie order."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, cls, CAST(COUNT(*) AS BIGINT) AS n
      FROM p0 GROUP BY 1, 2),
r AS (SELECT cell, cls, n,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, cls) AS rn
      FROM c)
SELECT cell, cls, n FROM r WHERE rn = 1
"""


def ripley_curve(
    points: Dataset,
    radius: float,
    n_bins: int = 8,
    res: int | None = None,
    n_buckets: int = 256,
) -> Dataset:
    """Ripley's K as a CURVE — K̂(r) evaluated at ``n_bins`` nested
    radii up to ``radius`` (the multi-scale clustering profile the
    reference's published experiment curves correspond to; the
    single-radius scalar is :func:`ripley_k`). One row per occupied
    lag ``(bin, n_pairs, cum_pairs, k_r)`` with ``k_r =
    cum_pairs / N²`` at the bin's upper radius ``radius·(bin+1)/n_bins``.

    Exactness: identical to :func:`semivariogram` — the ONE shared
    double ``dx²+dy²`` binned against Python-repr'd squared edges, the
    self-pair subtracted exactly from bin 0, pair counts exact ints,
    and k_r ONE double division (cumulative sums of exact ints).

    Scale shape: owner/ghost cell bucketing (cell width ≥ radius),
    ONE cell-bucket shuffle, per-bucket (bin, n) partials (the owner
    count rides as a ``bin = -1`` row), ONE tiny fold, and an
    ≤ n_bins-row driver finish for the cumulative divide.
    """
    import math

    import numpy as np

    from ..functions.buckets import bucket_of
    from ..functions.cells import cell_of_points, neighbor_cells
    from .merge import bucketed_sum

    if res is None:
        res = max(int(math.floor(math.log2(1.0 / radius))), 0)
    if (1.0 / (1 << res)) < radius:
        raise ValueError(
            f"ripley_curve: cell width {1.0 / (1 << res)} at res {res} is "
            f"smaller than radius {radius}; pairs would be missed"
        )
    if n_bins < 1:
        raise ValueError(f"ripley_curve: n_bins must be >= 1, got {n_bins}")
    r2 = float(radius) * float(radius)
    edges = np.array(
        [(radius * k / n_bins) ** 2 for k in range(1, n_bins)], np.float64
    )

    def assign(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        own = cell_of_points(px, py, res)
        row, nb = neighbor_cells(own, res, ring=1)
        ghost = nb != own[row]
        grow = row[ghost]
        cells = np.concatenate([own, nb[ghost]])
        return pa.table(
            {
                "bucket": bucket_of(cells, n_buckets),
                "cell": cells,
                "px": np.concatenate([px, px[grow]]),
                "py": np.concatenate([py, py[grow]]),
                "own": np.concatenate(
                    [np.ones(own.size, np.int8), np.zeros(grow.size, np.int8)]
                ),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        px = group.column("px").to_numpy(zero_copy_only=False)
        py = group.column("py").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]][: cell_s.size])
        ends = np.r_[starts[1:], cell_s.size]
        n = np.zeros(n_bins, np.int64)
        n_own = int(own.sum())
        for a, b in zip(starts, ends):
            sl = order[a:b]
            o = sl[own[sl]]
            if o.size == 0:
                continue
            cx, cy = px[sl], py[sl]
            for c0 in range(0, o.size, 64):
                osl = o[c0 : c0 + 64]
                dx = px[osl][:, None] - cx[None, :]
                dy = py[osl][:, None] - cy[None, :]
                d2 = dx * dx + dy * dy
                d2h = d2[d2 <= r2]
                if d2h.size == 0:
                    continue
                bins = (d2h[:, None] > edges[None, :]).sum(axis=1)
                n += np.bincount(bins, minlength=n_bins)
        n[0] -= n_own  # exact self-pair exclusion (d² = 0 → bin 0)
        keep = np.flatnonzero(n)
        out_bin = np.r_[keep.astype(np.int64), [-1]]
        out_n = np.r_[n[keep], [n_own]]
        return pa.table({"bin": out_bin, "n": out_n})

    parts = (
        points.map_batches(
            assign,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    summed = bucketed_sum(parts, key_col="bin", value_cols=("n",), n_buckets=4)

    import ray

    rows = {}
    N = 0
    for ref in summed.to_arrow_refs():
        t = ray.get(ref)
        for b, v in zip(
            t.column("bin").to_numpy(zero_copy_only=False),
            t.column("n").to_numpy(zero_copy_only=False),
        ):
            if b == -1:
                N += int(v)
            else:
                rows[int(b)] = int(v)
    bins = sorted(rows)
    cum = 0
    out_b, out_n, out_c, out_k = [], [], [], []
    for b in bins:
        cum += rows[b]
        out_b.append(b)
        out_n.append(rows[b])
        out_c.append(cum)
        out_k.append(float(cum) / float(N * N) if N else None)
    return ray.data.from_arrow(
        pa.table(
            {
                "bin": pa.array(out_b, pa.int64()),
                "n_pairs": pa.array(out_n, pa.int64()),
                "cum_pairs": pa.array(out_c, pa.int64()),
                "k_r": pa.array(out_k, pa.float64()),
            }
        )
    )


def ripley_curve_sql(points_cte: str, radius: float, n_bins: int = 8) -> str:
    """DuckDB twin of :func:`ripley_curve` — same repr'd squared lag
    edges, window cumulative sum, one division per lag."""
    r2 = float(radius) * float(radius)
    edges = [(radius * k / n_bins) ** 2 for k in range(1, n_bins)]
    bin_expr = " + ".join(
        f"(CASE WHEN d2 > {e!r} THEN 1 ELSE 0 END)" for e in edges
    ) or "0"
    return f"""
WITH p AS ({points_cte}),
pr AS (SELECT (a.px - b.px) * (a.px - b.px)
              + (a.py - b.py) * (a.py - b.py) AS d2
       FROM p a JOIN p b ON a.query_id <> b.query_id),
f AS (SELECT {bin_expr} AS bin FROM pr WHERE d2 <= {r2!r}),
c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM f GROUP BY bin),
g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM p)
SELECT CAST(bin AS BIGINT) AS bin, n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY bin) AS BIGINT) AS cum_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY bin) AS DOUBLE)
       / CAST((SELECT n * n FROM g) AS DOUBLE) AS k_r
FROM c
"""


def type_colocation(
    points: Dataset, res: int, class_col: str = "cls", n_buckets: int = 256
) -> Dataset:
    """Cross-category co-location lift — the categorical association
    statistic of spatial pattern mining (do two event types occupy the
    SAME tiles more than chance?): for every unordered class pair
    (a < b) co-present in ≥1 tile, ``(type_a, type_b, n_a, n_b,
    n_both, lift)`` where n_a/n_b/n_both count occupied tiles and
    ``lift = n_both · T / (n_a · n_b)`` with T the total occupied-tile
    count. lift > 1 = attraction, < 1 = segregation.

    Exactness: all counts are exact distinct-tile integers and lift is
    ONE double division of exact products — bitwise vs the SQL twin.

    Scale shape: per-batch DISTINCT (cell, class) partials (one row
    per distinct pair per batch), ONE cell-bucket shuffle dedups
    across batches and collapses each tile to its ≤C-class set,
    emitting (class) / (class-pair) / (tile) counter partials — C²-
    bounded metadata — merged by one tiny final fold.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.buckets import bucket_of

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        cell = cellmod.cell_of_points(px, py, res)
        enc = pc.dictionary_encode(tbl.column(class_col)).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((code, cell))
        c_s, k_s = cell[order], code[order]
        keep = np.r_[True, (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])][: c_s.size]
        return pa.table(
            {
                "bucket": bucket_of(c_s[keep], n_buckets),
                "cell": c_s[keep],
                "cls": enc.dictionary.take(pa.array(k_s[keep])),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "g": pa.array([], pa.int8()),
                "kind": pa.array([], pa.int8()),
                "k1": pa.array([], pa.string()),
                "k2": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if cell.size == 0:
            return empty
        cls = group.column("cls").to_numpy(zero_copy_only=False)
        order = np.lexsort((cls, cell))
        c_s, k_s = cell[order], cls[order]
        keep = np.r_[True, (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])][: c_s.size]
        c_s, k_s = c_s[keep], k_s[keep]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        ends = np.r_[starts[1:], c_s.size]
        from collections import Counter

        singles: Counter = Counter()
        pairs: Counter = Counter()
        n_tiles = starts.size
        for a, b in zip(starts, ends):  # per tile; each tile has <= C classes
            ks = k_s[a:b]
            for i in range(ks.size):
                singles[ks[i]] += 1
                for j in range(i + 1, ks.size):
                    pairs[(ks[i], ks[j])] += 1
        k1 = [k for k in singles] + [p[0] for p in pairs] + [""]
        k2 = ["" for _ in singles] + [p[1] for p in pairs] + [""]
        kind = [0] * len(singles) + [1] * len(pairs) + [2]
        n = [singles[k] for k in singles] + [pairs[p] for p in pairs] + [n_tiles]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(n), np.int8)),
                "kind": pa.array(kind, pa.int8()),
                "k1": pa.array(k1, pa.string()),
                "k2": pa.array(k2, pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        k1 = group.column("k1").to_numpy(zero_copy_only=False)
        k2 = group.column("k2").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        singles: dict = {}
        pairs: dict = {}
        T = 0
        for i in range(kind.size):
            if kind[i] == 0:
                singles[k1[i]] = singles.get(k1[i], 0) + int(n[i])
            elif kind[i] == 1:
                key = (k1[i], k2[i])
                pairs[key] = pairs.get(key, 0) + int(n[i])
            else:
                T += int(n[i])
        out = sorted(pairs)
        return pa.table(
            {
                "type_a": pa.array([a for a, _ in out], pa.string()),
                "type_b": pa.array([b for _, b in out], pa.string()),
                "n_a": pa.array([singles[a] for a, _ in out], pa.int64()),
                "n_b": pa.array([singles[b] for _, b in out], pa.int64()),
                "n_both": pa.array([pairs[p] for p in out], pa.int64()),
                "lift": pa.array(
                    [
                        float(pairs[(a, b)] * T) / float(singles[a] * singles[b])
                        for a, b in out
                    ],
                    pa.float64(),
                ),
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def type_colocation_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`type_colocation` — DISTINCT tile sets,
    pair join on a < b, one division."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
ct AS (SELECT DISTINCT {cell} AS cell, cls FROM p0),
tot AS (SELECT CAST(COUNT(DISTINCT cell) AS HUGEINT) AS t FROM ct),
s AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS n FROM ct GROUP BY cls),
b AS (SELECT a.cls AS type_a, b.cls AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ct a JOIN ct b ON a.cell = b.cell AND a.cls < b.cls
      GROUP BY 1, 2)
SELECT b.type_a, b.type_b, sa.n AS n_a, sb.n AS n_b, b.n_both,
       CAST(CAST(b.n_both AS HUGEINT) * tot.t AS DOUBLE)
       / CAST(CAST(sa.n AS HUGEINT) * sb.n AS DOUBLE) AS lift
FROM b JOIN s sa ON sa.cls = b.type_a JOIN s sb ON sb.cls = b.type_b, tot
"""


def tile_focal_mean(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """3×3 focal (moving-window) mean of the point-density raster —
    the raster smoothing primitive: for every OCCUPIED tile,
    ``(cell, x, focal_sum, n_window, focal_mean)`` where focal_sum
    sums the counts of the in-grid 3×3 neighborhood (unoccupied
    neighbors contribute 0), n_window counts the in-grid positions
    (9 interior, fewer at edges), and ``focal_mean = focal_sum /
    n_window``. Exact ints + ONE division per tile → bitwise SQL twin.

    Scale shape: exact occupied-tile counts (ONE bucketed fold); each
    occupied tile offers its count to its ≤9-cell neighborhood
    (itself included) — ONE (cell, count, is_self) int shuffle; the
    per-bucket fold sums offers per receiver and keeps receivers that
    got a SELF offer (= occupied). Output is tile-sized.
    """
    import numpy as np

    from ..functions.buckets import bucket_of
    from .merge import bucketed_sum

    if not 0 <= res <= 15:
        raise ValueError(f"tile_focal_mean: res must be in [0, 15], got {res}")
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    d = np.arange(-1, 2, dtype=np.int64)
    ddx, ddy = np.meshgrid(d, d, indexing="ij")
    ddx, ddy = ddx.ravel(), ddy.ravel()

    def offers(tbl: pa.Table) -> pa.Table:
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        x = tbl.column("x").to_numpy(zero_copy_only=False)
        ix, iy = cell // g, cell % g
        nx = ix[:, None] + ddx[None, :]
        ny = iy[:, None] + ddy[None, :]
        ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
        row = np.repeat(np.arange(cell.size, dtype=np.int64), ok.sum(axis=1))
        rcell = (nx * g + ny)[ok]
        is_self = np.broadcast_to((ddx == 0) & (ddy == 0), ok.shape)[ok]
        return pa.table(
            {
                "bucket": bucket_of(rcell, n_buckets),
                "cell": rcell,
                "x": x[row],
                "own": is_self.astype(np.int8),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "focal_sum": pa.array([], pa.int64()),
                    "n_window": pa.array([], pa.int64()),
                    "focal_mean": pa.array([], pa.float64()),
                }
            )
        x = group.column("x").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        c_s, x_s, o_s = cell[order], x[order], own[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        fsum = np.add.reduceat(x_s, starts)
        has_self = np.add.reduceat(o_s.astype(np.int64), starts) > 0
        self_x = np.add.reduceat(x_s * o_s, starts)
        c_u = c_s[starts]
        keep = has_self
        c_u, fsum, self_x = c_u[keep], fsum[keep], self_x[keep]
        ix, iy = c_u // g, c_u % g
        nwin = (
            (np.minimum(ix + 1, g - 1) - np.maximum(ix - 1, 0) + 1)
            * (np.minimum(iy + 1, g - 1) - np.maximum(iy - 1, 0) + 1)
        ).astype(np.int64)
        return pa.table(
            {
                "cell": c_u,
                "x": self_x,
                "focal_sum": fsum,
                "n_window": nwin,
                "focal_mean": fsum.astype(np.float64) / nwin.astype(np.float64),
            }
        )

    return (
        counts.map_batches(offers, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def tile_focal_mean_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_focal_mean` — 9-offset LEFT JOIN,
    in-grid window size, one division."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    dirs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
d(dx, dy) AS (VALUES {dirs}),
n AS (SELECT c.cell, c.x AS x0,
             (c.cell // {g}) + d.dx AS nx, (c.cell % {g}) + d.dy AS ny
      FROM c CROSS JOIN d
      WHERE (c.cell // {g}) + d.dx BETWEEN 0 AND {g - 1}
        AND (c.cell % {g}) + d.dy BETWEEN 0 AND {g - 1}),
f AS (SELECT n.cell, ANY_VALUE(n.x0) AS x,
             CAST(SUM(COALESCE(cn.x, 0)) AS BIGINT) AS focal_sum,
             CAST(COUNT(*) AS BIGINT) AS n_window
      FROM n LEFT JOIN c cn ON cn.cell = n.nx * {g} + n.ny
      GROUP BY n.cell)
SELECT cell, x, focal_sum, n_window,
       CAST(focal_sum AS DOUBLE) / CAST(n_window AS DOUBLE) AS focal_mean
FROM f
"""


def lorenz_curve(points: Dataset, res: int, n_deciles: int = 10) -> Dataset:
    """Lorenz curve of spatial concentration — the curve behind
    :func:`tile_gini`: cumulative point share vs cumulative
    occupied-tile share at decile boundaries of the ascending tile-
    density order. One row per decile with a distinct rank boundary:
    ``(decile, n_tiles_cum, n_points_cum, tiles_share, points_share)``
    at rank ``⌊n·(d+1)/n_deciles⌋`` (deciles whose boundary rounds to
    0 are skipped, matching the INNER-JOIN SQL twin).

    Exactness: the prefix sum of the r smallest densities is a
    multiset quantity — tie order cannot change it — so the exact-int
    cumulative at each boundary and its TWO share divisions are
    bitwise-equal to SQL.

    Scale shape: same as :func:`tile_gini` — points collapse to
    occupied-tile counts, ONE fold, and the driver sorts the
    TILE-sized multiset (rank statistics need a global sort of tiles,
    never points).
    """
    import numpy as np

    from .merge import bucketed_sum

    if not 0 <= res <= 15:
        raise ValueError(f"lorenz_curve: res must be in [0, 15], got {res}")

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    counts = bucketed_sum(
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("x",),
    )

    import ray

    xs = []
    for ref in counts.to_arrow_refs():
        t = ref if isinstance(ref, pa.Table) else ray.get(ref)
        if t.num_rows:
            xs.append(t.column("x").to_numpy(zero_copy_only=False))
    empty = pa.table(
        {
            "decile": pa.array([], pa.int64()),
            "n_tiles_cum": pa.array([], pa.int64()),
            "n_points_cum": pa.array([], pa.int64()),
            "tiles_share": pa.array([], pa.float64()),
            "points_share": pa.array([], pa.float64()),
        }
    )
    if not xs:
        return ray.data.from_arrow(empty)
    x = np.sort(np.concatenate(xs))
    n = x.size
    s = int(x.sum())
    cum = np.cumsum(x)
    rows = []
    for dd in range(n_deciles):
        b = (n * (dd + 1)) // n_deciles
        if b < 1:
            continue
        rows.append(
            (
                dd,
                int(b),
                int(cum[b - 1]),
                float(b) / float(n),
                float(int(cum[b - 1])) / float(s),
            )
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "decile": pa.array([r[0] for r in rows], pa.int64()),
                "n_tiles_cum": pa.array([r[1] for r in rows], pa.int64()),
                "n_points_cum": pa.array([r[2] for r in rows], pa.int64()),
                "tiles_share": pa.array([r[3] for r in rows], pa.float64()),
                "points_share": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def lorenz_curve_sql(points_cte: str, res: int, n_deciles: int = 10) -> str:
    """DuckDB twin of :func:`lorenz_curve` — ROW_NUMBER ascending by
    density, rn-framed prefix sum (tie-order-proof: ties are equal
    values), INNER JOIN on decile boundaries."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM c),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM c),
r2 AS (SELECT rn, SUM(x) OVER (ORDER BY rn) AS cum FROM r),
d AS (SELECT unnest(generate_series(0, {n_deciles - 1})) AS decile)
SELECT d.decile,
       CAST(r2.rn AS BIGINT) AS n_tiles_cum,
       CAST(r2.cum AS BIGINT) AS n_points_cum,
       CAST(r2.rn AS DOUBLE) / CAST(m.n AS DOUBLE) AS tiles_share,
       CAST(r2.cum AS DOUBLE) / CAST(m.s AS DOUBLE) AS points_share
FROM d JOIN m ON TRUE
JOIN r2 ON r2.rn = (m.n * (d.decile + 1)) // {n_deciles}
"""


def tile_simpson(
    points: Dataset, res: int, class_col: str = "cls", n_buckets: int = 256
) -> Dataset:
    """Simpson diversity index per occupied tile — the zonal
    class-mixing statistic (land-use mixing / event-type diversity per
    cell): ``(cell, n, n_types, simpson)`` for tiles with at least two
    points, where ``simpson = 1 − Σᵢ nᵢ(nᵢ−1) / (N(N−1))`` over the
    per-class counts nᵢ (the probability two points drawn without
    replacement differ in class). Unlike Shannon entropy this needs no
    logarithm: numerator and denominator are exact integers and the
    result is ONE double division — bitwise-equal to the SQL twin.

    Scale shape: identical to :func:`tile_majority` — per-batch
    (cell, class) partial counts via lexsort+reduceat, ONE cell-bucket
    shuffle of metadata-sized partials, per-bucket exact fold. Output
    is tile-sized.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.buckets import bucket_of

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        cell = cellmod.cell_of_points(px, py, res)
        enc = pc.dictionary_encode(tbl.column(class_col)).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((code, cell))
        c_s, k_s = cell[order], code[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])][: c_s.size]
        )
        n = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
        return pa.table(
            {
                "bucket": bucket_of(c_s[starts], n_buckets),
                "cell": c_s[starts],
                "cls": enc.dictionary.take(pa.array(k_s[starts])),
                "n": n,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "simpson": pa.array([], pa.float64()),
            }
        )
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return empty
        cls = group.column("cls").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        # exact per-(cell, cls) totals across batch partials
        order = np.lexsort((cls, cell))
        c_s, k_s, n_s = cell[order], cls[order], n[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1])][: c_s.size]
        )
        tot = np.add.reduceat(n_s, starts)
        c_u = c_s[starts]
        # per-cell fold of the class totals
        cstarts = np.flatnonzero(np.r_[True, c_u[1:] != c_u[:-1]][: c_u.size])
        N = np.add.reduceat(tot, cstarts)
        n_types = np.diff(np.r_[cstarts, c_u.size]).astype(np.int64)
        num = np.add.reduceat(tot * (tot - 1), cstarts)
        keep = N >= 2
        if not keep.any():
            return empty
        N, n_types, num = N[keep], n_types[keep], num[keep]
        simpson = 1.0 - num.astype(np.float64) / (N * (N - 1)).astype(np.float64)
        return pa.table(
            {
                "cell": c_u[cstarts][keep],
                "n": N,
                "n_types": n_types,
                "simpson": simpson,
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def tile_simpson_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_simpson` — exact integer numerator /
    denominator, the identical single double division."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, cls, CAST(COUNT(*) AS BIGINT) AS n
      FROM p0 GROUP BY 1, 2),
t AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(n * (n - 1)) AS BIGINT) AS num
      FROM c GROUP BY cell)
SELECT cell, n, n_types,
       CAST(1 AS DOUBLE) - CAST(num AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
         AS simpson
FROM t WHERE n >= 2
"""


def voronoi_assign(
    points: Dataset,
    seed_ids: "np.ndarray",
    seed_ix: "np.ndarray",
    seed_iy: "np.ndarray",
    res: int,
    n_buckets: int = 256,
) -> Dataset:
    """Discrete Voronoi / Thiessen rasterization: every OCCUPIED tile
    assigned to its nearest seed site by exact integer squared grid
    distance, ties broken by the smallest seed id — the
    nearest-facility partition of a demand raster: ``(cell, n, seed,
    d2)``.

    Scale shape: per-batch distinct-cell counts, ONE cell-bucket
    shuffle of tile-sized partials; the K seed sites are a metadata
    broadcast closed over by the fold (K·T integer distance matrix per
    bucket, never per point). Exact ints end to end → bitwise SQL twin
    (ROW_NUMBER over (d2, seed)).
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    order = np.argsort(seed_ids, kind="stable")
    sid = np.asarray(seed_ids, np.int64)[order]
    sx = np.asarray(seed_ix, np.int64)[order]
    sy = np.asarray(seed_iy, np.int64)[order]
    if sid.size == 0:
        raise ValueError("voronoi_assign needs at least one seed")
    if np.unique(sid).size != sid.size:
        raise ValueError("voronoi_assign seed ids must be unique")
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table(
            {
                "bucket": bucket_of(c, n_buckets),
                "cell": c,
                "n": n.astype(np.int64),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "seed": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.int64()),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        c_s, n_s = cell[order], n[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        c_u = c_s[starts]
        tot = np.add.reduceat(n_s, starts)
        ix = c_u // g
        iy = c_u % g
        # (T, K) exact integer distance matrix; argmin returns the FIRST
        # minimum, and seeds are sorted by id -> tie goes to smallest id
        d2 = (ix[:, None] - sx[None, :]) ** 2 + (iy[:, None] - sy[None, :]) ** 2
        win = np.argmin(d2, axis=1)
        return pa.table(
            {
                "cell": c_u,
                "n": tot,
                "seed": sid[win],
                "d2": d2[np.arange(c_u.size), win],
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def voronoi_assign_sql(points_cte: str, seeds_cte: str, res: int) -> str:
    """DuckDB twin of :func:`voronoi_assign` — occupied-tile counts ×
    seed sites, ROW_NUMBER argmin with the identical (d2, seed) order.
    ``seeds_cte`` must yield (seed BIGINT, sx BIGINT, sy BIGINT)."""
    cell = derive.tile_cell_sql("px", "py", res)
    g = 1 << res
    return f"""
WITH p0 AS ({points_cte}),
t AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS n
      FROM p0 GROUP BY 1),
s AS ({seeds_cte}),
a AS (SELECT t.cell, t.n, s.seed,
             (t.cell // {g} - s.sx) * (t.cell // {g} - s.sx)
           + (t.cell % {g} - s.sy) * (t.cell % {g} - s.sy) AS d2
      FROM t CROSS JOIN s),
r AS (SELECT cell, n, seed, d2,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY d2, seed) AS rn
      FROM a)
SELECT cell, n, seed, CAST(d2 AS BIGINT) AS d2 FROM r WHERE rn = 1
"""


def grid_bfs(
    points: Dataset,
    seed_ix: "np.ndarray",
    seed_iy: "np.ndarray",
    res: int,
    max_hops: int = 6,
    n_buckets: int = 256,
) -> Dataset:
    """Multi-source BFS hop distance over the occupied-tile graph — the
    isochrone / service-area raster op: ``(cell, dist)`` for every tile
    reachable from a seed tile within ``max_hops`` 4-connected steps,
    where the graph's nodes are the occupied tiles plus the seed tiles
    and ``dist`` is the exact shortest hop count.

    Scale shape: occupancy is aggregated distributedly (per-batch
    distinct cells, ONE cell-bucket dedup fold); the BFS itself runs on
    the aggregated raster, which is tile-sized metadata (≤4^res cells —
    the same compact-raster final fold as :func:`raster_regions`), as a
    vectorized frontier dilation, never per point. The SQL twin is a
    recursive CTE over the identical node set — exact integer
    distances both sides.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    g = 1 << res
    sx = np.asarray(seed_ix, np.int64)
    sy = np.asarray(seed_iy, np.int64)
    if sx.size == 0:
        raise ValueError("grid_bfs needs at least one seed tile")
    if ((sx < 0) | (sx >= g) | (sy < 0) | (sy >= g)).any():
        raise ValueError("grid_bfs seed tiles out of grid range")

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c = np.unique(cellmod.cell_of_points(px, py, res))
        return pa.table({"bucket": bucket_of(c, n_buckets), "cell": c})

    def dedup(group: pa.Table) -> pa.Table:
        c = np.unique(group.column("cell").to_numpy(zero_copy_only=False))
        return pa.table({"k": np.zeros(c.size, np.int64), "cell": c})

    def bfs(group: pa.Table) -> pa.Table:
        c = group.column("cell").to_numpy(zero_copy_only=False)
        occ = np.zeros((g, g), bool)
        occ[c // g, c % g] = True
        occ[sx, sy] = True  # seed tiles are nodes even when unoccupied
        dist = np.full((g, g), -1, np.int64)
        dist[sx, sy] = 0
        frontier = np.zeros((g, g), bool)
        frontier[sx, sy] = True
        for h in range(1, max_hops + 1):
            nb = np.zeros_like(frontier)
            nb[1:, :] |= frontier[:-1, :]
            nb[:-1, :] |= frontier[1:, :]
            nb[:, 1:] |= frontier[:, :-1]
            nb[:, :-1] |= frontier[:, 1:]
            newf = nb & occ & (dist < 0)
            if not newf.any():
                break
            dist[newf] = h
            frontier = newf
        vx, vy = np.nonzero(dist >= 0)
        cell = vx.astype(np.int64) * g + vy.astype(np.int64)
        order = np.argsort(cell, kind="stable")
        return pa.table({"cell": cell[order], "dist": dist[vx, vy][order]})

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(dedup, batch_format="pyarrow")
        .groupby("k")
        .map_groups(bfs, batch_format="pyarrow")
        .select_columns(["cell", "dist"])
    )


def grid_bfs_sql(points_cte: str, seeds_cte: str, res: int, max_hops: int = 6) -> str:
    """DuckDB twin of :func:`grid_bfs` — recursive-CTE BFS with
    distinct-row semantics + MIN(dist) fold. ``seeds_cte`` must yield
    (sx BIGINT, sy BIGINT) grid indices."""
    cell = derive.tile_cell_sql("px", "py", res)
    g = 1 << res
    return f"""
WITH RECURSIVE p0 AS ({points_cte}),
occ AS (SELECT DISTINCT {cell} AS cell FROM p0),
sd AS ({seeds_cte}),
seedcells AS (SELECT DISTINCT sx * {g} + sy AS cell FROM sd),
nodes AS (SELECT cell FROM occ UNION SELECT cell FROM seedcells),
n2 AS (SELECT cell, cell // {g} AS ix, cell % {g} AS iy FROM nodes),
edges AS (
  SELECT a.cell AS src, b.cell AS dst FROM n2 a JOIN n2 b
    ON a.ix = b.ix AND b.iy = a.iy + 1
  UNION ALL SELECT a.cell, b.cell FROM n2 a JOIN n2 b
    ON a.ix = b.ix AND b.iy = a.iy - 1
  UNION ALL SELECT a.cell, b.cell FROM n2 a JOIN n2 b
    ON a.iy = b.iy AND b.ix = a.ix + 1
  UNION ALL SELECT a.cell, b.cell FROM n2 a JOIN n2 b
    ON a.iy = b.iy AND b.ix = a.ix - 1
),
bfs AS (
  SELECT cell, 0 AS dist FROM seedcells
  UNION
  SELECT e.dst AS cell, b.dist + 1 AS dist
  FROM bfs b JOIN edges e ON e.src = b.cell
  WHERE b.dist < {max_hops}
)
SELECT cell, CAST(MIN(dist) AS BIGINT) AS dist FROM bfs GROUP BY cell
"""


def tile_rank_corr(
    points: Dataset, res: int, user_col: str = "user_id", n_buckets: int = 256
) -> Dataset:
    """Spearman-style rank agreement between two per-tile signals —
    point DENSITY vs distinct-VISITOR diversity (do crowded tiles also
    draw diverse crowds?): one row ``(n_tiles, sum_d2, rho)`` with
    ``rho = 1 − 6·Σd² / (n(n²−1))`` over deterministic ranks
    (ROW_NUMBER ordered by (metric, cell) — tie-broken by cell, so the
    statistic is exact and reproducible; classic Spearman up to the
    deterministic tie rule). All integer until the single final
    division.

    Scale shape: per-batch (cell, user, n) partials (pair-deduped,
    multiplicity carried), ONE cell-bucket fold to the tile table
    (≤4^res rows), then ONE single-group rank pass over tile-sized
    metadata — the same compact final fold as :func:`grid_bfs`.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        u = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = cellmod.cell_of_points(px, py, res)
        order = np.lexsort((u, cell))
        c_s, u_s = cell[order], u[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])][: c_s.size]
        )
        n = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
        return pa.table(
            {
                "bucket": bucket_of(c_s[starts], n_buckets),
                "cell": c_s[starts],
                "u": u_s[starts],
                "n": n,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        u = group.column("u").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, cell))
        c_s, u_s, n_s = cell[order], u[order], n[order]
        pair_starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])][: c_s.size]
        )
        pair_n = np.add.reduceat(n_s, pair_starts)
        pc_ = c_s[pair_starts]
        cstarts = np.flatnonzero(np.r_[True, pc_[1:] != pc_[:-1]][: pc_.size])
        return pa.table(
            {
                "k": np.zeros(cstarts.size, np.int64),
                "cell": pc_[cstarts],
                "n_points": np.add.reduceat(pair_n, cstarts),
                "n_users": np.diff(np.r_[cstarts, pc_.size]).astype(np.int64),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_tiles": pa.array([], pa.int64()),
                "sum_d2": pa.array([], pa.int64()),
                "rho": pa.array([], pa.float64()),
            }
        )
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        n = cell.size
        if n < 2:
            return empty
        npnt = group.column("n_points").to_numpy(zero_copy_only=False)
        nusr = group.column("n_users").to_numpy(zero_copy_only=False)
        rp = np.empty(n, np.int64)
        rp[np.lexsort((cell, npnt))] = np.arange(1, n + 1)
        ru = np.empty(n, np.int64)
        ru[np.lexsort((cell, nusr))] = np.arange(1, n + 1)
        d = rp - ru
        sd2 = int((d * d).sum())
        rho = 1.0 - np.float64(6 * sd2) / np.float64(n * (n * n - 1))
        return pa.table(
            {
                "n_tiles": pa.array([n], pa.int64()),
                "sum_d2": pa.array([sd2], pa.int64()),
                "rho": pa.array([rho], pa.float64()),
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["n_tiles", "sum_d2", "rho"])
    )


def tile_rank_corr_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_rank_corr` — ROW_NUMBER ranks with
    the identical (metric, cell) tie order, one final division."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
t AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM p0 GROUP BY 1),
r AS (SELECT cell,
             ROW_NUMBER() OVER (ORDER BY n_points, cell) AS rp,
             ROW_NUMBER() OVER (ORDER BY n_users, cell) AS ru
      FROM t),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((rp - ru) * (rp - ru)) AS BIGINT) AS sd2
      FROM r)
SELECT n AS n_tiles, sd2 AS sum_d2,
       CAST(1 AS DOUBLE) - CAST(6 * sd2 AS DOUBLE)
         / CAST(n * (n * n - 1) AS DOUBLE) AS rho
FROM s WHERE n >= 2
"""


def gravity_access(
    points: Dataset,
    seed_ids: "np.ndarray",
    seed_ix: "np.ndarray",
    seed_iy: "np.ndarray",
    res: int,
    scale: int = 1_000_000,
    n_buckets: int = 256,
) -> Dataset:
    """Gravity accessibility surface — for every OCCUPIED tile, the
    summed inverse-distance attraction of the K seed facilities:
    ``(cell, n, access)`` with ``access = Σₖ ⌊scale / (1 + d²ₖ)⌋``
    (integer grid distance d²). Flooring each term BEFORE the sum
    makes the statistic an exact integer — a raw float Σ 1/(1+d²)
    would be shuffle-order-dependent; this one is invariant and
    bitwise-equal to the SQL twin.

    Scale shape: identical to :func:`voronoi_assign` — per-batch
    distinct-cell counts, ONE cell-bucket fold, K·T integer distance
    matrix per bucket with the seeds a metadata closure.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    sx = np.asarray(seed_ix, np.int64)
    sy = np.asarray(seed_iy, np.int64)
    if sx.size == 0:
        raise ValueError("gravity_access needs at least one seed")
    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table(
            {"bucket": bucket_of(c, n_buckets), "cell": c, "n": n.astype(np.int64)}
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "access": pa.array([], pa.int64()),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        c_s, n_s = cell[order], n[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        c_u = c_s[starts]
        tot = np.add.reduceat(n_s, starts)
        ix = c_u // g
        iy = c_u % g
        d2 = (ix[:, None] - sx[None, :]) ** 2 + (iy[:, None] - sy[None, :]) ** 2
        access = np.floor(np.float64(scale) / (1.0 + d2)).astype(np.int64).sum(axis=1)
        return pa.table({"cell": c_u, "n": tot, "access": access})

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def gravity_access_sql(
    points_cte: str, seeds_cte: str, res: int, scale: int = 1_000_000
) -> str:
    """DuckDB twin of :func:`gravity_access` — per-term FLOOR before
    the integer sum, identical double division."""
    cell = derive.tile_cell_sql("px", "py", res)
    g = 1 << res
    return f"""
WITH p0 AS ({points_cte}),
t AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS n
      FROM p0 GROUP BY 1),
s AS ({seeds_cte}),
a AS (SELECT t.cell, t.n,
             (t.cell // {g} - s.sx) * (t.cell // {g} - s.sx)
           + (t.cell % {g} - s.sy) * (t.cell % {g} - s.sy) AS d2
      FROM t CROSS JOIN s)
SELECT cell, n,
       CAST(SUM(CAST(FLOOR({float(scale)!r} / (1 + d2)) AS BIGINT))
         AS BIGINT) AS access
FROM a GROUP BY cell, n
"""


def tile_turnover(
    points: Dataset,
    res: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 256,
) -> Dataset:
    """Visitor TURNOVER per tile — Jaccard overlap between the tile's
    early-half and late-half visitor sets (the churn/renewal signal of
    a footfall pipeline): ``(cell, n_early_users, n_late_users, n_both,
    n_union, jaccard)`` split at the stream's (MIN+MAX)/2 µs midpoint
    (the :func:`..movement.cell_trend` convention). Exact distinct-set
    integers + ONE division per tile.

    Scale shape: pass 1 is a two-scalar metadata fold (global ts
    min/max); pass 2 collapses each batch to distinct (cell, user)
    rows carrying a 2-bit early/late presence mask, ONE cell-bucket OR
    fold, per-cell popcounts. Shuffle is bounded by distinct
    (cell, user) pairs, never events.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from ..functions.buckets import bucket_of

    def ts_us(tbl: pa.Table) -> "np.ndarray":
        return (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )

    def minmax(tbl: pa.Table) -> pa.Table:
        t = ts_us(tbl)
        if t.size == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "lo": pa.array([int(t.min())], pa.int64()),
                "hi": pa.array([int(t.max())], pa.int64()),
            }
        )

    lo = hi = None
    for ref in points.map_batches(
        minmax, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    ).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        blo = pc.min(t.column("lo")).as_py()
        bhi = pc.max(t.column("hi")).as_py()
        lo = blo if lo is None else min(lo, blo)
        hi = bhi if hi is None else max(hi, bhi)
    empty = pa.table(
        {
            "cell": pa.array([], pa.int64()),
            "n_early_users": pa.array([], pa.int64()),
            "n_late_users": pa.array([], pa.int64()),
            "n_both": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if lo is None:
        return ray.data.from_arrow(empty)
    mid = (lo + hi) // 2  # epoch µs positive: floor == truncation

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        u = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = cellmod.cell_of_points(px, py, res)
        mask = np.where(ts_us(tbl) > mid, np.int64(2), np.int64(1))
        order = np.lexsort((u, cell))
        c_s, u_s, m_s = cell[order], u[order], mask[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])][: c_s.size]
        )
        m_or = np.bitwise_or.reduceat(m_s, starts)
        return pa.table(
            {
                "bucket": bucket_of(c_s[starts], n_buckets),
                "cell": c_s[starts],
                "u": u_s[starts],
                "m": m_or,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return empty
        u = group.column("u").to_numpy(zero_copy_only=False)
        m = group.column("m").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, cell))
        c_s, u_s, m_s = cell[order], u[order], m[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (u_s[1:] != u_s[:-1])][: c_s.size]
        )
        m_or = np.bitwise_or.reduceat(m_s, starts)
        pc_ = c_s[starts]
        cstarts = np.flatnonzero(np.r_[True, pc_[1:] != pc_[:-1]][: pc_.size])
        early = np.add.reduceat((m_or & 1).astype(np.int64), cstarts)
        late = np.add.reduceat(((m_or >> 1) & 1).astype(np.int64), cstarts)
        both = np.add.reduceat((m_or == 3).astype(np.int64), cstarts)
        union = np.diff(np.r_[cstarts, pc_.size]).astype(np.int64)
        return pa.table(
            {
                "cell": pc_[cstarts],
                "n_early_users": early,
                "n_late_users": late,
                "n_both": both,
                "n_union": union,
                "jaccard": both.astype(np.float64) / union.astype(np.float64),
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def tile_turnover_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`tile_turnover` — same midpoint, MAX-CASE
    presence bits, popcount sums, ONE division. ``points_cte`` must
    yield (user_id, ts, px, py)."""
    cell = derive.tile_cell_sql("px", "py", res)
    return f"""
WITH p0 AS ({points_cte}),
b AS (SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM p0),
d AS (SELECT {cell} AS cell, user_id,
             MAX(CASE WHEN epoch_us(ts) <= b.mid THEN 1 ELSE 0 END) AS e,
             MAX(CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END) AS l
      FROM p0, b GROUP BY 1, 2)
SELECT cell, CAST(SUM(e) AS BIGINT) AS n_early_users,
       CAST(SUM(l) AS BIGINT) AS n_late_users,
       CAST(SUM(e * l) AS BIGINT) AS n_both,
       CAST(COUNT(*) AS BIGINT) AS n_union,
       CAST(SUM(e * l) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS jaccard
FROM d GROUP BY cell
"""


def region_count_curve(
    points: Dataset,
    res: int,
    thresholds: tuple[int, ...] = (8, 16, 32),
    n_buckets: int = 256,
) -> Dataset:
    """Percolation curve of the density raster — how many queen-
    connected regions survive as the activity threshold rises:
    ``(threshold, n_regions, n_tiles)`` per threshold (the region-
    fragmentation profile behind :func:`raster_regions`'s single cut).

    Scale shape: occupancy aggregates distributedly (ONE cell-bucket
    fold); the labeling runs per threshold on the compact raster
    (≤4^res cells — the :func:`grid_bfs` final-fold bound) as a
    vectorized min-label propagation, never per point.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, res), return_counts=True)
        return pa.table(
            {"bucket": bucket_of(c, n_buckets), "cell": c, "n": n.astype(np.int64)}
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        c_s, n_s = cell[order], n[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        return pa.table(
            {
                "k": np.zeros(starts.size, np.int64),
                "cell": c_s[starts],
                "n": np.add.reduceat(n_s, starts),
            }
        )

    def _count_regions(occ: "np.ndarray") -> int:
        # queen-connectivity CC count via vectorized min-label sweeps
        BIG = np.iinfo(np.int64).max
        lab = np.where(occ, np.arange(occ.size, dtype=np.int64).reshape(occ.shape), BIG)
        while True:
            best = lab.copy()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    sh = np.full_like(lab, BIG)
                    sx0, sx1 = max(dx, 0), occ.shape[0] + min(dx, 0)
                    sy0, sy1 = max(dy, 0), occ.shape[1] + min(dy, 0)
                    sh[sx0:sx1, sy0:sy1] = lab[
                        sx0 - dx : sx1 - dx, sy0 - dy : sy1 - dy
                    ]
                    np.minimum(best, sh, out=best)
            best = np.where(occ, best, BIG)
            if (best == lab).all():
                break
            lab = best
        return int(np.unique(lab[occ]).size)

    def curve(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        out_t, out_r, out_c = [], [], []
        for t in thresholds:
            m = n >= t
            occ = np.zeros((g, g), bool)
            occ[cell[m] // g, cell[m] % g] = True
            out_t.append(int(t))
            out_r.append(_count_regions(occ) if m.any() else 0)
            out_c.append(int(m.sum()))
        return pa.table(
            {
                "threshold": pa.array(out_t, pa.int64()),
                "n_regions": pa.array(out_r, pa.int64()),
                "n_tiles": pa.array(out_c, pa.int64()),
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("k")
        .map_groups(curve, batch_format="pyarrow")
        .select_columns(["threshold", "n_regions", "n_tiles"])
    )


def region_count_curve_sql(
    points_cte: str, res: int, thresholds: tuple[int, ...] = (8, 16, 32)
) -> str:
    """DuckDB twin of :func:`region_count_curve` — one recursive label
    closure per threshold (the :func:`raster_regions_sql` pattern),
    UNION ALL of the counts."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    parts = []
    ctes = [
        f"p0 AS ({points_cte})",
        f"c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x "
        "FROM p0 GROUP BY 1)",
    ]
    for t in thresholds:
        ctes.append(f"a{t} AS (SELECT cell FROM c WHERE x >= {t})")
        ctes.append(
            f"e{t} AS (SELECT a1.cell AS src, a2.cell AS dst FROM a{t} a1 "
            f"JOIN a{t} a2 ON ABS(a1.cell // {g} - a2.cell // {g}) <= 1 "
            f"AND ABS(a1.cell % {g} - a2.cell % {g}) <= 1 "
            "AND a1.cell <> a2.cell)"
        )
        ctes.append(
            f"lab{t} AS (SELECT cell, cell AS lbl FROM a{t} "
            f"UNION SELECT e{t}.dst AS cell, lab{t}.lbl "
            f"FROM lab{t} JOIN e{t} ON e{t}.src = lab{t}.cell)"
        )
        ctes.append(
            f"m{t} AS (SELECT cell, MIN(lbl) AS region FROM lab{t} "
            "GROUP BY cell)"
        )
        parts.append(
            f"SELECT CAST({t} AS BIGINT) AS threshold, "
            f"CAST(COUNT(DISTINCT region) AS BIGINT) AS n_regions, "
            f"CAST(COUNT(*) AS BIGINT) AS n_tiles FROM m{t}"
        )
    return (
        "WITH RECURSIVE " + ", ".join(ctes) + " " + " UNION ALL ".join(parts)
    )


def hilbert_locality(
    points: Dataset, res: int, n_buckets: int = 256
) -> Dataset:
    """Space-filling-curve LOCALITY metric — over every rook-adjacent
    pair of OCCUPIED tiles, the exact sum and mean of the Hilbert-index
    gap ``|h(a) − h(b)|``: one row ``(n_edges, gap_sum, mean_gap)``.
    This is the statistic that justifies :func:`hilbert_ranges`
    partitioning (smaller mean gap ⇒ spatially adjacent data lands in
    the same partition). Exact integers + ONE division.

    Scale shape: distributed occupancy dedup, then the compact-raster
    final fold computes Hilbert indices (:func:`hilbert_d`) and the
    shifted-grid pair sweep — tile-sized, never per point.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    g = 1 << res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c = np.unique(cellmod.cell_of_points(px, py, res))
        return pa.table({"bucket": bucket_of(c, n_buckets), "cell": c})

    def dedup(group: pa.Table) -> pa.Table:
        c = np.unique(group.column("cell").to_numpy(zero_copy_only=False))
        return pa.table({"k": np.zeros(c.size, np.int64), "cell": c})

    def final(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_edges": pa.array([], pa.int64()),
                "gap_sum": pa.array([], pa.int64()),
                "mean_gap": pa.array([], pa.float64()),
            }
        )
        cell = np.unique(group.column("cell").to_numpy(zero_copy_only=False))
        if cell.size == 0:
            return empty
        ix = cell // g
        iy = cell % g
        h = hilbert_d(ix, iy, res)
        hg = np.full((g, g), -1, np.int64)
        hg[ix, iy] = h
        gaps = []
        a, b = hg[:-1, :], hg[1:, :]
        m = (a >= 0) & (b >= 0)
        gaps.append(np.abs(a[m] - b[m]))
        a, b = hg[:, :-1], hg[:, 1:]
        m = (a >= 0) & (b >= 0)
        gaps.append(np.abs(a[m] - b[m]))
        allg = np.concatenate(gaps)
        n = int(allg.size)
        s = int(allg.sum())
        if n == 0:
            return empty
        return pa.table(
            {
                "n_edges": pa.array([n], pa.int64()),
                "gap_sum": pa.array([s], pa.int64()),
                "mean_gap": pa.array([float(s) / float(n)], pa.float64()),
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(dedup, batch_format="pyarrow")
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["n_edges", "gap_sum", "mean_gap"])
    )


def hilbert_locality_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`hilbert_locality` — occupied tiles re-fed
    as tile-center points through the unrolled Hilbert chain
    (:func:`tile_hilbert_sql`), rook pair join, exact sums."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    inner = tile_hilbert_sql(
        f"SELECT cell AS query_id, "
        f"(CAST(cell // {g} AS DOUBLE) + 0.5) / {g} AS px, "
        f"(CAST(cell % {g} AS DOUBLE) + 0.5) / {g} AS py FROM occ",
        res,
    )
    return f"""
WITH occ AS (SELECT DISTINCT {cell} AS cell FROM ({points_cte})),
h AS ({inner}),
c AS (SELECT cell, hilbert, cell // {g} AS ix, cell % {g} AS iy FROM h),
e AS (SELECT ABS(a.hilbert - b.hilbert) AS gap FROM c a JOIN c b ON
      (b.ix = a.ix + 1 AND b.iy = a.iy) OR (b.ix = a.ix AND b.iy = a.iy + 1))
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(gap) AS BIGINT) AS gap_sum,
       CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap
FROM e
"""


def adaptive_quadtree(
    points: Dataset,
    max_res: int,
    cap: int = 64,
    n_buckets: int = 256,
) -> Dataset:
    """Adaptive quadtree binning — the capacity-split partitioning a
    spatial index would build: starting from the root cell, any node
    holding more than ``cap`` points splits into its four children,
    down to ``max_res``; one row ``(level, cell, n)`` per OCCUPIED
    leaf. Leaves jointly cover every point exactly once (the adaptive
    analog of the fixed-level :func:`tile_pyramid`).

    Scale shape: ONE distributed fold to finest-level cell counts
    (tile-sized metadata); the split decisions walk the count pyramid
    top-down on the driver — O(4^max_res) ints, never points. The SQL
    twin chains one CTE per level carrying the all-ancestors-over-cap
    flag.
    """
    import numpy as np

    from ..functions.buckets import bucket_of

    g = 1 << max_res

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        c, n = np.unique(cellmod.cell_of_points(px, py, max_res), return_counts=True)
        return pa.table(
            {"bucket": bucket_of(c, n_buckets), "cell": c, "n": n.astype(np.int64)}
        )

    def fold(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        c_s, n_s = cell[order], n[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        return pa.table(
            {
                "k": np.zeros(starts.size, np.int64),
                "cell": c_s[starts],
                "n": np.add.reduceat(n_s, starts),
            }
        )

    def split(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "level": pa.array([], pa.int64()),
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return empty
        n = group.column("n").to_numpy(zero_copy_only=False)
        # count pyramid: level max_res down to 0
        levels = [None] * (max_res + 1)
        ix = cell // g
        iy = cell % g
        levels[max_res] = {(int(x), int(y)): int(v) for x, y, v in zip(ix, iy, n)}
        for l in range(max_res - 1, -1, -1):
            agg: dict = {}
            for (x, y), v in levels[l + 1].items():
                key = (x // 2, y // 2)
                agg[key] = agg.get(key, 0) + v
            levels[l] = agg
        out_l, out_c, out_n = [], [], []
        stack = [(0, 0, 0)]
        while stack:
            l, x, y = stack.pop()
            v = levels[l].get((x, y))
            if v is None:
                continue
            if v <= cap or l == max_res:
                gl = 1 << l
                out_l.append(l)
                out_c.append(x * gl + y)
                out_n.append(v)
            else:
                for dx in (0, 1):
                    for dy in (0, 1):
                        stack.append((l + 1, 2 * x + dx, 2 * y + dy))
        order = np.lexsort((out_c, out_l))
        return pa.table(
            {
                "level": np.array(out_l, np.int64)[order],
                "cell": np.array(out_c, np.int64)[order],
                "n": np.array(out_n, np.int64)[order],
            }
        )

    return (
        points.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("k")
        .map_groups(split, batch_format="pyarrow")
        .select_columns(["level", "cell", "n"])
    )


def adaptive_quadtree_sql(points_cte: str, max_res: int, cap: int = 64) -> str:
    """DuckDB twin of :func:`adaptive_quadtree` — per-level count CTEs
    chained with the all-ancestors-over-cap flag, UNION ALL of leaves."""
    ctes = [f"p0 AS ({points_cte})"]
    for l in range(max_res + 1):
        ix = derive.tile_index_sql("px", l)
        iy = derive.tile_index_sql("py", l)
        ctes.append(
            f"c{l} AS (SELECT {ix} AS ix, {iy} AS iy, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM p0 GROUP BY 1, 2)"
        )
    ctes.append("o0 AS (SELECT ix, iy, n, TRUE AS ok FROM c0)")
    for l in range(1, max_res + 1):
        ctes.append(
            f"o{l} AS (SELECT c.ix, c.iy, c.n, (o.ok AND o.n > {cap}) AS ok "
            f"FROM c{l} c JOIN o{l - 1} o "
            "ON o.ix = c.ix // 2 AND o.iy = c.iy // 2)"
        )
    parts = []
    for l in range(max_res + 1):
        leaf_pred = f"n <= {cap}" if l < max_res else "TRUE"
        parts.append(
            f"SELECT CAST({l} AS BIGINT) AS level, "
            f"CAST(ix * {1 << l} + iy AS BIGINT) AS cell, n "
            f"FROM o{l} WHERE ok AND ({leaf_pred})"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(parts)


def flow_accumulation(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """D8 flow ACCUMULATION + watershed assignment over the point-
    density raster: for every occupied tile, ``acc_n`` = its own count
    plus every count that drains through it along steepest-descent
    flow, and ``sink_cell`` = the cell its flow path terminates at.
    Output ``(cell, x, acc_n, sink_cell)``, one row per occupied tile.

    Flow edges come from :func:`flow_direction` (same conventions:
    in-grid 8-neighborhood, unoccupied neighbors count 0, strict
    descent). A tile draining into an UNOCCUPIED in-grid cell
    terminates there (an all-zero neighborhood can never descend
    further), so ``sink_cell`` may name an unoccupied tile; it is
    still a valid grid cell id. Edges strictly decrease the count, so
    the flow graph is a DAG and a single descending-count sweep
    accumulates exactly.

    Scale shape: all streaming work is :func:`flow_direction`'s
    (points collapse to exact tile counts, ONE neighbor-offer
    shuffle); the flow graph itself is parameter-sized (≤ 4^res rows
    of metadata), so the upstream sum and sink chase fold on the
    driver — a raster is a model artifact, never data-sized.
    """
    import numpy as np
    import ray

    g = 1 << res
    fd = flow_direction(points, res=res, n_buckets=n_buckets).take_all()
    if not fd:
        return ray.data.from_arrow(
            pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "acc_n": pa.array([], pa.int64()),
                    "sink_cell": pa.array([], pa.int64()),
                }
            )
        )
    cell = np.array([r["cell"] for r in fd], np.int64)
    x = np.array([r["x"] for r in fd], np.int64)
    code = np.array([r["flow_dir"] for r in fd], np.int64)
    o = np.argsort(cell, kind="stable")
    cell, x, code = cell[o], x[o], code[o]
    flows = code >= 0
    nxt_cell = np.full(cell.size, -1, np.int64)
    nxt_cell[flows] = (
        cell[flows]
        + (code[flows] // 3 - 1) * g
        + (code[flows] % 3 - 1)
    )
    # index of the next hop among OCCUPIED cells (-1: terminal edge
    # into an unoccupied cell, or a sink)
    pos = np.searchsorted(cell, nxt_cell)
    occ_next = (
        flows
        & (pos < cell.size)
        & (cell[np.minimum(pos, max(cell.size - 1, 0))] == nxt_cell)
        if cell.size
        else np.zeros(nxt_cell.size, np.bool_)
    )
    nxt_idx = np.where(occ_next, np.minimum(pos, max(cell.size - 1, 0)), -1)
    # descending-count sweep: every edge strictly descends in x, so
    # when a tile is processed all its upstream mass has arrived
    # (parameter-sized loop: <= 4^res iterations)
    acc = x.copy()
    for i in np.argsort(-x, kind="stable"):
        j = int(nxt_idx[i])
        if j >= 0:
            acc[j] += acc[i]
    # sink chase by rounds of pointer jumping on the resolved frontier
    sink = np.full(cell.size, -1, np.int64)
    terminal = ~flows
    sink[terminal] = cell[terminal]
    edge_out = flows & ~occ_next  # drains into an unoccupied cell
    sink[edge_out] = nxt_cell[edge_out]
    pending = np.nonzero(sink == -1)[0]
    while pending.size:
        ready = sink[nxt_idx[pending]] != -1
        if not ready.any():  # pragma: no cover - DAG => always progresses
            raise RuntimeError("flow graph did not converge")
        sink[pending[ready]] = sink[nxt_idx[pending[ready]]]
        pending = pending[~ready]
    return ray.data.from_arrow(
        pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "acc_n": pa.array(acc, pa.int64()),
                "sink_cell": pa.array(sink, pa.int64()),
            }
        )
    )


def watershed_sizes(points: Dataset, res: int, n_buckets: int = 256) -> Dataset:
    """Watershed (drainage-basin) rollup of :func:`flow_accumulation`:
    one row per sink ``(sink_cell, n_cells, total_n)`` — how many
    occupied tiles and how much point mass drain to each sink. The
    input table is parameter-sized, so the rollup is a driver fold."""
    import numpy as np
    import ray

    rows = flow_accumulation(points, res=res, n_buckets=n_buckets).take_all()
    if not rows:
        return ray.data.from_arrow(
            pa.table(
                {
                    "sink_cell": pa.array([], pa.int64()),
                    "n_cells": pa.array([], pa.int64()),
                    "total_n": pa.array([], pa.int64()),
                }
            )
        )
    sink = np.array([r["sink_cell"] for r in rows], np.int64)
    x = np.array([r["x"] for r in rows], np.int64)
    o = np.argsort(sink, kind="stable")
    s_s, x_s = sink[o], x[o]
    starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]][: s_s.size])
    return ray.data.from_arrow(
        pa.table(
            {
                "sink_cell": pa.array(s_s[starts], pa.int64()),
                "n_cells": pa.array(
                    np.diff(np.r_[starts, s_s.shape[0]]).astype(np.int64),
                    pa.int64(),
                ),
                "total_n": pa.array(
                    np.add.reduceat(x_s, starts), pa.int64()
                ),
            }
        )
    )


def _flow_edges_cte(points_cte: str, res: int) -> str:
    """Shared CTE body: occupied-cell counts -> D8 flow dir -> edges."""
    g = 1 << res
    cell = derive.tile_cell_sql("px", "py", res)
    dirs = ", ".join(
        f"({(dx + 1) * 3 + (dy + 1)}, {dx}, {dy})"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    return f"""
p0 AS ({points_cte}),
c AS (SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS x
      FROM p0 GROUP BY 1),
d(code, dx, dy) AS (VALUES {dirs}),
n AS (SELECT c.cell, d.code, d.dx, d.dy,
             (c.cell // {g}) + d.dx AS nx, (c.cell % {g}) + d.dy AS ny
      FROM c CROSS JOIN d),
f AS (SELECT n.cell, n.code, n.dx, n.dy, COALESCE(cn.x, 0) AS nbx
      FROM n LEFT JOIN c cn ON cn.cell = n.nx * {g} + n.ny
      WHERE n.nx BETWEEN 0 AND {g - 1} AND n.ny BETWEEN 0 AND {g - 1}),
r AS (SELECT cell, code, dx, dy, nbx,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY nbx, code) AS rn
      FROM f),
fd AS (SELECT c.cell, c.x,
              CASE WHEN r.nbx < c.x THEN r.code ELSE -1 END AS code,
              CASE WHEN r.nbx < c.x
                   THEN (c.cell + r.dx * {g} + r.dy) ELSE NULL END AS nxt
       FROM c JOIN r ON r.cell = c.cell AND r.rn = 1),
e AS (SELECT cell, nxt FROM fd WHERE nxt IS NOT NULL),
reach(u, v) AS (
  SELECT cell, cell FROM fd
  UNION
  SELECT r2.u, e.nxt FROM reach r2 JOIN e ON e.cell = r2.v
),
acc AS (SELECT r3.v AS cell, CAST(SUM(fu.x) AS BIGINT) AS acc_n
        FROM reach r3 JOIN fd fu ON fu.cell = r3.u GROUP BY 1),
sink AS (SELECT r4.u AS cell, r4.v AS sink_cell FROM reach r4
         LEFT JOIN e ON e.cell = r4.v WHERE e.cell IS NULL)
"""


def flow_accumulation_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`flow_accumulation` — the same strict-
    descent edges, transitive closure via recursive CTE."""
    return (
        "WITH RECURSIVE "
        + _flow_edges_cte(points_cte, res)
        + """
SELECT fd.cell, fd.x, acc.acc_n, CAST(sink.sink_cell AS BIGINT) AS sink_cell
FROM fd JOIN acc ON acc.cell = fd.cell JOIN sink ON sink.cell = fd.cell
"""
    )


def watershed_sizes_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`watershed_sizes`."""
    return (
        "WITH RECURSIVE "
        + _flow_edges_cte(points_cte, res)
        + """
SELECT CAST(sink.sink_cell AS BIGINT) AS sink_cell,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(fd.x) AS BIGINT) AS total_n
FROM fd JOIN sink ON sink.cell = fd.cell
GROUP BY 1
"""
    )


def bivariate_moran(
    points_x: Dataset, points_y: Dataset, res: int, n_buckets: int = 256
) -> Dataset:
    """Global BIVARIATE Moran's I between two point populations'
    tile densities — "are X's hotspots near Y's hotspots?" (queen
    weights, cells = union of tiles occupied by either set, the
    missing side counting 0). ONE row ``(n_cells, w_pairs,
    moran_xy)``.

    Exactness: with Sx, Sy, SX2, SY2 the exact per-cell count sums,
    P = Σ_w x_i·y_j and Qx = Σ_w x_i, Qy = Σ_w y_j over ordered
    neighbor pairs, the N² factors cancel to

        I_xy = (N²·P − N·Sy·Qx − N·Sx·Qy + W·Sx·Sy)
               / (W · sqrt((N·SX2 − Sx²) · (N·SY2 − Sy²)))

    — integer numerator and radicand in arbitrary-precision Python
    ints, then ONE sqrt and ONE division in the same shape as the SQL
    twin (HUGEINT sums, CAST-to-DOUBLE) — bitwise-equal.

    Scale shape: each side collapses to its exact occupied-tile count
    table (per-batch distinct-cell partials + ONE bucketed fold); the
    two tile tables are parameter-sized (≤ 4^res), so the union join,
    neighbor expansion and moment fold run on the driver.
    """
    import math

    import numpy as np
    import ray

    from ..functions.buckets import bucket_of  # noqa: F401  (parity w/ siblings)
    from .merge import bucketed_sum

    g = 1 << res

    def count_fold(points: Dataset) -> dict[int, int]:
        def partial(tbl: pa.Table) -> pa.Table:
            px = st.col_np(tbl, "px")
            py = st.col_np(tbl, "py")
            c, n = np.unique(
                cellmod.cell_of_points(px, py, res), return_counts=True
            )
            return pa.table({"cell": c, "x": n.astype(np.int64)})

        rows = bucketed_sum(
            points.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=COMBINE_BATCH,
            ),
            key_col="cell",
            value_cols=("x",),
        ).take_all()
        return {int(r["cell"]): int(r["x"]) for r in rows}

    xs = count_fold(points_x)
    ys = count_fold(points_y)
    cells = np.array(sorted(set(xs) | set(ys)), np.int64)
    if cells.size == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_cells": pa.array([0], pa.int64()),
                    "w_pairs": pa.array([0], pa.int64()),
                    "moran_xy": pa.array([None], pa.float64()),
                }
            )
        )
    x = np.array([xs.get(int(c), 0) for c in cells], np.int64)
    y = np.array([ys.get(int(c), 0) for c in cells], np.int64)
    N = int(cells.size)
    Sx, Sy = int(x.sum()), int(y.sum())
    SX2, SY2 = int((x * x).sum()), int((y * y).sum())
    # ordered queen-neighbor pairs over the union cell set
    ix, iy = cells // g, cells % g
    W = 0
    P = Qx = Qy = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nxc = ix + dx
            nyc = iy + dy
            ok = (nxc >= 0) & (nxc < g) & (nyc >= 0) & (nyc < g)
            tgt = nxc * g + nyc
            if cells.size == 0:
                continue
            pos = np.searchsorted(cells, tgt)
            hit = ok & (pos < cells.size) & (
                cells[np.minimum(pos, cells.size - 1)] == tgt
            )
            j = np.minimum(pos, cells.size - 1)[hit]
            i = np.nonzero(hit)[0]
            W += int(i.size)
            P += int((x[i] * y[j]).sum())
            Qx += int(x[i].sum())
            Qy += int(y[j].sum())
    num = N * N * P - N * Sy * Qx - N * Sx * Qy + W * Sx * Sy
    d1 = N * SX2 - Sx * Sx
    d2 = N * SY2 - Sy * Sy
    val = (
        float(num) / (float(W) * math.sqrt(float(d1 * d2)))
        if W and d1 > 0 and d2 > 0
        else None
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([N], pa.int64()),
                "w_pairs": pa.array([W], pa.int64()),
                "moran_xy": pa.array([val], pa.float64()),
            }
        )
    )


def bivariate_moran_sql(cte_x: str, cte_y: str, res: int) -> str:
    """DuckDB twin of :func:`bivariate_moran` — HUGEINT-exact sums,
    ONE SQRT and ONE division in the identical shape."""
    ix = derive.tile_index_sql("px", res)
    iy = derive.tile_index_sql("py", res)
    return f"""
WITH p1 AS ({cte_x}), p2 AS ({cte_y}),
cx AS (SELECT {ix} AS ix, {iy} AS iy, CAST(COUNT(*) AS BIGINT) AS x
       FROM p1 GROUP BY 1, 2),
cy AS (SELECT {ix} AS ix, {iy} AS iy, CAST(COUNT(*) AS BIGINT) AS y
       FROM p2 GROUP BY 1, 2),
c AS (SELECT COALESCE(cx.ix, cy.ix) AS ix, COALESCE(cx.iy, cy.iy) AS iy,
             COALESCE(cx.x, 0) AS x, COALESCE(cy.y, 0) AS y
      FROM cx FULL JOIN cy ON cx.ix = cy.ix AND cx.iy = cy.iy),
gsum AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                CAST(SUM(x) AS HUGEINT) AS sx,
                CAST(SUM(y) AS HUGEINT) AS sy,
                CAST(SUM(x * x) AS HUGEINT) AS sx2,
                CAST(SUM(y * y) AS HUGEINT) AS sy2 FROM c),
e AS (SELECT CAST(COUNT(*) AS HUGEINT) AS w,
             CAST(COALESCE(SUM(a.x * b.y), 0) AS HUGEINT) AS p,
             CAST(COALESCE(SUM(a.x), 0) AS HUGEINT) AS qx,
             CAST(COALESCE(SUM(b.y), 0) AS HUGEINT) AS qy
      FROM c a JOIN c b
      ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1
         AND NOT (a.ix = b.ix AND a.iy = b.iy))
SELECT CAST(gsum.n AS BIGINT) AS n_cells,
       CAST(e.w AS BIGINT) AS w_pairs,
       CAST(gsum.n * gsum.n * e.p - gsum.n * gsum.sy * e.qx
            - gsum.n * gsum.sx * e.qy + e.w * gsum.sx * gsum.sy AS DOUBLE)
       / (CAST(e.w AS DOUBLE)
          * SQRT(CAST((gsum.n * gsum.sx2 - gsum.sx * gsum.sx)
                      * (gsum.n * gsum.sy2 - gsum.sy * gsum.sy) AS DOUBLE)))
       AS moran_xy
FROM gsum, e
"""
