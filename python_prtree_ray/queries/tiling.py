"""tiling query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    BFS_HOPS,
    RASTER_MIN,
    TILE_QRES,
    TILE_RES,
    VOR_K,
    _event_tracks,
    _isin_sorted,
    _seed_sites,
    _seeds_cte,
    _tile_distance_sql,
    _tile_kcore_sql,
    _tile_pagerank_sql,
    derive,
    tables,
    tiling,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _flow_accumulation_sql,
    _flow_direction_sql,
    _gravity_access_sql,
    _grid_bfs_sql,
    _hilbert_locality_sql,
    _hilbert_ranges_sql,
    _raster_regions_sql,
    _tile_buffer_sql,
    _tile_distinct_users_sql,
    _tile_focal_mean_sql,
    _tile_geohash_sql,
    _tile_gini_sql,
    _tile_hilbert_sql,
    _tile_majority_sql,
    _tile_rank_corr_sql,
    _tile_simpson_sql,
    _tile_turnover_sql,
    _voronoi_assign_sql,
    _watershed_sizes_sql,
    g,
    hex_bin_sql_q,
    ix,
    iy,
    p_cust,
    tile_cover_sql,
    tile_extent_sql,
    tile_points_sql,
    tile_pyramid_sql,
    tile_quadkey_sql,
    tile_quantiles_sql,
    tile_topk_sql,
)



def q_tile_points(sf):
    return tiling.tile_points(tables.points_dataset(sf), res=TILE_RES)



def q_tile_cover(sf):
    return tiling.tile_cover(tables.boxes_dataset(sf), res=TILE_RES)



def q_tile_extent(sf):
    # per-tile count + envelope of overlapping boxes (zonal raster
    # statistics over the procedural tile grid)
    return tiling.tile_extent(tables.boxes_dataset(sf), res=TILE_RES)



def q_tile_topk(sf):
    # top-k POIs per map tile by derived score: map-side per-cell
    # prune (k rows per cell per batch), ONE coarse cell shuffle
    return tiling.tile_topk(tables.points_dataset(sf), res=TILE_RES, k=3)



def q_tile_quadkey(sf):
    # H3/S2-style string tile tokens (Bing quadkeys): stateless map,
    # int64 digit math + Arrow cast/lpad — SQL twin exact
    return tiling.tile_quadkey(tables.points_dataset(sf), res=TILE_RES)



def q_tile_hilbert(sf):
    # Hilbert space-filling-curve tile keys — the locality-
    # preserving range-partition key (consecutive indices are always
    # 4-neighbor cells); pure int64 bit math, stateless map
    return tiling.tile_hilbert(tables.points_dataset(sf), res=TILE_RES)



def q_hilbert_ranges(sf):
    # range-partition planner: n_parts contiguous Hilbert ranges
    # with near-equal counts; points never shuffle, the occupied-
    # tile count table folds once
    return tiling.hilbert_ranges(
        tables.points_dataset(sf), res=TILE_RES, n_parts=8
    )



def q_tile_quantiles(sf):
    # exact per-tile R-7 quantiles of the integer point measure;
    # shuffle bounded by (cell, value) cardinality, not points
    return tiling.tile_quantiles(
        tables.points_dataset(sf), res=TILE_QRES
    )



def q_hex_bin(sf):
    # H3-style hex binning: axial cube-rounded (q, r) hex cells
    # over customer points — per-batch unique fold on a packed
    # key, ONE coarse bucket-sum; the alternative tiling system to
    # the square quadkey grid (same FLOOR(v+0.5) rule both sides)
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import hex_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    OFF = np.int64(1 << 20)
    M = np.int64(1 << 21)
    pts = tables.points_dataset(sf)

    def partial(tbl: pa.Table) -> pa.Table:
        px = tbl.column("px").to_numpy(zero_copy_only=False)
        py = tbl.column("py").to_numpy(zero_copy_only=False)
        q, r = hex_of_points(px, py)
        key, n = np.unique((q + OFF) * M + (r + OFF), return_counts=True)
        return pa.table({"key": key, "n_points": n.astype(np.int64)})

    summed = bucketed_sum(
        pts.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="key",
        value_cols=("n_points",),
    )

    def unpack(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hq": key // M - OFF,
                "hr": key % M - OFF,
                "n_points": tbl.column("n_points"),
            }
        )

    return summed.map_batches(
        unpack, batch_format="pyarrow", zero_copy_batch=True
    )



def q_class_adjacency(sf):
    # spatial-Markov class adjacency: density-quartile class per
    # occupied tile (int > double threshold compares), rook-neighbor
    # unordered class-pair counts over the compact raster
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.quantiles import _interp_quantiles

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    g = 1 << TILE_RES

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)

    def partial(tbl: pa.Table) -> pa.Table:
        from python_prtree_ray.functions.cells import cell_of_points

        c, n = np.unique(
            cell_of_points(
                tbl.column("px").to_numpy(zero_copy_only=False),
                tbl.column("py").to_numpy(zero_copy_only=False),
                TILE_RES,
            ),
            return_counts=True,
        )
        return pa.table({"cell": c, "n": n.astype(np.int64)})

    tiles = bucketed_sum(
        pts.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("n",),
    ).take_all()  # occupied-tile metadata
    cells = np.array([r["cell"] for r in tiles], np.int64)
    counts = np.array([r["n"] for r in tiles], np.int64)
    order = np.argsort(counts)
    vals, inv_c = np.unique(counts[order], return_counts=True)
    t1, t2, t3 = _interp_quantiles(vals, inv_c, [0.25, 0.5, 0.75])
    cls = (
        (counts > t1).astype(np.int64)
        + (counts > t2).astype(np.int64)
        + (counts > t3).astype(np.int64)
    )
    grid = np.full((g, g), -1, np.int64)
    grid[cells // g, cells % g] = cls
    # rook pairs counted once: east and north neighbors
    pa_l, pb_l = [], []
    east_a, east_b = grid[:-1, :], grid[1:, :]
    m = (east_a >= 0) & (east_b >= 0)
    pa_l.append(east_a[m])
    pb_l.append(east_b[m])
    north_a, north_b = grid[:, :-1], grid[:, 1:]
    m = (north_a >= 0) & (north_b >= 0)
    pa_l.append(north_a[m])
    pb_l.append(north_b[m])
    a = np.concatenate(pa_l)
    b = np.concatenate(pb_l)
    lo_c = np.minimum(a, b)
    hi_c = np.maximum(a, b)
    key, n = np.unique(lo_c * 4 + hi_c, return_counts=True)
    return ray.data.from_arrow(
        pa.table(
            {
                "class_a": key // 4,
                "class_b": key % 4,
                "n_pairs": n.astype(np.int64),
            }
        )
    )



def q_tile_pyramid(sf):
    # multi-resolution tile-count pyramid (zoom levels TILE_RES..0):
    # one map pass emits pre-combined counts for ALL levels, one
    # coarse-bucket shuffle sums them
    return tiling.tile_pyramid(tables.points_dataset(sf), res=TILE_RES)



def q_hotspot_cells(sf):
    # 3x3 focal-sum point density (raster hotspot smoothing): tile
    # counts + neighbor contributions, one coarse-bucket shuffle
    return tiling.hotspot_cells(tables.points_dataset(sf), res=TILE_RES)



def q_tile_neighbors(sf):
    # occupied-cell adjacency (binary-occupancy complement of
    # hotspot_cells): distinct cells -> <=8 offers each -> count
    # offers landing on occupied cells; two cell-sized shuffles
    return tiling.tile_neighbors(tables.points_dataset(sf), res=TILE_RES)



def q_tile_top_visitor(sf):
    # dominant visitor per tile ((n DESC, user ASC) argmax) via
    # packed (cell, user) counts + k=1 grouped top-k
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum, grouped_topk

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )
    g2 = np.int64(1 << TILE_QRES) ** 2
    USER_BITS = 22  # user ids < 2^22 at any test sf; pack guard below

    def partial(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        cell = cell_of_points(p["px"], p["py"], TILE_QRES)
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if u.size and u.max() >= (1 << USER_BITS):
            raise ValueError("tile_top_visitor: user id exceeds pack")
        key, n = np.unique(cell * (1 << USER_BITS) + u, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    summed = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="key",
        value_cols=("n",),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": key >> USER_BITS,
                "user_id": key & ((1 << USER_BITS) - 1),
                "n": tbl.column("n"),
            }
        )

    return grouped_topk(
        summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True),
        k=1,
        key_col="cell",
        id_col="user_id",
        value_col="n",
        descending=True,
    ).select_columns(["cell", "user_id", "n"])



def q_hilbert_locality(sf):
    # SFC quality metric: exact mean Hilbert-index gap across
    # rook-adjacent occupied tiles — the statistic behind
    # hilbert_ranges partitioning
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.hilbert_locality(pts, res=TILE_RES)



def q_hotspot_coverage(sf):
    # hotspot concentration: share of all events inside the top-10
    # densest tiles — tile counts fold, tiny driver sort, one division
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    K = 10
    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        c, n = np.unique(
            cell_of_points(p["px"], p["py"], TILE_RES), return_counts=True
        )
        return pa.table({"cell": c, "n": n.astype(np.int64)})

    tiles = bucketed_sum(
        ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("n",),
    ).take_all()  # tile-sized metadata
    n = np.array([r["n"] for r in tiles], np.int64)
    cell = np.array([r["cell"] for r in tiles], np.int64)
    order = np.lexsort((cell, -n))[:K]  # (n DESC, cell ASC) top-K
    topk = int(n[order].sum())
    total = int(n.sum())
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([K], pa.int64()),
                "topk_events": pa.array([topk], pa.int64()),
                "total_events": pa.array([total], pa.int64()),
                "coverage": pa.array(
                    [float(topk) / float(total) if total else None],
                    pa.float64(),
                ),
            }
        )
    )



def q_value_hotspots(sf):
    # value-WEIGHTED focal raster: per non-empty tile, its event
    # value sum plus the 3x3 focal value sum (the money-heatmap
    # variant of hotspot_cells) — exact int cents end to end
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points, neighbor_cells
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "value"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        cell = cell_of_points(p["px"], p["py"], TILE_RES)
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(cell, kind="stable")
        c_s = cell[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        c_u = c_s[starts]
        v = np.add.reduceat(cents[order], starts)
        row, nb = neighbor_cells(c_u, TILE_RES, ring=1)
        return pa.table(
            {
                "cell": np.concatenate([c_u, nb]),
                "value_cents": np.concatenate(
                    [v, np.zeros(nb.size, np.int64)]
                ),
                "focal_cents": np.concatenate(
                    [np.zeros(c_u.size, np.int64), v[row]]
                ),
            }
        )

    summed = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("value_cents", "focal_cents"),
    )

    def nonempty(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tbl.filter(pc.not_equal(tbl.column("value_cents"), 0))

    return summed.map_batches(
        nonempty, batch_format="pyarrow", zero_copy_batch=True
    )



def q_tile_occupancy_curve(sf):
    # multi-resolution occupancy profile: distinct occupied tiles
    # per level 0..TILE_RES — ONE finest-level dedup fold, parents
    # derived by shifting on the driver (tile-sized metadata)
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    g = 1 << TILE_RES

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        c = np.unique(cell_of_points(p["px"], p["py"], TILE_RES))
        return pa.table({"cell": c, "one": np.ones(c.size, np.int64)})

    tiles = bucketed_sum(
        ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("one",),
    ).take_all()  # finest-level occupied set: tile-sized metadata
    cell = np.array([r["cell"] for r in tiles], np.int64)
    ix, iy = cell // g, cell % g
    out_l, out_n = [], []
    for l in range(TILE_RES + 1):
        sh = TILE_RES - l
        occ = np.unique((ix >> sh) * (1 << l) + (iy >> sh))
        out_l.append(l)
        out_n.append(int(occ.size))
    return ray.data.from_arrow(
        pa.table(
            {
                "level": pa.array(out_l, pa.int64()),
                "n_occupied": pa.array(out_n, pa.int64()),
            }
        )
    )



def q_tile_boundary(sf):
    # morphological boundary extraction: occupied tiles with at
    # least one empty queen neighbor (in-grid neighborhood) —
    # occupied-set fold + compact-raster neighbor popcount
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    g = 1 << TILE_RES

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        # squared coords concentrate mass -> real empty space exists
        c = np.unique(
            cell_of_points(p["px"] * p["px"], p["py"] * p["py"], TILE_RES)
        )
        return pa.table({"cell": c, "one": np.ones(c.size, np.int64)})

    tiles = bucketed_sum(
        ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("one",),
    )

    def add_k(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "k", pa.array(np.zeros(tbl.num_rows, np.int64))
        )

    def boundary(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        if cell.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n_occ_neighbors": pa.array([], pa.int64()),
                }
            )
        occ = np.zeros((g, g), bool)
        occ[cell // g, cell % g] = True
        cnt = np.zeros((g, g), np.int64)
        nbr = np.zeros((g, g), np.int64)  # in-grid neighborhood size
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sx0, sx1 = max(dx, 0), g + min(dx, 0)
                sy0, sy1 = max(dy, 0), g + min(dy, 0)
                cnt[sx0:sx1, sy0:sy1] += occ[
                    sx0 - dx : sx1 - dx, sy0 - dy : sy1 - dy
                ]
                nbr[sx0:sx1, sy0:sy1] += 1
        ix, iy = cell // g, cell % g
        is_b = cnt[ix, iy] < nbr[ix, iy]
        return pa.table(
            {
                "cell": cell[is_b],
                "n_occ_neighbors": cnt[ix, iy][is_b],
            }
        )

    return (
        tiles.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(boundary, batch_format="pyarrow")
        .select_columns(["cell", "n_occ_neighbors"])
    )



def q_seed_catchment(sf):
    # facility catchment: exact event counts within Chebyshev
    # distance <= 3 tiles of each seed site (occupied-tile fold ×
    # metadata seeds, integer distances)
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    D = 3
    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    g = 1 << TILE_RES
    sid, sx, sy = _seed_sites(sf, VOR_K, TILE_RES)

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        c, n = np.unique(
            cell_of_points(p["px"], p["py"], TILE_RES), return_counts=True
        )
        return pa.table({"cell": c, "n": n.astype(np.int64)})

    tiles = bucketed_sum(
        ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("n",),
    )

    def catch(tbl: pa.Table) -> pa.Table:
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        ix = cell // g
        iy = cell % g
        out_s, out_n = [], []
        for s, x, y in zip(sid, sx, sy):
            m = (np.abs(ix - x) <= D) & (np.abs(iy - y) <= D)
            out_s.append(np.int64(s))
            out_n.append(np.int64(n[m].sum()))
        return pa.table(
            {
                "seed": np.array(out_s, np.int64),
                "n_points": np.array(out_n, np.int64),
            }
        )

    partials = tiles.map_batches(
        catch, batch_format="pyarrow", zero_copy_batch=True
    )
    summed = bucketed_sum(partials, key_col="seed", value_cols=("n_points",))

    def nonzero(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # empty catchments drop, matching the SQL inner join
        return tbl.filter(pc.greater(tbl.column("n_points"), 0))

    return summed.map_batches(
        nonzero, batch_format="pyarrow", zero_copy_batch=True
    )



def q_raster_regions(sf):
    # raster->vector segmentation: threshold the density raster of
    # SQUARED event coordinates (squaring concentrates mass near the
    # origin so thresholded regions actually form), label connected
    # components, emit one exact-int vector row per region
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"] * p["px"], "py": p["py"] * p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.raster_regions(pts, res=TILE_RES, min_count=RASTER_MIN)



def q_tile_geohash(sf):
    # base32 geohash interop tokens (x-first bit interleave, 5 bits
    # per char): pure int64 bit math + fixed-width string gather
    return tiling.tile_geohash(tables.points_dataset(sf), nchars=6)



def q_tile_users(sf):
    # exact distinct-visitor count per tile: distinct (cell, user)
    # pair partials -> ONE cell-bucket fold; raw events never shuffle
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "px": p["px"],
                "py": p["py"],
            }
        )

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_distinct_users(pts, res=TILE_RES)



def q_tile_buffer(sf):
    # buffer/proximity raster (bounded Chebyshev distance
    # transform): one offer shuffle + min fold, exact ints
    return tiling.tile_buffer(
        tables.points_dataset(sf), res=TILE_RES, max_d=2
    )



def q_tile_gini(sf):
    # spatial-concentration Gini of occupied-tile densities over
    # the denser event-point grid: exact-int rank-weighted sum,
    # ONE double division
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_gini(pts, res=TILE_RES)



def q_tile_majority(sf):
    # zonal mode: dominant event_type per tile, (n DESC, cls ASC)
    # tie order; per-batch (cell, class) partials, one bucket fold
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type"]
    )

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {"px": p["px"], "py": p["py"], "cls": tbl.column("event_type")}
        )

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_majority(pts, res=TILE_RES)



def q_tile_simpson(sf):
    # zonal class-mixing: Simpson diversity of event types per tile
    # (log-free entropy analog) — exact int num/den, ONE division
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type"]
    )

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {"px": p["px"], "py": p["py"], "cls": tbl.column("event_type")}
        )

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_simpson(pts, res=TILE_RES)



def q_voronoi_assign(sf):
    # discrete Voronoi / Thiessen rasterization: occupied tiles ->
    # nearest of VOR_K seed sites by exact int grid distance
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    sid, sx, sy = _seed_sites(sf, VOR_K, TILE_RES)
    return tiling.voronoi_assign(pts, sid, sx, sy, res=TILE_RES)



def q_voronoi_cost(sf):
    # k-median assignment cost per facility: fold of the Voronoi
    # rasterization — (seed, n_tiles, n_points, cost=Σ n·d2), all
    # exact ints (the objective a facility-location loop would track)
    import pyarrow as pa
    from python_prtree_ray.pipelines.merge import bucketed_sum

    assigned = q_voronoi_assign(sf)

    def partial(tbl: pa.Table) -> pa.Table:
        s = tbl.column("seed").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        d2 = tbl.column("d2").to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s_s, n_s, c_s = s[order], n[order], (n * d2)[order]
        starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]][: s_s.size])
        return pa.table(
            {
                "seed": s_s[starts],
                "n_tiles": np.diff(np.r_[starts, s_s.size]).astype(np.int64),
                "n_points": np.add.reduceat(n_s, starts)
                if s_s.size
                else np.zeros(0, np.int64),
                "cost": np.add.reduceat(c_s, starts)
                if s_s.size
                else np.zeros(0, np.int64),
            }
        )

    return bucketed_sum(
        assigned.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="seed",
        value_cols=("n_tiles", "n_points", "cost"),
    )



def q_tile_rank_corr(sf):
    # Spearman rank agreement between tile density and visitor
    # diversity (deterministic tie order); tile-sized final fold
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "px": p["px"],
                "py": p["py"],
            }
        )

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_rank_corr(pts, res=TILE_RES)



def q_gravity_access(sf):
    # gravity accessibility surface: per occupied tile, summed
    # floored inverse-distance attraction of the VOR_K facilities
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    sid, sx, sy = _seed_sites(sf, VOR_K, TILE_RES)
    return tiling.gravity_access(pts, sid, sx, sy, res=TILE_RES)



def q_tile_density_rank(sf):
    # rank enrichment at tile level: each occupied tile's exact
    # percent_rank by density — tile-sized histogram broadcast,
    # (count of strictly denser-below)/(T−1), one division per tile
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)

    def partial(tbl: pa.Table) -> pa.Table:
        from python_prtree_ray.functions.cells import cell_of_points

        c, n = np.unique(
            cell_of_points(
                tbl.column("px").to_numpy(zero_copy_only=False),
                tbl.column("py").to_numpy(zero_copy_only=False),
                TILE_RES,
            ),
            return_counts=True,
        )
        return pa.table({"cell": c, "n": n.astype(np.int64)})

    tiles = bucketed_sum(
        pts.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("n",),
    )
    # density histogram (tile-sized metadata) -> cum smaller counts
    hist = {}
    for ref in tiles.to_arrow_refs():
        t = ray.get(ref)
        for v, c in zip(
            t.column("n").to_pylist(), [1] * t.num_rows
        ):
            hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), np.int64)
    cnts = np.array([hist[int(v)] for v in vals], np.int64)
    smaller = np.r_[np.int64(0), np.cumsum(cnts)[:-1]]
    T = int(cnts.sum())
    ref_h = ray.put((vals, smaller, T))

    def rank(tbl: pa.Table) -> pa.Table:
        v, sm, tt = ray.get(ref_h)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v, n)
        pct = sm[pos].astype(np.float64) / np.float64(tt - 1)
        return pa.table(
            {"cell": tbl.column("cell"), "n": tbl.column("n"), "pct": pct}
        )

    return tiles.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)



def q_tile_turnover(sf):
    # per-tile visitor churn: early/late visitor-set Jaccard at the
    # stream midpoint — distinct (cell, user, half-bit) fold
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts": tbl.column("ts"),
                "px": p["px"],
                "py": p["py"],
            }
        )

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_turnover(pts, res=TILE_QRES)



def q_tile_peak_hour(sf):
    # dominant hour-of-day per tile ((n DESC, hour ASC) argmax):
    # packed (cell·24+hour) count partials, ONE sum, k=1 top-k
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum, grouped_topk

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "ts"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        cell = cell_of_points(p["px"], p["py"], TILE_QRES)
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        hour = (us % 86_400_000_000) // 3_600_000_000
        key, n = np.unique(cell * 24 + hour, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    summed = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="key",
        value_cols=("n",),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": key // 24,
                "hour": key % 24,
                "n": tbl.column("n"),
            }
        )

    return grouped_topk(
        summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True),
        k=1,
        key_col="cell",
        id_col="hour",
        value_col="n",
        descending=True,
    ).select_columns(["cell", "hour", "n"])



def q_grid_bfs(sf):
    # multi-source BFS isochrone over the occupied-tile graph:
    # exact hop distance from VOR_K seed tiles, <= BFS_HOPS steps
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    _, sx, sy = _seed_sites(sf, VOR_K, TILE_RES)
    return tiling.grid_bfs(pts, sx, sy, res=TILE_RES, max_hops=BFS_HOPS)



def q_tile_focal_mean(sf):
    # 3x3 focal mean of the event-density raster: exact counts +
    # ONE neighborhood-offer shuffle, one division per tile
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.tile_focal_mean(pts, res=TILE_RES)



def q_flow_direction(sf):
    # D8 steepest-descent flow routing over the event-density
    # raster: exact tile counts + ONE neighbor-offer shuffle,
    # all-integer argmin per tile
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.flow_direction(pts, res=TILE_RES)



def q_flow_accumulation(sf):
    # D8 flow accumulation + watershed assignment: streaming tile
    # counts + one neighbor-offer shuffle; the flow DAG itself is
    # parameter-sized, so upstream sums fold on the driver
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.flow_accumulation(pts, res=TILE_RES)



def q_watershed_sizes(sf):
    # drainage-basin rollup: occupied tiles + point mass draining
    # to each D8 sink
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.watershed_sizes(pts, res=TILE_RES)



def q_tile_pagerank(sf):
    # integer-exact damped PageRank over the tile flow graph: the
    # corpus-scale work is the od-edge fold (one user-bucket shuffle
    # of int codes); the tile graph itself is parameter-sized
    # (<= 4^res nodes), so the K iterations run driver-side in
    # exact int64 arithmetic with an explicit floor at every
    # division — the same truncation sequence the unrolled SQL twin
    # performs, making an ITERATIVE graph algorithm value-hash
    # checkable. Mass bound: ranks sum to <= SCALE, so
    # r*w < 2^63 needs max edge weight < 9.2e6 (holds to ~sf100).
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.movement import od_matrix

    edges = od_matrix(_event_tracks(sf, TILE_RES), res=TILE_RES).take_all()
    S = 10**12
    K = 10
    frm = np.array([r["from_cell"] for r in edges], np.int64)
    to = np.array([r["to_cell"] for r in edges], np.int64)
    w = np.array([r["n_moves"] for r in edges], np.int64)
    nodes = np.unique(np.concatenate([frm, to]))
    n = nodes.size
    if n == 0:  # no moves at all (SQL twin: empty nodes CTE)
        return ray.data.from_arrow(
            pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "rank_s": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )
    fi = np.searchsorted(nodes, frm)
    ti = np.searchsorted(nodes, to)
    wout = np.zeros(n, np.int64)
    np.add.at(wout, fi, w)
    teleport = (15 * S) // (100 * n)
    r = np.full(n, S // n, np.int64)
    for _ in range(K):
        contrib = (r[fi] * w) // wout[fi]
        infl = np.zeros(n, np.int64)
        np.add.at(infl, ti, contrib)
        r = teleport + (85 * infl) // 100
    return ray.data.from_arrow(
        pa.table(
            {
                "cell": nodes,
                "rank_s": r,
                "rank": pa.array(
                    r.astype(np.float64) / np.float64(S), pa.float64()
                ),
            }
        )
    )



def q_tile_kcore(sf):
    # k-core decomposition of the occupied-tile 8-neighborhood
    # graph: 10 fixed peeling rounds (tiles with < K alive
    # neighbors drop) — all-integer, so the unrolled SQL twin
    # value-hashes. Corpus-scale work is the occupancy fold; the
    # peel runs driver-side on the parameter-sized tile set.
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    # k=8 demands the FULL 8-ring: on a saturated grid each round
    # peels exactly the outer boundary ring, so 10 rounds produce a
    # genuine 10-deep erosion wavefront (k<=3 is degenerate at the
    # wired scales: sparse grids die instantly, dense ones never peel)
    KCORE = 8
    ROUNDS = 10
    g = np.int64(1 << TILE_RES)
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id"]
    )

    def geo(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        c = np.unique(cell_of_points(p["px"], p["py"], TILE_RES))
        return pa.table({"cell": c, "one": np.ones(c.size, np.int64)})

    occ_rows = bucketed_sum(
        ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("one",),
    ).take_all()  # occupied-tile set: parameter-sized (<= 4^res)
    alive = np.unique(np.array([r["cell"] for r in occ_rows], np.int64))
    offs = [
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    ]

    def degrees(cells: np.ndarray) -> np.ndarray:
        ix, iy = cells // g, cells % g
        d = np.zeros(cells.size, np.int64)
        for dx, dy in offs:
            nx, ny = ix + dx, iy + dy
            ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
            d += ok & _isin_sorted(cells, nx * g + ny)
        return d

    for _ in range(ROUNDS):
        if alive.size == 0:
            break
        deg = degrees(alive)
        keep = deg >= KCORE
        if keep.all():
            break
        alive = alive[keep]
    deg = degrees(alive) if alive.size else np.zeros(0, np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "cell": pa.array(alive, pa.int64()),
                "degree": pa.array(deg, pa.int64()),
            }
        )
    )



def q_tile_distance(sf):
    # Chebyshev distance transform on the tile raster: BFS rings
    # from the PEAK-count tiles (count == global max — the derived
    # points are equidistributed, so any fixed threshold is
    # degenerate at some scale; argmax is scale-relative and
    # exactly SQL-expressible) over the 8-neighborhood, 10 unrolled
    # rounds, unreached occupied tiles -> -1. Corpus work is the
    # count fold; the wavefront runs driver-side on the
    # parameter-sized tile set — same all-integer unrolled-CTE
    # oracle pattern as tile_kcore.
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ROUNDS = 10
    g = np.int64(1 << TILE_RES)
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id"]
    )

    def geo(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        c, n = np.unique(
            cell_of_points(p["px"], p["py"], TILE_RES),
            return_counts=True,
        )
        return pa.table({"cell": c, "x": n.astype(np.int64)})

    rows = bucketed_sum(
        ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("x",),
    ).take_all()  # occupied-tile counts: parameter-sized
    cells = np.array([r["cell"] for r in rows], np.int64)
    cnt = np.array([r["x"] for r in rows], np.int64)
    order = np.argsort(cells)
    cells, cnt = cells[order], cnt[order]
    dist = np.full(cells.size, np.int64(-1))
    is_src = cnt == cnt.max() if cnt.size else np.zeros(0, np.bool_)
    frontier = cells[is_src]
    dist[is_src] = 0
    offs = [
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    ]
    for d in range(1, ROUNDS + 1):
        if frontier.size == 0:
            break
        ix, iy = frontier // g, frontier % g
        nbr = []
        for dx, dy in offs:
            nx, ny = ix + dx, iy + dy
            ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
            nbr.append((nx[ok] * g + ny[ok]))
        cand = np.unique(np.concatenate(nbr)) if nbr else np.zeros(0, np.int64)
        pos = np.searchsorted(cells, cand)
        hit = _isin_sorted(cells, cand)
        idx = pos[hit]
        fresh = idx[dist[idx] == -1]
        dist[fresh] = d
        frontier = cells[fresh]
    return ray.data.from_arrow(
        pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )
    )


QUERIES = {
    "tile_points": q_tile_points,
    "tile_cover": q_tile_cover,
    "tile_extent": q_tile_extent,
    "tile_topk": q_tile_topk,
    "tile_quadkey": q_tile_quadkey,
    "tile_hilbert": q_tile_hilbert,
    "hilbert_ranges": q_hilbert_ranges,
    "tile_quantiles": q_tile_quantiles,
    "hex_bin": q_hex_bin,
    "class_adjacency": q_class_adjacency,
    "tile_pyramid": q_tile_pyramid,
    "hotspot_cells": q_hotspot_cells,
    "tile_neighbors": q_tile_neighbors,
    "tile_top_visitor": q_tile_top_visitor,
    "hilbert_locality": q_hilbert_locality,
    "hotspot_coverage": q_hotspot_coverage,
    "value_hotspots": q_value_hotspots,
    "tile_occupancy_curve": q_tile_occupancy_curve,
    "tile_boundary": q_tile_boundary,
    "seed_catchment": q_seed_catchment,
    "raster_regions": q_raster_regions,
    "tile_geohash": q_tile_geohash,
    "tile_users": q_tile_users,
    "tile_buffer": q_tile_buffer,
    "tile_gini": q_tile_gini,
    "tile_majority": q_tile_majority,
    "tile_simpson": q_tile_simpson,
    "voronoi_assign": q_voronoi_assign,
    "voronoi_cost": q_voronoi_cost,
    "tile_rank_corr": q_tile_rank_corr,
    "gravity_access": q_gravity_access,
    "tile_density_rank": q_tile_density_rank,
    "tile_turnover": q_tile_turnover,
    "tile_peak_hour": q_tile_peak_hour,
    "grid_bfs": q_grid_bfs,
    "tile_focal_mean": q_tile_focal_mean,
    "flow_direction": q_flow_direction,
    "flow_accumulation": q_flow_accumulation,
    "watershed_sizes": q_watershed_sizes,
    "tile_pagerank": q_tile_pagerank,
    "tile_kcore": q_tile_kcore,
    "tile_distance": q_tile_distance,
}

SQL = {
    "tile_points": tile_points_sql,
    "tile_cover": tile_cover_sql,
    "tile_extent": tile_extent_sql,
    "tile_topk": tile_topk_sql,
    "tile_quadkey": tile_quadkey_sql,
    "tile_hilbert": _tile_hilbert_sql(p_cust, TILE_RES),
    "hilbert_ranges": _hilbert_ranges_sql(p_cust, TILE_RES, 8),
    "tile_quantiles": tile_quantiles_sql,
    "hex_bin": hex_bin_sql_q,
    "tile_pyramid": tile_pyramid_sql,
    "tile_neighbors": f"""
WITH p AS ({p_cust}),
occ AS (SELECT DISTINCT {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell FROM p),
c AS (SELECT cell, cell // {g} AS cx, cell % {g} AS cy FROM occ),
off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                              (1,-1),(1,0),(1,1)) AS t(dx, dy))
SELECT a.cell AS cell, CAST(COUNT(b.cell) AS BIGINT) AS n_neighbors
FROM c a CROSS JOIN off
LEFT JOIN c b ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy
GROUP BY a.cell
""",
    "hotspot_cells": f"""
WITH p AS ({p_cust}),
cnt AS (
  SELECT {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY cell
),
dec AS (SELECT cell, n, cell // {g} AS cx, cell % {g} AS cy FROM cnt),
off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                              (1,-1),(1,0),(1,1)) AS t(dx, dy)),
foc AS (
  SELECT (cx + dx) * {g} + (cy + dy) AS cell, n
  FROM dec CROSS JOIN off
  WHERE cx + dx BETWEEN 0 AND {g - 1} AND cy + dy BETWEEN 0 AND {g - 1}
),
fs AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS focal_sum FROM foc GROUP BY cell)
SELECT c.cell AS cell, c.n AS n_points, f.focal_sum AS focal_sum
FROM cnt c JOIN fs f USING (cell)
""",
    "class_adjacency": (
        "WITH p0 AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), t AS (SELECT "
        + derive.tile_cell_sql("px", "py", TILE_RES)
        + " AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM p0 GROUP BY 1), "
        "m AS (SELECT quantile_cont(n, 0.25) AS t1, "
        "quantile_cont(n, 0.5) AS t2, quantile_cont(n, 0.75) AS t3 "
        "FROM t), "
        f"c AS (SELECT cell // {1 << TILE_RES} AS ix, "
        f"cell % {1 << TILE_RES} AS iy, "
        "(CASE WHEN n > m.t1 THEN 1 ELSE 0 END + "
        "CASE WHEN n > m.t2 THEN 1 ELSE 0 END + "
        "CASE WHEN n > m.t3 THEN 1 ELSE 0 END) AS cls FROM t, m), "
        "e AS (SELECT a.cls AS ca, b.cls AS cb FROM c a JOIN c b ON "
        "(b.ix = a.ix + 1 AND b.iy = a.iy) OR "
        "(b.ix = a.ix AND b.iy = a.iy + 1)) "
        "SELECT CAST(LEAST(ca, cb) AS BIGINT) AS class_a, "
        "CAST(GREATEST(ca, cb) AS BIGINT) AS class_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs FROM e GROUP BY 1, 2"
    ),
    "tile_boundary": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), t AS (SELECT DISTINCT "
        + derive.tile_cell_sql("q.px * q.px", "q.py * q.py", TILE_RES)
        + " AS cell FROM q), "
        f"c AS (SELECT cell, cell // {1 << TILE_RES} AS ix, "
        f"cell % {1 << TILE_RES} AS iy FROM t), "
        "n AS (SELECT a.cell, a.ix, a.iy, "
        "CAST(COUNT(b.cell) AS BIGINT) AS occ FROM c a LEFT JOIN c b "
        "ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1 "
        "AND a.cell <> b.cell GROUP BY a.cell, a.ix, a.iy) "
        "SELECT cell, occ AS n_occ_neighbors FROM n WHERE occ < "
        "((CASE WHEN ix > 0 THEN 1 ELSE 0 END + "
        f"CASE WHEN ix < {(1 << TILE_RES) - 1} THEN 1 ELSE 0 END + 1) * "
        "(CASE WHEN iy > 0 THEN 1 ELSE 0 END + "
        f"CASE WHEN iy < {(1 << TILE_RES) - 1} THEN 1 ELSE 0 END + 1) - 1)"
    ),
    "seed_catchment": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), t AS (SELECT "
        + derive.tile_index_sql("q.px", TILE_RES)
        + " AS ix, "
        + derive.tile_index_sql("q.py", TILE_RES)
        + " AS iy FROM q), "
        "s AS ("
        + _seeds_cte(VOR_K, TILE_RES)
        + ") SELECT s.seed, CAST(COUNT(*) AS BIGINT) AS n_points "
        "FROM t JOIN s ON ABS(t.ix - s.sx) <= 3 AND ABS(t.iy - s.sy) <= 3"
        " GROUP BY s.seed"
    ),
    "raster_regions": _raster_regions_sql(
        "SELECT event_id, px * px AS px, py * py AS py FROM ("
        + derive.points_sql("events", "event_id", "event_id")
        + ")",
        TILE_RES,
        RASTER_MIN,
    ),
    "tile_geohash": _tile_geohash_sql(p_cust, 6),
    "tile_users": _tile_distinct_users_sql(
        "SELECT e.user_id, q.px, q.py FROM ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") q JOIN events e ON e.event_id = q.event_id",
        TILE_RES,
    ),
    "tile_buffer": _tile_buffer_sql(p_cust, TILE_RES, 2),
    "tile_gini": _tile_gini_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "tile_focal_mean": _tile_focal_mean_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "tile_majority": _tile_majority_sql(
        "SELECT e.event_type AS cls, q.px, q.py FROM events e JOIN ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") q ON e.event_id = q.event_id",
        TILE_RES,
    ),
    "tile_simpson": _tile_simpson_sql(
        "SELECT e.event_type AS cls, q.px, q.py FROM events e JOIN ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") q ON e.event_id = q.event_id",
        TILE_RES,
    ),
    "voronoi_assign": _voronoi_assign_sql(
        derive.points_sql("events", "event_id", "event_id"),
        _seeds_cte(VOR_K, TILE_RES),
        TILE_RES,
    ),
    "tile_rank_corr": _tile_rank_corr_sql(
        "SELECT e.user_id AS user_id, q.px, q.py FROM events e JOIN ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") q ON e.event_id = q.event_id",
        TILE_RES,
    ),
    "value_hotspots": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), c AS (SELECT "
        + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
        + " AS cell, CAST(SUM(CAST(FLOOR(e.value * 100.0) AS BIGINT)) AS"
        " BIGINT) AS v "
        "FROM events e JOIN q ON e.event_id = q.event_id GROUP BY 1), "
        f"c2 AS (SELECT cell, v, cell // {1 << TILE_RES} AS ix, "
        f"cell % {1 << TILE_RES} AS iy FROM c), "
        "f AS (SELECT a.cell, a.v, CAST(SUM(b.v) AS BIGINT) AS focal "
        "FROM c2 a JOIN c2 b ON ABS(a.ix - b.ix) <= 1 AND "
        "ABS(a.iy - b.iy) <= 1 GROUP BY a.cell, a.v) "
        "SELECT cell, v AS value_cents, focal AS focal_cents FROM f "
        "WHERE v <> 0"
    ),
    "hotspot_coverage": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), t AS (SELECT "
        + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
        + " AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY 1), "
        "r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, cell) AS rn"
        " FROM t), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM t) "
        "SELECT CAST(10 AS BIGINT) AS k, "
        "CAST(SUM(CASE WHEN rn <= 10 THEN n ELSE 0 END) AS BIGINT) AS "
        "topk_events, tot.total AS total_events, "
        "CAST(SUM(CASE WHEN rn <= 10 THEN n ELSE 0 END) AS DOUBLE) / "
        "CAST(tot.total AS DOUBLE) AS coverage FROM r, tot "
        "GROUP BY tot.total"
    ),
    # iterative PageRank unrolled to K fixed CTE steps — pure
    # integer arithmetic at every stage (floor division mirrors the
    # engine's // exactly), so an ITERATIVE graph algorithm gets a
    # value-hash oracle instead of a rows-only check
    "tile_pagerank": _tile_pagerank_sql(),
    "tile_kcore": _tile_kcore_sql(),
    "tile_distance": _tile_distance_sql(),
    "tile_occupancy_curve": (
        "WITH p0 AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") "
        + " UNION ALL ".join(
            "SELECT CAST({l} AS BIGINT) AS level, "
            "CAST(COUNT(DISTINCT {cell}) AS BIGINT) AS n_occupied "
            "FROM p0".format(
                l=l, cell=derive.tile_cell_sql("px", "py", l)
            )
            for l in range(TILE_RES + 1)
        )
    ),
    "hilbert_locality": _hilbert_locality_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "tile_peak_hour": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), c AS (SELECT "
        + derive.tile_cell_sql("q.px", "q.py", TILE_QRES)
        + " AS cell, (epoch_us(e.ts) % 86400000000) // 3600000000 AS hour,"
        " CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events e JOIN q ON e.event_id = q.event_id GROUP BY 1, 2), "
        "r AS (SELECT cell, hour, n, ROW_NUMBER() OVER (PARTITION BY cell"
        " ORDER BY n DESC, hour) AS rn FROM c) "
        "SELECT cell, hour, n FROM r WHERE rn = 1"
    ),
    "tile_turnover": _tile_turnover_sql(
        "SELECT e.user_id AS user_id, e.ts AS ts, q.px, q.py "
        "FROM events e JOIN ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") q ON e.event_id = q.event_id",
        TILE_QRES,
    ),
    "tile_density_rank": (
        "WITH p0 AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), t AS (SELECT "
        + derive.tile_cell_sql("px", "py", TILE_RES)
        + " AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM p0 GROUP BY 1) "
        "SELECT cell, n, PERCENT_RANK() OVER (ORDER BY n) AS pct FROM t"
    ),
    "gravity_access": _gravity_access_sql(
        derive.points_sql("events", "event_id", "event_id"),
        _seeds_cte(VOR_K, TILE_RES),
        TILE_RES,
    ),
    "voronoi_cost": (
        "WITH v AS ("
        + _voronoi_assign_sql(
            derive.points_sql("events", "event_id", "event_id"),
            _seeds_cte(VOR_K, TILE_RES),
            TILE_RES,
        )
        + ") SELECT seed, CAST(COUNT(*) AS BIGINT) AS n_tiles, "
        "CAST(SUM(n) AS BIGINT) AS n_points, "
        "CAST(SUM(n * d2) AS BIGINT) AS cost FROM v GROUP BY seed"
    ),
    "grid_bfs": _grid_bfs_sql(
        derive.points_sql("events", "event_id", "event_id"),
        _seeds_cte(VOR_K, TILE_RES),
        TILE_RES,
        BFS_HOPS,
    ),
    "flow_direction": _flow_direction_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "flow_accumulation": _flow_accumulation_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "watershed_sizes": _watershed_sizes_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "tile_top_visitor": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), c AS (SELECT "
        + derive.tile_cell_sql("q.px", "q.py", TILE_QRES)
        + " AS cell, e.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events e JOIN q ON e.event_id = q.event_id GROUP BY 1, 2), "
        "r AS (SELECT cell, user_id, n, ROW_NUMBER() OVER (PARTITION BY "
        "cell ORDER BY n DESC, user_id) AS rn FROM c) "
        "SELECT cell, user_id, n FROM r WHERE rn = 1"
    ),
}
