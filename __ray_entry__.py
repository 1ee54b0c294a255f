"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved-documents spatial pipeline on
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented operator
with its DuckDB twin; geometry derivation formulas are shared between the
Ray side and the SQL side via ``python_prtree_ray.functions.derive`` so
value hashes match bitwise (see that module's docstring).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from python_prtree_ray.functions import derive


def _isin_sorted(sorted_keys: "np.ndarray", values: "np.ndarray") -> "np.ndarray":
    """Membership mask of ``values`` in an ascending ``sorted_keys`` —
    the broadcast-semi-join primitive. Safe on an EMPTY key array
    (tiny scale factors can drain any dimension-side filter), where
    the inline ``keys[np.minimum(pos, size-1)]`` idiom indexes -1."""
    if sorted_keys.size == 0:
        return np.zeros(values.size, np.bool_)
    pos = np.searchsorted(sorted_keys, values)
    return (pos < sorted_keys.size) & (
        sorted_keys[np.minimum(pos, sorted_keys.size - 1)] == values
    )


def _tile_pagerank_sql(res: int | None = None, scale: int = 10**12, k: int = 10) -> str:
    """Unrolled integer-PageRank oracle: od edges at TILE_RES, then K
    chained CTE steps, each `teleport + 85*inflow(v)//100` with
    inflow(v) = sum over in-edges of `r(u)*w//wout(u)` — every division
    a BIGINT floor, mirroring the engine's // sequence exactly."""
    r = TILE_RES if res is None else res
    head = (
        f"WITH q AS ({derive.points_sql('events', 'event_id', 'event_id')}), "
        "p AS (SELECT e.user_id, e.ts, e.event_id, "
        f"{derive.tile_cell_sql('q.px', 'q.py', r)} AS cell "
        "FROM events e JOIN q USING (event_id)), "
        "d AS (SELECT LAG(cell) OVER w AS f, cell AS t FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "e AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS w FROM d "
        "WHERE f IS NOT NULL GROUP BY f, t), "
        "nodes AS (SELECT DISTINCT c FROM "
        "(SELECT f AS c FROM e UNION ALL SELECT t FROM e)), "
        "meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes), "
        "outw AS (SELECT f, CAST(SUM(w) AS BIGINT) AS wout FROM e "
        "GROUP BY f), "
        f"pr0 AS (SELECT c AS cell, CAST({scale} AS BIGINT) // "
        "(SELECT n FROM meta) AS r FROM nodes)"
    )
    steps = []
    for i in range(k):
        steps.append(
            f", pr{i + 1} AS (SELECT nd.c AS cell, "
            f"(CAST(15 AS BIGINT) * {scale}) // "
            "(CAST(100 AS BIGINT) * (SELECT n FROM meta)) + "
            "(CAST(85 AS BIGINT) * COALESCE(s.infl, 0)) // 100 AS r "
            "FROM nodes nd LEFT JOIN "
            f"(SELECT e.t AS c, CAST(SUM((pr{i}.r * e.w) // o.wout) "
            f"AS BIGINT) AS infl FROM pr{i} "
            f"JOIN e ON e.f = pr{i}.cell "
            f"JOIN outw o ON o.f = pr{i}.cell GROUP BY e.t) s "
            "ON s.c = nd.c)"
        )
    tail = (
        f" SELECT cell, r AS rank_s, "
        f"CAST(r AS DOUBLE) / {float(scale)!r} AS rank FROM pr{k}"
    )
    return head + "".join(steps) + tail


def _tile_kcore_sql(res: int | None = None, k: int = 8, rounds: int = 10) -> str:
    """Unrolled k-core oracle: occupied tiles, then ``rounds`` peel
    steps (keep tiles with >= k alive 8-neighbors), final LEFT-JOIN
    degree count — all-integer, mirrors q_tile_kcore exactly."""
    r = TILE_RES if res is None else res
    g = 1 << r
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    )
    head = (
        f"WITH q AS ({derive.points_sql('events', 'event_id', 'event_id')}), "
        "p AS (SELECT "
        f"{derive.tile_cell_sql('q.px', 'q.py', r)} AS cell FROM q), "
        "offs(dx, dy) AS (VALUES " + offs + "), "
        "alive0 AS MATERIALIZED (SELECT DISTINCT cell FROM p)"
    )
    steps = []
    for i in range(rounds):
        steps.append(
            f", alive{i + 1} AS MATERIALIZED (SELECT a.cell FROM alive{i} a "
            "CROSS JOIN offs o "
            f"JOIN alive{i} b ON b.cell = "
            f"(a.cell // {g} + o.dx) * {g} + (a.cell % {g} + o.dy) "
            f"AND a.cell // {g} + o.dx BETWEEN 0 AND {g - 1} "
            f"AND a.cell % {g} + o.dy BETWEEN 0 AND {g - 1} "
            f"GROUP BY a.cell HAVING COUNT(*) >= {k})"
        )
    tail = (
        f" SELECT a.cell, CAST(COUNT(b.cell) AS BIGINT) AS degree "
        f"FROM alive{rounds} a CROSS JOIN offs o "
        f"LEFT JOIN alive{rounds} b ON b.cell = "
        f"(a.cell // {g} + o.dx) * {g} + (a.cell % {g} + o.dy) "
        f"AND a.cell // {g} + o.dx BETWEEN 0 AND {g - 1} "
        f"AND a.cell % {g} + o.dy BETWEEN 0 AND {g - 1} "
        "GROUP BY a.cell"
    )
    return head + "".join(steps) + tail


def _tile_distance_sql(res: int | None = None, rounds: int = 10) -> str:
    """Unrolled Chebyshev distance-transform oracle from the peak-count
    tiles: MATERIALIZED ring CTEs (anti-join keeps only newly reached
    cells each round), unreached occupied tiles -> -1. Mirrors
    q_tile_distance exactly."""
    r = TILE_RES if res is None else res
    g = 1 << r
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    )
    head = (
        f"WITH q AS ({derive.points_sql('events', 'event_id', 'event_id')}), "
        "p AS (SELECT "
        f"{derive.tile_cell_sql('q.px', 'q.py', r)} AS cell FROM q), "
        "offs(dx, dy) AS (VALUES " + offs + "), "
        "occ AS MATERIALIZED (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM p GROUP BY cell), "
        "r0 AS MATERIALIZED (SELECT cell, 0 AS d FROM occ "
        "WHERE n >= (SELECT MAX(n) FROM occ))"
    )
    steps = []
    for i in range(rounds):
        steps.append(
            f", r{i + 1} AS MATERIALIZED (SELECT cell, d FROM r{i} "
            "UNION ALL "
            f"SELECT nb.cell, {i + 1} AS d FROM "
            f"(SELECT DISTINCT b.cell FROM r{i} a CROSS JOIN offs o "
            "JOIN occ b ON b.cell = "
            f"(a.cell // {g} + o.dx) * {g} + (a.cell % {g} + o.dy) "
            f"AND a.cell // {g} + o.dx BETWEEN 0 AND {g - 1} "
            f"AND a.cell % {g} + o.dy BETWEEN 0 AND {g - 1}) nb "
            f"LEFT JOIN r{i} seen ON seen.cell = nb.cell "
            "WHERE seen.cell IS NULL)"
        )
    tail = (
        f" SELECT o.cell, CAST(COALESCE(r.d, -1) AS BIGINT) AS dist "
        f"FROM occ o LEFT JOIN r{rounds} r ON r.cell = o.cell"
    )
    return head + "".join(steps) + tail


RES = 6  # join partitioning resolution (64x64 grid at test scale)
TILE_RES = 6
TILE_QRES = 3  # coarser grid for per-tile quantiles (8x8: >=dozens of pts/cell)
TRACK_RES = 10  # trajectory grid (1024x1024): integer L1 path units
KNN_K = 5
ANN_K = 5
RADIUS = 0.02  # radius_join fixed search radius (unit-square coords)
DBSCAN_EPS = 0.04
DBSCAN_MINPTS = 6
COLOC_RES = 5  # co-location tile resolution (32x32)
COLOC_MIN_SHARED = 8  # mean shared cells ~4.2 -> only the ~6% co-travel tail
ANN_RANGE_T = 0.25
STAY_RES = 4  # stay-point grid (16x16)
RESAMPLE_T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch µs
RESAMPLE_STEP_US = 21_600_000_000  # 6h cadence
SPEED_KMH_T = 5000.0  # teleport threshold: faster than any aircraft
SNAP_RES = 8  # map-matching grid (256x256)
SNAP_MAXMOVE = 48  # teleport gate for snap segments (grid units)
SNAP_R = 12  # snap search radius (grid units)
TRACK_SIM_RES = 7  # hausdorff track grid (128x128)
TRACK_SIM_START_RES = 2  # co-start blocking tiles (4x4)
RASTER_MIN = 16  # raster_regions activity threshold (points per tile)
SPAN_BUDGET = 16  # span_windows token budget per context window
SPAN_MEDIA_TOK = 8  # span_windows fixed token cost of a media span
KNOX_R = 0.02  # Knox spatial radius (unit square)
KNOX_TAU_US = 21_600_000_000  # Knox temporal radius: 6h
VOR_K = 5  # Voronoi / BFS seed-site count (smallest supplier keys)
BFS_HOPS = 6  # grid_bfs isochrone horizon
MOTIF_RES = 3  # tile-motif grid (8x8): coarse so trigrams actually repeat
DWELL_RES = 2  # dwell-run grid (4x4): coarse so same-tile runs form


def _seed_sites(sf: str, k: int, res: int):
    """The VOR_K deterministic seed sites: grid indices of the derived
    points of the k smallest supplier keys (dim-table metadata read)."""
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf}/supplier.parquet", columns=["s_suppkey"])
    keys = np.sort(sup.column("s_suppkey").to_numpy(zero_copy_only=False))[
        :k
    ].astype(np.int64)
    p = derive.derive_points(keys)
    return keys, derive.tile_index(p["px"], res), derive.tile_index(p["py"], res)


def _seeds_cte(k: int, res: int) -> str:
    """SQL twin of :func:`_seed_sites` — (seed, sx, sy) grid indices."""
    return (
        "SELECT query_id AS seed, "
        + derive.tile_index_sql("px", res)
        + " AS sx, "
        + derive.tile_index_sql("py", res)
        + " AS sy FROM ("
        + derive.points_sql("supplier", "s_suppkey", "query_id")
        + ") WHERE query_id IN "
        + f"(SELECT s_suppkey FROM supplier ORDER BY s_suppkey LIMIT {k})"
    )


# ------------------------------------------------------------------ entry


def entry() -> Any:
    """Flagship: synthesize interleaved docs ≙ sf0.001 scale, georeference
    spans, tile-assign, spatial-join against derived query regions."""
    from python_prtree_ray.sources.synth import interleaved_docs, georef_batch
    from python_prtree_ray.sources import tables
    from python_prtree_ray.pipelines.spatial_join import spatial_join

    sf = "/root/testdata/sf0.001"
    docs = interleaved_docs(2000)
    geo = docs.map_batches(georef_batch, batch_format="pyarrow", zero_copy_batch=True)
    boxes = geo.select_columns(["idx", "xmin", "ymin", "xmax", "ymax"])
    queries_ds = tables.query_boxes_dataset(sf)
    pairs = spatial_join(boxes, queries_ds, res=RES)
    return pairs


# ---------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[str], Any]]:
    from python_prtree_ray.sources import tables
    from python_prtree_ray.pipelines import (
        ann,
        dedup,
        knn,
        pip,
        spatial_join as sj,
        text,
        tiling,
        windows,
    )

    def q_spatial_join(sf):
        return sj.spatial_join(
            tables.boxes_dataset(sf), tables.query_boxes_dataset(sf), res=RES
        )

    def q_tree_stats(sf):
        # index-quality audit of the packed PR-tree: per level, node
        # count + int-quantized MBR area and perimeter sums across the
        # per-partition trees — the bulk-load quality metric (lower
        # area/overlap = better packing). Rows-only: tree internals
        # aren't SQL; pytest pins the single-partition stats against a
        # directly-built PRTree.
        import pyarrow as pa
        from python_prtree_ray.functions.prtree import PRTree
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ASCALE = np.int64(1 << 40)
        boxes = tables.boxes_dataset(sf)

        def partial(tbl: pa.Table) -> pa.Table:
            idx = tbl.column("idx").to_numpy(zero_copy_only=False)
            b = np.column_stack(
                [
                    tbl.column(c).to_numpy(zero_copy_only=False)
                    for c in ("xmin", "ymin", "xmax", "ymax")
                ]
            )
            if idx.size == 0:
                return pa.table(
                    {
                        "level": pa.array([], pa.int64()),
                        "n_nodes": pa.array([], pa.int64()),
                        "area_q": pa.array([], pa.int64()),
                        "perim_q": pa.array([], pa.int64()),
                    }
                )
            tree = PRTree(idx, b)
            lv_rows = []
            for li, lv in enumerate(tree.levels):
                w = lv[:, 2] - lv[:, 0]
                h = lv[:, 3] - lv[:, 1]
                lv_rows.append(
                    (
                        li,
                        lv.shape[0],
                        int(np.floor(w * h * ASCALE).astype(np.int64).sum()),
                        int(
                            np.floor((w + h) * ASCALE).astype(np.int64).sum()
                        ),
                    )
                )
            return pa.table(
                {
                    "level": pa.array([r[0] for r in lv_rows], pa.int64()),
                    "n_nodes": pa.array([r[1] for r in lv_rows], pa.int64()),
                    "area_q": pa.array([r[2] for r in lv_rows], pa.int64()),
                    "perim_q": pa.array([r[3] for r in lv_rows], pa.int64()),
                }
            )

        return bucketed_sum(
            boxes.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="level",
            value_cols=("n_nodes", "area_q", "perim_q"),
        )

    def q_box_count(sf):
        # range-COUNT flavor of batch_query: hits per query box without
        # materializing pairs downstream — per-batch reduceat inside
        # the join output, ONE tiny query-key sum (the aggregate
        # pushdown a 100-TB "how many per region" scan wants)
        import pyarrow as pa
        from python_prtree_ray.pipelines.merge import bucketed_sum

        pairs = sj.spatial_join(
            tables.boxes_dataset(sf), tables.query_boxes_dataset(sf), res=RES
        )

        def partial(tbl: pa.Table) -> pa.Table:
            q = tbl.column("query_id").to_numpy(zero_copy_only=False)
            k, n = np.unique(q, return_counts=True)
            return pa.table({"query_id": k, "n_hits": n.astype(np.int64)})

        return bucketed_sum(
            pairs.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="query_id",
            value_cols=("n_hits",),
        )

    def q_spatial_join_shuffle(sf):
        # the FORCED big-big cell-shuffle physical plan (broadcast=False)
        # driven through the driver oracle: same pair set as the
        # broadcast plan, co-partitioned ONE-shuffle execution — the
        # path a 100-TB run takes when neither side fits a broadcast
        return sj.spatial_join(
            tables.boxes_dataset(sf),
            tables.query_boxes_dataset(sf),
            res=RES,
            broadcast=False,
        )

    def q_knn_ring(sf):
        # the histogram ring-expansion kNN physical plan
        # (broadcast=False) driven through the driver oracle: identical
        # (query, idx, rank) rows as the broadcast local-top-k plan
        return knn.knn_join(
            tables.boxes_dataset(sf),
            tables.points_dataset(sf, "supplier", "s_suppkey"),
            k=KNN_K,
            res=5,
            broadcast=False,
        )

    def q_self_join(sf):
        ds = sj.self_join(tables.boxes_dataset(sf, "part", "p_partkey"), res=RES)
        return ds.rename_columns({"query_id": "idx_a", "idx": "idx_b"})

    def q_iou_join(sf):
        # detection-dedup primitive: overlapping part-box pairs with
        # IoU >= 0.05; exact pair set + ONE shared IoU expression tree
        pairs = sj.iou_join(
            tables.boxes_dataset(sf, "part", "p_partkey"), threshold=0.05, res=RES
        )
        return pairs

    def q_point_query(sf):
        return sj.point_query(
            tables.boxes_dataset(sf), tables.points_dataset(sf), res=RES
        )

    def q_knn(sf):
        return knn.knn_join(
            tables.boxes_dataset(sf),
            tables.points_dataset(sf, "supplier", "s_suppkey"),
            k=KNN_K,
            res=5,
        )

    def q_knn_3d(sf):
        # D-generic kNN (broadcast local-top-k path) over 3D centroids —
        # reference kNN is a 2D north-rule op; 3D rides the same kernel
        from python_prtree_ray.sources.tables import BOX3D_COLS, points_3d_dataset

        return knn.knn_join(
            tables.boxes_3d_dataset(sf),
            points_3d_dataset(sf),
            k=KNN_K,
            res=4,
            box_cols=BOX3D_COLS,
            point_cols=knn.POINT3D_COLS,
        )

    def q_knn_4d(sf):
        # D-generic kNN over 4D (x,y,z,t) centroids — same kernel and
        # merge as 2D/3D, box/point column tuples swapped
        from python_prtree_ray.sources.tables import BOX4D_COLS, points_4d_dataset

        return knn.knn_join(
            tables.boxes_4d_dataset(sf),
            points_4d_dataset(sf),
            k=KNN_K,
            res=4,
            box_cols=BOX4D_COLS,
            point_cols=knn.POINT4D_COLS,
        )

    def q_radius_join(sf):
        # fixed-radius within-distance join: supplier points vs order-box
        # centroids (zero-shuffle broadcast path at this probe size)
        return knn.radius_join(
            tables.boxes_dataset(sf),
            tables.points_dataset(sf, "supplier", "s_suppkey"),
            radius=RADIUS,
            res=5,
        )

    def q_point_clusters(sf):
        # fixed-radius spatial clustering: radius SELF-join (degenerate
        # point-boxes) → connected components → min-id cluster labels
        from python_prtree_ray.pipelines.graph import point_clusters

        return point_clusters(
            tables.points_dataset(sf), radius=RADIUS, res=5
        )

    def q_dbscan(sf):
        # exact DBSCAN: eps self-join -> degree -> core flags -> CC over
        # core-core edges -> border min-label messages; every stage one
        # coarse node-bucket shuffle
        from python_prtree_ray.pipelines.graph import dbscan_clusters

        return dbscan_clusters(
            tables.points_dataset(sf), eps=DBSCAN_EPS, min_pts=DBSCAN_MINPTS
        )

    def q_pip(sf):
        return pip.pip_join(tables.points_dataset(sf))

    def q_pip_nonconvex(sf):
        # even-odd crossing-number PIP over the concave star fixture —
        # non-convex zones the half-plane test can't express; broadcast
        # polys, per-batch vectorized edge sweep, zero shuffle
        return pip.pip_nonconvex(tables.points_dataset(sf))

    def q_zonal_stats(sf):
        # per-polygon point aggregates (zonal statistics): broadcast
        # zones, map-side combine, tiny poly_id groupby
        return pip.zonal_stats(tables.points_dataset(sf))

    def q_tile_points(sf):
        return tiling.tile_points(tables.points_dataset(sf), res=TILE_RES)

    def q_tile_cover(sf):
        return tiling.tile_cover(tables.boxes_dataset(sf), res=TILE_RES)

    def q_tile_pyramid(sf):
        # multi-resolution tile-count pyramid (zoom levels TILE_RES..0):
        # one map pass emits pre-combined counts for ALL levels, one
        # coarse-bucket shuffle sums them
        return tiling.tile_pyramid(tables.points_dataset(sf), res=TILE_RES)

    def q_tile_extent(sf):
        # per-tile count + envelope of overlapping boxes (zonal raster
        # statistics over the procedural tile grid)
        return tiling.tile_extent(tables.boxes_dataset(sf), res=TILE_RES)

    def q_hotspot_cells(sf):
        # 3x3 focal-sum point density (raster hotspot smoothing): tile
        # counts + neighbor contributions, one coarse-bucket shuffle
        return tiling.hotspot_cells(tables.points_dataset(sf), res=TILE_RES)

    def q_tile_neighbors(sf):
        # occupied-cell adjacency (binary-occupancy complement of
        # hotspot_cells): distinct cells -> <=8 offers each -> count
        # offers landing on occupied cells; two cell-sized shuffles
        return tiling.tile_neighbors(tables.points_dataset(sf), res=TILE_RES)

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

    def q_morans_i(sf):
        # global Moran's I spatial autocorrelation of tile densities
        # (queen contiguity, occupied cells): exact integer sums, ONE
        # float division -> SQL twin matches bitwise
        return tiling.morans_i(tables.points_dataset(sf), res=TILE_RES)

    def q_gearys_c(sf):
        # Geary's C (difference-based autocorrelation companion) over
        # the DENSER event-point grid so neighbor-count differences are
        # non-degenerate; same exact-integer machinery as morans_i
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.gearys_c(pts, res=TILE_RES)

    def q_local_morans(sf):
        # LISA per-cell hot/cold-spot decomposition over event-point
        # densities: exact-integer per-cell numerator, one double
        # division per row -> bitwise SQL twin
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.local_morans(pts, res=TILE_RES)

    def q_ripley_k(sf):
        # Ripley's K point-pattern statistic at r=RADIUS (naive unit-
        # square estimator): cell-bucketed owner/ghost pair counting,
        # exact integer pair count, ONE float division
        return tiling.ripley_k(tables.points_dataset(sf), radius=RADIUS)

    def q_ripley_curve(sf):
        # multi-radius Ripley K curve (the reference's published-curve
        # analog): exact binned pair counts, cumulative division
        return tiling.ripley_curve(
            tables.points_dataset(sf), radius=0.04, n_bins=8
        )

    def q_getis_ord(sf):
        # Getis-Ord Gi* hot-spot z-scores per tile: exact-integer focal
        # sums + a fixed correctly-rounded IEEE expression tree shared
        # with the SQL twin (bitwise doubles)
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.getis_ord(pts, res=TILE_RES)

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

    def q_lorenz_curve(sf):
        # Lorenz curve of spatial concentration at decile boundaries
        # (the curve behind tile_gini): tile-sized driver sort, exact
        # prefix sums, two divisions per row
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.lorenz_curve(pts, res=TILE_RES)

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

    def q_weekly_active(sf):
        # WAU curve: exact distinct users per epoch week via the
        # one-bucket-per-user dedup fold + one tiny week sum
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.windows import WEEK_US

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            week = us // WEEK_US
            order = np.lexsort((week, u))
            u_s, w_s = u[order], week[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])][: u_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(u_s[keep], 256),
                    "u": u_s[keep],
                    "week": w_s[keep],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {
                        "week": pa.array([], pa.int64()),
                        "n_users": pa.array([], pa.int64()),
                    }
                )
            w = group.column("week").to_numpy(zero_copy_only=False)
            order = np.lexsort((w, u))
            u_s, w_s = u[order], w[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])][: u_s.size]
            wk, n = np.unique(w_s[keep], return_counts=True)
            return pa.table({"week": wk, "n_users": n.astype(np.int64)})

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return bucketed_sum(folded, key_col="week", value_cols=("n_users",))

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

    def q_order_size_corr(sf):
        # Pearson correlation between order size (lineitem count) and
        # order value: ONE co-partitioned join, exact integer moments
        # folded in arbitrary precision, the num/√(vx·vy) double
        # expression shared with the SQL twin (IEEE sqrt is correctly
        # rounded — bitwise equal by construction)
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.merge import bucketed_sum

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey"]
        )

        def cnt_partial(tbl: pa.Table) -> pa.Table:
            k, n = np.unique(
                tbl.column("l_orderkey").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"l_orderkey": k, "n_items": n.astype(np.int64)})

        per_order = bucketed_sum(
            li.map_batches(
                cnt_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="l_orderkey",
            value_cols=("n_items",),
        )
        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )

        def oprep(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey"),
                    "cents": np.floor(
                        tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
                        * 100.0
                    ).astype(np.int64),
                }
            )

        joined = hash_equi_join(
            per_order,
            orders.map_batches(oprep, batch_format="pyarrow", zero_copy_batch=True),
            on="l_orderkey",
            right_on="o_orderkey",
            left_cols=("n_items",),
            right_cols=("cents",),
        )

        def moments(tbl: pa.Table) -> pa.Table:
            x = tbl.column("n_items").to_numpy(zero_copy_only=False)
            y = tbl.column("cents").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n": pa.array([np.int64(x.size)], pa.int64()),
                    "sx": pa.array([x.sum()], pa.int64()),
                    "sy": pa.array([y.sum()], pa.int64()),
                    "sxy": pa.array([(x * y).sum()], pa.int64()),
                    "sxx": pa.array([(x * x).sum()], pa.int64()),
                    "syy": pa.array([(y * y).sum()], pa.int64()),
                }
            )

        # batch_size bounds the per-batch Σy² partial inside int64
        # (cents² ≈ 2.5e15 per row); totals fold in Python bigints below
        parts = joined.map_batches(
            moments, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048
        )
        n = 0
        sx = sy = sxy = sxx = syy = 0
        for ref_ in parts.to_arrow_refs():
            t = ray.get(ref_)
            for r in range(t.num_rows):
                n += int(t.column("n")[r].as_py())
                sx += int(t.column("sx")[r].as_py())
                sy += int(t.column("sy")[r].as_py())
                sxy += int(t.column("sxy")[r].as_py())
                sxx += int(t.column("sxx")[r].as_py())
                syy += int(t.column("syy")[r].as_py())
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        r = (
            float(num)
            / np.sqrt(np.float64(float(vx)) * np.float64(float(vy)))
            if vx > 0 and vy > 0
            else None
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_orders": pa.array([n], pa.int64()),
                    "num": pa.array([float(num)], pa.float64()),
                    "var_x": pa.array([float(vx)], pa.float64()),
                    "var_y": pa.array([float(vy)], pa.float64()),
                    "r": pa.array([r], pa.float64()),
                }
            )
        )

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

    def q_type_colocation(sf):
        # cross-type tile co-location lift: exact distinct-tile counts
        # per type/pair, one division; C^2-bounded metadata folds
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
        return tiling.type_colocation(pts, res=TILE_RES)

    def q_contour_cases(sf):
        # marching-squares case codes of the event-density raster at
        # threshold 3: exact tile counts + ONE (block, weight) fold,
        # iso-line-sized output
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.contour_cases(pts, res=TILE_RES, threshold=3)

    def q_std_ellipse(sf):
        # standard deviational ellipse of event points: per-batch
        # 6-int moment partials, exact-int numerators, ONE double
        # division per output value (orientation as tan2theta -- no
        # libm atan2 both sides)
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.std_ellipse(pts, grid_res=12)

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

    def q_bivariate_moran(sf):
        # bivariate Moran's I: are customer-density hotspots adjacent
        # to event-density hotspots? two exact tile-count folds; the
        # union tile table is parameter-sized, so moments fold on the
        # driver in arbitrary-precision ints (ONE sqrt + ONE division)
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        evp = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.bivariate_moran(
            tables.points_dataset(sf), evp, res=TILE_RES
        )

    def q_cross_k(sf):
        # bivariate Ripley's cross-K between customer points (type A)
        # and event points (type B) at r=RADIUS: exact integer
        # cross-pair count, ONE float division
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        b = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.cross_k(tables.points_dataset(sf), b, radius=RADIUS)

    def q_semivariogram(sf):
        # experimental semivariogram of the integer point measure over
        # customer points, 8 distance lags within r=0.05: exact-int
        # pair/sum partials, repr'd lag edges shared with the SQL twin
        import pyarrow as pa

        def add_z(tbl):
            q = tbl.column("query_id").to_numpy(zero_copy_only=False)
            return tbl.append_column(
                "pz", pa.array(derive.point_measure(q), pa.int64())
            )

        pts = tables.points_dataset(sf).map_batches(
            add_z, batch_format="pyarrow", zero_copy_batch=True
        )
        return tiling.semivariogram(pts, radius=0.05, n_bins=8)

    def q_tile_buffer(sf):
        # buffer/proximity raster (bounded Chebyshev distance
        # transform): one offer shuffle + min fold, exact ints
        return tiling.tile_buffer(
            tables.points_dataset(sf), res=TILE_RES, max_d=2
        )

    def q_skyline(sf):
        # Pareto frontier (minimize px AND 1-py — a real tradeoff
        # frontier; the raw corner would be dominated by key 0's
        # near-origin point): local-skyline batch scan -> ~ln(n)-row
        # driver fold; raw points never shuffle
        import pyarrow as pa

        from python_prtree_ray.pipelines.agg import skyline

        def flip(tbl):
            py = tbl.column("py").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "query_id": tbl.column("query_id"),
                    "px": tbl.column("px"),
                    "py": pa.array(1.0 - py, pa.float64()),
                }
            )

        pts = tables.points_dataset(sf).map_batches(
            flip, batch_format="pyarrow", zero_copy_batch=True
        )
        return skyline(pts)

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

    def q_points_diameter(sf):
        # corpus extent: global farthest pair via map-side hull pruning
        # (hull-of-union ⊆ union-of-hulls), exact int grid
        from python_prtree_ray.pipelines.trajectory import points_diameter

        return points_diameter(tables.points_dataset(sf), res=TRACK_RES)

    def q_cents_mod_hist(sf):
        # pricing-pattern audit: distribution of price cents mod 100
        # (the .99 / round-number artifact detector); exact ints
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_totalprice"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            m, n = np.unique(cents % 100, return_counts=True)
            return pa.table({"cents_mod": m, "n": n.astype(np.int64)})

        return bucketed_sum(
            orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="cents_mod",
            value_cols=("n",),
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

    def q_region_monthly_revenue(sf):
        # hierarchical x temporal rollup: order revenue by (region,
        # calendar month) — dims broadcast, packed-key partials, int cents
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
        )
        reg = pq.read_table(
            f"{sf}/region.parquet", columns=["r_regionkey", "r_name"]
        )
        nmap = dict(
            zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_regionkey").to_pylist(),
            )
        )
        # fold nation -> region into the customer broadcast table
        import pyarrow.compute as _pc

        ck = cust.column("c_custkey")
        crk = pa.array(
            [nmap[int(x)] for x in cust.column("c_nationkey").to_pylist()],
            pa.int64(),
        )
        cust2 = pa.table({"c_custkey": ck, "rkey": crk})

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        o2 = broadcast_lookup(
            orders, cust2, on="o_custkey", small_on="c_custkey",
            carry_cols=("rkey",),
        )

        def partial(tbl: pa.Table) -> pa.Table:
            ts = (
                tbl.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False)
            )
            mo = ts.astype("datetime64[M]").astype(np.int64)  # months since epoch
            rk = tbl.column("rkey").to_numpy(zero_copy_only=False)
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            key = rk * (1 << 20) + mo  # months since epoch < 2^20
            k_u, inv = np.unique(key, return_inverse=True)
            return pa.table(
                {
                    "key": k_u,
                    "revenue_cents": np.bincount(
                        inv, weights=cents, minlength=k_u.size
                    ).astype(np.int64),
                }
            )

        summed = bucketed_sum(
            o2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="key",
            value_cols=("revenue_cents",),
        )
        rmap = dict(
            zip(
                reg.column("r_regionkey").to_pylist(),
                reg.column("r_name").to_pylist(),
            )
        )
        rref = ray.put(rmap)

        def decode(tbl: pa.Table) -> pa.Table:
            rm = ray.get(rref)
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            mo = (key & ((1 << 20) - 1)).astype("datetime64[M]")
            return pa.table(
                {
                    "r_name": pa.array(
                        [rm[int(k)] for k in key >> 20], pa.string()
                    ),
                    "month": pa.array(
                        mo.astype("datetime64[us]"), pa.timestamp("us")
                    ),
                    "revenue_cents": tbl.column("revenue_cents"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

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

    def q_nation_balance(sf):
        # dimension-side balance sheet: customers vs suppliers per
        # nation with the exact cross ratio (metadata-only op)
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        cust = pq.read_table(f"{sf}/customer.parquet", columns=["c_nationkey"])
        supp = pq.read_table(f"{sf}/supplier.parquet", columns=["s_nationkey"])
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        ck, cn = np.unique(
            cust.column("c_nationkey").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        sk, sn = np.unique(
            supp.column("s_nationkey").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        cmap = dict(zip(ck.tolist(), cn.tolist()))
        smap = dict(zip(sk.tolist(), sn.tolist()))
        keys = sorted(set(cmap) | set(smap))
        nmap = dict(
            zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_name").to_pylist(),
            )
        )
        nc = np.array([cmap.get(k, 0) for k in keys], np.int64)
        ns = np.array([smap.get(k, 0) for k in keys], np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_name": pa.array([nmap[k] for k in keys], pa.string()),
                    "n_customers": nc,
                    "n_suppliers": ns,
                    # SQL-parity: x / 0.0 is NULL in DuckDB, not +inf
                    "cust_per_supplier": pa.array(
                        np.divide(
                            nc.astype(np.float64),
                            ns.astype(np.float64),
                            out=np.full(nc.size, np.nan),
                            where=ns != 0,
                        ),
                        pa.float64(),
                        mask=ns == 0,
                    ),
                }
            )
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

    def q_adaptive_quadtree(sf):
        # capacity-split adaptive binning: every occupied leaf of the
        # cap=64 quadtree over event points (the adaptive tile_pyramid)
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.adaptive_quadtree(pts, max_res=TILE_RES, cap=64)

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

    def q_reorder_gap_quantiles(sf):
        # repeat-purchase cadence: exact R-7 quantiles of per-customer
        # consecutive-order gaps in days (dates are midnight-aligned, so
        # the day division is exact) — the shared pair fold + histogram
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.movement import _bucketed, _fold_pairs
        from python_prtree_ray.pipelines.quantiles import int_quantiles
        from python_prtree_ray.pipelines.windows import DAY_US

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
        )

        def emit(cols, dt):
            if dt is None:
                return pa.table(
                    {"k": pa.array([], pa.int64()), "days": pa.array([], pa.int64())}
                )
            return pa.table(
                {"k": np.zeros(dt.size, np.int64), "days": dt // DAY_US}
            )

        keyed = _bucketed(
            orders, "o_custkey", "o_orderdate", "o_orderkey", (), 256
        )
        gaps = _fold_pairs(keyed, (), emit)
        return int_quantiles(gaps, key_col="k", int_col="days")

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

    def q_brand_revenue(sf):
        # attribute rollup through a broadcast dimension: revenue per
        # part brand (int cents, brand-sized fold), ranked
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        part = pq.read_table(
            f"{sf}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        li2 = broadcast_lookup(
            li, part, on="l_partkey", small_on="p_partkey",
            carry_cols=("p_brand",),
        )

        def partial(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
            cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
            enc = pc.dictionary_encode(tbl.column("p_brand")).combine_chunks()
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(code, kind="stable")
            c_s = code[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
            return pa.table(
                {
                    "k": np.zeros(starts.size, np.int64),
                    "p_brand": enc.dictionary.take(pa.array(c_s[starts])),
                    "revenue_cents": np.add.reduceat(cents[order], starts),
                    "n_items": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
                }
            )

        def final(group: pa.Table) -> pa.Table:
            b = group.column("p_brand").to_numpy(zero_copy_only=False)
            if b.size == 0:
                return pa.table(
                    {
                        "p_brand": pa.array([], pa.string()),
                        "revenue_cents": pa.array([], pa.int64()),
                        "n_items": pa.array([], pa.int64()),
                        "rank": pa.array([], pa.int64()),
                    }
                )
            rev = group.column("revenue_cents").to_numpy(zero_copy_only=False)
            n = group.column("n_items").to_numpy(zero_copy_only=False)
            order = np.argsort(b, kind="stable")
            b_s, r_s, n_s = b[order], rev[order], n[order]
            starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]][: b_s.size])
            bb = b_s[starts]
            rr = np.add.reduceat(r_s, starts)
            nn = np.add.reduceat(n_s, starts)
            rankord = np.lexsort((bb, -rr))
            rank = np.empty(bb.size, np.int64)
            rank[rankord] = np.arange(1, bb.size + 1)
            return pa.table(
                {
                    "p_brand": pa.array(bb, pa.string()),
                    "revenue_cents": rr,
                    "n_items": nn,
                    "rank": rank,
                }
            )

        return (
            li2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(final, batch_format="pyarrow")
            .select_columns(["p_brand", "revenue_cents", "n_items", "rank"])
        )

    def q_tile_geohash(sf):
        # base32 geohash interop tokens (x-first bit interleave, 5 bits
        # per char): pure int64 bit math + fixed-width string gather
        return tiling.tile_geohash(tables.points_dataset(sf), nchars=6)

    def q_quadrat_test(sf):
        # quadrat-count chi-square CSR screen over the full lattice:
        # exact integer sums (empty quadrats enter only via 4^res),
        # ONE float division -> bitwise SQL twin
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.quadrat_test(pts, res=TILE_RES)

    def q_join_counts(sf):
        # binary occupied/empty join-count statistics (queen contiguity,
        # full lattice totals): every output an exact integer
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"], "py": p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.join_counts(pts, res=TILE_RES)

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

    def q_region_count_curve(sf):
        # percolation profile: region count vs density threshold over
        # the squared-coordinate raster (the raster_regions surface)
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table({"px": p["px"] * p["px"], "py": p["py"] * p["py"]})

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.region_count_curve(pts, res=TILE_RES, thresholds=(8, 16, 32))

    def q_type_centroids(sf):
        # per-type spatial centroid on the fine integer grid: exact
        # (n, Σix, Σiy) moments, two divisions per type
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "event_type"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            ix = derive.tile_index(p["px"], TRACK_RES)
            iy = derive.tile_index(p["py"], TRACK_RES)
            enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(code, kind="stable")
            c_s = code[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
            return pa.table(
                {
                    "event_type": enc.dictionary.take(pa.array(c_s[starts])),
                    "n": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
                    "six": np.add.reduceat(ix[order], starts),
                    "siy": np.add.reduceat(iy[order], starts),
                }
            )

        parts = ev.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )

        def add_k(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "k", pa.array(np.zeros(tbl.num_rows, np.int64))
            )

        def final(group: pa.Table) -> pa.Table:
            et = group.column("event_type").to_numpy(zero_copy_only=False)
            if et.size == 0:
                return pa.table(
                    {
                        "event_type": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                        "mean_ix": pa.array([], pa.float64()),
                        "mean_iy": pa.array([], pa.float64()),
                    }
                )
            n = group.column("n").to_numpy(zero_copy_only=False)
            six = group.column("six").to_numpy(zero_copy_only=False)
            siy = group.column("siy").to_numpy(zero_copy_only=False)
            order = np.argsort(et, kind="stable")
            e_s = et[order]
            starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]][: e_s.size])
            nn = np.add.reduceat(n[order], starts)
            sx = np.add.reduceat(six[order], starts)
            sy = np.add.reduceat(siy[order], starts)
            return pa.table(
                {
                    "event_type": pa.array(e_s[starts], pa.string()),
                    "n": nn,
                    "mean_ix": sx.astype(np.float64) / nn.astype(np.float64),
                    "mean_iy": sy.astype(np.float64) / nn.astype(np.float64),
                }
            )

        return (
            parts.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(final, batch_format="pyarrow")
            .select_columns(["event_type", "n", "mean_ix", "mean_iy"])
        )

    def q_clark_evans(sf):
        # Clark-Evans NN-distance CSR index (squared-distance variant):
        # exact scaled-int distance sum over the nn_pairs kNN path, one
        # fixed final double expression shared with the SQL twin
        from python_prtree_ray.pipelines.knn import clark_evans

        return clark_evans(tables.points_dataset(sf))

    def q_knn_regress(sf):
        # kNN regression: mean integer measure of the KNN_K nearest
        # order boxes per supplier point; exact sum, one division
        from python_prtree_ray.pipelines.knn import knn_regress

        return knn_regress(
            tables.boxes_dataset(sf),
            tables.points_dataset(sf, "supplier", "s_suppkey"),
            k=KNN_K,
            res=5,
        )

    def q_nn_histogram(sf):
        # G-function NN-distance distribution in log2 lags of the
        # FLOOR-scaled squared distance: exact integer bins (power-of-
        # two comparisons, no libm log), <=63 output rows at any size
        from python_prtree_ray.pipelines.knn import nn_histogram

        return nn_histogram(tables.points_dataset(sf))

    def q_cell_trend(sf):
        # emerging-hotspot trend: early-vs-late half counts per tile
        # around the stream's midpoint timestamp; exact int64
        from python_prtree_ray.pipelines.movement import cell_trend

        return cell_trend(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def q_trend_movers(sf):
        # biggest movers: top-20 tiles by |late − early| activity swing
        # — pruned global top-k over the cell_trend stream
        import pyarrow as pa
        from python_prtree_ray.pipelines.merge import global_topk
        from python_prtree_ray.pipelines.movement import cell_trend

        trend = cell_trend(_event_tracks(sf, TILE_RES), res=TILE_RES)

        def absd(tbl: pa.Table) -> pa.Table:
            d = tbl.column("delta").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cell": tbl.column("cell"),
                    "abs_delta": np.abs(d),
                }
            )

        return global_topk(
            trend.map_batches(absd, batch_format="pyarrow", zero_copy_batch=True),
            k=20,
            id_col="cell",
            value_col="abs_delta",
        ).select_columns(["cell", "abs_delta", "rank"])

    def q_type_run_hist(sf):
        # burst structure: histogram of run LENGTHS of consecutive
        # same-type events per user (the distributional sibling of
        # max_dwell_run's per-user max) — islands fold, tiny sum
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "bucket": bucket_of(u, 256),
                    "u": u,
                    "t": pc.cast(
                        tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
                    ),
                    "seq": tbl.column("event_id"),
                    "cls": tbl.column("event_type"),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {
                        "run_len": pa.array([], pa.int64()),
                        "n_runs": pa.array([], pa.int64()),
                    }
                )
            t = group.column("t").to_numpy(zero_copy_only=False)
            seq = group.column("seq").to_numpy(zero_copy_only=False)
            cls = group.column("cls").to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, t, u))
            u_s, c_s = u[order], cls[order]
            new = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])][: u_s.size]
            starts = np.flatnonzero(new)
            lens = np.diff(np.r_[starts, u_s.size]).astype(np.int64)
            ll, n = np.unique(lens, return_counts=True)
            return pa.table({"run_len": ll, "n_runs": n.astype(np.int64)})

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return bucketed_sum(folded, key_col="run_len", value_cols=("n_runs",))

    def q_home_cells(sf):
        # home-location inference: per-user most-visited tile with the
        # (count DESC, cell ASC) tie-break; exact ints
        from python_prtree_ray.pipelines.movement import home_cells

        return home_cells(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def q_user_top2_cells(sf):
        # home/work inference: each user's top-2 visited tiles pivoted
        # to one row — (n DESC, cell ASC) order; users with a second
        # cell only (both sides drop single-cell users' cell_2 to NULL-
        # free form by requiring two distinct cells)
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.cells import cell_of_points
        from python_prtree_ray.pipelines.merge import bucketed_sum, grouped_topk

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        )
        g2 = np.int64(1 << TILE_RES) ** 2

        def partial(tbl: pa.Table) -> pa.Table:
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            cell = cell_of_points(p["px"], p["py"], TILE_RES)
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if u.size and u.max() >= (1 << (62 - 2 * TILE_RES)):
                raise ValueError("user_top2_cells: user id exceeds pack")
            key, n = np.unique(u * g2 + cell, return_counts=True)
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
                    "user_id": key // g2,
                    "cell": key % g2,
                    "n": tbl.column("n"),
                }
            )

        top2 = grouped_topk(
            summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True),
            k=2,
            key_col="user_id",
            id_col="cell",
            value_col="n",
            descending=True,
        )

        def add_k(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "k", pa.array(np.zeros(tbl.num_rows, np.int64))
            )

        def pivot(group: pa.Table) -> pa.Table:
            u = group.column("user_id").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        "cell_1": pa.array([], pa.int64()),
                        "n_1": pa.array([], pa.int64()),
                        "cell_2": pa.array([], pa.int64()),
                        "n_2": pa.array([], pa.int64()),
                    }
                )
            c = group.column("cell").to_numpy(zero_copy_only=False)
            n = group.column("n").to_numpy(zero_copy_only=False)
            r = group.column("rank").to_numpy(zero_copy_only=False)
            order = np.lexsort((r, u))
            u_s, c_s, n_s, r_s = u[order], c[order], n[order], r[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            sizes = np.diff(np.r_[starts, u_s.size])
            two = sizes == 2  # users with two distinct cells
            s2 = starts[two]
            return pa.table(
                {
                    "user_id": u_s[s2],
                    "cell_1": c_s[s2],
                    "n_1": n_s[s2],
                    "cell_2": c_s[s2 + 1],
                    "n_2": n_s[s2 + 1],
                }
            )

        return (
            top2.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(pivot, batch_format="pyarrow")
            .select_columns(["user_id", "cell_1", "n_1", "cell_2", "n_2"])
        )

    def q_rog(sf):
        # radius of gyration (Gonzalez et al. mobility spread): exact-
        # int numerator over n², one double division per user
        from python_prtree_ray.pipelines.movement import radius_of_gyration

        return radius_of_gyration(_event_tracks(sf, TRACK_RES))

    def q_segment_tiles(sf):
        # supercover line rasterization: every TILE_RES tile each
        # teleport-gated move crosses (exact int SAT test: closed bbox
        # + segment-normal corner signs), one row per (move, tile)
        from python_prtree_ray.pipelines.movement import segment_tiles

        return segment_tiles(
            _event_tracks(sf, TRACK_RES), res=TILE_RES, fine_res=TRACK_RES
        )

    def q_turn_histogram(sf):
        # per-user turning-behavior histogram over move pairs: exact
        # integer cross/dot sign classes (no angles), double-LAG twin
        from python_prtree_ray.pipelines.movement import turn_histogram

        return turn_histogram(_event_tracks(sf, TRACK_RES))

    def q_track_diameter(sf):
        # per-user max squared grid distance (footprint diameter):
        # exact-int hull + h^2 vertex max per track, never n^2
        from python_prtree_ray.pipelines.trajectory import track_diameter

        return track_diameter(_event_tracks(sf, TRACK_RES))

    def q_jump_hist(sf):
        # jump-length distribution: log2-spaced squared-displacement
        # bins (float-exponent bin == generated CASE ladder, exact)
        from python_prtree_ray.pipelines.movement import jump_histogram

        return jump_histogram(_event_tracks(sf, TRACK_RES))

    def q_cell_slope(sf):
        # per-tile OLS activity-trend slope over 8 equal time bins
        # (multi-bin refinement of cell_trend): exact-int numerator over
        # a constant denominator, one double division per tile
        from python_prtree_ray.pipelines.movement import cell_slope

        return cell_slope(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def q_interval_union(sf):
        # per-user union length of overlapping 1h activity windows:
        # entity-bucket sweep, one row per key out, exact int64 µs
        import ray
        from python_prtree_ray.pipelines.interval import interval_union_len

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )
        return interval_union_len(ev, window_us=3_600_000_000)

    def q_heading_histogram(sf):
        # per-user movement-direction histogram (sign octants, exact
        # ints): shared trajectory fold, <=8 rows per entity shuffle
        from python_prtree_ray.pipelines.movement import heading_histogram

        return heading_histogram(_event_tracks(sf, TILE_RES))

    def q_cell_hours(sf):
        # per-tile hour-of-day activity profile: batch-local (cell,
        # hour) counts + ONE coarse-bucket sum; pure int arithmetic
        from python_prtree_ray.pipelines.movement import cell_hours

        return cell_hours(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def q_track_hausdorff(sf):
        # track-similarity join: symmetric Hausdorff² between co-started
        # users (same start tile); exact int64, no float anywhere
        from python_prtree_ray.pipelines.trajectory import trajectory_hausdorff

        return trajectory_hausdorff(
            _event_tracks(sf, TRACK_SIM_RES),
            start_res=TRACK_SIM_START_RES,
            res=TRACK_SIM_RES,
        )

    def q_track_dtw(sf):
        # ordered track similarity: DTW optimal-alignment cost between
        # co-started users (anti-diagonal DP vectorized across pairs,
        # exact int64). DP recursion has no ANSI-SQL twin -> rows-only;
        # exactness vs a per-pair reference DP is pytest-checked
        from python_prtree_ray.pipelines.trajectory import trajectory_dtw

        return trajectory_dtw(
            _event_tracks(sf, TRACK_SIM_RES),
            start_res=TRACK_SIM_START_RES,
            res=TRACK_SIM_RES,
        )

    def q_knox(sf):
        # Knox space-time interaction test on a deterministic event
        # subset: exact pair counts via owner/ghost cells in 2D space
        # AND 1D τ-time; one fixed-expression ratio double
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "ts"]
        )

        def geo(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            keep = eid % 4 == 0
            tbl = tbl.filter(pa.array(keep))
            eid = eid[keep]
            p = derive.derive_points(eid)
            return pa.table(
                {
                    "query_id": eid.astype("int64"),
                    "px": p["px"],
                    "py": p["py"],
                    "ts": tbl.column("ts"),
                }
            )

        pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
        return tiling.knox_stat(pts, radius=KNOX_R, tau_us=KNOX_TAU_US)

    def q_snap_points(sf):
        # map matching: snap each customer probe point to its nearest
        # event-track segment within r grid units — exact rational
        # distances, (dist2, user, seq) argmin shared with the SQL twin
        import pyarrow as pa
        import ray

        from python_prtree_ray.pipelines.movement import snap_to_segments

        cust = ray.data.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])

        def probe(tbl):
            k = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
            p = derive.derive_points(k)
            return pa.table(
                {
                    "query_id": k.astype("int64"),
                    "qx": derive.tile_index(p["px"], SNAP_RES),
                    "qy": derive.tile_index(p["py"], SNAP_RES),
                }
            )

        probes = cust.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        return snap_to_segments(
            probes,
            _event_tracks(sf, SNAP_RES),
            r=SNAP_R,
            max_move=SNAP_MAXMOVE,
            res=SNAP_RES,
            bucket_res=3,
        )

    def q_tile_topk(sf):
        # top-k POIs per map tile by derived score: map-side per-cell
        # prune (k rows per cell per batch), ONE coarse cell shuffle
        return tiling.tile_topk(tables.points_dataset(sf), res=TILE_RES, k=3)

    def q_tile_quantiles(sf):
        # exact per-tile R-7 quantiles of the integer point measure;
        # shuffle bounded by (cell, value) cardinality, not points
        return tiling.tile_quantiles(
            tables.points_dataset(sf), res=TILE_QRES
        )

    def q_idw_grid(sf):
        # IDW raster interpolation at 16x16 grid nodes from point
        # measures within radius; int64-quantized weights -> exact,
        # order-independent distributed sums
        from python_prtree_ray.pipelines.interpolate import idw_grid

        return idw_grid(tables.points_dataset(sf))

    def q_kde_grid(sf):
        # Epanechnikov kernel density at 16x16 grid nodes; polynomial
        # kernel (no libm divergence) quantized to int64 per pair ->
        # exact, order-independent distributed sums
        from python_prtree_ray.pipelines.interpolate import kde_grid

        return kde_grid(tables.points_dataset(sf))

    def q_empty_space_f(sf):
        # empty-space F statistic: share of probe-grid nodes with a
        # data point within r, per radius; nearest distance folded as
        # min over int64-quantized d^2 (floor is monotone -> exact)
        from python_prtree_ray.pipelines.interpolate import empty_space_f

        return empty_space_f(tables.points_dataset(sf))

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

    def q_largest_empty_circle(sf):
        # coverage-gap query: probe-grid node farthest from every data
        # point (grid-discretized largest empty circle); exact int
        # min-fold per node, driver argmax over the g^2 metadata table
        from python_prtree_ray.pipelines.interpolate import (
            largest_empty_circle,
        )

        return largest_empty_circle(tables.points_dataset(sf))

    def q_haversine_join(sf):
        # great-circle radius join: customers within 400 km of each
        # supplier; small side broadcast once, latitude-band prefilter
        # gates the trig
        from python_prtree_ray.pipelines.geodesic import haversine_join

        return haversine_join(
            tables.points_dataset(sf),
            tables.points_dataset(sf, "supplier", "s_suppkey"),
        )

    def q_resample_track(sf):
        # time-regular track resampling (6h cadence, linear interp):
        # ONE entity-bucket shuffle; int64-µs gap ratios cast exactly to
        # double so the LEAD-window SQL twin matches bitwise
        from python_prtree_ray.pipelines.trajectory import resample_track

        return resample_track(
            _event_points(sf), t0_us=RESAMPLE_T0_US, step_us=RESAMPLE_STEP_US
        )

    def q_stay_points(sf):
        # trajectory stay-point mining (anchor-advance windows >= 6h
        # within grid radius 3 at 16x16 res); exact int sums -> bit-
        # identical at any parallelism; pytest-oracled, no SQL twin
        # (anchor recursion is not window-expressible)
        from python_prtree_ray.pipelines.trajectory import stay_points

        return stay_points(
            _event_tracks(sf, STAY_RES), r=3, min_dwell_us=21_600_000_000
        )

    def q_colocation(sf):
        # co-location contact graph: user pairs sharing >= COLOC_MIN_SHARED
        # distinct tiles; per-batch (user, cell) dedup -> ONE cell-bucket shuffle
        # with vectorized triangular pair expansion -> pair-key fold
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.movement import colocation_pairs

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        )

        def visits(tbl):
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            return pa.table(
                {
                    "user_id": tbl.column("user_id"),
                    "cell": derive.tile_cell(p["px"], p["py"], COLOC_RES),
                }
            )

        return colocation_pairs(
            ev.map_batches(visits, batch_format="pyarrow", zero_copy_batch=True),
            min_shared=COLOC_MIN_SHARED,
        )

    def q_trajectory_simplify(sf):
        # per-user Douglas-Peucker track compaction on the integer grid
        # (exact cross-product deviation test -> parallelism-invariant;
        # pytest-oracled vs a recursive reference, no SQL twin)
        from python_prtree_ray.pipelines.trajectory import trajectory_simplify

        return trajectory_simplify(_event_tracks(sf, TRACK_RES), eps=2)

    def _event_tracks(sf, res):
        # georeferenced event stream: (user_id, ts, event_id, gx, gy)
        # grid coordinates derived from event_id at resolution `res`
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
                    "event_id": tbl.column("event_id"),
                    "gx": derive.tile_index(p["px"], res),
                    "gy": derive.tile_index(p["py"], res),
                }
            )

        return ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)

    def q_session_type_pairs(sf):
        # market-basket over sessions: unordered type pairs co-occurring
        # in a 30-min-gap user session, exact session-distinct counts
        from python_prtree_ray.pipelines.windows import session_type_pairs
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        return session_type_pairs(ev)

    def q_value_peaks(sf):
        # local-maximum screen: events equal to their entity's ±1h
        # window max — segmented sparse-table range max, RANGE-frame twin
        from python_prtree_ray.pipelines.windows import value_peaks
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
        return value_peaks(ev)

    def q_user_gini(sf):
        # value-concentration Gini over per-user spend: exact rank-
        # weighted integer form (tile_gini's formula over user sums;
        # user-sized driver sort — the rank-statistic bound)
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "value"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(u, kind="stable")
            u_s, c_s = u[order], cents[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "x": np.add.reduceat(c_s, starts)
                    if u_s.size
                    else np.zeros(0, np.int64),
                }
            )

        sums = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="user_id",
            value_cols=("x",),
        )
        xs = []
        for ref in sums.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                xs.append(t.column("x").to_numpy(zero_copy_only=False))
        if not xs:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "n_users": pa.array([0], pa.int64()),
                        "total_cents": pa.array([0], pa.int64()),
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
                    "n_users": pa.array([n], pa.int64()),
                    "total_cents": pa.array([s], pa.int64()),
                    "gini": pa.array(
                        [float(num) / float(den) if den else None], pa.float64()
                    ),
                }
            )
        )

    def q_late_events(sf):
        # watermark diagnostic: per-user late-arrival counts + max
        # lateness under a hash-jittered arrival order (segmented
        # doubling prefix-max, ONE user-bucket shuffle)
        from python_prtree_ray.pipelines.windows import late_events
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
        )
        return late_events(ev)

    def q_attribution_last_touch(sf):
        # marketing attribution: each purchase joined to the user's most
        # recent PRIOR view — ONE user-bucket shuffle, segmented
        # forward-fill via global maximum.accumulate (global positions
        # are monotone, so cross-segment carryover self-invalidates)
        import pyarrow as pa
        import pyarrow.compute as _pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        )

        def prep(tbl: pa.Table) -> pa.Table:
            et = tbl.column("event_type")
            is_v = _pc.equal(et, "view").to_numpy(zero_copy_only=False)
            is_p = _pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
            m = is_v | is_p
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)[m]
            return pa.table(
                {
                    "bucket": bucket_of(u.astype(np.int64), 256),
                    "u": u,
                    "seq": tbl.column("event_id").to_numpy(
                        zero_copy_only=False
                    )[m],
                    "tus": tbl.column("ts")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[m],
                    "is_view": is_v[m],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            empty = pa.table(
                {
                    "purchase_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "view_id": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
            if u.size == 0:
                return empty
            seq = group.column("seq").to_numpy(zero_copy_only=False)
            tus = group.column("tus").to_numpy(zero_copy_only=False)
            isv = group.column("is_view").to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, tus, u))
            u_s, seq_s, t_s, v_s = u[order], seq[order], tus[order], isv[order]
            n = u_s.shape[0]
            pos = np.arange(n, dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
            marker = np.where(v_s, pos, np.int64(-1))
            ff = np.maximum.accumulate(marker)
            prev_ff = np.r_[np.int64(-1), ff[:-1]]
            ok = (~v_s) & (prev_ff >= seg_start)
            if not ok.any():
                return empty
            vp = prev_ff[ok]
            return pa.table(
                {
                    "purchase_id": seq_s[ok],
                    "user_id": u_s[ok],
                    "view_id": seq_s[vp],
                    "gap_us": t_s[ok] - t_s[vp],
                }
            )

        keyed = ev.map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
        )
        return keyed.groupby("bucket").map_groups(
            fold, batch_format="pyarrow"
        )

    def q_order_running_totals(sf):
        # per-customer running order totals (billing-balance
        # transform): ONE custkey-bucket shuffle, exact segmented
        # cumsum (global cumsum + per-segment rebase), input-sized out
        from python_prtree_ray.pipelines.windows import running_totals
        import ray

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        return running_totals(
            od,
            key_col="o_custkey",
            order_cols=("o_orderdate", "o_orderkey"),
            value_col="o_totalprice",
        )

    def q_user_journeys(sf):
        # path mining: each user's first-4 event-type sequence, counted
        # across users — types recode to ints against a metadata
        # vocabulary, ONE user-bucket shuffle, base-B digit pack
        import pyarrow as pa
        import pyarrow.compute as _pc
        import ray
        from python_prtree_ray.pipelines.windows import user_journeys

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        )

        def tstage(tbl: pa.Table) -> pa.Table:
            return pa.table({"t": _pc.unique(tbl.column("event_type"))})

        types = sorted(
            {
                r["t"]
                for r in ev.map_batches(
                    tstage, batch_format="pyarrow", zero_copy_batch=True
                ).take_all()
            }
        )
        return user_journeys(ev, types, k=4)

    def q_record_events(sf):
        # per-user record-breaking events (running max, segmented
        # doubling scan — no per-entity Python); record-sized output
        from python_prtree_ray.pipelines.windows import record_events
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
        return record_events(ev)

    def q_cohort_retention(sf):
        # first-active-week cohort x week-offset retention triangle:
        # exact distinct-user counts via the one-bucket-per-user fold
        from python_prtree_ray.pipelines.windows import cohort_retention
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )
        return cohort_retention(ev)

    def q_max_dwell_run(sf):
        # gaps-and-islands: longest same-tile streak per user (exact
        # run-length fold vs the double-ROW_NUMBER SQL islands trick)
        from python_prtree_ray.pipelines.movement import max_dwell_run

        return max_dwell_run(_event_tracks(sf, DWELL_RES), res=DWELL_RES)

    def q_od_asymmetry(sf):
        # directional flow imbalance per unordered tile pair: forward /
        # reverse counts + net, metadata-sized pair partials
        from python_prtree_ray.pipelines.movement import od_asymmetry

        return od_asymmetry(_event_tracks(sf, MOTIF_RES), res=MOTIF_RES)

    def q_covisit_tile_pairs(sf):
        # co-visitation between PLACES: tile pairs sharing >= 4 distinct
        # visitors — per-user distinct-tile fold, offset-sweep pair
        # expansion (a<b for free), ONE pair-key sum
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.functions.cells import cell_of_points
        from python_prtree_ray.pipelines.merge import bucketed_sum

        MIN_USERS = 4
        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        )
        g2 = np.int64(1 << STAY_RES) ** 2

        def prep(tbl: pa.Table) -> pa.Table:
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            cell = cell_of_points(p["px"], p["py"], STAY_RES)
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            order = np.lexsort((cell, u))
            u_s, c_s = u[order], cell[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])][: u_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(u_s[keep], 256),
                    "u": u_s[keep],
                    "cell": c_s[keep],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return empty
            c = group.column("cell").to_numpy(zero_copy_only=False)
            order = np.lexsort((c, u))
            u_s, c_s = u[order], c[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])][: u_s.size]
            u_s, c_s = u_s[keep], c_s[keep]
            pa_l, pb_l = [], []
            d = 1
            while d < u_s.size:
                valid = u_s[d:] == u_s[:-d]
                if not valid.any():
                    break
                pa_l.append(c_s[:-d][valid])
                pb_l.append(c_s[d:][valid])
                d += 1
            if not pa_l:
                return empty
            a = np.concatenate(pa_l)
            b = np.concatenate(pb_l)
            key, n = np.unique(a * g2 + b, return_counts=True)
            return pa.table({"key": key, "n": n.astype(np.int64)})

        keyed = ev.map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
        )
        folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
        summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

        def finish(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            n = tbl.column("n").to_numpy(zero_copy_only=False)
            keep = n >= MIN_USERS
            return pa.table(
                {
                    "cell_a": key[keep] // g2,
                    "cell_b": key[keep] % g2,
                    "n_users": n[keep],
                }
            )

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_co_travelers(sf):
        # co-traveler detection (the covisit dual): user PAIRS
        # co-present in >= 3 distinct (tile, day) buckets — distinct
        # (bucket, user) fold, offset-sweep pair expansion inside each
        # spatiotemporal-bucket group (a<b for free from the sort),
        # ONE pair-key sum. Pair fanout is per-bucket quadratic by
        # SEMANTICS (the oracle self-join blows up identically); the
        # day x 16x16 grid keeps buckets small and unskewed here.
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.functions.cells import cell_of_points
        from python_prtree_ray.pipelines.merge import bucketed_sum

        MIN_SHARED = 3
        US_DAY = 86_400_000_000
        g2 = np.int64(1 << STAY_RES) ** 2
        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            p = derive.derive_points(eid)
            cell = cell_of_points(p["px"], p["py"], STAY_RES)
            day = (
                tbl.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
                // US_DAY
            )
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if u.size and int(u.max()) >= (1 << 31):
                raise ValueError("user_id must fit 31 bits for pair packing")
            st = day * g2 + cell
            order = np.lexsort((u, st))
            s_s, u_s = st[order], u[order]
            keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (u_s[1:] != u_s[:-1])][: s_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(s_s[keep], 256),
                    "st": s_s[keep],
                    "u": u_s[keep],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
            st = group.column("st").to_numpy(zero_copy_only=False)
            if st.size == 0:
                return empty
            u = group.column("u").to_numpy(zero_copy_only=False)
            order = np.lexsort((u, st))
            s_s, u_s = st[order], u[order]
            keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (u_s[1:] != u_s[:-1])][: s_s.size]
            s_s, u_s = s_s[keep], u_s[keep]
            pa_l, pb_l = [], []
            d = 1
            while d < s_s.size:
                valid = s_s[d:] == s_s[:-d]
                if not valid.any():
                    break
                pa_l.append(u_s[:-d][valid])
                pb_l.append(u_s[d:][valid])
                d += 1
            if not pa_l:
                return empty
            a = np.concatenate(pa_l)
            b = np.concatenate(pb_l)
            key, n = np.unique(a * np.int64(1 << 31) + b, return_counts=True)
            return pa.table({"key": key, "n": n.astype(np.int64)})

        keyed = ev.map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
        )
        folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
        summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

        def finish(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            n = tbl.column("n").to_numpy(zero_copy_only=False)
            keep = n >= MIN_SHARED
            return pa.table(
                {
                    "user_a": key[keep] // np.int64(1 << 31),
                    "user_b": key[keep] % np.int64(1 << 31),
                    "n_shared": n[keep],
                }
            )

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_travel_groups(sf):
        # travel-group inference: connected components over the
        # co-traveler pair graph — users linked by >= 3 shared
        # (tile, day) buckets collapse to groups labeled by min user
        # id (composition: co_travelers -> min-label propagation CC)
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.graph import connected_components

        pairs = q_co_travelers(sf)

        def rename(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": tbl.column("doc_id"),
                    "group_id": tbl.column("cluster_id"),
                }
            )

        renamed = connected_components(
            pairs, id_a="user_a", id_b="user_b"
        ).map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
        # 0-row seed keeps the schema visible when the pair graph is
        # empty (map_batches never runs on a block-less dataset)
        seed = ray.data.from_arrow(
            pa.schema(
                [("user_id", pa.int64()), ("group_id", pa.int64())]
            ).empty_table()
        )
        return seed.union(renamed)

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

    def q_top_routes(sf):
        # top-k OD corridors by traffic: pruned global top-k over the
        # transition matrix, (n DESC, packed pair ASC) order
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import global_topk

        od = q_od_matrix(sf)
        g2 = np.int64(1 << TILE_RES) ** 2

        def pack(tbl: pa.Table) -> pa.Table:
            f = tbl.column("from_cell").to_numpy(zero_copy_only=False)
            t = tbl.column("to_cell").to_numpy(zero_copy_only=False)
            return pa.table(
                {"key": f * g2 + t, "n_moves": tbl.column("n_moves")}
            )

        top = global_topk(
            od.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
            k=50,
            id_col="key",
            value_col="n_moves",
        )

        def decode(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "from_cell": key // g2,
                    "to_cell": key % g2,
                    "n_moves": tbl.column("n_moves"),
                    "rank": tbl.column("rank"),
                }
            )

        return top.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)

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

    def q_tile_motifs(sf):
        # trajectory sequence mining: global top-k consecutive tile
        # trigrams (route motifs) — triple fold + pruned global top-k
        from python_prtree_ray.pipelines.movement import tile_motifs

        return tile_motifs(_event_tracks(sf, MOTIF_RES), res=MOTIF_RES, k=50)

    def q_trajectory_length(sf):
        # per-user L1 path length over time-ordered georeferenced events
        # (exact integer grid -> LAG-window SQL twin is bit-identical)
        from python_prtree_ray.pipelines.trajectory import trajectory_length

        return trajectory_length(_event_tracks(sf, TRACK_RES))

    def _event_points(sf):
        # georeferenced event stream with RAW float coordinates:
        # (user_id, ts, event_id, px, py)
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
                    "event_id": tbl.column("event_id"),
                    "px": p["px"],
                    "py": p["py"],
                }
            )

        return ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)

    def q_geofence_events(sf):
        # per-user zone entry/exit transitions against the broadcast
        # hexagon set (zone = containing poly or -1); the containment
        # cross-product expression is shared with pip, so the SQL twin
        # (LEFT JOIN + LAG) matches bitwise
        from python_prtree_ray.pipelines.geofence import geofence_events

        return geofence_events(_event_points(sf))

    def q_segment_crossings(sf):
        # path-conflict join: movement segments of different users that
        # intersect (exact int64 orientation tests, closed semantics);
        # teleport-gated (L-inf <= 128 grid units), tile-bucketed with
        # owner-corner exactly-once emission
        from python_prtree_ray.pipelines.geofence import segment_crossings

        return segment_crossings(
            _event_tracks(sf, TRACK_RES), max_move=128, res=TRACK_RES, bucket_res=3
        )

    def q_trajectory_hull(sf):
        # per-user convex hull of visited grid points (coverage
        # footprint): exact integer monotone chain, CCW ring from the
        # lexicographically smallest vertex; pytest-oracled vs a
        # gift-wrapping reference, no SQL twin (ring order)
        from python_prtree_ray.pipelines.trajectory import trajectory_hull

        return trajectory_hull(_event_tracks(sf, TRACK_RES))

    def q_od_matrix(sf):
        # origin->destination tile flow matrix over consecutive
        # same-user moves (coarse TILE_RES grid keeps the matrix dense)
        from python_prtree_ray.pipelines.movement import od_matrix

        return od_matrix(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def q_cell_dwell(sf):
        # per-tile visit count + exact dwell microseconds (gap to next
        # event attributed to the earlier event's tile)
        from python_prtree_ray.pipelines.movement import cell_dwell

        return cell_dwell(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def q_speed_outliers(sf):
        # GPS-glitch detector: consecutive same-user moves whose implied
        # great-circle speed exceeds SPEED_KMH_T; haversine expression
        # shapes mirror the SQL twin token-for-token (bitwise doubles)
        from python_prtree_ray.pipelines.movement import speed_outliers

        return speed_outliers(_event_points(sf), max_kmh=SPEED_KMH_T)

    def q_event_transitions(sf):
        # event-type Markov transition counts per user stream; types
        # shuffle as int codes from a metadata-sized vocabulary pass
        import ray

        from python_prtree_ray.pipelines.movement import event_transitions

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
        )
        return event_transitions(ev)

    def q_kmeans(sf):
        # deterministic distributed Lloyd's k-means over the embedding
        # table (exact-int quantized: parallelism-invariant; pytest
        # asserts equivalence to the single-process reference)
        import ray

        from python_prtree_ray.pipelines.kmeans import kmeans

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return kmeans(emb, k=8, iters=4)

    def q_nn_pairs(sf):
        # nearest-other-point per customer point: self-kNN composition
        # over the existing knn machinery (degenerate-box tree side)
        from python_prtree_ray.pipelines.knn import nn_pairs

        return nn_pairs(tables.points_dataset(sf))

    def q_mutual_nn(sf):
        # NN-graph symmetry: share of points whose nearest neighbor
        # points back — ONE co-partitioned self-join of the nn stream
        # (never collected), single-row exact counts
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.knn import nn_pairs

        nn = nn_pairs(tables.points_dataset(sf))
        right = nn.map_batches(
            lambda t: pa.table(
                {"rq": t.column("query_id"), "rnn": t.column("nn_id")}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = hash_equi_join(
            nn, right,
            on="nn_id", right_on="rq",
            left_cols=("query_id",),
            right_cols=("rnn",),
        )

        def partial(tbl: pa.Table) -> pa.Table:
            q = tbl.column("query_id").to_numpy(zero_copy_only=False)
            rnn = tbl.column("rnn").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "k": pa.array([np.int64(0)], pa.int64()),
                    "n_points": pa.array([np.int64(q.size)], pa.int64()),
                    "n_mutual": pa.array(
                        [np.int64((q == rnn).sum())], pa.int64()
                    ),
                }
            )

        from python_prtree_ray.pipelines.merge import bucketed_sum

        summed = bucketed_sum(
            joined.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="k",
            value_cols=("n_points", "n_mutual"),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            n = tbl.column("n_points").to_numpy(zero_copy_only=False)
            m = tbl.column("n_mutual").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_points": n,
                    "n_mutual": m,
                    "share": m.astype(np.float64) / n.astype(np.float64),
                }
            )

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

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

    def q_grouped_moments(sf):
        # per-event-type exact integer moments (n, sum, sum-sq, min,
        # max in cents) — variance/correlation building block
        import ray

        from python_prtree_ray.pipelines.stats import grouped_moments

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "value"]
        )
        return grouped_moments(ev)

    def q_value_histogram(sf):
        # per-event-type fixed-width value histogram in cents bins
        import ray

        from python_prtree_ray.pipelines.stats import value_histogram

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "value"]
        )
        return value_histogram(ev)

    def q_knn_geo(sf):
        # great-circle kNN: 5 nearest customers per supplier by
        # haversine; ranks on the portable 'a' term, libm asin only on
        # winners; query side broadcast, big side never shuffles
        from python_prtree_ray.pipelines.geodesic import knn_geo

        return knn_geo(
            tables.points_dataset(sf),
            tables.points_dataset(sf, "supplier", "s_suppkey"),
            k=5,
        )

    def q_lifecycle(sf):
        # build on even keys, insert odd keys, erase keys % 10 == 0, query:
        # exercises delta + tombstone + query union (reference
        # insert/erase/rebuild round-trip semantics at table level)
        from python_prtree_ray.api import RayPRTree
        import pyarrow as pa

        boxes = tables.boxes_dataset(sf)

        def even(t: pa.Table) -> pa.Table:
            ids = t.column("idx").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == 0))

        def odd(t: pa.Table) -> pa.Table:
            ids = t.column("idx").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == 1))

        tree = RayPRTree(
            boxes.map_batches(even, batch_format="pyarrow", zero_copy_batch=True),
            res=RES,
            strict=False,
        )
        tree.insert_batch(
            boxes.map_batches(odd, batch_format="pyarrow", zero_copy_batch=True)
        )
        def dead_only(t: pa.Table) -> pa.Table:
            ids = t.column("idx").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 10 == 0))

        # filter distributed FIRST; only the tombstoned 10% reaches the driver
        dead_rows = (
            tables.boxes_dataset(sf)
            .select_columns(["idx"])
            .map_batches(dead_only, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        dead = np.array([r["idx"] for r in dead_rows], np.int64)
        tree.erase(dead)  # non-strict: records a generational tombstone, no key check
        return tree.batch_query(tables.query_boxes_dataset(sf))

    def q_dedup_exact(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return dedup.dedup_exact(docs)

    def q_token_stats(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return text.token_stats(docs)

    def q_pii_scrub(sf):
        # email/URL redaction report: pure Arrow RE2 count + global
        # replace, zero shuffle (both sides RE2, semantics identical).
        # The synthetic corpus carries no PII, so even doc_ids get a
        # deterministic contact footer (same expression as the oracle)
        # to exercise both patterns and the replacement-length math.
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )

        def enrich(tbl: pa.Table) -> pa.Table:
            ids = tbl.column("doc_id")
            ids_s = pc.cast(ids, pa.string())
            footer = pc.binary_join_element_wise(
                tbl.column("text"),
                " reach user",
                ids_s,
                "@mail.example or https://docs.example/",
                ids_s,
                "",
            )
            even = pc.equal(pc.bit_wise_and(ids, 1), 0)
            return pa.table(
                {
                    "doc_id": ids,
                    "text": pc.if_else(even, footer, tbl.column("text")),
                }
            )

        return text.pii_scrub(
            docs.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
        )

    def q_doc_compress(sf):
        # per-doc zlib compressibility quality signal: actor-pool stage
        # (compressor built once per actor, per-row body is one C call).
        # Deflate has no ANSI-SQL twin -> rows-only; exactness vs direct
        # zlib and parallelism invariance are pytest-checked
        import ray
        from python_prtree_ray.pipelines.text import compress_ratio

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return compress_ratio(docs)

    def q_doc_lm_freq(sf):
        # unigram corpus-frequency LM proxy: ONE vocab-sized hash fold +
        # broadcast, then a map-only searchsorted scoring pass
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return curation.doc_lm_freq(docs)

    def q_doc_chunks(sf):
        # context-window chunk layout (128-token windows, stride 96):
        # map-only vectorized explode, chunk metadata only — no text ships
        import ray
        from python_prtree_ray.pipelines.packing import doc_chunks

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_chunks(docs)

    def q_quality(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return text.quality_score(docs)

    def q_lang_id(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return text.lang_id(docs)

    def q_doc_len_rank(sf):
        # GROUPED percent-rank enrichment: each doc's exact length
        # percentile WITHIN its language — per-(lang, n_tokens) histogram
        # (bounded grid) broadcast once, searchsorted per batch
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
        )

        def lens(tbl: pa.Table) -> pa.Table:
            toks = pc.cast(
                pc.list_value_length(
                    pc.split_pattern_regex(tbl.column("text"), r"\s+")
                ),
                pa.int64(),
            )
            return pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "lang": tbl.column("lang"),
                    "n_tokens": toks,
                }
            )

        sized = docs.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)

        def hist_partial(tbl: pa.Table) -> pa.Table:
            enc = pc.dictionary_encode(tbl.column("lang")).combine_chunks()
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
            order = np.lexsort((n, code))
            c_s, n_s = code[order], n[order]
            starts = np.flatnonzero(
                np.r_[True, (c_s[1:] != c_s[:-1]) | (n_s[1:] != n_s[:-1])][: c_s.size]
            )
            return pa.table(
                {
                    "lang": enc.dictionary.take(pa.array(c_s[starts])),
                    "n_tokens": n_s[starts],
                    "cnt": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
                }
            )

        # (lang, length) grid is bounded: langs x distinct lengths
        hist: dict = {}
        parts = sized.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        for ref in parts.to_arrow_refs():
            t = ray.get(ref)
            for lg, nt, c in zip(
                t.column("lang").to_pylist(),
                t.column("n_tokens").to_pylist(),
                t.column("cnt").to_pylist(),
            ):
                hist[(lg, nt)] = hist.get((lg, nt), 0) + c
        per_lang = {}
        for (lg, nt), c in sorted(hist.items()):
            per_lang.setdefault(lg, [[], []])
            per_lang[lg][0].append(nt)
            per_lang[lg][1].append(c)
        cdf = {}
        for lg, (vals, cnts) in per_lang.items():
            v = np.array(vals, np.int64)
            c = np.array(cnts, np.int64)
            smaller = np.r_[np.int64(0), np.cumsum(c)[:-1]]
            cdf[lg] = (v, smaller, int(c.sum()))
        ref_c = ray.put(cdf)

        def rank(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            table = ray.get(ref_c)
            out_pct = np.zeros(tbl.num_rows, np.float64)
            langs = tbl.column("lang").to_numpy(zero_copy_only=False)
            n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
            for lg in np.unique(langs):
                v, sm, tot = table[str(lg)]
                m = langs == lg
                pos = np.searchsorted(v, n[m])
                out_pct[m] = (
                    sm[pos].astype(np.float64) / np.float64(tot - 1)
                    if tot > 1
                    else 0.0
                )
            return pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "lang": tbl.column("lang"),
                    "n_tokens": tbl.column("n_tokens"),
                    "pct": out_pct,
                }
            )

        return sized.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)

    def q_session_duration_quantiles(sf):
        # session-length distribution: exact R-7 quantiles of per-user
        # session durations (30-min gap sessionization, µs)
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.quantiles import int_quantiles

        GAP = 1_800_000_000
        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts", "event_id"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "bucket": bucket_of(u, 256),
                    "u": u,
                    "t": pc.cast(
                        tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
                    ),
                    "seq": tbl.column("event_id"),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {
                        "k": pa.array([], pa.int64()),
                        "dur_us": pa.array([], pa.int64()),
                    }
                )
            t = group.column("t").to_numpy(zero_copy_only=False)
            seq = group.column("seq").to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, t, u))
            u_s, t_s = u[order], t[order]
            new = np.r_[True, (u_s[1:] != u_s[:-1]) | (t_s[1:] - t_s[:-1] > GAP)][: u_s.size]
            starts = np.flatnonzero(new)
            ends = np.r_[starts[1:], u_s.size] - 1
            dur = t_s[ends] - t_s[starts]
            return pa.table(
                {"k": np.zeros(dur.size, np.int64), "dur_us": dur}
            )

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return int_quantiles(folded, key_col="k", int_col="dur_us")

    def q_lang_confusion(sf):
        # label-quality confusion matrix: stored lang × predicted lang
        # counts — the heuristic's evaluation grid; C²-bounded fold
        import pyarrow as pa
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        pred = text.lang_id(docs, carry_cols=("lang",))

        def partial(tbl: pa.Table) -> pa.Table:
            a = tbl.column("lang").to_numpy(zero_copy_only=False)
            b = tbl.column("lang_pred").to_numpy(zero_copy_only=False)
            order = np.lexsort((b, a))
            a_s, b_s = a[order], b[order]
            starts = np.flatnonzero(
                np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][: a_s.size]
            )
            return pa.table(
                {
                    "k": np.zeros(starts.size, np.int64),
                    "lang": pa.array(a_s[starts], pa.string()),
                    "lang_pred": pa.array(b_s[starts], pa.string()),
                    "n": np.diff(np.r_[starts, a_s.size]).astype(np.int64),
                }
            )

        def final(group: pa.Table) -> pa.Table:
            a = group.column("lang").to_numpy(zero_copy_only=False)
            if a.size == 0:
                return pa.table(
                    {
                        "lang": pa.array([], pa.string()),
                        "lang_pred": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            b = group.column("lang_pred").to_numpy(zero_copy_only=False)
            n = group.column("n").to_numpy(zero_copy_only=False)
            order = np.lexsort((b, a))
            a_s, b_s, n_s = a[order], b[order], n[order]
            starts = np.flatnonzero(
                np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][: a_s.size]
            )
            return pa.table(
                {
                    "lang": pa.array(a_s[starts], pa.string()),
                    "lang_pred": pa.array(b_s[starts], pa.string()),
                    "n": np.add.reduceat(n_s, starts),
                }
            )

        return (
            pred.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(final, batch_format="pyarrow")
            .select_columns(["lang", "lang_pred", "n"])
        )

    def q_value_drift(sf):
        # distribution-shift screen: per type, early-half vs late-half
        # mean value with the exact cross-multiplied shift numerator
        # n_e·S_l − n_l·S_e (sign = drift direction, no division until
        # the two emitted means)
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "ts", "value"]
        )

        def ts_us(tbl):
            return pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)

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
        for ref in ev.map_batches(
            minmax, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows == 0:
                continue
            blo = pc.min(t.column("lo")).as_py()
            bhi = pc.max(t.column("hi")).as_py()
            lo = blo if lo is None else min(lo, blo)
            hi = bhi if hi is None else max(hi, bhi)
        mid = (lo + hi) // 2

        def partial(tbl: pa.Table) -> pa.Table:
            enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            late = ts_us(tbl) > mid
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(code, kind="stable")
            c_s, l_s, v_s = code[order], late[order], cents[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
            n_all = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
            n_late = np.add.reduceat(l_s.astype(np.int64), starts)
            s_all = np.add.reduceat(v_s, starts)
            s_late = np.add.reduceat(np.where(l_s, v_s, 0), starts)
            return pa.table(
                {
                    "event_type": enc.dictionary.take(pa.array(c_s[starts])),
                    "n_early": n_all - n_late,
                    "n_late": n_late,
                    "s_early": s_all - s_late,
                    "s_late": s_late,
                }
            )

        parts = ev.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )

        def add_k(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "k", pa.array(np.zeros(tbl.num_rows, np.int64))
            )

        def final(group: pa.Table) -> pa.Table:
            et = group.column("event_type").to_numpy(zero_copy_only=False)
            if et.size == 0:
                return pa.table(
                    {
                        "event_type": pa.array([], pa.string()),
                        "mean_early": pa.array([], pa.float64()),
                        "mean_late": pa.array([], pa.float64()),
                        "shift_num": pa.array([], pa.int64()),
                    }
                )
            cols = {
                c: group.column(c).to_numpy(zero_copy_only=False)
                for c in ("n_early", "n_late", "s_early", "s_late")
            }
            order = np.argsort(et, kind="stable")
            e_s = et[order]
            starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]][: e_s.size])
            ne = np.add.reduceat(cols["n_early"][order], starts)
            nl = np.add.reduceat(cols["n_late"][order], starts)
            se = np.add.reduceat(cols["s_early"][order], starts)
            sl = np.add.reduceat(cols["s_late"][order], starts)
            return pa.table(
                {
                    "event_type": pa.array(e_s[starts], pa.string()),
                    "mean_early": se.astype(np.float64) / ne.astype(np.float64),
                    "mean_late": sl.astype(np.float64) / nl.astype(np.float64),
                    "shift_num": ne * sl - nl * se,
                }
            )

        return (
            parts.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(final, batch_format="pyarrow")
            .select_columns(
                ["event_type", "mean_early", "mean_late", "shift_num"]
            )
        )

    def q_lapsed_customers(sf):
        # reverse-direction anti join: dimension rows with NO fact match
        # in the stream's final 365 days — the active-key set folds to
        # customer-sized metadata, broadcast once, filter the dimension
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        DAY = 86_400_000_000
        all_orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )

        def maxdate(tbl: pa.Table) -> pa.Table:
            us = pc.cast(
                tbl.column("o_orderdate").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            if us.size == 0:
                return pa.table({"hi": pa.array([], pa.int64())})
            return pa.table({"hi": pa.array([int(us.max())], pa.int64())})

        hi = None
        for ref0 in all_orders.map_batches(
            maxdate, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs():
            t = ray.get(ref0)
            if t.num_rows:
                v = pc.max(t.column("hi")).as_py()
                hi = v if hi is None else max(hi, v)
        cutoff = hi - 365 * DAY

        def partial(tbl: pa.Table) -> pa.Table:
            us = pc.cast(
                tbl.column("o_orderdate").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            keep = us >= cutoff
            k = np.unique(
                tbl.column("o_custkey").to_numpy(zero_copy_only=False)[keep]
            )
            return pa.table({"k": k, "one": np.ones(k.size, np.int64)})

        orders = all_orders

        keys = bucketed_sum(
            orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="k",
            value_cols=("one",),
        )
        have = []
        for ref in keys.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                have.append(t.column("k").to_numpy(zero_copy_only=False))
        have_sorted = np.sort(np.concatenate(have)) if have else np.zeros(0, np.int64)
        ref_k = ray.put(have_sorted)

        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
        )

        def anti(tbl: pa.Table) -> pa.Table:
            ks = ray.get(ref_k)
            c = tbl.column("c_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            hit = _isin_sorted(ks, c)
            return tbl.filter(pa.array(~hit))

        return cust.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)

    def q_token_pieces(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return text.token_pieces(docs)

    def q_simhash_pairs(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        # exact for max_hamming <= bands-1; hash-seeded values → rows-only
        return dedup.simhash_pairs(docs, max_hamming=3)

    def q_pack_documents(sf):
        import ray
        from python_prtree_ray.pipelines.packing import pack_documents

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        # assignment is algorithm-defined (greedy fill) → rows-only;
        # invariants (budget respected, all docs assigned, deterministic
        # across partitioning) are pytest-checked
        return pack_documents(docs, budget=512)

    def q_doc_fingerprint(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        # rolling-hash winnowing fingerprint — hash-seeded, no ANSI-SQL
        # twin (rows-only); determinism across parallelism is pytest-checked
        return text.fingerprint(docs)

    def q_span_sequence(sf):
        # the north-rule per-row invariant, driver-checked end to end:
        # every span of every interleaved doc as (doc_id, seq, offset,
        # kind, text, media_ref) — hash-compared against the DuckDB
        # regeneration (synth.interleaved_spans_sql(kinds="all")), so
        # kind/text/media_ref/order equality is a hash-green gate, not
        # just a pytest assertion.
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import explode_spans

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        return interleaved_docs(n).map_batches(
            explode_spans, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_span_tiles(sf):
        # span-LEVEL georeferencing (north-rule: "georeferencing each
        # document's spans"): deterministic point + quadkey tile per
        # span, full row set hash-checked vs the SQL corpus twin
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import span_tiles

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        return span_tiles(interleaved_docs(n), res=TILE_RES)

    def q_span_box_join(sf):
        # the north-star composite as an ORACLE-CHECKED query: the
        # interleaved-span corpus georeferenced at SPAN granularity and
        # box-intersection-joined against the orders box set — the
        # flagship bench pipeline's join stage, value-hash checked
        # (query_id = sid = doc_num*16 + seq identifies the span)
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from python_prtree_ray.pipelines.multimodal import span_tiles
        from python_prtree_ray.sources.synth import interleaved_docs

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        spans = span_tiles(interleaved_docs(n), res=TILE_RES)

        def to_points(tbl: pa.Table) -> pa.Table:
            doc_num = pc.cast(
                pc.utf8_slice_codeunits(
                    tbl.column("doc_id").combine_chunks(), 3
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            seq = (
                tbl.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pa.table(
                {
                    "query_id": doc_num * 16 + seq,
                    "px": tbl.column("px"),
                    "py": tbl.column("py"),
                }
            )

        pts = spans.map_batches(
            to_points, batch_format="pyarrow", zero_copy_batch=True
        )
        return sj.point_query(tables.boxes_dataset(sf), pts, res=RES)

    def q_span_windows(sf):
        # multimodal context-window packing: cumulative-cost window
        # assignment over ordered spans (text = word count, media =
        # fixed cost); zero-shuffle Arrow offset arithmetic
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import span_windows

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        return span_windows(
            interleaved_docs(n), budget=SPAN_BUDGET, media_tokens=SPAN_MEDIA_TOK
        )

    def q_doc_modality(sf):
        # per-doc modality profile of the interleaved spans (span
        # counts per kind + text chars): zero-shuffle Arrow offset
        # arithmetic, hash-checked against the DuckDB span regeneration
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import doc_modality

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        return doc_modality(interleaved_docs(n))

    def q_span_transitions(sf):
        # modality-transition matrix of the interleaved corpus: per-
        # batch <=16-int partials via masked bincount over span-kind
        # codes, one tiny fold; exact ints
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import span_transitions

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        return span_transitions(interleaved_docs(n))

    def q_video_frames(sf):
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import video_frame_pipeline

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        # every=2 so frame counts VARY with the stub payload length
        # (1-2 frames) — the SQL twin reproduces count and byte totals
        return video_frame_pipeline(interleaved_docs(n), every=2)

    def q_events_window(sf):
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["ts", "event_type", "value"]
        )
        return windows.tumbling_window_agg(ev)

    def q_emb_covariance(sf):
        # exact covariance matrix of the embedding corpus on the
        # 2^20 scaled-int grid: per-batch integer-matmul moment
        # partials, vectors never shuffle
        import ray
        from python_prtree_ray.pipelines.ann import emb_covariance

        vec = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding"]
        )
        return emb_covariance(vec)

    def q_ann_topk(sf):
        import ray
        import pyarrow.parquet as pq

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        # query vectors: the first 10 embeddings (deterministic)
        head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
        qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
        qids = head.column("vec_id").to_numpy(zero_copy_only=False)
        res = ann.ann_brute_topk(emb, qv, qids, k=ANN_K)
        return res.select_columns(["query_id", "vec_id", "rank"])

    def q_ann_range(sf):
        # cosine RANGE search (radius twin of ann_topk): broadcast query
        # matrix, map-only matmul, no merge stage — membership only,
        # same oracle float-parity contract as embedding_neardup_exact
        import pyarrow.parquet as pq
        import ray

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
        qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
        qids = head.column("vec_id").to_numpy(zero_copy_only=False)
        return ann.ann_range(emb, qv, qids, threshold=ANN_RANGE_T)

    def q_simhash(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return dedup.simhash_64(docs)

    def q_minhash_pairs(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return dedup.minhash_pairs(docs, jaccard_threshold=0.4)

    def q_embedding_neardup(sf):
        import ray

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        # testdata cosines top out ≈0.5-0.6, so probe at 0.4 with wide
        # buckets (bits=4) — per-pair recall ≈0.75 at this low threshold;
        # exact twin below is the oracle-checked ground truth
        return dedup.embedding_neardup_pairs(
            emb, threshold=0.4, n_tables=8, n_bits=4
        )

    def q_embedding_neardup_exact(sf):
        import ray

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return dedup.embedding_neardup_exact(emb, threshold=0.45)

    def q_ngram_jaccard(sf):
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)

    def q_events_hopping(sf):
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["ts", "event_type", "value"]
        )
        return windows.hopping_window_agg(ev, window_hours=2, hop_hours=1)

    def q_events_session(sf):
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["ts", "event_type", "user_id", "value"]
        )
        return windows.session_window_agg(ev, gap_minutes=30)

    def q_events_sessionized(sf):
        # per-event session labeling (the assignment step the session
        # aggregate is built on) — windowed-join surface over the stream
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["ts", "event_type", "user_id", "event_id"],
        )
        return windows.sessionize_events(ev, gap_minutes=30)

    def q_user_features(sf):
        # per-user ML feature vector (counts, per-type counts, first/last
        # seen, integer value sum) — map-side combine, one tiny shuffle
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        return windows.user_activity_features(ev)

    def q_value_quantiles(sf):
        import ray
        from python_prtree_ray.pipelines.quantiles import value_quantiles

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "value"]
        )
        return value_quantiles(ev)

    def q_distinct_users(sf):
        import ray
        from python_prtree_ray.pipelines.sketch import distinct_users

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "user_id"]
        )
        return distinct_users(ev)

    def q_distinct_users_hll(sf):
        import ray
        from python_prtree_ray.pipelines.sketch import distinct_users_hll

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "user_id"]
        )
        return distinct_users_hll(ev)

    def q_top_events(sf):
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "event_type", "value"]
        )
        return windows.top_events_per_type(ev, k=10)

    def q_spatial_join_obj(sf):
        # return_obj parity: a payload column rides the box batches and is
        # projected straight into the join output (no second join)
        import pyarrow as pa

        def with_obj(t: pa.Table) -> pa.Table:
            ids = t.column("idx").to_numpy(zero_copy_only=False)
            obj = np.char.add("obj-", ids.astype(str))
            return t.append_column("obj", pa.array(obj, type=pa.string()))

        boxes = tables.boxes_dataset(sf).map_batches(
            with_obj, batch_format="pyarrow", zero_copy_batch=True
        )
        return sj.broadcast_join(
            boxes, tables.query_boxes_table(sf), carry_cols=("obj",)
        )

    def q_batch_query_lists(sf):
        return sj.aggregate_match_csv(
            sj.spatial_join(
                tables.boxes_dataset(sf), tables.query_boxes_dataset(sf), res=RES
            )
        )

    def q_spatial_join_3d(sf):
        return sj.broadcast_join(
            tables.boxes_3d_dataset(sf),
            tables.query_boxes_3d_table(sf),
            box_cols=tables.BOX3D_COLS,
        )

    def q_spatial_join_4d(sf):
        return sj.broadcast_join(
            tables.boxes_4d_dataset(sf),
            tables.query_boxes_4d_table(sf),
            box_cols=tables.BOX4D_COLS,
        )

    def q_media_features(sf):
        # interleaved-docs media spans → actor-pool feature extraction
        # (decode stubbed — no media libs in env; plumbing is real).
        # Features are float32 window-means/255; the driver-checked shape
        # un-normalizes them back to the INTEGER window sums (lossless:
        # rint(f * 8 * 255) — float32 error << 0.5), so the DuckDB twin
        # compares float64-exactly.
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        from python_prtree_ray.sources.synth import interleaved_docs
        from python_prtree_ray.pipelines.multimodal import media_feature_pipeline

        n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
        feats = media_feature_pipeline(interleaved_docs(n))

        def unnorm(tbl: pa.Table) -> pa.Table:
            fl = tbl.column("features").combine_chunks()
            mat = (
                _pc.list_flatten(fl)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(len(fl), 8)
            )
            sums = np.rint(mat * (8.0 * 255.0)).astype(np.int64)
            cols = {
                "doc_id": tbl.column("doc_id"),
                "offset": tbl.column("offset"),
                "kind": tbl.column("kind"),
            }
            for k in range(8):
                cols[f"f{k}"] = pa.array(sums[:, k])
            return pa.table(cols)

        return feats.map_batches(unnorm, batch_format="pyarrow", zero_copy_batch=True)

    def q_doc_sample(sf):
        import ray
        from python_prtree_ray.pipelines.sample import hash_sample

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        return hash_sample(docs, "doc_id", rate_pct=5)

    def q_props_extract(sf):
        import ray
        from python_prtree_ray.pipelines.text import extract_json_int

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "props"]
        )
        return extract_json_int(ev, "props", "k")

    def q_doc_sample_stratified(sf):
        import ray
        from python_prtree_ray.pipelines.sample import stratified_sample

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        return stratified_sample(
            docs, "doc_id", "lang", {"en": 10, "de": 40, "fr": 25}
        )

    def q_events_enriched(sf):
        import ray
        import pyarrow.parquet as pq
        from python_prtree_ray.pipelines.lookup import broadcast_lookup

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        )
        cust = pq.read_table(
            f"{sf}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_mktsegment"],
        )
        return broadcast_lookup(
            ev, cust, on="user_id", small_on="c_custkey",
            carry_cols=("c_nationkey", "c_mktsegment"),
        )

    def q_cell_histogram(sf):
        return tiling.cell_histogram(tables.boxes_dataset(sf), res=TILE_RES)

    def q_raster_tiles(sf):
        return tiling.raster_tile_join(tables.boxes_dataset(sf), res=TILE_RES)

    def q_asof_purchase_view(sf):
        import ray
        import pyarrow.compute as _pc
        from python_prtree_ray.pipelines.asof import asof_join

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "event_type", "user_id", "ts"]
        )

        def side(kind, idname):
            def f(t):
                import pyarrow as pa
                m = _pc.equal(t.column("event_type"), kind)
                t = t.filter(m)
                return pa.table({idname: t.column("event_id"), "user_id": t.column("user_id"), "ts": t.column("ts")})
            return f

        left = ev.map_batches(side("purchase", "l_id"), batch_format="pyarrow", zero_copy_batch=True)
        right = ev.map_batches(side("view", "r_id"), batch_format="pyarrow", zero_copy_batch=True)
        return asof_join(left, right)

    def q_events_band_join(sf):
        # windowed 1:N join: every view in the hour BEFORE each purchase
        # by the same user (the band sibling of the asof join)
        import ray
        import pyarrow.compute as _pc
        from python_prtree_ray.pipelines.asof import band_join

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "event_type", "user_id", "ts"]
        )

        def side(kind, idname):
            def f(t):
                import pyarrow as pa
                m = _pc.equal(t.column("event_type"), kind)
                t = t.filter(m)
                return pa.table({idname: t.column("event_id"), "user_id": t.column("user_id"), "ts": t.column("ts")})
            return f

        left = ev.map_batches(side("purchase", "l_id"), batch_format="pyarrow", zero_copy_batch=True)
        right = ev.map_batches(side("view", "r_id"), batch_format="pyarrow", zero_copy_batch=True)
        return band_join(left, right)

    def q_session_join(sf):
        # session-scoped stream-stream join: (purchase, view) pairs in
        # the SAME gap-session of the same user — any event type keeps
        # the session alive (one user-bucket shuffle, vectorized pairing)
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        return windows.session_join(ev, "purchase", "view", gap_minutes=30)

    def q_funnel_counts(sf):
        # ordered-funnel user counts (signup -> click -> purchase by
        # strict first-occurrence time): per-batch min combine, one
        # user-keyed min-reduce, tiny count fold
        import ray
        from python_prtree_ray.pipelines.agg import funnel_counts

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        return funnel_counts(ev)

    def q_pricing_summary(sf):
        # TPC-H Q1-shaped scan aggregate in exact integer cents:
        # per-batch combine to <=6 partial rows, no raw-row shuffle
        import ray
        from python_prtree_ray.pipelines.agg import pricing_summary

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_shipdate",
            ],
        )
        return pricing_summary(li)

    def q_spatial_semi(sf):
        # spatial EXISTS filter: order boxes hit by >=1 customer region
        # (map-only bitmask probe — never materializes the pair fan-out)
        return sj.spatial_semi_join(
            tables.boxes_dataset(sf), tables.query_boxes_dataset(sf), anti=False
        )

    def q_spatial_anti(sf):
        # spatial NOT-EXISTS: order boxes intersecting NO customer region
        return sj.spatial_semi_join(
            tables.boxes_dataset(sf), tables.query_boxes_dataset(sf), anti=True
        )

    def q_source_dedup_stats(sf):
        # per-source dedup report (n_docs, n_unique) — text never
        # shuffles; two bounded reduces over (source, hash) partials
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["text", "source"]
        )
        return dedup.source_dedup_stats(docs)

    def q_ann_classify(sf):
        # kNN-vote label transfer: majority label among each query's
        # exact cosine top-k (tie -> smallest label); label column IS
        # needed here (the vote), so this read keeps all three columns
        import ray
        import pyarrow.parquet as pq

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
        qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
        qids = head.column("vec_id").to_numpy(zero_copy_only=False)
        return ann.ann_classify(emb, qv, qids, k=ANN_K)

    def q_doc_sample_weighted(sf):
        # length-proportional deterministic sampling (hash-gated,
        # parallelism-invariant): keep chance = min(n_chars // 5, 100)%
        import ray
        from python_prtree_ray.pipelines.sample import weighted_sample

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        return weighted_sample(docs, "doc_id", "n_chars", divisor=5)

    def q_region_rollup(sf):
        # snowflake rollup: customers counted + acctbal cents summed per
        # REGION through the nation->region dimension chain (driver-built
        # LUT rides the closure; the fact table never shuffles raw)
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.agg import mapped_rollup

        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
        )
        reg = pq.read_table(
            f"{sf}/region.parquet", columns=["r_regionkey", "r_name"]
        )
        n2r = dict(
            zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_regionkey").to_pylist(),
            )
        )
        rname = dict(
            zip(
                reg.column("r_regionkey").to_pylist(),
                reg.column("r_name").to_pylist(),
            )
        )
        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
        )
        rolled = mapped_rollup(cust, "c_nationkey", "c_acctbal", n2r)

        def attach(tbl):
            import pyarrow as pa

            g = tbl.column("gkey").to_pylist()
            return pa.table(
                {
                    "r_name": pa.array([rname[v] for v in g], pa.string()),
                    "n_customers": tbl.column("n_rows"),
                    "acctbal_c": tbl.column("sum_c"),
                }
            )

        return rolled.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def q_interval_join(sf):
        # per-user temporal interval join (view inside [purchase, +2h])
        # expressed as the existing 2D spatial join: time on x, the user
        # key embedded as an exact-hash point on y — no new join code
        import pyarrow as pa
        import pyarrow.compute as _pc
        import ray
        from python_prtree_ray.pipelines.interval import interval_point_join

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "event_type", "user_id", "ts"],
        )

        def side(kind, idname):
            def f(t):
                t = t.filter(_pc.equal(t.column("event_type"), kind))
                return pa.table(
                    {
                        idname: t.column("event_id"),
                        "user_id": t.column("user_id"),
                        "ts": t.column("ts"),
                    }
                )

            return f

        left = ev.map_batches(side("purchase", "l_id"), batch_format="pyarrow", zero_copy_batch=True)
        right = ev.map_batches(side("view", "r_id"), batch_format="pyarrow", zero_copy_batch=True)
        return interval_point_join(left, right, window_us=2 * 3600 * 1_000_000)

    def q_events_unmatched(sf):
        # anti-join: facts whose user has NO supplier row (NOT EXISTS)
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        )
        sup = pq.read_table(f"{sf}/supplier.parquet", columns=["s_suppkey"])
        return broadcast_lookup(
            ev, sup, on="user_id", small_on="s_suppkey", how="anti"
        )

    def q_text_normalize(sf):
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return text.normalize_text(docs)

    def q_source_jaccard(sf):
        # corpus-mixing diagnostic: pairwise vocabulary Jaccard between
        # sources — distinct (word, source-bitmask) partials, ONE
        # word-hash shuffle, per-bucket integer matmul into a sources x
        # sources fold; tokens never shuffle
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["source", "text"]
        )
        return curation.source_jaccard(docs)

    def q_doc_repetition(sf):
        # Gopher-style repetition stats: per-doc bigram totals/distinct/
        # max — all batch-local (doc rows are atomic), ZERO shuffle
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return curation.doc_repetition(docs)

    def q_decontaminate(sf):
        # benchmark decontamination: corpus docs sharing any word 4-gram
        # with the doc_id%97==0 "benchmark" subset; gram set broadcast
        # once via ray.put, corpus pass zero-shuffle
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return curation.decontaminate(docs, n=4, bench_modulus=97)

    def q_dup_ngram_coverage(sf):
        # exact-substring-dedup coverage: per-doc count of 3-gram
        # positions duplicated in >=1 other doc; gram-bucket fold, text
        # never shuffles
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return curation.dup_ngram_coverage(docs, n=3)

    def q_search_topk(sf):
        # integer tf-idf retrieval: global top-20 docs for a fixed term
        # set; tiny df aggregate + threshold-pruned global_topk merge
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return curation.search_topk(docs, terms=("spark", "join", "window"), k=20)

    def q_search_bm25(sf):
        # BM25 retrieval (k1=1.5, b=0.75, rational idf — every op is
        # ordered IEEE arithmetic, so the SQL twin matches the float64
        # scores bitwise); same fused-partials + pruned-top-k shape
        import ray
        from python_prtree_ray.pipelines import curation

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return curation.search_bm25(docs, terms=("spark", "join", "window"), k=20)

    def q_events_enriched_left(sf):
        # LEFT broadcast lookup: unmatched facts kept with NULL carries
        # (filled to -1 so the float-NaN-free oracle compare is exact)
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id"]
        )
        sup = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        out = broadcast_lookup(
            ev, sup, on="user_id", small_on="s_suppkey",
            carry_cols=("s_nationkey",), how="left",
        )

        def fill(tbl: pa.Table) -> pa.Table:
            col = _pc.cast(
                _pc.fill_null(tbl.column("s_nationkey"), -1), pa.int64()
            )
            return tbl.set_column(
                tbl.schema.get_field_index("s_nationkey"), "s_nationkey", col
            )

        return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)

    def q_events_rolling(sf):
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
        return windows.rolling_window_sum(ev, window_minutes=30)

    def q_lineitem_orders(sf):
        # big-big shuffle equi-join: both sides too large to broadcast,
        # co-partitioned on a coarse key-hash bucket, vectorized in-bucket
        # range-match (pipelines/join.py)
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_quantity"],
        )
        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        return hash_equi_join(
            li, od,
            on="l_orderkey", right_on="o_orderkey",
            left_cols=("l_linenumber", "l_quantity"),
            right_cols=("o_custkey",),
        )

    def q_orders_cust_left(sf):
        # LEFT flavor of the co-partitioned shuffle join: unmatched
        # orders keep a sentinel name ('' after fill) — same one-shuffle
        # plan as inner (pipelines/join.py, how="left")
        import pyarrow as pa
        import pyarrow.compute as _pc
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        cu = ray.data.read_parquet(
            f"{sf}/customer.parquet",
            columns=["c_custkey", "c_name", "c_mktsegment"],
        ).filter(expr="c_mktsegment == 'BUILDING'").select_columns(
            ["c_custkey", "c_name"]
        )
        out = hash_equi_join(
            od, cu,
            on="o_custkey", right_on="c_custkey",
            left_cols=("o_orderkey",), right_cols=("c_name",),
            how="left",
        )

        def fill(tbl: pa.Table) -> pa.Table:
            col = _pc.fill_null(tbl.column("c_name"), "")
            return tbl.set_column(
                tbl.schema.get_field_index("c_name"), "cname", col
            )

        return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)

    def q_orders_cust_outer(sf):
        # FULL-OUTER flavor: only every-third order survives the left
        # filter, so both sides contribute unmatched rows (sentinel-fill
        # -1 / '' keeps the driver hash NaN-free)
        import pyarrow as pa
        import pyarrow.compute as _pc
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join

        def every_third(t: pa.Table) -> pa.Table:
            ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ok % 3 == 0))

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(every_third, batch_format="pyarrow", zero_copy_batch=True)
        cu = ray.data.read_parquet(
            f"{sf}/customer.parquet",
            columns=["c_custkey", "c_name", "c_mktsegment"],
        ).filter(expr="c_mktsegment == 'BUILDING'").select_columns(
            ["c_custkey", "c_name"]
        )
        out = hash_equi_join(
            od, cu,
            on="o_custkey", right_on="c_custkey",
            left_cols=("o_orderkey",), right_cols=("c_name",),
            how="outer",
        )

        def fill(tbl: pa.Table) -> pa.Table:
            tbl = tbl.set_column(
                tbl.schema.get_field_index("o_orderkey"),
                "o_orderkey",
                _pc.fill_null(tbl.column("o_orderkey"), -1),
            )
            return tbl.set_column(
                tbl.schema.get_field_index("c_name"),
                "cname",
                _pc.fill_null(tbl.column("c_name"), ""),
            )

        return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)

    def q_orders_with_returns(sf):
        # SEMI flavor: orders having at least one returned lineitem —
        # each order emitted once regardless of match multiplicity
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
        ).filter(expr="l_returnflag == 'R'").select_columns(["l_orderkey"])
        return hash_equi_join(
            od, li,
            on="o_orderkey", right_on="l_orderkey",
            left_cols=("o_custkey",),
            how="semi",
        )

    def q_orders_no_returns(sf):
        # ANTI flavor on the same shapes: orders with NO returned lineitem
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
        ).filter(expr="l_returnflag == 'R'").select_columns(["l_orderkey"])
        return hash_equi_join(
            od, li,
            on="o_orderkey", right_on="l_orderkey",
            left_cols=("o_custkey",),
            how="anti",
        )

    def q_orders_semi_bloom(sf):
        # the BLOOM-GATED physical plan for the same semi join driven
        # through the driver oracle: right keys fold to a 1-Mbit filter,
        # left rows drop map-side BEFORE the shuffle, exact semi join
        # verifies survivors — identical rows to orders_with_returns
        import ray
        from python_prtree_ray.pipelines.join import bloom_semi_join

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
        ).filter(expr="l_returnflag == 'R'").select_columns(["l_orderkey"])
        return bloom_semi_join(
            od, li,
            on="o_orderkey", right_on="l_orderkey",
            left_cols=("o_custkey",),
        )

    def q_q3_revenue(sf):
        # TPC-H Q3-shaped composite: broadcast dim filter (customer →
        # orders, zero shuffle) + map-side revenue combine + ONE groupby
        # shuffle + co-partitioned semi join. Revenue in integer cents so
        # the distributed sum is order-independent and oracle-exact.
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup

        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        import pyarrow.compute as _pc

        bkeys = cust.filter(
            _pc.equal(cust.column("c_mktsegment"), "BUILDING")
        ).select(["c_custkey"])
        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        filt_orders = broadcast_lookup(
            orders, bkeys, on="o_custkey", small_on="c_custkey"
        ).select_columns(["o_orderkey"])

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )

        def rev_partial(tbl: pa.Table) -> pa.Table:
            ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
            cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
            order = np.argsort(ok, kind="stable")
            ks, cs = ok[order], cents[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "l_orderkey": ks[starts],
                    "revenue_cents": np.add.reduceat(cs, starts),
                }
            )

        # FUSED per-key sum + semi join: the aggregate and the join share
        # the key, so they share ONE bucket shuffle (separate aggregate
        # and join stages would pay the all-to-all twice — and Ray's
        # native sort-based Aggregate on this high-cardinality key costs
        # ~10s where the fused bucketed reduceat costs one shuffle)
        from python_prtree_ray.pipelines.join import sum_semi_join

        return sum_semi_join(
            li.map_batches(
                rev_partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            filt_orders,
            on="l_orderkey",
            right_on="o_orderkey",
            value_cols=("revenue_cents",),
        )

    def q_top_revenue(sf):
        # global order statistic at scale: top-100 orders by revenue via
        # map-side per-batch top-k prune + one tiny single-group merge
        from python_prtree_ray.pipelines.merge import global_topk

        return global_topk(
            q_q3_revenue(sf), k=100, id_col="l_orderkey", value_col="revenue_cents"
        )

    def q_co_purchase_parts(sf):
        # market-basket over orders: unordered part pairs bought in the
        # same order, pairs appearing in >= 2 orders; ONE order-bucket
        # fold (offset-sweep pair expansion over the sorted distinct
        # parts of each order), ONE pair-key sum
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum

        MIN_ORDERS = 2
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            o = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
            p = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            order = np.lexsort((p, o))
            o_s, p_s = o[order], p[order]
            keep = np.r_[True, (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])][: o_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(o_s[keep], 256),
                    "o": o_s[keep],
                    "p": p_s[keep],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
            o = group.column("o").to_numpy(zero_copy_only=False)
            if o.size == 0:
                return empty
            p = group.column("p").to_numpy(zero_copy_only=False)
            order = np.lexsort((p, o))
            o_s, p_s = o[order], p[order]
            keep = np.r_[True, (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])][: o_s.size]
            o_s, p_s = o_s[keep], p_s[keep]
            pa_l, pb_l = [], []
            d = 1
            while d < o_s.size:
                valid = o_s[d:] == o_s[:-d]
                if not valid.any():
                    break
                pa_l.append(p_s[:-d][valid])  # sorted within order -> a < b
                pb_l.append(p_s[d:][valid])
                d += 1
            if not pa_l:
                return empty
            a = np.concatenate(pa_l)
            b = np.concatenate(pb_l)
            # parts fit 21 bits at test scale; guard the pack
            if b.max() >= (1 << 31):
                raise ValueError("co_purchase_parts: partkey exceeds pack")
            key, n = np.unique(a * (1 << 31) + b, return_counts=True)
            return pa.table({"key": key, "n": n.astype(np.int64)})

        keyed = li.map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
        )
        folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
        summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

        def finish(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            n = tbl.column("n").to_numpy(zero_copy_only=False)
            keep = n >= MIN_ORDERS
            return pa.table(
                {
                    "part_a": key[keep] >> 31,
                    "part_b": key[keep] & ((1 << 31) - 1),
                    "n_orders": n[keep],
                }
            )

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_weekly_anomaly(sf):
        # anomaly z-scores of the weekly revenue series: exact integer
        # moments over the week-sized series, z = (n·x − S)/√(n·Q − S²)
        # as ONE shared double expression (correctly-rounded sqrt)
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.windows import WEEK_US

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            us = (
                tbl.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            week = us // WEEK_US
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(week, kind="stable")
            w_s, c_s = week[order], cents[order]
            starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]][: w_s.size])
            return pa.table(
                {
                    "week": w_s[starts],
                    "revenue_cents": np.add.reduceat(c_s, starts),
                }
            )

        rows = bucketed_sum(
            orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="week",
            value_cols=("revenue_cents",),
        ).take_all()  # week-sized series
        weeks = np.array([r["week"] for r in rows], np.int64)
        x = np.array([r["revenue_cents"] for r in rows], np.int64).astype(object)
        n = x.size
        S = int(x.sum())
        Q = int((x * x).sum())
        var = n * Q - S * S
        z = np.array(
            [
                float(n * int(v) - S) / np.sqrt(np.float64(float(var)))
                if var > 0
                else 0.0
                for v in x
            ],
            np.float64,
        )
        order = np.argsort(weeks)
        return ray.data.from_arrow(
            pa.table(
                {
                    "week": weeks[order],
                    "revenue_cents": np.array(
                        [int(v) for v in x], np.int64
                    )[order],
                    "z": z[order],
                }
            )
        )

    def q_local_supplier_volume(sf):
        # TPC-H Q5-shaped multiway join: revenue by nation where the
        # supplier and the ordering customer share a nation. Three dim
        # tables broadcast via ray.put (zero shuffle); ONE co-partitioned
        # big-big join on orderkey; integer-cents revenue partials fold
        # map-side so only nation-sized rows reach the final sum.
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        supp = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        o2 = broadcast_lookup(
            orders, cust, on="o_custkey", small_on="c_custkey",
            carry_cols=("c_nationkey",),
        ).select_columns(["o_orderkey", "c_nationkey"])

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )

        def prep(tbl: pa.Table) -> pa.Table:
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
            cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
            return pa.table(
                {
                    "l_orderkey": tbl.column("l_orderkey"),
                    "l_suppkey": tbl.column("l_suppkey"),
                    "cents": cents,
                }
            )

        li2 = broadcast_lookup(
            li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
            supp, on="l_suppkey", small_on="s_suppkey",
            carry_cols=("s_nationkey",),
        ).select_columns(["l_orderkey", "s_nationkey", "cents"])

        joined = hash_equi_join(
            li2, o2,
            on="l_orderkey", right_on="o_orderkey",
            left_cols=("s_nationkey", "cents"),
            right_cols=("c_nationkey",),
        )

        def agg(tbl: pa.Table) -> pa.Table:
            sn = tbl.column("s_nationkey").to_numpy(zero_copy_only=False)
            cn = tbl.column("c_nationkey").to_numpy(zero_copy_only=False)
            cents = tbl.column("cents").to_numpy(zero_copy_only=False)
            keep = sn == cn
            nk = sn[keep].astype(np.int64)
            c = cents[keep]
            order = np.argsort(nk, kind="stable")
            nk_s, c_s = nk[order], c[order]
            starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
            return pa.table(
                {
                    "n_nationkey": nk_s[starts],
                    "revenue_cents": np.add.reduceat(c_s, starts)
                    if nk_s.size
                    else np.zeros(0, np.int64),
                }
            )

        summed = bucketed_sum(
            joined.map_batches(
                agg, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="n_nationkey",
            value_cols=("revenue_cents",),
        )
        return broadcast_lookup(
            summed, nat, on="n_nationkey", small_on="n_nationkey",
            carry_cols=("n_name",),
        ).select_columns(["n_name", "revenue_cents"])

    def q_part_best_supplier(sf):
        # per-part cheapest offer (TPC-H Q2-flavored argmin join): the
        # (supplier, cents) lineitem minimizing (cents, suppkey) per
        # part — map-side k=1 prune, ONE key-bucket shuffle
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import grouped_topk

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )

        def prep(tbl: pa.Table) -> pa.Table:
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_partkey": tbl.column("l_partkey"),
                    "l_suppkey": tbl.column("l_suppkey"),
                    "cents": np.floor(ep * 100.0).astype(np.int64),
                }
            )

        best = grouped_topk(
            li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
            k=1,
            key_col="l_partkey",
            id_col="l_suppkey",
            value_col="cents",
            descending=False,
        )
        return best.select_columns(["l_partkey", "l_suppkey", "cents"])

    def q_ship_delay_quantiles(sf):
        # exact R-7 quantiles of the order→ship latency in whole days,
        # grouped by order priority class: ONE co-partitioned big-big
        # join (int64 payloads only — the priority string is recoded to
        # its leading digit before the shuffle), then the distinct-value
        # histogram quantile fold
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.quantiles import int_quantiles

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )

        def oprep(tbl: pa.Table) -> pa.Table:
            prio = pc.cast(
                pc.utf8_slice_codeunits(tbl.column("o_orderpriority"), 0, 1),
                pa.int64(),
            )
            od = pc.cast(tbl.column("o_orderdate"), pa.int64())
            return pa.table(
                {"o_orderkey": tbl.column("o_orderkey"), "prio": prio, "od_us": od}
            )

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )

        def lprep(tbl: pa.Table) -> pa.Table:
            sd = pc.cast(tbl.column("l_shipdate"), pa.int64())
            return pa.table(
                {"l_orderkey": tbl.column("l_orderkey"), "ship_us": sd}
            )

        joined = hash_equi_join(
            li.map_batches(lprep, batch_format="pyarrow", zero_copy_batch=True),
            orders.map_batches(oprep, batch_format="pyarrow", zero_copy_batch=True),
            on="l_orderkey",
            right_on="o_orderkey",
            left_cols=("ship_us",),
            right_cols=("prio", "od_us"),
        )

        def delay(tbl: pa.Table) -> pa.Table:
            ship = tbl.column("ship_us").to_numpy(zero_copy_only=False)
            od = tbl.column("od_us").to_numpy(zero_copy_only=False)
            days = (ship - od) // 86_400_000_000
            return pa.table({"prio": tbl.column("prio"), "days": days})

        return int_quantiles(
            joined.map_batches(delay, batch_format="pyarrow", zero_copy_batch=True),
            key_col="prio",
            int_col="days",
        )

    def q_returns_revenue_share(sf):
        # conditional-aggregate ratio per nation: returned-lineitem
        # revenue share — (total, returned) int-cents partials fold
        # map-side; supplier dim broadcast; ONE nation-sized sum
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        supp = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_returnflag"],
        )
        li2 = broadcast_lookup(
            li, supp, on="l_suppkey", small_on="s_suppkey",
            carry_cols=("s_nationkey",),
        )

        def partial(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
            cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
            ret = pc.equal(tbl.column("l_returnflag"), "R").to_numpy(
                zero_copy_only=False
            )
            nk = tbl.column("s_nationkey").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            order = np.argsort(nk, kind="stable")
            nk_s, c_s, r_s = nk[order], cents[order], ret[order]
            starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
            return pa.table(
                {
                    "n_nationkey": nk_s[starts],
                    "revenue_cents": np.add.reduceat(c_s, starts),
                    "returned_cents": np.add.reduceat(
                        np.where(r_s, c_s, 0), starts
                    ),
                }
            )

        summed = bucketed_sum(
            li2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="n_nationkey",
            value_cols=("revenue_cents", "returned_cents"),
        )
        named = broadcast_lookup(
            summed, nat, on="n_nationkey", small_on="n_nationkey",
            carry_cols=("n_name",),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            tot = tbl.column("revenue_cents").to_numpy(zero_copy_only=False)
            ret = tbl.column("returned_cents").to_numpy(zero_copy_only=False)
            share = ret.astype(np.float64) / tot.astype(np.float64)
            return pa.table(
                {
                    "n_name": tbl.column("n_name"),
                    "revenue_cents": tot,
                    "returned_cents": ret,
                    "returned_share": share,
                }
            )

        return named.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_cust_order_histogram(sf):
        # two-level aggregate: per-customer order counts, then the
        # distribution of those counts — both levels pre-combined
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_custkey"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            k, n = np.unique(
                tbl.column("o_custkey").to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table({"o_custkey": k, "n_orders": n.astype(np.int64)})

        per_cust = bucketed_sum(
            orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="o_custkey",
            value_cols=("n_orders",),
        )

        def hist_partial(tbl: pa.Table) -> pa.Table:
            k, n = np.unique(
                tbl.column("n_orders").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"n_orders": k, "n_customers": n.astype(np.int64)})

        return bucketed_sum(
            per_cust.map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="n_orders",
            value_cols=("n_customers",),
        )

    def q_discount_revenue(sf):
        # TPC-H Q6 shape: pure filtered aggregate — revenue forgone on
        # mid-band discounts in a one-year ship window, in exact
        # cents×basis-point ints (1e-4 dollars) so the distributed sum
        # is order-independent and oracle-exact. One partial row per
        # batch leaves the map; the driver folds the metadata-sized
        # partials in Python bigints (no int64 ceiling at any corpus
        # size).
        import pyarrow as pa
        import ray

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        lo = np.datetime64("1996-01-01", "us")
        hi = np.datetime64("1997-01-01", "us")

        def partial(tbl: pa.Table) -> pa.Table:
            sd = tbl.column("l_shipdate").to_numpy(zero_copy_only=False)
            disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
            qty = tbl.column("l_quantity").to_numpy(zero_copy_only=False)
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            bp = np.floor(disc * 100.0 + 0.5).astype(np.int64)
            keep = (sd >= lo) & (sd < hi) & (bp >= 2) & (bp <= 6) & (qty < 24.0)
            cents = np.floor(ep[keep] * 100.0).astype(np.int64)
            return pa.table(
                {
                    "revenue_e4": pa.array(
                        [int(np.sum(cents * bp[keep]))], pa.int64()
                    ),
                    "n_items": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        rows = li.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        return ray.data.from_arrow(
            pa.table(
                {
                    "revenue_e4": pa.array(
                        [sum(int(r["revenue_e4"]) for r in rows)], pa.int64()
                    ),
                    "n_items": pa.array(
                        [sum(int(r["n_items"]) for r in rows)], pa.int64()
                    ),
                }
            )
        )

    def q_nation_trade_pairs(sf):
        # TPC-H Q7 shape: bilateral trade volume by (supplier nation,
        # customer nation, ship year). Both nation attachments are
        # broadcast dim lookups (supplier and customer never shuffle);
        # the ONE all-to-all is the co-partitioned lineitem⋈orders hash
        # join; the (s, c, year) rollup packs into a single int key and
        # folds map-side, so only ≤ nations²×years partial rows reach
        # the final tiny exchange.
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        sup = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
        if nk.max() >= 32:
            raise ValueError("nation_trade_pairs: nationkey packing needs < 32")
        names = dict(zip(nk.tolist(), nat.column("n_name").to_pylist()))

        li = broadcast_lookup(
            ray.data.read_parquet(
                f"{sf}/lineitem.parquet",
                columns=[
                    "l_orderkey",
                    "l_suppkey",
                    "l_shipdate",
                    "l_extendedprice",
                    "l_discount",
                ],
            ),
            sup,
            on="l_suppkey",
            small_on="s_suppkey",
            carry_cols=("s_nationkey",),
        )

        def li_map(tbl: pa.Table) -> pa.Table:
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            bp = np.floor(
                tbl.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
                + 0.5
            ).astype(np.int64)
            cents = np.floor(ep * 100.0).astype(np.int64)
            sd = tbl.column("l_shipdate").to_numpy(zero_copy_only=False)
            year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
            return pa.table(
                {
                    "l_orderkey": tbl.column("l_orderkey"),
                    "supp": tbl.column("s_nationkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "year": year,
                    "rev_e4": cents * (100 - bp),
                }
            )

        li2 = li.map_batches(
            li_map, batch_format="pyarrow", zero_copy_batch=True
        )
        orders = broadcast_lookup(
            ray.data.read_parquet(
                f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
            ),
            cust,
            on="o_custkey",
            small_on="c_custkey",
            carry_cols=("c_nationkey",),
        )

        def ord_map(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey"),
                    "custn": tbl.column("c_nationkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )

        joined = hash_equi_join(
            li2,
            orders.map_batches(
                ord_map, batch_format="pyarrow", zero_copy_batch=True
            ),
            on="l_orderkey",
            right_on="o_orderkey",
            left_cols=("supp", "year", "rev_e4"),
            right_cols=("custn",),
        )

        def pack_partial(tbl: pa.Table) -> pa.Table:
            supp = tbl.column("supp").to_numpy(zero_copy_only=False)
            custn = tbl.column("custn").to_numpy(zero_copy_only=False)
            year = tbl.column("year").to_numpy(zero_copy_only=False)
            rev = tbl.column("rev_e4").to_numpy(zero_copy_only=False)
            keep = supp != custn
            key = ((supp[keep] * 32 + custn[keep]) * 4096) + year[keep]
            rev = rev[keep]
            order = np.argsort(key, kind="stable")
            ks, rs = key[order], rev[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {"pk": ks[starts], "revenue_e4": np.add.reduceat(rs, starts)}
            )

        summed = bucketed_sum(
            joined.map_batches(
                pack_partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="pk",
            value_cols=("revenue_e4",),
        )

        def decode(tbl: pa.Table) -> pa.Table:
            pk = tbl.column("pk").to_numpy(zero_copy_only=False)
            sc = pk // 4096 // 32
            cc = (pk // 4096) % 32
            return pa.table(
                {
                    "supp_nation": pa.array(
                        [names[int(s)] for s in sc], pa.string()
                    ),
                    "cust_nation": pa.array(
                        [names[int(c)] for c in cc], pa.string()
                    ),
                    "year": pk % 4096,
                    "revenue_e4": tbl.column("revenue_e4"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_segment_order_dist(sf):
        # TPC-H Q13 shape: orders-per-customer distribution split by
        # market segment, INCLUDING zero-order customers — the
        # left-join histogram. Order counts fold map-side; the zero
        # bins come from per-segment customer totals minus
        # customers-seen (both metadata-sized), so neither the customer
        # table nor the raw orders ever shuffle.
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        segs = sorted(set(cust.column("c_mktsegment").to_pylist()))
        seg_code = {s: i for i, s in enumerate(segs)}
        seg_col = np.array(
            [seg_code[s] for s in cust.column("c_mktsegment").to_pylist()],
            np.int64,
        )
        cust = cust.append_column("seg", pa.array(seg_col))
        seg_totals = np.bincount(seg_col, minlength=len(segs))

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_custkey"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            k, n = np.unique(
                tbl.column("o_custkey").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"o_custkey": k, "n_orders": n.astype(np.int64)})

        per_cust = bucketed_sum(
            orders.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="o_custkey",
            value_cols=("n_orders",),
        )
        enriched = broadcast_lookup(
            per_cust,
            cust,
            on="o_custkey",
            small_on="c_custkey",
            carry_cols=("seg",),
        )

        def hist_partial(tbl: pa.Table) -> pa.Table:
            seg = tbl.column("seg").to_numpy(zero_copy_only=False)
            n = tbl.column("n_orders").to_numpy(zero_copy_only=False)
            key = seg * (1 << 32) + n
            k, c = np.unique(key, return_counts=True)
            return pa.table({"sk": k, "n_customers": c.astype(np.int64)})

        hist = bucketed_sum(
            enriched.map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="sk",
            value_cols=("n_customers",),
        ).take_all()  # ≤ segments × max-orders-per-customer: metadata
        sk = np.array([r["sk"] for r in hist], np.int64)
        nc = np.array([r["n_customers"] for r in hist], np.int64)
        seg_out = (sk >> 32).tolist()
        n_out = (sk & ((1 << 32) - 1)).tolist()
        c_out = nc.tolist()
        seen = np.bincount((sk >> 32), weights=nc, minlength=len(segs)).astype(
            np.int64
        )
        for i, s in enumerate(segs):
            zero = int(seg_totals[i] - seen[i])
            if zero > 0:
                seg_out.append(i)
                n_out.append(0)
                c_out.append(zero)
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_mktsegment": pa.array(
                        [segs[i] for i in seg_out], pa.string()
                    ),
                    "n_orders": pa.array(n_out, pa.int64()),
                    "n_customers": pa.array(c_out, pa.int64()),
                }
            )
        )

    def q_small_qty_revenue(sf):
        # TPC-H Q17 shape: revenue on below-one-fifth-of-average
        # quantity lineitems for one brand's parts. The per-part
        # average is an exact integer cross-multiply (5·n·qty < Σqty —
        # no division), folded in ONE pass over the brand-filtered
        # stream and broadcast back (one brand's part list is
        # dim-sized); the second streaming pass filters and sums cents
        # map-side.
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        part = pq.read_table(
            f"{sf}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        keys = part.filter(
            _pc.equal(part.column("p_brand"), "Brand#1")
        ).select(["p_partkey"])

        def brand_li(cols):
            return broadcast_lookup(
                ray.data.read_parquet(f"{sf}/lineitem.parquet", columns=cols),
                keys,
                on="l_partkey",
                small_on="p_partkey",
            )

        def stat_partial(tbl: pa.Table) -> pa.Table:
            k = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            q = np.floor(
                tbl.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            order = np.argsort(k, kind="stable")
            ks, qs = k[order], q[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "l_partkey": ks[starts],
                    "n": np.diff(np.r_[starts, ks.size]).astype(np.int64),
                    "sq": np.add.reduceat(qs, starts),
                }
            )

        stats = bucketed_sum(
            brand_li(["l_partkey", "l_quantity"]).map_batches(
                stat_partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="l_partkey",
            value_cols=("n", "sq"),
        ).take_all()  # one row per brand part: dim-sized
        sk = np.array([r["l_partkey"] for r in stats], np.int64)
        sn = np.array([r["n"] for r in stats], np.int64)
        ssq = np.array([r["sq"] for r in stats], np.int64)
        order = np.argsort(sk, kind="stable")
        ref = ray.put((sk[order], sn[order], ssq[order]))

        def below_partial(tbl: pa.Table) -> pa.Table:
            kk, nn, qq = ray.get(ref)
            k = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            q = np.floor(
                tbl.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            cents = np.floor(
                tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            pos = np.searchsorted(kk, k)  # every key survived the same gate
            keep = (5 * nn[pos] * q) < qq[pos]
            ks, cs = k[keep], cents[keep]
            order = np.argsort(ks, kind="stable")
            ks, cs = ks[order], cs[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "p_partkey": ks[starts],
                    "below_cents": np.add.reduceat(cs, starts),
                    "n_below": np.diff(np.r_[starts, ks.size]).astype(
                        np.int64
                    ),
                }
            )

        return bucketed_sum(
            brand_li(["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
                below_partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="p_partkey",
            value_cols=("below_cents", "n_below"),
        )

    def q_large_orders(sf):
        # TPC-H Q18 shape: large-volume orders — per-order quantity
        # fold map-side, threshold filter, then ONE co-partitioned hash
        # join back to orders for the customer and price columns (the
        # surviving set is selectivity-bound, so it stays a big-big
        # join rather than an assumed-broadcastable side).
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.merge import bucketed_sum

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            k = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
            q = np.floor(
                tbl.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            order = np.argsort(k, kind="stable")
            ks, qs = k[order], q[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "o_orderkey": ks[starts],
                    "total_qty": np.add.reduceat(qs, starts),
                }
            )

        sums = bucketed_sum(
            li.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="o_orderkey",
            value_cols=("total_qty",),
        )

        def thresh(tbl: pa.Table) -> pa.Table:
            tq = tbl.column("total_qty").to_numpy(zero_copy_only=False)
            return tbl.filter(pa.array(tq > 150))

        def ord_map(tbl: pa.Table) -> pa.Table:
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey"),
                    "o_custkey": tbl.column("o_custkey"),
                    "price_cents": cents,
                }
            )

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ).map_batches(ord_map, batch_format="pyarrow", zero_copy_batch=True)
        return hash_equi_join(
            sums.map_batches(
                thresh, batch_format="pyarrow", zero_copy_batch=True
            ),
            orders,
            on="o_orderkey",
            left_cols=("total_qty",),
            right_cols=("o_custkey", "price_cents"),
        )

    def q_promo_revenue(sf):
        # TPC-H Q14 shape: promotional revenue share by ship month —
        # the PROMO part-key set broadcasts once via ray.put (parts
        # never shuffle), each batch folds to ≤ n-months rows of
        # (promo, total) int partials, and the share stays a pair of
        # exact ints (no decimal division to mismatch).
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        part = pq.read_table(
            f"{sf}/part.parquet", columns=["p_partkey", "p_type"]
        )
        pk = np.sort(
            part.filter(_pc.equal(part.column("p_type"), "PROMO"))
            .column("p_partkey")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ref = ray.put(pk)

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=[
                "l_partkey",
                "l_shipdate",
                "l_extendedprice",
                "l_discount",
            ],
        )

        def partial(tbl: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            k = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            hit = _isin_sorted(keys, k)
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            bp = np.floor(
                tbl.column("l_discount").to_numpy(zero_copy_only=False)
                * 100.0
                + 0.5
            ).astype(np.int64)
            rev = np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
            mo = (
                tbl.column("l_shipdate")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[M]")
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            order = np.argsort(mo, kind="stable")
            ms, rs, hs = mo[order], rev[order], hit[order]
            starts = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1]][: ms.size])
            return pa.table(
                {
                    "month_us": ms[starts],
                    "promo_e4": np.add.reduceat(np.where(hs, rs, 0), starts),
                    "total_e4": np.add.reduceat(rs, starts),
                }
            )

        summed = bucketed_sum(
            li.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="month_us",
            value_cols=("promo_e4", "total_e4"),
        )

        def decode(tbl: pa.Table) -> pa.Table:
            m = tbl.column("month_us").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "month": pa.array(
                        m.astype("datetime64[us]"), pa.timestamp("us")
                    ),
                    "promo_e4": tbl.column("promo_e4"),
                    "total_e4": tbl.column("total_e4"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_benford_hist(sf):
        # pricing-pattern audit, Benford flavor: distribution of the
        # LEADING digit of order totals (in exact cents) — the fraud /
        # synthetic-data screen companion of cents_mod_hist. The digit
        # comes from an integer→string slice (no log10, so both sides
        # are exact on every value)
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_totalprice"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            digit = (
                pc.cast(
                    pc.utf8_slice_codeunits(
                        pc.cast(pa.array(cents), pa.string()), 0, 1
                    ),
                    pa.int64(),
                )
                .to_numpy(zero_copy_only=False)
            )
            d, c = np.unique(digit, return_counts=True)
            return pa.table({"digit": d, "n_orders": c.astype(np.int64)})

        return bucketed_sum(
            orders.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="digit",
            value_cols=("n_orders",),
        )

    def q_user_max_drawdown(sf):
        # account-balance risk profile: per-user maximum drawdown of the
        # signed cumulative flow (purchase/signup credit, everything
        # else debit, exact cents). ONE user-bucket shuffle of
        # fixed-width ints; the fold is a segmented prefix sum + a
        # segmented Hillis–Steele prefix max (no per-user Python)
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type", "value"],
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            et = tbl.column("event_type").to_numpy(zero_copy_only=False)
            credit = (et == "purchase") | (et == "signup")
            return pa.table(
                {
                    "bucket": bucket_of(u, 256),
                    "u": u,
                    "t": pc.cast(
                        tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
                    ),
                    "seq": tbl.column("event_id"),
                    "d": np.where(credit, cents, -cents),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        "max_drawdown_cents": pa.array([], pa.int64()),
                    }
                )
            t = group.column("t").to_numpy(zero_copy_only=False)
            seq = group.column("seq").to_numpy(zero_copy_only=False)
            d = group.column("d").to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, t, u))
            u_s, d_s = u[order], d[order]
            n = u_s.size
            cumg = np.cumsum(d_s)
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            lens = np.diff(np.r_[starts, n])
            base = np.repeat(np.r_[0, cumg[starts[1:] - 1]], lens)
            cum = cumg - base
            # segmented inclusive prefix max (Hillis–Steele doubling)
            run = cum.copy()
            step = 1
            lo = np.iinfo(np.int64).min
            while step < n:
                valid = u_s[step:] == u_s[:-step]
                np.maximum(
                    run[step:],
                    np.where(valid, run[:-step], lo),
                    out=run[step:],
                )
                step *= 2
            dd = run - cum
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "max_drawdown_cents": np.maximum.reduceat(dd, starts),
                }
            )

        return (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )

    def q_gram_novelty(sf):
        # corpus-ordered novelty: share of each doc's distinct bigrams
        # first seen (min doc_id) in that doc — incremental-dump
        # curation diagnostic; text never shuffles
        import ray
        from python_prtree_ray.pipelines.curation import gram_novelty

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return gram_novelty(docs, n=2)

    def q_knn_hubness(sf):
        # NN-graph hubness: in-degree distribution of the 1-NN digraph
        # over customer points — composition over the existing nn_pairs
        # stream (never collected): in-degree fold + tiny histogram sum
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.knn import nn_pairs
        from python_prtree_ray.pipelines.merge import bucketed_sum

        nn = nn_pairs(tables.points_dataset(sf))

        def deg_partial(tbl: pa.Table) -> pa.Table:
            k, c = np.unique(
                tbl.column("nn_id").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"nn_id": k, "indegree": c.astype(np.int64)})

        deg = bucketed_sum(
            nn.map_batches(
                deg_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="nn_id",
            value_cols=("indegree",),
        )

        def hist_partial(tbl: pa.Table) -> pa.Table:
            k, c = np.unique(
                tbl.column("indegree").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"indegree": k, "n_points": c.astype(np.int64)})

        return bucketed_sum(
            deg.map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="indegree",
            value_cols=("n_points",),
        )

    def q_covisit_triangles(sf):
        # place-graph clustering structure: node/edge/triangle counts of
        # the co-visitation tile graph — the distributed pair fold is
        # q_covisit_tile_pairs; the surviving graph is tile-bounded
        # (≤ 4^res nodes), so the triangle count is a driver-side
        # adjacency matmul on metadata
        import pyarrow as pa
        import ray

        pairs = q_covisit_tile_pairs(sf).take_all()
        a = np.array([r["cell_a"] for r in pairs], np.int64)
        b = np.array([r["cell_b"] for r in pairs], np.int64)
        nodes = np.unique(np.r_[a, b])
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        m = nodes.size
        adj = np.zeros((m, m), np.int64)
        adj[ia, ib] = 1
        adj[ib, ia] = 1
        tri = int(np.trace(adj @ adj @ adj) // 6)
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_nodes": pa.array([m], pa.int64()),
                    "n_edges": pa.array([int(a.size)], pa.int64()),
                    "n_triangles": pa.array([tri], pa.int64()),
                }
            )
        )

    def q_typo_pairs(sf):
        # fuzzy vocabulary join: every word pair at edit distance
        # exactly 1 via deletion-neighborhood blocking + exact verify
        import ray
        from python_prtree_ray.pipelines.text import typo_pairs

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["text"]
        )
        return typo_pairs(docs)

    def q_lexical_diversity(sf):
        # per-doc type-token + Simpson repetition profile: zero shuffle,
        # exact dictionary-encoded token equality
        import ray
        from python_prtree_ray.pipelines.text import lexical_diversity

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return lexical_diversity(docs)

    def q_interarrival_hist(sf):
        # burstiness profile: log2-binned same-user event gaps (µs);
        # pair fold + tiny sum, <=64 rows at any scale
        import ray
        from python_prtree_ray.pipelines.movement import interarrival_hist

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
        )
        return interarrival_hist(ev)

    def q_value_percentile(sf):
        # broadcast-CDF enrichment: every event annotated with its exact
        # global percent_rank — the distinct-cents histogram (grid-sized
        # metadata) is aggregated once, ray.put once, and each batch
        # resolves via searchsorted; raw rows never shuffle
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "value"]
        )

        def hist_partial(tbl: pa.Table) -> pa.Table:
            v = tbl.column("value").to_numpy(zero_copy_only=False)
            c, n = np.unique(np.floor(v * 100.0).astype(np.int64), return_counts=True)
            return pa.table({"cents": c, "n": n.astype(np.int64)})

        hist = bucketed_sum(
            ev.map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="cents",
            value_cols=("n",),
        ).take_all()  # distinct-cents grid: metadata-sized by construction
        vals = np.array([r["cents"] for r in hist], np.int64)
        cnts = np.array([r["n"] for r in hist], np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        smaller = np.r_[np.int64(0), np.cumsum(cnts)[:-1]]
        n_total = int(cnts.sum())
        ref = ray.put((vals, smaller, n_total))

        def rank(tbl: pa.Table) -> pa.Table:
            v, sm, nt = ray.get(ref)
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            pos = np.searchsorted(v, cents)
            pct = sm[pos].astype(np.float64) / np.float64(nt - 1)
            return pa.table(
                {"event_id": tbl.column("event_id"), "cents": cents, "pct": pct}
            )

        return ev.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)

    def q_activity_heatmap(sf):
        # day-of-week x hour-of-day seasonality matrix: exact integer
        # epoch arithmetic both sides (no locale-dependent date parts)
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["ts"])
        DAY = 86_400_000_000

        def partial(tbl: pa.Table) -> pa.Table:
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            dow = (us // DAY + 4) % 7  # 1970-01-01 was a Thursday
            hour = (us % DAY) // 3_600_000_000
            key, n = np.unique(dow * 24 + hour, return_counts=True)
            return pa.table({"key": key, "n_events": n.astype(np.int64)})

        summed = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="key",
            value_cols=("n_events",),
        )

        def decode(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "dow": key // 24,
                    "hour": key % 24,
                    "n_events": tbl.column("n_events"),
                }
            )

        return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)

    def q_incremental_agg(sf):
        # incremental-view maintenance: per-user (n_events, value_cents)
        # maintained from a CHECKPOINTED partial-aggregate parquet plus a
        # delta stream — base rows are never rescanned on the update
        # path; partial sums are associative, so checkpoint ∪ delta
        # partials re-folded equals the full recompute (the SQL oracle
        # scans everything — equality proves the incremental plan)
        import os
        import shutil
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "value"]
        )

        def split_partial(keep_delta: bool):
            def partial(tbl: pa.Table) -> pa.Table:
                eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
                m = (eid % 5 == 0) == keep_delta
                u = tbl.column("user_id").to_numpy(zero_copy_only=False)[m]
                cents = np.floor(
                    tbl.column("value").to_numpy(zero_copy_only=False)[m] * 100.0
                ).astype(np.int64)
                order = np.argsort(u, kind="stable")
                u_s, c_s = u[order], cents[order]
                starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
                return pa.table(
                    {
                        "user_id": u_s[starts],
                        "n_events": np.diff(np.r_[starts, u_s.size]).astype(
                            np.int64
                        ),
                        "value_cents": np.add.reduceat(c_s, starts)
                        if u_s.size
                        else np.zeros(0, np.int64),
                    }
                )

            return partial

        base_dir = f"/tmp/graft_incr_agg_{os.path.basename(sf.rstrip('/'))}"
        shutil.rmtree(base_dir, ignore_errors=True)
        base_agg = bucketed_sum(
            ev.map_batches(
                split_partial(False), batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="user_id",
            value_cols=("n_events", "value_cents"),
        )
        base_agg.write_parquet(base_dir)  # the maintained view's checkpoint

        delta = ev.map_batches(
            split_partial(True), batch_format="pyarrow", zero_copy_batch=True
        )
        return bucketed_sum(
            ray.data.read_parquet(base_dir).union(delta),
            key_col="user_id",
            value_cols=("n_events", "value_cents"),
        )

    def q_weekday_skew_users(sf):
        # HAVING-threshold cohort: users whose weekend share is strictly
        # below 1/5 — exact integer cross-multiplication (5·wknd < total),
        # (weekday, weekend) count partials, one sum, filter
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )
        DAY = 86_400_000_000

        def partial(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            dow = (us // DAY + 4) % 7  # 0=Sun .. 6=Sat
            wknd = (dow == 0) | (dow == 6)
            order = np.argsort(u, kind="stable")
            u_s, w_s = u[order], wknd[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            n = np.diff(np.r_[starts, u_s.size]).astype(np.int64)
            n_wk = np.add.reduceat(w_s.astype(np.int64), starts)
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "n_weekday": n - n_wk,
                    "n_weekend": n_wk,
                }
            )

        summed = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="user_id",
            value_cols=("n_weekday", "n_weekend"),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            wd = tbl.column("n_weekday").to_numpy(zero_copy_only=False)
            we = tbl.column("n_weekend").to_numpy(zero_copy_only=False)
            keep = we * 5 < wd + we  # weekend share < 1/5, no division
            return tbl.filter(pa.array(keep))

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_vocab_hapax(sf):
        # hapax-legomena ratio of the corpus vocabulary (OOV-rate
        # estimator): exact word counts, ONE division, single row
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.text import vocab_topk

        # reuse the vocabulary-count machinery's partial path: count
        # every word exactly, then fold hapax/total in one tiny pass
        from python_prtree_ray.pipelines.text import word_counts

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["text"]
        )
        counts = word_counts(docs)

        def partial(tbl: pa.Table) -> pa.Table:
            n = tbl.column("n").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "k": np.zeros(1, np.int64),
                    "n_vocab": np.array([n.size], np.int64),
                    "n_hapax": np.array([(n == 1).sum()], np.int64),
                }
            )

        from python_prtree_ray.pipelines.merge import bucketed_sum

        summed = bucketed_sum(
            counts.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="k",
            value_cols=("n_vocab", "n_hapax"),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            nv = tbl.column("n_vocab").to_numpy(zero_copy_only=False)
            nh = tbl.column("n_hapax").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_vocab": nv,
                    "n_hapax": nh,
                    "hapax_ratio": nh.astype(np.float64) / nv.astype(np.float64),
                }
            )

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_emb_norm_outliers(sf):
        # two-phase quantile gate on the embedding-norm grid: exact p99
        # threshold (R-7 on scaled ints, broadcast as one double) ->
        # stateless filter; vectors never shuffle
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.ann import emb_norm_outliers

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return emb_norm_outliers(emb)

    def q_type_dow_chi2(sf):
        # chi-square independence screen (event_type x day-of-week):
        # per-cell observed/expected/contribution rows — integer margins,
        # per-cell divisions in a FIXED order (no float sum emitted, so
        # nothing order-dependent); zero-observed cells omitted both sides
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "ts"]
        )
        DAY = 86_400_000_000

        def partial(tbl: pa.Table) -> pa.Table:
            enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            dow = (us // DAY + 4) % 7
            order = np.lexsort((dow, code))
            c_s, d_s = code[order], dow[order]
            starts = np.flatnonzero(
                np.r_[True, (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])][: c_s.size]
            )
            return pa.table(
                {
                    "k": np.zeros(starts.size, np.int64),
                    "cls": enc.dictionary.take(pa.array(c_s[starts])),
                    "dow": d_s[starts],
                    "n": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
                }
            )

        def final(group: pa.Table) -> pa.Table:
            cls = group.column("cls").to_numpy(zero_copy_only=False)
            if cls.size == 0:
                return pa.table(
                    {
                        "event_type": pa.array([], pa.string()),
                        "dow": pa.array([], pa.int64()),
                        "observed": pa.array([], pa.int64()),
                        "expected": pa.array([], pa.float64()),
                        "contrib": pa.array([], pa.float64()),
                    }
                )
            dow = group.column("dow").to_numpy(zero_copy_only=False)
            n = group.column("n").to_numpy(zero_copy_only=False)
            order = np.lexsort((dow, cls))
            c_s, d_s, n_s = cls[order], dow[order], n[order]
            starts = np.flatnonzero(
                np.r_[True, (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])][: c_s.size]
            )
            o = np.add.reduceat(n_s, starts)
            cu, du = c_s[starts], d_s[starts]
            N = np.int64(o.sum())
            # margins via per-key sums over the metadata-sized matrix
            cls_keys, cls_inv = np.unique(cu, return_inverse=True)
            r = np.bincount(cls_inv, weights=o).astype(np.int64)[cls_inv]
            dow_keys, dow_inv = np.unique(du, return_inverse=True)
            cmarg = np.bincount(dow_inv, weights=o).astype(np.int64)[dow_inv]
            diff = (o * N - r * cmarg).astype(np.float64)
            contrib = (
                diff * diff / np.float64(N) / r.astype(np.float64)
                / cmarg.astype(np.float64)
            )
            expected = (r * cmarg).astype(np.float64) / np.float64(N)
            return pa.table(
                {
                    "event_type": pa.array(cu, pa.string()),
                    "dow": du,
                    "observed": o,
                    "expected": expected,
                    "contrib": contrib,
                }
            )

        return (
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(final, batch_format="pyarrow")
            .select_columns(["event_type", "dow", "observed", "expected", "contrib"])
        )

    def q_monthly_revenue(sf):
        # month-over-month revenue deltas: calendar-month truncation
        # (datetime64[M] == date_trunc), int-cents sums, single tiny
        # LAG fold over the month-sized series
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            ts = (
                tbl.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False)
            )
            mo = ts.astype("datetime64[M]").astype("datetime64[us]").astype(np.int64)
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(mo, kind="stable")
            m_s, c_s = mo[order], cents[order]
            starts = np.flatnonzero(np.r_[True, m_s[1:] != m_s[:-1]][: m_s.size])
            return pa.table(
                {
                    "month_us": m_s[starts],
                    "revenue_cents": np.add.reduceat(c_s, starts),
                }
            )

        summed = bucketed_sum(
            orders.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="month_us",
            value_cols=("revenue_cents",),
        )

        def add_k(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "k", pa.array(np.zeros(tbl.num_rows, np.int64))
            )

        def lag(group: pa.Table) -> pa.Table:
            m = group.column("month_us").to_numpy(zero_copy_only=False)
            v = group.column("revenue_cents").to_numpy(zero_copy_only=False)
            order = np.argsort(m, kind="stable")
            m_s, v_s = m[order], v[order]
            return pa.table(
                {
                    "month": pa.array(
                        m_s[1:].astype("datetime64[us]"), pa.timestamp("us")
                    ),
                    "revenue_cents": v_s[1:],
                    "prev_cents": v_s[:-1],
                    "delta_cents": v_s[1:] - v_s[:-1],
                }
            )

        return (
            summed.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(lag, batch_format="pyarrow")
            .select_columns(["month", "revenue_cents", "prev_cents", "delta_cents"])
        )

    def q_rolling_wau(sf):
        # exact 7-day rolling distinct users: per-user coverage-interval
        # expansion (a sliding COUNT DISTINCT has no per-day partial)
        from python_prtree_ray.pipelines.windows import rolling_wau
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )
        return rolling_wau(ev)

    def q_event_age_hist(sf):
        # user-anchored enrichment: every event binned by log2(days
        # since the user's FIRST signup event); events and their anchor
        # co-locate in ONE user bucket, so no join ships raw rows
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.windows import DAY_US

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            is_signup = pc.equal(tbl.column("event_type"), "signup").to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {
                    "bucket": bucket_of(u, 256),
                    "u": u,
                    "t": us,
                    "sgn": is_signup,
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return empty
            t = group.column("t").to_numpy(zero_copy_only=False)
            sgn = group.column("sgn").to_numpy(zero_copy_only=False)
            # per-user min signup ts
            order = np.argsort(u, kind="stable")
            u_s, t_s, g_s = u[order], t[order], sgn[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            sizes = np.diff(np.r_[starts, u_s.size])
            t_anchor = np.where(g_s, t_s, np.iinfo(np.int64).max)
            anchor = np.repeat(
                np.minimum.reduceat(t_anchor, starts), sizes
            )
            has = anchor != np.iinfo(np.int64).max
            age_days = (t_s[has] - anchor[has]) // DAY_US
            pos = age_days >= 0  # pre-signup events excluded both sides
            d = age_days[pos]
            bins = np.where(
                d > 0, np.frexp(d.astype(np.float64))[1] - 1, np.int64(-1)
            ).astype(np.int64)
            bb, n = np.unique(bins, return_counts=True)
            return pa.table({"bin": bb, "n": n.astype(np.int64)})

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return bucketed_sum(folded, key_col="bin", value_cols=("n",))

    def q_robust_outliers(sf):
        # robust z-score outlier counts per type: |c − m| > K·MAD with
        # every quantity on the exact quadrupled grid (2m and 2·mad2 are
        # exact ints) — integer comparisons only, no float threshold
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.quantiles import _interp_quantiles

        K = 5
        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "value"]
        )

        def hist_partial(tbl: pa.Table) -> pa.Table:
            c, n = np.unique(
                np.floor(
                    tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
                return_counts=True,
            )
            return pa.table({"cents": c, "n": n.astype(np.int64)})

        hist = bucketed_sum(
            ev.map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="cents",
            value_cols=("n",),
        ).take_all()
        vals = np.array([r["cents"] for r in hist], np.int64)
        cnts = np.array([r["n"] for r in hist], np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        med = _interp_quantiles(vals, cnts, [0.5])[0]
        m2 = int(round(2 * med))
        dev = np.abs(2 * vals - m2)
        dorder = np.argsort(dev)
        dv, dn = dev[dorder], cnts[dorder]
        starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]][: dv.size])
        mad2x = _interp_quantiles(dv[starts], np.add.reduceat(dn, starts), [0.5])[0]
        mad4 = int(round(2 * mad2x))  # 2·(2·MAD): exact int
        thr = ray.put((m2, mad4))

        def per_type(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m2v, mad4v = ray.get(thr)
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            out = 2 * np.abs(2 * cents - m2v) > K * mad4v
            enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            kk, inv = np.unique(code, return_inverse=True)
            n = np.bincount(inv, minlength=kk.size).astype(np.int64)
            n_out = np.bincount(inv, weights=out, minlength=kk.size).astype(
                np.int64
            )
            return pa.table(
                {
                    "event_type": enc.dictionary.take(pa.array(kk)),
                    "n": n,
                    "n_outliers": n_out,
                }
            )

        parts = ev.map_batches(
            per_type, batch_format="pyarrow", zero_copy_batch=True
        )

        def add_k(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "k", pa.array(np.zeros(tbl.num_rows, np.int64))
            )

        def final(group: pa.Table) -> pa.Table:
            et = group.column("event_type").to_numpy(zero_copy_only=False)
            if et.size == 0:
                return pa.table(
                    {
                        "event_type": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                        "n_outliers": pa.array([], pa.int64()),
                    }
                )
            n = group.column("n").to_numpy(zero_copy_only=False)
            no = group.column("n_outliers").to_numpy(zero_copy_only=False)
            order = np.argsort(et, kind="stable")
            e_s, n_s, o_s = et[order], n[order], no[order]
            starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]][: e_s.size])
            return pa.table(
                {
                    "event_type": pa.array(e_s[starts], pa.string()),
                    "n": np.add.reduceat(n_s, starts),
                    "n_outliers": np.add.reduceat(o_s, starts),
                }
            )

        return (
            parts.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(final, batch_format="pyarrow")
            .select_columns(["event_type", "n", "n_outliers"])
        )

    def q_active_span_quantiles(sf):
        # user lifetime distribution: exact quantiles of (last − first
        # active day) per user; one user-bucket fold, tiny histogram
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.quantiles import int_quantiles
        from python_prtree_ray.pipelines.windows import DAY_US

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            day = us // DAY_US
            order = np.argsort(u, kind="stable")
            u_s, d_s = u[order], day[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            return pa.table(
                {
                    "bucket": bucket_of(u_s[starts], 256),
                    "u": u_s[starts],
                    "lo": np.minimum.reduceat(d_s, starts),
                    "hi": np.maximum.reduceat(d_s, starts),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {"k": pa.array([], pa.int64()), "span_days": pa.array([], pa.int64())}
                )
            lo = group.column("lo").to_numpy(zero_copy_only=False)
            hi = group.column("hi").to_numpy(zero_copy_only=False)
            order = np.argsort(u, kind="stable")
            u_s = u[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            span = np.maximum.reduceat(hi[order], starts) - np.minimum.reduceat(
                lo[order], starts
            )
            return pa.table(
                {"k": np.zeros(span.size, np.int64), "span_days": span}
            )

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return int_quantiles(folded, key_col="k", int_col="span_days")

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

    def q_pareto_users(sf):
        # 80/20 concentration: the SMALLEST top-spender set covering
        # ≥80% of total value — exact via 5·cum ≥ 4·total cross-multiply
        # (no float threshold); user-sized driver sort (rank statistic)
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "value"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(u, kind="stable")
            u_s, c_s = u[order], cents[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "x": np.add.reduceat(c_s, starts)
                    if u_s.size
                    else np.zeros(0, np.int64),
                }
            )

        sums = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="user_id",
            value_cols=("x",),
        )
        xs = []
        for ref in sums.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                xs.append(t.column("x").to_numpy(zero_copy_only=False))
        x = np.sort(np.concatenate(xs))[::-1].astype(object)
        n = x.size
        total = int(x.sum())
        cum = np.cumsum(x)
        k80 = int(np.argmax(5 * cum >= 4 * total)) + 1  # first rank covering 80%
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_users": pa.array([n], pa.int64()),
                    "total_cents": pa.array([total], pa.int64()),
                    "k80": pa.array([k80], pa.int64()),
                    "share": pa.array(
                        [float(k80) / float(n) if n else None], pa.float64()
                    ),
                }
            )
        )

    def q_tile_net_flow(sf):
        # per-tile flow balance: inbound minus outbound moves from the
        # OD transition stream (net attractor/source signal)
        import pyarrow as pa
        from python_prtree_ray.pipelines.merge import bucketed_sum

        od = q_od_matrix(sf)

        def partial(tbl: pa.Table) -> pa.Table:
            frm = tbl.column("from_cell").to_numpy(zero_copy_only=False)
            to = tbl.column("to_cell").to_numpy(zero_copy_only=False)
            n = tbl.column("n_moves").to_numpy(zero_copy_only=False)
            keep = frm != to  # self-loops carry no net flow
            cells = np.concatenate([to[keep], frm[keep]])
            n_in = np.concatenate([n[keep], np.zeros(keep.sum(), np.int64)])
            n_out = np.concatenate([np.zeros(keep.sum(), np.int64), n[keep]])
            order = np.argsort(cells, kind="stable")
            c_s = cells[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
            return pa.table(
                {
                    "cell": c_s[starts],
                    "n_in": np.add.reduceat(n_in[order], starts),
                    "n_out": np.add.reduceat(n_out[order], starts),
                }
            )

        summed = bucketed_sum(
            od.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="cell",
            value_cols=("n_in", "n_out"),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            i = tbl.column("n_in").to_numpy(zero_copy_only=False)
            o = tbl.column("n_out").to_numpy(zero_copy_only=False)
            return tbl.append_column("net", pa.array(i - o, pa.int64()))

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_activity_decile_purchase(sf):
        # rank-cohort conversion: users ranked by total activity into
        # exact integer deciles ((rn−1)·10 // n — no NTILE ambiguity),
        # purchase share per decile; user-sized driver rank
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "event_type"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)
            is_p = pc.equal(tbl.column("event_type"), "purchase").to_numpy(
                zero_copy_only=False
            )
            order = np.argsort(u, kind="stable")
            u_s, p_s = u[order], is_p[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "n_events": np.diff(np.r_[starts, u_s.size]).astype(np.int64),
                    "n_purchases": np.add.reduceat(
                        p_s.astype(np.int64), starts
                    ),
                }
            )

        sums = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="user_id",
            value_cols=("n_events", "n_purchases"),
        ).take_all()  # user-sized metadata (the rank-statistic bound)
        uid = np.array([r["user_id"] for r in sums], np.int64)
        ne = np.array([r["n_events"] for r in sums], np.int64)
        npu = np.array([r["n_purchases"] for r in sums], np.int64)
        order = np.lexsort((uid, ne))
        ne, npu = ne[order], npu[order]
        n = ne.size
        decile = (np.arange(n, dtype=np.int64) * 10) // n  # (rn-1)*10 // n
        dd, inv = np.unique(decile, return_inverse=True)
        n_users = np.bincount(inv, minlength=dd.size).astype(np.int64)
        n_ev = np.bincount(inv, weights=ne, minlength=dd.size).astype(np.int64)
        n_pu = np.bincount(inv, weights=npu, minlength=dd.size).astype(np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "decile": dd,
                    "n_users": n_users,
                    "n_events": n_ev,
                    "n_purchases": n_pu,
                    "purchase_share": n_pu.astype(np.float64)
                    / n_ev.astype(np.float64),
                }
            )
        )

    def q_recency_hist(sf):
        # recency cohorts: users by days since their LAST activity
        # relative to the stream end — per-user max fold, day histogram
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.windows import DAY_US

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            day = us // DAY_US
            order = np.argsort(u, kind="stable")
            u_s, d_s = u[order], day[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "last_day": np.maximum.reduceat(d_s, starts),
                }
            )

        lasts = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="user_id",
            value_cols=("last_day",),
            reduce="max",
        ).take_all()  # user-sized metadata
        ld = np.array([r["last_day"] for r in lasts], np.int64)
        end = int(ld.max())
        rec = end - ld
        rr, n = np.unique(rec, return_counts=True)
        return ray.data.from_arrow(
            pa.table(
                {"recency_days": rr, "n_users": n.astype(np.int64)}
            )
        )

    def q_daily_new_returning(sf):
        # per-day acquisition split: users on their FIRST-ever active
        # day vs returning — one-bucket-per-user fold (first day + all
        # active days), tiny day-keyed sum
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.windows import DAY_US

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            day = us // DAY_US
            order = np.lexsort((day, u))
            u_s, d_s = u[order], day[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])][: u_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(u_s[keep], 256),
                    "u": u_s[keep],
                    "day": d_s[keep],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {
                        "day": pa.array([], pa.int64()),
                        "n_new": pa.array([], pa.int64()),
                        "n_returning": pa.array([], pa.int64()),
                    }
                )
            day = group.column("day").to_numpy(zero_copy_only=False)
            order = np.lexsort((day, u))
            u_s, d_s = u[order], day[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])][: u_s.size]
            u_u, d_u = u_s[keep], d_s[keep]
            is_first = np.r_[True, u_u[1:] != u_u[:-1]][: u_u.size]
            dd, inv = np.unique(d_u, return_inverse=True)
            n_new = np.bincount(inv, weights=is_first, minlength=dd.size).astype(
                np.int64
            )
            n_tot = np.bincount(inv, minlength=dd.size).astype(np.int64)
            return pa.table(
                {"day": dd, "n_new": n_new, "n_returning": n_tot - n_new}
            )

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return bucketed_sum(
            folded, key_col="day", value_cols=("n_new", "n_returning")
        )

    def q_value_mad(sf):
        # robust stats: exact median + median absolute deviation on the
        # doubled grid (R-7 median of ints has fraction ∈ {0, ½}, so 2m
        # is an exact int and |2c − 2m| stays integral) — ONE distributed
        # histogram pass, grid-sized driver fold
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum
        from python_prtree_ray.pipelines.quantiles import _interp_quantiles

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["value"])

        def partial(tbl: pa.Table) -> pa.Table:
            c, n = np.unique(
                np.floor(
                    tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
                return_counts=True,
            )
            return pa.table({"cents": c, "n": n.astype(np.int64)})

        hist = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="cents",
            value_cols=("n",),
        ).take_all()  # distinct-cents grid: metadata-sized
        vals = np.array([r["cents"] for r in hist], np.int64)
        cnts = np.array([r["n"] for r in hist], np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        n_total = int(cnts.sum())
        med = _interp_quantiles(vals, cnts, [0.5])[0]
        m2 = int(round(2 * med))  # exact: fraction is 0 or 1/2
        dev = np.abs(2 * vals - m2)
        dorder = np.argsort(dev)
        dv, dn = dev[dorder], cnts[dorder]
        # merge duplicate deviations (values symmetric around m)
        starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]][: dv.size])
        dv_u = dv[starts]
        dn_u = np.add.reduceat(dn, starts)
        mad2 = _interp_quantiles(dv_u, dn_u, [0.5])[0]
        return ray.data.from_arrow(
            pa.table(
                {
                    "n": pa.array([n_total], pa.int64()),
                    "median": pa.array([med], pa.float64()),
                    "mad": pa.array([mad2 / 2.0], pa.float64()),
                }
            )
        )

    def q_convert_delay_quantiles(sf):
        # funnel latency: exact quantiles of (first purchase − first
        # view) per user, users with both events; one user-bucket fold
        # then the distinct-value histogram quantile machinery
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.quantiles import int_quantiles

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            keep = pc.is_in(
                tbl.column("event_type"),
                value_set=pa.array(["view", "purchase"]),
            )
            t = tbl.filter(keep)
            u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
            us = pc.cast(
                t.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            is_p = pc.equal(t.column("event_type"), "purchase").to_numpy(
                zero_copy_only=False
            )
            # batch-local min per (user, kind)
            kind = is_p.astype(np.int64)
            order = np.lexsort((us, kind, u))
            u_s, k_s, t_s = u[order], kind[order], us[order]
            first = np.r_[True, (u_s[1:] != u_s[:-1]) | (k_s[1:] != k_s[:-1])][: u_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(u_s[first], 256),
                    "u": u_s[first],
                    "kind": k_s[first],
                    "t": t_s[first],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            if u.size == 0:
                return pa.table(
                    {"k": pa.array([], pa.int64()), "delay_s": pa.array([], pa.int64())}
                )
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            t = group.column("t").to_numpy(zero_copy_only=False)
            order = np.lexsort((t, kind, u))
            u_s, k_s, t_s = u[order], kind[order], t[order]
            first = np.r_[True, (u_s[1:] != u_s[:-1]) | (k_s[1:] != k_s[:-1])][: u_s.size]
            u_f, k_f, t_f = u_s[first], k_s[first], t_s[first]
            # users with BOTH kinds appear as consecutive (view, purchase)
            both = (u_f[:-1] == u_f[1:]) & (k_f[:-1] == 0) & (k_f[1:] == 1)
            # keep µs: a seconds division would FLOOR in numpy but
            # TRUNCATE in DuckDB on the negative delays
            delay = t_f[1:][both] - t_f[:-1][both]
            return pa.table(
                {
                    "k": np.zeros(delay.size, np.int64),
                    "delay_us": delay,
                }
            )

        folded = (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return int_quantiles(folded, key_col="k", int_col="delay_us")

    def q_activity_autocorr(sf):
        # lag-24h autocorrelation of the hourly event-count series
        # (zeros filled over the full hour span): exact integer moments,
        # one double expression — SQRT is correctly rounded IEEE, so
        # num / SQRT(vx·vy) matches the SQL twin bitwise
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["ts"])
        HOUR = 3_600_000_000
        LAG = 24

        def partial(tbl: pa.Table) -> pa.Table:
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            h, n = np.unique(us // HOUR, return_counts=True)
            return pa.table({"hour": h, "n": n.astype(np.int64)})

        hist = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="hour",
            value_cols=("n",),
        ).take_all()  # hour-span-sized metadata
        hours = np.array([r["hour"] for r in hist], np.int64)
        cnts = np.array([r["n"] for r in hist], np.int64)
        lo, hi = int(hours.min()), int(hours.max())
        series = np.zeros(hi - lo + 1, np.int64)
        series[hours - lo] = cnts
        x = series[:-LAG].astype(object)
        y = series[LAG:].astype(object)
        n = x.shape[0]
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        r = (
            float(num) / np.sqrt(np.float64(float(vx)) * np.float64(float(vy)))
            if vx > 0 and vy > 0
            else None
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_pairs": pa.array([n], pa.int64()),
                    "num": pa.array([float(num)], pa.float64()),
                    "var_x": pa.array([float(vx)], pa.float64()),
                    "var_y": pa.array([float(vy)], pa.float64()),
                    "r": pa.array([r], pa.float64()),
                }
            )
        )

    def q_value_ks(sf):
        # two-sample Kolmogorov–Smirnov distance between weekday and
        # weekend value distributions: exact integer numerator
        # max|c_w·n_e − c_e·n_w| over the distinct-cents grid
        # (grid-bounded metadata), ONE double division
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["ts", "value"]
        )
        DAY = 86_400_000_000

        def partial(tbl: pa.Table) -> pa.Table:
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            dow = (us // DAY + 4) % 7
            wknd = (dow == 0) | (dow == 6)
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(cents, kind="stable")
            c_s, w_s = cents[order], wknd[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
            nw = np.add.reduceat(w_s.astype(np.int64), starts)
            nt = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
            return pa.table(
                {"cents": c_s[starts], "n_wknd": nw, "n_wday": nt - nw}
            )

        hist = bucketed_sum(
            ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="cents",
            value_cols=("n_wknd", "n_wday"),
        ).take_all()  # distinct-cents grid: metadata-sized
        vals = np.array([r["cents"] for r in hist], np.int64)
        nw = np.array([r["n_wknd"] for r in hist], np.int64)
        nd = np.array([r["n_wday"] for r in hist], np.int64)
        order = np.argsort(vals)
        cw = np.cumsum(nw[order]).astype(object)
        cd = np.cumsum(nd[order]).astype(object)
        tw, td = int(nw.sum()), int(nd.sum())
        d_num = int(max(abs(cw * td - cd * tw))) if vals.size else 0
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_weekend": pa.array([tw], pa.int64()),
                    "n_weekday": pa.array([td], pa.int64()),
                    "d_num": pa.array([d_num], pa.int64()),
                    "ks": pa.array(
                        [float(d_num) / float(tw * td) if tw and td else None],
                        pa.float64(),
                    ),
                }
            )
        )

    def q_label_separation(sf):
        # between-label separation: exact cross-pair dot sums via
        # sum-vector dot products — the silhouette companion matrix
        import ray
        from python_prtree_ray.pipelines.ann import label_separation

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding", "label"]
        )
        return label_separation(emb)

    def q_nation_share(sf):
        # share-of-parent rollup: each nation's order revenue as a
        # fraction of its region's total — nation-sized metadata fold,
        # exact int sums, one division per row
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.lookup import broadcast_lookup
        from python_prtree_ray.pipelines.merge import bucketed_sum

        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
        )
        reg = pq.read_table(
            f"{sf}/region.parquet", columns=["r_regionkey", "r_name"]
        )
        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        o2 = broadcast_lookup(
            orders, cust, on="o_custkey", small_on="c_custkey",
            carry_cols=("c_nationkey",),
        )

        def partial(tbl: pa.Table) -> pa.Table:
            nk = tbl.column("c_nationkey").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            order = np.argsort(nk, kind="stable")
            nk_s, c_s = nk[order], cents[order]
            starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
            return pa.table(
                {
                    "n_nationkey": nk_s[starts],
                    "revenue_cents": np.add.reduceat(c_s, starts),
                }
            )

        summed = bucketed_sum(
            o2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            key_col="n_nationkey",
            value_cols=("revenue_cents",),
        )
        nmap = {
            int(k): (str(n), int(r))
            for k, n, r in zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_name").to_pylist(),
                nat.column("n_regionkey").to_pylist(),
            )
        }
        rmap = {
            int(k): str(n)
            for k, n in zip(
                reg.column("r_regionkey").to_pylist(),
                reg.column("r_name").to_pylist(),
            )
        }

        def add_k(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "k", pa.array(np.zeros(tbl.num_rows, np.int64))
            )

        def finish(group: pa.Table) -> pa.Table:
            nk = group.column("n_nationkey").to_numpy(zero_copy_only=False)
            rev = group.column("revenue_cents").to_numpy(zero_copy_only=False)
            rkey = np.array([nmap[int(x)][1] for x in nk], np.int64)
            rtot = {}
            for r, v in zip(rkey, rev):
                rtot[int(r)] = rtot.get(int(r), 0) + int(v)
            region_cents = np.array([rtot[int(r)] for r in rkey], np.int64)
            return pa.table(
                {
                    "r_name": pa.array([rmap[int(r)] for r in rkey], pa.string()),
                    "n_name": pa.array(
                        [nmap[int(x)][0] for x in nk], pa.string()
                    ),
                    "revenue_cents": rev,
                    "region_cents": region_cents,
                    "share": rev.astype(np.float64)
                    / region_cents.astype(np.float64),
                }
            )

        return (
            summed.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .map_groups(finish, batch_format="pyarrow")
            .select_columns(
                ["r_name", "n_name", "revenue_cents", "region_cents", "share"]
            )
        )

    def q_above_avg_orders(sf):
        # correlated-aggregate filter: orders strictly above their
        # customer's mean order value — exact integer cross-multiply
        # (v·n > sum, no division); aggregate + re-join share ONE shuffle
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.agg import above_group_mean

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )

        def prep(tbl):
            tp = tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey"),
                    "o_custkey": tbl.column("o_custkey"),
                    "cents": np.floor(tp * 100.0).astype(np.int64),
                }
            )

        return above_group_mean(
            orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
            key_col="o_custkey",
            id_col="o_orderkey",
            cents_col="cents",
        )

    def q_emb_top_eigen(sf):
        # leading principal component via deterministic power iteration
        # on the exact covariance fold (rows-only: no SQL eigensolver)
        import ray
        from python_prtree_ray.pipelines.ann import emb_top_eigen

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding"]
        )
        return emb_top_eigen(emb)

    def q_emb_top2_eigen(sf):
        # 2-D PCA basis via Hotelling deflation on the exact covariance
        # fold (rows-only: no SQL eigensolver; pytest pins vs eigh)
        import ray
        from python_prtree_ray.pipelines.ann import emb_top2_eigen

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding"]
        )
        return emb_top2_eigen(emb)

    def q_supplier_reach_hist(sf):
        # two-level DISTINCT aggregate: distinct orders served per
        # supplier, then the distribution of that reach
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_suppkey", "l_orderkey"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            s = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)
            o = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
            order = np.lexsort((o, s))
            s_s, o_s = s[order], o[order]
            keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (o_s[1:] != o_s[:-1])][: s_s.size]
            return pa.table(
                {
                    "bucket": bucket_of(s_s[keep], 256),
                    "s": s_s[keep],
                    "o": o_s[keep],
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            s = group.column("s").to_numpy(zero_copy_only=False)
            if s.size == 0:
                return pa.table(
                    {
                        "n_orders": pa.array([], pa.int64()),
                        "n_suppliers": pa.array([], pa.int64()),
                    }
                )
            o = group.column("o").to_numpy(zero_copy_only=False)
            order = np.lexsort((o, s))
            s_s, o_s = s[order], o[order]
            keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (o_s[1:] != o_s[:-1])][: s_s.size]
            s_u = s_s[keep]
            starts = np.flatnonzero(np.r_[True, s_u[1:] != s_u[:-1]][: s_u.size])
            reach = np.diff(np.r_[starts, s_u.size]).astype(np.int64)
            rr, n = np.unique(reach, return_counts=True)
            return pa.table(
                {"n_orders": rr, "n_suppliers": n.astype(np.int64)}
            )

        folded = (
            li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )
        return bucketed_sum(
            folded, key_col="n_orders", value_cols=("n_suppliers",)
        )

    def q_label_cohesion(sf):
        # exact intra-label pairwise-dot sums via |Σq|² − Σ|q|² — no
        # pair enumeration, vectors never shuffle
        import ray
        from python_prtree_ray.pipelines.ann import label_cohesion

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding", "label"]
        )
        return label_cohesion(emb)

    def q_emb_dim_quantiles(sf):
        # per-dimension distribution monitor: exact R-7 quantiles on
        # the 2^10 scaled-int grid; vectors never shuffle
        import ray
        from python_prtree_ray.pipelines.ann import emb_dim_quantiles

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding"]
        )
        return emb_dim_quantiles(emb)

    def q_label_centroids(sf):
        # distributed per-label embedding centroid (quantized integer
        # component sums in long format — order-independent reduction)
        import ray

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["embedding", "label"]
        )
        return ann.label_centroid_sums(emb)

    def q_corpus_curation(sf):
        # flagship curation composite: fused normalize+quality+lang map
        # pass → exact dedup on normalized text; text never shuffles
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return text.curate_corpus(docs, min_quality=82)

    def q_events_user_topk(sf):
        # per-KEY top-k (top-3 events per user by integer value):
        # map-side per-key prune inside each batch, one coarse key-hash
        # shuffle of at most k rows per (batch, key)
        import ray

        from python_prtree_ray.pipelines.merge import grouped_topk

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "value"]
        )

        def cents(tbl):
            import numpy as np
            import pyarrow as pa

            v = tbl.column("value").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": tbl.column("user_id"),
                    "event_id": tbl.column("event_id"),
                    "value_cents": np.floor(v * 100.0).astype(np.int64),
                }
            )

        return grouped_topk(
            ev.map_batches(
                cents,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            k=3,
            key_col="user_id",
            id_col="event_id",
            value_col="value_cents",
        )

    def q_events_dedup(sf):
        # streaming-style dedup: first event per (user, type, 10-min
        # tumbling window) — map-side group collapse, one user-hash shuffle
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        return windows.event_dedup_window(ev, minutes=10)

    def q_doc_tfidf_top(sf):
        # most-characteristic word per doc by integer tf-idf: batch-local
        # tf + argmax, ONE vocab-sized df shuffle broadcast via ray.put
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        return text.doc_tfidf_top(docs)

    def q_quality_adaptive(sf):
        # adaptive quality gate: per-LANG median threshold (exact R-7
        # histogram quantile, metadata-sized broadcast) → stateless filter
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        return text.quality_filter_adaptive(docs, q=0.5)

    def q_vocab_topk(sf):
        # vocabulary building: global word-frequency top-100 — per-batch
        # Arrow value_counts collapse, word-hash bucket sum, tiny merge
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        return text.vocab_topk(docs, k=100)

    def q_heavy_hitters(sf):
        # exact heavy-hitter tokens (share > 1/500) via two-pass
        # Misra-Gries: capacity-bounded sketch finds a candidate
        # superset (vocabulary never shuffles), an exact recount of
        # only the <= capacity candidates verifies — the classic
        # sketch-then-verify shape for 100-TB streams
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        return text.heavy_hitters(docs, k_inv=500)

    def q_char_trigrams(sf):
        # char-trigram top-100 within [a-z]+ word runs: zero-copy
        # UTF-8 buffer byte arithmetic + 26^3 bincount per batch, one
        # tiny fold; grams decoded only for the final k rows
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        return text.char_trigrams(docs, k=100)

    def q_bigram_lift(sf):
        # top collocations by lift (the PMI ranking without libm log):
        # per-batch Arrow value_counts over joined pair strings, ONE
        # pair-hash fold, vocabulary-sized marginal broadcast, map-side
        # top-k prune + tiny merge
        import ray

        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        return text.bigram_lift(docs, k=100, min_count=3)

    def q_dup_clusters(sf):
        # near-dup pair mining → connected components → canonical doc per
        # cluster (min id): the cluster-dedup step of a training pipeline
        import ray
        from python_prtree_ray.pipelines.graph import connected_components

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        return connected_components(pairs, id_a="doc_a", id_b="doc_b")

    def q_cluster_size_hist(sf):
        # dup-cluster size distribution: CC labels → per-cluster size →
        # histogram of sizes (two pre-combined levels)
        import pyarrow as pa
        from python_prtree_ray.pipelines.merge import bucketed_sum

        clusters = q_dup_clusters(sf)

        def per_cluster(tbl: pa.Table) -> pa.Table:
            c, n = np.unique(
                tbl.column("cluster_id").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"cluster_id": c, "size": n.astype(np.int64)})

        sizes = bucketed_sum(
            clusters.map_batches(
                per_cluster, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="cluster_id",
            value_cols=("size",),
        )

        def hist(tbl: pa.Table) -> pa.Table:
            s, n = np.unique(
                tbl.column("size").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table({"size": s, "n_clusters": n.astype(np.int64)})

        return bucketed_sum(
            sizes.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
            key_col="size",
            value_cols=("n_clusters",),
        )

    def q_dedup_survivors(sf):
        # end of the dedup pipeline: docs surviving cluster dedup (anti
        # join against non-canonical near-dup cluster members)
        import ray
        from python_prtree_ray.pipelines.graph import dedup_survivors

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        keep = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "lang"]
        )
        pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        return dedup_survivors(
            keep, pairs, carry_cols=("lang",), id_a="doc_a", id_b="doc_b"
        )

    def q_doc_cap_per_lang(sf):
        import ray
        from python_prtree_ray.pipelines.sample import sample_per_key

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "lang"]
        )
        return sample_per_key(docs, key_col="lang", id_col="doc_id", n=50)

    def q_save_load(sf):
        # reference save/load parity (prtree.h:119-149, core.py:146-183)
        # as a driver-green round trip: build → save (partitioned parquet
        # + manifest) → load (lazy) → query; pairs must equal the plain
        # spatial join's.
        import os
        import shutil
        import tempfile

        from python_prtree_ray.api import RayPRTree

        tag = sf.rstrip("/").replace("/", "_")
        path = os.path.join(tempfile.gettempdir(), f"graft_saveload{tag}")
        shutil.rmtree(path, ignore_errors=True)
        tree = RayPRTree(tables.boxes_dataset(sf), res=RES, strict=False)
        tree.save(path)
        tree2 = RayPRTree.load(path, strict=False)
        return tree2.batch_query(tables.query_boxes_dataset(sf))

    def q_checkpoint_resume(sf):
        # persistence/resume under the driver's oracle (reference
        # save/load parity, prtree.h:119-149): run resumable_join, then
        # run it AGAIN — the second pass must skip every partition
        # (verified by file mtimes; raises if any compute reran) — and
        # return the pairs REREAD from the checkpoint files.
        import os
        import shutil
        import tempfile

        from python_prtree_ray.pipelines.checkpoint import read_join, resumable_join

        tag = sf.rstrip("/").replace("/", "_")
        path = os.path.join(tempfile.gettempdir(), f"graft_ckpt_resume{tag}")
        shutil.rmtree(path, ignore_errors=True)
        boxes = tables.boxes_dataset(sf)
        qs = tables.query_boxes_dataset(sf)
        resumable_join(boxes, qs, path, res=RES, n_parts=16)
        mtimes = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        }
        man2 = resumable_join(boxes, qs, path, res=RES, n_parts=16)
        for f, mt in mtimes.items():
            if os.path.getmtime(os.path.join(path, f)) != mt:
                raise RuntimeError(f"resume recomputed finished partition {f}")
        if not all(v["status"] == "done" for v in man2["partitions"].values()):
            raise RuntimeError("resume left partitions pending")
        return read_join(path)

    def q_ann_lsh(sf):
        import ray
        import pyarrow.parquet as pq

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
        qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
        qids = head.column("vec_id").to_numpy(zero_copy_only=False)
        res = ann.ann_lsh_topk(emb, qv, qids, k=ANN_K)
        return res.select_columns(["query_id", "vec_id", "rank"])

    def q_ann_ivf(sf):
        import ray
        import pyarrow.parquet as pq

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
        qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
        qids = head.column("vec_id").to_numpy(zero_copy_only=False)
        res = ann.ann_ivf_topk(emb, qv, qids, k=ANN_K)
        return res.select_columns(["query_id", "vec_id", "rank"])

    def q_ann_pq(sf):
        # product-quantization ANN: the compressed scale path (byte
        # codes + asymmetric LUT scoring); rows-only, recall floor in
        # pytest vs ann_brute_topk
        import ray
        import pyarrow.parquet as pq

        emb = ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
        qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
        qids = head.column("vec_id").to_numpy(zero_copy_only=False)
        res = ann.ann_pq_topk(emb, qv, qids, k=ANN_K)
        return res.select_columns(["query_id", "vec_id", "rank"])

    def q_part_supplier_counts(sf):
        # TPC-H Q16 shape: COUNT(DISTINCT supplier) per surviving part
        # group. The part dimension filters down to a driver-side group
        # map (dim-sized, broadcast once via ray.put); lineitem probes it
        # per batch and emits DEDUPED (group<<32 | suppkey) int keys —
        # ONE coarse-bucket shuffle of ints carries the distinct set, a
        # second metadata-sized fold counts per group. Raw fact rows
        # never shuffle; suppkey < 2^32 is the packing contract.
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        part = ray.data.read_parquet(
            f"{sf}/part.parquet",
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        )

        def dim_filter(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            sz = tbl.column("p_size").to_numpy(zero_copy_only=False)
            keep_sz = np.isin(sz, np.array([1, 4, 9, 14, 19, 24, 29, 34]))
            keep_br = pc.not_equal(
                tbl.column("p_brand"), "Brand#13"
            ).to_numpy(zero_copy_only=False)
            return tbl.filter(pa.array(keep_sz & keep_br))

        dim_rows = part.map_batches(
            dim_filter, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        pk = np.array([r["p_partkey"] for r in dim_rows], np.int64)
        order = np.argsort(pk, kind="stable")
        pk = pk[order]
        brands = np.array([r["p_brand"] for r in dim_rows], object)[order]
        types = np.array([r["p_type"] for r in dim_rows], object)[order]
        sizes = np.array([r["p_size"] for r in dim_rows], np.int64)[order]
        # distinct suppliers count per (brand, type, size) GROUP, not per
        # part row — several partkeys can share one group
        combo = np.array(
            [f"{b}\x1f{t}\x1f{s}" for b, t, s in zip(brands, types, sizes)],
            object,
        )
        uniq_combo, part_gid = np.unique(combo, return_inverse=True)
        first_of_gid = np.zeros(uniq_combo.size, np.int64)
        seen = np.zeros(uniq_combo.size, bool)
        for i, g in enumerate(part_gid):
            if not seen[g]:
                seen[g] = True
                first_of_gid[g] = i
        ref_pk = ray.put((pk, part_gid.astype(np.int64)))

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        )

        def probe(tbl: pa.Table) -> pa.Table:
            keys, gid_of = ray.get(ref_pk)
            lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            ls = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, lp)
            pos[pos == keys.size] = 0
            hit = keys[pos] == lp
            k = np.unique((gid_of[pos[hit]] << 32) | ls[hit])
            return pa.table({"k": k, "one": np.ones(k.size, np.int64)})

        pairs = bucketed_sum(
            li.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True),
            key_col="k",
            value_cols=("one",),
            reduce="min",
        )

        def to_gid(tbl: pa.Table) -> pa.Table:
            k = tbl.column("k").to_numpy(zero_copy_only=False)
            return pa.table(
                {"gid": k >> 32, "n": np.ones(k.size, np.int64)}
            )

        counts = bucketed_sum(
            pairs.map_batches(to_gid, batch_format="pyarrow", zero_copy_batch=True),
            key_col="gid",
            value_cols=("n",),
        ).take_all()
        gid = np.array([r["gid"] for r in counts], np.int64)
        n = np.array([r["n"] for r in counts], np.int64)
        rep = first_of_gid[gid]
        return ray.data.from_arrow(
            pa.table(
                {
                    "p_brand": pa.array(brands[rep], pa.string()),
                    "p_type": pa.array(types[rep], pa.string()),
                    "p_size": pa.array(sizes[rep], pa.int64()),
                    "supplier_cnt": pa.array(n, pa.int64()),
                }
            )
        )

    def q_bracket_revenue(sf):
        # TPC-H Q19 shape: disjunctive (brand, size-band, quantity-band)
        # revenue over lineitem × part. The part dim folds to three
        # sorted partkey arrays (one per bracket) broadcast once; each
        # lineitem batch evaluates all three brackets vectorized and
        # emits ONE exact-int partial row (cents × (100-discount_bp)),
        # driver-folded in Python bigints — order-independent at any
        # corpus size.
        import pyarrow as pa
        import ray

        BRACKETS = (
            ("Brand#12", 1, 5, 1.0, 11.0),
            ("Brand#23", 1, 10, 10.0, 20.0),
            ("Brand#3", 1, 15, 20.0, 30.0),
        )
        part = ray.data.read_parquet(
            f"{sf}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
        )

        def dim(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            sz = tbl.column("p_size").to_numpy(zero_copy_only=False)
            out_k, out_b = [], []
            for bi, (brand, lo, hi, _, _) in enumerate(BRACKETS):
                m = (
                    pc.equal(tbl.column("p_brand"), brand).to_numpy(
                        zero_copy_only=False
                    )
                    & (sz >= lo)
                    & (sz <= hi)
                )
                out_k.append(
                    tbl.column("p_partkey").to_numpy(zero_copy_only=False)[m]
                )
                out_b.append(np.full(int(m.sum()), bi, np.int64))
            return pa.table(
                {
                    "pk": np.concatenate(out_k),
                    "bracket": np.concatenate(out_b),
                }
            )

        dim_rows = part.map_batches(
            dim, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        per_bracket = []
        for bi in range(len(BRACKETS)):
            ks = np.sort(
                np.array(
                    [r["pk"] for r in dim_rows if r["bracket"] == bi], np.int64
                )
            )
            per_bracket.append(ks)
        ref_br = ray.put(per_bracket)

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )

        def partial(tbl: pa.Table) -> pa.Table:
            brs = ray.get(ref_br)
            lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            qty = tbl.column("l_quantity").to_numpy(zero_copy_only=False)
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
            keep = np.zeros(lp.size, bool)
            for ks, (_, _, _, qlo, qhi) in zip(brs, BRACKETS):
                if ks.size == 0:
                    continue
                pos = np.searchsorted(ks, lp)
                pos[pos == ks.size] = 0
                keep |= (ks[pos] == lp) & (qty >= qlo) & (qty <= qhi)
            cents = np.floor(ep[keep] * 100.0).astype(np.int64)
            bp = np.floor(disc[keep] * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "revenue_e4": pa.array(
                        [int(np.sum(cents * (100 - bp)))], pa.int64()
                    ),
                    "n_items": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        rows = li.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        return ray.data.from_arrow(
            pa.table(
                {
                    "revenue_e4": pa.array(
                        [sum(int(r["revenue_e4"]) for r in rows)], pa.int64()
                    ),
                    "n_items": pa.array(
                        [sum(int(r["n_items"]) for r in rows)], pa.int64()
                    ),
                }
            )
        )

    def q_sales_opportunity(sf):
        # TPC-H Q22 shape: per-nation count + balance of rich-but-idle
        # customers (above the positive-balance mean, no URGENT order —
        # the synthetic orders table covers every custkey, so the
        # anti-join gates on the urgent subset to stay non-degenerate).
        # The mean threshold is exact: per-batch int cent partials fold
        # on the driver, and the filter compares cents*n > total (pure
        # BIGINT on both sides — no float mean). The never-urgent set
        # comes from the distinct-o_custkey fold (ONE int-pair shuffle),
        # broadcast sorted for a vectorized anti-probe of the dim.
        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )

        def pos_partial(tbl: pa.Table) -> pa.Table:
            bal = tbl.column("c_acctbal").to_numpy(zero_copy_only=False)
            cents = np.floor(bal[bal > 0.0] * 100.0).astype(np.int64)
            return pa.table(
                {
                    "s": pa.array([int(cents.sum())], pa.int64()),
                    "n": pa.array([cents.size], pa.int64()),
                }
            )

        parts = cust.map_batches(
            pos_partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        total = sum(int(r["s"]) for r in parts)
        n_pos = sum(int(r["n"]) for r in parts)

        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )

        def distinct_cust(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            urgent = pc.equal(
                tbl.column("o_orderpriority"), "1-URGENT"
            ).to_numpy(zero_copy_only=False)
            k = np.unique(
                tbl.column("o_custkey").to_numpy(zero_copy_only=False)[urgent]
            )
            return pa.table({"k": k, "one": np.ones(k.size, np.int64)})

        keys = bucketed_sum(
            orders.map_batches(
                distinct_cust, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="k",
            value_cols=("one",),
            reduce="min",
        )
        have = []
        for ref in keys.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                have.append(t.column("k").to_numpy(zero_copy_only=False))
        have_sorted = (
            np.sort(np.concatenate(have)) if have else np.zeros(0, np.int64)
        )
        ref_have = ray.put(have_sorted)

        def nation_partial(tbl: pa.Table) -> pa.Table:
            ordered = ray.get(ref_have)
            ck = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
            nk = tbl.column("c_nationkey").to_numpy(zero_copy_only=False)
            bal = tbl.column("c_acctbal").to_numpy(zero_copy_only=False)
            cents = np.floor(bal * 100.0).astype(np.int64)
            rich = cents * n_pos > total
            pos = np.searchsorted(ordered, ck)
            pos[pos == ordered.size] = 0 if ordered.size else 0
            never = (
                ordered[pos] != ck if ordered.size else np.ones(ck.size, bool)
            )
            m = rich & never
            nk_m, cents_m = nk[m].astype(np.int64), cents[m]
            o = np.argsort(nk_m, kind="stable")
            nk_s, c_s = nk_m[o], cents_m[o]
            starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
            if nk_s.size == 0:
                starts = np.zeros(0, np.int64)
            return pa.table(
                {
                    "c_nationkey": pa.array(nk_s[starts], pa.int64()),
                    "numcust": pa.array(
                        np.diff(np.r_[starts, nk_s.size]), pa.int64()
                    ),
                    "totacctbal_cents": pa.array(
                        np.add.reduceat(c_s, starts)
                        if nk_s.size
                        else np.zeros(0, np.int64),
                        pa.int64(),
                    ),
                }
            )

        partials = cust.map_batches(
            nation_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        )
        return bucketed_sum(
            partials,
            key_col="c_nationkey",
            value_cols=("numcust", "totacctbal_cents"),
            n_buckets=32,
        )

    def q_returned_cust_revenue(sf):
        # TPC-H Q10 shape: top-20 customers by revenue from RETURNED
        # items among orders placed in one quarter. lineitem folds
        # map-side to (orderkey, revenue_e4) int partials, ONE
        # co-partitioned hash join attaches o_custkey (orders is big
        # at scale — never broadcast), ONE custkey bucket-sum, then
        # the map-side-pruned global top-20; only the 20 winning keys
        # ever touch the customer dim (filtered scan, not a join).
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.merge import (
            bucketed_sum,
            global_topk,
        )

        lo = int(
            np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
        )
        hi = int(
            np.datetime64("1996-04-01").astype("datetime64[us]").astype(np.int64)
        )

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_extendedprice",
                "l_discount",
                "l_returnflag",
            ],
        )

        def li_partial(tbl: pa.Table) -> pa.Table:
            m = _pc.equal(tbl.column("l_returnflag"), "R").to_numpy(
                zero_copy_only=False
            )
            ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[
                m
            ]
            bp = np.floor(
                tbl.column("l_discount").to_numpy(zero_copy_only=False)[m]
                * 100.0
                + 0.5
            ).astype(np.int64)
            rev = np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
            order = np.argsort(ok, kind="stable")
            ks, rs = ok[order], rev[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "l_orderkey": ks[starts],
                    "revenue_e4": np.add.reduceat(rs, starts),
                }
            )

        rev = li.map_batches(
            li_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        )

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )

        def od_window(tbl: pa.Table) -> pa.Table:
            ts = (
                tbl.column("o_orderdate")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = (ts >= lo) & (ts < hi)
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey").to_numpy(
                        zero_copy_only=False
                    )[m],
                    "o_custkey": tbl.column("o_custkey").to_numpy(
                        zero_copy_only=False
                    )[m],
                }
            )

        odw = od.map_batches(
            od_window,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        )
        joined = hash_equi_join(
            rev,
            odw,
            on="l_orderkey",
            right_on="o_orderkey",
            left_cols=("revenue_e4",),
            right_cols=("o_custkey",),
        )
        per_cust = bucketed_sum(
            joined, key_col="o_custkey", value_cols=("revenue_e4",)
        )
        top = global_topk(
            per_cust, 20, id_col="o_custkey", value_col="revenue_e4"
        ).take_all()
        win_keys = np.sort(np.array([r["o_custkey"] for r in top], np.int64))
        ref_win = ray.put(win_keys)

        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        )

        def pick(tbl: pa.Table) -> pa.Table:
            keys = ray.get(ref_win)
            ck = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
            m = _isin_sorted(keys, ck)
            return tbl.filter(pa.array(m))

        crows = {
            r["c_custkey"]: r
            for r in cust.map_batches(
                pick, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        }
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        nname = dict(
            zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_name").to_pylist(),
            )
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_custkey": pa.array(
                        [r["o_custkey"] for r in top], pa.int64()
                    ),
                    "c_name": pa.array(
                        [crows[r["o_custkey"]]["c_name"] for r in top]
                    ),
                    "revenue_e4": pa.array(
                        [int(r["revenue_e4"]) for r in top], pa.int64()
                    ),
                    "acctbal_cents": pa.array(
                        [
                            int(
                                np.floor(
                                    crows[r["o_custkey"]]["c_acctbal"] * 100.0
                                )
                            )
                            for r in top
                        ],
                        pa.int64(),
                    ),
                    "n_name": pa.array(
                        [
                            nname[crows[r["o_custkey"]]["c_nationkey"]]
                            for r in top
                        ]
                    ),
                    "rank": pa.array(
                        [int(r["rank"]) for r in top], pa.int64()
                    ),
                }
            )
        )

    def q_top_supplier_qtr(sf):
        # TPC-H Q15 shape: the supplier(s) with MAX revenue over one
        # ship quarter, ties kept. Per-batch (suppkey, revenue_e4)
        # reduceat partials -> ONE suppkey bucket-sum -> the agg table
        # is supplier-cardinality (dim-sized metadata), so the max +
        # equality filter folds on the driver; names decode from the
        # supplier dim read once.
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        lo = int(
            np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
        )
        hi = int(
            np.datetime64("1996-04-01").astype("datetime64[us]").astype(np.int64)
        )
        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )

        def partial(tbl: pa.Table) -> pa.Table:
            ts = (
                tbl.column("l_shipdate")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = (ts >= lo) & (ts < hi)
            sk = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)[m]
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[
                m
            ]
            bp = np.floor(
                tbl.column("l_discount").to_numpy(zero_copy_only=False)[m]
                * 100.0
                + 0.5
            ).astype(np.int64)
            rev = np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
            order = np.argsort(sk, kind="stable")
            ks, rs = sk[order], rev[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "l_suppkey": ks[starts],
                    "total_revenue_e4": np.add.reduceat(rs, starts),
                }
            )

        agg = bucketed_sum(
            li.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="l_suppkey",
            value_cols=("total_revenue_e4",),
        ).take_all()
        best = max(int(r["total_revenue_e4"]) for r in agg)
        winners = sorted(
            (int(r["l_suppkey"]), int(r["total_revenue_e4"]))
            for r in agg
            if int(r["total_revenue_e4"]) == best
        )
        supp = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        sname = dict(
            zip(
                supp.column("s_suppkey").to_pylist(),
                supp.column("s_name").to_pylist(),
            )
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([k for k, _ in winners], pa.int64()),
                    "s_name": pa.array([sname[k] for k, _ in winners]),
                    "total_revenue_e4": pa.array(
                        [v for _, v in winners], pa.int64()
                    ),
                }
            )
        )

    def q_nation_profit(sf):
        # TPC-H Q9 shape (sans partsupp — cost proxies at the part's
        # retail price): profit by supplier nation x ship year over
        # parts named '%blue%'. Both dims fold to sorted int arrays
        # broadcast once via ray.put; each lineitem batch reduces to
        # <= nations x years rows of exact-int partials (profit_e4 =
        # cents_ep*(100-bp) - retail_cents*qty*100), ONE tiny
        # composite-key bucket-sum — lineitem never shuffles.
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        part = pq.read_table(
            f"{sf}/part.parquet",
            columns=["p_partkey", "p_name", "p_retailprice"],
        )
        m = _pc.match_substring(part.column("p_name"), "blue").to_numpy(
            zero_copy_only=False
        )
        pk = part.column("p_partkey").to_numpy(zero_copy_only=False)[m]
        rc = np.floor(
            part.column("p_retailprice").to_numpy(zero_copy_only=False)[m]
            * 100.0
        ).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        supp = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sn = supp.column("s_nationkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sorder = np.argsort(sk, kind="stable")
        ref = ray.put((pk[order], rc[order], sk[sorder], sn[sorder]))

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=[
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )

        def partial(tbl: pa.Table) -> pa.Table:
            bpk, brc, bsk, bsn = ray.get(ref)
            lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            hit = _isin_sorted(bpk, lp)
            if not hit.any():
                return pa.table(
                    {
                        "key": pa.array([], pa.int64()),
                        "profit_e4": pa.array([], pa.int64()),
                        "n_items": pa.array([], pa.int64()),
                    }
                )
            retail = brc[np.searchsorted(bpk, lp[hit])]
            ls = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)[hit]
            nk = bsn[np.searchsorted(bsk, ls)]
            qty = (
                tbl.column("l_quantity")
                .to_numpy(zero_copy_only=False)[hit]
                .astype(np.int64)
            )
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[
                hit
            ]
            bp = np.floor(
                tbl.column("l_discount").to_numpy(zero_copy_only=False)[hit]
                * 100.0
                + 0.5
            ).astype(np.int64)
            profit = (
                np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
                - retail * qty * 100
            )
            year = (
                tbl.column("l_shipdate")
                .to_numpy(zero_copy_only=False)[hit]
                .astype("datetime64[Y]")
                .astype(np.int64)
                + 1970
            )
            key = nk * 10000 + year
            korder = np.argsort(key, kind="stable")
            ks, ps = key[korder], profit[korder]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table(
                {
                    "key": ks[starts],
                    "profit_e4": np.add.reduceat(ps, starts),
                    "n_items": np.diff(
                        np.r_[starts, ks.shape[0]]
                    ).astype(np.int64),
                }
            )

        summed = bucketed_sum(
            li.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="key",
            value_cols=("profit_e4", "n_items"),
        )
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        nmap = dict(
            zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_name").to_pylist(),
            )
        )
        ref_n = ray.put(nmap)

        def decode(tbl: pa.Table) -> pa.Table:
            names = ray.get(ref_n)
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_name": pa.array(
                        [names[int(k) // 10000] for k in key]
                    ),
                    "o_year": pa.array(key % 10000, pa.int64()),
                    "profit_e4": tbl.column("profit_e4"),
                    "n_items": tbl.column("n_items"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_priority_fill_rate(sf):
        # TPC-H Q4 shape: per order-priority, how many orders had ANY
        # line shipped within 30 days of ordering. lineitem folds
        # map-side to (orderkey, min_ship) int-min partials, ONE
        # co-partitioned hash join against orders (priorities recode to
        # int before the shuffle), then a priority-sized int rollup.
        import pyarrow as pa
        import pyarrow.compute as _pc
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.merge import bucketed_sum

        US_30D = 30 * 86_400_000_000

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )

        def li_partial(tbl: pa.Table) -> pa.Table:
            ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
            ts = (
                tbl.column("l_shipdate")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            order = np.lexsort((ts, ok))
            ks, ss = ok[order], ts[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
            return pa.table({"l_orderkey": ks[starts], "ms": ss[starts]})

        min_ship = bucketed_sum(
            li.map_batches(
                li_partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="l_orderkey",
            value_cols=("ms",),
            reduce="min",
        )

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )

        def prio_stage(tbl: pa.Table) -> pa.Table:
            u = _pc.unique(tbl.column("o_orderpriority"))
            return pa.table({"p": u})

        prios = sorted(
            {
                r["p"]
                for r in od.map_batches(
                    prio_stage, batch_format="pyarrow", zero_copy_batch=True
                ).take_all()
            }
        )
        ref_p = ray.put(pa.array(prios, pa.string()))

        def od_code(tbl: pa.Table) -> pa.Table:
            parr = ray.get(ref_p)
            code = (
                _pc.index_in(tbl.column("o_orderpriority"), value_set=parr)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey"),
                    "odate": pa.array(
                        tbl.column("o_orderdate")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        pa.int64(),
                    ),
                    "prio": pa.array(code, pa.int64()),
                }
            )

        odc = od.map_batches(
            od_code, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
        )
        joined = hash_equi_join(
            min_ship,
            odc,
            on="l_orderkey",
            right_on="o_orderkey",
            left_cols=("ms",),
            right_cols=("odate", "prio"),
        )

        def rollup(tbl: pa.Table) -> pa.Table:
            ms = tbl.column("ms").to_numpy(zero_copy_only=False)
            odate = tbl.column("odate").to_numpy(zero_copy_only=False)
            prio = tbl.column("prio").to_numpy(zero_copy_only=False)
            fast = (ms <= odate + US_30D).astype(np.int64)
            order = np.argsort(prio, kind="stable")
            ps, fs = prio[order], fast[order]
            starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]][: ps.size])
            return pa.table(
                {
                    "prio": ps[starts],
                    "n_orders": np.diff(
                        np.r_[starts, ps.shape[0]]
                    ).astype(np.int64),
                    "n_fast": np.add.reduceat(fs, starts),
                }
            )

        summed = bucketed_sum(
            joined.map_batches(
                rollup,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="prio",
            value_cols=("n_orders", "n_fast"),
        )

        def decode(tbl: pa.Table) -> pa.Table:
            parr = ray.get(ref_p)
            code = tbl.column("prio").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderpriority": parr.take(pa.array(code)),
                    "n_orders": tbl.column("n_orders"),
                    "n_fast": tbl.column("n_fast"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_user_burstiness(sf):
        # inter-arrival burstiness B = (σ−μ)/(σ+μ) per user, from EXACT
        # integer gap moments (whole-second truncation, Σd and Σd² in
        # int64): ONE user-bucket shuffle of fixed-width ints, segmented
        # diff/reduceat fold, then B as a single fixed double expression
        # of the exact ints — bitwise-matching the SQL twin. Per-user
        # event counts are bounded (product-analytics contract), so the
        # int64 Σd² headroom (~10⁶ gaps × year²-seconds) always holds.
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.functions.buckets import bucket_of

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
        )

        def prep(tbl: pa.Table) -> pa.Table:
            u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": bucket_of(u, 256),
                    "u": u,
                    "tsec": us // 1_000_000,
                    "seq": tbl.column("event_id"),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            empty = pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "burstiness": pa.array([], pa.float64()),
                }
            )
            if u.size == 0:
                return empty
            t = group.column("tsec").to_numpy(zero_copy_only=False)
            seq = group.column("seq").to_numpy(zero_copy_only=False)
            order = np.lexsort((seq, t, u))
            u_s, t_s = u[order], t[order]
            gap_ok = u_s[1:] == u_s[:-1]
            d = (t_s[1:] - t_s[:-1])[gap_ok]
            du = u_s[1:][gap_ok]
            if du.size == 0:
                return empty
            starts = np.flatnonzero(np.r_[True, du[1:] != du[:-1]][: du.size])
            s1 = np.add.reduceat(d, starts)
            s2 = np.add.reduceat(d * d, starts)
            n = np.diff(np.r_[starts, du.size])
            keep = s1 > 0
            s1f = s1[keep].astype(np.float64)
            s2f = s2[keep].astype(np.float64)
            nf = n[keep].astype(np.float64)
            sig = np.sqrt(nf * s2f - s1f * s1f)
            return pa.table(
                {
                    "user_id": pa.array(du[starts][keep], pa.int64()),
                    "n_gaps": pa.array(n[keep], pa.int64()),
                    "burstiness": pa.array(
                        (sig - s1f) / (sig + s1f), pa.float64()
                    ),
                }
            )

        return (
            ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )

    def q_daily_cusum(sf):
        # change-point screen: CUSUM of daily event counts against the
        # all-days mean, kept EXACT by scaling — cusum_scaled_k =
        # Σ_{i≤k} (nᵢ·K − T) over observed days in day order (K days,
        # T events) — pure int64, no float mean. Daily counts fold via
        # batch partials + ONE coarse-bucket shuffle; the day table is
        # metadata-sized at any corpus size, so the ordered prefix runs
        # on the driver.
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        DAY_US = 86_400_000_000
        ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["ts"])

        def partial(tbl: pa.Table) -> pa.Table:
            us = pc.cast(
                tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            day = us // DAY_US
            vals, cnt = np.unique(day, return_counts=True)
            return pa.table(
                {"day": vals, "n": cnt.astype(np.int64)}
            )

        daily = bucketed_sum(
            ev.map_batches(
                partial,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="day",
            value_cols=("n",),
            n_buckets=64,
        ).take_all()
        day = np.array([r["day"] for r in daily], np.int64)
        n = np.array([r["n"] for r in daily], np.int64)
        order = np.argsort(day, kind="stable")
        day, n = day[order], n[order]
        kk, t = day.size, int(n.sum())
        cusum = np.cumsum(n * kk - t)
        return ray.data.from_arrow(
            pa.table(
                {
                    "day": pa.array(day, pa.int64()),
                    "n": pa.array(n, pa.int64()),
                    "cusum_scaled": pa.array(cusum, pa.int64()),
                }
            )
        )

    def q_market_share(sf):
        # TPC-H Q8 shape: of the revenue ASIA-region customers ordered,
        # the share supplied by NATION_2 suppliers, per order year.
        # customer/nation/region and supplier nationkeys fold to sorted
        # int arrays broadcast ONCE via ray.put; orders gate + carry
        # o_year map-side; ONE co-partitioned big-big lineitem=orders
        # shuffle (pipelines/join.py); the joined stream combines to
        # <= years x 2 exact-int partials per batch. Share = one
        # int64->double division per year row (bitwise vs SQL CAST).
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.pipelines.join import hash_equi_join
        from python_prtree_ray.pipelines.merge import bucketed_sum

        reg = pq.read_table(f"{sf}/region.parquet")
        rkey = reg.column("r_regionkey").to_pylist()[
            reg.column("r_name").to_pylist().index("ASIA")
        ]
        nat = pq.read_table(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
        )
        asia_nations = set(
            k
            for k, r in zip(
                nat.column("n_nationkey").to_pylist(),
                nat.column("n_regionkey").to_pylist(),
            )
            if r == rkey
        )
        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
        asia_cust = np.sort(ck[np.isin(cn, np.array(sorted(asia_nations)))])
        supp = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sn = supp.column("s_nationkey").to_numpy(zero_copy_only=False)
        target_supp = np.sort(sk[sn == 2])
        ref = ray.put((asia_cust, target_supp))

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )

        def gate_orders(tbl: pa.Table) -> pa.Table:
            ac, _ = ray.get(ref)
            oc = tbl.column("o_custkey").to_numpy(zero_copy_only=False)
            hit = _isin_sorted(ac, oc)
            year = (
                tbl.column("o_orderdate")
                .to_numpy(zero_copy_only=False)[hit]
                .astype("datetime64[Y]")
                .astype(np.int64)
                + 1970
            )
            return pa.table(
                {
                    "o_orderkey": tbl.column("o_orderkey")
                    .to_numpy(zero_copy_only=False)[hit]
                    .astype(np.int64),
                    "o_year": year,
                }
            )

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )

        def li_prep(tbl: pa.Table) -> pa.Table:
            ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            bp = np.floor(
                tbl.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
                + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "l_orderkey": tbl.column("l_orderkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "l_suppkey": tbl.column("l_suppkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "rev_e4": np.floor(ep * 100.0).astype(np.int64)
                    * (100 - bp),
                }
            )

        joined = hash_equi_join(
            li.map_batches(
                li_prep, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            ),
            od.map_batches(
                gate_orders, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            ),
            on="l_orderkey", right_on="o_orderkey",
            left_cols=("l_suppkey", "rev_e4"),
            right_cols=("o_year",),
        )

        def partial(tbl: pa.Table) -> pa.Table:
            _, ts = ray.get(ref)
            year = tbl.column("o_year").to_numpy(zero_copy_only=False)
            rev = tbl.column("rev_e4").to_numpy(zero_copy_only=False)
            ls = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)
            is_t = _isin_sorted(ts, ls)
            order = np.argsort(year, kind="stable")
            ys, rs, ms = year[order], rev[order], is_t[order]
            starts = np.flatnonzero(np.r_[True, ys[1:] != ys[:-1]][: ys.size])
            return pa.table(
                {
                    "o_year": ys[starts],
                    "nation_rev_e4": np.add.reduceat(
                        np.where(ms, rs, np.int64(0)), starts
                    ),
                    "total_rev_e4": np.add.reduceat(rs, starts),
                }
            )

        summed = bucketed_sum(
            joined.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            ),
            key_col="o_year",
            value_cols=("nation_rev_e4", "total_rev_e4"),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            num = tbl.column("nation_rev_e4").to_numpy(zero_copy_only=False)
            den = tbl.column("total_rev_e4").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_year": tbl.column("o_year"),
                    "nation_rev_e4": pa.array(num, pa.int64()),
                    "total_rev_e4": pa.array(den, pa.int64()),
                    "mkt_share": pa.array(
                        num.astype(np.float64) / den.astype(np.float64),
                        pa.float64(),
                    ),
                }
            )

        return summed.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_excess_parts(sf):
        # TPC-H Q20 shape (sans partsupp — "excess share" is measured
        # against the part's own per-supplier mean): suppliers that
        # moved > 1.5x the average supplier's quantity of some '%red%'
        # part, with the count of such parts. The part filter broadcasts
        # once; lineitem folds per batch to (pk, sk, qty) partials; ONE
        # partkey-bucket shuffle co-locates each part's pair sums with
        # its total (division-free test 2*q*ns > 3*tq in exact int64);
        # the survivor fold is a supplier-sized bucket sum.
        import pyarrow as pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum

        part = pq.read_table(
            f"{sf}/part.parquet", columns=["p_partkey", "p_name"]
        )
        m = _pc.match_substring(part.column("p_name"), "red").to_numpy(
            zero_copy_only=False
        )
        red = np.sort(
            part.column("p_partkey").to_numpy(zero_copy_only=False)[m]
        ).astype(np.int64)
        ref = ray.put(red)

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        )

        def partial(tbl: pa.Table) -> pa.Table:
            bp = ray.get(ref)
            lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
            hit = _isin_sorted(bp, lp)
            pk = lp[hit].astype(np.int64)
            sk = (
                tbl.column("l_suppkey")
                .to_numpy(zero_copy_only=False)[hit]
                .astype(np.int64)
            )
            q = (
                tbl.column("l_quantity")
                .to_numpy(zero_copy_only=False)[hit]
                .astype(np.int64)
            )
            order = np.lexsort((sk, pk))
            pk, sk, q = pk[order], sk[order], q[order]
            starts = np.flatnonzero(
                np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])][: pk.size]
            )
            pk, sk = pk[starts], sk[starts]
            return pa.table(
                {
                    "kb": bucket_of(pk, 512),
                    "pk": pk,
                    "sk": sk,
                    "q": np.add.reduceat(q, starts)
                    if q.size
                    else np.empty(0, np.int64),
                }
            )

        def per_part(group: pa.Table) -> pa.Table:
            pk = group.column("pk").to_numpy(zero_copy_only=False)
            empty = pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "n_parts": pa.array([], pa.int64()),
                }
            )
            if pk.size == 0:
                return empty
            sk = group.column("sk").to_numpy(zero_copy_only=False)
            q = group.column("q").to_numpy(zero_copy_only=False)
            order = np.lexsort((sk, pk))
            pk, sk, q = pk[order], sk[order], q[order]
            pstarts = np.flatnonzero(
                np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])][: pk.size]
            )
            pk, sk = pk[pstarts], sk[pstarts]
            q = np.add.reduceat(q, pstarts)
            tstarts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]][: pk.size])
            grp = np.cumsum(np.r_[False, pk[1:] != pk[:-1]])
            tq = np.add.reduceat(q, tstarts)
            ns = np.diff(np.r_[tstarts, pk.size]).astype(np.int64)
            win = 2 * q * ns[grp] > 3 * tq[grp]
            if not win.any():
                return empty
            wsk = np.sort(sk[win])
            sstarts = np.flatnonzero(np.r_[True, wsk[1:] != wsk[:-1]][: wsk.size])
            return pa.table(
                {
                    "s_suppkey": wsk[sstarts],
                    "n_parts": np.diff(np.r_[sstarts, wsk.size]).astype(
                        np.int64
                    ),
                }
            )

        survivors = (
            li.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            )
            .groupby("kb")
            .map_groups(per_part, batch_format="pyarrow")
        )
        summed = bucketed_sum(
            survivors, key_col="s_suppkey", value_cols=("n_parts",)
        )
        names = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        nmap = dict(
            zip(
                names.column("s_suppkey").to_pylist(),
                names.column("s_name").to_pylist(),
            )
        )
        ref_n = ray.put(nmap)

        def decode(tbl: pa.Table) -> pa.Table:
            nm = ray.get(ref_n)
            keys = tbl.column("s_suppkey").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "s_suppkey": pa.array(keys, pa.int64()),
                    "s_name": pa.array([nm[int(k)] for k in keys]),
                    "n_parts": tbl.column("n_parts"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_waiting_suppliers(sf):
        # TPC-H Q21 shape (late := shipped > 60 days after the order
        # date): on multi-supplier orders where EXACTLY ONE supplier
        # shipped late, count blamed orders per supplier. Both sides
        # are big -> ONE co-partitioned orderkey-bucket shuffle carries
        # (orderkey, suppkey, ship_us) + (orderkey, order_us); the
        # in-bucket fold joins via searchsorted, collapses to distinct
        # (order, supplier, any-late) pairs, applies the exactly-one
        # rule, and emits supplier-count partials.
        import pyarrow as pa
        import ray
        from python_prtree_ray.functions.buckets import bucket_of
        from python_prtree_ray.pipelines.merge import bucketed_sum

        LATE_US = np.int64(60) * 86400 * 1000000

        li = ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
        od = ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )

        def li_prep(tbl: pa.Table) -> pa.Table:
            ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "kb": bucket_of(ok, 512),
                    "ok": ok,
                    "sk": tbl.column("l_suppkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "t": tbl.column("l_shipdate")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "side": np.zeros(ok.size, np.int8),
                }
            )

        def od_prep(tbl: pa.Table) -> pa.Table:
            ok = tbl.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "kb": bucket_of(ok, 512),
                    "ok": ok,
                    "sk": np.zeros(ok.size, np.int64),
                    "t": tbl.column("o_orderdate")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "side": np.ones(ok.size, np.int8),
                }
            )

        tagged = li.map_batches(
            li_prep, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ).union(
            od.map_batches(
                od_prep, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=65536,
            )
        )

        def fold(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
            side = group.column("side").to_numpy(zero_copy_only=False)
            ok = group.column("ok").to_numpy(zero_copy_only=False)
            sk = group.column("sk").to_numpy(zero_copy_only=False)
            t = group.column("t").to_numpy(zero_copy_only=False)
            is_o = side == 1
            ook = ok[is_o]
            oord = np.argsort(ook, kind="stable")
            ook_s, ot_s = ook[oord], t[is_o][oord]
            lok, lsk, lt = ok[~is_o], sk[~is_o], t[~is_o]
            if lok.size == 0 or ook_s.size == 0:
                return empty
            pos = np.searchsorted(ook_s, lok)
            # inner join: every lineitem's order exists (FK), but stay
            # defensive about partial buckets
            okm = (pos < ook_s.size) & (
                ook_s[np.minimum(pos, ook_s.size - 1)] == lok
            )
            lok, lsk, lt = lok[okm], lsk[okm], lt[okm]
            if lok.size == 0:
                return empty
            late = (
                lt > ot_s[np.searchsorted(ook_s, lok)] + LATE_US
            ).astype(np.int64)
            order = np.lexsort((lsk, lok))
            lok, lsk, late = lok[order], lsk[order], late[order]
            pstarts = np.flatnonzero(
                np.r_[True, (lok[1:] != lok[:-1]) | (lsk[1:] != lsk[:-1])][: lok.size]
            )
            pok, psk = lok[pstarts], lsk[pstarts]
            plate = np.maximum.reduceat(late, pstarts)
            ostarts = np.flatnonzero(np.r_[True, pok[1:] != pok[:-1]][: pok.size])
            n_supp = np.diff(np.r_[ostarts, pok.size]).astype(np.int64)
            n_late = np.add.reduceat(plate, ostarts)
            blamed = (n_supp >= 2) & (n_late == 1)
            if not blamed.any():
                return empty
            # the single late pair inside each blamed order: argmax of
            # plate within the order segment (exactly one 1 by the rule)
            grp = np.cumsum(np.r_[False, pok[1:] != pok[:-1]])
            late_sk = psk[plate == 1]
            late_ok_grp = grp[plate == 1]
            want = late_sk[blamed[late_ok_grp]]
            wsk = np.sort(want)
            sstarts = np.flatnonzero(np.r_[True, wsk[1:] != wsk[:-1]][: wsk.size])
            return pa.table(
                {
                    "s_suppkey": wsk[sstarts],
                    "n_orders": np.diff(np.r_[sstarts, wsk.size]).astype(
                        np.int64
                    ),
                }
            )

        partials = tagged.groupby("kb").map_groups(
            fold, batch_format="pyarrow"
        )
        summed = bucketed_sum(
            partials, key_col="s_suppkey", value_cols=("n_orders",)
        )
        import pyarrow.parquet as pq

        names = pq.read_table(
            f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        nmap = dict(
            zip(
                names.column("s_suppkey").to_pylist(),
                names.column("s_name").to_pylist(),
            )
        )
        ref_n = ray.put(nmap)

        def decode(tbl: pa.Table) -> pa.Table:
            nm = ray.get(ref_n)
            keys = tbl.column("s_suppkey").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "s_suppkey": pa.array(keys, pa.int64()),
                    "s_name": pa.array([nm[int(k)] for k in keys]),
                    "n_orders": tbl.column("n_orders"),
                }
            )

        return summed.map_batches(
            decode, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_cube_revenue(sf):
        # OLAP ROLLUP(priority, year) over orders in ONE fact-table
        # pass: per-batch exact-int partials keyed by the packed
        # (priority-code, year) pair; the finest-level aggregate is
        # metadata-sized (5 priorities x ~7 years), so the coarser
        # rollup levels are derived from it driver-side without a
        # second scan or shuffle. Revenue stays int cents end to end.
        import pyarrow as pa
        import ray

        od = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
        )

        def partial(tbl: pa.Table) -> pa.Table:
            d = tbl.column("o_orderpriority").combine_chunks().dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            cats = d.dictionary.to_pylist()
            year = (
                tbl.column("o_orderdate")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]")
                .astype(np.int64)
                + 1970
            )
            cents = np.floor(
                tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            key = codes * 4096 + (year - 1900)
            uk, inv = np.unique(key, return_inverse=True)
            n = np.bincount(inv, minlength=uk.size).astype(np.int64)
            rc = np.zeros(uk.size, np.int64)
            np.add.at(rc, inv, cents)
            return pa.table(
                {
                    "o_orderpriority": pa.array(
                        [cats[int(k) // 4096] for k in uk], pa.string()
                    ),
                    "o_year": uk % 4096 + 1900,
                    "n_orders": n,
                    "revenue_c": rc,
                }
            )

        rows = od.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        agg: dict[tuple[str | None, int | None], list[int]] = {}
        for r in rows:
            for k in (
                (r["o_orderpriority"], int(r["o_year"])),  # finest
                (r["o_orderpriority"], None),  # per-priority subtotal
                (None, None),  # grand total
            ):
                a = agg.setdefault(k, [0, 0])
                a[0] += int(r["n_orders"])
                a[1] += int(r["revenue_c"])
        keys = sorted(agg, key=lambda k: (k[0] is None, k[0] or "", k[1] is None, k[1] or 0))
        return ray.data.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array(
                        [k[0] for k in keys], pa.string()
                    ),
                    "o_year": pa.array(
                        [k[1] for k in keys], pa.int64()
                    ),
                    "n_orders": pa.array(
                        [agg[k][0] for k in keys], pa.int64()
                    ),
                    "revenue_c": pa.array(
                        [agg[k][1] for k in keys], pa.int64()
                    ),
                }
            )
        )

    def q_events_pivot(sf):
        # long->wide pivot: event counts by type x day-of-week as ONE
        # wide row per type (dow_0..dow_6 columns) — per-batch packed
        # (type-code, dow) partials, driver-side pivot of the
        # metadata-sized fold (types x 7)
        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "ts"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            d = tbl.column("event_type").combine_chunks().dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            cats = d.dictionary.to_pylist()
            days = (
                tbl.column("ts")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[D]")
                .astype(np.int64)
            )
            dow = (days + 4) % 7  # 1970-01-01 is a Thursday; 0 = Sunday
            key = codes * 7 + dow
            uk, inv = np.unique(key, return_inverse=True)
            n = np.bincount(inv, minlength=uk.size).astype(np.int64)
            return pa.table(
                {
                    "event_type": pa.array(
                        [cats[int(k) // 7] for k in uk], pa.string()
                    ),
                    "dow": uk % 7,
                    "n": n,
                }
            )

        rows = ev.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        agg: dict[str, np.ndarray] = {}
        for r in rows:
            agg.setdefault(r["event_type"], np.zeros(7, np.int64))[
                int(r["dow"])
            ] += int(r["n"])
        types = sorted(agg)
        cols: dict[str, Any] = {
            "event_type": pa.array(types, pa.string())
        }
        for d in range(7):
            cols[f"dow_{d}"] = pa.array(
                [int(agg[t][d]) for t in types], pa.int64()
            )
        return ray.data.from_arrow(pa.table(cols))

    def q_source_lang_entropy(sf):
        # per-source Shannon entropy of the language mix: ONE
        # (source, lang) count fold (20 x 5 = metadata-sized), entropy
        # assembled driver-side as an explicit left-to-right chain of
        # -(p)*ln(p) terms in sorted-lang order with libm math.log —
        # the exact expression tree the SQL twin spells out, so the
        # doubles match bitwise (numpy's vectorized log differs from
        # DuckDB's LN by 1 ulp on ~27% of inputs; libm does not)
        import math

        import pyarrow as pa
        import ray

        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["source", "lang"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            ds_ = tbl.column("source").combine_chunks().dictionary_encode()
            dl = tbl.column("lang").combine_chunks().dictionary_encode()
            sc = ds_.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            lc = dl.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            scat = ds_.dictionary.to_pylist()
            lcat = dl.dictionary.to_pylist()
            key = sc * 4096 + lc
            uk, inv = np.unique(key, return_inverse=True)
            n = np.bincount(inv, minlength=uk.size).astype(np.int64)
            return pa.table(
                {
                    "source": pa.array(
                        [scat[int(k) // 4096] for k in uk], pa.string()
                    ),
                    "lang": pa.array(
                        [lcat[int(k) % 4096] for k in uk], pa.string()
                    ),
                    "n": n,
                }
            )

        rows = docs.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        agg: dict[str, dict[str, int]] = {}
        for r in rows:
            agg.setdefault(r["source"], {})
            agg[r["source"]][r["lang"]] = (
                agg[r["source"]].get(r["lang"], 0) + int(r["n"])
            )
        sources = sorted(agg)
        n_docs, ent = [], []
        for s in sources:
            tot = sum(agg[s].values())
            e = 0.0
            for lang in sorted(agg[s]):  # sorted-lang chain = SQL order
                n = agg[s][lang]
                if n:
                    p = float(n) / float(tot)
                    e = e + (0.0 - (p * math.log(p)))
            n_docs.append(tot)
            ent.append(e)
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(sources, pa.string()),
                    "n_docs": pa.array(n_docs, pa.int64()),
                    "entropy": pa.array(ent, pa.float64()),
                }
            )
        )

    def q_custkey_setops(sf):
        # key-set algebra across fact tables: every customer classified
        # as appearing in orders only / events only / both / neither.
        # The two distinct-key sets are CUSTOMER-DIMENSION-sized (TPC-H
        # invariant: custkeys are the small side), so they fold to
        # sorted arrays broadcast ONCE via ray.put — the same
        # broadcast-semi-join shape as orders_semi_bloom; the customer
        # scan then emits 4 int counters per batch.
        import pyarrow as pa
        import ray

        def distinct_keys(path: str, col: str) -> np.ndarray:
            ds_ = ray.data.read_parquet(path, columns=[col])

            def uniq(tbl: pa.Table) -> pa.Table:
                v = np.unique(
                    tbl.column(col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                return pa.table({"k": v})

            parts = ds_.map_batches(
                uniq,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=65536,
            ).take_all()
            if not parts:
                return np.zeros(0, np.int64)
            return np.unique(np.array([r["k"] for r in parts], np.int64))

        ok = distinct_keys(f"{sf}/orders.parquet", "o_custkey")
        ek = distinct_keys(f"{sf}/events.parquet", "user_id")
        ref = ray.put((ok, ek))
        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet", columns=["c_custkey"]
        )

        def classify(tbl: pa.Table) -> pa.Table:
            o, e = ray.get(ref)
            ck = (
                tbl.column("c_custkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            in_o = _isin_sorted(o, ck)
            in_e = _isin_sorted(e, ck)
            counts = np.array(
                [
                    int((in_o & in_e).sum()),
                    int((in_o & ~in_e).sum()),
                    int((~in_o & in_e).sum()),
                    int((~in_o & ~in_e).sum()),
                ],
                np.int64,
            )
            return pa.table(
                {
                    "category": pa.array(
                        ["both", "orders_only", "events_only", "neither"],
                        pa.string(),
                    ),
                    "n_customers": counts,
                }
            )

        rows = cust.map_batches(
            classify,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        agg = {"both": 0, "orders_only": 0, "events_only": 0, "neither": 0}
        for r in rows:
            agg[r["category"]] += int(r["n_customers"])
        cats = sorted(k for k, v in agg.items() if v > 0)
        return ray.data.from_arrow(
            pa.table(
                {
                    "category": pa.array(cats, pa.string()),
                    "n_customers": pa.array(
                        [agg[c] for c in cats], pa.int64()
                    ),
                }
            )
        )

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

    def q_value_welch_t(sf):
        # Welch's t-test (purchase vs view values, cents grid): exact
        # int64 moment partials (n, sum, sum-of-squares per group fit
        # comfortably: q <= n * cents_max^2), ONE pinned float chain
        # for means, t, and the Welch–Satterthwaite df
        import math

        import pyarrow as pa
        import ray

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "value"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            et = tbl.column("event_type")
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            out = []
            for name in ("purchase", "view"):
                m = pc.equal(et, name).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                c = cents[m]
                out.extend(
                    [int(c.size), int(c.sum()), int(np.sum(c * c))]
                )
            return pa.table(
                {
                    "n1": pa.array([out[0]], pa.int64()),
                    "s1": pa.array([out[1]], pa.int64()),
                    "q1": pa.array([out[2]], pa.int64()),
                    "n2": pa.array([out[3]], pa.int64()),
                    "s2": pa.array([out[4]], pa.int64()),
                    "q2": pa.array([out[5]], pa.int64()),
                }
            )

        rows = ev.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        n1 = sum(int(r["n1"]) for r in rows)
        s1 = sum(int(r["s1"]) for r in rows)
        q1 = sum(int(r["q1"]) for r in rows)
        n2 = sum(int(r["n2"]) for r in rows)
        s2 = sum(int(r["s2"]) for r in rows)
        q2 = sum(int(r["q2"]) for r in rows)
        if n1 >= 2 and n2 >= 2:
            m1 = float(s1) / float(n1)
            m2 = float(s2) / float(n2)
            v1 = (float(q1) - float(s1) * float(s1) / float(n1)) / float(
                n1 - 1
            )
            v2 = (float(q2) - float(s2) * float(s2) / float(n2)) / float(
                n2 - 1
            )
            a = v1 / float(n1)
            b = v2 / float(n2)
            t = (m1 - m2) / math.sqrt(a + b)
            df = (a + b) * (a + b) / (
                a * a / float(n1 - 1) + b * b / float(n2 - 1)
            )
        else:  # degenerate group: DuckDB x / 0.0 is NULL
            m1 = float(s1) / float(n1) if n1 else None
            m2 = float(s2) / float(n2) if n2 else None
            t = None
            df = None
        return ray.data.from_arrow(
            pa.table(
                {
                    "n1": pa.array([n1], pa.int64()),
                    "n2": pa.array([n2], pa.int64()),
                    "mean1": pa.array([m1], pa.float64()),
                    "mean2": pa.array([m2], pa.float64()),
                    "t_stat": pa.array([t], pa.float64()),
                    "df": pa.array([df], pa.float64()),
                }
            )
        )

    def q_value_mwu(sf):
        # Mann–Whitney U between purchase and click values on the
        # distinct-cents grid (same quantization as value_ks): exact
        # integer doubled rank-sums via one (cents, n_p, n_c) fold,
        # then ONE pinned float chain for U and the normal-approx z
        import math

        import pyarrow as pa
        import ray
        from python_prtree_ray.pipelines.merge import bucketed_sum

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "value"]
        )

        def partial(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            et = tbl.column("event_type")
            is_p = pc.equal(et, "purchase").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            is_c = pc.equal(et, "click").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            keep = is_p | is_c
            isp = is_p[keep].astype(np.int64)
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False)[keep]
                * 100.0
            ).astype(np.int64)
            order = np.argsort(cents, kind="stable")
            c_s, p_s = cents[order], isp[order]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
            n_p = np.add.reduceat(p_s, starts)
            n_t = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
            return pa.table(
                {"cents": c_s[starts], "n_p": n_p, "n_t": n_t}
            )

        hist = bucketed_sum(
            ev.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            key_col="cents",
            value_cols=("n_p", "n_t"),
        ).take_all()  # distinct-cents grid: metadata-sized
        vals = np.array([r["cents"] for r in hist], np.int64)
        n_p = np.array([r["n_p"] for r in hist], np.int64)
        n_t = np.array([r["n_t"] for r in hist], np.int64)
        order = np.argsort(vals)
        n_p, n_t = n_p[order], n_t[order]
        cb = np.r_[0, np.cumsum(n_t)[:-1]]  # ranks before this value
        # doubled average rank of a tied block = 2*cb + n_t + 1 (int)
        r1x2 = int(np.sum(n_p * (2 * cb + n_t + 1)))
        n1 = int(n_p.sum())
        n2 = int(n_t.sum()) - n1
        u1x2 = r1x2 - n1 * (n1 + 1)
        u = float(u1x2) / 2.0
        if n1 and n2:
            z = (u - float(n1 * n2) / 2.0) / math.sqrt(
                float(n1) * float(n2) * float(n1 + n2 + 1) / 12.0
            )
        else:  # empty group: DuckDB x / 0.0 is NULL
            z = None
        return ray.data.from_arrow(
            pa.table(
                {
                    "n1": pa.array([n1], pa.int64()),
                    "n2": pa.array([n2], pa.int64()),
                    "u1x2": pa.array([u1x2], pa.int64()),
                    "u": pa.array([u], pa.float64()),
                    "z": pa.array([z], pa.float64()),
                }
            )
        )

    def q_user_first_last(sf):
        # FIRST_VALUE/LAST_VALUE window shape: each user's first and
        # last event (type + ts) and count — types shuffle as int codes,
        # one user-bucket shuffle (pipelines/movement.py)
        import ray
        from python_prtree_ray.pipelines.movement import user_first_last

        ev = ray.data.read_parquet(
            f"{sf}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return user_first_last(ev)

    def q_acctbal_deciles(sf):
        # NTILE(10) per nation over (acctbal, custkey) — deterministic
        # tie-break; per-nation vectorized tiling inside map_groups,
        # exact-int cents sums per decile
        import pyarrow as pa
        import ray

        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet",
            columns=["c_nationkey", "c_custkey", "c_acctbal"],
        )

        def tile(group: pa.Table) -> pa.Table:
            bal = group.column("c_acctbal").to_numpy(zero_copy_only=False)
            ck = group.column("c_custkey").to_numpy(zero_copy_only=False)
            nk = group.column("c_nationkey").to_numpy(zero_copy_only=False)
            if bal.size == 0:
                return pa.table(
                    {
                        "n_nationkey": pa.array([], pa.int64()),
                        "decile": pa.array([], pa.int64()),
                        "n_customers": pa.array([], pa.int64()),
                        "acctbal_c": pa.array([], pa.int64()),
                    }
                )
            order = np.lexsort((ck, bal))
            n = bal.size
            k = 10
            # NTILE sizing: first n%k tiles get ceil(n/k) rows
            base, extra = divmod(n, k)
            sizes = np.full(min(k, n), base, np.int64)
            sizes[:extra] += 1
            sizes = sizes[sizes > 0]
            cents = np.floor(bal[order] * 100.0).astype(np.int64)
            starts = np.r_[0, np.cumsum(sizes)[:-1]]
            return pa.table(
                {
                    "n_nationkey": pa.array(
                        np.full(sizes.size, int(nk[0]), np.int64)
                    ),
                    "decile": np.arange(1, sizes.size + 1, dtype=np.int64),
                    "n_customers": sizes,
                    "acctbal_c": np.add.reduceat(cents, starts),
                }
            )

        return cust.groupby("c_nationkey").map_groups(
            tile, batch_format="pyarrow"
        )

    def q_boxes_union_area(sf):
        # exact rectangle-union measure (Klee) of the orders box set:
        # integer-grid quantization makes every partial an exact int64.
        # Two-level cover (pipelines/measure.py): fully-covered tiles
        # short-circuit through a difference-array fold, only boundary
        # pieces in uncovered tiles reach the sweep — O(n·span) vs the
        # strip expansion's O(n²·box_width) (19 s → ~2 s at sf0.1;
        # method-equality pytest vs the slab sweep and brute force)
        from python_prtree_ray.pipelines.measure import boxes_union_area

        return boxes_union_area(tables.boxes_dataset(sf), method="tiles")

    def q_closest_pair(sf):
        # GLOBAL minimum-separation pair (min companion of
        # points_diameter's max): rides nn_pairs — the closest pair is
        # mutually nearest, so no all-pairs sweep; 1-row partials per
        # batch, exact double comparison (pipelines/knn.py)
        from python_prtree_ray.pipelines.knn import closest_pair

        return closest_pair(tables.points_dataset(sf))

    return {
        "spatial_join": q_spatial_join,
        "box_count": q_box_count,
        "tree_stats": q_tree_stats,
        "spatial_join_shuffle": q_spatial_join_shuffle,
        "knn_ring": q_knn_ring,
        "self_join": q_self_join,
        "iou_join": q_iou_join,
        "point_query": q_point_query,
        "knn": q_knn,
        "knn_3d": q_knn_3d,
        "knn_4d": q_knn_4d,
        "radius_join": q_radius_join,
        "point_clusters": q_point_clusters,
        "dbscan": q_dbscan,
        "pip": q_pip,
        "pip_nonconvex": q_pip_nonconvex,
        "zonal_stats": q_zonal_stats,
        "tile_points": q_tile_points,
        "tile_cover": q_tile_cover,
        "tile_extent": q_tile_extent,
        "tile_topk": q_tile_topk,
        "tile_quadkey": q_tile_quadkey,
        "tile_hilbert": q_tile_hilbert,
        "hilbert_ranges": q_hilbert_ranges,
        "tile_quantiles": q_tile_quantiles,
        "idw_grid": q_idw_grid,
        "kde_grid": q_kde_grid,
        "empty_space_f": q_empty_space_f,
        "largest_empty_circle": q_largest_empty_circle,
        "hex_bin": q_hex_bin,
        "haversine_join": q_haversine_join,
        "knn_geo": q_knn_geo,
        "lifecycle_query": q_lifecycle,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "pii_scrub": q_pii_scrub,
        "doc_lm_freq": q_doc_lm_freq,
        "doc_compress": q_doc_compress,
        "doc_chunks": q_doc_chunks,
        "quality_score": q_quality,
        "lang_id": q_lang_id,
        "events_window": q_events_window,
        "ann_topk": q_ann_topk,
        "emb_covariance": q_emb_covariance,
        "ann_range": q_ann_range,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "token_pieces": q_token_pieces,
        "minhash_pairs": q_minhash_pairs,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_exact": q_embedding_neardup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "events_hopping": q_events_hopping,
        "events_session": q_events_session,
        "events_sessionized": q_events_sessionized,
        "user_features": q_user_features,
        "top_events": q_top_events,
        "distinct_users": q_distinct_users,
        "distinct_users_hll": q_distinct_users_hll,
        "value_quantiles": q_value_quantiles,
        "spatial_join_obj": q_spatial_join_obj,
        "batch_query_lists": q_batch_query_lists,
        "spatial_join_3d": q_spatial_join_3d,
        "spatial_join_4d": q_spatial_join_4d,
        "media_features": q_media_features,
        "video_frames": q_video_frames,
        "span_sequence": q_span_sequence,
        "doc_fingerprint": q_doc_fingerprint,
        "pack_documents": q_pack_documents,
        "doc_sample": q_doc_sample,
        "doc_sample_stratified": q_doc_sample_stratified,
        "events_enriched": q_events_enriched,
        "props_extract": q_props_extract,
        "cell_histogram": q_cell_histogram,
        "asof_purchase_view": q_asof_purchase_view,
        "events_band_join": q_events_band_join,
        "session_join": q_session_join,
        "ann_classify": q_ann_classify,
        "doc_sample_weighted": q_doc_sample_weighted,
        "region_rollup": q_region_rollup,
        "funnel_counts": q_funnel_counts,
        "pricing_summary": q_pricing_summary,
        "spatial_semi": q_spatial_semi,
        "spatial_anti": q_spatial_anti,
        "source_dedup_stats": q_source_dedup_stats,
        "raster_tiles": q_raster_tiles,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "checkpoint_resume": q_checkpoint_resume,
        "save_load": q_save_load,
        "interval_join": q_interval_join,
        "doc_cap_per_lang": q_doc_cap_per_lang,
        "dup_clusters": q_dup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "lineitem_orders": q_lineitem_orders,
        "orders_cust_left": q_orders_cust_left,
        "orders_cust_outer": q_orders_cust_outer,
        "orders_with_returns": q_orders_with_returns,
        "orders_semi_bloom": q_orders_semi_bloom,
        "orders_no_returns": q_orders_no_returns,
        "q3_revenue": q_q3_revenue,
        "local_supplier_volume": q_local_supplier_volume,
        "co_purchase_parts": q_co_purchase_parts,
        "lang_confusion": q_lang_confusion,
        "doc_len_rank": q_doc_len_rank,
        "session_duration_quantiles": q_session_duration_quantiles,
        "value_drift": q_value_drift,
        "lapsed_customers": q_lapsed_customers,
        "weekly_anomaly": q_weekly_anomaly,
        "returns_revenue_share": q_returns_revenue_share,
        "above_avg_orders": q_above_avg_orders,
        "value_percentile": q_value_percentile,
        "weekday_skew_users": q_weekday_skew_users,
        "vocab_hapax": q_vocab_hapax,
        "emb_norm_outliers": q_emb_norm_outliers,
        "activity_heatmap": q_activity_heatmap,
        "incremental_agg": q_incremental_agg,
        "emb_dim_quantiles": q_emb_dim_quantiles,
        "label_cohesion": q_label_cohesion,
        "label_separation": q_label_separation,
        "emb_top_eigen": q_emb_top_eigen,
        "emb_top2_eigen": q_emb_top2_eigen,
        "supplier_reach_hist": q_supplier_reach_hist,
        "value_ks": q_value_ks,
        "convert_delay_quantiles": q_convert_delay_quantiles,
        "activity_autocorr": q_activity_autocorr,
        "rolling_wau": q_rolling_wau,
        "nation_share": q_nation_share,
        "daily_new_returning": q_daily_new_returning,
        "event_age_hist": q_event_age_hist,
        "active_span_quantiles": q_active_span_quantiles,
        "pareto_users": q_pareto_users,
        "region_count_curve": q_region_count_curve,
        "activity_decile_purchase": q_activity_decile_purchase,
        "recency_hist": q_recency_hist,
        "type_centroids": q_type_centroids,
        "tile_net_flow": q_tile_net_flow,
        "class_adjacency": q_class_adjacency,
        "robust_outliers": q_robust_outliers,
        "value_mad": q_value_mad,
        "cust_order_histogram": q_cust_order_histogram,
        "lexical_diversity": q_lexical_diversity,
        "typo_pairs": q_typo_pairs,
        "interarrival_hist": q_interarrival_hist,
        "part_best_supplier": q_part_best_supplier,
        "ship_delay_quantiles": q_ship_delay_quantiles,
        "label_centroids": q_label_centroids,
        "top_revenue": q_top_revenue,
        "corpus_curation": q_corpus_curation,
        "events_user_topk": q_events_user_topk,
        "vocab_topk": q_vocab_topk,
        "heavy_hitters": q_heavy_hitters,
        "bigram_lift": q_bigram_lift,
        "char_trigrams": q_char_trigrams,
        "tile_pyramid": q_tile_pyramid,
        "events_dedup": q_events_dedup,
        "quality_adaptive": q_quality_adaptive,
        "doc_tfidf_top": q_doc_tfidf_top,
        "events_rolling": q_events_rolling,
        "events_enriched_left": q_events_enriched_left,
        "events_unmatched": q_events_unmatched,
        "text_normalize": q_text_normalize,
        "doc_repetition": q_doc_repetition,
        "source_jaccard": q_source_jaccard,
        "decontaminate": q_decontaminate,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "search_topk": q_search_topk,
        "search_bm25": q_search_bm25,
        "hotspot_cells": q_hotspot_cells,
        "tile_neighbors": q_tile_neighbors,
        "trajectory_length": q_trajectory_length,
        "trajectory_simplify": q_trajectory_simplify,
        "trajectory_hull": q_trajectory_hull,
        "geofence_events": q_geofence_events,
        "segment_crossings": q_segment_crossings,
        "kmeans": q_kmeans,
        "od_matrix": q_od_matrix,
        "tile_motifs": q_tile_motifs,
        "top_routes": q_top_routes,
        "covisit_tile_pairs": q_covisit_tile_pairs,
        "co_travelers": q_co_travelers,
        "travel_groups": q_travel_groups,
        "mutual_nn": q_mutual_nn,
        "tile_top_visitor": q_tile_top_visitor,
        "hilbert_locality": q_hilbert_locality,
        "hotspot_coverage": q_hotspot_coverage,
        "value_hotspots": q_value_hotspots,
        "points_diameter": q_points_diameter,
        "adaptive_quadtree": q_adaptive_quadtree,
        "tile_occupancy_curve": q_tile_occupancy_curve,
        "discount_revenue": q_discount_revenue,
        "benford_hist": q_benford_hist,
        "user_max_drawdown": q_user_max_drawdown,
        "gram_novelty": q_gram_novelty,
        "knn_hubness": q_knn_hubness,
        "covisit_triangles": q_covisit_triangles,
        "nation_trade_pairs": q_nation_trade_pairs,
        "segment_order_dist": q_segment_order_dist,
        "small_qty_revenue": q_small_qty_revenue,
        "large_orders": q_large_orders,
        "promo_revenue": q_promo_revenue,
        "user_top2_cells": q_user_top2_cells,
        "trend_movers": q_trend_movers,
        "type_run_hist": q_type_run_hist,
        "cents_mod_hist": q_cents_mod_hist,
        "region_monthly_revenue": q_region_monthly_revenue,
        "nation_balance": q_nation_balance,
        "tile_boundary": q_tile_boundary,
        "seed_catchment": q_seed_catchment,
        "max_dwell_run": q_max_dwell_run,
        "od_asymmetry": q_od_asymmetry,
        "record_events": q_record_events,
        "late_events": q_late_events,
        "user_journeys": q_user_journeys,
        "order_running_totals": q_order_running_totals,
        "attribution_last_touch": q_attribution_last_touch,
        "session_type_pairs": q_session_type_pairs,
        "value_peaks": q_value_peaks,
        "user_gini": q_user_gini,
        "cohort_retention": q_cohort_retention,
        "colocation_pairs": q_colocation,
        "stay_points": q_stay_points,
        "resample_track": q_resample_track,
        "cell_dwell": q_cell_dwell,
        "event_transitions": q_event_transitions,
        "morans_i": q_morans_i,
        "gearys_c": q_gearys_c,
        "local_morans": q_local_morans,
        "ripley_k": q_ripley_k,
        "ripley_curve": q_ripley_curve,
        "getis_ord": q_getis_ord,
        "quadrat_test": q_quadrat_test,
        "raster_regions": q_raster_regions,
        "tile_geohash": q_tile_geohash,
        "tile_users": q_tile_users,
        "skyline": q_skyline,
        "tile_buffer": q_tile_buffer,
        "tile_gini": q_tile_gini,
        "std_ellipse": q_std_ellipse,
        "contour_cases": q_contour_cases,
        "tile_majority": q_tile_majority,
        "tile_simpson": q_tile_simpson,
        "voronoi_assign": q_voronoi_assign,
        "voronoi_cost": q_voronoi_cost,
        "tile_rank_corr": q_tile_rank_corr,
        "gravity_access": q_gravity_access,
        "tile_density_rank": q_tile_density_rank,
        "tile_turnover": q_tile_turnover,
        "tile_peak_hour": q_tile_peak_hour,
        "brand_revenue": q_brand_revenue,
        "reorder_gap_quantiles": q_reorder_gap_quantiles,
        "order_size_corr": q_order_size_corr,
        "cluster_size_hist": q_cluster_size_hist,
        "type_dow_chi2": q_type_dow_chi2,
        "monthly_revenue": q_monthly_revenue,
        "weekly_active": q_weekly_active,
        "grid_bfs": q_grid_bfs,
        "type_colocation": q_type_colocation,
        "tile_focal_mean": q_tile_focal_mean,
        "lorenz_curve": q_lorenz_curve,
        "flow_direction": q_flow_direction,
        "flow_accumulation": q_flow_accumulation,
        "bivariate_moran": q_bivariate_moran,
        "watershed_sizes": q_watershed_sizes,
        "cross_k": q_cross_k,
        "semivariogram": q_semivariogram,
        "join_counts": q_join_counts,
        "clark_evans": q_clark_evans,
        "nn_histogram": q_nn_histogram,
        "knn_regress": q_knn_regress,
        "doc_modality": q_doc_modality,
        "span_transitions": q_span_transitions,
        "span_windows": q_span_windows,
        "span_tiles": q_span_tiles,
        "span_box_join": q_span_box_join,
        "cell_trend": q_cell_trend,
        "cell_slope": q_cell_slope,
        "home_cells": q_home_cells,
        "radius_gyration": q_rog,
        "track_diameter": q_track_diameter,
        "segment_tiles": q_segment_tiles,
        "turn_histogram": q_turn_histogram,
        "jump_histogram": q_jump_hist,
        "snap_points": q_snap_points,
        "knox_stat": q_knox,
        "track_hausdorff": q_track_hausdorff,
        "track_dtw": q_track_dtw,
        "heading_histogram": q_heading_histogram,
        "cell_hours": q_cell_hours,
        "interval_union": q_interval_union,
        "ann_pq": q_ann_pq,
        "speed_outliers": q_speed_outliers,
        "nn_pairs": q_nn_pairs,
        "grouped_moments": q_grouped_moments,
        "value_histogram": q_value_histogram,
        "part_supplier_counts": q_part_supplier_counts,
        "bracket_revenue": q_bracket_revenue,
        "returned_cust_revenue": q_returned_cust_revenue,
        "top_supplier_qtr": q_top_supplier_qtr,
        "nation_profit": q_nation_profit,
        "priority_fill_rate": q_priority_fill_rate,
        "sales_opportunity": q_sales_opportunity,
        "user_burstiness": q_user_burstiness,
        "daily_cusum": q_daily_cusum,
        "market_share": q_market_share,
        "excess_parts": q_excess_parts,
        "waiting_suppliers": q_waiting_suppliers,
        "closest_pair": q_closest_pair,
        "boxes_union_area": q_boxes_union_area,
        "user_first_last": q_user_first_last,
        "acctbal_deciles": q_acctbal_deciles,
        "tile_pagerank": q_tile_pagerank,
        "tile_kcore": q_tile_kcore,
        "tile_distance": q_tile_distance,
        "value_mwu": q_value_mwu,
        "value_welch_t": q_value_welch_t,
        "cube_revenue": q_cube_revenue,
        "events_pivot": q_events_pivot,
        "source_lang_entropy": q_source_lang_entropy,
        "custkey_setops": q_custkey_setops,
    }


# ------------------------------------------------------------- oracle SQL


def oracle_sql() -> dict[str, str]:
    from python_prtree_ray.pipelines.knn import (
        closest_pair_sql as _closest_pair_sql,
    )
    from python_prtree_ray.pipelines.measure import (
        boxes_union_area_sql as _boxes_union_area_sql,
    )
    from python_prtree_ray.pipelines.movement import (
        user_first_last_sql as _user_first_last_sql,
    )
    from python_prtree_ray.pipelines.movement import (
        cell_hours_sql as _cell_hours_sql,
        cell_slope_sql as _cell_slope_sql,
        home_cells_sql as _home_cells_sql,
        jump_histogram_sql as _jump_histogram_sql,
        radius_of_gyration_sql as _radius_of_gyration_sql,
        cell_trend_sql as _cell_trend_sql,
        heading_histogram_sql as _heading_histogram_sql,
        snap_to_segments_sql as _snap_to_segments_sql,
        segment_tiles_sql as _segment_tiles_sql,
        turn_histogram_sql as _turn_histogram_sql,
        tile_motifs_sql as _tile_motifs_sql,
        speed_outliers_sql as _speed_outliers_sql,
        interarrival_hist_sql as _interarrival_hist_sql,
        max_dwell_run_sql as _max_dwell_run_sql,
        od_asymmetry_sql as _od_asymmetry_sql,
    )
    from python_prtree_ray.pipelines.text import (
        lexical_diversity_sql as _lexical_diversity_sql,
        typo_pairs_sql as _typo_pairs_sql,
    )
    from python_prtree_ray.pipelines.windows import (
        record_events_sql as _record_events_sql,
        late_events_sql as _late_events_sql,
        user_journeys_sql as _user_journeys_sql,
        order_running_totals_sql as _order_running_totals_sql,
        cohort_retention_sql as _cohort_retention_sql,
        session_type_pairs_sql as _session_type_pairs_sql,
        value_peaks_sql as _value_peaks_sql,
        rolling_wau_sql as _rolling_wau_sql,
    )
    from python_prtree_ray.pipelines.trajectory import (
        trajectory_hausdorff_sql as _trajectory_hausdorff_sql,
        track_diameter_sql as _track_diameter_sql,
        points_diameter_sql as _points_diameter_sql,
    )
    from python_prtree_ray.pipelines.curation import (
        SOURCE_JACCARD_SQL as _SOURCE_JACCARD_SQL,
        dup_ngram_coverage_sql as _dup_ngram_coverage_sql,
        gram_novelty_sql as _gram_novelty_sql,
    )
    from python_prtree_ray.pipelines.ann import (
        emb_covariance_sql as _emb_covariance_sql,
        emb_dim_quantiles_sql as _emb_dim_quantiles_sql,
        emb_norm_outliers_sql as _emb_norm_outliers_sql,
        label_cohesion_sql as _label_cohesion_sql,
        label_separation_sql as _label_separation_sql,
    )
    from python_prtree_ray.pipelines.text import (
        bigram_lift_sql as _bigram_lift_sql,
        char_trigrams_sql as _char_trigrams_sql,
        heavy_hitters_sql as _heavy_hitters_sql,
    )
    from python_prtree_ray.pipelines.interval import (
        interval_union_len_sql as _interval_union_len_sql,
    )
    from python_prtree_ray.pipelines.tiling import (
        gearys_c_sql as _gearys_c_sql,
        getis_ord_sql as _getis_ord_sql,
        local_morans_sql as _local_morans_sql,
        morans_i_sql as _morans_i_sql,
        hilbert_ranges_sql as _hilbert_ranges_sql,
        knox_stat_sql as _knox_stat_sql,
        quadrat_test_sql as _quadrat_test_sql,
        raster_regions_sql as _raster_regions_sql,
        tile_geohash_sql as _tile_geohash_sql,
        tile_distinct_users_sql as _tile_distinct_users_sql,
        tile_buffer_sql as _tile_buffer_sql,
        tile_gini_sql as _tile_gini_sql,
        std_ellipse_sql as _std_ellipse_sql,
        contour_cases_sql as _contour_cases_sql,
        tile_majority_sql as _tile_majority_sql,
        tile_simpson_sql as _tile_simpson_sql,
        voronoi_assign_sql as _voronoi_assign_sql,
        grid_bfs_sql as _grid_bfs_sql,
        tile_rank_corr_sql as _tile_rank_corr_sql,
        gravity_access_sql as _gravity_access_sql,
        tile_turnover_sql as _tile_turnover_sql,
        region_count_curve_sql as _region_count_curve_sql,
        hilbert_locality_sql as _hilbert_locality_sql,
        adaptive_quadtree_sql as _adaptive_quadtree_sql,
        type_colocation_sql as _type_colocation_sql,
        tile_focal_mean_sql as _tile_focal_mean_sql,
        lorenz_curve_sql as _lorenz_curve_sql,
        flow_direction_sql as _flow_direction_sql,
        flow_accumulation_sql as _flow_accumulation_sql,
        watershed_sizes_sql as _watershed_sizes_sql,
        bivariate_moran_sql as _bivariate_moran_sql,
    )
    from python_prtree_ray.pipelines.pip import (
        pip_nonconvex_sql as _pip_nonconvex_sql,
    )
    from python_prtree_ray.pipelines.tiling import (
        cross_k_sql as _cross_k_sql,
        semivariogram_sql as _semivariogram_sql,
        join_counts_sql as _join_counts_sql,
        ripley_k_sql as _ripley_k_sql,
        ripley_curve_sql as _ripley_curve_sql,
        tile_hilbert_sql as _tile_hilbert_sql,
    )
    from python_prtree_ray.pipelines.knn import (
        clark_evans_sql as _clark_evans_sql,
        nn_histogram_sql as _nn_histogram_sql,
    )
    from python_prtree_ray.pipelines.agg import (
        skyline_sql as _skyline_sql,
    )

    b_orders = derive.boxes_sql("orders", "o_orderkey", "idx")
    b_part = derive.boxes_sql("part", "p_partkey", "idx")
    q_cust = derive.query_boxes_sql("customer", "c_custkey", "query_id")
    p_cust = derive.points_sql("customer", "c_custkey", "query_id")
    p_supp = derive.points_sql("supplier", "s_suppkey", "query_id")
    g = 1 << TILE_RES

    intersects = (
        "q.xmin <= b.xmax AND b.xmin <= q.xmax AND "
        "q.ymin <= b.ymax AND b.ymin <= q.ymax"
    )

    from python_prtree_ray.pipelines.spatial_join import (
        iou_join_sql as _iou_join_sql,
    )

    _iou_join_sql_entry = _iou_join_sql(
        derive.boxes_sql("part", "p_partkey", "idx"), 0.05
    )

    spatial_join_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, b.idx AS idx FROM q, b WHERE {intersects}
"""

    box_count_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM q, b WHERE {intersects} GROUP BY 1
"""

    self_join_sql = f"""
WITH b0 AS ({b_part})
SELECT a.idx AS idx_a, b.idx AS idx_b
FROM b0 a, b0 b
WHERE a.idx < b.idx
  AND a.xmin <= b.xmax AND b.xmin <= a.xmax
  AND a.ymin <= b.ymax AND b.ymin <= a.ymax
"""

    point_query_sql = f"""
WITH b AS ({b_orders}), p AS ({p_cust})
SELECT p.query_id AS query_id, b.idx AS idx
FROM p, b
WHERE p.px <= b.xmax AND b.xmin <= p.px AND p.py <= b.ymax AND b.ymin <= p.py
"""

    knn_sql = f"""
WITH b AS ({b_orders}), p AS ({p_supp}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank" FROM r WHERE rn <= {KNN_K}
"""

    knn_3d_sql = f"""
WITH b AS ({derive.boxes_3d_sql("orders", "o_orderkey", "idx")}),
     p AS ({derive.points_3d_sql("supplier", "s_suppkey", "query_id")}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy,
             (zmin + zmax) * 0.5 AS cz FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy)
               + (p.pz - c.cz) * (p.pz - c.cz) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank" FROM r WHERE rn <= {KNN_K}
"""

    knn_4d_sql = f"""
WITH b AS ({derive.boxes_4d_sql("orders", "o_orderkey", "idx")}),
     p AS ({derive.points_4d_sql("supplier", "s_suppkey", "query_id")}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy,
             (zmin + zmax) * 0.5 AS cz, (tmin + tmax) * 0.5 AS ct FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy)
               + (p.pz - c.cz) * (p.pz - c.cz)
               + (p.pt - c.ct) * (p.pt - c.ct) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank" FROM r WHERE rn <= {KNN_K}
"""

    radius_join_sql = f"""
WITH b AS ({b_orders}), p AS ({p_supp}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy FROM b)
SELECT p.query_id AS query_id, c.idx AS idx,
       (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy) AS dist2
FROM p, c
WHERE (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy)
      <= {RADIUS} * {RADIUS}
"""

    dist2 = (
        "(a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)"
    )
    point_clusters_sql = f"""
WITH RECURSIVE p AS ({p_cust}),
pr AS (SELECT a.query_id AS doc_a, b.query_id AS doc_b
       FROM p a, p b
       WHERE a.query_id < b.query_id AND {dist2} <= {RADIUS} * {RADIUS}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pr
        UNION SELECT doc_b, doc_a FROM pr),
nodes AS (SELECT DISTINCT a AS d FROM sym),
reach(d, n) AS (
  SELECT d, d FROM nodes
  UNION
  SELECT r.d, s.b FROM reach r JOIN sym s ON s.a = r.n
)
SELECT d AS doc_id, MIN(n) AS cluster_id FROM reach GROUP BY d
"""

    dbscan_sql = f"""
WITH RECURSIVE p AS ({p_cust}),
pr AS (SELECT a.query_id AS a, b.query_id AS b
       FROM p a, p b
       WHERE a.query_id <> b.query_id AND {dist2} <= {DBSCAN_EPS} * {DBSCAN_EPS}),
deg AS (SELECT a AS d, COUNT(*) AS n FROM pr GROUP BY a),
core AS (SELECT d FROM deg WHERE n + 1 >= {DBSCAN_MINPTS}),
ce AS (SELECT pr.a AS a, pr.b AS b FROM pr
       WHERE pr.a IN (SELECT d FROM core) AND pr.b IN (SELECT d FROM core)),
reach(d, n) AS (
  SELECT d, d FROM core
  UNION
  SELECT r.d, ce.b FROM reach r JOIN ce ON ce.a = r.n
),
clab AS (SELECT d, MIN(n) AS cid FROM reach GROUP BY d),
border AS (SELECT pr.a AS d, MIN(clab.cid) AS cid
           FROM pr JOIN clab ON pr.b = clab.d
           WHERE pr.a NOT IN (SELECT d FROM core)
           GROUP BY pr.a),
noise AS (SELECT DISTINCT a AS d FROM pr
          WHERE a NOT IN (SELECT d FROM core)
            AND a NOT IN (SELECT d FROM border))
SELECT d AS doc_id, cid AS cluster_id, 'core' AS role FROM clab
UNION ALL SELECT d, cid, 'border' FROM border
UNION ALL SELECT d, -1, 'noise' FROM noise
"""

    pip_sql = f"""
WITH p AS ({p_cust}), e AS (SELECT * FROM {derive.polygon_edges_sql()})
SELECT p.query_id AS query_id, e.poly_id AS poly_id
FROM p, e
GROUP BY p.query_id, e.poly_id
HAVING bool_and((e.x2 - e.x1) * (p.py - e.y1) - (e.y2 - e.y1) * (p.px - e.x1) >= 0.0)
"""

    zonal_stats_sql = f"""
WITH p AS ({p_cust}), e AS (SELECT * FROM {derive.polygon_edges_sql()}),
hits AS (
  SELECT p.query_id AS query_id, e.poly_id AS poly_id,
         MIN(p.px) AS px, MIN(p.py) AS py
  FROM p, e
  GROUP BY p.query_id, e.poly_id
  HAVING bool_and((e.x2 - e.x1) * (p.py - e.y1) - (e.y2 - e.y1) * (p.px - e.x1) >= 0.0)
)
SELECT poly_id, COUNT(*) AS n_points,
       CAST(SUM(query_id) AS BIGINT) AS sum_qid,
       MIN(px) AS min_px, MIN(py) AS min_py,
       MAX(px) AS max_px, MAX(py) AS max_py
FROM hits GROUP BY poly_id
"""

    tile_points_sql = f"""
WITH p AS ({p_cust})
SELECT query_id, {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell FROM p
"""

    g_qk = 1 << TILE_RES
    qk_digits = " + ".join(
        f"((ix // {1 << b}) % 2 + 2 * ((iy // {1 << b}) % 2)) * {10 ** b}"
        for b in range(TILE_RES - 1, -1, -1)
    )
    tile_quadkey_sql = f"""
WITH p AS ({p_cust}),
     i AS (SELECT query_id,
                  {derive.tile_index_sql('px', TILE_RES)} AS ix,
                  {derive.tile_index_sql('py', TILE_RES)} AS iy
           FROM p)
SELECT query_id, ix * {g_qk} + iy AS cell,
       lpad(CAST(({qk_digits}) AS VARCHAR), {TILE_RES}, '0') AS quadkey
FROM i
"""

    tile_topk_sql = f"""
WITH p AS ({p_cust}),
     s AS (SELECT query_id,
                  {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell,
                  {derive.point_score_sql('query_id')} AS score
           FROM p),
     r AS (SELECT cell, query_id, score,
                  ROW_NUMBER() OVER (
                      PARTITION BY cell ORDER BY score DESC, query_id
                  ) AS rn
           FROM s)
SELECT cell, query_id, score, rn AS "rank" FROM r WHERE rn <= 3
"""

    tile_quantiles_sql = f"""
WITH p AS ({p_cust}),
     s AS (SELECT {derive.tile_cell_sql('px', 'py', TILE_QRES)} AS cell,
                  {derive.point_measure_sql('query_id')} AS v
           FROM p)
SELECT cell,
       quantile_cont(v, 0.5) AS p50,
       quantile_cont(v, 0.9) AS p90,
       quantile_cont(v, 0.99) AS p99
FROM s GROUP BY cell
"""

    from python_prtree_ray.pipelines.geodesic import (
        haversine_join_sql,
        knn_geo_sql,
    )
    from python_prtree_ray.pipelines.interpolate import (
        empty_space_f_sql,
        idw_grid_sql,
        kde_grid_sql,
        largest_empty_circle_sql,
    )

    idw_grid_sql_q = idw_grid_sql(p_cust)
    kde_grid_sql_q = kde_grid_sql(p_cust)
    empty_space_f_sql_q = empty_space_f_sql(p_cust)
    largest_empty_circle_sql_q = largest_empty_circle_sql(p_cust)

    from python_prtree_ray.functions.cells import hex_cell_sql

    hex_bin_sql_q = (
        f"WITH p AS ({p_cust}), "
        f"h AS (SELECT {hex_cell_sql('px', 'py')} FROM p) "
        "SELECT hq, hr, CAST(COUNT(*) AS BIGINT) AS n_points "
        "FROM h GROUP BY 1, 2"
    )
    haversine_join_sql_q = haversine_join_sql(p_cust, p_supp)
    knn_geo_sql_q = knn_geo_sql(p_cust, p_supp, 5)

    tile_pyramid_sql = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS res,"
        f" {derive.tile_cell_sql('px', 'py', r)} AS cell,"
        f" CAST(COUNT(*) AS BIGINT) AS n_points"
        f" FROM ({p_cust}) GROUP BY cell"
        for r in range(TILE_RES, -1, -1)
    )

    ix = f"LEAST(GREATEST(CAST(FLOOR(xmin * {g}) AS BIGINT), 0), {g - 1})"
    ix1 = f"LEAST(GREATEST(CAST(FLOOR(xmax * {g}) AS BIGINT), 0), {g - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR(ymin * {g}) AS BIGINT), 0), {g - 1})"
    iy1 = f"LEAST(GREATEST(CAST(FLOOR(ymax * {g}) AS BIGINT), 0), {g - 1})"
    tile_cover_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, {ix} AS ix0, {ix1} AS ix1, {iy} AS iy0, {iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g}))
SELECT r.idx AS idx, sx.i * {g} + sy.i AS cell
FROM r, s sx, s sy
WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
"""

    tile_extent_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, xmin, ymin, xmax, ymax,
             {ix} AS ix0, {ix1} AS ix1, {iy} AS iy0, {iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g})),
cov AS (
  SELECT r.xmin, r.ymin, r.xmax, r.ymax, sx.i * {g} + sy.i AS cell
  FROM r, s sx, s sy
  WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
)
SELECT cell, COUNT(*) AS n_boxes,
       MIN(xmin) AS env_xmin, MIN(ymin) AS env_ymin,
       MAX(xmax) AS env_xmax, MAX(ymax) AS env_ymax
FROM cov GROUP BY cell
"""

    lifecycle_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, b.idx AS idx
FROM q, b
WHERE b.idx % 10 <> 0 AND {intersects}
"""

    dedup_exact_sql = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"

    token_stats_sql = r"""
SELECT doc_id,
       CAST(array_length(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""

    from python_prtree_ray.pipelines.text import EMAIL_RE, URL_RE

    pii_scrub_sql = f"""
WITH e AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example or https://docs.example/'
                   || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
u AS (
  SELECT doc_id,
         CAST(array_length(regexp_extract_all(text, '{URL_RE}')) AS BIGINT) AS n_urls,
         regexp_replace(text, '{URL_RE}', '<URL>', 'g') AS t1
  FROM e
)
SELECT doc_id,
       CAST(array_length(regexp_extract_all(t1, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       n_urls,
       CAST(length(regexp_replace(t1, '{EMAIL_RE}', '<EMAIL>', 'g')) AS BIGINT) AS clean_chars
FROM u
"""

    doc_lm_freq_sql = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok)
SELECT t.doc_id AS doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(f.f) AS BIGINT) AS sum_freq,
       CAST(SUM(f.f) AS DOUBLE) / COUNT(*) AS mean_freq
FROM toks t JOIN freq f ON t.tok = f.tok
GROUP BY t.doc_id
"""

    doc_chunks_sql = r"""
WITH t AS (
  SELECT doc_id,
         CAST(array_length(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(0, (n_tokens - 1) // 96)) AS chunk_id
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, chunk_id, chunk_id * 96 AS start_tok,
       LEAST(128, n_tokens - chunk_id * 96) AS n_tok
FROM c
"""

    from python_prtree_ray.pipelines.text import _EN_STOPWORDS, _LANG_MARKERS

    stop_re = r"\b(" + "|".join(sorted(_EN_STOPWORDS)) + r")\b"
    quality_sql = f"""
WITH t AS (
  SELECT doc_id,
         CAST(array_length(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         CAST(array_length(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
         CAST(array_length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
         CAST(array_length(regexp_extract_all(text, '{stop_re}')) AS BIGINT) AS n_stop,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_alpha, n_punct,
       (n_stop * 100) // GREATEST(n_tokens, 1) AS stop_ratio_pct,
       (n_alpha * 100) // GREATEST(n_chars, 1) AS quality_pct
FROM t
"""

    marker_scores = ",\n         ".join(
        f"CAST(array_length(regexp_extract_all(text, '\\b({'|'.join(words)})\\b')) AS BIGINT) AS s_{lang}"
        for lang, words in _LANG_MARKERS.items()
    )
    lang_id_sql = f"""
WITH t AS (
  SELECT doc_id,
         {marker_scores}
  FROM documents
)
SELECT doc_id,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM t
"""

    from python_prtree_ray.pipelines.text import NUM_RE, PIECE_RE, WORD_RE

    corpus_curation_sql = f"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         CAST(array_length(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         (CAST(array_length(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) * 100)
           // GREATEST(CAST(length(text) AS BIGINT), 1) AS quality_pct,
         {marker_scores}
  FROM documents
),
q AS (
  SELECT doc_id, norm, n_tokens,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM t WHERE quality_pct >= 82
),
w AS (SELECT norm, MIN(doc_id) AS doc_id FROM q GROUP BY norm)
SELECT q.doc_id, q.lang_pred, q.n_tokens
FROM q JOIN w ON q.doc_id = w.doc_id
"""

    token_pieces_sql = f"""
SELECT doc_id,
       CAST(array_length(regexp_extract_all(text, '{PIECE_RE}')) AS BIGINT) AS n_pieces,
       CAST(array_length(regexp_extract_all(text, '{WORD_RE}')) AS BIGINT) AS n_word_pieces,
       CAST(array_length(regexp_extract_all(text, '{NUM_RE}')) AS BIGINT) AS n_num_pieces
FROM documents
"""

    events_window_sql = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""

    ann_topk_sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10),
d AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.embedding, e.embedding) AS sim
      FROM q, embeddings e),
r AS (SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM d)
SELECT query_id, vec_id, rn AS "rank" FROM r WHERE rn <= {ANN_K}
"""

    embedding_neardup_exact_sql = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""

    ngram_jaccard_sql = r"""
WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      FROM tok),
sh AS (SELECT DISTINCT doc_id, g FROM g),
j AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
SELECT j.a AS doc_a, j.b AS doc_b,
       j.inter * 1.0 / (sa.n + sb.n - j.inter) AS jaccard
FROM j JOIN sz sa ON sa.doc_id = j.a JOIN sz sb ON sb.doc_id = j.b
WHERE j.inter * 1.0 / (sa.n + sb.n - j.inter) >= 0.8
"""

    # transitive closure via recursive CTE — fine at oracle scale; the
    # engine side is the O(log-diameter) label-propagation operator
    dup_clusters_sql = f"""
WITH RECURSIVE pairs AS ({ngram_jaccard_sql}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS d FROM sym),
reach(d, n) AS (
  SELECT d, d FROM nodes
  UNION
  SELECT r.d, s.b FROM reach r JOIN sym s ON s.a = r.n
)
SELECT d AS doc_id, MIN(n) AS cluster_id FROM reach GROUP BY d
"""

    events_hopping_sql = """
SELECT event_type,
       date_trunc('hour', ts) - h.h * INTERVAL 1 HOUR AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events, (SELECT range AS h FROM range(0, 2)) h
GROUP BY 1, 2
"""

    events_session_sql = """
WITH o AS (
  SELECT event_type, user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY event_type, user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT event_type, user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM s GROUP BY event_type, user_id, sid
"""

    type_counts = ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in ("view", "click", "purchase", "signup", "error")
    )
    user_features_sql = f"""
SELECT user_id, COUNT(*) AS n_events, {type_counts},
       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""

    events_sessionized_sql = """
WITH o AS (
  SELECT event_type, user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY event_type, user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT event_id,
       MIN(ts) OVER (PARTITION BY event_type, user_id, sid) AS session_start
FROM s
"""

    value_quantiles_sql = """
SELECT event_type,
       quantile_cont(CAST(FLOOR(value * 100.0) AS BIGINT), 0.5) AS p50,
       quantile_cont(CAST(FLOOR(value * 100.0) AS BIGINT), 0.9) AS p90,
       quantile_cont(CAST(FLOOR(value * 100.0) AS BIGINT), 0.99) AS p99
FROM events GROUP BY event_type
"""

    distinct_users_sql = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""

    top_events_sql = """
WITH r AS (SELECT event_type, event_id, value,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY value DESC, event_id) AS rn
           FROM events)
SELECT event_type, event_id, value, rn AS "rank" FROM r WHERE rn <= 10
"""

    spatial_join_obj_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, b.idx AS idx,
       'obj-' || CAST(b.idx AS VARCHAR) AS obj
FROM q, b WHERE {intersects}
"""

    batch_query_lists_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust}),
p AS (SELECT q.query_id AS query_id, b.idx AS idx FROM q, b WHERE {intersects})
SELECT query_id, array_to_string(list_sort(list(idx)), ',') AS matches
FROM p GROUP BY query_id
"""

    from python_prtree_ray.pipelines.sample import (
        hash_sample_sql,
        stratified_sample_sql,
    )

    doc_sample_sql = f"""
SELECT doc_id, n_chars FROM documents WHERE {hash_sample_sql('doc_id', 5)}
"""

    doc_sample_stratified_sql = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {stratified_sample_sql('doc_id', 'lang', {"en": 10, "de": 40, "fr": 25})}
"""

    events_enriched_sql = """
SELECT e.event_id, e.user_id, c.c_nationkey, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""

    from python_prtree_ray.pipelines.text import extract_json_int_sql

    props_extract_sql = extract_json_int_sql("props", "k", "event_id")

    g6 = 1 << TILE_RES
    _ix = f"LEAST(GREATEST(CAST(FLOOR(xmin * {g6}) AS BIGINT), 0), {g6 - 1})"
    _ix1 = f"LEAST(GREATEST(CAST(FLOOR(xmax * {g6}) AS BIGINT), 0), {g6 - 1})"
    _iy = f"LEAST(GREATEST(CAST(FLOOR(ymin * {g6}) AS BIGINT), 0), {g6 - 1})"
    _iy1 = f"LEAST(GREATEST(CAST(FLOOR(ymax * {g6}) AS BIGINT), 0), {g6 - 1})"
    cell_histogram_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, {_ix} AS ix0, {_ix1} AS ix1, {_iy} AS iy0, {_iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g6}))
SELECT sx.i * {g6} + sy.i AS cell, CAST(COUNT(*) AS BIGINT) AS n_boxes
FROM r, s sx, s sy
WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
GROUP BY 1
"""

    raster_tiles_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, {ix} AS ix0, {ix1} AS ix1, {iy} AS iy0, {iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g}))
SELECT r.idx AS idx, sx.i * {g} + sy.i AS cell,
       CAST(sx.i AS DOUBLE) / {g} AS tile_xmin,
       CAST(sy.i AS DOUBLE) / {g} AS tile_ymin,
       CAST(sx.i + 1 AS DOUBLE) / {g} AS tile_xmax,
       CAST(sy.i + 1 AS DOUBLE) / {g} AS tile_ymax
FROM r, s sx, s sy
WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
"""

    asof_sql = """
WITH l AS (SELECT event_id AS l_id, user_id, ts AS l_ts FROM events
           WHERE event_type = 'purchase'),
r0 AS (SELECT user_id, ts AS r_ts, MAX(event_id) AS r_id FROM events
       WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT l.l_id, l.user_id AS key, l.l_ts, r.r_id, r.r_ts
FROM l ASOF JOIN r0 r ON l.user_id = r.user_id AND l.l_ts >= r.r_ts
"""

    events_band_join_sql = """
WITH l AS (SELECT event_id AS l_id, user_id, ts AS l_ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT event_id AS r_id, user_id, ts AS r_ts FROM events
      WHERE event_type = 'view')
SELECT l.l_id, l.user_id AS key, l.l_ts, r.r_id, r.r_ts
FROM l JOIN r ON l.user_id = r.user_id
WHERE r.r_ts <= l.l_ts AND r.r_ts >= l.l_ts - INTERVAL 1 HOUR
"""

    session_join_sql = """
WITH s AS (
  SELECT user_id, event_type, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM s)
SELECT a.user_id AS user_id, a.event_id AS l_id, b.event_id AS r_id
FROM g a JOIN g b ON a.user_id = b.user_id AND a.sess = b.sess
WHERE a.event_type = 'purchase' AND b.event_type = 'view'
"""

    funnel_counts_sql = """
WITH m AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
  FROM events GROUP BY user_id)
SELECT CAST(COUNT(CASE WHEN t0 IS NOT NULL THEN 1 END) AS BIGINT) AS n_stage1,
       CAST(COUNT(CASE WHEN t1 > t0 THEN 1 END) AS BIGINT) AS n_stage2,
       CAST(COUNT(CASE WHEN t1 > t0 AND t2 > t1 THEN 1 END) AS BIGINT) AS n_stage3
FROM m
"""

    pricing_summary_sql = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_price_c,
  CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 100.0)
      AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
  CAST(SUM(CAST(FLOOR(((l_extendedprice * (1 - l_discount)) * (1 + l_tax))
      * 100.0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
  CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT))
    // COUNT(*) AS BIGINT) AS avg_qty_c,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
    // COUNT(*) AS BIGINT) AS avg_price_c,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    spatial_semi_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT b.idx AS idx FROM b
WHERE EXISTS (SELECT 1 FROM q WHERE {intersects})
"""

    spatial_anti_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT b.idx AS idx FROM b
WHERE NOT EXISTS (SELECT 1 FROM q WHERE {intersects})
"""

    source_dedup_stats_sql = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique
FROM documents GROUP BY source
"""

    ann_classify_sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10),
d AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.embedding, e.embedding) AS sim
      FROM q, embeddings e),
r AS (SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM d),
l AS (SELECT r.query_id, e.label FROM r JOIN embeddings e USING (vec_id)
      WHERE r.rn <= {ANN_K}),
c AS (SELECT query_id, label, COUNT(*) AS c FROM l GROUP BY query_id, label),
w AS (SELECT query_id, label,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, label) AS wn
      FROM c)
SELECT query_id, CAST(label AS BIGINT) AS label FROM w WHERE wn = 1
"""

    from python_prtree_ray.pipelines.sample import weighted_sample_sql

    doc_sample_weighted_sql = f"""
SELECT doc_id, n_chars FROM documents
WHERE {weighted_sample_sql('doc_id', 'n_chars', 5)}
"""

    region_rollup_sql = """
SELECT r.r_name AS r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
         AS acctbal_c
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

    # ---- media twins: the stub payload is a pure function of media_ref,
    # and the interleaved corpus is a pure function of the doc number, so
    # BOTH media pipelines regenerate exactly in DuckDB (spans CTE twin
    # verified row-identical in tests/test_pipelines_ray.py).
    from python_prtree_ray.sources.synth import (
        MEDIA_PAYLOAD_SQL,
        MEDIA_PLEN_SQL,
        interleaved_spans_sql,
    )

    spans_sql = interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)"
    )

    def _fterm(k: int) -> str:
        return " + ".join(
            f"CASE WHEN length(p) >= {8 * k + j + 1} "
            f"THEN ord(substr(p, {8 * k + j + 1}, 1)) ELSE 0 END"
            for j in range(8)
        )

    f_cols = ",\n       ".join(
        f"CAST({_fterm(k)} AS BIGINT) AS f{k}" for k in range(8)
    )
    media_features_sql = f"""
WITH sp AS ({spans_sql}),
pay AS (SELECT doc_id, "offset", kind, {MEDIA_PAYLOAD_SQL} AS p FROM sp)
SELECT doc_id, "offset", kind,
       {f_cols}
FROM pay
"""

    video_frames_sql = f"""
WITH sp AS ({spans_sql}),
v AS (SELECT doc_id, "offset", {MEDIA_PLEN_SQL} AS plen FROM sp
      WHERE kind = 'video'),
c AS (SELECT doc_id, "offset", plen,
             CAST(CEIL(plen / 64.0) AS BIGINT) AS n_chunks FROM v)
SELECT doc_id, "offset",
       CAST(CEIL(n_chunks / 2.0) AS BIGINT) AS n_frames,
       CAST(LEAST(64, plen) +
            CASE WHEN n_chunks > 2 THEN LEAST(64, plen - 128) ELSE 0 END
            AS BIGINT) AS frame_bytes
FROM c
"""

    interval_join_sql = """
WITH l AS (SELECT event_id AS l_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     r AS (SELECT event_id AS r_id, user_id, ts FROM events
           WHERE event_type = 'view')
SELECT l.l_id, r.r_id
FROM l JOIN r ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts AND l.ts + INTERVAL 2 HOUR
"""

    from python_prtree_ray.pipelines.sample import SAMPLE_CHANNEL as _SCH

    _sa, _sb = derive.CHANNELS[_SCH]
    doc_cap_per_lang_sql = f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * {_sa} + {_sb}) % {derive.MOD}, doc_id) AS rn
  FROM documents)
WHERE rn <= 50
"""

    spatial_join_3d_sql = f"""
WITH b AS ({derive.boxes_3d_sql("orders", "o_orderkey", "idx")}),
     q AS ({derive.query_boxes_3d_sql("customer", "c_custkey", "query_id")})
SELECT q.query_id AS query_id, b.idx AS idx
FROM q, b
WHERE {intersects}
  AND q.zmin <= b.zmax AND b.zmin <= q.zmax
"""

    spatial_join_4d_sql = f"""
WITH b AS ({derive.boxes_4d_sql("orders", "o_orderkey", "idx")}),
     q AS ({derive.query_boxes_4d_sql("customer", "c_custkey", "query_id")})
SELECT q.query_id AS query_id, b.idx AS idx
FROM q, b
WHERE {intersects}
  AND q.zmin <= b.zmax AND b.zmin <= q.zmax
  AND q.tmin <= b.tmax AND b.tmin <= q.tmax
"""

    return {
        "spatial_join": spatial_join_sql,
        "box_count": box_count_sql,
        # same semantics, forced cell-shuffle physical plan
        "spatial_join_shuffle": spatial_join_sql,
        "self_join": self_join_sql,
        "point_query": point_query_sql,
        "knn": knn_sql,
        "iou_join": _iou_join_sql_entry,
        "knn_regress": f"""
WITH t AS ({knn_sql}),
v AS (SELECT query_id, {derive.point_measure_sql("idx")} AS v FROM t)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_nb,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pred
FROM v GROUP BY query_id
""",
        # same semantics, forced histogram ring-expansion physical plan
        "knn_ring": knn_sql,
        "knn_3d": knn_3d_sql,
        "knn_4d": knn_4d_sql,
        "radius_join": radius_join_sql,
        "point_clusters": point_clusters_sql,
        "dbscan": dbscan_sql,
        "pip": pip_sql,
        "pip_nonconvex": _pip_nonconvex_sql(p_cust),
        "zonal_stats": zonal_stats_sql,
        "tile_points": tile_points_sql,
        "tile_cover": tile_cover_sql,
        "tile_extent": tile_extent_sql,
        "tile_topk": tile_topk_sql,
        "tile_quadkey": tile_quadkey_sql,
        "tile_hilbert": _tile_hilbert_sql(p_cust, TILE_RES),
        "hilbert_ranges": _hilbert_ranges_sql(p_cust, TILE_RES, 8),
        "tile_quantiles": tile_quantiles_sql,
        "idw_grid": idw_grid_sql_q,
        "kde_grid": kde_grid_sql_q,
        "empty_space_f": empty_space_f_sql_q,
        "largest_empty_circle": largest_empty_circle_sql_q,
        "hex_bin": hex_bin_sql_q,
        "haversine_join": haversine_join_sql_q,
        "knn_geo": knn_geo_sql_q,
        "tile_pyramid": tile_pyramid_sql,
        "lifecycle_query": lifecycle_sql,
        "dedup_exact": dedup_exact_sql,
        "token_stats": token_stats_sql,
        "token_pieces": token_pieces_sql,
        "pii_scrub": pii_scrub_sql,
        "doc_lm_freq": doc_lm_freq_sql,
        "doc_chunks": doc_chunks_sql,
        "quality_score": quality_sql,
        "lang_id": lang_id_sql,
        "events_window": events_window_sql,
        "ann_topk": ann_topk_sql,
        "ann_range": f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10)
SELECT q.query_id AS query_id, e.vec_id AS vec_id
FROM q, embeddings e
WHERE list_cosine_similarity(q.embedding, e.embedding) >= {ANN_RANGE_T}
""",
        "embedding_neardup_exact": embedding_neardup_exact_sql,
        "ngram_jaccard": ngram_jaccard_sql,
        "events_hopping": events_hopping_sql,
        "events_session": events_session_sql,
        "events_sessionized": events_sessionized_sql,
        "user_features": user_features_sql,
        "top_events": top_events_sql,
        "distinct_users": distinct_users_sql,
        "value_quantiles": value_quantiles_sql,
        "spatial_join_obj": spatial_join_obj_sql,
        "batch_query_lists": batch_query_lists_sql,
        "spatial_join_3d": spatial_join_3d_sql,
        "spatial_join_4d": spatial_join_4d_sql,
        "doc_sample": doc_sample_sql,
        "doc_sample_stratified": doc_sample_stratified_sql,
        "events_enriched": events_enriched_sql,
        "props_extract": props_extract_sql,
        "cell_histogram": cell_histogram_sql,
        "asof_purchase_view": asof_sql,
        "events_band_join": events_band_join_sql,
        "session_join": session_join_sql,
        "ann_classify": ann_classify_sql,
        "doc_sample_weighted": doc_sample_weighted_sql,
        "region_rollup": region_rollup_sql,
        "funnel_counts": funnel_counts_sql,
        "pricing_summary": pricing_summary_sql,
        "spatial_semi": spatial_semi_sql,
        "spatial_anti": spatial_anti_sql,
        "source_dedup_stats": source_dedup_stats_sql,
        "raster_tiles": raster_tiles_sql,
        "media_features": media_features_sql,
        "video_frames": video_frames_sql,
        # full span-sequence invariant (kind, text, media_ref, order)
        "span_sequence": "SELECT * FROM ("
        + interleaved_spans_sql(
            "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
        )
        + ")",
        # span-level georeference + tile: sid = doc_num*16 + seq, the
        # same derive channels and clamped-floor tile math both sides
        # span-granular flagship join: the same closed-interval
        # point-probe predicate as point_query, over the regenerated
        # span corpus's derive-channel points
        "span_box_join": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )}),
s AS (SELECT CAST(substr(doc_id, 4) AS BIGINT) * 16 + seq AS query_id
      FROM sp),
p AS (SELECT query_id,
             {derive._frac_sql('query_id', 4)} AS px,
             {derive._frac_sql('query_id', 5)} AS py
      FROM s),
b AS ({b_orders})
SELECT p.query_id AS query_id, b.idx AS idx
FROM p, b
WHERE p.px <= b.xmax AND b.xmin <= p.px AND p.py <= b.ymax AND b.ymin <= p.py
""",
        "span_tiles": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )}),
s AS (SELECT doc_id, seq, kind,
             CAST(substr(doc_id, 4) AS BIGINT) * 16 + seq AS sid
      FROM sp),
p AS (SELECT doc_id, seq, kind,
             {derive._frac_sql('sid', 4)} AS px,
             {derive._frac_sql('sid', 5)} AS py
      FROM s)
SELECT doc_id, seq, kind, px, py,
       {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell
FROM p
""",
        # context-window packing over the regenerated span corpus:
        # window = cumulative-cost-before // budget (window SUM twin)
        "span_windows": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )}),
c AS (SELECT doc_id, seq, kind,
             CASE WHEN kind = 'text'
                  THEN length(text) - length(replace(text, ' ', '')) + 1
                  ELSE {SPAN_MEDIA_TOK} END AS cost
      FROM sp),
w AS (SELECT doc_id, kind, cost,
             COALESCE(SUM(cost) OVER (PARTITION BY doc_id ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {SPAN_BUDGET} AS window_id
      FROM c)
SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(cost) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN kind = 'text' THEN 0 ELSE 1 END) AS BIGINT)
         AS n_media
FROM w GROUP BY doc_id, window_id
""",
        # per-doc modality profile over the regenerated span corpus
        "doc_modality": "SELECT doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_spans, "
        "CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_text, "
        "CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_image, "
        "CAST(SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_audio, "
        "CAST(SUM(CASE WHEN kind = 'video' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_video, "
        "CAST(SUM(length(text)) AS BIGINT) AS text_chars FROM ("
        + interleaved_spans_sql(
            "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
        )
        + ") GROUP BY doc_id",
        # modality interleaving structure over the regenerated spans
        "span_transitions": """
WITH sp AS ("""
        + interleaved_spans_sql(
            "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
        )
        + """),
d AS (SELECT doc_id, kind,
             LAG(kind) OVER (PARTITION BY doc_id ORDER BY seq) AS from_kind
      FROM sp)
SELECT from_kind, kind AS to_kind, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE from_kind IS NOT NULL GROUP BY from_kind, kind
""",
        "emb_covariance": _emb_covariance_sql("embeddings"),
        # resume reread must equal the plain join's pair set
        "checkpoint_resume": spatial_join_sql,
        # a saved+loaded tree must answer queries identically
        "save_load": spatial_join_sql,
        "interval_join": interval_join_sql,
        "doc_cap_per_lang": doc_cap_per_lang_sql,
        "dup_clusters": dup_clusters_sql,
        "cluster_size_hist": (
            "SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM ("
            "SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size FROM ("
            + dup_clusters_sql
            + ") GROUP BY cluster_id) GROUP BY size"
        ),
        "dedup_survivors": f"""
WITH cc AS ({dup_clusters_sql})
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN
  (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
""",
        "lineitem_orders": (
            "SELECT l_orderkey, l_linenumber, l_quantity, o_custkey "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        ),
        "orders_cust_left": (
            "SELECT o.o_custkey, o.o_orderkey, COALESCE(c.c_name, '') AS cname "
            "FROM orders o LEFT JOIN "
            "(SELECT c_custkey, c_name FROM customer "
            " WHERE c_mktsegment = 'BUILDING') c "
            "ON o.o_custkey = c.c_custkey"
        ),
        "orders_cust_outer": (
            "SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, "
            "COALESCE(o.o_orderkey, -1) AS o_orderkey, "
            "COALESCE(c.c_name, '') AS cname "
            "FROM (SELECT o_orderkey, o_custkey FROM orders "
            "      WHERE o_orderkey % 3 = 0) o "
            "FULL JOIN (SELECT c_custkey, c_name FROM customer "
            "           WHERE c_mktsegment = 'BUILDING') c "
            "ON o.o_custkey = c.c_custkey"
        ),
        "orders_with_returns": (
            "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey IN "
            "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
        ),
        "orders_no_returns": (
            "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey NOT IN "
            "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
        ),
        "orders_semi_bloom": (
            "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey IN "
            "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
        ),
        "q3_revenue": (
            "SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_custkey IN "
            " (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) "
            "GROUP BY l_orderkey"
        ),
        "weekday_skew_users": (
            "WITH t AS (SELECT user_id, (epoch_us(ts) // 86400000000 + 4) % 7"
            " AS dow FROM events) "
            "SELECT user_id, CAST(SUM(CASE WHEN dow NOT IN (0, 6) THEN 1 "
            "ELSE 0 END) AS BIGINT) AS n_weekday, "
            "CAST(SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_weekend FROM t GROUP BY user_id "
            "HAVING SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) * 5 "
            "< COUNT(*)"
        ),
        "vocab_hapax": (
            "WITH w AS (SELECT unnest(regexp_extract_all(lower(text),"
            " '[a-z]+')) AS word FROM documents),"
            " c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ CAST(COUNT(*) AS DOUBLE) AS hapax_ratio FROM c"
        ),
        "emb_norm_outliers": _emb_norm_outliers_sql("embeddings"),
        "label_cohesion": _label_cohesion_sql("embeddings"),
        "label_separation": _label_separation_sql("embeddings"),
        "supplier_reach_hist": (
            "WITH d AS (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem),"
            " r AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM d GROUP BY l_suppkey) "
            "SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_suppliers "
            "FROM r GROUP BY n_orders"
        ),
        "convert_delay_quantiles": (
            "WITH f AS (SELECT user_id, "
            "MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv, "
            "MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)"
            " AS tp FROM events GROUP BY user_id), "
            "d AS (SELECT CAST(0 AS BIGINT) AS k, tp - tv AS delay_us FROM f "
            "WHERE tv IS NOT NULL AND tp IS NOT NULL) "
            "SELECT k, quantile_cont(delay_us, 0.5) AS p50, "
            "quantile_cont(delay_us, 0.9) AS p90, "
            "quantile_cont(delay_us, 0.99) AS p99 FROM d GROUP BY k"
        ),
        "activity_autocorr": (
            "WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
            "b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM h), "
            "g AS (SELECT unnest(generate_series(b.lo, b.hi)) AS hour FROM b), "
            "s AS (SELECT g.hour, CAST(COALESCE(h.n, 0) AS HUGEINT) AS n "
            "FROM g LEFT JOIN h ON h.hour = g.hour), "
            "p AS (SELECT s.n AS x, s2.n AS y FROM s JOIN s s2 "
            "ON s2.hour = s.hour + 24), "
            "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
            "CAST(SUM(x * y) AS HUGEINT) AS sxy, "
            "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
            "CAST(SUM(y * y) AS HUGEINT) AS syy FROM p) "
            "SELECT CAST(n AS BIGINT) AS n_pairs, "
            "CAST(n * sxy - sx * sy AS DOUBLE) AS num, "
            "CAST(n * sxx - sx * sx AS DOUBLE) AS var_x, "
            "CAST(n * syy - sy * sy AS DOUBLE) AS var_y, "
            "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN "
            "CAST(n * sxy - sx * sy AS DOUBLE) / "
            "SQRT(CAST(n * sxx - sx * sx AS DOUBLE) * "
            "CAST(n * syy - sy * sy AS DOUBLE)) ELSE NULL END AS r FROM m"
        ),
        "value_ks": (
            "WITH e AS (SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS cents, "
            "(epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6) AS wknd "
            "FROM events), "
            "h AS (SELECT cents, "
            "CAST(SUM(CASE WHEN wknd THEN 1 ELSE 0 END) AS HUGEINT) AS nw, "
            "CAST(SUM(CASE WHEN wknd THEN 0 ELSE 1 END) AS HUGEINT) AS nd "
            "FROM e GROUP BY cents), "
            "cum AS (SELECT SUM(nw) OVER (ORDER BY cents) AS cw, "
            "SUM(nd) OVER (ORDER BY cents) AS cd FROM h), "
            "tot AS (SELECT CAST(SUM(nw) AS HUGEINT) AS tw, "
            "CAST(SUM(nd) AS HUGEINT) AS td FROM h) "
            "SELECT CAST(tot.tw AS BIGINT) AS n_weekend, "
            "CAST(tot.td AS BIGINT) AS n_weekday, "
            "CAST(MAX(ABS(cum.cw * tot.td - cum.cd * tot.tw)) AS BIGINT) "
            "AS d_num, "
            "CAST(MAX(ABS(cum.cw * tot.td - cum.cd * tot.tw)) AS DOUBLE) "
            "/ CAST(tot.tw * tot.td AS DOUBLE) AS ks "
            "FROM cum, tot GROUP BY tot.tw, tot.td"
        ),
        "value_percentile": (
            "WITH c AS (SELECT event_id, CAST(FLOOR(value * 100.0) AS BIGINT)"
            " AS cents FROM events) "
            "SELECT event_id, cents, "
            "PERCENT_RANK() OVER (ORDER BY cents) AS pct FROM c"
        ),
        "activity_heatmap": (
            "WITH t AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, "
            "(epoch_us(ts) % 86400000000) // 3600000000 AS hour FROM events) "
            "SELECT dow, hour, CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM t GROUP BY dow, hour"
        ),
        "incremental_agg": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) "
            "AS value_cents FROM events GROUP BY user_id"
        ),
        "above_avg_orders": (
            "WITH o AS (SELECT o_orderkey, o_custkey, "
            "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders), "
            "c AS (SELECT o_custkey AS k, CAST(SUM(cents) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1) "
            "SELECT o_orderkey, o_custkey, cents FROM o JOIN c "
            "ON o_custkey = c.k WHERE cents * c.n > c.s"
        ),
        "emb_dim_quantiles": _emb_dim_quantiles_sql("embeddings"),
        "returns_revenue_share": (
            "WITH l AS (SELECT s_nationkey, "
            "CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)"
            " AS cents, l_returnflag = 'R' AS ret "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey), "
            "t AS (SELECT s_nationkey, CAST(SUM(cents) AS BIGINT) AS "
            "revenue_cents, CAST(SUM(CASE WHEN ret THEN cents ELSE 0 END) "
            "AS BIGINT) AS returned_cents FROM l GROUP BY s_nationkey) "
            "SELECT n_name, revenue_cents, returned_cents, "
            "CAST(returned_cents AS DOUBLE) / CAST(revenue_cents AS DOUBLE) "
            "AS returned_share FROM t JOIN nation ON n_nationkey = s_nationkey"
        ),
        "cust_order_histogram": (
            "WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders GROUP BY o_custkey) "
            "SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers "
            "FROM c GROUP BY n_orders"
        ),
        "lexical_diversity": _lexical_diversity_sql("documents"),
        "typo_pairs": _typo_pairs_sql("documents"),
        "interarrival_hist": _interarrival_hist_sql("events"),
        "doc_len_rank": (
            "WITH s AS (SELECT doc_id, lang, CAST(array_length("
            "regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens "
            "FROM documents) "
            "SELECT doc_id, lang, n_tokens, "
            "PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_tokens) AS pct"
            " FROM s"
        ),
        "session_duration_quantiles": (
            "WITH o AS (SELECT user_id, ts, event_id, "
            "CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events), "
            "s AS (SELECT user_id, epoch_us(ts) AS t, SUM(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED "
            "PRECEDING) AS sid FROM o), "
            "d AS (SELECT CAST(0 AS BIGINT) AS k, MAX(t) - MIN(t) AS dur_us "
            "FROM s GROUP BY user_id, sid) "
            "SELECT k, quantile_cont(dur_us, 0.5) AS p50, "
            "quantile_cont(dur_us, 0.9) AS p90, "
            "quantile_cont(dur_us, 0.99) AS p99 FROM d GROUP BY k"
        ),
        "lang_confusion": (
            "WITH p AS ("
            + lang_id_sql
            + ") SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM p JOIN documents d ON d.doc_id = p.doc_id "
            "GROUP BY d.lang, p.lang_pred"
        ),
        "value_drift": (
            "WITH b AS (SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2"
            " AS mid FROM events), "
            "c AS (SELECT event_type, epoch_us(ts) > b.mid AS late, "
            "CAST(FLOOR(value * 100.0) AS BIGINT) AS cents FROM events, b), "
            "t AS (SELECT event_type, "
            "CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS ne, "
            "CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS nl, "
            "CAST(SUM(CASE WHEN late THEN 0 ELSE cents END) AS BIGINT) AS se, "
            "CAST(SUM(CASE WHEN late THEN cents ELSE 0 END) AS BIGINT) AS sl "
            "FROM c GROUP BY event_type) "
            "SELECT event_type, "
            "CAST(se AS DOUBLE) / CAST(ne AS DOUBLE) AS mean_early, "
            "CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_late, "
            "ne * sl - nl * se AS shift_num FROM t"
        ),
        "lapsed_customers": (
            "WITH m AS (SELECT MAX(epoch_us(o_orderdate)) AS hi FROM orders) "
            "SELECT c_custkey, c_name FROM customer, m WHERE c_custkey NOT IN"
            " (SELECT o_custkey FROM orders, m WHERE epoch_us(o_orderdate)"
            " >= m.hi - 365 * 86400000000)"
        ),
        "co_purchase_parts": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
            "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2"
        ),
        "weekly_anomaly": (
            "WITH w AS (SELECT epoch_us(o_orderdate) // 604800000000 AS week, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
            " AS x FROM orders GROUP BY 1), "
            "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(x) AS HUGEINT) AS s, "
            "CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q FROM w) "
            "SELECT w.week, w.x AS revenue_cents, "
            "CASE WHEN m.n * m.q - m.s * m.s > 0 THEN "
            "CAST(m.n * w.x - m.s AS DOUBLE) / "
            "SQRT(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) ELSE 0.0 END AS z "
            "FROM w, m"
        ),
        "local_supplier_volume": (
            "SELECT n_name, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            "(1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE c_nationkey = s_nationkey "
            "GROUP BY n_name"
        ),
        "part_best_supplier": (
            "WITH l AS (SELECT l_partkey, l_suppkey, "
            "CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents "
            "FROM lineitem), "
            "r AS (SELECT l_partkey, l_suppkey, cents, ROW_NUMBER() OVER "
            "(PARTITION BY l_partkey ORDER BY cents, l_suppkey) AS rn FROM l) "
            "SELECT l_partkey, l_suppkey, cents FROM r WHERE rn = 1"
        ),
        "ship_delay_quantiles": (
            "WITH d AS (SELECT "
            "CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS prio, "
            "(epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 "
            "AS days FROM lineitem JOIN orders ON l_orderkey = o_orderkey) "
            "SELECT prio, quantile_cont(days, 0.5) AS p50, "
            "quantile_cont(days, 0.9) AS p90, "
            "quantile_cont(days, 0.99) AS p99 FROM d GROUP BY prio"
        ),
        "corpus_curation": corpus_curation_sql,
        "doc_tfidf_top": (
            "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
            " '[a-z]+')) AS word FROM documents),"
            " tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf"
            " FROM w GROUP BY doc_id, word),"
            " df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df"
            " FROM w GROUP BY word),"
            " nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),"
            " s AS (SELECT tf.doc_id, tf.word, tf.tf * nd.n // df.df AS score"
            " FROM tf, df, nd WHERE tf.word = df.word),"
            " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id"
            " ORDER BY score DESC, word) AS rn FROM s)"
            " SELECT doc_id, word, score FROM r WHERE rn = 1"
        ),
        "quality_adaptive": (
            "WITH s AS (SELECT doc_id, lang,"
            " (CAST(array_length(regexp_extract_all(text, '[a-zA-Z]')) AS"
            " BIGINT) * 100) // GREATEST(CAST(length(text) AS BIGINT), 1)"
            " AS quality_pct FROM documents),"
            " t AS (SELECT lang, quantile_cont(quality_pct, 0.5) AS thr"
            " FROM s GROUP BY lang)"
            " SELECT s.doc_id, s.lang, s.quality_pct FROM s JOIN t"
            " ON s.lang = t.lang WHERE s.quality_pct >= t.thr"
        ),
        "events_dedup": (
            "WITH t AS (SELECT user_id, event_type,"
            " time_bucket(INTERVAL 10 MINUTE, ts) AS window_start, ts, event_id"
            " FROM events),"
            " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id,"
            " event_type, window_start ORDER BY ts, event_id) AS rn FROM t)"
            " SELECT user_id, event_type, window_start, event_id"
            " FROM r WHERE rn = 1"
        ),
        "heavy_hitters": _heavy_hitters_sql(500),
        "vocab_topk": (
            "WITH w AS (SELECT unnest(regexp_extract_all(lower(text),"
            " '[a-z]+')) AS word FROM documents),"
            " c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word),"
            " r AS (SELECT word, n, ROW_NUMBER() OVER (ORDER BY n DESC, word)"
            " AS rank FROM c)"
            " SELECT word, n, rank FROM r WHERE rank <= 100"
        ),
        "bigram_lift": _bigram_lift_sql("documents", 100, 3),
        "char_trigrams": _char_trigrams_sql("documents", 100),
        "events_user_topk": (
            "WITH c AS (SELECT user_id, event_id, CAST(FLOOR(value * 100.0)"
            " AS BIGINT) AS value_cents FROM events),"
            " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id"
            " ORDER BY value_cents DESC, event_id) AS rank FROM c)"
            " SELECT user_id, event_id, value_cents, rank FROM r WHERE rank <= 3"
        ),
        "top_revenue": (
            "WITH rev AS ("
            " SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice * "
            " (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
            " FROM lineitem WHERE l_orderkey IN "
            " (SELECT o_orderkey FROM orders WHERE o_custkey IN "
            "  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) "
            " GROUP BY l_orderkey) "
            "SELECT l_orderkey, revenue_cents, "
            "CAST(ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, l_orderkey) "
            "AS BIGINT) AS \"rank\" "
            "FROM rev ORDER BY \"rank\" LIMIT 100"
        ),
        "label_centroids": (
            "SELECT CAST(label AS BIGINT) AS label, CAST(dim - 1 AS BIGINT) AS dim, "
            "CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 10000.0::DOUBLE) AS BIGINT)) "
            "AS BIGINT) AS sum_q, "
            "COUNT(*) AS n_vecs FROM ("
            "  SELECT label, unnest(embedding) AS e, "
            "         generate_subscripts(embedding, 1) AS dim"
            "  FROM embeddings) GROUP BY label, dim"
        ),
        "events_rolling": """
SELECT event_id, event_type,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER (
         PARTITION BY event_type ORDER BY ts
         RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
         AS BIGINT) AS roll_cents
FROM events
""",
        "events_enriched_left": (
            "SELECT e.event_id, e.user_id, "
            "CAST(COALESCE(s.s_nationkey, -1) AS BIGINT) AS s_nationkey "
            "FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey"
        ),
        "events_unmatched": (
            "SELECT event_id, user_id FROM events e WHERE NOT EXISTS "
            "(SELECT 1 FROM supplier s WHERE s.s_suppkey = e.user_id)"
        ),
        "text_normalize": (
            "SELECT doc_id, "
            r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm "
            "FROM documents"
        ),
        "doc_repetition": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),"
            " '[a-z]+') AS l FROM documents),"
            " w AS (SELECT doc_id, l[i] AS w, i AS pos FROM t,"
            " LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),"
            " bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bigram"
            " FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),"
            " cnt AS (SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c"
            " FROM bg GROUP BY doc_id, bigram)"
            " SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,"
            " CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,"
            " CAST(MAX(c) AS BIGINT) AS top_bigram_count"
            " FROM cnt GROUP BY doc_id"
        ),
        "source_jaccard": _SOURCE_JACCARD_SQL,
        "decontaminate": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),"
            " '[a-z]+') AS l FROM documents),"
            " w AS (SELECT doc_id, l[i] AS w, i AS pos FROM t,"
            " LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),"
            " g AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w || ' '"
            " || d.w AS gram"
            " FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"
            " JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2"
            " JOIN w d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3),"
            " bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),"
            " probe AS (SELECT DISTINCT doc_id, gram FROM g"
            " WHERE doc_id % 97 <> 0)"
            " SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits"
            " FROM probe p JOIN bench USING (gram) GROUP BY p.doc_id"
        ),
        "dup_ngram_coverage": _dup_ngram_coverage_sql(3),
        "search_topk": (
            "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
            " '[a-z]+')) AS word FROM documents),"
            " nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),"
            " df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df"
            " FROM w WHERE word IN ('spark', 'join', 'window') GROUP BY word),"
            " tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf"
            " FROM w WHERE word IN ('spark', 'join', 'window')"
            " GROUP BY doc_id, word),"
            " s AS (SELECT tf.doc_id, CAST(SUM(tf.tf * (nd.n // df.df))"
            " AS BIGINT) AS score FROM tf JOIN df USING (word), nd"
            " GROUP BY tf.doc_id),"
            " r AS (SELECT doc_id, score, ROW_NUMBER() OVER"
            " (ORDER BY score DESC, doc_id) AS rank FROM s WHERE score > 0)"
            " SELECT doc_id, score, rank FROM r WHERE rank <= 20"
        ),
        # BM25 twin: literal-for-literal the engine expression
        # (curation.search_bm25) — rational idf ((N-df)+0.5)/(df+0.5),
        # denom 1.5*(0.25+0.75*(dl/avgdl)), per-term left-assoc sum —
        # so float64 scores match bitwise
        "search_bm25": (
            "WITH t AS (SELECT doc_id,"
            " regexp_extract_all(lower(text), '[a-z]+') AS toks"
            " FROM documents),"
            " d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,"
            " CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf0,"
            " CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf1,"
            " CAST(len(list_filter(toks, x -> x = 'window')) AS BIGINT) AS tf2"
            " FROM t),"
            " g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,"
            " CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,"
            " CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,"
            " CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,"
            " CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2"
            " FROM d),"
            " s AS (SELECT d.doc_id,"
            " (((g.n - g.df0) + 0.5) / (g.df0 + 0.5))"
            "   * ((CAST(tf0 AS DOUBLE) * 2.5) / (CAST(tf0 AS DOUBLE)"
            "      + (1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / g.avgdl)))))"
            " + (((g.n - g.df1) + 0.5) / (g.df1 + 0.5))"
            "   * ((CAST(tf1 AS DOUBLE) * 2.5) / (CAST(tf1 AS DOUBLE)"
            "      + (1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / g.avgdl)))))"
            " + (((g.n - g.df2) + 0.5) / (g.df2 + 0.5))"
            "   * ((CAST(tf2 AS DOUBLE) * 2.5) / (CAST(tf2 AS DOUBLE)"
            "      + (1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / g.avgdl)))))"
            " AS score FROM d, g),"
            " r AS (SELECT doc_id, score, ROW_NUMBER() OVER"
            " (ORDER BY score DESC, doc_id) AS rank FROM s WHERE score > 0)"
            " SELECT doc_id, score, rank FROM r WHERE rank <= 20"
        ),
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
        "trajectory_length": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_index_sql('q.px', TRACK_RES)} AS gx,
         {derive.tile_index_sql('q.py', TRACK_RES)} AS gy
  FROM events e JOIN q USING (event_id)
),
d AS (
  SELECT user_id,
         ABS(gx - LAG(gx) OVER w) + ABS(gy - LAG(gy) OVER w) AS step
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(COUNT(step) AS BIGINT) AS n_moves,
       CAST(SUM(step) AS BIGINT) AS l1_len
FROM d GROUP BY user_id HAVING COUNT(step) > 0
""",
        # geofence twin: per-event zone via the pip cross-product
        # expression (bitwise-shared with the engine kernel), MIN(poly_id)
        # = engine's first-ascending-pid-wins, then LAG over the same
        # (ts, event_id) entity order; transitions are int comparisons
        "geofence_events": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
pe AS (SELECT * FROM {derive.polygon_edges_sql()}),
p AS (
  SELECT e.user_id, e.ts, e.event_id, q.px, q.py
  FROM events e JOIN q USING (event_id)
),
zin AS (
  SELECT p.event_id AS event_id, pe.poly_id AS poly_id
  FROM p, pe
  GROUP BY p.event_id, pe.poly_id
  HAVING bool_and((pe.x2 - pe.x1) * (p.py - pe.y1)
                - (pe.y2 - pe.y1) * (p.px - pe.x1) >= 0.0)
),
z AS (
  SELECT p.user_id, p.ts, p.event_id, COALESCE(zz.zone, -1) AS zone
  FROM p LEFT JOIN (
    SELECT event_id, MIN(poly_id) AS zone FROM zin GROUP BY event_id
  ) zz USING (event_id)
),
l AS (
  SELECT user_id, event_id, zone, LAG(zone) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_zone
  FROM z
)
SELECT user_id, event_id, prev_zone AS from_zone, zone AS to_zone
FROM l WHERE prev_zone IS NOT NULL AND prev_zone <> zone
""",
        # segment-crossing twin: LAG-derived gated segments, self-join on
        # user_a < user_b + bbox overlap (a no-op prefilter: intersecting
        # segments always bbox-overlap), exact int64 four-orientation
        # predicate with collinear-touch cases — literal engine mirror
        "segment_crossings": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_index_sql('q.px', TRACK_RES)} AS gx,
         {derive.tile_index_sql('q.py', TRACK_RES)} AS gy
  FROM events e JOIN q USING (event_id)
),
s AS (
  SELECT user_id, gx AS x2, gy AS y2,
         LAG(gx) OVER w AS x1, LAG(gy) OVER w AS y1,
         LAG(event_id) OVER w AS seq
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seg AS (
  SELECT user_id, seq, x1, y1, x2, y2,
         LEAST(x1, x2) AS lox, GREATEST(x1, x2) AS hix,
         LEAST(y1, y2) AS loy, GREATEST(y1, y2) AS hiy
  FROM s
  WHERE x1 IS NOT NULL AND ABS(x2 - x1) <= 128 AND ABS(y2 - y1) <= 128
),
cand AS (
  SELECT a.user_id AS user_a, a.seq AS seq_a,
         b.user_id AS user_b, b.seq AS seq_b,
         (a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) AS o1,
         (a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) AS o2,
         (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS o3,
         (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS o4,
         (b.x1 >= a.lox AND b.x1 <= a.hix
          AND b.y1 >= a.loy AND b.y1 <= a.hiy) AS b1_on_a,
         (b.x2 >= a.lox AND b.x2 <= a.hix
          AND b.y2 >= a.loy AND b.y2 <= a.hiy) AS b2_on_a,
         (a.x1 >= b.lox AND a.x1 <= b.hix
          AND a.y1 >= b.loy AND a.y1 <= b.hiy) AS a1_on_b,
         (a.x2 >= b.lox AND a.x2 <= b.hix
          AND a.y2 >= b.loy AND a.y2 <= b.hiy) AS a2_on_b
  FROM seg a JOIN seg b ON a.user_id < b.user_id
   AND a.lox <= b.hix AND b.lox <= a.hix
   AND a.loy <= b.hiy AND b.loy <= a.hiy
)
SELECT user_a, seq_a, user_b, seq_b FROM cand
WHERE (((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0))
       AND ((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0)))
   OR (o1 = 0 AND b1_on_a) OR (o2 = 0 AND b2_on_a)
   OR (o3 = 0 AND a1_on_b) OR (o4 = 0 AND a2_on_b)
""",
        "resample_track": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (SELECT e.user_id, e.ts, e.event_id, q.px, q.py
      FROM events e JOIN q USING (event_id)),
d AS (SELECT user_id, ts, px, py,
             LEAD(ts) OVER w AS nts,
             LEAD(px) OVER w AS npx,
             LEAD(py) OVER w AS npy
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
b AS (SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      FROM p GROUP BY user_id),
g AS (SELECT user_id,
             unnest(generate_series(
                 (mn - {RESAMPLE_T0_US} + {RESAMPLE_STEP_US} - 1) // {RESAMPLE_STEP_US},
                 (mx - {RESAMPLE_T0_US}) // {RESAMPLE_STEP_US})) AS epoch
      FROM b),
j AS (SELECT g.user_id AS user_id, g.epoch AS epoch,
             ({RESAMPLE_T0_US} + g.epoch * {RESAMPLE_STEP_US}) AS t_us,
             d.ts AS ts, d.px AS px, d.py AS py,
             d.nts AS nts, d.npx AS npx, d.npy AS npy
      FROM g JOIN d ON d.user_id = g.user_id
       AND epoch_us(d.ts) <= ({RESAMPLE_T0_US} + g.epoch * {RESAMPLE_STEP_US})
       AND (d.nts IS NULL
            OR ({RESAMPLE_T0_US} + g.epoch * {RESAMPLE_STEP_US}) < epoch_us(d.nts)))
SELECT user_id, epoch, t_us,
       CASE WHEN nts IS NULL THEN px
            ELSE px + (npx - px)
                 * (CAST(t_us - epoch_us(ts) AS DOUBLE)
                    / CAST(epoch_us(nts) - epoch_us(ts) AS DOUBLE)) END AS x,
       CASE WHEN nts IS NULL THEN py
            ELSE py + (npy - py)
                 * (CAST(t_us - epoch_us(ts) AS DOUBLE)
                    / CAST(epoch_us(nts) - epoch_us(ts) AS DOUBLE)) END AS y
FROM j
""",
        "colocation_pairs": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id AS u,
         {derive.tile_cell_sql('q.px', 'q.py', COLOC_RES)} AS c
  FROM events e JOIN q USING (event_id)
),
d AS (SELECT DISTINCT u, c FROM p),
pr AS (SELECT a.u AS user_a, b.u AS user_b
       FROM d a JOIN d b ON a.c = b.c AND a.u < b.u)
SELECT user_a, user_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pr GROUP BY user_a, user_b HAVING COUNT(*) >= {COLOC_MIN_SHARED}
""",
        "record_events": _record_events_sql("events"),
        "late_events": _late_events_sql("events"),
        "user_journeys": _user_journeys_sql(4, "events"),
        "order_running_totals": _order_running_totals_sql("orders"),
        "attribution_last_touch": (
            "WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS tus, "
            "event_type FROM events "
            "WHERE event_type IN ('view', 'purchase')), "
            "w AS (SELECT user_id, event_id, tus, event_type, "
            "LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END "
            "IGNORE NULLS) OVER win AS view_id, "
            "LAST_VALUE(CASE WHEN event_type = 'view' THEN tus END "
            "IGNORE NULLS) OVER win AS view_tus "
            "FROM s WINDOW win AS (PARTITION BY user_id "
            "ORDER BY tus, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
            "SELECT event_id AS purchase_id, user_id, view_id, "
            "tus - view_tus AS gap_us "
            "FROM w WHERE event_type = 'purchase' AND view_id IS NOT NULL"
        ),
        "session_type_pairs": _session_type_pairs_sql("events"),
        "value_peaks": _value_peaks_sql("events"),
        "rolling_wau": _rolling_wau_sql("events"),
        "activity_decile_purchase": (
            "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ne, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS np FROM events GROUP BY user_id), "
            "r AS (SELECT ne, np, ROW_NUMBER() OVER (ORDER BY ne, user_id)"
            " AS rn FROM c), "
            "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c) "
            "SELECT (r.rn - 1) * 10 // t.n AS decile, "
            "CAST(COUNT(*) AS BIGINT) AS n_users, "
            "CAST(SUM(ne) AS BIGINT) AS n_events, "
            "CAST(SUM(np) AS BIGINT) AS n_purchases, "
            "CAST(SUM(np) AS DOUBLE) / CAST(SUM(ne) AS DOUBLE) "
            "AS purchase_share FROM r, t GROUP BY 1"
        ),
        "recency_hist": (
            "WITH l AS (SELECT user_id, MAX(epoch_us(ts) // 86400000000)"
            " AS last_day FROM events GROUP BY user_id), "
            "e AS (SELECT MAX(last_day) AS endd FROM l) "
            "SELECT e.endd - l.last_day AS recency_days, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM l, e GROUP BY 1"
        ),
        "region_count_curve": _region_count_curve_sql(
            "SELECT px * px AS px, py * py AS py FROM ("
            + derive.points_sql("events", "event_id", "event_id")
            + ")",
            TILE_RES,
            (8, 16, 32),
        ),
        "type_centroids": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), pts AS (SELECT e.event_type AS event_type, "
            + derive.tile_index_sql("q.px", TRACK_RES)
            + " AS ix, "
            + derive.tile_index_sql("q.py", TRACK_RES)
            + " AS iy FROM events e JOIN q ON e.event_id = q.event_id) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(ix) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_ix, "
            "CAST(SUM(iy) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_iy "
            "FROM pts GROUP BY event_type"
        ),
        "pareto_users": (
            "WITH c AS (SELECT user_id, CAST(SUM(CAST(FLOOR(value * 100.0)"
            " AS BIGINT)) AS BIGINT) AS x FROM events GROUP BY user_id), "
            "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, user_id)"
            " AS rn FROM c), "
            "s AS (SELECT rn, SUM(x) OVER (ORDER BY rn) AS cum FROM r), "
            "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS total FROM c) "
            "SELECT tot.n AS n_users, tot.total AS total_cents, "
            "CAST(MIN(s.rn) AS BIGINT) AS k80, "
            "CAST(MIN(s.rn) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS share "
            "FROM s, tot WHERE 5 * s.cum >= 4 * tot.total "
            "GROUP BY tot.n, tot.total"
        ),
        "tile_net_flow": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), pts AS (SELECT e.user_id AS u, e.ts AS ts, "
            "e.event_id AS seq, "
            + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
            + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
            "mv AS (SELECT LAG(cell) OVER (PARTITION BY u ORDER BY ts, seq)"
            " AS f, cell AS t FROM pts), "
            "m2 AS (SELECT f, t FROM mv WHERE f IS NOT NULL AND f <> t), "
            "i AS (SELECT t AS cell, CAST(COUNT(*) AS BIGINT) AS n_in "
            "FROM m2 GROUP BY t), "
            "o AS (SELECT f AS cell, CAST(COUNT(*) AS BIGINT) AS n_out "
            "FROM m2 GROUP BY f) "
            "SELECT COALESCE(i.cell, o.cell) AS cell, "
            "COALESCE(i.n_in, 0) AS n_in, COALESCE(o.n_out, 0) AS n_out, "
            "COALESCE(i.n_in, 0) - COALESCE(o.n_out, 0) AS net "
            "FROM i FULL OUTER JOIN o ON i.cell = o.cell"
        ),
        "active_span_quantiles": (
            "WITH s AS (SELECT CAST(0 AS BIGINT) AS k, "
            "MAX(epoch_us(ts) // 86400000000) - "
            "MIN(epoch_us(ts) // 86400000000) AS span_days "
            "FROM events GROUP BY user_id) "
            "SELECT k, quantile_cont(span_days, 0.5) AS p50, "
            "quantile_cont(span_days, 0.9) AS p90, "
            "quantile_cont(span_days, 0.99) AS p99 FROM s GROUP BY k"
        ),
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
        "event_age_hist": (
            "WITH f AS (SELECT user_id, MIN(CASE WHEN event_type = 'signup'"
            " THEN epoch_us(ts) END) AS t0 FROM events GROUP BY user_id), "
            "a AS (SELECT (epoch_us(e.ts) - f.t0) // 86400000000 AS d "
            "FROM events e JOIN f ON e.user_id = f.user_id "
            "WHERE f.t0 IS NOT NULL AND epoch_us(e.ts) >= f.t0), "
            "b AS (SELECT CASE WHEN d = 0 THEN -1 "
            + " ".join(
                f"WHEN d < {1 << (k + 1)} THEN {k}" for k in range(15)
            )
            + " END AS bin FROM a) "
            "SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n"
            " FROM b GROUP BY bin"
        ),
        "robust_outliers": (
            "WITH c AS (SELECT event_type, CAST(FLOOR(value * 100.0) AS"
            " BIGINT) AS cents FROM events), "
            "m AS (SELECT quantile_cont(cents, 0.5) AS med FROM c), "
            "m2 AS (SELECT CAST(ROUND(2 * med) AS BIGINT) AS m2v FROM m), "
            "d AS (SELECT ABS(2 * cents - m2.m2v) AS dev FROM c, m2), "
            "md AS (SELECT CAST(ROUND(2 * quantile_cont(dev, 0.5)) AS BIGINT)"
            " AS mad4 FROM d) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CASE WHEN 2 * ABS(2 * cents - m2.m2v) > 5 * md.mad4 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
            "FROM c, m2, md GROUP BY event_type"
        ),
        "daily_new_returning": (
            "WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000"
            " AS day FROM events), "
            "f AS (SELECT user_id, MIN(day) AS fd FROM a GROUP BY user_id) "
            "SELECT a.day, CAST(SUM(CASE WHEN a.day = f.fd THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_new, "
            "CAST(SUM(CASE WHEN a.day = f.fd THEN 0 ELSE 1 END) AS BIGINT)"
            " AS n_returning "
            "FROM a JOIN f ON a.user_id = f.user_id GROUP BY a.day"
        ),
        "value_mad": (
            "WITH c AS (SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS cents"
            " FROM events), "
            "m AS (SELECT quantile_cont(cents, 0.5) AS med, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM c), "
            "m2 AS (SELECT CAST(ROUND(2 * med) AS BIGINT) AS m2v, med, n "
            "FROM m), "
            "d AS (SELECT ABS(2 * cents - m2.m2v) AS dev FROM c, m2) "
            "SELECT m2.n AS n, m2.med AS median, "
            "quantile_cont(d.dev, 0.5) / 2.0 AS mad "
            "FROM d, m2 GROUP BY m2.n, m2.med"
        ),
        "nation_share": (
            "WITH t AS (SELECT c_nationkey, CAST(SUM(CAST(FLOOR("
            "o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_nationkey), "
            "r AS (SELECT n_regionkey, CAST(SUM(revenue_cents) AS BIGINT)"
            " AS region_cents FROM t JOIN nation ON n_nationkey = c_nationkey"
            " GROUP BY n_regionkey) "
            "SELECT r_name, n_name, t.revenue_cents, r.region_cents, "
            "CAST(t.revenue_cents AS DOUBLE) / CAST(r.region_cents AS DOUBLE)"
            " AS share "
            "FROM t JOIN nation ON n_nationkey = c_nationkey "
            "JOIN r ON r.n_regionkey = nation.n_regionkey "
            "JOIN region ON r_regionkey = nation.n_regionkey"
        ),
        "user_gini": (
            "WITH c AS (SELECT user_id, CAST(SUM(CAST(FLOOR(value * 100.0)"
            " AS BIGINT)) AS BIGINT) AS x FROM events GROUP BY user_id), "
            "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(COALESCE(SUM(x), 0) AS HUGEINT) AS s FROM c), "
            "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM c), "
            "g AS (SELECT CAST(COALESCE(SUM((2 * CAST(rn - 1 AS HUGEINT) - "
            "(SELECT n FROM m) + 1) * x), 0) AS HUGEINT) AS num FROM r) "
            "SELECT CAST(m.n AS BIGINT) AS n_users, "
            "CAST(m.s AS BIGINT) AS total_cents, "
            "CASE WHEN m.n * m.s > 0 THEN CAST(g.num AS DOUBLE) / "
            "CAST(m.n * m.s AS DOUBLE) ELSE NULL END AS gini FROM m, g"
        ),
        "cohort_retention": _cohort_retention_sql("events"),
        "covisit_tile_pairs": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), d AS (SELECT DISTINCT e.user_id AS u, "
            + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
            + " AS cell FROM events e JOIN q ON e.event_id = q.event_id) "
            "SELECT a.cell AS cell_a, b.cell AS cell_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM d a JOIN d b ON a.u = b.u AND a.cell < b.cell "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 4"
        ),
        "co_travelers": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), d AS (SELECT DISTINCT e.user_id AS u, "
            "epoch_us(e.ts) // 86400000000 AS day, "
            + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
            + " AS cell FROM events e JOIN q ON e.event_id = q.event_id) "
            "SELECT a.u AS user_a, b.u AS user_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_shared "
            "FROM d a JOIN d b ON a.day = b.day AND a.cell = b.cell "
            "AND a.u < b.u GROUP BY 1, 2 HAVING COUNT(*) >= 3"
        ),
        "travel_groups": (
            "WITH RECURSIVE q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), dd AS (SELECT DISTINCT e.user_id AS u, "
            "epoch_us(e.ts) // 86400000000 AS day, "
            + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
            + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
            "pr AS (SELECT a.u AS ua, b.u AS ub FROM dd a JOIN dd b "
            "ON a.day = b.day AND a.cell = b.cell AND a.u < b.u "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 3), "
            "sym AS (SELECT ua AS a, ub AS b FROM pr "
            "UNION SELECT ub, ua FROM pr), "
            "nodes AS (SELECT DISTINCT a AS d FROM sym), "
            "reach(d, n) AS (SELECT d, d FROM nodes "
            "UNION SELECT r.d, s.b FROM reach r JOIN sym s ON s.a = r.n) "
            "SELECT d AS user_id, MIN(n) AS group_id FROM reach GROUP BY d"
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
        "top_routes": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), pts AS (SELECT e.user_id AS u, e.ts AS ts, "
            "e.event_id AS seq, "
            + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
            + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
            "mv AS (SELECT u, LAG(cell) OVER (PARTITION BY u ORDER BY ts,"
            " seq) AS f, cell AS t FROM pts), "
            "c AS (SELECT f AS from_cell, t AS to_cell, "
            "CAST(COUNT(*) AS BIGINT) AS n_moves FROM mv "
            "WHERE f IS NOT NULL GROUP BY 1, 2), "
            f"r AS (SELECT from_cell, to_cell, n_moves, ROW_NUMBER() OVER "
            f"(ORDER BY n_moves DESC, from_cell * {(1 << TILE_RES) ** 2} + "
            "to_cell) AS rank FROM c) "
            "SELECT from_cell, to_cell, n_moves, CAST(rank AS BIGINT) AS "
            "\"rank\" FROM r WHERE rank <= 50"
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
        "max_dwell_run": _max_dwell_run_sql(
            derive.points_sql("events", "event_id", "event_id"), DWELL_RES
        ),
        "od_asymmetry": _od_asymmetry_sql(
            derive.points_sql("events", "event_id", "event_id"), MOTIF_RES
        ),
        "tile_motifs": _tile_motifs_sql(
            derive.points_sql("events", "event_id", "event_id"), MOTIF_RES, 50
        ),
        "od_matrix": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_cell_sql('q.px', 'q.py', TILE_RES)} AS cell
  FROM events e JOIN q USING (event_id)
),
d AS (
  SELECT LAG(cell) OVER w AS from_cell, cell AS to_cell
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_cell, to_cell, CAST(COUNT(*) AS BIGINT) AS n_moves
FROM d WHERE from_cell IS NOT NULL GROUP BY from_cell, to_cell
""",
        "cell_dwell": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_cell_sql('q.px', 'q.py', TILE_RES)} AS cell
  FROM events e JOIN q USING (event_id)
),
d AS (
  SELECT cell, ts, LEAD(ts) OVER w AS nts
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_visits,
       CAST(SUM(date_diff('microsecond', ts, nts)) AS BIGINT) AS dwell_us
FROM d WHERE nts IS NOT NULL GROUP BY cell
""",
        "event_transitions": """
WITH d AS (
  SELECT LAG(event_type) OVER w AS from_type, event_type AS to_type
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE from_type IS NOT NULL GROUP BY from_type, to_type
""",
        "morans_i": _morans_i_sql(p_cust, TILE_RES),
        "gearys_c": _gearys_c_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "local_morans": _local_morans_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "ripley_k": _ripley_k_sql(p_cust, RADIUS),
        "ripley_curve": _ripley_curve_sql(p_cust, 0.04, 8),
        "knox_stat": _knox_stat_sql(
            derive.points_sql(
                "(SELECT event_id FROM events WHERE event_id % 4 = 0)",
                "event_id",
            ),
            KNOX_R,
            KNOX_TAU_US,
        ),
        "getis_ord": _getis_ord_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "quadrat_test": _quadrat_test_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "raster_regions": _raster_regions_sql(
            "SELECT event_id, px * px AS px, py * py AS py FROM ("
            + derive.points_sql("events", "event_id", "event_id")
            + ")",
            TILE_RES,
            RASTER_MIN,
        ),
        "join_counts": _join_counts_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "clark_evans": _clark_evans_sql(p_cust),
        "nn_histogram": _nn_histogram_sql(p_cust),
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
        "std_ellipse": _std_ellipse_sql(
            derive.points_sql("events", "event_id", "event_id"), 12
        ),
        "contour_cases": _contour_cases_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES, 3
        ),
        "tile_focal_mean": _tile_focal_mean_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "lorenz_curve": _lorenz_curve_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "type_colocation": _type_colocation_sql(
            "SELECT e.event_type AS cls, q.px, q.py FROM events e JOIN ("
            + derive.points_sql("events", "event_id", "event_id")
            + ") q ON e.event_id = q.event_id",
            TILE_RES,
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
        "type_dow_chi2": (
            "WITH t AS (SELECT event_type, (epoch_us(ts) // 86400000000 + 4)"
            " % 7 AS dow FROM events), "
            "o AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM t GROUP BY 1, 2), "
            "r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS r FROM o "
            "GROUP BY 1), "
            "c AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS c FROM o GROUP BY 1), "
            "g AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM o) "
            "SELECT o.event_type, o.dow, o.n AS observed, "
            "CAST(r.r * c.c AS DOUBLE) / CAST(g.N AS DOUBLE) AS expected, "
            "CAST(o.n * g.N - r.r * c.c AS DOUBLE) * "
            "CAST(o.n * g.N - r.r * c.c AS DOUBLE) / CAST(g.N AS DOUBLE) "
            "/ CAST(r.r AS DOUBLE) / CAST(c.c AS DOUBLE) AS contrib "
            "FROM o JOIN r USING (event_type) JOIN c USING (dow), g"
        ),
        "monthly_revenue": (
            "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
            " AS revenue_cents FROM orders GROUP BY 1), "
            "l AS (SELECT month, revenue_cents, "
            "LAG(revenue_cents) OVER (ORDER BY month) AS prev_cents FROM m) "
            "SELECT CAST(month AS TIMESTAMP) AS month, revenue_cents, "
            "prev_cents, revenue_cents - prev_cents AS delta_cents "
            "FROM l WHERE prev_cents IS NOT NULL"
        ),
        "points_diameter": _points_diameter_sql(p_cust, TRACK_RES),
        "cents_mod_hist": (
            "WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)"
            " % 100 AS cents_mod FROM orders) "
            "SELECT cents_mod, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM c GROUP BY cents_mod"
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
        "region_monthly_revenue": (
            "SELECT r_name, CAST(date_trunc('month', o_orderdate) AS "
            "TIMESTAMP) AS month, CAST(SUM(CAST(FLOOR(o_totalprice * 100.0)"
            " AS BIGINT)) AS BIGINT) AS revenue_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "GROUP BY 1, 2"
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
        "boxes_union_area": _boxes_union_area_sql(b_orders),
        "user_first_last": _user_first_last_sql(),
        # iterative PageRank unrolled to K fixed CTE steps — pure
        # integer arithmetic at every stage (floor division mirrors the
        # engine's // exactly), so an ITERATIVE graph algorithm gets a
        # value-hash oracle instead of a rows-only check
        "tile_pagerank": _tile_pagerank_sql(),
        "tile_kcore": _tile_kcore_sql(),
        "tile_distance": _tile_distance_sql(),
        "value_welch_t": (
            "WITH e AS (SELECT event_type, "
            "CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events "
            "WHERE event_type IN ('purchase', 'view')), "
            "m AS (SELECT "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n1, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 "
            "END) AS BIGINT) AS s1, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN c * c ELSE "
            "0 END) AS BIGINT) AS q1, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n2, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN c ELSE 0 END) "
            "AS BIGINT) AS s2, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN c * c ELSE 0 "
            "END) AS BIGINT) AS q2 FROM e), "
            "d AS (SELECT n1, n2, "
            "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1, "
            "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2, "
            "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * "
            "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / "
            "CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS a, "
            "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * "
            "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / "
            "CAST(n2 - 1 AS DOUBLE) / CAST(n2 AS DOUBLE) AS b FROM m) "
            "SELECT n1, n2, m1 AS mean1, m2 AS mean2, "
            "(m1 - m2) / SQRT(a + b) AS t_stat, "
            "(a + b) * (a + b) / (a * a / CAST(n1 - 1 AS DOUBLE) + "
            "b * b / CAST(n2 - 1 AS DOUBLE)) AS df FROM d"
        ),
        "value_mwu": (
            "WITH e AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents,"
            " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp "
            "FROM events WHERE event_type IN ('purchase', 'click')), "
            "c AS (SELECT cents, CAST(SUM(isp) AS BIGINT) AS np, "
            "CAST(COUNT(*) AS BIGINT) AS nt FROM e GROUP BY cents), "
            "r AS (SELECT cents, np, nt, COALESCE(SUM(nt) OVER "
            "(ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS cb FROM c), "
            "s AS (SELECT CAST(SUM(np * (2 * cb + nt + 1)) AS BIGINT) AS"
            " r1x2, CAST(SUM(np) AS BIGINT) AS n1, "
            "CAST(SUM(nt - np) AS BIGINT) AS n2 FROM r) "
            "SELECT n1, n2, "
            "CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1x2, "
            "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u, "
            "(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 - "
            "CAST(n1 * n2 AS DOUBLE) / 2.0) / "
            "SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * "
            "CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) AS z FROM s"
        ),
        "acctbal_deciles": (
            "WITH r AS (SELECT c_nationkey, "
            "CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents, "
            "NTILE(10) OVER (PARTITION BY c_nationkey "
            "ORDER BY c_acctbal, c_custkey) AS d FROM customer) "
            "SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey, "
            "CAST(d AS BIGINT) AS decile, "
            "CAST(COUNT(*) AS BIGINT) AS n_customers, "
            "CAST(SUM(cents) AS BIGINT) AS acctbal_c "
            "FROM r GROUP BY 1, 2"
        ),
        "cube_revenue": (
            "SELECT o_orderpriority, "
            "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " AS revenue_c "
            "FROM orders GROUP BY ROLLUP(o_orderpriority, o_year)"
        ),
        "events_pivot": (
            "SELECT event_type, "
            + ", ".join(
                "CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) = "
                f"{d} THEN 1 ELSE 0 END) AS BIGINT) AS dow_{d}"
                for d in range(7)
            )
            + " FROM events GROUP BY event_type"
        ),
        # the lang set is the generator's closed alphabet; the entropy
        # chain is spelled term-by-term in sorted-lang order so the
        # double addition order is pinned (bitwise vs the engine's
        # driver-side libm chain)
        "source_lang_entropy": (
            "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS tot, "
            + ", ".join(
                f"CAST(SUM(CASE WHEN lang = '{L}' THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS n_{L}"
                for L in ("de", "en", "es", "fr", "zh")
            )
            + " FROM documents GROUP BY source), "
            "t AS (SELECT source, tot, "
            + ", ".join(
                f"CASE WHEN n_{L} = 0 THEN 0.0 ELSE 0.0 - "
                f"((CAST(n_{L} AS DOUBLE) / CAST(tot AS DOUBLE)) * "
                f"LN(CAST(n_{L} AS DOUBLE) / CAST(tot AS DOUBLE))) END "
                f"AS t_{L}"
                for L in ("de", "en", "es", "fr", "zh")
            )
            + " FROM c) "
            "SELECT source, tot AS n_docs, "
            "((((t_de + t_en) + t_es) + t_fr) + t_zh) AS entropy FROM t"
        ),
        "custkey_setops": (
            "WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders), "
            "e AS (SELECT DISTINCT user_id AS k FROM events) "
            "SELECT CASE "
            "WHEN o.k IS NOT NULL AND e.k IS NOT NULL THEN 'both' "
            "WHEN o.k IS NOT NULL THEN 'orders_only' "
            "WHEN e.k IS NOT NULL THEN 'events_only' "
            "ELSE 'neither' END AS category, "
            "CAST(COUNT(*) AS BIGINT) AS n_customers "
            "FROM customer LEFT JOIN o ON o.k = c_custkey "
            "LEFT JOIN e ON e.k = c_custkey GROUP BY 1"
        ),
        "nation_balance": (
            "WITH c AS (SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS"
            " nc FROM customer GROUP BY 1), "
            "s AS (SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS ns "
            "FROM supplier GROUP BY 1) "
            "SELECT n_name, COALESCE(c.nc, 0) AS n_customers, "
            "COALESCE(s.ns, 0) AS n_suppliers, "
            "CAST(COALESCE(c.nc, 0) AS DOUBLE) / "
            "CAST(COALESCE(s.ns, 0) AS DOUBLE) AS cust_per_supplier "
            "FROM nation LEFT JOIN c ON c.k = n_nationkey "
            "LEFT JOIN s ON s.k = n_nationkey "
            "WHERE c.nc IS NOT NULL OR s.ns IS NOT NULL"
        ),
        "trend_movers": (
            "WITH t AS ("
            + _cell_trend_sql(
                derive.points_sql("events", "event_id", "event_id"), TILE_RES
            )
            + "), r AS (SELECT cell, ABS(delta) AS abs_delta, "
            "ROW_NUMBER() OVER (ORDER BY ABS(delta) DESC, cell) AS rank "
            "FROM t) "
            "SELECT cell, abs_delta, CAST(rank AS BIGINT) AS \"rank\" "
            "FROM r WHERE rank <= 20"
        ),
        "type_run_hist": (
            "WITH r AS (SELECT user_id, event_type, ts, event_id, "
            "CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp FROM r), "
            "runs AS (SELECT CAST(COUNT(*) AS BIGINT) AS run_len FROM s "
            "GROUP BY user_id, grp) "
            "SELECT run_len, CAST(COUNT(*) AS BIGINT) AS n_runs "
            "FROM runs GROUP BY run_len"
        ),
        "user_top2_cells": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), c AS (SELECT e.user_id AS user_id, "
            + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
            + " AS cell, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events e JOIN q ON e.event_id = q.event_id GROUP BY 1, 2), "
            "r AS (SELECT user_id, cell, n, ROW_NUMBER() OVER (PARTITION BY "
            "user_id ORDER BY n DESC, cell) AS rn FROM c) "
            "SELECT a.user_id, a.cell AS cell_1, a.n AS n_1, "
            "b.cell AS cell_2, b.n AS n_2 "
            "FROM r a JOIN r b ON a.user_id = b.user_id "
            "AND a.rn = 1 AND b.rn = 2"
        ),
        "benford_hist": (
            "SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100.0) "
            "AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1"
        ),
        "user_max_drawdown": (
            "WITH d AS (SELECT user_id, ts, event_id, "
            "CASE WHEN event_type IN ('purchase', 'signup') "
            "THEN CAST(FLOOR(value * 100) AS BIGINT) "
            "ELSE -CAST(FLOOR(value * 100) AS BIGINT) END AS dc "
            "FROM events), "
            "p AS (SELECT user_id, ts, event_id, SUM(dc) OVER w AS cum "
            "FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)), "
            "m AS (SELECT user_id, MAX(cum) OVER w - cum AS dd FROM p "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)) "
            "SELECT user_id, CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents "
            "FROM m GROUP BY user_id"
        ),
        "gram_novelty": _gram_novelty_sql(2),
        "knn_hubness": f"""
WITH p AS ({p_cust}),
d AS (
  SELECT a.query_id, b.query_id AS nn_id,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id <> b.query_id
),
r AS (
  SELECT query_id, nn_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rn
  FROM d
),
deg AS (
  SELECT nn_id, CAST(COUNT(*) AS BIGINT) AS indegree
  FROM r WHERE rn = 1 GROUP BY nn_id
)
SELECT indegree, CAST(COUNT(*) AS BIGINT) AS n_points
FROM deg GROUP BY indegree
""",
        "covisit_triangles": (
            "WITH q AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), d AS (SELECT DISTINCT e.user_id AS u, "
            + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
            + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
            "e2 AS (SELECT a.cell AS ca, b.cell AS cb "
            "FROM d a JOIN d b ON a.u = b.u AND a.cell < b.cell "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 4), "
            "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM "
            "(SELECT ca AS c FROM e2 UNION SELECT cb FROM e2)), "
            "ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e2), "
            "tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM e2 xy JOIN e2 xz ON xz.ca = xy.ca AND xz.cb > xy.cb "
            "JOIN e2 yz ON yz.ca = xy.cb AND yz.cb = xz.cb) "
            "SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tr"
        ),
        "discount_revenue": (
            "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) "
            "* CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_e4, CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) "
            "BETWEEN 2 AND 6 AND l_quantity < 24.0"
        ),
        "nation_trade_pairs": (
            "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS year, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
            "AS BIGINT) AS revenue_e4 "
            "FROM lineitem "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation sn ON sn.n_nationkey = supplier.s_nationkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation cn ON cn.n_nationkey = customer.c_nationkey "
            "WHERE sn.n_nationkey <> cn.n_nationkey "
            "GROUP BY 1, 2, 3"
        ),
        "segment_order_dist": (
            "WITH c AS (SELECT c_mktsegment, c_custkey, "
            "CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
            "GROUP BY 1, 2) "
            "SELECT c_mktsegment, n_orders, "
            "CAST(COUNT(*) AS BIGINT) AS n_customers "
            "FROM c GROUP BY 1, 2"
        ),
        "small_qty_revenue": (
            "WITH l AS (SELECT l_partkey, "
            "CAST(FLOOR(l_quantity) AS BIGINT) AS q, "
            "CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents "
            "FROM lineitem WHERE l_partkey IN "
            "(SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')), "
            "s AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(q) AS BIGINT) AS sq FROM l GROUP BY 1) "
            "SELECT l.l_partkey AS p_partkey, "
            "CAST(SUM(cents) AS BIGINT) AS below_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_below "
            "FROM l JOIN s ON l.l_partkey = s.l_partkey "
            "WHERE 5 * n * q < sq GROUP BY 1"
        ),
        "large_orders": (
            "WITH s AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS total_qty FROM lineitem GROUP BY 1) "
            "SELECT o_orderkey, total_qty, o_custkey, "
            "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS price_cents "
            "FROM s JOIN orders ON o_orderkey = l_orderkey "
            "WHERE total_qty > 150"
        ),
        "promo_revenue": (
            "SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) "
            "AS month, "
            "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
            "CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) "
            "ELSE 0 END) AS BIGINT) AS promo_e4, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
            "AS BIGINT) AS total_e4 "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "GROUP BY 1"
        ),
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
        "adaptive_quadtree": _adaptive_quadtree_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES, 64
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
        "brand_revenue": (
            "WITH t AS (SELECT p_brand, CAST(SUM(CAST(FLOOR(l_extendedprice *"
            " (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS "
            "revenue_cents, CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY p_brand) "
            "SELECT p_brand, revenue_cents, n_items, "
            "CAST(ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, p_brand) "
            "AS BIGINT) AS \"rank\" FROM t"
        ),
        "tile_turnover": _tile_turnover_sql(
            "SELECT e.user_id AS user_id, e.ts AS ts, q.px, q.py "
            "FROM events e JOIN ("
            + derive.points_sql("events", "event_id", "event_id")
            + ") q ON e.event_id = q.event_id",
            TILE_QRES,
        ),
        "reorder_gap_quantiles": (
            "WITH g AS (SELECT CAST(0 AS BIGINT) AS k, "
            "(epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))"
            " // 86400000000 AS days FROM orders) "
            "SELECT k, quantile_cont(days, 0.5) AS p50, "
            "quantile_cont(days, 0.9) AS p90, "
            "quantile_cont(days, 0.99) AS p99 "
            "FROM g WHERE days IS NOT NULL GROUP BY k"
        ),
        "tile_density_rank": (
            "WITH p0 AS ("
            + derive.points_sql("events", "event_id", "event_id")
            + "), t AS (SELECT "
            + derive.tile_cell_sql("px", "py", TILE_RES)
            + " AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM p0 GROUP BY 1) "
            "SELECT cell, n, PERCENT_RANK() OVER (ORDER BY n) AS pct FROM t"
        ),
        "order_size_corr": (
            "WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS HUGEINT) AS x "
            "FROM lineitem GROUP BY l_orderkey), "
            "j AS (SELECT c.x AS x, CAST(CAST(FLOOR(o_totalprice * 100.0) "
            "AS BIGINT) AS HUGEINT) AS y FROM c JOIN orders "
            "ON o_orderkey = l_orderkey), "
            "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
            "CAST(SUM(x * y) AS HUGEINT) AS sxy, "
            "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
            "CAST(SUM(y * y) AS HUGEINT) AS syy FROM j) "
            "SELECT CAST(n AS BIGINT) AS n_orders, "
            "CAST(n * sxy - sx * sy AS DOUBLE) AS num, "
            "CAST(n * sxx - sx * sx AS DOUBLE) AS var_x, "
            "CAST(n * syy - sy * sy AS DOUBLE) AS var_y, "
            "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN "
            "CAST(n * sxy - sx * sy AS DOUBLE) / "
            "SQRT(CAST(n * sxx - sx * sx AS DOUBLE) * "
            "CAST(n * syy - sy * sy AS DOUBLE)) ELSE NULL END AS r FROM m"
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
        "weekly_active": (
            "WITH w AS (SELECT DISTINCT user_id, epoch_us(ts) // "
            "604800000000 AS week FROM events) "
            "SELECT week, CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM w GROUP BY week"
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
        "bivariate_moran": _bivariate_moran_sql(
            p_cust,
            derive.points_sql("events", "event_id", "event_id"),
            TILE_RES,
        ),
        "cross_k": _cross_k_sql(
            p_cust,
            derive.points_sql("events", "event_id", "event_id"),
            RADIUS,
        ),
        "semivariogram": _semivariogram_sql(
            "SELECT query_id, px, py, "
            + derive.point_measure_sql("query_id")
            + " AS pz FROM ("
            + p_cust
            + ")",
            0.05,
            8,
        ),
        "skyline": _skyline_sql(
            "SELECT query_id, px, CAST(1 AS DOUBLE) - py AS py FROM ("
            + p_cust
            + ")"
        ),
        "cell_trend": _cell_trend_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "cell_slope": _cell_slope_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "home_cells": _home_cells_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "radius_gyration": _radius_of_gyration_sql(
            derive.points_sql("events", "event_id", "event_id"), TRACK_RES
        ),
        "jump_histogram": _jump_histogram_sql(
            derive.points_sql("events", "event_id", "event_id"), TRACK_RES
        ),
        "track_diameter": _track_diameter_sql(
            derive.points_sql("events", "event_id", "event_id"), TRACK_RES
        ),
        "segment_tiles": _segment_tiles_sql(
            derive.points_sql("events", "event_id", "event_id"),
            TILE_RES,
            TRACK_RES,
        ),
        "turn_histogram": _turn_histogram_sql(
            derive.points_sql("events", "event_id", "event_id"), TRACK_RES
        ),
        "snap_points": _snap_to_segments_sql(
            derive.points_sql("events", "event_id", "event_id"),
            p_cust,
            SNAP_R,
            SNAP_MAXMOVE,
            SNAP_RES,
        ),
        "track_hausdorff": _trajectory_hausdorff_sql(
            derive.points_sql("events", "event_id", "event_id"),
            TRACK_SIM_START_RES,
            TRACK_SIM_RES,
        ),
        "heading_histogram": _heading_histogram_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "interval_union": _interval_union_len_sql(3_600_000_000),
        "cell_hours": _cell_hours_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        ),
        "speed_outliers": _speed_outliers_sql(
            derive.points_sql("events", "event_id", "event_id"), SPEED_KMH_T
        ),
        "mutual_nn": f"""
WITH p AS ({p_cust}),
d AS (
  SELECT a.query_id, b.query_id AS nn_id,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id <> b.query_id
),
r AS (
  SELECT query_id, nn_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rn
  FROM d
),
nn AS (SELECT query_id, nn_id FROM r WHERE rn = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN b.nn_id = a.query_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mutual,
       CAST(SUM(CASE WHEN b.nn_id = a.query_id THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS share
FROM nn a JOIN nn b ON b.query_id = a.nn_id
""",
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
        "nn_pairs": f"""
WITH p AS ({p_cust}),
d AS (
  SELECT a.query_id, b.query_id AS nn_id,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id <> b.query_id
),
r AS (
  SELECT query_id, nn_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rn
  FROM d
)
SELECT query_id, nn_id FROM r WHERE rn = 1
""",
        "grouped_moments": """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sum_c,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq_c,
       CAST(MIN(c) AS BIGINT) AS min_c, CAST(MAX(c) AS BIGINT) AS max_c
FROM c GROUP BY event_type
""",
        "value_histogram": """
WITH c AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR(value * 100) AS BIGINT) // 5000, 0), 9) AS bin
  FROM events
)
SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY event_type, bin
""",
        "part_supplier_counts": (
            "SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey "
            "WHERE p.p_brand <> 'Brand#13' "
            "AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34) "
            "GROUP BY 1, 2, 3"
        ),
        "bracket_revenue": (
            "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) "
            "* (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
            "AS BIGINT) AS revenue_e4, CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 "
            "AND l.l_quantity BETWEEN 1.0 AND 11.0) "
            "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 "
            "AND l.l_quantity BETWEEN 10.0 AND 20.0) "
            "OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 "
            "AND l.l_quantity BETWEEN 20.0 AND 30.0)"
        ),
        "sales_opportunity": (
            "WITH pos AS (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) "
            "AS BIGINT)) AS BIGINT) AS s, COUNT(*) AS n FROM customer "
            "WHERE c_acctbal > 0.0), "
            "have AS (SELECT DISTINCT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT') "
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS numcust, "
            "CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) "
            "AS totacctbal_cents "
            "FROM customer, pos "
            "WHERE CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) * pos.n > pos.s "
            "AND c_custkey NOT IN (SELECT o_custkey FROM have) "
            "GROUP BY 1"
        ),
        "returned_cust_revenue": (
            "WITH rev AS (SELECT o.o_custkey, "
            "CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) "
            "* (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT))) "
            "AS BIGINT) AS revenue_e4 "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1996-04-01' "
            "GROUP BY 1) "
            "SELECT c.c_custkey, c.c_name, r.revenue_e4, "
            "CAST(FLOOR(c.c_acctbal * 100.0) AS BIGINT) AS acctbal_cents, "
            "n.n_name, "
            "CAST(ROW_NUMBER() OVER (ORDER BY r.revenue_e4 DESC, "
            "c.c_custkey) AS BIGINT) AS rank "
            "FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "ORDER BY r.revenue_e4 DESC, c.c_custkey LIMIT 20"
        ),
        "top_supplier_qtr": (
            "WITH rev AS (SELECT l_suppkey, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) "
            "* (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
            "AS BIGINT) AS total_revenue_e4 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, r.total_revenue_e4 "
            "FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
            "WHERE r.total_revenue_e4 = "
            "(SELECT MAX(total_revenue_e4) FROM rev)"
        ),
        "nation_profit": (
            "SELECT n.n_name, "
            "CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS o_year, "
            "CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) "
            "* (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT)) "
            "- CAST(FLOOR(p.p_retailprice * 100.0) AS BIGINT) "
            "* CAST(l.l_quantity AS BIGINT) * 100) AS BIGINT) AS profit_e4, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "WHERE p.p_name LIKE '%blue%' "
            "GROUP BY 1, 2"
        ),
        "priority_fill_rate": (
            "WITH m AS (SELECT l_orderkey, MIN(epoch_us(l_shipdate)) AS ms "
            "FROM lineitem GROUP BY 1) "
            "SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(COUNT(*) FILTER (WHERE m.ms <= epoch_us(o.o_orderdate) "
            "+ 2592000000000) AS BIGINT) AS n_fast "
            "FROM orders o JOIN m ON m.l_orderkey = o.o_orderkey "
            "GROUP BY 1"
        ),
        "user_burstiness": (
            "WITH s AS (SELECT user_id, epoch_us(ts) // 1000000 AS tsec, "
            "event_id FROM events), "
            "d AS (SELECT user_id, tsec - LAG(tsec) OVER ("
            "PARTITION BY user_id ORDER BY tsec, event_id) AS d FROM s), "
            "m AS (SELECT user_id, CAST(COUNT(d) AS BIGINT) AS n_gaps, "
            "CAST(SUM(d) AS BIGINT) AS s1, CAST(SUM(d * d) AS BIGINT) AS s2 "
            "FROM d WHERE d IS NOT NULL GROUP BY user_id "
            "HAVING SUM(d) > 0) "
            "SELECT user_id, n_gaps, "
            "(SQRT(CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE) "
            "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
            "- CAST(s1 AS DOUBLE)) / "
            "(SQRT(CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE) "
            "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
            "+ CAST(s1 AS DOUBLE)) AS burstiness "
            "FROM m"
        ),
        "daily_cusum": (
            "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
            "k AS (SELECT COUNT(*) AS kk, SUM(n) AS t FROM c) "
            "SELECT day, n, CAST(SUM(n * k.kk - k.t) OVER ("
            "ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cusum_scaled FROM c, k"
        ),
        "market_share": (
            "WITH jo AS ("
            "SELECT EXTRACT(year FROM o.o_orderdate) AS yr, "
            "CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) "
            "* (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT)) "
            "AS rev, s.s_nationkey AS snat "
            "FROM lineitem l "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation cn ON cn.n_nationkey = c.c_nationkey "
            "JOIN region r ON r.r_regionkey = cn.n_regionkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "WHERE r.r_name = 'ASIA') "
            "SELECT CAST(yr AS BIGINT) AS o_year, "
            "CAST(SUM(CASE WHEN snat = 2 THEN rev ELSE 0 END) AS BIGINT) "
            "AS nation_rev_e4, "
            "CAST(SUM(rev) AS BIGINT) AS total_rev_e4, "
            "CAST(SUM(CASE WHEN snat = 2 THEN rev ELSE 0 END) AS DOUBLE) "
            "/ CAST(SUM(rev) AS DOUBLE) AS mkt_share "
            "FROM jo GROUP BY 1"
        ),
        "excess_parts": (
            "WITH ps AS ("
            "SELECT l.l_partkey AS pk, l.l_suppkey AS sk, "
            "SUM(CAST(l.l_quantity AS BIGINT)) AS q "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE p.p_name LIKE '%red%' GROUP BY 1, 2), "
            "pt AS (SELECT pk, SUM(q) AS tq, COUNT(*) AS ns "
            "FROM ps GROUP BY 1), "
            "w AS (SELECT ps.sk FROM ps JOIN pt USING (pk) "
            "WHERE 2 * ps.q * pt.ns > 3 * pt.tq) "
            "SELECT s.s_suppkey, s.s_name, "
            "CAST(COUNT(*) AS BIGINT) AS n_parts "
            "FROM w JOIN supplier s ON s.s_suppkey = w.sk "
            "GROUP BY 1, 2"
        ),
        "waiting_suppliers": (
            "WITH j AS ("
            "SELECT l.l_orderkey AS ok, l.l_suppkey AS sk, "
            "CASE WHEN epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) "
            "+ 5184000000000 THEN 1 ELSE 0 END AS late "
            "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey), "
            "p AS (SELECT ok, sk, MAX(late) AS late FROM j GROUP BY 1, 2), "
            "o2 AS (SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late, "
            "MAX(CASE WHEN late = 1 THEN sk END) AS late_sk "
            "FROM p GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM o2 JOIN supplier s ON s.s_suppkey = o2.late_sk "
            "WHERE n_supp >= 2 AND n_late = 1 "
            "GROUP BY 1, 2"
        ),
        "closest_pair": _closest_pair_sql(p_cust),
        # simhash / minhash_pairs / embedding_neardup / ann_lsh / kmeans:
        # algorithm-defined (hash-seeded / approximate / iterative)
        # outputs with no ANSI-SQL equivalent → rows-only check.
    }
