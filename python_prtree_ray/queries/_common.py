"""Shared constants + helpers for the query-family modules (split
from ``__ray_entry__`` in round 5; see that module's docstring for
the driver contract).  Citations to /root/reference are unchanged.
"""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.sources import tables  # noqa: F401
from python_prtree_ray.pipelines import (  # noqa: F401
    ann,
    dedup,
    knn,
    pip,
    spatial_join as sj,
    text,
    tiling,
    windows,
)


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
