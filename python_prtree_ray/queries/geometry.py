"""geometry query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    KNOX_R,
    KNOX_TAU_US,
    RADIUS,
    TILE_RES,
    derive,
    pip,
    tables,
    tiling,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _bivariate_moran_sql,
    _clark_evans_sql,
    _contour_cases_sql,
    _cross_k_sql,
    _gearys_c_sql,
    _getis_ord_sql,
    _join_counts_sql,
    _knox_stat_sql,
    _local_morans_sql,
    _morans_i_sql,
    _pip_nonconvex_sql,
    _quadrat_test_sql,
    _ripley_curve_sql,
    _ripley_k_sql,
    _semivariogram_sql,
    _std_ellipse_sql,
    empty_space_f_sql_q,
    idw_grid_sql_q,
    kde_grid_sql_q,
    largest_empty_circle_sql_q,
    p_cust,
    pip_sql,
    zonal_stats_sql,
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



def q_largest_empty_circle(sf):
    # coverage-gap query: probe-grid node farthest from every data
    # point (grid-discretized largest empty circle); exact int
    # min-fold per node, driver argmax over the g^2 metadata table
    from python_prtree_ray.pipelines.interpolate import (
        largest_empty_circle,
    )

    return largest_empty_circle(tables.points_dataset(sf))



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



def q_clark_evans(sf):
    # Clark-Evans NN-distance CSR index (squared-distance variant):
    # exact scaled-int distance sum over the nn_pairs kNN path, one
    # fixed final double expression shared with the SQL twin
    from python_prtree_ray.pipelines.knn import clark_evans

    return clark_evans(tables.points_dataset(sf))



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


QUERIES = {
    "pip": q_pip,
    "pip_nonconvex": q_pip_nonconvex,
    "zonal_stats": q_zonal_stats,
    "idw_grid": q_idw_grid,
    "kde_grid": q_kde_grid,
    "empty_space_f": q_empty_space_f,
    "largest_empty_circle": q_largest_empty_circle,
    "morans_i": q_morans_i,
    "gearys_c": q_gearys_c,
    "local_morans": q_local_morans,
    "ripley_k": q_ripley_k,
    "ripley_curve": q_ripley_curve,
    "getis_ord": q_getis_ord,
    "quadrat_test": q_quadrat_test,
    "std_ellipse": q_std_ellipse,
    "contour_cases": q_contour_cases,
    "bivariate_moran": q_bivariate_moran,
    "cross_k": q_cross_k,
    "semivariogram": q_semivariogram,
    "join_counts": q_join_counts,
    "clark_evans": q_clark_evans,
    "knox_stat": q_knox,
}

SQL = {
    "pip": pip_sql,
    "pip_nonconvex": _pip_nonconvex_sql(p_cust),
    "zonal_stats": zonal_stats_sql,
    "idw_grid": idw_grid_sql_q,
    "kde_grid": kde_grid_sql_q,
    "empty_space_f": empty_space_f_sql_q,
    "largest_empty_circle": largest_empty_circle_sql_q,
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
    "join_counts": _join_counts_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "clark_evans": _clark_evans_sql(p_cust),
    "std_ellipse": _std_ellipse_sql(
        derive.points_sql("events", "event_id", "event_id"), 12
    ),
    "contour_cases": _contour_cases_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES, 3
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
}
