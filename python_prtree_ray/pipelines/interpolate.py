"""Inverse-distance-weighted (IDW) grid interpolation.

Estimates a surface value at every node of a regular g x g grid from the
point measures within a fixed radius — the classic raster-interpolation
step (reference scope: raster<->vector tile ops, ``SURVEY.md §2``; this
is the vector->raster value direction, complementing ``tiling.py``'s
count/extent direction).

Exactness design: IDW is a weighted mean, and float sums are
order-dependent — so both the weight and the weighted value are
QUANTIZED to int64 (w = floor(WSCALE / (EPS + d^2)), wv = w * v with v
an integer measure) before any distributed sum. Integer sums are exact
and associative at any parallelism; the final division of two exact
int64s happens once, node-local. The SQL oracle twin quantizes with the
bit-identical expression shapes (same literals, same evaluation order).

Scale shape: points never shuffle — each batch reduces its pair
contributions to at most one row per grid node (lexsort + reduceat),
then ONE coarse node-bucket shuffle folds the partials
(:func:`~.merge.bucketed_sum`). Node count is a parameter (g^2 rows of
metadata), never data-sized.

Overflow bound: sum(w*v) per node < n_points_in_radius * WSCALE/EPS *
V_MAX = n * 1e12 — exact to ~9e6 points per node; raise EPS or lower
WSCALE for denser inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions import derive
from ..stages import spatial as st
from .merge import bucketed_sum

GRES = 4  # 16 x 16 grid nodes
RADIUS = 0.08
EPS = 1e-3
WSCALE = 1e6
V_MAX = 1000  # point_measure range


def idw_grid(
    points: Dataset,
    gres: int = GRES,
    radius: float = RADIUS,
) -> Dataset:
    """(node, n_pts, sum_w, sum_wv, idw): IDW-interpolated surface at
    each occupied grid node from the derived integer point measure."""
    g = 1 << gres
    r2 = radius * radius
    # node coordinates, precomputed once (g^2 doubles — metadata-sized)
    gi = np.arange(g, dtype=np.float64)
    nx = (gi + 0.5) / float(g)  # exact: /16 is a power of two
    node_x = np.repeat(nx, g)
    node_y = np.tile(nx, g)
    node_id = np.arange(g * g, dtype=np.int64)

    def partial(tbl: pa.Table) -> pa.Table:
        qid = st.col_np(tbl, "query_id")
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        v = derive.point_measure(qid)
        # (nodes x batch) distance matrix — g^2 * B doubles, bounded by
        # the batch size knob, vectorized end to end
        dx = px[None, :] - node_x[:, None]
        dy = py[None, :] - node_y[:, None]
        d2 = dx * dx + dy * dy
        ni, pi = np.nonzero(d2 <= r2)
        if ni.size == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_w": pa.array([], pa.int64()),
                    "sum_wv": pa.array([], pa.int64()),
                }
            )
        w = np.floor(WSCALE / (EPS + d2[ni, pi])).astype(np.int64)
        wv = w * v[pi]
        # one row per node per batch: sorted-run reduceat combine
        order = np.argsort(ni, kind="stable")
        ns = ni[order]
        starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]][: ns.size])
        return pa.table(
            {
                "node": pa.array(node_id[ns[starts]]),
                "n": pa.array(
                    np.diff(np.r_[starts, ns.shape[0]]).astype(np.int64)
                ),
                "sum_w": pa.array(np.add.reduceat(w[order], starts)),
                "sum_wv": pa.array(np.add.reduceat(wv[order], starts)),
            }
        )

    # batch knob bounds the (g^2 x B) distance matrix: 256 x 4096 doubles
    # x ~4 temporaries ~= 33 MB peak per task
    partials = points.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    summed = bucketed_sum(
        partials, key_col="node", value_cols=("n", "sum_w", "sum_wv")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        w = tbl.column("sum_w").to_numpy(zero_copy_only=False)
        wv = tbl.column("sum_wv").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "idw", pa.array(wv.astype(np.float64) / w.astype(np.float64))
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def idw_grid_sql(points_cte: str, gres: int = GRES, radius: float = RADIUS) -> str:
    """DuckDB twin of :func:`idw_grid` — bit-identical quantization."""
    g = 1 << gres
    r2 = radius * radius
    return f"""
WITH p AS ({points_cte}),
     pv AS (SELECT px, py, {derive.point_measure_sql("query_id")} AS v FROM p),
     nodes AS (SELECT gi.i * {g} + gj.j AS node,
                      (CAST(gi.i AS DOUBLE) + 0.5) / {float(g)!r} AS nx,
                      (CAST(gj.j AS DOUBLE) + 0.5) / {float(g)!r} AS ny
               FROM range({g}) gi(i), range({g}) gj(j)),
     pairs AS (SELECT n.node AS node, pv.v AS v,
                      ((pv.px - n.nx) * (pv.px - n.nx)
                       + (pv.py - n.ny) * (pv.py - n.ny)) AS d2
               FROM nodes n, pv),
     hits AS (SELECT node, v,
                     CAST(FLOOR({WSCALE!r} / ({EPS!r} + d2)) AS BIGINT) AS w
              FROM pairs WHERE d2 <= {r2!r}),
     agg AS (SELECT node, COUNT(*) AS n,
                    CAST(SUM(w) AS BIGINT) AS sum_w,
                    CAST(SUM(w * v) AS BIGINT) AS sum_wv
             FROM hits GROUP BY node)
SELECT node, n, sum_w, sum_wv,
       CAST(sum_wv AS DOUBLE) / CAST(sum_w AS DOUBLE) AS idw
FROM agg
"""


# ------------------------------------------------------------------ KDE

KDE_RADIUS = 0.12
KDE_SCALE = 1e9  # kernel quantization: floor(k * 1e9) per contribution


def kde_grid(
    points: Dataset,
    gres: int = GRES,
    radius: float = KDE_RADIUS,
) -> Dataset:
    """Epanechnikov kernel density at every occupied node of a g x g
    grid: density_q = Σ floor((1 − d²/r²) · 1e9) over points within r.

    The Epanechnikov kernel is POLYNOMIAL (no exp/ln — those diverge in
    the last ulp between numpy and DuckDB libm), so the per-pair kernel
    value is bit-identical on both sides; quantizing it to int64 before
    the distributed sum makes the fold order-independent and exact at
    any parallelism. Same scale shape as :func:`idw_grid`: per-batch
    (node, batch) reduceat partials, ONE coarse node-bucket shuffle of
    int rows; the point set never shuffles.

    Overflow bound: Σ kq per node < n_points_in_radius × 1e9 — exact to
    ~9e9 points per node.
    """
    g = 1 << gres
    r2 = radius * radius
    gi = np.arange(g, dtype=np.float64)
    nx = (gi + 0.5) / float(g)
    node_x = np.repeat(nx, g)
    node_y = np.tile(nx, g)
    node_id = np.arange(g * g, dtype=np.int64)

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        dx = px[None, :] - node_x[:, None]
        dy = py[None, :] - node_y[:, None]
        d2 = dx * dx + dy * dy
        ni, pi = np.nonzero(d2 <= r2)
        if ni.size == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "density_q": pa.array([], pa.int64()),
                }
            )
        kq = np.floor((1.0 - d2[ni, pi] / r2) * KDE_SCALE).astype(np.int64)
        order = np.argsort(ni, kind="stable")
        ns = ni[order]
        starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]][: ns.size])
        return pa.table(
            {
                "node": pa.array(node_id[ns[starts]]),
                "n": pa.array(
                    np.diff(np.r_[starts, ns.shape[0]]).astype(np.int64)
                ),
                "density_q": pa.array(np.add.reduceat(kq[order], starts)),
            }
        )

    partials = points.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    summed = bucketed_sum(
        partials, key_col="node", value_cols=("n", "density_q")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        dq = tbl.column("density_q").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "kde", pa.array(dq.astype(np.float64) / KDE_SCALE)
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def kde_grid_sql(
    points_cte: str, gres: int = GRES, radius: float = KDE_RADIUS
) -> str:
    """DuckDB twin of :func:`kde_grid` — bit-identical quantization."""
    g = 1 << gres
    r2 = radius * radius
    return f"""
WITH p AS ({points_cte}),
     nodes AS (SELECT gi.i * {g} + gj.j AS node,
                      (CAST(gi.i AS DOUBLE) + 0.5) / {float(g)!r} AS nx,
                      (CAST(gj.j AS DOUBLE) + 0.5) / {float(g)!r} AS ny
               FROM range({g}) gi(i), range({g}) gj(j)),
     pairs AS (SELECT n.node AS node,
                      ((p.px - n.nx) * (p.px - n.nx)
                       + (p.py - n.ny) * (p.py - n.ny)) AS d2
               FROM nodes n, p),
     hits AS (SELECT node,
                     CAST(FLOOR((1.0 - d2 / {r2!r}) * {KDE_SCALE!r})
                          AS BIGINT) AS kq
              FROM pairs WHERE d2 <= {r2!r}),
     agg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(kq) AS BIGINT) AS density_q
             FROM hits GROUP BY node)
SELECT node, n, density_q,
       CAST(density_q AS DOUBLE) / {KDE_SCALE!r} AS kde
FROM agg
"""


# --------------------------------------------------------- F-function

F_SCALE = 1e12  # d² quantization for the nearest-distance fold
F_RADII = (0.01, 0.02, 0.04, 0.08, 0.16, 0.32)


def _nearest_probe_fold(points: Dataset, gres: int) -> Dataset:
    """(node, dq) for every g×g probe-grid node: min over int64-
    quantized squared distances to the point set (floor is monotone,
    so the distributed min is exact). Each batch emits ≤ g² partial
    rows; ONE coarse node-bucket min-fold; points never shuffle."""
    g = 1 << gres
    gi = np.arange(g, dtype=np.float64)
    nx = (gi + 0.5) / float(g)
    node_x = np.repeat(nx, g)
    node_y = np.tile(nx, g)
    node_id = np.arange(g * g, dtype=np.int64)

    def partial(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        if px.size == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "dq": pa.array([], pa.int64()),
                }
            )
        dx = px[None, :] - node_x[:, None]
        dy = py[None, :] - node_y[:, None]
        d2min = (dx * dx + dy * dy).min(axis=1)
        return pa.table(
            {
                "node": pa.array(node_id),
                "dq": pa.array(np.floor(d2min * F_SCALE).astype(np.int64)),
            }
        )

    partials = points.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return bucketed_sum(
        partials, key_col="node", value_cols=("dq",), reduce="min"
    )


def empty_space_f(
    points: Dataset,
    gres: int = GRES,
    radii: tuple[float, ...] = F_RADII,
) -> Dataset:
    """Empty-space (F) function: share of g×g probe-grid nodes whose
    nearest data point lies within r, for each fixed radius r — the
    complement of the nearest-neighbour G statistic (probes are *empty
    space*, not events).

    Exactness: the per-node nearest distance is folded as min over
    QUANTIZED squared distances dq = floor(d² · 1e12); floor is
    monotone, so min(floor(x)) == floor(min(x)) and the distributed min
    is exact and order-independent. The radius test compares dq against
    the pre-quantized int threshold floor(r² · 1e12) — the identical
    BIGINT rule on the SQL side. Points never shuffle: each batch emits
    ≤ g² (node, dq) partial-min rows, ONE coarse node-bucket min-fold,
    then the g²-row node table reduces to len(radii) rows on the driver.
    """
    g = 1 << gres
    thresholds = [int(np.floor(r * r * F_SCALE)) for r in radii]
    nearest = _nearest_probe_fold(points, gres)

    import ray

    rows = nearest.take_all()
    dq = np.array([r["dq"] for r in rows], np.int64)
    n_nodes = np.array(
        [int((dq <= t).sum()) for t in thresholds], np.int64
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "r_idx": pa.array(
                    np.arange(len(radii), dtype=np.int64), pa.int64()
                ),
                "n_nodes": pa.array(n_nodes, pa.int64()),
                "f_share": pa.array(
                    n_nodes.astype(np.float64) / float(g * g), pa.float64()
                ),
            }
        )
    )


def empty_space_f_sql(
    points_cte: str, gres: int = GRES, radii: tuple[float, ...] = F_RADII
) -> str:
    """DuckDB twin of :func:`empty_space_f` — identical BIGINT rule."""
    g = 1 << gres
    thresholds = [int(np.floor(r * r * F_SCALE)) for r in radii]
    thr_rows = ", ".join(f"({i}, {t})" for i, t in enumerate(thresholds))
    return f"""
WITH p AS ({points_cte}),
     nodes AS (SELECT gi.i * {g} + gj.j AS node,
                      (CAST(gi.i AS DOUBLE) + 0.5) / {float(g)!r} AS nx,
                      (CAST(gj.j AS DOUBLE) + 0.5) / {float(g)!r} AS ny
               FROM range({g}) gi(i), range({g}) gj(j)),
     nearest AS (SELECT n.node,
                        MIN(CAST(FLOOR(((p.px - n.nx) * (p.px - n.nx)
                             + (p.py - n.ny) * (p.py - n.ny))
                            * {F_SCALE!r}) AS BIGINT)) AS dq
                 FROM nodes n, p GROUP BY n.node),
     thr(r_idx, t) AS (VALUES {thr_rows})
SELECT CAST(thr.r_idx AS BIGINT) AS r_idx,
       CAST(COUNT(*) FILTER (WHERE nearest.dq <= thr.t) AS BIGINT)
         AS n_nodes,
       CAST(COUNT(*) FILTER (WHERE nearest.dq <= thr.t) AS DOUBLE)
         / {float(g * g)!r} AS f_share
FROM nearest, thr GROUP BY thr.r_idx
"""


# ------------------------------------------------ largest empty circle


def largest_empty_circle(points: Dataset, gres: int = GRES) -> Dataset:
    """Largest-empty-circle (grid-probe approximation): the probe-grid
    node FARTHEST from every data point — the classic facility /
    coverage-gap query, discretized to the same g×g probe lattice as
    the F-function. ONE row ``(node, dq, dist)``.

    Exactness: shares :func:`_nearest_probe_fold` (per-node nearest
    distance as an exact int min over floor(d²·1e12)); the argmax over
    the g² node table is a driver fold with deterministic ties
    (largest dq, then smallest node). ``dist = SQRT(dq / 1e12)`` —
    sqrt and division are correctly rounded IEEE, identical to the
    SQL twin's expression.
    """
    import ray

    rows = _nearest_probe_fold(points, gres).take_all()
    best = max(rows, key=lambda r: (int(r["dq"]), -int(r["node"])))
    dq = int(best["dq"])
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([int(best["node"])], pa.int64()),
                "dq": pa.array([dq], pa.int64()),
                "dist": pa.array(
                    [float(np.sqrt(dq / F_SCALE))], pa.float64()
                ),
            }
        )
    )


def largest_empty_circle_sql(points_cte: str, gres: int = GRES) -> str:
    """DuckDB twin of :func:`largest_empty_circle`."""
    g = 1 << gres
    return f"""
WITH p AS ({points_cte}),
     nodes AS (SELECT gi.i * {g} + gj.j AS node,
                      (CAST(gi.i AS DOUBLE) + 0.5) / {float(g)!r} AS nx,
                      (CAST(gj.j AS DOUBLE) + 0.5) / {float(g)!r} AS ny
               FROM range({g}) gi(i), range({g}) gj(j)),
     nearest AS (SELECT n.node,
                        MIN(CAST(FLOOR(((p.px - n.nx) * (p.px - n.nx)
                             + (p.py - n.ny) * (p.py - n.ny))
                            * {F_SCALE!r}) AS BIGINT)) AS dq
                 FROM nodes n, p GROUP BY n.node)
SELECT node, dq, SQRT(dq / {F_SCALE!r}) AS dist
FROM nearest ORDER BY dq DESC, node LIMIT 1
"""
