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
        starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]])
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
