"""Point-in-polygon: broadcast small polygon set, test points per batch.

The polygon side is small (typical: admin boundaries, zones) → broadcast
once via ``ray.put`` and read inside every ``map_batches`` task — NO
shuffle. Each batch runs a vectorized bbox prefilter (the PR-tree-style
candidate cut) followed by the exact convex half-plane test
(:func:`..functions.geom.point_in_convex_polygon`), whose expression
shape the SQL oracle reproduces bitwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions import derive, geom
from ..stages import spatial as st


def pip_join(
    points: Dataset,
    polygons: list[tuple[int, np.ndarray]] | None = None,
) -> Dataset:
    """(query_id, poly_id) for every point inside a convex polygon.

    ``polygons``: list of (poly_id, (V,2) CCW vertex array); defaults to
    the engine's deterministic fixture set (derive.POLYGONS).
    """
    polys = polygons if polygons is not None else derive.polygon_arrays()
    # precompute bboxes for the prefilter
    packed = [
        (pid, v, v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max())
        for pid, v in polys
    ]
    polys_ref = ray.put(packed)

    def test_batch(tbl: pa.Table) -> pa.Table:
        plist = ray.get(polys_ref)
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        qid = st.col_np(tbl, "query_id")
        out_q: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        for pid, verts, x0, y0, x1, y1 in plist:
            cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not cand.any():
                continue
            sel = np.nonzero(cand)[0]
            inside = geom.point_in_convex_polygon(px[sel], py[sel], verts)
            hit = sel[inside]
            out_q.append(qid[hit])
            out_p.append(np.full(hit.shape[0], pid, dtype=np.int64))
        if not out_q:
            return pa.table(
                {"query_id": np.empty(0, np.int64), "poly_id": np.empty(0, np.int64)}
            )
        return pa.table(
            {"query_id": np.concatenate(out_q), "poly_id": np.concatenate(out_p)}
        )

    return points.map_batches(test_batch, batch_format="pyarrow", zero_copy_batch=True)


def zonal_stats(
    points: Dataset,
    polygons: list[tuple[int, np.ndarray]] | None = None,
) -> Dataset:
    """Per-polygon (zone) aggregates of the points it contains:
    ``(poly_id, n_points, sum_qid, min_px, min_py, max_px, max_py)``.

    Scale shape: the polygon set broadcasts (zero shuffle), each batch
    pre-aggregates to AT MOST one row per polygon (map-side combine), and
    the global ``groupby(poly_id)`` shuffles only those tiny partials —
    O(batches x polygons) rows at any point count. Sums are over the
    int64 id (order-independent, exact); the float extrema are min/max
    (also order-independent), never a float sum."""
    from ray.data.aggregate import Max, Min, Sum

    polys = polygons if polygons is not None else derive.polygon_arrays()
    packed = [
        (pid, v, v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max())
        for pid, v in polys
    ]
    polys_ref = ray.put(packed)

    def partial(tbl: pa.Table) -> pa.Table:
        plist = ray.get(polys_ref)
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        qid = st.col_np(tbl, "query_id")
        rows: dict[str, list] = {
            "poly_id": [], "n": [], "sum_qid": [],
            "min_px": [], "min_py": [], "max_px": [], "max_py": [],
        }
        for pid, verts, x0, y0, x1, y1 in plist:
            cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not cand.any():
                continue
            sel = np.nonzero(cand)[0]
            inside = geom.point_in_convex_polygon(px[sel], py[sel], verts)
            hit = sel[inside]
            if not hit.size:
                continue
            rows["poly_id"].append(pid)
            rows["n"].append(hit.shape[0])
            rows["sum_qid"].append(int(qid[hit].sum()))
            rows["min_px"].append(px[hit].min())
            rows["min_py"].append(py[hit].min())
            rows["max_px"].append(px[hit].max())
            rows["max_py"].append(py[hit].max())
        return pa.table(
            {
                "poly_id": pa.array(rows["poly_id"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "sum_qid": pa.array(rows["sum_qid"], pa.int64()),
                "min_px": pa.array(rows["min_px"], pa.float64()),
                "min_py": pa.array(rows["min_py"], pa.float64()),
                "max_px": pa.array(rows["max_px"], pa.float64()),
                "max_py": pa.array(rows["max_py"], pa.float64()),
            }
        )

    partials = points.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("poly_id").aggregate(
        Sum("n", alias_name="n_points"),
        Sum("sum_qid", alias_name="sum_qid"),
        Min("min_px", alias_name="min_px"),
        Min("min_py", alias_name="min_py"),
        Max("max_px", alias_name="max_px"),
        Max("max_py", alias_name="max_py"),
    )


def pip_nonconvex(
    points: Dataset,
    polygons: list[tuple[int, np.ndarray]] | None = None,
) -> Dataset:
    """(query_id, poly_id) for every point strictly inside a polygon of
    ARBITRARY shape (crossing-number / even-odd rule) — the non-convex
    companion of :func:`pip_join` for star/L/donut-shaped zones the
    half-plane test cannot express. Defaults to the engine's concave
    star fixture (derive.CONCAVE_POLYGONS).

    Exactness: an edge (x1,y1)→(x2,y2) crosses the rightward ray from
    (px,py) iff ``(y1 > py) != (y2 > py)`` and
    ``px < x1 + (py − y1)·(x2 − x1)/(y2 − y1)`` — the identical double
    expression tree on both engine and SQL sides (horizontal edges
    fail the first test before the division can differ: numpy inf vs
    DuckDB NULL both exclude). Inside = odd crossing count.

    Scale shape: identical to :func:`pip_join` — polygons broadcast
    once via ``ray.put``, per-batch bbox prefilter then a vectorized
    per-edge sweep (edges are a polygon constant, points are the
    vector axis); points never shuffle.
    """
    polys = polygons if polygons is not None else derive.concave_polygon_arrays()
    packed = [
        (pid, v, v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max())
        for pid, v in polys
    ]
    polys_ref = ray.put(packed)

    def test_batch(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        qid = st.col_np(tbl, "query_id")
        out_q, out_p = [], []
        for pid, verts, bx0, by0, bx1, by1 in ray.get(polys_ref):
            sel = (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
            if not sel.any():
                continue
            x, y = px[sel], py[sel]
            cross = np.zeros(x.shape[0], np.int64)
            n = verts.shape[0]
            with np.errstate(divide="ignore", invalid="ignore"):
                for i in range(n):
                    x1, y1 = verts[i]
                    x2, y2 = verts[(i + 1) % n]
                    cond = (y1 > y) != (y2 > y)
                    xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                    cross += (cond & (x < xint)).astype(np.int64)
            inside = (cross % 2) == 1
            out_q.append(qid[sel][inside])
            out_p.append(np.full(int(inside.sum()), pid, np.int64))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "poly_id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "poly_id": np.concatenate(out_p),
            }
        )

    return points.map_batches(
        test_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )


def pip_nonconvex_sql(points_cte: str) -> str:
    """DuckDB twin of :func:`pip_nonconvex` — identical crossing test
    per edge, COUNT(*) parity filter."""
    edges = derive.polygon_edges_sql(derive.CONCAVE_POLYGONS)
    return f"""
WITH p AS ({points_cte}),
e AS (SELECT * FROM {edges})
SELECT p.query_id, e.poly_id
FROM p JOIN e
ON ((e.y1 > p.py) <> (e.y2 > p.py))
   AND p.px < e.x1 + (p.py - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1)
GROUP BY 1, 2 HAVING COUNT(*) % 2 = 1
"""
