"""Vectorized closed-interval box geometry.

Semantics mirror the reference engine (python_prtree):

- Closed-interval intersection: boxes that merely touch (``a_max == b_min``)
  DO intersect (reference ``include/prtree/core/prtree.h:763-777``,
  ``intersects_exact``; pinned by ``tests/unit/test_query.py:268-285``).
- No epsilon slop: boxes with tiny gaps must NOT be reported
  (reference ``tests/e2e/test_regression.py:13``).
- A point query is a degenerate box with min == max
  (reference ``prtree.h:607-615,743-753``).

Everything here is NumPy-vectorized; nothing iterates Python rows.
Box layout everywhere in this engine: ``[xmin, ymin, xmax, ymax]``
(2D; the reference's ``[min_0..min_{D-1}, max_0..max_{D-1}]`` layout,
``prtree.h:198-201``).
"""

from __future__ import annotations

import numpy as np


def boxes_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise closed-interval intersection test of two (n, 2D) box arrays."""
    a = np.asarray(a)
    b = np.asarray(b)
    d = a.shape[1] // 2
    amin, amax = a[:, :d], a[:, d:]
    bmin, bmax = b[:, :d], b[:, d:]
    return np.all((amin <= bmax) & (bmin <= amax), axis=1)


def brute_force_pairs(qboxes: np.ndarray, boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """O(m*n) oracle: all (query_row, box_row) closed-interval intersections.

    Same role as the reference's brute-force test oracle
    (``tests/conftest.py:56-58``: ``has_intersect``). Used only in tests
    and for tiny partitions — never in the distributed hot path.
    """
    q = np.asarray(qboxes)
    b = np.asarray(boxes)
    d = q.shape[1] // 2
    hit = np.ones((q.shape[0], b.shape[0]), dtype=bool)
    for k in range(d):
        hit &= q[:, None, k] <= b[None, :, d + k]  # qmin <= bmax
        hit &= b[None, :, k] <= q[:, None, d + k]  # bmin <= qmax
    qi, bi = np.nonzero(hit)
    return qi, bi


def points_to_boxes(points: np.ndarray) -> np.ndarray:
    """Promote (n, D) points to degenerate (n, 2D) boxes (min == max)."""
    p = np.asarray(points)
    return np.concatenate([p, p], axis=1)


def intersection_min_corner(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min corner of the intersection region of row-aligned box arrays.

    For a genuinely intersecting pair this point lies inside both boxes and
    inside exactly ONE grid cell — the basis of the owner-cell dedup rule
    for matches discovered in multiple cells (engine design; replaces the
    reference's single-process ``i<j`` dedup at ``prtree.h:891-894``).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    d = a.shape[1] // 2
    return np.maximum(a[:, :d], b[:, :d])


def point_in_convex_polygon(
    px: np.ndarray, py: np.ndarray, verts: np.ndarray
) -> np.ndarray:
    """Closed containment test of points in ONE convex CCW polygon.

    ``verts``: (V, 2) CCW vertex ring. A point on an edge counts as inside
    (closed semantics, consistent with closed-interval boxes). Vectorized:
    all edges' cross products must be >= 0.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    v = np.asarray(verts, dtype=np.float64)
    x1, y1 = v[:, 0], v[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # cross[i, e] = (x2-x1)*(py-y1) - (y2-y1)*(px-x1)
    cross = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) - (y2 - y1)[None, :] * (
        px[:, None] - x1[None, :]
    )
    return np.all(cross >= 0.0, axis=1)


def point_in_polygon_raycast(
    px: np.ndarray, py: np.ndarray, verts: np.ndarray
) -> np.ndarray:
    """Even-odd ray-casting test for ONE simple (possibly concave) polygon.

    Vectorized over points. Boundary behavior follows the standard
    half-open crossing rule; use :func:`point_in_convex_polygon` when exact
    closed-edge semantics are required (it is the one the SQL oracle can
    reproduce exactly).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    v = np.asarray(verts, dtype=np.float64)
    x1, y1 = v[:, 0], v[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    inside = np.zeros(px.shape[0], dtype=bool)
    for e in range(v.shape[0]):
        cond = (y1[e] > py) != (y2[e] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (x2[e] - x1[e]) * (py - y1[e]) / (y2[e] - y1[e]) + x1[e]
        inside ^= cond & (px < xcross)
    return inside


def squared_centroid_distance(
    qx: np.ndarray, qy: np.ndarray, cx: np.ndarray, cy: np.ndarray
) -> np.ndarray:
    """(m, n) squared distances between query points and box centroids.

    Written as ``(qx-cx)*(qx-cx) + (qy-cy)*(qy-cy)`` — the exact
    expression shape the SQL oracle uses, so the doubles agree bitwise.
    """
    dx = qx[:, None] - cx[None, :]
    dy = qy[:, None] - cy[None, :]
    return dx * dx + dy * dy
