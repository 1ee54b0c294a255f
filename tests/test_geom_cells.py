"""Geometry + cell-grid kernels: covers, hierarchy, PIP, validation."""

from __future__ import annotations

import numpy as np
import pytest

from python_prtree_ray.functions import cells, derive, geom, validate

from .conftest import random_boxes


def test_cover_boxes_exhaustive():
    rng = np.random.default_rng(0)
    b = random_boxes(rng, 200, edge=0.3)
    res = 4
    g = 1 << res
    row, cell = cells.cover_boxes(b[:, 0], b[:, 1], b[:, 2], b[:, 3], res)
    got = {}
    for r, c in zip(row.tolist(), cell.tolist()):
        got.setdefault(r, set()).add(c)
    # oracle: test every cell's bounds against the box (closed interval)
    bounds = cells.cell_bounds(np.arange(g * g, dtype=np.int64), res)
    for i in range(200):
        want = set()
        for c in range(g * g):
            x0, y0, x1, y1 = bounds[c]
            if b[i, 0] <= x1 and x0 <= b[i, 2] and b[i, 1] <= y1 and y0 <= b[i, 3]:
                want.add(c)
        # cover_boxes covers by grid-index ranges: boundary-touching cells
        # on the high side are included via closed-interval clip semantics
        assert got[i] <= want
        # and every cell the box STRICTLY overlaps must be present
        strict = set()
        for c in range(g * g):
            x0, y0, x1, y1 = bounds[c]
            if b[i, 0] < x1 and x0 < b[i, 2] and b[i, 1] < y1 and y0 < b[i, 3]:
                strict.add(c)
        assert strict <= got[i]


def test_cover_matches_point_cell():
    rng = np.random.default_rng(1)
    p = rng.random((500, 2))
    res = 6
    c1 = cells.cell_of_points(p[:, 0], p[:, 1], res)
    row, c2 = cells.cover_boxes(p[:, 0], p[:, 1], p[:, 0], p[:, 1], res)
    assert row.tolist() == list(range(500))
    assert np.array_equal(c1, c2)


def test_parent_child_roundtrip():
    res = 5
    g = 1 << res
    all_cells = np.arange(g * g, dtype=np.int64)
    ch = cells.children_cells(all_cells, res)
    for k in range(4):
        assert np.array_equal(cells.parent_cell(ch[:, k], res + 1), all_cells)


def test_neighbor_cells_interior_and_edge():
    res = 3
    g = 1 << res
    # interior cell: 9 neighbors; corner cell: 4
    mid = np.array([(g // 2) * g + g // 2], dtype=np.int64)
    row, nb = cells.neighbor_cells(mid, res, ring=1)
    assert nb.shape[0] == 9
    corner = np.array([0], dtype=np.int64)
    row, nb = cells.neighbor_cells(corner, res, ring=1)
    assert nb.shape[0] == 4


def test_pairs_found_across_cell_boundary_dedup_by_owner():
    # two touching boxes straddling a cell boundary must be matched exactly
    # once after owner-cell dedup
    res = 2  # cells of width 0.25
    boxes = np.array(
        [[0.2, 0.1, 0.25, 0.2], [0.25, 0.1, 0.3, 0.2]]  # touch at x=0.25 (cell edge)
    )
    row, cell = cells.cover_boxes(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], res)
    # box 0 covers cells x-index 0 and 1 (closed interval), box 1 covers 1
    mc = geom.intersection_min_corner(boxes[0:1], boxes[1:2])
    owner = cells.cell_of_points(mc[:, 0], mc[:, 1], res)
    both = [set(cell[row == i].tolist()) for i in range(2)]
    shared = both[0] & both[1]
    assert owner[0] in shared  # owner rule picks exactly one shared cell
    assert len(shared) >= 1


def test_point_in_convex_polygon():
    _, verts = derive.POLYGONS[0]
    v = np.array(verts)
    cx, cy = v[:, 0].mean(), v[:, 1].mean()
    inside = geom.point_in_convex_polygon(np.array([cx]), np.array([cy]), v)
    assert inside[0]
    outside = geom.point_in_convex_polygon(np.array([cx + 1.0]), np.array([cy]), v)
    assert not outside[0]
    # vertex itself is inside (closed semantics)
    onv = geom.point_in_convex_polygon(v[:1, 0], v[:1, 1], v)
    assert onv[0]


def test_raycast_agrees_with_convex_on_interior_points():
    rng = np.random.default_rng(2)
    _, verts = derive.POLYGONS[3]
    v = np.array(verts)
    px = rng.random(2000)
    py = rng.random(2000)
    a = geom.point_in_convex_polygon(px, py, v)
    b = geom.point_in_polygon_raycast(px, py, v)
    assert (a == b).mean() > 0.999  # boundary-rule differences only


def test_validate_rejects_bad_boxes():
    with pytest.raises(ValueError, match="NaN"):
        validate.validate_boxes(np.array([[0.0, 0.0, np.nan, 1.0]]))
    with pytest.raises(ValueError, match="Inf"):
        validate.validate_boxes(np.array([[0.0, 0.0, np.inf, 1.0]]))
    with pytest.raises(ValueError, match="min"):
        validate.validate_boxes(np.array([[0.5, 0.0, 0.1, 1.0]]))
    with pytest.raises(ValueError, match="Subnormal"):
        validate.validate_boxes(np.array([[0.0, 0.0, 1e-320, 1.0]]))
    cfg = validate.PrecisionConfig(subnormal_detection=False)
    validate.validate_boxes(np.array([[0.0, 0.0, 1e-320, 1.0]]), cfg)  # ok


def test_adaptive_epsilon_clamps():
    cfg = validate.PrecisionConfig()
    eps = cfg.epsilon_for(1.0)
    assert 10 * np.finfo(np.float64).eps <= eps <= 0.01
    big = cfg.epsilon_for(1e12)
    assert big <= 0.01 * 1e12


def test_hex_of_points_nearest_center():
    # cube rounding must assign each point to the NEAREST hex center
    # (pointy-top axial, circumradius HEX_SIZE)
    import numpy as np
    from python_prtree_ray.functions.cells import HEX_SIZE, hex_of_points

    rng = np.random.default_rng(17)
    x = rng.random(3000)
    y = rng.random(3000)
    q, r = hex_of_points(x, y)

    def center(qq, rr):
        # inverse of the axial transform: x = s*sqrt(3)*(q + r/2), y = s*3/2*r
        s = HEX_SIZE
        return s * np.sqrt(3.0) * (qq + rr / 2.0), s * 1.5 * rr

    cx, cy = center(q.astype(float), r.astype(float))
    d_own = (x - cx) ** 2 + (y - cy) ** 2
    # against all neighbors in a 2-ring (covers every rounding case)
    for dq in range(-2, 3):
        for dr in range(-2, 3):
            if dq == 0 and dr == 0:
                continue
            nx, ny = center((q + dq).astype(float), (r + dr).astype(float))
            d_n = (x - nx) ** 2 + (y - ny) ** 2
            assert (d_own <= d_n + 1e-12).all()
