"""From-scratch hierarchical quadkey cell grid (H3/S2-style, pure NumPy).

The engine's spatial partitioning key AND a user-facing tiling operator
(the reference has no tiling; this implements the `north_rule`'s
"H3/S2-style cell-tiling assignments" from scratch — no h3/s2 libraries
exist in this environment and none are used).

Cell identity at resolution ``r`` over the unit square ``[0,1]²``:

    g  = 2**r                       (grid side)
    ix = clip(floor(x * g), 0, g-1)
    iy = clip(floor(y * g), 0, g-1)
    cell_id = ix * g + iy           (int64; row-major)

This formula is deliberately SQL-expressible — the DuckDB correctness
oracle computes the identical expression, so tile assignments compare
exactly. Hierarchy: the parent of ``(ix, iy)`` at ``r`` is
``(ix >> 1, iy >> 1)`` at ``r-1`` (quadtree refinement, the same
parent/child discipline as H3/S2 cell trees).

Determinism: pure integer math off IEEE-double inputs — identical across
runs, block orders, and parallelism levels (a `north_rule` requirement).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "cell_of_points",
    "cover_boxes",
    "parent_cell",
    "children_cells",
    "neighbor_cells",
    "cell_bounds",
]


def _grid_index(coord: np.ndarray, g: int) -> np.ndarray:
    i = np.floor(np.asarray(coord, dtype=np.float64) * g).astype(np.int64)
    return np.clip(i, 0, g - 1)


def cell_of_points(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Cell id of each point at resolution ``res``."""
    g = 1 << res
    return _grid_index(x, g) * g + _grid_index(y, g)


def cover_boxes(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """All cells each box overlaps (closed-interval: a box whose edge lies
    exactly on a cell boundary belongs to BOTH adjacent cells, so matches
    touching across the boundary are never lost).

    Returns ``(row, cell_id)`` pair arrays (CSR-style expansion, ready for
    a ``flat_map``-shaped batch transform). Fully vectorized via repeat.
    """
    g = 1 << res
    ix0 = _grid_index(xmin, g)
    ix1 = _grid_index(xmax, g)
    iy0 = _grid_index(ymin, g)
    iy1 = _grid_index(ymax, g)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
    # local rank within each box's cell block
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    ny_r = np.repeat(ny, counts)
    dx = offs // ny_r
    dy = offs - dx * ny_r
    cell = (np.repeat(ix0, counts) + dx) * g + (np.repeat(iy0, counts) + dy)
    return row, cell


def parent_cell(cell: np.ndarray, res: int) -> np.ndarray:
    """Parent cell id at resolution ``res - 1``."""
    g = 1 << res
    ix, iy = cell // g, cell % g
    return (ix >> 1) * (g >> 1) + (iy >> 1)


def children_cells(cell: np.ndarray, res: int) -> np.ndarray:
    """(n, 4) child cell ids at resolution ``res + 1``."""
    g = 1 << res
    g2 = g << 1
    ix, iy = (cell // g) << 1, (cell % g) << 1
    base = ix * g2 + iy
    return np.stack([base, base + 1, base + g2, base + g2 + 1], axis=1)


def neighbor_cells(cell: np.ndarray, res: int, ring: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Cells within Chebyshev distance ``ring`` (the cell itself included).

    Returns ``(row, cell_id)`` pairs; out-of-grid neighbors are dropped.
    Used by kNN ring expansion (the distributed analog of the reference
    insert's geometrically expanding candidate search, ``prtree.h:336-369``).
    """
    cell = np.asarray(cell, dtype=np.int64)
    g = 1 << res
    ix, iy = cell // g, cell % g
    d = np.arange(-ring, ring + 1, dtype=np.int64)
    ddx, ddy = np.meshgrid(d, d, indexing="ij")
    ddx, ddy = ddx.ravel(), ddy.ravel()
    nx = ix[:, None] + ddx[None, :]
    ny = iy[:, None] + ddy[None, :]
    ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
    row = np.repeat(np.arange(cell.shape[0], dtype=np.int64), ok.sum(axis=1))
    return row, (nx * g + ny)[ok]


def cell_bounds(cell: np.ndarray, res: int) -> np.ndarray:
    """(n, 4) [xmin, ymin, xmax, ymax] extent of each cell."""
    g = 1 << res
    w = 1.0 / g
    ix, iy = cell // g, cell % g
    x0 = ix.astype(np.float64) * w
    y0 = iy.astype(np.float64) * w
    return np.stack([x0, y0, x0 + w, y0 + w], axis=1)


# ------------------------------------------------------------ hex grid

HEX_SIZE = 1.0 / 24.0  # axial hex circumradius in unit-square coords
_SQRT3_3 = 0.5773502691896257  # sqrt(3)/3, embedded verbatim both sides
_THIRD = 1.0 / 3.0
_TWO_THIRDS = 2.0 / 3.0


def hex_of_points(
    x: np.ndarray, y: np.ndarray, size: float = HEX_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) hex-cell assignment — pointy-top hexagons of
    circumradius ``size``, the H3-style alternative to the square
    quadkey grid. Fractional axial coords are snapped with the
    standard CUBE ROUNDING rule (round each cube coordinate, then fix
    the one with the largest error so q+r+s == 0 stays exact).

    Determinism: rounding is ``floor(v + 0.5)`` on both engine and SQL
    (numpy ``round`` is half-to-even, DuckDB ``ROUND`` half-away — so
    neither is used); the sqrt(3)/3 constant is embedded verbatim, so
    every arithmetic step is the identical double expression.
    """
    qf = (_SQRT3_3 * x - _THIRD * y) / size
    rf = (_TWO_THIRDS * y) / size
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_cell_sql(x: str, y: str, size: float = HEX_SIZE) -> str:
    """DuckDB twin of :func:`hex_of_points`: one SELECT-able struct-
    free expression pair via a CTE fragment — returns SQL producing
    columns ``hq`` and ``hr`` from point columns ``x``/``y``. Meant to
    be spliced as ``SELECT {hex_cell_sql(...)} FROM ...``."""
    qf = f"(({_SQRT3_3!r} * {x} - {_THIRD!r} * {y}) / {size!r})"
    rf = f"(({_TWO_THIRDS!r} * {y}) / {size!r})"
    # cube coords: xf = qf, zf = rf, yf = -xf - zf
    xf, zf = qf, rf
    yf = f"(-{qf} - {rf})"
    rx = f"FLOOR({xf} + 0.5)"
    ry = f"FLOOR({yf} + 0.5)"
    rz = f"FLOOR({zf} + 0.5)"
    dx = f"ABS({rx} - {xf})"
    dy = f"ABS({ry} - {yf})"
    dz = f"ABS({rz} - {zf})"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    fix_z = f"(NOT {fix_x} AND {dz} > {dy})"
    hq = f"CAST(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    hr = (
        f"CAST(CASE WHEN {fix_z} THEN "
        f"-(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END) - {ry} "
        f"ELSE {rz} END AS BIGINT)"
    )
    return f"{hq} AS hq, {hr} AS hr"
