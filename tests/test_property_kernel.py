"""Property-based kernel tests (hypothesis): the packed PR-tree must
agree with the brute-force oracle on ADVERSARIAL inputs — degenerate
zero-extent boxes, exactly-touching edges, duplicated coordinates, huge
aspect ratios — across dims and dtypes. Pure kernel, no Ray session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from python_prtree_ray.functions.geom import brute_force_pairs
from python_prtree_ray.functions.prtree import PRTree


def _boxes_from_draw(draw_vals: list[float], n: int, dim: int, degenerate_every: int):
    """Fold a flat float draw into (n, 2*dim) boxes; every
    ``degenerate_every``-th box is zero-extent (a point)."""
    a = np.array(draw_vals, dtype=np.float64).reshape(n, 2 * dim)
    lo = np.minimum(a[:, :dim], a[:, dim:])
    hi = np.maximum(a[:, :dim], a[:, dim:])
    if degenerate_every:
        sel = np.arange(n) % degenerate_every == 0
        hi[sel] = lo[sel]  # zero-extent boxes
    return np.concatenate([lo, hi], axis=1)


coords = st.floats(
    min_value=0.0, max_value=1.0, allow_nan=False, allow_infinity=False, width=64
)


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=120),
    m=st.integers(min_value=1, max_value=40),
    dim=st.sampled_from([2, 3, 4]),
    degenerate_every=st.sampled_from([0, 2, 3]),
    dup_first=st.booleans(),
)
def test_kernel_matches_brute_force_on_adversarial_boxes(
    data, n, m, dim, degenerate_every, dup_first
):
    bvals = data.draw(
        st.lists(coords, min_size=n * 2 * dim, max_size=n * 2 * dim), label="boxes"
    )
    qvals = data.draw(
        st.lists(coords, min_size=m * 2 * dim, max_size=m * 2 * dim), label="queries"
    )
    boxes = _boxes_from_draw(bvals, n, dim, degenerate_every)
    if dup_first and n > 1:
        boxes[1] = boxes[0]  # exact duplicate box, distinct id
    qs = _boxes_from_draw(qvals, m, dim, 0)
    idx = np.arange(n, dtype=np.int64) * 3 - 5
    tree = PRTree(idx, boxes)
    qi, bi = tree.batch_query_pairs(qs)
    got = set(zip(qi.tolist(), bi.tolist()))
    oq, ob = brute_force_pairs(qs, boxes)
    want = set(zip(oq.tolist(), idx[ob].tolist()))
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=2, max_value=60),
)
def test_kernel_touching_edges_always_hit(data, n):
    # closed-interval contract: boxes sharing only an edge/corner DO match
    xs = data.draw(
        st.lists(coords, min_size=n, max_size=n, unique=True), label="xs"
    )
    xs = np.sort(np.array(xs, dtype=np.float64))
    # chain of boxes [x_i, x_{i+1}] stacked on y=[0,1]: consecutive boxes
    # touch exactly at x_{i+1}
    lo = xs[:-1]
    hi = xs[1:]
    boxes = np.stack([lo, np.zeros(n - 1), hi, np.ones(n - 1)], axis=1)
    idx = np.arange(n - 1, dtype=np.int64)
    tree = PRTree(idx, boxes)
    qi, bi = tree.batch_query_pairs(boxes)
    got = set(zip(qi.tolist(), bi.tolist()))
    for i in range(n - 2):
        assert (i, i + 1) in got and (i + 1, i) in got  # touching edge hits


@given(st.data(), st.integers(min_value=1, max_value=400))
@settings(max_examples=30, deadline=None)
def test_cover_boxes_contains_point_cells(data, n):
    # any point inside a box maps to a cell that the box's cover includes
    from python_prtree_ray.functions.cells import cell_of_points, cover_boxes

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    res = data.draw(st.integers(min_value=1, max_value=8))
    x0 = rng.random(n)
    y0 = rng.random(n)
    w = rng.random(n) * 0.2
    h = rng.random(n) * 0.2
    x1, y1 = np.minimum(x0 + w, 1.0), np.minimum(y0 + h, 1.0)
    row, cell = cover_boxes(x0, y0, x1, y1, res)
    cover = {}
    for r, c in zip(row, cell):
        cover.setdefault(int(r), set()).add(int(c))
    # sample interior points per box
    t = rng.random((n, 2))
    px = x0 + t[:, 0] * (x1 - x0)
    py = y0 + t[:, 1] * (y1 - y0)
    pc_ = cell_of_points(px, py, res)
    for i in range(n):
        assert int(pc_[i]) in cover[i]


@given(st.integers(min_value=1, max_value=10), st.integers(0, 2**31))
@settings(max_examples=20, deadline=None)
def test_hilbert_curve_is_bijective_neighbor_path(res, seed):
    # hilbert_d over the full res-grid is a permutation, and consecutive
    # curve indices are always 4-neighbor cells (the locality property
    # hilbert_ranges' contiguous-partition guarantee rests on)
    from python_prtree_ray.pipelines.tiling import hilbert_d

    g = 1 << res
    if g * g > 4096:
        g = 64
        res = 6
    ix, iy = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    d = hilbert_d(ix.ravel().astype(np.int64), iy.ravel().astype(np.int64), res)
    assert np.unique(d).size == g * g  # bijective
    order = np.argsort(d)
    ox, oy = ix.ravel()[order], iy.ravel()[order]
    step = np.abs(np.diff(ox)) + np.abs(np.diff(oy))
    assert (step == 1).all()  # L1-adjacent along the curve
