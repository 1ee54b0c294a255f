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
