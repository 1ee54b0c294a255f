"""PRTree kernel vs brute-force oracle — mirrors the reference's unit-test
strategy (tests/unit/test_query.py, test_batch_query.py,
test_intersections.py, test_precision.py: oracle = numpy has_intersect,
touching boxes hit, small gaps miss, points are degenerate boxes)."""

from __future__ import annotations

import numpy as np
import pytest

from python_prtree_ray.functions.geom import brute_force_pairs, points_to_boxes
from python_prtree_ray.functions.prtree import PRTree

from .conftest import random_boxes


@pytest.mark.parametrize("n,m", [(0, 5), (1, 3), (7, 3), (500, 100), (5000, 300)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_query_matches_brute_force(n, m, dtype, seed):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, n, dtype=dtype)
    idx = (rng.permutation(n).astype(np.int64) * 7 - 3)  # negative + sparse ids
    q = random_boxes(rng, m, edge=0.1, dtype=dtype)
    t = PRTree(idx, boxes)
    qi, bi = t.batch_query_pairs(q)
    got = set(zip(qi.tolist(), bi.tolist()))
    oqi, obi = brute_force_pairs(q, boxes)
    want = set(zip(oqi.tolist(), idx[obi].tolist()))
    assert got == want


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_dims(dim):
    rng = np.random.default_rng(1)
    boxes = random_boxes(rng, 400, dim=dim)
    q = random_boxes(rng, 60, edge=0.2, dim=dim)
    idx = np.arange(400, dtype=np.int64)
    t = PRTree(idx, boxes)
    qi, bi = t.batch_query_pairs(q)
    oqi, obi = brute_force_pairs(q, boxes)
    assert set(zip(qi.tolist(), bi.tolist())) == set(zip(oqi.tolist(), obi.tolist()))


def test_touching_boxes_intersect():
    # closed-interval: a_max == b_min counts (reference prtree.h:763-777,
    # tests/unit/test_query.py:268-285)
    t = PRTree(np.array([1], dtype=np.int64), np.array([[0.0, 0.0, 0.5, 0.5]]))
    assert t.batch_query(np.array([[0.5, 0.5, 0.7, 0.7]]))[0].tolist() == [1]
    # corner touch only
    assert t.batch_query(np.array([[0.5, 0.0, 0.7, 0.2]]))[0].tolist() == [1]


def test_small_gap_is_not_a_hit():
    # reference regression: tests/e2e/test_regression.py:13 (1e-5 gaps)
    t = PRTree(np.array([1], dtype=np.int64), np.array([[0.0, 0.0, 0.5, 0.5]]))
    assert t.batch_query(np.array([[0.500001, 0.0, 0.7, 0.5]]))[0].size == 0
    assert t.batch_query(np.array([[0.5 + 1e-12, 0.0, 0.7, 0.5]]))[0].size == 0


def test_point_query_is_degenerate_box():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 300)
    idx = np.arange(300, dtype=np.int64)
    t = PRTree(idx, boxes)
    pts = rng.random((50, 2))
    qi, bi = t.batch_query_pairs(points_to_boxes(pts))
    oqi, obi = brute_force_pairs(points_to_boxes(pts), boxes)
    assert set(zip(qi.tolist(), bi.tolist())) == set(zip(oqi.tolist(), obi.tolist()))


def test_batch_query_sorted_per_query():
    # reference sorts per-query results ascending (prtree.h:786-787)
    rng = np.random.default_rng(4)
    boxes = random_boxes(rng, 1000)
    idx = rng.permutation(1000).astype(np.int64)
    t = PRTree(idx, boxes)
    res = t.batch_query(random_boxes(rng, 20, edge=0.3))
    for r in res:
        assert np.all(np.diff(r) > 0)


def test_self_pairs_match_brute_force():
    # query_intersections parity: i<j rule (reference prtree.h:839-958)
    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 800, edge=0.08)
    idx = rng.permutation(800).astype(np.int64)
    t = PRTree(idx, boxes)
    pairs = t.query_self_pairs()
    oq, ob = brute_force_pairs(boxes, boxes)
    a, b = idx[oq], idx[ob]
    keep = a < b
    assert set(map(tuple, pairs.tolist())) == set(zip(a[keep].tolist(), b[keep].tolist()))
    # sorted deterministically
    as_tuples = list(map(tuple, pairs.tolist()))
    assert as_tuples == sorted(as_tuples)


def test_duplicate_indices_accepted():
    # reference ctor accepts duplicate indices (test_construction.py:248)
    boxes = np.array([[0.0, 0.0, 0.1, 0.1], [0.5, 0.5, 0.6, 0.6]])
    t = PRTree(np.array([7, 7], dtype=np.int64), boxes)
    r = t.batch_query(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert r[0].tolist() == [7, 7]


def test_empty_tree_queries():
    t = PRTree(np.empty(0, dtype=np.int64), np.empty((0, 4)))
    qi, bi = t.batch_query_pairs(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert qi.size == 0 and bi.size == 0
    assert t.query_self_pairs().shape[0] == 0
