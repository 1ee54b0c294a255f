"""Reference precision behavioral matrix, ported to the engine.

Mirrors ``tests/unit/test_precision.py`` of the reference (tiny-gap
non-intersection :58-99,180-318; adaptive-epsilon behaviors :322-521;
subnormal toggle :415-436) and ``tests/e2e/test_regression.py:13``
(``test_disjoint_small_gap_bug``) over dims {2,3,4} × dtypes
{float32,float64}.

Engine semantics under test: the intersection predicate is EXACT
closed-interval at the input dtype (no epsilon inflation — the
reference's "no false positives from tiny gaps" guarantee holds by
construction), while the adaptive-epsilon formula (``prtree.h:81-116``)
governs only the opt-in ``expand_epsilon`` query widening and
validation. Gap cases here stay above each dtype's representable
spacing at the tested magnitudes, exactly as the reference restricts
its own matrix to gaps float32 can express.

Each (dim, dtype) case packs its whole gap lattice into ONE tree and
ONE query batch — lanes along the second axis — so the matrix costs a
handful of Ray round trips, not one per boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from python_prtree_ray.api import RayPRTree
from python_prtree_ray.functions.validate import (
    PrecisionConfig,
    validate_boxes,
)

MINS = ("xmin", "ymin", "zmin", "tmin")
MAXS = ("xmax", "ymax", "zmax", "tmax")


def _cols(dim):
    return tuple(MINS[:dim]) + tuple(MAXS[:dim])


def _ds(ray, boxes, ids, id_name="idx", blocks=2):
    """(n, 2*dim) [mins..., maxs...] array → boxes Dataset, dtype kept."""
    boxes = np.asarray(boxes)
    dim = boxes.shape[1] // 2
    cols = {id_name: pa.array(np.asarray(ids, dtype=np.int64))}
    for i, name in enumerate(_cols(dim)):
        cols[name] = pa.array(boxes[:, i])
    return ray.data.from_arrow(pa.table(cols)).repartition(blocks)


def _pairs(tree, ray, qboxes, qids, **kw):
    dim = np.asarray(qboxes).shape[1] // 2
    out = tree.batch_query(
        _ds(ray, qboxes, qids, "query_id"), box_cols=_cols(dim), **kw
    ).take_all()
    return {(r["query_id"], r["idx"]) for r in out}


def _lattice(dim, dtype, gaps):
    """One lane per case along axis 1: box A_i=[0,1]×[3i,3i+1]×[0,100]…,
    query B_i starts at 1+gap_i in axis 0. gap>0 → disjoint, gap==0 →
    touching (closed-interval hit), gap<0 → overlap (hit)."""
    n = len(gaps)
    A = np.zeros((n, 2 * dim), dtype=dtype)
    B = np.zeros((n, 2 * dim), dtype=dtype)
    for i, g in enumerate(gaps):
        A[i, 0], A[i, dim] = 0.0, 1.0
        B[i, 0], B[i, dim] = 1.0 + g, 2.0
        A[i, 1], A[i, 1 + dim] = 3 * i, 3 * i + 1
        B[i, 1], B[i, 1 + dim] = 3 * i, 3 * i + 1
        for d in range(2, dim):
            A[i, d], A[i, d + dim] = 0.0, 100.0
            B[i, d], B[i, d + dim] = 0.0, 100.0
    return A, B


@pytest.mark.parametrize("dim", [2, 3, 4])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_gap_matrix(ray_session, dim, dtype):
    """Gaps 1e-4/1e-5/1e-6 never intersect; touching and overlapping
    lanes do (reference test_multiple_gap_sizes :180-212,
    test_touching_boxes_float64 :163-177, closed-interval semantics
    prtree.h:763-777). All gaps ≥ 8× float32 spacing at coord 1.0."""
    gaps = [1e-4, 1e-5, 1e-6, 0.0, -0.5]
    A, B = _lattice(dim, dtype, gaps)
    ids = np.arange(len(gaps), dtype=np.int64)
    tree = RayPRTree(_ds(ray_session, A, ids), res=2, strict=False)
    got = _pairs(tree, ray_session, B, ids)
    assert got == {(3, 3), (4, 4)}  # touching + overlap lanes only


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_reference_regression_gap(ray_session, dim):
    """The exact 5.39e-6 gap from the reference's fixed critical bug
    (test_small_gap_with_float64 :58-84, e2e test_disjoint_small_gap_bug
    :13, README.md:303): must NOT intersect."""
    A = np.zeros((1, 2 * dim))
    B = np.zeros((1, 2 * dim))
    A[0, 0], A[0, dim] = 0.0, 75.02750896
    B[0, 0], B[0, dim] = 75.02751435, 100.0
    for d in range(1, dim):
        A[0, d], A[0, d + dim] = 0.0, 100.0
        B[0, d], B[0, d + dim] = 0.0, 100.0
    tree = RayPRTree(_ds(ray_session, A, [0], blocks=1), res=2, strict=False)
    assert _pairs(tree, ray_session, B, [0]) == set()


@pytest.mark.parametrize("dim", [2, 3])
def test_large_magnitude_small_relative_gaps(ray_session, dim):
    """Large-base coordinates with small absolute gaps stay disjoint
    (reference test_large_magnitude_coordinates_float64 :86-99 and
    test_large_coordinates_small_relative_gaps :214-250); a same-
    magnitude overlapping control lane still hits."""
    cases = [(1e3, 0.001), (1e6, 0.1), (1e6, 1.1), (1e6, -0.5)]
    n = len(cases)
    A = np.zeros((n, 2 * dim))
    B = np.zeros((n, 2 * dim))
    for i, (base, gap) in enumerate(cases):
        A[i, 0], A[i, dim] = base, base + 1.0
        B[i, 0], B[i, dim] = base + 1.0 + gap, base + 2.0
        A[i, 1], A[i, 1 + dim] = 3 * i, 3 * i + 1
        B[i, 1], B[i, 1 + dim] = 3 * i, 3 * i + 1
        for d in range(2, dim):
            A[i, d], A[i, d + dim] = 0.0, 100.0
            B[i, d], B[i, d + dim] = 0.0, 100.0
    ids = np.arange(n, dtype=np.int64)
    tree = RayPRTree(_ds(ray_session, A, ids), res=2, strict=False)
    assert _pairs(tree, ray_session, B, ids) == {(3, 3)}


@pytest.mark.parametrize("dim", [3, 4])
def test_gap_in_each_higher_dimension(ray_session, dim):
    """A 1e-6 gap in ANY single axis suffices for disjointness
    (reference test_precision_in_higher_dimensions :300-318): unit-cube
    tree box, one query per tested axis, plus an all-overlap control."""
    A = np.zeros((1, 2 * dim))
    A[0, dim:] = 1.0
    queries = []
    for t in range(dim):
        q = np.zeros(2 * dim)
        for d in range(dim):
            if d == t:
                q[d], q[d + dim] = 1.0 + 1e-6, 2.0
            else:
                q[d], q[d + dim] = 0.0, 0.5
        queries.append(q)
    control = np.zeros(2 * dim)
    control[dim:] = 0.5
    queries.append(control)
    qids = np.arange(dim + 1, dtype=np.int64)
    tree = RayPRTree(_ds(ray_session, A, [7], blocks=1), res=2, strict=False)
    assert _pairs(tree, ray_session, np.stack(queries), qids) == {(dim, 7)}


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_degenerate_boxes(ray_session, dim):
    """min==max boxes build and answer point-containment queries with
    closed-interval boundary hits (reference test_degenerate_boxes
    :148-160; point query = degenerate box, prtree.h:607-615)."""
    rng = np.random.default_rng(5)
    pts = rng.random((10, dim)) * 100
    boxes = np.concatenate([pts, pts], axis=1)
    ids = np.arange(10, dtype=np.int64)
    tree = RayPRTree(_ds(ray_session, boxes, ids), res=2, strict=False)
    assert tree.size() == 10
    # query box = exact bbox of the first 3 points: boundary points count
    lo, hi = pts[:3].min(axis=0), pts[:3].max(axis=0)
    q = np.concatenate([lo, hi])[None, :]
    inside = {
        i for i in range(10) if (pts[i] >= lo).all() and (pts[i] <= hi).all()
    }
    assert {b for (_, b) in _pairs(tree, ray_session, q, [0])} == inside
    assert inside >= {0, 1, 2}


@pytest.mark.parametrize("tree_dt,query_dt", [(np.float32, np.float64),
                                              (np.float64, np.float32)])
def test_mixed_precision_tree_vs_query(ray_session, tree_dt, query_dt):
    """float32 tree × float64 queries and the reverse both answer, with
    a clear gap (0.5) disjoint and an overlap hitting (reference
    TestMixedPrecision :103-141)."""
    dim = 2
    A, B = _lattice(dim, tree_dt, [0.5, -0.25])
    ids = np.arange(2, dtype=np.int64)
    tree = RayPRTree(_ds(ray_session, A, ids), res=2, strict=False)
    got = _pairs(tree, ray_session, B.astype(query_dt), ids)
    assert got == {(1, 1)}


# ---------------------------------------------------- adaptive epsilon


def test_insert_path_small_coordinate_gap(ray_session):
    """Insert-then-query must not report a 1e-7 gap beyond a small box
    as a hit (reference test_adaptive_epsilon_small_coordinates
    :326-351: the insert-path epsilon slack never leaks into results)."""
    tree = RayPRTree()
    tree.insert([0.0, 0.0, 0.1, 0.1], idx=0)
    q = np.array([[0.1 + 1e-7, 0.0, 0.2, 0.1]])
    assert _pairs(tree, ray_session, q, [0]) == set()
    q2 = np.array([[0.05, 0.0, 0.2, 0.1]])
    assert _pairs(tree, ray_session, q2, [0]) == {(0, 0)}


def test_insert_path_large_coordinate_gap(ray_session):
    """Same at magnitude 1e7 with a 0.01 gap (reference
    test_adaptive_epsilon_large_coordinates :353-383)."""
    base = 1e7
    tree = RayPRTree()
    tree.insert([base, base, base + 1000.0, base + 1000.0], idx=0)
    q = np.array([[base + 1000.0 + 0.01, base, base + 2000.0, base + 1000.0]])
    assert _pairs(tree, ray_session, q, [0]) == set()


def test_insert_mixed_scales(ray_session):
    """Boxes inserted at scales 0.1..1e4 all stay queryable (reference
    test_adaptive_epsilon_mixed_scales :385-413)."""
    tree = RayPRTree()
    scales = [0.1, 1.0, 100.0, 10000.0]
    for i, s in enumerate(scales):
        tree.insert([s, s, s + s * 0.1, s + s * 0.1], idx=i)
    assert tree.size() == len(scales)
    qs = np.array([[s, s, s + s * 0.1, s + s * 0.1] for s in scales])
    got = _pairs(tree, ray_session, qs, np.arange(4))
    assert {(i, i) for i in range(4)} <= got


def test_subnormal_detection_toggle(ray_session):
    """Subnormal coordinate (1e-320) rejected by default; allowed after
    set_subnormal_detection(False) (reference
    test_subnormal_number_detection :415-436, toggle prtree.h:996-1008)."""
    tree = RayPRTree()
    box = [1e-320, 0.0, 1.0, 1.0]
    with pytest.raises(ValueError, match="[Ss]ubnormal"):
        tree.insert(box, idx=0)
    tree.set_subnormal_detection(False)
    assert tree.get_subnormal_detection() is False
    tree.insert(box, idx=0)
    assert tree.size() == 1


def test_expand_epsilon_adaptive_widen_scales_with_extent(ray_session):
    """expand_epsilon widening follows the adaptive formula at extreme
    extents (reference adaptive-epsilon scaling :353-383 + formula
    prtree.h:81-116): with a 1e6 query extent, eps ≈ extent*rel + abs ≈
    1.0, so a 0.5 gap is pulled in while a 100 gap is not; with
    adaptive OFF, eps = absolute_epsilon and neither is."""
    ray = ray_session
    A = np.array([[0.0, 0.0, 1.0, 1.0]])
    tree = RayPRTree(_ds(ray, A, [0], blocks=1), res=2, strict=False)
    # q0: gap 0.5; q1: gap 100; q2: far lane fixing the global extent ~1e6
    qs = np.array([
        [1.5, 0.0, 2.5, 1.0],
        [101.0, 0.0, 102.0, 1.0],
        [1e6, 5.0, 1e6 + 1.0, 6.0],
    ])
    qids = np.arange(3, dtype=np.int64)
    assert _pairs(tree, ray, qs, qids) == set()
    got = _pairs(tree, ray, qs, qids, expand_epsilon=True)
    assert got == {(0, 0)}
    tree.set_adaptive_epsilon(False)
    assert _pairs(tree, ray, qs, qids, expand_epsilon=True) == set()


# ---------------------------------------------------- pure-kernel matrix


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_epsilon_for_clamp_matrix(dtype):
    """Clamp boundaries of eps = clamp(extent*rel + abs, 10*machine_eps,
    0.01*extent) per dtype (prtree.h:81-116)."""
    cfg = PrecisionConfig()
    machine = float(np.finfo(dtype).eps)
    lo = 10.0 * machine
    # tiny extent → floor
    assert cfg.epsilon_for(0.0, dtype) == lo
    assert cfg.epsilon_for(1e-30, dtype) == lo
    # moderate extent → linear region (float64 only: float32's floor
    # 1.19e-6 exceeds the unclamped 1.01e-6 value at extent 1)
    if dtype is np.float64:
        assert cfg.epsilon_for(1.0, dtype) == pytest.approx(1e-6 + 1e-8)
    else:
        assert cfg.epsilon_for(1.0, dtype) == lo
    # huge extent → the 0.01*extent ceiling cannot bind before rel does
    # (rel=1e-6 << 0.01), so linear growth persists
    assert cfg.epsilon_for(1e12, dtype) == pytest.approx(1e6, rel=1e-3)
    # ceiling binds when rel epsilon is cranked past 1%
    hot = PrecisionConfig(relative_epsilon=0.5)
    assert hot.epsilon_for(100.0, dtype) == pytest.approx(1.0)
    # adaptive off → absolute, regardless of extent
    fixed = PrecisionConfig(adaptive_epsilon=False, absolute_epsilon=3e-7)
    assert fixed.epsilon_for(1e9, dtype) == 3e-7


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_subnormal_validation_per_dtype(dtype):
    """validate_boxes rejects subnormals at the INPUT dtype's tiny
    threshold and passes them when detection is off (prtree.h:151-185)."""
    sub = np.finfo(dtype).tiny / 4
    b = np.array([[sub, 0.0, 1.0, 1.0]], dtype=dtype)
    with pytest.raises(ValueError, match="[Ss]ubnormal"):
        validate_boxes(b)
    validate_boxes(b, PrecisionConfig(subnormal_detection=False))
    # the smallest NORMAL value is fine with detection on
    ok = np.array([[np.finfo(dtype).tiny, 0.0, 1.0, 1.0]], dtype=dtype)
    validate_boxes(ok)


def test_expand_epsilon_spill_path_matches(ray_session, tmp_path):
    """With spill_dir set, expand_epsilon checkpoints the query side to
    parquet (single upstream execution, zero object-store pin) and the
    widened result set is identical to the re-execution path."""
    ray = ray_session
    A = np.array([[0.0, 0.0, 1.0, 1.0]])
    qs = np.array([[1.5, 0.0, 2.5, 1.0], [1e6, 5.0, 1e6 + 1.0, 6.0]])
    qids = np.arange(2, dtype=np.int64)
    plain = RayPRTree(_ds(ray, A, [0], blocks=1), res=2, strict=False)
    spilly = RayPRTree(
        _ds(ray, A, [0], blocks=1), res=2, strict=False,
        spill_dir=str(tmp_path),
    )
    want = _pairs(plain, ray, qs, qids, expand_epsilon=True)
    got = _pairs(spilly, ray, qs, qids, expand_epsilon=True)
    assert got == want == {(0, 0)}
    assert list(tmp_path.glob("expand-q-*"))  # the checkpoint landed
