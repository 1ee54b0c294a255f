"""End-user API parity with the reference's remaining test suites —
object handling (tests/unit/test_object_handling.py), mixed lifecycle
workflows (tests/integration/test_mixed_operations.py), user workflows
and README flows (tests/e2e/test_user_workflows.py,
tests/e2e/test_readme_examples.py), batch-query scaling invariants
(tests/unit/test_parallel_configuration.py), and coordinate-regime
safety (tests/unit/test_comprehensive_safety.py:169-225). Each test
cites the reference scenario it mirrors; semantics are re-expressed
against the Ray Dataset API (queries are Datasets, results are
(query_id, idx) rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from python_prtree_ray.api import RayPRTree

from .conftest import random_boxes
from .test_pipelines_ray import _boxes_ds, _pairs_set

DIM_COLS = {
    2: ("xmin", "ymin", "xmax", "ymax"),
    3: ("xmin", "ymin", "zmin", "xmax", "ymax", "zmax"),
    4: ("xmin", "ymin", "zmin", "tmin", "xmax", "ymax", "zmax", "tmax"),
}


def _nd_ds(ray, boxes, ids, dim, id_name="idx", blocks=3):
    cols = {id_name: ids.astype(np.int64)}
    for j, name in enumerate(DIM_COLS[dim]):
        cols[name] = boxes[:, j]
    return ray.data.from_arrow(pa.table(cols)).repartition(blocks)


def _brute_pairs(boxes, ids, qs, qids):
    d = boxes.shape[1] // 2
    out = set()
    for qi, q in zip(qids, qs):
        hit = np.ones(boxes.shape[0], bool)
        for k in range(d):
            hit &= (boxes[:, k] <= q[k + d]) & (q[k] <= boxes[:, k + d])
        out |= {(int(qi), int(i)) for i in ids[hit]}
    return out


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_insert_with_object_auto_idx(ray_session, dim):
    # reference tests/unit/test_object_handling.py:14-25 — insert(bb,
    # obj=...) with no idx auto-assigns and stores the object
    ray = ray_session
    rng = np.random.default_rng(31)
    boxes = random_boxes(rng, 20, dim=dim)
    ids = np.arange(1, 21, dtype=np.int64)
    tree = RayPRTree(_nd_ds(ray, boxes, ids, dim), res=2, strict=False)
    obj = {"name": "test", "value": 123}
    bb = [0.0] * dim + [1.0] * dim
    new_idx = tree.insert(bb=bb, obj=obj)
    assert tree.size() == 21
    assert tree.get_obj(new_idx) == obj


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_query_return_obj(ray_session, dim):
    # reference tests/unit/test_object_handling.py:27-44 — return_obj
    # yields the stored payloads for exactly the intersecting rows
    ray = ray_session
    boxes = np.array(
        [[0.0] * dim + [1.0] * dim, [2.0] * dim + [3.0] * dim]
    )
    ids = np.array([1, 2], np.int64)
    tree = RayPRTree(_nd_ds(ray, boxes, ids, dim, blocks=1), res=0, strict=False)
    tree.set_obj(1, {"id": 1, "name": "obj1"})
    tree.set_obj(2, {"id": 2, "name": "obj2"})
    q = np.array([[0.5] * dim + [0.6] * dim])
    out = tree.batch_query(
        _nd_ds(ray, q, np.array([7], np.int64), dim, "query_id", 1),
        return_obj=True,
    ).take_all()
    assert len(out) == 1
    assert out[0]["idx"] == 1
    import json

    obj = out[0]["obj"]
    if isinstance(obj, (bytes, str)):
        obj = json.loads(obj)
    assert obj == {"id": 1, "name": "obj1"}


@pytest.mark.parametrize(
    "obj",
    [
        {"key": "value", "number": 42},
        [1, "two", 3.0],
        "plain string",
        12345,
    ],
)
def test_object_types_roundtrip(ray_session, obj):
    # reference tests/unit/test_object_handling.py:69-110 — dict / list /
    # str / int payloads all round-trip through set_obj/get_obj
    ray = ray_session
    rng = np.random.default_rng(37)
    boxes = random_boxes(rng, 5)
    ids = np.arange(5, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids, blocks=1), res=1, strict=False)
    tree.set_obj(3, obj)
    assert tree.get_obj(3) == obj


@pytest.mark.parametrize("dim", [2, 3])
def test_complex_mixed_workflow(ray_session, dim, tmp_path):
    # reference tests/integration/test_mixed_operations.py:10-60 —
    # build -> insert -> erase -> rebuild -> save -> load -> query
    # equality before/after persistence
    ray = ray_session
    rng = np.random.default_rng(42)
    n = 100
    boxes = random_boxes(rng, n, edge=0.1, dim=dim)
    ids = np.arange(n, dtype=np.int64)
    tree = RayPRTree(_nd_ds(ray, boxes, ids, dim), res=2, strict=False)
    assert tree.size() == n

    extra = random_boxes(rng, 50, edge=0.1, dim=dim)
    tree.insert_batch(
        _nd_ds(ray, extra, np.arange(n, n + 50, dtype=np.int64), dim)
    )
    assert tree.size() == n + 50

    tree.erase(np.arange(n // 2, dtype=np.int64))
    assert tree.size() == n + 50 - n // 2

    tree.rebuild()

    qs = random_boxes(rng, 20, edge=0.2, dim=dim)
    qids = np.arange(20, dtype=np.int64)
    qds = _nd_ds(ray, qs, qids, dim, "query_id")
    before = _pairs_set(tree.batch_query(qds).take_all())

    path = str(tmp_path / "complex_tree")
    tree.save(path)
    loaded = RayPRTree.load(path, strict=False)
    after = _pairs_set(loaded.batch_query(qds).take_all())
    assert before == after
    # ground truth: survivors are ids n//2..n+49
    live_ids = np.arange(n // 2, n + 50, dtype=np.int64)
    live_boxes = np.concatenate([boxes[n // 2:], extra])
    assert after == _brute_pairs(live_boxes, live_ids, qs, qids)


def test_collision_detection_workflow_2d(ray_session):
    # reference tests/e2e/test_user_workflows.py:120-151 — self-
    # intersections among moving "objects" (the collision-detection
    # user story), validated against brute force
    ray = ray_session
    rng = np.random.default_rng(55)
    n = 200
    boxes = random_boxes(rng, n, edge=0.08)
    ids = np.arange(n, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=3, strict=False)
    got = {
        (min(r["query_id"], r["idx"]), max(r["query_id"], r["idx"]))
        for r in tree.query_intersections().take_all()
    }
    want = set()
    for i in range(n):
        m = (
            (boxes[:, 0] <= boxes[i, 2])
            & (boxes[i, 0] <= boxes[:, 2])
            & (boxes[:, 1] <= boxes[i, 3])
            & (boxes[i, 1] <= boxes[:, 3])
        )
        want |= {(min(i, j), max(i, j)) for j in np.nonzero(m)[0] if j != i}
    assert got == want


@pytest.mark.parametrize("batch_size", [1, 10, 100])
def test_batch_query_partitioning_consistency(ray_session, batch_size):
    # reference tests/unit/test_parallel_configuration.py:79-105 — the
    # same query set yields the identical result set regardless of how
    # the batch is split (their thread-count knob; our partitioning)
    ray = ray_session
    rng = np.random.default_rng(61)
    boxes = random_boxes(rng, 400, edge=0.05)
    ids = np.arange(400, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=3, strict=False)
    qs = random_boxes(rng, 100, edge=0.1)
    qids = np.arange(100, dtype=np.int64)
    blocks = max(1, 100 // batch_size)
    got = _pairs_set(
        tree.batch_query(
            _boxes_ds(ray, qs, qids, "query_id", blocks=min(blocks, 32))
        ).take_all()
    )
    assert got == _brute_pairs(boxes, ids, qs, qids)


@pytest.mark.parametrize(
    "scale,offset",
    [
        (1e6, 0.0),  # very large coordinates (test_comprehensive_safety.py:169)
        (1e-6, 0.0),  # very small (…:184)
        (1.0, -50.0),  # negative (…:199)
        (100.0, -50.0),  # mixed sign (…:212)
    ],
)
def test_coordinate_regimes(ray_session, scale, offset):
    # reference tests/unit/test_comprehensive_safety.py:169-225 — the
    # index stays exact for large / tiny / negative / mixed-sign
    # coordinates (cell clamping may degrade pruning, never results)
    ray = ray_session
    rng = np.random.default_rng(71)
    boxes = random_boxes(rng, 150, edge=0.05) * scale + offset
    ids = np.arange(150, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=3, strict=False)
    qs = random_boxes(rng, 30, edge=0.2) * scale + offset
    qids = np.arange(30, dtype=np.int64)
    got = _pairs_set(
        tree.batch_query(_boxes_ds(ray, qs, qids, "query_id")).take_all()
    )
    assert got == _brute_pairs(boxes, ids, qs, qids)


@pytest.mark.parametrize("dim", [3, 4])
def test_query_intersections_nd(ray_session, dim):
    # regression: query_intersections on a 3D/4D tree must test ALL
    # axes (reference tests/unit/test_intersections.py runs every dim;
    # the 2D-default join silently widened results before)
    ray = ray_session
    rng = np.random.default_rng(83)
    n = 150
    boxes = random_boxes(rng, n, edge=0.15, dim=dim)
    ids = np.arange(n, dtype=np.int64)
    tree = RayPRTree(_nd_ds(ray, boxes, ids, dim), res=2, strict=False)
    got = {
        (min(r["query_id"], r["idx"]), max(r["query_id"], r["idx"]))
        for r in tree.query_intersections().take_all()
    }
    want = set()
    for i in range(n):
        m = np.ones(n, bool)
        for k in range(dim):
            m &= (boxes[:, k] <= boxes[i, k + dim]) & (
                boxes[i, k] <= boxes[:, k + dim]
            )
        want |= {(min(i, j), max(i, j)) for j in np.nonzero(m)[0] if j != i}
    assert got == want
