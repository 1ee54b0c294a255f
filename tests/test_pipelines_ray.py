"""Distributed pipelines vs brute-force oracles (reference test strategy:
every assertion reduces to a numpy brute-force recomputation, never golden
files — SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from python_prtree_ray.functions.geom import brute_force_pairs, points_to_boxes
from python_prtree_ray.pipelines import spatial_join as sj
from python_prtree_ray.pipelines.knn import knn_join
from python_prtree_ray.pipelines.pip import pip_join
from python_prtree_ray.functions import derive, geom

from .conftest import random_boxes


def _boxes_ds(ray, boxes, ids, id_name="idx", blocks=4):
    t = pa.table(
        {
            id_name: ids.astype(np.int64),
            "xmin": boxes[:, 0],
            "ymin": boxes[:, 1],
            "xmax": boxes[:, 2],
            "ymax": boxes[:, 3],
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _points_ds(ray, pts, ids, blocks=3):
    t = pa.table(
        {
            "query_id": ids.astype(np.int64),
            "px": pts[:, 0],
            "py": pts[:, 1],
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _pairs_set(rows, a="query_id", b="idx"):
    return {(r[a], r[b]) for r in rows}


@pytest.mark.parametrize("seed", [0, 1])
def test_spatial_join_matches_brute_force(ray_session, seed):
    ray = ray_session
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, 3000, edge=0.03)
    qs = random_boxes(rng, 400, edge=0.08)
    bids = rng.permutation(3000).astype(np.int64)
    qids = (np.arange(400) * 11 + 5).astype(np.int64)
    out = sj.spatial_join(
        _boxes_ds(ray, boxes, bids), _boxes_ds(ray, qs, qids, "query_id"), res=4
    ).take_all()
    oq, ob = brute_force_pairs(qs, boxes)
    want = set(zip(qids[oq].tolist(), bids[ob].tolist()))
    assert _pairs_set(out) == want


def test_spatial_join_boundary_boxes_on_cell_edges(ray_session):
    # boxes/queries whose edges lie EXACTLY on cell boundaries (res=3 →
    # boundaries at multiples of 0.125): touching matches must appear
    # exactly once (closed-interval + owner-cell dedup)
    ray = ray_session
    b = np.array(
        [
            [0.125, 0.125, 0.25, 0.25],
            [0.25, 0.25, 0.375, 0.375],
            [0.0, 0.0, 0.125, 0.125],
        ]
    )
    q = np.array([[0.25, 0.25, 0.25, 0.25], [0.125, 0.125, 0.125, 0.125]])
    bids = np.array([10, 20, 30])
    qids = np.array([1, 2])
    out = sj.spatial_join(
        _boxes_ds(ray, b, bids),
        _boxes_ds(ray, q, qids, "query_id"),
        res=3,
        broadcast=False,
    ).take_all()
    got = sorted((r["query_id"], r["idx"]) for r in out)
    oq, ob = brute_force_pairs(q, b)
    want = sorted(zip(qids[oq].tolist(), bids[ob].tolist()))
    assert got == want
    # no duplicates
    assert len(got) == len(set(got))


def test_spatial_join_deterministic_across_parallelism(ray_session):
    ray = ray_session
    rng = np.random.default_rng(7)
    boxes = random_boxes(rng, 1500, edge=0.04)
    qs = random_boxes(rng, 200, edge=0.06)
    bids = np.arange(1500, dtype=np.int64)
    qids = np.arange(200, dtype=np.int64)
    r1 = sj.spatial_join(
        _boxes_ds(ray, boxes, bids, blocks=1),
        _boxes_ds(ray, qs, qids, "query_id", blocks=1),
        res=4,
    ).take_all()
    r2 = sj.spatial_join(
        _boxes_ds(ray, boxes, bids, blocks=13),
        _boxes_ds(ray, qs, qids, "query_id", blocks=9),
        res=4,
    ).take_all()
    r3 = sj.spatial_join(
        _boxes_ds(ray, boxes, bids, blocks=13),
        _boxes_ds(ray, qs, qids, "query_id", blocks=9),
        res=4,
        broadcast=False,
    ).take_all()
    assert _pairs_set(r1) == _pairs_set(r2)
    assert _pairs_set(r1) == _pairs_set(r3)


def test_spatial_join_with_salting_matches_unsalted(ray_session):
    # Zipf-skewed boxes concentrated in one hot cell
    ray = ray_session
    rng = np.random.default_rng(3)
    lo = np.concatenate(
        [rng.random((2000, 2)) * 0.05, rng.random((500, 2))]  # hot corner + rest
    )
    boxes = np.concatenate([lo, lo + 0.02], axis=1)
    qs = random_boxes(rng, 150, edge=0.1)
    bids = np.arange(2500, dtype=np.int64)
    qids = np.arange(150, dtype=np.int64)
    # broadcast=False: salting lives on the cell-shuffle path — the auto
    # strategy would broadcast this small query side and never salt
    plain = sj.spatial_join(
        _boxes_ds(ray, boxes, bids),
        _boxes_ds(ray, qs, qids, "query_id"),
        res=3,
        broadcast=False,
    ).take_all()
    salted = sj.spatial_join(
        _boxes_ds(ray, boxes, bids),
        _boxes_ds(ray, qs, qids, "query_id"),
        res=3,
        salt_threshold=200,
        broadcast=False,
    ).take_all()
    plan = sj.compute_salt_plan(_boxes_ds(ray, boxes, bids), res=3, salt_threshold=200)
    assert plan, "hot corner must actually trigger the salt plan"
    assert max(plan.values()) >= 2
    assert _pairs_set(plain) == _pairs_set(salted)
    oq, ob = brute_force_pairs(qs, boxes)
    assert _pairs_set(salted) == set(zip(qids[oq].tolist(), bids[ob].tolist()))


def test_self_join_matches_brute_force(ray_session):
    ray = ray_session
    rng = np.random.default_rng(9)
    boxes = random_boxes(rng, 1200, edge=0.05)
    ids = rng.permutation(1200).astype(np.int64)
    out = sj.self_join(_boxes_ds(ray, boxes, ids), res=4).take_all()
    oq, ob = brute_force_pairs(boxes, boxes)
    a, b = ids[oq], ids[ob]
    keep = a < b
    want = set(zip(a[keep].tolist(), b[keep].tolist()))
    assert _pairs_set(out) == want


def test_point_query_matches_brute_force(ray_session):
    ray = ray_session
    rng = np.random.default_rng(11)
    boxes = random_boxes(rng, 2000, edge=0.05)
    pts = rng.random((300, 2))
    bids = np.arange(2000, dtype=np.int64)
    qids = np.arange(300, dtype=np.int64)
    out = sj.point_query(
        _boxes_ds(ray, boxes, bids), _points_ds(ray, pts, qids), res=4
    ).take_all()
    oq, ob = brute_force_pairs(points_to_boxes(pts), boxes)
    want = set(zip(qids[oq].tolist(), bids[ob].tolist()))
    assert _pairs_set(out) == want


def test_spatial_join_3d_cell_path_matches_brute_force(ray_session):
    # the cell-shuffle path is D-generic: x/y cells co-locate, the
    # per-cell kernel tests the full 3D intersection
    ray = ray_session
    rng = np.random.default_rng(19)
    boxes = random_boxes(rng, 1500, edge=0.06, dim=3)
    qs = random_boxes(rng, 150, edge=0.12, dim=3)
    bids = rng.permutation(1500).astype(np.int64)
    qids = np.arange(150, dtype=np.int64)
    cols3 = ("xmin", "ymin", "zmin", "xmax", "ymax", "zmax")

    def ds_of(arr, ids, idname):
        t = pa.table(
            {idname: ids.astype(np.int64), **{c: arr[:, j] for j, c in enumerate(cols3)}}
        )
        return ray.data.from_arrow(t).repartition(4)

    out = sj.spatial_join(
        ds_of(boxes, bids, "idx"),
        ds_of(qs, qids, "query_id"),
        res=3,
        broadcast=False,
        box_cols=cols3,
    ).take_all()
    oq, ob = brute_force_pairs(qs, boxes)
    want = set(zip(qids[oq].tolist(), bids[ob].tolist()))
    assert _pairs_set(out) == want


def test_spatial_join_4d_both_paths_match_brute_force(ray_session):
    ray = ray_session
    rng = np.random.default_rng(20)
    boxes = random_boxes(rng, 1000, edge=0.1, dim=4)
    qs = random_boxes(rng, 100, edge=0.2, dim=4)
    bids = rng.permutation(1000).astype(np.int64)
    qids = np.arange(100, dtype=np.int64)
    cols4 = ("xmin", "ymin", "zmin", "tmin", "xmax", "ymax", "zmax", "tmax")

    def ds_of(arr, ids, idname):
        t = pa.table(
            {idname: ids.astype(np.int64), **{c: arr[:, j] for j, c in enumerate(cols4)}}
        )
        return ray.data.from_arrow(t).repartition(3)

    oq, ob = brute_force_pairs(qs, boxes)
    want = set(zip(qids[oq].tolist(), bids[ob].tolist()))
    bcast = sj.broadcast_join(
        ds_of(boxes, bids, "idx"),
        pa.table(
            {"query_id": qids, **{c: qs[:, j] for j, c in enumerate(cols4)}}
        ),
        box_cols=cols4,
    ).take_all()
    assert _pairs_set(bcast) == want
    cell = sj.spatial_join(
        ds_of(boxes, bids, "idx"),
        ds_of(qs, qids, "query_id"),
        res=3,
        broadcast=False,
        box_cols=cols4,
    ).take_all()
    assert _pairs_set(cell) == want


def test_self_join_salted_matches_unsalted_on_skew(ray_session):
    # reference skew evidence (benchmarks/cpp/workloads.h:182-221): Zipf-
    # clustered boxes make one cell hot; probe-role-replication salting
    # must return the IDENTICAL pair set as the unsalted join
    ray = ray_session
    rng = np.random.default_rng(18)
    hot = random_boxes(rng, 700, edge=0.01) * 0.04 + 0.5  # all in one res-4 cell
    cold = random_boxes(rng, 300, edge=0.03)
    boxes = np.concatenate([hot, cold], axis=0)
    ids = rng.permutation(1000).astype(np.int64)
    ds = _boxes_ds(ray, boxes, ids)
    unsalted = _pairs_set(sj.self_join(ds, res=4).take_all())
    salted = _pairs_set(
        sj.self_join(ds, res=4, salt_threshold=100).take_all()
    )
    assert salted == unsalted
    # and both match brute force
    oq, ob = brute_force_pairs(boxes, boxes)
    want = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(oq, ob)
        if ids[i] < ids[j]
    }
    assert unsalted == want


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_spatial_join_honors_input_dtype(ray_session, dtype):
    # reference parity: precision follows the input dtype (core.py:119-145
    # auto-selects float32/float64 from the array dtype); the engine's
    # stages are dtype-preserving end to end, so a float32 join computes
    # in float32 and matches a float32 brute force bit-exactly
    ray = ray_session
    rng = np.random.default_rng(17)
    boxes = random_boxes(rng, 2000, edge=0.03, dtype=dtype)
    qs = random_boxes(rng, 200, edge=0.08, dtype=dtype)
    bids = rng.permutation(2000).astype(np.int64)
    qids = np.arange(200, dtype=np.int64)
    bds = _boxes_ds(ray, boxes, bids)
    qds = _boxes_ds(ray, qs, qids, "query_id")
    assert bds.schema().base_schema.field("xmin").type == (
        pa.float32() if dtype == np.float32 else pa.float64()
    )
    out_shuffle = sj.spatial_join(bds, qds, res=4).take_all()
    out_bcast = sj.broadcast_join(
        bds,
        pa.table(
            {
                "query_id": qids,
                "xmin": qs[:, 0],
                "ymin": qs[:, 1],
                "xmax": qs[:, 2],
                "ymax": qs[:, 3],
            }
        ),
    ).take_all()
    oq, ob = brute_force_pairs(qs, boxes)  # same-dtype comparisons
    want = set(zip(qids[oq].tolist(), bids[ob].tolist()))
    assert _pairs_set(out_shuffle) == want
    assert _pairs_set(out_bcast) == want


def test_knn_matches_brute_force(ray_session):
    ray = ray_session
    rng = np.random.default_rng(13)
    boxes = random_boxes(rng, 1500, edge=0.02)
    pts = rng.random((80, 2))
    bids = rng.permutation(1500).astype(np.int64)
    qids = np.arange(80, dtype=np.int64)
    k = 7
    out = knn_join(
        _boxes_ds(ray, boxes, bids), _points_ds(ray, pts, qids), k=k, res=4
    ).take_all()
    # brute-force oracle with identical centroid/distance formulas
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    d2 = geom.squared_centroid_distance(pts[:, 0], pts[:, 1], cx, cy)
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["idx"]))
    for qi in range(80):
        order = np.lexsort((bids, d2[qi]))[:k]
        want = [(rank + 1, int(bids[j])) for rank, j in enumerate(order)]
        assert sorted(got[qi]) == want


@pytest.mark.parametrize("dims", [2, 3, 4])
def test_knn_cell_path_matches_broadcast(ray_session, dims):
    # force the histogram ring-expansion cell-shuffle path (broadcast=False)
    # and check it agrees with the broadcast path AND brute force — in
    # every supported dimensionality (full-D histogram, x/y partitioning)
    ray = ray_session
    from python_prtree_ray.pipelines import knn as knnmod

    box_cols = {
        2: ("xmin", "ymin", "xmax", "ymax"),
        3: ("xmin", "ymin", "zmin", "xmax", "ymax", "zmax"),
        4: ("xmin", "ymin", "zmin", "tmin", "xmax", "ymax", "zmax", "tmax"),
    }[dims]
    point_cols = {
        2: knnmod.POINT_COLS, 3: knnmod.POINT3D_COLS, 4: knnmod.POINT4D_COLS
    }[dims]
    rng = np.random.default_rng(16 + dims)
    n, m, k = 900, 40, 5
    boxes = random_boxes(rng, n, edge=0.02, dim=dims)
    pts = rng.random((m, dims))
    bids = rng.permutation(n).astype(np.int64)
    qids = np.arange(m, dtype=np.int64)
    bcols = {"idx": bids}
    for j, c in enumerate(box_cols):
        bcols[c] = boxes[:, j]
    bds = ray.data.from_arrow(pa.table(bcols)).repartition(4)
    pcols = {"query_id": qids}
    for j, c in enumerate(point_cols):
        pcols[c] = pts[:, j]
    pds = ray.data.from_arrow(pa.table(pcols)).repartition(2)
    kw = dict(k=k, box_cols=box_cols, point_cols=point_cols)
    cell_out = knn_join(
        bds, pds, res=3 if dims == 4 else 4, broadcast=False, **kw
    ).take_all()
    bc_out = knn_join(bds, pds, **kw).take_all()
    C = (boxes[:, :dims] + boxes[:, dims:]) * 0.5
    d2 = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
    for out in (cell_out, bc_out):
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append((r["rank"], r["idx"]))
        for qi in range(m):
            order = np.lexsort((bids, d2[qi]))[:k]
            want = [(rank + 1, int(bids[j])) for rank, j in enumerate(order)]
            assert sorted(got[qi]) == want


def test_ring_for_k_nd_matches_brute_force(ray_session):
    # the D-dim summed-area-table ring bound must equal the brute-force
    # smallest Chebyshev radius with >= k points, in every dimensionality
    from python_prtree_ray.pipelines.knn import _cell_nd, _ring_for_k

    rng = np.random.default_rng(5)
    for dims, res in ((2, 3), (3, 2), (4, 2)):
        g = 1 << res
        P = rng.random((300, dims))
        grid = np.bincount(_cell_nd(P, res), minlength=g**dims)
        k = 7
        ring = _ring_for_k(grid, res, k, dims)
        dense = grid.reshape((g,) * dims)
        for flat, idx in enumerate(np.ndindex(*(g,) * dims)):
            for r in range(g + 1):
                sl = tuple(
                    slice(max(0, i - r), min(g, i + r + 1)) for i in idx
                )
                if dense[sl].sum() >= k:
                    assert ring[flat] == r
                    break


def test_knn_k_larger_than_dataset(ray_session):
    ray = ray_session
    rng = np.random.default_rng(14)
    boxes = random_boxes(rng, 5, edge=0.02)
    pts = rng.random((3, 2))
    out = knn_join(
        _boxes_ds(ray, boxes, np.arange(5), blocks=1),
        _points_ds(ray, pts, np.arange(3), blocks=1),
        k=50,
        res=3,
    ).take_all()
    assert len(out) == 15  # 3 queries x all 5 boxes


def test_pip_matches_kernel(ray_session):
    ray = ray_session
    rng = np.random.default_rng(15)
    pts = rng.random((2000, 2))
    qids = np.arange(2000, dtype=np.int64)
    out = pip_join(_points_ds(ray, pts, qids)).take_all()
    want = set()
    for pid, verts in derive.polygon_arrays():
        inside = geom.point_in_convex_polygon(pts[:, 0], pts[:, 1], verts)
        for i in np.nonzero(inside)[0]:
            want.add((int(qids[i]), pid))
    assert {(r["query_id"], r["poly_id"]) for r in out} == want


def test_match_list_aggregation_sorted(ray_session):
    ray = ray_session
    rng = np.random.default_rng(17)
    boxes = random_boxes(rng, 500, edge=0.1)
    qs = random_boxes(rng, 50, edge=0.2)
    pairs = sj.spatial_join(
        _boxes_ds(ray, boxes, np.arange(500)),
        _boxes_ds(ray, qs, np.arange(50), "query_id"),
        res=3,
    )
    lists = sj.aggregate_match_lists(pairs).take_all()
    for r in lists:
        m = r["matches"]
        assert list(m) == sorted(m)


def test_broadcast_and_shuffle_strategies_agree(ray_session):
    # spatial_join auto-picks broadcast for a small query side; force the
    # cell-shuffle path and require identical pair sets (and both == truth)
    ray = ray_session
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 4000, edge=0.02)
    qs = random_boxes(rng, 300, edge=0.1)
    bids = rng.permutation(4000).astype(np.int64)
    qids = np.arange(300).astype(np.int64)
    bds = _boxes_ds(ray, boxes, bids)
    qds = _boxes_ds(ray, qs, qids, "query_id")
    got_bc = _pairs_set(sj.spatial_join(bds, qds, res=4).take_all())
    got_sh = _pairs_set(sj.spatial_join(bds, qds, res=4, broadcast=False).take_all())
    oq, ob = brute_force_pairs(qs, boxes)
    want = set(zip(qids[oq].tolist(), bids[ob].tolist()))
    assert got_bc == want
    assert got_sh == want


def test_broadcast_join_touching_boxes_closed_interval(ray_session):
    # reference semantics: a_max == b_min intersects (prtree.h:763-777);
    # must hold through the broadcast path too
    ray = ray_session
    boxes = np.array([[0.0, 0.0, 0.25, 0.25]])
    qs = np.array([[0.25, 0.25, 0.5, 0.5], [0.2500001, 0.0, 0.3, 0.2]])
    out = sj.spatial_join(
        _boxes_ds(ray, boxes, np.array([7]), blocks=1),
        _boxes_ds(ray, qs, np.array([1, 2]), "query_id", blocks=1),
    ).take_all()
    assert _pairs_set(out) == {(1, 7)}


def test_forced_broadcast_overflow_raises(ray_session, monkeypatch):
    # broadcast=True must fail LOUDLY when the query side exceeds the
    # forced-broadcast cap — never collect unboundedly toward driver OOM
    ray = ray_session
    rng = np.random.default_rng(11)
    boxes = random_boxes(rng, 50, edge=0.05)
    qs = random_boxes(rng, 40, edge=0.05)
    bds = _boxes_ds(ray, boxes, np.arange(50), blocks=1)
    qds = _boxes_ds(ray, qs, np.arange(40), "query_id", blocks=2)
    monkeypatch.setattr(sj, "FORCE_BROADCAST_LIMIT", 10)
    with pytest.raises(ValueError, match="FORCE_BROADCAST_LIMIT"):
        sj.spatial_join(bds, qds, broadcast=True)
    # under the cap it still joins
    monkeypatch.setattr(sj, "FORCE_BROADCAST_LIMIT", 1000)
    assert sj.spatial_join(bds, qds, broadcast=True).count() >= 0


def test_broadcast_join_empty_sides(ray_session):
    ray = ray_session
    rng = np.random.default_rng(0)
    boxes = random_boxes(rng, 50, edge=0.1)
    bds = _boxes_ds(ray, boxes, np.arange(50), blocks=1)
    empty_q = _boxes_ds(ray, boxes, np.arange(50), "query_id", blocks=1).filter(
        lambda r: False
    )
    out = sj.spatial_join(bds, empty_q)
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == ["query_id", "idx"]


def test_session_window_gap_semantics(ray_session):
    # hand-built case: events 10:00, 10:20, 11:10 for one key -> sessions
    # {10:00,10:20} (gap 20m <= 30m) and {11:10} (gap 50m > 30m)
    ray = ray_session
    t0 = np.datetime64("2025-01-01T10:00:00", "us")
    ts = t0 + np.array([0, 20 * 60, 70 * 60], "timedelta64[s]").astype(
        "timedelta64[us]"
    )
    t = pa.table(
        {
            "event_type": ["a", "a", "a"],
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": [1.5, 2.5, 4.0],
        }
    )
    from python_prtree_ray.pipelines.windows import session_window_agg

    out = session_window_agg(ray.data.from_arrow(t), gap_minutes=30).take_all()
    got = sorted(
        (r["session_start"], r["n_events"], r["value_cents"]) for r in out
    )
    assert [(g[1], g[2]) for g in got] == [(2, 400), (1, 400)]


def test_top_events_threshold_ties_across_batches(ray_session):
    # value tie at the k-th place split across blocks: smaller event_id wins
    ray = ray_session
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "event_type": ["x"] * 4,
            "value": [9.0, 5.0, 5.0, 1.0],
        }
    )
    from python_prtree_ray.pipelines.windows import top_events_per_type

    out = top_events_per_type(
        ray.data.from_arrow(t).repartition(4), k=2
    ).take_all()
    got = sorted((r["rank"], r["event_id"]) for r in out)
    assert got == [(1, 1), (2, 2)]


def test_payload_carry_in_broadcast_join(ray_session):
    ray = ray_session
    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 300, edge=0.05)
    qs = random_boxes(rng, 40, edge=0.1)
    t = pa.table(
        {
            "idx": pa.array(np.arange(300), pa.int64()),
            "xmin": boxes[:, 0], "ymin": boxes[:, 1],
            "xmax": boxes[:, 2], "ymax": boxes[:, 3],
            "obj": [f"payload-{i}" for i in range(300)],
        }
    )
    qt = pa.table(
        {
            "query_id": pa.array(np.arange(40), pa.int64()),
            "xmin": qs[:, 0], "ymin": qs[:, 1],
            "xmax": qs[:, 2], "ymax": qs[:, 3],
        }
    )
    out = sj.broadcast_join(
        ray.data.from_arrow(t).repartition(3), qt, carry_cols=("obj",)
    ).take_all()
    assert all(r["obj"] == f"payload-{r['idx']}" for r in out)
    oq, ob = brute_force_pairs(qs, boxes)
    assert _pairs_set(out) == set(zip(oq.tolist(), ob.tolist()))


def test_next_event_join_matches_brute_force(ray_session):
    # forward-first windowed as-of: earliest right strictly after each
    # left within the window, min-id ties, unmatched lefts drop
    ray = ray_session
    from python_prtree_ray.pipelines.asof import next_event_join

    rng = np.random.default_rng(17)
    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    n_l, n_r, win_s = 300, 300, 500
    lk = rng.integers(0, 20, n_l)
    lt = rng.integers(0, 5000, n_l)
    rk = rng.integers(0, 20, n_r)
    rt = rng.integers(0, 5000, n_r)
    # force ts ties on both sides
    rt[:40] = lt[:40]
    rt[40:60] = rt[60:80]
    left = pa.table(
        {
            "l_id": pa.array(np.arange(n_l), pa.int64()),
            "user_id": pa.array(lk, pa.int64()),
            "ts": pa.array(t0 + lt.astype("timedelta64[s]"), pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "r_id": pa.array(np.arange(1000, 1000 + n_r), pa.int64()),
            "user_id": pa.array(rk, pa.int64()),
            "ts": pa.array(t0 + rt.astype("timedelta64[s]"), pa.timestamp("us")),
        }
    )
    out = next_event_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        window_us=win_s * 1_000_000,
    ).take_all()
    expect = {}
    for i in range(n_l):
        best = None
        for j in range(n_r):
            if rk[j] != lk[i]:
                continue
            gap = int(rt[j]) - int(lt[i])
            if 0 < gap <= win_s:
                cand = (int(rt[j]), 1000 + j)
                if best is None or cand < best:
                    best = cand
        if best is not None:
            expect[i] = (best[1], best[0] * 1_000_000 - int(lt[i]) * 1_000_000)
    got = {r["l_id"]: (r["r_id"], r["gap_us"]) for r in out}
    assert got == expect
    assert len(expect) > 20  # workload actually exercises matches


def test_knn_dist_matches_brute(ray_session):
    # with_dist carries the exact float64 dist2 through both the merge
    # and the kept (dist2, idx) order
    ray = ray_session
    from python_prtree_ray.pipelines.knn import knn_join

    rng = np.random.default_rng(23)
    n, m, k = 400, 25, 4
    c = rng.random((n, 2))
    boxes = pa.table(
        {
            "idx": pa.array(np.arange(n), pa.int64()),
            "xmin": c[:, 0],
            "ymin": c[:, 1],
            "xmax": c[:, 0],
            "ymax": c[:, 1],
        }
    )
    q = rng.random((m, 2))
    pts = pa.table(
        {
            "query_id": pa.array(np.arange(m), pa.int64()),
            "px": q[:, 0],
            "py": q[:, 1],
        }
    )
    for forced in (None, False):  # broadcast and ring physical paths
        out = knn_join(
            ray.data.from_arrow(boxes).repartition(4),
            ray.data.from_arrow(pts),
            k=k,
            res=4,
            broadcast=forced,
            with_dist=True,
        ).take_all()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["idx"], r["dist2"])
            )
        for qi in range(m):
            dx = q[qi, 0] - c[:, 0]
            dy = q[qi, 1] - c[:, 1]
            d2 = dx * dx + dy * dy
            order = np.lexsort((np.arange(n), d2))[:k]
            rows = sorted(got[qi])
            assert [(r[1], r[2]) for r in rows] == [
                (int(i), float(d2[i])) for i in order
            ]


def test_asof_join_semantics(ray_session):
    # ties match (<=), duplicate right (key, ts) keeps max id, left with
    # only-later rights drops — all across multiple blocks
    ray = ray_session
    t0 = np.datetime64("2025-01-01T00:00:00", "us")

    def T(s):
        return t0 + np.timedelta64(s, "s")

    left = pa.table(
        {
            "l_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "ts": pa.array([T(100), T(50), T(10)], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "r_id": pa.array([10, 11, 12, 13], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "ts": pa.array([T(100), T(100), T(40), T(20)], pa.timestamp("us")),
        }
    )
    from python_prtree_ray.pipelines.asof import asof_join

    out = asof_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right).repartition(3),
    ).take_all()
    assert sorted((r["l_id"], r["r_id"]) for r in out) == [(1, 11), (2, 12)]


def test_hash_sample_parallelism_invariant(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.sample import hash_sample

    t = pa.table({"k": pa.array(np.arange(5000), pa.int64())})
    a = sorted(r["k"] for r in hash_sample(ray.data.from_arrow(t), "k", 7).take_all())
    b = sorted(
        r["k"]
        for r in hash_sample(
            ray.data.from_arrow(t).repartition(23), "k", 7
        ).take_all()
    )
    assert a == b and 0 < len(a) < 5000


def test_raster_tiles_extents_are_dyadic(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import raster_tile_join

    rng = np.random.default_rng(21)
    boxes = random_boxes(rng, 200, edge=0.1)
    t = pa.table(
        {
            "idx": pa.array(np.arange(200), pa.int64()),
            "xmin": boxes[:, 0], "ymin": boxes[:, 1],
            "xmax": boxes[:, 2], "ymax": boxes[:, 3],
        }
    )
    out = raster_tile_join(ray.data.from_arrow(t), res=4).take_all()
    g = 16
    for r in out[:50]:
        ix, iy = r["cell"] // g, r["cell"] % g
        assert r["tile_xmin"] == ix / g and r["tile_ymax"] == (iy + 1) / g
        # the box really overlaps its tile (closed interval)
        i = r["idx"]
        assert boxes[i, 0] <= r["tile_xmax"] and r["tile_xmin"] <= boxes[i, 2]


def test_interleaved_spans_sql_twin_matches_engine(ray_session):
    # the DuckDB regeneration of the interleaved corpus' media spans must
    # be row-identical to the engine's explode — this is the foundation
    # of the media_features / video_frames driver oracles
    import duckdb

    from python_prtree_ray.sources.synth import (
        interleaved_batch,
        interleaved_spans_sql,
    )
    from python_prtree_ray.pipelines.multimodal import explode_media_spans

    tbl = interleaved_batch(np.arange(400, dtype=np.int64))
    eng = (
        explode_media_spans(tbl)
        .to_pandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        'SELECT * FROM (' + interleaved_spans_sql(400) + ') ORDER BY doc_id, "offset"'
    ).fetchdf()
    assert eng[["doc_id", "offset", "kind", "media_ref"]].astype(
        {"offset": "int64"}
    ).equals(want.astype({"offset": "int64"}))

    # kinds="all": the FULL span-sequence invariant (kind, text,
    # media_ref, order) regenerates identically — north-rule per-row
    # equality, and the foundation of the span_sequence driver oracle
    from python_prtree_ray.pipelines.multimodal import explode_spans

    eng_all = (
        explode_spans(tbl)
        .to_pandas()
        .sort_values(["doc_id", "seq"])
        .reset_index(drop=True)
    )
    want_all = con.execute(
        "SELECT * FROM ("
        + interleaved_spans_sql(400, kinds="all")
        + ') ORDER BY doc_id, seq'
    ).fetchdf()
    assert eng_all[list(want_all.columns)].astype(
        {"offset": "int64", "seq": "int64"}
    ).equals(want_all.astype({"offset": "int64", "seq": "int64"}))

    # kinds="text": text spans regenerate word-identically
    want_txt = con.execute(
        "SELECT * FROM ("
        + interleaved_spans_sql(400, kinds="text")
        + ') ORDER BY doc_id, "offset"'
    ).fetchdf()
    eng_txt = (
        eng_all[eng_all["kind"] == "text"][["doc_id", "offset", "text"]]
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    assert eng_txt.astype({"offset": "int64"}).equals(
        want_txt.astype({"offset": "int64"})
    )


def test_payload_stub_variable_reps(ray_session):
    # stub payload = (ref * (1 + last_byte % 12))[:256] — length varies
    # with the ref; empty refs give empty payloads
    from python_prtree_ray.pipelines.multimodal import fetch_payload_stub

    refs = ["media://blob/000000000123", "m0", "media://blob/999999999999", ""]
    out = fetch_payload_stub(pa.table({"media_ref": refs}))
    for ref, payload in zip(refs, out.column("payload").to_pylist()):
        rep = 1 + (ord(ref[-1]) % 12) if ref else 1
        assert payload == (ref.encode() * rep)[:256]


def test_media_span_explode_preserves_order(ray_session):
    # span-sequence invariant (kind, media_ref, offset order) through the
    # multimodal explode — text spans dropped, media spans in doc order
    ray = ray_session
    from python_prtree_ray.sources.synth import SPAN_TYPE, DOC_SCHEMA
    from python_prtree_ray.pipelines.multimodal import media_feature_pipeline

    spans = [
        [
            {"kind": "image", "text": "", "media_ref": "m0", "offset": 0},
            {"kind": "text", "text": "x", "media_ref": "", "offset": 64},
            {"kind": "audio", "text": "", "media_ref": "m1", "offset": 65},
            {"kind": "video", "text": "", "media_ref": "m2", "offset": 129},
        ]
    ]
    t = pa.table(
        {"doc_id": ["d9"], "spans": pa.array(spans, type=pa.list_(SPAN_TYPE))},
        schema=DOC_SCHEMA,
    )
    out = media_feature_pipeline(ray.data.from_arrow(t), concurrency=(1, 2)).take_all()
    got = sorted((r["offset"], r["kind"]) for r in out)
    assert got == [(0, "image"), (65, "audio"), (129, "video")]
    assert all(len(r["features"]) == 8 for r in out)


@pytest.mark.parametrize("dims", [2, 3])
def test_radius_join_both_paths_match_brute_force(ray_session, dims):
    # fixed-radius within-distance join: broadcast (zero-shuffle) and
    # cell-shuffle paths must both equal the brute-force circle test,
    # threshold inclusive, in 2D and 3D
    ray = ray_session
    from python_prtree_ray.pipelines import knn as knnmod

    box_cols = {
        2: ("xmin", "ymin", "xmax", "ymax"),
        3: ("xmin", "ymin", "zmin", "xmax", "ymax", "zmax"),
    }[dims]
    point_cols = {2: knnmod.POINT_COLS, 3: knnmod.POINT3D_COLS}[dims]
    rng = np.random.default_rng(77 + dims)
    n, m, radius = 800, 60, 0.15
    boxes = random_boxes(rng, n, edge=0.02, dim=dims)
    pts = rng.random((m, dims))
    bids = rng.permutation(n).astype(np.int64)
    qids = np.arange(m, dtype=np.int64)
    bcols = {"idx": bids}
    for j, c in enumerate(box_cols):
        bcols[c] = boxes[:, j]
    bds = ray.data.from_arrow(pa.table(bcols)).repartition(4)
    pcols = {"query_id": qids}
    for j, c in enumerate(point_cols):
        pcols[c] = pts[:, j]
    pds = ray.data.from_arrow(pa.table(pcols)).repartition(2)
    kw = dict(radius=radius, box_cols=box_cols, point_cols=point_cols)
    bc_out = knnmod.radius_join(bds, pds, **kw).take_all()
    cell_out = knnmod.radius_join(bds, pds, res=4, broadcast=False, **kw).take_all()
    C = (boxes[:, :dims] + boxes[:, dims:]) * 0.5
    d2 = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
    want = sorted(
        (int(qi), int(bids[j]))
        for qi in range(m)
        for j in np.nonzero(d2[qi] <= radius * radius)[0]
    )
    assert want  # non-degenerate fixture
    for out in (bc_out, cell_out):
        got = sorted((r["query_id"], r["idx"]) for r in out)
        assert got == want
        for r in out:
            assert r["dist2"] <= radius * radius


def test_radius_join_empty_and_forced_broadcast_guard(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines import knn as knnmod

    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 50, edge=0.02)
    bt = pa.table(
        {
            "idx": np.arange(50, dtype=np.int64),
            "xmin": boxes[:, 0], "ymin": boxes[:, 1],
            "xmax": boxes[:, 2], "ymax": boxes[:, 3],
        }
    )
    bds = ray.data.from_arrow(bt)
    empty_pts = ray.data.from_arrow(
        pa.table(
            {
                "query_id": np.empty(0, np.int64),
                "px": np.empty(0, np.float64),
                "py": np.empty(0, np.float64),
            }
        )
    )
    assert knnmod.radius_join(bds, empty_pts, radius=0.1).count() == 0

    big = ray.data.from_arrow(
        pa.table(
            {
                "query_id": np.arange(10, dtype=np.int64),
                "px": np.full(10, 0.5),
                "py": np.full(10, 0.5),
            }
        )
    )
    import python_prtree_ray.pipelines.spatial_join as sjmod

    orig = sjmod.FORCE_BROADCAST_LIMIT
    sjmod.FORCE_BROADCAST_LIMIT = 5
    try:
        with pytest.raises(ValueError, match="FORCE_BROADCAST_LIMIT"):
            knnmod.radius_join(bds, big, radius=0.1, broadcast=True)
    finally:
        sjmod.FORCE_BROADCAST_LIMIT = orig


def test_zonal_stats_matches_brute_force(ray_session):
    # per-polygon aggregates equal a numpy recomputation over the same
    # convex-polygon predicate, independent of partitioning
    ray = ray_session
    from python_prtree_ray.pipelines.pip import zonal_stats

    rng = np.random.default_rng(23)
    pts = rng.random((2000, 2))
    qids = rng.permutation(2000).astype(np.int64)
    polys = derive.polygon_arrays()
    for blocks in (1, 7):
        out = zonal_stats(_points_ds(ray, pts, qids, blocks=blocks)).take_all()
        got = {r["poly_id"]: r for r in out}
        n_nonempty = 0
        for pid, verts in polys:
            inside = geom.point_in_convex_polygon(pts[:, 0], pts[:, 1], verts)
            if not inside.any():
                assert pid not in got
                continue
            n_nonempty += 1
            r = got[pid]
            assert r["n_points"] == int(inside.sum())
            assert r["sum_qid"] == int(qids[inside].sum())
            assert r["min_px"] == pts[inside, 0].min()
            assert r["max_px"] == pts[inside, 0].max()
            assert r["min_py"] == pts[inside, 1].min()
            assert r["max_py"] == pts[inside, 1].max()
        assert len(got) == n_nonempty


def test_tile_extent_matches_brute_force(ray_session):
    # per-tile envelope/count equal a numpy recomputation; stable across
    # partitionings (min/max/count are order-independent)
    ray = ray_session
    from python_prtree_ray.functions import cells as cellmod
    from python_prtree_ray.pipelines.tiling import tile_extent

    rng = np.random.default_rng(31)
    boxes = random_boxes(rng, 1200, edge=0.1)
    ids = np.arange(1200, dtype=np.int64)
    res = 3
    row, cell = cellmod.cover_boxes(
        boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], res
    )
    want = {}
    for c in np.unique(cell):
        rs = row[cell == c]
        want[int(c)] = (
            rs.size,
            boxes[rs, 0].min(), boxes[rs, 1].min(),
            boxes[rs, 2].max(), boxes[rs, 3].max(),
        )
    for blocks in (1, 9):
        out = tile_extent(_boxes_ds(ray, boxes, ids, blocks=blocks), res=res).take_all()
        got = {
            r["cell"]: (
                r["n_boxes"], r["env_xmin"], r["env_ymin"],
                r["env_xmax"], r["env_ymax"],
            )
            for r in out
        }
        assert got == want


def test_sessionize_events_agrees_with_session_aggregate(ray_session):
    # every event gets exactly one session label; grouping the labeled
    # events by (key, session_start) reproduces session_window_agg's
    # n_events — on randomized multi-key data across partitionings
    ray = ray_session
    from python_prtree_ray.pipelines.windows import (
        session_window_agg,
        sessionize_events,
    )

    rng = np.random.default_rng(41)
    n = 3000
    t0 = np.datetime64("2025-03-01T00:00:00", "us")
    ts = t0 + rng.integers(0, 72 * 3600, n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    t = pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
            ),
            "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(rng.random(n)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    labeled = sessionize_events(ds, gap_minutes=30).take_all()
    assert len(labeled) == n
    assert len({r["event_id"] for r in labeled}) == n
    agg = session_window_agg(ds, gap_minutes=30).take_all()
    # rebuild per-event key lookup to group labels by (key, session_start)
    key_of = {
        int(e): (ty, int(u))
        for e, ty, u in zip(
            t.column("event_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("user_id").to_pylist(),
        )
    }
    from collections import Counter

    label_counts = Counter(
        (*key_of[r["event_id"]], r["session_start"]) for r in labeled
    )
    agg_counts = {
        (r["event_type"], r["user_id"], r["session_start"]): r["n_events"]
        for r in agg
    }
    assert dict(label_counts) == agg_counts


def test_band_join_matches_brute_force(ray_session):
    # randomized band join vs an O(n*m) pandas recomputation, including
    # boundary-inclusive hits at both band edges and duplicate timestamps
    ray = ray_session
    from python_prtree_ray.pipelines.asof import band_join

    rng = np.random.default_rng(53)
    nl, nr = 300, 500
    t0 = np.datetime64("2025-04-01T00:00:00", "us")
    # coarse ts grid (minutes) → plenty of exact boundary/tie collisions
    lts = t0 + (rng.integers(0, 48 * 60, nl) * 60_000_000).astype("timedelta64[us]")
    rts = t0 + (rng.integers(0, 48 * 60, nr) * 60_000_000).astype("timedelta64[us]")
    lk = rng.integers(0, 25, nl).astype(np.int64)
    rk = rng.integers(0, 25, nr).astype(np.int64)
    lid = np.arange(nl, dtype=np.int64)
    rid = np.arange(1000, 1000 + nr, dtype=np.int64)
    lds = ray.data.from_arrow(
        pa.table({"l_id": lid, "user_id": lk, "ts": pa.array(lts, pa.timestamp("us"))})
    ).repartition(4)
    rds = ray.data.from_arrow(
        pa.table({"r_id": rid, "user_id": rk, "ts": pa.array(rts, pa.timestamp("us"))})
    ).repartition(3)
    band = 3_600_000_000  # 1 hour
    out = band_join(
        lds, rds, lo_offset_us=-band, hi_offset_us=0
    ).take_all()
    got = sorted((r["l_id"], r["r_id"]) for r in out)
    lts_i = lts.astype(np.int64)
    rts_i = rts.astype(np.int64)
    want = sorted(
        (int(lid[i]), int(rid[j]))
        for i in range(nl)
        for j in range(nr)
        if lk[i] == rk[j] and lts_i[i] - band <= rts_i[j] <= lts_i[i]
    )
    assert want  # fixture non-degenerate
    assert got == want
    with pytest.raises(ValueError, match="lo_offset"):
        band_join(lds, rds, lo_offset_us=10, hi_offset_us=0)


def test_label_centroid_sums_partition_invariant(ray_session):
    # quantized per-label component sums equal a numpy recomputation and
    # are identical across partitionings (integer reduction)
    ray = ray_session
    from python_prtree_ray.pipelines.ann import label_centroid_sums

    rng = np.random.default_rng(61)
    n, d = 500, 16
    M = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)
    lab = rng.integers(0, 7, n).astype(np.int64)
    t = pa.table(
        {
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.ravel(), pa.float32()), d
            ).cast(pa.list_(pa.float32())),
            "label": lab,
        }
    )
    q = np.floor(M.astype(np.float64) * 10000.0).astype(np.int64)
    want = {}
    for lv in np.unique(lab):
        s = q[lab == lv].sum(axis=0)
        cnt = int((lab == lv).sum())
        for j in range(d):
            want[(int(lv), j)] = (int(s[j]), cnt)
    for blocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = label_centroid_sums(ds).take_all()
        got = {(r["label"], r["dim"]): (r["sum_q"], r["n_vecs"]) for r in out}
        assert got == want


def test_global_topk_matches_numpy(ray_session):
    # global top-k with duplicate values across blocks: deterministic
    # (value desc, id asc) order, identical across partitionings
    ray = ray_session
    from python_prtree_ray.pipelines.merge import global_topk

    rng = np.random.default_rng(71)
    n, k = 5000, 37
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 200, n).astype(np.int64)  # heavy value ties
    t = pa.table({"id": ids, "v": vals})
    order = np.lexsort((ids, -vals))[:k]
    want = [(int(ids[j]), int(vals[j]), r + 1) for r, j in enumerate(order)]
    for blocks in (1, 11):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = global_topk(ds, k=k, id_col="id", value_col="v").take_all()
        got = sorted(
            ((r["id"], r["v"], r["rank"]) for r in out), key=lambda x: x[2]
        )
        assert got == want


def test_bucketed_sum_matches_pandas(ray_session):
    # generic high-cardinality per-key sum (the unfused building block
    # beneath sum_semi_join): exact vs pandas across partitionings
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.merge import bucketed_sum

    rng = np.random.default_rng(97)
    k = rng.integers(0, 10_000, 20_000).astype(np.int64)
    a = rng.integers(-100, 100, 20_000).astype(np.int64)
    b = rng.integers(0, 5, 20_000).astype(np.int64)
    t = pa.table({"k": k, "a": a, "b": b})
    df = pd.DataFrame({"k": k, "a": a, "b": b})
    want = df.groupby("k", as_index=False)[["a", "b"]].sum()
    want_t = sorted(map(tuple, want.to_numpy()))
    for blocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = bucketed_sum(ds, key_col="k", value_cols=("a", "b")).take_all()
        got = sorted((r["k"], r["a"], r["b"]) for r in out)
        assert got == want_t


def test_curate_corpus_matches_pandas(ray_session):
    # fused curation pass (normalize → quality gate → lang-ID → exact
    # dedup on normalized text): exact vs a row-at-a-time recomputation,
    # invariant across partitionings
    ray = ray_session
    import re

    from python_prtree_ray.pipelines.text import _LANG_MARKERS, curate_corpus

    rng = np.random.default_rng(113)
    langs = list(_LANG_MARKERS)
    vocab = [w for ws in _LANG_MARKERS.values() for w in ws] + [
        "data", "tree", "12345", "!!??", "Zebra", "ray",
    ]
    texts = []
    for _ in range(400):
        words = [vocab[rng.integers(len(vocab))] for _ in range(rng.integers(1, 9))]
        txt = "  ".join(words)
        if rng.random() < 0.3:
            txt = " " + txt.upper() + "\t"  # normalizes equal to a twin
        texts.append(txt)
    texts += texts[:60]  # exact dups across the id range
    ids = np.arange(len(texts), dtype=np.int64)

    want = {}
    for i, txt in zip(ids, texts):
        norm = re.sub(r"\s+", " ", txt.strip().lower())
        n_alpha = len(re.findall("[a-zA-Z]", txt))
        if (n_alpha * 100) // max(len(txt), 1) < 82:
            continue
        scores = [
            len(re.findall(r"\b(" + "|".join(ws) + r")\b", txt))
            for ws in _LANG_MARKERS.values()
        ]
        lang = langs[int(np.argmax(scores))]
        row = (int(i), lang, len(txt.split()))
        if norm not in want or row[0] < want[norm][0]:
            want[norm] = row
    want_rows = sorted(want.values())
    assert want_rows, "test corpus must keep some rows"

    t = pa.table({"doc_id": ids, "text": texts})
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = curate_corpus(ds, min_quality=82).take_all()
        got = sorted((r["doc_id"], r["lang_pred"], r["n_tokens"]) for r in out)
        assert got == want_rows


def test_grouped_topk_matches_pandas(ray_session):
    # per-key top-k with (value desc, id asc) ties — exact vs pandas
    # rank, invariant across partitionings
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.merge import grouped_topk

    rng = np.random.default_rng(211)
    n, k = 20_000, 3
    key = rng.integers(0, 2_000, n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 50, n).astype(np.int64)  # heavy ties
    df = pd.DataFrame({"u": key, "i": ids, "v": vals}).sort_values(
        ["u", "v", "i"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("u").cumcount() + 1
    want = sorted(map(tuple, df[df["rank"] <= k][["u", "i", "v", "rank"]].to_numpy()))
    t = pa.table({"u": key, "i": ids, "v": vals})
    for blocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = grouped_topk(ds, k, key_col="u", id_col="i", value_col="v").take_all()
        got = sorted((r["u"], r["i"], r["v"], r["rank"]) for r in out)
        assert got == want


def test_vocab_topk_matches_counter(ray_session):
    # vocabulary top-k vs collections.Counter with (n desc, word asc) ties
    ray = ray_session
    import re
    from collections import Counter

    from python_prtree_ray.pipelines.text import vocab_topk

    rng = np.random.default_rng(223)
    words = ["alpha", "beta", "Gamma", "delta", "ray", "tree", "BETA", "x9y"]
    texts = [
        " ".join(words[rng.integers(len(words))] for _ in range(rng.integers(0, 12)))
        for _ in range(500)
    ]
    cnt = Counter(
        w for txt in texts for w in re.findall("[a-z]+", txt.lower())
    )
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    want = [(w, n, r + 1) for r, (w, n) in enumerate(ranked)]
    t = pa.table({"text": texts})
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = vocab_topk(ds, k=5).take_all()
        got = sorted(
            ((r["word"], r["n"], r["rank"]) for r in out), key=lambda x: x[2]
        )
        assert got == want


def test_tile_pyramid_levels_nest(ray_session):
    # every level's counts equal a direct recomputation at that res, and
    # each parent's count is the sum of its children
    ray = ray_session
    from python_prtree_ray.functions.cells import cell_of_points, parent_cell
    from python_prtree_ray.pipelines.tiling import tile_pyramid

    rng = np.random.default_rng(227)
    n, res = 5_000, 5
    px = rng.random(n) * 1.2 - 0.1  # includes out-of-range (clip path)
    py = rng.random(n) * 1.2 - 0.1
    t = pa.table({"px": px, "py": py})
    out = tile_pyramid(ray.data.from_arrow(t).repartition(8), res=res).take_all()
    got = {}
    for r_ in out:
        got[(r_["res"], r_["cell"])] = r_["n_points"]
    for r in range(res, -1, -1):
        c, n_c = np.unique(cell_of_points(px, py, r), return_counts=True)
        want_r = dict(zip(c.tolist(), n_c.tolist()))
        got_r = {cell: v for (rr, cell), v in got.items() if rr == r}
        assert got_r == want_r, f"res {r}"
        if r:
            rolled = {}
            for cell, v in got_r.items():
                p = int(parent_cell(np.array([cell]), r)[0])
                rolled[p] = rolled.get(p, 0) + v
            assert rolled == {c_: v for (rr, c_), v in got.items() if rr == r - 1}


def test_event_dedup_window_matches_pandas(ray_session):
    # first event per (user, type, tumbling window) with (ts, id) ties
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.windows import event_dedup_window

    rng = np.random.default_rng(229)
    n = 8_000
    ts = np.datetime64("2024-01-01T00:00:00", "us") + rng.integers(
        0, 3 * 86_400, n
    ).astype("timedelta64[s]").astype("timedelta64[us]")
    uid = rng.integers(0, 300, n).astype(np.int64)
    etype = np.array(["view", "click", "buy"])[rng.integers(0, 3, n)]
    eid = rng.permutation(n).astype(np.int64)
    # duplicate timestamps to exercise the id tie-break
    ts[1::7] = ts[::7][: ts[1::7].shape[0]]
    df = pd.DataFrame({"event_id": eid, "ts": ts, "user_id": uid, "event_type": etype})
    win = df["ts"].dt.floor("10min")
    dd = df.assign(window_start=win).sort_values(["ts", "event_id"])
    first = dd.groupby(["user_id", "event_type", "window_start"], as_index=False).first()
    want = sorted(
        map(
            tuple,
            first[["user_id", "event_type", "window_start", "event_id"]].to_numpy(),
        )
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = event_dedup_window(ds, minutes=10).take_all()
        got = sorted(
            (r["user_id"], r["event_type"], pd.Timestamp(r["window_start"]), r["event_id"])
            for r in out
        )
        assert got == want


def test_point_clusters_matches_union_find(ray_session):
    # fixed-radius clustering vs brute-force pairs + union-find
    ray = ray_session
    from python_prtree_ray.pipelines.graph import point_clusters

    rng = np.random.default_rng(233)
    n, radius = 600, 0.03
    px, py = rng.random(n), rng.random(n)
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    d2 = (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
    ii, jj = np.nonzero(np.triu(d2 <= radius * radius, k=1))
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(ids[ii], ids[jj]):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    in_pairs = set(ids[ii].tolist()) | set(ids[jj].tolist())
    want = sorted((x, find(x)) for x in in_pairs)
    t = pa.table({"query_id": ids, "px": px, "py": py})
    out = point_clusters(
        ray.data.from_arrow(t).repartition(5), radius=radius, res=4
    ).take_all()
    got = sorted((r["doc_id"], r["cluster_id"]) for r in out)
    assert got == want


def test_quality_filter_adaptive_matches_numpy(ray_session):
    # per-lang R-7 median threshold filter vs numpy quantile recompute
    ray = ray_session
    import re

    from python_prtree_ray.pipelines.text import quality_filter_adaptive

    rng = np.random.default_rng(239)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 300)]
    texts = [
        "".join(rng.choice(list("abc 123!?"), size=rng.integers(1, 40)))
        for _ in range(300)
    ]
    ids = np.arange(300, dtype=np.int64)
    qp = np.array(
        [len(re.findall("[a-zA-Z]", t)) * 100 // max(len(t), 1) for t in texts],
        dtype=np.int64,
    )
    want = []
    for lg in np.unique(langs):
        m = langs == lg
        thr = np.quantile(qp[m].astype(np.float64), 0.5)  # R-7 'linear'
        want += [
            (int(i), lg, int(v)) for i, v in zip(ids[m], qp[m]) if v >= thr
        ]
    want = sorted(want)
    t = pa.table({"doc_id": ids, "text": texts, "lang": langs})
    out = quality_filter_adaptive(
        ray.data.from_arrow(t).repartition(6), q=0.5
    ).take_all()
    got = sorted((r["doc_id"], r["lang"], r["quality_pct"]) for r in out)
    assert got == want


def test_doc_tfidf_top_matches_counter(ray_session):
    # integer tf-idf argmax per doc vs a Counter recompute
    ray = ray_session
    import re
    from collections import Counter

    from python_prtree_ray.pipelines.text import doc_tfidf_top

    rng = np.random.default_rng(241)
    vocab = ["common", "rare", "mid", "zz", "aa"]
    probs = np.array([0.6, 0.05, 0.2, 0.1, 0.05])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 15), p=probs))
        for _ in range(250)
    ]
    ids = np.arange(250, dtype=np.int64)
    toks = [re.findall("[a-z]+", t.lower()) for t in texts]
    df = Counter(w for ws in toks for w in set(ws))
    n_docs = len(texts)
    want = []
    for i, ws in zip(ids, toks):
        if not ws:
            continue
        tf = Counter(ws)
        scored = sorted(
            ((tf[w] * n_docs) // df[w], w) for w in tf
        )
        best = max(scored, key=lambda sw: (sw[0], [-ord(c) for c in sw[1]]))
        # ties: max score, then lexicographically smallest word
        top = sorted([sw for sw in scored if sw[0] == best[0]], key=lambda x: x[1])[0]
        want.append((int(i), top[1], int(top[0])))
    want = sorted(want)
    t = pa.table({"doc_id": ids, "text": texts})
    for blocks in (1, 6):
        out = doc_tfidf_top(ray.data.from_arrow(t).repartition(blocks)).take_all()
        got = sorted((r["doc_id"], r["word"], r["score"]) for r in out)
        assert got == want


def test_dedup_survivors_with_explicit_pairs(ray_session):
    # survivors = all docs minus non-canonical cluster members
    ray = ray_session
    from python_prtree_ray.pipelines.graph import dedup_survivors

    docs = pa.table(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "lang": pa.array(list("abcdefghij")),
        }
    )
    # clusters: {1,3,5}, {7,8}; canonical 1 and 7 → drop 3,5,8
    pairs = pa.table(
        {
            "id_a": np.array([3, 5, 7], dtype=np.int64),
            "id_b": np.array([1, 3, 8], dtype=np.int64),
        }
    )
    out = dedup_survivors(
        ray.data.from_arrow(docs).repartition(3),
        ray.data.from_arrow(pairs),
        carry_cols=("lang",),
    ).take_all()
    got = sorted(r["doc_id"] for r in out)
    assert got == [0, 1, 2, 4, 6, 7, 9]


def test_session_join_matches_pandas(ray_session):
    # session-scoped stream-stream join: pairs inside the same gap
    # session vs a row-at-a-time recomputation, invariant across
    # partitionings; other event types keep a session alive
    ray = ray_session
    from python_prtree_ray.pipelines.windows import session_join

    rng = np.random.default_rng(131)
    n = 3000
    uid = rng.integers(0, 60, n).astype(np.int64)
    ts = rng.integers(0, 3_600_000_000 * 4, n).astype(np.int64)  # 4h span, us
    types = np.array(["view", "click", "purchase", "error"])[
        rng.integers(0, 4, n)
    ]
    eid = np.arange(n, dtype=np.int64)
    gap_us = 30 * 60_000_000

    # brute force: per user, sort by (ts, eid), break on gap, pair
    want = set()
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((eid[m], ts[m]))
        uts, ueid, utyp = ts[m][order], eid[m][order], types[m][order]
        sess = np.cumsum(np.r_[True, np.diff(uts) > gap_us]) - 1
        for s in np.unique(sess):
            sm = sess == s
            for a in ueid[sm][utyp[sm] == "purchase"]:
                for b in ueid[sm][utyp[sm] == "view"]:
                    want.add((int(u), int(a), int(b)))

    t = pa.table(
        {
            "event_id": eid,
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": uid,
            "event_type": types,
        }
    )
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = session_join(ds, "purchase", "view", gap_minutes=30).take_all()
        got = {(r["user_id"], r["l_id"], r["r_id"]) for r in out}
        assert got == want


def test_funnel_counts_matches_pandas(ray_session):
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.agg import funnel_counts

    rng = np.random.default_rng(137)
    n = 5000
    uid = rng.integers(0, 300, n).astype(np.int64)
    ts = rng.integers(0, 10_000_000, n).astype(np.int64)
    types = np.array(["signup", "click", "purchase", "view"])[
        rng.integers(0, 4, n)
    ]
    df = pd.DataFrame({"user_id": uid, "ts": ts, "event_type": types})
    m = df.pivot_table(
        index="user_id", columns="event_type", values="ts", aggfunc="min"
    )
    for c in ("signup", "click", "purchase"):
        if c not in m:
            m[c] = np.nan
    s1 = m["signup"].notna()
    s2 = s1 & (m["click"] > m["signup"])
    s3 = s2 & (m["purchase"] > m["click"])
    want = (int(s1.sum()), int(s2.sum()), int(s3.sum()))

    t = pa.table(
        {
            "user_id": uid,
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": types,
        }
    )
    for blocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = funnel_counts(ds).take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["n_stage1"], r["n_stage2"], r["n_stage3"]) == want


def test_pricing_summary_matches_pandas(ray_session):
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.agg import pricing_summary

    rng = np.random.default_rng(139)
    n = 8000
    flag = np.array(["A", "N", "R"])[rng.integers(0, 3, n)]
    stat = np.array(["F", "O"])[rng.integers(0, 2, n)]
    qty = rng.uniform(1, 50, n)
    ep = rng.uniform(900, 100_000, n)
    disc = rng.uniform(0, 0.1, n)
    tax = rng.uniform(0, 0.08, n)
    ship = rng.integers(0, 2_000_000, n).astype(np.int64)
    cut = 1_500_000

    df = pd.DataFrame(
        {
            "f": flag,
            "s": stat,
            "qty_c": np.floor(qty * 100.0).astype(np.int64),
            "price_c": np.floor(ep * 100.0).astype(np.int64),
            "dp_c": np.floor((ep * (1.0 - disc)) * 100.0).astype(np.int64),
            "ch_c": np.floor(((ep * (1.0 - disc)) * (1.0 + tax)) * 100.0).astype(
                np.int64
            ),
        }
    )[ship <= cut]
    g = df.groupby(["f", "s"])
    want = {
        (f, s): (
            int(v["qty_c"].sum()),
            int(v["price_c"].sum()),
            int(v["dp_c"].sum()),
            int(v["ch_c"].sum()),
            int(v["qty_c"].sum()) // len(v),
            int(v["price_c"].sum()) // len(v),
            len(v),
        )
        for (f, s), v in g
    }

    t = pa.table(
        {
            "l_returnflag": flag,
            "l_linestatus": stat,
            "l_quantity": qty,
            "l_extendedprice": ep,
            "l_discount": disc,
            "l_tax": tax,
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        }
    )
    cutoff = str(np.datetime64(cut, "us")).replace("T", " ")
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = pricing_summary(ds, cutoff=cutoff).take_all()
        got = {
            (r["l_returnflag"], r["l_linestatus"]): (
                r["sum_qty_c"],
                r["sum_price_c"],
                r["sum_disc_price_c"],
                r["sum_charge_c"],
                r["avg_qty_c"],
                r["avg_price_c"],
                r["count_order"],
            )
            for r in out
        }
        assert got == want


def test_spatial_semi_join_both_paths_match_brute_force(ray_session):
    ray = ray_session
    import pytest as _pytest

    rng = np.random.default_rng(149)
    boxes = random_boxes(rng, 600, 0.05)
    qboxes = random_boxes(rng, 40, 0.08)
    ids = np.arange(600, dtype=np.int64)
    qids = np.arange(40, dtype=np.int64)
    qi, bi = brute_force_pairs(qboxes, boxes)
    hit = np.zeros(600, dtype=bool)
    hit[bi] = True
    want_semi = sorted(ids[hit].tolist())
    want_anti = sorted(ids[~hit].tolist())

    bds = _boxes_ds(ray, boxes, ids)
    qds = _boxes_ds(ray, qboxes, qids, id_name="query_id", blocks=2)
    # broadcast (bitmask) path
    got_semi = sorted(r["idx"] for r in sj.spatial_semi_join(bds, qds).take_all())
    got_anti = sorted(
        r["idx"] for r in sj.spatial_semi_join(bds, qds, anti=True).take_all()
    )
    assert got_semi == want_semi
    assert got_anti == want_anti
    # composed cell-shuffle + hash semi/anti fallback (query side "too big")
    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(sj, "BROADCAST_LIMIT", 1)
        got_semi2 = sorted(
            r["idx"] for r in sj.spatial_semi_join(bds, qds).take_all()
        )
        got_anti2 = sorted(
            r["idx"] for r in sj.spatial_semi_join(bds, qds, anti=True).take_all()
        )
    finally:
        mp.undo()
    assert got_semi2 == want_semi
    assert got_anti2 == want_anti


def test_source_dedup_stats_matches_pandas(ray_session):
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.dedup import source_dedup_stats

    rng = np.random.default_rng(151)
    n = 4000
    src = np.array([f"src{i}" for i in range(12)])[rng.integers(0, 12, n)]
    texts = np.array([f"doc body {i}" for i in range(500)])[
        rng.integers(0, 500, n)
    ]
    df = pd.DataFrame({"source": src, "text": texts})
    want = {
        s: (len(v), v["text"].nunique())
        for s, v in df.groupby("source")
    }
    t = pa.table({"source": src, "text": texts})
    for blocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = source_dedup_stats(ds).take_all()
        got = {r["source"]: (r["n_docs"], r["n_unique"]) for r in out}
        assert got == want


def test_bucketed_reduce_min_max_matches_pandas(ray_session):
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.merge import bucketed_sum

    rng = np.random.default_rng(157)
    k = rng.integers(0, 2_000, 10_000).astype(np.int64)
    a = rng.integers(-1_000, 1_000, 10_000).astype(np.int64)
    t = pa.table({"k": k, "a": a})
    df = pd.DataFrame({"k": k, "a": a})
    for reduce, fn in (("min", "min"), ("max", "max")):
        want = df.groupby("k", as_index=False)["a"].agg(fn)
        want_t = sorted(map(tuple, want.to_numpy()))
        ds = ray.data.from_arrow(t).repartition(7)
        out = bucketed_sum(ds, key_col="k", value_cols=("a",), reduce=reduce).take_all()
        got = sorted((r["k"], r["a"]) for r in out)
        assert got == want_t


def test_ann_classify_matches_brute_force(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.ann import ann_classify

    rng = np.random.default_rng(163)
    n, d, k = 400, 16, 5
    emb = rng.normal(size=(n, d)).astype(np.float64)
    labels = rng.integers(0, 7, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    qv, qids = emb[:8], ids[:8]

    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    sims = en @ qn.T  # (n, m)
    want = {}
    for j, qid in enumerate(qids):
        order = np.lexsort((ids, -sims[:, j]))[:k]
        ls = labels[order]
        vals, cnts = np.unique(ls, return_counts=True)
        win = vals[cnts == cnts.max()].min()
        want[int(qid)] = int(win)

    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": labels.astype(np.int32),
        }
    )
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        # float32 storage: recompute the oracle in the same precision
        emb32 = np.stack(
            t.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        en32 = emb32 / np.maximum(
            np.linalg.norm(emb32, axis=1, keepdims=True), 1e-30
        )
        qn32 = en32[:8]
        sims32 = en32 @ qn32.T
        want32 = {}
        for j, qid in enumerate(qids):
            order = np.lexsort((ids, -sims32[:, j]))[:k]
            ls = labels[order]
            vals, cnts = np.unique(ls, return_counts=True)
            want32[int(qid)] = int(vals[cnts == cnts.max()].min())
        out = ann_classify(ds, emb32[:8], qids, k=k).take_all()
        got = {r["query_id"]: r["label"] for r in out}
        assert got == want32


def test_weighted_sample_matches_formula_and_partitioning(ray_session):
    ray = ray_session
    from python_prtree_ray.functions import derive
    from python_prtree_ray.pipelines.sample import SAMPLE_CHANNEL, weighted_sample

    rng = np.random.default_rng(167)
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(0, 600, n).astype(np.int64)
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    pct = np.minimum(w // 5, 100)
    want = set(ids[(ids * a + b) % derive.MOD < derive.MOD * pct // 100].tolist())
    t = pa.table({"doc_id": ids, "n_chars": w})
    got_sets = []
    for blocks in (1, 11):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = weighted_sample(ds, "doc_id", "n_chars", divisor=5).take_all()
        got_sets.append({r["doc_id"] for r in out})
    assert got_sets[0] == got_sets[1] == want
    # long rows are kept with certainty, zero-weight rows never
    kept = got_sets[0]
    assert all(i in kept for i in ids[w >= 500])
    assert all(i not in kept for i in ids[w < 5])


def test_mapped_rollup_matches_pandas_and_rejects_unmapped(ray_session):
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.agg import mapped_rollup

    rng = np.random.default_rng(173)
    n = 5000
    k = rng.integers(0, 25, n).astype(np.int64)
    v = rng.uniform(-1000, 1000, n)
    key_map = {i: i % 5 for i in range(25)}
    df = pd.DataFrame(
        {"g": [key_map[x] for x in k], "c": np.floor(v * 100.0).astype(np.int64)}
    )
    want = {
        int(g): (len(d), int(d["c"].sum())) for g, d in df.groupby("g")
    }
    t = pa.table({"k": k, "v": v})
    ds = ray.data.from_arrow(t).repartition(6)
    out = mapped_rollup(ds, "k", "v", key_map).take_all()
    got = {r["gkey"]: (r["n_rows"], r["sum_c"]) for r in out}
    assert got == want
    # unmapped key -> loud failure, not a dropped row
    bad = ray.data.from_arrow(pa.table({"k": np.array([99], np.int64), "v": [1.0]}))
    import pytest as _pytest

    with _pytest.raises(Exception):
        mapped_rollup(bad, "k", "v", key_map).take_all()


def test_doc_repetition_matches_counter(ray_session):
    # bigram repetition stats vs a slow Counter reference, parallelism-invariant
    ray = ray_session
    import re
    from collections import Counter

    from python_prtree_ray.pipelines.curation import doc_repetition

    rng = np.random.default_rng(31)
    words = ["a", "bb", "ccc", "spark", "join"]
    texts = [
        " ".join(words[rng.integers(len(words))] for _ in range(rng.integers(0, 9)))
        for _ in range(300)
    ]
    want = {}
    for i, txt in enumerate(texts):
        toks = re.findall("[a-z]+", txt.lower())
        bgs = Counter(zip(toks, toks[1:]))
        if bgs:
            want[i] = (
                sum(bgs.values()),
                len(bgs),
                max(bgs.values()),
            )
    t = pa.table({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["distinct_bigrams"], r["top_bigram_count"])
            for r in doc_repetition(ds).take_all()
        }
        assert got == want


def test_decontaminate_matches_reference(ray_session):
    # 3-gram contamination counts vs a slow set-based reference; the
    # planted duplicate text guarantees hits across the modulus split
    ray = ray_session
    import re

    from python_prtree_ray.pipelines.curation import decontaminate

    rng = np.random.default_rng(47)
    words = ["w%d" % i for i in range(12)]
    n_docs, mod, n = 120, 10, 3
    texts = [
        " ".join(words[rng.integers(len(words))] for _ in range(20))
        for _ in range(n_docs)
    ]
    texts[37] = texts[0]  # exact copy of a benchmark doc (0 % 10 == 0)
    texts[55] = "x " + texts[20]  # shifted copy of benchmark doc 20

    def grams(txt):
        toks = re.findall("[a-z]+", txt.lower())
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench = set()
    for i in range(0, n_docs, mod):
        bench |= grams(texts[i])
    want = {}
    for i in range(n_docs):
        if i % mod == 0:
            continue
        hits = len(grams(texts[i]) & bench)
        if hits:
            want[i] = hits
    t = pa.table({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    assert 37 in want and 55 in want
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["doc_id"]: r["n_hits"]
            for r in decontaminate(ds, n=n, bench_modulus=mod).take_all()
        }
        assert got == want


def test_search_topk_matches_counter(ray_session):
    # integer tf-idf retrieval vs a slow reference with (score desc, id) ties
    ray = ray_session
    import re

    from python_prtree_ray.pipelines.curation import search_topk

    rng = np.random.default_rng(93)
    vocab = ["spark", "join", "window", "noise", "pad", "x"]
    texts = [
        " ".join(vocab[rng.integers(len(vocab))] for _ in range(rng.integers(0, 15)))
        for _ in range(400)
    ]
    terms = ("spark", "window")
    toks = [re.findall("[a-z]+", t.lower()) for t in texts]
    df = {t: sum(1 for tk in toks if t in tk) for t in terms}
    n_docs = len(texts)
    scores = {}
    for i, tk in enumerate(toks):
        s = sum(tk.count(t) * (n_docs // df[t]) for t in terms if df[t])
        if s > 0:
            scores[i] = s
    k = 7
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    want = [(i, s, r + 1) for r, (i, s) in enumerate(ranked)]
    t = pa.table({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    for blocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = search_topk(ds, terms=terms, k=k).take_all()
        got = sorted(
            ((r["doc_id"], r["score"], r["rank"]) for r in out), key=lambda x: x[2]
        )
        assert got == want


def test_hotspot_cells_matches_numpy(ray_session):
    # 3x3 focal-sum density vs a dense-grid numpy reference
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import hotspot_cells

    rng = np.random.default_rng(71)
    res, g = 3, 8
    n = 500
    pts = rng.random((n, 2))
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    dense = np.zeros((g, g), np.int64)
    np.add.at(dense, (ix, iy), 1)
    # focal sum = 3x3 in-grid neighborhood sum
    padded = np.zeros((g + 2, g + 2), np.int64)
    padded[1:-1, 1:-1] = dense
    focal = sum(
        padded[1 + dx : g + 1 + dx, 1 + dy : g + 1 + dy]
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    want = {
        cx * g + cy: (dense[cx, cy], focal[cx, cy])
        for cx in range(g)
        for cy in range(g)
        if dense[cx, cy] > 0
    }
    for blocks in (1, 6):
        ds = _points_ds(ray, pts, np.arange(n), blocks=blocks)
        got = {
            r["cell"]: (r["n_points"], r["focal_sum"])
            for r in hotspot_cells(ds, res=res).take_all()
        }
        assert got == want


def test_trajectory_length_matches_pandas(ray_session):
    # per-user L1 path length vs a pandas sort+diff reference, with
    # duplicate timestamps broken by the seq column
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.trajectory import trajectory_length

    rng = np.random.default_rng(83)
    n, n_users = 600, 25
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 50, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "gx": rng.integers(0, 1024, n).astype(np.int64),
            "gy": rng.integers(0, 1024, n).astype(np.int64),
        }
    )
    want = {}
    for uid, grp in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        if len(grp) < 2:
            continue
        steps = (
            grp["gx"].diff().abs().dropna() + grp["gy"].diff().abs().dropna()
        ).astype(np.int64)
        want[uid] = (len(steps), int(steps.sum()))
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = {
            r["user_id"]: (r["n_moves"], r["l1_len"])
            for r in trajectory_length(ds).take_all()
        }
        assert got == want


def test_kmeans_matches_reference_and_parallelism_invariant(ray_session):
    # distributed exact-int Lloyd's vs the single-process twin, and
    # bit-identical across block counts
    ray = ray_session
    from python_prtree_ray.pipelines.kmeans import (
        kmeans,
        kmeans_fit,
        kmeans_reference,
    )

    rng = np.random.default_rng(59)
    n, d, k, iters = 300, 16, 5, 3
    # three planted blobs + noise so clusters are non-trivial
    centers = rng.normal(0, 1, (3, d))
    # store as float32 (the table dtype) and quantize the reference from
    # the same float32 values so both paths see identical ints
    vecs = (centers[rng.integers(0, 3, n)] + rng.normal(0, 0.15, (n, d))).astype(
        np.float32
    )
    ids = np.arange(n, dtype=np.int64)
    want_cent, want_n, want_inert = kmeans_reference(vecs, ids, k, iters)

    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel()), d
            ),
        }
    )
    results = []
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        cent = kmeans_fit(ds, k=k, iters=iters)
        assert np.array_equal(cent, want_cent)
        rows = sorted(
            (r["cluster_id"], r["n_members"], r["inertia_q"])
            for r in kmeans(ds, k=k, iters=iters).take_all()
        )
        results.append(rows)
    assert results[0] == results[1]
    got_n = np.array([r[1] for r in results[0]])
    got_inert = np.array([r[2] for r in results[0]])
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_inert, want_inert)


def _tracks_df(seed=101, n=600, n_users=20, grid=64):
    import pandas as pd

    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 40, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "gx": rng.integers(0, grid, n).astype(np.int64),
            "gy": rng.integers(0, grid, n).astype(np.int64),
        }
    )


def test_od_matrix_matches_pandas(ray_session):
    # origin->destination transition counts vs a pandas shift reference
    ray = ray_session
    from collections import Counter

    from python_prtree_ray.pipelines.movement import od_matrix

    res, g = 6, 64
    df = _tracks_df(grid=g)
    want = Counter()
    for _, grp in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cells = (grp["gx"] * g + grp["gy"]).to_numpy()
        for a, b in zip(cells[:-1], cells[1:]):
            want[(a, b)] += 1
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = {
            (r["from_cell"], r["to_cell"]): r["n_moves"]
            for r in od_matrix(ds, res=res).take_all()
        }
        assert got == dict(want)


def test_cell_dwell_matches_pandas(ray_session):
    # per-cell dwell microseconds vs a pandas shift reference
    ray = ray_session
    from collections import defaultdict

    from python_prtree_ray.pipelines.movement import cell_dwell

    res, g = 6, 64
    df = _tracks_df(seed=113, grid=g)
    want = defaultdict(lambda: [0, 0])
    for _, grp in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cells = (grp["gx"] * g + grp["gy"]).to_numpy()
        ts = grp["ts"].astype("int64").to_numpy()  # ns epoch
        for c, dt in zip(cells[:-1], np.diff(ts) // 1000):
            want[c][0] += 1
            want[c][1] += int(dt)
    for blocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = {
            r["cell"]: [r["n_visits"], r["dwell_us"]]
            for r in cell_dwell(ds, res=res).take_all()
        }
        assert got == dict(want)


def test_event_transitions_matches_pandas(ray_session):
    # event-type Markov counts vs a pandas shift reference
    ray = ray_session
    import pandas as pd
    from collections import Counter

    from python_prtree_ray.pipelines.movement import event_transitions

    rng = np.random.default_rng(131)
    n, n_users = 500, 15
    types = ["view", "click", "purchase", "scroll"]
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(rng.integers(0, 30, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": [types[i] for i in rng.integers(0, len(types), n)],
        }
    )
    want = Counter()
    for _, grp in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        tv = grp["event_type"].to_numpy()
        for a, b in zip(tv[:-1], tv[1:]):
            want[(a, b)] += 1
    for blocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = {
            (r["from_type"], r["to_type"]): r["n"]
            for r in event_transitions(ds).take_all()
        }
        assert got == dict(want)


def test_nn_pairs_matches_brute_force(ray_session):
    # nearest-other-point vs O(N^2) argmin with (dist2, id) tie-break,
    # including exact coordinate collisions
    ray = ray_session
    from python_prtree_ray.pipelines.knn import nn_pairs

    rng = np.random.default_rng(149)
    n = 220
    pts = rng.random((n, 2))
    pts[50] = pts[10]  # exact collision pair
    pts[51] = pts[10]  # triple collision
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    want = {}
    for i in range(n):
        best = np.min(d2[i])
        want[i] = int(np.flatnonzero(d2[i] == best)[0])  # lowest id wins
    for blocks in (1, 5):
        ds = _points_ds(ray, pts, np.arange(n), blocks=blocks)
        got = {r["query_id"]: r["nn_id"] for r in nn_pairs(ds).take_all()}
        assert got == want


def test_grouped_moments_matches_pandas(ray_session):
    # exact integer moments per key vs a pandas reference
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.stats import grouped_moments

    rng = np.random.default_rng(157)
    n = 800
    keys = [f"k{i}" for i in rng.integers(0, 6, n)]
    vals = rng.random(n) * 300
    c = np.floor(vals * 100).astype(np.int64)
    df = pd.DataFrame({"event_type": keys, "c": c})
    want = {
        k: (
            len(g),
            int(g["c"].sum()),
            int((g["c"] ** 2).sum()),
            int(g["c"].min()),
            int(g["c"].max()),
        )
        for k, g in df.groupby("event_type")
    }
    t = pa.table({"event_type": keys, "value": vals})
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["event_type"]: (
                r["n"],
                r["sum_c"],
                r["sum_sq_c"],
                r["min_c"],
                r["max_c"],
            )
            for r in grouped_moments(ds).take_all()
        }
        assert got == want


def test_value_histogram_matches_numpy(ray_session):
    # clamped fixed-width histogram per key vs a numpy reference
    ray = ray_session
    from collections import Counter

    from python_prtree_ray.pipelines.stats import value_histogram

    rng = np.random.default_rng(163)
    n, width, nb = 700, 700, 8
    keys = [f"t{i}" for i in rng.integers(0, 4, n)]
    vals = rng.random(n) * 80  # cents up to 8000 -> top bin clamps
    c = np.floor(vals * 100).astype(np.int64)
    b = np.clip(c // width, 0, nb - 1)
    want = Counter(zip(keys, b.tolist()))
    t = pa.table({"event_type": keys, "value": vals})
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            (r["event_type"], r["bin"]): r["n"]
            for r in value_histogram(
                ds, bin_width_c=width, n_bins=nb
            ).take_all()
        }
        assert got == dict(want)


def test_parameter_guards_reject_unsafe_inputs(ray_session):
    # guards added per round-3 advice: regex-unsafe search terms, od_matrix
    # key-packing overflow, duplicate-id kmeans seed window
    ray = ray_session
    import pytest

    from python_prtree_ray.pipelines.curation import search_topk
    from python_prtree_ray.pipelines.kmeans import kmeans_fit
    from python_prtree_ray.pipelines.movement import od_matrix

    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["spark join", "window"]})
    )
    for bad in ("a.b", "Spark", "a+", "", "a b"):
        with pytest.raises(ValueError, match="a-z"):
            search_topk(docs, terms=(bad,), k=3)

    tracks = ray.data.from_pandas(_tracks_df(grid=64))
    with pytest.raises(ValueError, match="res"):
        od_matrix(tracks, res=16)

    # duplicate vec_id inside the k-smallest window must raise, not pick
    # a partition-order-dependent row
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((10, 4)).astype(np.float32)
    ids = np.array([0, 0, 1, 2, 3, 4, 5, 6, 7, 8], dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel()), 4
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="duplicate"):
        kmeans_fit(ds, k=3, iters=1)

    # duplicate id STRADDLING the k-th-smallest boundary (ids 0,1,2,2 at
    # k=3: the window [0,1,2] is unique but which id-2 row enters it is
    # partition-order-dependent) must also raise
    ids = np.array([0, 1, 2, 2, 3, 4, 5, 6, 7, 8], dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel()), 4
            ),
        }
    )
    with pytest.raises(ValueError, match="duplicate"):
        kmeans_fit(ray.data.from_arrow(t), k=3, iters=1)

    # colocation pair packing: negative or >=2^31 user ids corrupt the
    # packed key — both must raise (a real check, not an assert)
    from python_prtree_ray.pipelines.movement import colocation_pairs

    for bad_ids in ([-1, 2, 3], [1, 2, 1 << 31]):
        visits = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(bad_ids, pa.int64()),
                    "cell": pa.array([7, 7, 7], pa.int64()),
                }
            )
        )
        # the ValueError fires inside a Ray task, so it surfaces wrapped
        # as RayTaskError(UserCodeException) — match on the message
        with pytest.raises(Exception, match="2\\^31"):
            colocation_pairs(
                visits, user_col="user_id", cell_col="cell", min_shared=1
            ).take_all()


def test_search_bm25_matches_reference(ray_session):
    # BM25 (k1=1.5, b=0.75, rational idf) vs a slow float reference with
    # (score desc, id) ties; partitioning-invariant
    ray = ray_session
    import re as _re

    from python_prtree_ray.pipelines.curation import search_bm25

    rng = np.random.default_rng(94)
    vocab = ["spark", "join", "window", "noise", "pad", "x"]
    texts = [
        " ".join(vocab[rng.integers(len(vocab))] for _ in range(rng.integers(0, 15)))
        for _ in range(400)
    ]
    terms = ("spark", "window")
    toks = [_re.findall("[a-z]+", t.lower()) for t in texts]
    n = float(len(texts))
    dls = [len(tk) for tk in toks]
    avgdl = float(sum(dls)) / n
    df = {t: float(sum(1 for tk in toks if t in tk)) for t in terms}
    idf = {t: ((n - df[t]) + 0.5) / (df[t] + 0.5) for t in terms}
    scores = {}
    for i, tk in enumerate(toks):
        denom = 1.5 * (0.25 + 0.75 * (float(dls[i]) / avgdl))
        s = 0.0
        for t in terms:
            tf = float(tk.count(t))
            s = s + idf[t] * ((tf * 2.5) / (tf + denom))
        if s > 0:
            scores[i] = s
    k = 7
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    want = [(i, r + 1) for r, (i, _) in enumerate(ranked)]
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    for blocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = search_bm25(ds, terms=terms, k=k).take_all()
        got = sorted(((r["doc_id"], r["rank"]) for r in out), key=lambda x: x[1])
        assert got == want
        by_id = {r["doc_id"]: r["score"] for r in out}
        for i, _rank in want:
            assert by_id[i] == pytest.approx(scores[i], rel=1e-12)
    with pytest.raises(ValueError, match="terms must match"):
        search_bm25(ray.data.from_arrow(t), terms=("bad regex",))


def test_tile_neighbors_matches_set_logic(ray_session):
    # occupied-cell adjacency vs a brute-force set reference, zeros
    # included; partitioning-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_neighbors

    rng = np.random.default_rng(72)
    res = 4
    g = 1 << res
    pts = rng.random((500, 2))
    ids = np.arange(500, dtype=np.int64)
    ix = np.clip(np.floor(pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip(np.floor(pts[:, 1] * g).astype(np.int64), 0, g - 1)
    occ = set(map(tuple, np.stack([ix, iy], axis=1).tolist()))
    want = {}
    for cx, cy in occ:
        cnt = sum(
            1
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in occ
        )
        want[cx * g + cy] = cnt
    t = pa.table(
        {"query_id": ids, "px": pts[:, 0], "py": pts[:, 1]}
    )
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = tile_neighbors(ds, res=res).take_all()
        got = {r["cell"]: r["n_neighbors"] for r in out}
        assert got == want


def _dp_reference(x, y, eps):
    # straightforward recursive Douglas-Peucker, same integer deviation
    # test — the independent oracle for the stack-based engine kernel.
    # Within one segment the denominator is shared, so the max-deviation
    # point is simply the max numerator (FIRST max, like np.argmax).
    n = len(x)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j <= i + 1:
            return
        ax, ay = x[i], y[i]
        dx, dy = x[j] - ax, y[j] - ay
        den = dx * dx + dy * dy if (dx, dy) != (0, 0) else 1
        best, bi = -1, -1
        for t in range(i + 1, j):
            px, py = x[t] - ax, y[t] - ay
            if (dx, dy) == (0, 0):
                num = px * px + py * py
            else:
                cr = px * dy - py * dx
                num = cr * cr
            if num > best:
                best, bi = num, t
        if best > eps * eps * den:
            keep[bi] = True
            rec(i, bi)
            rec(bi, j)

    rec(0, n - 1)
    return keep


def test_trajectory_simplify_matches_recursive_dp(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import _dp_keep, trajectory_simplify

    rng = np.random.default_rng(73)
    # kernel-level: stack DP == recursive DP on random walks
    for _case in range(20):
        n = int(rng.integers(1, 40))
        x = np.cumsum(rng.integers(-5, 6, n)).astype(np.int64)
        y = np.cumsum(rng.integers(-5, 6, n)).astype(np.int64)
        got = _dp_keep(x, y, eps=2).tolist()
        assert got == _dp_reference(x.tolist(), y.tolist(), 2), (x, y)

    # large-coordinate regression: cross^2 needs up to ~86 bits at grid
    # coords near 2^20 — the old int64 num = cr*cr silently wrapped and
    # dropped points 700k cells off the baseline. The Python-int
    # comparison must agree with the exact recursive reference.
    x = np.array([0, 500_000, 1_000_000], dtype=np.int64)
    y = np.array([0, 700_000, 0], dtype=np.int64)
    got = _dp_keep(x, y, eps=2).tolist()
    assert got == [True, True, True]
    for _case in range(10):
        n = int(rng.integers(2, 30))
        x = np.cumsum(rng.integers(-(2**16), 2**16, n)).astype(np.int64)
        y = np.cumsum(rng.integers(-(2**16), 2**16, n)).astype(np.int64)
        for eps in (2, 10_000, 300_000):
            got = _dp_keep(x, y, eps=eps).tolist()
            assert got == _dp_reference(x.tolist(), y.tolist(), eps), (
                x, y, eps,
            )
            # DP guarantee: every dropped point lies within eps of the
            # simplified polyline's enclosing segment (exact Python-int
            # arithmetic — cr^2 exceeds int64 at these coordinates)
            kept = np.flatnonzero(got)
            for a, b in zip(kept[:-1], kept[1:]):
                dx, dy = int(x[b] - x[a]), int(y[b] - y[a])
                for t in range(a + 1, b):
                    px, py = int(x[t] - x[a]), int(y[t] - y[a])
                    if dx == 0 and dy == 0:
                        assert px * px + py * py <= eps * eps
                    else:
                        cr = px * dy - py * dx
                        assert cr * cr <= eps * eps * (dx * dx + dy * dy)

    # pipeline-level: per-track equality + partition invariance
    n_users, per = 30, 25
    rows = n_users * per
    users = np.repeat(np.arange(n_users, dtype=np.int64), per)
    ts = np.tile(
        np.datetime64("2024-01-01", "us")
        + np.arange(per).astype("timedelta64[us]"),
        n_users,
    )
    seq = np.arange(rows, dtype=np.int64)
    gx = np.concatenate(
        [np.cumsum(rng.integers(-3, 4, per)) for _ in range(n_users)]
    ).astype(np.int64)
    gy = np.concatenate(
        [np.cumsum(rng.integers(-3, 4, per)) for _ in range(n_users)]
    ).astype(np.int64)
    t = pa.table(
        {"user_id": users, "ts": ts, "event_id": seq, "gx": gx, "gy": gy}
    )
    want = set()
    for u in range(n_users):
        m = users == u
        keep = _dp_keep(gx[m], gy[m], eps=2)
        for s in seq[m][keep]:
            want.add((u, int(s)))
    outs = []
    for blocks in (2, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = trajectory_simplify(ds, eps=2).take_all()
        outs.append({(r["user_id"], r["event_id"]) for r in out})
        assert outs[-1] == want
    assert outs[0] == outs[1]


def test_geofence_events_matches_brute_force(ray_session):
    # zone transitions vs a per-row loop over the same hexagon set;
    # partitioning-invariant
    ray = ray_session
    from python_prtree_ray.functions import derive, geom
    from python_prtree_ray.pipelines.geofence import geofence_events

    rng = np.random.default_rng(81)
    n, n_users = 1200, 20
    users = rng.integers(0, n_users, n).astype(np.int64)
    ts = (
        np.datetime64("2024-03-01", "us")
        + rng.integers(0, 10**9, n).astype("timedelta64[us]")
    )
    seq = np.arange(n, dtype=np.int64)
    # concentrate points around the polygon band so transitions happen
    px = rng.random(n) * 0.9
    py = rng.random(n) * 0.9
    polys = derive.polygon_arrays()

    def zone_of(x, y):
        for pid, verts in polys:
            if geom.point_in_convex_polygon(
                np.array([x]), np.array([y]), verts
            )[0]:
                return pid
        return -1

    zones = np.array([zone_of(px[i], py[i]) for i in range(n)], dtype=np.int64)
    want = set()
    for u in range(n_users):
        idx = np.flatnonzero(users == u)
        order = idx[np.lexsort((seq[idx], ts[idx].astype(np.int64)))]
        for a, b in zip(order[:-1], order[1:]):
            if zones[a] != zones[b]:
                want.add((u, int(seq[b]), int(zones[a]), int(zones[b])))
    assert want  # the fixture must actually exercise transitions

    t = pa.table(
        {"user_id": users, "ts": ts, "event_id": seq, "px": px, "py": py}
    )
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = geofence_events(ds).take_all()
        got = {
            (r["user_id"], r["event_id"], r["from_zone"], r["to_zone"])
            for r in out
        }
        assert got == want


def _seg_intersect_scalar(a, b):
    # independent closed segment-intersection reference (ints)
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b

    def orient(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    def on_seg(sx1, sy1, sx2, sy2, px, py):
        return min(sx1, sx2) <= px <= max(sx1, sx2) and min(sy1, sy2) <= py <= max(
            sy1, sy2
        )

    o1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    o2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    o3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    o4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    if ((o1 > 0) != (o2 > 0)) and o1 != 0 and o2 != 0 and (
        (o3 > 0) != (o4 > 0)
    ) and o3 != 0 and o4 != 0:
        return True
    if o1 == 0 and on_seg(ax1, ay1, ax2, ay2, bx1, by1):
        return True
    if o2 == 0 and on_seg(ax1, ay1, ax2, ay2, bx2, by2):
        return True
    if o3 == 0 and on_seg(bx1, by1, bx2, by2, ax1, ay1):
        return True
    if o4 == 0 and on_seg(bx1, by1, bx2, by2, ax2, ay2):
        return True
    return False


def test_segment_crossings_matches_brute_force(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.geofence import segment_crossings

    rng = np.random.default_rng(82)
    res, max_move = 7, 16  # 128-grid, tile edge 2^(7-3)=16 == max_move
    n_users, per = 15, 30
    n = n_users * per
    users = np.repeat(np.arange(n_users, dtype=np.int64), per)
    ts = np.tile(
        np.datetime64("2024-03-01", "us")
        + np.arange(per).astype("timedelta64[us]") * 1000,
        n_users,
    )
    seq = np.arange(n, dtype=np.int64)
    # random walks with occasional teleports (gate exercise)
    gx = np.zeros(n, dtype=np.int64)
    gy = np.zeros(n, dtype=np.int64)
    for u in range(n_users):
        sl = slice(u * per, (u + 1) * per)
        sx = rng.integers(-9, 10, per)
        sy = rng.integers(-9, 10, per)
        tp = rng.random(per) < 0.1
        sx[tp] = rng.integers(-80, 81, tp.sum())
        sy[tp] = rng.integers(-80, 81, tp.sum())
        gx[sl] = np.clip(np.cumsum(sx) + 64, 0, 127)
        gy[sl] = np.clip(np.cumsum(sy) + 64, 0, 127)

    # brute force: gated segments, all cross-user pairs
    segs = []
    for u in range(n_users):
        idx = np.flatnonzero(users == u)
        order = idx[np.lexsort((seq[idx], ts[idx].astype(np.int64)))]
        for a, b in zip(order[:-1], order[1:]):
            if (
                abs(int(gx[b]) - int(gx[a])) <= max_move
                and abs(int(gy[b]) - int(gy[a])) <= max_move
            ):
                segs.append(
                    (u, int(seq[a]), (int(gx[a]), int(gy[a]), int(gx[b]), int(gy[b])))
                )
    want = set()
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            ua, sa, ga = segs[i]
            ub, sb, gb = segs[j]
            if ua == ub:
                continue
            if _seg_intersect_scalar(ga, gb):
                if ua > ub:
                    ua, sa, ub, sb = ub, sb, ua, sa
                want.add((ua, sa, ub, sb))
    assert want  # fixture must produce crossings

    t = pa.table(
        {"user_id": users, "ts": ts, "event_id": seq, "gx": gx, "gy": gy}
    )
    for blocks in (1, 9):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = segment_crossings(
            ds, max_move=max_move, res=res, bucket_res=3
        ).take_all()
        got = {(r["user_a"], r["seq_a"], r["user_b"], r["seq_b"]) for r in out}
        assert got == want
    with pytest.raises(ValueError, match="exceeds the bucket tile"):
        segment_crossings(ray.data.from_arrow(t), max_move=17, res=7, bucket_res=3)


def _hull_gift_wrap(pts):
    # independent gift-wrapping reference: CCW ring of the minimal hull
    pts = sorted(set(pts))
    if len(pts) == 1:
        return pts
    if len(pts) == 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    start = min(pts)
    hull = [start]
    cur = start
    while True:
        cand = None
        for p in pts:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            c = cross(cur, cand, p)
            if c < 0 or (
                c == 0
                and (abs(p[0] - cur[0]) + abs(p[1] - cur[1]))
                > (abs(cand[0] - cur[0]) + abs(cand[1] - cur[1]))
            ):
                cand = p
        hull.append(cand)
        cur = cand
        if cur == start:
            break
    return hull[:-1]


def test_trajectory_hull_matches_gift_wrapping(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import _hull_indices, trajectory_hull

    rng = np.random.default_rng(83)
    # kernel-level, incl. degenerate cases
    cases = [
        np.array([[3, 4]]),  # single point
        np.array([[1, 1], [5, 5], [3, 3], [1, 1]]),  # collinear + dup
        np.array([[0, 0], [4, 0], [2, 2], [2, 1]]),  # interior point
    ]
    for _ in range(25):
        m = int(rng.integers(1, 40))
        cases.append(rng.integers(0, 12, (m, 2)).astype(np.int64))
    for arr in cases:
        x, y = arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64)
        h = _hull_indices(x, y)
        ring = [(int(x[i]), int(y[i])) for i in h]
        want = _hull_gift_wrap([(int(a), int(b)) for a, b in arr])
        if len(want) > 2:
            # same CCW ring from the lexicographically smallest vertex
            k = want.index(min(want))
            want = want[k:] + want[:k]
            assert ring == want, (arr, ring, want)
        else:
            assert sorted(ring) == sorted(want), (arr, ring, want)

    # pipeline-level: per-user equality + partition invariance
    n_users, per = 12, 40
    users = np.repeat(np.arange(n_users, dtype=np.int64), per)
    gx = rng.integers(0, 200, n_users * per).astype(np.int64)
    gy = rng.integers(0, 200, n_users * per).astype(np.int64)
    ts = np.tile(
        np.datetime64("2024-03-01", "us")
        + np.arange(per).astype("timedelta64[us]"),
        n_users,
    )
    seq = np.arange(n_users * per, dtype=np.int64)
    t = pa.table(
        {"user_id": users, "ts": ts, "event_id": seq, "gx": gx, "gy": gy}
    )
    want_rows = set()
    for u in range(n_users):
        m = users == u
        h = _hull_indices(gx[m], gy[m])
        for k, i in enumerate(h):
            want_rows.add((u, k, int(gx[m][i]), int(gy[m][i])))
    for blocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = trajectory_hull(ds).take_all()
        got = {(r["user_id"], r["hull_seq"], r["gx"], r["gy"]) for r in out}
        assert got == want_rows


def _point_table(keys: np.ndarray) -> pa.Table:
    cols = derive.derive_points(keys)
    return pa.table(
        {"query_id": pa.array(keys.astype(np.int64)), **cols}
    )


def test_tile_topk_matches_bruteforce(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_topk

    keys = np.arange(1, 1201, dtype=np.int64)
    out = tile_topk(
        ray.data.from_arrow(_point_table(keys)).repartition(7), res=4, k=3
    ).take_all()
    # brute force: rank per cell by (-score, qid)
    p = derive.derive_points(keys)
    cell = derive.tile_cell(p["px"], p["py"], 4)
    score = derive.point_score(keys)
    expect = set()
    for c in np.unique(cell):
        m = cell == c
        order = sorted(zip(-score[m], keys[m]))
        for rank, (negs, qid) in enumerate(order[:3], 1):
            expect.add((int(c), int(qid), rank))
    got = {(r["cell"], r["query_id"], r["rank"]) for r in out}
    assert got == expect
    for r in out:
        assert r["score"] == derive.point_score(np.array([r["query_id"]]))[0]


def test_tile_quantiles_match_numpy(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_quantiles

    keys = np.arange(1, 2001, dtype=np.int64)
    out = tile_quantiles(
        ray.data.from_arrow(_point_table(keys)).repartition(9), res=2
    ).take_all()
    p = derive.derive_points(keys)
    cell = derive.tile_cell(p["px"], p["py"], 2)
    v = derive.point_measure(keys)
    assert len(out) == len(np.unique(cell))
    for r in out:
        m = v[cell == r["cell"]]
        for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            assert r[col] == pytest.approx(
                float(np.quantile(m, q)), abs=1e-12
            ), (r["cell"], col)


def test_idw_grid_exact_vs_bruteforce(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines import interpolate as ip

    keys = np.arange(1, 3001, dtype=np.int64)
    ds = ray.data.from_arrow(_point_table(keys)).repartition(11)
    out = {r["node"]: r for r in ip.idw_grid(ds).take_all()}
    p = derive.derive_points(keys)
    v = derive.point_measure(keys)
    g = 1 << ip.GRES
    r2 = ip.RADIUS * ip.RADIUS
    n_nodes = 0
    for i in range(g):
        for j in range(g):
            nx, ny = (i + 0.5) / g, (j + 0.5) / g
            dx = p["px"] - nx
            dy = p["py"] - ny
            d2 = dx * dx + dy * dy
            m = d2 <= r2
            if not m.any():
                assert i * g + j not in out
                continue
            n_nodes += 1
            w = np.floor(ip.WSCALE / (ip.EPS + d2[m])).astype(np.int64)
            row = out[i * g + j]
            assert row["n"] == int(m.sum())
            assert row["sum_w"] == int(w.sum())
            assert row["sum_wv"] == int((w * v[m]).sum())
            assert row["idw"] == float(int((w * v[m]).sum())) / float(int(w.sum()))
    assert n_nodes == len(out)


def test_haversine_join_matches_bruteforce(ray_session):
    ray = ray_session
    import math

    from python_prtree_ray.pipelines import geodesic as geo

    big = np.arange(1, 801, dtype=np.int64)
    small = np.arange(10_001, 10_041, dtype=np.int64)
    out = geo.haversine_join(
        ray.data.from_arrow(_point_table(big)).repartition(5),
        ray.data.from_arrow(_point_table(small)),
        max_km=700.0,
    ).take_all()
    pb, ps = derive.derive_points(big), derive.derive_points(small)
    blon, blat = geo._lonlat(pb["px"], pb["py"])
    slon, slat = geo._lonlat(ps["px"], ps["py"])
    expect = {}
    for i, qb in enumerate(big):
        for j, qs in enumerate(small):
            a = (
                math.sin((slat[j] - blat[i]) * geo.RAD * 0.5) ** 2
                + math.cos(blat[i] * geo.RAD)
                * math.cos(slat[j] * geo.RAD)
                * math.sin((slon[j] - blon[i]) * geo.RAD * 0.5) ** 2
            )
            d = geo.DIAM_KM * math.asin(math.sqrt(min(a, 1.0)))
            if d <= 700.0:
                expect[(int(qb), int(qs))] = d
    got = {(r["query_id"], r["idx"]): r["dist_km"] for r in out}
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k], rel=1e-12)


def test_dbscan_matches_bruteforce(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.graph import dbscan_clusters

    keys = np.arange(1, 601, dtype=np.int64)
    eps, min_pts = 0.05, 5
    out = dbscan_clusters(
        ray.data.from_arrow(_point_table(keys)).repartition(6),
        eps=eps,
        min_pts=min_pts,
    ).take_all()

    p = derive.derive_points(keys)
    px, py = p["px"], p["py"]
    dx = px[:, None] - px[None, :]
    dy = py[:, None] - py[None, :]
    d2 = dx * dx + dy * dy
    nb = (d2 <= eps * eps) & ~np.eye(keys.size, dtype=bool)
    deg = nb.sum(axis=1)
    in_graph = deg > 0
    core = (deg + 1) >= min_pts
    # CC over core-core edges (brute-force BFS)
    label = {int(keys[i]): None for i in np.flatnonzero(core)}
    for i in np.flatnonzero(core):
        if label[int(keys[i])] is not None:
            continue
        comp, stack = [], [i]
        seen = {i}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in np.flatnonzero(nb[u] & core):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        cid = int(keys[min(comp)])
        for u in comp:
            label[int(keys[u])] = cid
    expect = {}
    for i in np.flatnonzero(in_graph):
        k = int(keys[i])
        if core[i]:
            expect[k] = (label[k], "core")
        else:
            core_nb = np.flatnonzero(nb[i] & core)
            if core_nb.size:
                expect[k] = (
                    min(label[int(keys[j])] for j in core_nb),
                    "border",
                )
            else:
                expect[k] = (-1, "noise")
    got = {r["doc_id"]: (r["cluster_id"], r["role"]) for r in out}
    assert got == expect
    roles = {v[1] for v in expect.values()}
    assert roles == {"core", "border", "noise"}, "workload must exercise all roles"


def test_dbscan_spill_dir_identical(ray_session, tmp_path):
    # spill_dir checkpoints the eps-pair edge list (and the core-tagged
    # reuse table + CC edges) to parquet instead of pinning them in the
    # object store — the 100-TB escape hatch. Labels must be identical.
    ray = ray_session
    from python_prtree_ray.pipelines.graph import dbscan_clusters

    keys = np.arange(1, 601, dtype=np.int64)
    pts = ray.data.from_arrow(_point_table(keys)).repartition(6)
    base = {
        r["doc_id"]: (r["cluster_id"], r["role"])
        for r in dbscan_clusters(pts, eps=0.05, min_pts=5).take_all()
    }
    spilled = {
        r["doc_id"]: (r["cluster_id"], r["role"])
        for r in dbscan_clusters(
            pts, eps=0.05, min_pts=5, spill_dir=str(tmp_path)
        ).take_all()
    }
    assert spilled == base
    # the spill path really wrote edge checkpoints
    import os

    assert any(d.startswith("dbscan-pairs-") for d in os.listdir(tmp_path))
    assert any(d.startswith("dbscan-tagged-") for d in os.listdir(tmp_path))


def test_doc_chunks_layout(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.packing import doc_chunks

    texts = ["w " * n for n in [1, 95, 96, 97, 128, 129, 400]]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = doc_chunks(ray.data.from_arrow(t), chunk=128, stride=96).take_all()
    import pyarrow.compute as pc

    n_tok = [
        len(s.split(" ")) for s in texts
    ]  # trailing "" token matches the \s+ split semantics? verify below
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tok"])
        )
    for d, chunks in got.items():
        chunks.sort()
        n = pc.list_value_length(
            pc.split_pattern_regex(pa.array([texts[d]]), r"\s+")
        )[0].as_py()
        assert len(chunks) == (n - 1) // 96 + 1
        for cid, start, ntk in chunks:
            assert start == cid * 96
            assert ntk == min(128, n - start) and ntk > 0
        # full coverage: last chunk reaches the doc end
        assert chunks[-1][1] + chunks[-1][2] == n


def test_doc_lm_freq_matches_counter(ray_session):
    ray = ray_session
    from collections import Counter

    from python_prtree_ray.pipelines.curation import doc_lm_freq

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat",
        "zebra!!",
        "0123 456",  # no [a-z]+ tokens -> absent from output
        "cat cat cat",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = {r["doc_id"]: r for r in doc_lm_freq(
        ray.data.from_arrow(t).repartition(3)
    ).take_all()}
    import re as _re

    corpus = Counter()
    doc_toks = []
    for s in texts:
        toks = _re.findall(r"[a-z]+", s.lower())
        doc_toks.append(toks)
        corpus.update(toks)
    for d, toks in enumerate(doc_toks):
        if not toks:
            assert d not in out
            continue
        sum_f = sum(corpus[w] for w in toks)
        assert out[d]["n_tokens"] == len(toks)
        assert out[d]["sum_freq"] == sum_f
        assert out[d]["mean_freq"] == sum_f / len(toks)


def test_pii_scrub_counts_and_lengths(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.text import pii_scrub

    texts = [
        "mail me at a.b+c@foo-bar.org today",
        "see https://x.io/a?b=c#d and http://y.z/e f@g.hh",
        "no pii here",
        "u@v.ww u@v.ww https://a.b/c",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = {r["doc_id"]: r for r in pii_scrub(ray.data.from_arrow(t)).take_all()}
    assert out[0]["n_emails"] == 1 and out[0]["n_urls"] == 0
    assert out[1]["n_urls"] == 2 and out[1]["n_emails"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_urls"] == 0
    assert out[2]["clean_chars"] == len("no pii here")
    assert out[3]["n_emails"] == 2 and out[3]["n_urls"] == 1
    assert out[3]["clean_chars"] == len("<EMAIL> <EMAIL> <URL>")


def test_colocation_pairs_matches_bruteforce(ray_session):
    ray = ray_session
    from collections import defaultdict

    from python_prtree_ray.pipelines.movement import colocation_pairs

    rng = np.random.default_rng(33)
    n = 4000
    users = rng.integers(1, 60, n).astype(np.int64)
    cells = rng.integers(0, 40, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(users), "cell": pa.array(cells)})
    out = colocation_pairs(
        ray.data.from_arrow(t).repartition(8), min_shared=4
    ).take_all()
    seen = defaultdict(set)
    for u, c in zip(users, cells):
        seen[int(u)].add(int(c))
    expect = {}
    us = sorted(seen)
    for i, a in enumerate(us):
        for b in us[i + 1 :]:
            k = len(seen[a] & seen[b])
            if k >= 4:
                expect[(a, b)] = k
    got = {(r["user_a"], r["user_b"]): r["n_shared"] for r in out}
    assert got == expect and len(expect) > 0


def test_ann_range_matches_bruteforce(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.ann import ann_range

    rng = np.random.default_rng(5)
    n, d = 500, 16
    emb = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        }
    )
    qv, qids = emb[:5], ids[:5]
    out = ann_range(
        ray.data.from_arrow(t).repartition(7), qv, qids, threshold=0.3
    ).take_all()
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = en[:5] @ en.T
    expect = {
        (int(qids[i]), int(ids[j])) for i, j in zip(*np.nonzero(sims >= 0.3))
    }
    got = {(r["query_id"], r["vec_id"]) for r in out}
    assert got == expect
    # every query finds at least itself
    for q in qids:
        assert (int(q), int(q)) in got


def test_stay_points_matches_reference(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import stay_points, stay_points_ref

    rng = np.random.default_rng(11)
    n = 3000
    users = rng.integers(1, 25, n).astype(np.int64)
    ts = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
    # clustered walk so stays actually occur
    gx = (rng.integers(0, 12, n) + rng.integers(0, 2, n)).astype(np.int64)
    gy = (rng.integers(0, 12, n) + rng.integers(0, 2, n)).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "user_id": pa.array(users),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_id": pa.array(eid),
            "gx": pa.array(gx),
            "gy": pa.array(gy),
        }
    )
    r, dwell = 2, 5_000_000
    out = stay_points(
        ray.data.from_arrow(t).repartition(9), r=r, min_dwell_us=dwell
    ).take_all()
    expect = set()
    for u in np.unique(users):
        m = users == u
        order = np.lexsort((eid[m], ts[m]))
        for t0, t1, np_, sx, sy in stay_points_ref(
            ts[m][order], gx[m][order], gy[m][order], r, dwell
        ):
            expect.add((int(u), t0, t1, np_, sx, sy))
    got = {
        (
            r_["user_id"], r_["t_start"], r_["t_end"],
            r_["n_pts"], r_["sum_gx"], r_["sum_gy"],
        )
        for r_ in out
    }
    assert got == expect and len(expect) > 0


def test_resample_track_matches_bruteforce(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import resample_track

    rng = np.random.default_rng(17)
    n = 2000
    users = rng.integers(1, 20, n).astype(np.int64)
    t0, step = 1_000_000, 777_000
    ts = (t0 + np.sort(rng.integers(0, 10**8, n))).astype(np.int64)
    # inject duplicate timestamps to pin the bracketing convention
    ts[100] = ts[101]
    eid = np.arange(n, dtype=np.int64)
    px = rng.uniform(size=n)
    py = rng.uniform(size=n)
    t = pa.table(
        {
            "user_id": pa.array(users),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_id": pa.array(eid),
            "px": pa.array(px),
            "py": pa.array(py),
        }
    )
    out = resample_track(
        ray.data.from_arrow(t).repartition(7), t0_us=t0, step_us=step
    ).take_all()
    expect = {}
    for u in np.unique(users):
        m = users == u
        order = np.lexsort((eid[m], ts[m]))
        uts, ux, uy = ts[m][order], px[m][order], py[m][order]
        k_lo = (uts[0] - t0 + step - 1) // step
        k_hi = (uts[-1] - t0) // step
        for k in range(k_lo, k_hi + 1):
            tk = t0 + k * step
            i = int(np.searchsorted(uts, tk, side="right")) - 1
            if i == uts.size - 1:
                x, y = ux[i], uy[i]
            else:
                f = float(tk - uts[i]) / float(uts[i + 1] - uts[i])
                x = ux[i] + (ux[i + 1] - ux[i]) * f
                y = uy[i] + (uy[i + 1] - uy[i]) * f
            expect[(int(u), k)] = (tk, x, y)
    got = {
        (r["user_id"], r["epoch"]): (r["t_us"], r["x"], r["y"]) for r in out
    }
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0]
        assert got[k][1] == expect[k][1] and got[k][2] == expect[k][2]


def test_tile_quadkey_roundtrip(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_quadkey

    keys = np.arange(1, 501, dtype=np.int64)
    res = 6
    out = tile_quadkey(
        ray.data.from_arrow(_point_table(keys)).repartition(4), res=res
    ).take_all()
    g = 1 << res
    assert len(out) == keys.size
    for r in out[:100]:
        qk = r["quadkey"]
        assert len(qk) == res and set(qk) <= set("0123")
        # decode quadkey back to (ix, iy) and compare with the cell id
        ix = iy = 0
        for ch in qk:
            d = int(ch)
            ix = (ix << 1) | (d & 1)
            iy = (iy << 1) | (d >> 1)
        assert r["cell"] == ix * g + iy


def test_new_ops_empty_and_degenerate_inputs(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.graph import dbscan_clusters
    from python_prtree_ray.pipelines.interpolate import idw_grid
    from python_prtree_ray.pipelines.movement import colocation_pairs
    from python_prtree_ray.pipelines.tiling import tile_quadkey, tile_topk

    keys = np.arange(1, 40, dtype=np.int64)
    pts = ray.data.from_arrow(_point_table(keys))

    # dbscan with min_pts too high for any core: everything in the pair
    # graph is noise, nothing crashes
    out = dbscan_clusters(pts, eps=0.2, min_pts=1000).take_all()
    assert all(r["role"] == "noise" and r["cluster_id"] == -1 for r in out)
    assert len(out) > 0

    # colocation with an unreachable min_shared: empty, schema intact
    t = pa.table(
        {
            "user_id": pa.array(np.arange(10), pa.int64()),
            "cell": pa.array(np.arange(10), pa.int64()),
        }
    )
    out = colocation_pairs(ray.data.from_arrow(t), min_shared=99)
    assert out.count() == 0
    sch = out.schema()
    if sch is not None:  # Ray reports None schema for zero-group results
        assert set(sch.names) == {"user_a", "user_b", "n_shared"}

    # sparse idw: far-apart points leave most nodes absent
    few = ray.data.from_arrow(_point_table(np.array([1, 2], dtype=np.int64)))
    rows = idw_grid(few).take_all()
    assert 0 < len(rows) <= 256

    # quadkey res bounds
    with pytest.raises(ValueError):
        tile_quadkey(pts, res=0)

    # tile_topk with k larger than any tile population: every point ranks
    out = tile_topk(pts, res=1, k=1000).take_all()
    assert len(out) == keys.size


def test_morans_i_matches_dense_reference(ray_session):
    # global Moran's I (queen contiguity, occupied cells) vs a dense
    # numpy float reference, plus partition invariance (exact integer
    # partials -> the float result is bit-identical at any parallelism)
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import morans_i

    rng = np.random.default_rng(47)
    res, g = 3, 8
    n = 400
    pts = rng.random((n, 2))
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    dense = np.zeros((g, g), np.int64)
    np.add.at(dense, (ix, iy), 1)
    occ = np.argwhere(dense > 0)
    x = dense[occ[:, 0], occ[:, 1]].astype(np.float64)
    N = occ.shape[0]
    xbar = x.mean()
    num = 0.0
    W = 0
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            if (
                abs(occ[i, 0] - occ[j, 0]) <= 1
                and abs(occ[i, 1] - occ[j, 1]) <= 1
            ):
                W += 1
                num += (x[i] - xbar) * (x[j] - xbar)
    want = (N / W) * num / ((x - xbar) ** 2).sum()

    results = []
    for blocks in (1, 5):
        ds = _points_ds(ray, pts, np.arange(n), blocks=blocks)
        rows = morans_i(ds, res=res).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_cells"] == N and r["w_pairs"] == W
        assert abs(r["morans_i"] - want) < 1e-9
        results.append(r["morans_i"])
    # exact integer partials: bit-identical across parallelism
    assert results[0] == results[1]

    # degenerate variance (every occupied cell identical count) -> the
    # denominator is exactly 0 and morans_i is NULL, not inf/NaN
    gx = np.repeat(np.arange(4), 1).astype(np.float64)
    pts1 = np.stack([(gx + 0.5) / g, np.full(4, 0.5 / g)], axis=1)
    rows = morans_i(
        _points_ds(ray, pts1, np.arange(4), blocks=2), res=res
    ).take_all()
    assert rows[0]["morans_i"] is None


def test_speed_outliers_matches_pandas_reference(ray_session):
    # teleport detection vs a per-user sorted-scan reference using the
    # same haversine; zero-gap pairs excluded; partition invariance
    ray = ray_session
    import math

    from python_prtree_ray.pipelines.geodesic import DIAM_KM, RAD
    from python_prtree_ray.pipelines.movement import speed_outliers

    rng = np.random.default_rng(31)
    n_users, per = 12, 40
    rows = n_users * per
    users = np.repeat(np.arange(n_users, dtype=np.int64), per)
    # timestamps with deliberate duplicates (seq breaks ties) and some
    # zero gaps
    base = np.datetime64("2024-03-01", "us")
    offs = rng.integers(0, 50, rows).astype("timedelta64[h]")
    ts = (base + offs).astype("datetime64[us]")
    eid = np.arange(rows, dtype=np.int64)
    px = rng.random(rows)
    py = rng.random(rows)
    t = pa.table(
        {
            "user_id": users,
            "ts": pa.array(ts),
            "event_id": eid,
            "px": px,
            "py": py,
        }
    )
    thr = 3000.0

    def hav_km(lo1, la1, lo2, la2):
        sdphi = math.sin((la2 - la1) * RAD * 0.5)
        sdlam = math.sin((lo2 - lo1) * RAD * 0.5)
        # association mirrors the engine/SQL shape: ((cos*cos)*s)*s
        a = (
            sdphi * sdphi
            + math.cos(la1 * RAD) * math.cos(la2 * RAD) * sdlam * sdlam
        )
        return DIAM_KM * math.asin(math.sqrt(min(a, 1.0)))

    want = {}
    tsi = ts.astype(np.int64)
    for u in range(n_users):
        sel = np.flatnonzero(users == u)
        order = sel[np.lexsort((eid[sel], tsi[sel]))]
        for a_i, b_i in zip(order[:-1], order[1:]):
            dt = int(tsi[b_i] - tsi[a_i])
            if dt <= 0:
                continue
            lo1, la1 = px[a_i] * 360.0 - 180.0, py[a_i] * 170.0 - 85.0
            lo2, la2 = px[b_i] * 360.0 - 180.0, py[b_i] * 170.0 - 85.0
            d = hav_km(lo1, la1, lo2, la2)
            sp = d * 3600000000.0 / float(dt)
            if sp > thr:
                want[(u, int(eid[a_i]))] = (int(eid[b_i]), dt, d, sp)

    assert len(want) > 10  # the threshold actually bites
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            (r["user_id"], r["event_id"]): (
                r["next_event_id"],
                r["dt_us"],
                r["dist_km"],
                r["speed_kmh"],
            )
            for r in speed_outliers(ds, max_kmh=thr).take_all()
        }
        assert set(got) == set(want)
        for k in want:
            ge, we = got[k], want[k]
            assert ge[0] == we[0] and ge[1] == we[1]
            # doubles match the scalar-libm reference bitwise
            assert ge[2] == we[2] and ge[3] == we[3], (k, ge, we)


def test_gearys_c_matches_dense_reference(ray_session):
    # Geary's C vs a dense numpy reference on the same occupied-cell /
    # queen-contiguity definition as morans_i; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import gearys_c

    rng = np.random.default_rng(53)
    res, g = 3, 8
    n = 700
    pts = rng.random((n, 2)) ** 1.5  # skew -> unequal neighbor counts
    pts = np.clip(pts, 0.0, 0.999999)
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    dense = np.zeros((g, g), np.int64)
    np.add.at(dense, (ix, iy), 1)
    occ = np.argwhere(dense > 0)
    x = dense[occ[:, 0], occ[:, 1]].astype(np.float64)
    N = occ.shape[0]
    xbar = x.mean()
    num = 0.0
    W = 0
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            if (
                abs(occ[i, 0] - occ[j, 0]) <= 1
                and abs(occ[i, 1] - occ[j, 1]) <= 1
            ):
                W += 1
                num += (x[i] - x[j]) ** 2
    want = ((N - 1) / (2.0 * W)) * num / ((x - xbar) ** 2).sum()
    assert num > 0  # non-degenerate input

    got = []
    for blocks in (1, 6):
        rows = gearys_c(
            _points_ds(ray, pts, np.arange(n), blocks=blocks), res=res
        ).take_all()
        r = rows[0]
        assert r["n_cells"] == N and r["w_pairs"] == W
        assert abs(r["gearys_c"] - want) < 1e-9
        got.append(r["gearys_c"])
    assert got[0] == got[1]  # exact int partials -> bit-identical


def test_ripley_k_matches_brute_force(ray_session):
    # Ripley's K pair count vs an all-pairs numpy reference, including
    # coincident distinct points and radius-boundary pairs
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import ripley_k

    rng = np.random.default_rng(59)
    n = 300
    pts = rng.random((n, 2))
    pts[10] = pts[20]  # coincident distinct ids must count
    pts[30] = pts[31] = [0.5, 0.5]
    r = 0.05
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    within = (dx * dx + dy * dy) <= r * r
    np.fill_diagonal(within, False)
    want_pairs = int(within.sum())
    want_k = float(want_pairs) / float(n * n)
    assert want_pairs > 0

    for blocks in (1, 5):
        rows = ripley_k(
            _points_ds(ray, pts, np.arange(n), blocks=blocks), radius=r
        ).take_all()
        out = rows[0]
        assert out["n_points"] == n
        assert out["n_pairs"] == want_pairs
        assert out["k_r"] == want_k

    # a resolution whose cells are narrower than the radius must refuse
    # loudly rather than undercount
    import pytest

    with pytest.raises(ValueError, match="cell width"):
        ripley_k(_points_ds(ray, pts, np.arange(n)), radius=r, res=8)


def test_local_morans_matches_dense_reference(ray_session):
    # per-cell LISA vs a dense numpy reference; sums to (a multiple of)
    # the global numerator; partition invariance bit-exact
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import local_morans

    rng = np.random.default_rng(61)
    res, g = 3, 8
    n = 600
    pts = rng.random((n, 2))
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    dense = np.zeros((g, g), np.int64)
    np.add.at(dense, (ix, iy), 1)
    occ = np.argwhere(dense > 0)
    x = dense[occ[:, 0], occ[:, 1]].astype(np.float64)
    N = occ.shape[0]
    xbar = x.mean()
    m2 = ((x - xbar) ** 2).sum() / N
    want = {}
    for i in range(N):
        tj = 0.0
        k = 0
        for j in range(N):
            if i == j:
                continue
            if (
                abs(occ[i, 0] - occ[j, 0]) <= 1
                and abs(occ[i, 1] - occ[j, 1]) <= 1
            ):
                k += 1
                tj += x[j] - xbar
        cell = int(occ[i, 0] * g + occ[i, 1])
        want[cell] = (int(x[i]), k, (x[i] - xbar) * tj / m2)

    prev = None
    for blocks in (1, 6):
        rows = local_morans(
            _points_ds(ray, pts, np.arange(n), blocks=blocks), res=res
        ).take_all()
        got = {
            r["cell"]: (r["n_points"], r["n_neighbors"], r["local_i"])
            for r in rows
        }
        assert set(got) == set(want)
        for c in want:
            assert got[c][0] == want[c][0] and got[c][1] == want[c][1]
            assert abs(got[c][2] - want[c][2]) < 1e-9, (c, got[c], want[c])
        if prev is not None:
            assert got == prev  # bit-identical across parallelism
        prev = got


def test_getis_ord_matches_dense_reference(ray_session):
    # Gi* z-scores vs a dense numpy reference (star variant, occupied
    # cells only); partition-invariant bit-exact
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import getis_ord

    rng = np.random.default_rng(67)
    res, g = 3, 8
    n = 800
    pts = rng.random((n, 2)) ** 2  # skew for non-trivial z-scores
    pts = np.clip(pts, 0.0, 0.999999)
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    dense = np.zeros((g, g), np.int64)
    np.add.at(dense, (ix, iy), 1)
    occ = np.argwhere(dense > 0)
    x = dense[occ[:, 0], occ[:, 1]].astype(np.float64)
    N = occ.shape[0]
    xbar = x.mean()
    s = np.sqrt((x * x).mean() - xbar * xbar)
    want = {}
    for i in range(N):
        gfoc = x[i]
        m = 1
        for j in range(N):
            if i == j:
                continue
            if (
                abs(occ[i, 0] - occ[j, 0]) <= 1
                and abs(occ[i, 1] - occ[j, 1]) <= 1
            ):
                m += 1
                gfoc += x[j]
        denom = s * np.sqrt((N * m - m * m) / (N - 1.0))
        cell = int(occ[i, 0] * g + occ[i, 1])
        want[cell] = (
            int(x[i]),
            int(gfoc),
            (gfoc - xbar * m) / denom if denom > 0 else None,
        )

    prev = None
    for blocks in (1, 6):
        got = {
            r["cell"]: (r["n_points"], r["focal_sum"], r["gi_star"])
            for r in getis_ord(
                _points_ds(ray, pts, np.arange(n), blocks=blocks), res=res
            ).take_all()
        }
        assert set(got) == set(want)
        for c in want:
            assert got[c][0] == want[c][0] and got[c][1] == want[c][1]
            if want[c][2] is None:
                assert got[c][2] is None
            else:
                assert abs(got[c][2] - want[c][2]) < 1e-9, (c, got[c], want[c])
        if prev is not None:
            assert got == prev
        prev = got
    # the statistic actually separates: some hot, some cold
    zs = [v[2] for v in prev.values() if v[2] is not None]
    assert max(zs) > 1.0 and min(zs) < 0.0


def test_cell_trend_matches_pandas_reference(ray_session):
    # early/late half counts around the global midpoint timestamp vs a
    # pandas reference; exact ints, partition-invariant
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.movement import cell_trend

    rng = np.random.default_rng(41)
    res, g = 3, 8
    n = 900
    ts = (
        np.datetime64("2024-05-01", "us")
        + rng.integers(0, 10**9, n).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    gx = rng.integers(0, g, n).astype(np.int64)
    gy = rng.integers(0, g, n).astype(np.int64)
    t = pa.table({"ts": pa.array(ts), "gx": gx, "gy": gy})

    tsi = ts.astype(np.int64)
    mid = (int(tsi.min()) + int(tsi.max())) // 2
    cell = gx * g + gy
    df = pd.DataFrame({"cell": cell, "late": tsi > mid})
    ref = df.groupby("cell")["late"].agg(["count", "sum"])
    want = {
        int(c): (int(r["count"] - r["sum"]), int(r["sum"]))
        for c, r in ref.iterrows()
    }

    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["cell"]: (r["n_early"], r["n_late"])
            for r in cell_trend(ds, res=res).take_all()
        }
        assert got == want
        rows = cell_trend(ds, res=res).take_all()
        assert all(r["delta"] == r["n_late"] - r["n_early"] for r in rows)


def test_tile_hilbert_locality_and_parity(ray_session):
    # kernel: bijection + Hamiltonian 4-neighbor path over the full grid
    # (the locality property that makes it a range-partition key);
    # pipeline: matches the kernel, partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import hilbert_d, tile_hilbert

    for res in (2, 4):
        g = 1 << res
        xs, ys = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        ix, iy = xs.ravel(), ys.ravel()
        d = hilbert_d(ix, iy, res)
        assert sorted(d) == list(range(g * g))  # bijection
        o = np.argsort(d)
        step = np.abs(np.diff(ix[o])) + np.abs(np.diff(iy[o]))
        assert np.all(step == 1)  # consecutive indices are 4-neighbors

    rng = np.random.default_rng(7)
    res, g = 5, 32
    pts = rng.random((600, 2))
    ids = np.arange(600)
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    want = {
        int(i): (int(c), int(h))
        for i, c, h in zip(ids, ix * g + iy, hilbert_d(ix, iy, res))
    }
    prev = None
    for blocks in (1, 5):
        got = {
            r["query_id"]: (r["cell"], r["hilbert"])
            for r in tile_hilbert(
                _points_ds(ray, pts, ids, blocks=blocks), res=res
            ).take_all()
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_snap_to_segments_matches_bruteforce(ray_session):
    # map matching vs an O(P*S) python reference: exact rational
    # distances, (dist2, user, seq) argmin, radius gate; partition-
    # invariant
    ray = ray_session
    from python_prtree_ray.pipelines.movement import snap_to_segments

    rng = np.random.default_rng(23)
    res, g = 6, 64
    n_ev, n_users, n_probes = 400, 12, 120
    max_move, r = 20, 6
    user = rng.integers(0, n_users, n_ev).astype(np.int64)
    ts = (
        np.datetime64("2024-03-01", "us")
        + rng.integers(0, 10**8, n_ev).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    seq = rng.permutation(n_ev).astype(np.int64)
    gx = rng.integers(0, g, n_ev).astype(np.int64)
    gy = rng.integers(0, g, n_ev).astype(np.int64)
    tracks_t = pa.table(
        {"user_id": user, "ts": pa.array(ts), "event_id": seq, "gx": gx, "gy": gy}
    )
    qid = np.arange(n_probes).astype(np.int64)
    qx = rng.integers(0, g, n_probes).astype(np.int64)
    qy = rng.integers(0, g, n_probes).astype(np.int64)
    probes_t = pa.table({"query_id": qid, "qx": qx, "qy": qy})

    # reference segments: per user ordered by (ts, seq), consecutive,
    # L-inf gated
    order = np.lexsort((seq, ts.astype(np.int64), user))
    u_s, s_s = user[order], seq[order]
    x_s, y_s = gx[order], gy[order]
    m = (
        (u_s[1:] == u_s[:-1])
        & (np.abs(np.diff(x_s)) <= max_move)
        & (np.abs(np.diff(y_s)) <= max_move)
    )
    segs = [
        (int(u_s[i]), int(s_s[i]), int(x_s[i]), int(y_s[i]), int(x_s[i + 1]), int(y_s[i + 1]))
        for i in np.flatnonzero(m)
    ]
    assert len(segs) > 20

    def d2_frac(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        ln = dx * dx + dy * dy
        c1 = (px - ax) * dx + (py - ay) * dy
        if c1 <= 0:
            return (px - ax) ** 2 + (py - ay) ** 2, 1
        if c1 >= ln:
            return (px - bx) ** 2 + (py - by) ** 2, 1
        cr = (px - ax) * dy - (py - ay) * dx
        return cr * cr, ln

    want = {}
    for i in range(n_probes):
        best = None
        for (u, s, ax, ay, bx, by) in segs:
            num, den = d2_frac(int(qx[i]), int(qy[i]), ax, ay, bx, by)
            if num > r * r * den:
                continue
            d2 = num / den  # same single division both sides
            k = (d2, u, s)
            if best is None or k < best:
                best = k
        if best is not None:
            want[int(qid[i])] = (best[1], best[2], best[0])
    assert len(want) > 10

    prev = None
    for blocks in (1, 5):
        tr = ray.data.from_arrow(tracks_t).repartition(blocks)
        pr = ray.data.from_arrow(probes_t).repartition(max(1, blocks - 1))
        got = {
            row["query_id"]: (row["snap_user"], row["snap_seq"], row["dist2"])
            for row in snap_to_segments(
                pr, tr, r=r, max_move=max_move, res=res, bucket_res=2
            ).take_all()
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_trajectory_hausdorff_matches_bruteforce(ray_session):
    # symmetric Hausdorff² between co-started entities vs an O(n²)
    # python reference; exact int64, partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import trajectory_hausdorff

    rng = np.random.default_rng(31)
    res, start_res = 6, 2
    g, n_ev, n_users = 64, 500, 20
    user = rng.integers(0, n_users, n_ev).astype(np.int64)
    ts = (
        np.datetime64("2024-02-01", "us")
        + rng.integers(0, 10**8, n_ev).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    seq = rng.permutation(n_ev).astype(np.int64)
    gx = rng.integers(0, g, n_ev).astype(np.int64)
    gy = rng.integers(0, g, n_ev).astype(np.int64)
    t = pa.table(
        {"user_id": user, "ts": pa.array(ts), "event_id": seq, "gx": gx, "gy": gy}
    )

    shift = res - start_res
    gb = 1 << start_res
    tsi = ts.astype(np.int64)
    start_tile, pts = {}, {}
    for u in np.unique(user):
        m = user == u
        first = np.lexsort((seq[m], tsi[m]))[0]
        start_tile[int(u)] = (int(gx[m][first]) >> shift) * gb + (
            int(gy[m][first]) >> shift
        )
        pts[int(u)] = np.stack([gx[m], gy[m]], axis=1)

    def haus2(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
        return int(max(d2.min(axis=1).max(), d2.min(axis=0).max()))

    us = sorted(pts)
    want = {
        (a, b): haus2(pts[a], pts[b])
        for ai, a in enumerate(us)
        for b in us[ai + 1 :]
        if start_tile[a] == start_tile[b]
    }
    assert len(want) > 5

    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            (r["user_a"], r["user_b"]): r["hausdorff2"]
            for r in trajectory_hausdorff(
                ds, start_res=start_res, res=res
            ).take_all()
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_dup_ngram_coverage_matches_bruteforce(ray_session):
    # cross-doc duplicated n-gram position counts vs a python reference;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.curation import dup_ngram_coverage

    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts, n_docs, n = [], 60, 3
    for i in range(n_docs):
        toks = [vocab[v] for v in rng.integers(0, len(vocab), rng.integers(2, 14))]
        texts.append(" ".join(toks))
    # guarantee exact shared spans
    texts[7] = texts[3]
    texts[11] = "alpha beta gamma " + texts[5]
    ids = np.arange(n_docs, dtype=np.int64)
    t = pa.table({"doc_id": ids, "text": texts})

    grams = {}
    for i, tx in enumerate(texts):
        toks = tx.split()
        grams[i] = [tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)]
    gram_docs = {}
    for i, gs in grams.items():
        for g_ in set(gs):
            gram_docs.setdefault(g_, set()).add(i)
    want = {}
    for i, gs in grams.items():
        if not gs:
            continue
        dup = sum(1 for g_ in gs if len(gram_docs[g_]) >= 2)
        want[int(ids[i])] = (len(gs), dup)
    assert any(v[1] > 0 for v in want.values())

    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup"])
            for r in dup_ngram_coverage(ds, n=n).take_all()
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_heading_histogram_matches_pandas_reference(ray_session):
    # per-user sign-octant move counts vs a pandas reference; exact
    # ints, partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.movement import heading_histogram

    rng = np.random.default_rng(53)
    g, n_ev, n_users = 16, 600, 15
    user = rng.integers(0, n_users, n_ev).astype(np.int64)
    ts = (
        np.datetime64("2024-04-01", "us")
        + rng.integers(0, 10**8, n_ev).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    seq = rng.permutation(n_ev).astype(np.int64)
    gx = rng.integers(0, g, n_ev).astype(np.int64)
    gy = rng.integers(0, g, n_ev).astype(np.int64)
    t = pa.table(
        {"user_id": user, "ts": pa.array(ts), "event_id": seq, "gx": gx, "gy": gy}
    )

    want = {}
    order = np.lexsort((seq, ts.astype(np.int64), user))
    u_s, x_s, y_s = user[order], gx[order], gy[order]
    same = u_s[1:] == u_s[:-1]
    dx = np.diff(x_s)[same]
    dy = np.diff(y_s)[same]
    uu = u_s[1:][same]
    d = (np.sign(dx) + 1) * 3 + np.sign(dy) + 1
    for u, dd in zip(uu[d != 4], d[d != 4]):
        want[(int(u), int(dd))] = want.get((int(u), int(dd)), 0) + 1

    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            (r["user_id"], r["dir"]): r["n_moves"]
            for r in heading_histogram(ds).take_all()
        }
        assert got == want


def test_cell_hours_matches_pandas_reference(ray_session):
    # per-(cell, hour-of-day) counts vs a numpy reference
    ray = ray_session
    from python_prtree_ray.pipelines.movement import cell_hours

    rng = np.random.default_rng(59)
    g, n_ev = 8, 700
    ts = (
        np.datetime64("2024-01-01", "us")
        + rng.integers(0, 90 * 86_400 * 10**6, n_ev).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    gx = rng.integers(0, g, n_ev).astype(np.int64)
    gy = rng.integers(0, g, n_ev).astype(np.int64)
    t = pa.table({"ts": pa.array(ts), "gx": gx, "gy": gy})

    hour = (ts.astype(np.int64) // 3_600_000_000) % 24
    cell = gx * g + gy
    want = {}
    for c, h in zip(cell, hour):
        want[(int(c), int(h))] = want.get((int(c), int(h)), 0) + 1

    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            (r["cell"], r["hour"]): r["n_events"]
            for r in cell_hours(ds, res=3).take_all()
        }
        assert got == want


def test_hilbert_ranges_matches_reference(ray_session):
    # partition planner: exact part assignment vs a python reference,
    # full coverage, contiguity, near-equal counts, partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import hilbert_d, hilbert_ranges

    rng = np.random.default_rng(83)
    res, g, n, P = 5, 32, 2000, 7
    pts = rng.random((n, 2)) ** 1.7  # skew so tiles have unequal counts
    pts = np.clip(pts, 0.0, 0.999999)
    ids = np.arange(n)
    ix = np.clip((pts[:, 0] * g).astype(np.int64), 0, g - 1)
    iy = np.clip((pts[:, 1] * g).astype(np.int64), 0, g - 1)
    h = hilbert_d(ix, iy, res)
    key, c = np.unique(h, return_counts=True)
    before = np.cumsum(c) - c
    part = (P * before) // n
    want = {}
    for p in np.unique(part):
        m = part == p
        want[int(p)] = (int(key[m].min()), int(key[m].max()), int(c[m].sum()))

    prev = None
    for blocks in (1, 6):
        got = {
            r["part"]: (r["lo"], r["hi"], r["n_points"])
            for r in hilbert_ranges(
                _points_ds(ray, pts, ids, blocks=blocks), res=res, n_parts=P
            ).take_all()
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # invariants: full coverage, contiguity in hilbert order, balance
    assert sum(v[2] for v in got.values()) == n
    bounds = [got[p] for p in sorted(got)]
    for a, b in zip(bounds, bounds[1:]):
        assert a[1] < b[0]  # disjoint and ordered
    assert max(v[2] for v in got.values()) <= 2 * (n // P + max(c))


def test_interval_union_len_matches_bruteforce(ray_session):
    # per-key union length of overlapping windows vs a python sweep;
    # exact int64, partition-invariant; dense ties exercised
    ray = ray_session
    from python_prtree_ray.pipelines.interval import interval_union_len

    rng = np.random.default_rng(71)
    n, n_users, w = 800, 25, 5_000_000
    user = rng.integers(0, n_users, n).astype(np.int64)
    base = np.datetime64("2024-06-01", "us")
    off = rng.integers(0, 10**8, n)
    off[: n // 8] = off[n // 8 : 2 * (n // 8)]  # duplicate start ties
    ts = (base + off.astype("timedelta64[us]")).astype("datetime64[us]")
    t = pa.table({"user_id": user, "ts": pa.array(ts)})

    tsi = ts.astype(np.int64)
    want = {}
    for u in np.unique(user):
        s = np.sort(tsi[user == u])
        e = s + w
        cov, m = 0, None
        for si, ei in zip(s, e):
            lo = si if m is None else max(si, m)
            cov += max(0, ei - lo)
            m = ei if m is None else max(m, ei)
        want[int(u)] = (int(s.size), int(cov))

    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["user_id"]: (r["n_intervals"], r["covered_us"])
            for r in interval_union_len(ds, window_us=w).take_all()
        }
        assert got == want


def test_knox_stat_matches_bruteforce(ray_session):
    # space-time interaction counts vs an O(n²) python reference; exact
    # ints + one fixed-expression double; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import knox_stat

    rng = np.random.default_rng(97)
    n = 300
    pts = rng.random((n, 2))
    ids = np.arange(n)
    ts = (
        np.datetime64("2024-07-01", "us")
        + rng.integers(0, 10**8, n).astype("timedelta64[us]")
    ).astype("datetime64[us]")
    r, tau = 0.05, 3_000_000
    t = pa.table(
        {
            "query_id": ids.astype(np.int64),
            "px": pts[:, 0],
            "py": pts[:, 1],
            "ts": pa.array(ts),
        }
    )

    tsi = ts.astype(np.int64)
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    sp = (dx * dx + dy * dy <= r * r) & ~np.eye(n, dtype=bool)
    tm = (np.abs(tsi[:, None] - tsi[None, :]) <= tau) & ~np.eye(n, dtype=bool)
    S, T, X = int(sp.sum()), int(tm.sum()), int((sp & tm).sum())
    P = n * (n - 1)
    want_ratio = (float(X) * float(P)) / (float(S) * float(T))
    assert X > 0  # the statistic is non-trivial on this input

    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = knox_stat(ds, radius=r, tau_us=tau).take_all()
        assert len(rows) == 1
        got = rows[0]
        assert (got["n_points"], got["n_space"], got["n_time"], got["n_spacetime"]) == (
            n, S, T, X
        )
        assert got["knox_ratio"] == want_ratio
        if prev is not None:
            assert got == prev
        prev = got


def test_quadrat_test_matches_bruteforce(ray_session):
    # chi2 over the FULL lattice (empty quadrats included) vs a direct
    # numpy recomputation; exact ints + one division; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import quadrat_test
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(41)
    n, res = 700, 4
    pts = rng.random((n, 2))
    g = 1 << res
    n_q = g * g
    c = np.bincount(cell_of_points(pts[:, 0], pts[:, 1], res), minlength=n_q)
    m = n / n_q
    want_chi2 = float(((c - m) ** 2 / m).sum())
    sx2 = int((c.astype(object) ** 2).sum())
    exact_chi2 = float(n_q * sx2 - n * n) / float(n)
    # the collapsed exact-int form equals the textbook form
    assert abs(exact_chi2 - want_chi2) < 1e-6 * max(1.0, want_chi2)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        row = quadrat_test(ds, res=res).take_all()[0]
        assert row["n_points"] == n
        assert row["n_quadrats"] == n_q
        assert row["n_occupied"] == int((c > 0).sum())
        assert row["chi2"] == exact_chi2
        if prev is not None:
            assert row == prev
        prev = row


def test_join_counts_matches_bruteforce(ray_session):
    # BB/BW/WW queen join counts vs a full-lattice numpy recomputation
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import join_counts
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(43)
    n, res = 300, 3
    pts = rng.random((n, 2))
    g = 1 << res
    occ = np.zeros((g, g), dtype=bool)
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    occ[cells // g, cells % g] = True

    bb = bw = ww = total = 0
    for ix in range(g):
        for iy in range(g):
            for dx, dy in ((1, -1), (1, 0), (1, 1), (0, 1)):
                jx, jy = ix + dx, iy + dy
                if 0 <= jx < g and 0 <= jy < g:
                    total += 1
                    a, b = occ[ix, iy], occ[jx, jy]
                    if a and b:
                        bb += 1
                    elif a or b:
                        bw += 1
                    else:
                        ww += 1
    assert total == 2 * (g - 1) * (2 * g - 1)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        row = join_counts(ds, res=res).take_all()[0]
        assert row["n_occupied"] == int(occ.sum())
        assert row["n_quadrats"] == g * g
        assert (row["total_pairs"], row["bb"], row["bw"], row["ww"]) == (
            total, bb, bw, ww
        )
        if prev is not None:
            assert row == prev
        prev = row


def test_clark_evans_matches_bruteforce(ray_session):
    # exact scaled NN-d2 sum + fixed-expression ratio vs O(n^2) python
    ray = ray_session
    import math

    from python_prtree_ray.pipelines.knn import clark_evans

    rng = np.random.default_rng(47)
    n = 250
    ids = rng.choice(5000, size=n, replace=False).astype(np.int64)
    p = derive.derive_points(ids)
    pts = np.stack([p["px"], p["py"]], axis=1)

    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    mind2 = d2.min(axis=1)
    MOD2 = 1000000007.0 * 1000000007.0
    want_s = int(np.floor(mind2 * MOD2).astype(np.int64).astype(object).sum())
    want_ratio = (float(want_s) * math.pi) / MOD2

    t = pa.table({"query_id": ids, "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        row = clark_evans(ds).take_all()[0]
        assert row["n_points"] == n
        assert row["sum_nn_s"] == want_s
        assert row["ce_ratio"] == want_ratio
        if prev is not None:
            assert row == prev
        prev = row


def test_doc_modality_matches_explode(ray_session):
    # per-doc modality profile vs a groupby over the exploded spans
    ray = ray_session
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import doc_modality, explode_spans

    n = 400
    docs = interleaved_docs(n, override_num_blocks=5)
    got = (
        doc_modality(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    flat = (
        interleaved_docs(n)
        .map_batches(explode_spans, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    want = (
        flat.assign(
            is_text=(flat["kind"] == "text").astype("int64"),
            is_image=(flat["kind"] == "image").astype("int64"),
            is_audio=(flat["kind"] == "audio").astype("int64"),
            is_video=(flat["kind"] == "video").astype("int64"),
            tlen=flat["text"].str.len().astype("int64"),
        )
        .groupby("doc_id", as_index=False)
        .agg(
            n_spans=("seq", "size"),
            n_text=("is_text", "sum"),
            n_image=("is_image", "sum"),
            n_audio=("is_audio", "sum"),
            n_video=("is_video", "sum"),
            text_chars=("tlen", "sum"),
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    for col in ("n_spans", "n_text", "n_image", "n_audio", "n_video", "text_chars"):
        assert got[col].astype("int64").tolist() == want[col].tolist(), col


def test_raster_regions_matches_bruteforce(ray_session):
    # raster->vector segmentation vs a python BFS labeling of the
    # thresholded grid; all-integer rows; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import raster_regions
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(53)
    res, T = 4, 3
    g = 1 << res
    # clustered mixture: three gaussian blobs + uniform background
    blobs = [
        np.clip(rng.normal(c, 0.05, (150, 2)), 0, 0.999)
        for c in ((0.2, 0.3), (0.7, 0.6), (0.25, 0.35))
    ]
    pts = np.concatenate(blobs + [rng.random((200, 2))])

    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    counts = np.bincount(cells, minlength=g * g)
    active = set(np.flatnonzero(counts >= T).tolist())
    assert len(active) > 3  # non-trivial raster

    seen: set[int] = set()
    want = {}
    for s in sorted(active):
        if s in seen:
            continue
        comp = [s]
        seen.add(s)
        stack = [s]
        while stack:
            u = stack.pop()
            ux, uy = u // g, u % g
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    vx, vy = ux + dx, uy + dy
                    if 0 <= vx < g and 0 <= vy < g:
                        v = vx * g + vy
                        if v in active and v not in seen:
                            seen.add(v)
                            comp.append(v)
                            stack.append(v)
        arr = np.array(comp)
        ix, iy = arr // g, arr % g
        want[int(arr.min())] = (
            len(comp),
            int(counts[arr].sum()),
            int(ix.min()), int(iy.min()), int(ix.max()), int(iy.max()),
        )
    assert len(want) >= 2  # multiple regions

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = raster_regions(ds, res=res, min_count=T).take_all()
        got = {
            r["region_id"]: (
                r["n_cells"], r["n_points"],
                r["ix_min"], r["iy_min"], r["ix_max"], r["iy_max"],
            )
            for r in rows
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_raster_regions_all_singletons(ray_session):
    # an edgeless raster (every active tile isolated) must still emit
    # one singleton region per active tile (the empty-labels path)
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import raster_regions

    # 3 isolated dense tiles at res 3 (cells far apart)
    res, T = 3, 4
    g = 1 << res
    centers = [(0.0625, 0.0625), (0.5625, 0.0625), (0.0625, 0.9375)]
    pts = np.concatenate([np.full((5, 2), c) for c in centers])
    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    rows = raster_regions(
        ray.data.from_arrow(t).repartition(2), res=res, min_count=T
    ).take_all()
    assert len(rows) == 3
    for r in rows:
        assert r["n_cells"] == 1 and r["n_points"] == 5
        assert (r["ix_min"], r["iy_min"]) == (r["ix_max"], r["iy_max"])
        assert r["region_id"] == r["ix_min"] * g + r["iy_min"]


def test_compress_ratio_matches_zlib(ray_session):
    # actor-pool zlib scores vs direct zlib; parallelism-invariant
    import zlib

    ray = ray_session
    from python_prtree_ray.pipelines.text import compress_ratio

    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "aaaaaaaaaabbbbbbbbbb" * 50,
        "",
        "unique words never repeat galaxy quantum violet marble",
        "x",
    ] * 8
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": ids, "text": pa.array(texts)})

    want = {}
    for i, s in zip(ids, texts):
        raw = s.encode()
        z = len(zlib.compress(raw, 6))
        n = len(raw)
        want[int(i)] = (n, z, (z / max(n, 1)) if n > 0 else 0.0)

    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = compress_ratio(ds).take_all()
        got = {
            r["doc_id"]: (r["n_bytes"], r["z_bytes"], r["compress_ratio"])
            for r in rows
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # the signal separates repetitive from diverse text
    assert want[1][2] < 0.1 < want[3][2]


def _dtw_ref(A, B, band=8):
    # reference banded DP with exact python ints: |i-j| <= w with the
    # same per-pair band rule as the engine, w = max(band, |La-Lb|)
    la, lb = len(A), len(B)
    w = max(band, abs(la - lb))
    INF = float("inf")
    D = [[INF] * (lb + 1) for _ in range(la + 1)]
    D[0][0] = 0
    for i in range(1, la + 1):
        for j in range(max(1, i - w), min(lb, i + w) + 1):
            c = (A[i - 1][0] - B[j - 1][0]) ** 2 + (A[i - 1][1] - B[j - 1][1]) ** 2
            D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    return D[la][lb]


def test_trajectory_dtw_matches_bruteforce(ray_session):
    # vectorized anti-diagonal DP vs per-pair python DP; exact int64;
    # partition-invariant; order-sensitivity sanity vs hausdorff
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import trajectory_dtw

    rng = np.random.default_rng(59)
    res, start_res = 8, 0  # one start tile -> every pair compared
    n_users, g = 7, 1 << 8
    t0 = np.datetime64("2024-05-01", "us")
    rows = {"user_id": [], "ts": [], "event_id": [], "gx": [], "gy": []}
    tracks = {}
    eid = 0
    for u in range(n_users):
        L = int(rng.integers(3, 14))
        xs = rng.integers(0, g, L)
        ys = rng.integers(0, g, L)
        tracks[u] = list(zip(xs.tolist(), ys.tolist()))
        for k in range(L):
            rows["user_id"].append(u)
            rows["ts"].append(t0 + np.timedelta64(int(k * 60 + u), "s"))
            rows["event_id"].append(eid)
            rows["gx"].append(int(xs[k]))
            rows["gy"].append(int(ys[k]))
            eid += 1
    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "gx": pa.array(rows["gx"], pa.int64()),
            "gy": pa.array(rows["gy"], pa.int64()),
        }
    )

    want = {}
    for a in range(n_users):
        for b in range(a + 1, n_users):
            want[(a, b)] = _dtw_ref(tracks[a], tracks[b])

    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = trajectory_dtw(ds, start_res=start_res, res=res).take_all()
        got = {(r["user_a"], r["user_b"]): r["dtw2"] for r in out}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_trajectory_dtw_is_order_sensitive(ray_session):
    # same loop traced forward vs reversed: hausdorff2 == 0 (same point
    # set) but DTW is large — the ordered-similarity semantics
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import (
        trajectory_dtw,
        trajectory_hausdorff,
    )

    pts = [(0, 0), (40, 0), (80, 0), (80, 40), (80, 80), (40, 80), (0, 80), (0, 40)]
    t0 = np.datetime64("2024-05-01", "us")
    rows = {"user_id": [], "ts": [], "event_id": [], "gx": [], "gy": []}
    eid = 0
    for u, track in ((0, pts), (1, pts[:1] + pts[1:][::-1])):
        for k, (x, y) in enumerate(track):
            rows["user_id"].append(u)
            rows["ts"].append(t0 + np.timedelta64(k * 60, "s"))
            rows["event_id"].append(eid)
            rows["gx"].append(x)
            rows["gy"].append(y)
            eid += 1
    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "gx": pa.array(rows["gx"], pa.int64()),
            "gy": pa.array(rows["gy"], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    h = trajectory_hausdorff(ds, start_res=0, res=8).take_all()
    d = trajectory_dtw(ds, start_res=0, res=8).take_all()
    assert h[0]["hausdorff2"] == 0
    assert d[0]["dtw2"] == _dtw_ref(pts, pts[:1] + pts[1:][::-1]) > 0


def test_cell_slope_matches_bruteforce(ray_session):
    # per-tile OLS trend slope vs a direct numpy lstsq-free recompute;
    # exact ints + one division; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.movement import cell_slope

    rng = np.random.default_rng(61)
    res, nb = 3, 8
    g = 1 << res
    n = 900
    gx = rng.integers(0, g, n)
    gy = rng.integers(0, g, n)
    t0 = np.datetime64("2024-03-01", "us")
    offs = rng.integers(0, 10**9, n)
    ts = t0 + offs.astype("timedelta64[us]")

    lo, hi = int(offs.min()), int(offs.max())
    b = np.minimum((offs - lo) * nb // (hi - lo + 1), nb - 1)
    cell = gx * g + gy
    sx = nb * (nb - 1) // 2
    sx2 = (nb - 1) * nb * (2 * nb - 1) // 6
    den = nb * sx2 - sx * sx
    want = {}
    for c in np.unique(cell):
        m = cell == c
        sy = int(m.sum())
        sxy = int(b[m].sum())  # Σ b over events = Σ b·count
        num = nb * sxy - sx * sy
        want[int(c)] = (sy, float(num) / float(den))

    t = pa.table(
        {
            "user_id": pa.array(np.zeros(n, np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "gx": pa.array(gx.astype(np.int64)),
            "gy": pa.array(gy.astype(np.int64)),
        }
    )
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = cell_slope(ds, res=res, n_bins=nb).take_all()
        got = {r["cell"]: (r["n_events"], r["slope"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # sanity: an all-in-last-bin cell has the maximal positive slope shape
    assert any(v[1] > 0 for v in want.values()) and any(
        v[1] < 0 for v in want.values()
    )


def test_span_windows_matches_explode(ray_session):
    # window assignment vs a pandas recompute over the exploded spans;
    # packing invariants; partition-invariant
    ray = ray_session
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import span_windows, explode_spans

    n, B, K = 300, 16, 8
    flat = (
        interleaved_docs(n)
        .map_batches(explode_spans, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["doc_id", "seq"])
    )
    cost = np.where(
        flat["kind"].values == "text",
        flat["text"].str.count(" ").values + 1,
        K,
    ).astype(np.int64)
    flat = flat.assign(cost=cost)
    want = {}
    for doc, gdf in flat.groupby("doc_id"):
        before = np.r_[0, np.cumsum(gdf["cost"].values)[:-1]]
        win = before // B
        for w in np.unique(win):
            m = win == w
            want[(doc, int(w))] = (
                int(m.sum()),
                int(gdf["cost"].values[m].sum()),
                int((gdf["kind"].values[m] != "text").sum()),
            )

    prev = None
    for blocks in (1, 5):
        got_rows = span_windows(
            interleaved_docs(n, override_num_blocks=blocks), budget=B, media_tokens=K
        ).take_all()
        got = {
            (r["doc_id"], r["window_id"]): (r["n_spans"], r["n_tokens"], r["n_media"])
            for r in got_rows
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # invariants: window ids dense from 0 per doc; every span assigned
    per_doc: dict = {}
    for (doc, w), (ns, _, _) in want.items():
        per_doc.setdefault(doc, []).append(w)
        assert ns >= 1
    for doc, ws in per_doc.items():
        assert sorted(ws) == list(range(len(ws)))


def _geohash_ref(px, py, nchars):
    # classic successive-halving geohash encode on the unit square,
    # x-first bit interleave, base32 alphabet
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    x_lo, x_hi, y_lo, y_hi = 0.0, 1.0, 0.0, 1.0
    out, bits, val, even = [], 0, 0, True
    while len(out) < nchars:
        if even:
            mid = (x_lo + x_hi) / 2
            if px >= mid:
                val = (val << 1) | 1
                x_lo = mid
            else:
                val <<= 1
                x_hi = mid
        else:
            mid = (y_lo + y_hi) / 2
            if py >= mid:
                val = (val << 1) | 1
                y_lo = mid
            else:
                val <<= 1
                y_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alpha[val])
            bits, val = 0, 0
    return "".join(out)


def test_tile_geohash_matches_reference(ray_session):
    # engine bit-interleave tokens vs classic successive-halving encode
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_geohash

    rng = np.random.default_rng(67)
    n = 400
    pts = rng.random((n, 2))
    ids = np.arange(n, dtype=np.int64)
    want = {
        int(i): _geohash_ref(float(pts[i, 0]), float(pts[i, 1]), 6)
        for i in range(n)
    }
    t = pa.table({"query_id": ids, "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_geohash(ds, nchars=6).take_all()
        got = {r["query_id"]: r["geohash"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # neighbor-prefix property: shared prefixes shorten with distance
    a = tile_geohash(ray.data.from_arrow(pa.table(
        {"query_id": np.array([0, 1], np.int64),
         "px": np.array([0.300000001, 0.300000002]),
         "py": np.array([0.70000001, 0.70000002])}
    )), nchars=6).take_all()
    assert a[0]["geohash"] == a[1]["geohash"]  # ~1e-9 apart: same 30-bit cell


def test_trajectory_dtw_chunking_invariant(ray_session):
    # pair_chunk must not affect results (per-pair band, not chunk band)
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import trajectory_dtw

    rng = np.random.default_rng(71)
    g = 1 << 8
    t0 = np.datetime64("2024-05-01", "us")
    rows = {"user_id": [], "ts": [], "event_id": [], "gx": [], "gy": []}
    eid = 0
    for u in range(9):
        L = int(rng.integers(5, 40))
        for k in range(L):
            rows["user_id"].append(u)
            rows["ts"].append(t0 + np.timedelta64(k, "m"))
            rows["event_id"].append(eid)
            rows["gx"].append(int(rng.integers(0, g)))
            rows["gy"].append(int(rng.integers(0, g)))
            eid += 1
    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "gx": pa.array(rows["gx"], pa.int64()),
            "gy": pa.array(rows["gy"], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    base = {
        (r["user_a"], r["user_b"]): r["dtw2"]
        for r in trajectory_dtw(ds, start_res=0, res=8).take_all()
    }
    assert len(base) == 36
    for chunk in (1, 3):
        got = {
            (r["user_a"], r["user_b"]): r["dtw2"]
            for r in trajectory_dtw(
                ds, start_res=0, res=8, pair_chunk=chunk
            ).take_all()
        }
        assert got == base


def test_tile_distinct_users_matches_bruteforce(ray_session):
    # exact per-tile distinct-user counts vs pandas; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_distinct_users
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(73)
    n, res = 2000, 3
    pts = rng.random((n, 2))
    users = rng.integers(0, 40, n).astype(np.int64)
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    want = {}
    for c in np.unique(cells):
        m = cells == c
        want[int(c)] = (int(np.unique(users[m]).size), int(m.sum()))

    t = pa.table({"user_id": users, "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_distinct_users(ds, res=res).take_all()
        got = {r["cell"]: (r["n_users"], r["n_points"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_trajectory_dtw_length_one_tracks(ray_session):
    # degenerate tracks: a single-point track vs a long one (band
    # widens to |La-Lb|); both directions of extreme length imbalance
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import trajectory_dtw

    t0 = np.datetime64("2024-05-01", "us")
    rows = {"user_id": [], "ts": [], "event_id": [], "gx": [], "gy": []}
    eid = 0
    tracks = {0: [(10, 10)], 1: [(k * 3, 7) for k in range(20)], 2: [(5, 5)]}
    for u, track in tracks.items():
        for k, (x, y) in enumerate(track):
            rows["user_id"].append(u)
            rows["ts"].append(t0 + np.timedelta64(k, "m"))
            rows["event_id"].append(eid)
            rows["gx"].append(x)
            rows["gy"].append(y)
            eid += 1
    t = pa.table(
        {
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "gx": pa.array(rows["gx"], pa.int64()),
            "gy": pa.array(rows["gy"], pa.int64()),
        }
    )
    got = {
        (r["user_a"], r["user_b"]): r["dtw2"]
        for r in trajectory_dtw(
            ray.data.from_arrow(t), start_res=0, res=8
        ).take_all()
    }
    for (a, b) in ((0, 1), (0, 2), (1, 2)):
        assert got[(a, b)] == _dtw_ref(tracks[a], tracks[b])
    # 1-vs-1: single aligned pair, plain squared distance
    assert got[(0, 2)] == (10 - 5) ** 2 + (10 - 5) ** 2


def test_span_tiles_matches_derive(ray_session):
    # span-level georeference: point/cell per span equals the direct
    # derive computation over the exploded spans; partition-invariant
    ray = ray_session
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import span_tiles, explode_spans
    from python_prtree_ray.functions.cells import cell_of_points

    n, res = 250, 6
    flat = (
        interleaved_docs(n)
        .map_batches(explode_spans, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    sid = flat["doc_id"].str[3:].astype(np.int64).values * 16 + flat["seq"].values
    p = derive.derive_points(sid)
    want_cell = cell_of_points(p["px"], p["py"], res)
    want = {
        (d, int(s)): (k, px, py, int(c))
        for d, s, k, px, py, c in zip(
            flat["doc_id"], flat["seq"], flat["kind"], p["px"], p["py"], want_cell
        )
    }
    prev = None
    for blocks in (1, 4):
        rows = span_tiles(
            interleaved_docs(n, override_num_blocks=blocks), res=res
        ).take_all()
        got = {
            (r["doc_id"], r["seq"]): (r["kind"], r["px"], r["py"], r["cell"])
            for r in rows
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_skyline_matches_bruteforce(ray_session):
    # Pareto frontier vs O(n^2) dominance scan, incl. duplicate points
    # and tied coordinates; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.agg import skyline

    rng = np.random.default_rng(79)
    n = 600
    pts = np.round(rng.random((n, 2)), 2)  # coarse grid -> many ties
    pts[50] = pts[40]  # exact duplicate pair
    ids = np.arange(n, dtype=np.int64)

    keep = set()
    for i in range(n):
        dominated = (
            (pts[:, 0] <= pts[i, 0])
            & (pts[:, 1] <= pts[i, 1])
            & ((pts[:, 0] < pts[i, 0]) | (pts[:, 1] < pts[i, 1]))
        ).any()
        if not dominated:
            keep.add(int(ids[i]))

    t = pa.table({"query_id": ids, "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = skyline(ds).take_all()
        got = {r["query_id"] for r in rows}
        assert got == keep
        for r in rows:  # coordinates survive unchanged
            assert (r["px"], r["py"]) == (pts[r["query_id"], 0], pts[r["query_id"], 1])
        if prev is not None:
            assert got == prev
        prev = got


def test_tile_buffer_matches_bruteforce(ray_session):
    # bounded Chebyshev distance transform vs direct grid scan
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_buffer
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(83)
    res, d = 4, 2
    g = 1 << res
    pts = rng.random((120, 2))
    occ = np.unique(cell_of_points(pts[:, 0], pts[:, 1], res))
    oxy = np.stack([occ // g, occ % g], axis=1)
    want = {}
    for ix in range(g):
        for iy in range(g):
            cheb = np.maximum(
                np.abs(oxy[:, 0] - ix), np.abs(oxy[:, 1] - iy)
            ).min()
            if cheb <= d:
                want[ix * g + iy] = int(cheb)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_buffer(ds, res=res, max_d=d).take_all()
        got = {r["cell"]: r["dist"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_home_cells_matches_bruteforce(ray_session):
    # per-user argmax tile with (count desc, cell asc) tie-break
    ray = ray_session
    from python_prtree_ray.pipelines.movement import home_cells

    rng = np.random.default_rng(89)
    res = 2  # tiny grid -> many count ties exercise the tie-break
    g = 1 << res
    n = 800
    users = rng.integers(0, 25, n).astype(np.int64)
    gx = rng.integers(0, g, n).astype(np.int64)
    gy = rng.integers(0, g, n).astype(np.int64)
    cell = gx * g + gy
    want = {}
    for u in np.unique(users):
        m = users == u
        cs, counts = np.unique(cell[m], return_counts=True)
        order = np.lexsort((cs, -counts))
        want[int(u)] = (int(cs[order[0]]), int(counts[order[0]]), int(m.sum()))

    t = pa.table({"user_id": users, "gx": gx, "gy": gy})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = home_cells(ds, res=res).take_all()
        got = {
            r["user_id"]: (r["home_cell"], r["n_visits"], r["n_points"])
            for r in rows
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_radius_of_gyration_matches_bruteforce(ray_session):
    # exact-int rog2 vs direct float recompute; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.movement import radius_of_gyration

    rng = np.random.default_rng(97)
    n = 700
    users = rng.integers(0, 20, n).astype(np.int64)
    gx = rng.integers(0, 1 << 10, n).astype(np.int64)
    gy = rng.integers(0, 1 << 10, n).astype(np.int64)
    want = {}
    for u in np.unique(users):
        m = users == u
        x, y = gx[m].astype(object), gy[m].astype(object)
        nn = int(m.sum())
        num = nn * int((x * x + y * y).sum()) - int(x.sum()) ** 2 - int(y.sum()) ** 2
        want[int(u)] = (nn, float(num) / float(nn * nn))
        # the exact-int form equals the textbook mean-squared-deviation
        mx, my = gx[m].mean(), gy[m].mean()
        ref = (((gx[m] - mx) ** 2 + (gy[m] - my) ** 2).mean())
        assert abs(want[int(u)][1] - ref) < 1e-6 * max(1.0, ref)

    t = pa.table({"user_id": users, "gx": gx, "gy": gy})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = radius_of_gyration(ds).take_all()
        got = {r["user_id"]: (r["n_points"], r["rog2"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_jump_histogram_matches_bruteforce(ray_session):
    # log2-spaced displacement histogram vs direct pandas recompute
    ray = ray_session
    from python_prtree_ray.pipelines.movement import jump_histogram

    rng = np.random.default_rng(101)
    n, g = 900, 1 << 10
    users = rng.integers(0, 15, n).astype(np.int64)
    gx = rng.integers(0, g, n).astype(np.int64)
    gy = rng.integers(0, g, n).astype(np.int64)
    # force some zero-displacement consecutive fixes
    gx[100] = gx[99]; gy[100] = gy[99]; users[100] = users[99]
    ts = np.datetime64("2024-04-01", "us") + np.arange(n).astype("timedelta64[s]")
    eid = np.arange(n, dtype=np.int64)

    import collections
    want = collections.Counter()
    order = np.lexsort((eid, ts.astype(np.int64), users))
    us, xs, ys, tss = users[order], gx[order], gy[order], ts[order]
    for i in range(1, n):
        if us[i] != us[i - 1]:
            continue
        d2 = int((xs[i] - xs[i - 1]) ** 2 + (ys[i] - ys[i - 1]) ** 2)
        want[-1 if d2 == 0 else d2.bit_length() - 1] += 1
    assert want[-1] >= 1

    t = pa.table(
        {
            "user_id": users,
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": eid,
            "gx": gx,
            "gy": gy,
        }
    )
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = jump_histogram(ds).take_all()
        got = {r["bin"]: r["n"] for r in rows}
        assert got == dict(want)
        if prev is not None:
            assert got == prev
        prev = got


def test_tile_gini_matches_bruteforce(ray_session):
    # rank-weighted exact-int Gini vs the textbook mean-absolute-
    # difference definition; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_gini
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(103)
    res = 3
    # skewed points (squared coords) so gini is far from 0
    pts = rng.random((1200, 2)) ** 2
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    _, x = np.unique(cells, return_counts=True)
    n, s = x.size, int(x.sum())
    mad = np.abs(x[:, None].astype(np.int64) - x[None, :].astype(np.int64)).sum()
    want_gini_textbook = mad / (2.0 * n * n * (s / n))
    xs = np.sort(x).astype(object)
    num = int(((2 * np.arange(n, dtype=object) - n + 1) * xs).sum())
    want = float(num) / float(n * s)
    assert abs(want - want_gini_textbook) < 1e-9
    assert want > 0.15  # non-trivial inequality on this input

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        row = tile_gini(ds, res=res).take_all()[0]
        assert row["n_cells"] == n and row["n_points"] == s
        assert row["gini"] == want
        if prev is not None:
            assert row == prev
        prev = row


def test_std_ellipse_matches_bruteforce(ray_session):
    # exact-int moments vs numpy population moments on the grid;
    # partition-invariant; orientation reported as tan2theta
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import std_ellipse

    rng = np.random.default_rng(104)
    res = 10
    g = 1 << res
    pts = rng.random((900, 2))
    x = np.clip(np.floor(pts[:, 0] * g), 0, g - 1).astype(np.int64)
    y = np.clip(np.floor(pts[:, 1] * g), 0, g - 1).astype(np.int64)
    n = x.size
    vx = (n * int((x * x).sum()) - int(x.sum()) ** 2) / n**2
    vy = (n * int((y * y).sum()) - int(y.sum()) ** 2) / n**2
    cv = (n * int((x * y).sum()) - int(x.sum()) * int(y.sum())) / n**2
    assert abs(vx - x.var()) < 1e-6 and abs(vy - y.var()) < 1e-6

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        row = std_ellipse(ds, grid_res=res).take_all()[0]
        assert row["n_points"] == n
        assert row["mean_x"] == float(int(x.sum())) / float(n)
        assert row["var_x"] == float(n * int((x * x).sum()) - int(x.sum()) ** 2) / float(n * n)
        assert abs(row["cov_xy"] - cv) < 1e-12
        num = 2 * (n * int((x * y).sum()) - int(x.sum()) * int(y.sum()))
        den = (n * int((x * x).sum()) - int(x.sum()) ** 2) - (
            n * int((y * y).sum()) - int(y.sum()) ** 2
        )
        assert row["tan2theta"] == float(num) / float(den)
        if prev is not None:
            assert row == prev
        prev = row


def test_flow_direction_matches_bruteforce(ray_session):
    # D8 steepest-descent with unit weights vs a dense-grid reference;
    # partition-invariant; sinks flagged -1
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import flow_direction
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(105)
    res = 3
    g = 1 << res
    pts = rng.random((600, 2)) ** 2  # skew so some tiles are empty
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    grid = np.zeros((g, g), np.int64)
    for c in cells:
        grid[c // g, c % g] += 1
    want = {}
    for ix in range(g):
        for iy in range(g):
            if grid[ix, iy] == 0:
                continue
            best = None
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    nx, ny = ix + dx, iy + dy
                    if not (0 <= nx < g and 0 <= ny < g):
                        continue
                    cand = (grid[nx, ny], (dx + 1) * 3 + (dy + 1))
                    if best is None or cand < best:
                        best = cand
            x = int(grid[ix, iy])
            if best is not None and best[0] < x:
                want[ix * g + iy] = (x, best[1], x - int(best[0]))
            else:
                want[ix * g + iy] = (x, -1, 0)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = flow_direction(ds, res=res).take_all()
        got = {r["cell"]: (r["x"], r["flow_dir"], r["drop_n"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # some cell flows and at least one non-trivial drop on skewed input
    assert any(v[1] >= 0 and v[2] > 0 for v in want.values())


def test_cross_k_matches_bruteforce(ray_session):
    # exact cross-pair count vs the O(nA*nB) reference at two radii;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import cross_k

    rng = np.random.default_rng(106)
    a = rng.random((300, 2))
    b = rng.random((500, 2))
    ta = pa.table({"px": a[:, 0], "py": a[:, 1]})
    tb = pa.table({"px": b[:, 0], "py": b[:, 1]})
    for r in (0.03, 0.11):
        dx = a[:, 0][:, None] - b[:, 0][None, :]
        dy = a[:, 1][:, None] - b[:, 1][None, :]
        want_pairs = int((dx * dx + dy * dy <= r * r).sum())
        prev = None
        for blocks in (1, 4):
            da = ray.data.from_arrow(ta).repartition(blocks)
            db = ray.data.from_arrow(tb).repartition(blocks)
            row = cross_k(da, db, radius=r).take_all()[0]
            assert row["n_a"] == 300 and row["n_b"] == 500
            assert row["n_pairs"] == want_pairs
            assert row["k_ab"] == float(want_pairs) / float(300 * 500)
            if prev is not None:
                assert row == prev
            prev = row


def test_semivariogram_matches_bruteforce(ray_session):
    # binned gamma vs the O(n^2) ordered-pair reference; self-pairs
    # excluded; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import semivariogram

    rng = np.random.default_rng(107)
    n, r, nb = 400, 0.12, 6
    pts = rng.random((n, 2))
    z = rng.integers(0, 1000, n).astype(np.int64)
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    d2 = dx * dx + dy * dy
    hit = (d2 <= r * r) & ~np.eye(n, dtype=bool)
    edges = np.array([(r * k / nb) ** 2 for k in range(1, nb)])
    bins = (d2[hit][:, None] > edges[None, :]).sum(1)
    dz2 = ((z[:, None] - z[None, :]) ** 2)[hit]
    want = {}
    for k in range(nb):
        m = bins == k
        if m.sum():
            want[k] = (int(m.sum()), int(dz2[m].sum()),
                       float(int(dz2[m].sum())) / float(2 * int(m.sum())))

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1], "pz": z,
                  "query_id": np.arange(n, dtype=np.int64)})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = semivariogram(ds, radius=r, n_bins=nb).take_all()
        got = {r0["bin"]: (r0["n_pairs"], r0["sum_dz2"], r0["gamma"]) for r0 in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_nn_histogram_matches_bruteforce(ray_session):
    # exact log2-lag NN-distance histogram vs the O(n^2) reference,
    # with injected coincident points exercising the s=0 -> -1 bin;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.knn import nn_histogram

    rng = np.random.default_rng(108)
    n = 350
    pts = rng.random((n, 2))
    pts[17] = pts[3]  # coincident pair -> nn d2 = 0 for both
    ids = np.arange(n, dtype=np.int64)

    def coords(k):
        return {"px": pts[k, 0], "py": pts[k, 1]}

    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    nn_d2 = d2.min(axis=1)
    MOD2 = 1000000007.0 * 1000000007.0
    s = np.floor(nn_d2 * MOD2).astype(np.int64)
    want = {}
    for v in s:
        b = -1 if v == 0 else int(v).bit_length() - 1
        want[b] = want.get(b, 0) + 1

    t = pa.table({"query_id": ids, "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = nn_histogram(ds, coords=coords).take_all()
        got = {r["bin"]: r["n"] for r in rows}
        assert got == want
        assert got.get(-1, 0) == 2
        if prev is not None:
            assert got == prev
        prev = got


def test_bigram_lift_matches_bruteforce(ray_session):
    # lift ranking vs a pure-Python reference with doc boundaries,
    # punctuation, case folding, and empty docs; partition-invariant
    ray = ray_session
    import re
    from collections import Counter
    from python_prtree_ray.pipelines.text import bigram_lift

    rng = np.random.default_rng(109)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    for _ in range(40):
        L = int(rng.integers(0, 12))
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), L)]
        # punctuation/case noise the tokenizer must strip
        docs.append(" ".join(w.upper() if rng.random() < 0.3 else w + "," for w in words))
    docs.append("")  # empty doc
    docs.append("solo")  # single-token doc -> no bigram

    pair_counts = Counter()
    for d in docs:
        toks = re.findall(r"[a-z]+", d.lower())
        for a, b in zip(toks, toks[1:]):
            pair_counts[(a, b)] += 1
    T = sum(pair_counts.values())
    left = Counter()
    right = Counter()
    for (a, b), c in pair_counts.items():
        left[a] += c
        right[b] += c
    min_count, k = 2, 10
    cand = [
        (a, b, c, left[a], right[b], float(c * T) / float(left[a] * right[b]))
        for (a, b), c in pair_counts.items()
        if c >= min_count
    ]
    cand.sort(key=lambda r0: (-r0[5], r0[0], r0[1]))
    want = [
        {"w1": a, "w2": b, "n_xy": c, "n_x": nx, "n_y": ny, "lift": lf,
         "rank": i + 1}
        for i, (a, b, c, nx, ny, lf) in enumerate(cand[:k])
    ]
    assert len(want) >= 3  # non-trivial input

    t = pa.table({"text": docs})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = bigram_lift(ds, k=k, min_count=min_count).take_all()
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_track_diameter_matches_bruteforce(ray_session):
    # hull+calipers diameter vs the O(n^2) all-pairs reference,
    # including singleton, coincident, and collinear tracks;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import track_diameter

    rng = np.random.default_rng(110)
    rows_u, rows_x, rows_y = [], [], []
    want = {}
    for u in range(25):
        L = int(rng.integers(1, 40))
        if u == 0:
            x = np.array([7]); y = np.array([3])            # singleton
        elif u == 1:
            x = np.full(5, 9); y = np.full(5, 9)            # coincident
        elif u == 2:
            x = np.arange(6) * 3; y = np.arange(6) * 4      # collinear
        else:
            x = rng.integers(0, 1024, L)
            y = rng.integers(0, 1024, L)
        x, y = x.astype(np.int64), y.astype(np.int64)
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        want[u] = (x.size, int((dx * dx + dy * dy).max()))
        rows_u.append(np.full(x.size, u, np.int64))
        rows_x.append(x)
        rows_y.append(y)
    t = pa.table(
        {
            "user_id": np.concatenate(rows_u),
            "gx": np.concatenate(rows_x),
            "gy": np.concatenate(rows_y),
        }
    )
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = track_diameter(ds).take_all()
        got = {r["user_id"]: (r["n_points"], r["diam2"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    assert want[0][1] == 0 and want[1][1] == 0 and want[2][1] == 15 * 15 + 20 * 20


def test_contour_cases_matches_bruteforce(ray_session):
    # marching-squares case codes vs a dense-grid reference;
    # partition-invariant; all-above (15) and all-below (0) excluded
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import contour_cases
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(111)
    res, t = 3, 2
    g = 1 << res
    pts = rng.random((900, 2)) ** 2  # skewed so both 0 and 15 blocks exist
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    grid = np.zeros((g, g), np.int64)
    for c in cells:
        grid[c // g, c % g] += 1
    b = (grid >= t).astype(np.int64)
    want = {}
    n_full = 0
    for bx in range(g - 1):
        for by in range(g - 1):
            code = 8 * b[bx, by] + 4 * b[bx + 1, by] + 2 * b[bx + 1, by + 1] + b[bx, by + 1]
            if code == 15:
                n_full += 1
            if 0 < code < 15:
                want[bx * g + by] = code
    assert want and n_full  # non-trivial: iso-line exists, interior exists

    tbl = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        rows = contour_cases(ds, res=res, threshold=t).take_all()
        got = {r["block"]: r["case_code"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_segment_tiles_matches_bruteforce(ray_session):
    # supercover SAT test vs an all-tiles scalar reference (no
    # candidate-range pruning), incl. boundary-riding and degenerate
    # zero-length moves; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.movement import segment_tiles

    rng = np.random.default_rng(112)
    fine_res, res = 6, 3
    gf, g = 1 << fine_res, 1 << res
    w = 1 << (fine_res - res)
    users, tss, seqs, xs, ys = [], [], [], [], []
    seq = 0
    for u in range(8):
        L = int(rng.integers(2, 9))
        x = rng.integers(0, gf, L)
        y = rng.integers(0, gf, L)
        if u == 0:
            x[:2] = [16, 32]; y[:2] = [8, 8]   # ride a tile boundary? y=8=w -> boundary row
        if u == 1:
            x[0] = x[1]; y[0] = y[1]           # zero-length move
        for i in range(L):
            users.append(u); tss.append(1_000_000 * (i + 1)); seqs.append(seq)
            xs.append(int(x[i])); ys.append(int(y[i]))
            seq += 1

    def seg_hits(x1, y1, x2, y2):
        out = set()
        for cx in range(g):
            for cy in range(g):
                X0, X1, Y0, Y1 = cx * w, (cx + 1) * w, cy * w, (cy + 1) * w
                if not (max(x1, x2) >= X0 and min(x1, x2) <= X1
                        and max(y1, y2) >= Y0 and min(y1, y2) <= Y1):
                    continue
                dx, dy = x2 - x1, y2 - y1
                cs = [dx * (py - y1) - dy * (px - x1)
                      for px in (X0, X1) for py in (Y0, Y1)]
                if all(c > 0 for c in cs) or all(c < 0 for c in cs):
                    continue
                out.add(cx * g + cy)
        return out

    want = set()
    by_user = {}
    for u, t0, s, x, y in zip(users, tss, seqs, xs, ys):
        by_user.setdefault(u, []).append((t0, s, x, y))
    for u, rows in by_user.items():
        rows.sort()
        for (t1, s1, x1, y1), (t2, s2, x2, y2) in zip(rows, rows[1:]):
            if max(abs(x2 - x1), abs(y2 - y1)) <= 128:
                for c in seg_hits(x1, y1, x2, y2):
                    want.add((u, s1, c))

    t = pa.table(
        {
            "user_id": np.array(users, np.int64),
            "ts": pa.array(
                np.array(tss, "datetime64[us]"), pa.timestamp("us")
            ),
            "event_id": np.array(seqs, np.int64),
            "gx": np.array(xs, np.int64),
            "gy": np.array(ys, np.int64),
        }
    )
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = segment_tiles(ds, res=res, fine_res=fine_res).take_all()
        got = {(r["user_id"], r["seq"], r["cell"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # boundary-riding move must hit tiles on BOTH sides of the ridden row
    u0 = {c for (u, s, c) in want if u == 0}
    assert u0


def test_span_transitions_matches_bruteforce(ray_session):
    # transition counts vs a per-doc Python reference over hand-built
    # interleaved spans, incl. single-span and empty docs;
    # partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.multimodal import span_transitions

    rng = np.random.default_rng(113)
    kinds = ["text", "image", "audio", "video"]
    docs = []
    for i in range(60):
        L = int(rng.integers(0, 7)) if i else 1  # doc 0: single span
        docs.append([kinds[int(j)] for j in rng.integers(0, 4, L)])
    want = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            want[(a, b)] += 1

    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    flat = [
        {"kind": k, "text": "", "media_ref": "", "offset": 0}
        for d in docs
        for k in d
    ]
    offs = np.concatenate([[0], np.cumsum([len(d) for d in docs])]).astype(np.int32)
    spans = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(flat, type=span_type)
    )
    t = pa.table({"doc_id": [f"d{i}" for i in range(len(docs))], "spans": spans})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = span_transitions(ds).take_all()
        got = {(r["from_kind"], r["to_kind"]): r["n"] for r in rows}
        assert got == dict(want)
        if prev is not None:
            assert got == prev
        prev = got


def test_char_trigrams_matches_bruteforce(ray_session):
    # byte-buffer trigram extraction vs a pure-Python reference with
    # unicode noise, short words, and case folding; partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.text import char_trigrams

    import re as _re

    docs = [
        "The quick brown fox-jumps; over THE lazy dog",
        "ab abc abcd ünïcödé stripped",   # non-ascii splits words
        "",
        "aaaa aaa aa a",
    ]
    want = Counter()
    for d in docs:
        for w in _re.findall(r"[a-z]+", d.lower()):
            for i in range(len(w) - 2):
                want[w[i : i + 3]] += 1
    k = 10
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    want_rows = [
        {"gram": g, "n": n, "rank": i + 1} for i, (g, n) in enumerate(ranked)
    ]

    t = pa.table({"text": docs})
    prev = None
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = char_trigrams(ds, k=k).take_all()
        assert got == want_rows
        if prev is not None:
            assert got == prev
        prev = got


def test_turn_histogram_matches_bruteforce(ray_session):
    # exact cross/dot turn classes vs a per-track Python reference,
    # incl. stationary fixes, straight runs, and u-turns;
    # partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.movement import turn_histogram

    rng = np.random.default_rng(114)
    users, tss, seqs, xs, ys = [], [], [], [], []
    tracks = {
        0: [(0, 0), (1, 0), (2, 0), (3, 1), (4, 0), (3, 0), (3, 0)],
        # straight, left, right, uturn-ish, degenerate
        1: [(5, 5), (5, 5), (6, 6)],  # degenerate first move
        2: [(0, 0), (2, 2), (0, 0)],  # perfect u-turn
    }
    for u in range(3, 10):
        tracks[u] = [tuple(map(int, p)) for p in rng.integers(0, 50, (8, 2))]
    seq = 0
    for u, pts in tracks.items():
        for i, (x, y) in enumerate(pts):
            users.append(u); tss.append((i + 1) * 1_000_000); seqs.append(seq)
            xs.append(x); ys.append(y); seq += 1

    def classify(p1, p2, p3):
        d1 = (p2[0] - p1[0], p2[1] - p1[1])
        d2 = (p3[0] - p2[0], p3[1] - p2[1])
        if d1 == (0, 0) or d2 == (0, 0):
            return "degenerate"
        cr = d1[0] * d2[1] - d1[1] * d2[0]
        if cr > 0:
            return "left"
        if cr < 0:
            return "right"
        return "straight" if d1[0] * d2[0] + d1[1] * d2[1] > 0 else "uturn"

    want = Counter()
    for u, pts in tracks.items():
        for p1, p2, p3 in zip(pts, pts[1:], pts[2:]):
            want[(u, classify(p1, p2, p3))] += 1

    t = pa.table(
        {
            "user_id": np.array(users, np.int64),
            "ts": pa.array(np.array(tss, "datetime64[us]"), pa.timestamp("us")),
            "event_id": np.array(seqs, np.int64),
            "gx": np.array(xs, np.int64),
            "gy": np.array(ys, np.int64),
        }
    )
    assert ("2", ) is not None and want[(2, "uturn")] == 1
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = turn_histogram(ds).take_all()
        got = {(r["user_id"], r["turn"]): r["n_turns"] for r in rows}
        assert got == dict(want)
        if prev is not None:
            assert got == prev
        prev = got


def test_emb_covariance_matches_bruteforce(ray_session):
    # scaled-int covariance vs the numpy reference on the same grid;
    # partition-invariant (float sums would NOT be)
    ray = ray_session
    from python_prtree_ray.pipelines.ann import emb_covariance

    rng = np.random.default_rng(115)
    n, d = 300, 8
    E = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)
    X = np.floor(E.astype(np.float64) * (1 << 20)).astype(np.int64)
    sv = X.sum(0)
    sp = X.T @ X
    want = {}
    for i in range(d):
        for j in range(i, d):
            num = n * int(sp[i, j]) - int(sv[i]) * int(sv[j])
            want[(i, j)] = float(num) / float(n * n)

    t = pa.table({"embedding": pa.array(list(E), pa.list_(pa.float32()))})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = emb_covariance(ds).take_all()
        got = {(r["i"], r["j"]): r["cov"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    # sanity: diagonal is positive and close to the float variance
    var0 = float(((X[:, 0] - X[:, 0].mean()) ** 2).mean())
    assert abs(want[(0, 0)] - var0) < 1.0


def test_tile_majority_matches_bruteforce(ray_session):
    # zonal mode vs a Counter reference with forced count ties
    # (lexicographic winner); partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.tiling import tile_majority
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(116)
    res = 2
    n = 800
    pts = rng.random((n, 2))
    classes = np.array(["zebra", "apple", "mango"])[rng.integers(0, 3, n)]
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    by_cell = {}
    for c, k in zip(cells, classes):
        by_cell.setdefault(int(c), Counter())[k] += 1
    want = {
        c: min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for c, cnt in by_cell.items()
    }
    # ensure at least one tie exists somewhere (statistically near-certain
    # with 50 pts/cell over 3 classes; assert so the tie path is covered)
    assert any(
        sorted(cnt.values(), reverse=True)[:2][0] == sorted(cnt.values(), reverse=True)[:2][-1]
        for cnt in by_cell.values() if len(cnt) > 1
    )

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1], "cls": classes})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_majority(ds, res=res).take_all()
        got = {r["cell"]: (r["cls"], r["n"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_ripley_curve_matches_bruteforce(ray_session):
    # binned + cumulative pair counts vs the O(n^2) reference;
    # self-pairs excluded; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import ripley_curve

    rng = np.random.default_rng(117)
    n, r, nb = 500, 0.1, 6
    pts = rng.random((n, 2))
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    d2 = dx * dx + dy * dy
    hit = (d2 <= r * r) & ~np.eye(n, dtype=bool)
    edges = np.array([(r * k / nb) ** 2 for k in range(1, nb)])
    bins = (d2[hit][:, None] > edges[None, :]).sum(1)
    cnt = np.bincount(bins, minlength=nb)
    want = []
    cum = 0
    for b in range(nb):
        if cnt[b]:
            cum += int(cnt[b])
            want.append(
                {"bin": b, "n_pairs": int(cnt[b]), "cum_pairs": cum,
                 "k_r": float(cum) / float(n * n)}
            )

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1],
                  "query_id": np.arange(n, dtype=np.int64)})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = ripley_curve(ds, radius=r, n_bins=nb).take_all()
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_type_colocation_matches_bruteforce(ray_session):
    # pair lift vs a set-based Python reference with a type that never
    # co-occurs (absent pair) and skewed tiles; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import type_colocation
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(118)
    res = 2
    pts = rng.random((500, 2)) * 0.49  # left-bottom quadrant only
    classes = np.array(["aa", "bb", "cc"])[rng.integers(0, 3, 500)]
    # a 4th class alone in its own far corner tile: no co-occurrence
    pts = np.vstack([pts, [[0.99, 0.99]]])
    classes = np.append(classes, "dd")
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    tiles = {}
    for c, k in zip(cells, classes):
        tiles.setdefault(int(c), set()).add(k)
    T = len(tiles)
    singles = {}
    pairs = {}
    for ks in tiles.values():
        for a in ks:
            singles[a] = singles.get(a, 0) + 1
        for a in sorted(ks):
            for b in sorted(ks):
                if a < b:
                    pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = [
        {"type_a": a, "type_b": b, "n_a": singles[a], "n_b": singles[b],
         "n_both": n, "lift": float(n * T) / float(singles[a] * singles[b])}
        for (a, b), n in sorted(pairs.items())
    ]
    assert not any("dd" in (r["type_a"], r["type_b"]) for r in want)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1], "cls": classes})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = type_colocation(ds, res=res).take_all()
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_knn_regress_matches_bruteforce(ray_session):
    # neighbor-mean prediction vs the O(nq*nb) reference with the
    # (dist2, idx) tie order and a data side smaller than k;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.knn import knn_regress

    rng = np.random.default_rng(119)
    nb, nq, k = 40, 25, 7
    centers = rng.random((nb, 2))
    half = rng.random((nb, 2)) * 0.01
    qs = rng.random((nq, 2))
    meas = rng.integers(0, 1000, nb).astype(np.int64)

    def measure(idx):
        return meas[idx]

    boxes = pa.table(
        {
            "idx": np.arange(nb, dtype=np.int64),
            "xmin": centers[:, 0] - half[:, 0],
            "ymin": centers[:, 1] - half[:, 1],
            "xmax": centers[:, 0] + half[:, 0],
            "ymax": centers[:, 1] + half[:, 1],
        }
    )
    pts = pa.table(
        {
            "query_id": np.arange(nq, dtype=np.int64),
            "px": qs[:, 0],
            "py": qs[:, 1],
        }
    )
    for kk in (k, nb + 5):  # second case: data side smaller than k
        want = {}
        for q in range(nq):
            d2 = ((centers[:, 0] - qs[q, 0]) ** 2 + (centers[:, 1] - qs[q, 1]) ** 2)
            order = sorted(range(nb), key=lambda i: (d2[i], i))[:kk]
            s = int(meas[order].sum())
            want[q] = (len(order), s, float(s) / float(len(order)))
        prev = None
        for blocks in (1, 4):
            db = ray.data.from_arrow(boxes).repartition(blocks)
            dp = ray.data.from_arrow(pts).repartition(blocks)
            rows = knn_regress(db, dp, k=kk, measure=measure).take_all()
            got = {r["query_id"]: (r["n_nb"], r["sum_v"], r["pred"]) for r in rows}
            assert got == want
            if prev is not None:
                assert got == prev
            prev = got


def test_iou_join_matches_bruteforce(ray_session):
    # IoU pairs vs the O(n^2) reference with identical expression
    # shapes; threshold boundary exercised; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.spatial_join import iou_join

    rng = np.random.default_rng(120)
    n = 120
    c = rng.random((n, 2)) * 0.3  # dense -> plenty of overlaps
    h = rng.random((n, 2)) * 0.05 + 0.01
    xmin, ymin = c[:, 0] - h[:, 0], c[:, 1] - h[:, 1]
    xmax, ymax = c[:, 0] + h[:, 0], c[:, 1] + h[:, 1]

    def coords(ids):
        return {
            "xmin": xmin[ids], "ymin": ymin[ids],
            "xmax": xmax[ids], "ymax": ymax[ids],
        }

    t_thr = 0.1
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            if xmin[i] <= xmax[j] and xmin[j] <= xmax[i] and ymin[i] <= ymax[j] and ymin[j] <= ymax[i]:
                iw = min(xmax[i], xmax[j]) - max(xmin[i], xmin[j])
                ih = min(ymax[i], ymax[j]) - max(ymin[i], ymin[j])
                inter = iw * ih
                aa = (xmax[i] - xmin[i]) * (ymax[i] - ymin[i])
                ab = (xmax[j] - xmin[j]) * (ymax[j] - ymin[j])
                iou = inter / (aa + ab - inter)
                if iou >= t_thr:
                    want[(i, j)] = iou
    assert len(want) > 20

    boxes = pa.table(
        {
            "idx": np.arange(n, dtype=np.int64),
            "xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax,
        }
    )
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(boxes).repartition(blocks)
        rows = iou_join(ds, threshold=t_thr, coords=coords).take_all()
        got = {(r["idx_a"], r["idx_b"]): r["iou"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_tile_focal_mean_matches_bruteforce(ray_session):
    # 3x3 focal mean vs a dense-grid reference incl. edge windows;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_focal_mean
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(121)
    res = 3
    g = 1 << res
    pts = rng.random((500, 2)) ** 2
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    grid = np.zeros((g, g), np.int64)
    for c in cells:
        grid[c // g, c % g] += 1
    want = {}
    for ix in range(g):
        for iy in range(g):
            if grid[ix, iy] == 0:
                continue
            xs = range(max(ix - 1, 0), min(ix + 1, g - 1) + 1)
            ys = range(max(iy - 1, 0), min(iy + 1, g - 1) + 1)
            fs = int(sum(grid[a, b] for a in xs for b in ys))
            nw = len(xs) * len(ys)
            want[ix * g + iy] = (int(grid[ix, iy]), fs, nw, fs / nw)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_focal_mean(ds, res=res).take_all()
        got = {
            r["cell"]: (r["x"], r["focal_sum"], r["n_window"], r["focal_mean"])
            for r in rows
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got
    assert any(v[2] < 9 for v in want.values())  # edge windows covered


def test_lorenz_curve_matches_bruteforce(ray_session):
    # decile prefix shares vs a sorted reference, incl. the n<10
    # duplicate-boundary case; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import lorenz_curve
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(122)
    for res, npts in ((3, 1000), (1, 60)):  # res 1 -> 4 tiles < 10 deciles
        g = 1 << res
        pts = rng.random((npts, 2)) ** 2
        cells = cell_of_points(pts[:, 0], pts[:, 1], res)
        _, x = np.unique(cells, return_counts=True)
        x = np.sort(x)
        n, s = x.size, int(x.sum())
        cum = np.cumsum(x)
        want = []
        for d in range(10):
            b = (n * (d + 1)) // 10
            if b < 1:
                continue
            want.append(
                {"decile": d, "n_tiles_cum": int(b), "n_points_cum": int(cum[b - 1]),
                 "tiles_share": float(b) / float(n),
                 "points_share": float(int(cum[b - 1])) / float(s)}
            )
        t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
        prev = None
        for blocks in (1, 4):
            ds = ray.data.from_arrow(t).repartition(blocks)
            got = lorenz_curve(ds, res=res).take_all()
            assert got == want
            if prev is not None:
                assert got == prev
            prev = got


def test_tile_simpson_matches_bruteforce(ray_session):
    # Simpson diversity per tile vs a Counter reference; single-point
    # tiles dropped; partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.tiling import tile_simpson
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(211)
    res = 2
    n = 700
    pts = rng.random((n, 2))
    classes = np.array(["ad", "news", "spam", "wiki"])[rng.integers(0, 4, n)]
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    by_cell = {}
    for c, k in zip(cells, classes):
        by_cell.setdefault(int(c), Counter())[k] += 1
    want = {}
    for c, cnt in by_cell.items():
        N = sum(cnt.values())
        if N < 2:
            continue
        num = sum(v * (v - 1) for v in cnt.values())
        want[c] = (N, len(cnt), 1.0 - float(num) / float(N * (N - 1)))

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1], "cls": classes})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_simpson(ds, res=res).take_all()
        got = {r["cell"]: (r["n"], r["n_types"], r["simpson"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_voronoi_assign_matches_bruteforce(ray_session):
    # nearest-seed tile assignment vs an O(T*K) reference with a FORCED
    # equidistant tie (winner = smallest seed id); partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import voronoi_assign
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(212)
    res = 3
    g = 1 << res
    n = 900
    pts = rng.random((n, 2))
    # seeds at (1,1) and (5,1): tile column ix=3 is exactly equidistant
    sid = np.array([40, 7], np.int64)  # deliberately unsorted ids
    sx = np.array([1, 5], np.int64)
    sy = np.array([1, 1], np.int64)

    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    want = {}
    for c in np.unique(cells):
        ix, iy = int(c) // g, int(c) % g
        best = min(
            ((int((ix - x) ** 2 + (iy - y) ** 2), int(i)) for i, x, y in zip(sid, sx, sy)),
        )
        want[int(c)] = (int((cells == c).sum()), best[1], best[0])
    # the tie column must be populated for the tie-break to be exercised
    assert any(int(c) // g == 3 for c in want)

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = voronoi_assign(ds, sid, sx, sy, res=res).take_all()
        got = {r["cell"]: (r["n"], r["seed"], r["d2"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_grid_bfs_matches_bruteforce(ray_session):
    # multi-source BFS over occupied tiles vs a deque reference:
    # exact hop distances, max_hops cutoff, unreachable cells absent,
    # seed tiles are graph nodes even when unoccupied
    ray = ray_session
    from collections import deque
    from python_prtree_ray.pipelines.tiling import grid_bfs
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(213)
    res = 4
    g = 1 << res
    n = 260  # sparse: ~every other tile occupied -> real holes
    pts = rng.random((n, 2))
    sx = np.array([0, 9], np.int64)
    sy = np.array([0, 12], np.int64)
    hops = 4

    cells = set(int(c) for c in cell_of_points(pts[:, 0], pts[:, 1], res))
    nodes = cells | {int(x) * g + int(y) for x, y in zip(sx, sy)}
    dist = {int(x) * g + int(y): 0 for x, y in zip(sx, sy)}
    q = deque(dist)
    while q:
        c = q.popleft()
        if dist[c] >= hops:
            continue
        ix, iy = c // g, c % g
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            jx, jy = ix + dx, iy + dy
            if 0 <= jx < g and 0 <= jy < g:
                nc = jx * g + jy
                if nc in nodes and nc not in dist:
                    dist[nc] = dist[c] + 1
                    q.append(nc)
    assert max(dist.values()) == hops  # cutoff exercised
    assert len(dist) < len(nodes)  # some cells unreachable

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = grid_bfs(ds, sx, sy, res=res, max_hops=hops).take_all()
        got = {r["cell"]: r["dist"] for r in rows}
        assert got == dist
        if prev is not None:
            assert got == prev
        prev = got


def test_tile_motifs_matches_bruteforce(ray_session):
    # global top-k consecutive-tile trigrams vs a Counter reference
    # with the (n DESC, packed trigram ASC) tie order; triples never
    # cross entities; partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.movement import tile_motifs

    rng = np.random.default_rng(214)
    res, k = 2, 12
    g = 1 << res
    n = 600
    users = rng.integers(0, 15, n).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype("datetime64[us]")
    seq = np.arange(n, dtype=np.int64)
    gx = rng.integers(0, g, n).astype(np.int64)
    gy = rng.integers(0, g, n).astype(np.int64)

    cnt = Counter()
    for u in np.unique(users):
        m = users == u
        order = np.lexsort((seq[m], ts[m].astype(np.int64)))
        cells = (gx[m] * g + gy[m])[order]
        for a, b, c in zip(cells[:-2], cells[1:-1], cells[2:]):
            cnt[(int(a), int(b), int(c))] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    want = [
        {"from_cell": t[0], "mid_cell": t[1], "to_cell": t[2], "n": n_,
         "rank": i + 1}
        for i, (t, n_) in enumerate(ranked)
    ]
    assert want[0]["n"] > 1  # motifs actually repeat at this density

    t = pa.table({"user_id": users, "ts": ts, "event_id": seq,
                  "gx": gx, "gy": gy})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = tile_motifs(ds, res=res, k=k).take_all()
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_record_events_matches_bruteforce(ray_session):
    # per-user running-max record stream vs a per-row reference; ties
    # are NOT records (strict >); duplicate values + long segments
    # exercise the segmented doubling scan; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.windows import record_events

    rng = np.random.default_rng(215)
    n = 800
    users = rng.integers(0, 7, n).astype(np.int64)  # long segments
    ts = rng.integers(0, 10**8, n).astype("datetime64[us]")
    seq = np.arange(n, dtype=np.int64)
    value = rng.integers(0, 20, n) / 4.0  # heavy ties

    want = set()
    for u in np.unique(users):
        m = np.flatnonzero(users == u)
        order = m[np.lexsort((seq[m], ts[m].astype(np.int64)))]
        best = None
        for i in order:
            c = int(np.floor(value[i] * 100.0))
            if best is None or c > best:
                want.add((int(u), int(seq[i]), c))
                best = c

    t = pa.table({"user_id": users, "ts": ts, "event_id": seq, "value": value})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = record_events(ds).take_all()
        got = {(r["user_id"], r["event_id"], r["value_cents"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_cohort_retention_matches_bruteforce(ray_session):
    # retention triangle vs a set-based reference: distinct-user counts
    # per (first week, offset); offset-0 equals cohort size
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.windows import cohort_retention, WEEK_US

    rng = np.random.default_rng(216)
    n = 900
    users = rng.integers(0, 40, n).astype(np.int64)
    ts = (rng.integers(0, 12, n) * WEEK_US + rng.integers(0, WEEK_US, n)).astype(
        "datetime64[us]"
    )

    weeks = ts.astype(np.int64) // WEEK_US
    uw = {(int(u), int(w)) for u, w in zip(users, weeks)}
    first = {}
    for u, w in sorted(uw):
        first.setdefault(u, w)
    cnt = Counter((first[u], w - first[u]) for u, w in uw)
    want = {k: v for k, v in cnt.items()}
    cohort_sizes = Counter(first.values())
    for (c, off), v in want.items():
        if off == 0:
            assert v == cohort_sizes[c]

    t = pa.table({"user_id": users, "ts": ts})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = cohort_retention(ds).take_all()
        got = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_lexical_diversity_matches_bruteforce(ray_session):
    # per-doc token counts / distinct / Simpson vs a Counter reference;
    # sub-2-token docs drop; punctuation splits; partition-invariant
    ray = ray_session
    import re
    from collections import Counter
    from python_prtree_ray.pipelines.text import lexical_diversity

    texts = [
        "The cat sat. The cat SAT!",
        "one",                      # 1 token -> dropped
        "",                         # 0 tokens -> dropped
        "a b c d e",
        "spam spam spam spam",
        "Mixed42case and MIXED42CASE tokens split on digits",
    ]
    ids = np.arange(len(texts), dtype=np.int64)
    want = {}
    for i, s in zip(ids, texts):
        toks = re.findall("[a-z]+", s.lower())
        n = len(toks)
        if n < 2:
            continue
        cnt = Counter(toks)
        num = sum(v * (v - 1) for v in cnt.values())
        want[int(i)] = (n, len(cnt), 1.0 - float(num) / float(n * (n - 1)))

    t = pa.table({"doc_id": ids, "text": texts})
    prev = None
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = lexical_diversity(ds).take_all()
        got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["simpson"])
               for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_interarrival_hist_matches_bruteforce(ray_session):
    # log2-binned same-user gaps vs a reference with zero gaps (bin -1)
    # forced; gaps never cross users; partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.movement import interarrival_hist

    rng = np.random.default_rng(217)
    n = 500
    users = rng.integers(0, 9, n).astype(np.int64)
    ts_i = rng.integers(0, 10**7, n)
    u0 = np.flatnonzero(users == 0)[:3]
    ts_i[u0] = ts_i[u0[0]]  # same-user duplicate stamps -> zero gaps
    seq = np.arange(n, dtype=np.int64)

    cnt = Counter()
    for u in np.unique(users):
        m = users == u
        order = np.lexsort((seq[m], ts_i[m]))
        dt = np.diff(ts_i[m][order])
        for d in dt:
            cnt[-1 if d == 0 else int(np.frexp(float(d))[1] - 1)] += 1
    assert cnt.get(-1, 0) > 0  # zero-gap path exercised

    t = pa.table({"user_id": users, "ts": ts_i.astype("datetime64[us]"),
                  "event_id": seq})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {r["bin"]: r["n_gaps"] for r in interarrival_hist(ds).take_all()}
        assert got == dict(cnt)
        if prev is not None:
            assert got == prev
        prev = got


def test_above_group_mean_matches_bruteforce(ray_session):
    # strict above-mean filter vs per-group reference; a group whose
    # members are all equal yields NO rows (strict >); partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.agg import above_group_mean

    rng = np.random.default_rng(218)
    n = 600
    keys = rng.integers(0, 30, n).astype(np.int64)
    vals = rng.integers(-50, 50, n).astype(np.int64)
    vals[keys == 3] = 7  # an all-equal group -> zero rows from it
    ids = np.arange(n, dtype=np.int64)

    want = set()
    for g in np.unique(keys):
        m = keys == g
        s, c = vals[m].sum(), m.sum()
        for i, v in zip(ids[m], vals[m]):
            if v * c > s:
                want.add((int(i), int(g), int(v)))
    assert not any(g == 3 for _, g, _ in want)

    t = pa.table({"k": keys, "id": ids, "cents": vals})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = above_group_mean(
            ds, key_col="k", id_col="id", cents_col="cents"
        ).take_all()
        got = {(r["id"], r["k"], r["cents"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_emb_dim_quantiles_matches_bruteforce(ray_session):
    # per-dimension R-7 quantiles of the scaled grid vs numpy
    ray = ray_session
    from python_prtree_ray.pipelines.ann import emb_dim_quantiles

    rng = np.random.default_rng(219)
    n, d = 400, 6
    E = rng.normal(size=(n, d)).astype(np.float32)
    Q = np.floor(E.astype(np.float64) * 1024.0).astype(np.int64)

    def r7(x, q):  # the engine/DuckDB expression: (1-f)*lo + f*hi
        s = np.sort(x)
        h = (len(s) - 1) * q
        lo = int(np.floor(h))
        f = h - lo
        return (1.0 - f) * float(s[lo]) + f * float(s[min(lo + 1, len(s) - 1)])

    want = {
        dim: tuple(r7(Q[:, dim], q) for q in (0.5, 0.9, 0.99))
        for dim in range(d)
    }

    t = pa.table({"embedding": pa.array(list(E), pa.list_(pa.float32()))})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = emb_dim_quantiles(ds).take_all()
        got = {r["dim"]: (r["p50"], r["p90"], r["p99"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_max_dwell_run_matches_bruteforce(ray_session):
    # longest same-tile streak per user vs a scan reference; coarse grid
    # forces multi-event runs; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.movement import max_dwell_run

    rng = np.random.default_rng(220)
    res = 1  # 2x2 grid -> long runs
    n = 500
    users = rng.integers(0, 12, n).astype(np.int64)
    ts = rng.integers(0, 10**8, n).astype("datetime64[us]")
    seq = np.arange(n, dtype=np.int64)
    gx = rng.integers(0, 2, n).astype(np.int64)
    gy = rng.integers(0, 2, n).astype(np.int64)

    want = {}
    for u in np.unique(users):
        m = users == u
        order = np.lexsort((seq[m], ts[m].astype(np.int64)))
        cells = (gx[m] * 2 + gy[m])[order]
        best = cur = 1
        for i in range(1, cells.size):
            cur = cur + 1 if cells[i] == cells[i - 1] else 1
            best = max(best, cur)
        want[int(u)] = best
    assert max(want.values()) >= 3  # real runs exercised

    t = pa.table({"user_id": users, "ts": ts, "event_id": seq,
                  "gx": gx, "gy": gy})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {r["user_id"]: r["max_run"]
               for r in max_dwell_run(ds, res=res).take_all()}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_od_asymmetry_matches_bruteforce(ray_session):
    # forward/reverse/net per unordered tile pair vs a dict reference;
    # self-loops excluded; partition-invariant
    ray = ray_session
    from collections import defaultdict
    from python_prtree_ray.pipelines.movement import od_asymmetry

    rng = np.random.default_rng(221)
    res = 1
    g = 1 << res
    n = 400
    users = rng.integers(0, 8, n).astype(np.int64)
    ts = rng.integers(0, 10**8, n).astype("datetime64[us]")
    seq = np.arange(n, dtype=np.int64)
    gx = rng.integers(0, g, n).astype(np.int64)
    gy = rng.integers(0, g, n).astype(np.int64)

    want = defaultdict(lambda: [0, 0])
    for u in np.unique(users):
        m = users == u
        order = np.lexsort((seq[m], ts[m].astype(np.int64)))
        cells = (gx[m] * g + gy[m])[order]
        for f, t_ in zip(cells[:-1], cells[1:]):
            if f == t_:
                continue
            a, b = (int(f), int(t_)) if f < t_ else (int(t_), int(f))
            want[(a, b)][0 if f < t_ else 1] += 1
    want = {k: (v[0], v[1], v[0] - v[1]) for k, v in want.items()}

    t = pa.table({"user_id": users, "ts": ts, "event_id": seq,
                  "gx": gx, "gy": gy})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = od_asymmetry(ds, res=res).take_all()
        got = {(r["cell_a"], r["cell_b"]): (r["n_ab"], r["n_ba"], r["net"])
               for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_emb_norm_outliers_matches_bruteforce(ray_session):
    # strict > R-7 p99 gate on coarse-grid squared norms vs numpy;
    # planted blowup vectors must all surface; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.ann import emb_norm_outliers

    rng = np.random.default_rng(222)
    n, d = 300, 8
    E = rng.normal(size=(n, d)).astype(np.float32)
    # distinct planted blowups: p99 at n=300 interpolates INSIDE this
    # group (rank 296.01), so exactly the top 3 must surface
    for j, mag in zip(range(0, n, 97), (4.0, 6.0, 8.0, 10.0)):
        E[j] = mag
    Q = np.floor(E.astype(np.float64) * 32.0).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)
    s = np.sort(n2)
    h = (n - 1) * 0.99
    lo = int(np.floor(h))
    thr = (1.0 - (h - lo)) * float(s[lo]) + (h - lo) * float(s[min(lo + 1, n - 1)])
    want = {(int(i), int(v)) for i, v in enumerate(n2) if v > thr}
    assert {i for i, _ in want} == {97, 194, 291}

    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
        }
    )
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = emb_norm_outliers(ds).take_all()
        got = {(r["vec_id"], r["norm2q"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_word_counts_matches_bruteforce(ray_session):
    # exact global vocabulary counts vs a Counter reference
    ray = ray_session
    import re
    from collections import Counter
    from python_prtree_ray.pipelines.text import word_counts

    texts = ["The cat sat", "the DOG sat; the dog ran!", "42 cats", ""]
    cnt = Counter()
    for s in texts:
        cnt.update(re.findall("[a-z]+", s.lower()))

    t = pa.table({"text": texts})
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {r["word"]: r["n"] for r in word_counts(ds).take_all()}
        assert got == dict(cnt)


def test_bloom_semi_join_exact_and_prunes(ray_session):
    # bloom-gated plan == exact semi join rows on adversarial keys
    # (negative, huge, zero); the gate itself passes every true match
    # and actually prunes most non-matches at a 1-in-16 selectivity
    ray = ray_session
    from python_prtree_ray.pipelines.join import (
        bloom_semi_join,
        hash_equi_join,
        _bloom_positions,
    )

    rng = np.random.default_rng(223)
    n = 4000
    left_keys = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, n - 3).astype(np.int64),
            np.array([0, -1, 2**62], np.int64),
        ]
    )
    right_keys = np.concatenate(
        [left_keys[:: 16], np.array([0], np.int64)]
    )  # ~1/16 of left matches
    lt = pa.table(
        {"k": left_keys, "payload": np.arange(left_keys.size, dtype=np.int64)}
    )
    rt = pa.table({"rk": right_keys})

    lds = ray.data.from_arrow(lt).repartition(5)
    rds = ray.data.from_arrow(rt).repartition(3)
    got = bloom_semi_join(
        lds, rds, on="k", right_on="rk", left_cols=("payload",)
    ).take_all()
    want = hash_equi_join(
        ray.data.from_arrow(lt).repartition(5),
        ray.data.from_arrow(rt).repartition(3),
        on="k", right_on="rk", left_cols=("payload",), how="semi",
    ).take_all()
    key = lambda r: (r["k"], r["payload"])
    assert sorted(got, key=key) == sorted(want, key=key)

    # the filter never misses a member and prunes well below 50%
    m_bits, k_hashes = 1 << 20, 4
    bits = np.zeros((1 << 20) // 8, np.uint8)
    pos = _bloom_positions(np.unique(right_keys), m_bits, k_hashes).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    lp = _bloom_positions(left_keys, m_bits, k_hashes)
    hit = np.ones(left_keys.size, bool)
    for i in range(k_hashes):
        p = lp[:, i]
        hit &= (bits[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
    member = np.isin(left_keys, right_keys)
    assert hit[member].all()
    assert hit.mean() < 0.5


def test_tile_rank_corr_matches_bruteforce(ray_session):
    # Spearman over (density, distinct users) tile signals vs a python
    # reference with the identical (metric, cell) tie order
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_rank_corr
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(224)
    res = 2
    n = 900
    pts = rng.random((n, 2))
    users = rng.integers(0, 25, n).astype(np.int64)
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)

    agg = {}
    for c, u in zip(cells, users):
        d = agg.setdefault(int(c), [0, set()])
        d[0] += 1
        d[1].add(int(u))
    tiles = sorted(agg)
    npnt = [agg[c][0] for c in tiles]
    nusr = [len(agg[c][1]) for c in tiles]
    by_p = sorted(range(len(tiles)), key=lambda i: (npnt[i], tiles[i]))
    by_u = sorted(range(len(tiles)), key=lambda i: (nusr[i], tiles[i]))
    rp, ru = {}, {}
    for rank, i in enumerate(by_p, 1):
        rp[i] = rank
    for rank, i in enumerate(by_u, 1):
        ru[i] = rank
    m = len(tiles)
    sd2 = sum((rp[i] - ru[i]) ** 2 for i in range(m))
    rho = 1.0 - np.float64(6 * sd2) / np.float64(m * (m * m - 1))

    t = pa.table({"user_id": users, "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_rank_corr(ds, res=res).take_all()
        assert len(rows) == 1
        got = (rows[0]["n_tiles"], rows[0]["sum_d2"], rows[0]["rho"])
        assert got == (m, sd2, float(rho))
        if prev is not None:
            assert got == prev
        prev = got


def test_typo_pairs_matches_bruteforce(ray_session):
    # SymSpell blocking + exact verify vs a full O(V^2) Levenshtein
    # reference: substitutions, insertions, deletions, transposition
    # (=2), and far pairs all present; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.text import typo_pairs, _lev

    texts = [
        "color colour colr kolor",          # del=1, ins=1, sub=1 chains
        "data date gate dart",              # subs at distance 1-2
        "spark sprak",                      # transposition = distance 2
        "table cable fable stable",
        "zzzzzz completely different word",
    ]
    words = set()
    import re
    for s in texts:
        words |= set(re.findall("[a-z]+", s.lower()))
    want = {}
    for a in words:
        for b in words:
            if a < b:
                d = _lev(a, b)
                if 1 <= d <= 2:
                    want[(a, b)] = d
    assert any(d == 1 for d in want.values())
    assert any(d == 2 for d in want.values())

    t = pa.table({"text": texts})
    prev = None
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = typo_pairs(ds).take_all()
        got = {(r["word_a"], r["word_b"]): r["dist"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_session_type_pairs_matches_bruteforce(ray_session):
    # session pair counts vs a set reference: gap splitting, within-
    # session type dedup, a<b ordering; partition-invariant
    ray = ray_session
    from collections import Counter
    from python_prtree_ray.pipelines.windows import session_type_pairs

    rng = np.random.default_rng(225)
    n = 700
    gap = 1_800_000_000
    users = rng.integers(0, 10, n).astype(np.int64)
    ts_i = np.sort(rng.integers(0, 50 * gap, n))  # global sort, per-user gaps vary
    seq = np.arange(n, dtype=np.int64)
    types = np.array(["view", "click", "buy", "share"])[rng.integers(0, 4, n)]

    cnt = Counter()
    for u in np.unique(users):
        m = np.flatnonzero(users == u)
        order = m[np.lexsort((seq[m], ts_i[m]))]
        sess = []
        last = None
        for i in order:
            if last is None or ts_i[i] - last > gap:
                sess.append(set())
            sess[-1].add(str(types[i]))
            last = ts_i[i]
        for s in sess:
            for a in s:
                for b in s:
                    if a < b:
                        cnt[(a, b)] += 1
    assert cnt  # pairs exist

    t = pa.table({"user_id": users, "ts": ts_i.astype("datetime64[us]"),
                  "event_id": seq, "event_type": types})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = session_type_pairs(ds).take_all()
        got = {(r["type_a"], r["type_b"]): r["n_sessions"] for r in rows}
        assert got == dict(cnt)
        if prev is not None:
            assert got == prev
        prev = got


def test_value_peaks_matches_bruteforce(ray_session):
    # sparse-table windowed max vs an O(n^2) reference: plateau peers
    # all emit, windows never cross users, duplicate timestamps count
    # as peers; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.windows import value_peaks

    rng = np.random.default_rng(226)
    n = 600
    W = 1000
    users = rng.integers(0, 8, n).astype(np.int64)
    ts_i = rng.integers(0, 20_000, n).astype(np.int64)
    ts_i[::37] = ts_i[(np.arange(n)[::37])] // 37 * 37  # force duplicates
    seq = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 40, n) / 4.0  # heavy value ties -> plateaus

    want = set()
    cents = np.floor(vals * 100.0).astype(np.int64)
    for i in range(n):
        m = (users == users[i]) & (np.abs(ts_i - ts_i[i]) <= W)
        if cents[i] == cents[m].max():
            want.add((int(users[i]), int(seq[i]), int(cents[i])))

    t = pa.table({"user_id": users, "ts": ts_i.astype("datetime64[us]"),
                  "event_id": seq, "value": vals})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = value_peaks(ds, window_us=W).take_all()
        got = {(r["user_id"], r["event_id"], r["value_cents"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_label_cohesion_matches_bruteforce(ray_session):
    # moment-identity pair-dot sums vs explicit O(n^2) enumeration;
    # singleton labels drop; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.ann import label_cohesion

    rng = np.random.default_rng(227)
    n, d = 150, 5
    E = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    labels[0] = 9  # singleton label -> dropped

    Q = np.floor(E.astype(np.float64) * float(1 << 20)).astype(object)
    want = {}
    for lab in np.unique(labels):
        m = labels == lab
        k = int(m.sum())
        if k < 2:
            continue
        G = Q[m] @ Q[m].T
        tot = int(G.sum() - np.trace(G))
        want[int(lab)] = (k, float(tot), float(tot) / float(k * (k - 1)))

    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
            "label": labels,
        }
    )
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = label_cohesion(ds).take_all()
        got = {r["label"]: (r["n_vecs"], r["pair_dot_sum"], r["mean_pair_dot"])
               for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_label_separation_matches_bruteforce(ray_session):
    # cross-pair dot sums via sum-vector identity vs explicit pairs
    ray = ray_session
    from python_prtree_ray.pipelines.ann import label_separation

    rng = np.random.default_rng(228)
    n, d = 120, 4
    E = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int32)

    Q = np.floor(E.astype(np.float64) * float(1 << 20)).astype(object)
    want = {}
    for a in np.unique(labels):
        for b in np.unique(labels):
            if a < b:
                ma, mb = labels == a, labels == b
                tot = int((Q[ma] @ Q[mb].T).sum())
                want[(int(a), int(b))] = (
                    float(tot),
                    float(tot) / float(ma.sum() * mb.sum()),
                )

    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
            "label": labels,
        }
    )
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = label_separation(ds).take_all()
        got = {(r["label_a"], r["label_b"]):
               (r["cross_dot_sum"], r["mean_cross_dot"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_rolling_wau_matches_bruteforce(ray_session):
    # exact trailing-window distinct users vs a set reference; sparse
    # activity forces run merges AND gaps; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.windows import rolling_wau, DAY_US

    rng = np.random.default_rng(229)
    n = 500
    w = 7
    users = rng.integers(0, 20, n).astype(np.int64)
    days = rng.choice(np.r_[0:10, 25:30, 60:61], n)  # clustered + isolated
    ts = (days * DAY_US + rng.integers(0, DAY_US, n)).astype("datetime64[us]")

    want = {}
    active = {(int(u), int(d)) for u, d in zip(users, days)}
    all_days = range(int(days.min()), int(days.max()) + w)
    for d in all_days:
        c = len({u for (u, ad) in active if d - (w - 1) <= ad <= d})
        if c:
            want[d] = c

    t = pa.table({"user_id": users, "ts": ts})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {r["day"]: r["wau"] for r in rolling_wau(ds, window_days=w).take_all()}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_tile_turnover_matches_bruteforce(ray_session):
    # early/late visitor Jaccard per tile vs a set reference at the
    # (min+max)//2 midpoint; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import tile_turnover
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(230)
    res = 1
    n = 400
    pts = rng.random((n, 2))
    users = rng.integers(0, 15, n).astype(np.int64)
    ts_i = rng.integers(0, 10**9, n).astype(np.int64)

    mid = (int(ts_i.min()) + int(ts_i.max())) // 2
    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    early, late = {}, {}
    for c, u, t_ in zip(cells, users, ts_i):
        (late if t_ > mid else early).setdefault(int(c), set()).add(int(u))
    want = {}
    for c in set(early) | set(late):
        e = early.get(c, set())
        l = late.get(c, set())
        union = e | l
        both = e & l
        want[c] = (len(e), len(l), len(both), len(union),
                   len(both) / len(union))

    t = pa.table({"user_id": users, "ts": ts_i.astype("datetime64[us]"),
                  "px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = tile_turnover(ds, res=res).take_all()
        got = {r["cell"]: (r["n_early_users"], r["n_late_users"],
                           r["n_both"], r["n_union"], r["jaccard"])
               for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_region_count_curve_matches_bruteforce(ray_session):
    # queen-CC counts per threshold vs a flood-fill reference with
    # crafted multi-region layouts; partition-invariant
    ray = ray_session
    from collections import deque
    from python_prtree_ray.pipelines.tiling import region_count_curve
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(231)
    res = 3
    g = 1 << res
    # three dense blobs + scattered noise
    blobs = [(0.1, 0.1), (0.8, 0.2), (0.5, 0.9)]
    pts = np.concatenate(
        [np.clip(rng.normal(c, 0.05, size=(120, 2)), 0, 0.999) for c in blobs]
        + [rng.random((60, 2))]
    )
    thresholds = (2, 6, 12)

    cells = cell_of_points(pts[:, 0], pts[:, 1], res)
    cnt = {}
    for c in cells:
        cnt[int(c)] = cnt.get(int(c), 0) + 1
    want = {}
    for t in thresholds:
        occ = {c for c, n in cnt.items() if n >= t}
        seen, regions = set(), 0
        for c in occ:
            if c in seen:
                continue
            regions += 1
            q = deque([c])
            seen.add(c)
            while q:
                cur = q.popleft()
                ix, iy = cur // g, cur % g
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        nb = (ix + dx) * g + (iy + dy)
                        if (
                            0 <= ix + dx < g and 0 <= iy + dy < g
                            and nb in occ and nb not in seen
                        ):
                            seen.add(nb)
                            q.append(nb)
        want[t] = (regions, len(occ))
    assert want[thresholds[0]][0] >= 2  # multiple regions exercised

    t_ = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t_).repartition(blocks)
        rows = region_count_curve(ds, res=res, thresholds=thresholds).take_all()
        got = {r["threshold"]: (r["n_regions"], r["n_tiles"]) for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_hilbert_locality_matches_bruteforce(ray_session):
    # exact adjacent-pair hilbert gaps vs a reference using the same
    # hilbert_d kernel; sparse occupancy leaves real holes
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import hilbert_locality, hilbert_d
    from python_prtree_ray.functions.cells import cell_of_points

    rng = np.random.default_rng(232)
    res = 3
    g = 1 << res
    n = 90  # ~half the 64 tiles occupied
    pts = rng.random((n, 2))
    cells = np.unique(cell_of_points(pts[:, 0], pts[:, 1], res))
    occ = set(int(c) for c in cells)
    h = {int(c): int(hilbert_d(np.array([c // g]), np.array([c % g]), res)[0])
         for c in cells}
    gaps = []
    for c in occ:
        ix, iy = c // g, c % g
        for nb in ((ix + 1) * g + iy, ix * g + iy + 1):
            if (ix + 1 < g and nb == (ix + 1) * g + iy and nb in occ) or (
                iy + 1 < g and nb == ix * g + iy + 1 and nb in occ
            ):
                gaps.append(abs(h[c] - h[nb]))
    want = (len(gaps), sum(gaps), sum(gaps) / len(gaps))

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = hilbert_locality(ds, res=res).take_all()
        assert len(rows) == 1
        got = (rows[0]["n_edges"], rows[0]["gap_sum"], rows[0]["mean_gap"])
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_emb_top_eigen_matches_numpy(ray_session):
    # power iteration on the exact covariance vs numpy.linalg.eigh:
    # eigenvalue within tolerance, component parallel up to sign;
    # partition-invariant (bit-identical rows)
    ray = ray_session
    from python_prtree_ray.pipelines.ann import emb_top_eigen

    rng = np.random.default_rng(233)
    n, d = 300, 6
    base = rng.normal(size=(n, 1)) * np.array([[3, 2, 1, 0.5, 0.2, 0.1]])
    E = (base + 0.3 * rng.normal(size=(n, d))).astype(np.float32)

    t = pa.table({"embedding": pa.array(list(E), pa.list_(pa.float32()))})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = emb_top_eigen(ds).take_all()
        lam = rows[0]["eigenvalue"]
        v = np.array([r["component"] for r in sorted(rows, key=lambda r: r["dim"])])
        got = (lam, tuple(v))
        if prev is not None:
            assert got == prev  # bit-stable across parallelism
        prev = got

    # reference covariance on the same scaled grid
    Q = np.floor(E.astype(np.float64) * float(1 << 20))
    m = Q.shape[0]
    C = (Q.T @ Q) * m - np.outer(Q.sum(0), Q.sum(0))
    C = C / float(m * m)
    w, V = np.linalg.eigh(C)
    lam_ref = w[-1]
    v_ref = V[:, -1]
    assert abs(lam - lam_ref) / lam_ref < 1e-9
    cos = abs(float(v @ v_ref) / np.sqrt(float(v @ v) * float(v_ref @ v_ref)))
    assert cos > 1.0 - 1e-9


def test_points_diameter_matches_bruteforce(ray_session):
    # hull-pruned global farthest pair vs the O(n^2) reference;
    # partition-invariant (per-batch hull prune must not lose endpoints)
    ray = ray_session
    from python_prtree_ray.pipelines.trajectory import points_diameter
    from python_prtree_ray.functions.derive import tile_index

    rng = np.random.default_rng(234)
    res = 8
    n = 400
    pts = rng.random((n, 2))
    gx = tile_index(pts[:, 0], res)
    gy = tile_index(pts[:, 1], res)
    d2 = (gx[:, None] - gx[None, :]) ** 2 + (gy[:, None] - gy[None, :]) ** 2
    want = (n, int(d2.max()))

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1],
                  "query_id": np.arange(n, dtype=np.int64)})
    prev = None
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = points_diameter(ds, res=res).take_all()
        got = (rows[0]["n_points"], rows[0]["diam2"])
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_adaptive_quadtree_matches_bruteforce(ray_session):
    # capacity-split leaves vs a recursive reference over a SKEWED
    # point set (forces mixed-level leaves); leaves partition the
    # points exactly; partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import adaptive_quadtree
    from python_prtree_ray.functions.derive import tile_index

    rng = np.random.default_rng(235)
    max_res, cap = 5, 20
    pts = np.concatenate(
        [
            np.clip(rng.normal((0.1, 0.1), 0.02, size=(300, 2)), 0, 0.999),
            rng.random((100, 2)),
        ]
    )

    def counts_at(l):
        gx = tile_index(pts[:, 0], l)
        gy = tile_index(pts[:, 1], l)
        d = {}
        for x, y in zip(gx, gy):
            d[(int(x), int(y))] = d.get((int(x), int(y)), 0) + 1
        return d

    lv = [counts_at(l) for l in range(max_res + 1)]
    want = {}

    def rec(l, x, y):
        v = lv[l].get((x, y))
        if v is None:
            return
        if v <= cap or l == max_res:
            want[(l, x * (1 << l) + y)] = v
        else:
            for dx in (0, 1):
                for dy in (0, 1):
                    rec(l + 1, 2 * x + dx, 2 * y + dy)

    rec(0, 0, 0)
    assert len({l for l, _ in want}) >= 2  # mixed-level leaves
    assert sum(want.values()) == pts.shape[0]  # exact partition

    t = pa.table({"px": pts[:, 0], "py": pts[:, 1]})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = adaptive_quadtree(ds, max_res=max_res, cap=cap).take_all()
        got = {(r["level"], r["cell"]): r["n"] for r in rows}
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_gram_novelty_matches_bruteforce(ray_session):
    # first-corpus-occurrence bigram novelty vs a python reference;
    # partition-invariant
    ray = ray_session
    from python_prtree_ray.pipelines.curation import gram_novelty

    rng = np.random.default_rng(29)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts, n_docs, n = [], 60, 2
    for i in range(n_docs):
        toks = [vocab[v] for v in rng.integers(0, len(vocab), rng.integers(2, 14))]
        texts.append(" ".join(toks))
    texts[9] = texts[2]  # a full late duplicate: zero novelty
    texts[0] = "alpha beta gamma delta"  # early doc wins its grams
    ids = np.arange(n_docs, dtype=np.int64)
    t = pa.table({"doc_id": ids, "text": texts})

    first_doc = {}
    doc_grams = {}
    for i, tx in enumerate(texts):
        toks = tx.split()
        gs = {tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        doc_grams[i] = gs
        for g_ in gs:
            first_doc[g_] = min(first_doc.get(g_, i), i)
    want = {
        int(ids[i]): (len(gs), sum(1 for g_ in gs if first_doc[g_] == i))
        for i, gs in doc_grams.items()
        if gs
    }
    assert want[9][1] == 0 or texts[9] != texts[2]
    assert any(v[1] > 0 for v in want.values())

    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            r["doc_id"]: (r["n_distinct"], r["n_new"])
            for r in gram_novelty(ds, n=n).take_all()
        }
        assert got == want
        if prev is not None:
            assert got == prev
        prev = got


def test_kde_grid_exact_vs_bruteforce(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines import interpolate as ip

    keys = np.arange(1, 3001, dtype=np.int64)
    ds = ray.data.from_arrow(_point_table(keys)).repartition(11)
    out = {r["node"]: r for r in ip.kde_grid(ds).take_all()}
    p = derive.derive_points(keys)
    g = 1 << ip.GRES
    r2 = ip.KDE_RADIUS * ip.KDE_RADIUS
    n_nodes = 0
    for i in range(g):
        for j in range(g):
            nx, ny = (i + 0.5) / g, (j + 0.5) / g
            dx = p["px"] - nx
            dy = p["py"] - ny
            d2 = dx * dx + dy * dy
            m = d2 <= r2
            if not m.any():
                assert i * g + j not in out
                continue
            n_nodes += 1
            kq = np.floor((1.0 - d2[m] / r2) * ip.KDE_SCALE).astype(np.int64)
            row = out[i * g + j]
            assert row["n"] == int(m.sum())
            assert row["density_q"] == int(kq.sum())
            assert row["kde"] == float(int(kq.sum())) / ip.KDE_SCALE
    assert n_nodes == len(out)


def test_empty_space_f_exact_and_parallelism_invariant(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines import interpolate as ip

    keys = np.arange(1, 1501, dtype=np.int64)
    p = derive.derive_points(keys)
    g = 1 << ip.GRES
    prev = None
    for parts in (1, 7):
        ds = ray.data.from_arrow(_point_table(keys)).repartition(parts)
        rows = sorted(
            ip.empty_space_f(ds).take_all(), key=lambda r: r["r_idx"]
        )
        got = [(r["r_idx"], r["n_nodes"], r["f_share"]) for r in rows]
        if prev is not None:
            assert got == prev
        prev = got
    # brute force: per-node nearest quantized distance
    assert prev is not None
    for ri, radius in enumerate(ip.F_RADII):
        thr = int(np.floor(radius * radius * ip.F_SCALE))
        n_in = 0
        for i in range(g):
            for j in range(g):
                nx, ny = (i + 0.5) / g, (j + 0.5) / g
                d2 = (p["px"] - nx) ** 2 + (p["py"] - ny) ** 2
                if int(np.floor(d2.min() * ip.F_SCALE)) <= thr:
                    n_in += 1
        assert prev[ri] == (ri, n_in, n_in / float(g * g))


def test_heavy_hitters_exact_with_forced_pruning(ray_session):
    # MG sketch must engage (capacity << vocabulary) yet the final
    # output is EXACT: every token with count*k_inv > total, no more,
    # no less — vs a collections.Counter oracle, at two parallelisms
    ray = ray_session
    import re
    from collections import Counter

    from python_prtree_ray.pipelines.text import heavy_hitters

    rng = np.random.default_rng(91)
    # zipf-ish corpus: a few hot words + a long uniform tail
    hot = ["alpha", "beta", "gamma"]
    tail = [f"w{i:04d}" for i in range(400)]
    texts = []
    for _ in range(600):
        k = int(rng.integers(3, 12))
        ws = [
            hot[int(rng.integers(3))] if rng.random() < 0.4
            else tail[int(rng.integers(len(tail)))]
            for _ in range(k)
        ]
        texts.append(" ".join(ws))
    # tokenizer parity: [a-z]+ runs only (digits split words)
    cnt = Counter(
        w for txt in texts for w in re.findall("[a-z]+", txt.lower())
    )
    total = sum(cnt.values())
    k_inv = 50
    want_set = {(w, n) for w, n in cnt.items() if n * k_inv > total}
    assert want_set, "test corpus must produce at least one heavy hitter"
    ranked = sorted(want_set, key=lambda kv: (-kv[1], kv[0]))
    want = [(w, n, r + 1) for r, (w, n) in enumerate(ranked)]
    t = pa.table({"text": texts})
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        # capacity=64 << ~403 distinct words -> per-batch MG pruning runs
        out = heavy_hitters(ds, k_inv=k_inv, capacity=64).take_all()
        got = sorted(
            ((r["word"], r["n"], r["rank"]) for r in out), key=lambda x: x[2]
        )
        assert got == want


def test_flow_accumulation_conservation_and_invariance(ray_session):
    # mass conservation: every basin's total equals the sum of acc at
    # its sink-adjacent cells; acc >= own count everywhere; results
    # identical at two parallelisms
    ray = ray_session
    from python_prtree_ray.pipelines.tiling import (
        flow_accumulation,
        watershed_sizes,
    )

    keys = np.arange(1, 4001, dtype=np.int64)
    prev = None
    for parts in (1, 9):
        ds = ray.data.from_arrow(_point_table(keys)).repartition(parts)
        rows = sorted(
            flow_accumulation(ds, res=4).take_all(), key=lambda r: r["cell"]
        )
        got = [
            (r["cell"], r["x"], r["acc_n"], r["sink_cell"]) for r in rows
        ]
        if prev is not None:
            assert got == prev
        prev = got
    assert prev
    total_mass = sum(x for _, x, _, _ in prev)
    assert all(acc >= x for _, x, acc, _ in prev)
    # per-basin mass from the rollup equals summed x of members
    ds = ray.data.from_arrow(_point_table(keys))
    basins = {
        r["sink_cell"]: (r["n_cells"], r["total_n"])
        for r in watershed_sizes(ds, res=4).take_all()
    }
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0])
    for cell, x, acc, sink in prev:
        want[sink][0] += 1
        want[sink][1] += x
    assert basins == {k: tuple(v) for k, v in want.items()}
    assert sum(v[1] for v in basins.values()) == total_mass
    # occupied sinks accumulate their whole basin
    cells = {c: (x, acc) for c, x, acc, _ in prev}
    for sink, (_, mass) in basins.items():
        if sink in cells:
            # an occupied sink's acc is its basin mass (only if the
            # sink drains nothing else - which holds when sink==cell)
            row = [r for r in prev if r[0] == sink][0]
            if row[3] == sink:  # genuine occupied sink
                assert row[2] == mass


def test_emb_top2_eigen_matches_numpy(ray_session):
    # deflated power iteration: both eigenpairs vs numpy.linalg.eigh,
    # orthogonal components, bit-stable across parallelism
    ray = ray_session
    from python_prtree_ray.pipelines.ann import emb_top2_eigen

    rng = np.random.default_rng(57)
    n, d = 300, 6
    base = rng.normal(size=(n, 1)) * np.array([[3, 2, 1, 0.5, 0.2, 0.1]])
    second = rng.normal(size=(n, 1)) * np.array([[0.1, 1.5, -2, 0.3, 0.8, 0]])
    E = (base + second + 0.3 * rng.normal(size=(n, d))).astype(np.float32)

    t = pa.table({"embedding": pa.array(list(E), pa.list_(pa.float32()))})
    prev = None
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = sorted(emb_top2_eigen(ds).take_all(), key=lambda r: r["dim"])
        got = tuple(
            (r["eig1"], r["comp1"], r["eig2"], r["comp2"]) for r in rows
        )
        if prev is not None:
            assert got == prev
        prev = got
    lam1 = prev[0][0]
    lam2 = prev[0][2]
    v1 = np.array([r[1] for r in prev])
    v2 = np.array([r[3] for r in prev])

    Q = np.floor(E.astype(np.float64) * float(1 << 20))
    m = Q.shape[0]
    C = ((Q.T @ Q) * m - np.outer(Q.sum(0), Q.sum(0))) / float(m * m)
    w, V = np.linalg.eigh(C)
    assert abs(lam1 - w[-1]) / w[-1] < 1e-9
    assert abs(lam2 - w[-2]) / w[-2] < 1e-6
    for v, ref in ((v1, V[:, -1]), (v2, V[:, -2])):
        cos = abs(float(v @ ref) / np.sqrt(float(v @ v) * float(ref @ ref)))
        assert cos > 1.0 - 1e-6
    assert abs(float(v1 @ v2)) < 1e-9


def test_tree_stats_matches_direct_build(ray_session):
    # single-partition tree_stats must equal the per-level stats of a
    # directly built PRTree; multi-partition sums the partition trees
    ray = ray_session
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_ts", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()["tree_stats"]
    rows = sorted(
        (r["level"], r["n_nodes"], r["area_q"], r["perim_q"])
        for r in q("/root/testdata/sf0.001").take_all()
    )
    # invariants: levels contiguous from 0; node counts shrink by at
    # least the fanout ratio per level within each partition tree
    assert rows[0][0] == 0
    assert [r[0] for r in rows] == list(range(len(rows)))
    for (l1, n1, a1, p1), (l2, n2, a2, p2) in zip(rows, rows[1:]):
        assert n2 < n1
    # direct single-tree reference over the same derived boxes
    import pyarrow.parquet as pq
    from python_prtree_ray.functions.prtree import PRTree
    from python_prtree_ray.functions import derive as dv

    t = pq.read_table(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey"]
    )
    k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
    cols = dv.derive_boxes(k)
    b = np.column_stack(
        [cols["xmin"], cols["ymin"], cols["xmax"], cols["ymax"]]
    )
    tree = PRTree(np.asarray(k, np.int64), b)
    ASCALE = np.int64(1 << 40)
    want = []
    for li, lv in enumerate(tree.levels):
        w = lv[:, 2] - lv[:, 0]
        h = lv[:, 3] - lv[:, 1]
        want.append(
            (
                li,
                lv.shape[0],
                int(np.floor(w * h * ASCALE).astype(np.int64).sum()),
                int(np.floor((w + h) * ASCALE).astype(np.int64).sum()),
            )
        )
    # the driver pipeline may split into several partition trees; at
    # sf0.001 the orders table is one parquet row group -> one tree
    assert rows == want


def test_closest_pair_matches_bruteforce(ray_session):
    # global minimum-separation pair vs the O(n^2) brute force, with
    # the (d2, id_a, id_b) tie-break, at two parallelisms; coords come
    # from a custom `coords` fn so the test controls the geometry
    ray = ray_session
    from python_prtree_ray.pipelines.knn import closest_pair

    rng = np.random.default_rng(47)
    n = 400
    ids = rng.permutation(np.arange(10, 10 + n)).astype(np.int64)
    px = rng.random(n)
    py = rng.random(n)
    # a planted near-duplicate pair far tighter than random spacing
    px[37], py[37] = px[251] + 1e-7, py[251] + 1e-7
    by_id = {int(i): (px[k], py[k]) for k, i in enumerate(ids)}

    def coords(keys):
        xs = np.array([by_id[int(k)][0] for k in keys], np.float64)
        ys = np.array([by_id[int(k)][1] for k in keys], np.float64)
        return {"px": xs, "py": ys}

    # brute force with the same single-expression d2 + tie-break
    best = None
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = px[i] - px[j], py[i] - py[j]
            d2 = dx * dx + dy * dy
            a, b = sorted((int(ids[i]), int(ids[j])))
            key = (d2, a, b)
            if best is None or key < best:
                best = key

    t = pa.table({"query_id": ids, "px": px, "py": py})
    for blocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = closest_pair(ds, coords=coords).take_all()
        assert len(out) == 1
        got = (out[0]["d2"], out[0]["id_a"], out[0]["id_b"])
        assert got == best


def test_boxes_union_area_matches_bruteforce(ray_session):
    """Exact Klee measure vs per-box inclusion on the quantized grid,
    partition- and slab-count-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray

    from python_prtree_ray.pipelines.measure import boxes_union_area

    rng = np.random.default_rng(11)
    n = 400
    x0 = rng.uniform(0, 0.9, n)
    y0 = rng.uniform(0, 0.9, n)
    x1 = x0 + rng.uniform(0.001, 0.08, n)
    y1 = y0 + rng.uniform(0.001, 0.08, n)
    tbl = pa.table(
        {
            "xmin": x0,
            "ymin": y0,
            "xmax": np.minimum(x1, 0.999),
            "ymax": np.minimum(y1, 0.999),
        }
    )

    # brute force on a coarse grid: quantize to the SAME grid the
    # pipeline uses, then paint a boolean raster (quant_bits small
    # enough for a dense array)
    qb = 10
    q = 1 << qb
    gx0 = np.floor(x0 * q).astype(np.int64)
    gx1 = np.floor(np.minimum(x1, 0.999) * q).astype(np.int64)
    gy0 = np.floor(y0 * q).astype(np.int64)
    gy1 = np.floor(np.minimum(y1, 0.999) * q).astype(np.int64)
    grid = np.zeros((q, q), bool)
    for a, b, c, d in zip(gx0, gx1, gy0, gy1):
        grid[a:b, c:d] = True
    want = int(grid.sum())

    got = {}
    for slabs in (1, 7, 64):
        for nparts in (1, 5):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            out = boxes_union_area(
                ds, n_slabs=slabs, quant_bits=qb, method="slabs"
            ).take_all()
            assert len(out) == 1
            r = out[0]
            assert r["n_boxes"] == n
            got[(slabs, nparts)] = r["union_area_q"]
            assert r["union_area_q"] == want, (slabs, nparts)
            assert r["union_area"] == want / float(q * q)
    # two-level tiles path (the scale default): same exact area at any
    # grid granularity and partitioning
    for gb in (2, 5, 8):
        for nparts in (1, 5):
            ds = ray.data.from_arrow(tbl).repartition(nparts)
            r = boxes_union_area(
                ds, quant_bits=qb, method="tiles", grid_bits=gb
            ).take_all()[0]
            assert r["n_boxes"] == n
            assert r["union_area_q"] == want, (gb, nparts)
            got[("tiles", gb, nparts)] = r["union_area_q"]
    assert len(set(got.values())) == 1


def test_iterative_tile_ops_invariants(ray_session):
    """Structural invariants of the driver-side iterative ops at
    sf0.001: PageRank mass bounds, k-core degree floor, BFS ring
    property of the distance transform."""
    import numpy as np

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    qs = E.queries()

    pr = qs["tile_pagerank"](sf).take_all()
    S = 10**12
    ranks = np.array([r["rank_s"] for r in pr], np.int64)
    n = ranks.size
    assert n > 0
    teleport = (15 * S) // (100 * n)
    assert ranks.min() >= teleport  # every node keeps its teleport mass
    assert ranks.sum() <= S  # floor divisions only ever lose mass
    for r in pr:
        assert r["rank"] == r["rank_s"] / float(S)

    dist_rows = qs["tile_distance"](sf).take_all()
    cells = np.array([r["cell"] for r in dist_rows], np.int64)
    dist = np.array([r["dist"] for r in dist_rows], np.int64)
    assert (dist >= -1).all() and dist.max() <= 10
    assert (dist == 0).sum() >= 1  # argmax sources always exist
    g = 1 << E.TILE_RES
    order = np.argsort(cells)
    cs, ds = cells[order], dist[order]
    for c, d in zip(cs, ds):
        if d <= 0:
            continue
        # BFS ring property: a cell at distance d has an occupied
        # 8-neighbor at distance d-1
        ix, iy = c // g, c % g
        best = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nx, ny = ix + dx, iy + dy
                if not (0 <= nx < g and 0 <= ny < g):
                    continue
                j = np.searchsorted(cs, nx * g + ny)
                if j < cs.size and cs[j] == nx * g + ny and ds[j] >= 0:
                    best = min(best, ds[j]) if best is not None else ds[j]
        assert best == d - 1

    core = qs["tile_kcore"](sf).take_all()
    # k=8 on the sparse sf0.001 grid peels everything: empty result
    # with intact schema is the correct fixed point (oracle-checked)
    assert isinstance(core, list)
    for r in core:
        assert r["degree"] >= 0
