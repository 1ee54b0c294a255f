"""Lifecycle (insert/erase/rebuild), persistence/resume, interleaved docs,
dedup/ANN/multimodal — table-level parity with the reference's
integration/legacy suites (SURVEY §5)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from python_prtree_ray.api import RayPRTree
from python_prtree_ray.pipelines import spatial_join as sj

from .conftest import random_boxes
from .test_pipelines_ray import _boxes_ds, _pairs_set


def _query_set(tree: RayPRTree, ray, qs, qids):
    out = tree.batch_query(_boxes_ds(ray, qs, qids, "query_id")).take_all()
    return _pairs_set(out)


def test_bulk_vs_incremental_equivalence(ray_session):
    # reference legacy test: bulk build == build-half + insert-half
    # (tests/legacy/test_PRTree.py:71-113)
    ray = ray_session
    rng = np.random.default_rng(21)
    boxes = random_boxes(rng, 1000, edge=0.05)
    ids = np.arange(1000, dtype=np.int64)
    qs = random_boxes(rng, 100, edge=0.1)
    qids = np.arange(100, dtype=np.int64)

    bulk = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=False)
    half = RayPRTree(_boxes_ds(ray, boxes[:500], ids[:500]), res=4, strict=False)
    half.insert_batch(_boxes_ds(ray, boxes[500:], ids[500:]))
    assert _query_set(bulk, ray, qs, qids) == _query_set(half, ray, qs, qids)


def test_erase_then_query_and_rebuild_determinism(ray_session):
    ray = ray_session
    rng = np.random.default_rng(22)
    boxes = random_boxes(rng, 600, edge=0.05)
    ids = np.arange(600, dtype=np.int64)
    qs = random_boxes(rng, 60, edge=0.15)
    qids = np.arange(60, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=False)
    dead = ids[::3]
    tree.erase(dead)
    before = _query_set(tree, ray, qs, qids)
    assert all(b not in dead for (_, b) in before)
    tree.rebuild()  # compaction must not change answers
    assert _query_set(tree, ray, qs, qids) == before


def test_strict_duplicate_insert_and_missing_erase(ray_session):
    # parity: duplicate insert rejected (prtree.h:302-306); erasing a
    # missing id raises (prtree.h:794-799)
    ray = ray_session
    rng = np.random.default_rng(23)
    boxes = random_boxes(rng, 50, edge=0.05)
    ids = np.arange(50, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids, blocks=1), res=3, strict=True)
    with pytest.raises(ValueError, match="already exists"):
        tree.insert_batch(_boxes_ds(ray, boxes[:1], ids[:1], blocks=1))
    with pytest.raises(ValueError, match="not found"):
        tree.erase([999])
    tree.erase([0])
    assert tree.size() == 49
    # resurrecting a tombstoned id is a fresh insert
    tree.insert_batch(_boxes_ds(ray, boxes[:1], ids[:1], blocks=1))
    assert tree.size() == 50


@pytest.mark.parametrize("strict", [True, False])
def test_reinsert_after_erase_uses_new_box(ray_session, strict):
    # ADVICE r1 (high): erase(id) then insert(id, new_box) must neither
    # resurrect the old row (stale coordinates) nor let a lingering
    # tombstone hide the new row — generational tombstones fix both modes
    ray = ray_session
    rng = np.random.default_rng(26)
    boxes = random_boxes(rng, 100, edge=0.02)
    ids = np.arange(100, dtype=np.int64)
    boxes[7] = [0.10, 0.10, 0.12, 0.12]  # old position of id 7
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=strict)
    tree.erase([7])
    new_box = np.array([[0.80, 0.80, 0.82, 0.82]])
    tree.insert_batch(_boxes_ds(ray, new_box, ids[7:8], blocks=1))
    q = np.array([[0.05, 0.05, 0.20, 0.20], [0.75, 0.75, 0.90, 0.90]])
    hits = _query_set(tree, ray, q, np.array([0, 1], dtype=np.int64))
    assert (0, 7) not in hits  # old row stays dead
    assert (1, 7) in hits  # new row is visible
    if strict:
        assert tree.size() == 100
    # compaction preserves the same answer
    tree.rebuild()
    assert _query_set(tree, ray, q, np.array([0, 1], dtype=np.int64)) == hits


def test_rebuild_is_storage_backed(ray_session, tmp_path):
    # rebuild() must stream the compacted base to partitioned parquet and
    # reload lazily — NOT pin the table in the object store (VERDICT-r2
    # #7); successive rebuilds keep exactly one generation on disk
    ray = ray_session
    rng = np.random.default_rng(31)
    boxes = random_boxes(rng, 200, edge=0.03)
    spill = tmp_path / "spill"
    tree = RayPRTree(
        _boxes_ds(ray, boxes, np.arange(200, dtype=np.int64)),
        res=4, strict=True, spill_dir=str(spill),
    )
    q = random_boxes(rng, 30, edge=0.1)
    qds = _boxes_ds(ray, q, np.arange(30, dtype=np.int64), "query_id")
    want = {(r["query_id"], r["idx"]) for r in tree.batch_query(qds).take_all()}
    tree.rebuild()
    assert list(spill.glob("gen-000001/part-*.parquet"))  # file-backed base
    got = {(r["query_id"], r["idx"]) for r in tree.batch_query(qds).take_all()}
    assert got == want
    tree.rebuild()
    gens = sorted(p.name for p in spill.iterdir() if p.is_dir())
    assert gens == ["gen-000002"]  # previous generation dropped
    got2 = {(r["query_id"], r["idx"]) for r in tree.batch_query(qds).take_all()}
    assert got2 == want


def test_single_record_insert_erase_and_obj(ray_session):
    # reference parity: insert(bb, idx=None) auto-assigns n+1 and returns
    # it (core.py:454-509); erase(idx) removes; set_obj/get_obj round-trip
    # and return_obj rides the query output
    ray = ray_session
    rng = np.random.default_rng(27)
    boxes = random_boxes(rng, 30, edge=0.02)
    ids = np.arange(30, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids, blocks=1), res=3, strict=True)
    new_idx = tree.insert([0.4, 0.4, 0.45, 0.45], obj="payload-31")
    assert new_idx == 31  # auto idx = n + 1
    assert tree.size() == 31
    assert tree.get_obj(31) == "payload-31"
    with pytest.raises(ValueError, match="already exists"):
        tree.insert([0.1, 0.1, 0.2, 0.2], idx=31)
    with pytest.raises(ValueError, match="NaN"):
        tree.insert([0.1, float("nan"), 0.2, 0.2], idx=99)
    # reference parity (core.py:455-456): idx and obj both None raises
    with pytest.raises(ValueError, match="Specify index or obj"):
        tree.insert([0.1, 0.1, 0.2, 0.2])
    q = np.array([[0.39, 0.39, 0.46, 0.46]])
    out = tree.batch_query(
        _boxes_ds(ray, q, np.array([0], dtype=np.int64), "query_id", blocks=1),
        return_obj=True,
    ).take_all()
    objs = {r["idx"]: r["obj"] for r in out}
    assert objs.get(31) == "payload-31"
    tree.erase(31)
    assert tree.get_obj(31) is None
    assert tree.size() == 30


def test_precision_setters_round_trip_and_plumbing(ray_session):
    # reference setter surface (prtree.h:960-1015) plumbed into
    # validation and the adaptive-epsilon query expansion
    ray = ray_session
    rng = np.random.default_rng(28)
    boxes = random_boxes(rng, 20, edge=0.02)
    ids = np.arange(20, dtype=np.int64)
    tree = RayPRTree(
        _boxes_ds(ray, boxes, ids, blocks=1), res=3, strict=True, validate=True
    )
    tree.set_relative_epsilon(1e-5)
    tree.set_absolute_epsilon(1e-7)
    assert tree.get_relative_epsilon() == 1e-5
    assert tree.get_absolute_epsilon() == 1e-7
    tree.set_adaptive_epsilon(False)
    assert tree.get_adaptive_epsilon() is False
    tree.set_adaptive_epsilon(True)
    with pytest.raises(ValueError):
        tree.set_relative_epsilon(-1.0)
    # subnormal toggle gates the validated insert path
    sub = np.array([[5e-324, 0.1, 0.2, 0.2]])
    with pytest.raises(Exception, match="[Ss]ubnormal"):
        tree.insert(sub[0], idx=100)
    tree.set_subnormal_detection(False)
    tree.insert(sub[0], idx=100)  # now accepted
    assert tree.size() == 21
    # expand_epsilon pulls in a box the exact query just misses
    probe_gap = 10.0 * np.finfo(np.float64).eps  # < adaptive epsilon floor
    boxes2 = np.array([[0.5, 0.5, 0.6, 0.6]])
    t2 = RayPRTree(
        _boxes_ds(ray, boxes2, np.array([0], dtype=np.int64), blocks=1),
        res=3,
        strict=False,
    )
    q = np.array([[0.6 + probe_gap, 0.5, 0.7, 0.6]])  # just outside xmax
    qd = _boxes_ds(ray, q, np.array([0], dtype=np.int64), "query_id", blocks=1)
    assert _pairs_set(t2.batch_query(qd).take_all()) == set()
    assert _pairs_set(
        t2.batch_query(qd, expand_epsilon=True).take_all()
    ) == {(0, 0)}


def test_save_load_roundtrip_and_empty_save(ray_session, tmp_path):
    ray = ray_session
    rng = np.random.default_rng(24)
    boxes = random_boxes(rng, 400, edge=0.05)
    ids = np.arange(400, dtype=np.int64)
    qs = random_boxes(rng, 40, edge=0.2)
    qids = np.arange(40, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=False)
    path = str(tmp_path / "tree")
    tree.save(path)
    loaded = RayPRTree.load(path, strict=False)
    assert loaded.res == 4
    assert _query_set(loaded, ray, qs, qids) == _query_set(tree, ray, qs, qids)
    # empty save raises (reference core.py:173-178)
    empty = RayPRTree(res=4, strict=False)
    with pytest.raises(ValueError, match="empty"):
        empty.save(str(tmp_path / "empty"))


def test_partitioned_write_resume_skips_done(ray_session, tmp_path):
    from python_prtree_ray.state import manifest as mf

    ray = ray_session
    rng = np.random.default_rng(25)
    boxes = random_boxes(rng, 500, edge=0.03)
    ids = np.arange(500, dtype=np.int64)
    ds = _boxes_ds(ray, boxes, ids)
    path = str(tmp_path / "ckpt")
    man1 = mf.write_partitioned(
        ds, path, lambda t: mf._partition_of_boxes(t, 1), coarse_res=1
    )
    assert len(man1["partitions"]) > 1
    total1 = sum(p["rows"] for p in man1["partitions"].values())
    assert total1 == 500
    # simulate partial failure: drop one partition (file + manifest entry)
    victim = sorted(man1["partitions"])[0]
    os.remove(os.path.join(path, man1["partitions"][victim]["file"]))
    man = json.load(open(os.path.join(path, "manifest.json")))
    del man["partitions"][victim]
    json.dump(man, open(os.path.join(path, "manifest.json"), "w"))
    # resume: only the missing partition is rewritten
    man2 = mf.write_partitioned(
        ds, path, lambda t: mf._partition_of_boxes(t, 1), coarse_res=1
    )
    assert set(man2["partitions"]) == set(man1["partitions"])
    rows2 = mf.read_partitioned(path).count()
    assert rows2 == 500


def test_partitioned_write_resume_false_starts_fresh(ray_session, tmp_path):
    # resume=False must clear prior partition entries and delete their
    # files — a stale partition whose key never reappears must not
    # survive into the new result set
    from python_prtree_ray.state import manifest as mf

    ray = ray_session
    rng = np.random.default_rng(26)
    boxes = random_boxes(rng, 300, edge=0.03)
    ids = np.arange(300, dtype=np.int64)
    path = str(tmp_path / "fresh")
    mf.write_partitioned(
        _boxes_ds(ray, boxes, ids), path,
        lambda t: mf._partition_of_boxes(t, 1), coarse_res=1,
    )
    # second run over a DISJOINT, smaller row set confined to one corner:
    # with resume=True the old partitions would be skipped (stale rows
    # kept); with resume=False only the new rows survive
    boxes2 = random_boxes(rng, 40, edge=0.01) * 0.25
    ids2 = np.arange(10_000, 10_040, dtype=np.int64)
    man2 = mf.write_partitioned(
        _boxes_ds(ray, boxes2, ids2), path,
        lambda t: mf._partition_of_boxes(t, 1), coarse_res=1, resume=False,
    )
    assert sum(p["rows"] for p in man2["partitions"].values()) == 40
    got_ids = {r["idx"] for r in mf.read_partitioned(path).take_all()}
    assert got_ids == set(ids2.tolist())
    # no orphan files from the first run
    on_disk = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert on_disk == {v["file"] for v in man2["partitions"].values()}


def test_read_join_all_empty_partitions(ray_session, tmp_path):
    # a checkpoint whose every partition produced no output (empty query
    # side) must read back as an EMPTY Dataset, not raise
    ray = ray_session
    from python_prtree_ray.pipelines.checkpoint import read_join, resumable_join

    rng = np.random.default_rng(50)
    boxes = random_boxes(rng, 100, edge=0.02)
    bds = _boxes_ds(ray, boxes, np.arange(100, dtype=np.int64))
    # query boxes entirely outside the data extent: zero pairs
    far = random_boxes(rng, 20, edge=0.01) + 50.0
    qds = _boxes_ds(ray, far, np.arange(20, dtype=np.int64), "query_id")
    path = str(tmp_path / "emptyjoin")
    man = resumable_join(bds, qds, path, res=4, n_parts=4)
    assert all(v["status"] == "done" for v in man["partitions"].values())
    assert read_join(path).count() == 0


def test_resumable_join_skips_done_partitions(ray_session, tmp_path):
    # north-rule: resumable from checkpoint at partition granularity —
    # a resume must skip finished partitions BEFORE the join compute and
    # reproduce the interrupted run's missing output bit-identically
    ray = ray_session
    from python_prtree_ray.pipelines.checkpoint import read_join, resumable_join

    rng = np.random.default_rng(49)
    boxes = random_boxes(rng, 800, edge=0.04)
    qs = random_boxes(rng, 200, edge=0.10)
    bids = np.arange(800, dtype=np.int64)
    qids = np.arange(200, dtype=np.int64)
    bds = _boxes_ds(ray, boxes, bids)
    qds = _boxes_ds(ray, qs, qids, "query_id")
    path = str(tmp_path / "join")
    man1 = resumable_join(bds, qds, path, res=4, n_parts=8)
    assert sum(1 for v in man1["partitions"].values() if v["status"] == "done") == 8
    full = {(r["query_id"], r["idx"]) for r in read_join(path).take_all()}
    want = _pairs_set(sj.spatial_join(bds, qds, res=4).take_all())
    assert full == want
    # simulate a crash that lost one partition
    victim = next(k for k, v in man1["partitions"].items() if v["file"])
    os.remove(os.path.join(path, man1["partitions"][victim]["file"]))
    man = json.load(open(os.path.join(path, "manifest.json")))
    del man["partitions"][victim]
    json.dump(man, open(os.path.join(path, "manifest.json"), "w"))
    # resume rewrites only the victim; untouched files keep their mtime
    before = {
        v["file"]: os.path.getmtime(os.path.join(path, v["file"]))
        for k, v in man["partitions"].items()
        if v.get("file")
    }
    man2 = resumable_join(bds, qds, path, res=4, n_parts=8)
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(path, f)) == mt
    assert set(man2["partitions"]) == set(man1["partitions"])
    assert {(r["query_id"], r["idx"]) for r in read_join(path).take_all()} == want


def test_interleaved_span_sequences_preserved(ray_session):
    # north-rule invariant: per-row span-sequence equality
    # (kind, text, media_ref, offset order) end to end
    from python_prtree_ray.sources.synth import interleaved_docs, georef_batch

    docs = interleaved_docs(300, override_num_blocks=5)
    geo = docs.map_batches(georef_batch, batch_format="pyarrow", zero_copy_batch=True)
    out = {r["doc_id"]: r["spans"] for r in geo.take_all()}
    ref = {r["doc_id"]: r["spans"] for r in interleaved_docs(300).take_all()}
    assert set(out) == set(ref)
    for k in ref:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out[k]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ref[k]]
        assert got == want


def test_minhash_finds_planted_near_dups(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import minhash_pairs

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 5
    near = base.replace("echo", "zulu")  # small edit → high jaccard
    far = "one two three four five six seven eight nine ten " * 5
    t = pa.table(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [base, near, far],
        }
    )
    out = minhash_pairs(
        ray.data.from_arrow(t), jaccard_threshold=0.5
    ).take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_neardup_finds_planted(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(31)
    base = rng.standard_normal((50, 16))
    dup = base[7] + 0.001 * rng.standard_normal(16)
    emb = np.concatenate([base, dup[None, :]], axis=0)
    t = pa.table(
        {
            "vec_id": np.arange(51, dtype=np.int64),
            "embedding": pa.array(list(emb.astype(np.float32)), type=pa.list_(pa.float32())),
        }
    )
    out = embedding_neardup_pairs(ray.data.from_arrow(t), threshold=0.99).take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (7, 50) in pairs


def test_embedding_neardup_lsh_recall_vs_exact(ray_session):
    # LSH pairs ⊆ exact pairs (precision 1: candidates are cosine-verified)
    # and recall over planted near-dups beats the analytic floor
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import (
        embedding_neardup_exact,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(37)
    base = rng.standard_normal((300, 16))
    planted = base[:40] + 0.08 * rng.standard_normal((40, 16))  # cos ≈ 0.97-0.999
    emb = np.concatenate([base, planted], axis=0)
    t = pa.table(
        {
            "vec_id": np.arange(340, dtype=np.int64),
            "embedding": pa.array(
                list(emb.astype(np.float32)), type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_exact(ds, threshold=0.9).take_all()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(ds, threshold=0.9).take_all()
    }
    assert len(lsh) == len(set(lsh))  # owner-table dedup: no double reports
    assert lsh <= exact
    assert len(exact) >= 40
    assert len(lsh) / len(exact) >= 0.8  # analytic recall ≈0.86+ at cos 0.9


def test_embedding_neardup_oversized_bucket_not_dropped(ray_session):
    # a degenerate direction cluster larger than bucket_cap must still be
    # verified (exact fallback), not silently dropped
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(41)
    v = rng.standard_normal(8)
    emb = v[None, :] + 0.001 * rng.standard_normal((30, 8))
    t = pa.table(
        {
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": pa.array(
                list(emb.astype(np.float32)), type=pa.list_(pa.float32())
            ),
        }
    )
    out = embedding_neardup_pairs(
        ray.data.from_arrow(t), threshold=0.99, bucket_cap=10
    ).take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert len(pairs) == 30 * 29 // 2  # every pair found despite cap=10


def test_multimodal_actor_stage_plumbing(ray_session):
    ray = ray_session
    from python_prtree_ray.stages.multimodal import MediaFeatureExtractor

    t = pa.table(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "kind": ["image", "audio"] * 5,
            "payload": [bytes([i] * 100) for i in range(10)],
        }
    )
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        MediaFeatureExtractor,
        concurrency=2,
        batch_size=4,
        batch_format="pyarrow",
    )
    rows = out.take_all()
    assert len(rows) == 10
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic fake: same payload → same features
    assert rows[0]["features"] == rows[0]["features"]


def _make_ppm(pix: np.ndarray) -> bytes:
    # binary PPM with a header comment (netpbm allows them)
    h, w, _ = pix.shape
    return b"P6\n# test fixture\n%d %d\n255\n" % (w, h) + pix.tobytes()


def _make_bmp(pix: np.ndarray, bottom_up: bool = True) -> bytes:
    # uncompressed 24-bit BMP, rows padded to 4 bytes, stored BGR
    h, w, _ = pix.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = pix[:, :, [2, 1, 0]].reshape(h, w * 3)
    if bottom_up:
        rows = rows[::-1]
    data = rows.tobytes()
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (h if bottom_up else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    off = 14 + 40
    hdr = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
    )
    return hdr + info + data


def test_decode_image_ppm_bmp_exact():
    # the real (non-stub) decode path: pure-NumPy PPM/BMP parsing
    from python_prtree_ray.stages.multimodal import decode_image

    rng = np.random.default_rng(5)
    pix = rng.integers(0, 256, size=(8, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_make_ppm(pix)), pix)
    # w=3 exercises the 3-byte row padding; both row orders
    assert np.array_equal(decode_image(_make_bmp(pix, bottom_up=True)), pix)
    assert np.array_equal(decode_image(_make_bmp(pix, bottom_up=False)), pix)
    assert decode_image(b"\x00not an image") is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n\x00")  # truncated raster


def test_media_features_real_decoder(ray_session):
    # VERDICT r4 #8: a real decodable format through the actor decode
    # swap point — PPM + BMP fixtures produce pixel-derived features,
    # stub payloads in the SAME batch keep the deterministic fake
    ray = ray_session
    from python_prtree_ray.stages.multimodal import MediaFeatureExtractor

    row_vals = np.arange(8, dtype=np.uint8) * 16
    pix = np.repeat(row_vals, 4 * 3).reshape(8, 4, 3)  # gray = 16*row
    t = pa.table(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "kind": ["image", "image", "audio"],
            "payload": [_make_ppm(pix), _make_bmp(pix), bytes(range(100))],
        }
    )
    rows = sorted(
        ray.data.from_arrow(t)
        .map_batches(
            MediaFeatureExtractor,
            concurrency=2,
            batch_size=2,
            batch_format="pyarrow",
        )
        .take_all(),
        key=lambda r: r["doc_id"],
    )
    expect = (row_vals.astype(np.float32) / 255.0).tolist()
    for r in rows[:2]:
        assert np.allclose(r["features"], expect, atol=1e-6)
        assert max(r["features"]) > 0  # nonzero features from real pixels
    # stub row unchanged: fold of the first 64 payload bytes
    stub = np.arange(64, dtype=np.float32).reshape(8, 8).mean(axis=1) / 255.0
    assert np.allclose(rows[2]["features"], stub, atol=1e-6)


def test_fingerprint_matches_slow_reference(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.text import fingerprint, hash_str_array

    rng = np.random.default_rng(43)
    vocab = np.array(["w%d" % i for i in range(60)])
    texts = [
        " ".join(vocab[rng.integers(0, 60, size=rng.integers(0, 25))])
        for _ in range(120)
    ]
    t = pa.table({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    window = 8
    out = {
        r["doc_id"]: r["fp"]
        for r in fingerprint(ray.data.from_arrow(t).repartition(5), window).take_all()
    }
    for i, txt in enumerate(texts):
        toks = [w for w in txt.split(" ") if w] if txt else []
        if txt == "":
            toks = [""]  # regex split of "" yields one empty token
        hv = hash_str_array(np.array(toks, dtype=str)) if toks else np.empty(0, np.int64)
        if hv.size == 0:
            want = 0
        elif hv.size < window:
            want = int(hv.sum())
        else:
            want = min(
                int(hv[j : j + window].sum()) for j in range(hv.size - window + 1)
            )
        assert out[i] == want, i


def test_frame_sampler_matches_slow_reference(ray_session):
    ray = ray_session
    from python_prtree_ray.stages.multimodal import FrameSampler

    rng = np.random.default_rng(44)
    payloads = [bytes(rng.integers(0, 256, size=int(n)).tolist()) for n in
                rng.integers(0, 400, size=40)] + [b""]
    t = pa.table(
        {
            "doc_id": np.arange(41, dtype=np.int64),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    every = 3
    out = (
        ray.data.from_arrow(t)
        .map_batches(FrameSampler, fn_constructor_kwargs=dict(every=every),
                     batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    got = {r["doc_id"]: r["frames"] for r in out}
    for i, buf in enumerate(payloads):
        chunks = [buf[j : j + 64] for j in range(0, len(buf), 64)]
        assert got[i] == chunks[::every], i


def test_ann_lsh_ivf_recall_floors(ray_session):
    # recall instrumentation: approximate paths measured against the exact
    # ann_brute_topk on the same inputs, with asserted floors
    ray = ray_session
    from python_prtree_ray.pipelines.ann import (
        ann_brute_topk,
        ann_ivf_topk,
        ann_lsh_topk,
    )

    rng = np.random.default_rng(45)
    emb = rng.standard_normal((800, 32))
    t = pa.table(
        {
            "vec_id": np.arange(800, dtype=np.int64),
            "embedding": pa.array(
                list(emb.astype(np.float32)), type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    q = emb[:20]
    qids = np.arange(20)
    k = 5

    def pairs(res):
        return {(r["query_id"], r["vec_id"]) for r in res.take_all()}

    exact = pairs(ann_brute_topk(ds, q, qids, k=k))
    lsh = pairs(ann_lsh_topk(ds, q, qids, k=k))
    ivf = pairs(ann_ivf_topk(ds, q, qids, k=k))
    assert len(exact) == 20 * k
    # random Gaussian data is LSH's worst case (neighbors barely closer
    # than noise); measured 0.43 with the fixed seeds — floor at 0.4
    assert len(lsh & exact) / len(exact) >= 0.4  # multi-probe 1-bit LSH
    # measured 0.51 with 4/32 probed cells on random data — floor at 0.45
    assert len(ivf & exact) / len(exact) >= 0.45
    # each query's own vector (sim=1.0) must survive every path
    assert all((i, i) in p for p in (exact, ivf) for i in range(20))


def test_ngram_stopgram_cutoff_is_lower_bound(ray_session):
    # max_gram_freq drops hot grams from pair expansion (logged, not
    # silent): result pairs must be a subset of the exact result
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import ngram_jaccard_pairs

    hot = "alpha beta gamma"
    texts = [f"{hot} doc{i}a doc{i}b doc{i}c {hot}" for i in range(20)]
    t = pa.table({"doc_id": np.arange(20, dtype=np.int64), "text": texts})
    ds = ray.data.from_arrow(t).repartition(3)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(ds, n=3, threshold=0.05).take_all()
    }
    cut = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(
            ds, n=3, threshold=0.05, max_gram_freq=5
        ).take_all()
    }
    assert len(exact) == 20 * 19 // 2  # every doc pair shares the hot grams
    assert cut <= exact
    assert len(cut) < len(exact)


def test_simhash_pairs_exact_vs_brute_force(ray_session):
    # banded simhash pair search is EXACT for max_hamming <= bands-1:
    # output must equal the brute-force all-pairs hamming filter
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import (
        _popcount64,
        simhash_64,
        simhash_pairs,
    )

    rng = np.random.default_rng(47)
    vocab = np.array(["w%d" % i for i in range(300)])
    texts = []
    for i in range(50):
        base = vocab[rng.integers(0, 300, size=60)]
        texts.append(" ".join(base))
        texts.append(" ".join(base))  # exact dup → hamming 0
        mod = base.copy()
        mod[rng.integers(0, 60)] = vocab[rng.integers(0, 300)]
        texts.append(" ".join(mod))  # near dup → small hamming
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = ray.data.from_arrow(t).repartition(4)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(ds, max_hamming=3).take_all()
    }
    sh_rows = simhash_64(ds).take_all()
    sh = np.empty(len(texts), dtype=np.int64)
    for r in sh_rows:
        sh[r["doc_id"]] = r["simhash"]
    ia, ib = np.triu_indices(len(texts), k=1)
    ham = _popcount64(sh[ia] ^ sh[ib])
    want = {
        (int(ia[j]), int(ib[j])): int(ham[j])
        for j in np.nonzero(ham <= 3)[0]
    }
    assert len(want) >= 50  # the exact dups alone
    assert got == want


def test_distinct_count_exact_and_hll(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.sketch import distinct_users, distinct_users_hll

    rng = np.random.default_rng(51)
    n = 40_000
    types = np.array(["click", "view", "purchase"])[rng.integers(0, 3, size=n)]
    # per-type distinct pools of very different sizes
    uid = np.where(
        types == "click",
        rng.integers(0, 20_000, size=n),
        np.where(types == "view", rng.integers(0, 500, size=n), rng.integers(0, 37, size=n)),
    ).astype(np.int64)
    t = pa.table({"event_type": types, "user_id": uid})
    ds = ray.data.from_arrow(t).repartition(6)
    exact = {r["event_type"]: r["n_users"] for r in distinct_users(ds).take_all()}
    want = {
        k: len(np.unique(uid[types == k])) for k in ("click", "view", "purchase")
    }
    assert exact == want
    approx = {
        r["event_type"]: r["n_users_approx"] for r in distinct_users_hll(ds).take_all()
    }
    for k, v in want.items():
        assert abs(approx[k] - v) / v < 0.05, (k, approx[k], v)  # ~1.6% stderr at p=12
    # mergeability: estimate is partitioning-invariant
    approx2 = {
        r["event_type"]: r["n_users_approx"]
        for r in distinct_users_hll(ray.data.from_arrow(t).repartition(13)).take_all()
    }
    assert approx == approx2


def test_broadcast_lookup_misses_and_dup_keys(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.lookup import broadcast_lookup

    big = ray.data.from_arrow(
        pa.table(
            {
                "event_id": np.arange(6, dtype=np.int64),
                "user_id": np.array([1, 2, 3, 99, 2, -5], dtype=np.int64),
            }
        )
    ).repartition(2)
    small = pa.table(
        {
            "c_custkey": np.array([2, 1, 2, 3], dtype=np.int64),  # dup key 2
            "tag": ["first-2", "one", "last-2", "three"],
        }
    )
    # default on_dup="error": a dup-keyed dimension table raises loudly
    # (silent divergence from a SQL fan-out join otherwise)
    with pytest.raises(ValueError, match="duplicate keys"):
        broadcast_lookup(
            big, small, on="user_id", small_on="c_custkey", carry_cols=("tag",)
        )
    out = broadcast_lookup(
        big, small, on="user_id", small_on="c_custkey", carry_cols=("tag",),
        on_dup="last",
    ).take_all()
    got = {(r["event_id"], r["user_id"]): r["tag"] for r in out}
    # misses (99, -5) drop; duplicate small key keeps the LAST occurrence
    assert got == {
        (0, 1): "one",
        (1, 2): "last-2",
        (2, 3): "three",
        (4, 2): "last-2",
    }
    # how="left": misses kept with NULL carries
    out_l = broadcast_lookup(
        big, small, on="user_id", small_on="c_custkey", carry_cols=("tag",),
        on_dup="last", how="left",
    ).take_all()
    got_l = {r["event_id"]: r["tag"] for r in out_l}
    assert len(out_l) == 6
    assert got_l[3] is None and got_l[5] is None  # users 99 and -5
    assert got_l[1] == "last-2"
    # how="anti": ONLY the unmatched rows, no carry columns
    out_a = broadcast_lookup(
        big, small, on="user_id", small_on="c_custkey", on_dup="last",
        how="anti",
    ).take_all()
    assert sorted(r["event_id"] for r in out_a) == [3, 5]
    assert all("tag" not in r for r in out_a)
    # left against an EMPTY small side: all carries NULL, rows kept
    empty_small = small.slice(0, 0)
    out_e = broadcast_lookup(
        big, empty_small, on="user_id", small_on="c_custkey",
        carry_cols=("tag",), how="left",
    ).take_all()
    assert len(out_e) == 6 and all(r["tag"] is None for r in out_e)


def test_interval_point_join_matches_brute_force(ray_session):
    # closed-interval semantics (BETWEEN): boundary hits at ts == lo and
    # ts == lo + window must match; keys never cross
    ray = ray_session
    from python_prtree_ray.pipelines.interval import interval_point_join

    rng = np.random.default_rng(60)
    W = 3600 * 1_000_000  # 1h in us
    base = np.datetime64("2025-03-01T00:00:00", "us").astype(np.int64)
    l_ts = base + rng.integers(0, 86_400, size=80) * 1_000_000
    r_ts = base + rng.integers(0, 86_400, size=400) * 1_000_000
    # plant exact boundary collisions
    r_ts[0], r_ts[1] = l_ts[0], l_ts[0] + W
    l_key = rng.integers(0, 9, size=80)
    r_key = rng.integers(0, 9, size=400)
    r_key[0] = r_key[1] = l_key[0]
    lt = pa.table({
        "l_id": np.arange(80, dtype=np.int64), "user_id": l_key,
        "ts": l_ts.astype("datetime64[us]"),
    })
    rt = pa.table({
        "r_id": np.arange(400, dtype=np.int64), "user_id": r_key,
        "ts": r_ts.astype("datetime64[us]"),
    })
    want = {
        (int(i), int(j))
        for i in range(80)
        for j in range(400)
        if l_key[i] == r_key[j] and l_ts[i] <= r_ts[j] <= l_ts[i] + W
    }
    for bc in (None, False):  # broadcast AND exactly-normalized cell path
        out = interval_point_join(
            ray.data.from_arrow(lt).repartition(3),
            ray.data.from_arrow(rt).repartition(4),
            window_us=W,
            broadcast=bc,
        ).take_all()
        got = {(r["l_id"], r["r_id"]) for r in out}
        assert got == want, f"broadcast={bc}"
        assert (0, 0) in got and (0, 1) in got  # boundary inclusivity


def test_sample_per_key_cap_and_determinism(ray_session):
    ray = ray_session
    from python_prtree_ray.functions import derive
    from python_prtree_ray.pipelines.sample import SAMPLE_CHANNEL, sample_per_key

    rng = np.random.default_rng(61)
    keys = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, size=500)]
    ids = rng.permutation(500).astype(np.int64)
    t = pa.table({"lang": keys, "doc_id": ids})
    n = 20

    def run(blocks):
        out = sample_per_key(
            ray.data.from_arrow(t).repartition(blocks), "lang", "doc_id", n
        ).take_all()
        return {(r["lang"], r["doc_id"]) for r in out}

    got = run(3)
    assert got == run(11)  # partitioning-invariant
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    want = set()
    for k in "abcd":
        kids = np.sort(ids[keys == k])
        h = (kids * a + b) % derive.MOD
        order = np.lexsort((kids, h))[:n]
        want |= {(k, int(kids[j])) for j in order}
    assert got == want
    # per-key counts capped at min(n, group size)
    from collections import Counter
    cnt = Counter(k for k, _ in got)
    for k in "abcd":
        assert cnt[k] == min(n, int((keys == k).sum()))


def test_rolling_window_sum_peers_and_bounds(ray_session):
    # SQL RANGE-frame semantics: equal-ts peers included for each other,
    # closed window bounds, keys independent
    ray = ray_session
    from python_prtree_ray.pipelines.windows import rolling_window_sum

    t0 = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
    m = 60_000_000
    ts = (t0 + np.array([0, 10 * m, 10 * m, 45 * m, 0])).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": ts,
            "event_type": ["a", "a", "a", "a", "b"],
            "value": [0.01, 0.02, 0.03, 0.04, 0.99],
        }
    )
    out = rolling_window_sum(
        ray.data.from_arrow(t).repartition(2), window_minutes=30
    ).take_all()
    got = {r["event_id"]: r["roll_cents"] for r in out}
    # t=10m rows are peers: each sees 1+2+3; t=45m window [15m,45m]
    # excludes them; key 'b' independent
    assert got == {0: 1, 1: 6, 2: 6, 3: 4, 4: 99}


def test_hash_equi_join_duplicates_both_sides(ray_session):
    # full duplicate semantics: every left row pairs with every matching
    # right row; misses drop; result partitioning-invariant
    ray = ray_session
    import pandas as pd
    from python_prtree_ray.pipelines.join import hash_equi_join

    rng = np.random.default_rng(63)
    lk = rng.integers(0, 40, size=300).astype(np.int64)
    rk = rng.integers(20, 60, size=200).astype(np.int64)  # partial overlap
    lt = pa.table({"k": lk, "lv": np.arange(300, dtype=np.int64)})
    rt = pa.table({"k": rk, "rv": np.arange(1000, 1200, dtype=np.int64)})
    out = hash_equi_join(
        ray.data.from_arrow(lt).repartition(4),
        ray.data.from_arrow(rt).repartition(3),
        on="k", left_cols=("lv",), right_cols=("rv",),
    ).take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
    want_df = lt.to_pandas().merge(rt.to_pandas(), on="k")
    want = sorted(map(tuple, want_df[["k", "lv", "rv"]].to_numpy()))
    assert got == want
    with pytest.raises(ValueError, match="collision"):
        hash_equi_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            on="k", left_cols=("lv",), right_cols=("lv",),
        )
    # payload columns named like former internals must NOT corrupt the
    # join (regression: 'k'/'b'/'side' used to shadow the key/bucket)
    lt2 = pa.table({"id": np.array([1, 2, 3], np.int64),
                    "k": np.array([9, 9, 9], np.int64)})
    rt2 = pa.table({"id": np.array([1, 1, 4], np.int64),
                    "side": ["x", "y", "z"]})
    out2 = hash_equi_join(
        ray.data.from_arrow(lt2), ray.data.from_arrow(rt2),
        on="id", left_cols=("k",), right_cols=("side",),
    ).take_all()
    assert sorted((r["id"], r["k"], r["side"]) for r in out2) == [
        (1, 9, "x"), (1, 9, "y")
    ]


def test_hash_equi_join_left_semi_anti(ray_session):
    # outer/semi/anti flavors against a pandas ground truth, including
    # dup right keys (left join fans out, semi does not) and an
    # all-miss bucket (right side empty for some buckets)
    ray = ray_session
    from python_prtree_ray.pipelines.join import hash_equi_join

    rng = np.random.default_rng(64)
    lk = rng.integers(0, 50, size=400).astype(np.int64)
    rk = rng.integers(30, 80, size=120).astype(np.int64)  # keys 0-29 miss
    lt = pa.table({"k": lk, "lv": np.arange(400, dtype=np.int64)})
    rt = pa.table({"k": rk, "rv": np.arange(2000, 2120, dtype=np.int64)})
    ldf, rdf = lt.to_pandas(), rt.to_pandas()
    lds = ray.data.from_arrow(lt).repartition(5)
    rds = ray.data.from_arrow(rt).repartition(3)

    out_l = hash_equi_join(
        lds, rds, on="k", left_cols=("lv",), right_cols=("rv",), how="left"
    ).take_all()
    got_l = sorted(
        (r["k"], r["lv"], -1 if r["rv"] is None else r["rv"]) for r in out_l
    )
    want_df = ldf.merge(rdf, on="k", how="left")
    want_l = sorted(
        (int(k), int(lv), -1 if np.isnan(rv) else int(rv))
        for k, lv, rv in want_df[["k", "lv", "rv"]].to_numpy()
    )
    assert got_l == want_l

    matched_keys = set(rdf["k"])
    out_s = hash_equi_join(lds, rds, on="k", left_cols=("lv",), how="semi").take_all()
    got_s = sorted((r["k"], r["lv"]) for r in out_s)
    want_s = sorted(
        (int(k), int(lv))
        for k, lv in ldf[["k", "lv"]].to_numpy()
        if k in matched_keys
    )
    assert got_s == want_s

    out_a = hash_equi_join(lds, rds, on="k", left_cols=("lv",), how="anti").take_all()
    got_a = sorted((r["k"], r["lv"]) for r in out_a)
    want_a = sorted(
        (int(k), int(lv))
        for k, lv in ldf[["k", "lv"]].to_numpy()
        if k not in matched_keys
    )
    assert got_a == want_a

    out_o = hash_equi_join(
        lds, rds, on="k", left_cols=("lv",), right_cols=("rv",), how="outer"
    ).take_all()
    got_o = sorted(
        (
            r["k"],
            -1 if r["lv"] is None else r["lv"],
            -1 if r["rv"] is None else r["rv"],
        )
        for r in out_o
    )
    want_odf = ldf.merge(rdf, on="k", how="outer")
    want_o = sorted(
        (int(k), -1 if np.isnan(lv) else int(lv), -1 if np.isnan(rv) else int(rv))
        for k, lv, rv in want_odf[["k", "lv", "rv"]].to_numpy()
    )
    assert got_o == want_o

    with pytest.raises(ValueError, match="right-side"):
        hash_equi_join(lds, rds, on="k", right_cols=("rv",), how="anti")
    with pytest.raises(ValueError, match="unsupported"):
        hash_equi_join(lds, rds, on="k", how="cross")


def test_connected_components_matches_union_find(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.graph import connected_components

    rng = np.random.default_rng(62)
    # random sparse graph over scattered ids + a long chain (forces
    # multiple propagation rounds) + singleton pairs
    ids = rng.choice(100_000, size=120, replace=False).astype(np.int64)
    a = ids[rng.integers(0, 120, size=150)]
    b = ids[rng.integers(0, 120, size=150)]
    keep = a != b
    a, b = a[keep], b[keep]
    chain = np.sort(rng.choice(200_000, size=30, replace=False) + 500_000)
    a = np.concatenate([a, chain[:-1]])
    b = np.concatenate([b, chain[1:]])
    t = pa.table({"id_a": a, "id_b": b})

    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        parent[find(x)] = find(y)
    nodes = sorted(parent)
    comp_min: dict[int, int] = {}
    for x in nodes:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {(x, comp_min[find(x)]) for x in nodes}

    # local (bounded-collect) path at two partitionings
    for blocks in (2, 7):
        out = connected_components(
            ray.data.from_arrow(t).repartition(blocks)
        ).take_all()
        got = {(r["doc_id"], r["cluster_id"]) for r in out}
        assert got == want
    # distributed 2-shuffle rounds (collect_limit=0 forces the big-graph
    # path) must produce the identical clustering
    out = connected_components(
        ray.data.from_arrow(t).repartition(3), collect_limit=0
    ).take_all()
    assert {(r["doc_id"], r["cluster_id"]) for r in out} == want


def test_connected_components_spilled_edges_identical(ray_session, tmp_path):
    # VERDICT-r3 #5: with spill_dir the static edge list is checkpointed
    # to parquet and re-streamed per round instead of pinned in the
    # object store; labels must be identical to the pinned path
    ray = ray_session
    from python_prtree_ray.pipelines.graph import connected_components

    rng = np.random.default_rng(63)
    chain = np.sort(rng.choice(50_000, size=40, replace=False)).astype(np.int64)
    a = np.concatenate([chain[:-1], rng.integers(0, 1000, 60)]).astype(np.int64)
    b = np.concatenate([chain[1:], rng.integers(0, 1000, 60)]).astype(np.int64)
    keep = a != b
    t = pa.table({"id_a": a[keep], "id_b": b[keep]})
    pinned = connected_components(
        ray.data.from_arrow(t).repartition(3), collect_limit=0
    ).take_all()
    # spy on the cleanup so the test can both prove the checkpoint WAS
    # written (spill path exercised) and that it was removed afterwards
    import shutil

    removed = []
    real_rmtree = shutil.rmtree

    def spy_rmtree(path, *a, **kw):
        if "cc-edges-" in str(path):
            removed.append(sorted(p.name for p in Path(path).iterdir()))
        return real_rmtree(path, *a, **kw)

    from pathlib import Path
    from unittest import mock

    with mock.patch.object(shutil, "rmtree", spy_rmtree):
        spilled = connected_components(
            ray.data.from_arrow(t).repartition(3),
            collect_limit=0,
            spill_dir=str(tmp_path),
        ).take_all()
    assert removed and removed[0], "edge checkpoint never written"
    # the checkpoint (one full symmetrized edge copy per call) is removed
    # once labels are materialized, so repeated calls against the same
    # spill_dir can't fill disk — after the call the dir must be clean
    assert not list(tmp_path.glob("cc-edges-*")), "edge checkpoint leaked"
    as_set = lambda rows: {(r["doc_id"], r["cluster_id"]) for r in rows}
    assert as_set(spilled) == as_set(pinned)


def test_pack_documents_invariants(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.packing import pack_documents

    rng = np.random.default_rng(54)
    texts = [
        " ".join("tok%d" % j for j in range(int(n)))
        for n in rng.integers(1, 200, size=400)
    ] + [" ".join("big%d" % j for j in range(900))]  # one oversize doc
    t = pa.table({"doc_id": np.arange(401, dtype=np.int64), "text": texts})
    budget = 512

    def run(blocks):
        return pack_documents(
            ray.data.from_arrow(t).repartition(blocks), budget=budget
        ).take_all()

    rows = run(4)
    assert len(rows) == 401  # every doc assigned exactly once
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for b, members in by_bin.items():
        total = sum(r["n_tokens"] for r in members)
        if any(r["oversize"] for r in members):
            assert len(members) == 1  # oversize doc isolated
        else:
            assert total <= budget
            # offsets = concatenation order by doc id
            members.sort(key=lambda r: r["doc_id"])
            off = 0
            for r in members:
                assert r["bin_offset"] == off
                off += r["n_tokens"]
    # deterministic across partitioning
    key = lambda rows_: sorted((r["doc_id"], r["bin_id"], r["bin_offset"]) for r in rows_)
    assert key(run(9)) == key(rows)


def test_streaming_window_matches_batch_and_emits_once(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.windows import (
        StreamingWindowAggregator,
        tumbling_window_agg,
    )

    rng = np.random.default_rng(53)
    n = 5000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # mostly-ordered stream with bounded lateness (< 1h)
    ts = base + (
        np.sort(rng.integers(0, 48 * 3600, size=n)) * 1_000_000
        + rng.integers(-1800, 1800, size=n) * 1_000_000
    ).astype("timedelta64[us]")
    types = np.array(["click", "view"])[rng.integers(0, 2, size=n)]
    value = rng.exponential(3.0, size=n)
    t = pa.table({"ts": ts, "event_type": types, "value": value})

    agg = StreamingWindowAggregator(allowed_lateness_hours=1)
    outs = []
    emitted_keys = set()
    for s in range(0, n, 500):
        agg.update(t.slice(s, 500))
        e = agg.poll()
        ks = set(zip(e.column("event_type").to_pylist(), e.column("window_start").to_pylist()))
        assert not (ks & emitted_keys)  # exactly-once emission
        emitted_keys |= ks
        outs.append(e)
    outs.append(agg.finalize())
    got_t = pa.concat_tables(outs)
    got = {
        (r["event_type"], r["window_start"]): (r["n_events"], r["value_cents"])
        for r in got_t.to_pylist()
    }
    assert agg.late_dropped == 0  # lateness stayed under the watermark slack
    batch = tumbling_window_agg(ray.data.from_arrow(t).repartition(4)).take_all()
    want = {
        (r["event_type"], r["window_start"]): (r["n_events"], r["value_cents"])
        for r in batch
    }
    assert got == want


def test_value_quantiles_exact_and_partition_invariant(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.quantiles import value_quantiles

    rng = np.random.default_rng(52)
    n = 30_000
    types = np.array(["a", "b"])[rng.integers(0, 2, size=n)]
    value = np.where(
        types == "a", rng.exponential(5.0, size=n), rng.normal(100.0, 30.0, size=n)
    )
    t = pa.table({"event_type": types, "value": value})

    def run(blocks):
        out = value_quantiles(
            ray.data.from_arrow(t).repartition(blocks)
        ).take_all()
        return {r["event_type"]: (r["p50"], r["p90"], r["p99"]) for r in out}

    got = run(4)
    # reference: the exact R-7 expression the pipeline (and DuckDB
    # quantile_cont) evaluates — numpy's percentile uses an a+t*(b-a)
    # lerp that differs in the last ulp on some inputs
    cents = np.floor(value * 100.0).astype(np.int64)
    for k in ("a", "b"):
        v = np.sort(cents[types == k]).astype(np.float64)
        want = []
        for q in (0.5, 0.9, 0.99):
            h = (v.shape[0] - 1) * q
            lo = int(np.floor(h))
            frac = h - lo
            want.append((1.0 - frac) * v[lo] + frac * v[min(lo + 1, v.shape[0] - 1)])
        assert got[k] == tuple(want), (k, got[k], want)
    assert run(11) == got  # partitioning-invariant


def test_io_dispatch_and_manifest_verify(ray_session, tmp_path):
    ray = ray_session
    from python_prtree_ray.sources.io import lance_available, read_table
    from python_prtree_ray.state import manifest as mf

    # parquet path works through the dispatching reader with projection
    import pyarrow.parquet as pq

    f = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"a": np.arange(10, dtype=np.int64), "b": np.arange(10)}), f
    )
    ds = read_table(f, columns=["a"])
    assert ds.count() == 10
    assert ds.schema().names == ["a"]
    # csv and jsonl dispatch with post-read projection
    import pandas as pd

    fc = str(tmp_path / "t.csv")
    pd.DataFrame({"a": range(6), "b": range(6)}).to_csv(fc, index=False)
    dc = read_table(fc, columns=["b"])
    assert dc.count() == 6 and dc.schema().names == ["b"]
    fj = str(tmp_path / "t.jsonl")
    pd.DataFrame({"a": range(4), "b": range(4)}).to_json(
        fj, orient="records", lines=True
    )
    dj = read_table(fj, columns=["a"])
    assert dj.count() == 4 and dj.schema().names == ["a"]
    # .lance dispatch is import-gated with a clear error in this sandbox
    if not lance_available():
        with pytest.raises(ImportError, match="lance"):
            read_table(str(tmp_path / "x.lance"))
    # manifest verify: detect a partition whose file lost rows
    rng = np.random.default_rng(48)
    boxes = random_boxes(rng, 200, edge=0.03)
    bds = _boxes_ds(ray, boxes, np.arange(200, dtype=np.int64))
    path = str(tmp_path / "ckpt")
    man = mf.write_partitioned(
        bds, path, lambda t: mf._partition_of_boxes(t, 1), coarse_res=1
    )
    assert man["metrics"]["total_rows"] == 200
    assert all("checksum" in p and "bytes" in p for p in man["partitions"].values())
    assert mf.read_partitioned(path, verify=True).count() == 200
    victim = sorted(man["partitions"])[0]
    vfile = os.path.join(path, man["partitions"][victim]["file"])
    t = pq.read_table(vfile)
    pq.write_table(t.slice(0, max(t.num_rows - 1, 0)), vfile)
    with pytest.raises(ValueError, match="rows"):
        mf.read_partitioned(path, verify=True)


def test_minhash_recall_vs_exact_ngram(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.dedup import minhash_pairs, ngram_jaccard_pairs

    rng = np.random.default_rng(46)
    vocab = np.array(["tok%d" % i for i in range(500)])
    docs, texts = [], []
    for i in range(60):
        base = vocab[rng.integers(0, 500, size=80)]
        texts.append(" ".join(base))
        # near-dup: replace 4 of 80 tokens → token-trigram jaccard ~0.85
        mod = base.copy()
        pos = rng.integers(0, 80, size=4)
        mod[pos] = vocab[rng.integers(0, 500, size=4)]
        texts.append(" ".join(mod))
    t = pa.table(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "text": texts,
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(ds, n=3, threshold=0.5).take_all()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_pairs(ds, jaccard_threshold=0.5).take_all()
    }
    assert len(exact) >= 50  # the planted near-dup pairs qualify
    assert len(mh & exact) / len(exact) >= 0.8


def test_image_resizer_stub_pooling(ray_session):
    ray = ray_session
    from python_prtree_ray.stages.multimodal import ImageResizer

    rng = np.random.default_rng(55)
    payloads = [bytes(rng.integers(0, 256, size=300).tolist()), b"\xff" * 256, b""]
    t = pa.table(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(ImageResizer, fn_constructor_kwargs=dict(side=4),
                     batch_format="pyarrow", concurrency=1)
        .take_all()
    )
    got = {r["doc_id"]: r["thumb"] for r in out}
    # slow reference: 16x16 grid of first 256 bytes (zero-padded), 4x4 mean
    for i, buf in enumerate(payloads):
        grid = np.zeros(256, dtype=np.uint8)
        grid[: min(len(buf), 256)] = np.frombuffer(buf[:256], np.uint8)
        img = grid.reshape(16, 16)
        want = (
            img.reshape(4, 4, 4, 4).mean(axis=(1, 3)).astype(np.uint8).ravel().tolist()
        )
        assert got[i] == want, i
    with pytest.raises(ValueError, match="divide"):
        ImageResizer(side=5)


def test_ann_brute_topk_exact(ray_session):
    ray = ray_session
    from python_prtree_ray.pipelines.ann import ann_brute_topk

    rng = np.random.default_rng(33)
    emb = rng.standard_normal((200, 16))
    t = pa.table(
        {
            "vec_id": np.arange(200, dtype=np.int64),
            "embedding": pa.array(list(emb.astype(np.float32)), type=pa.list_(pa.float32())),
        }
    )
    q = emb[:5]
    out = ann_brute_topk(
        ray.data.from_arrow(t).repartition(6), q, np.arange(5), k=3
    ).take_all()
    # oracle
    emb32 = emb.astype(np.float32).astype(np.float64)
    n = emb32 / np.linalg.norm(emb32, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = n @ qn.T
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qi in range(5):
        order = np.lexsort((np.arange(200), -sims[:, qi]))[:3]
        assert sorted(got[qi]) == [(j + 1, int(v)) for j, v in enumerate(order)]


def test_sum_semi_join_matches_pandas(ray_session):
    # fused per-key sum + semi membership vs a pandas groupby + isin,
    # with multi-block partials (per-key rows split across blocks) and
    # keys missing from the right side
    ray = ray_session
    import pandas as pd

    from python_prtree_ray.pipelines.join import sum_semi_join

    rng = np.random.default_rng(83)
    lk = rng.integers(0, 200, size=3000).astype(np.int64)
    lv = rng.integers(-50, 50, size=3000).astype(np.int64)
    rk = rng.integers(100, 300, size=400).astype(np.int64)  # 0-99 missing
    lds = ray.data.from_arrow(pa.table({"k": lk, "v": lv})).repartition(7)
    rds = ray.data.from_arrow(pa.table({"rk": rk})).repartition(3)
    out = sum_semi_join(
        lds, rds, on="k", right_on="rk", value_cols=("v",)
    ).take_all()
    got = sorted((r["k"], r["v"]) for r in out)
    df = pd.DataFrame({"k": lk, "v": lv})
    agg = df.groupby("k", as_index=False)["v"].sum()
    keep = agg["k"].isin(set(rk.tolist()))
    want = sorted(
        (int(k), int(v)) for k, v in agg[keep][["k", "v"]].to_numpy()
    )
    assert want  # non-degenerate
    assert got == want


def test_strict_big_mode_matches_small_mode(ray_session, monkeypatch):
    """Strict bookkeeping above KEY_CACHE_LIMIT (VERDICT-r3 #4): with the
    cache ceiling forced to 0 the tree runs in BIG mode — no driver key
    array at all; duplicate-insert and missing-erase checks go through
    the distributed semi-join / broadcast-probe kernels — and every
    observable (sizes, errors, query answers) matches small mode."""
    ray = ray_session
    monkeypatch.setattr(RayPRTree, "KEY_CACHE_LIMIT", 0)
    rng = np.random.default_rng(41)
    boxes = random_boxes(rng, 300, edge=0.03)
    ids = np.arange(300, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=True)
    assert tree._keys is None  # BIG mode engaged
    assert tree.size() == 300

    with pytest.raises(ValueError, match="already exists"):
        tree.insert_batch(_boxes_ds(ray, boxes[5:6], ids[5:6], blocks=1))
    with pytest.raises(ValueError, match="not found"):
        tree.erase([9999])
    with pytest.raises(ValueError, match="not found"):
        tree.set_obj(9999, "x")

    tree.erase(ids[::5])  # 60 ids
    assert tree.size() == 240
    extra = random_boxes(rng, 40, edge=0.03)
    tree.insert_batch(_boxes_ds(ray, extra, np.arange(1000, 1040), blocks=1))
    assert tree.size() == 280
    # an erased id is re-insertable, then erasable again
    tree.insert_batch(_boxes_ds(ray, boxes[:1], ids[:1], blocks=1))
    assert tree.size() == 281
    tree.erase([0])
    assert tree.size() == 280
    tree.set_obj(1000, "payload")  # live id passes the probe
    assert tree.get_obj(1000) == "payload"

    # answers and size equal a genuinely small-mode twin (cache restored)
    # driven through the identical mutation sequence
    monkeypatch.undo()
    small = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=True)
    small.erase(ids[::5])
    small.insert_batch(_boxes_ds(ray, extra, np.arange(1000, 1040), blocks=1))
    small.insert_batch(_boxes_ds(ray, boxes[:1], ids[:1], blocks=1))
    small.erase([0])
    assert small._keys is not None  # sanity: the twin used the cache path
    assert small.size() == tree.size() == 280
    qs = random_boxes(rng, 40, edge=0.12)
    qids = np.arange(40, dtype=np.int64)
    assert _query_set(tree, ray, qs, qids) == _query_set(small, ray, qs, qids)


def test_strict_small_to_big_graduation(ray_session, monkeypatch):
    """An insert that pushes the cached key set past the ceiling
    graduates the tree to BIG mode in place, preserving counts and
    strictness."""
    ray = ray_session
    monkeypatch.setattr(RayPRTree, "KEY_CACHE_LIMIT", 100)
    rng = np.random.default_rng(43)
    boxes = random_boxes(rng, 80, edge=0.03)
    tree = RayPRTree(
        _boxes_ds(ray, boxes, np.arange(80, dtype=np.int64)), res=4, strict=True
    )
    assert tree._keys is not None  # still small
    more = random_boxes(rng, 80, edge=0.03)
    tree.insert_batch(_boxes_ds(ray, more, np.arange(100, 180), blocks=1))
    assert tree._keys is None  # graduated
    assert tree.size() == 160
    with pytest.raises(ValueError, match="already exists"):
        tree.insert_batch(_boxes_ds(ray, boxes[:1], np.array([150]), blocks=1))
    tree.erase([0, 150])
    assert tree.size() == 158


def test_lance_dispatch_contract(ray_session, monkeypatch, tmp_path):
    """VERDICT-r3 #9: execute the read/write .lance branches against a
    mocked lance integration — dispatch fires exactly for *.lance paths,
    the column projection and extra kwargs are forwarded verbatim, and
    the returned object is the integration's Dataset."""
    ray = ray_session
    from python_prtree_ray.sources import io as srcio

    calls = []
    fake_ds = ray.data.from_arrow(
        pa.table({"a": np.arange(3, dtype=np.int64)})
    )

    def fake_read_lance(path, columns=None, **kw):
        calls.append(("read", path, tuple(columns or ()), kw))
        return fake_ds

    monkeypatch.setattr(srcio, "lance_available", lambda: True)
    monkeypatch.setattr(
        ray.data, "read_lance", fake_read_lance, raising=False
    )
    out = srcio.read_table(
        str(tmp_path / "docs.lance"), columns=["doc_id", "spans"],
        override_num_blocks=7,
    )
    assert out is fake_ds
    assert calls == [(
        "read", str(tmp_path / "docs.lance"), ("doc_id", "spans"),
        {"override_num_blocks": 7},
    )]

    # write dispatch: Dataset.write_lance is invoked for *.lance targets
    wcalls = []
    monkeypatch.setattr(
        type(fake_ds), "write_lance",
        lambda self, path, **kw: wcalls.append((path, kw)), raising=False,
    )
    srcio.write_table(fake_ds, str(tmp_path / "out.lance"), mode="create")
    assert wcalls == [(str(tmp_path / "out.lance"), {"mode": "create"})]
    # non-lance targets never touch the lance writer
    srcio.write_table(fake_ds, str(tmp_path / "out_pq"))
    assert len(wcalls) == 1
    assert list((tmp_path / "out_pq").glob("*.parquet"))


def test_ann_pq_recall_floor(ray_session):
    # PQ asymmetric-LUT path measured against exact brute force on the
    # same inputs; floors calibrated on the fixed seeds
    ray = ray_session
    from python_prtree_ray.pipelines.ann import ann_brute_topk, ann_pq_topk

    rng = np.random.default_rng(45)
    emb = rng.standard_normal((800, 32))
    t = pa.table(
        {
            "vec_id": np.arange(800, dtype=np.int64),
            "embedding": pa.array(
                list(emb.astype(np.float32)), type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    q = emb[:20]
    qids = np.arange(20)
    k = 5

    def pairs(res):
        return {(r["query_id"], r["vec_id"]) for r in res.take_all()}

    exact = pairs(ann_brute_topk(ds, q, qids, k=k))
    # default 8x256: measured 0.69 -> floor 0.55
    pq = pairs(ann_pq_topk(ds, q, qids, k=k))
    assert len(pq & exact) / len(exact) >= 0.55
    # finer 16x64 codebooks (2-d subspaces): measured 0.93 -> floor 0.8
    pq16 = pairs(ann_pq_topk(ds, q, qids, k=k, m_sub=16, n_codes=64))
    assert len(pq16 & exact) / len(exact) >= 0.8
    # partition invariance of the approximate result itself
    pq_1blk = pairs(ann_pq_topk(ray.data.from_arrow(t), q, qids, k=k))
    assert pq_1blk == pq


def test_concurrent_queries_shared_tree(ray_session):
    # reference concurrency semantics (tests/unit/test_concurrency.py:64,
    # :108, :148): many query workloads against ONE shared tree return
    # the same results as sequential runs and do not interfere. In the
    # engine the tree is immutable partitioned state, so this exercises
    # concurrent Ray Data executions over shared broadcast/actor state
    # from multiple driver threads.
    import concurrent.futures as cf

    ray = ray_session
    rng = np.random.default_rng(91)
    boxes = random_boxes(rng, 1500, edge=0.05)
    ids = np.arange(1500, dtype=np.int64)
    tree = RayPRTree(_boxes_ds(ray, boxes, ids), res=4, strict=False)

    workloads = []
    for w in range(4):
        qs = random_boxes(np.random.default_rng(100 + w), 80, edge=0.1)
        qids = np.arange(80, dtype=np.int64)
        workloads.append((qs, qids))

    sequential = [_query_set(tree, ray, qs, qids) for qs, qids in workloads]
    assert any(sequential)  # non-trivial results

    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(_query_set, tree, ray, qs, qids) for qs, qids in workloads
        ]
        concurrent = [f.result(timeout=120) for f in futs]
    assert concurrent == sequential
    # a second concurrent round is still identical (no state corruption)
    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(_query_set, tree, ray, qs, qids) for qs, qids in workloads
        ]
        assert [f.result(timeout=120) for f in futs] == sequential
