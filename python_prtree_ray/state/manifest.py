"""Partitioned persistence + checkpoint/resume manifests.

Replaces the reference's whole-tree cereal blob (``prtree.h:119-149``)
with a layout that survives partial failure and resumes at partition
granularity (north-rule: "resumable from checkpoint at partition
granularity, per-partition lineage + metrics"):

    <path>/manifest.json      {version, res, partitions: {pkey: {file,
                               rows, status}}, metrics}
    <path>/part-<pkey>.parquet  one file per coarse spatial partition

A resumed run reads the manifest, skips partitions marked done, and
recomputes only the missing ones — the writer filters the INPUT by
pending partition before any compute, so finished work costs nothing.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from ..functions import cells as cellmod
from ..stages import spatial as st

MANIFEST = "manifest.json"


def _partition_of_boxes(tbl: pa.Table, coarse_res: int) -> np.ndarray:
    b = st.boxes_np(tbl)
    return cellmod.cell_of_points(b[:, 0], b[:, 1], coarse_res)


def _load_manifest(path: str) -> dict:
    f = os.path.join(path, MANIFEST)
    if os.path.exists(f):
        with open(f) as fh:
            return json.load(fh)
    return {"version": 1, "partitions": {}, "metrics": {}}


def _store_manifest(path: str, man: dict) -> None:
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST))


def write_partitioned(
    ds: Dataset,
    path: str,
    partition_fn,
    coarse_res: int,
    resume: bool = True,
    extra: dict | None = None,
) -> dict:
    """Write ``ds`` as one parquet file per coarse partition, updating the
    manifest per finished partition (lineage: rows, partition key, wall
    time). Already-done partitions are skipped on resume.

    ``partition_fn(table) -> int64 array`` assigns each row a partition.
    The per-partition repartitioning itself is a groupby shuffle — the
    rows were going to disk anyway; this just keys the files.
    """
    os.makedirs(path, exist_ok=True)
    man = _load_manifest(path)
    if not resume and man["partitions"]:
        # fresh run: drop prior partition entries AND their files so a
        # stale partition (whose key never reappears) can't survive into
        # the new result set
        for v in man["partitions"].values():
            if v.get("file"):
                try:
                    os.remove(os.path.join(path, v["file"]))
                except FileNotFoundError:
                    pass
        man["partitions"] = {}
        man.pop("schema_hex", None)  # a fresh run may carry a new schema
        _store_manifest(path, man)
    if extra:
        man.update(extra)
    done = {int(k) for k, v in man["partitions"].items() if v.get("status") == "done"}

    def tag(tbl: pa.Table) -> pa.Table:
        p = partition_fn(tbl)
        keep = ~np.isin(p, np.fromiter(done, dtype=np.int64)) if done else None
        out = tbl.append_column("__part", pa.array(p, type=pa.int64()))
        if keep is not None:
            out = out.filter(pa.array(keep))
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def write_group(group: pa.Table) -> pa.Table:
        pkey = int(group.column("__part")[0].as_py())
        body = group.drop_columns(["__part"])
        t0 = time.time()
        fname = os.path.join(path, f"part-{pkey:012d}.parquet")
        pq.write_table(body, fname + ".tmp")
        os.replace(fname + ".tmp", fname)
        # order-independent row-set checksum over the first int64-castable
        # column — lets a resume/audit detect partition content drift
        ck = np.uint64(0)
        for name in body.column_names:
            col = body.column(name)
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.int64)
                with np.errstate(over="ignore"):
                    h = v.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    h ^= h >> np.uint64(29)
                    if v.size:
                        ck = np.bitwise_xor.reduce(h)
                break
        return pa.table(
            {
                "part": pa.array([pkey], type=pa.int64()),
                "rows": pa.array([body.num_rows], type=pa.int64()),
                "bytes": pa.array([os.path.getsize(fname)], type=pa.int64()),
                "checksum": pa.array([int(ck)], type=pa.uint64()),
                "secs": pa.array([time.time() - t0], type=pa.float64()),
                # serialized Arrow schema — lets read_partitioned return a
                # correctly-typed EMPTY Dataset when no partition produced
                # rows (e.g. an empty query side)
                "schema_hex": pa.array(
                    [body.schema.serialize().to_pybytes().hex()], type=pa.string()
                ),
            }
        )

    stats = tagged.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    # stream the per-partition stats and checkpoint the manifest as they
    # land — a crash mid-run loses at most FLUSH_EVERY finished
    # partitions' bookkeeping (their files are still on disk and simply
    # get rewritten), never the whole run's progress
    FLUSH_EVERY = 16
    pending_flush = 0
    man["coarse_res"] = coarse_res
    for r in stats.iter_rows():
        man["schema_hex"] = r["schema_hex"]  # one run == one schema
        man["partitions"][str(int(r["part"]))] = {
            "file": f"part-{int(r['part']):012d}.parquet",
            "rows": int(r["rows"]),
            "bytes": int(r["bytes"]),
            "checksum": int(r["checksum"]),
            "secs": float(r["secs"]),
            "status": "done",
        }
        pending_flush += 1
        if pending_flush >= FLUSH_EVERY:
            man["updated_at"] = time.time()
            _store_manifest(path, man)
            pending_flush = 0
    man["updated_at"] = time.time()
    # manifest-level rollup metrics (per-partition lineage stays per-entry)
    parts = man["partitions"].values()
    man["metrics"] = {
        "n_partitions": len(man["partitions"]),
        "total_rows": sum(p["rows"] for p in parts),
        "total_bytes": sum(p.get("bytes", 0) for p in parts),
    }
    # Ray's own per-stage execution report (operator wall times, block
    # counts, spill) — the "per-stage metrics" half of the north rule's
    # lineage+metrics contract. Best-effort: a stats failure must never
    # fail the write it describes.
    try:
        man["metrics"]["stage_stats"] = stats.stats()
    except Exception:
        pass
    _store_manifest(path, man)
    return man


def read_partitioned(path: str, verify: bool = False) -> Dataset:
    """Lazy Dataset over the done partitions. ``verify=True`` audits the
    manifest against the files (existence + parquet metadata row counts —
    metadata-only, no data read) and raises on drift, so a resume never
    silently builds on a corrupt checkpoint."""
    man = _load_manifest(path)
    entries = [
        v
        for v in man["partitions"].values()
        if v.get("status") == "done" and v.get("file")
    ]
    files = [os.path.join(path, v["file"]) for v in entries]
    if not files:
        # every partition completed without output (e.g. empty query side):
        # return a typed empty Dataset instead of read_parquet([]) raising
        if man.get("schema_hex"):
            schema = pa.ipc.read_schema(
                pa.py_buffer(bytes.fromhex(man["schema_hex"]))
            )
            return ray.data.from_arrow(schema.empty_table())
        return ray.data.from_arrow(pa.table({}))
    if verify:
        for v, f in zip(entries, files):
            if not os.path.exists(f):
                raise ValueError(f"checkpoint partition missing: {f}")
            n = pq.read_metadata(f).num_rows
            if n != v["rows"]:
                raise ValueError(
                    f"checkpoint partition {f} has {n} rows, manifest says {v['rows']}"
                )
    return ray.data.read_parquet(files)


def save_tree(ds: Dataset, path: str, res: int, coarse_res: int = 2) -> dict:
    """RayPRTree persistence: partition box rows by their min-corner coarse
    cell (min corner ⇒ each row in exactly one partition)."""
    return write_partitioned(
        ds,
        path,
        lambda t: _partition_of_boxes(t, coarse_res),
        coarse_res,
        extra={"kind": "prtree", "res": res},
    )


def load_tree(path: str):
    man = _load_manifest(path)
    if man.get("kind") != "prtree":
        raise ValueError(f"No PRTree manifest at {path}")
    return read_partitioned(path), int(man["res"])
