"""Dataset constructors: testdata parquet → geometry-bearing Datasets.

Reads prune to the key column at the parquet reader (column pruning —
only the int64 key leaves storage), then derive deterministic geometry
via ``functions.derive`` inside ``map_batches`` (see that module for the
NumPy/SQL bit-equality contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions import derive


def _read_keys(sf_dir: str, table: str, key: str):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[key])


def boxes_dataset(
    sf_dir: str,
    table: str = "orders",
    key: str = "o_orderkey",
    dtype=np.float64,
):
    """Data-side boxes: (idx, xmin, ymin, xmax, ymax).

    ``dtype`` selects the coordinate precision (reference parity:
    PRTree auto-selects float32/float64 from the input array dtype,
    ``core.py:119-145``); every downstream stage is dtype-preserving, so
    a float32 table joins entirely in float32."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_boxes(k)
        return pa.table(
            {"idx": k.astype(np.int64), **{c: v.astype(dtype) for c, v in cols.items()}}
        )

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def query_boxes_dataset(
    sf_dir: str,
    table: str = "customer",
    key: str = "c_custkey",
    dtype=np.float64,
):
    """Probe-side regions: (query_id, xmin, ymin, xmax, ymax)."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_query_boxes(k)
        return pa.table(
            {
                "query_id": k.astype(np.int64),
                **{c: v.astype(dtype) for c, v in cols.items()},
            }
        )

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def points_dataset(sf_dir: str, table: str = "customer", key: str = "c_custkey"):
    """Probe points: (query_id, px, py)."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_points(k)
        return pa.table({"query_id": k.astype(np.int64), **cols})

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def points_3d_dataset(sf_dir: str, table: str = "supplier", key: str = "s_suppkey"):
    """3D probe points: (query_id, px, py, pz)."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_points_3d(k)
        return pa.table({"query_id": k.astype(np.int64), **cols})

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def points_4d_dataset(sf_dir: str, table: str = "supplier", key: str = "s_suppkey"):
    """4D probe points: (query_id, px, py, pz, pt)."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_points_4d(k)
        return pa.table({"query_id": k.astype(np.int64), **cols})

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def query_boxes_table(sf_dir: str, table: str = "customer", key: str = "c_custkey") -> pa.Table:
    """Driver-side pyarrow variant of :func:`query_boxes_dataset` for
    small probe sides headed straight into a broadcast join — skips the
    Ray Data pipeline (and its per-stage startup) entirely."""
    import pyarrow.parquet as pq

    k = (
        pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key])
        .column(key)
        .to_numpy(zero_copy_only=False)
    )
    cols = derive.derive_query_boxes(k)
    return pa.table({"query_id": k.astype(np.int64), **cols})


BOX3D_COLS = ("xmin", "ymin", "zmin", "xmax", "ymax", "zmax")


def boxes_3d_dataset(sf_dir: str, table: str = "orders", key: str = "o_orderkey"):
    """3D data boxes: (idx, xmin, ymin, zmin, xmax, ymax, zmax)."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_boxes_3d(k)
        return pa.table(
            {"idx": k.astype(np.int64), **{c: cols[c] for c in BOX3D_COLS}}
        )

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def query_boxes_3d_table(sf_dir: str, table: str = "customer", key: str = "c_custkey") -> pa.Table:
    """Driver-side 3D probe regions for broadcast joins."""
    import pyarrow.parquet as pq

    k = (
        pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key])
        .column(key)
        .to_numpy(zero_copy_only=False)
    )
    cols = derive.derive_query_boxes_3d(k)
    return pa.table(
        {"query_id": k.astype(np.int64), **{c: cols[c] for c in BOX3D_COLS}}
    )


BOX4D_COLS = ("xmin", "ymin", "zmin", "tmin", "xmax", "ymax", "zmax", "tmax")


def boxes_4d_dataset(sf_dir: str, table: str = "orders", key: str = "o_orderkey"):
    """4D data boxes: (idx, xmin, ymin, zmin, tmin, xmax, ymax, zmax, tmax)."""

    def der(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        cols = derive.derive_boxes_4d(k)
        return pa.table(
            {"idx": k.astype(np.int64), **{c: cols[c] for c in BOX4D_COLS}}
        )

    return _read_keys(sf_dir, table, key).map_batches(
        der, batch_format="pyarrow", zero_copy_batch=True
    )


def query_boxes_4d_table(sf_dir: str, table: str = "customer", key: str = "c_custkey") -> pa.Table:
    """Driver-side 4D probe regions for broadcast joins."""
    import pyarrow.parquet as pq

    k = (
        pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key])
        .column(key)
        .to_numpy(zero_copy_only=False)
    )
    cols = derive.derive_query_boxes_4d(k)
    return pa.table(
        {"query_id": k.astype(np.int64), **{c: cols[c] for c in BOX4D_COLS}}
    )
