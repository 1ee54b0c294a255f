"""Bitwise parity between the NumPy derivations and their SQL twins.

The driver's hash gate depends on ``functions.derive`` producing the
EXACT doubles DuckDB computes from the emitted SQL — this test evaluates
both renditions on random key columns and compares bit patterns, so any
drift in either side (formula shape, evaluation order, channel constants)
fails loudly before the driver sees it. No Ray session needed."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from python_prtree_ray.functions import derive


def _sql_eval(sql_body: str, keys: np.ndarray) -> dict[str, np.ndarray]:
    con = duckdb.connect()
    con.register("t", pa.table({"k": keys}))
    out = con.execute(f"SELECT * FROM ({sql_body})").fetch_arrow_table()
    return {
        name: out.column(name).to_numpy(zero_copy_only=False)
        for name in out.column_names
        if name not in ("idx", "query_id")
    }


CASES = [
    (derive.derive_boxes, lambda: derive.boxes_sql("t", "k", "idx")),
    (derive.derive_query_boxes, lambda: derive.query_boxes_sql("t", "k", "query_id")),
    (derive.derive_points, lambda: derive.points_sql("t", "k", "query_id")),
    (derive.derive_boxes_3d, lambda: derive.boxes_3d_sql("t", "k", "idx")),
    (
        derive.derive_query_boxes_3d,
        lambda: derive.query_boxes_3d_sql("t", "k", "query_id"),
    ),
    (derive.derive_boxes_4d, lambda: derive.boxes_4d_sql("t", "k", "idx")),
    (
        derive.derive_query_boxes_4d,
        lambda: derive.query_boxes_4d_sql("t", "k", "query_id"),
    ),
]


@pytest.mark.parametrize("np_fn,sql_fn", CASES, ids=[c[0].__name__ for c in CASES])
@pytest.mark.parametrize("seed", [0, 1])
def test_derive_matches_sql_bitwise(np_fn, sql_fn, seed):
    rng = np.random.default_rng(seed)
    # SQL-twin key domain: k * multiplier must fit int64 (DuckDB raises on
    # overflow; numpy would wrap) — documented bound in functions/derive.py
    kmax = (1 << 63) // max(a for a, _ in derive.CHANNELS) - 1
    keys = np.unique(
        np.concatenate(
            [
                rng.integers(0, 10**6, size=500),
                rng.integers(0, kmax, size=100),  # up to the domain bound
                np.array(
                    [0, 1, derive.MOD - 1, derive.MOD, 2 * derive.MOD + 7, kmax]
                ),
            ]
        )
    ).astype(np.int64)
    got = np_fn(keys)
    want = _sql_eval(sql_fn(), keys)
    assert set(got) == set(want)
    for col in got:
        a = got[col].view(np.uint64)
        b = want[col].astype(np.float64).view(np.uint64)
        bad = np.nonzero(a != b)[0]
        assert bad.size == 0, (col, keys[bad[:3]], got[col][bad[:3]], want[col][bad[:3]])


def test_tile_cell_matches_sql():
    rng = np.random.default_rng(5)
    x = rng.random(2000)
    y = rng.random(2000)
    # include boundary values that floor-clamp differently
    x[:4] = [0.0, 1.0, 0.999999999, 1e-12]
    y[:4] = [1.0, 0.0, 1e-12, 0.999999999]
    res = 6
    got = derive.tile_cell(x, y, res)
    con = duckdb.connect()
    con.register("p", pa.table({"px": x, "py": y}))
    want = (
        con.execute(f"SELECT {derive.tile_cell_sql('px', 'py', res)} AS c FROM p")
        .fetch_arrow_table()
        .column("c")
        .to_numpy(zero_copy_only=False)
    )
    assert np.array_equal(got, want)
