"""Wide scan-heavy aggregates over the fact tables.

Both operators here follow the engine's standard reduce shape: a
map-side combine inside ``map_batches`` collapses each batch to a
handful of partial rows (integer-cents arithmetic so float sums stay
order-independent and bitwise-comparable to the SQL oracle), then the
shared coarse-bucket reduce (:func:`..pipelines.merge.bucketed_sum`)
finishes the fold — raw fact rows never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from .merge import bucketed_sum

_TS_MAX = np.int64(np.iinfo(np.int64).max)


def pricing_summary(lineitem: Dataset, cutoff: str = "1998-09-02") -> Dataset:
    """TPC-H Q1-shaped pricing summary: per (l_returnflag, l_linestatus)
    over rows shipped on/before ``cutoff`` —

    ``(l_returnflag, l_linestatus, sum_qty_c, sum_price_c,
    sum_disc_price_c, sum_charge_c, avg_qty_c, avg_price_c, count_order)``

    All money/quantity columns are integer hundredths
    (``FLOOR(x * 100)`` per row, summed as int64) so the distributed sum
    is exact and order-independent — the same cents convention as the
    revenue composites. ``avg_*_c`` are integer divisions of those sums
    (semantics defined identically in the SQL twin).

    Scale shape: per-batch combine to ≤6 partial rows (the key space is
    the flag×status product), ONE tiny bucketed reduce, no raw-row
    shuffle. The dominant cost is the pruned 7-column scan.
    """
    tune_context()
    cut = np.datetime64(cutoff, "us").astype(np.int64)

    def combine(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("l_shipdate").cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        keep = ts <= cut
        flag = tbl.column("l_returnflag").combine_chunks().dictionary_encode()
        stat = tbl.column("l_linestatus").combine_chunks().dictionary_encode()
        # single-char domains: key on the actual byte values so the key
        # is globally stable (dictionary codes are batch-local)
        fb = np.array(
            [ord(s[0]) if s else 0 for s in flag.dictionary.to_pylist()],
            dtype=np.int64,
        )[flag.indices.to_numpy(zero_copy_only=False)]
        sb = np.array(
            [ord(s[0]) if s else 0 for s in stat.dictionary.to_pylist()],
            dtype=np.int64,
        )[stat.indices.to_numpy(zero_copy_only=False)]
        key = (fb * 256 + sb)[keep]
        qty = tbl.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        tax = tbl.column("l_tax").to_numpy(zero_copy_only=False)[keep]
        qty_c = np.floor(qty * 100.0).astype(np.int64)
        price_c = np.floor(ep * 100.0).astype(np.int64)
        disc_price_c = np.floor((ep * (1.0 - disc)) * 100.0).astype(np.int64)
        charge_c = np.floor(((ep * (1.0 - disc)) * (1.0 + tax)) * 100.0).astype(
            np.int64
        )
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size]) if ks.size else (
            np.array([], dtype=np.int64)
        )
        if ks.size == 0:
            return pa.table(
                {
                    "gkey": pa.array([], pa.int64()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in (
                            "sum_qty_c",
                            "sum_price_c",
                            "sum_disc_price_c",
                            "sum_charge_c",
                            "count_order",
                        )
                    },
                }
            )
        return pa.table(
            {
                "gkey": pa.array(ks[starts], pa.int64()),
                "sum_qty_c": np.add.reduceat(qty_c[order], starts),
                "sum_price_c": np.add.reduceat(price_c[order], starts),
                "sum_disc_price_c": np.add.reduceat(disc_price_c[order], starts),
                "sum_charge_c": np.add.reduceat(charge_c[order], starts),
                "count_order": np.add.reduceat(
                    np.ones(ks.shape[0], dtype=np.int64), starts
                ),
            }
        )

    partials = lineitem.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    summed = bucketed_sum(
        partials,
        "gkey",
        (
            "sum_qty_c",
            "sum_price_c",
            "sum_disc_price_c",
            "sum_charge_c",
            "count_order",
        ),
        n_buckets=8,
    )

    def finish(tbl: pa.Table) -> pa.Table:
        k = tbl.column("gkey").to_numpy(zero_copy_only=False)
        n = tbl.column("count_order").to_numpy(zero_copy_only=False)
        sq = tbl.column("sum_qty_c").to_numpy(zero_copy_only=False)
        sp = tbl.column("sum_price_c").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": pa.array([chr(int(v) >> 8) for v in k], pa.string()),
                "l_linestatus": pa.array([chr(int(v) & 255) for v in k], pa.string()),
                "sum_qty_c": tbl.column("sum_qty_c"),
                "sum_price_c": tbl.column("sum_price_c"),
                "sum_disc_price_c": tbl.column("sum_disc_price_c"),
                "sum_charge_c": tbl.column("sum_charge_c"),
                "avg_qty_c": pa.array(sq // np.maximum(n, 1), pa.int64()),
                "avg_price_c": pa.array(sp // np.maximum(n, 1), pa.int64()),
                "count_order": tbl.column("count_order"),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def mapped_rollup(
    facts: Dataset,
    key_col: str,
    float_col: str,
    key_map: dict[int, int],
) -> Dataset:
    """Snowflake-dimension rollup: map each fact row's int key through a
    small driver-built dict (the pre-joined dimension chain, e.g.
    nation→region) and emit ``(gkey, n_rows, sum_c)`` per group, where
    ``sum_c`` is the exact integer-cents sum of ``float_col``.

    Scale shape: the dimension chain is metadata-sized by definition
    (that's what makes it a dimension), so it rides the task closure; the
    fact table never shuffles — per-batch reduceat partials feed one tiny
    bucketed reduce. Unmapped keys raise (a fact pointing at a missing
    dimension row is data corruption, not a droppable row).
    """
    tune_context()
    max_key = max(key_map) if key_map else -1
    lut = np.full(max_key + 2, -1, dtype=np.int64)
    for k, v in key_map.items():
        lut[k] = v

    def combine(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size and (k.min() < 0 or k.max() > max_key):
            raise ValueError(f"{key_col} outside the dimension key range")
        g = lut[k]
        if k.size and g.min() < 0:
            raise ValueError(f"{key_col} value missing from the dimension map")
        v_c = np.floor(
            tbl.column(float_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(g, kind="stable")
        gs = g[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]][: gs.size]) if gs.size else (
            np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "gkey": pa.array(gs[starts], pa.int64()),
                "n_rows": pa.array(
                    np.diff(np.r_[starts, gs.shape[0]]), pa.int64()
                ),
                "sum_c": pa.array(np.add.reduceat(v_c[order], starts), pa.int64())
                if gs.size
                else pa.array([], pa.int64()),
            }
        )

    partials = facts.select_columns([key_col, float_col]).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return bucketed_sum(partials, "gkey", ("n_rows", "sum_c"), n_buckets=8)


def funnel_counts(
    events: Dataset,
    stages: tuple[str, ...] = ("signup", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> Dataset:
    """Ordered-funnel user counts: one row ``(n_stage1, n_stage1_2, ...,
    n_full)`` — how many users reached each prefix of ``stages`` in
    strict first-occurrence time order (``min ts`` of stage i+1 strictly
    after ``min ts`` of stage i).

    Scale shape: per-batch partial MIN-per-(user, stage) combine, one
    bucketed min-reduce keyed on user (the only all-to-all, rows =
    distinct users per batch), then a trivially small count fold — the
    classic two-level funnel with no raw-event shuffle.
    """
    tune_context()
    cols = [f"t{i}" for i in range(len(stages))]

    def combine(tbl: pa.Table) -> pa.Table:
        uid = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = tbl.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        tcol = tbl.column(type_col)
        per_stage = [
            np.where(
                pc.equal(tcol, s).to_numpy(zero_copy_only=False), ts, _TS_MAX
            )
            for s in stages
        ]
        order = np.argsort(uid, kind="stable")
        us = uid[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]][: us.size]) if us.size else (
            np.array([], dtype=np.int64)
        )
        if us.size == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in cols},
                }
            )
        out = {user_col: pa.array(us[starts], pa.int64())}
        for c, v in zip(cols, per_stage):
            out[c] = pa.array(np.minimum.reduceat(v[order], starts), pa.int64())
        return pa.table(out)

    partials = events.select_columns([user_col, ts_col, type_col]).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    mins = bucketed_sum(partials, user_col, tuple(cols), reduce="min")

    def count(tbl: pa.Table) -> pa.Table:
        t = [tbl.column(c).to_numpy(zero_copy_only=False) for c in cols]
        reached = t[0] < _TS_MAX
        counts = [int(reached.sum())]
        for i in range(1, len(stages)):
            reached = reached & (t[i] < _TS_MAX) & (t[i] > t[i - 1])
            counts.append(int(reached.sum()))
        names = ["n_stage%d" % (i + 1) for i in range(len(stages))]
        return pa.table(
            {
                "g": pa.array([0], pa.int8()),
                **{
                    nm: pa.array([c], pa.int64()) for nm, c in zip(names, counts)
                },
            }
        )

    names = tuple("n_stage%d" % (i + 1) for i in range(len(stages)))
    folded = mins.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
    summed = bucketed_sum(folded, "g", names, n_buckets=1)
    return summed.select_columns(list(names))


def skyline(points: Dataset, id_col: str = "query_id") -> Dataset:
    """2-D skyline (Pareto frontier, minimizing both coordinates):
    the points no other point dominates (``px' ≤ px ∧ py' ≤ py`` with
    at least one strict) — ``(query_id, px, py)``; duplicate skyline
    points all survive (no strict inequality between equals). The
    classic distributed-analytics frontier query (cheapest-AND-closest
    style tradeoff sets).

    Scale shape: the skyline of a union is the skyline of the unions'
    skylines, so each batch collapses to its LOCAL skyline with one
    lexsort + prefix-min scan (for n uniform points the expected
    skyline is ~ln n rows), and the driver re-runs the same scan over
    the tiny candidate union — raw points never shuffle, no groupby
    at all. Adversarially anti-correlated data (skyline ≈ n) degrades
    the fold to the input size; that shape is inherent to the query,
    not the plan.
    """
    import numpy as np

    def _local(px, py, ids):
        order = np.lexsort((py, px))
        pxs, pys, ids_s = px[order], py[order], ids[order]
        pref_before = np.r_[np.inf, np.minimum.accumulate(pys)[:-1]]
        grp_start = np.r_[True, pxs[1:] != pxs[:-1]][: pxs.size]
        gs = np.flatnonzero(grp_start)
        counts = np.diff(np.r_[gs, pxs.size])
        m1 = np.repeat(pref_before[gs], counts)  # min py with px' < px
        gmin = np.repeat(pys[gs], counts)  # min py within equal px
        keep = (pys < m1) & (pys == gmin)
        return ids_s[keep], pxs[keep], pys[keep]

    def local_skyline(tbl: pa.Table) -> pa.Table:
        px = tbl.column("px").to_numpy(zero_copy_only=False)
        py = tbl.column("py").to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        i, x, y = _local(px, py, ids)
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                "px": pa.array(x, pa.float64()),
                "py": pa.array(y, pa.float64()),
            }
        )

    import ray

    cand = points.map_batches(
        local_skyline,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    tables = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not tables:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "px": pa.array([], pa.float64()),
                    "py": pa.array([], pa.float64()),
                }
            )
        )
    allc = pa.concat_tables(tables)
    i, x, y = _local(
        allc.column("px").to_numpy(zero_copy_only=False),
        allc.column("py").to_numpy(zero_copy_only=False),
        allc.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64),
    )
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                "px": pa.array(x, pa.float64()),
                "py": pa.array(y, pa.float64()),
            }
        )
    )


def skyline_sql(points_cte: str) -> str:
    """DuckDB twin of :func:`skyline` — textbook NOT EXISTS dominance."""
    return f"""
WITH p AS ({points_cte})
SELECT a.query_id, a.px, a.py FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.px <= a.px AND b.py <= a.py
    AND (b.px < a.px OR b.py < a.py)
)
"""


def above_group_mean(
    ds: Dataset,
    key_col: str,
    id_col: str,
    cents_col: str,
    n_buckets: int = 256,
) -> Dataset:
    """Rows strictly above their GROUP's mean — the correlated-
    aggregate filter (``WHERE v > AVG(v) OVER (PARTITION BY key)``):
    ``(id, key, cents)``. Exact with NO division: ``v > sum/n`` is
    evaluated as the integer cross-multiplication ``v·n > sum``.

    Scale shape: ONE key-bucket shuffle; each group lands whole in one
    bucket, so the fold computes per-group (sum, n) via reduceat and
    filters in the same pass — the aggregate and the re-join never pay
    a second shuffle. All int64 (``|cents|·n`` must fit — callers with
    billion-row groups should pre-scale).
    """
    tune_context()
    from ..functions.buckets import bucket_of

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": bucket_of(k, n_buckets),
                key_col: k,
                id_col: tbl.column(id_col),
                cents_col: tbl.column(cents_col),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    cents_col: pa.array([], pa.int64()),
                }
            )
        v = group.column(cents_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k_s, v_s, i_s = k[order], v[order], ids[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        sizes = np.diff(np.r_[starts, k_s.size])
        s = np.repeat(np.add.reduceat(v_s, starts), sizes)
        n = np.repeat(sizes.astype(np.int64), sizes)
        keep = v_s * n > s
        return pa.table(
            {id_col: i_s[keep], key_col: k_s[keep], cents_col: v_s[keep]}
        )

    keyed = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
