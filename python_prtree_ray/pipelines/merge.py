"""Shared coarse-bucket top-k merge.

(query_id, id, value) partials → (query_id, id, rank): shuffle on a
256-way query-hash bucket, then ONE vectorized lexsort + segment-rank
pass ranks every query in the bucket — never a per-query ``map_groups``
(one interpreter call per query would dominate at 1M queries). Used by
both the ANN merges (sim DESC) and the kNN merges (dist2 ASC).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH
from ..functions.buckets import bucket_of

N_QBUCKETS = 256


def bucketed_topk(
    partials: Dataset,
    k: int,
    id_col: str,
    value_col: str,
    descending: bool,
    keep_value: str | None = None,
) -> Dataset:
    """Exact global per-query top-k over (query_id, id, value) partials
    via ONE coarse query-bucket shuffle. ``keep_value`` names an output
    column that carries each kept row's value (e.g. the kNN distance);
    None preserves the classic (query_id, id, rank) shape."""

    def add_bucket(tbl: pa.Table) -> pa.Table:
        qv = tbl.column("query_id").to_numpy(zero_copy_only=False)
        return tbl.append_column("qb", pa.array(bucket_of(qv, N_QBUCKETS)))

    def merge(group: pa.Table) -> pa.Table:
        qv = group.column("query_id").to_numpy(zero_copy_only=False)
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        if qv.size == 0:
            cols = {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
            if keep_value is not None:
                cols[keep_value] = pa.array([], pa.float64())
            return pa.table(cols)
        order = np.lexsort((ids, -val if descending else val, qv))
        q_s, id_s = qv[order], ids[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(q_s))[0] + 1])
        sizes = np.diff(np.concatenate([starts, [q_s.shape[0]]]))
        rank = np.arange(q_s.shape[0]) - np.repeat(starts, sizes)
        keep = rank < k
        cols = {
            "query_id": pa.array(q_s[keep], pa.int64()),
            id_col: pa.array(id_s[keep], pa.int64()),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
        }
        if keep_value is not None:
            cols[keep_value] = pa.array(val[order][keep])
        return pa.table(cols)

    keyed = partials.map_batches(
        add_bucket,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return keyed.groupby("qb").map_groups(merge, batch_format="pyarrow")


_REDUCE_UFUNC = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def bucketed_sum(
    ds: Dataset,
    key_col: str,
    value_cols: tuple[str, ...],
    n_buckets: int = 512,
    reduce: str = "sum",
) -> Dataset:
    """Exact per-key int64 sums via ONE coarse-bucket shuffle: hash the
    key into ``n_buckets`` groups, then ONE vectorized lexsort +
    ``reduceat`` pass sums every key in the bucket. Replaces Ray's
    native sort-based ``groupby(key).aggregate(Sum)`` for
    HIGH-CARDINALITY keys, where the per-key machinery dominates (the
    same lesson as the top-k merge above — measured 3-6x on 100k+ key
    aggregations). Input rows should already be batch-combined partials.

    ``reduce`` picks the per-key fold: ``"sum"`` (default), ``"min"``,
    or ``"max"`` — all three are associative+commutative, so the
    batch-combined partials feeding this stage stay exact."""
    if reduce not in _REDUCE_UFUNC:
        raise ValueError(f"unsupported reduce={reduce!r}")
    ufunc = _REDUCE_UFUNC[reduce]

    def add_bucket(tbl: pa.Table) -> pa.Table:
        kv = tbl.column(key_col).to_numpy(zero_copy_only=False)
        return tbl.append_column("kb", pa.array(bucket_of(kv, n_buckets)))

    def reduce(group: pa.Table) -> pa.Table:
        kv = group.column(key_col).to_numpy(zero_copy_only=False)
        if kv.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in value_cols},
                }
            )
        order = np.argsort(kv, kind="stable")
        ks = kv[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        out = {key_col: pa.array(ks[starts], pa.int64())}
        for c in value_cols:
            v = group.column(c).to_numpy(zero_copy_only=False)[order]
            out[c] = pa.array(ufunc.reduceat(v, starts), pa.int64())
        return pa.table(out)

    keyed = ds.map_batches(
        add_bucket,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return keyed.groupby("kb").map_groups(reduce, batch_format="pyarrow")


def global_topk(
    ds: Dataset,
    k: int,
    id_col: str,
    value_col: str,
    descending: bool = True,
) -> Dataset:
    """GLOBAL top-k rows by ``(value, id)`` → ``(id, value, rank)``.

    The (value, id) order is total (ids unique by contract), so the
    global top-k is contained in the union of per-batch top-k's: each
    batch prunes to k rows map-side, and the final single-group merge
    sees only O(n_batches x k) rows — never the dataset. Deterministic
    ties: larger/smaller value first per ``descending``, then smaller id."""

    def local(tbl: pa.Table) -> pa.Table:
        val = tbl.column(value_col).to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -val if descending else val))[:k]
        return pa.table(
            {
                "g": np.zeros(order.shape[0], dtype=np.int8),
                id_col: ids[order],
                value_col: val[order],
            }
        )

    def final(group: pa.Table) -> pa.Table:
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -val if descending else val))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                value_col: val[order],
                "rank": np.arange(1, order.shape[0] + 1, dtype=np.int64),
            }
        )

    partials = ds.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return partials.groupby("g").map_groups(final, batch_format="pyarrow")


def grouped_topk(
    ds: Dataset,
    k: int,
    key_col: str,
    id_col: str,
    value_col: str,
    descending: bool = True,
    n_buckets: int = N_QBUCKETS,
) -> Dataset:
    """Per-KEY top-k rows by ``(value, id)`` → ``(key, id, value, rank)``.

    The generic "top k per group" primitive (reference semantics: SQL
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY value, id) <= k``).
    Scale shape: every batch prunes to k rows PER KEY map-side (one
    lexsort + segment-rank pass, no per-key Python), so the coarse
    key-hash shuffle ships at most ``k x keys_in_batch`` rows per batch;
    the per-bucket merge reruns the identical pass over the pruned
    union. Values pass through untouched (any numeric dtype)."""

    def topk_pass(tbl: pa.Table, emit_rank: bool) -> pa.Table:
        kv = tbl.column(key_col).to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        val = tbl.column(value_col).to_numpy(zero_copy_only=False)
        if kv.size == 0:
            cols = {
                key_col: pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                value_col: tbl.column(value_col).slice(0, 0),
            }
            if emit_rank:
                cols["rank"] = pa.array([], pa.int64())
            else:
                cols["kb"] = pa.array([], pa.int64())
            return pa.table(cols)
        order = np.lexsort((ids, -val if descending else val, kv))
        k_s = kv[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        sizes = np.diff(np.r_[starts, k_s.shape[0]])
        rank = np.arange(k_s.shape[0]) - np.repeat(starts, sizes)
        keep = rank < k
        w = order[keep]
        cols = {
            key_col: pa.array(k_s[keep], pa.int64()),
            id_col: pa.array(ids[w], pa.int64()),
            value_col: tbl.column(value_col).take(pa.array(w)),
        }
        if emit_rank:
            cols["rank"] = pa.array(rank[keep] + 1, pa.int64())
        else:
            cols["kb"] = pa.array(bucket_of(k_s[keep], n_buckets))
        return pa.table(cols)

    pruned = ds.map_batches(
        lambda t: topk_pass(t, emit_rank=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return pruned.groupby("kb").map_groups(
        lambda g: topk_pass(g.drop_columns(["kb"]), emit_rank=True),
        batch_format="pyarrow",
    )
