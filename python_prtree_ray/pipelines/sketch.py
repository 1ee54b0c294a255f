"""Distinct-count operators: exact distributed COUNT(DISTINCT) and a
HyperLogLog sketch — the approximate/scale twin.

- :func:`distinct_users` — exact per-key distinct count. Per-batch pair
  dedup prunes before the shuffle; a coarse hash-bucket groupby dedups
  globally and emits per-key partial counts; a final metadata-sized
  groupby sums them. Only (key, id) pairs ever shuffle.
- :func:`distinct_users_hll` — HyperLogLog (Flajolet et al. 2007), the
  sketch path: per-batch registers per key (elementwise max is the
  merge), one tiny groupby over (key, 2^p registers). Error ≈
  1.04/sqrt(2^p) ≈ 1.6% at p=12; registers are mergeable across any
  partitioning, so the shuffle volume is O(keys × 4 KB) regardless of
  row count — the 100-TB path when keys×ids no longer fit a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..config import COMBINE_BATCH, tune_context
from .text import hash_str_array

N_BUCKETS = 512


def _pair_hash(et_codes: np.ndarray, uid: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (et_codes * np.int64(1099511628211) + uid * np.int64(2654435761)) & np.int64(
            (1 << 62) - 1
        )


def distinct_users(
    events: Dataset, key_col: str = "event_type", id_col: str = "user_id"
) -> Dataset:
    """(event_type, n_users): exact distinct ``id_col`` count per key."""
    tune_context()

    def local_pairs(tbl: pa.Table) -> pa.Table:
        # dictionary-encode the low-cardinality key column in Arrow —
        # no Python-object or numpy-unicode materialization of the keys
        d = tbl.column(key_col).combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ph = _pair_hash(hash_str_array(d.dictionary)[codes], uid)
        order = np.lexsort((uid, codes))
        c_s, u_s, ph_s = codes[order], uid[order], ph[order]
        keep = np.ones(c_s.shape[0], dtype=bool)
        keep[1:] = (np.diff(c_s) != 0) | (np.diff(u_s) != 0)
        return pa.table(
            {
                key_col: d.dictionary.take(pa.array(c_s[keep])),
                id_col: u_s[keep],
                "b": ph_s[keep] % np.int64(N_BUCKETS),
            }
        )

    pairs = events.map_batches(
        local_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH)


    def count_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {key_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        d = group.column(key_col).combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, codes))
        c_s, u_s = codes[order], uid[order]
        keep = np.ones(c_s.shape[0], dtype=bool)
        keep[1:] = (np.diff(c_s) != 0) | (np.diff(u_s) != 0)
        cnt = np.bincount(c_s[keep], minlength=len(d.dictionary))
        return pa.table(
            {
                key_col: pa.compute.cast(d.dictionary, pa.string()),
                "n": cnt.astype(np.int64),
            }
        )

    partials = pairs.groupby("b").map_groups(count_bucket, batch_format="pyarrow")
    agg = partials.groupby(key_col).aggregate(Sum("n", alias_name="n_users"))
    return agg


HLL_P = 12  # 4096 registers → ~1.6% standard error


def _hll_registers(uid_hash: np.ndarray, codes: np.ndarray, n_keys: int) -> np.ndarray:
    """(n_keys, 2^p) max-rank registers from 62-bit id hashes."""
    m = 1 << HLL_P
    reg_idx = (uid_hash & np.int64(m - 1)).astype(np.int64)
    rest = (uid_hash >> np.int64(HLL_P)).astype(np.uint64)
    # rank = position of first set bit in the remaining 62-p bits (1-based);
    # all-zero rest gets the max rank (62-p)+1
    rank = np.full(uid_hash.shape[0], 62 - HLL_P + 1, dtype=np.int64)
    nz = rest != 0
    if nz.any():
        low = rest[nz]
        # count trailing zeros via de Bruijn-free float trick is lossy at
        # 64-bit — use bit_length of isolated lowest bit instead
        lowest = (low & (~low + np.uint64(1))).astype(np.uint64)
        rank[nz] = np.log2(lowest.astype(np.float64)).astype(np.int64) + 1
    flat = codes * np.int64(m) + reg_idx
    regs = np.zeros(n_keys * m, dtype=np.int8)
    np.maximum.at(regs, flat, rank.astype(np.int8))
    return regs.reshape(n_keys, m)


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.shape[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def distinct_users_hll(
    events: Dataset, key_col: str = "event_type", id_col: str = "user_id"
) -> Dataset:
    """(event_type, n_users_approx): HLL distinct estimate per key."""
    tune_context()

    def local_regs(tbl: pa.Table) -> pa.Table:
        d = tbl.column(key_col).combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # splitmix64 finalizer: a plain multiplicative hash preserves the
        # input's trailing-zero count, which biases HLL ranks badly
        with np.errstate(over="ignore"):
            h = uid.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
            uh = (h & np.uint64((1 << 62) - 1)).astype(np.int64)
        regs = _hll_registers(uh, codes, len(d.dictionary))
        # list column straight from the flat register buffer — one
        # offsets array, no per-row Python list objects
        from .dedup import _uniform_lists

        return pa.table(
            {
                key_col: pa.compute.cast(d.dictionary, pa.string()),
                "regs": _uniform_lists(regs, pa.int8()),
            }
        )

    partials = events.map_batches(
        local_regs, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH)


    def merge(group: pa.Table) -> pa.Table:
        # key cardinality is tiny (one group per event_type) — the per-key
        # map_groups rule does not apply to metadata-sized key spaces
        key = group.column(key_col)[0].as_py()
        col = group.column("regs").combine_chunks()
        # every list is exactly 2^p long — reshape the flat buffer
        regs = col.values.to_numpy(zero_copy_only=False).reshape(len(col), -1)
        merged = regs.max(axis=0)
        return pa.table(
            {
                key_col: pa.array([key], pa.string()),
                "n_users_approx": pa.array(
                    [int(round(_hll_estimate(merged)))], pa.int64()
                ),
            }
        )

    return partials.groupby(key_col).map_groups(merge, batch_format="pyarrow")
