"""Deterministic sampling — hash-gated, not RNG-gated.

``hash_sample`` keeps a row iff ``(key * a + b) % MOD < rate``; the same
multiply-mod family as :mod:`..functions.derive`, so the SQL oracle is a
one-line WHERE clause and the sample is identical at any parallelism,
block order, or cluster size (an RNG-based sample is none of those).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions import derive
from ..config import COMBINE_BATCH

SAMPLE_CHANNEL = 7


def hash_sample(ds: Dataset, key_col: str, rate_pct: int) -> Dataset:
    """Keep ~rate_pct% of rows, selected by key hash (deterministic)."""
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    cut = derive.MOD * rate_pct // 100

    def pick(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.filter(pa.array((k * a + b) % derive.MOD < cut))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample_sql(key: str, rate_pct: int) -> str:
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    cut = derive.MOD * rate_pct // 100
    return f"(({key} * {a} + {b}) % {derive.MOD}) < {cut}"


def weighted_sample(
    ds: Dataset, key_col: str, weight_col: str, divisor: int = 5, cap_pct: int = 100
) -> Dataset:
    """Weight-proportional deterministic sampling: a row's keep
    probability is ``min(weight // divisor, cap_pct)`` percent — e.g.
    length-proportional document sampling ("long docs are rarer, keep
    them all; short ones thin out"). Same hash-gate family as
    :func:`hash_sample`: parallelism-invariant, pure integer arithmetic,
    one-line SQL twin."""
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    mod = derive.MOD

    def pick(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = tbl.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pct = np.minimum(w // np.int64(divisor), np.int64(cap_pct))
        return tbl.filter(pa.array((k * a + b) % mod < mod * pct // 100))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample_sql(
    key: str, weight: str, divisor: int = 5, cap_pct: int = 100
) -> str:
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    return (
        f"(({key} * {a} + {b}) % {derive.MOD}) < "
        f"({derive.MOD} * LEAST({weight} // {divisor}, {cap_pct}) // 100)"
    )


def stratified_sample(
    ds: Dataset, key_col: str, strata_col: str, rates_pct: dict[str, int]
) -> Dataset:
    """Per-stratum deterministic sampling: stratum s keeps ~rates_pct[s]%
    of its rows by key hash (strata absent from the map keep nothing).
    Hash-gated like :func:`hash_sample`, so the sample is identical at
    any parallelism and the SQL twin is a CASE-driven WHERE clause."""
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    items = sorted(rates_pct.items())
    names = np.array([k for k, _ in items])
    cuts = np.array(
        [derive.MOD * int(r) // 100 for _, r in items], dtype=np.int64
    )

    def pick(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # dictionary-encode: only the (tiny) distinct-strata dictionary is
        # materialized as Python strings, never the full column
        col = tbl.column(strata_col).combine_chunks()
        d = col.dictionary_encode()
        is_null = pc.is_null(col).to_numpy(zero_copy_only=False)
        codes = d.indices.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        dic = np.asarray(d.dictionary.to_pylist() + [""])  # [""] pads empty dict
        pos = np.searchsorted(names, dic)
        pos_c = np.clip(pos, 0, names.shape[0] - 1)
        known_d = names[pos_c] == dic
        cut_d = np.where(known_d, cuts[pos_c], 0)
        # null strata keep nothing — the SQL twin's CASE ... ELSE 0
        cut = np.where(is_null, 0, cut_d[codes])
        return tbl.filter(pa.array((k * a + b) % derive.MOD < cut))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def sample_per_key(
    ds: Dataset,
    key_col: str,
    id_col: str,
    n: int,
    n_buckets: int = 256,
) -> Dataset:
    """Deterministic per-key cap: keep the ``n`` rows of each key with the
    SMALLEST ``(id * a + b) % MOD`` hash (ties broken by id) — the
    "at most n documents per domain" primitive of training-data
    pipelines, hash-gated so the sample is identical at any parallelism.

    Scale shape: map-side combine keeps <= n rows per key per batch
    BEFORE the shuffle (global top-n per key == top-n of the union of
    per-batch top-n), so shuffle volume is O(keys x n) per block, never
    the corpus; the reduce groups by a coarse key-hash bucket and ranks
    every key in the bucket in one lexsort pass. Emits (key, id)."""
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]

    def _top_n(tbl: pa.Table) -> pa.Table:
        d = tbl.column(key_col).combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * a + b) % derive.MOD
        order = np.lexsort((ids, h, codes))
        c_s = codes[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(c_s))[0] + 1])
        sizes = np.diff(np.concatenate([starts, [c_s.shape[0]]]))
        rank = np.arange(c_s.shape[0]) - np.repeat(starts, sizes)
        keep = order[rank < n]
        return pa.table(
            {
                key_col: tbl.column(key_col).take(pa.array(keep)),
                id_col: ids[keep],
            }
        )

    def local(tbl: pa.Table) -> pa.Table:
        from .text import hash_str_array

        out = _top_n(tbl)
        bucket = hash_str_array(out.column(key_col)) % np.int64(n_buckets)
        return out.append_column("kb", pa.array(bucket))

    combined = ds.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        return _top_n(group)

    return combined.groupby("kb").map_groups(reduce_bucket, batch_format="pyarrow")


def stratified_sample_sql(key: str, strata: str, rates_pct: dict[str, int]) -> str:
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    whens = " ".join(
        f"WHEN '{s}' THEN {derive.MOD * int(r) // 100}"
        for s, r in sorted(rates_pct.items())
    )
    return f"(({key} * {a} + {b}) % {derive.MOD}) < (CASE {strata} {whens} ELSE 0 END)"
