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


def stratified_sample_sql(key: str, strata: str, rates_pct: dict[str, int]) -> str:
    a, b = derive.CHANNELS[SAMPLE_CHANNEL]
    whens = " ".join(
        f"WHEN '{s}' THEN {derive.MOD * int(r) // 100}"
        for s, r in sorted(rates_pct.items())
    )
    return f"(({key} * {a} + {b}) % {derive.MOD}) < (CASE {strata} {whens} ELSE 0 END)"
