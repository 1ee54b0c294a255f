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
