"""Shared coarse-bucket kernels — the engine-wide reduce pattern.

Every high-cardinality reduce in this engine groups by a COARSE hash
bucket (one interpreter call per bucket) instead of per key; these are
the single implementations of the bucket hash and the blocked
upper-triangle pair sweep that several pipelines previously inlined.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

MOD = np.int64(1000000007)
MULT = np.int64(2654435761)


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic coarse bucket id for int64 keys."""
    return (keys * MULT % MOD) % np.int64(n_buckets)


def blocked_triangle(n: int, cap: int) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Index blocks covering the strict upper triangle of an n×n pair
    matrix, each block at most cap×cap — lets oversized groups fall back
    to exact blocked sweeps instead of silent drops."""
    for s0 in range(0, n, cap):
        e0 = min(s0 + cap, n)
        for s1 in range(s0, n, cap):
            e1 = min(s1 + cap, n)
            if s0 == s1:
                ia, ib = np.triu_indices(e0 - s0, k=1)
                yield ia + s0, ib + s0
            else:
                ia, ib = np.meshgrid(
                    np.arange(s0, e0), np.arange(s1, e1), indexing="ij"
                )
                yield ia.ravel(), ib.ravel()
