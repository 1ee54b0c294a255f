"""Grouped exact-moment statistics and histograms.

The descriptive-statistics ops of an analytics pipeline, in the repo's
integer-exact convention (``FLOOR(x * scale)`` per row, int64 sums) so
distributed results are order- and partitioning-independent and the SQL
oracles match bit-for-bit. ``sum_sq_c`` gives variance/stddev (and with
a second column, covariance/correlation) as driver-side post-processing
of a key-cardinality-sized result.

Scale shape: a metadata-sized vocabulary pass maps the string key to a
small int code (the `event_transitions` pattern); each batch collapses
to ≤|vocab| (or |vocab|·bins) partial rows via one argsort + reduceat
pass; ONE tiny coarse-bucket fold merges mixed sum/min/max columns.
Raw rows never shuffle. Reference parity: none (beyond-reference
analytics surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of


def grouped_moments(
    ds: Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
    n_buckets: int = 64,
) -> Dataset:
    """Per-key exact integer moments over ``FLOOR(value * scale)``:
    ``(key, n, sum_c, sum_sq_c, min_c, max_c)``."""
    tune_context()
    import pyarrow.compute as pc

    from .movement import distinct_strings

    keys = distinct_strings(ds, key_col)
    karr = pa.array(keys, pa.string())

    def combine(tbl: pa.Table) -> pa.Table:
        code = (
            pc.index_in(tbl.column(key_col), value_set=karr)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        c = np.floor(v * scale).astype(np.int64)
        order = np.argsort(code)
        code_s, c_s = code[order], c[order]
        starts = np.flatnonzero(np.r_[True, code_s[1:] != code_s[:-1]][: code_s.size])
        k = code_s[starts]
        return pa.table(
            {
                "code": k,
                "n": np.diff(np.r_[starts, code_s.size]).astype(np.int64),
                "sum_c": np.add.reduceat(c_s, starts),
                "sum_sq_c": np.add.reduceat(c_s * c_s, starts),
                "min_c": np.minimum.reduceat(c_s, starts),
                "max_c": np.maximum.reduceat(c_s, starts),
                "bucket": bucket_of(k, n_buckets),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        code = group.column("code").to_numpy(zero_copy_only=False)
        if code.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in ("n", "sum_c", "sum_sq_c", "min_c", "max_c")
                    },
                }
            )
        order = np.argsort(code)
        code_s = code[order]
        starts = np.flatnonzero(np.r_[True, code_s[1:] != code_s[:-1]][: code_s.size])
        out = {key_col: karr.take(pa.array(code_s[starts], pa.int64()))}
        for c, uf in (
            ("n", np.add),
            ("sum_c", np.add),
            ("sum_sq_c", np.add),
            ("min_c", np.minimum),
            ("max_c", np.maximum),
        ):
            v = group.column(c).to_numpy(zero_copy_only=False)[order]
            out[c] = uf.reduceat(v, starts)
        return pa.table(out)

    partials = ds.map_batches(
        combine,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return partials.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def value_histogram(
    ds: Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    scale: int = 100,
    bin_width_c: int = 5000,
    n_bins: int = 10,
) -> Dataset:
    """Per-key fixed-width histogram of ``FLOOR(value * scale)``:
    ``(key, bin, n)`` for non-empty bins, with the top bin clamped
    (``bin = min(max(c // bin_width_c, 0), n_bins - 1)``)."""
    tune_context()
    import pyarrow.compute as pc

    from .merge import bucketed_sum
    from .movement import distinct_strings

    keys = distinct_strings(ds, key_col)
    karr = pa.array(keys, pa.string())
    nb = np.int64(n_bins)

    def combine(tbl: pa.Table) -> pa.Table:
        code = (
            pc.index_in(tbl.column(key_col), value_set=karr)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        c = np.floor(v * scale).astype(np.int64)
        b = np.clip(c // bin_width_c, 0, nb - 1)
        key, n = np.unique(code * nb + b, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    partials = ds.map_batches(
        combine,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    summed = bucketed_sum(partials, key_col="key", value_cols=("n",), n_buckets=64)

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: karr.take(pa.array(key // nb, pa.int64())),
                "bin": key % nb,
                "n": tbl.column("n"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
