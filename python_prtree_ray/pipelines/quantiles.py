"""Exact distributed quantiles over integer-valued measures.

Shape: per-batch (key, value) COUNTS pre-aggregate inside ``map_batches``
(the combiner), so the shuffle carries one row per distinct (key, value)
per batch — bounded by value cardinality, not row count. The per-key
merge then walks the merged count histogram; quantiles interpolate with
the same R-7 ``(n-1)*q`` rule DuckDB's ``quantile_cont`` uses, so the
doubles match bitwise and the op is SQL-oracle-checkable.

Scale note: integer measures (cents, token counts, sizes) have bounded
cardinality, which makes the exact histogram path viable at any row
count; for unbounded floats, bucket first or use a sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context

DEFAULT_QS = (0.5, 0.9, 0.99)


def _interp_quantiles(vals: np.ndarray, counts: np.ndarray, qs) -> list[float]:
    """R-7 quantiles from a sorted value histogram — identical arithmetic
    to DuckDB quantile_cont: h=(n-1)q; (1-frac)*x[lo] + frac*x[lo+1]."""
    n = int(counts.sum())
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        h = (n - 1) * q
        lo = int(np.floor(h))
        frac = h - lo
        x_lo = float(vals[np.searchsorted(cum, lo + 1)])
        x_hi = float(vals[np.searchsorted(cum, min(lo + 1, n - 1) + 1)])
        out.append((1.0 - frac) * x_lo + frac * x_hi)
    return out


def _q_label(q: float) -> str:
    """Collision-free column label: p50, p90, p99, p99_5 (q=0.995)."""
    return "p" + (f"{q * 100:g}").replace(".", "_")


def value_quantiles(
    events: Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple[float, ...] = DEFAULT_QS,
) -> Dataset:
    """(key, p50, p90, p99): exact quantiles of FLOOR(value*100) cents."""

    def cents(tbl: pa.Table) -> pa.Table:
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: tbl.column(key_col),
                "cents": np.floor(v * 100.0).astype(np.int64),
            }
        )

    return int_quantiles(
        events.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col=key_col,
        int_col="cents",
        qs=qs,
    )


def int_quantiles(
    ds: Dataset,
    key_col: str,
    int_col: str,
    qs: tuple[float, ...] = DEFAULT_QS,
) -> Dataset:
    """(key, p...): exact per-key R-7 quantiles of an int64 measure —
    the histogram machinery beneath :func:`value_quantiles`, reusable
    for any bounded-cardinality integer signal (quality scores, token
    counts, sizes)."""
    tune_context()
    labels = [_q_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels from qs={qs}")

    def partial_counts(tbl: pa.Table) -> pa.Table:
        cents = (
            tbl.column(int_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if cents.size == 0:
            return pa.table(
                {
                    key_col: tbl.column(key_col).slice(0, 0).combine_chunks(),
                    "cents": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # Arrow dictionary-encode — no Python-object key materialization
        d = tbl.column(key_col).combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # full-int64-safe pair dedup: lexsort on (key code, cents), no
        # bit packing (a pack would corrupt at |cents| >= 2^39)
        order = np.lexsort((cents, codes))
        c_s, v_s = codes[order], cents[order]
        starts = np.concatenate(
            [[0], np.nonzero((np.diff(c_s) != 0) | (np.diff(v_s) != 0))[0] + 1]
        )
        counts = np.diff(np.concatenate([starts, [c_s.shape[0]]]))
        return pa.table(
            {
                key_col: d.dictionary.take(pa.array(c_s[starts])),
                "cents": v_s[starts],
                "n": counts.astype(np.int64),
            }
        )

    partials = ds.map_batches(
        partial_counts,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    def merge(group: pa.Table) -> pa.Table:
        # one group per key — key cardinality is metadata-sized here;
        # slice (not rebuild) the key cell so any key dtype passes through
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cents, kind="stable")
        c_s = cents[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(c_s))[0] + 1])
        vals = c_s[starts]
        counts = np.add.reduceat(n[order], starts)
        ps = _interp_quantiles(vals, counts, qs)
        cols = {key_col: group.column(key_col).slice(0, 1).combine_chunks()}
        for q, p in zip(qs, ps):
            cols[_q_label(q)] = pa.array([p], pa.float64())
        return pa.table(cols)

    return partials.groupby(key_col).map_groups(merge, batch_format="pyarrow")
