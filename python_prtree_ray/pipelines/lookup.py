"""Broadcast hash equi-join (lookup enrichment) — the no-shuffle join.

The small dimension side is pinned ONCE in the object store (``ray.put``
of sorted keys + payload arrays); every task of the streaming big side
resolves its batch with one vectorized ``searchsorted`` gather. This is
the canonical 100-TB enrichment shape: a fact stream annotated from a
dimension table without moving a single fact row — the alternative
shuffle join moves everything.

Duplicate keys on the small side RAISE by default (``on_dup="error"``) —
a broadcast lookup resolves each fact row to at most one dimension row,
so a dup-keyed dimension table diverges from a SQL fan-out join and the
divergence would be silent. Pass ``on_dup="last"`` to deterministically
keep the last occurrence instead (explicitly non-SQL semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..config import tune_context


def broadcast_lookup(
    big: Dataset,
    small: pa.Table,
    on: str,
    small_on: str | None = None,
    carry_cols: tuple[str, ...] = (),
    on_dup: str = "error",
    how: str = "inner",
) -> Dataset:
    """Join ``big`` (streaming) to ``small`` (broadcast) on an int64
    key, appending ``carry_cols`` from the small side. ``how="inner"``
    (default) drops unmatched big rows; ``how="left"`` keeps them with
    NULL carry columns; ``how="anti"`` keeps ONLY the unmatched rows
    (no carry columns — the NOT-EXISTS filter). ``on_dup``: ``"error"``
    (default) raises if the small side's keys are not unique; ``"last"``
    keeps the last occurrence per key."""
    tune_context()
    if on_dup not in ("error", "last"):
        raise ValueError(f"on_dup must be 'error' or 'last'; got {on_dup!r}")
    if how not in ("inner", "left", "anti"):
        raise ValueError(f"how must be 'inner', 'left' or 'anti'; got {how!r}")
    small_on = small_on or on
    keys = small.column(small_on).to_numpy(zero_copy_only=False).astype(np.int64)
    if on_dup == "error" and np.unique(keys).size != keys.size:
        raise ValueError(
            f"broadcast_lookup: duplicate keys in small side column "
            f"{small_on!r}; dedup upstream or pass on_dup='last'"
        )
    order = np.argsort(keys, kind="stable")  # stable → last dup wins below
    keys_s = keys[order]
    payload = {
        c: small.column(c).take(pa.array(order)).combine_chunks()
        for c in carry_cols
    }
    ref = ray.put((keys_s, payload))

    def enrich(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks, pay = ray.get(ref)
        k = tbl.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        # position of the LAST occurrence of each key (side='right' - 1)
        pos = np.searchsorted(ks, k, side="right") - 1
        hit = pos >= 0
        hit[hit] &= ks[pos[hit]] == k[hit]
        if how == "anti":
            return tbl.filter(pa.array(~hit))
        if how == "inner":
            out = tbl.filter(pa.array(hit))
            idx = pa.array(pos[hit])
            for c, col in pay.items():
                out = out.append_column(c, col.take(idx))
            return out
        # left: keep every big row; misses carry NULLs
        out = tbl
        hit_arr = pa.array(hit)
        idx = pa.array(np.where(hit, pos, 0))
        for c, col in pay.items():
            if len(col) == 0:  # empty small side: every carry is NULL
                out = out.append_column(c, pa.nulls(tbl.num_rows, col.type))
                continue
            taken = col.take(idx)
            out = out.append_column(
                c, pc.if_else(hit_arr, taken, pa.nulls(len(taken), taken.type))
            )
        return out

    return big.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
