"""Windowed aggregation over the events stream table.

Tumbling-window aggregate as a Ray Data pipeline: window assignment is a
stateless ``map_batches`` (timestamp floor), then a pre-aggregated
partial combine per batch feeds one small ``groupby`` — raw events never
shuffle, only (window, key, partial) rows do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import tune_context
from ray.data.aggregate import Sum


def tumbling_window_agg(
    events: Dataset,
    every: str = "1h",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> Dataset:
    """(event_type, window_start, n_events, value_cents) per tumbling
    window. ``value_cents`` sums floor(value*100) as int64 — associative
    and order-independent, unlike a float sum."""
    tune_context()

    def partial(tbl: pa.Table) -> pa.Table:
        win = pc.floor_temporal(tbl.column(ts_col), unit="hour")
        cents = pc.cast(
            pc.floor(pc.multiply(tbl.column(value_col), pa.scalar(100.0))), pa.int64()
        )
        t = pa.table(
            {
                key_col: tbl.column(key_col),
                "window_start": win,
                "one": np.ones(tbl.num_rows, dtype=np.int64),
                "value_cents": cents,
            }
        )
        # pre-aggregate inside the batch: group by (key, window)
        g = t.group_by([key_col, "window_start"]).aggregate(
            [("one", "sum"), ("value_cents", "sum")]
        )
        ren = {"one_sum": "n_events", "value_cents_sum": "value_cents"}
        g = g.rename_columns([ren.get(n, n) for n in g.column_names])
        return g.select([key_col, "window_start", "n_events", "value_cents"])

    partials = events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )
