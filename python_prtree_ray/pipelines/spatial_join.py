"""Distributed spatial joins as Ray Data pipelines.

The distributed re-expression of the reference's core operators:

- :func:`spatial_join` ≙ ``batch_query`` (``prtree.h:587-729``) — every
  (query box, data box) closed-interval intersection, as a Dataset of
  ``(query_id, idx)`` pairs.
- :func:`self_join` ≙ ``query_intersections`` (``prtree.h:839-958``) —
  all intersecting stored-box pairs with ``idx_a < idx_b``.

Shape: expand both sides to covering grid cells (flat_map-style
``map_batches``) → one ``groupby(cell)`` all-to-all shuffle →
per-cell packed PR-tree build + probe in ``map_groups`` → owner-cell
dedup (no second shuffle). Optional salting splits hot cells.

Scale notes (100 TB design): the ONLY all-to-all is the single
groupby-on-cell; the resolution is chosen so a median cell holds
~64k-256k boxes (one actor-heap-sized partition); the salt histogram is
pre-aggregated per batch before its tiny global sum; nothing
materializes the full dataset on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..config import tune_context
from ..stages import spatial as st

DEFAULT_RES = 6


def _expanded_union(
    boxes: Dataset,
    queries: Dataset | None,
    res: int,
    salt_plan: dict[int, int] | None,
    box_id: str = "idx",
    query_id: str = "query_id",
) -> Dataset:
    build = boxes.map_batches(
        st.expand_boxes_to_cells,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(res=res, side=st.SIDE_BUILD, id_col=box_id, salt_plan=salt_plan),
    )
    if queries is None:
        return build
    probe = queries.map_batches(
        st.expand_boxes_to_cells,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(res=res, side=st.SIDE_PROBE, id_col=query_id, salt_plan=salt_plan),
    )
    return build.union(probe)


def compute_salt_plan(
    boxes: Dataset, res: int, salt_threshold: int
) -> dict[int, int]:
    """Per-cell box histogram → ``{hot_cell: n_salts}``.

    Pre-aggregates counts inside each ``map_batches`` call, so the global
    groupby only shuffles (cell, partial_count) rows — tiny at any scale.
    """
    tune_context()
    partial = boxes.map_batches(
        st.cell_count_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(res=res),
    )
    hist = partial.groupby("cell").aggregate(Sum("n", alias_name="n")).take_all()
    plan = {
        int(r["cell"]): int(min(-(-r["n"] // salt_threshold), st.MAX_SALT))
        for r in hist
        if r["n"] > salt_threshold
    }
    return plan


def spatial_join(
    boxes: Dataset,
    queries: Dataset,
    res: int = DEFAULT_RES,
    salt_threshold: int | None = None,
) -> Dataset:
    """All (query_id, idx) closed-interval intersections.

    ``boxes``: columns (idx, xmin, ymin, xmax, ymax);
    ``queries``: columns (query_id, xmin, ymin, xmax, ymax).
    """
    tune_context()
    plan = (
        compute_salt_plan(boxes, res, salt_threshold) if salt_threshold else None
    )
    union = _expanded_union(boxes, queries, res, plan)
    return union.groupby("key").map_groups(
        st.make_cell_join(res), batch_format="pyarrow"
    )


def self_join(
    boxes: Dataset,
    res: int = DEFAULT_RES,
    salt_threshold: int | None = None,
) -> Dataset:
    """All intersecting stored-box pairs, ``idx_a < idx_b`` (reference
    ``query_intersections`` contract incl. its dedup rule).

    Salting note: a self-join cannot scatter the build side without losing
    within-cell pairs, so hot cells replicate the PROBE role instead —
    here we simply run unsalted; skew is handled by resolution choice.
    """
    tune_context()
    union = _expanded_union(boxes, None, res, None)
    return union.groupby("key").map_groups(
        st.make_cell_join(res, self_join=True), batch_format="pyarrow"
    )


def point_query(
    boxes: Dataset,
    points: Dataset,
    res: int = DEFAULT_RES,
) -> Dataset:
    """Point-probe join (reference: point = degenerate box,
    ``prtree.h:607-615``). ``points``: columns (query_id, px, py)."""

    def to_boxes(tbl: pa.Table) -> pa.Table:
        px = st.col_np(tbl, "px")
        py = st.col_np(tbl, "py")
        return pa.table(
            {
                "query_id": st.col_np(tbl, "query_id"),
                "xmin": px,
                "ymin": py,
                "xmax": px,
                "ymax": py,
            }
        )

    qboxes = points.map_batches(to_boxes, batch_format="pyarrow", zero_copy_batch=True)
    return spatial_join(boxes, qboxes, res=res)


def aggregate_match_lists(pairs: Dataset) -> Dataset:
    """(query_id, idx) pairs → per-query sorted idx list column — the
    reference's ``batch_query`` return shape (``List[List[int]]`` with
    ascending per-query order, ``prtree.h:786-787``)."""

    def to_list(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        idx = np.sort(st.col_np(group, "idx"))
        return pa.table(
            {
                "query_id": pa.array([qid], type=pa.int64()),
                "matches": pa.array([idx.tolist()], type=pa.list_(pa.int64())),
            }
        )

    return pairs.groupby("query_id").map_groups(to_list, batch_format="pyarrow")
