"""Distributed spatial joins as Ray Data pipelines.

The distributed re-expression of the reference's core operators:

- :func:`spatial_join` ≙ ``batch_query`` (``prtree.h:587-729``) — every
  (query box, data box) closed-interval intersection, as a Dataset of
  ``(query_id, idx)`` pairs.
- :func:`self_join` ≙ ``query_intersections`` (``prtree.h:839-958``) —
  all intersecting stored-box pairs with ``idx_a < idx_b``.

Two physical strategies, chosen by the size of the query side:

- **Broadcast** (query side ≤ ``BROADCAST_LIMIT`` rows): build ONE packed
  PR-tree over the query boxes, ``ray.put`` it once, and probe it from a
  map-only ``map_batches`` pass over the (arbitrarily large) box side.
  Zero shuffle — the scale path when one side is small, and the direct
  distributed analog of the reference's build-once/probe-many model
  (``prtree.h:587-729``): the tree is shared read-only by every worker
  exactly as the reference shares ``flat_tree`` across query threads.
- **Cell shuffle** (both sides large): expand both sides to covering grid
  cells (flat_map-style ``map_batches``) → one ``groupby(cell)``
  all-to-all shuffle → per-cell packed PR-tree build + probe in
  ``map_groups`` → owner-cell dedup (no second shuffle). Optional
  salting splits hot cells.

Scale notes (100 TB design): the ONLY all-to-all is the single
groupby-on-cell — and only when BOTH sides are too big to broadcast; the
resolution is chosen so a median cell holds ~64k-256k boxes (one
actor-heap-sized partition); the salt histogram is pre-aggregated per
batch before its tiny global sum; nothing materializes the full dataset
on the driver (the auto-broadcast probe streams the query side and bails
out at ``BROADCAST_LIMIT + 1`` rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of
from ..functions.prtree import PRTree
from ..stages import spatial as st

DEFAULT_RES = 6

# A 2M-row query side is ~5 numpy arrays x 2M x 8B ≈ 80 MB in the object
# store — read once per node, cheap next to any all-to-all of the big side.
BROADCAST_LIMIT = 2_000_000

# Hard ceiling for broadcast=True (forced): ~8x the auto limit ≈ 640 MB of
# boxes on the driver. Beyond this the collect would OOM the driver before
# any error surfaced — raise loudly instead.
FORCE_BROADCAST_LIMIT = 8 * BROADCAST_LIMIT

PAIR_SCHEMA = pa.schema([("query_id", pa.int64()), ("idx", pa.int64())])


def _expanded_union(
    boxes: Dataset,
    queries: Dataset | None,
    res: int,
    salt_plan: dict[int, int] | None,
    box_id: str = "idx",
    query_id: str = "query_id",
    box_cols: tuple[str, ...] = st.BOX_COLS,
) -> Dataset:
    build = boxes.map_batches(
        st.expand_boxes_to_cells,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
        fn_kwargs=dict(
            res=res,
            side=st.SIDE_BUILD,
            id_col=box_id,
            salt_plan=salt_plan,
            box_cols=box_cols,
        ),
    )
    if queries is None:
        return build
    probe = queries.map_batches(
        st.expand_boxes_to_cells,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
        fn_kwargs=dict(
            res=res,
            side=st.SIDE_PROBE,
            id_col=query_id,
            salt_plan=salt_plan,
            box_cols=box_cols,
        ),
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
        batch_size=COMBINE_BATCH,
        fn_kwargs=dict(res=res),
    )
    hist = partial.groupby("cell").aggregate(Sum("n", alias_name="n")).take_all()
    plan = {
        int(r["cell"]): int(min(-(-r["n"] // salt_threshold), st.MAX_SALT))
        for r in hist
        if r["n"] > salt_threshold
    }
    return plan


def _try_collect_small(queries: Dataset, limit: int) -> pa.Table | None:
    """Stream the query side to the driver, giving up (→ None) as soon as
    it exceeds ``limit`` rows. Never holds more than limit+1 rows."""
    batches: list[pa.Table] = []
    n = 0
    for b in queries.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
        if n > limit:
            return None
        batches.append(b)
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


def broadcast_join(
    boxes: Dataset,
    query_table: pa.Table,
    query_id: str = "query_id",
    box_id: str = "idx",
    batch_size: int = 16384,
    carry_cols: tuple[str, ...] = (),
    box_cols: tuple[str, ...] = st.BOX_COLS,
) -> Dataset:
    """Map-only spatial join: the small query side is broadcast raw via
    ``ray.put``; each task builds a packed PR-tree over ITS batch of the
    big side and batch-queries it with the broadcast boxes. No shuffle.

    Indexing the streamed side per batch beats probing one big broadcast
    tree ~3x here: query regions overlap heavily, so a tree built over
    them prunes poorly, while each batch's data boxes are compact.

    ``box_cols`` lists coordinate columns in ``[min..., max...]`` order
    (both sides); pass 6 names for 3D / 8 for 4D — the kernel is
    D-generic, matching the reference's 2D/3D/4D instantiations.
    """
    tune_context()

    def _stack(t: pa.Table) -> np.ndarray:
        return np.stack([st.col_np(t, c) for c in box_cols], axis=1)

    if query_table.num_rows == 0:
        fields = list(PAIR_SCHEMA)
        if carry_cols:
            bschema = boxes.schema().base_schema
            fields += [bschema.field(c) for c in carry_cols]
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    q_ids = query_table.column(query_id).to_numpy(zero_copy_only=False)
    q_boxes = _stack(query_table)
    side_ref = ray.put((q_ids.astype(np.int64), q_boxes))

    def probe(tbl: pa.Table) -> pa.Table:
        qids, qb = ray.get(side_ref)  # shared-memory read after first fetch
        ids = st.col_np(tbl, box_id)
        # pack POSITIONS so carried payload columns gather by row, then
        # map through to user ids (return_obj parity: the payload is a
        # column projection riding the same batch — core.py:601-603)
        tree = PRTree(np.arange(ids.shape[0], dtype=np.int64), _stack(tbl))
        qi, ppos = tree.batch_query_positions(qb)
        rows = tree.idx[ppos]
        out = {"query_id": qids[qi], "idx": ids[rows]}
        for c in carry_cols:
            out[c] = tbl.column(c).take(pa.array(rows))
        return pa.table(out)

    return boxes.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def spatial_join(
    boxes: Dataset,
    queries: Dataset,
    res: int = DEFAULT_RES,
    salt_threshold: int | None = None,
    broadcast: bool | None = None,
    box_cols: tuple[str, ...] = st.BOX_COLS,
) -> Dataset:
    """All (query_id, idx) closed-interval intersections.

    ``boxes``: columns (idx, *box_cols); ``queries``: (query_id,
    *box_cols). ``box_cols`` lists coordinates in (mins..., maxs...)
    order — 4 names for 2D, 6 for 3D, 8 for 4D; BOTH physical paths are
    D-generic (the cell shuffle partitions on x/y only and tests the
    full-D intersection per cell).

    ``broadcast=None`` (auto) probes the query side and takes the zero-
    shuffle broadcast path when it fits ``BROADCAST_LIMIT``; pass False to
    force the cell-shuffle path (both sides huge), True to force
    broadcast — which raises ``ValueError`` if the query side exceeds
    ``FORCE_BROADCAST_LIMIT`` rows (the bounded driver collect gives up
    at limit+1 rows; it never OOMs first).
    """
    tune_context()
    if broadcast is not False:
        cap = BROADCAST_LIMIT if broadcast is None else FORCE_BROADCAST_LIMIT
        qtbl = _try_collect_small(queries, cap)
        if qtbl is not None:
            return broadcast_join(boxes, qtbl, box_cols=box_cols)
        if broadcast is True:
            raise ValueError(
                f"spatial_join(broadcast=True): query side exceeds "
                f"FORCE_BROADCAST_LIMIT ({FORCE_BROADCAST_LIMIT} rows); "
                f"use broadcast=None (auto) or broadcast=False (cell shuffle)"
            )
    plan = (
        compute_salt_plan(boxes, res, salt_threshold) if salt_threshold else None
    )
    union = _expanded_union(boxes, queries, res, plan, box_cols=box_cols)
    return union.groupby("key").map_groups(
        st.make_cell_join(res, box_cols=box_cols), batch_format="pyarrow"
    )


def spatial_semi_join(
    boxes: Dataset,
    queries: Dataset,
    anti: bool = False,
    res: int = DEFAULT_RES,
    box_cols: tuple[str, ...] = st.BOX_COLS,
) -> Dataset:
    """Spatial EXISTS / NOT-EXISTS filter: the ``idx`` of every stored
    box that intersects at least one query region (``anti=False``) or
    none at all (``anti=True``). One row per box — never the pair
    fan-out, which is the point: a 100-TB semi filter must not
    materialize the (possibly quadratic) match list first.

    Physical plan: when the query side fits ``BROADCAST_LIMIT`` this is
    map-only — each batch builds its packed PR-tree, probes it with the
    broadcast regions, and keeps/drops rows by a hit bitmask (zero
    shuffle, zero pair rows). Otherwise it composes the cell-shuffle
    join with a hash semi/anti join on ``idx`` — two shuffles, still no
    driver materialization.
    """
    tune_context()
    qtbl = _try_collect_small(queries, BROADCAST_LIMIT)
    if qtbl is not None:
        if qtbl.num_rows == 0:
            if anti:
                return boxes.select_columns(["idx"])
            return ray.data.from_arrow(
                pa.schema([("idx", pa.int64())]).empty_table()
            )
        q_boxes = np.stack([st.col_np(qtbl, c) for c in box_cols], axis=1)
        side_ref = ray.put(q_boxes)

        def mask(tbl: pa.Table) -> pa.Table:
            qb = ray.get(side_ref)
            ids = st.col_np(tbl, "idx")
            coords = np.stack([st.col_np(tbl, c) for c in box_cols], axis=1)
            tree = PRTree(np.arange(ids.shape[0], dtype=np.int64), coords)
            _, ppos = tree.batch_query_positions(qb)
            hit = np.zeros(ids.shape[0], dtype=bool)
            hit[tree.idx[ppos]] = True
            keep = ~hit if anti else hit
            return pa.table({"idx": pa.array(ids[keep], pa.int64())})

        # batch sized like broadcast_join: each batch pays one probe of
        # the full broadcast side, so tiny default batches multiply
        # that fixed probe cost ~40x
        return boxes.map_batches(
            mask, batch_format="pyarrow", zero_copy_batch=True, batch_size=16384
        )

    from .join import hash_equi_join

    pairs = spatial_join(boxes, queries, res=res, box_cols=box_cols)
    return hash_equi_join(
        boxes.select_columns(["idx"]),
        pairs.select_columns(["idx"]),
        on="idx",
        how="anti" if anti else "semi",
    )


def self_join(
    boxes: Dataset,
    res: int = DEFAULT_RES,
    salt_threshold: int | None = None,
    box_cols: tuple[str, ...] = st.BOX_COLS,
) -> Dataset:
    """All intersecting stored-box pairs, ``idx_a < idx_b`` (reference
    ``query_intersections`` contract incl. its dedup rule).

    Salting (``salt_threshold``: max rows per cell before splitting): a
    self-join cannot scatter the build side without losing within-cell
    pairs, so hot cells use PROBE-ROLE REPLICATION — each row builds in
    exactly one salt (id-hash scatter) and probes in every salt; the
    ``idx_a < idx_b`` rule then reports each pair exactly once (in the
    larger id's build group). Result row sets are salt-invariant.
    """
    tune_context()
    plan = (
        compute_salt_plan(boxes, res, salt_threshold) if salt_threshold else None
    )
    union = boxes.map_batches(
        st.expand_self_to_cells,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(res=res, id_col="idx", salt_plan=plan, box_cols=box_cols),
    )
    return union.groupby("key").map_groups(
        st.make_cell_join(res, self_join=True, box_cols=box_cols),
        batch_format="pyarrow",
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


def aggregate_match_lists(pairs: Dataset, n_buckets: int = 256) -> Dataset:
    """(query_id, idx) pairs → per-query sorted idx list column — the
    reference's ``batch_query`` return shape (``List[List[int]]`` with
    ascending per-query order, ``prtree.h:786-787``).

    Same coarse-bucket assembly as :func:`aggregate_match_csv` (one
    ``map_groups`` call per bucket, never per query); the list is built
    as an Arrow ListArray straight from segment offsets."""

    def bucket(tbl: pa.Table) -> pa.Table:
        q = st.col_np(tbl, "query_id")
        return pa.table(
            {
                "bucket": bucket_of(q, n_buckets),
                "query_id": q,
                "idx": st.col_np(tbl, "idx"),
            }
        )

    def to_lists(group: pa.Table) -> pa.Table:
        q = st.col_np(group, "query_id")
        idx = st.col_np(group, "idx")
        if q.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "matches": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        order = np.lexsort((idx, q))
        q, idx = q[order], idx[order]
        bounds = np.nonzero(np.diff(q))[0] + 1
        qids = q[np.concatenate([[0], bounds])]
        offsets = np.concatenate([[0], bounds, [q.size]]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(idx))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "matches": pa.compute.cast(lists, pa.list_(pa.int64())),
            }
        )

    keyed = pairs.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(to_lists, batch_format="pyarrow")


def aggregate_match_csv(pairs: Dataset, n_buckets: int = 256) -> Dataset:
    """(query_id, matches) with matches = ascending comma-joined idx — the
    reference ``batch_query`` per-query sorted list contract
    (``prtree.h:786-787``) in a string form both SQL and Arrow hash
    identically.

    Groups by a COARSE hash bucket (one ``map_groups`` call per bucket,
    not per query) and assembles all of a bucket's lists vectorized —
    per-query ``map_groups`` was ~15k Python calls per 15k queries."""

    def bucket(tbl: pa.Table) -> pa.Table:
        q = st.col_np(tbl, "query_id")
        return pa.table(
            {
                "bucket": bucket_of(q, n_buckets),
                "query_id": q,
                "idx": st.col_np(tbl, "idx"),
            }
        )

    def to_csv(group: pa.Table) -> pa.Table:
        q = st.col_np(group, "query_id")
        idx = st.col_np(group, "idx")
        if q.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "matches": pa.array([], type=pa.string()),
                }
            )
        order = np.lexsort((idx, q))
        q, idx = q[order], idx[order]
        bounds = np.nonzero(np.diff(q))[0] + 1
        qids = q[np.concatenate([[0], bounds])]
        offsets = np.concatenate([[0], bounds, [q.size]]).astype(np.int32)
        # int→string and the join both run as Arrow C++ kernels — a
        # Python ",".join over millions of ints dominated the runtime
        idx_str = pa.compute.cast(pa.array(idx), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), idx_str)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "matches": pa.compute.binary_join(lists, ","),
            }
        )

    keyed = pairs.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(to_csv, batch_format="pyarrow")


def iou_join(
    boxes: Dataset,
    threshold: float,
    res: int = 5,
    coords=None,
) -> Dataset:
    """Overlap-similarity self-join — every box pair with
    intersection-over-union ≥ ``threshold`` (the detection-dedup / NMS
    candidate primitive): ``(idx_a, idx_b, iou)`` with idx_a < idx_b.

    Exactness: rides :func:`self_join` for the exact overlapping pair
    set, then recomputes both geometries FROM THEIR KEYS (``coords``,
    default the derive channels — no geometry columns shuffle with the
    pairs) and evaluates ONE shared IoU expression tree
    (min/max/products, one division) bitwise-identical to the SQL
    twin, so the ≥ τ filter keeps exactly the same pairs.

    Scale shape: the pair set is the salted cell-bucket self-join; the
    IoU pass is stateless per-batch arithmetic on (idx_a, idx_b) rows.
    """
    import numpy as np

    from ..functions import derive

    if coords is None:
        coords = derive.derive_boxes
    t = float(threshold)

    pairs = self_join(boxes, res=res).rename_columns(
        {"query_id": "idx_a", "idx": "idx_b"}
    )

    def score(tbl: pa.Table) -> pa.Table:
        ia = tbl.column("idx_a").to_numpy(zero_copy_only=False)
        ib = tbl.column("idx_b").to_numpy(zero_copy_only=False)
        a = coords(ia)
        b = coords(ib)
        iw = np.minimum(a["xmax"], b["xmax"]) - np.maximum(a["xmin"], b["xmin"])
        ih = np.minimum(a["ymax"], b["ymax"]) - np.maximum(a["ymin"], b["ymin"])
        inter = iw * ih
        area_a = (a["xmax"] - a["xmin"]) * (a["ymax"] - a["ymin"])
        area_b = (b["xmax"] - b["xmin"]) * (b["ymax"] - b["ymin"])
        iou = inter / (area_a + area_b - inter)
        keep = iou >= t
        return pa.table(
            {
                "idx_a": ia[keep],
                "idx_b": ib[keep],
                "iou": iou[keep],
            }
        )

    return pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def iou_join_sql(boxes_cte: str, threshold: float) -> str:
    """DuckDB twin of :func:`iou_join` — overlap join + the identical
    LEAST/GREATEST IoU expression tree."""
    iou = (
        "(LEAST(a.xmax, b.xmax) - GREATEST(a.xmin, b.xmin))"
        " * (LEAST(a.ymax, b.ymax) - GREATEST(a.ymin, b.ymin))"
    )
    return f"""
WITH b0 AS ({boxes_cte}),
pr AS (SELECT a.idx AS idx_a, b.idx AS idx_b,
              {iou} / ((a.xmax - a.xmin) * (a.ymax - a.ymin)
                       + (b.xmax - b.xmin) * (b.ymax - b.ymin)
                       - {iou}) AS iou
       FROM b0 a, b0 b
       WHERE a.idx < b.idx
         AND a.xmin <= b.xmax AND b.xmin <= a.xmax
         AND a.ymin <= b.ymax AND b.ymin <= a.ymax)
SELECT idx_a, idx_b, iou FROM pr WHERE iou >= {threshold!r}
"""
