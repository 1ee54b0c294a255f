"""Batch-level spatial stages: cell expansion, per-cell join kernels.

All functions here are ``map_batches`` / ``map_groups`` callables operating
on ``pyarrow.Table`` batches (zero-copy from the object store); inside,
columns are viewed as NumPy arrays and every operation is vectorized.

Distributed-join contract (replaces the reference's single-process BFS
fan-out, ``prtree.h:699-722``):

1. Both sides are expanded to every grid cell they overlap
   (:func:`expand_boxes_to_cells` — closed-interval cover, so matches that
   only touch on a cell boundary are never lost).
2. A ``groupby(cell)`` shuffle co-locates each cell's rows.
3. :func:`make_cell_join` builds a packed PR-tree over the cell's
   build-side rows and probes with the cell's probe-side rows.
4. A pair discovered in several shared cells is reported only by its
   OWNER cell — the cell containing the intersection region's min corner
   — so no global ``distinct`` shuffle is needed (substitute for the
   reference's in-process dedup at ``prtree.h:891-894``).

Skew: hot cells can be salted (``salt_plan``): build-side rows scatter
across ``k`` salted sub-keys, probe-side rows replicate to all ``k``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cells as cellmod
from ..functions.prtree import PRTree

BOX_COLS = ("xmin", "ymin", "xmax", "ymax")
# salted group key = cell * MAX_SALT + salt; res <= 26 keeps this in int64
MAX_SALT = 1 << 10

SIDE_BUILD = 0
SIDE_PROBE = 1
SIDE_SELF = 2  # dual-role row (unsalted self-join cells)


def col_np(tbl: pa.Table, name: str) -> np.ndarray:
    """Arrow column -> NumPy (zero-copy for non-null numeric columns)."""
    return tbl.column(name).to_numpy(zero_copy_only=False)


def boxes_np(tbl: pa.Table, box_cols: tuple = BOX_COLS) -> np.ndarray:
    return np.stack([col_np(tbl, c) for c in box_cols], axis=1)


def expand_boxes_to_cells(
    tbl: pa.Table,
    res: int,
    side: int,
    id_col: str,
    salt_plan: dict[int, int] | None = None,
    box_cols: tuple = BOX_COLS,
) -> pa.Table:
    """Replicate each box row to every cell it overlaps (flat_map shape).

    Output columns: ``key`` (salted group key), ``cell`` (unsalted, for
    owner dedup), ``side``, ``id``, then every ``box_cols`` coordinate.
    Partitioning assumption (documented): cells cover the FIRST TWO
    dimensions only — valid for any D because the per-cell kernel tests
    the full D-dimensional intersection; x/y cover merely co-locates.
    """
    b = boxes_np(tbl, box_cols)
    ids = col_np(tbl, id_col)
    d = len(box_cols) // 2
    row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, d], b[:, d + 1], res)
    ids_r = ids[row]
    b_r = b[row]
    key = cell * MAX_SALT
    if salt_plan:
        nsalt = np.ones(cell.shape[0], dtype=np.int64)
        hot_cells = np.fromiter(salt_plan.keys(), dtype=np.int64)
        hot_k = np.fromiter(salt_plan.values(), dtype=np.int64)
        order = np.argsort(hot_cells)
        hot_cells, hot_k = hot_cells[order], hot_k[order]
        pos = np.searchsorted(hot_cells, cell)
        pos = np.clip(pos, 0, hot_cells.shape[0] - 1)
        is_hot = hot_cells[pos] == cell
        nsalt[is_hot] = hot_k[pos[is_hot]]
        if side == SIDE_BUILD:
            # scatter: one salted key per row, by id hash
            salt = (ids_r * 2654435761 % MAX_SALT) % nsalt
            key = key + salt
        else:
            # replicate probe rows across all salts of hot cells
            rep = np.repeat(np.arange(cell.shape[0], dtype=np.int64), nsalt)
            local = np.arange(rep.shape[0], dtype=np.int64) - np.repeat(
                np.cumsum(nsalt) - nsalt, nsalt
            )
            ids_r = ids_r[rep]
            b_r = b_r[rep]
            cell = cell[rep]
            key = cell * MAX_SALT + local
    out = {
        "key": key,
        "cell": cell,
        "side": np.full(key.shape[0], side, dtype=np.int8),
        "id": ids_r,
    }
    for j, c in enumerate(box_cols):
        out[c] = b_r[:, j]
    return pa.table(out)


def expand_self_to_cells(
    tbl: pa.Table,
    res: int,
    id_col: str = "idx",
    salt_plan: dict[int, int] | None = None,
    box_cols: tuple = BOX_COLS,
) -> pa.Table:
    """Self-join cell expansion with hot-cell salting by PROBE-ROLE
    REPLICATION: cold cells emit one dual-role row (``SIDE_SELF``); hot
    cells emit each row once as BUILD (scattered to ONE salt by id hash)
    plus PROBE replicas in EVERY salt. A pair (a < b) is then found
    exactly once — in build-row b's salt group, by probe-row a, under the
    ``query_id < idx`` rule — so salting never loses within-cell pairs
    (the reason a plain build-side scatter can't be used for self-joins).
    """
    b = boxes_np(tbl, box_cols)
    ids = col_np(tbl, id_col)
    d = len(box_cols) // 2
    # cells partition on x/y only; the per-cell kernel tests full-D
    row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, d], b[:, d + 1], res)
    ids_r, b_r = ids[row], b[row]
    if not salt_plan:
        out = {
            "key": cell * MAX_SALT,
            "cell": cell,
            "side": np.full(cell.shape[0], SIDE_SELF, dtype=np.int8),
            "id": ids_r,
        }
        for j, c in enumerate(box_cols):
            out[c] = b_r[:, j]
        return pa.table(out)
    nsalt = np.ones(cell.shape[0], dtype=np.int64)
    hot_cells = np.fromiter(salt_plan.keys(), dtype=np.int64)
    hot_k = np.fromiter(salt_plan.values(), dtype=np.int64)
    order = np.argsort(hot_cells)
    hot_cells, hot_k = hot_cells[order], hot_k[order]
    pos = np.searchsorted(hot_cells, cell)
    pos = np.clip(pos, 0, hot_cells.shape[0] - 1)
    is_hot = hot_cells[pos] == cell
    nsalt[is_hot] = hot_k[pos[is_hot]]
    cold = ~is_hot

    parts_key, parts_cell, parts_side, parts_id, parts_box = [], [], [], [], []
    # cold rows: single dual-role emission
    parts_key.append(cell[cold] * MAX_SALT)
    parts_cell.append(cell[cold])
    parts_side.append(np.full(int(cold.sum()), SIDE_SELF, dtype=np.int8))
    parts_id.append(ids_r[cold])
    parts_box.append(b_r[cold])
    # hot rows: one BUILD row at the id-hash salt...
    h_ids, h_boxes, h_cell = ids_r[is_hot], b_r[is_hot], cell[is_hot]
    h_n = nsalt[is_hot]
    salt = (h_ids * 2654435761 % MAX_SALT) % h_n
    parts_key.append(h_cell * MAX_SALT + salt)
    parts_cell.append(h_cell)
    parts_side.append(np.full(h_ids.shape[0], SIDE_BUILD, dtype=np.int8))
    parts_id.append(h_ids)
    parts_box.append(h_boxes)
    # ...plus PROBE replicas in every salt
    rep = np.repeat(np.arange(h_cell.shape[0], dtype=np.int64), h_n)
    local = np.arange(rep.shape[0], dtype=np.int64) - np.repeat(
        np.cumsum(h_n) - h_n, h_n
    )
    parts_key.append(h_cell[rep] * MAX_SALT + local)
    parts_cell.append(h_cell[rep])
    parts_side.append(np.full(rep.shape[0], SIDE_PROBE, dtype=np.int8))
    parts_id.append(h_ids[rep])
    parts_box.append(h_boxes[rep])

    box_all = np.concatenate(parts_box, axis=0)
    out = {
        "key": np.concatenate(parts_key),
        "cell": np.concatenate(parts_cell),
        "side": np.concatenate(parts_side),
        "id": np.concatenate(parts_id),
    }
    for j, c in enumerate(box_cols):
        out[c] = box_all[:, j]
    return pa.table(out)


def make_cell_join(
    res: int,
    self_join: bool = False,
    emit_coords: bool = False,
    box_cols: tuple = BOX_COLS,
):
    """Build the per-cell ``map_groups`` callable.

    For a two-sided join the group holds build rows (side=0) and probe
    rows (side=1); for a self-join every row is both sides. Returns pairs
    ``(query_id, idx)`` (self-join: ``idx_a < idx_b``), deduped by the
    owner-cell rule. ``box_cols`` (mins..., maxs... order) makes the
    kernel D-generic: cells partition on x/y only, the per-cell tree
    tests the full D-dimensional intersection, and the owner rule uses
    the intersection's x/y min corner (which both boxes' x/y covers
    contain, so exactly one covered cell owns any pair).
    """
    dims = len(box_cols) // 2

    def join_cell(group: pa.Table) -> pa.Table:
        cell_val = int(group.column("cell")[0].as_py())
        ids = col_np(group, "id")
        b = boxes_np(group, box_cols)
        side = col_np(group, "side")
        if self_join:
            # SELF rows play both roles; salted hot-cell groups hold
            # disjoint BUILD (scattered) and PROBE (replicated) rows
            bmask = side != SIDE_PROBE
            qmask = side != SIDE_BUILD
        else:
            bmask = side == SIDE_BUILD
            qmask = ~bmask
        bi_ids, bi_boxes = ids[bmask], b[bmask]
        q_ids, q_boxes = ids[qmask], b[qmask]
        empty = {
            "query_id": np.empty(0, np.int64),
            "idx": np.empty(0, np.int64),
        }
        if emit_coords:
            empty.update(
                qxmin=np.empty(0, np.float64), qymin=np.empty(0, np.float64),
                bxmin=np.empty(0, np.float64), bymin=np.empty(0, np.float64),
                bxmax=np.empty(0, np.float64), bymax=np.empty(0, np.float64),
            )
        if bi_ids.shape[0] == 0 or q_ids.shape[0] == 0:
            return pa.table(empty)

        tree = PRTree(bi_ids, bi_boxes)
        qi, pos = tree.batch_query_positions(q_boxes)
        if qi.size == 0:
            return pa.table(empty)
        # owner-cell dedup: intersection x/y min corner must land HERE
        mcx = np.maximum(q_boxes[qi, 0], tree.boxes[pos, 0])
        mcy = np.maximum(q_boxes[qi, 1], tree.boxes[pos, 1])
        owner = cellmod.cell_of_points(mcx, mcy, res)
        keep = owner == cell_val
        qi, pos = qi[keep], pos[keep]
        out_q, out_b = q_ids[qi], tree.idx[pos]
        if self_join:
            m = out_q < out_b
            qi, pos = qi[m], pos[m]
            out_q, out_b = out_q[m], out_b[m]
        res_tbl = {"query_id": out_q, "idx": out_b}
        if emit_coords:
            res_tbl.update(
                qxmin=q_boxes[qi, 0], qymin=q_boxes[qi, 1],
                bxmin=tree.boxes[pos, 0], bymin=tree.boxes[pos, 1],
                bxmax=tree.boxes[pos, dims], bymax=tree.boxes[pos, dims + 1],
            )
        return pa.table(res_tbl)

    return join_cell


def cell_count_batch(tbl: pa.Table, res: int) -> pa.Table:
    """Partial per-cell box counts for a batch (pre-aggregation before the
    tiny global ``groupby(cell).sum`` — avoids shuffling raw rows to build
    the salting / kNN histograms)."""
    b = boxes_np(tbl)
    row, cell = cellmod.cover_boxes(b[:, 0], b[:, 1], b[:, 2], b[:, 3], res)
    uc, counts = np.unique(cell, return_counts=True)
    return pa.table({"cell": uc, "n": counts.astype(np.int64)})
