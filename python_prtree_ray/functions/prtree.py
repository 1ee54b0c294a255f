"""Packed PR-tree: NumPy bulk load + fully vectorized batch box queries.

This is the per-partition kernel the stateful actor-pool stages wrap — the
distributed analog of the reference's in-process Priority R-Tree
(``include/prtree/core/prtree.h``). It reproduces the reference's query
*semantics* exactly (closed-interval intersection, point = degenerate box,
per-query results as sets; reference sorts them ascending,
``prtree.h:786-787``) while replacing its linked/flattened C++ node
structure with a packed, level-indexed array-of-MBRs design:

- Bulk load: priority-extreme skimming + Sort-Tile-Recursive packing.
  The reference's pseudo-PR-tree rounds skim the ``2*D`` extreme-most
  boxes per axis into priority leaves, then median-split on alternating
  axes (``detail/pseudo_tree.h:49-75,123-225``). Here the same goal —
  extreme boxes isolated so fat MBRs don't poison every leaf — is achieved
  by skimming the k extreme boxes per side into dedicated leading leaves,
  then STR-packing the rest (sort by x-center → slabs → sort by y-center).
- Query: level-synchronous frontier expansion over (query, node) pair
  arrays — the vectorized equivalent of the reference's per-query BFS
  (``detail/nodes.h:134-166``) with its multi-thread query fan-out
  (``prtree.h:699-722``); here the fan-out across queries is NumPy
  broadcasting instead of std::thread.

Memory: ~(2*2D*8 * (1 + 1/(B-1))) bytes/box of MBR data at float64 —
comparable to the reference's ~23 B/box at float32
(``docs/baseline/BASELINE_SUMMARY_COMPLETED.md:167-183``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["PRTree"]


class PRTree:
    """Immutable packed R-tree over ``(idx, boxes)`` built in one shot.

    Parameters
    ----------
    idx : (n,) int64 user indices (duplicates allowed, as in the reference
        ctor — ``tests/unit/test_construction.py:248``).
    boxes : (n, 2*D) float array, layout ``[min..., max...]``.
    leaf_size : boxes per leaf (fan-in B; reference uses B=8,
        ``python_bindings.cc:10``; 16 is a better fit for vectorized scans).
    fanout : children per internal node.
    priority_k : extreme boxes skimmed per box-side into priority leaves.
    """

    def __init__(
        self,
        idx: np.ndarray,
        boxes: np.ndarray,
        leaf_size: int = 16,
        fanout: int = 8,
        priority_k: int = 8,
    ):
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        boxes = np.ascontiguousarray(boxes)
        if boxes.ndim != 2 or boxes.shape[1] % 2 != 0:
            raise ValueError(f"boxes must be (n, 2*D), got {boxes.shape}")
        if idx.shape[0] != boxes.shape[0]:
            raise ValueError("idx and boxes length mismatch")
        self.ndim = boxes.shape[1] // 2
        self.leaf_size = int(leaf_size)
        self.fanout = int(fanout)
        n = boxes.shape[0]
        self.n = n
        if n == 0:
            self.idx = idx
            self.boxes = boxes
            self.levels: list[np.ndarray] = []
            return

        order = self._pack_order(boxes, leaf_size, priority_k)
        self.idx = idx[order]
        self.boxes = boxes[order]
        self.levels = self._build_levels(self.boxes, leaf_size, fanout)
        # SoA (1-D column) views per level + for the packed boxes: the
        # query loop gathers 1-D columns, which is markedly faster than
        # 2-D fancy indexing on (n, 2D) arrays.
        d = self.ndim
        self._level_cols = [
            tuple(np.ascontiguousarray(lv[:, j]) for j in range(2 * d))
            for lv in self.levels
        ]
        self._box_cols = tuple(
            np.ascontiguousarray(self.boxes[:, j]) for j in range(2 * d)
        )

    # ------------------------------------------------------------------ build

    @staticmethod
    def _pack_order(boxes: np.ndarray, leaf_size: int, priority_k: int) -> np.ndarray:
        """Permutation packing boxes into spatially-coherent leaf runs."""
        n = boxes.shape[0]
        d = boxes.shape[1] // 2
        if n <= leaf_size:
            return np.arange(n, dtype=np.int64)

        # Priority skim: k extreme boxes per side (2*D sides) go first, in
        # dedicated leading leaves — same intent as the reference's priority
        # leaves (pseudo_tree.h:49-75): keeps elongated extreme boxes from
        # inflating every STR leaf MBR they'd otherwise land in.
        k = min(priority_k, max(0, (n // (4 * d)) // leaf_size * leaf_size))
        picked = np.zeros(n, dtype=bool)
        prio: list[np.ndarray] = []
        if k > 0:
            for side in range(2 * d):
                col = boxes[:, side]
                # minima sides: most-negative extreme = smallest min;
                # maxima sides: largest max. argpartition: O(n), we only
                # need the k-extreme set, not a full sort.
                kk = min(4 * k, n - 1)  # headroom for already-picked rows
                part = np.argpartition(col if side < d else -col, kk)[: kk + 1]
                part = part[np.argsort(col[part], kind="stable")]
                cand = part if side < d else part[::-1]
                take = cand[~picked[cand]][:k]
                picked[take] = True
                prio.append(take)
        rest = np.nonzero(~picked)[0]

        # STR pack the remainder: sort by x-center, cut into vertical slabs,
        # sort each slab by y-center (ndim>2: recurse over axes pairwise is
        # overkill; x/y carry the spatial locality, remaining axes ride).
        cx = boxes[rest, 0] + boxes[rest, d]
        cy = boxes[rest, 1] + boxes[rest, d + 1] if d >= 2 else np.zeros_like(cx)
        m = rest.shape[0]
        nleaves = -(-m // leaf_size)
        nslabs = max(1, int(np.ceil(np.sqrt(nleaves))))
        slab_rows = -(-m // nslabs)
        xrank = np.empty(m, dtype=np.int64)
        xrank[np.argsort(cx, kind="stable")] = np.arange(m)
        slab = xrank // slab_rows
        order_rest = rest[np.lexsort((cy, slab))]
        parts = prio + [order_rest]
        return np.concatenate(parts) if len(parts) > 1 else order_rest

    @staticmethod
    def _build_levels(boxes: np.ndarray, leaf_size: int, fanout: int) -> list[np.ndarray]:
        """Bottom-up MBR levels; ``levels[0]`` = leaf MBRs, last = roots."""
        d = boxes.shape[1] // 2
        levels = []
        cur_min, cur_max = boxes[:, :d], boxes[:, d:]
        group = leaf_size
        while True:
            m = cur_min.shape[0]
            ngroups = -(-m // group)
            pad = ngroups * group - m
            if pad:
                gmin = np.concatenate([cur_min, np.full((pad, d), np.inf, cur_min.dtype)])
                gmax = np.concatenate([cur_max, np.full((pad, d), -np.inf, cur_max.dtype)])
            else:
                gmin, gmax = cur_min, cur_max
            nmin = gmin.reshape(ngroups, group, d).min(axis=1)
            nmax = gmax.reshape(ngroups, group, d).max(axis=1)
            levels.append(np.concatenate([nmin, nmax], axis=1))
            if ngroups <= fanout:
                break
            cur_min, cur_max = nmin, nmax
            group = fanout
        return levels

    # ------------------------------------------------------------------ query

    def batch_query_pairs(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All closed-interval intersections of m query boxes vs stored boxes.

        Returns ``(q_row, idx)`` match-pair arrays — the engine's native
        result shape (equivalent to the CSR layout the reference's
        ``batch_query_array`` emits, ``detail/types.h:91-106``). Pairs are
        emitted grouped by query but NOT sorted by idx; callers needing the
        reference's sorted per-query lists (``prtree.h:786-787``) sort when
        assembling list columns.
        """
        qi, ni = self.batch_query_positions(qboxes)
        return qi, self.idx[ni]

    # Queries are processed in sub-chunks so the frontier/gather temporaries
    # stay cache-resident: measured 3.5x faster at 15k queries vs one pass
    # (and far better under multi-worker memory-bandwidth contention).
    QUERY_CHUNK = 2048

    def batch_query_positions(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Like :meth:`batch_query_pairs` but returns PACKED POSITIONS into
        ``self.idx`` / ``self.boxes`` instead of user indices — callers that
        need the matched boxes' coordinates (e.g. owner-cell dedup in the
        distributed join) gather them without a reverse lookup."""
        q = np.asarray(qboxes)
        if q.ndim != 2 or q.shape[1] != 2 * self.ndim:
            raise ValueError(f"queries must be (m, {2 * self.ndim}), got {q.shape}")
        m = q.shape[0]
        e = np.empty(0, dtype=np.int64)
        if m == 0 or self.n == 0:
            return e, e
        if m > self.QUERY_CHUNK:
            qis, nis = [], []
            for s in range(0, m, self.QUERY_CHUNK):
                qi, ni = self._query_positions_chunk(q[s : s + self.QUERY_CHUNK])
                qis.append(qi + s)
                nis.append(ni)
            return np.concatenate(qis), np.concatenate(nis)
        return self._query_positions_chunk(q)

    def _query_positions_chunk(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        m = q.shape[0]
        e = np.empty(0, dtype=np.int64)
        d = self.ndim
        qcols = tuple(np.ascontiguousarray(q[:, j]) for j in range(2 * d))

        def _test(qi, ni, cols):
            # closed-interval overlap, axis by axis on 1-D gathers;
            # x-axis first, then progressively mask (cheap & cache-friendly)
            hit = qcols[0][qi] <= cols[d][ni]
            hit &= cols[0][ni] <= qcols[d][qi]
            for ax in range(1, d):
                hit &= qcols[ax][qi] <= cols[d + ax][ni]
                hit &= cols[ax][ni] <= qcols[d + ax][qi]
            return hit

        # Frontier of (query, node) pairs, roots downward.
        ntop = self.levels[-1].shape[0]
        qi = np.repeat(np.arange(m, dtype=np.int64), ntop)
        ni = np.tile(np.arange(ntop, dtype=np.int64), m)
        for li in range(len(self.levels) - 1, -1, -1):
            hit = _test(qi, ni, self._level_cols[li])
            qi, ni = qi[hit], ni[hit]
            if qi.size == 0:
                return e, e
            child = self.leaf_size if li == 0 else self.fanout
            nchild = self.n if li == 0 else self.levels[li - 1].shape[0]
            # expand to children: contiguous runs [ni*child, ni*child+child),
            # clipped at the (single) tail node
            cand = (ni[:, None] * child + np.arange(child, dtype=np.int64)).ravel()
            qi = np.repeat(qi, child)
            valid = cand < nchild
            if not valid.all():
                qi, cand = qi[valid], cand[valid]
            ni = cand

        hit = _test(qi, ni, self._box_cols)
        return qi[hit], ni[hit]

    def batch_query(self, qboxes: np.ndarray) -> list[np.ndarray]:
        """Reference-shaped result: per-query sorted int64 index arrays
        (``batch_query`` contract, ``prtree.h:587-729`` + sort at 786-787).
        """
        q = np.asarray(qboxes)
        qi, bi = self.batch_query_pairs(q)
        out: list[np.ndarray] = []
        order = np.lexsort((bi, qi))
        qi, bi = qi[order], bi[order]
        bounds = np.searchsorted(qi, np.arange(q.shape[0] + 1))
        for s in range(q.shape[0]):
            out.append(bi[bounds[s] : bounds[s + 1]])
        return out

    def query_self_pairs(self) -> np.ndarray:
        """Self-join: (p, 2) array of idx pairs with ``idx_i < idx_j`` —
        the reference's ``query_intersections`` contract
        (``prtree.h:839-958``, dedup rule at 891-894)."""
        qi, bi = self.batch_query_pairs(self.boxes)
        a = self.idx[qi]
        keep = a < bi
        pairs = np.stack([a[keep], bi[keep]], axis=1)
        return pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
