"""User-facing facade: the reference's PRTree surface, Dataset-native.

``RayPRTree`` re-expresses the reference's mutable in-process tree
(``src/python_prtree/core.py`` PRTree2D) as an immutable base Dataset +
append-only delta Datasets + a tombstone set:

- ``insert`` ≙ delta append (reference ``prtree.h:280-418``); duplicate
  ids are rejected against the *known key set* like the reference's
  ``idx2bb`` check (``prtree.h:302-306``) when ``strict`` is on.
- ``erase`` ≙ tombstone (reference ``prtree.h:790-814``; erasing a
  missing id raises, parity with ``prtree.h:794-799``).
- ``rebuild`` ≙ compaction of (base ∪ delta − tombstones) into a fresh
  base; auto-triggered by the reference's 1.25× churn thresholds
  (``REBUILD_THRE``, ``detail/types.h:53``; triggers ``prtree.h:411-412``
  and ``prtree.h:811``).
- ``save``/``load`` ≙ partitioned parquet + manifest
  (reference cereal round-trip, ``prtree.h:119-149``).
- queries run against (base ∪ delta) with tombstones filtered inside the
  join stages — the "delta table" pattern; nothing mutates in place.

Tombstones are *generational*: each erase records ``(ids, n_deltas)`` so
it only masks the base and the deltas appended BEFORE it. Re-inserting a
previously-erased id therefore works in both modes — the old row stays
filtered (its tombstone predates the new delta) while the new row is
visible, matching the reference's erase-then-insert semantics.

Key-set tracking note: ``strict`` id bookkeeping holds the live key set
on the driver (int64 array) — exact parity for reference-scale data. At
10^12 rows, construct with ``strict=False`` (bookkeeping off) and enforce
uniqueness upstream; all query paths are unaffected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .pipelines import spatial_join as sj
from .stages import spatial as st

REBUILD_THRESHOLD = 1.25  # reference REBUILD_THRE, detail/types.h:53


class RayPRTree:
    def __init__(
        self,
        boxes: Dataset | None = None,
        res: int = sj.DEFAULT_RES,
        strict: bool = True,
        validate: bool = False,
    ):
        self.res = res
        self.strict = strict
        if validate and boxes is not None:
            from .functions.validate import validated_boxes_dataset

            boxes = validated_boxes_dataset(boxes)
        self._base = boxes
        self._deltas: list[Dataset] = []
        # generational tombstones: (ids, n_deltas_at_erase) — each entry
        # masks the base and deltas[:n_deltas_at_erase] only
        self._tombs: list[tuple[np.ndarray, int]] = []
        # strict mode tracks the LIVE key set (inserted minus erased)
        self._keys: np.ndarray | None = None
        if strict:
            self._keys = self._collect_keys(boxes) if boxes is not None else np.empty(
                0, dtype=np.int64
            )
        self._n_at_build = int(self._keys.shape[0]) if self._keys is not None else (
            boxes.count() if boxes is not None else 0
        )

    @staticmethod
    def _collect_keys(ds: Dataset) -> np.ndarray:
        cols = ds.select_columns(["idx"]).take_all()
        return np.array([r["idx"] for r in cols], dtype=np.int64)

    # ----------------------------------------------------------- mutation

    def insert_batch(self, boxes: Dataset) -> None:
        if self.strict:
            new = self._collect_keys(boxes)
            dup = np.intersect1d(new, self._keys)
            if dup.size:
                raise ValueError(f"Index already exists: {dup[0]}")
            self._keys = np.concatenate([self._keys, new])
        # re-inserting a previously erased id is safe without any tombstone
        # bookkeeping: prior tombstones are pinned to earlier deltas, so the
        # old row stays dead while this delta's row is live
        self._deltas.append(boxes)
        self._maybe_rebuild()

    def erase(self, ids) -> None:
        ids = np.atleast_1d(np.asarray(ids, dtype=np.int64))
        if self.strict:
            missing = np.setdiff1d(ids, self._keys)
            if missing.size:
                raise ValueError(f"Index not found: {missing[0]}")
            self._keys = np.setdiff1d(self._keys, ids)
        self._tombs.append((np.unique(ids), len(self._deltas)))
        self._maybe_rebuild()

    def _maybe_rebuild(self) -> None:
        if not self.strict or self._n_at_build == 0:
            return
        size = self.size()
        if size > REBUILD_THRESHOLD * self._n_at_build:
            self.rebuild()
        elif REBUILD_THRESHOLD * size < self._n_at_build:
            self.rebuild()

    def rebuild(self) -> None:
        """Compaction: materialize (base ∪ delta − tombstones) as the new
        base — per-cell deterministic, the distributed analog of the
        reference's DFS-harvest + bulk re-build (``prtree.h:420-468``)."""
        ds = self.dataset()
        if ds is None:
            return
        self._base = ds.materialize()
        self._deltas = []
        self._tombs = []
        if self.strict:
            self._keys = self._collect_keys(self._base)
            self._n_at_build = int(self._keys.shape[0])
        else:
            self._n_at_build = self._base.count()

    # ------------------------------------------------------------ access

    def _dead_for_segment(self, seg: int) -> np.ndarray:
        """ids erased AFTER segment ``seg`` was appended (base is seg=-1,
        delta i is seg=i) — only those tombstones mask that segment."""
        hits = [ids for ids, cutoff in self._tombs if cutoff > seg]
        if not hits:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(hits))

    @staticmethod
    def _drop_dead(part: Dataset, dead: np.ndarray) -> Dataset:
        if not dead.size:
            return part

        def drop(tbl: pa.Table) -> pa.Table:
            ids = st.col_np(tbl, "idx")
            return tbl.filter(pa.array(~np.isin(ids, dead)))

        return part.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)

    def dataset(self) -> Dataset | None:
        """The live row set as a lazy Dataset (tombstones filtered
        per-generation: each erase masks only rows inserted before it)."""
        parts: list[tuple[Dataset, int]] = []
        if self._base is not None:
            parts.append((self._base, -1))
        parts.extend((d, i) for i, d in enumerate(self._deltas))
        if not parts:
            return None
        ds = None
        for part, seg in parts:
            part = self._drop_dead(part, self._dead_for_segment(seg))
            ds = part if ds is None else ds.union(part)
        return ds

    def size(self) -> int:
        if self.strict:
            return int(self._keys.shape[0])
        ds = self.dataset()
        if ds is None:
            return 0
        return ds.count()

    def __len__(self) -> int:
        return self.size()

    # ----------------------------------------------------------- queries

    def batch_query(self, queries: Dataset, **kw) -> Dataset:
        ds = self.dataset()
        if ds is None:
            raise ValueError("Cannot query an empty tree")
        return sj.spatial_join(ds, queries, res=self.res, **kw)

    def query_intersections(self, **kw) -> Dataset:
        ds = self.dataset()
        if ds is None:
            raise ValueError("Cannot query an empty tree")
        return sj.self_join(ds, res=self.res, **kw)

    # ------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        from .state.manifest import save_tree

        ds = self.dataset()
        if ds is None or self.size() == 0:
            # parity: reference raises on saving an empty tree (core.py:173-178)
            raise ValueError("Cannot save an empty tree")
        save_tree(ds, path, res=self.res)

    @classmethod
    def load(cls, path: str, strict: bool = True) -> "RayPRTree":
        from .state.manifest import load_tree

        ds, res = load_tree(path)
        return cls(ds, res=res, strict=strict)
