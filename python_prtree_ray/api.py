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
        self._tombstones: np.ndarray = np.empty(0, dtype=np.int64)
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
            live = np.setdiff1d(self._keys, self._tombstones)
            dup = np.intersect1d(new, live)
            if dup.size:
                raise ValueError(f"Index already exists: {dup[0]}")
            self._keys = np.concatenate([self._keys, new])
            # resurrecting a tombstoned id: drop its tombstone
            self._tombstones = np.setdiff1d(self._tombstones, new)
        self._deltas.append(boxes)
        self._maybe_rebuild()

    def erase(self, ids) -> None:
        ids = np.atleast_1d(np.asarray(ids, dtype=np.int64))
        if self.strict:
            live = np.setdiff1d(self._keys, self._tombstones)
            missing = np.setdiff1d(ids, live)
            if missing.size:
                raise ValueError(f"Index not found: {missing[0]}")
        self._tombstones = np.union1d(self._tombstones, ids)
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
        self._tombstones = np.empty(0, dtype=np.int64)
        if self.strict:
            self._keys = self._collect_keys(self._base)
            self._n_at_build = int(self._keys.shape[0])
        else:
            self._n_at_build = self._base.count()

    # ------------------------------------------------------------ access

    def dataset(self) -> Dataset | None:
        """The live row set as a lazy Dataset (tombstones filtered)."""
        parts = ([self._base] if self._base is not None else []) + self._deltas
        if not parts:
            return None
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        if self._tombstones.size:
            dead = self._tombstones

            def drop(tbl: pa.Table) -> pa.Table:
                ids = st.col_np(tbl, "idx")
                return tbl.filter(pa.array(~np.isin(ids, dead)))

            ds = ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
        return ds

    def size(self) -> int:
        ds = self.dataset()
        if ds is None:
            return 0
        if self.strict:
            return int(np.setdiff1d(self._keys, self._tombstones).shape[0])
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
