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

Key-set tracking note: ``strict`` id bookkeeping is two-tier. While the
live key count stays ≤ ``KEY_CACHE_LIMIT`` the key set is cached on the
driver (sorted int64 array, bounded collect — never an unbounded pull)
and checks are O(driver). The first time a bounded collect overflows the
tree switches to BIG mode: no driver key state at all — duplicate-insert
checks run as a keys-only bucketed semi-join (one shuffle of the idx
columns), erase/set_obj membership as a broadcast probe pass over the
live key column, and ``size()`` from maintained counters. Both modes
raise the same errors on the same inputs; only the physical plan
differs. (Exactness beats a Bloom filter here: the semi-join touches
8 bytes/row and the probe is one streamed pass, so the sketch would
only save a scan the strict contract has to pay anyway on the hit
path.)
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
        precision: "PrecisionConfig | None" = None,
        spill_dir: str | None = None,
    ):
        from .functions.validate import PrecisionConfig

        self.res = res
        self.strict = strict
        # compaction target: rebuild() streams the compacted base HERE
        # (partitioned parquet via state/manifest) and reloads it lazily —
        # never pinning the whole table in the object store. None → a
        # process-lifetime temp dir (single-node default); at cluster
        # scale pass shared storage.
        self._spill_dir = spill_dir
        self._compact_gen = 0
        self._validate = validate
        self._precision = precision or PrecisionConfig()
        self._objs: dict[int, object] = {}
        if validate and boxes is not None:
            from .functions.validate import validated_boxes_dataset

            boxes = validated_boxes_dataset(boxes, self._precision)
        self._base = boxes
        # dimensionality from the schema, once: canonical coordinate
        # names in (mins..., maxs...) order. A 3D/4D tree MUST join on
        # all its axes — the 2D default silently widens results.
        self._box_cols: tuple[str, ...] | None = None
        if boxes is not None:
            names = set(boxes.schema().base_schema.names)
            mins = [c for c in ("xmin", "ymin", "zmin", "tmin") if c in names]
            maxs = [c for c in ("xmax", "ymax", "zmax", "tmax") if c in names]
            if len(mins) != len(maxs) or len(mins) < 2:
                raise ValueError(
                    f"boxes dataset needs paired min/max coordinate "
                    f"columns, got {sorted(names)}"
                )
            self._box_cols = tuple(mins + maxs)
        self._deltas: list[Dataset] = []
        # generational tombstones: (ids, n_deltas_at_erase) — each entry
        # masks the base and deltas[:n_deltas_at_erase] only
        self._tombs: list[tuple[np.ndarray, int]] = []
        # strict mode: driver key cache while small, counters-only above
        # KEY_CACHE_LIMIT (see module docstring). _keys None + strict on
        # == BIG mode.
        self._keys: np.ndarray | None = None
        self._n_live = 0
        if strict and boxes is not None:
            self._keys = self._collect_keys_bounded(boxes)
            self._n_live = (
                int(self._keys.shape[0]) if self._keys is not None else boxes.count()
            )
        elif strict:
            self._keys = np.empty(0, dtype=np.int64)
        self._n_at_build = self._n_live if strict else (
            boxes.count() if boxes is not None else 0
        )

    # driver key-cache ceiling (16 MB of int64); above it strict checks
    # go distributed. Class attribute so tests can force BIG mode.
    KEY_CACHE_LIMIT = 2_000_000

    def _collect_keys_bounded(self, ds: Dataset) -> np.ndarray | None:
        """idx column as a driver array, or None once it exceeds
        KEY_CACHE_LIMIT (the stream is abandoned there — a too-big key
        set never finishes materializing)."""
        limit = self.KEY_CACHE_LIMIT
        chunks: list[np.ndarray] = []
        total = 0
        for b in ds.select_columns(["idx"]).iter_batches(batch_format="pyarrow"):
            chunks.append(b.column("idx").to_numpy(zero_copy_only=False))
            total += chunks[-1].shape[0]
            if total > limit:
                return None
        if not chunks:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(chunks).astype(np.int64, copy=False)

    # ------------------------------------------- strict BIG-mode kernels

    def _live_keys(self) -> Dataset | None:
        ds = self.dataset()
        return None if ds is None else ds.select_columns(["idx"])

    def _dup_witness(self, new_keys: Dataset) -> int | None:
        """First id present in BOTH the live key set and ``new_keys`` —
        a keys-only bucketed semi-join (the only thing that shuffles is
        8 bytes/row of idx), None when disjoint."""
        from .functions.buckets import bucket_of

        live = self._live_keys()
        if live is None:
            return None

        def tag(side: int):
            def f(tbl: pa.Table) -> pa.Table:
                ids = st.col_np(tbl, "idx")
                return pa.table(
                    {
                        "idx": ids,
                        "side": np.full(ids.shape[0], side, dtype=np.int8),
                        "bucket": bucket_of(ids, 512),
                    }
                )

            return f

        a = live.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
        b = new_keys.select_columns(["idx"]).map_batches(
            tag(1), batch_format="pyarrow", zero_copy_batch=True
        )

        def intersect(group: pa.Table) -> pa.Table:
            ids = st.col_np(group, "idx")
            side = group.column("side").to_numpy(zero_copy_only=False)
            dup = np.intersect1d(ids[side == 0], ids[side == 1])
            return pa.table({"idx": dup[:1]})  # one witness per bucket

        hits = (
            a.union(b)
            .groupby("bucket")
            .map_groups(intersect, batch_format="pyarrow")
            .take(1)
        )
        return int(hits[0]["idx"]) if hits else None

    def _match_counts(self, ids: np.ndarray) -> dict[int, int]:
        """live-row count per probed id — ONE streamed pass over the live
        key column against a broadcast probe set; the collected result is
        bounded by len(ids) × blocks, never by table size."""
        import ray as _ray

        live = self._live_keys()
        if live is None:
            return {}
        probe_ref = _ray.put(np.unique(ids))

        def probe(tbl: pa.Table) -> pa.Table:
            want = _ray.get(probe_ref)
            got = st.col_np(tbl, "idx")
            hit = got[np.isin(got, want)]
            u, c = np.unique(hit, return_counts=True)
            return pa.table(
                {"idx": u, "n": pa.array(c.astype(np.int64), type=pa.int64())}
            )

        out: dict[int, int] = {}
        for r in live.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        ).iter_rows():
            out[int(r["idx"])] = out.get(int(r["idx"]), 0) + int(r["n"])
        return out

    # ----------------------------------------------------------- mutation

    def insert(self, bb, idx: int | None = None, obj: object | None = None) -> int:
        """Single-record insert — reference ``insert(bb, idx=None, obj)``
        parity (``core.py:454-509``): at least one of ``idx``/``obj`` must
        be given (``core.py:455-456`` "Specify index or obj"); ``idx=None``
        auto-assigns ``n + 1``; ``obj`` is attached via :meth:`set_obj`.
        Sugar over a 1-row delta Dataset. Returns the idx used.

        The box is ALWAYS validated with the live precision config,
        regardless of the ``validate`` construction flag — parity with the
        reference, whose single-record insert unconditionally checks
        coordinates (raises on min > max / NaN). Bulk
        :meth:`insert_batch` validation stays opt-in (``validate=True``):
        at 100-TB scale per-row validation is a deliberate, paid-for pass.
        """
        import ray as _ray

        from .functions.validate import validate_boxes

        if idx is None and obj is None:
            raise ValueError("Specify index or obj")
        b = np.asarray(bb, dtype=np.float64).ravel()
        if b.shape[0] % 2 or b.shape[0] < 4:
            raise ValueError(f"bb must be (xmin, ymin, ..., xmax, ymax, ...); got {bb!r}")
        validate_boxes(b[None, :], self._precision)
        if idx is None:
            idx = self.size() + 1
        d = b.shape[0] // 2
        names = [("xmin", "ymin", "zmin", "tmin")[i] for i in range(d)] + [
            ("xmax", "ymax", "zmax", "tmax")[i] for i in range(d)
        ]
        cols: dict = {"idx": np.array([idx], dtype=np.int64)}
        cols.update({n: np.array([b[i]]) for i, n in enumerate(names)})
        self.insert_batch(_ray.data.from_arrow(pa.table(cols)))
        if obj is not None:
            self.set_obj(idx, obj)
        return int(idx)

    def insert_batch(self, boxes: Dataset) -> None:
        """Bulk insert of a box Dataset. Validation runs only when the tree
        was constructed with ``validate=True`` (the scale-path default is
        off; see :meth:`insert` for the single-record contrast)."""
        if self._validate:
            from .functions.validate import validated_boxes_dataset

            boxes = validated_boxes_dataset(boxes, self._precision)
        if self._box_cols is None:
            names = set(boxes.schema().base_schema.names)
            mins = [c for c in ("xmin", "ymin", "zmin", "tmin") if c in names]
            maxs = [c for c in ("xmax", "ymax", "zmax", "tmax") if c in names]
            if len(mins) == len(maxs) and len(mins) >= 2:
                self._box_cols = tuple(mins + maxs)
        if self.strict:
            new = (
                self._collect_keys_bounded(boxes)
                if self._keys is not None
                else None
            )
            if self._keys is not None and new is not None:
                dup = np.intersect1d(new, self._keys)
                if dup.size:
                    raise ValueError(f"Index already exists: {dup[0]}")
                merged = np.concatenate([self._keys, new])
                n_new = new.shape[0]
                if merged.shape[0] > self.KEY_CACHE_LIMIT:
                    self._keys = None  # graduate to BIG mode
                else:
                    self._keys = merged
            else:
                # BIG mode (or an insert batch too big to cache): exact
                # distributed duplicate check, then counters only
                w = self._dup_witness(boxes)
                if w is not None:
                    raise ValueError(f"Index already exists: {w}")
                n_new = boxes.count()
                self._keys = None
            self._n_live += n_new
        # re-inserting a previously erased id is safe without any tombstone
        # bookkeeping: prior tombstones are pinned to earlier deltas, so the
        # old row stays dead while this delta's row is live
        self._deltas.append(boxes)
        self._maybe_rebuild()

    def erase(self, ids) -> None:
        ids = np.atleast_1d(np.asarray(ids, dtype=np.int64))
        if self.strict:
            if self._keys is not None:
                missing = np.setdiff1d(ids, self._keys)
                if missing.size:
                    raise ValueError(f"Index not found: {missing[0]}")
                survivors = self._keys[~np.isin(self._keys, ids)]
                self._n_live = int(survivors.shape[0])
                self._keys = survivors
            else:
                counts = self._match_counts(ids)
                missing = np.setdiff1d(np.unique(ids), np.fromiter(
                    counts.keys(), dtype=np.int64, count=len(counts)
                ))
                if missing.size:
                    raise ValueError(f"Index not found: {missing[0]}")
                self._n_live -= sum(counts.values())
        self._tombs.append((np.unique(ids), len(self._deltas)))
        if self._objs:  # bulk erases with no registry stay O(1)
            for i in ids.tolist():
                self._objs.pop(i, None)
        self._maybe_rebuild()

    # ------------------------------------------------- objects & precision

    def set_obj(self, idx: int, obj: object) -> None:
        """Attach a Python payload to a live id (reference ``set_obj``,
        ``core.py:585-599``). Driver-side registry, broadcast to workers
        only when a query asks for ``return_obj`` — the scale path for
        bulk payloads is the ``carry_cols`` column projection instead."""
        if self.strict:
            present = (
                bool(np.isin(np.int64(idx), self._keys))
                if self._keys is not None
                else bool(self._match_counts(np.array([idx], dtype=np.int64)))
            )
            if not present:
                raise ValueError(f"Index not found: {idx}")
        self._objs[int(idx)] = obj

    def get_obj(self, idx: int) -> object | None:
        return self._objs.get(int(idx))

    def set_relative_epsilon(self, v: float) -> None:
        # reference setter surface: prtree.h:960-975
        if v < 0:
            raise ValueError("relative_epsilon must be >= 0")
        self._precision.relative_epsilon = float(v)

    def get_relative_epsilon(self) -> float:
        return self._precision.relative_epsilon

    def set_absolute_epsilon(self, v: float) -> None:
        if v < 0:
            raise ValueError("absolute_epsilon must be >= 0")
        self._precision.absolute_epsilon = float(v)

    def get_absolute_epsilon(self) -> float:
        return self._precision.absolute_epsilon

    def set_adaptive_epsilon(self, on: bool) -> None:
        self._precision.adaptive_epsilon = bool(on)

    def get_adaptive_epsilon(self) -> bool:
        return self._precision.adaptive_epsilon

    def set_subnormal_detection(self, on: bool) -> None:
        # reference toggle: prtree.h:996-1008; applies to every
        # subsequent validated insert/build
        self._precision.subnormal_detection = bool(on)

    def get_subnormal_detection(self) -> bool:
        return self._precision.subnormal_detection

    def _maybe_rebuild(self) -> None:
        if not self.strict or self._n_at_build == 0:
            return
        size = self.size()
        if size > REBUILD_THRESHOLD * self._n_at_build:
            self.rebuild()
        elif REBUILD_THRESHOLD * size < self._n_at_build:
            self.rebuild()

    def rebuild(self) -> None:
        """Compaction: stream (base ∪ delta − tombstones) to partitioned
        parquet (``state/manifest.save_tree``) and reload it as the new
        lazy base — per-cell deterministic, the distributed analog of the
        reference's DFS-harvest + bulk re-build (``prtree.h:420-468``).
        Storage-backed (not ``materialize()``): the 1.25× auto-trigger
        never pins the full table in the object store; each generation's
        files are dropped once the next generation lands."""
        import os
        import shutil
        import tempfile

        from .state.manifest import load_tree, save_tree

        ds = self.dataset()
        if ds is None:
            return
        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix="rayprtree-compact-")
        gen = self._compact_gen + 1
        path = os.path.join(self._spill_dir, f"gen-{gen:06d}")
        # a stale generation dir (same spill_dir reused across processes)
        # carries a completed manifest whose resume logic would skip ALL
        # new rows and silently adopt the OLD table — always start clean
        shutil.rmtree(path, ignore_errors=True)
        man = save_tree(ds, path, res=self.res)
        if man["metrics"]["total_rows"] == 0:
            shutil.rmtree(path, ignore_errors=True)
            self._base = None
        else:
            self._base, _ = load_tree(path)
        if self._compact_gen:
            shutil.rmtree(
                os.path.join(self._spill_dir, f"gen-{self._compact_gen:06d}"),
                ignore_errors=True,
            )
        self._compact_gen = gen
        self._deltas = []
        self._tombs = []
        if self._base is None:
            self._keys = np.empty(0, dtype=np.int64) if self.strict else None
            self._n_at_build = 0
            self._n_live = 0
        elif self.strict:
            self._keys = self._collect_keys_bounded(self._base)
            self._n_live = (
                int(self._keys.shape[0])
                if self._keys is not None
                else int(man["metrics"]["total_rows"])
            )
            self._n_at_build = self._n_live
        else:
            self._n_at_build = int(man["metrics"]["total_rows"])

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
            return self._n_live
        ds = self.dataset()
        if ds is None:
            return 0
        return ds.count()

    def __len__(self) -> int:
        return self.size()

    # ----------------------------------------------------------- queries

    def batch_query(
        self,
        queries: Dataset,
        return_obj: bool = False,
        expand_epsilon: bool = False,
        **kw,
    ) -> Dataset:
        """(query_id, idx) intersections; ``return_obj`` adds the payload
        registered via :meth:`set_obj` (reference ``batch_query(...,
        return_obj=True)``). ``expand_epsilon`` widens each query box by
        the adaptive epsilon (clamp formula, ``prtree.h:81-116``) computed
        from the GLOBAL query extent — one tiny min/max aggregate over the
        query side, so the widening (and therefore the result set) is
        identical at any batch partitioning."""
        ds = self.dataset()
        if ds is None:
            raise ValueError("Cannot query an empty tree")
        if expand_epsilon:
            prec = self._precision
            # two-phase, zero-pin: phase 1 aggregates the global extent
            # over a PROJECTED coordinate view (4-8 float columns — spans/
            # text never enter the aggregate), phase 2 re-executes the
            # query lineage to widen. The upstream lineage therefore runs
            # twice; when it is expensive, spill_dir checkpoints the query
            # side to parquet once and both phases read the files instead
            # (never materialize() — nothing pins in the object store).
            if self._spill_dir is not None:
                import os as _os
                import uuid as _uuid

                qpath = _os.path.join(
                    self._spill_dir, f"expand-q-{_uuid.uuid4().hex[:12]}"
                )
                queries.write_parquet(qpath)
                import ray as _ray

                queries = _ray.data.read_parquet(qpath)
            qschema = queries.schema().base_schema.names
            mins = [c for c in ("xmin", "ymin", "zmin", "tmin") if c in qschema]
            maxs = [c for c in ("xmax", "ymax", "zmax", "tmax") if c in qschema]
            from ray.data.aggregate import Max as _Max, Min as _Min

            bounds = queries.select_columns(mins + maxs).aggregate(
                *[_Min(c, alias_name=f"lo_{c}") for c in mins],
                *[_Max(c, alias_name=f"hi_{c}") for c in maxs],
            )
            if not bounds or any(v is None for v in bounds.values()):
                bounds = None  # empty query side: epsilon degenerates to abs
            extent = max(
                (
                    float(bounds[f"hi_{hi}"]) - float(bounds[f"lo_{lo}"])
                    for lo, hi in zip(mins, maxs)
                ),
                default=0.0,
            ) if bounds else 0.0
            eps = prec.epsilon_for(extent)

            def widen(tbl: pa.Table) -> pa.Table:
                cols = {c: tbl.column(c) for c in tbl.column_names}
                import pyarrow.compute as pc

                for c in mins:
                    cols[c] = pc.subtract(cols[c], pa.scalar(eps))
                for c in maxs:
                    cols[c] = pc.add(cols[c], pa.scalar(eps))
                return pa.table(cols)

            queries = queries.map_batches(
                widen, batch_format="pyarrow", zero_copy_batch=True
            )
        if self._box_cols is not None and "box_cols" not in kw:
            kw = {**kw, "box_cols": self._box_cols}
        pairs = sj.spatial_join(ds, queries, res=self.res, **kw)
        if not return_obj:
            return pairs
        import ray as _ray

        # decide the obj column's Arrow type ONCE on the driver — a
        # per-batch decision would give different batches incompatible
        # schemas (native in one block, pickled in another)
        try:
            obj_type = pa.array(list(self._objs.values())).type
            objs_payload = dict(self._objs)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # arbitrary / mixed Python payloads (reference set_obj accepts
            # anything picklable, core.py:20-31): ship them pickled, as
            # the reference itself does on the wire
            import pickle

            obj_type = pa.binary()
            objs_payload = {k: pickle.dumps(v) for k, v in self._objs.items()}
        objs_ref = _ray.put(objs_payload)

        def attach(tbl: pa.Table) -> pa.Table:
            objs = _ray.get(objs_ref)
            ids = tbl.column("idx").to_numpy(zero_copy_only=False)
            vals = [objs.get(int(i)) for i in ids]
            return tbl.append_column("obj", pa.array(vals, type=obj_type))

        return pairs.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def query_intersections(self, **kw) -> Dataset:
        ds = self.dataset()
        if ds is None:
            raise ValueError("Cannot query an empty tree")
        if self._box_cols is not None and "box_cols" not in kw:
            kw = {**kw, "box_cols": self._box_cols}
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
