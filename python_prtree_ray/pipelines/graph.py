"""Connected components over near-dup pair graphs — cluster dedup.

After pair mining (minhash / simhash / ngram / embedding near-dups), a
training-data pipeline groups pairs into CLUSTERS and keeps one
canonical document per cluster. This is connected components with the
canonical label = MIN doc id in the component.

Algorithm: min-label propagation with pointer jumping (the simple member
of the large-star/small-star family — Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each round is exactly TWO
coarse-bucket shuffles:

1. message pass: every symmetrized edge (u, v) sends ``label[u]`` to
   ``v`` — an in-bucket hash join (coarse ``bucket_of(node)`` groupby,
   vectorized searchsorted inside the bucket; never per-node groups).
   The pointer jump rides the SAME shuffle: each labeled node v emits a
   VIRTUAL edge ``lab[v] → v``, so v also receives ``lab[lab[v]]`` —
   chains shortcut and convergence is O(log diameter), not O(diameter).
2. min reduce: ``label'[v] = min(label[v], incoming messages)`` — a
   second coarse-bucket groupby with a lexsort segment-min, which also
   counts changed labels (the self-message carries the previous label).

Rounds run until no label changes. Per round the shuffle volume is
O(|E| + |V|) (node, int64) pairs — the labels table holds only nodes
that HAVE an edge, a tiny fraction of the corpus. Labels are
materialized per round (bounded by |V|), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..config import tune_context
from ..functions.buckets import bucket_of
from ..config import COMBINE_BATCH

N_BUCKETS = 512


def _pin_or_spill(
    ds: Dataset, spill_dir: str | None, tag: str
) -> "tuple[Dataset, str | None]":
    """Pin an edge-list-sized Dataset for multi-pass reuse; returns
    ``(dataset, checkpoint_path)`` — path is None on the pin path.

    ``spill_dir=None`` pins in the object store (``materialize()`` —
    fastest when it fits; Ray spills under pressure but the pin
    survives). With a ``spill_dir``, the rows are checkpointed to
    parquet there and re-streamed per pass — the shape for edge lists
    larger than the cluster's aggregate object store. Identical rows
    either way."""
    if spill_dir is None:
        return ds.materialize(), None
    import os as _os
    import uuid as _uuid

    import ray

    path = _os.path.join(spill_dir, f"{tag}-{_uuid.uuid4().hex[:12]}")
    ds.write_parquet(path)
    return ray.data.read_parquet(path), path


def _seed_labels(pairs: Dataset, id_a: str, id_b: str) -> Dataset:
    """(node, lab=node) for every node appearing in any pair — per-batch
    dedup, coarse-bucket global dedup."""

    def local(tbl: pa.Table) -> pa.Table:
        a = tbl.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.unique(np.concatenate([a, b]))
        return pa.table({"node": n, "kb": bucket_of(n, N_BUCKETS)})

    def dedup(group: pa.Table) -> pa.Table:
        n = np.unique(group.column("node").to_numpy(zero_copy_only=False))
        return pa.table({"node": n, "lab": n})

    return (
        pairs.map_batches(
            local,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("kb")
        .map_groups(dedup, batch_format="pyarrow")
    )


# The near-dup EDGE LIST is tiny relative to the corpus (only docs with
# a close twin appear). Up to this many pairs, collect it (bounded, like
# the spatial broadcast path) and run the vectorized label propagation
# locally — Ray's per-round shuffle overhead dwarfs the compute for
# small graphs. Past the limit, the distributed 2-shuffle rounds run.
CC_COLLECT_LIMIT = 4_000_000


def _collect_pairs(pairs: Dataset, limit: int) -> pa.Table | None:
    batches: list[pa.Table] = []
    n = 0
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
        if n > limit:
            return None
        batches.append(b)
    return pa.concat_tables(batches) if batches else pa.table({})


def _local_cc(tbl: pa.Table, id_a: str, id_b: str) -> Dataset:
    """Driver-side vectorized min-label propagation with pointer jumping
    (same algorithm as the distributed rounds, numpy arrays instead of
    shuffles)."""
    import ray

    if tbl.num_rows == 0:
        return ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
            .empty_table()
        )
    a = tbl.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    lab = np.arange(nodes.shape[0], dtype=np.int64)
    while True:
        prev = lab.copy()
        np.minimum.at(lab, ia, lab[ib])
        np.minimum.at(lab, ib, lab[ia])
        lab = lab[lab]  # pointer jump
        if np.array_equal(lab, prev):
            break
    # lab holds indices; nodes is sorted, so min reachable index == min id
    return ray.data.from_arrow(
        pa.table({"doc_id": nodes, "cluster_id": nodes[lab]})
    )


def connected_components(
    pairs: Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
    collect_limit: int = CC_COLLECT_LIMIT,
    spill_dir: str | None = None,
) -> Dataset:
    """(doc_id, cluster_id) for every node in ``pairs``; ``cluster_id``
    is the smallest doc id reachable through the pair graph. Edge lists
    up to ``collect_limit`` rows take the bounded-collect local path;
    larger graphs run the distributed 2-shuffle rounds.

    The symmetrized edge list is static across rounds and re-read every
    round. ``spill_dir=None`` pins it in the object store
    (``materialize()`` — fastest when it fits; Ray spills to local disk
    under pressure but the pin survives all rounds). Passing a
    ``spill_dir`` checkpoints the edges to parquet there instead and
    re-streams them per round — the shape for edge lists larger than the
    cluster's aggregate object store. Labels are node-sized (one row per
    vertex) and always stay object-store-backed. Both paths produce
    identical labels."""
    tune_context()
    if collect_limit:
        tbl = _collect_pairs(pairs, collect_limit)
        if tbl is not None:
            return _local_cc(tbl, id_a, id_b)

    # symmetrized edge list, bucketed by the SENDING node — static across
    # rounds, so materialize once and reuse
    def sym(tbl: pa.Table) -> pa.Table:
        a = tbl.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "kb": bucket_of(src, N_BUCKETS),
                "src": src,
                "dst": dst,
                "lab": np.full(src.shape[0], -1, dtype=np.int64),
            }
        )

    edges = pairs.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    edges, epath = _pin_or_spill(edges, spill_dir, "cc-edges")
    labels = _seed_labels(pairs, id_a, id_b).materialize()

    for _round in range(max_rounds):
        # label-entry rows (dst=-1) + VIRTUAL jump edges lab[v] -> v
        def tag_labels(tbl: pa.Table) -> pa.Table:
            n = tbl.column("node").to_numpy(zero_copy_only=False)
            l = tbl.column("lab").to_numpy(zero_copy_only=False)
            v = l != n  # jump edges only where the label moved off self
            return pa.table(
                {
                    "kb": np.concatenate(
                        [bucket_of(n, N_BUCKETS), bucket_of(l[v], N_BUCKETS)]
                    ),
                    "src": np.concatenate([n, l[v]]),
                    "dst": np.concatenate(
                        [np.full(n.shape[0], -1, dtype=np.int64), n[v]]
                    ),
                    "lab": np.concatenate(
                        [l, np.full(int(v.sum()), -1, dtype=np.int64)]
                    ),
                }
            )

        tagged = labels.map_batches(
            tag_labels, batch_format="pyarrow", zero_copy_batch=True
        ).union(edges)

        def send(group: pa.Table) -> pa.Table:
            src = group.column("src").to_numpy(zero_copy_only=False)
            dst = group.column("dst").to_numpy(zero_copy_only=False)
            lab = group.column("lab").to_numpy(zero_copy_only=False)
            is_lab = dst == -1
            nodes = src[is_lab]
            labs = lab[is_lab]
            order = np.argsort(nodes)
            nodes_s, labs_s = nodes[order], labs[order]
            e = ~is_lab
            pos = np.searchsorted(nodes_s, src[e])
            # messages to every edge target + each node's own label
            # (own=1 marks the self-message so the reduce can compare the
            # new min against the node's PREVIOUS label exactly)
            ne = int(e.sum())
            node_out = np.concatenate([dst[e], nodes_s])
            return pa.table(
                {
                    "mb": bucket_of(node_out, N_BUCKETS),
                    "node": node_out,
                    "lab": np.concatenate([labs_s[pos], labs_s]),
                    "own": np.concatenate(
                        [
                            np.zeros(ne, dtype=np.int8),
                            np.ones(nodes_s.shape[0], dtype=np.int8),
                        ]
                    ),
                }
            )

        msgs = tagged.groupby("kb").map_groups(send, batch_format="pyarrow")

        # min reduce per node + changed flag vs the node's previous label
        def min_reduce(group: pa.Table) -> pa.Table:
            n = group.column("node").to_numpy(zero_copy_only=False)
            lab = group.column("lab").to_numpy(zero_copy_only=False)
            own = group.column("own").to_numpy(zero_copy_only=False)
            order = np.lexsort((lab, n))
            n_s, lab_s = n[order], lab[order]
            starts = np.concatenate([[0], np.nonzero(np.diff(n_s))[0] + 1])
            new_lab = lab_s[starts]
            sel = own == 1
            own_order = np.argsort(n[sel])
            old_lab = lab[sel][own_order]  # aligned with n_s[starts]
            changed = (new_lab < old_lab).astype(np.int64)
            return pa.table(
                {"node": n_s[starts], "lab": new_lab, "changed": changed}
            )

        new_labels = (
            msgs.groupby("mb").map_groups(min_reduce, batch_format="pyarrow")
        ).materialize()
        n_changed = new_labels.aggregate(Sum("changed", alias_name="n"))["n"] or 0
        labels = new_labels  # 'changed' column is ignored by tag_labels
        if n_changed == 0:
            break

    if epath is not None:
        # labels are materialized; the edge checkpoint (one full copy of
        # the symmetrized edge list per call) is dead weight — remove it
        # so repeated calls against the same spill_dir can't fill disk
        import shutil as _shutil

        _shutil.rmtree(epath, ignore_errors=True)

    def rename(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": tbl.column("node"), "cluster_id": tbl.column("lab")}
        )

    return labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def point_clusters(points: Dataset, radius: float, res: int = 5) -> Dataset:
    """Fixed-radius spatial clustering (single-linkage / DBSCAN-without-
    min-pts): every point within ``radius`` of another is linked, and
    each connected component gets the smallest member id as
    ``cluster_id``. Output ``(doc_id, cluster_id)`` — one row per point
    that has at least one neighbor (singletons are implicit, matching
    :func:`connected_components` over a pair list).

    Composite of two already-scale-shaped stages: the radius SELF-join
    (degenerate point-boxes through :func:`..knn.radius_join` — broadcast
    or cell path, exact Euclidean filter) and the label-propagation
    connected components. The distance expression is bitwise the SQL
    oracle's (``(px+px)*0.5 == px`` exactly in float64)."""
    from .knn import radius_join

    def as_boxes(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "idx": tbl.column("query_id"),
                "xmin": tbl.column("px"),
                "ymin": tbl.column("py"),
                "xmax": tbl.column("px"),
                "ymax": tbl.column("py"),
            }
        )

    def undirect(tbl: pa.Table) -> pa.Table:
        keep = pc.less(tbl.column("query_id"), tbl.column("idx"))
        t = tbl.filter(keep)
        return pa.table({"id_a": t.column("query_id"), "id_b": t.column("idx")})

    boxes = points.map_batches(as_boxes, batch_format="pyarrow", zero_copy_batch=True)
    pairs = radius_join(boxes, points, radius=radius, res=res).map_batches(
        undirect, batch_format="pyarrow", zero_copy_batch=True
    )
    return connected_components(pairs)


def dedup_survivors(
    docs: Dataset,
    pairs: Dataset,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> Dataset:
    """The END of the dedup pipeline: the documents that SURVIVE cluster
    dedup — everything except non-canonical members of near-dup
    clusters (cluster canonical = smallest id, the
    :func:`connected_components` label). Output ``(id_col, *carry_cols)``.

    Composite of scale-shaped stages: connected components over the
    pair list, a stateless filter to the (typically much smaller)
    non-canonical id set, and the one-shuffle co-partitioned ANTI join —
    document payloads cross the wire once, id-only tables otherwise."""

    def non_canon(tbl: pa.Table) -> pa.Table:
        keep = pc.not_equal(tbl.column("doc_id"), tbl.column("cluster_id"))
        return pa.table({id_col: tbl.filter(keep).column("doc_id")})

    drop = connected_components(pairs, id_a=id_a, id_b=id_b).map_batches(
        non_canon, batch_format="pyarrow", zero_copy_batch=True
    )
    from .join import hash_equi_join

    return hash_equi_join(
        docs, drop, on=id_col, left_cols=carry_cols, how="anti"
    )


# ------------------------------------------------------------------ DBSCAN


def _batch_node_counts(tbl: pa.Table, col: str) -> pa.Table:
    """Per-batch (node, n) count partials — combiner for bucketed_sum."""
    a = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
    if a.size == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    s = np.sort(a)
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]][: s.size])
    return pa.table(
        {
            "node": pa.array(s[starts]),
            "n": pa.array(np.diff(np.r_[starts, s.shape[0]]).astype(np.int64)),
        }
    )


def _bucket_lookup(
    items: Dataset,
    key_col: str,
    members: Dataset,
    member_col: str,
    value_col: str | None,
    out_col: str,
    default: int,
    payload: dict[str, pa.DataType] | None = None,
    n_buckets: int = N_BUCKETS,
) -> Dataset:
    """In-bucket hash lookup (the CC message-pass join shape): append
    ``out_col`` to ``items`` = the member's ``value_col`` where
    ``items.key_col`` matches ``members.member_col``, else ``default``.
    With ``value_col=None`` this is a semi-join FLAG (1/0). ONE coarse
    key-bucket shuffle; vectorized searchsorted inside each bucket.
    ``payload`` names the non-key item columns (with Arrow types) to
    carry through — passed explicitly so the LAZY pipeline never needs a
    schema() probe (which would execute the upstream graph early).

    Deliberately NOT :func:`..join.hash_equi_join` (same one-shuffle
    co-partitioned plan, different contract): this preserves items 1:1
    (first match wins, never expands on duplicate member keys), fills
    misses with ``default`` instead of null, and takes explicit payload
    types where hash_equi_join probes ``schema()``. Fixes to the shared
    plan shape (bucketing, salting) should land in both."""
    i_types = dict(payload or {})
    payload = list(i_types)

    def tag_items(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"kb": pa.array(bucket_of(k, n_buckets)), "_k": pa.array(k)}
        for n in payload:
            cols[f"p_{n}"] = tbl.column(n)
        cols["_v"] = pa.array(np.full(k.shape[0], default, np.int64))
        cols["_m"] = pa.array(np.zeros(k.shape[0], np.int8))
        return pa.table(cols)

    def tag_members(tbl: pa.Table) -> pa.Table:
        k = (
            tbl.column(member_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = (
            tbl.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if value_col is not None
            else np.ones(k.shape[0], np.int64)
        )
        cols = {"kb": pa.array(bucket_of(k, n_buckets)), "_k": pa.array(k)}
        for n in payload:
            cols[f"p_{n}"] = pa.nulls(k.shape[0], i_types[n])
        cols["_v"] = pa.array(v)
        cols["_m"] = pa.array(np.ones(k.shape[0], np.int8))
        return pa.table(cols)

    unioned = items.map_batches(
        tag_items, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        members.map_batches(
            tag_members, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def resolve(group: pa.Table) -> pa.Table:
        m = group.column("_m").to_numpy(zero_copy_only=False)
        k = group.column("_k").to_numpy(zero_copy_only=False)
        v = group.column("_v").to_numpy(zero_copy_only=False)
        is_m = m == 1
        mk, mv = k[is_m], v[is_m]
        order = np.argsort(mk, kind="stable")
        mk_s, mv_s = mk[order], mv[order]
        it = np.flatnonzero(~is_m)
        out = np.full(it.shape[0], default, np.int64)
        if mk_s.size:
            pos = np.searchsorted(mk_s, k[it])
            pos_c = np.minimum(pos, mk_s.size - 1)
            hit = mk_s[pos_c] == k[it]
            out[hit] = mv_s[pos_c[hit]]
        sel = pa.array(it)
        cols = {key_col: pa.array(k[it])}
        for n in payload:
            cols[n] = group.column(f"p_{n}").take(sel)
        cols[out_col] = pa.array(out)
        return pa.table(cols)

    return unioned.groupby("kb").map_groups(resolve, batch_format="pyarrow")


def dbscan_clusters(
    points: Dataset,
    eps: float,
    min_pts: int,
    res: int = 5,
    spill_dir: str | None = None,
) -> Dataset:
    """Exact DBSCAN over 2D points: ``(doc_id, cluster_id, role)`` with
    role in {core, border, noise}. A point is CORE when its closed
    eps-ball holds >= ``min_pts`` points (itself included); clusters are
    connected components of core-core eps-edges; a non-core point within
    eps of a core is a BORDER of the smallest such cluster id
    (deterministic tie-break — classic DBSCAN leaves this
    order-dependent); remaining pair-graph members are NOISE. Points
    with NO neighbor within eps never enter the pair graph and are
    implicit noise (same contract as :func:`point_clusters` singletons).

    Scale shape: the eps self-join reuses :func:`..knn.radius_join`
    (broadcast or cell-shuffle path); degree, core flags, border
    messages, and role resolution are each ONE coarse node-bucket
    shuffle (``_bucket_lookup`` / ``bucketed_sum``); the component pass
    is the O(log diameter)-round label propagation above. Nothing
    data-sized touches the driver.
    """
    from .knn import radius_join
    from .merge import bucketed_sum

    def as_boxes(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "idx": tbl.column("query_id"),
                "xmin": tbl.column("px"),
                "ymin": tbl.column("py"),
                "xmax": tbl.column("px"),
                "ymax": tbl.column("py"),
            }
        )

    def directed(tbl: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(tbl.column("query_id"), tbl.column("idx")))
        t = tbl.filter(keep)
        return pa.table({"a": t.column("query_id"), "b": t.column("idx")})

    boxes = points.map_batches(
        as_boxes, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = radius_join(boxes, points, radius=eps, res=res).map_batches(
        directed, batch_format="pyarrow", zero_copy_batch=True
    )
    # reused 4x below; edge-list sized -> honors spill_dir (at 100 TB a
    # dense eps-graph outgrows the object store). The checkpoints stay on
    # disk: the returned Dataset is lazy over them (unlike CC, which
    # materializes its labels and can delete its edge checkpoint).
    pairs, _ = _pin_or_spill(pairs, spill_dir, "dbscan-pairs")

    # degree (neighbors excluding self) -> core node set
    deg = bucketed_sum(
        pairs.map_batches(
            lambda t: _batch_node_counts(t, "a"),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="node",
        value_cols=("n",),
    )
    thr = int(min_pts)

    def core_only(tbl: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.add(tbl.column("n"), 1), thr)
        return tbl.filter(keep).select(["node"])

    # node-sized and read by three lookups below — pin once
    core = deg.map_batches(
        core_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # tag both endpoints with core flags (two bucket lookups)
    tagged = _bucket_lookup(
        _bucket_lookup(
            pairs, "b", core, "node", None, "b_core", 0,
            payload={"a": pa.int64()},
        ),
        "a",
        core,
        "node",
        None,
        "a_core",
        0,
        payload={"b": pa.int64(), "b_core": pa.int64()},
    )
    tagged, _ = _pin_or_spill(tagged, spill_dir, "dbscan-tagged")

    # components over core-core edges; singleton cores label themselves
    def both_core(tbl: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(tbl.column("a_core"), 1), pc.equal(tbl.column("b_core"), 1)
        )
        return tbl.filter(keep).select(["a", "b"])

    core_edges = tagged.map_batches(
        both_core, batch_format="pyarrow", zero_copy_batch=True
    )
    cc = connected_components(core_edges, id_a="a", id_b="b", spill_dir=spill_dir)
    core_labels = _bucket_lookup(
        core, "node", cc, "doc_id", "cluster_id", "cid", -1, payload={}
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "cid": pa.array(
                    np.where(
                        t.column("cid").to_numpy(zero_copy_only=False) == -1,
                        t.column("node").to_numpy(zero_copy_only=False),
                        t.column("cid").to_numpy(zero_copy_only=False),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # border: non-core -> min cluster id among core neighbors
    def border_cand(tbl: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(tbl.column("a_core"), 0), pc.equal(tbl.column("b_core"), 1)
        )
        return tbl.filter(keep).select(["a", "b"])

    cand = tagged.map_batches(
        border_cand, batch_format="pyarrow", zero_copy_batch=True
    )
    msgs = _bucket_lookup(
        cand, "b", core_labels, "node", "cid", "cid", -1,
        payload={"a": pa.int64()},
    )

    def min_combine(tbl: pa.Table) -> pa.Table:
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        c = tbl.column("cid").to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "cid": pa.array([], pa.int64())}
            )
        order = np.lexsort((c, a))
        a_s, c_s = a[order], c[order]
        starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]][: a_s.size])
        return pa.table(
            {"node": pa.array(a_s[starts]), "cid": pa.array(c_s[starts])}
        )

    border = bucketed_sum(
        msgs.map_batches(
            min_combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="node",
        value_cols=("cid",),
        reduce="min",
    )

    # noise: non-core with no core neighbor (per-node max of flags)
    def flag_combine(tbl: pa.Table) -> pa.Table:
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        ac = tbl.column("a_core").to_numpy(zero_copy_only=False).astype(np.int64)
        bc = tbl.column("b_core").to_numpy(zero_copy_only=False).astype(np.int64)
        if a.size == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "a_core": pa.array([], pa.int64()),
                    "b_core": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(a, kind="stable")
        a_s = a[order]
        starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]][: a_s.size])
        return pa.table(
            {
                "node": pa.array(a_s[starts]),
                "a_core": pa.array(np.maximum.reduceat(ac[order], starts)),
                "b_core": pa.array(np.maximum.reduceat(bc[order], starts)),
            }
        )

    flags = bucketed_sum(
        tagged.map_batches(
            flag_combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="node",
        value_cols=("a_core", "b_core"),
        reduce="max",
    )

    def noise_only(tbl: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(tbl.column("a_core"), 0), pc.equal(tbl.column("b_core"), 0)
        )
        t = tbl.filter(keep)
        return pa.table(
            {
                "node": t.column("node"),
                "cid": pa.array(np.full(t.num_rows, -1, np.int64)),
            }
        )

    noise = flags.map_batches(
        noise_only, batch_format="pyarrow", zero_copy_batch=True
    )

    def with_role(role: str):
        def add(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": tbl.column("node"),
                    "cluster_id": tbl.column("cid"),
                    "role": pa.array([role] * tbl.num_rows, pa.string()),
                }
            )

        return add

    return (
        core_labels.map_batches(with_role("core"), batch_format="pyarrow")
        .union(border.map_batches(with_role("border"), batch_format="pyarrow"))
        .union(noise.map_batches(with_role("noise"), batch_format="pyarrow"))
    )
