"""Approximate / exact nearest-neighbor search over embedding columns.

- :func:`ann_brute_topk` — exact cosine top-k: broadcast the (small)
  query matrix once via ``ray.put``, per-batch matmul + per-batch partial
  top-k, then one tiny ``groupby(query)`` top-k merge. The scan side
  streams; nothing materializes.
- :func:`ann_lsh_topk` — scale path: random-hyperplane LSH buckets
  restrict each query to matching buckets (probing the query's bucket
  ring), trading recall for a bounded candidate set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..config import tune_context


def _emb_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl.column(col).combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def ann_brute_topk(
    embeddings: Dataset,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """(query_id, vec_id, rank): exact cosine top-k per query vector."""
    tune_context()
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64)))

    def partial(tbl: pa.Table) -> pa.Table:
        qmat, qids = ray.get(ref)
        emb = _emb_matrix(tbl, emb_col)
        norm = np.maximum(np.sqrt((emb * emb).sum(axis=1)), 1e-30)
        sims = (emb / norm[:, None]) @ qmat.T  # (n, m)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k, emb.shape[0])
        # per-query partial top-k within this batch
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, m)
        m = qmat.shape[0]
        out_q = np.repeat(qids, kk)
        rows = part.T.ravel()
        return pa.table(
            {
                "query_id": out_q,
                id_col: ids[rows],
                "sim": sims[rows, np.repeat(np.arange(m), kk)],
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_id": np.full(order.shape[0], qid, dtype=np.int64),
                id_col: ids[order],
                "rank": np.arange(1, order.shape[0] + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def ann_lsh_topk(
    embeddings: Dataset,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_planes: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Approximate top-k: sign-LSH buckets; each query probes its own
    bucket plus 1-bit-flip neighbors (multi-probe). Recall < 1 by design;
    the scale path when a full scan per query is too expensive."""
    tune_context()
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    planes = np.random.default_rng(23).standard_normal((q.shape[1], n_planes))
    qsig = (qn @ planes) > 0
    pw = 1 << np.arange(n_planes, dtype=np.int64)
    qbuckets = (qsig * pw[None, :]).sum(axis=1)
    # multi-probe: own bucket + flip each bit
    probe = {int(b) for b in qbuckets}
    for b in qbuckets:
        for j in range(n_planes):
            probe.add(int(b) ^ (1 << j))
    probe_arr = np.fromiter(probe, dtype=np.int64)
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), planes, probe_arr))

    def partial(tbl: pa.Table) -> pa.Table:
        qmat, qids, pl, probes = ray.get(ref)
        emb = _emb_matrix(tbl, emb_col)
        sig = (emb @ pl) > 0
        buckets = (sig * pw[None, :]).sum(axis=1)
        keep = np.isin(buckets, probes)
        emb = emb[keep]
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        if emb.shape[0] == 0:
            return pa.table(
                {
                    "query_id": np.empty(0, np.int64),
                    id_col: np.empty(0, np.int64),
                    "sim": np.empty(0, np.float64),
                }
            )
        norm = np.maximum(np.sqrt((emb * emb).sum(axis=1)), 1e-30)
        sims = (emb / norm[:, None]) @ qmat.T
        kk = min(k, emb.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        m = qmat.shape[0]
        rows = part.T.ravel()
        return pa.table(
            {
                "query_id": np.repeat(qids, kk),
                id_col: ids[rows],
                "sim": sims[rows, np.repeat(np.arange(m), kk)],
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_id": np.full(order.shape[0], qid, dtype=np.int64),
                id_col: ids[order],
                "rank": np.arange(1, order.shape[0] + 1, dtype=np.int64),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def ann_ivf_topk(
    embeddings: Dataset,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_cells: int = 32,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """IVF approximate top-k — the coarse-quantizer scale path.

    Index: every vector is assigned to its nearest of ``n_cells``
    centroids (deterministic quantizer: seeded Gaussian directions —
    no training pass, so any two runs and any parallelism build the
    identical index). Query: each query probes its ``n_probe`` nearest
    cells only; within a batch, non-probed vectors are masked out of the
    cosine matmul. Same per-batch-partial → tiny-merge shape as
    :func:`ann_brute_topk`; recall < 1 by design (rows-only check).
    """
    tune_context()
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    dim = q.shape[1]
    cents = np.random.default_rng(42).standard_normal((n_cells, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    # cells each query probes (by centroid cosine)
    qcell = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), cents, qcell))

    def partial(tbl: pa.Table) -> pa.Table:
        qn_, qids_, cents_, qcell_ = ray.get(ref)
        m = _emb_matrix(tbl, emb_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vcell = np.argmax(mn @ cents_.T, axis=1)  # each vector's IVF cell
        out_q, out_v, out_s = [], [], []
        sims = qn_ @ mn.T  # (nq, batch)
        # mask: vector participates for query only if its cell is probed
        probed = np.zeros((qn_.shape[0], mn.shape[0]), dtype=bool)
        for p in range(qcell_.shape[1]):
            probed |= vcell[None, :] == qcell_[:, p][:, None]
        sims = np.where(probed, sims, -np.inf)
        kk = min(k, mn.shape[0])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for qi in range(qn_.shape[0]):
            sel = part[qi][np.isfinite(sims[qi, part[qi]])]
            out_q.append(np.full(sel.shape[0], qids_[qi], dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(sims[qi, sel])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "sim": np.concatenate(out_s),
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        sim = group.column("sim").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * order.shape[0], pa.int64()),
                "vec_id": pa.array(vid[order], pa.int64()),
                "rank": pa.array(
                    np.arange(1, order.shape[0] + 1, dtype=np.int64)
                ),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
