"""Approximate / exact nearest-neighbor search over embedding columns.

- :func:`ann_brute_topk` — exact cosine top-k: broadcast the (small)
  query matrix once via ``ray.put``, per-batch matmul + THRESHOLD-
  INCLUSIVE per-batch partial top-k (every row tied with the local k-th
  survives, so the global merge can apply the deterministic
  (sim DESC, id ASC) order regardless of partitioning), then one
  coarse-bucket vectorized merge. The scan side streams; nothing
  materializes.
- :func:`ann_lsh_topk` — sign-LSH buckets restrict each query to
  matching buckets (multi-probe 1-bit flips), trading recall for a
  bounded candidate set.
- :func:`ann_ivf_topk` — IVF coarse quantizer: each batch matmuls ONLY
  the rows that fall in some query's probed cells (the pruning saves
  FLOPs, not just changes answers).

All merges group by a coarse 256-bucket query hash and rank every query
in the bucket with one vectorized lexsort — never a per-query
``map_groups`` (one interpreter call per query would dominate at 1M
queries).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context


def _emb_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl.column(col).combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _empty_partial(id_col: str) -> pa.Table:
    return pa.table(
        {
            "query_id": np.empty(0, np.int64),
            id_col: np.empty(0, np.int64),
            "sim": np.empty(0, np.float64),
        }
    )


def _threshold_topk_rows(
    q: np.ndarray, sim: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-query local top-k, threshold-INCLUSIVE: keep every row with
    sim >= the query's k-th best in this set (ties included). Vectorized
    over all queries at once (lexsort + segment arithmetic)."""
    if q.size == 0:
        return q, sim, ids
    order = np.lexsort((ids, -sim, q))
    q_s, sim_s, id_s = q[order], sim[order], ids[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(q_s))[0] + 1])
    sizes = np.diff(np.concatenate([starts, [q_s.shape[0]]]))
    kth_pos = starts + np.minimum(k, sizes) - 1
    kth = np.where(sizes >= k, sim_s[kth_pos], -np.inf)
    keep = sim_s >= np.repeat(kth, sizes)
    return q_s[keep], sim_s[keep], id_s[keep]


def _merge_topk(partials: Dataset, k: int, id_col: str = "vec_id") -> Dataset:
    """(query_id, id, sim) partials → (query_id, id, rank) via the shared
    coarse-bucket merge (sim DESC, id ASC tie-break)."""
    from .merge import bucketed_topk

    return bucketed_topk(partials, k, id_col=id_col, value_col="sim", descending=True)


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
        if emb.shape[0] == 0:
            return _empty_partial(id_col)
        norm = np.maximum(np.sqrt((emb * emb).sum(axis=1)), 1e-30)
        sims = (emb / norm[:, None]) @ qmat.T  # (n, m)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        kk = min(k, emb.shape[0])
        # threshold-inclusive local cut: every row tied at the k-th
        # similarity survives, so the merged (sim DESC, id ASC) top-k is
        # partitioning-invariant even with duplicate embeddings
        kth = -np.partition(-sims, kk - 1, axis=0)[kk - 1]  # (m,)
        rows, qcols = np.nonzero(sims >= kth[None, :])
        return pa.table(
            {
                "query_id": qids[qcols],
                id_col: ids[rows],
                "sim": sims[rows, qcols],
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(partials, k, id_col)


def ann_classify(
    embeddings: Dataset,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> Dataset:
    """kNN-vote classification: ``(query_id, label)`` — the majority
    label among each query's exact cosine top-k neighbors (tie → the
    smallest label). The standard embedding-space label-transfer op.

    Scale shape: the top-k stage is :func:`ann_brute_topk` (broadcast
    query matrix, threshold-inclusive partials); labels attach via the
    co-partitioned hash join (ONE shuffle of (query_id, vec_id) pairs —
    queries × k rows — against the pruned (vec_id, label) projection,
    never the embedding vectors); the vote folds queries × k rows.
    """
    from ..functions.buckets import bucket_of
    from .join import hash_equi_join

    tune_context()
    topk = ann_brute_topk(
        embeddings, query_vectors, query_ids, k=k, id_col=id_col, emb_col=emb_col
    ).select_columns(["query_id", id_col])

    def cast_ids(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: tbl.column(id_col).cast(pa.int64()),
                label_col: tbl.column(label_col).cast(pa.int64()),
            }
        )

    labels = embeddings.select_columns([id_col, label_col]).map_batches(
        cast_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = hash_equi_join(
        topk, labels, on=id_col, left_cols=("query_id",), right_cols=(label_col,)
    )

    def bucket(tbl: pa.Table) -> pa.Table:
        qv = tbl.column("query_id").to_numpy(zero_copy_only=False)
        return tbl.append_column("qb", pa.array(bucket_of(qv, 64)))

    def vote(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                label_col: pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        q = group.column("query_id").to_numpy(zero_copy_only=False)
        lab = group.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((lab, q))
        q_s, l_s = q[order], lab[order]
        new_run = np.ones(q_s.shape[0], dtype=bool)
        new_run[1:] = (np.diff(q_s) != 0) | (np.diff(l_s) != 0)
        starts = np.flatnonzero(new_run)
        cnt = np.diff(np.r_[starts, q_s.shape[0]])
        rq, rl = q_s[starts], l_s[starts]
        # winner per query: max count, tie -> smallest label
        worder = np.lexsort((rl, -cnt, rq))
        wq, wl = rq[worder], rl[worder]
        first = np.ones(wq.shape[0], dtype=bool)
        first[1:] = np.diff(wq) != 0
        return pa.table(
            {
                "query_id": pa.array(wq[first], pa.int64()),
                label_col: pa.array(wl[first], pa.int64()),
            }
        )

    keyed = pairs.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("qb").map_groups(vote, batch_format="pyarrow")


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
        if emb.shape[0] == 0:
            return _empty_partial(id_col)
        sig = (emb @ pl) > 0
        buckets = (sig * pw[None, :]).sum(axis=1)
        keep = np.isin(buckets, probes)
        emb = emb[keep]
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        if emb.shape[0] == 0:
            return _empty_partial(id_col)
        norm = np.maximum(np.sqrt((emb * emb).sum(axis=1)), 1e-30)
        sims = (emb / norm[:, None]) @ qmat.T
        kk = min(k, emb.shape[0])
        kth = -np.partition(-sims, kk - 1, axis=0)[kk - 1]
        rows, qcols = np.nonzero(sims >= kth[None, :])
        return pa.table(
            {
                "query_id": qids[qcols],
                id_col: ids[rows],
                "sim": sims[rows, qcols],
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(partials, k, id_col)


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
    cells only, and each batch matmuls ONLY the rows assigned to some
    probed cell — FLOPs scale with n_probe/n_cells of a full scan
    (the cell loop is bounded by n_cells, never by query count).
    Recall < 1 by design (rows-only check).
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
        if m.shape[0] == 0:
            return _empty_partial(id_col)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vcell = np.argmax(mn @ cents_.T, axis=1)  # each vector's IVF cell
        # invert the cell assignment once (sorted positions + bounds)
        vorder = np.argsort(vcell, kind="stable")
        bounds = np.searchsorted(vcell[vorder], np.arange(cents_.shape[0] + 1))
        out_q, out_v, out_s = [], [], []
        for c in np.unique(qcell_):  # <= n_cells iterations, never per-query
            vpos = vorder[bounds[c] : bounds[c + 1]]
            if vpos.size == 0:
                continue
            qrows = np.nonzero((qcell_ == c).any(axis=1))[0]
            if qrows.size == 0:
                continue
            sims = qn_[qrows] @ mn[vpos].T  # (nq_c, nv_c) — probed rows only
            out_q.append(np.repeat(qrows, vpos.size))
            out_v.append(np.tile(vpos, qrows.size))
            out_s.append(sims.ravel())
        if not out_q:
            return _empty_partial(id_col)
        q_all = np.concatenate(out_q)
        v_all = np.concatenate(out_v)
        s_all = np.concatenate(out_s)
        q_k, s_k, v_k = _threshold_topk_rows(q_all, s_all, v_all, k)
        return pa.table(
            {
                "query_id": qids_[q_k],
                id_col: ids[v_k],
                "sim": s_k,
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(partials, k, id_col)


def label_centroid_sums(
    embeddings: Dataset,
    emb_col: str = "embedding",
    label_col: str = "label",
    scale: float = 10000.0,
) -> Dataset:
    """Distributed per-label vector aggregation in LONG format:
    ``(label, dim, sum_q, n_vecs)`` where ``sum_q`` is the sum of the
    component quantized as ``floor(v * scale)`` — the centroid is
    ``sum_q / (scale * n_vecs)`` to quantization precision. Integer sums
    keep the reduction order-independent (bit-exact across partitionings
    and vs SQL), unlike a float mean.

    Scale shape: each batch reduces to at most (labels x D) rows
    (axis-0 ``reduceat`` over the label-sorted quantized matrix — no
    Python loop), and only those partials shuffle."""
    from ray.data.aggregate import Sum

    def partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "label": np.empty(0, np.int64),
                    "dim": np.empty(0, np.int64),
                    "sum_q": np.empty(0, np.int64),
                    "n_vecs": np.empty(0, np.int64),
                }
            )
        E = _emb_matrix(tbl, emb_col)
        q = np.floor(E * scale).astype(np.int64)
        lab = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        ls, qs = lab[order], q[order]
        starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]][: ls.size])
        sums = np.add.reduceat(qs, starts, axis=0)
        cnt = np.diff(np.r_[starts, ls.shape[0]]).astype(np.int64)
        k, d = sums.shape
        return pa.table(
            {
                "label": np.repeat(ls[starts], d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "sum_q": sums.ravel(),
                "n_vecs": np.repeat(cnt, d),
            }
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(["label", "dim"]).aggregate(
        Sum("sum_q", alias_name="sum_q"),
        Sum("n_vecs", alias_name="n_vecs"),
    )


def ann_range(
    embeddings: Dataset,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """(query_id, vec_id): RANGE search — every corpus vector whose
    cosine similarity with the query is >= ``threshold`` (the radius
    twin of :func:`ann_brute_topk`; retrieval recalls "everything this
    similar", not "the k best"). Self-matches (same id) are kept — a
    query drawn from the corpus reports itself, as the SQL twin does.

    Scale shape identical to the top-k path: the query matrix
    broadcasts ONCE via ``ray.put``; the corpus streams through one
    map-only matmul per batch; qualifying (query, id) pairs are emitted
    directly — no merge stage at all, since a threshold needs no global
    ranking."""
    tune_context()
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64)))
    thr = float(threshold)

    def partial(tbl: pa.Table) -> pa.Table:
        qmat, qids = ray.get(ref)
        emb = _emb_matrix(tbl, emb_col)
        if emb.shape[0] == 0:
            return pa.table(
                {
                    "query_id": np.empty(0, np.int64),
                    id_col: np.empty(0, np.int64),
                }
            )
        norm = np.maximum(np.sqrt((emb * emb).sum(axis=1)), 1e-30)
        sims = (emb / norm[:, None]) @ qmat.T  # (n, m)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rows, qcols = np.nonzero(sims >= thr)
        return pa.table({"query_id": qids[qcols], id_col: ids[rows]})

    return embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )


def ann_pq_topk(
    embeddings: Dataset,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    m_sub: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Product-quantization approximate top-k — the COMPRESSED scale
    path (the memory-bound complement of :func:`ann_ivf_topk`'s
    FLOP-bound pruning). Each normalized vector is split into ``m_sub``
    subspaces; each subvector quantizes to its best-cosine centroid of a
    seeded deterministic codebook (no training pass — identical index at
    any parallelism, like the IVF quantizer) plus its exact subvector
    norm, so a vector is ``m_sub`` byte-codes + ``m_sub`` scales instead
    of D floats. Queries score by asymmetric LUT lookup:
    ``sim ≈ Σ_m ‖v_m‖ · (q_m · c_codes[m])`` — M multiply-adds per
    (query, vector) instead of D.

    At corpus scale the encode is a one-time stored artifact; this
    pipeline encodes per batch only because the test corpus arrives raw.
    LUTs for all queries are precomputed once on the driver
    ((m_sub, nq, n_codes) — KB-sized) and broadcast via ``ray.put``;
    the scan streams, partial top-k per batch (threshold-inclusive),
    ONE coarse-bucket merge. Recall < 1 by design (rows-only check;
    pytest measures the floor vs :func:`ann_brute_topk`).
    """
    tune_context()
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    dim = q.shape[1]
    if dim % m_sub != 0:
        raise ValueError(f"ann_pq_topk: dim {dim} not divisible by m_sub {m_sub}")
    ds_ = dim // m_sub
    cents = []
    for m in range(m_sub):
        c = np.random.default_rng(7 + m).standard_normal((n_codes, ds_))
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        cents.append(c)
    # asymmetric LUTs: luts[m][qi][code] = q_m . c — computed ONCE
    luts = np.stack(
        [qn[:, m * ds_ : (m + 1) * ds_] @ cents[m].T for m in range(m_sub)]
    )
    ref = ray.put(
        (luts, np.asarray(query_ids, dtype=np.int64), np.stack(cents))
    )

    def partial(tbl: pa.Table) -> pa.Table:
        luts_, qids_, cents_ = ray.get(ref)
        mat = _emb_matrix(tbl, emb_col)
        if mat.shape[0] == 0:
            return _empty_partial(id_col)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        nb = mn.shape[0]
        nq = luts_.shape[1]
        sims = np.zeros((nq, nb))
        for m in range(m_sub):
            sub = mn[:, m * ds_ : (m + 1) * ds_]
            nrm = np.linalg.norm(sub, axis=1)
            codes = np.argmax(sub @ cents_[m].T, axis=1)
            sims += luts_[m][:, codes] * nrm[None, :]
        qrow = np.repeat(np.arange(nq, dtype=np.int64), nb)
        vrow = np.tile(np.arange(nb, dtype=np.int64), nq)
        q_k, s_k, v_k = _threshold_topk_rows(qrow, sims.ravel(), vrow, k)
        return pa.table(
            {"query_id": qids_[q_k], id_col: ids[v_k], "sim": s_k}
        )

    partials = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(partials, k, id_col)


def emb_covariance(vectors: Dataset, col: str = "embedding", scale_bits: int = 20) -> Dataset:
    """Exact population covariance matrix of the embedding table — the
    whitening / drift-monitoring statistic of an embedding corpus:
    upper-triangle rows ``(i, j, cov)`` for dimensions i ≤ j.

    Exactness: each float32 component is widened to double (exact),
    scaled by the power-of-two ``2^scale_bits`` (exact — no rounding)
    and FLOORED to an int; with exact integer sums (n, Σxᵢ, Σxᵢxⱼ),
    ``cov_ij = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ) / n²`` on the scaled grid is ONE
    double division of arbitrary-precision ints — bitwise-equal to the
    HUGEINT SQL twin. (Float sums are NOT distribution-exact — adding
    them in shuffle order would break parallelism invariance; the
    scaled-int grid is the same trick as ``clark_evans``.)

    Scale shape: per-batch (1 + d + d²)-int moment partials (the d²
    product matrix via one integer matmul per batch — vectors never
    shuffle, never transpose globally); the driver folds one partial
    row per block and emits the d²-sized result. |x| < 2^(21+
    scale_bits-20) keeps per-batch products < 2^44 and block sums far
    inside int64.
    """
    tune_context()
    S = float(1 << scale_bits)

    def partial(tbl: pa.Table) -> pa.Table:
        E = _emb_matrix(tbl, col)
        if E.shape[0] == 0:
            return pa.table(
                {
                    "n": pa.array([0], pa.int64()),
                    "sv": pa.array([np.zeros(0, np.int64).tobytes()], pa.binary()),
                    "sp": pa.array([np.zeros(0, np.int64).tobytes()], pa.binary()),
                }
            )
        X = np.floor(E.astype(np.float64) * S).astype(np.int64)
        sv = X.sum(axis=0, dtype=np.int64)
        sp = X.T @ X  # integer matmul: d x d exact int64
        return pa.table(
            {
                "n": pa.array([E.shape[0]], pa.int64()),
                "sv": pa.array([sv.tobytes()], pa.binary()),
                "sp": pa.array([sp.ravel().tobytes()], pa.binary()),
            }
        )

    parts = vectors.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    n = 0
    sv = None
    sp = None
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for r in range(t.num_rows):
            nn = int(t.column("n")[r].as_py())
            if nn == 0:
                continue
            # accumulate in arbitrary-precision ints: block partials are
            # int64-safe, but the corpus total (2^45 per row) is not at
            # 10^9+ rows
            v = np.frombuffer(t.column("sv")[r].as_py(), np.int64).astype(object)
            p = np.frombuffer(t.column("sp")[r].as_py(), np.int64).astype(object)
            n += nn
            sv = v if sv is None else sv + v
            sp = p if sp is None else sp + p
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "cov": pa.array([], pa.float64()),
                }
            )
        )
    d = sv.shape[0]
    sp = sp.reshape(d, d)
    iu, ju = np.triu_indices(d)
    num = (
        int(n) * sp[iu, ju].astype(object)
        - sv[iu].astype(object) * sv[ju].astype(object)
    )
    den = n * n
    cov = np.array([float(v) / float(den) for v in num], np.float64)
    return ray.data.from_arrow(
        pa.table(
            {
                "i": pa.array(iu, pa.int64()),
                "j": pa.array(ju, pa.int64()),
                "cov": pa.array(cov, pa.float64()),
            }
        )
    )


def emb_covariance_sql(table: str = "embeddings", col: str = "embedding", scale_bits: int = 20) -> str:
    """DuckDB twin of :func:`emb_covariance` — lockstep unnest +
    subscripts, identical FLOOR scaling, HUGEINT sums, one division."""
    S = float(1 << scale_bits)
    return f"""
WITH u AS (SELECT vec_id,
                  CAST(FLOOR(CAST(unnest({col}) AS DOUBLE) * {S!r}) AS BIGINT) AS v,
                  generate_subscripts({col}, 1) AS i
           FROM {table}),
s AS (SELECT i, CAST(SUM(v) AS HUGEINT) AS sv FROM u GROUP BY i),
p AS (SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS sp
      FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i),
g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM {table})
SELECT CAST(p.i - 1 AS BIGINT) AS i, CAST(p.j - 1 AS BIGINT) AS j,
       CAST(g.n * p.sp - sa.sv * sb.sv AS DOUBLE)
       / CAST(g.n * g.n AS DOUBLE) AS cov
FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j, g
"""


def emb_dim_quantiles(
    vectors: Dataset, col: str = "embedding", scale_bits: int = 10
) -> Dataset:
    """Per-DIMENSION quantiles of the embedding corpus — the feature-
    distribution drift monitor: ``(dim, p50, p90, p99)`` over the
    FLOOR-scaled components (power-of-two grid ``2^scale_bits``, exact
    — same trick as :func:`emb_covariance`). Quantiles are exact R-7 on
    the scaled-int grid via the distinct-value histogram fold.

    Scale shape: the long (dim, value) expansion fuses into the
    quantile partial (one map stage — the expansion never
    materializes); the shuffle ships distinct (dim, grid-value) pair
    counts, bounded by d·grid, never by corpus rows; embeddings never
    reshuffle.
    """
    tune_context()
    from .quantiles import int_quantiles

    S = float(1 << scale_bits)

    def expand(tbl: pa.Table) -> pa.Table:
        E = _emb_matrix(tbl, col)
        if E.shape[0] == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()), "q": pa.array([], pa.int64())}
            )
        q = np.floor(E * S).astype(np.int64)
        dim = np.tile(np.arange(E.shape[1], dtype=np.int64), E.shape[0])
        return pa.table({"dim": dim, "q": q.ravel()})

    return int_quantiles(
        vectors.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        key_col="dim",
        int_col="q",
    )


def emb_dim_quantiles_sql(
    table: str = "embeddings", col: str = "embedding", scale_bits: int = 10
) -> str:
    """DuckDB twin of :func:`emb_dim_quantiles` — lockstep unnest,
    identical FLOOR scaling, quantile_cont (R-7)."""
    S = float(1 << scale_bits)
    return f"""
WITH u AS (SELECT CAST(generate_subscripts({col}, 1) - 1 AS BIGINT) AS dim,
                  CAST(FLOOR(CAST(unnest({col}) AS DOUBLE) * {S!r}) AS BIGINT)
                    AS q
           FROM {table})
SELECT dim, quantile_cont(q, 0.5) AS p50, quantile_cont(q, 0.9) AS p90,
       quantile_cont(q, 0.99) AS p99
FROM u GROUP BY dim
"""


def emb_norm_outliers(
    vectors: Dataset,
    col: str = "embedding",
    id_col: str = "vec_id",
    q: float = 0.99,
    scale_bits: int = 5,
) -> Dataset:
    """Embedding-norm outliers — vectors whose COARSE-grid squared norm
    lies strictly above the corpus's exact R-7 ``q``-quantile (the
    norm-blowup / corrupt-vector screen of an embedding pipeline):
    ``(vec_id, norm2q)`` with ``norm2q = Σ ⌊e·2^scale_bits⌋²``.

    The deliberately coarse grid (2^5 per unit) BOUNDS the norm value
    domain, so the threshold pass is a histogram whose size depends on
    the grid — not the corpus; quantile exactness is then
    driver-trivial (same `_interp_quantiles` double as DuckDB
    quantile_cont). Two streaming passes; vectors never shuffle.
    """
    tune_context()
    from .merge import bucketed_sum
    from .quantiles import _interp_quantiles

    S = float(1 << scale_bits)

    def norms(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "norm2q": pa.array([], pa.int64())}
            )
        E = _emb_matrix(tbl, col)
        qv = np.floor(E * S).astype(np.int64)
        return pa.table(
            {id_col: tbl.column(id_col), "norm2q": (qv * qv).sum(axis=1)}
        )

    nds = vectors.map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)

    def hist_partial(tbl: pa.Table) -> pa.Table:
        v, n = np.unique(
            tbl.column("norm2q").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"norm2q": v, "n": n.astype(np.int64)})

    hist = bucketed_sum(
        nds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="norm2q",
        value_cols=("n",),
    ).take_all()  # grid-bounded metadata at any corpus size
    vals = np.array([r["norm2q"] for r in hist], np.int64)
    cnts = np.array([r["n"] for r in hist], np.int64)
    order = np.argsort(vals)
    thr = _interp_quantiles(vals[order], cnts[order], [q])[0]

    def gate(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tbl.filter(pc.greater(tbl.column("norm2q"), pa.scalar(thr)))

    return nds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def emb_norm_outliers_sql(
    table: str = "embeddings",
    col: str = "embedding",
    q: float = 0.99,
    scale_bits: int = 5,
) -> str:
    """DuckDB twin of :func:`emb_norm_outliers` — identical coarse
    grid, quantile_cont threshold, strict compare."""
    S = float(1 << scale_bits)
    return f"""
WITH u AS (SELECT vec_id,
                  CAST(FLOOR(CAST(unnest({col}) AS DOUBLE) * {S!r}) AS BIGINT)
                    AS qv
           FROM {table}),
n AS (SELECT vec_id, CAST(SUM(qv * qv) AS BIGINT) AS norm2q
      FROM u GROUP BY vec_id),
t AS (SELECT quantile_cont(norm2q, {q!r}) AS thr FROM n)
SELECT vec_id, norm2q FROM n, t WHERE norm2q > t.thr
"""


def label_cohesion(
    vectors: Dataset,
    col: str = "embedding",
    label_col: str = "label",
    scale_bits: int = 20,
) -> Dataset:
    """Intra-label cohesion of the embedding corpus — the exact SUM of
    pairwise dot products within each label WITHOUT enumerating pairs,
    via the moment identity ``Σ_{i≠j} qᵢ·qⱼ = |Σq|² − Σ|qᵢ|²`` on the
    scaled-int grid: ``(label, n_vecs, pair_dot_sum, mean_pair_dot)``
    (clustering-quality / label-noise screen). Integer arithmetic end
    to end; the two emitted doubles are single roundings of exact ints,
    identical to the HUGEINT SQL twin by construction.

    Scale shape: per-batch per-label (n, Σq vector, Σ|q|²) moment
    partials — O(labels·d) ints per batch, vectors never shuffle; the
    driver folds one row per (block, label) in arbitrary precision
    (int64-safe partials need ``batch_size ≤ 4096`` at d=64: row
    Σ|q|² ≈ 2⁵⁰). Output is label-sized.
    """
    tune_context()
    S = float(1 << scale_bits)

    def partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sv": pa.array([], pa.binary()),
                "ssq": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        E = _emb_matrix(tbl, col)
        q = np.floor(E * S).astype(np.int64)
        lab = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        l_s = lab[order]
        q_s = q[order]
        starts = np.flatnonzero(np.r_[True, l_s[1:] != l_s[:-1]][: l_s.size])
        sv = np.add.reduceat(q_s, starts, axis=0)
        ssq = np.add.reduceat((q_s * q_s).sum(axis=1), starts)
        return pa.table(
            {
                "label": l_s[starts],
                "n": np.diff(np.r_[starts, l_s.size]).astype(np.int64),
                "sv": pa.array([row.tobytes() for row in sv], pa.binary()),
                "ssq": ssq,
            }
        )

    parts = vectors.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,  # keeps the per-batch Σ|q|² partial inside int64
    )

    acc: dict[int, list] = {}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for r in range(t.num_rows):
            lab = int(t.column("label")[r].as_py())
            sv = np.frombuffer(t.column("sv")[r].as_py(), np.int64).astype(object)
            row = acc.setdefault(lab, [0, None, 0])
            row[0] += int(t.column("n")[r].as_py())
            row[1] = sv if row[1] is None else row[1] + sv
            row[2] += int(t.column("ssq")[r].as_py())
    labels = sorted(acc)
    out_n, out_sum, out_mean = [], [], []
    keep_labels = []
    for lab in labels:
        n, sv, ssq = acc[lab]
        if n < 2:
            continue
        s2 = int((sv * sv).sum())
        num = s2 - ssq
        keep_labels.append(lab)
        out_n.append(n)
        out_sum.append(float(num))
        out_mean.append(float(num) / float(n * (n - 1)))
    return ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array(keep_labels, pa.int64()),
                "n_vecs": pa.array(out_n, pa.int64()),
                "pair_dot_sum": pa.array(out_sum, pa.float64()),
                "mean_pair_dot": pa.array(out_mean, pa.float64()),
            }
        )
    )


def label_cohesion_sql(
    table: str = "embeddings",
    col: str = "embedding",
    label_col: str = "label",
    scale_bits: int = 20,
) -> str:
    """DuckDB twin of :func:`label_cohesion` — HUGEINT moment identity,
    identical single roundings to DOUBLE."""
    S = float(1 << scale_bits)
    return f"""
WITH u AS (SELECT {label_col} AS label, vec_id,
                  CAST(FLOOR(CAST(unnest({col}) AS DOUBLE) * {S!r}) AS BIGINT)
                    AS q,
                  generate_subscripts({col}, 1) AS d
           FROM {table}),
s AS (SELECT label, d, CAST(SUM(q) AS HUGEINT) AS sd FROM u GROUP BY label, d),
t AS (SELECT label, CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ssq
      FROM u GROUP BY label),
n AS (SELECT {label_col} AS label, CAST(COUNT(*) AS HUGEINT) AS n
      FROM {table} GROUP BY 1),
ip AS (SELECT label, CAST(SUM(sd * sd) AS HUGEINT) AS s2 FROM s GROUP BY label)
SELECT CAST(n.label AS BIGINT) AS label, CAST(n.n AS BIGINT) AS n_vecs,
       CAST(ip.s2 - t.ssq AS DOUBLE) AS pair_dot_sum,
       CAST(ip.s2 - t.ssq AS DOUBLE) / CAST(n.n * (n.n - 1) AS DOUBLE)
         AS mean_pair_dot
FROM n JOIN t ON t.label = n.label JOIN ip ON ip.label = n.label
WHERE n.n >= 2
"""


def label_separation(
    vectors: Dataset,
    col: str = "embedding",
    label_col: str = "label",
    scale_bits: int = 20,
) -> Dataset:
    """Between-label separation — the companion of
    :func:`label_cohesion`: for every unordered label pair, the exact
    SUM of cross-pair dot products via ``Σ_{i∈a, j∈b} qᵢ·qⱼ = S_a·S_b``
    (sum-vector dot — no pair enumeration): ``(label_a, label_b,
    cross_dot_sum, mean_cross_dot)``. Together with cohesion this is
    the silhouette-style label-quality matrix.

    Scale shape: identical moment partials to cohesion (O(labels·d)
    ints per batch); the label-pair expansion happens on the driver
    over label-sized metadata.
    """
    tune_context()
    S = float(1 << scale_bits)

    def partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.binary()),
                }
            )
        E = _emb_matrix(tbl, col)
        q = np.floor(E * S).astype(np.int64)
        lab = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        l_s = lab[order]
        q_s = q[order]
        starts = np.flatnonzero(np.r_[True, l_s[1:] != l_s[:-1]][: l_s.size])
        sv = np.add.reduceat(q_s, starts, axis=0)
        return pa.table(
            {
                "label": l_s[starts],
                "n": np.diff(np.r_[starts, l_s.size]).astype(np.int64),
                "sv": pa.array([row.tobytes() for row in sv], pa.binary()),
            }
        )

    parts = vectors.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    acc: dict[int, list] = {}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for r in range(t.num_rows):
            lab = int(t.column("label")[r].as_py())
            sv = np.frombuffer(t.column("sv")[r].as_py(), np.int64).astype(object)
            row = acc.setdefault(lab, [0, None])
            row[0] += int(t.column("n")[r].as_py())
            row[1] = sv if row[1] is None else row[1] + sv
    labels = sorted(acc)
    la, lb, cs, mc = [], [], [], []
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            na, sa = acc[a]
            nb, sb = acc[b]
            dot = int((sa * sb).sum())
            la.append(a)
            lb.append(b)
            cs.append(float(dot))
            mc.append(float(dot) / float(na * nb))
    return ray.data.from_arrow(
        pa.table(
            {
                "label_a": pa.array(la, pa.int64()),
                "label_b": pa.array(lb, pa.int64()),
                "cross_dot_sum": pa.array(cs, pa.float64()),
                "mean_cross_dot": pa.array(mc, pa.float64()),
            }
        )
    )


def label_separation_sql(
    table: str = "embeddings",
    col: str = "embedding",
    label_col: str = "label",
    scale_bits: int = 20,
) -> str:
    """DuckDB twin of :func:`label_separation` — per-label HUGEINT
    component sums, pairwise sum-vector dots."""
    S = float(1 << scale_bits)
    return f"""
WITH u AS (SELECT {label_col} AS label,
                  CAST(FLOOR(CAST(unnest({col}) AS DOUBLE) * {S!r}) AS BIGINT)
                    AS q,
                  generate_subscripts({col}, 1) AS d
           FROM {table}),
s AS (SELECT label, d, CAST(SUM(q) AS HUGEINT) AS sd FROM u GROUP BY label, d),
n AS (SELECT {label_col} AS label, CAST(COUNT(*) AS HUGEINT) AS n
      FROM {table} GROUP BY 1),
x AS (SELECT a.label AS la, b.label AS lb,
             CAST(SUM(a.sd * b.sd) AS HUGEINT) AS dot
      FROM s a JOIN s b ON a.d = b.d AND a.label < b.label
      GROUP BY a.label, b.label)
SELECT CAST(x.la AS BIGINT) AS label_a, CAST(x.lb AS BIGINT) AS label_b,
       CAST(x.dot AS DOUBLE) AS cross_dot_sum,
       CAST(x.dot AS DOUBLE) / CAST(na.n * nb.n AS DOUBLE) AS mean_cross_dot
FROM x JOIN n na ON na.label = x.la JOIN n nb ON nb.label = x.lb
"""


def emb_top_eigen(
    vectors: Dataset,
    col: str = "embedding",
    scale_bits: int = 20,
    n_iter: int = 60,
) -> Dataset:
    """Top eigenvalue/eigenvector of the embedding covariance — the
    leading principal component (spectral drift monitor / PCA seed):
    one row ``(dim, eigenvalue, component)`` per dimension. The
    covariance comes from the EXACT integer moment fold of
    :func:`emb_covariance`; the eigenpair is deterministic fixed-point
    power iteration (fixed all-ones start, ``n_iter`` steps, final
    Rayleigh quotient) on that d×d metadata matrix — no randomness, so
    results are bit-stable across runs and parallelism.

    No SQL twin: eigendecomposition is not ANSI-SQL-expressible —
    correctness is pinned by pytest against ``numpy.linalg.eigh`` on
    the same matrix (rows-only driver check).
    """
    tune_context()
    cov_rows = emb_covariance(vectors, col=col, scale_bits=scale_bits).take_all()
    if not cov_rows:
        return ray.data.from_arrow(
            pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "eigenvalue": pa.array([], pa.float64()),
                    "component": pa.array([], pa.float64()),
                }
            )
        )
    d = max(r["j"] for r in cov_rows) + 1
    C = np.zeros((d, d), np.float64)
    for r in cov_rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    v = np.ones(d, np.float64) / np.sqrt(np.float64(d))
    for _ in range(n_iter):
        w = C @ v
        nrm = np.sqrt((w * w).sum())
        if nrm == 0.0:
            break
        v = w / nrm
    lam = float(v @ (C @ v))
    return ray.data.from_arrow(
        pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "eigenvalue": pa.array(np.full(d, lam), pa.float64()),
                "component": pa.array(v, pa.float64()),
            }
        )
    )


def emb_top2_eigen(
    vectors: Dataset,
    col: str = "embedding",
    scale_bits: int = 20,
    n_iter: int = 60,
) -> Dataset:
    """Top-2 eigenpairs of the embedding covariance — the 2-D PCA
    basis (projection plane for corpus visualization / drift): one row
    per dimension ``(dim, eig1, comp1, eig2, comp2)``. Same exact
    integer moment fold as :func:`emb_top_eigen`; the second pair
    comes from HOTELLING DEFLATION (power-iterate C − λ₁v₁v₁ᵀ, with a
    re-orthogonalization against v₁ each step to stop drift). Fixed
    deterministic starts → bit-stable across runs and parallelism.

    No SQL twin (eigensolver); pytest pins both pairs against
    ``numpy.linalg.eigh`` on the identical matrix.
    """
    tune_context()
    cov_rows = emb_covariance(vectors, col=col, scale_bits=scale_bits).take_all()
    if not cov_rows:
        return ray.data.from_arrow(
            pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "eig1": pa.array([], pa.float64()),
                    "comp1": pa.array([], pa.float64()),
                    "eig2": pa.array([], pa.float64()),
                    "comp2": pa.array([], pa.float64()),
                }
            )
        )
    d = max(r["j"] for r in cov_rows) + 1
    C = np.zeros((d, d), np.float64)
    for r in cov_rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]

    def power(mat, v0, ortho=None):
        v = v0 / np.sqrt((v0 * v0).sum())
        for _ in range(n_iter):
            w = mat @ v
            if ortho is not None:
                w = w - (w @ ortho) * ortho
            nrm = np.sqrt((w * w).sum())
            if nrm == 0.0:
                break
            v = w / nrm
        return v

    v1 = power(C, np.ones(d, np.float64))
    lam1 = float(v1 @ (C @ v1))
    C2 = C - lam1 * np.outer(v1, v1)
    # deterministic start orthogonal-ish to v1: alternating signs
    s0 = np.ones(d, np.float64)
    s0[1::2] = -1.0
    s0 = s0 - (s0 @ v1) * v1
    if float((s0 * s0).sum()) == 0.0:  # pragma: no cover - degenerate start
        s0 = np.zeros(d, np.float64)
        s0[0] = 1.0
        s0 = s0 - (s0 @ v1) * v1
    v2 = power(C2, s0, ortho=v1)
    lam2 = float(v2 @ (C @ v2))
    return ray.data.from_arrow(
        pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "eig1": pa.array(np.full(d, lam1), pa.float64()),
                "comp1": pa.array(v1, pa.float64()),
                "eig2": pa.array(np.full(d, lam2), pa.float64()),
                "comp2": pa.array(v2, pa.float64()),
            }
        )
    )
