"""ann query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    ANN_K,
    ANN_RANGE_T,
    DBSCAN_EPS,
    DBSCAN_MINPTS,
    RADIUS,
    TRACK_RES,
    ann,
    dedup,
    derive,
    tables,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _emb_covariance_sql,
    _emb_dim_quantiles_sql,
    _emb_norm_outliers_sql,
    _label_cohesion_sql,
    _label_separation_sql,
    ann_classify_sql,
    ann_topk_sql,
    dbscan_sql,
    embedding_neardup_exact_sql,
    ix,
    iy,
    point_clusters_sql,
)



def q_point_clusters(sf):
    # fixed-radius spatial clustering: radius SELF-join (degenerate
    # point-boxes) → connected components → min-id cluster labels
    from python_prtree_ray.pipelines.graph import point_clusters

    return point_clusters(
        tables.points_dataset(sf), radius=RADIUS, res=5
    )



def q_dbscan(sf):
    # exact DBSCAN: eps self-join -> degree -> core flags -> CC over
    # core-core edges -> border min-label messages; every stage one
    # coarse node-bucket shuffle
    from python_prtree_ray.pipelines.graph import dbscan_clusters

    return dbscan_clusters(
        tables.points_dataset(sf), eps=DBSCAN_EPS, min_pts=DBSCAN_MINPTS
    )



def q_ann_topk(sf):
    import ray
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # query vectors: the first 10 embeddings (deterministic)
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
    qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    qids = head.column("vec_id").to_numpy(zero_copy_only=False)
    res = ann.ann_brute_topk(emb, qv, qids, k=ANN_K)
    return res.select_columns(["query_id", "vec_id", "rank"])



def q_emb_covariance(sf):
    # exact covariance matrix of the embedding corpus on the
    # 2^20 scaled-int grid: per-batch integer-matmul moment
    # partials, vectors never shuffle
    import ray
    from python_prtree_ray.pipelines.ann import emb_covariance

    vec = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding"]
    )
    return emb_covariance(vec)



def q_ann_range(sf):
    # cosine RANGE search (radius twin of ann_topk): broadcast query
    # matrix, map-only matmul, no merge stage — membership only,
    # same oracle float-parity contract as embedding_neardup_exact
    import pyarrow.parquet as pq
    import ray

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
    qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    qids = head.column("vec_id").to_numpy(zero_copy_only=False)
    return ann.ann_range(emb, qv, qids, threshold=ANN_RANGE_T)



def q_embedding_neardup(sf):
    import ray

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # testdata cosines top out ≈0.5-0.6, so probe at 0.4 with wide
    # buckets (bits=4) — per-pair recall ≈0.75 at this low threshold;
    # exact twin below is the oracle-checked ground truth
    return dedup.embedding_neardup_pairs(
        emb, threshold=0.4, n_tables=8, n_bits=4
    )



def q_embedding_neardup_exact(sf):
    import ray

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return dedup.embedding_neardup_exact(emb, threshold=0.45)



def q_ann_classify(sf):
    # kNN-vote label transfer: majority label among each query's
    # exact cosine top-k (tie -> smallest label); label column IS
    # needed here (the vote), so this read keeps all three columns
    import ray
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
    qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    qids = head.column("vec_id").to_numpy(zero_copy_only=False)
    return ann.ann_classify(emb, qv, qids, k=ANN_K)



def q_ann_lsh(sf):
    import ray
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
    qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    qids = head.column("vec_id").to_numpy(zero_copy_only=False)
    res = ann.ann_lsh_topk(emb, qv, qids, k=ANN_K)
    return res.select_columns(["query_id", "vec_id", "rank"])



def q_ann_ivf(sf):
    import ray
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
    qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    qids = head.column("vec_id").to_numpy(zero_copy_only=False)
    res = ann.ann_ivf_topk(emb, qv, qids, k=ANN_K)
    return res.select_columns(["query_id", "vec_id", "rank"])



def q_emb_norm_outliers(sf):
    # two-phase quantile gate on the embedding-norm grid: exact p99
    # threshold (R-7 on scaled ints, broadcast as one double) ->
    # stateless filter; vectors never shuffle
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.ann import emb_norm_outliers

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return emb_norm_outliers(emb)



def q_emb_dim_quantiles(sf):
    # per-dimension distribution monitor: exact R-7 quantiles on
    # the 2^10 scaled-int grid; vectors never shuffle
    import ray
    from python_prtree_ray.pipelines.ann import emb_dim_quantiles

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding"]
    )
    return emb_dim_quantiles(emb)



def q_label_cohesion(sf):
    # exact intra-label pairwise-dot sums via |Σq|² − Σ|q|² — no
    # pair enumeration, vectors never shuffle
    import ray
    from python_prtree_ray.pipelines.ann import label_cohesion

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding", "label"]
    )
    return label_cohesion(emb)



def q_label_separation(sf):
    # between-label separation: exact cross-pair dot sums via
    # sum-vector dot products — the silhouette companion matrix
    import ray
    from python_prtree_ray.pipelines.ann import label_separation

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding", "label"]
    )
    return label_separation(emb)



def q_emb_top_eigen(sf):
    # leading principal component via deterministic power iteration
    # on the exact covariance fold (rows-only: no SQL eigensolver)
    import ray
    from python_prtree_ray.pipelines.ann import emb_top_eigen

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding"]
    )
    return emb_top_eigen(emb)



def q_emb_top2_eigen(sf):
    # 2-D PCA basis via Hotelling deflation on the exact covariance
    # fold (rows-only: no SQL eigensolver; pytest pins vs eigh)
    import ray
    from python_prtree_ray.pipelines.ann import emb_top2_eigen

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding"]
    )
    return emb_top2_eigen(emb)



def q_type_centroids(sf):
    # per-type spatial centroid on the fine integer grid: exact
    # (n, Σix, Σiy) moments, two divisions per type
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        ix = derive.tile_index(p["px"], TRACK_RES)
        iy = derive.tile_index(p["py"], TRACK_RES)
        enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(code, kind="stable")
        c_s = code[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        return pa.table(
            {
                "event_type": enc.dictionary.take(pa.array(c_s[starts])),
                "n": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
                "six": np.add.reduceat(ix[order], starts),
                "siy": np.add.reduceat(iy[order], starts),
            }
        )

    parts = ev.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def add_k(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "k", pa.array(np.zeros(tbl.num_rows, np.int64))
        )

    def final(group: pa.Table) -> pa.Table:
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        if et.size == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "mean_ix": pa.array([], pa.float64()),
                    "mean_iy": pa.array([], pa.float64()),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        six = group.column("six").to_numpy(zero_copy_only=False)
        siy = group.column("siy").to_numpy(zero_copy_only=False)
        order = np.argsort(et, kind="stable")
        e_s = et[order]
        starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]][: e_s.size])
        nn = np.add.reduceat(n[order], starts)
        sx = np.add.reduceat(six[order], starts)
        sy = np.add.reduceat(siy[order], starts)
        return pa.table(
            {
                "event_type": pa.array(e_s[starts], pa.string()),
                "n": nn,
                "mean_ix": sx.astype(np.float64) / nn.astype(np.float64),
                "mean_iy": sy.astype(np.float64) / nn.astype(np.float64),
            }
        )

    return (
        parts.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["event_type", "n", "mean_ix", "mean_iy"])
    )



def q_label_centroids(sf):
    # distributed per-label embedding centroid (quantized integer
    # component sums in long format — order-independent reduction)
    import ray

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["embedding", "label"]
    )
    return ann.label_centroid_sums(emb)



def q_kmeans(sf):
    # deterministic distributed Lloyd's k-means over the embedding
    # table (exact-int quantized: parallelism-invariant; pytest
    # asserts equivalence to the single-process reference)
    import ray

    from python_prtree_ray.pipelines.kmeans import kmeans

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans(emb, k=8, iters=4)



def q_ann_pq(sf):
    # product-quantization ANN: the compressed scale path (byte
    # codes + asymmetric LUT scoring); rows-only, recall floor in
    # pytest vs ann_brute_topk
    import ray
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 10)
    qv = np.stack(head.column("embedding").to_numpy(zero_copy_only=False))
    qids = head.column("vec_id").to_numpy(zero_copy_only=False)
    res = ann.ann_pq_topk(emb, qv, qids, k=ANN_K)
    return res.select_columns(["query_id", "vec_id", "rank"])


QUERIES = {
    "point_clusters": q_point_clusters,
    "dbscan": q_dbscan,
    "ann_topk": q_ann_topk,
    "emb_covariance": q_emb_covariance,
    "ann_range": q_ann_range,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_exact": q_embedding_neardup_exact,
    "ann_classify": q_ann_classify,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "emb_norm_outliers": q_emb_norm_outliers,
    "emb_dim_quantiles": q_emb_dim_quantiles,
    "label_cohesion": q_label_cohesion,
    "label_separation": q_label_separation,
    "emb_top_eigen": q_emb_top_eigen,
    "emb_top2_eigen": q_emb_top2_eigen,
    "type_centroids": q_type_centroids,
    "label_centroids": q_label_centroids,
    "kmeans": q_kmeans,
    "ann_pq": q_ann_pq,
}

SQL = {
    "point_clusters": point_clusters_sql,
    "dbscan": dbscan_sql,
    "ann_topk": ann_topk_sql,
    "ann_range": f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10)
SELECT q.query_id AS query_id, e.vec_id AS vec_id
FROM q, embeddings e
WHERE list_cosine_similarity(q.embedding, e.embedding) >= {ANN_RANGE_T}
""",
    "embedding_neardup_exact": embedding_neardup_exact_sql,
    "ann_classify": ann_classify_sql,
    "emb_covariance": _emb_covariance_sql("embeddings"),
    "emb_norm_outliers": _emb_norm_outliers_sql("embeddings"),
    "label_cohesion": _label_cohesion_sql("embeddings"),
    "label_separation": _label_separation_sql("embeddings"),
    "emb_dim_quantiles": _emb_dim_quantiles_sql("embeddings"),
    "label_centroids": (
        "SELECT CAST(label AS BIGINT) AS label, CAST(dim - 1 AS BIGINT) AS dim, "
        "CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 10000.0::DOUBLE) AS BIGINT)) "
        "AS BIGINT) AS sum_q, "
        "COUNT(*) AS n_vecs FROM ("
        "  SELECT label, unnest(embedding) AS e, "
        "         generate_subscripts(embedding, 1) AS dim"
        "  FROM embeddings) GROUP BY label, dim"
    ),
    "type_centroids": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), pts AS (SELECT e.event_type AS event_type, "
        + derive.tile_index_sql("q.px", TRACK_RES)
        + " AS ix, "
        + derive.tile_index_sql("q.py", TRACK_RES)
        + " AS iy FROM events e JOIN q ON e.event_id = q.event_id) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(ix) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_ix, "
        "CAST(SUM(iy) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_iy "
        "FROM pts GROUP BY event_type"
    ),
}
