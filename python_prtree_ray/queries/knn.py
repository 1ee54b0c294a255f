"""knn query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    KNN_K,
    RADIUS,
    derive,
    knn,
    tables,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _nn_histogram_sql,
    b_orders,
    p_supp,
    haversine_join_sql_q,
    knn_3d_sql,
    knn_4d_sql,
    knn_geo_sql_q,
    knn_sql,
    p_cust,
    radius_join_sql,
)



def q_knn_ring(sf):
    # the histogram ring-expansion kNN physical plan
    # (broadcast=False) driven through the driver oracle: identical
    # (query, idx, rank) rows as the broadcast local-top-k plan
    return knn.knn_join(
        tables.boxes_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
        k=KNN_K,
        res=5,
        broadcast=False,
    )



def q_knn(sf):
    return knn.knn_join(
        tables.boxes_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
        k=KNN_K,
        res=5,
    )



def q_knn_3d(sf):
    # D-generic kNN (broadcast local-top-k path) over 3D centroids —
    # reference kNN is a 2D north-rule op; 3D rides the same kernel
    from python_prtree_ray.sources.tables import BOX3D_COLS, points_3d_dataset

    return knn.knn_join(
        tables.boxes_3d_dataset(sf),
        points_3d_dataset(sf),
        k=KNN_K,
        res=4,
        box_cols=BOX3D_COLS,
        point_cols=knn.POINT3D_COLS,
    )



def q_knn_4d(sf):
    # D-generic kNN over 4D (x,y,z,t) centroids — same kernel and
    # merge as 2D/3D, box/point column tuples swapped
    from python_prtree_ray.sources.tables import BOX4D_COLS, points_4d_dataset

    return knn.knn_join(
        tables.boxes_4d_dataset(sf),
        points_4d_dataset(sf),
        k=KNN_K,
        res=4,
        box_cols=BOX4D_COLS,
        point_cols=knn.POINT4D_COLS,
    )



def q_radius_join(sf):
    # fixed-radius within-distance join: supplier points vs order-box
    # centroids (zero-shuffle broadcast path at this probe size)
    return knn.radius_join(
        tables.boxes_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
        radius=RADIUS,
        res=5,
    )



def q_haversine_join(sf):
    # great-circle radius join: customers within 400 km of each
    # supplier; small side broadcast once, latitude-band prefilter
    # gates the trig
    from python_prtree_ray.pipelines.geodesic import haversine_join

    return haversine_join(
        tables.points_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
    )



def q_knn_geo(sf):
    # great-circle kNN: 5 nearest customers per supplier by
    # haversine; ranks on the portable 'a' term, libm asin only on
    # winners; query side broadcast, big side never shuffles
    from python_prtree_ray.pipelines.geodesic import knn_geo

    return knn_geo(
        tables.points_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
        k=5,
    )



def q_knn_dist(sf):
    # kNN with the exact float64 squared distance carried through the
    # merge — the sklearn-kneighbors-style contract (rank alone loses
    # the measure a downstream density/outlier score needs). Same
    # machinery as q_knn with with_dist=True; dist2 is bitwise the SQL
    # expression (px-cx)^2 + (py-cy)^2.
    return knn.knn_join(
        tables.boxes_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
        k=KNN_K,
        res=5,
        with_dist=True,
    )


def q_mutual_nn(sf):
    # NN-graph symmetry: share of points whose nearest neighbor points
    # back. Each point emits exactly ONE nn edge, so an UNORDERED pair
    # key (a, b) = (min, max) appears once (one-way) or twice (mutual)
    # — mutuality is a pair-count fold, not a self-join: the nn stream
    # (never collected) takes ONE coarse pair-hash shuffle of
    # batch-deduped (a, b, c) partials instead of the two-sided
    # hash_equi_join this op previously ran (same exact counts; the
    # join-based plan cost ~3 extra executor rounds, which dominated
    # this metadata-sized op at every sf).
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.knn import nn_pairs

    nn = nn_pairs(tables.points_dataset(sf))

    def pair_partial(tbl: pa.Table) -> pa.Table:
        q = tbl.column("query_id").to_numpy(zero_copy_only=False)
        n = tbl.column("nn_id").to_numpy(zero_copy_only=False)
        a = np.minimum(q, n)
        b = np.maximum(q, n)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][
                : a_s.size
            ]
        )
        c = np.diff(np.r_[starts, a_s.size])
        a_u, b_u = a_s[starts], b_s[starts]
        return pa.table(
            {
                "kb": bucket_of(a_u ^ (b_u * np.int64(2654435761)), 64),
                "a": a_u,
                "b": b_u,
                "c": c.astype(np.int64),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s, c_s = a[order], b[order], c[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][
                : a_s.size
            ]
        )
        csum = np.add.reduceat(c_s, starts) if starts.size else c_s[:0]
        return pa.table(
            {
                "n_points": pa.array([np.int64(c_s.sum())], pa.int64()),
                # each mutual pair contributes its TWO reciprocal edges
                "n_mutual": pa.array(
                    [np.int64(2 * (csum == 2).sum())], pa.int64()
                ),
            }
        )

    rows = (
        nn.map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("kb")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .take_all()
    )  # <= 64 bucket rows: metadata-sized
    n_points = np.int64(sum(int(r["n_points"]) for r in rows))
    n_mutual = np.int64(sum(int(r["n_mutual"]) for r in rows))
    if n_points == 0:  # degenerate tiny-scale input: keep 0-row shape
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("n_points", pa.int64()),
                    ("n_mutual", pa.int64()),
                    ("share", pa.float64()),
                ]
            ).empty_table()
        )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_points": pa.array([n_points], pa.int64()),
                "n_mutual": pa.array([n_mutual], pa.int64()),
                "share": pa.array(
                    [np.float64(n_mutual) / np.float64(n_points)],
                    pa.float64(),
                ),
            }
        )
    )



def q_knn_hubness(sf):
    # NN-graph hubness: in-degree distribution of the 1-NN digraph
    # over customer points — composition over the existing nn_pairs
    # stream (never collected): in-degree fold + tiny histogram sum
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.knn import nn_pairs
    from python_prtree_ray.pipelines.merge import bucketed_sum

    nn = nn_pairs(tables.points_dataset(sf))

    def deg_partial(tbl: pa.Table) -> pa.Table:
        k, c = np.unique(
            tbl.column("nn_id").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"nn_id": k, "indegree": c.astype(np.int64)})

    deg = bucketed_sum(
        nn.map_batches(
            deg_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="nn_id",
        value_cols=("indegree",),
    )

    def hist_partial(tbl: pa.Table) -> pa.Table:
        k, c = np.unique(
            tbl.column("indegree").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"indegree": k, "n_points": c.astype(np.int64)})

    return bucketed_sum(
        deg.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="indegree",
        value_cols=("n_points",),
    )



def q_nn_histogram(sf):
    # G-function NN-distance distribution in log2 lags of the
    # FLOOR-scaled squared distance: exact integer bins (power-of-
    # two comparisons, no libm log), <=63 output rows at any size
    from python_prtree_ray.pipelines.knn import nn_histogram

    return nn_histogram(tables.points_dataset(sf))



def q_knn_regress(sf):
    # kNN regression: mean integer measure of the KNN_K nearest
    # order boxes per supplier point; exact sum, one division
    from python_prtree_ray.pipelines.knn import knn_regress

    return knn_regress(
        tables.boxes_dataset(sf),
        tables.points_dataset(sf, "supplier", "s_suppkey"),
        k=KNN_K,
        res=5,
    )



def q_nn_pairs(sf):
    # nearest-other-point per customer point: self-kNN composition
    # over the existing knn machinery (degenerate-box tree side)
    from python_prtree_ray.pipelines.knn import nn_pairs

    return nn_pairs(tables.points_dataset(sf))


QUERIES = {
    "knn_ring": q_knn_ring,
    "knn_dist": q_knn_dist,
    "knn": q_knn,
    "knn_3d": q_knn_3d,
    "knn_4d": q_knn_4d,
    "radius_join": q_radius_join,
    "haversine_join": q_haversine_join,
    "knn_geo": q_knn_geo,
    "mutual_nn": q_mutual_nn,
    "knn_hubness": q_knn_hubness,
    "nn_histogram": q_nn_histogram,
    "knn_regress": q_knn_regress,
    "nn_pairs": q_nn_pairs,
}

SQL = {
    "knn": knn_sql,
    "knn_dist": f"""
WITH b AS ({b_orders}), p AS ({p_supp}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx, dist2,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank", dist2 FROM r WHERE rn <= {KNN_K}
""",
    "knn_regress": f"""
WITH t AS ({knn_sql}),
v AS (SELECT query_id, {derive.point_measure_sql("idx")} AS v FROM t)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_nb,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pred
FROM v GROUP BY query_id
""",
    # same semantics, forced histogram ring-expansion physical plan
    "knn_ring": knn_sql,
    "knn_3d": knn_3d_sql,
    "knn_4d": knn_4d_sql,
    "radius_join": radius_join_sql,
    "haversine_join": haversine_join_sql_q,
    "knn_geo": knn_geo_sql_q,
    "nn_histogram": _nn_histogram_sql(p_cust),
    "knn_hubness": f"""
WITH p AS ({p_cust}),
d AS (
  SELECT a.query_id, b.query_id AS nn_id,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id <> b.query_id
),
r AS (
  SELECT query_id, nn_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rn
  FROM d
),
deg AS (
  SELECT nn_id, CAST(COUNT(*) AS BIGINT) AS indegree
  FROM r WHERE rn = 1 GROUP BY nn_id
)
SELECT indegree, CAST(COUNT(*) AS BIGINT) AS n_points
FROM deg GROUP BY indegree
""",
    "mutual_nn": f"""
WITH p AS ({p_cust}),
d AS (
  SELECT a.query_id, b.query_id AS nn_id,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id <> b.query_id
),
r AS (
  SELECT query_id, nn_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rn
  FROM d
),
nn AS (SELECT query_id, nn_id FROM r WHERE rn = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN b.nn_id = a.query_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mutual,
       CAST(SUM(CASE WHEN b.nn_id = a.query_id THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS share
FROM nn a JOIN nn b ON b.query_id = a.nn_id
""",
    "nn_pairs": f"""
WITH p AS ({p_cust}),
d AS (
  SELECT a.query_id, b.query_id AS nn_id,
         (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) AS d2
  FROM p a JOIN p b ON a.query_id <> b.query_id
),
r AS (
  SELECT query_id, nn_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, nn_id) AS rn
  FROM d
)
SELECT query_id, nn_id FROM r WHERE rn = 1
""",
}
