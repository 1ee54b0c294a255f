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



def q_mutual_nn(sf):
    # NN-graph symmetry: share of points whose nearest neighbor
    # points back — ONE co-partitioned self-join of the nn stream
    # (never collected), single-row exact counts
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.knn import nn_pairs

    nn = nn_pairs(tables.points_dataset(sf))
    right = nn.map_batches(
        lambda t: pa.table(
            {"rq": t.column("query_id"), "rnn": t.column("nn_id")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_equi_join(
        nn, right,
        on="nn_id", right_on="rq",
        left_cols=("query_id",),
        right_cols=("rnn",),
    )

    def partial(tbl: pa.Table) -> pa.Table:
        q = tbl.column("query_id").to_numpy(zero_copy_only=False)
        rnn = tbl.column("rnn").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([np.int64(0)], pa.int64()),
                "n_points": pa.array([np.int64(q.size)], pa.int64()),
                "n_mutual": pa.array(
                    [np.int64((q == rnn).sum())], pa.int64()
                ),
            }
        )

    from python_prtree_ray.pipelines.merge import bucketed_sum

    summed = bucketed_sum(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="k",
        value_cols=("n_points", "n_mutual"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_points").to_numpy(zero_copy_only=False)
        m = tbl.column("n_mutual").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_points": n,
                "n_mutual": m,
                "share": m.astype(np.float64) / n.astype(np.float64),
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
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
