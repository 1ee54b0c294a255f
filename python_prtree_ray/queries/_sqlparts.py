"""All shared DuckDB-oracle SQL fragments formerly local to
``oracle_sql()`` — module-level so each query family's ``SQL`` dict
can reference exactly the fragments it needs.  Statement order is
preserved verbatim (later rebinds of scratch names like ``g`` see
the same final values the function locals did)."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import *  # noqa: F401,F403
from python_prtree_ray.queries._common import (  # noqa: F401
    _isin_sorted,
    _seed_sites,
    _seeds_cte,
    _tile_pagerank_sql,
    _tile_kcore_sql,
    _tile_distance_sql,
    _event_tracks,
    _event_points,
)


from python_prtree_ray.pipelines.knn import (
    closest_pair_sql as _closest_pair_sql,
)
from python_prtree_ray.pipelines.measure import (
    boxes_union_area_sql as _boxes_union_area_sql,
)
from python_prtree_ray.pipelines.movement import (
    user_first_last_sql as _user_first_last_sql,
)
from python_prtree_ray.pipelines.movement import (
    cell_hours_sql as _cell_hours_sql,
    cell_slope_sql as _cell_slope_sql,
    home_cells_sql as _home_cells_sql,
    jump_histogram_sql as _jump_histogram_sql,
    radius_of_gyration_sql as _radius_of_gyration_sql,
    cell_trend_sql as _cell_trend_sql,
    heading_histogram_sql as _heading_histogram_sql,
    snap_to_segments_sql as _snap_to_segments_sql,
    segment_tiles_sql as _segment_tiles_sql,
    turn_histogram_sql as _turn_histogram_sql,
    tile_motifs_sql as _tile_motifs_sql,
    speed_outliers_sql as _speed_outliers_sql,
    interarrival_hist_sql as _interarrival_hist_sql,
    max_dwell_run_sql as _max_dwell_run_sql,
    od_asymmetry_sql as _od_asymmetry_sql,
)
from python_prtree_ray.pipelines.text import (
    lexical_diversity_sql as _lexical_diversity_sql,
    typo_pairs_sql as _typo_pairs_sql,
)
from python_prtree_ray.pipelines.windows import (
    record_events_sql as _record_events_sql,
    late_events_sql as _late_events_sql,
    user_journeys_sql as _user_journeys_sql,
    order_running_totals_sql as _order_running_totals_sql,
    cohort_retention_sql as _cohort_retention_sql,
    session_type_pairs_sql as _session_type_pairs_sql,
    value_peaks_sql as _value_peaks_sql,
    rolling_wau_sql as _rolling_wau_sql,
)
from python_prtree_ray.pipelines.trajectory import (
    trajectory_hausdorff_sql as _trajectory_hausdorff_sql,
    track_diameter_sql as _track_diameter_sql,
    points_diameter_sql as _points_diameter_sql,
)
from python_prtree_ray.pipelines.curation import (
    SOURCE_JACCARD_SQL as _SOURCE_JACCARD_SQL,
    dup_ngram_coverage_sql as _dup_ngram_coverage_sql,
    gram_novelty_sql as _gram_novelty_sql,
)
from python_prtree_ray.pipelines.ann import (
    emb_covariance_sql as _emb_covariance_sql,
    emb_dim_quantiles_sql as _emb_dim_quantiles_sql,
    emb_norm_outliers_sql as _emb_norm_outliers_sql,
    label_cohesion_sql as _label_cohesion_sql,
    label_separation_sql as _label_separation_sql,
)
from python_prtree_ray.pipelines.text import (
    bigram_lift_sql as _bigram_lift_sql,
    char_trigrams_sql as _char_trigrams_sql,
    heavy_hitters_sql as _heavy_hitters_sql,
)
from python_prtree_ray.pipelines.interval import (
    interval_union_len_sql as _interval_union_len_sql,
)
from python_prtree_ray.pipelines.tiling import (
    gearys_c_sql as _gearys_c_sql,
    getis_ord_sql as _getis_ord_sql,
    local_morans_sql as _local_morans_sql,
    morans_i_sql as _morans_i_sql,
    hilbert_ranges_sql as _hilbert_ranges_sql,
    knox_stat_sql as _knox_stat_sql,
    quadrat_test_sql as _quadrat_test_sql,
    raster_regions_sql as _raster_regions_sql,
    tile_geohash_sql as _tile_geohash_sql,
    tile_distinct_users_sql as _tile_distinct_users_sql,
    tile_buffer_sql as _tile_buffer_sql,
    tile_gini_sql as _tile_gini_sql,
    std_ellipse_sql as _std_ellipse_sql,
    contour_cases_sql as _contour_cases_sql,
    tile_majority_sql as _tile_majority_sql,
    tile_simpson_sql as _tile_simpson_sql,
    voronoi_assign_sql as _voronoi_assign_sql,
    grid_bfs_sql as _grid_bfs_sql,
    tile_rank_corr_sql as _tile_rank_corr_sql,
    gravity_access_sql as _gravity_access_sql,
    tile_turnover_sql as _tile_turnover_sql,
    region_count_curve_sql as _region_count_curve_sql,
    hilbert_locality_sql as _hilbert_locality_sql,
    adaptive_quadtree_sql as _adaptive_quadtree_sql,
    type_colocation_sql as _type_colocation_sql,
    tile_focal_mean_sql as _tile_focal_mean_sql,
    lorenz_curve_sql as _lorenz_curve_sql,
    flow_direction_sql as _flow_direction_sql,
    flow_accumulation_sql as _flow_accumulation_sql,
    watershed_sizes_sql as _watershed_sizes_sql,
    bivariate_moran_sql as _bivariate_moran_sql,
)
from python_prtree_ray.pipelines.pip import (
    pip_nonconvex_sql as _pip_nonconvex_sql,
)
from python_prtree_ray.pipelines.tiling import (
    cross_k_sql as _cross_k_sql,
    semivariogram_sql as _semivariogram_sql,
    join_counts_sql as _join_counts_sql,
    ripley_k_sql as _ripley_k_sql,
    ripley_curve_sql as _ripley_curve_sql,
    tile_hilbert_sql as _tile_hilbert_sql,
)
from python_prtree_ray.pipelines.knn import (
    clark_evans_sql as _clark_evans_sql,
    nn_histogram_sql as _nn_histogram_sql,
)
from python_prtree_ray.pipelines.agg import (
    skyline_sql as _skyline_sql,
)

b_orders = derive.boxes_sql("orders", "o_orderkey", "idx")
b_part = derive.boxes_sql("part", "p_partkey", "idx")
q_cust = derive.query_boxes_sql("customer", "c_custkey", "query_id")
p_cust = derive.points_sql("customer", "c_custkey", "query_id")
p_supp = derive.points_sql("supplier", "s_suppkey", "query_id")
g = 1 << TILE_RES

intersects = (
    "q.xmin <= b.xmax AND b.xmin <= q.xmax AND "
    "q.ymin <= b.ymax AND b.ymin <= q.ymax"
)

from python_prtree_ray.pipelines.spatial_join import (
    iou_join_sql as _iou_join_sql,
)

_iou_join_sql_entry = _iou_join_sql(
    derive.boxes_sql("part", "p_partkey", "idx"), 0.05
)

spatial_join_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, b.idx AS idx FROM q, b WHERE {intersects}
"""

box_count_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM q, b WHERE {intersects} GROUP BY 1
"""

self_join_sql = f"""
WITH b0 AS ({b_part})
SELECT a.idx AS idx_a, b.idx AS idx_b
FROM b0 a, b0 b
WHERE a.idx < b.idx
  AND a.xmin <= b.xmax AND b.xmin <= a.xmax
  AND a.ymin <= b.ymax AND b.ymin <= a.ymax
"""

point_query_sql = f"""
WITH b AS ({b_orders}), p AS ({p_cust})
SELECT p.query_id AS query_id, b.idx AS idx
FROM p, b
WHERE p.px <= b.xmax AND b.xmin <= p.px AND p.py <= b.ymax AND b.ymin <= p.py
"""

knn_sql = f"""
WITH b AS ({b_orders}), p AS ({p_supp}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank" FROM r WHERE rn <= {KNN_K}
"""

knn_3d_sql = f"""
WITH b AS ({derive.boxes_3d_sql("orders", "o_orderkey", "idx")}),
     p AS ({derive.points_3d_sql("supplier", "s_suppkey", "query_id")}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy,
             (zmin + zmax) * 0.5 AS cz FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy)
               + (p.pz - c.cz) * (p.pz - c.cz) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank" FROM r WHERE rn <= {KNN_K}
"""

knn_4d_sql = f"""
WITH b AS ({derive.boxes_4d_sql("orders", "o_orderkey", "idx")}),
     p AS ({derive.points_4d_sql("supplier", "s_suppkey", "query_id")}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy,
             (zmin + zmax) * 0.5 AS cz, (tmin + tmax) * 0.5 AS ct FROM b),
d AS (SELECT p.query_id, c.idx,
             (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy)
               + (p.pz - c.cz) * (p.pz - c.cz)
               + (p.pt - c.ct) * (p.pt - c.ct) AS dist2
      FROM p, c),
r AS (SELECT query_id, idx,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, idx) AS rn
      FROM d)
SELECT query_id, idx, rn AS "rank" FROM r WHERE rn <= {KNN_K}
"""

radius_join_sql = f"""
WITH b AS ({b_orders}), p AS ({p_supp}),
c AS (SELECT idx, (xmin + xmax) * 0.5 AS cx, (ymin + ymax) * 0.5 AS cy FROM b)
SELECT p.query_id AS query_id, c.idx AS idx,
       (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy) AS dist2
FROM p, c
WHERE (p.px - c.cx) * (p.px - c.cx) + (p.py - c.cy) * (p.py - c.cy)
      <= {RADIUS} * {RADIUS}
"""

dist2 = (
    "(a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)"
)
point_clusters_sql = f"""
WITH RECURSIVE p AS ({p_cust}),
pr AS (SELECT a.query_id AS doc_a, b.query_id AS doc_b
       FROM p a, p b
       WHERE a.query_id < b.query_id AND {dist2} <= {RADIUS} * {RADIUS}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pr
        UNION SELECT doc_b, doc_a FROM pr),
nodes AS (SELECT DISTINCT a AS d FROM sym),
reach(d, n) AS (
  SELECT d, d FROM nodes
  UNION
  SELECT r.d, s.b FROM reach r JOIN sym s ON s.a = r.n
)
SELECT d AS doc_id, MIN(n) AS cluster_id FROM reach GROUP BY d
"""

dbscan_sql = f"""
WITH RECURSIVE p AS ({p_cust}),
pr AS (SELECT a.query_id AS a, b.query_id AS b
       FROM p a, p b
       WHERE a.query_id <> b.query_id AND {dist2} <= {DBSCAN_EPS} * {DBSCAN_EPS}),
deg AS (SELECT a AS d, COUNT(*) AS n FROM pr GROUP BY a),
core AS (SELECT d FROM deg WHERE n + 1 >= {DBSCAN_MINPTS}),
ce AS (SELECT pr.a AS a, pr.b AS b FROM pr
       WHERE pr.a IN (SELECT d FROM core) AND pr.b IN (SELECT d FROM core)),
reach(d, n) AS (
  SELECT d, d FROM core
  UNION
  SELECT r.d, ce.b FROM reach r JOIN ce ON ce.a = r.n
),
clab AS (SELECT d, MIN(n) AS cid FROM reach GROUP BY d),
border AS (SELECT pr.a AS d, MIN(clab.cid) AS cid
           FROM pr JOIN clab ON pr.b = clab.d
           WHERE pr.a NOT IN (SELECT d FROM core)
           GROUP BY pr.a),
noise AS (SELECT DISTINCT a AS d FROM pr
          WHERE a NOT IN (SELECT d FROM core)
            AND a NOT IN (SELECT d FROM border))
SELECT d AS doc_id, cid AS cluster_id, 'core' AS role FROM clab
UNION ALL SELECT d, cid, 'border' FROM border
UNION ALL SELECT d, -1, 'noise' FROM noise
"""

pip_sql = f"""
WITH p AS ({p_cust}), e AS (SELECT * FROM {derive.polygon_edges_sql()})
SELECT p.query_id AS query_id, e.poly_id AS poly_id
FROM p, e
GROUP BY p.query_id, e.poly_id
HAVING bool_and((e.x2 - e.x1) * (p.py - e.y1) - (e.y2 - e.y1) * (p.px - e.x1) >= 0.0)
"""

zonal_stats_sql = f"""
WITH p AS ({p_cust}), e AS (SELECT * FROM {derive.polygon_edges_sql()}),
hits AS (
  SELECT p.query_id AS query_id, e.poly_id AS poly_id,
         MIN(p.px) AS px, MIN(p.py) AS py
  FROM p, e
  GROUP BY p.query_id, e.poly_id
  HAVING bool_and((e.x2 - e.x1) * (p.py - e.y1) - (e.y2 - e.y1) * (p.px - e.x1) >= 0.0)
)
SELECT poly_id, COUNT(*) AS n_points,
       CAST(SUM(query_id) AS BIGINT) AS sum_qid,
       MIN(px) AS min_px, MIN(py) AS min_py,
       MAX(px) AS max_px, MAX(py) AS max_py
FROM hits GROUP BY poly_id
"""

tile_points_sql = f"""
WITH p AS ({p_cust})
SELECT query_id, {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell FROM p
"""

g_qk = 1 << TILE_RES
qk_digits = " + ".join(
    f"((ix // {1 << b}) % 2 + 2 * ((iy // {1 << b}) % 2)) * {10 ** b}"
    for b in range(TILE_RES - 1, -1, -1)
)
tile_quadkey_sql = f"""
WITH p AS ({p_cust}),
     i AS (SELECT query_id,
                  {derive.tile_index_sql('px', TILE_RES)} AS ix,
                  {derive.tile_index_sql('py', TILE_RES)} AS iy
           FROM p)
SELECT query_id, ix * {g_qk} + iy AS cell,
       lpad(CAST(({qk_digits}) AS VARCHAR), {TILE_RES}, '0') AS quadkey
FROM i
"""

tile_topk_sql = f"""
WITH p AS ({p_cust}),
     s AS (SELECT query_id,
                  {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell,
                  {derive.point_score_sql('query_id')} AS score
           FROM p),
     r AS (SELECT cell, query_id, score,
                  ROW_NUMBER() OVER (
                      PARTITION BY cell ORDER BY score DESC, query_id
                  ) AS rn
           FROM s)
SELECT cell, query_id, score, rn AS "rank" FROM r WHERE rn <= 3
"""

tile_quantiles_sql = f"""
WITH p AS ({p_cust}),
     s AS (SELECT {derive.tile_cell_sql('px', 'py', TILE_QRES)} AS cell,
                  {derive.point_measure_sql('query_id')} AS v
           FROM p)
SELECT cell,
       quantile_cont(v, 0.5) AS p50,
       quantile_cont(v, 0.9) AS p90,
       quantile_cont(v, 0.99) AS p99
FROM s GROUP BY cell
"""

from python_prtree_ray.pipelines.geodesic import (
    haversine_join_sql,
    knn_geo_sql,
)
from python_prtree_ray.pipelines.interpolate import (
    empty_space_f_sql,
    idw_grid_sql,
    kde_grid_sql,
    largest_empty_circle_sql,
)

idw_grid_sql_q = idw_grid_sql(p_cust)
kde_grid_sql_q = kde_grid_sql(p_cust)
empty_space_f_sql_q = empty_space_f_sql(p_cust)
largest_empty_circle_sql_q = largest_empty_circle_sql(p_cust)

from python_prtree_ray.functions.cells import hex_cell_sql

hex_bin_sql_q = (
    f"WITH p AS ({p_cust}), "
    f"h AS (SELECT {hex_cell_sql('px', 'py')} FROM p) "
    "SELECT hq, hr, CAST(COUNT(*) AS BIGINT) AS n_points "
    "FROM h GROUP BY 1, 2"
)
haversine_join_sql_q = haversine_join_sql(p_cust, p_supp)
knn_geo_sql_q = knn_geo_sql(p_cust, p_supp, 5)

tile_pyramid_sql = "\nUNION ALL\n".join(
    f"SELECT CAST({r} AS BIGINT) AS res,"
    f" {derive.tile_cell_sql('px', 'py', r)} AS cell,"
    f" CAST(COUNT(*) AS BIGINT) AS n_points"
    f" FROM ({p_cust}) GROUP BY cell"
    for r in range(TILE_RES, -1, -1)
)

ix = f"LEAST(GREATEST(CAST(FLOOR(xmin * {g}) AS BIGINT), 0), {g - 1})"
ix1 = f"LEAST(GREATEST(CAST(FLOOR(xmax * {g}) AS BIGINT), 0), {g - 1})"
iy = f"LEAST(GREATEST(CAST(FLOOR(ymin * {g}) AS BIGINT), 0), {g - 1})"
iy1 = f"LEAST(GREATEST(CAST(FLOOR(ymax * {g}) AS BIGINT), 0), {g - 1})"
tile_cover_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, {ix} AS ix0, {ix1} AS ix1, {iy} AS iy0, {iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g}))
SELECT r.idx AS idx, sx.i * {g} + sy.i AS cell
FROM r, s sx, s sy
WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
"""

tile_extent_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, xmin, ymin, xmax, ymax,
             {ix} AS ix0, {ix1} AS ix1, {iy} AS iy0, {iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g})),
cov AS (
  SELECT r.xmin, r.ymin, r.xmax, r.ymax, sx.i * {g} + sy.i AS cell
  FROM r, s sx, s sy
  WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
)
SELECT cell, COUNT(*) AS n_boxes,
       MIN(xmin) AS env_xmin, MIN(ymin) AS env_ymin,
       MAX(xmax) AS env_xmax, MAX(ymax) AS env_ymax
FROM cov GROUP BY cell
"""

lifecycle_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, b.idx AS idx
FROM q, b
WHERE b.idx % 10 <> 0 AND {intersects}
"""

dedup_exact_sql = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"

token_stats_sql = r"""
SELECT doc_id,
       CAST(array_length(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""

from python_prtree_ray.pipelines.text import EMAIL_RE, URL_RE

pii_scrub_sql = f"""
WITH e AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example or https://docs.example/'
                   || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
u AS (
  SELECT doc_id,
         CAST(array_length(regexp_extract_all(text, '{URL_RE}')) AS BIGINT) AS n_urls,
         regexp_replace(text, '{URL_RE}', '<URL>', 'g') AS t1
  FROM e
)
SELECT doc_id,
       CAST(array_length(regexp_extract_all(t1, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       n_urls,
       CAST(length(regexp_replace(t1, '{EMAIL_RE}', '<EMAIL>', 'g')) AS BIGINT) AS clean_chars
FROM u
"""

doc_lm_freq_sql = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok)
SELECT t.doc_id AS doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(f.f) AS BIGINT) AS sum_freq,
       CAST(SUM(f.f) AS DOUBLE) / COUNT(*) AS mean_freq
FROM toks t JOIN freq f ON t.tok = f.tok
GROUP BY t.doc_id
"""

doc_chunks_sql = r"""
WITH t AS (
  SELECT doc_id,
         CAST(array_length(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(0, (n_tokens - 1) // 96)) AS chunk_id
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, chunk_id, chunk_id * 96 AS start_tok,
       LEAST(128, n_tokens - chunk_id * 96) AS n_tok
FROM c
"""

from python_prtree_ray.pipelines.text import _EN_STOPWORDS, _LANG_MARKERS

stop_re = r"\b(" + "|".join(sorted(_EN_STOPWORDS)) + r")\b"
quality_sql = f"""
WITH t AS (
  SELECT doc_id,
         CAST(array_length(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         CAST(array_length(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
         CAST(array_length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
         CAST(array_length(regexp_extract_all(text, '{stop_re}')) AS BIGINT) AS n_stop,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_alpha, n_punct,
       (n_stop * 100) // GREATEST(n_tokens, 1) AS stop_ratio_pct,
       (n_alpha * 100) // GREATEST(n_chars, 1) AS quality_pct
FROM t
"""

marker_scores = ",\n         ".join(
    f"CAST(array_length(regexp_extract_all(text, '\\b({'|'.join(words)})\\b')) AS BIGINT) AS s_{lang}"
    for lang, words in _LANG_MARKERS.items()
)
lang_id_sql = f"""
WITH t AS (
  SELECT doc_id,
         {marker_scores}
  FROM documents
)
SELECT doc_id,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM t
"""

from python_prtree_ray.pipelines.text import NUM_RE, PIECE_RE, WORD_RE

corpus_curation_sql = f"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         CAST(array_length(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         (CAST(array_length(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) * 100)
           // GREATEST(CAST(length(text) AS BIGINT), 1) AS quality_pct,
         {marker_scores}
  FROM documents
),
q AS (
  SELECT doc_id, norm, n_tokens,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM t WHERE quality_pct >= 82
),
w AS (SELECT norm, MIN(doc_id) AS doc_id FROM q GROUP BY norm)
SELECT q.doc_id, q.lang_pred, q.n_tokens
FROM q JOIN w ON q.doc_id = w.doc_id
"""

token_pieces_sql = f"""
SELECT doc_id,
       CAST(array_length(regexp_extract_all(text, '{PIECE_RE}')) AS BIGINT) AS n_pieces,
       CAST(array_length(regexp_extract_all(text, '{WORD_RE}')) AS BIGINT) AS n_word_pieces,
       CAST(array_length(regexp_extract_all(text, '{NUM_RE}')) AS BIGINT) AS n_num_pieces
FROM documents
"""

events_window_sql = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""

ann_topk_sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10),
d AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.embedding, e.embedding) AS sim
      FROM q, embeddings e),
r AS (SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM d)
SELECT query_id, vec_id, rn AS "rank" FROM r WHERE rn <= {ANN_K}
"""

embedding_neardup_exact_sql = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""

ngram_jaccard_sql = r"""
WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      FROM tok),
sh AS (SELECT DISTINCT doc_id, g FROM g),
j AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
SELECT j.a AS doc_a, j.b AS doc_b,
       j.inter * 1.0 / (sa.n + sb.n - j.inter) AS jaccard
FROM j JOIN sz sa ON sa.doc_id = j.a JOIN sz sb ON sb.doc_id = j.b
WHERE j.inter * 1.0 / (sa.n + sb.n - j.inter) >= 0.8
"""

# transitive closure via recursive CTE — fine at oracle scale; the
# engine side is the O(log-diameter) label-propagation operator
dup_clusters_sql = f"""
WITH RECURSIVE pairs AS ({ngram_jaccard_sql}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS d FROM sym),
reach(d, n) AS (
  SELECT d, d FROM nodes
  UNION
  SELECT r.d, s.b FROM reach r JOIN sym s ON s.a = r.n
)
SELECT d AS doc_id, MIN(n) AS cluster_id FROM reach GROUP BY d
"""

events_hopping_sql = """
SELECT event_type,
       date_trunc('hour', ts) - h.h * INTERVAL 1 HOUR AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events, (SELECT range AS h FROM range(0, 2)) h
GROUP BY 1, 2
"""

events_session_sql = """
WITH o AS (
  SELECT event_type, user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY event_type, user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT event_type, user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM s GROUP BY event_type, user_id, sid
"""

type_counts = ", ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
    for t in ("view", "click", "purchase", "signup", "error")
)
user_features_sql = f"""
SELECT user_id, COUNT(*) AS n_events, {type_counts},
       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""

events_sessionized_sql = """
WITH o AS (
  SELECT event_type, user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY event_type, user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
SELECT event_id,
       MIN(ts) OVER (PARTITION BY event_type, user_id, sid) AS session_start
FROM s
"""

value_quantiles_sql = """
SELECT event_type,
       quantile_cont(CAST(FLOOR(value * 100.0) AS BIGINT), 0.5) AS p50,
       quantile_cont(CAST(FLOOR(value * 100.0) AS BIGINT), 0.9) AS p90,
       quantile_cont(CAST(FLOOR(value * 100.0) AS BIGINT), 0.99) AS p99
FROM events GROUP BY event_type
"""

distinct_users_sql = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""

top_events_sql = """
WITH r AS (SELECT event_type, event_id, value,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY value DESC, event_id) AS rn
           FROM events)
SELECT event_type, event_id, value, rn AS "rank" FROM r WHERE rn <= 10
"""

spatial_join_obj_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT q.query_id AS query_id, b.idx AS idx,
       'obj-' || CAST(b.idx AS VARCHAR) AS obj
FROM q, b WHERE {intersects}
"""

batch_query_lists_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust}),
p AS (SELECT q.query_id AS query_id, b.idx AS idx FROM q, b WHERE {intersects})
SELECT query_id, array_to_string(list_sort(list(idx)), ',') AS matches
FROM p GROUP BY query_id
"""

from python_prtree_ray.pipelines.sample import (
    hash_sample_sql,
    stratified_sample_sql,
)

doc_sample_sql = f"""
SELECT doc_id, n_chars FROM documents WHERE {hash_sample_sql('doc_id', 5)}
"""

doc_sample_stratified_sql = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {stratified_sample_sql('doc_id', 'lang', {"en": 10, "de": 40, "fr": 25})}
"""

events_enriched_sql = """
SELECT e.event_id, e.user_id, c.c_nationkey, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""

from python_prtree_ray.pipelines.text import extract_json_int_sql

props_extract_sql = extract_json_int_sql("props", "k", "event_id")

g6 = 1 << TILE_RES
_ix = f"LEAST(GREATEST(CAST(FLOOR(xmin * {g6}) AS BIGINT), 0), {g6 - 1})"
_ix1 = f"LEAST(GREATEST(CAST(FLOOR(xmax * {g6}) AS BIGINT), 0), {g6 - 1})"
_iy = f"LEAST(GREATEST(CAST(FLOOR(ymin * {g6}) AS BIGINT), 0), {g6 - 1})"
_iy1 = f"LEAST(GREATEST(CAST(FLOOR(ymax * {g6}) AS BIGINT), 0), {g6 - 1})"
cell_histogram_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, {_ix} AS ix0, {_ix1} AS ix1, {_iy} AS iy0, {_iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g6}))
SELECT sx.i * {g6} + sy.i AS cell, CAST(COUNT(*) AS BIGINT) AS n_boxes
FROM r, s sx, s sy
WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
GROUP BY 1
"""

raster_tiles_sql = f"""
WITH b AS ({b_orders}),
r AS (SELECT idx, {ix} AS ix0, {ix1} AS ix1, {iy} AS iy0, {iy1} AS iy1 FROM b),
s AS (SELECT range AS i FROM range(0, {g}))
SELECT r.idx AS idx, sx.i * {g} + sy.i AS cell,
       CAST(sx.i AS DOUBLE) / {g} AS tile_xmin,
       CAST(sy.i AS DOUBLE) / {g} AS tile_ymin,
       CAST(sx.i + 1 AS DOUBLE) / {g} AS tile_xmax,
       CAST(sy.i + 1 AS DOUBLE) / {g} AS tile_ymax
FROM r, s sx, s sy
WHERE sx.i BETWEEN r.ix0 AND r.ix1 AND sy.i BETWEEN r.iy0 AND r.iy1
"""

asof_sql = """
WITH l AS (SELECT event_id AS l_id, user_id, ts AS l_ts FROM events
           WHERE event_type = 'purchase'),
r0 AS (SELECT user_id, ts AS r_ts, MAX(event_id) AS r_id FROM events
       WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT l.l_id, l.user_id AS key, l.l_ts, r.r_id, r.r_ts
FROM l ASOF JOIN r0 r ON l.user_id = r.user_id AND l.l_ts >= r.r_ts
"""

events_band_join_sql = """
WITH l AS (SELECT event_id AS l_id, user_id, ts AS l_ts FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT event_id AS r_id, user_id, ts AS r_ts FROM events
      WHERE event_type = 'view')
SELECT l.l_id, l.user_id AS key, l.l_ts, r.r_id, r.r_ts
FROM l JOIN r ON l.user_id = r.user_id
WHERE r.r_ts <= l.l_ts AND r.r_ts >= l.l_ts - INTERVAL 1 HOUR
"""

session_join_sql = """
WITH s AS (
  SELECT user_id, event_type, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM s)
SELECT a.user_id AS user_id, a.event_id AS l_id, b.event_id AS r_id
FROM g a JOIN g b ON a.user_id = b.user_id AND a.sess = b.sess
WHERE a.event_type = 'purchase' AND b.event_type = 'view'
"""

funnel_counts_sql = """
WITH m AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
  FROM events GROUP BY user_id)
SELECT CAST(COUNT(CASE WHEN t0 IS NOT NULL THEN 1 END) AS BIGINT) AS n_stage1,
       CAST(COUNT(CASE WHEN t1 > t0 THEN 1 END) AS BIGINT) AS n_stage2,
       CAST(COUNT(CASE WHEN t1 > t0 AND t2 > t1 THEN 1 END) AS BIGINT) AS n_stage3
FROM m
"""

pricing_summary_sql = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_price_c,
  CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 100.0)
      AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
  CAST(SUM(CAST(FLOOR(((l_extendedprice * (1 - l_discount)) * (1 + l_tax))
      * 100.0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
  CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT))
    // COUNT(*) AS BIGINT) AS avg_qty_c,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
    // COUNT(*) AS BIGINT) AS avg_price_c,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

spatial_semi_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT b.idx AS idx FROM b
WHERE EXISTS (SELECT 1 FROM q WHERE {intersects})
"""

spatial_anti_sql = f"""
WITH b AS ({b_orders}), q AS ({q_cust})
SELECT b.idx AS idx FROM b
WHERE NOT EXISTS (SELECT 1 FROM q WHERE {intersects})
"""

source_dedup_stats_sql = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique
FROM documents GROUP BY source
"""

ann_classify_sql = f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT 10),
d AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.embedding, e.embedding) AS sim
      FROM q, embeddings e),
r AS (SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM d),
l AS (SELECT r.query_id, e.label FROM r JOIN embeddings e USING (vec_id)
      WHERE r.rn <= {ANN_K}),
c AS (SELECT query_id, label, COUNT(*) AS c FROM l GROUP BY query_id, label),
w AS (SELECT query_id, label,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, label) AS wn
      FROM c)
SELECT query_id, CAST(label AS BIGINT) AS label FROM w WHERE wn = 1
"""

from python_prtree_ray.pipelines.sample import weighted_sample_sql

doc_sample_weighted_sql = f"""
SELECT doc_id, n_chars FROM documents
WHERE {weighted_sample_sql('doc_id', 'n_chars', 5)}
"""

region_rollup_sql = """
SELECT r.r_name AS r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
         AS acctbal_c
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

# ---- media twins: the stub payload is a pure function of media_ref,
# and the interleaved corpus is a pure function of the doc number, so
# BOTH media pipelines regenerate exactly in DuckDB (spans CTE twin
# verified row-identical in tests/test_pipelines_ray.py).
from python_prtree_ray.sources.synth import (
    MEDIA_PAYLOAD_SQL,
    MEDIA_PLEN_SQL,
    interleaved_spans_sql,
)

spans_sql = interleaved_spans_sql(
    "(SELECT row_number() OVER () - 1 AS i FROM orders)"
)

def _fterm(k: int) -> str:
    return " + ".join(
        f"CASE WHEN length(p) >= {8 * k + j + 1} "
        f"THEN ord(substr(p, {8 * k + j + 1}, 1)) ELSE 0 END"
        for j in range(8)
    )

f_cols = ",\n       ".join(
    f"CAST({_fterm(k)} AS BIGINT) AS f{k}" for k in range(8)
)
media_features_sql = f"""
WITH sp AS ({spans_sql}),
pay AS (SELECT doc_id, "offset", kind, {MEDIA_PAYLOAD_SQL} AS p FROM sp)
SELECT doc_id, "offset", kind,
       {f_cols}
FROM pay
"""

video_frames_sql = f"""
WITH sp AS ({spans_sql}),
v AS (SELECT doc_id, "offset", {MEDIA_PLEN_SQL} AS plen FROM sp
      WHERE kind = 'video'),
c AS (SELECT doc_id, "offset", plen,
             CAST(CEIL(plen / 64.0) AS BIGINT) AS n_chunks FROM v)
SELECT doc_id, "offset",
       CAST(CEIL(n_chunks / 2.0) AS BIGINT) AS n_frames,
       CAST(LEAST(64, plen) +
            CASE WHEN n_chunks > 2 THEN LEAST(64, plen - 128) ELSE 0 END
            AS BIGINT) AS frame_bytes
FROM c
"""

interval_join_sql = """
WITH l AS (SELECT event_id AS l_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     r AS (SELECT event_id AS r_id, user_id, ts FROM events
           WHERE event_type = 'view')
SELECT l.l_id, r.r_id
FROM l JOIN r ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts AND l.ts + INTERVAL 2 HOUR
"""

from python_prtree_ray.pipelines.sample import SAMPLE_CHANNEL as _SCH

_sa, _sb = derive.CHANNELS[_SCH]
doc_cap_per_lang_sql = f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * {_sa} + {_sb}) % {derive.MOD}, doc_id) AS rn
  FROM documents)
WHERE rn <= 50
"""

spatial_join_3d_sql = f"""
WITH b AS ({derive.boxes_3d_sql("orders", "o_orderkey", "idx")}),
     q AS ({derive.query_boxes_3d_sql("customer", "c_custkey", "query_id")})
SELECT q.query_id AS query_id, b.idx AS idx
FROM q, b
WHERE {intersects}
  AND q.zmin <= b.zmax AND b.zmin <= q.zmax
"""

spatial_join_4d_sql = f"""
WITH b AS ({derive.boxes_4d_sql("orders", "o_orderkey", "idx")}),
     q AS ({derive.query_boxes_4d_sql("customer", "c_custkey", "query_id")})
SELECT q.query_id AS query_id, b.idx AS idx
FROM q, b
WHERE {intersects}
  AND q.zmin <= b.zmax AND b.zmin <= q.zmax
  AND q.tmin <= b.tmax AND b.tmin <= q.tmax
"""
