"""One-shot refactor: split the 13.5k-line ``__ray_entry__.py`` into
``python_prtree_ray/queries/<family>.py`` modules (VERDICT r4 item #3).

Mechanics (all AST/tokenize-driven so the oracle SQL strings stay
byte-identical):

- module-level helpers + constants        -> queries/_common.py
- ``queries()`` closure bodies (320 q_*)  -> per-family modules, dedented
  4 spaces EXCEPT lines inside multi-line string literals (tokenize
  STRING spans), so triple-quoted SQL fragments keep their exact bytes
- ``oracle_sql()`` local statements        -> queries/_sqlparts.py
- ``oracle_sql()`` return-dict entries     -> per-family ``SQL`` dicts
- ``queries()`` return-dict order          -> queries/__init__.py _ORDER

Run from the repo root:  python tools/split_entry.py
Validation is external: compare against /tmp/contract_old.pkl, then
tools/check_oracles.py + pytest.
"""

from __future__ import annotations

import ast
import io
import os
import sys
import tokenize

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(ROOT, "__ray_entry__.py")
QDIR = os.path.join(ROOT, "python_prtree_ray", "queries")

# One-shot guard: the split already ran (round 5) and the family modules
# have since been hand-edited (new ops, perf rewrites). Re-running would
# regenerate them from an entry module that no longer holds the sources.
if os.path.exists(os.path.join(QDIR, "__init__.py")):
    sys.exit(
        "split_entry.py already ran: python_prtree_ray/queries/ exists. "
        "This tool is kept for provenance only; remove the package first "
        "if you REALLY mean to re-split."
    )

# ---------------------------------------------------------------- families

FAMILIES: dict[str, list[str]] = {
    "spatial": """spatial_join box_count tree_stats spatial_join_shuffle
        self_join iou_join point_query spatial_join_obj batch_query_lists
        spatial_join_3d spatial_join_4d spatial_semi spatial_anti
        lifecycle_query checkpoint_resume save_load boxes_union_area
        closest_pair points_diameter adaptive_quadtree skyline
        cell_histogram raster_tiles""",
    "knn": """knn knn_3d knn_4d knn_ring knn_geo knn_regress knn_hubness
        radius_join haversine_join nn_pairs mutual_nn nn_histogram""",
    "geometry": """pip pip_nonconvex zonal_stats idw_grid kde_grid
        empty_space_f largest_empty_circle morans_i gearys_c local_morans
        bivariate_moran ripley_k ripley_curve getis_ord quadrat_test
        knox_stat cross_k semivariogram join_counts clark_evans
        std_ellipse contour_cases""",
    "tiling": """tile_points tile_cover tile_extent tile_topk tile_quadkey
        tile_hilbert hilbert_ranges tile_quantiles hex_bin hilbert_locality
        tile_pyramid hotspot_cells tile_neighbors tile_geohash tile_users
        tile_buffer tile_gini tile_majority tile_simpson tile_rank_corr
        tile_density_rank tile_turnover tile_peak_hour tile_focal_mean
        tile_boundary tile_occupancy_curve raster_regions voronoi_assign
        voronoi_cost seed_catchment gravity_access flow_direction
        flow_accumulation watershed_sizes hotspot_coverage value_hotspots
        tile_top_visitor grid_bfs tile_pagerank tile_kcore tile_distance
        class_adjacency""",
    "movement": """trajectory_length trajectory_simplify trajectory_hull
        geofence_events segment_crossings od_matrix od_asymmetry top_routes
        tile_net_flow tile_motifs covisit_tile_pairs covisit_triangles
        co_travelers travel_groups colocation_pairs stay_points
        resample_track cell_dwell cell_trend cell_slope cell_hours
        home_cells radius_gyration track_diameter track_hausdorff track_dtw
        segment_tiles turn_histogram jump_histogram heading_histogram
        snap_points speed_outliers max_dwell_run trend_movers
        user_top2_cells event_transitions""",
    "text": """dedup_exact token_stats pii_scrub doc_lm_freq doc_compress
        doc_chunks quality_score lang_id simhash simhash_pairs token_pieces
        minhash_pairs ngram_jaccard doc_fingerprint text_normalize
        doc_repetition decontaminate dup_ngram_coverage search_topk
        search_bm25 lexical_diversity typo_pairs bigram_lift char_trigrams
        vocab_topk vocab_hapax heavy_hitters corpus_curation
        quality_adaptive doc_tfidf_top doc_cap_per_lang source_dedup_stats
        source_jaccard lang_confusion doc_len_rank gram_novelty
        source_lang_entropy dup_clusters dedup_survivors cluster_size_hist
        doc_sample doc_sample_stratified doc_sample_weighted
        pack_documents""",
    "ann": """ann_topk ann_range ann_lsh ann_ivf ann_pq ann_classify
        emb_covariance emb_norm_outliers emb_dim_quantiles emb_top_eigen
        emb_top2_eigen embedding_neardup embedding_neardup_exact
        label_cohesion label_separation label_centroids kmeans
        type_centroids dbscan point_clusters""",
    "events": """events_band_join events_window events_hopping events_session
        events_sessionized events_dedup events_rolling events_enriched
        events_enriched_left events_unmatched events_user_topk events_pivot
        user_features top_events distinct_users distinct_users_hll
        session_join funnel_counts record_events late_events user_journeys
        order_running_totals attribution_last_touch session_type_pairs
        value_peaks user_gini cohort_retention rolling_wau weekly_active
        activity_heatmap activity_autocorr activity_decile_purchase
        interarrival_hist event_age_hist user_burstiness daily_cusum
        user_max_drawdown user_first_last incremental_agg
        weekday_skew_users daily_new_returning type_run_hist type_dow_chi2
        type_colocation weekly_anomaly convert_delay_quantiles
        active_span_quantiles session_duration_quantiles props_extract""",
    "analytics": """q3_revenue top_revenue pricing_summary lineitem_orders
        orders_cust_left orders_cust_outer orders_with_returns
        orders_no_returns orders_semi_bloom local_supplier_volume
        co_purchase_parts discount_revenue nation_trade_pairs nation_share
        nation_balance nation_profit segment_order_dist small_qty_revenue
        large_orders promo_revenue region_monthly_revenue region_rollup
        region_count_curve part_best_supplier ship_delay_quantiles
        returns_revenue_share above_avg_orders cust_order_histogram
        brand_revenue reorder_gap_quantiles order_size_corr monthly_revenue
        market_share excess_parts waiting_suppliers part_supplier_counts
        bracket_revenue returned_cust_revenue top_supplier_qtr
        priority_fill_rate sales_opportunity cube_revenue custkey_setops
        acctbal_deciles benford_hist cents_mod_hist lapsed_customers
        recency_hist pareto_users supplier_reach_hist lorenz_curve
        asof_purchase_view interval_join interval_union""",
    "stats": """value_quantiles value_drift value_ks value_mwu
        value_welch_t value_mad value_percentile value_histogram
        grouped_moments robust_outliers""",
    "multimodal": """media_features video_frames span_sequence doc_modality
        span_transitions span_windows span_tiles span_box_join""",
}
KEY2FAM = {}
for fam, blob in FAMILIES.items():
    for k in blob.split():
        assert k not in KEY2FAM, f"dup family assignment {k}"
        KEY2FAM[k] = fam

# ---------------------------------------------------------------- parse

src = open(ENTRY).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)
topfns = {n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)}

# lines that are *continuations* of a multi-line string literal: never
# re-indent those (their bytes are part of a string value)
protected: set[int] = set()
for tok in tokenize.generate_tokens(io.StringIO(src).readline):
    if tok.type == tokenize.STRING and tok.end[0] > tok.start[0]:
        protected.update(range(tok.start[0] + 1, tok.end[0] + 1))


def seg(a: int, b: int) -> str:
    """1-based inclusive line span."""
    return "".join(lines[a - 1 : b])


def dedent4(a: int, b: int) -> str:
    out = []
    for ln in range(a, b + 1):
        t = lines[ln - 1]
        if ln in protected or t.strip() == "":
            out.append("\n" if t.strip() == "" and ln not in protected else t)
        else:
            assert t.startswith("    "), (ln, t)
            out.append(t[4:])
    return "".join(out)


# ---------------------------------------------------------------- _common

qfn = topfns["queries"]
q_imports = [s for s in qfn.body if isinstance(s, ast.ImportFrom)]
q_defs = [s for s in qfn.body if isinstance(s, ast.FunctionDef)]
q_ret = [s for s in qfn.body if isinstance(s, ast.Return)][0]
helper_defs = [f for f in q_defs if not f.name.startswith("q_")]
query_defs = [f for f in q_defs if f.name.startswith("q_")]

# module-level helper/constant span: first helper def .. line before entry()
first_helper = topfns["_isin_sorted"]
entry_fn = topfns["entry"]
helper_span_end = entry_fn.lineno - 1
# strip trailing separator-comment lines
while lines[helper_span_end - 1].lstrip().startswith("#") or not lines[
    helper_span_end - 1
].strip():
    helper_span_end -= 1

common_body = seg(first_helper.lineno, helper_span_end)
for h in helper_defs:
    common_body += "\n\n" + dedent4(h.lineno, h.end_lineno)

common_src = (
    '"""Shared constants + helpers for the query-family modules (split\n'
    "from ``__ray_entry__`` in round 5; see that module's docstring for\n"
    'the driver contract).  Citations to /root/reference are unchanged.\n'
    '"""\n\n'
    "from __future__ import annotations\n\n"
    "import numpy as np  # noqa: F401\n\n"
    "from python_prtree_ray.functions import derive  # noqa: F401\n"
    "from python_prtree_ray.sources import tables  # noqa: F401\n"
    "from python_prtree_ray.pipelines import (  # noqa: F401\n"
    "    ann,\n    dedup,\n    knn,\n    pip,\n"
    "    spatial_join as sj,\n    text,\n    tiling,\n    windows,\n)\n\n\n"
    + common_body
)

# ---------------------------------------------------------------- _sqlparts

ofn = topfns["oracle_sql"]
o_ret = [s for s in ofn.body if isinstance(s, ast.Return)][0]
o_stmts = [s for s in ofn.body if not isinstance(s, ast.Return)]
_sql_end = o_ret.lineno - 1
while not lines[_sql_end - 1].strip():
    _sql_end -= 1
sqlparts_body = dedent4(o_stmts[0].lineno, _sql_end)
sqlparts_src = (
    '"""All shared DuckDB-oracle SQL fragments formerly local to\n'
    "``oracle_sql()`` — module-level so each query family's ``SQL`` dict\n"
    "can reference exactly the fragments it needs.  Statement order is\n"
    "preserved verbatim (later rebinds of scratch names like ``g`` see\n"
    'the same final values the function locals did)."""\n\n'
    "from __future__ import annotations\n\n"
    "import numpy as np  # noqa: F401\n\n"
    "from python_prtree_ray.functions import derive  # noqa: F401\n"
    "from python_prtree_ray.queries._common import *  # noqa: F401,F403\n"
    "from python_prtree_ray.queries._common import (  # noqa: F401\n"
    "    _isin_sorted,\n    _seed_sites,\n    _seeds_cte,\n"
    "    _tile_pagerank_sql,\n    _tile_kcore_sql,\n    _tile_distance_sql,\n"
    "    _event_tracks,\n    _event_points,\n)\n\n\n"
    + sqlparts_body
)

# ---------------------------------------------------------------- mappings

qkeys = [k.value for k in q_ret.value.keys]
qvals = [v.id for v in q_ret.value.values]
assert len(qkeys) == len(set(qkeys))
missing = [k for k in qkeys if k not in KEY2FAM]
extra = [k for k in KEY2FAM if k not in qkeys]
assert not missing, f"unassigned keys: {missing}"
assert not extra, f"stale family keys: {extra}"
key2fn = dict(zip(qkeys, qvals))
fn2key = dict(zip(qvals, qkeys))

okeys = [k.value for k in o_ret.value.keys]
for k in okeys:
    assert k in KEY2FAM, k

# per-entry source segments of the oracle return dict (prev-value-end+1
# .. value-end keeps inter-entry comments attached to the FOLLOWING key)
import re as _re

o_entries: dict[str, str] = {}
prev_end = o_ret.value.lineno  # the "return {" line
_pairs = list(zip(o_ret.value.keys, o_ret.value.values))
for i, (knode, vnode) in enumerate(_pairs):
    start = prev_end + 1
    assert knode.lineno >= start, (knode.value, knode.lineno, start)
    # a parenthesized value's closing ")" line is NOT inside the AST
    # node's span — absorb trailing closing-bracket-only lines
    end = vnode.end_lineno
    nxt = (
        _pairs[i + 1][0].lineno if i + 1 < len(_pairs) else o_ret.value.end_lineno
    )
    while end + 1 < nxt and _re.match(r"^\s*[)\]]+\s*,?\s*$", lines[end]):
        end += 1
    o_entries[knode.value] = dedent4(start, end)
    prev_end = end
o_trailer = dedent4(prev_end + 1, o_ret.value.end_lineno - 1)

# per-closure source segments (prev-sibling-end+1 keeps leading comments)
q_src: dict[str, str] = {}
prev_end = None
for f in q_defs:
    start = f.lineno if prev_end is None else prev_end + 1
    # first def: start right at its own line (imports precede)
    if prev_end is None:
        start = f.lineno
    q_src[f.name] = dedent4(start, f.end_lineno)
    prev_end = f.end_lineno

# ---------------------------------------------------------------- emit

os.makedirs(QDIR, exist_ok=True)
open(os.path.join(QDIR, "_common.py"), "w").write(common_src)
open(os.path.join(QDIR, "_sqlparts.py"), "w").write(sqlparts_src)

# name registries for import generation
def toplevel_names(path: str) -> set[str]:
    m = ast.parse(open(path).read())
    out: set[str] = set()
    for n in m.body:
        if isinstance(n, (ast.FunctionDef, ast.ClassDef)):
            out.add(n.name)
        elif isinstance(n, ast.Assign):
            for t in n.targets:
                if isinstance(t, ast.Name):
                    out.add(t.id)
        elif isinstance(n, ast.ImportFrom):
            for a in n.names:
                if a.name != "*":
                    out.add(a.asname or a.name)
    return out


common_names = toplevel_names(os.path.join(QDIR, "_common.py"))
sql_names = toplevel_names(os.path.join(QDIR, "_sqlparts.py")) - {"*"}

import builtins

BUILTINS = set(dir(builtins))

fam_order = list(FAMILIES)
for fam in fam_order:
    keys = [k for k in qkeys if KEY2FAM[k] == fam]
    skeys = [k for k in okeys if KEY2FAM[k] == fam]
    body_parts = [q_src[key2fn[k]] for k in keys]
    sql_parts = [o_entries[k] for k in skeys]
    # build SQL dict text (entries already carry "key": value, + comma)
    sql_dict = "SQL = {\n" + "".join(sql_parts) + "}\n" if skeys else "SQL = {}\n"
    qdict = (
        "QUERIES = {\n"
        + "".join(f'    "{k}": {key2fn[k]},\n' for k in keys)
        + "}\n"
    )
    draft = "\n\n".join(body_parts) + "\n\n" + qdict + "\n" + sql_dict

    # free-name analysis over the draft to generate imports
    try:
        mod = ast.parse(draft)
    except SyntaxError as e:
        open("/tmp/draft_fail.py", "w").write(draft)
        print(f"family {fam} draft syntax error at line {e.lineno}")
        raise
    owned = {
        n.name for n in mod.body if isinstance(n, (ast.FunctionDef, ast.ClassDef))
    } | {
        t.id
        for n in mod.body
        if isinstance(n, ast.Assign)
        for t in n.targets
        if isinstance(t, ast.Name)
    }
    used = {n.id for n in ast.walk(mod) if isinstance(n, ast.Name)}
    need = used - owned - BUILTINS
    from_common = sorted(need & common_names)
    from_sql = sorted((need & sql_names) - common_names)
    unknown = sorted(
        n
        for n in need - common_names - sql_names
        if not n.startswith("q_") and n not in ("np", "derive")
    )
    cross = sorted(
        n for n in need - owned if n.startswith("q_") and n not in owned
    )
    # q_* helpers from other families: must be none (co-located by design)
    cross = [n for n in cross if n in fn2key]
    assert not cross, f"{fam}: cross-family q refs {cross}"
    # remaining unknowns are genuinely local loads (comprehension targets
    # etc. are handled by ast as Name stores inside functions — the
    # walk-based 'used' set over-collects; anything not importable and
    # not owned at top level must be a function-local name)
    unknown = [n for n in unknown if n in common_names or n in sql_names]
    assert not unknown

    header = (
        f'"""{fam} query family (split from ``__ray_entry__``, round 5).\n\n'
        "Each ``q_<name>`` takes an sf directory and returns a lazy\n"
        "``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB\n"
        'oracle twins keyed identically to ``QUERIES``."""\n\n'
        "from __future__ import annotations\n\n"
        "import numpy as np  # noqa: F401\n\n"
        "from python_prtree_ray.functions import derive  # noqa: F401\n"
    )
    if from_common:
        header += (
            "from python_prtree_ray.queries._common import (  # noqa: F401\n"
            + "".join(f"    {n},\n" for n in from_common)
            + ")\n"
        )
    if from_sql:
        header += (
            "from python_prtree_ray.queries._sqlparts import (  # noqa: F401\n"
            + "".join(f"    {n},\n" for n in from_sql)
            + ")\n"
        )
    open(os.path.join(QDIR, f"{fam}.py"), "w").write(
        header + "\n\n" + draft
    )

# ---------------------------------------------------------------- __init__

init_src = (
    '"""Aggregated query surface: every family\'s ``QUERIES``/``SQL``\n'
    "merged in the original ``__ray_entry__`` registration order (the\n"
    'driver samples dict order).\n\n'
    + o_trailer.replace('"""', "'''")
    + '"""\n\n'
    "from __future__ import annotations\n\n"
    "from python_prtree_ray.queries import (\n"
    + "".join(f"    {f},\n" for f in fam_order)
    + ")\n\n"
    "_FAMILIES = [" + ", ".join(fam_order) + "]\n\n"
    "_QUERY_ORDER = (\n"
    + "".join(f'    "{k}",\n' for k in qkeys)
    + ")\n\n"
    "_SQL_ORDER = (\n"
    + "".join(f'    "{k}",\n' for k in okeys)
    + ")\n\n\n"
    "def all_queries():\n"
    "    merged = {}\n"
    "    for m in _FAMILIES:\n"
    "        merged.update(m.QUERIES)\n"
    "    return {k: merged[k] for k in _QUERY_ORDER}\n\n\n"
    "def all_sql():\n"
    "    merged = {}\n"
    "    for m in _FAMILIES:\n"
    "        merged.update(m.SQL)\n"
    "    return {k: merged[k] for k in _SQL_ORDER}\n"
)
open(os.path.join(QDIR, "__init__.py"), "w").write(init_src)

# ---------------------------------------------------------------- entry

entry_body = seg(entry_fn.lineno, entry_fn.end_lineno)
consts = sorted(
    n
    for n in common_names
    if n.isupper() or n in ("RES",)
)
new_entry = (
    seg(1, tree.body[0].end_lineno)  # module docstring
    + "\n"
    "from __future__ import annotations\n\n"
    "from typing import Any\n\n"
    "from python_prtree_ray.queries import all_queries, all_sql\n"
    "from python_prtree_ray.queries._common import (  # noqa: F401\n"
    + "".join(f"    {n},\n" for n in consts)
    + ")\n\n\n"
    + entry_body
    + "\n\n"
    "def queries():\n"
    "    return all_queries()\n\n\n"
    "def oracle_sql():\n"
    "    return all_sql()\n"
)
open(ENTRY, "w").write(new_entry)

print("families:", {f: sum(1 for k in qkeys if KEY2FAM[k] == f) for f in fam_order})
print("entry lines:", new_entry.count("\n"))
