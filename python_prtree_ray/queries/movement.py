"""movement query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    COLOC_MIN_SHARED,
    COLOC_RES,
    DWELL_RES,
    MOTIF_RES,
    RESAMPLE_STEP_US,
    RESAMPLE_T0_US,
    SNAP_MAXMOVE,
    SNAP_R,
    SNAP_RES,
    SPEED_KMH_T,
    STAY_RES,
    TILE_RES,
    TRACK_RES,
    TRACK_SIM_RES,
    TRACK_SIM_START_RES,
    _event_points,
    _event_tracks,
    derive,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _cell_hours_sql,
    _cell_slope_sql,
    _cell_trend_sql,
    _heading_histogram_sql,
    _home_cells_sql,
    _jump_histogram_sql,
    _max_dwell_run_sql,
    _od_asymmetry_sql,
    _radius_of_gyration_sql,
    _segment_tiles_sql,
    _snap_to_segments_sql,
    _speed_outliers_sql,
    _tile_motifs_sql,
    _track_diameter_sql,
    _trajectory_hausdorff_sql,
    _turn_histogram_sql,
    p_cust,
)



def q_tile_net_flow(sf):
    # per-tile flow balance: inbound minus outbound moves from the
    # OD transition stream (net attractor/source signal)
    import pyarrow as pa
    from python_prtree_ray.pipelines.merge import bucketed_sum

    od = q_od_matrix(sf)

    def partial(tbl: pa.Table) -> pa.Table:
        frm = tbl.column("from_cell").to_numpy(zero_copy_only=False)
        to = tbl.column("to_cell").to_numpy(zero_copy_only=False)
        n = tbl.column("n_moves").to_numpy(zero_copy_only=False)
        keep = frm != to  # self-loops carry no net flow
        cells = np.concatenate([to[keep], frm[keep]])
        n_in = np.concatenate([n[keep], np.zeros(keep.sum(), np.int64)])
        n_out = np.concatenate([np.zeros(keep.sum(), np.int64), n[keep]])
        order = np.argsort(cells, kind="stable")
        c_s = cells[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        return pa.table(
            {
                "cell": c_s[starts],
                "n_in": np.add.reduceat(n_in[order], starts),
                "n_out": np.add.reduceat(n_out[order], starts),
            }
        )

    summed = bucketed_sum(
        od.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cell",
        value_cols=("n_in", "n_out"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        i = tbl.column("n_in").to_numpy(zero_copy_only=False)
        o = tbl.column("n_out").to_numpy(zero_copy_only=False)
        return tbl.append_column("net", pa.array(i - o, pa.int64()))

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_trajectory_length(sf):
    # per-user L1 path length over time-ordered georeferenced events
    # (exact integer grid -> LAG-window SQL twin is bit-identical)
    from python_prtree_ray.pipelines.trajectory import trajectory_length

    return trajectory_length(_event_tracks(sf, TRACK_RES))



def q_trajectory_simplify(sf):
    # per-user Douglas-Peucker track compaction on the integer grid
    # (exact cross-product deviation test -> parallelism-invariant;
    # pytest-oracled vs a recursive reference, no SQL twin)
    from python_prtree_ray.pipelines.trajectory import trajectory_simplify

    return trajectory_simplify(_event_tracks(sf, TRACK_RES), eps=2)



def q_trajectory_hull(sf):
    # per-user convex hull of visited grid points (coverage
    # footprint): exact integer monotone chain, CCW ring from the
    # lexicographically smallest vertex; pytest-oracled vs a
    # gift-wrapping reference, no SQL twin (ring order)
    from python_prtree_ray.pipelines.trajectory import trajectory_hull

    return trajectory_hull(_event_tracks(sf, TRACK_RES))



def q_geofence_events(sf):
    # per-user zone entry/exit transitions against the broadcast
    # hexagon set (zone = containing poly or -1); the containment
    # cross-product expression is shared with pip, so the SQL twin
    # (LEFT JOIN + LAG) matches bitwise
    from python_prtree_ray.pipelines.geofence import geofence_events

    return geofence_events(_event_points(sf))



def q_segment_crossings(sf):
    # path-conflict join: movement segments of different users that
    # intersect (exact int64 orientation tests, closed semantics);
    # teleport-gated (L-inf <= 128 grid units), tile-bucketed with
    # owner-corner exactly-once emission
    from python_prtree_ray.pipelines.geofence import segment_crossings

    return segment_crossings(
        _event_tracks(sf, TRACK_RES), max_move=128, res=TRACK_RES, bucket_res=3
    )



def q_od_matrix(sf):
    # origin->destination tile flow matrix over consecutive
    # same-user moves (coarse TILE_RES grid keeps the matrix dense)
    from python_prtree_ray.pipelines.movement import od_matrix

    return od_matrix(_event_tracks(sf, TILE_RES), res=TILE_RES)



def q_tile_motifs(sf):
    # trajectory sequence mining: global top-k consecutive tile
    # trigrams (route motifs) — triple fold + pruned global top-k
    from python_prtree_ray.pipelines.movement import tile_motifs

    return tile_motifs(_event_tracks(sf, MOTIF_RES), res=MOTIF_RES, k=50)



def q_top_routes(sf):
    # top-k OD corridors by traffic: pruned global top-k over the
    # transition matrix, (n DESC, packed pair ASC) order
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import global_topk

    od = q_od_matrix(sf)
    g2 = np.int64(1 << TILE_RES) ** 2

    def pack(tbl: pa.Table) -> pa.Table:
        f = tbl.column("from_cell").to_numpy(zero_copy_only=False)
        t = tbl.column("to_cell").to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": f * g2 + t, "n_moves": tbl.column("n_moves")}
        )

    top = global_topk(
        od.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
        k=50,
        id_col="key",
        value_col="n_moves",
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_cell": key // g2,
                "to_cell": key % g2,
                "n_moves": tbl.column("n_moves"),
                "rank": tbl.column("rank"),
            }
        )

    return top.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)



def q_covisit_tile_pairs(sf):
    # co-visitation between PLACES: tile pairs sharing >= 4 distinct
    # visitors — per-user distinct-tile fold, offset-sweep pair
    # expansion (a<b for free), ONE pair-key sum
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    MIN_USERS = 4
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )
    g2 = np.int64(1 << STAY_RES) ** 2

    def prep(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        cell = cell_of_points(p["px"], p["py"], STAY_RES)
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((cell, u))
        u_s, c_s = u[order], cell[order]
        keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])][: u_s.size]
        return pa.table(
            {
                "bucket": bucket_of(u_s[keep], 256),
                "u": u_s[keep],
                "cell": c_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return empty
        c = group.column("cell").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, u))
        u_s, c_s = u[order], c[order]
        keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])][: u_s.size]
        u_s, c_s = u_s[keep], c_s[keep]
        pa_l, pb_l = [], []
        d = 1
        while d < u_s.size:
            valid = u_s[d:] == u_s[:-d]
            if not valid.any():
                break
            pa_l.append(c_s[:-d][valid])
            pb_l.append(c_s[d:][valid])
            d += 1
        if not pa_l:
            return empty
        a = np.concatenate(pa_l)
        b = np.concatenate(pb_l)
        key, n = np.unique(a * g2 + b, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    keyed = ev.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

    def finish(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        keep = n >= MIN_USERS
        return pa.table(
            {
                "cell_a": key[keep] // g2,
                "cell_b": key[keep] % g2,
                "n_users": n[keep],
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_co_travelers(sf):
    # co-traveler detection (the covisit dual): user PAIRS
    # co-present in >= 3 distinct (tile, day) buckets — distinct
    # (bucket, user) fold, offset-sweep pair expansion inside each
    # spatiotemporal-bucket group (a<b for free from the sort),
    # ONE pair-key sum. Pair fanout is per-bucket quadratic by
    # SEMANTICS (the oracle self-join blows up identically); the
    # day x 16x16 grid keeps buckets small and unskewed here.
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum

    MIN_SHARED = 3
    US_DAY = 86_400_000_000
    g2 = np.int64(1 << STAY_RES) ** 2
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        cell = cell_of_points(p["px"], p["py"], STAY_RES)
        day = (
            tbl.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
            // US_DAY
        )
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if u.size and int(u.max()) >= (1 << 31):
            raise ValueError("user_id must fit 31 bits for pair packing")
        st = day * g2 + cell
        order = np.lexsort((u, st))
        s_s, u_s = st[order], u[order]
        keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (u_s[1:] != u_s[:-1])][: s_s.size]
        return pa.table(
            {
                "bucket": bucket_of(s_s[keep], 256),
                "st": s_s[keep],
                "u": u_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        st = group.column("st").to_numpy(zero_copy_only=False)
        if st.size == 0:
            return empty
        u = group.column("u").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, st))
        s_s, u_s = st[order], u[order]
        keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (u_s[1:] != u_s[:-1])][: s_s.size]
        s_s, u_s = s_s[keep], u_s[keep]
        pa_l, pb_l = [], []
        d = 1
        while d < s_s.size:
            valid = s_s[d:] == s_s[:-d]
            if not valid.any():
                break
            pa_l.append(u_s[:-d][valid])
            pb_l.append(u_s[d:][valid])
            d += 1
        if not pa_l:
            return empty
        a = np.concatenate(pa_l)
        b = np.concatenate(pb_l)
        key, n = np.unique(a * np.int64(1 << 31) + b, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    keyed = ev.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

    def finish(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        keep = n >= MIN_SHARED
        return pa.table(
            {
                "user_a": key[keep] // np.int64(1 << 31),
                "user_b": key[keep] % np.int64(1 << 31),
                "n_shared": n[keep],
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_travel_groups(sf):
    # travel-group inference: connected components over the
    # co-traveler pair graph — users linked by >= 3 shared
    # (tile, day) buckets collapse to groups labeled by min user
    # id (composition: co_travelers -> min-label propagation CC)
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.graph import connected_components

    pairs = q_co_travelers(sf)

    def rename(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("doc_id"),
                "group_id": tbl.column("cluster_id"),
            }
        )

    renamed = connected_components(
        pairs, id_a="user_a", id_b="user_b"
    ).map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    # 0-row seed keeps the schema visible when the pair graph is
    # empty (map_batches never runs on a block-less dataset)
    seed = ray.data.from_arrow(
        pa.schema(
            [("user_id", pa.int64()), ("group_id", pa.int64())]
        ).empty_table()
    )
    return seed.union(renamed)



def q_covisit_triangles(sf):
    # place-graph clustering structure: node/edge/triangle counts of
    # the co-visitation tile graph — the distributed pair fold is
    # q_covisit_tile_pairs; the surviving graph is tile-bounded
    # (≤ 4^res nodes), so the triangle count is a driver-side
    # adjacency matmul on metadata
    import pyarrow as pa
    import ray

    pairs = q_covisit_tile_pairs(sf).take_all()
    a = np.array([r["cell_a"] for r in pairs], np.int64)
    b = np.array([r["cell_b"] for r in pairs], np.int64)
    nodes = np.unique(np.r_[a, b])
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    m = nodes.size
    adj = np.zeros((m, m), np.int64)
    adj[ia, ib] = 1
    adj[ib, ia] = 1
    tri = int(np.trace(adj @ adj @ adj) // 6)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_nodes": pa.array([m], pa.int64()),
                "n_edges": pa.array([int(a.size)], pa.int64()),
                "n_triangles": pa.array([tri], pa.int64()),
            }
        )
    )



def q_user_top2_cells(sf):
    # home/work inference: each user's top-2 visited tiles pivoted
    # to one row — (n DESC, cell ASC) order; users with a second
    # cell only (both sides drop single-cell users' cell_2 to NULL-
    # free form by requiring two distinct cells)
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.cells import cell_of_points
    from python_prtree_ray.pipelines.merge import bucketed_sum, grouped_topk

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )
    g2 = np.int64(1 << TILE_RES) ** 2

    def partial(tbl: pa.Table) -> pa.Table:
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        cell = cell_of_points(p["px"], p["py"], TILE_RES)
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if u.size and u.max() >= (1 << (62 - 2 * TILE_RES)):
            raise ValueError("user_top2_cells: user id exceeds pack")
        key, n = np.unique(u * g2 + cell, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    summed = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="key",
        value_cols=("n",),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": key // g2,
                "cell": key % g2,
                "n": tbl.column("n"),
            }
        )

    top2 = grouped_topk(
        summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True),
        k=2,
        key_col="user_id",
        id_col="cell",
        value_col="n",
        descending=True,
    )

    def add_k(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "k", pa.array(np.zeros(tbl.num_rows, np.int64))
        )

    def pivot(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "cell_1": pa.array([], pa.int64()),
                    "n_1": pa.array([], pa.int64()),
                    "cell_2": pa.array([], pa.int64()),
                    "n_2": pa.array([], pa.int64()),
                }
            )
        c = group.column("cell").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        r = group.column("rank").to_numpy(zero_copy_only=False)
        order = np.lexsort((r, u))
        u_s, c_s, n_s, r_s = u[order], c[order], n[order], r[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        sizes = np.diff(np.r_[starts, u_s.size])
        two = sizes == 2  # users with two distinct cells
        s2 = starts[two]
        return pa.table(
            {
                "user_id": u_s[s2],
                "cell_1": c_s[s2],
                "n_1": n_s[s2],
                "cell_2": c_s[s2 + 1],
                "n_2": n_s[s2 + 1],
            }
        )

    return (
        top2.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(pivot, batch_format="pyarrow")
        .select_columns(["user_id", "cell_1", "n_1", "cell_2", "n_2"])
    )



def q_trend_movers(sf):
    # biggest movers: top-20 tiles by |late − early| activity swing
    # — pruned global top-k over the cell_trend stream
    import pyarrow as pa
    from python_prtree_ray.pipelines.merge import global_topk
    from python_prtree_ray.pipelines.movement import cell_trend

    trend = cell_trend(_event_tracks(sf, TILE_RES), res=TILE_RES)

    def absd(tbl: pa.Table) -> pa.Table:
        d = tbl.column("delta").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": tbl.column("cell"),
                "abs_delta": np.abs(d),
            }
        )

    return global_topk(
        trend.map_batches(absd, batch_format="pyarrow", zero_copy_batch=True),
        k=20,
        id_col="cell",
        value_col="abs_delta",
    ).select_columns(["cell", "abs_delta", "rank"])



def q_max_dwell_run(sf):
    # gaps-and-islands: longest same-tile streak per user (exact
    # run-length fold vs the double-ROW_NUMBER SQL islands trick)
    from python_prtree_ray.pipelines.movement import max_dwell_run

    return max_dwell_run(_event_tracks(sf, DWELL_RES), res=DWELL_RES)



def q_od_asymmetry(sf):
    # directional flow imbalance per unordered tile pair: forward /
    # reverse counts + net, metadata-sized pair partials
    from python_prtree_ray.pipelines.movement import od_asymmetry

    return od_asymmetry(_event_tracks(sf, MOTIF_RES), res=MOTIF_RES)



def q_colocation(sf):
    # co-location contact graph: user pairs sharing >= COLOC_MIN_SHARED
    # distinct tiles; per-batch (user, cell) dedup -> ONE cell-bucket shuffle
    # with vectorized triangular pair expansion -> pair-key fold
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.movement import colocation_pairs

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )

    def visits(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "cell": derive.tile_cell(p["px"], p["py"], COLOC_RES),
            }
        )

    return colocation_pairs(
        ev.map_batches(visits, batch_format="pyarrow", zero_copy_batch=True),
        min_shared=COLOC_MIN_SHARED,
    )



def q_stay_points(sf):
    # trajectory stay-point mining (anchor-advance windows >= 6h
    # within grid radius 3 at 16x16 res); exact int sums -> bit-
    # identical at any parallelism; pytest-oracled, no SQL twin
    # (anchor recursion is not window-expressible)
    from python_prtree_ray.pipelines.trajectory import stay_points

    return stay_points(
        _event_tracks(sf, STAY_RES), r=3, min_dwell_us=21_600_000_000
    )



def q_resample_track(sf):
    # time-regular track resampling (6h cadence, linear interp):
    # ONE entity-bucket shuffle; int64-µs gap ratios cast exactly to
    # double so the LEAD-window SQL twin matches bitwise
    from python_prtree_ray.pipelines.trajectory import resample_track

    return resample_track(
        _event_points(sf), t0_us=RESAMPLE_T0_US, step_us=RESAMPLE_STEP_US
    )



def q_cell_dwell(sf):
    # per-tile visit count + exact dwell microseconds (gap to next
    # event attributed to the earlier event's tile)
    from python_prtree_ray.pipelines.movement import cell_dwell

    return cell_dwell(_event_tracks(sf, TILE_RES), res=TILE_RES)



def q_event_transitions(sf):
    # event-type Markov transition counts per user stream; types
    # shuffle as int codes from a metadata-sized vocabulary pass
    import ray

    from python_prtree_ray.pipelines.movement import event_transitions

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return event_transitions(ev)



def q_cell_trend(sf):
    # emerging-hotspot trend: early-vs-late half counts per tile
    # around the stream's midpoint timestamp; exact int64
    from python_prtree_ray.pipelines.movement import cell_trend

    return cell_trend(_event_tracks(sf, TILE_RES), res=TILE_RES)



def q_cell_slope(sf):
    # per-tile OLS activity-trend slope over 8 equal time bins
    # (multi-bin refinement of cell_trend): exact-int numerator over
    # a constant denominator, one double division per tile
    from python_prtree_ray.pipelines.movement import cell_slope

    return cell_slope(_event_tracks(sf, TILE_RES), res=TILE_RES)



def q_home_cells(sf):
    # home-location inference: per-user most-visited tile with the
    # (count DESC, cell ASC) tie-break; exact ints
    from python_prtree_ray.pipelines.movement import home_cells

    return home_cells(_event_tracks(sf, TILE_RES), res=TILE_RES)



def q_rog(sf):
    # radius of gyration (Gonzalez et al. mobility spread): exact-
    # int numerator over n², one double division per user
    from python_prtree_ray.pipelines.movement import radius_of_gyration

    return radius_of_gyration(_event_tracks(sf, TRACK_RES))



def q_track_diameter(sf):
    # per-user max squared grid distance (footprint diameter):
    # exact-int hull + h^2 vertex max per track, never n^2
    from python_prtree_ray.pipelines.trajectory import track_diameter

    return track_diameter(_event_tracks(sf, TRACK_RES))



def q_segment_tiles(sf):
    # supercover line rasterization: every TILE_RES tile each
    # teleport-gated move crosses (exact int SAT test: closed bbox
    # + segment-normal corner signs), one row per (move, tile)
    from python_prtree_ray.pipelines.movement import segment_tiles

    return segment_tiles(
        _event_tracks(sf, TRACK_RES), res=TILE_RES, fine_res=TRACK_RES
    )



def q_turn_histogram(sf):
    # per-user turning-behavior histogram over move pairs: exact
    # integer cross/dot sign classes (no angles), double-LAG twin
    from python_prtree_ray.pipelines.movement import turn_histogram

    return turn_histogram(_event_tracks(sf, TRACK_RES))



def q_jump_hist(sf):
    # jump-length distribution: log2-spaced squared-displacement
    # bins (float-exponent bin == generated CASE ladder, exact)
    from python_prtree_ray.pipelines.movement import jump_histogram

    return jump_histogram(_event_tracks(sf, TRACK_RES))



def q_snap_points(sf):
    # map matching: snap each customer probe point to its nearest
    # event-track segment within r grid units — exact rational
    # distances, (dist2, user, seq) argmin shared with the SQL twin
    import pyarrow as pa
    import ray

    from python_prtree_ray.pipelines.movement import snap_to_segments

    cust = ray.data.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])

    def probe(tbl):
        k = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
        p = derive.derive_points(k)
        return pa.table(
            {
                "query_id": k.astype("int64"),
                "qx": derive.tile_index(p["px"], SNAP_RES),
                "qy": derive.tile_index(p["py"], SNAP_RES),
            }
        )

    probes = cust.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return snap_to_segments(
        probes,
        _event_tracks(sf, SNAP_RES),
        r=SNAP_R,
        max_move=SNAP_MAXMOVE,
        res=SNAP_RES,
        bucket_res=3,
    )



def q_track_hausdorff(sf):
    # track-similarity join: symmetric Hausdorff² between co-started
    # users (same start tile); exact int64, no float anywhere
    from python_prtree_ray.pipelines.trajectory import trajectory_hausdorff

    return trajectory_hausdorff(
        _event_tracks(sf, TRACK_SIM_RES),
        start_res=TRACK_SIM_START_RES,
        res=TRACK_SIM_RES,
    )



def q_track_dtw(sf):
    # ordered track similarity: DTW optimal-alignment cost between
    # co-started users (anti-diagonal DP vectorized across pairs,
    # exact int64). DP recursion has no ANSI-SQL twin -> rows-only;
    # exactness vs a per-pair reference DP is pytest-checked
    from python_prtree_ray.pipelines.trajectory import trajectory_dtw

    return trajectory_dtw(
        _event_tracks(sf, TRACK_SIM_RES),
        start_res=TRACK_SIM_START_RES,
        res=TRACK_SIM_RES,
    )



def q_heading_histogram(sf):
    # per-user movement-direction histogram (sign octants, exact
    # ints): shared trajectory fold, <=8 rows per entity shuffle
    from python_prtree_ray.pipelines.movement import heading_histogram

    return heading_histogram(_event_tracks(sf, TILE_RES))



def q_cell_hours(sf):
    # per-tile hour-of-day activity profile: batch-local (cell,
    # hour) counts + ONE coarse-bucket sum; pure int arithmetic
    from python_prtree_ray.pipelines.movement import cell_hours

    return cell_hours(_event_tracks(sf, TILE_RES), res=TILE_RES)



def q_speed_outliers(sf):
    # GPS-glitch detector: consecutive same-user moves whose implied
    # great-circle speed exceeds SPEED_KMH_T; haversine expression
    # shapes mirror the SQL twin token-for-token (bitwise doubles)
    from python_prtree_ray.pipelines.movement import speed_outliers

    return speed_outliers(_event_points(sf), max_kmh=SPEED_KMH_T)


QUERIES = {
    "tile_net_flow": q_tile_net_flow,
    "trajectory_length": q_trajectory_length,
    "trajectory_simplify": q_trajectory_simplify,
    "trajectory_hull": q_trajectory_hull,
    "geofence_events": q_geofence_events,
    "segment_crossings": q_segment_crossings,
    "od_matrix": q_od_matrix,
    "tile_motifs": q_tile_motifs,
    "top_routes": q_top_routes,
    "covisit_tile_pairs": q_covisit_tile_pairs,
    "co_travelers": q_co_travelers,
    "travel_groups": q_travel_groups,
    "covisit_triangles": q_covisit_triangles,
    "user_top2_cells": q_user_top2_cells,
    "trend_movers": q_trend_movers,
    "max_dwell_run": q_max_dwell_run,
    "od_asymmetry": q_od_asymmetry,
    "colocation_pairs": q_colocation,
    "stay_points": q_stay_points,
    "resample_track": q_resample_track,
    "cell_dwell": q_cell_dwell,
    "event_transitions": q_event_transitions,
    "cell_trend": q_cell_trend,
    "cell_slope": q_cell_slope,
    "home_cells": q_home_cells,
    "radius_gyration": q_rog,
    "track_diameter": q_track_diameter,
    "segment_tiles": q_segment_tiles,
    "turn_histogram": q_turn_histogram,
    "jump_histogram": q_jump_hist,
    "snap_points": q_snap_points,
    "track_hausdorff": q_track_hausdorff,
    "track_dtw": q_track_dtw,
    "heading_histogram": q_heading_histogram,
    "cell_hours": q_cell_hours,
    "speed_outliers": q_speed_outliers,
}

SQL = {
    "trajectory_length": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_index_sql('q.px', TRACK_RES)} AS gx,
         {derive.tile_index_sql('q.py', TRACK_RES)} AS gy
  FROM events e JOIN q USING (event_id)
),
d AS (
  SELECT user_id,
         ABS(gx - LAG(gx) OVER w) + ABS(gy - LAG(gy) OVER w) AS step
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(COUNT(step) AS BIGINT) AS n_moves,
       CAST(SUM(step) AS BIGINT) AS l1_len
FROM d GROUP BY user_id HAVING COUNT(step) > 0
""",
    # geofence twin: per-event zone via the pip cross-product
    # expression (bitwise-shared with the engine kernel), MIN(poly_id)
    # = engine's first-ascending-pid-wins, then LAG over the same
    # (ts, event_id) entity order; transitions are int comparisons
    "geofence_events": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
pe AS (SELECT * FROM {derive.polygon_edges_sql()}),
p AS (
  SELECT e.user_id, e.ts, e.event_id, q.px, q.py
  FROM events e JOIN q USING (event_id)
),
zin AS (
  SELECT p.event_id AS event_id, pe.poly_id AS poly_id
  FROM p, pe
  GROUP BY p.event_id, pe.poly_id
  HAVING bool_and((pe.x2 - pe.x1) * (p.py - pe.y1)
                - (pe.y2 - pe.y1) * (p.px - pe.x1) >= 0.0)
),
z AS (
  SELECT p.user_id, p.ts, p.event_id, COALESCE(zz.zone, -1) AS zone
  FROM p LEFT JOIN (
    SELECT event_id, MIN(poly_id) AS zone FROM zin GROUP BY event_id
  ) zz USING (event_id)
),
l AS (
  SELECT user_id, event_id, zone, LAG(zone) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_zone
  FROM z
)
SELECT user_id, event_id, prev_zone AS from_zone, zone AS to_zone
FROM l WHERE prev_zone IS NOT NULL AND prev_zone <> zone
""",
    # segment-crossing twin: LAG-derived gated segments, self-join on
    # user_a < user_b + bbox overlap (a no-op prefilter: intersecting
    # segments always bbox-overlap), exact int64 four-orientation
    # predicate with collinear-touch cases — literal engine mirror
    "segment_crossings": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_index_sql('q.px', TRACK_RES)} AS gx,
         {derive.tile_index_sql('q.py', TRACK_RES)} AS gy
  FROM events e JOIN q USING (event_id)
),
s AS (
  SELECT user_id, gx AS x2, gy AS y2,
         LAG(gx) OVER w AS x1, LAG(gy) OVER w AS y1,
         LAG(event_id) OVER w AS seq
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seg AS (
  SELECT user_id, seq, x1, y1, x2, y2,
         LEAST(x1, x2) AS lox, GREATEST(x1, x2) AS hix,
         LEAST(y1, y2) AS loy, GREATEST(y1, y2) AS hiy
  FROM s
  WHERE x1 IS NOT NULL AND ABS(x2 - x1) <= 128 AND ABS(y2 - y1) <= 128
),
cand AS (
  SELECT a.user_id AS user_a, a.seq AS seq_a,
         b.user_id AS user_b, b.seq AS seq_b,
         (a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) AS o1,
         (a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) AS o2,
         (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS o3,
         (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS o4,
         (b.x1 >= a.lox AND b.x1 <= a.hix
          AND b.y1 >= a.loy AND b.y1 <= a.hiy) AS b1_on_a,
         (b.x2 >= a.lox AND b.x2 <= a.hix
          AND b.y2 >= a.loy AND b.y2 <= a.hiy) AS b2_on_a,
         (a.x1 >= b.lox AND a.x1 <= b.hix
          AND a.y1 >= b.loy AND a.y1 <= b.hiy) AS a1_on_b,
         (a.x2 >= b.lox AND a.x2 <= b.hix
          AND a.y2 >= b.loy AND a.y2 <= b.hiy) AS a2_on_b
  FROM seg a JOIN seg b ON a.user_id < b.user_id
   AND a.lox <= b.hix AND b.lox <= a.hix
   AND a.loy <= b.hiy AND b.loy <= a.hiy
)
SELECT user_a, seq_a, user_b, seq_b FROM cand
WHERE (((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0))
       AND ((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0)))
   OR (o1 = 0 AND b1_on_a) OR (o2 = 0 AND b2_on_a)
   OR (o3 = 0 AND a1_on_b) OR (o4 = 0 AND a2_on_b)
""",
    "resample_track": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (SELECT e.user_id, e.ts, e.event_id, q.px, q.py
      FROM events e JOIN q USING (event_id)),
d AS (SELECT user_id, ts, px, py,
             LEAD(ts) OVER w AS nts,
             LEAD(px) OVER w AS npx,
             LEAD(py) OVER w AS npy
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
b AS (SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      FROM p GROUP BY user_id),
g AS (SELECT user_id,
             unnest(generate_series(
                 (mn - {RESAMPLE_T0_US} + {RESAMPLE_STEP_US} - 1) // {RESAMPLE_STEP_US},
                 (mx - {RESAMPLE_T0_US}) // {RESAMPLE_STEP_US})) AS epoch
      FROM b),
j AS (SELECT g.user_id AS user_id, g.epoch AS epoch,
             ({RESAMPLE_T0_US} + g.epoch * {RESAMPLE_STEP_US}) AS t_us,
             d.ts AS ts, d.px AS px, d.py AS py,
             d.nts AS nts, d.npx AS npx, d.npy AS npy
      FROM g JOIN d ON d.user_id = g.user_id
       AND epoch_us(d.ts) <= ({RESAMPLE_T0_US} + g.epoch * {RESAMPLE_STEP_US})
       AND (d.nts IS NULL
            OR ({RESAMPLE_T0_US} + g.epoch * {RESAMPLE_STEP_US}) < epoch_us(d.nts)))
SELECT user_id, epoch, t_us,
       CASE WHEN nts IS NULL THEN px
            ELSE px + (npx - px)
                 * (CAST(t_us - epoch_us(ts) AS DOUBLE)
                    / CAST(epoch_us(nts) - epoch_us(ts) AS DOUBLE)) END AS x,
       CASE WHEN nts IS NULL THEN py
            ELSE py + (npy - py)
                 * (CAST(t_us - epoch_us(ts) AS DOUBLE)
                    / CAST(epoch_us(nts) - epoch_us(ts) AS DOUBLE)) END AS y
FROM j
""",
    "colocation_pairs": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id AS u,
         {derive.tile_cell_sql('q.px', 'q.py', COLOC_RES)} AS c
  FROM events e JOIN q USING (event_id)
),
d AS (SELECT DISTINCT u, c FROM p),
pr AS (SELECT a.u AS user_a, b.u AS user_b
       FROM d a JOIN d b ON a.c = b.c AND a.u < b.u)
SELECT user_a, user_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pr GROUP BY user_a, user_b HAVING COUNT(*) >= {COLOC_MIN_SHARED}
""",
    "tile_net_flow": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), pts AS (SELECT e.user_id AS u, e.ts AS ts, "
        "e.event_id AS seq, "
        + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
        + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
        "mv AS (SELECT LAG(cell) OVER (PARTITION BY u ORDER BY ts, seq)"
        " AS f, cell AS t FROM pts), "
        "m2 AS (SELECT f, t FROM mv WHERE f IS NOT NULL AND f <> t), "
        "i AS (SELECT t AS cell, CAST(COUNT(*) AS BIGINT) AS n_in "
        "FROM m2 GROUP BY t), "
        "o AS (SELECT f AS cell, CAST(COUNT(*) AS BIGINT) AS n_out "
        "FROM m2 GROUP BY f) "
        "SELECT COALESCE(i.cell, o.cell) AS cell, "
        "COALESCE(i.n_in, 0) AS n_in, COALESCE(o.n_out, 0) AS n_out, "
        "COALESCE(i.n_in, 0) - COALESCE(o.n_out, 0) AS net "
        "FROM i FULL OUTER JOIN o ON i.cell = o.cell"
    ),
    "covisit_tile_pairs": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), d AS (SELECT DISTINCT e.user_id AS u, "
        + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
        + " AS cell FROM events e JOIN q ON e.event_id = q.event_id) "
        "SELECT a.cell AS cell_a, b.cell AS cell_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM d a JOIN d b ON a.u = b.u AND a.cell < b.cell "
        "GROUP BY 1, 2 HAVING COUNT(*) >= 4"
    ),
    "co_travelers": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), d AS (SELECT DISTINCT e.user_id AS u, "
        "epoch_us(e.ts) // 86400000000 AS day, "
        + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
        + " AS cell FROM events e JOIN q ON e.event_id = q.event_id) "
        "SELECT a.u AS user_a, b.u AS user_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM d a JOIN d b ON a.day = b.day AND a.cell = b.cell "
        "AND a.u < b.u GROUP BY 1, 2 HAVING COUNT(*) >= 3"
    ),
    "travel_groups": (
        "WITH RECURSIVE q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), dd AS (SELECT DISTINCT e.user_id AS u, "
        "epoch_us(e.ts) // 86400000000 AS day, "
        + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
        + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
        "pr AS (SELECT a.u AS ua, b.u AS ub FROM dd a JOIN dd b "
        "ON a.day = b.day AND a.cell = b.cell AND a.u < b.u "
        "GROUP BY 1, 2 HAVING COUNT(*) >= 3), "
        "sym AS (SELECT ua AS a, ub AS b FROM pr "
        "UNION SELECT ub, ua FROM pr), "
        "nodes AS (SELECT DISTINCT a AS d FROM sym), "
        "reach(d, n) AS (SELECT d, d FROM nodes "
        "UNION SELECT r.d, s.b FROM reach r JOIN sym s ON s.a = r.n) "
        "SELECT d AS user_id, MIN(n) AS group_id FROM reach GROUP BY d"
    ),
    "top_routes": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), pts AS (SELECT e.user_id AS u, e.ts AS ts, "
        "e.event_id AS seq, "
        + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
        + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
        "mv AS (SELECT u, LAG(cell) OVER (PARTITION BY u ORDER BY ts,"
        " seq) AS f, cell AS t FROM pts), "
        "c AS (SELECT f AS from_cell, t AS to_cell, "
        "CAST(COUNT(*) AS BIGINT) AS n_moves FROM mv "
        "WHERE f IS NOT NULL GROUP BY 1, 2), "
        f"r AS (SELECT from_cell, to_cell, n_moves, ROW_NUMBER() OVER "
        f"(ORDER BY n_moves DESC, from_cell * {(1 << TILE_RES) ** 2} + "
        "to_cell) AS rank FROM c) "
        "SELECT from_cell, to_cell, n_moves, CAST(rank AS BIGINT) AS "
        "\"rank\" FROM r WHERE rank <= 50"
    ),
    "max_dwell_run": _max_dwell_run_sql(
        derive.points_sql("events", "event_id", "event_id"), DWELL_RES
    ),
    "od_asymmetry": _od_asymmetry_sql(
        derive.points_sql("events", "event_id", "event_id"), MOTIF_RES
    ),
    "tile_motifs": _tile_motifs_sql(
        derive.points_sql("events", "event_id", "event_id"), MOTIF_RES, 50
    ),
    "od_matrix": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_cell_sql('q.px', 'q.py', TILE_RES)} AS cell
  FROM events e JOIN q USING (event_id)
),
d AS (
  SELECT LAG(cell) OVER w AS from_cell, cell AS to_cell
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_cell, to_cell, CAST(COUNT(*) AS BIGINT) AS n_moves
FROM d WHERE from_cell IS NOT NULL GROUP BY from_cell, to_cell
""",
    "cell_dwell": f"""
WITH q AS ({derive.points_sql("events", "event_id", "event_id")}),
p AS (
  SELECT e.user_id, e.ts, e.event_id,
         {derive.tile_cell_sql('q.px', 'q.py', TILE_RES)} AS cell
  FROM events e JOIN q USING (event_id)
),
d AS (
  SELECT cell, ts, LEAD(ts) OVER w AS nts
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_visits,
       CAST(SUM(date_diff('microsecond', ts, nts)) AS BIGINT) AS dwell_us
FROM d WHERE nts IS NOT NULL GROUP BY cell
""",
    "event_transitions": """
WITH d AS (
  SELECT LAG(event_type) OVER w AS from_type, event_type AS to_type
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE from_type IS NOT NULL GROUP BY from_type, to_type
""",
    "trend_movers": (
        "WITH t AS ("
        + _cell_trend_sql(
            derive.points_sql("events", "event_id", "event_id"), TILE_RES
        )
        + "), r AS (SELECT cell, ABS(delta) AS abs_delta, "
        "ROW_NUMBER() OVER (ORDER BY ABS(delta) DESC, cell) AS rank "
        "FROM t) "
        "SELECT cell, abs_delta, CAST(rank AS BIGINT) AS \"rank\" "
        "FROM r WHERE rank <= 20"
    ),
    "user_top2_cells": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), c AS (SELECT e.user_id AS user_id, "
        + derive.tile_cell_sql("q.px", "q.py", TILE_RES)
        + " AS cell, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events e JOIN q ON e.event_id = q.event_id GROUP BY 1, 2), "
        "r AS (SELECT user_id, cell, n, ROW_NUMBER() OVER (PARTITION BY "
        "user_id ORDER BY n DESC, cell) AS rn FROM c) "
        "SELECT a.user_id, a.cell AS cell_1, a.n AS n_1, "
        "b.cell AS cell_2, b.n AS n_2 "
        "FROM r a JOIN r b ON a.user_id = b.user_id "
        "AND a.rn = 1 AND b.rn = 2"
    ),
    "covisit_triangles": (
        "WITH q AS ("
        + derive.points_sql("events", "event_id", "event_id")
        + "), d AS (SELECT DISTINCT e.user_id AS u, "
        + derive.tile_cell_sql("q.px", "q.py", STAY_RES)
        + " AS cell FROM events e JOIN q ON e.event_id = q.event_id), "
        "e2 AS (SELECT a.cell AS ca, b.cell AS cb "
        "FROM d a JOIN d b ON a.u = b.u AND a.cell < b.cell "
        "GROUP BY 1, 2 HAVING COUNT(*) >= 4), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM "
        "(SELECT ca AS c FROM e2 UNION SELECT cb FROM e2)), "
        "ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e2), "
        "tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
        "FROM e2 xy JOIN e2 xz ON xz.ca = xy.ca AND xz.cb > xy.cb "
        "JOIN e2 yz ON yz.ca = xy.cb AND yz.cb = xz.cb) "
        "SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tr"
    ),
    "cell_trend": _cell_trend_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "cell_slope": _cell_slope_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "home_cells": _home_cells_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "radius_gyration": _radius_of_gyration_sql(
        derive.points_sql("events", "event_id", "event_id"), TRACK_RES
    ),
    "jump_histogram": _jump_histogram_sql(
        derive.points_sql("events", "event_id", "event_id"), TRACK_RES
    ),
    "track_diameter": _track_diameter_sql(
        derive.points_sql("events", "event_id", "event_id"), TRACK_RES
    ),
    "segment_tiles": _segment_tiles_sql(
        derive.points_sql("events", "event_id", "event_id"),
        TILE_RES,
        TRACK_RES,
    ),
    "turn_histogram": _turn_histogram_sql(
        derive.points_sql("events", "event_id", "event_id"), TRACK_RES
    ),
    "snap_points": _snap_to_segments_sql(
        derive.points_sql("events", "event_id", "event_id"),
        p_cust,
        SNAP_R,
        SNAP_MAXMOVE,
        SNAP_RES,
    ),
    "track_hausdorff": _trajectory_hausdorff_sql(
        derive.points_sql("events", "event_id", "event_id"),
        TRACK_SIM_START_RES,
        TRACK_SIM_RES,
    ),
    "heading_histogram": _heading_histogram_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "cell_hours": _cell_hours_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "speed_outliers": _speed_outliers_sql(
        derive.points_sql("events", "event_id", "event_id"), SPEED_KMH_T
    ),
}
