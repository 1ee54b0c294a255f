"""events query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    TILE_RES,
    derive,
    tiling,
    windows,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _cohort_retention_sql,
    _interarrival_hist_sql,
    _late_events_sql,
    _order_running_totals_sql,
    _record_events_sql,
    _rolling_wau_sql,
    _session_type_pairs_sql,
    _type_colocation_sql,
    _user_first_last_sql,
    _user_journeys_sql,
    _value_peaks_sql,
    distinct_users_sql,
    events_band_join_sql,
    events_enriched_sql,
    events_hopping_sql,
    events_session_sql,
    events_sessionized_sql,
    events_window_sql,
    funnel_counts_sql,
    props_extract_sql,
    session_join_sql,
    top_events_sql,
    user_features_sql,
)



def q_events_window(sf):
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return windows.tumbling_window_agg(ev)



def q_events_hopping(sf):
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return windows.hopping_window_agg(ev, window_hours=2, hop_hours=1)



def q_events_session(sf):
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["ts", "event_type", "user_id", "value"]
    )
    return windows.session_window_agg(ev, gap_minutes=30)



def q_events_sessionized(sf):
    # per-event session labeling (the assignment step the session
    # aggregate is built on) — windowed-join surface over the stream
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["ts", "event_type", "user_id", "event_id"],
    )
    return windows.sessionize_events(ev, gap_minutes=30)



def q_user_features(sf):
    # per-user ML feature vector (counts, per-type counts, first/last
    # seen, integer value sum) — map-side combine, one tiny shuffle
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return windows.user_activity_features(ev)



def q_top_events(sf):
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return windows.top_events_per_type(ev, k=10)



def q_distinct_users(sf):
    import ray
    from python_prtree_ray.pipelines.sketch import distinct_users

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "user_id"]
    )
    return distinct_users(ev)



def q_distinct_users_hll(sf):
    import ray
    from python_prtree_ray.pipelines.sketch import distinct_users_hll

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "user_id"]
    )
    return distinct_users_hll(ev)



def q_events_enriched(sf):
    import ray
    import pyarrow.parquet as pq
    from python_prtree_ray.pipelines.lookup import broadcast_lookup

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )
    cust = pq.read_table(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    return broadcast_lookup(
        ev, cust, on="user_id", small_on="c_custkey",
        carry_cols=("c_nationkey", "c_mktsegment"),
    )



def q_props_extract(sf):
    import ray
    from python_prtree_ray.pipelines.text import extract_json_int

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "props"]
    )
    return extract_json_int(ev, "props", "k")



def q_events_band_join(sf):
    # windowed 1:N join: every view in the hour BEFORE each purchase
    # by the same user (the band sibling of the asof join)
    import ray
    import pyarrow.compute as _pc
    from python_prtree_ray.pipelines.asof import band_join

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type", "user_id", "ts"]
    )

    def side(kind, idname):
        def f(t):
            import pyarrow as pa
            m = _pc.equal(t.column("event_type"), kind)
            t = t.filter(m)
            return pa.table({idname: t.column("event_id"), "user_id": t.column("user_id"), "ts": t.column("ts")})
        return f

    left = ev.map_batches(side("purchase", "l_id"), batch_format="pyarrow", zero_copy_batch=True)
    right = ev.map_batches(side("view", "r_id"), batch_format="pyarrow", zero_copy_batch=True)
    return band_join(left, right)



def q_session_join(sf):
    # session-scoped stream-stream join: (purchase, view) pairs in
    # the SAME gap-session of the same user — any event type keeps
    # the session alive (one user-bucket shuffle, vectorized pairing)
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return windows.session_join(ev, "purchase", "view", gap_minutes=30)



def q_funnel_counts(sf):
    # ordered-funnel user counts (signup -> click -> purchase by
    # strict first-occurrence time): per-batch min combine, one
    # user-keyed min-reduce, tiny count fold
    import ray
    from python_prtree_ray.pipelines.agg import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_counts(ev)



def q_session_duration_quantiles(sf):
    # session-length distribution: exact R-7 quantiles of per-user
    # session durations (30-min gap sessionization, µs)
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.quantiles import int_quantiles

    GAP = 1_800_000_000
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": bucket_of(u, 256),
                "u": u,
                "t": pc.cast(
                    tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
                ),
                "seq": tbl.column("event_id"),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "dur_us": pa.array([], pa.int64()),
                }
            )
        t = group.column("t").to_numpy(zero_copy_only=False)
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, t, u))
        u_s, t_s = u[order], t[order]
        new = np.r_[True, (u_s[1:] != u_s[:-1]) | (t_s[1:] - t_s[:-1] > GAP)][: u_s.size]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], u_s.size] - 1
        dur = t_s[ends] - t_s[starts]
        return pa.table(
            {"k": np.zeros(dur.size, np.int64), "dur_us": dur}
        )

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return int_quantiles(folded, key_col="k", int_col="dur_us")



def q_weekly_anomaly(sf):
    # anomaly z-scores of the weekly revenue series: exact integer
    # moments over the week-sized series, z = (n·x − S)/√(n·Q − S²)
    # as ONE shared double expression (correctly-rounded sqrt)
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.windows import WEEK_US

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        us = (
            tbl.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        week = us // WEEK_US
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(week, kind="stable")
        w_s, c_s = week[order], cents[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]][: w_s.size])
        return pa.table(
            {
                "week": w_s[starts],
                "revenue_cents": np.add.reduceat(c_s, starts),
            }
        )

    rows = bucketed_sum(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="week",
        value_cols=("revenue_cents",),
    ).take_all()  # week-sized series
    weeks = np.array([r["week"] for r in rows], np.int64)
    x = np.array([r["revenue_cents"] for r in rows], np.int64).astype(object)
    n = x.size
    S = int(x.sum())
    Q = int((x * x).sum())
    var = n * Q - S * S
    z = np.array(
        [
            float(n * int(v) - S) / np.sqrt(np.float64(float(var)))
            if var > 0
            else 0.0
            for v in x
        ],
        np.float64,
    )
    order = np.argsort(weeks)
    return ray.data.from_arrow(
        pa.table(
            {
                "week": weeks[order],
                "revenue_cents": np.array(
                    [int(v) for v in x], np.int64
                )[order],
                "z": z[order],
            }
        )
    )



def q_weekday_skew_users(sf):
    # HAVING-threshold cohort: users whose weekend share is strictly
    # below 1/5 — exact integer cross-multiplication (5·wknd < total),
    # (weekday, weekend) count partials, one sum, filter
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )
    DAY = 86_400_000_000

    def partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        dow = (us // DAY + 4) % 7  # 0=Sun .. 6=Sat
        wknd = (dow == 0) | (dow == 6)
        order = np.argsort(u, kind="stable")
        u_s, w_s = u[order], wknd[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        n = np.diff(np.r_[starts, u_s.size]).astype(np.int64)
        n_wk = np.add.reduceat(w_s.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": u_s[starts],
                "n_weekday": n - n_wk,
                "n_weekend": n_wk,
            }
        )

    summed = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        value_cols=("n_weekday", "n_weekend"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        wd = tbl.column("n_weekday").to_numpy(zero_copy_only=False)
        we = tbl.column("n_weekend").to_numpy(zero_copy_only=False)
        keep = we * 5 < wd + we  # weekend share < 1/5, no division
        return tbl.filter(pa.array(keep))

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_activity_heatmap(sf):
    # day-of-week x hour-of-day seasonality matrix: exact integer
    # epoch arithmetic both sides (no locale-dependent date parts)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["ts"])
    DAY = 86_400_000_000

    def partial(tbl: pa.Table) -> pa.Table:
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        dow = (us // DAY + 4) % 7  # 1970-01-01 was a Thursday
        hour = (us % DAY) // 3_600_000_000
        key, n = np.unique(dow * 24 + hour, return_counts=True)
        return pa.table({"key": key, "n_events": n.astype(np.int64)})

    summed = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="key",
        value_cols=("n_events",),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dow": key // 24,
                "hour": key % 24,
                "n_events": tbl.column("n_events"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)



def q_incremental_agg(sf):
    # incremental-view maintenance: per-user (n_events, value_cents)
    # maintained from a CHECKPOINTED partial-aggregate parquet plus a
    # delta stream — base rows are never rescanned on the update
    # path; partial sums are associative, so checkpoint ∪ delta
    # partials re-folded equals the full recompute (the SQL oracle
    # scans everything — equality proves the incremental plan)
    import os
    import shutil
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def split_partial(keep_delta: bool):
        def partial(tbl: pa.Table) -> pa.Table:
            eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
            m = (eid % 5 == 0) == keep_delta
            u = tbl.column("user_id").to_numpy(zero_copy_only=False)[m]
            cents = np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False)[m] * 100.0
            ).astype(np.int64)
            order = np.argsort(u, kind="stable")
            u_s, c_s = u[order], cents[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
            return pa.table(
                {
                    "user_id": u_s[starts],
                    "n_events": np.diff(np.r_[starts, u_s.size]).astype(
                        np.int64
                    ),
                    "value_cents": np.add.reduceat(c_s, starts)
                    if u_s.size
                    else np.zeros(0, np.int64),
                }
            )

        return partial

    base_dir = f"/tmp/graft_incr_agg_{os.path.basename(sf.rstrip('/'))}"
    shutil.rmtree(base_dir, ignore_errors=True)
    base_agg = bucketed_sum(
        ev.map_batches(
            split_partial(False), batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="user_id",
        value_cols=("n_events", "value_cents"),
    )
    base_agg.write_parquet(base_dir)  # the maintained view's checkpoint

    delta = ev.map_batches(
        split_partial(True), batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed_sum(
        ray.data.read_parquet(base_dir).union(delta),
        key_col="user_id",
        value_cols=("n_events", "value_cents"),
    )



def q_convert_delay_quantiles(sf):
    # funnel latency: exact quantiles of (first purchase − first
    # view) per user, users with both events; one user-bucket fold
    # then the distinct-value histogram quantile machinery
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.quantiles import int_quantiles

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        keep = pc.is_in(
            tbl.column("event_type"),
            value_set=pa.array(["view", "purchase"]),
        )
        t = tbl.filter(keep)
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(
            t.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        is_p = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        )
        # batch-local min per (user, kind)
        kind = is_p.astype(np.int64)
        order = np.lexsort((us, kind, u))
        u_s, k_s, t_s = u[order], kind[order], us[order]
        first = np.r_[True, (u_s[1:] != u_s[:-1]) | (k_s[1:] != k_s[:-1])][: u_s.size]
        return pa.table(
            {
                "bucket": bucket_of(u_s[first], 256),
                "u": u_s[first],
                "kind": k_s[first],
                "t": t_s[first],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "delay_s": pa.array([], pa.int64())}
            )
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, kind, u))
        u_s, k_s, t_s = u[order], kind[order], t[order]
        first = np.r_[True, (u_s[1:] != u_s[:-1]) | (k_s[1:] != k_s[:-1])][: u_s.size]
        u_f, k_f, t_f = u_s[first], k_s[first], t_s[first]
        # users with BOTH kinds appear as consecutive (view, purchase)
        both = (u_f[:-1] == u_f[1:]) & (k_f[:-1] == 0) & (k_f[1:] == 1)
        # keep µs: a seconds division would FLOOR in numpy but
        # TRUNCATE in DuckDB on the negative delays
        delay = t_f[1:][both] - t_f[:-1][both]
        return pa.table(
            {
                "k": np.zeros(delay.size, np.int64),
                "delay_us": delay,
            }
        )

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return int_quantiles(folded, key_col="k", int_col="delay_us")



def q_activity_autocorr(sf):
    # lag-24h autocorrelation of the hourly event-count series
    # (zeros filled over the full hour span): exact integer moments,
    # one double expression — SQRT is correctly rounded IEEE, so
    # num / SQRT(vx·vy) matches the SQL twin bitwise
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["ts"])
    HOUR = 3_600_000_000
    LAG = 24

    def partial(tbl: pa.Table) -> pa.Table:
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        h, n = np.unique(us // HOUR, return_counts=True)
        return pa.table({"hour": h, "n": n.astype(np.int64)})

    hist = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="hour",
        value_cols=("n",),
    ).take_all()  # hour-span-sized metadata
    hours = np.array([r["hour"] for r in hist], np.int64)
    cnts = np.array([r["n"] for r in hist], np.int64)
    lo, hi = int(hours.min()), int(hours.max())
    series = np.zeros(hi - lo + 1, np.int64)
    series[hours - lo] = cnts
    x = series[:-LAG].astype(object)
    y = series[LAG:].astype(object)
    n = x.shape[0]
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = (
        float(num) / np.sqrt(np.float64(float(vx)) * np.float64(float(vy)))
        if vx > 0 and vy > 0
        else None
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_pairs": pa.array([n], pa.int64()),
                "num": pa.array([float(num)], pa.float64()),
                "var_x": pa.array([float(vx)], pa.float64()),
                "var_y": pa.array([float(vy)], pa.float64()),
                "r": pa.array([r], pa.float64()),
            }
        )
    )



def q_rolling_wau(sf):
    # exact 7-day rolling distinct users: per-user coverage-interval
    # expansion (a sliding COUNT DISTINCT has no per-day partial)
    from python_prtree_ray.pipelines.windows import rolling_wau
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )
    return rolling_wau(ev)



def q_daily_new_returning(sf):
    # per-day acquisition split: users on their FIRST-ever active
    # day vs returning — one-bucket-per-user fold (first day + all
    # active days), tiny day-keyed sum
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.windows import DAY_US

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        order = np.lexsort((day, u))
        u_s, d_s = u[order], day[order]
        keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])][: u_s.size]
        return pa.table(
            {
                "bucket": bucket_of(u_s[keep], 256),
                "u": u_s[keep],
                "day": d_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "n_new": pa.array([], pa.int64()),
                    "n_returning": pa.array([], pa.int64()),
                }
            )
        day = group.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u_s, d_s = u[order], day[order]
        keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])][: u_s.size]
        u_u, d_u = u_s[keep], d_s[keep]
        is_first = np.r_[True, u_u[1:] != u_u[:-1]][: u_u.size]
        dd, inv = np.unique(d_u, return_inverse=True)
        n_new = np.bincount(inv, weights=is_first, minlength=dd.size).astype(
            np.int64
        )
        n_tot = np.bincount(inv, minlength=dd.size).astype(np.int64)
        return pa.table(
            {"day": dd, "n_new": n_new, "n_returning": n_tot - n_new}
        )

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return bucketed_sum(
        folded, key_col="day", value_cols=("n_new", "n_returning")
    )



def q_event_age_hist(sf):
    # user-anchored enrichment: every event binned by log2(days
    # since the user's FIRST signup event); events and their anchor
    # co-locate in ONE user bucket, so no join ships raw rows
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.windows import DAY_US

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        is_signup = pc.equal(tbl.column("event_type"), "signup").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "bucket": bucket_of(u, 256),
                "u": u,
                "t": us,
                "sgn": is_signup,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return empty
        t = group.column("t").to_numpy(zero_copy_only=False)
        sgn = group.column("sgn").to_numpy(zero_copy_only=False)
        # per-user min signup ts
        order = np.argsort(u, kind="stable")
        u_s, t_s, g_s = u[order], t[order], sgn[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        sizes = np.diff(np.r_[starts, u_s.size])
        t_anchor = np.where(g_s, t_s, np.iinfo(np.int64).max)
        anchor = np.repeat(
            np.minimum.reduceat(t_anchor, starts), sizes
        )
        has = anchor != np.iinfo(np.int64).max
        age_days = (t_s[has] - anchor[has]) // DAY_US
        pos = age_days >= 0  # pre-signup events excluded both sides
        d = age_days[pos]
        bins = np.where(
            d > 0, np.frexp(d.astype(np.float64))[1] - 1, np.int64(-1)
        ).astype(np.int64)
        bb, n = np.unique(bins, return_counts=True)
        return pa.table({"bin": bb, "n": n.astype(np.int64)})

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return bucketed_sum(folded, key_col="bin", value_cols=("n",))



def q_active_span_quantiles(sf):
    # user lifetime distribution: exact quantiles of (last − first
    # active day) per user; one user-bucket fold, tiny histogram
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.quantiles import int_quantiles
    from python_prtree_ray.pipelines.windows import DAY_US

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        order = np.argsort(u, kind="stable")
        u_s, d_s = u[order], day[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        return pa.table(
            {
                "bucket": bucket_of(u_s[starts], 256),
                "u": u_s[starts],
                "lo": np.minimum.reduceat(d_s, starts),
                "hi": np.maximum.reduceat(d_s, starts),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "span_days": pa.array([], pa.int64())}
            )
        lo = group.column("lo").to_numpy(zero_copy_only=False)
        hi = group.column("hi").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u_s = u[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        span = np.maximum.reduceat(hi[order], starts) - np.minimum.reduceat(
            lo[order], starts
        )
        return pa.table(
            {"k": np.zeros(span.size, np.int64), "span_days": span}
        )

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return int_quantiles(folded, key_col="k", int_col="span_days")



def q_activity_decile_purchase(sf):
    # rank-cohort conversion: users ranked by total activity into
    # exact integer deciles ((rn−1)·10 // n — no NTILE ambiguity),
    # purchase share per decile; user-sized driver rank
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        is_p = pc.equal(tbl.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(u, kind="stable")
        u_s, p_s = u[order], is_p[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        return pa.table(
            {
                "user_id": u_s[starts],
                "n_events": np.diff(np.r_[starts, u_s.size]).astype(np.int64),
                "n_purchases": np.add.reduceat(
                    p_s.astype(np.int64), starts
                ),
            }
        )

    sums = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        value_cols=("n_events", "n_purchases"),
    ).take_all()  # user-sized metadata (the rank-statistic bound)
    uid = np.array([r["user_id"] for r in sums], np.int64)
    ne = np.array([r["n_events"] for r in sums], np.int64)
    npu = np.array([r["n_purchases"] for r in sums], np.int64)
    order = np.lexsort((uid, ne))
    ne, npu = ne[order], npu[order]
    n = ne.size
    decile = (np.arange(n, dtype=np.int64) * 10) // n  # (rn-1)*10 // n
    dd, inv = np.unique(decile, return_inverse=True)
    n_users = np.bincount(inv, minlength=dd.size).astype(np.int64)
    n_ev = np.bincount(inv, weights=ne, minlength=dd.size).astype(np.int64)
    n_pu = np.bincount(inv, weights=npu, minlength=dd.size).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "decile": dd,
                "n_users": n_users,
                "n_events": n_ev,
                "n_purchases": n_pu,
                "purchase_share": n_pu.astype(np.float64)
                / n_ev.astype(np.float64),
            }
        )
    )



def q_interarrival_hist(sf):
    # burstiness profile: log2-binned same-user event gaps (µs);
    # pair fold + tiny sum, <=64 rows at any scale
    import ray
    from python_prtree_ray.pipelines.movement import interarrival_hist

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return interarrival_hist(ev)



def q_events_user_topk(sf):
    # per-KEY top-k (top-3 events per user by integer value):
    # map-side per-key prune inside each batch, one coarse key-hash
    # shuffle of at most k rows per (batch, key)
    import ray

    from python_prtree_ray.pipelines.merge import grouped_topk

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def cents(tbl):
        import numpy as np
        import pyarrow as pa

        v = tbl.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "event_id": tbl.column("event_id"),
                "value_cents": np.floor(v * 100.0).astype(np.int64),
            }
        )

    return grouped_topk(
        ev.map_batches(
            cents,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        k=3,
        key_col="user_id",
        id_col="event_id",
        value_col="value_cents",
    )



def q_events_dedup(sf):
    # streaming-style dedup: first event per (user, type, 10-min
    # tumbling window) — map-side group collapse, one user-hash shuffle
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return windows.event_dedup_window(ev, minutes=10)



def q_events_rolling(sf):
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    )
    return windows.rolling_window_sum(ev, window_minutes=30)



def q_events_enriched_left(sf):
    # LEFT broadcast lookup: unmatched facts kept with NULL carries
    # (filled to -1 so the float-NaN-free oracle compare is exact)
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )
    sup = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    out = broadcast_lookup(
        ev, sup, on="user_id", small_on="s_suppkey",
        carry_cols=("s_nationkey",), how="left",
    )

    def fill(tbl: pa.Table) -> pa.Table:
        col = _pc.cast(
            _pc.fill_null(tbl.column("s_nationkey"), -1), pa.int64()
        )
        return tbl.set_column(
            tbl.schema.get_field_index("s_nationkey"), "s_nationkey", col
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)



def q_events_unmatched(sf):
    # anti-join: facts whose user has NO supplier row (NOT EXISTS)
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id"]
    )
    sup = pq.read_table(f"{sf}/supplier.parquet", columns=["s_suppkey"])
    return broadcast_lookup(
        ev, sup, on="user_id", small_on="s_suppkey", how="anti"
    )



def q_user_max_drawdown(sf):
    # account-balance risk profile: per-user maximum drawdown of the
    # signed cumulative flow (purchase/signup credit, everything
    # else debit, exact cents). ONE user-bucket shuffle of
    # fixed-width ints; the fold is a segmented prefix sum + a
    # segmented Hillis–Steele prefix max (no per-user Python)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        credit = (et == "purchase") | (et == "signup")
        return pa.table(
            {
                "bucket": bucket_of(u, 256),
                "u": u,
                "t": pc.cast(
                    tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
                ),
                "seq": tbl.column("event_id"),
                "d": np.where(credit, cents, -cents),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "max_drawdown_cents": pa.array([], pa.int64()),
                }
            )
        t = group.column("t").to_numpy(zero_copy_only=False)
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        d = group.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, t, u))
        u_s, d_s = u[order], d[order]
        n = u_s.size
        cumg = np.cumsum(d_s)
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        lens = np.diff(np.r_[starts, n])
        base = np.repeat(np.r_[0, cumg[starts[1:] - 1]], lens)
        cum = cumg - base
        # segmented inclusive prefix max (Hillis–Steele doubling)
        run = cum.copy()
        step = 1
        lo = np.iinfo(np.int64).min
        while step < n:
            valid = u_s[step:] == u_s[:-step]
            np.maximum(
                run[step:],
                np.where(valid, run[:-step], lo),
                out=run[step:],
            )
            step *= 2
        dd = run - cum
        return pa.table(
            {
                "user_id": u_s[starts],
                "max_drawdown_cents": np.maximum.reduceat(dd, starts),
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )



def q_type_run_hist(sf):
    # burst structure: histogram of run LENGTHS of consecutive
    # same-type events per user (the distributional sibling of
    # max_dwell_run's per-user max) — islands fold, tiny sum
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": bucket_of(u, 256),
                "u": u,
                "t": pc.cast(
                    tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
                ),
                "seq": tbl.column("event_id"),
                "cls": tbl.column("event_type"),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "run_len": pa.array([], pa.int64()),
                    "n_runs": pa.array([], pa.int64()),
                }
            )
        t = group.column("t").to_numpy(zero_copy_only=False)
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        cls = group.column("cls").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, t, u))
        u_s, c_s = u[order], cls[order]
        new = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])][: u_s.size]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, u_s.size]).astype(np.int64)
        ll, n = np.unique(lens, return_counts=True)
        return pa.table({"run_len": ll, "n_runs": n.astype(np.int64)})

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return bucketed_sum(folded, key_col="run_len", value_cols=("n_runs",))



def q_record_events(sf):
    # per-user record-breaking events (running max, segmented
    # doubling scan — no per-entity Python); record-sized output
    from python_prtree_ray.pipelines.windows import record_events
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return record_events(ev)



def q_late_events(sf):
    # watermark diagnostic: per-user late-arrival counts + max
    # lateness under a hash-jittered arrival order (segmented
    # doubling prefix-max, ONE user-bucket shuffle)
    from python_prtree_ray.pipelines.windows import late_events
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return late_events(ev)



def q_user_journeys(sf):
    # path mining: each user's first-4 event-type sequence, counted
    # across users — types recode to ints against a metadata
    # vocabulary, ONE user-bucket shuffle, base-B digit pack
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.pipelines.windows import user_journeys

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def tstage(tbl: pa.Table) -> pa.Table:
        return pa.table({"t": _pc.unique(tbl.column("event_type"))})

    types = sorted(
        {
            r["t"]
            for r in ev.map_batches(
                tstage, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        }
    )
    return user_journeys(ev, types, k=4)



def q_order_running_totals(sf):
    # per-customer running order totals (billing-balance
    # transform): ONE custkey-bucket shuffle, exact segmented
    # cumsum (global cumsum + per-segment rebase), input-sized out
    from python_prtree_ray.pipelines.windows import running_totals
    import ray

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return running_totals(
        od,
        key_col="o_custkey",
        order_cols=("o_orderdate", "o_orderkey"),
        value_col="o_totalprice",
    )



def q_attribution_last_touch(sf):
    # marketing attribution: each purchase joined to the user's most
    # recent PRIOR view — ONE user-bucket shuffle, segmented
    # forward-fill via global maximum.accumulate (global positions
    # are monotone, so cross-segment carryover self-invalidates)
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def prep(tbl: pa.Table) -> pa.Table:
        et = tbl.column("event_type")
        is_v = _pc.equal(et, "view").to_numpy(zero_copy_only=False)
        is_p = _pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        m = is_v | is_p
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "bucket": bucket_of(u.astype(np.int64), 256),
                "u": u,
                "seq": tbl.column("event_id").to_numpy(
                    zero_copy_only=False
                )[m],
                "tus": tbl.column("ts")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)[m],
                "is_view": is_v[m],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "purchase_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "view_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if u.size == 0:
            return empty
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        tus = group.column("tus").to_numpy(zero_copy_only=False)
        isv = group.column("is_view").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, tus, u))
        u_s, seq_s, t_s, v_s = u[order], seq[order], tus[order], isv[order]
        n = u_s.shape[0]
        pos = np.arange(n, dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        marker = np.where(v_s, pos, np.int64(-1))
        ff = np.maximum.accumulate(marker)
        prev_ff = np.r_[np.int64(-1), ff[:-1]]
        ok = (~v_s) & (prev_ff >= seg_start)
        if not ok.any():
            return empty
        vp = prev_ff[ok]
        return pa.table(
            {
                "purchase_id": seq_s[ok],
                "user_id": u_s[ok],
                "view_id": seq_s[vp],
                "gap_us": t_s[ok] - t_s[vp],
            }
        )

    keyed = ev.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    return keyed.groupby("bucket").map_groups(
        fold, batch_format="pyarrow"
    )



def q_session_type_pairs(sf):
    # market-basket over sessions: unordered type pairs co-occurring
    # in a 30-min-gap user session, exact session-distinct counts
    from python_prtree_ray.pipelines.windows import session_type_pairs
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return session_type_pairs(ev)



def q_value_peaks(sf):
    # local-maximum screen: events equal to their entity's ±1h
    # window max — segmented sparse-table range max, RANGE-frame twin
    from python_prtree_ray.pipelines.windows import value_peaks
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return value_peaks(ev)



def q_user_gini(sf):
    # value-concentration Gini over per-user spend: exact rank-
    # weighted integer form (tile_gini's formula over user sums;
    # user-sized driver sort — the rank-statistic bound)
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "value"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(u, kind="stable")
        u_s, c_s = u[order], cents[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        return pa.table(
            {
                "user_id": u_s[starts],
                "x": np.add.reduceat(c_s, starts)
                if u_s.size
                else np.zeros(0, np.int64),
            }
        )

    sums = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        value_cols=("x",),
    )
    xs = []
    for ref in sums.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            xs.append(t.column("x").to_numpy(zero_copy_only=False))
    if not xs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_users": pa.array([0], pa.int64()),
                    "total_cents": pa.array([0], pa.int64()),
                    "gini": pa.nulls(1, pa.float64()),
                }
            )
        )
    x = np.sort(np.concatenate(xs)).astype(object)
    n = x.size
    s = int(x.sum())
    coef = 2 * np.arange(n, dtype=object) - n + 1
    num = int((coef * x).sum())
    den = n * s
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n], pa.int64()),
                "total_cents": pa.array([s], pa.int64()),
                "gini": pa.array(
                    [float(num) / float(den) if den else None], pa.float64()
                ),
            }
        )
    )



def q_cohort_retention(sf):
    # first-active-week cohort x week-offset retention triangle:
    # exact distinct-user counts via the one-bucket-per-user fold
    from python_prtree_ray.pipelines.windows import cohort_retention
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )
    return cohort_retention(ev)



def q_type_dow_chi2(sf):
    # chi-square independence screen (event_type x day-of-week):
    # per-cell observed/expected/contribution rows — integer margins,
    # per-cell divisions in a FIXED order (no float sum emitted, so
    # nothing order-dependent); zero-observed cells omitted both sides
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "ts"]
    )
    DAY = 86_400_000_000

    def partial(tbl: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        dow = (us // DAY + 4) % 7
        order = np.lexsort((dow, code))
        c_s, d_s = code[order], dow[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])][: c_s.size]
        )
        return pa.table(
            {
                "k": np.zeros(starts.size, np.int64),
                "cls": enc.dictionary.take(pa.array(c_s[starts])),
                "dow": d_s[starts],
                "n": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        cls = group.column("cls").to_numpy(zero_copy_only=False)
        if cls.size == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "dow": pa.array([], pa.int64()),
                    "observed": pa.array([], pa.int64()),
                    "expected": pa.array([], pa.float64()),
                    "contrib": pa.array([], pa.float64()),
                }
            )
        dow = group.column("dow").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((dow, cls))
        c_s, d_s, n_s = cls[order], dow[order], n[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])][: c_s.size]
        )
        o = np.add.reduceat(n_s, starts)
        cu, du = c_s[starts], d_s[starts]
        N = np.int64(o.sum())
        # margins via per-key sums over the metadata-sized matrix
        cls_keys, cls_inv = np.unique(cu, return_inverse=True)
        r = np.bincount(cls_inv, weights=o).astype(np.int64)[cls_inv]
        dow_keys, dow_inv = np.unique(du, return_inverse=True)
        cmarg = np.bincount(dow_inv, weights=o).astype(np.int64)[dow_inv]
        diff = (o * N - r * cmarg).astype(np.float64)
        contrib = (
            diff * diff / np.float64(N) / r.astype(np.float64)
            / cmarg.astype(np.float64)
        )
        expected = (r * cmarg).astype(np.float64) / np.float64(N)
        return pa.table(
            {
                "event_type": pa.array(cu, pa.string()),
                "dow": du,
                "observed": o,
                "expected": expected,
                "contrib": contrib,
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["event_type", "dow", "observed", "expected", "contrib"])
    )



def q_weekly_active(sf):
    # WAU curve: exact distinct users per epoch week via the
    # one-bucket-per-user dedup fold + one tiny week sum
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.windows import WEEK_US

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        week = us // WEEK_US
        order = np.lexsort((week, u))
        u_s, w_s = u[order], week[order]
        keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])][: u_s.size]
        return pa.table(
            {
                "bucket": bucket_of(u_s[keep], 256),
                "u": u_s[keep],
                "week": w_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if u.size == 0:
            return pa.table(
                {
                    "week": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        w = group.column("week").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u_s, w_s = u[order], w[order]
        keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])][: u_s.size]
        wk, n = np.unique(w_s[keep], return_counts=True)
        return pa.table({"week": wk, "n_users": n.astype(np.int64)})

    folded = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return bucketed_sum(folded, key_col="week", value_cols=("n_users",))



def q_type_colocation(sf):
    # cross-type tile co-location lift: exact distinct-tile counts
    # per type/pair, one division; C^2-bounded metadata folds
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "event_type"]
    )

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table(
            {"px": p["px"], "py": p["py"], "cls": tbl.column("event_type")}
        )

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.type_colocation(pts, res=TILE_RES)



def q_user_burstiness(sf):
    # inter-arrival burstiness B = (σ−μ)/(σ+μ) per user, from EXACT
    # integer gap moments (whole-second truncation, Σd and Σd² in
    # int64): ONE user-bucket shuffle of fixed-width ints, segmented
    # diff/reduceat fold, then B as a single fixed double expression
    # of the exact ints — bitwise-matching the SQL twin. Per-user
    # event counts are bounded (product-analytics contract), so the
    # int64 Σd² headroom (~10⁶ gaps × year²-seconds) always holds.
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.functions.buckets import bucket_of

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": bucket_of(u, 256),
                "u": u,
                "tsec": us // 1_000_000,
                "seq": tbl.column("event_id"),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "burstiness": pa.array([], pa.float64()),
            }
        )
        if u.size == 0:
            return empty
        t = group.column("tsec").to_numpy(zero_copy_only=False)
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, t, u))
        u_s, t_s = u[order], t[order]
        gap_ok = u_s[1:] == u_s[:-1]
        d = (t_s[1:] - t_s[:-1])[gap_ok]
        du = u_s[1:][gap_ok]
        if du.size == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, du[1:] != du[:-1]][: du.size])
        s1 = np.add.reduceat(d, starts)
        s2 = np.add.reduceat(d * d, starts)
        n = np.diff(np.r_[starts, du.size])
        keep = s1 > 0
        s1f = s1[keep].astype(np.float64)
        s2f = s2[keep].astype(np.float64)
        nf = n[keep].astype(np.float64)
        sig = np.sqrt(nf * s2f - s1f * s1f)
        return pa.table(
            {
                "user_id": pa.array(du[starts][keep], pa.int64()),
                "n_gaps": pa.array(n[keep], pa.int64()),
                "burstiness": pa.array(
                    (sig - s1f) / (sig + s1f), pa.float64()
                ),
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )



def q_daily_cusum(sf):
    # change-point screen: CUSUM of daily event counts against the
    # all-days mean, kept EXACT by scaling — cusum_scaled_k =
    # Σ_{i≤k} (nᵢ·K − T) over observed days in day order (K days,
    # T events) — pure int64, no float mean. Daily counts fold via
    # batch partials + ONE coarse-bucket shuffle; the day table is
    # metadata-sized at any corpus size, so the ordered prefix runs
    # on the driver.
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["ts"])

    def partial(tbl: pa.Table) -> pa.Table:
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        vals, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {"day": vals, "n": cnt.astype(np.int64)}
        )

    daily = bucketed_sum(
        ev.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="day",
        value_cols=("n",),
        n_buckets=64,
    ).take_all()
    day = np.array([r["day"] for r in daily], np.int64)
    n = np.array([r["n"] for r in daily], np.int64)
    order = np.argsort(day, kind="stable")
    day, n = day[order], n[order]
    kk, t = day.size, int(n.sum())
    cusum = np.cumsum(n * kk - t)
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "cusum_scaled": pa.array(cusum, pa.int64()),
            }
        )
    )



def q_user_first_last(sf):
    # FIRST_VALUE/LAST_VALUE window shape: each user's first and
    # last event (type + ts) and count — types shuffle as int codes,
    # one user-bucket shuffle (pipelines/movement.py)
    import ray
    from python_prtree_ray.pipelines.movement import user_first_last

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    return user_first_last(ev)



def q_events_pivot(sf):
    # long->wide pivot: event counts by type x day-of-week as ONE
    # wide row per type (dow_0..dow_6 columns) — per-batch packed
    # (type-code, dow) partials, driver-side pivot of the
    # metadata-sized fold (types x 7)
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        d = tbl.column("event_type").combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cats = d.dictionary.to_pylist()
        days = (
            tbl.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        dow = (days + 4) % 7  # 1970-01-01 is a Thursday; 0 = Sunday
        key = codes * 7 + dow
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=uk.size).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(
                    [cats[int(k) // 7] for k in uk], pa.string()
                ),
                "dow": uk % 7,
                "n": n,
            }
        )

    rows = ev.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    agg: dict[str, np.ndarray] = {}
    for r in rows:
        agg.setdefault(r["event_type"], np.zeros(7, np.int64))[
            int(r["dow"])
        ] += int(r["n"])
    types = sorted(agg)
    cols: dict[str, Any] = {
        "event_type": pa.array(types, pa.string())
    }
    for d in range(7):
        cols[f"dow_{d}"] = pa.array(
            [int(agg[t][d]) for t in types], pa.int64()
        )
    return ray.data.from_arrow(pa.table(cols))


def q_next_event(sf):
    # conversion attribution: the FIRST purchase after each view within
    # 24h per user — forward-first windowed as-of (the 1:1 complement
    # of events_band_join's pair fan-out); one user-bucket shuffle
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.pipelines.asof import next_event_join

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "event_type", "user_id", "ts"],
    )

    def side(kind, idname):
        def f(t):
            t = t.filter(_pc.equal(t.column("event_type"), kind))
            return pa.table(
                {
                    idname: t.column("event_id"),
                    "user_id": t.column("user_id"),
                    "ts": t.column("ts"),
                }
            )

        return f

    left = ev.map_batches(
        side("view", "l_id"), batch_format="pyarrow", zero_copy_batch=True
    )
    right = ev.map_batches(
        side("purchase", "r_id"), batch_format="pyarrow", zero_copy_batch=True
    )
    return next_event_join(left, right, window_us=86_400_000_000)


QUERIES = {
    "next_event": q_next_event,
    "events_window": q_events_window,
    "events_hopping": q_events_hopping,
    "events_session": q_events_session,
    "events_sessionized": q_events_sessionized,
    "user_features": q_user_features,
    "top_events": q_top_events,
    "distinct_users": q_distinct_users,
    "distinct_users_hll": q_distinct_users_hll,
    "events_enriched": q_events_enriched,
    "props_extract": q_props_extract,
    "events_band_join": q_events_band_join,
    "session_join": q_session_join,
    "funnel_counts": q_funnel_counts,
    "session_duration_quantiles": q_session_duration_quantiles,
    "weekly_anomaly": q_weekly_anomaly,
    "weekday_skew_users": q_weekday_skew_users,
    "activity_heatmap": q_activity_heatmap,
    "incremental_agg": q_incremental_agg,
    "convert_delay_quantiles": q_convert_delay_quantiles,
    "activity_autocorr": q_activity_autocorr,
    "rolling_wau": q_rolling_wau,
    "daily_new_returning": q_daily_new_returning,
    "event_age_hist": q_event_age_hist,
    "active_span_quantiles": q_active_span_quantiles,
    "activity_decile_purchase": q_activity_decile_purchase,
    "interarrival_hist": q_interarrival_hist,
    "events_user_topk": q_events_user_topk,
    "events_dedup": q_events_dedup,
    "events_rolling": q_events_rolling,
    "events_enriched_left": q_events_enriched_left,
    "events_unmatched": q_events_unmatched,
    "user_max_drawdown": q_user_max_drawdown,
    "type_run_hist": q_type_run_hist,
    "record_events": q_record_events,
    "late_events": q_late_events,
    "user_journeys": q_user_journeys,
    "order_running_totals": q_order_running_totals,
    "attribution_last_touch": q_attribution_last_touch,
    "session_type_pairs": q_session_type_pairs,
    "value_peaks": q_value_peaks,
    "user_gini": q_user_gini,
    "cohort_retention": q_cohort_retention,
    "type_dow_chi2": q_type_dow_chi2,
    "weekly_active": q_weekly_active,
    "type_colocation": q_type_colocation,
    "user_burstiness": q_user_burstiness,
    "daily_cusum": q_daily_cusum,
    "user_first_last": q_user_first_last,
    "events_pivot": q_events_pivot,
}

SQL = {
    "next_event": """
WITH l AS (SELECT event_id AS l_id, user_id, ts FROM events
           WHERE event_type = 'view'),
r0 AS (SELECT user_id, ts, MIN(event_id) AS r_id FROM events
       WHERE event_type = 'purchase' GROUP BY user_id, ts),
c AS (SELECT l.l_id, l.user_id AS key, l.ts AS l_ts, r0.r_id, r0.ts AS r_ts,
             ROW_NUMBER() OVER (PARTITION BY l.l_id
                                ORDER BY r0.ts, r0.r_id) AS rn
      FROM l JOIN r0 ON r0.user_id = l.user_id AND r0.ts > l.ts
        AND r0.ts <= l.ts + INTERVAL 24 HOUR)
SELECT l_id, key, l_ts, r_id, r_ts,
       CAST(date_diff('microsecond', l_ts, r_ts) AS BIGINT) AS gap_us
FROM c WHERE rn = 1
""",
    "events_window": events_window_sql,
    "events_hopping": events_hopping_sql,
    "events_session": events_session_sql,
    "events_sessionized": events_sessionized_sql,
    "user_features": user_features_sql,
    "top_events": top_events_sql,
    "distinct_users": distinct_users_sql,
    "events_enriched": events_enriched_sql,
    "props_extract": props_extract_sql,
    "events_band_join": events_band_join_sql,
    "session_join": session_join_sql,
    "funnel_counts": funnel_counts_sql,
    "weekday_skew_users": (
        "WITH t AS (SELECT user_id, (epoch_us(ts) // 86400000000 + 4) % 7"
        " AS dow FROM events) "
        "SELECT user_id, CAST(SUM(CASE WHEN dow NOT IN (0, 6) THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_weekday, "
        "CAST(SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_weekend FROM t GROUP BY user_id "
        "HAVING SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) * 5 "
        "< COUNT(*)"
    ),
    "convert_delay_quantiles": (
        "WITH f AS (SELECT user_id, "
        "MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv, "
        "MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)"
        " AS tp FROM events GROUP BY user_id), "
        "d AS (SELECT CAST(0 AS BIGINT) AS k, tp - tv AS delay_us FROM f "
        "WHERE tv IS NOT NULL AND tp IS NOT NULL) "
        "SELECT k, quantile_cont(delay_us, 0.5) AS p50, "
        "quantile_cont(delay_us, 0.9) AS p90, "
        "quantile_cont(delay_us, 0.99) AS p99 FROM d GROUP BY k"
    ),
    "activity_autocorr": (
        "WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM h), "
        "g AS (SELECT unnest(generate_series(b.lo, b.hi)) AS hour FROM b), "
        "s AS (SELECT g.hour, CAST(COALESCE(h.n, 0) AS HUGEINT) AS n "
        "FROM g LEFT JOIN h ON h.hour = g.hour), "
        "p AS (SELECT s.n AS x, s2.n AS y FROM s JOIN s s2 "
        "ON s2.hour = s.hour + 24), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(x * y) AS HUGEINT) AS sxy, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(y * y) AS HUGEINT) AS syy FROM p) "
        "SELECT CAST(n AS BIGINT) AS n_pairs, "
        "CAST(n * sxy - sx * sy AS DOUBLE) AS num, "
        "CAST(n * sxx - sx * sx AS DOUBLE) AS var_x, "
        "CAST(n * syy - sy * sy AS DOUBLE) AS var_y, "
        "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN "
        "CAST(n * sxy - sx * sy AS DOUBLE) / "
        "SQRT(CAST(n * sxx - sx * sx AS DOUBLE) * "
        "CAST(n * syy - sy * sy AS DOUBLE)) ELSE NULL END AS r FROM m"
    ),
    "activity_heatmap": (
        "WITH t AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, "
        "(epoch_us(ts) % 86400000000) // 3600000000 AS hour FROM events) "
        "SELECT dow, hour, CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM t GROUP BY dow, hour"
    ),
    "incremental_agg": (
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) "
        "AS value_cents FROM events GROUP BY user_id"
    ),
    "interarrival_hist": _interarrival_hist_sql("events"),
    "session_duration_quantiles": (
        "WITH o AS (SELECT user_id, ts, event_id, "
        "CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY "
        "user_id ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END "
        "AS brk FROM events), "
        "s AS (SELECT user_id, epoch_us(ts) AS t, SUM(brk) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED "
        "PRECEDING) AS sid FROM o), "
        "d AS (SELECT CAST(0 AS BIGINT) AS k, MAX(t) - MIN(t) AS dur_us "
        "FROM s GROUP BY user_id, sid) "
        "SELECT k, quantile_cont(dur_us, 0.5) AS p50, "
        "quantile_cont(dur_us, 0.9) AS p90, "
        "quantile_cont(dur_us, 0.99) AS p99 FROM d GROUP BY k"
    ),
    "weekly_anomaly": (
        "WITH w AS (SELECT epoch_us(o_orderdate) // 604800000000 AS week, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        " AS x FROM orders GROUP BY 1), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS s, "
        "CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q FROM w) "
        "SELECT w.week, w.x AS revenue_cents, "
        "CASE WHEN m.n * m.q - m.s * m.s > 0 THEN "
        "CAST(m.n * w.x - m.s AS DOUBLE) / "
        "SQRT(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) ELSE 0.0 END AS z "
        "FROM w, m"
    ),
    "events_dedup": (
        "WITH t AS (SELECT user_id, event_type,"
        " time_bucket(INTERVAL 10 MINUTE, ts) AS window_start, ts, event_id"
        " FROM events),"
        " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id,"
        " event_type, window_start ORDER BY ts, event_id) AS rn FROM t)"
        " SELECT user_id, event_type, window_start, event_id"
        " FROM r WHERE rn = 1"
    ),
    "events_user_topk": (
        "WITH c AS (SELECT user_id, event_id, CAST(FLOOR(value * 100.0)"
        " AS BIGINT) AS value_cents FROM events),"
        " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id"
        " ORDER BY value_cents DESC, event_id) AS rank FROM c)"
        " SELECT user_id, event_id, value_cents, rank FROM r WHERE rank <= 3"
    ),
    "events_rolling": """
SELECT event_id, event_type,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER (
         PARTITION BY event_type ORDER BY ts
         RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
         AS BIGINT) AS roll_cents
FROM events
""",
    "events_enriched_left": (
        "SELECT e.event_id, e.user_id, "
        "CAST(COALESCE(s.s_nationkey, -1) AS BIGINT) AS s_nationkey "
        "FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey"
    ),
    "events_unmatched": (
        "SELECT event_id, user_id FROM events e WHERE NOT EXISTS "
        "(SELECT 1 FROM supplier s WHERE s.s_suppkey = e.user_id)"
    ),
    "record_events": _record_events_sql("events"),
    "late_events": _late_events_sql("events"),
    "user_journeys": _user_journeys_sql(4, "events"),
    "order_running_totals": _order_running_totals_sql("orders"),
    "attribution_last_touch": (
        "WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS tus, "
        "event_type FROM events "
        "WHERE event_type IN ('view', 'purchase')), "
        "w AS (SELECT user_id, event_id, tus, event_type, "
        "LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END "
        "IGNORE NULLS) OVER win AS view_id, "
        "LAST_VALUE(CASE WHEN event_type = 'view' THEN tus END "
        "IGNORE NULLS) OVER win AS view_tus "
        "FROM s WINDOW win AS (PARTITION BY user_id "
        "ORDER BY tus, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
        "SELECT event_id AS purchase_id, user_id, view_id, "
        "tus - view_tus AS gap_us "
        "FROM w WHERE event_type = 'purchase' AND view_id IS NOT NULL"
    ),
    "session_type_pairs": _session_type_pairs_sql("events"),
    "value_peaks": _value_peaks_sql("events"),
    "rolling_wau": _rolling_wau_sql("events"),
    "activity_decile_purchase": (
        "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ne, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS np FROM events GROUP BY user_id), "
        "r AS (SELECT ne, np, ROW_NUMBER() OVER (ORDER BY ne, user_id)"
        " AS rn FROM c), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c) "
        "SELECT (r.rn - 1) * 10 // t.n AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n_users, "
        "CAST(SUM(ne) AS BIGINT) AS n_events, "
        "CAST(SUM(np) AS BIGINT) AS n_purchases, "
        "CAST(SUM(np) AS DOUBLE) / CAST(SUM(ne) AS DOUBLE) "
        "AS purchase_share FROM r, t GROUP BY 1"
    ),
    "active_span_quantiles": (
        "WITH s AS (SELECT CAST(0 AS BIGINT) AS k, "
        "MAX(epoch_us(ts) // 86400000000) - "
        "MIN(epoch_us(ts) // 86400000000) AS span_days "
        "FROM events GROUP BY user_id) "
        "SELECT k, quantile_cont(span_days, 0.5) AS p50, "
        "quantile_cont(span_days, 0.9) AS p90, "
        "quantile_cont(span_days, 0.99) AS p99 FROM s GROUP BY k"
    ),
    "event_age_hist": (
        "WITH f AS (SELECT user_id, MIN(CASE WHEN event_type = 'signup'"
        " THEN epoch_us(ts) END) AS t0 FROM events GROUP BY user_id), "
        "a AS (SELECT (epoch_us(e.ts) - f.t0) // 86400000000 AS d "
        "FROM events e JOIN f ON e.user_id = f.user_id "
        "WHERE f.t0 IS NOT NULL AND epoch_us(e.ts) >= f.t0), "
        "b AS (SELECT CASE WHEN d = 0 THEN -1 "
        + " ".join(
            f"WHEN d < {1 << (k + 1)} THEN {k}" for k in range(15)
        )
        + " END AS bin FROM a) "
        "SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM b GROUP BY bin"
    ),
    "daily_new_returning": (
        "WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000"
        " AS day FROM events), "
        "f AS (SELECT user_id, MIN(day) AS fd FROM a GROUP BY user_id) "
        "SELECT a.day, CAST(SUM(CASE WHEN a.day = f.fd THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_new, "
        "CAST(SUM(CASE WHEN a.day = f.fd THEN 0 ELSE 1 END) AS BIGINT)"
        " AS n_returning "
        "FROM a JOIN f ON a.user_id = f.user_id GROUP BY a.day"
    ),
    "user_gini": (
        "WITH c AS (SELECT user_id, CAST(SUM(CAST(FLOOR(value * 100.0)"
        " AS BIGINT)) AS BIGINT) AS x FROM events GROUP BY user_id), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(COALESCE(SUM(x), 0) AS HUGEINT) AS s FROM c), "
        "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM c), "
        "g AS (SELECT CAST(COALESCE(SUM((2 * CAST(rn - 1 AS HUGEINT) - "
        "(SELECT n FROM m) + 1) * x), 0) AS HUGEINT) AS num FROM r) "
        "SELECT CAST(m.n AS BIGINT) AS n_users, "
        "CAST(m.s AS BIGINT) AS total_cents, "
        "CASE WHEN m.n * m.s > 0 THEN CAST(g.num AS DOUBLE) / "
        "CAST(m.n * m.s AS DOUBLE) ELSE NULL END AS gini FROM m, g"
    ),
    "cohort_retention": _cohort_retention_sql("events"),
    "type_colocation": _type_colocation_sql(
        "SELECT e.event_type AS cls, q.px, q.py FROM events e JOIN ("
        + derive.points_sql("events", "event_id", "event_id")
        + ") q ON e.event_id = q.event_id",
        TILE_RES,
    ),
    "type_dow_chi2": (
        "WITH t AS (SELECT event_type, (epoch_us(ts) // 86400000000 + 4)"
        " % 7 AS dow FROM events), "
        "o AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM t GROUP BY 1, 2), "
        "r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS r FROM o "
        "GROUP BY 1), "
        "c AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS c FROM o GROUP BY 1), "
        "g AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM o) "
        "SELECT o.event_type, o.dow, o.n AS observed, "
        "CAST(r.r * c.c AS DOUBLE) / CAST(g.N AS DOUBLE) AS expected, "
        "CAST(o.n * g.N - r.r * c.c AS DOUBLE) * "
        "CAST(o.n * g.N - r.r * c.c AS DOUBLE) / CAST(g.N AS DOUBLE) "
        "/ CAST(r.r AS DOUBLE) / CAST(c.c AS DOUBLE) AS contrib "
        "FROM o JOIN r USING (event_type) JOIN c USING (dow), g"
    ),
    "user_first_last": _user_first_last_sql(),
    "events_pivot": (
        "SELECT event_type, "
        + ", ".join(
            "CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) = "
            f"{d} THEN 1 ELSE 0 END) AS BIGINT) AS dow_{d}"
            for d in range(7)
        )
        + " FROM events GROUP BY event_type"
    ),
    "type_run_hist": (
        "WITH r AS (SELECT user_id, event_type, ts, event_id, "
        "CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type "
        "THEN 1 ELSE 0 END AS brk FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp FROM r), "
        "runs AS (SELECT CAST(COUNT(*) AS BIGINT) AS run_len FROM s "
        "GROUP BY user_id, grp) "
        "SELECT run_len, CAST(COUNT(*) AS BIGINT) AS n_runs "
        "FROM runs GROUP BY run_len"
    ),
    "user_max_drawdown": (
        "WITH d AS (SELECT user_id, ts, event_id, "
        "CASE WHEN event_type IN ('purchase', 'signup') "
        "THEN CAST(FLOOR(value * 100) AS BIGINT) "
        "ELSE -CAST(FLOOR(value * 100) AS BIGINT) END AS dc "
        "FROM events), "
        "p AS (SELECT user_id, ts, event_id, SUM(dc) OVER w AS cum "
        "FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING)), "
        "m AS (SELECT user_id, MAX(cum) OVER w - cum AS dd FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING)) "
        "SELECT user_id, CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents "
        "FROM m GROUP BY user_id"
    ),
    "weekly_active": (
        "WITH w AS (SELECT DISTINCT user_id, epoch_us(ts) // "
        "604800000000 AS week FROM events) "
        "SELECT week, CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM w GROUP BY week"
    ),
    "user_burstiness": (
        "WITH s AS (SELECT user_id, epoch_us(ts) // 1000000 AS tsec, "
        "event_id FROM events), "
        "d AS (SELECT user_id, tsec - LAG(tsec) OVER ("
        "PARTITION BY user_id ORDER BY tsec, event_id) AS d FROM s), "
        "m AS (SELECT user_id, CAST(COUNT(d) AS BIGINT) AS n_gaps, "
        "CAST(SUM(d) AS BIGINT) AS s1, CAST(SUM(d * d) AS BIGINT) AS s2 "
        "FROM d WHERE d IS NOT NULL GROUP BY user_id "
        "HAVING SUM(d) > 0) "
        "SELECT user_id, n_gaps, "
        "(SQRT(CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "- CAST(s1 AS DOUBLE)) / "
        "(SQRT(CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "+ CAST(s1 AS DOUBLE)) AS burstiness "
        "FROM m"
    ),
    "daily_cusum": (
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "k AS (SELECT COUNT(*) AS kk, SUM(n) AS t FROM c) "
        "SELECT day, n, CAST(SUM(n * k.kk - k.t) OVER ("
        "ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS cusum_scaled FROM c, k"
    ),
}
