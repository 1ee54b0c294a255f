"""stats query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    value_quantiles_sql,
)



def q_value_quantiles(sf):
    import ray
    from python_prtree_ray.pipelines.quantiles import value_quantiles

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    )
    return value_quantiles(ev)



def q_value_drift(sf):
    # distribution-shift screen: per type, early-half vs late-half
    # mean value with the exact cross-multiplied shift numerator
    # n_e·S_l − n_l·S_e (sign = drift direction, no division until
    # the two emitted means)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def ts_us(tbl):
        return pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)

    def minmax(tbl: pa.Table) -> pa.Table:
        t = ts_us(tbl)
        if t.size == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "lo": pa.array([int(t.min())], pa.int64()),
                "hi": pa.array([int(t.max())], pa.int64()),
            }
        )

    lo = hi = None
    for ref in ev.map_batches(
        minmax, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        blo = pc.min(t.column("lo")).as_py()
        bhi = pc.max(t.column("hi")).as_py()
        lo = blo if lo is None else min(lo, blo)
        hi = bhi if hi is None else max(hi, bhi)
    mid = (lo + hi) // 2

    def partial(tbl: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        late = ts_us(tbl) > mid
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(code, kind="stable")
        c_s, l_s, v_s = code[order], late[order], cents[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        n_all = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
        n_late = np.add.reduceat(l_s.astype(np.int64), starts)
        s_all = np.add.reduceat(v_s, starts)
        s_late = np.add.reduceat(np.where(l_s, v_s, 0), starts)
        return pa.table(
            {
                "event_type": enc.dictionary.take(pa.array(c_s[starts])),
                "n_early": n_all - n_late,
                "n_late": n_late,
                "s_early": s_all - s_late,
                "s_late": s_late,
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
                    "mean_early": pa.array([], pa.float64()),
                    "mean_late": pa.array([], pa.float64()),
                    "shift_num": pa.array([], pa.int64()),
                }
            )
        cols = {
            c: group.column(c).to_numpy(zero_copy_only=False)
            for c in ("n_early", "n_late", "s_early", "s_late")
        }
        order = np.argsort(et, kind="stable")
        e_s = et[order]
        starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]][: e_s.size])
        ne = np.add.reduceat(cols["n_early"][order], starts)
        nl = np.add.reduceat(cols["n_late"][order], starts)
        se = np.add.reduceat(cols["s_early"][order], starts)
        sl = np.add.reduceat(cols["s_late"][order], starts)
        return pa.table(
            {
                "event_type": pa.array(e_s[starts], pa.string()),
                "mean_early": se.astype(np.float64) / ne.astype(np.float64),
                "mean_late": sl.astype(np.float64) / nl.astype(np.float64),
                "shift_num": ne * sl - nl * se,
            }
        )

    return (
        parts.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(
            ["event_type", "mean_early", "mean_late", "shift_num"]
        )
    )



def q_value_percentile(sf):
    # broadcast-CDF enrichment: every event annotated with its exact
    # global percent_rank — the distinct-cents histogram (grid-sized
    # metadata) is aggregated once, ray.put once, and each batch
    # resolves via searchsorted; raw rows never shuffle
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "value"]
    )

    def hist_partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        c, n = np.unique(np.floor(v * 100.0).astype(np.int64), return_counts=True)
        return pa.table({"cents": c, "n": n.astype(np.int64)})

    hist = bucketed_sum(
        ev.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="cents",
        value_cols=("n",),
    ).take_all()  # distinct-cents grid: metadata-sized by construction
    vals = np.array([r["cents"] for r in hist], np.int64)
    cnts = np.array([r["n"] for r in hist], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    smaller = np.r_[np.int64(0), np.cumsum(cnts)[:-1]]
    n_total = int(cnts.sum())
    ref = ray.put((vals, smaller, n_total))

    def rank(tbl: pa.Table) -> pa.Table:
        v, sm, nt = ray.get(ref)
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pos = np.searchsorted(v, cents)
        pct = sm[pos].astype(np.float64) / np.float64(nt - 1)
        return pa.table(
            {"event_id": tbl.column("event_id"), "cents": cents, "pct": pct}
        )

    return ev.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)



def q_value_ks(sf):
    # two-sample Kolmogorov–Smirnov distance between weekday and
    # weekend value distributions: exact integer numerator
    # max|c_w·n_e − c_e·n_w| over the distinct-cents grid
    # (grid-bounded metadata), ONE double division
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["ts", "value"]
    )
    DAY = 86_400_000_000

    def partial(tbl: pa.Table) -> pa.Table:
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        dow = (us // DAY + 4) % 7
        wknd = (dow == 0) | (dow == 6)
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(cents, kind="stable")
        c_s, w_s = cents[order], wknd[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        nw = np.add.reduceat(w_s.astype(np.int64), starts)
        nt = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
        return pa.table(
            {"cents": c_s[starts], "n_wknd": nw, "n_wday": nt - nw}
        )

    hist = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cents",
        value_cols=("n_wknd", "n_wday"),
    ).take_all()  # distinct-cents grid: metadata-sized
    vals = np.array([r["cents"] for r in hist], np.int64)
    nw = np.array([r["n_wknd"] for r in hist], np.int64)
    nd = np.array([r["n_wday"] for r in hist], np.int64)
    order = np.argsort(vals)
    cw = np.cumsum(nw[order]).astype(object)
    cd = np.cumsum(nd[order]).astype(object)
    tw, td = int(nw.sum()), int(nd.sum())
    d_num = int(max(abs(cw * td - cd * tw))) if vals.size else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_weekend": pa.array([tw], pa.int64()),
                "n_weekday": pa.array([td], pa.int64()),
                "d_num": pa.array([d_num], pa.int64()),
                "ks": pa.array(
                    [float(d_num) / float(tw * td) if tw and td else None],
                    pa.float64(),
                ),
            }
        )
    )



def q_robust_outliers(sf):
    # robust z-score outlier counts per type: |c − m| > K·MAD with
    # every quantity on the exact quadrupled grid (2m and 2·mad2 are
    # exact ints) — integer comparisons only, no float threshold
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.quantiles import _interp_quantiles

    K = 5
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    )

    def hist_partial(tbl: pa.Table) -> pa.Table:
        c, n = np.unique(
            np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
            return_counts=True,
        )
        return pa.table({"cents": c, "n": n.astype(np.int64)})

    hist = bucketed_sum(
        ev.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="cents",
        value_cols=("n",),
    ).take_all()
    vals = np.array([r["cents"] for r in hist], np.int64)
    cnts = np.array([r["n"] for r in hist], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    med = _interp_quantiles(vals, cnts, [0.5])[0]
    m2 = int(round(2 * med))
    dev = np.abs(2 * vals - m2)
    dorder = np.argsort(dev)
    dv, dn = dev[dorder], cnts[dorder]
    starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]][: dv.size])
    mad2x = _interp_quantiles(dv[starts], np.add.reduceat(dn, starts), [0.5])[0]
    mad4 = int(round(2 * mad2x))  # 2·(2·MAD): exact int
    thr = ray.put((m2, mad4))

    def per_type(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m2v, mad4v = ray.get(thr)
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        out = 2 * np.abs(2 * cents - m2v) > K * mad4v
        enc = pc.dictionary_encode(tbl.column("event_type")).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kk, inv = np.unique(code, return_inverse=True)
        n = np.bincount(inv, minlength=kk.size).astype(np.int64)
        n_out = np.bincount(inv, weights=out, minlength=kk.size).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": enc.dictionary.take(pa.array(kk)),
                "n": n,
                "n_outliers": n_out,
            }
        )

    parts = ev.map_batches(
        per_type, batch_format="pyarrow", zero_copy_batch=True
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
                    "n_outliers": pa.array([], pa.int64()),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        no = group.column("n_outliers").to_numpy(zero_copy_only=False)
        order = np.argsort(et, kind="stable")
        e_s, n_s, o_s = et[order], n[order], no[order]
        starts = np.flatnonzero(np.r_[True, e_s[1:] != e_s[:-1]][: e_s.size])
        return pa.table(
            {
                "event_type": pa.array(e_s[starts], pa.string()),
                "n": np.add.reduceat(n_s, starts),
                "n_outliers": np.add.reduceat(o_s, starts),
            }
        )

    return (
        parts.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["event_type", "n", "n_outliers"])
    )



def q_value_mad(sf):
    # robust stats: exact median + median absolute deviation on the
    # doubled grid (R-7 median of ints has fraction ∈ {0, ½}, so 2m
    # is an exact int and |2c − 2m| stays integral) — ONE distributed
    # histogram pass, grid-sized driver fold
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.quantiles import _interp_quantiles

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["value"])

    def partial(tbl: pa.Table) -> pa.Table:
        c, n = np.unique(
            np.floor(
                tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
            return_counts=True,
        )
        return pa.table({"cents": c, "n": n.astype(np.int64)})

    hist = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cents",
        value_cols=("n",),
    ).take_all()  # distinct-cents grid: metadata-sized
    vals = np.array([r["cents"] for r in hist], np.int64)
    cnts = np.array([r["n"] for r in hist], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    n_total = int(cnts.sum())
    med = _interp_quantiles(vals, cnts, [0.5])[0]
    m2 = int(round(2 * med))  # exact: fraction is 0 or 1/2
    dev = np.abs(2 * vals - m2)
    dorder = np.argsort(dev)
    dv, dn = dev[dorder], cnts[dorder]
    # merge duplicate deviations (values symmetric around m)
    starts = np.flatnonzero(np.r_[True, dv[1:] != dv[:-1]][: dv.size])
    dv_u = dv[starts]
    dn_u = np.add.reduceat(dn, starts)
    mad2 = _interp_quantiles(dv_u, dn_u, [0.5])[0]
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([n_total], pa.int64()),
                "median": pa.array([med], pa.float64()),
                "mad": pa.array([mad2 / 2.0], pa.float64()),
            }
        )
    )



def q_grouped_moments(sf):
    # per-event-type exact integer moments (n, sum, sum-sq, min,
    # max in cents) — variance/correlation building block
    import ray

    from python_prtree_ray.pipelines.stats import grouped_moments

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    )
    return grouped_moments(ev)



def q_value_histogram(sf):
    # per-event-type fixed-width value histogram in cents bins
    import ray

    from python_prtree_ray.pipelines.stats import value_histogram

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    )
    return value_histogram(ev)



def q_value_mwu(sf):
    # Mann–Whitney U between purchase and click values on the
    # distinct-cents grid (same quantization as value_ks): exact
    # integer doubled rank-sums via one (cents, n_p, n_c) fold,
    # then ONE pinned float chain for U and the normal-approx z
    import math

    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = tbl.column("event_type")
        is_p = pc.equal(et, "purchase").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        is_c = pc.equal(et, "click").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        keep = is_p | is_c
        isp = is_p[keep].astype(np.int64)
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        order = np.argsort(cents, kind="stable")
        c_s, p_s = cents[order], isp[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        n_p = np.add.reduceat(p_s, starts)
        n_t = np.diff(np.r_[starts, c_s.size]).astype(np.int64)
        return pa.table(
            {"cents": c_s[starts], "n_p": n_p, "n_t": n_t}
        )

    hist = bucketed_sum(
        ev.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="cents",
        value_cols=("n_p", "n_t"),
    ).take_all()  # distinct-cents grid: metadata-sized
    vals = np.array([r["cents"] for r in hist], np.int64)
    n_p = np.array([r["n_p"] for r in hist], np.int64)
    n_t = np.array([r["n_t"] for r in hist], np.int64)
    order = np.argsort(vals)
    n_p, n_t = n_p[order], n_t[order]
    cb = np.r_[0, np.cumsum(n_t)[:-1]]  # ranks before this value
    # doubled average rank of a tied block = 2*cb + n_t + 1 (int)
    r1x2 = int(np.sum(n_p * (2 * cb + n_t + 1)))
    n1 = int(n_p.sum())
    n2 = int(n_t.sum()) - n1
    u1x2 = r1x2 - n1 * (n1 + 1)
    u = float(u1x2) / 2.0
    if n1 and n2:
        z = (u - float(n1 * n2) / 2.0) / math.sqrt(
            float(n1) * float(n2) * float(n1 + n2 + 1) / 12.0
        )
    else:  # empty group: DuckDB x / 0.0 is NULL
        z = None
    return ray.data.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "u1x2": pa.array([u1x2], pa.int64()),
                "u": pa.array([u], pa.float64()),
                "z": pa.array([z], pa.float64()),
            }
        )
    )



def q_value_welch_t(sf):
    # Welch's t-test (purchase vs view values, cents grid): exact
    # int64 moment partials (n, sum, sum-of-squares per group fit
    # comfortably: q <= n * cents_max^2), ONE pinned float chain
    # for means, t, and the Welch–Satterthwaite df
    import math

    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "value"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = tbl.column("event_type")
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        out = []
        for name in ("purchase", "view"):
            m = pc.equal(et, name).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            c = cents[m]
            out.extend(
                [int(c.size), int(c.sum()), int(np.sum(c * c))]
            )
        return pa.table(
            {
                "n1": pa.array([out[0]], pa.int64()),
                "s1": pa.array([out[1]], pa.int64()),
                "q1": pa.array([out[2]], pa.int64()),
                "n2": pa.array([out[3]], pa.int64()),
                "s2": pa.array([out[4]], pa.int64()),
                "q2": pa.array([out[5]], pa.int64()),
            }
        )

    rows = ev.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    n1 = sum(int(r["n1"]) for r in rows)
    s1 = sum(int(r["s1"]) for r in rows)
    q1 = sum(int(r["q1"]) for r in rows)
    n2 = sum(int(r["n2"]) for r in rows)
    s2 = sum(int(r["s2"]) for r in rows)
    q2 = sum(int(r["q2"]) for r in rows)
    if n1 >= 2 and n2 >= 2:
        m1 = float(s1) / float(n1)
        m2 = float(s2) / float(n2)
        v1 = (float(q1) - float(s1) * float(s1) / float(n1)) / float(
            n1 - 1
        )
        v2 = (float(q2) - float(s2) * float(s2) / float(n2)) / float(
            n2 - 1
        )
        a = v1 / float(n1)
        b = v2 / float(n2)
        t = (m1 - m2) / math.sqrt(a + b)
        df = (a + b) * (a + b) / (
            a * a / float(n1 - 1) + b * b / float(n2 - 1)
        )
    else:  # degenerate group: DuckDB x / 0.0 is NULL
        m1 = float(s1) / float(n1) if n1 else None
        m2 = float(s2) / float(n2) if n2 else None
        t = None
        df = None
    return ray.data.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "mean1": pa.array([m1], pa.float64()),
                "mean2": pa.array([m2], pa.float64()),
                "t_stat": pa.array([t], pa.float64()),
                "df": pa.array([df], pa.float64()),
            }
        )
    )


QUERIES = {
    "value_quantiles": q_value_quantiles,
    "value_drift": q_value_drift,
    "value_percentile": q_value_percentile,
    "value_ks": q_value_ks,
    "robust_outliers": q_robust_outliers,
    "value_mad": q_value_mad,
    "grouped_moments": q_grouped_moments,
    "value_histogram": q_value_histogram,
    "value_mwu": q_value_mwu,
    "value_welch_t": q_value_welch_t,
}

SQL = {
    "value_quantiles": value_quantiles_sql,
    "value_ks": (
        "WITH e AS (SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS cents, "
        "(epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6) AS wknd "
        "FROM events), "
        "h AS (SELECT cents, "
        "CAST(SUM(CASE WHEN wknd THEN 1 ELSE 0 END) AS HUGEINT) AS nw, "
        "CAST(SUM(CASE WHEN wknd THEN 0 ELSE 1 END) AS HUGEINT) AS nd "
        "FROM e GROUP BY cents), "
        "cum AS (SELECT SUM(nw) OVER (ORDER BY cents) AS cw, "
        "SUM(nd) OVER (ORDER BY cents) AS cd FROM h), "
        "tot AS (SELECT CAST(SUM(nw) AS HUGEINT) AS tw, "
        "CAST(SUM(nd) AS HUGEINT) AS td FROM h) "
        "SELECT CAST(tot.tw AS BIGINT) AS n_weekend, "
        "CAST(tot.td AS BIGINT) AS n_weekday, "
        "CAST(MAX(ABS(cum.cw * tot.td - cum.cd * tot.tw)) AS BIGINT) "
        "AS d_num, "
        "CAST(MAX(ABS(cum.cw * tot.td - cum.cd * tot.tw)) AS DOUBLE) "
        "/ CAST(tot.tw * tot.td AS DOUBLE) AS ks "
        "FROM cum, tot GROUP BY tot.tw, tot.td"
    ),
    "value_percentile": (
        "WITH c AS (SELECT event_id, CAST(FLOOR(value * 100.0) AS BIGINT)"
        " AS cents FROM events) "
        "SELECT event_id, cents, "
        "PERCENT_RANK() OVER (ORDER BY cents) AS pct FROM c"
    ),
    "value_drift": (
        "WITH b AS (SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2"
        " AS mid FROM events), "
        "c AS (SELECT event_type, epoch_us(ts) > b.mid AS late, "
        "CAST(FLOOR(value * 100.0) AS BIGINT) AS cents FROM events, b), "
        "t AS (SELECT event_type, "
        "CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS ne, "
        "CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS nl, "
        "CAST(SUM(CASE WHEN late THEN 0 ELSE cents END) AS BIGINT) AS se, "
        "CAST(SUM(CASE WHEN late THEN cents ELSE 0 END) AS BIGINT) AS sl "
        "FROM c GROUP BY event_type) "
        "SELECT event_type, "
        "CAST(se AS DOUBLE) / CAST(ne AS DOUBLE) AS mean_early, "
        "CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_late, "
        "ne * sl - nl * se AS shift_num FROM t"
    ),
    "robust_outliers": (
        "WITH c AS (SELECT event_type, CAST(FLOOR(value * 100.0) AS"
        " BIGINT) AS cents FROM events), "
        "m AS (SELECT quantile_cont(cents, 0.5) AS med FROM c), "
        "m2 AS (SELECT CAST(ROUND(2 * med) AS BIGINT) AS m2v FROM m), "
        "d AS (SELECT ABS(2 * cents - m2.m2v) AS dev FROM c, m2), "
        "md AS (SELECT CAST(ROUND(2 * quantile_cont(dev, 0.5)) AS BIGINT)"
        " AS mad4 FROM d) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN 2 * ABS(2 * cents - m2.m2v) > 5 * md.mad4 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
        "FROM c, m2, md GROUP BY event_type"
    ),
    "value_mad": (
        "WITH c AS (SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS cents"
        " FROM events), "
        "m AS (SELECT quantile_cont(cents, 0.5) AS med, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM c), "
        "m2 AS (SELECT CAST(ROUND(2 * med) AS BIGINT) AS m2v, med, n "
        "FROM m), "
        "d AS (SELECT ABS(2 * cents - m2.m2v) AS dev FROM c, m2) "
        "SELECT m2.n AS n, m2.med AS median, "
        "quantile_cont(d.dev, 0.5) / 2.0 AS mad "
        "FROM d, m2 GROUP BY m2.n, m2.med"
    ),
    "value_welch_t": (
        "WITH e AS (SELECT event_type, "
        "CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events "
        "WHERE event_type IN ('purchase', 'view')), "
        "m AS (SELECT "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n1, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 "
        "END) AS BIGINT) AS s1, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN c * c ELSE "
        "0 END) AS BIGINT) AS q1, "
        "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n2, "
        "CAST(SUM(CASE WHEN event_type = 'view' THEN c ELSE 0 END) "
        "AS BIGINT) AS s2, "
        "CAST(SUM(CASE WHEN event_type = 'view' THEN c * c ELSE 0 "
        "END) AS BIGINT) AS q2 FROM e), "
        "d AS (SELECT n1, n2, "
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1, "
        "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2, "
        "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * "
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / "
        "CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS a, "
        "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * "
        "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / "
        "CAST(n2 - 1 AS DOUBLE) / CAST(n2 AS DOUBLE) AS b FROM m) "
        "SELECT n1, n2, m1 AS mean1, m2 AS mean2, "
        "(m1 - m2) / SQRT(a + b) AS t_stat, "
        "(a + b) * (a + b) / (a * a / CAST(n1 - 1 AS DOUBLE) + "
        "b * b / CAST(n2 - 1 AS DOUBLE)) AS df FROM d"
    ),
    "value_mwu": (
        "WITH e AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp "
        "FROM events WHERE event_type IN ('purchase', 'click')), "
        "c AS (SELECT cents, CAST(SUM(isp) AS BIGINT) AS np, "
        "CAST(COUNT(*) AS BIGINT) AS nt FROM e GROUP BY cents), "
        "r AS (SELECT cents, np, nt, COALESCE(SUM(nt) OVER "
        "(ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING), 0) AS cb FROM c), "
        "s AS (SELECT CAST(SUM(np * (2 * cb + nt + 1)) AS BIGINT) AS"
        " r1x2, CAST(SUM(np) AS BIGINT) AS n1, "
        "CAST(SUM(nt - np) AS BIGINT) AS n2 FROM r) "
        "SELECT n1, n2, "
        "CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1x2, "
        "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u, "
        "(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 - "
        "CAST(n1 * n2 AS DOUBLE) / 2.0) / "
        "SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * "
        "CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) AS z FROM s"
    ),
    "grouped_moments": """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sum_c,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq_c,
       CAST(MIN(c) AS BIGINT) AS min_c, CAST(MAX(c) AS BIGINT) AS max_c
FROM c GROUP BY event_type
""",
    "value_histogram": """
WITH c AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR(value * 100) AS BIGINT) // 5000, 0), 9) AS bin
  FROM events
)
SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY event_type, bin
""",
}
