"""analytics query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    TILE_RES,
    _isin_sorted,
    derive,
    tiling,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _interval_union_len_sql,
    _lorenz_curve_sql,
    _region_count_curve_sql,
    asof_sql,
    g,
    interval_join_sql,
    pricing_summary_sql,
    region_rollup_sql,
)



def q_asof_purchase_view(sf):
    import ray
    import pyarrow.compute as _pc
    from python_prtree_ray.pipelines.asof import asof_join

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
    return asof_join(left, right)



def q_region_rollup(sf):
    # snowflake rollup: customers counted + acctbal cents summed per
    # REGION through the nation->region dimension chain (driver-built
    # LUT rides the closure; the fact table never shuffles raw)
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.agg import mapped_rollup

    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(
        f"{sf}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n2r = dict(
        zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
    )
    rname = dict(
        zip(
            reg.column("r_regionkey").to_pylist(),
            reg.column("r_name").to_pylist(),
        )
    )
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    rolled = mapped_rollup(cust, "c_nationkey", "c_acctbal", n2r)

    def attach(tbl):
        import pyarrow as pa

        g = tbl.column("gkey").to_pylist()
        return pa.table(
            {
                "r_name": pa.array([rname[v] for v in g], pa.string()),
                "n_customers": tbl.column("n_rows"),
                "acctbal_c": tbl.column("sum_c"),
            }
        )

    return rolled.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)



def q_pricing_summary(sf):
    # TPC-H Q1-shaped scan aggregate in exact integer cents:
    # per-batch combine to <=6 partial rows, no raw-row shuffle
    import ray
    from python_prtree_ray.pipelines.agg import pricing_summary

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    return pricing_summary(li)



def q_interval_join(sf):
    # per-user temporal interval join (view inside [purchase, +2h])
    # expressed as the existing 2D spatial join: time on x, the user
    # key embedded as an exact-hash point on y — no new join code
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.pipelines.interval import interval_point_join

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

    left = ev.map_batches(side("purchase", "l_id"), batch_format="pyarrow", zero_copy_batch=True)
    right = ev.map_batches(side("view", "r_id"), batch_format="pyarrow", zero_copy_batch=True)
    return interval_point_join(left, right, window_us=2 * 3600 * 1_000_000)



def q_lineitem_orders(sf):
    # big-big shuffle equi-join: both sides too large to broadcast,
    # co-partitioned on a coarse key-hash bucket, vectorized in-bucket
    # range-match (pipelines/join.py)
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    return hash_equi_join(
        li, od,
        on="l_orderkey", right_on="o_orderkey",
        left_cols=("l_linenumber", "l_quantity"),
        right_cols=("o_custkey",),
    )



def q_orders_cust_left(sf):
    # LEFT flavor of the co-partitioned shuffle join: unmatched
    # orders keep a sentinel name ('' after fill) — same one-shuffle
    # plan as inner (pipelines/join.py, how="left")
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cu = ray.data.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).filter(expr="c_mktsegment == 'BUILDING'").select_columns(
        ["c_custkey", "c_name"]
    )
    out = hash_equi_join(
        od, cu,
        on="o_custkey", right_on="c_custkey",
        left_cols=("o_orderkey",), right_cols=("c_name",),
        how="left",
    )

    def fill(tbl: pa.Table) -> pa.Table:
        col = _pc.fill_null(tbl.column("c_name"), "")
        return tbl.set_column(
            tbl.schema.get_field_index("c_name"), "cname", col
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)



def q_orders_cust_outer(sf):
    # FULL-OUTER flavor: only every-third order survives the left
    # filter, so both sides contribute unmatched rows (sentinel-fill
    # -1 / '' keeps the driver hash NaN-free)
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join

    def every_third(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ok % 3 == 0))

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(every_third, batch_format="pyarrow", zero_copy_batch=True)
    cu = ray.data.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).filter(expr="c_mktsegment == 'BUILDING'").select_columns(
        ["c_custkey", "c_name"]
    )
    out = hash_equi_join(
        od, cu,
        on="o_custkey", right_on="c_custkey",
        left_cols=("o_orderkey",), right_cols=("c_name",),
        how="outer",
    )

    def fill(tbl: pa.Table) -> pa.Table:
        tbl = tbl.set_column(
            tbl.schema.get_field_index("o_orderkey"),
            "o_orderkey",
            _pc.fill_null(tbl.column("o_orderkey"), -1),
        )
        return tbl.set_column(
            tbl.schema.get_field_index("c_name"),
            "cname",
            _pc.fill_null(tbl.column("c_name"), ""),
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)



def q_orders_with_returns(sf):
    # SEMI flavor: orders having at least one returned lineitem —
    # each order emitted once regardless of match multiplicity
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).filter(expr="l_returnflag == 'R'").select_columns(["l_orderkey"])
    return hash_equi_join(
        od, li,
        on="o_orderkey", right_on="l_orderkey",
        left_cols=("o_custkey",),
        how="semi",
    )



def q_orders_semi_bloom(sf):
    # the BLOOM-GATED physical plan for the same semi join driven
    # through the driver oracle: right keys fold to a 1-Mbit filter,
    # left rows drop map-side BEFORE the shuffle, exact semi join
    # verifies survivors — identical rows to orders_with_returns
    import ray
    from python_prtree_ray.pipelines.join import bloom_semi_join

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).filter(expr="l_returnflag == 'R'").select_columns(["l_orderkey"])
    return bloom_semi_join(
        od, li,
        on="o_orderkey", right_on="l_orderkey",
        left_cols=("o_custkey",),
    )



def q_orders_no_returns(sf):
    # ANTI flavor on the same shapes: orders with NO returned lineitem
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).filter(expr="l_returnflag == 'R'").select_columns(["l_orderkey"])
    return hash_equi_join(
        od, li,
        on="o_orderkey", right_on="l_orderkey",
        left_cols=("o_custkey",),
        how="anti",
    )



def q_q3_revenue(sf):
    # TPC-H Q3-shaped composite: broadcast dim filter (customer →
    # orders, zero shuffle) + map-side revenue combine + ONE groupby
    # shuffle + co-partitioned semi join. Revenue in integer cents so
    # the distributed sum is order-independent and oracle-exact.
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup

    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    import pyarrow.compute as _pc

    bkeys = cust.filter(
        _pc.equal(cust.column("c_mktsegment"), "BUILDING")
    ).select(["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    filt_orders = broadcast_lookup(
        orders, bkeys, on="o_custkey", small_on="c_custkey"
    ).select_columns(["o_orderkey"])

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(tbl: pa.Table) -> pa.Table:
        ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        ks, cs = ok[order], cents[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "l_orderkey": ks[starts],
                "revenue_cents": np.add.reduceat(cs, starts),
            }
        )

    # FUSED per-key sum + semi join: the aggregate and the join share
    # the key, so they share ONE bucket shuffle (separate aggregate
    # and join stages would pay the all-to-all twice — and Ray's
    # native sort-based Aggregate on this high-cardinality key costs
    # ~10s where the fused bucketed reduceat costs one shuffle)
    from python_prtree_ray.pipelines.join import sum_semi_join

    return sum_semi_join(
        li.map_batches(
            rev_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        filt_orders,
        on="l_orderkey",
        right_on="o_orderkey",
        value_cols=("revenue_cents",),
    )



def q_local_supplier_volume(sf):
    # TPC-H Q5-shaped multiway join: revenue by nation where the
    # supplier and the ordering customer share a nation. Three dim
    # tables broadcast via ray.put (zero shuffle); ONE co-partitioned
    # big-big join on orderkey; integer-cents revenue partials fold
    # map-side so only nation-sized rows reach the final sum.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    o2 = broadcast_lookup(
        orders, cust, on="o_custkey", small_on="c_custkey",
        carry_cols=("c_nationkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep(tbl: pa.Table) -> pa.Table:
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "l_suppkey": tbl.column("l_suppkey"),
                "cents": cents,
            }
        )

    li2 = broadcast_lookup(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        supp, on="l_suppkey", small_on="s_suppkey",
        carry_cols=("s_nationkey",),
    ).select_columns(["l_orderkey", "s_nationkey", "cents"])

    joined = hash_equi_join(
        li2, o2,
        on="l_orderkey", right_on="o_orderkey",
        left_cols=("s_nationkey", "cents"),
        right_cols=("c_nationkey",),
    )

    def agg(tbl: pa.Table) -> pa.Table:
        sn = tbl.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = tbl.column("c_nationkey").to_numpy(zero_copy_only=False)
        cents = tbl.column("cents").to_numpy(zero_copy_only=False)
        keep = sn == cn
        nk = sn[keep].astype(np.int64)
        c = cents[keep]
        order = np.argsort(nk, kind="stable")
        nk_s, c_s = nk[order], c[order]
        starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
        return pa.table(
            {
                "n_nationkey": nk_s[starts],
                "revenue_cents": np.add.reduceat(c_s, starts)
                if nk_s.size
                else np.zeros(0, np.int64),
            }
        )

    summed = bucketed_sum(
        joined.map_batches(
            agg, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="n_nationkey",
        value_cols=("revenue_cents",),
    )
    return broadcast_lookup(
        summed, nat, on="n_nationkey", small_on="n_nationkey",
        carry_cols=("n_name",),
    ).select_columns(["n_name", "revenue_cents"])



def q_co_purchase_parts(sf):
    # market-basket over orders: unordered part pairs bought in the
    # same order, pairs appearing in >= 2 orders; ONE order-bucket
    # fold (offset-sweep pair expansion over the sorted distinct
    # parts of each order), ONE pair-key sum
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum

    MIN_ORDERS = 2
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        o = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        o_s, p_s = o[order], p[order]
        keep = np.r_[True, (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])][: o_s.size]
        return pa.table(
            {
                "bucket": bucket_of(o_s[keep], 256),
                "o": o_s[keep],
                "p": p_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        o = group.column("o").to_numpy(zero_copy_only=False)
        if o.size == 0:
            return empty
        p = group.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        o_s, p_s = o[order], p[order]
        keep = np.r_[True, (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])][: o_s.size]
        o_s, p_s = o_s[keep], p_s[keep]
        pa_l, pb_l = [], []
        d = 1
        while d < o_s.size:
            valid = o_s[d:] == o_s[:-d]
            if not valid.any():
                break
            pa_l.append(p_s[:-d][valid])  # sorted within order -> a < b
            pb_l.append(p_s[d:][valid])
            d += 1
        if not pa_l:
            return empty
        a = np.concatenate(pa_l)
        b = np.concatenate(pb_l)
        # parts fit 21 bits at test scale; guard the pack
        if b.max() >= (1 << 31):
            raise ValueError("co_purchase_parts: partkey exceeds pack")
        key, n = np.unique(a * (1 << 31) + b, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    keyed = li.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

    def finish(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        keep = n >= MIN_ORDERS
        return pa.table(
            {
                "part_a": key[keep] >> 31,
                "part_b": key[keep] & ((1 << 31) - 1),
                "n_orders": n[keep],
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_lapsed_customers(sf):
    # reverse-direction anti join: dimension rows with NO fact match
    # in the stream's final 365 days — the active-key set folds to
    # customer-sized metadata, broadcast once, filter the dimension
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    DAY = 86_400_000_000
    all_orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def maxdate(tbl: pa.Table) -> pa.Table:
        us = pc.cast(
            tbl.column("o_orderdate").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        if us.size == 0:
            return pa.table({"hi": pa.array([], pa.int64())})
        return pa.table({"hi": pa.array([int(us.max())], pa.int64())})

    hi = None
    for ref0 in all_orders.map_batches(
        maxdate, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs():
        t = ray.get(ref0)
        if t.num_rows:
            v = pc.max(t.column("hi")).as_py()
            hi = v if hi is None else max(hi, v)
    cutoff = hi - 365 * DAY

    def partial(tbl: pa.Table) -> pa.Table:
        us = pc.cast(
            tbl.column("o_orderdate").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        keep = us >= cutoff
        k = np.unique(
            tbl.column("o_custkey").to_numpy(zero_copy_only=False)[keep]
        )
        return pa.table({"k": k, "one": np.ones(k.size, np.int64)})

    orders = all_orders

    keys = bucketed_sum(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="k",
        value_cols=("one",),
    )
    have = []
    for ref in keys.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            have.append(t.column("k").to_numpy(zero_copy_only=False))
    have_sorted = np.sort(np.concatenate(have)) if have else np.zeros(0, np.int64)
    ref_k = ray.put(have_sorted)

    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def anti(tbl: pa.Table) -> pa.Table:
        ks = ray.get(ref_k)
        c = tbl.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        hit = _isin_sorted(ks, c)
        return tbl.filter(pa.array(~hit))

    return cust.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)



def q_returns_revenue_share(sf):
    # conditional-aggregate ratio per nation: returned-lineitem
    # revenue share — (total, returned) int-cents partials fold
    # map-side; supplier dim broadcast; ONE nation-sized sum
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    supp = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    li2 = broadcast_lookup(
        li, supp, on="l_suppkey", small_on="s_suppkey",
        carry_cols=("s_nationkey",),
    )

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        ret = pc.equal(tbl.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        )
        nk = tbl.column("s_nationkey").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.argsort(nk, kind="stable")
        nk_s, c_s, r_s = nk[order], cents[order], ret[order]
        starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
        return pa.table(
            {
                "n_nationkey": nk_s[starts],
                "revenue_cents": np.add.reduceat(c_s, starts),
                "returned_cents": np.add.reduceat(
                    np.where(r_s, c_s, 0), starts
                ),
            }
        )

    summed = bucketed_sum(
        li2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="n_nationkey",
        value_cols=("revenue_cents", "returned_cents"),
    )
    named = broadcast_lookup(
        summed, nat, on="n_nationkey", small_on="n_nationkey",
        carry_cols=("n_name",),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        tot = tbl.column("revenue_cents").to_numpy(zero_copy_only=False)
        ret = tbl.column("returned_cents").to_numpy(zero_copy_only=False)
        share = ret.astype(np.float64) / tot.astype(np.float64)
        return pa.table(
            {
                "n_name": tbl.column("n_name"),
                "revenue_cents": tot,
                "returned_cents": ret,
                "returned_share": share,
            }
        )

    return named.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_above_avg_orders(sf):
    # correlated-aggregate filter: orders strictly above their
    # customer's mean order value — exact integer cross-multiply
    # (v·n > sum, no division); aggregate + re-join share ONE shuffle
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.agg import above_group_mean

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def prep(tbl):
        tp = tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "o_custkey": tbl.column("o_custkey"),
                "cents": np.floor(tp * 100.0).astype(np.int64),
            }
        )

    return above_group_mean(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        key_col="o_custkey",
        id_col="o_orderkey",
        cents_col="cents",
    )



def q_supplier_reach_hist(sf):
    # two-level DISTINCT aggregate: distinct orders served per
    # supplier, then the distribution of that reach
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_suppkey", "l_orderkey"]
    )

    def prep(tbl: pa.Table) -> pa.Table:
        s = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)
        o = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, s))
        s_s, o_s = s[order], o[order]
        keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (o_s[1:] != o_s[:-1])][: s_s.size]
        return pa.table(
            {
                "bucket": bucket_of(s_s[keep], 256),
                "s": s_s[keep],
                "o": o_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy(zero_copy_only=False)
        if s.size == 0:
            return pa.table(
                {
                    "n_orders": pa.array([], pa.int64()),
                    "n_suppliers": pa.array([], pa.int64()),
                }
            )
        o = group.column("o").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, s))
        s_s, o_s = s[order], o[order]
        keep = np.r_[True, (s_s[1:] != s_s[:-1]) | (o_s[1:] != o_s[:-1])][: s_s.size]
        s_u = s_s[keep]
        starts = np.flatnonzero(np.r_[True, s_u[1:] != s_u[:-1]][: s_u.size])
        reach = np.diff(np.r_[starts, s_u.size]).astype(np.int64)
        rr, n = np.unique(reach, return_counts=True)
        return pa.table(
            {"n_orders": rr, "n_suppliers": n.astype(np.int64)}
        )

    folded = (
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return bucketed_sum(
        folded, key_col="n_orders", value_cols=("n_suppliers",)
    )



def q_nation_share(sf):
    # share-of-parent rollup: each nation's order revenue as a
    # fraction of its region's total — nation-sized metadata fold,
    # exact int sums, one division per row
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(
        f"{sf}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    o2 = broadcast_lookup(
        orders, cust, on="o_custkey", small_on="c_custkey",
        carry_cols=("c_nationkey",),
    )

    def partial(tbl: pa.Table) -> pa.Table:
        nk = tbl.column("c_nationkey").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(nk, kind="stable")
        nk_s, c_s = nk[order], cents[order]
        starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
        return pa.table(
            {
                "n_nationkey": nk_s[starts],
                "revenue_cents": np.add.reduceat(c_s, starts),
            }
        )

    summed = bucketed_sum(
        o2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="n_nationkey",
        value_cols=("revenue_cents",),
    )
    nmap = {
        int(k): (str(n), int(r))
        for k, n, r in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
    }
    rmap = {
        int(k): str(n)
        for k, n in zip(
            reg.column("r_regionkey").to_pylist(),
            reg.column("r_name").to_pylist(),
        )
    }

    def add_k(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "k", pa.array(np.zeros(tbl.num_rows, np.int64))
        )

    def finish(group: pa.Table) -> pa.Table:
        nk = group.column("n_nationkey").to_numpy(zero_copy_only=False)
        rev = group.column("revenue_cents").to_numpy(zero_copy_only=False)
        rkey = np.array([nmap[int(x)][1] for x in nk], np.int64)
        rtot = {}
        for r, v in zip(rkey, rev):
            rtot[int(r)] = rtot.get(int(r), 0) + int(v)
        region_cents = np.array([rtot[int(r)] for r in rkey], np.int64)
        return pa.table(
            {
                "r_name": pa.array([rmap[int(r)] for r in rkey], pa.string()),
                "n_name": pa.array(
                    [nmap[int(x)][0] for x in nk], pa.string()
                ),
                "revenue_cents": rev,
                "region_cents": region_cents,
                "share": rev.astype(np.float64)
                / region_cents.astype(np.float64),
            }
        )

    return (
        summed.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(finish, batch_format="pyarrow")
        .select_columns(
            ["r_name", "n_name", "revenue_cents", "region_cents", "share"]
        )
    )



def q_pareto_users(sf):
    # 80/20 concentration: the SMALLEST top-spender set covering
    # ≥80% of total value — exact via 5·cum ≥ 4·total cross-multiply
    # (no float threshold); user-sized driver sort (rank statistic)
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
    x = np.sort(np.concatenate(xs))[::-1].astype(object)
    n = x.size
    total = int(x.sum())
    cum = np.cumsum(x)
    k80 = int(np.argmax(5 * cum >= 4 * total)) + 1  # first rank covering 80%
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
                "k80": pa.array([k80], pa.int64()),
                "share": pa.array(
                    [float(k80) / float(n) if n else None], pa.float64()
                ),
            }
        )
    )



def q_region_count_curve(sf):
    # percolation profile: region count vs density threshold over
    # the squared-coordinate raster (the raster_regions surface)
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"] * p["px"], "py": p["py"] * p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.region_count_curve(pts, res=TILE_RES, thresholds=(8, 16, 32))



def q_recency_hist(sf):
    # recency cohorts: users by days since their LAST activity
    # relative to the stream end — per-user max fold, day histogram
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.windows import DAY_US

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy(zero_copy_only=False)
        us = pc.cast(
            tbl.column("ts").cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        order = np.argsort(u, kind="stable")
        u_s, d_s = u[order], day[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        return pa.table(
            {
                "user_id": u_s[starts],
                "last_day": np.maximum.reduceat(d_s, starts),
            }
        )

    lasts = bucketed_sum(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="user_id",
        value_cols=("last_day",),
        reduce="max",
    ).take_all()  # user-sized metadata
    ld = np.array([r["last_day"] for r in lasts], np.int64)
    end = int(ld.max())
    rec = end - ld
    rr, n = np.unique(rec, return_counts=True)
    return ray.data.from_arrow(
        pa.table(
            {"recency_days": rr, "n_users": n.astype(np.int64)}
        )
    )



def q_cust_order_histogram(sf):
    # two-level aggregate: per-customer order counts, then the
    # distribution of those counts — both levels pre-combined
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        k, n = np.unique(
            tbl.column("o_custkey").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"o_custkey": k, "n_orders": n.astype(np.int64)})

    per_cust = bucketed_sum(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="o_custkey",
        value_cols=("n_orders",),
    )

    def hist_partial(tbl: pa.Table) -> pa.Table:
        k, n = np.unique(
            tbl.column("n_orders").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"n_orders": k, "n_customers": n.astype(np.int64)})

    return bucketed_sum(
        per_cust.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="n_orders",
        value_cols=("n_customers",),
    )



def q_part_best_supplier(sf):
    # per-part cheapest offer (TPC-H Q2-flavored argmin join): the
    # (supplier, cents) lineitem minimizing (cents, suppkey) per
    # part — map-side k=1 prune, ONE key-bucket shuffle
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import grouped_topk

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def prep(tbl: pa.Table) -> pa.Table:
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": tbl.column("l_partkey"),
                "l_suppkey": tbl.column("l_suppkey"),
                "cents": np.floor(ep * 100.0).astype(np.int64),
            }
        )

    best = grouped_topk(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        k=1,
        key_col="l_partkey",
        id_col="l_suppkey",
        value_col="cents",
        descending=False,
    )
    return best.select_columns(["l_partkey", "l_suppkey", "cents"])



def q_ship_delay_quantiles(sf):
    # exact R-7 quantiles of the order→ship latency in whole days,
    # grouped by order priority class: ONE co-partitioned big-big
    # join (int64 payloads only — the priority string is recoded to
    # its leading digit before the shuffle), then the distinct-value
    # histogram quantile fold
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.quantiles import int_quantiles

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def oprep(tbl: pa.Table) -> pa.Table:
        prio = pc.cast(
            pc.utf8_slice_codeunits(tbl.column("o_orderpriority"), 0, 1),
            pa.int64(),
        )
        od = pc.cast(tbl.column("o_orderdate"), pa.int64())
        return pa.table(
            {"o_orderkey": tbl.column("o_orderkey"), "prio": prio, "od_us": od}
        )

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def lprep(tbl: pa.Table) -> pa.Table:
        sd = pc.cast(tbl.column("l_shipdate"), pa.int64())
        return pa.table(
            {"l_orderkey": tbl.column("l_orderkey"), "ship_us": sd}
        )

    joined = hash_equi_join(
        li.map_batches(lprep, batch_format="pyarrow", zero_copy_batch=True),
        orders.map_batches(oprep, batch_format="pyarrow", zero_copy_batch=True),
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=("ship_us",),
        right_cols=("prio", "od_us"),
    )

    def delay(tbl: pa.Table) -> pa.Table:
        ship = tbl.column("ship_us").to_numpy(zero_copy_only=False)
        od = tbl.column("od_us").to_numpy(zero_copy_only=False)
        days = (ship - od) // 86_400_000_000
        return pa.table({"prio": tbl.column("prio"), "days": days})

    return int_quantiles(
        joined.map_batches(delay, batch_format="pyarrow", zero_copy_batch=True),
        key_col="prio",
        int_col="days",
    )



def q_top_revenue(sf):
    # global order statistic at scale: top-100 orders by revenue via
    # map-side per-batch top-k prune + one tiny single-group merge
    from python_prtree_ray.pipelines.merge import global_topk

    return global_topk(
        q_q3_revenue(sf), k=100, id_col="l_orderkey", value_col="revenue_cents"
    )



def q_discount_revenue(sf):
    # TPC-H Q6 shape: pure filtered aggregate — revenue forgone on
    # mid-band discounts in a one-year ship window, in exact
    # cents×basis-point ints (1e-4 dollars) so the distributed sum
    # is order-independent and oracle-exact. One partial row per
    # batch leaves the map; the driver folds the metadata-sized
    # partials in Python bigints (no int64 ceiling at any corpus
    # size).
    import pyarrow as pa
    import ray

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def partial(tbl: pa.Table) -> pa.Table:
        sd = tbl.column("l_shipdate").to_numpy(zero_copy_only=False)
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
        qty = tbl.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        bp = np.floor(disc * 100.0 + 0.5).astype(np.int64)
        keep = (sd >= lo) & (sd < hi) & (bp >= 2) & (bp <= 6) & (qty < 24.0)
        cents = np.floor(ep[keep] * 100.0).astype(np.int64)
        return pa.table(
            {
                "revenue_e4": pa.array(
                    [int(np.sum(cents * bp[keep]))], pa.int64()
                ),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    rows = li.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    return ray.data.from_arrow(
        pa.table(
            {
                "revenue_e4": pa.array(
                    [sum(int(r["revenue_e4"]) for r in rows)], pa.int64()
                ),
                "n_items": pa.array(
                    [sum(int(r["n_items"]) for r in rows)], pa.int64()
                ),
            }
        )
    )



def q_benford_hist(sf):
    # pricing-pattern audit, Benford flavor: distribution of the
    # LEADING digit of order totals (in exact cents) — the fraud /
    # synthetic-data screen companion of cents_mod_hist. The digit
    # comes from an integer→string slice (no log10, so both sides
    # are exact on every value)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_totalprice"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        digit = (
            pc.cast(
                pc.utf8_slice_codeunits(
                    pc.cast(pa.array(cents), pa.string()), 0, 1
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        d, c = np.unique(digit, return_counts=True)
        return pa.table({"digit": d, "n_orders": c.astype(np.int64)})

    return bucketed_sum(
        orders.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="digit",
        value_cols=("n_orders",),
    )



def q_nation_trade_pairs(sf):
    # TPC-H Q7 shape: bilateral trade volume by (supplier nation,
    # customer nation, ship year). Both nation attachments are
    # broadcast dim lookups (supplier and customer never shuffle);
    # the ONE all-to-all is the co-partitioned lineitem⋈orders hash
    # join; the (s, c, year) rollup packs into a single int key and
    # folds map-side, so only ≤ nations²×years partial rows reach
    # the final tiny exchange.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    sup = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    if nk.max() >= 32:
        raise ValueError("nation_trade_pairs: nationkey packing needs < 32")
    names = dict(zip(nk.tolist(), nat.column("n_name").to_pylist()))

    li = broadcast_lookup(
        ray.data.read_parquet(
            f"{sf}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_suppkey",
                "l_shipdate",
                "l_extendedprice",
                "l_discount",
            ],
        ),
        sup,
        on="l_suppkey",
        small_on="s_suppkey",
        carry_cols=("s_nationkey",),
    )

    def li_map(tbl: pa.Table) -> pa.Table:
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        bp = np.floor(
            tbl.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        cents = np.floor(ep * 100.0).astype(np.int64)
        sd = tbl.column("l_shipdate").to_numpy(zero_copy_only=False)
        year = sd.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "supp": tbl.column("s_nationkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "year": year,
                "rev_e4": cents * (100 - bp),
            }
        )

    li2 = li.map_batches(
        li_map, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = broadcast_lookup(
        ray.data.read_parquet(
            f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ),
        cust,
        on="o_custkey",
        small_on="c_custkey",
        carry_cols=("c_nationkey",),
    )

    def ord_map(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "custn": tbl.column("c_nationkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )

    joined = hash_equi_join(
        li2,
        orders.map_batches(
            ord_map, batch_format="pyarrow", zero_copy_batch=True
        ),
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=("supp", "year", "rev_e4"),
        right_cols=("custn",),
    )

    def pack_partial(tbl: pa.Table) -> pa.Table:
        supp = tbl.column("supp").to_numpy(zero_copy_only=False)
        custn = tbl.column("custn").to_numpy(zero_copy_only=False)
        year = tbl.column("year").to_numpy(zero_copy_only=False)
        rev = tbl.column("rev_e4").to_numpy(zero_copy_only=False)
        keep = supp != custn
        key = ((supp[keep] * 32 + custn[keep]) * 4096) + year[keep]
        rev = rev[keep]
        order = np.argsort(key, kind="stable")
        ks, rs = key[order], rev[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {"pk": ks[starts], "revenue_e4": np.add.reduceat(rs, starts)}
        )

    summed = bucketed_sum(
        joined.map_batches(
            pack_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="pk",
        value_cols=("revenue_e4",),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        pk = tbl.column("pk").to_numpy(zero_copy_only=False)
        sc = pk // 4096 // 32
        cc = (pk // 4096) % 32
        return pa.table(
            {
                "supp_nation": pa.array(
                    [names[int(s)] for s in sc], pa.string()
                ),
                "cust_nation": pa.array(
                    [names[int(c)] for c in cc], pa.string()
                ),
                "year": pk % 4096,
                "revenue_e4": tbl.column("revenue_e4"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_segment_order_dist(sf):
    # TPC-H Q13 shape: orders-per-customer distribution split by
    # market segment, INCLUDING zero-order customers — the
    # left-join histogram. Order counts fold map-side; the zero
    # bins come from per-segment customer totals minus
    # customers-seen (both metadata-sized), so neither the customer
    # table nor the raw orders ever shuffle.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    segs = sorted(set(cust.column("c_mktsegment").to_pylist()))
    seg_code = {s: i for i, s in enumerate(segs)}
    seg_col = np.array(
        [seg_code[s] for s in cust.column("c_mktsegment").to_pylist()],
        np.int64,
    )
    cust = cust.append_column("seg", pa.array(seg_col))
    seg_totals = np.bincount(seg_col, minlength=len(segs))

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        k, n = np.unique(
            tbl.column("o_custkey").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"o_custkey": k, "n_orders": n.astype(np.int64)})

    per_cust = bucketed_sum(
        orders.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="o_custkey",
        value_cols=("n_orders",),
    )
    enriched = broadcast_lookup(
        per_cust,
        cust,
        on="o_custkey",
        small_on="c_custkey",
        carry_cols=("seg",),
    )

    def hist_partial(tbl: pa.Table) -> pa.Table:
        seg = tbl.column("seg").to_numpy(zero_copy_only=False)
        n = tbl.column("n_orders").to_numpy(zero_copy_only=False)
        key = seg * (1 << 32) + n
        k, c = np.unique(key, return_counts=True)
        return pa.table({"sk": k, "n_customers": c.astype(np.int64)})

    hist = bucketed_sum(
        enriched.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="sk",
        value_cols=("n_customers",),
    ).take_all()  # ≤ segments × max-orders-per-customer: metadata
    sk = np.array([r["sk"] for r in hist], np.int64)
    nc = np.array([r["n_customers"] for r in hist], np.int64)
    seg_out = (sk >> 32).tolist()
    n_out = (sk & ((1 << 32) - 1)).tolist()
    c_out = nc.tolist()
    seen = np.bincount((sk >> 32), weights=nc, minlength=len(segs)).astype(
        np.int64
    )
    for i, s in enumerate(segs):
        zero = int(seg_totals[i] - seen[i])
        if zero > 0:
            seg_out.append(i)
            n_out.append(0)
            c_out.append(zero)
    return ray.data.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(
                    [segs[i] for i in seg_out], pa.string()
                ),
                "n_orders": pa.array(n_out, pa.int64()),
                "n_customers": pa.array(c_out, pa.int64()),
            }
        )
    )



def q_small_qty_revenue(sf):
    # TPC-H Q17 shape: revenue on below-one-fifth-of-average
    # quantity lineitems for one brand's parts. The per-part
    # average is an exact integer cross-multiply (5·n·qty < Σqty —
    # no division), folded in ONE pass over the brand-filtered
    # stream and broadcast back (one brand's part list is
    # dim-sized); the second streaming pass filters and sums cents
    # map-side.
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    part = pq.read_table(
        f"{sf}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    keys = part.filter(
        _pc.equal(part.column("p_brand"), "Brand#1")
    ).select(["p_partkey"])

    def brand_li(cols):
        return broadcast_lookup(
            ray.data.read_parquet(f"{sf}/lineitem.parquet", columns=cols),
            keys,
            on="l_partkey",
            small_on="p_partkey",
        )

    def stat_partial(tbl: pa.Table) -> pa.Table:
        k = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        q = np.floor(
            tbl.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        order = np.argsort(k, kind="stable")
        ks, qs = k[order], q[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "l_partkey": ks[starts],
                "n": np.diff(np.r_[starts, ks.size]).astype(np.int64),
                "sq": np.add.reduceat(qs, starts),
            }
        )

    stats = bucketed_sum(
        brand_li(["l_partkey", "l_quantity"]).map_batches(
            stat_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="l_partkey",
        value_cols=("n", "sq"),
    ).take_all()  # one row per brand part: dim-sized
    sk = np.array([r["l_partkey"] for r in stats], np.int64)
    sn = np.array([r["n"] for r in stats], np.int64)
    ssq = np.array([r["sq"] for r in stats], np.int64)
    order = np.argsort(sk, kind="stable")
    ref = ray.put((sk[order], sn[order], ssq[order]))

    def below_partial(tbl: pa.Table) -> pa.Table:
        kk, nn, qq = ray.get(ref)
        k = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        q = np.floor(
            tbl.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cents = np.floor(
            tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        pos = np.searchsorted(kk, k)  # every key survived the same gate
        keep = (5 * nn[pos] * q) < qq[pos]
        ks, cs = k[keep], cents[keep]
        order = np.argsort(ks, kind="stable")
        ks, cs = ks[order], cs[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "p_partkey": ks[starts],
                "below_cents": np.add.reduceat(cs, starts),
                "n_below": np.diff(np.r_[starts, ks.size]).astype(
                    np.int64
                ),
            }
        )

    return bucketed_sum(
        brand_li(["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
            below_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="p_partkey",
        value_cols=("below_cents", "n_below"),
    )



def q_large_orders(sf):
    # TPC-H Q18 shape: large-volume orders — per-order quantity
    # fold map-side, threshold filter, then ONE co-partitioned hash
    # join back to orders for the customer and price columns (the
    # surviving set is selectivity-bound, so it stays a big-big
    # join rather than an assumed-broadcastable side).
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.merge import bucketed_sum

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        k = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = np.floor(
            tbl.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        order = np.argsort(k, kind="stable")
        ks, qs = k[order], q[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "o_orderkey": ks[starts],
                "total_qty": np.add.reduceat(qs, starts),
            }
        )

    sums = bucketed_sum(
        li.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="o_orderkey",
        value_cols=("total_qty",),
    )

    def thresh(tbl: pa.Table) -> pa.Table:
        tq = tbl.column("total_qty").to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(tq > 150))

    def ord_map(tbl: pa.Table) -> pa.Table:
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "o_custkey": tbl.column("o_custkey"),
                "price_cents": cents,
            }
        )

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(ord_map, batch_format="pyarrow", zero_copy_batch=True)
    return hash_equi_join(
        sums.map_batches(
            thresh, batch_format="pyarrow", zero_copy_batch=True
        ),
        orders,
        on="o_orderkey",
        left_cols=("total_qty",),
        right_cols=("o_custkey", "price_cents"),
    )



def q_promo_revenue(sf):
    # TPC-H Q14 shape: promotional revenue share by ship month —
    # the PROMO part-key set broadcasts once via ray.put (parts
    # never shuffle), each batch folds to ≤ n-months rows of
    # (promo, total) int partials, and the share stays a pair of
    # exact ints (no decimal division to mismatch).
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    part = pq.read_table(
        f"{sf}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pk = np.sort(
        part.filter(_pc.equal(part.column("p_type"), "PROMO"))
        .column("p_partkey")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ref = ray.put(pk)

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=[
            "l_partkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        k = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        hit = _isin_sorted(keys, k)
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        bp = np.floor(
            tbl.column("l_discount").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        rev = np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
        mo = (
            tbl.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.argsort(mo, kind="stable")
        ms, rs, hs = mo[order], rev[order], hit[order]
        starts = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1]][: ms.size])
        return pa.table(
            {
                "month_us": ms[starts],
                "promo_e4": np.add.reduceat(np.where(hs, rs, 0), starts),
                "total_e4": np.add.reduceat(rs, starts),
            }
        )

    summed = bucketed_sum(
        li.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="month_us",
        value_cols=("promo_e4", "total_e4"),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        m = tbl.column("month_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "month": pa.array(
                    m.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "promo_e4": tbl.column("promo_e4"),
                "total_e4": tbl.column("total_e4"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_cents_mod_hist(sf):
    # pricing-pattern audit: distribution of price cents mod 100
    # (the .99 / round-number artifact detector); exact ints
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_totalprice"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        m, n = np.unique(cents % 100, return_counts=True)
        return pa.table({"cents_mod": m, "n": n.astype(np.int64)})

    return bucketed_sum(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="cents_mod",
        value_cols=("n",),
    )



def q_region_monthly_revenue(sf):
    # hierarchical x temporal rollup: order revenue by (region,
    # calendar month) — dims broadcast, packed-key partials, int cents
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(
        f"{sf}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    nmap = dict(
        zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
    )
    # fold nation -> region into the customer broadcast table
    import pyarrow.compute as _pc

    ck = cust.column("c_custkey")
    crk = pa.array(
        [nmap[int(x)] for x in cust.column("c_nationkey").to_pylist()],
        pa.int64(),
    )
    cust2 = pa.table({"c_custkey": ck, "rkey": crk})

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    o2 = broadcast_lookup(
        orders, cust2, on="o_custkey", small_on="c_custkey",
        carry_cols=("rkey",),
    )

    def partial(tbl: pa.Table) -> pa.Table:
        ts = (
            tbl.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
        )
        mo = ts.astype("datetime64[M]").astype(np.int64)  # months since epoch
        rk = tbl.column("rkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        key = rk * (1 << 20) + mo  # months since epoch < 2^20
        k_u, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": k_u,
                "revenue_cents": np.bincount(
                    inv, weights=cents, minlength=k_u.size
                ).astype(np.int64),
            }
        )

    summed = bucketed_sum(
        o2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="key",
        value_cols=("revenue_cents",),
    )
    rmap = dict(
        zip(
            reg.column("r_regionkey").to_pylist(),
            reg.column("r_name").to_pylist(),
        )
    )
    rref = ray.put(rmap)

    def decode(tbl: pa.Table) -> pa.Table:
        rm = ray.get(rref)
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        mo = (key & ((1 << 20) - 1)).astype("datetime64[M]")
        return pa.table(
            {
                "r_name": pa.array(
                    [rm[int(k)] for k in key >> 20], pa.string()
                ),
                "month": pa.array(
                    mo.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "revenue_cents": tbl.column("revenue_cents"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_nation_balance(sf):
    # dimension-side balance sheet: customers vs suppliers per
    # nation with the exact cross ratio (metadata-only op)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf}/customer.parquet", columns=["c_nationkey"])
    supp = pq.read_table(f"{sf}/supplier.parquet", columns=["s_nationkey"])
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    ck, cn = np.unique(
        cust.column("c_nationkey").to_numpy(zero_copy_only=False),
        return_counts=True,
    )
    sk, sn = np.unique(
        supp.column("s_nationkey").to_numpy(zero_copy_only=False),
        return_counts=True,
    )
    cmap = dict(zip(ck.tolist(), cn.tolist()))
    smap = dict(zip(sk.tolist(), sn.tolist()))
    keys = sorted(set(cmap) | set(smap))
    nmap = dict(
        zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
        )
    )
    nc = np.array([cmap.get(k, 0) for k in keys], np.int64)
    ns = np.array([smap.get(k, 0) for k in keys], np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_name": pa.array([nmap[k] for k in keys], pa.string()),
                "n_customers": nc,
                "n_suppliers": ns,
                # SQL-parity: x / 0.0 is NULL in DuckDB, not +inf
                "cust_per_supplier": pa.array(
                    np.divide(
                        nc.astype(np.float64),
                        ns.astype(np.float64),
                        out=np.full(nc.size, np.nan),
                        where=ns != 0,
                    ),
                    pa.float64(),
                    mask=ns == 0,
                ),
            }
        )
    )



def q_brand_revenue(sf):
    # attribute rollup through a broadcast dimension: revenue per
    # part brand (int cents, brand-sized fold), ranked
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.lookup import broadcast_lookup
    from python_prtree_ray.pipelines.merge import bucketed_sum

    part = pq.read_table(
        f"{sf}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    li2 = broadcast_lookup(
        li, part, on="l_partkey", small_on="p_partkey",
        carry_cols=("p_brand",),
    )

    def partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        enc = pc.dictionary_encode(tbl.column("p_brand")).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(code, kind="stable")
        c_s = code[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        return pa.table(
            {
                "k": np.zeros(starts.size, np.int64),
                "p_brand": enc.dictionary.take(pa.array(c_s[starts])),
                "revenue_cents": np.add.reduceat(cents[order], starts),
                "n_items": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        b = group.column("p_brand").to_numpy(zero_copy_only=False)
        if b.size == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        rev = group.column("revenue_cents").to_numpy(zero_copy_only=False)
        n = group.column("n_items").to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        b_s, r_s, n_s = b[order], rev[order], n[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]][: b_s.size])
        bb = b_s[starts]
        rr = np.add.reduceat(r_s, starts)
        nn = np.add.reduceat(n_s, starts)
        rankord = np.lexsort((bb, -rr))
        rank = np.empty(bb.size, np.int64)
        rank[rankord] = np.arange(1, bb.size + 1)
        return pa.table(
            {
                "p_brand": pa.array(bb, pa.string()),
                "revenue_cents": rr,
                "n_items": nn,
                "rank": rank,
            }
        )

    return (
        li2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["p_brand", "revenue_cents", "n_items", "rank"])
    )



def q_reorder_gap_quantiles(sf):
    # repeat-purchase cadence: exact R-7 quantiles of per-customer
    # consecutive-order gaps in days (dates are midnight-aligned, so
    # the day division is exact) — the shared pair fold + histogram
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.movement import _bucketed, _fold_pairs
    from python_prtree_ray.pipelines.quantiles import int_quantiles
    from python_prtree_ray.pipelines.windows import DAY_US

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    )

    def emit(cols, dt):
        if dt is None:
            return pa.table(
                {"k": pa.array([], pa.int64()), "days": pa.array([], pa.int64())}
            )
        return pa.table(
            {"k": np.zeros(dt.size, np.int64), "days": dt // DAY_US}
        )

    keyed = _bucketed(
        orders, "o_custkey", "o_orderdate", "o_orderkey", (), 256
    )
    gaps = _fold_pairs(keyed, (), emit)
    return int_quantiles(gaps, key_col="k", int_col="days")



def q_order_size_corr(sf):
    # Pearson correlation between order size (lineitem count) and
    # order value: ONE co-partitioned join, exact integer moments
    # folded in arbitrary precision, the num/√(vx·vy) double
    # expression shared with the SQL twin (IEEE sqrt is correctly
    # rounded — bitwise equal by construction)
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.merge import bucketed_sum

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey"]
    )

    def cnt_partial(tbl: pa.Table) -> pa.Table:
        k, n = np.unique(
            tbl.column("l_orderkey").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"l_orderkey": k, "n_items": n.astype(np.int64)})

    per_order = bucketed_sum(
        li.map_batches(
            cnt_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="l_orderkey",
        value_cols=("n_items",),
    )
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def oprep(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "cents": np.floor(
                    tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
                    * 100.0
                ).astype(np.int64),
            }
        )

    joined = hash_equi_join(
        per_order,
        orders.map_batches(oprep, batch_format="pyarrow", zero_copy_batch=True),
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=("n_items",),
        right_cols=("cents",),
    )

    def moments(tbl: pa.Table) -> pa.Table:
        x = tbl.column("n_items").to_numpy(zero_copy_only=False)
        y = tbl.column("cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([np.int64(x.size)], pa.int64()),
                "sx": pa.array([x.sum()], pa.int64()),
                "sy": pa.array([y.sum()], pa.int64()),
                "sxy": pa.array([(x * y).sum()], pa.int64()),
                "sxx": pa.array([(x * x).sum()], pa.int64()),
                "syy": pa.array([(y * y).sum()], pa.int64()),
            }
        )

    # batch_size bounds the per-batch Σy² partial inside int64
    # (cents² ≈ 2.5e15 per row); totals fold in Python bigints below
    parts = joined.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048
    )
    n = 0
    sx = sy = sxy = sxx = syy = 0
    for ref_ in parts.to_arrow_refs():
        t = ray.get(ref_)
        for r in range(t.num_rows):
            n += int(t.column("n")[r].as_py())
            sx += int(t.column("sx")[r].as_py())
            sy += int(t.column("sy")[r].as_py())
            sxy += int(t.column("sxy")[r].as_py())
            sxx += int(t.column("sxx")[r].as_py())
            syy += int(t.column("syy")[r].as_py())
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = (
        float(num)
        / np.sqrt(np.float64(float(vx)) * np.float64(float(vy)))
        if vx > 0 and vy > 0
        else None
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_orders": pa.array([n], pa.int64()),
                "num": pa.array([float(num)], pa.float64()),
                "var_x": pa.array([float(vx)], pa.float64()),
                "var_y": pa.array([float(vy)], pa.float64()),
                "r": pa.array([r], pa.float64()),
            }
        )
    )



def q_monthly_revenue(sf):
    # month-over-month revenue deltas: calendar-month truncation
    # (datetime64[M] == date_trunc), int-cents sums, single tiny
    # LAG fold over the month-sized series
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        ts = (
            tbl.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
        )
        mo = ts.astype("datetime64[M]").astype("datetime64[us]").astype(np.int64)
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.argsort(mo, kind="stable")
        m_s, c_s = mo[order], cents[order]
        starts = np.flatnonzero(np.r_[True, m_s[1:] != m_s[:-1]][: m_s.size])
        return pa.table(
            {
                "month_us": m_s[starts],
                "revenue_cents": np.add.reduceat(c_s, starts),
            }
        )

    summed = bucketed_sum(
        orders.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="month_us",
        value_cols=("revenue_cents",),
    )

    def add_k(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "k", pa.array(np.zeros(tbl.num_rows, np.int64))
        )

    def lag(group: pa.Table) -> pa.Table:
        m = group.column("month_us").to_numpy(zero_copy_only=False)
        v = group.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(m, kind="stable")
        m_s, v_s = m[order], v[order]
        return pa.table(
            {
                "month": pa.array(
                    m_s[1:].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "revenue_cents": v_s[1:],
                "prev_cents": v_s[:-1],
                "delta_cents": v_s[1:] - v_s[:-1],
            }
        )

    return (
        summed.map_batches(add_k, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(lag, batch_format="pyarrow")
        .select_columns(["month", "revenue_cents", "prev_cents", "delta_cents"])
    )



def q_lorenz_curve(sf):
    # Lorenz curve of spatial concentration at decile boundaries
    # (the curve behind tile_gini): tile-sized driver sort, exact
    # prefix sums, two divisions per row
    import pyarrow as pa
    import ray

    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id"])

    def geo(tbl):
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        p = derive.derive_points(eid)
        return pa.table({"px": p["px"], "py": p["py"]})

    pts = ev.map_batches(geo, batch_format="pyarrow", zero_copy_batch=True)
    return tiling.lorenz_curve(pts, res=TILE_RES)



def q_interval_union(sf):
    # per-user union length of overlapping 1h activity windows:
    # entity-bucket sweep, one row per key out, exact int64 µs
    import ray
    from python_prtree_ray.pipelines.interval import interval_union_len

    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "ts"]
    )
    return interval_union_len(ev, window_us=3_600_000_000)



def q_part_supplier_counts(sf):
    # TPC-H Q16 shape: COUNT(DISTINCT supplier) per surviving part
    # group. The part dimension filters down to a driver-side group
    # map (dim-sized, broadcast once via ray.put); lineitem probes it
    # per batch and emits DEDUPED (group<<32 | suppkey) int keys —
    # ONE coarse-bucket shuffle of ints carries the distinct set, a
    # second metadata-sized fold counts per group. Raw fact rows
    # never shuffle; suppkey < 2^32 is the packing contract.
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    part = ray.data.read_parquet(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )

    def dim_filter(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sz = tbl.column("p_size").to_numpy(zero_copy_only=False)
        keep_sz = np.isin(sz, np.array([1, 4, 9, 14, 19, 24, 29, 34]))
        keep_br = pc.not_equal(
            tbl.column("p_brand"), "Brand#13"
        ).to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(keep_sz & keep_br))

    dim_rows = part.map_batches(
        dim_filter, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    pk = np.array([r["p_partkey"] for r in dim_rows], np.int64)
    order = np.argsort(pk, kind="stable")
    pk = pk[order]
    brands = np.array([r["p_brand"] for r in dim_rows], object)[order]
    types = np.array([r["p_type"] for r in dim_rows], object)[order]
    sizes = np.array([r["p_size"] for r in dim_rows], np.int64)[order]
    # distinct suppliers count per (brand, type, size) GROUP, not per
    # part row — several partkeys can share one group
    combo = np.array(
        [f"{b}\x1f{t}\x1f{s}" for b, t, s in zip(brands, types, sizes)],
        object,
    )
    uniq_combo, part_gid = np.unique(combo, return_inverse=True)
    first_of_gid = np.zeros(uniq_combo.size, np.int64)
    seen = np.zeros(uniq_combo.size, bool)
    for i, g in enumerate(part_gid):
        if not seen[g]:
            seen[g] = True
            first_of_gid[g] = i
    ref_pk = ray.put((pk, part_gid.astype(np.int64)))

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def probe(tbl: pa.Table) -> pa.Table:
        keys, gid_of = ray.get(ref_pk)
        lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        ls = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, lp)
        pos[pos == keys.size] = 0
        hit = keys[pos] == lp
        k = np.unique((gid_of[pos[hit]] << 32) | ls[hit])
        return pa.table({"k": k, "one": np.ones(k.size, np.int64)})

    pairs = bucketed_sum(
        li.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True),
        key_col="k",
        value_cols=("one",),
        reduce="min",
    )

    def to_gid(tbl: pa.Table) -> pa.Table:
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {"gid": k >> 32, "n": np.ones(k.size, np.int64)}
        )

    counts = bucketed_sum(
        pairs.map_batches(to_gid, batch_format="pyarrow", zero_copy_batch=True),
        key_col="gid",
        value_cols=("n",),
    ).take_all()
    gid = np.array([r["gid"] for r in counts], np.int64)
    n = np.array([r["n"] for r in counts], np.int64)
    rep = first_of_gid[gid]
    return ray.data.from_arrow(
        pa.table(
            {
                "p_brand": pa.array(brands[rep], pa.string()),
                "p_type": pa.array(types[rep], pa.string()),
                "p_size": pa.array(sizes[rep], pa.int64()),
                "supplier_cnt": pa.array(n, pa.int64()),
            }
        )
    )



def q_bracket_revenue(sf):
    # TPC-H Q19 shape: disjunctive (brand, size-band, quantity-band)
    # revenue over lineitem × part. The part dim folds to three
    # sorted partkey arrays (one per bracket) broadcast once; each
    # lineitem batch evaluates all three brackets vectorized and
    # emits ONE exact-int partial row (cents × (100-discount_bp)),
    # driver-folded in Python bigints — order-independent at any
    # corpus size.
    import pyarrow as pa
    import ray

    BRACKETS = (
        ("Brand#12", 1, 5, 1.0, 11.0),
        ("Brand#23", 1, 10, 10.0, 20.0),
        ("Brand#3", 1, 15, 20.0, 30.0),
    )
    part = ray.data.read_parquet(
        f"{sf}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )

    def dim(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sz = tbl.column("p_size").to_numpy(zero_copy_only=False)
        out_k, out_b = [], []
        for bi, (brand, lo, hi, _, _) in enumerate(BRACKETS):
            m = (
                pc.equal(tbl.column("p_brand"), brand).to_numpy(
                    zero_copy_only=False
                )
                & (sz >= lo)
                & (sz <= hi)
            )
            out_k.append(
                tbl.column("p_partkey").to_numpy(zero_copy_only=False)[m]
            )
            out_b.append(np.full(int(m.sum()), bi, np.int64))
        return pa.table(
            {
                "pk": np.concatenate(out_k),
                "bracket": np.concatenate(out_b),
            }
        )

    dim_rows = part.map_batches(
        dim, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    per_bracket = []
    for bi in range(len(BRACKETS)):
        ks = np.sort(
            np.array(
                [r["pk"] for r in dim_rows if r["bracket"] == bi], np.int64
            )
        )
        per_bracket.append(ks)
    ref_br = ray.put(per_bracket)

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        brs = ray.get(ref_br)
        lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = tbl.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = tbl.column("l_discount").to_numpy(zero_copy_only=False)
        keep = np.zeros(lp.size, bool)
        for ks, (_, _, _, qlo, qhi) in zip(brs, BRACKETS):
            if ks.size == 0:
                continue
            pos = np.searchsorted(ks, lp)
            pos[pos == ks.size] = 0
            keep |= (ks[pos] == lp) & (qty >= qlo) & (qty <= qhi)
        cents = np.floor(ep[keep] * 100.0).astype(np.int64)
        bp = np.floor(disc[keep] * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "revenue_e4": pa.array(
                    [int(np.sum(cents * (100 - bp)))], pa.int64()
                ),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    rows = li.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    return ray.data.from_arrow(
        pa.table(
            {
                "revenue_e4": pa.array(
                    [sum(int(r["revenue_e4"]) for r in rows)], pa.int64()
                ),
                "n_items": pa.array(
                    [sum(int(r["n_items"]) for r in rows)], pa.int64()
                ),
            }
        )
    )



def q_returned_cust_revenue(sf):
    # TPC-H Q10 shape: top-20 customers by revenue from RETURNED
    # items among orders placed in one quarter. lineitem folds
    # map-side to (orderkey, revenue_e4) int partials, ONE
    # co-partitioned hash join attaches o_custkey (orders is big
    # at scale — never broadcast), ONE custkey bucket-sum, then
    # the map-side-pruned global top-20; only the 20 winning keys
    # ever touch the customer dim (filtered scan, not a join).
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.merge import (
        bucketed_sum,
        global_topk,
    )

    lo = int(
        np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    )
    hi = int(
        np.datetime64("1996-04-01").astype("datetime64[us]").astype(np.int64)
    )

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
        ],
    )

    def li_partial(tbl: pa.Table) -> pa.Table:
        m = _pc.equal(tbl.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        )
        ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[
            m
        ]
        bp = np.floor(
            tbl.column("l_discount").to_numpy(zero_copy_only=False)[m]
            * 100.0
            + 0.5
        ).astype(np.int64)
        rev = np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
        order = np.argsort(ok, kind="stable")
        ks, rs = ok[order], rev[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "l_orderkey": ks[starts],
                "revenue_e4": np.add.reduceat(rs, starts),
            }
        )

    rev = li.map_batches(
        li_partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    )

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def od_window(tbl: pa.Table) -> pa.Table:
        ts = (
            tbl.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = (ts >= lo) & (ts < hi)
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey").to_numpy(
                    zero_copy_only=False
                )[m],
                "o_custkey": tbl.column("o_custkey").to_numpy(
                    zero_copy_only=False
                )[m],
            }
        )

    odw = od.map_batches(
        od_window,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    )
    joined = hash_equi_join(
        rev,
        odw,
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=("revenue_e4",),
        right_cols=("o_custkey",),
    )
    per_cust = bucketed_sum(
        joined, key_col="o_custkey", value_cols=("revenue_e4",)
    )
    top = global_topk(
        per_cust, 20, id_col="o_custkey", value_col="revenue_e4"
    ).take_all()
    win_keys = np.sort(np.array([r["o_custkey"] for r in top], np.int64))
    ref_win = ray.put(win_keys)

    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )

    def pick(tbl: pa.Table) -> pa.Table:
        keys = ray.get(ref_win)
        ck = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
        m = _isin_sorted(keys, ck)
        return tbl.filter(pa.array(m))

    crows = {
        r["c_custkey"]: r
        for r in cust.map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    }
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nname = dict(
        zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
        )
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array(
                    [r["o_custkey"] for r in top], pa.int64()
                ),
                "c_name": pa.array(
                    [crows[r["o_custkey"]]["c_name"] for r in top]
                ),
                "revenue_e4": pa.array(
                    [int(r["revenue_e4"]) for r in top], pa.int64()
                ),
                "acctbal_cents": pa.array(
                    [
                        int(
                            np.floor(
                                crows[r["o_custkey"]]["c_acctbal"] * 100.0
                            )
                        )
                        for r in top
                    ],
                    pa.int64(),
                ),
                "n_name": pa.array(
                    [
                        nname[crows[r["o_custkey"]]["c_nationkey"]]
                        for r in top
                    ]
                ),
                "rank": pa.array(
                    [int(r["rank"]) for r in top], pa.int64()
                ),
            }
        )
    )



def q_top_supplier_qtr(sf):
    # TPC-H Q15 shape: the supplier(s) with MAX revenue over one
    # ship quarter, ties kept. Per-batch (suppkey, revenue_e4)
    # reduceat partials -> ONE suppkey bucket-sum -> the agg table
    # is supplier-cardinality (dim-sized metadata), so the max +
    # equality filter folds on the driver; names decode from the
    # supplier dim read once.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    lo = int(
        np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    )
    hi = int(
        np.datetime64("1996-04-01").astype("datetime64[us]").astype(np.int64)
    )
    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        ts = (
            tbl.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = (ts >= lo) & (ts < hi)
        sk = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)[m]
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[
            m
        ]
        bp = np.floor(
            tbl.column("l_discount").to_numpy(zero_copy_only=False)[m]
            * 100.0
            + 0.5
        ).astype(np.int64)
        rev = np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
        order = np.argsort(sk, kind="stable")
        ks, rs = sk[order], rev[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "l_suppkey": ks[starts],
                "total_revenue_e4": np.add.reduceat(rs, starts),
            }
        )

    agg = bucketed_sum(
        li.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="l_suppkey",
        value_cols=("total_revenue_e4",),
    ).take_all()
    best = max(int(r["total_revenue_e4"]) for r in agg)
    winners = sorted(
        (int(r["l_suppkey"]), int(r["total_revenue_e4"]))
        for r in agg
        if int(r["total_revenue_e4"]) == best
    )
    supp = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    sname = dict(
        zip(
            supp.column("s_suppkey").to_pylist(),
            supp.column("s_name").to_pylist(),
        )
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array([k for k, _ in winners], pa.int64()),
                "s_name": pa.array([sname[k] for k, _ in winners]),
                "total_revenue_e4": pa.array(
                    [v for _, v in winners], pa.int64()
                ),
            }
        )
    )



def q_nation_profit(sf):
    # TPC-H Q9 shape (sans partsupp — cost proxies at the part's
    # retail price): profit by supplier nation x ship year over
    # parts named '%blue%'. Both dims fold to sorted int arrays
    # broadcast once via ray.put; each lineitem batch reduces to
    # <= nations x years rows of exact-int partials (profit_e4 =
    # cents_ep*(100-bp) - retail_cents*qty*100), ONE tiny
    # composite-key bucket-sum — lineitem never shuffles.
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    part = pq.read_table(
        f"{sf}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    m = _pc.match_substring(part.column("p_name"), "blue").to_numpy(
        zero_copy_only=False
    )
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)[m]
    rc = np.floor(
        part.column("p_retailprice").to_numpy(zero_copy_only=False)[m]
        * 100.0
    ).astype(np.int64)
    order = np.argsort(pk, kind="stable")
    supp = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sn = supp.column("s_nationkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sorder = np.argsort(sk, kind="stable")
    ref = ray.put((pk[order], rc[order], sk[sorder], sn[sorder]))

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=[
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        bpk, brc, bsk, bsn = ray.get(ref)
        lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        hit = _isin_sorted(bpk, lp)
        if not hit.any():
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "profit_e4": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        retail = brc[np.searchsorted(bpk, lp[hit])]
        ls = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)[hit]
        nk = bsn[np.searchsorted(bsk, ls)]
        qty = (
            tbl.column("l_quantity")
            .to_numpy(zero_copy_only=False)[hit]
            .astype(np.int64)
        )
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)[
            hit
        ]
        bp = np.floor(
            tbl.column("l_discount").to_numpy(zero_copy_only=False)[hit]
            * 100.0
            + 0.5
        ).astype(np.int64)
        profit = (
            np.floor(ep * 100.0).astype(np.int64) * (100 - bp)
            - retail * qty * 100
        )
        year = (
            tbl.column("l_shipdate")
            .to_numpy(zero_copy_only=False)[hit]
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        key = nk * 10000 + year
        korder = np.argsort(key, kind="stable")
        ks, ps = key[korder], profit[korder]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table(
            {
                "key": ks[starts],
                "profit_e4": np.add.reduceat(ps, starts),
                "n_items": np.diff(
                    np.r_[starts, ks.shape[0]]
                ).astype(np.int64),
            }
        )

    summed = bucketed_sum(
        li.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="key",
        value_cols=("profit_e4", "n_items"),
    )
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nmap = dict(
        zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
        )
    )
    ref_n = ray.put(nmap)

    def decode(tbl: pa.Table) -> pa.Table:
        names = ray.get(ref_n)
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(
                    [names[int(k) // 10000] for k in key]
                ),
                "o_year": pa.array(key % 10000, pa.int64()),
                "profit_e4": tbl.column("profit_e4"),
                "n_items": tbl.column("n_items"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_priority_fill_rate(sf):
    # TPC-H Q4 shape: per order-priority, how many orders had ANY
    # line shipped within 30 days of ordering. lineitem folds
    # map-side to (orderkey, min_ship) int-min partials, ONE
    # co-partitioned hash join against orders (priorities recode to
    # int before the shuffle), then a priority-sized int rollup.
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.merge import bucketed_sum

    US_30D = 30 * 86_400_000_000

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_partial(tbl: pa.Table) -> pa.Table:
        ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
        ts = (
            tbl.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.lexsort((ts, ok))
        ks, ss = ok[order], ts[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        return pa.table({"l_orderkey": ks[starts], "ms": ss[starts]})

    min_ship = bucketed_sum(
        li.map_batches(
            li_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="l_orderkey",
        value_cols=("ms",),
        reduce="min",
    )

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def prio_stage(tbl: pa.Table) -> pa.Table:
        u = _pc.unique(tbl.column("o_orderpriority"))
        return pa.table({"p": u})

    prios = sorted(
        {
            r["p"]
            for r in od.map_batches(
                prio_stage, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        }
    )
    ref_p = ray.put(pa.array(prios, pa.string()))

    def od_code(tbl: pa.Table) -> pa.Table:
        parr = ray.get(ref_p)
        code = (
            _pc.index_in(tbl.column("o_orderpriority"), value_set=parr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "odate": pa.array(
                    tbl.column("o_orderdate")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
                "prio": pa.array(code, pa.int64()),
            }
        )

    odc = od.map_batches(
        od_code, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    joined = hash_equi_join(
        min_ship,
        odc,
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=("ms",),
        right_cols=("odate", "prio"),
    )

    def rollup(tbl: pa.Table) -> pa.Table:
        ms = tbl.column("ms").to_numpy(zero_copy_only=False)
        odate = tbl.column("odate").to_numpy(zero_copy_only=False)
        prio = tbl.column("prio").to_numpy(zero_copy_only=False)
        fast = (ms <= odate + US_30D).astype(np.int64)
        order = np.argsort(prio, kind="stable")
        ps, fs = prio[order], fast[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]][: ps.size])
        return pa.table(
            {
                "prio": ps[starts],
                "n_orders": np.diff(
                    np.r_[starts, ps.shape[0]]
                ).astype(np.int64),
                "n_fast": np.add.reduceat(fs, starts),
            }
        )

    summed = bucketed_sum(
        joined.map_batches(
            rollup,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="prio",
        value_cols=("n_orders", "n_fast"),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        parr = ray.get(ref_p)
        code = tbl.column("prio").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderpriority": parr.take(pa.array(code)),
                "n_orders": tbl.column("n_orders"),
                "n_fast": tbl.column("n_fast"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_sales_opportunity(sf):
    # TPC-H Q22 shape: per-nation count + balance of rich-but-idle
    # customers (above the positive-balance mean, no URGENT order —
    # the synthetic orders table covers every custkey, so the
    # anti-join gates on the urgent subset to stay non-degenerate).
    # The mean threshold is exact: per-batch int cent partials fold
    # on the driver, and the filter compares cents*n > total (pure
    # BIGINT on both sides — no float mean). The never-urgent set
    # comes from the distinct-o_custkey fold (ONE int-pair shuffle),
    # broadcast sorted for a vectorized anti-probe of the dim.
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def pos_partial(tbl: pa.Table) -> pa.Table:
        bal = tbl.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal[bal > 0.0] * 100.0).astype(np.int64)
        return pa.table(
            {
                "s": pa.array([int(cents.sum())], pa.int64()),
                "n": pa.array([cents.size], pa.int64()),
            }
        )

    parts = cust.map_batches(
        pos_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    total = sum(int(r["s"]) for r in parts)
    n_pos = sum(int(r["n"]) for r in parts)

    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def distinct_cust(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urgent = pc.equal(
            tbl.column("o_orderpriority"), "1-URGENT"
        ).to_numpy(zero_copy_only=False)
        k = np.unique(
            tbl.column("o_custkey").to_numpy(zero_copy_only=False)[urgent]
        )
        return pa.table({"k": k, "one": np.ones(k.size, np.int64)})

    keys = bucketed_sum(
        orders.map_batches(
            distinct_cust, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="k",
        value_cols=("one",),
        reduce="min",
    )
    have = []
    for ref in keys.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            have.append(t.column("k").to_numpy(zero_copy_only=False))
    have_sorted = (
        np.sort(np.concatenate(have)) if have else np.zeros(0, np.int64)
    )
    ref_have = ray.put(have_sorted)

    def nation_partial(tbl: pa.Table) -> pa.Table:
        ordered = ray.get(ref_have)
        ck = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = tbl.column("c_nationkey").to_numpy(zero_copy_only=False)
        bal = tbl.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0).astype(np.int64)
        rich = cents * n_pos > total
        pos = np.searchsorted(ordered, ck)
        pos[pos == ordered.size] = 0 if ordered.size else 0
        never = (
            ordered[pos] != ck if ordered.size else np.ones(ck.size, bool)
        )
        m = rich & never
        nk_m, cents_m = nk[m].astype(np.int64), cents[m]
        o = np.argsort(nk_m, kind="stable")
        nk_s, c_s = nk_m[o], cents_m[o]
        starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]][: nk_s.size])
        if nk_s.size == 0:
            starts = np.zeros(0, np.int64)
        return pa.table(
            {
                "c_nationkey": pa.array(nk_s[starts], pa.int64()),
                "numcust": pa.array(
                    np.diff(np.r_[starts, nk_s.size]), pa.int64()
                ),
                "totacctbal_cents": pa.array(
                    np.add.reduceat(c_s, starts)
                    if nk_s.size
                    else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    partials = cust.map_batches(
        nation_partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    )
    return bucketed_sum(
        partials,
        key_col="c_nationkey",
        value_cols=("numcust", "totacctbal_cents"),
        n_buckets=32,
    )



def q_market_share(sf):
    # TPC-H Q8 shape: of the revenue ASIA-region customers ordered,
    # the share supplied by NATION_2 suppliers, per order year.
    # customer/nation/region and supplier nationkeys fold to sorted
    # int arrays broadcast ONCE via ray.put; orders gate + carry
    # o_year map-side; ONE co-partitioned big-big lineitem=orders
    # shuffle (pipelines/join.py); the joined stream combines to
    # <= years x 2 exact-int partials per batch. Share = one
    # int64->double division per year row (bitwise vs SQL CAST).
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.pipelines.join import hash_equi_join
    from python_prtree_ray.pipelines.merge import bucketed_sum

    reg = pq.read_table(f"{sf}/region.parquet")
    rkey = reg.column("r_regionkey").to_pylist()[
        reg.column("r_name").to_pylist().index("ASIA")
    ]
    nat = pq.read_table(
        f"{sf}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    asia_nations = set(
        k
        for k, r in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
        if r == rkey
    )
    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
    asia_cust = np.sort(ck[np.isin(cn, np.array(sorted(asia_nations)))])
    supp = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sn = supp.column("s_nationkey").to_numpy(zero_copy_only=False)
    target_supp = np.sort(sk[sn == 2])
    ref = ray.put((asia_cust, target_supp))

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def gate_orders(tbl: pa.Table) -> pa.Table:
        ac, _ = ray.get(ref)
        oc = tbl.column("o_custkey").to_numpy(zero_copy_only=False)
        hit = _isin_sorted(ac, oc)
        year = (
            tbl.column("o_orderdate")
            .to_numpy(zero_copy_only=False)[hit]
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey")
                .to_numpy(zero_copy_only=False)[hit]
                .astype(np.int64),
                "o_year": year,
            }
        )

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(tbl: pa.Table) -> pa.Table:
        ep = tbl.column("l_extendedprice").to_numpy(zero_copy_only=False)
        bp = np.floor(
            tbl.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "l_suppkey": tbl.column("l_suppkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "rev_e4": np.floor(ep * 100.0).astype(np.int64)
                * (100 - bp),
            }
        )

    joined = hash_equi_join(
        li.map_batches(
            li_prep, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ),
        od.map_batches(
            gate_orders, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ),
        on="l_orderkey", right_on="o_orderkey",
        left_cols=("l_suppkey", "rev_e4"),
        right_cols=("o_year",),
    )

    def partial(tbl: pa.Table) -> pa.Table:
        _, ts = ray.get(ref)
        year = tbl.column("o_year").to_numpy(zero_copy_only=False)
        rev = tbl.column("rev_e4").to_numpy(zero_copy_only=False)
        ls = tbl.column("l_suppkey").to_numpy(zero_copy_only=False)
        is_t = _isin_sorted(ts, ls)
        order = np.argsort(year, kind="stable")
        ys, rs, ms = year[order], rev[order], is_t[order]
        starts = np.flatnonzero(np.r_[True, ys[1:] != ys[:-1]][: ys.size])
        return pa.table(
            {
                "o_year": ys[starts],
                "nation_rev_e4": np.add.reduceat(
                    np.where(ms, rs, np.int64(0)), starts
                ),
                "total_rev_e4": np.add.reduceat(rs, starts),
            }
        )

    summed = bucketed_sum(
        joined.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ),
        key_col="o_year",
        value_cols=("nation_rev_e4", "total_rev_e4"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        num = tbl.column("nation_rev_e4").to_numpy(zero_copy_only=False)
        den = tbl.column("total_rev_e4").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_year": tbl.column("o_year"),
                "nation_rev_e4": pa.array(num, pa.int64()),
                "total_rev_e4": pa.array(den, pa.int64()),
                "mkt_share": pa.array(
                    num.astype(np.float64) / den.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_excess_parts(sf):
    # TPC-H Q20 shape (sans partsupp — "excess share" is measured
    # against the part's own per-supplier mean): suppliers that
    # moved > 1.5x the average supplier's quantity of some '%red%'
    # part, with the count of such parts. The part filter broadcasts
    # once; lineitem folds per batch to (pk, sk, qty) partials; ONE
    # partkey-bucket shuffle co-locates each part's pair sums with
    # its total (division-free test 2*q*ns > 3*tq in exact int64);
    # the survivor fold is a supplier-sized bucket sum.
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum

    part = pq.read_table(
        f"{sf}/part.parquet", columns=["p_partkey", "p_name"]
    )
    m = _pc.match_substring(part.column("p_name"), "red").to_numpy(
        zero_copy_only=False
    )
    red = np.sort(
        part.column("p_partkey").to_numpy(zero_copy_only=False)[m]
    ).astype(np.int64)
    ref = ray.put(red)

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        bp = ray.get(ref)
        lp = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        hit = _isin_sorted(bp, lp)
        pk = lp[hit].astype(np.int64)
        sk = (
            tbl.column("l_suppkey")
            .to_numpy(zero_copy_only=False)[hit]
            .astype(np.int64)
        )
        q = (
            tbl.column("l_quantity")
            .to_numpy(zero_copy_only=False)[hit]
            .astype(np.int64)
        )
        order = np.lexsort((sk, pk))
        pk, sk, q = pk[order], sk[order], q[order]
        starts = np.flatnonzero(
            np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])][: pk.size]
        )
        pk, sk = pk[starts], sk[starts]
        return pa.table(
            {
                "kb": bucket_of(pk, 512),
                "pk": pk,
                "sk": sk,
                "q": np.add.reduceat(q, starts)
                if q.size
                else np.empty(0, np.int64),
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        pk = group.column("pk").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "n_parts": pa.array([], pa.int64()),
            }
        )
        if pk.size == 0:
            return empty
        sk = group.column("sk").to_numpy(zero_copy_only=False)
        q = group.column("q").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk))
        pk, sk, q = pk[order], sk[order], q[order]
        pstarts = np.flatnonzero(
            np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])][: pk.size]
        )
        pk, sk = pk[pstarts], sk[pstarts]
        q = np.add.reduceat(q, pstarts)
        tstarts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]][: pk.size])
        grp = np.cumsum(np.r_[False, pk[1:] != pk[:-1]])
        tq = np.add.reduceat(q, tstarts)
        ns = np.diff(np.r_[tstarts, pk.size]).astype(np.int64)
        win = 2 * q * ns[grp] > 3 * tq[grp]
        if not win.any():
            return empty
        wsk = np.sort(sk[win])
        sstarts = np.flatnonzero(np.r_[True, wsk[1:] != wsk[:-1]][: wsk.size])
        return pa.table(
            {
                "s_suppkey": wsk[sstarts],
                "n_parts": np.diff(np.r_[sstarts, wsk.size]).astype(
                    np.int64
                ),
            }
        )

    survivors = (
        li.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .groupby("kb")
        .map_groups(per_part, batch_format="pyarrow")
    )
    summed = bucketed_sum(
        survivors, key_col="s_suppkey", value_cols=("n_parts",)
    )
    names = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    nmap = dict(
        zip(
            names.column("s_suppkey").to_pylist(),
            names.column("s_name").to_pylist(),
        )
    )
    ref_n = ray.put(nmap)

    def decode(tbl: pa.Table) -> pa.Table:
        nm = ray.get(ref_n)
        keys = tbl.column("s_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "s_name": pa.array([nm[int(k)] for k in keys]),
                "n_parts": tbl.column("n_parts"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_waiting_suppliers(sf):
    # TPC-H Q21 shape (late := shipped > 60 days after the order
    # date): on multi-supplier orders where EXACTLY ONE supplier
    # shipped late, count blamed orders per supplier. Both sides
    # are big -> ONE co-partitioned orderkey-bucket shuffle carries
    # (orderkey, suppkey, ship_us) + (orderkey, order_us); the
    # in-bucket fold joins via searchsorted, collapses to distinct
    # (order, supplier, any-late) pairs, applies the exactly-one
    # rule, and emits supplier-count partials.
    import pyarrow as pa
    import ray
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum

    LATE_US = np.int64(60) * 86400 * 1000000

    li = ray.data.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    od = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def li_prep(tbl: pa.Table) -> pa.Table:
        ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "kb": bucket_of(ok, 512),
                "ok": ok,
                "sk": tbl.column("l_suppkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "t": tbl.column("l_shipdate")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "side": np.zeros(ok.size, np.int8),
            }
        )

    def od_prep(tbl: pa.Table) -> pa.Table:
        ok = tbl.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "kb": bucket_of(ok, 512),
                "ok": ok,
                "sk": np.zeros(ok.size, np.int64),
                "t": tbl.column("o_orderdate")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "side": np.ones(ok.size, np.int8),
            }
        )

    tagged = li.map_batches(
        li_prep, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    ).union(
        od.map_batches(
            od_prep, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
    )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
        side = group.column("side").to_numpy(zero_copy_only=False)
        ok = group.column("ok").to_numpy(zero_copy_only=False)
        sk = group.column("sk").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        is_o = side == 1
        ook = ok[is_o]
        oord = np.argsort(ook, kind="stable")
        ook_s, ot_s = ook[oord], t[is_o][oord]
        lok, lsk, lt = ok[~is_o], sk[~is_o], t[~is_o]
        if lok.size == 0 or ook_s.size == 0:
            return empty
        pos = np.searchsorted(ook_s, lok)
        # inner join: every lineitem's order exists (FK), but stay
        # defensive about partial buckets
        okm = (pos < ook_s.size) & (
            ook_s[np.minimum(pos, ook_s.size - 1)] == lok
        )
        lok, lsk, lt = lok[okm], lsk[okm], lt[okm]
        if lok.size == 0:
            return empty
        late = (
            lt > ot_s[np.searchsorted(ook_s, lok)] + LATE_US
        ).astype(np.int64)
        order = np.lexsort((lsk, lok))
        lok, lsk, late = lok[order], lsk[order], late[order]
        pstarts = np.flatnonzero(
            np.r_[True, (lok[1:] != lok[:-1]) | (lsk[1:] != lsk[:-1])][: lok.size]
        )
        pok, psk = lok[pstarts], lsk[pstarts]
        plate = np.maximum.reduceat(late, pstarts)
        ostarts = np.flatnonzero(np.r_[True, pok[1:] != pok[:-1]][: pok.size])
        n_supp = np.diff(np.r_[ostarts, pok.size]).astype(np.int64)
        n_late = np.add.reduceat(plate, ostarts)
        blamed = (n_supp >= 2) & (n_late == 1)
        if not blamed.any():
            return empty
        # the single late pair inside each blamed order: argmax of
        # plate within the order segment (exactly one 1 by the rule)
        grp = np.cumsum(np.r_[False, pok[1:] != pok[:-1]])
        late_sk = psk[plate == 1]
        late_ok_grp = grp[plate == 1]
        want = late_sk[blamed[late_ok_grp]]
        wsk = np.sort(want)
        sstarts = np.flatnonzero(np.r_[True, wsk[1:] != wsk[:-1]][: wsk.size])
        return pa.table(
            {
                "s_suppkey": wsk[sstarts],
                "n_orders": np.diff(np.r_[sstarts, wsk.size]).astype(
                    np.int64
                ),
            }
        )

    partials = tagged.groupby("kb").map_groups(
        fold, batch_format="pyarrow"
    )
    summed = bucketed_sum(
        partials, key_col="s_suppkey", value_cols=("n_orders",)
    )
    import pyarrow.parquet as pq

    names = pq.read_table(
        f"{sf}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    nmap = dict(
        zip(
            names.column("s_suppkey").to_pylist(),
            names.column("s_name").to_pylist(),
        )
    )
    ref_n = ray.put(nmap)

    def decode(tbl: pa.Table) -> pa.Table:
        nm = ray.get(ref_n)
        keys = tbl.column("s_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "s_name": pa.array([nm[int(k)] for k in keys]),
                "n_orders": tbl.column("n_orders"),
            }
        )

    return summed.map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )



def q_acctbal_deciles(sf):
    # NTILE(10) per nation over (acctbal, custkey) — deterministic
    # tie-break; per-nation vectorized tiling inside map_groups,
    # exact-int cents sums per decile
    import pyarrow as pa
    import ray

    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet",
        columns=["c_nationkey", "c_custkey", "c_acctbal"],
    )

    def tile(group: pa.Table) -> pa.Table:
        bal = group.column("c_acctbal").to_numpy(zero_copy_only=False)
        ck = group.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = group.column("c_nationkey").to_numpy(zero_copy_only=False)
        if bal.size == 0:
            return pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "decile": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "acctbal_c": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ck, bal))
        n = bal.size
        k = 10
        # NTILE sizing: first n%k tiles get ceil(n/k) rows
        base, extra = divmod(n, k)
        sizes = np.full(min(k, n), base, np.int64)
        sizes[:extra] += 1
        sizes = sizes[sizes > 0]
        cents = np.floor(bal[order] * 100.0).astype(np.int64)
        starts = np.r_[0, np.cumsum(sizes)[:-1]]
        return pa.table(
            {
                "n_nationkey": pa.array(
                    np.full(sizes.size, int(nk[0]), np.int64)
                ),
                "decile": np.arange(1, sizes.size + 1, dtype=np.int64),
                "n_customers": sizes,
                "acctbal_c": np.add.reduceat(cents, starts),
            }
        )

    return cust.groupby("c_nationkey").map_groups(
        tile, batch_format="pyarrow"
    )



def q_cube_revenue(sf):
    # OLAP ROLLUP(priority, year) over orders in ONE fact-table
    # pass: per-batch exact-int partials keyed by the packed
    # (priority-code, year) pair; the finest-level aggregate is
    # metadata-sized (5 priorities x ~7 years), so the coarser
    # rollup levels are derived from it driver-side without a
    # second scan or shuffle. Revenue stays int cents end to end.
    import pyarrow as pa
    import ray

    od = ray.data.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        d = tbl.column("o_orderpriority").combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cats = d.dictionary.to_pylist()
        year = (
            tbl.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        cents = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        key = codes * 4096 + (year - 1900)
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=uk.size).astype(np.int64)
        rc = np.zeros(uk.size, np.int64)
        np.add.at(rc, inv, cents)
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [cats[int(k) // 4096] for k in uk], pa.string()
                ),
                "o_year": uk % 4096 + 1900,
                "n_orders": n,
                "revenue_c": rc,
            }
        )

    rows = od.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    agg: dict[tuple[str | None, int | None], list[int]] = {}
    for r in rows:
        for k in (
            (r["o_orderpriority"], int(r["o_year"])),  # finest
            (r["o_orderpriority"], None),  # per-priority subtotal
            (None, None),  # grand total
        ):
            a = agg.setdefault(k, [0, 0])
            a[0] += int(r["n_orders"])
            a[1] += int(r["revenue_c"])
    keys = sorted(agg, key=lambda k: (k[0] is None, k[0] or "", k[1] is None, k[1] or 0))
    return ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array(
                    [k[0] for k in keys], pa.string()
                ),
                "o_year": pa.array(
                    [k[1] for k in keys], pa.int64()
                ),
                "n_orders": pa.array(
                    [agg[k][0] for k in keys], pa.int64()
                ),
                "revenue_c": pa.array(
                    [agg[k][1] for k in keys], pa.int64()
                ),
            }
        )
    )



def q_custkey_setops(sf):
    # key-set algebra across fact tables: every customer classified
    # as appearing in orders only / events only / both / neither.
    # The two distinct-key sets are CUSTOMER-DIMENSION-sized (TPC-H
    # invariant: custkeys are the small side), so they fold to
    # sorted arrays broadcast ONCE via ray.put — the same
    # broadcast-semi-join shape as orders_semi_bloom; the customer
    # scan then emits 4 int counters per batch.
    import pyarrow as pa
    import ray

    def distinct_keys(path: str, col: str) -> np.ndarray:
        ds_ = ray.data.read_parquet(path, columns=[col])

        def uniq(tbl: pa.Table) -> pa.Table:
            v = np.unique(
                tbl.column(col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table({"k": v})

        parts = ds_.map_batches(
            uniq,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65536,
        ).take_all()
        if not parts:
            return np.zeros(0, np.int64)
        return np.unique(np.array([r["k"] for r in parts], np.int64))

    ok = distinct_keys(f"{sf}/orders.parquet", "o_custkey")
    ek = distinct_keys(f"{sf}/events.parquet", "user_id")
    ref = ray.put((ok, ek))
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey"]
    )

    def classify(tbl: pa.Table) -> pa.Table:
        o, e = ray.get(ref)
        ck = (
            tbl.column("c_custkey")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        in_o = _isin_sorted(o, ck)
        in_e = _isin_sorted(e, ck)
        counts = np.array(
            [
                int((in_o & in_e).sum()),
                int((in_o & ~in_e).sum()),
                int((~in_o & in_e).sum()),
                int((~in_o & ~in_e).sum()),
            ],
            np.int64,
        )
        return pa.table(
            {
                "category": pa.array(
                    ["both", "orders_only", "events_only", "neither"],
                    pa.string(),
                ),
                "n_customers": counts,
            }
        )

    rows = cust.map_batches(
        classify,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    agg = {"both": 0, "orders_only": 0, "events_only": 0, "neither": 0}
    for r in rows:
        agg[r["category"]] += int(r["n_customers"])
    cats = sorted(k for k, v in agg.items() if v > 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "category": pa.array(cats, pa.string()),
                "n_customers": pa.array(
                    [agg[c] for c in cats], pa.int64()
                ),
            }
        )
    )


QUERIES = {
    "asof_purchase_view": q_asof_purchase_view,
    "region_rollup": q_region_rollup,
    "pricing_summary": q_pricing_summary,
    "interval_join": q_interval_join,
    "lineitem_orders": q_lineitem_orders,
    "orders_cust_left": q_orders_cust_left,
    "orders_cust_outer": q_orders_cust_outer,
    "orders_with_returns": q_orders_with_returns,
    "orders_semi_bloom": q_orders_semi_bloom,
    "orders_no_returns": q_orders_no_returns,
    "q3_revenue": q_q3_revenue,
    "local_supplier_volume": q_local_supplier_volume,
    "co_purchase_parts": q_co_purchase_parts,
    "lapsed_customers": q_lapsed_customers,
    "returns_revenue_share": q_returns_revenue_share,
    "above_avg_orders": q_above_avg_orders,
    "supplier_reach_hist": q_supplier_reach_hist,
    "nation_share": q_nation_share,
    "pareto_users": q_pareto_users,
    "region_count_curve": q_region_count_curve,
    "recency_hist": q_recency_hist,
    "cust_order_histogram": q_cust_order_histogram,
    "part_best_supplier": q_part_best_supplier,
    "ship_delay_quantiles": q_ship_delay_quantiles,
    "top_revenue": q_top_revenue,
    "discount_revenue": q_discount_revenue,
    "benford_hist": q_benford_hist,
    "nation_trade_pairs": q_nation_trade_pairs,
    "segment_order_dist": q_segment_order_dist,
    "small_qty_revenue": q_small_qty_revenue,
    "large_orders": q_large_orders,
    "promo_revenue": q_promo_revenue,
    "cents_mod_hist": q_cents_mod_hist,
    "region_monthly_revenue": q_region_monthly_revenue,
    "nation_balance": q_nation_balance,
    "brand_revenue": q_brand_revenue,
    "reorder_gap_quantiles": q_reorder_gap_quantiles,
    "order_size_corr": q_order_size_corr,
    "monthly_revenue": q_monthly_revenue,
    "lorenz_curve": q_lorenz_curve,
    "interval_union": q_interval_union,
    "part_supplier_counts": q_part_supplier_counts,
    "bracket_revenue": q_bracket_revenue,
    "returned_cust_revenue": q_returned_cust_revenue,
    "top_supplier_qtr": q_top_supplier_qtr,
    "nation_profit": q_nation_profit,
    "priority_fill_rate": q_priority_fill_rate,
    "sales_opportunity": q_sales_opportunity,
    "market_share": q_market_share,
    "excess_parts": q_excess_parts,
    "waiting_suppliers": q_waiting_suppliers,
    "acctbal_deciles": q_acctbal_deciles,
    "cube_revenue": q_cube_revenue,
    "custkey_setops": q_custkey_setops,
}

SQL = {
    "asof_purchase_view": asof_sql,
    "region_rollup": region_rollup_sql,
    "pricing_summary": pricing_summary_sql,
    "interval_join": interval_join_sql,
    "lineitem_orders": (
        "SELECT l_orderkey, l_linenumber, l_quantity, o_custkey "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
    "orders_cust_left": (
        "SELECT o.o_custkey, o.o_orderkey, COALESCE(c.c_name, '') AS cname "
        "FROM orders o LEFT JOIN "
        "(SELECT c_custkey, c_name FROM customer "
        " WHERE c_mktsegment = 'BUILDING') c "
        "ON o.o_custkey = c.c_custkey"
    ),
    "orders_cust_outer": (
        "SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, "
        "COALESCE(o.o_orderkey, -1) AS o_orderkey, "
        "COALESCE(c.c_name, '') AS cname "
        "FROM (SELECT o_orderkey, o_custkey FROM orders "
        "      WHERE o_orderkey % 3 = 0) o "
        "FULL JOIN (SELECT c_custkey, c_name FROM customer "
        "           WHERE c_mktsegment = 'BUILDING') c "
        "ON o.o_custkey = c.c_custkey"
    ),
    "orders_with_returns": (
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey IN "
        "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
    ),
    "orders_no_returns": (
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey NOT IN "
        "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
    ),
    "orders_semi_bloom": (
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey IN "
        "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
    ),
    "q3_revenue": (
        "SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice * "
        "(1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_custkey IN "
        " (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) "
        "GROUP BY l_orderkey"
    ),
    "supplier_reach_hist": (
        "WITH d AS (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem),"
        " r AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM d GROUP BY l_suppkey) "
        "SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_suppliers "
        "FROM r GROUP BY n_orders"
    ),
    "above_avg_orders": (
        "WITH o AS (SELECT o_orderkey, o_custkey, "
        "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents FROM orders), "
        "c AS (SELECT o_custkey AS k, CAST(SUM(cents) AS BIGINT) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1) "
        "SELECT o_orderkey, o_custkey, cents FROM o JOIN c "
        "ON o_custkey = c.k WHERE cents * c.n > c.s"
    ),
    "returns_revenue_share": (
        "WITH l AS (SELECT s_nationkey, "
        "CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)"
        " AS cents, l_returnflag = 'R' AS ret "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey), "
        "t AS (SELECT s_nationkey, CAST(SUM(cents) AS BIGINT) AS "
        "revenue_cents, CAST(SUM(CASE WHEN ret THEN cents ELSE 0 END) "
        "AS BIGINT) AS returned_cents FROM l GROUP BY s_nationkey) "
        "SELECT n_name, revenue_cents, returned_cents, "
        "CAST(returned_cents AS DOUBLE) / CAST(revenue_cents AS DOUBLE) "
        "AS returned_share FROM t JOIN nation ON n_nationkey = s_nationkey"
    ),
    "cust_order_histogram": (
        "WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY o_custkey) "
        "SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers "
        "FROM c GROUP BY n_orders"
    ),
    "lapsed_customers": (
        "WITH m AS (SELECT MAX(epoch_us(o_orderdate)) AS hi FROM orders) "
        "SELECT c_custkey, c_name FROM customer, m WHERE c_custkey NOT IN"
        " (SELECT o_custkey FROM orders, m WHERE epoch_us(o_orderdate)"
        " >= m.hi - 365 * 86400000000)"
    ),
    "co_purchase_parts": (
        "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING COUNT(*) >= 2"
    ),
    "local_supplier_volume": (
        "SELECT n_name, CAST(SUM(CAST(FLOOR(l_extendedprice * "
        "(1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE c_nationkey = s_nationkey "
        "GROUP BY n_name"
    ),
    "part_best_supplier": (
        "WITH l AS (SELECT l_partkey, l_suppkey, "
        "CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents "
        "FROM lineitem), "
        "r AS (SELECT l_partkey, l_suppkey, cents, ROW_NUMBER() OVER "
        "(PARTITION BY l_partkey ORDER BY cents, l_suppkey) AS rn FROM l) "
        "SELECT l_partkey, l_suppkey, cents FROM r WHERE rn = 1"
    ),
    "ship_delay_quantiles": (
        "WITH d AS (SELECT "
        "CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS prio, "
        "(epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 "
        "AS days FROM lineitem JOIN orders ON l_orderkey = o_orderkey) "
        "SELECT prio, quantile_cont(days, 0.5) AS p50, "
        "quantile_cont(days, 0.9) AS p90, "
        "quantile_cont(days, 0.99) AS p99 FROM d GROUP BY prio"
    ),
    "top_revenue": (
        "WITH rev AS ("
        " SELECT l_orderkey, CAST(SUM(CAST(FLOOR(l_extendedprice * "
        " (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
        " FROM lineitem WHERE l_orderkey IN "
        " (SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) "
        " GROUP BY l_orderkey) "
        "SELECT l_orderkey, revenue_cents, "
        "CAST(ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, l_orderkey) "
        "AS BIGINT) AS \"rank\" "
        "FROM rev ORDER BY \"rank\" LIMIT 100"
    ),
    "recency_hist": (
        "WITH l AS (SELECT user_id, MAX(epoch_us(ts) // 86400000000)"
        " AS last_day FROM events GROUP BY user_id), "
        "e AS (SELECT MAX(last_day) AS endd FROM l) "
        "SELECT e.endd - l.last_day AS recency_days, "
        "CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM l, e GROUP BY 1"
    ),
    "region_count_curve": _region_count_curve_sql(
        "SELECT px * px AS px, py * py AS py FROM ("
        + derive.points_sql("events", "event_id", "event_id")
        + ")",
        TILE_RES,
        (8, 16, 32),
    ),
    "pareto_users": (
        "WITH c AS (SELECT user_id, CAST(SUM(CAST(FLOOR(value * 100.0)"
        " AS BIGINT)) AS BIGINT) AS x FROM events GROUP BY user_id), "
        "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, user_id)"
        " AS rn FROM c), "
        "s AS (SELECT rn, SUM(x) OVER (ORDER BY rn) AS cum FROM r), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS total FROM c) "
        "SELECT tot.n AS n_users, tot.total AS total_cents, "
        "CAST(MIN(s.rn) AS BIGINT) AS k80, "
        "CAST(MIN(s.rn) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS share "
        "FROM s, tot WHERE 5 * s.cum >= 4 * tot.total "
        "GROUP BY tot.n, tot.total"
    ),
    "nation_share": (
        "WITH t AS (SELECT c_nationkey, CAST(SUM(CAST(FLOOR("
        "o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_nationkey), "
        "r AS (SELECT n_regionkey, CAST(SUM(revenue_cents) AS BIGINT)"
        " AS region_cents FROM t JOIN nation ON n_nationkey = c_nationkey"
        " GROUP BY n_regionkey) "
        "SELECT r_name, n_name, t.revenue_cents, r.region_cents, "
        "CAST(t.revenue_cents AS DOUBLE) / CAST(r.region_cents AS DOUBLE)"
        " AS share "
        "FROM t JOIN nation ON n_nationkey = c_nationkey "
        "JOIN r ON r.n_regionkey = nation.n_regionkey "
        "JOIN region ON r_regionkey = nation.n_regionkey"
    ),
    "lorenz_curve": _lorenz_curve_sql(
        derive.points_sql("events", "event_id", "event_id"), TILE_RES
    ),
    "monthly_revenue": (
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        " AS revenue_cents FROM orders GROUP BY 1), "
        "l AS (SELECT month, revenue_cents, "
        "LAG(revenue_cents) OVER (ORDER BY month) AS prev_cents FROM m) "
        "SELECT CAST(month AS TIMESTAMP) AS month, revenue_cents, "
        "prev_cents, revenue_cents - prev_cents AS delta_cents "
        "FROM l WHERE prev_cents IS NOT NULL"
    ),
    "cents_mod_hist": (
        "WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)"
        " % 100 AS cents_mod FROM orders) "
        "SELECT cents_mod, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM c GROUP BY cents_mod"
    ),
    "region_monthly_revenue": (
        "SELECT r_name, CAST(date_trunc('month', o_orderdate) AS "
        "TIMESTAMP) AS month, CAST(SUM(CAST(FLOOR(o_totalprice * 100.0)"
        " AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON n_nationkey = c_nationkey "
        "JOIN region ON r_regionkey = n_regionkey "
        "GROUP BY 1, 2"
    ),
    "acctbal_deciles": (
        "WITH r AS (SELECT c_nationkey, "
        "CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents, "
        "NTILE(10) OVER (PARTITION BY c_nationkey "
        "ORDER BY c_acctbal, c_custkey) AS d FROM customer) "
        "SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey, "
        "CAST(d AS BIGINT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "CAST(SUM(cents) AS BIGINT) AS acctbal_c "
        "FROM r GROUP BY 1, 2"
    ),
    "cube_revenue": (
        "SELECT o_orderpriority, "
        "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        " AS revenue_c "
        "FROM orders GROUP BY ROLLUP(o_orderpriority, o_year)"
    ),
    "custkey_setops": (
        "WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders), "
        "e AS (SELECT DISTINCT user_id AS k FROM events) "
        "SELECT CASE "
        "WHEN o.k IS NOT NULL AND e.k IS NOT NULL THEN 'both' "
        "WHEN o.k IS NOT NULL THEN 'orders_only' "
        "WHEN e.k IS NOT NULL THEN 'events_only' "
        "ELSE 'neither' END AS category, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers "
        "FROM customer LEFT JOIN o ON o.k = c_custkey "
        "LEFT JOIN e ON e.k = c_custkey GROUP BY 1"
    ),
    "nation_balance": (
        "WITH c AS (SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS"
        " nc FROM customer GROUP BY 1), "
        "s AS (SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS ns "
        "FROM supplier GROUP BY 1) "
        "SELECT n_name, COALESCE(c.nc, 0) AS n_customers, "
        "COALESCE(s.ns, 0) AS n_suppliers, "
        "CAST(COALESCE(c.nc, 0) AS DOUBLE) / "
        "CAST(COALESCE(s.ns, 0) AS DOUBLE) AS cust_per_supplier "
        "FROM nation LEFT JOIN c ON c.k = n_nationkey "
        "LEFT JOIN s ON s.k = n_nationkey "
        "WHERE c.nc IS NOT NULL OR s.ns IS NOT NULL"
    ),
    "benford_hist": (
        "SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100.0) "
        "AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1"
    ),
    "discount_revenue": (
        "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) "
        "* CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS revenue_e4, CAST(COUNT(*) AS BIGINT) AS n_items "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) "
        "BETWEEN 2 AND 6 AND l_quantity < 24.0"
    ),
    "nation_trade_pairs": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS year, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS revenue_e4 "
        "FROM lineitem "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation sn ON sn.n_nationkey = supplier.s_nationkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation cn ON cn.n_nationkey = customer.c_nationkey "
        "WHERE sn.n_nationkey <> cn.n_nationkey "
        "GROUP BY 1, 2, 3"
    ),
    "segment_order_dist": (
        "WITH c AS (SELECT c_mktsegment, c_custkey, "
        "CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders "
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
        "GROUP BY 1, 2) "
        "SELECT c_mktsegment, n_orders, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers "
        "FROM c GROUP BY 1, 2"
    ),
    "small_qty_revenue": (
        "WITH l AS (SELECT l_partkey, "
        "CAST(FLOOR(l_quantity) AS BIGINT) AS q, "
        "CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents "
        "FROM lineitem WHERE l_partkey IN "
        "(SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')), "
        "s AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(q) AS BIGINT) AS sq FROM l GROUP BY 1) "
        "SELECT l.l_partkey AS p_partkey, "
        "CAST(SUM(cents) AS BIGINT) AS below_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n_below "
        "FROM l JOIN s ON l.l_partkey = s.l_partkey "
        "WHERE 5 * n * q < sq GROUP BY 1"
    ),
    "large_orders": (
        "WITH s AS (SELECT l_orderkey, "
        "CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) "
        "AS total_qty FROM lineitem GROUP BY 1) "
        "SELECT o_orderkey, total_qty, o_custkey, "
        "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS price_cents "
        "FROM s JOIN orders ON o_orderkey = l_orderkey "
        "WHERE total_qty > 150"
    ),
    "promo_revenue": (
        "SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) "
        "AS month, "
        "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
        "CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) "
        "ELSE 0 END) AS BIGINT) AS promo_e4, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) * "
        "(100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS total_e4 "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "GROUP BY 1"
    ),
    "brand_revenue": (
        "WITH t AS (SELECT p_brand, CAST(SUM(CAST(FLOOR(l_extendedprice *"
        " (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS "
        "revenue_cents, CAST(COUNT(*) AS BIGINT) AS n_items "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY p_brand) "
        "SELECT p_brand, revenue_cents, n_items, "
        "CAST(ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, p_brand) "
        "AS BIGINT) AS \"rank\" FROM t"
    ),
    "reorder_gap_quantiles": (
        "WITH g AS (SELECT CAST(0 AS BIGINT) AS k, "
        "(epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))"
        " // 86400000000 AS days FROM orders) "
        "SELECT k, quantile_cont(days, 0.5) AS p50, "
        "quantile_cont(days, 0.9) AS p90, "
        "quantile_cont(days, 0.99) AS p99 "
        "FROM g WHERE days IS NOT NULL GROUP BY k"
    ),
    "order_size_corr": (
        "WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS HUGEINT) AS x "
        "FROM lineitem GROUP BY l_orderkey), "
        "j AS (SELECT c.x AS x, CAST(CAST(FLOOR(o_totalprice * 100.0) "
        "AS BIGINT) AS HUGEINT) AS y FROM c JOIN orders "
        "ON o_orderkey = l_orderkey), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(x * y) AS HUGEINT) AS sxy, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(y * y) AS HUGEINT) AS syy FROM j) "
        "SELECT CAST(n AS BIGINT) AS n_orders, "
        "CAST(n * sxy - sx * sy AS DOUBLE) AS num, "
        "CAST(n * sxx - sx * sx AS DOUBLE) AS var_x, "
        "CAST(n * syy - sy * sy AS DOUBLE) AS var_y, "
        "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN "
        "CAST(n * sxy - sx * sy AS DOUBLE) / "
        "SQRT(CAST(n * sxx - sx * sx AS DOUBLE) * "
        "CAST(n * syy - sy * sy AS DOUBLE)) ELSE NULL END AS r FROM m"
    ),
    "interval_union": _interval_union_len_sql(3_600_000_000),
    "part_supplier_counts": (
        "SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size, "
        "CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand <> 'Brand#13' "
        "AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34) "
        "GROUP BY 1, 2, 3"
    ),
    "bracket_revenue": (
        "SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) "
        "* (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS revenue_e4, CAST(COUNT(*) AS BIGINT) AS n_items "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 "
        "AND l.l_quantity BETWEEN 1.0 AND 11.0) "
        "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 "
        "AND l.l_quantity BETWEEN 10.0 AND 20.0) "
        "OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 "
        "AND l.l_quantity BETWEEN 20.0 AND 30.0)"
    ),
    "sales_opportunity": (
        "WITH pos AS (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) "
        "AS BIGINT)) AS BIGINT) AS s, COUNT(*) AS n FROM customer "
        "WHERE c_acctbal > 0.0), "
        "have AS (SELECT DISTINCT o_custkey FROM orders "
        "WHERE o_orderpriority = '1-URGENT') "
        "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
        "CAST(COUNT(*) AS BIGINT) AS numcust, "
        "CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) "
        "AS totacctbal_cents "
        "FROM customer, pos "
        "WHERE CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) * pos.n > pos.s "
        "AND c_custkey NOT IN (SELECT o_custkey FROM have) "
        "GROUP BY 1"
    ),
    "returned_cust_revenue": (
        "WITH rev AS (SELECT o.o_custkey, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) "
        "* (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS revenue_e4 "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_returnflag = 'R' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1996-04-01' "
        "GROUP BY 1) "
        "SELECT c.c_custkey, c.c_name, r.revenue_e4, "
        "CAST(FLOOR(c.c_acctbal * 100.0) AS BIGINT) AS acctbal_cents, "
        "n.n_name, "
        "CAST(ROW_NUMBER() OVER (ORDER BY r.revenue_e4 DESC, "
        "c.c_custkey) AS BIGINT) AS rank "
        "FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "ORDER BY r.revenue_e4 DESC, c.c_custkey LIMIT 20"
    ),
    "top_supplier_qtr": (
        "WITH rev AS (SELECT l_suppkey, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) "
        "* (100 - CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT))) "
        "AS BIGINT) AS total_revenue_e4 FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
        "SELECT s.s_suppkey, s.s_name, r.total_revenue_e4 "
        "FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
        "WHERE r.total_revenue_e4 = "
        "(SELECT MAX(total_revenue_e4) FROM rev)"
    ),
    "nation_profit": (
        "SELECT n.n_name, "
        "CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS o_year, "
        "CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) "
        "* (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT)) "
        "- CAST(FLOOR(p.p_retailprice * 100.0) AS BIGINT) "
        "* CAST(l.l_quantity AS BIGINT) * 100) AS BIGINT) AS profit_e4, "
        "CAST(COUNT(*) AS BIGINT) AS n_items "
        "FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "WHERE p.p_name LIKE '%blue%' "
        "GROUP BY 1, 2"
    ),
    "priority_fill_rate": (
        "WITH m AS (SELECT l_orderkey, MIN(epoch_us(l_shipdate)) AS ms "
        "FROM lineitem GROUP BY 1) "
        "SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(COUNT(*) FILTER (WHERE m.ms <= epoch_us(o.o_orderdate) "
        "+ 2592000000000) AS BIGINT) AS n_fast "
        "FROM orders o JOIN m ON m.l_orderkey = o.o_orderkey "
        "GROUP BY 1"
    ),
    "market_share": (
        "WITH jo AS ("
        "SELECT EXTRACT(year FROM o.o_orderdate) AS yr, "
        "CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT) "
        "* (100 - CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT)) "
        "AS rev, s.s_nationkey AS snat "
        "FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation cn ON cn.n_nationkey = c.c_nationkey "
        "JOIN region r ON r.r_regionkey = cn.n_regionkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "WHERE r.r_name = 'ASIA') "
        "SELECT CAST(yr AS BIGINT) AS o_year, "
        "CAST(SUM(CASE WHEN snat = 2 THEN rev ELSE 0 END) AS BIGINT) "
        "AS nation_rev_e4, "
        "CAST(SUM(rev) AS BIGINT) AS total_rev_e4, "
        "CAST(SUM(CASE WHEN snat = 2 THEN rev ELSE 0 END) AS DOUBLE) "
        "/ CAST(SUM(rev) AS DOUBLE) AS mkt_share "
        "FROM jo GROUP BY 1"
    ),
    "excess_parts": (
        "WITH ps AS ("
        "SELECT l.l_partkey AS pk, l.l_suppkey AS sk, "
        "SUM(CAST(l.l_quantity AS BIGINT)) AS q "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_name LIKE '%red%' GROUP BY 1, 2), "
        "pt AS (SELECT pk, SUM(q) AS tq, COUNT(*) AS ns "
        "FROM ps GROUP BY 1), "
        "w AS (SELECT ps.sk FROM ps JOIN pt USING (pk) "
        "WHERE 2 * ps.q * pt.ns > 3 * pt.tq) "
        "SELECT s.s_suppkey, s.s_name, "
        "CAST(COUNT(*) AS BIGINT) AS n_parts "
        "FROM w JOIN supplier s ON s.s_suppkey = w.sk "
        "GROUP BY 1, 2"
    ),
    "waiting_suppliers": (
        "WITH j AS ("
        "SELECT l.l_orderkey AS ok, l.l_suppkey AS sk, "
        "CASE WHEN epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) "
        "+ 5184000000000 THEN 1 ELSE 0 END AS late "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey), "
        "p AS (SELECT ok, sk, MAX(late) AS late FROM j GROUP BY 1, 2), "
        "o2 AS (SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late, "
        "MAX(CASE WHEN late = 1 THEN sk END) AS late_sk "
        "FROM p GROUP BY 1) "
        "SELECT s.s_suppkey, s.s_name, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM o2 JOIN supplier s ON s.s_suppkey = o2.late_sk "
        "WHERE n_supp >= 2 AND n_late = 1 "
        "GROUP BY 1, 2"
    ),
}
