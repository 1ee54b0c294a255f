"""Movement analytics over georeferenced event streams.

Three consecutive-pair operators that share the trajectory fold shape
(`pipelines/trajectory.py`): per entity, order events by (ts, seq) and
fold each consecutive pair. All outputs are exact int64 aggregates, so
the SQL oracles (``LAG``/``LEAD`` windows + ``GROUP BY``) match
bit-for-bit and results are independent of partitioning.

- ``od_matrix``: origin→destination tile transition counts — the flow
  matrix of a mobility pipeline.
- ``cell_dwell``: per-tile visit counts and total dwell microseconds
  (the gap to the next event, attributed to the earlier event's tile).
- ``event_transitions``: event-type Markov transition counts.

Scale shape: ONE coarse entity-hash bucket shuffle of fixed-width
columns (strings are mapped to small int codes BEFORE the shuffle);
each bucket folds in one vectorized lexsort + mask pass and collapses
to tile- / type-pair-sized partials; ONE tiny coarse-bucket sum merges
them. Skewed entities salt the same way sessions do. Reference parity:
none (beyond-reference north-rule spatio-temporal surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of


def _fold_pairs(
    keyed: Dataset,
    pair_cols: tuple[str, ...],
    emit,
) -> Dataset:
    """Group the bucketed stream and hand ``emit`` the per-pair arrays:
    ``emit(cols..., dt_us) -> pa.Table`` where each ``cols`` entry is the
    (earlier, later) value pair of one input column and ``dt_us`` the
    timestamp gap. Pairs are consecutive same-key rows in (ts, seq)
    order."""

    def fold(group: pa.Table) -> pa.Table:
        key = group.column("_mv_key").to_numpy(zero_copy_only=False)
        ts = (
            group.column("_mv_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("_mv_seq").to_numpy(zero_copy_only=False)
        if key.size < 2:
            return emit(None, None)
        order = np.lexsort((seq, ts, key))
        k_s = key[order]
        same = k_s[1:] == k_s[:-1]
        if not same.any():
            return emit(None, None)
        cols = {}
        for c in pair_cols:
            v = group.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = (v[:-1][same], v[1:][same])
        dt = np.diff(ts[order])[same]
        return emit(cols, dt)

    return keyed.groupby("_mv_bucket").map_groups(fold, batch_format="pyarrow")


def _bucketed(
    tracks: Dataset,
    key_col: str,
    ts_col: str,
    seq_col: str,
    pair_cols: tuple[str, ...],
    n_buckets: int,
    recode=None,
) -> Dataset:
    """Pre-shuffle stage: rename the fold columns, hash the entity key
    into ``n_buckets`` and optionally recode string columns to int
    (``recode(tbl) -> tbl``) so only fixed-width columns shuffle."""

    def prep(tbl: pa.Table) -> pa.Table:
        if recode is not None:
            tbl = recode(tbl)
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "_mv_key": k,
            "_mv_ts": tbl.column(ts_col),
            "_mv_seq": tbl.column(seq_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "_mv_bucket": bucket_of(k, n_buckets),
        }
        for c in pair_cols:
            out[c] = tbl.column(c)
        return pa.table(out)

    return tracks.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )


def od_matrix(
    tracks: Dataset,
    res: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Origin→destination transition counts between tiles:
    ``(from_cell, to_cell, n_moves)`` over consecutive same-entity
    events (self-loops included). ``gx``/``gy`` must be grid indices at
    resolution ``res``."""
    tune_context()
    from .merge import bucketed_sum

    # the packed transition key frm*g2+to consumes 4*res bits of int64;
    # res >= 16 would overflow and silently merge distinct tile pairs
    if not 0 <= res <= 15:
        raise ValueError(f"od_matrix: res must be in [0, 15], got {res}")
    g = np.int64(1 << res)
    g2 = g * g

    def emit(cols, dt):
        if cols is None:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n_moves": pa.array([], pa.int64())}
            )
        fx, tx = cols[x_col]
        fy, ty = cols[y_col]
        frm = fx.astype(np.int64) * g + fy.astype(np.int64)
        to = tx.astype(np.int64) * g + ty.astype(np.int64)
        key, n = np.unique(frm * g2 + to, return_counts=True)
        return pa.table({"key": key, "n_moves": n.astype(np.int64)})

    keyed = _bucketed(
        tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets
    )
    folded = _fold_pairs(keyed, (x_col, y_col), emit)
    summed = bucketed_sum(folded, key_col="key", value_cols=("n_moves",))

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_cell": key // g2,
                "to_cell": key % g2,
                "n_moves": tbl.column("n_moves"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def cell_dwell(
    tracks: Dataset,
    res: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-tile visit count and total dwell time: each consecutive
    same-entity gap is attributed to the EARLIER event's tile —
    ``(cell, n_visits, dwell_us)``, exact int64 microseconds."""
    tune_context()
    from .merge import bucketed_sum

    g = np.int64(1 << res)

    def emit(cols, dt):
        if cols is None:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n_visits": pa.array([], pa.int64()),
                    "dwell_us": pa.array([], pa.int64()),
                }
            )
        fx, _ = cols[x_col]
        fy, _ = cols[y_col]
        cell = fx.astype(np.int64) * g + fy.astype(np.int64)
        order = np.argsort(cell)
        c_s, d_s = cell[order], dt[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        return pa.table(
            {
                "cell": c_s[starts],
                "n_visits": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
                "dwell_us": np.add.reduceat(d_s, starts),
            }
        )

    keyed = _bucketed(tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets)
    folded = _fold_pairs(keyed, (x_col, y_col), emit)
    return bucketed_sum(folded, key_col="cell", value_cols=("n_visits", "dwell_us"))


def distinct_strings(ds: Dataset, col: str) -> list[str]:
    """Sorted distinct values of a low-cardinality string column: each
    batch collapses to its local distinct set, the driver unions the
    tiny per-batch lists (never the table)."""
    import ray

    def local(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({col: pc.unique(tbl.column(col).combine_chunks())})

    vals: set[str] = set()
    for ref in ds.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs():
        t = ray.get(ref)
        vals.update(t.column(col).to_pylist())
    return sorted(vals)


def event_transitions(
    events: Dataset,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    n_buckets: int = 256,
) -> Dataset:
    """Markov transition counts between event types per entity stream:
    ``(from_type, to_type, n)``. A first metadata-sized pass collects
    the distinct type vocabulary; types shuffle as small int codes."""
    tune_context()
    import pyarrow.compute as pc

    from .merge import bucketed_sum

    types = distinct_strings(events, type_col)
    tarr = pa.array(types, pa.string())
    nt = np.int64(len(types))
    code_col = "_mv_code"

    def recode(tbl: pa.Table) -> pa.Table:
        code = pc.index_in(tbl.column(type_col), value_set=tarr).cast(pa.int64())
        return tbl.append_column(code_col, code)

    def emit(cols, dt):
        if cols is None:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        frm, to = cols[code_col]
        key, n = np.unique(frm * nt + to, return_counts=True)
        return pa.table({"key": key, "n": n.astype(np.int64)})

    keyed = _bucketed(
        events, key_col, ts_col, seq_col, (code_col,), n_buckets, recode=recode
    )
    folded = _fold_pairs(keyed, (code_col,), emit)
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_type": tarr.take(pa.array(key // nt, pa.int64())),
                "to_type": tarr.take(pa.array(key % nt, pa.int64())),
                "n": tbl.column("n"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def colocation_pairs(
    visits: Dataset,
    user_col: str = "user_id",
    cell_col: str = "cell",
    min_shared: int = 2,
    n_buckets: int = 256,
) -> Dataset:
    """(user_a, user_b, n_shared): user pairs co-located in at least
    ``min_shared`` DISTINCT tiles — the contact/co-travel graph op.
    ``user_a < user_b``; ``n_shared`` counts distinct shared cells.

    Scale shape: per-batch (user, cell) dedup, then ONE cell-bucket
    shuffle (a cell's visitors land together) where each bucket dedups
    globally and enumerates within-cell pairs with a vectorized
    triangular expansion — no per-cell Python. Pair counts fold through
    the coarse pair-key ``bucketed_sum``. Hot cells fan out
    quadratically (inherent to the operator — the SQL is the same
    self-join); production corpora gate them the way ``dedup.py`` caps
    LSH buckets: drop/log cells whose visitor count exceeds a cap,
    since a cell the whole population visits carries no co-location
    signal. No cap is wired here so the oracle equality stays exact.

    User ids must be in [0, 2^31) (pair packing: ``a << 31 | b``) —
    negative or >=2^31 ids would corrupt the packed key, so both bounds
    raise ValueError (a real check, not an assert stripped by ``-O``).
    """
    from .merge import bucketed_sum

    tune_context()

    def local_dedup(tbl: pa.Table) -> pa.Table:
        u = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = tbl.column(cell_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if u.size == 0:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "cb": pa.array([], pa.int64()),
                }
            )
        if int(u.min()) < 0 or int(u.max()) >= (1 << 31):
            raise ValueError(
                "colocation_pairs: user ids must be in [0, 2^31) for "
                "pair packing"
            )
        order = np.lexsort((u, c))
        cu, cc = u[order], c[order]
        keep = np.r_[True, (cu[1:] != cu[:-1]) | (cc[1:] != cc[:-1])][: cu.size]
        cu, cc = cu[keep], cc[keep]
        return pa.table(
            {
                "u": pa.array(cu),
                "c": pa.array(cc),
                "cb": pa.array(bucket_of(cc, n_buckets)),
            }
        )

    deduped = visits.map_batches(
        local_dedup,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    def cell_pairs(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if u.size == 0:
            return empty
        # global dedup inside the bucket (all copies of a cell are here)
        order = np.lexsort((u, c))
        cu, cc = u[order], c[order]
        keep = np.r_[True, (cu[1:] != cu[:-1]) | (cc[1:] != cc[:-1])][: cu.size]
        cu, cc = cu[keep], cc[keep]
        # per-cell triangular pair expansion, fully vectorized:
        # row with local rank r in a cell of size n is 'a' of (n-1-r) pairs
        starts = np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]][: cc.size])
        sizes = np.diff(np.r_[starts, cc.shape[0]])
        loc = np.arange(cc.shape[0]) - np.repeat(starts, sizes)
        rep = np.repeat(sizes, sizes) - 1 - loc
        total = int(rep.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(cc.shape[0]), rep)
        csum = np.cumsum(rep)
        off = np.arange(total) - np.repeat(csum - rep, rep)
        b_idx = a_idx + 1 + off
        ua, ub = cu[a_idx], cu[b_idx]
        lo, hi = np.minimum(ua, ub), np.maximum(ua, ub)
        pair = (lo << np.int64(31)) | hi
        # combine within the bucket: one row per (pair) with its count
        pair.sort()
        ps = np.flatnonzero(np.r_[True, pair[1:] != pair[:-1]][: pair.size])
        return pa.table(
            {
                "pair": pa.array(pair[ps]),
                "n": pa.array(np.diff(np.r_[ps, pair.shape[0]]).astype(np.int64)),
            }
        )

    pair_partials = deduped.groupby("cb").map_groups(
        cell_pairs, batch_format="pyarrow"
    )
    summed = bucketed_sum(pair_partials, key_col="pair", value_cols=("n",))

    thr = int(min_shared)

    def finish(tbl: pa.Table) -> pa.Table:
        p = tbl.column("pair").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        keep = n >= thr
        p, n = p[keep], n[keep]
        return pa.table(
            {
                "user_a": pa.array(p >> np.int64(31)),
                "user_b": pa.array(p & np.int64((1 << 31) - 1)),
                "n_shared": pa.array(n),
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def speed_outliers(
    tracks: Dataset,
    max_kmh: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "px",
    y_col: str = "py",
    n_buckets: int = 256,
) -> Dataset:
    """GPS-glitch / teleport detector: consecutive same-entity moves
    whose implied great-circle speed exceeds ``max_kmh`` —
    ``(user_id, event_id, next_event_id, dt_us, dist_km, speed_kmh)``.
    The anomaly-filter complement of :func:`~.trajectory.
    trajectory_length`: instead of summing movement it flags the pairs
    that are physically implausible. Zero-gap pairs (``dt_us <= 0``,
    simultaneous fixes) are excluded — they have no defined speed.

    Float parity with the SQL twin (:func:`speed_outliers_sql`): the
    haversine expression shapes and literals mirror
    :mod:`..pipelines.geodesic` token-for-token, the exact libm ``asin``
    runs on candidate rows only (gated by a vectorized ``np.arcsin``
    near-superset, whose few-ULP drift is dwarfed by the 1e-6 km
    slack), and the speed is ONE multiply + ONE divide — so emitted
    doubles and the threshold comparison match DuckDB bitwise.

    Scale shape: the shared trajectory fold — ONE coarse entity-bucket
    shuffle of fixed-width columns, per-bucket vectorized lexsort +
    consecutive-pair mask; output is outlier-sized. Trig runs per pair
    but only candidates (vanishingly few at a sane threshold) pay the
    scalar libm asin.
    """
    tune_context()
    from .geodesic import DIAM_KM, _asin_libm, _haversine_a, _lonlat

    thr = float(max_kmh)
    out_schema = {
        "user_id": pa.int64(),
        "event_id": pa.int64(),
        "next_event_id": pa.int64(),
        "dt_us": pa.int64(),
        "dist_km": pa.float64(),
        "speed_kmh": pa.float64(),
    }

    def empty() -> pa.Table:
        return pa.table({k: pa.array([], t) for k, t in out_schema.items()})

    def emit(cols, dt):
        if cols is None:
            return empty()
        uid, _ = cols[key_col]
        eid_f, eid_t = cols[seq_col]
        fx, tx = cols[x_col]
        fy, ty = cols[y_col]
        pos = dt > 0
        if not pos.any():
            return empty()
        uid, eid_f, eid_t, dt = uid[pos], eid_f[pos], eid_t[pos], dt[pos]
        lon1, lat1 = _lonlat(fx[pos], fy[pos])
        lon2, lat2 = _lonlat(tx[pos], ty[pos])
        a = _haversine_a(lon1, lat1, lon2, lat2)
        # outlier iff dist_km > max_kmh * dt_us / 3.6e9; the vectorized
        # arcsin gate keeps a near-superset, exact libm asin decides
        lim_km = thr * dt.astype(np.float64) / 3600000000.0
        cand = DIAM_KM * np.arcsin(np.sqrt(a)) >= lim_km - 1e-6
        if not cand.any():
            return empty()
        uid, eid_f, eid_t, dt = uid[cand], eid_f[cand], eid_t[cand], dt[cand]
        d = DIAM_KM * _asin_libm(np.sqrt(a[cand]))
        speed = d * 3600000000.0 / dt.astype(np.float64)
        keep = speed > thr
        return pa.table(
            {
                "user_id": pa.array(uid[keep].astype(np.int64)),
                "event_id": pa.array(eid_f[keep].astype(np.int64)),
                "next_event_id": pa.array(eid_t[keep].astype(np.int64)),
                "dt_us": pa.array(dt[keep]),
                "dist_km": pa.array(d[keep]),
                "speed_kmh": pa.array(speed[keep]),
            }
        )

    keyed = _bucketed(
        tracks, key_col, ts_col, seq_col, (key_col, seq_col, x_col, y_col), n_buckets
    )
    return _fold_pairs(keyed, (key_col, seq_col, x_col, y_col), emit)


def speed_outliers_sql(points_cte: str, max_kmh: float) -> str:
    """DuckDB twin of :func:`speed_outliers`. ``points_cte`` must yield
    (event_id, px, py); events supplies (user_id, ts, event_id)."""
    from .geodesic import DIAM_KM, RAD

    return f"""
WITH q AS ({points_cte}),
p AS (SELECT e.user_id, e.ts, e.event_id,
             q.px * 360.0 - 180.0 AS lon, q.py * 170.0 - 85.0 AS lat
      FROM events e JOIN q USING (event_id)),
d AS (SELECT user_id, event_id, lon, lat, ts,
             LEAD(event_id) OVER w AS next_event_id,
             LEAD(lon) OVER w AS nlon, LEAD(lat) OVER w AS nlat,
             LEAD(ts) OVER w AS nts
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
m AS (SELECT user_id, event_id, next_event_id,
             CAST(date_diff('microsecond', ts, nts) AS BIGINT) AS dt_us,
             {DIAM_KM!r} * ASIN(SQRT(LEAST(
                 SIN((nlat - lat) * {RAD!r} * 0.5)
                 * SIN((nlat - lat) * {RAD!r} * 0.5)
                 + COS(lat * {RAD!r}) * COS(nlat * {RAD!r})
                 * SIN((nlon - lon) * {RAD!r} * 0.5)
                 * SIN((nlon - lon) * {RAD!r} * 0.5),
                 1.0))) AS dist_km
      FROM d
      WHERE next_event_id IS NOT NULL
        AND date_diff('microsecond', ts, nts) > 0)
SELECT user_id, event_id, next_event_id, dt_us, dist_km,
       dist_km * 3600000000.0 / CAST(dt_us AS DOUBLE) AS speed_kmh
FROM m
WHERE dist_km * 3600000000.0 / CAST(dt_us AS DOUBLE) > {float(max_kmh)!r}
"""


def cell_trend(
    tracks: Dataset,
    res: int,
    ts_col: str = "ts",
    x_col: str = "gx",
    y_col: str = "gy",
) -> Dataset:
    """Emerging-hotspot trend per tile: split the stream's time range at
    its midpoint and count events per cell in each half —
    ``(cell, n_early, n_late, delta)`` with ``delta = n_late −
    n_early`` (positive = emerging, negative = cooling). The space-time
    complement of the static density ops. Exact int64 throughout → the
    SQL twin ((MIN+MAX)/2 epoch-µs midpoint, same floor semantics)
    matches bit-for-bit.

    Scale shape: pass 1 is a metadata fold (per-batch ts min/max, two
    scalars to the driver); pass 2 collapses each batch to per-(cell,
    half) counts and folds them with ONE coarse-bucket sum — tile-sized
    partials, raw rows never shuffle.
    """
    tune_context()
    from .merge import bucketed_sum

    g = np.int64(1 << res)

    def ts_us(tbl: pa.Table) -> np.ndarray:
        return (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )

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

    import pyarrow.compute as pc
    import ray

    lo = hi = None
    for ref in tracks.map_batches(
        minmax, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    ).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        blo = pc.min(t.column("lo")).as_py()
        bhi = pc.max(t.column("hi")).as_py()
        lo = blo if lo is None else min(lo, blo)
        hi = bhi if hi is None else max(hi, bhi)
    if lo is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n_early": pa.array([], pa.int64()),
                    "n_late": pa.array([], pa.int64()),
                    "delta": pa.array([], pa.int64()),
                }
            )
        )
    mid = (lo + hi) // 2  # epoch µs are positive: floor == truncation

    def partial(tbl: pa.Table) -> pa.Table:
        t = ts_us(tbl)
        cell = (
            tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64) * g
            + tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        late = t > mid
        key, inv = np.unique(cell, return_inverse=True)
        n_late = np.bincount(inv[late], minlength=key.size).astype(np.int64)
        n_all = np.bincount(inv, minlength=key.size).astype(np.int64)
        return pa.table(
            {"cell": key, "n_early": n_all - n_late, "n_late": n_late}
        )

    summed = bucketed_sum(
        tracks.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="cell",
        value_cols=("n_early", "n_late"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        e = tbl.column("n_early").to_numpy(zero_copy_only=False)
        l = tbl.column("n_late").to_numpy(zero_copy_only=False)
        return tbl.append_column("delta", pa.array(l - e, pa.int64()))

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def cell_trend_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`cell_trend` over the events table.
    ``points_cte`` must yield (event_id, px, py)."""
    from ..functions import derive

    cell = derive.tile_cell_sql("q.px", "q.py", res)
    return f"""
WITH q AS ({points_cte}),
p AS (SELECT {cell} AS cell, e.ts AS ts
      FROM events e JOIN q USING (event_id)),
b AS (SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM p)
SELECT cell,
       CAST(SUM(CASE WHEN epoch_us(ts) <= b.mid THEN 1 ELSE 0 END)
            AS BIGINT) AS n_early,
       CAST(SUM(CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END)
            - SUM(CASE WHEN epoch_us(ts) <= b.mid THEN 1 ELSE 0 END)
            AS BIGINT) AS delta
FROM p, b GROUP BY cell, b.mid
"""


_EMPTY_SNAP = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "snap_user": pa.array([], pa.int64()),
        "snap_seq": pa.array([], pa.int64()),
        "dist2": pa.array([], pa.float64()),
    }
)


def snap_to_segments(
    probes: Dataset,
    tracks: Dataset,
    r: int,
    max_move: int = 64,
    res: int = 9,
    bucket_res: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Map matching: snap each probe point to its NEAREST movement
    segment within squared grid distance ``r²`` —
    ``(query_id, snap_user, snap_seq, dist2)``, one row per probe with
    ≥1 candidate. Segments are consecutive same-entity moves (earlier
    event's seq is the segment id), teleport-gated at L-inf
    ``max_move`` like :func:`~..geofence.segment_crossings`.

    Exactness: endpoints and probes are integer grid coords, so the
    point-to-segment squared distance is the exact rational num/den —
    ``c1 = (b−a)·(p−a)`` and ``len2 = |b−a|²`` decide the clamp case
    (num = |p−a|² / |p−b|² with den = 1, else num = cross², den =
    len2) — all int64. The radius gate compares ``num ≤ r²·den`` in
    exact integers; only the OUTPUT distance (and the argmin sort key)
    is the single correctly-rounded division num/den, identical in
    NumPy and the SQL twin, with exact-int (user, seq) tie-breaks —
    so the chosen segment and the double agree bitwise.

    Scale shape: ONE entity-bucket shuffle builds segments; each
    segment offers itself to the coarse tiles of its r-expanded bbox
    (fan-out bounded by ``(max_move + 2r) / tile_edge``, asserted);
    each probe lands on exactly ONE coarse tile, so the per-tile
    groupby sees every candidate within r of its probes — per-group
    argmin IS the global argmin, no second pass. Raw tracks shuffle
    once; probes shuffle once; both fixed-width ints.
    """
    tune_context()
    if not 0 <= bucket_res <= res:
        raise ValueError("snap_to_segments: need 0 <= bucket_res <= res")
    shift = res - bucket_res
    edge = 1 << shift
    # fan-out bound: a segment's r-expanded bbox spans at most
    # (max_move + 2r)/edge + 2 tiles per axis — keep it a small constant
    if (max_move + 2 * r) > 6 * edge:
        raise ValueError(
            f"snap_to_segments: max_move + 2r = {max_move + 2 * r} exceeds "
            f"6 tile edges ({6 * edge}); lower bucket_res or r"
        )
    gb = np.int64(1 << bucket_res)
    r2 = np.int64(r) * np.int64(r)

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": k,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "gx": tbl.column(x_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "gy": tbl.column(y_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "bucket": bucket_of(k, n_buckets),
            }
        )

    _empty_tagged = pa.table(
        {
            "tile": pa.array([], pa.int64()),
            "is_probe": pa.array([], pa.int8()),
            "ida": pa.array([], pa.int64()),
            "idb": pa.array([], pa.int64()),
            "x1": pa.array([], pa.int64()),
            "y1": pa.array([], pa.int64()),
            "x2": pa.array([], pa.int64()),
            "y2": pa.array([], pa.int64()),
        }
    )

    def to_segments(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size < 2:
            return _empty_tagged
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s, s_s = key[order], seq[order]
        x_s, y_s = gx[order], gy[order]
        m = (
            (k_s[1:] == k_s[:-1])
            & (np.abs(np.diff(x_s)) <= max_move)
            & (np.abs(np.diff(y_s)) <= max_move)
        )
        if not m.any():
            return _empty_tagged
        i = np.flatnonzero(m)
        x1, y1, x2, y2 = x_s[i], y_s[i], x_s[i + 1], y_s[i + 1]
        # offer each segment to every coarse tile of its r-expanded bbox
        g_hi = (np.int64(1) << res) - 1
        tx0 = np.clip(np.minimum(x1, x2) - r, 0, g_hi) >> shift
        tx1 = np.clip(np.maximum(x1, x2) + r, 0, g_hi) >> shift
        ty0 = np.clip(np.minimum(y1, y2) - r, 0, g_hi) >> shift
        ty1 = np.clip(np.maximum(y1, y2) + r, 0, g_hi) >> shift
        ntx = tx1 - tx0 + 1
        nty = ty1 - ty0 + 1
        reps = ntx * nty
        idx = np.repeat(np.arange(i.size, dtype=np.int64), reps)
        starts = np.cumsum(reps) - reps
        off = np.arange(int(reps.sum()), dtype=np.int64) - starts[idx]
        tile = (tx0[idx] + off // nty[idx]) * gb + (ty0[idx] + off % nty[idx])
        return pa.table(
            {
                "tile": tile,
                "is_probe": np.zeros(tile.size, np.int8),
                "ida": k_s[i][idx],
                "idb": s_s[i][idx],
                "x1": x1[idx],
                "y1": y1[idx],
                "x2": x2[idx],
                "y2": y2[idx],
            }
        )

    def tag_probes(tbl: pa.Table) -> pa.Table:
        qid = tbl.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
        qx = tbl.column("qx").to_numpy(zero_copy_only=False).astype(np.int64)
        qy = tbl.column("qy").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tile": (qx >> shift) * gb + (qy >> shift),
                "is_probe": np.ones(qid.size, np.int8),
                "ida": qid,
                "idb": np.zeros(qid.size, np.int64),
                "x1": qx,
                "y1": qy,
                "x2": qx,
                "y2": qy,
            }
        )

    def snap_tile(group: pa.Table) -> pa.Table:
        is_probe = group.column("is_probe").to_numpy(zero_copy_only=False) == 1
        if not is_probe.any() or is_probe.all():
            return _EMPTY_SNAP
        qid = group.column("ida").to_numpy(zero_copy_only=False)[is_probe]
        qx = group.column("x1").to_numpy(zero_copy_only=False)[is_probe]
        qy = group.column("y1").to_numpy(zero_copy_only=False)[is_probe]
        seg = ~is_probe
        su = group.column("ida").to_numpy(zero_copy_only=False)[seg]
        ss = group.column("idb").to_numpy(zero_copy_only=False)[seg]
        ax = group.column("x1").to_numpy(zero_copy_only=False)[seg]
        ay = group.column("y1").to_numpy(zero_copy_only=False)[seg]
        bx = group.column("x2").to_numpy(zero_copy_only=False)[seg]
        by = group.column("y2").to_numpy(zero_copy_only=False)[seg]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        out = []
        # chunk probes so the candidate matrix stays ~1e7 cells
        chunk = max(1, int(10_000_000 // max(1, su.size)))
        for lo in range(0, qid.size, chunk):
            px = qx[lo : lo + chunk, None]
            py = qy[lo : lo + chunk, None]
            apx, apy = px - ax[None, :], py - ay[None, :]
            c1 = apx * dx[None, :] + apy * dy[None, :]
            cross = apx * dy[None, :] - apy * dx[None, :]
            d_a = apx * apx + apy * apy
            bpx, bpy = px - bx[None, :], py - by[None, :]
            d_b = bpx * bpx + bpy * bpy
            ln = len2[None, :]
            lowc = c1 <= 0
            highc = c1 >= ln
            num = np.where(lowc, d_a, np.where(highc, d_b, cross * cross))
            den = np.where(lowc | highc, np.int64(1), np.maximum(ln, 1))
            ok = num <= r2 * den  # exact-integer radius gate
            if not ok.any():
                continue
            d2 = num.astype(np.float64) / den.astype(np.float64)
            d2 = np.where(ok, d2, np.inf)
            # argmin by (d2, user, seq): lexsort the candidate axis once
            # per chunk via structured ranking
            best = np.argmin(d2, axis=1)
            rowi = np.arange(d2.shape[0])
            # resolve double ties by (user, seq) exactly
            bd = d2[rowi, best]
            has = np.isfinite(bd)
            if not has.any():
                continue
            # among tied-distance candidates pick min (user, seq) —
            # two exact int64 passes, full-range safe (no composite key)
            ties = d2 == bd[:, None]
            hi = np.iinfo(np.int64).max
            u_m = np.where(ties, su[None, :], hi)
            bu = u_m.min(axis=1)
            s_m = np.where(ties & (su[None, :] == bu[:, None]), ss[None, :], hi)
            pick = np.argmin(s_m, axis=1)
            out.append(
                pa.table(
                    {
                        "query_id": qid[lo : lo + chunk][has],
                        "snap_user": su[pick][has],
                        "snap_seq": ss[pick][has],
                        "dist2": bd[has],
                    }
                )
            )
        if not out:
            return _EMPTY_SNAP
        return pa.concat_tables(out)

    keyed = tracks.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    segs = keyed.groupby("bucket").map_groups(to_segments, batch_format="pyarrow")
    tagged = segs.union(
        probes.map_batches(tag_probes, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby("tile").map_groups(snap_tile, batch_format="pyarrow")


def snap_to_segments_sql(
    points_cte: str, probe_cte: str, r: int, max_move: int, res: int
) -> str:
    """DuckDB twin of :func:`snap_to_segments`. ``points_cte`` yields
    the track stream (event_id, px, py) [joined to events for user/ts];
    ``probe_cte`` yields (query_id, px, py). Brute-force probe × segment
    with the SAME exact-integer num/den cases, the same exact radius
    gate ``num <= r²·den``, the same single division, and the same
    (dist2, user, seq) argmin order."""
    from ..functions import derive

    gxe = derive.tile_index_sql("q.px", res)
    gye = derive.tile_index_sql("q.py", res)
    gxp = derive.tile_index_sql("px", res)
    gyp = derive.tile_index_sql("py", res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gxe} AS gx, {gye} AS gy
        FROM events e JOIN q ON e.event_id = q.event_id),
seg AS (SELECT u, seq, gx AS x1, gy AS y1,
               LEAD(gx) OVER w AS x2, LEAD(gy) OVER w AS y2,
               LEAD(u) OVER w AS u2
        FROM pts WINDOW w AS (ORDER BY u, ts, seq)),
sg AS (SELECT u, seq, x1, y1, x2, y2,
              (x2 - x1) AS dx, (y2 - y1) AS dy,
              (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) AS len2
       FROM seg
       WHERE u2 = u AND ABS(x2 - x1) <= {max_move} AND ABS(y2 - y1) <= {max_move}),
pr AS (SELECT query_id, {gxp} AS qx, {gyp} AS qy FROM ({probe_cte})),
cand AS (SELECT pr.query_id, sg.u, sg.seq,
                CASE WHEN (pr.qx - sg.x1) * sg.dx + (pr.qy - sg.y1) * sg.dy <= 0
                     THEN (pr.qx - sg.x1) * (pr.qx - sg.x1)
                          + (pr.qy - sg.y1) * (pr.qy - sg.y1)
                     WHEN (pr.qx - sg.x1) * sg.dx + (pr.qy - sg.y1) * sg.dy >= sg.len2
                     THEN (pr.qx - sg.x2) * (pr.qx - sg.x2)
                          + (pr.qy - sg.y2) * (pr.qy - sg.y2)
                     ELSE ((pr.qx - sg.x1) * sg.dy - (pr.qy - sg.y1) * sg.dx)
                          * ((pr.qx - sg.x1) * sg.dy - (pr.qy - sg.y1) * sg.dx)
                END AS num,
                CASE WHEN (pr.qx - sg.x1) * sg.dx + (pr.qy - sg.y1) * sg.dy <= 0
                          OR (pr.qx - sg.x1) * sg.dx + (pr.qy - sg.y1) * sg.dy >= sg.len2
                     THEN 1 ELSE GREATEST(sg.len2, 1) END AS den
         FROM pr, sg),
gated AS (SELECT query_id, u, seq,
                 CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS dist2
          FROM cand WHERE num <= {int(r) * int(r)} * den),
rk AS (SELECT query_id, u, seq, dist2,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY dist2, u, seq) AS rn
       FROM gated)
SELECT query_id, u AS snap_user, seq AS snap_seq, dist2
FROM rk WHERE rn = 1
"""


def heading_histogram(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-entity movement-direction histogram:
    ``(user_id, dir, n_moves)`` where ``dir`` classifies each
    consecutive same-entity move by its displacement signs —
    ``dir = (sign(dx)+1)*3 + sign(dy)+1`` (0..8 = SW,W,NW,S,·,N,SE,E,NE
    in (dx, dy) sign order; the stationary class 4 is excluded). Exact
    integer classification — no angles, no floats — so the LAG-window
    SQL twin matches bit-for-bit. The directional-bias companion of
    :func:`trajectory_length` (commute asymmetry, drift detection).

    Scale shape: the shared trajectory fold — ONE entity-bucket shuffle
    of fixed-width ints, per-bucket lexsort fold collapsing to ≤8 rows
    per entity, ONE tiny coarse-bucket sum."""
    tune_context()
    from .merge import bucketed_sum

    def emit(cols, dt):
        if cols is None:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n_moves": pa.array([], pa.int64())}
            )
        fx, tx = cols[x_col]
        fy, ty = cols[y_col]
        u, _ = cols[key_col]
        dx = tx.astype(np.int64) - fx.astype(np.int64)
        dy = ty.astype(np.int64) - fy.astype(np.int64)
        d = (np.sign(dx) + 1) * 3 + np.sign(dy) + 1
        move = d != 4
        key, n = np.unique(
            u[move].astype(np.int64) * 9 + d[move], return_counts=True
        )
        return pa.table({"key": key, "n_moves": n.astype(np.int64)})

    keyed = _bucketed(
        tracks, key_col, ts_col, seq_col, (x_col, y_col, key_col), n_buckets
    )
    folded = _fold_pairs(keyed, (x_col, y_col, key_col), emit)
    summed = bucketed_sum(folded, key_col="key", value_cols=("n_moves",))

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": key // 9,
                "dir": key % 9,
                "n_moves": tbl.column("n_moves"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def heading_histogram_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`heading_histogram` over the events table;
    ``points_cte`` must yield (event_id, px, py)."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} AS gx, {gy} AS gy
        FROM events e JOIN q ON e.event_id = q.event_id),
m AS (SELECT u,
             gx - LAG(gx) OVER w AS dx,
             gy - LAG(gy) OVER w AS dy
      FROM pts WINDOW w AS (PARTITION BY u ORDER BY ts, seq))
SELECT u AS user_id,
       CAST((SIGN(dx) + 1) * 3 + SIGN(dy) + 1 AS BIGINT) AS dir,
       CAST(COUNT(*) AS BIGINT) AS n_moves
FROM m WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0)
GROUP BY u, (SIGN(dx) + 1) * 3 + SIGN(dy) + 1
"""


def cell_hours(
    tracks: Dataset,
    res: int,
    ts_col: str = "ts",
    x_col: str = "gx",
    y_col: str = "gy",
) -> Dataset:
    """Per-tile hour-of-day activity profile: ``(cell, hour, n_events)``
    with ``hour = (epoch_µs // 3.6e9) % 24`` (UTC; pure integer
    arithmetic so the SQL twin is bit-identical). The temporal-rhythm
    complement of the static density ops — nightlife vs commuter vs
    office tiles separate on this profile.

    Scale shape: ZERO entity state needed — each batch collapses to
    per-(cell, hour) counts and ONE coarse-bucket sum folds them; at
    most tile_count × 24 rows ever shuffle."""
    tune_context()
    from .merge import bucketed_sum

    g = np.int64(1 << res)
    HOUR_US = np.int64(3_600_000_000)

    def partial(tbl: pa.Table) -> pa.Table:
        t = (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        hour = (t // HOUR_US) % 24  # epoch µs are positive: floor == trunc
        cell = (
            tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64) * g
            + tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        key, n = np.unique(cell * 24 + hour, return_counts=True)
        return pa.table({"key": key, "n_events": n.astype(np.int64)})

    summed = bucketed_sum(
        tracks.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="key",
        value_cols=("n_events",),
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": key // 24,
                "hour": key % 24,
                "n_events": tbl.column("n_events"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def cell_hours_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`cell_hours` over the events table."""
    from ..functions import derive

    cell = derive.tile_cell_sql("q.px", "q.py", res)
    return f"""
WITH q AS ({points_cte}),
p AS (SELECT {cell} AS cell,
             (epoch_us(e.ts) // 3600000000) % 24 AS hour
      FROM events e JOIN q USING (event_id))
SELECT cell, CAST(hour AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM p GROUP BY cell, hour
"""


def cell_slope(
    tracks: Dataset,
    res: int,
    n_bins: int = 8,
    ts_col: str = "ts",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-tile activity TREND SLOPE — the multi-bin refinement of
    :func:`cell_trend`: split the stream's time range into ``n_bins``
    equal bins and fit the per-tile ordinary-least-squares slope of
    (bin index → event count), empty bins included as zeros —
    ``(cell, n_events, slope)``; slope > 0 = emerging, < 0 = cooling,
    in events per bin.

    Exactness: with fixed x = 0..n_bins−1, Σx and Σx² are constants,
    so slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) has an exact-integer
    numerator (counts and bin indices) over a CONSTANT integer
    denominator — ONE double division per cell, so the SQL twin
    matches bitwise. Bin assignment is pure integer arithmetic off the
    exact global (min, max) epoch-µs fold.

    Scale shape: pass 1 is the two-scalar ts min/max metadata fold;
    pass 2 collapses each batch to (cell·n_bins+bin, count) partials
    folded by ONE :func:`~.merge.bucketed_sum`; the closing slope fold
    regroups the tile×bins-sized sum table by CELL bucket — metadata-
    sized, raw rows never shuffle.
    """
    tune_context()
    from .merge import bucketed_sum

    if n_bins < 2:
        raise ValueError(f"cell_slope: n_bins must be >= 2, got {n_bins}")
    g = np.int64(1 << res)
    nb = np.int64(n_bins)
    sx = n_bins * (n_bins - 1) // 2
    sx2 = (n_bins - 1) * n_bins * (2 * n_bins - 1) // 6
    den = n_bins * sx2 - sx * sx  # constant positive integer

    def ts_us(tbl: pa.Table) -> np.ndarray:
        return (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )

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

    import pyarrow.compute as pc
    import ray

    lo = hi = None
    for ref in tracks.map_batches(
        minmax, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    ).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        blo = pc.min(t.column("lo")).as_py()
        bhi = pc.max(t.column("hi")).as_py()
        lo = blo if lo is None else min(lo, blo)
        hi = bhi if hi is None else max(hi, bhi)
    empty = pa.table(
        {
            "cell": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "slope": pa.array([], pa.float64()),
        }
    )
    if lo is None:
        return ray.data.from_arrow(empty)
    span = hi - lo + 1  # epoch µs are positive; +1 keeps hi in the last bin

    def partial(tbl: pa.Table) -> pa.Table:
        t = ts_us(tbl)
        cell = (
            tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64) * g
            + tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        b = np.minimum((t - lo) * nb // span, nb - 1)
        key, inv = np.unique(cell * nb + b, return_inverse=True)
        n = np.bincount(inv, minlength=key.size).astype(np.int64)
        return pa.table({"key": key, "n": n})

    summed = bucketed_sum(
        tracks.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="key",
        value_cols=("n",),
    )

    from ..functions.buckets import bucket_of

    def by_cell(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return tbl.append_column("cb", pa.array(bucket_of(key // nb, n_buckets)))

    def slope_fold(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return empty
        cell = key // nb
        b = key - cell * nb
        order = np.argsort(cell, kind="stable")
        c_s, b_s, n_s = cell[order], b[order], n[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        sy = np.add.reduceat(n_s, starts)
        sxy = np.add.reduceat(b_s * n_s, starts)
        num = n_bins * sxy - sx * sy
        return pa.table(
            {
                "cell": pa.array(c_s[starts], pa.int64()),
                "n_events": pa.array(sy, pa.int64()),
                "slope": pa.array(
                    num.astype(np.float64) / np.float64(den), pa.float64()
                ),
            }
        )

    return (
        summed.map_batches(by_cell, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cb")
        .map_groups(slope_fold, batch_format="pyarrow")
    )


def cell_slope_sql(points_cte: str, res: int, n_bins: int = 8) -> str:
    """DuckDB twin of :func:`cell_slope` — same integer bin assignment
    off the exact global (min, max), same exact-int numerator over the
    constant denominator, one CAST-to-DOUBLE division."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    g = 1 << res
    sx = n_bins * (n_bins - 1) // 2
    sx2 = (n_bins - 1) * n_bins * (2 * n_bins - 1) // 6
    den = n_bins * sx2 - sx * sx
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT {gx} * {g} + {gy} AS cell, epoch_us(e.ts) AS t
        FROM events e JOIN q ON e.event_id = q.event_id),
rng AS (SELECT MIN(t) AS lo, MAX(t) AS hi FROM pts),
binned AS (SELECT cell,
                  LEAST((t - rng.lo) * {n_bins} // (rng.hi - rng.lo + 1),
                        {n_bins - 1}) AS b
           FROM pts, rng),
cb AS (SELECT cell, b, CAST(COUNT(*) AS BIGINT) AS n
       FROM binned GROUP BY cell, b)
SELECT cell,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST({n_bins} * SUM(b * n) - {sx} * SUM(n) AS DOUBLE)
       / CAST({den} AS DOUBLE) AS slope
FROM cb GROUP BY cell
"""


def home_cells(
    tracks: Dataset,
    res: int,
    key_col: str = "user_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Home-location inference: each entity's most-visited tile —
    ``(user_id, home_cell, n_visits, n_points)`` with the classic
    deterministic tie-break (max count, then smallest cell id). Exact
    integers; the SQL twin is a per-user window argmax.

    Scale shape: each batch collapses to (user, cell, count) partials;
    :func:`~.merge.bucketed_sum` folds them exactly (key =
    user·4^res + cell — ONE coarse shuffle of int partials, raw rows
    never move); a metadata-sized user-bucket regroup takes the
    per-user argmax with one lexsort.
    """
    tune_context()
    from .merge import bucketed_sum
    from ..functions.buckets import bucket_of

    if not 0 <= res <= 15:
        raise ValueError(f"home_cells: res must be in [0, 15], got {res}")
    g = np.int64(1 << res)
    ncells = g * g

    def partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = (
            tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64) * g
            + tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if (u < 0).any() or (u > (1 << 62) // ncells - 1).any():
            raise ValueError("home_cells: user id out of packable range")
        key, inv = np.unique(u * ncells + cell, return_inverse=True)
        n = np.bincount(inv, minlength=key.size).astype(np.int64)
        return pa.table({"key": key, "n": n})

    summed = bucketed_sum(
        tracks.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="key",
        value_cols=("n",),
    )

    def by_user(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "ub", pa.array(bucket_of(key // ncells, n_buckets))
        )

    def argmax_fold(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "home_cell": pa.array([], pa.int64()),
                    "n_visits": pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                }
            )
        user = key // ncells
        cell = key - user * ncells
        # per user: max n, tie -> smallest cell. lexsort: within user,
        # ascending (-n, cell) puts the winner first
        order = np.lexsort((cell, -n, user))
        u_s = user[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]][: u_s.size])
        win = order[starts]
        totals = np.add.reduceat(n[order], starts)
        return pa.table(
            {
                "user_id": pa.array(u_s[starts], pa.int64()),
                "home_cell": pa.array(cell[win], pa.int64()),
                "n_visits": pa.array(n[win], pa.int64()),
                "n_points": pa.array(totals, pa.int64()),
            }
        )

    return (
        summed.map_batches(by_user, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ub")
        .map_groups(argmax_fold, batch_format="pyarrow")
    )


def home_cells_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`home_cells` — window argmax with the
    (count DESC, cell ASC) tie-break."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    g = 1 << res
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS user_id, {gx} * {g} + {gy} AS cell
        FROM events e JOIN q ON e.event_id = q.event_id),
uc AS (SELECT user_id, cell, CAST(COUNT(*) AS BIGINT) AS n
       FROM pts GROUP BY user_id, cell),
r AS (SELECT user_id, cell, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, cell ASC) AS rn,
             SUM(n) OVER (PARTITION BY user_id) AS tot
      FROM uc)
SELECT user_id, cell AS home_cell, n AS n_visits,
       CAST(tot AS BIGINT) AS n_points
FROM r WHERE rn = 1
"""


def radius_of_gyration(
    tracks: Dataset,
    key_col: str = "user_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-entity radius of gyration — THE classic human-mobility
    spread metric (Gonzalez et al.'s Nature 2008 measure): rog² =
    mean squared distance of an entity's points from its centroid, on
    the integer track grid. ``(user_id, n_points, rog2)``.

    Exactness: with integer coords, n·Σd² from the centroid collapses
    to ``num = n·(Σx² + Σy²) − (Σx)² − (Σy)²`` — an exact integer —
    and rog² = num / n², ONE double division per entity, so the
    HUGEINT SQL twin matches bitwise.

    Scale shape: per-batch (user, n, Σx, Σy, Σx², Σy²) partials →
    ONE exact bucketed fold → one-row-per-user finish. Raw rows never
    shuffle.
    """
    tune_context()
    from .merge import bucketed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        x = tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key, inv = np.unique(u, return_inverse=True)
        m = key.size
        n = np.bincount(inv, minlength=m).astype(np.int64)
        sx = np.bincount(inv, weights=x, minlength=m).astype(np.int64)
        sy = np.bincount(inv, weights=y, minlength=m).astype(np.int64)
        sx2 = np.bincount(inv, weights=(x * x).astype(np.float64), minlength=m)
        sy2 = np.bincount(inv, weights=(y * y).astype(np.float64), minlength=m)
        # bincount weights go through float64: exact only below 2^53 —
        # grid coords are <= 2^res <= 2^15 so x^2 <= 2^30 and per-batch
        # sums stay far under the exactness bound (COMBINE_BATCH·2^30 ≈ 2^46)
        return pa.table(
            {
                "user": key,
                "n": n,
                "sx": sx,
                "sy": sy,
                "sx2": sx2.astype(np.int64),
                "sy2": sy2.astype(np.int64),
            }
        )

    summed = bucketed_sum(
        tracks.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="user",
        value_cols=("n", "sx", "sy", "sx2", "sy2"),
        n_buckets=n_buckets,
    )

    def finish(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").to_numpy(zero_copy_only=False).astype(object)
        sx = tbl.column("sx").to_numpy(zero_copy_only=False).astype(object)
        sy = tbl.column("sy").to_numpy(zero_copy_only=False).astype(object)
        sx2 = tbl.column("sx2").to_numpy(zero_copy_only=False).astype(object)
        sy2 = tbl.column("sy2").to_numpy(zero_copy_only=False).astype(object)
        num = n * (sx2 + sy2) - sx * sx - sy * sy  # exact python ints
        rog2 = np.array(
            [float(a) / float(b * b) for a, b in zip(num, n)], np.float64
        )
        return pa.table(
            {
                "user_id": tbl.column("user"),
                "n_points": tbl.column("n"),
                "rog2": pa.array(rog2, pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def radius_of_gyration_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`radius_of_gyration` — HUGEINT-exact sums,
    one CAST-to-DOUBLE division per user."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS user_id, {gx} AS x, {gy} AS y
        FROM events e JOIN q ON e.event_id = q.event_id),
s AS (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sx2,
             CAST(SUM(y * y) AS HUGEINT) AS sy2
      FROM pts GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n_points,
       CAST(n * (sx2 + sy2) - sx * sx - sy * sy AS DOUBLE)
       / CAST(n * n AS DOUBLE) AS rog2
FROM s
"""


def jump_histogram(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Jump-length distribution — the third classic mobility statistic
    next to :func:`home_cells` and :func:`radius_of_gyration`:
    histogram of consecutive same-entity displacement lengths in
    log₂-spaced bins of the squared grid distance — ``(bin, n_moves)``
    with ``bin = ⌊log₂ d²⌋`` and ``bin = -1`` for zero-displacement
    fixes. Exact integers: the bin index comes from the FLOAT EXPONENT
    of the exact-int d² (``np.frexp`` — no libm log), the SQL twin
    from a generated power-of-two CASE ladder, so the two are
    identical by construction.

    Scale shape: the shared trajectory fold (ONE coarse entity-bucket
    shuffle of fixed-width ints, vectorized consecutive-pair mask),
    per-group bin counts, one tiny bucketed sum — output is
    ~60 rows max at any data size.
    """
    tune_context()
    from .merge import bucketed_sum

    def emit(cols, dt):
        if cols is None:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        (x1, x2) = cols[x_col]
        (y1, y2) = cols[y_col]
        dx = x2.astype(np.int64) - x1.astype(np.int64)
        dy = y2.astype(np.int64) - y1.astype(np.int64)
        d2 = dx * dx + dy * dy
        # floor(log2(d2)) via the float exponent — exact for d2 < 2^53
        bins = np.where(
            d2 > 0, np.frexp(d2.astype(np.float64))[1] - 1, np.int64(-1)
        ).astype(np.int64)
        key, inv = np.unique(bins, return_inverse=True)
        n = np.bincount(inv, minlength=key.size).astype(np.int64)
        return pa.table({"bin": key, "n": n})

    keyed = _bucketed(
        tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets
    )
    parts = _fold_pairs(keyed, (x_col, y_col), emit)
    return bucketed_sum(parts, key_col="bin", value_cols=("n",))


def jump_histogram_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`jump_histogram` — LAG pairs, exact-int
    d², generated power-of-two CASE ladder for the bin."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    max_bin = 2 * res + 1  # d2 <= 2*(2^res - 1)^2 < 2^(2res+1)
    ladder = " ".join(
        f"WHEN d2 < {1 << (k + 1)} THEN {k}" for k in range(max_bin + 1)
    )
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} AS x, {gy} AS y
        FROM events e JOIN q ON e.event_id = q.event_id),
mv AS (SELECT u, x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
       FROM pts WINDOW w AS (PARTITION BY u ORDER BY ts, seq)),
d AS (SELECT dx * dx + dy * dy AS d2 FROM mv WHERE dx IS NOT NULL),
b AS (SELECT CASE WHEN d2 = 0 THEN -1 {ladder} END AS bin FROM d)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY bin
"""


def segment_tiles(
    tracks: Dataset,
    res: int,
    fine_res: int,
    max_move: int = 128,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Supercover line rasterization of movement segments — every tile
    at resolution ``res`` a consecutive same-entity move passes
    through (the trajectory→raster footprint op: coverage heat-maps,
    corridor extraction). ``gx``/``gy`` must be grid indices at the
    finer ``fine_res``; output ``(user_id, seq, cell)`` with ``seq``
    the FROM event id, one row per (move, crossed tile). CLOSED
    semantics: a segment running along a tile boundary belongs to both
    tiles (the cover-boxes convention).

    Exactness: a tile square intersects a closed segment iff their
    closed bounding intervals overlap AND the square's four corners
    are not all STRICTLY on one side of the segment's supporting line
    (the complete separating-axis set for segment-vs-AABB: x, y, and
    the segment normal) — all evaluated in int64 (fine coords < 2^20
    keep every cross product exact), so the LAG + LATERAL SQL twin
    matches exactly. Teleport gate: moves with L∞ > ``max_move`` fine
    units are dropped (same convention as ``segment_crossings``).

    Scale shape: the shared trajectory fold (ONE entity-bucket shuffle
    of fixed-width ints); per move the candidate set is its bbox's
    ≤ (max_move/w + 2)² tiles, expanded and tested fully vectorized
    (repeat/arange, no per-move loop). Output is corridor-sized.
    """
    tune_context()

    if not 0 <= res <= fine_res <= 15:
        raise ValueError(
            f"segment_tiles: need 0 <= res <= fine_res <= 15, got {res}, {fine_res}"
        )
    shift = fine_res - res
    g = np.int64(1 << res)
    w = np.int64(1 << shift)

    def emit(cols, dt):
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "seq": pa.array([], pa.int64()),
                "cell": pa.array([], pa.int64()),
            }
        )
        if cols is None:
            return empty
        x1, x2 = (v.astype(np.int64) for v in cols[x_col])
        y1, y2 = (v.astype(np.int64) for v in cols[y_col])
        u, _ = cols[key_col]
        s, _ = cols[seq_col]
        keep = np.maximum(np.abs(x2 - x1), np.abs(y2 - y1)) <= max_move
        if not keep.any():
            return empty
        x1, x2, y1, y2 = x1[keep], x2[keep], y1[keep], y2[keep]
        u = u[keep].astype(np.int64)
        s = s[keep].astype(np.int64)
        mnx, mxx = np.minimum(x1, x2), np.maximum(x1, x2)
        mny, mxy = np.minimum(y1, y2), np.maximum(y1, y2)
        # candidate tile ranges, low side widened by 1 for the closed-
        # boundary case (a point exactly on a tile edge hits both tiles)
        cx0 = np.maximum(mnx // w - 1, 0)
        cx1 = mxx // w
        cy0 = np.maximum(mny // w - 1, 0)
        cy1 = mxy // w
        nx = (cx1 - cx0 + 1).astype(np.int64)
        ny = (cy1 - cy0 + 1).astype(np.int64)
        per = nx * ny
        row = np.repeat(np.arange(per.size, dtype=np.int64), per)
        # local candidate index within each move's range, then (cx, cy)
        off = np.concatenate([[0], np.cumsum(per)[:-1]])
        loc = np.arange(int(per.sum()), dtype=np.int64) - off[row]
        cx = cx0[row] + loc // ny[row]
        cy = cy0[row] + loc % ny[row]
        X0, X1 = cx * w, (cx + 1) * w
        Y0, Y1 = cy * w, (cy + 1) * w
        # closed bbox overlap on both axes
        ok = (mxx[row] >= X0) & (mnx[row] <= X1) & (mxy[row] >= Y0) & (mny[row] <= Y1)
        # corner-side test on the segment normal
        dx = (x2 - x1)[row]
        dy = (y2 - y1)[row]
        rx1, ry1 = x1[row], y1[row]
        c1 = dx * (Y0 - ry1) - dy * (X0 - rx1)
        c2 = dx * (Y0 - ry1) - dy * (X1 - rx1)
        c3 = dx * (Y1 - ry1) - dy * (X0 - rx1)
        c4 = dx * (Y1 - ry1) - dy * (X1 - rx1)
        pos = (c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)
        neg = (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
        ok &= ~(pos | neg)
        return pa.table(
            {
                "user_id": u[row][ok],
                "seq": s[row][ok],
                "cell": (cx * g + cy)[ok],
            }
        )

    keyed = _bucketed(
        tracks, key_col, ts_col, seq_col, (x_col, y_col, key_col, seq_col), n_buckets
    )
    return _fold_pairs(keyed, (x_col, y_col, key_col, seq_col), emit)


def segment_tiles_sql(
    points_cte: str, res: int, fine_res: int, max_move: int = 128
) -> str:
    """DuckDB twin of :func:`segment_tiles` — LAG pairs, LATERAL tile
    ranges, identical closed bbox + corner-side integer tests."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", fine_res)
    gy = derive.tile_index_sql("q.py", fine_res)
    g = 1 << res
    w = 1 << (fine_res - res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} AS x, {gy} AS y
        FROM events e JOIN q ON e.event_id = q.event_id),
mv AS (SELECT u, seq,
              LAG(x) OVER win AS x1, LAG(y) OVER win AS y1,
              x AS x2, y AS y2,
              LAG(seq) OVER win AS seq1
       FROM pts WINDOW win AS (PARTITION BY u ORDER BY ts, seq)),
seg AS (SELECT u, seq1 AS seq, x1, y1, x2, y2
        FROM mv
        WHERE x1 IS NOT NULL
          AND GREATEST(ABS(x2 - x1), ABS(y2 - y1)) <= {max_move}),
cand AS (SELECT seg.*, cx.cx, cy.cy
         FROM seg,
              LATERAL (SELECT unnest(generate_series(
                  GREATEST(LEAST(x1, x2) // {w} - 1, 0),
                  GREATEST(x1, x2) // {w})) AS cx) cx,
              LATERAL (SELECT unnest(generate_series(
                  GREATEST(LEAST(y1, y2) // {w} - 1, 0),
                  GREATEST(y1, y2) // {w})) AS cy) cy)
SELECT u AS user_id, seq, CAST(cx * {g} + cy AS BIGINT) AS cell
FROM cand
WHERE GREATEST(x1, x2) >= cx * {w} AND LEAST(x1, x2) <= (cx + 1) * {w}
  AND GREATEST(y1, y2) >= cy * {w} AND LEAST(y1, y2) <= (cy + 1) * {w}
  AND NOT (
    ((x2 - x1) * (cy * {w} - y1) - (y2 - y1) * (cx * {w} - x1) > 0
     AND (x2 - x1) * (cy * {w} - y1) - (y2 - y1) * ((cx + 1) * {w} - x1) > 0
     AND (x2 - x1) * ((cy + 1) * {w} - y1) - (y2 - y1) * (cx * {w} - x1) > 0
     AND (x2 - x1) * ((cy + 1) * {w} - y1) - (y2 - y1) * ((cx + 1) * {w} - x1) > 0)
    OR
    ((x2 - x1) * (cy * {w} - y1) - (y2 - y1) * (cx * {w} - x1) < 0
     AND (x2 - x1) * (cy * {w} - y1) - (y2 - y1) * ((cx + 1) * {w} - x1) < 0
     AND (x2 - x1) * ((cy + 1) * {w} - y1) - (y2 - y1) * (cx * {w} - x1) < 0
     AND (x2 - x1) * ((cy + 1) * {w} - y1) - (y2 - y1) * ((cx + 1) * {w} - x1) < 0)
  )
"""


_TURN_LABELS = ("degenerate", "left", "right", "straight", "uturn")


def turn_histogram(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-entity turning-behavior histogram over consecutive move
    PAIRS (three consecutive fixes): ``(user_id, turn, n_turns)``
    where ``turn`` classifies the second move relative to the first by
    the EXACT integer cross/dot signs — ``left`` (cross > 0),
    ``right`` (cross < 0), ``straight`` (cross = 0, dot > 0),
    ``uturn`` (cross = 0, dot < 0), ``degenerate`` (either move has
    zero length). No angles, no floats — the double-LAG SQL twin
    matches bit-for-bit. The rotation companion of
    :func:`heading_histogram` (commute-loop chirality, wandering vs
    directed movement).

    Scale shape: the shared trajectory fold machinery extended to
    TRIPLES — same ONE entity-bucket shuffle of fixed-width ints; the
    per-bucket lexsort fold takes consecutive same-key row triples and
    collapses them to ≤5 rows per entity; ONE tiny coarse-bucket sum.
    """
    tune_context()
    from .merge import bucketed_sum

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        key = group.column("_mv_key").to_numpy(zero_copy_only=False)
        if key.size < 3:
            return empty
        ts = (
            group.column("_mv_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("_mv_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s = key[order]
        same2 = (k_s[2:] == k_s[:-2])
        if not same2.any():
            return empty
        x = group.column(x_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
        y = group.column(y_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
        x1, x2, x3 = x[:-2][same2], x[1:-1][same2], x[2:][same2]
        y1, y2, y3 = y[:-2][same2], y[1:-1][same2], y[2:][same2]
        u = k_s[:-2][same2]
        d1x, d1y = x2 - x1, y2 - y1
        d2x, d2y = x3 - x2, y3 - y2
        cross = d1x * d2y - d1y * d2x
        dot = d1x * d2x + d1y * d2y
        degen = ((d1x == 0) & (d1y == 0)) | ((d2x == 0) & (d2y == 0))
        cls = np.where(
            degen,
            0,
            np.where(
                cross > 0,
                1,
                np.where(cross < 0, 2, np.where(dot > 0, 3, 4)),
            ),
        ).astype(np.int64)
        k2, n = np.unique(u * 8 + cls, return_counts=True)
        return pa.table({"key": k2, "n": n.astype(np.int64)})

    keyed = _bucketed(tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets)
    folded = keyed.groupby("_mv_bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": key // 8,
                "turn": pa.array(
                    [_TURN_LABELS[int(c)] for c in key % 8], pa.string()
                ),
                "n_turns": tbl.column("n"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def turn_histogram_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`turn_histogram` — double-LAG windows,
    identical exact integer cross/dot classification."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} AS x, {gy} AS y
        FROM events e JOIN q ON e.event_id = q.event_id),
tr AS (SELECT u,
              LAG(x, 2) OVER w AS x1, LAG(y, 2) OVER w AS y1,
              LAG(x, 1) OVER w AS x2, LAG(y, 1) OVER w AS y2,
              x AS x3, y AS y3
       FROM pts WINDOW w AS (PARTITION BY u ORDER BY ts, seq)),
t3 AS (SELECT u,
              (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2) AS cr,
              (x2 - x1) * (x3 - x2) + (y2 - y1) * (y3 - y2) AS dt,
              (x2 = x1 AND y2 = y1) OR (x3 = x2 AND y3 = y2) AS degen
       FROM tr WHERE x1 IS NOT NULL),
c AS (SELECT u,
             CASE WHEN degen THEN 'degenerate'
                  WHEN cr > 0 THEN 'left'
                  WHEN cr < 0 THEN 'right'
                  WHEN dt > 0 THEN 'straight'
                  ELSE 'uturn' END AS turn
      FROM t3)
SELECT u AS user_id, turn, CAST(COUNT(*) AS BIGINT) AS n_turns
FROM c GROUP BY u, turn
"""


def tile_motifs(
    tracks: Dataset,
    res: int,
    k: int = 50,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Global top-k trajectory MOTIFS — the most frequent consecutive
    tile trigrams across all entity tracks (the sequence-mining
    primitive behind route popularity / next-tile models):
    ``(from_cell, mid_cell, to_cell, n, rank)`` ranked by
    ``(n DESC, trigram ASC)``.

    Scale shape: the shared trajectory TRIPLE fold (ONE entity-bucket
    shuffle of fixed-width ints); each bucket collapses its triples to
    distinct packed trigram keys (6·res bits — res ≤ 10 guards int64);
    ONE metadata-sized key-bucket sum; map-side-pruned global top-k
    (never a global sort).
    """
    tune_context()
    from .merge import bucketed_sum, global_topk

    if not 0 <= res <= 10:
        raise ValueError(f"tile_motifs: res must be in [0, 10], got {res}")
    g = np.int64(1 << res)
    g2 = g * g

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        key = group.column("_mv_key").to_numpy(zero_copy_only=False)
        if key.size < 3:
            return empty
        ts = (
            group.column("_mv_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("_mv_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s = key[order]
        same2 = k_s[2:] == k_s[:-2]
        if not same2.any():
            return empty
        x = group.column(x_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
        y = group.column(y_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
        cell = x * g + y
        tri = (
            cell[:-2][same2] * (g2 * g2)
            + cell[1:-1][same2] * g2
            + cell[2:][same2]
        )
        ks, n = np.unique(tri, return_counts=True)
        return pa.table({"key": ks, "n": n.astype(np.int64)})

    keyed = _bucketed(tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets)
    folded = keyed.groupby("_mv_bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))
    top = global_topk(summed, k, id_col="key", value_col="n")

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_cell": key // (g2 * g2),
                "mid_cell": (key // g2) % g2,
                "to_cell": key % g2,
                "n": tbl.column("n"),
                "rank": tbl.column("rank"),
            }
        )

    return top.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def tile_motifs_sql(points_cte: str, res: int, k: int = 50) -> str:
    """DuckDB twin of :func:`tile_motifs` — double-LAG trigram counts,
    ROW_NUMBER with the identical (n DESC, packed-trigram ASC) order."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    g = 1 << res
    g2 = g * g
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} * {g} + {gy} AS cell
        FROM events e JOIN q ON e.event_id = q.event_id),
tr AS (SELECT u, LAG(cell, 2) OVER w AS c1, LAG(cell, 1) OVER w AS c2,
              cell AS c3
       FROM pts WINDOW w AS (PARTITION BY u ORDER BY ts, seq)),
c AS (SELECT c1, c2, c3, CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE c1 IS NOT NULL GROUP BY 1, 2, 3),
r AS (SELECT c1, c2, c3, n, ROW_NUMBER() OVER
        (ORDER BY n DESC, c1 * {g2}::BIGINT * {g2} + c2 * {g2} + c3) AS rank
      FROM c)
SELECT c1 AS from_cell, c2 AS mid_cell, c3 AS to_cell, n,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def interarrival_hist(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    n_buckets: int = 256,
) -> Dataset:
    """Inter-arrival-time distribution — histogram of the µs gaps
    between consecutive same-entity events in log₂ lags:
    ``(bin, n_gaps)`` with ``bin = ⌊log₂ dt_us⌋`` and ``bin = -1`` for
    zero gaps (same-timestamp bursts). The temporal companion of
    :func:`jump_histogram` (burstiness / session-cadence profiling);
    same exactness trick: the bin is the float exponent of the exact
    int64 gap (``np.frexp``), the SQL twin a power-of-two CASE ladder.

    Scale shape: the shared trajectory pair fold — ONE entity-bucket
    shuffle of (key, ts, seq) only, per-group bin counts, one tiny
    bucketed sum; ≤64 output rows at any size.
    """
    tune_context()
    from .merge import bucketed_sum

    def emit(cols, dt):
        if dt is None:
            return pa.table(
                {"bin": pa.array([], pa.int64()), "n_gaps": pa.array([], pa.int64())}
            )
        bins = np.where(
            dt > 0, np.frexp(dt.astype(np.float64))[1] - 1, np.int64(-1)
        ).astype(np.int64)
        key, inv = np.unique(bins, return_inverse=True)
        n = np.bincount(inv, minlength=key.size).astype(np.int64)
        return pa.table({"bin": key, "n_gaps": n})

    keyed = _bucketed(tracks, key_col, ts_col, seq_col, (), n_buckets)
    parts = _fold_pairs(keyed, (), emit)
    return bucketed_sum(parts, key_col="bin", value_cols=("n_gaps",))


def interarrival_hist_sql(table: str = "events", max_bin: int = 44) -> str:
    """DuckDB twin of :func:`interarrival_hist` — LAG gap in µs,
    generated power-of-two CASE ladder (dt < 2^45 ≈ 1100 years)."""
    ladder = " ".join(
        f"WHEN dt < {1 << (k + 1)} THEN {k}" for k in range(max_bin + 1)
    )
    return f"""
WITH mv AS (SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS dt
            FROM {table}),
d AS (SELECT dt FROM mv WHERE dt IS NOT NULL),
b AS (SELECT CASE WHEN dt = 0 THEN -1 {ladder} END AS bin FROM d)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM b GROUP BY bin
"""


def max_dwell_run(
    tracks: Dataset,
    res: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Longest consecutive same-tile RUN per entity — the
    gaps-and-islands statistic (max uninterrupted dwell streak):
    ``(user_id, max_run)`` over the (ts, seq)-ordered event stream.
    Exact integers; the SQL twin is the classic double-ROW_NUMBER
    islands trick.

    Scale shape: ONE entity-bucket shuffle (fixed-width ints); the
    per-bucket fold finds run boundaries with one vectorized
    change-mask + reduceat — no per-entity Python.
    """
    tune_context()

    g = np.int64(1 << res)

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "max_run": pa.array([], pa.int64()),
            }
        )
        key = group.column("_mv_key").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return empty
        ts = (
            group.column("_mv_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("_mv_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s = key[order]
        x = group.column(x_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
        y = group.column(y_col).to_numpy(zero_copy_only=False)[order].astype(np.int64)
        cell = x * g + y
        # run starts: entity change OR tile change
        rstart = np.flatnonzero(
            np.r_[True, (k_s[1:] != k_s[:-1]) | (cell[1:] != cell[:-1])][: k_s.size]
        )
        rlen = np.diff(np.r_[rstart, k_s.size]).astype(np.int64)
        rkey = k_s[rstart]
        # per-entity max run (runs of one entity are contiguous)
        ustart = np.flatnonzero(np.r_[True, rkey[1:] != rkey[:-1]][: rkey.size])
        return pa.table(
            {
                key_col: rkey[ustart],
                "max_run": np.maximum.reduceat(rlen, ustart),
            }
        )

    keyed = _bucketed(tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets)
    return keyed.groupby("_mv_bucket").map_groups(fold, batch_format="pyarrow")


def max_dwell_run_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`max_dwell_run` — double-ROW_NUMBER
    gaps-and-islands over the identical tile stream."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    g = 1 << res
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} * {g} + {gy} AS cell
        FROM events e JOIN q ON e.event_id = q.event_id),
r AS (SELECT u, cell,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, seq)
           - ROW_NUMBER() OVER (PARTITION BY u, cell ORDER BY ts, seq) AS grp
      FROM pts),
runs AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS len
         FROM r GROUP BY u, cell, grp)
SELECT u AS user_id, CAST(MAX(len) AS BIGINT) AS max_run
FROM runs GROUP BY u
"""


def od_asymmetry(
    tracks: Dataset,
    res: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Directional flow imbalance between tile pairs — for every
    unordered pair with traffic, the forward / reverse move counts and
    the net flow (commute directionality, one-way corridors):
    ``(cell_a, cell_b, n_ab, n_ba, net)`` with ``cell_a < cell_b`` and
    ``net = n_ab − n_ba``. Self-loops are excluded (no direction).

    Scale shape: the shared trajectory pair fold; each batch collapses
    its moves to distinct unordered-pair partial rows (packed key —
    ``res ≤ 15`` guards the 4·res-bit int64 pack, as in
    :func:`od_matrix`); ONE metadata-sized key-bucket sum.
    """
    tune_context()
    from .merge import bucketed_sum

    if not 0 <= res <= 15:
        raise ValueError(f"od_asymmetry: res must be in [0, 15], got {res}")
    g = np.int64(1 << res)
    g2 = g * g

    def emit(cols, dt):
        empty = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "n_ab": pa.array([], pa.int64()),
                "n_ba": pa.array([], pa.int64()),
            }
        )
        if cols is None:
            return empty
        fx, tx = cols[x_col]
        fy, ty = cols[y_col]
        frm = fx.astype(np.int64) * g + fy.astype(np.int64)
        to = tx.astype(np.int64) * g + ty.astype(np.int64)
        m = frm != to
        frm, to = frm[m], to[m]
        if frm.size == 0:
            return empty
        a = np.minimum(frm, to)
        b = np.maximum(frm, to)
        fwd = frm < to
        key, inv = np.unique(a * g2 + b, return_inverse=True)
        n_ab = np.bincount(inv, weights=fwd, minlength=key.size).astype(np.int64)
        n_ba = np.bincount(inv, weights=~fwd, minlength=key.size).astype(np.int64)
        return pa.table({"key": key, "n_ab": n_ab, "n_ba": n_ba})

    keyed = _bucketed(tracks, key_col, ts_col, seq_col, (x_col, y_col), n_buckets)
    folded = _fold_pairs(keyed, (x_col, y_col), emit)
    summed = bucketed_sum(folded, key_col="key", value_cols=("n_ab", "n_ba"))

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        n_ab = tbl.column("n_ab").to_numpy(zero_copy_only=False)
        n_ba = tbl.column("n_ba").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell_a": key // g2,
                "cell_b": key % g2,
                "n_ab": n_ab,
                "n_ba": n_ba,
                "net": n_ab - n_ba,
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def od_asymmetry_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`od_asymmetry` — LAG moves, LEAST/GREATEST
    unordered pair, conditional sums."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    g = 1 << res
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} * {g} + {gy} AS cell
        FROM events e JOIN q ON e.event_id = q.event_id),
mv AS (SELECT u, LAG(cell) OVER (PARTITION BY u ORDER BY ts, seq) AS f,
              cell AS t
       FROM pts),
m2 AS (SELECT LEAST(f, t) AS a, GREATEST(f, t) AS b,
              CASE WHEN f < t THEN 1 ELSE 0 END AS fw,
              CASE WHEN f > t THEN 1 ELSE 0 END AS rv
       FROM mv WHERE f IS NOT NULL AND f <> t)
SELECT a AS cell_a, b AS cell_b,
       CAST(SUM(fw) AS BIGINT) AS n_ab,
       CAST(SUM(rv) AS BIGINT) AS n_ba,
       CAST(SUM(fw) - SUM(rv) AS BIGINT) AS net
FROM m2 GROUP BY a, b
"""


def user_first_last(
    events: Dataset,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    n_buckets: int = 256,
) -> Dataset:
    """FIRST_VALUE / LAST_VALUE window shape per entity stream: each
    user's first and last event type (ordered by ts then seq — fully
    deterministic under ties) plus first/last timestamps and the event
    count. Types shuffle as small int codes from one metadata-sized
    vocabulary pass; ONE user-bucket shuffle of fixed-width columns,
    segment boundaries found by a vectorized lexsort per bucket."""
    tune_context()
    import pyarrow.compute as pc

    types = distinct_strings(events, type_col)
    tarr = pa.array(types, pa.string())
    code_col = "_mv_code"

    def recode(tbl: pa.Table) -> pa.Table:
        code = pc.index_in(tbl.column(type_col), value_set=tarr).cast(pa.int64())
        return tbl.append_column(code_col, code)

    keyed = _bucketed(
        events, key_col, ts_col, seq_col, (code_col,), n_buckets, recode=recode
    )

    def fold(group: pa.Table) -> pa.Table:
        key = group.column("_mv_key").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "first_type": pa.array([], pa.string()),
                    "last_type": pa.array([], pa.string()),
                    "first_ts": pa.array([], pa.timestamp("us")),
                    "last_ts": pa.array([], pa.timestamp("us")),
                }
            )
        ts = (
            group.column("_mv_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("_mv_seq").to_numpy(zero_copy_only=False)
        code = group.column(code_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, key))
        k_s, ts_s, c_s = key[order], ts[order], code[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size] - 1
        return pa.table(
            {
                "user_id": pa.array(k_s[starts], pa.int64()),
                "n_events": pa.array(
                    np.diff(np.r_[starts, k_s.size]).astype(np.int64)
                ),
                "first_type": tarr.take(pa.array(c_s[starts], pa.int64())),
                "last_type": tarr.take(pa.array(c_s[ends], pa.int64())),
                "first_ts": pa.array(
                    ts_s[starts].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "last_ts": pa.array(
                    ts_s[ends].astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return keyed.groupby("_mv_bucket").map_groups(fold, batch_format="pyarrow")


def user_first_last_sql() -> str:
    """DuckDB twin of :func:`user_first_last` on the events table."""
    return """
WITH r AS (SELECT user_id, event_type, ts,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
       COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       MAX(CASE WHEN rn = n THEN event_type END) AS last_type,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM r GROUP BY user_id, n
"""
