"""Trajectory operators over georeferenced event streams.

``trajectory_length`` is the track-statistics op of a movement-data
pipeline (fleet telemetry, check-in streams): per entity, order its
points in time and fold consecutive-point displacements. Distances are
L1 on an integer grid so every sum is exact int64 — the SQL oracle
(``LAG`` window + ``GROUP BY``) matches bit-for-bit, and the result is
independent of partitioning.

Scale shape: ONE coarse key-hash bucket shuffle of (key, ts, seq, gx,
gy) — five fixed-width columns, never payloads — then each bucket is
sorted and folded in one vectorized pass (lexsort + diff + reduceat),
exactly the sessionization machinery (`windows.session_window_agg`).
Buckets are independent, so skewed entities salt the same way sessions
do. Reference parity: none (beyond-reference north-rule spatio-temporal
surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of


def trajectory_length(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-key L1 path length over points ordered by (ts, seq):
    ``(key, n_moves, l1_len)``; keys with a single point are absent
    (zero moves). ``gx``/``gy`` must be integer grid coordinates."""
    tune_context()

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(k, n_buckets)))

    def fold(group: pa.Table) -> pa.Table:
        key = group.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column(seq_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gx = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gy = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n_moves": pa.array([], pa.int64()),
                "l1_len": pa.array([], pa.int64()),
            }
        )
        if key.size < 2:
            return empty
        order = np.lexsort((seq, ts, key))
        k_s, gx_s, gy_s = key[order], gx[order], gy[order]
        same = k_s[1:] == k_s[:-1]  # consecutive rows, same key
        if not same.any():
            return empty
        step = np.abs(np.diff(gx_s)) + np.abs(np.diff(gy_s))
        owner = k_s[1:][same]  # sorted, since k_s is sorted
        step = step[same]
        starts = np.flatnonzero(np.r_[True, owner[1:] != owner[:-1]][: owner.size])
        return pa.table(
            {
                key_col: pa.array(owner[starts], pa.int64()),
                "n_moves": pa.array(
                    np.diff(np.r_[starts, owner.size]).astype(np.int64)
                ),
                "l1_len": pa.array(np.add.reduceat(step, starts), pa.int64()),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def _dp_keep(x: np.ndarray, y: np.ndarray, eps: int) -> np.ndarray:
    """Douglas-Peucker keep mask over ONE track (points in path order).

    Exact integer arithmetic: a point survives a segment (a, b) when its
    perpendicular deviation exceeds eps, tested as
    ``cross(p-a, b-a)^2 > eps^2 * |b-a|^2`` (degenerate a==b falls back
    to squared point distance) — no floats, so the result is bitwise
    reproducible and partitioning-invariant. With grid coords < 2^20
    the vectorized terms (|cross| < 2^43, squared point distance < 2^43)
    fit int64 exactly; the one squared comparison per segment is done in
    Python arbitrary-precision ints, so ``cross^2`` (up to 86 bits) never
    touches int64. The split point is argmax(|cross|), which equals
    argmax(cross^2) by monotonicity. Recursion is an explicit stack; the
    per-segment deviation scan is vectorized."""
    n = x.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = int(eps) * int(eps)  # Python int: immune to overflow for any eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        dx, dy = bx - ax, by - ay
        px = x[i + 1 : j] - ax
        py = y[i + 1 : j] - ay
        l2 = dx * dx + dy * dy
        if l2 == 0:
            num = px * px + py * py  # coords < 2^20 => < 2^43, exact int64
            m = int(np.argmax(num))  # first max: deterministic split point
            exceeds = int(num[m]) > int(eps2)
        else:
            # |cr| < 2^43 at coords < 2^20 — exact int64. argmax(|cr|) ==
            # argmax(cr^2); square only the winner, in Python ints (exact).
            acr = np.abs(px * dy - py * dx)
            m = int(np.argmax(acr))
            exceeds = int(acr[m]) ** 2 > int(eps2) * int(l2)
        if exceeds:
            k = i + 1 + m
            keep[k] = True
            stack.append((k, j))
            stack.append((i, k))
    return keep


def trajectory_simplify(
    tracks: Dataset,
    eps: int = 2,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-key Douglas-Peucker line simplification over points ordered
    by (ts, seq): the kept points ``(key, seq, gx, gy)`` of every track
    (track endpoints always kept; single-point tracks kept whole).

    The movement-data compaction op: telemetry tracks shrink to their
    shape-defining vertices before storage/rendering. Scale shape is
    :func:`trajectory_length`'s — ONE coarse key-hash shuffle of five
    fixed-width int columns, then per-bucket lexsort + per-track
    vectorized DP (tracks within a bucket are independent; the
    per-track loop is over TRACKS, not rows). Integer deviation test →
    bitwise-identical output at any parallelism (pytest-oracled against
    a recursive reference implementation; no SQL twin — recursive
    geometry is outside the oracle dialect).
    """
    tune_context()

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(k, n_buckets)))

    def fold(group: pa.Table) -> pa.Table:
        key = group.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column(seq_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gx = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gy = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if key.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    seq_col: pa.array([], pa.int64()),
                    x_col: pa.array([], pa.int64()),
                    y_col: pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((seq, ts, key))
        k_s, s_s = key[order], seq[order]
        gx_s, gy_s = gx[order], gy[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size]
        keep = np.zeros(k_s.size, dtype=bool)
        for a, b in zip(starts, ends):  # loop over tracks, not rows
            keep[a:b] = _dp_keep(gx_s[a:b], gy_s[a:b], eps)
        return pa.table(
            {
                key_col: pa.array(k_s[keep], pa.int64()),
                seq_col: pa.array(s_s[keep], pa.int64()),
                x_col: pa.array(gx_s[keep], pa.int64()),
                y_col: pa.array(gy_s[keep], pa.int64()),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def _hull_indices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull over int64 points → indices of
    the hull vertices in CCW order starting at the lexicographically
    smallest point. STRICT turns (cross > 0 kept), so collinear edge
    points are excluded — the minimal hull. Duplicate coordinates are
    collapsed to the occurrence with the smallest original index, which
    together with the integer cross products makes the result exact and
    independent of input order. Coordinates < 2^20 keep every cross
    product inside int64."""
    n = x.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((np.arange(n), y, x))
    xs, ys = x[order], y[order]
    uniq = np.r_[True, (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])][: xs.size]
    order = order[uniq]
    xs, ys = xs[uniq], ys[uniq]
    m = order.shape[0]
    if m <= 2:
        return order
    def chain(idx):
        out: list[int] = []
        for i in idx:
            while len(out) >= 2:
                ax, ay = xs[out[-2]], ys[out[-2]]
                bx, by = xs[out[-1]], ys[out[-1]]
                if (bx - ax) * (ys[i] - ay) - (by - ay) * (xs[i] - ax) > 0:
                    break
                out.pop()
            out.append(i)
        return out
    lower = chain(range(m))
    upper = chain(range(m - 1, -1, -1))
    ring = lower[:-1] + upper[:-1]
    return order[np.array(ring, dtype=np.int64)]


def trajectory_hull(
    tracks: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-key convex hull of the visited grid points — the coverage
    footprint of each entity's track: ``(key, hull_seq, gx, gy)`` with
    ``hull_seq`` numbering hull vertices 0..h-1 in CCW ring order from
    the lexicographically smallest vertex. Exact integer monotone chain
    (strict turns → minimal hull, no collinear edge points), so output
    is bitwise identical at any parallelism. Degenerate tracks keep
    their degenerate hull: 1 distinct point → one row; collinear points
    → the two extreme endpoints.

    Scale shape: ONE coarse key-hash bucket shuffle of five fixed-width
    int columns (`trajectory_length`'s budget); per-bucket hulls are
    independent and each loop runs over TRACKS (hull stack per track),
    with the sort vectorized. Pytest-oracled against a gift-wrapping
    reference; no SQL twin (ring ordering is outside the oracle
    dialect).
    """
    tune_context()

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": k,
                "gx": tbl.column(x_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "gy": tbl.column(y_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "bucket": bucket_of(k, n_buckets),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "hull_seq": pa.array([], pa.int64()),
                    x_col: pa.array([], pa.int64()),
                    y_col: pa.array([], pa.int64()),
                }
            )
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        k_s, x_s, y_s = key[order], gx[order], gy[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size]
        out_k, out_s, out_x, out_y = [], [], [], []
        for a, b in zip(starts, ends):  # loop over tracks, not rows
            h = _hull_indices(x_s[a:b], y_s[a:b])
            out_k.append(np.full(h.size, k_s[a], dtype=np.int64))
            out_s.append(np.arange(h.size, dtype=np.int64))
            out_x.append(x_s[a:b][h])
            out_y.append(y_s[a:b][h])
        return pa.table(
            {
                key_col: np.concatenate(out_k),
                "hull_seq": np.concatenate(out_s),
                x_col: np.concatenate(out_x),
                y_col: np.concatenate(out_y),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def stay_points_ref(
    ts: np.ndarray,
    gx: np.ndarray,
    gy: np.ndarray,
    r: int,
    min_dwell_us: int,
) -> list[tuple[int, int, int, int, int]]:
    """Reference stay-point scan for ONE time-ordered track (the classic
    anchor-advance detection of Li/Zheng et al., "Mining user similarity
    based on location history", GIS'08): grow a window from anchor i
    while every point stays within squared-int distance r^2 of the
    ANCHOR; if the window spans >= min_dwell_us, it is a stay. Exact
    integer arithmetic throughout. Returns
    ``(t_start, t_end, n_pts, sum_gx, sum_gy)`` tuples."""
    out = []
    n = ts.shape[0]
    i = 0
    r2 = int(r) * int(r)
    while i < n:
        dx = gx[i + 1 :] - gx[i]
        dy = gy[i + 1 :] - gy[i]
        far = (dx * dx + dy * dy) > r2
        j = int(np.argmax(far)) + i + 1 if far.any() else n
        if ts[j - 1] - ts[i] >= min_dwell_us:
            out.append(
                (
                    int(ts[i]),
                    int(ts[j - 1]),
                    j - i,
                    int(gx[i:j].sum()),
                    int(gy[i:j].sum()),
                )
            )
            i = j
        else:
            i += 1
    return out


def stay_points(
    tracks: Dataset,
    r: int = 8,
    min_dwell_us: int = 3_600_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-entity stay points: maximal anchor windows where the track
    stays within grid radius ``r`` of the window's first point for at
    least ``min_dwell_us``. Output ``(key, t_start, t_end, n_pts,
    sum_gx, sum_gy)`` — centroid sums exact int64 (caller divides), so
    results are bit-identical at any parallelism.

    Scale shape: the same ONE fixed-width entity-bucket shuffle as
    ``trajectory_length``; inside each bucket the anchor scan runs per
    track. The scan is inherently sequential in its anchor variable
    (same complexity class as the Douglas-Peucker fold above): each
    anchor advance does one vectorized distance sweep over the remaining
    window, O(track length) sweeps worst case — bounded by per-entity
    track length, never corpus size. No SQL twin (anchor recursion is
    not window-expressible); pytest-exact vs :func:`stay_points_ref`
    composed per track.
    """
    tune_context()

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(k, n_buckets)))

    def fold(group: pa.Table) -> pa.Table:
        key = group.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column(seq_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gx = group.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gy = group.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            key_col: [],
            "t_start": [],
            "t_end": [],
            "n_pts": [],
            "sum_gx": [],
            "sum_gy": [],
        }
        if key.size:
            order = np.lexsort((seq, ts, key))
            k_s, ts_s = key[order], ts[order]
            gx_s, gy_s = gx[order], gy[order]
            starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
            ends = np.r_[starts[1:], k_s.size]
            for s, e in zip(starts, ends):
                for t0, t1, np_, sx, sy in stay_points_ref(
                    ts_s[s:e], gx_s[s:e], gy_s[s:e], r, min_dwell_us
                ):
                    cols[key_col].append(int(k_s[s]))
                    cols["t_start"].append(t0)
                    cols["t_end"].append(t1)
                    cols["n_pts"].append(np_)
                    cols["sum_gx"].append(sx)
                    cols["sum_gy"].append(sy)
        return pa.table(
            {c: pa.array(v, pa.int64()) for c, v in cols.items()}
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def resample_track(
    tracks: Dataset,
    t0_us: int,
    step_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "px",
    y_col: str = "py",
    n_buckets: int = 256,
) -> Dataset:
    """Time-regular track resampling: per entity, linearly interpolate
    the position at every global epoch ``t0_us + k*step_us`` that falls
    inside the entity's observed span. Output ``(key, epoch, t_us, x,
    y)``. The classic preprocessing step before map-matching / flow
    models (uneven pings -> fixed cadence).

    Bracketing convention: epoch t lands on the last event with
    ``ts <= t`` (duplicate timestamps resolve to the (ts, seq)-last
    row, the same row DuckDB's half-open ``ts <= t < next_ts`` window
    join picks); an epoch equal to the entity's last ping emits that
    ping's exact position. Interpolation is
    ``x0 + (x1 - x0) * ((t - ts0) / (ts1 - ts0))`` with int64-µs gaps
    cast exactly to double, expression-shaped like the SQL twin, so
    doubles match bitwise.

    Scale shape: the standard ONE fixed-width entity-bucket shuffle;
    per bucket one lexsort, then per-entity vectorized epoch explosion
    (repeat/arange) + offset searchsorted — the per-entity loop does
    one numpy call per entity, bounded by entities-per-bucket, with all
    epoch math vectorized."""
    tune_context()
    t0_us, step_us = int(t0_us), int(step_us)
    if step_us <= 0:
        raise ValueError("step_us must be positive")

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(k, n_buckets)))

    def fold(group: pa.Table) -> pa.Table:
        key = group.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column(seq_col).to_numpy(zero_copy_only=False).astype(np.int64)
        px = group.column(x_col).to_numpy(zero_copy_only=False)
        py = group.column(y_col).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "epoch": pa.array([], pa.int64()),
                "t_us": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
            }
        )
        if key.size == 0:
            return empty
        order = np.lexsort((seq, ts, key))
        k_s, ts_s = key[order], ts[order]
        x_s, y_s = px[order], py[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size]
        # per-entity epoch ranges (assumes ts >= t0_us: ceil/floor by
        # nonnegative integer division, same arithmetic as the SQL twin)
        mn, mx = ts_s[starts], ts_s[ends - 1]
        if (mn < t0_us).any():
            raise ValueError("resample_track: timestamps before t0_us")
        k_lo = (mn - t0_us + step_us - 1) // step_us
        k_hi = (mx - t0_us) // step_us
        n_ep = np.maximum(k_hi - k_lo + 1, 0)
        total = int(n_ep.sum())
        if total == 0:
            return empty
        ent = np.repeat(np.arange(starts.size, dtype=np.int64), n_ep)
        offs = np.concatenate([[0], np.cumsum(n_ep)[:-1]])
        epoch = (np.arange(total, dtype=np.int64) - offs[ent]) + k_lo[ent]
        tk = t0_us + epoch * step_us
        # bracketing index: per-entity offset searchsorted. `ent` is a
        # sorted repeat of arange, so entity e's epochs are exactly the
        # slice [eoffs[e], eoffs[e+1]) — O(total log track) overall, no
        # O(entities x total) boolean rescans.
        idx = np.empty(total, np.int64)
        eoffs = np.concatenate([offs, [total]])
        for e in range(starts.size):
            a, b = int(eoffs[e]), int(eoffs[e + 1])
            if a == b:
                continue
            lo, hi = int(starts[e]), int(ends[e])
            idx[a:b] = lo + np.searchsorted(
                ts_s[lo:hi], tk[a:b], side="right"
            ) - 1
        last = idx == (ends[ent] - 1)  # epoch == entity's final ping
        i0 = idx
        i1 = np.minimum(idx + 1, ends[ent] - 1)
        f = np.zeros(total, np.float64)
        gap = ts_s[i1] - ts_s[i0]
        mid = ~last
        f[mid] = (tk[mid] - ts_s[i0[mid]]).astype(np.float64) / gap[
            mid
        ].astype(np.float64)
        x = x_s[i0] + (x_s[i1] - x_s[i0]) * f
        y = y_s[i0] + (y_s[i1] - y_s[i0]) * f
        # exact pass-through on the final ping (f undefined there)
        x[last] = x_s[i0[last]]
        y[last] = y_s[i0[last]]
        return pa.table(
            {
                key_col: pa.array(k_s[starts][ent]),
                "epoch": pa.array(epoch),
                "t_us": pa.array(tk),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


_EMPTY_HAUS = pa.table(
    {
        "user_a": pa.array([], pa.int64()),
        "user_b": pa.array([], pa.int64()),
        "hausdorff2": pa.array([], pa.int64()),
    }
)


def trajectory_hausdorff(
    tracks: Dataset,
    start_res: int,
    res: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Track-similarity join: symmetric Hausdorff SQUARED grid distance
    between the point sets of every pair of entities that start in the
    same coarse tile — ``(user_a, user_b, hausdorff2)``, ``user_a <
    user_b``, exact int64 (H² = max of the two directed
    max-over-min squared L2 distances; no division, no float). A
    pair's start tile is each entity's FIRST event by (ts, seq) mapped
    to the ``start_res`` grid (``res`` is the track grid the
    coordinates live on). The co-start blocking is both the semantics
    (compare journeys that begin together) and the scale lever: pair
    count is per-tile-quadratic, never global-quadratic.

    Scale shape: shuffle 1 is the standard entity-bucket fold (fixed-
    width ints) that tags every point row of an entity with its start
    tile; shuffle 2 co-locates whole entities by start tile and folds
    each tile with ONE chunked vectorized distance matrix. Point sets
    ship once; text/payloads never. Skew bound: a start tile holding S
    points costs S² int ops — salt-by-subsampling or cap S upstream if
    a tile degenerates (logged, not silent: group sizes are visible in
    ds.stats()).
    """
    tune_context()
    if not 0 <= start_res <= res:
        raise ValueError("trajectory_hausdorff: need 0 <= start_res <= res")
    shift = res - start_res
    gb = np.int64(1 << start_res)

    def bucket(tbl: pa.Table) -> pa.Table:
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
            "key": pa.array([], pa.int64()),
            "gx": pa.array([], pa.int64()),
            "gy": pa.array([], pa.int64()),
        }
    )

    def tag_start_tile(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size == 0:
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
        k_s = key[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        first = order[starts]  # first event row per entity
        tile_per_entity = (gx[first] >> shift) * gb + (gy[first] >> shift)
        # broadcast each entity's start tile onto all its rows
        inv = np.cumsum(np.r_[False, k_s[1:] != k_s[:-1]])
        tile_rows = np.empty(key.size, np.int64)
        tile_rows[order] = tile_per_entity[inv]
        return pa.table({"tile": tile_rows, "key": key, "gx": gx, "gy": gy})

    def pair_tile(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        users = np.unique(key)
        if users.size < 2:
            return _EMPTY_HAUS
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        k_s, x_s, y_s = key[order], gx[order], gy[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size]
        # per-pair cross blocks only — peak memory is max |A|·|B|, never
        # the full tile-points² matrix
        ua, ub, h2 = [], [], []
        for i in range(users.size):
            xa = x_s[starts[i] : ends[i], None]
            ya = y_s[starts[i] : ends[i], None]
            for j in range(i + 1, users.size):
                xb = x_s[None, starts[j] : ends[j]]
                yb = y_s[None, starts[j] : ends[j]]
                blk = (xa - xb) ** 2 + (ya - yb) ** 2
                # directed: every point of A to its nearest of B, and back
                h = max(blk.min(axis=1).max(), blk.min(axis=0).max())
                ua.append(users[i])
                ub.append(users[j])
                h2.append(h)
        return pa.table(
            {
                "user_a": np.array(ua, np.int64),
                "user_b": np.array(ub, np.int64),
                "hausdorff2": np.array(h2, np.int64),
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    tagged = keyed.groupby("bucket").map_groups(
        tag_start_tile, batch_format="pyarrow"
    )
    return tagged.groupby("tile").map_groups(pair_tile, batch_format="pyarrow")


def trajectory_hausdorff_sql(points_cte: str, start_res: int, res: int) -> str:
    """DuckDB twin of :func:`trajectory_hausdorff` over the events
    table; ``points_cte`` yields (event_id, px, py)."""
    from ..functions import derive

    shift = res - start_res
    gb = 1 << start_res
    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS u, e.ts AS ts, e.event_id AS seq,
               {gx} AS gx, {gy} AS gy
        FROM events e JOIN q ON e.event_id = q.event_id),
fst AS (SELECT u, gx, gy,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, seq) AS rn
        FROM pts),
st AS (SELECT u, (gx // {1 << shift}) * {gb} + (gy // {1 << shift}) AS tile
       FROM fst WHERE rn = 1),
pairs AS (SELECT a.u AS ua, b.u AS ub
          FROM st a JOIN st b ON a.tile = b.tile AND a.u < b.u),
dab AS (SELECT pr.ua, pr.ub, p1.seq,
               MIN((p1.gx - p2.gx) * (p1.gx - p2.gx)
                   + (p1.gy - p2.gy) * (p1.gy - p2.gy)) AS md
        FROM pairs pr
        JOIN pts p1 ON p1.u = pr.ua
        JOIN pts p2 ON p2.u = pr.ub
        GROUP BY pr.ua, pr.ub, p1.seq),
dba AS (SELECT pr.ua, pr.ub, p2.seq,
               MIN((p1.gx - p2.gx) * (p1.gx - p2.gx)
                   + (p1.gy - p2.gy) * (p1.gy - p2.gy)) AS md
        FROM pairs pr
        JOIN pts p1 ON p1.u = pr.ua
        JOIN pts p2 ON p2.u = pr.ub
        GROUP BY pr.ua, pr.ub, p2.seq),
hab AS (SELECT ua, ub, MAX(md) AS h FROM dab GROUP BY ua, ub),
hba AS (SELECT ua, ub, MAX(md) AS h FROM dba GROUP BY ua, ub)
SELECT hab.ua AS user_a, hab.ub AS user_b,
       CAST(GREATEST(hab.h, hba.h) AS BIGINT) AS hausdorff2
FROM hab JOIN hba ON hab.ua = hba.ua AND hab.ub = hba.ub
"""


_EMPTY_DTW = pa.table(
    {
        "user_a": pa.array([], pa.int64()),
        "user_b": pa.array([], pa.int64()),
        "dtw2": pa.array([], pa.int64()),
    }
)

# large-but-safe int64 sentinel for DP boundaries: one third of int64 max
# so `cost + min(three sentinels)` can never wrap
_DTW_INF = (1 << 62) // 3


def trajectory_dtw(
    tracks: Dataset,
    start_res: int,
    res: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
    max_len: int = 4096,
    band: int = 8,
    pair_chunk: int = 2048,
) -> Dataset:
    """Banded dynamic-time-warping track-similarity join between
    co-started entities — ``(user_a, user_b, dtw2)``, ``user_a <
    user_b``, where ``dtw2`` is the Sakoe–Chiba-banded DTW optimal
    alignment cost with squared-L2 grid step costs: exact int64 end to
    end (sums of integer squared distances along the optimal monotone
    alignment path with ``|i − j| ≤ w``; no float, no division). Each
    pair's band is its OWN ``w = max(band, |La − Lb|)`` (the widening
    keeps every pair feasible and makes results independent of how
    pairs are chunked). The ORDERED companion of
    :func:`trajectory_hausdorff` (which ignores visit order): two
    users tracing the same loop in opposite directions are
    near-identical under Hausdorff but far apart under DTW. Same
    co-start blocking (first event's coarse tile at ``start_res``) —
    the pair count stays per-tile-quadratic.

    Scale/vectorization shape: same two shuffles as hausdorff (entity-
    bucket fold tags start tiles, ONE tile shuffle co-locates whole
    entities). Inside a tile the DP is NOT a per-pair Python loop and
    never materializes a (pairs × L × L) cost tensor: pairs advance
    together along anti-diagonals in chunks of ``pair_chunk``, each
    diagonal one vectorized gather/min/add over a (chunk ×
    band-width) slab — O(pairs · L · w) work and O(chunk · w) memory
    instead of O(pairs · L²) (the unbanded form was measured 30×
    slower at avg track length 67). Tracks longer than ``max_len``
    raise loudly — simplify or window tracks upstream, never silently
    truncate. DP recursion is not ANSI-SQL-expressible → rows-only
    op; exactness is pytest-checked against a per-pair reference DP
    with the identical band rule.
    """
    tune_context()
    if not 0 <= start_res <= res:
        raise ValueError("trajectory_dtw: need 0 <= start_res <= res")
    shift = res - start_res
    gb = np.int64(1 << start_res)

    def bucket(tbl: pa.Table) -> pa.Table:
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
            "key": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
            "gx": pa.array([], pa.int64()),
            "gy": pa.array([], pa.int64()),
        }
    )

    def tag_start_tile(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size == 0:
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
        k_s = key[order]
        new = np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size]
        starts = np.flatnonzero(new)
        first = order[starts]
        tile_per_entity = (gx[first] >> shift) * gb + (gy[first] >> shift)
        inv = np.cumsum(np.r_[False, k_s[1:] != k_s[:-1]])
        tile_rows = np.empty(key.size, np.int64)
        tile_rows[order] = tile_per_entity[inv]
        # in-track rank: position of each row within its entity's
        # (ts, seq) order — carried so the tile fold can re-sort tracks
        rk = np.empty(key.size, np.int64)
        rk[order] = np.arange(key.size) - np.repeat(starts, np.diff(np.r_[starts, key.size]))
        return pa.table(
            {"tile": tile_rows, "key": key, "rk": rk, "gx": gx, "gy": gy}
        )

    def _dtw_chunk(Xa, Ya, Xb, Yb, la, lb, w):
        """Banded anti-diagonal sweep for one chunk of pairs.

        ``Xa/Ya/Xb/Yb``: (P, L) padded coordinate rows; ``la/lb``:
        (P,) true lengths; ``w``: (P,) per-pair band. Returns (P,)
        exact dtw2. Diagonal k holds cells (i, j=k−i); under the
        chunk-wide band W only i ∈ [⌈(k−W)/2⌉, ⌊(k+W)/2⌋] can be
        finite, so each sweep step is a (P, ≤W+1) slab; cells outside
        a pair's own band/lengths are masked to the INF sentinel."""
        P, L = Xa.shape
        W = int(w.max())
        kmax = int((la + lb).max())
        out = np.full(P, _DTW_INF, np.int64)
        # diagonal buffers: value of D on diag k at absolute i = lo + idx
        prev2 = np.full((P, 1), 0, np.int64)  # diag 0: D[0,0] = 0
        lo2 = 0
        prev1 = np.full((P, 2), _DTW_INF, np.int64)  # diag 1: INF boundary
        lo1 = 0
        rowix = np.arange(P)
        for k in range(2, kmax + 1):
            i0 = max(1, k - L, (k - W + 1) // 2)
            i1 = min(L, k - 1, (k + W) // 2)
            if i0 > i1:
                prev2, lo2, prev1, lo1 = prev1, lo1, np.full((P, 1), _DTW_INF, np.int64), i0
                continue
            iv = np.arange(i0, i1 + 1)
            jv = k - iv
            m = iv.size

            def gather(buf, lo, want):
                idx = want - lo
                ok = (idx >= 0) & (idx < buf.shape[1])
                idxc = np.clip(idx, 0, max(buf.shape[1] - 1, 0))
                g = buf[:, idxc]
                if not ok.all():
                    g = np.where(ok[None, :], g, _DTW_INF)
                return g

            a = gather(prev1, lo1, iv - 1)  # D[i-1, j]   on diag k-1
            b = gather(prev1, lo1, iv)      # D[i,   j-1] on diag k-1
            c = gather(prev2, lo2, iv - 1)  # D[i-1, j-1] on diag k-2
            step = np.minimum(np.minimum(a, b), c)
            dx = Xa[:, iv - 1] - Xb[:, jv - 1]
            dy = Ya[:, iv - 1] - Yb[:, jv - 1]
            cost = dx * dx + dy * dy
            cur = np.minimum(cost + step, _DTW_INF)
            # mask cells outside each pair's own lengths and band
            bad = (
                (iv[None, :] > la[:, None])
                | (jv[None, :] > lb[:, None])
                | (np.abs(iv[None, :] - jv[None, :]) > w[:, None])
            )
            if bad.any():
                cur = np.where(bad, _DTW_INF, cur)
            # capture finished pairs (corner cell la+lb == k at i == la)
            done = (la + lb) == k
            if done.any():
                idx = la[done] - i0
                ok = (idx >= 0) & (idx < m)
                rows = rowix[done][ok]
                out[rows] = cur[done][ok, idx[ok]]
            prev2, lo2 = prev1, lo1
            prev1, lo1 = cur, i0
        return out

    def pair_tile(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        users = np.unique(key)
        if users.size < 2:
            return _EMPTY_DTW
        rk = group.column("rk").to_numpy(zero_copy_only=False)
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        order = np.lexsort((rk, key))
        k_s, x_s, y_s = key[order], gx[order], gy[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size]
        lens = ends - starts
        L = int(lens.max())
        if L > max_len:
            raise ValueError(
                f"trajectory_dtw: track length {L} exceeds max_len "
                f"{max_len}; simplify or window tracks upstream"
            )
        nu = users.size
        # padded per-entity coordinate matrix (nu, L)
        X = np.zeros((nu, L), np.int64)
        Y = np.zeros((nu, L), np.int64)
        rows = np.repeat(np.arange(nu), lens)
        cols = np.arange(k_s.size) - np.repeat(starts, lens)
        X[rows, cols] = x_s
        Y[rows, cols] = y_s
        ia, ib = np.triu_indices(nu, k=1)
        out = np.empty(ia.size, np.int64)
        # chunk pairs in ascending band order: the sweep pays the CHUNK
        # maximum band, so w-homogeneous chunks keep narrow-band pairs
        # cheap (results are per-pair-banded either way — order-free)
        w_all = np.maximum(band, np.abs(lens[ia] - lens[ib]))
        by_w = np.argsort(w_all, kind="stable")
        for c0 in range(0, ia.size, pair_chunk):
            sel = by_w[c0 : c0 + pair_chunk]
            ca, cb = ia[sel], ib[sel]
            la, lb = lens[ca], lens[cb]
            out[sel] = _dtw_chunk(
                X[ca], Y[ca], X[cb], Y[cb], la, lb, w_all[sel]
            )
        return pa.table(
            {
                "user_a": users[ia],
                "user_b": users[ib],
                "dtw2": out,
            }
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    tagged = keyed.groupby("bucket").map_groups(
        tag_start_tile, batch_format="pyarrow"
    )
    return tagged.groupby("tile").map_groups(pair_tile, batch_format="pyarrow")


def track_diameter(
    tracks: Dataset,
    key_col: str = "user_id",
    x_col: str = "gx",
    y_col: str = "gy",
    n_buckets: int = 256,
) -> Dataset:
    """Per-entity track diameter — the maximum squared grid distance
    between any two visited points (the "how far apart did this entity
    ever get" footprint scalar, the max-companion of
    :func:`~python_prtree_ray.pipelines.movement.radius_of_gyration`):
    ``(user_id, n_points, diam2)``. Exact int64 throughout, so the
    per-user MAX self-join SQL twin matches bit-for-bit (single-point
    and all-coincident tracks get diam2 = 0, matching the twin's
    self-pair).

    Scale shape: ONE coarse entity-bucket shuffle of three fixed-width
    int columns; per track, the Euclidean diameter's endpoints are
    convex-hull vertices, so the fold computes the exact integer
    monotone-chain hull (:func:`_hull_indices`) and maxes d² over hull
    vertex pairs — h² work on the O(h)-sized hull, never n² on the
    track. Coordinates < 2^20 keep every product exact in int64.
    """
    tune_context()

    def bucket(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": k,
                "gx": tbl.column(x_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "gy": tbl.column(y_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "bucket": bucket_of(k, n_buckets),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        if key.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                    "diam2": pa.array([], pa.int64()),
                }
            )
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        k_s, x_s, y_s = key[order], gx[order], gy[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        ends = np.r_[starts[1:], k_s.size]
        out_k = k_s[starts]
        out_n = (ends - starts).astype(np.int64)
        out_d = np.zeros(starts.size, np.int64)
        for i, (a, b) in enumerate(zip(starts, ends)):  # per track, not row
            h = _hull_indices(x_s[a:b], y_s[a:b])
            hx, hy = x_s[a:b][h], y_s[a:b][h]
            if hx.size >= 2:
                dx = hx[:, None] - hx[None, :]
                dy = hy[:, None] - hy[None, :]
                out_d[i] = int((dx * dx + dy * dy).max())
        return pa.table(
            {key_col: out_k, "n_points": out_n, "diam2": out_d}
        )

    keyed = tracks.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def track_diameter_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`track_diameter` — per-user MAX d² over the
    grid-point self-join (self-pairs included so singletons get 0)."""
    from ..functions import derive

    gx = derive.tile_index_sql("q.px", res)
    gy = derive.tile_index_sql("q.py", res)
    return f"""
WITH q AS ({points_cte}),
pts AS (SELECT e.user_id AS user_id, {gx} AS x, {gy} AS y
        FROM events e JOIN q ON e.event_id = q.event_id)
SELECT a.user_id,
       CAST(COUNT(DISTINCT a.rn) AS BIGINT) AS n_points,
       CAST(MAX((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y)) AS BIGINT) AS diam2
FROM (SELECT user_id, x, y, ROW_NUMBER() OVER () AS rn FROM pts) a
JOIN pts b USING (user_id)
GROUP BY a.user_id
"""


def points_diameter(
    points: Dataset,
    res: int = 10,
    x_col: str = "px",
    y_col: str = "py",
) -> Dataset:
    """GLOBAL farthest-pair (diameter) of a point set on the integer
    grid: one row ``(n_points, diam2)`` — the corpus-extent scalar.
    Exact int64 (grid < 2^20 keeps products exact).

    Scale shape: hull-of-union ⊆ union-of-hulls, so each batch prunes
    to its LOCAL convex hull map-side (hull-sized partials, never
    points); the single-group final hull + h² vertex max runs on the
    pruned union. The SQL twin is the O(n²) MAX self-join — the oracle
    baseline, not the scale path.
    """
    tune_context()
    from ..functions import derive

    def prune(tbl: pa.Table) -> pa.Table:
        gx = derive.tile_index(
            tbl.column(x_col).to_numpy(zero_copy_only=False), res
        )
        gy = derive.tile_index(
            tbl.column(y_col).to_numpy(zero_copy_only=False), res
        )
        n = gx.size
        if n == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "gx": pa.array([], pa.int64()),
                    "gy": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = _hull_indices(gx, gy)
        return pa.table(
            {
                "k": np.zeros(idx.size, np.int64),
                "gx": gx[idx],
                "gy": gy[idx],
                "n": np.r_[np.int64(n), np.zeros(idx.size - 1, np.int64)],
            }
        )

    def final(group: pa.Table) -> pa.Table:
        gx = group.column("gx").to_numpy(zero_copy_only=False)
        if gx.size == 0:
            return pa.table(
                {
                    "n_points": pa.array([], pa.int64()),
                    "diam2": pa.array([], pa.int64()),
                }
            )
        gy = group.column("gy").to_numpy(zero_copy_only=False)
        n_total = int(group.column("n").to_numpy(zero_copy_only=False).sum())
        idx = _hull_indices(gx, gy)
        hx, hy = gx[idx], gy[idx]
        d2 = (hx[:, None] - hx[None, :]) ** 2 + (hy[:, None] - hy[None, :]) ** 2
        return pa.table(
            {
                "n_points": pa.array([n_total], pa.int64()),
                "diam2": pa.array([int(d2.max())], pa.int64()),
            }
        )

    return (
        points.map_batches(
            prune,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["n_points", "diam2"])
    )


def points_diameter_sql(points_cte: str, res: int) -> str:
    """DuckDB twin of :func:`points_diameter` — O(n²) MAX self-join
    (self-pairs included so a singleton set gets 0)."""
    from ..functions import derive

    gx = derive.tile_index_sql("px", res)
    gy = derive.tile_index_sql("py", res)
    return f"""
WITH p0 AS ({points_cte}),
g AS (SELECT {gx} AS x, {gy} AS y FROM p0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST((SELECT MAX((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
             FROM g a, g b) AS BIGINT) AS diam2
FROM g
"""
