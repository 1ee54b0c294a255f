"""Windowed aggregation over the events stream table.

Tumbling-window aggregate as a Ray Data pipeline: window assignment is a
stateless ``map_batches`` (timestamp floor), then a pre-aggregated
partial combine per batch feeds one small ``groupby`` — raw events never
shuffle, only (window, key, partial) rows do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of
from ray.data.aggregate import Sum


def tumbling_window_agg(
    events: Dataset,
    every: str = "1h",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> Dataset:
    """(event_type, window_start, n_events, value_cents) per tumbling
    window. ``value_cents`` sums floor(value*100) as int64 — associative
    and order-independent, unlike a float sum."""
    tune_context()

    def partial(tbl: pa.Table) -> pa.Table:
        win = pc.floor_temporal(tbl.column(ts_col), unit="hour")
        cents = pc.cast(
            pc.floor(pc.multiply(tbl.column(value_col), pa.scalar(100.0))), pa.int64()
        )
        t = pa.table(
            {
                key_col: tbl.column(key_col),
                "window_start": win,
                "one": np.ones(tbl.num_rows, dtype=np.int64),
                "value_cents": cents,
            }
        )
        # pre-aggregate inside the batch: group by (key, window)
        g = t.group_by([key_col, "window_start"]).aggregate(
            [("one", "sum"), ("value_cents", "sum")]
        )
        ren = {"one_sum": "n_events", "value_cents_sum": "value_cents"}
        g = g.rename_columns([ren.get(n, n) for n in g.column_names])
        return g.select([key_col, "window_start", "n_events", "value_cents"])

    partials = events.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )


def hopping_window_agg(
    events: Dataset,
    window_hours: int = 2,
    hop_hours: int = 1,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> Dataset:
    """Hopping (sliding) window: each event lands in window_hours/hop_hours
    overlapping windows. Same partial-aggregate shape as tumbling — the
    replication happens inside the batch, so the shuffle still carries
    only (key, window) partials."""
    tune_context()
    n_win = window_hours // hop_hours

    def partial(tbl: pa.Table) -> pa.Table:
        win0 = pc.floor_temporal(tbl.column(ts_col), unit="hour")
        cents = pc.cast(
            pc.floor(pc.multiply(tbl.column(value_col), pa.scalar(100.0))), pa.int64()
        )
        base = pa.table(
            {
                key_col: tbl.column(key_col),
                "win0": win0,
                "one": np.ones(tbl.num_rows, dtype=np.int64),
                "value_cents": cents,
            }
        )
        parts = []
        for h in range(n_win):
            shifted = pc.subtract(
                base.column("win0"),
                pa.scalar(h * 3600_000_000, type=pa.duration("us")),
            )
            parts.append(
                pa.table(
                    {
                        key_col: base.column(key_col),
                        "window_start": shifted,
                        "one": base.column("one"),
                        "value_cents": base.column("value_cents"),
                    }
                )
            )
        t = pa.concat_tables(parts)
        g = t.group_by([key_col, "window_start"]).aggregate(
            [("one", "sum"), ("value_cents", "sum")]
        )
        ren = {"one_sum": "n_events", "value_cents_sum": "value_cents"}
        g = g.rename_columns([ren.get(c, c) for c in g.column_names])
        return g.select([key_col, "window_start", "n_events", "value_cents"])

    partials = events.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )


def session_window_agg(
    events: Dataset,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_cols: tuple[str, str] = ("event_type", "user_id"),
    value_col: str = "value",
) -> Dataset:
    """Gap-based sessionization per (event_type, user_id): a new session
    starts when the time since the previous event of the same key exceeds
    the gap. Emits (key..., session_start, n_events, value_cents).

    Shuffles by a COARSE user-hash bucket (one ``map_groups`` call per
    bucket, not per (type, user) — per-key grouping would be millions of
    interpreter calls at scale) and sessionizes the whole bucket in one
    vectorized pass: lexsort by (type, user, ts), then a key change OR a
    gap breach starts a session. Boundaries depend only on key + gap, so
    the result is order- and parallelism-independent."""
    tune_context()
    gap_us = np.int64(gap_minutes) * 60_000_000
    k1, k2 = key_cols
    n_buckets = 256

    def bucket(tbl: pa.Table) -> pa.Table:
        uid = tbl.column(k2).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column(
            "bucket", pa.array(bucket_of(uid, n_buckets))
        )

    def sessions(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        uid = group.column(k2).to_numpy(zero_copy_only=False).astype(np.int64)
        # Arrow dictionary-encode — no Python-object key materialization
        d = group.column(k1).combine_chunks().dictionary_encode()
        code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid, code))
        ts_s, val_s = ts[order], val[order]
        uid_s, code_s = uid[order], code[order]
        n = ts_s.shape[0]
        brk = np.ones(n, dtype=bool)
        if n > 1:
            same_key = (np.diff(code_s) == 0) & (np.diff(uid_s) == 0)
            brk[1:] = ~same_key | (np.diff(ts_s) > gap_us)
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [n]])
        cents = np.floor(val_s * 100.0).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cents)])
        return pa.table(
            {
                k1: d.dictionary.take(pa.array(code_s[starts])),
                k2: pa.array(uid_s[starts], type=pa.int64()),
                "session_start": pa.array(
                    ts_s[starts], type=pa.timestamp("us")
                ),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "value_cents": pa.array(cum[ends] - cum[starts], type=pa.int64()),
            }
        )

    keyed = events.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(sessions, batch_format="pyarrow")


def sessionize_events(
    events: Dataset,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_cols: tuple[str, str] = ("event_type", "user_id"),
    id_col: str = "event_id",
) -> Dataset:
    """Per-event session LABELING: ``(event_id, session_start)`` — every
    event tagged with the start timestamp of its gap-session (same
    session definition as :func:`session_window_agg`, which aggregates
    the sessions this function assigns).

    Same scale shape as the aggregate: ONE coarse user-hash-bucket
    shuffle, whole-bucket vectorized sessionization (lexsort + run
    boundaries + cumulative run id), never per-key ``map_groups``."""
    tune_context()
    gap_us = np.int64(gap_minutes) * 60_000_000
    k1, k2 = key_cols
    n_buckets = 256

    def bucket(tbl: pa.Table) -> pa.Table:
        uid = tbl.column(k2).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(uid, n_buckets)))

    def label(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        eid = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uid = group.column(k2).to_numpy(zero_copy_only=False).astype(np.int64)
        d = group.column(k1).combine_chunks().dictionary_encode()
        code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid, code))
        ts_s, eid_s = ts[order], eid[order]
        uid_s, code_s = uid[order], code[order]
        n = ts_s.shape[0]
        brk = np.ones(n, dtype=bool)
        if n > 1:
            same_key = (np.diff(code_s) == 0) & (np.diff(uid_s) == 0)
            brk[1:] = ~same_key | (np.diff(ts_s) > gap_us)
        starts = np.nonzero(brk)[0]
        run_id = np.cumsum(brk) - 1  # which session each event belongs to
        return pa.table(
            {
                id_col: pa.array(eid_s, type=pa.int64()),
                "session_start": pa.array(
                    ts_s[starts][run_id], type=pa.timestamp("us")
                ),
            }
        )

    keyed = events.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(label, batch_format="pyarrow")


def session_join(
    events: Dataset,
    left_type: str,
    right_type: str,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 256,
) -> Dataset:
    """Session-scoped stream-stream join: ``(user_id, l_id, r_id)`` for
    every pair of a ``left_type`` and a ``right_type`` event that fall in
    the SAME gap-session of the same user. Sessions here are per USER
    over ALL the user's events (any type participates in session
    formation — unlike :func:`sessionize_events`, which sessionizes per
    (type, user) stream), so a click can stitch a view and a purchase
    into one session.

    Scale shape: ONE coarse user-hash-bucket shuffle of the projected
    (id, ts, user, type) columns; per bucket, a lexsort + run-boundary
    pass assigns sessions, then the pairs expand with the same
    searchsorted repeat/arange walk as the hash join — no per-session
    ``map_groups``, no Python row loop.
    """
    tune_context()
    gap_us = np.int64(gap_minutes) * 60_000_000

    def bucket(tbl: pa.Table) -> pa.Table:
        uid = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return tbl.append_column("bucket", pa.array(bucket_of(uid, n_buckets)))

    def pair(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                user_col: pa.array([], pa.int64()),
                "l_id": pa.array([], pa.int64()),
                "r_id": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        ts = group.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        uid = group.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tcol = group.column(type_col)
        is_l = pc.equal(tcol, left_type).to_numpy(zero_copy_only=False)
        is_r = pc.equal(tcol, right_type).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        ts_s, uid_s, eid_s = ts[order], uid[order], eid[order]
        brk = np.ones(ts_s.shape[0], dtype=bool)
        if ts_s.shape[0] > 1:
            brk[1:] = (np.diff(uid_s) != 0) | (np.diff(ts_s) > gap_us)
        run = np.cumsum(brk) - 1  # session id, unique within the bucket
        lmask, rmask = is_l[order], is_r[order]
        lrun, lid, luid = run[lmask], eid_s[lmask], uid_s[lmask]
        rrun, rid = run[rmask], eid_s[rmask]
        if lrun.size == 0 or rrun.size == 0:
            return empty
        # rrun is sorted (run is nondecreasing); range-match each left row
        starts = np.searchsorted(rrun, lrun, side="left")
        ends = np.searchsorted(rrun, lrun, side="right")
        cnt = ends - starts
        total = int(cnt.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(lrun.shape[0]), cnt)
        walk = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ri = np.repeat(starts, cnt) + walk
        return pa.table(
            {
                user_col: pa.array(luid[li], pa.int64()),
                "l_id": pa.array(lid[li], pa.int64()),
                "r_id": pa.array(rid[ri], pa.int64()),
            }
        )

    proj = events.select_columns([id_col, ts_col, user_col, type_col])
    keyed = proj.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(pair, batch_format="pyarrow")


def rolling_window_sum(
    events: Dataset,
    window_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    n_buckets: int = 64,
) -> Dataset:
    """Per-event rolling sum: for each event, the sum of
    ``floor(value*100)`` cents over SAME-KEY events with timestamp in
    ``[ts - window, ts]`` — closed on both ends INCLUDING equal-ts peers,
    which is exactly SQL's ``RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW`` frame.

    One key-hash-bucket shuffle; inside a bucket, each key's segment is
    sorted once and every row's window resolves with two vectorized
    ``searchsorted`` probes against a prefix-sum array — no per-row
    loop (the per-SEGMENT loop is bounded by key cardinality)."""
    tune_context()
    win_us = np.int64(window_minutes) * 60_000_000

    def bucket(tbl: pa.Table) -> pa.Table:
        from .text import hash_str_array

        kb = hash_str_array(tbl.column(key_col)) % np.int64(n_buckets)
        return tbl.append_column("rb", pa.array(kb))

    def roll(group: pa.Table) -> pa.Table:
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.floor(
            group.column(value_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d = group.column(key_col).combine_chunks().dictionary_encode()
        code = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, code))
        ts_s, cents_s, code_s = ts[order], cents[order], code[order]
        out = np.empty(ts_s.shape[0], dtype=np.int64)
        starts = np.concatenate([[0], np.nonzero(np.diff(code_s))[0] + 1])
        ends = np.concatenate([starts[1:], [code_s.shape[0]]])
        for s, e in zip(starts, ends):  # bounded by key cardinality
            seg = ts_s[s:e]
            pref = np.zeros(e - s + 1, dtype=np.int64)
            np.cumsum(cents_s[s:e], out=pref[1:])
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            out[s:e] = pref[hi] - pref[lo]
        inv = np.empty_like(order)
        inv[order] = np.arange(order.shape[0])
        return pa.table(
            {
                id_col: group.column(id_col),
                key_col: group.column(key_col),
                "roll_cents": pa.array(out[inv], type=pa.int64()),
            }
        )

    keyed = events.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("rb").map_groups(roll, batch_format="pyarrow")


def top_events_per_type(
    events: Dataset,
    k: int = 10,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> Dataset:
    """Exact distributed top-k rows per key by (value DESC, id ASC):
    per-batch local top-k (value-threshold inclusive, so cross-batch ties
    survive) → tiny ``groupby(key)`` merge. Same pattern as the kNN
    merge — no global sort."""
    tune_context()

    def local(tbl: pa.Table) -> pa.Table:
        key = tbl.column(key_col).to_numpy(zero_copy_only=False)
        val = tbl.column(value_col).to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.zeros(key.shape[0], dtype=bool)
        for kv in np.unique(key):
            m = key == kv
            vv = val[m]
            kk = min(k, vv.shape[0])
            thr = np.partition(vv, vv.shape[0] - kk)[vv.shape[0] - kk]
            keep |= m & (val >= thr)
        return pa.table(
            {key_col: key[keep], id_col: ids[keep], value_col: val[keep]}
        )

    partials = events.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )

    def merge(group: pa.Table) -> pa.Table:
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -val))[:k]
        return pa.table(
            {
                key_col: pa.array(
                    [group.column(key_col)[0].as_py()] * order.shape[0]
                ),
                id_col: pa.array(ids[order], type=pa.int64()),
                value_col: pa.array(val[order], type=pa.float64()),
                "rank": pa.array(
                    np.arange(1, order.shape[0] + 1, dtype=np.int64)
                ),
            }
        )

    return partials.groupby(key_col).map_groups(merge, batch_format="pyarrow")


class StreamingWindowAggregator:
    """Incremental tumbling-window aggregator with watermark eviction —
    the STATEFUL-STREAMING shape Ray Data's batch model doesn't express.

    Feed batches in arrival order with :meth:`update`; windows whose end
    falls behind the watermark (max event time seen minus
    ``allowed_lateness``) are emitted EXACTLY ONCE by :meth:`poll`;
    :meth:`finalize` flushes everything left. Events whose window ended
    at or before the LAST EMISSION's watermark (their window is already
    gone) are dropped and counted in ``late_dropped`` — never silently.

    Deployment shape: one aggregator per key-partition actor (wrap in
    ``map_batches(cls, concurrency=N)`` over a stream partitioned by
    key — same-key co-location is the only partitioning assumption), or
    driver-side over ``ds.iter_batches()`` for a single consumer. State
    is O(open windows × keys), independent of stream length.
    """

    EVERY_US = 3_600_000_000  # 1h tumbling

    def __init__(self, allowed_lateness_hours: int = 1):
        self._state: dict[tuple[str, int], list[int]] = {}
        # watermark at the last poll(): windows ending at/before it have
        # been emitted — an O(1) substitute for remembering every emitted
        # (key, window) pair, which would grow with stream length
        self._emit_watermark = np.int64(-(1 << 62))
        self._max_ts = np.int64(-(1 << 62))
        self._late_us = np.int64(allowed_lateness_hours) * self.EVERY_US
        self.late_dropped = 0

    def update(self, tbl: pa.Table) -> None:
        ts = (
            tbl.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        if ts.size == 0:
            return
        d = tbl.column("event_type").combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # only the distinct-key dictionary is materialized as Python
        # strings (cardinality-sized), never the full column
        uniq_k = np.asarray(d.dictionary.to_pylist())
        cents = np.floor(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        win = (ts // self.EVERY_US) * self.EVERY_US
        self._max_ts = max(self._max_ts, np.int64(ts.max()))
        # window index offset keeps the pack positive for pre-1970
        # timestamps (a negative index would bleed into the key-code bits)
        W_OFF = np.int64(1 << 47)
        pair = codes * np.int64(1 << 48) + (win // self.EVERY_US + W_OFF)
        u, inv = np.unique(pair, return_inverse=True)
        n_by = np.bincount(inv)
        c_by = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(c_by, inv, cents)  # exact int64 accumulation
        k_by = (u >> np.int64(48)).astype(np.int64)
        w_by = ((u & np.int64((1 << 48) - 1)) - W_OFF) * self.EVERY_US
        for j in range(u.shape[0]):  # bounded by open (key, window) pairs
            w = int(w_by[j])
            if w + self.EVERY_US <= self._emit_watermark:
                self.late_dropped += int(n_by[j])  # window already emitted
                continue
            sk = (str(uniq_k[k_by[j]]), w)
            acc = self._state.setdefault(sk, [0, 0])
            acc[0] += int(n_by[j])
            acc[1] += int(c_by[j])

    def _emit(self, keys: list[tuple[str, int]]) -> pa.Table:
        keys.sort()
        rows = [(k, w, *self._state.pop((k, w))) for k, w in keys]
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "window_start": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "n_events": pa.array([r[2] for r in rows], pa.int64()),
                "value_cents": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    def poll(self) -> pa.Table:
        """Emit every window whose end <= watermark, exactly once."""
        watermark = self._max_ts - self._late_us
        ready = [
            (k, w) for (k, w) in self._state if w + self.EVERY_US <= watermark
        ]
        self._emit_watermark = max(self._emit_watermark, watermark)
        return self._emit(ready)

    def finalize(self) -> pa.Table:
        return self._emit(list(self._state))


def user_activity_features(
    events: Dataset,
    types: tuple[str, ...] = ("view", "click", "purchase", "signup", "error"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> Dataset:
    """Per-user ML feature vector over the event stream: total count,
    per-type counts, first/last seen, and integer-cents value sum —
    ``(user_id, n_events, n_<type>..., first_ts, last_ts, value_cents)``.

    Every aggregate is order-independent (counts, min, max, int sum), so
    the result is bitwise-stable across partitionings. Scale shape: each
    batch pre-reduces to one row per user seen in the batch (sorted-run
    ``reduceat``), and only those partials shuffle — the canonical
    feature-extraction pattern for a 100-TB event log."""
    from ray.data.aggregate import Max, Min, Sum

    tune_context()

    def partial(tbl: pa.Table) -> pa.Table:
        uid = tbl.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.floor(
            tbl.column(value_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        ty = tbl.column("event_type").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        us, ts_s, c_s = uid[order], ts[order], cents[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]][: us.size])
        ends = np.r_[starts[1:], us.shape[0]]
        cols = {
            "user_id": us[starts],
            "n_events": (ends - starts).astype(np.int64),
        }
        for t in types:
            m = (ty == t).astype(np.int64)[order]
            cols[f"n_{t}"] = np.add.reduceat(m, starts)
        out = pa.table(cols)
        out = out.append_column(
            "first_ts",
            pa.array(
                np.minimum.reduceat(ts_s, starts).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
        )
        out = out.append_column(
            "last_ts",
            pa.array(
                np.maximum.reduceat(ts_s, starts).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
        )
        return out.append_column(
            "value_cents", pa.array(np.add.reduceat(c_s, starts))
        )

    partials = events.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return partials.groupby("user_id").aggregate(
        Sum("n_events", alias_name="n_events"),
        *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types],
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
        Sum("value_cents", alias_name="value_cents"),
    )


def event_dedup_window(
    events: Dataset,
    minutes: int = 10,
    ts_col: str = "ts",
    key_cols: tuple[str, str] = ("user_id", "event_type"),
    id_col: str = "event_id",
    n_buckets: int = 256,
) -> Dataset:
    """Streaming-style event dedup: keep the FIRST event (min ``(ts, id)``)
    per ``(user, type, tumbling window)`` — the "drop repeated signals
    within N minutes" primitive of an event-ingestion pipeline. Output
    ``(user_id, event_type, window_start, event_id)``.

    Scale shape: each batch collapses to one candidate row per distinct
    (key, window) group map-side (dictionary-encode the string key, one
    lexsort, segment-first pick), so the user-hash shuffle ships group
    rows, never events; the per-bucket reduce reruns the identical pass."""
    tune_context()
    uid_col, type_col = key_cols

    def first_per_group(tbl: pa.Table, emit_bucket: bool) -> pa.Table:
        n = tbl.num_rows
        out_cols = [uid_col, type_col, "window_start", id_col]
        if n == 0:
            cols = {
                uid_col: pa.array([], pa.int64()),
                type_col: pa.array([], pa.string()),
                "window_start": pa.array([], pa.timestamp("us")),
                id_col: pa.array([], pa.int64()),
                ts_col: pa.array([], pa.timestamp("us")),
            }
            if emit_bucket:
                cols["wb"] = pa.array([], pa.int64())
            return pa.table(cols)
        if "window_start" in tbl.column_names:
            win = tbl.column("window_start")
        else:
            win = pc.floor_temporal(tbl.column(ts_col), multiple=minutes, unit="minute")
        uid = tbl.column(uid_col).to_numpy(zero_copy_only=False)
        ts = tbl.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        eid = tbl.column(id_col).to_numpy(zero_copy_only=False)
        win_i = win.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        etype = pc.dictionary_encode(
            tbl.column(type_col).combine_chunks()
            if isinstance(tbl.column(type_col), pa.ChunkedArray)
            else tbl.column(type_col)
        )
        codes = np.asarray(etype.indices)
        order = np.lexsort((eid, ts, win_i, codes, uid))
        u_s, c_s, w_s = uid[order], codes[order], win_i[order]
        first = np.r_[
            True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1]) | (w_s[1:] != w_s[:-1])
        ]
        w = pa.array(order[first])
        cols = {
            uid_col: pa.array(uid[order[first]], pa.int64()),
            type_col: tbl.column(type_col).take(w),
            "window_start": win.cast(pa.timestamp("us")).take(w)
            if isinstance(win, pa.ChunkedArray)
            else pa.chunked_array([win]).cast(pa.timestamp("us")).take(w),
            id_col: pa.array(eid[order[first]], pa.int64()),
            ts_col: tbl.column(ts_col).cast(pa.timestamp("us")).take(w),
        }
        if emit_bucket:
            cols["wb"] = pa.array(bucket_of(uid[order[first]], n_buckets))
        return pa.table(cols)

    combined = events.map_batches(
        lambda t: first_per_group(t, emit_bucket=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return combined.groupby("wb").map_groups(
        lambda g: first_per_group(g.drop_columns(["wb"]), emit_bucket=False),
        batch_format="pyarrow",
    ).select_columns([uid_col, type_col, "window_start", id_col])


def record_events(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    n_buckets: int = 256,
) -> Dataset:
    """Record-breaking events per entity — every event whose value
    strictly exceeds ALL of the entity's earlier events in (ts, seq)
    order (the running-max / new-personal-best stream op):
    ``(user_id, event_id, value_cents)``. The first event of an entity
    is always a record. Values compare as exact floor-cents ints.

    Scale shape: ONE entity-bucket shuffle of fixed-width ints; the
    per-bucket fold computes the grouped prefix max with a segmented
    Hillis-Steele doubling scan (O(n log n) vectorized, no per-row or
    per-entity Python), then keeps the strict improvements. Output is
    record-sized (≈ harmonic-number rows per entity).
    """
    tune_context()

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = pc.cast(
            pc.floor(pc.multiply(tbl.column(value_col), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "bucket": bucket_of(k, n_buckets),
                "k": k,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col),
                "cents": cents,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    seq_col: pa.array([], pa.int64()),
                    "value_cents": pa.array([], pa.int64()),
                }
            )
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, k))
        k_s, seq_s, v_s = k[order], seq[order], v[order]
        # segmented inclusive prefix max (Hillis-Steele doubling): after
        # step d, res[i] = max(v[j..i]) over the last 2^d rows of i's
        # segment — segments are contiguous, so one distance-d key
        # equality check masks the whole window
        res = v_s.copy()
        d = 1
        n = res.size
        while d < n:
            valid = k_s[d:] == k_s[:-d]
            np.maximum(
                res[d:], np.where(valid, res[:-d], np.iinfo(np.int64).min), out=res[d:]
            )
            d *= 2
        first = np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size]
        rec = first | (v_s > np.r_[np.iinfo(np.int64).min, res[:-1]])
        return pa.table(
            {
                key_col: k_s[rec],
                seq_col: seq_s[rec],
                "value_cents": v_s[rec],
            }
        )

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def record_events_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`record_events` — running MAX window with a
    1-preceding frame, identical (ts, seq) order and strict compare."""
    return f"""
WITH c AS (SELECT user_id, event_id, ts,
                  CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
           FROM {table}),
r AS (SELECT user_id, event_id, cents,
             MAX(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      FROM c)
SELECT user_id, event_id, cents AS value_cents
FROM r WHERE prevmax IS NULL OR cents > prevmax
"""


LATE_JITTER = 1000  # max simulated ingest delay, in sequence slots
LATE_CHANNEL = 11


def late_arrival_slot(seq: np.ndarray) -> np.ndarray:
    """Deterministic simulated ARRIVAL order: each event lands at slot
    ``seq + hash(seq) % LATE_JITTER`` — the multiply-mod hash family
    shared with the SQL twins, standing in for network/ingest delay
    (the synthetic stream is otherwise perfectly ordered)."""
    from ..functions import derive

    a, b = derive.CHANNELS[LATE_CHANNEL % len(derive.CHANNELS)]
    return seq + ((seq * a + b) % derive.MOD) % np.int64(LATE_JITTER)


def late_events(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    n_buckets: int = 256,
) -> Dataset:
    """Out-of-order (LATE) arrival stats per entity — the watermark
    diagnostic of a streaming ingest: an event is late iff its event
    time is strictly below the running max event time of the entity's
    EARLIER arrivals. Arrival order is :func:`late_arrival_slot`
    (hash-jittered sequence, tie-broken by ``seq_col``). One row per
    entity ``(user_id, n_events, n_late, max_lateness_us)`` where the
    lateness of a late event is ``running_max_ts − ts`` in exact
    microseconds.

    Scale shape: ONE entity-bucket shuffle of fixed-width ints; the
    per-bucket fold computes the grouped prefix max over arrival order
    with the same segmented Hillis-Steele doubling scan as
    :func:`record_events` (O(n log n) vectorized, no per-row Python),
    then one reduceat pass collapses to entity rows. All-int output —
    bitwise-exact vs the SQL window twin at any parallelism.
    """
    tune_context()

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": bucket_of(k, n_buckets),
                "k": k,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_late": pa.array([], pa.int64()),
                    "max_lateness_us": pa.array([], pa.int64()),
                }
            )
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((seq, late_arrival_slot(seq), k))
        k_s, ts_s = k[order], ts[order]
        # segmented inclusive prefix max over arrival order
        res = ts_s.copy()
        d = 1
        n = res.size
        while d < n:
            valid = k_s[d:] == k_s[:-d]
            np.maximum(
                res[d:],
                np.where(valid, res[:-d], np.iinfo(np.int64).min),
                out=res[d:],
            )
            d *= 2
        first = np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size]
        prevmax = np.r_[np.iinfo(np.int64).min, res[:-1]]
        prevmax[first] = np.iinfo(np.int64).min
        late = ts_s < prevmax
        lateness = np.where(late, prevmax - ts_s, 0)
        starts = np.flatnonzero(first)
        return pa.table(
            {
                key_col: k_s[starts],
                "n_events": np.diff(np.r_[starts, n]).astype(np.int64),
                "n_late": np.add.reduceat(
                    late.astype(np.int64), starts
                ),
                "max_lateness_us": np.maximum.reduceat(lateness, starts),
            }
        )

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def late_events_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`late_events` — running MAX window over
    the hash-jittered arrival order, 1-preceding frame, identical
    strict compare."""
    from ..functions import derive

    a, b = derive.CHANNELS[LATE_CHANNEL % len(derive.CHANNELS)]
    slot = (
        f"event_id + ((event_id * {a} + {b}) % {derive.MOD})"
        f" % {LATE_JITTER}"
    )
    return f"""
WITH m AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
                  MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY {slot}, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pm
           FROM {table})
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE tus < pm) AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(pm - tus) FILTER (WHERE tus < pm), 0) AS BIGINT)
         AS max_lateness_us
FROM m GROUP BY 1
"""


def user_journeys(
    events: Dataset,
    types: list[str],
    k: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    type_col: str = "event_type",
    n_buckets: int = 256,
) -> Dataset:
    """Journey (path) mining: the sequence of each entity's FIRST ``k``
    event types in (ts, seq) order, counted across entities — "what do
    users do first". Output ``(path, n_users)`` with ``path`` the
    '>'-joined type sequence (shorter for entities with < k events).

    Scale shape: types recode to small ints against the broadcast
    ``types`` vocabulary (metadata, from a distinct fold); ONE
    entity-bucket shuffle of fixed-width ints; the per-bucket fold is
    one lexsort + rank mask + base-B digit pack (paths of different
    lengths cannot collide: the leading digit is nonzero), then ONE
    tiny path-key sum; path strings decode only for the final
    path-cardinality rows (≤ (|types|+1)^k, a model artifact).
    """
    tune_context()
    base = np.int64(len(types) + 1)
    if (base ** k) > np.iinfo(np.int64).max // base:
        raise ValueError("types**k overflows the path key")
    type_arr = pa.array(types, pa.string())

    import ray

    ref_types = ray.put(type_arr)

    def prep(tbl: pa.Table) -> pa.Table:
        tarr = ray.get(ref_types)
        kk = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        code = (
            pc.index_in(tbl.column(type_col), value_set=tarr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "bucket": bucket_of(kk, n_buckets),
                "k": kk,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col),
                "code": code,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        kk = group.column("k").to_numpy(zero_copy_only=False)
        if kk.size == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        code = group.column("code").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, kk))
        k_s, c_s = kk[order], code[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        counts = np.diff(np.r_[starts, k_s.shape[0]])
        rank = np.arange(k_s.shape[0], dtype=np.int64) - np.repeat(
            starts, counts
        )
        keep = rank < k
        seg = np.repeat(np.arange(starts.shape[0], dtype=np.int64), counts)[
            keep
        ]
        lens = np.minimum(counts, k)
        digit = (c_s[keep] + 1) * base ** (
            np.repeat(lens, lens) - 1 - rank[keep]
        )
        # one key per entity: segment sum of place-valued digits
        seg_starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]][: seg.size])
        keys = np.add.reduceat(digit, seg_starts)
        uk, n = np.unique(keys, return_counts=True)
        return pa.table({"key": uk, "n": n.astype(np.int64)})

    from .merge import bucketed_sum

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n",))

    def finish(tbl: pa.Table) -> pa.Table:
        keys = tbl.column("key").to_numpy(zero_copy_only=False)
        # decode base-B digits back to type names (path-cardinality
        # rows only — metadata-sized by construction)
        paths = []
        for key in keys:
            digs = []
            x = int(key)
            while x:
                digs.append(x % int(base) - 1)
                x //= int(base)
            paths.append(">".join(types[d] for d in reversed(digs)))
        return pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "n_users": tbl.column("n"),
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def user_journeys_sql(k: int = 4, table: str = "events") -> str:
    """DuckDB twin of :func:`user_journeys`."""
    return f"""
WITH r AS (SELECT user_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn
           FROM {table}),
p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {k} GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY 1
"""


def running_totals(
    ds: Dataset,
    key_col: str,
    order_cols: tuple[str, str],
    value_col: str,
    out_seq: str = "seq",
    out_total: str = "running_cents",
    n_buckets: int = 256,
) -> Dataset:
    """Per-entity RUNNING TOTAL transform — every input row out, with
    its 1-based sequence number and the inclusive prefix sum of its
    value (exact floor-cents), ordered by ``order_cols`` within the
    entity. The per-entity balance/LTV transform of a billing stream.

    Scale shape: ONE entity-bucket shuffle; the per-bucket fold is one
    lexsort + ONE global cumsum with per-segment rebasing
    (``cs − cs[seg_start] + v[seg_start]`` — exact int arithmetic,
    O(n), no doubling passes needed for sums). Output is input-sized
    (a transform, not an aggregate); at any parallelism the (entity,
    order) pair determines the row, so results are exact vs the SQL
    window twin.
    """
    tune_context()
    oc1, oc2 = order_cols

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = pc.cast(
            pc.floor(pc.multiply(tbl.column(value_col), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "bucket": bucket_of(k, n_buckets),
                "k": k,
                "o1": tbl.column(oc1),
                "o2": tbl.column(oc2),
                "cents": cents,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    oc2: pa.array([], pa.int64()),
                    out_seq: pa.array([], pa.int64()),
                    out_total: pa.array([], pa.int64()),
                }
            )
        o1 = group.column("o1").to_numpy(zero_copy_only=False)
        if o1.dtype.kind == "M":
            o1 = o1.astype("datetime64[us]").astype(np.int64)
        o2 = group.column("o2").to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((o2, o1, k))
        k_s, o2_s, v_s = k[order], o2[order], v[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        counts = np.diff(np.r_[starts, k_s.shape[0]])
        cs = np.cumsum(v_s)
        base = cs[starts] - v_s[starts]
        running = cs - np.repeat(base, counts)
        seq = (
            np.arange(k_s.shape[0], dtype=np.int64)
            - np.repeat(starts, counts)
            + 1
        )
        return pa.table(
            {
                key_col: k_s,
                oc2: o2_s,
                out_seq: seq,
                out_total: running,
            }
        )

    keyed = ds.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def order_running_totals_sql(table: str = "orders") -> str:
    """DuckDB twin of :func:`running_totals` wired to the orders
    table: per-customer running order totals in exact cents."""
    return f"""
SELECT o_custkey,
       o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) OVER w
            AS BIGINT) AS running_cents
FROM {table}
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


WEEK_US = 604_800_000_000  # 7 * 86400e6


def cohort_retention(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 256,
) -> Dataset:
    """Cohort retention matrix — users grouped by their FIRST active
    epoch week, counted in every later week they return:
    ``(cohort_week, week_offset, n_users)`` where ``n_users`` is the
    exact distinct-user count of that cohort active ``week_offset``
    weeks after its start (offset 0 row = cohort size). The classic
    product-analytics retention triangle.

    Scale shape: each entity's rows land in ONE user bucket, so the
    per-bucket fold sees every event of its users: dedup to (user,
    week), take the per-user min week as the cohort, emit packed
    (cohort, offset) partial counts — distinct-user exactness without a
    global distinct. ONE metadata-sized key-bucket sum. Raw events
    never shuffle twice; weeks are exact epoch-µs integer divisions.
    """
    tune_context()
    from .merge import bucketed_sum

    OFF_BITS = 20  # offsets < 2^20 weeks (~20k years) — packing guard

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        if (ts < 0).any():
            raise ValueError("cohort_retention: pre-epoch timestamps unsupported")
        week = ts // WEEK_US
        # batch-local (user, week) dedup — shrinks the shuffle to the
        # active-user-week grid
        order = np.lexsort((week, k))
        k_s, w_s = k[order], week[order]
        keep = np.r_[True, (k_s[1:] != k_s[:-1]) | (w_s[1:] != w_s[:-1])][: k_s.size]
        return pa.table(
            {
                "bucket": bucket_of(k_s[keep], n_buckets),
                "k": k_s[keep],
                "week": w_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
            )
        week = group.column("week").to_numpy(zero_copy_only=False)
        order = np.lexsort((week, k))
        k_s, w_s = k[order], week[order]
        keep = np.r_[True, (k_s[1:] != k_s[:-1]) | (w_s[1:] != w_s[:-1])][: k_s.size]
        k_u, w_u = k_s[keep], w_s[keep]
        starts = np.flatnonzero(np.r_[True, k_u[1:] != k_u[:-1]][: k_u.size])
        sizes = np.diff(np.r_[starts, k_u.size])
        cohort = np.repeat(w_u[starts], sizes)  # per-user min week
        off = w_u - cohort
        key, n = np.unique(cohort * (1 << OFF_BITS) + off, return_counts=True)
        return pa.table({"key": key, "n_users": n.astype(np.int64)})

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    summed = bucketed_sum(folded, key_col="key", value_cols=("n_users",))

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_week": key >> 20,
                "week_offset": key & ((1 << 20) - 1),
                "n_users": tbl.column("n_users"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def cohort_retention_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`cohort_retention` — distinct user-weeks,
    per-user MIN week cohort, identical integer week arithmetic."""
    return f"""
WITH w AS (SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week
           FROM {table}),
f AS (SELECT user_id, MIN(week) AS cohort FROM w GROUP BY user_id)
SELECT f.cohort AS cohort_week, w.week - f.cohort AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM w JOIN f ON w.user_id = f.user_id
GROUP BY 1, 2
"""


def session_type_pairs(
    events: Dataset,
    gap_us: int = 1_800_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    type_col: str = "event_type",
    n_buckets: int = 256,
) -> Dataset:
    """Market-basket co-occurrence over SESSIONS — for every unordered
    event-type pair, the number of user sessions (30-min inactivity
    gap) containing BOTH types: ``(type_a, type_b, n_sessions)`` with
    ``type_a < type_b``. The association-mining primitive behind
    cross-sell / co-engagement lift.

    Scale shape: ONE entity-bucket shuffle; the per-bucket fold
    sessionizes its users (cumsum of gap breaks), dedups (session,
    type), and expands within-session pairs by the offset-doubling
    sweep (O(n·max_types) vectorized, types pre-sorted so a < b for
    free); partials are ≤ C² rows per bucket and fold in ONE tiny
    final pass.
    """
    tune_context()

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": bucket_of(k, n_buckets),
                "k": k,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col),
                "cls": tbl.column(type_col),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.int64()),
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_sessions": pa.array([], pa.int64()),
            }
        )
        k = group.column("k").to_numpy(zero_copy_only=False)
        if k.size == 0:
            return empty
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        cls = group.column("cls").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, k))
        k_s, t_s, c_s = k[order], ts[order], cls[order]
        new_user = np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size]
        brk = np.r_[False, (t_s[1:] - t_s[:-1]) > gap_us]
        sid = np.cumsum(new_user | brk)  # globally-unique session ids
        # distinct (session, type)
        o2 = np.lexsort((c_s, sid))
        s2, c2 = sid[o2], c_s[o2]
        keep = np.r_[True, (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])][: s2.size]
        s2, c2 = s2[keep], c2[keep]
        # within-session pair expansion by offset: types sorted -> a < b
        pa_l: list[np.ndarray] = []
        pb_l: list[np.ndarray] = []
        d = 1
        while d < s2.size:
            valid = s2[d:] == s2[:-d]
            if not valid.any():
                break
            pa_l.append(c2[:-d][valid])
            pb_l.append(c2[d:][valid])
            d += 1
        if not pa_l:
            return empty
        a = np.concatenate(pa_l)
        b = np.concatenate(pb_l)
        # count per (a, b) — pair cardinality is type-set bounded
        o3 = np.lexsort((b, a))
        a_s, b_s = a[o3], b[o3]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][: a_s.size]
        )
        n = np.diff(np.r_[starts, a_s.size]).astype(np.int64)
        return pa.table(
            {
                "g": np.zeros(starts.size, np.int64),
                "type_a": pa.array(a_s[starts], pa.string()),
                "type_b": pa.array(b_s[starts], pa.string()),
                "n_sessions": n,
            }
        )

    def final(group: pa.Table) -> pa.Table:
        a = group.column("type_a").to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        b = group.column("type_b").to_numpy(zero_copy_only=False)
        n = group.column("n_sessions").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s, n_s = a[order], b[order], n[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][: a_s.size]
        )
        return pa.table(
            {
                "type_a": pa.array(a_s[starts], pa.string()),
                "type_b": pa.array(b_s[starts], pa.string()),
                "n_sessions": np.add.reduceat(n_s, starts),
            }
        )

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return (
        keyed.groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["type_a", "type_b", "n_sessions"])
    )


def session_type_pairs_sql(table: str = "events", gap_min: int = 30) -> str:
    """DuckDB twin of :func:`session_type_pairs` — LAG-gap
    sessionization, DISTINCT (session, type), self-join pair count."""
    return f"""
WITH o AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL {gap_min} MINUTE THEN 1 ELSE 0 END AS brk
           FROM {table}),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid FROM o),
d AS (SELECT DISTINCT user_id, sid, event_type FROM s)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM d a JOIN d b ON a.user_id = b.user_id AND a.sid = b.sid
                 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def value_peaks(
    events: Dataset,
    window_us: int = 3_600_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    n_buckets: int = 256,
) -> Dataset:
    """Local-maximum (peak) detection per entity — every event whose
    floor-cents value equals the MAX over the entity's events within
    ``±window_us`` of its timestamp (the RANGE-frame peak screen of a
    monitoring pipeline): ``(user_id, event_id, value_cents)``. Plateau
    peers all qualify, matching the SQL RANGE frame exactly.

    Scale shape: ONE entity-bucket shuffle; the per-bucket fold builds
    a sparse table (O(n log n) ints) over the segment-safe key axis
    ``seg·2^46 + (ts − seg_min)`` — the 2^46 gap exceeds any in-segment
    span, so one global ``searchsorted`` yields window bounds that can
    never cross an entity boundary — then answers every range-max query
    vectorized. No per-row or per-entity Python.
    """
    tune_context()

    SEG_SHIFT = 46  # in-segment span must fit 2^45 µs (~1.1 years)

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = pc.cast(
            pc.floor(pc.multiply(tbl.column(value_col), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "bucket": bucket_of(k, n_buckets),
                "k": k,
                "ts": tbl.column(ts_col),
                "seq": tbl.column(seq_col),
                "cents": cents,
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                seq_col: pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
        k = group.column("k").to_numpy(zero_copy_only=False)
        n = k.size
        if n == 0:
            return empty
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        seq = group.column("seq").to_numpy(zero_copy_only=False)
        v = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, ts, k))
        k_s, t_s, seq_s, v_s = k[order], ts[order], seq[order], v[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        sizes = np.diff(np.r_[starts, n])
        seg_id = np.repeat(np.arange(starts.size, dtype=np.int64), sizes)
        if starts.size >= (1 << (63 - SEG_SHIFT)):
            raise ValueError("value_peaks: too many entities per bucket")
        tnorm = t_s - np.repeat(t_s[starts], sizes)
        if (tnorm >= (1 << (SEG_SHIFT - 1))).any():
            raise ValueError(
                "value_peaks: per-entity time span exceeds 2^45 µs"
            )
        key = seg_id * (np.int64(1) << SEG_SHIFT) + tnorm
        lo = np.searchsorted(key, key - window_us, side="left")
        hi = np.searchsorted(key, key + window_us, side="right")
        # sparse table: st[j][i] = max(v_s[i : i + 2^j])
        st = [v_s]
        j = 1
        while (1 << j) <= n:
            prev = st[-1]
            half = 1 << (j - 1)
            st.append(np.maximum(prev[: n - (1 << j) + 1], prev[half : n - half + 1]))
            j += 1
        L = hi - lo
        p = (np.frexp(L.astype(np.float64))[1] - 1).astype(np.int64)
        wmax = np.empty(n, np.int64)
        for level in np.unique(p):
            m = p == level
            tbl_l = st[int(level)]
            a = tbl_l[lo[m]]
            b = tbl_l[hi[m] - (1 << int(level))]
            wmax[m] = np.maximum(a, b)
        rec = v_s == wmax
        return pa.table(
            {key_col: k_s[rec], seq_col: seq_s[rec], "value_cents": v_s[rec]}
        )

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def value_peaks_sql(table: str = "events", window_us: int = 3_600_000_000) -> str:
    """DuckDB twin of :func:`value_peaks` — RANGE frame over epoch µs,
    equality against the window max."""
    return f"""
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS t,
                  CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
           FROM {table}),
w AS (SELECT user_id, event_id, cents,
             MAX(cents) OVER (PARTITION BY user_id ORDER BY t
               RANGE BETWEEN {window_us} PRECEDING
                 AND {window_us} FOLLOWING) AS wmax
      FROM c)
SELECT user_id, event_id, cents AS value_cents
FROM w WHERE cents = wmax
"""


DAY_US = 86_400_000_000


def rolling_wau(
    events: Dataset,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 256,
) -> Dataset:
    """Rolling window-distinct users — for every epoch day, the EXACT
    count of users active within the trailing ``window_days`` window
    (the rolling-WAU product metric; days with zero coverage are
    absent): ``(day, wau)``.

    A sliding COUNT(DISTINCT) does not decompose into per-day partials;
    the exact distributed plan instead expands, PER USER, the set of
    window-anchor days the user contributes to — the union of
    ``[active_day, active_day + w − 1]`` intervals (merged in one
    vectorized pass; a user contributes ≤1 to each anchor day by
    construction, so plain integer sums finish the job). ONE
    entity-bucket shuffle; partials are (day, count) rows bounded by
    the covered-day span, not events.
    """
    tune_context()
    from .merge import bucketed_sum

    w = int(window_days)
    if w < 1:
        raise ValueError("rolling_wau: window_days must be >= 1")

    def prep(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        us = (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = us // DAY_US
        order = np.lexsort((day, k))
        k_s, d_s = k[order], day[order]
        keep = np.r_[True, (k_s[1:] != k_s[:-1]) | (d_s[1:] != d_s[:-1])][: k_s.size]
        return pa.table(
            {
                "bucket": bucket_of(k_s[keep], n_buckets),
                "k": k_s[keep],
                "day": d_s[keep],
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        if k.size == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "wau": pa.array([], pa.int64())}
            )
        day = group.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, k))
        k_s, d_s = k[order], day[order]
        keep = np.r_[True, (k_s[1:] != k_s[:-1]) | (d_s[1:] != d_s[:-1])][: k_s.size]
        k_u, d_u = k_s[keep], d_s[keep]
        # merge [d, d+w-1] intervals per user: a new covered RUN starts
        # at a user change or a gap > w-1 days
        new_run = np.r_[True, (k_u[1:] != k_u[:-1]) | (d_u[1:] - d_u[:-1] > w - 1)][: k_u.size]
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        run_start = d_u[starts]
        # run end = last active day in run + w - 1
        run_end = np.maximum.reduceat(d_u, starts) + w - 1
        lens = (run_end - run_start + 1).astype(np.int64)
        total = int(lens.sum())
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        covered = np.repeat(run_start, lens) + (np.arange(total) - offs)
        dd, n = np.unique(covered, return_counts=True)
        return pa.table({"day": dd, "wau": n.astype(np.int64)})

    keyed = events.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    folded = keyed.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    return bucketed_sum(folded, key_col="day", value_cols=("wau",))


def rolling_wau_sql(table: str = "events", window_days: int = 7) -> str:
    """DuckDB twin of :func:`rolling_wau` — day grid × active days,
    trailing-window band join, COUNT(DISTINCT)."""
    return f"""
WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day
           FROM {table}),
b AS (SELECT MIN(day) AS lo, MAX(day) + {window_days - 1} AS hi FROM a),
g AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b)
SELECT g.day AS day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
FROM g JOIN a ON a.day BETWEEN g.day - {window_days - 1} AND g.day
GROUP BY g.day
"""
