"""Big-big equi-join: co-partitioned shuffle hash join.

The complement of :mod:`.lookup`'s broadcast join — when NEITHER side
fits in memory, both sides shuffle ONCE on a coarse hash bucket of the
key (same key → same bucket), and each bucket joins vectorized:
sort one side by key, range-match the other with ``searchsorted``, and
expand matches with a repeat/arange walk — full duplicate semantics on
both sides (every left row pairs with every matching right row), no
Python row loop.

Scale shape: ONE all-to-all of each side's PROJECTED columns (prune to
``left_cols``/``right_cols`` before the shuffle — never ship unused
columns), coarse buckets so a ``map_groups`` call handles thousands of
keys at once, and per-bucket memory bounded by the bucket's rows (salt
the key upstream if one key dominates; see the self-join salting notes
in :mod:`.spatial_join`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context
from ..functions.buckets import bucket_of

N_BUCKETS = 512


def hash_equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
    n_buckets: int = N_BUCKETS,
    how: str = "inner",
) -> Dataset:
    """Equi-join on an int64 key. Output columns: the key (named
    ``on``) + ``left_cols`` + ``right_cols`` (names must not collide —
    rename upstream if they do).

    ``how`` selects the join flavor (all share the ONE-shuffle
    co-partitioned plan — outer/semi/anti cost the same as inner):

    - ``"inner"``: every (left, right) key match.
    - ``"left"``: inner matches + unmatched left rows with nulls in
      ``right_cols``.
    - ``"outer"``: full outer — inner matches + unmatched rows from BOTH
      sides (nulls in the other side's payload columns; the key column
      is always populated, from whichever side the row came).
    - ``"semi"``: each left row at most once, kept iff the key exists on
      the right; ``right_cols`` must be empty.
    - ``"anti"``: each left row kept iff the key does NOT exist on the
      right; ``right_cols`` must be empty.
    """
    tune_context()
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"how={how!r} cannot project right-side columns")
    right_on = right_on or on
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"column name collision across sides: {sorted(overlap)}")
    reserved = {"__jb", "__jk", "__jside"} & {on, *left_cols, *right_cols}
    if reserved:
        raise ValueError(f"reserved internal column names: {sorted(reserved)}")

    def tag(key_col: str, side_val: int):
        def f(tbl: pa.Table) -> pa.Table:
            k = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            out = {
                "__jb": bucket_of(k, n_buckets),
                "__jk": k,
                "__jside": np.full(k.shape[0], side_val, dtype=np.int8),
            }
            for c in left_cols:
                out[c] = (
                    tbl.column(c)
                    if side_val == 0
                    else pa.nulls(tbl.num_rows, tbl_schema_type(c))
                )
            for c in right_cols:
                out[c] = (
                    tbl.column(c)
                    if side_val == 1
                    else pa.nulls(tbl.num_rows, tbl_schema_type(c))
                )
            return pa.table(out)

        return f

    # both sides must union with an IDENTICAL schema: resolve each
    # payload column's Arrow type from whichever side owns it
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema

    def tbl_schema_type(c: str) -> pa.DataType:
        if c in lschema.names:
            return lschema.field(c).type
        return rschema.field(c).type

    tagged = left.select_columns([on, *left_cols]).map_batches(
        tag(on, 0),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    ).union(
        right.select_columns([right_on, *right_cols]).map_batches(
            tag(right_on, 1),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
    )

    out_cols = (
        (*left_cols,) if how in ("semi", "anti") else (*left_cols, *right_cols)
    )

    def _empty() -> pa.Table:
        cols = {on: pa.array([], pa.int64())}
        for c in out_cols:
            cols[c] = pa.array([], tbl_schema_type(c))
        return pa.table(cols)

    def _left_only(group: pa.Table, lsel: np.ndarray, k: np.ndarray) -> pa.Table:
        # emit left rows verbatim; right cols (left/outer join) all-null
        out = {on: k[lsel]}
        take = pa.array(lsel)
        for c in left_cols:
            out[c] = group.column(c).take(take)
        if how in ("left", "outer"):
            for c in right_cols:
                out[c] = pa.nulls(lsel.shape[0], tbl_schema_type(c))
        return pa.table(out)

    def _right_only(group: pa.Table, rpos: np.ndarray, k: np.ndarray) -> pa.Table:
        # outer join: unmatched right rows, left payload all-null
        out = {on: k[rpos]}
        take = pa.array(rpos)
        for c in left_cols:
            out[c] = pa.nulls(rpos.shape[0], tbl_schema_type(c))
        for c in right_cols:
            out[c] = group.column(c).take(take)
        return pa.table(out)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__jside").to_numpy(zero_copy_only=False)
        k = group.column("__jk").to_numpy(zero_copy_only=False)
        lmask = side == 0
        rsel = np.nonzero(~lmask)[0]
        lsel = np.nonzero(lmask)[0]
        if not lsel.size:
            if how == "outer" and rsel.size:
                return _right_only(group, rsel, k)
            return _empty()
        if not rsel.size:
            if how in ("left", "outer", "anti"):
                return _left_only(group, lsel, k)
            return _empty()
        rk = k[rsel]
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        lo = np.searchsorted(rk_s, k[lsel], side="left")
        hi = np.searchsorted(rk_s, k[lsel], side="right")
        cnt = hi - lo
        if how == "semi":
            return _left_only(group, lsel[cnt > 0], k)
        if how == "anti":
            return _left_only(group, lsel[cnt == 0], k)
        li = np.repeat(np.arange(lsel.shape[0]), cnt)
        # right positions: each left row's [lo, hi) range expanded
        ri = np.arange(int(cnt.sum())) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        ) + np.repeat(lo, cnt)
        lrows = lsel[li]
        rrows = rsel[order[ri]]
        out = {on: k[lrows]}
        for c in left_cols:
            out[c] = group.column(c).take(pa.array(lrows))
        for c in right_cols:
            out[c] = group.column(c).take(pa.array(rrows))
        matched = pa.table(out)
        if how == "inner":
            return matched
        parts = [matched]
        miss = lsel[cnt == 0]
        if miss.size:
            parts.append(_left_only(group, miss, k))
        if how == "outer":
            # right rows never hit by any left range-expansion
            hit = np.zeros(rk_s.shape[0], dtype=bool)
            hit[ri] = True
            rmiss = rsel[order[~hit]]
            if rmiss.size:
                parts.append(_right_only(group, rmiss, k))
        return pa.concat_tables(parts) if len(parts) > 1 else matched

    return tagged.groupby("__jb").map_groups(join_bucket, batch_format="pyarrow")


def sum_semi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    value_cols: tuple[str, ...] = (),
    n_buckets: int = N_BUCKETS,
) -> Dataset:
    """Fused per-key integer SUM + SEMI join in ONE co-partitioned
    shuffle: sums ``value_cols`` (int64) of ``left`` per key and keeps
    the key iff it exists in ``right`` — the aggregate and the join
    share the same key, so they share the same bucket exchange (two
    separate stages would pay the all-to-all twice for identical row
    placement). Left rows should be batch-combined partials.

    Output: ``(on, *value_cols)``, one row per surviving key."""
    tune_context()
    right_on = right_on or on
    reserved = {"__jb", "__jk", "__jside"} & {on, *value_cols}
    if reserved:
        raise ValueError(f"reserved internal column names: {sorted(reserved)}")

    def tag_left(tbl: pa.Table) -> pa.Table:
        k = tbl.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        out = {
            "__jb": bucket_of(k, n_buckets),
            "__jk": k,
            "__jside": np.full(k.shape[0], 0, dtype=np.int8),
        }
        for c in value_cols:
            out[c] = tbl.column(c)
        return pa.table(out)

    def tag_right(tbl: pa.Table) -> pa.Table:
        k = tbl.column(right_on).to_numpy(zero_copy_only=False).astype(np.int64)
        # right keys pre-dedup per batch: membership only needs presence
        k = np.unique(k)
        out = {
            "__jb": bucket_of(k, n_buckets),
            "__jk": k,
            "__jside": np.full(k.shape[0], 1, dtype=np.int8),
        }
        for c in value_cols:
            out[c] = np.zeros(k.shape[0], dtype=np.int64)
        return pa.table(out)

    tagged = left.select_columns([on, *value_cols]).map_batches(
        tag_left,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    ).union(
        right.select_columns([right_on]).map_batches(
            tag_right,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
    )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__jside").to_numpy(zero_copy_only=False)
        k = group.column("__jk").to_numpy(zero_copy_only=False)
        lmask = side == 0
        empty = pa.table(
            {
                on: pa.array([], pa.int64()),
                **{c: pa.array([], pa.int64()) for c in value_cols},
            }
        )
        if not lmask.any() or lmask.all():
            return empty
        lsel = np.nonzero(lmask)[0]
        lk = k[lsel]
        order = np.argsort(lk, kind="stable")
        ks = lk[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]][: ks.size])
        uk = ks[starts]
        rk = np.unique(k[~lmask])
        pos = np.searchsorted(rk, uk)
        pos[pos >= rk.shape[0]] = rk.shape[0] - 1
        keep = rk[pos] == uk
        out = {on: pa.array(uk[keep], pa.int64())}
        for c in value_cols:
            v = group.column(c).to_numpy(zero_copy_only=False)[lsel][order]
            out[c] = pa.array(np.add.reduceat(v, starts)[keep], pa.int64())
        return pa.table(out)

    return tagged.groupby("__jb").map_groups(reduce_bucket, batch_format="pyarrow")


# ------------------------------------------------------------ bloom semi

_BLOOM_MIX1 = np.int64(-7046029254386353131)  # splitmix64 odd constants
_BLOOM_MIX2 = np.int64(-4417276706812531889)


def _bloom_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = (h1 + i·h2) % m.
    Wrapping int64 multiplies (numpy wraps like the C hash it mimics)."""
    with np.errstate(over="ignore"):
        h1 = keys * _BLOOM_MIX1
        h1 ^= h1 >> np.int64(33)
        h2 = keys * _BLOOM_MIX2
        h2 ^= h2 >> np.int64(29)
        h2 |= np.int64(1)  # odd step, full cycle
        i = np.arange(k_hashes, dtype=np.int64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.int64(m_bits)
    return np.abs(pos)


def bloom_semi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    left_cols: tuple[str, ...] = (),
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    n_buckets: int = N_BUCKETS,
) -> Dataset:
    """Bloom-gated big-big SEMI join — EXACTLY the rows of
    ``hash_equi_join(..., how="semi")``, via a different physical plan:

    1. ONE streaming pass over the right side folds every key into an
       ``m_bits``-bit Bloom filter (per-block bitmaps OR-reduced on the
       driver — the filter, not the keys, is the only driver state);
    2. the filter is ``ray.put`` once and every left batch drops its
       definite non-matches map-side BEFORE the shuffle;
    3. the surviving left rows run the exact co-partitioned semi join
       (Bloom false positives are eliminated here — the gate only
       prunes, never decides).

    This is the 100-TB plan when the right key set is too large to
    broadcast exactly: the all-to-all then ships only the (selectivity
    + ε) fraction of the left side. Default 1 Mbit ≈ 128 KB of driver /
    broadcast state.
    """
    tune_context()
    right_on = right_on or on
    n_bytes = (m_bits + 7) // 8

    def right_bits(tbl: pa.Table) -> pa.Table:
        k = tbl.column(right_on).to_numpy(zero_copy_only=False).astype(np.int64)
        bits = np.zeros(n_bytes, np.uint8)
        if k.size:
            pos = _bloom_positions(np.unique(k), m_bits, k_hashes).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    import ray

    bloom = np.zeros(n_bytes, np.uint8)
    parts = right.select_columns([right_on]).map_batches(
        right_bits,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for r in range(t.num_rows):
            bloom |= np.frombuffer(t.column("bits")[r].as_py(), np.uint8)
    bloom_ref = ray.put(bloom)

    def gate(tbl: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        k = tbl.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size == 0:
            return tbl
        pos = _bloom_positions(k, m_bits, k_hashes)
        hit = np.ones(k.size, bool)
        for i in range(k_hashes):
            p = pos[:, i]
            hit &= (b[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
        return tbl.filter(pa.array(hit))

    survivors = left.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    return hash_equi_join(
        survivors,
        right,
        on=on,
        right_on=right_on,
        left_cols=left_cols,
        how="semi",
        n_buckets=n_buckets,
    )
