"""Deduplication operators over the documents table.

- :func:`dedup_exact` — hash-partition on normalized text, keep min
  doc_id per group (one groupby shuffle of (text_hash, doc_id) pairs —
  the text itself never shuffles).
- :func:`minhash_pairs` — MinHash + LSH banding near-dup candidates:
  shingle → minhash signature (vectorized) → band buckets → groupby
  bucket → verified Jaccard pairs. Two map stages + one groupby.
- :func:`simhash_64` — 64-bit SimHash fingerprint per document.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard verification for a
  candidate pair Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context

from ..functions.buckets import blocked_triangle
from .text import hash_str_array

_M61 = (1 << 61) - 1


def _uniform_lists(flat2d: np.ndarray, typ: pa.DataType) -> pa.ListArray:
    """2D (n, w) array → ``list<typ>`` column from one offsets buffer —
    no per-row Python list objects (same pattern as the FixedSizeList
    assembly in ``stages/multimodal.py``; kept as variable-width list so
    the column type is unchanged for consumers)."""
    n, w = flat2d.shape
    offs = np.arange(0, (n + 1) * w, w, dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offs), pa.array(flat2d.ravel(), type=typ))


def _lists_matrix(col, dtype=None) -> np.ndarray:
    """Uniform-width list column → 2D numpy view of the flat buffer
    (replaces ``np.stack(col.to_numpy())``'s per-row array objects).
    ``list_flatten`` (not ``.values``) so sliced arrays read correctly."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    if dtype is not None:
        flat = flat.astype(dtype)
    return flat.reshape(len(arr), -1)


def _token_hashes(text_col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens of every row → (flat int64 hashes, row offsets).
    Tokens are hashed straight off the Arrow UTF-8 buffer (zero-copy into
    polars) — no numpy-unicode materialization of the token text."""
    toks = pc.split_pattern_regex(text_col, r"\s+").combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    hval = hash_str_array(toks.values)
    return hval, offs


def _shingle_hashes(hval: np.ndarray, offs: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per row (rolling combine), CSR layout.

    Vectorized over the FLAT token array: a position starts a shingle iff
    position+k-1 is still in the same row; rows shorter than k contribute
    one truncated shingle (their whole token run) to match the previous
    per-row semantics."""
    rows = len(offs) - 1
    total = hval.shape[0]
    lens = np.diff(offs)
    if total == 0:
        return np.empty(0, np.int64), np.zeros(rows + 1, dtype=np.int64)
    row_of = np.repeat(np.arange(rows), lens)
    mask = np.int64((1 << 62) - 1)

    # full k-shingles: start positions whose (k-1)-th successor shares the row
    head = total - (k - 1)
    full_start = np.zeros(total, dtype=bool)
    if head > 0:
        full_start[:head] = row_of[:head] == row_of[k - 1 :]
    starts = np.nonzero(full_start)[0]
    sh_full = hval[starts].copy()
    for j in range(1, k):
        sh_full = (sh_full * 1099511628211 + hval[starts + j]) & mask

    # short rows (0 < len < k): one shingle over all their tokens
    short_rows = np.nonzero((lens > 0) & (lens < k))[0]
    sh_short = np.zeros(short_rows.shape[0], dtype=np.int64)
    if short_rows.size:
        sh_short = hval[offs[short_rows]].copy()
        for j in range(1, k):
            live = lens[short_rows] > j
            idx2 = offs[short_rows[live]] + j
            sh_short[live] = (sh_short[live] * 1099511628211 + hval[idx2]) & mask

    # counts per row → CSR offsets; values ordered by row
    n_full = np.maximum(lens - k + 1, 0) * (lens >= k)
    n_all = n_full + ((lens > 0) & (lens < k)).astype(np.int64)
    out_off = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(n_all, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.int64)
    # full shingles are already in row order (starts ascending)
    full_rows = row_of[starts]
    pos_full = out_off[full_rows] + (starts - offs[full_rows])
    out[pos_full] = sh_full
    out[out_off[short_rows]] = sh_short
    return out, out_off


def _minhash_sig(sh: np.ndarray, offs: np.ndarray, perms: np.ndarray) -> np.ndarray:
    """(rows, n_perm) MinHash signatures via (a*x+b) mod M61 permutations.

    Vectorized: permute ALL shingles at once (total x n_perm), then
    per-row segment minima via ``np.minimum.reduceat`` — no per-row
    Python loop. Empty rows keep the M61 sentinel (reduceat yields a
    bogus value at empty segments; masked afterwards)."""
    rows = len(offs) - 1
    n_perm = perms.shape[0]
    sig = np.full((rows, n_perm), _M61, dtype=np.int64)
    if rows == 0 or sh.shape[0] == 0:
        return sig
    a, b = perms[:, 0], perms[:, 1]
    ph = (sh[:, None] * a[None, :] + b[None, :]) % _M61  # (total, n_perm)
    lens = np.diff(offs)
    nonempty = np.nonzero(lens > 0)[0]
    # reduceat over NONEMPTY rows' starts only: consecutive nonempty
    # starts bound exactly one row's values (empty rows occupy no
    # positions), and every index is valid (< total)
    mins = np.minimum.reduceat(ph, offs[:-1][nonempty], axis=0)
    sig[nonempty] = mins
    return sig


def _perms(n_perm: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            rng.integers(1, _M61 - 1, size=n_perm),
            rng.integers(0, _M61 - 1, size=n_perm),
        ],
        axis=1,
    ).astype(np.int64)


def dedup_exact(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Exact dedup: min id per distinct text. Shuffles only (hash, id)
    pairs — the text column is pruned before the shuffle (critical at
    100 TB). The reduce side groups by a COARSE 512-way hash bucket and
    takes all of a bucket's per-hash minima in one lexsort pass: Ray's
    native per-key aggregate on a key space the size of the corpus was
    3-6x slower (same lesson as ngram_jaccard). Per-batch pre-dedup
    keeps at most one (hash, min id) row per distinct text per batch."""
    tune_context()
    N_BUCKETS = 512

    def to_hash(tbl: pa.Table) -> pa.Table:
        h = hash_str_array(tbl.column(text_col))
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # map-side combine: min id per hash within the batch
        order = np.lexsort((ids, h))
        h_s, id_s = h[order], ids[order]
        keep = np.ones(h_s.shape[0], dtype=bool)
        keep[1:] = np.diff(h_s) != 0
        h_k, id_k = h_s[keep], id_s[keep]
        return pa.table(
            {
                "text_hash": h_k,
                id_col: id_k,
                "b": h_k % np.int64(N_BUCKETS),
            }
        )

    hashed = docs.map_batches(
        to_hash, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH)


    def min_per_hash(group: pa.Table) -> pa.Table:
        h = group.column("text_hash").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table({id_col: np.empty(0, np.int64)})
        order = np.lexsort((ids, h))
        h_s, id_s = h[order], ids[order]
        keep = np.ones(h_s.shape[0], dtype=bool)
        keep[1:] = np.diff(h_s) != 0
        return pa.table({id_col: id_s[keep]})

    return hashed.groupby("b").map_groups(min_per_hash, batch_format="pyarrow")


def source_dedup_stats(
    docs: Dataset,
    text_col: str = "text",
    group_col: str = "source",
) -> Dataset:
    """Per-group dedup report: ``(source, n_docs, n_unique)`` — total
    documents and distinct texts per source. The curation dashboard
    number ("how redundant is each crawl source?").

    Scale shape: text never shuffles — each batch collapses to one
    ``(source, text_hash, count)`` row per distinct text it saw; the
    first all-to-all co-locates identical (source, hash) pairs by a
    coarse bucket of the pair key and folds them; the second is
    metadata-sized (sources × buckets partial rows). Distinctness is by
    64-bit text hash, the same convention as :func:`dedup_exact`.
    """
    tune_context()
    NB = np.int64(512)

    def to_pairs(tbl: pa.Table) -> pa.Table:
        h = hash_str_array(tbl.column(text_col))
        src = tbl.column(group_col)
        sk = hash_str_array(src)
        order = np.lexsort((h, sk))
        sk_s, h_s = sk[order], h[order]
        keep = np.ones(h_s.shape[0], dtype=bool)
        keep[1:] = (np.diff(sk_s) != 0) | (np.diff(h_s) != 0)
        starts = np.flatnonzero(keep)
        sizes = np.diff(np.r_[starts, h_s.shape[0]])
        first_pos = pa.array(np.asarray(order[starts]))
        return pa.table(
            {
                group_col: src.take(first_pos),
                "skey": pa.array(sk_s[starts], pa.int64()),
                "text_hash": pa.array(h_s[starts], pa.int64()),
                "n": pa.array(sizes, pa.int64()),
                "b": pa.array((sk_s[starts] ^ h_s[starts]) % NB, pa.int64()),
            }
        )

    pairs = docs.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH)


    def fold_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "skey": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_unique": pa.array([], pa.int64()),
                "sb": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        sk = group.column("skey").to_numpy(zero_copy_only=False)
        h = group.column("text_hash").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((h, sk))
        sk_s, h_s, n_s = sk[order], h[order], n[order]
        new_pair = np.ones(sk_s.shape[0], dtype=bool)
        new_pair[1:] = (np.diff(sk_s) != 0) | (np.diff(h_s) != 0)
        # per-source segment boundaries over the pair-sorted order
        new_src = np.ones(sk_s.shape[0], dtype=bool)
        new_src[1:] = np.diff(sk_s) != 0
        s_starts = np.flatnonzero(new_src)
        n_docs = np.add.reduceat(n_s, s_starts)
        n_unique = np.add.reduceat(new_pair.astype(np.int64), s_starts)
        first_pos = pa.array(np.asarray(order[s_starts]))
        return pa.table(
            {
                group_col: group.column(group_col).take(first_pos),
                "skey": pa.array(sk_s[s_starts], pa.int64()),
                "n_docs": pa.array(n_docs, pa.int64()),
                "n_unique": pa.array(n_unique, pa.int64()),
                "sb": pa.array(sk_s[s_starts] % np.int64(32), pa.int64()),
            }
        )

    partials = pairs.groupby("b").map_groups(fold_pairs, batch_format="pyarrow")

    def fold_sources(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_unique": pa.array([], pa.int64()),
                }
            )
        sk = group.column("skey").to_numpy(zero_copy_only=False)
        nd = group.column("n_docs").to_numpy(zero_copy_only=False)
        nu = group.column("n_unique").to_numpy(zero_copy_only=False)
        order = np.argsort(sk, kind="stable")
        sk_s = sk[order]
        starts = np.flatnonzero(np.r_[True, sk_s[1:] != sk_s[:-1]][: sk_s.size])
        first_pos = pa.array(np.asarray(order[starts]))
        return pa.table(
            {
                group_col: group.column(group_col).take(first_pos),
                "n_docs": pa.array(np.add.reduceat(nd[order], starts), pa.int64()),
                "n_unique": pa.array(np.add.reduceat(nu[order], starts), pa.int64()),
            }
        )

    return partials.groupby("sb").map_groups(fold_sources, batch_format="pyarrow")


def _simhash_batch(text_col_arr: pa.ChunkedArray) -> np.ndarray:
    """63-bit SimHash per row (int64, non-negative), fully vectorized."""
    hval, offs = _token_hashes(text_col_arr)
    # (T, 64) ±1 bit matrix; per-doc segment sums via prefix sums
    bits = (((hval[:, None] >> np.arange(64)[None, :]) & 1) * 2 - 1).astype(np.int64)
    pref = np.zeros((hval.shape[0] + 1, 64), dtype=np.int64)
    np.cumsum(bits, axis=0, out=pref[1:])
    acc = pref[offs[1:]] - pref[offs[:-1]]  # (rows, 64)
    pos = (acc > 0).astype(np.uint64)
    weighted = pos << np.arange(64, dtype=np.uint64)[None, :]
    return (
        np.bitwise_or.reduce(weighted, axis=1) & np.uint64(0x7FFFFFFFFFFFFFFF)
    ).astype(np.int64)


def simhash_64(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(doc_id, simhash): 64-bit SimHash over token hashes."""

    def sh(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: tbl.column(id_col), "simhash": _simhash_batch(tbl.column(text_col))}
        )

    return docs.map_batches(sh, batch_format="pyarrow", zero_copy_batch=True)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element bit count of an int64/uint64 array."""
    return (
        np.unpackbits(x.astype(np.uint64).view(np.uint8).reshape(x.shape[0], 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


def simhash_pairs(
    docs: Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 5000,
) -> Dataset:
    """(id_a, id_b, hamming): near-dup pairs whose 64-bit SimHashes differ
    in <= ``max_hamming`` bits.

    EXACT for ``max_hamming <= 3``: the simhash is banded into 4 x 16-bit
    bands; <= 3 flipped bits leave at least one band untouched
    (pigeonhole), so every qualifying pair co-occurs in some band bucket,
    where it is verified with the exact popcount distance. Owner-band
    dedup (first matching band reports) keeps each pair once. One map +
    one groupby; only (id, simhash) rows shuffle — never text. Oversized
    buckets degrade to exact blocked all-pairs within the bucket (no
    silent drops), same policy as embedding_neardup.
    """
    tune_context()
    BANDS, BITS = 4, 16
    MASK = np.int64((1 << BITS) - 1)

    def to_band_rows(tbl: pa.Table) -> pa.Table:
        sh = _simhash_batch(tbl.column(text_col))
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = sh.shape[0]
        idx = np.tile(np.arange(n), BANDS)
        band = np.repeat(np.arange(BANDS, dtype=np.int64), n)
        slice_ = (sh[idx] >> (band * BITS)) & MASK
        return pa.table(
            {
                id_col: ids[idx],
                "simhash": sh[idx],
                "bucket": band * np.int64(1 << BITS) + slice_,
            }
        )

    banded = docs.map_batches(
        to_band_rows, batch_format="pyarrow", zero_copy_batch=True
    )


    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": np.empty(0, np.int64),
                "id_b": np.empty(0, np.int64),
                "hamming": np.empty(0, np.int64),
            }
        )
        n = group.num_rows
        if n < 2:
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sh = group.column("simhash").to_numpy(zero_copy_only=False)
        band = int(group.column("bucket")[0].as_py()) >> BITS
        if n > bucket_cap:
            import logging

            logging.getLogger(__name__).warning(
                "simhash_pairs: oversized band bucket (n=%d > cap=%d); exact "
                "blocked fallback",
                n,
                bucket_cap,
            )
        out_a, out_b, out_h = [], [], []
        for ia, ib in blocked_triangle(n, bucket_cap):
                if ia.size == 0:
                    continue
                ham = _popcount64(sh[ia] ^ sh[ib])
                keep = ham <= max_hamming
                ia, ib, ham = ia[keep], ib[keep], ham[keep]
                if ia.size == 0:
                    continue
                if band > 0:
                    # owner-band: an EARLIER untouched band already reported
                    sl_a = sh[ia, None] >> (np.arange(band) * BITS)[None, :] & MASK
                    sl_b = sh[ib, None] >> (np.arange(band) * BITS)[None, :] & MASK
                    prior = (sl_a == sl_b).any(axis=1)
                    ia, ib, ham = ia[~prior], ib[~prior], ham[~prior]
                # distinct docs can share a simhash AND ids may repeat in a
                # bucket only via different docs (each doc emits one row per
                # band) — drop accidental self-pairs
                a, b = ids[ia], ids[ib]
                nz = a != b
                lo = np.minimum(a[nz], b[nz])
                hi = np.maximum(a[nz], b[nz])
                out_a.append(lo)
                out_b.append(hi)
                out_h.append(ham[nz])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    return banded.groupby("bucket").map_groups(verify, batch_format="pyarrow")


def minhash_pairs(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    n_perm: int = 32,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> Dataset:
    """Near-duplicate pairs (id_a < id_b, jaccard_pct) via MinHash-LSH.

    map: signature + band-bucket rows → groupby(bucket): candidate pairs
    verified by signature-estimated Jaccard. A pair appears in several
    buckets → dedup by reporting it only in its FIRST matching band
    (owner-band rule — same trick as the spatial owner-cell rule).
    """
    tune_context()
    perms = _perms(n_perm)
    rows_per_band = n_perm // bands

    def to_buckets(tbl: pa.Table) -> pa.Table:
        hval, offs = _token_hashes(tbl.column(text_col))
        sh, soffs = _shingle_hashes(hval, offs, shingle_k)
        sig = _minhash_sig(sh, soffs, perms)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_band, out_bucket, out_sig = [], [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            bh = seg[:, 0]
            for j in range(1, rows_per_band):
                bh = (bh * 1099511628211 + seg[:, j]) & ((1 << 62) - 1)
            out_id.append(ids)
            out_band.append(np.full(ids.shape[0], b, dtype=np.int64))
            out_bucket.append(bh)
            # ship a 15-bit projection of each perm: the verifier only
            # tests per-perm EQUALITY, and a 1/32768 collision bias is
            # far below the estimator's own variance — 4x less shuffle
            # traffic than full int64 signatures (which repeat per band)
            out_sig.append((sig & 0x7FFF).astype(np.int16))
        return pa.table(
            {
                id_col: np.concatenate(out_id),
                "band": np.concatenate(out_band),
                "bucket": np.concatenate(out_bucket),
                "sig": _uniform_lists(np.concatenate(out_sig, axis=0), pa.int16()),
            }
        )

    bucketed = docs.map_batches(
        to_buckets, batch_format="pyarrow", zero_copy_batch=True
    )


    BUCKET_CAP = 2000

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "id_a": np.empty(0, np.int64),
                "id_b": np.empty(0, np.int64),
                "jaccard_pct": np.empty(0, np.int64),
            }
        )
        if n < 2:
            return empty
        if n > BUCKET_CAP:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_pairs: oversized LSH bucket (n=%d > cap=%d); exact "
                "blocked sweep within the bucket",
                n,
                BUCKET_CAP,
            )
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        band = int(group.column("band")[0].as_py())
        sig = _lists_matrix(group.column("sig"))
        out_a, out_b, out_e = [], [], []
        # blocked upper-triangle sweep: one block normally; exact O(n²)
        # blocks (never a silent drop) for degenerate-hash buckets
        for ia, ib in blocked_triangle(n, BUCKET_CAP):
                if ia.size == 0:
                    continue
                est = (sig[ia] == sig[ib]).mean(axis=1)
                keep = est >= jaccard_threshold
                ia, ib, est = ia[keep], ib[keep], est[keep]
                if ia.size == 0:
                    continue
                # owner-band dedup: report only if no EARLIER band matched
                if band > 0:
                    prior = (
                        sig[ia, : band * rows_per_band].reshape(
                            ia.size, band, rows_per_band
                        )
                        == sig[ib, : band * rows_per_band].reshape(
                            ib.size, band, rows_per_band
                        )
                    ).all(axis=2).any(axis=1)
                    ia, ib, est = ia[~prior], ib[~prior], est[~prior]
                a, b = ids[ia], ids[ib]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
                out_e.append((est * 100).astype(np.int64))
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "jaccard_pct": np.concatenate(out_e),
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")


def _emb_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = tbl.column(col).combine_chunks()
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def embedding_neardup_pairs(
    embeddings: Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    n_tables: int = 8,
    n_bits: int = 10,
    bucket_cap: int = 5000,
) -> Dataset:
    """Embedding-cosine near-dup pairs via MULTI-TABLE sign-LSH.

    Each vector lands in ``n_tables`` independent random-hyperplane
    buckets (one per table); in-bucket pairs are verified with exact
    cosine and deduped by the OWNER-TABLE rule (report only in the first
    table whose patterns collide — every row carries all tables'
    patterns, so the check is local, same trick as minhash's owner
    band). Per-pair recall at angle θ is 1-(1-p^bits)^tables with
    p = 1-θ/π — e.g. ≈0.97 at cosine 0.95 and ≈0.9997 at 0.99 with the
    defaults. Oversized buckets (degenerate direction clusters) are NOT
    dropped: they fall back to exact blocked all-pairs within the
    bucket, with a logged warning. The shuffle ships each embedding
    ``n_tables``× — bits/tables trade recall against amplification.

    Exact twin (oracle-checked): :func:`embedding_neardup_exact`.
    """
    tune_context()
    dim_probe = 64
    planes = np.random.default_rng(11).standard_normal((n_tables, dim_probe, n_bits))

    def bucket_rows(tbl: pa.Table) -> pa.Table:
        emb = _emb_matrix(tbl, "embedding")
        n, d = emb.shape
        pats = np.empty((n, n_tables), dtype=np.int64)
        pw = 1 << np.arange(n_bits, dtype=np.int64)
        for t in range(n_tables):
            signs = (emb @ planes[t, :d]) > 0
            pats[:, t] = signs @ pw
        idx = np.tile(np.arange(n), n_tables)
        table_of = np.repeat(np.arange(n_tables, dtype=np.int64), n)
        bucket = table_of * np.int64(1 << n_bits) + pats.T.ravel()
        norm = np.sqrt((emb * emb).sum(axis=1))
        return pa.table(
            {
                id_col: tbl.column(id_col).take(idx),
                "bucket": bucket,
                "embedding": tbl.column("embedding").take(idx),
                "norm": norm[idx],
                "pats": _uniform_lists(pats[idx].astype(np.int32), pa.int32()),
            }
        )

    bucketed = embeddings.map_batches(
        bucket_rows,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    def _pairs_block(ids, emb, norm, ia, ib):
        sims = (emb[ia] * emb[ib]).sum(axis=1) / np.maximum(norm[ia] * norm[ib], 1e-30)
        keep = sims >= threshold
        ia, ib, sims = ia[keep], ib[keep], sims[keep]
        a, b = ids[ia], ids[ib]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return ia, ib, lo, hi

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)})
        n = group.num_rows
        if n < 2:
            return empty
        emb = _emb_matrix(group, "embedding")
        norm = group.column("norm").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pats = _lists_matrix(group.column("pats"))
        table_id = int(group.column("bucket")[0].as_py()) >> n_bits
        if n > bucket_cap:
            import logging

            logging.getLogger(__name__).warning(
                "embedding_neardup: oversized LSH bucket (n=%d > cap=%d); "
                "falling back to exact blocked all-pairs within the bucket",
                n,
                bucket_cap,
            )
        out_a, out_b = [], []
        # blocked upper-triangle sweep: one block for normal buckets,
        # exact O(n^2) blocks (no drops) for oversized ones
        for ia, ib in blocked_triangle(n, bucket_cap):
                ia2, ib2, lo, hi = _pairs_block(ids, emb, norm, ia, ib)
                if ia2.size == 0:
                    continue
                if table_id > 0:
                    # owner-table dedup: an earlier table already caught it
                    prior = (pats[ia2, :table_id] == pats[ib2, :table_id]).any(axis=1)
                    lo, hi = lo[~prior], hi[~prior]
                out_a.append(lo)
                out_b.append(hi)
        if not out_a:
            return empty
        return pa.table(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")


def embedding_neardup_exact(
    embeddings: Dataset,
    threshold: float = 0.45,
    id_col: str = "vec_id",
) -> Dataset:
    """EXACT all-pairs cosine >= threshold (id_a < id_b) via a blocked
    self-join: normalized blocks are pinned in the object store once,
    then one task per unordered block pair computes a matmul and keeps
    qualifying pairs. O(N²) compute by definition — this is the exact
    baseline/oracle twin; :func:`embedding_neardup_pairs` (LSH) is the
    scale path. The block-pair fan-out streams through map_batches, so
    no task ever holds more than two blocks."""
    tune_context()

    def normalize(tbl: pa.Table) -> pa.Table:
        emb = _emb_matrix(tbl, "embedding")
        nrm = np.maximum(np.sqrt((emb * emb).sum(axis=1, keepdims=True)), 1e-30)
        nemb = emb / nrm
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "nemb": _uniform_lists(nemb, pa.float64()),
            }
        )

    norm_ds = embeddings.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True)
    refs = norm_ds.to_arrow_refs()  # blocks stay in the object store
    nb = len(refs)
    pair_items = [
        {"i": i, "j": j} for i in range(nb) for j in range(i, nb)
    ]

    def block_pair(tbl: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for i, j in zip(
            tbl.column("i").to_numpy(zero_copy_only=False),
            tbl.column("j").to_numpy(zero_copy_only=False),
        ):
            ta, tb = ray.get([refs[int(i)], refs[int(j)]])
            if ta.num_rows == 0 or tb.num_rows == 0:
                continue
            ea, eb = _emb_matrix(ta, "nemb"), _emb_matrix(tb, "nemb")
            ids_a = ta.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ids_b = tb.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            sims = ea @ eb.T
            ia, ib = np.nonzero(sims >= threshold)
            a, b = ids_a[ia], ids_b[ib]
            keep = a != b
            a, b = a[keep], b[keep]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            if i == j:
                # self block: every pair appears twice — keep one
                # (full-int64-safe: lexsort dedup, no bit packing)
                order = np.lexsort((hi, lo))
                lo_s, hi_s = lo[order], hi[order]
                keep2 = np.ones(lo_s.shape[0], dtype=bool)
                keep2[1:] = (np.diff(lo_s) != 0) | (np.diff(hi_s) != 0)
                lo, hi = lo_s[keep2], hi_s[keep2]
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pa.table(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        return pa.table(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return ray.data.from_items(pair_items).map_batches(
        block_pair, batch_format="pyarrow", zero_copy_batch=True, batch_size=4
    )


def _doc_shingle_hashes(
    tbl: pa.Table, n: int, text_col: str, id_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """DISTINCT (doc_id, gram_hash) rows for a batch — the word-n-gram
    set in 62-bit rolling-hash space (no string materialization; the
    whitespace token join is injective, so hash identity == string
    identity up to negligible 62-bit collisions). Only FULL n-grams
    count: docs shorter than n tokens contribute nothing, matching the
    SQL oracle's range(len(w)-n+1) generation."""
    hval, offs = _token_hashes(tbl.column(text_col))
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    total = hval.shape[0]
    if total == 0 or tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(tbl.num_rows), np.diff(offs))
    valid = np.zeros(total, dtype=bool)
    head = total - (n - 1)
    if head > 0:
        valid[:head] = doc_of[:head] == doc_of[n - 1 :]
    starts = np.nonzero(valid)[0]
    mask = np.int64((1 << 62) - 1)
    sh = hval[starts].copy()
    for j in range(1, n):
        sh = (sh * 1099511628211 + hval[starts + j]) & mask
    d = ids[doc_of[starts]]
    order = np.lexsort((sh, d))
    d, sh = d[order], sh[order]
    keep = np.ones(d.shape[0], dtype=bool)
    keep[1:] = (np.diff(d) != 0) | (np.diff(sh) != 0)
    return d[keep], sh[keep]


def ngram_jaccard_pairs(
    docs: Dataset,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_freq: int | None = None,
) -> Dataset:
    """EXACT word-n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard)
    for every pair with jaccard >= threshold, doc_a < doc_b.

    Shape: per-batch distinct (doc, gram) rows → ``groupby(gram bucket)``
    emits per-gram co-occurring pairs with local pair-dedup → coarse
    pair-hash bucket groupby sums intersections and applies the jaccard
    filter in the same vectorized pass. Two shuffles, both on small rows
    (the text never shuffles); both reduce sides are 512-bucket
    ``map_groups`` (one interpreter call per bucket — the native
    high-cardinality Aggregate was 3-6x slower end to end).

    ``max_gram_freq``: optional stop-gram cutoff — grams appearing in
    more than this many docs are DROPPED from pair expansion (hot grams
    fan out quadratically). Dropping is logged, never silent, and the
    result is then a lower bound on jaccard. ``None`` (default) keeps
    the op exact for the oracle.

    Doc ids may use the full int64 range: pair keys ship as separate
    (a, b) columns; only the per-doc gram COUNTS are packed (two 31-bit
    counts in one int64 — a count is bounded by doc length, never by
    corpus size).

    Scale note: per-doc shingle counts are computed batch-locally (a
    doc's text lives in exactly one input batch) — no global sizes
    aggregate, no driver broadcast.
    """
    tune_context()
    SHIFT = np.int64(32)
    N_GBUCKETS = 512

    def extract(tbl: pa.Table) -> pa.Table:
        d, sh = _doc_shingle_hashes(tbl, n, text_col, id_col)
        u, inv, c = np.unique(d, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "doc": d,
                "sh": sh,
                "nsh": c[inv],
                "gb": sh % np.int64(N_GBUCKETS),
            }
        )

    shmat = docs.map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH)


    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        sh = group.column("sh").to_numpy(zero_copy_only=False)
        docs_ = group.column("doc").to_numpy(zero_copy_only=False)
        nsh = group.column("nsh").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "n": np.empty(0, np.int64),
                "meta": np.empty(0, np.int64),
                "pkb": np.empty(0, np.int64),
            }
        )
        order = np.lexsort((docs_, sh))
        sh_s, d_s, nsh_s = sh[order], docs_[order], nsh[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(sh_s))[0] + 1])
        sizes_arr = np.diff(np.concatenate([starts, [sh_s.shape[0]]]))
        if max_gram_freq is not None:
            hot = sizes_arr > max_gram_freq
            if hot.any():
                import logging

                logging.getLogger(__name__).warning(
                    "ngram_jaccard: dropping %d stop-grams (doc freq > %d; "
                    "hottest=%d docs) — reported jaccard is a lower bound",
                    int(hot.sum()),
                    max_gram_freq,
                    int(sizes_arr.max()),
                )
                keep_rows = ~np.repeat(hot, sizes_arr)
                sh_s, d_s, nsh_s = sh_s[keep_rows], d_s[keep_rows], nsh_s[keep_rows]
                starts = np.concatenate(
                    [[0], np.nonzero(np.diff(sh_s))[0] + 1]
                ) if sh_s.size else np.empty(0, np.int64)
                sizes_arr = (
                    np.diff(np.concatenate([starts, [sh_s.shape[0]]]))
                    if sh_s.size
                    else np.empty(0, np.int64)
                )
        if sh_s.size == 0:
            return empty
        rank = np.arange(sh_s.shape[0]) - np.repeat(starts, sizes_arr)
        counts = np.repeat(sizes_arr, sizes_arr) - rank - 1
        if counts.sum() == 0:
            return empty
        a_glob = np.repeat(np.arange(sh_s.shape[0]), counts)
        run = np.arange(a_glob.shape[0]) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        b_glob = a_glob + run + 1
        pa_ids, pb_ids = d_s[a_glob], d_s[b_glob]
        # local per-pair dedup (full-int64-safe: lexsort on the id pair)
        porder = np.lexsort((pb_ids, pa_ids))
        pa_s, pb_s = pa_ids[porder], pb_ids[porder]
        pstarts = np.concatenate(
            [[0], np.nonzero((np.diff(pa_s) != 0) | (np.diff(pb_s) != 0))[0] + 1]
        )
        c = np.diff(np.concatenate([pstarts, [pa_s.shape[0]]]))
        first = porder[pstarts]
        # na/nb are constant per pair — pack into ONE column (31-bit gram
        # counts, safe at any corpus size)
        meta = (nsh_s[a_glob[first]] << SHIFT) | nsh_s[b_glob[first]]
        ua, ub = pa_s[pstarts], pb_s[pstarts]
        pkb = ((ua * 2654435761 + ub * 97) % 1000000007) % np.int64(N_GBUCKETS)
        return pa.table(
            {"a": ua, "b": ub, "n": c.astype(np.int64), "meta": meta, "pkb": pkb}
        )

    co = shmat.groupby("gb").map_groups(pairs_of_bucket, batch_format="pyarrow")

    def sum_bucket(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        cnt = group.column("n").to_numpy(zero_copy_only=False)
        meta = group.column("meta").to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pa.table(
                {
                    "doc_a": np.empty(0, np.int64),
                    "doc_b": np.empty(0, np.int64),
                    "jaccard": np.empty(0, np.float64),
                }
            )
        order = np.lexsort((b, a))
        a_s, b_s, n_s, m_s = a[order], b[order], cnt[order], meta[order]
        starts = np.concatenate(
            [[0], np.nonzero((np.diff(a_s) != 0) | (np.diff(b_s) != 0))[0] + 1]
        )
        inter = np.add.reduceat(n_s, starts)
        ua, ub, um = a_s[starts], b_s[starts], m_s[starts]
        na = um >> SHIFT
        nb = um & np.int64((1 << 31) - 1)
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        return pa.table(
            {"doc_a": ua[keep], "doc_b": ub[keep], "jaccard": jac[keep]}
        )

    return co.groupby("pkb").map_groups(sum_bucket, batch_format="pyarrow")


def _gram_bucket(grams: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized bucket id for an array of gram strings: polynomial hash
    over the first 32 codepoints (truncation only merges buckets — same
    gram always lands in the same bucket, which is all partitioning
    needs)."""
    if grams.shape[0] == 0:
        return np.empty(0, np.int64)
    a = np.asarray(grams, dtype="U32")
    m = a.view(np.uint32).reshape(a.shape[0], -1).astype(np.int64)
    h = np.zeros(a.shape[0], np.int64)
    mask = np.int64((1 << 62) - 1)
    for col in range(m.shape[1]):
        h = (h * 1000003 + m[:, col]) & mask
    return h % n_buckets
