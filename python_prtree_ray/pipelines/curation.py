"""Corpus-curation operators: repetition filters, benchmark
decontamination, and term-search retrieval over the documents table.

These are the Gopher-style quality/safety gates of an LLM training-data
pipeline (repetition stats per doc, "is this doc contaminated with
benchmark text", "which docs match this query"). All three stay
batch-local on the big side: document rows are atomic, so per-doc token
work never shuffles — the only exchanges are vocabulary-sized partials
(search df) or a tiny broadcast set (benchmark n-grams via ``ray.put``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import COMBINE_BATCH

# multiplier for combining word hashes into n-gram hashes (odd -> bijective
# per step mod 2^63); collision-free in practice for 63-bit outputs
_GRAM_MULT = np.int64(0x5851F42D4C957F2D) | np.int64(1)
_MASK63 = np.int64(0x7FFFFFFFFFFFFFFF)


def doc_token_codes(tbl: pa.Table, text_col: str = "text"):
    """Per-batch flattened tokenization: ``(doc_row, codes, dictionary)``.

    Tokens are ``[a-z]+`` runs of the lowercased text (the repo-wide
    word tokenizer, expression-compatible with the DuckDB
    ``regexp_extract_all(lower(text), '[a-z]+')`` oracle). ``doc_row``
    maps each token to its batch row; ``codes`` are dictionary indices
    (batch-local); order within a doc is text order.
    """
    toks = pc.split_pattern_regex(
        pc.replace_substring_regex(
            pc.utf8_lower(tbl.column(text_col)), "[^a-z]+", " "
        ),
        " ",
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    doc_row = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), lens)[nonempty]
    d = flat.filter(pa.array(nonempty)).dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return doc_row, codes, d.dictionary


def _segment_reduce(keys: np.ndarray, *values: np.ndarray):
    """Run-length reduce over SORTED keys: returns (unique_keys, starts,
    counts) — callers slice/aggregate values with np.add.reduceat etc."""
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]][: keys.size])
    counts = np.diff(np.r_[starts, keys.shape[0]])
    return keys[starts], starts, counts


def doc_repetition(docs: Dataset) -> Dataset:
    """Per-document bigram repetition stats (the Gopher repetition
    filter's raw ingredients): ``(doc_id, n_bigrams, distinct_bigrams,
    top_bigram_count)`` — all int64; docs with <2 tokens are absent.

    A doc whose ``top_bigram_count / n_bigrams`` is high is boilerplate
    or degenerate repetition; the caller thresholds. ZERO shuffle:
    document rows are atomic so every stat is batch-local.
    """

    def stats(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "distinct_bigrams": pa.array([], pa.int64()),
                "top_bigram_count": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        doc_row, codes, dic = doc_token_codes(tbl)
        if doc_row.size < 2:
            return empty
        vocab = np.int64(len(dic))
        adj = doc_row[1:] == doc_row[:-1]  # consecutive tokens, same doc
        bg_doc = doc_row[:-1][adj]
        if bg_doc.size == 0:
            return empty
        bg_id = codes[:-1][adj] * vocab + codes[1:][adj]
        order = np.lexsort((bg_id, bg_doc))
        bd, bi = bg_doc[order], bg_id[order]
        # collapse to per-(doc, bigram) counts
        pair_change = np.r_[True, (bd[1:] != bd[:-1]) | (bi[1:] != bi[:-1])][: bd.size]
        starts = np.flatnonzero(pair_change)
        cnt = np.diff(np.r_[starts, bd.shape[0]]).astype(np.int64)
        pd_doc = bd[starts]
        # per-doc aggregates over the (doc, bigram, count) runs
        d_keys, d_starts, d_counts = _segment_reduce(pd_doc)
        n_bigrams = np.add.reduceat(cnt, d_starts)
        top = np.maximum.reduceat(cnt, d_starts)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[d_keys], pa.int64()),
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "distinct_bigrams": pa.array(d_counts.astype(np.int64), pa.int64()),
                "top_bigram_count": pa.array(top, pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def _gram_hashes(doc_row: np.ndarray, word_h: np.ndarray, n: int):
    """Rolling-combine word hashes into n-gram hashes (63-bit), keeping
    only windows fully inside one doc. Returns (gram_doc, gram_hash)."""
    if doc_row.size < n:
        e = np.empty(0, np.int64)
        return e, e
    m = doc_row.size - n + 1
    g = word_h[:m].copy()
    for j in range(1, n):
        g = (g * _GRAM_MULT + word_h[j : j + m]) & _MASK63
    inside = doc_row[: m] == doc_row[n - 1 :]
    return doc_row[:m][inside], g[inside]


def decontaminate(
    docs: Dataset,
    n: int = 5,
    bench_modulus: int = 97,
) -> Dataset:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with the benchmark subset (docs where ``doc_id %
    bench_modulus == 0`` — the stand-in for a held-out eval suite).
    Output ``(doc_id, n_hits)`` with ``n_hits`` = number of DISTINCT
    benchmark n-grams present; only contaminated non-benchmark docs.

    Scale shape: a real benchmark suite is MB-sized regardless of corpus
    size, so its distinct gram-hash set is built in one filtered pass,
    sorted once, and broadcast via ``ray.put``; the corpus pass is
    ZERO-shuffle (per-batch rolling-hash grams + ``searchsorted``
    membership). N-grams are compared as 63-bit combined word hashes on
    both sides — no gram strings ever materialize.

    Oracle-equality note: the SQL oracle compares exact gram STRINGS, so
    parity with it is probabilistic in principle — a 63-bit collision
    between a corpus gram and a benchmark gram would inflate ``n_hits``.
    With B benchmark grams and G corpus grams the expected collision
    count is ~ G*B / 2^63 (at sf1 scale, < 1e-9); every driver round to
    date has hash-matched. This is the only oracle whose equality is
    collision-bounded rather than exact.
    """
    import ray

    from .text import hash_str_array

    mod = np.int64(bench_modulus)

    def bench_grams(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tbl = tbl.filter(pa.array(ids % mod == 0))
        if tbl.num_rows == 0:
            return pa.table({"gh": pa.array([], pa.int64())})
        doc_row, codes, dic = doc_token_codes(tbl)
        word_h = hash_str_array(dic)[codes]
        _, gh = _gram_hashes(doc_row, word_h, n)
        return pa.table({"gh": pa.array(np.unique(gh), pa.int64())})

    parts = [
        t
        for t in ray.get(
            docs.map_batches(
                bench_grams, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if parts:
        bench = np.unique(
            pa.concat_tables(parts).column("gh").to_numpy(zero_copy_only=False)
        )
    else:
        bench = np.empty(0, np.int64)
    bench_ref = ray.put(bench)

    def probe(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
        )
        ids_all = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tbl = tbl.filter(pa.array(ids_all % mod != 0))
        if tbl.num_rows == 0:
            return empty
        doc_row, codes, dic = doc_token_codes(tbl)
        word_h = hash_str_array(dic)[codes]
        gd, gh = _gram_hashes(doc_row, word_h, n)
        if gd.size == 0:
            return empty
        # distinct (doc, gram) then membership against the broadcast set
        order = np.lexsort((gh, gd))
        gd, gh = gd[order], gh[order]
        first = np.r_[True, (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])][: gd.size]
        gd, gh = gd[first], gh[first]
        bg = ray.get(bench_ref)
        pos = np.searchsorted(bg, gh)
        pos[pos == bg.shape[0]] = 0
        hit = bg.shape[0] > 0
        hits = (bg[pos] == gh) if hit else np.zeros(gh.shape[0], dtype=bool)
        if not hits.any():
            return empty
        hd = gd[hits]
        d_keys, _, d_counts = _segment_reduce(hd)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[d_keys], pa.int64()),
                "n_hits": pa.array(d_counts.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def search_topk(
    docs: Dataset,
    terms: tuple[str, ...] = ("spark", "join", "window"),
    k: int = 20,
) -> Dataset:
    """Integer tf-idf retrieval: score every document against a fixed
    term set (``score = sum_t tf_t * (n_docs // df_t)``, int64 — the
    same integer-quantized idf as :func:`text.doc_tfidf_top`, so
    SQL-oracle-checkable bit-for-bit) and return the global top-``k``
    as ``(doc_id, score, rank)``; ties break on smaller doc_id.

    Scale shape: df for a handful of query terms is a TINY aggregate
    (one per-batch partial row per term -> driver sum); scoring is
    batch-local Arrow; the top-k uses the shared threshold-pruned
    ``global_topk`` merge (each batch ships <= k rows). The corpus text
    never shuffles.
    """
    import ray

    from .merge import global_topk

    term_list = list(terms)
    # terms are interpolated into an RE2 word-boundary pattern below AND
    # counted by the [a-z]+ tokenizer; anything outside ^[a-z]+$ would make
    # the two disagree (and metacharacters would corrupt the regex).
    for t in term_list:
        if not re.fullmatch(r"[a-z]+", t):
            raise ValueError(
                f"search_topk terms must match ^[a-z]+$, got {t!r}"
            )

    def df_partial(tbl: pa.Table) -> pa.Table:
        out = np.zeros(len(term_list), dtype=np.int64)
        if tbl.num_rows:
            low = pc.utf8_lower(tbl.column("text"))
            for i, t in enumerate(term_list):
                # word-boundary containment: count docs whose token set
                # includes the term (pad-split avoids substring hits)
                m = pc.match_substring_regex(low, rf"(^|[^a-z]){t}($|[^a-z])")
                out[i] = pc.sum(pc.cast(m, pa.int64())).as_py() or 0
        return pa.table(
            {
                "term_idx": np.arange(len(term_list), dtype=np.int64),
                "df": out,
            }
        )

    partials = [
        t
        for t in ray.get(
            docs.map_batches(
                df_partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    df = np.zeros(len(term_list), dtype=np.int64)
    for t in partials:
        df[t.column("term_idx").to_numpy(zero_copy_only=False)] += t.column(
            "df"
        ).to_numpy(zero_copy_only=False)
    n_docs = np.int64(docs.count())
    idf = np.where(df > 0, n_docs // np.maximum(df, 1), 0)

    def score(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
            )
        doc_row, codes, dic = doc_token_codes(tbl)
        sc = np.zeros(tbl.num_rows, dtype=np.int64)
        if doc_row.size:
            words = dic.to_numpy(zero_copy_only=False)
            for i, t in enumerate(term_list):
                hit = np.flatnonzero(words == t)
                if hit.size == 0 or idf[i] == 0:
                    continue
                sel = codes == hit[0]
                np.add.at(sc, doc_row[sel], idf[i])
        keep = sc > 0
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "score": pa.array(sc[keep], pa.int64()),
            }
        )

    scored = docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return global_topk(scored, k=k, id_col="doc_id", value_col="score")


def search_bm25(
    docs: Dataset,
    terms: tuple[str, ...] = ("spark", "join", "window"),
    k: int = 20,
) -> Dataset:
    """BM25 retrieval over the corpus for a fixed term set → global
    top-``k`` ``(doc_id, score, rank)``; ties break on smaller doc_id.

    The scoring function is BM25 with k1=1.5, b=0.75 and the RATIONAL
    idf ``(N - df + 0.5)/(df + 0.5)`` (no ln — every operation is IEEE
    +,-,*,/ in a fixed order, so the DuckDB SQL oracle reproduces the
    float64 scores BITWISE; a transcendental idf would be at the mercy
    of libm differences). Zero-df terms need no special case: tf is 0
    wherever df is, so the term contributes exactly +0.0.

    Scale shape (same as :func:`search_topk`): one fused streaming pass
    emits per-batch partials for df (docs containing each term), total
    token count and doc count — a metadata-sized driver fold — then a
    second pass scores batch-locally and ships ≤ k rows per batch into
    the threshold-pruned ``global_topk`` merge. The corpus text never
    shuffles.
    """
    import ray

    from .merge import global_topk

    K1, B, ONE_MINUS_B, K1P1 = 1.5, 0.75, 0.25, 2.5
    term_list = list(terms)
    for t in term_list:
        if not re.fullmatch(r"[a-z]+", t):
            raise ValueError(f"search_bm25 terms must match ^[a-z]+$, got {t!r}")

    def _tfs(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(tf[n_terms, n_rows], dl[n_rows]) from the shared tokenizer."""
        doc_row, codes, dic = doc_token_codes(tbl)
        n = tbl.num_rows
        dl = np.zeros(n, dtype=np.int64)
        if doc_row.size:
            np.add.at(dl, doc_row, 1)
        tf = np.zeros((len(term_list), n), dtype=np.int64)
        if doc_row.size:
            words = dic.to_numpy(zero_copy_only=False)
            for i, t in enumerate(term_list):
                hit = np.flatnonzero(words == t)
                if hit.size:
                    np.add.at(tf[i], doc_row[codes == hit[0]], 1)
        return tf, dl

    def stats_partial(tbl: pa.Table) -> pa.Table:
        tf, dl = _tfs(tbl)
        return pa.table(
            {
                "df": pa.array((tf > 0).sum(axis=1).astype(np.int64)),
                "term_idx": np.arange(len(term_list), dtype=np.int64),
                "sum_dl": pa.array(
                    np.full(len(term_list), int(dl.sum()), dtype=np.int64)
                ),
                "n_docs": pa.array(
                    np.full(len(term_list), tbl.num_rows, dtype=np.int64)
                ),
            }
        )

    partials = [
        t
        for t in ray.get(
            docs.map_batches(
                stats_partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    df = np.zeros(len(term_list), dtype=np.float64)
    sum_dl = 0
    n_docs = 0
    for t in partials:
        ti = t.column("term_idx").to_numpy(zero_copy_only=False)
        df[ti] += t.column("df").to_numpy(zero_copy_only=False)
        sum_dl += int(t.column("sum_dl")[0].as_py())
        n_docs += int(t.column("n_docs")[0].as_py())
    if n_docs == 0:
        raise ValueError("search_bm25: empty corpus")
    # expression order mirrored verbatim in the SQL oracle
    avgdl = np.float64(sum_dl) / np.float64(n_docs)
    idf = ((np.float64(n_docs) - df) + 0.5) / (df + 0.5)

    def score(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        tf, dl = _tfs(tbl)
        denom = K1 * (ONE_MINUS_B + B * (dl.astype(np.float64) / avgdl))
        sc = np.zeros(tbl.num_rows, dtype=np.float64)
        for i in range(len(term_list)):  # fixed order == SQL's (s0+s1)+s2
            tfi = tf[i].astype(np.float64)
            sc = sc + idf[i] * ((tfi * K1P1) / (tfi + denom))
        keep = sc > 0
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "score": pa.array(sc[keep], pa.float64()),
            }
        )

    scored = docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    return global_topk(scored, k=k, id_col="doc_id", value_col="score")


def doc_lm_freq(docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, sum_freq, mean_freq): unigram corpus-frequency
    scoring — the cheap LM-quality proxy (docs whose tokens are all
    corpus-rare are noise/garble; docs of only stop-words are
    boilerplate). ``sum_freq`` = sum over the doc's tokens of that
    token's CORPUS count, exact int64; ``mean_freq`` the per-token mean.

    Two passes. Pass 1 folds per-batch (token-hash, count) partials into
    the global unigram table (ONE coarse hash-bucket shuffle,
    vocabulary-sized rows, text never shuffles) and broadcasts it sorted
    via ``ray.put``. Pass 2 is map-only: searchsorted lookup + per-doc
    reduceat. Tokens are compared as 63-bit string hashes (same design
    and collision bound as :func:`decontaminate`); docs with zero
    ``[a-z]+`` tokens are absent (matches the SQL twin's inner join).

    100-TB note: the broadcast is vocabulary-sized. Web-scale corpora
    with unbounded hapax tails should prune counts < k in pass 1 (rare
    tokens then score 0 via the lookup default) or swap in a count-min
    sketch; both keep pass 2 unchanged.
    """
    import ray

    from .merge import bucketed_sum
    from .text import hash_str_array

    def count_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        doc_row, codes, dic = doc_token_codes(tbl)
        if doc_row.size == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        # dictionary-coded: count codes, then emit one row per DISTINCT
        # word per batch with its string hash
        cnt = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        used = cnt > 0
        return pa.table(
            {
                "h": pa.array(hash_str_array(dic)[used]),
                "n": pa.array(cnt[used]),
            }
        )

    vocab = bucketed_sum(
        docs.map_batches(
            count_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="h",
        value_cols=("n",),
    )
    parts = [t for t in ray.get(vocab.to_arrow_refs()) if t.num_rows]
    if parts:
        vt = pa.concat_tables(parts)
        h = vt.column("h").to_numpy(zero_copy_only=False)
        n = vt.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        vocab_ref = ray.put((h[order], n[order]))
    else:
        vocab_ref = ray.put(
            (np.empty(0, np.int64), np.empty(0, np.int64))
        )

    def score(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "sum_freq": pa.array([], pa.int64()),
                "mean_freq": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        doc_row, codes, dic = doc_token_codes(tbl)
        if doc_row.size == 0:
            return empty
        vh, vn = ray.get(vocab_ref)
        freq = vn[np.searchsorted(vh, hash_str_array(dic)[codes])]
        d_keys, d_starts, d_counts = _segment_reduce(doc_row)
        sum_f = np.add.reduceat(freq, d_starts)
        n_tok = d_counts.astype(np.int64)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[d_keys], pa.int64()),
                "n_tokens": pa.array(n_tok),
                "sum_freq": pa.array(sum_f),
                "mean_freq": pa.array(
                    sum_f.astype(np.float64) / n_tok.astype(np.float64)
                ),
            }
        )

    return docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def dup_ngram_coverage(docs: Dataset, n: int = 3, n_buckets: int = 512) -> Dataset:
    """Exact-substring-dedup coverage (the per-document diagnostic of
    "Deduplicating Training Data Makes Language Models Better"-style
    cross-document repeated-span removal): ``(doc_id, n_grams, n_dup)``
    where ``n_grams`` is the doc's word ``n``-gram position count and
    ``n_dup`` the positions whose n-gram also occurs in ≥1 OTHER
    document. ``n_dup / n_grams`` is the doc's cross-corpus duplication
    ratio; docs with <n tokens are absent.

    Scale shape: text never shuffles. Pass 1 collapses each batch to
    distinct ``(gram_hash, doc, n_positions)`` rows (63-bit rolling word
    hashes — same machinery as :func:`decontaminate`); ONE gram-bucket
    groupby counts distinct docs per gram AND folds the per-(gram, doc)
    partials in the same pass, emitting doc-keyed partials; ONE tiny
    doc-bucket sum finishes. Same collision caveat as
    :func:`decontaminate`: the SQL twin compares gram STRINGS, this side
    63-bit hashes — expected cross-side divergence ~ G²/2⁶³.
    """
    from .merge import bucketed_sum
    from .text import hash_str_array
    from ..functions.buckets import bucket_of

    _empty_part = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "npos": pa.array([], pa.int64()),
        }
    )

    def grams(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty_part
        doc_row, codes, dic = doc_token_codes(tbl)
        word_h = hash_str_array(dic)[codes]
        gd, gh = _gram_hashes(doc_row, word_h, n)
        if gd.size == 0:
            return _empty_part
        order = np.lexsort((gh, gd))
        gd, gh = gd[order], gh[order]
        first = np.r_[True, (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])][: gd.size]
        starts = np.flatnonzero(first)
        npos = np.diff(np.r_[starts, gd.shape[0]]).astype(np.int64)
        gd, gh = gd[starts], gh[starts]
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": bucket_of(gh, n_buckets),
                "gh": gh,
                "doc_id": ids[gd].astype(np.int64),
                "npos": npos,
            }
        )

    _empty_doc = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_dup": pa.array([], pa.int64()),
        }
    )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_doc
        gh = group.column("gh").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        npos = group.column("npos").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, gh))
        gh, doc, npos = gh[order], doc[order], npos[order]
        # collapse same-(gram, doc) partials from different batches
        pd_first = np.r_[True, (gh[1:] != gh[:-1]) | (doc[1:] != doc[:-1])][: gh.size]
        p_starts = np.flatnonzero(pd_first)
        npos_t = np.add.reduceat(npos, p_starts)
        gh, doc = gh[p_starts], doc[p_starts]
        # distinct-doc count per gram (rows are now unique (gram, doc))
        g_starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]][: gh.size])
        ndocs = np.diff(np.r_[g_starts, gh.shape[0]])
        dup = np.repeat(ndocs >= 2, ndocs)
        return pa.table(
            {
                "doc_id": doc,
                "n_grams": npos_t.astype(np.int64),
                "n_dup": np.where(dup, npos_t, 0).astype(np.int64),
            }
        )

    parts = docs.map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )
    per_doc = parts.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    return bucketed_sum(per_doc, key_col="doc_id", value_cols=("n_grams", "n_dup"))


def dup_ngram_coverage_sql(n: int = 3) -> str:
    """DuckDB twin of :func:`dup_ngram_coverage` (gram strings instead
    of hashes; otherwise the same counts)."""
    joins = " ".join(
        f"JOIN w t{j} ON t0.doc_id = t{j}.doc_id AND t{j}.pos = t0.pos + {j}"
        for j in range(1, n)
    )
    concat = " || ' ' || ".join(f"t{j}.w" for j in range(n))
    return f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
           FROM documents),
w AS (SELECT doc_id, l[i] AS w, i AS pos FROM t,
      LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
g AS (SELECT t0.doc_id, {concat} AS gram
      FROM w t0 {joins}),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM g JOIN gd USING (gram) GROUP BY g.doc_id
"""


def gram_novelty(docs: Dataset, n: int = 2, n_buckets: int = 512) -> Dataset:
    """Per-document n-gram novelty — the corpus-ordered "how much of
    this doc is new text" diagnostic used when curating incremental
    training dumps: ``(doc_id, n_distinct, n_new)`` where ``n_distinct``
    is the doc's DISTINCT word n-gram count and ``n_new`` the distinct
    grams whose FIRST corpus occurrence (minimum doc_id) is this doc.
    ``n_new / n_distinct`` is the doc's novelty ratio; docs with < n
    tokens are absent.

    Scale shape: text never shuffles. Pass 1 collapses each batch to
    distinct ``(gram_hash, doc_id)`` pairs (63-bit rolling word hashes —
    same machinery as :func:`decontaminate`); ONE gram-bucket groupby
    finds each gram's minimum doc AND folds both per-doc counters in the
    same pass (a gram's pairs all land in its bucket, so the min and the
    distinct-count are exact there); ONE tiny doc-bucket sum finishes.
    Same collision caveat as :func:`decontaminate`: the SQL twin
    compares gram STRINGS, this side 63-bit hashes — expected cross-side
    divergence ~ G²/2⁶³.
    """
    from .merge import bucketed_sum
    from .text import hash_str_array
    from ..functions.buckets import bucket_of

    _empty_part = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
        }
    )

    def grams(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty_part
        doc_row, codes, dic = doc_token_codes(tbl)
        word_h = hash_str_array(dic)[codes]
        gd, gh = _gram_hashes(doc_row, word_h, n)
        if gd.size == 0:
            return _empty_part
        order = np.lexsort((gh, gd))
        gd, gh = gd[order], gh[order]
        first = np.r_[True, (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])][: gd.size]
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        gd, gh = gd[first], gh[first]
        return pa.table(
            {
                "bucket": bucket_of(gh, n_buckets),
                "gh": gh,
                "doc_id": ids[gd].astype(np.int64),
            }
        )

    _empty_doc = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "n_new": pa.array([], pa.int64()),
        }
    )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_doc
        gh = group.column("gh").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, gh))
        gh, doc = gh[order], doc[order]
        # collapse same-(gram, doc) pairs from different batches
        keep = np.r_[True, (gh[1:] != gh[:-1]) | (doc[1:] != doc[:-1])][: gh.size]
        gh, doc = gh[keep], doc[keep]
        # rows are unique (gram, doc), doc-sorted within gram: the first
        # row of each gram run carries the gram's minimum doc
        g_starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]][: gh.size])
        win = doc[g_starts]
        du, dc = np.unique(doc, return_counts=True)
        wu, wc = np.unique(win, return_counts=True)
        nn = np.zeros(du.size, np.int64)
        nn[np.searchsorted(du, wu)] = wc  # wu ⊆ du: a winner has ≥1 pair
        return pa.table(
            {
                "doc_id": du,
                "n_distinct": dc.astype(np.int64),
                "n_new": nn,
            }
        )

    pairs = docs.map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = pairs.groupby("bucket").map_groups(fold, batch_format="pyarrow")
    return bucketed_sum(
        folded, key_col="doc_id", value_cols=("n_distinct", "n_new")
    )


def gram_novelty_sql(n: int = 2) -> str:
    """DuckDB twin of :func:`gram_novelty` (gram strings instead of
    hashes; otherwise the same counts)."""
    joins = " ".join(
        f"JOIN w t{j} ON t0.doc_id = t{j}.doc_id AND t{j}.pos = t0.pos + {j}"
        for j in range(1, n)
    )
    concat = " || ' ' || ".join(f"t{j}.w" for j in range(n))
    return f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
           FROM documents),
w AS (SELECT doc_id, l[i] AS w, i AS pos FROM t,
      LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
g AS (SELECT DISTINCT t0.doc_id, {concat} AS gram
      FROM w t0 {joins}),
m AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new
FROM g JOIN m USING (gram) GROUP BY g.doc_id
"""


def source_jaccard(docs: Dataset, n_buckets: int = 512) -> Dataset:
    """Pairwise VOCABULARY overlap between document sources: for every
    source pair whose distinct ``[a-z]+`` word sets intersect, one row
    ``(source_a, source_b, n_inter, n_union, jaccard)`` — the corpus-
    mixing diagnostic ("how much does source X's vocabulary overlap
    source Y's") of a multi-source training pipeline.

    Scale shape: sources are metadata (one tiny distinct fold,
    broadcast as a code dict — raises beyond 63 sources; shard the
    bitmask to go wider). Each batch collapses to distinct
    (word, source-bitmask) rows — vocabulary-sized, never token-sized;
    ONE word-hash bucket shuffle ORs masks per word (idempotent, so
    cross-batch duplicates are free); each bucket then folds its
    (words × sources) bit matrix into a sources × sources intersection
    partial via one integer matmul, and a single tiny fold finishes.
    ``n_union = |A| + |B| − n_inter`` keeps jaccard ONE float division
    of exact ints — bitwise-equal to the SQL twin.
    """
    import ray

    from .text import hash_str_array

    def src_stage(tbl: pa.Table) -> pa.Table:
        u = pc.unique(tbl.column("source"))
        return pa.table({"source": u})

    src_rows = docs.map_batches(
        src_stage, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    sources = sorted({r["source"] for r in src_rows})
    if len(sources) > 63:
        raise ValueError("source_jaccard: >63 sources needs a sharded mask")
    n_src = len(sources)
    ref_codes = ray.put(pa.array(sources, pa.string()))

    def mask_stage(tbl: pa.Table) -> pa.Table:
        src_arr = ray.get(ref_codes)
        doc_row, codes, dic = doc_token_codes(tbl)
        if codes.size == 0:
            return pa.table(
                {
                    "wb": np.empty(0, np.int64),
                    "h": np.empty(0, np.int64),
                    "word": pa.array([], pa.string()),
                    "mask": np.empty(0, np.int64),
                }
            )
        sc = (
            pc.index_in(tbl.column("source"), value_set=src_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bit = np.int64(1) << sc
        m = bit[doc_row]
        order = np.argsort(codes, kind="stable")
        c_s, m_s = codes[order], m[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]][: c_s.size])
        masks = np.bitwise_or.reduceat(m_s, starts)
        words = dic.take(pa.array(c_s[starts]))
        h = hash_str_array(words)
        return pa.table(
            {
                "wb": h % np.int64(n_buckets),
                "h": h,
                "word": words,
                "mask": masks,
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {
                    "g": np.empty(0, np.int8),
                    "i": np.empty(0, np.int64),
                    "j": np.empty(0, np.int64),
                    "n": np.empty(0, np.int64),
                }
            )
        m = group.column("mask").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s, m_s = h[order], m[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]][: h_s.size])
        masks = np.bitwise_or.reduceat(m_s, starts)
        bits = (
            (masks[:, None] >> np.arange(n_src, dtype=np.int64)[None, :]) & 1
        ).astype(np.int64)
        inter = bits.T @ bits  # sources x sources, exact int
        iu, ju = np.triu_indices(n_src)
        n = inter[iu, ju]
        nz = n > 0
        return pa.table(
            {
                "g": np.zeros(int(nz.sum()), np.int8),
                "i": iu[nz].astype(np.int64),
                "j": ju[nz].astype(np.int64),
                "n": n[nz],
            }
        )

    def final(group: pa.Table) -> pa.Table:
        i = group.column("i").to_numpy(zero_copy_only=False)
        j = group.column("j").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        key = i * np.int64(n_src) + j
        order = np.argsort(key, kind="stable")
        k_s, n_s = key[order], n[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        tot = np.add.reduceat(n_s, starts)
        ii = (k_s[starts] // n_src).astype(np.int64)
        jj = (k_s[starts] % n_src).astype(np.int64)
        size = np.zeros(n_src, np.int64)
        diag = ii == jj
        size[ii[diag]] = tot[diag]
        off = ~diag
        io, jo, to = ii[off], jj[off], tot[off]
        keep = to > 0
        io, jo, to = io[keep], jo[keep], to[keep]
        union = size[io] + size[jo] - to
        return pa.table(
            {
                "source_a": pa.array([sources[k] for k in io], pa.string()),
                "source_b": pa.array([sources[k] for k in jo], pa.string()),
                "n_inter": pa.array(to, pa.int64()),
                "n_union": pa.array(union, pa.int64()),
                "jaccard": pa.array(
                    to.astype(np.float64) / union.astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    partials = docs.map_batches(
        mask_stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    pruned = partials.groupby("wb").map_groups(
        bucket_fold, batch_format="pyarrow"
    )
    return pruned.groupby("g").map_groups(final, batch_format="pyarrow")


SOURCE_JACCARD_SQL = """
WITH t AS (SELECT DISTINCT source,
                  unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
           FROM documents),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
i AS (SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS inter
      FROM t a JOIN t b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2)
SELECT i.sa AS source_a, i.sb AS source_b, i.inter AS n_inter,
       sa.n + sb.n - i.inter AS n_union,
       CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE)
         AS jaccard
FROM i JOIN s sa ON sa.source = i.sa JOIN s sb ON sb.source = i.sb
"""
