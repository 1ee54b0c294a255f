"""Text-analysis operators over the documents table.

All stateless ``map_batches`` stages using Arrow compute kernels — no
Python row loops, no shuffle (except where a groupby is the semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import COMBINE_BATCH

# tiny multilingual stopword lists for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "une"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "una"),
}
_EN_STOPWORDS = set(_LANG_MARKERS["en"]) | {"a", "an", "it", "on", "at", "by"}


def token_stats(docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_chars): whitespace tokenization + char count —
    expression-compatible with the DuckDB oracle (regexp split)."""

    def stats(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        toks = pc.list_value_length(pc.split_pattern_regex(text, r"\s+"))
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": pc.cast(toks, pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_alpha, n_punct, stop_ratio_pct, quality_pct):
    integer-valued quality signals (length, punctuation density, stopword
    ratio). Integer outputs keep the oracle hash-stable."""

    def score(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        toks = pc.cast(
            pc.list_value_length(pc.split_pattern_regex(text, r"\s+")), pa.int64()
        )
        n_alpha = pc.cast(pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64())
        nchars = pc.cast(pc.utf8_length(text), pa.int64())
        # stopword hits via one alternation regex with word boundaries
        stop_re = r"\b(" + "|".join(sorted(_EN_STOPWORDS)) + r")\b"
        n_stop = pc.cast(pc.count_substring_regex(text, stop_re), pa.int64())
        toks_np = toks.to_numpy(zero_copy_only=False)
        denom = np.maximum(toks_np, 1)
        stop_pct = (n_stop.to_numpy(zero_copy_only=False) * 100) // denom
        alpha_np = n_alpha.to_numpy(zero_copy_only=False)
        nchars_np = np.maximum(nchars.to_numpy(zero_copy_only=False), 1)
        quality_pct = (alpha_np * 100) // nchars_np
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": toks,
                "n_alpha": n_alpha,
                "n_punct": n_punct,
                "stop_ratio_pct": pa.array(stop_pct, type=pa.int64()),
                "quality_pct": pa.array(quality_pct, type=pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(docs: Dataset, carry_cols: tuple[str, ...] = ()) -> Dataset:
    """(doc_id, lang_pred[, carry_cols...]): marker-word language
    heuristic. Deterministic; tie-break = language order en→de→fr→es.
    ``carry_cols`` pass extra input columns through unchanged (e.g. a
    stored label for confusion analysis)."""

    def pred(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        scores = []
        for lang, words in _LANG_MARKERS.items():
            rex = r"\b(" + "|".join(words) + r")\b"
            scores.append(
                pc.count_substring_regex(text, rex).to_numpy(zero_copy_only=False)
            )
        mat = np.stack(scores, axis=1)
        best = np.argmax(mat, axis=1)  # first max wins = deterministic tiebreak
        langs = np.array(list(_LANG_MARKERS.keys()))
        cols = {
            "doc_id": tbl.column("doc_id"),
            "lang_pred": pa.array(langs[best], type=pa.string()),
        }
        for c in carry_cols:
            cols[c] = tbl.column(c)
        return pa.table(cols)

    return docs.map_batches(pred, batch_format="pyarrow", zero_copy_batch=True)


# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols
# — the classic GPT-2-style coarse split, shared verbatim with the SQL
# oracle (both sides are RE2, so the match semantics are identical).
PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_RE = r"[A-Za-z]+"
NUM_RE = r"[0-9]+"


def token_pieces(docs: Dataset) -> Dataset:
    """(doc_id, n_pieces, n_word_pieces, n_num_pieces): BPE-ish regex
    pre-tokenization counts — the subword-budget signal a training-data
    pipeline uses for packing/length filtering. Pure Arrow RE2 kernels."""

    def pieces(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_pieces": pc.cast(pc.count_substring_regex(text, PIECE_RE), pa.int64()),
                "n_word_pieces": pc.cast(pc.count_substring_regex(text, WORD_RE), pa.int64()),
                "n_num_pieces": pc.cast(pc.count_substring_regex(text, NUM_RE), pa.int64()),
            }
        )

    return docs.map_batches(pieces, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(docs: Dataset, text_col: str = "text") -> Dataset:
    """(doc_id, norm): canonical text form — lowercase, trimmed,
    whitespace runs collapsed to single spaces. Three Arrow/RE2 kernels,
    no shuffle; SQL twin: ``regexp_replace(lower(trim(text)), '\\s+',
    ' ', 'g')``. The usual first step before exact dedup so trivially
    different copies hash together."""

    def norm(tbl: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.utf8_trim_whitespace(tbl.column(text_col)))
        t = pc.replace_substring_regex(t, r"\s+", " ")
        return pa.table({"doc_id": tbl.column("doc_id"), "norm": t})

    return docs.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(docs: Dataset, window: int = 8) -> Dataset:
    """(doc_id, fp): rolling-hash document fingerprint — min of rolling
    ``window``-token hash sums over the token stream (winnowing-style,
    deterministic; docs shorter than the window use one full-span sum,
    empty docs get 0). Fully vectorized over the FLAT token array: prefix
    sums give every window sum, ``np.minimum.reduceat`` the per-doc min —
    no per-doc Python loop."""

    def fp(tbl: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern_regex(tbl.column("text"), r"\s+")
        flat = toks_list.combine_chunks()
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = len(offs) - 1
        # hash the flat token buffer directly (zero-copy into polars) —
        # no numpy-unicode materialization, no np.unique round trip
        hval = hash_str_array(flat.values)
        total = hval.shape[0]
        out = np.zeros(rows, dtype=np.int64)
        lens = np.diff(offs)
        if total:
            pref = np.zeros(total + 1, dtype=np.int64)
            np.cumsum(hval, out=pref[1:])
            row_of = np.repeat(np.arange(rows), lens)
            # full-window sums: starts whose (window-1)-th successor is in
            # the same doc; valid starts are contiguous per doc
            head = total - (window - 1)
            valid = np.zeros(total, dtype=bool)
            if head > 0:
                valid[:head] = row_of[:head] == row_of[window - 1 :]
            starts = np.nonzero(valid)[0]
            roll = pref[starts + window] - pref[starts]
            long_rows = np.nonzero(lens >= window)[0]
            if long_rows.size:
                # segment boundaries of each doc's valid-start run
                seg_bounds = np.searchsorted(starts, offs[long_rows])
                out[long_rows] = np.minimum.reduceat(roll, seg_bounds)
            short_rows = np.nonzero((lens > 0) & (lens < window))[0]
            if short_rows.size:
                out[short_rows] = (
                    pref[offs[short_rows + 1]] - pref[offs[short_rows]]
                )
        return pa.table(
            {"doc_id": tbl.column("doc_id"), "fp": pa.array(out, type=pa.int64())}
        )

    return docs.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def hash_str(s: str) -> int:
    """Deterministic 63-bit string hash (FNV-1a; process-independent,
    unlike Python's salted ``hash``)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0x7FFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def hash_str_array(values) -> "np.ndarray":
    """Vectorized deterministic string hashing (int64, non-negative).

    Accepts a pyarrow (Chunked)Array, numpy array, or Python sequence.
    Arrow input is the hot path: polars views the UTF-8 buffer zero-copy
    (``pl.from_arrow``) and hashes it in C — no Python-object or
    numpy-U-dtype round trip (hash values are identical across all input
    forms; pytest-asserted). Falls back to :func:`hash_str`. Both are
    process-independent, so groupings are identical at any parallelism.
    """
    import numpy as np

    try:
        import polars as pl

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            s = pl.from_arrow(values)  # zero-copy view of the UTF-8 buffer
        else:
            s = pl.Series(values=list(values), dtype=pl.Utf8)
        h = s.hash().to_numpy()
        return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    except Exception:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_pylist()
        return np.array([hash_str(v) for v in values], dtype=np.int64)


def extract_json_int(
    ds: Dataset, col: str = "props", field: str = "k", id_col: str = "event_id"
) -> Dataset:
    """(id, <field>): pull an integer field out of a JSON-string column
    with one vectorized RE2 kernel — the flat-JSON fast path a real
    pipeline uses instead of per-row json.loads (rows with the field
    absent drop, inner semantics). SQL twin: regexp_extract with the
    same pattern (modulo the named group Arrow requires)."""

    def ex(tbl: pa.Table) -> pa.Table:
        m = pc.extract_regex(tbl.column(col), '"' + field + '":\\s*(?P<v>-?\\d+)')
        ok = pc.is_valid(m)
        vals = pc.cast(pc.struct_field(m, "v"), pa.int64())
        out = pa.table({id_col: tbl.column(id_col), field: vals})
        return out.filter(ok)

    return ds.map_batches(ex, batch_format="pyarrow", zero_copy_batch=True)


def extract_json_int_sql(col: str = "props", field: str = "k", id_col: str = "event_id") -> str:
    return (
        f"SELECT {id_col}, CAST(regexp_extract({col}, '\"{field}\":\\s*(-?\\d+)', 1) AS BIGINT) AS {field} "
        f"FROM events WHERE regexp_matches({col}, '\"{field}\":\\s*(-?\\d+)')"
    )


def curate_corpus(docs: Dataset, min_quality: int = 82) -> Dataset:
    """End-to-end corpus curation in ONE fused map pass + ONE shuffle:
    normalize → quality gate (``quality_pct >= min_quality``, same
    integer expression as :func:`quality_score`) → language-ID → exact
    dedup on the NORMALIZED text (min doc_id wins). Output:
    ``(doc_id, lang_pred, n_tokens)`` — one row per surviving document.

    Scale shape: all per-document signals (normalize, quality, lang)
    compute in a single ``map_batches`` over the raw text (never three
    passes); the dedup shuffle ships only ``(hash, id, lang, n_tokens)``
    — the text itself never moves (same contract as
    :func:`..dedup.dedup_exact`), and each batch pre-combines to one
    candidate row per distinct normalized text."""
    n_buckets = 512

    def stage(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        norm = pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_trim_whitespace(text)), r"\s+", " "
        )
        toks = pc.cast(
            pc.list_value_length(pc.split_pattern_regex(text, r"\s+")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        n_alpha = pc.cast(
            pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        nchars = np.maximum(
            pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False),
            1,
        )
        quality_pct = (n_alpha * 100) // nchars
        keep = quality_pct >= min_quality
        sel = np.nonzero(keep)[0]
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if not sel.size:
            return pa.table(
                {
                    "text_hash": np.empty(0, np.int64),
                    "b": np.empty(0, np.int64),
                    "doc_id": np.empty(0, np.int64),
                    "lang_pred": pa.array([], pa.string()),
                    "n_tokens": np.empty(0, np.int64),
                }
            )
        kept = pa.array(sel)
        text_k = text.take(kept)
        scores = [
            pc.count_substring_regex(
                text_k, r"\b(" + "|".join(words) + r")\b"
            ).to_numpy(zero_copy_only=False)
            for words in _LANG_MARKERS.values()
        ]
        best = np.argmax(np.stack(scores, axis=1), axis=1)
        langs = np.array(list(_LANG_MARKERS.keys()))
        h = hash_str_array(norm.take(kept))
        lang_arr = langs[best]
        id_k, tok_k = ids[sel], toks[sel]
        # map-side combine: min-id row per distinct normalized text
        order = np.lexsort((id_k, h))
        h_s = h[order]
        first = np.ones(h_s.shape[0], dtype=bool)
        first[1:] = np.diff(h_s) != 0
        w = order[first]
        return pa.table(
            {
                "text_hash": h[w],
                "b": h[w] % np.int64(n_buckets),
                "doc_id": id_k[w],
                "lang_pred": pa.array(lang_arr[w], pa.string()),
                "n_tokens": tok_k[w],
            }
        )

    staged = docs.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )

    def min_per_hash(group: pa.Table) -> pa.Table:
        h = group.column("text_hash").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {
                    "doc_id": np.empty(0, np.int64),
                    "lang_pred": pa.array([], pa.string()),
                    "n_tokens": np.empty(0, np.int64),
                }
            )
        order = np.lexsort((ids, h))
        h_s = h[order]
        first = np.ones(h_s.shape[0], dtype=bool)
        first[1:] = np.diff(h_s) != 0
        w = pa.array(order[first])
        return pa.table(
            {
                "doc_id": group.column("doc_id").take(w),
                "lang_pred": group.column("lang_pred").take(w),
                "n_tokens": group.column("n_tokens").take(w),
            }
        )

    return staged.groupby("b").map_groups(min_per_hash, batch_format="pyarrow")


def vocab_topk(docs: Dataset, k: int = 100, n_buckets: int = 512) -> Dataset:
    """Global word-frequency top-k over a text corpus (the vocabulary-
    building op): lowercase → alpha-run tokenize → count → rank. Output
    ``(word, n, rank)``, ties broken ``(n DESC, word ASC)``.

    Scale shape: tokenization and the first count collapse INSIDE each
    batch (Arrow ``value_counts`` — one row per distinct word per
    batch), so the word-hash shuffle ships vocabulary-sized partials,
    never tokens. Each bucket sums counts via the int64 hash-group
    reduceat fast path (words only compared for the final tie-break),
    prunes to its local top-k, and a single tiny merge ranks the
    ≤ ``n_buckets x k`` survivors."""

    def topk_rows(words: np.ndarray, n: np.ndarray, kk: int):
        byw = np.argsort(words, kind="stable")
        order = byw[np.argsort(-n[byw], kind="stable")][:kk]
        return words[order], n[order]

    def count_stage(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.replace_substring_regex(pc.utf8_lower(text), "[^a-z]+", " "),
                " ",
            )
        )
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        if len(toks) == 0:
            return pa.table(
                {
                    "wb": np.empty(0, np.int64),
                    "h": np.empty(0, np.int64),
                    "word": pa.array([], pa.string()),
                    "n": np.empty(0, np.int64),
                }
            )
        vc = pc.value_counts(toks)
        words, n = vc.field("values"), vc.field("counts")
        h = hash_str_array(words)
        return pa.table(
            {
                "wb": h % np.int64(n_buckets),
                "h": h,
                "word": words,
                "n": pc.cast(n, pa.int64()),
            }
        )

    def bucket_topk(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {
                    "g": np.empty(0, np.int8),
                    "word": pa.array([], pa.string()),
                    "n": np.empty(0, np.int64),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]][: h_s.size])
        tot = np.add.reduceat(n[order], starts)
        words = (
            group.column("word").take(pa.array(order[starts])).to_numpy(zero_copy_only=False)
        )
        w_k, n_k = topk_rows(words, tot, k)
        return pa.table(
            {
                "g": np.zeros(w_k.shape[0], np.int8),
                "word": pa.array(w_k, pa.string()),
                "n": n_k,
            }
        )

    def final(group: pa.Table) -> pa.Table:
        words = group.column("word").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        w_k, n_k = topk_rows(words, n, k)
        return pa.table(
            {
                "word": pa.array(w_k, pa.string()),
                "n": n_k,
                "rank": np.arange(1, w_k.shape[0] + 1, dtype=np.int64),
            }
        )

    partials = docs.map_batches(
        count_stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    pruned = partials.groupby("wb").map_groups(bucket_topk, batch_format="pyarrow")
    return pruned.groupby("g").map_groups(final, batch_format="pyarrow")


def quality_filter_adaptive(docs: Dataset, q: float = 0.5) -> Dataset:
    """Adaptive quality gate: keep documents at or above their
    LANGUAGE's ``q``-th quantile of ``quality_pct`` (the data-dependent
    threshold variant of the fixed gate in :func:`curate_corpus`).
    Output ``(doc_id, lang, quality_pct)``.

    Scale shape: per-lang thresholds come from the exact histogram
    quantile op (:func:`..quantiles.int_quantiles` — shuffle bounded by
    value cardinality, 101 distinct scores), and the resulting
    lang→threshold map is metadata-sized (one row per language), so it
    collects to the driver and broadcasts into a stateless filter pass —
    the document text never shuffles."""
    from .quantiles import _q_label, int_quantiles

    def score(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        n_alpha = pc.cast(
            pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        nchars = np.maximum(
            pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False),
            1,
        )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "lang": tbl.column("lang"),
                "quality_pct": (n_alpha * 100) // nchars,
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    lbl = _q_label(q)
    thr = {
        r["lang"]: r[lbl]
        for r in int_quantiles(scored, "lang", "quality_pct", (q,)).take_all()
    }

    def keep(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        d = tbl.column("lang").combine_chunks().dictionary_encode()
        # tiny per-dictionary lookup (one entry per language in the batch)
        t = np.array(
            [thr.get(v, np.inf) for v in d.dictionary.to_pylist()], dtype=np.float64
        )
        th = t[d.indices.to_numpy(zero_copy_only=False)]
        qp = tbl.column("quality_pct").to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(qp >= th))

    return scored.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def doc_tfidf_top(docs: Dataset) -> Dataset:
    """Most-characteristic word per document by integer-quantized tf-idf:
    ``score = tf * n_docs // df`` (int64 — associative-free of float
    rounding, so SQL-oracle-checkable), ties broken by smallest word.
    Output ``(doc_id, word, score)``; zero-token documents are absent.

    Scale shape: document rows are atomic, so tf and the per-doc argmax
    are fully batch-local (ZERO shuffle); the only exchange is the df
    build — per-batch distinct-(doc,word) collapse → word-hash
    ``bucketed_sum`` — whose output is vocabulary-sized and broadcast
    once via ``ray.put`` as two sorted int64 arrays (searchsorted
    lookup, no Python dict in the hot path)."""
    import ray

    from .merge import bucketed_sum

    def tokens_per_doc(tbl: pa.Table):
        """(doc_row, code, count, dict) per-batch per-doc token counts."""
        toks = pc.split_pattern_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(tbl.column("text")), "[^a-z]+", " "
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
        if codes.size == 0:
            e = np.empty(0, np.int64)
            return e, e, e, d.dictionary
        order = np.lexsort((codes, doc_row))
        dr_s, c_s = doc_row[order], codes[order]
        starts = np.flatnonzero(
            np.r_[True, (dr_s[1:] != dr_s[:-1]) | (c_s[1:] != c_s[:-1])][: dr_s.size]
        )
        counts = np.diff(np.r_[starts, c_s.shape[0]])
        return dr_s[starts], c_s[starts], counts.astype(np.int64), d.dictionary

    def df_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"wh": np.empty(0, np.int64), "df": np.empty(0, np.int64)}
            )
        _, code, _, dic = tokens_per_doc(tbl)
        c, n = np.unique(code, return_counts=True)  # docs-per-word in batch
        return pa.table(
            {"wh": hash_str_array(dic)[c], "df": n.astype(np.int64)}
        )

    df_tbl = bucketed_sum(
        docs.map_batches(
            df_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="wh",
        value_cols=("df",),
    )
    parts = [
        t
        for t in ray.get(df_tbl.to_arrow_refs())
        if t.num_rows
    ]
    if parts:
        df_all = pa.concat_tables(parts)
        wh = df_all.column("wh").to_numpy(zero_copy_only=False)
        dfv = df_all.column("df").to_numpy(zero_copy_only=False)
        o = np.argsort(wh)
        df_ref = ray.put((wh[o], dfv[o]))
    else:
        df_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))
    n_docs = np.int64(docs.count())

    def top_word(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "word": pa.array([], pa.string()),
                "score": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        doc_row, code, tf, dic = tokens_per_doc(tbl)
        if doc_row.size == 0:
            return empty
        wh_sorted, df_sorted = ray.get(df_ref)
        pos = np.searchsorted(wh_sorted, hash_str_array(dic)[code])
        score = tf * n_docs // df_sorted[pos]
        # tie-break on the word STRING order, not hash/code order
        word_rank = np.empty(len(dic), dtype=np.int64)
        word_rank[np.argsort(dic.to_numpy(zero_copy_only=False))] = np.arange(
            len(dic)
        )
        order = np.lexsort((word_rank[code], -score, doc_row))
        first = np.r_[True, doc_row[order][1:] != doc_row[order][:-1]]
        w = order[first]
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_row[w]], pa.int64()),
                "word": dic.take(pa.array(code[w])),
                "score": pa.array(score[w], pa.int64()),
            }
        )

    return docs.map_batches(top_word, batch_format="pyarrow", zero_copy_batch=True)


# PII / markup scrubbing patterns — intentionally RE2-simple so Arrow's
# RE2 and DuckDB's RE2 match identically (same engine, same semantics)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
URL_RE = r"https?://[^ \t\n]+"


def pii_scrub(docs: Dataset) -> Dataset:
    """(doc_id, n_emails, n_urls, clean_chars): PII/link scrub report —
    the redaction pass a training-data pipeline runs before tokenizing.
    URLs are redacted first (emails can appear inside URL userinfo),
    then emails; ``clean_chars`` is the post-redaction length.

    Pure Arrow RE2 kernels (count + global replace), zero shuffle, text
    never leaves the batch. The SQL twin uses DuckDB's RE2 with the
    same patterns, so counts and replacement spans agree exactly."""

    def scrub(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        n_urls = pc.cast(pc.count_substring_regex(text, URL_RE), pa.int64())
        t = pc.replace_substring_regex(text, URL_RE, "<URL>")
        # emails counted AFTER URL redaction (an address inside a URL is
        # part of the URL, not a standalone email) — mirrors the oracle
        n_emails = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
        t = pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>")
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_emails": n_emails,
                "n_urls": n_urls,
                "clean_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


class CompressRatioScorer:
    """Actor-pool stage: per-doc zlib compressibility — the classic
    cheap quality / repetition signal (boilerplate and machine-generated
    spam compress far below prose; near-random noise barely compresses).
    Output per doc: ``(doc_id, n_bytes, z_bytes, compress_ratio)`` with
    ``compress_ratio = z_bytes / n_bytes`` (both int64; one double
    division per row).

    Shaped like a model-inference stage: a callable CLASS so the
    compressor configuration is built once per actor; the per-row body
    is a single C call (``zlib.compress``), not Python arithmetic —
    the deflate kernel dominates, exactly like a tokenizer or decoder
    would. Deterministic: fixed level ⇒ identical bytes on every run
    and at any parallelism. No SQL twin (deflate is not expressible);
    correctness is pytest-checked against direct zlib."""

    def __init__(self, level: int = 6):
        import zlib

        self._compress = zlib.compress
        self._level = int(level)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        comp, lvl = self._compress, self._level
        text = tbl.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_large_string(text.type):
            text = text.cast(pa.string())
        buf = text.buffers()
        off_np = np.frombuffer(buf[1], dtype=np.int32)
        offs = off_np[text.offset : text.offset + len(text) + 1]
        raw = buf[2].to_pybytes() if buf[2] is not None else b""
        n = (offs[1:] - offs[:-1]).astype(np.int64)
        z = np.fromiter(
            (
                len(comp(raw[offs[i] : offs[i + 1]], lvl))
                for i in range(len(text))
            ),
            dtype=np.int64,
            count=len(text),
        )
        ratio = np.where(n > 0, z / np.maximum(n, 1), np.float64(0.0))
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_bytes": pa.array(n, pa.int64()),
                "z_bytes": pa.array(z, pa.int64()),
                "compress_ratio": pa.array(ratio, pa.float64()),
            }
        )


def compress_ratio(docs: Dataset, level: int = 6, concurrency=(1, 8)) -> Dataset:
    """Per-doc zlib compressibility scores via an actor pool (state in
    ``__init__``, per-batch work in ``__call__``; see
    :class:`CompressRatioScorer`)."""
    return docs.map_batches(
        CompressRatioScorer,
        fn_constructor_kwargs=dict(level=level),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )


def bigram_lift(
    docs: Dataset,
    k: int = 100,
    min_count: int = 3,
    n_buckets: int = 512,
) -> Dataset:
    """Top-k adjacent-word collocations by LIFT — the association /
    first-BPE-merge statistic over the corpus: for bigram (w1, w2),
    ``lift = n_xy · T / (n_x · n_y)`` where n_xy is the bigram count,
    n_x / n_y the counts of w1 as any bigram's LEFT / w2 as any RIGHT,
    and T the total bigram count. Lift is a monotone transform of PMI
    (= log lift), so the ranking is the PMI ranking without either
    side touching libm log. Output ``(w1, w2, n_xy, n_x, n_y, lift,
    rank)`` with ``n_xy >= min_count`` and ties broken
    ``(lift DESC, w1, w2)``.

    Exactness: every count is an exact int and lift is ONE double
    division of exact int64 products (guarded against overflow), so
    values — and therefore the ordering and the selected top-k — are
    bitwise-equal to the SQL twin.

    Scale shape: tokenization and the first bigram count collapse
    INSIDE each batch (Arrow ``value_counts`` over joined pair
    strings), so the pair-hash shuffle ships distinct-pair partials,
    never tokens; ONE bucketed reduceat fold yields exact pair counts.
    The marginals (n_x, n_y, T) fold from that distinct-pair table —
    vocabulary-sized metadata, broadcast back via ``ray.put`` as
    sorted numpy arrays (a 10^7-word vocabulary is ~100 MB — beyond
    that swap the broadcast for a hash join on w1/w2). Top-k is
    map-side pruned per block (lexsort), then one tiny merge ranks
    the <= blocks·k survivors.
    """
    import ray

    SEP = "\x1f"

    def pair_partials(tbl: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(tbl.column("text")), "[^a-z]+", " "
            ),
            " ",
        )
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0)
        keep_np = keep.to_numpy(zero_copy_only=False)
        words = flat.filter(keep)
        m = len(words)
        empty = pa.table(
            {
                "pb": np.empty(0, np.int64),
                "h": np.empty(0, np.int64),
                "pair": pa.array([], pa.string()),
                "n": np.empty(0, np.int64),
            }
        )
        if m < 2:
            return empty
        # doc boundaries in the FILTERED token stream: cumulative
        # nonempty-token counts at each original list offset
        csum = np.r_[0, np.cumsum(keep_np)]
        new_off = csum[offsets - offsets[0]]
        valid = np.ones(m - 1, bool)
        ends = new_off[1:] - 1
        ends = ends[(ends >= 0) & (ends < m - 1)]
        valid[ends] = False
        if not valid.any():
            return empty
        vmask = pa.array(valid)
        pairs = pc.binary_join_element_wise(
            words.slice(0, m - 1).filter(vmask),
            words.slice(1).filter(vmask),
            SEP,
        )
        vc = pc.value_counts(pairs)
        p, n = vc.field("values"), vc.field("counts")
        h = hash_str_array(p)
        return pa.table(
            {
                "pb": h % np.int64(n_buckets),
                "h": h,
                "pair": p,
                "n": pc.cast(n, pa.int64()),
            }
        )

    def pair_fold(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_xy": np.empty(0, np.int64),
                }
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]][: h_s.size])
        tot = np.add.reduceat(n[order], starts)
        pairs = group.column("pair").take(pa.array(order[starts]))
        split = pc.split_pattern(pairs, SEP, max_splits=1)
        return pa.table(
            {
                "w1": pc.list_element(split, 0),
                "w2": pc.list_element(split, 1),
                "n_xy": tot.astype(np.int64),
            }
        )

    partials = docs.map_batches(
        pair_partials,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    # pinned: consumed twice (marginal fold + scoring pass); the table
    # is distinct-pair-sized, far below the corpus
    pair_counts = partials.groupby("pb").map_groups(
        pair_fold, batch_format="pyarrow"
    ).materialize()

    w1_parts, w2_parts, n_parts = [], [], []
    for ref in pair_counts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            w1_parts.append(t.column("w1").to_numpy(zero_copy_only=False))
            w2_parts.append(t.column("w2").to_numpy(zero_copy_only=False))
            n_parts.append(t.column("n_xy").to_numpy(zero_copy_only=False))
    if not w1_parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_xy": pa.array([], pa.int64()),
                    "n_x": pa.array([], pa.int64()),
                    "n_y": pa.array([], pa.int64()),
                    "lift": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    w1_all = np.concatenate(w1_parts)
    w2_all = np.concatenate(w2_parts)
    n_all = np.concatenate(n_parts)
    lw, linv = np.unique(w1_all, return_inverse=True)
    ln = np.bincount(linv, weights=n_all, minlength=lw.size).astype(np.int64)
    rw, rinv = np.unique(w2_all, return_inverse=True)
    rn = np.bincount(rinv, weights=n_all, minlength=rw.size).astype(np.int64)
    T = int(n_all.sum())
    INT64_MAX = (1 << 63) - 1
    if T and T * int(n_all.max()) > INT64_MAX:
        raise ValueError(
            "bigram_lift: n_xy * T overflows int64; corpus too large for "
            "the vectorized lift path (use object-int scoring)"
        )
    side = ray.put((lw, ln, rw, rn, T))

    def score_block(tbl: pa.Table) -> pa.Table:
        lw_, ln_, rw_, rn_, tt = ray.get(side)
        w1 = tbl.column("w1").to_numpy(zero_copy_only=False)
        w2 = tbl.column("w2").to_numpy(zero_copy_only=False)
        n = tbl.column("n_xy").to_numpy(zero_copy_only=False)
        keep = n >= min_count
        w1, w2, n = w1[keep], w2[keep], n[keep]
        nx = ln_[np.searchsorted(lw_, w1)] if w1.size else np.empty(0, np.int64)
        ny = rn_[np.searchsorted(rw_, w2)] if w2.size else np.empty(0, np.int64)
        num = (n * tt).astype(np.float64)
        den = (nx * ny).astype(np.float64)
        lift = num / den if n.size else np.empty(0, np.float64)
        order = np.lexsort((w2, w1, -lift))[:k]
        return pa.table(
            {
                "g": np.zeros(order.size, np.int8),
                "w1": pa.array(w1[order], pa.string()),
                "w2": pa.array(w2[order], pa.string()),
                "n_xy": pa.array(n[order], pa.int64()),
                "n_x": pa.array(nx[order], pa.int64()),
                "n_y": pa.array(ny[order], pa.int64()),
                "lift": pa.array(lift[order], pa.float64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        w1 = group.column("w1").to_numpy(zero_copy_only=False)
        w2 = group.column("w2").to_numpy(zero_copy_only=False)
        lift = group.column("lift").to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -lift))[:k]
        out = group.take(pa.array(order))
        return pa.table(
            {
                "w1": out.column("w1"),
                "w2": out.column("w2"),
                "n_xy": out.column("n_xy"),
                "n_x": out.column("n_x"),
                "n_y": out.column("n_y"),
                "lift": out.column("lift"),
                "rank": np.arange(1, order.size + 1, dtype=np.int64),
            }
        )

    scored = pair_counts.map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return scored.groupby("g").map_groups(final, batch_format="pyarrow")


def bigram_lift_sql(table: str = "documents", k: int = 100, min_count: int = 3) -> str:
    """DuckDB twin of :func:`bigram_lift` — LATERAL position unnest,
    exact counts, one CAST-to-DOUBLE division, identical tie order."""
    return f"""
WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS w FROM {table}),
u AS (SELECT w[i] AS w1, w[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s),
c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy FROM u GROUP BY w1, w2),
l AS (SELECT w1, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM c GROUP BY w1),
r AS (SELECT w2, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM c GROUP BY w2),
tt AS (SELECT CAST(SUM(n_xy) AS HUGEINT) AS t FROM c),
j AS (SELECT c.w1, c.w2, c.n_xy, l.n_x, r.n_y,
             CAST(CAST(c.n_xy AS HUGEINT) * tt.t AS DOUBLE)
             / CAST(CAST(l.n_x AS HUGEINT) * r.n_y AS DOUBLE) AS lift
      FROM c JOIN l USING (w1) JOIN r USING (w2), tt
      WHERE c.n_xy >= {min_count}),
rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, w1, w2) AS rank FROM j)
SELECT w1, w2, n_xy, n_x, n_y, lift, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {k}
"""


def char_trigrams(docs: Dataset, k: int = 100) -> Dataset:
    """Global character-trigram top-k over the word stream — the
    char-n-gram statistic language-ID models and BPE seeding are built
    on: trigrams WITHIN lowercase ``[a-z]+`` word runs (no cross-word
    or cross-space grams), ranked ``(n DESC, gram ASC)``. Output
    ``(gram, n, rank)``.

    Scale shape: trigrams never exist as strings in the hot path —
    each batch tokenizes with the shared Arrow kernels, then reads the
    word array's UTF-8 DATA BUFFER zero-copy and bincounts the packed
    26³ integer key (byte arithmetic, no per-row loop, no numpy-
    unicode materialization); partials are ≤17576-int tables, ONE tiny
    bucketed fold + one merge ranks them. Document text never
    shuffles.
    """
    from .merge import bucketed_sum

    B = 17576  # 26^3

    def partial(tbl: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(tbl.column("text")), "[^a-z]+", " "
            ),
            " ",
        )
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if len(flat) == 0:
            return empty
        off = np.frombuffer(flat.buffers()[1], np.int32)[
            flat.offset : flat.offset + len(flat) + 1
        ].astype(np.int64)
        data = np.frombuffer(flat.buffers()[2], np.uint8)
        lens = np.diff(off)
        per = np.maximum(lens - 2, 0)
        total = int(per.sum())
        if total == 0:
            return empty
        row = np.repeat(np.arange(per.size, dtype=np.int64), per)
        base = np.concatenate([[0], np.cumsum(per)[:-1]])
        s = off[row] + (np.arange(total, dtype=np.int64) - base[row])
        a = data[s].astype(np.int64) - 97
        b = data[s + 1].astype(np.int64) - 97
        c = data[s + 2].astype(np.int64) - 97
        n = np.bincount(a * 676 + b * 26 + c, minlength=B)
        occ = np.flatnonzero(n)
        return pa.table({"key": occ.astype(np.int64), "n": n[occ].astype(np.int64)})

    summed = bucketed_sum(
        docs.map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="key",
        value_cols=("n",),
        n_buckets=16,
    )

    def regroup(tbl: pa.Table) -> pa.Table:
        return tbl.append_column("g", pa.array(np.zeros(tbl.num_rows, np.int8)))

    def final(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -n))[:k]
        kk, nn = key[order], n[order]
        grams = [
            chr(97 + v // 676) + chr(97 + (v // 26) % 26) + chr(97 + v % 26)
            for v in kk
        ]  # <= k decoded strings, never the corpus
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "n": pa.array(nn, pa.int64()),
                "rank": np.arange(1, kk.size + 1, dtype=np.int64),
            }
        )

    return (
        summed.map_batches(regroup, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def char_trigrams_sql(table: str = "documents", k: int = 100) -> str:
    """DuckDB twin of :func:`char_trigrams` — word unnest, LATERAL
    position series, substr grams (char == byte on [a-z])."""
    return f"""
WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           FROM {table}),
t AS (SELECT substr(word, i, 3) AS gram
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(word) - 2)) AS i) s),
c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY gram),
r AS (SELECT gram, n, ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS rank FROM c)
SELECT gram, n, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {k}
"""


def lexical_diversity(docs: Dataset) -> Dataset:
    """Per-document lexical-diversity profile — the repetition /
    template-spam signal of a curation pipeline: ``(doc_id, n_tokens,
    n_distinct, simpson)`` over the lowercase alpha-run tokens, where
    ``simpson = 1 − Σ c(c−1) / (n(n−1))`` across the per-word counts c
    (the probability two tokens drawn without replacement differ).
    Docs with fewer than two tokens drop. Exact: token equality is
    Arrow ``dictionary_encode`` (real string compare, no hash
    collisions); numerator and denominator are exact ints; ONE double
    division — bitwise-equal to the SQL twin.

    Scale shape: zero shuffle — each doc's statistic is local to its
    row, so one ``map_batches`` pass computes everything via flatten +
    lexsort + reduceat (no per-doc Python, tokens never leave the
    task)."""

    def stats(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "simpson": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        text = tbl.column("text")
        toks_list = pc.split_pattern_regex(
            pc.replace_substring_regex(pc.utf8_lower(text), "[^a-z]+", " "), " "
        ).combine_chunks()
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), lens)
        flat = pc.list_flatten(toks_list)
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        parent = parent[keep]
        if parent.size == 0:
            return empty
        enc = flat.filter(pa.array(keep)).dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # per-(doc, word) counts
        order = np.lexsort((code, parent))
        p_s, c_s = parent[order], code[order]
        starts = np.flatnonzero(
            np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])][: p_s.size]
        )
        c = np.diff(np.r_[starts, p_s.size]).astype(np.int64)
        p_u = p_s[starts]
        # per-doc fold
        dstarts = np.flatnonzero(np.r_[True, p_u[1:] != p_u[:-1]][: p_u.size])
        n_tok = np.add.reduceat(c, dstarts)
        n_dis = np.diff(np.r_[dstarts, p_u.size]).astype(np.int64)
        num = np.add.reduceat(c * (c - 1), dstarts)
        rows = p_u[dstarts]
        keep2 = n_tok >= 2
        if not keep2.any():
            return empty
        n_tok, n_dis, num, rows = n_tok[keep2], n_dis[keep2], num[keep2], rows[keep2]
        simpson = 1.0 - num.astype(np.float64) / (
            n_tok * (n_tok - 1)
        ).astype(np.float64)
        doc_id = tbl.column("doc_id").to_numpy(zero_copy_only=False)[rows]
        return pa.table(
            {
                "doc_id": doc_id,
                "n_tokens": n_tok,
                "n_distinct": n_dis,
                "simpson": simpson,
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def lexical_diversity_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`lexical_diversity` — unnest + two GROUP
    BYs, identical single double division."""
    return f"""
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
             AS word FROM {table}),
c AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY doc_id, word),
t AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(n * (n - 1)) AS BIGINT) AS num
      FROM c GROUP BY doc_id)
SELECT doc_id, n_tokens, n_distinct,
       CAST(1 AS DOUBLE) - CAST(num AS DOUBLE)
         / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) AS simpson
FROM t WHERE n_tokens >= 2
"""


def word_counts(docs: Dataset, n_buckets: int = 512) -> Dataset:
    """Exact global word-frequency table ``(word, n)`` — the unpruned
    vocabulary beneath :func:`vocab_topk` (reusable for hapax / Zipf /
    coverage statistics).

    Scale shape: identical to the top-k path minus the prune —
    per-batch Arrow ``value_counts`` partials (vocabulary-sized, never
    token-sized), ONE word-hash bucket shuffle, per-bucket int64
    hash-group reduceat sum; words compare as strings only for the
    final gather."""

    def count_stage(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.replace_substring_regex(pc.utf8_lower(text), "[^a-z]+", " "),
                " ",
            )
        )
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        if len(toks) == 0:
            return pa.table(
                {
                    "wb": np.empty(0, np.int64),
                    "h": np.empty(0, np.int64),
                    "word": pa.array([], pa.string()),
                    "n": np.empty(0, np.int64),
                }
            )
        vc = pc.value_counts(toks)
        words, n = vc.field("values"), vc.field("counts")
        h = hash_str_array(words)
        return pa.table(
            {
                "wb": h % np.int64(n_buckets),
                "h": h,
                "word": words,
                "n": pc.cast(n, pa.int64()),
            }
        )

    def bucket_sum(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": np.empty(0, np.int64)}
            )
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]][: h_s.size])
        tot = np.add.reduceat(n[order], starts)
        words = group.column("word").take(pa.array(order[starts]))
        return pa.table({"word": words, "n": tot})

    partials = docs.map_batches(
        count_stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return partials.groupby("wb").map_groups(bucket_sum, batch_format="pyarrow")


def _del_neighborhood(w: str, d: int) -> set:
    """All strings reachable from ``w`` by deleting up to ``d`` chars
    (the SymSpell blocking neighborhood)."""
    out = {w}
    frontier = {w}
    for _ in range(d):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str) -> int:
    """Exact Levenshtein distance (words are short; per-candidate-pair
    calls are vocabulary-bounded, never token- or row-bounded)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def typo_pairs(docs: Dataset, max_dist: int = 2, n_buckets: int = 512) -> Dataset:
    """Fuzzy vocabulary join — every UNORDERED pair of corpus words
    within Levenshtein distance ``max_dist`` (the typo/variant-merging
    primitive of vocabulary curation): ``(word_a, word_b, dist)`` with
    ``word_a < word_b`` and ``1 <= dist <= max_dist``.

    Candidate generation is SymSpell deletion-neighborhood blocking:
    each word keys on every string reachable by deleting up to
    ``max_dist`` chars; any pair within distance ``max_dist`` shares at
    least one key, so no all-pairs sweep happens. Candidates are then
    verified with the EXACT distance (false candidates drop), and each
    pair emits only from its lexicographically-smallest shared key
    (owner dedup — exact output without a global distinct).

    Scale shape: words dedup map-side first (vocabulary-sized, never
    token-sized); deletion keys hash-shuffle vocabulary x O(len^d)
    rows; per-bucket verify touches only same-key candidates. The
    per-candidate loops are bounded by the vocabulary, not the corpus.
    """

    def norm_words(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.replace_substring_regex(pc.utf8_lower(text), "[^a-z]+", " "),
                " ",
            )
        )
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        return pa.table({"word": pc.unique(toks)})

    def word_bucket(tbl: pa.Table) -> pa.Table:
        h = hash_str_array(tbl.column("word").combine_chunks())
        return tbl.append_column("wb", pa.array(h % np.int64(n_buckets)))

    def word_dedup(group: pa.Table) -> pa.Table:
        w = np.unique(group.column("word").to_numpy(zero_copy_only=False))
        return pa.table({"word": pa.array(w, pa.string())})

    def keys_stage(tbl: pa.Table) -> pa.Table:
        words = tbl.column("word").to_numpy(zero_copy_only=False)
        out_k: list = []
        out_w: list = []
        for w in words:  # vocabulary-sized loop
            for k in _del_neighborhood(w, max_dist):
                out_k.append(k)
                out_w.append(w)
        h = hash_str_array(pa.array(out_k, pa.string()))
        return pa.table(
            {
                "kb": h % np.int64(n_buckets),
                "key": pa.array(out_k, pa.string()),
                "word": pa.array(out_w, pa.string()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "word_a": pa.array([], pa.string()),
                "word_b": pa.array([], pa.string()),
                "dist": pa.array([], pa.int64()),
            }
        )
        keys = group.column("key").to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return empty
        words = group.column("word").to_numpy(zero_copy_only=False)
        order = np.lexsort((words, keys))
        k_s, w_s = keys[order], words[order]
        keep = np.r_[True, (k_s[1:] != k_s[:-1]) | (w_s[1:] != w_s[:-1])][: k_s.size]
        k_s, w_s = k_s[keep], w_s[keep]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]][: k_s.size])
        sizes = np.diff(np.r_[starts, k_s.size])
        out = {}
        for s0, sz in zip(starts, sizes):
            if sz < 2:
                continue
            key = k_s[s0]
            blk = w_s[s0 : s0 + sz]
            for i in range(sz):
                for j in range(i + 1, sz):
                    x, y = blk[i], blk[j]
                    if (x, y) in out:
                        continue
                    # owner dedup: emit only from the smallest shared key
                    shared = _del_neighborhood(x, max_dist) & _del_neighborhood(
                        y, max_dist
                    )
                    if key != min(shared):
                        continue
                    d = _lev(x, y)
                    if 1 <= d <= max_dist:
                        out[(x, y)] = d
        if not out:
            return empty
        pairs = sorted(out)
        return pa.table(
            {
                "word_a": pa.array([p[0] for p in pairs], pa.string()),
                "word_b": pa.array([p[1] for p in pairs], pa.string()),
                "dist": pa.array([out[p] for p in pairs], pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(
            norm_words,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .map_batches(word_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("wb")
        .map_groups(word_dedup, batch_format="pyarrow")
    )
    keyed = vocab.map_batches(
        keys_stage, batch_format="pyarrow", zero_copy_batch=True
    )
    return keyed.groupby("kb").map_groups(verify, batch_format="pyarrow")


def typo_pairs_sql(table: str = "documents", max_dist: int = 2) -> str:
    """DuckDB twin of :func:`typo_pairs` — vocabulary self-join with
    ``levenshtein <= max_dist`` (the blocking is the engine's physical
    plan; the oracle states the logical result)."""
    return f"""
WITH w AS (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+'))
             AS word FROM {table})
SELECT a.word AS word_a, b.word AS word_b,
       CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
FROM w a JOIN w b ON a.word < b.word
WHERE levenshtein(a.word, b.word) BETWEEN 1 AND {max_dist}
"""


def heavy_hitters(
    docs: Dataset,
    k_inv: int = 500,
    capacity: int = 1024,
    n_buckets: int = 512,
) -> Dataset:
    """EXACT corpus heavy-hitter tokens — every word with
    ``count * k_inv > total_tokens`` — found with a two-pass
    Misra-Gries sketch so the full vocabulary never shuffles.

    Pass 1 (candidates): each batch counts its tokens exactly
    (``value_counts``) then prunes to a Misra-Gries summary of
    ``capacity`` entries by subtracting the (capacity+1)-th largest
    in-batch count c* from all counts and keeping the positives —
    (capacity+1)·c* ≤ n_batch, so the per-batch undercount is
    ≤ n_batch/(capacity+1) and the summed weight obeys
    weight(t) ≥ count(t) − total/(capacity+1). The weights fold in a
    word-hash bucket shuffle (vocabulary-sized partials, never
    tokens), each bucket prunes to its local top-``capacity``, and the
    global top-``capacity`` by weight is the candidate set. With
    capacity+1 > k_inv, a true heavy hitter has
    weight > total·(1/k_inv − 1/(capacity+1)) > 0, and at most
    k_inv·(capacity+1)/(capacity+1−k_inv) < capacity tokens can
    exceed that weight — so every true heavy hitter is inside the
    top-``capacity``. The sketch can only over-select; it never drops.

    Pass 2 (exact verify): the ≤ ``capacity`` candidate words
    broadcast once; each batch recounts ONLY candidates
    (``pc.index_in`` + ``bincount`` — exact string equality) plus its
    token total, one single-group int fold, and the final filter
    ``n * k_inv > total`` is exact BIGINT on both engine and oracle.
    Output ``(word, n, rank)``, rank by ``(n DESC, word ASC)``.
    """
    if capacity <= k_inv:
        raise ValueError("capacity must exceed k_inv for the MG guarantee")
    import ray

    def tokenize(text_col) -> pa.Array:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.replace_substring_regex(
                    pc.utf8_lower(text_col), "[^a-z]+", " "
                ),
                " ",
            )
        )
        return toks.filter(pc.greater(pc.utf8_length(toks), 0))

    def mg_stage(tbl: pa.Table) -> pa.Table:
        toks = tokenize(tbl.column("text"))
        if len(toks) == 0:
            return pa.table(
                {
                    "wb": np.empty(0, np.int64),
                    "h": np.empty(0, np.int64),
                    "word": pa.array([], pa.string()),
                    "weight": np.empty(0, np.int64),
                }
            )
        vc = pc.value_counts(toks)
        words = vc.field("values")
        n = pc.cast(vc.field("counts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if n.shape[0] > capacity:
            cstar = np.partition(n, n.shape[0] - capacity - 1)[
                n.shape[0] - capacity - 1
            ]
            w = n - cstar
            keep = np.nonzero(w > 0)[0]
            words = words.take(pa.array(keep))
            w = w[keep]
        else:
            w = n
        h = hash_str_array(words)
        return pa.table(
            {
                "wb": h % np.int64(n_buckets),
                "h": h,
                "word": words,
                "weight": w,
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {
                    "g": np.empty(0, np.int8),
                    "word": pa.array([], pa.string()),
                    "weight": np.empty(0, np.int64),
                }
            )
        w = group.column("weight").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]][: h_s.size])
        tot = np.add.reduceat(w[order], starts)
        words = group.column("word").take(
            pa.array(order[starts])
        ).to_numpy(zero_copy_only=False)
        byw = np.argsort(words, kind="stable")
        top = byw[np.argsort(-tot[byw], kind="stable")][:capacity]
        return pa.table(
            {
                "g": np.zeros(top.shape[0], np.int8),
                "word": pa.array(words[top], pa.string()),
                "weight": tot[top],
            }
        )

    def final_candidates(group: pa.Table) -> pa.Table:
        words = group.column("word").to_numpy(zero_copy_only=False)
        w = group.column("weight").to_numpy(zero_copy_only=False)
        byw = np.argsort(words, kind="stable")
        top = byw[np.argsort(-w[byw], kind="stable")][:capacity]
        return pa.table({"word": pa.array(np.sort(words[top]), pa.string())})

    partials = docs.map_batches(
        mg_stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    pruned = partials.groupby("wb").map_groups(
        bucket_fold, batch_format="pyarrow"
    )
    cand_rows = pruned.groupby("g").map_groups(
        final_candidates, batch_format="pyarrow"
    ).take_all()
    cand = pa.array([r["word"] for r in cand_rows], pa.string())
    ref_cand = ray.put(cand)

    def recount(tbl: pa.Table) -> pa.Table:
        cands = ray.get(ref_cand)
        toks = tokenize(tbl.column("text"))
        total = len(toks)
        idx = pc.index_in(toks, value_set=cands)
        hit = idx.drop_null().to_numpy(zero_copy_only=False)
        counts = np.bincount(hit, minlength=len(cands)).astype(np.int64)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "g": np.zeros(nz.shape[0] + 1, np.int8),
                "idx": np.r_[nz.astype(np.int64), -1],
                "n": np.r_[counts[nz], np.int64(total)],
            }
        )

    def final_exact(group: pa.Table) -> pa.Table:
        cands = ray.get(ref_cand)
        idx = group.column("idx").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        total = int(n[idx == -1].sum())
        m = idx >= 0
        counts = np.bincount(
            idx[m], weights=n[m], minlength=len(cands)
        ).astype(np.int64)
        heavy = np.nonzero(counts * np.int64(k_inv) > total)[0]
        words = cands.take(pa.array(heavy)).to_numpy(zero_copy_only=False)
        cnt = counts[heavy]
        byw = np.argsort(words, kind="stable")
        order = byw[np.argsort(-cnt[byw], kind="stable")]
        return pa.table(
            {
                "word": pa.array(words[order], pa.string()),
                "n": cnt[order],
                "rank": np.arange(1, order.shape[0] + 1, dtype=np.int64),
            }
        )

    counted = docs.map_batches(
        recount,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )
    return counted.groupby("g").map_groups(
        final_exact, batch_format="pyarrow"
    )


def heavy_hitters_sql(k_inv: int = 500) -> str:
    """DuckDB twin of :func:`heavy_hitters` — the sketch only finds
    candidates; the FINAL filter is the same exact BIGINT rule."""
    return f"""
WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           FROM documents),
     tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
     c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
           FROM t GROUP BY word)
SELECT c.word, c.n,
       CAST(ROW_NUMBER() OVER (ORDER BY c.n DESC, c.word) AS BIGINT) AS rank
FROM c, tot WHERE c.n * {k_inv} > tot.n
ORDER BY c.n DESC, c.word
"""
