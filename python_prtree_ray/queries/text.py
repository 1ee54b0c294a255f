"""text query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    dedup,
    text,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    _SOURCE_JACCARD_SQL,
    _bigram_lift_sql,
    _char_trigrams_sql,
    _dup_ngram_coverage_sql,
    _gram_novelty_sql,
    _heavy_hitters_sql,
    _lexical_diversity_sql,
    _typo_pairs_sql,
    corpus_curation_sql,
    dedup_exact_sql,
    doc_cap_per_lang_sql,
    doc_chunks_sql,
    doc_lm_freq_sql,
    doc_sample_sql,
    doc_sample_stratified_sql,
    doc_sample_weighted_sql,
    dup_clusters_sql,
    lang_id_sql,
    ngram_jaccard_sql,
    pii_scrub_sql,
    quality_sql,
    source_dedup_stats_sql,
    token_pieces_sql,
    token_stats_sql,
)



def q_dedup_exact(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return dedup.dedup_exact(docs)



def q_token_stats(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return text.token_stats(docs)



def q_pii_scrub(sf):
    # email/URL redaction report: pure Arrow RE2 count + global
    # replace, zero shuffle (both sides RE2, semantics identical).
    # The synthetic corpus carries no PII, so even doc_ids get a
    # deterministic contact footer (same expression as the oracle)
    # to exercise both patterns and the replacement-length math.
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )

    def enrich(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id")
        ids_s = pc.cast(ids, pa.string())
        footer = pc.binary_join_element_wise(
            tbl.column("text"),
            " reach user",
            ids_s,
            "@mail.example or https://docs.example/",
            ids_s,
            "",
        )
        even = pc.equal(pc.bit_wise_and(ids, 1), 0)
        return pa.table(
            {
                "doc_id": ids,
                "text": pc.if_else(even, footer, tbl.column("text")),
            }
        )

    return text.pii_scrub(
        docs.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    )



def q_doc_lm_freq(sf):
    # unigram corpus-frequency LM proxy: ONE vocab-sized hash fold +
    # broadcast, then a map-only searchsorted scoring pass
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return curation.doc_lm_freq(docs)



def q_doc_compress(sf):
    # per-doc zlib compressibility quality signal: actor-pool stage
    # (compressor built once per actor, per-row body is one C call).
    # Deflate has no ANSI-SQL twin -> rows-only; exactness vs direct
    # zlib and parallelism invariance are pytest-checked
    import ray
    from python_prtree_ray.pipelines.text import compress_ratio

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return compress_ratio(docs)



def q_doc_chunks(sf):
    # context-window chunk layout (128-token windows, stride 96):
    # map-only vectorized explode, chunk metadata only — no text ships
    import ray
    from python_prtree_ray.pipelines.packing import doc_chunks

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return doc_chunks(docs)



def q_quality(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return text.quality_score(docs)



def q_lang_id(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return text.lang_id(docs)



def q_simhash(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return dedup.simhash_64(docs)



def q_simhash_pairs(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    # exact for max_hamming <= bands-1; hash-seeded values → rows-only
    return dedup.simhash_pairs(docs, max_hamming=3)



def q_token_pieces(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return text.token_pieces(docs)



def q_minhash_pairs(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return dedup.minhash_pairs(docs, jaccard_threshold=0.4)



def q_ngram_jaccard(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)



def q_doc_fingerprint(sf):
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    # rolling-hash winnowing fingerprint — hash-seeded, no ANSI-SQL
    # twin (rows-only); determinism across parallelism is pytest-checked
    return text.fingerprint(docs)



def q_pack_documents(sf):
    import ray
    from python_prtree_ray.pipelines.packing import pack_documents

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    # assignment is algorithm-defined (greedy fill) → rows-only;
    # invariants (budget respected, all docs assigned, deterministic
    # across partitioning) are pytest-checked
    return pack_documents(docs, budget=512)



def q_doc_sample(sf):
    import ray
    from python_prtree_ray.pipelines.sample import hash_sample

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return hash_sample(docs, "doc_id", rate_pct=5)



def q_doc_sample_stratified(sf):
    import ray
    from python_prtree_ray.pipelines.sample import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 10, "de": 40, "fr": 25}
    )



def q_doc_sample_weighted(sf):
    # length-proportional deterministic sampling (hash-gated,
    # parallelism-invariant): keep chance = min(n_chars // 5, 100)%
    import ray
    from python_prtree_ray.pipelines.sample import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return weighted_sample(docs, "doc_id", "n_chars", divisor=5)



def q_source_dedup_stats(sf):
    # per-source dedup report (n_docs, n_unique) — text never
    # shuffles; two bounded reduces over (source, hash) partials
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["text", "source"]
    )
    return dedup.source_dedup_stats(docs)



def q_doc_cap_per_lang(sf):
    import ray
    from python_prtree_ray.pipelines.sample import sample_per_key

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    )
    return sample_per_key(docs, key_col="lang", id_col="doc_id", n=50)



def q_dup_clusters(sf):
    # near-dup pair mining → connected components → canonical doc per
    # cluster (min id): the cluster-dedup step of a training pipeline
    import ray
    from python_prtree_ray.pipelines.graph import connected_components

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    return connected_components(pairs, id_a="doc_a", id_b="doc_b")



def q_dedup_survivors(sf):
    # end of the dedup pipeline: docs surviving cluster dedup (anti
    # join against non-canonical near-dup cluster members)
    import ray
    from python_prtree_ray.pipelines.graph import dedup_survivors

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    keep = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    )
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    return dedup_survivors(
        keep, pairs, carry_cols=("lang",), id_a="doc_a", id_b="doc_b"
    )



def q_lang_confusion(sf):
    # label-quality confusion matrix: stored lang × predicted lang
    # counts — the heuristic's evaluation grid; C²-bounded fold
    import pyarrow as pa
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pred = text.lang_id(docs, carry_cols=("lang",))

    def partial(tbl: pa.Table) -> pa.Table:
        a = tbl.column("lang").to_numpy(zero_copy_only=False)
        b = tbl.column("lang_pred").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][: a_s.size]
        )
        return pa.table(
            {
                "k": np.zeros(starts.size, np.int64),
                "lang": pa.array(a_s[starts], pa.string()),
                "lang_pred": pa.array(b_s[starts], pa.string()),
                "n": np.diff(np.r_[starts, a_s.size]).astype(np.int64),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        a = group.column("lang").to_numpy(zero_copy_only=False)
        if a.size == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "lang_pred": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        b = group.column("lang_pred").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s, n_s = a[order], b[order], n[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])][: a_s.size]
        )
        return pa.table(
            {
                "lang": pa.array(a_s[starts], pa.string()),
                "lang_pred": pa.array(b_s[starts], pa.string()),
                "n": np.add.reduceat(n_s, starts),
            }
        )

    return (
        pred.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .map_groups(final, batch_format="pyarrow")
        .select_columns(["lang", "lang_pred", "n"])
    )



def q_doc_len_rank(sf):
    # GROUPED percent-rank enrichment: each doc's exact length
    # percentile WITHIN its language — per-(lang, n_tokens) histogram
    # (bounded grid) broadcast once, searchsorted per batch
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from python_prtree_ray.pipelines.merge import bucketed_sum

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def lens(tbl: pa.Table) -> pa.Table:
        toks = pc.cast(
            pc.list_value_length(
                pc.split_pattern_regex(tbl.column("text"), r"\s+")
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "lang": tbl.column("lang"),
                "n_tokens": toks,
            }
        )

    sized = docs.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)

    def hist_partial(tbl: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(tbl.column("lang")).combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, code))
        c_s, n_s = code[order], n[order]
        starts = np.flatnonzero(
            np.r_[True, (c_s[1:] != c_s[:-1]) | (n_s[1:] != n_s[:-1])][: c_s.size]
        )
        return pa.table(
            {
                "lang": enc.dictionary.take(pa.array(c_s[starts])),
                "n_tokens": n_s[starts],
                "cnt": np.diff(np.r_[starts, c_s.size]).astype(np.int64),
            }
        )

    # (lang, length) grid is bounded: langs x distinct lengths
    hist: dict = {}
    parts = sized.map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for lg, nt, c in zip(
            t.column("lang").to_pylist(),
            t.column("n_tokens").to_pylist(),
            t.column("cnt").to_pylist(),
        ):
            hist[(lg, nt)] = hist.get((lg, nt), 0) + c
    per_lang = {}
    for (lg, nt), c in sorted(hist.items()):
        per_lang.setdefault(lg, [[], []])
        per_lang[lg][0].append(nt)
        per_lang[lg][1].append(c)
    cdf = {}
    for lg, (vals, cnts) in per_lang.items():
        v = np.array(vals, np.int64)
        c = np.array(cnts, np.int64)
        smaller = np.r_[np.int64(0), np.cumsum(c)[:-1]]
        cdf[lg] = (v, smaller, int(c.sum()))
    ref_c = ray.put(cdf)

    def rank(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        table = ray.get(ref_c)
        out_pct = np.zeros(tbl.num_rows, np.float64)
        langs = tbl.column("lang").to_numpy(zero_copy_only=False)
        n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        for lg in np.unique(langs):
            v, sm, tot = table[str(lg)]
            m = langs == lg
            pos = np.searchsorted(v, n[m])
            out_pct[m] = (
                sm[pos].astype(np.float64) / np.float64(tot - 1)
                if tot > 1
                else 0.0
            )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "lang": tbl.column("lang"),
                "n_tokens": tbl.column("n_tokens"),
                "pct": out_pct,
            }
        )

    return sized.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)



def q_vocab_hapax(sf):
    # hapax-legomena ratio of the corpus vocabulary (OOV-rate
    # estimator): exact word counts, ONE division, single row
    import pyarrow as pa
    import ray
    from python_prtree_ray.pipelines.text import vocab_topk

    # reuse the vocabulary-count machinery's partial path: count
    # every word exactly, then fold hapax/total in one tiny pass
    from python_prtree_ray.pipelines.text import word_counts

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["text"]
    )
    counts = word_counts(docs)

    def partial(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": np.zeros(1, np.int64),
                "n_vocab": np.array([n.size], np.int64),
                "n_hapax": np.array([(n == 1).sum()], np.int64),
            }
        )

    from python_prtree_ray.pipelines.merge import bucketed_sum

    summed = bucketed_sum(
        counts.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="k",
        value_cols=("n_vocab", "n_hapax"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        nv = tbl.column("n_vocab").to_numpy(zero_copy_only=False)
        nh = tbl.column("n_hapax").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_vocab": nv,
                "n_hapax": nh,
                "hapax_ratio": nh.astype(np.float64) / nv.astype(np.float64),
            }
        )

    return summed.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )



def q_lexical_diversity(sf):
    # per-doc type-token + Simpson repetition profile: zero shuffle,
    # exact dictionary-encoded token equality
    import ray
    from python_prtree_ray.pipelines.text import lexical_diversity

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return lexical_diversity(docs)



def q_typo_pairs(sf):
    # fuzzy vocabulary join: every word pair at edit distance
    # exactly 1 via deletion-neighborhood blocking + exact verify
    import ray
    from python_prtree_ray.pipelines.text import typo_pairs

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["text"]
    )
    return typo_pairs(docs)



def q_corpus_curation(sf):
    # flagship curation composite: fused normalize+quality+lang map
    # pass → exact dedup on normalized text; text never shuffles
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return text.curate_corpus(docs, min_quality=82)



def q_vocab_topk(sf):
    # vocabulary building: global word-frequency top-100 — per-batch
    # Arrow value_counts collapse, word-hash bucket sum, tiny merge
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    return text.vocab_topk(docs, k=100)



def q_heavy_hitters(sf):
    # exact heavy-hitter tokens (share > 1/500) via two-pass
    # Misra-Gries: capacity-bounded sketch finds a candidate
    # superset (vocabulary never shuffles), an exact recount of
    # only the <= capacity candidates verifies — the classic
    # sketch-then-verify shape for 100-TB streams
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    return text.heavy_hitters(docs, k_inv=500)



def q_bigram_lift(sf):
    # top collocations by lift (the PMI ranking without libm log):
    # per-batch Arrow value_counts over joined pair strings, ONE
    # pair-hash fold, vocabulary-sized marginal broadcast, map-side
    # top-k prune + tiny merge
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    return text.bigram_lift(docs, k=100, min_count=3)



def q_char_trigrams(sf):
    # char-trigram top-100 within [a-z]+ word runs: zero-copy
    # UTF-8 buffer byte arithmetic + 26^3 bincount per batch, one
    # tiny fold; grams decoded only for the final k rows
    import ray

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    return text.char_trigrams(docs, k=100)



def q_quality_adaptive(sf):
    # adaptive quality gate: per-LANG median threshold (exact R-7
    # histogram quantile, metadata-sized broadcast) → stateless filter
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return text.quality_filter_adaptive(docs, q=0.5)



def q_doc_tfidf_top(sf):
    # most-characteristic word per doc by integer tf-idf: batch-local
    # tf + argmax, ONE vocab-sized df shuffle broadcast via ray.put
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return text.doc_tfidf_top(docs)



def q_text_normalize(sf):
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return text.normalize_text(docs)



def q_doc_repetition(sf):
    # Gopher-style repetition stats: per-doc bigram totals/distinct/
    # max — all batch-local (doc rows are atomic), ZERO shuffle
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return curation.doc_repetition(docs)



def q_source_jaccard(sf):
    # corpus-mixing diagnostic: pairwise vocabulary Jaccard between
    # sources — distinct (word, source-bitmask) partials, ONE
    # word-hash shuffle, per-bucket integer matmul into a sources x
    # sources fold; tokens never shuffle
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["source", "text"]
    )
    return curation.source_jaccard(docs)



def q_decontaminate(sf):
    # benchmark decontamination: corpus docs sharing any word 4-gram
    # with the doc_id%97==0 "benchmark" subset; gram set broadcast
    # once via ray.put, corpus pass zero-shuffle
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return curation.decontaminate(docs, n=4, bench_modulus=97)



def q_dup_ngram_coverage(sf):
    # exact-substring-dedup coverage: per-doc count of 3-gram
    # positions duplicated in >=1 other doc; gram-bucket fold, text
    # never shuffles
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return curation.dup_ngram_coverage(docs, n=3)



def q_search_topk(sf):
    # integer tf-idf retrieval: global top-20 docs for a fixed term
    # set; tiny df aggregate + threshold-pruned global_topk merge
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return curation.search_topk(docs, terms=("spark", "join", "window"), k=20)



def q_search_bm25(sf):
    # BM25 retrieval (k1=1.5, b=0.75, rational idf — every op is
    # ordered IEEE arithmetic, so the SQL twin matches the float64
    # scores bitwise); same fused-partials + pruned-top-k shape
    import ray
    from python_prtree_ray.pipelines import curation

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return curation.search_bm25(docs, terms=("spark", "join", "window"), k=20)



def q_gram_novelty(sf):
    # corpus-ordered novelty: share of each doc's distinct bigrams
    # first seen (min doc_id) in that doc — incremental-dump
    # curation diagnostic; text never shuffles
    import ray
    from python_prtree_ray.pipelines.curation import gram_novelty

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    return gram_novelty(docs, n=2)



def q_cluster_size_hist(sf):
    # dup-cluster size distribution: CC labels → per-cluster size →
    # histogram of sizes (two pre-combined levels)
    import pyarrow as pa
    from python_prtree_ray.pipelines.merge import bucketed_sum

    clusters = q_dup_clusters(sf)

    def per_cluster(tbl: pa.Table) -> pa.Table:
        c, n = np.unique(
            tbl.column("cluster_id").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"cluster_id": c, "size": n.astype(np.int64)})

    sizes = bucketed_sum(
        clusters.map_batches(
            per_cluster, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_col="cluster_id",
        value_cols=("size",),
    )

    def hist(tbl: pa.Table) -> pa.Table:
        s, n = np.unique(
            tbl.column("size").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({"size": s, "n_clusters": n.astype(np.int64)})

    return bucketed_sum(
        sizes.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
        key_col="size",
        value_cols=("n_clusters",),
    )



def q_source_lang_entropy(sf):
    # per-source Shannon entropy of the language mix: ONE
    # (source, lang) count fold (20 x 5 = metadata-sized), entropy
    # assembled driver-side as an explicit left-to-right chain of
    # -(p)*ln(p) terms in sorted-lang order with libm math.log —
    # the exact expression tree the SQL twin spells out, so the
    # doubles match bitwise (numpy's vectorized log differs from
    # DuckDB's LN by 1 ulp on ~27% of inputs; libm does not)
    import math

    import pyarrow as pa
    import ray

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["source", "lang"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        ds_ = tbl.column("source").combine_chunks().dictionary_encode()
        dl = tbl.column("lang").combine_chunks().dictionary_encode()
        sc = ds_.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lc = dl.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        scat = ds_.dictionary.to_pylist()
        lcat = dl.dictionary.to_pylist()
        key = sc * 4096 + lc
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=uk.size).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(
                    [scat[int(k) // 4096] for k in uk], pa.string()
                ),
                "lang": pa.array(
                    [lcat[int(k) % 4096] for k in uk], pa.string()
                ),
                "n": n,
            }
        )

    rows = docs.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=65536,
    ).take_all()
    agg: dict[str, dict[str, int]] = {}
    for r in rows:
        agg.setdefault(r["source"], {})
        agg[r["source"]][r["lang"]] = (
            agg[r["source"]].get(r["lang"], 0) + int(r["n"])
        )
    sources = sorted(agg)
    n_docs, ent = [], []
    for s in sources:
        tot = sum(agg[s].values())
        e = 0.0
        for lang in sorted(agg[s]):  # sorted-lang chain = SQL order
            n = agg[s][lang]
            if n:
                p = float(n) / float(tot)
                e = e + (0.0 - (p * math.log(p)))
        n_docs.append(tot)
        ent.append(e)
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(sources, pa.string()),
                "n_docs": pa.array(n_docs, pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "pii_scrub": q_pii_scrub,
    "doc_lm_freq": q_doc_lm_freq,
    "doc_compress": q_doc_compress,
    "doc_chunks": q_doc_chunks,
    "quality_score": q_quality,
    "lang_id": q_lang_id,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "token_pieces": q_token_pieces,
    "minhash_pairs": q_minhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "doc_fingerprint": q_doc_fingerprint,
    "pack_documents": q_pack_documents,
    "doc_sample": q_doc_sample,
    "doc_sample_stratified": q_doc_sample_stratified,
    "doc_sample_weighted": q_doc_sample_weighted,
    "source_dedup_stats": q_source_dedup_stats,
    "doc_cap_per_lang": q_doc_cap_per_lang,
    "dup_clusters": q_dup_clusters,
    "dedup_survivors": q_dedup_survivors,
    "lang_confusion": q_lang_confusion,
    "doc_len_rank": q_doc_len_rank,
    "vocab_hapax": q_vocab_hapax,
    "lexical_diversity": q_lexical_diversity,
    "typo_pairs": q_typo_pairs,
    "corpus_curation": q_corpus_curation,
    "vocab_topk": q_vocab_topk,
    "heavy_hitters": q_heavy_hitters,
    "bigram_lift": q_bigram_lift,
    "char_trigrams": q_char_trigrams,
    "quality_adaptive": q_quality_adaptive,
    "doc_tfidf_top": q_doc_tfidf_top,
    "text_normalize": q_text_normalize,
    "doc_repetition": q_doc_repetition,
    "source_jaccard": q_source_jaccard,
    "decontaminate": q_decontaminate,
    "dup_ngram_coverage": q_dup_ngram_coverage,
    "search_topk": q_search_topk,
    "search_bm25": q_search_bm25,
    "gram_novelty": q_gram_novelty,
    "cluster_size_hist": q_cluster_size_hist,
    "source_lang_entropy": q_source_lang_entropy,
}

SQL = {
    "dedup_exact": dedup_exact_sql,
    "token_stats": token_stats_sql,
    "token_pieces": token_pieces_sql,
    "pii_scrub": pii_scrub_sql,
    "doc_lm_freq": doc_lm_freq_sql,
    "doc_chunks": doc_chunks_sql,
    "quality_score": quality_sql,
    "lang_id": lang_id_sql,
    "ngram_jaccard": ngram_jaccard_sql,
    "doc_sample": doc_sample_sql,
    "doc_sample_stratified": doc_sample_stratified_sql,
    "doc_sample_weighted": doc_sample_weighted_sql,
    "source_dedup_stats": source_dedup_stats_sql,
    "doc_cap_per_lang": doc_cap_per_lang_sql,
    "dup_clusters": dup_clusters_sql,
    "cluster_size_hist": (
        "SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM ("
        "SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size FROM ("
        + dup_clusters_sql
        + ") GROUP BY cluster_id) GROUP BY size"
    ),
    "dedup_survivors": f"""
WITH cc AS ({dup_clusters_sql})
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN
  (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
""",
    "vocab_hapax": (
        "WITH w AS (SELECT unnest(regexp_extract_all(lower(text),"
        " '[a-z]+')) AS word FROM documents),"
        " c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY word) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab, "
        "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, "
        "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE) AS hapax_ratio FROM c"
    ),
    "lexical_diversity": _lexical_diversity_sql("documents"),
    "typo_pairs": _typo_pairs_sql("documents"),
    "doc_len_rank": (
        "WITH s AS (SELECT doc_id, lang, CAST(array_length("
        "regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens "
        "FROM documents) "
        "SELECT doc_id, lang, n_tokens, "
        "PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_tokens) AS pct"
        " FROM s"
    ),
    "lang_confusion": (
        "WITH p AS ("
        + lang_id_sql
        + ") SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM p JOIN documents d ON d.doc_id = p.doc_id "
        "GROUP BY d.lang, p.lang_pred"
    ),
    "corpus_curation": corpus_curation_sql,
    "doc_tfidf_top": (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        " '[a-z]+')) AS word FROM documents),"
        " tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf"
        " FROM w GROUP BY doc_id, word),"
        " df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df"
        " FROM w GROUP BY word),"
        " nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),"
        " s AS (SELECT tf.doc_id, tf.word, tf.tf * nd.n // df.df AS score"
        " FROM tf, df, nd WHERE tf.word = df.word),"
        " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id"
        " ORDER BY score DESC, word) AS rn FROM s)"
        " SELECT doc_id, word, score FROM r WHERE rn = 1"
    ),
    "quality_adaptive": (
        "WITH s AS (SELECT doc_id, lang,"
        " (CAST(array_length(regexp_extract_all(text, '[a-zA-Z]')) AS"
        " BIGINT) * 100) // GREATEST(CAST(length(text) AS BIGINT), 1)"
        " AS quality_pct FROM documents),"
        " t AS (SELECT lang, quantile_cont(quality_pct, 0.5) AS thr"
        " FROM s GROUP BY lang)"
        " SELECT s.doc_id, s.lang, s.quality_pct FROM s JOIN t"
        " ON s.lang = t.lang WHERE s.quality_pct >= t.thr"
    ),
    "heavy_hitters": _heavy_hitters_sql(500),
    "vocab_topk": (
        "WITH w AS (SELECT unnest(regexp_extract_all(lower(text),"
        " '[a-z]+')) AS word FROM documents),"
        " c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word),"
        " r AS (SELECT word, n, ROW_NUMBER() OVER (ORDER BY n DESC, word)"
        " AS rank FROM c)"
        " SELECT word, n, rank FROM r WHERE rank <= 100"
    ),
    "bigram_lift": _bigram_lift_sql("documents", 100, 3),
    "char_trigrams": _char_trigrams_sql("documents", 100),
    "text_normalize": (
        "SELECT doc_id, "
        r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm "
        "FROM documents"
    ),
    "doc_repetition": (
        "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),"
        " '[a-z]+') AS l FROM documents),"
        " w AS (SELECT doc_id, l[i] AS w, i AS pos FROM t,"
        " LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),"
        " bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bigram"
        " FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),"
        " cnt AS (SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c"
        " FROM bg GROUP BY doc_id, bigram)"
        " SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,"
        " CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,"
        " CAST(MAX(c) AS BIGINT) AS top_bigram_count"
        " FROM cnt GROUP BY doc_id"
    ),
    "source_jaccard": _SOURCE_JACCARD_SQL,
    "decontaminate": (
        "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),"
        " '[a-z]+') AS l FROM documents),"
        " w AS (SELECT doc_id, l[i] AS w, i AS pos FROM t,"
        " LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),"
        " g AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w || ' '"
        " || d.w AS gram"
        " FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"
        " JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2"
        " JOIN w d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3),"
        " bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),"
        " probe AS (SELECT DISTINCT doc_id, gram FROM g"
        " WHERE doc_id % 97 <> 0)"
        " SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits"
        " FROM probe p JOIN bench USING (gram) GROUP BY p.doc_id"
    ),
    "dup_ngram_coverage": _dup_ngram_coverage_sql(3),
    "search_topk": (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        " '[a-z]+')) AS word FROM documents),"
        " nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),"
        " df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df"
        " FROM w WHERE word IN ('spark', 'join', 'window') GROUP BY word),"
        " tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf"
        " FROM w WHERE word IN ('spark', 'join', 'window')"
        " GROUP BY doc_id, word),"
        " s AS (SELECT tf.doc_id, CAST(SUM(tf.tf * (nd.n // df.df))"
        " AS BIGINT) AS score FROM tf JOIN df USING (word), nd"
        " GROUP BY tf.doc_id),"
        " r AS (SELECT doc_id, score, ROW_NUMBER() OVER"
        " (ORDER BY score DESC, doc_id) AS rank FROM s WHERE score > 0)"
        " SELECT doc_id, score, rank FROM r WHERE rank <= 20"
    ),
    # BM25 twin: literal-for-literal the engine expression
    # (curation.search_bm25) — rational idf ((N-df)+0.5)/(df+0.5),
    # denom 1.5*(0.25+0.75*(dl/avgdl)), per-term left-assoc sum —
    # so float64 scores match bitwise
    "search_bm25": (
        "WITH t AS (SELECT doc_id,"
        " regexp_extract_all(lower(text), '[a-z]+') AS toks"
        " FROM documents),"
        " d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,"
        " CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf0,"
        " CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf1,"
        " CAST(len(list_filter(toks, x -> x = 'window')) AS BIGINT) AS tf2"
        " FROM t),"
        " g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,"
        " CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,"
        " CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,"
        " CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,"
        " CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2"
        " FROM d),"
        " s AS (SELECT d.doc_id,"
        " (((g.n - g.df0) + 0.5) / (g.df0 + 0.5))"
        "   * ((CAST(tf0 AS DOUBLE) * 2.5) / (CAST(tf0 AS DOUBLE)"
        "      + (1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / g.avgdl)))))"
        " + (((g.n - g.df1) + 0.5) / (g.df1 + 0.5))"
        "   * ((CAST(tf1 AS DOUBLE) * 2.5) / (CAST(tf1 AS DOUBLE)"
        "      + (1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / g.avgdl)))))"
        " + (((g.n - g.df2) + 0.5) / (g.df2 + 0.5))"
        "   * ((CAST(tf2 AS DOUBLE) * 2.5) / (CAST(tf2 AS DOUBLE)"
        "      + (1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / g.avgdl)))))"
        " AS score FROM d, g),"
        " r AS (SELECT doc_id, score, ROW_NUMBER() OVER"
        " (ORDER BY score DESC, doc_id) AS rank FROM s WHERE score > 0)"
        " SELECT doc_id, score, rank FROM r WHERE rank <= 20"
    ),
    # the lang set is the generator's closed alphabet; the entropy
    # chain is spelled term-by-term in sorted-lang order so the
    # double addition order is pinned (bitwise vs the engine's
    # driver-side libm chain)
    "source_lang_entropy": (
        "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS tot, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN lang = '{L}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_{L}"
            for L in ("de", "en", "es", "fr", "zh")
        )
        + " FROM documents GROUP BY source), "
        "t AS (SELECT source, tot, "
        + ", ".join(
            f"CASE WHEN n_{L} = 0 THEN 0.0 ELSE 0.0 - "
            f"((CAST(n_{L} AS DOUBLE) / CAST(tot AS DOUBLE)) * "
            f"LN(CAST(n_{L} AS DOUBLE) / CAST(tot AS DOUBLE))) END "
            f"AS t_{L}"
            for L in ("de", "en", "es", "fr", "zh")
        )
        + " FROM c) "
        "SELECT source, tot AS n_docs, "
        "((((t_de + t_en) + t_es) + t_fr) + t_zh) AS entropy FROM t"
    ),
    "gram_novelty": _gram_novelty_sql(2),
}
