"""Sequence packing — group documents into fixed token-budget bins.

The training-data step that turns a deduped corpus into dense training
sequences: each bin holds documents whose token counts sum to at most
``budget`` (a document longer than the budget gets a bin of its own and
is flagged oversize).

Distributed shape: documents hash into ``n_buckets`` coarse buckets (one
``map_groups`` call per bucket); within a bucket the greedy fill walks
docs in doc-id order, so the assignment depends only on bucket
membership — bit-identical at any parallelism or block layout. Bin ids
are globally unique: ``bucket * 2^40 + local_bin``. Token counts are
computed batch-side with the same whitespace rule as ``token_stats``;
only (doc_id, n_tokens) rows shuffle — never text.

Packing quality note: greedy-in-id-order wastes at most one document's
worth of slack per bin versus first-fit-decreasing, in exchange for a
deterministic, partitioning-invariant assignment a resumable pipeline
can reproduce. The per-bucket walk is a Python loop bounded by the
bucket's doc count (thousands) — the aggregation granularity, not a
per-row hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import tune_context
from ..functions.buckets import bucket_of
from ..config import COMBINE_BATCH

N_BUCKETS_DEFAULT = 64
BIN_SHIFT = np.int64(1 << 40)


def pack_documents(
    docs: Dataset,
    budget: int = 512,
    n_buckets: int = N_BUCKETS_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(doc_id, n_tokens, bin_id, bin_offset, oversize): token-budget
    packing assignment. ``bin_offset`` is the document's token start
    position inside its bin (concatenation order = doc-id order)."""
    tune_context()

    def counts(tbl: pa.Table) -> pa.Table:
        toks = pc.cast(
            pc.list_value_length(pc.split_pattern_regex(tbl.column(text_col), r"\s+")),
            pa.int64(),
        )
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: ids,
                "n_tokens": toks,
                "b": bucket_of(ids, n_buckets),
            }
        )

    counted = docs.map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=COMBINE_BATCH
    )

    def pack_bucket(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        nt = group.column("n_tokens").to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table(
                {
                    id_col: np.empty(0, np.int64),
                    "n_tokens": np.empty(0, np.int64),
                    "bin_id": np.empty(0, np.int64),
                    "bin_offset": np.empty(0, np.int64),
                    "oversize": pa.array([], pa.bool_()),
                }
            )
        bucket = int(group.column("b")[0].as_py())
        order = np.argsort(ids, kind="stable")
        ids_s, nt_s = ids[order], nt[order]
        bin_id = np.empty(ids_s.shape[0], dtype=np.int64)
        bin_off = np.empty(ids_s.shape[0], dtype=np.int64)
        oversize = np.zeros(ids_s.shape[0], dtype=bool)
        cur_bin, cur_fill = 0, 0
        for j in range(ids_s.shape[0]):  # greedy fill, O(bucket docs)
            t = int(nt_s[j])
            if t > budget:
                # oversize doc → its own bin (flagged)
                if cur_fill > 0:
                    cur_bin += 1
                bin_id[j], bin_off[j], oversize[j] = cur_bin, 0, True
                cur_bin += 1
                cur_fill = 0
                continue
            if cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            bin_id[j], bin_off[j] = cur_bin, cur_fill
            cur_fill += t
        return pa.table(
            {
                id_col: ids_s,
                "n_tokens": nt_s,
                "bin_id": np.int64(bucket) * BIN_SHIFT + bin_id,
                "bin_offset": bin_off,
                "oversize": pa.array(oversize),
            }
        )

    return counted.groupby("b").map_groups(pack_bucket, batch_format="pyarrow")


def doc_chunks(
    docs: Dataset, chunk: int = 128, stride: int = 96
) -> Dataset:
    """(doc_id, chunk_id, start_tok, n_tok): fixed-window training-chunk
    layout with overlap — the "split long documents into model-context
    windows" step. Chunks start at 0, stride, 2*stride, ... while the
    start is inside the doc; the last chunk is truncated to the doc end.
    Docs with zero tokens produce no chunks.

    ZERO shuffle, map-only: token counts are batch-local (the repo-wide
    whitespace tokenizer, same as token_stats) and the chunk explosion
    is a vectorized repeat/arange — no per-doc Python. Output rows are
    chunk METADATA (ids + offsets), so downstream materialization can
    slice text lazily; the explode never ships text.
    """
    if chunk <= 0 or stride <= 0:
        raise ValueError(f"chunk and stride must be positive, got {chunk}, {stride}")

    def explode(tbl: pa.Table) -> pa.Table:
        text = tbl.column("text")
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern_regex(text, r"\s+")),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        keep = n_tok > 0
        ids, n_tok = ids[keep], n_tok[keep]
        if ids.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "start_tok": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                }
            )
        n_chunks = (n_tok - 1) // stride + 1
        doc_rep = np.repeat(np.arange(ids.size, dtype=np.int64), n_chunks)
        # chunk_id within each doc: global arange minus each doc's offset
        offs = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        cid = np.arange(doc_rep.size, dtype=np.int64) - offs[doc_rep]
        start = cid * stride
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_rep]),
                "chunk_id": pa.array(cid),
                "start_tok": pa.array(start),
                "n_tok": pa.array(
                    np.minimum(chunk, n_tok[doc_rep] - start)
                ),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
