"""Multimodal feature pipeline over interleaved documents.

Drives the actor-pool media stages (:mod:`..stages.multimodal`) end to
end on the ``input_hint`` table shape: explode the nested ``spans``
list<struct> column to one row per media span (zero-copy: offsets +
parent indices, no Python row loop), attach a payload (STUB fetch — a
deterministic function of ``media_ref``; a real build wires the blob
store read here), then extract fixed-width features in an actor pool
(setup once per actor, work per batch).

Scale shape: explode and fetch are stateless ``map_batches``; the
extractor is a callable CLASS (actor pool) because a real decoder loads
models/codecs once per actor. Batches stay small (media payloads are
large in production) via ``batch_size``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import tune_context
from ..stages.multimodal import FrameSampler, MediaFeatureExtractor


def explode_spans(tbl: pa.Table) -> pa.Table:
    """docs(doc_id, spans) → one row per span, ALL kinds, with its in-doc
    rank: (doc_id, seq, offset, kind, text, media_ref). This is the full
    span-sequence invariant surface (north-rule: per-row span-sequence
    equality — kind, text, media_ref, order — vs the reference corpus);
    the driver hash-checks it against the DuckDB regeneration
    (``sources.synth.interleaved_spans_sql(kinds="all")``). List offsets
    drive doc_id repeat and rank — no Python iteration."""
    spans = tbl.column("spans").combine_chunks()
    vals = spans.values
    list_offs = spans.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(list_offs)
    parent = np.repeat(np.arange(tbl.num_rows), counts)
    seq = np.arange(len(parent)) - np.repeat(np.cumsum(counts) - counts, counts)
    doc_id = tbl.column("doc_id").take(pa.array(parent))
    return pa.table(
        {
            "doc_id": doc_id,
            "seq": pa.array(seq.astype(np.int32), type=pa.int32()),
            "offset": vals.field("offset"),
            "kind": vals.field("kind"),
            "text": vals.field("text"),
            "media_ref": vals.field("media_ref"),
        }
    )


def explode_media_spans(tbl: pa.Table) -> pa.Table:
    """docs(doc_id, spans) → one row per NON-text span:
    (doc_id, offset, kind, media_ref). List offsets drive the doc_id
    repeat; the kind filter is an Arrow kernel — no Python iteration."""
    import pyarrow.compute as pc

    spans = tbl.column("spans").combine_chunks()
    vals = spans.values
    list_offs = spans.offsets.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(tbl.num_rows), np.diff(list_offs))
    doc_id = tbl.column("doc_id").take(pa.array(parent))
    sel = pc.not_equal(vals.field("kind"), "text")
    return pa.table(
        {
            "doc_id": doc_id.filter(sel),
            "offset": vals.field("offset").filter(sel),
            "kind": vals.field("kind").filter(sel),
            "media_ref": vals.field("media_ref").filter(sel),
        }
    )


def fetch_payload_stub(tbl: pa.Table) -> pa.Table:
    """STUB blob fetch: payload bytes are a deterministic expansion of the
    media_ref URI (a real build replaces this one function with an object
    store / lakehouse read). The repeat count varies with the ref's LAST
    byte (``1 + byte % 12``) so payload LENGTHS vary — downstream frame
    counts and zero-padding are exercised — and the whole stub stays a
    pure SQL-expressible function of ``media_ref`` (DuckDB twin:
    ``substr(repeat(ref, 1 + ord(substr(ref, length(ref))) % 12), 1,
    256)``), which lets the driver hash-check both media pipelines."""
    import pyarrow.compute as pc

    from ..stages.multimodal import _binary_parts

    refs = tbl.column("media_ref")
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    offs, data = _binary_parts(refs)
    lens = np.diff(offs)
    # np.where evaluates both branches: guard the gather for a batch of
    # ALL-empty refs (data buffer has size 0 — indexing it would raise)
    gathered = (
        data[np.maximum(offs[1:] - 1, 0)]
        if data.size
        else np.zeros(lens.shape[0], dtype=np.uint8)
    )
    last = np.where(lens > 0, gathered, 0).astype(np.int64)
    reps = (1 + last % 12).astype(np.int32)
    rep = pc.binary_repeat(refs, pa.array(reps))
    clipped = pc.utf8_slice_codeunits(rep, 0, 256)
    return tbl.append_column("payload", pc.cast(clipped, pa.binary()))


def media_feature_pipeline(docs: Dataset, concurrency=(1, 8)) -> Dataset:
    """(doc_id, offset, kind, features[8]) for every media span."""
    tune_context()
    spans = docs.map_batches(
        explode_media_spans, batch_format="pyarrow", zero_copy_batch=True
    )
    with_payload = spans.map_batches(
        fetch_payload_stub, batch_format="pyarrow", zero_copy_batch=True
    )
    feats = with_payload.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
        num_cpus=1,
    )
    return feats.select_columns(["doc_id", "offset", "kind", "features"])


def video_frame_pipeline(docs: Dataset, every: int = 4, concurrency=(1, 8)) -> Dataset:
    """(doc_id, offset, n_frames) for every video span: explode → stub
    fetch → actor-pool frame sampling (every k-th 64-byte window; a real
    build swaps the stub for an ffmpeg keyframe reader)."""
    import pyarrow.compute as pc

    tune_context()
    spans = docs.map_batches(
        explode_media_spans, batch_format="pyarrow", zero_copy_batch=True
    )

    def only_video(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.equal(tbl.column("kind"), "video"))

    vids = spans.map_batches(only_video, batch_format="pyarrow", zero_copy_batch=True)
    with_payload = vids.map_batches(
        fetch_payload_stub, batch_format="pyarrow", zero_copy_batch=True
    )
    framed = with_payload.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(every=every),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
        num_cpus=1,
    )

    def summarize(tbl: pa.Table) -> pa.Table:
        fl = tbl.column("frames").combine_chunks()
        counts = pc.list_value_length(fl).to_numpy(zero_copy_only=False).astype(np.int64)
        # total sampled bytes per row: flat frame lengths, segment-summed
        # via prefix sums (checks the gather math, not just the counts)
        blens = (
            pc.binary_length(pc.list_flatten(fl))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        offs = np.zeros(len(fl) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        pref = np.zeros(blens.shape[0] + 1, dtype=np.int64)
        np.cumsum(blens, out=pref[1:])
        fbytes = pref[offs[1:]] - pref[offs[:-1]]
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "offset": tbl.column("offset"),
                "n_frames": pa.array(counts, type=pa.int64()),
                "frame_bytes": pa.array(fbytes, type=pa.int64()),
            }
        )

    return framed.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def doc_modality(docs: Dataset) -> Dataset:
    """Per-document modality profile over the interleaved spans —
    ``(doc_id, n_spans, n_text, n_image, n_audio, n_video,
    text_chars)`` — the curation signal a multimodal training mix is
    balanced on (text-only vs media-heavy docs, modality ratios,
    text-token budget per doc).

    Zero shuffle: every span of a doc lives inside its own row's
    ``spans`` list, so the profile is a pure ``map_batches`` of Arrow
    offset arithmetic — per-doc segment sums via prefix sums over the
    flat span children, no explode, no groupby, no Python row loop.
    """
    import pyarrow.compute as pc

    def profile(tbl: pa.Table) -> pa.Table:
        spans = tbl.column("spans").combine_chunks()
        vals = spans.flatten()  # slice-safe flat struct children
        offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        counts = np.diff(offs)

        def seg_sum(flat: np.ndarray) -> np.ndarray:
            pref = np.zeros(flat.shape[0] + 1, dtype=np.int64)
            np.cumsum(flat, out=pref[1:])
            return pref[offs[1:]] - pref[offs[:-1]]

        kind = vals.field("kind")
        cols: dict = {
            "doc_id": tbl.column("doc_id"),
            "n_spans": pa.array(counts, pa.int64()),
        }
        for k in ("text", "image", "audio", "video"):
            flags = (
                pc.equal(kind, k)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cols[f"n_{k}"] = pa.array(seg_sum(flags), pa.int64())
        tlen = (
            pc.utf8_length(vals.field("text"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cols["text_chars"] = pa.array(seg_sum(tlen), pa.int64())
        return pa.table(cols)

    return docs.map_batches(profile, batch_format="pyarrow", zero_copy_batch=True)


def span_windows(
    docs: Dataset, budget: int = 16, media_tokens: int = 8
) -> Dataset:
    """Context-window assignment over interleaved spans — the chunking
    step of a multimodal training pipeline: walk each doc's spans in
    order, cost text spans at their word count and media spans at a
    fixed ``media_tokens``, and assign each span to window
    ``cum_tokens_before // budget``. Output one row per (doc, window):
    ``(doc_id, window_id, n_spans, n_tokens, n_media)``.

    The non-resetting prefix-sum window rule (cumulative cost before
    the span, floor-divided by the budget) is deliberately
    SQL-expressible — the DuckDB twin is a window SUM + integer
    division — while staying the real packer shape (greedy windows
    that never split a span). Zero shuffle: spans live inside their
    doc's row, so windows are pure Arrow offset arithmetic — global
    prefix sums minus per-doc starts, reduceat over (doc, window)
    change points, no explode, no groupby, no Python row loop.
    """
    import pyarrow.compute as pc

    if budget < 1:
        raise ValueError(f"span_windows: budget must be >= 1, got {budget}")
    if media_tokens < 0:
        raise ValueError(
            f"span_windows: media_tokens must be >= 0, got {media_tokens}"
        )

    def windows(tbl: pa.Table) -> pa.Table:
        spans = tbl.column("spans").combine_chunks()
        vals = spans.flatten()
        offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        counts = np.diff(offs)
        kind = vals.field("kind")
        text = vals.field("text")
        is_text = (
            pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        )
        words = (
            pc.add(pc.count_substring(text, " "), 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cost = np.where(is_text, words, np.int64(media_tokens))
        # per-span cumulative cost BEFORE the span, within its doc
        cum = np.zeros(cost.shape[0] + 1, dtype=np.int64)
        np.cumsum(cost, out=cum[1:])
        doc_of = np.repeat(np.arange(counts.size), counts)
        before = cum[:-1] - cum[offs[:-1]][doc_of]
        win = before // budget
        # group rows: change points of (doc, window) over the flat spans
        key_doc = doc_of
        new = np.r_[
            True, (key_doc[1:] != key_doc[:-1]) | (win[1:] != win[:-1])
        ] if cost.size else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        n_spans = np.diff(np.r_[starts, cost.size])
        doc_idx = key_doc[starts] if cost.size else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").take(pa.array(doc_idx)),
                "window_id": pa.array(
                    win[starts] if cost.size else np.zeros(0, np.int64),
                    pa.int64(),
                ),
                "n_spans": pa.array(n_spans.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(
                    np.add.reduceat(cost, starts)
                    if cost.size
                    else np.zeros(0, np.int64),
                    pa.int64(),
                ),
                "n_media": pa.array(
                    np.add.reduceat((~is_text).astype(np.int64), starts)
                    if cost.size
                    else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return docs.map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)


def span_tiles(docs: Dataset, res: int) -> Dataset:
    """SPAN-level georeferencing + tile assignment — the north-rule
    clause "georeferencing each document's spans" at span granularity
    (the flagship pipeline georeferences per-DOC bboxes; this op drops
    to individual spans): every span of every interleaved doc gets a
    deterministic point from its span key ``sid = doc_num·16 + seq``
    (the same derive channels the synthesizer uses) and the quadkey
    tile of that point — ``(doc_id, seq, kind, px, py, cell)``.

    Zero shuffle: explode is offset arithmetic, the point derivation
    and tile math are the shared NumPy/SQL derive twins, so the full
    row set — span identity AND geometry AND tile — hash-checks
    against the DuckDB corpus regeneration.
    """
    import pyarrow.compute as pc

    from ..functions import derive
    from ..functions.cells import cell_of_points

    def assign(tbl: pa.Table) -> pa.Table:
        flat = explode_spans(tbl)
        doc_num = pc.cast(
            pc.utf8_slice_codeunits(flat.column("doc_id").combine_chunks(), 3),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        seq = flat.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        sid = doc_num * 16 + seq
        p = derive.derive_points(sid)
        cell = cell_of_points(p["px"], p["py"], res)
        return pa.table(
            {
                "doc_id": flat.column("doc_id"),
                "seq": flat.column("seq"),
                "kind": flat.column("kind"),
                "px": pa.array(p["px"], pa.float64()),
                "py": pa.array(p["py"], pa.float64()),
                "cell": pa.array(cell, pa.int64()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


_KINDS = ("text", "image", "audio", "video")


def span_transitions(docs: Dataset) -> Dataset:
    """Modality-transition matrix over the interleaved spans — how the
    corpus interleaves: counts of consecutive same-document
    ``(from_kind, to_kind)`` span pairs, the structure statistic a
    multimodal mix is tuned on (text→image rate, media run-length
    tendency). Output ≤16 rows ``(from_kind, to_kind, n)``.

    Zero text/media shuffle: spans live inside their doc's row, so the
    adjacency collapses per batch to a ≤16-int transition partial
    (kind codes + one bincount over masked pair keys — the doc
    boundary mask kills cross-doc adjacency); ONE tiny bucketed fold
    sums the partials. Exact integers throughout.
    """
    import pyarrow.compute as pc

    from .merge import bucketed_sum

    def partial(tbl: pa.Table) -> pa.Table:
        spans = tbl.column("spans").combine_chunks()
        vals = spans.flatten()
        offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        kind = vals.field("kind")
        code = np.zeros(len(kind), np.int64)
        for i, k in enumerate(_KINDS[1:], start=1):
            code[pc.equal(kind, k).to_numpy(zero_copy_only=False)] = i
        if code.size < 2:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        valid = np.ones(code.size - 1, bool)
        ends = offs[1:] - 1
        ends = ends[(ends >= 0) & (ends < code.size - 1)]
        valid[ends] = False
        key = (code[:-1] * 4 + code[1:])[valid]
        if key.size == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        n = np.bincount(key, minlength=16).astype(np.int64)
        occ = np.flatnonzero(n)
        return pa.table({"key": occ.astype(np.int64), "n": n[occ]})

    summed = bucketed_sum(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col="key",
        value_cols=("n",),
        n_buckets=4,
    )

    def decode(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_kind": pa.array([_KINDS[k // 4] for k in key], pa.string()),
                "to_kind": pa.array([_KINDS[k % 4] for k in key], pa.string()),
                "n": tbl.column("n"),
            }
        )

    return summed.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
