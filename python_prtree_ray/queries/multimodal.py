"""multimodal query family (split from ``__ray_entry__``, round 5).

Each ``q_<name>`` takes an sf directory and returns a lazy
``ray.data.Dataset`` (or small table); ``SQL`` holds the DuckDB
oracle twins keyed identically to ``QUERIES``."""

from __future__ import annotations

import numpy as np  # noqa: F401

from python_prtree_ray.functions import derive  # noqa: F401
from python_prtree_ray.queries._common import (  # noqa: F401
    RES,
    SPAN_BUDGET,
    SPAN_MEDIA_TOK,
    TILE_RES,
    derive,
    sj,
    tables,
)
from python_prtree_ray.queries._sqlparts import (  # noqa: F401
    b_orders,
    interleaved_spans_sql,
    media_features_sql,
    video_frames_sql,
)



def q_media_features(sf):
    # interleaved-docs media spans → actor-pool feature extraction
    # (decode stubbed — no media libs in env; plumbing is real).
    # Features are float32 window-means/255; the driver-checked shape
    # un-normalizes them back to the INTEGER window sums (lossless:
    # rint(f * 8 * 255) — float32 error << 0.5), so the DuckDB twin
    # compares float64-exactly.
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import media_feature_pipeline

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    feats = media_feature_pipeline(interleaved_docs(n))

    def unnorm(tbl: pa.Table) -> pa.Table:
        fl = tbl.column("features").combine_chunks()
        mat = (
            _pc.list_flatten(fl)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(fl), 8)
        )
        sums = np.rint(mat * (8.0 * 255.0)).astype(np.int64)
        cols = {
            "doc_id": tbl.column("doc_id"),
            "offset": tbl.column("offset"),
            "kind": tbl.column("kind"),
        }
        for k in range(8):
            cols[f"f{k}"] = pa.array(sums[:, k])
        return pa.table(cols)

    return feats.map_batches(unnorm, batch_format="pyarrow", zero_copy_batch=True)



def q_video_frames(sf):
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import video_frame_pipeline

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    # every=2 so frame counts VARY with the stub payload length
    # (1-2 frames) — the SQL twin reproduces count and byte totals
    return video_frame_pipeline(interleaved_docs(n), every=2)



def q_span_sequence(sf):
    # the north-rule per-row invariant, driver-checked end to end:
    # every span of every interleaved doc as (doc_id, seq, offset,
    # kind, text, media_ref) — hash-compared against the DuckDB
    # regeneration (synth.interleaved_spans_sql(kinds="all")), so
    # kind/text/media_ref/order equality is a hash-green gate, not
    # just a pytest assertion.
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import explode_spans

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    return interleaved_docs(n).map_batches(
        explode_spans, batch_format="pyarrow", zero_copy_batch=True
    )



def q_doc_modality(sf):
    # per-doc modality profile of the interleaved spans (span
    # counts per kind + text chars): zero-shuffle Arrow offset
    # arithmetic, hash-checked against the DuckDB span regeneration
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import doc_modality

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    return doc_modality(interleaved_docs(n))



def q_span_transitions(sf):
    # modality-transition matrix of the interleaved corpus: per-
    # batch <=16-int partials via masked bincount over span-kind
    # codes, one tiny fold; exact ints
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import span_transitions

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    return span_transitions(interleaved_docs(n))



def q_span_windows(sf):
    # multimodal context-window packing: cumulative-cost window
    # assignment over ordered spans (text = word count, media =
    # fixed cost); zero-shuffle Arrow offset arithmetic
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import span_windows

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    return span_windows(
        interleaved_docs(n), budget=SPAN_BUDGET, media_tokens=SPAN_MEDIA_TOK
    )



def q_span_tiles(sf):
    # span-LEVEL georeferencing (north-rule: "georeferencing each
    # document's spans"): deterministic point + quadkey tile per
    # span, full row set hash-checked vs the SQL corpus twin
    import pyarrow.parquet as pq
    from python_prtree_ray.sources.synth import interleaved_docs
    from python_prtree_ray.pipelines.multimodal import span_tiles

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    return span_tiles(interleaved_docs(n), res=TILE_RES)



def q_span_box_join(sf):
    # the north-star composite as an ORACLE-CHECKED query: the
    # interleaved-span corpus georeferenced at SPAN granularity and
    # box-intersection-joined against the orders box set — the
    # flagship bench pipeline's join stage, value-hash checked
    # (query_id = sid = doc_num*16 + seq identifies the span)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from python_prtree_ray.pipelines.multimodal import span_tiles
    from python_prtree_ray.sources.synth import interleaved_docs

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    spans = span_tiles(interleaved_docs(n), res=TILE_RES)

    def to_points(tbl: pa.Table) -> pa.Table:
        doc_num = pc.cast(
            pc.utf8_slice_codeunits(
                tbl.column("doc_id").combine_chunks(), 3
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        seq = (
            tbl.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "query_id": doc_num * 16 + seq,
                "px": tbl.column("px"),
                "py": tbl.column("py"),
            }
        )

    pts = spans.map_batches(
        to_points, batch_format="pyarrow", zero_copy_batch=True
    )
    return sj.point_query(tables.boxes_dataset(sf), pts, res=RES)


def q_span_dedup(sf):
    # SPAN-level exact dedup across the interleaved corpus: per doc,
    # how many of its text spans also occur (byte-identical) anywhere
    # else in the corpus — the interleaved-payload crossover of
    # dedup_exact (doc granularity is too coarse when docs share
    # boilerplate spans). Text never shuffles: spans hash in-batch,
    # ONE hash-bucket shuffle of (hash, doc_num) int64 rows computes
    # corpus-wide occurrence counts and collapses to per-doc partials,
    # ONE doc-bucket fold sums them. doc_id strings are reconstructed
    # from doc_num only at the metadata-sized output.
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq
    from python_prtree_ray.functions.buckets import bucket_of
    from python_prtree_ray.pipelines.merge import bucketed_sum
    from python_prtree_ray.pipelines.multimodal import explode_spans
    from python_prtree_ray.pipelines.text import hash_str_array
    from python_prtree_ray.sources.synth import interleaved_docs

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    docs = interleaved_docs(n)

    def spans_partial(tbl: pa.Table) -> pa.Table:
        flat = explode_spans(tbl)
        flat = flat.filter(_pc.equal(flat.column("kind"), "text"))
        h = hash_str_array(flat.column("text"))
        doc_num = _pc.cast(
            _pc.utf8_slice_codeunits(flat.column("doc_id").combine_chunks(), 3),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {"hb": bucket_of(h, 256), "h": h, "doc": doc_num}
        )

    def hash_fold(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        if h.size == 0:
            return pa.table(
                {
                    "doc": pa.array([], pa.int64()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_dup_spans": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(h, kind="stable")
        h_s, doc_s = h[order], doc[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]][: h_s.size])
        total = np.diff(np.r_[starts, h_s.size])
        dup = (np.repeat(total, total) > 1).astype(np.int64)
        # collapse to per-doc partials inside the bucket
        d_order = np.argsort(doc_s, kind="stable")
        d_s = doc_s[d_order]
        dup_d = dup[d_order]
        d_starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]][: d_s.size])
        return pa.table(
            {
                "doc": pa.array(d_s[d_starts], pa.int64()),
                "n_spans": pa.array(
                    np.diff(np.r_[d_starts, d_s.size]), pa.int64()
                ),
                "n_dup_spans": pa.array(
                    np.add.reduceat(dup_d, d_starts), pa.int64()
                ),
            }
        )

    folded = bucketed_sum(
        docs.map_batches(
            spans_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hb")
        .map_groups(hash_fold, batch_format="pyarrow"),
        key_col="doc",
        value_cols=("n_spans", "n_dup_spans"),
    )

    def to_doc_id(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": _pc.binary_join_element_wise(
                    "doc",
                    _pc.utf8_lpad(
                        _pc.cast(tbl.column("doc"), pa.string()), 12, "0"
                    ),
                    "",
                ),
                "n_spans": tbl.column("n_spans"),
                "n_dup_spans": tbl.column("n_dup_spans"),
            }
        )

    return folded.map_batches(
        to_doc_id, batch_format="pyarrow", zero_copy_batch=True
    )


def q_span_runs(sf):
    # sequence structure of the interleaved payload: per (doc, kind),
    # the LONGEST run of consecutive same-kind spans — the "media
    # burst / text block" profile a context-packing policy keys on.
    # Zero shuffle: explode keeps each doc's spans contiguous and
    # in order inside its batch, so runs fold per batch with
    # boundary masks + reduceat; rows are (doc_id, kind, max_run).
    import pyarrow as pa
    import pyarrow.parquet as pq
    from python_prtree_ray.pipelines.multimodal import explode_spans
    from python_prtree_ray.sources.synth import interleaved_docs

    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    docs = interleaved_docs(n)

    def runs(tbl: pa.Table) -> pa.Table:
        flat = explode_spans(tbl)
        if flat.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "kind": pa.array([], pa.string()),
                    "max_run": pa.array([], pa.int64()),
                }
            )
        doc = flat.column("doc_id").combine_chunks()
        kind = flat.column("kind").combine_chunks()
        dcode = (
            doc.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        kcode = (
            kind.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = dcode.size
        # run boundaries: doc change OR kind change (spans are in seq
        # order per doc within the batch)
        start = np.r_[True, (dcode[1:] != dcode[:-1]) | (kcode[1:] != kcode[:-1])][:m]
        sidx = np.flatnonzero(start)
        rlen = np.diff(np.r_[sidx, m])
        rdoc, rkind = dcode[sidx], kcode[sidx]
        # max run per (doc, kind): lexsort + segment max
        order = np.lexsort((rkind, rdoc))
        d_s, k_s, l_s = rdoc[order], rkind[order], rlen[order]
        gstart = np.flatnonzero(
            np.r_[True, (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])][: d_s.size]
        )
        mx = np.maximum.reduceat(l_s, gstart)
        # map the winning run back to a SPAN row for the string gathers
        sel = pa.array(sidx[order[gstart]])
        return pa.table(
            {
                "doc_id": doc.take(sel),
                "kind": kind.take(sel),
                "max_run": pa.array(mx, pa.int64()),
            }
        )

    return docs.map_batches(runs, batch_format="pyarrow", zero_copy_batch=True)


QUERIES = {
    "span_runs": q_span_runs,
    "span_dedup": q_span_dedup,
    "media_features": q_media_features,
    "video_frames": q_video_frames,
    "span_sequence": q_span_sequence,
    "doc_modality": q_doc_modality,
    "span_transitions": q_span_transitions,
    "span_windows": q_span_windows,
    "span_tiles": q_span_tiles,
    "span_box_join": q_span_box_join,
}

SQL = {
    "span_runs": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all")}),
g AS (SELECT doc_id, kind, seq,
             seq - ROW_NUMBER() OVER (PARTITION BY doc_id, kind
                                      ORDER BY seq) AS isl
      FROM sp),
r AS (SELECT doc_id, kind, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM g GROUP BY doc_id, kind, isl)
SELECT doc_id, kind, CAST(MAX(run_len) AS BIGINT) AS max_run
FROM r GROUP BY doc_id, kind
""",
    "span_dedup": f"""
WITH t AS (SELECT doc_id, text FROM ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="text")})),
c AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY text)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
FROM t JOIN c USING (text) GROUP BY t.doc_id
""",
    "media_features": media_features_sql,
    "video_frames": video_frames_sql,
    # full span-sequence invariant (kind, text, media_ref, order)
    "span_sequence": "SELECT * FROM ("
    + interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )
    + ")",
    # span-level georeference + tile: sid = doc_num*16 + seq, the
    # same derive channels and clamped-floor tile math both sides
    # span-granular flagship join: the same closed-interval
    # point-probe predicate as point_query, over the regenerated
    # span corpus's derive-channel points
    "span_box_join": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )}),
s AS (SELECT CAST(substr(doc_id, 4) AS BIGINT) * 16 + seq AS query_id
      FROM sp),
p AS (SELECT query_id,
             {derive._frac_sql('query_id', 4)} AS px,
             {derive._frac_sql('query_id', 5)} AS py
      FROM s),
b AS ({b_orders})
SELECT p.query_id AS query_id, b.idx AS idx
FROM p, b
WHERE p.px <= b.xmax AND b.xmin <= p.px AND p.py <= b.ymax AND b.ymin <= p.py
""",
    "span_tiles": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )}),
s AS (SELECT doc_id, seq, kind,
             CAST(substr(doc_id, 4) AS BIGINT) * 16 + seq AS sid
      FROM sp),
p AS (SELECT doc_id, seq, kind,
             {derive._frac_sql('sid', 4)} AS px,
             {derive._frac_sql('sid', 5)} AS py
      FROM s)
SELECT doc_id, seq, kind, px, py,
       {derive.tile_cell_sql('px', 'py', TILE_RES)} AS cell
FROM p
""",
    # context-window packing over the regenerated span corpus:
    # window = cumulative-cost-before // budget (window SUM twin)
    "span_windows": f"""
WITH sp AS ({interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )}),
c AS (SELECT doc_id, seq, kind,
             CASE WHEN kind = 'text'
                  THEN length(text) - length(replace(text, ' ', '')) + 1
                  ELSE {SPAN_MEDIA_TOK} END AS cost
      FROM sp),
w AS (SELECT doc_id, kind, cost,
             COALESCE(SUM(cost) OVER (PARTITION BY doc_id ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {SPAN_BUDGET} AS window_id
      FROM c)
SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(cost) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN kind = 'text' THEN 0 ELSE 1 END) AS BIGINT)
         AS n_media
FROM w GROUP BY doc_id, window_id
""",
    # per-doc modality profile over the regenerated span corpus
    "doc_modality": "SELECT doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_spans, "
    "CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_text, "
    "CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_image, "
    "CAST(SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_audio, "
    "CAST(SUM(CASE WHEN kind = 'video' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_video, "
    "CAST(SUM(length(text)) AS BIGINT) AS text_chars FROM ("
    + interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )
    + ") GROUP BY doc_id",
    # modality interleaving structure over the regenerated spans
    "span_transitions": """
WITH sp AS ("""
    + interleaved_spans_sql(
        "(SELECT row_number() OVER () - 1 AS i FROM orders)", kinds="all"
    )
    + """),
d AS (SELECT doc_id, kind,
             LAG(kind) OVER (PARTITION BY doc_id ORDER BY seq) AS from_kind
      FROM sp)
SELECT from_kind, kind AS to_kind, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE from_kind IS NOT NULL GROUP BY from_kind, kind
""",
}
