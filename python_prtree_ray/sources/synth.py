"""Deterministic synthetic Lance-style interleaved documents.

Input-hint schema (BASELINE.json):
    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Everything is a pure function of the integer document number (seeded
multiply-mod hashing — same family as ``functions.derive``), so any two
runs, at any parallelism, generate identical rows: the per-row
span-sequence equality invariant (kind, text, media_ref, offset order)
can be asserted against a regenerated copy at any point in a pipeline.

Generation is a ``map_batches`` over ``ray.data.range`` blocks — no
driver-side loop, no materialized intermediate; at 10^12 docs this is
just more blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions import derive

_KINDS = ("text", "image", "audio", "video")
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu"
).split()

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])


def _h(i: np.ndarray, ch: int) -> np.ndarray:
    a, b = derive.CHANNELS[ch % len(derive.CHANNELS)]
    return (i.astype(np.int64) * a + b) % derive.MOD


_TEXT_TABLE: pa.Array | None = None
_WLENS = np.array([len(w) for w in _WORDS], dtype=np.int64)


def _text_table() -> pa.Array:
    """All 26^3 possible three-word span texts as one Arrow StringArray,
    built once per process — span text becomes a single `take` gather
    instead of np.char unicode concatenation (which dominated the
    generator's profile ~10x over everything downstream)."""
    global _TEXT_TABLE
    if _TEXT_TABLE is None:
        _TEXT_TABLE = pa.array(
            [f"{a} {b} {c}" for a in _WORDS for b in _WORDS for c in _WORDS],
            type=pa.string(),
        )
    return _TEXT_TABLE


def _fixed_decimal_strings(prefix: bytes, vals: np.ndarray, ndigits: int = 12) -> pa.Array:
    """printf('<prefix>%0<ndigits>d', vals) as an Arrow StringArray via a
    fixed-width uint8 digit matrix — no per-row Python formatting."""
    n = vals.shape[0]
    plen = len(prefix)
    w = plen + ndigits
    buf = np.empty((n, w), dtype=np.uint8)
    buf[:, :plen] = np.frombuffer(prefix, dtype=np.uint8)
    pow10 = 10 ** np.arange(ndigits - 1, -1, -1, dtype=np.int64)
    buf[:, plen:] = (vals[:, None] // pow10) % 10 + ord("0")
    offsets = np.arange(0, (n + 1) * w, w, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.string(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


def interleaved_batch(ids: np.ndarray) -> pa.Table:
    """Build the interleaved table for a vector of doc numbers (vectorized:
    span attributes are computed column-wise; only the final Arrow
    ListArray assembly touches offsets)."""
    n = ids.shape[0]
    nspans = (_h(ids, 0) % 7 + 2).astype(np.int64)  # 2..8 spans/doc
    total = int(nspans.sum())
    doc_of_span = np.repeat(np.arange(n), nspans)
    span_rank = np.arange(total) - np.repeat(np.cumsum(nspans) - nspans, nspans)
    sid = ids[doc_of_span] * 16 + span_rank  # unique span key
    kind_i = (_h(sid, 1) % 4).astype(np.int64)
    # text spans are 70% of spans: fold media kinds back to text mostly
    kind_i[(_h(sid, 2) % 10) < 7] = 0
    import pyarrow.compute as pc

    nw = len(_WORDS)
    w1 = _h(sid, 3) % nw
    w2 = _h(sid, 4) % nw
    w3 = _h(sid, 5) % nw
    is_text = kind_i == 0
    is_text_pa = pa.array(is_text)
    # text: one gather from the 26^3 combo table, blanked for media spans
    texts = pc.if_else(
        is_text_pa,
        pc.take(_text_table(), pa.array((w1 * nw + w2) * nw + w3)),
        "",
    )
    media = pc.if_else(
        is_text_pa,
        "",
        _fixed_decimal_strings(b"media://blob/", _h(sid, 6) % 10**12),
    )
    kinds = pc.take(pa.array(_KINDS, type=pa.string()), pa.array(kind_i))
    # offsets: cumulative char offset inside each doc (word-length table
    # lookup, not str_len over materialized text)
    span_len = np.where(is_text, _WLENS[w1] + _WLENS[w2] + _WLENS[w3] + 2, 64)
    csum = np.cumsum(span_len)
    doc_start = np.repeat(csum[np.cumsum(nspans) - nspans] - span_len[np.cumsum(nspans) - nspans], nspans)
    offsets32 = (csum - span_len - doc_start).astype(np.int32)

    struct_arr = pa.StructArray.from_arrays(
        [
            kinds.combine_chunks() if isinstance(kinds, pa.ChunkedArray) else kinds,
            texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
            media.combine_chunks() if isinstance(media, pa.ChunkedArray) else media,
            pa.array(offsets32, type=pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    list_offsets = np.concatenate([[0], np.cumsum(nspans)]).astype(np.int32)
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct_arr)
    doc_id = _fixed_decimal_strings(b"doc", ids)
    return pa.Table.from_arrays([doc_id, spans], schema=DOC_SCHEMA)


def interleaved_docs(n_docs: int, override_num_blocks: int | None = None) -> Dataset:
    """Dataset of n interleaved documents."""

    def gen(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        return interleaved_batch(ids)

    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


def interleaved_spans_sql(n_docs, kinds: str = "media") -> str:
    """DuckDB twin of the spans of :func:`interleaved_batch` — the same
    multiply-mod hash channels, word table and cumulative char offsets
    as the NumPy side, so the driver can hash-check the span pipelines
    end to end (offsets are a window SUM over ALL spans including text,
    filtered by kind at the end).

    ``kinds="media"`` (default): the NON-TEXT spans as
    ``(doc_id, offset, kind, media_ref)``. ``kinds="text"``: the TEXT
    spans as ``(doc_id, offset, text)`` with the regenerated
    three-word span text. ``kinds="all"``: EVERY span as
    ``(doc_id, seq, offset, kind, text, media_ref)`` — the full
    span-sequence invariant surface (kind, text, media_ref, order),
    with empty-string text/media_ref exactly as the engine emits them.

    ``n_docs``: an int, or a SQL table expression yielding a column ``i``
    of doc numbers (e.g. ``(SELECT row_number() OVER () - 1 AS i FROM
    orders)`` to mirror the engine's sf-proportional doc count)."""
    a0, b0 = derive.CHANNELS[0]
    a1, b1 = derive.CHANNELS[1]
    a2, b2 = derive.CHANNELS[2]
    a3, b3 = derive.CHANNELS[3]
    a4, b4 = derive.CHANNELS[4]
    a5, b5 = derive.CHANNELS[5]
    a6, b6 = derive.CHANNELS[6]
    M = derive.MOD
    wl_sql = "[" + ",".join(str(len(w)) for w in _WORDS) + "]"
    nw = len(_WORDS)
    ids_sql = (
        f"(SELECT range AS i FROM range(0, {n_docs}))"
        if isinstance(n_docs, int)
        else n_docs
    )

    def _w(ch_a: int, ch_b: int) -> str:
        return (
            f"{wl_sql}[CAST(((sid * {ch_a} + {ch_b}) % {M}) % {nw} AS INTEGER) + 1]"
        )

    words_sql = "[" + ",".join(f"'{w}'" for w in _WORDS) + "]"

    def _word(ch_a: int, ch_b: int) -> str:
        return (
            f"{words_sql}[CAST(((sid * {ch_a} + {ch_b}) % {M}) % {nw} AS INTEGER) + 1]"
        )

    text_sql = f"{_word(a3, b3)} || ' ' || {_word(a4, b4)} || ' ' || {_word(a5, b5)}"
    media_sql = f"printf('media://blob/%012d', (sid * {a6} + {b6}) % {M})"
    kind_sql = (
        "CASE kind_i WHEN 0 THEN 'text' WHEN 1 THEN 'image'"
        " WHEN 2 THEN 'audio' ELSE 'video' END"
    )
    if kinds == "media":
        proj = f"""
         {kind_sql} AS kind,
         {media_sql} AS media_ref"""
        where = "WHERE kind_i <> 0"
    elif kinds == "text":
        proj = f"""
         {text_sql} AS text"""
        where = "WHERE kind_i = 0"
    elif kinds == "all":
        proj = f"""
         CAST(j AS INTEGER) AS seq,
         {kind_sql} AS kind,
         CASE WHEN kind_i = 0 THEN {text_sql} ELSE '' END AS text,
         CASE WHEN kind_i = 0 THEN '' ELSE {media_sql} END AS media_ref"""
        where = ""
    else:
        raise ValueError(f"kinds must be 'media', 'text' or 'all'; got {kinds!r}")

    return f"""
  SELECT printf('doc%012d', i) AS doc_id,
         CAST("offset" AS INTEGER) AS "offset",{proj}
  FROM (
    SELECT i, j, sid, kind_i,
           CAST(COALESCE(SUM(span_len) OVER (
             PARTITION BY i ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER)
             AS "offset"
    FROM (
      SELECT i, j, sid, kind_i,
             CASE WHEN kind_i = 0
                  THEN {_w(a3, b3)} + {_w(a4, b4)} + {_w(a5, b5)} + 2
                  ELSE 64 END AS span_len
      FROM (
        SELECT i, j, sid,
               CASE WHEN ((sid * {a2} + {b2}) % {M}) % 10 < 7 THEN 0
                    ELSE ((sid * {a1} + {b1}) % {M}) % 4 END AS kind_i
        FROM (
          SELECT d.i AS i, j.j AS j, d.i * 16 + j.j AS sid
          FROM (SELECT i, ((i * {a0} + {b0}) % {M}) % 7 + 2 AS nspans
                FROM {ids_sql}) d,
               (SELECT range AS j FROM range(0, 8)) j
          WHERE j.j < d.nspans
        )
      )
    )
  )
  {where}"""


# Media-stub payload SQL pieces (twins of pipelines/multimodal.py
# fetch_payload_stub): repeat count and clipped payload length.
MEDIA_REP_SQL = "(1 + ord(substr(media_ref, length(media_ref))) % 12)"
MEDIA_PAYLOAD_SQL = (
    f"substr(repeat(media_ref, CAST({MEDIA_REP_SQL} AS INTEGER)), 1, 256)"
)
MEDIA_PLEN_SQL = f"LEAST(length(media_ref) * {MEDIA_REP_SQL}, 256)"


def georef_batch(tbl: pa.Table) -> pa.Table:
    """Georeference interleaved docs: per-doc bbox derived from the doc
    number via the shared derive formulas; spans column is carried through
    UNTOUCHED (zero-copy) so span-sequence equality holds downstream."""
    import pyarrow.compute as pc

    doc_ids = tbl.column("doc_id")
    # "doc%012d" → int64, all in Arrow C kernels
    nums = pc.cast(
        pc.utf8_slice_codeunits(doc_ids.combine_chunks(), 3), pa.int64()
    ).to_numpy(zero_copy_only=False)
    cols = derive.derive_boxes(nums)
    out = tbl.append_column("idx", pa.array(nums, type=pa.int64()))
    for name, arr in cols.items():
        out = out.append_column(name, pa.array(arr, type=pa.float64()))
    return out
