"""Exact geometric measure of a box set — Klee's rectangle-union area.

``boxes_union_area`` computes the area of the UNION of (possibly
overlapping) axis-aligned boxes exactly, the measure companion to the
intersection-enumeration ops in ``spatial_join`` (reference workload
family: `prtree.h` batch_query over box sets; the union measure is the
aggregate the reference's users compute from the pair list).

Scale shape: coordinates quantize to an integer grid (``quant_bits``),
which makes every strip width, merged-interval length and partial area
an EXACT int64 — no float summation order to disagree with the SQL
twin. The x-axis splits into ``n_slabs`` slabs; each box ships only to
the slabs it overlaps, CLIPPED at slab boundaries (measure is additive
over an x-partition, and with integer coords clipping is exact), so a
slab's sweep never sees boxes outside its range. Per slab, ONE
vectorized gaps-and-islands pass (lexsort + segmented running max +
``reduceat``) merges the y-intervals of every strip simultaneously —
no per-strip Python loop. The per-slab partials are S rows of int64;
the driver folds them into the single output row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..config import COMBINE_BATCH, tune_context


def boxes_union_area(
    boxes: Dataset,
    n_slabs: int = 64,
    quant_bits: int = 20,
) -> Dataset:
    """Exact union area of ``boxes`` (columns xmin/ymin/xmax/ymax in
    [0, 1)) on the ``2**quant_bits`` grid. Returns ONE row:
    ``(n_boxes, union_area_q, union_area)`` — the quantized area as
    exact int64 and its double value (one division, bitwise vs SQL)."""
    tune_context()
    if not 1 <= quant_bits <= 25:
        raise ValueError(
            f"boxes_union_area: quant_bits must be in [1, 25], got {quant_bits}"
        )
    if n_slabs < 1:
        raise ValueError(f"boxes_union_area: n_slabs must be >= 1, got {n_slabs}")
    q = np.float64(1 << quant_bits)
    dom = np.int64(1 << quant_bits)
    slab_w = np.int64((dom + n_slabs - 1) // n_slabs)

    def quantize(tbl: pa.Table) -> pa.Table:
        x0 = np.floor(tbl.column("xmin").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        x1 = np.floor(tbl.column("xmax").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        y0 = np.floor(tbl.column("ymin").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        y1 = np.floor(tbl.column("ymax").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        s0 = x0 // slab_w
        s1 = x1 // slab_w
        cnt = (s1 - s0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(x0.size, dtype=np.int64), cnt)
        off = np.arange(rep.size, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        slab = s0[rep] + off
        cx0 = np.maximum(x0[rep], slab * slab_w)
        cx1 = np.minimum(x1[rep], (slab + 1) * slab_w)
        own = off == 0  # the x0 slab counts the box exactly once
        keep = cx1 > cx0
        keep |= own  # zero-width owner pieces still carry the count
        return pa.table(
            {
                "slab": slab[keep],
                "x0": cx0[keep],
                "x1": cx1[keep],
                "y0": y0[rep][keep],
                "y1": y1[rep][keep],
                "own": own[keep].astype(np.int64),
            }
        )

    pieces = boxes.map_batches(
        quantize,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COMBINE_BATCH,
    )

    pack = np.int64(1) << np.int64(quant_bits + 2)

    def sweep(group: pa.Table) -> pa.Table:
        x0 = group.column("x0").to_numpy(zero_copy_only=False)
        x1 = group.column("x1").to_numpy(zero_copy_only=False)
        y0 = group.column("y0").to_numpy(zero_copy_only=False)
        y1 = group.column("y1").to_numpy(zero_copy_only=False)
        n_own = int(group.column("own").to_numpy(zero_copy_only=False).sum())
        wide = x1 > x0
        x0, x1, y0, y1 = x0[wide], x1[wide], y0[wide], y1[wide]
        if x0.size == 0:
            return pa.table(
                {
                    "area_q": pa.array([0], pa.int64()),
                    "n_own": pa.array([n_own], pa.int64()),
                }
            )
        xs = np.unique(np.concatenate([x0, x1]))
        j0 = np.searchsorted(xs, x0)
        j1 = np.searchsorted(xs, x1)
        cnt = j1 - j0
        rep = np.repeat(np.arange(x0.size, dtype=np.int64), cnt)
        off = np.arange(rep.size, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        strip = j0[rep] + off
        ey0, ey1 = y0[rep], y1[rep]
        order = np.lexsort((ey1, ey0, strip))
        st, sy0, sy1 = strip[order], ey0[order], ey1[order]
        seg_start = np.r_[True, st[1:] != st[:-1]]
        # exclusive running max of y1 within each strip segment: pack the
        # (ascending) strip id above the 22-bit y payload so one global
        # cummax restarts per segment
        cm = np.maximum.accumulate(st * pack + sy1)
        prev = np.r_[np.int64(-1), cm[:-1]]
        pm = np.where(seg_start, np.int64(-1), prev - st * pack)
        island_start = seg_start | (sy0 > pm)
        isl = np.flatnonzero(island_start)
        iy1 = np.maximum.reduceat(sy1, isl)
        iy0 = sy0[isl]
        istrip = st[isl]
        width = xs[istrip + 1] - xs[istrip]
        area = int(np.sum(width * (iy1 - iy0)))
        return pa.table(
            {
                "area_q": pa.array([area], pa.int64()),
                "n_own": pa.array([n_own], pa.int64()),
            }
        )

    partials = pieces.groupby("slab").map_groups(sweep, batch_format="pyarrow")
    rows = partials.take_all()  # <= n_slabs metadata-sized rows
    total = sum(int(r["area_q"]) for r in rows)
    n_boxes = sum(int(r["n_own"]) for r in rows)
    import ray

    denom = np.float64(np.int64(1) << np.int64(2 * quant_bits))
    return ray.data.from_arrow(
        pa.table(
            {
                "n_boxes": pa.array([n_boxes], pa.int64()),
                "union_area_q": pa.array([total], pa.int64()),
                "union_area": pa.array(
                    [np.float64(total) / denom], pa.float64()
                ),
            }
        )
    )


def boxes_union_area_sql(boxes_cte: str, quant_bits: int = 20) -> str:
    """DuckDB twin: quantize to the same grid, strip decomposition
    between consecutive distinct x-coords, gaps-and-islands y-merge per
    strip, exact BIGINT area. O(n x strips-per-box) intermediate — the
    oracle baseline, not the scale path."""
    qs = 1 << quant_bits
    denom = float(np.int64(1) << np.int64(2 * quant_bits))
    return (
        f"WITH b0 AS ({boxes_cte}), "
        f"b AS (SELECT CAST(FLOOR(xmin * {qs}) AS BIGINT) AS x0, "
        f"CAST(FLOOR(xmax * {qs}) AS BIGINT) AS x1, "
        f"CAST(FLOOR(ymin * {qs}) AS BIGINT) AS y0, "
        f"CAST(FLOOR(ymax * {qs}) AS BIGINT) AS y1 FROM b0), "
        "xs AS (SELECT DISTINCT x FROM "
        "(SELECT x0 AS x FROM b UNION ALL SELECT x1 FROM b)), "
        "s AS (SELECT x AS sx0, LEAD(x) OVER (ORDER BY x) AS sx1 FROM xs), "
        "sb AS (SELECT s.sx0, s.sx1, b.y0, b.y1 FROM s JOIN b "
        "ON b.x0 <= s.sx0 AND b.x1 >= s.sx1 "
        "WHERE s.sx1 IS NOT NULL AND s.sx1 > s.sx0), "
        "w AS (SELECT sx0, sx1, y0, y1, "
        "MAX(y1) OVER (PARTITION BY sx0 ORDER BY y0, y1 "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM sb), "
        "g AS (SELECT sx0, sx1, y0, y1, "
        "SUM(CASE WHEN pm IS NULL OR y0 > pm THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY sx0 ORDER BY y0, y1) AS isl FROM w), "
        "i AS (SELECT sx0, sx1, isl, MIN(y0) AS iy0, MAX(y1) AS iy1 "
        "FROM g GROUP BY sx0, sx1, isl) "
        "SELECT CAST((SELECT COUNT(*) FROM b0) AS BIGINT) AS n_boxes, "
        "CAST(COALESCE(SUM((sx1 - sx0) * (iy1 - iy0)), 0) AS BIGINT) "
        "AS union_area_q, "
        "CAST(COALESCE(SUM((sx1 - sx0) * (iy1 - iy0)), 0) AS DOUBLE) / "
        f"{denom!r} AS union_area FROM i"
    )
