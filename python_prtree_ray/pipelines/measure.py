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
    method: str = "tiles",
    grid_bits: int = 7,
) -> Dataset:
    """Exact union area of ``boxes`` (columns xmin/ymin/xmax/ymax in
    [0, 1)) on the ``2**quant_bits`` grid. Returns ONE row:
    ``(n_boxes, union_area_q, union_area)`` — the quantized area as
    exact int64 and its double value (one division, bitwise vs SQL).

    ``method="tiles"`` (default, the scale path): two-level cover — a
    ``2**grid_bits``-per-axis tile grid; tiles FULLY covered by any one
    box are marked through a sparse 2D difference-array fold and
    contribute whole-tile area with no interior work, while only the
    boundary pieces that land in UNCOVERED tiles reach the
    gaps-and-islands sweep. Work is O(n · span-tiles) instead of the
    strip expansion's O(n² · box-width): measured 11-19 s → ~2 s on
    150k dense boxes (97% coverage), identical area to the slab path.

    ``method="slabs"``: the direct strip-expansion sweep over
    ``n_slabs`` x-slabs — simpler, mirrors the SQL oracle's plan
    shape, and the cross-check twin for the tiles path in tests."""
    tune_context()
    if method not in ("tiles", "slabs"):
        raise ValueError(f"boxes_union_area: unknown method {method!r}")
    if method == "tiles":
        return _union_area_tiles(boxes, quant_bits, grid_bits)
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
        seg_start = np.r_[True, st[1:] != st[:-1]][: st.size]
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


def _union_area_tiles(boxes: Dataset, quant_bits: int, grid_bits: int) -> Dataset:
    """Two-level exact union area (see :func:`boxes_union_area`)."""
    import ray

    from .merge import bucketed_sum

    if not 1 <= quant_bits <= 25:
        raise ValueError(
            f"boxes_union_area: quant_bits must be in [1, 25], got {quant_bits}"
        )
    if not 1 <= grid_bits <= quant_bits:
        raise ValueError(
            f"boxes_union_area: need 1 <= grid_bits <= quant_bits, got {grid_bits}"
        )
    q = np.float64(1 << quant_bits)
    g = np.int64(1 << grid_bits)
    tw = np.int64(1 << (quant_bits - grid_bits))

    def quant(tbl: pa.Table):
        x0 = np.floor(tbl.column("xmin").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        x1 = np.floor(tbl.column("xmax").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        y0 = np.floor(tbl.column("ymin").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        y1 = np.floor(tbl.column("ymax").to_numpy(zero_copy_only=False) * q).astype(np.int64)
        return x0, x1, y0, y1

    def diff_partial(tbl: pa.Table) -> pa.Table:
        x0, x1, y0, y1 = quant(tbl)
        fx0 = (x0 + tw - 1) // tw
        fx1 = x1 // tw
        fy0 = (y0 + tw - 1) // tw
        fy1 = y1 // tw
        full = (fx1 > fx0) & (fy1 > fy0)
        a, b, c, d = fx0[full], fx1[full], fy0[full], fy1[full]
        gp = g + 1
        key = np.concatenate([a * gp + c, b * gp + c, a * gp + d, b * gp + d])
        val = np.concatenate(
            [
                np.ones(a.size, np.int64),
                -np.ones(a.size, np.int64),
                -np.ones(a.size, np.int64),
                np.ones(a.size, np.int64),
            ]
        )
        # box-count marker rides the same fold under the reserved key -1
        key = np.r_[key, np.int64(-1)]
        val = np.r_[val, np.int64(x0.size)]
        uk, inv = np.unique(key, return_inverse=True)
        sv = np.zeros(uk.size, np.int64)
        np.add.at(sv, inv, val)
        return pa.table({"k": uk, "v": sv})

    folded = bucketed_sum(
        boxes.map_batches(
            diff_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        ),
        key_col="k",
        value_cols=("v",),
    ).take_all()  # <= (g+1)^2 + 1 rows: parameter-sized
    gp = int(g) + 1
    dense = np.zeros((gp, gp), np.int64)
    n_boxes = 0
    for r in folded:
        k, v = int(r["k"]), int(r["v"])
        if k < 0:
            n_boxes = v
        else:
            dense[k // gp, k % gp] = v
    cov = np.cumsum(np.cumsum(dense, axis=0), axis=1)[: int(g), : int(g)] > 0
    covered = np.flatnonzero(cov.reshape(-1)).astype(np.int64)  # tx*g+ty ids
    # reshape is row-major: index = tx*g + ty with cov[tx, ty] ✓
    cov_ref = ray.put(covered)

    def pieces(tbl: pa.Table) -> pa.Table:
        x0, x1, y0, y1 = quant(tbl)
        n = x0.size
        tx0, tx1 = x0 // tw, (x1 - 1) // tw
        ty0, ty1 = y0 // tw, (y1 - 1) // tw
        fx0 = (x0 + tw - 1) // tw
        fx1 = x1 // tw
        fy0 = (y0 + tw - 1) // tw
        fy1 = y1 // tw

        def column_strip(cols: np.ndarray, valid: np.ndarray):
            # (box, col) x all span rows for boxes where `valid`
            idx = np.flatnonzero(valid)
            rows = (ty1 - ty0 + 1)[idx]
            rep = np.repeat(idx, rows)
            off = np.arange(rep.size, dtype=np.int64) - np.repeat(
                np.cumsum(rows) - rows, rows
            )
            return rep, cols[idx].repeat(rows), ty0[rep] + off

        def row_strip(rws: np.ndarray, valid: np.ndarray):
            idx = np.flatnonzero(valid)
            cols = (tx1 - tx0 + 1)[idx]
            rep = np.repeat(idx, cols)
            off = np.arange(rep.size, dtype=np.int64) - np.repeat(
                np.cumsum(cols) - cols, cols
            )
            return rep, tx0[rep] + off, rws[idx].repeat(cols)

        partial_col = lambda c: ~((fx0 <= c) & (c < fx1))  # noqa: E731
        partial_row = lambda r: ~((fy0 <= r) & (r < fy1))  # noqa: E731
        segs = [
            column_strip(tx0, partial_col(tx0)),
            column_strip(tx1, partial_col(tx1) & (tx1 != tx0)),
            row_strip(ty0, partial_row(ty0)),
            row_strip(ty1, partial_row(ty1) & (ty1 != ty0)),
        ]
        rep = np.concatenate([s[0] for s in segs])
        tcx = np.concatenate([s[1] for s in segs])
        tcy = np.concatenate([s[2] for s in segs])
        # dedup (box, tile): corner tiles appear in both a column and a
        # row strip
        packed = (rep * g + tcx) * g + tcy
        _, first = np.unique(packed, return_index=True)
        rep, tcx, tcy = rep[first], tcx[first], tcy[first]
        tile = tcx * g + tcy
        # drop pieces that land in fully-covered tiles: subsumed
        cov_ids = ray.get(cov_ref)
        if cov_ids.size:
            pos = np.searchsorted(cov_ids, tile)
            sub = (pos < cov_ids.size) & (
                cov_ids[np.minimum(pos, cov_ids.size - 1)] == tile
            )
            rep, tcx, tcy, tile = rep[~sub], tcx[~sub], tcy[~sub], tile[~sub]
        cx0 = np.maximum(x0[rep], tcx * tw)
        cx1 = np.minimum(x1[rep], (tcx + 1) * tw)
        cy0 = np.maximum(y0[rep], tcy * tw)
        cy1 = np.minimum(y1[rep], (tcy + 1) * tw)
        # COARSE bucket key: per-TILE groups can reach (g^2) tiny groups
        # at low coverage, and Ray's per-group overhead then dominates
        # (measured: sf0.01 ran 2.2x SLOWER than sf0.1). One sweep call
        # handles every tile of its bucket at once — x coords shift by
        # tile*dom below, so no piece ever crosses tiles and strips of
        # different tiles can never merge.
        from ..functions.buckets import bucket_of

        return pa.table(
            {
                "tb": bucket_of(tile, 64),
                "tile": tile,
                "x0": cx0,
                "x1": cx1,
                "y0": cy0,
                "y1": cy1,
            }
        )

    pack = np.int64(1) << np.int64(quant_bits + 2)
    dom_shift = np.int64(1) << np.int64(quant_bits)

    def sweep(group: pa.Table) -> pa.Table:
        tile = group.column("tile").to_numpy(zero_copy_only=False)
        x0 = group.column("x0").to_numpy(zero_copy_only=False)
        x1 = group.column("x1").to_numpy(zero_copy_only=False)
        y0 = group.column("y0").to_numpy(zero_copy_only=False)
        y1 = group.column("y1").to_numpy(zero_copy_only=False)
        if x0.size == 0:
            return pa.table({"area_q": pa.array([0], pa.int64())})
        # disjoint per-tile x blocks: pieces are clamped to their tile,
        # so strips in the gap between blocks receive no rows
        x0 = tile * dom_shift + x0
        x1 = tile * dom_shift + x1
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
        seg_start = np.r_[True, st[1:] != st[:-1]][: st.size]
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
        return pa.table({"area_q": pa.array([area], pa.int64())})

    partials = (
        boxes.map_batches(
            pieces,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COMBINE_BATCH,
        )
        .groupby("tb")
        .map_groups(sweep, batch_format="pyarrow")
        .take_all()
    )
    total = int(covered.size) * int(tw) * int(tw) + sum(
        int(r["area_q"]) for r in partials
    )
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
