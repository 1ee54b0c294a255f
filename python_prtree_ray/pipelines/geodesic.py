"""Great-circle (haversine) radius join over lon/lat points.

The geodesic counterpart of :func:`~.knn.radius_join`: pairs (big side,
small side) whose great-circle distance is within ``max_km``. Points are
georeferenced from the derived unit-square coordinates (lon = px*360-180,
lat = py*170-85 — poles excluded so no meridian-wrap pathologies enter
the test surface; a production deployment would wrap candidate windows
at the antimeridian).

Exactness: both engine and SQL oracle evaluate the haversine with the
SAME expression shapes and the same double literals, and NumPy's float64
``sin``/``cos``/``arcsin`` and DuckDB's call the same system libm on the
same machine, so distances agree bitwise (validated end-to-end by the
oracle gate; any platform where that assumption breaks fails LOUDLY as a
hash mismatch, never silently).

Scale shape: the small side (facilities / stations) broadcasts ONCE via
``ray.put``; the big side streams, and a cheap latitude-band prefilter
(|dlat| <= max_km / km-per-degree) gates the trig so the per-batch trig
cost is proportional to candidate pairs, not all pairs. A big-big
geodesic join composes the same kernel with the cell-shuffle path of
``radius_join`` on lon/lat bounding boxes (not wired — no test table
needs it).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..stages import spatial as st

RAD = math.pi / 180.0
R_EARTH_KM = 6371.0088
DIAM_KM = 2.0 * R_EARTH_KM
# conservative degrees-per-km (sphere meridian): 1 deg lat = R*RAD km
KM_PER_DEG = R_EARTH_KM * RAD
MAX_KM = 400.0
BROADCAST_LIMIT = 2_000_000


def _lonlat(px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return px * 360.0 - 180.0, py * 170.0 - 85.0


# NumPy's vectorized float64 sin/cos/sqrt are bitwise libm-equal on this
# platform, but np.arcsin is NOT (SIMD polynomial, few-ULP drift vs
# std::asin) — so the exact libm asin runs only on near-threshold +
# emitted rows (output-sized), never on the candidate matrix.
def _asin_libm(arr: np.ndarray) -> np.ndarray:
    # built per call: np.frompyfunc objects don't pickle into Ray tasks
    return np.frompyfunc(math.asin, 1, 1)(arr).astype(np.float64)


def _haversine_a(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """The haversine 'a' term (squared half-chord), fully vectorized.
    Expression shapes mirror :func:`haversine_join_sql` token-for-token."""
    phi1 = lat1 * RAD
    phi2 = lat2 * RAD
    sdphi = np.sin((lat2 - lat1) * RAD * 0.5)
    sdlam = np.sin((lon2 - lon1) * RAD * 0.5)
    a = sdphi * sdphi + np.cos(phi1) * np.cos(phi2) * sdlam * sdlam
    return np.minimum(a, 1.0)


def _haversine_km(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    a = _haversine_a(lon1, lat1, lon2, lat2)
    return DIAM_KM * _asin_libm(np.sqrt(a))


def haversine_join(
    big: Dataset,
    small: Dataset,
    max_km: float = MAX_KM,
) -> Dataset:
    """(query_id, idx, dist_km): big-side points within ``max_km``
    great-circle km of each small-side point. Both inputs are
    (query_id, px, py) point datasets; small side must fit the
    broadcast limit (facility-table sized)."""
    from .knn import _try_collect_points

    stbl = _try_collect_points(small, BROADCAST_LIMIT)
    if stbl is None:
        raise ValueError(
            f"haversine_join: small side exceeds broadcast limit "
            f"{BROADCAST_LIMIT}; compose the kernel with the cell-shuffle "
            f"radius_join path for big-big geodesic joins"
        )
    s_ids = stbl.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    s_lon, s_lat = _lonlat(
        stbl.column("px").to_numpy(zero_copy_only=False),
        stbl.column("py").to_numpy(zero_copy_only=False),
    )
    side_ref = ray.put((s_ids, s_lon, s_lat))
    dlat_max = max_km / KM_PER_DEG  # conservative: meridian arc only

    def probe(tbl: pa.Table) -> pa.Table:
        sid, slon, slat = ray.get(side_ref)
        b_lon, b_lat = _lonlat(st.col_np(tbl, "px"), st.col_np(tbl, "py"))
        b_ids = st.col_np(tbl, "query_id")
        out_q, out_i, out_d = [], [], []
        # facility side processed in chunks with ONE reused float64
        # difference buffer (out=), so per-task peak is ~16 MB at the
        # 8192-row batch (8192 x 256 x 8 B) + an 2 MB bool band —
        # however large the broadcast side grows
        chunk = 256
        if sid.shape[0]:
            buf = np.empty(
                (b_lat.shape[0], min(chunk, sid.shape[0])), np.float64
            )
        for c0 in range(0, sid.shape[0], chunk):
            c1 = min(c0 + chunk, sid.shape[0])
            sub = buf[:, : c1 - c0]
            # latitude-band prefilter: trig only on candidate pairs
            np.subtract(b_lat[:, None], slat[None, c0:c1], out=sub)
            np.abs(sub, out=sub)
            bi, si = np.nonzero(sub <= dlat_max)
            if bi.size == 0:
                continue
            si = si + c0
            a = _haversine_a(b_lon[bi], b_lat[bi], slon[si], slat[si])
            # vectorized near-superset gate (np.arcsin drifts <= few
            # ULPs from libm; 1e-6 km of slack dwarfs that), then the
            # exact libm asin + threshold on the surviving rows
            cand = DIAM_KM * np.arcsin(np.sqrt(a)) <= max_km + 1e-6
            bi, si, a = bi[cand], si[cand], a[cand]
            d = DIAM_KM * _asin_libm(np.sqrt(a))
            keep = d <= max_km
            out_q.append(b_ids[bi[keep]])
            out_i.append(sid[si[keep]])
            out_d.append(d[keep])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "idx": pa.array([], pa.int64()),
                    "dist_km": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "idx": pa.array(np.concatenate(out_i)),
                "dist_km": pa.array(np.concatenate(out_d)),
            }
        )

    return big.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True, batch_size=8192
    )


def haversine_join_sql(
    big_cte: str, small_cte: str, max_km: float = MAX_KM
) -> str:
    """DuckDB twin of :func:`haversine_join` — same expression shapes."""
    return f"""
WITH b0 AS ({big_cte}),
     s0 AS ({small_cte}),
     b AS (SELECT query_id, px * 360.0 - 180.0 AS lon,
                  py * 170.0 - 85.0 AS lat FROM b0),
     s AS (SELECT query_id AS idx, px * 360.0 - 180.0 AS lon,
                  py * 170.0 - 85.0 AS lat FROM s0),
     d AS (SELECT b.query_id AS query_id, s.idx AS idx,
                  {DIAM_KM!r} * ASIN(SQRT(LEAST(
                      SIN((s.lat - b.lat) * {RAD!r} * 0.5)
                      * SIN((s.lat - b.lat) * {RAD!r} * 0.5)
                      + COS(b.lat * {RAD!r}) * COS(s.lat * {RAD!r})
                      * SIN((s.lon - b.lon) * {RAD!r} * 0.5)
                      * SIN((s.lon - b.lon) * {RAD!r} * 0.5),
                      1.0))) AS dist_km
           FROM b, s)
SELECT query_id, idx, dist_km FROM d WHERE dist_km <= {max_km!r}
"""


def knn_geo(
    big: Dataset,
    small: Dataset,
    k: int = 5,
    batch_size: int = 4096,
) -> Dataset:
    """Great-circle k-nearest-neighbours: the ``k`` big-side points
    closest to each small-side query point by haversine distance —
    ``(query_id, idx, dist_km, rank)``. The geodesic companion of the
    planar ``knn_join``.

    Exactness: candidates RANK on the haversine 'a' term (squared
    half-chord — strictly monotone with distance, and bitwise-libm
    equal between NumPy and DuckDB per the module contract), ties by
    idx; the non-portable ``asin`` runs only on the k×Q winners via
    exact libm (:func:`_asin_libm`). The SQL twin orders by the same
    'a' expression, so row sets AND distances agree bitwise.

    Scale shape: queries broadcast once via ``ray.put``; each big-side
    batch computes the (Q × B) 'a' matrix (bounded by ``batch_size``),
    sorts rows in (a, idx) order after an idx pre-sort (stable sort =
    deterministic ties), and emits only k rows per query; ONE tiny
    per-query merge (:func:`..merge.grouped_topk`) finishes. Big side
    never shuffles.
    """
    from .knn import _try_collect_points
    from .merge import grouped_topk

    stbl = _try_collect_points(small, BROADCAST_LIMIT)
    if stbl is None:
        raise ValueError("knn_geo: query side exceeds broadcast limit")
    s_ids = stbl.column("query_id").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    s_lon, s_lat = _lonlat(
        stbl.column("px").to_numpy(zero_copy_only=False),
        stbl.column("py").to_numpy(zero_copy_only=False),
    )
    ref = ray.put((s_ids, s_lon, s_lat))

    def partial(tbl: pa.Table) -> pa.Table:
        ids_q, lon_q, lat_q = ray.get(ref)
        idx = st.col_np(tbl, "query_id").astype(np.int64)
        lon, lat = _lonlat(st.col_np(tbl, "px"), st.col_np(tbl, "py"))
        if idx.size == 0 or ids_q.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "idx": pa.array([], pa.int64()),
                    "a": pa.array([], pa.float64()),
                }
            )
        # idx pre-sort so the stable row sort breaks 'a' ties by idx
        perm = np.argsort(idx, kind="stable")
        idx, lon, lat = idx[perm], lon[perm], lat[perm]
        a = _haversine_a(
            lon_q[:, None], lat_q[:, None], lon[None, :], lat[None, :]
        )
        kk = min(k, idx.size)
        order = np.argsort(a, axis=1, kind="stable")[:, :kk]
        qid = np.repeat(ids_q, kk)
        return pa.table(
            {
                "query_id": qid,
                "idx": idx[order].ravel(),
                "a": np.take_along_axis(a, order, axis=1)[:, :kk].ravel(),
            }
        )

    partials = big.map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    top = grouped_topk(
        partials, k, key_col="query_id", id_col="idx", value_col="a",
        descending=False,
    )

    def finish(tbl: pa.Table) -> pa.Table:
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": tbl.column("query_id"),
                "idx": tbl.column("idx"),
                "dist_km": pa.array(
                    DIAM_KM * _asin_libm(np.sqrt(a)), pa.float64()
                ),
                "rank": tbl.column("rank"),
            }
        )

    return top.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def knn_geo_sql(big_cte: str, small_cte: str, k: int = 5) -> str:
    """DuckDB twin of :func:`knn_geo` — ranks on the identical 'a'
    expression, asin only on the winners."""
    return f"""
WITH b0 AS ({big_cte}),
     s0 AS ({small_cte}),
     b AS (SELECT query_id AS idx, px * 360.0 - 180.0 AS lon,
                  py * 170.0 - 85.0 AS lat FROM b0),
     s AS (SELECT query_id, px * 360.0 - 180.0 AS lon,
                  py * 170.0 - 85.0 AS lat FROM s0),
     g AS (SELECT s.query_id AS query_id, b.idx AS idx,
                  LEAST(
                      SIN((b.lat - s.lat) * {RAD!r} * 0.5)
                      * SIN((b.lat - s.lat) * {RAD!r} * 0.5)
                      + COS(s.lat * {RAD!r}) * COS(b.lat * {RAD!r})
                      * SIN((b.lon - s.lon) * {RAD!r} * 0.5)
                      * SIN((b.lon - s.lon) * {RAD!r} * 0.5),
                      1.0) AS a
           FROM s, b),
     r AS (SELECT query_id, idx, a,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY a, idx) AS rank
           FROM g)
SELECT query_id, idx, {DIAM_KM!r} * ASIN(SQRT(a)) AS dist_km,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""
