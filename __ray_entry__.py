"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved-documents spatial pipeline on
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented operator
with its DuckDB twin; geometry derivation formulas are shared between the
Ray side and the SQL side via ``python_prtree_ray.functions.derive`` so
value hashes match bitwise (see that module's docstring).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from typing import Any

from python_prtree_ray.queries import all_queries, all_sql
from python_prtree_ray.queries._common import (  # noqa: F401
    ANN_K,
    ANN_RANGE_T,
    BFS_HOPS,
    COLOC_MIN_SHARED,
    COLOC_RES,
    DBSCAN_EPS,
    DBSCAN_MINPTS,
    DWELL_RES,
    KNN_K,
    KNOX_R,
    KNOX_TAU_US,
    MOTIF_RES,
    RADIUS,
    RASTER_MIN,
    RES,
    RESAMPLE_STEP_US,
    RESAMPLE_T0_US,
    SNAP_MAXMOVE,
    SNAP_R,
    SNAP_RES,
    SPAN_BUDGET,
    SPAN_MEDIA_TOK,
    SPEED_KMH_T,
    STAY_RES,
    TILE_QRES,
    TILE_RES,
    TRACK_RES,
    TRACK_SIM_RES,
    TRACK_SIM_START_RES,
    VOR_K,
)


def entry() -> Any:
    """Flagship: synthesize interleaved docs ≙ sf0.001 scale, georeference
    spans, tile-assign, spatial-join against derived query regions."""
    from python_prtree_ray.sources.synth import interleaved_docs, georef_batch
    from python_prtree_ray.sources import tables
    from python_prtree_ray.pipelines.spatial_join import spatial_join

    sf = "/root/testdata/sf0.001"
    docs = interleaved_docs(2000)
    geo = docs.map_batches(georef_batch, batch_format="pyarrow", zero_copy_batch=True)
    boxes = geo.select_columns(["idx", "xmin", "ymin", "xmax", "ymax"])
    queries_ds = tables.query_boxes_dataset(sf)
    pairs = spatial_join(boxes, queries_ds, res=RES)
    return pairs


def queries():
    return all_queries()


def oracle_sql():
    return all_sql()
