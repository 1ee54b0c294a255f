"""Deterministic geometry derivation from integer keys — NumPy + SQL twins.

The driver's correctness gate runs each Ray pipeline AND an ANSI-SQL
oracle side-by-side on the same parquet tables and hash-compares values.
The test tables carry no coordinates, so the engine derives boxes /
points / query regions *deterministically from integer key columns* — and
every formula here exists in two bit-identical renditions:

- a NumPy function (used inside ``map_batches`` stages), and
- a SQL-expression emitter (used to build the DuckDB oracle query).

Both sides use the same multiply-mod-divide hash (exact in int64 /
BIGINT for all key ranges involved; quotients < 2**53 so the
int → double conversion is exact) and the same IEEE-double expression
shapes in the same evaluation order, so doubles agree bitwise and the
driver's value hashes match.

Domain: the unit square [0, 1]^2 — same as the reference's benchmark
workloads (``benchmarks/cpp/workloads.h:45-53``: unit square, box edge
≤ a few % of extent).

Key domain of the SQL twin: ``key * multiplier`` must fit int64, i.e.
keys < 2^63 / max(CHANNELS multiplier) ≈ 2.58e9 — beyond that DuckDB
raises an overflow error (loud, never silently divergent) while the
NumPy side wraps deterministically. The test tables' keys are far below
the bound; a >2.5e9-key deployment would cast the oracle through
HUGEINT (the engine side needs no change).
"""

from __future__ import annotations

import math

import numpy as np

MOD = 1000000007
# (multiplier, offset) per hash channel; data boxes use 0-3, query
# regions / points use 4-7 so the two sides are independent.
CHANNELS = [
    (2654435761, 97),
    (2246822519, 131),
    (3266489917, 193),
    (668265263, 389),
    (374761393, 521),
    (2654435789, 769),
    (1885133167, 1031),
    (3431700317, 1543),
    # z-axis channels for 3D variants (8-9 data side, 10-11 query side)
    (2971215073, 2053),
    (1640531527, 2389),
    (2484345053, 2741),
    (3571428571, 3079),
    # t-axis channels for 4D variants (12-13 data side, 14-15 query side)
    (2166136261, 3433),
    (3141592661, 3833),
    (1099511627, 4241),
    (2718281821, 4649),
]

# Box-side extents (data boxes small — reference workloads use ≤1-10% of
# extent; queries are the larger side, as in the reference's query mixes).
BOX_SCALE = 0.97
BOX_EDGE_MIN = 0.0005
BOX_EDGE_VAR = 0.0195
QUERY_SCALE = 0.93
QUERY_EDGE_MIN = 0.002
QUERY_EDGE_VAR = 0.048


def _frac(key: np.ndarray, ch: int) -> np.ndarray:
    a, b = CHANNELS[ch]
    u = (key.astype(np.int64) * a + b) % MOD
    return u.astype(np.float64) / 1000000007.0


def _frac_sql(key: str, ch: int) -> str:
    a, b = CHANNELS[ch]
    return f"((({key} * {a} + {b}) % {MOD}) / 1000000007.0)"


# ------------------------------------------------------------------ boxes


def derive_boxes(key: np.ndarray) -> dict[str, np.ndarray]:
    """Data-side boxes from an int64 key column. Matches :func:`boxes_sql`."""
    f1, f2, f3, f4 = (_frac(key, c) for c in range(4))
    xmin = f1 * BOX_SCALE
    ymin = f2 * BOX_SCALE
    xmax = xmin + BOX_EDGE_MIN + BOX_EDGE_VAR * f3
    ymax = ymin + BOX_EDGE_MIN + BOX_EDGE_VAR * f4
    return {"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax}


def boxes_sql(table: str, key: str, idx_name: str = "idx") -> str:
    """CTE body: ``SELECT idx, xmin, ymin, xmax, ymax FROM <table>``.

    Nested so every expression references a previously-materialized column
    — identical evaluation structure to :func:`derive_boxes`.
    """
    return f"""
  SELECT {idx_name},
         f1 * {BOX_SCALE} AS xmin,
         f2 * {BOX_SCALE} AS ymin,
         f1 * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * f3 AS xmax,
         f2 * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * f4 AS ymax
  FROM (
    SELECT {key} AS {idx_name},
           {_frac_sql(key, 0)} AS f1,
           {_frac_sql(key, 1)} AS f2,
           {_frac_sql(key, 2)} AS f3,
           {_frac_sql(key, 3)} AS f4
    FROM {table}
  )"""


# NOTE on the xmax/ymax SQL shape: ``xmin + c`` with xmin = f1*S would be a
# lateral alias reference; instead the oracle recomputes ``f1*S + c`` —
# which is the SAME double because ``a*b + c`` evaluates (a*b) first in both
# renditions and numpy's ``xmin + c`` starts from the identical (f1*S) value.


def derive_query_boxes(key: np.ndarray) -> dict[str, np.ndarray]:
    """Query-side (probe) regions from an int64 key. Matches
    :func:`query_boxes_sql`."""
    f1, f2, f3, f4 = (_frac(key, c) for c in range(4, 8))
    xmin = f1 * QUERY_SCALE
    ymin = f2 * QUERY_SCALE
    xmax = xmin + QUERY_EDGE_MIN + QUERY_EDGE_VAR * f3
    ymax = ymin + QUERY_EDGE_MIN + QUERY_EDGE_VAR * f4
    return {"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax}


def query_boxes_sql(table: str, key: str, idx_name: str = "query_id") -> str:
    return f"""
  SELECT {idx_name},
         f1 * {QUERY_SCALE} AS xmin,
         f2 * {QUERY_SCALE} AS ymin,
         f1 * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * f3 AS xmax,
         f2 * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * f4 AS ymax
  FROM (
    SELECT {key} AS {idx_name},
           {_frac_sql(key, 4)} AS f1,
           {_frac_sql(key, 5)} AS f2,
           {_frac_sql(key, 6)} AS f3,
           {_frac_sql(key, 7)} AS f4
    FROM {table}
  )"""


# ------------------------------------------------------------------ points


def derive_points(key: np.ndarray) -> dict[str, np.ndarray]:
    """Probe points (for point queries / PIP / kNN). Matches
    :func:`points_sql`."""
    return {"px": _frac(key, 4), "py": _frac(key, 5)}


def points_sql(table: str, key: str, idx_name: str = "query_id") -> str:
    return f"""
  SELECT {key} AS {idx_name},
         {_frac_sql(key, 4)} AS px,
         {_frac_sql(key, 5)} AS py
  FROM {table}"""


def derive_points_3d(key: np.ndarray) -> dict[str, np.ndarray]:
    """3D probe points (z on the query-side channel 10, matching
    :func:`derive_query_boxes_3d`). Matches :func:`points_3d_sql`."""
    out = derive_points(key)
    out["pz"] = _frac(key, 10)
    return out


def points_3d_sql(table: str, key: str, idx_name: str = "query_id") -> str:
    return f"""
  SELECT {key} AS {idx_name},
         {_frac_sql(key, 4)} AS px,
         {_frac_sql(key, 5)} AS py,
         {_frac_sql(key, 10)} AS pz
  FROM {table}"""


def derive_points_4d(key: np.ndarray) -> dict[str, np.ndarray]:
    """4D probe points (t on channel 14). Matches :func:`points_4d_sql`."""
    out = derive_points_3d(key)
    out["pt"] = _frac(key, 14)
    return out


def points_4d_sql(table: str, key: str, idx_name: str = "query_id") -> str:
    return f"""
  SELECT {key} AS {idx_name},
         {_frac_sql(key, 4)} AS px,
         {_frac_sql(key, 5)} AS py,
         {_frac_sql(key, 10)} AS pz,
         {_frac_sql(key, 14)} AS pt
  FROM {table}"""


def point_score(key: np.ndarray) -> np.ndarray:
    """Deterministic double score per point key (e.g. POI popularity for
    per-tile top-k). Matches :func:`point_score_sql`."""
    return _frac(key, 7)


def point_score_sql(key: str) -> str:
    return _frac_sql(key, 7)


def point_measure(key: np.ndarray) -> np.ndarray:
    """Deterministic int64 measure in [0, 1000) per point key (sensor
    reading / weight for quantiles, IDW). Matches
    :func:`point_measure_sql`. Integer so distributed sums are exact and
    order-independent."""
    return np.floor(_frac(key, 6) * 1000.0).astype(np.int64)


def point_measure_sql(key: str) -> str:
    return f"CAST(FLOOR({_frac_sql(key, 6)} * 1000.0) AS BIGINT)"


# ------------------------------------------------------------------ tiles


def tile_index(coord: np.ndarray, res: int) -> np.ndarray:
    g = 1 << res
    return np.clip(np.floor(coord * g).astype(np.int64), 0, g - 1)


def tile_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    g = 1 << res
    return tile_index(x, res) * g + tile_index(y, res)


def tile_index_sql(coord: str, res: int) -> str:
    """SQL twin of :func:`tile_index` (clamped floor grid index)."""
    g = 1 << res
    return f"LEAST(GREATEST(CAST(FLOOR({coord} * {g}) AS BIGINT), 0), {g - 1})"


def tile_cell_sql(x: str, y: str, res: int) -> str:
    g = 1 << res
    return f"({tile_index_sql(x, res)} * {g} + {tile_index_sql(y, res)})"


# ------------------------------------------------------------------ polygons

# Fixed convex polygon set (regular hexagons, CCW). Vertex doubles are
# computed once here and embedded verbatim (repr round-trips doubles
# exactly) into both the NumPy arrays and the SQL VALUES literal, so both
# sides test against bit-identical vertices.
_HEX_OFFSETS = [
    (math.cos(2.0 * math.pi * i / 6.0), math.sin(2.0 * math.pi * i / 6.0))
    for i in range(6)
]
POLYGONS: list[tuple[int, list[tuple[float, float]]]] = []
for _p in range(8):
    _cx = 0.1 + 0.1 * _p
    _cy = 0.15 + 0.09 * _p
    _r = 0.04 + 0.01 * (_p % 3)
    POLYGONS.append(
        (_p, [(_cx + _r * dx, _cy + _r * dy) for dx, dy in _HEX_OFFSETS])
    )


def polygon_arrays() -> list[tuple[int, np.ndarray]]:
    return [(pid, np.array(v, dtype=np.float64)) for pid, v in POLYGONS]


def polygon_edges_sql(polys=None) -> str:
    """VALUES literal of polygon edges: (poly_id, x1, y1, x2, y2)."""
    rows = []
    for pid, verts in (POLYGONS if polys is None else polys):
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            rows.append(f"({pid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return "(VALUES " + ", ".join(rows) + ") AS poly_edges(poly_id, x1, y1, x2, y2)"


# Fixed CONCAVE polygon set (10-vertex stars, CCW, alternating outer/
# inner radius) — genuinely non-convex shapes for the crossing-number
# PIP path. Same verbatim-double embedding contract as POLYGONS.
CONCAVE_POLYGONS: list[tuple[int, list[tuple[float, float]]]] = []
for _p in range(6):
    _cx = 0.2 + 0.12 * _p
    _cy = 0.7 - 0.05 * _p
    _ro = 0.07 + 0.01 * (_p % 2)
    _ri = 0.028
    CONCAVE_POLYGONS.append(
        (
            _p,
            [
                (
                    _cx
                    + (_ro if _i % 2 == 0 else _ri)
                    * math.cos(2.0 * math.pi * _i / 10.0),
                    _cy
                    + (_ro if _i % 2 == 0 else _ri)
                    * math.sin(2.0 * math.pi * _i / 10.0),
                )
                for _i in range(10)
            ],
        )
    )


def concave_polygon_arrays() -> list[tuple[int, np.ndarray]]:
    return [
        (pid, np.array(v, dtype=np.float64)) for pid, v in CONCAVE_POLYGONS
    ]


# --------------------------------------------------------------- 3D boxes
# Reference parity: PRTree supports D in {2,3,4} (python_bindings.cc
# instantiates 2D/3D/4D classes); the engine's kernel is D-generic, so 3D
# needs only its own derivation channels (z on 8-11) and a 6-column box.


def derive_boxes_3d(key: np.ndarray) -> dict[str, np.ndarray]:
    out = derive_boxes(key)
    fz = _frac(key, 8)
    fe = _frac(key, 9)
    out["zmin"] = fz * BOX_SCALE
    out["zmax"] = fz * BOX_SCALE + BOX_EDGE_MIN + BOX_EDGE_VAR * fe
    return out


def boxes_3d_sql(table: str, key: str, idx_name: str = "idx") -> str:
    a8, b8 = CHANNELS[8]
    a9, b9 = CHANNELS[9]
    return f"""
  SELECT {idx_name},
         f1 * {BOX_SCALE} AS xmin,
         f2 * {BOX_SCALE} AS ymin,
         fz * {BOX_SCALE} AS zmin,
         f1 * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * f3 AS xmax,
         f2 * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * f4 AS ymax,
         fz * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * fe AS zmax
  FROM (
    SELECT {key} AS {idx_name},
           {_frac_sql(key, 0)} AS f1,
           {_frac_sql(key, 1)} AS f2,
           {_frac_sql(key, 2)} AS f3,
           {_frac_sql(key, 3)} AS f4,
           {_frac_sql(key, 8)} AS fz,
           {_frac_sql(key, 9)} AS fe
    FROM {table}
  )"""


def derive_query_boxes_3d(key: np.ndarray) -> dict[str, np.ndarray]:
    out = derive_query_boxes(key)
    fz = _frac(key, 10)
    fe = _frac(key, 11)
    out["zmin"] = fz * QUERY_SCALE
    out["zmax"] = fz * QUERY_SCALE + QUERY_EDGE_MIN + QUERY_EDGE_VAR * fe
    return out


def query_boxes_3d_sql(table: str, key: str, idx_name: str = "query_id") -> str:
    return f"""
  SELECT {idx_name},
         f1 * {QUERY_SCALE} AS xmin,
         f2 * {QUERY_SCALE} AS ymin,
         fz * {QUERY_SCALE} AS zmin,
         f1 * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * f3 AS xmax,
         f2 * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * f4 AS ymax,
         fz * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * fe AS zmax
  FROM (
    SELECT {key} AS {idx_name},
           {_frac_sql(key, 4)} AS f1,
           {_frac_sql(key, 5)} AS f2,
           {_frac_sql(key, 6)} AS f3,
           {_frac_sql(key, 7)} AS f4,
           {_frac_sql(key, 10)} AS fz,
           {_frac_sql(key, 11)} AS fe
    FROM {table}
  )"""

# --------------------------------------------------------------- 4D boxes
# Reference parity: python_bindings.cc instantiates PRTree4D as well; the
# kernel is D-generic, so 4D needs only a t-axis (channels 12-15) and an
# 8-column box.


def derive_boxes_4d(key: np.ndarray) -> dict[str, np.ndarray]:
    out = derive_boxes_3d(key)
    ft = _frac(key, 12)
    fe = _frac(key, 13)
    out["tmin"] = ft * BOX_SCALE
    out["tmax"] = ft * BOX_SCALE + BOX_EDGE_MIN + BOX_EDGE_VAR * fe
    return out


def boxes_4d_sql(table: str, key: str, idx_name: str = "idx") -> str:
    return f"""
  SELECT {idx_name},
         f1 * {BOX_SCALE} AS xmin,
         f2 * {BOX_SCALE} AS ymin,
         fz * {BOX_SCALE} AS zmin,
         ft * {BOX_SCALE} AS tmin,
         f1 * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * f3 AS xmax,
         f2 * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * f4 AS ymax,
         fz * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * fe AS zmax,
         ft * {BOX_SCALE} + {BOX_EDGE_MIN} + {BOX_EDGE_VAR} * fg AS tmax
  FROM (
    SELECT {key} AS {idx_name},
           {_frac_sql(key, 0)} AS f1,
           {_frac_sql(key, 1)} AS f2,
           {_frac_sql(key, 2)} AS f3,
           {_frac_sql(key, 3)} AS f4,
           {_frac_sql(key, 8)} AS fz,
           {_frac_sql(key, 9)} AS fe,
           {_frac_sql(key, 12)} AS ft,
           {_frac_sql(key, 13)} AS fg
    FROM {table}
  )"""


def derive_query_boxes_4d(key: np.ndarray) -> dict[str, np.ndarray]:
    out = derive_query_boxes_3d(key)
    ft = _frac(key, 14)
    fe = _frac(key, 15)
    out["tmin"] = ft * QUERY_SCALE
    out["tmax"] = ft * QUERY_SCALE + QUERY_EDGE_MIN + QUERY_EDGE_VAR * fe
    return out


def query_boxes_4d_sql(table: str, key: str, idx_name: str = "query_id") -> str:
    return f"""
  SELECT {idx_name},
         f1 * {QUERY_SCALE} AS xmin,
         f2 * {QUERY_SCALE} AS ymin,
         fz * {QUERY_SCALE} AS zmin,
         ft * {QUERY_SCALE} AS tmin,
         f1 * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * f3 AS xmax,
         f2 * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * f4 AS ymax,
         fz * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * fe AS zmax,
         ft * {QUERY_SCALE} + {QUERY_EDGE_MIN} + {QUERY_EDGE_VAR} * fg AS tmax
  FROM (
    SELECT {key} AS {idx_name},
           {_frac_sql(key, 4)} AS f1,
           {_frac_sql(key, 5)} AS f2,
           {_frac_sql(key, 6)} AS f3,
           {_frac_sql(key, 7)} AS f4,
           {_frac_sql(key, 10)} AS fz,
           {_frac_sql(key, 11)} AS fe,
           {_frac_sql(key, 14)} AS ft,
           {_frac_sql(key, 15)} AS fg
    FROM {table}
  )"""
