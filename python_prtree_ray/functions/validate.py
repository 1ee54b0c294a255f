"""Vectorized input validation — parity with the reference's box checks.

Reference semantics (``include/prtree/core/prtree.h:151-185``):
reject NaN/Inf coordinates; enforce ``min <= max`` per axis; optionally
reject subnormal (denormal) floats (toggle at ``prtree.h:996-1008``,
defaults at ``prtree.h:75-78``). Shape checks mirror
``prtree.h:194-201,296-301,596-605``.

Here each check is a NumPy predicate over a whole Arrow batch; the first
offending batch raises ``ValueError`` with a reference-style message.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PrecisionConfig:
    """Engine-wide precision knobs (reference defaults, ``prtree.h:75-78``).

    The adaptive epsilon mirrors ``prtree.h:81-116``:
    ``eps = clamp(max_extent*rel + abs, 10*machine_eps, 0.01*max_extent)``;
    it governs the *candidate search* slack for incremental inserts — never
    the intersection test itself, which stays exact closed-interval.
    """

    relative_epsilon: float = 1e-6
    absolute_epsilon: float = 1e-8
    adaptive_epsilon: bool = True
    subnormal_detection: bool = True

    def epsilon_for(self, max_extent: float, dtype=np.float64) -> float:
        machine = float(np.finfo(dtype).eps)
        if not self.adaptive_epsilon:
            return self.absolute_epsilon
        eps = max_extent * self.relative_epsilon + self.absolute_epsilon
        lo = 10.0 * machine
        hi = 0.01 * max_extent if max_extent > 0 else lo
        return float(min(max(eps, lo), max(hi, lo)))


def validate_boxes(
    boxes: np.ndarray, config: PrecisionConfig | None = None
) -> None:
    """Raise ValueError on the first invalid box batch; no-op when clean."""
    config = config or PrecisionConfig()
    b = np.asarray(boxes)
    if b.ndim != 2 or b.shape[1] % 2 != 0:
        raise ValueError(f"boxes must have shape (n, 2*D); got {b.shape}")
    d = b.shape[1] // 2
    if not np.issubdtype(b.dtype, np.floating):
        b = b.astype(np.float64)
    if np.isnan(b).any():
        raise ValueError("Box coordinates must not contain NaN")
    if np.isinf(b).any():
        raise ValueError("Box coordinates must not contain Inf")
    bad = b[:, :d] > b[:, d:]
    if bad.any():
        i = int(np.nonzero(bad.any(axis=1))[0][0])
        raise ValueError(f"Box min must be <= max on every axis (row {i})")
    if config.subnormal_detection:
        tiny = np.finfo(b.dtype).tiny
        sub = (b != 0.0) & (np.abs(b) < tiny)
        if sub.any():
            raise ValueError("Subnormal coordinate values are not allowed")


def validate_points(points: np.ndarray) -> None:
    p = np.asarray(points)
    if p.ndim != 2:
        raise ValueError(f"points must have shape (n, D); got {p.shape}")
    if np.isnan(p).any() or np.isinf(p).any():
        raise ValueError("Point coordinates must be finite")


def validated_boxes_dataset(ds, config: PrecisionConfig | None = None):
    """Wrap a boxes Dataset with a pass-through validation stage: every
    batch is checked (NaN/Inf, min<=max, optional subnormals — reference
    build-time validation, ``prtree.h:151-185``) and returned unchanged;
    the first bad batch aborts the pipeline with the same ValueError the
    kernel raises."""
    import numpy as np
    import pyarrow as pa

    def check(tbl: pa.Table) -> pa.Table:
        cols = [c for c in ("xmin", "ymin", "zmin", "tmin", "xmax", "ymax", "zmax", "tmax") if c in tbl.column_names]
        half = len(cols) // 2
        b = np.stack(
            [tbl.column(c).to_numpy(zero_copy_only=False) for c in cols], axis=1
        )
        # reorder to [mins..., maxs...] as validate_boxes expects
        validate_boxes(b[:, list(range(half)) + list(range(half, 2 * half))], config)
        return tbl

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
