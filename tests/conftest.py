"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def random_boxes(rng, n, edge=0.05, dim=2, dtype=np.float64):
    """Uniform boxes in the unit cube, edge <= `edge` (reference workload
    shape: benchmarks/cpp/workloads.h:45-53)."""
    lo = rng.random((n, dim))
    hi = lo + edge * rng.random((n, dim))
    return np.concatenate([lo, hi], axis=1).astype(dtype)
