"""``ray job submit`` entry point — run a named pipeline as a batch job.

North-rule surface: "launched via ray job submit on fixed-size clusters…
execution is streaming with per-partition lineage records and metrics,
resumable from checkpoint at partition granularity". On a real cluster:

    ray job submit --working-dir . -- \
        python -m python_prtree_ray.job job.yaml

and locally (Ray auto-inits, or attaches to RAY_ADDRESS):

    python -m python_prtree_ray.job --pipeline spatial_join \
        --sf-dir /root/testdata/sf0.001 --output /tmp/out

The job:

1. resolves ``pipeline`` from the engine's query registry (the same 100-
   query surface ``__ray_entry__.queries()`` exposes to the driver);
2. runs it over ``sf_dir`` as a streaming Dataset;
3. writes the result as partitioned parquet via
   :func:`..state.manifest.write_partitioned` — one file per stable
   content-hash partition, each with a lineage record (rows, bytes,
   order-independent checksum, wall seconds) plus Ray's per-stage
   execution stats in ``manifest.json``;
4. writes a job-level ``metrics.json`` (pipeline, input, wall time, row
   totals, status) and exits 0 on success / nonzero on any failure.

A re-run against the same output dir RESUMES: partitions already marked
done in the manifest are filtered out of the result stream before any
file lands, so finished work is never rewritten (``--no-resume`` forces
a fresh run). The partition key depends only on row content, never on
parallelism, so resume is safe across cluster sizes.

Config file (JSON or YAML) keys mirror the flags::

    pipeline: spatial_join      # required; or "entry" for the flagship
    sf_dir: /root/testdata/sf0.001
    output: /tmp/job_out        # required
    n_parts: 64                 # output hash partitions
    partition_by: query_id      # optional; default = first int column
    resume: true

This module is a CLI: unlike the library it OWNS the Ray session (guarded
``ray.init`` — under ``ray job submit`` the session already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .functions.buckets import bucket_of
from .state import manifest as mf

N_PARTS_DEFAULT = 64


# ------------------------------------------------------------- registry


def _registry() -> dict:
    """The engine's named-pipeline registry = the driver query surface.

    ``__ray_entry__`` lives at the repo root (the ``ray job submit``
    working dir); when the job is launched from elsewhere, fall back to
    the package's parent directory.
    """
    try:
        import __ray_entry__ as e
    except ImportError:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if root not in sys.path:
            sys.path.insert(0, root)
        import __ray_entry__ as e
    reg = dict(e.queries())
    reg["entry"] = lambda sf: e.entry()
    return reg


def _as_dataset(result) -> Dataset:
    """Pipelines return Dataset | pandas | pyarrow; jobs write Datasets."""
    if isinstance(result, Dataset):
        return result
    if isinstance(result, pa.Table):
        return ray.data.from_arrow(result)
    # pandas (duck-typed to avoid a hard import)
    return ray.data.from_arrow(pa.Table.from_pandas(result, preserve_index=False))


# --------------------------------------------------------- partitioning


def _pick_partition_col(schema: pa.Schema, requested: str | None) -> str | None:
    if requested:
        if requested not in schema.names:
            raise ValueError(
                f"partition_by={requested!r} not in result columns {schema.names}"
            )
        return requested
    for name, typ in zip(schema.names, schema.types):
        if pa.types.is_integer(typ):
            return name
    for name, typ in zip(schema.names, schema.types):
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return name
    return None  # single-partition fallback (tiny aggregate results)


def _partition_fn(col: str | None, n_parts: int):
    """Stable content-hash partition of each row — same row, same
    partition at any parallelism, which is what makes resume safe."""
    if col is None:
        return lambda tbl: np.zeros(tbl.num_rows, dtype=np.int64)

    def fn(tbl: pa.Table) -> np.ndarray:
        c = tbl.column(col)
        if pa.types.is_integer(c.type):
            keys = c.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            from .pipelines.text import hash_str_array

            keys = hash_str_array(c.combine_chunks())
        return bucket_of(keys, n_parts)

    return fn


# ----------------------------------------------------------------- job


def _check_resume_compatible(
    output: str, pipeline: str, sf_dir: str, n_parts: int, col: str | None
) -> None:
    """Refuse to resume against a checkpoint written by a different job.

    The manifest's done-partition filter silently drops rows whose
    partition id is already marked done — safe only when pipeline,
    sf_dir, n_parts, and partition key all match the prior run (a
    different pipeline or row->partition mapping would mix outputs and
    lose rows). Mismatch => hard error telling the caller to pass
    resume=False (which wipes the checkpoint) or a fresh output dir."""
    prev = mf._load_manifest(output)
    if not prev.get("partitions"):
        return
    expected = {
        "pipeline": pipeline,
        "sf_dir": sf_dir,
        "n_parts": n_parts,
        "partition_key": col,
    }
    for field, want in expected.items():
        have = prev.get(field)
        if have is not None and have != want:
            raise ValueError(
                f"resume mismatch at {output!r}: checkpoint was written with "
                f"{field}={have!r}, this job has {field}={want!r}. Pass "
                f"resume=false to overwrite, or use a fresh output dir."
            )


def run_job(cfg: dict) -> dict:
    """Execute one configured job; returns the job report (also written
    to ``<output>/metrics.json``). Raises on any failure — the CLI turns
    that into a nonzero exit."""
    pipeline = cfg.get("pipeline")
    output = cfg.get("output")
    if not pipeline or not output:
        raise ValueError("job config requires 'pipeline' and 'output'")
    sf_dir = cfg.get("sf_dir", "/root/testdata/sf0.001")
    n_parts = int(cfg.get("n_parts", N_PARTS_DEFAULT))
    resume = bool(cfg.get("resume", True))
    partition_by = cfg.get("partition_by")

    reg = _registry()
    if pipeline not in reg:
        known = ", ".join(sorted(reg))
        raise ValueError(f"unknown pipeline {pipeline!r}; known: {known}")

    t0 = time.time()
    ds = _as_dataset(reg[pipeline](sf_dir))
    col = _pick_partition_col(ds.schema(), partition_by)
    if resume:
        _check_resume_compatible(output, pipeline, sf_dir, n_parts, col)
    man = mf.write_partitioned(
        ds,
        output,
        _partition_fn(col, n_parts),
        coarse_res=0,
        resume=resume,
        extra={"kind": "job", "pipeline": pipeline, "sf_dir": sf_dir,
               "n_parts": n_parts, "partition_key": col},
    )
    wall = time.time() - t0
    report = {
        "status": "ok",
        "pipeline": pipeline,
        "sf_dir": sf_dir,
        "output": output,
        "partition_key": col,
        "n_parts": n_parts,
        "resume": resume,
        "wall_secs": wall,
        "partitions_done": man["metrics"]["n_partitions"],
        "total_rows": man["metrics"]["total_rows"],
        "total_bytes": man["metrics"]["total_bytes"],
        "finished_at": time.time(),
    }
    _write_report(output, report)
    return report


def _write_report(output: str, report: dict) -> None:
    os.makedirs(output, exist_ok=True)
    tmp = os.path.join(output, "metrics.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(output, "metrics.json"))


# ----------------------------------------------------------------- CLI


def _load_config(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        return yaml.safe_load(text)
    return json.loads(text)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m python_prtree_ray.job",
        description="Run a named engine pipeline as a resumable batch job.",
    )
    ap.add_argument("config", nargs="?", help="JSON/YAML job config file")
    ap.add_argument("--pipeline", help="pipeline name (overrides config)")
    ap.add_argument("--sf-dir", dest="sf_dir", help="input table directory")
    ap.add_argument("--output", help="output directory (parquet + manifest)")
    ap.add_argument("--n-parts", dest="n_parts", type=int)
    ap.add_argument("--partition-by", dest="partition_by")
    ap.add_argument("--no-resume", action="store_true",
                    help="discard any existing checkpoint at --output")
    ap.add_argument("--list", action="store_true", dest="list_pipelines",
                    help="list pipeline names and exit")
    args = ap.parse_args(argv)

    if args.list_pipelines:
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     ignore_reinit_error=True)
        print("\n".join(sorted(_registry())))
        return 0

    cfg: dict = {}
    if args.config:
        cfg = _load_config(args.config)
    for key in ("pipeline", "sf_dir", "output", "n_parts", "partition_by"):
        v = getattr(args, key)
        if v is not None:
            cfg[key] = v
    if args.no_resume:
        cfg["resume"] = False

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True)
    try:
        report = run_job(cfg)
    except Exception as exc:  # job contract: nonzero exit + failed report
        if cfg.get("output"):
            try:
                _write_report(cfg["output"], {
                    "status": "failed",
                    "pipeline": cfg.get("pipeline"),
                    "error": f"{type(exc).__name__}: {exc}",
                    "finished_at": time.time(),
                })
            except OSError:
                pass
        print(f"job failed: {type(exc).__name__}: {exc}", file=sys.stderr)
        raise SystemExit(1)
    print(json.dumps(report, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
