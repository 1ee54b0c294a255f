"""Format-dispatching table IO — Lance-first, parquet fallback.

The north-rule input is "Lance tables of interleaved text+media
documents". This sandbox ships no ``lance``/``pylance`` package, so the
reader dispatches at runtime: a ``.lance`` dataset directory is read via
``ray.data.read_lance`` when the lance integration is importable,
otherwise a clear error explains the gap; parquet paths always work.
Pipelines depend only on :func:`read_table`, so a Lance deployment is a
zero-code-change switch.
"""

from __future__ import annotations

import os

import ray
from ray.data import Dataset


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except Exception:
        return False


def read_table(path: str, columns: list[str] | None = None, **kw) -> Dataset:
    """Read a table by extension — every path returns a lazy streaming
    Dataset:

    - ``*.lance`` → Lance dataset (column projection pushed down);
    - ``*.csv`` → ``read_csv`` (projection pushed to the Arrow CSV
      PARSER via ``ConvertOptions(include_columns=...)`` — unused
      columns are never materialized; the bytes are still scanned, an
      inherent cost of row-major text formats);
    - ``*.json`` / ``*.jsonl`` → ``read_json`` (projection applied
      post-read via ``select_columns``: the Arrow JSON parser has no
      column selection, so full objects are parsed then pruned — a
      documented limitation of the format, not of this reader; convert
      to parquet/lance for scan-heavy workloads);
    - anything else → parquet (projection pushed to the row groups —
      only the requested columns leave storage).
    """
    p = path.rstrip("/")
    if p.endswith(".lance"):
        if not lance_available():
            raise ImportError(
                "lance is not installed in this environment; convert the "
                "dataset to parquet or install pylance (read_table falls "
                "back to parquet automatically for .parquet paths)"
            )
        return ray.data.read_lance(path, columns=columns, **kw)
    if p.endswith(".csv"):
        if columns and "convert_options" not in kw:
            from pyarrow import csv as pacsv

            kw = dict(kw)
            kw["convert_options"] = pacsv.ConvertOptions(include_columns=columns)
            return ray.data.read_csv(path, **kw)
        ds = ray.data.read_csv(path, **kw)
        return ds.select_columns(columns) if columns else ds
    if p.endswith((".json", ".jsonl")):
        ds = ray.data.read_json(path, **kw)
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns, **kw)


def write_table(ds: Dataset, path: str, **kw) -> None:
    """Write by extension: ``*.lance`` → Lance dataset, else partitioned
    parquet directory (the resumable layout lives in state/manifest.py)."""
    if path.rstrip("/").endswith(".lance"):
        if not lance_available():
            raise ImportError("lance is not installed in this environment")
        ds.write_lance(path, **kw)
        return
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path, **kw)
