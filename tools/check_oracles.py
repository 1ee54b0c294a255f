"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf, compare row counts, schemas
and order-insensitive values. Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_arrow(res):
    """Normalize any queries() result to a pyarrow.Table."""
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    if hasattr(res, "to_arrow_refs"):  # ray.data.Dataset
        refs = res.to_arrow_refs()
        tables = ray.get(refs)
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return ray.get(refs[0]) if refs else pa.table({})
        return pa.concat_tables(tables, promote_options="default")
    if hasattr(res, "to_pandas"):
        return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    raise TypeError(type(res))


def _dtype_kind(df: pd.DataFrame, c: str) -> str:
    """Pandas dtype kind — the granularity the driver's value hash is
    sensitive to. Round-1 evidence: int32-vs-int64 and timestamp[s]-vs-[us]
    hashed equal, but DuckDB HUGEINT→decimal128→object vs int64 did not."""
    return df[c].dtype.kind


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # __ray_entry__ is the driver contract at the repo root (not part of
    # the installable package) — resolve the root relative to this file
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # entry() smoke first (what the driver checks at sf0.001);
    # skipped when iterating on specific queries via --only
    if not only:
        try:
            eds = mod.entry()
            n_entry = eds.count() if hasattr(eds, "count") else len(eds)
            print(f"OK   entry(): rows={n_entry}")
        except Exception as e:
            print(f"FAIL entry(): {type(e).__name__}: {e}")

    import time

    qs = mod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
        missing = only - set(qs)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            return 1
    oracles = mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t_start = time.time()
        try:
            got_t = to_arrow(fn(sf_dir))
            got = canon(got_t.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle — rows-only, {time.time() - t_start:.1f}s)")
            continue
        try:
            want_t = con.execute(oracles[name]).fetch_arrow_table()
            want = canon(want_t.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        # dtype-kind compare: a mismatch here is a driver hash fail even
        # when values compare equal below (masked events_* in round 1)
        got_raw, want_raw = got_t.to_pandas(), want_t.to_pandas()
        type_bad = [
            (c, got_raw[c].dtype, want_raw[c].dtype)
            for c in got.columns
            if _dtype_kind(got_raw, c) != _dtype_kind(want_raw, c)
        ]
        if type_bad:
            for c, a, b in type_bad:
                print(f"FAIL {name}: column {c} pandas dtype {a} vs oracle {b}")
            failures += 1
            continue
        # exact value compare (dtype-tolerant)
        eq = True
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                # equal_nan: a NULL/NaN in the same row on both sides is a
                # match (the driver's value-hash sees identical bytes)
                same = np.array_equal(
                    a.astype(np.float64), b.astype(np.float64), equal_nan=True
                )
            else:
                same = np.array_equal(a.astype(str), b.astype(str)) if a.dtype == object else np.array_equal(a, b)
            if not same:
                bad = np.nonzero(~(a == b))[0][:3] if a.shape == b.shape else []
                print(f"FAIL {name}: column {c} differs at rows {bad}")
                eq = False
                break
        if eq:
            print(f"OK   {name}: rows={len(got)} ({time.time() - t_start:.1f}s)")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    rc = main(sf, only=only)
    ray.shutdown()
    sys.exit(1 if rc else 0)
