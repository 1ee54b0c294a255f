"""The ``python -m python_prtree_ray.job`` batch-job contract.

North rule: "launched via ray job submit … per-partition lineage records
and metrics, resumable from checkpoint at partition granularity". The
CLI subprocess test proves the module is submittable exactly as a Ray
job would exec it; the in-process tests pin the manifest/metrics schema
and the resume-skips-finished-partitions behavior.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _manifest(out):
    with open(os.path.join(out, "manifest.json")) as fh:
        return json.load(fh)


def _metrics(out):
    with open(os.path.join(out, "metrics.json")) as fh:
        return json.load(fh)


def test_job_cli_subprocess(tmp_path):
    """One real ``python -m python_prtree_ray.job`` invocation: exit 0,
    manifest with per-partition lineage, job metrics.json, readable
    partitioned parquet output."""
    out = str(tmp_path / "job_out")
    proc = subprocess.run(
        [sys.executable, "-m", "python_prtree_ray.job",
         "--pipeline", "tile_points", "--sf-dir", SF, "--output", out,
         "--n-parts", "8"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = _metrics(out)
    assert report["status"] == "ok"
    assert report["pipeline"] == "tile_points"
    assert report["total_rows"] > 0
    assert report["wall_secs"] > 0
    man = _manifest(out)
    assert man["kind"] == "job"
    assert "stage_stats" in man["metrics"]  # Ray per-stage execution report
    for entry in man["partitions"].values():
        # per-partition lineage record: file, rows, bytes, checksum, secs
        assert entry["status"] == "done"
        assert entry["rows"] >= 0
        assert "checksum" in entry and "secs" in entry
        assert os.path.exists(os.path.join(out, entry["file"]))
    # rollup must agree with the lineage entries
    assert report["total_rows"] == sum(
        e["rows"] for e in man["partitions"].values()
    )


def test_job_config_file_and_resume(ray_session, tmp_path):
    """run_job via a JSON config; a second resumed run skips every
    finished partition (files untouched, contents identical)."""
    from python_prtree_ray.job import run_job

    out = str(tmp_path / "job_out")
    cfg_path = tmp_path / "job.json"
    cfg = {"pipeline": "dedup_exact", "sf_dir": SF, "output": out,
           "n_parts": 8}
    cfg_path.write_text(json.dumps(cfg))

    report1 = run_job(json.loads(cfg_path.read_text()))
    assert report1["status"] == "ok" and report1["total_rows"] > 0
    man1 = _manifest(out)
    files = {
        e["file"]: os.path.getmtime(os.path.join(out, e["file"]))
        for e in man1["partitions"].values() if e["file"]
    }
    assert files, "expected at least one written partition"

    report2 = run_job(json.loads(cfg_path.read_text()))
    man2 = _manifest(out)
    # resume: identical partition set + lineage, no file rewritten
    assert {k: (v["rows"], v["checksum"]) for k, v in man1["partitions"].items()} == \
           {k: (v["rows"], v["checksum"]) for k, v in man2["partitions"].items()}
    for f, mtime in files.items():
        assert os.path.getmtime(os.path.join(out, f)) == mtime, f
    assert report2["total_rows"] == report1["total_rows"]


def test_job_no_resume_rewrites(ray_session, tmp_path):
    from python_prtree_ray.job import run_job

    out = str(tmp_path / "job_out")
    cfg = {"pipeline": "dedup_exact", "sf_dir": SF, "output": out,
           "n_parts": 4}
    r1 = run_job(cfg)
    man1 = _manifest(out)
    r2 = run_job({**cfg, "resume": False})
    man2 = _manifest(out)
    assert r2["total_rows"] == r1["total_rows"]
    assert {k: v["checksum"] for k, v in man1["partitions"].items()} == \
           {k: v["checksum"] for k, v in man2["partitions"].items()}


def test_job_resume_refuses_mismatched_checkpoint(ray_session, tmp_path):
    """Resuming against a checkpoint written by a DIFFERENT job config
    (pipeline or n_parts) must hard-error instead of silently dropping
    rows whose partition ids the old run already marked done."""
    import pytest

    from python_prtree_ray.job import run_job

    out = str(tmp_path / "job_out")
    base = {"pipeline": "dedup_exact", "sf_dir": SF, "output": out,
            "n_parts": 4}
    run_job(base)

    with pytest.raises(ValueError, match="resume mismatch"):
        run_job({**base, "pipeline": "token_stats"})
    with pytest.raises(ValueError, match="resume mismatch"):
        run_job({**base, "n_parts": 8})

    # resume=False against the same dir is the sanctioned overwrite path
    r = run_job({**base, "pipeline": "token_stats", "resume": False})
    assert r["status"] == "ok" and r["total_rows"] > 0


def test_job_partition_invariance(ray_session, tmp_path):
    """Same pipeline, different n_parts → same total rows and same
    xor-of-checksums is NOT guaranteed across layouts, but reading back
    the partitions must reproduce the identical row multiset."""
    import pyarrow.compute as pc

    from python_prtree_ray.job import run_job
    from python_prtree_ray.state.manifest import read_partitioned

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    cfg = {"pipeline": "dedup_exact", "sf_dir": SF}
    run_job({**cfg, "output": a, "n_parts": 4})
    run_job({**cfg, "output": b, "n_parts": 16})
    ta = read_partitioned(a).take_all()
    tb = read_partitioned(b).take_all()
    key = sorted(ta[0].keys())
    assert sorted(tuple(r[k] for k in key) for r in ta) == \
           sorted(tuple(r[k] for k in key) for r in tb)


def test_job_errors(ray_session, tmp_path):
    from python_prtree_ray.job import run_job

    with pytest.raises(ValueError, match="unknown pipeline"):
        run_job({"pipeline": "nope", "output": str(tmp_path / "x")})
    with pytest.raises(ValueError, match="requires"):
        run_job({"pipeline": "dedup_exact"})
    with pytest.raises(ValueError, match="partition_by"):
        run_job({"pipeline": "dedup_exact", "sf_dir": SF,
                 "output": str(tmp_path / "y"), "partition_by": "no_such"})
