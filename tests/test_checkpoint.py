"""FIXTURES.md B7: kill after k partitions, resume from checkpoints, global
output identical to an uninterrupted run."""

import json
import os

import pytest

from mdvalidate_ray.corpus import flagship_schema_text
from mdvalidate_ray.pipelines.checkpoint import (
    global_report,
    load_manifest,
    run_checkpointed,
)

N_DOCS = 240
N_PARTS = 6


def _slice(k, per):
    import ray.data

    from mdvalidate_ray.corpus import documents_batch

    ds = ray.data.range(per, override_num_blocks=2)
    start = k * per
    return ds.map_batches(
        lambda b: documents_batch(b["id"] + start, N_DOCS),
        batch_format="numpy")


def _lineage(k):
    per = N_DOCS // N_PARTS
    return {"kind": "synthetic_range", "start": k * per, "end": (k + 1) * per}


def _read_all_verdicts(out_dir):
    import ray.data

    ds = ray.data.read_parquet(os.path.join(out_dir, "verdicts"))
    rows = sorted(
        (r["doc_id"], r["passed"], r["captures"], r["n_violations"])
        for r in ds.take_all())
    return rows


def test_b7_resume_equals_uninterrupted(ray_session, tmp_path):
    schema = flagship_schema_text()
    uninterrupted = str(tmp_path / "full")
    recs = run_checkpointed(lambda k: _slice(k, N_DOCS // N_PARTS), _lineage,
                            N_PARTS, uninterrupted, schema)
    assert len(recs) == N_PARTS

    # simulated failure: only 2 partitions complete
    resumed = str(tmp_path / "resumed")
    partial = run_checkpointed(lambda k: _slice(k, N_DOCS // N_PARTS),
                               _lineage, N_PARTS, resumed, schema,
                               max_partitions=2)
    assert len(partial) == 2
    assert len(load_manifest(resumed)) == 2
    report_partial = global_report(resumed, N_PARTS)
    assert not report_partial["complete"]

    # resume: remaining 4 partitions run; the 2 finished ones are skipped
    resumed_recs = run_checkpointed(lambda k: _slice(k, N_DOCS // N_PARTS),
                                    _lineage, N_PARTS, resumed, schema)
    assert len(resumed_recs) == N_PARTS

    assert _read_all_verdicts(resumed) == _read_all_verdicts(uninterrupted)

    ra = global_report(resumed, N_PARTS)
    rb = global_report(uninterrupted, N_PARTS)
    ra_parts, rb_parts = ra.pop("partitions"), rb.pop("partitions")
    assert ra == rb
    assert ra_parts == rb_parts


def test_manifest_carries_lineage_and_metrics(ray_session, tmp_path):
    out = str(tmp_path / "m")
    run_checkpointed(lambda k: _slice(k, N_DOCS // N_PARTS), _lineage,
                     2, out, flagship_schema_text())
    with open(os.path.join(out, "manifest.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 2
    for rec in recs:
        assert rec["lineage"]["kind"] == "synthetic_range"
        assert rec["rows"] == N_DOCS // N_PARTS
        assert rec["status"] == "done"
        assert rec["hll"] and rec["kll"]
        assert rec["n_passed"] + rec["n_violations"] >= rec["rows"] * 0.9


def test_job_entrypoint_runs_and_resumes(ray_session, tmp_path):
    """jobs/validate_job.py — the ray-job-submit entrypoint — must run the
    checkpointed suite, report closed-form verdict counts, and skip
    finished partitions on re-run."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq
    import ray

    from mdvalidate_ray.corpus import assets_table, ray_documents

    corpus = tmp_path / "corpus"
    out = tmp_path / "out"
    ray_documents(1000, override_num_blocks=4).write_parquet(str(corpus))
    pq.write_table(assets_table(1000), str(tmp_path / "assets.parquet"))

    from pathlib import Path

    job = Path(__file__).resolve().parents[1] / "jobs" / "validate_job.py"
    cmd = [sys.executable, str(job),
           "--input", str(corpus), "--assets",
           str(tmp_path / "assets.parquet"),
           "--output", str(out), "--partitions", "2", "--local-cpus", "4"]
    p1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    rep = json.loads(p1.stdout.strip().splitlines()[-1])
    assert rep["complete"] and rep["rows"] == 1000
    assert rep["n_failed"] == 100          # closed form: i % 10 == 3
    assert p1.returncode == 1              # violations present
    p2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    rep2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert rep2 == rep                     # resume: identical report


def test_job_chaos_kill_midrun_resume_equals_fresh(ray_session, tmp_path):
    """B7 at JOB scope: SIGKILL the validate_job subprocess after the
    manifest shows the first partition done (a real mid-run crash, not
    a simulated max_partitions cut), re-run the same command to
    completion, and prove the resumed output equals a fresh
    uninterrupted run — identical global report, identical sorted
    verdict rows, identical per-partition manifest lineage+metrics."""
    import json
    import signal
    import subprocess
    import sys
    import time
    from pathlib import Path

    import pyarrow.parquet as pq
    import ray.data

    from mdvalidate_ray.corpus import assets_table, ray_documents

    corpus = tmp_path / "corpus"
    ray_documents(1500, override_num_blocks=6).write_parquet(str(corpus))
    pq.write_table(assets_table(1500), str(tmp_path / "assets.parquet"))
    job = Path(__file__).resolve().parents[1] / "jobs" / "validate_job.py"

    def cmd(out):
        return [sys.executable, str(job), "--input", str(corpus),
                "--assets", str(tmp_path / "assets.parquet"),
                "--output", str(out), "--partitions", "6",
                "--local-cpus", "4"]

    out_kill = tmp_path / "killed"
    manifest = out_kill / "manifest.jsonl"
    proc = subprocess.Popen(cmd(out_kill), stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE)
    killed_mid = False
    deadline = time.time() + 240
    while time.time() < deadline and proc.poll() is None:
        if manifest.exists():
            lines = [l for l in manifest.read_text().splitlines() if l]
            if lines:                     # >=1 partition durable: crash
                if len(lines) < 6:
                    killed_mid = True
                proc.send_signal(signal.SIGKILL)
                break
        time.sleep(0.05)
    proc.wait(timeout=60)
    assert killed_mid, "job finished before the kill landed; " \
        "raise partition count"
    n_done = len([l for l in manifest.read_text().splitlines() if l])
    assert 1 <= n_done < 6

    # resume after the crash: finished partitions skip, the rest run
    pr = subprocess.run(cmd(out_kill), capture_output=True, text=True,
                        timeout=300)
    rep_resumed = json.loads(pr.stdout.strip().splitlines()[-1])

    # fresh uninterrupted run for the equality target
    out_full = tmp_path / "full"
    pf = subprocess.run(cmd(out_full), capture_output=True, text=True,
                        timeout=300)
    rep_full = json.loads(pf.stdout.strip().splitlines()[-1])

    assert rep_resumed == rep_full and rep_full["complete"]
    assert rep_full["rows"] == 1500

    def verdict_rows(out):
        ds = ray.data.read_parquet(str(Path(out) / "verdicts"))
        return sorted((r["doc_id"], r["passed"], r["captures"],
                       r["n_violations"]) for r in ds.take_all())

    assert verdict_rows(out_kill) == verdict_rows(out_full)

    def manifest_recs(out):
        recs = [json.loads(l) for l in
                (Path(out) / "manifest.jsonl").read_text().splitlines()
                if l]
        keep = ("partition_id", "lineage", "rows", "status",
                "n_passed", "n_violations", "hll", "kll")
        return sorted(({k: r.get(k) for k in keep} for r in recs),
                      key=lambda r: r["partition_id"])

    assert manifest_recs(out_kill) == manifest_recs(out_full)
