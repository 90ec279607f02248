#!/usr/bin/env python
"""Cluster job entrypoint for the full validation suite — the form the
north rule's "submitted via ray job submit to fixed-size clusters"
criterion describes.  On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/validate_job.py \
            --input  s3://bucket/corpus/        \
            --assets s3://bucket/assets.parquet \
            --output s3://bucket/verdicts/      \
            --partitions 256

The driver inside the job connects to the cluster it was submitted to
(``ray.init(address="auto")``); in this sandbox it falls back to a local
session so the entrypoint stays runnable end-to-end:

    python jobs/validate_job.py --input /tmp/corpus --assets a.parquet \
        --output /tmp/out --local-cpus 8

The job runs the checkpointed pipeline (``--partitions`` resumable
partition manifests under ``--output``), then folds the per-partition
metrics + sketch states into the global verdict and prints it as one
JSON line — rerunning the same command after a failure skips finished
partitions (the resume contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

# running as `python jobs/validate_job.py` puts jobs/ on sys.path; the
# package lives one level up (ray job submit --working-dir does the same)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="validate_job")
    p.add_argument("--input", required=True,
                   help="corpus parquet dir (spans-shaped documents)")
    p.add_argument("--assets", required=True, help="asset table parquet")
    p.add_argument("--output", required=True,
                   help="output dir (verdicts + manifest; resumable)")
    p.add_argument("--schema", default=None,
                   help="mdschema file (default: flagship schema)")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--local-cpus", type=int, default=None,
                   help="sandbox fallback: local session size when no "
                        "cluster address is available")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", ignore_reinit_error=True)
        except Exception:
            ray.init(address="local",
                     num_cpus=args.local_cpus or os.cpu_count(),
                     include_dashboard=False, logging_level="ERROR")

    import ray.data

    from mdvalidate_ray.corpus import flagship_schema_text
    from mdvalidate_ray.pipelines.checkpoint import (
        global_report,
        run_checkpointed,
    )
    from mdvalidate_ray.stages.referential import check_refs, refs_from_validated

    schema_text = (open(args.schema).read() if args.schema
                   else flagship_schema_text())

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet under {args.input}", file=sys.stderr)
        return 2
    k = min(args.partitions, len(files))
    groups = [files[i::k] for i in range(k)]

    # resume safety: a finished partition is only skipped if its recorded
    # lineage matches today's file assignment — otherwise an input-dir
    # change would silently leave new files unvalidated while the report
    # still claims complete
    from mdvalidate_ray.pipelines.checkpoint import load_manifest

    done = load_manifest(args.output)
    for pid, rec in done.items():
        expected = {"kind": "parquet_files", "files": groups[pid]} \
            if pid < k else None
        if rec.get("lineage") != expected:
            print(f"error: partition {pid} was completed with a different "
                  f"input file set (lineage mismatch) — the input dir "
                  f"changed since the last run; use a fresh --output",
                  file=sys.stderr)
            return 2

    run_checkpointed(
        lambda i: ray.data.read_parquet(groups[i]),
        lambda i: {"kind": "parquet_files", "files": groups[i]},
        k, args.output, schema_text)
    report = global_report(args.output, k)

    # referential integrity off the written verdicts (narrow re-read)
    verdicts = ray.data.read_parquet(
        os.path.join(args.output, "verdicts"),
        columns=["doc_id", "media_refs"])
    assets = ray.data.read_parquet(args.assets)
    n_dangling = check_refs(refs_from_validated(verdicts), assets).count()

    out = {k2: v for k2, v in report.items() if k2 != "partitions"}
    out["n_dangling"] = int(n_dangling)
    print(json.dumps(out))
    ray.shutdown()
    return 0 if (report["complete"] and report["n_violations"] == 0
                 and n_dangling == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
