"""Per-partition checkpoint / resume (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

The reference's only resume machinery is intra-document
(``farthest_reached_pos``, reference validator.rs:38, 161–185).  The batch
analog is per-*partition*: the driver splits the input into K partitions
(index ranges for the synthetic corpus, file groups for parquet/lance), runs
the validation pipeline partition-by-partition, and appends one manifest
record per finished partition:

``{partition_id, lineage, rows, n_passed, n_violations, sketches
(serialized HLL of doc_id + KLL of span counts), wall_sec, status}``

Output parquet is partition-keyed (``out_dir/verdicts/part=K/``), so a
retried partition overwrites its own directory idempotently and a resumed
run skips every partition already in the manifest — matching FIXTURES.md B7
(byte-identical global output vs an uninterrupted run).

Each partition run is itself a streaming Ray Data pipeline; partitions
exist only to bound the blast radius of a failure, not to limit
parallelism (a partition's blocks still fan out across the cluster).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import time
from typing import Callable

from mdvalidate_ray.stages.validate import validate_dataset
from mdvalidate_ray.state.sketches import HyperLogLog, KLLSketch

MANIFEST = "manifest.jsonl"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def load_manifest(out_dir: str) -> dict[int, dict]:
    """partition_id → newest record with status=done."""
    done: dict[int, dict] = {}
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("status") == "done":
                done[rec["partition_id"]] = rec
    return done


def _append_manifest(out_dir: str, rec: dict) -> None:
    with open(_manifest_path(out_dir), "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")


def run_checkpointed(
    make_partition: Callable[[int], "object"],
    lineage: Callable[[int], dict],
    num_partitions: int,
    out_dir: str,
    schema_text: str,
    *,
    batch_size: int | None = None,
    concurrency=None,
    max_partitions: int | None = None,
) -> list[dict]:
    """Run (or resume) the checkpointed validation suite.

    ``make_partition(k)`` returns partition k's documents Dataset;
    ``lineage(k)`` returns its JSON-serializable lineage record (index
    range / input files).  ``max_partitions`` stops early after that many
    *newly processed* partitions — the test hook for simulated failure.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    records = [done[k] for k in sorted(done)]
    processed = 0
    for k in range(num_partitions):
        if k in done:
            continue
        if max_partitions is not None and processed >= max_partitions:
            break
        t0 = time.monotonic()
        part_dir = os.path.join(out_dir, "verdicts", f"part={k}")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)  # idempotent retry: clobber partials
        os.makedirs(part_dir, exist_ok=True)

        ds = make_partition(k)
        validated = validate_dataset(ds, schema_text, batch_size=batch_size,
                                     concurrency=concurrency)
        validated.write_parquet(part_dir)

        # per-partition metrics + sketch states from the (column-pruned)
        # verdicts just written — cheap re-read, no revalidation
        import ray.data

        back = ray.data.read_parquet(
            part_dir, columns=["doc_id", "passed", "n_spans", "n_violations"])
        hll = HyperLogLog()
        kll = KLLSketch()
        rows = n_passed = n_viol = 0
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in back.iter_batches(batch_format="pyarrow", batch_size=8192):
            rows += len(b)
            n_passed += int(pc.sum(pc.cast(b.column("passed"),
                                           pa.int64())).as_py() or 0)
            n_viol += int(pc.sum(b.column("n_violations")).as_py() or 0)
            hll.add(b.column("doc_id").to_pylist())
            kll.update(b.column("n_spans").to_numpy(zero_copy_only=False))
        rec = {
            "partition_id": k,
            "lineage": lineage(k),
            "rows": rows,
            "n_passed": n_passed,
            "n_violations": n_viol,
            "hll": base64.b64encode(hll.to_bytes()).decode(),
            "kll": base64.b64encode(kll.to_bytes()).decode(),
            "wall_sec": round(time.monotonic() - t0, 3),
            "status": "done",
        }
        _append_manifest(out_dir, rec)
        records.append(rec)
        processed += 1
    return sorted(records, key=lambda r: r["partition_id"])


def global_report(out_dir: str, num_partitions: int) -> dict:
    """Merge the manifest into the run-level verdict: per-partition
    pass/fail + merged sketches (the cross-partition fold is sketch-merge,
    not a data shuffle)."""
    done = load_manifest(out_dir)
    complete = len(done) == num_partitions
    hll = HyperLogLog()
    kll = KLLSketch()
    rows = n_passed = n_viol = 0
    partitions = []
    for k in sorted(done):
        rec = done[k]
        rows += rec["rows"]
        n_passed += rec["n_passed"]
        n_viol += rec["n_violations"]
        hll.merge(HyperLogLog.from_bytes(base64.b64decode(rec["hll"])))
        kll.merge(KLLSketch.from_bytes(base64.b64decode(rec["kll"])))
        partitions.append({
            "partition_id": k, "rows": rec["rows"],
            "n_passed": rec["n_passed"],
            "n_violations": rec["n_violations"],
            "passed": rec["n_violations"] == 0,
        })
    est_distinct = hll.estimate()
    dup_suspect = bool(complete and rows > 0
                       and abs(rows - est_distinct) > 4 * hll.rel_error * rows)
    return {
        "complete": complete,
        "n_partitions_done": len(done),
        "rows": rows,
        "n_passed": n_passed,
        "n_failed": rows - n_passed,
        "n_violations": n_viol,
        "approx_distinct_doc_id": est_distinct,
        "doc_id_duplicates_suspected": dup_suspect,
        "spans_per_doc_quantiles": kll.quantiles([0.1, 0.5, 0.9]),
        "partitions": partitions,
    }
