"""ONE-PASS constraint suite: validate + both parquet sinks + every wide
constraint's partials inside a single streaming ``map_batches`` operator.

The round-1 suite ran read → validate → ``materialize()`` → (write verdicts
‖ write violations ‖ fused sketch pass).  Overlapping the three tail
consumers helped, but the tail itself stayed a FLAT ~5 s at any CPU count
(three extra Dataset executions, a full object-store materialization, and a
verdict-parquet burst write against one disk) — the single largest
scaling-efficiency loss in the 8→32-CPU protocol (BASELINE.md).

This module removes the tail instead of overlapping it.  One actor-pool
stage does, per zero-copy Arrow batch:

1. span-structure validation (the :class:`ConstraintEvaluator` interpreter);
2. writes the batch's NARROW verdict rows straight to partitioned parquet
   (one file per input block, named by the block's first/last doc_id →
   idempotent under Ray task retries and resumable: a re-run can skip
   blocks whose file already exists);
3. writes the batch's exploded violation rows the same way (only ~10% of
   docs carry violations, so this sink is small);
4. folds the batch into the wide-constraint partials — HyperLogLog over
   ``doc_id`` (uniqueness), KLL over spans-per-doc (drift), and the
   broadcast referential probe of ``media_refs`` against the asset key set
   (``ray.get`` once per ACTOR in ``__init__``, zero-copy from plasma);

and returns ONE summary row (~20 KiB of serialized sketches).  The driver
folds the per-block rows into the suite report — for a 10^6-doc corpus
that is 250 rows ≈ 5 MB through the object store instead of a 1 GB
materialized verdict stream, and at 10^12 docs it is the only shape that
works at all: no mid-pipeline materialization, no burst write, no second
pass over anything.  Disk/object-store output bandwidth is consumed evenly
across the whole run (~60 MB/s here vs a ~900 MB burst), so the write
never serializes behind compute — on a multi-node cluster each node
streams to its own local sink, which is exactly the N→4N-scalable layout
the north rule asks for.

Reference lifecycle parity: read → validate → report per document
(reference src/cmd.rs:104–178) — here per block, with the exit-code fold
(`n_failed`) and the wide-constraint verdicts in one report dict.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from mdvalidate_ray.stages.validate import (
    ConstraintEvaluator,
    explode_violations,
)
from mdvalidate_ray.state.sketches import HyperLogLog, KLLSketch

PARTIAL_SCHEMA = pa.schema([
    ("rows", pa.int64()),
    ("n_passed", pa.int64()),
    ("n_violations", pa.int64()),
    ("n_spans", pa.int64()),
    ("hll", pa.binary()),
    ("kll", pa.binary()),
    ("n_dangling", pa.int64()),
    ("dangling_sample", pa.string()),   # JSON list, ≤10 refs
    ("verdict_file", pa.string()),
    ("violations_file", pa.string()),
    # per-batch phase timings (worker-side seconds; the driver fold sums
    # them into cumulative worker-seconds per phase — NOT wall time)
    ("eval_sec", pa.float64()),
    ("write_sec", pa.float64()),
    ("wide_sec", pa.float64()),
])


# Per-worker-PROCESS state cache for the task-based mode.  Ray reuses
# worker processes across tasks, so a module-level cache gives tasks the
# same setup amortization as an actor pool — without the pool's spin-up
# wave (N actors importing + constructing before the first batch flows),
# which is a FLAT cost that hits the 32-CPU leg of the scaling protocol
# ~5× harder than the 8-CPU leg (same seconds, much shorter run).
# Schema compile is sub-millisecond (measured), so even a cold miss per
# process is free; the asset-key ray.get is a zero-copy plasma read
# cached by ObjectRef.
_PROC_CACHE: dict = {}


def _cached_evaluator(schema_text: str) -> ConstraintEvaluator:
    from mdvalidate_ray.state.proc_cache import get_or_build

    return get_or_build(_PROC_CACHE, ("ev", schema_text),
                        lambda: ConstraintEvaluator(schema_text), keep=4)


def _cached_keys(keys_ref):
    if keys_ref is None:
        return None
    import ray

    from mdvalidate_ray.state.proc_cache import get_or_build

    def build():
        keys = ray.get(keys_ref)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return keys

    return get_or_build(_PROC_CACHE, ("keys", keys_ref.hex()), build,
                        keep=4)


class FusedSuiteWorker:
    """Actor-pool callable: one batch in → verdict/violation files out +
    one partial-summary row.  All per-run state (compiled schema, asset
    key set) is built once per actor in ``__init__``."""

    def __init__(self, schema_text: str, out_dir: str, viol_dir: str,
                 asset_keys_ref=None, hll_p: int = 14, kll_k: int = 200,
                 compression: str = "lz4", skip_existing: bool = False):
        self.ev = ConstraintEvaluator(schema_text)
        self.out_dir = out_dir
        self.viol_dir = viol_dir
        self.hll_p = hll_p
        self.kll_k = kll_k
        self.compression = compression
        self.skip_existing = skip_existing
        if asset_keys_ref is not None:
            import ray

            keys = ray.get(asset_keys_ref)   # zero-copy plasma read, once
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            self.asset_keys = keys
        else:
            self.asset_keys = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _fused_batch(batch, ev=self.ev, asset_keys=self.asset_keys,
                            out_dir=self.out_dir, viol_dir=self.viol_dir,
                            hll_p=self.hll_p, kll_k=self.kll_k,
                            compression=self.compression,
                            skip_existing=self.skip_existing)


def fused_task_batch(batch: pa.Table, *, schema_text: str, out_dir: str,
                     viol_dir: str, asset_keys_ref=None, hll_p: int = 14,
                     kll_k: int = 200, compression: str = "lz4",
                     skip_existing: bool = False) -> pa.Table:
    """Task-pool form of the fused suite batch: per-process caches stand
    in for actor state (see _PROC_CACHE note above)."""
    return _fused_batch(batch, ev=_cached_evaluator(schema_text),
                        asset_keys=_cached_keys(asset_keys_ref),
                        out_dir=out_dir, viol_dir=viol_dir, hll_p=hll_p,
                        kll_k=kll_k, compression=compression,
                        skip_existing=skip_existing)


def _complete_parquet(path: str) -> bool:
    """True only for a file whose parquet footer parses — a task killed
    mid-write leaves a truncated file that must NOT satisfy
    skip_existing."""
    import pyarrow.parquet as pq

    try:
        pq.read_metadata(path)
        return True
    except Exception:
        return False


def _write_atomic(tbl: pa.Table, path: str, compression: str) -> None:
    """Write to a pid-suffixed temp path and rename into place: readers
    (and skip_existing probes) never observe a partial file, and
    concurrent task retries last-write-win instead of interleaving."""
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, compression=compression, use_dictionary=False)
    os.replace(tmp, path)


def _fused_batch(batch: pa.Table, *, ev, asset_keys, out_dir: str,
                 viol_dir: str, hll_p: int, kll_k: int, compression: str,
                 skip_existing: bool) -> pa.Table:
    import time

    if batch.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    t0 = time.monotonic()
    validated = ev(batch)
    t_eval = time.monotonic()

    # --- sinks: one file per input block, content-keyed name ------------
    ids = validated.column("doc_id")
    stem = f"{ids[0].as_py()}-{ids[-1].as_py()}-{validated.num_rows}"
    vfile = os.path.join(out_dir, f"verdicts-{stem}.parquet")
    if not (skip_existing and _complete_parquet(vfile)):
        _write_atomic(
            validated.select(["doc_id", "passed", "captures",
                              "n_spans", "n_violations"]),
            vfile, compression)
    viol = explode_violations(validated)
    viol_file = ""
    if viol.num_rows:
        viol_file = os.path.join(viol_dir, f"violations-{stem}.parquet")
        if not (skip_existing and _complete_parquet(viol_file)):
            _write_atomic(viol, viol_file, compression)
    t_write = time.monotonic()

    # --- wide-constraint partials ----------------------------------------
    hll = HyperLogLog(p=hll_p)
    # straight to an object ndarray — no intermediate Python list hop
    hll.add(ids.drop_null().to_numpy(zero_copy_only=False))
    kll = KLLSketch(k=kll_k).update(
        validated.column("n_spans").cast(pa.float64()).to_numpy(
            zero_copy_only=False))
    n_dangling = 0
    sample: list = []
    if asset_keys is not None:
        refs = validated.column("media_refs")
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        flat = refs.flatten()
        miss = flat.filter(pc.invert(
            pc.is_in(flat, value_set=asset_keys)))
        n_dangling = len(miss)
        sample = miss.slice(0, 10).to_pylist()
    n_passed = pc.sum(pc.cast(validated.column("passed"),
                              pa.int64())).as_py() or 0
    return pa.Table.from_pylist([{
        "rows": validated.num_rows,
        "n_passed": n_passed,
        "n_violations": pc.sum(
            validated.column("n_violations")).as_py() or 0,
        "n_spans": pc.sum(validated.column("n_spans")).as_py() or 0,
        "hll": hll.to_bytes(),
        "kll": kll.to_bytes(),
        "n_dangling": n_dangling,
        "dangling_sample": json.dumps(sample),
        "verdict_file": vfile,
        "violations_file": viol_file,
        "eval_sec": t_eval - t0,
        "write_sec": t_write - t_eval,
        "wide_sec": time.monotonic() - t_write,
    }], schema=PARTIAL_SCHEMA)


def run_fused_suite(docs_ds, schema_text: str, out_dir: str, viol_dir: str,
                    asset_keys=None, *, batch_size: int | None = None,
                    concurrency=None, num_cpus: float = 1.0,
                    hll_p: int = 14, kll_k: int = 200,
                    compression: str = "lz4",
                    skip_existing: bool = False,
                    mode: str = "tasks") -> dict:
    """Run the whole constraint suite in ONE streaming pass.

    Returns the suite report: verdict counts, uniqueness (HLL estimate +
    bound), drift sketch (KLL), referential (dangling count + sample),
    and the written file lists.  ``asset_keys`` is a pyarrow Array (or
    ChunkedArray) of valid asset ids, broadcast once via ``ray.put``;
    ``None`` skips the referential probe.  ``skip_existing=True`` makes a
    re-run resume: blocks whose verdict file already exists skip the
    (re-)write but still fold into the report.

    ``mode="tasks"`` (default) runs the stage as a plain task pool with
    per-worker-process state caches: setup is sub-millisecond here, and a
    task pool has no actor spin-up wave — a flat cost that lands ~5×
    harder on the short high-CPU leg of the N→4N scaling protocol than
    on the long low-CPU leg.  ``mode="actors"`` keeps the fixed actor
    pool (sized via ``concurrency``) for genuinely expensive per-worker
    setup (big models, large dictionaries).
    """
    import ray

    from mdvalidate_ray.schema.compiler import compile_schema

    compile_schema(schema_text)   # driver-side fail-fast on schema errors
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(viol_dir, exist_ok=True)
    keys_ref = ray.put(asset_keys) if asset_keys is not None else None
    fn_kwargs = {
        "schema_text": schema_text, "out_dir": out_dir,
        "viol_dir": viol_dir, "asset_keys_ref": keys_ref,
        "hll_p": hll_p, "kll_k": kll_k, "compression": compression,
        "skip_existing": skip_existing,
    }
    if mode == "tasks":
        partials = docs_ds.map_batches(
            fused_task_batch, fn_kwargs=fn_kwargs,
            batch_size=batch_size, batch_format="pyarrow",
            zero_copy_batch=True, num_cpus=num_cpus,
        ).take_all()
    else:
        if concurrency is None:
            total = int(ray.cluster_resources().get("CPU", 8)) if \
                ray.is_initialized() else 8
            concurrency = max(2, int(total // max(num_cpus, 0.25)) - 2)
        partials = docs_ds.map_batches(
            FusedSuiteWorker,
            fn_constructor_kwargs=fn_kwargs,
            batch_size=batch_size, batch_format="pyarrow",
            zero_copy_batch=True, num_cpus=num_cpus,
            concurrency=concurrency,
        ).take_all()

    merged_hll = HyperLogLog(p=hll_p)
    for r in partials:
        merged_hll.merge(HyperLogLog.from_bytes(r["hll"]))
    merged_kll = KLLSketch(k=kll_k)
    for b in sorted(r["kll"] for r in partials):   # canonical merge order
        merged_kll.merge(KLLSketch.from_bytes(b))
    rows = sum(r["rows"] for r in partials)
    n_passed = sum(r["n_passed"] for r in partials)
    n_dangling = sum(r["n_dangling"] for r in partials)
    sample = [s for r in partials
              for s in json.loads(r["dangling_sample"])][:10]
    est = merged_hll.estimate()
    bound = 4 * merged_hll.rel_error * max(rows, 1)
    return {
        "rows": rows,
        "n_passed": n_passed,
        "n_failed": rows - n_passed,
        "total_violations": sum(r["n_violations"] for r in partials),
        "total_spans": sum(r["n_spans"] for r in partials),
        "uniqueness": {
            "approx_distinct": est,
            "sketch_bound": bound,
            "passed": abs(rows - est) <= bound,
            "verdict": "no_duplicates_at_sketch_resolution",
        },
        "spans_sketch": merged_kll,
        "referential": {"n_dangling": n_dangling, "sample": sample,
                        "passed": n_dangling == 0},
        "verdict_files": [r["verdict_file"] for r in partials],
        "violations_files": [r["violations_file"] for r in partials
                             if r["violations_file"]],
        # cumulative worker-seconds per phase (sum over batches across
        # all workers; phases overlap in wall time)
        "phase_worker_sec": {
            "eval": round(sum(r["eval_sec"] for r in partials), 3),
            "write": round(sum(r["write_sec"] for r in partials), 3),
            "wide": round(sum(r["wide_sec"] for r in partials), 3),
        },
    }
