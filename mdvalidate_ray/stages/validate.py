"""The constraint-evaluation stage: an actor-pool ``map_batches`` transform.

The Ray analog of the reference's single-threaded validator loop
(reference: src/mdschema/validation/validator.rs:59–93): the schema is
compiled ONCE per actor in ``__init__`` (like "parse once, immutable
thereafter", validator.rs:59–62, with regexes compiled per process like the
LazyLock statics in matcher.rs:15–21) and each ``__call__`` validates one
zero-copy Arrow batch of documents.

Per-row work is an explicit tree interpreter — deliberately NOT vectorized:
the reference's repetition semantics are a small NFA over the span sequence
(SURVEY.md §7 "what's hard"), so the batch dimension (not the span
dimension) is where the parallelism lives.  At cluster scale this stage is
embarrassingly parallel: no shuffle, no cross-row state, output rows 1:1
with input rows.
"""

from __future__ import annotations

import json

import pyarrow as pa

from mdvalidate_ray.evaluate.evaluator import evaluate_spans
from mdvalidate_ray.schema.compiler import compile_schema

VIOLATION_STRUCT = pa.struct([
    ("constraint_id", pa.string()),
    ("kind", pa.string()),
    ("expected", pa.string()),
    ("actual", pa.string()),
    ("span_index", pa.int32()),
])

VALIDATED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("passed", pa.bool_()),
    ("captures", pa.string()),
    ("n_spans", pa.int32()),
    ("n_violations", pa.int32()),
    ("violations", pa.list_(VIOLATION_STRUCT)),
    # non-empty media refs carried forward so downstream wide constraints
    # (referential integrity) re-read the small verdicts table instead of
    # re-scanning the corpus
    ("media_refs", pa.list_(pa.string())),
])

VIOLATIONS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("constraint_id", pa.string()),
    ("kind", pa.string()),
    ("expected", pa.string()),
    ("actual", pa.string()),
    ("span_index", pa.int32()),
])


class ConstraintEvaluator:
    """Callable class for ``ds.map_batches(ConstraintEvaluator,
    fn_constructor_kwargs={"schema_text": ...}, concurrency=N,
    batch_format="pyarrow", zero_copy_batch=True)``."""

    def __init__(self, schema_text: str):
        self.compiled = compile_schema(schema_text)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        # field-wise flatten + dict rebuild is ~3x faster than struct
        # to_pylist (measured): one C-level to_pylist per primitive child
        # instead of per-span dict assembly inside Arrow
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        flat = spans_col.flatten()
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        refs = flat.field("media_ref").to_pylist()
        offs = flat.field("offset").to_pylist()
        offsets = spans_col.offsets.to_pylist()
        passed, captures, nspans, nviol, viols, mrefs = [], [], [], [], [], []
        for i in range(len(spans_col)):
            s, e = offsets[i], offsets[i + 1]
            spans = [{"kind": k, "text": t, "media_ref": m, "offset": o}
                     for k, t, m, o in zip(kinds[s:e], texts[s:e],
                                           refs[s:e], offs[s:e])]
            r = evaluate_spans(spans, self.compiled)
            passed.append(r.passed)
            captures.append(
                json.dumps(r.captures, sort_keys=True, separators=(",", ":")))
            nspans.append(len(spans))
            nviol.append(len(r.violations))
            viols.append(r.violations)
            mrefs.append([m for m in refs[s:e] if m])
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.string()),
             pa.array(passed, pa.bool_()),
             pa.array(captures, pa.string()),
             pa.array(nspans, pa.int32()),
             pa.array(nviol, pa.int32()),
             pa.array(viols, pa.list_(VIOLATION_STRUCT)),
             pa.array(mrefs, pa.list_(pa.string()))],
            schema=VALIDATED_SCHEMA)


def explode_violations(batch: pa.Table) -> pa.Table:
    """validated batch → flat violations table (one row per violation).

    Pure Arrow: list-flatten + parent-index take, no Python row loop."""
    viol_col = batch.column("violations")
    if isinstance(viol_col, pa.ChunkedArray):
        viol_col = viol_col.combine_chunks()
    flat = viol_col.flatten()
    if len(flat) == 0:
        return VIOLATIONS_SCHEMA.empty_table()
    parents = pa.compute.list_parent_indices(viol_col)
    doc_ids = batch.column("doc_id").take(parents)
    return pa.Table.from_arrays(
        [doc_ids] + [flat.field(name) for name in
                     ("constraint_id", "kind", "expected", "actual", "span_index")],
        schema=VIOLATIONS_SCHEMA)


def validate_dataset(ds, schema_text: str, *, batch_size: int | None = None,
                     concurrency=None, num_cpus: float = 1.0):
    """documents Dataset → validated Dataset (verdicts + nested violations).

    ``batch_size=None`` (default) evaluates whole blocks — measured ~50%
    faster than re-slicing into fixed batches (no coalescing/copy between
    the read and the actor); pass an int only when block sizes are
    pathological.

    ``concurrency=None`` sizes the pool to ~3/4 of cluster CPUs with a high
    floor (an autoscaling pool starting at 1 ramps too slowly for
    short-to-medium stages) while leaving headroom for the read/write TASK
    operators that share the CPU budget — a pool pinned to every CPU
    starves them and stalls the pipeline.  At a fixed cluster size pass
    ``concurrency=(min, max)`` explicitly per stage."""
    # schema-authoring errors are compile-time: fail on the driver before
    # any data is read (SURVEY.md §2.6; reference errors.rs:191–263)
    compile_schema(schema_text)
    if concurrency is None:
        import ray

        total = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        workers = max(1, int(total // max(num_cpus, 0.25)))
        hi = max(2, workers - 2)
        concurrency = (max(1, min(hi, workers * 3 // 4)), hi)
    return ds.map_batches(
        ConstraintEvaluator,
        fn_constructor_kwargs={"schema_text": schema_text},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        num_cpus=num_cpus,
        concurrency=concurrency,
    )


def violations_dataset(validated):
    """validated Dataset → flat violations Dataset."""
    return validated.map_batches(explode_violations, batch_format="pyarrow",
                                 zero_copy_batch=True)
