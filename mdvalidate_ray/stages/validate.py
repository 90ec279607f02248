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
        return evaluate_batch(batch, self.compiled)


def evaluate_batch(batch: pa.Table, compiled) -> pa.Table:
    """Validate one zero-copy Arrow batch against a compiled schema —
    the shared kernel behind both the actor pool
    (:class:`ConstraintEvaluator`) and the warm-task tier of
    :func:`validate_dataset`."""
    import numpy as np
    import pyarrow.compute as pc

    doc_ids = batch.column("doc_id").to_pylist()
    # field-wise flatten + dict rebuild is ~3x faster than struct
    # to_pylist (measured); on top of that (also measured, ~2.5x on
    # the non-text fields):
    # * `kind` dictionary-encodes (tiny vocabulary) — one small
    #   to_pylist + an index gather of SHARED interned strings;
    # * `offset` goes through numpy .tolist() (C fast path);
    # * `media_ref` is mostly null — fill a None template sparsely.
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    flat = spans_col.flatten()
    texts = flat.field("text").to_pylist()
    kd = flat.field("kind").dictionary_encode()
    # numpy object-array gather of SHARED interned strings — ~6x the
    # speed of a Python list comprehension over 280k indices
    kinds = np.array(kd.dictionary.to_pylist(), dtype=object)[
        kd.indices.to_numpy(zero_copy_only=False)].tolist()
    offs = flat.field("offset").to_numpy(
        zero_copy_only=False).tolist()
    ref_col = flat.field("media_ref")
    # Sparse fill keyed on the ACTUAL filler: corpora write "" (not
    # null) for ref-less spans, so filling every non-null value
    # converted all 286k strings per batch (~380 ms); filling only
    # the non-empty ~6% costs ~20 ms.  "" must survive in the tuple
    # (link-destination matching distinguishes "" from absent), so
    # the template is "" when the column is null-free, None-mixed
    # otherwise.
    if ref_col.null_count == 0:
        refs: list = [""] * len(flat)
        ridx = pc.indices_nonzero(
            pc.not_equal(ref_col, "")).to_numpy().tolist()
        rvals = ref_col.take(pa.array(ridx, pa.int64())).to_pylist()
        for i, v in zip(ridx, rvals):
            refs[i] = v
    else:
        refs = [None] * len(flat)
        all_ridx = pc.indices_nonzero(
            pc.is_valid(ref_col)).to_numpy().tolist()
        all_rvals = ref_col.take(
            pa.array(all_ridx, pa.int64())).to_pylist()
        for i, v in zip(all_ridx, all_rvals):
            refs[i] = v
        ridx = [i for i, v in zip(all_ridx, all_rvals) if v]
        rvals = [v for v in all_rvals if v]
    offsets = spans_col.offsets.to_numpy().tolist()
    # ONE zip over the whole flat batch, then C-level list slices per
    # doc — 4000 small zips cost ~2x a single big one (measured)
    flat_spans = list(zip(kinds, texts, refs, offs))
    passed, captures, nspans, nviol, viols = [], [], [], [], []
    for i in range(len(spans_col)):
        s, e = offsets[i], offsets[i + 1]
        r = evaluate_spans(flat_spans[s:e], compiled)
        passed.append(r.passed)
        captures.append(
            json.dumps(r.captures, sort_keys=True, separators=(",", ":")))
        nspans.append(e - s)
        nviol.append(len(r.violations))
        viols.append(r.violations)
    # per-doc media_ref lists straight from the sparse indices
    doc_of_ref = (np.searchsorted(np.asarray(offsets), np.asarray(
        ridx, dtype=np.int64), side="right") - 1 if ridx else
        np.zeros(0, dtype=np.int64))
    mrefs: list = [[] for _ in range(len(spans_col))]
    for d, v in zip(doc_of_ref.tolist(), rvals):
        mrefs[d].append(v)
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


_SCHEMA_CACHE: dict = {}


def validate_dataset(ds, schema_text: str, *, batch_size: int | None = None,
                     concurrency=None, num_cpus: float = 1.0,
                     use_tasks: bool = False):
    """documents Dataset → validated Dataset (verdicts + nested violations).

    ``use_tasks=True`` runs the kernel as plain TASKS on the warm
    worker pool instead of spinning an actor pool — the compiled
    schema comes from the bounded per-process cache (keyed by the
    schema text itself, so successive queries on the same schema hit).
    Measured ~1 s cheaper for small inputs (incremental re-validation's
    change sets) where actor-pool startup dominates; for corpus-scale
    runs the fixed actor pool still wins (stable placement, no
    per-task cache lookups).

    ``batch_size=None`` (default) evaluates whole blocks — measured ~50%
    faster than re-slicing into fixed batches (no coalescing/copy between
    the read and the actor); pass an int only when block sizes are
    pathological.

    ``concurrency=None`` sizes a FIXED pool to (CPUs - 2): measured ~25%
    faster than an autoscaling ``(min, max)`` pool (autoscale ramps too
    slowly for short-to-medium stages, and late actors pay their startup
    mid-run), while the 2-CPU headroom keeps the driver + materialize
    output from starving.  Pass an explicit int / (min, max) per stage to
    override."""
    # schema-authoring errors are compile-time: fail on the driver before
    # any data is read (SURVEY.md §2.6; reference errors.rs:191–263)
    compile_schema(schema_text)
    if use_tasks:
        def validate_task(batch: pa.Table) -> pa.Table:
            from mdvalidate_ray.state.proc_cache import get_or_build

            compiled = get_or_build(
                _SCHEMA_CACHE, schema_text,
                lambda: compile_schema(schema_text))
            return evaluate_batch(batch, compiled)

        return ds.map_batches(
            validate_task,
            batch_size=batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
            num_cpus=num_cpus,
        )
    if concurrency is None:
        import ray

        total = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        workers = max(1, int(total // max(num_cpus, 0.25)))
        concurrency = max(2, workers - 2)
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
