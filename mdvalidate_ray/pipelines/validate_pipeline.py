"""The flagship end-to-end pipeline: read → validate (actor pool) → wide
constraints → verdicts/violations/report (SURVEY.md §3.4 lifecycle).

One-shot (non-checkpointed) form used by ``entry()`` and ``bench.py``;
the checkpointed/resumable form lives in
:mod:`mdvalidate_ray.pipelines.checkpoint`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from mdvalidate_ray.corpus import flagship_schema_text
from mdvalidate_ray.stages.drift import drift_check, kll_spans_per_doc
from mdvalidate_ray.stages.referential import dangling_media_refs
from mdvalidate_ray.stages.uniqueness import uniqueness_check
from mdvalidate_ray.stages.validate import (
    validate_dataset,
    violations_dataset,
)


def full_suite(docs_ds, assets_ds=None, *, schema_text: str | None = None,
               reference_sketch=None, batch_size: int = 256,
               concurrency=None) -> dict:
    """Run span-structure validation + every wide constraint over one
    documents Dataset.  Returns verdict datasets (lazy) + constraint
    results (materialized scalars / small tables).
    """
    schema_text = schema_text or flagship_schema_text()
    validated = validate_dataset(docs_ds, schema_text,
                                 batch_size=batch_size,
                                 concurrency=concurrency)
    out: dict = {
        "validated": validated,
        "violations": violations_dataset(validated),
    }
    out["uniqueness"] = uniqueness_check(docs_ds, "doc_id")
    if assets_ds is not None:
        out["dangling"] = dangling_media_refs(docs_ds, assets_ds)
    sketch = kll_spans_per_doc(docs_ds)
    out["spans_sketch"] = sketch
    if reference_sketch is not None:
        out["drift"] = drift_check(sketch, reference_sketch)
    return out


def verdict_summary(validated) -> dict:
    """Small global reduction over the validated dataset: pass/fail counts
    (the distributed analog of the reference's exit-code fold,
    reference src/cmd.rs:152–178).

    ONE streaming pass: per-batch partial counts folded on the driver —
    the previous aggregate + filter().count() pair executed the upstream
    lineage twice."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pylist([{
            "rows": b.num_rows,
            "n_passed": pc.sum(pc.cast(b.column("passed"),
                                       pa.int64())).as_py() or 0,
            "violations": pc.sum(b.column("n_violations")).as_py() or 0,
            "spans": pc.sum(b.column("n_spans")).as_py() or 0,
        }])

    rows = validated.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    total = {k: sum(r[k] for r in rows)
             for k in ("rows", "n_passed", "violations", "spans")}
    return {
        "rows": total["rows"],
        "n_passed": total["n_passed"],
        "n_failed": total["rows"] - total["n_passed"],
        "total_violations": total["violations"],
        "total_spans": total["spans"],
    }


def top_violations(violations, k: int = 10):
    """Top-k violation kinds by count — pre-aggregated groupby then a tiny
    driver-side sort (SURVEY.md §2.5 top-k report)."""
    counts = violations.groupby("kind").count()
    rows = counts.take_all()
    rows.sort(key=lambda r: -r["count()"])
    return [{"kind": r["kind"], "count": r["count()"]} for r in rows[:k]]


def incremental_validate(old_docs, new_docs, *, schema_text: str,
                         key: str = "doc_id",
                         content_col: str = "spans",
                         batch_size: int | None = None,
                         concurrency=None,
                         status_broadcast_threshold: int = 20_000_000):
    """INCREMENTAL re-validation: validate only what MOVED between two
    corpus snapshots — the CDC composition that makes a 10^12-doc
    validation run affordable when 0.1% of documents changed (the
    resume analog of the reference's incremental reparse,
    /root/reference/src/cmd.rs:101-122, lifted from one document to the
    corpus).

    Plan: :func:`~mdvalidate_ray.functions.relational.snapshot_diff`
    classifies keys (content compared as one uint64 row hash — wide
    span trees cost 16 bytes in the diff exchange); the
    added ∪ changed key set re-enters the NEW snapshot through the
    tiered :func:`~mdvalidate_ray.functions.relational.semi_join_keys`
    (broadcast below threshold, Bloom + co-partition above), and only
    those rows pay
    :func:`~mdvalidate_ray.stages.validate.validate_dataset`.  Removed
    keys come back as tombstones so a verdict store can be compacted.

    Returns {"verdicts": Dataset (validated cols + status
    'added'|'changed'), "removed": Dataset (key, status='removed'),
    "diff": the raw diff Dataset}."""
    import ray

    from mdvalidate_ray.functions.relational import (semi_join_keys,
                                                     snapshot_diff)
    from mdvalidate_ray.stages.validate import validate_dataset

    diff = snapshot_diff(old_docs, new_docs, key_col=key,
                         compare_cols=[content_col]).materialize()
    todo = diff.filter(expr="status != 'removed'")
    removed = diff.filter(expr="status == 'removed'")

    survivors = semi_join_keys(new_docs, todo, left_key=key,
                               right_key=key)
    use_tasks = False
    if concurrency is None:
        # size the evaluator stage to the CHANGE SET, not the machine
        # (the diff is materialized, so this count is free): small
        # change sets — the whole point of CDC — skip the actor pool
        # entirely and run the kernel as warm tasks with the
        # per-process compiled-schema cache; past that, a pool sized
        # to the set
        n_todo = todo.count()
        if n_todo <= 50_000:
            use_tasks = True
        else:
            concurrency = (1, max(1, min(8, n_todo // 128 + 1)))
    validated = validate_dataset(survivors, schema_text,
                                 batch_size=batch_size,
                                 concurrency=concurrency,
                                 use_tasks=use_tasks)

    # status ('added' vs 'changed') rides back TIERED on the change-set
    # size: below ``status_broadcast_threshold`` keys, a broadcast map
    # (bounded by the CHANGE SET, not the corpus); past it, a
    # hash-partitioned equi-join of the validated rows against the
    # (key, status) diff rows — nothing change-set-sized on the driver
    # (both tiers bit-equal: test_incremental_status_join_tier_parity)
    if todo.count() <= status_broadcast_threshold:
        kv = {}
        for blk in todo.iter_batches(batch_format="pyarrow"):
            for k_, s_ in zip(blk.column(key).to_pylist(),
                              blk.column("status").to_pylist()):
                kv[k_] = s_
        kv_ref = ray.put(kv)

        def add_status(b: pa.Table) -> pa.Table:
            mp = ray.get(kv_ref)
            st = [mp.get(x, "changed")
                  for x in b.column(key).to_pylist()]
            return b.append_column("status",
                                   pa.array(st, pa.string()))

        verdicts = validated.map_batches(add_status,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
    else:
        # tagged-union co-partition on hash(key) — Arrow's native join
        # kernel rejects nested non-key columns (violations is
        # list<struct>), so the tier is the house anti-join shape:
        # status rows and validated rows land in the same bucket and a
        # vectorized searchsorted attaches the status; the nested
        # columns ride through untouched
        import numpy as np

        from mdvalidate_ray.stages.validate import VALIDATED_SCHEMA
        from mdvalidate_ray.state.sketches import hash_strings

        n_parts = 32

        def _bk(keys: list) -> pa.Array:
            if not keys:
                return pa.array([], pa.int64())
            return pa.array((hash_strings([str(x) for x in keys])
                             % np.uint64(n_parts)).astype("int64"))

        def tag_v(b: pa.Table) -> pa.Table:
            ks = b.column(key).to_pylist()
            return b.append_column(
                "status", pa.array([""] * b.num_rows, pa.string())) \
                .append_column("_srow", pa.array(
                    np.zeros(b.num_rows, dtype=bool))) \
                .append_column("_bk", _bk(ks))

        def tag_s(b: pa.Table) -> pa.Table:
            ks = b.column(key).to_pylist()
            cols = {}
            for f in VALIDATED_SCHEMA:
                cols[f.name] = (b.column(key).cast(pa.string())
                                if f.name == key
                                else pa.nulls(b.num_rows, f.type))
            cols["status"] = b.column("status")
            cols["_srow"] = pa.array(np.ones(b.num_rows, dtype=bool))
            cols["_bk"] = _bk(ks)
            return pa.table(cols)

        def attach(g: pa.Table) -> pa.Table:
            is_s = g.column("_srow")
            srows = g.filter(is_s)
            vrows = g.filter(pc.invert(is_s))
            if vrows.num_rows == 0:
                return vrows.drop_columns(["_srow", "_bk"])
            sk = np.array(srows.column(key).to_pylist())
            sv = np.array(srows.column("status").to_pylist())
            o = np.argsort(sk, kind="stable")
            sk, sv = sk[o], sv[o]
            vk = np.array(vrows.column(key).to_pylist())
            st = np.full(len(vk), "changed", dtype=object)
            if len(sk):
                i = np.searchsorted(sk, vk)
                hit = (i < len(sk)) & \
                    (sk[np.minimum(i, len(sk) - 1)] == vk)
                st[hit] = sv[i[hit]]
            out = vrows.set_column(
                vrows.schema.get_field_index("status"), "status",
                pa.array([str(x) for x in st], pa.string()))
            return out.drop_columns(["_srow", "_bk"])

        verdicts = validated.map_batches(
            tag_v, batch_format="pyarrow",
            zero_copy_batch=True).union(
            todo.map_batches(tag_s, batch_format="pyarrow",
                             zero_copy_batch=True)) \
            .groupby("_bk").map_groups(attach, batch_format="pyarrow")
    return {
        "verdicts": verdicts,
        "removed": removed,
        "diff": diff,
    }
