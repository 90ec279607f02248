"""Distribution-drift constraint via streaming KLL sketches merged in a
tree-reduce (north-star; no reference analog — SURVEY.md §2.4).

A numeric property of the corpus (spans per doc, text length, any column) is
sketched per batch; partials are KiB-sized and merge associatively, so the
driver (or a tree of reduce tasks at cluster scale) folds them without a
shuffle.  Drift = max CDF gap between the live sketch and a reference
sketch at fixed quantile points; per-group sketches localize *where* the
distribution moved (FIXTURES.md B5: "drift flagged only on shifted
partitions").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from mdvalidate_ray.state.sketches import (
    KLLSketch,
    TDigest,
    max_quantile_drift,
    max_quantile_drift_td,
)


def _sketch_batch(values, k: int) -> bytes:
    return KLLSketch(k=k).update(values).to_bytes()


def _merge_sorted(partials: list[bytes], k: int) -> KLLSketch:
    """Merge partial sketches in canonical (sorted-bytes) order: KLL
    compaction is order-dependent, and Ray's streaming executor delivers
    partials in nondeterministic order — sorting restores run-to-run
    determinism given the same partial set."""
    merged = KLLSketch(k=k)
    for b in sorted(partials):
        merged.merge(KLLSketch.from_bytes(b))
    return merged


def kll_of_column(ds, column: str, k: int = 200) -> KLLSketch:
    """Merged KLL sketch of a numeric column — one streaming pass."""
    return _sketch_of_column(ds, column, lambda: KLLSketch(k=k),
                             KLLSketch.from_bytes)


def kll_spans_per_doc(ds, k: int = 200) -> KLLSketch:
    """Sketch of span counts per document (the corpus-shape statistic)."""
    def partial(b: pa.Table) -> pa.Table:
        spans = b.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        counts = pc.list_value_length(spans).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pylist([{"sketch": _sketch_batch(counts, k)}])

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return _merge_sorted([r["sketch"] for r in rows], k)


def kll_by_group(ds, group_col: str, value_col: str,
                 k: int = 200) -> dict[str, KLLSketch]:
    """One sketch per group value (small-cardinality groups: partition key,
    source, language).  Partials are (group, sketch) rows — the driver fold
    replaces a groupby shuffle because sketches, not rows, move."""
    return _sketch_by_group(ds, group_col, value_col,
                            lambda: KLLSketch(k=k), KLLSketch.from_bytes)


def _split_by(tbl: pa.Table, col: str):
    for val in pc.unique(tbl.column(col)).to_pylist():
        yield tbl.filter(pc.equal(tbl.column(col), val))


# generic one-pass column/group sketchers shared by the KLL and t-digest
# families: (make_sketch, from_bytes) parameterize the fold, and partials
# always merge in canonical sorted-bytes order (the determinism rule —
# compaction is order-dependent and the streaming executor delivers
# partials in nondeterministic order)

def _fold_sorted(blobs, make_sketch, from_bytes):
    merged = make_sketch()
    for b in sorted(blobs):
        merged.merge(from_bytes(b))
    return merged


def _sketch_of_column(ds, column: str, make_sketch, from_bytes):
    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(column).drop_null().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pylist(
            [{"sketch": make_sketch().update(vals).to_bytes()}])

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    # tiered fold: flat canonical-order merge while the partial count is
    # driver-trivial, fanout-ary task tree above (tree_reduce_sketches)
    return tree_reduce_sketches([r["sketch"] for r in rows], make_sketch,
                                from_bytes)


def _sketch_by_group(ds, group_col: str, value_col: str, make_sketch,
                     from_bytes):
    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for g_tbl in _split_by(b, group_col):
            vals = g_tbl.column(value_col).drop_null().cast(
                pa.float64()).to_numpy(zero_copy_only=False)
            rows.append({"group": str(g_tbl.column(group_col)[0].as_py()),
                         "sketch": make_sketch().update(vals).to_bytes()})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("group", pa.string()),
                                    ("sketch", pa.binary())]))

    by_group: dict[str, list[bytes]] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        by_group.setdefault(row["group"], []).append(row["sketch"])
    return {g: _fold_sorted(bs, make_sketch, from_bytes)
            for g, bs in by_group.items()}


def tdigest_of_column(ds, column: str, delta: int = 100) -> TDigest:
    """Merged t-digest of a numeric column — same tree-reduce shape as
    :func:`kll_of_column`; tails are tighter than KLL's uniform bound
    (north-star: "streaming KLL/t-digest sketches")."""
    return _sketch_of_column(ds, column, lambda: TDigest(delta=delta),
                             TDigest.from_bytes)


def tdigest_by_group(ds, group_col: str, value_col: str,
                     delta: int = 100) -> dict[str, TDigest]:
    """One t-digest per group value — single pass, (group, sketch) partial
    rows folded on the driver (same shape as :func:`kll_by_group`)."""
    return _sketch_by_group(ds, group_col, value_col,
                            lambda: TDigest(delta=delta),
                            TDigest.from_bytes)


def drift_check_td(live: TDigest, reference: TDigest,
                   threshold: float = 0.1) -> dict:
    stat = max_quantile_drift_td(reference, live)
    return {"passed": stat <= threshold, "statistic": stat,
            "threshold": threshold,
            "live_quantiles": live.quantiles([0.1, 0.5, 0.9]),
            "reference_quantiles": reference.quantiles([0.1, 0.5, 0.9])}


def drift_check(live: KLLSketch, reference: KLLSketch,
                threshold: float = 0.1) -> dict:
    stat = max_quantile_drift(reference, live)
    return {"passed": stat <= threshold, "statistic": stat,
            "threshold": threshold,
            "live_quantiles": live.quantiles([0.1, 0.5, 0.9]),
            "reference_quantiles": reference.quantiles([0.1, 0.5, 0.9])}


def drift_by_group(ds, group_col: str, value_col: str,
                   reference: KLLSketch, threshold: float = 0.1) -> dict:
    """Per-group drift verdicts against one reference sketch."""
    return {g: drift_check(sk, reference, threshold)
            for g, sk in sorted(kll_by_group(ds, group_col, value_col).items())}


def tree_reduce_sketches(blobs: list[bytes], make_sketch, from_bytes, *,
                         fanout: int = 16, flat_threshold: int = 64):
    """Deterministic TREE-reduce of serialized mergeable sketch state —
    the north-star's "merged in a tree-reduce", made literal.

    Below ``flat_threshold`` partials the flat canonical-order driver
    fold (:func:`_fold_sorted`) is strictly better (one hop, no task
    overhead) — the tiers switch exactly where the driver fold stops
    being O(small).  Above it, partials merge in ``fanout``-ary waves of
    Ray tasks: each wave groups the SORTED blob list into consecutive
    chunks (canonical order inside every chunk), merges the chunks in
    parallel, and re-sorts the outputs for the next wave — so the merge
    tree is a pure function of the partial MULTISET, independent of
    block arrival order (compaction is order-dependent; determinism
    comes from the canonical ordering at every level, same rule as the
    flat fold).  Driver traffic is O(fanout · KiB) per wave instead of
    O(partials · KiB).
    """
    import ray

    blobs = sorted(blobs)
    if len(blobs) <= flat_threshold:
        return _fold_sorted(blobs, make_sketch, from_bytes)

    @ray.remote(num_cpus=1)
    def merge_chunk(chunk: list[bytes], mk, fb) -> bytes:
        return _fold_sorted(chunk, mk, fb).to_bytes()

    level = blobs
    while len(level) > flat_threshold:
        chunks = [level[i:i + fanout] for i in range(0, len(level),
                                                     fanout)]
        level = sorted(ray.get([
            merge_chunk.remote(c, make_sketch, from_bytes)
            for c in chunks]))
    return _fold_sorted(level, make_sketch, from_bytes)


def ks_exact(ds, *, value_col: str, group_col: str, group_a,
             group_b, n_parts: int = 16):
    """EXACT two-sample Kolmogorov–Smirnov statistic between two
    populations of one column — the hypothesis-test complement of the
    KLL/t-digest DRIFT sketches in this module (those give quantile
    distances; this gives the exact sup-CDF-gap a release gate can
    threshold, with no float folding anywhere):

    ``D = max_v |F_a(v) − F_b(v)|``, computed in integers as
    ``max_v |ca(v)·n_b − cb(v)·n_a|`` over the pooled distinct values
    (the supremum of a step function is attained at a jump), then
    reported both raw and as ppm (``10^6·num // (n_a·n_b)``).

    Plan: per-batch (value, cnt_a, cnt_b) combiner — a hot value
    contributes one row per batch — one
    :func:`~mdvalidate_ray.functions.relational.bucketed_group_sum`
    exchange folds exact per-value counts, and the finish (sort by
    value, two cumsums, one argmax) runs on the DISTINCT-VALUE table,
    which is bounded by the column's cardinality, not the corpus (drift
    columns are lengths/scores/buckets; pre-bin a genuinely continuous
    column first — same contract as the sketch path).  Returns one row
    ``(n_a, n_b, ks_num, ks_ppm)``."""
    import numpy as np
    import pyarrow.compute as pc

    from mdvalidate_ray.functions.relational import bucketed_group_sum

    part_schema = pa.schema([("v", pa.int64()), ("ca", pa.int64()),
                             ("cb", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col)
        in_a = pc.equal(g, group_a)
        in_b = pc.equal(g, group_b)
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ma = np.asarray(in_a.combine_chunks(), dtype=bool)
        mb = np.asarray(in_b.combine_chunks(), dtype=bool)
        if not (ma.any() or mb.any()):
            return part_schema.empty_table()
        uniq = np.unique(v[ma | mb])
        ca = np.zeros(len(uniq), dtype=np.int64)
        cb = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(ca, np.searchsorted(uniq, v[ma]), 1)
        np.add.at(cb, np.searchsorted(uniq, v[mb]), 1)
        return pa.Table.from_arrays(
            [pa.array(uniq), pa.array(ca), pa.array(cb)],
            names=part_schema.names)

    folded = bucketed_group_sum(
        ds.select_columns([value_col, group_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        key="v", sum_cols=["ca", "cb"], n_parts=n_parts)

    # finish on the distinct-value table (cardinality-bounded); ONE
    # consumption — no count() probe, which would re-execute the fold
    blocks = list(folded.iter_batches(batch_format="pyarrow"))
    t = (pa.concat_tables(blocks) if blocks
         else part_schema.empty_table())
    if t.num_rows == 0:
        return pa.table({"n_a": pa.array([0], pa.int64()),
                         "n_b": pa.array([0], pa.int64()),
                         "ks_num": pa.array([0], pa.int64()),
                         "ks_ppm": pa.array([0], pa.int64())})
    t = t.sort_by("v")
    ca = np.cumsum(t.column("ca").to_numpy(zero_copy_only=False))
    cb = np.cumsum(t.column("cb").to_numpy(zero_copy_only=False))
    n_a, n_b = int(ca[-1]), int(cb[-1])
    num = int(np.abs(ca * n_b - cb * n_a).max()) if n_a and n_b else 0
    ppm = 10**6 * num // (n_a * n_b) if n_a and n_b else 0
    return pa.table({"n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64()),
                     "ks_num": pa.array([num], pa.int64()),
                     "ks_ppm": pa.array([ppm], pa.int64())})
