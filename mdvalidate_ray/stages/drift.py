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
    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(column).drop_null().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pylist([{"sketch": _sketch_batch(vals, k)}])

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return _merge_sorted([r["sketch"] for r in rows], k)


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
    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for g_tbl in _split_by(b, group_col):
            vals = g_tbl.column(value_col).drop_null().cast(
                pa.float64()).to_numpy(zero_copy_only=False)
            rows.append({"group": str(g_tbl.column(group_col)[0].as_py()),
                         "sketch": _sketch_batch(vals, k)})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("group", pa.string()),
                                    ("sketch", pa.binary())]))

    by_group: dict[str, list[bytes]] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        by_group.setdefault(row["group"], []).append(row["sketch"])
    return {g: _merge_sorted(bs, k) for g, bs in by_group.items()}


def _split_by(tbl: pa.Table, col: str):
    for val in pc.unique(tbl.column(col)).to_pylist():
        yield tbl.filter(pc.equal(tbl.column(col), val))


def tdigest_of_column(ds, column: str, delta: int = 100) -> TDigest:
    """Merged t-digest of a numeric column — same tree-reduce shape as
    :func:`kll_of_column`; tails are tighter than KLL's uniform bound
    (north-star: "streaming KLL/t-digest sketches")."""
    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(column).drop_null().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pylist(
            [{"sketch": TDigest(delta=delta).update(vals).to_bytes()}])

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    merged = TDigest(delta=delta)
    for b in sorted(r["sketch"] for r in rows):   # canonical order
        merged.merge(TDigest.from_bytes(b))
    return merged


def tdigest_by_group(ds, group_col: str, value_col: str,
                     delta: int = 100) -> dict[str, TDigest]:
    """One t-digest per group value — single pass, (group, sketch) partial
    rows folded on the driver (same shape as :func:`kll_by_group`)."""
    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for g_tbl in _split_by(b, group_col):
            vals = g_tbl.column(value_col).drop_null().cast(
                pa.float64()).to_numpy(zero_copy_only=False)
            rows.append({"group": str(g_tbl.column(group_col)[0].as_py()),
                         "sketch": TDigest(delta=delta).update(vals)
                         .to_bytes()})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("group", pa.string()),
                                    ("sketch", pa.binary())]))

    by_group: dict[str, list[bytes]] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        by_group.setdefault(row["group"], []).append(row["sketch"])
    out = {}
    for g, bs in by_group.items():
        merged = TDigest(delta=delta)
        for b in sorted(bs):
            merged.merge(TDigest.from_bytes(b))
        out[g] = merged
    return out


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
