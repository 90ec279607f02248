"""Referential integrity: every non-empty ``media_ref`` must exist in the
asset table (north-star: "referential integrity of media_ref against an
asset table via broadcast Bloom filters with a hash-join fallback").

Plan (SURVEY.md §2.5):

1. **Explode only the ref-bearing spans** — pure Arrow
   (``list_parent_indices`` + filter), never the full spans column
   (SURVEY.md §7(c)): output is (doc_id, media_ref) pairs, deduped per
   batch by the combiner.
2. **Bloom broadcast probe** — the filter is built from the asset table via
   per-batch partial blooms OR-merged on the driver (bit-array size fixed up
   front from the asset count, so partials are mergeable), then shipped ONCE
   per probe actor through its constructor (Ray puts constructor args in the
   object store — the ``ray.put``-broadcast pattern).  A ref the Bloom
   rejects is *certainly* dangling (no false negatives) and is reported
   without any shuffle.
3. **Exact hash semi-join fallback** — refs the Bloom accepts are only
   *maybe* valid (false-positive rate ε); they are verified exactly by
   co-partitioning tagged (probe ∪ asset-key) rows on ``media_ref`` with one
   ``groupby().map_groups`` and emitting probe rows whose group has no asset
   row.  The join input is the *deduped accepted refs + asset keys*, not the
   corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mdvalidate_ray.state.sketches import BloomFilter

REFS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
])


def explode_media_refs(batch: pa.Table) -> pa.Table:
    """documents batch → deduped (doc_id, media_ref) pairs, pure Arrow."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parents = pc.list_parent_indices(spans)
    flat = spans.flatten()
    refs = flat.field("media_ref")
    mask = pc.and_kleene(pc.is_valid(refs), pc.not_equal(refs, ""))
    doc_ids = batch.column("doc_id").take(parents.filter(mask))
    pairs = pa.Table.from_arrays([doc_ids, refs.filter(mask)],
                                 schema=REFS_SCHEMA)
    # per-batch combiner: dedup identical (doc, ref) pairs before shuffling
    return pa.TableGroupBy(pairs, ["doc_id", "media_ref"]) \
             .aggregate([]).select(["doc_id", "media_ref"])


def media_refs_dataset(docs_ds):
    return docs_ds.map_batches(explode_media_refs, batch_format="pyarrow",
                               zero_copy_batch=True)


def build_bloom(assets_ds, column: str = "asset_id", n_items: int | None = None,
                fp_rate: float = 0.01) -> BloomFilter:
    """Per-batch partial Blooms (fixed geometry) OR-merged on the driver."""
    if n_items is None:
        n_items = assets_ds.count()

    def partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter(n_items, fp_rate)
        bf.add(b.column(column).drop_null().to_pylist())
        return pa.Table.from_pylist([{"bloom": bf.to_bytes()}])

    merged = BloomFilter(n_items, fp_rate)
    for row in assets_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True).iter_rows():
        merged.merge(BloomFilter.from_bytes(row["bloom"]))
    return merged


class BloomProbe:
    """Actor-pool stage: constructor receives the serialized Bloom once per
    actor (broadcast); ``__call__`` partitions each refs batch into
    ``hit`` (maybe-valid) / miss (certainly dangling)."""

    def __init__(self, bloom_bytes: bytes, keep: str):
        self.bloom = BloomFilter.from_bytes(bloom_bytes)
        self.keep_hits = keep == "hits"

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        hits = self.bloom.might_contain(refs)
        mask = pa.array(hits if self.keep_hits else ~np.asarray(hits))
        return batch.filter(mask)


def _probe(refs_ds, bloom: BloomFilter, keep: str, concurrency):
    return refs_ds.map_batches(
        BloomProbe,
        fn_constructor_kwargs={"bloom_bytes": bloom.to_bytes(), "keep": keep},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)


def exact_antijoin(refs_ds, assets_ds, key_col: str = "asset_id"):
    """Hash semi-join fallback: tagged union co-partitioned on media_ref;
    emit probe rows whose group contains no asset row."""
    tagged_refs = refs_ds.map_batches(
        lambda b: b.append_column("is_asset",
                                  pa.array([False] * len(b), pa.bool_())),
        batch_format="pyarrow")
    tagged_assets = assets_ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pa.array([""] * len(b), pa.string()),
             b.column(key_col).cast(pa.string()),
             pa.array([True] * len(b), pa.bool_())],
            names=["doc_id", "media_ref", "is_asset"]),
        batch_format="pyarrow")

    def emit_dangling(group: pa.Table) -> pa.Table:
        if pc.any(group.column("is_asset")).as_py():
            return REFS_SCHEMA.empty_table()
        return group.filter(
            pc.invert(group.column("is_asset"))).select(["doc_id", "media_ref"])

    return (tagged_refs.union(tagged_assets)
            .groupby("media_ref")
            .map_groups(emit_dangling, batch_format="pyarrow"))


def dangling_media_refs(docs_ds, assets_ds, *, fp_rate: float = 0.01,
                        concurrency=(1, 8)):
    """Full constraint → Dataset of (doc_id, media_ref) dangling pairs."""
    bloom = build_bloom(assets_ds, fp_rate=fp_rate)
    refs = media_refs_dataset(docs_ds)
    definite = _probe(refs, bloom, keep="misses", concurrency=concurrency)
    suspects = _probe(refs, bloom, keep="hits", concurrency=concurrency)
    fallback = exact_antijoin(suspects, assets_ds)
    return definite.union(fallback)
