"""Skew handling: hot keys detected from sampled per-batch key histograms,
then salted before the groupby-aggregate shuffle (SURVEY.md §4; north-star
"skewed partitions are detected from sampled key histograms and salted").

Detection is one cheap streaming pass over a row sample: each batch reports
its top-k key counts (tiny partials), the driver folds them and flags keys
whose sampled frequency implies more rows than ``hot_threshold`` at full
scale.  ``duplicate_keys``' pre-aggregation already collapses within-batch
duplicates, so salting matters for keys hot *across* most batches — exactly
what the sampled histogram sees.
"""

from __future__ import annotations

import pyarrow as pa


def detect_hot_keys(ds, key: str, *, sample_fraction: float = 0.05,
                    top_per_batch: int = 8,
                    hot_threshold: int = 10_000) -> list:
    """Return keys whose estimated full-scale row count exceeds
    ``hot_threshold``."""
    frac = min(max(sample_fraction, 0.001), 1.0)

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        n = len(b)
        take = max(1, int(n * frac))
        rng = np.random.default_rng(n)    # deterministic per batch size
        idx = rng.choice(n, size=take, replace=False)
        sample = b.select([key]).take(pa.array(np.sort(idx)))
        vc = sample.column(key).value_counts()
        counts = vc.field("counts").to_pylist()
        values = vc.field("values").to_pylist()
        top = sorted(zip(counts, values), reverse=True)[:top_per_batch]
        return pa.Table.from_pylist(
            [{"key": str(v), "cnt": c} for c, v in top],
            schema=pa.schema([("key", pa.string()), ("cnt", pa.int64())]))

    totals: dict[str, int] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).iter_rows():
        totals[row["key"]] = totals.get(row["key"], 0) + row["cnt"]
    return sorted(k for k, c in totals.items()
                  if c / frac >= hot_threshold)


def salt_buckets_for(hot_keys: list) -> int | None:
    """The salting rule given an already-detected hot-key list (shared
    by auto_salt_buckets and callers that ran the detector themselves —
    ONE place to change the heuristic)."""
    if not hot_keys:
        return None
    return max(8, min(64, 8 * len(hot_keys)))


def auto_salt_buckets(ds, key: str, **kw) -> int | None:
    """Convenience: pick a salt bucket count when hot keys are present
    (None = no salting needed)."""
    return salt_buckets_for(detect_hot_keys(ds, key, **kw))
