"""Relational building blocks used by the query surface: broadcast hash
joins and exact distributed quantiles.

Join policy at scale (SURVEY.md §2.5): a small side (dimension table) is
broadcast — materialized once on the driver, shipped to every actor via its
constructor (object store), joined per batch with Arrow's native hash join.
Only when both sides are large does a co-partitioned ``groupby.map_groups``
join (see :mod:`mdvalidate_ray.stages.referential`) make sense.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class BroadcastJoiner:
    """Actor stage: ``small`` (an Arrow table) is a constructor arg —
    broadcast once per actor — and each batch inner-joins against it."""

    def __init__(self, small: pa.Table, keys, join_type: str = "inner"):
        self.small = small
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.keys,
                          join_type=self.join_type)


def broadcast_join(ds, small: pa.Table, keys, *, join_type: str = "inner",
                   concurrency=(1, 8)):
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs={"small": small, "keys": keys,
                               "join_type": join_type},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)


def exact_quantiles(ds, column: str, qs, *, as_int: bool = True) -> list:
    """Exact (not sketched) quantiles of a bounded-cardinality numeric
    column: per-batch value counts → tiny ``groupby(value).sum`` → driver
    cumsum.  Matches DuckDB ``quantile_disc``: the value at 1-indexed
    position ``ceil(q * n)`` of the sorted column."""
    def counts(b: pa.Table) -> pa.Table:
        vc = b.column(column).drop_null().value_counts()
        return pa.Table.from_arrays(
            [vc.field("values").cast(pa.float64()),
             vc.field("counts").cast(pa.int64())],
            names=["value", "cnt"])

    merged = ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True).groupby("value").sum("cnt")
    rows = sorted((r["value"], r["sum(cnt)"]) for r in merged.take_all())
    values = np.array([v for v, _ in rows])
    cum = np.cumsum([c for _, c in rows])
    n = cum[-1] if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(None)
            continue
        pos = max(int(np.ceil(q * n)), 1)
        idx = int(np.searchsorted(cum, pos, side="left"))
        v = values[min(idx, len(values) - 1)]
        out.append(int(v) if as_int else float(v))
    return out
