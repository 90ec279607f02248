"""Declarative COLUMN-EXPECTATION suite over tabular Datasets — the
tabular twin of the span-schema constraint evaluator (the north-star's
"per-column stats and schema checks as declarative constraints"): a rule
list compiles once, evaluates vectorized per batch, and folds to one
tiny per-rule verdict row — the Great-Expectations-shaped surface
(expect_column_values_to_*) re-expressed Ray-Data-first.

Rule dicts (``rule_id`` optional, auto-derived):

* ``{"col", "kind": "not_null"}``
* ``{"col", "kind": "min", "value": x}`` / ``"max"`` — bounds are
  INCLUSIVE; nulls don't fail bounds (compose with not_null)
* ``{"col", "kind": "between", "lo": a, "hi": b}``
* ``{"col", "kind": "in_set", "values": [...]}``
* ``{"col", "kind": "regex", "pattern": r"..."}`` (full-match)

Plan: ONE streaming pass; each batch emits ≤ len(rules) partial rows
``(rule_id, n_checked, n_failed)`` (pre-combined — nothing row-shaped
leaves the pass), the driver sums the tiny partials and derives
``passed = n_failed == 0`` per rule.  Reference anchor: the span walk's
per-constraint violation vocabulary (/root/reference/src/mdschema/
validation/walkers — compile once, evaluate per node); here the "nodes"
are Arrow columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _rule_id(r: dict) -> str:
    if "rule_id" in r:
        return r["rule_id"]
    kind = r["kind"]
    if kind == "between":
        return f"{r['col']}_between_{r['lo']}_{r['hi']}"
    if kind in ("min", "max"):
        return f"{r['col']}_{kind}_{r['value']}"
    return f"{r['col']}_{kind}"


def _failed_mask(batch: pa.Table, r: dict) -> tuple[int, int]:
    """(n_checked, n_failed) for one rule on one batch, vectorized."""
    col = batch.column(r["col"])
    kind = r["kind"]
    if kind == "not_null":
        return batch.num_rows, batch.num_rows - len(col.drop_null())
    valid = col.drop_null()
    n = len(valid)
    if kind == "min":
        ok = pc.greater_equal(valid, r["value"])
    elif kind == "max":
        ok = pc.less_equal(valid, r["value"])
    elif kind == "between":
        ok = pc.and_(pc.greater_equal(valid, r["lo"]),
                     pc.less_equal(valid, r["hi"]))
    elif kind == "in_set":
        ok = pc.is_in(valid, value_set=pa.array(r["values"]))
    elif kind == "regex":
        ok = pc.match_substring_regex(
            pc.cast(valid, pa.string()), f"^(?:{r['pattern']})$")
    else:
        raise ValueError(f"unknown expectation kind: {kind}")
    return n, n - pc.sum(pc.cast(ok, pa.int64())).as_py()


def evaluate_expectations(ds, rules: list[dict]) -> pa.Table:
    """Run the rule suite in one streaming pass; returns a pa.Table of
    ``(rule_id, n_checked, n_failed, passed)`` sorted by rule_id."""
    ids = [_rule_id(r) for r in rules]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate rule_ids: {ids}")
    known = {"not_null", "min", "max", "between", "in_set", "regex"}
    for r in rules:
        if r["kind"] not in known:
            raise ValueError(f"unknown expectation kind: {r['kind']}")
    cols = {r["col"] for r in rules}
    out_schema = pa.schema([("rule_id", pa.string()),
                            ("n_checked", pa.int64()),
                            ("n_failed", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        rows_c, rows_f = [], []
        for r in rules:
            c, f = _failed_mask(b, r)
            rows_c.append(c)
            rows_f.append(f)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()),
             pa.array(rows_c, pa.int64()),
             pa.array(rows_f, pa.int64())], schema=out_schema)

    totals: dict[str, list[int]] = {i: [0, 0] for i in ids}
    parts = ds.select_columns(sorted(cols)).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    for blk in parts.iter_batches(batch_format="pyarrow"):
        for rid, c, f in zip(blk.column("rule_id").to_pylist(),
                             blk.column("n_checked").to_pylist(),
                             blk.column("n_failed").to_pylist()):
            totals[rid][0] += c
            totals[rid][1] += f
    order = sorted(ids)
    return pa.Table.from_pydict({
        "rule_id": pa.array(order, pa.string()),
        "n_checked": pa.array([totals[i][0] for i in order], pa.int64()),
        "n_failed": pa.array([totals[i][1] for i in order], pa.int64()),
        "passed": pa.array([totals[i][1] == 0 for i in order],
                           pa.bool_()),
    })
