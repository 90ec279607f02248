"""End-to-end Ray Data validation pipeline tests.

Covers FIXTURES.md B6 (batch-size invariance — the analog of the
reference's chunk-size robustness tests, /root/reference/src/cmd.rs:274–398:
chunking must not change the verdict) and verdict parity between the Ray
actor-pool stage and direct driver-side evaluation.
"""

import json

import pytest

from mdvalidate_ray.corpus import (
    arrow_documents,
    expected_fail_mode,
    flagship_schema_text,
    ray_documents,
)
from mdvalidate_ray.stages.validate import (
    ConstraintEvaluator,
    validate_dataset,
    violations_dataset,
)

N_DOCS = 120

EXPECTED_KIND_BY_MODE = {
    "wrong_heading_level": "node_type_mismatch",
    "bad_table_value": "content_mismatch_matcher",
    "too_many_list_items": "children_length_mismatch",
    "trailing_extra_span": "malformed_structure_input_has_child",
    "missing_code_body": "malformed_structure_schema_has_child",
    "bad_intro_case": "not_enough_nodes_for_repeating_paragraph",
}


def test_ray_corpus_matches_driver_corpus(ray_session):
    ray_tbl = ray_documents(N_DOCS, override_num_blocks=4).sort("doc_id").to_pandas()
    local_tbl = arrow_documents(N_DOCS).to_pandas().sort_values("doc_id")
    assert list(ray_tbl["doc_id"]) == list(local_tbl["doc_id"])
    assert ray_tbl["spans"].map(len).tolist() == local_tbl["spans"].map(len).tolist()


def test_pipeline_verdicts_match_planted_modes(ray_session):
    # dup_every huge → no planted duplicate ids, so doc_id ↔ index is 1:1
    ds = ray_documents(N_DOCS, override_num_blocks=4, dup_every=10**9)
    validated = validate_dataset(ds, flagship_schema_text(), batch_size=32)
    rows = {r["doc_id"]: r for r in validated.take_all()}
    assert len(rows) == N_DOCS
    for i in range(N_DOCS):
        doc_id = f"doc{i:012d}"
        mode = expected_fail_mode(i)
        r = rows[doc_id]
        assert r["passed"] == (mode is None), (i, mode, r["violations"])
        if mode is not None:
            kinds = {v["kind"] for v in r["violations"]}
            assert EXPECTED_KIND_BY_MODE[mode] in kinds, (i, mode, kinds)
        else:
            caps = json.loads(r["captures"])
            assert caps["title"].startswith("Doc ")
            assert isinstance(caps["tag"], list) and caps["tag"]


def test_violations_dataset_flat(ray_session):
    ds = ray_documents(N_DOCS, override_num_blocks=2)
    validated = validate_dataset(ds, flagship_schema_text(), batch_size=64)
    viols = violations_dataset(validated).take_all()
    assert viols, "expected planted violations"
    expected_docs = {f"doc{i:012d}" for i in range(N_DOCS)
                     if expected_fail_mode(i) is not None}
    assert {v["doc_id"] for v in viols} == expected_docs
    assert all(set(v) == {"doc_id", "constraint_id", "kind", "expected",
                          "actual", "span_index"} for v in viols)


@pytest.mark.parametrize("batch_size", [1, 32, 4096])
def test_b6_batch_size_invariance(ray_session, batch_size):
    """B6: verdicts identical at batch_size 1, 32, 4096 (reference analog:
    chunk sizes 1..=9 must not change the result, cmd.rs:385–398)."""
    ds = ray_documents(60, override_num_blocks=3)
    validated = validate_dataset(ds, flagship_schema_text(),
                                 batch_size=batch_size)
    got = sorted(
        (r["doc_id"], r["passed"], r["captures"], r["n_violations"])
        for r in validated.take_all())
    evaluator = ConstraintEvaluator(flagship_schema_text())
    expected_tbl = evaluator(arrow_documents(60))
    expected = sorted(zip(
        expected_tbl.column("doc_id").to_pylist(),
        expected_tbl.column("passed").to_pylist(),
        expected_tbl.column("captures").to_pylist(),
        expected_tbl.column("n_violations").to_pylist()))
    assert got == expected


def test_fast_paths_match_interpreter():
    """Differential: the vectorized list/table fast paths must produce
    bit-identical output to the pure interpreter (monkeypatched off) over
    a corpus containing every planted failure mode."""
    import mdvalidate_ray.evaluate.evaluator as EV

    tbl = arrow_documents(600)
    fast = ConstraintEvaluator(flagship_schema_text())(tbl)
    orig_list, orig_table = EV._try_fast_list, EV._try_fast_table
    EV._try_fast_list = lambda ctx, tmpl: None
    EV._try_fast_table = lambda ctx, tmpl: False
    try:
        slow = ConstraintEvaluator(flagship_schema_text())(tbl)
    finally:
        EV._try_fast_list, EV._try_fast_table = orig_list, orig_table
    for col in ("doc_id", "passed", "captures", "n_violations",
                "violations"):
        assert fast.column(col).to_pylist() == slow.column(col).to_pylist(), col


def test_violation_report_matches_raw_violations(ray_session):
    """The aggregated report must reproduce exactly what a driver-side
    pandas aggregation of the raw violations table says."""
    import mdvalidate_ray.queries as Q

    sf = "/root/testdata/sf0.001"
    report = Q.violation_report(sf).to_pandas().set_index(
        ["kind", "constraint_id"]).sort_index()
    raw = Q.validate_violations(sf).to_pandas()
    want = raw.groupby(["kind", "constraint_id"]).agg(
        n_violations=("doc_id", "size"), n_docs=("doc_id", "nunique"),
        example_doc=("doc_id", "min")).sort_index()
    assert list(report.index) == list(want.index)
    for col in ("n_violations", "n_docs", "example_doc"):
        assert report[col].tolist() == want[col].tolist(), col


def test_incremental_validate_parity(ray_session):
    """Incremental re-validation returns exactly the verdicts a FULL
    validation of the new snapshot would give for the added ∪ changed
    keys — and nothing else; removed tombstones are exactly the dropped
    keys."""
    import pyarrow as pa

    from mdvalidate_ray.corpus import flagship_schema_text
    from mdvalidate_ray.pipelines.validate_pipeline import (
        incremental_validate,
    )
    from mdvalidate_ray.queries import _corpus_versions
    from mdvalidate_ray.stages.validate import validate_dataset

    v1, v2 = _corpus_versions("/root/testdata/sf0.001")
    res = incremental_validate(v1, v2,
                               schema_text=flagship_schema_text())
    inc = res["verdicts"].select_columns(
        ["doc_id", "passed", "n_violations", "status"]).to_pandas()

    full = validate_dataset(v2, flagship_schema_text()).select_columns(
        ["doc_id", "passed", "n_violations"]).to_pandas()
    v1_ids = set(v1.select_columns(["doc_id"]).to_pandas()["doc_id"])
    v2_ids = set(full["doc_id"])

    # expected change set: new keys + keys whose spans differ —
    # recompute independently from the generators' perturbation rule
    added = v2_ids - v1_ids
    changed = {d for d in inc[inc["status"] == "changed"]["doc_id"]}
    assert set(inc["doc_id"]) == added | changed
    assert set(inc[inc["status"] == "added"]["doc_id"]) == added

    fm = full.set_index("doc_id")
    for _, r in inc.iterrows():
        assert bool(fm.loc[r["doc_id"], "passed"]) == bool(r["passed"])
        assert int(fm.loc[r["doc_id"], "n_violations"]) == int(
            r["n_violations"])

    removed = set(res["removed"].to_pandas()["doc_id"])
    assert removed == v1_ids - v2_ids
    # every changed doc really is different in v2 (edited rule: idx%7)
    assert all(d in v1_ids for d in changed)


def test_incremental_status_join_tier_parity(ray_session):
    """status_broadcast_threshold=0 forces the change-set-past-driver
    tier (status attached by a hash-partitioned join instead of a
    broadcast map); the (doc_id, passed, n_violations, status) rows
    must be identical to the broadcast tier."""
    from mdvalidate_ray.corpus import flagship_schema_text
    from mdvalidate_ray.pipelines.validate_pipeline import (
        incremental_validate,
    )
    from mdvalidate_ray.queries import _corpus_versions

    v1, v2 = _corpus_versions("/root/testdata/sf0.001")
    cols = ["doc_id", "passed", "n_violations", "status"]
    base = incremental_validate(
        v1, v2, schema_text=flagship_schema_text())["verdicts"] \
        .select_columns(cols).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    forced = incremental_validate(
        v1, v2, schema_text=flagship_schema_text(),
        status_broadcast_threshold=0)["verdicts"] \
        .select_columns(cols).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert base.equals(forced) and len(base) > 0
