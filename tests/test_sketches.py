"""Sketch unit tests: accuracy bounds + merge associativity (partials merged
in any order must equal the single-pass sketch — the property the tree-reduce
relies on)."""

import numpy as np
import pytest

from mdvalidate_ray.state.sketches import (
    BloomFilter,
    HyperLogLog,
    KLLSketch,
    hash_strings,
    max_quantile_drift,
)


def test_hash_strings_deterministic():
    a = hash_strings(["x", "y", "z"])
    b = hash_strings(["x", "y", "z"])
    assert (a == b).all()
    assert a.dtype == np.uint64


@pytest.mark.parametrize("n", [100, 10_000, 200_000])
def test_hll_estimate_within_bound(n):
    hll = HyperLogLog()
    hll.add([f"key{i}" for i in range(n)])
    est = hll.estimate()
    assert abs(est - n) / n < 4 * hll.rel_error, (est, n)


def test_hll_merge_equals_single_pass():
    keys = [f"k{i}" for i in range(50_000)]
    whole = HyperLogLog().add(keys)
    parts = [HyperLogLog().add(keys[i::4]) for i in range(4)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert (merged.registers == whole.registers).all()


def test_hll_roundtrip():
    hll = HyperLogLog().add(["a", "b", "c"])
    back = HyperLogLog.from_bytes(hll.to_bytes())
    assert back.estimate() == hll.estimate()


def test_bloom_no_false_negatives_and_low_fp():
    members = [f"asset-{i:06d}" for i in range(20_000)]
    bf = BloomFilter(len(members), fp_rate=0.01)
    bf.add(members)
    assert bf.might_contain(members).all()
    probes = [f"missing-{i:06d}" for i in range(20_000)]
    fp = bf.might_contain(probes).mean()
    assert fp < 0.03, fp


def test_bloom_merge_and_roundtrip():
    a = BloomFilter(1000).add([f"a{i}" for i in range(500)])
    b = BloomFilter(1000).add([f"b{i}" for i in range(500)])
    a.merge(b)
    back = BloomFilter.from_bytes(a.to_bytes())
    assert back.might_contain(["a1", "b1"]).all()
    assert not back.might_contain(["nope-xyz"]).any()


def test_kll_quantiles_close_to_exact():
    rng = np.random.default_rng(0)
    data = rng.normal(100, 15, 100_000)
    sk = KLLSketch(k=200)
    for chunk in np.array_split(data, 50):
        sk.update(chunk)
    for q in (0.1, 0.5, 0.9):
        exact = np.quantile(data, q)
        approx = sk.quantile(q)
        # normalized error vs the data spread
        assert abs(approx - exact) / 15 < 0.15, (q, exact, approx)


def test_kll_merge():
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 1000, 40_000)
    parts = [KLLSketch().update(c) for c in np.array_split(data, 8)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.size_total() if hasattr(merged, "size_total") else True
    assert abs(merged.quantile(0.5) - 500) < 40


def test_kll_roundtrip():
    sk = KLLSketch().update(np.arange(1000.0))
    back = KLLSketch.from_bytes(sk.to_bytes())
    assert back.quantile(0.5) == sk.quantile(0.5)


def test_drift_statistic():
    base = KLLSketch().update(np.random.default_rng(2).normal(0, 1, 50_000))
    same = KLLSketch().update(np.random.default_rng(3).normal(0, 1, 50_000))
    shifted = KLLSketch().update(np.random.default_rng(4).normal(2, 1, 50_000))
    assert max_quantile_drift(base, same) < 0.05
    assert max_quantile_drift(base, shifted) > 0.3


# --- t-digest ---------------------------------------------------------------

def test_tdigest_quantile_accuracy_and_merge():
    import numpy as np

    from mdvalidate_ray.state.sketches import TDigest

    rng = np.random.default_rng(0)
    vals = rng.normal(100, 15, 100_000)
    # partials merged in canonical sorted-bytes order (the engine's rule)
    parts = [TDigest().update(vals[i::8]) for i in range(8)]
    merged = TDigest()
    for b in sorted(p.to_bytes() for p in parts):
        merged.merge(TDigest.from_bytes(b))
    exact = np.quantile(vals, [0.01, 0.5, 0.99])
    got = merged.quantiles([0.01, 0.5, 0.99])
    # t-digest tails: within 0.05 sigma at p01/p99, tighter at median
    assert abs(got[1] - exact[1]) < 0.2
    assert abs(got[0] - exact[0]) < 1.0 and abs(got[2] - exact[2]) < 1.0
    # deterministic roundtrip
    again = TDigest.from_bytes(merged.to_bytes())
    assert again.quantiles([0.25, 0.75]) == merged.quantiles([0.25, 0.75])


def test_tdigest_drift_statistic():
    import numpy as np

    from mdvalidate_ray.state.sketches import (
        TDigest,
        max_quantile_drift_td,
    )

    rng = np.random.default_rng(1)
    ref = TDigest().update(rng.normal(0, 1, 50_000))
    same = TDigest().update(rng.normal(0, 1, 50_000))
    shifted = TDigest().update(rng.normal(1.0, 1, 50_000))
    assert max_quantile_drift_td(ref, same) < 0.05
    assert max_quantile_drift_td(ref, shifted) > 0.2


def test_tdigest_of_column_matches_duckdb_quantiles(ray_session):
    import duckdb
    import ray.data

    from mdvalidate_ray.stages.drift import tdigest_of_column

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    td = tdigest_of_column(ds, "n_chars")
    df = duckdb.sql("SELECT n_chars FROM "
                    "'/root/testdata/sf0.001/documents.parquet'").df()
    import numpy as np

    exact = np.quantile(df["n_chars"].to_numpy(), [0.1, 0.5, 0.9])
    got = td.quantiles([0.1, 0.5, 0.9])
    for e, g in zip(exact, got):
        assert abs(e - g) <= max(3.0, 0.02 * e), (e, g)


def test_misra_gries_bounds_and_merge_order_independence():
    """MG invariants on a zipf-ish stream: underestimates, bounded error
    (true − est ≤ err), coverage of every key with true > err, and
    merge-order independence of the (est + err) guarantees."""
    import numpy as np

    from mdvalidate_ray.state.sketches import MisraGries

    rng = np.random.default_rng(5)
    keys = [f"k{int(v)}" for v in rng.zipf(1.5, size=6000) % 200]
    true = {}
    for k in keys:
        true[k] = true.get(k, 0) + 1

    def batch_summaries(order):
        out = []
        for i in range(0, len(order), 500):
            chunk = order[i:i + 500]
            uniq, cnt = np.unique(np.asarray(chunk, dtype=object),
                                  return_counts=True)
            out.append(MisraGries.from_counts(uniq, cnt, capacity=20))
        return out

    for seed in (0, 1):
        perm = list(keys)
        np.random.default_rng(seed).shuffle(perm)
        parts = batch_summaries(perm)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.merge(p)
        est = dict(zip(merged.keys, merged.counts.tolist()))
        assert len(merged.keys) <= 20
        for k, e in est.items():
            assert e <= true[k]
            assert true[k] - e <= merged.err
        for k, t in true.items():
            if t > merged.err:
                assert k in est, (k, t, merged.err)


def test_misra_gries_table_round_trip_equals_merge():
    """from_table over concatenated partial tables folds duplicate keys
    and sentinel error rows exactly like pairwise merge."""
    import numpy as np
    import pyarrow as pa

    from mdvalidate_ray.state.sketches import MisraGries

    a = MisraGries.from_counts(np.asarray(["x", "y", "z"], dtype=object),
                               np.array([5, 3, 1]), capacity=2)
    b = MisraGries.from_counts(np.asarray(["x", "w"], dtype=object),
                               np.array([2, 9]), capacity=2)
    via_merge = a.merge(b)
    via_table = MisraGries.from_table(
        pa.concat_tables([a.to_table(), b.to_table()]), capacity=2)
    assert sorted(zip(via_merge.keys, via_merge.counts.tolist())) == \
        sorted(zip(via_table.keys, via_table.counts.tolist()))
    assert via_merge.err == via_table.err


def test_tree_reduce_sketches_deterministic_and_accurate(ray_session):
    """Forcing the task-tree path (fanout 4, flat threshold 8) over 200
    KLL partials: result is a pure function of the partial multiset
    (same sketch under shuffled input order), totals are preserved, and
    quantile estimates stay within KLL error of the exact values."""
    import numpy as np

    from mdvalidate_ray.stages.drift import tree_reduce_sketches
    from mdvalidate_ray.state.sketches import KLLSketch

    rng = np.random.default_rng(2)
    all_vals = []
    blobs = []
    for i in range(200):
        vals = rng.normal(loc=float(i % 7), scale=1.0, size=500)
        all_vals.append(vals)
        blobs.append(KLLSketch(k=200).update(vals).to_bytes())

    def run(order):
        return tree_reduce_sketches(
            [blobs[j] for j in order], lambda: KLLSketch(k=200),
            KLLSketch.from_bytes, fanout=4, flat_threshold=8)

    a = run(range(200))
    b = run(list(reversed(range(200))))
    assert a.to_bytes() == b.to_bytes()
    flat = np.concatenate(all_vals)
    for q in (0.1, 0.5, 0.9):
        est = a.quantile(q)
        exact = np.quantile(flat, q)
        # rank error ≤ ~1.7%/k·n for k=200; translate via value spread
        lo, hi = np.quantile(flat, max(0.0, q - 0.05)), np.quantile(
            flat, min(1.0, q + 0.05))
        assert lo - 1e-9 <= est <= hi + 1e-9, (q, est, exact)


def test_ks_exact_matches_scipy_free_reference(ray_session):
    """Integer KS equals a brute-force CDF-gap computation (including
    heavy ties and unequal sample sizes), across block splits; disjoint
    distributions give D = 1 (ppm = 10^6), identical ones give 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mdvalidate_ray.stages.drift import ks_exact

    rng = np.random.default_rng(23)
    va = rng.integers(0, 40, 300)          # heavy ties
    vb = np.r_[rng.integers(10, 50, 200), [25] * 30]
    t = pa.table({
        "v": pa.array(np.r_[va, vb].astype(np.int64)),
        "g": pa.array(["a"] * len(va) + ["b"] * len(vb))})
    got = ks_exact(ray.data.from_arrow(t).repartition(5),
                   value_col="v", group_col="g", group_a="a",
                   group_b="b", n_parts=4).to_pandas().iloc[0]

    pooled = np.unique(np.r_[va, vb])
    ca = np.array([(va <= x).sum() for x in pooled], dtype=np.int64)
    cb = np.array([(vb <= x).sum() for x in pooled], dtype=np.int64)
    num = int(np.abs(ca * len(vb) - cb * len(va)).max())
    assert int(got.n_a) == len(va) and int(got.n_b) == len(vb)
    assert int(got.ks_num) == num
    assert int(got.ks_ppm) == 10**6 * num // (len(va) * len(vb))

    # disjoint -> D = 1; identical -> D = 0
    t2 = pa.table({"v": pa.array([1, 2, 3, 10, 11, 12], pa.int64()),
                   "g": pa.array(["a", "a", "a", "b", "b", "b"])})
    d2 = ks_exact(ray.data.from_arrow(t2), value_col="v",
                  group_col="g", group_a="a", group_b="b") \
        .to_pandas().iloc[0]
    assert int(d2.ks_ppm) == 10**6
    t3 = pa.table({"v": pa.array([1, 2, 1, 2], pa.int64()),
                   "g": pa.array(["a", "a", "b", "b"])})
    d3 = ks_exact(ray.data.from_arrow(t3), value_col="v",
                  group_col="g", group_a="a", group_b="b") \
        .to_pandas().iloc[0]
    assert int(d3.ks_num) == 0


# --- CountMinSketch ----------------------------------------------------------

def test_cms_point_estimates_upper_biased_and_close():
    import numpy as np

    from mdvalidate_ray.state.sketches import CountMinSketch

    rng = np.random.RandomState(7)
    # zipf-ish corpus: key_i appears ~1000/i times
    keys, truth = [], {}
    for i in range(1, 101):
        c = 1000 // i
        keys += [f"k{i}"] * c
        truth[f"k{i}"] = c
    rng.shuffle(keys)
    cms = CountMinSketch(width=2048, depth=5)
    # add in 7 chunks to exercise incremental adds
    for chunk in np.array_split(np.asarray(keys, dtype=object), 7):
        cms.add(chunk)
    probe = [f"k{i}" for i in range(1, 101)]
    est = cms.estimate(probe)
    n = sum(truth.values())
    for name, e in zip(probe, est):
        assert e >= truth[name]                      # never undercounts
        assert e <= truth[name] + cms.eps * n * 3    # and stays near

    absent = cms.estimate([f"zz{i}" for i in range(50)])
    assert (absent <= cms.eps * n * 3).all()


def test_cms_merge_equals_single_pass_and_roundtrips():
    import numpy as np

    from mdvalidate_ray.state.sketches import CountMinSketch

    a_vals = [f"x{i % 37}" for i in range(500)]
    b_vals = [f"x{i % 11}" for i in range(300)]
    one = CountMinSketch(width=512, depth=4).add(a_vals + b_vals)
    merged = CountMinSketch(width=512, depth=4).add(a_vals).merge(
        CountMinSketch(width=512, depth=4).add(b_vals))
    assert (one.table == merged.table).all()
    assert one.n == merged.n == 800

    back = CountMinSketch.from_bytes(one.to_bytes())
    assert (back.table == one.table).all()
    assert (back.estimate(["x0", "x1"]) == one.estimate(["x0", "x1"])).all()


def test_cms_weighted_adds():
    from mdvalidate_ray.state.sketches import CountMinSketch

    cms = CountMinSketch(width=1024, depth=5)
    cms.add(["a", "b"], counts=[10, 3])
    est = cms.estimate(["a", "b"])
    assert est[0] >= 10 and est[1] >= 3
    assert est[0] <= 13 and est[1] <= 13


def test_word_freq_cms_bounds(ray_session):
    """The CMS catalog query's invariant: estimates never undercount the
    exact (oracled) top-word counts and stay within the ε·N bound."""
    import numpy as np

    from mdvalidate_ray.queries import word_freq_cms
    from mdvalidate_ray.state.sketches import CountMinSketch

    t = word_freq_cms("/root/testdata/sf0.001")
    cnt = np.asarray(t.column("cnt"), dtype=np.int64)
    est = np.asarray(t.column("est_cnt"), dtype=np.int64)
    n = int(t.column("n_total")[0].as_py())
    eps = CountMinSketch(width=4096, depth=5).eps
    assert (est >= cnt).all()
    assert (est <= cnt + 3 * eps * n).all()
