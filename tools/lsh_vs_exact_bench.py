"""Evidence run for the embedding near-dup tiering: at 10^5 vectors the
hyperplane-LSH path must beat the exact O(n^2) block-pair cross-join on
wall time while keeping recall on planted near-dup pairs.

Synthesizes a deterministic corpus (seeded gaussian, dim 64 so random
cosines concentrate well below the 0.95 threshold), plants one near-dup
per 10 vectors, times both paths in one Ray session (warm object store),
and reports pair counts, recall of the LSH path vs the exact path, and
the wall-time ratio.  Records go to BASELINE.md.

Usage: python tools/lsh_vs_exact_bench.py [n_vectors]
"""

import sys
import time

import numpy as np
import pyarrow as pa

import ray


def build_corpus(n: int, dim: int = 64, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # every 10th vector's successor becomes its near-copy (cos >= ~0.999)
    src = np.arange(0, n - 1, 10)
    base[src + 1] = base[src] + 0.02 * rng.standard_normal(
        (len(src), dim)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(base), pa.list_(pa.float32())),
    })


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")

    from mdvalidate_ray.functions.similarity import (
        embedding_near_duplicates,
        embedding_near_duplicates_lsh,
    )

    tbl = build_corpus(n)
    # 32 blocks ≈ the shape a real parquet read produces (from_arrow
    # yields ONE block, which serializes every per-block stage onto a
    # single task — not representative of any at-scale input)
    ds = ray.data.from_arrow(tbl).repartition(32).materialize()

    t0 = time.time()
    lsh = embedding_near_duplicates_lsh(ds, 0.95)
    t_lsh = time.time() - t0
    print(f"LSH   pairs: {lsh.num_rows}  sec: {t_lsh:.2f}", flush=True)

    t0 = time.time()
    exact = embedding_near_duplicates(ds, 0.95)
    t_exact = time.time() - t0
    print(f"EXACT pairs: {exact.num_rows}  sec: {t_exact:.2f}", flush=True)

    def pairs(t: pa.Table) -> set:
        return set(zip(t.column("key_a").to_pylist(),
                       t.column("key_b").to_pylist()))

    pe, pl = pairs(exact), pairs(lsh)
    recall = len(pe & pl) / max(len(pe), 1)
    print(f"n={n} recall(LSH vs exact)={recall:.4f} "
          f"speedup={t_exact / max(t_lsh, 1e-9):.2f}x "
          f"extra_lsh_pairs={len(pl - pe)}")
    ray.shutdown()


if __name__ == "__main__":
    main()
