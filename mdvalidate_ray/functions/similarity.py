"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute_force` — the exact baseline: the query matrix is
  broadcast once per actor (constructor arg → object store), each batch
  contributes a partial top-k via one numpy matmul, and the driver merges
  (#batches × k) candidate rows per query — no shuffle, no full
  materialization.  This is the pattern that scales: compute moves to the
  data, only top-k rows move back.
* :class:`IVFIndex` / :func:`knn_ivf` — the scale path: k-means centroids
  trained on a driver-side sample, every batch assigns its vectors to
  centroids (one matmul) and keeps only vectors in the ``nprobe`` clusters
  nearest to any query; the brute-force pass then runs on that pruned
  stream.  With nprobe == n_clusters it degrades to exact search.
* :func:`embedding_near_duplicates` — cosine near-dup pairs via the same
  partial-top-k machinery (every vector is a query) at test scale, LSH
  hyperplane banding at corpus scale.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    dim = len(col[0])
    return flat.reshape(len(batch), dim)


def _topk_partial_batch(batch: pa.Table, *, queries, k: int, column: str,
                        key: str) -> pa.Table:
    """Task form of :class:`_TopKPartial`: the query matrix is tiny and
    its normalization is microseconds, so a plain task pool (immediate
    full parallelism, no actor-pool autoscale ramp) wins outright."""
    return _TopKPartial(queries, k, column, key)(batch)


class _TopKPartial:
    """Per-batch local top-k against the (small) query matrix; each batch
    emits its local top-k rows per query."""

    def __init__(self, queries: np.ndarray, k: int, column: str, key: str):
        # float64 so scores match a double-precision SQL oracle bit-for-bit
        # after rounding
        self.q = _normalize(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.column).astype(np.float64))
        keys = batch.column(self.key).to_pylist()
        keys_np = np.asarray(keys, dtype=np.int64)
        scores = self.q @ m.T                      # (n_queries, batch)
        k = min(self.k, m.shape[0])
        rows = []
        for qi in range(self.q.shape[0]):
            # lexsort: highest score first, and on exact score ties the
            # SMALLER key — matches the oracle's ORDER BY sim DESC, id ASC
            order = np.lexsort((keys_np, -scores[qi]))[:k]
            for j in order:
                rows.append({"query_id": qi, "key": keys[int(j)],
                             "score": float(scores[qi, int(j)])})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("query_id", pa.int64()), ("key", pa.int64()),
             ("score", pa.float64())]))


def knn_brute_force(ds, queries: np.ndarray, k: int = 10, *,
                    column: str = "embedding", key: str = "vec_id",
                    concurrency=(1, 8)) -> pa.Table:
    """Exact cosine top-k for each query row.  Returns
    (query_id, rank, key, score) sorted by (query_id, rank)."""
    partials = ds.map_batches(
        _topk_partial_batch,
        fn_kwargs=dict(queries=queries, k=k, column=column, key=key),
        batch_format="pyarrow", zero_copy_batch=True)
    heaps: dict[int, list] = {}
    for row in partials.iter_rows():
        h = heaps.setdefault(row["query_id"], [])
        # (score, -key): on score ties the smaller key sorts HIGHER, so the
        # kept set matches the oracle's ORDER BY sim DESC, vec_id ASC
        item = (row["score"], -row["key"])
        if len(h) < k:
            heapq.heappush(h, item)
        elif item > h[0]:
            heapq.heapreplace(h, item)
    out = []
    for qi in sorted(heaps):
        ranked = sorted(((s, -nk) for s, nk in heaps[qi]),
                        key=lambda t: (-t[0], t[1]))
        for rank, (score, kk) in enumerate(ranked):
            out.append({"query_id": qi, "rank": rank, "key": kk,
                        "score": score})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("key", pa.int64()), ("score", pa.float64())]))


def quantize_e3(m: np.ndarray) -> np.ndarray:
    """round-half-away(x · 1000) as int64 — bit-identical to DuckDB's
    ``round(x::DOUBLE * 1000)`` on the same float32 input (f32→f64 is
    exact, the f64 multiply is the same IEEE op both sides)."""
    v = np.asarray(m, dtype=np.float64) * 1000.0
    return np.where(v >= 0, np.floor(v + 0.5),
                    np.ceil(v - 0.5)).astype(np.int64)


def _int_topk_partial(batch: pa.Table, *, q_int, q_keys, k: int,
                      column: str, key: str, label_col=None,
                      q_labels=None) -> pa.Table:
    """Per-batch local integer top-k for :func:`knn_int_exact`."""
    m = quantize_e3(_batch_matrix(batch, column))
    keys_np = batch.column(key).to_numpy(zero_copy_only=False).astype(
        np.int64)
    labels_np = (batch.column(label_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
        if label_col is not None else None)
    scores = q_int @ m.T                            # (nq, batch) int64
    rows = []
    for qi in range(q_int.shape[0]):
        cand = keys_np != q_keys[qi]                # a query never
        if labels_np is not None:                   # matches itself
            cand &= labels_np != q_labels[qi]       # hard-negative mode
        if not cand.any():
            continue
        ck, cs = keys_np[cand], scores[qi][cand]
        order = np.lexsort((ck, -cs))[:k]
        for j in order:
            rows.append({"query_id": int(q_keys[qi]),
                         "key": int(ck[j]), "score_e6": int(cs[j])})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("query_id", pa.int64()), ("key", pa.int64()),
         ("score_e6", pa.int64())]))


def knn_int_exact(ds, queries: np.ndarray, query_keys: np.ndarray,
                  k: int = 10, *, column: str = "embedding",
                  key: str = "vec_id", label_col: str | None = None,
                  q_labels: np.ndarray | None = None) -> pa.Table:
    """Exact maximum-inner-product top-k with INTEGER scores — the
    SQL-oracled correctness gate next to :func:`knn_brute_force`'s
    float-cosine surface: both the query matrix and every corpus batch
    quantize to round-half-away ×1000 int64, scores are integer dot
    products (no float accumulation order to diverge, DuckDB
    ``list_dot_product`` over the same transform is bit-identical),
    ranking is (score desc, key asc) with self-matches excluded.  With
    ``label_col``/``q_labels`` set, same-label candidates are ALSO
    excluded — hard-negative mining for contrastive training (the most
    query-similar vectors of a DIFFERENT class).

    Returns (query_id, rank[1-based], vec_id, score_e6) sorted by
    (query_id, rank).  Scale plan: the query matrix broadcasts via the
    task closure (tiny); each batch emits ≤ k·n_queries partial rows;
    the driver heap-merges O(blocks · k · n_queries) rows — corpus
    vectors never leave their workers."""
    q_int = quantize_e3(queries)
    q_keys = np.asarray(query_keys, dtype=np.int64)
    partials = ds.map_batches(
        _int_topk_partial,
        fn_kwargs=dict(q_int=q_int, q_keys=q_keys, k=k, column=column,
                       key=key, label_col=label_col,
                       q_labels=(None if q_labels is None else
                                 np.asarray(q_labels, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)
    heaps: dict[int, list] = {}
    for row in partials.iter_rows():
        h = heaps.setdefault(row["query_id"], [])
        item = (row["score_e6"], -row["key"])
        if len(h) < k:
            heapq.heappush(h, item)
        elif item > h[0]:
            heapq.heapreplace(h, item)
    out = []
    for qi in sorted(heaps):
        ranked = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (score, nk) in enumerate(ranked, 1):
            out.append({"query_id": qi, "rank": rank, "vec_id": -nk,
                        "score_e6": score})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("vec_id", pa.int64()), ("score_e6", pa.int64())]))


def _pack_matrix_col(m: np.ndarray) -> pa.ListArray:
    """(n, d) matrix → Arrow list column, one fixed-width list per row —
    the shared vector-packing step of the cached-iteration operators
    (logreg_train / mmr_select / kcenter_select)."""
    n, d = m.shape
    assert n * d < (1 << 31), \
        "block too large for int32 list offsets — lower the block size"
    offs = np.arange(n + 1, dtype=np.int32) * d
    return pa.ListArray.from_arrays(pa.array(offs),
                                    pa.array(m.reshape(-1)))


def _unwrap_np(ref) -> np.ndarray:
    """ray.get an ObjectRef unless the broadcast already arrived inline."""
    import ray

    return ray.get(ref) if not isinstance(ref, np.ndarray) else ref


def _drop_chosen(chosen: np.ndarray, keys_np: np.ndarray, *arrays):
    """Filter rows whose key is in the sorted ``chosen`` set (a sentinel
    score would wrap under negation in the lexsort — see mmr_select).
    Returns (keys, *arrays) filtered, or None when nothing remains."""
    if len(chosen):
        pos = np.searchsorted(chosen, keys_np)
        pos[pos == len(chosen)] = 0
        keep = chosen[pos] != keys_np
        keys_np = keys_np[keep]
        if not len(keys_np):
            return None
        arrays = tuple(a[keep] for a in arrays)
    return (keys_np,) + arrays


def logreg_train(ds, *, column: str = "embedding",
                 label_col: str = "label", positive_label: int = 0,
                 epochs: int = 20, lr: float = 0.5,
                 l2: float = 1e-3) -> dict:
    """Distributed full-batch logistic-regression trainer — the
    quality-classifier piece of a curation pipeline (the fasttext-style
    linear probe: train on labeled vectors here, score the corpus with
    the existing linear scorer).  Gradient descent from w₀ = 0 with a
    bias feature, L2 on the non-bias weights.

    Ray shape mirrors kmeans_fit's cached-iteration pattern: ONE pass
    materializes the pruned (vector, y) blocks into the object store;
    each epoch broadcasts the (dim+1)-vector of weights via ``ray.put``
    and runs a task wave computing per-block (Xᵀ(σ(Xw)−y), Σ logloss,
    n_correct, n) partials — per epoch only #blocks small tuples reach
    the driver, which folds them in CANONICAL block order (the ref list
    order is fixed by the materialized blocks, so float sums are
    run-invariant) and takes one step.  Nothing corpus-sized moves and
    there is no shuffle; epoch count bounds the rounds.

    Deterministic: given the same block layout the result is
    bit-identical to a single-process numpy run over the same blocks
    (pinned by test_logreg_train_matches_naive); across layouts the
    float fold order changes, so runs agree to ~1e-12, not bitwise —
    the documented float-iteration contract (same as kmeans).

    Returns {"weights" (dim+1, bias last), "loss_per_epoch",
    "n_correct_per_epoch", "n"}."""
    import ray

    def featurize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"_y": pa.array([], pa.float64()),
                             "_x": pa.array([],
                                            pa.list_(pa.float64()))})
        m = _batch_matrix(b, column).astype(np.float64)
        y = (b.column(label_col).to_numpy(zero_copy_only=False)
             .astype(np.int64) == positive_label).astype(np.float64)
        return pa.Table.from_arrays([pa.array(y), _pack_matrix_col(m)],
                                    names=["_y", "_x"])

    feats = ds.select_columns([column, label_col]).map_batches(
        featurize, batch_format="pyarrow").materialize()
    refs = [r for r in feats.to_arrow_refs()]

    def block_grad(tbl: pa.Table, w_ref) -> tuple | None:
        if tbl.num_rows == 0 or "_y" not in tbl.schema.names:
            return None
        w = ray.get(w_ref) if not isinstance(w_ref, np.ndarray) else w_ref
        y = tbl.column("_y").to_numpy(zero_copy_only=False)
        lv = tbl.column("_x").combine_chunks()
        x = lv.flatten().to_numpy(zero_copy_only=False).reshape(
            len(y), -1)
        z = x @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.concatenate([x.T @ r, [r.sum()]])
        # log-loss via the stable softplus form log(1+e^z) − y·z
        loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
        correct = int(np.sum((p >= 0.5) == (y == 1.0)))
        return g, loss, correct, len(y)

    grad_task = ray.remote(num_cpus=1)(block_grad)
    # dim probe: one ROW, not a block — pulling a whole featurized
    # block to the driver would contradict "nothing corpus-sized moves"
    probe = feats.take(1)
    if not probe:
        raise ValueError("logreg_train: empty input dataset")
    dim = len(probe[0]["_x"])
    w = np.zeros(dim + 1, dtype=np.float64)
    losses, corrects, n_total = [], [], 0
    for _ in range(epochs):
        wref = ray.put(w)
        parts = [p for p in ray.get(
            [grad_task.remote(r, wref) for r in refs]) if p is not None]
        g = np.zeros_like(w)
        loss, correct, n_total = 0.0, 0, 0
        for gb, lb, cb, nb in parts:     # canonical ref-list order
            g += gb
            loss += lb
            correct += cb
            n_total += nb
        g /= n_total
        g[:-1] += l2 * w[:-1]
        w = w - lr * g
        losses.append(loss / n_total)
        corrects.append(correct)
    return {"weights": w, "loss_per_epoch": losses,
            "n_correct_per_epoch": corrects, "n": n_total}


def mmr_select(ds, query: np.ndarray, k: int = 10, *, lam_pct: int = 70,
               column: str = "embedding", key: str = "vec_id",
               exclude_keys: tuple = ()) -> pa.Table:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein,
    SIGIR 1998) — pick ``k`` vectors greedily maximizing
    ``lam·relevance − (1−lam)·redundancy``, the diversity-aware
    retrieval/curation primitive next to greedy_coverage_selection's
    vocabulary coverage.  Integer-exact and deterministic:
    ``mmr(x) = lam_pct·rel(x) − (100−lam_pct)·max_{s∈S} sim(x,s)``
    where rel/sim are int64 dot products of ×1000 half-away-quantized
    vectors (:func:`quantize_e3`) and ties break to the smaller key;
    the first pick is the pure-relevance argmax (empty-S penalty 0).

    Ray shape mirrors greedy_coverage_selection's cached-iteration
    pattern: ONE pass quantizes each block to (key, rel, int-vector)
    and materializes it into the object store; each of the k rounds
    broadcasts the selected matrix (≤ k·dim int64 — tiny) via
    ``ray.put`` and runs a task wave computing per-block
    (best mmr, key, vector) partials, so per round only #blocks small
    tuples reach the driver and corpus vectors never re-ship.  Round
    count is k, not data-sized; no shuffle anywhere.

    Returns ``(rank, key, rel_e6, mmr_e8)`` — mmr is in 10⁻⁸ units
    (the ×100 of lam_pct on top of the ×10⁶ quantized dot)."""
    import ray

    q_int = quantize_e3(np.asarray(query, dtype=np.float64).reshape(1, -1))
    mu = 100 - lam_pct
    excl = set(int(x) for x in exclude_keys)

    def featurize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"_key": pa.array([], pa.int64()),
                             "_rel": pa.array([], pa.int64()),
                             "_v": pa.array([], pa.list_(pa.int64()))})
        m = quantize_e3(_batch_matrix(b, column))
        keys_np = b.column(key).to_numpy(zero_copy_only=False).astype(
            np.int64)
        if excl:
            keep = ~np.isin(keys_np, np.fromiter(excl, dtype=np.int64))
            m, keys_np = m[keep], keys_np[keep]
        rel = (q_int @ m.T)[0]
        return pa.Table.from_arrays(
            [pa.array(keys_np), pa.array(rel), _pack_matrix_col(m)],
            names=["_key", "_rel", "_v"])

    feats = ds.select_columns([key, column]).map_batches(
        featurize, batch_format="pyarrow").materialize()
    refs = feats.to_arrow_refs()

    def block_best(tbl: pa.Table, sel_ref, chosen_ref) -> tuple:
        if tbl.num_rows == 0 or "_key" not in tbl.schema.names:
            return None
        sel = _unwrap_np(sel_ref)
        chosen = _unwrap_np(chosen_ref)
        keys_np = tbl.column("_key").to_numpy(zero_copy_only=False)
        rel = tbl.column("_rel").to_numpy(zero_copy_only=False)
        lv = tbl.column("_v").combine_chunks()
        m = lv.flatten().to_numpy(zero_copy_only=False).reshape(
            len(keys_np), -1)
        kept = _drop_chosen(chosen, keys_np, rel, m)
        if kept is None:
            return None
        keys_np, rel, m = kept
        if sel.shape[0]:
            maxsim = (m @ sel.T).max(axis=1)
        else:
            maxsim = np.zeros(len(keys_np), dtype=np.int64)
        score = lam_pct * rel - mu * maxsim
        order = np.lexsort((keys_np, -score))
        i = int(order[0])
        return (int(score[i]), int(keys_np[i]), int(rel[i]),
                m[i].copy())

    best_task = ray.remote(num_cpus=1)(block_best)
    sel = np.zeros((0, q_int.shape[1]), dtype=np.int64)
    chosen = np.zeros(0, dtype=np.int64)
    picks = []
    for _ in range(k):
        sref, cref = ray.put(sel), ray.put(chosen)
        parts = [p for p in ray.get(
            [best_task.remote(r, sref, cref) for r in refs])
            if p is not None]
        if not parts:
            break
        score, kv, rel, vec = max(parts, key=lambda p: (p[0], -p[1]))
        picks.append((len(picks) + 1, kv, rel, score))
        sel = np.vstack([sel, vec[None, :]])
        chosen = np.sort(np.append(chosen, kv))
    return pa.Table.from_arrays(
        [pa.array([p[0] for p in picks], pa.int64()),
         pa.array([p[1] for p in picks], pa.int64()),
         pa.array([p[2] for p in picks], pa.int64()),
         pa.array([p[3] for p in picks], pa.int64())],
        names=["rank", key, "rel_e6", "mmr_e8"])


def kcenter_select(ds, k: int = 10, *, column: str = "embedding",
                   key: str = "vec_id", seed_key: int | None = None
                   ) -> pa.Table:
    """Greedy k-center / farthest-point sampling (Gonzalez 1985, the
    2-approximation) — the pure-coverage coreset primitive next to
    :func:`mmr_select`'s relevance-diversity blend: starting from
    ``seed_key`` (default: the smallest key), repeatedly pick the point
    whose minimum squared distance to the selected set is LARGEST.
    Integer-exact and deterministic: with ×1000 half-away-quantized
    vectors, ``d²(x,s) = |x|² + |s|² − 2·x·s`` is a pure int64
    expression, and ties break to the smaller key.

    Ray shape: the mmr_select cached-iteration pattern — one quantize
    pass materializes (key, |x|², vector) blocks; each round broadcasts
    the selected matrix (≤ k·dim int64) and a task wave computes
    per-block (max min-d², key) partials; #blocks tuples reach the
    driver per round, corpus vectors never re-ship.  Each round
    rescans all t selected (O(k²·n) total dot products) — the
    actor-resident incremental variant (each actor keeps its block's
    running min-d² and folds in only the newest center) is the scale
    path for large k.

    Returns ``(rank, key, min_d2_e6)`` — min_d2 of each pick to the
    set selected before it (the seed's is 0 by convention)."""
    import ray

    def featurize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"_key": pa.array([], pa.int64()),
                             "_sq": pa.array([], pa.int64()),
                             "_v": pa.array([], pa.list_(pa.int64()))})
        m = quantize_e3(_batch_matrix(b, column))
        keys_np = b.column(key).to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.Table.from_arrays(
            [pa.array(keys_np), pa.array((m * m).sum(axis=1)),
             _pack_matrix_col(m)],
            names=["_key", "_sq", "_v"])

    feats = ds.select_columns([key, column]).map_batches(
        featurize, batch_format="pyarrow").materialize()
    refs = feats.to_arrow_refs()

    def block_far(tbl: pa.Table, sel_ref, sel_sq_ref, chosen_ref
                  ) -> tuple | None:
        if tbl.num_rows == 0 or "_key" not in tbl.schema.names:
            return None
        sel = _unwrap_np(sel_ref)
        sel_sq = _unwrap_np(sel_sq_ref)
        chosen = _unwrap_np(chosen_ref)
        keys_np = tbl.column("_key").to_numpy(zero_copy_only=False)
        sq = tbl.column("_sq").to_numpy(zero_copy_only=False)
        lv = tbl.column("_v").combine_chunks()
        m = lv.flatten().to_numpy(zero_copy_only=False).reshape(
            len(keys_np), -1)
        kept = _drop_chosen(chosen, keys_np, sq, m)
        if kept is None:
            return None
        keys_np, sq, m = kept
        d2 = (sq[:, None] + sel_sq[None, :] - 2 * (m @ sel.T)).min(axis=1)
        order = np.lexsort((keys_np, -d2))
        i = int(order[0])
        return (int(d2[i]), int(keys_np[i]), m[i].copy(), int(sq[i]))

    def block_seed(tbl: pa.Table, want: int) -> tuple | None:
        if tbl.num_rows == 0 or "_key" not in tbl.schema.names:
            return None
        keys_np = tbl.column("_key").to_numpy(zero_copy_only=False)
        hit = np.flatnonzero(keys_np == want) if want >= 0 else \
            np.array([int(np.argmin(keys_np))])
        if not len(hit):
            return None
        i = int(hit[0])
        lv = tbl.column("_v").combine_chunks()
        m = lv.flatten().to_numpy(zero_copy_only=False).reshape(
            len(keys_np), -1)
        return (int(keys_np[i]), m[i].copy(),
                int(tbl.column("_sq")[i].as_py()))

    far_task = ray.remote(num_cpus=1)(block_far)
    seed_task = ray.remote(num_cpus=1)(block_seed)

    want = -1 if seed_key is None else int(seed_key)
    cands = [c for c in ray.get(
        [seed_task.remote(r, want) for r in refs]) if c is not None]
    if not cands:
        return pa.schema([("rank", pa.int64()), (key, pa.int64()),
                          ("min_d2_e6", pa.int64())]).empty_table()
    if seed_key is None:
        cands.sort(key=lambda c: c[0])
    k0, v0, sq0 = cands[0]
    sel = v0[None, :].astype(np.int64)
    sel_sq = np.array([sq0], dtype=np.int64)
    chosen = np.array([k0], dtype=np.int64)
    picks = [(1, int(k0), 0)]
    for _ in range(1, k):
        sref, qref, cref = (ray.put(sel), ray.put(sel_sq),
                            ray.put(chosen))
        parts = [p for p in ray.get(
            [far_task.remote(r, sref, qref, cref) for r in refs])
            if p is not None]
        if not parts:
            break
        d2, kv, vec, vsq = max(parts, key=lambda p: (p[0], -p[1]))
        picks.append((len(picks) + 1, int(kv), int(d2)))
        sel = np.vstack([sel, vec[None, :]])
        sel_sq = np.append(sel_sq, vsq)
        chosen = np.sort(np.append(chosen, kv))
    return pa.Table.from_arrays(
        [pa.array([p[0] for p in picks], pa.int64()),
         pa.array([p[1] for p in picks], pa.int64()),
         pa.array([p[2] for p in picks], pa.int64())],
        names=["rank", key, "min_d2_e6"])


class IVFIndex:
    """Tiny IVF: k-means centroids from a driver-side sample (numpy Lloyd
    iterations, deterministic seed)."""

    def __init__(self, n_clusters: int = 16, iters: int = 10, seed: int = 0):
        self.n_clusters = n_clusters
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float32))
        rng = np.random.default_rng(self.seed)
        init = rng.choice(x.shape[0], size=min(self.n_clusters, x.shape[0]),
                          replace=False)
        c = x[init].copy()
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(c.shape[0]):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def probe_clusters(self, queries: np.ndarray, nprobe: int) -> np.ndarray:
        q = _normalize(np.asarray(queries, dtype=np.float32))
        scores = q @ self.centroids.T
        nprobe = min(nprobe, self.centroids.shape[0])
        per_query = np.argpartition(-scores, nprobe - 1, axis=1)[:, :nprobe]
        return np.unique(per_query)


class _IVFFilter:
    def __init__(self, centroids: np.ndarray, wanted: np.ndarray,
                 column: str):
        self.c = centroids
        self.wanted = set(int(w) for w in wanted)
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.column).astype(np.float32))
        assign = np.argmax(m @ self.c.T, axis=1)
        mask = pa.array([int(a) in self.wanted for a in assign])
        return batch.filter(mask)


def knn_ivf(ds, queries: np.ndarray, k: int = 10, *, n_clusters: int = 16,
            nprobe: int = 4, sample_size: int = 2048,
            column: str = "embedding", key: str = "vec_id",
            concurrency=(1, 8)) -> pa.Table:
    """IVF-pruned approximate top-k: same output schema as brute force."""
    sample_rows = ds.limit(sample_size).take_all()
    sample = np.asarray([r[column] for r in sample_rows], dtype=np.float32)
    index = IVFIndex(n_clusters=n_clusters).fit(sample)
    wanted = index.probe_clusters(queries, nprobe)
    pruned = ds.map_batches(
        _IVFFilter,
        fn_constructor_kwargs=dict(centroids=index.centroids, wanted=wanted,
                                   column=column),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
    return knn_brute_force(pruned, queries, k, column=column, key=key,
                           concurrency=concurrency)


_PAIR_SCHEMA = pa.schema([("key_a", pa.int64()), ("key_b", pa.int64()),
                          ("cosine", pa.float64())])


_SCORER_STATE: dict = {}


def _block_pair_batch(batch: pa.Table, *, refs_ref, threshold: float
                      ) -> pa.Table:
    """Task form of :class:`_BlockPairScorer`: the scorer (with its block
    LRU) lives in a per-worker-process cache keyed by the broadcast block
    list, so tasks keep the actor pool's block-decode amortization
    without its autoscale ramp."""
    import ray

    from mdvalidate_ray.state.proc_cache import get_or_build

    st = get_or_build(_SCORER_STATE, (refs_ref.hex(), threshold),
                      lambda: _BlockPairScorer(ray.get(refs_ref),
                                               threshold))
    return st(batch)


class _BlockPairScorer:
    """Stage over a Dataset of (i, j) block-index pairs: fetch the
    two normalized blocks from the object store (cached per worker) and
    emit all cross-block pairs with cosine ≥ threshold via one matmul."""

    _MAX_CACHED_BLOCKS = 16   # LRU bound: without it each actor would
    # asymptotically hold the whole normalized matrix

    def __init__(self, refs: list, threshold: float):
        self.refs = refs
        self.threshold = threshold
        self._cache: dict = {}   # insertion-ordered → cheap LRU

    def _block(self, i: int):
        hit = self._cache.pop(i, None)
        if hit is None:
            import ray

            t = ray.get(self.refs[i])
            keys = np.asarray(t.column("key").to_pylist(), dtype=np.int64)
            vecs = (np.stack([np.frombuffer(b, dtype=np.float64)
                              for b in t.column("vec").to_pylist()])
                    if len(t) else np.zeros((0, 1)))
            hit = (keys, vecs)
            if len(self._cache) >= self._MAX_CACHED_BLOCKS:
                self._cache.pop(next(iter(self._cache)))
        self._cache[i] = hit      # re-insert = most recently used
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ka, va = self._block(i)
            kb, vb = self._block(j)
            if not len(ka) or not len(kb):
                continue
            sims = va @ vb.T
            # boolean mask FIRST, indices from the (sparse) survivors —
            # never materialize dense index arrays over the full matrix
            mask = sims >= self.threshold
            if i == j:                     # upper triangle only
                mask &= (np.arange(len(kb))[None, :]
                         > np.arange(len(ka))[:, None])
            xi, yi = np.nonzero(mask)
            if not len(xi):
                continue
            a, b = ka[xi], kb[yi]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_s.append(sims[xi, yi])
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_a)),
             pa.array(np.concatenate(out_b)),
             pa.array(np.concatenate(out_s))],
            schema=_PAIR_SCHEMA)


def embedding_near_duplicates(ds, threshold: float = 0.95, *,
                              column: str = "embedding",
                              key: str = "vec_id",
                              concurrency=(1, 8),
                              max_block_rows: int = 4096) -> pa.Table:
    """All pairs with cosine ≥ threshold — EXACT, distributed.

    Block cross-join: the embeddings are normalized once per block
    (``map_batches``), materialized to the object store, and a Dataset of
    B(B+1)/2 block-index pairs drives one matmul per block pair in an
    actor pool — the corpus never transits the driver (only the qualifying
    pairs do).  Cost is inherently O(n²) flops spread over the cluster; at
    corpus scale and high thresholds use
    :func:`embedding_near_duplicates_lsh`, which prunes candidate
    generation to LSH buckets (sub-quadratic) at the price of a recall
    guarantee that only holds for tight thresholds."""
    import ray
    import ray.data

    def prep(b: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(b, column).astype(np.float64))
        return pa.Table.from_arrays(
            [b.column(key).cast(pa.int64()),
             pa.array([m[i].tobytes() for i in range(m.shape[0])],
                      pa.binary())],
            names=["key", "vec"])

    normalized = ds.map_batches(prep, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    # per-pair score matrices are O(rows_i × rows_j) float64: re-block so
    # no block exceeds ``max_block_rows`` (4096² ≈ 134 MB per matmul) —
    # without this a single-block corpus (from_arrow, a fat parquet row
    # group) makes ONE task allocate an n×n matrix (100k rows → 80 GB)
    import math

    total = normalized.count()
    nb_target = max(1, math.ceil(total / max_block_rows))
    refs = normalized.to_arrow_refs()
    if len(refs) < nb_target:
        normalized = normalized.repartition(nb_target).materialize()
        refs = normalized.to_arrow_refs()
    nb = len(refs)
    items = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    refs_ref = ray.put(refs)
    pairs_ds = ray.data.from_items(items).map_batches(
        _block_pair_batch,
        fn_kwargs=dict(refs_ref=refs_ref, threshold=threshold),
        batch_format="pyarrow")
    out = pairs_ds.take_all()                 # qualifying pairs only: tiny
    out.sort(key=lambda r: (r["key_a"], r["key_b"]))
    return pa.Table.from_pylist(out, schema=_PAIR_SCHEMA)


class _HyperplaneLSH:
    """Sign-random-projection stage: each vector → per-band bucket keys.

    For unit vectors, P[sign match per bit] = 1 − θ/π; banding b bits per
    band makes near-duplicate pairs (θ small) collide in ≥1 band with high
    probability while far pairs rarely do — the scale path for
    embedding near-dup: only (band, bucket, key, vector) rows shuffle,
    never the full pairwise matrix."""

    def __init__(self, dim: int, n_bits: int = 128, bands: int = 8,
                 seed: int = 99, column: str = "embedding",
                 key: str = "vec_id"):
        assert n_bits % bands == 0
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits)).astype(np.float64)
        self.bands = bands
        self.bits_per_band = n_bits // bands
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.column).astype(np.float64))
        keys = batch.column(self.key).cast(pa.int64())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = keys.to_numpy(zero_copy_only=False)
        bits = (m @ self.planes) > 0                  # (n, n_bits)
        n = m.shape[0]
        # bucket id per (row, band): a float64 matvec over the bit chunks —
        # exact for bits_per_band ≤ 52 and avoids integer broadcast
        # multiplies (pathological on some hosts; see window.py notes)
        chunks = bits.reshape(n * self.bands, self.bits_per_band)
        w = 2.0 ** np.arange(self.bits_per_band)
        buckets = (chunks.astype(np.float64) @ w).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
             pa.array(buckets),
             pa.array(np.repeat(keys, self.bands))],
            names=["band", "bucket", "key"])


def embedding_near_duplicates_lsh(ds, threshold: float = 0.9, *,
                                  column: str = "embedding",
                                  key: str = "vec_id",
                                  n_bits: int | None = None,
                                  bands: int = 8, max_bucket: int = 2000,
                                  n_parts: int = 32,
                                  concurrency=(1, 8)) -> pa.Table:
    """Scale path for cosine near-dup pairs: hyperplane-LSH banding →
    coarse-bucket candidate-pair emission → exact cosine verification of
    the (small) candidate set.  Same output contract as
    :func:`embedding_near_duplicates`.

    What moves where: the banding shuffle carries ONLY ``(band:int32,
    bucket:int64, key:int64)`` rows — never vectors (8× leaner than
    shipping float64 payloads per band); candidate pairs are emitted with
    one Python group call per COARSE bucket (``n_parts`` calls total, runs
    detected vectorized after an in-bucket sort — the same shape as the
    simhash path in dedup.py); only the candidate keys' vectors are then
    re-read from the corpus (distributed ``np.isin`` filter, broadcast key
    array) and scored exactly in one float64 matmul.  16 bits/band keeps
    random buckets near-singleton at 10⁵–10⁷ vectors, so candidate volume
    tracks the true near-dup count, not n²."""
    import ray

    import pyarrow.compute as pc

    dim = len(ds.take(1)[0][column])
    if n_bits is None:
        # false-candidate volume is ~ n² · bands · E[p_pair^bits]: with
        # FIXED bits it grows quadratically (measured: 9M random-collision
        # candidates at 3×10^5 iid vectors with 16 bits/band).  Growing
        # bits_per_band with log2(n) keeps the expected random-collision
        # count ~linear in n; recall stays ~1 for pairs well above the
        # threshold (the tight-threshold contract below) while pairs AT
        # the threshold ride the usual LSH S-curve.
        n_corpus = ds.count()
        bits_pb = max(16, int(np.ceil(np.log2(max(n_corpus, 2)))) + 2)
        n_bits = bands * bits_pb
    pair_schema = pa.schema([("key_a", pa.int64()), ("key_b", pa.int64()),
                             ("cosine", pa.float64())])

    banded = ds.map_batches(
        _HyperplaneLSH,
        fn_constructor_kwargs=dict(dim=dim, n_bits=n_bits, bands=bands,
                                   column=column, key=key),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)

    golden = np.uint64(0x9E3779B97F4A7C15)

    def tag(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        buck = b.column("bucket").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        h = (buck * golden) ^ band
        return b.append_column(
            "_cb", pa.array((h % np.uint64(n_parts)).astype("int64")))

    cand_schema = pa.schema([("key_a", pa.int64()), ("key_b", pa.int64())])

    def emit_pairs(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_cb"])
        idx = pc.sort_indices(g, sort_keys=[("band", "ascending"),
                                            ("bucket", "ascending"),
                                            ("key", "ascending")])
        s = g.take(idx)
        if len(s) < 2:
            return cand_schema.empty_table()
        band = s.column("band").to_numpy(zero_copy_only=False)
        buck = s.column("bucket").to_numpy(zero_copy_only=False)
        ks = s.column("key").to_numpy(zero_copy_only=False)
        new = np.empty(len(s), dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (buck[1:] != buck[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(s))
        a_out, b_out = [], []
        for st, en in zip(starts.tolist(), ends.tolist()):
            m = en - st
            if m < 2 or m > max_bucket:
                continue
            kk = ks[st:en]
            iu, ju = np.triu_indices(m, k=1)
            a_out.append(kk[iu])
            b_out.append(kk[ju])
        if not a_out:
            return cand_schema.empty_table()
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        keep = a != b                      # duplicated vec_ids guard
        return pa.Table.from_arrays([pa.array(a[keep]), pa.array(b[keep])],
                                    schema=cand_schema)

    candidates = banded.map_batches(tag, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                       .groupby("_cb").map_groups(emit_pairs,
                                                  batch_format="pyarrow")

    # Cross-band pair dedup: a pair collides in up to `bands` buckets.
    # One coarse exchange on a pair hash + vectorized in-bucket distinct —
    # group calls bounded by n_parts, not by the number of distinct pairs.
    def tag_pair(b: pa.Table) -> pa.Table:
        a = b.column("key_a").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        c = b.column("key_b").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        h = (a * golden) ^ c
        return b.append_column(
            "_cb", pa.array((h % np.uint64(n_parts)).astype("int64")))

    def distinct_pairs(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_cb"])
        idx = pc.sort_indices(g, sort_keys=[("key_a", "ascending"),
                                            ("key_b", "ascending")])
        s = g.take(idx)
        a = s.column("key_a").to_numpy(zero_copy_only=False)
        c = s.column("key_b").to_numpy(zero_copy_only=False)
        keep = np.empty(len(s), dtype=bool)
        if len(s):
            keep[0] = True
            keep[1:] = (a[1:] != a[:-1]) | (c[1:] != c[:-1])
        return s.filter(pa.array(keep))

    cand_m = candidates.map_batches(tag_pair, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                       .groupby("_cb").map_groups(distinct_pairs,
                                                  batch_format="pyarrow") \
                       .materialize()      # candidate pairs only: small
    cand_blocks = [t for t in (ray.get(r) for r in cand_m.to_arrow_refs())
                   if t.num_rows]         # empty blocks lose their schema
    if not cand_blocks:
        return pair_schema.empty_table()
    # only the KEY columns touch the driver (16 B/pair); vectors and the
    # per-pair cosine math never do
    need = np.unique(np.concatenate(
        [t.column(c).to_numpy(zero_copy_only=False)
         for t in cand_blocks for c in ("key_a", "key_b")]))
    need_ref = ray.put(need)

    def pick(b: pa.Table) -> pa.Table:
        want = ray.get(need_ref)           # zero-copy plasma read
        kcol = b.column(key).cast(pa.int64())
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kcol = kcol.to_numpy(zero_copy_only=False)
        mask = np.isin(kcol, want)
        if not mask.any():
            return pa.schema([("key", pa.int64()),
                              ("vec", pa.binary())]).empty_table()
        m = _normalize(_batch_matrix(b, column).astype(np.float64))[mask]
        sel = kcol[mask]
        return pa.Table.from_arrays(
            [pa.array(sel),
             pa.array([m[i].tobytes() for i in range(len(sel))],
                      pa.binary())],
            names=["key", "vec"])

    got_m = ds.map_batches(pick, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    got_blocks = [t for t in (ray.get(r) for r in got_m.to_arrow_refs())
                  if t.num_rows]
    if not got_blocks:
        return pair_schema.empty_table()
    got_tbl = pa.concat_tables(got_blocks)
    # ONE contiguous (n_candidate_keys, dim) matrix, key-sorted, broadcast
    # once — the candidate-key working set is O(candidates), not O(corpus)
    gk = got_tbl.column("key").to_numpy(zero_copy_only=False)
    raw = b"".join(got_tbl.column("vec").to_pylist())
    mat = np.frombuffer(raw, dtype=np.float64).reshape(len(gk), -1)
    order = np.argsort(gk, kind="stable")
    bundle_ref = ray.put((gk[order], np.ascontiguousarray(mat[order])))

    # DISTRIBUTED verify: each candidate block gathers its two vector
    # sides by searchsorted probe into the broadcast matrix and scores
    # them in one einsum.  (A driver-side gather paid two O(candidates ×
    # dim) fresh allocations — ~18 s at 10^5 vectors / 10^6 candidates on
    # this host; per-block worker gathers are both parallel and small.)
    def score(b: pa.Table) -> pa.Table:
        gk_s, m = ray.get(bundle_ref)      # zero-copy plasma read
        a = b.column("key_a").to_numpy(zero_copy_only=False)
        c = b.column("key_b").to_numpy(zero_copy_only=False)
        sims = np.einsum("ij,ij->i", m[np.searchsorted(gk_s, a)],
                         m[np.searchsorted(gk_s, c)])
        keep = sims >= threshold
        return pa.Table.from_arrays(
            [pa.array(np.minimum(a[keep], c[keep])),
             pa.array(np.maximum(a[keep], c[keep])),
             pa.array(sims[keep])],
            schema=pair_schema)

    out = cand_m.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    lo = np.array([r["key_a"] for r in out], dtype=np.int64)
    hi = np.array([r["key_b"] for r in out], dtype=np.int64)
    sims = np.array([r["cosine"] for r in out], dtype=np.float64)
    order = np.lexsort((hi, lo))
    return pa.Table.from_arrays(
        [pa.array(lo[order]), pa.array(hi[order]), pa.array(sims[order])],
        schema=pair_schema)


def embedding_near_duplicates_auto(ds, threshold: float = 0.9, *,
                                   column: str = "embedding",
                                   key: str = "vec_id",
                                   exact_below: int = 20_000,
                                   **lsh_kwargs) -> pa.Table:
    """Tiered dispatcher: exact block-pair cross-join below
    ``exact_below`` vectors (O(n²) flops are cheap there and recall is
    1.0 by construction), hyperplane-LSH banding above it (sub-quadratic
    candidate generation, recall ≥ ~0.9 at tight thresholds).  The
    ``ds.count()`` probe is metadata-cheap on parquet/lance reads."""
    n = ds.count()
    if n <= exact_below:
        return embedding_near_duplicates(ds, threshold, column=column,
                                         key=key)
    return embedding_near_duplicates_lsh(ds, threshold, column=column,
                                         key=key, **lsh_kwargs)


def _kmeans_partial(batch: pa.Table, *, centroids_ref, column: str
                    ) -> pa.Table:
    """Per-batch Lloyd partials against broadcast centroids: (sum vector,
    count, inertia) per cluster.  A plain TASK (not an actor pool): the
    ``ray.get`` of the centroid matrix is a zero-copy plasma read, so
    per-task setup is free — while an autoscaling actor pool paid its
    spin-up wave on EVERY Lloyd iteration (measured: the pool start, not
    the math, dominated small-corpus fits).  Only k × dim floats per
    batch cross the wire — the combiner shape that makes Lloyd
    iterations shuffle-free."""
    import ray

    c = ray.get(centroids_ref) if not isinstance(
        centroids_ref, np.ndarray) else centroids_ref
    if batch.num_rows == 0:
        k, dim = c.shape
        return pa.Table.from_pylist([{
            "sums": [0.0] * (k * dim), "counts": [0] * k, "inertia": 0.0,
        }])
    x = _batch_matrix(batch, column).astype(np.float64)
    d2 = (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )
    assign = np.argmin(d2, axis=1)
    k, dim = c.shape
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, x)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    inertia = float(d2[np.arange(len(x)), assign].sum())
    return pa.Table.from_pylist([{
        "sums": sums.reshape(-1).tolist(),
        "counts": counts.tolist(),
        "inertia": inertia,
    }])


def _kmeanspp(sample: np.ndarray, k: int, rng) -> np.ndarray:
    """Greedy k-means++ over a (small) sample matrix: first seed = the
    point nearest the sample mean (deterministic), each next seed drawn
    by D² weighting with the given RNG."""
    n = sample.shape[0]
    if n <= k:
        out = np.zeros((k, sample.shape[1]))
        out[:n] = sample
        return out
    first = int(np.argmin(((sample - sample.mean(axis=0)) ** 2).sum(axis=1)))
    chosen = [first]
    d2 = ((sample - sample[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = int(rng.choice(n, p=p))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    return sample[chosen].copy()


def kmeans_fit(ds, *, column: str = "embedding", key: str = "vec_id",
               k: int = 8, iters: int = 5, concurrency=None,
               cache: bool = True) -> dict:
    """Distributed Lloyd k-means over the FULL dataset (unlike
    :class:`IVFIndex`, which fits on a driver-side sample).

    Per iteration: broadcast the centroids (``ray.put`` once, read once
    per actor), one ``map_batches`` pass emits per-batch partial
    (sums, counts, inertia), the driver folds ~#batches tiny rows and
    updates the k × dim centroid matrix.  Nothing corpus-sized ever
    reaches the driver and there is no shuffle — the only all-batch
    traffic is k×dim doubles each way per iteration.

    Deterministic AND partition-invariant: seeding draws the 64·k rows
    with the smallest md5-hash of ``key`` (a distributed partial top-k on
    a pure key function — the same rows regardless of block layout; a
    hash-ordered prefix is an unbiased pseudo-random sample), then runs
    greedy k-means++ on that sample with a fixed RNG on the driver.
    Naive smallest-key seeding collapses onto whatever region happens to
    own the low ids — k-means++ spread is what makes blob recovery
    reliable.  Float folds happen in a canonical batch-partial order.
    Empty clusters keep their previous centroid.

    ``cache=True`` (default) materializes the pruned (key, column)
    projection into the object store once and runs each Lloyd pass as
    RAW Ray tasks over the cached block refs — the documented
    drop-to-raw-tasks case (iterative algorithm, per-iteration
    broadcast): a Ray Data execution per iteration re-paid the streaming
    executor's fixed startup five times for milliseconds of math.
    Right for corpora that fit the cluster's aggregate object store
    (embedding tables are narrow).  Pass ``cache=False`` at
    larger-than-store scale: every pass is a streaming ``map_batches``
    re-read from storage, the only shape that works there.

    Returns {"centroids", "sizes", "inertia_per_iter"}.
    """
    import ray

    from mdvalidate_ray.functions.dedup import _md5_token_hashes
    from mdvalidate_ray.functions.relational import topk_table

    ds = ds.select_columns([key, column])
    block_refs = None
    if cache:
        ds = ds.materialize()
        block_refs = ds.to_arrow_refs()   # refs only; blocks stay remote

    def add_hash(b: pa.Table) -> pa.Table:
        ks = [str(v) for v in b.column(key).to_pylist()]
        h = (_md5_token_hashes(ks).astype("uint64") if ks
             else np.zeros(0, dtype="uint64"))
        return b.append_column("_h", pa.array(h.astype("int64")))

    hashed = ds.select_columns([key, column]).map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True)
    seed_rows = topk_table(hashed, 64 * k, [("_h", "ascending"),
                                            (key, "ascending")])
    sample = _batch_matrix(seed_rows, column).astype(np.float64)
    rng = np.random.default_rng(0)
    centroids = _kmeanspp(sample, k, rng)
    inertia_per_iter: list[float] = []
    sizes = np.zeros(k, dtype=np.int64)
    part_task = ray.remote(num_cpus=1)(
        lambda blk, cm, col: _kmeans_partial(
            blk, centroids_ref=cm, column=col).to_pylist()[0])
    for _ in range(iters):
        ref = ray.put(centroids)
        if block_refs is not None:
            # raw task wave over cached blocks: block + centroid args are
            # ObjectRefs, dereferenced zero-copy inside the task
            parts = ray.get([part_task.remote(b, ref, column)
                             for b in block_refs])
        else:
            parts = ds.map_batches(
                _kmeans_partial,
                fn_kwargs=dict(centroids_ref=ref, column=column),
                batch_format="pyarrow", zero_copy_batch=True,
            ).take_all()
        dim = centroids.shape[1]
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        # canonical fold order → bit-identical results across runs
        for p in sorted(parts, key=lambda r: (r["inertia"], r["counts"])):
            sums += np.asarray(p["sums"], dtype=np.float64).reshape(k, dim)
            counts += np.asarray(p["counts"], dtype=np.int64)
            inertia += p["inertia"]
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        inertia_per_iter.append(inertia)
        sizes = counts
    return {"centroids": centroids, "sizes": sizes,
            "inertia_per_iter": inertia_per_iter}


def quantize_embeddings_int8(ds, *, key: str = "vec_id",
                             column: str = "embedding"):
    """Symmetric per-vector int8 quantization — ``q = round(x * 127 /
    max_abs(vec))`` (DuckDB ``round`` = half away from zero), emitted
    long-form as (key, idx, q) with 1-based ``idx`` so the exact values
    are SQL-auditable.  The compression step before shipping embeddings
    to an ANN index.

    Shuffle-free map fan-out; per batch the whole computation is three numpy
    passes over the flattened value buffer (per-vector max via
    ``np.maximum.reduceat``, gather, scale+round).  Operand order
    mirrors the SQL (``x*127.0`` THEN ``/max``) so float64 rounding is
    bit-identical across engines."""
    import numpy as np

    def quant(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out_schema = pa.schema([(key, pa.int64()), ("idx", pa.int64()),
                                ("q", pa.int64())])
        if n == 0:
            return out_schema.empty_table()
        col = b.column(column).combine_chunks()
        flat = np.abs(col.flatten().to_numpy(zero_copy_only=False)
                      .astype(np.float64))
        vals = col.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]   # flatten() already applied any slice offset
        lens = np.diff(offs)
        nonempty = lens > 0
        ma = np.zeros(n, dtype=np.float64)
        if nonempty.any():
            ma[nonempty] = np.maximum.reduceat(
                flat, offs[:-1][nonempty])
        per_val_ma = np.repeat(ma, lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            y = (vals * 127.0) / per_val_ma
        y[~np.isfinite(y)] = 0.0
        q = np.where(y >= 0, np.floor(y + 0.5),
                     np.ceil(y - 0.5)).astype(np.int64)
        keys = np.repeat(
            b.column(key).to_numpy(zero_copy_only=False), lens)
        total = int(lens.sum())
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(offs[:-1], lens) + 1)
        return pa.Table.from_arrays(
            [pa.array(keys, pa.int64()),
             pa.array(idx.astype(np.int64)),
             pa.array(q)],
            schema=out_schema)

    return ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True)


class LinearScorer:
    """Batched model inference, the actor-pool shape: "weights" build
    ONCE per actor in ``__init__`` (a real checkpoint — quality
    classifier, reward model head — would load here), and ``__call__``
    scores whole Arrow batches with one vectorized matmul-like pass.

    The stand-in model is a fixed linear head with deterministic
    integer-derived weights ``w_i = (((i·2654435761) mod 2001) − 1000) /
    1000`` (1-based i), and the score is ``Σ round(x_i · w_i · 10⁶)`` —
    each term rounds to int64 BEFORE summation, so the result is exact
    integer math and bit-identical to the SQL oracle regardless of
    either engine's float summation order."""

    def __init__(self, key: str = "vec_id", column: str = "embedding"):
        self.key = key
        self.column = column
        self._w: dict[int, np.ndarray] = {}     # per-dim weight cache

    def _weights(self, dim: int) -> np.ndarray:
        w = self._w.get(dim)
        if w is None:
            idx = np.arange(1, dim + 1, dtype=np.int64)
            w = (((idx * 2654435761) % 2001) - 1000) / 1000.0
            self._w[dim] = w
        return w

    def __call__(self, b: pa.Table) -> pa.Table:
        out_schema = pa.schema([(self.key, pa.int64()),
                                ("score_u", pa.int64())])
        n = b.num_rows
        if n == 0:
            return out_schema.empty_table()
        col = b.column(self.column).combine_chunks()
        offs = np.asarray(col.offsets, dtype=np.int64)
        lens = np.diff(offs)
        dim = int(lens[0])
        if not (lens == dim).all():
            raise ValueError("ragged embedding column")
        vals = col.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64).reshape(n, dim)
        # operand order mirrors the SQL: (x * w) * 1e6, then round half
        # away from zero per TERM, then integer summation
        t = vals * self._weights(dim) * 1_000_000.0
        terms = np.where(t >= 0, np.floor(t + 0.5),
                         np.ceil(t - 0.5)).astype(np.int64)
        return pa.Table.from_arrays(
            [b.column(self.key).cast(pa.int64()),
             pa.array(terms.sum(axis=1))],
            schema=out_schema)


def score_embeddings_linear(ds, *, key: str = "vec_id",
                            column: str = "embedding",
                            batch_size: int | None = None,
                            concurrency=(1, 8)):
    """Score every embedding with the deterministic linear head — the
    broadcast-free inference stage (state is per-actor, input streams,
    no shuffle anywhere)."""
    return ds.map_batches(LinearScorer,
                          fn_constructor_kwargs={"key": key,
                                                 "column": column},
                          batch_size=batch_size, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)


class PQIndex:
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split the (normalized) vector into
    ``m`` subspaces and k-means each subspace to ``k_codes`` centroids
    on a driver-side sample — a vector then stores as ``m`` uint8 codes
    (dim·4 → m bytes, e.g. 32× at dim 64 / m 8), and query scoring is
    an ADC lookup-table sum, no float vectors touched at scan time.
    The compression tier of the ANN family (IVF prunes WHICH vectors
    are scanned; PQ shrinks WHAT each scan touches — composable).
    Deterministic: seeded sample k-means, same contract as
    :class:`IVFIndex`."""

    def __init__(self, m: int = 8, k_codes: int = 16, iters: int = 10,
                 seed: int = 0):
        self.m = m
        self.k_codes = k_codes
        self.iters = iters
        self.seed = seed
        self.codebooks: np.ndarray | None = None   # (m, k, dsub)

    def fit(self, sample: np.ndarray) -> "PQIndex":
        x = _normalize(np.asarray(sample, dtype=np.float32))
        n, dim = x.shape
        if dim % self.m:
            raise ValueError(f"dim {dim} not divisible by m={self.m}")
        dsub = dim // self.m
        rng = np.random.default_rng(self.seed)
        books = np.empty((self.m, self.k_codes, dsub), dtype=np.float32)
        for j in range(self.m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            init = rng.choice(n, size=min(self.k_codes, n),
                              replace=False)
            c = xs[init].copy()
            for _ in range(self.iters):
                d = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d, axis=1)
                for ci in range(c.shape[0]):
                    members = xs[assign == ci]
                    if len(members):
                        c[ci] = members.mean(axis=0)
            books[j, :c.shape[0]] = c
            if c.shape[0] < self.k_codes:       # tiny sample: pad
                books[j, c.shape[0]:] = c[0]
        self.codebooks = books
        return self

    def encode(self, x: np.ndarray) -> np.ndarray:
        """(n, dim) float → (n, m) uint8 codes (per-subspace argmin)."""
        x = _normalize(np.asarray(x, dtype=np.float32))
        dsub = self.codebooks.shape[2]
        codes = np.empty((x.shape[0], self.m), dtype=np.uint8)
        for j in range(self.m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            d = ((xs[:, None, :] - self.codebooks[j][None, :, :]) ** 2) \
                .sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        return codes

    def adc_table(self, queries: np.ndarray) -> np.ndarray:
        """(nq, m, k) inner-product lookup table: q·x ≈ Σ_j lut[q, j,
        code_j] (normalized vectors → cosine ranking)."""
        q = _normalize(np.asarray(queries, dtype=np.float32))
        dsub = self.codebooks.shape[2]
        lut = np.empty((q.shape[0], self.m, self.k_codes),
                       dtype=np.float32)
        for j in range(self.m):
            lut[:, j, :] = q[:, j * dsub:(j + 1) * dsub] \
                @ self.codebooks[j].T
        return lut


class _PQScanStage:
    """Actor-pool ADC scan: codebooks + LUT build once per actor
    (``__init__``), per batch encode + table-sum + local top-k."""

    def __init__(self, index: PQIndex, queries: np.ndarray, k: int,
                 column: str, key: str):
        self.index = index
        self.lut = index.adc_table(queries)      # (nq, m, k)
        self.k = k
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        codes = self.index.encode(m)             # (n, m)
        nq = self.lut.shape[0]
        scores = np.zeros((nq, codes.shape[0]), dtype=np.float32)
        for j in range(self.index.m):
            scores += self.lut[:, j, codes[:, j]]
        keys = batch.column(self.key).to_numpy(zero_copy_only=False)
        out = {"query_id": [], "key": [], "score": []}
        kk = min(self.k, codes.shape[0])
        for qi in range(nq):
            idx = np.argpartition(-scores[qi], kk - 1)[:kk]
            out["query_id"].extend([qi] * kk)
            out["key"].extend(keys[idx].tolist())
            out["score"].extend(scores[qi][idx].astype(
                np.float64).tolist())
        return pa.Table.from_pydict(out, schema=pa.schema(
            [("query_id", pa.int64()), ("key", pa.int64()),
             ("score", pa.float64())]))


def knn_pq(ds, queries: np.ndarray, k: int = 10, *, m: int = 8,
           k_codes: int = 16, sample_size: int = 2048,
           column: str = "embedding", key: str = "vec_id",
           concurrency=(1, 8), index: "PQIndex | None" = None
           ) -> pa.Table:
    """PQ-compressed approximate top-k (same output schema as
    :func:`knn_brute_force`): train on a sample (or reuse a pre-fitted
    ``index`` — :func:`knn_ivf_pq` trains once for both stages),
    ADC-scan the corpus (m bytes per vector in flight, no float
    gathers), merge per-batch partial top-k on the driver.  Recall
    contract pinned by test_pq_recall."""
    if index is None:
        sample_rows = ds.limit(sample_size).take_all()
        sample = np.asarray([r[column] for r in sample_rows],
                            dtype=np.float32)
        index = PQIndex(m=m, k_codes=k_codes).fit(sample)
    partials = ds.map_batches(
        _PQScanStage,
        fn_constructor_kwargs=dict(index=index, queries=queries, k=k,
                                   column=column, key=key),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
    heaps: dict[int, list] = {}
    for row in partials.iter_rows():
        h = heaps.setdefault(row["query_id"], [])
        item = (row["score"], -row["key"])
        if len(h) < k:
            heapq.heappush(h, item)
        elif item > h[0]:
            heapq.heapreplace(h, item)
    out = []
    for qi in sorted(heaps):
        ranked = sorted(((s, -nk) for s, nk in heaps[qi]),
                        key=lambda t: (-t[0], t[1]))
        for rank, (score, kk2) in enumerate(ranked):
            out.append({"query_id": qi, "rank": rank, "key": kk2,
                        "score": score})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("key", pa.int64()), ("score", pa.float64())]))


def knn_ivf_pq(ds, queries: np.ndarray, k: int = 10, *,
               n_clusters: int = 16, nprobe: int = 4, m: int = 8,
               k_codes: int = 16, sample_size: int = 2048,
               column: str = "embedding", key: str = "vec_id",
               concurrency=(1, 8)) -> pa.Table:
    """IVF × PQ composition — the full Jégou-style ANN stack: IVF
    PRUNES which vectors stream (cluster-assignment filter, same
    sample-trained centroids as :func:`knn_ivf`), PQ SHRINKS what each
    surviving scan touches (m uint8 codes + ADC tables, same index as
    :func:`knn_pq`).  One sample feeds both trainings; output schema
    matches :func:`knn_brute_force`."""
    sample_rows = ds.limit(sample_size).take_all()
    sample = np.asarray([r[column] for r in sample_rows],
                        dtype=np.float32)
    ivf = IVFIndex(n_clusters=n_clusters).fit(sample)
    pq = PQIndex(m=m, k_codes=k_codes).fit(sample)   # ONE sample, both
    wanted = ivf.probe_clusters(queries, nprobe)
    pruned = ds.map_batches(
        _IVFFilter,
        fn_constructor_kwargs=dict(centroids=ivf.centroids,
                                   wanted=wanted, column=column),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
    return knn_pq(pruned, queries, k, column=column, key=key,
                  concurrency=concurrency, index=pq)


class HNSWGraph:
    """Hierarchical Navigable Small World graph (Malkov & Yashunin
    2018) over a FIXED vector set — the graph-index ANN tier next to
    IVF's pruning and PQ's compression.  Pure numpy + heapq, fully
    deterministic: level assignment hashes the KEY (md5 → uniform →
    geometric), insertion runs in sorted-key order, and every heap
    tie breaks on (similarity, node index).

    Similarity = cosine on normalized vectors (higher is better), so
    the search frontier maximizes dot products — consistent with the
    rest of this module."""

    def __init__(self, keys, vecs: np.ndarray, *, M: int = 16,
                 ef_construction: int = 64, seed: str = "hnsw"):
        from mdvalidate_ray.state.sketches import hash_strings

        keys = np.asarray(keys, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.v = _normalize(np.asarray(vecs, dtype=np.float64)[order])
        n = len(self.keys)
        self.M = M
        self.efc = ef_construction
        if n:
            h = hash_strings([f"{seed}|{k}" for k in self.keys])
            u = (h.astype(np.float64) + 0.5) / float(2 ** 64)
            self.levels = np.minimum(
                np.floor(-np.log(u) / np.log(M)).astype(np.int64), 32)
        else:
            self.levels = np.zeros(0, dtype=np.int64)
        self.adj: list[list[list[int]]] = []
        self.entry = -1
        self.max_level = -1
        for i in range(n):
            self._insert(i)

    def _sims(self, q: np.ndarray, idxs) -> np.ndarray:
        return self.v[np.asarray(idxs)] @ q

    def _search_layer(self, q, entries, ef: int, level: int):
        """Best-first beam of width ``ef`` on one layer; ``entries`` is
        a list of (sim, idx) seeds; returns ≤ef (sim, idx) results."""
        visited = {i for _, i in entries}
        cand = [(-s, i) for s, i in entries]
        heapq.heapify(cand)
        best = list(entries)
        heapq.heapify(best)          # min-heap: worst kept sim at root
        adj = self.adj[level]
        while cand:
            negs, c = heapq.heappop(cand)
            if len(best) >= ef and -negs < best[0][0]:
                break
            nbrs = [x for x in adj[c] if x not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            for s, x in zip(self._sims(q, nbrs), nbrs):
                s = float(s)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(best, (s, x))
                    if len(best) > ef:
                        heapq.heappop(best)
                    heapq.heappush(cand, (-s, x))
        return best

    def _insert(self, i: int) -> None:
        lvl = int(self.levels[i])
        while len(self.adj) <= lvl:
            self.adj.append([[] for _ in range(len(self.keys))])
        if self.entry < 0:
            self.entry, self.max_level = i, lvl
            return
        q = self.v[i]
        ep = [(float(self.v[self.entry] @ q), self.entry)]
        for lev in range(self.max_level, lvl, -1):
            ep = self._search_layer(q, ep, 1, lev)
        for lev in range(min(lvl, self.max_level), -1, -1):
            cands = self._search_layer(q, ep, self.efc, lev)
            sel = sorted(cands, key=lambda t: (-t[0], t[1]))[:self.M]
            cap = self.M * (2 if lev == 0 else 1)
            for _, j in sel:
                self.adj[lev][i].append(j)
                self.adj[lev][j].append(i)
                if len(self.adj[lev][j]) > cap:
                    nb = np.asarray(self.adj[lev][j])
                    sims = self._sims(self.v[j], nb)
                    keep = np.lexsort((nb, -sims))[:cap]
                    self.adj[lev][j] = [int(nb[o]) for o in keep]
            ep = cands
        if lvl > self.max_level:
            self.entry, self.max_level = i, lvl

    def search(self, q: np.ndarray, k: int, ef: int = 64):
        """Top-k (score, key) for one normalized query vector."""
        if self.entry < 0:
            return []
        q = np.asarray(q, dtype=np.float64)
        ep = [(float(self.v[self.entry] @ q), self.entry)]
        for lev in range(self.max_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lev)
        best = self._search_layer(q, ep, max(ef, k), 0)
        ranked = sorted(best, key=lambda t: (-t[0], self.keys[t[1]]))[:k]
        return [(float(s), int(self.keys[i])) for s, i in ranked]


def knn_hnsw(ds, queries: np.ndarray, k: int = 10, *,
             column: str = "embedding", key: str = "vec_id",
             n_shards: int = 4, M: int = 16, ef_construction: int = 64,
             ef_search: int = 96) -> pa.Table:
    """Graph-index approximate top-k (same output schema as
    :func:`knn_brute_force`): vectors co-partition ONCE by
    ``key % n_shards``, each shard builds ONE deterministic
    :class:`HNSWGraph` over its whole partition and beam-searches every
    query (build amortizes across all queries — never per batch), the
    driver merges the per-shard candidates.  Deterministic end to end:
    hash-of-key levels, sorted-key insertion, key tie-breaks.

    Scale shape: the 100-TB serving variant is :class:`HNSWServe` —
    the same per-shard graphs resident in long-lived actors (build
    once, answer query streams; bit-identical merge); for a one-shot
    batch query the group pass below is the same work without the
    residency.  Recall contract pinned by test_hnsw_recall."""
    q = _normalize(np.asarray(queries, dtype=np.float64))

    def tag(b: pa.Table) -> pa.Table:
        kv = b.column(key).to_numpy(zero_copy_only=False)
        return b.append_column(
            "_shard", pa.array((kv % n_shards).astype(np.int64)))

    def per_shard(g: pa.Table) -> pa.Table:
        keys_np = g.column(key).to_numpy(zero_copy_only=False)
        vecs = _batch_matrix(g, column)
        graph = HNSWGraph(keys_np, vecs, M=M,
                          ef_construction=ef_construction)
        rows = []
        for qi in range(q.shape[0]):
            for s, kk in graph.search(q[qi], k, ef=ef_search):
                rows.append({"query_id": qi, "key": kk, "score": s})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("query_id", pa.int64()), ("key", pa.int64()),
             ("score", pa.float64())]))

    partials = ds.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("_shard").map_groups(per_shard, batch_format="pyarrow")
    return _merge_shard_candidates(
        ((row["query_id"], row["key"], row["score"])
         for row in partials.iter_rows()), k)


def _merge_shard_candidates(rows, k: int) -> pa.Table:
    """Fold per-shard (query_id, key, score) candidate rows into the
    global top-k table knn_brute_force/knn_hnsw emit — driver-side
    heaps, ties break on (score desc, key asc)."""
    heaps: dict[int, list] = {}
    for qi, kk, sc in rows:
        h = heaps.setdefault(qi, [])
        item = (sc, -kk)
        if len(h) < k:
            heapq.heappush(h, item)
        elif item > h[0]:
            heapq.heapreplace(h, item)
    out = []
    for qi in sorted(heaps):
        ranked = sorted(((s, -nk) for s, nk in heaps[qi]),
                        key=lambda t: (-t[0], t[1]))
        for rank, (score, kk2) in enumerate(ranked):
            out.append({"query_id": qi, "rank": rank, "key": kk2,
                        "score": score})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("key", pa.int64()), ("score", pa.float64())]))


class HNSWServe:
    """ACTOR-RESIDENT HNSW serving — the 100-TB tier
    :func:`knn_hnsw`'s docstring names: the same deterministic
    per-shard graphs (vectors co-partition once by ``key % n_shards``)
    built ONCE inside long-lived Ray actors, which then answer ANY
    number of query batches without rebuilding — build cost amortizes
    across the serving lifetime instead of one call.

    Ingest is distributed: a routing ``map_batches`` pass pushes each
    block's rows straight to their hash-owned shard actor (vectors
    never fold through the driver); ``build()`` then constructs each
    shard's :class:`HNSWGraph` in parallel.  ``query()`` fans a
    normalized query matrix to every shard and merges the per-shard
    candidates with the same (score desc, key asc) rule as
    :func:`knn_hnsw`, so for equal parameters the output table is
    BIT-IDENTICAL to the one-shot batch path (pinned by
    test_hnsw_serve_matches_batch).

    ``actor_num_cpus`` defaults to 0: serving actors are resident
    STATE, and reserving whole CPUs would deadlock small clusters
    while the routing tasks run (set it on a real cluster to pack
    graphs onto nodes deliberately)."""

    def __init__(self, ds, *, column: str = "embedding",
                 key: str = "vec_id", n_shards: int = 4, M: int = 16,
                 ef_construction: int = 64, actor_num_cpus: float = 0):
        import ray

        self.n_shards = n_shards
        self._k = k = str(key)
        self._col = column

        @ray.remote(num_cpus=actor_num_cpus)
        class Shard:
            def __init__(self):
                self._keys: list = []
                self._vecs: list = []
                self.graph = None

            def add(self, keys_np, vec_mat) -> int:
                self._keys.append(keys_np)
                self._vecs.append(vec_mat)
                return len(keys_np)

            def build(self, M: int, efc: int) -> int:
                ks = (np.concatenate(self._keys) if self._keys
                      else np.zeros(0, dtype=np.int64))
                vs = (np.concatenate(self._vecs) if self._vecs
                      else np.zeros((0, 1)))
                self.graph = HNSWGraph(ks, vs, M=M,
                                       ef_construction=efc)
                self._keys = self._vecs = None   # ingest buffers freed
                return len(ks)

            def query(self, q: np.ndarray, k: int, ef: int) -> list:
                rows = []
                for qi in range(q.shape[0]):
                    for s, kk in self.graph.search(q[qi], k, ef=ef):
                        rows.append((qi, kk, s))
                return rows

        self._actors = [Shard.remote() for _ in range(n_shards)]
        actors, n_sh = self._actors, n_shards

        def route(b: pa.Table) -> pa.Table:
            kv = b.column(k).to_numpy(
                zero_copy_only=False).astype(np.int64)
            m = _batch_matrix(b, column)
            sid = kv % n_sh
            pending = [actors[int(s)].add.remote(
                kv[sid == s], np.ascontiguousarray(m[sid == s]))
                for s in np.unique(sid)]
            ray.get(pending)   # delivery barrier before the batch ends
            return pa.table({"n": pa.array([len(kv)], pa.int64())})

        ds.select_columns([key, column]).map_batches(
            route, batch_format="pyarrow",
            zero_copy_batch=True).take_all()
        self.shard_sizes = ray.get(
            [a.build.remote(M, ef_construction) for a in self._actors])

    def query(self, queries: np.ndarray, k: int = 10,
              ef_search: int = 96) -> pa.Table:
        """Top-k for a query matrix — same schema and values as
        :func:`knn_hnsw` with equal build/search parameters."""
        import ray

        q = _normalize(np.asarray(queries, dtype=np.float64))
        q_ref = ray.put(q)
        parts = ray.get([a.query.remote(q_ref, k, ef_search)
                         for a in self._actors])
        return _merge_shard_candidates(
            (r for p in parts for r in p), k)

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []


def pca_fit(ds, *, column: str = "embedding",
            n_components: int = 8) -> dict:
    """Distributed PCA fit in ONE streaming pass: each batch emits the
    classic mergeable second-moment partials ``(n, Σx, XᵀX)`` (dim +
    dim² doubles per BLOCK, independent of rows); the driver folds them
    in a canonical order (sorted by partial bytes — deterministic
    across RE-RUNS of the same block layout; different layouts round
    the block partials differently, so cross-layout models agree to
    float-fold precision, not bitwise) and eigendecomposes the
    dim×dim covariance — O(dim³) driver work, nothing corpus-sized in
    flight.  Eigenvector signs are canonicalized (largest-|coefficient|
    entry positive) so the model is deterministic.

    The dimensionality-reduction step before ANN/clustering at scale:
    project once, then every downstream distance costs
    ``n_components/dim`` of the original.

    Returns {"mean": (dim,), "components": (k, dim) rows sorted by
    descending eigenvalue, "explained_variance": (k,)}."""
    part_schema = pa.schema([("n", pa.int64()), ("s", pa.list_(
        pa.float64())), ("xtx", pa.list_(pa.float64()))])

    def partial(b: pa.Table) -> pa.Table:
        x = _batch_matrix(b, column).astype(np.float64)
        if len(x) == 0:
            return part_schema.empty_table()
        return pa.Table.from_arrays(
            [pa.array([len(x)], pa.int64()),
             pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
             pa.array([(x.T @ x).ravel()], pa.list_(pa.float64()))],
            names=part_schema.names)

    parts = []
    for blk in ds.select_columns([column]).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for r in blk.to_pylist():
            parts.append((int(r["n"]), np.asarray(r["s"]),
                          np.asarray(r["xtx"])))
    if not parts:
        raise ValueError("pca_fit: empty dataset")
    # canonical fold order: stable sort by (n, sum-vector bytes)
    parts.sort(key=lambda p: (p[0], p[1].tobytes()))
    n = sum(p[0] for p in parts)
    dim = len(parts[0][1])
    s = np.zeros(dim)
    xtx = np.zeros(dim * dim)
    for p in parts:
        s += p[1]
        xtx += p[2]
    mean = s / n
    cov = (xtx.reshape(dim, dim) - n * np.outer(mean, mean)) / max(
        n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)        # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    ev = evals[order].copy()
    for i in range(len(comps)):               # deterministic signs
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps,
            "explained_variance": ev}


def pca_transform(ds, model: dict, *, column: str = "embedding",
                  key: str = "vec_id", out_col: str = "pc"):
    """Project every vector onto a fitted :func:`pca_fit` model — the
    model (k×dim) is broadcast ONCE via ``ray.put`` and read per task;
    each batch is one centered matmul.  Returns (key, out_col:
    list<float64>)."""
    import ray

    model_ref = ray.put((np.asarray(model["mean"]),
                         np.asarray(model["components"])))

    def project(b: pa.Table) -> pa.Table:
        mean, comps = ray.get(model_ref)
        x = _batch_matrix(b, column).astype(np.float64)
        p = (x - mean) @ comps.T
        return pa.Table.from_arrays(
            [b.column(key), pa.array(list(p), pa.list_(pa.float64()))],
            names=[key, out_col])

    return ds.select_columns([key, column]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True)


def embedding_outliers(ds, *, column: str = "embedding",
                       key: str = "vec_id", k_clusters: int = 8,
                       top_n: int = 50, iters: int = 5) -> pa.Table:
    """Embedding-space ANOMALY DETECTION: fit distributed k-means
    (:func:`kmeans_fit`), then one scoring pass computes each vector's
    squared distance to its ASSIGNED centroid (vectorized two-matmul
    form); the ``top_n`` farthest rows — the candidates most unlike any
    cluster: mislabeled, corrupted, or genuinely novel documents —
    merge through per-batch partial top-k.  Scores report as
    ``trunc(d²·10⁶)`` int64 so comparisons are stable.

    Returns a pa.Table (key, cluster, dist2_e6) sorted by
    (dist2_e6 DESC, key ASC)."""
    import ray

    from mdvalidate_ray.functions.relational import topk_table

    model = kmeans_fit(ds, column=column, key=key, k=k_clusters,
                       iters=iters)
    cents_ref = ray.put(np.asarray(model["centroids"]))
    out_schema = pa.schema([(key, pa.int64()), ("cluster", pa.int64()),
                            ("dist2_e6", pa.int64())])

    def score(b: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        x = _batch_matrix(b, column).astype(np.float64)
        if len(x) == 0:
            return out_schema.empty_table()
        d2 = (np.sum(x * x, axis=1)[:, None]
              - 2.0 * (x @ cents.T)
              + np.sum(cents * cents, axis=1)[None, :])
        assign = np.argmin(d2, axis=1)
        best = np.maximum(d2[np.arange(len(x)), assign], 0.0)
        return pa.Table.from_arrays(
            [b.column(key).cast(pa.int64()),
             pa.array(assign.astype(np.int64)),
             pa.array((best * 1e6).astype(np.int64))],
            names=out_schema.names)

    scored = ds.select_columns([key, column]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)
    return topk_table(scored, top_n, [("dist2_e6", "descending"),
                                      (key, "ascending")])


def semantic_dedup(ds, *, key: str = "vec_id", column: str = "embedding",
                   k_clusters: int = 16, threshold: float = 0.95,
                   iters: int = 4, block: int = 1024):
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public paper): k-means partitions the embedding
    space so near-duplicates co-locate, then each cluster independently
    keeps the lowest-``key`` representative of every cosine-near-dup set
    and flags the rest for removal.

    Ray shape: :func:`kmeans_fit` (broadcast-centroid Lloyd — zero
    shuffle) → one ``map_batches`` assigns every row its nearest
    centroid (euclidean, the Lloyd objective) → ONE
    ``groupby("cluster")`` exchange co-locates clusters (Python group
    calls bounded by ``k_clusters``, not by data) → per-cluster greedy
    scan in ascending key order: a row is dropped iff its cosine to an
    already-KEPT row is ≥ ``threshold``.  Key-order greediness makes
    the verdict a pure function of the cluster's vector multiset —
    deterministic and partition/block-layout invariant, unlike
    "drop any member" policies.

    Scale contract (the partitioning assumption): pick ``k_clusters`` so
    one cluster's rows × dim floats fit a worker's heap — the paper's
    own recipe (50k clusters for LAION); cluster size, not corpus size,
    bounds per-group memory.  The scan is blocked so the Python loop
    does O(1) numpy work per row: one |block| × kept matmul per block
    plus a precomputed in-block similarity matrix.

    Returns ``(key:int64, cluster:int32, kept:bool)`` rows.
    """
    import ray

    model = kmeans_fit(ds, column=column, key=key, k=k_clusters,
                       iters=iters)
    cents_ref = ray.put(np.asarray(model["centroids"], dtype=np.float64))

    def assign(b: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        if b.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int32()),
                             column: b.column(column)})
        x = _batch_matrix(b, column).astype(np.float64)
        d2 = (np.sum(x * x, axis=1)[:, None] - 2.0 * (x @ cents.T)
              + np.sum(cents * cents, axis=1)[None, :])
        a = np.argmin(d2, axis=1).astype(np.int32)
        return pa.Table.from_arrays(
            [b.column(key).cast(pa.int64()), pa.array(a),
             b.column(column)],
            names=[key, "cluster", column])

    assigned = ds.select_columns([key, column]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)

    def prune(g: pa.Table) -> pa.Table:
        keys = g.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        m = _normalize(_batch_matrix(g, column).astype(np.float64))[order]
        n = len(keys)
        kept = np.zeros(n, dtype=bool)
        kept_rows: list[int] = []
        for s in range(0, n, block):
            e = min(s + block, n)
            blk = m[s:e]
            if kept_rows:
                vs_kept = (blk @ m[kept_rows].T >= threshold).any(axis=1)
            else:
                vs_kept = np.zeros(e - s, dtype=bool)
            inblk = blk @ blk.T
            local_kept: list[int] = []
            for i in range(e - s):
                if vs_kept[i]:
                    continue
                if local_kept and (
                        inblk[i, local_kept] >= threshold).any():
                    continue
                local_kept.append(i)
                kept[s + i] = True
            kept_rows.extend(s + j for j in local_kept)
        cl = np.full(n, g.column("cluster")[0].as_py(), dtype=np.int32)
        return pa.Table.from_arrays(
            [pa.array(keys[order].astype(np.int64)), pa.array(cl),
             pa.array(kept)],
            names=[key, "cluster", "kept"])

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pyarrow")
