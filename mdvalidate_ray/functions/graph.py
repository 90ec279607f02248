"""Link-graph analytics: distributed PageRank by power iteration.

The web-scale authority-scoring primitive (Page et al. 1999; the
reference engine has no graph analog — this extends the training-data
operator family like k-means and connected components in this repo).

Scale shape (mirrors kmeans_fit / the CC broadcast tier):

* edges symmetrize/materialize ONCE and are re-read from the object
  store each iteration — never re-shuffled;
* out-degrees are computed once by the same per-block pre-combine +
  coarse-bucket fold as every other exact group-sum here;
* per iteration, the rank vector broadcasts via ``ray.put`` as one
  sorted (nodes, ranks) pair; each edge block emits per-block
  pre-combined ``Σ rank[src]/deg[src]`` partials for its dst nodes
  (``np.add.at``), a bounded ``hash(dst) % n_parts`` exchange folds
  them, and ≤ |nodes| rows reach the driver — k×|nodes| traffic per
  iteration, nothing corpus-sized;
* deterministic: fixed iteration count, canonical (sorted-node) fold
  order, no data-dependent float compares.

Like the CC broadcast tier this assumes the NODE VECTOR (not the edge
set) fits on the driver (~10⁸–10⁹ nodes at 16 B); past that, ranks
co-partition with edges by hash(node) the same way
``_connected_components_starring`` partitions labels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc  # noqa: F401  (parity with sibling modules)


def _pagerank_copartition(edges, *, damping: float, n_iter: int,
                          n_parts: int) -> pa.Table:
    """pagerank's past-the-driver-budget tier — the CACHED-EDGE-BUCKET
    iteration (the kmeans/mmr cached-round pattern applied to a graph):

    * SETUP, once: every materialized edge block splits into
      ``n_parts`` hash(src) sub-tables via ``num_returns`` tasks, so
      per-bucket edge refs live in plasma for the whole run — edges
      are NEVER re-shuffled per iteration (the naive state-as-Dataset
      variant re-exchanged the full edge list every round, which
      measured ~100× the broadcast tier at 1.7M edges);
      the (node, deg) state splits the same way, one state table ref
      per bucket.
    * PER ITERATION, two task waves and only NODE-sized data moves:
      wave 1, one task per src-bucket, maps its state's shares into
      its cached edge blocks and emits ``n_parts`` per-dst-bucket
      contribution partials (``num_returns`` → refs, nothing through
      the driver); wave 2, one task per dst-bucket, folds its incoming
      partials in sorted (node, contrib) order — deterministic float
      addition — applies the rank update, and returns (new state ref,
      scalar dangling partial).  The driver handles only object refs
      and two scalars per round.

    The same upgrade applies verbatim to the bfs/bellman/k-core
    co-partition tiers (their per-round frontier is the analog of the
    share wave); pagerank is the exemplar because it is the most
    iteration-heavy.  Deterministic to ~1e-12 vs the broadcast tier
    (different float-addition grouping;
    test_pagerank_forced_copartition_tier_parity)."""
    import ray

    from mdvalidate_ray.state.sketches import bucket_int64

    # ---- setup: split edges and build per-bucket (node, deg) state --
    @ray.remote(num_cpus=1)
    def split_edges(tbl: pa.Table):
        if tbl.num_rows == 0:
            e = pa.schema([("src", pa.int64()),
                           ("dst", pa.int64())]).empty_table()
            return tuple(e for _ in range(n_parts))
        src = np.asarray(tbl.column("src"), dtype=np.int64)
        bk_v = bucket_int64(src, n_parts)
        return tuple(tbl.filter(pa.array(bk_v == b))
                     for b in range(n_parts))

    @ray.remote(num_cpus=1)
    def deg_split(tbl: pa.Table):
        """Per-block (node, deg) partials, split by hash(node)."""
        if tbl.num_rows == 0:
            e = pa.schema([("node", pa.int64()),
                           ("deg", pa.int64())]).empty_table()
            return tuple(e for _ in range(n_parts))
        src = np.asarray(tbl.column("src"), dtype=np.int64)
        dst = np.asarray(tbl.column("dst"), dtype=np.int64)
        u, c = np.unique(src, return_counts=True)
        du = np.unique(dst)
        nodes = np.concatenate([u, du])
        degs = np.concatenate([c.astype(np.int64),
                               np.zeros(len(du), dtype=np.int64)])
        bk_v = bucket_int64(nodes, n_parts)
        return tuple(pa.table({"node": pa.array(nodes[bk_v == b]),
                               "deg": pa.array(degs[bk_v == b])})
                     for b in range(n_parts))

    @ray.remote(num_cpus=1)
    def init_state(*pieces):
        """Fold one bucket's (node, deg) partials into its state."""
        t = pa.concat_tables(list(pieces))
        nodes_np = t.column("node").to_numpy(zero_copy_only=False)
        deg_np = t.column("deg").to_numpy(zero_copy_only=False)
        u, inv = np.unique(nodes_np, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, deg_np)
        return pa.table({"node": pa.array(u), "deg": pa.array(acc)})

    blocks = [r for r in edges.to_arrow_refs()]
    if not blocks:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["node", "rank"])
    e_splits = [split_edges.options(num_returns=n_parts).remote(b)
                for b in blocks]
    edge_refs = [[sp[b] for sp in e_splits] for b in range(n_parts)]
    d_splits = [deg_split.options(num_returns=n_parts).remote(b)
                for b in blocks]
    state_refs = [init_state.remote(*[sp[b] for sp in d_splits])
                  for b in range(n_parts)]
    sizes = ray.get([ray.remote(num_cpus=0)(
        lambda t: t.num_rows).remote(s_) for s_ in state_refs])
    n = int(sum(sizes))
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["node", "rank"])

    @ray.remote(num_cpus=1)
    def add_rank(state: pa.Table):
        r0 = np.full(state.num_rows, 1.0 / n)
        d0 = state.column("deg").to_numpy(zero_copy_only=False)
        return (state.append_column("rank", pa.array(r0)),
                float(r0[d0 == 0].sum()))

    init = [add_rank.options(num_returns=2).remote(s_)
            for s_ in state_refs]
    state_refs = [i[0] for i in init]
    dangling = float(sum(ray.get([i[1] for i in init])))

    # ---- per-iteration task waves --------------------------------
    @ray.remote(num_cpus=1)
    def contrib(state: pa.Table, *edge_tbls):
        sn = state.column("node").to_numpy(zero_copy_only=False)
        deg_np = state.column("deg").to_numpy(zero_copy_only=False)
        r = state.column("rank").to_numpy(zero_copy_only=False)
        share = r / np.maximum(deg_np, 1)
        acc: dict = {}
        for et in edge_tbls:
            if et.num_rows == 0:
                continue
            src = np.asarray(et.column("src"), dtype=np.int64)
            dst = np.asarray(et.column("dst"), dtype=np.int64)
            sh = share[np.searchsorted(sn, src)]
            bk_v = bucket_int64(dst, n_parts)
            for b in np.unique(bk_v):
                m = bk_v == b
                u, inv = np.unique(dst[m], return_inverse=True)
                a = np.zeros(len(u), dtype=np.float64)
                np.add.at(a, inv, sh[m])
                prev = acc.get(int(b))
                if prev is None:
                    acc[int(b)] = [u, a]
                else:
                    # merge into the running per-bucket partial
                    cu = np.concatenate([prev[0], u])
                    ca = np.concatenate([prev[1], a])
                    o = np.argsort(cu, kind="stable")
                    cu, ca = cu[o], ca[o]
                    st = np.flatnonzero(np.concatenate(
                        ([True], cu[1:] != cu[:-1])))
                    acc[int(b)] = [cu[st], np.add.reduceat(ca, st)]
        empty = pa.schema([("node", pa.int64()),
                           ("contrib", pa.float64())]).empty_table()
        return tuple(
            pa.table({"node": pa.array(acc[b][0]),
                      "contrib": pa.array(acc[b][1])})
            if b in acc else empty for b in range(n_parts))

    @ray.remote(num_cpus=1)
    def merge(state: pa.Table, dang: float, *contrib_tbls):
        u = state.column("node").to_numpy(zero_copy_only=False)
        deg_np = state.column("deg").to_numpy(zero_copy_only=False)
        parts = [t for t in contrib_tbls if t.num_rows]
        incoming = np.zeros(len(u), dtype=np.float64)
        if parts:
            ct = pa.concat_tables(parts)
            cn = ct.column("node").to_numpy(zero_copy_only=False)
            cv = ct.column("contrib").to_numpy(zero_copy_only=False)
            o = np.lexsort((cv, cn))
            cn, cv = cn[o], cv[o]
            st = np.flatnonzero(np.concatenate(
                ([True], cn[1:] != cn[:-1])))
            incoming[np.searchsorted(u, cn[st])] =                 np.add.reduceat(cv, st)
        rank = ((1.0 - damping) / n
                + damping * (incoming + dang / n))
        out = pa.table({"node": state.column("node"),
                        "deg": state.column("deg"),
                        "rank": pa.array(rank)})
        return out, float(rank[deg_np == 0].sum())

    for _ in range(n_iter):
        waves = [contrib.options(num_returns=n_parts).remote(
            state_refs[b], *edge_refs[b]) for b in range(n_parts)]
        outs = [merge.options(num_returns=2).remote(
            state_refs[b2], dangling,
            *[waves[b][b2] for b in range(n_parts)])
            for b2 in range(n_parts)]
        state_refs = [o[0] for o in outs]
        dangling = float(sum(ray.get([o[1] for o in outs])))

    tbls = [t for t in ray.get(state_refs) if t.num_rows]
    out = (pa.concat_tables(tbls).select(["node", "rank"]) if tbls
           else pa.table({"node": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.float64())}))
    idx = pc.sort_indices(out, sort_keys=[("node", "ascending")])
    return out.take(idx)


def pagerank(edges_ds, *, col_a: str = "src", col_b: str = "dst",
             damping: float = 0.85, n_iter: int = 10,
             symmetric: bool = True, n_parts: int = 16,
             local_threshold: int = 2_000_000,
             broadcast_threshold: int = 100_000_000) -> pa.Table:
    """PageRank over an edge Dataset → (node, rank) table.

    ``symmetric=True`` treats edges as undirected (each edge contributes
    both ways), which also guarantees no dangling nodes; with
    ``symmetric=False`` dangling mass is redistributed uniformly (the
    standard correction) so ranks still sum to 1.

    THREE size tiers (same rationale as ``connected_components``): at
    or below ``local_threshold`` symmetrized edges, the edge set is no
    bigger than one rank broadcast, so k per-iteration Dataset launches
    are pure overhead — collect the arrays once and run the identical
    iteration in-process.  Above it, the rank vector lives on the
    driver and broadcasts per iteration while contributions fold
    through ``bucketed_group_sum``.  Past ``broadcast_threshold``
    edges, the (node, deg, rank) state STAYS a Dataset: each iteration
    is one share⋈edges co-partition on ``hash(src)`` (per-bucket
    per-destination pre-sums) and one state∪partials min-merge on
    ``hash(node)`` with a sorted in-bucket fold — nothing node-sized on
    the driver; only the scalar dangling mass folds per round.  The
    in-bucket fold sorts (node, contrib) before summing, so float
    results match the broadcast tier to ~1e-12 (different addition
    grouping; pinned with that tolerance by
    test_pagerank_forced_copartition_tier_parity).
    """
    import ray

    from mdvalidate_ray.functions.relational import bucketed_group_sum

    def sym(b: pa.Table) -> pa.Table:
        a = b.column(col_a).cast(pa.int64()).combine_chunks()
        c = b.column(col_b).cast(pa.int64()).combine_chunks()
        if symmetric:
            return pa.Table.from_arrays(
                [pa.concat_arrays([a, c]), pa.concat_arrays([c, a])],
                names=["src", "dst"])
        return pa.Table.from_arrays([a, c], names=["src", "dst"])

    edges = edges_ds.map_batches(sym, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    if edges.count() > broadcast_threshold:
        return _pagerank_copartition(edges, damping=damping,
                                     n_iter=n_iter, n_parts=n_parts)
    if edges.count() <= local_threshold:
        tbls = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["node", "rank"])
        et = pa.concat_tables(tbls).combine_chunks()
        src = np.asarray(et.column("src"), dtype=np.int64)
        dst = np.asarray(et.column("dst"), dtype=np.int64)
        all_nodes = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(all_nodes, src)
        di = np.searchsorted(all_nodes, dst)
        n = len(all_nodes)
        deg = np.bincount(si, minlength=n).astype(np.int64)
        ranks = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            share = ranks / np.maximum(deg, 1)
            incoming = np.zeros(n, dtype=np.float64)
            np.add.at(incoming, di, share[si])
            dangling = float(ranks[deg == 0].sum())
            ranks = (1.0 - damping) / n + damping * (incoming
                                                     + dangling / n)
        return pa.Table.from_arrays(
            [pa.array(all_nodes, pa.int64()), pa.array(ranks,
                                                       pa.float64())],
            names=["node", "rank"])

    def deg_part(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column("src"), dtype=np.int64)
        u, c = np.unique(src, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(c.astype(np.int64))],
            names=["node", "deg"])

    deg_tbls = [t for t in ray.get(
        bucketed_group_sum(
            edges.map_batches(deg_part, batch_format="pyarrow",
                              zero_copy_batch=True),
            key="node", sum_cols=["deg"], n_parts=n_parts)
        .materialize().to_arrow_refs()) if t.num_rows]
    if not deg_tbls:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["node", "rank"])
    dt = pa.concat_tables(deg_tbls).combine_chunks()
    order = pc.sort_indices(dt, sort_keys=[("node", "ascending")])
    dt = dt.take(order)
    # every node with only in-edges still needs a rank slot
    dst_nodes = [t for t in ray.get(
        edges.map_batches(
            lambda b: pa.Table.from_arrays(
                [pa.array(np.unique(np.asarray(b.column("dst"),
                                               dtype=np.int64)))],
                names=["node"]),
            batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    all_nodes = np.unique(np.concatenate(
        [np.asarray(dt.column("node"), dtype=np.int64)]
        + [np.asarray(t.column("node"), dtype=np.int64)
           for t in dst_nodes]))
    deg = np.zeros(len(all_nodes), dtype=np.int64)
    deg[np.searchsorted(all_nodes,
                        np.asarray(dt.column("node"), dtype=np.int64))] = \
        np.asarray(dt.column("deg"), dtype=np.int64)
    n = len(all_nodes)
    ranks = np.full(n, 1.0 / n)

    part_schema = pa.schema([("node", pa.int64()), ("contrib",
                                                    pa.float64())])

    for _ in range(n_iter):
        ref = ray.put((all_nodes, ranks / np.maximum(deg, 1)))

        def contrib(b: pa.Table) -> pa.Table:
            nd, share = ray.get(ref)
            src = np.asarray(b.column("src"), dtype=np.int64)
            dst = np.asarray(b.column("dst"), dtype=np.int64)
            s = share[np.searchsorted(nd, src)]
            u, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(len(u), dtype=np.float64)
            np.add.at(acc, inv, s)
            return pa.Table.from_arrays(
                [pa.array(u), pa.array(acc)], schema=part_schema)

        folded = [t for t in ray.get(
            bucketed_group_sum(
                edges.map_batches(contrib, batch_format="pyarrow",
                                  zero_copy_batch=True),
                key="node", sum_cols=["contrib"], n_parts=n_parts)
            .materialize().to_arrow_refs()) if t.num_rows]
        incoming = np.zeros(n, dtype=np.float64)
        if folded:
            ft = pa.concat_tables(folded).combine_chunks()
            fo = pc.sort_indices(ft, sort_keys=[("node", "ascending")])
            ft = ft.take(fo)
            incoming[np.searchsorted(
                all_nodes, np.asarray(ft.column("node"),
                                      dtype=np.int64))] = \
                np.asarray(ft.column("contrib"), dtype=np.float64)
        dangling = float(ranks[deg == 0].sum())
        ranks = ((1.0 - damping) / n
                 + damping * (incoming + dangling / n))

    return pa.Table.from_arrays(
        [pa.array(all_nodes, pa.int64()), pa.array(ranks, pa.float64())],
        names=["node", "rank"])


def cooccurrence_edges(ds, *, group_col: str, item_col: str,
                       n_parts: int = 32):
    """Distinct undirected co-occurrence edges: one ``(u, v)`` row
    (``u < v``, node ids) per item pair sharing at least one group —
    the market-basket / co-purchase / co-citation graph builder.

    Groups may straddle input blocks, so rows first co-partition on
    ``hash(group) % n_parts`` (every copy of one group meets in ONE
    bucket); per bucket the pair expansion is vectorized per group-SIZE
    class (sort by (group, item), dedupe, one ``triu_indices``
    broadcast per distinct size — the bounded-loop pattern shared with
    trigram_posting_pairs), and a final bucketed distinct collapses
    pairs produced by different groups.  Pair fan-out is O(Σ s²) —
    cap pathological group sizes upstream if the corpus has them."""
    import numpy as np

    from mdvalidate_ray.functions.relational import bucketed_distinct
    from mdvalidate_ray.functions.window import _bucket_of

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([group_col, item_col])
        return b.append_column(
            "_bucket", _bucket_of(b.column(group_col), n_parts))

    empty = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    _TRIU: dict = {}

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.select([group_col, item_col]).group_by(
            [group_col, item_col]).aggregate([])
        if t.num_rows == 0:
            return empty.empty_table()
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                            (item_col, "ascending")])
        t = t.take(idx)
        grp = np.asarray(t.column(group_col), dtype=np.int64)
        item = np.asarray(t.column(item_col), dtype=np.int64)
        n = len(grp)
        change = np.ones(n, dtype=bool)
        change[1:] = grp[1:] != grp[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        out_u, out_v = [], []
        for s in np.unique(counts):
            if s < 2:
                continue
            s = int(s)
            if s not in _TRIU:
                _TRIU[s] = np.triu_indices(s, k=1)
            ti, tj = _TRIU[s]
            st = starts[counts == s]
            rows = item[st[:, None] + np.arange(s)]
            a = rows[:, ti].reshape(-1)
            b2 = rows[:, tj].reshape(-1)
            out_u.append(np.minimum(a, b2))
            out_v.append(np.maximum(a, b2))
        if not out_u:
            return empty.empty_table()
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_u)),
             pa.array(np.concatenate(out_v))], names=["u", "v"])

    pairs = ds.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
    return bucketed_distinct(pairs, ["u", "v"], n_parts=n_parts)


def triangle_counts(edges_ds, *, col_a: str = "u", col_b: str = "v",
                    n_parts: int = 32, assume_distinct: bool = False,
                    broadcast_threshold: int = 5_000_000) -> "object":
    """EXACT per-node triangle counts over an undirected edge Dataset —
    the local-clustering primitive (with connected_components and
    pagerank this completes the graph family).  Returns a Dataset of
    (node, n_tri) rows; the global triangle count is Σ n_tri / 3.

    Classic degree-ordered node-iterator (Schank & Wagner 2005),
    MapReduce-shaped (Suri & Vassilvitskii 2011, "Counting triangles
    and the curse of the last reducer"):

    * canonical distinct edges (min, max) via ONE bucketed-distinct
      exchange (skipped when the caller guarantees distinct canonical
      input with ``assume_distinct=True`` — e.g. straight out of
      :func:`cooccurrence_edges` — the composition-fusion that avoids
      paying the same exchange twice);
    * degrees from per-block partials folded ON THE DRIVER (the same
      node-vector-fits assumption as pagerank's broadcast tier — edge
      rows never centralize, only ≤|nodes| partial rows per block);
    * each edge ORIENTS from its lower-(deg, id) endpoint, bounding
      out-degree by O(√m) and each wedge to ONE generating center;
      wedges expand vectorized per out-degree size class inside
      hash(src) buckets (the wedge-generation exchange);
    * the CLOSING probe is tiered like referential/connected_components:
      at or below ``broadcast_threshold`` edges the sorted fused
      ``u·2³² + v`` edge-key array broadcasts once via ``ray.put``
      (8 B/edge) and every wedge closes IN PLACE at its generating
      bucket — Σ out-deg² wedge rows never enter an exchange; above
      the threshold, wedge pair keys co-partition WITH the edge keys on
      ``hash(pair) % n_parts`` and close by sorted ``searchsorted``
      probe per bucket (the 100-TB shape: nothing broadcast-sized
      required, skew lands on the pair hash).  Matched wedges credit
      all three corners through per-bucket partial counts + one final
      fold (driver fold below the threshold, coarse-bucket fold above).

    Wedge volume is Σ out-deg² (the algorithm's intrinsic cost); in
    the broadcast tier it stays inside worker heaps, in the exchange
    tier it streams through the object store.  Node ids must fit
    uint32 for the pair fuse (checked)."""
    import ray
    import ray.data

    from mdvalidate_ray.functions.relational import (bucketed_distinct,
                                                     bucketed_group_sum)

    canon = edges_ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pc.min_element_wise(b.column(col_a).cast(pa.int64()),
                                 b.column(col_b).cast(pa.int64())),
             pc.max_element_wise(b.column(col_a).cast(pa.int64()),
                                 b.column(col_b).cast(pa.int64()))],
            names=["u", "v"]),
        batch_format="pyarrow", zero_copy_batch=True).filter(
        expr="u != v")
    if assume_distinct:
        edges = canon.materialize()
    else:
        edges = bucketed_distinct(canon, ["u", "v"],
                                  n_parts=n_parts).materialize()

    empty_out = pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.int64())],
        names=["node", "n_tri"])

    # --- degrees: per-block partials, driver fold (no exchange) ------
    def deg_part(b: pa.Table) -> pa.Table:
        both = np.concatenate([np.asarray(b.column("u"), dtype=np.int64),
                               np.asarray(b.column("v"),
                                          dtype=np.int64)])
        nd, cnt = np.unique(both, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(nd), pa.array(cnt.astype(np.int64))],
            names=["node", "deg"])

    parts = [t for t in ray.get(
        edges.map_batches(deg_part, batch_format="pyarrow",
                          zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(empty_out)
    allp = pa.concat_tables(parts).combine_chunks()
    pn = np.asarray(allp.column("node"), dtype=np.int64)
    pd_ = np.asarray(allp.column("deg"), dtype=np.int64)
    nodes, inv = np.unique(pn, return_inverse=True)
    degs = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(degs, inv, pd_)
    if nodes.size and int(nodes.max()) >= 2**32:
        raise ValueError("triangle_counts: node ids must fit uint32 "
                         "for the fused pair key")
    deg_ref = ray.put((nodes, degs))

    SHIFT = np.int64(2**32)
    n_edges = edges.count()
    small = n_edges <= broadcast_threshold
    edge_key_ref = None
    if small:
        # sorted fused edge-key array broadcasts once (8 B per edge)
        keys = np.sort(np.concatenate(
            [np.asarray(t.column("u"), dtype=np.int64) * SHIFT
             + np.asarray(t.column("v"), dtype=np.int64)
             for t in ray.get(edges.to_arrow_refs()) if t.num_rows]))
        edge_key_ref = ray.put(keys)

    def orient(b: pa.Table) -> pa.Table:
        nd, dg = ray.get(deg_ref)
        u = np.asarray(b.column("u"), dtype=np.int64)
        v = np.asarray(b.column("v"), dtype=np.int64)
        du = dg[np.searchsorted(nd, u)]
        dv = dg[np.searchsorted(nd, v)]
        # lower (deg, id) endpoint generates the wedge
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        h = (src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            >> np.uint64(33)
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(dst),
             pa.array((h % np.uint64(n_parts)).astype("int64"))],
            names=["src", "dst", "_bucket"])

    _TRIU: dict = {}

    def _wedge_pairs(g: pa.Table):
        """Per-bucket vectorized wedge expansion → (pair_keys, centers)
        numpy arrays (size-class triu pattern)."""
        idx = pc.sort_indices(g, sort_keys=[("src", "ascending"),
                                            ("dst", "ascending")])
        s_ = g.take(idx)
        src = np.asarray(s_.column("src"), dtype=np.int64)
        dst = np.asarray(s_.column("dst"), dtype=np.int64)
        n = len(src)
        if n == 0:
            return None
        change = np.ones(n, dtype=bool)
        change[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        pairs_out, centers_out = [], []
        for s in np.unique(counts):
            if s < 2:
                continue
            s = int(s)
            if s not in _TRIU:
                _TRIU[s] = np.triu_indices(s, k=1)
            ti, tj = _TRIU[s]
            st = starts[counts == s]
            rows = dst[st[:, None] + np.arange(s)]
            a = rows[:, ti].reshape(-1)
            b2 = rows[:, tj].reshape(-1)
            pairs_out.append(np.minimum(a, b2) * SHIFT
                             + np.maximum(a, b2))
            centers_out.append(np.repeat(src[st], len(ti)))
        if not pairs_out:
            return None
        return np.concatenate(pairs_out), np.concatenate(centers_out)

    count_schema = pa.schema([("node", pa.int64()), ("n", pa.int64())])

    def _credit(tw: np.ndarray, wc: np.ndarray) -> pa.Table:
        corners = np.concatenate([tw // SHIFT, tw % SHIFT, wc])
        nd, cnt = np.unique(corners, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(nd), pa.array(cnt.astype(np.int64))],
            schema=count_schema)

    oriented = edges.map_batches(orient, batch_format="pyarrow",
                                 zero_copy_batch=True)

    if small:
        def close_local(g: pa.Table) -> pa.Table:
            w = _wedge_pairs(g)
            if w is None:
                return count_schema.empty_table()
            wp, wc = w
            ek = ray.get(edge_key_ref)
            pos = np.searchsorted(ek, wp)
            pos[pos == ek.size] = 0
            hit = ek[pos] == wp
            if not hit.any():
                return count_schema.empty_table()
            return _credit(wp[hit], wc[hit])

        partials = [t for t in ray.get(
            oriented.groupby("_bucket").map_groups(
                close_local, batch_format="pyarrow")
            .materialize().to_arrow_refs()) if t.num_rows]
        if not partials:
            return ray.data.from_arrow(empty_out)
        pt = pa.concat_tables(partials).combine_chunks()
        cn = np.asarray(pt.column("node"), dtype=np.int64)
        cc = np.asarray(pt.column("n"), dtype=np.int64)
        out_nodes, inv = np.unique(cn, return_inverse=True)
        out_cnt = np.zeros(len(out_nodes), dtype=np.int64)
        np.add.at(out_cnt, inv, cc)
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array(out_nodes), pa.array(out_cnt)],
            names=["node", "n_tri"]))

    # --- exchange tier (the 100-TB shape) ----------------------------
    wedge_schema = pa.schema([("pair", pa.int64()),
                              ("center", pa.int64())])

    def wedges(g: pa.Table) -> pa.Table:
        w = _wedge_pairs(g)
        if w is None:
            return wedge_schema.empty_table()
        return pa.Table.from_arrays(
            [pa.array(w[0]), pa.array(w[1])], schema=wedge_schema)

    wedge_rows = oriented.groupby("_bucket").map_groups(
        wedges, batch_format="pyarrow")

    def pair_tag_wedge(b: pa.Table) -> pa.Table:
        p = np.asarray(b.column("pair"), dtype=np.int64)
        h = (p.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            >> np.uint64(33)
        return pa.Table.from_arrays(
            [b.column("pair"), b.column("center"),
             pa.array((h % np.uint64(n_parts)).astype("int64"))],
            names=["pair", "center", "_bucket"])

    def pair_tag_edge(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("u"), dtype=np.int64)
        v = np.asarray(b.column("v"), dtype=np.int64)
        p = u * SHIFT + v
        h = (p.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            >> np.uint64(33)
        return pa.Table.from_arrays(
            [pa.array(p), pa.array(np.full(len(p), -1, dtype=np.int64)),
             pa.array((h % np.uint64(n_parts)).astype("int64"))],
            names=["pair", "center", "_bucket"])

    tagged = wedge_rows.map_batches(
        pair_tag_wedge, batch_format="pyarrow", zero_copy_batch=True) \
        .union(edges.map_batches(pair_tag_edge, batch_format="pyarrow",
                                 zero_copy_batch=True))

    def close_and_credit(g: pa.Table) -> pa.Table:
        pair = np.asarray(g.column("pair"), dtype=np.int64)
        center = np.asarray(g.column("center"), dtype=np.int64)
        is_edge = center == -1
        ek = np.sort(pair[is_edge])
        wp = pair[~is_edge]
        wc = center[~is_edge]
        if ek.size == 0 or wp.size == 0:
            return count_schema.empty_table()
        pos = np.searchsorted(ek, wp)
        pos[pos == ek.size] = 0
        hit = ek[pos] == wp
        if not hit.any():
            return count_schema.empty_table()
        return _credit(wp[hit], wc[hit])

    partials = tagged.groupby("_bucket").map_groups(
        close_and_credit, batch_format="pyarrow")
    out = bucketed_group_sum(partials, key="node", sum_cols=["n"],
                             n_parts=n_parts)
    return out.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"), b.column("n").cast(pa.int64())],
            names=["node", "n_tri"]),
        batch_format="pyarrow")


def _k_core_cached(edges_ds, *, k: int, n_parts: int,
                   max_rounds: int) -> pa.Table:
    """k_core's past-the-driver-budget rounds in the CACHED-EDGE-BUCKET
    pattern (_pagerank_copartition's shape): the symmetric edge list
    splits ONCE by ``hash(a)`` into per-bucket plasma refs; each peel
    round is two task waves — per-bucket degree scan + local peel
    detection (a node's a-rows all live in its bucket, so degrees are
    exact locally), then per-bucket drop against the ROUND's peel refs
    (frontier-sized tables passed ref-to-task, never through the
    driver; the driver folds one integer per bucket).  Edges are never
    re-exchanged.  Returns the surviving (node, deg) table."""
    import ray

    from mdvalidate_ray.state.sketches import bucket_int64

    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    @ray.remote(num_cpus=1)
    def split(tbl: pa.Table):
        if tbl.num_rows == 0:
            e = pa.schema([("a", pa.int64()),
                           ("b", pa.int64())]).empty_table()
            return tuple(e for _ in range(n_parts))
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        bk_v = bucket_int64(a, n_parts)
        return tuple(tbl.filter(pa.array(bk_v == b))
                     for b in range(n_parts))

    @ray.remote(num_cpus=1)
    def consolidate(*pieces):
        return pa.concat_tables(list(pieces))

    @ray.remote(num_cpus=1)
    def peel_scan(tbl: pa.Table):
        if tbl.num_rows == 0:
            return (deg_schema.empty_table(),
                    pa.table({"node": pa.array([], pa.int64())}), 0)
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        u, c = np.unique(a, return_counts=True)
        peel = u[c < k]
        return (pa.table({"node": pa.array(u),
                          "deg": pa.array(c.astype(np.int64))},
                         schema=deg_schema),
                pa.table({"node": pa.array(peel)}), int(len(peel)))

    @ray.remote(num_cpus=1)
    def drop(tbl: pa.Table, *peels):
        if tbl.num_rows == 0:
            return tbl
        pe = np.sort(np.concatenate(
            [p.column("node").to_numpy(zero_copy_only=False)
             for p in peels] or [np.zeros(0, dtype=np.int64)]))
        if len(pe) == 0:
            return tbl
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        bb = tbl.column("b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(pe, a)
        ib = np.searchsorted(pe, bb)
        hit_a = (ia < len(pe)) & (pe[np.minimum(ia, len(pe) - 1)] == a)
        hit_b = (ib < len(pe)) & (pe[np.minimum(ib, len(pe) - 1)] == bb)
        return tbl.filter(pa.array(~(hit_a | hit_b)))

    blocks = list(edges_ds.to_arrow_refs())
    if not blocks:
        return deg_schema.empty_table()
    splits = [split.options(num_returns=n_parts).remote(b)
              for b in blocks]
    e_refs = [consolidate.remote(*[sp[b] for sp in splits])
              for b in range(n_parts)]
    for _ in range(max_rounds):
        wave1 = [peel_scan.options(num_returns=3).remote(e_refs[b])
                 for b in range(n_parts)]
        n_frontier = int(sum(ray.get([w[2] for w in wave1])))
        if n_frontier == 0:
            tbls = [t for t in ray.get([w[0] for w in wave1])
                    if t.num_rows]
            return (pa.concat_tables(tbls) if tbls
                    else deg_schema.empty_table())
        peel_refs = [w[1] for w in wave1]
        e_refs = [drop.remote(e_refs[b], *peel_refs)
                  for b in range(n_parts)]
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def k_core(edges_ds, *, k: int, col_a: str = "u", col_b: str = "v",
           n_parts: int = 32, max_rounds: int = 200,
           broadcast_threshold: int = 50_000_000):
    """k-core membership via iterative peeling (Batagelj–Zaveršnik
    semantics, bulk-synchronous form): repeatedly delete every node
    whose degree in the REMAINING graph is < ``k`` until a fixpoint —
    the standard community/spam-graph density filter next to
    :func:`pagerank` and :func:`triangle_counts`.

    Plan per round, over the symmetric edge list (materialized once,
    then shrinking): per-batch endpoint count combiner → one
    :func:`~mdvalidate_ray.functions.relational.bucketed_group_sum`
    exchange gives exact degrees; the PEEL FRONTIER (nodes with
    ``deg < k``) is the set removed THIS round, not the cumulative
    removal.  Frontier handling is TIERED on ``broadcast_threshold``:

    * ``|frontier| <= broadcast_threshold`` — the frontier folds to the
      driver, broadcasts sorted via ``ray.put``, and one vectorized
      ``np.searchsorted`` filter drops edges touching peeled nodes.
    * larger — the frontier never reaches the driver: the remaining
      rounds hand off to :func:`_k_core_cached`, the cached-edge-
      bucket peeler (_pagerank_copartition's pattern — edges split
      ONCE by ``hash(a)`` into per-bucket plasma refs; each round is
      a per-bucket degree/peel scan plus a per-bucket drop against
      ref-passed frontier tables; edges are never re-exchanged,
      measured ~25× the per-round anti-join-exchange variant).  Both
      tiers produce identical results
      (test_k_core_forced_copartition_tier_parity).

    Already-peeled nodes have no edges left, so each round only ships
    its own frontier.  Terminates when a round peels nothing;
    ``max_rounds`` guards pathological chain-shaped graphs (each round
    peels ≥1 node, so rounds ≤ nodes).

    Returns a Dataset of surviving ``(node, deg)`` rows — the degrees
    WITHIN the k-core (all ≥ k).  Exact-integer, so a recursive-CTE SQL
    oracle reproduces it."""
    import ray
    import ray.data

    from mdvalidate_ray.functions.relational import bucketed_group_sum

    sym_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def sym(b: pa.Table) -> pa.Table:
        u = b.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([u, v])),
             pa.array(np.concatenate([v, u]))], names=["a", "b"])

    cur = edges_ds.map_batches(sym, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("a", pa.int64()),
                              ("deg", pa.int64())]).empty_table()
        a = b.column("a").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(a, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq), pa.array(cnt.astype(np.int64))],
            names=["a", "deg"])

    for _ in range(max_rounds):
        degs = bucketed_group_sum(
            cur.map_batches(deg_partial, batch_format="pyarrow",
                            zero_copy_batch=True),
            key="a", sum_cols=["deg"], n_parts=n_parts).materialize()
        peel_ds = degs.filter(expr=f"deg < {k}").materialize()
        n_frontier = peel_ds.count()
        if n_frontier == 0:
            return degs.map_batches(
                lambda t: t.rename_columns(["node", "deg"]),
                batch_format="pyarrow", zero_copy_batch=True)
        if n_frontier > broadcast_threshold:
            # past-driver-budget rounds: hand the CURRENT shrunken edge
            # set to the cached-edge-bucket peeler (edges split once
            # into plasma, only frontier-sized peel tables move per
            # round) — the _pagerank_copartition pattern; measured
            # ~25x the per-round copartition_antijoin exchange variant
            import ray.data as _rd

            return _rd.from_arrow(_k_core_cached(
                cur, k=k, n_parts=n_parts, max_rounds=max_rounds))
        else:
            frontier_chunks = [
                blk.column("a").to_numpy(zero_copy_only=False)
                for blk in peel_ds.iter_batches(batch_format="pyarrow")
                if blk.num_rows]
            peel = np.sort(np.concatenate(frontier_chunks))
            peel_ref = ray.put(peel)

            def drop(b: pa.Table) -> pa.Table:
                p = ray.get(peel_ref)
                a = b.column("a").to_numpy(zero_copy_only=False)
                bb = b.column("b").to_numpy(zero_copy_only=False)
                ia = np.searchsorted(p, a)
                ib = np.searchsorted(p, bb)
                hit_a = (ia < len(p)) & \
                    (p[np.minimum(ia, len(p) - 1)] == a)
                hit_b = (ib < len(p)) & \
                    (p[np.minimum(ib, len(p) - 1)] == bb)
                return b.filter(pa.array(~(hit_a | hit_b)))

            nxt = cur.map_batches(drop, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        cur = nxt
        if cur.count() == 0:
            return ray.data.from_arrow(pa.schema(
                [("node", pa.int64()), ("deg", pa.int64())]).empty_table())
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def bfs_hops(edges_ds, *, seed: int, col_a: str = "u", col_b: str = "v",
             max_rounds: int = 6, local_threshold: int = 2_000_000,
             n_parts: int = 32,
             broadcast_threshold: int = 100_000_000) -> pa.Table:
    """Unweighted single-source shortest hop counts — frontier-expansion
    BFS over an undirected edge set: ``(node, hops)`` for every node
    reachable from ``seed`` within ``max_rounds`` hops (the seed itself
    at 0).  The reachability / blast-radius primitive alongside
    PageRank (influence), k-core (density) and components (identity).

    THREE tiers on graph size:

    * ``<= local_threshold`` symmetrized edges — fully in-process (the
      connected_components tradeoff: per-round Dataset/task launches
      dominate small graphs).
    * above that — per round the (sorted nodes, dist) state broadcasts
      ONCE (``ray.put`` of two numpy arrays); one vectorized pass over
      the cached edge blocks emits each block's newly-reached nodes
      (``searchsorted`` gather — edges never re-shuffle, rounds =
      O(diameter) ≤ max_rounds); the driver unions ≤ |new nodes| ids.
    * symmetrized EDGE count past ``broadcast_threshold`` (the gate is
      the edge count — already known from the materialized edge list;
      nodes ≤ 2·edges bounds the state the broadcast tier would hold)
      — NOTHING node-sized on the driver: :func:`_bfs_copartition`,
      the cached-edge-bucket frontier expansion (edges split once by
      ``hash(src)`` into plasma refs; per round one expand wave routes
      candidate destinations to their ``hash(node)`` buckets via
      ``num_returns`` refs and one anti-join wave merges them into the
      per-bucket visited state — only frontier-sized tables move,
      edges never re-exchange).  All tiers bit-equal
      (test_bfs_forced_copartition_tier_parity)."""
    import ray

    def sym(b: pa.Table) -> pa.Table:
        a = b.column(col_a).cast(pa.int64())
        c = b.column(col_b).cast(pa.int64())
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.combine_chunks(), c.combine_chunks()]),
             pa.concat_arrays([c.combine_chunks(), a.combine_chunks()])],
            names=["src", "dst"])

    edges = edges_ds.map_batches(sym, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    def block_new(tbl: pa.Table, nodes: np.ndarray, dist: np.ndarray,
                  r: int) -> np.ndarray:
        if tbl.num_rows == 0:       # materialize() empties carry no schema
            return np.zeros(0, dtype=np.int64)
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        si = np.searchsorted(nodes, s)
        di = np.searchsorted(nodes, d)
        hit = (dist[si] == r) & (dist[di] < 0)
        return np.unique(di[hit])

    n_edges = edges.count()
    if n_edges == 0:
        return pa.Table.from_arrays(
            [pa.array([seed], pa.int64()), pa.array([0], pa.int64())],
            names=["node", "hops"])

    if n_edges <= local_threshold:
        blocks = [t for t in ray.get(edges.to_arrow_refs())
                  if t.num_rows]
        nodes = np.unique(np.concatenate(
            [t.column("src").to_numpy(zero_copy_only=False)
             for t in blocks] + [np.array([seed], dtype=np.int64)]))
        dist = np.full(len(nodes), -1, dtype=np.int64)
        dist[np.searchsorted(nodes, seed)] = 0
        for r in range(max_rounds):
            new = np.unique(np.concatenate(
                [block_new(t, nodes, dist, r) for t in blocks]))
            new = new[dist[new] < 0]
            if len(new) == 0:
                break
            dist[new] = r + 1
    elif n_edges <= broadcast_threshold:
        refs = edges.to_arrow_refs()
        # node vector from per-block unique partials: only node-sized
        # arrays reach the driver, never edge blocks (src set == node
        # set after symmetrization)
        uniq = ray.remote(num_cpus=1)(lambda blk: np.unique(
            blk.column("src").to_numpy(zero_copy_only=False))
            if blk.num_rows else np.zeros(0, dtype=np.int64))
        nodes = np.unique(np.concatenate(
            ray.get([uniq.remote(b) for b in refs])
            + [np.array([seed], dtype=np.int64)]))
        dist = np.full(len(nodes), -1, dtype=np.int64)
        dist[np.searchsorted(nodes, seed)] = 0
        task = ray.remote(num_cpus=1)(
            lambda blk, st, r: block_new(blk, st[0], st[1], r))
        for r in range(max_rounds):
            state = ray.put((nodes, dist))
            outs = ray.get([task.remote(b, state, r) for b in refs])
            new = (np.unique(np.concatenate(outs))
                   if outs else np.zeros(0, dtype=np.int64))
            new = new[dist[new] < 0] if len(new) else new
            if len(new) == 0:
                break
            dist[new] = r + 1
    else:
        return _bfs_copartition(edges, seed=seed,
                                max_rounds=max_rounds, n_parts=n_parts)
    mask = dist >= 0
    return pa.Table.from_arrays(
        [pa.array(nodes[mask], pa.int64()),
         pa.array(dist[mask], pa.int64())],
        names=["node", "hops"])


def _bfs_copartition(edges, *, seed: int, max_rounds: int,
                     n_parts: int) -> pa.Table:
    """bfs_hops' past-the-driver-budget tier in the CACHED-EDGE-BUCKET
    pattern (_pagerank_copartition's shape): edges split ONCE by
    ``hash(src)`` into per-bucket plasma refs; per round, one task per
    bucket expands its LOCAL frontier slice against its cached edges
    (a frontier node's out-edges live in its own bucket by
    construction) and routes candidate destinations to their
    ``hash(node)`` buckets via ``num_returns`` refs; a second wave
    anti-joins candidates against each bucket's local visited set.
    Only frontier/candidate-sized tables move; edges are never
    re-exchanged and nothing node-sized reaches the driver (one count
    per bucket per round)."""
    import ray

    from mdvalidate_ray.state.sketches import bucket_int64

    dist_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    @ray.remote(num_cpus=1)
    def split(tbl: pa.Table):
        if tbl.num_rows == 0:
            e = pa.schema([("src", pa.int64()),
                           ("dst", pa.int64())]).empty_table()
            return tuple(e for _ in range(n_parts))
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        bk_v = bucket_int64(src, n_parts)
        return tuple(tbl.filter(pa.array(bk_v == b))
                     for b in range(n_parts))

    @ray.remote(num_cpus=1)
    def consolidate(*pieces):
        t = pa.concat_tables(list(pieces))
        # pre-sort by src once so every round's probe is one
        # searchsorted against a sorted column
        idx = pc.sort_indices(t, sort_keys=[("src", "ascending")])
        return t.take(idx)

    @ray.remote(num_cpus=1)
    def expand(edges_tbl: pa.Table, frontier: pa.Table):
        if frontier.num_rows == 0 or edges_tbl.num_rows == 0:
            e = pa.table({"node": pa.array([], pa.int64())})
            return tuple(e for _ in range(n_parts))
        fr = np.sort(frontier.column("node").to_numpy(
            zero_copy_only=False))
        src = edges_tbl.column("src").to_numpy(zero_copy_only=False)
        i = np.searchsorted(fr, src)
        hit = (i < len(fr)) & (fr[np.minimum(i, len(fr) - 1)] == src)
        d = np.unique(edges_tbl.column("dst").to_numpy(
            zero_copy_only=False)[hit])
        bk_v = bucket_int64(d, n_parts)
        return tuple(pa.table({"node": pa.array(d[bk_v == b])})
                     for b in range(n_parts))

    @ray.remote(num_cpus=1)
    def anti_new(state: pa.Table, rr: int, *cands):
        c = np.unique(np.concatenate(
            [t.column("node").to_numpy(zero_copy_only=False)
             for t in cands] or [np.zeros(0, dtype=np.int64)]))
        if len(c) == 0:
            return state, dist_schema.empty_table(), 0
        seen = np.sort(state.column("node").to_numpy(
            zero_copy_only=False))
        if len(seen):
            i = np.searchsorted(seen, c)
            hit = (i < len(seen)) &                 (seen[np.minimum(i, len(seen) - 1)] == c)
            c = c[~hit]
        new = pa.table({"node": pa.array(c),
                        "dist": pa.array(np.full(len(c), rr,
                                                 dtype=np.int64))},
                       schema=dist_schema)
        return pa.concat_tables([state, new]), new, int(len(c))

    blocks = list(edges.to_arrow_refs())
    splits = [split.options(num_returns=n_parts).remote(b)
              for b in blocks]
    e_refs = [consolidate.remote(*[sp[b] for sp in splits])
              for b in range(n_parts)]

    seed_b = int(bucket_int64(np.array([seed], dtype=np.int64),
                              n_parts)[0])
    empty_state = dist_schema.empty_table()
    seed_tbl = pa.table({"node": pa.array([int(seed)], pa.int64()),
                         "dist": pa.array([0], pa.int64())},
                        schema=dist_schema)
    state_refs = [ray.put(seed_tbl if b == seed_b else empty_state)
                  for b in range(n_parts)]
    frontier_refs = [ray.put(
        seed_tbl.select(["node"]) if b == seed_b else
        pa.table({"node": pa.array([], pa.int64())}))
        for b in range(n_parts)]

    for r in range(max_rounds):
        waves = [expand.options(num_returns=n_parts).remote(
            e_refs[b], frontier_refs[b]) for b in range(n_parts)]
        outs = [anti_new.options(num_returns=3).remote(
            state_refs[b2], r + 1,
            *[waves[b][b2] for b in range(n_parts)])
            for b2 in range(n_parts)]
        state_refs = [o[0] for o in outs]
        frontier_refs = [o[1] for o in outs]
        n_new = int(sum(ray.get([o[2] for o in outs])))
        if n_new == 0:
            break

    tbls = [t for t in ray.get(state_refs) if t.num_rows]
    out = pa.concat_tables(tbls) if tbls else dist_schema.empty_table()
    idx = pc.sort_indices(out, sort_keys=[("node", "ascending")])
    out = out.take(idx)
    return pa.Table.from_arrays(
        [out.column("node"), out.column("dist")], names=["node", "hops"])


def _bellman_ford_copartition(edges, *, seed: int, max_rounds: int,
                              n_parts: int) -> pa.Table:
    """bellman_ford_costs' past-the-driver-budget tier: the (node,
    cost) state stays a Dataset; per round ONE hash(src) co-partition
    relaxes the improved-node frontier against the symmetric weighted
    edge list (per-bucket pre-min per destination) and ONE hash(node)
    co-partition min-merges the candidates into the state, flagging
    improvements to form the next frontier.  Nothing node-sized ever
    folds to the driver; the final collect is the caller's result."""
    import ray.data

    INF = np.int64(2 ** 62)

    from mdvalidate_ray.state.sketches import bucket_int64

    def bk(v: np.ndarray) -> pa.Array:
        return pa.array(bucket_int64(v, n_parts))

    st_schema = pa.schema([("node", pa.int64()), ("cost", pa.int64())])
    seed_tbl = pa.table({"node": pa.array([int(seed)], pa.int64()),
                         "cost": pa.array([0], pa.int64())})
    state = ray.data.from_arrow(seed_tbl).materialize()
    frontier = state

    def tag_edges(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": b.column("src"), "dst": b.column("dst"),
            "w": b.column("w"),
            "_f": pa.array(np.zeros(b.num_rows, dtype=bool)),
            "_bk": bk(s)})

    def tag_frontier(b: pa.Table) -> pa.Table:
        v = b.column("node").to_numpy(zero_copy_only=False)
        z = pa.array(np.zeros(len(v), dtype=np.int64))
        return pa.table({"src": b.column("node"), "dst": z,
                         "w": b.column("cost"),
                         "_f": pa.array(np.ones(len(v), dtype=bool)),
                         "_bk": bk(v)})

    def relax(g: pa.Table) -> pa.Table:
        is_f = g.column("_f").to_numpy(zero_copy_only=False)
        fn = g.column("src").to_numpy(zero_copy_only=False)[is_f]
        fc = g.column("w").to_numpy(zero_copy_only=False)[is_f]
        o = np.argsort(fn, kind="stable")
        fn, fc = fn[o], fc[o]
        if len(fn) == 0:
            return st_schema.empty_table()
        e = g.filter(pa.array(~is_f))
        s = e.column("src").to_numpy(zero_copy_only=False)
        i = np.searchsorted(fn, s)
        hit = (i < len(fn)) & (fn[np.minimum(i, len(fn) - 1)] == s)
        if not hit.any():
            return st_schema.empty_table()
        d = e.column("dst").to_numpy(zero_copy_only=False)[hit]
        c = fc[i[hit]] + e.column("w").to_numpy(
            zero_copy_only=False)[hit]
        u, inv = np.unique(d, return_inverse=True)
        pre = np.full(len(u), INF, dtype=np.int64)
        np.minimum.at(pre, inv, c)
        return pa.table({"node": pa.array(u), "cost": pa.array(pre)},
                        schema=st_schema)

    def tag_state(b: pa.Table) -> pa.Table:
        v = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({"node": b.column("node"),
                         "cost": b.column("cost"),
                         "_st": pa.array(np.ones(len(v), dtype=bool)),
                         "_bk": bk(v)})

    def tag_cand(b: pa.Table) -> pa.Table:
        v = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({"node": b.column("node"),
                         "cost": b.column("cost"),
                         "_st": pa.array(np.zeros(len(v), dtype=bool)),
                         "_bk": bk(v)})

    merged_schema = pa.schema([("node", pa.int64()),
                               ("cost", pa.int64()),
                               ("imp", pa.bool_())])

    def merge(g: pa.Table) -> pa.Table:
        nodes_np = g.column("node").to_numpy(zero_copy_only=False)
        cost_np = g.column("cost").to_numpy(zero_copy_only=False)
        is_st = g.column("_st").to_numpy(zero_copy_only=False)
        u, inv = np.unique(nodes_np, return_inverse=True)
        old = np.full(len(u), INF, dtype=np.int64)
        np.minimum.at(old, inv[is_st], cost_np[is_st])
        cand = np.full(len(u), INF, dtype=np.int64)
        np.minimum.at(cand, inv[~is_st], cost_np[~is_st])
        new = np.minimum(old, cand)
        return pa.table({"node": pa.array(u), "cost": pa.array(new),
                         "imp": pa.array(cand < old)},
                        schema=merged_schema)

    for _ in range(max_rounds):
        if frontier.count() == 0:
            break
        cand = edges.map_batches(
            tag_edges, batch_format="pyarrow",
            zero_copy_batch=True).union(
            frontier.map_batches(tag_frontier, batch_format="pyarrow",
                                 zero_copy_batch=True)) \
            .groupby("_bk").map_groups(relax, batch_format="pyarrow")
        merged = state.map_batches(tag_state, batch_format="pyarrow",
                                   zero_copy_batch=True).union(
            cand.map_batches(tag_cand, batch_format="pyarrow",
                             zero_copy_batch=True)) \
            .groupby("_bk").map_groups(merge, batch_format="pyarrow") \
            .materialize()
        frontier = merged.map_batches(
            lambda b: b.filter(b.column("imp")).select(
                ["node", "cost"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        state = merged.select_columns(["node", "cost"]).materialize()

    blks = [b for b in state.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    out = pa.concat_tables(blks) if blks else st_schema.empty_table()
    idx = pc.sort_indices(out, sort_keys=[("node", "ascending")])
    return out.take(idx).select(["node", "cost"])


def bellman_ford_costs(edges_ds, *, seed: int, col_a: str = "u",
                       col_b: str = "v", weight_col: str | None = None,
                       max_rounds: int = 3,
                       local_threshold: int = 2_000_000,
                       n_parts: int = 32,
                       broadcast_threshold: int = 100_000_000
                       ) -> pa.Table:
    """Weighted single-source shortest-path costs — Bellman-Ford
    relaxation rounds over an undirected edge set, the MIN-PLUS
    semiring companion to :func:`bfs_hops` (which is the boolean/
    hop-count case).  After ``max_rounds`` rounds the result is exactly
    "cheapest cost over paths of ≤ max_rounds edges" — the same
    truncation a hop-tracking recursive SQL oracle expresses, so
    integer weights make the comparison exact.

    Same three tiers as bfs_hops: in-process below
    ``local_threshold`` edges; broadcast rounds above it (the sorted
    (nodes, cost) state broadcasts once per round, each cached edge
    block emits per-destination ``np.minimum`` relaxation partials —
    no per-edge Python — and the driver min-folds ≤ |nodes|
    candidates); and past ``broadcast_threshold`` the fully
    CO-PARTITIONED tier where the (node, cost) state stays a Dataset
    and each round is frontier⋈edges on ``hash(src)`` + a min-merge on
    ``hash(node)`` — nothing node-sized on the driver.  Relaxing only
    from the previous round's IMPROVED nodes is cost-state-equivalent
    to full-state relaxation (a ≤r-edge path extends a ≤r−1-edge one),
    so all tiers are bit-equal
    (test_bellman_forced_copartition_tier_parity).  Iteration-heavy
    deployments should adopt _pagerank_copartition's cached-edge-
    bucket pattern (edges split once, only state moves per round)."""
    import ray

    def sym(b: pa.Table) -> pa.Table:
        a = b.column(col_a).cast(pa.int64())
        c = b.column(col_b).cast(pa.int64())
        if weight_col is not None:
            w = b.column(weight_col).cast(pa.int64())
        else:
            # default deterministic endpoint-derived weight 1..5 — a
            # pure function of (u, v) any SQL twin can recompute
            s_ = pc.add(a, c)
            w = pc.add(pc.subtract(
                s_, pc.multiply(pc.divide(s_, 5), 5)), 1).cast(pa.int64())
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.combine_chunks(), c.combine_chunks()]),
             pa.concat_arrays([c.combine_chunks(), a.combine_chunks()]),
             pa.concat_arrays([w.combine_chunks(), w.combine_chunks()])],
            names=["src", "dst", "w"])

    edges = edges_ds.map_batches(sym, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    INF = np.int64(2 ** 62)

    def block_relax(tbl: pa.Table, nodes: np.ndarray,
                    cost: np.ndarray) -> tuple:
        if tbl.num_rows == 0:       # materialize() empties carry no schema
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.int64))
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        si = np.searchsorted(nodes, s)
        di = np.searchsorted(nodes, d)
        reach = cost[si] < INF
        if not reach.any():
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.int64))
        cand = np.full(len(nodes), INF, dtype=np.int64)
        np.minimum.at(cand, di[reach], cost[si[reach]] + w[reach])
        hit = np.flatnonzero(cand < cost)
        return hit.astype(np.int64), cand[hit]

    n_edges = edges.count()
    if n_edges == 0:
        return pa.Table.from_arrays(
            [pa.array([seed], pa.int64()), pa.array([0], pa.int64())],
            names=["node", "cost"])

    if n_edges > broadcast_threshold:
        return _bellman_ford_copartition(edges, seed=seed,
                                         max_rounds=max_rounds,
                                         n_parts=n_parts)

    use_local = n_edges <= local_threshold
    if use_local:
        blocks = [t for t in ray.get(edges.to_arrow_refs())
                  if t.num_rows]
        node_parts = [t.column("src").to_numpy(zero_copy_only=False)
                      for t in blocks]
    else:
        refs = edges.to_arrow_refs()
        uniq = ray.remote(num_cpus=1)(lambda blk: np.unique(
            blk.column("src").to_numpy(zero_copy_only=False))
            if blk.num_rows else np.zeros(0, dtype=np.int64))
        node_parts = ray.get([uniq.remote(b) for b in refs])
    nodes = np.unique(np.concatenate(
        list(node_parts) + [np.array([seed], dtype=np.int64)]))
    cost = np.full(len(nodes), INF, dtype=np.int64)
    cost[np.searchsorted(nodes, seed)] = 0

    if use_local:
        for _ in range(max_rounds):
            cand = np.full(len(nodes), INF, dtype=np.int64)
            for t in blocks:
                hit, vals = block_relax(t, nodes, cost)
                np.minimum.at(cand, hit, vals)
            upd = cand < cost
            if not upd.any():
                break
            cost[upd] = cand[upd]
    else:
        task = ray.remote(num_cpus=1)(
            lambda blk, st: block_relax(blk, st[0], st[1]))
        for _ in range(max_rounds):
            state = ray.put((nodes, cost))
            outs = ray.get([task.remote(b, state) for b in refs])
            cand = np.full(len(nodes), INF, dtype=np.int64)
            for hit, vals in outs:
                np.minimum.at(cand, hit, vals)
            upd = cand < cost
            if not upd.any():
                break
            cost[upd] = cand[upd]
    mask = cost < INF
    return pa.Table.from_arrays(
        [pa.array(nodes[mask], pa.int64()),
         pa.array(cost[mask], pa.int64())],
        names=["node", "cost"])
