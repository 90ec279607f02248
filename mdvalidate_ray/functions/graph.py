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


def pagerank(edges_ds, *, col_a: str = "src", col_b: str = "dst",
             damping: float = 0.85, n_iter: int = 10,
             symmetric: bool = True, n_parts: int = 16,
             local_threshold: int = 2_000_000) -> pa.Table:
    """PageRank over an edge Dataset → (node, rank) table.

    ``symmetric=True`` treats edges as undirected (each edge contributes
    both ways), which also guarantees no dangling nodes; with
    ``symmetric=False`` dangling mass is redistributed uniformly (the
    standard correction) so ranks still sum to 1.

    Size tier (same rationale as ``connected_components``): at or below
    ``local_threshold`` symmetrized edges, the edge set is no bigger
    than one rank broadcast, so k per-iteration Dataset launches are
    pure overhead — collect the arrays once and run the identical
    iteration in-process.  Parity is pinned by the differential test
    (which forces both tiers).
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
