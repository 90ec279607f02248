"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the part that matters at 100 TB):

* **exact** — hash inside the batch (combiner collapses within-batch dups)
  → ``groupby(hash).sum`` of tiny (hash, cnt) rows; only the pre-aggregated
  keys shuffle, never the text.
* **MinHash+LSH** — signatures are computed per batch (vectorized numpy:
  one (num_perm × shingles) universal-hash matrix per actor), banded, and
  only (band, bucket, doc_id, signature) rows shuffle — the classic
  shingle→minhash→band→bucket groupby.  Candidate pairs are verified by
  signature similarity inside ``map_groups``; texts never co-locate.
* **SimHash** — 64-bit signatures; near-dup candidates by pigeonhole on
  4×16-bit chunks (hamming ≤ 3 ⇒ at least one chunk equal), verified by
  exact hamming distance in the bucket group.
* **n-gram Jaccard** — exact verification used on LSH candidates (and
  directly at test scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mdvalidate_ray.state.sketches import hash_strings

_MERSENNE = (1 << 61) - 1


# --- exact dedup ------------------------------------------------------------

def exact_duplicate_groups(ds, column: str = "text", key: str = "doc_id"):
    """Groups of byte-identical documents → Dataset (fp_md5, cnt, doc_ids).

    The shuffle payload is (hash, id) — pre-grouped per batch."""
    import hashlib

    def to_pairs(b: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((t or "").encode()).hexdigest()
                  for t in b.column(column).to_pylist()]
        return pa.Table.from_arrays(
            [pa.array(hashes), b.column(key).cast(pa.string())],
            names=["fp_md5", key])

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def emit_groups(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return pa.schema([("fp_md5", pa.string()), ("cnt", pa.int64()),
                              ("doc_ids", pa.list_(pa.string()))]).empty_table()
        ids = sorted(g.column(key).to_pylist())
        return pa.Table.from_pylist([{
            "fp_md5": g.column("fp_md5")[0].as_py(),
            "cnt": len(g),
            "doc_ids": ids,
        }])

    return pairs.groupby("fp_md5").map_groups(emit_groups,
                                              batch_format="pyarrow")


# --- shingles + MinHash -----------------------------------------------------

def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles (n-grams).  Word shingles discriminate much better
    than character shingles on small-vocabulary corpora: two unrelated
    docs sharing a vocabulary still share few word *sequences*."""
    words = (text or "").lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


class MinHasher:
    """num_perm multiplicative hashes over shingle hashes, fully vectorized.

    The permutation family is ``(a*h + b) mod 2**64`` with odd ``a`` —
    native uint64 wrap-around arithmetic, so the whole batch computes as
    one (num_perm × total_shingles) numpy op instead of per-doc object-int
    math.  Coefficients are seeded constants → identical across
    actors/processes."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 62, num_perm, dtype=np.uint64)
                  | np.uint64(1))
        self.b = rng.integers(0, 1 << 62, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature_batch(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) signatures with ONE hash call for the whole
        batch and per-doc mins via ``np.minimum.reduceat``."""
        all_shingles: list[str] = []
        bounds = [0]
        for t in texts:
            all_shingles.extend(word_shingles(t, self.k))
            bounds.append(len(all_shingles))
        n = len(texts)
        out = np.full((n, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        if not all_shingles:
            return out
        h = hash_strings(all_shingles)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * h[None, :] + self.b[:, None]
        starts = np.asarray(bounds[:-1])
        nonempty = np.asarray([bounds[i + 1] > bounds[i] for i in range(n)])
        if nonempty.any():
            # reduceat over non-empty segments only (empty segments would
            # alias the next segment's first element)
            seg_starts = starts[nonempty]
            mins = np.minimum.reduceat(vals, seg_starts, axis=1)
            out[nonempty] = mins.T
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signature_batch([text])[0]

    @staticmethod
    def est_similarity(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


class MinHashStage:
    """Actor stage: text → (band, bucket, doc_id, signature) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 column: str = "text", key: str = "doc_id",
                 n_parts: int = 128):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm=num_perm, k=k)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.column = column
        self.key = key
        self.n_parts = n_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key).cast(pa.string()).to_pylist()
        n = len(texts)
        sigs = self.mh.signature_batch(texts)          # (n, num_perm)
        # band buckets: FNV-style fold over each band's chunk, vectorized
        # across (docs × bands) in rows_per_band uint64 ops
        chunks = sigs.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bucket = np.full((n, self.bands), 1469598103934665603,
                             dtype=np.uint64)
            for j in range(self.rows_per_band):
                bucket = bucket * np.uint64(1099511628211) ^ chunks[:, :, j]
        sig_bytes = [sigs[i].tobytes() for i in range(n)]
        out_key = np.repeat(np.arange(n), self.bands)
        # coarse co-partition key: shuffling on (band,bucket) directly makes
        # one Python map_groups call per fine bucket (tens of thousands);
        # hashing down to n_parts coarse groups keeps the exchange identical
        # in volume but bounds group calls, with fine grouping done
        # vectorized inside the group (same trick as referential.py)
        band_ids = np.tile(np.arange(self.bands, dtype=np.uint64), n)
        part = (bucket.ravel() ^ band_ids) % np.uint64(self.n_parts)
        return pa.Table.from_arrays(
            [pa.array(part.astype(np.int64)),
             pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
             pa.array(bucket.ravel()),
             pa.array([keys[i] for i in out_key], pa.string()),
             pa.array([sig_bytes[i] for i in out_key], pa.binary())],
            names=["part", "band", "bucket", "doc_id", "sig"])


def minhash_near_duplicates(ds, *, threshold: float = 0.8,
                            num_perm: int = 64, bands: int = 16, k: int = 3,
                            column: str = "text", key: str = "doc_id",
                            max_bucket: int = 5000, n_parts: int = 128,
                            concurrency=(1, 8)):
    """Near-dup pairs (doc_a < doc_b, est_jaccard ≥ threshold)."""
    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k,
                                   column=column, key=key,
                                   n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)

    pair_schema = pa.schema([("doc_a", pa.string()), ("doc_b", pa.string()),
                             ("est_jaccard", pa.float64())])

    def emit_pairs(part_group: pa.Table) -> pa.Table:
        """One coarse partition: group by fine (band,bucket) in-memory,
        emit candidate pairs per fine bucket."""
        import collections

        bands_ = part_group.column("band").to_pylist()
        buckets_ = part_group.column("bucket").to_pylist()
        ids_ = part_group.column("doc_id").to_pylist()
        sigs_ = part_group.column("sig").to_pylist()
        fine: dict = collections.defaultdict(list)
        for i in range(len(ids_)):
            fine[(bands_[i], buckets_[i])].append(i)
        rows = []
        seen = set()
        for members in fine.values():
            n = len(members)
            if n < 2 or n > max_bucket:
                continue
            sigs = [np.frombuffer(sigs_[i], dtype=np.uint64)
                    for i in members]
            for x in range(n):
                for y in range(x + 1, n):
                    a, b = sorted((ids_[members[x]], ids_[members[y]]))
                    if a == b or (a, b) in seen:
                        continue
                    seen.add((a, b))
                    est = MinHasher.est_similarity(sigs[x], sigs[y])
                    if est >= threshold:
                        rows.append({"doc_a": a, "doc_b": b,
                                     "est_jaccard": est})
        return pa.Table.from_pylist(rows, schema=pair_schema)

    pairs = banded.groupby("part").map_groups(emit_pairs,
                                              batch_format="pyarrow")

    # a pair can surface from several coarse partitions (different bands)
    # → dedup on (doc_a, doc_b); tiny input (candidate pairs only)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


# --- SimHash ----------------------------------------------------------------

def simhash_batch(texts: list) -> np.ndarray:
    """(n,) uint64 simhashes — one hash call for the whole batch, per-doc
    bit-vote accumulation via ``np.add.reduceat``."""
    all_tokens: list[str] = []
    bounds = [0]
    for t in texts:
        all_tokens.extend((t or "").lower().split())
        bounds.append(len(all_tokens))
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if not all_tokens:
        return out
    hs = hash_strings(all_tokens)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = 2 * bits - 1                      # (total_tokens, 64)
    starts = np.asarray(bounds[:-1])
    nonempty = np.asarray([bounds[i + 1] > bounds[i] for i in range(n)])
    if nonempty.any():
        acc = np.add.reduceat(votes, starts[nonempty], axis=0)
        sig_bits = (acc > 0).astype(np.uint64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        out[nonempty] = (sig_bits * weights[None, :]).sum(axis=1,
                                                          dtype=np.uint64)
    return out


def simhash64(text: str) -> int:
    return int(simhash_batch([text])[0])


class SimHashStage:
    def __init__(self, column: str = "text", key: str = "doc_id"):
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key).cast(pa.string()).to_pylist()
        n = len(texts)
        sims = simhash_batch(texts)                    # (n,) uint64
        chunk_ids = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = (chunk_ids.astype(np.uint64) * np.uint64(16))
        sims_rep = np.repeat(sims, 4)
        values = ((sims_rep >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        key_idx = np.repeat(np.arange(n), 4)
        return pa.Table.from_arrays(
            [pa.array(chunk_ids),
             pa.array(values),
             pa.array([keys[i] for i in key_idx], pa.string()),
             pa.array(sims_rep)],
            names=["chunk", "value", "doc_id", "simhash"])


def simhash_near_duplicates(ds, *, max_hamming: int = 3,
                            column: str = "text", key: str = "doc_id",
                            max_bucket: int = 5000, concurrency=(1, 8)):
    """Pairs with hamming(simhash) ≤ max_hamming (pigeonhole banding)."""
    banded = ds.map_batches(
        SimHashStage, fn_constructor_kwargs=dict(column=column, key=key),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency)

    pair_schema = pa.schema([("doc_a", pa.string()), ("doc_b", pa.string()),
                             ("hamming", pa.int32())])

    def emit_pairs(g: pa.Table) -> pa.Table:
        n = len(g)
        if n < 2 or n > max_bucket:
            return pair_schema.empty_table()
        ids = g.column("doc_id").to_pylist()
        sims = g.column("simhash").to_pylist()
        rows, seen = [], set()
        for i in range(n):
            for j in range(i + 1, n):
                a, b = sorted((ids[i], ids[j]))
                if a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                d = bin(sims[i] ^ sims[j]).count("1")
                if d <= max_hamming:
                    rows.append({"doc_a": a, "doc_b": b, "hamming": d})
        return pa.Table.from_pylist(rows, schema=pair_schema)

    pairs = banded.groupby(["chunk", "value"]).map_groups(
        emit_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


# --- n-gram Jaccard verification -------------------------------------------

def verify_pairs_jaccard(pairs_ds, docs_ds, *, k: int = 3,
                         threshold: float = 0.8,
                         column: str = "text", key: str = "doc_id"):
    """Exact n-gram Jaccard for candidate pairs.  The text lookup is a
    broadcast of the *candidate docs only* (ids ∪ from pairs — a tiny set
    relative to the corpus), not a corpus shuffle."""
    wanted = set()
    pair_rows = pairs_ds.take_all()
    for r in pair_rows:
        wanted.add(r["doc_a"])
        wanted.add(r["doc_b"])
    if not wanted:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("doc_a", pa.string()), ("doc_b", pa.string()),
             ("jaccard", pa.float64())]))
    texts = {}
    for b in docs_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        keys = b.column(key).cast(pa.string()).to_pylist()
        vals = b.column(column).to_pylist()
        for kk, t in zip(keys, vals):
            if kk in wanted:
                texts[kk] = t
    out = []
    for r in pair_rows:
        j = jaccard(texts.get(r["doc_a"], ""), texts.get(r["doc_b"], ""), k)
        if j >= threshold:
            out.append({"doc_a": r["doc_a"], "doc_b": r["doc_b"],
                        "jaccard": j})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("doc_a", pa.string()), ("doc_b", pa.string()),
         ("jaccard", pa.float64())]))
