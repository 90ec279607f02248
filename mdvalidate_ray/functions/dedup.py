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
    """num_perm universal hashes over shingle hashes, vectorized.

    Coefficients are seeded constants → identical across actors/processes."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(object)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(object)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max,
                           dtype=np.uint64)
        base = hash_strings(sh).astype(object)  # python ints: no overflow
        # (num_perm, n_shingles) universal hash, min over shingles
        vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % _MERSENNE
        return np.asarray(vals.min(axis=1), dtype=np.uint64)

    @staticmethod
    def est_similarity(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


class MinHashStage:
    """Actor stage: text → (band, bucket, doc_id, signature) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 column: str = "text", key: str = "doc_id"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm=num_perm, k=k)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key).cast(pa.string()).to_pylist()
        out_band, out_bucket, out_key, out_sig = [], [], [], []
        for key, text in zip(keys, texts):
            sig = self.mh.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                bucket = int(hash_strings(["|".join(map(str, chunk))])[0])
                out_band.append(b)
                out_bucket.append(bucket)
                out_key.append(key)
                out_sig.append(sig.tobytes())
        return pa.Table.from_arrays(
            [pa.array(out_band, pa.int32()),
             pa.array(np.array(out_bucket, dtype=np.uint64)),
             pa.array(out_key, pa.string()),
             pa.array(out_sig, pa.binary())],
            names=["band", "bucket", "doc_id", "sig"])


def minhash_near_duplicates(ds, *, threshold: float = 0.8,
                            num_perm: int = 64, bands: int = 16, k: int = 3,
                            column: str = "text", key: str = "doc_id",
                            max_bucket: int = 5000, concurrency=(1, 8)):
    """Near-dup pairs (doc_a < doc_b, est_jaccard ≥ threshold)."""
    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k,
                                   column=column, key=key),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)

    pair_schema = pa.schema([("doc_a", pa.string()), ("doc_b", pa.string()),
                             ("est_jaccard", pa.float64())])

    def emit_pairs(g: pa.Table) -> pa.Table:
        n = len(g)
        if n < 2 or n > max_bucket:  # degenerate band bucket; skip
            return pair_schema.empty_table()
        ids = g.column("doc_id").to_pylist()
        sigs = [np.frombuffer(s, dtype=np.uint64)
                for s in g.column("sig").to_pylist()]
        rows = []
        seen = set()
        for i in range(n):
            for j in range(i + 1, n):
                a, b = sorted((ids[i], ids[j]))
                if a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                est = MinHasher.est_similarity(sigs[i], sigs[j])
                if est >= threshold:
                    rows.append({"doc_a": a, "doc_b": b, "est_jaccard": est})
        return pa.Table.from_pylist(rows, schema=pair_schema)

    pairs = banded.groupby(["band", "bucket"]).map_groups(
        emit_pairs, batch_format="pyarrow")

    # a pair can surface from several bands → dedup on (doc_a, doc_b)
    def dedup_pairs(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pairs, batch_format="pyarrow")


# --- SimHash ----------------------------------------------------------------

def simhash64(text: str) -> int:
    tokens = (text or "").lower().split()
    if not tokens:
        return 0
    hs = hash_strings(tokens)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)


class SimHashStage:
    def __init__(self, column: str = "text", key: str = "doc_id"):
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key).cast(pa.string()).to_pylist()
        rows_chunk, rows_val, rows_key, rows_sim = [], [], [], []
        for kk, t in zip(keys, texts):
            sh = simhash64(t)
            for c in range(4):
                rows_chunk.append(c)
                rows_val.append((sh >> (16 * c)) & 0xFFFF)
                rows_key.append(kk)
                rows_sim.append(sh)
        return pa.Table.from_arrays(
            [pa.array(rows_chunk, pa.int32()),
             pa.array(rows_val, pa.int32()),
             pa.array(rows_key, pa.string()),
             pa.array(np.array(rows_sim, dtype=np.uint64))],
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
