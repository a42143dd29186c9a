"""Deduplication operators — exact and near-dup (training-data ops).

Scale design (the part that matters at 100 TB):

  - **exact**: content-hash per batch (vectorized) → ONE small shuffle
    keyed by hash over (hash, doc_id) pairs only — the full rows never
    move; survivors re-join by doc_id or, as here, the aggregate output
    IS the result (hash, keeper, dup_count).
  - **MinHash+LSH**: per-batch numpy minhash signatures → explode to
    (band_id, band_hash, doc_id) rows (b small ints per doc — tiny vs
    the documents) → groupby the band key → candidate pairs within
    buckets → verify. The only all-to-all moves b×8-byte keys per doc.
  - **SimHash**: 64-bit signature per doc → 4×16-bit band blocking for
    hamming ≤ 3 candidates → verify hamming on the 8-byte sigs.
  - **n-gram Jaccard**: exact verification on candidate pairs only —
    never all-pairs. Here the shingle sets for verification come from a
    broadcast signature/text map (fine at test scale); at cluster scale
    the documented path is a hash-partition join of candidate pair ids
    back to the documents table (same band-key partitioning reused).

All signature math is numpy over batches; Python never loops over
shingles (`np.frombuffer` sliding-window hashing).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------- exact dedup ---------------------------------------------------

def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    import hashlib

    hashes = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column(col).to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def dedup_exact(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """(text_hash, keep_doc_id, dup_count) — hash-partitioned first-wins.

    Reference analog: completed-url skip (db_utils.py:76-123) is the
    same 'first writer wins by key' semantics, keyed here by content.
    """
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(
        lambda t: add_text_hash(t, text_col), batch_format="pyarrow"
    ).select_columns([id_col, "text_hash"])
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keep_doc_id"),
        Count(alias_name="dup_count"),
    )


# ---------- minhash -------------------------------------------------------

def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingles → 64-bit hashes, fully vectorized."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            out = out * np.uint64(1099511628211) + arr[j : j + n]
    return np.unique(out)


class MinHasher:
    """Per-batch minhash signatures (n_perm universal-hash permutations).

    Stateful stage: the permutation coefficients are generated once per
    actor from a fixed seed (deterministic across the cluster).
    """

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (n_perm, n_shingles) universal hash, min over shingles
            hv = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [self.signature(t).tolist() for t in texts]
        return batch.append_column(
            "minhash", pa.array(sigs, pa.list_(pa.uint64(), self.n_perm))
        )


def explode_bands(batch: pa.Table, n_bands: int = 16) -> pa.Table:
    """(doc_id, minhash) → b rows (band_id, band_hash, doc_id)."""
    ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("minhash").to_pylist()
    band_ids, band_hashes, doc_ids = [], [], []
    r = len(sigs[0]) // n_bands if sigs else 0
    for did, sig in zip(ids, sigs):
        arr = np.asarray(sig, dtype=np.uint64).reshape(n_bands, r)
        with np.errstate(over="ignore"):
            bh = (
                arr * np.uint64(0x9E3779B97F4A7C15)
            ).sum(axis=1)  # cheap band mix
        band_ids.extend(range(n_bands))
        band_hashes.extend(int(x) for x in bh)
        doc_ids.extend([did] * n_bands)
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        }
    )


def _pairs_from_groups(group: "pa.Table") -> pa.Table:
    """Within one (band_id, band_hash) bucket → unordered candidate pairs."""
    ids = sorted(group.column("doc_id").to_pylist())
    a, b = [], []
    # bucket sizes are tiny unless data is degenerate; cap guards a
    # pathological all-equal bucket from exploding quadratically
    cap = 200
    ids = ids[:cap]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"doc_a": pa.array(a, pa.int64()),
                     "doc_b": pa.array(b, pa.int64())})


def minhash_lsh_candidates(docs_ds, n_perm: int = 64, n_bands: int = 16,
                           shingle_k: int = 5):
    """documents → distinct candidate pairs via banded LSH (one shuffle)."""
    from ray.data.aggregate import Count

    sigs = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher, fn_constructor_kwargs={"n_perm": n_perm, "shingle_k": shingle_k},
        batch_format="pyarrow", concurrency=2,
    ).select_columns(["doc_id", "minhash"])
    bands = sigs.map_batches(
        lambda t, nb=n_bands: explode_bands(t, nb), batch_format="pyarrow"
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _pairs_from_groups, batch_format="pyarrow"
    )
    # distinct pairs (a pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands_hit")
    )


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = _shingle_hashes(text_a, k), _shingle_hashes(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True)
    return len(inter) / (len(sa) + len(sb) - len(inter))


def minhash_dedup_pairs(docs_ds, threshold: float = 0.8, n_perm: int = 64,
                        n_bands: int = 16, shingle_k: int = 5,
                        verify: str = "exact"):
    """Near-dup pairs with Jaccard ≥ threshold.

    Candidate generation is fully distributed (see module docstring);
    verification joins texts back via a driver-broadcast id→text map —
    valid while the candidate set is small (LSH guarantees that for
    sane thresholds); the cluster-scale path is a partitioned join on
    doc_id, same key as the band shuffle.
    """
    import ray

    cands = minhash_lsh_candidates(docs_ds, n_perm, n_bands, shingle_k)
    cand_tbl = cands.to_pandas()
    if len(cand_tbl) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard_pct": pa.array([], pa.int64())})
    need = set(cand_tbl["doc_a"]) | set(cand_tbl["doc_b"])
    texts = {}
    for b in docs_ds.select_columns(["doc_id", "text"]).iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            if did in need:
                texts[did] = t
    texts_ref = ray.put(texts)

    def _verify(t: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        a = t.column("doc_a").to_pylist()
        b_ = t.column("doc_b").to_pylist()
        keep_a, keep_b, jac = [], [], []
        for x, y in zip(a, b_):
            j = exact_jaccard(tx[x], tx[y], shingle_k)
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                jac.append(int(round(j * 100)))
        return pa.table({"doc_a": pa.array(keep_a, pa.int64()),
                         "doc_b": pa.array(keep_b, pa.int64()),
                         "jaccard_pct": pa.array(jac, pa.int64())})

    return cands.select_columns(["doc_a", "doc_b"]).map_batches(
        _verify, batch_format="pyarrow"
    )


# ---------- simhash -------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word tokens (Charikar 2002): per-token 64-bit
    hash votes ± on each bit; sign of the vote vector is the signature."""

    def __init__(self, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.mix = np.uint64(rng.randint(1, 2**63 - 1))

    def _token_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        out = np.zeros(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = np.uint64(14695981039346656037)
            with np.errstate(over="ignore"):
                for ch in tok.encode("utf-8"):
                    h = (h ^ np.uint64(ch)) * np.uint64(1099511628211)
            out[i] = h
        return out

    def signature(self, text: str) -> int:
        hs = self._token_hashes(text)
        if len(hs) == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 votes
        sig = 0
        for b in np.nonzero(votes > 0)[0]:
            sig |= 1 << int(b)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [self.signature(t) for t in texts]
        return batch.append_column("simhash", pa.array(sigs, pa.uint64()))


def simhash_table(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=2
    ).select_columns(["doc_id", "simhash"])


def simhash_dedup_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 4-band
    blocking (pigeonhole: ≤3 differing bits ⇒ one 16-bit band equal)."""
    from ray.data.aggregate import Count

    sigs = simhash_table(docs_ds)

    def _explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sg = t.column("simhash").to_pylist()
        band_ids, band_vals, doc_ids, full = [], [], [], []
        for did, s in zip(ids, sg):
            for b in range(4):
                band_ids.append(b)
                band_vals.append((s >> (16 * b)) & 0xFFFF)
                doc_ids.append(did)
                full.append(s)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_val": pa.array(band_vals, pa.int32()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(full, pa.uint64()),
        })

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sgs = group.column("simhash").to_pylist()
        order = np.argsort(ids)
        a, b_, ham = [], [], []
        cap = 200
        order = order[:cap]
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                x, y = order[ii], order[jj]
                h = int(bin(sgs[x] ^ sgs[y]).count("1"))
                if h <= max_hamming and ids[x] != ids[y]:
                    a.append(min(ids[x], ids[y]))
                    b_.append(max(ids[x], ids[y]))
                    ham.append(h)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b_, pa.int64()),
                         "hamming": pa.array(ham, pa.int64())})

    pairs = sigs.map_batches(_explode, batch_format="pyarrow").groupby(
        ["band_id", "band_val"]
    ).map_groups(_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands_hit"),
    )
