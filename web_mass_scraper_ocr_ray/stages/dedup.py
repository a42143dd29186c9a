"""Deduplication operators — exact and near-dup (training-data ops).

Scale design (the part that matters at 100 TB):

  - **exact**: content-hash per batch (vectorized) → ONE small shuffle
    keyed by hash over (hash, doc_id) pairs only — the full rows never
    move; survivors re-join by doc_id or, as here, the aggregate output
    IS the result (hash, keeper, dup_count).
  - **MinHash+LSH**: per-batch numpy minhash signatures → explode to
    (band_id, band_hash, doc_id) rows (b small ints per doc — tiny vs
    the documents) → groupby a COARSE key (band_hash % 512, see
    N_COARSE_BUCKETS) with a vectorized fine-key groupby inside each
    group → candidate pairs → verify. The only all-to-all moves
    b×8-byte keys per doc.
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

from typing import List

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
    """(doc_id, minhash) → b rows (band_id, band_hash, doc_id).

    One numpy op over the whole batch: the fixed-size-list minhash
    column views as an (n_docs, n_perm) matrix; band hashes are a
    single reshape+multiply+sum, and the output columns are built with
    repeat/tile — no per-doc Python."""
    n_rows = batch.num_rows
    if n_rows == 0:
        return pa.table({
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
        })
    ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    col = batch.column("minhash").combine_chunks()
    n_perm = col.type.list_size
    flat = np.asarray(col.values, dtype=np.uint64)
    sig_matrix = flat.reshape(n_rows, n_perm)
    r = n_perm // n_bands
    with np.errstate(over="ignore"):
        bh = (
            sig_matrix.reshape(n_rows, n_bands, r)
            * np.uint64(0x9E3779B97F4A7C15)
        ).sum(axis=2)  # (n_docs, n_bands)
    return pa.table(
        {
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n_rows)
            ),
            "band_hash": pa.array(bh.reshape(-1)),
            "doc_id": pa.array(np.repeat(ids, n_bands)),
        }
    )


# Number of coarse buckets for pair generation. Grouping directly by
# (band_id, band_hash) means one Python map_groups call per bucket —
# ~16 buckets/doc → observed 6 ms/doc of pure per-group overhead.
# Instead shuffle by a COARSE key (band_hash % N_COARSE) and run a
# vectorized pandas groupby over the fine key inside each group: the
# Python-call count drops from O(docs×bands) to O(N_COARSE).
N_COARSE_BUCKETS = 512


def _pairs_from_coarse_group(df) -> pa.Table:
    """One coarse bucket → pairs from every fine (band_id, band_hash)
    bucket inside it. Vectorized size-filter; Python loops touch only
    buckets with ≥2 members (rare by construction)."""
    a_out: List[int] = []
    b_out: List[int] = []
    sizes = df.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
    multi = df[sizes > 1]
    cap = 200  # guard: a degenerate all-equal bucket must not go O(n²)
    for _, grp in multi.groupby(["band_id", "band_hash"]):
        ids = sorted(grp["doc_id"].tolist())[:cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64())})


def minhash_lsh_candidates(docs_ds, n_perm: int = 64, n_bands: int = 8,
                           shingle_k: int = 5):
    """documents → distinct candidate pairs via banded LSH (one shuffle).

    8 bands × 8 rows: P(candidate) = 1-(1-j^8)^8 — steep around j≈0.8
    (j=0.5 → 3%, j=0.95 → ~1.0). A 16×4 banding fires at j≈0.5 and
    floods the verify stage on vocabulary-dense corpora (observed 337k
    candidates on 10k synthetic docs vs ~6k with 8×8)."""
    from ray.data.aggregate import Count

    sigs = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher, fn_constructor_kwargs={"n_perm": n_perm, "shingle_k": shingle_k},
        batch_format="pyarrow", concurrency=2,
    ).select_columns(["doc_id", "minhash"])
    def _explode_with_coarse(t: pa.Table) -> pa.Table:
        out = explode_bands(t, n_bands)
        import pyarrow.compute as pc

        coarse = pc.cast(
            pc.bit_wise_and(out.column("band_hash"),
                            pa.scalar(N_COARSE_BUCKETS - 1, pa.uint64())),
            pa.int32(),
        )
        return out.append_column("coarse", coarse)

    bands = sigs.map_batches(_explode_with_coarse, batch_format="pyarrow")
    pairs = bands.groupby("coarse").map_groups(
        _pairs_from_coarse_group, batch_format="pandas"
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
                        n_bands: int = 8, shingle_k: int = 5,
                        verify: str = "exact"):
    """Near-dup pairs with Jaccard ≥ threshold.

    Candidate generation is fully distributed (see module docstring);
    verification joins texts back via a driver-broadcast id→text map —
    valid while the candidate set is small (LSH guarantees that for
    sane thresholds); the cluster-scale path is a partitioned join on
    doc_id, same key as the band shuffle.
    """
    import ray

    # materialize: the candidate set is consumed twice (driver peek for
    # the text fetch + the verify map) — without this the whole
    # signature+shuffle pipeline re-executes for each consumer
    cands = minhash_lsh_candidates(docs_ds, n_perm, n_bands,
                                   shingle_k).materialize()
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
        # actor-level token-hash cache: natural-language token streams
        # are Zipfian, so the hit rate approaches 1 — this is the state
        # an actor pool exists to amortize (cap bounds the heap)
        self._cache: dict = {}
        self._cache_cap = 1 << 20

    @staticmethod
    def _fnv64(data: bytes) -> int:
        h = 14695981039346656037
        for ch in data:
            h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        # murmur3 fmix64 finalizer: raw FNV-1a has poor high-bit
        # avalanche on short similar keys ('token0'/'token1' share the
        # top 40 bits), which collapses simhash votes into structure
        # bits; the finalizer restores per-bit uniformity
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 33
        return h

    def _token_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.zeros(0, dtype=np.uint64)
        cache = self._cache
        out = np.zeros(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = cache.get(tok)
            if h is None:
                h = self._fnv64(tok.encode("utf-8"))
                if len(cache) < self._cache_cap:
                    cache[tok] = h
            out[i] = h
        return out

    def signature(self, text: str) -> int:
        hs = self._token_hashes(text)
        if len(hs) == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        # int64: a uint64 sum would wrap negative votes to huge values
        # and set nearly every signature bit
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hs)  # ±1 votes
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
        band_ids, band_vals, doc_ids, full, coarse = [], [], [], [], []
        for did, s in zip(ids, sg):
            for b in range(4):
                v = (s >> (16 * b)) & 0xFFFF
                band_ids.append(b)
                band_vals.append(v)
                doc_ids.append(did)
                full.append(s)
                coarse.append((b * 65536 + v) % N_COARSE_BUCKETS)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_val": pa.array(band_vals, pa.int32()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(full, pa.uint64()),
            "coarse": pa.array(coarse, pa.int32()),
        })

    def _pairs_coarse(df) -> pa.Table:
        # vectorized fine-group filter; Python touches only multi-member
        # buckets (same shape as _pairs_from_coarse_group above)
        a, b_, ham = [], [], []
        cap = 200
        sizes = df.groupby(["band_id", "band_val"])["doc_id"].transform("size")
        multi = df[sizes > 1]
        for _, grp in multi.groupby(["band_id", "band_val"]):
            rows = sorted(zip(grp["doc_id"].tolist(),
                              grp["simhash"].tolist()))[:cap]
            for ii in range(len(rows)):
                for jj in range(ii + 1, len(rows)):
                    (ida, sa), (idb, sb) = rows[ii], rows[jj]
                    if ida == idb:
                        continue
                    h = int(bin(int(sa) ^ int(sb)).count("1"))
                    if h <= max_hamming:
                        a.append(ida)
                        b_.append(idb)
                        ham.append(h)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b_, pa.int64()),
                         "hamming": pa.array(ham, pa.int64())})

    pairs = sigs.map_batches(_explode, batch_format="pyarrow").groupby(
        "coarse"
    ).map_groups(_pairs_coarse, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands_hit"),
    )


# ---------- near-dup clustering (connected components) --------------------

def cluster_pairs_driver(pairs) -> "pa.Table":
    """(doc_a, doc_b) pairs → (doc_id, cluster_id) via union-find on the
    driver. Valid while the candidate-pair set is small — which banded
    LSH guarantees for sane thresholds (ray_guide: 'union-find on the
    driver only if the candidate set is provably small'). cluster_id =
    min doc_id in the component (deterministic representative)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-root keeps the representative deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = pairs.select_columns(["doc_a", "doc_b"])
    for b in rows.iter_batches(batch_format="pyarrow", batch_size=65536):
        for a_, b_ in zip(b.column("doc_a").to_pylist(),
                          b.column("doc_b").to_pylist()):
            union(a_, b_)
    nodes = sorted(set(parent) | {find(x) for x in parent})
    return pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array([find(n) for n in nodes], pa.int64()),
    })


def cluster_pairs_label_propagation(pairs, max_rounds: int = 10):
    """Distributed alternative: iterative min-label propagation —
    each round every node adopts the min label among itself and its
    neighbors (two shuffles per round: label join by node, min-agg by
    node). Converges in O(component diameter) rounds; this is the
    cluster-scale path when the pair set cannot sit on the driver.
    Returns the same (doc_id, cluster_id) table as the driver variant
    (asserted equal in tests)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()

    def _sym(t: pa.Table) -> pa.Table:
        # symmetric closure + self-loops: node -> candidate label
        a = t.column("doc_a").to_pylist()
        b = t.column("doc_b").to_pylist()
        node = a + b + a + b
        lab = b + a + a + b
        return pa.table({"node": pa.array(node, pa.int64()),
                         "label": pa.array(lab, pa.int64())})

    labels = edges.map_batches(_sym, batch_format="pyarrow").groupby(
        "node"
    ).aggregate(Min("label", alias_name="label")).materialize()

    for _ in range(max_rounds):
        import ray

        lmap = {r["node"]: r["label"] for r in labels.iter_rows()}
        ref = ray.put(lmap)

        def _relabel(t: pa.Table) -> pa.Table:
            lm = ray.get(ref)
            a = t.column("doc_a").to_pylist()
            b = t.column("doc_b").to_pylist()
            node, lab = [], []
            for x, y in zip(a, b):
                lx, ly = lm.get(x, x), lm.get(y, y)
                m = min(lx, ly)
                node.extend((x, y))
                lab.extend((m, m))
            return pa.table({"node": pa.array(node, pa.int64()),
                             "label": pa.array(lab, pa.int64())})

        new_labels = edges.map_batches(_relabel, batch_format="pyarrow").groupby(
            "node"
        ).aggregate(Min("label", alias_name="label")).materialize()
        new_map = {r["node"]: r["label"] for r in new_labels.iter_rows()}
        if new_map == {r["node"]: r["label"] for r in labels.iter_rows()}:
            labels = new_labels
            break
        labels = new_labels

    out = labels.to_pandas().rename(
        columns={"node": "doc_id", "label": "cluster_id"}
    ).sort_values("doc_id", ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)
