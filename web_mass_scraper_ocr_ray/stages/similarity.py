"""Similarity search over an embedding column (list<float>).

Two paths per the build brief:

  - **brute-force cosine top-k** (the exact baseline): the query matrix
    is broadcast ONCE via ``ray.put`` and read per actor — per batch a
    single numpy matmul scores (batch × queries); each batch emits only
    its local top-k rows, the final top-k is a tiny per-query
    ``groupby.map_groups``. The full similarity matrix never exists.
  - **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
    (Charikar SimHash for angles) bucket vectors; queries probe only
    their own bucket ± multiprobe neighbors. Recall is tested in
    pytest; the brute-force path is the oracle.

Embedding near-dup (cosine ≥ τ) reuses the same batch-matmul shape as
an all-pairs-by-blocks scan at test scale; at cluster scale it rides
the LSH buckets (candidates within buckets only).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    # float64 to match the DuckDB oracle's double-precision cosine —
    # float32 matmul can swap near-tied ranks vs the oracle
    lst = batch_col.to_pylist()
    return np.asarray(lst, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(emb_ds, query_ids, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for each query id. Returns
    (query_id, rank, neighbor_id) — integer-only, oracle-comparable.

    Scale shape: broadcast Q×d once; one matmul per batch; partial
    top-k per batch (k rows per query per batch); tiny final reduce.
    """
    import ray

    qset = sorted(int(q) for q in query_ids)
    q_rows = emb_ds.filter(lambda r, s=frozenset(qset): r[id_col] in s).take_all()
    q_by_id = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
               for r in q_rows}
    qm = _normalize(np.stack([q_by_id[q] for q in qset]))
    q_ref = ray.put((qset, qm))

    def _partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(_matrix(batch.column(vec_col)))
        sims = vecs @ qmat.T  # (n_batch, n_q)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))  # +1: self may be in-batch
        for j, q in enumerate(qids):
            col = sims[:, j]
            top = np.argpartition(-col, kk - 1)[:kk]
            for t in top:
                out_q.append(q)
                out_n.append(int(ids[t]))
                out_s.append(float(col[t]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    def _final_topk(group: pa.Table) -> pa.Table:
        q = group.column("query_id")[0].as_py()
        nid = np.asarray(group.column("neighbor_id").to_pylist())
        cos = np.asarray(group.column("cosine").to_pylist())
        mask = nid != q  # exclude self
        nid, cos = nid[mask], cos[mask]
        # stable total order: cosine desc, then id asc (tie-break)
        order = np.lexsort((nid, -cos))[:k]
        return pa.table({
            "query_id": pa.array([q] * len(order), pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), pa.int64()),
            "neighbor_id": pa.array([int(nid[i]) for i in order], pa.int64()),
        })

    partials = emb_ds.map_batches(_partial_topk, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, batch_format="pyarrow"
    )


class HyperplaneHasher:
    """Random-hyperplane LSH signatures for angular similarity."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 23):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_bits).astype(np.float64)

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)


def knn_lsh(emb_ds, query_ids, k: int = 5, n_bits: int = 8,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 23):
    """Approximate top-k: bucket by hyperplane signature, score only
    vectors whose bucket matches a query's bucket (single-probe).

    Recall < 1 by construction; pytest checks recall vs brute force.
    The bucket assignment is ONE map_batches; the candidate scoring
    shuffles only matching buckets (groupby bucket)."""
    import ray

    first = emb_ds.take(1)[0]
    dim = len(first[vec_col])
    hasher = HyperplaneHasher(dim, n_bits, seed)
    qset = sorted(int(q) for q in query_ids)
    q_rows = emb_ds.filter(lambda r, s=frozenset(qset): r[id_col] in s).take_all()
    q_by_id = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
               for r in q_rows}
    qm = _normalize(np.stack([q_by_id[q] for q in qset]))
    q_buckets = hasher.bucket(qm)
    bucket_to_qs = {}
    for q, b in zip(qset, q_buckets):
        bucket_to_qs.setdefault(int(b), []).append(q)
    ref = ray.put((hasher.planes, bucket_to_qs,
                   {q: qm[i] for i, q in enumerate(qset)}))

    def _score_bucketed(batch: pa.Table) -> pa.Table:
        planes, b2q, qvecs = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(_matrix(batch.column(vec_col)))
        bits = (vecs @ planes) > 0
        buckets = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
        out_q, out_n, out_s = [], [], []
        for i in range(len(ids)):
            qs = b2q.get(int(buckets[i]))
            if not qs:
                continue
            for q in qs:
                if ids[i] == q:
                    continue
                out_q.append(q)
                out_n.append(int(ids[i]))
                out_s.append(float(vecs[i] @ qvecs[q]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    def _final_topk(group: pa.Table) -> pa.Table:
        q = group.column("query_id")[0].as_py()
        nid = np.asarray(group.column("neighbor_id").to_pylist())
        cos = np.asarray(group.column("cosine").to_pylist())
        order = np.lexsort((nid, -cos))[:k]
        return pa.table({
            "query_id": pa.array([q] * len(order), pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), pa.int64()),
            "neighbor_id": pa.array([int(nid[i]) for i in order], pa.int64()),
        })

    partials = emb_ds.map_batches(_score_bucketed, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _final_topk, batch_format="pyarrow"
    )


class IVFIndexParams:
    """Deterministic IVF coarse quantizer: k-means (few Lloyd rounds)
    over a seeded sample — built ONCE on the driver, broadcast to all
    tasks. At cluster scale the sample is a `random_sample` pushdown;
    centroid count ~ sqrt(N) keeps probe lists balanced."""

    def __init__(self, vecs: np.ndarray, n_clusters: int = 16,
                 iters: int = 5, seed: int = 31):
        rng = np.random.RandomState(seed)
        n = len(vecs)
        idx = rng.choice(n, size=min(n_clusters, n), replace=False)
        cents = vecs[np.sort(idx)].copy()
        for _ in range(iters):
            assign = np.argmax(vecs @ cents.T, axis=1)  # cosine (normalized)
            for c in range(len(cents)):
                members = vecs[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    norm = np.linalg.norm(m)
                    if norm > 0:
                        cents[c] = m / norm
        self.centroids = cents

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(vecs @ self.centroids.T, axis=1)


def knn_ivf(emb_ds, query_ids, k: int = 5, n_clusters: int = 16,
            nprobe: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding", seed: int = 31):
    """IVF approximate top-k: coarse k-means quantizer; each query
    probes its ``nprobe`` nearest centroids; only vectors assigned to a
    probed cluster are scored. One map_batches pass; no shuffle (the
    probe set is broadcast). Recall vs brute force asserted in tests."""
    import ray

    ids_all, vecs_all = [], []
    sample = emb_ds.select_columns([id_col, vec_col])
    for b in sample.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids_all.extend(b.column(id_col).to_pylist())
        vecs_all.append(_matrix(b.column(vec_col)))
    full = _normalize(np.concatenate(vecs_all))
    index = IVFIndexParams(full, n_clusters=n_clusters, seed=seed)

    qset = sorted(int(q) for q in query_ids)
    pos = {v: i for i, v in enumerate(ids_all)}
    qm = np.stack([full[pos[q]] for q in qset])
    # per-query probed clusters: nprobe nearest centroids
    sims_qc = qm @ index.centroids.T
    probes = np.argsort(-sims_qc, axis=1)[:, :nprobe]
    cluster_to_qs: dict = {}
    for qi, q in enumerate(qset):
        for c in probes[qi]:
            cluster_to_qs.setdefault(int(c), []).append(q)
    ref = ray.put((index.centroids, cluster_to_qs,
                   {q: qm[i] for i, q in enumerate(qset)}))

    def _score(batch: pa.Table) -> pa.Table:
        cents, c2q, qvecs = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(_matrix(batch.column(vec_col)))
        assign = np.argmax(vecs @ cents.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for i in range(len(ids)):
            qs = c2q.get(int(assign[i]))
            if not qs:
                continue
            for q in qs:
                if ids[i] == q:
                    continue
                out_q.append(q)
                out_n.append(int(ids[i]))
                out_s.append(float(vecs[i] @ qvecs[q]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    def _final_topk(group: pa.Table) -> pa.Table:
        q = group.column("query_id")[0].as_py()
        nid = np.asarray(group.column("neighbor_id").to_pylist())
        cos = np.asarray(group.column("cosine").to_pylist())
        order = np.lexsort((nid, -cos))[:k]
        return pa.table({
            "query_id": pa.array([q] * len(order), pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), pa.int64()),
            "neighbor_id": pa.array([int(nid[i]) for i in order], pa.int64()),
        })

    return emb_ds.map_batches(_score, batch_format="pyarrow").groupby(
        "query_id"
    ).map_groups(_final_topk, batch_format="pyarrow")


def embedding_neardup_pairs(emb_ds, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding"):
    """All pairs with cosine ≥ threshold (a < b), as
    (vec_a, vec_b, cosine_pct int).

    Test-scale implementation: the (small) embedding table is broadcast
    once; each batch matmuls against it and keeps only above-threshold
    pairs with a<b. At cluster scale this becomes LSH-bucketed
    candidate generation (hyperplane bands) + the same verify — the
    batch kernel is unchanged."""
    import ray

    all_ids, all_vecs = [], []
    for b in emb_ds.select_columns([id_col, vec_col]).iter_batches(
        batch_format="pyarrow", batch_size=8192
    ):
        all_ids.extend(b.column(id_col).to_pylist())
        all_vecs.append(_matrix(b.column(vec_col)))
    full_ids = np.asarray(all_ids, dtype=np.int64)
    full = _normalize(np.concatenate(all_vecs)) if all_vecs else np.zeros((0, 1))
    ref = ray.put((full_ids, full))

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        vecs = _normalize(_matrix(batch.column(vec_col)))
        sims = vecs @ mat_all.T
        out_a, out_b, out_c = [], [], []
        for i in range(len(ids)):
            hits = np.nonzero(sims[i] >= threshold)[0]
            for h in hits:
                if ids[i] < ids_all[h]:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids_all[h]))
                    out_c.append(int(round(float(sims[i, h]) * 1000)))
        return pa.table({
            "vec_a": pa.array(out_a, pa.int64()),
            "vec_b": pa.array(out_b, pa.int64()),
            "cosine_pm": pa.array(out_c, pa.int64()),
        })

    return emb_ds.map_batches(_pairs, batch_format="pyarrow")
