"""Quality/recall tests for approximate operators (dedup + ANN) —
the non-SQL-expressible ops get their correctness guarantees here."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _docs_with_neardups():
    from web_mass_scraper_ocr_ray.pipelines.queries import _docs_with_neardups

    return _docs_with_neardups(SF)


class TestMinhashRecall:
    def test_injected_neardups_found(self, ray_session):
        """Every doc has an injected near-dup (id+1e6, tiny edit);
        verified-pair recall over those must be ≥ 0.95."""
        from web_mass_scraper_ocr_ray.stages.dedup import minhash_dedup_pairs

        pairs = minhash_dedup_pairs(_docs_with_neardups(), threshold=0.8)
        found = {(r["doc_a"], r["doc_b"]) for r in pairs.take_all()}
        hits = sum(1 for d in range(500) if (d, d + 1_000_000) in found)
        assert hits / 500 >= 0.95

    def test_estimate_close_to_exact(self):
        from web_mass_scraper_ocr_ray.stages.dedup import (
            MinHasher,
            estimate_jaccard,
            exact_jaccard,
        )

        mh = MinHasher(n_perm=128)
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a + " extra tail words here"
        est = estimate_jaccard(mh.signature(a), mh.signature(b))
        exact = exact_jaccard(a, b)
        assert abs(est - exact) < 0.15

    def test_exact_jaccard_bounds(self):
        from web_mass_scraper_ocr_ray.stages.dedup import exact_jaccard

        assert exact_jaccard("same text", "same text") == 1.0
        assert exact_jaccard("", "") == 1.0
        assert exact_jaccard("aaaaaa", "zzzzzz") == 0.0


class TestSimhash:
    def test_identical_docs_distance_zero(self):
        from web_mass_scraper_ocr_ray.stages.dedup import SimHasher

        sh = SimHasher()
        assert sh.signature("hello world foo") == sh.signature("hello world foo")

    def test_edit_distance_ordering(self):
        """SimHash distance must rank a small edit well below an
        unrelated doc. (Absolute distance for a 1-token edit on a
        ~50-token doc is ~7 bits — P(vote=0)·64 ≈ sqrt(2/πn)·64 — which
        is WHY hamming≤3 simhash targets long docs / exact-multiset
        dups, and MinHash is the tool for short-doc small edits; the
        minhash recall test above covers that case.)"""
        from web_mass_scraper_ocr_ray.stages.dedup import SimHasher

        sh = SimHasher()
        base = " ".join(f"token{i}" for i in range(50))
        edited = bin(sh.signature(base) ^ sh.signature(base + " extrat")
                     ).count("1")
        unrelated = bin(sh.signature(base) ^ sh.signature(
            " ".join(f"other{i}" for i in range(50)))).count("1")
        assert edited < unrelated - 5
        assert edited <= 16

    def test_pairs_sound_on_duplicated_corpus(self, ray_session):
        """Every emitted pair must truly be within max_hamming
        (soundness); exact-multiset duplicates are found (completeness
        for the hamming-0 case the 4x16 banding guarantees)."""
        from web_mass_scraper_ocr_ray.stages.dedup import (
            SimHasher,
            simhash_dedup_pairs,
        )

        docs = _docs_with_neardups()
        pairs = simhash_dedup_pairs(docs, max_hamming=3).take_all()
        assert len(pairs) > 0
        sigs = {}
        sh = SimHasher()
        for r in docs.take_all():
            sigs[r["doc_id"]] = sh.signature(r["text"])
        for r in pairs[:500]:
            d = bin(sigs[r["doc_a"]] ^ sigs[r["doc_b"]]).count("1")
            assert d <= 3, (r["doc_a"], r["doc_b"], d)


class TestANNRecall:
    @pytest.fixture(scope="class")
    def brute(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.similarity import knn_bruteforce

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        rows = knn_bruteforce(emb, range(10), k=5).take_all()
        truth = {}
        for r in rows:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return truth

    def test_lsh_recall(self, ray_session, brute):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.similarity import knn_lsh

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        rows = knn_lsh(emb, range(10), k=5, n_bits=6).take_all()
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # single-probe LSH on random vectors: weak recall is expected;
        # assert it finds a nontrivial fraction and never a false id
        total = sum(len(v & brute[q]) for q, v in got.items())
        assert total >= 3
        assert all(q in brute for q in got)

    def test_ivf_recall(self, ray_session, brute):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.similarity import knn_ivf

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        rows = knn_ivf(emb, range(10), k=5, n_clusters=8, nprobe=4).take_all()
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recall = sum(len(got.get(q, set()) & ns) for q, ns in brute.items()) / (
            len(brute) * 5
        )
        assert recall >= 0.5  # nprobe=4 of 8 clusters → ≥ half on average


class TestClustering:
    def _pairs(self, edges):
        return pa.table({
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        })

    def test_union_find_components(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.dedup import cluster_pairs_driver

        # two chains + one isolated pair: {1,2,3,4}, {10,11}, {20,21}
        pairs = rd.from_arrow(self._pairs([(1, 2), (2, 3), (3, 4),
                                           (10, 11), (20, 21)]))
        out = {r["doc_id"]: r["cluster_id"]
               for r in cluster_pairs_driver(pairs).to_pylist()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_label_propagation_matches_union_find(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            cluster_pairs_driver,
            cluster_pairs_label_propagation,
        )

        edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  # diameter-5 chain
                 (100, 101), (101, 102), (50, 60)]
        pairs = rd.from_arrow(self._pairs(edges))
        a = {r["doc_id"]: r["cluster_id"]
             for r in cluster_pairs_driver(pairs).to_pylist()}
        b_tbl = cluster_pairs_label_propagation(
            rd.from_arrow(self._pairs(edges))
        )
        b = dict(zip(b_tbl.column("doc_id").to_pylist(),
                     b_tbl.column("cluster_id").to_pylist()))
        assert a == b

    def test_clusters_on_neardup_corpus(self, ray_session):
        from web_mass_scraper_ocr_ray.pipelines.queries import q_dedup_clusters

        tbl = q_dedup_clusters(SF)
        clusters = dict(zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("cluster_id").to_pylist()))
        # injected pair (d, d+1e6) must land in the same cluster
        hits = sum(
            1 for d in range(500)
            if clusters.get(d) is not None
            and clusters.get(d) == clusters.get(d + 1_000_000)
        )
        assert hits / 500 >= 0.95
