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


class TestBandHash:
    def test_band_hash_position_sensitive(self):
        """Permuting minhash values WITHIN a band must change the band
        hash (ADVICE r1: a shared multiplier made it sum-invariant)."""
        from web_mass_scraper_ocr_ray.stages.dedup import explode_bands

        n_perm, n_bands = 16, 2
        sig = list(range(1, n_perm + 1))
        perm = list(sig)
        perm[0], perm[3] = perm[3], perm[0]  # swap inside band 0
        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "minhash": pa.array([sig, perm], pa.list_(pa.uint64(), n_perm)),
        })
        out = explode_bands(t, n_bands=n_bands)
        bh = {}
        for bid, bval, did in zip(out.column("band_id").to_pylist(),
                                  out.column("band_hash").to_pylist(),
                                  out.column("doc_id").to_pylist()):
            bh[(did, bid)] = bval
        assert bh[(1, 0)] != bh[(2, 0)]   # permuted band differs
        assert bh[(1, 1)] == bh[(2, 1)]   # untouched band still equal


class TestDistributedVerify:
    def test_verify_builds_without_driver_iteration(self, ray_session,
                                                    monkeypatch):
        """The near-dup verify path must never pull the documents table
        through the driver (iter_batches/iter_rows/to_pandas/take_all)
        — it was the round-1 scale-killer. Driver-consumption APIs are
        poisoned during the BUILD; consumption of the (small) result
        happens after."""
        import ray.data

        from web_mass_scraper_ocr_ray.stages.dedup import minhash_dedup_pairs

        docs = _docs_with_neardups()

        def _boom(self, *a, **k):
            raise AssertionError(
                "driver-side dataset consumption inside verify build"
            )

        for name in ("iter_batches", "iter_rows", "to_pandas", "take_all"):
            monkeypatch.setattr(ray.data.Dataset, name, _boom)
        pairs_ds = minhash_dedup_pairs(docs, threshold=0.8)
        monkeypatch.undo()
        found = {(r["doc_a"], r["doc_b"]) for r in pairs_ds.take_all()}
        hits = sum(1 for d in range(500) if (d, d + 1_000_000) in found)
        assert hits / 500 >= 0.95

    def test_label_propagation_no_driver_label_maps(self, ray_session,
                                                    monkeypatch):
        """Label propagation must not rebuild per-round node→label dicts
        on the driver (iter_rows over the label table was the round-1
        anti-pattern). Scalar convergence checks (1-row aggregates) are
        fine — so the guard forbids driver iteration of any dataset
        bigger than a handful of rows. Only the FINAL label table may
        cross (to_pandas on the result)."""
        import ray.data
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            cluster_pairs_label_propagation,
        )

        # star graph: 200 nodes, converges in one round, so the per-
        # round label table (201 rows) is big enough to trip the guard
        pairs = rd.from_arrow(pa.table({
            "doc_a": pa.array([0] * 200, pa.int64()),
            "doc_b": pa.array(list(range(1, 201)), pa.int64()),
        }))

        orig_rows = ray.data.Dataset.iter_rows
        orig_batches = ray.data.Dataset.iter_batches

        def _guard_rows(self, *a, **k):
            n = 0
            for r in orig_rows(self, *a, **k):
                n += 1
                assert n <= 8, \
                    "driver-side iter_rows over a large dataset in label prop"
                yield r

        def _guard_batches(self, *a, **k):
            n = 0
            for b in orig_batches(self, *a, **k):
                n += len(b) if hasattr(b, "__len__") else b.num_rows
                assert n <= 8, \
                    "driver-side iter_batches over a large dataset in label prop"
                yield b

        monkeypatch.setattr(ray.data.Dataset, "iter_rows", _guard_rows)
        monkeypatch.setattr(ray.data.Dataset, "iter_batches", _guard_batches)
        out_ds = cluster_pairs_label_propagation(pairs, as_dataset=True)
        monkeypatch.undo()
        rows = out_ds.take_all()
        labels = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert len(labels) == 201
        assert set(labels.values()) == {0}

    def test_label_propagation_nonconvergence(self, ray_session):
        """strict=True raises when a component's diameter exceeds the
        round budget (ADVICE r1: silent wrong labels); strict=False
        returns the partial labels."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            cluster_pairs_label_propagation,
        )

        chain = pa.table({
            "doc_a": pa.array(list(range(30)), pa.int64()),
            "doc_b": pa.array(list(range(1, 31)), pa.int64()),
        })
        with pytest.raises(RuntimeError, match="did not converge"):
            cluster_pairs_label_propagation(rd.from_arrow(chain),
                                            max_rounds=2)
        partial = cluster_pairs_label_propagation(
            rd.from_arrow(chain), max_rounds=2, strict=False
        )
        assert partial.num_rows == 31


class TestEmbeddingNeardup:
    @pytest.fixture(scope="class")
    def truth(self):
        import pyarrow.parquet as pq

        et = pq.read_table(f"{SF}/embeddings.parquet")
        ids = np.asarray(et["vec_id"].to_pylist())
        m = np.asarray(et["embedding"].to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = m @ m.T
        ia, ib = np.nonzero(np.triu(s >= 0.4, k=1))
        return set(zip(np.minimum(ids[ia], ids[ib]).tolist(),
                       np.maximum(ids[ia], ids[ib]).tolist()))

    def test_blocked_exact_matches_ground_truth(self, ray_session, truth):
        """The triangular block self-join is EXACT: identical pair set
        to the full O(N²) matmul, without broadcasting the matrix."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.similarity import (
            embedding_neardup_pairs,
        )

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        rows = embedding_neardup_pairs(emb, threshold=0.4).take_all()
        got = {(r["vec_a"], r["vec_b"]) for r in rows}
        assert got == truth
        assert len(rows) == len(got)  # each pair exactly once

    def test_lsh_neardup_recall_and_precision(self, ray_session, truth):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.similarity import (
            embedding_neardup_lsh,
        )

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        rows = embedding_neardup_lsh(emb, threshold=0.4).take_all()
        got = {(r["vec_a"], r["vec_b"]) for r in rows}
        assert got <= truth                      # verify step: no FPs
        assert len(got & truth) / len(truth) >= 0.6  # banding recall


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


class TestCrossCorpusDedup:
    def _mk(self, rows):
        import ray.data as rd

        return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)

    def test_within_corpus_pairs_excluded(self, ray_session):
        """Identical docs INSIDE one corpus never pair; only
        cross-side near-dups are emitted, normalized (old, new)."""
        from web_mass_scraper_ocr_ray.stages.dedup import (
            minhash_cross_corpus_pairs,
        )

        body = "the quick brown fox jumps over the lazy dog " * 4
        old = self._mk([
            {"doc_id": 1, "text": body},
            {"doc_id": 2, "text": body},          # dup WITHIN old
        ])
        new = self._mk([
            {"doc_id": 11, "text": body + " tail"},
            {"doc_id": 12, "text": "zz completely different words here"
                                   " nothing shared at all ok"},
        ])
        pairs = {(r["doc_a"], r["doc_b"])
                 for r in minhash_cross_corpus_pairs(
                     old, new, threshold=0.8).take_all()}
        assert (1, 2) not in pairs and (2, 1) not in pairs
        assert (1, 11) in pairs and (2, 11) in pairs
        assert all(a in (1, 2) and b in (11, 12) for a, b in pairs)
        assert not any(b == 12 for _, b in pairs)

    def test_flag_new_docs(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.dedup import (
            flag_new_docs,
            minhash_cross_corpus_pairs,
        )

        body = "alpha beta gamma delta epsilon zeta eta theta " * 4
        old = self._mk([{"doc_id": 0, "text": body}])
        new = self._mk([
            {"doc_id": 100, "text": body + " x"},
            {"doc_id": 101, "text": "unrelated fresh content entirely"
                                    " new words only here"},
        ])
        pairs = minhash_cross_corpus_pairs(old, new, threshold=0.8)
        flags = {r["doc_id"]: r["is_dup_of_old"]
                 for r in flag_new_docs(new, pairs).take_all()}
        assert flags == {100: 1, 101: 0}

    def test_incremental_query_corpus(self, ray_session):
        """Mutated evens flagged dup, fresh odds kept — on the sf
        corpus the oracle gate also checks."""
        from web_mass_scraper_ocr_ray.pipelines.queries import (
            q_dedup_incremental,
        )

        flags = {r["doc_id"]: r["is_dup_of_old"]
                 for r in q_dedup_incremental(SF).take_all()}
        ev = [flags[1_000_000 + d] for d in range(0, 500, 2)]
        od = [flags[1_000_000 + d] for d in range(1, 500, 2)]
        assert sum(ev) / len(ev) >= 0.95
        assert sum(od) == 0


class TestPairCapOverflow:
    """Degenerate (>cap member) fine buckets — the r2 VERDICT bug:
    members past the dense-pair cap must still be linked into the
    cluster (star links to the run-min doc), never silently dropped."""

    @staticmethod
    def _components(pairs):
        """Connected components via union-find over (a, b) pairs."""
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    def test_within_corpus_overflow_star_linked(self, caplog):
        import logging

        import pandas as pd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            PAIR_RUN_CAP,
            _pairs_from_coarse_group,
        )

        n = PAIR_RUN_CAP + 320
        df = pa.table({
            "band_id": pa.array(np.zeros(n, np.int32)),
            "band_hash": pa.array(np.full(n, 7, np.uint64)),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        })
        with caplog.at_level(logging.WARNING,
                             logger="web_mass_scraper_ocr_ray.stages.dedup"):
            t = _pairs_from_coarse_group(df)
        pairs = list(zip(t.column("doc_a").to_pylist(),
                         t.column("doc_b").to_pylist()))
        # every member occurs in >= 1 pair and the bucket is ONE
        # connected component (keep/drop survives label propagation)
        comp = self._components(pairs)
        assert set(comp) == set(range(n))
        assert len(set(comp.values())) == 1
        # pair count is O(cap^2 + n), not O(n^2)
        assert len(pairs) == PAIR_RUN_CAP * (PAIR_RUN_CAP - 1) // 2 + 320
        # overflow members link to the run-min doc
        assert all((0, m) in set(pairs) for m in range(PAIR_RUN_CAP, n))
        # the truncation counter is observable
        assert any("pair cap engaged" in r.message for r in caplog.records)

    def test_cross_corpus_overflow_every_new_doc_paired(self):
        import pandas as pd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            PAIR_RUN_CAP,
            _cross_pairs_from_coarse_group,
        )

        n_old, n_new = PAIR_RUN_CAP + 50, PAIR_RUN_CAP + 70
        n = n_old + n_new
        df = pa.table({
            "band_id": pa.array(np.zeros(n, np.int32)),
            "band_hash": pa.array(np.full(n, 7, np.uint64)),
            "doc_id": pa.array(np.concatenate([
                np.arange(n_old, dtype=np.int64),
                1_000_000 + np.arange(n_new, dtype=np.int64),
            ])),
            "side": pa.array(np.concatenate([
                np.zeros(n_old, np.int8), np.ones(n_new, np.int8),
            ])),
        })
        t = _cross_pairs_from_coarse_group(df)
        a = t.column("doc_a").to_pylist()
        b = t.column("doc_b").to_pylist()
        # normalization: doc_a old side, doc_b new side
        assert all(x < 1_000_000 for x in a)
        assert all(x >= 1_000_000 for x in b)
        # EVERY new doc has at least one old partner (the flag
        # semantics of incremental dedup), and every old doc is
        # reachable too
        assert set(b) == {1_000_000 + i for i in range(n_new)}
        assert set(a) == set(range(n_old))
        # bounded: cap^2 dense + star links, not n_old*n_new
        assert len(a) <= PAIR_RUN_CAP ** 2 + 50 + 70

    def test_minhash_end_to_end_giant_bucket(self, ray_session):
        """>cap identical texts: candidates + verify + clustering must
        put ALL copies in one cluster (the boilerplate-corpus case)."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            PAIR_RUN_CAP,
            cluster_pairs_driver,
            minhash_dedup_pairs,
        )

        n = PAIR_RUN_CAP + 60
        text = "the same viral boilerplate page body words " * 3
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([text] * n),
        }))
        verified = minhash_dedup_pairs(docs, threshold=0.8)
        labels = cluster_pairs_driver(verified)
        lab = dict(zip(labels.column("doc_id").to_pylist(),
                       labels.column("cluster_id").to_pylist()))
        assert set(lab) == set(range(n))
        assert set(lab.values()) == {0}

    def test_simhash_end_to_end_giant_bucket(self, ray_session):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.dedup import (
            PAIR_RUN_CAP,
            simhash_dedup_pairs,
        )

        n = PAIR_RUN_CAP + 40
        text = "identical content words for simhash blocking " * 3
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([text] * n),
        }))
        t = simhash_dedup_pairs(docs, max_hamming=3).take_all()
        comp = self._components([(r["doc_a"], r["doc_b"]) for r in t])
        assert set(comp) == set(range(n))
        assert len(set(comp.values())) == 1


class TestKeepBestPerGroup:
    """keep_best_per_group (stages/dedup.py) — dedup resolution that
    keeps the best variant per group plus the true member count, as a
    two-phase combiner (partials must re-combine exactly)."""

    def test_argmax_tiebreak_and_count(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.dedup import keep_best_per_group

        t = pa.table({
            "g": ["a", "a", "a", "b", "b", "c"],
            "score": [5, 9, 9, 1, 2, 7],
            "doc_id": [10, 11, 3, 12, 13, 14],
        })
        out = keep_best_per_group(
            rd.from_arrow(t).repartition(3), group_col="g",
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        ).to_pandas().sort_values("g", ignore_index=True)
        # group a: max score 9 twice, tie -> min doc_id 3
        assert list(out.doc_id) == [3, 13, 14]
        assert list(out.n_members) == [3, 2, 1]

    def test_hot_group_count_exact_across_blocks(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.dedup import keep_best_per_group

        n = 64  # one group spanning many partials: counts must SUM
        t = pa.table({
            "g": ["hot"] * n,
            "score": list(range(n)),
            "doc_id": list(range(100, 100 + n)),
        })
        out = keep_best_per_group(
            rd.from_arrow(t).repartition(8), group_col="g",
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        ).to_pandas()
        assert len(out) == 1
        assert out.n_members.iloc[0] == n
        assert out.doc_id.iloc[0] == 100 + n - 1  # highest score wins

    def test_empty_ok(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.dedup import keep_best_per_group

        out = keep_best_per_group(
            rd.from_arrow(pa.table({
                "g": pa.array([], pa.string()),
                "score": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            })), group_col="g",
            sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        ).to_pandas()
        assert len(out) == 0


class TestQuantizeEmbeddings:
    def test_roundtrip_bounds_and_zero_vector(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.similarity import (
            quantize_embeddings,
        )

        vecs = [[0.5, -1.0, 0.25], [0.0, 0.0, 0.0], [2.0, 1.0, -2.0]]
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array([10, 11, 12], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }))
        rows = sorted(quantize_embeddings(ds).take_all(),
                      key=lambda r: (r["vec_id"], r["pos"]))
        by_vec = {}
        for r in rows:
            by_vec.setdefault(r["vec_id"], []).append(r)
        # q8 = trunc(x*127/max|x|)
        assert [r["q8"] for r in by_vec[10]] == [63, -127, 31]
        assert [r["q8"] for r in by_vec[11]] == [0, 0, 0]
        assert [r["q8"] for r in by_vec[12]] == [127, 63, -127]
        assert by_vec[11][0]["scale_micro"] == 0
        assert by_vec[12][0]["scale_micro"] == 2_000_000
        assert all(-127 <= r["q8"] <= 127 for r in rows)
        assert [r["pos"] for r in by_vec[10]] == [0, 1, 2]


class TestPairJaccardKernel:
    """Pins the shingle-once vectorized verify kernel (r3 verdict #1):
    `_pair_jaccard_counts` takes ONE shingle set per UNIQUE doc and
    computes every pair's (inter, union) with one lexsort — it must be
    bit-identical to the scalar `jaccard_counts` reference even when a
    single doc participates in many pairs (the case the old per-pair
    loop re-shingled P times)."""

    def test_matches_scalar_under_heavy_pair_reuse(self):
        import numpy as np
        from web_mass_scraper_ocr_ray.stages.dedup import (
            _pair_jaccard_counts,
            _shingle_hashes,
            jaccard_counts,
        )

        rng = np.random.RandomState(42)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        texts = {
            i: " ".join(rng.choice(words, size=rng.randint(3, 40)))
            for i in range(12)
        }
        texts[0] = "x"  # shorter than shingle_k → padded single hash
        # doc 1 appears in ~50 pairs: the re-use hot case
        pairs = [(1, j) for j in range(2, 12) for _ in range(5)]
        pairs += [(i, j) for i in range(12) for j in range(i + 1, 12)]
        doc_a = np.array([p[0] for p in pairs], dtype=np.int64)
        doc_b = np.array([p[1] for p in pairs], dtype=np.int64)

        uniq = np.unique(np.concatenate([doc_a, doc_b]))
        shingles = [_shingle_hashes(texts[int(d)], 5) for d in uniq]
        inter, union = _pair_jaccard_counts(doc_a, doc_b, uniq, shingles)

        for p, (i_v, u_v) in enumerate(zip(inter, union)):
            i_ref, u_ref = jaccard_counts(
                texts[int(doc_a[p])], texts[int(doc_b[p])], 5)
            assert (i_v, u_v) == (i_ref, u_ref), pairs[p]

    def test_one_shingle_set_per_unique_doc(self):
        import numpy as np
        from web_mass_scraper_ocr_ray.stages.dedup import (
            _pair_jaccard_counts,
            _shingle_hashes,
        )

        # identical docs in every pair → inter == union always
        sh = _shingle_hashes("the quick brown fox jumps", 5)
        uniq = np.array([7, 9], dtype=np.int64)
        doc_a = np.full(64, 7, dtype=np.int64)
        doc_b = np.full(64, 9, dtype=np.int64)
        inter, union = _pair_jaccard_counts(doc_a, doc_b, uniq, [sh, sh])
        assert (inter == len(sh)).all()
        assert (union == len(sh)).all()


class TestPairCountsBucketed:
    def test_counts_match_keyed_groupby(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.shuffle import (
            pair_counts_bucketed,
        )

        rng = np.random.RandomState(3)
        a = rng.randint(0, 50, 3000).astype(np.int64)
        b = (a + 1 + rng.randint(0, 5, 3000)).astype(np.int64)
        ds = rd.from_arrow(pa.table({
            "doc_a": pa.array(a), "doc_b": pa.array(b)})).repartition(7)
        out = pair_counts_bucketed(ds).to_pandas()
        import pandas as pd

        expect = (pd.DataFrame({"doc_a": a, "doc_b": b})
                  .groupby(["doc_a", "doc_b"]).size()
                  .reset_index(name="n_bands_hit"))
        got = out.sort_values(["doc_a", "doc_b"], ignore_index=True)
        expect = expect.sort_values(["doc_a", "doc_b"], ignore_index=True)
        assert got.equals(expect.astype({"n_bands_hit": "int64"}))
