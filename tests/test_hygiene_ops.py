"""Corpus-hygiene operators: bottom-k exact sampling, domain-level
quality filtering, URL blocklist matching, latest-snapshot-per-url."""

import numpy as np
import pyarrow as pa

from web_mass_scraper_ocr_ray.functions.urltools import blocklist_match_batch


def _ds(rows: dict, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(pa.table(rows))
    return ds.repartition(blocks) if blocks > 1 else ds


class TestSampleBottomK:
    def test_exact_k_matches_driver_hash(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.sampling import sample_bottomk

        ids = np.arange(1000, dtype=np.int64)
        out = sample_bottomk(
            _ds({"doc_id": ids}, blocks=7), id_col="doc_id", k=25
        ).to_pandas()
        hv = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(2**32)
        exp = set(ids[np.argsort(hv)][:25].tolist())
        assert len(out) == 25
        assert set(out.doc_id) == exp
        # hv column carried through and correct
        assert (out.hv.to_numpy().astype(np.uint64)
                == hv[np.argsort(hv)][:25]).all()

    def test_block_layout_invariance(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.sampling import sample_bottomk

        ids = np.arange(500, dtype=np.int64)
        a = sample_bottomk(_ds({"doc_id": ids}, blocks=2),
                           id_col="doc_id", k=10).to_pandas()
        b = sample_bottomk(_ds({"doc_id": ids}, blocks=13),
                           id_col="doc_id", k=10).to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)

    def test_k_larger_than_corpus(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.sampling import sample_bottomk

        out = sample_bottomk(_ds({"doc_id": np.arange(5)}),
                             id_col="doc_id", k=50).to_pandas()
        assert len(out) == 5


class TestSampleWeightedBottomK:
    def test_matches_driver_priority(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.sampling import (
            sample_weighted_bottomk,
        )

        ids = np.arange(1000, dtype=np.int64)
        w = (ids % 17 + 1).astype(np.int64)
        out = sample_weighted_bottomk(
            _ds({"doc_id": ids, "w": w}, blocks=7),
            id_col="doc_id", weight_col="w", k=30,
        ).to_pandas()
        hv = ((ids.astype(np.uint64) * np.uint64(2654435761))
              % np.uint64(2**32)).astype(np.int64)
        prio = hv.astype(np.float64) / w.astype(np.float64)
        exp = set(ids[np.lexsort((ids, prio))][:30].tolist())
        assert len(out) == 30
        assert set(out.doc_id) == exp
        assert list(out.prio) == sorted(out.prio)

    def test_heavier_rows_more_likely(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.sampling import (
            sample_weighted_bottomk,
        )

        # half the rows carry 50x the weight: they should dominate the
        # sample (statistical but deterministic — fixed hash, no RNG)
        ids = np.arange(2000, dtype=np.int64)
        w = np.where(ids < 1000, 50, 1).astype(np.int64)
        out = sample_weighted_bottomk(
            _ds({"doc_id": ids, "w": w}, blocks=4),
            id_col="doc_id", weight_col="w", k=100,
        ).to_pandas()
        assert (out.doc_id < 1000).sum() > 85

    def test_block_layout_invariance(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.sampling import (
            sample_weighted_bottomk,
        )

        ids = np.arange(500, dtype=np.int64)
        w = (ids % 7 + 1).astype(np.int64)
        a = sample_weighted_bottomk(
            _ds({"doc_id": ids, "w": w}, blocks=2),
            id_col="doc_id", weight_col="w", k=10).to_pandas()
        b = sample_weighted_bottomk(
            _ds({"doc_id": ids, "w": w}, blocks=13),
            id_col="doc_id", weight_col="w", k=10).to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)


class TestDomainQualityFilter:
    def test_integer_mean_and_flags(self, ray_session):
        from web_mass_scraper_ocr_ray.stages.quality_model import (
            domain_quality_filter,
        )

        # srcA: prose with stopwords (high score); srcB: punct soup
        rows = {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat and the dog of the house went to a park",
                "a story of the sea and the wind to the end",
                ";;;!!!???...,,,:::;;;!!!",
                "#### $$$$ %%%% &&&&",
            ],
            "source": ["srcA", "srcA", "srcB", "srcB"],
        }
        out = domain_quality_filter(
            _ds(rows, blocks=2), threshold=150
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) == 4
        # per-source mean is identical on both rows of a source
        ga = out[out.source == "srcA"]
        gb = out[out.source == "srcB"]
        assert ga.source_mean_score.nunique() == 1
        assert gb.source_mean_score.nunique() == 1
        # integer mean: exactly sum // n
        assert ga.source_mean_score.iloc[0] == \
            int(ga.score.sum()) // len(ga)
        assert bool(ga.keep_domain.all())
        assert not gb.keep_domain.any()


class TestBlocklistMatch:
    def test_suffix_walk_most_specific_wins(self):
        bl = {"example.com", "bad.example.com"}
        blocked, matched = blocklist_match_batch(
            ["https://deep.bad.example.com/x", "https://ok.example.org/"],
            bl)
        assert blocked == [True, False]
        assert matched == ["bad.example.com", ""]

    def test_never_matches_bare_tld(self):
        blocked, matched = blocklist_match_batch(
            ["https://site.com/"], {"com"})
        assert blocked == [False]

    def test_poison_urls(self):
        blocked, matched = blocklist_match_batch(
            [None, "", "::not a url::"], {"x.com"})
        assert blocked == [False, False, False]


class TestLatestSnapshot:
    def test_recrawl_wins(self, ray_session):
        from web_mass_scraper_ocr_ray.pipelines.queries import QUERIES

        out = QUERIES["pages_latest_snapshot"](
            "/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500  # one row per url, dups collapsed
        ts = out.set_index("url").warc_ts
        # every 10th doc keeps the +1h re-crawl timestamp
        import datetime as dt

        epoch = dt.datetime(2024, 1, 1)
        u0 = "https://www.host000.example.com/docs/0"
        u1 = "https://www.host001.example.com/docs/1"
        assert ts[u0] == epoch + dt.timedelta(hours=1)
        assert ts[u1] == epoch + dt.timedelta(seconds=1)
