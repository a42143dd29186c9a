"""End-to-end tests for the corpus-prep flagship pipeline
(pipelines/prep_pipeline.py): flag precedence, counters vs written
output, idempotent resume."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ds(rows: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows))


GOOD = " ".join(f"token{i} filler{i}" for i in range(45))  # 90 distinct


def _corpus():
    # doc 1: good, survives       doc 2: exact copy of 1 → duplicate
    # doc 3: too short → quality  doc 4: high repetition → quality
    # doc 5: good, unique
    return _ds({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["src0"] * 5,
        "text": [
            GOOD,
            GOOD,
            "tiny doc",
            "spam " * 100,
            GOOD + " plus a distinct tail with contact "
            "bob@example.com today",
        ],
    })


def _cfg(tmp, **kw):
    from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import PrepConfig

    return PrepConfig(min_tokens=20, max_dup_word_bp=6000,
                      output_dir=str(tmp), **kw)


class TestPrepFlags:
    def test_precedence_and_reasons(self, ray_session, tmp_path):
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            DROP_DUPLICATE, DROP_QUALITY, KEEP, build_prep_pipeline)

        out = build_prep_pipeline(
            _corpus(), _cfg(tmp_path)).to_pandas().set_index("doc_id")
        assert out.loc[1, "drop_reason"] == KEEP
        assert out.loc[2, "drop_reason"] == DROP_DUPLICATE
        assert out.loc[3, "drop_reason"] == DROP_QUALITY
        assert out.loc[4, "drop_reason"] == DROP_QUALITY
        assert out.loc[5, "drop_reason"] == KEEP
        # PII was redacted in the surviving text
        assert "<EMAIL>" in out.loc[5, "text"]
        assert out.loc[5, "pii_hits"] == 1

    def test_low_quality_copy_never_shadows_clean_one(self, ray_session,
                                                      tmp_path):
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            DROP_QUALITY, KEEP, build_prep_pipeline)

        # doc 1 low-quality (short), doc 9 same TEXT after scrub but
        # passes... construct: identical text, one below min_tokens is
        # impossible (same text ⇒ same tokens) — instead check that a
        # quality-dropped doc does not claim survivorship: group of
        # one low-quality doc has NO survivor and stays DROP_QUALITY
        ds = _ds({"doc_id": [7], "source": ["src0"],
                  "text": ["short short short"]})
        out = build_prep_pipeline(ds, _cfg(tmp_path)).to_pandas()
        assert out["drop_reason"].tolist() == [DROP_QUALITY]


class TestPrepRun:
    def test_write_counters_and_resume(self, ray_session, tmp_path):
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            run_prep_pipeline)

        out_dir = str(tmp_path / "prep_out")
        s = run_prep_pipeline(_corpus(), _cfg(out_dir))
        assert s["docs_total"] == 5
        assert s["docs_kept"] == 2
        assert s["drop_lowquality"] == 2
        assert s["drop_duplicate"] == 1
        assert s["pii_redactions"] == 1
        assert s["resumed"] is False

        parts = glob.glob(os.path.join(out_dir, "part-*.parquet"))
        written = pa.concat_tables([pq.read_table(p) for p in parts])
        assert written.num_rows == s["docs_kept"]
        assert sorted(written.column("doc_id").to_pylist()) == [1, 5]
        # counters match the written bytes
        import pyarrow.compute as pc
        assert pc.sum(pc.utf8_length(
            written.column("text"))).as_py() == s["chars_out"]

        # resume: committed manifest short-circuits recomputation
        s2 = run_prep_pipeline(_corpus(), _cfg(out_dir))
        assert s2["resumed"] is True
        assert {k: s2[k] for k in
                ("docs_total", "docs_kept", "drop_lowquality")} == \
               {k: s[k] for k in
                ("docs_total", "docs_kept", "drop_lowquality")}
        # no duplicate parts appeared
        assert sorted(glob.glob(
            os.path.join(out_dir, "part-*.parquet"))) == sorted(parts)

    def test_requires_output_dir(self, ray_session):
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            PrepConfig, run_prep_pipeline)

        with pytest.raises(ValueError):
            run_prep_pipeline(_corpus(), PrepConfig())

    def test_sampling_drops_survivors_only(self, ray_session, tmp_path):
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            DROP_SAMPLED_OUT, build_prep_pipeline)

        ds = _ds({"doc_id": list(range(100)),
                  "source": ["src0"] * 100,
                  "text": [GOOD + f" tail{i}" for i in range(100)]})
        out = build_prep_pipeline(
            ds, _cfg(tmp_path, sample_rates_bp={"src0": 5000}),
        ).to_pandas()
        sampled_out = (out["drop_reason"] == DROP_SAMPLED_OUT).sum()
        assert 20 < sampled_out < 80  # ~50% hash-uniform
        # the decision is the documented deterministic hash
        from web_mass_scraper_ocr_ray.stages.sampling import sample_buckets
        ids = out.loc[out["drop_reason"] == DROP_SAMPLED_OUT,
                      "doc_id"].to_numpy()
        assert (sample_buckets(ids) >= 5000).all()


class TestTwoPassDedup:
    def test_two_pass_matches_one_pass(self, ray_session, tmp_path):
        """The two-pass scale path (skinny decision shuffle + doc_id
        update join) is byte-identical to one-pass, including a giant
        duplicate group that the one-pass shuffle would co-locate."""
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            build_prep_pipeline,
        )

        n_copies = 300  # one text_hash group far wider than the others
        rows = {
            "doc_id": list(range(1, 6)) + list(range(100, 100 + n_copies)),
            "source": ["src0"] * 5 + ["src1"] * n_copies,
            "text": [
                GOOD, GOOD, "tiny doc", "spam " * 100,
                GOOD + " plus a distinct tail",
            ] + [GOOD + " viral boilerplate body"] * n_copies,
        }
        cfg1 = _cfg(tmp_path / "a",
                    sample_rates_bp={"src0": 10000, "src1": 10000})
        cfg2 = _cfg(tmp_path / "b",
                    sample_rates_bp={"src0": 10000, "src1": 10000},
                    dedup_two_pass=True)
        one = build_prep_pipeline(_ds(rows), cfg1).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        two = build_prep_pipeline(_ds(rows), cfg2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        cols = ["doc_id", "drop_reason", "n_toks", "pii_hits", "text"]
        assert one[cols].equals(two[cols])
        # the giant group: exactly one survivor
        giant = two[two["doc_id"] >= 100]
        assert (giant["drop_reason"] == 0).sum() == 1
        assert giant.loc[giant["drop_reason"] == 0, "doc_id"].item() == 100

    def test_run_pipeline_two_pass_counters(self, ray_session, tmp_path):
        from web_mass_scraper_ocr_ray.pipelines.prep_pipeline import (
            run_prep_pipeline,
        )

        stats = run_prep_pipeline(_corpus(),
                                  _cfg(tmp_path, dedup_two_pass=True))
        assert stats["docs_total"] == 5
        assert stats["docs_kept"] == 2
        assert stats["drop_duplicate"] == 1
        assert stats["drop_lowquality"] == 2
