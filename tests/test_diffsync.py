"""Merkle-style corpus diff (stages/diffsync.py)."""

import hashlib

import pytest

import ray.data as rd

from web_mass_scraper_ocr_ray.stages.diffsync import (
    _row_hashes,
    corpus_diff_ranges,
    corpus_diff_rows,
    range_checksums,
)


def _h(k, p):
    return int(hashlib.md5(f"{k}:{p}".encode()).hexdigest()[:14], 16)


def _ds(rows):
    return rd.from_items([{"k": k, "p": p} for k, p in rows])


@pytest.mark.usefixtures("ray_session")
class TestDiffSync:
    def test_row_hash_is_sql_reproducible(self):
        import duckdb

        got = _row_hashes([7, 8], ["abc", "xyz"])
        want = duckdb.sql(
            "SELECT CAST('0x' || substr(md5('7:abc'), 1, 14) AS BIGINT),"
            "       CAST('0x' || substr(md5('8:xyz'), 1, 14) AS BIGINT)"
        ).fetchone()
        assert list(got) == list(want)

    def test_checksums_order_independent(self):
        rows = [(0, "a"), (4, "b"), (8, "c"), (1, "d")]
        a = {r["bucket"]: (r["n"], r["xr"])
             for r in range_checksums(_ds(rows), "k", "p", 4).take_all()}
        b = {r["bucket"]: (r["n"], r["xr"])
             for r in range_checksums(_ds(rows[::-1]), "k", "p", 4)
             .take_all()}
        assert a == b
        assert a[0] == (3, _h(0, "a") ^ _h(4, "b") ^ _h(8, "c"))
        assert a[1] == (1, _h(1, "d"))

    def test_diff_finds_edit_delete_insert(self):
        old = [(0, "a"), (1, "b"), (2, "c"), (3, "d")]
        new = [(0, "a"), (1, "B"), (3, "d"), (7, "e")]  # edit 1, del 2, ins 7
        got = {r["bucket"]: (r["n_old"], r["n_new"])
               for r in corpus_diff_ranges(
                   _ds(old), _ds(new), "k", "p", 4).take_all()}
        # bucket 1: edit (counts equal, xor differs); bucket 2: delete;
        # bucket 3: insert of k=7 alongside unchanged k=3
        assert got == {1: (1, 1), 2: (1, 0), 3: (1, 2)}

    def test_identical_snapshots_empty(self):
        rows = [(i, f"t{i}") for i in range(20)]
        assert corpus_diff_ranges(
            _ds(rows), _ds(rows), "k", "p", 8).take_all() == []

    def test_diff_rows_classifies(self):
        old = [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (5, "x")]
        new = [(0, "a"), (1, "B"), (3, "d"), (7, "e"), (5, "x")]
        got = {r["key"]: r["change"]
               for r in corpus_diff_rows(_ds(old), _ds(new), "k", "p",
                                         4).take_all()}
        assert got == {1: "edited", 2: "deleted", 7: "added"}

    def test_diff_rows_unchanged_rows_in_dirty_bucket_dropped(self):
        # k=0 and k=4 share bucket 0; only k=0 is edited — k=4 must
        # survive the bucket filter but NOT appear in the output
        old = [(0, "a"), (4, "same")]
        new = [(0, "A"), (4, "same")]
        got = corpus_diff_rows(_ds(old), _ds(new), "k", "p", 4).take_all()
        assert [(r["key"], r["change"]) for r in got] == [(0, "edited")]

    def test_diff_rows_identical_empty(self):
        rows = [(i, f"t{i}") for i in range(10)]
        assert corpus_diff_rows(_ds(rows), _ds(rows), "k", "p",
                                4).take_all() == []

    def test_swap_detected_despite_equal_counts(self):
        # two rows swap payloads within one bucket: counts equal,
        # xor of DIFFERENT hashes differs
        old = [(0, "a"), (4, "b")]
        new = [(0, "b"), (4, "a")]
        got = corpus_diff_ranges(_ds(old), _ds(new), "k", "p", 4).take_all()
        assert [(r["bucket"], r["n_old"], r["n_new"]) for r in got] == [
            (0, 2, 2)]
