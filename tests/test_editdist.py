"""FastSS edit-distance-1 token join (stages/editdist.py)."""

import itertools

import pytest

import ray.data as rd

from web_mass_scraper_ocr_ray.stages.editdist import (
    _within_edit1,
    distinct_tokens,
    editdist1_pairs,
    vocab_editdist_pairs,
)


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein, full DP."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _truth_pairs(vocab):
    return {
        tuple(sorted((a, b)))
        for a, b in itertools.combinations(sorted(set(vocab)), 2)
        if _lev(a, b) == 1
    }


def _run_pairs(vocab):
    ds = rd.from_items([{"tok": t} for t in sorted(set(vocab))])
    rows = editdist1_pairs(ds).take_all()
    return {(r["tok_a"], r["tok_b"]) for r in rows}


class TestWithinEdit1:
    def test_matches_dp(self):
        vocab = ["", "a", "ab", "ba", "abc", "abd", "acb", "abcd",
                 "xabc", "abcx", "axbc", "aabc", "abab", "baba"]
        for a in vocab:
            for b in vocab:
                assert _within_edit1(a, b) == (_lev(a, b) <= 1), (a, b)


@pytest.mark.usefixtures("ray_session")
class TestEditdist1Pairs:
    def test_exact_vs_bruteforce(self):
        vocab = ["table", "tabl", "tab1e", "cable", "tables", "chair",
                 "chqir", "the", "th", "he", "xyz", "scan", "scam",
                 "span", "spam", "sp am"]
        assert _run_pairs(vocab) == _truth_pairs(vocab)

    def test_transposition_is_distance_two(self):
        # 'ab'/'ba' share deletion variants but are distance 2:
        # candidates must be verified, not trusted
        assert _run_pairs(["ab", "ba"]) == set()

    def test_same_variant_from_two_deletions(self):
        # 'aab' deletes to 'ab' twice — no self pair, no dup pairs
        assert _run_pairs(["aab", "ab"]) == {("aab", "ab")}

    def test_distinct_tokens_and_max_len(self, tmp_path):
        ds = rd.from_items([
            {"text": "alpha beta  beta " + "x" * 30},
            {"text": "beta gamma"},
        ])
        toks = {r["tok"] for r in distinct_tokens(ds, max_len=24).take_all()}
        assert toks == {"alpha", "beta", "gamma"}

    def test_end_to_end_augmented(self):
        # augment adds last-char truncations for len>=4 tokens
        ds = rd.from_items([{"doc_id": 1, "text": "stream stream the"}])
        got = {(r["tok_a"], r["tok_b"])
               for r in vocab_editdist_pairs(ds).take_all()}
        assert got == {("strea", "stream")}
