"""clean_text byte-cases (scraper.py:36-40) incl. the dead-regex no-op."""

import re

from hypothesis import given, strategies as st

from web_mass_scraper_ocr_ray.functions.textclean import clean_text, create_text_metadata


def reference_clean_text(text: str) -> str:
    """Literal transcription of the reference contract for oracle use."""
    text = re.sub(r"\s+", " ", text).strip()
    text = re.sub(r"\n\s*\n", "\n", text)
    return text.strip()


class TestCleanText:
    def test_collapse_spaces(self):
        assert clean_text("a   b\t\tc") == "a b c"

    def test_newlines_collapse_to_space(self):
        # the 2nd reference regex is dead: pass one removed all \n
        assert clean_text("a\n\nb\n \nc") == "a b c"

    def test_nbsp_is_whitespace(self):
        # Python \s matches \xa0 under default Unicode mode (SURVEY §7.4.1)
        assert clean_text("a\xa0\xa0b") == "a b"

    def test_strip(self):
        assert clean_text("  a  ") == "a"

    def test_empty_and_all_ws(self):
        assert clean_text("") == ""
        assert clean_text(" \n\t\xa0 ") == ""

    def test_unicode_content_preserved(self):
        assert clean_text("ä  ö\nü 中文") == "ä ö ü 中文"

    @given(st.text(max_size=300))
    def test_matches_reference_contract(self, s):
        assert clean_text(s) == reference_clean_text(s)

    @given(st.text(max_size=300))
    def test_idempotent(self, s):
        once = clean_text(s)
        assert clean_text(once) == once


class TestTextMetadata:
    def test_counts(self):
        m = create_text_metadata("a b  c")
        assert m == {"text_length": 6, "word_count": 3, "paragraph_count": 1}

    def test_empty(self):
        assert create_text_metadata("") == {
            "text_length": 0,
            "word_count": 0,
            "paragraph_count": 0,
        }

    def test_paragraph_quirk_after_clean(self):
        # after clean_text, no \n can survive → paragraph_count ≤ 1 (M9 quirk)
        m = create_text_metadata(clean_text("a\n\nb"))
        assert m["paragraph_count"] == 1

    def test_multiline_raw(self):
        m = create_text_metadata("p1\n\np2\n  \np3")
        assert m["paragraph_count"] == 3
