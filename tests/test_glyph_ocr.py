"""Real-pixel glyph OCR kernel (ocr/glyphs.py + GlyphOCREngine):
font invariants, render→match roundtrips across scales/offsets, the
engine status taxonomy, and the actor-pool e2e through OCRStage."""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.ocr.glyphs import (
    FONT,
    GLYPH_H,
    GLYPH_W,
    GlyphMatcher,
    render_text_bmp,
    render_text_gray,
)


class TestFontInvariants:
    """The matcher's segmentation/scale logic relies on these."""

    def test_every_glyph_full_bbox_no_blank_columns(self):
        for ch, g in FONT.items():
            assert g.shape == (GLYPH_H, GLYPH_W), ch
            # ink in top and bottom row (scale inference from bbox)
            assert g[0].any() and g[-1].any(), ch
            # ink in every column (projection must not split a glyph,
            # and the ink bbox must be exactly 5 cells wide)
            assert g.any(axis=0).all(), ch

    def test_templates_distinct(self):
        flat = {ch: g.tobytes() for ch, g in FONT.items()}
        assert len(set(flat.values())) == len(flat)


class TestRoundtrip:
    @pytest.mark.parametrize("scale", [1, 2, 3])
    @pytest.mark.parametrize("x_off", [0, 1, 4])
    def test_full_charset(self, scale, x_off):
        m = GlyphMatcher()
        text = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG 0123456789"
        gray = render_text_gray(text, scale=scale, x_off=x_off)
        assert m.match_gray(gray) == text

    def test_every_single_char(self):
        m = GlyphMatcher()
        for ch in sorted(FONT):
            assert m.match_gray(render_text_gray(ch)) == ch, ch

    def test_bmp_payload_roundtrip(self):
        m = GlyphMatcher()
        assert m.match_payload(render_text_bmp("ID 42 EN",
                                               scale=2)) == "ID 42 EN"

    def test_blank_image_is_empty(self):
        m = GlyphMatcher()
        assert m.match_gray(np.full((20, 40), 255, np.uint8)) == ""

    def test_unknown_shape_comes_back_as_question_mark(self):
        # a dense un-fontlike blob must NOT silently match a glyph
        m = GlyphMatcher(max_hamming=3)
        gray = np.full((15, 13), 255, np.uint8)
        gray[4:11, 4:9] = 0          # solid 5x7 block
        out = m.match_gray(gray)
        assert out == "?"

    def test_rejects_chars_outside_charset(self):
        with pytest.raises(ValueError):
            render_text_gray("lower case")


class TestGlyphEngine:
    def _eng(self):
        from web_mass_scraper_ocr_ray.ocr.engine import make_engine

        return make_engine("glyph")

    def test_success_and_counts(self):
        out = self._eng().ocr(render_text_bmp("HELLO WORLD 7"),
                              "image/bmp")
        assert out.ocr_status == "success"
        assert out.text == "HELLO WORLD 7"
        assert out.char_count == len("HELLO WORLD 7")
        assert out.word_count == 3

    def test_status_taxonomy(self):
        eng = self._eng()
        assert eng.ocr(b"x", "image/png").ocr_status == \
            "error_unsupported_format"
        assert eng.ocr(b"", "image/bmp").ocr_status == "error_processing"
        assert eng.ocr(b"not a bmp at all....", "image/bmp").ocr_status \
            == "error_unsupported_format"
        blank = render_text_bmp(" ")
        assert eng.ocr(blank, "image/bmp").ocr_status == "no_text_found"


class TestActorPoolE2E:
    def test_ocr_stage_with_glyph_engine(self, ray_session):
        """Rendered BMP data-URLs through the REAL OCRStage actor pool
        with engine='glyph' — pixels in, text out, reference rollup
        columns intact."""
        import base64

        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.ocr_stage import OCRStage

        texts = ["PAGE 1 EN", "PAGE 2 DE", "PAGE 3 FR"]
        rows = []
        for i, t in enumerate(texts):
            b64 = base64.b64encode(
                render_text_bmp(t, scale=1 + i % 2)).decode()
            rows.append({
                "url": f"https://x.example.com/{i}",
                "images": [{"payload_kind": "data", "src": "inline",
                            "image_url":
                            f"data:image/bmp;base64,{b64}"}],
            })
        ds = rd.from_items(rows).map_batches(
            OCRStage, fn_constructor_kwargs={"engine": "glyph"},
            batch_size=2, concurrency=1, batch_format="pyarrow")
        out = ds.to_pandas().sort_values("url")
        got = [img[0]["text"] for img in out["images"]]
        assert got == texts
        assert out["ocr_successes"].tolist() == [1, 1, 1]
