"""Opt-in integration smokes for the REAL OCR / PDF engines.

The sandbox ships neither PIL/pytesseract nor pdfminer.six, so the
engines are seam-tested with injected fakes elsewhere
(tests/test_ocr.py, tests/test_pdf.py). These tests run the real
binaries when the packages ARE importable (reference behavior:
reference src/scraper_app/ocr.py:39-76) and skip cleanly otherwise —
run them on a host with `pip install pillow pytesseract pdfminer.six`
and the tesseract binary to close the last parity gap.
"""

import shutil

import pytest


def _build_minimal_pdf(text: str) -> bytes:
    """A valid single-page PDF with one Helvetica text object and a
    correct xref table (offsets computed, not hand-counted)."""
    content = f"BT /F1 24 Tf 72 700 Td ({text}) Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


class TestRealTesseract:
    def test_ocr_rendered_text(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        pytest.importorskip("pytesseract")
        if shutil.which("tesseract") is None:
            pytest.skip("tesseract binary not on PATH")
        import io

        from PIL import Image, ImageDraw

        from web_mass_scraper_ocr_ray.ocr.engine import TesseractOCREngine

        img = Image.new("RGB", (600, 120), "white")
        ImageDraw.Draw(img).text((20, 40), "HELLO WORLD 123",
                                 fill="black")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        eng = TesseractOCREngine()
        out = eng.ocr(buf.getvalue(), "image/png")
        assert out.status == "success"
        assert "HELLO" in out.text.upper()

    def test_status_taxonomy_on_real_engine(self):
        pytest.importorskip("PIL")
        pytest.importorskip("pytesseract")
        if shutil.which("tesseract") is None:
            pytest.skip("tesseract binary not on PATH")
        from web_mass_scraper_ocr_ray.ocr.engine import TesseractOCREngine

        eng = TesseractOCREngine()
        assert eng.ocr(b"", "image/png").status == "error_processing"
        assert eng.ocr(b"x", "text/plain").status \
            == "error_unsupported_format"
        assert eng.ocr(b"not an image", "image/png").status \
            == "error_processing"


class TestRealPdfMiner:
    def test_layout_blocks_from_minimal_pdf(self):
        pytest.importorskip("pdfminer.high_level")
        from web_mass_scraper_ocr_ray.ocr.pdf_layout import (
            PDF_MIME,
            PdfMinerLayoutEngine,
        )

        eng = PdfMinerLayoutEngine()
        res = eng.parse(_build_minimal_pdf("Hello layout world"),
                        PDF_MIME)
        assert res.status == "success"
        texts = " ".join(b.text for b in res.blocks)
        assert "Hello layout world" in texts

    def test_real_engine_taxonomy(self):
        pytest.importorskip("pdfminer.high_level")
        from web_mass_scraper_ocr_ray.ocr.pdf_layout import (
            PDF_MIME,
            PdfMinerLayoutEngine,
        )

        eng = PdfMinerLayoutEngine()
        assert eng.parse(b"", PDF_MIME).status == "error_processing"
        assert eng.parse(b"%PDF", "text/plain").status \
            == "error_unsupported_format"
