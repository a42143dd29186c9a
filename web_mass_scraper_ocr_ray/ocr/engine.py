"""OCR engine interface + deterministic stub implementation.

The reference runs Tesseract per image with a deterministic PIL
preprocessing chain (``/root/reference/src/scraper_app/ocr.py:36-113``)
and a 6-status taxonomy (ocr.py:29-31). This container has neither PIL
nor Tesseract (by design — multimodal decode is STUBBED per the build
brief), so:

  - ``StubOCREngine`` is the default, fully deterministic engine used by
    goldens and correctness checks (FIXTURES.md §3). It classifies
    payloads into the exact reference status taxonomy.
  - ``TesseractOCREngine`` is the real-engine seam: same interface,
    gated behind an import-try; instantiating it without PIL/pytesseract
    raises ``NotImplementedError``. The Ray-side plumbing (actor pool,
    batch signature, output layout) is identical for both.

Engines are pinned once per actor in the OCR stage's ``__init__``
(vs the reference paying Tesseract+browser startup per URL —
scraper.py:174-179, the single biggest inefficiency removed).

Stub classification (mirrors ocr.py error paths):
  - mime not image/* or image/svg+xml → ``error_unsupported_format``
    (PIL UnidentifiedImageError path, ocr.py:98-101)
  - empty payload → ``error_processing`` (empty/corrupt, ocr.py:44-52)
  - payload ``STUB1:<utf8 text>`` → ``success``; empty text →
    ``no_text_found`` (ocr.py:81-85)
  - anything else → ``error_unsupported_format``
"""

from __future__ import annotations

import base64
import binascii
from dataclasses import dataclass
from typing import Optional, Tuple

STUB_MAGIC = b"STUB1:"


@dataclass
class OCROutput:
    """Mirror of the reference OCRResult TypedDict (ocr.py:8-13)."""

    text: str
    char_count: int
    word_count: int
    ocr_status: str


def parse_data_url(data_url: str) -> Optional[Tuple[str, bytes]]:
    """``data:<mime>;base64,<payload>`` → (mime, bytes) or None.

    Mirrors utils.py:166-191 (handle_data_url): header split on the
    first comma, mime from the header, base64 decode; any failure →
    None (the reference logs and returns None → download-failed path).
    """
    try:
        if not data_url.startswith("data:"):
            return None
        header, encoded = data_url.split(",", 1)
        mime = header.split(";")[0].split(":")[1]
        payload = base64.b64decode(encoded)
        return mime, payload
    except (ValueError, binascii.Error, IndexError):
        return None


class OCREngine:
    """Interface: bytes + mime → OCROutput. Stateful setup in __init__."""

    def ocr(self, payload: bytes, mime: str) -> OCROutput:  # pragma: no cover
        raise NotImplementedError


class StubOCREngine(OCREngine):
    """Deterministic test engine — see module docstring."""

    def __init__(self, enhancement: bool = True, fast_processing: bool = False):
        # Knobs kept for interface parity with ocr.py:15; the stub's
        # output is independent of them by design (determinism).
        self.enhancement = enhancement
        self.fast_processing = fast_processing

    def ocr(self, payload: bytes, mime: str) -> OCROutput:
        if not mime.startswith("image/") or mime == "image/svg+xml":
            return OCROutput("", 0, 0, "error_unsupported_format")
        if not payload:
            return OCROutput("", 0, 0, "error_processing")
        if payload.startswith(STUB_MAGIC):
            text = payload[len(STUB_MAGIC):].decode("utf-8", errors="replace")
            if len(text) == 0:
                return OCROutput("", 0, 0, "no_text_found")
            return OCROutput(text, len(text), len(text.split()), "success")
        return OCROutput("", 0, 0, "error_unsupported_format")


class TesseractOCREngine(OCREngine):
    """Real-engine seam: PIL preprocessing chain (grayscale, 2x LANCZOS
    upscale if <300px, contrast 2.0, sharpen — ocr.py:54-73) + Tesseract.

    Not available in this container; instantiation raises so the seam is
    explicit and tested.
    """

    def __init__(self, enhancement: bool = True, fast_processing: bool = False):
        try:
            from PIL import Image  # noqa: F401
            import pytesseract  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "TesseractOCREngine requires PIL + pytesseract; use "
                "StubOCREngine in this environment"
            ) from exc
        self.enhancement = enhancement
        self.fast_processing = fast_processing

    def ocr(self, payload: bytes, mime: str) -> OCROutput:  # pragma: no cover
        raise NotImplementedError("real OCR path not available in this container")


def make_engine(kind: str = "stub", **kwargs) -> OCREngine:
    if kind == "stub":
        return StubOCREngine(**kwargs)
    if kind == "tesseract":
        return TesseractOCREngine(**kwargs)
    raise ValueError(f"unknown OCR engine kind: {kind!r}")
