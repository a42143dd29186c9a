"""PDF layout parsing — engine seam + deterministic stub (north_star).

The north_star routes embedded PDF payloads to the stateful OCR/parse
actor stage with **layout-block ordering preserved**: a PDF page is a
bag of positioned text blocks, and the extracted text must follow
reading order (page, then top-to-bottom, then left-to-right), not the
arbitrary order blocks appear in the file's content stream.

The reference repo has no PDF path at all (its payloads are images —
/root/reference/src/scraper_app/scraper.py:219-258), so this module is
a pure north_star addition. No PDF library exists in this container
(by design — same policy as OCR/multimodal stubs), so:

  - ``order_blocks`` is the real, shared reading-order rule: stable
    sort by (page, y, x). This is the "layout-block ordering" logic
    itself and is engine-independent.
  - ``StubPdfLayoutEngine`` (default) parses a deterministic fake-PDF
    encoding used by goldens and the correctness gate: payload =
    ``%PDF-STUB\n`` + one ``page|y|x|text`` line per block, in ANY
    order (the synthesized corpus deliberately emits blocks reversed
    so the ordering rule is exercised end-to-end).
  - ``PdfMinerLayoutEngine`` is the real-engine seam: same interface,
    gated behind an import-try (instantiating without pdfminer.six
    raises ``NotImplementedError``); its text-box extraction accepts
    injected modules so the block-assembly logic is unit-testable.

Status taxonomy mirrors the OCR engine's (ocr/engine.py):
``success`` / ``no_text_found`` / ``error_unsupported_format`` (non-PDF
mime, or real-PDF bytes reaching the stub) / ``error_processing``
(empty or malformed payload).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

PDF_STUB_MAGIC = b"%PDF-STUB\n"
PDF_MIME = "application/pdf"


@dataclass
class LayoutBlock:
    """One positioned text block. ``y`` grows DOWN the page (reading
    order top-to-bottom = ascending y). Real PDF user space grows up —
    engines emitting PDF-native coordinates must flip before returning
    (the pdfminer seam does: y := round(page_height - bbox_top))."""

    page: int
    y: int
    x: int
    text: str


@dataclass
class PdfParseResult:
    status: str
    blocks: List[LayoutBlock] = field(default_factory=list)  # reading order

    @property
    def text(self) -> str:
        return "\n".join(b.text for b in self.blocks)


def order_blocks(blocks: List[LayoutBlock]) -> List[LayoutBlock]:
    """Reading order: (page, y, x), stable — ties keep input order."""
    return sorted(blocks, key=lambda b: (b.page, b.y, b.x))


class PdfLayoutEngine:
    """Interface: payload bytes + mime → PdfParseResult (ordered)."""

    def parse(self, payload: bytes, mime: str) -> PdfParseResult:  # pragma: no cover
        raise NotImplementedError


class StubPdfLayoutEngine(PdfLayoutEngine):
    """Deterministic engine over the ``%PDF-STUB`` encoding."""

    def parse(self, payload: bytes, mime: str) -> PdfParseResult:
        if mime != PDF_MIME:
            return PdfParseResult("error_unsupported_format")
        if not payload:
            return PdfParseResult("error_processing")
        if not payload.startswith(PDF_STUB_MAGIC):
            # Genuine %PDF bytes (or anything else): the stub has no
            # real parser — the PdfMinerLayoutEngine seam owns those.
            return PdfParseResult("error_unsupported_format")
        body = payload[len(PDF_STUB_MAGIC):].decode("utf-8", errors="replace")
        blocks: List[LayoutBlock] = []
        for line in body.splitlines():
            if not line:
                continue
            parts = line.split("|", 3)
            if len(parts) != 4:
                return PdfParseResult("error_processing")
            try:
                page, y, x = int(parts[0]), int(parts[1]), int(parts[2])
            except ValueError:
                return PdfParseResult("error_processing")
            blocks.append(LayoutBlock(page, y, x, parts[3]))
        if not any(b.text.strip() for b in blocks):
            return PdfParseResult("no_text_found")
        return PdfParseResult("success", order_blocks(blocks))


class PdfMinerLayoutEngine(PdfLayoutEngine):
    """Real engine seam (pdfminer.six). Not installed in this container;
    instantiation raises unless modules are injected. The injected
    surface is the minimal pdfminer API used: ``extract_pages(BytesIO)``
    yielding page layouts with ``.height`` and iterable text containers
    exposing ``.bbox`` (x0, y0, x1, y1, y up) and ``.get_text()`` —
    the block assembly + coordinate flip + reading-order sort below is
    the part this repo owns and unit-tests with a fake module.
    """

    def __init__(self, _modules: Optional[dict] = None):
        if _modules is None:
            try:
                from pdfminer.high_level import extract_pages  # noqa: F401

                _modules = {"extract_pages": extract_pages}
            except ImportError as exc:
                raise NotImplementedError(
                    "pdfminer.six is not available in this environment; "
                    "use StubPdfLayoutEngine or inject _modules"
                ) from exc
        self._extract_pages = _modules["extract_pages"]

    def parse(self, payload: bytes, mime: str) -> PdfParseResult:
        import io

        if mime != PDF_MIME:
            return PdfParseResult("error_unsupported_format")
        if not payload or not payload.startswith(b"%PDF"):
            return PdfParseResult("error_processing")
        blocks: List[LayoutBlock] = []
        try:
            for page_no, layout in enumerate(self._extract_pages(io.BytesIO(payload))):
                height = getattr(layout, "height", 0)
                for element in layout:
                    get_text = getattr(element, "get_text", None)
                    bbox = getattr(element, "bbox", None)
                    if get_text is None or bbox is None:
                        continue
                    x0, _y0, _x1, y1 = bbox
                    # PDF user space y grows UP; flip to reading order.
                    blocks.append(
                        LayoutBlock(
                            page=page_no,
                            y=int(round(height - y1)),
                            x=int(round(x0)),
                            text=get_text().strip(),
                        )
                    )
        except Exception:
            return PdfParseResult("error_processing")
        if not any(b.text.strip() for b in blocks):
            return PdfParseResult("no_text_found")
        return PdfParseResult("success", order_blocks(blocks))


def make_pdf_engine(kind: str = "stub", **kwargs) -> PdfLayoutEngine:
    if kind == "stub":
        return StubPdfLayoutEngine()
    if kind == "pdfminer":
        return PdfMinerLayoutEngine(**kwargs)
    raise ValueError(f"unknown pdf engine {kind!r}")
