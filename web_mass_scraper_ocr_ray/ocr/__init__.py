"""OCR engines — stateful per-actor components (SURVEY.md §2.3 T2)."""

from .engine import OCREngine, StubOCREngine, parse_data_url, make_engine

__all__ = ["OCREngine", "StubOCREngine", "parse_data_url", "make_engine"]
