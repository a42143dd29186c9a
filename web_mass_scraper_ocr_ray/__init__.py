"""Ray-Data-native reimplementation of Web-Mass-Scraper-OCR.

A from-scratch streaming batch engine: Parquet-backed Common-Crawl-style
pages in, per-URL extracted text + spans + OCR results out, expressed as
``ray.data.Dataset`` pipelines (``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages).

Reference semantics (what to compute, not how) are taken from
``EmiliosRichards/Web-Mass-Scraper-OCR`` — see SURVEY.md; each module
cites the reference ``file:line`` it reproduces. COVERAGE.md maps the
full operator inventory to implementations, tests and oracle queries.

Public API (reference analog: ``src/scraper_app/__init__.py:34-53``).
"""

from .config import PipelineConfig
from .functions.htmlfast import extract_visible_text_fast
from .functions.htmltext import (
    ExtractResult,
    HiddenRules,
    Span,
    extract_visible_text,
    hidden_rules_from_html,
)
from .functions.retry import retry_with_backoff
from .functions.textclean import clean_text, create_text_metadata
from .functions.urltools import (
    construct_absolute_url,
    get_safe_filename,
    get_url_specific_safe_dirname,
    normalize_hostname,
    validate_url,
)
from .ocr.engine import OCREngine, StubOCREngine, make_engine, parse_data_url
from .sources.images import ImageDownloader
from .sources.urls import (
    FetchStage,
    pages_from_urls,
    read_url_file,
    urllib_fetcher,
)
from .pipelines.extract_pipeline import (
    build_pipeline,
    hostname_rollup,
    run_pipeline,
    session_summary,
)
from .ocr.pdf_layout import PdfLayoutEngine, StubPdfLayoutEngine, make_pdf_engine
from .stages.extract import (
    CssAwareExtract,
    extract_batch,
    extract_batch_sliced,
    extract_row,
)
from .stages.ocr_stage import OCRStage, ocr_batch_fused
from .stages.pdf_stage import PdfStage, pdf_batch_fused

__all__ = [
    # pipeline surface
    "PipelineConfig",
    "build_pipeline",
    "run_pipeline",
    "session_summary",
    "hostname_rollup",
    # batch kernels
    "extract_batch",
    "extract_batch_sliced",
    "extract_row",
    "CssAwareExtract",
    "HiddenRules",
    "hidden_rules_from_html",
    "OCRStage",
    "ocr_batch_fused",
    "PdfStage",
    "pdf_batch_fused",
    # pure functions (utils.py analog surface)
    "clean_text",
    "create_text_metadata",
    "validate_url",
    "construct_absolute_url",
    "normalize_hostname",
    "get_safe_filename",
    "get_url_specific_safe_dirname",
    "extract_visible_text",
    "extract_visible_text_fast",
    "ExtractResult",
    "Span",
    "retry_with_backoff",
    # OCR engines
    "OCREngine",
    "StubOCREngine",
    "make_engine",
    "parse_data_url",
    # PDF layout engines (north_star document routing)
    "PdfLayoutEngine",
    "StubPdfLayoutEngine",
    "make_pdf_engine",
    # live-fetch surface (S1/S2/S5/S6)
    "FetchStage",
    "urllib_fetcher",
    "pages_from_urls",
    "read_url_file",
    "ImageDownloader",
]
