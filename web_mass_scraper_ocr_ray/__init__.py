"""Ray-Data-native reimplementation of Web-Mass-Scraper-OCR.

A from-scratch streaming batch engine: Parquet-backed Common-Crawl-style
pages in, per-URL extracted text + spans + OCR results out, expressed as
``ray.data.Dataset`` pipelines (``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages).

Reference semantics (what to compute, not how) are taken from
``EmiliosRichards/Web-Mass-Scraper-OCR`` — see SURVEY.md; each module
cites the reference ``file:line`` it reproduces.

Public API (reference analog: ``src/scraper_app/__init__.py:34-53``):
  - ``build_pipeline(cfg)`` / ``run_pipeline(cfg)`` — flagship pipeline
  - ``extract_batch(tbl)`` — HTML → text/spans/images, pyarrow in/out
  - ``OCRStage`` — stateful actor-pool OCR stage
"""

from .config import PipelineConfig
from .stages.extract import extract_batch
from .stages.ocr_stage import OCRStage
from .pipelines.extract_pipeline import build_pipeline, run_pipeline

__all__ = [
    "PipelineConfig",
    "extract_batch",
    "OCRStage",
    "build_pipeline",
    "run_pipeline",
]
