"""Engine configuration — replaces the reference's .env surface.

The reference drives all behavior from environment variables
(``/root/reference/src/scraper_app/config.py:17-56``); here the same
knobs are an explicit dataclass passed to ``build_pipeline`` (SURVEY.md
§2.10). Defaults are sized for a 32-CPU node and scale by partitioning,
not by global state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple, Union


@dataclass
class PipelineConfig:
    # mode gate — scraper.py:208,217,305 (SCRAPER_MODE ∈ text|ocr|both)
    mode: str = "both"

    # OCR stage (T2): engine pinned per actor; knobs mirror ocr.py:15
    ocr_engine: str = "stub"
    ocr_enhancement: bool = True
    ocr_fast_processing: bool = False
    # actor pool sizing: (min, max) autoscaling or int fixed
    ocr_concurrency: Union[int, Tuple[int, int]] = (2, 8)
    ocr_batch_size: int = 256          # small batches bound elephant pages
    ocr_num_cpus: float = 1.0

    # extract stage (M4): stateless tasks over pyarrow batches
    extract_batch_size: int = 1024

    # skew handling (§4.4): split blocks so huge-HTML rows don't make
    # one task carry an unbounded byte budget
    skew_bucket_bytes: int = 8 * 1024 * 1024   # max html bytes per batch split
    skew_enabled: bool = True

    # resumable output (§4.5)
    num_partitions: int = 64            # part_id = hash64(url) % num_partitions
    output_dir: Optional[str] = None    # None → no write stage (return ds)
    manifest_dirname: str = "_manifest"

    # input column pruning at the read
    input_columns: tuple = ("url", "warc_ts", "html")

    # keep raw html bytes in the output? (reference writes page.html —
    # S8; prod default drops it: raw html already lives in the input)
    keep_html: bool = False

    extras: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.mode not in ("text", "ocr", "both"):
            raise ValueError(f"mode must be text|ocr|both, got {self.mode!r}")
