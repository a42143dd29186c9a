"""Flagship pipeline: pages → extract → OCR → rollups → partitioned output.

Ray-Data expression of the reference's whole lifecycle (main.py:483-649):

    pages = read_parquet(input)                      # source (S3 analog)
    pages = assign part_id, anti-join committed      # resume (J2, §4.5)
    pages = size-bucket routing                      # skew (§4.4)
    ext   = pages.map_batches(extract_batch)         # M1-M5, M9-M10
    ext   = ext.map_batches(OCRStage, concurrency=…) # T2 actor pool (mode gate)
    ext.write_parquet(out, partition_cols=[part_id]) # S8-S15 → keyed Parquet
    per-partition manifests + session summary        # A4, S11-S13

One process boundary (Ray object store) replaces the reference's
browser-subprocess / Postgres / HTTP triangle (SURVEY.md §3.4).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.metadata import finalize_session_summary
from ..stages.extract import extract_batch
from ..stages.ocr_stage import OCRStage, empty_ocr_columns
from ..state import manifest as mf

# output column → session counter source (associative sums; main.py:46-59)
_SUM_COLS = {
    "total_ocr_attempts": "ocr_attempts",
    "total_ocr_successes": "ocr_successes",
    "total_ocr_no_text_found": "ocr_no_text_found_count",
    "total_ocr_errors_unsupported": "ocr_error_unsupported_format_count",
    "total_ocr_errors_processing": "ocr_error_processing_count",
    "total_ocr_errors_file_not_found": "ocr_error_file_not_found_count",
    "total_ocr_errors_tesseract": "ocr_error_tesseract_count",
    "total_text_length": "text_length",
    "total_word_count": "word_count",
}


def _mode_gate_batch(batch: pa.Table, mode: str) -> pa.Table:
    """scraper.py:208,217: mode='ocr' skips text extraction (text/spans
    blanked, image refs kept); mode='text' keeps text, images emptied by
    the empty-OCR stage downstream."""
    if mode != "ocr":
        return batch
    n = batch.num_rows
    from ..stages.extract import SPAN_TYPE

    batch = batch.set_column(
        batch.schema.get_field_index("text"), "text",
        pa.array([""] * n, pa.string()),
    )
    batch = batch.set_column(
        batch.schema.get_field_index("spans"), "spans",
        pa.array([[]] * n, pa.list_(SPAN_TYPE)),
    )
    for col in ("text_length", "word_count", "paragraph_count"):
        batch = batch.set_column(
            batch.schema.get_field_index(col), col,
            pa.array([0] * n, pa.int64()),
        )
    return batch


def build_pipeline(pages_ds, cfg: Optional[PipelineConfig] = None):
    """pages Dataset → extracted Dataset (lazy; no consumption here)."""
    cfg = cfg or PipelineConfig()
    ds = pages_ds

    # Prune at the read boundary: only the columns the pipeline needs
    # travel through the object store (at 100 TB, carrying cc text/lang
    # through extract would double the scan — SURVEY.md §1.4).
    cols = [c for c in cfg.input_columns if c in ds.schema().names]
    if set(cols) != set(ds.schema().names):
        ds = ds.select_columns(cols)

    if cfg.num_partitions:
        ds = ds.map_batches(
            partial(mf.assign_part_id, num_partitions=cfg.num_partitions),
            batch_format="pyarrow",
        )

    if cfg.output_dir:
        committed = mf.committed_parts(cfg.output_dir, cfg.manifest_dirname)
        if committed:
            mf.clean_uncommitted(cfg.output_dir, committed)
            ds = ds.map_batches(
                partial(mf.filter_uncommitted_batch, committed=committed),
                batch_format="pyarrow",
            )

    if cfg.skew_enabled:
        # §4.4: route the heavy-HTML tail through tiny batches so one
        # elephant page bounds one task briefly — no shuffle, two
        # cheap vectorized filters over the same blocks.
        threshold = max(cfg.skew_bucket_bytes // 8, 1)
        small = ds.map_batches(
            lambda t, th=threshold: t.filter(
                pc.less_equal(pc.binary_length(t.column("html")), th)
            ),
            batch_format="pyarrow",
        ).map_batches(
            extract_batch, batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
        big = ds.map_batches(
            lambda t, th=threshold: t.filter(
                pc.greater(pc.binary_length(t.column("html")), th)
            ),
            batch_format="pyarrow",
        ).map_batches(
            extract_batch, batch_format="pyarrow", batch_size=4,
        )
        ds = small.union(big)
    else:
        ds = ds.map_batches(
            extract_batch, batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )

    if cfg.mode == "ocr":
        ds = ds.map_batches(
            partial(_mode_gate_batch, mode="ocr"), batch_format="pyarrow"
        )

    if cfg.mode in ("ocr", "both"):
        ds = ds.map_batches(
            OCRStage,
            fn_constructor_kwargs={
                "engine": cfg.ocr_engine,
                "enhancement": cfg.ocr_enhancement,
                "fast_processing": cfg.ocr_fast_processing,
            },
            batch_format="pyarrow",
            batch_size=cfg.ocr_batch_size,
            concurrency=cfg.ocr_concurrency,
            num_cpus=cfg.ocr_num_cpus,
        )
    else:
        ds = ds.map_batches(empty_ocr_columns, batch_format="pyarrow")

    return ds


def _session_counter_sums(ds):
    """Associative partial sums over the output (A4). Small result."""
    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name="total_urls")]
    for out_name, col in _SUM_COLS.items():
        aggs.append(Sum(col, alias_name=out_name))
    row = ds.aggregate(*aggs)

    # per-batch partial count of completed rows → tiny global Sum
    # (pre-aggregation before the aggregate — no full-row shuffle)
    def _ok_partial(t: pa.Table) -> pa.Table:
        ok_n = pc.sum(
            pc.cast(pc.equal(t.column("status"), "completed"), pa.int64())
        ).as_py() or 0
        return pa.table({"ok": pa.array([ok_n], pa.int64())})

    ok = ds.map_batches(_ok_partial, batch_format="pyarrow").aggregate(
        Sum("ok", alias_name="successful_urls")
    )

    counters = {k: int(row.get(k) or 0) for k in
                ["total_urls", *_SUM_COLS.keys()]}
    counters["successful_urls"] = int(ok.get("successful_urls") or 0)
    counters["failed_urls"] = counters["total_urls"] - counters["successful_urls"]
    return counters


def session_summary(ds) -> Dict:
    """Global session rollup — ScrapingSession.get_session_summary analog
    (main.py:72-123), computed as a distributed aggregate."""
    return finalize_session_summary(_session_counter_sums(ds))


def hostname_rollup(ds):
    """Per-host aggregate (A5) — shuffle key = hostname (SURVEY.md §4.3),
    mirroring the reference's per-hostname artifact tree (main.py:133-138)."""
    from ray.data.aggregate import Count, Sum

    return ds.groupby("hostname").aggregate(
        Count(alias_name="pages"),
        Sum("text_length", alias_name="sum_text_length"),
        Sum("word_count", alias_name="sum_word_count"),
        Sum("n_images", alias_name="sum_images"),
        Sum("ocr_successes", alias_name="sum_ocr_successes"),
    )


def run_pipeline(pages_ds, cfg: Optional[PipelineConfig] = None) -> Dict:
    """Execute end-to-end; returns the run summary (S11 analog).

    With ``cfg.output_dir``: writes partitioned Parquet, then commits
    one lineage manifest per partition (§4.5) and derives the session
    summary by merging the per-partition counters — associativity
    guaranteed by construction (SURVEY.md §7.4.6).
    """
    cfg = cfg or PipelineConfig()
    start = time.monotonic()
    ds = build_pipeline(pages_ds, cfg)

    if not cfg.output_dir:
        summary = session_summary(ds)
        summary["duration_seconds"] = time.monotonic() - start
        return summary

    ds.write_parquet(cfg.output_dir, partition_cols=[mf.PART_COL])

    from ray.data.aggregate import Count, Sum
    import ray.data as rd

    out_ds = rd.read_parquet(cfg.output_dir)
    aggs = [Count(alias_name="total_urls")]
    for out_name, col in _SUM_COLS.items():
        aggs.append(Sum(col, alias_name=out_name))
    per_part = out_ds.map_batches(
        lambda t: t.append_column(
            "ok_count",
            pc.cast(pc.equal(t.column("status"), "completed"), pa.int64()),
        ),
        batch_format="pyarrow",
    ).groupby(mf.PART_COL).aggregate(*aggs, Sum("ok_count",
                                                alias_name="successful_urls"))

    totals = {k: 0 for k in
              ["total_urls", "successful_urls", "failed_urls", *_SUM_COLS.keys()]}
    for row in per_part.iter_rows():
        pid = int(row[mf.PART_COL])
        stats = {
            "total_urls": int(row["total_urls"]),
            "successful_urls": int(row["successful_urls"] or 0),
        }
        stats["failed_urls"] = stats["total_urls"] - stats["successful_urls"]
        for k in _SUM_COLS:
            stats[k] = int(row[k] or 0)
        mf.commit_partition(cfg.output_dir, pid, stats, cfg.manifest_dirname)
        for k in totals:
            totals[k] += stats.get(k, 0)

    summary = finalize_session_summary(totals)
    summary["duration_seconds"] = time.monotonic() - start
    summary["partitions_committed"] = len(
        mf.committed_parts(cfg.output_dir, cfg.manifest_dirname)
    )
    return summary
