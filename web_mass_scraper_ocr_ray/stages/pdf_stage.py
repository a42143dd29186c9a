"""PDF routing stage — embedded document payloads → layout-ordered text.

North_star: "route embedded PDF/image payloads to a stateful
ActorPoolStrategy OCR stage … layout-block ordering preserved". The
image half lives in ``stages/ocr_stage.py``; this is the document half:
the ``docs`` refs enumerated by the extract stage (<embed src=…> /
<object data=…>, DOM order) are resolved and parsed by a per-actor
``PdfLayoutEngine`` (ocr/pdf_layout.py), with blocks re-assembled in
reading order (page, y, x).

Routing per doc ref (same taxonomy as image refs, ocr_stage.py:12-17):
  - ``data``    → decode base64 in-band payload → engine.parse
  - ``remote``  → offline default: download-failed path → ``failed_docs``
  - ``invalid`` → unconstructable URL → ``failed_docs``
  - undecodable data-URL → ``failed_docs``

Output adds per row:
  - ``pdf_items``: list<struct doc_url,text,n_blocks,n_pages,status,failed>
    (text = clean_text of newline-joined ordered blocks — same collapse
    contract as page text, so spans/oracles share one whitespace rule)
  - ``failed_docs``: list<string>
  - ``pdf_text`` / ``pdf_text_length`` / ``pdf_word_count``: rollup of
    successful items in DOM order (A1 analog for documents)
  - ``pdf_blocks_total`` and flat status counters (A2 analog), all
    summing associatively into session rollups.

The reference has no PDF path; this stage is cited as a north_star
addition, not a parity port.
"""

from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from ..functions.textclean import clean_text
from ..ocr.engine import parse_data_url
from ..ocr.pdf_layout import make_pdf_engine

PDF_ITEM_TYPE = pa.struct(
    [
        ("doc_url", pa.string()),
        ("text", pa.string()),
        ("n_blocks", pa.int64()),
        ("n_pages", pa.int64()),
        ("status", pa.string()),
        ("failed", pa.bool_()),
    ]
)

PDF_FLAT_COLUMNS = (
    ("pdf_attempts", pa.int64()),
    ("pdf_successes", pa.int64()),
    ("pdf_no_text_found_count", pa.int64()),
    ("pdf_error_unsupported_format_count", pa.int64()),
    ("pdf_error_processing_count", pa.int64()),
    ("pdf_total_errors", pa.int64()),
)


def parse_page_docs(engine, doc_refs: List[Dict[str, Any]]):
    """Per-page doc loop (DOM order). Returns (pdf_items, failed)."""
    items: List[Dict[str, Any]] = []
    failed: List[str] = []
    for ref in doc_refs or []:
        kind = ref["payload_kind"]
        doc_url = ref["doc_url"]
        if kind == "invalid":
            failed.append(ref["src"] or "unknown_src_on_failed_construct")
            continue
        if kind == "remote":
            # Offline default — mirrors the image remote route.
            failed.append(doc_url)
            continue
        parsed = parse_data_url(doc_url)
        if parsed is None:
            failed.append(doc_url)
            continue
        mime, payload = parsed
        # The tag's type attribute may be more specific than a bare
        # data: header — classify_doc_ref already resolved precedence
        # into ref["mime"]; trust it over the re-parse.
        result = engine.parse(payload, ref["mime"] or mime)
        pages = {b.page for b in result.blocks}
        items.append(
            {
                "doc_url": doc_url,
                "text": clean_text("\n".join(b.text for b in result.blocks)),
                "n_blocks": len(result.blocks),
                "n_pages": len(pages),
                "status": result.status,
                "failed": result.status != "success",
            }
        )
    return items, failed


class PdfStage:
    """Callable class for ``map_batches(PdfStage, concurrency=N, ...)``."""

    def __init__(self, engine: str = "stub", **engine_kwargs):
        # once per actor — the engine is the state this pool exists for
        self.engine = make_pdf_engine(engine, **engine_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs_col = batch.column("docs").to_pylist()
        n = len(refs_col)
        items_out: List[list] = [[]] * n
        failed_out: List[list] = [[]] * n
        texts = [""] * n
        blocks_total = [0] * n
        flats = {name: [0] * n for name, _ in PDF_FLAT_COLUMNS}

        for i in range(n):
            items, failed = parse_page_docs(self.engine, refs_col[i])
            items_out[i] = items
            failed_out[i] = failed
            ok_texts = [it["text"] for it in items if it["status"] == "success"]
            texts[i] = " ".join(ok_texts)
            blocks_total[i] = sum(it["n_blocks"] for it in items)
            flats["pdf_attempts"][i] = len(items)
            n_ok = n_ntf = n_unsup = n_proc = 0
            for it in items:
                s = it["status"]
                if s == "success":
                    n_ok += 1
                elif s == "no_text_found":
                    n_ntf += 1
                elif s == "error_unsupported_format":
                    n_unsup += 1
                else:
                    n_proc += 1
            flats["pdf_successes"][i] = n_ok
            flats["pdf_no_text_found_count"][i] = n_ntf
            flats["pdf_error_unsupported_format_count"][i] = n_unsup
            flats["pdf_error_processing_count"][i] = n_proc
            flats["pdf_total_errors"][i] = n_unsup + n_proc

        out = batch
        out = out.append_column(
            "pdf_items", pa.array(items_out, pa.list_(PDF_ITEM_TYPE))
        )
        out = out.append_column(
            "failed_docs", pa.array(failed_out, pa.list_(pa.string()))
        )
        out = out.append_column("pdf_text", pa.array(texts, pa.string()))
        out = out.append_column(
            "pdf_text_length",
            pa.array([len(t) for t in texts], pa.int64()),
        )
        out = out.append_column(
            "pdf_word_count",
            pa.array([len(t.split()) for t in texts], pa.int64()),
        )
        out = out.append_column(
            "pdf_blocks_total", pa.array(blocks_total, pa.int64())
        )
        for name, typ in PDF_FLAT_COLUMNS:
            out = out.append_column(name, pa.array(flats[name], typ))
        return out


# Process-global engine cache for the FUSED task path — same tradeoff
# as ocr_stage._PROCESS_ENGINES (actor pools cannot fuse with task
# stages; the stub engine is cheap to hold per worker process).
_PROCESS_ENGINES: dict = {}


def pdf_batch_fused(batch: pa.Table, engine: str = "stub") -> pa.Table:
    stage = _PROCESS_ENGINES.get(engine)
    if stage is None:
        stage = PdfStage(engine)
        _PROCESS_ENGINES[engine] = stage
    return stage(batch)


def empty_pdf_columns(batch: pa.Table) -> pa.Table:
    """parse_pdfs=False gate: stable output schema with empty columns."""
    n = batch.num_rows
    out = batch
    out = out.append_column(
        "pdf_items", pa.array([[]] * n, pa.list_(PDF_ITEM_TYPE))
    )
    out = out.append_column(
        "failed_docs", pa.array([[]] * n, pa.list_(pa.string()))
    )
    out = out.append_column("pdf_text", pa.array([""] * n, pa.string()))
    out = out.append_column("pdf_text_length", pa.array([0] * n, pa.int64()))
    out = out.append_column("pdf_word_count", pa.array([0] * n, pa.int64()))
    out = out.append_column("pdf_blocks_total", pa.array([0] * n, pa.int64()))
    for name, typ in PDF_FLAT_COLUMNS:
        out = out.append_column(name, pa.array([0] * n, typ))
    return out
