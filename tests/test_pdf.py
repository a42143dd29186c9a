"""PDF payload routing (north_star): doc-ref enumeration in BOTH DOM
scanners, the layout engine's status taxonomy + reading-order rule, the
real-engine seam, and the actor-pool/fused stage end-to-end."""

import base64

import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.functions.htmlfast import extract_visible_text_fast
from web_mass_scraper_ocr_ray.functions.htmltext import extract_visible_text
from web_mass_scraper_ocr_ray.ocr.pdf_layout import (
    PDF_STUB_MAGIC,
    LayoutBlock,
    PdfMinerLayoutEngine,
    StubPdfLayoutEngine,
    make_pdf_engine,
    order_blocks,
)
from web_mass_scraper_ocr_ray.stages.extract import classify_doc_ref
from web_mass_scraper_ocr_ray.stages.pdf_stage import (
    PdfStage,
    empty_pdf_columns,
    parse_page_docs,
)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


class TestDocRefEnumeration:
    """<embed src>/<object data> collected in DOM order by both the
    stdlib-parser reference and the fast scanner — equality enforced
    the same way as text/images (tests/test_htmlfast.py)."""

    FIXTURES = [
        b'<body><embed src="a.pdf" type="application/pdf"><p>hi</p></body>',
        b'<body><object data="b.pdf" type="application/pdf">fb</object></body>',
        b'<object data="c.swf"/><embed src="" type="x"><embed type="application/pdf" src="d.pdf">',
        b'<div hidden><embed src="h.pdf"></div>',
        b'<script><embed src="no.pdf"></script><template><object data="no2.pdf"></object></template>',
        b'<object data="e&amp;f.pdf" type="application/pdf"></object>',
        b'<OBJECT DATA="up.pdf"><EMBED SRC="up2.pdf" TYPE="t/u"/>',
        b'<object type="application/pdf"></object><embed type="application/pdf">',
        b'<p>before<embed src=bare.pdf>after</p>',
    ]

    def test_equality_and_dom_order(self):
        for html in self.FIXTURES:
            ref = extract_visible_text(html)
            fast = extract_visible_text_fast(html)
            assert fast.docs == ref.docs, html
            assert fast.text == ref.text, html
            assert fast.images == ref.images, html

    def test_collection_semantics(self):
        r = extract_visible_text(self.FIXTURES[2])
        assert r.docs == [("c.swf", ""), ("d.pdf", "application/pdf")]
        # hidden subtrees ARE enumerated (same rule as <img>)
        assert extract_visible_text(self.FIXTURES[3]).docs == [("h.pdf", "")]
        # raw containers are NOT
        assert extract_visible_text(self.FIXTURES[4]).docs == []
        # entity decoding in the ref value
        assert extract_visible_text(self.FIXTURES[5]).docs[0][0] == "e&f.pdf"
        # missing src/data → no ref
        assert extract_visible_text(self.FIXTURES[7]).docs == []


class TestClassifyDocRef:
    URL = "https://www.host001.example.com/docs/1"

    def test_data_url_mime_wins(self):
        ref = classify_doc_ref(
            "data:application/pdf;base64,AAAA", "text/plain", self.URL
        )
        assert ref["payload_kind"] == "data"
        assert ref["mime"] == "application/pdf"

    def test_type_attr_fallback_for_remote(self):
        ref = classify_doc_ref("/files/x.bin", "application/pdf", self.URL)
        assert ref["payload_kind"] == "remote"
        assert ref["mime"] == "application/pdf"
        assert ref["doc_url"].startswith("https://www.host001")

    def test_extension_sniff(self):
        ref = classify_doc_ref("/files/x.PDF?v=2", "", self.URL)
        assert ref["mime"] == "application/pdf"
        assert classify_doc_ref("/files/x.bin", "", self.URL)["mime"] == ""

    def test_invalid(self):
        ref = classify_doc_ref("", "", self.URL)
        assert ref["payload_kind"] == "invalid"


class TestStubEngine:
    def setup_method(self):
        self.eng = StubPdfLayoutEngine()

    def test_reading_order(self):
        payload = PDF_STUB_MAGIC + b"1|0|0|last\n0|5|9|mid-right\n0|5|2|mid-left\n0|1|0|first"
        res = self.eng.parse(payload, "application/pdf")
        assert res.status == "success"
        assert [b.text for b in res.blocks] == [
            "first", "mid-left", "mid-right", "last"
        ]
        assert res.text == "first\nmid-left\nmid-right\nlast"

    def test_statuses(self):
        ok = PDF_STUB_MAGIC + b"0|0|0|x"
        assert self.eng.parse(ok, "text/plain").status == "error_unsupported_format"
        assert self.eng.parse(b"", "application/pdf").status == "error_processing"
        assert (
            self.eng.parse(b"%PDF-1.7 real", "application/pdf").status
            == "error_unsupported_format"
        )
        assert (
            self.eng.parse(PDF_STUB_MAGIC, "application/pdf").status
            == "no_text_found"
        )
        assert (
            self.eng.parse(PDF_STUB_MAGIC + b"no pipes here",
                           "application/pdf").status
            == "error_processing"
        )
        assert (
            self.eng.parse(PDF_STUB_MAGIC + b"a|b|c|d",
                           "application/pdf").status
            == "error_processing"
        )

    def test_order_blocks_stable(self):
        blocks = [LayoutBlock(0, 1, 1, "a"), LayoutBlock(0, 1, 1, "b")]
        assert [b.text for b in order_blocks(blocks)] == ["a", "b"]


class _FakeTextBox:
    def __init__(self, bbox, text):
        self.bbox = bbox
        self._text = text

    def get_text(self):
        return self._text


class _FakePage:
    def __init__(self, height, elements):
        self.height = height
        self._elements = elements

    def __iter__(self):
        return iter(self._elements)


class TestPdfMinerSeam:
    def test_raises_without_lib(self):
        with pytest.raises(NotImplementedError):
            PdfMinerLayoutEngine()
        with pytest.raises(NotImplementedError):
            make_pdf_engine("pdfminer")

    def test_block_assembly_flips_y(self):
        # PDF user space: y grows UP; bbox = (x0, y0, x1, y1). A box
        # whose TOP (y1) is higher on the page must sort first.
        pages = [
            _FakePage(100, [
                _FakeTextBox((10, 80, 50, 95), "header\n"),
                _FakeTextBox((10, 10, 50, 30), "footer\n"),
                _FakeTextBox((60, 60, 90, 95), "right-col\n"),
            ]),
            _FakePage(100, [_FakeTextBox((0, 0, 10, 100), "page2\n")]),
        ]
        eng = PdfMinerLayoutEngine(
            _modules={"extract_pages": lambda fh: iter(pages)}
        )
        res = eng.parse(b"%PDF-1.4 whatever", "application/pdf")
        assert res.status == "success"
        assert [b.text for b in res.blocks] == [
            "header", "right-col", "footer", "page2"
        ]
        assert [b.page for b in res.blocks] == [0, 0, 0, 1]

    def test_statuses(self):
        eng = PdfMinerLayoutEngine(
            _modules={"extract_pages": lambda fh: iter([])}
        )
        assert eng.parse(b"notpdf", "application/pdf").status == "error_processing"
        assert eng.parse(b"%PDF-1.4", "text/plain").status == "error_unsupported_format"
        assert eng.parse(b"%PDF-1.4", "application/pdf").status == "no_text_found"


class TestParsePageDocs:
    def test_routing(self):
        eng = StubPdfLayoutEngine()
        refs = [
            {"doc_url": "bad", "src": "bad", "mime": "",
             "payload_kind": "invalid"},
            {"doc_url": "https://x.example.com/a.pdf", "src": "/a.pdf",
             "mime": "application/pdf", "payload_kind": "remote"},
            # no comma → parse_data_url returns None → failed route
            {"doc_url": "data:application/pdf;base64", "src": "s",
             "mime": "application/pdf", "payload_kind": "data"},
            {"doc_url": "data:application/pdf;base64,"
             + _b64(PDF_STUB_MAGIC + b"0|0|0|hello world"),
             "src": "s", "mime": "application/pdf", "payload_kind": "data"},
        ]
        items, failed = parse_page_docs(eng, refs)
        assert failed == ["bad", "https://x.example.com/a.pdf",
                          "data:application/pdf;base64"]
        assert len(items) == 1
        assert items[0]["status"] == "success"
        assert items[0]["text"] == "hello world"
        assert items[0]["n_blocks"] == 1 and items[0]["n_pages"] == 1
        assert items[0]["failed"] is False


@pytest.mark.usefixtures("ray_session")
class TestPdfStageE2E:
    SF = "/root/testdata/sf0.001"

    def _pipeline(self, **cfg_kwargs):
        from web_mass_scraper_ocr_ray import PipelineConfig, build_pipeline
        from web_mass_scraper_ocr_ray.sources.pages import (
            synth_pdf_pages_dataset,
        )

        return build_pipeline(
            synth_pdf_pages_dataset(self.SF),
            PipelineConfig(mode="text", parse_pdfs=True, **cfg_kwargs),
        )

    def test_counters_add_up(self):
        ds = self._pipeline()
        sums = ds.sum(
            ["pdf_attempts", "pdf_successes", "pdf_no_text_found_count",
             "pdf_error_unsupported_format_count",
             "pdf_error_processing_count", "pdf_total_errors", "n_docs"]
        )
        assert sums["sum(pdf_attempts)"] == (
            sums["sum(pdf_successes)"]
            + sums["sum(pdf_no_text_found_count)"]
            + sums["sum(pdf_total_errors)"]
        )
        assert sums["sum(pdf_total_errors)"] == (
            sums["sum(pdf_error_unsupported_format_count)"]
            + sums["sum(pdf_error_processing_count)"]
        )
        assert sums["sum(pdf_attempts)"] <= sums["sum(n_docs)"]
        assert sums["sum(pdf_successes)"] > 0

    def test_reading_order_end_to_end(self):
        # doc 5 ref 0: r=(5*5)%8=1 → object success, 3 blocks emitted
        # reversed; page=k%2, y=k → sorted k order 0,2,1.
        row = [
            r for r in self._pipeline().take_all()
            if r["url"].endswith("/docs/5")
        ][0]
        assert row["pdf_text"] == (
            "pg0 blk0 doc 5 pg0 blk2 doc 5 pg1 blk1 doc 5"
        )

    def test_actor_pool_equals_fused(self):
        cols = ["url", "pdf_text", "pdf_attempts", "pdf_successes",
                "pdf_blocks_total"]
        fused = (
            self._pipeline(pdf_use_actor_pool=False)
            .select_columns(cols).to_pandas()
            .sort_values("url", ignore_index=True)
        )
        pooled = (
            self._pipeline(pdf_use_actor_pool=True, pdf_concurrency=2)
            .select_columns(cols).to_pandas()
            .sort_values("url", ignore_index=True)
        )
        assert fused.equals(pooled)

    def test_empty_pdf_columns_schema(self):
        batch = pa.table({"url": ["u"], "docs": [[]]})
        out = empty_pdf_columns(batch)
        stage_out = PdfStage()(
            pa.table({"url": ["u"], "docs": pa.array(
                [[]],
                pa.list_(pa.struct([
                    ("doc_url", pa.string()), ("src", pa.string()),
                    ("mime", pa.string()), ("payload_kind", pa.string()),
                ])),
            )})
        )
        assert out.schema.names == stage_out.schema.names
        # compare only the APPENDED pdf columns (the input `docs` column
        # differs by construction: [] infers list<null> in the plain table)
        appended = [f for f in out.schema if f.name not in ("url", "docs")]
        appended_stage = [
            f for f in stage_out.schema if f.name not in ("url", "docs")
        ]
        assert [(f.name, f.type) for f in appended] == [
            (f.name, f.type) for f in appended_stage
        ]
