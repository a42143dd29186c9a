"""Main-content / boilerplate-strip operator (functions/maincontent.py,
stages/maincontent.py).

Fixture families: one per drop reason (each caught ONLY by its own
rule), visibility/raw-container parity with the extract kernel, the
heading keep-rule, token-boundary class matching, and a full-corpus
equality test against the synthesis contract that the DuckDB oracle
mirrors (sources/pages.py::_BP_TEMPLATE)."""

import re

import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.functions.maincontent import (
    Block,
    extract_main_content,
    score_block,
    segment_blocks,
)
from web_mass_scraper_ocr_ray.sources.pages import (
    boilerplate_page_html,
    synth_boilerplate_pages_table,
)
from web_mass_scraper_ocr_ray.stages.maincontent import (
    dom_features_batch,
    main_content_batch,
)

LONG = "This sentence is definitely longer than twenty-five characters."


def reasons(html: bytes):
    return [(b.tag, b.reason) for b in extract_main_content(html).blocks]


class TestScoring:
    def test_blocklist_tag_wins_over_everything(self):
        b = Block(text=LONG, link_text="", tag="p", depth=3, n_links=0,
                  heading=False, bl_tag=True, bl_class=True)
        assert score_block(b) == "blocklist_tag"

    def test_blocklist_class_before_density(self):
        b = Block(text="x" * 30, link_text="x" * 30, tag="div", depth=2,
                  n_links=3, heading=False, bl_tag=False, bl_class=True)
        assert score_block(b) == "blocklist_class"

    def test_link_density_boundary(self):
        # exactly 1/3 link text is kept; strictly more is dropped
        at = Block(text="x" * 30, link_text="x" * 10, tag="div", depth=1,
                   n_links=1, heading=False, bl_tag=False, bl_class=False)
        over = Block(text="x" * 30, link_text="x" * 11, tag="div", depth=1,
                     n_links=1, heading=False, bl_tag=False, bl_class=False)
        assert score_block(at) == "kept"
        assert score_block(over) == "link_density"

    def test_short_heading_kept_short_para_dropped(self):
        h = Block(text="Intro", link_text="", tag="h2", depth=2, n_links=0,
                  heading=True, bl_tag=False, bl_class=False)
        p = Block(text="Intro", link_text="", tag="p", depth=2, n_links=0,
                  heading=False, bl_tag=False, bl_class=False)
        assert score_block(h) == "kept"
        assert score_block(p) == "too_short"


class TestSegmentation:
    def test_each_rule_fires_alone(self):
        html = (
            f"<body><nav>{LONG}</nav>"
            f'<div class="sidebar">{LONG}</div>'
            f'<div><a href="/a">{LONG}</a></div>'
            f"<p>tiny</p><p>{LONG}</p></body>"
        ).encode()
        assert reasons(html) == [
            ("nav", "blocklist_tag"),
            ("div", "blocklist_class"),
            ("div", "link_density"),
            ("p", "too_short"),
            ("p", "kept"),
        ]

    def test_class_tokens_match_whole_tokens_only(self):
        # "site-footer" splits into {site, footer} -> hit;
        # "unadorned" must NOT hit on the "ad" substring.
        hit = f'<div class="site-footer">{LONG}</div>'.encode()
        miss = f'<div class="unadorned mainline">{LONG}</div>'.encode()
        assert reasons(hit) == [("div", "blocklist_class")]
        assert reasons(miss) == [("div", "kept")]

    def test_id_attribute_blocklisted(self):
        html = f'<div id="comments">{LONG}</div>'.encode()
        assert reasons(html) == [("div", "blocklist_class")]

    def test_blocklist_inherited_by_descendants(self):
        html = (
            f"<footer><div><p>{LONG}</p><p>{LONG}</p></div></footer>"
        ).encode()
        assert reasons(html) == [
            ("p", "blocklist_tag"), ("p", "blocklist_tag")
        ]

    def test_hidden_and_raw_subtrees_contribute_nothing(self):
        html = (
            f"<body><script>var x='{LONG}';</script>"
            f'<div style="display:none">{LONG}</div>'
            f"<div hidden>{LONG}</div>"
            f"<p>{LONG}</p></body>"
        ).encode()
        res = extract_main_content(html)
        assert res.text == LONG
        assert len(res.blocks) == 1

    def test_link_text_tracked_through_nesting(self):
        html = (
            f'<div><a href="/x"><b>Click</b> here now</a> {LONG}</div>'
        ).encode()
        (b,) = segment_blocks(html)
        assert b.link_text == "Click here now"
        assert b.n_links == 1
        assert b.text == f"Click here now {LONG}"

    def test_spans_index_into_main_text(self):
        html = f"<body><h1>Title here</h1><p>{LONG}</p></body>".encode()
        res = extract_main_content(html)
        assert [res.text[s.start:s.end] for s in res.spans] == \
            ["Title here", LONG]
        assert [s.path for s in res.spans] == ["h1", "p"]

    def test_empty_and_none_input(self):
        assert extract_main_content(b"").text == ""
        assert extract_main_content(None).text == ""
        assert segment_blocks(b"<div>   </div>") == []


class TestCorpusContract:
    """The synthesis contract the DuckDB oracle mirrors, asserted
    in-process over the full sf0.001 corpus."""

    @pytest.fixture(scope="class")
    def tbl(self):
        return synth_boilerplate_pages_table("/root/testdata/sf0.001")

    def test_main_text_equals_construction(self, tbl):
        htmls = tbl.column("html").to_pylist()
        texts = tbl.column("text").to_pylist()
        urls = tbl.column("url").to_pylist()
        for url, html, t in zip(urls, htmls, texts):
            d = int(url.rsplit("/", 1)[1])
            coll = re.sub(r"\s+", " ", t).strip()
            exp = f"Doc {d}" + (f" {coll}" if len(coll) >= 25 else "")
            assert extract_main_content(html).text == exp

    def test_batch_counters_sum(self, tbl):
        out = main_content_batch(tbl, with_spans=False)
        n = out.num_rows
        parts = [
            out.column(c).to_pylist()
            for c in ("n_kept", "n_drop_blocklist", "n_drop_linkdense",
                      "n_drop_short")
        ]
        total = out.column("n_blocks").to_pylist()
        for i in range(n):
            assert sum(p[i] for p in parts) == total[i]

    def test_feature_explosion_consistent(self, tbl):
        feats = dom_features_batch(tbl)
        summary = main_content_batch(tbl, with_spans=False)
        assert feats.num_rows == sum(summary.column("n_blocks").to_pylist())
        kept = feats.filter(
            pa.compute.equal(feats.column("reason"), "kept")
        ).num_rows
        assert kept == sum(summary.column("n_kept").to_pylist())


class TestStage:
    def test_dataset_stage(self, ray_session):
        from web_mass_scraper_ocr_ray.sources.pages import (
            synth_boilerplate_pages_dataset,
        )
        from web_mass_scraper_ocr_ray.stages.maincontent import (
            extract_main_content_ds,
        )

        ds = extract_main_content_ds(
            synth_boilerplate_pages_dataset("/root/testdata/sf0.001")
        )
        rows = ds.take(5)
        assert all(r["main_text"].startswith("Doc ") for r in rows)
        # spans reconstruct the text
        for r in rows:
            for s in r["spans"]:
                seg = r["main_text"][s["start"]:s["end"]]
                assert seg and seg == seg.strip()
