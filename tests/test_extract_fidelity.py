"""Rendered-CSS extraction fidelity — the r3-verdict divergence bound.

The reference extracts Playwright's ``body.inner_text()`` of a RENDERED
page (``/root/reference/src/scraper_app/scraper.py:208-215``), which
honors the full CSS cascade including external stylesheets. This engine
has no browser; these fixtures quantify exactly where that matters.

Each fixture is a realistic page shape (cookie banner, nav boilerplate,
GDPR modal, responsive-hide classes, tracking noscript) with a
HAND-AUTHORED rendered-text oracle: the text a desktop browser's
``inner_text`` → ``clean_text`` would produce. Three measured claims:

1. **With crawled CSS assets supplied** (``css_resolver`` /
   ``CssAwareExtract`` broadcast map): byte-identical on every fixture
   — external hide-rules in the supported selector subset close the
   gap.
2. **Without CSS assets**: divergence is strictly OVER-inclusive — the
   rendered text is always a token-subsequence of the extracted text
   (boilerplate leaks IN; content never leaks OUT). The measured
   divergence rate is pinned here and published in COVERAGE.md.
3. Both extractor implementations agree on every fixture (the M4
   equality contract).
"""

import pytest

from web_mass_scraper_ocr_ray.functions.htmlfast import (
    extract_visible_text_fast,
)
from web_mass_scraper_ocr_ray.functions.htmltext import (
    extract_visible_text,
)

# (name, html, external_css {href: text}, rendered_text_desktop)
FIXTURES = [
    (
        "cookie_banner_external",
        b"""<html><head>
<link rel="stylesheet" href="/assets/site.css">
</head><body>
<div class="cookie-consent">We use cookies. Accept Decline</div>
<nav>Home Products About</nav>
<main><h1>Acme GmbH</h1><p>Industrial fasteners since 1952.</p></main>
<footer>Imprint Privacy</footer>
</body></html>""",
        {"/assets/site.css":
         ".cookie-consent{display:none}\n.sr-only{position:absolute}"},
        "Home Products About Acme GmbH Industrial fasteners since 1952. "
        "Imprint Privacy",
    ),
    (
        "gdpr_modal_by_id",
        b"""<html><head><link rel=stylesheet href="theme.css"></head><body>
<div id="gdpr-modal"><h2>Your privacy</h2><p>Manage preferences</p></div>
<article><p>Quarterly results exceeded expectations.</p></article>
</body></html>""",
        {"theme.css": "#gdpr-modal{display:none;position:fixed}"},
        "Quarterly results exceeded expectations.",
    ),
    (
        "responsive_mobile_menu",
        b"""<html><head><link rel="stylesheet" href="/css/app.css"></head>
<body>
<div class="mobile-menu">Menu Home Contact</div>
<div class="desktop-nav">Home Contact Careers</div>
<p>Welcome to our storefront.</p>
</body></html>""",
        # desktop render: .mobile-menu hidden unconditionally, and the
        # max-width @media rule does NOT apply at desktop width
        {"/css/app.css":
         ".mobile-menu{display:none}"
         "@media (max-width:768px){.desktop-nav{display:none}"
         ".mobile-menu{display:block}}"},
        "Home Contact Careers Welcome to our storefront.",
    ),
    (
        "compound_promo",
        b"""<html><head><link rel="stylesheet" href="a.css"></head><body>
<div class="promo banner">SALE ends Sunday!</div>
<div class="banner">Breaking: new office opened.</div>
<p>Company history below.</p>
</body></html>""",
        {"a.css": "div.promo.banner{display:none}"},
        "Breaking: new office opened. Company history below.",
    ),
    (
        "descendant_footer_legal",
        b"""<html><head><link rel="stylesheet" href="/f.css"></head><body>
<main><p>Product documentation.</p></main>
<footer>Contact us
<div class="legal">Registered in Delaware. VAT DE999999999.</div>
</footer>
<div class="legal">Terms apply.</div>
</body></html>""",
        {"/f.css": "footer .legal{display:none}"},
        "Product documentation. Contact us Terms apply.",
    ),
    (
        "noscript_tracking",
        b"""<html><body>
<noscript><img src="https://t.example/px.gif">Enable JavaScript to
continue</noscript>
<p>Main article text.</p>
</body></html>""",
        {},
        "Main article text.",
    ),
    (
        "inline_hidden_no_css",
        b"""<html><body>
<div style="display:none">draft copy - do not publish</div>
<div hidden>feature flag stub</div>
<p>Published announcement.</p>
</body></html>""",
        {},
        "Published announcement.",
    ),
    (
        "same_doc_style_tag_hide",
        b"""<html><head><style>aside{display:none}
.ad-slot{display:none}</style></head><body>
<aside>Related links sidebar</aside>
<div class="ad-slot">Advertisement</div>
<section><p>Editorial content.</p></section>
</body></html>""",
        {},
        "Editorial content.",
    ),
    (
        "skiplink_sr_only_stays",
        # screen-reader-only text is positioned off-screen, NOT
        # display:none — inner_text still includes it (documented
        # browser behavior); the extractor must keep it too
        b"""<html><head><link rel="stylesheet" href="sr.css"></head><body>
<a class="skip-link" href="#main">Skip to content</a>
<main id="main"><p>Landing page copy.</p></main>
</body></html>""",
        {"sr.css": ".skip-link{position:absolute;left:-9999px}"},
        "Skip to content Landing page copy.",
    ),
    (
        "broken_css_survives",
        b"""<html><head><link rel="stylesheet" href="b.css"></head><body>
<div class="x">kept despite broken sheet</div>
</body></html>""",
        {"b.css": "@import url(x);}} .y{display:none;;{ garbage"},
        "kept despite broken sheet",
    ),
    (
        "visibility_hidden_placeholder",
        b"""<html><head><link rel="stylesheet" href="v.css"></head><body>
<span class="spinner">Loading...</span>
<p>Dashboard summary.</p>
</body></html>""",
        {"v.css": ".spinner{visibility:hidden}"},
        "Dashboard summary.",
    ),
    (
        "not_selector_hides",
        # :not() joined the supported subset in r5 — the undismissed
        # banner is hidden exactly as a browser renders it, while a
        # .banner.dismissed element would NOT match the rule.
        b"""<html><head><link rel="stylesheet" href="p.css"></head><body>
<div class="banner">Subscribe to our newsletter</div>
<div class="banner dismissed">Old banner kept visible</div>
<p>Article body.</p>
</body></html>""",
        {"p.css": ".banner:not(.dismissed){display:none}"},
        "Old banner kept visible Article body.",
    ),
    (
        "attr_selector_under_hides",
        # attribute selectors stay outside the supported subset →
        # rule skipped → the promo STAYS (under-hiding; a browser
        # would hide it). Pins the documented residual gap.
        b"""<html><head><link rel="stylesheet" href="q.css"></head><body>
<div class="promo" data-variant="b">Limited offer</div>
<p>Article body.</p>
</body></html>""",
        {"q.css": '.promo[data-variant="b"]{display:none}'},
        "Article body.",
    ),
]

# fixtures whose hide-rules live ONLY in external css (diverge when the
# resolver is absent); the rest are resolver-independent
_NEEDS_CSS = {
    "cookie_banner_external", "gdpr_modal_by_id", "responsive_mobile_menu",
    "compound_promo", "descendant_footer_legal",
    "visibility_hidden_placeholder", "not_selector_hides",
}
# documented residual gap even with assets: unsupported selector syntax
_RESIDUAL = {"attr_selector_under_hides"}


def _tokens_subsequence(needle: str, haystack: str) -> bool:
    """needle's tokens appear in order within haystack's tokens."""
    hay = haystack.split()
    it = iter(hay)
    return all(tok in it for tok in needle.split())


class TestRenderFidelity:
    def test_with_css_assets_byte_identical(self):
        """Claim 1: resolver supplied → rendered-text oracle matched
        byte-for-byte on every fixture in the supported subset."""
        for name, html, css, rendered in FIXTURES:
            if name in _RESIDUAL:
                continue
            got = extract_visible_text_fast(html, css_resolver=css.get).text
            assert got == rendered, name

    def test_residual_gap_is_over_inclusive(self):
        """Unsupported selector syntax under-hides (never over-hides)."""
        for name, html, css, rendered in FIXTURES:
            if name not in _RESIDUAL:
                continue
            got = extract_visible_text_fast(html, css_resolver=css.get).text
            assert got != rendered, name
            assert _tokens_subsequence(rendered, got), name

    def test_without_css_over_inclusion_only(self):
        """Claim 2: no resolver → rendered text is always a
        token-subsequence of the extracted text (content never lost)."""
        for name, html, css, rendered in FIXTURES:
            got = extract_visible_text_fast(html).text
            assert _tokens_subsequence(rendered, got), name

    def test_divergence_rate_pinned(self):
        """The published bound (COVERAGE.md): without crawled CSS,
        exactly the external-rule fixtures diverge; with it, only the
        unsupported-syntax residual does."""
        no_css = {
            name
            for name, html, css, rendered in FIXTURES
            if extract_visible_text_fast(html).text != rendered
        }
        assert no_css == _NEEDS_CSS | _RESIDUAL
        with_css = {
            name
            for name, html, css, rendered in FIXTURES
            if extract_visible_text_fast(
                html, css_resolver=css.get).text != rendered
        }
        assert with_css == _RESIDUAL

    def test_implementations_agree(self):
        """Claim 3: M4 equality holds on every fixture, both modes."""
        for name, html, css, rendered in FIXTURES:
            for resolver in (None, css.get):
                r = extract_visible_text(html, css_resolver=resolver)
                f = extract_visible_text_fast(html, css_resolver=resolver)
                assert r.text == f.text, name
                assert r.images == f.images, name


class TestCssAwareExtractStage:
    def test_broadcast_map_through_pipeline(self, ray_session):
        """CssAwareExtract: ray.put the css map once, resolve per actor."""
        import ray
        import ray.data as rd
        import pyarrow as pa

        from web_mass_scraper_ocr_ray.stages.extract import CssAwareExtract

        name, html, css, rendered = FIXTURES[0]
        pages = pa.table({
            "url": pa.array(
                [f"http://www.fix-{i}.de/p" for i in range(8)], pa.string()),
            "warc_ts": pa.array([0] * 8, pa.timestamp("us")),
            "html": pa.array([html] * 8, pa.binary()),
        })
        css_ref = ray.put(css)
        out = (
            rd.from_arrow(pages)
            .map_batches(
                CssAwareExtract,
                fn_constructor_kwargs={"css_map": css_ref},
                batch_format="pyarrow",
                concurrency=2,
            )
            .take_all()
        )
        assert len(out) == 8
        assert all(row["text"] == rendered for row in out)

    def test_plain_dict_accepted(self):
        import pyarrow as pa

        from web_mass_scraper_ocr_ray.stages.extract import CssAwareExtract

        name, html, css, rendered = FIXTURES[1]
        batch = pa.table({
            "url": pa.array(["http://www.fix-0.de/p"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([html], pa.binary()),
        })
        out = CssAwareExtract(css_map=css)(batch)
        assert out.column("text").to_pylist() == [rendered]
