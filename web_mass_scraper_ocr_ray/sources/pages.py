"""Pages input table — readers + deterministic synthesis (M0).

The engine's primary source is the Common-Crawl-style Parquet table
(BASELINE.json ``input_hint``)::

    pages: url string, warc_ts timestamp[us], html binary,
           text string, lang string

replacing the reference's Postgres URL source (db_utils.py:33-74) and
live Playwright fetch (scraper.py:174-205).

Since the driver's testdata has no ``pages`` table, we synthesize one
deterministically from ``documents.parquet`` (FIXTURES.md §5): every
derived field is a pure function of ``doc_id`` and ``text``, so a DuckDB
SQL oracle over ``documents`` can independently recompute the expected
extraction output (the correctness gate's cross-check). The generation
rules below are therefore a *public contract* — the SQL in
``__ray_entry__.oracle_sql()`` mirrors them clause for clause.

Synthesis contract (doc_id = d, text = t):
  - url       = https://www.host{d%50:03d}.example.com/docs/{d}
  - hostname  = www_host{d%50:03d}_example_com   (normalize_hostname)
  - warc_ts   = 2024-01-01T00:00:00 + d seconds  (no wall clock — §7.4.2)
  - extracted = "Doc {d} " + collapse(t) + " footer {d}"
  - n_images  = d % 4; image i's payload class r = (d*7 + i*3) % 10:
      r=0 remote /img/{d}_{i}.png           → failed download (offline)
      r=1 data:image/png, empty payload     → error_processing
      r=2 data:image/svg+xml                → error_unsupported_format
      r=3 data:image/png STUB1: (empty)     → no_text_found
      r=4 data:image/png corrupt bytes      → error_unsupported_format
      r≥5 data:image/png STUB1:"img {i} of doc {d}" → success
  - the page also carries a <script>, <style>, a display:none div and a
    <head> block that must NOT appear in the extraction (skip-tag and
    hidden-element behavior is exercised on every single page).
"""

from __future__ import annotations

import base64
import datetime as _dt
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

N_HOSTS = 50
_EPOCH = _dt.datetime(2024, 1, 1)

_PAGE_TEMPLATE = (
    '<html><head><title>Doc {d}</title><style>.x{{color:#000}}</style>'
    '<script>var q = "NOT VISIBLE";</script></head>\n'
    "<body>\n"
    "<h1>Doc {d}</h1>\n"
    '<div id="content"><p>{text}</p></div>\n'
    "{imgs}\n"
    '<div style="display:none">HIDDEN TEXT {d}</div>\n'
    "<footer>footer {d}</footer>\n"
    "</body></html>"
)


def page_url(doc_id: int) -> str:
    return f"https://www.host{doc_id % N_HOSTS:03d}.example.com/docs/{doc_id}"


_PAGE_URL_PREFIXES = None


def page_url_array(ids) -> "pa.Array":
    """Vectorized :func:`page_url` over an int array → pa.string().

    One take over the 50 precomputed host prefixes + one Arrow
    element-wise concat with the cast ids — replaces the
    ``[page_url(d) for d in ids]`` per-row stamp loops (r4 verdict
    action #4: no per-row Python in broadcast-stamp stages)."""
    import numpy as np
    import pyarrow.compute as _pc

    global _PAGE_URL_PREFIXES
    if _PAGE_URL_PREFIXES is None:
        _PAGE_URL_PREFIXES = pa.array(
            [f"https://www.host{h:03d}.example.com/docs/"
             for h in range(N_HOSTS)], pa.string())
    ids_np = np.asarray(ids, np.int64)
    pre = _pc.take(_PAGE_URL_PREFIXES, pa.array(ids_np % N_HOSTS))
    return _pc.binary_join_element_wise(
        pre, _pc.cast(pa.array(ids_np), pa.string()), "")


def page_warc_ts(doc_id: int) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(seconds=int(doc_id))


def _b64(payload: bytes) -> str:
    return base64.b64encode(payload).decode("ascii")


def image_src(doc_id: int, i: int) -> str:
    r = (doc_id * 7 + i * 3) % 10
    if r == 0:
        return f"/img/{doc_id}_{i}.png"
    if r == 1:
        return "data:image/png;base64,"
    if r == 2:
        return "data:image/svg+xml;base64," + _b64(b"<svg/>")
    if r == 3:
        return "data:image/png;base64," + _b64(b"STUB1:")
    if r == 4:
        return "data:image/png;base64," + _b64(b"\x89PNG-not-really-a-png")
    return "data:image/png;base64," + _b64(
        f"STUB1:img {i} of doc {doc_id}".encode("utf-8")
    )


def page_html(doc_id: int, text: str) -> bytes:
    imgs = "".join(
        f'<img src="{image_src(doc_id, i)}"/>' for i in range(doc_id % 4)
    )
    return _PAGE_TEMPLATE.format(d=doc_id, text=text, imgs=imgs).encode("utf-8")


# --- boilerplate corpus (main-content extraction fixture family) ----------
#
# A second deterministic page family for the boilerplate-strip operator
# (functions/maincontent.py). Every block's fate is a pure function of
# doc_id, so the DuckDB oracle recomputes main_text AND the per-reason
# drop counts clause-for-clause:
#
#   fixed blocks per page:
#     nav text            -> blocklist_tag   (header>nav ancestors)
#     breadcrumb div      -> blocklist_class ("breadcrumb" token)
#     h1 "Doc {d}"        -> kept            (heading keeps short blocks)
#     <p>{text}</p>       -> kept if len(collapse(text)) >= 25
#                            else too_short (len>=1) / absent (empty)
#     aside promo p       -> blocklist_tag
#     footer p            -> blocklist_tag
#   conditional blocks:
#     d % 3 == 0: link-farm div (plain <div>, only anchors)
#                         -> link_density  (the only rule that catches it)
#     d % 2 == 0: div class="comment" with long plain text
#                         -> blocklist_class (the only rule that catches it)
#
# expected main_text = 'Doc {d}' [+ ' ' + collapse(text) if len >= 25]

_BP_TEMPLATE = (
    '<html><head><title>Doc {d}</title><style>.m{{margin:0}}</style>'
    '<script>var q = "NOT VISIBLE";</script></head>\n'
    "<body>\n"
    '<header><nav><a href="/">Home</a> <a href="/docs">Docs</a>{nav}</nav></header>\n'
    '<div class="breadcrumb"><a href="/">Home</a> &gt; '
    '<a href="/docs">Docs</a> &gt; Doc {d}</div>\n'
    '<main id="content">\n'
    "<h1>Doc {d}</h1>\n"
    "<p>{text}</p>\n"
    "</main>\n"
    "{linkfarm}"
    "{comment}"
    '<aside class="sidebar"><p>Subscribe to newsletter {d} for more '
    "updates today</p></aside>\n"
    "<footer><p>Copyright {d} Example Corp - all rights reserved</p></footer>\n"
    "</body></html>"
)

_BP_LINKFARM = (
    '<div><a href="/r/1">Read more one</a> <a href="/r/2">Read more two</a> '
    '<a href="/r/3">Read more three</a></div>\n'
)


def boilerplate_page_html(doc_id: int, text: str) -> bytes:
    nav = "".join(
        f' <a href="/p/{j}">Nav item {j}</a>' for j in range(doc_id % 4)
    )
    linkfarm = _BP_LINKFARM if doc_id % 3 == 0 else ""
    comment = (
        f'<div class="comment">Great long comment number {doc_id} with '
        "plenty of visible characters</div>\n"
        if doc_id % 2 == 0
        else ""
    )
    return _BP_TEMPLATE.format(
        d=doc_id, text=text, nav=nav, linkfarm=linkfarm, comment=comment
    ).encode("utf-8")


def synth_boilerplate_pages_table(sf_dir: str) -> pa.Table:
    """documents.parquet → deterministic boilerplate `pages` table
    (same schema as synth_pages_table)."""
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    return pa.table(
        {
            "url": pa.array([page_url(d) for d in doc_ids], pa.string()),
            "warc_ts": pa.array(
                [page_warc_ts(d) for d in doc_ids], pa.timestamp("us")
            ),
            "html": pa.array(
                [boilerplate_page_html(d, t) for d, t in zip(doc_ids, texts)],
                pa.binary(),
            ),
            "text": docs.column("text"),
            "lang": docs.column("lang"),
        }
    )


def synth_boilerplate_pages_dataset(sf_dir: str):
    import ray.data as rd

    tbl = synth_boilerplate_pages_table(sf_dir)
    n_blocks = max(4, min(16, tbl.num_rows // 64))
    return rd.from_arrow(tbl).repartition(n_blocks)


# --- PDF-payload corpus (embedded-document routing fixture family) --------
#
# Third deterministic page family: the standard page plus d % 3 embedded
# document refs (<embed>/<object> — north_star PDF routing). Ref j's
# fate is r = (d*5 + j*7) % 8, a pure function of (doc_id, j), so the
# DuckDB oracle recomputes every status counter AND the layout-ordered
# pdf text clause-for-clause:
#
#   r=0  remote <object data="https://…/{d}_{j}.pdf">  → failed (offline)
#   r=1  <object> stub data-URL, valid blocks          → success
#   r=2  data:application/pdf, REAL %PDF bytes         → error_unsupported_format
#        (the real-engine seam path: stub engine owns only %PDF-STUB)
#   r=3  data:text/plain payload                       → error_unsupported_format
#   r=4  stub magic, zero blocks                       → no_text_found
#   r=5  stub magic, malformed block line              → error_processing
#   r=6,7  <embed> stub data-URL, valid blocks         → success
#
# Success payloads carry n_blocks = 1 + (d+j) % 3 blocks EMITTED IN
# REVERSED k order with page=k%2, y=k, x=7 and text
# "pg{k%2} blk{k} doc {d}" — the engine must re-sort by (page, y, x),
# so expected text = string_agg(..., ' ' ORDER BY k%2, k).

_PDF_STUB_MAGIC = b"%PDF-STUB\n"


def pdf_payload(doc_id: int, j: int) -> bytes:
    n_blocks = 1 + (doc_id + j) % 3
    lines = [
        f"{k % 2}|{k}|7|pg{k % 2} blk{k} doc {doc_id}"
        for k in reversed(range(n_blocks))
    ]
    return _PDF_STUB_MAGIC + "\n".join(lines).encode("utf-8")


def pdf_ref_html(doc_id: int, j: int) -> str:
    r = (doc_id * 5 + j * 7) % 8
    if r == 0:
        return (
            f'<object data="https://cdn.example.com/files/{doc_id}_{j}.pdf"'
            ' type="application/pdf"></object>'
        )
    if r == 1:
        return (
            f'<object data="data:application/pdf;base64,{_b64(pdf_payload(doc_id, j))}"'
            ' type="application/pdf"></object>'
        )
    if r == 2:
        return (
            '<embed src="data:application/pdf;base64,'
            + _b64(b"%PDF-1.7\n1 0 obj\nendobj")
            + '" type="application/pdf">'
        )
    if r == 3:
        return (
            '<embed src="data:text/plain;base64,' + _b64(b"not a pdf") + '">'
        )
    if r == 4:
        return (
            '<embed src="data:application/pdf;base64,'
            + _b64(_PDF_STUB_MAGIC) + '">'
        )
    if r == 5:
        return (
            '<embed src="data:application/pdf;base64,'
            + _b64(_PDF_STUB_MAGIC + b"garbage without pipes") + '">'
        )
    return (
        f'<embed src="data:application/pdf;base64,{_b64(pdf_payload(doc_id, j))}"'
        ' type="application/pdf">'
    )


def pdf_page_html(doc_id: int, text: str) -> bytes:
    """Standard page + the document-ref block (no visible-text change:
    <embed> is void and the <object> elements carry no fallback)."""
    base = _PAGE_TEMPLATE.format(
        d=doc_id, text=text,
        imgs="".join(
            f'<img src="{image_src(doc_id, i)}"/>' for i in range(doc_id % 4)
        ),
    )
    refs = "".join(pdf_ref_html(doc_id, j) for j in range(doc_id % 3))
    return base.replace("</body>", refs + "</body>").encode("utf-8")


def synth_pdf_pages_table(sf_dir: str) -> pa.Table:
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    return pa.table(
        {
            "url": pa.array([page_url(d) for d in doc_ids], pa.string()),
            "warc_ts": pa.array(
                [page_warc_ts(d) for d in doc_ids], pa.timestamp("us")
            ),
            "html": pa.array(
                [pdf_page_html(d, t) for d, t in zip(doc_ids, texts)],
                pa.binary(),
            ),
            "text": docs.column("text"),
            "lang": docs.column("lang"),
        }
    )


def synth_pdf_pages_dataset(sf_dir: str):
    import ray.data as rd

    tbl = synth_pdf_pages_table(sf_dir)
    n_blocks = max(4, min(16, tbl.num_rows // 64))
    return rd.from_arrow(tbl).repartition(n_blocks)


# Bad-URL families for the validator query (utils.py:32-63 truth table).
# Family 0 is the only valid one; SQL oracle: valid ⇔ doc_id % 8 == 0.
def candidate_url(doc_id: int) -> str:
    fam = doc_id % 8
    base = page_url(doc_id)
    if fam == 0:
        return base
    if fam == 1:
        return f"www.host.example.com/docs/{doc_id}"          # no scheme
    if fam == 2:
        return f"ftp://www.host.example.com/docs/{doc_id}"    # bad scheme
    if fam == 3:
        return f"https://hostnamewithoutdot/docs/{doc_id}"    # no dot
    if fam == 4:
        return f"https://www.host.example.com/docs/{doc_id} x"  # space
    if fam == 5:
        return f"https://www.host.example.com/docs/{doc_id}/<b>"  # bad char
    if fam == 6:
        return "https://www.host.example.com/" + "a" * 2100   # too long
    return "https://a./x"                                      # short netloc


def synth_pages_table(sf_dir: str, with_dups: bool = False) -> pa.Table:
    """documents.parquet → deterministic `pages` Arrow table.

    ``with_dups`` appends an exact-duplicate row (same url, warc_ts+1h)
    for every doc with doc_id % 10 == 0 — the dup_url fixture family
    (FIXTURES.md §1) feeding dedup/resume queries (J2).
    """
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()

    urls, tss, htmls = [], [], []
    for d, t in zip(doc_ids, texts):
        urls.append(page_url(d))
        tss.append(page_warc_ts(d))
        htmls.append(page_html(d, t))

    out_urls = list(urls)
    out_tss = list(tss)
    out_htmls = list(htmls)
    out_texts = list(texts)
    out_langs = list(langs)
    if with_dups:
        for idx, d in enumerate(doc_ids):
            if d % 10 == 0:
                out_urls.append(urls[idx])
                out_tss.append(tss[idx] + _dt.timedelta(hours=1))
                out_htmls.append(htmls[idx])
                out_texts.append(texts[idx])
                out_langs.append(langs[idx])

    return pa.table(
        {
            "url": pa.array(out_urls, pa.string()),
            "warc_ts": pa.array(out_tss, pa.timestamp("us")),
            "html": pa.array(out_htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def link_page_html(doc_id: int, n_docs: int) -> bytes:
    """Deterministic page whose anchors form a web graph (FIXTURES.md).

    Per doc, in document order:
      * ``doc_id % 3 + 1`` internal links to ``page_url((doc_id*7 +
        j*13 + 1) % n_docs)`` — cross-host edges over the 50 synthetic
        hosts;
      * one relative ``/about/{doc_id}`` link (exercises M2 base-URL
        resolution, same-host edge);
      * every 7th doc one external ``https://ext{doc_id%5}.example.org``
        link (dst-only graph nodes, dangling for PageRank).
    The arithmetic is mirrored verbatim by the ``outlinks_enum`` /
    ``host_link_graph`` / ``pagerank_hosts`` DuckDB oracles.
    """
    parts = [
        f"<html><body><h1>Doc {doc_id}</h1>"
        f"<p>Links for doc {doc_id}</p>\n"
    ]
    for j in range(doc_id % 3 + 1):
        tgt = (doc_id * 7 + j * 13 + 1) % n_docs
        parts.append(f'<a href="{page_url(tgt)}">doc {tgt}</a>\n')
    parts.append(f'<a href="/about/{doc_id}">about</a>\n')
    if doc_id % 7 == 0:
        parts.append(
            f'<a href="https://ext{doc_id % 5}.example.org/r/{doc_id}">'
            "partner</a>\n"
        )
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def synth_link_pages_table(sf_dir: str) -> pa.Table:
    """documents.parquet → deterministic link-graph `pages` table
    (same schema as synth_pages_table)."""
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    n_docs = len(doc_ids)
    return pa.table(
        {
            "url": pa.array([page_url(d) for d in doc_ids], pa.string()),
            "warc_ts": pa.array(
                [page_warc_ts(d) for d in doc_ids], pa.timestamp("us")
            ),
            "html": pa.array(
                [link_page_html(d, n_docs) for d in doc_ids], pa.binary()
            ),
            "text": docs.column("text"),
            "lang": docs.column("lang"),
        }
    )


def synth_link_pages_dataset(sf_dir: str):
    import ray.data as rd

    tbl = synth_link_pages_table(sf_dir)
    n_blocks = max(4, min(16, tbl.num_rows // 64))
    return rd.from_arrow(tbl).repartition(n_blocks)


def synth_pages_dataset(sf_dir: str, with_dups: bool = False,
                        override_num_blocks: Optional[int] = None):
    """`pages` as a ray.data.Dataset (small scale: in-memory from_arrow).

    ``from_arrow`` of one table is ONE block — and every downstream
    map_batches/groupby inherits that (zero parallelism, observed in
    ds.stats() as '1 tasks used' end-to-end). Default to a modest split
    so the small-scale correctness corpus still exercises the parallel
    paths; production inputs are multi-file Parquet and split at the
    read."""
    import ray.data as rd

    tbl = synth_pages_table(sf_dir, with_dups=with_dups)
    n_blocks = override_num_blocks or max(4, min(16, tbl.num_rows // 64))
    return rd.from_arrow(tbl).repartition(n_blocks)


def read_pages(path, columns=None, **kwargs):
    """Primary production source: Parquet with column pruning (S3 analog
    of db_utils.py:33-74). Pass ``columns`` so only needed columns leave
    storage — at 100 TB reading `text`/`lang` for an extract-only run
    would double the scan."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kwargs)


def write_bench_corpus(sf_dir: str, out_dir: str, replication: int = 1) -> int:
    """Materialize a larger pages corpus as a DIRECTORY of Parquet files
    (one per replica) for benching.

    One file per replica matters: Ray assigns read tasks per file/row
    group, so a single giant file serializes the read (observed: 1 read
    task = 9.6s for 200k rows). A directory layout mirrors how a real
    100 TB corpus arrives — thousands of shards read in parallel.

    Replicas get distinct urls (replica k shifts doc_id by k*10^7 in
    the url only; html payload reused). Returns total rows.
    """
    import os

    base = synth_pages_table(sf_dir)
    n = base.num_rows
    os.makedirs(out_dir, exist_ok=True)
    for k in range(replication):
        if k == 0:
            tbl = base
        else:
            shift = k * 10_000_000
            urls = [page_url(d + shift) for d in range(n)]
            tbl = base.set_column(0, "url", pa.array(urls, pa.string()))
        pq.write_table(tbl, os.path.join(out_dir, f"part-{k:05d}.parquet"))
    return n * replication


def read_pages_jsonl(path, columns=None, **kwargs):
    """JSONL interchange source — the Common-Crawl-dump / curl-pipe
    format. Unlike Parquet, JSON cannot prune columns at the scan
    (every byte is read and parsed before projection), so this is the
    INGEST seam only; first step of any repeated pipeline should be a
    one-time convert to Parquet via :func:`read_pages`'s layout. The
    ``columns`` projection still drops data before it enters the
    object store."""
    import ray.data as rd

    ds = rd.read_json(path, **kwargs)
    if columns:
        ds = ds.select_columns(list(columns))

    def _restore(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        # JSON has no binary type: the html payload round-trips as a
        # string — cast back to the pages-schema binary contract.
        # (JSONL interchange therefore requires text-decodable html;
        # raw non-UTF-8 captures must travel as Parquet.)
        if "html" in t.column_names and _pa.types.is_string(
                t.schema.field("html").type):
            idx = t.column_names.index("html")
            t = t.set_column(idx, "html",
                             _pc.cast(t.column("html"), _pa.binary()))
        return t

    return ds.map_batches(_restore, batch_format="pyarrow")


def write_pages_jsonl(ds, path, **kwargs):
    """JSONL interchange sink (one file per block, like the Parquet
    writer — resumable/parallel layout)."""
    return ds.write_json(path, **kwargs)
