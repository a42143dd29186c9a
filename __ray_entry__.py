"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline at sf0.001;
``queries()`` exposes every implemented operator (SURVEY.md §2 +
training-data ops) as sf_dir-parameterized callables; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query.

The extraction queries run over a `pages` table synthesized
deterministically from ``documents.parquet`` (the generation rules in
``web_mass_scraper_ocr_ray/sources/pages.py`` are a public contract);
each oracle recomputes the expected output from `documents` through
those same rules, giving an independent cross-check of the whole
parse → clean → OCR path.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from web_mass_scraper_ocr_ray import PipelineConfig, build_pipeline
    from web_mass_scraper_ocr_ray.sources.pages import synth_pages_dataset

    pages = synth_pages_dataset("/root/testdata/sf0.001")
    return build_pipeline(pages, PipelineConfig())


def queries() -> dict[str, Callable[[str], Any]]:
    from web_mass_scraper_ocr_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


# Shared CTEs mirroring the synthesis contract in sources/pages.py:
#   ext  — per-doc url/hostname/extracted-text (what the DOM walk +
#          clean_text must produce, recomputed directly from documents)
#   imgs — one row per synthesized <img>, r = payload class
_EXT_CTE = """
ext AS (
  SELECT doc_id,
         'https://www.host' || lpad(CAST(doc_id % 50 AS VARCHAR), 3, '0')
           || '.example.com/docs/' || doc_id AS url,
         'www_host' || lpad(CAST(doc_id % 50 AS VARCHAR), 3, '0')
           || '_example_com' AS hostname,
         'Doc ' || doc_id || ' '
           || trim(regexp_replace(text, '\\s+', ' ', 'g'))
           || ' footer ' || doc_id AS text
  FROM documents
)
"""

_IMGS_CTE = """
imgs AS (
  SELECT d.doc_id, u.i, (d.doc_id * 7 + u.i * 3) % 10 AS r
  FROM documents d, unnest(range(d.doc_id % 4)) AS u(i)
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "extract_text": f"""
WITH {_EXT_CTE}
SELECT url, hostname, text,
  CAST(length(text) AS BIGINT) AS text_length,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS word_count,
  CAST(1 AS BIGINT) AS paragraph_count,
  CAST(doc_id % 4 AS BIGINT) AS n_images,
  'completed' AS status
FROM ext
""",
        "hostname_rollup": f"""
WITH {_EXT_CTE}, {_IMGS_CTE},
succ AS (
  SELECT doc_id, count(*) FILTER (r >= 5) AS s FROM imgs GROUP BY doc_id
)
SELECT hostname,
  CAST(count(*) AS BIGINT) AS pages,
  CAST(sum(length(text)) AS BIGINT) AS sum_text_length,
  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
    AS sum_word_count,
  CAST(sum(e.doc_id % 4) AS BIGINT) AS sum_images,
  CAST(sum(coalesce(s.s, 0)) AS BIGINT) AS sum_ocr_successes
FROM ext e LEFT JOIN succ s ON e.doc_id = s.doc_id
GROUP BY hostname
""",
        "session_summary": f"""
WITH {_EXT_CTE}, {_IMGS_CTE}
SELECT
  CAST((SELECT count(*) FROM documents) AS BIGINT) AS urls_total,
  CAST((SELECT count(*) FROM documents) AS BIGINT) AS urls_successful,
  CAST(0 AS BIGINT) AS urls_failed,
  CAST((SELECT count(*) FROM imgs WHERE r <> 0) AS BIGINT)
    AS total_images_ocr_attempted,
  CAST((SELECT count(*) FROM imgs WHERE r >= 5) AS BIGINT)
    AS total_ocr_successful_extraction,
  CAST((SELECT count(*) FROM imgs WHERE r = 3) AS BIGINT)
    AS total_ocr_no_text_found,
  CAST((SELECT count(*) FROM imgs WHERE r IN (2, 4)) AS BIGINT)
    AS total_ocr_errors_unsupported_format,
  CAST((SELECT count(*) FROM imgs WHERE r = 1) AS BIGINT)
    AS total_ocr_errors_processing,
  CAST(0 AS BIGINT) AS total_ocr_errors_file_not_found,
  CAST(0 AS BIGINT) AS total_ocr_errors_tesseract,
  CAST((SELECT count(*) FROM imgs WHERE r IN (1, 2, 4)) AS BIGINT)
    AS total_ocr_errors_sum,
  CAST((SELECT sum(length(text)) FROM ext) AS BIGINT) AS total_text_length,
  CAST((SELECT sum(length(text) - length(replace(text, ' ', '')) + 1)
        FROM ext) AS BIGINT) AS total_word_count
""",
        "validate_urls": """
SELECT doc_id,
  CAST(doc_id % 8 AS BIGINT) AS url_family,
  doc_id % 8 = 0 AS valid
FROM documents
""",
        "top_pages": f"""
WITH {_EXT_CTE}
SELECT url, CAST(length(text) AS BIGINT) AS text_length
FROM ext ORDER BY text_length DESC, url ASC LIMIT 20
""",
        "dedup_exact_pages": f"""
WITH {_EXT_CTE}
SELECT url,
  CAST(epoch_us(TIMESTAMP '2024-01-01' + to_seconds(doc_id)) AS BIGINT)
    AS first_ts_us,
  CAST(CASE WHEN doc_id % 10 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_copies
FROM ext
""",
        "resume_filter": f"""
WITH {_EXT_CTE}
SELECT url FROM ext WHERE doc_id % 3 <> 0
""",
        "images_enum": f"""
WITH {_EXT_CTE}, {_IMGS_CTE},
rc AS (
  SELECT doc_id,
         count(*) FILTER (r = 0) AS n_remote,
         count(*) FILTER (r <> 0) AS n_data
  FROM imgs GROUP BY doc_id
)
SELECT e.url,
  CAST(e.doc_id % 4 AS BIGINT) AS n_images,
  CAST(coalesce(rc.n_data, 0) AS BIGINT) AS n_data,
  CAST(coalesce(rc.n_remote, 0) AS BIGINT) AS n_remote
FROM ext e LEFT JOIN rc ON e.doc_id = rc.doc_id
""",
        "ocr_rollup": f"""
WITH {_EXT_CTE}, {_IMGS_CTE},
agg AS (
  SELECT doc_id,
    count(*) FILTER (r <> 0) AS attempts,
    count(*) FILTER (r >= 5) AS successes,
    count(*) FILTER (r = 3) AS no_text,
    count(*) FILTER (r IN (2, 4)) AS unsup,
    count(*) FILTER (r = 1) AS proc,
    coalesce(string_agg('img ' || i || ' of doc ' || doc_id,
                        chr(10) || chr(10) ORDER BY i) FILTER (r >= 5),
             '') AS ttext
  FROM imgs GROUP BY doc_id
)
SELECT e.url,
  CAST(coalesce(a.attempts, 0) AS BIGINT) AS ocr_attempts,
  CAST(coalesce(a.successes, 0) AS BIGINT) AS ocr_successes,
  CAST(coalesce(a.no_text, 0) AS BIGINT) AS ocr_no_text_found_count,
  CAST(coalesce(a.unsup, 0) AS BIGINT) AS ocr_error_unsupported_format_count,
  CAST(coalesce(a.proc, 0) AS BIGINT) AS ocr_error_processing_count,
  CAST(coalesce(a.unsup, 0) + coalesce(a.proc, 0) AS BIGINT)
    AS ocr_total_errors,
  coalesce(a.ttext, '') AS total_ocr_text
FROM ext e LEFT JOIN agg a ON e.doc_id = a.doc_id
""",
        "company_join": f"""
WITH {_EXT_CTE}
SELECT e.doc_id, e.url, c.c_name
FROM ext e JOIN customer c
  ON c.c_custkey = e.doc_id % (SELECT count(*) FROM customer)
                   + (SELECT min(c_custkey) FROM customer)
""",
        "doc_token_count": """
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS bpe_tokens
FROM documents
""",
        "doc_quality": """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_actual,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS token_count,
  CAST(len(list_filter(string_split(text, ' '),
           x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
    AS stopword_count,
  CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS punct_count,
  CAST(length(replace(text, ' ', '')) AS BIGINT) AS alpha_len
FROM documents
""",
        "doc_size_histogram": """
SELECT CAST(floor(log2(n_chars)) AS BIGINT) AS log2_bucket,
  CAST(count(*) AS BIGINT) AS n_pages,
  CAST(sum(n_chars) AS BIGINT) AS sum_bytes
FROM documents GROUP BY 1
""",
        "dedup_exact_rows": """
SELECT doc_id, md5(text) AS text_hash, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
""",
        "dedup_exact_docs": """
SELECT md5(text) AS text_hash,
  CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
  CAST(count(*) AS BIGINT) AS dup_count
FROM documents GROUP BY md5(text)
""",
        "knn_bruteforce": """
WITH s AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS cos
  FROM embeddings q, embeddings e
  WHERE q.vec_id IN (0, 1, 2, 3, 4) AND e.vec_id <> q.vec_id
)
SELECT query_id,
  CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id ASC) AS BIGINT)
    AS rank,
  neighbor_id
FROM s
QUALIFY rank <= 5
""",
        "embedding_neardup": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
""",
        "ordered_range": f"""
WITH {_EXT_CTE}
SELECT url, TIMESTAMP '2024-01-01' + to_seconds(doc_id) AS warc_ts
FROM ext ORDER BY warc_ts, url LIMIT 30 OFFSET 10
""",
        "lang_distribution": """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
""",
        "source_rollup": """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source
""",
        "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_qty_centi,
  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_price_centi
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "order_customer_join": """
SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
    AS sum_price_centi
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY coalesce(c.c_mktsegment, 'UNKNOWN')
""",
        "events_tumbling": """
SELECT user_id,
  date_trunc('hour', ts) AS window_start,
  CAST(count(*) AS BIGINT) AS n_events,
  min(value) AS min_value,
  max(value) AS max_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
""",
        "events_sliding": """
WITH ev AS (
  SELECT user_id, value,
    time_bucket(INTERVAL 30 MINUTE, ts) AS w0
  FROM events
),
expanded AS (
  SELECT user_id, value, w0 AS window_start FROM ev
  UNION ALL
  SELECT user_id, value, w0 - INTERVAL 30 MINUTE AS window_start FROM ev
)
SELECT user_id, window_start,
  CAST(count(*) AS BIGINT) AS n_events,
  min(value) AS min_value,
  max(value) AS max_value
FROM expanded GROUP BY user_id, window_start
""",
        "events_sessionize": """
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL 12 HOUR
         THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts,
    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM o
)
SELECT user_id, session_id,
  CAST(count(*) AS BIGINT) AS n_events,
  min(ts) AS start_ts,
  max(ts) AS end_ts
FROM s GROUP BY user_id, session_id
""",
        "top_events_per_user": """
SELECT user_id,
  CAST(row_number() OVER (PARTITION BY user_id
                          ORDER BY value DESC, event_id ASC) AS BIGINT)
    AS rank,
  event_id
FROM events
QUALIFY rank <= 3
""",
        # doc_langid, doc_fingerprint, dedup_minhash, dedup_ngram_jaccard,
        # dedup_simhash, knn_lsh, multimodal_decode: not SQL-expressible
        # (heuristic models / signature algorithms / stub decoding) —
        # driver records the weaker rows-only check; invariants are
        # asserted in tests/ instead.
    }
