"""chunk_token_windows / oov_rate (stages/textstats.py) and
category_diversity (stages/shuffle.py) — edge-case contracts the
sf-corpus oracle gate can't exercise (empty docs, boundary ties,
single-token windows)."""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.stages.textstats import (
    chunk_token_windows,
    oov_rate,
)


@pytest.mark.usefixtures("ray_session")
class TestChunkTokenWindows:
    def _run(self, texts, ids=None, **kw):
        import ray.data as rd

        ids = ids or list(range(len(texts)))
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        return chunk_token_windows(ds, **kw).to_pandas() \
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    def test_overlap_and_short_tail(self):
        # 10 tokens, window 4, stride 3 → starts 0,3,6,9
        text = " ".join(f"t{i}" for i in range(10))
        out = self._run([text], window=4, stride=3)
        assert out["chunk_idx"].tolist() == [0, 1, 2, 3]
        assert out["n_chunk_toks"].tolist() == [4, 4, 4, 1]
        assert out["chunk_text"].tolist() == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"]

    def test_exact_multiple_no_empty_tail(self):
        # 6 tokens, window=stride=3 → exactly two full chunks, no
        # zero-token third chunk (start 6 is not < 6)
        out = self._run(["a b c d e f"], window=3, stride=3)
        assert out["n_chunk_toks"].tolist() == [3, 3]

    def test_empty_and_whitespace_docs_emit_nothing(self):
        out = self._run(["", "   ", "x"], window=4, stride=4)
        assert out["doc_id"].tolist() == [2]
        assert out["chunk_text"].tolist() == ["x"]

    def test_mixed_lengths_vectorized_per_index(self):
        texts = ["one", "a b c d e", " ".join(["w"] * 13)]
        out = self._run(texts, window=5, stride=5)
        per_doc = out.groupby("doc_id").size().to_dict()
        assert per_doc == {0: 1, 1: 1, 2: 3}
        # totals conserved: every token lands in exactly one chunk
        # when stride == window
        assert int(out["n_chunk_toks"].sum()) == 1 + 5 + 13

    def test_bad_params_raise(self):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["x"], pa.string()),
        }))
        with pytest.raises(ValueError):
            chunk_token_windows(ds, window=0, stride=1)
        with pytest.raises(ValueError):
            chunk_token_windows(ds, window=3, stride=0)


@pytest.mark.usefixtures("ray_session")
class TestOovRate:
    def test_top_m_boundary_tiebreak(self):
        """Vocab = top-2 by (count desc, word asc): 'b'(3), then the
        count-2 tie between 'a' and 'c' goes to 'a' — 'c' is OOV."""
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["b b a c", "b a c z"], pa.string()),
        }))
        out = oov_rate(ds, top_m=2).to_pandas().sort_values("doc_id")
        assert out["n_toks"].tolist() == [4, 4]
        assert out["n_oov"].tolist() == [1, 2]  # c | c z
        assert out["oov_bp"].tolist() == [2500, 5000]

    def test_zero_token_doc_dropped(self):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello world", "   "], pa.string()),
        }))
        out = oov_rate(ds, top_m=10).to_pandas()
        assert out["doc_id"].tolist() == [0]
        assert out["n_oov"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
class TestCategoryDiversity:
    def test_dominant_and_tiebreak(self):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.shuffle import (
            category_diversity,
        )

        t = pa.table({
            "src": ["s1"] * 4 + ["s2"] * 2,
            "lang": ["en", "en", "de", "fr", "zz", "aa"],
        })
        out = category_diversity(rd.from_arrow(t), "src", "lang") \
            .to_pandas().sort_values("src")
        assert out["n_rows"].tolist() == [4, 2]
        assert out["n_cats"].tolist() == [3, 2]
        # s2 ties 1-1 → lexicographically first category wins
        assert out["top_cat"].tolist() == ["en", "aa"]
        assert out["top_cat_bp"].tolist() == [5000, 5000]

    def test_partials_merge_across_blocks(self):
        """The same (key, cat) pair arriving from many blocks must
        merge to one global count."""
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.shuffle import (
            category_diversity,
        )

        tables = [
            pa.table({"src": ["h"] * 3, "lang": ["en", "en", "de"]})
            for _ in range(6)
        ]
        out = category_diversity(rd.from_arrow(tables), "src", "lang") \
            .to_pandas()
        assert len(out) == 1
        assert int(out["n_rows"].iloc[0]) == 18
        assert int(out["top_cat_bp"].iloc[0]) == 6666


class TestInvertedIndex:
    def test_df_exact_and_postings_capped(self, ray_session):
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import inverted_index

        # 'the' appears in all 30 docs (df=30 > cap), 'uniq<i>' in one
        docs = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": [f"the uniq{i} tail" for i in range(30)],
        })
        out = inverted_index(
            rd.from_arrow(docs).repartition(5), max_postings=10
        ).to_pandas().set_index("word")
        assert out.loc["the", "df"] == 30
        # postings capped at 10 smallest doc_ids, ascending
        assert out.loc["the", "postings"] == ",".join(map(str, range(10)))
        assert out.loc["uniq7", "df"] == 1
        assert out.loc["uniq7", "postings"] == "7"
        assert out.loc["tail", "df"] == 30
        # duplicate tokens within one doc count once toward df
        out2 = inverted_index(
            rd.from_arrow(pa.table({
                "doc_id": pa.array([1], pa.int64()),
                "text": ["x x x y"],
            })), max_postings=10).to_pandas().set_index("word")
        assert out2.loc["x", "df"] == 1


class TestGopherRules:
    def test_rule_semantics_per_document(self, ray_session):
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            gopher_rules_table)

        good = " ".join(
            "the data and pipeline have words of that size with care"
            .split() * 6)  # 60 tokens, mean len in range, stopwords
        too_short = "tiny doc with the and of stopwords here"
        symbols = " ".join(["###word..."] * 60)
        bullets = "\n".join(["- item the and"] * 10)
        nonalpha = " ".join(["123 456 789 0 ---"] * 12) + " the and"
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [good, too_short, symbols, bullets, nonalpha],
        })
        out = gopher_rules_table(
            rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        assert bool(out.loc[0, "keep"])
        assert not bool(out.loc[1, "r_word_count"])
        assert not bool(out.loc[2, "r_symbol_ratio"])
        assert int(out.loc[2, "n_symbols"]) == 240  # 180 hash marks + 60 ellipses
        assert not bool(out.loc[3, "r_bullet_lines"])
        assert int(out.loc[3, "n_bullet_lines"]) == 10
        assert not bool(out.loc[4, "r_alpha_words"])
        assert int(out.loc[0, "n_stop_present"]) >= 2
        # every rule false → keep false
        for d in (1, 2, 3, 4):
            assert not bool(out.loc[d, "keep"])


class TestC4Filters:
    def test_triggers_and_line_counts(self, ray_session):
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            c4_filters_table)

        clean = ("This is a fine sentence.\n"
                 "Another good one follows here!\n"
                 "And a third one, to pass the bar?")
        code = "function f() { return 1; }\nOk. Fine. Sure."
        lorem = "lorem ipsum dolor sit amet. One. Two. Three."
        js = "Enable javascript to view.\nReal content here. More. End."
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [clean, code, lorem, js],
        })
        out = c4_filters_table(
            rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        assert bool(out.loc[0, "keep"]) and int(out.loc[0, "n_lines"]) == 3
        assert int(out.loc[0, "n_terminal_lines"]) == 3
        assert not bool(out.loc[1, "keep"]) and bool(out.loc[1, "has_brace"])
        assert not bool(out.loc[2, "keep"]) and bool(out.loc[2, "has_lorem"])
        assert int(out.loc[3, "n_js_lines"]) == 1
        # short-line counter: 4-word line is short, 5-word is not
        out2 = c4_filters_table(rd.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": ["one two three four\nalpha beta gamma delta five"],
        }))).to_pandas()
        assert int(out2["n_short_lines"].iloc[0]) == 1

    def test_line_counts_survive_arrow_reanchor_quirk(self, ray_session):
        """Arrow's count_substring_regex re-anchors ^ at scan restarts
        (a 10-token line counts TWICE under a (?m)^…{4}\\S pattern,
        DuckDB counts once). The kernels use the prepended-newline
        form instead; this pins the adversarial inputs against the
        DuckDB mirror semantics."""
        import duckdb
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            c4_filters_table, gopher_rules_table)

        texts = [
            "a b c d e f g h i j",          # 10 words, one line
            "-- double bullet - marks",     # bullet chars mid-line
            "one two three four five\nsix seven eight nine ten more.",
            "",                              # empty doc
            "   \nword\n...",
        ]
        docs = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        })
        c4 = c4_filters_table(
            rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        gr = gopher_rules_table(
            rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        con = duckdb.connect()
        con.register("t", docs)
        dshort = dict(con.execute(r"""
            SELECT doc_id, 1 + length(text) - length(replace(text, chr(10), ''))
              - len(regexp_extract_all(chr(10) || text,
                '\n[^\S\n]*(?:\S+[^\S\n]+){4}\S')) FROM t""").fetchall())
        dbul = dict(con.execute(r"""
            SELECT doc_id, len(regexp_extract_all(chr(10) || text,
                '\n[^\S\n]*[-*•]')) FROM t""").fetchall())
        for d in range(len(texts)):
            assert int(c4.loc[d, "n_short_lines"]) == dshort[d], d
            assert int(gr.loc[d, "n_bullet_lines"]) == dbul[d], d
        assert int(c4.loc[0, "n_short_lines"]) == 0   # 10-word line
        assert int(gr.loc[1, "n_bullet_lines"]) == 1  # one bullet LINE


class TestC4Clean:
    def test_line_transform_semantics(self, ray_session):
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import c4_clean_table

        text = ("A good long sentence with enough words here.\n"
                "too short.\n"
                "No terminal punctuation in this longer line at all\n"
                "This line mentions javascript which is banned here.\n"
                "Braces are { banned } in this long line too.\n"
                "Another proper sentence long enough to survive!")
        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": [text, "x"],
        })
        out = c4_clean_table(
            rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        kept = out.loc[0, "clean_text"].split("\n")
        assert kept == [
            "A good long sentence with enough words here.",
            "Another proper sentence long enough to survive!"]
        assert int(out.loc[0, "n_kept"]) == 2
        assert int(out.loc[0, "n_dropped"]) == 4
        # fully-dropped doc → empty string, counters still exact
        assert out.loc[1, "clean_text"] == ""
        assert int(out.loc[1, "n_kept"]) == 0
        assert int(out.loc[1, "n_dropped"]) == 1


class TestDsirImportance:
    def test_weights_and_scores_tiny_corpus(self, ray_session):
        import hashlib

        import numpy as np
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            dsir_importance)

        B = 64
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["alpha alpha beta", "alpha gamma", "beta beta beta",
                     "   "],
            "lang": ["en", "en", "fr", "en"],
        })
        out = dsir_importance(
            rd.from_arrow(docs), n_buckets=B
        ).to_pandas().set_index("doc_id")

        def bucket(w):
            return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

        toks = {"alpha": 3, "beta": 4, "gamma": 1}           # raw counts
        tgt = {"alpha": 3, "beta": 1, "gamma": 1}            # lang=en
        ct = {}; cr = {}
        for w, n in toks.items():
            cr[bucket(w)] = cr.get(bucket(w), 0) + n
        for w, n in tgt.items():
            ct[bucket(w)] = ct.get(bucket(w), 0) + n

        def wv(w):
            b = bucket(w)
            return (int(np.floor(np.log2(ct.get(b, 0) + 1)))
                    - int(np.floor(np.log2(cr[b] + 1))))

        assert int(out.loc[0, "dsir_score"]) == 2 * wv("alpha") + wv("beta")
        assert int(out.loc[2, "dsir_score"]) == 3 * wv("beta")
        assert int(out.loc[0, "n_tokens"]) == 3
        # whitespace-only doc emits no row (SQL GROUP BY parity)
        assert 3 not in out.index


@pytest.mark.usefixtures("ray_session")
class TestVocabCoverage:
    def _run(self, texts, cov_bp=9000):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.textstats import vocab_coverage

        ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
        return vocab_coverage(ds, cov_bp=cov_bp).to_pandas()

    def test_partial_class_ceil(self):
        # counts: a×6, b×2, c×2  → total 10, distinct 3
        # 90% target = 9 occurrences: take a (6), then ceil(3/2)=2 of
        # the count-2 class → k=3, covered 6+2·2=10
        out = self._run(["a a a a a a b b c c"])
        assert out.loc[0, "total_tokens"] == 10
        assert out.loc[0, "distinct_tokens"] == 3
        assert out.loc[0, "k_cov"] == 3
        assert out.loc[0, "cov_tokens"] == 10

    def test_whole_class_boundary(self):
        # a×9, b×1: 90% met exactly by the first class → k=1, cov=9
        out = self._run(["a a a a a a a a a b"])
        assert out.loc[0, "k_cov"] == 1
        assert out.loc[0, "cov_tokens"] == 9

    def test_empty_corpus_emits_no_row(self):
        out = self._run(["   ", ""])
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestTrigramDiversity:
    def _run(self, rows):
        import ray.data as rd

        from web_mass_scraper_ocr_ray.stages.textstats import (
            trigram_diversity,
        )

        ds = rd.from_arrow(pa.table({
            "source": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }))
        return trigram_diversity(ds).to_pandas().set_index("source")

    def test_windows_never_cross_documents(self):
        # two docs in one source: "a b c" + "c a b" → trigrams
        # {"a b c", "c a b"} — NOT "b c c" / "c c a" across the seam
        out = self._run([("s1", "a b c"), ("s1", "c a b")])
        assert out.loc["s1", "total_trigrams"] == 2
        assert out.loc["s1", "distinct_trigrams"] == 2
        assert out.loc["s1", "diversity_bp"] == 10000

    def test_repetition_lowers_bp(self):
        # 4 tokens "x x x x" → 2 trigrams, 1 distinct → 5000 bp
        out = self._run([("s1", "x x x x")])
        assert out.loc["s1", "total_trigrams"] == 2
        assert out.loc["s1", "distinct_trigrams"] == 1
        assert out.loc["s1", "diversity_bp"] == 5000

    def test_short_docs_contribute_nothing(self):
        out = self._run([("s1", "a b"), ("s2", "a b c")])
        assert "s1" not in out.index
        assert out.loc["s2", "total_trigrams"] == 1


class TestTermBlocklist:
    def test_metacharacter_terms_are_escaped(self, ray_session):
        """Real C4/LDNOOBW blocklists contain regex metacharacters
        ('f*ck', 'a$$', 'c++'); the terms must be matched literally,
        not compiled as patterns (or crash)."""
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            term_blocklist_table,
        )

        docs = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3],
            "text": [
                "wrote some c++ today",     # literal 'c++' present
                "fck fbck",                 # '*' must NOT act as a regex
                "clean prose only",
            ],
        }))
        out = term_blocklist_table(
            docs, ["f*ck", "c++"]
        ).to_pandas().set_index("doc_id").sort_index()
        assert out["n_blocked"].tolist() == [1, 0, 0]
        assert out["keep"].tolist() == [False, True, True]

    def test_empty_blocklist_raises(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            term_blocklist_table,
        )

        docs = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            term_blocklist_table(docs, ["", None])

    def test_word_boundaries_counts_and_keep(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from web_mass_scraper_ocr_ray.stages.textstats import (
            term_blocklist_table,
        )

        docs = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "clean text only",
                "slow join slow scan",       # 2x slow
                "bigger is not big-listed",  # 'bigger' must NOT match
                "dup and big and slow",      # one of each
            ],
        }))
        out = term_blocklist_table(
            docs, ["slow", "dup", "big"]
        ).to_pandas().set_index("doc_id").sort_index()
        assert out["n_blocked"].tolist() == [0, 2, 1, 3]
        assert out["n_distinct_blocked"].tolist() == [0, 1, 1, 3]
        assert out["keep"].tolist() == [True, False, False, False]
