"""EXACT set-similarity self-join via prefix filtering.

The AllPairs / PPJoin family (Bayardo et al., WWW'07; Xiao et al.,
WWW'08) in the symmetric-prefix MapReduce formulation of Vernica,
Carey & Li (SIGMOD'10): every record keeps only its PREFIX — the
``|x| - ceil(tau*|x|) + 1`` rarest elements under one global order —
and two records can satisfy ``J >= tau`` only if their prefixes share
an element. Grouping by prefix element therefore finds every
qualifying pair EXACTLY (no LSH recall loss), while the rarest-first
order keeps the per-element buckets small.

This operator works on token BAGS (multisets) reduced to sets by
occurrence-tagging: the j-th occurrence of token ``w`` becomes the
element ``(w, j)``, so bag Jaccard == set Jaccard of the tagged sets
and the prefix lemma applies unchanged. Bag similarity is the right
granularity for word-salad corpora where nearly every document shares
the same small distinct-token vocabulary (set Jaccard would call
everything a duplicate).

Distributed shape (all exchanges move ids/hashes, never text):
  1. tag elements per batch (stateless map),
  2. global element frequencies via the map-side combiner
     (`shuffle.two_phase_aggregate`) — O(distinct tags) rows shuffle,
  3. rank elements by (df, tag) through one co-partition `equi_join`,
  4. per-doc prefixes in hash(doc_id) buckets (one keyed exchange),
  5. candidate pairs per tag run with the AllPairs LENGTH filter
     (``min(n) * 10000 >= tau_bp * max(n)``) applied BEFORE pair
     generation — per run one searchsorted, pairs via np.repeat,
  6. exact verify: per-doc tagged sets attach to pairs through two
     `equi_join`s; intersection is one np.intersect1d per pair.

Unlike the banded-LSH candidates in `stages/dedup`, there is no pair
cap here: the result is a JOIN (every qualifying pair must appear),
not a connectivity graph, so truncation would silently lose output
rows. Degenerate runs are instead logged: a run larger than
``RUN_WARN`` means the corpus needs a higher tau or a hot-element
blocklist (a stopword-like tag shared by everything carries no
similarity signal — PPJoin's positional filter is the literature's
refinement if this ever dominates).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv64_bulk
from .joins import equi_join
from .shuffle import two_phase_aggregate

_logger = logging.getLogger(__name__)

N_BUCKETS = 64
RUN_WARN = 10_000
_FNV_PRIME = np.uint64(1099511628211)


def _bucket_i64(arr: np.ndarray, n_buckets: int) -> np.ndarray:
    """Multiplicative hash bucket for int64 keys (avalanches the low
    bits so sequential ids spread)."""
    h = (arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def bag_elements(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """documents → one row per token OCCURRENCE:
    ``(doc_id, tag:int64, n:int64)`` where ``tag`` identifies the
    (token, occurrence-index) pair and ``n`` is the doc's bag size
    (total token count), carried on every row so later stages never
    join back for it."""

    def _explode(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "tag": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks_list = pc.split_pattern_regex(
            pc.cast(t.column(text_col), pa.string()), r"\s+")
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks_list).combine_chunks()
        n_per_row = pc.list_value_length(toks_list).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(ids, n_per_row)
        keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        if not keep.any():
            return empty
        toks = flat.filter(pa.array(keep)).to_pylist()
        doc_of = doc_of[keep]
        h = fnv64_bulk(toks)  # ONE bulk hash per batch
        # occurrence tags: j-th copy of token hash h in a doc -> h*P+j+1
        order = np.lexsort((h, doc_of))
        hs, ds_ = h[order], doc_of[order]
        runs = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
        starts = np.flatnonzero(runs)
        occ = np.arange(len(hs), dtype=np.uint64)
        occ -= np.repeat(occ[starts], np.diff(np.r_[starts, len(hs)]))
        with np.errstate(over="ignore"):
            tags = hs * _FNV_PRIME + occ + np.uint64(1)
        # bag size per doc, attached to every element row
        dstarts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        dlens = np.diff(np.r_[dstarts, len(ds_)])
        n_of = np.repeat(dlens, dlens)
        return pa.table({
            id_col: pa.array(ds_, pa.int64()),
            "tag": pa.array(tags.view(np.int64)),
            "n": pa.array(n_of, pa.int64()),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow")


def _prefixes(ranked_ds, id_col: str, tau_bp: int,
              n_buckets: int = N_BUCKETS):
    """(doc_id, tag, n, df) → the prefix rows of every doc: the
    ``n - ceil(tau*n) + 1`` elements with the smallest (df, tag).
    One keyed exchange bucketed by hash(doc_id); the per-bucket kernel
    sorts once and keeps run-relative positions — no per-doc loop."""

    def _bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(_bucket_i64(ids, n_buckets)))

    def _take_prefix(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[
            (id_col, "ascending"), ("df", "ascending"),
            ("tag", "ascending")])
        g = g.take(idx)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        pos = np.arange(len(ids), dtype=np.int64)
        pos -= np.repeat(pos[starts], np.diff(np.r_[starts, len(ids)]))
        # prefix length p = n - ceil(tau*n) + 1
        p = n - (tau_bp * n + 9999) // 10000 + 1
        return g.filter(pa.array(pos < p)).select([id_col, "tag", "n"])

    return ranked_ds.map_batches(_bucket, batch_format="pyarrow").groupby(
        "_b").map_groups(_take_prefix, batch_format="pyarrow")


def _candidate_pairs(prefix_ds, id_col: str, tau_bp: int,
                     n_buckets: int = N_BUCKETS):
    """Prefix rows → distinct candidate pairs. Tag runs are grouped in
    hash(tag) buckets; within a run sorted by (n, id) the AllPairs
    length filter admits, for each member j, only partners i<j with
    ``n_i * 10000 >= tau_bp * n_j`` — one searchsorted per run, pair
    indices via np.repeat (no Python loop over pairs)."""
    from ray.data.aggregate import Count

    def _bucket(t: pa.Table) -> pa.Table:
        tags = t.column("tag").to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(_bucket_i64(tags, n_buckets)))

    def _pairs(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.select(["tag", id_col, "n"]).to_pandas()
        df = df.sort_values(["tag", "n", id_col], kind="stable")
        tags = df["tag"].to_numpy()
        ids = df[id_col].to_numpy()
        ns = df["n"].to_numpy()
        starts = np.flatnonzero(np.r_[True, tags[1:] != tags[:-1]])
        lens = np.diff(np.r_[starts, len(tags)])
        big = lens[lens > RUN_WARN]
        if len(big):
            _logger.warning(
                "set_similarity_join: %d prefix-tag runs exceed %d "
                "members (largest %d) — raise tau or blocklist the "
                "hot element", len(big), RUN_WARN, int(big.max()))
        a_parts, b_parts = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            sub_n = ns[s:s + ln]
            sub_id = ids[s:s + ln]
            # for each j, admit i in [lo_j, j): n_i >= ceil(tau*n_j)
            need = (tau_bp * sub_n + 9999) // 10000
            lo = np.searchsorted(sub_n, need, side="left")
            j = np.arange(ln, dtype=np.int64)
            cnt = np.maximum(j - lo, 0)
            if cnt.sum() == 0:
                continue
            jj = np.repeat(j, cnt)
            ii = np.concatenate(
                [np.arange(l, x) for l, x, c in zip(lo, j, cnt) if c])
            pa_ids, pb_ids = sub_id[ii], sub_id[jj]
            swap = pa_ids > pb_ids
            pa_ids, pb_ids = (np.where(swap, pb_ids, pa_ids),
                              np.where(swap, pa_ids, pb_ids))
            a_parts.append(pa_ids)
            b_parts.append(pb_ids)
        a = np.concatenate(a_parts) if a_parts else np.zeros(0, np.int64)
        b = np.concatenate(b_parts) if b_parts else np.zeros(0, np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    pairs = prefix_ds.map_batches(_bucket, batch_format="pyarrow").groupby(
        "_b").map_groups(_pairs, batch_format="pyarrow")
    # a pair may share several prefix elements — distinct them
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_hits")).drop_columns(["_hits"])


def _bags(elements_ds, id_col: str, n_buckets: int = N_BUCKETS):
    """(doc_id, tag, n) → one row per doc with its SORTED tagged set as
    a list column: ``(doc_id, tags list<int64>, n)``."""

    def _bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(_bucket_i64(ids, n_buckets)))

    def _collect(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[
            (id_col, "ascending"), ("tag", "ascending")])
        g = g.take(idx)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        tags = g.column("tag").to_numpy(zero_copy_only=False)
        ns = g.column("n").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        offsets = np.r_[starts, len(ids)].astype(np.int32)
        return pa.table({
            id_col: pa.array(ids[starts], pa.int64()),
            "tags": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(tags, pa.int64())),
            "n": pa.array(ns[starts], pa.int64()),
        })

    return elements_ds.map_batches(_bucket, batch_format="pyarrow").groupby(
        "_b").map_groups(_collect, batch_format="pyarrow")


def set_similarity_self_join(docs_ds, tau_bp: int = 8000,
                             id_col: str = "doc_id",
                             text_col: str = "text"):
    """All document pairs whose token-BAG Jaccard ≥ ``tau_bp``/10000 —
    EXACT (prefix filtering generates a superset of the true pairs;
    the verify stage keeps exactly the qualifying ones).

    → ``(doc_a, doc_b, inter, uni, jaccard_bp)``, all int64:
    ``inter`` = Σ min(count_a, count_b) per token, ``uni`` =
    n_a + n_b − inter, ``jaccard_bp`` = ⌊10000·inter/uni⌋.
    """
    ele = bag_elements(docs_ds, id_col, text_col)
    freq = two_phase_aggregate(ele, "tag", {"df": (None, "count")})
    ranked = equi_join(ele, freq, "tag", "tag", ["df"])
    cands = _candidate_pairs(
        _prefixes(ranked, id_col, tau_bp), id_col, tau_bp)
    bags = _bags(ele, id_col)

    def _rename(suffix):
        def _f(t: pa.Table) -> pa.Table:
            return t.rename_columns([id_col, f"tags{suffix}", f"n{suffix}"])
        return _f

    bags_a = bags.map_batches(_rename("_a"), batch_format="pyarrow")
    bags_b = bags.map_batches(_rename("_b"), batch_format="pyarrow")
    joined = equi_join(cands, bags_a, "doc_a", id_col, ["tags_a", "n_a"])
    joined = equi_join(joined, bags_b, "doc_b", id_col, ["tags_b", "n_b"])

    def _verify(t: pa.Table) -> pa.Table:
        tags_a = t.column("tags_a").combine_chunks()
        tags_b = t.column("tags_b").combine_chunks()
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        nb = t.column("n_b").to_numpy(zero_copy_only=False)
        inter = np.zeros(t.num_rows, np.int64)
        for i in range(t.num_rows):
            a = np.asarray(tags_a[i].values)
            b = np.asarray(tags_b[i].values)
            # both sorted & unique (occurrence tags): linear merge count
            inter[i] = len(np.intersect1d(a, b, assume_unique=True))
        uni = na + nb - inter
        jbp = (10000 * inter) // uni
        out = pa.table({
            "doc_a": t.column("doc_a"),
            "doc_b": t.column("doc_b"),
            "inter": pa.array(inter),
            "uni": pa.array(uni),
            "jaccard_bp": pa.array(jbp),
        })
        return out.filter(pa.array(jbp >= tau_bp))

    return joined.map_batches(_verify, batch_format="pyarrow")
