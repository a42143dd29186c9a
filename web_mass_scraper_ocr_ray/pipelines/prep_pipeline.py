"""Training-data corpus preparation — the engine's second flagship.

Composes the training-data operators into ONE streaming execution:

    read documents
      → quality + repetition features        (map_batches, Arrow/numpy)
      → PII scrub (redact text, count hits)  (map_batches, Arrow RE2)
      → global exact dedup                   (ONE text-hash shuffle)
      → deterministic stratified sample      (hash rule, no state)
      → write kept docs + counter partials   (fused sink+combiner)

Design rule: every stage marks a DROP FLAG instead of filtering, with
fixed precedence (quality > duplicate > sampled_out) — so a single
pass yields both the cleaned corpus AND the full drop accounting,
with no per-stage re-counting executions. The dedup survivor is
chosen among quality-PASSING group members only (a low-quality copy
never shadows a clean one); sampling applies to survivors.

Scale shape: the only all-to-all is the dedup groupby, keyed by a
64-bit text hash — the standard cost of global exact dedup. Every
other stage is embarrassingly parallel. Output parts get
content-deterministic filenames (retry-idempotent, like the extract
sink); the run commits ONE atomic manifest with the counters.

The whole flag semantics is SQL-expressible, so the driver oracle
(`corpus_prep` in __ray_entry__.py) independently verifies the
composed pipeline end-to-end — not just its stages.

Reference parity: the reference has no corpus-prep stage (it is a
scraper; reference src/scraper_app/scraper.py); this implements the
build brief's training-data mandate on the same engine substrate.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state import manifest as mf

# drop_reason codes (int8): precedence order, lowest wins
KEEP = 0
DROP_QUALITY = 1
DROP_DUPLICATE = 2
DROP_SAMPLED_OUT = 3


@dataclass
class PrepConfig:
    min_tokens: int = 50
    max_dup_word_bp: int = 9000
    # per-stratum sample rates (basis points); None → keep everything
    sample_rates_bp: Optional[Dict[str, int]] = None
    sample_default_bp: int = 10000
    output_dir: Optional[str] = None
    manifest_dirname: str = "_manifest"
    # Two-pass global dedup — the 100 TB default. One-pass groupby
    # (text_hash) moves FULL rows (incl. text) keyed by content, so a
    # viral page's whole text mass lands on one worker; two-pass first
    # shuffles only (doc_id, text_hash, drop_reason, source) — ~tens
    # of bytes/row — to compute the dup/sample decisions, then joins
    # the changed decisions back onto the wide rows keyed by the
    # UNIFORM doc_id (stages/joins.apply_keyed_updates). Identical
    # output; the content-keyed shuffle never sees the text column.
    dedup_two_pass: bool = False


def _flag_quality_and_scrub(t: pa.Table, cfg: PrepConfig) -> pa.Table:
    """Quality flag (token count + duplicate-word fraction) and PII
    redaction in one task — both reuse the textstats kernels."""
    from ..stages.textstats import PII_PATTERNS, _repetition_kernel

    rep = _repetition_kernel(t, "text", with_bigrams=False)
    n_toks = rep.column("n_tokens")
    dup_bp = rep.column("dup_word_bp")
    low_q = pc.or_(
        pc.less(n_toks, cfg.min_tokens),
        pc.greater(dup_bp, cfg.max_dup_word_bp),
    )
    reason = pc.if_else(low_q, pa.scalar(DROP_QUALITY, pa.int8()),
                        pa.scalar(KEEP, pa.int8()))

    text = t.column("text")
    # the prep counter only needs the TOTAL hit count — one combined
    # alternation pass instead of one count pass per pattern
    combined = "|".join(f"(?:{pat})" for _, pat, _ in PII_PATTERNS)
    pii_hits = pc.count_substring_regex(text, combined)
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, repl)

    cols = {n: t.column(n) for n in t.column_names if n != "text"}
    cols["text"] = red
    cols["n_toks"] = pc.cast(n_toks, pa.int64())
    cols["pii_hits"] = pc.cast(pii_hits, pa.int64())
    cols["drop_reason"] = reason
    # dedup key on the REDACTED text (what ships is what dedups);
    # uint64 hash reinterpreted as int64 (bit pattern, not value cast)
    cols["text_hash"] = pa.array(
        _hash_texts(red).view(np.int64), pa.int64())
    return pa.table(cols)


def _hash_texts(arr) -> np.ndarray:
    from ..functions.hashing import fnv64_bulk

    return fnv64_bulk(arr.to_pylist())


def _mark_dups(g, cfg: PrepConfig):
    """One text_hash group: among quality-passing members the smallest
    doc_id survives; every other member becomes DROP_DUPLICATE unless
    already quality-dropped (precedence). The survivor then takes the
    deterministic sample decision."""
    import pandas as pd

    from ..stages.sampling import sample_buckets

    reason = g["drop_reason"].to_numpy().copy()
    ids = g["doc_id"].to_numpy()
    ok = reason == KEEP
    if ok.any():
        survivor = ids[ok].min()
        dup = ok & (ids != survivor)
        reason[dup] = DROP_DUPLICATE
        if cfg.sample_rates_bp is not None:
            srow = ok & (ids == survivor)
            bucket = int(sample_buckets(ids[srow][:1])[0])
            stratum = g["source"].to_numpy()[srow][0]
            rate = cfg.sample_rates_bp.get(
                stratum, cfg.sample_default_bp)
            if bucket >= rate:
                reason[srow] = DROP_SAMPLED_OUT
    out = g.copy()
    out["drop_reason"] = reason.astype("int8")
    return out


def _decisions_from_group(g, cfg: PrepConfig):
    """Skinny two-pass variant of :func:`_mark_dups`: one text_hash
    group of (doc_id, drop_reason, source) rows → ONLY the rows whose
    reason CHANGES (duplicate / sampled-out). Text never enters this
    shuffle. Decision logic is identical — survivor = min doc_id among
    quality-passers; the survivor takes the deterministic sample
    draw — so the composed output is byte-identical to one-pass."""
    import pandas as pd

    from ..stages.sampling import sample_buckets

    reason = g["drop_reason"].to_numpy()
    ids = g["doc_id"].to_numpy()
    ok = reason == KEEP
    out_ids: list = []
    out_reason: list = []
    if ok.any():
        survivor = ids[ok].min()
        dup = ok & (ids != survivor)
        if dup.any():
            out_ids.append(ids[dup])
            out_reason.append(
                np.full(int(dup.sum()), DROP_DUPLICATE, np.int8))
        if cfg.sample_rates_bp is not None:
            srow = ok & (ids == survivor)
            bucket = int(sample_buckets(ids[srow][:1])[0])
            stratum = g["source"].to_numpy()[srow][0]
            rate = cfg.sample_rates_bp.get(stratum, cfg.sample_default_bp)
            if bucket >= rate:
                out_ids.append(ids[srow])
                out_reason.append(np.full(1, DROP_SAMPLED_OUT, np.int8))
    return pd.DataFrame({
        "doc_id": (np.concatenate(out_ids) if out_ids
                   else np.zeros(0, np.int64)).astype(np.int64),
        "drop_reason": (np.concatenate(out_reason) if out_reason
                        else np.zeros(0, np.int8)),
    })


def build_prep_pipeline(docs_ds, cfg: Optional[PrepConfig] = None):
    """documents Dataset → flag-annotated Dataset (drop_reason per
    row; KEEP rows carry the redacted text). Lazy; no driver data.

    ``cfg.dedup_two_pass`` picks the dedup shape (see PrepConfig):
    one-pass = single content-keyed shuffle of full rows (fine while
    no text_hash group outgrows a worker); two-pass = skinny
    content-keyed shuffle for the decisions + uniform doc_id-keyed
    update join of the changed flags onto the wide rows. The flagging
    map runs twice on the two-pass path (once per lineage branch) —
    deterministic stateless compute, traded for never shuffling text
    by a skewed content key."""
    cfg = cfg or PrepConfig()

    flagged = docs_ds.map_batches(
        lambda t: _flag_quality_and_scrub(t, cfg),
        batch_format="pyarrow",
    )
    if not cfg.dedup_two_pass:
        # global exact dedup: the one all-to-all, keyed by 64-bit hash
        return flagged.groupby("text_hash").map_groups(
            lambda g: _mark_dups(g, cfg), batch_format="pandas"
        )

    from ..stages.joins import apply_keyed_updates

    skinny = flagged.select_columns(
        ["doc_id", "text_hash", "drop_reason", "source"])
    decisions = skinny.groupby("text_hash").map_groups(
        lambda g: _decisions_from_group(g, cfg), batch_format="pandas"
    )
    return apply_keyed_updates(flagged, decisions,
                               on="doc_id", col="drop_reason")


_PREP_COUNTERS = (
    "docs_total", "docs_kept", "drop_lowquality", "drop_duplicate",
    "drop_sampled_out", "pii_redactions", "chars_out",
)


def _prep_write_and_count(t: pa.Table, out_dir: str) -> pa.Table:
    """Fused sink+combiner (same idempotency contract as the extract
    sink): write the block's KEEP rows under a content-deterministic
    filename, emit one counter-partial row."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    reason = t.column("drop_reason")
    keep = pc.equal(reason, KEEP)
    kept = t.filter(keep).drop_columns(["drop_reason"])
    if kept.num_rows:
        i0 = kept.column("doc_id")[0].as_py()
        i1 = kept.column("doc_id")[-1].as_py()
        key = hashlib.md5(
            f"{i0}|{i1}|{kept.num_rows}".encode()).hexdigest()[:20]
        pq.write_table(kept, os.path.join(out_dir, f"part-{key}.parquet"))

    def _n(mask_val):
        return pc.sum(pc.cast(pc.equal(reason, mask_val),
                              pa.int64())).as_py() or 0

    return pa.table({
        "docs_total": pa.array([t.num_rows], pa.int64()),
        "docs_kept": pa.array([kept.num_rows], pa.int64()),
        "drop_lowquality": pa.array([_n(DROP_QUALITY)], pa.int64()),
        "drop_duplicate": pa.array([_n(DROP_DUPLICATE)], pa.int64()),
        "drop_sampled_out": pa.array([_n(DROP_SAMPLED_OUT)], pa.int64()),
        "pii_redactions": pa.array(
            [pc.sum(t.column("pii_hits")).as_py() or 0], pa.int64()),
        "chars_out": pa.array(
            [pc.sum(pc.utf8_length(kept.column("text"))).as_py() or 0
             if kept.num_rows else 0], pa.int64()),
    })


def run_prep_pipeline(docs, cfg: Optional[PrepConfig] = None) -> Dict:
    """Execute end-to-end; returns the prep summary.

    ``docs`` is a Dataset or Parquet path(s). With ``cfg.output_dir``
    the cleaned corpus lands as Parquet parts plus ONE atomic manifest
    (part_id 0) carrying the counters; a rerun over a committed output
    returns the recorded summary without recomputing (the global dedup
    shuffle makes per-group commits meaningless here — restart
    granularity is the run; parts are retry-idempotent within it).
    """
    import os
    from functools import partial

    import ray.data as rd

    cfg = cfg or PrepConfig()
    start = time.monotonic()
    if isinstance(docs, (str, list, tuple)):
        docs = rd.read_parquet(docs)

    flagged = build_prep_pipeline(docs, cfg)

    if not cfg.output_dir:
        raise ValueError("PrepConfig.output_dir is required to run; "
                         "use build_prep_pipeline for a lazy Dataset")

    committed = mf.committed_parts(cfg.output_dir, cfg.manifest_dirname)
    if 0 in committed:
        rec = {m["part_id"]: m for m in mf.read_manifests(
            cfg.output_dir, cfg.manifest_dirname)}[0]
        return {k: rec[k] for k in _PREP_COUNTERS} | {
            "resumed": True, "duration_seconds": 0.0}
    mf.clean_uncommitted(cfg.output_dir, committed)
    os.makedirs(cfg.output_dir, exist_ok=True)

    partials = flagged.map_batches(
        partial(_prep_write_and_count, out_dir=cfg.output_dir),
        batch_format="pyarrow", batch_size=None,
    )
    agg = partials.to_pandas().sum(numeric_only=True)
    stats = {k: int(agg.get(k, 0)) for k in _PREP_COUNTERS}
    mf.commit_partition(cfg.output_dir, 0, stats, cfg.manifest_dirname)
    stats["resumed"] = False
    stats["duration_seconds"] = time.monotonic() - start
    return stats
