"""Model-based quality filtering — the batched-inference stage shape.

``LinearQualityModel`` is a callable CLASS for
``map_batches(LinearQualityModel, concurrency=N, fn_constructor_kwargs=…)``:
the "model" (a weight vector) loads ONCE per actor in ``__init__`` and
every batch is scored vectorized in ``__call__`` — the exact shape a
real classifier (fasttext quality model, perplexity LM) drops into; the
weights here are deliberately small integers so the DuckDB oracle can
recompute the score bit-exactly (the stand-in discipline
``textstats.corpus_freq_score`` established).

Features reuse the ``QualityScorer`` Arrow kernels (one implementation
of the feature math, one SQL mirror). Score is an integer dot product:

    score = bias + Σ_f weight[f] · feature_f(doc)

and ``kept = score >= threshold``. At 100 TB this stage is pure
streaming map — no shuffle, no driver state; scale it with
``concurrency`` × ``num_cpus`` like any actor pool.
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa

# integer weights over QualityScorer features — a plausible
# "quality" direction: reward tokens/stopwords (real prose), punish
# unbroken punctuation soup
DEFAULT_WEIGHTS: Dict[str, int] = {
    "token_count": 2,
    "stopword_count": 5,
    "punct_count": -3,
    "n_chars_actual": 0,
    "alpha_len": 0,
}
DEFAULT_BIAS = 100
DEFAULT_THRESHOLD = 150


class LinearQualityModel:
    """Actor-pool stage: integer linear scorer over quality features."""

    def __init__(self, weights: Dict[str, int] | None = None,
                 bias: int = DEFAULT_BIAS,
                 threshold: int = DEFAULT_THRESHOLD,
                 passthrough: tuple = ()):
        # "model load" — once per actor, never per batch
        from .textstats import QualityScorer

        self._features = QualityScorer()
        self.weights = dict(DEFAULT_WEIGHTS if weights is None
                            else weights)
        self.bias = int(bias)
        self.threshold = int(threshold)
        self.passthrough = tuple(passthrough)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        feats = self._features(batch)
        score = np.full(batch.num_rows, self.bias, dtype=np.int64)
        for name, w in self.weights.items():
            if w:
                score += w * np.asarray(
                    pc.cast(feats.column(name), pa.int64())
                    .combine_chunks())
        cols = {
            "doc_id": batch.column("doc_id"),
            "score": pa.array(score, pa.int64()),
            "kept": pa.array(score >= self.threshold),
        }
        for name in self.passthrough:
            cols[name] = batch.column(name)
        return pa.table(cols)


def score_quality(docs_ds, weights: Dict[str, int] | None = None,
                  bias: int = DEFAULT_BIAS,
                  threshold: int = DEFAULT_THRESHOLD,
                  concurrency=(1, 4)):
    """→ (doc_id, score, kept) via the actor pool."""
    return docs_ds.map_batches(
        LinearQualityModel,
        fn_constructor_kwargs={"weights": weights, "bias": bias,
                               "threshold": threshold},
        concurrency=concurrency,
        batch_format="pyarrow",
    )


DOMAIN_MEAN_THRESHOLD = 225


def domain_quality_filter(docs_ds, threshold: int = DOMAIN_MEAN_THRESHOLD,
                          key_col: str = "source",
                          concurrency=(1, 4)):
    """Domain-level quality gating (the RefinedWeb/CCNet pattern: a
    spammy domain poisons every page on it, so filter by the DOMAIN's
    aggregate quality, not only per-doc).

    Three stages: (1) actor-pool integer scoring per doc (streaming,
    no shuffle); (2) per-domain integer mean via a Sum+Count grouped
    agg — partials combine per block before the shuffle; (3) the
    verdict joined back onto docs by the domain key with the
    co-partition :func:`stages.joins.equi_join` — at web scale there
    are ~10⁸ registered domains, too many to broadcast. The scored
    docs are materialized once so the actor pool runs a single pass
    feeding both the rollup and the join (object-store spill is the
    price; re-scoring the corpus would be the alternative).

    Integer mean (``sum // n``) keeps the whole op order-independent →
    bit-exact SQL oracle. → (doc_id, source, score, source_mean_score,
    keep_domain).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .joins import equi_join

    scored = docs_ds.map_batches(
        LinearQualityModel,
        fn_constructor_kwargs={"passthrough": (key_col,)},
        concurrency=concurrency,
        batch_format="pyarrow",
    ).select_columns(["doc_id", "score", key_col]).materialize()

    def _mean(t: pa.Table) -> pa.Table:
        m = pc.divide(  # int64 division truncates toward zero in both
            # Arrow and DuckDB `//` (-7//2 = -3 in each) — oracle-safe
            pc.cast(t.column("_sum"), pa.int64()),
            pc.cast(t.column("_n"), pa.int64()))
        return pa.table({
            key_col: t.column(key_col),
            "source_mean_score": m,
        })

    means = (
        scored.groupby(key_col)
        .aggregate(Sum("score", alias_name="_sum"),
                   Count(alias_name="_n"))
        .map_batches(_mean, batch_format="pyarrow")
    )

    def _flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "keep_domain",
            pc.greater_equal(t.column("source_mean_score"),
                             pa.scalar(threshold, pa.int64())))

    return equi_join(
        scored, means, key_col, key_col, ["source_mean_score"]
    ).map_batches(_flag, batch_format="pyarrow")
