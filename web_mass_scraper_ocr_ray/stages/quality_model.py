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
                 threshold: int = DEFAULT_THRESHOLD):
        # "model load" — once per actor, never per batch
        from .textstats import QualityScorer

        self._features = QualityScorer()
        self.weights = dict(DEFAULT_WEIGHTS if weights is None
                            else weights)
        self.bias = int(bias)
        self.threshold = int(threshold)

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
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "score": pa.array(score, pa.int64()),
            "kept": pa.array(score >= self.threshold),
        })


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
