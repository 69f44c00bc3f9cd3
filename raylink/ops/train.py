"""Distributed training of a linear text classifier on the engine.

``ops/textstats.linear_score`` covers INFERENCE of a hashed-feature linear
model; this module adds the TRAINING side — the quality-classifier loop a
curation pipeline runs before it can score (fastText-style bag-of-words
linear model; Rosenblatt 1958 / Freund-Schapire 1999, public).

The trainer is the batch PERCEPTRON: per round, over the whole corpus,

    u = sum over docs with y * (w . x) <= 0 of y * x        (int64)
    w <- w + u

— every update is an INTEGER vector sum (order-free, exact), so rounds are
bit-exactly SQL-mirrorable with unrolled CTEs (the kmeans_lloyd precedent;
float SGD would not be). Margin-0 docs count as mistakes, the classic
convention.

Features: hashed bag-of-words counts ([a-z]+ words, FNV-1a mod ``dim``)
plus a constant bias feature at index ``dim``. Labels are a PLANTED linear
rule over the same features (the pii_scan/mirrors precedent — the synthetic
corpus has no natural labels): y = +1 iff the doc's count mass in dims
[0, dim/2) is >= its mass in [dim/2, dim) — linearly separable by
construction, so the perceptron demonstrably learns it.

Scale shape: w ((dim+1) int64) broadcasts via ``ray.put`` once per round;
each round is ONE streaming pass emitting (dim+1) int64 partial rows per
batch through the bounded combine tree; the driver folds dim+1 scalars per
round, never rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.ops.textstats import _word_codes


def _features(batch: pa.Table, dim: int):
    """(X (n, dim+1) int64 hashed counts + bias, y (n,) labels)."""
    import pyarrow.compute as pc

    from raylink.util import text_hash64

    text = pc.fill_null(batch.column("text").combine_chunks(), "")
    n = len(text)
    doc_idx, codes, dic = _word_codes(text)
    X = np.zeros((n, dim + 1), dtype=np.int64)
    if len(codes):
        dims = (text_hash64(dic) % np.uint64(dim)).astype(np.int64)
        np.add.at(X, (doc_idx, dims[codes]), 1)
    X[:, dim] = 1  # bias
    half = dim // 2
    ysum = X[:, :half].sum(axis=1) - X[:, half:dim].sum(axis=1)
    y = np.where(ysum >= 0, np.int64(1), np.int64(-1))
    return X, y


def perceptron_train(docs_ds, dim: int = 64, rounds: int = 6):
    """Train the batch perceptron for ``rounds`` full-corpus rounds.
    -> (Dataset (j, w) of the dim+1 final integer weights,
    per-round mistake counts list — O(rounds) driver state)."""
    import ray
    import ray.data as rd

    from raylink.join import tree_groupby_sum

    D = int(dim)
    w = np.zeros(D + 1, dtype=np.int64)
    mistakes: list[int] = []

    def update_partial(wref):
        def fn(batch: pa.Table) -> pa.Table:
            wv = ray.get(wref)
            X, y = _features(batch, D)
            m = X @ wv  # int64 exact: counts * bounded integer weights
            bad = (y * m) <= 0
            u = (y[bad, None] * X[bad]).sum(axis=0, dtype=np.int64)
            return pa.table(
                {
                    "j": pa.array(np.arange(D + 2, dtype=np.int64)),
                    "u": pa.array(
                        np.concatenate([u, [np.int64(bad.sum())]])
                    ),  # row j=D+1 carries the mistake count
                }
            )

        return fn

    for _ in range(rounds):
        wref = ray.put(w)
        agg = tree_groupby_sum(
            docs_ds.map_batches(update_partial(wref), batch_format="pyarrow"),
            ["j"], ["u"],
        ).to_pandas()
        u = np.zeros(D + 2, dtype=np.int64)
        u[agg["j"].to_numpy(np.int64)] = agg["sum(u)"].to_numpy(np.int64)
        mistakes.append(int(u[D + 1]))
        w = w + u[: D + 1]

    weights = rd.from_arrow(
        pa.table({"j": pa.array(np.arange(D + 1, dtype=np.int64)),
                  "w": pa.array(w)})
    )
    return weights, mistakes


def perceptron_eval(docs_ds, weights_ds, dim: int = 64):
    """Score the corpus with trained weights -> Dataset (doc_id, y, yhat,
    margin) — the inference pass of the trained model (weights re-read
    from the dim+1-row Dataset, broadcast once)."""
    import ray

    D = int(dim)
    wt = weights_ds.to_pandas()  # dim+1 rows
    w = np.zeros(D + 1, dtype=np.int64)
    w[wt["j"].to_numpy(np.int64)] = wt["w"].to_numpy(np.int64)
    wref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(wref)
        X, y = _features(batch, D)
        m = X @ wv
        yhat = np.where(m >= 0, np.int64(1), np.int64(-1))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "y": pa.array(y),
                "yhat": pa.array(yhat),
                "margin": pa.array(m),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")
