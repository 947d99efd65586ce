"""Distributed linear quality classifier — the fastText-style hashed
bag-of-words logistic regression production pipelines train to score
document quality (the GPT-3 / CCNet-family "quality filter": weak
labels from a trusted corpus, a linear model over hashed n-gram
features, a keep-probability per document).

Distribution shape (the 100-TB plan):

* featurize ONCE: one map over the text produces sparse hashed rows
  ``(doc_id, idx list<int32>, val list<float>, y)`` — tokens bucket
  through the engine's vectorized crc32 kernel
  (``functions/hashing.crc32_bucket``), values are L2-normalized
  log(1+tf).  The featurized dataset is materialized so training
  iterations never re-tokenize text.
* each training superstep: broadcast the weight vector (``ray.put``,
  n_features floats), per-block partial gradients emitted as
  ``(bucket, grad)`` rows — the exchange per iteration is bounded by
  n_features ROWS regardless of corpus size — one small groupby-sum,
  driver applies the update (scalar math).
* scoring: one map with the broadcast final weights.

Determinism contract: per-(row, feature) gradient contributions are
quantized to integer nano-units BEFORE any summation, so every
gradient sum is an int64 total — immune to float summation order at
any block layout or parallelism.  Same (corpus, labels, hyperparams)
-> bit-identical weights and scores everywhere.  (The paper-default
alternative — float partials — varies in the last ulp with block
boundaries, which a resume or a different cluster size would turn
into different selected documents.)

Training is full-batch gradient descent with L2 regularization and an
early stop on the gradient's integer norm: deterministic, and each
iteration is exactly one streaming pass.  No SQL oracle (iterative);
correctness is pinned by a plain-numpy reference twin and planted
separable-data tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import crc32_bucket

_GRAD_SCALE = 1e9


def _featurize_batch(batch: pd.DataFrame, n_features: int, label_col):
    """One doc -> sorted unique feature indices + L2-normalized
    log(1+tf) values."""
    if not len(batch):
        out = {"doc_id": pd.Series([], dtype="int64"), "idx": [], "val": []}
        if label_col is not None:
            out["y"] = pd.Series([], dtype="float64")
        return pd.DataFrame(out)
    toks = batch["text"].fillna("").str.lower().str.split(" ")
    flat = toks.explode()
    parents = flat.index.to_numpy()
    buckets = crc32_bucket(
        pa.array(flat.to_numpy(dtype=object), pa.string()), n_features
    ).to_numpy(zero_copy_only=False)
    g = (
        pd.DataFrame({"p": parents, "b": buckets})
        .groupby(["p", "b"], sort=True)
        .size()
    )
    pi = g.index.get_level_values(0).to_numpy()
    bi = g.index.get_level_values(1).to_numpy(np.int32)
    tf = np.log1p(g.to_numpy(np.float64))
    # L2 norm per doc
    sq = pd.Series(tf * tf).groupby(pi).transform("sum").to_numpy()
    val = tf / np.sqrt(sq)
    starts = np.flatnonzero(np.r_[True, pi[1:] != pi[:-1]])
    doc_pos = pi[starts]
    out = {
        "doc_id": batch["doc_id"].to_numpy()[doc_pos],
        "idx": np.split(bi, starts[1:]),
        "val": np.split(val, starts[1:]),
    }
    if label_col is not None:
        out["y"] = batch[label_col].to_numpy()[doc_pos].astype(np.float64)
    return pd.DataFrame(out)


def featurize(docs_ds, n_features: int, label_col=None):
    """(doc_id, text[, label]) -> sparse hashed feature rows."""
    return docs_ds.map_batches(
        lambda b: _featurize_batch(b, n_features, label_col),
        batch_format="pandas",
    )


def _row_arrays(batch: pd.DataFrame):
    idx = np.concatenate([np.asarray(a, np.int32) for a in batch["idx"]])
    val = np.concatenate([np.asarray(a, np.float64) for a in batch["val"]])
    lens = np.fromiter((len(a) for a in batch["idx"]), np.int64, len(batch))
    row = np.repeat(np.arange(len(batch)), lens)
    return row, idx, val


def _margins(batch: pd.DataFrame, w: np.ndarray):
    row, idx, val = _row_arrays(batch)
    z = np.zeros(len(batch), np.float64)
    np.add.at(z, row, val * w[idx])
    return row, idx, val, z


def train_quality_logreg(
    featurized_ds,
    n_features: int,
    iters: int = 40,
    lr: float = 2.0,
    l2: float = 1e-6,
    tol: float = 1e-4,
):
    """Full-batch GD over the materialized sparse rows; returns
    ``(weights, bias, history)`` with history = per-iteration mean
    |gradient| (from the exact integer sums)."""
    import ray

    featurized_ds = featurized_ds.materialize()
    n_docs = featurized_ds.count()
    if n_docs == 0:
        raise ValueError("cannot train on an empty corpus")

    def _accumulate(rows: pd.DataFrame) -> np.ndarray:
        """Dense int64 gradient (slot 0 = bias, 1.. = features) from
        sparse one-row-per-block partials — exact int64 adds."""
        g = np.zeros(n_features + 1, np.int64)
        for bkt, gv, bq in zip(rows["bkt"], rows["gv"], rows["bq"]):
            g[np.asarray(bkt, np.int64) + 1] += np.asarray(gv, np.int64)
            g[0] += int(bq)
        return g

    def combine(rows: pd.DataFrame) -> pd.DataFrame:
        # tree-combine <=256 sparse block partials into one sparse row;
        # int64 addition commutes, so combine order is irrelevant
        if not len(rows):
            return rows
        g = _accumulate(rows)
        nz = np.flatnonzero(g[1:])
        return pd.DataFrame(
            {
                "bkt": [nz.astype(np.int64)],
                "gv": [g[1:][nz]],
                "bq": np.array([g[0]], dtype=np.int64),
            }
        )

    w = np.zeros(n_features, np.float64)
    bias = 0.0
    history = []
    for _ in range(iters):
        w_ref = ray.put(w)
        b_now = bias

        def grad_partial(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame(
                    {
                        "bkt": pd.Series([], dtype=object),
                        "gv": pd.Series([], dtype=object),
                        "bq": pd.Series([], dtype="int64"),
                    }
                )
            wv = ray.get(w_ref)
            row, idx, val, z = _margins(batch, wv)
            p = 1.0 / (1.0 + np.exp(-(z + b_now)))
            err = p - batch["y"].to_numpy(np.float64)
            # quantize per-(row, feature) BEFORE summing: int64 totals
            # are exact under any block layout
            contrib = np.floor(err[row] * val * _GRAD_SCALE + 0.5).astype(
                np.int64
            )
            g = np.zeros(len(wv), np.int64)
            np.add.at(g, idx, contrib)
            nz = np.flatnonzero(g)
            b_q = int(np.floor(err * _GRAD_SCALE + 0.5).astype(np.int64).sum())
            return pd.DataFrame(
                {
                    "bkt": [nz.astype(np.int64)],
                    "gv": [g[nz]],
                    "bq": np.array([b_q], dtype=np.int64),
                }
            )

        # bounded exchange with NO shuffle: each block emits one sparse
        # row (<= n_features ints), one coalescing combine level, then
        # the driver sums the <= n_blocks/256 survivors.  A grouped
        # aggregate here would sort n_features-row blocks every
        # iteration — the measured worst case for Ray's sort shuffle.
        parts = featurized_ds.map_batches(
            grad_partial, batch_format="pandas"
        ).map_batches(combine, batch_format="pandas", batch_size=256)
        g = _accumulate(parts.to_pandas())
        g_bias = (float(g[0]) / _GRAD_SCALE) / n_docs
        gw = g[1:].astype(np.float64) / _GRAD_SCALE
        gw /= n_docs
        gw += l2 * w
        gnorm = float(np.abs(gw).mean() + abs(g_bias))
        history.append(gnorm)
        w = w - lr * gw
        bias = bias - lr * g_bias
        if gnorm < tol:
            break
    return w, bias, history


def score_quality(featurized_ds, w: np.ndarray, bias: float,
                  quantize: float = 1e6):
    """(sparse rows) -> (doc_id, prob_micro): keep-probability under
    the trained model, integer-quantized."""
    import ray

    w_ref = ray.put(w)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "prob_micro": pd.Series([], dtype="int64"),
                }
            )
        wv = ray.get(w_ref)
        _row, _idx, _val, z = _margins(batch, wv)
        p = 1.0 / (1.0 + np.exp(-(z + bias)))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "prob_micro": np.floor(p * quantize + 0.5).astype(np.int64),
            }
        )

    return featurized_ds.map_batches(score, batch_format="pandas")


def quality_classifier(docs_ds, label_col: str, n_features: int = 1 << 15,
                       **train_kw):
    """End-to-end: featurize once, train on the weak labels, score
    every document.  Returns (scores_ds, weights, bias, history)."""
    feats = featurize(docs_ds, n_features, label_col=label_col).materialize()
    w, bias, history = train_quality_logreg(feats, n_features, **train_kw)
    return score_quality(feats, w, bias), w, bias, history
