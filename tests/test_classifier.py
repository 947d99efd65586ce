"""Hashed-feature logistic-regression quality classifier
(stages/classifier.py): reference twin, partition invariance,
planted-signal separation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.classifier import (
    _featurize_batch,
    featurize,
    quality_classifier,
    score_quality,
    train_quality_logreg,
)

NF = 1 << 10


def _docs(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


GOOD = "insight rigor clarity evidence insight rigor"
BAD = "spam junk noise filler spam junk"
ROWS = [(i, GOOD if i % 2 == 0 else BAD, i % 2 == 0) for i in range(40)]


def _reference_train(rows, n_features, iters, lr, l2, tol):
    """Plain-numpy twin of the distributed trainer (same quantization)."""
    feats = _featurize_batch(
        pd.DataFrame(rows, columns=["doc_id", "text", "label"]),
        n_features,
        "label",
    )
    w = np.zeros(n_features)
    bias = 0.0
    n = len(feats)
    for _ in range(iters):
        g_q = np.zeros(n_features, np.int64)
        b_q = 0
        for _i, r in feats.iterrows():
            z = float(np.sum(np.asarray(r["val"]) * w[np.asarray(r["idx"])]))
            p = 1.0 / (1.0 + np.exp(-(z + bias)))
            err = p - r["y"]
            c = np.floor(err * np.asarray(r["val"]) * 1e9 + 0.5).astype(np.int64)
            np.add.at(g_q, np.asarray(r["idx"]), c)
            b_q += int(np.floor(err * 1e9 + 0.5))
        gw = g_q.astype(np.float64) / 1e9 / n + l2 * w
        gb = b_q / 1e9 / n
        gnorm = float(np.abs(gw).mean() + abs(gb))
        w = w - lr * gw
        bias = bias - lr * gb
        if gnorm < tol:
            break
    return w, bias


def test_train_matches_reference_twin(ray_session):
    rows = ROWS[:10]
    feats = featurize(_docs(rows), NF, label_col="label")
    w, bias, _h = train_quality_logreg(
        feats, NF, iters=5, lr=1.0, l2=1e-4, tol=0.0
    )
    w_ref, bias_ref = _reference_train(rows, NF, 5, 1.0, 1e-4, 0.0)
    assert bias == bias_ref  # bit-identical: integer gradient sums
    np.testing.assert_array_equal(w, w_ref)


def test_training_is_partition_invariant(ray_session):
    f1 = featurize(_docs(ROWS), NF, label_col="label")
    f2 = featurize(_docs(ROWS).repartition(7), NF, label_col="label")
    w1, b1, _ = train_quality_logreg(f1, NF, iters=8, tol=0.0)
    w2, b2, _ = train_quality_logreg(f2, NF, iters=8, tol=0.0)
    assert b1 == b2
    np.testing.assert_array_equal(w1, w2)


def test_planted_signal_separates(ray_session):
    scores, _w, _b, history = quality_classifier(
        _docs(ROWS), "label", n_features=NF, iters=60, lr=4.0
    )
    df = scores.to_pandas().set_index("doc_id")
    good = df.loc[[i for i in range(40) if i % 2 == 0], "prob_micro"]
    bad = df.loc[[i for i in range(40) if i % 2 == 1], "prob_micro"]
    assert good.min() > 800_000 and bad.max() < 200_000
    # gradient norm decreased
    assert history[-1] < history[0]


def test_score_is_sigmoid_of_margin(ray_session):
    rows = [(0, "alpha beta", True), (1, "gamma", False)]
    feats = featurize(_docs(rows), NF, label_col="label").materialize()
    w = np.full(NF, 0.5)
    out = score_quality(feats, w, bias=-0.25).to_pandas().set_index("doc_id")
    fb = _featurize_batch(
        pd.DataFrame(rows, columns=["doc_id", "text", "label"]), NF, "label"
    )
    for _i, r in fb.iterrows():
        z = float(np.sum(np.asarray(r["val"]) * 0.5)) - 0.25
        want = int(np.floor(1.0 / (1.0 + np.exp(-z)) * 1e6 + 0.5))
        assert out.loc[r["doc_id"], "prob_micro"] == want


def test_empty_corpus_raises(ray_session):
    feats = featurize(_docs([]), NF, label_col="label")
    with pytest.raises(ValueError):
        train_quality_logreg(feats, NF, iters=1)
