"""Quality-probe training: NumPy replay of the exact GD sequence, feature
correctness on a crafted document, and the accuracy floor that guards
against the degenerate always-positive classifier."""

from __future__ import annotations

import numpy as np

from gh_archive_data_pipeline_spark.operators.classifier import (
    CENTERS, LR, ROUNDS, quality_features, train_quality_probe,
)

SF = "/root/testdata/sf0.001"


def _feats_numpy(spark):
    rows = quality_features(
        spark.read.parquet(f"{SF}/documents.parquet")).collect()
    X = np.array([[r.x1, r.x2, r.x3, r.x4, r.x5] for r in rows])
    y = np.array([r.y for r in rows])
    return X, y


def test_train_matches_numpy_gd(spark):
    """The identical zero-init / fixed-round / full-batch GD in NumPy must
    reproduce the distributed weights to summation-order noise."""
    X, y = _feats_numpy(spark)
    w = np.zeros(5)
    b = 0.0
    for _ in range(ROUNDS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        w = w - LR * (X.T @ (p - y)) / len(y)
        b = b - LR * (p - y).sum() / len(y)
    got_w, got_b = train_quality_probe(
        spark.read.parquet(f"{SF}/documents.parquet"))
    np.testing.assert_allclose(np.array(got_w), w, rtol=1e-9)
    np.testing.assert_allclose(got_b, b, rtol=1e-9)


def test_probe_is_not_degenerate(spark):
    """The learned probe must actually separate: >= 0.85 accuracy against
    its own weak labels AND a positive-rate inside [0.3, 0.7] (the
    uncentered-feature failure mode was pos_rate == 1.0)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w, b = train_quality_probe(docs)
    X, y = _feats_numpy(spark)
    p = 1.0 / (1.0 + np.exp(-(X @ np.array(w) + b)))
    pred = p >= 0.5
    acc = (pred == y.astype(bool)).mean()
    assert acc >= 0.85, acc
    assert 0.3 <= pred.mean() <= 0.7, pred.mean()


def test_quality_features_on_crafted_doc(spark):
    """Hand-computed feature values: 4 words, 'the' twice (1 distinct
    stopword), one non-alpha token."""
    docs = spark.createDataFrame(
        [(1, "the jumping fox the 123", "en", "src0", 23)],
        "doc_id long, text string, lang string, source string, n_chars long")
    r = quality_features(docs).collect()[0]
    # 5 words, 19 non-space chars, 4 distinct, 1 distinct stopword, 4 alpha
    assert r.x1 == 5 / 100.0 - CENTERS[0]
    assert r.x2 == (19 / 5) / 10.0 - CENTERS[1]
    assert r.x3 == 4 / 5 - CENTERS[2]
    assert r.x4 == 1 / 10.0 - CENTERS[3]
    assert r.x5 == 4 / 5 - CENTERS[4]
    assert r.y == 0.0  # fails r_word_count (5 < 50)
