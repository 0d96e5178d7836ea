"""Byte-for-byte parity of our NumPy metrics against sklearn."""

import numpy as np
import pytest
import sklearn.metrics as skm

from gan_ffn_tpu.evaluation import (
    accuracy_score,
    classification_report,
    confusion_matrix,
    f1_score,
)

rng = np.random.default_rng(0)
N, C = 500, 6
Y_TRUE = rng.integers(0, C, size=N)
Y_PRED = rng.integers(0, C, size=N)
MASK = (rng.random(N) > 0.25).astype(np.float32)


def test_accuracy_parity():
    assert accuracy_score(Y_TRUE, Y_PRED, sample_weight=MASK) == pytest.approx(
        skm.accuracy_score(Y_TRUE, Y_PRED, sample_weight=MASK)
    )
    assert accuracy_score(Y_TRUE, Y_PRED) == pytest.approx(skm.accuracy_score(Y_TRUE, Y_PRED))


@pytest.mark.parametrize("average", ["weighted", "macro", "micro"])
def test_f1_parity(average):
    assert f1_score(Y_TRUE, Y_PRED, sample_weight=MASK, average=average) == pytest.approx(
        skm.f1_score(Y_TRUE, Y_PRED, sample_weight=MASK, average=average)
    )


def test_confusion_matrix_parity():
    np.testing.assert_allclose(
        confusion_matrix(Y_TRUE, Y_PRED, sample_weight=MASK),
        skm.confusion_matrix(Y_TRUE, Y_PRED, sample_weight=MASK),
    )
    np.testing.assert_array_equal(
        confusion_matrix(Y_TRUE, Y_PRED), skm.confusion_matrix(Y_TRUE, Y_PRED)
    )


def test_classification_report_byte_parity_weighted():
    ours = classification_report(Y_TRUE, Y_PRED, sample_weight=MASK, digits=4)
    theirs = skm.classification_report(Y_TRUE, Y_PRED, sample_weight=MASK, digits=4)
    assert ours == theirs


def test_classification_report_byte_parity_unweighted():
    ours = classification_report(Y_TRUE, Y_PRED, digits=4)
    theirs = skm.classification_report(Y_TRUE, Y_PRED, digits=4)
    assert ours == theirs


def test_classification_report_missing_class():
    """A class absent from predictions must not crash and must match sklearn."""
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 0, 1, 1, 1, 0])  # class 2 never predicted
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = skm.classification_report(y_true, y_pred, digits=4, zero_division=0)
    ours = classification_report(y_true, y_pred, digits=4)
    assert ours == theirs
