"""Classical ML layer: SVC on the precomputed quantum kernel.

Reproduces the reference's train/eval loop exactly (main.py:196-236): a
sweep over the regularization constants, ``SVC(kernel="precomputed", C,
tol=1e-3)`` fit on the train Gram, metrics accuracy/precision/recall/ROC-AUC,
results saved as rows ``[C, accuracy, precision, recall, auc]``.
``classical_rbf_sweep`` is the Gaussian-kernel baseline
(runs/table2/classical_main.py).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    precision_score,
    recall_score,
    roc_auc_score,
)
from sklearn.svm import SVC

# The reference's regularization sweep (main.py:197).
REGULARIZATION_SWEEP = [4, 3.5, 3, 2.5, 2, 1.5, 1, 0.5, 0.1, 0.05, 0.01]


def _metric_rows(svc_factory, fit_x, fit_y, eval_x, eval_y, reg, verbose):
    results = []
    for r in reg:
        if verbose:
            print("coeff: ", r)
        svc = svc_factory(r)
        svc.fit(fit_x, fit_y)
        pred = svc.predict(eval_x)
        accuracy = accuracy_score(eval_y, pred)
        precision = precision_score(eval_y, pred)
        recall = recall_score(eval_y, pred)
        auc = roc_auc_score(eval_y, pred)
        if verbose:
            print("accuracy: ", accuracy)
            print("precision: ", precision)
            print("recall: ", recall)
            print("auc: ", auc)
        results.append([r, accuracy, precision, recall, auc])
    return results


def svc_sweep(
    kernel_train: np.ndarray,
    y_train: np.ndarray,
    kernel_test: np.ndarray,
    y_test: np.ndarray,
    reg=None,
    verbose: bool = True,
):
    """Reference main.py:196-236: returns (test_results, train_results),
    each a list of ``[C, accuracy, precision, recall, auc]`` rows."""
    reg = REGULARIZATION_SWEEP if reg is None else reg
    factory = lambda r: SVC(kernel="precomputed", C=r, tol=1e-3, verbose=False)
    test_results = _metric_rows(
        factory, kernel_train, y_train, kernel_test, y_test, reg, verbose
    )
    if verbose:
        print("\n Train Results\n")
    train_results = _metric_rows(
        factory, kernel_train, y_train, kernel_train, y_train, reg, verbose
    )
    return test_results, train_results


def classical_rbf_sweep(x_train, y_train, x_test, y_test, reg=None, verbose=True):
    """Gaussian-kernel baseline (runs/table2/classical_main.py):
    ``SVC(kernel="rbf", gamma="scale")`` over the same C sweep."""
    reg = REGULARIZATION_SWEEP if reg is None else reg
    factory = lambda r: SVC(kernel="rbf", gamma="scale", C=r, tol=1e-3, verbose=False)
    test_results = _metric_rows(factory, x_train, y_train, x_test, y_test, reg, verbose)
    train_results = _metric_rows(factory, x_train, y_train, x_train, y_train, reg, verbose)
    return test_results, train_results
