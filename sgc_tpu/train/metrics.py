"""Evaluation metrics.

Parity: reference metrics.py:3-15 (argmax accuracy, sklearn micro/macro F1)
plus the cross-validation aggregate metrics of
downstream/TextSGC_ref/trainv2.py:190-232 (weighted F1 and the confusion-
matrix-derived "Optimized Precision" score). Implemented in numpy/jnp so
the hot path has no sklearn dependency; tests cross-check against sklearn.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def accuracy(logits, labels) -> float:
    """Fraction of rows whose argmax matches the label."""
    preds = jnp.argmax(logits, axis=1)
    return float(jnp.mean((preds == labels).astype(jnp.float32)))


def _per_class_counts(preds: np.ndarray, labels: np.ndarray, n_classes: int):
    tp = np.zeros(n_classes)
    fp = np.zeros(n_classes)
    fn = np.zeros(n_classes)
    for c in range(n_classes):
        tp[c] = np.sum((preds == c) & (labels == c))
        fp[c] = np.sum((preds == c) & (labels != c))
        fn[c] = np.sum((preds != c) & (labels == c))
    return tp, fp, fn


def _f1_from_counts(tp, fp, fn):
    denom = 2 * tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        f = np.where(denom > 0, 2 * tp / denom, 0.0)
    return f


def f1(logits, labels) -> tuple[float, float]:
    """(micro, macro) F1 over argmax predictions.

    Macro averages over classes present in labels OR predictions (matching
    sklearn's default label set).
    """
    preds = np.asarray(jnp.argmax(logits, axis=1))
    labels = np.asarray(labels)
    classes = np.union1d(np.unique(preds), np.unique(labels))
    n = int(classes.max()) + 1 if classes.size else 1
    tp, fp, fn = _per_class_counts(preds, labels, n)
    per_class = _f1_from_counts(tp, fp, fn)[classes.astype(int)]
    micro_tp, micro_fp, micro_fn = tp.sum(), fp.sum(), fn.sum()
    micro = (
        2 * micro_tp / (2 * micro_tp + micro_fp + micro_fn)
        if (2 * micro_tp + micro_fp + micro_fn) > 0
        else 0.0
    )
    return float(micro), float(per_class.mean())


def f1_macro(preds, labels) -> float:
    """Unweighted class-mean F1 over classes present in labels or preds
    (sklearn average='macro' on the union label set; reference
    trainv2.py:195-204 aggregates this over re-read results files)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    classes = np.union1d(np.unique(preds), np.unique(labels))
    n = int(classes.max()) + 1 if classes.size else 1
    tp, fp, fn = _per_class_counts(preds, labels, n)
    return float(_f1_from_counts(tp, fp, fn)[classes.astype(int)].mean())


def f1_weighted(preds, labels) -> float:
    """Support-weighted F1 (sklearn average='weighted')."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    classes = np.unique(labels)
    n = int(max(preds.max(initial=0), labels.max(initial=0))) + 1
    tp, fp, fn = _per_class_counts(preds, labels, n)
    per_class = _f1_from_counts(tp, fp, fn)
    support = np.array([(labels == c).sum() for c in classes], dtype=np.float64)
    return float((per_class[classes] * support).sum() / support.sum())


def optimized_precision(preds, labels) -> float:
    """OP = mean_acc - |mean_spec - mean_recall| / (mean_spec + mean_recall).

    Exactly the reference's per-fold aggregation
    (TextSGC_ref/trainv2.py:204-223): per-class one-vs-rest TP/FP/FN/TN
    from the confusion matrix over the SORTED UNION of classes present in
    labels or predictions (sklearn confusion_matrix's default label set),
    then class-MEAN specificity (TNR), recall (TPR) and one-vs-rest
    accuracy (TP+TN)/(TP+FP+FN+TN) — note mean_acc is the macro mean of
    per-class binary accuracies, NOT overall multiclass accuracy.
    """
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    classes = np.union1d(np.unique(labels), np.unique(preds))
    total = len(labels)
    sens, spec, accs = [], [], []
    for c in classes:
        tp = np.sum((preds == c) & (labels == c))
        fn = np.sum((preds != c) & (labels == c))
        fp = np.sum((preds == c) & (labels != c))
        tn = total - tp - fn - fp
        sens.append(tp / (tp + fn) if (tp + fn) else 0.0)
        spec.append(tn / (tn + fp) if (tn + fp) else 0.0)
        accs.append((tp + tn) / total if total else 0.0)
    se, sp = float(np.mean(sens)), float(np.mean(spec))
    mean_acc = float(np.mean(accs))
    if se + sp == 0:
        return mean_acc
    return mean_acc - abs(sp - se) / (sp + se)
