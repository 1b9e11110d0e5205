"""Plot utilities (reference: slowfast/visualization/utils.py:15-165)."""

from __future__ import annotations

import numpy as np


def get_confusion_matrix(preds: np.ndarray, labels: np.ndarray,
                         num_classes: int, normalize: str = "true"):
    """Row-normalized confusion matrix from score matrices."""
    from sklearn.metrics import confusion_matrix

    if preds.ndim == 2:
        preds = preds.argmax(-1)
    cm = confusion_matrix(
        labels, preds, labels=list(range(num_classes)),
        normalize=normalize,
    )
    return np.nan_to_num(cm)


def plot_confusion_matrix(cmtx, num_classes, class_names=None, figsize=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if class_names is None or not isinstance(class_names, list):
        class_names = [str(i) for i in range(num_classes)]
    figure = plt.figure(figsize=figsize)
    plt.imshow(cmtx, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion matrix")
    plt.colorbar()
    tick_marks = np.arange(len(class_names))
    plt.xticks(tick_marks, class_names, rotation=45)
    plt.yticks(tick_marks, class_names)
    threshold = cmtx.max() / 2.0 if cmtx.size else 0.5
    for i in range(cmtx.shape[0]):
        for j in range(cmtx.shape[1]):
            color = "white" if cmtx[i, j] > threshold else "black"
            plt.text(j, i, format(cmtx[i, j], ".2f") if cmtx[i, j] != 0 else ".",
                     horizontalalignment="center", color=color)
    plt.tight_layout()
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    return figure


def plot_topk_histogram(class_idx, histogram, topk=10, class_names=None,
                        figsize=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ranks = np.argsort(-np.asarray(histogram))[:topk]
    if class_names is None or not isinstance(class_names, list):
        class_names = [str(i) for i in range(len(histogram))]
    fig = plt.figure(figsize=figsize)
    plt.bar(range(len(ranks)), [histogram[r] for r in ranks])
    plt.xticks(range(len(ranks)), [class_names[r] for r in ranks], rotation=45)
    name = (class_names[class_idx] if class_idx < len(class_names)
            else str(class_idx))
    plt.title(f"Top predictions for true class {name}")
    plt.tight_layout()
    return fig
