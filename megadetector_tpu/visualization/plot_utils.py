"""
Plotting helpers: precision-recall curves, confidence histograms, and
calibration (reliability) plots.

Behavioral contract follows the reference
(megadetector/visualization/plot_utils.py:20-254). matplotlib is imported
lazily (headless Agg backend) so the rest of the framework never needs it.
"""

import numpy as np


def _get_plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def precision_recall_curve(y_true, y_scores):
    """
    Compute a P/R curve without sklearn. Returns
    (precisions, recalls, thresholds) sorted by descending threshold.
    """

    y_true = np.asarray(y_true, bool)
    y_scores = np.asarray(y_scores, float)
    order = np.argsort(-y_scores)
    y_true = y_true[order]
    y_scores = y_scores[order]

    tp = np.cumsum(y_true)
    fp = np.cumsum(~y_true)
    n_pos = max(int(y_true.sum()), 1)

    precisions = tp / np.maximum(tp + fp, 1)
    recalls = tp / n_pos
    return precisions, recalls, y_scores


def average_precision(y_true, y_scores):
    """AP = area under the P/R curve (step interpolation)."""

    precisions, recalls, _ = precision_recall_curve(y_true, y_scores)
    recalls = np.concatenate([[0.0], recalls])
    precisions = np.concatenate([[1.0], precisions])
    return float(np.sum(np.diff(recalls) * precisions[1:]))


def plot_precision_recall_curve(y_true, y_scores, output_file=None,
                                title='Precision-recall'):
    """Render a P/R curve to [output_file]; returns the AP."""

    precisions, recalls, _ = precision_recall_curve(y_true, y_scores)
    ap = average_precision(y_true, y_scores)
    if output_file is not None:
        plt = _get_plt()
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.plot(recalls, precisions)
        ax.set_xlabel('Recall')
        ax.set_ylabel('Precision')
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1.02)
        ax.set_title('{} (AP = {:.3f})'.format(title, ap))
        ax.grid(alpha=0.3)
        fig.savefig(output_file, bbox_inches='tight', dpi=120)
        plt.close(fig)
    return ap


def expected_calibration_error(y_true, y_scores, n_bins=10):
    """
    ECE over equal-width confidence bins
    (reference: plot_utils.py:209).
    """

    y_true = np.asarray(y_true, float)
    y_scores = np.asarray(y_scores, float)
    bins = np.linspace(0, 1, n_bins + 1)
    ece = 0.0
    n = len(y_scores)
    for i in range(n_bins):
        mask = (y_scores >= bins[i]) & (y_scores < bins[i + 1])
        if i == n_bins - 1:
            mask |= y_scores == 1.0
        if not mask.any():
            continue
        accuracy = y_true[mask].mean()
        confidence = y_scores[mask].mean()
        ece += (mask.sum() / n) * abs(accuracy - confidence)
    return float(ece)


def plot_calibration_curve(y_true, y_scores, output_file=None, n_bins=10,
                           title='Calibration'):
    """Reliability diagram; returns the ECE."""

    ece = expected_calibration_error(y_true, y_scores, n_bins)
    if output_file is not None:
        plt = _get_plt()
        y_true = np.asarray(y_true, float)
        y_scores = np.asarray(y_scores, float)
        bins = np.linspace(0, 1, n_bins + 1)
        centers, accuracies = [], []
        for i in range(n_bins):
            mask = (y_scores >= bins[i]) & (y_scores < bins[i + 1])
            if not mask.any():
                continue
            centers.append((bins[i] + bins[i + 1]) / 2)
            accuracies.append(y_true[mask].mean())
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.plot([0, 1], [0, 1], '--', color='gray')
        ax.bar(centers, accuracies, width=1.0 / n_bins, alpha=0.7,
               edgecolor='black')
        ax.set_xlabel('Confidence')
        ax.set_ylabel('Accuracy')
        ax.set_title('{} (ECE = {:.3f})'.format(title, ece))
        fig.savefig(output_file, bbox_inches='tight', dpi=120)
        plt.close(fig)
    return ece


def plot_confidence_histogram(scores, output_file=None, n_bins=50,
                              title='Confidence histogram'):
    """Histogram of detection confidences."""

    if output_file is not None:
        plt = _get_plt()
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.hist(np.asarray(scores, float), bins=n_bins, range=(0, 1))
        ax.set_xlabel('Confidence')
        ax.set_ylabel('Count')
        ax.set_title(title)
        fig.savefig(output_file, bbox_inches='tight', dpi=120)
        plt.close(fig)
    return np.histogram(np.asarray(scores, float), bins=n_bins,
                        range=(0, 1))
