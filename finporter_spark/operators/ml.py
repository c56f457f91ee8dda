"""Distributed classical-ML trainers expressed as algebraic aggregates.

The corpus-quality classifier a curation pipeline actually ships (a
logistic regression over cheap text features — the FastText/CCNet-style
quality gate) trains with batch gradient descent where EVERY iteration
is one map-side-combinable aggregation:

    grad_j = mean((sigmoid(w·x) − y) · x_j)      (one groupBy-less agg)
    w'     = w − lr · grad

Data passes: ``iters`` scans (cache the tiny feature projection);
driver state: the weight vector (|features| doubles) — the same
dataset-state pattern as ``similarity.kmeans_fit`` (centroids) and
``graph.pagerank`` (unrolled iterations). Nothing row-wise ever reaches
the driver.

Cross-engine determinism (the l22 canon): each iteration's MEAN
gradient is rounded to 6 dp inside the aggregation, so an independent
engine (the DuckDB oracle unrolls the same iterations as CTEs) computes
bit-identical weights; per-row sigmoid ulp noise and double-sum reorder
noise are ~1e-15 and vanish under the rounding.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def sigmoid(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def _dot(weights: Sequence[float], cols: Sequence[str]) -> Column:
    z = F.lit(float(weights[0])) * F.col(cols[0])
    for w, c in zip(weights[1:], cols[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logreg_fit(
    feat: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 3,
) -> list[float]:
    """Batch-GD logistic regression; returns the learned weights (one
    per feature column — include a constant 1.0 column for the bias).
    Deterministic: zero init, fixed iteration count, 6 dp-rounded mean
    gradients."""
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        resid = sigmoid(_dot(w, feature_cols)) - F.col(label_col)
        grads = feat.agg(
            *[
                F.round(F.avg(resid * F.col(c)), 6).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).first()
        if grads is None or grads["g0"] is None:
            raise ValueError(
                "logreg_fit: empty feature frame (no rows to average)"
            )
        w = [wj - lr * grads[f"g{j}"] for j, wj in enumerate(w)]
    return w


def logreg_score(
    feat: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str],
    out_col: str = "prob",
) -> DataFrame:
    """Map-side scoring with literal learned weights (no join, no
    shuffle — the weights ride the plan as constants)."""
    return feat.withColumn(
        out_col, F.round(sigmoid(_dot(weights, feature_cols)), 6)
    )
