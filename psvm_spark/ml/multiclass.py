"""Simultaneous multiclass linear SVM (SURVEY.md A10, multiclass case).

MLlib's ``OneVsRest(LinearSVC)`` trains k independent models, so a
k-class problem costs k full training runs over the data — at 100 TB
that is k× the scan volume, and on any cluster it is k× the scheduler
load (measured here: 10-class OvR at sf0.1 is ~12 s of mostly job
overhead).  This trainer instead optimizes all k one-vs-rest hinge
losses in a SINGLE pass per iteration:

  - the driver holds W (k × d) and broadcasts it each step;
  - every partition computes its partial sub-gradient for ALL classes
    with two NumPy GEMMs (scores = X Wᵀ, grad = -(Y∘1[margin<1])ᵀ X),
    Arrow-batched via ``mapInPandas``;
  - the driver sums the k×d partials and takes a deterministic
    gradient step (fixed learning rate + L2) — the same per-rank
    partial + AllReduce shape as the reference's IPM steps
    [psvm:pd_ipm.cc — SURVEY.md A10; file:line unavailable, §0.1].

Scan volume per iteration is independent of k, communication is one
k×d matrix per partition per step (k·d doubles, ~5 KB here), and the
whole run is n_iter + 1 Spark jobs regardless of class count.  No RNG
anywhere: W starts at zero, so the result is bit-reproducible under
any partitioning (float summation order is fixed by the driver-side
ordered reduce over sorted partition ids).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_grads(df: DataFrame, vec_col: str, label_col: str, W: np.ndarray):
    """One distributed pass: per-partition hinge sub-gradients for all
    classes, plus (n_rows, n_hinge_violations) bookkeeping."""
    import pandas as pd

    spark = df.sparkSession
    bW = spark.sparkContext.broadcast(np.asarray(W, dtype=np.float64))

    # Self-contained closure: executors can't import psvm_spark.
    def part(batches):
        import numpy as _np
        from pyspark import TaskContext

        Wv = bW.value
        k, d = Wv.shape
        G = _np.zeros((k, d))
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = _np.stack(pdf["x"].to_numpy()).astype(_np.float64)
            lab = pdf["y"].to_numpy().astype(_np.int64)
            Y = -_np.ones((len(X), k))
            Y[_np.arange(len(X)), lab] = 1.0
            margins = Y * (X @ Wv.T)
            viol = (margins < 1.0).astype(_np.float64)
            G -= (Y * viol).T @ X
            n += len(X)
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame({"pid": [pid], "n": [n], "g": [list(G.ravel())]})

    rows = (
        df.select(F.col(vec_col).alias("x"), F.col(label_col).alias("y"))
        .mapInPandas(part, "pid int, n long, g array<double>")
        .collect()
    )
    k, d = W.shape
    G = np.zeros((k, d))
    n = 0
    # fixed reduce order (by partition id) -> deterministic float sums
    for r in sorted(rows, key=lambda r: r.pid):
        G += np.array(r.g).reshape(k, d)
        n += r.n
    return G, n


def train_multiclass_hinge(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    n_classes: int,
    dim: int,
    n_iter: int = 8,
    lr: float = 0.5,
    reg: float = 1e-3,
) -> np.ndarray:
    """Full-batch sub-gradient descent on k simultaneous OvR hinge
    losses; returns W (k × d).  One Spark job per iteration."""
    W = np.zeros((n_classes, dim))
    for _ in range(n_iter):
        G, n = _partial_grads(df, vec_col, label_col, W)
        if n == 0:
            break
        W -= lr * (G / n + reg * W)
    return W


def eval_multiclass(
    df: DataFrame, vec_col: str, label_col: str, W: np.ndarray
) -> DataFrame:
    """argmax_c w_c·x accuracy in one distributed pass."""
    import pandas as pd

    spark = df.sparkSession
    bW = spark.sparkContext.broadcast(np.asarray(W, dtype=np.float64))

    def score(batches):
        import numpy as _np

        correct = 0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = _np.stack(pdf["x"].to_numpy()).astype(_np.float64)
            pred = _np.argmax(X @ bW.value.T, axis=1)
            correct += int((pred == pdf["y"].to_numpy()).sum())
            n += len(X)
        yield pd.DataFrame({"correct": [correct], "n": [n]})

    parts = (
        df.select(F.col(vec_col).alias("x"), F.col(label_col).alias("y"))
        .mapInPandas(score, "correct long, n long")
    )
    return parts.agg(
        F.sum("correct").alias("n_correct"),
        F.sum("n").alias("n_test"),
        (F.sum("correct") / F.sum("n")).alias("accuracy"),
    )
