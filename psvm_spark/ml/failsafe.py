"""Failsafe checkpointing for driver-coordinated iterative solvers
(SURVEY.md A18 — psvm's ``-failsafe`` flag periodically persists IPM
state so training resumes after a machine failure).

Spark already gives task/stage-level recovery through lineage; what it
does NOT give is recovery of the *driver-side* iterate of an iterative
algorithm (psvm's alpha/lambda/xi; here the eigenvector estimate).
``FailsafeState`` persists that iterate atomically every k iterations;
``power_iteration`` is the demonstrator — a genuinely distributed
iterative algorithm (each step is one scan + per-dimension aggregation,
the same shape as an IPM/OWLQN step) that resumes mid-run and produces
the identical result (tests/test_ml.py).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FailsafeState:
    """Atomic save/load of a named bundle of numpy arrays + step counter."""

    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    def save(self, step: int, arrays: dict[str, np.ndarray]) -> None:
        tmp = tempfile.NamedTemporaryFile(dir=self.dir, suffix=".tmp", delete=False)
        np.savez(tmp, **arrays)
        tmp.close()
        os.replace(tmp.name, os.path.join(self.dir, f"state_{step:08d}.npz"))
        meta_tmp = os.path.join(self.dir, "latest.json.tmp")
        with open(meta_tmp, "w") as f:
            json.dump({"step": step}, f)
        os.replace(meta_tmp, os.path.join(self.dir, "latest.json"))

    def load_latest(self) -> tuple[int, dict[str, np.ndarray]] | None:
        meta = os.path.join(self.dir, "latest.json")
        if not os.path.exists(meta):
            return None
        step = json.load(open(meta))["step"]
        with np.load(os.path.join(self.dir, f"state_{step:08d}.npz")) as z:
            return step, {k: z[k] for k in z.files}


def _matvec(df: DataFrame, vec_col: str, v: np.ndarray) -> np.ndarray:
    """One distributed step: w = X^T (X v), no driver-side row loop.

    Each partition computes its partial X_p^T (X_p v) with one NumPy
    GEMM against the broadcast iterate (Arrow-batched mapInPandas); the
    driver sums the per-partition partials — literally psvm's
    per-rank-partial + AllReduce.  The plan is tiny and constant-shape,
    so per-iteration cost is the data pass, not Catalyst re-analysis of
    a dim-wide expression (which dominated an expression-based matvec).
    """
    import pandas as pd

    spark = df.sparkSession
    bv = spark.sparkContext.broadcast(np.asarray(v, dtype=np.float64))

    def part(batches):
        import numpy as _np

        acc = _np.zeros(len(bv.value))
        for pdf in batches:
            if len(pdf):
                X = _np.stack(pdf["x"].to_numpy()).astype(_np.float64)
                acc += X.T @ (X @ bv.value)
        yield pd.DataFrame({"partial": [list(acc)]})

    parts = (
        df.select(F.col(vec_col).alias("x")).mapInPandas(part, "partial array<double>").collect()
    )
    w = np.zeros(len(v))
    for r in parts:
        w += np.array(r.partial)
    return w


def power_iteration(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_iter: int = 10,
    state: FailsafeState | None = None,
    checkpoint_every: int = 3,
) -> tuple[np.ndarray, float]:
    """Top eigenvector/eigenvalue of X^T X by power iteration, resumable.

    Returns (unit eigenvector, Rayleigh quotient).  With ``state`` set,
    restarting after any crash re-enters at the last checkpointed
    iteration and yields the identical result (deterministic start, no
    RNG).
    """
    start = 0
    v = np.ones(dim) / np.sqrt(dim)
    if state is not None:
        restored = state.load_latest()
        if restored is not None:
            start, arrays = restored
            v = arrays["v"]
    lam = 0.0
    for it in range(start, n_iter):
        w = _matvec(df, vec_col, v)
        lam = float(v @ w)
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            break
        v = w / nrm
        if state is not None and (it + 1) % checkpoint_every == 0:
            state.save(it + 1, {"v": v})
    return v, lam
