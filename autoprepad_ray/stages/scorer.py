"""Sample-fit PCA reconstruction-error anomaly scorer — the reference's
F14 "model scorer" slot (reference ``pipelines/runs.py:162`` fits a pyod
estimator on the transformed wide matrix and ``runs.py:198`` scores via
``decision_function``; pyod's PCA detector scores a row by its squared
reconstruction error after projecting the standardized row onto the top
principal components).

Execution shape: fit = numpy SVD on a BOUNDED sample collected on the
driver (O(sample_rows), never O(n) — the model is a few KB of
components); score = stateless ``map_batches`` with the fitted state
broadcast once via ``ray.put``, one matmul per batch.  The per-row
score is independent of batching, so results are deterministic under
any block layout.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray


@dataclass
class PCAState:
    cols: tuple
    mean: np.ndarray          # (d,)
    scale: np.ndarray         # (d,) std, zeros replaced by 1
    components: np.ndarray    # (k, d) top right-singular vectors


def _matrix_from(batch: pa.Table, cols) -> np.ndarray:
    return np.column_stack([
        batch[c].cast(pa.float64()).to_numpy(zero_copy_only=False)
        for c in cols])


def fit_pca_scorer(ds, cols, *, n_components: int | None = None,
                   sample_rows: int = 100_000) -> PCAState:
    """Standardize + SVD on the first ``sample_rows`` rows."""
    sampled = []
    remaining = sample_rows
    for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        M = _matrix_from(b, cols)
        sampled.append(M[:remaining])
        remaining -= len(M)
        if remaining <= 0:
            break
    if not sampled or not sum(len(s) for s in sampled):
        raise ValueError(
            "fit_pca_scorer: dataset yielded no rows to sample — "
            "cannot fit on an empty input")
    X = np.concatenate(sampled)
    mean = X.mean(axis=0)
    scale = X.std(axis=0)
    scale[scale == 0] = 1.0
    Xs = (X - mean) / scale
    k = n_components or max(1, min(Xs.shape) // 2)
    _, _, Vt = np.linalg.svd(Xs, full_matrices=False)
    return PCAState(cols=tuple(cols), mean=mean, scale=scale,
                    components=Vt[:k])


def pca_scores(ds, state: PCAState, *, out_col: str = "pca_score"):
    """Append the squared reconstruction error per row (stateless map,
    state broadcast once)."""
    state_ref = ray.put(state)

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        X = _matrix_from(batch, st.cols)
        Xs = (X - st.mean) / st.scale
        proj = Xs @ st.components.T
        err = ((Xs - proj @ st.components) ** 2).sum(axis=1)
        return batch.append_column(out_col, pa.array(err))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
