"""Sample-fit iterative (MICE-style) imputer — the reference's F4
``IterativeImputer`` slot (reference ``configuration.py:218,244`` wires
sklearn's IterativeImputer over the numeric block; sklearn fits a
round-robin of per-column regressors and ``transform`` replays the
fitted sequence).

Engine semantics, scale shape mirroring :mod:`stages.scorer`:

- **fit** runs on a BOUNDED driver sample (O(sample_rows), never O(n));
  missing cells start at the column means (sklearn
  ``initial_strategy='mean'``), then ``iters`` round-robin sweeps fit a
  ridge-regularized linear regressor for each incomplete column on the
  currently-imputed other columns and refresh that column's missing
  cells.  The fitted artifact is the ordered regressor sequence — a few
  KB.
- **transform** broadcasts the state once (``ray.put``) and replays the
  sequence per batch with pure matmuls (exactly sklearn's
  ``transform``-replays-``imputation_sequence_`` contract), so results
  are deterministic and independent of block layout.

The iterative model itself is why the reference marked this
non-mergeable: regressors depend on globally-imputed values.  The
bounded-sample fit is the same resolution the engine uses for the PCA
scorer (F14) — the model is small, the data pass is streaming.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray


@dataclass
class IterativeImputerState:
    cols: tuple
    means: np.ndarray                 # (d,) initial fill
    # ordered replay sequence: (target_col_idx, intercept, coefs[d-1])
    steps: list


def _matrix_from(batch: pa.Table, cols) -> np.ndarray:
    return np.column_stack([
        batch[c].cast(pa.float64()).to_numpy(zero_copy_only=False)
        for c in cols])


def fit_iterative_imputer(ds, cols, *, sample_rows: int = 100_000,
                          iters: int = 5, ridge: float = 1e-3
                          ) -> IterativeImputerState:
    """Mean-init + round-robin ridge sweeps on the first sample_rows."""
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
            "fit_iterative_imputer: dataset yielded no rows to sample")
    X = np.concatenate(sampled)
    d = X.shape[1]
    miss = np.isnan(X)
    means = np.nanmean(X, axis=0)
    means = np.where(np.isnan(means), 0.0, means)
    Xf = np.where(miss, means[None, :], X)
    steps: list = []
    incomplete = [j for j in range(d) if miss[:, j].any()]
    for _ in range(iters):
        for j in incomplete:
            obs = ~miss[:, j]
            others = [k for k in range(d) if k != j]
            A = Xf[obs][:, others]
            y = X[obs, j]
            if not len(y):
                continue
            # centered ridge: (A'A + lam I) w = A'y
            am = A.mean(axis=0)
            ym = y.mean()
            Ac = A - am
            G = Ac.T @ Ac + ridge * np.eye(len(others))
            w = np.linalg.solve(G, Ac.T @ (y - ym))
            b0 = ym - am @ w
            steps.append((j, float(b0), w))
            Xf[miss[:, j], j] = b0 + Xf[miss[:, j]][:, others] @ w
    return IterativeImputerState(cols=tuple(cols), means=means,
                                 steps=steps)


def iterative_impute(ds, state: IterativeImputerState, *,
                     flag_suffix: str = "_was_missing"):
    """Replay the fitted sequence per batch; imputed columns replace the
    originals and each incomplete column gains an int8 missing flag
    (the reference keeps MissingIndicator columns beside imputed ones,
    M10/M11)."""
    state_ref = ray.put(state)

    def impute(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        X = _matrix_from(batch, st.cols)
        miss = np.isnan(X)
        Xf = np.where(miss, st.means[None, :], X)
        d = len(st.cols)
        for j, b0, w in st.steps:
            others = [k for k in range(d) if k != j]
            Xf[miss[:, j], j] = b0 + Xf[miss[:, j]][:, others] @ w
        flagged = {j for j, _, _ in st.steps}
        for k, c in enumerate(st.cols):
            batch = batch.set_column(
                batch.column_names.index(c), c, pa.array(Xf[:, k]))
        for k in sorted(flagged):
            batch = batch.append_column(
                st.cols[k] + flag_suffix,
                pa.array(miss[:, k].astype(np.int8)))
        return batch

    return ds.map_batches(impute, batch_format="pyarrow",
                          zero_copy_batch=True)
