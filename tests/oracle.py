"""Pure-numpy single-process oracle re-implementing the reference formulas.

Each function cites the reference file:line it mirrors (under
/root/reference).  Used by the test suite to pin engine parity without
importing or executing the reference (sklearn/pyod absent in sandbox).
"""

from __future__ import annotations

import numpy as np


def tukey_fit(train: np.ndarray, factor: float = 1.5,
              axis=None) -> tuple[np.ndarray, np.ndarray]:
    """Fences from train quantiles — TukeyTransformer.py:36-42.

    The reference computes np.quantile with NO axis (global-flattened,
    SURVEY §1.1); pass axis=0 for the per-column engine default.
    """
    q1 = np.quantile(train, 0.25, axis=axis)
    q3 = np.quantile(train, 0.75, axis=axis)
    iqr = q3 - q1
    return q1 - factor * iqr, q3 + factor * iqr


def tukey_flags(x: np.ndarray, lo, hi) -> np.ndarray:
    """Flag = (x < lo) | (x > hi) as int — TukeyTransformer.py:44-54."""
    return (((x < lo) | (x > hi)) & ~np.isnan(x)).astype(int)


def mad_fit(train: np.ndarray, axis=None) -> tuple[np.ndarray, np.ndarray]:
    """median + MAD — MedianAbsolutDeviation.py:40-42 (global-flattened)."""
    med = np.median(train, axis=axis)
    mad = np.median(np.abs(train - med), axis=axis)
    return med, mad


def mad_flags(x: np.ndarray, med, mad, threshold: float = 3.5) -> np.ndarray:
    """Modified Z 0.6745*(x-med)/MAD, flag |z|>threshold —
    MedianAbsolutDeviation.py:44-61; mad==0 -> flags 0 (engine-defined)."""
    mad_arr = np.broadcast_to(np.asarray(mad, dtype=float), np.shape(x))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = 0.6745 * (x - med) / mad_arr
    flags = (np.abs(z) > threshold) & ~np.isnan(x) & (mad_arr > 0)
    return flags.astype(int)


def z_fit(train: np.ndarray, axis=None) -> tuple[np.ndarray, np.ndarray]:
    """mean + std(ddof=1) — ZTransformerMean.py:36-39."""
    return np.mean(train, axis=axis), np.std(train, ddof=1, axis=axis)


def z_flags(x: np.ndarray, mean, std, threshold: float = 3.0) -> np.ndarray:
    """|x-mean|/std > threshold; std==0 -> zeros — ZTransformerMean.py:41-58."""
    std_arr = np.broadcast_to(np.asarray(std, dtype=float), np.shape(x))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (x - mean) / std_arr
    return ((np.abs(z) > threshold) & (std_arr > 0) & ~np.isnan(x)).astype(int)


def minmax_scale(scores: np.ndarray) -> np.ndarray:
    """MinMaxScaler fit on the scores themselves — runs.py:200-201."""
    lo, hi = scores.min(), scores.max()
    if hi == lo:
        return np.zeros_like(scores, dtype=float)
    return (scores - lo) / (hi - lo)


def percentile_labels(scores: np.ndarray, pct: float = 0.10) -> np.ndarray:
    """threshold = np.percentile(scores, 100*(1-pct)); label = score > thr
    — runs.py:211-214."""
    thr = np.percentile(scores, 100 * (1 - pct))
    return (scores > thr).astype(int)


def psi(ref_counts: np.ndarray, cur_counts: np.ndarray) -> float:
    """Population Stability Index with +0.5 Laplace smoothing per bin
    (engine-defined; no reference analogue — drift replaces the model score)."""
    ref_counts = np.asarray(ref_counts, dtype=float)
    cur_counts = np.asarray(cur_counts, dtype=float)
    b = len(ref_counts)
    p = (ref_counts + 0.5) / (ref_counts.sum() + 0.5 * b)
    q = (cur_counts + 0.5) / (cur_counts.sum() + 0.5 * b)
    return float(np.sum((p - q) * np.log(p / q)))


def ks_stat(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov–Smirnov statistic (exact, from sorted data)."""
    allv = np.concatenate([a, b])
    allv.sort(kind="mergesort")
    cdf_a = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    cdf_b = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    return float(np.max(np.abs(cdf_a - cdf_b)))
