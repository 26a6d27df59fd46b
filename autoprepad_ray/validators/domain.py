"""Domain / format-pattern validators (the engine's analogue of the
reference's encoder-driven category handling F11/F12 — an unseen or
rare category is a domain violation — and of the pattern-extraction
branch M9 applied as a FORMAT check: values whose char-class shape is
rare violate the learned format profile).

Fit phase: category/shape frequency profile (ValueCounts from the
profile job).  Check phase: stateless vectorized membership tests with
the small learned domain broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.strings import shape_pattern


def learned_domain(vc, *, min_frac: float = 0.005,
                   total: int | None = None) -> frozenset:
    """Values considered in-domain: frequency share >= min_frac."""
    vals, cnts = vc.sorted_arrays()
    n = total if total is not None else int(cnts.sum())
    keep = cnts / max(1, n) >= min_frac
    return frozenset(np.asarray(vals)[keep].tolist())


def domain_flags(series: pd.Series, domain: frozenset) -> np.ndarray:
    """1 where the value is outside the learned/declared domain."""
    return (~series.isin(domain) & series.notna()).to_numpy(np.int8)


def format_signature(series: pd.Series) -> pd.Series:
    """Run-collapsed format signature: every alphanumeric run becomes
    ``x<len>``, separators stay literal — a uuid is always
    ``x8-x4-x12`` regardless of its hex digits, while per-char shapes
    (``shape_pattern``) would be unique per value.  This is the format
    profile used for id-like columns."""
    return series.astype("string").str.replace(
        r"[A-Za-z0-9]+", lambda m: f"x{len(m.group())}", regex=True)


def shape_domain_flags(series: pd.Series, shape_domain: frozenset,
                       signature=format_signature) -> np.ndarray:
    """1 where the format signature of the value is outside the learned
    format profile (rare signature => malformed id/uuid/code)."""
    shapes = signature(series)
    return (~shapes.isin(shape_domain) & series.notna()).to_numpy(np.int8)
