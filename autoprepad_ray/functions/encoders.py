"""Category encoders (reference F11 BinaryEncoder / F12 OrdinalEncoder):
dictionary maps learned at profile time, applied as stateless vectorized
lookups; unseen categories encode to -1 (OrdinalEncoder
unknown_value=-1, configuration.py:538-541) and are the engine's
"domain violation" signal.

The fitted state is the category->code map — a small broadcastable dict
exactly like the reference's fitted encoder attributes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def ordinal_map(values: np.ndarray) -> dict:
    """Deterministic category -> code map: sorted order, 0-based (both
    sides of the oracle can reproduce it: ROW_NUMBER() OVER (ORDER BY v)
    - 1 on DISTINCT values)."""
    return {v: i for i, v in enumerate(sorted(values.tolist()))}


def ordinal_encode_array(arr, mapping: dict, unknown: int = -1) -> np.ndarray:
    """Vectorized category -> code lookup: one ``np.searchsorted`` over
    the sorted category array instead of a per-value dict ``.map``
    (mixed-type or otherwise non-sortable inputs fall back to the map
    path, matching its NaN -> unknown semantics)."""
    vals = np.asarray(arr if not hasattr(arr, "to_numpy")
                      else arr.to_numpy(zero_copy_only=False), dtype=object)
    if not len(mapping) or not len(vals):
        return np.full(len(vals), unknown, dtype=np.int64)
    cats = np.array(sorted(mapping), dtype=object)
    codes = np.array([mapping[c] for c in cats], dtype=np.int64)
    try:
        null = pd.isna(vals)
        safe = np.where(null, cats[0], vals)
        pos = np.minimum(np.searchsorted(cats, safe), len(cats) - 1)
        hit = (cats[pos] == safe) & ~null
        return np.where(hit, codes[pos], unknown).astype(np.int64)
    except TypeError:
        return pd.Series(vals).map(mapping).fillna(unknown) \
            .to_numpy(np.int64)


def binary_bits(codes: np.ndarray, k: int) -> dict[str, np.ndarray]:
    """ceil(log2 k) bit columns of the ordinal code (BinaryEncoder
    semantics, configuration.py:293); unknown (-1) rows get all-1 bits —
    the 'indicator' analogue of handle_unknown."""
    nbits = max(1, math.ceil(math.log2(max(2, k))))
    out = {}
    safe = np.where(codes < 0, (1 << nbits) - 1, codes)
    for b in range(nbits):
        out[f"bit{b}"] = ((safe >> b) & 1).astype(np.int64)
    return out
