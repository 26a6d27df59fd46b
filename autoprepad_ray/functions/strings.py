"""String scalar functions: NaN-token canonicalization, shape patterns,
text-quality metrics, fingerprints — all vectorized per batch.

Reference provenance:
- NaN tokens {"NaN","nan"," ",""} -> null: XCopySchemaTransformer.py:55-63.
- char-class shape codes (upper/lower/digit/other per char) + length:
  CategoricalPatterns.py:46-83 — the engine emits a readable shape
  alphabet (A/a/9/#) instead of the reference's 2-bit BitArray hex, same
  information, SQL-mirrorable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NAN_TOKENS = ("NaN", "nan", " ", "")


def canonicalize_nan_tokens(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Map the reference's string NaN tokens to real nulls
    (XCopySchemaTransformer.py:55-63).

    The input is COMPACTED to offset 0 first: pyarrow 16.1's ``if_else``
    with a null string scalar SILENTLY CORRUPTS values when the string
    array is an offset slice (zero-copy batches sliced by batch_size hit
    this) — regression-pinned in tests/test_row_checks.py."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])
    mask = pc.is_in(arr, value_set=pa.array(NAN_TOKENS))
    return pc.if_else(mask, pa.scalar(None, type=pa.string()), arr)


def shape_pattern(series: pd.Series) -> pd.Series:
    """Char-class shape: upper->A, lower->a, digit->9, other->#
    (CategoricalPatterns.py:57-75 re-expressed).  Vectorized regex chain;
    mirrored 1:1 by the oracle SQL regexp_replace chain."""
    s = series.astype("string")
    s = s.str.replace(r"[A-Z]", "A", regex=True)
    s = s.str.replace(r"[a-z]", "a", regex=True)
    s = s.str.replace(r"[0-9]", "9", regex=True)
    s = s.str.replace(r"[^Aa9]", "#", regex=True)
    return s


def reference_bit_pattern(series: pd.Series) -> pd.Series:
    """EXACT reference encoding (CategoricalPatterns.py:57-75): per char
    upper->'00', lower->'01', digit->'10', other->'11'; '0' prepended;
    rendered as ``str(BitArray(bin=bits))``.  The bit length is always
    odd (2n+1), and bitstring renders non-nibble-aligned values in
    binary form — i.e. ``'0b' + bits`` — so the encoding is reproduced
    here without the bitstring dependency.  Nulls stay null."""
    def enc(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        bits = []
        for ch in str(v):
            if ch.isupper():
                bits.append("00")
            elif ch.islower():
                bits.append("01")
            elif ch.isdigit():
                bits.append("10")
            else:
                bits.append("11")
        return "0b0" + "".join(bits)

    return series.map(enc)


def word_counts(series: pd.Series) -> pd.Series:
    """Whitespace token count (trimmed); empty -> 0."""
    t = series.fillna("").str.strip()
    n = t.str.split(r"\s+", regex=True).str.len()
    return n.where(t.str.len() > 0, 0).astype("int64")


def stopword_ratio(series: pd.Series, stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to")) -> pd.Series:
    """Share of tokens that are stopwords — a quality-score component."""
    toks = series.fillna("").str.strip().str.split(r"\s+", regex=True)
    n = word_counts(series)

    sw = frozenset(stopwords)
    hits = toks.map(lambda ws: sum(1 for w in ws if w in sw) if isinstance(ws, list) else 0)
    return (hits / n.replace(0, 1)).where(n > 0, 0.0)


def punct_ratio(series: pd.Series) -> pd.Series:
    """Share of non-alphanumeric-non-space chars — quality component."""
    t = series.fillna("")
    total = t.str.len()
    punct = t.str.count(r"[^A-Za-z0-9\s]")
    return (punct / total.replace(0, 1)).where(total > 0, 0.0)


def md5_fingerprint(series: pd.Series) -> pd.Series:
    """Document fingerprint (md5 hex) — mirrored by DuckDB md5().

    Per-row hashlib is acceptable for a fingerprint column (bounded by
    IO, not CPU); the pure-speed path for dedup keys is
    ``sketches.hash64`` (vectorized C)."""
    return series.fillna("").map(
        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def char_ngrams(text: str, n: int = 5) -> np.ndarray:
    """Character shingles for Jaccard / MinHash."""
    if len(text) < n:
        return np.array([text], dtype=object) if text else np.array([], dtype=object)
    return np.array([text[i:i + n] for i in range(len(text) - n + 1)],
                    dtype=object)


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        return np.array([" ".join(toks)], dtype=object) if toks else np.array([], dtype=object)
    return np.array([" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)],
                    dtype=object)
