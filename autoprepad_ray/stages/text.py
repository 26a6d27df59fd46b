"""Text-analysis stages: language-ID heuristic, quality scoring, token
counting, fingerprinting — thin ``map_batches`` wrappers over
``functions.strings`` kernels (quality/tokens/fingerprints are exercised
by the SQL-checked queries; langid is heuristic, rows-only checked).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "en"},
}

_LANGS = list(STOPWORDS)
_TABLES = [frozenset(STOPWORDS[lang]) for lang in _LANGS]


def _langid_frame(df: pd.DataFrame, text_col: str,
                  min_score: float) -> pd.DataFrame:
    """Vectorized stopword language-ID: one explode + per-language isin
    over the whole batch (no per-row Python loop).  Argmax over
    per-language stopword hit rate; 'und' when no language scores above
    ``min_score``.  Stateless — the per-language tables are 4 tiny
    module-level frozensets, so a task (not an actor pool) is the right
    stage shape."""
    df = df.reset_index(drop=True)
    toks = df[text_col].fillna("").str.lower() \
        .str.split(r"\s+", regex=True)
    n = toks.str.len().clip(lower=1).to_numpy(dtype=np.float64)
    ex = toks.explode()
    scores = np.zeros((len(df), len(_LANGS)))
    for j, table in enumerate(_TABLES):
        hits = ex.isin(table).groupby(level=0).sum()
        scores[hits.index.to_numpy(), j] = hits.to_numpy(dtype=np.float64)
    scores /= n[:, None]
    best_j = np.argmax(scores, axis=1)          # ties -> earlier language
    best = scores[np.arange(len(df)), best_j]
    langs = np.where(best >= min_score,
                     np.array(_LANGS, dtype=object)[best_j], "und")
    out = df.copy()
    out["lang_pred"] = langs
    out["lang_score"] = np.round(best, 6)
    return out


def lang_id(ds, text_col: str = "text", *, min_score: float = 0.05,
            concurrency: int | None = None, batch_size: int = 1024):
    del concurrency  # stateless task now; kept for call-site compatibility

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _langid_frame(df, text_col, min_score)

    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)
