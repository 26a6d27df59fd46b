"""Text-analysis stages: language-ID heuristic, quality scoring, token
counting, fingerprinting — thin ``map_batches`` wrappers over
``functions.strings`` kernels (quality/tokens/fingerprints are exercised
by the SQL-checked queries; langid is heuristic, rows-only checked).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "en"},
}


class LangId:
    """Actor-pool callable: per-language stopword tables built once.

    N-gram-free heuristic: argmax over per-language stopword hit rate;
    'und' (undetermined) when no language scores above ``min_score``.
    """

    def __init__(self, text_col: str, *, min_score: float = 0.05):
        self.text_col = text_col
        self.min_score = min_score
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].fillna("").str.lower() \
            .str.split(r"\s+", regex=True)
        langs, scores = [], []
        for ws in toks:
            ws = ws if isinstance(ws, list) else []
            n = max(1, len(ws))
            best_lang, best = "und", 0.0
            for lang, table in self.tables.items():
                s = sum(1 for w in ws if w in table) / n
                if s > best:
                    best_lang, best = lang, s
            if best < self.min_score:
                best_lang = "und"
            langs.append(best_lang)
            scores.append(round(best, 6))
        out = df.copy()
        out["lang_pred"] = langs
        out["lang_score"] = scores
        return out


def lang_id(ds, text_col: str = "text", *, concurrency: int | None = None,
            batch_size: int = 1024):
    if concurrency is None:
        from .. context import default_pool_size
        concurrency = default_pool_size()
    return ds.map_batches(LangId, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size,
                          fn_constructor_kwargs={"text_col": text_col})
