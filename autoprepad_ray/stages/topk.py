"""Distributed exact top-k without a global sort.

``Dataset.sort(...).limit(k)`` range-partitions EVERY row to order a
table of which only k rows survive — at 100 TB that is a full
all-to-all exchange for a result that fits in one block.  The global
top-k is always a subset of the union of per-block top-ks, so the
scale-correct shape is: cut each block to its own k rows inside
``map_batches`` (map-side, no exchange), then resolve the ~blocks x k
survivors in one tiny final reduction.  This is the grouped-data
analogue of the reference's worst-first presentation sort
(/root/reference/pipelines/runs.py:429-435), which sorts an in-memory
pandas frame.

Ties must be broken by a unique final key (the callers append a row
id) so the cut is deterministic on any block layout.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _sort_keys(keys: list[str], descending: list[bool]):
    return [(k, "descending" if d else "ascending")
            for k, d in zip(keys, descending)]


def top_k(ds, keys: list[str], *, descending: list[bool], k: int,
          batch_size: int | None = None) -> pd.DataFrame:
    """Exact top-k rows of ``ds`` under the (keys, descending)
    ordering.  One streaming pass (per-block cut), one driver fold of
    blocks x k rows.  Returns a pandas frame sorted best-first."""
    sk = _sort_keys(keys, descending)

    def cut(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.sort_indices(t, sort_keys=sk)[:k])

    parts = ds.map_batches(cut, batch_format="pyarrow",
                           zero_copy_batch=True,
                           **({"batch_size": batch_size}
                              if batch_size else {})).take_all()
    out = pd.DataFrame(parts)
    if out.empty:
        return out
    return (out.sort_values(keys, ascending=[not d for d in descending])
            .head(k).reset_index(drop=True))
