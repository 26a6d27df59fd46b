"""Referential-integrity validators: orphan detection between two tables
(image <-> caption partitions in the north rule; FIXTURES.md R4).

The reference's only join is the index-aligned label join for evaluation
(experiment.py:463,513); the engine adds a real distributed anti-join:

- shuffle strategy (default, both sides large): union the two key
  streams tagged by side, pre-aggregate per block, then ONE
  ``groupby(key)`` over (key, left_n, right_n) partials — rows with a
  zero side are orphans.  The shuffle moves distinct keys, not rows.
- broadcast strategy (small right side): ``ray.put`` the key set once,
  anti-filter inside ``map_batches`` — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _side_partial(key_cols: list[str], side: int):
    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(key_cols).group_by(key_cols)
             .aggregate([([], "count_all")]))
        n = g["count_all"]
        zeros = pa.array(np.zeros(len(g), dtype=np.int64))
        cols = {c: g[c] for c in key_cols}
        cols["left_n"] = n if side == 0 else zeros
        cols["right_n"] = n if side == 1 else zeros
        return pa.table(cols)
    return partial


def orphans(left_ds, right_ds, key_cols: list[str] | str, *,
            direction: str = "both"):
    """Anti-join on ``key_cols`` via tagged-union groupby.

    Returns a Dataset (key_cols..., left_n, right_n) of keys missing on
    one side: ``direction='left'`` -> keys present left, absent right
    (e.g. images without captions); ``'right'`` the reverse; ``'both'``
    all mismatches.
    """
    from ray.data.aggregate import Sum

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    tagged = (left_ds.map_batches(_side_partial(key_cols, 0),
                                  batch_format="pyarrow", zero_copy_batch=True)
              .union(right_ds.map_batches(_side_partial(key_cols, 1),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)))
    agg = tagged.groupby(key_cols).aggregate(
        Sum("left_n", alias_name="left_n"),
        Sum("right_n", alias_name="right_n"))

    def filt(t: pa.Table) -> pa.Table:
        lz = pc.equal(t["left_n"], 0)
        rz = pc.equal(t["right_n"], 0)
        if direction == "left":
            mask = rz
        elif direction == "right":
            mask = lz
        else:
            mask = pc.or_(lz, rz)
        return t.filter(mask)

    return agg.map_batches(filt, batch_format="pyarrow")


def orphans_broadcast(left_ds, right_key_values, key_col: str):
    """Anti-join with a broadcast key set (small right side).

    ``right_key_values`` is put into the object store ONCE; each task
    reads it zero-copy from the local store instead of re-shipping per
    batch — the broadcast-lookup pattern for dimension-table-sized sides.
    """
    keys_ref = ray.put(pd.Index(np.asarray(right_key_values)))

    def filt(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        vals = batch[key_col].to_numpy(zero_copy_only=False)
        mask = ~pd.Series(vals).isin(keys).to_numpy()
        return batch.filter(pa.array(mask))

    return left_ds.map_batches(filt, batch_format="pyarrow",
                               zero_copy_batch=True)
