"""Uniqueness / duplicate-key validators (SURVEY §2.7).

The reference has no dedup at all (its only duplicate heuristic is the
Spearman duplicate-COLUMN check, SpearmanCheck.py:23-41); these are the
engine-native key checks the north rule requires.

Scale shape: every check pre-aggregates inside ``map_batches`` (one row
per distinct key per block via Arrow ``group_by``) before the
``groupby`` shuffle, so the exchange moves O(distinct-per-block), not
O(rows).  ``image_id``-style near-unique keys are naturally balanced;
for skewed keys use the salted two-level pattern in ``near_dup.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import HyperLogLog, hash64


def _count_partial(cols: list[str]):
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["n"])
    return partial


def duplicate_keys(ds, cols: list[str], *, min_count: int = 2):
    """Keys occurring >= min_count times, with their multiplicity.

    Returns a Dataset with columns ``cols + [n]``.  This is the
    uniqueness violation listing: for a declared-unique key, any row
    here is a violation (FIXTURES.md R3).
    """
    from ray.data.aggregate import Sum

    agg = (ds.map_batches(_count_partial(cols), batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(cols)
           .aggregate(Sum("n", alias_name="n")))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow")


def distinct_counts(ds, cols: list[str]) -> dict[str, int]:
    """Exact distinct counts per column in ONE pass (per-block unique ->
    merged python sets on the tiny partials).  Exactness bounded by
    driver memory; the unbounded-cardinality path is :func:`hll_distinct`."""
    import pickle

    def partial(batch: pa.Table) -> pa.Table:
        out = {c: set(pc.unique(batch[c]).to_pylist()) for c in cols}
        return pa.table({"payload": pa.array([pickle.dumps(out)],
                                             type=pa.large_binary())})

    sets: dict[str, set] = {c: set() for c in cols}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        for c, s in pickle.loads(row["payload"]).items():
            sets[c] |= s
    return {c: len(s - {None}) for c, s in sets.items()}


def hll_distinct(ds, cols: list[str], *, p: int = 14) -> dict[str, float]:
    """Approximate distinct counts (HyperLogLog, mergeable) — the 100-TB
    path; |exact - HLL| small is the cheap pre-check before exact
    duplicate listing (SURVEY §2.7)."""
    import pickle

    def partial(batch: pa.Table) -> pa.Table:
        hs = {}
        for c in cols:
            h = HyperLogLog(p=p)
            vals = batch[c].drop_null().to_numpy(zero_copy_only=False)
            if len(vals):
                h.add_hashes(hash64(vals))
            hs[c] = h.to_dict()
        return pa.table({"payload": pa.array([pickle.dumps(hs)],
                                             type=pa.large_binary())})

    merged = {c: HyperLogLog(p=p) for c in cols}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        for c, d in pickle.loads(row["payload"]).items():
            merged[c].merge(HyperLogLog.from_dict(d))
    return {c: h.estimate() for c, h in merged.items()}
