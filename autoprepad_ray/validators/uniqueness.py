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


def _key_hashes(batch: pa.Table, cols: list[str]) -> np.ndarray:
    h = hash64(batch[cols[0]].to_pandas())
    for i, c in enumerate(cols[1:], start=1):
        h = h ^ hash64(batch[c].to_pandas(), seed=i)
    return h


def duplicate_keys(ds, cols: list[str], *, min_count: int = 2,
                   max_collect: int = 2_000_000) -> pa.Table:
    """Keys occurring >= min_count times, with their multiplicity.

    Returns an Arrow table with columns ``cols + [n]`` — the uniqueness
    violation listing (FIXTURES.md R3).

    EXACT two-phase plan that never sort-shuffles row keys:
    1. census: per-block 64-bit key-hash counts (np.unique partial),
       tree-merged — candidates are hashes with total count >= min_count;
    2. listing: candidate hashes broadcast, matching rows collected (a
       hash collision only adds a candidate row; the final exact
       group-count filter removes it, so collisions cost work, never
       correctness).

    The fast path assumes duplicates are RARE (the uniqueness-check
    regime).  When the census shows candidate rows exceed
    ``max_collect`` (dup-heavy keys — a dedup workload, not a
    uniqueness check), it falls back to the partial+final groupby
    shuffle, which moves per-block distinct keys instead.
    """
    import ray

    from .near_dup import _pickled, _tree_counts

    def census(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(_key_hashes(batch, cols),
                               return_counts=True)
        return _pickled((vals, cnts))

    vals, cnts = _tree_counts(ds.map_batches(census, batch_format="pyarrow",
                                             zero_copy_batch=True))
    cand = vals[cnts >= min_count]
    if cand.size == 0:
        t0 = ds.schema()
        return pa.table(
            {c: pa.array([], type=t0.types[t0.names.index(c)])
             for c in cols} | {"n": pa.array([], type=pa.int64())})
    if int(cnts[cnts >= min_count].sum()) > max_collect:
        return _duplicate_keys_shuffle(ds, cols, min_count)
    cand_ref = ray.put(np.sort(cand.astype(np.uint64)))

    def members(batch: pa.Table) -> pa.Table:
        cand_ = ray.get(cand_ref)
        h = _key_hashes(batch, cols)
        idx = np.searchsorted(cand_, h)
        idx[idx >= len(cand_)] = len(cand_) - 1
        mask = cand_[idx] == h
        return batch.select(cols).filter(pa.array(mask))

    rows = pa.concat_tables(
        b for b in ds.map_batches(members, batch_format="pyarrow",
                                  zero_copy_batch=True)
        .iter_batches(batch_size=65536, batch_format="pyarrow"))
    g = rows.group_by(cols).aggregate([([], "count_all")])
    g = g.rename_columns(cols + ["n"])
    return g.filter(pc.greater_equal(g["n"], min_count))


def _duplicate_keys_shuffle(ds, cols: list[str], min_count: int) -> pa.Table:
    """Dup-heavy path: per-block Arrow group_by partials, ONE Ray
    groupby over (keys, n) partial rows, filtered to n >= min_count."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(cols)
           .aggregate(Sum("n", alias_name="n")))
    out = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow")
    batches = list(out.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    # typed empty from the SOURCE schema — pa.array([]) would yield
    # null-typed columns and the two paths would disagree on schema
    t0 = ds.schema()
    return pa.table(
        {c: pa.array([], type=t0.types[t0.names.index(c)])
         for c in cols} | {"n": pa.array([], type=pa.int64())})


def distinct_counts(ds, cols: list[str]) -> dict[str, int]:
    """Exact distinct counts per column in ONE pass: per-block Arrow
    ``unique`` partials, 32-way Arrow-vectorized tree merge (concat +
    unique per merge task), one final vectorized fold — never a Python
    set union on the driver.  Exactness bounded by the merged distinct
    sets fitting a task heap; the unbounded-cardinality path is
    :func:`hll_distinct`."""
    import pickle

    def _merge(parts: list[dict]) -> dict:
        out = {}
        for c in cols:
            arrs = [p[c] for p in parts if len(p[c])]
            if not arrs:
                out[c] = parts[0][c]
            else:
                out[c] = pc.unique(pa.chunked_array(arrs))
        return out

    def partial(batch: pa.Table) -> pa.Table:
        out = {c: pc.unique(batch[c].drop_null().combine_chunks()
                            if isinstance(batch[c], pa.ChunkedArray)
                            else batch[c].drop_null()) for c in cols}
        return pa.table({"payload": pa.array([pickle.dumps(out)],
                                             type=pa.large_binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        parts = [pickle.loads(p) for p in batch["payload"].to_pylist()]
        return pa.table({"payload": pa.array([pickle.dumps(_merge(parts))],
                                             type=pa.large_binary())})

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(merge_batch, batch_size=32, batch_format="pyarrow")
    parts = [pickle.loads(r["payload"]) for r in merged.take_all()]
    final = _merge(parts)
    return {c: len(final[c].drop_null()) for c in final}


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

    def merge_batch(batch: pa.Table) -> pa.Table:
        # 32-way distributed merge level (register max is associative)
        # so the driver folds O(blocks/32) payloads, not O(blocks)
        parts = [pickle.loads(x) for x in batch["payload"].to_pylist()]
        out = {}
        for c in cols:
            h = HyperLogLog(p=p)
            for pt in parts:
                h.merge(HyperLogLog.from_dict(pt[c]))
            out[c] = h.to_dict()
        return pa.table({"payload": pa.array([pickle.dumps(out)],
                                             type=pa.large_binary())})

    merged = {c: HyperLogLog(p=p) for c in cols}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .map_batches(merge_batch, batch_size=32,
                         batch_format="pyarrow").take_all():
        for c, d in pickle.loads(row["payload"]).items():
            merged[c].merge(HyperLogLog.from_dict(d))
    return {c: h.estimate() for c, h in merged.items()}


def hll_distinct_per_group(ds, group_col: str, value_col: str, *,
                           p: int = 12):
    """Approximate DISTINCT ``value_col`` per ``group_col`` key —
    "distinct users per day" at the 10^12-row scale where the exact
    per-group census (group_distinct pattern) stops fitting.

    Per-block partial: one vectorized pass computes every value's HLL
    (register index, rho) and a pyarrow group_by collapses the block
    to sparse (group, idx, max rho) triples — the exchange carries at
    most min(rows, groups x 2^p) triples per block, never raw values.
    One Ray groupby(group) then folds each key's triples into dense
    registers and estimates.  Rows-only checked (approximate by
    construction); pytest bounds the error against the exact count.
    """
    import math

    import pandas as pd

    m = 1 << p
    from ..sketches import _bit_length64

    def partial(t: pa.Table) -> pa.Table:
        # project FIRST: drop_null on the full block would drop rows null
        # in unrelated columns, silently undercounting wider tables
        t = t.select([group_col, value_col]).drop_null()
        if t.num_rows == 0:
            return pa.table({group_col: t[group_col],
                             "idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = hash64(t[value_col].to_numpy(zero_copy_only=False)) \
            .astype(np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        bl = _bit_length64(rest)
        rho = np.where(rest == 0, 64 - p + 1, 64 - bl + 1).astype(np.int64)
        rho = np.minimum(rho, 64 - p + 1)
        g = pa.table({group_col: t[group_col],
                      "idx": pa.array(idx), "rho": pa.array(rho)}) \
            .group_by([group_col, "idx"]).aggregate([("rho", "max")])
        return pa.table({group_col: g[group_col], "idx": g["idx"],
                         "rho": g["rho_max"]})

    def fold(gdf: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(m, dtype=np.uint8)
        np.maximum.at(reg, gdf["idx"].to_numpy(),
                      gdf["rho"].to_numpy().astype(np.uint8))
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
        zeros = int(np.count_nonzero(reg == 0))
        est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) \
            else float(raw)
        return pd.DataFrame({group_col: [gdf[group_col].iloc[0]],
                             "distinct_est": [float(round(est, 1))]})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col).map_groups(fold, batch_format="pandas"))
