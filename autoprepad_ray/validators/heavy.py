"""Heavy hitters: mergeable Misra-Gries sketch + exact verification.

The reference has no frequent-items operator (its mode, F2, is exact and
only needs the top-1); at 100 TB a "which keys exceed x% of rows" check
(hot-key / skew detection, the input to salting decisions in SURVEY
§7.5) cannot groupby the full keyspace first.  Shape:

1. SKETCH pass: per-block ``np.unique`` counts compressed to ``k``
   counters (Misra-Gries), tree-merged 32-way (pointwise-sum + compress,
   the mergeable-summaries construction: Agarwal et al., "Mergeable
   Summaries", ACM TODS 2013) — driver folds O(blocks/32) payloads.
   Guarantee after any merge tree: est(x) <= true(x) <= est(x) +
   n/(k+1), so every key with true count > n/(k+1) survives (candidate
   SUPERSET, never a miss).
2. VERIFY pass: broadcast the <= k candidate keys, exact per-block
   counts for just those keys, small fold — output is EXACT counts
   filtered by the threshold (SQL-oracle-checkable despite the
   approximate sketch; same candidate-then-verify idiom as the near-dup
   family).

``frac`` is the threshold as a fraction of total rows; ``capacity``
defaults to ``ceil(2/frac)`` so the guarantee threshold n/(k+1) sits at
half the requested one.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Keep the top-``k`` counters, subtracting the (k+1)-st count
    (the Misra-Gries decrement); drops zeroed counters."""
    if len(keys) <= k:
        return keys, counts
    order = np.argsort(counts, kind="stable")[::-1]
    pivot = counts[order[k]]
    keep = order[:k]
    new_counts = counts[keep] - pivot
    nz = new_counts > 0
    return keys[keep][nz], new_counts[nz]


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray]], k: int
             ) -> tuple[np.ndarray, np.ndarray]:
    """Pointwise-sum counters across summaries, then compress to k."""
    if not parts:  # empty input: no blocks ever produced a partial
        z = np.array([], dtype=np.int64)
        return z, z
    keys = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.bincount(inv, weights=counts).astype(np.int64)
    return mg_compress(uk, summed, k)


def heavy_hitters(ds, col: str, *, frac: float = 0.01,
                  capacity: int | None = None) -> pa.Table:
    """Exact counts of every ``col`` value occurring in > ``frac`` of
    rows, via the two-pass sketch-then-verify above.  Returns a
    pa.Table (col, cnt) sorted by (cnt desc, col).

    ``ds`` is consumed twice (sketch pass, exact pass) — the right
    trade for a pruned single-column parquet read; materialize a
    computed chain before calling (same convention as
    ``near_dup.hamming_neardup_pairs``)."""
    import ray

    if capacity is None:
        capacity = int(math.ceil(2.0 / frac))
    k = capacity

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[col].drop_null()
        vals = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                else arr).to_numpy(zero_copy_only=False)
        uk, cnts = np.unique(vals, return_counts=True)
        payload = (*(mg_compress(uk, cnts.astype(np.int64), k)),
                   np.int64(len(vals)))
        return pa.table({"payload": pa.array([pickle.dumps(payload)],
                                             type=pa.large_binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        parts = [pickle.loads(x) for x in batch["payload"].to_pylist()]
        keys, counts = mg_merge([(p[0], p[1]) for p in parts], k)
        n = np.int64(sum(int(p[2]) for p in parts))
        return pa.table({"payload": pa.array(
            [pickle.dumps((keys, counts, n))], type=pa.large_binary())})

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(merge_batch, batch_size=32, batch_format="pyarrow")
    parts = [pickle.loads(r["payload"]) for r in merged.take_all()]
    keys, counts = mg_merge([(p[0], p[1]) for p in parts], k)
    n = sum(int(p[2]) for p in parts)
    threshold = frac * n
    if n and n / (k + 1) > threshold:
        raise ValueError(
            f"capacity {k} cannot guarantee frac={frac}: the MG bound "
            f"n/(k+1)={n / (k + 1):.1f} exceeds threshold {threshold:.1f}")
    # candidates: anything whose upper bound (est + n/(k+1)) clears the
    # threshold — a superset of the true heavy hitters
    cand = keys[counts + n / (k + 1) > threshold]
    sch = ds.schema()  # Ray Schema wrapper: .names + pyarrow .types
    col_type = dict(zip(sch.names, sch.types))[col]
    empty = pa.table({col: pa.array([], type=col_type),
                      "cnt": pa.array([], type=pa.int64())})
    if not len(cand):
        return empty
    cand_ref = ray.put(np.sort(cand))

    def exact_partial(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        arr = batch[col].drop_null()
        vals = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                else arr).to_numpy(zero_copy_only=False)
        vals = vals[np.isin(vals, cands)]
        uk, cnts = np.unique(vals, return_counts=True)
        return pa.table({"payload": pa.array(
            [pickle.dumps((uk, cnts.astype(np.int64)))],
            type=pa.large_binary())})

    def exact_merge(batch: pa.Table) -> pa.Table:
        parts = [pickle.loads(x) for x in batch["payload"].to_pylist()]
        # candidate keyspace <= k: a plain uncapped unique-sum
        keys = np.concatenate([p[0] for p in parts])
        counts = np.concatenate([p[1] for p in parts])
        uk, inv = np.unique(keys, return_inverse=True)
        summed = np.bincount(inv, weights=counts).astype(np.int64)
        return pa.table({"payload": pa.array([pickle.dumps((uk, summed))],
                                             type=pa.large_binary())})

    rows = ds.map_batches(exact_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(exact_merge, batch_size=32,
                     batch_format="pyarrow").take_all()
    parts2 = [pickle.loads(r["payload"]) for r in rows]
    keys = np.concatenate([p[0] for p in parts2])
    counts = np.concatenate([p[1] for p in parts2])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.bincount(inv, weights=counts).astype(np.int64)
    hot = summed > threshold
    if not hot.any():
        return empty
    uk, summed = uk[hot], summed[hot]
    order = np.lexsort((uk, -summed))
    return pa.table({col: pa.array(uk[order]),
                     "cnt": pa.array(summed[order], type=pa.int64())})
