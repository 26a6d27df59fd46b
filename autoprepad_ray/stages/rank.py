"""Global-order ranking stages: NTILE equal-frequency bucketing.

A total order over the dataset is the one operation that genuinely
needs a global sort (range-partition exchange) — but ONLY the sort.
Everything NTILE adds on top is metadata-cheap: the sorted blocks
already arrive in global order, so per-block row counts (a few ints on
the driver) give every block its global row-number offset, and bucket
assignment is an embarrassingly parallel integer formula inside each
block.  No second exchange, no driver-side row data.

This is the grouped analogue of the reference's presentation sort
(/root/reference/pipelines/runs.py:429-435) extended to the
equal-shard layout step of a training-data pipeline (balancing k
output shards by a sort key).

Tie-safety: callers must make the sort key unique (append a row id) —
NTILE's output depends on the total order, and a unique composite key
makes it deterministic on any block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _bucketize(t: pa.Table, offset: int, n: int, k: int,
               keep_cols: list[str], out_col: str) -> pa.Table:
    """SQL NTILE semantics: with n rows and k buckets, the first n % k
    buckets hold ceil(n/k) rows — pure integer math, exact parity."""
    rn = offset + np.arange(1, t.num_rows + 1, dtype=np.int64)  # 1-based
    q, r = divmod(n, k)
    big = r * (q + 1)                 # rows living in the larger buckets
    small_b = r + (rn - 1 - big) // max(q, 1) + 1   # q==0 rows never used
    b = np.where(rn <= big, (rn - 1) // (q + 1) + 1, small_b)
    cols = {c: t[c] for c in keep_cols}
    cols[out_col] = pa.array(b.astype(np.int64))
    return pa.table(cols)


def ntile(ds, keys: list[str], k: int, *, keep_cols: list[str],
          out_col: str = "bucket"):
    """Assign each row its NTILE(k) bucket under the total order given
    by ``keys`` (which must be unique as a composite).

    One ``Dataset.sort`` (the unavoidable exchange), then a
    metadata-only count pass over the materialized sorted blocks and
    one independent bucketize task per block — the driver holds
    O(blocks) integers, never rows.  Returns a Dataset built from the
    per-block output refs (bytes stay in the object store)."""
    s = ds.sort(keys).materialize()
    refs = s.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    n = int(offsets[-1])
    if n == 0:
        sch = s.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        empty = pa.table({**{c: pa.array([], types.get(c, pa.int64()))
                             for c in keep_cols},
                          out_col: pa.array([], pa.int64())})
        return rd.from_arrow(empty)
    out = [_bucketize.remote(r, int(offsets[i]), n, k, keep_cols, out_col)
           for i, r in enumerate(refs) if counts[i]]
    return rd.from_arrow_refs(out)
