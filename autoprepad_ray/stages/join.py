"""Large-large equi-join strategies (SURVEY §2.4: the reference has only
an index-aligned label join; the engine provides real distributed
joins):

- ``native_join``: Ray Data's built-in hash-partitioned ``Dataset.join``
  (Ray >= 2.46) — the default when both sides are large.
- ``bucketed_join``: the portable explicit pattern — both sides get a
  ``bucket = hash(key) % B`` column, one ``groupby(bucket)`` over the
  tagged union, and a pandas merge per bucket.  Salt hot keys by
  raising B; B should be ~(total size / target partition size).
- small sides should NOT be here at all: broadcast them
  (``ray.put`` + per-batch lookup, see queries.top_customers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches import hash64


def native_join(left, right, on: str | tuple[str, ...], *,
                join_type: str = "inner", num_partitions: int = 32,
                **kwargs):
    on_t = (on,) if isinstance(on, str) else tuple(on)
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions, on=on_t, **kwargs)


def bucketed_join(left, right, on: str, *, num_buckets: int = 32,
                  left_cols: list[str] | None = None,
                  right_cols: list[str] | None = None):
    """Explicit hash-bucketed inner join: ONE shuffle keyed on
    ``hash(on) % num_buckets``; each bucket merges its two sides with a
    pandas hash join.  Key-hash bucketing spreads any single hot key's
    *partner* rows with it, so skew shows up as a large bucket —
    mitigate by raising ``num_buckets`` (the per-bucket merge is
    O(bucket) with a hash table, not quadratic)."""

    # a tagged union needs ONE schema: each side carries typed null
    # columns for the other side's fields (non-key column names must be
    # disjoint across sides)
    lsch, rsch = left.schema(), right.schema()
    lcols = sorted(set((left_cols or lsch.names) + [on]))
    rcols = sorted(set((right_cols or rsch.names) + [on]))
    types = {n: t for n, t in list(zip(lsch.names, lsch.types))
             + list(zip(rsch.names, rsch.types))}
    all_cols = sorted(set(lcols) | set(rcols))

    def tag(side: int, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for c in all_cols:
                if c in own:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(t.num_rows, type=types[c])
            keys = t[on].to_numpy(zero_copy_only=False)
            bucket = (hash64(keys) % np.uint64(num_buckets)).astype(np.int32)
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8))
            return pa.table(cols)
        return fn

    tagged = (left.map_batches(tag(0, lcols), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right.map_batches(tag(1, rcols),
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # drop exactly the other side's typed-null padding columns by
        # NAME — inferring by all-nullness would also drop a genuinely
        # all-null real column within the bucket
        lg = g.loc[g["__side"] == 0, lcols]
        rg = g.loc[g["__side"] == 1, rcols]
        if not len(lg) or not len(rg):
            return pd.DataFrame()
        return lg.merge(rg, on=on, how="inner")

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def asof_join(left, right, *, on: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str],
              tie_col: str | None = None, num_buckets: int = 32,
              suffix: str = "_asof"):
    """Distributed as-of (nearest-prior) join: for each left row, the
    right row with the same ``on`` key and the LARGEST ``right_ts`` <=
    ``left_ts`` (ties on ``right_ts`` broken by largest ``tie_col``).
    Inner semantics: left rows with no prior right row are dropped.

    Same co-partition shape as :func:`bucketed_join` — ONE shuffle of
    the tagged union keyed on ``hash(on) % num_buckets`` — then a
    per-bucket vectorized merge: sort the bucket's right side by
    (key, ts, tie), the left side by key, and ``np.searchsorted`` each
    left row's (key, ts) upper bound into the right arrays (no per-row
    Python).  Key-hash bucketing keeps every key's two sides together;
    skew mitigates by raising ``num_buckets``.

    Timestamps compare as their raw int64 representation (us) — exact,
    no float math — so results match a SQL window/ASOF oracle exactly.
    """
    lsch, rsch = left.schema(), right.schema()
    lcols = sorted(set(left_cols + [on, left_ts]))
    rcols = sorted(set(right_cols + [on, right_ts]
                       + ([tie_col] if tie_col else [])))
    types = {n: t for n, t in list(zip(lsch.names, lsch.types))
             + list(zip(rsch.names, rsch.types))}
    all_cols = sorted(set(lcols) | set(rcols))

    def tag(side: int, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for c in all_cols:
                cols[c] = (t[c] if c in own
                           else pa.nulls(t.num_rows, type=types[c]))
            keys = t[on].to_numpy(zero_copy_only=False)
            bucket = (hash64(keys) % np.uint64(num_buckets)).astype(np.int32)
            cols["__bucket"] = pa.array(bucket)
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8))
            return pa.table(cols)
        return fn

    tagged = (left.map_batches(tag(0, lcols), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right.map_batches(tag(1, rcols),
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)))
    out_right = [c for c in rcols if c not in (on, right_ts)] \
        + [right_ts]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == 0, lcols].reset_index(drop=True)
        rg = g.loc[g["__side"] == 1, rcols]
        if not len(lg) or not len(rg):
            return pd.DataFrame()
        rsort = [on, right_ts] + ([tie_col] if tie_col else [])
        rg = rg.sort_values(rsort, kind="mergesort").reset_index(drop=True)
        def ts_i64(a: np.ndarray) -> np.ndarray:
            if np.issubdtype(a.dtype, np.datetime64):
                return a.astype("datetime64[us]").view(np.int64)
            return a.astype(np.int64)

        rk = rg[on].to_numpy()
        rt = ts_i64(rg[right_ts].to_numpy())
        lk = lg[on].to_numpy()
        lt = ts_i64(lg[left_ts].to_numpy())
        # Fully vectorized lexicographic search: dense-rank keys and
        # timestamps into one int64 composite (key_code << 32 | ts_rank;
        # equal timestamps share a rank, so side='right' - 1 lands on
        # the LAST right row with (key, ts) <= (key, ts)_left — which,
        # with rg sorted by (key, ts, tie), is also the max-tie winner).
        # ts_rank < bucket rows, so a bucket must stay < 2^32 rows —
        # raise num_buckets long before that.
        uk = np.unique(np.concatenate([rk, lk]))
        rkc = np.searchsorted(uk, rk).astype(np.int64)
        lkc = np.searchsorted(uk, lk).astype(np.int64)
        allt = np.sort(np.concatenate([rt, lt]))
        rtr = np.searchsorted(allt, rt, side="left").astype(np.int64)
        ltr = np.searchsorted(allt, lt, side="left").astype(np.int64)
        pos = np.searchsorted((rkc << 32) | rtr, (lkc << 32) | ltr,
                              side="right") - 1
        ok = (pos >= 0) & (rkc[np.maximum(pos, 0)] == lkc)
        if not ok.any():
            return pd.DataFrame()
        res = lg.loc[ok].reset_index(drop=True)
        picked = rg.iloc[pos[ok]].reset_index(drop=True)
        for c in out_right:
            name = c + (suffix if c in res.columns else "")
            res[name] = picked[c].to_numpy()
        return res

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")
