"""Hash-partitioned grouped fold for near-unique int64 keys.

Ray's sort-based ``groupby().aggregate()`` pays a multi-second flat
exchange at any input size — fine when the shuffle genuinely moves
data, wasteful when per-block Arrow partials have already collapsed the
stream to one row per (block, key).  For the classic partial+final
aggregate over a NEAR-UNIQUE key (order keys, customer keys: far too
many groups for the dozens-of-groups driver fold, yet each key's
partials fit trivially in one task) this module finishes the job with
the repo's flat-task shuffle instead:

1. one ``map_batches`` pass computes the per-block Arrow ``group_by``
   partial and range-packs its rows into per-slice pickled payloads,
   sliced by ``splitmix64(key) % num_parts`` (worker-side deterministic
   hash — the builtin ``hash`` is banned in tasks);
2. ``transport.scatter_slices`` moves every payload byte ONCE into one
   cell per (scatter task, slice) — multi-node safe by construction;
3. one flat task per slice concatenates its cells, lexsorts by key and
   folds each value column with ONE ``np.{add,maximum,minimum}.reduceat``
   over the group boundaries — no per-group loop;
4. the folded slice tables become a Dataset via ``from_arrow_refs`` —
   the result stays distributed; nothing assembles on the driver.

Keys hash-partition (not range-partition), so slice sizes are balanced
without a quantile pass; the output is NOT globally key-sorted (same
contract as Ray's groupby — callers that need order sort the result).

Reference parity note: this is an execution-strategy module only; the
semantics it implements (grouped MAX/SUM/MIN) are the same partial+
final fold the reference runs in pandas (e.g. aggregation inside
/root/reference/pipelines/control.py's single-process DataFrame ops).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

import ray

from ..sketches import splitmix64
from .transport import scatter_slices

_REDUCERS = {"sum": np.add, "max": np.maximum, "min": np.minimum}


def _pack_partial(t: pa.Table, key: str, num_parts: int) -> pa.Table:
    """Split a block-local partial table into per-slice pickled
    column-array payloads, sliced by the key hash."""
    keys = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    if not len(keys):
        # a partial_fn can filter a whole batch away — the sentinel
        # bounds construction below would index into the empty array
        return pa.table({"slice": pa.array([], type=pa.int64()),
                         "payload": pa.array([],
                                             type=pa.large_binary())})
    cols = {n: t[n].to_numpy(zero_copy_only=False)
            for n in t.column_names if n != key}
    sl = (splitmix64(keys.view(np.uint64))
          % np.uint64(num_parts)).astype(np.int64)
    order = np.argsort(sl, kind="stable")
    sl, keys = sl[order], keys[order]
    cols = {n: v[order] for n, v in cols.items()}
    bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1], True])
    slices, payloads = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        slices.append(int(sl[s]))
        payloads.append(pickle.dumps(
            (keys[s:e], {n: v[s:e] for n, v in cols.items()}),
            protocol=pickle.HIGHEST_PROTOCOL))
    return pa.table({"slice": pa.array(slices, type=pa.int64()),
                     "payload": pa.array(payloads,
                                         type=pa.large_binary())})


@ray.remote
def _fold_slice(key: str, reducers: dict[str, str],
                types: dict[str, pa.DataType], cut, *cells):
    """Fold one slice's payload cells: concat -> sort by key -> one
    reduceat per value column.  ``cells`` arrive dereferenced (each a
    list[bytes] of pickled (keys, {col: arr}) payloads)."""
    parts = [pickle.loads(p) for lst in cells for p in lst]
    names = list(reducers)
    if parts:
        keys = np.concatenate([p[0] for p in parts])
    else:
        keys = np.empty(0, dtype=np.int64)
    if not len(keys):
        out = pa.table({key: pa.array([], type=pa.int64()),
                        **{n: pa.array([], type=types[n])
                           for n in names}})
        return cut(out) if cut is not None else out
    cols = {n: np.concatenate([p[1][n] for p in parts]) for n in names}
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    data = {key: pa.array(keys[starts])}
    for n in names:
        v = cols[n][order]
        data[n] = pa.array(_REDUCERS[reducers[n]].reduceat(v, starts),
                           type=types[n])
    out = pa.table(data)
    return cut(out) if cut is not None else out


def grouped_fold(ds, partial_fn, reducers: dict[str, str], *,
                 key: str, types: dict[str, pa.DataType] | None = None,
                 num_parts: int = 16, cut=None):
    """Partial+final grouped aggregate over an int64 ``key`` without a
    Ray sort-groupby.

    ``partial_fn(t: pa.Table) -> pa.Table`` must return a block-local
    partial whose first columns are ``key`` (int64) plus one column per
    ``reducers`` entry; ``reducers`` maps column name -> 'sum' | 'max'
    | 'min' (the fold applied across blocks — the partial must already
    be the matching block-local fold).  ``types`` fixes each value
    column's Arrow type so empty slices keep the same schema as
    populated ones (defaults to int64).  ``cut``, if given, runs on
    each folded slice table inside the fold task (e.g. a per-slice
    top-k cut) before the slice is returned.  Returns a Dataset of the
    folded slices (one block per slice, not globally key-sorted).
    """
    import ray.data as rd

    types = {n: (types or {}).get(n, pa.int64()) for n in reducers}
    packed = ds.map_batches(
        lambda t: _pack_partial(partial_fn(t), key, num_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    per_slice = scatter_slices(packed, num_parts)
    futs = [_fold_slice.remote(key, reducers, types, cut, *per_slice[s])
            for s in range(num_parts)]
    return rd.from_arrow_refs(futs)
