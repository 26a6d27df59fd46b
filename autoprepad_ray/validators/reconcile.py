"""Cross-table aggregate reconciliation (consistency validation).

Validates the ingest invariant "the header table's stored total equals
the roll-up of its detail rows" — the class of cross-table consistency
check AutoPrepAD leaves out of scope (its anomaly flags are
single-table; reference pipelines/control.py:89-107) but a warehouse
validation engine needs as a first-class op.

Scale shape: both tables stream ONE pass each into packed per-slice
payloads routed by ``splitmix64(orderkey) % num_slices`` (the pass-1
census packing from validators/near_dup), ``scatter_slices`` moves
every payload byte once (multi-node safe), and one flat task per slice
folds its own orders completely:

- lexsort the slice's detail rows by (orderkey, linenumber) and
  ``np.add.reduceat`` per order — a strictly sequential in-linenumber
  fold, bit-identical to DuckDB
  ``list_sum(list(term ORDER BY l_linenumber))`` (the ORDER-exact
  float family documented in pipelines/queries.py);
- searchsorted-match the slice's header rows (inner-join semantics:
  headers with no detail rows are skipped);
- reduce to per-group (n_orders, sum-of-diff) partials.

The driver folds O(slices x groups) scalars; per-order rows never
materialize anywhere.  The final per-group sum is emitted ROUND(,2) on
both engine and SQL sides, absorbing partial-sum-order residue (the
file-header ROUND(SUM,2) rule; verified value-exact at sf 0.001 / 0.01
/ 0.1 before the oracle was wired).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _term(t: pa.Table) -> np.ndarray:
    ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = t["l_discount"].to_numpy(zero_copy_only=False)
    tax = t["l_tax"].to_numpy(zero_copy_only=False)
    return ep * (1.0 - disc) * (1.0 + tax)


@ray.remote
def _reconcile_slice(n_li: int, *cells):
    """Fold one orderkey-hash slice: recompute per-order totals from the
    detail payloads, diff against the header payloads, return per-group
    (n, sum) partials.  ``cells[:n_li]`` are detail list[bytes] cells,
    the rest header cells."""
    li_parts = [pickle.loads(p) for refs in cells[:n_li] for p in refs]
    od_parts = [pickle.loads(p) for refs in cells[n_li:] for p in refs]
    if not li_parts or not od_parts:
        return {}
    ok = np.concatenate([p[0] for p in li_parts])
    ln = np.concatenate([p[1] for p in li_parts])
    tm = np.concatenate([p[2] for p in li_parts])
    order = np.lexsort((ln, ok))
    ok, tm = ok[order], tm[order]
    starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
    rec_key = ok[starts]                       # sorted unique orderkeys
    rec_sum = np.add.reduceat(tm, starts)      # sequential per segment

    hk = np.concatenate([p[0] for p in od_parts])
    tp = np.concatenate([p[1] for p in od_parts])
    gp = np.concatenate([p[2] for p in od_parts])
    pos = np.searchsorted(rec_key, hk)
    hit = (pos < len(rec_key))
    hit[hit] = rec_key[pos[hit]] == hk[hit]
    diff = tp[hit] - rec_sum[pos[hit]]
    grp = gp[hit]
    uniq, inv = np.unique(grp, return_inverse=True)
    n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    s = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(s, inv, diff)
    return {str(u): (int(cn), float(cs))
            for u, cn, cs in zip(uniq, n, s)}


def _packer(key_col: str, cols_fn, num_slices: int):
    """map_batches partial: pack this block's rows into ONE pickled
    (arrays...) payload per orderkey-hash slice."""
    from ..sketches import splitmix64

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(keys):
            return pa.table({"slice": pa.array([], type=pa.int32()),
                             "payload": pa.array([],
                                                 type=pa.large_binary())})
        arrs = cols_fn(t)
        sl = (splitmix64(keys.view(np.uint64))
              % np.uint64(num_slices)).astype(np.int32)
        order = np.argsort(sl, kind="stable")
        sl = sl[order]
        keys = keys[order]
        arrs = [a[order] for a in arrs]
        bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1], True])
        slices, payloads = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            slices.append(int(sl[s]))
            payloads.append(pickle.dumps(
                tuple([keys[s:e]] + [a[s:e] for a in arrs])))
        return pa.table({"slice": pa.array(slices, type=pa.int32()),
                         "payload": pa.array(payloads,
                                             type=pa.large_binary())})

    return partial


def reconcile_order_totals(orders_ds, lineitem_ds, *,
                           num_slices: int = 32) -> pd.DataFrame:
    """Per-o_orderpriority reconciliation of ``o_totalprice`` against
    the lineitem charge roll-up: returns (o_orderpriority, n_orders,
    total_diff) with total_diff = ROUND(SUM(o_totalprice - recomputed),
    2) over orders that HAVE lineitems (inner-join semantics)."""
    from ..stages.transport import scatter_slices

    def li_cols(t: pa.Table):
        return [t["l_linenumber"].to_numpy(zero_copy_only=False)
                .astype(np.int64), _term(t)]

    def od_cols(t: pa.Table):
        from ..sketches import np_object
        return [t["o_totalprice"].to_numpy(zero_copy_only=False)
                .astype(np.float64),
                np_object(t["o_orderpriority"].to_numpy(
                    zero_copy_only=False))]

    li_packed = lineitem_ds.map_batches(
        _packer("l_orderkey", li_cols, num_slices),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    od_packed = orders_ds.map_batches(
        _packer("o_orderkey", od_cols, num_slices),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    li_cells = scatter_slices(li_packed, num_slices)
    od_cells = scatter_slices(od_packed, num_slices)
    futs = [_reconcile_slice.remote(len(li_cells[s]),
                                    *li_cells[s], *od_cells[s])
            for s in range(num_slices)]
    agg: dict[str, list] = {}
    for part in ray.get(futs):
        for g, (n, s) in part.items():
            cur = agg.setdefault(g, [0, 0.0])
            cur[0] += n
            cur[1] += s
    rows = [{"o_orderpriority": g, "n_orders": n,
             "total_diff": round(s, 2)}
            for g, (n, s) in sorted(agg.items())]
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                      "total_diff"])
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["total_diff"] = out["total_diff"].astype(np.float64)
    return out


def snapshot_diff_counts(ds, *, key_col: str, ts_col: str, cut,
                         out_key: str | None = None):
    """Snapshot-diff (CDC-style) reconciliation: classify every key as
    added / removed / changed / unchanged between the per-key row
    counts of two time windows (before vs on-or-after ``cut``) — the
    check a warehouse runs to validate an incremental load against the
    previous snapshot.  Single-table sibling of
    ``reconcile_order_totals``; the reference has no cross-snapshot
    notion at all (its fit/transform is one frame,
    /root/reference/pipelines/control.py:89-107).

    Shape: ONE streaming pass — per-block ``np.unique`` counts over the
    packed int64 key ``2*key + is_new`` ride the census tree merge
    (validators/near_dup._tree_counts), so the exchange is the packed
    count partials, never rows; the driver pivots O(distinct keys)
    ints into the full-outer old/new frame (keys at web scale would
    emit via the same partials sharded — documented trade, census
    family).  All-integer counts + a string CASE: SQL-exact."""
    from .near_dup import _pickled, _tree_counts

    cut64 = np.datetime64(cut, "us").astype(np.int64)

    def census(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if keys.size and (keys.min() < 0 or keys.max() >= 2**62):
            raise ValueError("snapshot_diff_counts packs 2*key+half: "
                             "keys must be in [0, 2^62)")
        ts = t[ts_col].to_numpy(zero_copy_only=False).view("i8")
        packed = keys * 2 + (ts >= cut64)
        return _pickled(np.unique(packed, return_counts=True))

    vals, cnts = _tree_counts(ds.map_batches(
        census, batch_format="pyarrow", zero_copy_batch=True))
    keys = vals >> 1
    half = (vals & 1).astype(bool)
    uu = np.unique(keys)
    n_old = np.zeros(len(uu), dtype=np.int64)
    n_new = np.zeros(len(uu), dtype=np.int64)
    idx = np.searchsorted(uu, keys)
    n_old[idx[~half]] = cnts[~half]
    n_new[idx[half]] = cnts[half]
    status = np.where(
        n_old == 0, "added",
        np.where(n_new == 0, "removed",
                 np.where(n_old == n_new, "unchanged", "changed")))
    return pd.DataFrame({(out_key or key_col): uu,
                         "n_old": n_old, "n_new": n_new,
                         "status": pd.Series(status, dtype=object)})
