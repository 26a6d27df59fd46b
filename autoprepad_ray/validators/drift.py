"""Distribution-drift validators: PSI and KS between a reference profile
and a current partition (FIXTURES.md R6).

These replace the reference's learned outlier-model score (pyod fit at
runs.py:162 / score at runs.py:198) with deterministic distribution
distances — the north rule's drift checks on w/h/fmt histograms and
caption-length distributions.

PSI uses +0.5 Laplace smoothing per bin (so empty bins are defined);
the same formula is mirrored in the DuckDB oracle SQL, keeping the
correctness gate exact.  Histogram counts are one ``map_batches``
partial (np.histogram per block) summed on the driver — no shuffle.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import ValueCounts


def psi_from_counts(ref_counts, cur_counts) -> float:
    """PSI with +0.5/bin smoothing: p=(c+0.5)/(N+0.5B);
    sum((p-q)*ln(p/q))."""
    ref_counts = np.asarray(ref_counts, dtype=float)
    cur_counts = np.asarray(cur_counts, dtype=float)
    b = len(ref_counts)
    p = (ref_counts + 0.5) / (ref_counts.sum() + 0.5 * b)
    q = (cur_counts + 0.5) / (cur_counts.sum() + 0.5 * b)
    return float(np.sum((p - q) * np.log(p / q)))


def histogram_counts(ds, col: str, edges: np.ndarray) -> np.ndarray:
    """Fixed-edge histogram of one column, streaming (values outside the
    edge range are clamped into the first/last bin)."""
    edges = np.asarray(edges, dtype=float)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].cast(pa.float64()).combine_chunks().to_numpy(
            zero_copy_only=False)
        v = v[~np.isnan(v)]
        idx = np.clip(np.searchsorted(edges, v, side="right") - 1,
                      0, len(edges) - 2)
        counts = np.bincount(idx, minlength=len(edges) - 1).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tolist()],
                                            type=pa.list_(pa.int64()))})

    total = np.zeros(len(edges) - 1, dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        total += np.asarray(row["counts"], dtype=np.int64)
    return total


def categorical_counts(ds, col: str) -> dict:
    """Value counts of a (modest-cardinality) categorical column,
    pre-aggregated per block.  For hot-value skew, the per-block partial
    IS the salt: each block contributes at most one row per category."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        return g.rename_columns([col, "n"])

    from ray.data.aggregate import Sum
    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(col).aggregate(Sum("n", alias_name="n"))).take_all()
    return {r[col]: int(r["n"]) for r in rows}


def partition_histograms(ds, num_specs: dict[str, np.ndarray],
                         cat_cols: list[str], partition_col: str
                         ) -> tuple[dict, dict]:
    """ALL drift inputs in ONE streaming pass: per-partition fixed-edge
    histograms for every numeric spec plus per-partition category counts
    for every categorical column.  Each block emits one pickled partial;
    the driver merges O(blocks) tiny dicts — no shuffle at all.

    Returns (num: {col: {pid: counts}}, cat: {col: {pid: {val: n}}}).
    """
    specs = {c: np.asarray(e, dtype=float) for c, e in num_specs.items()}

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch[partition_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pid, return_inverse=True)
        num_out: dict = {}
        for col, edges in specs.items():
            nb = len(edges) - 1
            v = batch[col].cast(pa.float64()).combine_chunks().to_numpy(
                zero_copy_only=False)
            keep = ~np.isnan(v)
            idx = np.clip(np.searchsorted(edges, v[keep], side="right") - 1,
                          0, nb - 1)
            counts = np.zeros((len(uniq), nb), dtype=np.int64)
            np.add.at(counts, (inv[keep], idx), 1)
            num_out[col] = counts
        cat_out: dict = {}
        for col in cat_cols:
            vals = np.asarray(batch[col].to_numpy(zero_copy_only=False),
                              dtype=object)
            d: dict = {}
            for k, u in enumerate(uniq):
                vv, cc = np.unique(vals[inv == k], return_counts=True)
                d[int(u)] = dict(zip(vv.tolist(), cc.tolist()))
            cat_out[col] = d
        payload = pickle.dumps((uniq.tolist(), num_out, cat_out))
        return pa.table({"payload": pa.array([payload],
                                             type=pa.large_binary())})

    num: dict = {c: {} for c in specs}
    cat: dict = {c: {} for c in cat_cols}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        uniq, num_out, cat_out = pickle.loads(row["payload"])
        for col, counts in num_out.items():
            for k, u in enumerate(uniq):
                u = int(u)
                if u in num[col]:
                    num[col][u] = num[col][u] + counts[k]
                else:
                    num[col][u] = counts[k].copy()
        for col, d in cat_out.items():
            for u, vc in d.items():
                tgt = cat[col].setdefault(int(u), {})
                for v, n in vc.items():
                    tgt[v] = tgt.get(v, 0) + n
    return num, cat


def histogram_by_partition(ds, col: str, edges: np.ndarray,
                           partition_col: str) -> dict[int, np.ndarray]:
    """One streaming pass -> fixed-edge histogram per partition: per-block
    partial (partition, bincount) rows, groupby-summed.  The shuffle
    moves O(partitions x bins x blocks) tiny rows."""
    edges = np.asarray(edges, dtype=float)
    nb = len(edges) - 1

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].cast(pa.float64()).combine_chunks().to_numpy(
            zero_copy_only=False)
        pid = batch[partition_col].to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v)
        v, pid = v[keep], pid[keep]
        idx = np.clip(np.searchsorted(edges, v, side="right") - 1, 0, nb - 1)
        uniq, inv = np.unique(pid, return_inverse=True)
        counts = np.zeros((len(uniq), nb), dtype=np.int64)
        np.add.at(counts, (inv, idx), 1)
        return pa.table({partition_col: pa.array(uniq),
                         "counts": pa.array(counts.tolist(),
                                            type=pa.list_(pa.int64()))})

    out: dict[int, np.ndarray] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all():
        pid = int(row[partition_col])
        c = np.asarray(row["counts"], dtype=np.int64)
        out[pid] = out.get(pid, np.zeros(nb, dtype=np.int64)) + c
    return out


def categorical_counts_by_partition(ds, col: str, partition_col: str
                                    ) -> dict[int, dict]:
    """Per-partition category counts, block-partial pre-aggregated."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([partition_col, col])
             .group_by([partition_col, col]).aggregate([([], "count_all")]))
        return g.rename_columns([partition_col, col, "n"])

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([partition_col, col])
            .aggregate(Sum("n", alias_name="n"))).take_all()
    out: dict[int, dict] = {}
    for r in rows:
        out.setdefault(int(r[partition_col]), {})[r[col]] = int(r["n"])
    return out


def psi_numeric(ds_ref, ds_cur, col: str, edges) -> float:
    return psi_from_counts(histogram_counts(ds_ref, col, edges),
                           histogram_counts(ds_cur, col, edges))


def psi_categorical(ds_ref, ds_cur, col: str) -> float:
    a = categorical_counts(ds_ref, col)
    b = categorical_counts(ds_cur, col)
    cats = sorted(set(a) | set(b), key=lambda x: (x is None, x))
    return psi_from_counts([a.get(c, 0) for c in cats],
                           [b.get(c, 0) for c in cats])


def ks_from_valuecounts(a: ValueCounts, b: ValueCounts) -> float:
    """Exact two-sample KS statistic from exact value counts."""
    va, ca = a.sorted_arrays()
    vb, cb = b.sorted_arrays()
    if len(va) == 0 or len(vb) == 0:
        # one empty side: KS is 0 when both are empty, else the full CDF
        # gap (np.where below would index an empty array otherwise)
        return 0.0 if len(va) == len(vb) else 1.0
    allv = np.unique(np.concatenate([va, vb]))
    cum_a = np.cumsum(ca) / max(1, ca.sum())
    cum_b = np.cumsum(cb) / max(1, cb.sum())
    cdf_a = np.where(np.searchsorted(va, allv, side="right") > 0,
                     cum_a[np.clip(np.searchsorted(va, allv, side="right") - 1,
                                   0, len(va) - 1)], 0.0)
    cdf_b = np.where(np.searchsorted(vb, allv, side="right") > 0,
                     cum_b[np.clip(np.searchsorted(vb, allv, side="right") - 1,
                                   0, len(vb) - 1)], 0.0)
    return float(np.max(np.abs(cdf_a - cdf_b)))


def ks_numeric(ds_ref, ds_cur, col: str, *, max_exact: int = 2_000_000) -> float:
    """Exact KS via per-side exact value counts (documented bound:
    flips to histogram-approximated KS past ``max_exact`` distinct)."""
    from ..profile import profile_dataset
    pa_ = profile_dataset(ds_ref, columns=[col], max_exact=max_exact)
    pb_ = profile_dataset(ds_cur, columns=[col], max_exact=max_exact)
    va, vb = pa_[col].values, pb_[col].values
    if va.overflow or vb.overflow:
        edges = np.linspace(
            min(pa_[col].moments.vmin, pb_[col].moments.vmin),
            max(pa_[col].moments.vmax, pb_[col].moments.vmax), 257)
        ca = histogram_counts(ds_ref, col, edges).astype(float)
        cb = histogram_counts(ds_cur, col, edges).astype(float)
        return float(np.max(np.abs(np.cumsum(ca) / ca.sum()
                                   - np.cumsum(cb) / cb.sum())))
    return ks_from_valuecounts(va, vb)


def first_digit_counts(ds, col: str, *, scale: float = 100.0
                       ) -> np.ndarray:
    """Benford first-significant-digit census of a positive decimal
    column: counts[d] for d in 0..9 (0 stays empty for positive data).

    The digit is extracted EXACTLY the way the SQL oracle does —
    round(|x| * scale) to int64 (snapping 2-decimal money to integer
    cents; the product sits ~1e-9 off an integer so round-half modes
    cannot disagree), cast to string, first code unit — all Arrow
    kernels, no Python per row.  Streaming per-block bincount partials,
    driver fold (blocks x <=10 scalar rows).  The digit-law audit the
    reference's single-column outlier flags never see (novel-fraud
    screening; Benford 1938 is public knowledge)."""

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.abs(pc.cast(t[col], pa.float64())), scale)), pa.int64())
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1), pa.int64())
        g = pa.table({"digit": digit,
                      "n": pa.array(np.ones(len(digit), np.int64))}) \
            .group_by(["digit"]).aggregate([("n", "sum")])
        return pa.table({"digit": g["digit"], "n": g["n_sum"]})

    total = np.zeros(10, dtype=np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        total[r["digit"]] += r["n"]
    return total
