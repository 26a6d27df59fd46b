"""Per-row anomaly-evidence checks: Tukey fences, MAD modified-Z, totals,
scores, labels, per-partition verdicts.

Reference semantics reproduced (see /root/reference):
- Tukey: fences ``q1 - f*IQR`` / ``q3 + f*IQR`` learned at fit, flag
  ``(x < lo) | (x > hi)`` as int — TukeyTransformer.py:36-54 (factor 1.5).
- MAD modified-Z: ``0.6745*(x - med)/MAD``, flag ``|z| > 3.5`` —
  MedianAbsolutDeviation.py:40-61; ``mad == 0 -> flags 0`` is engine-defined
  (the reference's guard return is discarded by sklearn fit — SURVEY F7).
- Totals: row-wise flag sums -> ``Tukey_Total`` / ``MAD_Total`` —
  TukeyTransformerTotal.py:25-36, MedianAbsolutDeviationTotal.py:25-37.
- Score: min-max scaled to [0,1] (runs.py:200-201), label = score >
  ``np.percentile(scores, 100*(1-pct))`` (runs.py:211-214).
- Verdict OR-merge: a row is a violation if ANY validator flags it
  (experiment.py:441-445); a partition FAILs if its violation share
  exceeds the budget.

Execution shape: profile (already computed) is a few-KB broadcast; the
check itself is a stateless vectorized ``map_batches``; score scaling and
thresholding need two tiny barrier aggregates (pre-aggregated per block —
only value-count rows shuffle); verdicts are a partial-then-final groupby
on ``partition_id``.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..profile import POOLED, TableProfile
from ..sketches import ValueCounts

TUKEY_SUFFIX = "_TUKEY"      # reference TukeyTransformer.py:56-57
MADZ_SUFFIX = "_Z_MOD"       # reference MedianAbsolutDeviation.py:64-65
TUKEY_TOTAL = "Tukey_Total"
MAD_TOTAL = "MAD_Total"
SCORE_COL = "AnomalyScore"
LABEL_COL = "AnomalyLabel"


@dataclass
class FenceState:
    """Per-column fitted scalars — the engine's analogue of the
    reference's fitted transformer attributes (TukeyTransformer.py:37-42)."""

    lo: float
    hi: float
    med: float
    mad: float


def _weighted_median_abs_dev(values: np.ndarray, counts: np.ndarray,
                             med: float) -> float:
    """MAD = median of |x - med|, computed exactly from value counts."""
    dev = np.abs(values.astype(np.float64) - med)
    vc = ValueCounts.from_items(dev, counts, max_items=len(dev) + 1)
    return vc.quantile(0.5)


def fence_states(profile: TableProfile, cols: list[str], *,
                 tukey_factor: float = 1.5,
                 mode: str = "per_column") -> dict[str, FenceState]:
    """Build check state from a profile.

    ``mode='per_column'`` is the principled engine default;
    ``mode='pooled'`` reproduces the reference's global-flattened
    statistics (np.quantile with no axis — TukeyTransformer.py:37-38),
    requiring the profile to have been computed with ``pooled=True``.
    """
    out: dict[str, FenceState] = {}
    for col in cols:
        src = profile[POOLED if mode == "pooled" else col]
        q1, q3 = src.quantile(0.25), src.quantile(0.75)
        iqr = q3 - q1
        med = src.quantile(0.5)
        if src.exact_quantiles and src.values.counts:
            vals, cnts = src.values.sorted_arrays()
            mad = _weighted_median_abs_dev(vals, cnts, med)
        else:
            # t-digest path: MAD needs a dedicated second pass (mad_pass);
            # fall back to a digest-based approximation here.
            mad = float("nan")
        out[col] = FenceState(lo=q1 - tukey_factor * iqr,
                              hi=q3 + tukey_factor * iqr,
                              med=med, mad=mad)
    return out


class RowChecker:
    """Actor-pool / task callable: append per-row evidence columns.

    State (the fitted fences) is deserialized ONCE per actor in
    ``__init__`` — setup-per-actor, work-per-batch.
    """

    def __init__(self, state_blob: bytes, *, mad_threshold: float = 3.5,
                 id_cols: list[str] | None = None):
        self.states: dict[str, FenceState] = pickle.loads(state_blob)
        self.mad_threshold = mad_threshold
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        tukey_flags = []
        mad_flags = []
        out = batch
        for col, st in self.states.items():
            v = out[col].cast(pa.float64()).combine_chunks().to_numpy(
                zero_copy_only=False)
            valid = ~np.isnan(v)
            tk = ((v < st.lo) | (v > st.hi)) & valid
            if st.mad and st.mad > 0 and not np.isnan(st.mad):
                z = 0.6745 * (v - st.med) / st.mad
                md = (np.abs(z) > self.mad_threshold) & valid
            else:
                md = np.zeros(len(v), dtype=bool)
            tk8 = tk.astype(np.int8)
            md8 = md.astype(np.int8)
            tukey_flags.append(tk8)
            mad_flags.append(md8)
            out = out.append_column(col + TUKEY_SUFFIX, pa.array(tk8))
            out = out.append_column(col + MADZ_SUFFIX, pa.array(md8))
        n = out.num_rows
        tk_tot = (np.sum(tukey_flags, axis=0, dtype=np.int64)
                  if tukey_flags else np.zeros(n, dtype=np.int64))
        md_tot = (np.sum(mad_flags, axis=0, dtype=np.int64)
                  if mad_flags else np.zeros(n, dtype=np.int64))
        out = out.append_column(TUKEY_TOTAL, pa.array(tk_tot))
        out = out.append_column(MAD_TOTAL, pa.array(md_tot))
        return out


def check_rows(ds, states: dict[str, FenceState], *,
               mad_threshold: float = 3.5, concurrency: int | None = None):
    """Apply :class:`RowChecker` over a Dataset.

    Default: stateless tasks with the few-KB fence state captured in the
    closure (exactly how the reference shares fitted scalars).  Pass
    ``concurrency`` to run as an actor pool instead (useful when the
    state grows, e.g. large encoder maps — deserialized once per actor).
    """
    blob = pickle.dumps(states)
    if concurrency is not None:
        return ds.map_batches(
            RowChecker, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=concurrency,
            fn_constructor_kwargs={"state_blob": blob,
                                   "mad_threshold": mad_threshold})
    checker = RowChecker(blob, mad_threshold=mad_threshold)
    return ds.map_batches(checker.__call__, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# score scaling + labels (two tiny barriers, pre-aggregated)


def _score_counts_partial(batch: pa.Table) -> pa.Table:
    raw = pc.add(batch[TUKEY_TOTAL], batch[MAD_TOTAL]).to_numpy(
        zero_copy_only=False)
    vals, cnts = np.unique(raw, return_counts=True)
    return pa.table({"score_raw": pa.array(vals.astype(np.int64)),
                     "n": pa.array(cnts.astype(np.int64))})


def score_threshold(checked_ds, *, pct: float = 0.10
                    ) -> tuple[float, float, float]:
    """Return (min, max, percentile-threshold) of the raw score.

    Raw scores are small ints (flag sums), so the per-block value-counts
    partial collapses to a handful of rows before the groupby — the
    shuffle moves O(distinct_scores × blocks), never O(rows).
    """
    from ray.data.aggregate import Sum

    counts = (checked_ds
              .map_batches(_score_counts_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("score_raw").aggregate(Sum("n", alias_name="n"))
              ).take_all()
    vc = ValueCounts.from_items(
        [int(r["score_raw"]) for r in counts],
        [int(r["n"]) for r in counts], max_items=len(counts) + 1)
    vals, _ = vc.sorted_arrays()
    lo = float(vals[0]) if len(vals) else 0.0
    hi = float(vals[-1]) if len(vals) else 0.0
    thr = vc.quantile(1.0 - pct)  # np.percentile(scores, 100*(1-pct)), runs.py:211
    return float(lo), float(hi), float(thr)


def score_stats_from_profile(profile: TableProfile,
                             states: dict[str, FenceState], *,
                             pct: float = 0.10,
                             mad_threshold: float = 3.5
                             ) -> tuple[float, float, float] | None:
    """Derive (min, max, percentile-threshold) of the raw flag-sum score
    straight from the profile's EXACT value counts — zero extra dataset
    executions when the check covers a SINGLE column.

    The raw score is a deterministic function of that column's value,
    so its multiset folds directly off the value counts; null/NaN rows
    score 0 exactly as :class:`RowChecker` emits (flags are masked to
    valid values).  Returns None when the states span several columns
    (the joint flag-sum distribution is not derivable from marginals)
    or the profile lost exactness — callers fall back to the
    :func:`score_threshold` pass.
    """
    if len(states) != 1:
        return None
    (col, st), = states.items()
    src = profile[col]
    if not src.exact_quantiles:
        return None
    vals, cnts = src.values.sorted_arrays()
    v = np.asarray(vals, dtype=np.float64)
    cnts = np.asarray(cnts, dtype=np.int64)
    # NaN entries live in the value counts AND in moments.nans;
    # null_count covers both, so drop them here and score them 0 below
    m = ~np.isnan(v)
    v, cnts = v[m], cnts[m]
    tuk = ((v < st.lo) | (v > st.hi)).astype(np.int64)
    if st.mad and st.mad > 0 and not np.isnan(st.mad):
        md = (np.abs(0.6745 * (v - st.med) / st.mad)
              > mad_threshold).astype(np.int64)
    else:
        md = np.zeros(len(v), dtype=np.int64)
    raw = tuk + md
    zeros_extra = int(src.null_count)
    if zeros_extra:
        raw = np.concatenate([raw, [0]])
        cnts = np.concatenate([cnts, [zeros_extra]])
    vc = ValueCounts.from_items(raw, cnts, max_items=len(raw) + 1)
    rv, _ = vc.sorted_arrays()
    lo = float(rv[0]) if len(rv) else 0.0
    hi = float(rv[-1]) if len(rv) else 0.0
    return lo, hi, float(vc.quantile(1.0 - pct))


def attach_scores(checked_ds, *, pct: float = 0.10,
                  stats: tuple[float, float, float] | None = None):
    """Append ``AnomalyScore`` (min-max scaled raw flag sum, runs.py:200-201)
    and ``AnomalyLabel`` (score_raw > percentile threshold, runs.py:211-214).

    Pass ``stats`` (from :func:`score_stats_from_profile`) to skip the
    :func:`score_threshold` barrier pass entirely — the whole chain then
    executes once, at the final consumer."""
    lo, hi, thr = stats if stats is not None \
        else score_threshold(checked_ds, pct=pct)
    span = hi - lo

    def attach(batch: pa.Table) -> pa.Table:
        raw = pc.add(batch[TUKEY_TOTAL], batch[MAD_TOTAL]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        score = (raw - lo) / span if span > 0 else np.zeros_like(raw)
        label = (raw > thr).astype(np.int8)
        batch = batch.append_column(SCORE_COL, pa.array(score))
        batch = batch.append_column(LABEL_COL, pa.array(label))
        return batch

    return checked_ds.map_batches(attach, batch_format="pyarrow",
                                  zero_copy_batch=True)


# ---------------------------------------------------------------------------
# per-partition verdicts


def partition_check_summary(checked_ds, partition_col: str,
                            checks: dict[str, tuple[tuple[str, ...], float]]):
    """ALL per-partition budget checks in ONE streaming pass.

    ``checks`` maps check-name -> (evidence_cols, budget).  Each block
    emits one row per partition with per-check violation counts; the
    driver sums the O(blocks x partitions) partials and applies budgets.
    Returns a pandas DataFrame (partition_col, n_rows, {name}_viol,
    {name}_fail per check).
    """
    import pandas as pd

    names = list(checks)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[partition_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        cols = {partition_col: pa.array(uniq),
                "n_rows": pa.array(np.bincount(
                    inv, minlength=len(uniq)).astype(np.int64))}
        for name in names:
            evidence_cols, _ = checks[name]
            viol = np.zeros(batch.num_rows, dtype=bool)
            for c in evidence_cols:
                viol |= batch[c].to_numpy(zero_copy_only=False) > 0
            cols[f"{name}_viol"] = pa.array(np.bincount(
                inv, weights=viol.astype(np.float64),
                minlength=len(uniq)).astype(np.int64))
        return pa.table(cols)

    rows = checked_ds.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    df = pd.DataFrame(rows).groupby(partition_col, as_index=False).sum()
    for name in names:
        _, budget = checks[name]
        df[f"{name}_fail"] = (df[f"{name}_viol"] / df["n_rows"]
                              > budget).astype(int)
    return df.sort_values(partition_col).reset_index(drop=True)


def partition_verdicts(checked_ds, partition_col: str, *,
                       budget: float = 0.05,
                       evidence_cols: tuple[str, ...] = (TUKEY_TOTAL, MAD_TOTAL)):
    """Per-partition pass/fail: violation share vs budget.

    A row is a violation if ANY evidence column is > 0 (the reference's
    OR-merge, experiment.py:441-445).  Partial counts per block, a
    32-way Arrow tree-merge level, then a driver fold — a Ray
    sort-groupby here pays 1-2 s of exchange overhead for a verdict
    keyspace of dozens-to-thousands of partitions (verdict tables are
    human/manifest-consumed; the flat-cost lesson from the census
    reduces).  Driver rows stay O(partitions x blocks / 32).
    Returns a Dataset with (partition_col, n_rows, n_viol, fail).
    """
    import pandas as pd

    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        viol = np.zeros(batch.num_rows, dtype=bool)
        for c in evidence_cols:
            viol |= batch[c].to_numpy(zero_copy_only=False) > 0
        keys = batch[partition_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        nv = np.bincount(inv, weights=viol.astype(np.float64),
                         minlength=len(uniq)).astype(np.int64)
        return pa.table({partition_col: pa.array(uniq),
                         "n_rows": pa.array(n), "n_viol": pa.array(nv)})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(partition_col).aggregate(
            [("n_rows", "sum"), ("n_viol", "sum")])
        return pa.table({partition_col: g[partition_col],
                         "n_rows": g["n_rows_sum"],
                         "n_viol": g["n_viol_sum"]})

    rows = (checked_ds
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(merge, batch_size=32, batch_format="pyarrow")
            ).take_all()
    if not rows:
        return rd.from_arrow(pa.table({
            partition_col: pa.array([], type=pa.int64()),
            "n_rows": pa.array([], type=pa.int64()),
            "n_viol": pa.array([], type=pa.int64()),
            "fail": pa.array([], type=pa.int8())}))
    df = (pd.DataFrame(rows)
          .groupby(partition_col, as_index=False)[["n_rows", "n_viol"]]
          .sum())
    df["fail"] = (df["n_viol"] / df["n_rows"] > budget).astype(np.int8)
    return rd.from_pandas(
        df.sort_values(partition_col).reset_index(drop=True))
