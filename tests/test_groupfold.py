"""Hash-partitioned grouped fold (stages.groupfold): the Ray-groupby
replacement for near-unique int64 keys must reproduce an exact pandas
groupby under every reducer, keep slice schemas stable when slices are
empty, and apply the per-slice cut hook inside the fold."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from autoprepad_ray.stages.groupfold import grouped_fold


def _ds(n_rows=5000, n_keys=911, blocks=7, seed=11):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, size=n_rows).astype(np.int64)
    a = rng.integers(-50, 50, size=n_rows).astype(np.int64)
    x = np.round(rng.normal(size=n_rows), 3)
    df = pd.DataFrame({"k": keys, "a": a, "x": x})
    tables = [pa.Table.from_pandas(part, preserve_index=False)
              for part in np.array_split(df, blocks)]
    return rd.from_arrow(tables), df


def _partial(t: pa.Table) -> pa.Table:
    g = t.group_by("k").aggregate([("a", "max"), ("a", "min"),
                                   ("x", "sum"), ([], "count_all")])
    return g.rename_columns(["k", "hi", "lo", "sx", "n"])


REDUCERS = {"hi": "max", "lo": "min", "sx": "sum", "n": "sum"}
TYPES = {"sx": pa.float64()}


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    return (df.groupby("k", as_index=False)
            .agg(hi=("a", "max"), lo=("a", "min"), sx=("x", "sum"),
                 n=("a", "size"))
            .astype({"n": np.int64})
            .sort_values("k").reset_index(drop=True))


def test_grouped_fold_matches_pandas_groupby():
    ds, df = _ds()
    out = (grouped_fold(ds, _partial, REDUCERS, key="k", types=TYPES,
                        num_parts=5)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = _expected(df)
    # sums fold in a different order than pandas — compare to 1e-9
    pd.testing.assert_frame_equal(out, exp, check_exact=False, atol=1e-9)


def test_grouped_fold_empty_slices_keep_schema():
    # 2 keys over 16 parts -> at least 14 empty slices; the Dataset
    # must still concatenate (typed empties) and fold correctly
    df = pd.DataFrame({"k": np.array([1, 1, 2], dtype=np.int64),
                       "a": np.array([5, 7, -1], dtype=np.int64),
                       "x": np.array([0.5, 0.25, 1.0])})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (grouped_fold(ds, _partial, REDUCERS, key="k", types=TYPES,
                        num_parts=16)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, _expected(df))
    assert out["sx"].dtype == np.float64
    assert out["n"].dtype == np.int64


def test_grouped_fold_cut_runs_per_slice():
    ds, df = _ds()

    def cut(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n"], 8))

    out = (grouped_fold(ds, _partial, REDUCERS, key="k", types=TYPES,
                        num_parts=5, cut=cut)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = _expected(df)
    exp = exp[exp["n"] > 8].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_exact=False, atol=1e-9)
    assert len(out) > 0


def test_grouped_fold_partial_filters_whole_batch_away():
    # a partial_fn that filters some batches to 0 rows must not break
    # the pack step (regression: the sentinel bounds construction
    # indexed into the empty slice array)
    df = pd.DataFrame({"k": np.arange(40, dtype=np.int64) % 4,
                       "a": np.arange(40, dtype=np.int64),
                       "x": np.zeros(40)})
    # block 0 holds only k in {0,1}, block 1 only k in {2,3}
    b0 = df[df["k"] < 2]
    b1 = df[df["k"] >= 2]
    ds = rd.from_arrow([pa.Table.from_pandas(b, preserve_index=False)
                        for b in (b0, b1)])

    def filtering_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["k"], 2))  # empties block 0
        return _partial(t)

    out = (grouped_fold(ds, filtering_partial, REDUCERS, key="k",
                        types=TYPES, num_parts=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, _expected(df[df["k"] >= 2]))


def test_grouped_fold_negative_and_extreme_keys():
    rng = np.random.default_rng(5)
    keys = np.array([-(2**62), -3, 0, 7, 2**62] * 40, dtype=np.int64)
    a = rng.integers(0, 100, size=len(keys)).astype(np.int64)
    df = pd.DataFrame({"k": keys, "a": a, "x": np.zeros(len(keys))})
    tables = [pa.Table.from_pandas(p, preserve_index=False)
              for p in np.array_split(df, 4)]
    out = (grouped_fold(rd.from_arrow(tables), _partial, REDUCERS,
                        key="k", types=TYPES, num_parts=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, _expected(df))
