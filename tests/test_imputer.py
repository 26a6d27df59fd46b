"""Iterative imputer (F4 slot) vs mean-fill and layout invariance."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from autoprepad_ray.stages.imputer import (fit_iterative_imputer,
                                           iterative_impute)

COLS = ["a", "b", "c"]


def _fixture(n=2000, seed=13, miss_frac=0.2):
    rng = np.random.default_rng(seed)
    a = rng.normal(10, 3, n)
    b = 2.0 * a + rng.normal(0, 0.5, n)
    c = -a + 0.5 * b + rng.normal(0, 0.5, n)
    full = np.column_stack([a, b, c])
    X = full.copy()
    mask = rng.random(full.shape) < miss_frac
    # keep at least one observed cell per row so regressors have signal
    mask[mask.all(axis=1), 0] = False
    X[mask] = np.nan
    tbl = pa.table({"row_id": pa.array(np.arange(n)),
                    **{c_: pa.array(X[:, k])
                       for k, c_ in enumerate(COLS)}})
    return full, X, mask, tbl


def test_iterative_beats_mean_fill():
    full, X, mask, tbl = _fixture()
    ds = rd.from_arrow(tbl).repartition(4)
    state = fit_iterative_imputer(ds, COLS, iters=5)
    got = iterative_impute(ds, state).to_pandas().sort_values("row_id")
    imputed = got[COLS].to_numpy()
    # no NaNs remain, observed cells untouched
    assert not np.isnan(imputed).any()
    assert np.array_equal(imputed[~mask], full[~mask])
    means = np.nanmean(X, axis=0)
    rmse_it = np.sqrt(np.mean((imputed[mask] - full[mask]) ** 2))
    rmse_mean = np.sqrt(np.mean(
        (np.broadcast_to(means, full.shape)[mask] - full[mask]) ** 2))
    # strongly correlated columns: regression recovers most of the
    # value (rows with several missing cells carry errors-in-variables
    # attenuation, exactly as sklearn's IterativeImputer does)
    assert rmse_it < 0.5 * rmse_mean, (rmse_it, rmse_mean)
    # missing flags match the mask
    for k, c in enumerate(COLS):
        assert np.array_equal(
            got[c + "_was_missing"].to_numpy().astype(bool), mask[:, k])


def test_iterative_impute_batch_invariant():
    _, _, _, tbl = _fixture(n=600, seed=3)
    a = rd.from_arrow(tbl).repartition(1)
    b = rd.from_arrow(tbl).repartition(7)
    st = fit_iterative_imputer(a, COLS, iters=3)
    ia = iterative_impute(a, st).to_pandas().sort_values("row_id")
    ib = iterative_impute(b, st).to_pandas().sort_values("row_id")
    for c in COLS:
        assert np.array_equal(ia[c].to_numpy(), ib[c].to_numpy())


def test_iterative_impute_no_missing_passthrough():
    rng = np.random.default_rng(1)
    tbl = pa.table({"row_id": pa.array(np.arange(50)),
                    "a": pa.array(rng.normal(size=50)),
                    "b": pa.array(rng.normal(size=50)),
                    "c": pa.array(rng.normal(size=50))})
    ds = rd.from_arrow(tbl)
    st = fit_iterative_imputer(ds, COLS)
    assert st.steps == []
    out = iterative_impute(ds, st).to_pandas()
    assert not any(c.endswith("_was_missing") for c in out.columns)
    assert np.array_equal(out[COLS].to_numpy(),
                          tbl.to_pandas()[COLS].to_numpy())
