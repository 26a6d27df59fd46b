"""PCA reconstruction-error scorer vs a numpy SVD oracle (F14 slot)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from autoprepad_ray.stages.scorer import fit_pca_scorer, pca_scores

COLS = ["c0", "c1", "c2", "c3"]


def _fixture(n=500, seed=21):
    rng = np.random.default_rng(seed)
    # low-rank structure + noise; rows 0-4 are gross outliers
    basis = rng.standard_normal((2, 4))
    X = rng.standard_normal((n, 2)) @ basis \
        + 0.05 * rng.standard_normal((n, 4))
    X[:5] += 8.0 * rng.standard_normal((5, 4))
    tbl = pa.table({"row_id": pa.array(np.arange(n), type=pa.int64())}
                   | {c: pa.array(X[:, j]) for j, c in enumerate(COLS)})
    return X, tbl


def test_pca_scores_match_numpy_oracle():
    X, tbl = _fixture()
    ds = rd.from_arrow(tbl).repartition(3)
    state = fit_pca_scorer(ds, COLS, n_components=2)
    got = pca_scores(ds, state).to_pandas().sort_values("row_id")

    mean, scale = X.mean(axis=0), X.std(axis=0)
    scale[scale == 0] = 1.0
    Xs = (X - mean) / scale
    _, _, Vt = np.linalg.svd(Xs, full_matrices=False)
    V = Vt[:2]
    err = ((Xs - (Xs @ V.T) @ V) ** 2).sum(axis=1)
    assert np.allclose(got["pca_score"].to_numpy(), err, rtol=1e-8)
    # the planted outliers carry the top reconstruction errors
    top5 = set(got.nlargest(5, "pca_score")["row_id"])
    assert top5 == {0, 1, 2, 3, 4}


def test_pca_scorer_batch_invariant():
    """Per-row scores must not depend on the block layout."""
    X, tbl = _fixture(n=200, seed=5)
    a = rd.from_arrow(tbl).repartition(1)
    b = rd.from_arrow(tbl).repartition(7)
    st = fit_pca_scorer(a, COLS, n_components=2)
    sa = pca_scores(a, st).to_pandas().sort_values("row_id")
    sb = pca_scores(b, st).to_pandas().sort_values("row_id")
    assert np.array_equal(sa["pca_score"].to_numpy(),
                          sb["pca_score"].to_numpy())


def test_fit_pca_scorer_empty_input_raises():
    import pyarrow as pa
    import pytest as _pytest

    empty = rd.from_arrow(pa.table(
        {c: pa.array([], type=pa.float64()) for c in COLS}))
    with _pytest.raises(ValueError, match="no rows"):
        fit_pca_scorer(empty, COLS)
