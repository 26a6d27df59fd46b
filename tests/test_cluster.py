"""F15 k-medoids (stages/cluster.py): PAM kernel properties + the
distributed CLARA fit pinned against a pure-numpy replica of the same
sample/fit/cost/canonicalize recipe (so the Ray plumbing — per-block
hash sampling, broadcast cost pass, assignment — is what's under test).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from autoprepad_ray.stages.cluster import (KMedoidState, _id_hash,
                                           _pairwise, assign_medoids,
                                           kmedoids_fit, pam)


def _blobs(seed=0, per=20):
    rng = np.random.default_rng(seed)
    centers = np.array([[0.0, 0.0], [50.0, 0.0], [0.0, 80.0]])
    X = np.concatenate([c + rng.normal(0, 0.5, (per, 2)) for c in centers])
    return X


def test_pam_recovers_separated_blobs():
    X = _blobs()
    med = pam(X, 3)
    labels = _pairwise(X, X[med], "euclidean").argmin(axis=1)
    blob = np.repeat([0, 1, 2], 20)
    seen = set()
    for b in range(3):
        ls = np.unique(labels[blob == b])
        assert len(ls) == 1
        seen.add(int(ls[0]))
    assert seen == {0, 1, 2}


def test_pam_swap_local_optimum():
    rng = np.random.default_rng(7)
    X = rng.normal(0, 1, (40, 3))
    k = 2
    med = pam(X, k)
    cost = _pairwise(X, X[med], "euclidean").min(axis=1).sum()
    for mi in range(k):
        for h in range(len(X)):
            if h in med:
                continue
            trial = med.copy()
            trial[mi] = h
            c = _pairwise(X, X[trial], "euclidean").min(axis=1).sum()
            assert c >= cost - 1e-9


def test_pam_manhattan_metric():
    X = _blobs(seed=3)
    med = pam(X, 3, metric="manhattan")
    labels = _pairwise(X, X[med], "manhattan").argmin(axis=1)
    assert len(np.unique(labels[:20])) == 1
    assert len(np.unique(np.concatenate(
        [np.unique(labels[i * 20:(i + 1) * 20]) for i in range(3)]))) == 3


def _numpy_clara(ids, X, k, sample_size, n_samples, metric="euclidean"):
    """Driver-free replica of kmedoids_fit's recipe on plain arrays."""
    want = sample_size * n_samples
    order = np.argsort(_id_hash(ids), kind="stable")[:want]
    S, sids = X[order], ids[order]
    chunk = max(len(S) // n_samples, 1)
    feats, mids, costs = [], [], []
    for i in range(n_samples):
        part = S[i * chunk:(i + 1) * chunk]
        if len(part) < k:
            continue
        med = pam(part, k, metric=metric)
        feats.append(part[med])
        mids.append(sids[i * chunk:(i + 1) * chunk][med])
        costs.append(_pairwise(X, part[med], metric).min(axis=1).sum())
    win = int(np.argmin(costs))
    M, mi = feats[win], mids[win]
    canon = np.lexsort(tuple(M[:, j] for j in range(M.shape[1] - 1, -1, -1)))
    return M[canon], mi[canon], float(costs[win])


def test_kmedoids_fit_matches_numpy_replica():
    rng = np.random.default_rng(11)
    X = _blobs(seed=11, per=120)
    X = X + rng.normal(0, 0.01, X.shape)
    ids = np.arange(len(X), dtype=np.int64) * 7 + 3
    t = pa.table({"id": pa.array(ids),
                  "x": pa.array(X[:, 0]), "y": pa.array(X[:, 1])})
    ds = rd.from_arrow(t).repartition(5)
    state = kmedoids_fit(ds, ["x", "y"], "id", k=3,
                         sample_size=32, n_samples=2)
    M, mids, cost = _numpy_clara(ids, X, 3, 32, 2)
    np.testing.assert_allclose(state.medoids, M, rtol=0, atol=0)
    np.testing.assert_array_equal(state.medoid_ids, mids)
    assert state.cost == pytest.approx(cost, rel=1e-12)

    out = assign_medoids(ds, state).to_pandas().sort_values("id")
    D = _pairwise(X, M, "euclidean")
    exp_cl = D.argmin(axis=1)
    exp_d = D[np.arange(len(X)), exp_cl]
    got = out.set_index("id").loc[ids]
    np.testing.assert_array_equal(got["cluster"].to_numpy(), exp_cl)
    np.testing.assert_allclose(got["medoid_dist"].to_numpy(), exp_d,
                               rtol=0, atol=0)


def test_kmedoids_fit_block_boundary_invariant():
    """The hash-ordered sample (and hence the fit) must not depend on
    how the input is partitioned."""
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (300, 2))
    ids = np.arange(300, dtype=np.int64)
    t = pa.table({"id": pa.array(ids),
                  "x": pa.array(X[:, 0]), "y": pa.array(X[:, 1])})
    states = []
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        states.append(kmedoids_fit(ds, ["x", "y"], "id", k=2,
                                   sample_size=40, n_samples=2))
    np.testing.assert_array_equal(states[0].medoids, states[1].medoids)
    np.testing.assert_array_equal(states[0].medoid_ids,
                                  states[1].medoid_ids)


def test_string_id_hash_path():
    ids = np.array([f"doc_{i}" for i in range(50)], dtype=object)
    h = _id_hash(ids)
    assert h.dtype == np.uint64 and len(np.unique(h)) == 50


def test_registry_cluster_similarity():
    from autoprepad_ray.validators import registry
    rng = np.random.default_rng(2)
    X = _blobs(seed=2, per=40)
    t = pa.table({"id": pa.array(np.arange(len(X), dtype=np.int64)),
                  "x": pa.array(X[:, 0]), "y": pa.array(X[:, 1])})
    ds = rd.from_arrow(t)
    out = registry.run("cluster_similarity", ds, cols=["x", "y"],
                       id_col="id", k=3, sample_size=30,
                       n_samples=2).to_pandas()
    assert set(out.columns) >= {"id", "cluster", "medoid_dist"}
    assert out["cluster"].nunique() == 3
    assert (out["medoid_dist"] >= 0).all()
    # tight blobs: within-blob distance far below between-blob distance
    assert out["medoid_dist"].max() < 10.0
