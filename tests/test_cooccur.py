"""Co-occurrence graph construction + triangles (stages/cooccur.py) vs
brute-force itertools/dict oracles on random bipartite incidences."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from autoprepad_ray.stages.cooccur import (cooccur_weights, mutual_knn,
                                           triangle_counts)


def _weights_oracle(pairs):
    """{(u, v) u<v: shared group count} from distinct (group, node)."""
    by_grp = {}
    for g, n in set(pairs):
        by_grp.setdefault(g, set()).add(n)
    w = {}
    for ns in by_grp.values():
        for a, b in combinations(sorted(ns), 2):
            w[(a, b)] = w.get((a, b), 0) + 1
    return w


def _knn_oracle(w, k):
    """Mutual top-k (shared DESC, partner ASC) of the symmetric dict."""
    adj = {}
    for (a, b), s in w.items():
        adj.setdefault(a, []).append((-s, b))
        adj.setdefault(b, []).append((-s, a))
    top = {u: {b for _, b in sorted(vs)[:k]} for u, vs in adj.items()}
    return {(a, b): s for (a, b), s in w.items()
            if b in top[a] and a in top[b]}


def _tri_oracle(edges):
    es = set(edges)
    nodes = sorted({n for e in edges for n in e})
    cnt = {}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for n in (x, y, z):
                cnt[n] = cnt.get(n, 0) + 1
    return cnt


def _random_incidence(rng, n_groups, n_nodes, n_rows):
    g = rng.integers(0, n_groups, n_rows)
    n = rng.integers(0, n_nodes, n_rows)
    return g, n


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cooccur_weights_match_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    g, n = _random_incidence(rng, n_groups=40, n_nodes=25, n_rows=600)
    ds = rd.from_arrow(pa.table({"g": g, "n": n})).repartition(5)
    u, v, w = cooccur_weights(ds, part_col="g", node_col="n",
                              expand_tasks=4)
    got = dict(zip(zip(u.tolist(), v.tolist()), w.tolist()))
    assert got == _weights_oracle(list(zip(g.tolist(), n.tolist())))


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 5), (2, 1)])
def test_mutual_knn_matches_oracle(ray_session, seed, k):
    rng = np.random.default_rng(seed)
    g, n = _random_incidence(rng, n_groups=30, n_nodes=20, n_rows=400)
    ds = rd.from_arrow(pa.table({"g": g, "n": n}))
    u, v, w = cooccur_weights(ds, part_col="g", node_col="n")
    mu, mv, mw = mutual_knn(u, v, w, k=k)
    got = dict(zip(zip(mu.tolist(), mv.tolist()), mw.tolist()))
    exp = _knn_oracle(_weights_oracle(list(zip(g.tolist(), n.tolist()))),
                      k)
    assert got == exp


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_triangle_counts_match_oracle(ray_session, seed):
    rng = np.random.default_rng(100 + seed)
    # random sparse undirected graph, u < v
    n_nodes = 30
    a = rng.integers(0, n_nodes, 200)
    b = rng.integers(0, n_nodes, 200)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    key = np.unique((lo.astype(np.int64) << 32) | hi)
    u, v = key >> np.int64(32), key & np.int64((1 << 32) - 1)
    nodes, ntri = triangle_counts(u, v, tasks=3)
    got = dict(zip(nodes.tolist(), ntri.tolist()))
    assert got == _tri_oracle(list(zip(u.tolist(), v.tolist())))


def test_triangle_counts_empty(ray_session):
    e = np.empty(0, dtype=np.int64)
    nodes, ntri = triangle_counts(e, e)
    assert len(nodes) == 0 and len(ntri) == 0


def test_cooccur_range_guard(ray_session):
    import ray

    ds = rd.from_arrow(pa.table({"g": [1, 2], "n": [0, 1 << 40]}))
    # the guard raises inside the map task; Ray surfaces RayTaskError
    with pytest.raises(ray.exceptions.RayTaskError, match="32 bits"):
        cooccur_weights(ds, part_col="g", node_col="n")

def test_cooccur_weights_all_empty_blocks(ray_session):
    # every block empty (upstream filter removed all rows) — the empty
    # payload rows must fold to the empty triple, not IndexError
    t = pa.table({"g": pa.array([], pa.int64()),
                  "n": pa.array([], pa.int64())})
    u, v, w = cooccur_weights(rd.from_arrow(t), part_col="g",
                              node_col="n")
    assert len(u) == len(v) == len(w) == 0


def test_mutual_knn_direct_range_guard():
    # direct callers (not via cooccur_weights) hit the same 32-bit
    # packing — the guard must fire, not silently corrupt pair keys
    big = np.array([1 << 40], dtype=np.int64)
    one = np.array([1], dtype=np.int64)
    with pytest.raises(ValueError, match="32 bits"):
        mutual_knn(big, one, one, k=2)
    with pytest.raises(ValueError, match="32 bits"):
        triangle_counts(one, big)


def test_pair_census_hub_group_chunked(ray_session):
    # one hub group whose pair count alone exceeds any small budget:
    # weights must still be exact (inner pair-axis chunking)
    m = 120                              # 7140 pairs in one group
    g = np.zeros(m, dtype=np.int64)
    n = np.arange(m, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "n": n}))
    u, v, w = cooccur_weights(ds, part_col="g", node_col="n",
                              expand_tasks=2)
    assert len(u) == m * (m - 1) // 2
    assert (w == 1).all()
