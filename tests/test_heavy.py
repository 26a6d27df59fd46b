"""Misra-Gries heavy hitters: merge-tree bound properties on a zipf
stream (brute-force oracle) and the distributed two-pass pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa

from autoprepad_ray.validators.heavy import mg_compress, mg_merge


def _zipf_blocks(rng, n_blocks=20, block=2000, a=1.6):
    return [rng.zipf(a, size=block) % 1000 for _ in range(n_blocks)]


def test_mg_bound_and_superset():
    rng = np.random.default_rng(11)
    blocks = _zipf_blocks(rng)
    k = 50
    # simulate the distributed shape: per-block compress, 4-way tree
    parts = []
    for b in blocks:
        uk, c = np.unique(b, return_counts=True)
        parts.append(mg_compress(uk, c.astype(np.int64), k))
    while len(parts) > 1:
        parts = [mg_merge(parts[i:i + 4], k)
                 for i in range(0, len(parts), 4)]
    keys, est = parts[0]
    allv = np.concatenate(blocks)
    n = len(allv)
    true = pd.Series(allv).value_counts()
    bound = n / (k + 1)
    est_map = dict(zip(keys.tolist(), est.tolist()))
    for v, t in true.items():
        e = est_map.get(v, 0)
        assert e <= t <= e + bound, (v, e, t, bound)
    # superset: every key with true count > n/(k+1) survives the tree
    for v, t in true.items():
        if t > bound:
            assert v in est_map


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    import ray.data as rd

    from autoprepad_ray.validators.heavy import heavy_hitters

    rng = np.random.default_rng(5)
    vals = rng.zipf(1.4, size=40_000) % 500
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, type=pa.int64())})) \
        .repartition(8)
    out = heavy_hitters(ds, "k", frac=0.01).to_pandas()
    vc = pd.Series(vals).value_counts()
    exp = vc[vc > 0.01 * len(vals)]
    assert len(out) == len(exp)
    got = dict(zip(out["k"], out["cnt"]))
    for v, c in exp.items():
        assert got[v] == c
    # sorted by (cnt desc, key)
    assert list(out["cnt"]) == sorted(out["cnt"], reverse=True)


def test_heavy_hitters_empty_and_uniform(ray_session):
    import ray.data as rd

    from autoprepad_ray.validators.heavy import heavy_hitters

    # uniform data: nothing above 20%
    ds = rd.from_arrow(pa.table({"k": pa.array(np.arange(1000) % 10,
                                               type=pa.int64())}))
    out = heavy_hitters(ds, "k", frac=0.2).to_pandas()
    assert len(out) == 0
    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    assert len(heavy_hitters(empty, "k", frac=0.1).to_pandas()) == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(0, 40), min_size=0, max_size=200),
                min_size=1, max_size=12),
       st.integers(2, 25),
       st.integers(2, 5))
def test_mg_property_bound_any_tree(blocks, k, fanout):
    """For ANY block layout, capacity, and merge fan-out: est <= true <=
    est + n/(k+1), and every key above the bound is present."""
    parts = []
    for b in blocks:
        if not b:
            continue
        uk, c = np.unique(np.asarray(b, dtype=np.int64),
                          return_counts=True)
        parts.append(mg_compress(uk, c.astype(np.int64), k))
    if not parts:
        return
    while len(parts) > 1:
        parts = [mg_merge(parts[i:i + fanout], k)
                 for i in range(0, len(parts), fanout)]
    keys, est = parts[0]
    est_map = dict(zip(keys.tolist(), est.tolist()))
    allv = np.concatenate([np.asarray(b) for b in blocks if b])
    n = len(allv)
    bound = n / (k + 1)
    true = pd.Series(allv).value_counts()
    for v, t in true.items():
        e = est_map.get(v, 0)
        assert e <= t <= e + bound
        if t > bound:
            assert v in est_map
