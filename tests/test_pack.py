"""Greedy context-window packing (stages/pack.py) vs a per-row greedy
oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from autoprepad_ray.stages.pack import _greedy_bins, pack_documents


def _greedy_oracle(sizes, capacity):
    b, acc, out = 0, 0, []
    for x in sizes:
        if acc > 0 and acc + x > capacity:
            b += 1
            acc = 0
        acc += x
        out.append(b)
    return out


@pytest.mark.parametrize("seed,cap", [(0, 100), (1, 17), (2, 1000)])
def test_greedy_bins_matches_oracle(seed, cap):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(1, 60, 500).astype(np.int64)
    assert _greedy_bins(sizes, cap).tolist() == _greedy_oracle(sizes, cap)


def test_greedy_bins_oversize_doc_gets_own_bin():
    sizes = np.array([10, 500, 10, 10], dtype=np.int64)
    assert _greedy_bins(sizes, 100).tolist() == [0, 1, 2, 2]
    # oversize first doc
    assert _greedy_bins(np.array([500, 10]), 100).tolist() == [0, 1]


def test_greedy_bins_exact_fit_boundary():
    # exactly filling a bin does NOT close it early; next doc overflows
    sizes = np.array([50, 50, 1], dtype=np.int64)
    assert _greedy_bins(sizes, 100).tolist() == [0, 0, 1]


def test_pack_documents_parallel_groups(ray_session):
    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame({
        "shard": rng.integers(0, 8, n),
        "doc": rng.permutation(n),
        "sz": rng.integers(1, 80, n)})
    ds = rd.from_pandas(df).repartition(16)
    out = pack_documents(ds, group_col="shard", order_col="doc",
                         size_col="sz", capacity=200).to_pandas()
    assert len(out) == n
    for shard, g in out.groupby("shard"):
        g = g.sort_values("doc")
        assert g["bin"].tolist() == _greedy_oracle(g["sz"].tolist(), 200)
