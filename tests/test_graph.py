"""Connected components / dedup clusters (stages/graph.py) vs a
brute-force union-find oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from autoprepad_ray.stages.graph import (attach_clusters,
                                         connected_components,
                                         _star_forest)


def _uf_oracle(src, dst):
    """Sequential union-find, min-id roots: {node: cluster}."""
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _as_dict(cc: pa.Table) -> dict:
    return dict(zip(cc["node"].to_pylist(), cc["cluster"].to_pylist()))


def _random_edges(rng, n_nodes, n_edges):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return src.astype(np.int64), dst.astype(np.int64)


@pytest.mark.parametrize("n_nodes,n_edges,seed", [
    (30, 15, 0),        # sparse: many small components
    (50, 200, 1),       # dense: collapses to few components
    (1000, 400, 2),     # mixture with singleton-free gaps
])
def test_cc_matches_union_find(ray_session, n_nodes, n_edges, seed):
    rng = np.random.default_rng(seed)
    src, dst = _random_edges(rng, n_nodes, n_edges)
    oracle = _uf_oracle(src.tolist(), dst.tolist())
    # Dataset path, many small blocks so the tree merge is exercised
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(16)
    got = _as_dict(connected_components(ds, "src", "dst"))
    assert got == oracle
    # driver-array and pa.Table paths agree
    assert _as_dict(connected_components((src, dst), "s", "d")) == oracle
    assert _as_dict(connected_components(
        pa.table({"src": src, "dst": dst}), "src", "dst")) == oracle


def test_cc_chain_spans_blocks(ray_session):
    """A single path graph 0-1-...-399 cut into 32 blocks must still
    collapse to one component rooted at 0 (cross-block merging)."""
    n = 400
    t = pa.table({"src": np.arange(n - 1, dtype=np.int64),
                  "dst": np.arange(1, n, dtype=np.int64)})
    cc = connected_components(rd.from_arrow(t).repartition(32),
                              "src", "dst")
    assert cc.num_rows == n
    assert set(cc["cluster"].to_pylist()) == {0}


def test_cc_string_ids(ray_session):
    src = np.array(["b", "c", "x"], dtype=object)
    dst = np.array(["a", "b", "y"], dtype=object)
    got = _as_dict(connected_components((src, dst), "s", "d"))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_empty_and_self_loops(ray_session):
    empty = connected_components(
        (np.empty(0, np.int64), np.empty(0, np.int64)), "s", "d")
    assert empty.num_rows == 0
    loops = connected_components(
        (np.array([5, 7]), np.array([5, 7])), "s", "d")
    assert _as_dict(loops) == {5: 5, 7: 7}


def test_star_forest_idempotent():
    rng = np.random.default_rng(3)
    src, dst = _random_edges(rng, 200, 300)
    fs, fd = _star_forest(src, dst)
    fs2, fd2 = _star_forest(fs, fd)
    assert np.array_equal(np.sort(fs), np.sort(fs2))
    assert _uf_oracle(fs.tolist(), fd.tolist()) == \
        _uf_oracle(src.tolist(), dst.tolist())


def test_attach_clusters_labels_and_canonicals(ray_session):
    cc = connected_components(
        (np.array([2, 3], dtype=np.int64), np.array([1, 2], dtype=np.int64)),
        "s", "d")
    corpus = rd.from_arrow(pa.table({"doc_id": np.arange(6, dtype=np.int64)}))
    out = attach_clusters(corpus, "doc_id", cc).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["cluster_id"].tolist() == [0, 1, 1, 1, 4, 5]
    assert out["is_canonical"].tolist() == [True, True, False, False,
                                            True, True]


def test_cc_bipartite_offset_equals_direct(ray_session):
    """The bipartite (order <-> part+2^40) encoding used by
    cc_orders_sharing_part yields the same order clustering as
    explicitly joining out per-part cliques."""
    rng = np.random.default_rng(7)
    orders = rng.integers(0, 60, 120).astype(np.int64)
    parts = rng.integers(0, 25, 120).astype(np.int64)
    off = np.int64(1) << np.int64(40)
    cc = connected_components((orders, parts + off), "s", "d")
    got = {n: c for n, c in zip(cc["node"].to_pylist(),
                                cc["cluster"].to_pylist()) if n < off}
    df = pd.DataFrame({"o": orders, "p": parts}).drop_duplicates()
    m = df.merge(df, on="p")
    oracle = _uf_oracle(m["o_x"].tolist(), m["o_y"].tolist())
    assert got == oracle
