"""Session-7 stage kernels: systematic sampling, 2-D skyline,
dup-cluster histogram, snapshot diff — each vs a naive single-process
oracle on multi-block layouts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from autoprepad_ray.stages.topk import _skyline_mask, skyline_2d
from autoprepad_ray.stages.rank import systematic_sample


def _naive_skyline(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """O(n^2) domination check: kept iff nobody is >= on both and >
    on at least one."""
    keep = np.ones(len(x), dtype=bool)
    for i in range(len(x)):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        keep[i] = not dom.any()
    return keep


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 7), (2, 60), (3, 200)])
def test_skyline_mask_matches_naive(seed, n):
    rng = np.random.default_rng(seed)
    # small value range forces x ties AND exact (x, y) duplicates
    x = rng.integers(0, 8, n).astype(np.float64)
    y = rng.integers(0, 8, n).astype(np.int64)
    got = _skyline_mask(x, y)
    exp = _naive_skyline(x, y)
    np.testing.assert_array_equal(got, exp)


def test_skyline_2d_block_layout_invariant(ray_session):
    rng = np.random.default_rng(42)
    n = 300
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "x": rng.integers(0, 20, n).astype(np.float64),
                       "y": rng.integers(0, 20, n).astype(np.int64)})
    exp_mask = _naive_skyline(df["x"].to_numpy(), df["y"].to_numpy())
    exp = df[exp_mask].sort_values("id").reset_index(drop=True)
    for blocks in (1, 3, 11):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
        got = (skyline_2d(ds, x_col="x", y_col="y",
                          keep_cols=["id", "x", "y"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_skyline_2d_timestamp_axis(ray_session):
    ts = pa.array(np.array(["2024-01-01", "2024-01-05", "2024-01-03"],
                           dtype="datetime64[us]"))
    t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                  "p": pa.array([5.0, 1.0, 5.0]), "d": ts})
    out = skyline_2d(rd.from_arrow(t), x_col="p", y_col="d",
                     keep_cols=["id", "p", "d"]).to_pandas()
    # id2 (p=5, latest date among p=5) and id1 (p=1 but globally latest)
    assert sorted(out["id"]) == [1, 2]
    assert out["d"].dtype.kind == "M"


def test_systematic_sample_matches_cumsum(ray_session):
    rng = np.random.default_rng(9)
    n, stride = 500, 37
    w = rng.integers(1, 25, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    cum = np.cumsum(w)
    exp_keep = (cum // stride) > ((cum - w) // stride)
    for blocks in (1, 4, 13):
        ds = rd.from_arrow(pa.table({"id": ids, "w": w})) \
            .repartition(blocks)
        got = (systematic_sample(ds, ["id"], weight_col="w",
                                 stride=stride, keep_cols=["id", "w"],
                                 out_col="cum")
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert got["id"].tolist() == ids[exp_keep].tolist()
        assert got["cum"].tolist() == cum[exp_keep].tolist()
    # expected weight-proportionality: every stride boundary below the
    # total is owned by exactly one kept row
    assert got["cum"].iloc[-1] // stride == cum[-1] // stride


def test_dup_cluster_size_histogram_planted(ray_session):
    texts = (["solo %d" % i for i in range(20)]
             + ["pair"] * 2 + ["trio"] * 3 + ["quad"] * 4)
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(5)
    from autoprepad_ray.stages.text import dup_cluster_size_histogram

    out = dup_cluster_size_histogram(ds).sort_values("cluster_size")
    assert out["cluster_size"].tolist() == [1, 2, 3, 4]
    assert out["n_clusters"].tolist() == [20, 1, 1, 1]
    assert out["n_docs"].tolist() == [20, 2, 3, 4]
    assert int(out["n_docs"].sum()) == len(texts)


def test_snapshot_diff_statuses(ray_session):
    from autoprepad_ray.validators.reconcile import snapshot_diff_counts

    #        old-only, both-equal, both-changed(old 1 new 2)
    users = np.array([1, 2, 3, 2, 3, 3], dtype=np.int64)
    ts = np.array(["2024-01-10", "2024-01-10", "2024-01-10",
                   "2024-01-20", "2024-01-20", "2024-01-20"],
                  dtype="datetime64[us]")
    t = pa.table({"user_id": pa.array(users), "ts": pa.array(ts)})
    out = snapshot_diff_counts(rd.from_arrow(t).repartition(3),
                               key_col="user_id", ts_col="ts",
                               cut="2024-01-16")
    out = out.sort_values("user_id").reset_index(drop=True)
    assert out["status"].tolist() == ["removed", "unchanged", "changed"]
    assert out["n_old"].tolist() == [1, 1, 1]
    assert out["n_new"].tolist() == [0, 1, 2]
    # pack-range guard fires loudly instead of corrupting
    bad = pa.table({"user_id": pa.array([2**62], pa.int64()),
                    "ts": pa.array(ts[:1])})
    with pytest.raises(Exception, match="2\\^62"):
        snapshot_diff_counts(rd.from_arrow(bad), key_col="user_id",
                             ts_col="ts", cut="2024-01-16")


@pytest.mark.parametrize("xd,yd", [(np.int32, np.int32),
                                   (np.int16, np.uint8),
                                   (np.uint64, np.uint64)])
def test_skyline_mask_narrow_and_unsigned_dtypes(xd, yd):
    # the r5 sentinel bug: prev[0] = int64.min wrapped in narrow or
    # unsigned dtypes, silently dropping frontier rows
    x = np.array([5, 4], dtype=xd)
    y = np.array([2, 1], dtype=yd)
    got = _skyline_mask(x, y)
    np.testing.assert_array_equal(got, [True, False])
    rng = np.random.default_rng(7)
    xr = rng.integers(0, 6, 80).astype(xd)
    yr = rng.integers(0, 6, 80).astype(yd)
    np.testing.assert_array_equal(
        _skyline_mask(xr, yr),
        _naive_skyline(xr.astype(np.int64), yr.astype(np.int64)))


def test_skyline_mask_uint64_above_int64_range():
    x = np.array([(1 << 63) + 5, (1 << 63) + 4], dtype=np.uint64)
    y = np.array([1, 2], dtype=np.uint64)
    np.testing.assert_array_equal(_skyline_mask(x, y), [True, True])


from hypothesis import given, settings, strategies as st


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
                min_size=1, max_size=60),
       st.sampled_from([np.int64, np.int32, np.int16, np.float64]))
def test_skyline_mask_hypothesis(pairs, dtype):
    x = np.array([p[0] for p in pairs])
    y = np.array([p[1] for p in pairs])
    if dtype != np.float64:
        x = x.astype(dtype); y = y.astype(dtype)
    else:
        x = x.astype(np.float64); y = y.astype(np.float64)
    np.testing.assert_array_equal(
        _skyline_mask(x, y),
        _naive_skyline(x.astype(np.int64), y.astype(np.int64)))
