"""Sketch unit + merge-associativity property tests (SURVEY §5)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from autoprepad_ray.sketches import (HyperLogLog, MomentSketch, TDigest,
                                     ValueCounts, hash64, popcount64)


def split3(x):
    k = len(x) // 3
    return x[:k], x[k:2 * k], x[2 * k:]


def test_popcount():
    v = np.array([0, 1, 3, 2**63, 2**64 - 1], dtype=np.uint64)
    assert popcount64(v).tolist() == [0, 1, 2, 1, 64]


def test_hash64_deterministic_and_typed():
    a = hash64(["a", "b", "a"])
    assert a[0] == a[2] and a[0] != a[1]
    b = hash64(np.array([1, 2, 3], dtype=np.int64))
    assert len(set(b.tolist())) == 3
    assert hash64(["x"], seed=1)[0] != hash64(["x"], seed=2)[0]


@given(st.lists(st.floats(-1e6, 1e6), min_size=3, max_size=300))
@settings(max_examples=50, deadline=None)
def test_moments_merge_exact(xs):
    x = np.array(xs)
    parts = split3(x)
    merged = MomentSketch()
    for p in parts:
        s = MomentSketch()
        s.update(p)
        merged.merge(s)
    whole = MomentSketch()
    whole.update(x)
    assert merged.n == whole.n == len(x)
    assert np.isclose(merged.mean, x.mean(), rtol=1e-9)
    assert np.isclose(merged.std, x.std(ddof=1), rtol=1e-6, atol=1e-9)
    assert merged.vmin == x.min() and merged.vmax == x.max()


def test_moments_nan_null_accounting():
    s = MomentSketch()
    s.update(np.array([1.0, np.nan, 3.0]), nulls=2)
    assert s.n == 2 and s.nans == 1 and s.nulls == 2


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=500),
       st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]))
@settings(max_examples=60, deadline=None)
def test_valuecounts_quantile_matches_numpy(xs, q):
    x = np.array(xs, dtype=float)
    vc = ValueCounts()
    for p in split3(x):
        v2 = ValueCounts()
        v2.update(p)
        vc.merge(v2)
    assert np.isclose(vc.quantile(q), np.quantile(x, q), rtol=1e-12, atol=1e-12)


def test_valuecounts_mode_histogram_overflow():
    vc = ValueCounts(max_items=3)
    vc.update(np.array([1, 1, 2, 2, 3]))
    assert vc.mode() == (1, 2)  # tie 1/2 broken by smaller value
    edges = np.array([0.0, 1.5, 3.5])
    assert vc.histogram(edges).tolist() == [2, 3]
    vc.update(np.array([4, 5, 6]))
    assert vc.overflow
    vals, cnts = vc.drain()  # owner seeds approximate sketches from these
    assert len(vals) == 6 and int(cnts.sum()) == 8
    assert vc.counts == {}
    vc.update(np.array([7]))  # dormant after overflow
    assert vc.counts == {}


def test_tdigest_quantiles_close():
    rng = np.random.default_rng(42)
    x = rng.lognormal(3, 1, 200_000)
    td = TDigest()
    for chunk in np.array_split(x, 37):
        t2 = TDigest()
        t2.update(chunk)
        td.merge(t2)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        exact = np.quantile(x, q)
        got = td.quantile(q)
        assert abs(got - exact) / exact < 0.02, (q, got, exact)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**60, 300_000, dtype=np.int64)
    true = len(np.unique(vals))
    h = HyperLogLog()
    for chunk in np.array_split(vals, 23):
        h2 = HyperLogLog()
        h2.update(chunk)
        h.merge(h2)
    assert abs(h.estimate() - true) / true < 0.03
    # serialization round-trip
    h3 = HyperLogLog.from_dict(h.to_dict())
    assert h3.estimate() == h.estimate()


def test_sketch_serialization_roundtrip():
    x = np.array([1.0, 2.0, 2.0, 10.0])
    vc = ValueCounts()
    vc.update(x)
    vc2 = ValueCounts.from_dict(vc.to_dict())
    assert vc2.counts == vc.counts
    td = TDigest()
    td.update(x)
    td2 = TDigest.from_dict(td.to_dict())
    assert td2.quantile(0.5) == td.quantile(0.5)
    ms = MomentSketch()
    ms.update(x)
    assert MomentSketch.from_dict(ms.to_dict()).mean == ms.mean


def test_columnsketch_exact_to_approx_handoff():
    """When ValueCounts overflows, t-digest/HLL are seeded from the
    drained exact counts — quantiles/distinct stay accurate."""
    import pyarrow as pa
    from autoprepad_ray.profile import ColumnSketch

    rng = np.random.default_rng(11)
    x = rng.normal(100, 15, 60_000)
    cs = ColumnSketch(name="x", kind="numeric")
    cs.values.max_items = 1000
    for chunk in np.array_split(x, 13):
        cs.update_array(pa.array(chunk))
    assert not cs.exact_quantiles
    for q in (0.25, 0.5, 0.75):
        exact = np.quantile(x, q)
        assert abs(cs.quantile(q) - exact) / abs(exact) < 0.01
    true_distinct = len(np.unique(x))
    assert abs(cs.distinct() - true_distinct) / true_distinct < 0.05
    # merge of exact + approx sides also lands close
    cs2 = ColumnSketch(name="x", kind="numeric")
    cs2.values.max_items = 1000
    y = rng.normal(100, 15, 500)
    cs2.update_array(pa.array(y))
    assert cs2.exact_quantiles
    cs.merge(cs2)
    both = np.concatenate([x, y])
    assert abs(cs.quantile(0.5) - np.quantile(both, 0.5)) < 1.0


@given(st.lists(st.floats(-1e5, 1e5), min_size=6, max_size=400),
       st.integers(2, 5))
@settings(max_examples=40, deadline=None)
def test_columnsketch_merge_associativity(xs, nsplits):
    """SURVEY §5: finalize(merge(split(X))) == finalize(X) for the full
    column sketch (moments exact, quantiles exact under the ValueCounts
    bound, distinct exact)."""
    import pyarrow as pa
    from autoprepad_ray.profile import ColumnSketch

    x = np.array(xs)
    whole = ColumnSketch(name="x", kind="numeric")
    whole.update_array(pa.array(x))
    merged = ColumnSketch(name="x", kind="numeric")
    for part in np.array_split(x, nsplits):
        cs = ColumnSketch(name="x", kind="numeric")
        cs.update_array(pa.array(part))
        merged.merge(cs)
    assert merged.count == whole.count
    assert np.isclose(merged.moments.mean, whole.moments.mean,
                      rtol=1e-9, atol=1e-12, equal_nan=True)
    assert np.isclose(merged.moments.std, whole.moments.std,
                      rtol=1e-6, atol=1e-9)
    assert merged.distinct() == whole.distinct()
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        a, b = merged.quantile(q), whole.quantile(q)
        assert (np.isnan(a) and np.isnan(b)) or np.isclose(
            a, b, rtol=1e-12, atol=1e-12)


def test_ks_empty_side_no_crash():
    """ks_from_valuecounts on an empty side: 0 when both empty, else the
    full CDF gap (regression: np.where indexed an empty array with -1)."""
    from autoprepad_ray.validators.drift import ks_from_valuecounts

    a = ValueCounts()
    a.update(np.array([1.0, 2.0, 3.0]))
    b = ValueCounts()
    assert ks_from_valuecounts(a, b) == 1.0
    assert ks_from_valuecounts(b, a) == 1.0
    assert ks_from_valuecounts(ValueCounts(), ValueCounts()) == 0.0
