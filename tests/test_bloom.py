"""Bloom-filter stage: no false negatives ever, FP rate near the
designed bound, dtype-insensitive hashing, multi-block builds."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from autoprepad_ray.stages.bloom import (build_bloom,
                                         build_bloom_with_keys,
                                         probe_bloom)


def _ds(keys, parts=4):
    return rd.from_arrow(pa.table({"k": keys})).repartition(parts)


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=3000, replace=False)
    bloom = build_bloom(_ds(members), "k", m_bits=12 * len(members))
    assert probe_bloom(members, bloom).all()

    outside = np.setdiff1d(rng.choice(10_000_000, size=20000), members)
    fp = probe_bloom(outside, bloom).mean()
    assert fp < 0.05          # k=7 @ 12 bits/key designs to ~1%


def test_fused_build_matches_and_keys_exact():
    keys = np.array([5, 1, 5, 9, 1, 3], dtype=np.int64)
    bloom, uniq = build_bloom_with_keys(_ds(keys, parts=3), "k",
                                        m_bits=1 << 12)
    assert uniq.tolist() == [1, 3, 5, 9]
    solo = build_bloom(_ds(keys, parts=3), "k", m_bits=1 << 12)
    assert np.array_equal(bloom["bits"], solo["bits"])
    assert probe_bloom(keys, bloom).all()


def test_int32_probe_matches_int64_build():
    members = np.arange(100, dtype=np.int64) * 7
    bloom = build_bloom(_ds(members), "k", m_bits=1 << 14)
    assert probe_bloom(members.astype(np.int32), bloom).all()


def test_empty_build_probe():
    bloom, uniq = build_bloom_with_keys(
        _ds(np.empty(0, dtype=np.int64), parts=1), "k", m_bits=1 << 10)
    assert len(uniq) == 0
    assert not probe_bloom(np.array([1, 2, 3]), bloom).any()
    assert probe_bloom(np.empty(0, dtype=np.int64), bloom).shape == (0,)


def test_nullable_int_column_no_false_negatives():
    # a nullable int column must not silently hash as float64
    keys = pa.array([1, None, 3, 5, None, 7], type=pa.int64())
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(2)
    bloom, uniq = build_bloom_with_keys(ds, "k", m_bits=1 << 12)
    assert uniq.tolist() == [1, 3, 5, 7]
    assert probe_bloom(np.array([1, 3, 5, 7], dtype=np.int64),
                       bloom).all()
    # Arrow probe: nulls report non-member, alignment preserved
    got = probe_bloom(pa.array([None, 1, 99999, 7], type=pa.int64()),
                      bloom)
    assert got[0] == False and got[1] and got[3]  # noqa: E712
