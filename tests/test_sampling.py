"""Deterministic split / sampling (functions/sampling.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from autoprepad_ray.functions.sampling import (assign_splits,
                                               sample_fraction, split_code)


def test_split_code_deterministic_and_overflow_safe():
    ids = np.array([0, 1, 10**18, -(10**18), 999983], dtype=np.int64)
    a = split_code(ids)
    b = split_code(ids.copy())
    assert np.array_equal(a, b)
    assert ((a >= 0) & (a < 1000)).all()
    assert not np.array_equal(split_code(ids, salt=1), a)


def test_split_fractions_roughly_uniform():
    ids = np.arange(100_000, dtype=np.int64)
    code = split_code(ids)
    frac = (code < 800).mean()
    assert abs(frac - 0.8) < 0.02


def test_assign_splits_partition_independent(ray_session):
    ids = np.arange(5000, dtype=np.int64)
    t = pa.table({"id": ids})
    one = assign_splits(rd.from_arrow(t), "id",
                        splits={"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    many = assign_splits(rd.from_arrow(t).repartition(32), "id",
                         splits={"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert one.equals(many)
    assert set(one["split"]) == {"train", "val", "test"}


def test_assign_splits_rejects_bad_fractions(ray_session):
    with pytest.raises(ValueError):
        assign_splits(rd.range(10), "id", splits={"a": 0.5, "b": 0.1})


def test_sample_fraction_is_prefix_of_split(ray_session):
    """sample_fraction(f) keeps exactly the rows whose code < f*buckets
    — the same prefix rule assign_splits uses, so a 10% sample is a
    subset of a 20% sample (nested samples, no reshuffling)."""
    ids = np.arange(20_000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids}))
    s10 = set(sample_fraction(ds, "id", 0.10).to_pandas()["id"])
    s20 = set(sample_fraction(ds, "id", 0.20).to_pandas()["id"])
    assert s10 <= s20
    assert abs(len(s20) / 20_000 - 0.20) < 0.02
    expected = set(ids[split_code(ids) < 200].tolist())
    assert s20 == expected


def test_stratified_sample_per_group_rates(ray_session):
    """Each group is sampled at ITS rate with the same prefix rule —
    rare groups survive in full, common ones thin out, and the kept
    set is exactly reproducible from the hash rule."""
    from autoprepad_ray.functions.sampling import stratified_sample

    n = 30_000
    ids = np.arange(n, dtype=np.int64)
    grp = np.where(ids % 100 < 90, "common", "rare")
    ds = rd.from_arrow(pa.table({"id": ids, "g": grp})).repartition(8)
    out = stratified_sample(ds, "id", "g", rates={"common": 0.10}) \
        .to_pandas()
    got = set(out["id"])
    cut = np.where(grp == "common", 100, 1000)
    expected = set(ids[split_code(ids) < cut].tolist())
    assert got == expected
    rare_ids = set(ids[grp == "rare"].tolist())
    assert rare_ids <= got            # default_rate=1.0 keeps all rare
    common_kept = len(got - rare_ids) / (0.9 * n)
    assert abs(common_kept - 0.10) < 0.02


def test_quota_sample_exact_k_and_layout_independent(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from autoprepad_ray.functions.sampling import quota_sample, split_code

    n = 300
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "grp": np.repeat(list("abc"), n // 3)})
    df.loc[df["id"] >= 295, "grp"] = "tiny"   # group smaller than k

    exp = df.assign(__h=split_code(df["id"].to_numpy(), buckets=1_048_576))
    exp = (exp.sort_values(["__h", "id"]).groupby("grp", sort=False)
           .head(7).drop(columns="__h"))

    for parts in (1, 5):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        got = (quota_sample(ds, "id", "grp", 7).to_pandas()
               .sort_values("id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got, exp.sort_values("id").reset_index(drop=True))
    sizes = got.groupby("grp").size()
    assert sizes["a"] == sizes["b"] == sizes["c"] == 7
    assert sizes["tiny"] == 5          # min(k, group size)
