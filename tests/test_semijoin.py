"""semi_join stage: EXISTS/anti filter semantics, string keys, empty
right side, and the broadcast-size bail-out."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df, parts=2):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(parts)


def test_semi_and_anti_int_keys(ray_session):
    from autoprepad_ray.stages.join import semi_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": list("abcde")})
    right = pd.DataFrame({"rk": [2, 2, 4, 9]})  # dup keys collapse
    semi = semi_join(_ds(left), _ds(right), "k",
                     right_on="rk").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = semi_join(_ds(left), _ds(right), "k", right_on="rk",
                     anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5]
    # semi + anti partition the left table
    assert len(semi) + len(anti) == len(left)


def test_semi_string_keys_and_empty_right(ray_session):
    from autoprepad_ray.stages.join import semi_join

    left = pd.DataFrame({"k": ["x", "y", "z"], "v": [1, 2, 3]})
    match = semi_join(_ds(left), _ds(pd.DataFrame({"k": ["y", "y"]})),
                      "k").to_pandas()
    assert list(match["k"]) == ["y"]
    # empty right side: semi keeps nothing, anti keeps everything
    empty = _ds(pd.DataFrame({"k": pd.Series([], dtype=object)}), 1)
    assert semi_join(_ds(left), empty, "k").to_pandas().empty
    assert len(semi_join(_ds(left), empty, "k",
                         anti=True).to_pandas()) == 3


def test_semi_broadcast_bound_raises(ray_session):
    from autoprepad_ray.stages.join import semi_join

    left = pd.DataFrame({"k": [1]})
    right = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    with pytest.raises(ValueError, match="broadcast bound"):
        semi_join(_ds(left), _ds(right), "k",
                  max_broadcast_keys=10).to_pandas()
