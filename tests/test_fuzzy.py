"""Edit-distance kernel + blocked pairing: SIMD class DP vs the plain
Python DP, unicode fallback, blocking completeness, the pair cap."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from autoprepad_ray.stages.fuzzy import (_levenshtein_py,
                                         blocked_editdist_pairs,
                                         levenshtein_batch)

words = st.text(alphabet="abcde", min_size=0, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(words, words), min_size=1, max_size=20))
def test_batch_matches_python_dp(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_batch(a, b)
    want = [_levenshtein_py(x, y) for x, y in pairs]
    assert got.tolist() == want


def test_unicode_fallback():
    got = levenshtein_batch(["café", "naïve"],
                            ["cafe", "naive"])
    assert got.tolist() == [1, 1]


def test_blocked_pairs_complete_and_ordered(ray_session):
    names = ["hot gear", "big gear", "red gear", "small ring",
             "red ring", "lone widget", "hot gear"]
    ds = rd.from_arrow(pa.table({"p_name": names})).repartition(3)
    t = blocked_editdist_pairs(ds, "p_name", max_dist=3).to_pandas()
    got = set(map(tuple, t[["name_a", "name_b", "dist"]].values))
    assert ("big gear", "hot gear", 3) in got
    assert ("big gear", "red gear", 3) in got
    assert ("hot gear", "red gear", 3) in got
    assert all(a < b for a, b, _ in got)
    assert not any("widget" in a for a, _, _ in got)
    assert not any("ring" in a and "gear" in b for a, b, _ in got)


def test_block_pair_cap_raises(ray_session):
    names = [f"v{i} same" for i in range(40)]
    ds = rd.from_arrow(pa.table({"p_name": names}))
    with pytest.raises(ray.exceptions.RayTaskError):
        blocked_editdist_pairs(ds, "p_name", block_pair_cap=10)



def test_null_names_dropped(ray_session):
    # SQL oracle semantics: NULL never blocks or pairs
    t = pa.table({"p_name": pa.array(["hot gear", None, "big gear"],
                                     pa.string())})
    ds = rd.from_arrow(t).repartition(2)
    out = blocked_editdist_pairs(ds, "p_name", max_dist=3).to_pandas()
    pairs = set(map(tuple, out[["name_a", "name_b"]].values))
    assert ("big gear", "hot gear") in pairs
    assert not any(a is None or b is None or a == "" or b == ""
                   for a, b in pairs)
