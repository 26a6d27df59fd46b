"""top_k stage: agreement with a full sort, block-layout invariance,
tie determinism, and small/empty inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df, parts):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(parts)


def test_topk_matches_full_sort_any_layout(ray_session):
    from autoprepad_ray.stages.topk import top_k

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "score": rng.integers(0, 50, n),       # heavy ties
        "v": np.round(rng.normal(size=n), 3),
        "id": np.arange(n, dtype=np.int64)})
    want = (df.sort_values(["score", "v", "id"],
                           ascending=[False, False, True])
            .head(25).reset_index(drop=True))
    for parts in (1, 3, 16):
        got = top_k(_ds(df, parts), ["score", "v", "id"],
                    descending=[True, True, False], k=25)
        pd.testing.assert_frame_equal(
            got[["score", "v", "id"]].reset_index(drop=True), want)


def test_topk_small_and_empty(ray_session):
    from autoprepad_ray.stages.topk import top_k

    df = pd.DataFrame({"x": [3, 1, 2], "id": [0, 1, 2]})
    got = top_k(_ds(df, 2), ["x", "id"], descending=[True, False], k=10)
    assert list(got["x"]) == [3, 2, 1]          # k > n returns all, sorted
    empty = pd.DataFrame({"x": pd.Series([], dtype=np.int64),
                          "id": pd.Series([], dtype=np.int64)})
    assert top_k(_ds(empty, 1), ["x", "id"],
                 descending=[True, False], k=5).empty
