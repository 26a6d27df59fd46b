"""NTILE bucketing vs the DuckDB window oracle on multi-block layouts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from autoprepad_ray.stages.rank import ntile


def _oracle(df: pd.DataFrame, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        f"SELECT id, CAST(NTILE({k}) OVER (ORDER BY v, id) AS BIGINT)"
        f" AS bucket FROM t ORDER BY id").df()


@pytest.mark.parametrize("n,k,blocks", [
    (100, 8, 5),     # k does not divide n (100 = 8*12 + 4)
    (96, 8, 3),      # exact division
    (5, 8, 2),       # n < k: buckets 1..n, one row each
    (1, 4, 1),
    (50, 7, 9),
])
def test_ntile_matches_duckdb(n, k, blocks):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "v": rng.integers(0, max(n // 3, 2), n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    got = (ntile(ds, ["v", "id"], k, keep_cols=["id"]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = _oracle(df, k)
    pd.testing.assert_frame_equal(
        got.rename(columns={"id": "id"}), exp, check_dtype=False)


def test_ntile_empty():
    ds = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())}))
    out = ntile(ds, ["v", "id"], 4, keep_cols=["id"])
    assert out.count() == 0
    assert out.schema().names == ["id", "bucket"]


def test_ntile_bucket_sizes_balanced():
    n, k = 103, 10                      # 3 buckets of 11, 7 of 10
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "v": np.zeros(n, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = ntile(ds, ["v", "id"], k, keep_cols=["id"]).to_pandas()
    sizes = got["bucket"].value_counts().sort_index()
    assert list(sizes) == [11, 11, 11] + [10] * 7


from autoprepad_ray.stages.rank import dense_rank


def _drank_oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        "SELECT id, DENSE_RANK() OVER (PARTITION BY p ORDER BY v DESC)"
        " AS drank FROM t ORDER BY id").df()


@pytest.mark.parametrize("n,vals,parts,blocks", [
    (200, 5, 3, 7),     # heavy ties: many runs span block boundaries
    (200, 200, 3, 7),   # near-unique values
    (50, 1, 2, 9),      # ONE value per partition: a single run spans
                        # every block of the partition
    (1, 1, 1, 1),
    (64, 4, 1, 4),      # single partition
])
def test_dense_rank_matches_duckdb(n, vals, parts, blocks):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "p": rng.integers(0, parts, n).astype(str),
        "v": rng.integers(0, vals, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    got = (dense_rank(ds, ["p", "v"], partition_col="p",
                      keep_cols=["id"], descending=[False, True])
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = _drank_oracle(df)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dense_rank_empty():
    ds = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                 "p": pa.array([], pa.string()),
                                 "v": pa.array([], pa.int64())}))
    out = dense_rank(ds, ["p", "v"], partition_col="p", keep_cols=["id"])
    assert out.count() == 0
    assert out.schema().names == ["id", "drank"]


def test_shard_layout_matches_duckdb_multiblock():
    """shard_layout_docs' integer shard/pos formulas vs the NTILE +
    window oracle on a forced multi-block layout (n % k != 0)."""
    from autoprepad_ray.pipelines.queries import REGISTRY
    import tempfile, os
    n = 103
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    with tempfile.TemporaryDirectory() as d:
        pa.parquet.write_table(
            pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"),
            row_group_size=9)            # many tiny blocks
        got = REGISTRY["shard_layout_docs"].fn(d).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{os.path.join(d, 'documents.parquet')}')")
        exp = con.execute(REGISTRY["shard_layout_docs"].sql).df() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
