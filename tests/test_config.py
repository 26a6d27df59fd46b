"""Declarative config facade (SURVEY §2.10; reference control.py:89-107
constructor surface): one dict drives profile -> evidence -> score/label
-> uniqueness -> verdicts -> registry passthrough."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from autoprepad_ray.config import run_config
from autoprepad_ray.fixtures import generate_fmixed


@pytest.fixture(scope="module")
def fmixed_ds():
    table, exp = generate_fmixed(2000, seed=42)
    ds = rd.from_arrow(table).repartition(4).map_batches(
        lambda t: t.append_column(
            "pid", pc.cast(pc.bit_wise_and(t["row_id"], 3), pa.int64())),
        batch_format="pyarrow")
    return ds, exp


CFG = {
    "exclude_columns": ["y_true"],
    "numeric_columns": ["locationId"],
    "nominal_columns": ["platform", "availability"],
    "pattern_columns": ["evseid", "uuid"],
    "datetime_columns": ["timestamp"],
    "unique_keys": ["row_id"],
    "partition_column": "pid",
    "thresholds": {"domain_min_frac": 0.02},
    "validators": [
        {"name": "constant_columns",
         "kwargs": {"columns": ["platform", "locationId"]}},
    ],
}


def test_config_drives_all_declared_checks(fmixed_ds):
    ds, exp = fmixed_ds
    res = run_config(ds, CFG)
    df = res.enriched.to_pandas().set_index("row_id")
    # excluded column really dropped
    assert "y_true" not in df.columns
    # every injected recipe is caught by its declared check
    for i in exp["misspelled"]:
        assert df.loc[i, "availability_DOMAIN"] == 1, i
    for i in exp["rare_platform"]:
        assert df.loc[i, "platform_DOMAIN"] == 1, i
    for i in exp["bad_uuid"]:
        assert df.loc[i, "uuid_SHAPE"] == 1, i
    for i in exp["wrong_year"]:
        assert df.loc[i, "timestamp_epoch_TUKEY"] == 1, i
    for i in exp["sentinel_loc"]:
        assert df.loc[i, "locationId_TUKEY"] == 1, i
    # OR-merge total and score/label attached
    anomalies = sorted(set().union(*exp.values()))
    assert (df.loc[anomalies, "n_evidence"] > 0).all()
    assert {"AnomalyScore", "AnomalyLabel"} <= set(df.columns)
    assert df["AnomalyScore"].between(0, 1).all()
    # fitted state is exposed (the reference's fitted attributes)
    assert "locationId" in res.states
    assert "platform" in res.domains and "uuid" in res.shape_domains
    # uniqueness: row_id is unique -> empty listing, correct shape
    dup = res.duplicates.to_pandas() if hasattr(res.duplicates,
                                                "to_pandas") \
        else res.duplicates
    assert len(dup) == 0
    # per-partition verdicts cover the 4 declared partitions
    v = res.verdicts.to_pandas() if hasattr(res.verdicts, "to_pandas") \
        else res.verdicts
    assert sorted(v["pid" if "pid" in v.columns else v.columns[0]]
                  .astype(int)) == [0, 1, 2, 3]
    # registry passthrough ran
    assert "constant_columns" in res.extras


def test_config_ordinal_codes_and_domain():
    t = pa.table({
        "k": pa.array(list(range(12)), type=pa.int64()),
        "prio": pa.array(["LOW", "MED", "HIGH", "LOW", "MED", "HIGH",
                          "LOW", "MED", "HIGH", "LOW", "MED", "zzz"])})
    res = run_config(rd.from_arrow(t).repartition(2),
                     {"ordinal_columns": ["prio"],
                      "thresholds": {"domain_min_frac": 0.1}})
    df = res.enriched.to_pandas().sort_values("k")
    # sorted-order 0-based codes (encoders.ordinal_map), unknown/rare -> code
    # still assigned from the profile map (zzz IS in the profile) but its
    # rarity flags the domain check
    assert res.ordinal_maps["prio"] == {"HIGH": 0, "LOW": 1, "MED": 2,
                                        "zzz": 3}
    assert df["prio_CODE"].tolist() == [1, 2, 0] * 3 + [1, 2, 3]
    assert df["prio_DOMAIN"].tolist() == [0] * 11 + [1]


def test_config_unknown_keys_raise():
    ds = rd.from_arrow(pa.table({"a": pa.array([1, 2, 3])}))
    with pytest.raises(KeyError, match="unknown config keys"):
        run_config(ds, {"numeric_cols": ["a"]})
    with pytest.raises(KeyError, match="unknown thresholds"):
        run_config(ds, {"numeric_columns": ["a"],
                        "thresholds": {"tukey": 2.0}})


def test_config_native_timestamp_column():
    """datetime_columns accepts a NATIVE timestamp column (no strptime
    parse): epoch fences fire on an outlier year, UNPARSEABLE stays 0."""
    n = 40
    ts = ([np.datetime64("2024-01-01T00:00:00", "us")
           + np.timedelta64(i * 3600, "s") for i in range(n - 1)]
          + [np.datetime64("1970-01-05T00:00:00", "us")])
    t = pa.table({"k": pa.array(list(range(n)), type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us"))})
    res = run_config(rd.from_arrow(t).repartition(2),
                     {"datetime_columns": ["ts"]})
    df = res.enriched.to_pandas().set_index("k")
    assert (df["ts_UNPARSEABLE"] == 0).all()
    assert df.loc[n - 1, "ts_epoch_TUKEY"] == 1       # 1970 outlier
    assert df.loc[: n - 2, "ts_epoch_TUKEY"].sum() == 0
    assert df.loc[n - 1, "n_evidence"] >= 1
