"""Declarative per-column validation config — the one-call entry that
mirrors the reference's constructor surface
(``AutoPrepAD(datetime_columns=…, nominal_columns=…, ordinal_columns=…,
exclude_columns=…, mark_anomalies_pct_data=…)``, control.py:89-107)
re-expressed over the validator registry (SURVEY §2.10).

``run_config(ds, config)`` takes a plain dict (YAML-shaped: every value
a scalar, list or dict) and assembles the full profile -> validate
lifecycle from it:

.. code-block:: python

    {
      "exclude_columns": ["internal_note"],          # M5 drop
      "numeric_columns": ["value"],                  # F1-F8 evidence
      "nominal_columns": ["event_type"],             # F11: domain flags
      "ordinal_columns": ["priority"],               # F12: domain + codes
      "datetime_columns": ["ts"],                    # M7/M8: parse + fences
      "pattern_columns": ["uuid"],                   # M9 as format profile
      "unique_keys": ["event_id"],                   # §2.7 uniqueness
      "partition_column": "pid",                     # per-partition verdicts
      "thresholds": {"tukey_factor": 1.5, "mad_threshold": 3.5,
                     "mark_anomalies_pct_data": 0.10,
                     "domain_min_frac": 0.02, "budget": 0.05},
      "validators": [                                # raw registry passthrough
        {"name": "constant_columns", "kwargs": {"columns": ["value"]}},
      ],
    }

Execution shape: ONE profile pass over every declared column feeds all
fitted state (fences, domains, shape profiles, ordinal maps — the
reference's per-transformer fit attributes, TukeyTransformer.py:37-42);
the validate pass is one stateless ``map_batches`` chain appending
evidence columns plus ``n_evidence`` (the OR-merge total,
experiment.py:441-445) and ``AnomalyScore``/``AnomalyLabel``
(runs.py:199-222).  Uniqueness, verdicts and passthrough validators are
separate keyed/aggregate jobs over the same input.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .functions.encoders import ordinal_encode_array, ordinal_map
from .functions.strings import canonicalize_nan_tokens
from .profile import TableProfile, profile_dataset
from .validators import registry, row_checks as rc
from .validators.domain import (domain_flags, format_signature,
                                learned_domain, shape_domain_flags)

_DEFAULT_THRESHOLDS = {
    "tukey_factor": 1.5,          # TukeyTransformer.py:33
    "mad_threshold": 3.5,         # MedianAbsolutDeviation.py:36
    "mark_anomalies_pct_data": 0.10,   # control.py:98
    "domain_min_frac": 0.02,
    "budget": 0.05,
}


@dataclass
class ConfigResult:
    enriched: Any                      # Dataset: evidence + score/label
    profile: TableProfile
    states: dict                       # fitted fence states (numeric)
    domains: dict                      # fitted category domains
    shape_domains: dict                # fitted format profiles
    ordinal_maps: dict                 # fitted category -> code maps
    duplicates: Any | None             # uniqueness listing (arrow table)
    verdicts: Any | None               # per-partition verdict dataset
    extras: dict = field(default_factory=dict)   # named validator outputs


def _canon_and_parse(ds, str_cols: list[str], dt_cols: list[str],
                     dt_format: str):
    """NaN-token canonicalization (M1) on declared string columns +
    datetime normalization: string datetimes parse with ``dt_format``
    (unparseable -> flag column), native timestamps cast — either way a
    ``{col}_epoch`` int64 column feeds the numeric fence checks."""

    def fn(t: pa.Table) -> pa.Table:
        for c in str_cols:
            t = t.set_column(t.column_names.index(c), c,
                             canonicalize_nan_tokens(t[c]))
        for c in dt_cols:
            col = t[c]
            if pa.types.is_timestamp(col.type):
                epoch = pc.cast(pc.cast(col, pa.timestamp("us")),
                                pa.int64())
                unparse = pa.array(np.zeros(t.num_rows, dtype=np.int8))
            else:
                parsed = pc.strptime(col, format=dt_format, unit="s",
                                     error_is_null=True)
                epoch = pc.cast(parsed, pa.int64())
                unparse = pc.cast(
                    pc.and_(pc.is_null(parsed), pc.is_valid(col)),
                    pa.int8())
            t = t.append_column(f"{c}_epoch", epoch)
            t = t.append_column(f"{c}_UNPARSEABLE", unparse)
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def run_config(ds, config: dict, *,
               dt_format: str = "%Y-%m-%d %H:%M:%S") -> ConfigResult:
    """Assemble and run the declared validation over ``ds``.

    See the module docstring for the config shape.  Unknown keys raise
    (a misspelled declaration silently validating nothing is the worst
    failure mode a config surface can have)."""
    known = {"exclude_columns", "numeric_columns", "nominal_columns",
             "ordinal_columns", "datetime_columns", "pattern_columns",
             "unique_keys", "partition_column", "thresholds",
             "validators"}
    unknown = set(config) - known
    if unknown:
        raise KeyError(f"unknown config keys {sorted(unknown)}; "
                       f"known: {sorted(known)}")
    thr = {**_DEFAULT_THRESHOLDS, **config.get("thresholds", {})}
    unknown_thr = set(thr) - set(_DEFAULT_THRESHOLDS)
    if unknown_thr:
        raise KeyError(f"unknown thresholds {sorted(unknown_thr)}; "
                       f"known: {sorted(_DEFAULT_THRESHOLDS)}")
    numeric = list(config.get("numeric_columns", ()))
    nominal = list(config.get("nominal_columns", ()))
    ordinal = list(config.get("ordinal_columns", ()))
    dt_cols = list(config.get("datetime_columns", ()))
    pattern = list(config.get("pattern_columns", ()))
    exclude = list(config.get("exclude_columns", ()))

    if exclude:
        ds = ds.drop_columns(exclude)           # M5, runs.py:287-308
    prepped = _canon_and_parse(ds, nominal + ordinal + pattern, dt_cols,
                               dt_format)

    # ---- fit phase: ONE profile pass feeds every fitted state ----
    num_cols = numeric + [f"{c}_epoch" for c in dt_cols]
    prof_cols = num_cols + nominal + ordinal + pattern
    prof = profile_dataset(prepped, columns=prof_cols)
    states = rc.fence_states(prof, num_cols,
                             tukey_factor=thr["tukey_factor"])
    domains = {c: learned_domain(prof[c].values,
                                 min_frac=thr["domain_min_frac"],
                                 total=prof[c].count)
               for c in nominal + ordinal}
    ordinal_maps = {}
    for c in ordinal:
        vals, _ = prof[c].values.sorted_arrays()
        ordinal_maps[c] = ordinal_map(np.asarray(vals, dtype=object))
    shape_domains = {}
    for c in pattern:
        vals, cnts = prof[c].values.sorted_arrays()
        sh = format_signature(pd.Series(list(vals)))
        sc = pd.DataFrame({"s": sh, "n": cnts}).groupby("s")["n"].sum()
        total = int(cnts.sum())
        shape_domains[c] = frozenset(
            sc[sc / max(1, total) >= thr["domain_min_frac"]].index)

    # ---- validate phase: evidence columns + OR-merge total ----
    checked = rc.check_rows(prepped, states,
                            mad_threshold=thr["mad_threshold"])

    def check_declared(df: pd.DataFrame) -> pd.DataFrame:
        ev = np.zeros(len(df), dtype=np.int64)
        for c in nominal + ordinal:
            f = domain_flags(df[c], domains[c])
            df[f"{c}_DOMAIN"] = f
            ev += f
        for c in ordinal:
            df[f"{c}_CODE"] = ordinal_encode_array(
                df[c].to_numpy(), ordinal_maps[c])
        for c in pattern:
            f = shape_domain_flags(df[c], shape_domains[c])
            df[f"{c}_SHAPE"] = f
            ev += f
        for c in dt_cols:
            ev += df[f"{c}_UNPARSEABLE"].to_numpy(np.int64)
        ev += df[rc.TUKEY_TOTAL].to_numpy(np.int64)
        ev += df[rc.MAD_TOTAL].to_numpy(np.int64)
        df["n_evidence"] = ev
        return df

    flagged = checked.map_batches(check_declared, batch_format="pandas")
    # single-numeric-column configs fold the raw-score distribution off
    # the profile's exact value counts (CLAUDE.md r3 lesson) — skips the
    # score_threshold barrier execution entirely
    stats = rc.score_stats_from_profile(
        prof, states, pct=thr["mark_anomalies_pct_data"],
        mad_threshold=thr["mad_threshold"])
    enriched = rc.attach_scores(
        flagged, pct=thr["mark_anomalies_pct_data"], stats=stats)

    duplicates = None
    if config.get("unique_keys"):
        duplicates = registry.run("duplicate_keys", ds,
                                  cols=list(config["unique_keys"]))
    verdicts = None
    if config.get("partition_column"):
        verdicts = rc.partition_verdicts(
            flagged, config["partition_column"], budget=thr["budget"])
    extras = {}
    for spec in config.get("validators", ()):
        extras[spec["name"]] = registry.run(
            spec["name"], ds, **spec.get("kwargs", {}))
    return ConfigResult(enriched=enriched, profile=prof, states=states,
                        domains=domains, shape_domains=shape_domains,
                        ordinal_maps=ordinal_maps, duplicates=duplicates,
                        verdicts=verdicts, extras=extras)
