"""JSON field extraction (stages/jsonx.py): null-safe semantics on
malformed/missing/JSON-null payloads, TRY_CAST typing, fallback-path
parity, and partition invariance."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages import jsonx
from rdfa_ray.stages.jsonx import json_field

DOCS = [
    '{"k": 87}',
    '{"k": 0}',
    '{"k": -5, "other": 1}',
    '{"k": null}',
    '{"other": 3}',
    "{bad json",
    "",
    None,
    '{"k": "abc"}',           # non-numeric where int expected -> null
    '{"k": "12"}',            # numeric string -> coerces
]
WANT_INT = [87, 0, -5, None, None, None, None, None, None, 12]
WANT_STR = ["87", "0", "-5", None, None, None, None, None, "abc", "12"]


def _run(dtype, parallelism=1):
    ds = rd.from_pandas(pd.DataFrame({"doc": DOCS, "rid": range(len(DOCS))}))
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    out = json_field(ds, "doc", "k", out="k", dtype=dtype).to_pandas()
    out = out.sort_values("rid")
    return [None if pd.isna(v) else (int(v) if dtype is not None else str(v)) for v in out["k"]]


def test_int_extraction(ray_session):
    assert _run(pa.int64()) == WANT_INT


def test_string_extraction(ray_session):
    assert _run(None) == WANT_STR


def test_partition_invariance(ray_session):
    assert _run(pa.int64(), parallelism=5) == WANT_INT


def test_stdlib_fallback_parity(ray_session, monkeypatch):
    # the no-polars fallback must match the vectorized path bit-for-bit
    monkeypatch.setattr(jsonx, "_pl", None)
    assert _run(pa.int64()) == WANT_INT
    assert _run(None) == WANT_STR
