"""grouped_quantiles_cont: exact rational interpolation vs a
Fraction-based reference, singleton groups, q=0/100 endpoints,
partition invariance."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdfa_ray.stages.quantile import grouped_quantiles_cont


def _reference(values, k):
    v = sorted(values)
    n = len(v)
    pos = Fraction(k * (n - 1), 100)
    lo = int(pos)  # floor for non-negative
    rem = pos - lo
    hi = min(lo + 1, n - 1)
    micro = Fraction(v[lo]) * 1_000_000 + (v[hi] - v[lo]) * rem * 1_000_000
    assert micro.denominator == 1
    return int(micro)


def _run(groups, qs, parallelism=1):
    df = pd.DataFrame(groups, columns=["g", "val"])
    ds = rd.from_pandas(df)
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    out = grouped_quantiles_cont(ds, "g", "val", qs).to_pandas()
    return out.set_index("g").sort_index()


def test_vs_fraction_reference(ray_session):
    rng = np.random.default_rng(3)
    rows = [("g%d" % (i % 4), int(rng.integers(-500, 5000))) for i in range(403)]
    out = _run(rows, [0, 25, 50, 90, 99, 100])
    byg = {}
    for g, v in rows:
        byg.setdefault(g, []).append(v)
    for g, vals in byg.items():
        for k in (0, 25, 50, 90, 99, 100):
            assert out.loc[g, "q%d_micro" % k] == _reference(vals, k), (g, k)


def test_singleton_group(ray_session):
    out = _run([("solo", 42)], [50, 99])
    assert out.loc["solo", "q50_micro"] == 42_000_000
    assert out.loc["solo", "q99_micro"] == 42_000_000


def test_midpoint_is_exact_half(ray_session):
    # two values 0 and 1: median = 0.5 exactly -> 500_000 micro
    out = _run([("g", 0), ("g", 1)], [50])
    assert out.loc["g", "q50_micro"] == 500_000


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(9)
    rows = [("g%d" % (i % 3), int(rng.integers(0, 100))) for i in range(250)]
    a = _run(rows, [50, 90], parallelism=1)
    b = _run(rows, [50, 90], parallelism=8)
    pd.testing.assert_frame_equal(a, b)


def test_hist_rows_guard_refuses_continuous_domains(ray_session):
    # VERDICT r3 item 2: the exact path's (group, value) histogram is
    # distinct-pair sized — above the ceiling it must refuse with a
    # pointer to the sketch, not silently grow
    import pytest

    from rdfa_ray.stages.quantile import grouped_quantiles

    df = pd.DataFrame({"g": ["a"] * 100, "v": np.arange(100, dtype="int64")})
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError, match="quantile_sketch"):
        grouped_quantiles(ds, "g", "v", [0.5], max_hist_rows=10).to_pandas()
    with pytest.raises(ValueError, match="quantile_sketch"):
        grouped_quantiles_cont(ds, "g", "v", [50], max_hist_rows=10).to_pandas()
    # under the ceiling: unchanged result
    out = grouped_quantiles(ds, "g", "v", [0.5], max_hist_rows=1000).to_pandas()
    assert int(out["q50"].iloc[0]) == 49
