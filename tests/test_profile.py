"""profile_table (stages/profile.py): exact fields vs pandas truth,
sketch accuracy bounds, null/all-null handling, partition invariance
of the exact fields."""

import numpy as np
import pandas as pd
import ray.data as rd

from rdfa_ray.stages.profile import profile_table


def _frame():
    rng = np.random.default_rng(5)
    n = 3000
    return pd.DataFrame(
        {
            "i": rng.integers(-1000, 1000, n),
            "f": np.round(rng.normal(50, 10, n), 3),
            "s": ["cat-%d" % (x % 37) for x in rng.integers(0, 37 * 4, n)],
            "with_nulls": [None if k % 5 == 0 else float(k) for k in range(n)],
            "all_null": [None] * n,
            "skewed": ["whale" if k % 3 else "minnow-%d" % k for k in range(n)],
        }
    )


def test_exact_fields(ray_session):
    df = _frame()
    prof = profile_table(rd.from_pandas(df).repartition(8), list(df.columns)).set_index("column")
    for c in df.columns:
        assert prof.loc[c, "n"] == len(df)
        assert prof.loc[c, "nulls"] == df[c].isna().sum()
    assert prof.loc["i", "min_value"] == str(int(df["i"].min()))
    assert prof.loc["i", "max_value"] == str(int(df["i"].max()))
    assert prof.loc["s", "min_value"] == df["s"].min()
    assert prof.loc["s", "max_value"] == df["s"].max()
    assert float(prof.loc["f", "min_value"]) == df["f"].min()
    assert prof.loc["all_null", "min_value"] is None
    assert prof.loc["all_null", "max_value"] is None


def test_sketch_bounds(ray_session):
    df = _frame()
    prof = profile_table(rd.from_pandas(df).repartition(8), list(df.columns)).set_index("column")
    # HLL: ~1.6% std error at p=12; allow 10%
    true_s = df["s"].nunique()
    assert abs(prof.loc["s", "n_distinct_approx"] - true_s) <= max(3, 0.1 * true_s)
    true_i = df["i"].nunique()
    assert abs(prof.loc["i", "n_distinct_approx"] - true_i) <= 0.1 * true_i
    # MG on the planted whale: never overestimates, finds the whale
    whale_true = (df["skewed"] == "whale").sum()
    assert prof.loc["skewed", "top_value"] == "whale"
    assert prof.loc["skewed", "top_count_floor"] <= whale_true
    assert prof.loc["skewed", "top_count_floor"] >= whale_true - len(df) // 17


def test_partition_invariance_exact(ray_session):
    df = _frame()
    cols = ["column", "n", "nulls", "min_value", "max_value"]
    a = profile_table(rd.from_pandas(df), list(df.columns))[cols]
    b = profile_table(rd.from_pandas(df).repartition(11), list(df.columns))[cols]
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_int64_extremes_beyond_2_53_exact_with_nulls(ray_session):
    # ADVICE r3: nullable int partials used to round-trip as float64
    # across the combine level, rounding |v| > 2^53 extremes
    lo = -(2**63) + 3
    hi = 2**63 - 5
    df = pd.DataFrame(
        {"v": pd.array([lo, None, 7, hi, None, 11] * 10, dtype="Int64")}
    )
    prof = profile_table(rd.from_pandas(df).repartition(6), ["v"]).set_index("column")
    assert prof.loc["v", "min_value"] == str(lo)
    assert prof.loc["v", "max_value"] == str(hi)
    assert prof.loc["v", "nulls"] == 20
