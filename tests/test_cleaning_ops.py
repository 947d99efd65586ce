"""events_winsorized / events_hourly_dense semantics over a planted
parquet dir: clip bounds are the exact order-statistic p5/p95, gap
hours zero-fill, every (type, hour) cell appears exactly once."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cleaning")
    rng = np.random.default_rng(6)
    n = 500
    # ts: three hours with a one-hour gap (hour 0, hour 2, hour 3)
    hours = np.array([0, 2, 3])[rng.integers(0, 3, n)]
    base = 472_222 * 3600  # hour-aligned epoch
    ts = pd.to_datetime(base + hours * 3600 + rng.integers(0, 3600, n), unit="s")
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": rng.integers(0, 20, n),
            "event_type": np.where(rng.random(n) < 0.5, "click", "view"),
            "value": np.round(rng.normal(100, 30, n), 2),
            "props": ['{"k": 1}'] * n,
        }
    )
    df.to_parquet(d / "events.parquet")
    return str(d)


def test_winsorized(ray_session, sf_dir):
    from rdfa_ray.pipelines.relational import events_winsorized

    out = events_winsorized(sf_dir).to_pandas().set_index("event_type")
    df = pd.read_parquet("%s/events.parquet" % sf_dir)
    df["vm"] = np.floor(df["value"] * 1000 + 0.5).astype("int64")
    for g, sub in df.groupby("event_type"):
        v = np.sort(sub["vm"].to_numpy())
        n = len(v)
        lo = v[max(int(np.ceil(0.05 * n)), 1) - 1]
        hi = v[max(int(np.ceil(0.95 * n)), 1) - 1]
        assert out.loc[g, "n_events"] == n
        assert out.loc[g, "winsorized_milli"] == int(sub["vm"].clip(lo, hi).sum())


def test_hourly_dense(ray_session, sf_dir):
    from rdfa_ray.pipelines.relational import events_hourly_dense

    out = events_hourly_dense(sf_dir).to_pandas()
    hours = sorted(out["window_start"].unique())
    # 4 consecutive hours (gap hour 1 included), 2 types, one row per cell
    assert len(hours) == 4
    assert all(b - a == 3600 for a, b in zip(hours, hours[1:]))
    assert len(out) == 8
    gap = out[out["window_start"] == hours[1]]
    assert (gap["n_events"] == 0).all() and (gap["value_milli"] == 0).all()
    # non-gap cells agree with a plain pandas aggregate
    df = pd.read_parquet("%s/events.parquet" % sf_dir)
    df["h"] = (df["ts"].astype("int64") // 10**9 // 3600) * 3600
    truth = df.groupby(["h", "event_type"]).size()
    for (_, r) in out.iterrows():
        want = truth.get((r["window_start"], r["event_type"]), 0)
        assert r["n_events"] == want
