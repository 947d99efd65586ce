"""Z-order layout (stages/layout.py): Morton key correctness vs a
bit-by-bit reference, locality/pruning benefit over a naive layout,
manifest round-trip, domain clamping, refusals."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.layout import (
    zorder_key,
    zorder_layout,
    zorder_prune,
)


def _ref_key(vals, los, his, bits, stride):
    """Bit-by-bit Python reference of the quantize+interleave (the
    bucket's OWN bits spread at ``stride`` — keys occupy bits*stride
    bits; the round-4 up-shift-to-16-bit variant overflowed int64 for
    4+ columns)."""
    out = 0
    for i, (v, lo, hi) in enumerate(zip(vals, los, his)):
        q = (v - lo) * (1 << bits) // (hi - lo)
        q = max(0, min((1 << bits) - 1, q))
        for b in range(bits):
            out |= ((q >> b) & 1) << (b * stride + i)
    return out


def test_key_vs_reference(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "x": rng.integers(0, 1000, 300),
            "y": rng.integers(-50, 450, 300),
            "z": rng.integers(0, 7, 300),
        }
    )
    domains = {"x": (0, 1000), "y": (-50, 450), "z": (0, 7)}
    for cols, bits in ((["x", "y"], 16), (["x", "y", "z"], 10), (["x"], 12)):
        t = zorder_key(pa.Table.from_pandas(df), cols, domains, bits=bits)
        got = t.column("zkey").to_pylist()
        want = [
            _ref_key([r[c] for c in cols], [domains[c][0] for c in cols],
                     [domains[c][1] for c in cols], bits, len(cols))
            for _, r in df.iterrows()
        ]
        assert got == want, (cols, bits)


def test_key_refusals(ray_session):
    t = pa.table({"x": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="exceeds int64"):
        zorder_key(t, ["x"] * 5, {"x": (0, 10)}, bits=16)
    with pytest.raises(ValueError, match="at most 16"):
        zorder_key(t, ["x"], {"x": (0, 10)}, bits=20)
    with pytest.raises(ValueError, match="empty domain"):
        zorder_key(t, ["x"], {"x": (5, 5)})


def test_layout_prune_beats_naive(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    n = 20_000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 1 << 14, n),
            "b": rng.integers(0, 1 << 14, n),
            "payload": rng.integers(0, 1 << 30, n),
        }
    )
    domains = {"a": (0, 1 << 14), "b": (0, 1 << 14)}
    out = str(tmp_path / "zorder")
    ds = rd.from_pandas(df).repartition(16)
    manifest = zorder_layout(ds, ["a", "b"], domains, out)
    n_files = len(manifest["files"])
    assert n_files >= 8

    # a small box on BOTH dims prunes most files
    box = {"a": (1000, 1400), "b": (2000, 2400)}
    kept = zorder_prune(out, box)
    assert len(kept) <= max(2, n_files // 3)

    # correctness: the surviving files hold every matching row
    import pyarrow.parquet as pq

    rows = pd.concat([pq.read_table(p).to_pandas() for p in kept])
    got = rows[(rows.a.between(*box["a"])) & (rows.b.between(*box["b"]))]
    want = df[(df.a.between(*box["a"])) & (df.b.between(*box["b"]))]
    assert sorted(got["payload"]) == sorted(want["payload"])

    # a single-dim box also prunes (the point of z-order vs 1-col sort)
    kept_a = zorder_prune(out, {"a": (0, 800)})
    kept_b = zorder_prune(out, {"b": (0, 800)})
    assert len(kept_a) < n_files and len(kept_b) < n_files

    with pytest.raises(ValueError, match="not in the layout"):
        zorder_prune(out, {"nope": (0, 1)})


def test_manifest_shape(ray_session, tmp_path):
    df = pd.DataFrame({"a": range(100), "b": range(100)})
    out = str(tmp_path / "z2")
    manifest = zorder_layout(
        rd.from_pandas(df), ["a", "b"], {"a": (0, 100), "b": (0, 100)}, out
    )
    on_disk = json.load(open(os.path.join(out, "_manifest", "files.json")))
    assert on_disk == manifest
    for name, stats in manifest["files"].items():
        assert os.path.exists(os.path.join(out, name))
        assert set(stats) == {"a", "b"}


def test_duplicate_key_runs_no_file_collision(ray_session, tmp_path):
    # ADVICE r3 (medium): a run of identical zkeys spanning block
    # boundaries used to give two blocks the same (kmin, kmax) name —
    # os.replace silently overwrote the first file, losing rows.  One
    # constant key over many partitions forces exactly that layout.
    n = 5_000
    df = pd.DataFrame({"a": np.full(n, 7), "b": np.full(n, 9),
                       "payload": np.arange(n)})
    out = str(tmp_path / "zdup")
    ds = rd.from_pandas(df).repartition(8)
    manifest = zorder_layout(ds, ["a", "b"], {"a": (0, 16), "b": (0, 16)}, out)
    import pyarrow.parquet as pq

    files = [os.path.join(out, f) for f in manifest["files"]]
    rows = pd.concat([pq.read_table(p).to_pandas() for p in files])
    assert sorted(rows["payload"]) == list(range(n))  # no rows lost
    on_disk = {
        f for f in os.listdir(out)
        if f.endswith(".parquet") and not f.startswith(".")
    }
    assert on_disk == set(manifest["files"])  # manifest covers every file


def test_zorder_key_domain_width_guard_and_clamp():
    # ADVICE r3 (low): (v - lo) * 2^bits overflowed int64 before the
    # clip for huge domains / far-out-of-domain values
    t = pa.table({"x": pa.array([0, (1 << 62)], pa.int64())})
    with pytest.raises(ValueError, match="domain width"):
        zorder_key(t, ["x"], {"x": (0, 1 << 62)}, bits=16)
    # far-out-of-domain values clamp instead of wrapping: the key for
    # an over-domain value equals the key for hi-1
    t2 = pa.table({"x": pa.array([(1 << 62), 99], pa.int64())})
    keys = zorder_key(t2, ["x"], {"x": (0, 100)}, bits=8).column("zkey").to_pylist()
    ref = zorder_key(
        pa.table({"x": pa.array([99], pa.int64())}), ["x"], {"x": (0, 100)}, bits=8
    ).column("zkey").to_pylist()
    assert keys[0] == ref[0]


def test_relayout_vacuums_stale_parts(ray_session, tmp_path):
    # uuid block names make re-runs write fresh files; the manifest
    # swap must also drop the previous run's now-unreferenced parts
    df = pd.DataFrame({"a": range(200), "b": range(200)})
    out = str(tmp_path / "zv")
    domains = {"a": (0, 200), "b": (0, 200)}
    m1 = zorder_layout(rd.from_pandas(df).repartition(4), ["a", "b"], domains, out)
    first = set(m1["files"])
    m2 = zorder_layout(rd.from_pandas(df).repartition(4), ["a", "b"], domains, out)
    second = set(m2["files"])
    assert first.isdisjoint(second)  # uuid names never collide
    on_disk = {
        f for f in os.listdir(out)
        if f.endswith(".parquet") and not f.startswith(".")
    }
    assert on_disk == second  # stale first-run parts vacuumed
    # pruned reads still complete and correct
    kept = zorder_prune(out, {"a": (0, 50)})
    import pyarrow.parquet as pq

    rows = pd.concat([pq.read_table(p).to_pandas() for p in kept])
    assert set(rows[rows.a <= 50]["a"]) == set(range(51))


def test_four_column_keys_fit_int63_and_order(ray_session):
    """4-column layouts must produce non-negative keys in Morton order
    (the round-4 packing set bit 63 for ANY 4-column layout)."""
    doms = {c: (0, 256) for c in "abcd"}
    t = pa.table({c: pa.array([0, 100, 255], pa.int64()) for c in "abcd"})
    out = zorder_key(t, list("abcd"), doms, bits=8)
    keys = out.column("zkey").to_pylist()
    assert all(k >= 0 for k in keys)
    assert keys == sorted(keys)  # equal coords -> monotone in magnitude
    assert keys[2] < (1 << 32)  # 8 bits x 4 cols = 32 key bits
    # nulls refuse loudly
    tn = pa.table({c: pa.array([1, None], pa.int64()) for c in "abcd"})
    with pytest.raises(ValueError, match="null"):
        zorder_key(tn, list("abcd"), doms, bits=8)
