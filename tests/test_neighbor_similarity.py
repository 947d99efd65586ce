"""neighbor_similarity (stages/graphalgo.py): known-graph scores,
exclude_edges modes, hub cap semantics, randomized reference twin,
partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdfa_ray.stages.graphalgo import neighbor_similarity


def _edges_ds(pairs, parallelism=1):
    t = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.int64()),
            "dst": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


def _reference(pairs, min_common=1, cap=None, exclude_edges=True):
    """Plain-Python twin: adjacency sets, pairwise intersection through
    capped centers, Jaccard over FULL degrees."""
    adj: dict[int, set] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    edge_set = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    from collections import Counter

    common = Counter()
    for c, nbrs in adj.items():
        if cap is not None and len(nbrs) > cap:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                common[(ns[i], ns[j])] += 1
    rows = []
    for (u, v), cnt in common.items():
        if cnt < min_common:
            continue
        if exclude_edges and (u, v) in edge_set:
            continue
        du, dv = len(adj[u]), len(adj[v])
        rows.append((u, v, cnt, du, dv, cnt * 1_000_000 // (du + dv - cnt)))
    return sorted(rows)


def _run(pairs, parallelism=1, **kw):
    out = neighbor_similarity(_edges_ds(pairs, parallelism), **kw).to_pandas()
    if out.empty:
        return []
    return sorted(
        tuple(int(x) for x in row)
        for row in out[["u", "v", "common", "deg_u", "deg_v", "jaccard_ppm"]].itertuples(index=False)
    )


def test_path_and_square(ray_session):
    # path 1-2-3: pair (1,3) shares center 2; square 10-11-12-13-10:
    # opposite corners share two centers
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (13, 10)]
    got = _run(pairs)
    assert got == _reference(pairs)
    # spot-check the square: (10,12) common=2, deg 2+2, union=2 -> ppm 1_000_000
    assert (10, 12, 2, 2, 2, 1_000_000) in got


def test_exclude_edges_toggle(ray_session):
    # triangle: every pair is an edge AND has a common neighbor
    pairs = [(1, 2), (2, 3), (1, 3)]
    assert _run(pairs) == []
    got = _run(pairs, exclude_edges=False)
    assert got == _reference(pairs, exclude_edges=False)
    assert len(got) == 3


def test_hub_cap(ray_session):
    # star: hub 0 joined to 1..5 — capping below 5 suppresses the hub
    # as a center, leaving no scored pairs; leaf degrees stay 1
    pairs = [(0, i) for i in range(1, 6)]
    assert len(_run(pairs)) == 10  # C(5,2) through the hub
    assert _run(pairs, max_center_degree=4) == _reference(pairs, cap=4)
    assert _run(pairs, max_center_degree=4) == []


def test_randomized_vs_reference(ray_session):
    rng = np.random.default_rng(7)
    pairs = [tuple(map(int, rng.integers(0, 40, 2))) for _ in range(160)]
    for kw in (
        dict(),
        dict(min_common=2),
        dict(exclude_edges=False),
        dict(max_center_degree=6),
    ):
        ref = _reference(
            pairs,
            min_common=kw.get("min_common", 1),
            cap=kw.get("max_center_degree"),
            exclude_edges=kw.get("exclude_edges", True),
        )
        assert _run(pairs, **kw) == ref, kw


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    pairs = [tuple(map(int, rng.integers(0, 30, 2))) for _ in range(120)]
    assert _run(pairs, parallelism=1) == _run(pairs, parallelism=7)


def test_unpackable_ids_fallback(ray_session):
    # ids above 2^31 force the generic 2-column path; results must
    # match the packed path's semantics exactly
    BIG = 1 << 40
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (13, 10)]
    shifted = [(a + BIG, b + BIG) for a, b in pairs]
    got = _run(shifted)
    want = [
        (u + BIG, v + BIG, c, du, dv, j)
        for (u, v, c, du, dv, j) in _reference(pairs)
    ]
    assert got == sorted(want)
