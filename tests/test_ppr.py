"""Personalized PageRank (seed teleport): all three execution modes vs
a dense numpy reference, seed-locality property, missing-seed refusal,
uniform-seed degeneracy."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.pagerank import pagerank


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _dense_ppr(edges, n_iters, damping, seeds):
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    e = np.zeros(n)
    if seeds is None:
        e[:] = 1.0 / n
    else:
        for s in set(seeds):
            e[idx[s]] = 1.0 / len(set(seeds))
    r = e.copy()
    for _ in range(n_iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / outdeg[idx[s]]
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) * e + damping * (contrib + dangling * e)
    return {v: r[idx[v]] for v in nodes}


MODES = [
    {},  # local dense fast path
    {"local_limit": 0},  # broadcast supersteps
    {"local_limit": 0, "broadcast_limit": 0},  # shuffle supersteps
]


@pytest.mark.parametrize("mode", MODES)
def test_ppr_matches_dense(ray_session, mode):
    rng = np.random.default_rng(13)
    edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2))})
    edges = [e for e in edges if e[0] != e[1]]
    seeds = [edges[0][0], edges[5][1]]
    got = (
        pagerank(_edges(edges), n_iters=8, n_buckets=4, seeds=seeds, **mode)
        .to_pandas()
        .set_index("node")["rank"]
    )
    want = _dense_ppr(edges, 8, 0.85, seeds)
    assert set(got.index) == set(want)
    assert abs(got.sum() - 1.0) < 1e-6
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-9), (v, mode)


def test_seed_locality(ray_session):
    # two disconnected 4-cycles; seeding in one leaves the other at 0
    a = [(0, 1), (1, 2), (2, 3), (3, 0)]
    b = [(10, 11), (11, 12), (12, 13), (13, 10)]
    got = (
        pagerank(_edges(a + b), n_iters=20, seeds=[0])
        .to_pandas()
        .set_index("node")["rank"]
    )
    assert got[[0, 1, 2, 3]].sum() == pytest.approx(1.0, abs=1e-9)
    assert (got[[10, 11, 12, 13]] == 0).all()


@pytest.mark.parametrize("mode", MODES)
def test_missing_seed_refused(ray_session, mode):
    with pytest.raises(ValueError, match="seeds"):
        pagerank(_edges([(1, 2), (2, 3)]), n_iters=2, seeds=[999], **mode)


def test_all_nodes_as_seeds_equals_uniform(ray_session):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    nodes = [0, 1, 2, 3]
    uni = pagerank(_edges(edges), n_iters=10).to_pandas().set_index("node")["rank"]
    ppr = (
        pagerank(_edges(edges), n_iters=10, seeds=nodes)
        .to_pandas()
        .set_index("node")["rank"]
    )
    for v in nodes:
        assert ppr[v] == pytest.approx(uni[v], abs=1e-12)
