"""Triangle counting (degree-oriented wedge join) and BFS levels."""

import pyarrow as pa
import pytest
import ray.data as rd


def _edges(pairs):
    src, dst = zip(*pairs) if pairs else ((), ())
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


def test_triangle_count_known_graphs(ray_session):
    from rdfa_ray.stages.graphalgo import triangle_count

    # K4 has C(4,3) = 4 triangles; the pendant edge (5,6) adds none;
    # duplicate + reversed + self-loop edges must not change the count
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(1, 0), (2, 1), (5, 6), (3, 3)] + k4
    out = triangle_count(_edges(noisy), n_buckets=4).to_pandas()
    assert out["n_triangles"].tolist() == [4]


def test_triangle_count_triangle_free(ray_session):
    from rdfa_ray.stages.graphalgo import triangle_count

    # a tree and a 4-cycle are triangle-free
    tree = [(0, 1), (0, 2), (1, 3), (1, 4)]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    out = triangle_count(_edges(tree + square), n_buckets=4).to_pandas()
    assert out["n_triangles"].tolist() == [0]


def test_triangle_count_empty(ray_session):
    from rdfa_ray.stages.graphalgo import triangle_count

    out = triangle_count(_edges([]), n_buckets=2).to_pandas()
    assert out["n_triangles"].tolist() == [0]


@pytest.mark.parametrize("local_limit", [100_000, 0])
def test_bfs_levels_both_paths(ray_session, local_limit):
    from rdfa_ray.stages.graphalgo import bfs_levels

    # two paths out of 0, a cycle back to 0, and an unreachable island
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 5), (7, 8)]
    out = (
        bfs_levels(_edges(pairs), source=0, local_limit=local_limit)
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"], out["depth"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3}


def test_bfs_levels_empty_edges(ray_session):
    from rdfa_ray.stages.graphalgo import bfs_levels

    out = bfs_levels(_edges([]), source=42).to_pandas()
    assert out["node"].tolist() == [42]
    assert out["depth"].tolist() == [0]


def test_kcore_known_graph(ray_session):
    import pandas as pd
    import ray.data as rd

    from rdfa_ray.stages.graphalgo import kcore

    # K4 on {0,1,2,3} (3-core) + a tail 3-4-5 + a pendant 4-6:
    # 2-core = K4 only after peeling the tail; 3-core = K4
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (4, 6)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    ds = rd.from_pandas(df)

    core2 = kcore(ds, k=2).to_pandas().sort_values("node")
    assert core2["node"].tolist() == [0, 1, 2, 3]
    assert core2["degree"].tolist() == [3, 3, 3, 3]

    core3 = kcore(ds, k=3).to_pandas().sort_values("node")
    assert core3["node"].tolist() == [0, 1, 2, 3]

    core4 = kcore(ds, k=4).to_pandas()
    assert len(core4) == 0


def test_kcore_matches_reference_peeling(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdfa_ray.stages.graphalgo import kcore

    rng = np.random.RandomState(4)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(0, 40, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)

    def ref_kcore(es, k):
        es = set(es)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            low = {n for n, d in deg.items() if d < k}
            if not low:
                return deg
            es = {(a, b) for a, b in es if a not in low and b not in low}
            if not es:
                return {}

    df = pd.DataFrame(edges, columns=["src", "dst"])
    for k in (2, 3, 4, 5):
        pdf = kcore(rd.from_pandas(df), k=k).to_pandas()
        got = (
            pdf.set_index("node")["degree"].to_dict() if len(pdf) else {}
        )
        assert got == ref_kcore(edges, k), k
