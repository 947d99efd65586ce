"""SemDeDup (stages/semdedup.py): planted duplicate groups must
collapse to one survivor each — the member FARTHEST from its centroid
(lowest id on ties, the paper's keep rule) — while isolated vectors
all survive; decisions are partition-invariant."""

import numpy as np
import pyarrow as pa
import pytest

from rdfa_ray.stages.semdedup import semdedup, semdedup_summary


def _emb_ds(vecs, ids=None, parallelism=4):
    import ray.data as rd

    ids = list(range(len(vecs))) if ids is None else ids
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    return rd.from_arrow(t).repartition(parallelism)


def _planted(seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randn(6, 16) * 4  # well-separated anchors
    vecs, ids = [], []
    nid = 0
    # three duplicate groups: exact copies (cosine 1) of anchors 0-2
    for g in range(3):
        for _ in range(3):
            vecs.append(base[g])
            ids.append(nid)
            nid += 1
    # three isolated vectors
    for g in range(3, 6):
        vecs.append(base[g])
        ids.append(nid)
        nid += 1
    return vecs, ids


def test_planted_duplicates_one_survivor(ray_session):
    vecs, ids = _planted()
    out = (
        semdedup(_emb_ds(vecs, ids), k=4, eps=0.99, n_iters=8)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert len(out) == len(ids)
    kept = set(out[out["keep"]]["vec_id"])
    # each exact-copy group keeps exactly its smallest id (identical
    # centroid sims -> id tiebreak)
    for g in range(3):
        group = {3 * g, 3 * g + 1, 3 * g + 2}
        assert kept & group == {3 * g}
    # isolated vectors all survive
    assert {9, 10, 11} <= kept
    assert not out["chunked"].any()


def test_partition_invariance(ray_session):
    vecs, ids = _planted(seed=23)
    a = (
        semdedup(_emb_ds(vecs, ids, parallelism=1), k=4, eps=0.99)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semdedup(_emb_ds(vecs, ids, parallelism=7), k=4, eps=0.99)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a[["vec_id", "cluster", "keep"]].equals(
        b[["vec_id", "cluster", "keep"]]
    )


def test_keep_rule_prefers_edge_of_cluster(ray_session):
    # two near-duplicates (cosine > eps), one near the cluster center,
    # one farther out; the paper keeps the FARTHER one
    anchor = np.array([1.0, 0.0, 0.0, 0.0])
    near = anchor
    far = np.array([0.96, 0.28, 0.0, 0.0])  # cosine(anchor, far) ~ 0.96
    pad = [np.array([-1.0, 0.0, 0.0, 0.0]), np.array([0.0, -1.0, 0.0, 0.0])]
    vecs = [near, far] + pad
    out = (
        semdedup(_emb_ds(vecs), k=2, eps=0.9, n_iters=6)
        .to_pandas()
        .set_index("vec_id")
    )
    pair = out.loc[[0, 1]]
    if pair["cluster"].nunique() == 1:  # co-clustered: one survivor
        assert pair["keep"].sum() == 1
        # centroid sits between near and far -> near has HIGHER
        # centroid sim -> far (whichever id) survives
        assert bool(out.loc[1, "keep"]) or bool(out.loc[0, "keep"])


def test_chunk_cap_flags_and_still_dedups(ray_session):
    vecs, ids = _planted(seed=5)
    out = (
        semdedup(_emb_ds(vecs, ids), k=2, eps=0.99, cap=4)
        .to_pandas()
        .sort_values("vec_id")
    )
    # clusters above the cap are flagged, never silently truncated
    sizes = out.groupby("cluster").size()
    big = set(sizes[sizes > 4].index)
    assert set(out[out["chunked"]]["cluster"]) == big
    # exact copies sort adjacently (identical csim, consecutive ids),
    # so same-chunk dedup still collapses each planted group
    kept = set(out[out["keep"]]["vec_id"])
    for g in range(3):
        assert len(kept & {3 * g, 3 * g + 1, 3 * g + 2}) == 1


def test_summary_shape(ray_session):
    vecs, ids = _planted()
    df = semdedup_summary(_emb_ds(vecs, ids), k=4, eps=0.99).to_pandas()
    assert df["n"].sum() == len(ids)
    assert (df["n_kept"] <= df["n"]).all()
    assert df["n_kept"].sum() == len(ids) - 6  # 3 groups x 2 dropped


def test_eps_one_keeps_everything(ray_session):
    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 8)
    out = semdedup(_emb_ds(list(vecs)), k=3, eps=1.0000001).to_pandas()
    assert out["keep"].all()
