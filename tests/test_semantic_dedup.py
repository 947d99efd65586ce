"""SemDeDup-style semantic dedup (stages/dedup.semantic_dup_pairs):
within-cluster cosine near-dup pairs over an embedding column."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rdfa_ray.stages.dedup import semantic_dup_pairs


def _embeddings(vectors):
    ids = list(range(len(vectors)))
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vectors],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def _two_blobs(rng, d=16, n_per=40):
    """Angularly diverse corpus: mean-zero gaussians (pairwise cosine
    ~N(0, 1/sqrt(d)), far below any dup threshold) nudged toward two
    centers just enough to give k-means stable cells."""
    base = rng.normal(0, 1.0, size=(2 * n_per, d))
    base[:n_per, 0] += 1.5
    base[n_per:, 1] += 1.5
    return base


def test_planted_noisy_near_dup_found(ray_session):
    rng = np.random.default_rng(7)
    vecs = _two_blobs(rng)
    # plant a NOISY copy of vector 3 (tiny perturbation, cosine ~0.9999)
    noisy = vecs[3] + rng.normal(0, 1e-3, size=vecs.shape[1])
    vecs = np.vstack([vecs, noisy[None, :]])
    dup_id = len(vecs) - 1

    pairs = semantic_dup_pairs(
        _embeddings(vecs), k=2, threshold=0.99, n_iters=5
    ).to_pandas()
    assert {(3, dup_id)} == set(zip(pairs["a"], pairs["b"]))
    assert pairs["sim_micro"].iloc[0] >= 990_000


def test_no_pairs_without_duplicates(ray_session):
    rng = np.random.default_rng(11)
    pairs = semantic_dup_pairs(
        _embeddings(_two_blobs(rng)), k=2, threshold=0.999, n_iters=5
    ).to_pandas()
    assert len(pairs) == 0


def test_exact_copy_sim_is_one_million(ray_session):
    rng = np.random.default_rng(13)
    vecs = _two_blobs(rng, n_per=10)
    vecs = np.vstack([vecs, vecs[0][None, :]])  # exact copy of id 0
    pairs = semantic_dup_pairs(
        _embeddings(vecs), k=2, threshold=0.95, n_iters=5
    ).to_pandas()
    row = pairs[(pairs["a"] == 0) & (pairs["b"] == len(vecs) - 1)]
    assert len(row) == 1 and row["sim_micro"].iloc[0] == 1_000_000


def test_cross_cluster_pairs_missed_by_design(ray_session):
    """The SemDeDup trade: a near-dup pair split across clusters is
    not reported.  Pin the behavior so a future change that silently
    alters the recall contract fails a test."""
    # two vectors, cosine 1.0, but k=2 forces them into separate cells
    vecs = np.array([[10.0, 0.0], [20.0, 0.0], [0.0, 10.0], [0.0, 20.0]])
    pairs = semantic_dup_pairs(
        _embeddings(vecs), k=4, threshold=0.95, n_iters=5
    ).to_pandas()
    # with k=4 every vector is its own cell -> zero pairs despite two
    # cosine-1.0 pairs existing globally
    assert len(pairs) == 0
