"""BM25 ranking (stages/bm25.py) vs a single-process reference twin,
plus layout-independence (block straddling must not change scores)."""

import math
import re

import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.bm25 import bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick quick quick fox"),
    (2, "dogs and cats living together"),
    (3, "fox news covers the dog show with another dog"),
    (4, "nothing relevant here at all whatsoever"),
    (5, "quick dog quick fox quick dog"),
]


def _twin(docs, query, k=10, k1=1.2, b=0.75):
    tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    q = sorted(set(tok(query)))
    n = len(docs)
    lens = {d: len(tok(t)) for d, t in docs}
    avgdl = sum(lens.values()) / n
    tf = {}
    for d, t in docs:
        for w in tok(t):
            if w in q:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    scores = {}
    for (d, w), f in tf.items():
        idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
        c = idf * f * (k1 + 1) / (f + k1 * (1 - b + b * lens[d] / avgdl))
        scores[d] = scores.get(d, 0) + int(math.floor(c * 1e6 + 0.5))
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


def _ds(docs, parallelism=1):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


@pytest.mark.parametrize("parts", [1, 4])
def test_matches_reference_twin(ray_session, parts):
    got = bm25_topk(
        _ds(DOCS, parts), "quick fox", n_docs=len(DOCS), k=10
    ).to_pandas()
    want = _twin(DOCS, "quick fox")
    assert list(zip(got["doc_id"], got["score_micro"])) == want


def test_only_matching_docs_and_k_cap(ray_session):
    got = bm25_topk(_ds(DOCS), "dog", n_docs=len(DOCS), k=2).to_pandas()
    assert len(got) == 2
    # doc 4 (no hits) can never appear
    assert 4 not in set(got["doc_id"])


def test_rare_term_outranks_common(ray_session):
    # 'cats' appears once in the corpus; 'the' is everywhere: the
    # cats-only doc must beat a the-only doc for query "cats the"
    got = bm25_topk(_ds(DOCS), "cats the", n_docs=len(DOCS), k=10).to_pandas()
    ranks = {d: i for i, d in enumerate(got["doc_id"])}
    assert ranks[2] == 0


def test_empty_query_raises(ray_session):
    with pytest.raises(ValueError):
        bm25_topk(_ds(DOCS), "!!!", n_docs=len(DOCS))
