"""bigram_logppl: plain-Python reference twin, word-order sensitivity
(the signal unigram cannot see), short-doc exclusion, partition
invariance."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from rdfa_ray.stages.lmscore import bigram_logppl


def _reference(docs, lam=0.7):
    toks = {d: t.lower().split(" ") for d, t in docs}
    uni: dict = {}
    bi: dict = {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    T = sum(uni.values())
    pref: dict = {}
    for (a, _b), c in bi.items():
        pref[a] = pref.get(a, 0) + c
    out = {}
    for d, ts in toks.items():
        nlls = [
            -math.log(
                lam * (bi[(a, b)] / pref[a]) + (1 - lam) * (uni[b] / T)
            )
            for a, b in zip(ts, ts[1:])
        ]
        if nlls:
            out[d] = (len(nlls), math.floor(np.mean(nlls) * 1e6 + 0.5))
    return out


def _run(docs, parallelism=1):
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    out = bigram_logppl(ds).to_pandas()
    return {
        int(r["doc_id"]): (int(r["n_bigrams"]), int(r["logppl_micro"]))
        for _, r in out.iterrows()
    }


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the mat"),
    (3, "mat the on sat cat the"),  # scrambled word order, same bag
    (4, "solo"),                     # no bigrams -> excluded
    (5, "the cat sat"),
]


def test_vs_reference(ray_session):
    assert _run(DOCS) == _reference(DOCS)


def test_word_order_signal(ray_session):
    got = _run(DOCS)
    # same unigram bag, scrambled order -> strictly worse bigram score
    assert got[3][1] > got[1][1]


def test_short_doc_excluded(ray_session):
    assert 4 not in _run(DOCS)


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(8)
    vocab = ["w%d" % i for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab, rng.integers(2, 40))))
        for i in range(120)
    ]
    assert _run(docs, parallelism=1) == _run(docs, parallelism=9)
