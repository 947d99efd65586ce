"""ccnet_buckets: tercile census vs a plain-Python reference,
per-language model isolation, partition invariance."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from rdfa_ray.stages.lmscore import ccnet_buckets


def _reference(docs):
    freq: dict = {}
    for _d, text, lang in docs:
        for w in text.lower().split(" "):
            freq[(lang, w)] = freq.get((lang, w), 0) + 1
    tot: dict = {}
    for (lang, _w), n in freq.items():
        tot[lang] = tot.get(lang, 0) + n
    scored = []
    for d, text, lang in docs:
        ws = text.lower().split(" ")
        nll = [-math.log(freq[(lang, w)] / tot[lang]) for w in ws]
        scored.append((d, lang, len(ws), math.floor(np.mean(nll) * 1e6 + 0.5)))
    out: dict = {}
    bylang: dict = {}
    for d, lang, n, ppl in scored:
        bylang.setdefault(lang, []).append(ppl)
    thr = {}
    for lang, ppls in bylang.items():
        v = sorted(ppls)
        n = len(v)
        q33 = v[max(math.ceil(0.33 * n), 1) - 1]
        q67 = v[max(math.ceil(0.67 * n), 1) - 1]
        thr[lang] = (q33, q67)
    for d, lang, n, ppl in scored:
        q33, q67 = thr[lang]
        b = "head" if ppl <= q33 else ("middle" if ppl <= q67 else "tail")
        k = (lang, b)
        nd, nt = out.get(k, (0, 0))
        out[k] = (nd + 1, nt + n)
    return out


def _run(docs, parallelism=1):
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text", "lang"]))
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    got = ccnet_buckets(ds).to_pandas()
    return {
        (r["lang"], r["bucket"]): (int(r["n_docs"]), int(r["tokens_total"]))
        for _, r in got.iterrows()
    }


def _docs(seed=15, n=90):
    rng = np.random.default_rng(seed)
    vocab = {"en": ["the", "cat", "dog", "runs", "fast"],
             "fr": ["le", "chat", "chien", "court", "vite"]}
    docs = []
    for i in range(n):
        lang = "en" if i % 2 else "fr"
        words = rng.choice(vocab[lang], rng.integers(3, 25))
        docs.append((i, " ".join(words), lang))
    return docs


def test_vs_reference(ray_session):
    docs = _docs()
    assert _run(docs) == _reference(docs)


def test_language_isolation(ray_session):
    # a token frequent in en but rare in fr must score differently —
    # the per-language model, not a global one
    docs = [
        (1, "aa aa aa aa", "en"),
        (2, "bb", "en"),
        (3, "aa", "fr"),
        (4, "cc cc cc", "fr"),
    ]
    got = _run(docs)
    assert got == _reference(docs)


def test_partition_invariance(ray_session):
    docs = _docs(seed=16, n=60)
    assert _run(docs, parallelism=1) == _run(docs, parallelism=7)
