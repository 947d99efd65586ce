"""Exact n-gram Jaccard self-join (prefix filtering) vs brute force."""

import random

import pandas as pd
import pytest

from rdfa_ray.stages.dedup import char_grams, ngram_jaccard_dedup


def brute_force_pairs(texts: dict[int, str], threshold: float, n: int = 5):
    out = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        sa = char_grams(texts[a], n)
        for b in ids[i + 1 :]:
            sb = char_grams(texts[b], n)
            isect = len(sa & sb)
            uni = len(sa) + len(sb) - isect
            if isect * 1.0 / uni >= threshold:
                out.append((a, b, isect, uni))
    return sorted(out)


def _mutate(text: str, rng: random.Random, n_edits: int) -> str:
    chars = list(text)
    for _ in range(n_edits):
        i = rng.randrange(len(chars))
        chars[i] = rng.choice("abcdefgh ")
    return "".join(chars)


def test_char_grams_sql_parity():
    # mirrors substr(text, g, 5) over generate_series(1, greatest(len-4, 1))
    assert char_grams("") == {""}
    assert char_grams("abc") == {"abc"}
    assert char_grams("abcde") == {"abcde"}
    assert char_grams("abcdef") == {"abcde", "bcdef"}


@pytest.mark.parametrize("threshold", [0.8, 0.5])
def test_ngram_jaccard_matches_brute_force(ray_session, threshold):
    import ray.data as rd

    rng = random.Random(42)
    base = [
        "".join(rng.choice("abcdefghij klmnop") for _ in range(rng.randrange(60, 200)))
        for _ in range(12)
    ]
    texts = {}
    doc_id = 0
    for b in base:
        texts[doc_id] = b
        doc_id += 1
        # a couple of near-dup mutations per base doc
        for edits in (1, 3, 8, 30):
            texts[doc_id] = _mutate(b, rng, edits)
            doc_id += 1

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[k] for k in sorted(texts)]}
        )
    ).repartition(8)
    got = ngram_jaccard_dedup(ds, threshold=threshold).to_pandas()
    got_pairs = sorted(
        map(tuple, got[["left_id", "right_id", "isect", "uni"]].to_numpy())
    )
    expected = brute_force_pairs(texts, threshold)
    assert got_pairs == expected
    assert expected, "test corpus must contain near-duplicate pairs"


def test_substring_dup_pairs_planted(ray_session):
    """Docs sharing a long verbatim span pair up; winnowing's guarantee
    (shared span >= window+3 words -> >= 1 shared fingerprint) holds
    across partitions; unrelated docs never pair."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.dedup import substring_dup_pairs

    span = " ".join("shared%d" % i for i in range(40))
    rows = [
        {"doc_id": 1, "text": "alpha beta " + span + " gamma"},
        {"doc_id": 2, "text": span + " delta epsilon"},
        {"doc_id": 3, "text": " ".join("solo%d" % i for i in range(60))},
        {"doc_id": 4, "text": "prefix words " + span},
    ]
    docs = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = substring_dup_pairs(docs, min_shared=2).to_pandas()
    got = {tuple(sorted((r.a, r.b))) for r in out.itertuples()}
    assert got == {(1, 2), (1, 4), (2, 4)}
    assert (out["n_shared"] >= 2).all()
