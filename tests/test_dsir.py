"""DSIR importance resampling (stages/dsir.py): weight direction,
exact reference twin, partition invariance, resample determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rdfa_ray.stages.dsir import (
    N_BUCKETS,
    _grams,
    dsir_log_weights,
    dsir_resample,
)


def _docs(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "is_target"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


# target speaks "alpha beta"; the pool also contains "gamma delta" docs
TARGET_TEXT = "alpha beta alpha beta alpha"
OFF_TEXT = "gamma delta gamma delta gamma"
ROWS = (
    [(i, TARGET_TEXT, True) for i in range(8)]
    + [(100 + i, TARGET_TEXT, False) for i in range(4)]
    + [(200 + i, OFF_TEXT, False) for i in range(4)]
)


def test_weights_favor_target_like_docs(ray_session):
    w = dsir_log_weights(_docs(ROWS)).to_pandas().set_index("doc_id")
    like = [w.loc[100 + i, "logw_micro"] for i in range(4)]
    unlike = [w.loc[200 + i, "logw_micro"] for i in range(4)]
    assert min(like) > max(unlike)
    # identical text -> identical weight
    assert len(set(like)) == 1 and len(set(unlike)) == 1


def _reference_weights(rows):
    """Plain-Python twin of the distributed path."""
    import hashlib
    from collections import Counter

    def grams(text):
        toks = text.lower().split(" ")
        return toks + [a + " " + b for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[:4]

    n = Counter()
    nt = Counter()
    for _d, text, it in rows:
        for g in grams(text):
            b = bucket(g)
            n[b] += 1
            if it:
                nt[b] += 1
    r_tot, t_tot = sum(n.values()), sum(nt.values())
    rm = {
        b: int(
            np.floor(
                (
                    np.log(nt.get(b, 0) + 1.0)
                    - np.log(t_tot + N_BUCKETS)
                    - np.log(n[b] + 1.0)
                    + np.log(r_tot + N_BUCKETS)
                )
                * 1e6
                + 0.5
            )
        )
        for b in n
    }
    return {
        d: sum(rm[bucket(g)] for g in grams(text)) for d, text, _it in rows
    }


def test_weights_match_reference_twin(ray_session):
    rows = [
        (i, t, i % 3 == 0)
        for i, t in enumerate(
            [
                "the quick brown fox",
                "the slow brown dog",
                "quick quick fox fox",
                "",
                "one",
                "the the the",
                "fox dog fox dog fox",
            ]
        )
    ]
    got = (
        dsir_log_weights(_docs(rows))
        .to_pandas()
        .set_index("doc_id")["logw_micro"]
        .to_dict()
    )
    assert got == _reference_weights(rows)


def test_weights_partition_invariant(ray_session):
    a = dsir_log_weights(_docs(ROWS)).to_pandas().sort_values("doc_id")
    b = (
        dsir_log_weights(_docs(ROWS).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_resample_deterministic_and_biased(ray_session):
    w = dsir_log_weights(_docs(ROWS))
    k = 6
    s1 = dsir_resample(w, k=k, seed=7).to_pandas()
    s2 = dsir_resample(
        dsir_log_weights(_docs(ROWS).repartition(5)), k=k, seed=7
    ).to_pandas()
    assert len(s1) == k
    assert list(s1["doc_id"]) == list(s2["doc_id"])  # same seed+corpus
    # keys are sorted descending
    assert list(s1["gumbel_key"]) == sorted(s1["gumbel_key"], reverse=True)
    # a different seed picks a (generally) different set
    s3 = dsir_resample(w, k=k, seed=8).to_pandas()
    assert set(s3["doc_id"]) != set(s1["doc_id"])
    # the weight gap (target-like >> off-target) dominates Gumbel noise
    # here, so target-like docs fill the selection
    sel = set(s1["doc_id"])
    assert all(d < 200 for d in sel)


def test_empty_input(ray_session):
    empty = _docs([])
    out = dsir_log_weights(empty)
    # Ray's to_pandas drops column schemas for all-empty datasets (the
    # blocks themselves are typed); assert emptiness + block schema
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == [
        "doc_id", "n_grams", "logw_micro",
    ]


def test_gram_extraction_matches_sql_tokenizer(ray_session):
    # "" splits to the single empty token (DuckDB string_split parity)
    parents, grams = _grams(pd.Series(["", "a b"]))
    assert list(grams[parents == 0]) == [""]
    assert sorted(grams[parents == 1]) == ["a", "a b", "b"]
