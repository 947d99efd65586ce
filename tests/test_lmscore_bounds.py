"""LM-score model bounding (VERDICT r3 item 1): map-side min-count
pruning, the loud model-size guard, the unigram bucketed-join scoring
fallback, and the null-text / all-OOV exclusion rules (ADVICE r3)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rdfa_ray.stages.lmscore import bigram_logppl, ccnet_buckets, unigram_logppl

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog"),
    (4, "zebra"),  # singleton-vocab doc: fully pruned at min_count=2
    (5, "the the the"),
]


def _ds(docs=DOCS, **extra):
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    for k, v in extra.items():
        df[k] = v
    return rd.from_pandas(df)


def test_min_count_1_identical(ray_session):
    base = unigram_logppl(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pruned = (
        unigram_logppl(_ds(), min_count=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, pruned)


def test_min_count_prunes_and_excludes_all_oov_docs(ray_session):
    out = (
        unigram_logppl(_ds(), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 4's only token appears once in the corpus -> fully OOV after
    # pruning -> the doc is EXCLUDED (no INT64_MIN garbage row)
    assert 4 not in set(out["doc_id"])
    assert (out["logppl_micro"] > 0).all()
    # surviving docs still count ALL their tokens (OOV ones included)
    assert out.loc[out["doc_id"] == 1, "n_tokens"].iloc[0] == 6


def test_max_model_rows_guard_refuses_loudly(ray_session):
    with pytest.raises(ValueError, match="max_model_rows"):
        unigram_logppl(_ds(), max_model_rows=3).to_pandas()
    with pytest.raises(ValueError, match="max_model_rows"):
        bigram_logppl(_ds(), max_model_rows=3).to_pandas()
    with pytest.raises(ValueError, match="max_model_rows"):
        ccnet_buckets(_ds(lang="en"), max_model_rows=3).to_pandas()


def test_bigram_broadcast_limit_refuses_loudly(ray_session):
    with pytest.raises(ValueError, match="broadcast_limit"):
        bigram_logppl(_ds(), broadcast_limit=2).to_pandas()


def test_ccnet_join_fallback_matches_broadcast(ray_session):
    # over the broadcast limit ccnet scores through the bucketed join
    # against the distributed per-language model — identical census
    docs = pd.DataFrame(
        {
            "doc_id": range(12),
            "text": ["w%d common token extra%d" % (i % 4, i % 2) for i in range(12)],
            "lang": ["en", "fr", "de"] * 4,
        }
    )
    a = (
        ccnet_buckets(rd.from_pandas(docs))
        .to_pandas()
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )
    b = (
        ccnet_buckets(rd.from_pandas(docs), broadcast_limit=0)
        .to_pandas()
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_unigram_join_fallback_matches_broadcast(ray_session):
    # broadcast_limit=0 forces every token through the bucketed join —
    # the distributed-model scale path must agree with the broadcast
    # path (tiny corpus: float sum order is identical, so exact)
    broadcast = (
        unigram_logppl(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    joined = (
        unigram_logppl(_ds(), broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(broadcast["doc_id"]) == list(joined["doc_id"])
    assert list(broadcast["n_tokens"]) == list(joined["n_tokens"])
    assert (
        (broadcast["logppl_micro"] - joined["logppl_micro"]).abs() <= 1
    ).all()  # <=1 micro-nat: float assoc. tolerance between mean orders


def test_join_fallback_with_pruning(ray_session):
    b = (
        unigram_logppl(_ds(), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    j = (
        unigram_logppl(_ds(), min_count=2, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(b["doc_id"]) == list(j["doc_id"])
    assert ((b["logppl_micro"] - j["logppl_micro"]).abs() <= 1).all()


def test_null_text_docs_excluded_not_poisoned(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["hello world hello", None, "world hello world"],
            "lang": ["en", "en", "en"],
        }
    )
    ds = rd.from_pandas(docs)
    uni = unigram_logppl(ds).to_pandas()
    assert set(uni["doc_id"]) == {1, 3}
    assert (uni["logppl_micro"] > 0).all()
    # ccnet: the null doc must not land in any bucket (the r3 ADVICE
    # failure mode was floor(NaN) -> INT64_MIN -> arbitrary bucket)
    cc = ccnet_buckets(ds).to_pandas()
    assert int(cc["n_docs"].sum()) == 2
    assert int(cc["tokens_total"].sum()) == 6


def test_ccnet_min_count_1_identical(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": ["w%d common token" % (i % 3) for i in range(8)],
            "lang": ["en", "fr"] * 4,
        }
    )
    a = (
        ccnet_buckets(rd.from_pandas(docs))
        .to_pandas()
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )
    b = (
        ccnet_buckets(rd.from_pandas(docs), min_count=1)
        .to_pandas()
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_bigram_min_count_backoff(ray_session):
    # pruning every singleton bigram leaves only repeated bigrams in
    # the model; every doc still scores (backed off to unigram), none
    # poisoned by NaN
    out = bigram_logppl(_ds(), min_count=2).to_pandas()
    base = bigram_logppl(_ds()).to_pandas()
    assert set(out["doc_id"]) == set(base["doc_id"])
    assert np.isfinite(out["logppl_micro"].to_numpy()).all()
    assert (out["logppl_micro"] >= 0).all()


def test_materialize_input_false_identical(ray_session):
    # the 100-TB path: lazy re-read instead of pinning the text column
    a = unigram_logppl(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        unigram_logppl(_ds(), materialize_input=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    c1 = ccnet_buckets(_ds(lang="en")).to_pandas().sort_values("bucket").reset_index(drop=True)
    c2 = (
        ccnet_buckets(_ds(lang="en"), materialize_input=False)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(c1, c2)
