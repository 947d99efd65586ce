"""Incremental exact dedup against the persisted hash store
(stages/dedupstore.py): store build, pruned-prefix rejection,
drop-internal keep-first, generational commit, crash safety,
idempotency."""

import json
import os

import pandas as pd
import pytest
import ray.data as rd

from rdfa_ray.stages.dedupstore import (
    hash_store_is_complete,
    incremental_exact_dedup,
    persist_hash_store,
)


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))


CORPUS = [(i, "corpus doc %d" % i) for i in range(40)]


def test_incremental_rejects_known_and_keeps_first(ray_session, tmp_path):
    store = str(tmp_path / "hs")
    persist_hash_store(_docs(CORPUS), store)
    assert hash_store_is_complete(store)

    drop = _docs(
        [
            (100, "corpus doc 3"),    # already accepted -> rejected
            (101, "fresh content a"),
            (102, "fresh content a"),  # drop-internal dup -> 101 keeps
            (103, "corpus doc 17"),   # already accepted -> rejected
            (104, "fresh content b"),
        ]
    )
    out = incremental_exact_dedup(drop, store).to_pandas()
    assert sorted(out["doc_id"]) == [101, 104]


def test_commit_appends_generation_and_blocks_replay(ray_session, tmp_path):
    store = str(tmp_path / "hs")
    persist_hash_store(_docs(CORPUS), store)
    g1 = json.load(open(os.path.join(store, "_meta.json")))["generation"]

    drop = _docs([(200, "novel x"), (201, "novel y"), (202, "corpus doc 0")])
    out = incremental_exact_dedup(drop, store, commit=True).to_pandas()
    assert sorted(out["doc_id"]) == [200, 201]
    meta = json.load(open(os.path.join(store, "_meta.json")))
    assert meta["generation"] == g1 + 1

    # the SAME content arriving in a later drop is now rejected
    replay = _docs([(300, "novel x"), (301, "really new")])
    out2 = incremental_exact_dedup(replay, store, commit=True).to_pandas()
    assert sorted(out2["doc_id"]) == [301]

    # append-only: generation files accumulate under touched prefixes
    n_files = sum(len(v) for v in json.load(
        open(os.path.join(store, "_meta.json")))["partitions"].values())
    assert n_files >= sum(len(v) for v in meta["partitions"].values())


def test_crash_before_manifest_leaves_old_snapshot(ray_session, tmp_path):
    store = str(tmp_path / "hs")
    persist_hash_store(_docs(CORPUS), store)
    before = json.load(open(os.path.join(store, "_meta.json")))
    # a crashed commit leaves stray generation files but the OLD manifest
    stray = os.path.join(store, "parts", "ff-g9-deadbeef.parquet")
    with open(stray, "w") as f:
        f.write("not parquet")
    after = json.load(open(os.path.join(store, "_meta.json")))
    assert after == before  # manifest untouched
    # reads follow the manifest only: dedup still works
    out = incremental_exact_dedup(
        _docs([(400, "post-crash fresh")]), store
    ).to_pandas()
    assert list(out["doc_id"]) == [400]


def test_missing_store_refuses_loudly(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError, match="absent or incomplete"):
        incremental_exact_dedup(_docs(CORPUS), str(tmp_path / "nope"))


def test_empty_drop_and_unseen_prefixes(ray_session, tmp_path):
    store = str(tmp_path / "hs")
    persist_hash_store(_docs(CORPUS[:2]), store)  # tiny store: few prefixes
    out = incremental_exact_dedup(
        _docs([(500, "entirely new prefix material")]), store, commit=True
    ).to_pandas()
    assert list(out["doc_id"]) == [500]
    empty = _docs([]).map_batches(lambda d: d, batch_format="pandas")
    out2 = incremental_exact_dedup(empty, store).to_pandas()
    assert len(out2) == 0
