"""Persisted predicate-partitioned triple store (stages/kgstore.py):
layout, pruned reads, residual filtering, and crash-resume semantics."""

import json
import os

import pyarrow as pa
import pytest

from rdfa_ray.stages.kgstore import (
    persist_kg,
    pred_key,
    read_kg,
    store_is_complete,
)

SRC = "http://schema.org/source"
LANG = "http://schema.org/inLanguage"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _triples_ds():
    import ray.data as rd

    rows = []
    for i in range(40):
        s = "http://example.org/doc/%d" % i
        rows.append({"subj": s, "pred": SRC, "obj_value": "src%d" % (i % 3)})
        rows.append({"subj": s, "pred": LANG, "obj_value": ("zh", "en")[i % 2]})
        rows.append({"subj": s, "pred": TYPE, "obj_value": "http://schema.org/Document"})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_pred_key_deterministic_and_safe():
    k = pred_key(TYPE)
    assert k == pred_key(TYPE)
    assert all(c.isalnum() or c == "_" for c in k)
    assert pred_key(SRC) != pred_key(LANG)


def test_persist_prune_and_residual(ray_session, tmp_path):
    store = str(tmp_path / "kg")
    meta = persist_kg(_triples_ds(), store)
    assert store_is_complete(store)
    assert sorted(meta["partitions"]) == sorted(
        {pred_key(p) for p in (SRC, LANG, TYPE)}
    )
    # hive layout on disk: one directory per predicate token
    tri = os.path.join(store, "triples")
    assert sorted(os.listdir(tri)) == sorted(
        "pred_key=%s" % p for p in meta["partitions"]
    )

    # pruned read returns exactly the requested predicates' rows
    df = read_kg(store, preds=[LANG]).to_pandas()
    assert set(df["pred"]) == {LANG} and len(df) == 40

    # column pruning keeps the residual filter working, drops pred after
    df2 = read_kg(store, preds=[SRC], columns=["subj", "obj_value"]).to_pandas()
    assert list(sorted(df2.columns)) == ["obj_value", "subj"] and len(df2) == 40

    # full read (no preds) sees everything
    assert read_kg(store).count() == 120

    # unknown predicate -> typed empty, not an error
    assert read_kg(store, preds=["http://example.org/absent"]).count() == 0


def test_crashed_build_is_invisible_and_rebuilt(ray_session, tmp_path):
    store = str(tmp_path / "kg")
    persist_kg(_triples_ds(), store)

    # simulate a crash mid-rebuild: stale partial data, NO sentinel
    os.remove(os.path.join(store, "_meta.json"))
    stray = os.path.join(store, "triples", "pred_key=zzz_stale")
    os.makedirs(stray)
    with open(os.path.join(stray, "junk.parquet"), "w") as f:
        f.write("not parquet")

    assert not store_is_complete(store)
    with pytest.raises(FileNotFoundError):
        read_kg(store)

    # rebuild clears the stale generation entirely
    meta = persist_kg(_triples_ds(), store)
    assert "zzz_stale" not in meta["partitions"]
    assert not os.path.exists(stray)
    assert read_kg(store).count() == 120
    with open(os.path.join(store, "_meta.json")) as f:
        assert json.load(f) == meta
