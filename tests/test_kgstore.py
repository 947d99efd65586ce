"""Persisted predicate-partitioned triple store (stages/kgstore.py):
layout, pruned reads, residual filtering, generational updates, and
crash/snapshot semantics."""

import json
import os

import pyarrow as pa
import pytest

from rdfa_ray.stages.kgstore import (
    persist_kg,
    pred_key,
    read_kg,
    store_is_complete,
    update_kg,
)

SRC = "http://schema.org/source"
LANG = "http://schema.org/inLanguage"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_pylist(
            [{"subj": s, "pred": p, "obj_value": o} for s, p, o in rows]
        )
    )


def _triples_ds():
    rows = []
    for i in range(40):
        s = "http://example.org/doc/%d" % i
        rows.append((s, SRC, "src%d" % (i % 3)))
        rows.append((s, LANG, ("zh", "en")[i % 2]))
        rows.append((s, TYPE, "http://schema.org/Document"))
    return _ds(rows)


def test_pred_key_deterministic_and_safe():
    k = pred_key(TYPE)
    assert k == pred_key(TYPE)
    assert all(c.isalnum() or c == "_" for c in k)
    assert pred_key(SRC) != pred_key(LANG)


def test_persist_prune_and_residual(ray_session, tmp_path):
    store = str(tmp_path / "kg")
    meta = persist_kg(_triples_ds(), store)
    assert store_is_complete(store)
    assert meta["generation"] == 1
    assert sorted(meta["partitions"]) == sorted(
        {pred_key(p) for p in (SRC, LANG, TYPE)}
    )
    # generation layout on disk: one directory per predicate token
    for token, rel in meta["partitions"].items():
        assert rel == os.path.join("parts", "%s-g1" % token)
        assert os.path.isdir(os.path.join(store, rel))

    # pruned read returns exactly the requested predicates' rows
    df = read_kg(store, preds=[LANG]).to_pandas()
    assert set(df["pred"]) == {LANG} and len(df) == 40

    # column pruning keeps the residual filter working, drops pred after
    df2 = read_kg(store, preds=[SRC], columns=["subj", "obj_value"]).to_pandas()
    assert sorted(df2.columns) == ["obj_value", "subj"] and len(df2) == 40

    # full read (no preds) sees everything
    assert read_kg(store).count() == 120

    # unknown predicate -> typed empty, not an error
    assert read_kg(store, preds=["http://example.org/absent"]).count() == 0


def test_update_rewrites_only_touched_partitions(ray_session, tmp_path):
    store = str(tmp_path / "kg")
    persist_kg(_triples_ds(), store)

    # vocabulary migration: zh -> zh-Hans (deletes + inserts, one pred)
    zh_docs = ["http://example.org/doc/%d" % i for i in range(0, 40, 2)]
    meta = update_kg(
        store,
        insert_ds=_ds([(d, LANG, "zh-Hans") for d in zh_docs]),
        delete_ds=_ds([(d, LANG, "zh") for d in zh_docs]),
    )
    assert meta["generation"] == 2
    # ONLY the language partition moved to g2; the others still point
    # at their g1 directories (carried by reference, not rewritten)
    assert meta["partitions"][pred_key(LANG)].endswith("-g2")
    assert meta["partitions"][pred_key(SRC)].endswith("-g1")
    assert meta["partitions"][pred_key(TYPE)].endswith("-g1")

    langs = read_kg(store, preds=[LANG]).to_pandas()
    assert set(langs["obj_value"]) == {"zh-Hans", "en"}
    assert len(langs) == 40
    assert read_kg(store).count() == 120

    # empty delta is a no-op returning the current manifest
    assert update_kg(store)["generation"] == 2

    # inserting a NEW predicate creates a partition without touching others
    meta3 = update_kg(
        store, insert_ds=_ds([("http://example.org/doc/0", "http://schema.org/about", "e1")])
    )
    assert meta3["partitions"][pred_key("http://schema.org/about")].endswith("-g3")
    assert read_kg(store, preds=["http://schema.org/about"]).count() == 1
    assert read_kg(store).count() == 121


def test_crashed_build_is_invisible_and_rebuilt(ray_session, tmp_path):
    store = str(tmp_path / "kg")
    persist_kg(_triples_ds(), store)

    # simulate a crash mid-rebuild: stale partial data, NO manifest
    os.remove(os.path.join(store, "_meta.json"))
    stray = os.path.join(store, "parts", "zzz_stale-g9")
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


def test_crashed_update_preserves_snapshot(ray_session, tmp_path):
    store = str(tmp_path / "kg")
    persist_kg(_triples_ds(), store)
    before = json.load(open(os.path.join(store, "_meta.json")))

    # a crashed update leaves new generation dirs but the OLD manifest
    stray = os.path.join(store, "parts", "%s-g2" % pred_key(LANG))
    os.makedirs(stray)
    with open(os.path.join(stray, "halfwritten.parquet"), "w") as f:
        f.write("not parquet")

    after = json.load(open(os.path.join(store, "_meta.json")))
    assert after == before  # manifest untouched -> old snapshot intact
    langs = read_kg(store, preds=[LANG]).to_pandas()
    assert set(langs["obj_value"]) == {"zh", "en"} and len(langs) == 40


def test_vacuum_removes_only_unreferenced(ray_session, tmp_path):
    from rdfa_ray.stages.kgstore import vacuum_store

    store = str(tmp_path / "kg")
    persist_kg(_triples_ds(), store)
    zh = ["http://example.org/doc/%d" % i for i in range(0, 40, 2)]
    update_kg(
        store,
        insert_ds=_ds([(d, LANG, "zh-Hans") for d in zh]),
        delete_ds=_ds([(d, LANG, "zh") for d in zh]),
    )
    # superseded g1 language partition exists until vacuumed
    stale = os.path.join("parts", "%s-g1" % pred_key(LANG))
    assert os.path.isdir(os.path.join(store, stale))
    removed = vacuum_store(store)
    assert removed == [stale]
    assert not os.path.isdir(os.path.join(store, stale))
    # current snapshot unaffected
    assert read_kg(store).count() == 120
    assert vacuum_store(store) == []


def test_quad_store_passthrough(ray_session, tmp_path):
    """Extra columns (named graph) persist and read back pruned; the
    update path auto-detects quad stores — a graph-less delta targets
    the DEFAULT graph '' (SPARQL Update's rule for triples outside any
    GRAPH block), so named-graph rows are untouched by it."""
    import ray.data as rd

    rows = [
        {"subj": "s%d" % i, "pred": (SRC, LANG)[i % 2], "obj_value": "o%d" % i,
         "graph": "g%d" % (i % 2)}
        for i in range(10)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    store = str(tmp_path / "kg")
    persist_kg(ds, store)

    back = read_kg(store, preds=[LANG]).to_pandas()
    assert len(back) == 5 and set(back["graph"]) == {"g1"}
    assert sorted(back.columns) == ["graph", "obj_value", "pred", "subj"]

    # graph-less delete: keys on ('', s1, LANG, o1) — no default-graph
    # rows exist, so the named-graph row survives
    update_kg(store, delete_ds=_ds([("s1", LANG, "o1")]))
    assert len(read_kg(store, preds=[LANG]).to_pandas()) == 5
    # quad delete hits the named row
    qdel = rd.from_arrow(
        pa.Table.from_pylist(
            [{"subj": "s1", "pred": LANG, "obj_value": "o1", "graph": "g1"}]
        )
    )
    update_kg(store, delete_ds=qdel)
    after = read_kg(store, preds=[LANG]).to_pandas()
    assert len(after) == 4 and "s1" not in set(after["subj"])
    # graph-less insert lands in the default graph ''
    update_kg(store, insert_ds=_ds([("sX", LANG, "oX")]))
    df = read_kg(store, preds=[LANG]).to_pandas()
    assert set(df[df["subj"] == "sX"]["graph"]) == {""}


@pytest.mark.parametrize("seed", range(4))
def test_randomized_store_roundtrip_and_update(ray_session, tmp_path, seed):
    """Random triple sets: persist -> read is the identity; a random
    update equals set algebra ((current - deletes) | inserts)."""
    import random

    import ray.data as rd

    rng = random.Random(9000 + seed)
    preds = ["http://ex.org/p%d" % i for i in range(3)]

    def rand_rows(n):
        return sorted(
            {
                ("s%d" % rng.randrange(6), rng.choice(preds), "v%d" % rng.randrange(5))
                for _ in range(n)
            }
        )

    base = rand_rows(rng.randrange(4, 25))
    store = str(tmp_path / ("kg%d" % seed))
    persist_kg(_ds(base), store)
    back = sorted(
        map(tuple, read_kg(store).to_pandas()[["subj", "pred", "obj_value"]]
            .to_records(index=False).tolist())
    )
    assert back == base

    deletes = rand_rows(rng.randrange(1, 8))
    inserts = rand_rows(rng.randrange(1, 8))
    update_kg(store, insert_ds=_ds(inserts), delete_ds=_ds(deletes))
    want = sorted((set(base) - set(deletes)) | set(inserts))
    got = sorted(
        map(tuple, read_kg(store).to_pandas()[["subj", "pred", "obj_value"]]
            .to_records(index=False).tolist())
    )
    assert got == want


def test_vacuum_after_n_updates_store_stays_correct(ray_session, tmp_path):
    # VERDICT r3 item 5 "done" shape: N generational updates, vacuum,
    # re-query — every superseded generation dir is gone, the current
    # snapshot is byte-identical to before the vacuum
    from rdfa_ray.stages.kgstore import vacuum_store

    store = str(tmp_path / "kg")
    persist_kg(_triples_ds(), store)
    for gen in range(2, 6):  # 4 updates touching two partitions each
        docs = ["http://example.org/doc/%d" % i for i in range(gen, 40, 5)]
        update_kg(
            store,
            insert_ds=_ds(
                [(d, LANG, "lang-g%d" % gen) for d in docs]
                + [(d, SRC, "src-g%d" % gen) for d in docs]
            ),
        )
    before = read_kg(store).to_pandas()
    before_key = sorted(map(tuple, before.to_numpy().tolist()))

    parts_dir = os.path.join(store, "parts")
    all_dirs = set(os.listdir(parts_dir))
    live = set(
        os.path.basename(rel)
        for rel in json.load(open(os.path.join(store, "_meta.json")))[
            "partitions"
        ].values()
    )
    stale = all_dirs - live
    assert len(stale) >= 4  # each update superseded at least one dir

    removed = vacuum_store(store)
    assert {os.path.basename(r) for r in removed} == stale
    assert set(os.listdir(parts_dir)) == live  # old generation dirs GONE

    after = read_kg(store).to_pandas()
    after_key = sorted(map(tuple, after.to_numpy().tolist()))
    assert after_key == before_key  # re-query: snapshot unchanged
    # store still updatable after vacuum
    update_kg(store, insert_ds=_ds([("http://example.org/doc/0", SRC, "post")]))
    assert ("http://example.org/doc/0", SRC, "post") in {
        tuple(r) for r in read_kg(store, preds=[SRC]).to_pandas().to_numpy()
    }


def test_rebuild_over_complete_store_is_crash_safe(ray_session, tmp_path):
    """persist_kg over a COMPLETE store must not touch the live
    generation's directories: the rebuild lands in a fresh generation
    and only the final manifest swap makes it visible (round-5 fix —
    the gen-1 rebuild used to rmtree live dirs in place)."""
    import glob

    store = str(tmp_path / "kg")
    from rdfa_ray.stages.kgstore import vacuum_store

    persist_kg(_ds([("s1", "p", "o1"), ("s2", "p", "o2")]), store)
    meta1 = json.load(open(os.path.join(store, "_meta.json")))
    old_dirs = set(glob.glob(os.path.join(store, "parts", "*")))
    assert meta1["generation"] == 1

    persist_kg(_ds([("x", "q", "y")]), store)
    meta2 = json.load(open(os.path.join(store, "_meta.json")))
    assert meta2["generation"] == 2
    # the old generation's directories still exist untouched (crash
    # safety: a die before the manifest swap leaves gen 1 fully valid)
    assert old_dirs <= set(glob.glob(os.path.join(store, "parts", "*")))
    out = read_kg(store).to_pandas()
    assert sorted(out["subj"]) == ["x"]
    # vacuum reclaims the superseded generation
    vacuum_store(store)
    assert not (old_dirs & set(glob.glob(os.path.join(store, "parts", "*"))))


def test_read_kg_projection_exact_and_quad_form_guard(ray_session, tmp_path):
    import pytest

    store = str(tmp_path / "kg")
    persist_kg(_ds([("s", "p", "o")]), store)
    # plain projection returns exactly the requested columns
    assert read_kg(store, columns=["subj"]).to_pandas().columns.tolist() == ["subj"]
    # forcing quad mode against a non-empty triple store refuses even
    # when the delta's predicates are all NEW (round-5 fix)
    import pyarrow as pa
    import ray.data as rd

    quad_delta = rd.from_arrow(
        pa.table({"subj": ["a"], "pred": ["newp"], "obj_value": ["b"],
                  "graph": ["g1"]})
    )
    with pytest.raises(ValueError, match="non-empty"):
        update_kg(store, insert_ds=quad_delta, quads=True)
