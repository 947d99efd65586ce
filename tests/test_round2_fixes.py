"""Regression tests for the round-2 correctness/scale fixes
(VERDICT.md "Next round" + ADVICE.md items)."""

import zlib

import pandas as pd
import pyarrow as pa
import pytest

from rdfa_ray.functions.hashing import crc32_bucket, crc32_bucket_concat
from rdfa_ray.kernel import KernelOptions, distill
from rdfa_ray.kernel.walk import extract_hturtle
from rdfa_ray.rdf.terms import iri


# ---------------------------------------------------------------------------
# ADVICE high: fast-path must not drop uppercase / spaced-attribute markup


def test_fastpath_uppercase_attributes():
    triples, _ = distill(
        '<DIV VOCAB="http://schema.org/" ABOUT="#x">'
        '<SPAN PROPERTY="name">Alpha</SPAN></DIV>',
        base="http://b.example/",
    )
    assert any(p == iri("http://schema.org/name") for (_, p, _) in triples)


def test_fastpath_spaced_equals():
    # legal HTML: whitespace around '='; round-1 markers required 'rel='
    triples, _ = distill(
        '<div prefix = "cc: http://creativecommons.org/ns#" about = "#w">'
        '<a rel = "cc:license" href = "http://l.example/x">l</a></div>',
        base="http://b.example/",
    )
    assert any(p == iri("http://creativecommons.org/ns#license") for (_, p, _) in triples)


def test_fastpath_uppercase_turtle_script():
    # prefilter is case-insensitive; the attribute-value match itself
    # stays case-sensitive (reference embeddedRDF.py semantics)
    text = (
        '<SCRIPT type="text/turtle">@prefix ex: <http://e/> .'
        " <http://s/> ex:p 1 .</SCRIPT>"
    )
    triples, _ = extract_hturtle(text, base="http://b.example/")
    assert len(triples) == 1


def test_plain_prose_still_fastpaths():
    triples, diags = distill("just some plain prose with no markup", base="http://b/")
    assert triples == set() and diags == []


# ---------------------------------------------------------------------------
# ADVICE medium: join how-validation


def test_bucketed_join_rejects_unknown_mode(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.join import bucketed_hash_join

    l = rd.from_items([{"k": 1, "x": "a"}])
    r = rd.from_items([{"k": 1, "y": "b"}])
    # outer/right became supported in round 3; unknown modes still fail
    with pytest.raises(ValueError):
        bucketed_hash_join(l, r, on="k", how="cross")


# ---------------------------------------------------------------------------
# ADVICE low: empty alias table must not crash the linker


def test_entity_linker_empty_aliases():
    from rdfa_ray.stages.link import EntityLinker

    linker = EntityLinker(alias_table={})
    batch = pa.Table.from_pydict(
        {
            "conv_id": ["c"], "turn_idx": pa.array([0], pa.int32()),
            "kind": ["triple"], "subj": pa.array(["http://s/"], pa.large_string()),
            "subj_kind": ["iri"], "pred": pa.array(["http://p/"], pa.large_string()),
            "obj_value": pa.array(["Hello, world! (punctuated)"], pa.large_string()),
            "obj_kind": ["literal"], "obj_lang": pa.array([None], pa.string()),
            "obj_datatype": pa.array([None], pa.string()), "graph": ["g"],
        }
    )
    out = linker(batch)
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# ADVICE low: vocab expansion keeps document-asserted schema triples


def test_vocab_expansion_keeps_doc_asserted_schema_triple():
    from rdfa_ray.kernel.vocab import SUB_PROP, USES_VOCAB, process_rdfa_sem

    p1, p2, p3 = iri("http://v/p1"), iri("http://v/p2"), iri("http://v/p3")
    vocab = {(p1, SUB_PROP, p2), (p2, SUB_PROP, p3)}
    opts = KernelOptions(vocab_expansion=True, vocab_graphs={"http://v/": vocab})
    opts.diagnostics = []
    s = iri("http://d/s")
    # the document asserts (p1 subPropertyOf p3) — derivable from the
    # vocab closure, but NOT a vocab triple: it must survive
    graph = {
        (s, USES_VOCAB, iri("http://v/")),
        (s, p1, iri("http://d/o")),
        (p1, SUB_PROP, p3),
    }
    out = process_rdfa_sem(graph, opts)
    assert (p1, SUB_PROP, p3) in out
    # expansion itself still runs: p1 edge implies p2 and p3 edges
    assert (s, p2, iri("http://d/o")) in out
    assert (s, p3, iri("http://d/o")) in out


# ---------------------------------------------------------------------------
# vectorized bucket keys: bit-identical to the per-row crc32 list-comp


def test_crc32_bucket_matches_per_row():
    vals = ["conv%08d" % (i % 7) for i in range(100)] + [""]
    col = pa.array(vals)
    got = crc32_bucket(col, 64).to_pylist()
    want = [zlib.crc32(v.encode()) % 64 for v in vals]
    assert got == want


def test_crc32_bucket_int_matches_str_of():
    col = pa.array([1, 22, 333], pa.int64())
    got = crc32_bucket(col, 16).to_pylist()
    want = [zlib.crc32(str(v).encode()) % 16 for v in [1, 22, 333]]
    assert got == want


def test_crc32_bucket_concat_deterministic():
    t = pa.table({"a": ["x", "y"], "b": [1, 2]})
    one = crc32_bucket_concat(t, ["a", "b"], 32).to_pylist()
    two = crc32_bucket_concat(t, ["a", "b"], 32).to_pylist()
    assert one == two and len(one) == 2


# ---------------------------------------------------------------------------
# distributed distinct helper


def test_distinct_matches_set(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.distinct import distinct

    rows = [{"x": "k%d" % (i % 13), "y": i % 5} for i in range(200)]
    ds = rd.from_items(rows, override_num_blocks=8)
    got = distinct(ds, ["x", "y"]).to_pandas()
    want = {(r["x"], r["y"]) for r in rows}
    assert set(zip(got["x"], got["y"])) == want
    assert len(got) == len(want)


def test_distinct_extra_min_semantics(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.distinct import distinct

    rows = [
        {"k": "a", "m": "star"},
        {"k": "a", "m": "full"},
        {"k": "b", "m": "star"},
    ]
    ds = rd.from_items(rows, override_num_blocks=3)
    got = distinct(ds, ["k"], extra=["m"]).to_pandas().sort_values("k")
    assert list(got["k"]) == ["a", "b"]
    assert list(got["m"]) == ["full", "star"]  # 'full' < 'star' wins


def test_distinct_extra_min_is_row_wise(ray_session):
    # two extras that differ WITHIN one block: the surviving pair must
    # be an actual input row's tuple (row-wise lexicographic min), not
    # independent per-column mins ('b','1' was never a row)
    import ray.data as rd

    from rdfa_ray.stages.distinct import distinct

    rows = [
        {"k": "a", "m": "z", "n": "1"},
        {"k": "a", "m": "b", "n": "9"},
    ]
    ds = rd.from_items(rows, override_num_blocks=1)
    got = distinct(ds, ["k"], extra=["m", "n"]).to_pandas()
    assert len(got) == 1
    assert (got["m"].iloc[0], got["n"].iloc[0]) == ("b", "9")


# ---------------------------------------------------------------------------
# star pairs for degenerate LSH buckets (no silent truncation)


def test_bucket_pairs_star_mode_covers_all_ids():
    from rdfa_ray.stages.dedup import BUCKET_CAP, _bucket_pairs

    n = BUCKET_CAP + 25
    group = pd.DataFrame({"doc_id": list(range(n))})
    out = _bucket_pairs(group)
    assert set(out["pair_mode"]) == {"star"}
    assert len(out) == n - 1  # O(n), not O(n^2), and nobody dropped
    assert set(out["b"]) == set(range(1, n))
    assert (out["a"] == 0).all()


def test_bucket_pairs_full_mode_small_bucket():
    from rdfa_ray.stages.dedup import _bucket_pairs

    out = _bucket_pairs(pd.DataFrame({"doc_id": [3, 1, 2]}))
    assert set(out["pair_mode"]) == {"full"}
    assert set(zip(out["a"], out["b"])) == {(1, 2), (1, 3), (2, 3)}


def test_minhash_dedup_large_duplicate_group(ray_session):
    """60 identical docs (> BUCKET_CAP): every doc must stay connected
    to the keeper — round-1 truncated docs 51+ out of every bucket."""
    import ray.data as rd

    from rdfa_ray.stages.dedup import minhash_dedup

    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [{"doc_id": i, "text": text} for i in range(60)]
    rows += [{"doc_id": 1000 + i, "text": "totally different content %d here" % i}
             for i in range(20)]
    ds = rd.from_items(rows, override_num_blocks=4)
    pairs = minhash_dedup(ds, threshold=0.8).to_pandas()
    linked = set(pairs["a"]) | set(pairs["b"])
    assert set(range(60)) <= linked
    assert (pairs["jaccard"] >= 0.8).all()
    assert "star" in set(pairs["pair_mode"])
    # no unrelated doc got pulled in
    assert not ({1000 + i for i in range(20)} & linked)


# ---------------------------------------------------------------------------
# flagship sink: Arrow-native N-Quads + input-sized partitions


def test_nquads_arrow_matches_row_formatter():
    from rdfa_ray.rdf.ntriples import nquads_lines_arrow, term_to_nt

    rows = [
        ("http://s/1", "iri", "http://p/", 'va"l\\ue\nx\tb', "literal", None, None, "http://g/"),
        ("http://s/2", "iri", "http://p/", "plain", "literal", "en", None, "http://g/"),
        ("http://s/3", "iri", "http://p/", "42", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer", "http://g/"),
        ("b0", "bnode", "http://p/", "http://o/", "iri", None, None, "http://g/"),
        ("http://s/4", "iri", "http://p/", "b1", "bnode", None, None, "http://g/"),
    ]
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.large_string()),
            "subj_kind": [r[1] for r in rows],
            "pred": pa.array([r[2] for r in rows], pa.large_string()),
            "obj_value": pa.array([r[3] for r in rows], pa.large_string()),
            "obj_kind": [r[4] for r in rows],
            "obj_lang": pa.array([r[5] for r in rows], pa.string()),
            "obj_datatype": pa.array([r[6] for r in rows], pa.string()),
            "graph": [r[7] for r in rows],
        }
    )
    got = nquads_lines_arrow(t).to_pylist()
    for line, r in zip(got, rows):
        subj = ("iri", r[0]) if r[1] == "iri" else ("bnode", r[0])
        obj = ("lit", r[3], r[5], r[6]) if r[4] == "literal" else ((r[4] if r[4] != "literal" else "lit", r[3]))
        want = "%s <%s> %s <%s> ." % (
            term_to_nt(subj), r[2], term_to_nt(obj), r[7]
        )
        assert line == want, (line, want)


def test_flagship_auto_partitions_and_meta_pinning(ray_session, tmp_path_factory):
    import os, shutil

    from rdfa_ray.pipelines.flagship import load_run_meta, run_flagship
    from rdfa_ray.sources.transcripts import transcripts_dataset

    out = os.path.join(str(tmp_path_factory.getbasetemp()), "flag_auto")
    shutil.rmtree(out, ignore_errors=True)
    ds = transcripts_dataset(300, override_num_blocks=4)
    summary = run_flagship(ds, out, n_parts=None, rows_per_partition=100)
    meta = load_run_meta(out)
    # 300 turns / 100 per part = 3, clamped to MIN_PARTITIONS=16
    assert meta["n_parts"] == 16
    assert set(summary["part"]) <= set(range(16))
    # resume reuses the pinned count even with a conflicting argument
    s2 = run_flagship(
        transcripts_dataset(300, override_num_blocks=4), out, n_parts=99
    )
    assert len(s2) == 0  # nothing re-ran => same partition ids resolved


# ---------------------------------------------------------------------------
# design claim: the iterative walk survives nesting far beyond Python's
# recursion limit (SURVEY §4.3 — recursive reference would blow the stack)


def test_deep_nesting_beyond_recursion_limit():
    import sys

    depth = sys.getrecursionlimit() * 3
    doc = (
        '<div prefix="ex: http://e/">'
        + "<div>" * depth
        + '<span about="#leaf" property="ex:p">v</span>'
        + "</div>" * depth
        + "</div>"
    )
    triples, diags = distill(doc, base="http://deep.example/")
    assert (
        iri("http://deep.example/#leaf"),
        iri("http://e/p"),
        ("lit", "v", None, None),
    ) in triples
    assert not any(d.severity == "error" for d in diags)


def test_deep_nesting_xml_path():
    import sys

    depth = sys.getrecursionlimit() * 2
    doc = (
        '<?xml version="1.0"?><svg xmlns="http://www.w3.org/2000/svg">'
        + "<g>" * depth
        + '<text about="#t" property="http://e/p">v</text>'
        + "</g>" * depth
        + "</svg>"
    )
    triples, diags = distill(doc, base="http://deep.example/")
    # either parses fine (iterative converter) or fails SOFT with a
    # diagnostic — never a crash / RecursionError escape
    if triples:
        assert any(p == iri("http://e/p") for (_, p, _) in triples)
    else:
        assert any(d.severity == "error" for d in diags)


def test_resume_after_partial_failure_with_stray_tmps(ray_session, tmp_path_factory):
    """Crash simulation: several partitions missing their manifests plus
    stray .tmp files from an interrupted write — resume must rebuild
    exactly the missing partitions, byte-identical, and the strays must
    not leak into the final layout."""
    import os
    import shutil

    from rdfa_ray.pipelines.flagship import run_flagship
    from rdfa_ray.sources.transcripts import transcripts_dataset

    out = os.path.join(str(tmp_path_factory.getbasetemp()), "flag_crash")
    shutil.rmtree(out, ignore_errors=True)
    summary = run_flagship(
        transcripts_dataset(600, override_num_blocks=4), out, n_parts=8
    )
    parts = sorted(int(p) for p in summary["part"])
    assert len(parts) >= 4
    before = {
        p: open("%s/nt/part-%05d.nq" % (out, p)).read() for p in parts
    }

    victims = parts[:3]
    for p in victims:
        os.remove("%s/_manifest/part-%05d.json" % (out, p))
        # half-written artifacts of the "crashed" attempt
        with open("%s/nt/part-%05d.nq.tmp" % (out, p), "w") as f:
            f.write("GARBAGE")
        with open("%s/parquet/part-%05d.parquet.tmp" % (out, p), "w") as f:
            f.write("GARBAGE")

    s2 = run_flagship(
        transcripts_dataset(600, override_num_blocks=4), out, n_parts=8
    )
    assert sorted(int(p) for p in s2["part"]) == victims
    for p in parts:
        assert open("%s/nt/part-%05d.nq" % (out, p)).read() == before[p]
    # the atomic rename consumed the garbage tmps for the victims and
    # the final files are valid again
    import pyarrow.parquet as pq

    for p in victims:
        assert not os.path.exists("%s/nt/part-%05d.nq.tmp" % (out, p))
        assert not os.path.exists("%s/parquet/part-%05d.parquet.tmp" % (out, p))
        pq.read_table("%s/parquet/part-%05d.parquet" % (out, p))


def test_resume_refuses_without_pinned_meta(ray_session, tmp_path_factory):
    """Completed manifests but no meta.json (pre-pinning run / deleted
    meta): re-deriving n_parts would silently drop conversations, so
    resume must refuse unless the caller re-asserts n_parts."""
    import os
    import shutil

    import pytest

    from rdfa_ray.pipelines.flagship import run_flagship
    from rdfa_ray.sources.transcripts import transcripts_dataset

    out = os.path.join(str(tmp_path_factory.getbasetemp()), "flag_nometa")
    shutil.rmtree(out, ignore_errors=True)
    run_flagship(transcripts_dataset(200, override_num_blocks=2), out, n_parts=4)
    os.remove("%s/_manifest/meta.json" % out)

    with pytest.raises(RuntimeError, match="meta.json is missing"):
        run_flagship(transcripts_dataset(200, override_num_blocks=2), out)

    # explicit n_parts re-pins and resumes cleanly (nothing left to do)
    s2 = run_flagship(
        transcripts_dataset(200, override_num_blocks=2), out, n_parts=4
    )
    assert len(s2) == 0
    assert os.path.exists("%s/_manifest/meta.json" % out)


def test_vocab_malformed_triples_diagnosed_not_crashed():
    # reference records unparseable vocab docs as processor-graph errors
    # and continues (rdfs/cache.py:186-211); config-fed analogue
    from rdfa_ray.kernel.vocab import SUB_PROP, USES_VOCAB, process_rdfa_sem

    p1, p2 = iri("http://v/p1"), iri("http://v/p2")
    vocab = {(p1, SUB_PROP, p2), ("not-a-term", "nope"), (p1, p2)}
    opts = KernelOptions(vocab_expansion=True, vocab_graphs={"http://v/": vocab})
    opts.diagnostics = []
    s = iri("http://d/s")
    graph = {(s, USES_VOCAB, iri("http://v/")), (s, p1, iri("http://d/o"))}
    out = process_rdfa_sem(graph, opts)
    assert (s, p2, iri("http://d/o")) in out  # valid triple still expands
    assert any(
        "malformed" in d.message and "VocabReferenceError" in str(d.dclass)
        for d in opts.diagnostics
    )


def test_vocab_memo_generation_refresh():
    from rdfa_ray.kernel import vocab as V

    p1, p2, p3 = iri("http://v/p1"), iri("http://v/p2"), iri("http://v/p3")
    s = iri("http://d/s")

    def run(vocab_triples, gen):
        opts = KernelOptions(
            vocab_expansion=True,
            vocab_graphs={"http://v/": vocab_triples},
            vocab_cache_generation=gen,
        )
        opts.diagnostics = []
        g = {(s, V.USES_VOCAB, iri("http://v/")), (s, p1, iri("http://d/o"))}
        return V.process_rdfa_sem(g, opts)

    V._EXPANSION_MEMO.clear()
    out1 = run({(p1, V.SUB_PROP, p2)}, 0)
    assert (s, p2, iri("http://d/o")) in out1
    assert len(V._EXPANSION_MEMO) == 1
    # same generation, same content -> memo reused (no new entry)
    run({(p1, V.SUB_PROP, p2)}, 0)
    assert len(V._EXPANSION_MEMO) == 1
    # changed content is keyed independently (no cross-contamination)
    out2 = run({(p1, V.SUB_PROP, p3)}, 0)
    assert (s, p3, iri("http://d/o")) in out2
    assert (s, p2, iri("http://d/o")) not in out2
    assert len(V._EXPANSION_MEMO) == 2
    # generation bump = explicit refresh: new entry even for same content
    run({(p1, V.SUB_PROP, p2)}, 1)
    assert len(V._EXPANSION_MEMO) == 3


def test_join_preserves_int64_above_2_53(ray_session):
    """Null-padding in the tagged union must not decay int64 non-key
    columns to float64 (2^53+1 would silently become 2^53) — round-5
    fix: masked integer dtypes through the per-bucket merge."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.join import bucketed_hash_join

    big = 2**53 + 1
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([big, big + 2], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "r": pa.array([10, 20, 30], pa.int64())})
    )
    out = bucketed_hash_join(
        left, right, on="k", n_buckets=2, how="inner",
        left_schema=pa.schema([("k", pa.int64()), ("payload", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("r", pa.int64())]),
    ).to_pandas().sort_values("k")
    assert list(out["payload"]) == [big, big + 2]  # bit-exact
    # outer join: the padded row really is null, not NaN-coerced junk
    outer = bucketed_hash_join(
        left, right, on="k", n_buckets=2, how="outer",
        left_schema=pa.schema([("k", pa.int64()), ("payload", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("r", pa.int64())]),
    ).to_pandas()
    assert outer.loc[outer["k"] == 3, "payload"].isna().all()


def test_salt_with_left_distinct_refused(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from rdfa_ray.stages.join import bucketed_hash_join

    ds = rd.from_items([{"k": 1, "g": 1, "extra": i} for i in range(4)])
    with pytest.raises(ValueError, match="left_distinct"):
        bucketed_hash_join(
            ds, ds, on="k", salt=4, left_distinct=["k", "g"],
            left_schema=pa.schema([("k", pa.int64()), ("g", pa.int64()),
                                   ("extra", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("g", pa.int64()),
                                    ("extra", pa.int64())]),
        )
