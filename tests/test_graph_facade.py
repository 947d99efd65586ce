"""rdflib-Graph facade (rdfa_ray/graph.py): pattern iteration,
wildcards, term-kind recovery on minimal layouts, len() set
semantics, value()/contains, add/remove composition, serialize
round-trip, query passthrough, store-mutation refusal."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.graph import Graph
from rdfa_ray.rdf.terms import bnode, iri, literal

EX = "http://ex.org/"


def _full_ds():
    rows = [
        # (subj, subj_kind, pred, obj_value, obj_kind, obj_lang, obj_datatype)
        (EX + "a", "iri", EX + "p", EX + "b", "iri", None, None),
        (EX + "a", "iri", EX + "q", "hello", "literal", "en", None),
        (EX + "a", "iri", EX + "q", "42", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("n0", "bnode", EX + "p", EX + "a", "iri", None, None),
        # duplicate row: len() must count it once
        (EX + "a", "iri", EX + "p", EX + "b", "iri", None, None),
    ]
    cols = ["subj", "subj_kind", "pred", "obj_value", "obj_kind",
            "obj_lang", "obj_datatype"]
    return rd.from_pandas(pd.DataFrame(rows, columns=cols))


def test_triples_wildcards_and_constants(ray_session):
    g = Graph(_full_ds())
    allt = list(g.triples())
    assert len(allt) == 5  # bag semantics on iteration
    assert set(allt) == {
        (iri(EX + "a"), iri(EX + "p"), iri(EX + "b")),
        (iri(EX + "a"), iri(EX + "q"), literal("hello", "en")),
        (iri(EX + "a"), iri(EX + "q"),
         literal("42", None, "http://www.w3.org/2001/XMLSchema#integer")),
        (bnode("n0"), iri(EX + "p"), iri(EX + "a")),
    }
    # string shorthand for IRIs; literal constants match lang/datatype
    assert len(list(g.triples((EX + "a", EX + "q", None)))) == 2
    assert list(g.triples((None, EX + "q", literal("hello", "en"))))
    assert not list(g.triples((None, EX + "q", literal("hello"))))  # lang differs


def test_len_contains_value(ray_session):
    g = Graph(_full_ds())
    assert len(g) == 4  # distinct triples
    assert (EX + "a", EX + "p", EX + "b") in g
    assert (EX + "b", EX + "p", EX + "a") not in g
    assert g.value(subject=EX + "a", predicate=EX + "p") == iri(EX + "b")
    assert g.value(predicate=EX + "p", object=EX + "a") == bnode("n0")
    assert g.value(subject=EX + "z", predicate=EX + "p", default="dflt") == "dflt"
    with pytest.raises(ValueError):
        g.value(subject=EX + "a")


def test_iterators(ray_session):
    g = Graph(_full_ds())
    assert set(g.subjects(predicate=EX + "p")) == {iri(EX + "a"), bnode("n0")}
    assert set(g.objects(subject=EX + "a", predicate=EX + "q")) == {
        literal("hello", "en"),
        literal("42", None, "http://www.w3.org/2001/XMLSchema#integer"),
    }
    assert set(g.predicate_objects(subject="n0")) == set()  # "n0" is not a bnode ref
    assert set(g.predicate_objects(subject=bnode("n0"))) == {
        (iri(EX + "p"), iri(EX + "a"))
    }


def test_minimal_layout_kind_recovery(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["_:x", EX + "a"],
                "pred": [EX + "p", EX + "p"],
                "obj_value": [EX + "a", "plain text"],
            }
        )
    )
    g = Graph(ds)
    assert set(g.triples()) == {
        (bnode("x"), iri(EX + "p"), iri(EX + "a")),
        (iri(EX + "a"), iri(EX + "p"), literal("plain text")),
    }


def test_add_remove(ray_session):
    g = Graph(_full_ds())
    g.add((EX + "new", EX + "p", literal("v")))
    g.add((EX + "new", EX + "p", literal("v")))  # set-add: no-op
    assert len(g) == 5
    g.remove((None, EX + "q", None))
    assert len(g) == 3
    assert not list(g.triples((None, EX + "q", None)))
    # removing then re-adding works
    g.remove((EX + "new", None, None))
    assert len(g) == 2


def test_empty_graph_and_serialize(ray_session):
    g = Graph()
    assert len(g) == 0
    g.add((EX + "s", EX + "p", EX + "o"))
    nt = g.serialize("nt")
    assert "<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> ." in nt
    ttl = g.serialize("turtle")
    assert "ex.org/s" in ttl
    with pytest.raises(ValueError):
        g.serialize("n3-unsupported")


def test_query_passthrough(ray_session):
    g = Graph(_full_ds())
    out = g.query(
        "SELECT ?o WHERE { <%sa> <%sp> ?o }" % (EX, EX)
    ).to_pandas()
    assert sorted(out["o"]) == [EX + "b", EX + "b"]


def test_store_mutation_refused(ray_session, tmp_path):
    g = Graph(str(tmp_path / "nostore"))
    with pytest.raises(ValueError, match="store-backed"):
        g.add((EX + "s", EX + "p", EX + "o"))
    with pytest.raises(ValueError, match="store-backed"):
        g.remove((None, None, None))


def test_store_backed_update_and_query(ray_session, tmp_path):
    import rdfa_ray
    from rdfa_ray.stages.kgstore import persist_kg

    ds = _full_ds()
    store = str(tmp_path / "kg")
    persist_kg(ds.map_batches(
        lambda t: t.select(["subj", "pred", "obj_value"]), batch_format="pyarrow"
    ), store)
    g = Graph(store)
    assert len(g) == 4
    assert (EX + "a", EX + "p", EX + "b") in g
    g.update('INSERT DATA { <%snew> <%sp> <%sb> }' % (EX, EX, EX))
    assert (EX + "new", EX + "p", EX + "b") in g
    assert len(g) == 5
    with pytest.raises(ValueError, match="store-backed"):
        Graph(_full_ds()).update("INSERT DATA { <x:a> <x:b> <x:c> }")
