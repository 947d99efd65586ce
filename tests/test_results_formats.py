"""W3C SPARQL 1.1 results serialization (rdf/results.py): JSON / CSV
/ TSV documents from SELECT result frames, term-kind recovery, tag
attachment, unbound handling, and spec escaping."""

import json

import pandas as pd

from rdfa_ray.rdf.results import (
    ask_json,
    results_csv,
    results_json,
    results_tsv,
    term_kind,
)

DF = pd.DataFrame(
    {
        "s": ["http://ex.org/a", "_:b0", "plain, text"],
        "o": ["10", "", 'quote " and\nnewline'],
        "o__lang": ["", "", "en"],
        "o__datatype": ["http://www.w3.org/2001/XMLSchema#integer", "", ""],
    }
)


def test_term_kind():
    assert term_kind("http://ex.org/a") == "uri"
    assert term_kind("urn:uuid:x") == "uri"
    assert term_kind("_:b1") == "bnode"
    assert term_kind("hello world") == "literal"
    assert term_kind("10") == "literal"
    assert term_kind("not a scheme: thing") == "literal"


def test_results_json_shape_and_tags():
    doc = json.loads(results_json(DF))
    assert doc["head"]["vars"] == ["s", "o"]  # metadata columns hidden
    b = doc["results"]["bindings"]
    assert b[0]["s"] == {"type": "uri", "value": "http://ex.org/a"}
    assert b[0]["o"] == {
        "type": "literal",
        "value": "10",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    }
    assert b[1]["s"]["type"] == "bnode"
    assert "o" not in b[1]  # unbound ('' sentinel) -> key omitted
    assert b[2]["o"]["xml:lang"] == "en"


def test_ask_json():
    assert json.loads(ask_json(True)) == {"head": {}, "boolean": True}


def test_results_csv_quoting():
    doc = results_csv(DF)
    lines = doc.split("\r\n")
    assert lines[0] == "s,o"
    assert lines[1] == "http://ex.org/a,10"
    assert lines[2] == "_:b0,"
    # embedded comma and quote/newline per RFC 4180: the quoted field
    # keeps its raw newline, the quote doubles
    assert '"plain, text","quote "" and\nnewline"' in doc


def test_results_tsv_term_syntax():
    doc = results_tsv(DF)
    lines = doc.rstrip("\n").split("\n")
    assert lines[0] == "?s\t?o"
    assert lines[1] == '<http://ex.org/a>\t"10"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert lines[2] == "_:b0\t"
    assert lines[3].endswith('"quote \\" and\\nnewline"@en')


def test_end_to_end_from_engine(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.sparql_text import execute

    ds = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["http://d/1", "http://d/2"]),
                "pred": pa.array(["http://p"] * 2),
                "obj_value": pa.array(["x", "y"]),
            }
        )
    )
    df = execute(
        ds, "SELECT ?s ?o WHERE { ?s <http://p> ?o }", n_buckets=2
    ).to_pandas()
    doc = json.loads(results_json(df))
    assert len(doc["results"]["bindings"]) == 2
    assert {b["s"]["type"] for b in doc["results"]["bindings"]} == {"uri"}
