"""Serialization sinks beyond N-Quads/Parquet: Turtle and JSON-LD
(SURVEY.md §2.1 S5; reference ``pyRdfaExtras/serializers/``).

Ray shape: a stateless ``map_batches`` kernel that renders one
serialized document per graph.  No shuffle is needed — the distiller
emits a turn's rows contiguously within its output block, so a
batch-local pandas groupby(graph) sees every graph whole.  (If the
input has been re-partitioned on another key, pass it through
``groupby("graph")`` first — documented partitioning assumption.)

The serializer object (prefix tables, regexes) is built once per
worker and cached — actor-pool-style state without reserving CPUs.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..rdf.jsonld import JsonLdSerializer
from ..rdf.rdfxml import RdfXmlSerializer
from ..rdf.terms import BNODE, IRI, literal
from ..rdf.turtle import TurtleSerializer

SERIALIZED_SCHEMA = pa.schema(
    [
        ("graph", pa.string()),
        ("text", pa.large_string()),
        ("n_triples", pa.int64()),
    ]
)


def rows_to_terms(df: pd.DataFrame):
    """Triple rows (subj, subj_kind, pred, obj_value, obj_kind,
    obj_lang, obj_datatype) -> iterable of term-tuple triples."""
    for s, sk, p, ov, ok, lang, dt in zip(
        df["subj"], df["subj_kind"], df["pred"], df["obj_value"],
        df["obj_kind"], df["obj_lang"], df["obj_datatype"],
    ):
        subj = (IRI, s) if sk == "iri" else (BNODE, s)
        if ok == "literal":
            obj = literal(ov, lang if isinstance(lang, str) and lang else None,
                          dt if isinstance(dt, str) and dt else None)
        elif ok == "bnode":
            obj = (BNODE, ov)
        else:
            obj = (IRI, ov)
        yield (subj, (IRI, p), obj)


class NTriplesSerializer:
    """Adapter giving the line-oriented N-Triples writer the same
    ``.serialize(triples)`` surface as the structured serializers."""

    def serialize(self, triples) -> str:
        from ..rdf.ntriples import graph_to_ntriples

        return graph_to_ntriples(triples)


_SERIALIZERS = {
    "turtle": TurtleSerializer,
    "jsonld": JsonLdSerializer,
    "pretty-xml": RdfXmlSerializer,
    "nt": NTriplesSerializer,
}
_CACHE: dict = {}


def serialize_batch(batch: pa.Table, fmt: str = "turtle") -> pa.Table:
    """map_batches kernel: triple rows -> one serialized doc per graph."""
    ser = _CACHE.get(fmt)
    if ser is None:
        ser = _SERIALIZERS[fmt]()
        _CACHE[fmt] = ser
    df = batch.select(
        ["graph", "subj", "subj_kind", "pred", "obj_value", "obj_kind",
         "obj_lang", "obj_datatype"]
    ).to_pandas()
    graphs, texts, counts = [], [], []
    for g, sub in df.groupby("graph", sort=False):
        triples = set(rows_to_terms(sub))
        graphs.append(g)
        texts.append(ser.serialize(triples))
        counts.append(len(triples))
    return pa.Table.from_pydict(
        {"graph": graphs, "text": texts,
         "n_triples": pa.array(counts, pa.int64())},
        schema=SERIALIZED_SCHEMA,
    )


def serialize_graphs(triples_ds, fmt: str = "turtle"):
    """Triples Dataset -> (graph, text, n_triples) Dataset."""
    return triples_ds.map_batches(
        lambda b: serialize_batch(b, fmt), batch_format="pyarrow"
    )
