"""Distributed N-Triples / N-Quads file source.

The reference ecosystem reads N-Triples through rdflib's ntriples
plugin (``rdflib/plugins/parsers/ntriples.py``); here the same wire
format becomes a Ray Data source: ``ray.data.read_text`` streams the
files as line blocks (each line is one self-contained statement, so
ANY line partitioning is a valid record partitioning — this is why
N-Triples is the right interchange format at 100-TB scale, unlike
Turtle whose statements span lines), and a map task parses each block
with the engine's own reader (``rdf/ntriples.py``, the exact read-side
twin of the N-Quads sink in ``pipelines/flagship.py``).

Output schema matches the engine's internal triple layout:
(subj, subj_kind, pred, obj_value, obj_kind, obj_lang, obj_datatype,
graph) — N-Quads graph terms are preserved ('' for plain triples), so
a flagship N-Quads export reads back with its named graphs intact.
"""

from __future__ import annotations

import pyarrow as pa

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("subj_kind", pa.string()),
        ("pred", pa.string()),
        ("obj_value", pa.string()),
        ("obj_kind", pa.string()),
        ("obj_lang", pa.string()),
        ("obj_datatype", pa.string()),
        ("graph", pa.string()),
    ]
)


def parse_lines_batch(batch: pa.Table, on_malformed: str = "raise") -> pa.Table:
    """(text) line rows -> triple rows.  Statement-per-line means a
    block is parseable in isolation.  ``on_malformed="skip"``
    quarantines corrupt lines (see :func:`read_ntriples`)."""
    from ..rdf.ntriples import parse_nquads
    from ..rdf.terms import BNODE, LIT

    cols = {name: [] for name in TRIPLES_SCHEMA.names}
    text = "\n".join(
        v for v in batch.column("text").to_pylist() if v is not None
    )
    def _qkey(q):
        return tuple(
            tuple("" if x is None else x for x in term)
            for term in (q[0], q[1], q[2], q[3] or ("", ""))
        )

    parsed = parse_nquads(text, on_malformed=on_malformed)
    for (s, p, o, g) in sorted(parsed, key=_qkey):
        cols["subj"].append(s[1])
        cols["subj_kind"].append("bnode" if s[0] == BNODE else "iri")
        cols["pred"].append(p[1])
        cols["obj_value"].append(o[1])
        if o[0] == LIT:
            cols["obj_kind"].append("literal")
            cols["obj_lang"].append(o[2] or "")
            cols["obj_datatype"].append(o[3] or "")
        else:
            cols["obj_kind"].append("bnode" if o[0] == BNODE else "iri")
            cols["obj_lang"].append("")
            cols["obj_datatype"].append("")
        cols["graph"].append(g[1] if g is not None else "")
    return pa.Table.from_pydict(cols, schema=TRIPLES_SCHEMA)


def read_ntriples(paths, on_malformed: str = "raise"):
    """Read N-Triples file(s) into a triples Dataset.

    ``on_malformed``: "raise" (default) fails the read on the first
    corrupt line with a typed ValueError naming it; "skip" quarantines
    corrupt lines and keeps streaming — at 100-TB scale one bad line
    in one shard must not kill a multi-hour job."""
    import functools

    import ray.data as rd

    fn = functools.partial(parse_lines_batch, on_malformed=on_malformed)
    return rd.read_text(paths).map_batches(fn, batch_format="pyarrow")
