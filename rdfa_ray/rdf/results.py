"""W3C SPARQL 1.1 query-results serialization: JSON
(https://www.w3.org/TR/sparql11-results-json/), CSV and TSV
(https://www.w3.org/TR/sparql11-results-csv-tsv/) — the interop
surface an rdflib user reaches with ``result.serialize(format=...)``
after ``graph.query(...)``.

The engine's bindings are lexical strings; term KIND is recovered the
same way the serializers in ``rdf/turtle.py`` do it — ``_:``-prefixed
values are blank nodes, values that parse as absolute IRIs are IRIs,
everything else is a literal — and literal language/datatype tags are
honored when the caller passes the metadata columns the carry_meta
scans produce (``?v__lang`` / ``?v__datatype``).  The engine-wide
unbound sentinel ``""`` serializes as an absent binding (JSON: key
omitted; CSV/TSV: empty field), matching the spec's treatment of
unbound variables.

All three formats are row-local, so serialization runs inside
``map_batches`` when streaming large results to disk; the helpers
below take a pandas frame (the driver-side shape of a collected
SELECT result) and return the document string — for 100-TB outputs
serialize per-batch and write shards instead of collecting.
"""

from __future__ import annotations

import json
import re

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:\S*$")

# TSV terms use SPARQL literal syntax: escape per the grammar's ECHAR
_TSV_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def term_kind(value: str) -> str:
    """'bnode' | 'uri' | 'literal' from the lexical form (the engine's
    stance: bindings carry no type tags unless metadata columns do)."""
    if value.startswith("_:"):
        return "bnode"
    if _ABS_IRI_RE.match(value) and " " not in value:
        return "uri"
    return "literal"


def _meta_for(df, var: str, i: int) -> tuple[str, str]:
    lang = dt = ""
    if var + "__lang" in df.columns:
        lang = df[var + "__lang"].iloc[i] or ""
    if var + "__datatype" in df.columns:
        dt = df[var + "__datatype"].iloc[i] or ""
    return lang, dt


def _result_vars(df, vars=None) -> list[str]:
    if vars is not None:
        return list(vars)
    return [c for c in df.columns if "__" not in c]


def results_json(df, vars=None) -> str:
    """SELECT result -> application/sparql-results+json document."""
    out_vars = _result_vars(df, vars)
    bindings = []
    for i in range(len(df)):
        row = {}
        for v in out_vars:
            raw = df[v].iloc[i]
            if raw is None or (isinstance(raw, float) and raw != raw):
                continue
            value = str(raw)
            if value == "":
                continue  # engine unbound sentinel
            kind = term_kind(value)
            cell = {"type": kind, "value": value}
            if kind == "literal":
                lang, dt = _meta_for(df, v, i)
                if lang:
                    cell["xml:lang"] = lang
                elif dt:
                    cell["datatype"] = dt
            row[v] = cell
        bindings.append(row)
    return json.dumps(
        {"head": {"vars": out_vars}, "results": {"bindings": bindings}},
        ensure_ascii=False,
    )


def ask_json(answer: bool) -> str:
    """ASK result -> application/sparql-results+json document."""
    return json.dumps({"head": {}, "boolean": bool(answer)})


def _csv_field(value: str) -> str:
    if any(ch in value for ch in (",", '"', "\n", "\r")):
        return '"%s"' % value.replace('"', '""')
    return value


def results_csv(df, vars=None) -> str:
    """SELECT result -> text/csv per sparql11-results-csv-tsv §3:
    raw lexical forms (no type markup), RFC 4180 quoting, CRLF rows."""
    out_vars = _result_vars(df, vars)
    lines = [",".join(out_vars)]
    for i in range(len(df)):
        cells = []
        for v in out_vars:
            raw = df[v].iloc[i]
            if raw is None or (isinstance(raw, float) and raw != raw):
                cells.append("")
                continue
            cells.append(_csv_field(str(raw)))
        lines.append(",".join(cells))
    return "\r\n".join(lines) + "\r\n"


def _tsv_term(value: str, lang: str, dt: str) -> str:
    kind = term_kind(value)
    if kind == "uri":
        return "<%s>" % value
    if kind == "bnode":
        return value
    lex = "".join(_TSV_ESCAPES.get(ch, ch) for ch in value)
    if lang:
        return '"%s"@%s' % (lex, lang)
    if dt:
        return '"%s"^^<%s>' % (lex, dt)
    return '"%s"' % lex


def results_tsv(df, vars=None) -> str:
    """SELECT result -> text/tab-separated-values per
    sparql11-results-csv-tsv §4: full SPARQL term syntax, ?-prefixed
    header."""
    out_vars = _result_vars(df, vars)
    lines = ["\t".join("?" + v for v in out_vars)]
    for i in range(len(df)):
        cells = []
        for v in out_vars:
            raw = df[v].iloc[i]
            if raw is None or (isinstance(raw, float) and raw != raw):
                cells.append("")
                continue
            value = str(raw)
            if value == "":
                cells.append("")
                continue
            lang, dt = _meta_for(df, v, i)
            cells.append(_tsv_term(value, lang, dt))
        lines.append("\t".join(cells))
    return "\n".join(lines) + "\n"
