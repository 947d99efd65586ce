"""N-Triples serialization (the engine's conformance output format).

The reference delegates serialization to rdflib
(``graph.serialize(format="nt")``, selected via
``/root/reference/pyRdfa/__init__.py:458-466``).  This is a direct
implementation of the W3C N-Triples grammar: IRIs in ``<>``, bnodes as
``_:label``, literals with ECHAR escaping and optional ``@lang`` /
``^^<datatype>``.
"""

from __future__ import annotations

from .terms import IRI, BNODE, LIT

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def _escape_literal(value: str) -> str:
    out = []
    for ch in value:
        esc = _ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        else:
            out.append(ch)
    return "".join(out)


def term_to_nt(term) -> str:
    kind = term[0]
    if kind == IRI:
        return "<%s>" % term[1]
    if kind == BNODE:
        return "_:%s" % term[1]
    if kind == LIT:
        _, value, lang, datatype = term
        body = '"%s"' % _escape_literal(value)
        if datatype:
            return '%s^^<%s>' % (body, datatype)
        if lang:
            return "%s@%s" % (body, lang)
        return body
    raise ValueError("unknown term kind: %r" % (term,))


def triple_to_ntriples(triple) -> str:
    s, p, o = triple
    return "%s %s %s ." % (term_to_nt(s), term_to_nt(p), term_to_nt(o))


def graph_to_ntriples(triples) -> str:
    """Serialize an iterable of triples, sorted for deterministic output."""
    return "\n".join(sorted(triple_to_ntriples(t) for t in triples)) + "\n"


# ---------------------------------------------------------------------------
# Vectorized N-Quads formatting from an Arrow triples table (the
# flagship sink's hot path — no pandas round-trip, no per-row Python).


def _ls(s: str):
    import pyarrow as pa

    return pa.scalar(s, pa.large_string())


def nquads_lines_arrow(table):
    """``pa.Table`` (subj, subj_kind, pred, obj_value, obj_kind,
    obj_lang, obj_datatype, graph) -> large_string array of N-Quads
    lines, one per row, unsorted.  Pure pyarrow.compute kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def col(name):
        c = table.column(name)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        if not pa.types.is_large_string(c.type):
            c = pc.cast(c, pa.large_string())
        return c

    subj, subj_kind = col("subj"), col("subj_kind")
    pred, graph = col("pred"), col("graph")
    ov, ok = col("obj_value"), col("obj_kind")
    lang = pc.fill_null(col("obj_lang"), "")
    dt = pc.fill_null(col("obj_datatype"), "")
    sep = _ls("")

    subj_s = pc.if_else(
        pc.equal(subj_kind, "bnode"),
        pc.binary_join_element_wise(_ls("_:"), subj, sep),
        pc.binary_join_element_wise(_ls("<"), subj, _ls(">"), sep),
    )
    esc = ov
    for raw, escd in _ESCAPES.items():
        esc = pc.replace_substring(esc, raw, escd)
    suffix = pc.if_else(
        pc.not_equal(dt, ""),
        pc.binary_join_element_wise(_ls("^^<"), dt, _ls(">"), sep),
        pc.if_else(
            pc.not_equal(lang, ""),
            pc.binary_join_element_wise(_ls("@"), pc.utf8_lower(lang), sep),
            sep,
        ),
    )
    lit = pc.binary_join_element_wise(_ls('"'), esc, _ls('"'), suffix, sep)
    obj_s = pc.if_else(
        pc.equal(ok, "literal"),
        lit,
        pc.if_else(
            pc.equal(ok, "bnode"),
            pc.binary_join_element_wise(_ls("_:"), ov, sep),
            pc.binary_join_element_wise(_ls("<"), ov, _ls(">"), sep),
        ),
    )
    return pc.binary_join_element_wise(
        subj_s, pc.binary_join_element_wise(_ls("<"), pred, _ls(">"), sep),
        obj_s, pc.binary_join_element_wise(_ls("<"), graph, _ls(">"), sep),
        _ls("."), _ls(" "),
    )


# ---------------------------------------------------------------------------
# A small N-Triples *reader* for test fixtures (tests/corpus/*.nt).

def _parse_term(s: str, pos: int):
    while s[pos] in " \t":
        pos += 1
    if s[pos] == "<":
        end = s.index(">", pos)
        return (IRI, s[pos + 1 : end]), end + 1
    if s[pos] == "_" and s[pos + 1] == ":":
        end = pos + 2
        while end < len(s) and s[end] not in " \t":
            end += 1
        return (BNODE, s[pos + 2 : end]), end
    if s[pos] == '"':
        out = []
        i = pos + 1
        while True:
            ch = s[i]
            if ch == "\\":
                nxt = s[i + 1]
                if nxt == "u":
                    out.append(chr(int(s[i + 2 : i + 6], 16)))
                    i += 6
                    continue
                if nxt == "U":
                    out.append(chr(int(s[i + 2 : i + 10], 16)))
                    i += 10
                    continue
                rev = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}
                out.append(rev[nxt])
                i += 2
                continue
            if ch == '"':
                break
            out.append(ch)
            i += 1
        value = "".join(out)
        i += 1
        lang = None
        datatype = None
        if i < len(s) and s[i] == "@":
            end = i + 1
            while end < len(s) and s[end] not in " \t":
                end += 1
            # language tags are case-insensitive (RDF 1.1 §3.3); the
            # engine's canonical form is lowercase everywhere
            lang = s[i + 1 : end].lower()
            i = end
        elif s[i : i + 2] == "^^":
            if s[i + 2 : i + 3] != "<":
                raise ValueError("datatype needs <IRI> at %r" % s[i : i + 20])
            end = s.index(">", i)
            datatype = s[i + 3 : end]
            i = end + 1
        return (LIT, value, lang, datatype), i
    raise ValueError("cannot parse term at %r" % s[pos : pos + 40])


def parse_ntriples(text: str):
    """Parse N-Triples text into a set of term-tuples. Fixture use
    only.  N-Quads lines are accepted and projected to triples (the
    graph term dropped) — use :func:`parse_nquads` to keep it."""
    return {(s, p, o) for s, p, o, _g in parse_nquads(text)}


def parse_nquads(text: str, on_malformed: str = "raise"):
    """Parse N-Triples / N-Quads text into a set of
    ``(s, p, o, graph_term_or_None)`` tuples — the read-side twin of
    ``nquads_lines_arrow`` (the flagship sink), so a materialized
    N-Quads export round-trips with its named graphs intact.

    Malformed lines raise ``ValueError`` (always ValueError — truncated
    terms and unknown escapes are normalized from Index/KeyError so
    callers get ONE typed failure mode).  ``on_malformed="skip"``
    quarantines bad lines instead — the file-source option for dirty
    100-TB inputs where one corrupt line must not kill a whole read."""
    quads = set()
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        try:
            s, pos = _parse_term(line, 0)
            p, pos = _parse_term(line, pos)
            o, pos = _parse_term(line, pos)
            g = None
            while pos < len(line) and line[pos] in " \t":
                pos += 1
            if pos < len(line) and line[pos] not in ".":
                g, pos = _parse_term(line, pos)
        except (ValueError, IndexError, KeyError) as e:
            if on_malformed == "skip":
                continue
            raise ValueError(
                "malformed N-Quads line %r" % line[:80]
            ) from e
        quads.add((s, p, o, g))
    return quads
