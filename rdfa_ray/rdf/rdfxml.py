"""Pretty RDF/XML serializer.

Matches the observable shape of the reference's serializer
(``/root/reference/pyRdfaExtras/serializers/prettyXMLserializer.py:
1-192``, itself a fixed fork of rdflib's PrettyXMLSerializer):

* typed-node elements — a subject's first qname-able ``rdf:type``
  becomes the element name instead of an ``rdf:type`` child
  (reference ``subject()``, prettyXMLserializer.py:96-119);
* nested descriptions — an object node that is serializable and not
  yet emitted is inlined inside the property element up to
  ``max_depth`` = 8 (reference ``predicate()`` ``defaultCase``,
  prettyXMLserializer.py:121-127, depth default at :30);
* ``rdf:nodeID`` only where identity matters — blank nodes referenced
  more than once (or top-level ones that are also objects); singly
  referenced bnodes stay anonymous nested elements
  (prettyXMLserializer.py:107-112, 170-175);
* well-formed, non-literal ``rdf:List`` chains compact to
  ``rdf:parseType="Collection"`` (prettyXMLserializer.py:36-46,
  148-168) — literal-bearing lists fall back to first/rest form, the
  RDF/XML-syntax limitation the reference comments on;
* ``rdf:XMLLiteral`` values emit ``rdf:parseType="Literal"`` raw XML
  when well-formed (prettyXMLserializer.py:139-144), else an escaped
  ``rdf:datatype`` literal;
* subjects that can appear only at top level (never an object, or
  self-referential, plus anything left unserialized by cycles) are
  emitted in the reference's two-pass order
  (prettyXMLserializer.py:80-89), here in sorted order for
  determinism.

Deterministic (sorted subjects / predicates / objects) and verified to
round-trip through the engine's own RDF/XML subset parser
(``rdfa_ray.kernel.embedded.parse_rdfxml``) to an isomorphic graph.

RDF/XML cannot express predicates whose IRI has no XML-NCName suffix;
such triples raise ``ValueError`` (the reference inherits the same
limitation from rdflib's ``split_uri``).
"""

from __future__ import annotations

import re

from .terms import (
    BNODE,
    IRI,
    LIT,
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    RDF_XMLLITERAL,
)
from .turtle import default_prefix_table

_NAME_CHAR = re.compile(r"[A-Za-z0-9_.\-]")
_NAME_START = re.compile(r"[A-Za-z_]")


def split_uri(uri: str) -> tuple[str, str]:
    """Split into (namespace, NCName local): the longest valid NCName
    suffix.  Raises ValueError when none exists."""
    i = len(uri)
    while i > 0 and _NAME_CHAR.match(uri[i - 1]):
        i -= 1
    while i < len(uri) and not _NAME_START.match(uri[i]):
        i += 1
    local = uri[i:]
    if not local or i == 0:
        raise ValueError("cannot split %r into an RDF/XML qname" % uri)
    return uri[:i], local


_XML_INVALID = re.compile(
    # XML 1.0 Char excludes C0 controls other than TAB/LF/CR, and the
    # surrogate/FFFE-FFFF ranges — such literals CANNOT be carried in
    # RDF/XML at all, so the writer refuses loudly (the reference
    # rdflib serializer emits them raw, producing unparseable XML)
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ufffe\uffff]"
)


def _check_xml_chars(s: str) -> str:
    if _XML_INVALID.search(s):
        raise ValueError(
            "literal contains characters not representable in XML 1.0 "
            "(use N-Quads/Turtle/JSON-LD for this graph): %r" % s[:50]
        )
    return s


def _esc_text(s: str) -> str:
    # CR must be a character reference — bare \r (or \r\n) is
    # line-end-normalized to \n by every conformant XML parser
    return (
        _check_xml_chars(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("\r", "&#13;")
    )


def _esc_attr(s: str) -> str:
    # attribute-value normalization additionally folds TAB/LF to
    # spaces — reference them numerically too
    return (
        _esc_text(s)
        .replace('"', "&quot;")
        .replace("\t", "&#9;")
        .replace("\n", "&#10;")
    )


def _xml_literal_roundtrips(fragment: str) -> bool:
    """True when emitting ``fragment`` raw under ``rdf:parseType="Literal"``
    and re-reading it through the engine's own XML builder reproduces the
    byte-identical literal value (the guard runs the exact read-side code
    path of ``kernel.embedded._RdfXmlParser``)."""
    from ..dom.node import Element
    from ..dom.xml_builder import parse_xml

    try:
        doc = parse_xml("<x>%s</x>" % fragment)
    except Exception:
        return False
    back = "".join(
        c.toxml()
        if isinstance(c, Element)
        else c.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        for c in doc.root.children
    )
    return back == fragment


class RdfXmlSerializer:
    def __init__(self, prefixes: dict[str, str] | None = None, max_depth: int = 8):
        table = default_prefix_table() if prefixes is None else prefixes
        self._uri_to_prefix = {u: p for p, u in table.items() if p != "rdf"}
        self.max_depth = max_depth

    # -- per-serialize state lives on self during one serialize() call
    def serialize(self, triples) -> str:
        self._used: dict[str, str] = {RDF_NS: "rdf"}  # ns uri -> prefix
        self._gen = 0
        self._out: list[str] = []
        self._serialized: set = set()

        self._spo: dict[tuple, list] = {}
        self._obj_refs: dict[tuple, int] = {}
        def _tkey(tr):
            # literal terms carry None lang/datatype slots — map to ''
            # so mixed-kind sorts stay total (deterministic output)
            return tuple(
                tuple("" if x is None else x for x in term) for term in tr
            )

        for (s, p, o) in sorted(set(triples), key=_tkey):
            self._spo.setdefault(s, []).append((p, o))
            if o[0] != LIT:
                self._obj_refs[o] = self._obj_refs.get(o, 0) + 1

        self._find_lists()

        # pass 1: subjects that cannot be inlined anywhere
        # (prettyXMLserializer.py:80-86)
        for subj in sorted(self._spo):
            if self._obj_refs.get(subj, 0) == 0 or any(
                o == subj for (_p, o) in self._spo[subj]
            ):
                self._subject(subj, 1)
        # pass 2: whatever cycles left behind (prettyXMLserializer.py:87-89)
        for subj in sorted(self._spo):
            self._subject(subj, 1)

        body = "\n".join(self._out)
        ns_decls = "".join(
            '\n         xmlns:%s="%s"' % (self._used[ns], _esc_attr(ns))
            for ns in sorted(self._used)
            if ns != RDF_NS
        )
        return (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"%s>\n'
            "%s\n</rdf:RDF>\n" % (ns_decls, body)
        )

    # -- list detection (prettyXMLserializer.py:33-46): a "kosher" chain
    # is all-bnode, exactly {rdf:first, rdf:rest} per cell, each cell
    # referenced exactly once, items non-literal, terminated by rdf:nil.
    def _find_lists(self):
        # head node -> (items, chain cells).  Chains are suppressed
        # lazily at Collection-emission time (never pre-marked), so a
        # head reached top-level first still serializes losslessly in
        # plain first/rest form — unlike the reference's eager marking
        # (prettyXMLserializer.py:52-55), which can drop internal cells.
        self._list_heads: dict[tuple, tuple] = {}
        cells = {}
        for s, pos in self._spo.items():
            if s[0] != BNODE:
                continue
            firsts = [o for (p, o) in pos if p == RDF_FIRST]
            rests = [o for (p, o) in pos if p == RDF_REST]
            if len(pos) == 2 and len(firsts) == 1 and len(rests) == 1:
                cells[s] = (firsts[0], rests[0])
        rest_targets = {r for (_f, r) in cells.values()}
        for head in cells:
            if head in rest_targets:
                continue  # internal cell; handled via its head
            items, node, chain, ok = [], head, [], True
            while node != RDF_NIL:
                if node not in cells or self._obj_refs.get(node, 0) != 1 or node in chain:
                    ok = False
                    break
                f, r = cells[node]
                if f[0] == LIT:  # RDF/XML Collections cannot hold literals
                    ok = False
                    break
                items.append(f)
                chain.append(node)
                node = r
            if ok:
                self._list_heads[head] = (items, chain)

    def _prefix_for(self, ns: str) -> str:
        p = self._used.get(ns)
        if p is None:
            p = self._uri_to_prefix.get(ns)
            if p is None or p in self._used.values():
                self._gen += 1
                p = "ns%d" % self._gen
            self._used[ns] = p
        return p

    def _qname(self, uri: str) -> str:
        ns, local = split_uri(uri)
        return "%s:%s" % (self._prefix_for(ns), local)

    def _node_ref_attr(self, node) -> str:
        # reference on a NODE element (rdf:about)
        if node[0] == BNODE:
            return ' rdf:nodeID="%s"' % _esc_attr(node[1])
        return ' rdf:about="%s"' % _esc_attr(node[1])

    def _prop_ref_attr(self, node) -> str:
        # reference on a PROPERTY element (rdf:resource)
        if node[0] == BNODE:
            return ' rdf:nodeID="%s"' % _esc_attr(node[1])
        return ' rdf:resource="%s"' % _esc_attr(node[1])

    def _subject(self, subj, depth: int):
        if subj in self._serialized:
            return
        self._serialized.add(subj)
        pos = self._spo.get(subj, [])

        # typed-node element from the first qname-able rdf:type
        # (prettyXMLserializer.py:100-105)
        elem, type_obj = "rdf:Description", None
        for (p, o) in pos:
            if p == RDF_TYPE and o[0] == IRI:
                try:
                    elem = self._qname(o[1])
                    type_obj = o
                except ValueError:
                    pass
                break

        ind = "  " * depth
        attrs = ""
        if subj[0] == BNODE:
            refs = self._obj_refs.get(subj, 0)
            # nodeID only when identity matters (prettyXMLserializer.py:107-112)
            if (depth == 1 and refs > 0) or refs > 1:
                attrs = ' rdf:nodeID="%s"' % _esc_attr(subj[1])
        else:
            attrs = ' rdf:about="%s"' % _esc_attr(subj[1])

        props = [(p, o) for (p, o) in pos if not (p == RDF_TYPE and o == type_obj)]
        if not props:
            self._out.append("%s<%s%s/>" % (ind, elem, attrs))
            return
        self._out.append("%s<%s%s>" % (ind, elem, attrs))
        for (p, o) in props:
            self._predicate(p, o, depth + 1)
        self._out.append("%s</%s>" % (ind, elem))

    def _predicate(self, pred, obj, depth: int):
        q = self._qname(pred[1])
        ind = "  " * depth

        if obj[0] == LIT:
            _, value, lang, datatype = obj
            if datatype == RDF_XMLLITERAL and _xml_literal_roundtrips(value):
                self._out.append(
                    '%s<%s rdf:parseType="Literal">%s</%s>' % (ind, q, value, q)
                )
                return
            attrs = ""
            if datatype:
                attrs = ' rdf:datatype="%s"' % _esc_attr(datatype)
            elif lang:
                attrs = ' xml:lang="%s"' % _esc_attr(lang.lower())
            self._out.append("%s<%s%s>%s</%s>" % (ind, q, attrs, _esc_text(value), q))
            return

        if obj in self._list_heads and obj not in self._serialized:
            # rdf:parseType="Collection" (prettyXMLserializer.py:148-168);
            # the whole chain is suppressed here, at emission time
            items, chain = self._list_heads[obj]
            self._serialized.update(chain)
            self._out.append('%s<%s rdf:parseType="Collection">' % (ind, q))
            for item in items:
                if item in self._serialized or item not in self._spo:
                    self._out.append(
                        "%s  <rdf:Description%s/>" % (ind, self._node_ref_attr(item))
                    )
                else:
                    self._subject(item, depth + 1)
            self._out.append("%s</%s>" % (ind, q))
            return

        if obj in self._serialized or obj not in self._spo:
            # reference-only (prettyXMLserializer.py:170-175); an object
            # bnode always has >=1 incoming reference, so nodeID is written
            self._out.append("%s<%s%s/>" % (ind, q, self._prop_ref_attr(obj)))
            return

        if depth <= self.max_depth:
            self._out.append("%s<%s>" % (ind, q))
            self._subject(obj, depth + 1)
            self._out.append("%s</%s>" % (ind, q))
        else:
            self._out.append("%s<%s%s/>" % (ind, q, self._prop_ref_attr(obj)))


def graph_to_rdfxml(triples, prefixes: dict[str, str] | None = None) -> str:
    return RdfXmlSerializer(prefixes).serialize(triples)


def rdfxml_to_graph(text: str, bnodes) -> set:
    """Round-trip reader: parse serializer output back into term-tuple
    triples via the embedded RDF/XML subset parser."""
    from ..dom.xml_builder import parse_xml
    from ..kernel.embedded import parse_rdfxml

    doc = parse_xml(text)
    return parse_rdfxml(doc.root, "", bnodes)
