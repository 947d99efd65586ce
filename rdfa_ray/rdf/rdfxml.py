"""Pretty RDF/XML serializer.

Matches the observable shape of the reference's serializer
(``/root/reference/pyRdfaExtras/serializers/prettyXMLserializer.py:
1-192``): an ``<rdf:RDF>`` envelope declaring the namespaces actually
used, one ``<rdf:Description>`` per subject (``rdf:about`` for IRIs,
``rdf:nodeID`` for blank nodes), property elements with
``rdf:resource`` / ``rdf:nodeID`` object attributes, text content for
literals with ``xml:lang`` / ``rdf:datatype``.

Deterministic (sorted subjects / predicates / objects) and verified to
round-trip through the engine's own RDF/XML subset parser
(``rdfa_ray.kernel.embedded.parse_rdfxml``) to an isomorphic graph.

RDF/XML cannot express predicates whose IRI has no XML-NCName suffix;
such triples raise ``ValueError`` (the reference inherits the same
limitation from rdflib's ``split_uri``).
"""

from __future__ import annotations

import re

from .terms import BNODE, IRI, LIT
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


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


class RdfXmlSerializer:
    def __init__(self, prefixes: dict[str, str] | None = None):
        table = default_prefix_table() if prefixes is None else prefixes
        self._uri_to_prefix = {u: p for p, u in table.items() if p != "rdf"}

    def serialize(self, triples) -> str:
        used: dict[str, str] = {}  # ns uri -> prefix
        gen = [0]

        def prefix_for(ns: str) -> str:
            p = used.get(ns)
            if p is None:
                p = self._uri_to_prefix.get(ns)
                if p is None or p in used.values():
                    gen[0] += 1
                    p = "ns%d" % gen[0]
                used[ns] = p
            return p

        by_subject: dict[tuple, list] = {}
        for (s, p, o) in sorted(triples):
            by_subject.setdefault(s, []).append((p, o))

        body = []
        for subj in sorted(by_subject):
            if subj[0] == BNODE:
                open_tag = '  <rdf:Description rdf:nodeID="%s">' % _esc_attr(subj[1])
            else:
                open_tag = '  <rdf:Description rdf:about="%s">' % _esc_attr(subj[1])
            props = []
            for (p, o) in by_subject[subj]:
                ns, local = split_uri(p[1])
                q = "%s:%s" % (prefix_for(ns), local)
                if o[0] == IRI:
                    props.append('    <%s rdf:resource="%s"/>' % (q, _esc_attr(o[1])))
                elif o[0] == BNODE:
                    props.append('    <%s rdf:nodeID="%s"/>' % (q, _esc_attr(o[1])))
                else:
                    _, value, lang, datatype = o
                    attrs = ""
                    if datatype:
                        attrs = ' rdf:datatype="%s"' % _esc_attr(datatype)
                    elif lang:
                        attrs = ' xml:lang="%s"' % _esc_attr(lang)
                    props.append(
                        "    <%s%s>%s</%s>" % (q, attrs, _esc_text(value), q)
                    )
            body.append(open_tag + "\n" + "\n".join(props) + "\n  </rdf:Description>")

        ns_decls = "".join(
            '\n         xmlns:%s="%s"' % (used[ns], _esc_attr(ns))
            for ns in sorted(used)
        )
        return (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"%s>\n'
            "%s\n</rdf:RDF>\n" % (ns_decls, "\n".join(body))
        )


def graph_to_rdfxml(triples, prefixes: dict[str, str] | None = None) -> str:
    return RdfXmlSerializer(prefixes).serialize(triples)


def rdfxml_to_graph(text: str, bnodes) -> set:
    """Round-trip reader: parse serializer output back into term-tuple
    triples via the embedded RDF/XML subset parser."""
    from ..dom.xml_builder import parse_xml
    from ..kernel.embedded import parse_rdfxml

    doc = parse_xml(text)
    return parse_rdfxml(doc.root, "", bnodes)
