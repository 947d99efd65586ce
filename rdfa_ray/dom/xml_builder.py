"""XML / XHTML / SVG parse path: minidom -> Element conversion.

Mirrors the reference's minidom usage
(``/root/reference/pyRdfa/__init__.py:651-660``).  Namespace URIs are
resolved here (tracking in-scope ``xmlns``/``xmlns:*`` declarations)
because the embedded-RDF/XML detection needs ``localName == "RDF" and
namespaceURI == rdf-ns`` (``/root/reference/pyRdfa/embeddedRDF.py:75``).
"""

from __future__ import annotations

import xml.dom.minidom as minidom

from .node import Document, Element

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


class XMLParseError(ValueError):
    pass


def _convert(node, ns_scope: dict) -> Element:
    # compute namespace scope for this element
    local_scope = None
    for i in range(node.attributes.length if node.attributes else 0):
        attr = node.attributes.item(i)
        if attr.name == "xmlns":
            local_scope = dict(ns_scope) if local_scope is None else local_scope
            local_scope[""] = attr.value
        elif attr.name.startswith("xmlns:"):
            local_scope = dict(ns_scope) if local_scope is None else local_scope
            local_scope[attr.name[6:]] = attr.value
    scope = local_scope if local_scope is not None else ns_scope

    tag = node.nodeName
    if ":" in tag:
        prefix, local = tag.split(":", 1)
        ns_uri = scope.get(prefix)
    else:
        local = tag
        ns_uri = scope.get("")
    el = Element(tag, ns_uri=ns_uri, local=local)
    el.ns_scope = scope
    if node.attributes:
        for i in range(node.attributes.length):
            attr = node.attributes.item(i)
            el.attrs[attr.name] = attr.value

    for child in node.childNodes:
        if child.nodeType == child.ELEMENT_NODE:
            el.append(_convert(child, scope))
        elif child.nodeType in (child.TEXT_NODE, child.CDATA_SECTION_NODE):
            el.append(child.data)
        # comments / PIs dropped
    return el


def parse_xml(text: str) -> Document:
    try:
        dom = minidom.parseString(text)
    except Exception as e:  # expat errors
        raise XMLParseError(str(e)) from e
    root = _convert(dom.documentElement, {})
    public_id = system_id = None
    if dom.doctype is not None:
        public_id = dom.doctype.publicId
        system_id = dom.doctype.systemId
    return Document(root, public_id, system_id)
