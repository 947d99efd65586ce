"""``@property`` value generation (literal and IRI objects).

Semantics from ``/root/reference/pyRdfa/property.py`` (class
``ProcessProperty``) and the XML-literal serialization helper
``return_XML`` (``utils.py:211-239``).
"""

from __future__ import annotations

import re

from ..dom.node import Element
from ..rdf.terms import BNODE, RDF_HTML, RDF_XMLLITERAL, literal
from .options import IncorrectBlankNodeUsage, IncorrectLiteral
from .state import err_no_blank_node
from .transform import HANDLED_TIME_TYPES

_WS_RE = re.compile(r"(\r| |\n|\t)+")
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _put_back_entities(s: str) -> str:
    """property.py:222-229."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def return_xml(state, inode: Element, base: bool = True, xmlns: bool = True) -> str:
    """Serialize a node for XML literals / embedded RDF (utils.py:211-239):
    clone, decorate with inherited xmlns declarations (+ optional xml:base),
    then serialize."""
    node = inode.clone()
    if base:
        node.setAttribute("xml:base", state.base)
    if xmlns:
        for prefix, uri in state.term_or_curie.xmlns.items():
            if not node.hasAttribute("xmlns:%s" % prefix):
                node.setAttribute("xmlns:%s" % prefix, uri)
        if not node.getAttribute("xmlns") and state.defaultNS is not None:
            node.setAttribute("xmlns", state.defaultNS)
    return node.toxml()


# Cheap lexical-form validation for the IncorrectLiteral warning
# (reference defers to rdflib's XSDToPython conversion, property.py:286-311;
# only the warning is at stake — the triple is emitted either way).
_VALIDATORS = {
    _XSD + "integer": re.compile(r"^[+-]?[0-9]+$"),
    _XSD + "int": re.compile(r"^[+-]?[0-9]+$"),
    _XSD + "long": re.compile(r"^[+-]?[0-9]+$"),
    _XSD + "nonNegativeInteger": re.compile(r"^\+?[0-9]+$"),
    _XSD + "positiveInteger": re.compile(r"^\+?0*[1-9][0-9]*$"),
    _XSD + "decimal": re.compile(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"),
    _XSD + "float": re.compile(r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?|NaN|INF|-INF)$"),
    _XSD + "double": re.compile(r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?|NaN|INF|-INF)$"),
    _XSD + "boolean": re.compile(r"^(true|false|0|1)$"),
}


class ProcessProperty:
    """property.py:41-311."""

    def __init__(self, node, graph, subject, state, typed_resource=None):
        self.node = node
        self.graph = graph
        self.subject = subject
        self.state = state
        self.typed_resource = typed_resource

    def generate(self):
        if self.state.rdfa_version >= "1.1":
            self.generate_1_1()
        else:
            self.generate_1_0()

    def generate_1_1(self):
        """property.py:76-150."""
        node = self.node
        irirefs = ("resource", "href", "src")
        noiri = ("content", "datatype", "rel", "rev")
        notypediri = ("content", "datatype", "rel", "rev", "about", "about_pruned")

        def has_one_of(names):
            return any(node.hasAttribute(n) for n in names)

        if has_one_of(irirefs) and not has_one_of(noiri):
            obj = self.state.getResource(irirefs)
        elif node.hasAttribute("typeof") and not has_one_of(notypediri) and self.typed_resource is not None:
            obj = self.typed_resource
        else:
            datatype = ""
            dtset = False
            if node.hasAttribute("datatype"):
                dtset = True
                dt = node.getAttribute("datatype")
                if dt != "":
                    datatype = self.state.getURI("datatype")

            if self.state.lang is not None and self.state.supress_lang is False:
                lang = self.state.lang
            else:
                lang = ""

            if node.hasAttribute("content"):
                val = node.getAttribute("content")
                if dtset is False:
                    obj = literal(val, lang=lang)
                else:
                    obj = self._create_literal(val, datatype=datatype, lang=lang)
            else:
                if dtset:
                    if datatype != "" and datatype is not None and datatype[1] == RDF_XMLLITERAL:
                        obj = literal(self._get_xml_literal(node), datatype=RDF_XMLLITERAL)
                    elif datatype != "" and datatype is not None and datatype[1] == RDF_HTML:
                        obj = literal(self._get_html_literal(node), datatype=RDF_HTML)
                    else:
                        obj = self._create_literal(
                            self._get_literal(node), datatype=datatype, lang=lang
                        )
                else:
                    obj = self._create_literal(self._get_literal(node), lang=lang)

        if obj is not None:
            for prop in self.state.getURI("property"):
                if prop[0] != BNODE:
                    if node.hasAttribute("inlist"):
                        self.state.add_to_list_mapping(prop, obj)
                    else:
                        self.graph.add((self.subject, prop, obj))
                else:
                    self.state.options.add_warning(
                        err_no_blank_node % "property",
                        warning_type=IncorrectBlankNodeUsage,
                        node=node.tag,
                    )

    def generate_1_0(self):
        """property.py:152-217 — 1.0 generates only literals."""
        node = self.node
        datatype = ""
        dtset = False
        if node.hasAttribute("datatype"):
            dtset = True
            dt = node.getAttribute("datatype")
            if dt != "":
                datatype = self.state.getURI("datatype")

        lang = self.state.lang if self.state.lang is not None else ""

        if node.hasAttribute("content"):
            val = node.getAttribute("content")
            if dtset is False:
                obj = literal(val, lang=lang)
            else:
                obj = self._create_literal(val, datatype=datatype, lang=lang)
        else:
            if dtset:
                if datatype != "" and datatype is not None and datatype[1] == RDF_XMLLITERAL:
                    obj = literal(self._get_xml_literal(node), datatype=RDF_XMLLITERAL)
                elif datatype != "" and datatype is not None and datatype[1] == RDF_HTML:
                    obj = literal(self._get_html_literal(node), datatype=RDF_HTML)
                else:
                    obj = self._create_literal(
                        self._get_literal(node), datatype=datatype, lang=lang
                    )
            else:
                # auto-XMLLiteral when element children exist (property.py:203)
                if any(isinstance(c, Element) for c in node.children):
                    obj = literal(self._get_xml_literal(node), datatype=RDF_XMLLITERAL)
                else:
                    obj = self._create_literal(self._get_literal(node), lang=lang)

        for prop in self.state.getURI("property"):
            if prop[0] != BNODE:
                self.graph.add((self.subject, prop, obj))
            else:
                self.state.options.add_warning(
                    err_no_blank_node % "property",
                    warning_type=IncorrectBlankNodeUsage,
                    node=node.tag,
                )

    # ------------------------------------------------------------------
    def _get_literal(self, node: Element) -> str:
        """property.py:231-251."""
        rc = node.text_content()
        if self.state.options.space_preserve:
            return rc
        return _WS_RE.sub(" ", rc).strip()

    def _get_xml_literal(self, node: Element) -> str:
        """property.py:254-267."""
        rc = []
        for c in node.children:
            if isinstance(c, Element):
                rc.append(return_xml(self.state, c, base=False))
            else:
                rc.append(_put_back_entities(c))
        return "".join(rc)

    def _get_html_literal(self, node: Element) -> str:
        """property.py:270-284."""
        rc = []
        for c in node.children:
            if isinstance(c, Element):
                rc.append(return_xml(self.state, c, base=False, xmlns=False))
            else:
                rc.append(_put_back_entities(c))
        return "".join(rc)

    def _create_literal(self, val: str, datatype="", lang=""):
        """property.py:286-311 (warning-only lexical validation)."""
        if datatype is None or datatype == "":
            return literal(val, lang=lang)
        dt_uri = datatype[1]
        if dt_uri not in HANDLED_TIME_TYPES:
            check = _VALIDATORS.get(dt_uri)
            if check is not None and not check.match(val.strip()):
                self.state.options.add_warning(
                    "Incompatible value (%s) and datatype (%s) in Literal definition."
                    % (val, dt_uri),
                    warning_type=IncorrectLiteral,
                    node=self.node.tag,
                )
        return literal(val, datatype=dt_uri)
