"""Lenient HTML5-ish tree builder on top of stdlib ``html.parser``.

Replaces the reference's html5lib parse
(``/root/reference/pyRdfa/__init__.py:619-649``).  We only need
html5lib's *observable effects on RDFa processing*: lowercased
tag/attribute names, void elements, implied <html>/<head>/<body>
structure (so the <head>/<body> subject-inheritance special case at
``/root/reference/pyRdfa/parse.py:89-96`` and the <base> discovery at
``state.py:186-190`` behave identically), recovery from unclosed tags.
Full spec-grade error recovery (adoption agency etc.) is documented as
out of scope (SURVEY.md §7.4.2).
"""

from __future__ import annotations

from html.parser import HTMLParser

from .node import Document, Element

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements whose start tag implicitly closes an open <p> (common subset).
_P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset figure footer form h1 h2 h3 h4 h5 h6 "
    "header hr main nav ol p pre section table ul".split()
)

_HEAD_ONLY = frozenset("title base meta link style".split())


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.top: list = []       # top-level nodes (before html wrapping)
        self.stack: list[Element] = []
        self.public_id: str | None = None
        self.system_id: str | None = None
        self.saw_doctype = False

    # -- helpers ---------------------------------------------------------
    def _append(self, node) -> None:
        if self.stack:
            self.stack[-1].append(node)
        else:
            self.top.append(node)

    # -- handler overrides ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "p" or tag in _P_CLOSERS:
            # close an open <p> first (implied end tag)
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
                if self.stack[i].tag not in ("a", "span", "b", "i", "em", "strong"):
                    break
        # li implicitly closes li
        if tag == "li":
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i].tag == "li":
                    del self.stack[i:]
                    break
                if self.stack[i].tag in ("ul", "ol"):
                    break
        el = Element(tag)
        for name, value in attrs:
            if name not in el.attrs:  # first occurrence wins (html5 semantics)
                el.attrs[name] = value if value is not None else ""
        self._append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag)
        for name, value in attrs:
            if name not in el.attrs:
                el.attrs[name] = value if value is not None else ""
        self._append(el)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (lenient recovery)

    def handle_data(self, data):
        if data:
            self._append(data)

    def handle_decl(self, decl):
        # e.g.  DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" "http://..."
        self.saw_doctype = True
        low = decl.strip()
        if low.lower().startswith("doctype"):
            import re

            m = re.search(r'PUBLIC\s+"([^"]*)"\s+"([^"]*)"', low, re.IGNORECASE)
            if m:
                self.public_id, self.system_id = m.group(1), m.group(2)

    # comments, PIs, unknown decls: dropped
    def handle_comment(self, data):
        pass

    def handle_pi(self, data):
        pass

    def unknown_decl(self, data):
        # <![CDATA[ ... ]]> reaches here in html mode; keep the raw text so
        # embedded turtle extraction can strip the markers like the
        # reference does (embeddedRDF.py:56-57).
        if data.startswith("CDATA["):
            self._append(data[6:])


def _is_ws(node) -> bool:
    return not isinstance(node, Element) and node.strip() == ""


def parse_html(text: str) -> Document:
    """Parse an HTML5 document or fragment into a normalized Document whose
    root is always an <html> element containing <head> and <body>."""
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()

    top_elements = [n for n in tb.top if isinstance(n, Element)]
    html_el = None
    for el in top_elements:
        if el.tag == "html":
            html_el = el
            break

    if html_el is None:
        html_el = Element("html")
        head = Element("head")
        body = Element("body")
        html_el.children = [head, body]
        target = head
        for node in tb.top:
            if target is head:
                if _is_ws(node):
                    continue
                if isinstance(node, Element) and node.tag in _HEAD_ONLY:
                    head.append(node)
                    continue
                target = body
            target.append(node)
    else:
        kids = html_el.element_children()
        head = next((k for k in kids if k.tag == "head"), None)
        body = next((k for k in kids if k.tag == "body"), None)
        if head is None or body is None:
            new_head = head or Element("head")
            new_body = body or Element("body")
            if head is None or body is None:
                rebuilt = []
                for node in html_el.children:
                    if isinstance(node, Element) and node.tag in ("head", "body"):
                        rebuilt.append(node)
                    elif head is None and isinstance(node, Element) and node.tag in _HEAD_ONLY and not new_body.children:
                        new_head.append(node)
                    elif not _is_ws(node):
                        new_body.append(node)
                if head is None:
                    rebuilt.insert(0, new_head)
                if body is None:
                    rebuilt.append(new_body)
                html_el.children = rebuilt

    return Document(html_el, tb.public_id, tb.system_id)
