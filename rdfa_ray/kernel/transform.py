"""DOM pre-transforms applied before the walk.

Built-ins (always run, reference ``transform/__init__.py`` +
``__init__.py:350-352``): ``empty_safe_curie``, ``top_about``,
``vocab_for_role``.  Host transforms (html5/xhtml5:
``host/html5.py:157-224``; atom: ``host/atom.py:19-29``) run per-node
during the walk.  Opt-ins: ``meta_transform``
(``transform/metaname.py``), OpenID and DublinCore rewrites, RDFa Lite
checking (``transform/lite.py``).
"""

from __future__ import annotations

import re
from datetime import datetime

from ..dom.node import Element
from .context import XHTML_URI
from .state import TERMNAME

# ---------------------------------------------------------------------------
# Built-in transformers (run on the whole tree before the walk)


def _has_one_of(node, *names) -> bool:
    return any(node.hasAttribute(n) for n in names)


def top_about(root, options, state) -> None:
    """Reference transform/__init__.py:22-59."""

    def set_about(node):
        if _has_one_of(node, "rel", "rev"):
            if not _has_one_of(node, "about", "src"):
                node.setAttribute("about", "")
        else:
            if not _has_one_of(node, "href", "resource", "about", "src"):
                node.setAttribute("about", "")

    from ..dom.sniff import HostLanguage

    if not _has_one_of(root, "about"):
        if _has_one_of(root, "resource", "href", "src"):
            if _has_one_of(root, "rel", "rev", "property"):
                root.setAttribute("about", "")
        else:
            root.setAttribute("about", "")

    if options.host_language in (HostLanguage.xhtml, HostLanguage.html5, HostLanguage.xhtml5):
        if state.rdfa_version >= "1.1":
            pass
        else:
            for top in root.getElementsByTagName("head"):
                if not _has_one_of(top, "href", "resource", "about", "src"):
                    set_about(top)
            for top in root.getElementsByTagName("body"):
                if not _has_one_of(top, "href", "resource", "about", "src"):
                    set_about(top)


def empty_safe_curie(node, options, state) -> None:
    """Reference transform/__init__.py:62-87 (iterative here)."""

    def prune(el, name):
        if el.hasAttribute(name) and el.getAttribute(name) == "[]":
            el.removeAttribute(name)
            el.setAttribute(name + "_pruned", "")
            options.add_warning(
                "Attribute @%s uses an empty safe CURIE; the attribute is ignored" % name,
                node=el.tag,
            )

    for el in node.iter_elements():
        prune(el, "about")
        prune(el, "resource")


def vocab_for_role(node, options, state) -> None:
    """Reference transform/__init__.py:89-117 (iterative here)."""
    for el in node.iter_elements():
        if el.hasAttribute("role"):
            new_values = ""
            for val in el.getAttribute("role").strip().split():
                if TERMNAME.match(val):
                    new_values += XHTML_URI + val + " "
                else:
                    new_values += val + " "
            el.setAttribute("role", new_values.strip())


def fused_builtin_scan(root, options, state) -> None:
    """One tree pass applying ``empty_safe_curie`` + ``vocab_for_role``
    (their per-element effects are independent and order-free); the
    separate transformers each walked the whole tree — this halves the
    always-run pre-walk traversals.  ``top_about`` stays separate: its
    hot path touches only the root (full scans only for the rare
    RDFa-1.0 html head/body case)."""

    def prune(el, name):
        if el.getAttribute(name) == "[]":
            el.removeAttribute(name)
            el.setAttribute(name + "_pruned", "")
            options.add_warning(
                "Attribute @%s uses an empty safe CURIE; the attribute is ignored" % name,
                node=el.tag,
            )

    for el in root.iter_elements():
        attrs = el.attrs
        if "about" in attrs:
            prune(el, "about")
        if "resource" in attrs:
            prune(el, "resource")
        role = attrs.get("role")
        if role:
            new_values = ""
            for val in role.strip().split():
                if TERMNAME.match(val):
                    new_values += XHTML_URI + val + " "
                else:
                    new_values += val + " "
            el.setAttribute("role", new_values.strip())


# the fused scan preserves the reference's transformer ORDER semantics
# (empty_safe_curie -> top_about -> vocab_for_role): top_about only
# touches root/head/body attributes none of the fused effects read.
BUILTIN_TRANSFORMERS = (fused_builtin_scan, top_about)


# ---------------------------------------------------------------------------
# HTML5 host transforms (per-node, host/html5.py)

_XSD = "http://www.w3.org/2001/XMLSchema#"
DATETIME_TYPE = _XSD + "dateTime"
TIME_TYPE = _XSD + "time"
DATE_TYPE = _XSD + "date"
G_YEAR = _XSD + "gYear"
G_YEAR_MONTH = _XSD + "gYearMonth"
G_MONTH_DAY = _XSD + "gMonthDay"
DURATION_TYPE = _XSD + "duration"
PLAIN = "plain"

HANDLED_TIME_TYPES = (
    DATETIME_TYPE, TIME_TYPE, DATE_TYPE, G_YEAR, G_YEAR_MONTH, G_MONTH_DAY, DURATION_TYPE,
)

# strptime tables: reference host/html5.py:39-64
_FORMATS = {
    G_MONTH_DAY: ["%m-%d"],
    G_YEAR_MONTH: ["%Y-%m"],
    G_YEAR: ["%Y"],
    DATE_TYPE: ["%Y-%m-%d", "%Y-%m-%dZ"],
    TIME_TYPE: ["%H:%M", "%H:%M:%S", "%H:%M:%SZ", "%H:%M:%S.%f"],
    DATETIME_TYPE: [
        "%Y-%m-%dT%H:%M",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%dT%H:%M:%S.%f",
        "%Y-%m-%dT%H:%MZ",
        "%Y-%m-%dT%H:%M:%SZ",
        "%Y-%m-%dT%H:%M:%S.%fZ",
    ],
    DURATION_TYPE: ["P%dD", "P%YY%mM%dD", "P%YY%mM", "P%YY%dD", "P%YY", "P%mM", "P%mM%dD"],
}
_DUR_TIMES = ["%HH%MM%SS", "%HH", "%MM", "%SS", "%HH%MM", "%HH%SS", "%MM%SS"]


def _try_formats(string, formats):
    for fmt in formats:
        try:
            datetime.strptime(string, fmt)
            return True
        except ValueError:
            pass
    return False


def format_test(string: str) -> str:
    """Sniff the xsd datatype of a time-ish string (host/html5.py:66-155)."""
    for key, formats in _FORMATS.items():
        if _try_formats(string, formats):
            return key

    if len(string) > 2 and (string[0] == "P" or (string[0] == "-" and string[1] == "P")):
        if string[0] == "-" and _try_formats(string, _FORMATS[DURATION_TYPE]):
            return DURATION_TYPE
        durs = string.split("T")
        if len(durs) == 2:
            dur, tm = durs
            if _try_formats(dur, _FORMATS[DURATION_TYPE]) and _try_formats(tm, _DUR_TIMES):
                return DURATION_TYPE
            return PLAIN
        return PLAIN

    # explicit-timezone datetime check (html5.py:131-154)
    try:
        head = string[0:-6]
        tz = string[-5:]
        try:
            datetime.strptime(tz, "%H:%M")
        except ValueError:
            return PLAIN
        if _try_formats(head, _FORMATS[DATETIME_TYPE]):
            return DATETIME_TYPE
    except Exception:
        pass
    return PLAIN


_WS_RE = re.compile(r"(\r| |\n|\t)+")


def html5_extra_attributes(node, state) -> None:
    """Reference host/html5.py:157-201."""

    def _set_time(value):
        if not node.hasAttribute("datatype"):
            dt = format_test(value)
            if dt != PLAIN:
                node.setAttribute("datatype", dt)
        node.setAttribute("content", value)

    if not node.hasAttribute("content"):
        if node.hasAttribute("datetime"):
            _set_time(node.getAttribute("datetime"))
        elif node.hasAttribute("dateTime"):
            _set_time(node.getAttribute("dateTime"))
        elif node.tag == "time":
            txt = node.text_content()
            if not state.options.space_preserve:
                txt = _WS_RE.sub(" ", txt).strip()
            _set_time(txt)


def remove_rel(node, state) -> None:
    """Reference host/html5.py:203-224."""

    def _massage(attr):
        if node.hasAttribute("property") and node.hasAttribute(attr):
            vals = node.getAttribute(attr).strip().split()
            if vals:
                final_vals = [v for v in vals if not TERMNAME.match(v)]
                if not final_vals:
                    node.removeAttribute(attr)
                else:
                    node.setAttribute(attr, " ".join(final_vals))

    _massage("rev")
    _massage("rel")


def atom_add_entry_type(node, state) -> None:
    """Reference host/atom.py:19-29."""
    if (
        node.tag == "entry"
        and not _has_one_of(node, "resource", "about", "href", "src")
        and not node.hasAttribute("typeof")
    ):
        node.setAttribute("typeof", "")


def host_transforms_for(host_language):
    from ..dom.sniff import HostLanguage

    if host_language in (HostLanguage.html5, HostLanguage.xhtml5):
        return (html5_extra_attributes, remove_rel)
    if host_language == HostLanguage.atom:
        return (atom_add_entry_type,)
    return ()


# ---------------------------------------------------------------------------
# Opt-in transformers (reference transform/metaname.py, OpenID.py,
# DublinCore.py, lite.py)


def meta_transform(root, options, state) -> None:
    """<meta name=...> -> @property (transform/metaname.py:14-28)."""
    for meta in root.getElementsByTagName("meta"):
        if meta.hasAttribute("name") and not meta.hasAttribute("property"):
            meta.setAttribute("property", meta.getAttribute("name"))


def openid_transform(root, options, state) -> None:
    """rel="openid.X" -> openid:X + ns decl (transform/OpenID.py:24-63)."""
    found = False
    for link in root.getElementsByTagName("link"):
        if link.hasAttribute("rel") and "openid." in link.getAttribute("rel"):
            rel = link.getAttribute("rel")
            link.setAttribute("rel", rel.replace("openid.", "openid:"))
            found = True
    if found:
        root.setAttribute("xmlns:openid", "http://xmlns.openid.net/auth#")


def dublincore_transform(root, options, state) -> None:
    """Dublin Core link/meta rewrite (transform/DublinCore.py:25-96)."""
    dc_prefixes = {}
    for link in root.getElementsByTagName("link"):
        rel = link.getAttribute("rel") if link.hasAttribute("rel") else ""
        if rel.startswith("schema.") and link.hasAttribute("href"):
            prefix = rel[len("schema."):]
            if prefix:
                dc_prefixes[prefix] = link.getAttribute("href")
                root.setAttribute("xmlns:%s" % prefix, link.getAttribute("href"))
    if not dc_prefixes:
        return
    for tagname in ("link", "meta"):
        for el in root.getElementsByTagName(tagname):
            for attr in ("rel", "rev", "name"):
                if el.hasAttribute(attr):
                    val = el.getAttribute(attr)
                    parts = val.split(".", 1)
                    if len(parts) == 2 and parts[0] in dc_prefixes:
                        curie = "%s:%s" % (parts[0], parts[1])
                        if attr == "name":
                            el.setAttribute("property", curie)
                        else:
                            el.setAttribute(attr, curie)


_LITE_ATTRS = frozenset(["rel", "rev", "about", "content", "datatype", "inlist"])


def lite_prune(root, options, state) -> None:
    """Warn on non-RDFa-Lite attributes (transform/lite.py:17-71); no pruning."""
    for el in root.iter_elements():
        for attr in list(el.attrs):
            if attr in _LITE_ATTRS:
                if attr == "rel":
                    if el.tag != "link":
                        options.add_warning(
                            "Attribute @%s is not used in RDFa Lite" % attr, node=el.tag
                        )
                else:
                    options.add_warning(
                        "Attribute @%s is not used in RDFa Lite" % attr, node=el.tag
                    )
