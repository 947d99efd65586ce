"""Turtle serializer.

Matches the observable semantics of the reference's serializer
(``/root/reference/pyRdfaExtras/serializers/turtleserializer.py:1-232``):
a ``@prefix`` table seeded from the RDFa initial context (only the
prefixes actually used are declared), subject grouping with ``;`` /
``,`` continuation, ``a`` for ``rdf:type``, prefixed names where the
URI splits cleanly, double-quoted literals with ECHAR escaping and
``@lang`` / ``^^datatype`` suffixes.

Two deliberate deviations, both for determinism and round-tripping:

* output is fully sorted (subjects, then predicates, then objects) —
  the reference's ordering follows rdflib store iteration;
* literals are always single-line double-quoted (never ``\"\"\"``
  long strings) and prefixed names are emitted only when the local
  part is re-tokenizable by the engine's own Turtle subset parser
  (``rdfa_ray.kernel.embedded``), so every serialization round-trips
  through ``parse_turtle`` to an isomorphic graph.
"""

from __future__ import annotations

import re

from ..kernel.context import RDFA_11_NS
from .terms import BNODE, IRI, LIT, RDF_NS

# PN shapes kept strictly inside BOTH the Turtle spec's PN_LOCAL and
# the subset parser's pname token (kernel/embedded.py _TOKEN_RE):
# leading word char, then word chars / '-' / %HH percent-escapes.
# '/', '#' and bare '%' are ILLEGAL in standard PN_LOCAL ('#' even
# starts a comment) — emitting them would produce documents only the
# engine's lenient parser accepts, so such locals fall back to the
# full <IRI> form.  No '.' either: a trailing one would eat the
# statement dot.
_PN_PREFIX_RE = re.compile(r"[A-Za-z_][\w.-]*\Z")
_PN_LOCAL_RE = re.compile(r"\w(?:[\w\-]|%[0-9A-Fa-f]{2})*\Z")

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}

RDF_TYPE_IRI = RDF_NS + "type"


def _escape(value: str) -> str:
    return "".join(_ESCAPES.get(ch, ch) for ch in value)


def default_prefix_table() -> dict[str, str]:
    """prefix -> namespace URI, seeded from the initial context
    (reference startDocument binds the context prefixes; here dedup'd
    deterministically: for namespaces bound to several prefixes, the
    alphabetically first prefix wins)."""
    by_uri: dict[str, str] = {}
    for prefix in sorted(RDFA_11_NS):
        uri = RDFA_11_NS[prefix]
        if uri not in by_uri:
            by_uri[uri] = prefix
    return {p: u for u, p in by_uri.items()}


class TurtleSerializer:
    """Reusable (per-actor) serializer holding the prefix tables."""

    def __init__(self, prefixes: dict[str, str] | None = None):
        self.prefixes = dict(default_prefix_table() if prefixes is None else prefixes)
        # longest namespace first so the most specific prefix wins
        self._ns_sorted = sorted(
            self.prefixes.items(), key=lambda kv: (-len(kv[1]), kv[0])
        )

    def qname(self, uri: str) -> str | None:
        for prefix, ns in self._ns_sorted:
            if uri.startswith(ns):
                local = uri[len(ns):]
                if local and _PN_LOCAL_RE.match(local) and _PN_PREFIX_RE.match(prefix):
                    return "%s:%s" % (prefix, local)
        return None

    def term(self, t, used: set, as_predicate: bool = False) -> str:
        kind = t[0]
        if kind == IRI:
            if as_predicate and t[1] == RDF_TYPE_IRI:
                return "a"
            q = self.qname(t[1])
            if q is not None:
                used.add(q.split(":", 1)[0])
                return q
            return "<%s>" % t[1]
        if kind == BNODE:
            return "_:%s" % t[1]
        if kind == LIT:
            _, value, lang, datatype = t
            body = '"%s"' % _escape(value)
            if datatype:
                q = self.qname(datatype)
                if q is not None:
                    used.add(q.split(":", 1)[0])
                    return "%s^^%s" % (body, q)
                return "%s^^<%s>" % (body, datatype)
            if lang:
                return "%s@%s" % (body, lang.lower())
            return body
        raise ValueError("unknown term kind: %r" % (t,))

    def serialize(self, triples) -> str:
        """Iterable of term-tuple triples -> Turtle document text.
        Deterministic: sorted subjects / predicates / objects."""
        used: set[str] = set()
        by_subject: dict[str, dict[str, list[str]]] = {}
        for (s, p, o) in triples:
            s_s = self.term(s, used)
            p_s = self.term(p, used, as_predicate=True)
            o_s = self.term(o, used)
            by_subject.setdefault(s_s, {}).setdefault(p_s, []).append(o_s)

        lines = []
        for subj in sorted(by_subject):
            preds = by_subject[subj]
            pred_parts = []
            # 'a' sorts first, matching the reference's type-first habit
            for pred in sorted(preds, key=lambda x: (x != "a", x)):
                objs = ", ".join(sorted(set(preds[pred])))
                pred_parts.append("%s %s" % (pred, objs))
            lines.append("%s %s ." % (subj, " ;\n    ".join(pred_parts)))

        header = [
            "@prefix %s: <%s> ." % (p, self.prefixes[p]) for p in sorted(used)
        ]
        body = "\n\n".join(lines)
        if header and body:
            return "\n".join(header) + "\n\n" + body + "\n"
        if body:
            return body + "\n"
        return "\n".join(header) + ("\n" if header else "")


def graph_to_turtle(triples, prefixes: dict[str, str] | None = None) -> str:
    return TurtleSerializer(prefixes).serialize(triples)
