"""JSON-LD serializer (and a mini reader used for round-trip checks).

Matches the observable shape of the reference's serializer
(``/root/reference/pyRdfaExtras/serializers/jsonserializer.py:1-409``):
a ``@context`` of the prefixes actually used, one node object per
subject under ``@graph``, ``@type`` for ``rdf:type`` IRI objects,
compact IRIs where they split cleanly, ``@value``/``@language``/
``@type`` literal objects, ``@id`` object references and ``_:label``
blank nodes.

Deviations (determinism): fully sorted output (``sort_keys`` + sorted
subjects/values); every serialization round-trips through
``jsonld_to_graph`` to an isomorphic graph — the reference has no
reader (rdflib-json was external).
"""

from __future__ import annotations

import json

from .terms import BNODE, IRI, LIT, RDF_NS
from .turtle import TurtleSerializer

RDF_TYPE_IRI = RDF_NS + "type"


class JsonLdSerializer:
    """Reusable (per-actor) serializer; prefix handling shared with the
    Turtle serializer (same initial-context table)."""

    def __init__(self, prefixes: dict[str, str] | None = None):
        self._tt = TurtleSerializer(prefixes)

    def _compact(self, uri: str, used: set) -> str:
        q = self._tt.qname(uri)
        if q is not None:
            used.add(q.split(":", 1)[0])
            return q
        return uri

    def _node_ref(self, t) -> str:
        return "_:%s" % t[1] if t[0] == BNODE else t[1]

    def to_obj(self, triples) -> dict:
        """Term-tuple triples -> JSON-LD dict (not yet a string)."""
        used: set = set()
        nodes: dict[str, dict] = {}
        for (s, p, o) in triples:
            sid = self._node_ref(s)
            node = nodes.setdefault(sid, {"@id": sid})
            if p[1] == RDF_TYPE_IRI and o[0] == IRI:
                node.setdefault("@type", []).append(self._compact(o[1], used))
                continue
            key = self._compact(p[1], used)
            if o[0] == LIT:
                _, value, lang, datatype = o
                if datatype:
                    val = {"@value": value, "@type": self._compact(datatype, used)}
                elif lang:
                    val = {"@value": value, "@language": lang}
                else:
                    val = {"@value": value}
            else:
                val = {"@id": self._node_ref(o)}
            node.setdefault(key, []).append(val)

        def _vkey(v):
            return json.dumps(v, sort_keys=True)

        graph = []
        for sid in sorted(nodes):
            node = nodes[sid]
            for k, vals in node.items():
                if k == "@id":
                    continue
                if k == "@type":
                    node[k] = sorted(set(vals))
                else:
                    uniq = {_vkey(v): v for v in vals}
                    node[k] = [uniq[kk] for kk in sorted(uniq)]
            graph.append(node)
        ctx = {p: self._tt.prefixes[p] for p in sorted(used)}
        return {"@context": ctx, "@graph": graph}

    def serialize(self, triples) -> str:
        return json.dumps(self.to_obj(triples), sort_keys=True, indent=2)


def graph_to_jsonld(triples, prefixes: dict[str, str] | None = None) -> str:
    return JsonLdSerializer(prefixes).serialize(triples)


# ---------------------------------------------------------------------------
# Mini reader (round-trip verification only; the flattened subset the
# serializer emits, not general JSON-LD).


def _expand(name: str, ctx: dict) -> str:
    if ":" in name:
        prefix, local = name.split(":", 1)
        if prefix in ctx:
            return ctx[prefix] + local
    return name


def jsonld_to_graph(text: str, bnodes) -> set:
    """Parse the serializer's output back into term-tuple triples.
    ``bnodes``: a BnodeGen — ``_:label`` references map to fresh stable
    labels (same per-document scope as the Turtle subset parser)."""
    from .terms import iri, literal

    doc = json.loads(text)
    ctx = doc.get("@context", {})
    local: dict[str, tuple] = {}

    def node_term(ref: str):
        if ref.startswith("_:"):
            label = ref[2:]
            if label not in local:
                local[label] = bnodes.new()
            return local[label]
        return iri(_expand(ref, ctx))

    triples: set = set()
    for node in doc.get("@graph", []):
        s = node_term(node["@id"])
        for k, vals in node.items():
            if k == "@id":
                continue
            if k == "@type":
                for t in vals:
                    triples.add((s, iri(RDF_TYPE_IRI), iri(_expand(t, ctx))))
                continue
            p = iri(_expand(k, ctx))
            for v in vals:
                if "@id" in v:
                    triples.add((s, p, node_term(v["@id"])))
                elif "@type" in v:
                    triples.add(
                        (s, p, literal(v["@value"], datatype=_expand(v["@type"], ctx)))
                    )
                elif "@language" in v:
                    triples.add((s, p, literal(v["@value"], lang=v["@language"])))
                else:
                    triples.add((s, p, literal(v["@value"])))
    return triples
