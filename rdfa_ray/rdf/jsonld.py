"""JSON-LD serializer (and a mini reader used for round-trip checks).

Matches the observable shape of the reference's serializer
(``/root/reference/pyRdfaExtras/serializers/jsonserializer.py:1-409``):
a ``@context`` of the prefixes actually used, one node object per
subject under ``@graph``, ``@type`` for ``rdf:type`` IRI objects,
compact IRIs where they split cleanly, ``@value``/``@language``/
``@type`` literal objects, ``@id`` object references and ``_:label``
blank nodes.

Well-formed rdf:List chains (bnode nodes carrying exactly one
rdf:first + one rdf:rest, each referenced exactly once, ending in
rdf:nil) are compacted to ``@list`` arrays — matching the reference
serializer's list handling; ``rdf:nil`` objects become ``@list: []``.
Shared or irregular list structure stays as plain first/rest triples
(``@list`` cannot express sharing).

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
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"


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

    def _find_lists(self, triples):
        """Detect well-formed rdf:List chains compactable to ``@list``.

        Returns (items_of, consumed): ``items_of`` maps a chain head's
        ``(kind, id)`` to its item terms; ``consumed`` is the set of
        list-node keys whose first/rest triples must be dropped.  A
        node qualifies only if it is a bnode with EXACTLY one
        rdf:first + one rdf:rest (no other properties) and exactly one
        incoming reference — anything irregular or shared keeps its
        plain triples (reference list handling:
        pyRdfaExtras/serializers/jsonserializer.py)."""
        by_subj: dict = {}
        refs: dict = {}
        for (s, p, o) in triples:
            by_subj.setdefault(s[:2], []).append((p, o))
            if o[0] in (IRI, BNODE):
                refs[o[:2]] = refs.get(o[:2], 0) + 1
        candidates = {}
        for skey, pos in by_subj.items():
            if skey[0] != BNODE or len(pos) != 2:
                continue
            preds = sorted(p[1] for p, o in pos)
            if preds != sorted([RDF_FIRST, RDF_REST]):
                continue
            if refs.get(skey, 0) != 1:
                continue
            first = next(o for p, o in pos if p[1] == RDF_FIRST)
            rest = next(o for p, o in pos if p[1] == RDF_REST)
            candidates[skey] = (first, rest)

        items_of: dict = {}
        consumed: set = set()
        for head in candidates:
            items, chain, cur, ok = [], [], head, True
            seen: set = set()
            while True:
                if cur in seen:  # cycle
                    ok = False
                    break
                seen.add(cur)
                if cur not in candidates:
                    ok = False
                    break
                first, rest = candidates[cur]
                items.append(first)
                chain.append(cur)
                if rest[0] == IRI:
                    ok = rest[1] == RDF_NIL
                    break
                if rest[0] != BNODE:
                    ok = False
                    break
                cur = rest[:2]
            if ok:
                items_of[head] = items
                consumed.update(chain)
        # a head that is itself mid-chain of a longer valid list is
        # already consumed by the outer chain; keep only maximal heads
        # that are NOT another chain's non-head member
        non_heads = set()
        for head, items in items_of.items():
            _, rest = candidates[head]
            cur = rest
            while cur[0] == BNODE and cur[:2] in candidates:
                non_heads.add(cur[:2])
                cur = candidates[cur[:2]][1]
        for nh in non_heads:
            items_of.pop(nh, None)
        return items_of, consumed

    def to_obj(self, triples) -> dict:
        """Term-tuple triples -> JSON-LD dict (not yet a string)."""
        used: set = set()
        triples = list(triples)
        items_of, consumed = self._find_lists(triples)

        def conv(o):
            if o[0] == LIT:
                _, value, lang, datatype = o
                if datatype:
                    return {"@value": value, "@type": self._compact(datatype, used)}
                if lang:
                    return {"@value": value, "@language": lang.lower()}
                return {"@value": value}
            if o[0] == IRI and o[1] == RDF_NIL:
                return {"@list": []}
            if o[0] == BNODE and o[:2] in items_of:
                return {"@list": [conv(i) for i in items_of[o[:2]]]}
            return {"@id": self._node_ref(o)}

        nodes: dict[str, dict] = {}
        for (s, p, o) in triples:
            if s[:2] in consumed:
                continue  # folded into an @list array
            sid = self._node_ref(s)
            node = nodes.setdefault(sid, {"@id": sid})
            if p[1] == RDF_TYPE_IRI and o[0] == IRI:
                node.setdefault("@type", []).append(self._compact(o[1], used))
                continue
            key = self._compact(p[1], used)
            node.setdefault(key, []).append(conv(o))

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
    if isinstance(doc, list):
        # a bare top-level node array is valid JSON-LD shape — treat
        # it as an implicit @graph with an empty context
        doc = {"@graph": doc}
    if not isinstance(doc, dict):
        raise ValueError("malformed JSON-LD: top level must be an object"
                         " or node array, got %s" % type(doc).__name__)
    if "@graph" not in doc and "@id" in doc:
        # single top-level node object
        doc = {"@context": doc.get("@context", {}), "@graph": [doc]}
    ctx = doc.get("@context", {})
    if not isinstance(ctx, dict):
        raise ValueError("malformed JSON-LD: @context must be an object")
    local: dict[str, tuple] = {}

    def node_term(ref: str):
        if ref.startswith("_:"):
            label = ref[2:]
            if label not in local:
                local[label] = bnodes.new()
            return local[label]
        return iri(_expand(ref, ctx))

    triples: set = set()

    def value_term(v):
        """JSON value object -> term; @list arrays re-expand into
        first/rest chains (fresh bnodes), [] -> rdf:nil."""
        if "@list" in v:
            items = [value_term(i) for i in v["@list"]]
            nxt = iri(RDF_NIL)
            for item in reversed(items):
                node = bnodes.new()
                triples.add((node, iri(RDF_FIRST), item))
                triples.add((node, iri(RDF_REST), nxt))
                nxt = node
            return nxt
        if "@id" in v:
            return node_term(v["@id"])
        if "@type" in v:
            return literal(v["@value"], datatype=_expand(v["@type"], ctx))
        if "@language" in v:
            return literal(v["@value"], lang=v["@language"].lower())
        return literal(v["@value"])

    try:
        for node in doc.get("@graph", []):
            s = node_term(node["@id"])
            for k, vals in node.items():
                if k == "@id":
                    continue
                if k == "@type":
                    for t in vals:
                        triples.add(
                            (s, iri(RDF_TYPE_IRI), iri(_expand(t, ctx)))
                        )
                    continue
                p = iri(_expand(k, ctx))
                for v in vals:
                    triples.add((s, p, value_term(v)))
    except (AttributeError, KeyError, TypeError) as e:
        # structurally malformed node objects (non-dict nodes, missing
        # @id, scalar where the expanded array form is required):
        # normalize to the reader's single typed failure mode
        raise ValueError("malformed JSON-LD node: %s" % e) from e
    return triples
