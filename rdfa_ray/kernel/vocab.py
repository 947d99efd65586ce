"""Vocabulary expansion: the mini RDFS/OWL entailment required by RDFa.

Reference: ``/root/reference/pyRdfa/rdfs/process.py:140-303``
(``MiniOWL.closure`` + ``process_rdfa_sem``).  Rules: prp-spo1,
prp-eqp1, prp-eqp2, cax-sco, cax-eqc1, cax-eqc2.

Deviation (documented, SURVEY.md §2.4 A3): there is no network, so
vocabulary graphs are **config inputs** (``KernelOptions.vocab_graphs``:
vocab URI -> iterable of triples) instead of HTTP-dereferenced
documents; the pickle cache (rdfs/cache.py) is replaced by actor
memory.  The expansion itself is a map-side broadcast-join: the schema
closure is computed once (driver-side / per-actor) and the data pass is
a lookup per triple — see ``rdfa_ray.stages.distill``.
"""

from __future__ import annotations

from ..rdf.terms import OWL_NS, RDF_NS, RDFS_NS, iri

TYPE = iri(RDF_NS + "type")
SUB_CLASS = iri(RDFS_NS + "subClassOf")
SUB_PROP = iri(RDFS_NS + "subPropertyOf")
EQ_PROP = iri(OWL_NS + "equivalentProperty")
EQ_CLASS = iri(OWL_NS + "equivalentClass")
USES_VOCAB = iri("http://www.w3.org/ns/rdfa#usesVocabulary")


def schema_closure(vocab_graph: set) -> set:
    """Transitive closure on the schema triples only (the
    ``schema_semantics=True`` branch of MiniOWL, rdfs/process.py:209-229)."""
    graph = set(vocab_graph)
    changed = True
    while changed:
        added = set()
        for (s, p, o) in graph:
            if p == SUB_PROP:
                for (s2, p2, o2) in graph:
                    if s2 == o and p2 == SUB_PROP:
                        added.add((s, SUB_PROP, o2))
            elif p == EQ_PROP:
                for (s2, p2, o2) in graph:
                    if p2 == EQ_PROP and s2 == o:
                        added.add((s, EQ_PROP, o2))
                    if p2 == EQ_PROP and o2 == s:
                        added.add((s2, EQ_PROP, o))
            elif p == SUB_CLASS:
                for (s2, p2, o2) in graph:
                    if s2 == o and p2 == SUB_CLASS:
                        added.add((s, SUB_CLASS, o2))
            elif p == EQ_CLASS:
                for (s2, p2, o2) in graph:
                    if p2 == EQ_CLASS and s2 == o:
                        added.add((s, EQ_CLASS, o2))
                    if p2 == EQ_CLASS and o2 == s:
                        added.add((s2, EQ_CLASS, o))
        added -= graph
        changed = bool(added)
        graph |= added
    return graph


def build_expansion_maps(vocab_graph: set):
    """Precompute lookup maps so the data pass is O(1) per triple:
    prop -> set of implied props; class -> set of implied classes."""
    closed = schema_closure(vocab_graph)
    prop_map: dict = {}
    class_map: dict = {}
    for (s, p, o) in closed:
        if p == SUB_PROP:
            prop_map.setdefault(s, set()).add(o)
        elif p == EQ_PROP:
            prop_map.setdefault(s, set()).add(o)
            prop_map.setdefault(o, set()).add(s)
        elif p == SUB_CLASS:
            class_map.setdefault(s, set()).add(o)
        elif p == EQ_CLASS:
            class_map.setdefault(s, set()).add(o)
            class_map.setdefault(o, set()).add(s)
    return prop_map, class_map


def expand_data_graph(graph: set, prop_map: dict, class_map: dict) -> set:
    """One data pass is sufficient once the schema side is closed
    (rdfs/process.py:289 comment): every derived triple's predicate /
    class is reachable directly through the closed maps."""
    added = set()
    for (s, p, o) in graph:
        implied = prop_map.get(p)
        if implied:
            for p2 in implied:
                added.add((s, p2, o))
        if p == TYPE:
            implied_c = class_map.get(o)
            if implied_c:
                for c2 in implied_c:
                    added.add((s, TYPE, c2))
    # types introduced by equivalent/sub classes of *derived* types are
    # already covered because class_map is transitively closed; same for
    # properties.  Iterate once more defensively for eq-chains through
    # both maps (cheap: only over the added set).
    extra = set()
    for (s, p, o) in added:
        implied = prop_map.get(p)
        if implied:
            for p2 in implied:
                extra.add((s, p2, o))
        if p == TYPE:
            implied_c = class_map.get(o)
            if implied_c:
                for c2 in implied_c:
                    extra.add((s, TYPE, c2))
    return graph | added | extra


def process_rdfa_sem(graph: set, options) -> set:
    """rdfs/process.py:253-303 with config-supplied vocab graphs."""
    vocabs = {o[1] for (s, p, o) in graph if p == USES_VOCAB}
    if not vocabs:
        return graph
    vocab_graph: set = set()
    for uri in vocabs:
        g = options.vocab_graphs.get(uri)
        if g is None:
            options.add_warning(
                "Vocabulary graph for <%s> is not available in the configuration; skipped" % uri,
                warning_type="http://www.w3.org/ns/rdfa#VocabReferenceError",
            )
            continue
        vocab_graph |= set(g)
    if not vocab_graph:
        return graph
    prop_map, class_map = build_expansion_maps(vocab_graph)
    expanded = expand_data_graph(set(graph), prop_map, class_map)
    # reference: add vocab triples, expand, then remove ONLY the literal
    # vocab triples it merged in (rdfs/process.py:293-299) — NOT their
    # closure; a schema triple asserted by the document itself (even if
    # derivable from the vocab) stays in the output.
    expanded -= set(vocab_graph)
    graph.clear()
    graph |= expanded
    return graph
