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

import hashlib

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


# Per-process memo of built expansion maps — the actor-memory analogue
# of the reference's pickled vocab cache (rdfs/cache.py:89-334).  Keyed
# on (cache generation, vocab URI set): bumping
# ``options.vocab_cache_generation`` invalidates every memo entry, the
# same way the reference's expiration date forces a re-fetch — swap the
# config-fed ``vocab_graphs`` content AND bump the generation to
# refresh.  Bounded; cleared wholesale when it outgrows the cap.
_EXPANSION_MEMO: dict = {}
_EXPANSION_MEMO_CAP = 64


def _validated_vocab_triples(uri: str, g, options) -> set:
    """The reference records unparseable vocabulary documents as
    processor-graph errors and continues without them
    (rdfs/cache.py:186-211); the config-fed analogue: entries that are
    not well-formed term-tuple triples are dropped with a
    VocabReferenceError diagnostic instead of crashing the closure."""
    ok: set = set()
    bad = 0
    for t in g:
        if (
            isinstance(t, tuple)
            and len(t) == 3
            and all(isinstance(x, tuple) and len(x) >= 2 for x in t)
        ):
            ok.add(t)
        else:
            bad += 1
    if bad:
        options.add_warning(
            "Vocabulary graph for <%s> contains %d malformed triple(s);"
            " they were skipped" % (uri, bad),
            warning_type="http://www.w3.org/ns/rdfa#VocabReferenceError",
        )
    return ok


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
        vocab_graph |= _validated_vocab_triples(uri, g, options)
    if not vocab_graph:
        return graph
    # key includes a full content digest (schema graphs are small, so
    # sorting+hashing is cheap next to the closure) — two configs
    # feeding different triples under the same URI can never
    # cross-contaminate, and unlike Python hash() a cryptographic
    # digest cannot collide in practice; the generation remains the
    # explicit refresh control mirroring the reference's expiration date
    digest = hashlib.sha256(
        "\x1e".join(sorted("\x1f".join(map(str, t)) for t in vocab_graph)).encode()
    ).hexdigest()
    memo_key = (
        getattr(options, "vocab_cache_generation", 0),
        frozenset(vocabs),
        digest,
    )
    maps = _EXPANSION_MEMO.get(memo_key)
    if maps is None:
        if len(_EXPANSION_MEMO) >= _EXPANSION_MEMO_CAP:
            _EXPANSION_MEMO.clear()
        maps = build_expansion_maps(vocab_graph)
        _EXPANSION_MEMO[memo_key] = maps
    prop_map, class_map = maps
    expanded = expand_data_graph(set(graph), prop_map, class_map)
    # reference: add vocab triples, expand, then remove ONLY the literal
    # vocab triples it merged in (rdfs/process.py:293-299) — NOT their
    # closure; a schema triple asserted by the document itself (even if
    # derivable from the vocab) stays in the output.
    expanded -= set(vocab_graph)
    graph.clear()
    graph |= expanded
    return graph
