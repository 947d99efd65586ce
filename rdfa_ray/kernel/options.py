"""Kernel options and diagnostics collection.

Engine analogue of ``Options`` + the processor graph
(``/root/reference/pyRdfa/options.py:114-262``).  Instead of building
an RDF "processor graph" with wall-clock ``dc:date`` triples (which
would break determinism/idempotence under Ray task retries), warnings
and errors are collected as plain :class:`Diagnostic` records; the
pipeline emits them as rows of the diagnostics output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .context import PREDEFINED_1_0_REL

RDFA_NS = "http://www.w3.org/ns/rdfa#"
DISTILL_NS = "http://www.w3.org/2007/08/pyRdfa/vocab#"

# Diagnostic class IRIs (reference __init__.py:250-265)
RDFA_Error = RDFA_NS + "Error"
RDFA_Warning = RDFA_NS + "Warning"
RDFA_Info = RDFA_NS + "Information"
NonConformantMarkup = RDFA_NS + "DocumentError"
UnresolvablePrefix = RDFA_NS + "UnresolvedCURIE"
UnresolvableReference = RDFA_NS + "UnresolvedCURIE"
UnresolvableTerm = RDFA_NS + "UnresolvedTerm"
VocabReferenceError = RDFA_NS + "VocabReferenceError"
PrefixRedefinitionWarning = RDFA_NS + "PrefixRedefinition"
IncorrectPrefixDefinition = DISTILL_NS + "IncorrectPrefixDefinition"
IncorrectBlankNodeUsage = DISTILL_NS + "IncorrectBlankNodeUsage"
IncorrectLiteral = DISTILL_NS + "IncorrectLiteral"


@dataclass
class Diagnostic:
    severity: str            # "error" | "warning" | "info"
    dclass: str | None       # diagnostic class IRI (may be None)
    message: str
    node: str | None = None  # element tag name


@dataclass
class KernelOptions:
    """Defaults mirror ``Options.__init__`` (options.py:161-189)."""

    space_preserve: bool = True
    embedded_rdf: bool = True
    vocab_expansion: bool = False
    check_lite: bool = False
    add_informational_messages: bool = False
    # engine extension points
    transformers: tuple = ()           # extra (node, options, state) callables
    vocab_graphs: dict = field(default_factory=dict)  # vocab URI -> iterable of triples
    # bump to invalidate per-process expansion-map memos after swapping
    # vocab_graphs content (the config-fed analogue of the reference
    # cache's expiration date, rdfs/cache.py:89-334)
    vocab_cache_generation: int = 0
    host_language: str = "HTML5+RDFa"

    def __post_init__(self):
        self.diagnostics: list[Diagnostic] = []

    # reference options.py:216-262
    def add_warning(self, txt, warning_type=None, node=None, buggy_value=None):
        if warning_type == UnresolvableTerm and buggy_value in PREDEFINED_1_0_REL:
            return
        self.diagnostics.append(Diagnostic("warning", warning_type, txt, node))

    def add_error(self, txt, err_type=None, node=None, buggy_value=None):
        self.diagnostics.append(Diagnostic("error", err_type, txt, node))

    def add_info(self, txt, info_type=None, node=None, buggy_value=None):
        if self.add_informational_messages:
            self.diagnostics.append(Diagnostic("info", info_type, txt, node))


_SEVERITY_CLASS = {"error": RDFA_Error, "warning": RDFA_Warning, "info": RDFA_Info}
_DC_NS = "http://purl.org/dc/terms/"


def diagnostics_to_triples(diagnostics, bnodes):
    """Render diagnostics as processor-graph RDF triples (reference
    ``ProcessorGraph.add_triples``, options.py:41-112): a bnode typed
    rdfa:{Error,Warning,Information} (+ the specific class) with a
    dc:description.  The reference's wall-clock ``dc:date`` triple is
    deliberately omitted — it would break run determinism (idempotent
    Ray retries); the manifest carries run metadata instead."""
    from ..rdf.terms import iri, literal

    triples = set()
    for d in diagnostics:
        b = bnodes.new()
        triples.add((b, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
                     iri(_SEVERITY_CLASS[d.severity])))
        if d.dclass:
            triples.add((b, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
                         iri(d.dclass)))
        msg = "[In element '%s'] %s" % (d.node, d.message) if d.node else d.message
        triples.add((b, iri(_DC_NS + "description"), literal(msg)))
    return triples
