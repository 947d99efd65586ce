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
