"""``processURI``-style single-document service entry point.

Engine analogue of the reference's CGI front-end
(``/root/reference/pyRdfa/__init__.py:742-962`` ``processURI``): form
options -> Options -> distill one source -> serialized graph + media
type.  The HTTP/CGI plumbing and network fetching are out of scope (no
network in this environment — documented non-goal); the option names,
their defaults, and the graph-selection semantics are preserved:

* ``graph=[output|processor|output,processor|processor,output]``
  (default ``output``) — which graph(s) to serialize; the processor
  graph renders diagnostics as RDF (A5).
* ``space_preserve`` (default true), ``embedded_rdf``
  (default FALSE here — the CGI default at ``__init__.py:853``,
  deliberately different from the library default True),
  ``vocab_expansion`` (default false), ``rdfa_lite`` (default false),
  ``rdfa_version`` ("1.1").
* ``outputFormat``: turtle (default; any unknown string also falls
  back to turtle, matching the reference), xml, nt, json.
"""

from __future__ import annotations

from .kernel import KernelOptions, distill
from .kernel.options import diagnostics_to_triples


class _ProcessorBnodes:
    """'pg'-prefixed label space: processor-graph bnodes must never
    collide with the data graph's b*/n* skolems when both are merged
    into one output (the reference's rdflib BNode() labels are
    globally unique, so it never faces this)."""

    __slots__ = ("n",)

    def __init__(self):
        self.n = 0

    def new(self):
        label = "pg%d" % self.n
        self.n += 1
        return ("bnode", label)

_MEDIA_TYPES = {  # keyed on serialize.resolve_format canonical names
    "turtle": "text/turtle",
    "nt": "text/plain",
    "pretty-xml": "application/rdf+xml",
    "jsonld": "application/ld+json",
}


def _truthy(form: dict, key: str, default: bool) -> bool:
    # the reference also accepts the old '-' spelling (processURI's
    # _get_option backward compatibility)
    for k in (key, key.replace("_", "-")):
        if k in form:
            return str(form[k]).lower() == "true"
    return default


def process_source(
    text: str,
    output_format: str = "turtle",
    form: dict | None = None,
    base: str = "",
):
    """Distill one document under CGI-style form options.

    Returns ``(media_type, serialized_text)``.
    """
    form = form or {}
    graph_sel = str(form.get("graph", form.get("rdfagraph", "output"))).lower()
    want_output = graph_sel in ("output", "output,processor", "processor,output")
    want_processor = graph_sel in ("processor", "output,processor", "processor,output")

    options = KernelOptions(
        space_preserve=_truthy(form, "space_preserve", True),
        embedded_rdf=_truthy(form, "embedded_rdf", False),
        vocab_expansion=_truthy(form, "vocab_expansion", False),
        check_lite=_truthy(form, "rdfa_lite", False),
    )
    version = str(form.get("rdfa_version", "1.1"))

    triples, diags = distill(text, base=base, options=options, rdfa_version=version)

    graph: set = set()
    if want_output:
        graph |= triples
    if want_processor:
        graph |= diagnostics_to_triples(diags, _ProcessorBnodes())

    # full reference alias set (turtle/n3/xml/pretty-xml/nt/json-ld,
    # /root/reference/pyRdfa/__init__.py:459-466); unknown formats
    # raise instead of the reference's silent turtle fallback
    from .stages.serialize import resolve_format

    fmt = resolve_format(output_format)
    if fmt == "turtle":
        from .rdf.turtle import graph_to_turtle

        body = graph_to_turtle(graph)
    elif fmt == "pretty-xml":
        from .rdf.rdfxml import graph_to_rdfxml

        body = graph_to_rdfxml(graph)
    elif fmt == "jsonld":
        from .rdf.jsonld import graph_to_jsonld

        body = graph_to_jsonld(graph)
    else:
        from .rdf.ntriples import graph_to_ntriples

        body = graph_to_ntriples(graph) if graph else ""
    return _MEDIA_TYPES[fmt], body
