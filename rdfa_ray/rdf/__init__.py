"""Pure-Python RDF core: term model, N-Triples writer, graph isomorphism.

No Ray, no I/O.  Terms are plain tuples for speed/hashability; the
Arrow schema used by the pipeline flattens them into columns (see
``rdfa_ray.stages.distill``).
"""

from .terms import (  # noqa: F401
    IRI,
    BNODE,
    LIT,
    iri,
    bnode,
    literal,
    is_iri,
    is_bnode,
    is_literal,
    term_value,
    RDF_NS,
    RDFS_NS,
    XSD_NS,
    RDFA_NS,
    XHV_NS,
)
from .ntriples import triple_to_ntriples, graph_to_ntriples  # noqa: F401
from .isomorphism import isomorphic, diff_report  # noqa: F401
