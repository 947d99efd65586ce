"""The RDFa evaluation-context kernel: per-document triple extraction.

This package reimplements, from the spec semantics, the recursive walk
of the reference (``/root/reference/pyRdfa/parse.py``, ``state.py``,
``termorcurie.py``, ``property.py``) as an *iterative* in-process
kernel suitable for use inside Ray Data ``map_batches`` actors:
deterministic (skolemized bnodes), stateless across rows, no globals.
"""

from .options import KernelOptions, Diagnostic  # noqa: F401
from .walk import distill  # noqa: F401
