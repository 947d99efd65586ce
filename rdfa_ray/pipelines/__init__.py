"""End-to-end pipelines: distill -> link -> canonicalize -> materialize."""

from .flagship import build_triples, run_flagship  # noqa: F401
