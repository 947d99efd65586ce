"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents wrapped as
    transcript turns -> RDFa distill -> entity link -> canonicalize.
    Returns the canonicalized triples Dataset."""
    from rdfa_ray.pipelines.queries import q_rdfa_canonical_subjects  # noqa: F401
    import ray

    from rdfa_ray.pipelines.flagship import build_triples
    from rdfa_ray.sources.aliases import build_alias_table
    from rdfa_ray.sources.transcripts import typed_transcripts_from_documents
    from rdfa_ray.stages.canonicalize import canonicalize
    from rdfa_ray.stages.link import link_batch_augmenting

    sf_dir = "/root/testdata/sf0.001"
    turns = typed_transcripts_from_documents(sf_dir, with_alias=True)
    triples = build_triples(turns)
    alias_ref = ray.put(build_alias_table())
    augmented = triples.map_batches(
        link_batch_augmenting,
        fn_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return canonicalize(augmented)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (and the training-data op families).  Each callable takes sf_dir."""
    from rdfa_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (others are
    intentionally omitted -> driver's rows-only check)."""
    from rdfa_ray.pipelines.queries import ORACLE_SQL, bpe_oracle_sql

    out = dict(ORACLE_SQL)
    # golden-file oracles (deterministic ops with no SQL formulation):
    # built lazily here from the independent sequential reference, keyed
    # by a corpus fingerprint the SQL recomputes
    out.update(bpe_oracle_sql())
    return out
