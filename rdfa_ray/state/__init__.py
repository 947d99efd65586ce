"""Where state lives in this engine (SURVEY.md §3.4):

* per-document: deterministic :class:`~rdfa_ray.kernel.state.BnodeGen`
  skolemizer (replaces the reference's process-global ``_bnodes``,
  termorcurie.py:83-85) and the evaluation-context chain — both
  kernel-local, stateless across rows.
* per-actor: warm compiled regexes / vocab expansion maps inside
  ``RdfaDistiller`` / ``EntityLinker`` (``__init__``-time setup).
* broadcast: alias dictionaries and query matrices via ``ray.put``,
  fetched once per actor/worker.
* durable: the per-partition checkpoint manifest
  (:func:`~rdfa_ray.pipelines.flagship.completed_parts`) plus the
  pinned run meta (:func:`~rdfa_ray.pipelines.flagship.load_run_meta`
  — records n_parts so resume reuses identical part ids) — the only
  cross-run state; everything else is recomputable and idempotent.
"""

from ..kernel.state import BnodeGen, EvalState, TermContext  # noqa: F401
from ..pipelines.flagship import completed_parts, load_run_meta, resolve_n_parts  # noqa: F401
