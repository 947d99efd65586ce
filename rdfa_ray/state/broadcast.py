"""Per-worker cache for ``ray.put`` broadcast objects.

The broadcast pattern for elastic map_batches TASKS: the driver
``ray.put``s a small side object once; each worker process fetches and
deserializes it ONCE (first task) and keeps it for every later batch —
the task-based counterpart of doing ``ray.get`` in an actor's
``__init__``.  A bare ``ray.get`` inside the task body would
re-deserialize the object on every batch (plasma caches the bytes, not
the Python object).
"""

from __future__ import annotations

_CACHE: dict = {}


def bcast_cached(ref):
    """Fetch ``ref`` once per worker process; single-slot cache (one
    live broadcast object per worker keeps memory bounded)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    obj = _CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        _CACHE.clear()
        _CACHE[key] = obj
    return obj
