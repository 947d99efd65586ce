"""Parquet read wrapper that strips file-level schema metadata.

Parquet files written through pandas carry a ``b'pandas'`` schema
metadata blob; pyarrow Schemas with ANY metadata are unhashable
(``hash(schema)`` raises ``unhashable type: 'dict'``), which knocks
Ray Data's schema-deduplication fast path (``unify_schemas``'s
``set(schemas)`` early exit) into its slow path at EVERY operator
boundary the metadata propagates through — ``append_column`` /
``filter`` chains keep it forever — and spams the log with
``Failed to hash the schemas`` warnings.  The driver's testdata
parquet has exactly this blob.

``read_parquet`` here is a drop-in for ``ray.data.read_parquet`` plus
a fused, zero-copy, whole-block metadata strip — the downstream
pipeline only ever sees clean (hashable) schemas.
"""

from __future__ import annotations

import pyarrow as pa


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    if batch.schema.metadata is None:
        return batch
    return batch.replace_schema_metadata(None)


def read_parquet(*args, **kwargs):
    import ray.data as rd

    ds = rd.read_parquet(*args, **kwargs)
    # batch_size=None: one call per block, zero-copy; fuses into the
    # consumer's map stage so no extra task round-trip is paid
    return ds.map_batches(
        _strip_schema_metadata,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
