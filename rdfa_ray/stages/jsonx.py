"""Vectorized JSON field extraction over string columns — the
metadata-extraction stage of a web-scale pipeline (event payloads,
crawl headers, API sidecars arrive as JSON strings; downstream
operators need typed columns).

Reference analogue: none in pyrdfa3 (its host documents are markup,
not JSON payloads) — this is one of the beyond-reference
training-data ops, same family as ``stages/extract.py`` (markup →
text) but for JSON-string columns.

Scale plan: map-only, zero shuffle.  The hot path is polars'
``str.json_path_match`` (a vectorized Rust JSON scanner — no per-row
Python); arrow blocks convert to polars zero-copy.  Malformed JSON,
a missing field, or a JSON ``null`` all yield SQL-style nulls (a
corrupt payload must not kill a 100-TB pass — same stance as the
N-Triples reader's ``on_malformed="skip"``).  If polars is ever
absent, a per-UNIQUE-value stdlib fallback keeps semantics identical
(dictionary-encode first: event payloads repeat heavily, so the
Python loop runs once per distinct payload, not per row).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

try:  # polars is in the baked image; guard anyway (import-try contract)
    import polars as _pl
except ImportError:  # pragma: no cover
    _pl = None


def _extract_strings(values: pa.ChunkedArray | pa.Array, field: str) -> pa.Array:
    """String-typed extraction of top-level ``field`` from each JSON
    document in ``values``; null for malformed/missing/JSON-null."""
    if _pl is not None:
        s = _pl.from_arrow(values if isinstance(values, pa.ChunkedArray) else pa.chunked_array([values]))
        out = s.str.json_path_match("$.%s" % field)
        arr = out.to_arrow()
        return arr.cast(pa.string()) if arr.type != pa.string() else arr

    # Stdlib fallback: decode each DISTINCT payload once.
    dictd = pc.dictionary_encode(values)
    if isinstance(dictd, pa.ChunkedArray):
        dictd = dictd.combine_chunks()
    uniq = dictd.dictionary.to_pylist()
    mapped: list[str | None] = []
    for doc in uniq:
        try:
            obj = json.loads(doc) if doc is not None else None
        except (ValueError, TypeError):
            obj = None
        v = obj.get(field) if isinstance(obj, dict) else None
        if v is None:
            mapped.append(None)
        elif isinstance(v, bool):
            mapped.append("true" if v else "false")
        elif isinstance(v, (dict, list)):
            mapped.append(json.dumps(v, separators=(",", ":")))
        else:
            mapped.append(str(v))
    lut = pa.array(mapped, pa.string())
    return pc.take(lut, dictd.indices)


def json_field(ds, column: str, field: str, out: str, dtype: pa.DataType | None = None):
    """Append column ``out`` = JSON field ``$.field`` extracted from the
    JSON-string column ``column`` of every row.

    ``dtype``: optional Arrow type to cast the (string) extraction to
    — non-coercible values become null (SQL TRY_CAST semantics), so a
    payload carrying ``"k": "abc"`` where an int is expected degrades
    to null instead of poisoning the block.
    """

    def extract(batch: pa.Table) -> pa.Table:
        vals = _extract_strings(batch.column(column), field)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if dtype is not None:
            # TRY_CAST: pyarrow cast throws on garbage; pre-null the
            # non-parsing values with a vectorized validity probe.
            if pa.types.is_integer(dtype):
                ok = pc.match_substring_regex(vals, r"^[+-]?[0-9]+$")
            elif pa.types.is_floating(dtype):
                ok = pc.match_substring_regex(
                    vals, r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
                )
            else:
                ok = None
            if ok is not None:
                vals = pc.if_else(pc.fill_null(ok, False), vals, pa.scalar(None, pa.string()))
            vals = pc.cast(vals, dtype)
        if len(vals) != batch.num_rows:  # pragma: no cover - invariant guard
            raise RuntimeError(
                "json_field extraction returned %d values for %d rows"
                % (len(vals), batch.num_rows)
            )
        return batch.append_column(out, vals)

    return ds.map_batches(extract, batch_format="pyarrow")
