"""Generic joins for two large sides (neither broadcastable).

The portable Ray Data pattern (no reliance on a version-specific
``Dataset.join``): add ``__bucket = hash(key) % B`` to BOTH sides, tag
the side, align the two schemas (null-padding), union, and hash-join
each ``groupby(__bucket)`` group with a vectorized pandas merge.  B is
sized so a bucket's build side fits a worker's heap; hot keys are
handled by the uniform hash (raise B to sub-split further — each
bucket's cost is O(rows_in_bucket)).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_PY_TO_PA = {str: pa.string(), int: pa.int64(), float: pa.float64(),
             bool: pa.bool_(), bytes: pa.binary()}


def _pa_type(t):
    """Ray Schema.types may hold Python types (pandas-produced
    datasets) instead of Arrow DataTypes; normalize."""
    if isinstance(t, pa.DataType):
        return t
    if t in _PY_TO_PA:
        return _PY_TO_PA[t]
    try:
        return pa.from_numpy_dtype(t)
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def bucketed_hash_join(
    left_ds,
    right_ds,
    on: str,
    n_buckets: int = 64,
    how: str = "inner",
    suffix: str = "_r",
    left_distinct: list | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    salt: int = 1,
):
    """Join two Datasets on a single key column; right-side name
    collisions (other than the key) get ``suffix``.

    ``how``: ``'inner'``, ``'left'``, ``'right'``, ``'outer'`` (full),
    ``'semi'`` (left rows with >= 1 right match; left columns only,
    each left row at most once) or ``'anti'`` (left rows with NO right
    match).  The tagged-union design co-locates BOTH sides of a key in
    one bucket, so right/full-outer are exact — the per-bucket
    early-out is mode-aware (a bucket empty on the preserved side
    still emits the other side's rows, null-padded).  For semi/anti
    the right side only contributes its key column — callers should
    pre-select it so only 8-byte keys shuffle.

    ``left_schema`` / ``right_schema``: optional ``pa.Schema`` for the
    corresponding side.  ``Dataset.schema()`` on a lazy multi-stage
    input EXECUTES the upstream pipeline (sorts included) just to see
    one block — a caller that already knows its column types should
    always pass them so plan construction stays free.

    ``left_distinct``: optional key-column list including ``on`` — dedup the
    left side on those columns inside each bucket before merging
    (deterministic: rows sorted on all left columns, first kept).
    Because the bucket key is ``on``, every duplicate of a
    ``left_distinct`` group lands in the same bucket, so this equals a
    global distinct WITHOUT paying a separate shuffle — used by
    ``minhash_dedup`` to fold its candidate-pair dedup into the join.
    """
    if how not in ("inner", "left", "right", "outer", "semi", "anti"):
        raise ValueError(
            "bucketed_hash_join supports how='inner'/'left'/'right'/"
            "'outer'/'semi'/'anti' only, got %r" % how
        )
    # ``salt`` > 1: hot-KEY splitting.  Raising n_buckets cannot split
    # ONE key (all its rows hash to one bucket); salting can: each left
    # row lands in sub-bucket base*salt + crc32(row)%salt, and the
    # right side replicates into ALL ``salt`` sub-buckets, so a whale
    # key's probe rows spread over ``salt`` parallel merges at the cost
    # of a salt-fold right-side shuffle.  Exact for the left-preserving
    # modes (each left row meets the full right partition for its key
    # exactly once); right/full-outer would emit right rows once per
    # sub-bucket, so they refuse.  Fully-identical left rows share a
    # salt — row-level duplicates need ``left_distinct``, not salt.
    if salt > 1 and how in ("right", "outer"):
        raise ValueError(
            "salt > 1 would duplicate right-side rows under how=%r "
            "(right rows replicate into every sub-bucket)" % how
        )
    if salt > 1 and left_distinct:
        # the sub-bucket salt hashes ALL left columns, so rows equal on
        # left_distinct but differing elsewhere land in different
        # sub-buckets and the per-bucket drop_duplicates is no longer a
        # global distinct
        raise ValueError(
            "salt > 1 breaks the left_distinct global-dedup guarantee "
            "(duplicates spread across sub-buckets); pre-distinct the "
            "left side instead"
        )
    salt = max(1, int(salt))
    # pa.Schema and ray Schema expose the same .names/.types surface
    left_schema = left_schema if left_schema is not None else left_ds.schema()
    right_schema = (
        right_schema if right_schema is not None else right_ds.schema()
    )
    left_cols = list(left_schema.names)
    rename = {
        c: (c + suffix if c in left_cols and c != on else c)
        for c in right_schema.names
    }
    right_cols = [rename[c] for c in right_schema.names if c != on]
    left_types = {n: _pa_type(t) for n, t in zip(left_schema.names, left_schema.types)}
    right_types = {
        rename[n]: _pa_type(t)
        for n, t in zip(right_schema.names, right_schema.types)
        if n != on
    }
    all_cols = left_cols + right_cols  # key stays in left position

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from ..functions.hashing import crc32_bucket

            def typed(col, want):
                # align actual to declared (e.g. a large_string block
                # meeting a string declaration) so the union's blocks
                # share ONE schema; no-op when they already match
                return col if col.type == want else pc.cast(col, want)

            n = batch.num_rows
            out = {}
            if side == "l":
                for c in left_cols:
                    out[c] = typed(batch.column(c), left_types[c])
                for c in right_cols:
                    out[c] = pa.nulls(n, right_types[c])
            else:
                for c in left_cols:
                    if c == on:
                        out[c] = typed(batch.column(on), left_types[on])
                    else:
                        out[c] = pa.nulls(n, left_types[c])
                inv = {v: k for k, v in rename.items()}
                for c in right_cols:
                    out[c] = typed(batch.column(inv[c]), right_types[c])
            base = crc32_bucket(batch.column(on), n_buckets)
            if salt == 1:
                out["__bucket"] = base
                out["__side"] = pa.array([side] * n, pa.string())
                return pa.Table.from_pydict(out)
            import numpy as np

            from ..functions.hashing import crc32_bucket_concat

            base_np = base.to_numpy(zero_copy_only=False).astype(np.int32)
            out["__side"] = pa.array([side] * n, pa.string())
            if side == "l":
                srow = crc32_bucket_concat(
                    batch, left_cols, salt
                ).to_numpy(zero_copy_only=False).astype(np.int32)
                out["__bucket"] = pa.array(base_np * salt + srow, pa.int32())
                return pa.Table.from_pydict(out)
            t0 = pa.Table.from_pydict(out)
            return pa.concat_tables(
                t0.append_column(
                    "__bucket", pa.array(base_np * salt + s, pa.int32())
                )
                for s in range(salt)
            )

        return fn

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )

    join_cols_l = left_cols
    join_cols_r = [on] + right_cols

    # The per-bucket kernel converts its Arrow group to pandas with
    # MASKED integer dtypes (see _int_preserving_df) and emits Arrow
    # with one explicit schema — block schemas stay stable and int64
    # values above 2^53 survive the null-padded union bit-exactly.
    out_cols = left_cols if how in ("semi", "anti") else all_cols
    out_schema = pa.schema(
        [(c, {**left_types, **right_types}[c]) for c in out_cols]
    )
    empty_table = out_schema.empty_table()

    def _int_preserving_df(group: pa.Table) -> pd.DataFrame:
        # Arrow -> pandas decays int columns containing nulls (the
        # union's padding) to float64, silently corrupting values above
        # 2^53 (e.g. packed/hashed 63-bit ids); masked integer dtypes
        # keep every bit exact through the merge
        def mapper(t):
            if pa.types.is_int64(t):
                return pd.Int64Dtype()
            if pa.types.is_int32(t):
                return pd.Int32Dtype()
            if pa.types.is_int16(t):
                return pd.Int16Dtype()
            if pa.types.is_int8(t):
                return pd.Int8Dtype()
            if pa.types.is_uint64(t):
                return pd.UInt64Dtype()
            if pa.types.is_uint32(t):
                return pd.UInt32Dtype()
            return None

        return group.to_pandas(types_mapper=mapper)

    def join_bucket(arrow_group: pa.Table) -> pa.Table:
        group = _int_preserving_df(arrow_group)
        l = group[group["__side"] == "l"][join_cols_l]
        r = group[group["__side"] == "r"][join_cols_r]
        # mode-aware early-out: empty only when the preserved side(s)
        # cannot produce a row
        if (
            (how in ("inner", "semi") and (len(l) == 0 or len(r) == 0))
            or (how in ("left", "anti") and len(l) == 0)
            or (how == "right" and len(r) == 0)
            or (how == "outer" and len(l) == 0 and len(r) == 0)
        ):
            return empty_table
        if left_distinct:
            l = l.sort_values(join_cols_l, kind="mergesort").drop_duplicates(
                left_distinct
            )
        if how in ("semi", "anti"):
            mask = l[on].isin(r[on].unique())
            merged = l[mask] if how == "semi" else l[~mask]
        else:
            merged = l.merge(r, on=on, how=how)
        # strip the b'pandas' schema metadata: blocks must be
        # byte-identical in schema to the metadata-less empty_table
        return pa.Table.from_pandas(
            merged[out_cols], schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return tagged.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )
