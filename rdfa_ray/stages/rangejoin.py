"""Windowed range join (interval join) for two large sides.

``range_join_count`` answers "for each left row, how many right rows
share its key and fall inside ``[left_ts + lo, left_ts + hi]``" — the
time-window join a training-data pipeline uses for e.g. "clicks in the
hour before each purchase" (reference analogue: none; this is one of
the extra large-scale ops, like ``stages/asof.py``).

Scale plan (the ``stages/join.py`` shape): ONE all-to-all on
``crc32(by) % n_buckets`` co-locates each key's rows from both sides;
inside a bucket everything is vectorized — ``pd.factorize`` maps keys
to dense codes, each row becomes a single int64 composite
``code * span + (ts - ts_min)``, and the per-left-row match count is
two ``np.searchsorted`` calls against the sorted right-side composites
(no per-key Python, no pairwise blow-up; the output is left-sized, and
a bucket's cost is O(n log n) in its own rows).  Composite overflow is
impossible by construction: ``code < rows_in_bucket`` and ``span`` is
the bucket's own timestamp range, so ``code * span`` stays far inside
int64 for any block that fits in memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def range_join_count(
    left_ds,
    right_ds,
    by: str,
    lo_us: int,
    hi_us: int,
    ts_col: str = "ts",
    keep: list[str] | None = None,
    keep_schema: pa.Schema | None = None,
    count_col: str = "n_matches",
    n_buckets: int = 64,
):
    """Per-left-row count of right rows with the same ``by`` and
    ``right.ts`` in the inclusive window ``[left.ts+lo_us, left.ts+hi_us]``.

    Both sides need ``by`` + ``ts_col`` (+ ``keep`` extras on the
    left).  Timestamps are compared at microsecond precision.
    Returns ``keep`` columns + ``count_col`` as a typed Arrow block
    (the union's null padding decays pandas int columns to float64;
    ``keep_schema`` — default all-int64 — restores the real types, the
    ``stages/join.py`` pattern)."""
    keep = keep or []
    if keep_schema is None:
        keep_schema = pa.schema([(c, pa.int64()) for c in keep])
    out_schema = pa.schema(list(keep_schema) + [pa.field(count_col, pa.int64())])
    empty_table = out_schema.empty_table()

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from ..functions.hashing import crc32_bucket

            n = batch.num_rows
            # normalize to us first — a timestamp[ns] input (pandas
            # default) would otherwise silently shrink the window 1000x
            ts = pc.cast(batch.column(ts_col), pa.timestamp("us"))
            out = {
                "__by": batch.column(by),
                "__ts": pc.cast(ts, pa.int64()),
            }
            for c in keep:
                out[c] = (
                    batch.column(c)
                    if side == "l"
                    else pa.nulls(n, batch.schema.field(c).type if c in batch.schema.names else pa.int64())
                )
            out["__bucket"] = crc32_bucket(batch.column(by), n_buckets)
            out["__side"] = pa.array([side] * n)
            return pa.Table.from_pydict(out)

        return fn

    tagged = left_ds.map_batches(tag("l"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("r"), batch_format="pyarrow")
    )

    def join_bucket(group: pd.DataFrame) -> pa.Table:
        l = group[group["__side"] == "l"]
        if not len(l):
            return empty_table
        r = group[group["__side"] == "r"]
        codes, _ = pd.factorize(
            pd.concat([l["__by"], r["__by"]], ignore_index=True), sort=False
        )
        lc, rc = codes[: len(l)], codes[len(l) :]
        lts = l["__ts"].to_numpy()
        rts = r["__ts"].to_numpy() if len(r) else np.empty(0, dtype=np.int64)
        ts_min = min(lts.min() + lo_us, rts.min() if len(r) else lts.min())
        span = (
            max(lts.max() + hi_us, rts.max() if len(r) else lts.max())
            - ts_min
            + 2
        )
        r_keys = np.sort(rc * span + (rts - ts_min)) if len(r) else rts
        lo_keys = lc * span + np.clip(lts + lo_us - ts_min, 0, span - 1)
        hi_keys = lc * span + np.clip(lts + hi_us - ts_min, 0, span - 1)
        counts = np.searchsorted(r_keys, hi_keys, side="right") - np.searchsorted(
            r_keys, lo_keys, side="left"
        )
        out = l[keep].copy()
        out[count_col] = counts.astype("int64")
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
