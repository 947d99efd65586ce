"""One-pass dataset profiler — per-column count / nulls / typed
min-max (exact) plus approximate distinct count (HyperLogLog) and
heavy hitters (Misra-Gries), all from a SINGLE scan of the input.

The profiling pass every ingestion pipeline runs before committing a
new 100-TB drop: schema sanity, null rates, value ranges, cardinality
and skew — without paying one job (or one shuffle!) per statistic.

Reference analogue: none in pyrdfa3 — a beyond-reference data-ops
stage in the ``sketch.py`` family, composing its mergeable summaries
(``_hll_registers`` / ``_mg_compress``) into a fixed-width per-column
partial.

Scale plan: zero shuffles.  Each block emits ONE partial row per
profiled column (counts + typed min/max + 2^p-byte HLL registers +
<=k Misra-Gries counters — size independent of row count); a
coalescing ``map_batches(batch_size=_FANIN)`` combine level folds
every 256 partials, and the driver finalizes the handful of
survivors.  All exact fields are sums / mins / maxes, so the combine
tree cannot change them; the sketches are mergeable by construction
(register-wise max, counter sum + re-compress with the documented
undercount bound).  Typed min/max travel in per-kind columns
(int / float / string) — a stringified min would order "9" > "10".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import _hll_estimate, _hll_registers, _mg_compress

_FANIN = 256


def _partial_row(col: str, arr: pa.ChunkedArray, hll_p: int, topk: int) -> dict:
    n = len(arr)
    nulls = arr.null_count
    valid = arr.drop_null()
    row = {
        "column": col,
        "n": np.int64(n),
        "nulls": np.int64(nulls),
        "min_i": None,
        "max_i": None,
        "min_f": None,
        "max_f": None,
        "min_s": None,
        "max_s": None,
    }
    kind = arr.type
    if len(valid):
        mm = pc.min_max(valid)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if pa.types.is_integer(kind):
            # as STRINGS: partial rows cross the combine level as
            # pandas/Arrow blocks where a nullable int column round-trips
            # through float64, silently rounding |v| > 2^53 extremes;
            # _combine compares them numerically
            row["min_i"], row["max_i"] = str(int(mn)), str(int(mx))
        elif pa.types.is_floating(kind):
            row["min_f"], row["max_f"] = float(mn), float(mx)
        else:
            row["min_s"], row["max_s"] = str(mn), str(mx)
    # sketches over the (string-cast where needed) valid values
    if pa.types.is_integer(kind) or pa.types.is_floating(kind):
        vals = valid.to_numpy(zero_copy_only=False)
        keys = vals
    else:
        vals = pc.cast(valid, pa.string()).to_numpy(zero_copy_only=False)
        keys = vals
    row["hll"] = _hll_registers(vals, hll_p).tobytes()
    counts = pd.Series(keys).value_counts()  # C-level
    kept = _mg_compress(counts, topk)
    row["top_keys"] = [str(k) for k in kept.index.tolist()]
    row["top_counts"] = [int(c) for c in kept.tolist()]
    return row


def _combine(df: pd.DataFrame, topk: int) -> pd.DataFrame:
    out = []
    for col, g in df.groupby("column", sort=False):
        regs = np.maximum.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in g["hll"]]
        )
        counters: dict[str, int] = {}
        for keys, cnts in zip(g["top_keys"], g["top_counts"]):
            for k, c in zip(keys, cnts):
                counters[k] = counters.get(k, 0) + c
        kept = _mg_compress(pd.Series(counters, dtype="int64"), topk) if counters else pd.Series(dtype="int64")

        def _agg(series, fn):
            vals = series.dropna()
            return fn(vals) if len(vals) else None

        def _agg_i(series, fn):
            # int extremes travel as strings (exact beyond 2^53);
            # compare numerically, keep the string representation
            vals = [int(v) for v in series.dropna()]
            return str(fn(vals)) if vals else None

        out.append(
            {
                "column": col,
                "n": np.int64(g["n"].sum()),
                "nulls": np.int64(g["nulls"].sum()),
                "min_i": _agg_i(g["min_i"], min),
                "max_i": _agg_i(g["max_i"], max),
                "min_f": _agg(g["min_f"], min),
                "max_f": _agg(g["max_f"], max),
                "min_s": _agg(g["min_s"], min),
                "max_s": _agg(g["max_s"], max),
                "hll": regs.tobytes(),
                "top_keys": [str(k) for k in kept.index.tolist()],
                "top_counts": [int(c) for c in kept.tolist()],
            }
        )
    return pd.DataFrame(out)


def profile_table(ds, columns: list[str], hll_p: int = 12, topk: int = 16) -> pd.DataFrame:
    """Profile ``columns`` of ``ds`` in one scan; returns a small pandas
    DataFrame (one row per column):

    ``column, n, nulls, min_value, max_value`` (exact; min/max as
    strings, typed comparison underneath, null when all-null) plus
    ``n_distinct_approx`` (HLL, ~1.6% at p=12) and ``top_value`` /
    ``top_count_floor`` (Misra-Gries: the most frequent value's count
    estimate, never above the truth, exact when block-level distincts
    stay <= topk)."""

    def block_profile(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            [_partial_row(c, batch.column(c), hll_p, topk) for c in columns]
        )

    parts = ds.map_batches(block_profile, batch_format="pyarrow").map_batches(
        lambda df: _combine(df, topk), batch_format="pandas", batch_size=_FANIN
    )
    df = parts.to_pandas()
    if not len(df):
        return pd.DataFrame(
            columns=["column", "n", "nulls", "min_value", "max_value",
                     "n_distinct_approx", "top_value", "top_count_floor"]
        )
    final = _combine(df, topk)

    def fmt(row, lo_hi):
        for c in ("%s_i" % lo_hi, "%s_f" % lo_hi, "%s_s" % lo_hi):
            v = row[c]
            if v is not None and not (isinstance(v, float) and np.isnan(v)):
                if c.endswith("_i"):
                    return str(int(v))
                return str(v)
        return None

    hll_p_eff = int(np.log2(len(np.frombuffer(final["hll"].iloc[0], dtype=np.uint8))))
    out = pd.DataFrame(
        {
            "column": final["column"],
            "n": final["n"].astype("int64"),
            "nulls": final["nulls"].astype("int64"),
            "min_value": [fmt(r, "min") for _, r in final.iterrows()],
            "max_value": [fmt(r, "max") for _, r in final.iterrows()],
            "n_distinct_approx": [
                np.int64(_hll_estimate(np.frombuffer(b, dtype=np.uint8), hll_p_eff))
                for b in final["hll"]
            ],
            "top_value": [
                (ks[int(np.argmax(cs))] if len(cs) else None)
                for ks, cs in zip(final["top_keys"], final["top_counts"])
            ],
            "top_count_floor": [
                (int(max(cs)) if len(cs) else 0)
                for ks, cs in zip(final["top_keys"], final["top_counts"])
            ],
        }
    )
    out["top_count_floor"] = out["top_count_floor"].astype("int64")
    return out.sort_values("column").reset_index(drop=True)
