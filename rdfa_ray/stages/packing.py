"""Sequence packing — assign documents to fixed-token-budget training
bins (the pre-tokenization packing step of an LLM data pipeline: a
training sequence is filled with consecutive documents until the token
budget is reached).

Semantics: documents ordered by doc_id form one conceptual token
stream; a document's bin is ``floor(exclusive_prefix_tokens /
budget)`` — i.e. the sequence its first token lands in.  A pure
function of the corpus, not of partitioning, so reruns and resumes
agree (and a SQL window function can oracle-check it).

Distribution shape — the textbook two-level parallel prefix sum:

1. map-side: per-document token counts + a range key
   (``doc_id // range_size``); one grouped sum produces PER-RANGE
   totals (corpus_size / range_size rows — tiny).
2. driver: exclusive scan over the sorted range totals (vector op on
   the tiny array), broadcast via ``ray.put``.
3. one bucketed exchange on the range key; each range computes its
   internal cumsum vectorized and adds its broadcast offset.

No stage ever sees more than a range of counts or the tiny totals
array; document text never leaves the first map.  ``range_size``
bounds stage-2's driver array (1e9 docs / 4096 ≈ 244k rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _token_counts(batch: pa.Table, range_size: int) -> pa.Table:
    ids = pc.cast(batch.column("doc_id"), pa.int64())
    # whitespace word count == len(string_split(text, ' ')) in the oracle
    toks = pc.split_pattern(pc.cast(batch.column("text"), pa.string()), " ")
    return pa.Table.from_pydict(
        {
            "doc_id": ids,
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "rng": pc.divide(ids, range_size),
        }
    )


def pack_sequences(docs_ds, budget: int = 2048, range_size: int = 4096):
    """(doc_id, text) -> (doc_id, n_tokens, bin_id)."""
    import ray

    counts = docs_ds.map_batches(
        _token_counts, fn_kwargs={"range_size": range_size}, batch_format="pyarrow"
    ).materialize()  # consumed twice: range totals + per-range cumsum

    # per-range totals, map-side combined (partial per block)
    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("rng").aggregate([("n_tokens", "sum")])
        return agg.rename_columns(["rng", "part"])

    from ray.data.aggregate import Sum

    totals = (
        counts.map_batches(partial, batch_format="pyarrow")
        .groupby("rng")
        .aggregate(Sum("part", alias_name="total"))
        .to_pandas()
    )
    if "rng" not in totals.columns or not len(totals):  # empty corpus
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("bin_id", pa.int64())]
            ).empty_table()
        )
    totals = totals.sort_values("rng")
    rngs = totals["rng"].to_numpy()
    tots = totals["total"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(tots)[:-1]])
    offset_ref = ray.put(dict(zip(rngs.tolist(), offsets.tolist())))

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        empty = {
            "doc_id": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "bin_id": pd.Series([], dtype="int64"),
        }
        if not len(group):
            return pd.DataFrame(empty)
        offs = ray.get(offset_ref)
        g = group.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        excl = np.cumsum(n) - n + offs[int(g["rng"].iloc[0])]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n,
                "bin_id": excl // budget,
            }
        )

    return counts.groupby("rng").map_groups(assign, batch_format="pandas")
