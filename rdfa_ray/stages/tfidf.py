"""TF-IDF scoring over a document corpus — the ranking layer on top
of ``stages/tokens.py``'s inverted-index family.

Distribution shape:

* **tf is computed entirely map-side**: a document's text lives in ONE
  row, so its per-token counts are complete within the block — no
  shuffle produces (doc_id, token, tf).
* **df needs one exchange on token**: per-doc-distinct (doc_id, token)
  pairs (emitted by the same map pass) feed a Ray-native
  ``groupby(token).count()``; only vocabulary-sized rows shuffle.
* tf JOIN df is a ``bucketed_hash_join`` on token (df can be larger
  than a broadcast side at web scale: vocabulary grows with corpus).
* the global top-k is map-side partial top-k per block (k rows leave
  each block) merged in one single-partition pass with a total-order
  tie-break (score desc, doc_id asc, token asc) — no all-to-all sort
  for a k-row answer.

Scores are emitted as ``score_micro = floor(tf * ln(N/df) * 1e6 +
0.5)`` — an integer, so the SQL oracle (DuckDB ``ln``) compares
hash-exact instead of float-fuzzy.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .join import bucketed_hash_join

_TF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
)


def _tf_partial(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, token, tf), fully vectorized: Arrow
    lower + regex split to a list column, flatten with parent indices,
    pandas C-level groupby-size for the counts (equivalent to the
    ``[a-z0-9]+`` findall the SQL oracle uses)."""
    ids = pc.cast(batch.column("doc_id"), pa.int64())
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.cast(batch.column("text"), pa.string())), "[^a-z0-9]+"
    )
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    doc_of = pc.take(ids, parents)
    # the split emits '' fragments at leading/trailing separators
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    doc_of = doc_of.filter(keep)
    counts = (
        pd.DataFrame(
            {
                "doc_id": doc_of.to_numpy(zero_copy_only=False),
                "token": flat.to_pandas(),
            }
        )
        .groupby(["doc_id", "token"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    return pa.Table.from_arrays(
        [
            pa.array(counts["doc_id"].to_numpy(), pa.int64()),
            pa.array(counts["token"].to_numpy(), pa.string()),
            pa.array(counts["tf"].to_numpy(), pa.int64()),
        ],
        schema=_TF_SCHEMA,
    )


def tfidf_topk(
    docs_ds,
    n_docs: int,
    k: int = 50,
    n_buckets: int = 32,
    broadcast_vocab_limit: int = 2_000_000,
):
    """Top-k (doc_id, token, score_micro) rows by TF-IDF.

    ``n_docs``: total corpus size (callers know it from read metadata:
    ``ds.count()`` on a parquet read is a metadata lookup, not a scan).

    Adaptive tf-x-df join: a vocabulary at or below
    ``broadcast_vocab_limit`` tokens is broadcast (``ray.put`` once,
    vectorized pandas map per batch — zero shuffle); larger
    vocabularies fall back to the bucketed hash join.
    """
    import numpy as np
    from ray.data.aggregate import Count

    tf = docs_ds.map_batches(_tf_partial, batch_format="pyarrow").materialize()
    if tf.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("token", pa.string()),
                 ("score_micro", pa.int64())]
            ).empty_table()
        )
    # per-doc-distinct pairs are exactly the tf rows -> df by token
    df = tf.groupby("token").aggregate(Count(alias_name="df")).materialize()

    def score_arrays(batch_tf, batch_df):
        idf = np.log(float(n_docs) / batch_df.astype("float64"))
        return np.floor(batch_tf.astype("float64") * idf * 1e6 + 0.5).astype(
            "int64"
        )

    if df.count() <= broadcast_vocab_limit:
        import ray

        df_pd = df.to_pandas()
        df_ref = ray.put(
            pd.Series(df_pd["df"].to_numpy(), index=df_pd["token"])
        )

        def lookup_score(batch: pa.Table) -> pa.Table:
            dfs = ray.get(df_ref)
            toks = batch.column("token").to_pandas()
            df_v = dfs.reindex(toks).to_numpy()
            tf_v = batch.column("tf").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "token": batch.column("token"),
                    "score_micro": pa.array(
                        score_arrays(tf_v, df_v), pa.int64()
                    ),
                }
            )

        scored = tf.map_batches(lookup_score, batch_format="pyarrow")
    else:
        joined = bucketed_hash_join(
            tf,
            df,
            on="token",
            n_buckets=n_buckets,
            left_schema=_TF_SCHEMA,
            right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
        )

        def score(batch: pa.Table) -> pa.Table:
            tf_v = batch.column("tf").to_numpy(zero_copy_only=False)
            df_v = batch.column("df").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "token": batch.column("token"),
                    "score_micro": pa.array(
                        score_arrays(tf_v, df_v), pa.int64()
                    ),
                }
            )

        scored = joined.map_batches(score, batch_format="pyarrow")

    def topk_block(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["score_micro", "doc_id", "token"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)

    # partial top-k per block (k rows leave each block), final merge in
    # one partition — an all-to-all sort for a k-row answer is waste
    return (
        scored.map_batches(topk_block, batch_format="pandas")
        .repartition(1)
        .map_batches(topk_block, batch_format="pandas", batch_size=None)
    )
