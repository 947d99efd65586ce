"""BM25 full-text ranking — keyword retrieval over a document corpus,
the lexical complement of the embedding ANN family (``stages/ann.py``)
in a training-data curation stack (targeted corpus audits: "find the
documents that talk about X").

Okapi BM25 (Robertson et al., TREC-3; the Lucene-default variant whose
idf is ``ln(1 + (N - df + 0.5)/(df + 0.5))``):

    score(d, Q) = sum_{t in Q} idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * len(d)/avgdl))

Distribution shape (what survives 100 TB):

* ONE tokenizing pass over the corpus.  Each block emits only (a) tf
  rows for the handful of QUERY tokens (the query set rides in as a
  broadcast constant; everything else is dropped map-side — output is
  |matching docs x query terms|, not corpus-sized) with the doc's
  length alongside, and (b) one per-block stats sentinel carrying
  (block doc count, block token-length sum) for avgdl.  No second
  scan for document lengths.
* The reduced table is materialized once (it is query-hit-sized);
  df-per-token and the global avgdl are driver-side combines over
  token-cardinality / block-cardinality rows.
* Scoring is one vectorized map over the reduced rows, a per-doc
  groupby-sum (matching-doc-sized), then the partial-top-k merge
  (k rows leave each block; one single-partition final merge with a
  total-order tie-break — no all-to-all sort for a k-row answer).

Scores quantize to ``score_micro`` int64 so the DuckDB oracle compares
hash-exact.  Tokenization matches ``stages/tfidf.py`` (lower +
``[a-z0-9]+`` runs) so the two rankers share one oracle convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HITS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("token", pa.string()),
        ("tf", pa.int64()),
        ("doc_len", pa.int64()),
    ]
)
_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("score_micro", pa.int64())])


def bm25_topk(
    docs_ds,
    query: str,
    n_docs: int,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-k (doc_id, score_micro) documents for ``query`` by BM25.

    ``n_docs``: corpus size from read metadata (a parquet footer
    lookup, not a scan).  Ties break on doc_id ascending; only
    documents containing at least one query token appear."""
    import ray

    q_tokens = sorted(
        {t for t in _split(query) if t}
    )
    if not q_tokens:
        raise ValueError("query has no tokens after normalization")
    q_ref = ray.put(pa.array(q_tokens, pa.string()))

    def hits_and_stats(batch: pa.Table) -> pa.Table:
        """tf rows for query tokens (+ doc_len) plus one stats sentinel
        row per block: doc_id = -1, tf = block doc count, doc_len =
        block token-length sum."""
        qs = ray.get(q_ref)
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.cast(batch.column("text"), pa.string())),
            "[^a-z0-9]+",
        )
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        doc_of = pc.take(ids, parents.filter(keep))

        # per-doc token length (all tokens, pre-query-filter)
        doc_np = doc_of.to_numpy(zero_copy_only=False)
        len_by_doc = pd.Series(doc_np).value_counts(sort=False)

        q_mask = pc.is_in(flat, qs)
        q_flat = flat.filter(q_mask)
        q_docs = doc_of.filter(q_mask)
        counts = (
            pd.DataFrame(
                {
                    "doc_id": q_docs.to_numpy(zero_copy_only=False),
                    "token": q_flat.to_pandas(),
                }
            )
            .groupby(["doc_id", "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        counts["doc_len"] = (
            len_by_doc.reindex(counts["doc_id"]).to_numpy().astype("int64")
        )
        stats = pd.DataFrame(
            {
                "doc_id": [-1],
                "token": [""],
                "tf": [int(batch.num_rows)],
                "doc_len": [int(len_by_doc.sum()) if len(len_by_doc) else 0],
            }
        )
        out = pd.concat([counts, stats], ignore_index=True)
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"].to_numpy(), pa.int64()),
                pa.array(out["token"].to_numpy(dtype=object), pa.string()),
                pa.array(out["tf"].to_numpy(), pa.int64()),
                pa.array(out["doc_len"].to_numpy(), pa.int64()),
            ],
            schema=_HITS_SCHEMA,
        )

    reduced = docs_ds.map_batches(
        hits_and_stats, batch_format="pyarrow"
    ).materialize()

    # driver combines over tiny frames: sentinels (one per block) give
    # avgdl; per-token df is bounded by |query| rows after the groupby
    sent = reduced.filter(expr="doc_id < 0")
    stats_pd = sent.to_pandas()
    total_len = int(stats_pd["doc_len"].sum()) if len(stats_pd) else 0
    avgdl = (total_len / n_docs) if n_docs else 1.0
    if avgdl <= 0:
        avgdl = 1.0

    hits = reduced.filter(expr="doc_id >= 0")
    from ray.data.aggregate import Count

    df_pd = (
        hits.groupby("token").aggregate(Count(alias_name="df")).to_pandas()
    )
    idf = {
        t: float(np.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)))
        for t, d in zip(df_pd.get("token", []), df_pd.get("df", []))
    }
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        """Each term's contribution quantizes to micro-units PER ROW
        (a pure function of tf/df/doc_len and the broadcast globals),
        so the per-doc score is an ORDER-FREE int64 sum — identical at
        any block layout / parallelism, hash-exact vs the oracle."""
        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        idfs = ray.get(idf_ref)
        toks = batch.column("token").to_pylist()
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype("float64")
        dl = (
            batch.column("doc_len")
            .to_numpy(zero_copy_only=False)
            .astype("float64")
        )
        w = np.array([idfs.get(t, 0.0) for t in toks])
        s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "score_micro": pa.array(
                    np.floor(s * 1e6 + 0.5).astype("int64")
                ),
            }
        )

    scored = hits.map_batches(score, batch_format="pyarrow")
    # a doc's tf rows can straddle blocks: one exchange on doc_id sums
    # the per-term int partials (matching-doc-sized, not corpus-sized)
    from ray.data.aggregate import Sum

    per_doc = scored.groupby("doc_id").aggregate(
        Sum(on="score_micro", alias_name="score_micro")
    )

    def topk_block(frame: pd.DataFrame) -> pd.DataFrame:
        if not len(frame):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "score_micro": pd.Series([], dtype="int64"),
                }
            )
        return frame.sort_values(
            ["score_micro", "doc_id"],
            ascending=[False, True],
            kind="mergesort",
        ).head(k)

    return (
        per_doc.map_batches(topk_block, batch_format="pandas")
        .repartition(1)
        .map_batches(topk_block, batch_format="pandas", batch_size=None)
    )


def _split(text: str) -> list:
    import re

    return re.split(r"[^a-z0-9]+", text.lower())
