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
* the global top-k is a distributed sort + limit with a total-order
  tie-break (score desc, doc_id asc, token asc).

Scores are emitted as ``score_micro = floor(tf * ln(N/df) * 1e6 +
0.5)`` — an integer, so the SQL oracle (DuckDB ``ln``) compares
hash-exact instead of float-fuzzy.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow as pa

from .join import bucketed_hash_join

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_TF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
)


def _tf_partial(batch: pa.Table) -> pa.Table:
    doc_ids, tokens, tfs = [], [], []
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    for doc_id, text in zip(ids, texts):
        counts = Counter(_TOKEN_RE.findall((text or "").lower()))
        for token, tf in counts.items():
            doc_ids.append(doc_id)
            tokens.append(token)
            tfs.append(tf)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "token": pa.array(tokens, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )


def tfidf_topk(docs_ds, n_docs: int, k: int = 50, n_buckets: int = 32):
    """Top-k (doc_id, token, score_micro) rows by TF-IDF.

    ``n_docs``: total corpus size (callers know it from read metadata:
    ``ds.count()`` on a parquet read is a metadata lookup, not a scan).
    """
    from ray.data.aggregate import Count

    tf = docs_ds.map_batches(_tf_partial, batch_format="pyarrow").materialize()
    # per-doc-distinct pairs are exactly the tf rows -> df by token
    df = tf.groupby("token").aggregate(Count(alias_name="df"))

    joined = bucketed_hash_join(
        tf,
        df,
        on="token",
        n_buckets=n_buckets,
        left_schema=_TF_SCHEMA,
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np

        tf_v = batch.column("tf").to_numpy(zero_copy_only=False).astype("float64")
        df_v = batch.column("df").to_numpy(zero_copy_only=False).astype("float64")
        idf = np.log(float(n_docs) / df_v)
        micro = np.floor(tf_v * idf * 1e6 + 0.5).astype("int64")
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "token": batch.column("token"),
                "score_micro": pa.array(micro, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["score_micro", "doc_id", "token"], descending=[True, False, False]
    ).limit(k)
