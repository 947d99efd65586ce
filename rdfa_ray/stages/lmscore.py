"""Language-model perplexity scoring for corpus filtering — the CCNet
recipe (train an LM on a reference corpus, keep documents whose
perplexity is low).  The production stage loads KenLM per actor; this
engine ships the same pipeline with a corpus-trained UNIGRAM model so
the whole path is deterministic and SQL-oracle-checkable (swap
``score_batch``'s table lookup for a KenLM call in a deployment — the
distribution shape is identical).

Distribution shape:

* pass 1 (model "training"): per-block partial token counts combine
  map-side, ONE grouped sum yields the vocabulary table — token-count
  sized rows are the only exchange.
* broadcast: the (token -> ln p) table ships once via ``ray.put``
  below a size limit (vocabulary tables are tiny relative to any
  corpus; CCNet's full KenLM is ~few GB — still broadcast, per-actor).
* pass 2 (scoring): one map over the documents; per-batch vectorized
  explode + table lookup + grouped mean.  Zero shuffles touch text.

Scores are ``logppl_micro = floor(-mean_token ln p(token) * 1e6 +
0.5)`` — integers, so DuckDB's ``ln`` compares hash-exact (same
quantization contract as stages/tfidf.py).  Out-of-vocabulary tokens
cannot occur when scoring the training corpus itself; a real split
would smooth — documented, not silently approximated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_COUNT_SCHEMA = pa.schema([("token", pa.string()), ("part", pa.int64())])


def _token_count_partial(batch: pa.Table) -> pa.Table:
    toks = pc.split_pattern(
        pc.utf8_lower(pc.cast(batch.column("text"), pa.string())), " "
    )
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return _COUNT_SCHEMA.empty_table()
    agg = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
    return pa.Table.from_arrays(
        [agg.column("token"), pc.cast(agg.column("token_count"), pa.int64())],
        schema=_COUNT_SCHEMA,
    )


def unigram_logppl(docs_ds, quantize: float = 1e6):
    """(doc_id, text) -> (doc_id, n_tokens, logppl_micro): mean negative
    log-likelihood under the corpus's own unigram distribution."""
    import ray
    from ray.data.aggregate import Sum

    docs_ds = docs_ds.materialize()  # two passes: train + score

    vocab = (
        docs_ds.map_batches(_token_count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("part", alias_name="n"))
        .to_pandas()
    )
    if not len(vocab):
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("logppl_micro", pa.int64())]
            ).empty_table()
        )
    total = float(vocab["n"].sum())
    logp = pd.Series(
        np.log(vocab["n"].to_numpy(dtype=np.float64) / total),
        index=vocab["token"],
    )
    logp_ref = ray.put(logp)

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "logppl_micro": pd.Series([], dtype="int64"),
            }
        )
        if not len(batch):
            return empty
        table = ray.get(logp_ref)
        toks = batch["text"].fillna("").str.lower().str.split(" ")
        flat = toks.explode()
        parents = flat.index.to_numpy()
        lps = table.reindex(flat.to_numpy(dtype=object)).to_numpy()
        g = pd.DataFrame({"p": parents, "lp": lps}).groupby("p")["lp"]
        mean_lp = g.mean()
        n_tok = g.size()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[mean_lp.index.to_numpy()],
                "n_tokens": n_tok.to_numpy().astype("int64"),
                "logppl_micro": np.floor(-mean_lp.to_numpy() * quantize + 0.5).astype(
                    "int64"
                ),
            }
        )

    return docs_ds.map_batches(score_batch, batch_format="pandas")
