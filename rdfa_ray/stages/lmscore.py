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

# Model-size bounds (rows in the aggregated gram table).  At 100 TB a
# word-level gram table is billions of rows; collecting it driver-side
# would OOM the driver and ship a multi-GB broadcast object.  So the
# model is pruned map-side (KenLM-style min-count pruning) BEFORE any
# driver collect, small models broadcast exactly as before, mid-size
# models score through a bucketed join against the DISTRIBUTED model
# table, and models beyond ``max_model_rows`` refuse loudly instead of
# silently growing.
_BROADCAST_LIMIT = 5_000_000
_MAX_MODEL_ROWS = 200_000_000


def _prune_and_guard(agg_ds, min_count: int, max_model_rows: int,
                     label: str, prune_mask=None):
    """Materialize the aggregated (gram, n) model Dataset, drop rows
    with ``n < min_count`` (distributed — never collected), and enforce
    the row-count guard.  ``prune_mask(batch) -> BooleanArray`` marks
    rows EXEMPT from pruning (e.g. unigram backoff rows).  Returns
    ``(model_ds, n_rows)``."""
    agg_ds = agg_ds.materialize()
    if min_count > 1:
        def prune(b: pa.Table) -> pa.Table:
            keep = pc.greater_equal(b.column("n"), min_count)
            if prune_mask is not None:
                keep = pc.or_(keep, prune_mask(b))
            return b.filter(keep)

        agg_ds = agg_ds.map_batches(prune, batch_format="pyarrow").materialize()
    n_rows = agg_ds.count()
    if n_rows > max_model_rows:
        raise ValueError(
            "%s: pruned model has %d rows > max_model_rows=%d; raise "
            "min_count (KenLM-style pruning) or max_model_rows"
            % (label, n_rows, max_model_rows)
        )
    return agg_ds, n_rows


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


def unigram_logppl(
    docs_ds,
    quantize: float = 1e6,
    min_count: int = 1,
    broadcast_limit: int = _BROADCAST_LIMIT,
    max_model_rows: int = _MAX_MODEL_ROWS,
    materialize_input: bool = True,
):
    """(doc_id, text) -> (doc_id, n_tokens, logppl_micro): mean negative
    log-likelihood under the corpus's own unigram distribution.

    ``materialize_input``: the train + score passes consume the input
    twice; materializing pins it in the object store (fastest at
    node-local scale) but holds the FULL TEXT column — at 100 TB pass
    ``False`` so lazy lineage re-reads the (column-pruned) source for
    pass 2 instead of spilling a corpus-sized materialization.

    ``min_count`` prunes tokens seen fewer times from the model
    map-side (KenLM-style singleton pruning) BEFORE any driver collect;
    pruned tokens are out-of-vocabulary at score time and excluded from
    the mean (``n_tokens`` still counts them).  Probabilities keep the
    UNPRUNED total as denominator, so ``min_count=1`` is bit-identical
    to the unpruned model.  Models up to ``broadcast_limit`` rows ship
    once via ``ray.put``; larger ones score through a bucketed hash
    join against the distributed model table (text explodes to
    (doc_id, token) rows — token-count-sized exchange, never a driver
    collect); above ``max_model_rows`` the stage refuses loudly.

    Null-text documents and documents whose every token is OOV produce
    no score row (excluded, not NaN-scored)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if materialize_input:
        docs_ds = docs_ds.materialize()  # two passes: train + score

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("logppl_micro", pa.int64())]
    )
    counts = (
        docs_ds.map_batches(_token_count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("part", alias_name="n"))
        .materialize()
    )
    if counts.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    total = float(counts.sum("n"))  # UNPRUNED total: min_count=1 invariant
    model_ds, n_model = _prune_and_guard(
        counts, min_count, max_model_rows, "unigram_logppl"
    )

    if n_model <= broadcast_limit:
        vocab = model_ds.to_pandas()
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
            batch = batch[batch["text"].notna()]  # null text never trained
            if not len(batch):
                return empty
            table = ray.get(logp_ref)
            toks = batch["text"].str.lower().str.split(" ")
            flat = toks.explode()
            parents = flat.index.to_numpy()
            lps = table.reindex(flat.to_numpy(dtype=object)).to_numpy()
            g = pd.DataFrame({"p": parents, "lp": lps}).groupby("p")["lp"]
            mean_lp = g.mean()  # NaN-skipping: OOV tokens drop from the mean
            n_tok = g.size()
            ok = mean_lp.notna()  # all-OOV docs: exclude, don't emit INT64_MIN
            mean_lp, n_tok = mean_lp[ok], n_tok[ok]
            pos = batch.index.get_indexer(mean_lp.index)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[pos],
                    "n_tokens": n_tok.to_numpy().astype("int64"),
                    "logppl_micro": np.floor(
                        -mean_lp.to_numpy() * quantize + 0.5
                    ).astype("int64"),
                }
            )

        return docs_ds.map_batches(score_batch, batch_format="pandas")

    # --- bucketed-join fallback: the model never reaches the driver ---
    from .join import bucketed_hash_join

    def add_lp(b: pa.Table) -> pa.Table:
        lp = pc.ln(pc.divide(pc.cast(b.column("n"), pa.float64()), total))
        return pa.table({"token": b.column("token"), "lp": lp})

    lp_ds = model_ds.map_batches(add_lp, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(pc.cast(batch.column("text"), pa.string())), " "
        )
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)  # null text yields no rows
        ids = pc.cast(batch.column("doc_id"), pa.int64()).take(par)
        return pa.table({"doc_id": ids, "token": flat})

    tok_rows = docs_ds.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_hash_join(tok_rows, lp_ds, "token", how="left")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "sum_lp": pd.Series([], dtype="float64"),
                 "n_scored": pd.Series([], dtype="int64"),
                 "n_tok": pd.Series([], dtype="int64")}
            )
        g = b.groupby("doc_id")["lp"]
        out = pd.DataFrame(
            {"sum_lp": g.sum(), "n_scored": g.count(), "n_tok": g.size()}
        ).reset_index()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_scored"] = out["n_scored"].astype("int64")
        out["n_tok"] = out["n_tok"].astype("int64")
        return out

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_scored"] > 0]  # all-OOV docs excluded, like broadcast path
        mean_lp = b["sum_lp"].to_numpy() / b["n_scored"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_tokens": b["n_tok"].astype("int64"),
                "logppl_micro": np.floor(-mean_lp * quantize + 0.5).astype("int64"),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("sum_lp", alias_name="sum_lp"),
            Sum("n_scored", alias_name="n_scored"),
            Sum("n_tok", alias_name="n_tok"),
        )
        .map_batches(finalize, batch_format="pandas")
    )

# ---------------------------------------------------------------------------
# Interpolated bigram LM (one rung up the CCNet ladder: KenLM is an
# n-gram model; the bigram captures local word order the unigram
# cannot, so boilerplate with plausible vocabulary but scrambled order
# scores worse).

_GRAM_SCHEMA = pa.schema([("gram", pa.string()), ("part", pa.int64())])


def _gram_count_partial(batch: pa.Table) -> pa.Table:
    """ONE text pass emits both count families: unigram rows keyed
    ``u\\x1f<w>`` and within-document bigram rows ``b\\x1f<w1>\\x1f<w2>``,
    pre-combined per block."""
    toks = pc.split_pattern(
        pc.utf8_lower(pc.cast(batch.column("text"), pa.string())), " "
    )
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return _GRAM_SCHEMA.empty_table()
    # vectorized: unigram grams on the flat array; bigram grams on the
    # shifted pair where both positions share a parent list (the
    # parent-id diff mask — no Python token loop)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    uni = pc.binary_join_element_wise(
        pa.array(["u"] * len(flat), pa.string()), flat, "\x1f"
    )
    same = parents[1:] == parents[:-1]
    w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
    w2 = flat.slice(1).filter(pa.array(same))
    bi = pc.binary_join_element_wise(
        pa.array(["b"] * len(w1), pa.string()), w1, w2, "\x1f"
    )
    grams = pa.concat_arrays([uni.combine_chunks() if isinstance(uni, pa.ChunkedArray) else uni,
                              bi.combine_chunks() if isinstance(bi, pa.ChunkedArray) else bi])
    agg = pa.table({"gram": grams}).group_by("gram").aggregate([("gram", "count")])
    return pa.Table.from_arrays(
        [agg.column("gram"), pc.cast(agg.column("gram_count"), pa.int64())],
        schema=_GRAM_SCHEMA,
    )


def bigram_logppl(
    docs_ds,
    lam: float = 0.7,
    quantize: float = 1e6,
    min_count: int = 1,
    broadcast_limit: int = _BROADCAST_LIMIT,
    max_model_rows: int = _MAX_MODEL_ROWS,
    materialize_input: bool = True,
):
    """(doc_id, text) -> (doc_id, n_bigrams, logppl_micro): mean
    negative log-likelihood of each within-document bigram under the
    corpus-trained interpolated model

        p(w2 | w1) = lam * c(w1 w2)/c_prefix(w1) + (1-lam) * c(w2)/T

    (ML bigram backed off to the unigram — deterministic, no
    smoothing constants to tune, SQL-oracle-checkable).  Documents
    with fewer than two tokens have no bigrams and are EXCLUDED (not
    scored 0 — that would conflate "empty" with "perfectly likely").

    Same distribution shape as ``unigram_logppl``: one text pass emits
    per-block gram-count partials (the only exchange is gram-count
    sized), the model broadcasts once via ``ray.put``, scoring is one
    map with zero text shuffles.  ``logppl_micro`` quantizes AFTER the
    per-document mean, same contract as the unigram score.

    ``min_count`` prunes BIGRAM rows below the count map-side before
    the driver collect (unigram backoff rows are exempt, KenLM-style —
    pruning them would corrupt the backoff distribution); pruned
    bigrams back off to the unigram term at score time, and prefix
    counts renormalize over the surviving bigrams.  ``min_count=1`` is
    bit-identical to the unpruned model.  The interpolated model needs
    three aligned tables, so there is no bucketed-join fallback: above
    ``broadcast_limit`` rows the stage refuses loudly (raise
    ``min_count``, or score with ``unigram_logppl`` whose join path is
    unbounded).  ``materialize_input`` as in ``unigram_logppl`` (pass
    False at corpus scales where pinning the text column would spill)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if materialize_input:
        docs_ds = docs_ds.materialize()  # two passes: train + score

    counts_ds = (
        docs_ds.map_batches(_gram_count_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("part", alias_name="n"))
    )
    model_ds, n_model = _prune_and_guard(
        counts_ds, min_count, max_model_rows, "bigram_logppl",
        prune_mask=lambda b: pc.starts_with(b.column("gram"), "u\x1f"),
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("logppl_micro", pa.int64())]
    )
    if n_model == 0:
        return rd.from_arrow(out_schema.empty_table())
    if n_model > broadcast_limit:
        raise ValueError(
            "bigram_logppl: pruned model has %d rows > broadcast_limit=%d "
            "and the interpolated bigram has no join fallback; raise "
            "min_count or use unigram_logppl (bucketed-join scoring)"
            % (n_model, broadcast_limit)
        )
    counts = model_ds.to_pandas()

    is_uni = counts["gram"].str.startswith("u\x1f")
    uni = counts[is_uni]
    uni_c = pd.Series(
        uni["n"].to_numpy(dtype=np.float64),
        index=uni["gram"].str.slice(2),
    )
    total = float(uni_c.sum())
    bi = counts[~is_uni]
    bi_c = pd.Series(
        bi["n"].to_numpy(dtype=np.float64),
        index=bi["gram"].str.slice(2),  # "w1\x1fw2"
    )
    prefix_c = bi_c.groupby(
        bi_c.index.str.split("\x1f").str[0]
    ).sum()
    model_ref = ray.put((uni_c, bi_c, prefix_c, total))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_bigrams": pd.Series([], dtype="int64"),
                "logppl_micro": pd.Series([], dtype="int64"),
            }
        )
        if not len(batch):
            return empty
        u_c, b_c, p_c, T = ray.get(model_ref)
        ids = batch["doc_id"].to_numpy()
        toks = batch["text"].fillna("").str.lower().str.split(" ")
        flat = toks.explode()
        par = flat.index.to_numpy()
        vals = flat.to_numpy(dtype=object)
        if len(vals) < 2:
            return empty
        same = par[1:] == par[:-1]
        if not same.any():
            return empty
        w1 = pd.Index(vals[:-1][same])
        w2 = pd.Index(vals[1:][same])
        docs = ids[par[1:][same].astype(np.int64)]
        keys = w1.astype(object) + "\x1f" + w2.astype(object)
        p_bi = b_c.reindex(keys).to_numpy() / p_c.reindex(w1).to_numpy()
        # pruned/unseen bigrams back off to the unigram term (NaN here
        # would otherwise poison the whole document mean); a no-op at
        # min_count=1 on the training corpus where every bigram is seen
        p_bi = np.nan_to_num(p_bi, nan=0.0)
        p_uni = u_c.reindex(w2).to_numpy() / T
        nll = -np.log(lam * p_bi + (1.0 - lam) * p_uni)
        g = pd.DataFrame({"d": docs, "nll": nll}).groupby("d")["nll"]
        mean_nll = g.mean()
        return pd.DataFrame(
            {
                "doc_id": mean_nll.index.to_numpy().astype("int64"),
                "n_bigrams": g.size().to_numpy().astype("int64"),
                "logppl_micro": np.floor(
                    mean_nll.to_numpy() * quantize + 0.5
                ).astype("int64"),
            }
        )

    return docs_ds.map_batches(score_batch, batch_format="pandas")

# ---------------------------------------------------------------------------
# CCNet bucketing (Wenzek et al. 2019, arXiv:1911.00359): score each
# document's perplexity under ITS LANGUAGE's model, then split every
# language into head/middle/tail terciles by perplexity — the split
# the paper feeds to training-data selection (head = cleanest).


def ccnet_buckets(
    docs_ds,
    quantize: float = 1e6,
    min_count: int = 1,
    broadcast_limit: int = _BROADCAST_LIMIT,
    max_model_rows: int = _MAX_MODEL_ROWS,
    materialize_input: bool = True,
):
    """(doc_id, text, lang) -> (lang, bucket, n_docs, tokens_total):
    per-language unigram LM (deployments swap in KenLM per language —
    the distribution shape is identical), per-document mean NLL in
    integer micro-nats, tercile thresholds per language via the exact
    order-statistic quantiles, head/middle/tail census.

    Scale shape: two text passes (train + score, zero text shuffles —
    the (lang, token) count exchange and the per-language threshold
    table are vocabulary-sized), one broadcast of the per-language
    models, one broadcast of the 2-row-per-language thresholds, and a
    tiny census aggregate.  Bucket rule (CCNet §4.3, discretized):
    head = ppl <= q33, middle = ppl <= q67, tail = rest — thresholds
    are the q(33)/q(67) order statistics, so the rule is pure integer
    comparison and SQL-reproducible.  ``materialize_input`` as in
    ``unigram_logppl`` (pass False at corpus scales where pinning the
    text column would spill)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if materialize_input:
        docs_ds = docs_ds.materialize()

    # pass 1: per-(lang, token) counts — ONE exchange, vocab-sized
    def lang_tok_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(pc.cast(batch.column("text"), pa.string())), " "
        )
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return pa.schema(
                [("lang", pa.string()), ("token", pa.string()),
                 ("part", pa.int64())]
            ).empty_table()
        parents = pc.list_parent_indices(toks)
        langs = pc.cast(batch.column("lang"), pa.string()).take(parents)
        agg = (
            pa.table({"lang": langs, "token": flat})
            .group_by(["lang", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "token", "part"])
        )
        return agg.set_column(
            2, "part", pc.cast(agg.column("part"), pa.int64())
        )

    counts_ds = (
        docs_ds.map_batches(lang_tok_partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("part", alias_name="n"))
    )
    out_schema = pa.schema(
        [("lang", pa.string()), ("bucket", pa.string()),
         ("n_docs", pa.int64()), ("tokens_total", pa.int64())]
    )
    # per-language totals over the UNPRUNED counts (min_count=1
    # invariant; pruned tokens are OOV at score time, excluded from the
    # doc mean) — computed distributed before any driver collect
    counts_all = counts_ds.materialize()
    if counts_all.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    lang_totals = {
        r["lang"]: float(r["total"])
        for r in counts_all.groupby("lang")
        .aggregate(Sum("n", alias_name="total"))
        .take_all()
    }
    model_ds, n_model = _prune_and_guard(
        counts_all, min_count, max_model_rows, "ccnet_buckets"
    )
    if n_model > broadcast_limit:
        # bucketed-join scale path: the per-language model table never
        # reaches the driver — text explodes to (doc_id, lang, key)
        # rows and left-joins the distributed (key, lp) model on
        # key = lang \x1f token (the per-language totals dict is
        # language-count sized, so it broadcasts)
        scored = _ccnet_score_join(
            docs_ds, model_ds, lang_totals, quantize
        ).materialize()
        return _ccnet_bucketize(scored, out_schema)
    vocab = model_ds.to_pandas()
    totals = vocab["lang"].map(lang_totals).astype(float)
    logp = pd.Series(
        np.log(vocab["n"].to_numpy(dtype=np.float64) / totals.to_numpy()),
        index=pd.MultiIndex.from_frame(vocab[["lang", "token"]]),
    )
    logp_ref = ray.put(logp)

    # pass 2: per-doc mean NLL under the doc's language model
    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "lang": pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
                "logppl_micro": pd.Series([], dtype="int64"),
            }
        )
        # null-text docs were never trained (the Arrow train pass drops
        # them); scoring them would fabricate a '' token whose missing
        # (lang, '') entry turns the mean NaN and INT64_MIN-buckets the
        # doc — drop them before scoring instead
        batch = batch[batch["text"].notna()]
        if not len(batch):
            return empty
        table = ray.get(logp_ref)
        toks = batch["text"].str.lower().str.split(" ")
        flat = toks.explode()
        par = flat.index.to_numpy()
        pos_all = batch.index.get_indexer(par)
        langs = batch["lang"].to_numpy()[pos_all]
        keys = pd.MultiIndex.from_arrays([langs, flat.to_numpy(dtype=object)])
        lps = table.reindex(keys).to_numpy()
        g = pd.DataFrame({"p": par, "lp": lps}).groupby("p")["lp"]
        mean_lp = g.mean()  # NaN-skipping: pruned/OOV tokens drop out
        n_tok = g.size()
        ok = mean_lp.notna()  # all-OOV docs: excluded, never INT64_MIN
        mean_lp, n_tok = mean_lp[ok], n_tok[ok]
        pos = batch.index.get_indexer(mean_lp.index)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[pos],
                "lang": batch["lang"].to_numpy()[pos],
                "n_tokens": n_tok.to_numpy().astype("int64"),
                "logppl_micro": np.floor(
                    -mean_lp.to_numpy() * quantize + 0.5
                ).astype("int64"),
            }
        )

    scored = docs_ds.map_batches(score_batch, batch_format="pandas").materialize()
    return _ccnet_bucketize(scored, out_schema)


def _ccnet_score_join(docs_ds, model_ds, lang_totals: dict, quantize: float):
    """The over-broadcast-limit scoring path: (doc_id, lang, n_tokens,
    logppl_micro) via a bucketed hash join of exploded (doc_id, lang,
    key) token rows against the distributed (key, lp) model, key =
    lang \\x1f token.  Same exclusion rules as the broadcast path:
    null-text and all-OOV docs emit no row."""
    import ray
    from ray.data.aggregate import Sum

    from .join import bucketed_hash_join

    totals_ref = ray.put(lang_totals)

    def add_lp(b: pa.Table) -> pa.Table:
        t = ray.get(totals_ref)
        langs = pc.cast(b.column("lang"), pa.string())
        tot = pa.array(
            pd.Series(langs.to_pandas()).map(t).to_numpy(dtype=np.float64)
        )
        lp = pc.ln(pc.divide(pc.cast(b.column("n"), pa.float64()), tot))
        key = pc.binary_join_element_wise(
            langs, pc.cast(b.column("token"), pa.string()), "\x1f"
        )
        return pa.table({"key": key, "lp": lp})

    lp_ds = model_ds.map_batches(add_lp, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(pc.cast(batch.column("text"), pa.string())), " "
        )
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)  # null text yields no rows
        langs = pc.cast(batch.column("lang"), pa.string()).take(par)
        key = pc.binary_join_element_wise(langs, flat, "\x1f")
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()).take(par),
                "lang": langs,
                "key": key,
            }
        )

    tok_rows = docs_ds.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_hash_join(tok_rows, lp_ds, "key", how="left")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "lang": pd.Series([], dtype="object"),
                 "sum_lp": pd.Series([], dtype="float64"),
                 "n_scored": pd.Series([], dtype="int64"),
                 "n_tok": pd.Series([], dtype="int64")}
            )
        g = b.groupby(["doc_id", "lang"])["lp"]
        out = pd.DataFrame(
            {"sum_lp": g.sum(), "n_scored": g.count(), "n_tok": g.size()}
        ).reset_index()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_scored"] = out["n_scored"].astype("int64")
        out["n_tok"] = out["n_tok"].astype("int64")
        return out

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_scored"] > 0]  # all-OOV docs excluded
        mean_lp = b["sum_lp"].to_numpy() / b["n_scored"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "lang": b["lang"],
                "n_tokens": b["n_tok"].astype("int64"),
                "logppl_micro": np.floor(-mean_lp * quantize + 0.5).astype("int64"),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["doc_id", "lang"])
        .aggregate(
            Sum("sum_lp", alias_name="sum_lp"),
            Sum("n_scored", alias_name="n_scored"),
            Sum("n_tok", alias_name="n_tok"),
        )
        .map_batches(finalize, batch_format="pandas")
    )


def _ccnet_bucketize(scored, out_schema):
    """Thresholds + head/middle/tail census over a materialized scored
    Dataset (doc_id, lang, n_tokens, logppl_micro) — shared by the
    broadcast and bucketed-join scoring paths."""
    import ray
    from ray.data.aggregate import Count, Sum

    from .quantile import grouped_quantiles

    # per-language tercile thresholds (exact order statistics)
    thr = grouped_quantiles(
        scored, group="lang", value="logppl_micro", qs=[0.33, 0.67]
    ).to_pandas()
    # two flat dicts so the score pass can use Series.map(dict) — the
    # C fast path — instead of a per-row Python lambda
    q33_lut = dict(zip(thr["lang"], thr["q33"].astype("int64")))
    q67_lut = dict(zip(thr["lang"], thr["q67"].astype("int64")))
    thr_ref = ray.put((q33_lut, q67_lut))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"lang": pd.Series([], dtype="object"),
                 "bucket": pd.Series([], dtype="object"),
                 "n_tokens": pd.Series([], dtype="int64")}
            )
        lut33, lut67 = ray.get(thr_ref)
        q33 = batch["lang"].map(lut33).to_numpy()
        q67 = batch["lang"].map(lut67).to_numpy()
        ppl = batch["logppl_micro"].to_numpy()
        bucket = np.where(ppl <= q33, "head", np.where(ppl <= q67, "middle", "tail"))
        return pd.DataFrame(
            {"lang": batch["lang"], "bucket": bucket,
             "n_tokens": batch["n_tokens"]}
        )

    return (
        scored.map_batches(bucketize, batch_format="pandas")
        .groupby(["lang", "bucket"])
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="tokens_total"),
        )
    )
