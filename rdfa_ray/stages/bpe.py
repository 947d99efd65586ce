"""Byte-pair-encoding tokenizer: distributed training + encoding.

Beyond-reference training-data op (the tokens.py family).  The split
between the distributed and driver parts follows how production
tokenizer trainers actually scale (HuggingFace `tokenizers`,
SentencePiece): the DATA-scale work is the word histogram — one
shuffle of per-block ``(word, count)`` partials, bounded by per-block
vocabulary, never by corpus size — pruned to a bounded working
vocabulary (top ``max_words`` by count with a deterministic
count-desc/word-asc tie-break; the standard min-frequency /
vocab-budget approximation every practical trainer makes).  The merge
loop then runs over that bounded histogram on the driver, but fully
vectorized: pair statistics and merge application are pyarrow/numpy
kernels over padded symbol strings — no per-symbol Python anywhere.

Merge semantics match the classic Sennrich-style trainer:

* a word is a ``[a-z0-9]+`` token (the engine's text_metrics /
  tokens.py tokenizer) with a ``</w>`` end-of-word symbol appended;
* each round merges the globally most frequent adjacent symbol pair
  (ties broken lexicographically on the pair for determinism) in
  every word, greedily left-to-right.  Left-to-right non-overlapping
  string replacement over the space-separated symbol string is run to
  a fixpoint, which reproduces exactly the symbol-scan semantics
  (consecutive disjoint occurrences share a delimiter space, so one
  replace pass can miss them; the fixpoint pass picks them up and can
  never merge a pair a symbol scan would not);
* training stops early when the best pair's count drops below
  ``min_pair_count`` (2 by default — merging hapax pairs is noise).

Encoding is distributed and factorized per UNIQUE word per batch: the
merge table is broadcast in the task closure (a few KiB), each batch
collects its distinct words, applies the merges in rank order with the
same vectorized fixpoint replace over the unique-word array, and maps
token counts back to documents via an offsets-indexed scatter-add —
no per-document or per-symbol Python anywhere (splitting is the Arrow
regex-split kernel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_END = "</w>"


def _split_list(col):
    """Lower-case and split on non-[a-z0-9] runs -> ListArray of words
    per row (with boundary empty strings still present)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):  # an all-null block types as null
        col = col.cast(pa.string())
    txt = pc.utf8_lower(pc.fill_null(col, ""))
    lst = pc.split_pattern_regex(txt, "[^a-z0-9]+")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    return lst


def _split_words(col) -> pa.Array:
    """Flattened non-empty words of a text column (vectorized — the
    same ``[a-z0-9]+``-over-lowercase tokenization as _TOKEN_RE)."""
    flat = _split_list(col).values
    return flat.filter(pc.not_equal(flat, ""))


def word_histogram(docs_ds, text_col: str = "text", max_words: int = 65536):
    """Corpus word histogram, pruned to the ``max_words`` most frequent
    words (count desc, word asc): per-block vectorized value_counts
    partials (only per-block distinct words shuffle) -> one grouped sum
    -> distributed sort + limit.  Returns a Dataset of (word, n)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = _split_words(batch.column(text_col))
        vc = flat.value_counts()
        return pa.Table.from_pydict(
            {
                "word": pc.cast(vc.field("values"), pa.string()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    merged = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    return merged.sort(["n", "word"], descending=[True, False]).limit(max_words)


def _split_offsets(col: pa.Array):
    """Split space-separated symbol strings -> (flat values, int64
    offsets numpy) regardless of string/large_string chunking."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.split_pattern(col, " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    return lst.values, np.asarray(lst.offsets, dtype=np.int64)


def _pair_stats(col: pa.Array, weights: np.ndarray) -> pd.Series:
    """Weighted adjacent-pair counts over symbol strings (vectorized:
    flatten via list offsets, join neighbours, mask word boundaries)."""
    values, offsets = _split_offsets(col)
    n = len(values)
    if n < 2:
        return pd.Series(dtype="int64")
    sep = pa.scalar(" ", values.type)
    pairs = pc.binary_join_element_wise(
        values.slice(0, n - 1), values.slice(1, n - 1), sep
    )
    valid = np.ones(n - 1, dtype=bool)
    # the last symbol of each word cannot pair with the next word's first
    ends = offsets[1:] - 1
    valid[ends[:-1]] = False
    lens = offsets[1:] - offsets[:-1]
    w = np.repeat(weights, lens)[: n - 1][valid]
    p = pairs.filter(pa.array(valid)).to_pandas()
    if not len(p):
        return pd.Series(dtype="int64")
    return pd.Series(w).groupby(p, sort=False).sum()


def _apply_merge(col, pair: str, joined: str):
    """Greedy left-to-right merge of ``pair`` ("a b") into ``joined``
    ("ab") across all symbol strings — fixpoint of the non-overlapping
    replace (see module docstring)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pat, rep = " %s " % pair, " %s " % joined
    pad = pa.scalar(" ", col.type)
    padded = pc.binary_join_element_wise(
        pad, col, pad, pa.scalar("", col.type)
    )
    while pc.any(pc.match_substring(padded, pat)).as_py():
        padded = pc.replace_substring(padded, pat, rep)
    return pc.utf8_trim_whitespace(padded)


def _to_symbols(words: list[str]) -> pa.Array:
    return pa.array(
        [" ".join(list(w)) + " " + _END for w in words], pa.large_string()
    )


def train_bpe(
    docs_ds,
    n_merges: int = 48,
    text_col: str = "text",
    max_words: int = 65536,
    min_pair_count: int = 2,
) -> pa.Table:
    """Train BPE merges over a corpus.  Returns the merge table
    (rank: int64, left, right: string) — the tokenizer artifact
    ``encode_token_counts`` consumes."""
    hist = word_histogram(docs_ds, text_col=text_col, max_words=max_words)
    h = hist.to_pandas()  # bounded by max_words — the documented budget
    ranks, lefts, rights = [], [], []
    if not len(h):  # vocabulary-less corpus -> no merges to learn
        h = pd.DataFrame({"word": [], "n": []})
    col = _to_symbols(h["word"].tolist())
    weights = h["n"].to_numpy()

    for rank in range(n_merges):
        stats = _pair_stats(col, weights)
        if not len(stats):
            break
        # deterministic total order: count desc, pair asc
        best = stats.sort_index().sort_values(kind="stable", ascending=False).index[0]
        if int(stats[best]) < min_pair_count:
            break
        a, b = best.split(" ")
        ranks.append(rank)
        lefts.append(a)
        rights.append(b)
        col = _apply_merge(col, best, a + b)
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
        }
    )


def _encode_unique(words: list[str], merges: list[tuple[str, str]]) -> np.ndarray:
    """Token count per unique word under the merge list (vectorized
    fixpoint replaces in rank order)."""
    col = _to_symbols(words)
    for a, b in merges:
        col = _apply_merge(col, "%s %s" % (a, b), a + b)
    spaces = pc.count_substring(col, " ")
    return np.asarray(spaces) + 1


def encode_token_counts(docs_ds, merges: pa.Table, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Per-document BPE token count under a trained merge table:
    distributed map_batches, factorized per unique word per batch (the
    merge table rides the task closure — broadcast-small)."""
    pairs = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))

    def enc(batch: pa.Table) -> pa.Table:
        lst = _split_list(batch.column(text_col))
        flat, offsets = lst.values, np.asarray(lst.offsets, dtype=np.int64)
        keep = np.asarray(pc.not_equal(flat, ""))
        doc_ix = np.repeat(
            np.arange(batch.num_rows), offsets[1:] - offsets[:-1]
        )[keep]
        words = pd.Series(flat.filter(pa.array(keep)).to_pandas())
        uniq = pd.unique(words)
        n_tokens = np.zeros(batch.num_rows, dtype=np.int64)
        if len(uniq):
            per_word = pd.Series(
                _encode_unique(list(uniq), pairs), index=uniq, dtype="int64"
            )
            np.add.at(n_tokens, doc_ix, words.map(per_word).to_numpy())
        return pa.Table.from_pydict(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )

    return docs_ds.map_batches(enc, batch_format="pyarrow")


def sequential_reference(texts, n_merges: int, min_pair_count: int = 2):
    """Independent sequential Sennrich-style trainer — the golden-file
    oracle generator for the driver's SQL harness (tests keep their own
    twin copy).  Plain dict/Counter symbol scan, greedy left-to-right
    merge application; same tokenization contract as the distributed
    trainer ([a-z0-9]+ over lowercase) and the same deterministic total
    order (count desc, pair asc).  Returns (merge list, final
    symbol-list per word)."""
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+")
    hist = Counter()
    for t in texts:
        hist.update(tok.findall((t or "").lower()))
    words = {w: list(w) + ["</w>"] for w in hist}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += hist[w]
        if not pairs:
            break
        top = max(pairs.values())
        best = min(
            (p for p, c in pairs.items() if c == top), key=lambda p: " ".join(p)
        )
        if top < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words
