"""Benchmark-contamination detection — flag corpus documents that
contain any benchmark passage verbatim (the pre-training hygiene step
run before every LLM data release; same shape as the n-gram overlap
checks in the GPT-3/PaLM appendices).

Distribution shape: the benchmark side is SMALL by definition (a test
set), so it is broadcast — ``ray.put`` of a frozen needle set once,
read inside every ``map_batches`` task — and the corpus side streams:
each batch is shingled into word n-grams VECTORIZED (one explode +
n-1 shifted concatenations over the flattened token array; windows
crossing document boundaries masked out), and membership is one
C-level hash-set ``isin`` per batch.  No shuffle touches document
text; the only exchange is the final distinct over flagged doc_ids
(key-sized rows).  At 100 TB this is a single streaming pass.

Matching is word-boundary-exact: a needle hits only where its full
word sequence appears (the SQL-oracle equivalent is
``position(' '||needle||' ' IN ' '||text||' ')``), never mid-token.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def extract_needles(docs_ds, every: int = 97, start: int = 10, n_words: int = 8):
    """Deterministic synthetic benchmark set: from every ``every``-th
    document with at least ``start + n_words`` words, the ``n_words``-word
    window beginning at word ``start``.  Returns a small list of needle
    strings (the broadcast side).  In production this is the real
    benchmark corpus, read once."""

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, every), every)), 0
        )
        sel = batch.filter(keep)
        needles = []
        for text in sel.column("text").to_pylist():
            words = (text or "").split(" ")
            if len(words) >= start + n_words:
                needles.append(" ".join(words[start : start + n_words]))
        return pa.Table.from_pydict({"needle": pa.array(needles, pa.string())})

    # tiny by construction (1 row per `every` docs) -> driver collect
    return [r["needle"] for r in docs_ds.map_batches(pick, batch_format="pyarrow").take_all()]


def flag_contaminated(docs_ds, needles, n_words: int = 8):
    """(doc_id, text) -> distinct (doc_id) rows for every document
    containing at least one needle as a consecutive word sequence.

    Matching is two-phase so the hot path never builds window strings:
    vectorized rolling-hash windows (functions/shingles.py) filtered by
    a C-level ``isin`` against the broadcast needle-hash set, then the
    handful of hash candidates are re-verified against the REAL window
    string — the flag set is exact, collisions cost only a string
    compare."""
    import ray

    from ..functions.shingles import explode_tokens, phrase_hash, window_hashes
    from .distinct import distinct

    usable = [p for p in needles if len(p.split(" ")) == n_words]
    needle_ref = ray.put(
        {
            "hashes": np.array([phrase_hash(p, n_words) for p in usable], np.uint64),
            "set": frozenset(usable),
        }
    )
    empty = {"doc_id": pd.Series([], dtype="int64")}

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        nd = ray.get(needle_ref)
        if not len(batch) or not len(nd["hashes"]):
            return pd.DataFrame(empty)
        words, parents = explode_tokens(batch["text"].reset_index(drop=True))
        hashes, win_parents = window_hashes(words, parents, n_words)
        if not len(hashes):
            return pd.DataFrame(empty)
        cand = np.isin(hashes, nd["hashes"])
        if not cand.any():
            return pd.DataFrame(empty)
        # exact confirm on the few candidates: rebuild just their strings
        starts = np.flatnonzero(
            (parents[: len(words) - n_words + 1] == parents[n_words - 1 :])
        )[cand]
        needle_set = nd["set"]
        hit_rows = {
            int(win_parents[i])
            for i, s in zip(np.flatnonzero(cand), starts)
            if " ".join(words[s : s + n_words]) in needle_set
        }
        doc_ids = batch["doc_id"].to_numpy()[sorted(hit_rows)]
        return pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="int64")})

    flagged = docs_ds.map_batches(flag, batch_format="pandas")
    return distinct(flagged, ["doc_id"])
