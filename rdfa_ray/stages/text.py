"""Text-analysis stages: language ID, quality metrics, token counting,
fingerprinting.  All vectorized or tight-loop ``map_batches`` with
per-actor compiled state; each has a ``queries()`` entry (SQL-checked
where the metric is integer/hash-exact).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
_TOKEN_RE_INV = re.compile(r"[^a-z0-9]+")  # post-lower complement
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WS_COLLAPSE = re.compile(r"\s+")

# BPE-ish subword split: words, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that with for on as at by".split()
)

# tiny trigram tables for the language-ID heuristic (synthetic corpora
# are English-ish; the heuristic exists as the pipeline stage pattern)
_LANG_TRIGRAMS = {
    "en": ("the", " th", "he ", "ing", "and", " an", "nd ", " of", "of ", "ed "),
    "de": ("der", "ein", "ich", "sch", "die", " de", "en ", "und", " un", "ch "),
    "fr": ("les", " le", "de ", " de", "ent", "que", " qu", "es ", "ion", "eur"),
    "es": ("de ", " de", "la ", " la", "que", " qu", "os ", "el ", " el", "ión"),
}


class TextAnalyzer:
    """Per-doc quality metrics + language guess + fingerprint.

    Counts (chars/tokens/BPE/alpha) and the whitespace-collapse all run
    as RE2 Arrow kernels over the whole batch; stopword hits come from
    one tokenize + ``is_in`` + ``bincount`` pass; the language guess is
    a (batch x 40)-trigram count matrix with the reference's
    first-strictly-greater tie rule (= ``np.argmax`` first-max over the
    table's insertion order).  The only per-row Python left is one md5
    per document over the normalized text (hashing is byte-bound).
    ``guess_lang`` below is the scalar reference twin kept for tests."""

    def __init__(self):
        self._stop_arr = pa.array(sorted(_STOPWORDS), pa.string())
        self._langs = list(_LANG_TRIGRAMS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        text = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        low = pc.utf8_lower(text)

        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(
            pc.count_substring_regex(text, "[A-Za-z0-9]+"), pa.int64()
        )
        n_bpe = pc.cast(
            pc.count_substring_regex(text, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"),
            pa.int64(),
        )
        n_alpha = pc.cast(
            pc.count_substring_regex(text, "[A-Za-z]"), pa.int64()
        )

        toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        stop_mask = pc.and_(
            pc.not_equal(flat, ""), pc.is_in(flat, value_set=self._stop_arr)
        )
        par = parents.filter(stop_mask).to_numpy(zero_copy_only=False)
        n_stop = (
            np.bincount(par, minlength=n).astype("int64")
            if len(par)
            else np.zeros(n, dtype="int64")
        )
        ntok = n_tokens.to_numpy(zero_copy_only=False)
        ratio = np.divide(
            n_stop,
            ntok,
            out=np.zeros(n, dtype="float64"),
            where=ntok > 0,
        )

        head = pc.utf8_slice_codeunits(low, 0, 2000)
        scores = np.zeros((n, len(self._langs)), dtype=np.int64)
        for j, grams in enumerate(_LANG_TRIGRAMS.values()):
            for g in grams:
                scores[:, j] += pc.count_substring(head, g).to_numpy(
                    zero_copy_only=False
                )
        best = np.argmax(scores, axis=1)
        names = np.array(self._langs, dtype=object)
        langs = np.where(scores[np.arange(n), best] > 0, names[best], "unk")

        norm = pc.replace_substring_regex(low, r"\s+", " ")
        fps = [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]

        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_bpe_tokens": n_bpe,
                "n_alpha": n_alpha,
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "stopword_ratio": pa.array(ratio, pa.float64()),
                "lang_pred": pa.array(langs.tolist(), pa.string()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )

    @staticmethod
    def guess_lang(text: str) -> str:
        """Scalar reference twin of the vectorized language scorer."""
        t = text.lower()[:2000]
        best, best_score = "unk", 0
        for lang, grams in _LANG_TRIGRAMS.items():
            score = sum(t.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        return best


_ANALYZER: list = []


def analyze_batch(batch: pa.Table) -> pa.Table:
    """Task-based TextAnalyzer (elastic tasks; the stopword array and
    compiled RE2 programs cache per worker process — an actor pool here
    would reserve CPUs against co-running stages)."""
    if not _ANALYZER:
        _ANALYZER.append(TextAnalyzer())
    return _ANALYZER[0](batch)


def analyze_text(docs_ds):
    return docs_ds.map_batches(
        analyze_batch, batch_format="pyarrow", batch_size=2048
    )


def _gram_counts(batch, n: int):
    """Vectorized per-document n-gram (total, distinct) counts for a
    pandas batch with (doc_id, text): one explode + a rolling
    polynomial hash per window (functions/shingles.py — no window
    strings are built), one C-level groupby over uint64.  Returns a
    DataFrame indexed by batch row position with columns
    (size, nunique); rows whose doc has fewer than ``n`` words are
    absent.  Distinctness is hash-distinctness (collision odds
    ~2^-64/pair — see the shingles module)."""
    import pandas as pd

    from ..functions.shingles import explode_tokens, window_hashes

    words, parents = explode_tokens(batch["text"].reset_index(drop=True))
    hashes, win_parents = window_hashes(words, parents, n)
    if not len(hashes):
        return pd.DataFrame({"size": [], "nunique": []})
    keep = pd.DataFrame({"p": win_parents, "g": hashes})
    return keep.groupby("p")["g"].agg(["size", "nunique"])


def quality_gate(docs_ds, min_chars: int = 0, n: int = 3):
    """Gopher-style repetition filter, map-side: keep documents with at
    least ``min_chars`` characters whose distinct-n-gram count exceeds
    half the total (duplicate-gram fraction < 0.5).  Documents too
    short to form an n-gram are dropped (no signal = no keep).  All
    batch columns pass through unchanged; zero shuffle."""
    import pandas as pd

    def gate(batch: pd.DataFrame):
        if not len(batch):
            return batch
        agg = _gram_counts(batch, n)
        ok_pos = agg.index[agg["nunique"] * 2 > agg["size"]].to_numpy()
        keep = pd.Series(False, index=range(len(batch)))
        keep.iloc[ok_pos] = True
        if min_chars:
            keep &= batch["text"].fillna("").str.len().to_numpy() >= min_chars
        out = batch[keep.to_numpy()].reset_index(drop=True)
        # emit Arrow with stripped metadata: pandas-origin schemas carry
        # an unhashable metadata dict that defeats Ray's block-schema
        # dedup in every downstream shuffle (see sources/io.py); empty
        # batches stay pandas (object->null typing would skew the schema)
        if not len(out):
            return out
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return docs_ds.map_batches(gate, batch_format="pandas")


def repetition_signals(docs_ds, n: int = 3):
    """Within-document repetition (the Gopher-rule family: drop docs
    whose duplicate-n-gram fraction is high): per doc, the total and
    distinct word-``n``-gram counts.  Entirely map-side — a document's
    text lives in one row, so its n-grams are complete within the
    block; the shingling is one explode + ``n-1`` shifted
    concatenations (no per-row Python), and the counts are one
    C-level pandas groupby (size + nunique).  Emits integers, not a
    ratio, so the SQL oracle compares hash-exact."""
    import numpy as np
    import pandas as pd

    def signals(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_grams": pd.Series([], dtype="int64"),
                "n_distinct": pd.Series([], dtype="int64"),
            }
        )
        if not len(batch):
            return empty
        agg = _gram_counts(batch, n)
        if not len(agg):
            return empty
        doc_ids = batch["doc_id"].to_numpy()[agg.index.to_numpy()]
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "n_grams": agg["size"].to_numpy().astype(np.int64),
                "n_distinct": agg["nunique"].to_numpy().astype(np.int64),
            }
        )

    return docs_ds.map_batches(signals, batch_format="pandas")


def rolling_fingerprints(docs_ds, window: int = 8, hash_mode: str = "fast"):
    """Document fingerprinting via winnowed rolling hashes: for each doc,
    the min-sampled set of rolling word-window hashes (one row per
    selected fingerprint) — usable for containment / plagiarism joins.

    Round 3 vectorized the whole pass on functions/shingles.py: token
    hashes + polynomial window roll (no window strings), then the
    winnow (min over each 4-run of window hashes) as a
    ``np.minimum.reduce`` over 4 shifted slices — no per-document
    Python.  Guarantee unchanged: any two documents sharing a
    ``window + 3``-word span share at least one selected fingerprint
    (standard winnowing, Schleimer et al. 2003).

    ``hash_mode``: "fast" (default) hashes tokens with pandas siphash;
    "md5" uses the SQL-reproducible md5-uint64 token hash (one hashlib
    call per distinct token) so the whole fingerprint set can be
    recomputed by the DuckDB oracle — same winnowing guarantee."""
    import numpy as np
    import pandas as pd

    from ..functions.shingles import explode_tokens, md5_token_hashes, window_hashes

    if hash_mode not in ("fast", "md5"):
        raise ValueError("rolling_fingerprints: unknown hash_mode %r" % hash_mode)
    hasher = md5_token_hashes if hash_mode == "md5" else None

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "fp": pd.Series([], dtype="uint64"),
            }
        )
        if not len(batch):
            return empty
        texts = batch["text"].fillna("").str.lower().str.replace(
            _TOKEN_RE_INV, " ", regex=True
        ).str.strip()
        words, parents = explode_tokens(texts.reset_index(drop=True))
        hashes, win_parents = window_hashes(words, parents, window, hasher=hasher)
        if not len(hashes):
            return empty
        m = len(hashes)
        w = min(4, m)
        # local minimum over each run of w consecutive windows, masked
        # to runs inside one document
        mins = np.minimum.reduce([hashes[k : m - w + 1 + k] for k in range(w)])
        run_ok = win_parents[: m - w + 1] == win_parents[w - 1 :]
        sel = pd.DataFrame(
            {"p": win_parents[: m - w + 1][run_ok], "fp": mins[run_ok]}
        )
        # short docs (< w windows) keep their global min so every doc
        # with at least one window has a fingerprint
        counts = pd.Series(win_parents).value_counts()
        shorts = counts.index[counts < w].to_numpy()
        if len(shorts):
            short_mask = np.isin(win_parents, shorts)
            short_min = (
                pd.DataFrame({"p": win_parents[short_mask], "fp": hashes[short_mask]})
                .groupby("p", sort=False)["fp"]
                .min()
                .reset_index()
            )
            sel = pd.concat([sel, short_min], ignore_index=True)
        sel = sel.drop_duplicates()
        doc_ids = batch["doc_id"].to_numpy()[sel["p"].to_numpy()]
        out = pd.DataFrame(
            {"doc_id": doc_ids, "fp": sel["fp"].to_numpy().astype("uint64")}
        )
        return out.sort_values(["doc_id", "fp"]).reset_index(drop=True)

    return docs_ds.map_batches(fp, batch_format="pandas", batch_size=1024)


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Appendix A)

# the paper's 8-word stopword-presence list (rule 7)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# failed-rule bitmask bits (mask == 0 <=> keep)
GOPHER_RULE_BITS = {
    "word_count": 1,        # n_words outside [min_words, max_words]
    "mean_word_len": 2,     # mean word length outside [3, 10]
    "symbol_ratio": 4,      # (#'#' + #'...') / n_words >= 0.1
    "bullet_lines": 8,      # >= 90% of lines start with a bullet
    "ellipsis_lines": 16,   # >= 30% of lines end with an ellipsis
    "alpha_words": 32,      # < 80% of words contain a letter
    "stopwords": 64,        # < 2 of the 8 Gopher stopwords present
}


def gopher_rules(docs_ds, min_words: int = 50, max_words: int = 100_000,
                 min_stopwords: int = 2):
    """The Gopher quality-filter rule set — the standard web-scale
    pre-training document gate (also the basis of FineWeb/Dolma's
    heuristic filters) — as ONE zero-shuffle vectorized pass.

    Per document: integer signals (word/line/symbol counts) and a
    failed-rule bitmask (``GOPHER_RULE_BITS``); ``keep = mask == 0``.
    Every rule threshold evaluates in INTEGER arithmetic (e.g. mean
    word length in [3,10] <=> ``3*n_words <= n_word_chars <=
    10*n_words``), so the output is bit-exact at any parallelism and
    hash-comparable against a SQL twin — no float ratios anywhere.

    All counting is RE2 Arrow kernels over the whole batch (a "word"
    is a ``\\S+`` run; a word "has alpha" iff the token contains a
    letter; ``...`` counts non-overlapping, the same rule as SQL
    ``replace``); the 8 stopword-presence probes are 8 vectorized
    regex passes.  No per-row Python, no exchange: at 100 TB this
    stage streams behind the read like any other map."""
    bullets_re = r"(?m)^[ \t]*[-*•]"
    ellipsis_line_re = r"(?m)(\.\.\.|…)$"

    def rules(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        text = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        low = pc.utf8_lower(text)

        i64 = lambda v: pc.cast(v, pa.int64())  # noqa: E731
        n_words = i64(pc.count_substring_regex(text, r"\S+"))
        n_ws = i64(pc.count_substring_regex(text, r"\s"))
        n_word_chars = pc.subtract(i64(pc.utf8_length(text)), n_ws)
        n_alpha_words = i64(
            pc.count_substring_regex(text, r"[^\s]*[A-Za-z][^\s]*")
        )
        n_symbols = pc.add(
            i64(pc.count_substring(text, "#")),
            i64(pc.count_substring(text, "...")),
        )
        n_lines = pc.add(i64(pc.count_substring(text, "\n")), 1)
        n_bullet = i64(pc.count_substring_regex(text, bullets_re))
        n_ellipsis = i64(pc.count_substring_regex(text, ellipsis_line_re))
        n_stop = None
        for w in _GOPHER_STOPWORDS:
            hit = i64(pc.match_substring_regex(low, r"\b%s\b" % w))
            n_stop = hit if n_stop is None else pc.add(n_stop, hit)

        def bit(mask_bool, b):
            return pc.multiply(i64(mask_bool), pa.scalar(b, pa.int64()))

        mask = bit(
            pc.or_(pc.less(n_words, min_words), pc.greater(n_words, max_words)),
            GOPHER_RULE_BITS["word_count"],
        )
        mask = pc.add(mask, bit(
            pc.or_(
                pc.less(n_word_chars, pc.multiply(n_words, 3)),
                pc.greater(n_word_chars, pc.multiply(n_words, 10)),
            ),
            GOPHER_RULE_BITS["mean_word_len"],
        ))
        mask = pc.add(mask, bit(
            pc.greater_equal(pc.multiply(n_symbols, 10), n_words),
            GOPHER_RULE_BITS["symbol_ratio"],
        ))
        mask = pc.add(mask, bit(
            pc.greater_equal(pc.multiply(n_bullet, 10), pc.multiply(n_lines, 9)),
            GOPHER_RULE_BITS["bullet_lines"],
        ))
        mask = pc.add(mask, bit(
            pc.greater_equal(pc.multiply(n_ellipsis, 10), pc.multiply(n_lines, 3)),
            GOPHER_RULE_BITS["ellipsis_lines"],
        ))
        mask = pc.add(mask, bit(
            pc.less(pc.multiply(n_alpha_words, 5), pc.multiply(n_words, 4)),
            GOPHER_RULE_BITS["alpha_words"],
        ))
        mask = pc.add(mask, bit(
            pc.less(n_stop, min_stopwords), GOPHER_RULE_BITS["stopwords"],
        ))

        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "n_words": n_words,
                "n_word_chars": n_word_chars,
                "n_lines": n_lines,
                "n_stopwords": n_stop,
                "mask": mask,
                "keep": pc.equal(mask, 0),
            }
        )

    return docs_ds.map_batches(rules, batch_format="pyarrow")


# --------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2)


def c4_rules(docs_ds, min_sentences: int = 3, min_line_words: int = 5):
    """The C4 line-and-page cleaning pass — the other canonical
    web-corpus filter next to ``gopher_rules``.  Line level: keep only
    lines that end in terminal punctuation (``. ! ? "``), carry at
    least ``min_line_words`` whitespace words, and do not mention
    "javascript".  Page level: drop documents whose CLEANED text has
    fewer than ``min_sentences`` sentence-final marks, or whose raw
    text contains "lorem ipsum" or a curly brace.

    Zero shuffle: a document's lines live in its own row, so the line
    edit is explode -> vectorized pandas string predicates -> one
    C-level groupby reassembly (the only per-document Python is the
    final ``'\\n'.join`` — same budget as the accepted one-md5-per-doc
    elsewhere in this module).  Emits the cleaned text plus integer
    line/sentence counts and the page keep flag, all reproducible in
    SQL (the DuckDB twin uses ``list_filter`` over ``string_split``)."""
    import pandas as pd

    def clean(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "text_clean": pd.Series([], dtype="object"),
                "n_lines": pd.Series([], dtype="int64"),
                "n_lines_kept": pd.Series([], dtype="int64"),
                "n_sentences": pd.Series([], dtype="int64"),
                "keep": pd.Series([], dtype="bool"),
            }
        )
        if not len(batch):
            return empty
        text = batch["text"].fillna("")
        lines = text.str.split("\n")
        n_lines = lines.str.len().to_numpy("int64")
        ex = lines.explode()  # index = original row position
        good = (
            ex.str.contains(r'[.!?"]$', regex=True, na=False)
            & (ex.str.count(r"\S+") >= min_line_words)
            & ~ex.str.lower().str.contains("javascript", regex=False, na=False)
        )
        kept = ex[good]
        joined = kept.groupby(level=0).agg("\n".join)
        clean_text = pd.Series("", index=range(len(batch)), dtype="object")
        clean_text.update(joined)
        n_kept = pd.Series(0, index=range(len(batch)), dtype="int64")
        n_kept.update(good.groupby(level=0).sum().astype("int64"))
        n_sent = clean_text.str.count(r"[.!?]").astype("int64")
        keep = (
            (n_sent >= min_sentences)
            & ~text.str.lower().str.contains("lorem ipsum", regex=False)
            & ~text.str.contains("{", regex=False)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "text_clean": clean_text.to_numpy(),
                "n_lines": n_lines,
                "n_lines_kept": n_kept.to_numpy(),
                "n_sentences": n_sent.to_numpy(),
                "keep": keep.to_numpy(),
            }
        )

    return docs_ds.map_batches(clean, batch_format="pandas")


# --------------------------------------------------------------------------
# Gopher repetition suite (Rae et al. 2021 App. A, Table A1: the nine
# repetition rules — top-n-gram char fraction for n=2..4, duplicate-
# n-gram char fraction for n=5..10)

# drop thresholds in integer percent (fraction > thr/100 fails)
GOPHER_TOP_THR = {2: 20, 3: 18, 4: 16}
GOPHER_DUP_THR = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def gopher_repetition(docs_ds):
    """All nine Gopher repetition rules in ONE zero-shuffle pass:
    per document, the characters covered by the most frequent word
    n-gram (n = 2, 3, 4; ties broken by the lexicographically smallest
    gram, the SQL ``ORDER BY cnt DESC, g`` rule) and by all duplicated
    word n-grams (n = 5..10, counted per occurrence — the published
    counting variant, NOT positional char-marking), plus the failed-
    rule bitmask (bit ``1 << (n-2)``); fail = ``chars * 100 >
    thr_pct * total_chars`` in INTEGER arithmetic, so the output is
    bit-exact at any parallelism and hash-comparable to the DuckDB
    twin.

    Vectorized: one token explode, rolling window HASHES per n (no
    window strings in the hot path — ``functions/shingles.py``), char
    lengths from a word-length cumsum; gram strings materialize ONLY
    for the rare count-tied top-gram candidates that need the
    lexicographic tie-break.  Gram identity is hash identity
    (collision odds ~2^-64/pair, the ``_gram_counts`` stance).  A
    gram's char length counts its separators (``length(g)`` in SQL);
    the oracle contract assumes single-spaced text, like every other
    token-level oracle here."""
    import pandas as pd

    from ..functions.shingles import explode_tokens, window_hashes

    def signals(batch: pd.DataFrame) -> pd.DataFrame:
        nrows = len(batch)
        cols = {"doc_id": pd.Series([], dtype="int64"),
                "total_chars": pd.Series([], dtype="int64")}
        for n in range(2, 5):
            cols["top%d_chars" % n] = pd.Series([], dtype="int64")
        for n in range(5, 11):
            cols["dup%d_chars" % n] = pd.Series([], dtype="int64")
        cols["mask"] = pd.Series([], dtype="int64")
        cols["keep"] = pd.Series([], dtype="bool")
        if not nrows:
            return pd.DataFrame(cols)

        words, parents = explode_tokens(batch["text"].reset_index(drop=True))
        wl = pd.Series(words, dtype=object).str.len().to_numpy(np.int64)
        tot = np.zeros(nrows, np.int64)
        np.add.at(tot, parents, wl)
        cs = np.concatenate([[0], np.cumsum(wl)])

        out = {"doc_id": batch["doc_id"].astype("int64").to_numpy(),
               "total_chars": tot}
        mask = np.zeros(nrows, np.int64)
        for n in range(2, 11):
            col = np.zeros(nrows, np.int64)
            hashes, win_par = window_hashes(words, parents, n)
            if len(hashes):
                m = len(words) - n + 1
                valid = parents[:m] == parents[n - 1:]
                pos = np.arange(m)[valid]
                gramlen = cs[pos + n] - cs[pos] + (n - 1)
                g = (
                    pd.DataFrame(
                        {"p": win_par, "h": hashes,
                         "len": gramlen, "pos": pos}
                    )
                    .groupby(["p", "h"], sort=False)
                    .agg(cnt=("pos", "size"), length=("len", "first"),
                         first_pos=("pos", "min"))
                    .reset_index()
                )
                if n <= 4:
                    mx = g.groupby("p")["cnt"].transform("max")
                    cand = g[g["cnt"] == mx]
                    tied_mask = cand["p"].duplicated(keep=False)
                    if tied_mask.any():
                        tied = cand[tied_mask].copy()
                        tied["s"] = [
                            " ".join(words[q:q + n])
                            for q in tied["first_pos"].to_numpy()
                        ]
                        tied = tied.sort_values(
                            ["p", "s"], kind="mergesort"
                        ).drop_duplicates("p")
                        cand = pd.concat(
                            [cand[~tied_mask], tied[cand.columns]],
                            ignore_index=True,
                        )
                    col[cand["p"].to_numpy()] = (
                        cand["cnt"].to_numpy(np.int64)
                        * cand["length"].to_numpy(np.int64)
                    )
                    out["top%d_chars" % n] = col
                else:
                    d = g[g["cnt"] >= 2]
                    if len(d):
                        np.add.at(
                            col,
                            d["p"].to_numpy(),
                            d["cnt"].to_numpy(np.int64)
                            * d["length"].to_numpy(np.int64),
                        )
                    out["dup%d_chars" % n] = col
            else:
                out[("top%d_chars" if n <= 4 else "dup%d_chars") % n] = col
            thr = GOPHER_TOP_THR.get(n) or GOPHER_DUP_THR[n]
            mask |= np.where(col * 100 > thr * tot, 1 << (n - 2), 0)
        out["mask"] = mask
        out["keep"] = mask == 0
        return pd.DataFrame(out)

    return docs_ds.map_batches(signals, batch_format="pandas")


def normalize_text(docs_ds, form: str = "NFC"):
    """Unicode + whitespace canonicalization — the first cleaning pass
    of any web-scale corpus drop (decomposed accents, NBSP, stray
    control bytes and ragged whitespace all defeat downstream exact
    dedup and tokenization if left raw):

    1. Unicode normalization to ``form`` (NFC default),
    2. NBSP (U+00A0) -> ASCII space,
    3. C0/C1-control strip (tab/newline survive into step 4),
    4. whitespace-run collapse to one space + trim.

    Zero-shuffle vectorized Arrow map (RE2 kernels); DuckDB's
    ``nfc_normalize``/``regexp_replace`` reproduce every step, so the
    op is SQL-oracle-checkable end to end.  Returns (doc_id,
    text_norm, n_chars_norm).

    Reference analogue: none in pyrdfa3 — beyond-reference cleaning
    family (C4/CCNet preprocessing)."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError("normalize_text: unknown Unicode form %r" % form)

    def kernel(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column("text"), pa.string())
        # Unicode normalization: pyarrow's utf8_normalize (utf8proc,
        # checked at 16.1) does NOT compose e+U+0301 -> \u00E9, so NFC/NFKC
        # must go through CPython's unicodedata \u2014 but ONLY for rows
        # that can need it: ASCII strings are normalized by definition,
        # and web corpora are overwhelmingly ASCII, so the Python-level
        # pass touches a small minority of rows (vectorized mask first)
        non_ascii = pc.invert(pc.match_substring_regex(t, r"^[\x00-\x7F]*$"))
        if pc.any(pc.fill_null(non_ascii, False)).as_py():
            import unicodedata

            s = t.to_pandas()
            sel = pc.fill_null(non_ascii, False).to_numpy(zero_copy_only=False)
            s[sel] = [
                unicodedata.normalize(form, v) if v is not None else None
                for v in s[sel]
            ]
            t = pa.array(s, pa.string())
        t = pc.replace_substring(t, "\u00A0", " ")  # NBSP -> space
        t = pc.replace_substring_regex(
            t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
        )
        t = pc.replace_substring_regex(t, r"\s+", " ")
        # ASCII-space trim only: after the \s+ collapse every ASCII
        # whitespace edge IS a single space, and SQL trim() (the oracle)
        # trims nothing else — utf8_trim_whitespace would additionally
        # eat Unicode spaces (U+2000…) and silently diverge from SQL
        t = pc.utf8_trim(t, " ")
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text_norm": t,
                "n_chars_norm": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return docs_ds.map_batches(kernel, batch_format="pyarrow")
