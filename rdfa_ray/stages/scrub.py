"""PII scrubbing — the redaction pass every large-scale training-data
pipeline runs before anything else touches the text.

Stateful-stage shape: the patterns are compiled ONCE per actor in
``__init__`` (the mandated setup-vs-work split for ``map_batches``
callable classes), and ``__call__`` applies them with pandas'
vectorized ``str.replace`` / ``str.count`` (C-looped over the batch,
no Python per-row call).  Patterns are deliberately RE2-compatible —
no backreferences or lookarounds — so the DuckDB ``regexp_replace``
oracle evaluates the exact same language.

Replacement order matters and is fixed: emails, then phones, then
IPv4 — the placeholders contain no digits or '@', so later passes
never re-match earlier redactions.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# RE2-compatible (also valid Python re): see module docstring
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d[\d\- ]{6,}\d"  # international-prefixed numbers
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

RULES = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)


class PiiScrubber:
    """map_batches callable: (doc_id, text) -> (doc_id, text_clean,
    n_email, n_phone, n_ip)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.rules = [(name, re.compile(rx), sub) for name, rx, sub in RULES]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].astype("string")
        out = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64")})
        counts = {}
        for name, rx, sub in self.rules:
            counts["n_%s" % name] = text.str.count(rx).astype("int64")
            text = text.str.replace(rx, sub, regex=True)
        out["text_clean"] = text.astype(object)
        for k, v in counts.items():
            out[k] = v
        return out


_SCRUBBERS: dict = {}


def scrub_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Task-based scrubber: elastic tasks instead of a fixed actor
    pool (the round-2 lesson — hard actor caps starve stages), with
    the compiled ruleset cached once per worker PROCESS, so the
    setup-once property of the actor form is kept."""
    scr = _SCRUBBERS.get(text_col)
    if scr is None:
        scr = _SCRUBBERS[text_col] = PiiScrubber(text_col)
    return scr(batch)


def scrub_documents(docs_ds, text_col: str = "text"):
    """Scrub a (doc_id, text) Dataset -> (doc_id, text_clean, n_email,
    n_phone, n_ip)."""
    return docs_ds.map_batches(
        scrub_batch, fn_kwargs={"text_col": text_col}, batch_format="pandas"
    )
