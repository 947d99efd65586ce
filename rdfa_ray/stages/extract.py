"""HTML visible-text extraction + boilerplate signals over markup
columns — the web-pipeline "extract" stage (trafilatura/jusText
territory), built on the engine's own lenient HTML5 builder
(``dom/html_builder.py``, the same parser the RDFa distiller trusts;
reference analogue: the DOM the distiller walks,
``pyRdfa/__init__.py:616-660``).

Per row: parse, walk the tree iteratively in document order (no
recursion limits), skipping non-visible subtrees
(script/style/noscript/template) and inserting line breaks around
block elements; the visible text is whitespace-normalized per line
with empty lines dropped.  Signals are the ones extraction pipelines
gate on: markup tag count, anchor count, link density (visible chars
under ``<a>`` / total visible chars), and the text-to-markup ratio —
both densities as deterministic integer basis points, so results are
hash-stable across platforms.

The per-row DOM parse is inherently rowwise Python — the same
documented hot-path shape as the distill kernel itself (an elastic
task stage; no per-batch setup to hoist).
"""

from __future__ import annotations

import functools

import pyarrow as pa

from ..dom.html_builder import parse_html
from ..dom.node import Element

_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "form",
}

EXTRACT_SCHEMA = pa.schema(
    [
        ("clean_text", pa.large_string()),
        ("n_tags", pa.int32()),
        ("n_links", pa.int32()),
        ("link_density_bps", pa.int32()),
        ("text_ratio_bps", pa.int32()),
    ]
)


def extract_visible(markup: str) -> tuple[str, int, int, int, int]:
    """(clean_text, n_tags, n_links, link_density_bps, text_ratio_bps)
    for one markup fragment."""
    doc = parse_html(markup or "")
    pieces: list[str] = []
    n_tags = 0
    n_links = 0
    link_chars = 0
    total_chars = 0
    stack: list = [("enter", doc.root, False)]
    while stack:
        kind, node, in_link = stack.pop()
        if kind == "text":
            pieces.append(node)
            n = len("".join(node.split()))  # non-whitespace chars
            total_chars += n
            if in_link:
                link_chars += n
            continue
        if kind == "exit":  # pushed only for block elements
            pieces.append("\n")
            continue
        n_tags += 1
        is_link = in_link or node.local == "a"
        if node.local == "a":
            n_links += 1
        if node.local in _BLOCK:
            pieces.append("\n")
            stack.append(("exit", node, is_link))
        # LIFO: children pushed after "exit" pop before it -> document
        # order with the closing line break after the subtree
        for c in reversed(node.children):
            if isinstance(c, Element):
                if c.local not in _SKIP:
                    stack.append(("enter", c, is_link))
            else:
                stack.append(("text", c, is_link))
    text = "".join(pieces)
    lines = [" ".join(ln.split()) for ln in text.split("\n")]
    clean = "\n".join(ln for ln in lines if ln)
    markup_len = max(1, len(markup or ""))
    ld = (10000 * link_chars) // max(1, total_chars)
    tr = min(10000, (10000 * len(clean)) // markup_len)
    return clean, n_tags, n_links, ld, tr


def extract_batch(batch: pa.Table, text_col: str = "text",
                  keep: tuple = ()) -> pa.Table:
    """extract_visible over a batch; ``keep`` columns carry through."""
    texts = batch.column(text_col).to_pylist()
    rows = [extract_visible(t) for t in texts]
    cols = {k: batch.column(k) for k in keep}
    for i, name in enumerate(EXTRACT_SCHEMA.names):
        cols[name] = pa.array(
            [r[i] for r in rows], EXTRACT_SCHEMA.field(name).type
        )
    return pa.Table.from_pydict(cols)


def extract_text(ds, text_col: str = "text", keep: tuple = ()):
    """markup Dataset -> visible text + boilerplate signals (elastic
    task stage)."""
    return ds.map_batches(
        functools.partial(extract_batch, text_col=text_col, keep=tuple(keep)),
        batch_format="pyarrow",
    )
