"""Distributed markup-file source: directories / globs of (X)HTML,
SVG or XML documents become a transcripts-shaped Dataset that feeds
the same distill -> link -> canonicalize -> materialize pipeline as
Parquet transcripts.

This is the engine's analogue of the reference's primary input mode —
``pyRdfa.processURI`` / CLI over local files (``pyRdfa/__init__.py``'s
``_process_one_node`` source loop) — re-expressed as a Ray Data
source: ``ray.data.read_binary_files(include_paths=True)`` streams the
files as (bytes, path) blocks in parallel across the cluster, and a
map task decodes each document into one "turn" row:

    conv_id  = the file path (becomes the document's graph identity /
               resume partition key — hash-partitioned like any other
               conv_id, so a million-file crawl shards evenly)
    turn_idx = 0
    role     = "document"
    text     = decoded markup
    tool     = media type sniffed from the NAME only (the kernel
               re-sniffs CONTENT per document; this column is
               informational, matching the transcripts layout)
    ts       = file default epoch (constant: deterministic output)

Decode errors follow the N-Triples source's contract: ``on_malformed=
"raise"`` (default) fails loudly naming the file; ``"skip"``
quarantines undecodable files so one corrupt shard cannot kill a
multi-hour crawl distill.
"""

from __future__ import annotations

import pyarrow as pa

TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_SUFFIX_TYPES = (
    (".xhtml", "application/xhtml+xml"),
    (".svg", "image/svg+xml"),
    (".xml", "application/xml"),
    (".htm", "text/html"),
    (".html", "text/html"),
)


def _name_media_type(path: str) -> str:
    low = path.lower()
    for suffix, mtype in _SUFFIX_TYPES:
        if low.endswith(suffix):
            return mtype
    return "text/html"


def decode_files_batch(
    batch: pa.Table, encoding: str = "utf-8", on_malformed: str = "raise"
) -> pa.Table:
    """(bytes, path) rows -> transcript-turn rows (one per document)."""
    cols = {name: [] for name in TURNS_SCHEMA.names}
    paths = batch.column("path").to_pylist()
    for raw, path in zip(batch.column("bytes").to_pylist(), paths):
        try:
            text = raw.decode(encoding)
        except UnicodeDecodeError as e:
            if on_malformed == "skip":
                continue
            raise ValueError(
                "cannot decode %r as %s: %s" % (path, encoding, e)
            ) from e
        cols["conv_id"].append(path)
        cols["turn_idx"].append(0)
        cols["role"].append("document")
        cols["text"].append(text)
        cols["tool"].append(_name_media_type(path))
        cols["ts"].append(0)
    return pa.Table.from_pydict(cols, schema=TURNS_SCHEMA)


def read_markup_documents(
    paths, encoding: str = "utf-8", on_malformed: str = "raise"
):
    """Read markup file(s)/dir(s) into a transcripts-shaped Dataset.

    Feed the result anywhere a transcripts Dataset goes —
    ``pipelines.flagship.run_flagship`` / ``build_triples`` — to
    distill a directory of HTML documents exactly like the reference
    CLI distills files, but sharded across the cluster.
    """
    import functools

    import ray.data as rd

    fn = functools.partial(
        decode_files_batch, encoding=encoding, on_malformed=on_malformed
    )
    return rd.read_binary_files(paths, include_paths=True).map_batches(
        fn, batch_format="pyarrow"
    )
