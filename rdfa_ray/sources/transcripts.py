"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema fixed by ``BASELINE.json`` ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.  ~20 turns per conversation; the
``text`` mix is chosen per-row from ``crc32(conv_id:turn_idx)`` so it
is reproducible and scale-invariant:

  60% HTML5+RDFa fragments (alias-entity names; ~10% hit entity 0)
  15% XHTML documents (1/3 of them RDFa 1.0 via @version)
   5% SVG with embedded RDF/XML;  5% <script type="text/turtle">
  10% plain prose (0 triples; exercises the fast path)
   5% malformed markup (diagnostics, never a crash)

Generation runs distributed (``ray.data.range -> map_batches``); no
RNG / wall clock anywhere.
"""

from __future__ import annotations

import html
import zlib

import pyarrow as pa

from .aliases import entity_iri, entity_surface
from .io import read_parquet as read_parquet_clean

TURNS_PER_CONV = 20
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("", "browser", "search")

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _h(conv_id: str, turn_idx: int, salt: str = "") -> int:
    return zlib.crc32(("%s:%d:%s" % (conv_id, turn_idx, salt)).encode())


def _pick_entity(conv_id: str, turn_idx: int) -> int:
    # ~10% of markup rows reference the hot entity 0
    if _h(conv_id, turn_idx, "hot") % 10 == 0:
        return 0
    return _h(conv_id, turn_idx, "ent") % 50


def _html5_fragment(conv_id: str, turn_idx: int) -> str:
    e = _pick_entity(conv_id, turn_idx)
    surface = entity_surface(e)
    variant = _h(conv_id, turn_idx, "v") % 4
    doc = "#item%d" % (_h(conv_id, turn_idx, "i") % 1000)
    if variant == 0:
        return (
            '<div vocab="http://schema.org/" about="%s" typeof="Organization">'
            '<span property="name">%s</span>'
            '<span property="description">Discussed in turn %d</span></div>'
            % (doc, surface, turn_idx)
        )
    if variant == 1:
        return (
            '<div prefix="ex: http://example.org/terms#" about="%s">'
            '<a rel="ex:mentions" href="http://topics.local/t%d">topic</a>'
            '<span property="ex:subject">%s</span></div>'
            % (doc, _h(conv_id, turn_idx, "t") % 200, surface)
        )
    if variant == 2:
        return (
            '<div vocab="http://schema.org/" typeof="Event" about="%s">'
            '<span property="performer">%s</span>'
            '<time property="startDate">2026-0%d-1%d</time>'
            '<ul><li inlist="" property="keywords">alpha%d</li>'
            '<li inlist="" property="keywords">beta%d</li></ul></div>'
            % (doc, surface, 1 + turn_idx % 9, turn_idx % 10,
               turn_idx % 7, turn_idx % 5)
        )
    return (
        '<p about="%s" property="http://purl.org/dc/terms/title" lang="en">'
        "Notes on %s</p>" % (doc, surface)
    )


def _xhtml_doc(conv_id: str, turn_idx: int) -> str:
    e = _pick_entity(conv_id, turn_idx)
    surface = entity_surface(e)
    if _h(conv_id, turn_idx, "10") % 3 == 0:
        # RDFa 1.0 path via @version
        return (
            '<html version="RDFa 1.0" xmlns:dc="http://purl.org/dc/elements/1.1/">'
            "<head><title>t</title></head>"
            '<body><div about="#r%d"><span property="dc:creator">%s</span></div>'
            "</body></html>" % (turn_idx, surface)
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.1//EN" '
        '"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-2.dtd">\n'
        '<html xmlns="http://www.w3.org/1999/xhtml"><head><title>t</title></head>'
        '<body><div about="#r%d" typeof="http://schema.org/Person">'
        '<span property="http://schema.org/name">%s</span></div></body></html>'
        % (turn_idx, surface)
    )


def _svg_doc(conv_id: str, turn_idx: int) -> str:
    e = _pick_entity(conv_id, turn_idx)
    return (
        '<svg xmlns="http://www.w3.org/2000/svg"><metadata>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        '<rdf:Description rdf:about="%s" xmlns:dc="http://purl.org/dc/terms/">'
        "<dc:title>Diagram %d</dc:title></rdf:Description>"
        "</rdf:RDF></metadata></svg>" % (entity_iri(e), turn_idx)
    )


def _turtle_doc(conv_id: str, turn_idx: int) -> str:
    e = _pick_entity(conv_id, turn_idx)
    return (
        '<script type="text/turtle">\n'
        "@prefix ex: <http://example.org/terms#> .\n"
        '<%s> ex:mentionCount %d ; ex:label "%s" .\n'
        "</script>" % (entity_iri(e), _h(conv_id, turn_idx, "c") % 100, entity_surface(e))
    )


_PROSE_WORDS = (
    "the quick brown fox jumps over lazy dogs while discussing quarterly "
    "results and planning the next sprint with renewed focus on quality"
).split()


def _prose(conv_id: str, turn_idx: int) -> str:
    h = _h(conv_id, turn_idx, "p")
    n = 8 + h % 24
    return " ".join(_PROSE_WORDS[(h + i) % len(_PROSE_WORDS)] for i in range(n))


def _malformed(conv_id: str, turn_idx: int) -> str:
    variant = _h(conv_id, turn_idx, "m") % 3
    if variant == 0:
        return '<div about="[]" property="ex:p" prefix="ex: http://e/">unclosed <span>mess'
    if variant == 1:
        return '<div about="[undefinedprefix:x]" property="undefinedprefix:y">bad curie</div>'
    return '<?xml version="1.0"?><svg xmlns="http://www.w3.org/2000/svg"><broken'


def text_for(conv_id: str, turn_idx: int) -> str:
    h = _h(conv_id, turn_idx) % 100
    if h < 60:
        return _html5_fragment(conv_id, turn_idx)
    if h < 75:
        return _xhtml_doc(conv_id, turn_idx)
    if h < 80:
        return _svg_doc(conv_id, turn_idx)
    if h < 85:
        return _turtle_doc(conv_id, turn_idx)
    if h < 95:
        return _prose(conv_id, turn_idx)
    return _malformed(conv_id, turn_idx)


def rows_for_range(start: int, stop: int) -> pa.Table:
    """Build transcript rows for global row indices [start, stop)."""
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for gi in range(start, stop):
        conv = gi // TURNS_PER_CONV
        turn = gi % TURNS_PER_CONV
        conv_id = "conv%08d" % conv
        conv_ids.append(conv_id)
        turn_idxs.append(turn)
        roles.append(_ROLES[turn % 3])
        texts.append(text_for(conv_id, turn))
        tools.append(_TOOLS[(turn % 3 == 2) and (1 + turn % 2)])
        tss.append(EPOCH_US + gi * 1_000_000)
    return pa.Table.from_pydict(
        {
            "conv_id": conv_ids,
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def transcripts_dataset(n_turns: int, override_num_blocks: int | None = None):
    """Distributed generation: tiny shard-spec rows fan out to
    map_batches generators (no driver loop; rows are built on workers).

    Shard specs are materialized items (not lazy ReadTasks) because
    Ray 2.49's range datasource mis-fuses with downstream all-to-all
    ops ("Not a block type: ReadTask")."""
    import ray.data as rd

    n_shards = override_num_blocks or 64
    n_shards = max(1, min(n_shards, n_turns))
    per = (n_turns + n_shards - 1) // n_shards
    specs = [
        {"start": i * per, "stop": min((i + 1) * per, n_turns)}
        for i in range(n_shards)
        if i * per < n_turns
    ]

    def gen(batch: pa.Table) -> pa.Table:
        tables = [
            rows_for_range(s, e)
            for s, e in zip(batch.column("start").to_pylist(), batch.column("stop").to_pylist())
        ]
        return pa.concat_tables(tables)

    ds = rd.from_items(specs, override_num_blocks=len(specs))
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=1)


def write_transcripts(path: str, n_turns: int, override_num_blocks: int | None = None):
    transcripts_dataset(n_turns, override_num_blocks).write_parquet(path)


# ---------------------------------------------------------------------------
# Transcript view over the driver's documents table (used by entry() and
# the SQL-checked queries: the wrapping is deterministic and trivially
# expressible in DuckDB).

DOC_NS = "http://docs.local/d"
SCHEMA_TEXT = "http://schema.org/text"


def wrap_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source, n_chars) -> transcripts rows
    whose markup yields exactly one triple per doc:
    (<DOC_NS{doc_id}>, schema:text, text)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    conv_ids, turn_idxs, roles, out_texts, tools, tss = [], [], [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        conv_ids.append("doc%08d" % doc_id)
        turn_idxs.append(0)
        roles.append("user")
        out_texts.append(
            '<div about="%s%d" property="%s">%s</div>'
            % (DOC_NS, doc_id, SCHEMA_TEXT, html.escape(text or "", quote=False))
        )
        tools.append("")
        tss.append(EPOCH_US + doc_id)
    return pa.Table.from_pydict(
        {
            "conv_id": conv_ids,
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": roles,
            "text": out_texts,
            "tool": tools,
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def transcripts_from_documents(sf_dir: str):
    import ray.data as rd

    ds = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(wrap_documents_batch, batch_format="pyarrow", batch_size=2048)


# Richer deterministic views used by the SQL-checked queries() entries.

SCHEMA_NS = "http://schema.org/"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XSD_INT = XSD_NS + "integer"


def _mk_turn_rows(conv_ids, texts):
    n = len(conv_ids)
    return pa.Table.from_pydict(
        {
            "conv_id": conv_ids,
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": ["user"] * n,
            "text": texts,
            "tool": [""] * n,
            "ts": pa.array([EPOCH_US + i for i in range(n)], pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def wrap_documents_typed(batch: pa.Table, with_alias=False, with_broken=False) -> pa.Table:
    """4 triples per doc: rdf:type + inLanguage + source + characterCount.
    with_alias: +1 schema:about alias mention for doc_id%5==0.
    with_broken: +1 UnresolvedCURIE warning for doc_id%7==0."""
    from .aliases import entity_surface

    conv_ids, texts = [], []
    for doc_id, lang, source, n_chars in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("lang").to_pylist(),
        batch.column("source").to_pylist(),
        batch.column("n_chars").to_pylist(),
    ):
        parts = [
            '<div about="%s%d" typeof="%sDocument">' % (DOC_NS, doc_id, SCHEMA_NS),
            '<span property="%sinLanguage">%s</span>' % (SCHEMA_NS, lang),
            '<span property="%ssource">%s</span>' % (SCHEMA_NS, source),
            '<span property="%scharacterCount" datatype="%s">%d</span>'
            % (SCHEMA_NS, XSD_INT, n_chars),
        ]
        if with_alias and doc_id % 5 == 0:
            parts.append(
                '<span property="%sabout">%s</span>'
                % (SCHEMA_NS, entity_surface(doc_id % 50))
            )
        if with_broken and doc_id % 7 == 0:
            parts.append('<span about="[undef:x]" property="%sbroken">x</span>' % SCHEMA_NS)
        parts.append("</div>")
        conv_ids.append("doc%08d" % doc_id)
        texts.append("".join(parts))
    return _mk_turn_rows(conv_ids, texts)


def wrap_documents_meta(batch: pa.Table) -> pa.Table:
    """Term-metadata view: 5 triples per doc — rdf:type (IRI object) +
    a language-TAGGED name literal ("doc {id}"@{lang} via @lang) + the
    xsd:int-typed characterCount + an xsd:date dateCreated (2020-01-01
    plus doc_id%1461 days, spanning 4 years) + an xsd:dateTime
    dateModified (same date, hh/mm/ss from doc_id, 'Z' zone).  The
    view behind the LANG()/DATATYPE()/term-test/datetime-accessor
    SPARQL queries (the typed view's literals are plain, so it cannot
    exercise them)."""
    import datetime as _dt

    epoch = _dt.date(2020, 1, 1)
    conv_ids, texts = [], []
    for doc_id, lang, n_chars in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("lang").to_pylist(),
        batch.column("n_chars").to_pylist(),
    ):
        conv_ids.append("doc%08d" % doc_id)
        d = epoch + _dt.timedelta(days=doc_id % 1461)
        date = d.isoformat()
        dtime = "%sT%02d:%02d:%02dZ" % (
            date, doc_id % 24, (doc_id * 7) % 60, (doc_id * 13) % 60
        )
        texts.append(
            '<div about="%s%d" typeof="%sDocument">'
            '<span property="%sname" lang="%s">doc %d</span>'
            '<span property="%scharacterCount" datatype="%s">%d</span>'
            '<span property="%sdateCreated" datatype="%sdate">%s</span>'
            '<span property="%sdateModified" datatype="%sdateTime">%s</span>'
            "</div>"
            % (
                DOC_NS, doc_id, SCHEMA_NS,
                SCHEMA_NS, lang, doc_id,
                SCHEMA_NS, XSD_INT, n_chars,
                SCHEMA_NS, XSD_NS, date,
                SCHEMA_NS, XSD_NS, dtime,
            )
        )
    return _mk_turn_rows(conv_ids, texts)


def meta_transcripts_from_documents(sf_dir: str):
    import ray.data as rd  # noqa: F401  (read_parquet_clean returns a Dataset)

    ds = read_parquet_clean(
        "%s/documents.parquet" % sf_dir,
        columns=["doc_id", "lang", "n_chars"],
    )
    return ds.map_batches(
        wrap_documents_meta, batch_format="pyarrow", batch_size=2048
    )


def wrap_documents_turtle(batch: pa.Table) -> pa.Table:
    """Embedded-Turtle view: one <script type="text/turtle"> per doc
    yielding (<doc>, ex:charCount, n_chars^^xsd:integer)."""
    conv_ids, texts = [], []
    for doc_id, n_chars in zip(
        batch.column("doc_id").to_pylist(), batch.column("n_chars").to_pylist()
    ):
        conv_ids.append("doc%08d" % doc_id)
        texts.append(
            '<script type="text/turtle">\n'
            "@prefix ex: <http://example.org/terms#> .\n"
            "<%s%d> ex:charCount %d .\n</script>" % (DOC_NS, doc_id, n_chars)
        )
    return _mk_turn_rows(conv_ids, texts)


def wrap_documents_svg(batch: pa.Table) -> pa.Table:
    """SVG + embedded RDF/XML view: (<doc>, dc:source, source)."""
    conv_ids, texts = [], []
    for doc_id, source in zip(
        batch.column("doc_id").to_pylist(), batch.column("source").to_pylist()
    ):
        conv_ids.append("doc%08d" % doc_id)
        texts.append(
            '<svg xmlns="http://www.w3.org/2000/svg"><metadata>'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            '<rdf:Description rdf:about="%s%d" xmlns:dc="http://purl.org/dc/terms/">'
            "<dc:source>%s</dc:source></rdf:Description></rdf:RDF></metadata></svg>"
            % (DOC_NS, doc_id, source)
        )
    return _mk_turn_rows(conv_ids, texts)


def wrap_documents_rdfa10(batch: pa.Table) -> pa.Table:
    """RDFa 1.0 view (@version gate + xmlns CURIEs): (<doc>#r, dc11:source, source)."""
    conv_ids, texts = [], []
    for doc_id, source in zip(
        batch.column("doc_id").to_pylist(), batch.column("source").to_pylist()
    ):
        conv_ids.append("doc%08d" % doc_id)
        texts.append(
            '<html version="RDFa 1.0" xmlns:dc="http://purl.org/dc/elements/1.1/">'
            "<head><title>t</title></head>"
            '<body><div about="%s%d"><span property="dc:source">%s</span></div>'
            "</body></html>" % (DOC_NS, doc_id, source)
        )
    return _mk_turn_rows(conv_ids, texts)


def wrap_documents_vocab(batch: pa.Table) -> pa.Table:
    """@vocab view for vocab-expansion: (<doc>, v:name, source) with
    vocab http://vocab.local/ -> rdfa:usesVocabulary triple."""
    conv_ids, texts = [], []
    for doc_id, source in zip(
        batch.column("doc_id").to_pylist(), batch.column("source").to_pylist()
    ):
        conv_ids.append("doc%08d" % doc_id)
        texts.append(
            '<div vocab="http://vocab.local/" about="%s%d">'
            '<span property="name">%s</span></div>' % (DOC_NS, doc_id, source)
        )
    return _mk_turn_rows(conv_ids, texts)


def wrap_documents_microdata(batch: pa.Table) -> pa.Table:
    """StructuredDataParser-chain view: a microdata item (typed,
    itemid'd, url/meta/text props) PLUS one RDFa triple in the same
    document — exercises the RDFa+microdata union
    (reference rdflibparsers.py:213-269)."""
    conv_ids, texts = [], []
    for doc_id, lang, source in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("lang").to_pylist(),
        batch.column("source").to_pylist(),
    ):
        conv_ids.append("doc%08d" % doc_id)
        texts.append(
            '<div itemscope="" itemtype="http://schema.org/Dataset"'
            ' itemid="%(ns)s%(id)d">'
            '<span itemprop="name">%(src)s</span>'
            '<meta itemprop="inLanguage" content="%(lang)s">'
            '<a itemprop="sameAs" href="%(ns)s%(id)d-alt">alt</a>'
            '<span about="%(ns)s%(id)d"'
            ' property="http://purl.org/dc/terms/identifier">%(id)d</span>'
            "</div>"
            % {"ns": DOC_NS, "id": doc_id, "src": source, "lang": lang}
        )
    return _mk_turn_rows(conv_ids, texts)


# per-wrapper column needs: read ONLY what the view uses (a read that
# loads all 5 document columns for a 2-column wrapper is wrong at scale)
_WRAPPER_COLUMNS = {
    "wrap_documents_microdata": ["doc_id", "lang", "source"],
    "wrap_documents_turtle": ["doc_id", "n_chars"],
    "wrap_documents_svg": ["doc_id", "source"],
    "wrap_documents_rdfa10": ["doc_id", "source"],
    "wrap_documents_vocab": ["doc_id", "source"],
}


def view_from_documents(sf_dir: str, wrapper, columns=None):
    import ray.data as rd

    if columns is None:
        columns = _WRAPPER_COLUMNS.get(
            getattr(wrapper, "__name__", ""),
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
    ds = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=columns)
    return ds.map_batches(wrapper, batch_format="pyarrow", batch_size=2048)


def typed_transcripts_from_documents(sf_dir: str, with_alias=False, with_broken=False):
    import ray.data as rd

    ds = read_parquet_clean(
        "%s/documents.parquet" % sf_dir,
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return ds.map_batches(
        lambda b: wrap_documents_typed(b, with_alias, with_broken),
        batch_format="pyarrow",
        batch_size=2048,
    )
