"""The queries() / oracle_sql() registry consumed by __ray_entry__.py.

Every implemented operator family from SURVEY.md §2 has an entry; the
SQL oracle is provided wherever the semantics are exactly expressible
in DuckDB over the same parquet views (integer / hash-exact results;
float aggregates are rounded identically on both sides).  Ops whose
results are not SQL-expressible (minhash LSH, simhash, ANN, language
ID, flagship over markup) have no oracle and get the driver's
rows-only check — noted per entry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.aliases import build_alias_table, entity_iri, entity_surface
from ..sources.transcripts import (
    DOC_NS,
    SCHEMA_TEXT,
    transcripts_from_documents,
    typed_transcripts_from_documents,
    transcripts_dataset,
)
from ..stages.distill import split_diags, split_triples
from ..stages.link import link_batch, link_batch_augmenting
from ..stages.canonicalize import canonicalize
from .flagship import build_triples
from ..sources.io import read_parquet as read_parquet_clean

_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


# ---------------------------------------------------------------------------
# RDFa distillation queries (documents wrapped into markup views)


def q_rdfa_text_triples(sf_dir: str):
    """One (subj, pred, obj_value) triple per document."""
    turns = transcripts_from_documents(sf_dir)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value"])


def q_rdfa_typed_triples(sf_dir: str):
    turns = typed_transcripts_from_documents(sf_dir)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value"])


def q_rdfa_triple_counts(sf_dir: str):
    from ray.data.aggregate import Count

    turns = typed_transcripts_from_documents(sf_dir)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    return triples.groupby("conv_id").aggregate(Count(alias_name="n_triples"))


def q_rdfa_diagnostics(sf_dir: str):
    turns = typed_transcripts_from_documents(sf_dir, with_broken=True)
    diags = build_triples(turns).map_batches(split_diags, batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"conv_id": batch.column("conv_id"), "dclass": batch.column("pred")}
        )

    return diags.map_batches(project, batch_format="pyarrow")


def q_rdfa_entity_links(sf_dir: str):
    import ray

    turns = typed_transcripts_from_documents(sf_dir, with_alias=True)
    triples = build_triples(turns)
    alias_ref = ray.put(build_alias_table())
    # elastic tasks, not a capped actor pool: the (2,4) pool starved
    # this stage at 32 CPUs (round-2 verdict #1)
    links = triples.map_batches(
        link_batch,
        fn_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return links.select_columns(["conv_id", "entity", "surface"])


def q_rdfa_canonical_subjects(sf_dir: str):
    import ray

    turns = typed_transcripts_from_documents(sf_dir, with_alias=True)
    triples = build_triples(turns)
    alias_ref = ray.put(build_alias_table())
    augmented = triples.map_batches(
        link_batch_augmenting,
        fn_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    canon = canonicalize(augmented)

    def project(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("pred"), "http://schema.org/source")
        )
        return pa.Table.from_pydict(
            {"subj": batch.column("subj"), "obj_value": batch.column("obj_value")}
        )

    return canon.map_batches(project, batch_format="pyarrow")


def q_rdfa_flagship_synthetic(sf_dir: str):
    """Full flagship chain over the synthetic transcript corpus (markup
    mix incl. XHTML/SVG/turtle/malformed). NOT SQL-expressible ->
    rows-only check."""
    import ray

    n = 2000
    turns = transcripts_dataset(n, override_num_blocks=8)
    triples = build_triples(turns)
    alias_ref = ray.put(build_alias_table())
    augmented = triples.map_batches(
        link_batch_augmenting,
        fn_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return canonicalize(augmented)


def q_rdfa_embedded_turtle(sf_dir: str):
    """Embedded <script type="text/turtle"> extraction (K11/S3)."""
    from ..sources.transcripts import view_from_documents, wrap_documents_turtle

    turns = view_from_documents(sf_dir, wrap_documents_turtle)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value", "obj_datatype"])


def q_rdfa_embedded_svg(sf_dir: str):
    """SVG host + embedded RDF/XML subtree (S4/K11)."""
    from ..sources.transcripts import view_from_documents, wrap_documents_svg

    turns = view_from_documents(sf_dir, wrap_documents_svg)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value"])


def q_rdfa_10_literals(sf_dir: str):
    """RDFa 1.0 path: @version gate, xmlns CURIEs, literal objects (K2/K9)."""
    from ..sources.transcripts import view_from_documents, wrap_documents_rdfa10

    turns = view_from_documents(sf_dir, wrap_documents_rdfa10)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value"])


def _vocab_expansion_pipeline(sf_dir: str, vocab_graph: set):
    """The shared expansion tail of the two vocab queries — they must
    stay semantically identical (both oracles assert the same output),
    differing ONLY in how ``vocab_graph`` is obtained."""
    from ..sources.transcripts import view_from_documents, wrap_documents_vocab

    turns = view_from_documents(sf_dir, wrap_documents_vocab)
    triples = build_triples(
        turns,
        options_kwargs={
            "vocab_expansion": True,
            "vocab_graphs": {"http://vocab.local/": vocab_graph},
        },
    ).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value"])


def q_rdfa_vocab_expansion(sf_dir: str):
    """@vocab + config vocabulary graph + mini-OWL entailment (A3/A4)."""
    from ..rdf.terms import iri

    vocab_graph = {
        (
            iri("http://vocab.local/name"),
            iri("http://www.w3.org/2000/01/rdf-schema#subPropertyOf"),
            iri("http://vocab.local/label"),
        )
    }
    return _vocab_expansion_pipeline(sf_dir, vocab_graph)


def q_rdfa_vocab_deref(sf_dir: str):
    """S7 end to end WITHOUT network: the vocabulary graph is
    DEREFERENCED from a ``file://`` URI through the transport-
    injectable opener + persisted Expires cache
    (``sources/uriopen.py`` — the reference's ``return_graph`` /
    ``rdfs/cache.py`` analogue), parsed as Turtle by media type, and
    fed into the same vocab-expansion pipeline; the result must match
    ``rdfa_vocab_expansion``'s config-injected graph exactly."""
    import hashlib as _hl
    import os as _os
    import uuid as _uuid

    from ..sources.uriopen import VocabCache, load_vocab_graphs

    scratch = "/tmp/graft_vocab_%s" % _hl.md5(sf_dir.encode()).hexdigest()[:8]
    _os.makedirs(scratch, exist_ok=True)
    ttl = _os.path.join(scratch, "vocab.ttl")
    # uuid-suffixed tmp: two concurrent drivers both write-then-rename
    # without racing on a shared tmp name (same pattern as the hash
    # store's build dirs)
    tmp = "%s.%s.tmp" % (ttl, _uuid.uuid4().hex[:8])
    with open(tmp, "w") as f:
        f.write(
            "<http://vocab.local/name> "
            "<http://www.w3.org/2000/01/rdf-schema#subPropertyOf> "
            "<http://vocab.local/label> .\n"
        )
    _os.replace(tmp, ttl)

    cache = VocabCache(_os.path.join(scratch, "cache"))
    graphs = load_vocab_graphs(["file://" + ttl], cache=cache)
    return _vocab_expansion_pipeline(sf_dir, graphs["file://" + ttl])


def _roundtrip_query(sf_dir: str, fmt: str):
    """Serialize each turn's graph (Turtle or JSON-LD), parse it BACK
    with the engine's own reader, and return the recovered triples —
    the serializer is thereby SQL-oracle-checked end to end (S5)."""
    from ..stages.serialize import serialize_graphs

    turns = typed_transcripts_from_documents(sf_dir)
    triples = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    docs = serialize_graphs(triples, fmt, contiguous=True)  # distill output: turn-contiguous blocks

    def parse_back(batch: pa.Table) -> pa.Table:
        from ..kernel.embedded import parse_turtle
        from ..kernel.state import BnodeGen
        from ..rdf.jsonld import jsonld_to_graph

        from ..rdf.rdfxml import rdfxml_to_graph

        from ..rdf.ntriples import parse_ntriples

        subs, preds, objs = [], [], []
        for text in batch.column("text").to_pylist():
            if fmt == "turtle":
                graph = parse_turtle(text, "", BnodeGen())
            elif fmt == "pretty-xml":
                graph = rdfxml_to_graph(text, BnodeGen())
            elif fmt == "nt":
                graph = parse_ntriples(text)
            else:
                graph = jsonld_to_graph(text, BnodeGen())
            for (s, p, o) in graph:
                subs.append(s[1])
                preds.append(p[1])
                objs.append(o[1])
        return pa.Table.from_pydict(
            {"subj": pa.array(subs), "pred": pa.array(preds),
             "obj_value": pa.array(objs)}
        )

    return docs.map_batches(parse_back, batch_format="pyarrow")


def q_rdfa_turtle_roundtrip(sf_dir: str):
    return _roundtrip_query(sf_dir, "turtle")


def q_rdfa_jsonld_roundtrip(sf_dir: str):
    return _roundtrip_query(sf_dir, "jsonld")


def q_rdfa_rdfxml_roundtrip(sf_dir: str):
    return _roundtrip_query(sf_dir, "pretty-xml")


def q_rdfa_ntriples_roundtrip(sf_dir: str):
    """N-Triples writer -> distributed N-Triples source: each graph is
    serialized to N-Triples text and re-read through the same parser
    the ``sources/ntfiles.py`` reader uses per line block."""
    return _roundtrip_query(sf_dir, "nt")


def q_rdfa_distinct_triples(sf_dir: str):
    """Multi-source union + global exact triple dedup (S6/A1): the same
    source distilled twice, unioned, then distinct across the whole
    dataset via a hash-partitioned groupby."""
    turns = typed_transcripts_from_documents(sf_dir)
    t1 = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")
    t2 = build_triples(typed_transcripts_from_documents(sf_dir)).map_batches(
        split_triples, batch_format="pyarrow"
    )
    both = t1.union(t2).select_columns(["subj", "pred", "obj_value"])
    from ..stages.distinct import distinct

    return distinct(both, ["subj", "pred", "obj_value"])


def q_rdfa_hturtle(sf_dir: str):
    """HTurtleParser variant: turtle-only extraction, RDFa attributes
    ignored (reference rdflibparsers.py:273-351)."""
    from ..sources.transcripts import view_from_documents, wrap_documents_turtle
    from ..stages.distill import distill_batch_task
    from .flagship import _filter_nonempty

    turns = view_from_documents(sf_dir, wrap_documents_turtle)
    triples = turns.map_batches(_filter_nonempty, batch_format="pyarrow").map_batches(
        distill_batch_task,
        fn_kwargs={"mode": "hturtle"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    ).map_batches(split_triples, batch_format="pyarrow")
    return triples.select_columns(["subj", "pred", "obj_value", "obj_datatype"])


def q_rdfa_structured(sf_dir: str):
    """StructuredDataParser chain: RDFa + microdata + embedded turtle
    in one pass (reference rdflibparsers.py:213-269)."""
    from ..sources.transcripts import view_from_documents, wrap_documents_microdata
    from ..stages.distill import distill_batch_task
    from .flagship import _filter_nonempty

    turns = view_from_documents(sf_dir, wrap_documents_microdata)
    triples = (
        turns.map_batches(_filter_nonempty, batch_format="pyarrow")
        .map_batches(
            distill_batch_task,
            fn_kwargs={"mode": "structured"},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
        )
        .map_batches(split_triples, batch_format="pyarrow")
    )
    return triples.select_columns(["subj", "pred", "obj_value"])


def q_rdfa_processor_graph(sf_dir: str):
    """Processor-graph rdf:type class counts (A5: diagnostics rendered
    as RDF; wall-clock dc:date omitted by design)."""
    from ..kernel.options import _SEVERITY_CLASS

    turns = typed_transcripts_from_documents(sf_dir, with_broken=True)
    diags = build_triples(turns).map_batches(split_diags, batch_format="pyarrow")

    def classes(batch: pa.Table) -> pa.Table:
        out = []
        for sev, dclass in zip(
            batch.column("subj").to_pylist(), batch.column("pred").to_pylist()
        ):
            out.append(_SEVERITY_CLASS[sev])
            if dclass:
                out.append(dclass)
        return pa.Table.from_pydict({"dclass": pa.array(out, pa.string())})

    from ..stages.aggregate import salted_count

    return salted_count(diags.map_batches(classes, batch_format="pyarrow"), "dclass")


def q_rdfa_diagnostics_rollup(sf_dir: str):
    """groupby(diagnostic class).count() with map-side combine (A5)."""
    from ..stages.aggregate import diagnostics_rollup

    turns = typed_transcripts_from_documents(sf_dir, with_broken=True)
    diags = build_triples(turns).map_batches(split_diags, batch_format="pyarrow")
    rolled = diagnostics_rollup(diags)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"dclass": batch.column("pred"), "n": batch.column("n")}
        )

    return rolled.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Relational operators


def q_html_extract_docs(sf_dir: str):
    """HTML visible-text extraction (the web-pipeline 'extract' stage)
    with an INVERSION oracle: documents wrapped into RDFa markup by the
    transcripts view, extracted back — clean_text must equal the
    whitespace-normalized original, checkable in pure SQL."""
    from ..sources.transcripts import view_from_documents, wrap_documents_batch
    from ..stages.extract import extract_text

    turns = view_from_documents(sf_dir, wrap_documents_batch)
    out = extract_text(turns, keep=("conv_id",))
    return out.map_batches(
        lambda b: b.select(["conv_id", "clean_text"]), batch_format="pyarrow"
    )


def q_html_extract_signals(sf_dir: str):
    """Boilerplate signals over the synthetic mixed-markup transcript
    corpus (links, nesting, malformed fragments): per turn, tag count,
    anchor count, link density and text-to-markup ratio in basis
    points.  The signal VALUES come from a DOM parse (not
    SQL-expressible, and crc32 — the corpus's family selector — has no
    DuckDB twin), so the oracle checks the structural invariants
    instead: exactly one signal row per input turn (malformed markup
    must yield a row, never a crash), anchors never exceed tags, and
    both basis-point ratios stay in [0, 10000].  Per-turn signal rows
    stay available via ``stages.extract.extract_text``; signal math is
    pinned by the unit fixtures."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..sources.transcripts import transcripts_dataset
    from ..stages.extract import extract_text

    turns = transcripts_dataset(2000, override_num_blocks=8)
    sig = extract_text(turns, keep=("conv_id", "turn_idx"))

    def partial(batch: pa.Table) -> pa.Table:
        tags = batch.column("n_tags").to_numpy(zero_copy_only=False)
        links = batch.column("n_links").to_numpy(zero_copy_only=False)
        dens = batch.column("link_density_bps").to_numpy(zero_copy_only=False)
        ratio = batch.column("text_ratio_bps").to_numpy(zero_copy_only=False)
        ok_range = bool(
            (tags >= 0).all() and (links >= 0).all()
            and (dens >= 0).all() and (dens <= 10000).all()
            and (ratio >= 0).all() and (ratio <= 10000).all()
        )
        ok_links = bool((links <= tags).all())
        return pa.Table.from_pydict(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([batch.num_rows], pa.int64()),
                "rng": pa.array([int(ok_range)], pa.int64()),
                "lle": pa.array([int(ok_links)], pa.int64()),
            }
        )

    agg = (
        sig.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("rng", alias_name="rng"),
            Min("lle", alias_name="lle"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_turns": np.array([int(agg["n"].iloc[0]) if len(agg) else 0],
                                dtype=np.int64),
            "signals_in_range": [bool(len(agg) and agg["rng"].iloc[0] == 1)],
            "links_le_tags": [bool(len(agg) and agg["lle"].iloc[0] == 1)],
        }
    )
    return rd.from_pandas(out)


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (no SQL oracle — iterative
    merge selection; correctness is pinned by the sequential-reference
    parity tests in test_round3_ops.py).  The corpus-scale work is the
    pruned word-histogram shuffle; the merge loop is vectorized Arrow
    over the bounded vocabulary (stages/bpe.py docstring)."""
    import ray.data as rd

    from ..stages.bpe import train_bpe

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    return rd.from_arrow(train_bpe(docs, n_merges=32))


def q_bpe_token_counts(sf_dir: str):
    """Train BPE on the corpus, then the distributed encode pass:
    per-document token counts under the learned merges (factorized per
    unique word per batch; merge table broadcast in the closure)."""
    from ..stages.bpe import encode_token_counts, train_bpe

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    merges = train_bpe(docs, n_merges=32)
    return encode_token_counts(docs, merges)


def q_lineitem_agg(sf_dir: str):
    from .relational import lineitem_agg

    return lineitem_agg(sf_dir)


def q_lineitem_below_avg(sf_dir: str):
    """TPC-H Q17 shape — a grouped aggregate compared back against the
    fact rows it was computed from (SQL's correlated subquery): per
    part, how many lineitem rows fall below 20% of that part's average
    quantity.

    ONE all-to-all: bucket the thin (partkey, quantity) projection by
    ``crc32(partkey) % B`` so every part's rows co-locate, then the
    per-bucket kernel computes the per-part mean and the below-count
    in two vectorized pandas passes — no join, no second read, no
    second shuffle (the aggregate-then-join-back formulation measured
    3x slower: three exchanges and a double scan).

    Exactness: l_quantity is integer-valued, so per-part float64 sums
    are exact and 0.2 * (sum / count) is bit-identical to DuckDB's
    0.2 * AVG — the comparison cannot drift, and the output counts
    are integers (hash-stable vs the oracle)."""
    import pandas as pd

    from ..functions.hashing import crc32_bucket

    li = read_parquet_clean(
        "%s/lineitem.parquet" % sf_dir, columns=["l_partkey", "l_quantity"]
    )
    n_buckets = 32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket",
            crc32_bucket(
                pc.cast(batch.column("l_partkey"), pa.string()), n_buckets
            ),
        )

    empty = pd.DataFrame(
        {
            "l_partkey": pd.Series([], dtype="int64"),
            "n_below": pd.Series([], dtype="int64"),
        }
    )

    def bucket_counts(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return empty
        q = group["l_quantity"]
        g = q.groupby(group["l_partkey"], sort=False)
        # mean = exact float64 sum / count for integer-valued doubles
        lim = 0.2 * g.transform("sum") / g.transform("size")
        below = group.loc[q < lim, "l_partkey"]
        out = below.value_counts().rename_axis("l_partkey").reset_index(name="n_below")
        return out.astype({"l_partkey": "int64", "n_below": "int64"})

    return (
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_counts, batch_format="pandas")
    )


def q_orders_by_segment(sf_dir: str):
    from .relational import orders_by_segment

    return orders_by_segment(sf_dir)


def q_join_bucketed(sf_dir: str):
    """Partitioned hash join with BOTH sides as datasets (the
    both-sides-large pattern) — same logical result as the broadcast
    join, different physical plan."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.join import bucketed_hash_join

    orders = read_parquet_clean(
        "%s/orders.parquet" % sf_dir, columns=["o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "total_cents",
            pc.cast(
                pc.round(
                    pc.multiply(batch.column("o_totalprice"), 100.0),
                    0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ),
        )

    orders = orders.map_batches(to_cents, batch_format="pyarrow").select_columns(
        ["o_custkey", "total_cents"]
    )
    cust = read_parquet_clean(
        "%s/customer.parquet" % sf_dir, columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(orders, cust, on="o_custkey", n_buckets=32)
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="total_cents")
    )

    def cast_back(batch: pa.Table) -> pa.Table:
        # null-padding in the join made the cents column nullable-float
        idx = batch.schema.get_field_index("total_cents")
        return batch.set_column(
            idx, "total_cents", pc.cast(batch.column("total_cents"), pa.int64())
        )

    return agg.map_batches(cast_back, batch_format="pyarrow")


def q_top_orders(sf_dir: str):
    from .relational import top_orders

    return top_orders(sf_dir, 10)


def q_events_asof(sf_dir: str):
    """As-of attribution: each purchase joined to the user's most
    recent prior click (custom operator; DuckDB ASOF JOIN oracle)."""
    import ray.data as rd

    from ..stages.asof import asof_join

    events = read_parquet_clean(
        "%s/events.parquet" % sf_dir,
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def pick(kind):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(batch.column("event_type"), kind)
            ).select(["event_id", "ts", "user_id"])

        return fn

    purchases = events.map_batches(pick("purchase"), batch_format="pyarrow")
    clicks = events.map_batches(pick("click"), batch_format="pyarrow")
    joined = asof_join(purchases, clicks, on="ts", by="user_id")

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        out = _pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "user_id": batch["user_id"].astype("int64"),
                "click_event_id": batch["event_id_r"].fillna(-1).astype("int64"),
            }
        )
        return out

    return joined.map_batches(project, batch_format="pandas")


def q_sessionize_events(sf_dir: str):
    from .relational import sessionize_events

    return sessionize_events(sf_dir)


def q_cohort_retention(sf_dir: str):
    """Signup-week cohort retention matrix — ONE user-bucketed
    exchange, integer epoch-week arithmetic
    (pipelines/relational.cohort_retention)."""
    from .relational import cohort_retention

    return cohort_retention(sf_dir)


def q_events_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel: users reaching each step
    strictly after their earliest previous-step completion — ONE
    user-bucketed exchange, vectorized per-bucket min-chains
    (pipelines/relational.funnel_counts)."""
    from .relational import funnel_counts

    return funnel_counts(sf_dir)


def q_events_hourly(sf_dir: str):
    from .relational import events_hourly

    ds = events_hourly(sf_dir)

    def cast_back(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("value_milli")
        return batch.set_column(
            idx, "value_milli", pc.cast(batch.column("value_milli"), pa.int64())
        )

    return ds.map_batches(cast_back, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Training-data ops


def q_top_orders_per_segment(sf_dir: str):
    """Per-group top-k window pattern (ROW_NUMBER() OVER equivalent)."""
    import pandas as pd

    from .relational import top_orders_per_segment

    ds = top_orders_per_segment(sf_dir, 3)

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["c_mktsegment", "o_orderkey"]].copy()
        out["total_cents"] = (
            (batch["o_totalprice"] * 100.0).round().astype("int64")
        )
        return out

    return ds.map_batches(to_cents, batch_format="pandas")


def q_events_distinct_users(sf_dir: str):
    """Exact distinct-count via two-level aggregation."""
    from .relational import events_distinct_users

    return events_distinct_users(sf_dir)


def q_customers_semi(sf_dir: str):
    """Semi join (EXISTS): customers with >= 1 urgent order."""
    from .relational import customers_semi_anti

    return customers_semi_anti(sf_dir, "semi", priority="1-URGENT")


def q_customers_semi_bloom(sf_dir: str):
    """The customers_semi plan with a Bloom pre-filter on the probe
    side: identical result (false positives are removed by the exact
    join), but only probe keys that pass the broadcast bitset reach
    the exchange."""
    import ray.data as rd

    from ..stages.bloom import bloom_semi_join

    cust = read_parquet_clean(
        "%s/customer.parquet" % sf_dir, columns=["c_custkey", "c_mktsegment"]
    )
    orders = read_parquet_clean(
        "%s/orders.parquet" % sf_dir, columns=["o_custkey", "o_orderpriority"]
    )

    def keys_only(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        )
        return batch.select(["o_custkey"]).rename_columns(["c_custkey"])

    probe = orders.map_batches(keys_only, batch_format="pyarrow")
    return bloom_semi_join(
        cust,
        probe,
        on="c_custkey",
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64())]),
    )


def q_customers_anti(sf_dir: str):
    """Anti join (NOT EXISTS): customers with no order above 300k."""
    from .relational import customers_semi_anti

    return customers_semi_anti(sf_dir, "anti", price_floor=300000.0)


def q_events_sliding(sf_dir: str):
    """Sliding-window aggregate: 1 h windows hopping every 15 min."""
    from .relational import events_sliding

    return events_sliding(sf_dir)


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: 3-table join + aggregate + top-k."""
    from .relational import shipping_priority

    return shipping_priority(sf_dir)


def q_events_purchase_clicks(sf_dir: str):
    """Windowed range join: clicks in the hour before each purchase."""
    import ray.data as rd

    from ..stages.rangejoin import range_join_count

    purchases = read_parquet_clean(
        "%s/events.parquet" % sf_dir, columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'purchase'")
    clicks = read_parquet_clean(
        "%s/events.parquet" % sf_dir, columns=["user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'click'")
    return range_join_count(
        purchases,
        clicks,
        by="user_id",
        lo_us=-3_600_000_000,
        hi_us=0,
        keep=["event_id", "user_id"],
        count_col="n_clicks",
    )


def q_events_props_census(sf_dir: str):
    """JSON payload-field extraction (stages/jsonx.py) + census."""
    from .relational import events_props_census

    return events_props_census(sf_dir)


def q_events_quantiles_cont(sf_dir: str):
    """Exact INTERPOLATED per-group quantiles (percentile_cont
    semantics) in integer micro-units — rational interpolation, no
    float drift (stages/quantile.grouped_quantiles_cont)."""
    from ..stages.quantile import grouped_quantiles_cont

    ds = read_parquet_clean("%s/events.parquet" % sf_dir, columns=["event_type", "value"])

    def to_milli(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "event_type": batch.column("event_type"),
                "value_milli": pc.cast(
                    pc.round(
                        pc.multiply(batch.column("value"), 1000.0),
                        0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return grouped_quantiles_cont(
        ds.map_batches(to_milli, batch_format="pyarrow"),
        group="event_type",
        value="value_milli",
        qs_pct=[50, 90, 99],
    )


_Z_DOMAINS = {"l_partkey": (0, 1 << 18), "l_suppkey": (0, 1 << 14)}


def q_lineitem_zorder_keys(sf_dir: str):
    """Z-order layout keys (stages/layout.zorder_key): Morton
    interleave of (l_partkey, l_suppkey) quantized over fixed domains;
    top-100 rows by (zkey, l_orderkey, l_linenumber) — the write-side
    clustering key a ZORDER BY materialization would sort on, checked
    bit-for-bit against a SQL twin of the magic-number spreads."""
    from ..stages.layout import zorder_key
    from ..stages.sparql import order_limit

    li = read_parquet_clean(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    keyed = li.map_batches(
        lambda b: zorder_key(
            b, ["l_partkey", "l_suppkey"], _Z_DOMAINS, bits=16
        ).drop_columns(["l_partkey", "l_suppkey"]),
        batch_format="pyarrow",
    )
    return order_limit(
        keyed, ["zkey", "l_orderkey", "l_linenumber"], descending=False, limit=100
    )


def q_events_winsorized(sf_dir: str):
    """Per-group winsorized census (outlier clipping at exact p5/p95)."""
    from .relational import events_winsorized

    return events_winsorized(sf_dir)


def q_events_hourly_dense(sf_dir: str):
    """Gap-filled hourly calendar per event type (resample with
    zero-fill)."""
    from .relational import events_hourly_dense

    return events_hourly_dense(sf_dir)


def q_docs_profile(sf_dir: str):
    """One-pass profiler (stages/profile.py) over documents — the
    oracled projection keeps the EXACT fields (count/nulls/min/max);
    the approx sketch fields (HLL ndv, MG top value) are covered by
    pytest instead (no SQL twin can hash-match an estimate)."""
    from ..stages.profile import profile_table

    ds = read_parquet_clean("%s/documents.parquet" % sf_dir)
    prof = profile_table(
        ds, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    return prof[["column", "n", "nulls", "min_value", "max_value"]]


def q_events_value_quantiles(sf_dir: str):
    """Exact per-group quantiles via distinct-value histogram."""
    import ray.data as rd

    from ..stages.quantile import grouped_quantiles

    ds = read_parquet_clean("%s/events.parquet" % sf_dir, columns=["event_type", "value"])

    def to_milli(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "event_type": batch.column("event_type"),
                "value_milli": pc.cast(
                    pc.round(
                        pc.multiply(batch.column("value"), 1000.0),
                        0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return grouped_quantiles(
        ds.map_batches(to_milli, batch_format="pyarrow"),
        group="event_type",
        value="value_milli",
        qs=[0.5, 0.9, 0.99],
    )


def q_token_top20(sf_dir: str):
    """Corpus heavy hitters: top-20 tokens by frequency."""
    import ray.data as rd

    from ..stages.tokens import token_topk

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["text"])
    return token_topk(docs, k=20)


def q_inverted_index(sf_dir: str):
    """Inverted index: token -> (df, sorted posting list), df >= 5."""
    import ray.data as rd

    from ..stages.tokens import inverted_index

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    return inverted_index(docs, min_df=5)



def _distinct_sketch_checked(sf_dir: str, est_df, rel_bound: float):
    """Join a sketch's per-type estimate against the exact distinct
    twin and emit (event_type, n_users, within_bound) — n_users is the
    EXACT count (SQL-oracled) and within_bound asserts the sketch's
    published error bound inside the query, so a broken sketch turns
    the driver's hash compare red instead of hiding behind rows-only."""
    import math

    import ray.data as rd

    from .relational import events_distinct_users

    exact = events_distinct_users(sf_dir).to_pandas()
    merged = exact.merge(
        est_df[["event_type", "n_distinct_est"]], on="event_type", how="left"
    )
    err = (merged["n_distinct_est"] - merged["n_users"]).abs()
    slack = np.maximum(
        np.ceil(rel_bound * merged["n_users"].to_numpy()), 3
    )  # small-count floor: sketches are near-exact below saturation
    out = pd.DataFrame(
        {
            "event_type": merged["event_type"],
            "n_users": merged["n_users"].astype("int64"),
            "within_bound": (err.to_numpy() <= slack)
            & merged["n_distinct_est"].notna().to_numpy(),
        }
    )
    return rd.from_pandas(out)


def q_events_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-count per event type (fixed 4-KiB register
    partials, elementwise-max merge), self-checked against the exact
    distinct twin at 5x the published standard error (1.04/sqrt(2^p),
    ~1.6% at p=12) — fully SQL-oracled via the exact count +
    within_bound flag."""
    from ..stages.sketch import hll_distinct

    ds = read_parquet_clean(
        "%s/events.parquet" % sf_dir, columns=["event_type", "user_id"]
    )
    est = hll_distinct(ds, "event_type", "user_id", p=12).to_pandas()
    return _distinct_sketch_checked(sf_dir, est, 5 * 1.04 / (2 ** 6))


def q_events_distinct_users_approx(sf_dir: str):
    """KMV sketch distinct-count (approximate, mergeable partials),
    self-checked against the exact distinct twin at 5x the published
    standard error (~1/sqrt(k-2) at k=256) — fully SQL-oracled via the
    exact count + within_bound flag."""
    from ..stages.sketch import kmv_distinct

    ds = read_parquet_clean(
        "%s/events.parquet" % sf_dir, columns=["event_type", "user_id"]
    )
    est = kmv_distinct(ds, "event_type", "user_id", k=256).to_pandas()
    return _distinct_sketch_checked(sf_dir, est, 5 / (254 ** 0.5))



def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup against a PERSISTED hash store
    (stages/dedupstore.py): the 'existing corpus' is the doc_id%10>=2
    slice (hash store built once per testdata generation, idempotent
    sentinel), the 'new drop' is doc_id%10<2 — planted overlap via the
    corpus's natural exact dups plus drop-internal dups.  Returns the
    drop's surviving (doc_id, h) rows; fully SQL-oracled (md5 twin).
    The commit path is pytest-covered (mutating a cached store here
    would break idempotency across runs)."""
    import glob as _glob
    import hashlib as _hl
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from ..stages.dedupstore import (
        hash_store_is_complete,
        incremental_exact_dedup,
        persist_hash_store,
    )

    st = _os.stat("%s/documents.parquet" % sf_dir)
    # key = stable sf_dir hash + volatile (mtime,size) hash, so stores
    # superseded by a testdata regeneration are identifiable and cleaned
    sf_key = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    vol_key = _hl.md5(
        ("%d|%d" % (st.st_mtime_ns, st.st_size)).encode()
    ).hexdigest()[:12]
    store_dir = "/tmp/graft_hashstore_%s_%s" % (sf_key, vol_key)
    # clean superseded stores and crashed-build leftovers, but only
    # after a grace period: a different-vol_key store younger than the
    # grace window may belong to a driver that is mid-read on the
    # previous testdata generation — deleting it under that reader
    # would fail its in-flight scan
    _GRACE_S = 1800
    import time as _time

    now = _time.time()
    for stale in _glob.glob("/tmp/graft_hashstore_%s_*" % sf_key):
        if stale == store_dir:
            continue
        try:
            age = now - _os.path.getmtime(stale)
        except OSError:
            continue
        # superseded stores AND crashed '-build-' leftovers both age
        # out.  Active users keep their dir's mtime fresh: readers
        # touch the store before each use (below), and builds here
        # take seconds (a build outlasting the window would need the
        # same mtime-touch discipline).  These are best-effort /tmp
        # cache hygiene semantics, not a lock.
        if age > _GRACE_S:
            _shutil.rmtree(stale, ignore_errors=True)
    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    def slice_mod(ds, lo: bool):
        def f(t: pa.Table) -> pa.Table:
            r = pc.subtract(
                t.column("doc_id"),
                pc.multiply(pc.divide(t.column("doc_id"), 10), 10),
            )
            mask = pc.less(r, 2) if lo else pc.greater_equal(r, 2)
            return t.filter(mask)

        return ds.map_batches(f, batch_format="pyarrow")

    corpus = slice_mod(docs, lo=False)
    if not hash_store_is_complete(store_dir):
        # build under a private dir + atomic rename into the keyed path:
        # two concurrent drivers on fresh testdata each build their own
        # candidate and exactly one rename wins — no rmtree race on an
        # in-flight sibling build (the loser discards its candidate)
        # an INCOMPLETE husk at store_dir (pre-upgrade crash, partial
        # rmtree) would make the rename below fail forever — an
        # incomplete store has no legitimate readers, so clear it
        if _os.path.isdir(store_dir):
            _shutil.rmtree(store_dir, ignore_errors=True)
        build_dir = "%s-build-%s" % (store_dir, _uuid.uuid4().hex[:8])
        persist_hash_store(corpus, build_dir)
        try:
            _os.rename(build_dir, store_dir)
        except OSError:  # a concurrent builder won the rename
            _shutil.rmtree(build_dir, ignore_errors=True)
            if not hash_store_is_complete(store_dir):
                raise
    else:
        # refresh mtime so the grace-window sweep above never reclaims
        # a store that is actively being read
        try:
            _os.utime(store_dir)
        except OSError:
            pass
    drop = slice_mod(docs, lo=True)
    return incremental_exact_dedup(drop, store_dir)


def q_dedup_exact(sf_dir: str):
    import ray.data as rd

    from ..stages.dedup import exact_dedup

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return exact_dedup(docs)


_PLANT_EVERY = 50
_PLANT_OFFSET = 10_000_000


def _plant_doc_copies(docs_ds):
    """Deterministically plant exact duplicates: every ``_PLANT_EVERY``-th
    doc_id gets a verbatim copy at ``doc_id + _PLANT_OFFSET`` (the
    ``q_embedding_dups`` pattern — the synthetic corpus has few-to-no
    natural exact dups below sf0.1, so without planting a coverage
    check would be vacuous).  SQL-reproducible via UNION ALL."""

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if batch.num_rows and pc.max(ids).as_py() >= _PLANT_OFFSET:
            raise ValueError(
                "_plant_doc_copies: doc_id >= %d collides with the "
                "planted-copy offset — raise _PLANT_OFFSET for this "
                "corpus" % _PLANT_OFFSET
            )
        sel = pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, _PLANT_EVERY),
                                         _PLANT_EVERY)),
            0,
        )
        copies = batch.filter(sel)
        copies = pa.Table.from_pydict(
            {
                "doc_id": pc.add(copies.column("doc_id"), _PLANT_OFFSET),
                "text": copies.column("text"),
            }
        )
        return pa.concat_tables(
            [batch.select(["doc_id", "text"]), copies]
        )

    return docs_ds.map_batches(plant, batch_format="pyarrow")


def _dup_pair_coverage(docs_ds, pairs_ds):
    """Convert a probabilistic near-dup pair stream into the
    SQL-checkable lower-bound form (VERDICT r4 #3): for EVERY member
    of an exact-duplicate group (md5 twin — SQL-knowable, incl. the
    planted copies), assert it appears in at least one emitted pair.
    Identical texts share every LSH band deterministically and verify
    at jaccard=1 / hamming=0, so any bucket that pairs the group's
    members with each other survives the similarity filter; a missed
    member flips found_in_pair and the driver's hash compare goes
    red.  Caveat (theoretical on this corpus, checked green at all
    three SFs): a bucket degenerate beyond ``BUCKET_CAP`` falls back
    to star pairs against the bucket's min id, which need not be a
    group member — on a pathological boilerplate corpus that could
    drop coverage (observable upstream via ``pair_mode='star'``).
    Near-dup (non-identical) recall stays pytest-pinned.

    Scale shape: hash rows and pair ids only — one md5 map pass, a
    hash-keyed group filter, a pair-id distinct, one bucketed left
    join; document text never shuffles here."""
    from ..stages.dedup import _text_md5_batch

    hashed = docs_ds.map_batches(_text_md5_batch, batch_format="pyarrow")

    def members_only(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64())}
            )
        return pa.Table.from_pydict(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64())}
        )

    members = hashed.groupby("h").map_groups(
        members_only, batch_format="pyarrow"
    )
    return _pair_membership_flags(members, pairs_ds)


def _pair_membership_flags(members_ds, pairs_ds):
    """(doc_id) members × (a, b) pairs -> (doc_id, found_in_pair):
    does each member appear in at least one pair?  Key-sized data
    only: pair-id distinct + one bucketed left join."""
    from ..stages.join import bucketed_hash_join

    def flat_ids(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [
                pc.cast(batch.column("a"), pa.int64()).combine_chunks(),
                pc.cast(batch.column("b"), pa.int64()).combine_chunks(),
            ]
        )
        return pa.Table.from_pydict({"doc_id": pc.unique(ids)})

    def first_only(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()).slice(0, 1),
                "m": pa.array([1], pa.int8()),
            }
        )

    pair_ids = (
        pairs_ds.map_batches(flat_ids, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(first_only, batch_format="pyarrow")
    )
    joined = bucketed_hash_join(
        members_ds, pair_ids, on="doc_id", how="left",
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("m", pa.int8())]),
    )

    def flag(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "found_in_pair": pc.is_valid(batch.column("m")),
            }
        )

    return joined.map_batches(flag, batch_format="pyarrow")


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup detection, converted from rows-only to the
    planted-lower-bound form (``_dup_pair_coverage``): every member of
    an exact-duplicate group must surface in a found pair.  The raw
    (a, b, jaccard) pair surface stays available via
    ``stages.dedup.minhash_dedup``."""
    from ..stages.dedup import minhash_dedup

    # a single parquet file reads as very few blocks; split it so the
    # signature stage actually fans out across the pool.  Kept LAZY:
    # the planting map is cheap and deterministic, so each consumer
    # re-reads the column-pruned source instead of pinning the planted
    # text column (the same no-corpus-pin rule the curation family
    # follows at 100 TB).
    docs = _plant_doc_copies(
        read_parquet_clean(
            "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"],
            override_num_blocks=32,
        )
    )
    pairs = minhash_dedup(docs, threshold=0.8)
    return _dup_pair_coverage(docs, pairs)


def q_dedup_ngram(sf_dir: str):
    import ray.data as rd

    from ..stages.dedup import ngram_jaccard_dedup

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"],
        override_num_blocks=32,
    )
    return ngram_jaccard_dedup(docs, threshold=0.8)


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup detection in the planted-lower-bound form
    (``_dup_pair_coverage``): identical texts hash to identical
    simhashes (hamming 0), so every exact-dup-group member must be in
    a found pair.  Raw (a, b, hamming) pairs stay available via
    ``stages.dedup.simhash_dedup``."""
    from ..stages.dedup import simhash_dedup

    # lazy by design — see q_dedup_minhash's no-corpus-pin note
    docs = _plant_doc_copies(
        read_parquet_clean(
            "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
        )
    )
    pairs = simhash_dedup(docs)
    return _dup_pair_coverage(docs, pairs)


def q_dedup_clusters(sf_dir: str):
    """Duplicate-group clustering: connected components over exact-dup
    star edges -> (doc_id, cluster_id = component min doc_id), every
    document labeled (singletons label themselves)."""
    import ray.data as rd

    from ..stages.cluster import exact_dup_clusters

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    return exact_dup_clusters(docs)


def q_text_metrics(sf_dir: str):
    import ray.data as rd

    from ..stages.text import analyze_text

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return analyze_text(docs).select_columns(
        ["doc_id", "n_chars", "n_tokens", "n_bpe_tokens", "n_alpha", "fingerprint"]
    )


def q_gopher_rules(sf_dir: str):
    """Gopher quality-rule gate (Rae et al. 2021 Appendix A) over the
    documents table: integer signals + failed-rule bitmask + keep flag,
    one zero-shuffle vectorized pass (stages/text.gopher_rules)."""
    from ..stages.text import gopher_rules

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    return gopher_rules(docs, min_words=20)


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide paragraph dedup over documents with deterministically
    planted boilerplate (a shared header on every doc, one of three
    shared footers by doc_id%3) around each doc's unique body — the
    first occurrence of each repeated paragraph survives, the rest
    drop, bodies stay (stages/dedup.paragraph_dedup)."""
    from ..stages.dedup import paragraph_dedup

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        footer = pa.array(
            ["footer variant %d" % (i % 3) for i in ids], pa.string()
        )
        planted = pc.binary_join_element_wise(
            pa.array(["subscribe to our newsletter"] * len(ids)),
            batch.column("text"),
            footer,
            "\n\n",
        )
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "text": planted}
        )

    return paragraph_dedup(docs.map_batches(plant, batch_format="pyarrow"))


def q_gopher_repetition(sf_dir: str):
    """The nine Gopher repetition rules (top-2/3/4-gram chars,
    dup-5..10-gram chars) over documents — one zero-shuffle vectorized
    pass, integer signals + failed-rule bitmask
    (stages/text.gopher_repetition)."""
    from ..stages.text import gopher_repetition

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    return gopher_repetition(docs)


def q_c4_rules(sf_dir: str):
    """C4 cleaning rules (Raffel et al. 2020 §2.2) over documents with
    deterministically planted line structure (the synthetic corpus has
    no newlines/punctuation, so the query plants the same multi-line
    text the SQL oracle constructs — the line edit + page gate is
    what's being checked): a good sentence line, a too-short line, a
    javascript line, an unterminated line, a 3-sentence trailer on
    doc_id%7, 'lorem ipsum' poison on %13, a curly brace on %11."""
    from ..stages.text import c4_rules

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        text = pc.cast(batch.column("text"), pa.string())

        def mod0(m):
            return pa.array(ids % m == 0, pa.bool_())

        lorem = pc.if_else(
            mod0(13),
            pa.scalar(" lorem ipsum", pa.string()),
            pa.scalar("", pa.string()),
        )
        brace = pc.if_else(
            mod0(11),
            pa.scalar(" {", pa.string()),
            pa.scalar("", pa.string()),
        )
        trailer = pc.if_else(
            mod0(7),
            pa.scalar(
                "this sentence counts. and this. and this too.", pa.string()
            ),
            pa.scalar("no punct here at all trailer", pa.string()),
        )
        planted = pc.binary_join_element_wise(
            text, ".\nshort line.\n",
            text, " extra javascript line.\n",
            text, lorem, brace, "\n", trailer,
            "",
        )
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "text": planted}
        )

    return c4_rules(docs.map_batches(plant, batch_format="pyarrow"))


def q_quality_counts(sf_dir: str):
    """Integer-exact quality counts (token / stopword) — the SQL-
    checkable core of the quality-scoring stage."""
    import ray.data as rd

    from ..stages.text import analyze_text

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return analyze_text(docs).select_columns(["doc_id", "n_tokens", "n_stopwords"])


def q_text_normalize(sf_dir: str):
    """Unicode + whitespace canonicalization (stages/text.normalize_text):
    the synthetic corpus is ASCII-clean, so the query plants the same
    decomposed-accent / NBSP / control-byte / ragged-whitespace suffix
    the SQL oracle plants — the normalization itself is what's being
    checked (same pattern as pii_scrub)."""
    from ..stages.text import normalize_text

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    # e + COMBINING ACUTE (NFC -> \xe9), NBSP, BEL control, tab runs
    suffix = " cafe\u0301 au\x07 lait\u00A0x \t\t end "

    def plant(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.binary_join_element_wise(
                    batch.column("text"), suffix, ""
                ),
            }
        )

    return normalize_text(docs.map_batches(plant, batch_format="pyarrow"))


def q_quality_signals(sf_dir: str):
    """Text-quality signals (stages/text.TextAnalyzer): stopword ratio
    in half-up basis points (integer — float division order would
    hash-drift) and the 40-trigram language guess, both reproduced by
    the DuckDB twin (regexp token splits + replace-count trigram
    scores + the first-max tie rule)."""
    from ..stages.text import analyze_text

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])

    def bp(batch: pd.DataFrame) -> pd.DataFrame:
        ns = batch["n_stopwords"].to_numpy(dtype=np.float64)
        nt = batch["n_tokens"].to_numpy(dtype=np.float64)
        out = np.zeros(len(batch), dtype=np.int64)
        nz = nt > 0
        out[nz] = np.floor(ns[nz] * 10000.0 / nt[nz] + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "stopword_bp": out,
                "lang_pred": batch["lang_pred"],
            }
        )

    return analyze_text(docs).map_batches(bp, batch_format="pandas")


def q_repetition_signals(sf_dir: str):
    """Duplicate-3-gram counts per document (the Gopher repetition
    rule's inputs) — one map-side shingle pass, no shuffle."""
    import ray.data as rd

    from ..stages.text import repetition_signals

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return repetition_signals(docs)


def q_dedup_substrings(sf_dir: str):
    """Approximate long-common-substring pairs via winnowed
    fingerprint co-occurrence, with a 40-word span PLANTED into every
    101st document (the synthetic corpus is span-collision-free, so
    without planting the op returns 0 rows and proves nothing; same
    rationale as embedding_dups).  Converted from rows-only to the
    planted coverage lower bound: any shared span of window+3 words
    guarantees a shared winnowed fingerprint, a 40-word span yields
    many (>= min_shared), and the star fallback keeps every planted
    doc connected — so each planted doc MUST appear in an emitted
    pair, which is SQL-knowable.  Raw (a, b, n_shared) pairs stay
    available via ``stages.dedup.substring_dup_pairs``; winnowing
    itself stays pytest-pinned."""
    import ray.data as rd

    from ..stages.dedup import substring_dup_pairs

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    span = " ".join("planted%d" % i for i in range(40))

    def plant(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        mark = (df["doc_id"] % 101 == 0) & (df["doc_id"] > 0)
        df.loc[mark, "text"] = df.loc[mark, "text"] + " " + span
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    planted = docs.map_batches(plant, batch_format="pyarrow")
    pairs = substring_dup_pairs(planted)

    def planted_members(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        mark = pc.and_(
            pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 101), 101)), 0),
            pc.greater(ids, 0),
        )
        return pa.Table.from_pydict(
            {"doc_id": pc.cast(batch.filter(mark).column("doc_id"), pa.int64())}
        )

    members = docs.map_batches(planted_members, batch_format="pyarrow")
    return _pair_membership_flags(members, pairs)


def q_dedup_lines(sf_dir: str):
    """C4-style global line-level exact dedup: documents are line-ified
    (a newline after every 8th word — one vectorized regex pass), every
    line is kept only at its lexicographically-first (doc_id, line_idx)
    occurrence corpus-wide, and docs are reassembled from surviving
    lines (stages/dedup.dedup_lines; ' | '-joined output so the value
    hash is newline-free)."""
    from ..stages.dedup import dedup_lines

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )

    def lineify(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text"), pa.string())
        broken = pc.replace_substring_regex(
            text, r"((?:\S+ ){7}\S+) ", "\\1\n"
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": broken})

    out = dedup_lines(
        docs.map_batches(lineify, batch_format="pyarrow"),
        sep="\n",
        out_sep=" | ",
    )
    return out


def q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch shuffle: documents globally reordered by
    md5(seed || doc_id) — one map-side hash column + ONE range-sort
    exchange, reproducible at any parallelism/resume point (the
    training loader's per-epoch shuffle).  Top 50 keeps the oracle
    ORDER-sensitive: the row SET depends on the permutation."""
    from ..stages.split import epoch_shuffle

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "lang"]
    )
    return epoch_shuffle(docs, seed=7, keep_cols=["lang"]).limit(50)


def q_mixture_sample(sf_dir: str):
    """Dataset mixing: src1 upweighted to 1.5 epochs, src2 kept at
    0.25, everything else 1.0 — deterministic content-hash sampling
    with duplication for weights > 1; the oracle replays the identical
    hex-threshold rule in SQL."""
    import ray.data as rd

    from ..stages.split import mixture_sample

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "source"]
    )
    return mixture_sample(docs, {"src1": 1.5, "src2": 0.25})


def q_sequence_packing(sf_dir: str):
    """Fixed-token-budget sequence packing (bin = exclusive prefix
    token count // 2048 in doc_id order) — the two-level distributed
    prefix sum; oracle is the equivalent SQL window function."""
    import ray.data as rd

    from ..stages.packing import pack_sequences

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return pack_sequences(docs, budget=2048)


def q_fingerprints_rolling(sf_dir: str):
    """Winnowed rolling-hash fingerprints in the SQL-reproducible md5
    hash mode: the DuckDB twin recomputes every token hash
    (md5_number_upper = LE-uint64 of the first 8 md5 bytes), rolls the
    same FNV-prime polynomial with 32-bit-split mod-2^64 multiplies,
    and winnows with a 4-row window MIN — the full fingerprint SET is
    hash-checked, not just invariants."""
    from ..stages.text import rolling_fingerprints

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return rolling_fingerprints(docs, hash_mode="md5")


def q_ann_bruteforce(sf_dir: str):
    import ray.data as rd

    from ..stages.ann import brute_force_topk

    embs = read_parquet_clean("%s/embeddings.parquet" % sf_dir)
    ds = brute_force_topk(embs, query_ids=list(range(8)), k=10)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "vec_id"])

    return ds.map_batches(project, batch_format="pyarrow")


def q_ann_sq_topk(sf_dir: str):
    """Int8 scalar-quantized ANN (the 4x-smaller memory-bandwidth scale
    path): per-dim min/max fit by bounded tree reduction, SQL-exact
    half-up encoding, int64 dot-product scores — fully hash-checkable
    against the DuckDB twin, unlike float cosine (stages/sq.py)."""
    from ..stages.sq import sq_topk

    embs = read_parquet_clean("%s/embeddings.parquet" % sf_dir)
    return sq_topk(embs, query_ids=list(range(8)), k=10, dim=64)


def _ann_checked(embs, ivf_df, query_ids, k: int,
                 per_query_floor: float = 0.2, mean_floor: float = 0.4):
    """Turn an approximate ANN result into the driver-checkable
    invariant row set (the sketch-family oracle pattern,
    ``_distinct_sketch_checked``): one row per query with

    * ``n_vecs`` — the exact table count (SQL twin),
    * ``n_results`` — top-k rows returned (must be k),
    * ``self_hit`` — the query's own vector is in its top-k at sim 1,
    * ``sims_exact`` — every reported sim equals the true cosine of
      that (query, vec) pair, recomputed here from the raw vectors
      (catches scoring/masking/merge corruption),
    * ``recall_ok`` — recall@k vs the in-query exact brute-force
      top-k is >= ``per_query_floor`` per query AND >= ``mean_floor``
      on average (the IVF pipeline is deterministic, so these floors
      are stable bounds, not flaky statistics).

    The oracle reproduces n_vecs + constants + TRUE flags, so any
    broken invariant turns the driver's hash compare red."""
    import ray.data as rd

    from ..stages.ann import _normalize, brute_force_topk

    # one materialize feeds the three verification consumers (count,
    # brute-force twin, result-vector gather) instead of three scans
    embs = embs.materialize()
    n_vecs = embs.count()
    bf = brute_force_topk(embs, query_ids=query_ids, k=k).to_pandas()

    need = sorted(
        set(ivf_df["vec_id"]) | set(query_ids)
    )  # key-sized gather: <= n_queries * (k + 1) vectors

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("vec_id"), value_set=pa.array(need))
        )

    vdf = embs.map_batches(pick, batch_format="pyarrow").to_pandas()
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, np.float64)
        for r in vdf.itertuples()
    }
    rows = []
    recalls = []
    for qid in query_ids:
        mine = ivf_df[ivf_df["query_id"] == qid]
        qv = _normalize(vecs[qid][None, :])[0]
        sims_exact = True
        for r in mine.itertuples():
            true_sim = float(qv @ _normalize(vecs[int(r.vec_id)][None, :])[0])
            if abs(float(r.sim) - true_sim) > 1e-9:
                sims_exact = False
        got = set(int(v) for v in mine["vec_id"])
        truth = set(
            int(v) for v in bf[bf["query_id"] == qid]["vec_id"]
        )
        recall = len(got & truth) / max(len(truth), 1)
        recalls.append(recall)
        rows.append(
            {
                "query_id": int(qid),
                "n_vecs": int(n_vecs),
                "n_results": int(len(mine)),
                "self_hit": bool(qid in got)
                and bool((mine["vec_id"] == qid).any()),
                "sims_exact": sims_exact,
                "recall_ok": recall >= per_query_floor,
            }
        )
    mean_ok = (sum(recalls) / max(len(recalls), 1)) >= mean_floor
    for r in rows:
        r["recall_ok"] = bool(r["recall_ok"] and mean_ok)
    out = pd.DataFrame(rows).astype(
        {"query_id": "int64", "n_vecs": "int64", "n_results": "int64"}
    )
    return rd.from_pandas(out)


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k, converted from rows-only to the checked
    form: emits per-query invariant rows (exact n_vecs twin + self-hit
    / exact-sim / deterministic recall-floor flags — see
    ``_ann_checked``); the raw (query_id, vec_id, sim) surface stays
    available via ``stages.ann.ivf_topk``."""
    from ..stages.ann import ivf_topk

    embs = read_parquet_clean("%s/embeddings.parquet" % sf_dir)
    qids = list(range(8))
    ivf = ivf_topk(embs, query_ids=qids, k=10).to_pandas()
    return _ann_checked(embs, ivf, qids, k=10)


def q_ann_ivf_indexed(sf_dir: str):
    """Persisted cell-partitioned IVF: build once (idempotent), then a
    partition-pruned search touching only probed cells (the standing-
    corpus ANN path).  Converted from rows-only to the checked form:
    the search result passes through ``_ann_checked`` (exact n_vecs
    twin + self-hit / exact-sim / recall-floor flags), which also
    end-to-end verifies the partitioned-parquet plumbing — a missed or
    corrupted cell partition breaks self_hit/sims_exact/recall."""
    import hashlib as _hl
    import os as _os

    import ray.data as rd

    from ..stages.ann_index import build_ivf_index, index_is_complete, ivf_search

    st = _os.stat("%s/embeddings.parquet" % sf_dir)
    index_dir = "/tmp/graft_ivf_%s" % _hl.md5(
        ("%s|%d|%d" % (sf_dir, st.st_mtime_ns, st.st_size)).encode()
    ).hexdigest()[:12]
    embs = read_parquet_clean("%s/embeddings.parquet" % sf_dir)

    # the sentinel is written AFTER the vectors dataset, so a crashed
    # build is invisible and rebuilt here
    if not index_is_complete(index_dir):
        build_ivf_index(embs, index_dir)
    queries_df = (
        embs.filter(expr="vec_id < 8").to_pandas()
    )
    ivf = ivf_search(index_dir, queries_df, k=10).to_pandas()
    return _ann_checked(embs, ivf, list(range(8)), k=10)


def q_embedding_dups(sf_dir: str):
    """Embedding near-dup pairs via sign-LSH, with DUPLICATE VECTORS
    PLANTED deterministically (every 10th vec_id gets an exact copy at
    vec_id + 1000000): the synthetic embeddings are near-dup-free (max
    pairwise cosine ~0.51), so without planting the op would return 0
    rows and prove nothing.  Exact copies hash to identical sign
    buckets by construction, so LSH recall is exactly 1 and the result
    is SQL-expressible; NOISY near-dups (probabilistic recall) are
    covered by the planted-pair pytest instead."""
    import ray.data as rd

    from ..stages.ann import cosine_dup_pairs

    embs = read_parquet_clean(
        "%s/embeddings.parquet" % sf_dir, columns=["vec_id", "embedding"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id")
        sel = pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 10), 10)), 0)
        copies = batch.filter(sel)
        copies = pa.Table.from_pydict(
            {
                "vec_id": pc.add(copies.column("vec_id"), 1000000),
                "embedding": copies.column("embedding"),
            }
        )
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), copies])

    planted = embs.map_batches(plant, batch_format="pyarrow")
    ds = cosine_dup_pairs(planted, threshold=0.95)

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "a": pc.cast(batch.column("a"), pa.int64()),
                "b": pc.cast(batch.column("b"), pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def q_dedup_semantic(sf_dir: str):
    """SemDeDup-style semantic dedup: k-means the embedding space,
    then cosine near-dup pairs WITHIN each cluster only (the
    clustering makes the pairwise step O((n/k)^2) per cell instead of
    O(n^2) global).  Same deterministic planting as q_embedding_dups:
    exact copies land in their original's cell (identical vector ->
    identical argmin), so the result is SQL-expressible; noisy
    near-dups are covered by the planted-pair pytest."""
    from ..stages.dedup import semantic_dup_pairs

    embs = read_parquet_clean(
        "%s/embeddings.parquet" % sf_dir, columns=["vec_id", "embedding"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id")
        sel = pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 10), 10)), 0)
        copies = batch.filter(sel)
        copies = pa.Table.from_pydict(
            {
                "vec_id": pc.add(copies.column("vec_id"), 1000000),
                "embedding": copies.column("embedding"),
            }
        )
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), copies])

    planted = embs.map_batches(plant, batch_format="pyarrow")
    return semantic_dup_pairs(planted, k=16, threshold=0.95)


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: 6-table join with exactly two exchanges (see
    relational.local_supplier_volume's scale plan)."""
    from .relational import local_supplier_volume

    return local_supplier_volume(sf_dir)


def q_bm25_search(sf_dir: str):
    """BM25 keyword retrieval (the lexical twin of the ANN queries):
    top-20 documents for a three-term query, one tokenizing pass that
    reduces map-side to query-hit rows + per-block length sentinels."""
    import pyarrow.parquet as pq

    from ..stages.bm25 import bm25_topk

    path = "%s/documents.parquet" % sf_dir
    docs = read_parquet_clean(path, columns=["doc_id", "text"])
    n_docs = pq.read_metadata(path).num_rows
    return bm25_topk(docs, "window merge stream", n_docs=n_docs, k=20)


def q_multimodal_features(sf_dir: str):
    """REAL P6 PPM decode in an actor pool.  SQL-oracled on the decode
    outcome: the synthetic image dims are pure formulas of doc_id, so
    the DuckDB twin predicts (width, height, decoded) — a broken
    header parse (or a silently-succeeding malformed branch) goes red.
    Pixel-body exactness is pytest-pinned by the encode/decode
    roundtrip."""
    from ..stages.multimodal import media_features

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    feats = media_features(docs)

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "decoded": pc.equal(batch.column("decode_error"), ""),
            }
        )

    return feats.map_batches(project, batch_format="pyarrow")



def q_multimodal_audio(sf_dir: str):
    """REAL RIFF/PCM16 WAV parse + loudness features (integer
    milli-units) in an actor pool; non-audio payloads surface flagged
    with zeros.  FULLY SQL-ORACLED end to end: the synthetic waveform
    is a deterministic integer formula of doc_id, so the DuckDB twin
    regenerates the samples and recomputes RMS — any corruption in the
    RIFF encode -> parse -> feature chain goes red.  (The codec is
    also pinned against CPython's own wave module by pytest.)"""
    from ..stages.multimodal import audio_features

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    feats = audio_features(docs)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["media_id", "sample_rate", "n_samples", "duration_ms", "rms_milli"]
        )

    return feats.map_batches(project, batch_format="pyarrow")


def q_multimodal_frames(sf_dir: str):
    """Video frame sampling: one media row explodes into N frame rows
    (actor pool, small batches for wide binary; rows-only)."""
    import ray.data as rd

    from ..stages.multimodal import frame_samples

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    frames = frame_samples(docs)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["media_id", "frame_idx", "ts_ms"])

    return frames.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# KG query surface: SPARQL-style BGP matching, property paths, graph
# analytics over the constructed graph

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _store_tag(sf_dir: str, prefix: str) -> str:
    """Cache-dir tag for a persisted store derived from BOTH the input
    path and the documents file's (mtime, size) identity — a
    regenerated testdata tree must never hit a stale cached store."""
    import hashlib as _hl
    import os as _os

    st = _os.stat("%s/documents.parquet" % sf_dir)
    key = "%s|%d|%d" % (sf_dir, st.st_mtime_ns, st.st_size)
    return "/tmp/%s_%s" % (prefix, _hl.md5(key.encode()).hexdigest()[:12])


_TYPED_TRIPLES_CACHE: dict = {}


def _typed_triples(sf_dir: str):
    """Distilled (subj, pred, obj_value) view over the documents table.

    ~30 kg_* queries share this exact view; within one Ray session the
    materialized Dataset (tiny: 4 triples/doc) is cached keyed on input
    file identity + Ray job id, so a driver/bench session distills once
    instead of once per query.  Refs die with the session — the job-id
    key makes a stale entry impossible after ray.shutdown()/init()."""
    import os as _os

    import ray as _ray

    st = _os.stat("%s/documents.parquet" % sf_dir)
    key = (
        sf_dir,
        st.st_mtime_ns,
        st.st_size,
        _ray.get_runtime_context().get_job_id(),
    )
    ds = _TYPED_TRIPLES_CACHE.get(key)
    if ds is None:
        turns = typed_transcripts_from_documents(sf_dir)
        triples = build_triples(turns).map_batches(
            split_triples, batch_format="pyarrow"
        )
        ds = triples.select_columns(["subj", "pred", "obj_value"]).materialize()
        _TYPED_TRIPLES_CACHE.clear()
        _TYPED_TRIPLES_CACHE[key] = ds
    return ds


def q_kg_bgp_star(sf_dir: str):
    """SPARQL BGP (star shape) over the distilled graph: Chinese
    documents with their source and character count — 4 patterns, 3
    self-joins on ?d, constants pushed into the scans."""
    from ..stages.bgp import bgp_match

    patterns = [
        ("?d", "http://schema.org/inLanguage", "zh"),
        ("?d", _RDF_TYPE, "http://schema.org/Document"),
        ("?d", "http://schema.org/source", "?src"),
        ("?d", "http://schema.org/characterCount", "?n"),
    ]
    return bgp_match(_typed_triples(sf_dir), patterns, select=["d", "src", "n"])


def q_kg_bgp_chain(sf_dir: str):
    """SPARQL BGP (chain via a shared OBJECT variable): pairs of
    documents sharing a source where the first is Chinese — the join
    key sits in object position on both sides."""
    from ..stages.bgp import bgp_match

    patterns = [
        ("?d1", "http://schema.org/inLanguage", "zh"),
        ("?d1", "http://schema.org/source", "?src"),
        ("?d2", "http://schema.org/source", "?src"),
    ]
    return bgp_match(_typed_triples(sf_dir), patterns, select=["d1", "src", "d2"])


def _doc_tree_edges(sf_dir: str):
    """Deterministic category-tree edges over documents: each doc_id
    >= 1 points at parent doc_id // 4 (root 0); depth O(log4 n)."""
    import ray.data as rd

    ds = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id"])

    def to_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        mask = pc.greater_equal(ids, 1)
        ids = ids.filter(mask) if isinstance(ids, pa.ChunkedArray) else pc.filter(ids, mask)
        return pa.Table.from_pydict(
            {"src": ids, "dst": pc.divide(ids, 4)}
        )

    return ds.map_batches(to_edges, batch_format="pyarrow")


def q_kg_subclass_closure(sf_dir: str):
    """Transitive closure (SPARQL p+ / rdfs:subClassOf*) of the
    document category tree via semi-naive iteration; oracle is the
    equivalent DuckDB WITH RECURSIVE."""
    from ..stages.closure import transitive_closure

    paths = transitive_closure(_doc_tree_edges(sf_dir))
    return paths.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t.column("src"), "anc": t.column("dst")}
        ),
        batch_format="pyarrow",
    )


def q_kg_degree_hist(sf_dir: str):
    """Degree distribution of the canonicalized graph: how many
    canonical subjects carry each in-document degree (entity-linked
    subjects accumulate the degree of every doc that linked to them)."""
    import ray
    from ray.data.aggregate import Count

    turns = typed_transcripts_from_documents(sf_dir, with_alias=True)
    triples = build_triples(turns)
    alias_ref = ray.put(build_alias_table())
    augmented = triples.map_batches(
        link_batch_augmenting,
        fn_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    canon = canonicalize(augmented)

    def sources_only(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("pred"), "http://schema.org/source")
        )
        return pa.Table.from_pydict({"subj": batch.column("subj")})

    deg = (
        canon.map_batches(sources_only, batch_format="pyarrow")
        .groupby("subj")
        .aggregate(Count(alias_name="degree"))
    )
    return deg.groupby("degree").aggregate(Count(alias_name="n_subjects"))


def q_kg_pagerank(sf_dir: str):
    """PageRank over the category tree (iterative float workload —
    rows-only at the driver; pytest bounds it against dense numpy)."""
    from ..stages.pagerank import pagerank

    ranks = pagerank(_doc_tree_edges(sf_dir), n_iters=10)
    return ranks.sort(["rank", "node"], descending=[True, False]).limit(20)


def q_kg_ppr(sf_dir: str):
    """Personalized PageRank (random-walk-with-restart) from seeds
    {5, 21} over the category tree — "entities related to THESE";
    iterative float workload, rows-only (pytest bounds all three
    execution modes against dense numpy)."""
    from ..stages.pagerank import pagerank

    ranks = pagerank(_doc_tree_edges(sf_dir), n_iters=10, seeds=[5, 21])
    return ranks.sort(["rank", "node"], descending=[True, False]).limit(20)


def q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP: leaf aggregate distributed, super-aggregates
    derived from the tiny leaf table."""
    from .relational import orders_rollup

    return orders_rollup(sf_dir)


def q_events_user_deltas(sf_dir: str):
    """LAG window function: microseconds since the user's previous
    event (-1 for the first)."""
    from .relational import events_user_deltas

    return events_user_deltas(sf_dir)


def q_pii_scrub(sf_dir: str):
    """PII redaction over documents with deterministically planted
    emails / phones / IPs (the synthetic corpus is PII-free, so the
    query injects the same expression the SQL oracle does — the
    redaction itself is what's being checked)."""
    import ray.data as rd

    from ..stages.scrub import scrub_documents

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string())
        planted = pc.binary_join_element_wise(
            batch.column("text"),
            " contact user",
            ids,
            "@example.com or +1-555-01",
            ids,
            " from 10.0.0.",
            ids,
            "",
        )
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"), "text": planted}
        )

    return scrub_documents(docs.map_batches(plant, batch_format="pyarrow"))


def q_kmeans_sizes(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding table, converted
    from rows-only to the checked-invariant form
    (``stages.kmeans.kmeans_checked``): exact n_points twin +
    every-vector-assigned + Lloyd descent (final inertia <= seed
    inertia) flags; per-cluster sizes stay available via
    ``kmeans_cluster_sizes`` and assignment semantics stay pinned by
    the numpy-twin pytest."""
    from ..stages.kmeans import kmeans_checked

    emb = read_parquet_clean(
        "%s/embeddings.parquet" % sf_dir, columns=["vec_id", "embedding"]
    )
    return kmeans_checked(emb, k=8, n_iters=10)


def q_semdedup(sf_dir: str):
    """SemDeDup (arXiv:2303.09540): k-means-partitioned semantic
    dedup over the embedding table, converted from rows-only to the
    checked-invariant + planted form: every 10th vec_id gets an exact
    vector copy at vec_id+1000000 (the ``q_embedding_dups`` pattern).
    An exact copy has cosine exactly 1 to its source, co-clusters with
    it deterministically, and the paper's within-cluster kernel must
    drop at least one of the pair — so ``planted_dedup_ok`` is a
    GUARANTEE.  ``n_vecs``/``planted_pairs`` are exact SQL twins (a
    lost or duplicated decision row breaks ``n_vecs`` on its own).
    Per-cluster census rows stay available via
    ``stages.semdedup.semdedup_summary``; kernel semantics stay
    pytest-pinned in tests/test_semdedup.py."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.semdedup import semdedup

    emb = read_parquet_clean(
        "%s/embeddings.parquet" % sf_dir, columns=["vec_id", "embedding"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id")
        if batch.num_rows and pc.max(ids).as_py() >= 1000000:
            raise ValueError(
                "q_semdedup plant: vec_id >= 1e6 collides with the "
                "planted-copy offset — raise the offset for this corpus"
            )
        sel = pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 10), 10)), 0)
        copies = batch.filter(sel)
        copies = pa.Table.from_pydict(
            {
                "vec_id": pc.add(copies.column("vec_id"), 1000000),
                "embedding": copies.column("embedding"),
            }
        )
        return pa.concat_tables([batch.select(["vec_id", "embedding"]), copies])

    planted = emb.map_batches(plant, batch_format="pyarrow")
    decisions = semdedup(planted, k=8, eps=0.95, n_iters=10).materialize()

    n_vecs = decisions.count()
    # distributed planted-pair audit: only key-sized (pair, kept) rows.
    # The drop-one guarantee holds only when the pair's cluster ran the
    # full pairwise kernel — an oversize cluster chunks (the observable
    # `chunked` flag) and a pair straddling a chunk boundary is never
    # compared, so chunked pairs are exempted rather than failed.
    def pair_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = batch.column("keep").to_numpy(zero_copy_only=False)
        chunked = batch.column("chunked").to_numpy(zero_copy_only=False)
        src = (ids < 1000000) & (ids % 10 == 0)
        cpy = ids >= 1000000
        m = src | cpy
        return pa.Table.from_pydict(
            {
                "pair": pa.array(np.where(ids[m] >= 1000000,
                                          ids[m] - 1000000, ids[m]),
                                 pa.int64()),
                "kept": pa.array(keep[m].astype(np.int64), pa.int64()),
                "chk": pa.array(chunked[m].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    pairs = (
        decisions.map_batches(pair_rows, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("kept", alias_name="kept"),
                   Max("chk", alias_name="chk"))
        .materialize()
    )
    planted_pairs = pairs.count()
    if planted_pairs:
        unchunked = pairs.filter(expr="chk == 0").materialize()
        max_kept = (unchunked.max("kept") or 0) if unchunked.count() else 0
    else:
        max_kept = 0
    # n_vecs is the decision-row count: the oracle pins it to the exact
    # planted-input count, so a lost or duplicated decision row (or a
    # failed plant) breaks the hash compare on its own
    out = pd.DataFrame(
        {
            "n_vecs": np.array([n_vecs], dtype=np.int64),
            "planted_pairs": np.array([planted_pairs], dtype=np.int64),
            "planted_dedup_ok": [bool(max_kept <= 1)],
        }
    )
    return rd.from_pandas(out)


def q_lineitem_corr(sf_dir: str):
    """Pearson correlation per group via mergeable sufficient
    statistics (micro-quantized)."""
    from .relational import lineitem_corr

    return lineitem_corr(sf_dir)


def q_events_pivot(sf_dir: str):
    """PIVOT events by event_type into per-user count columns."""
    from .relational import events_pivot

    return events_pivot(sf_dir)


def q_orders_topk_concat(sf_dir: str):
    """Ordered STRING_AGG of each priority's top-5 order keys."""
    from .relational import orders_topk_concat

    return orders_topk_concat(sf_dir)


def q_heavy_tokens(sf_dir: str):
    """Misra-Gries heavy hitters over the corpus token stream — the
    skew-detection sketch (SURVEY §2.6): at most k counters leave each
    block.  The synthetic vocabulary (~31 tokens) stays under k=128, so
    no eviction fires and the sketch is EXACT — which is what makes the
    SQL oracle valid; the eviction regime (undercount <= n/(k+1),
    never over) is pinned by pytest with adversarial data."""
    import ray.data as rd

    from ..stages.sketch import heavy_hitters

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )

    def flat_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.cast(batch.column("text"), pa.string())),
            "[^a-z0-9]+",
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    stream = docs.map_batches(flat_tokens, batch_format="pyarrow")
    return heavy_hitters(stream, "token", k=128)


def q_events_running_total(sf_dir: str):
    """Cumulative SUM window per user (exact milli-units)."""
    from .relational import events_running_total

    return events_running_total(sf_dir)


def q_docs_stratified_sample(sf_dir: str):
    """Deterministic stratified systematic sampling (map-side mask)."""
    from .relational import docs_stratified_sample

    return docs_stratified_sample(sf_dir)


def q_tfidf_top50(sf_dir: str):
    """TF-IDF ranking over the corpus: global top-50 (doc, token)
    pairs by integer-quantized score."""
    import ray.data as rd

    from ..stages.tfidf import tfidf_topk

    import pyarrow.parquet as pq

    path = "%s/documents.parquet" % sf_dir
    docs = read_parquet_clean(path, columns=["doc_id", "text"])
    # row count from the parquet footer — Dataset.count() would execute
    # the whole read (incl. the text column) a second time
    n_docs = pq.read_metadata(path).num_rows
    return tfidf_topk(docs, n_docs=n_docs, k=50)


# ---------------------------------------------------------------------------
# SPARQL algebra beyond the BGP core: OPTIONAL / UNION / FILTER /
# property paths (rdflib evalLeftJoin / evalUnion / evalFilter /
# evalPath parity — rdflib/plugins/sparql/evaluate.py)

_NARROWER = "http://www.w3.org/2004/02/skos/core#narrower"


def _tree_triples(sf_dir: str):
    """The document category tree as triples with URI endpoints:
    child doc narrower parent doc (parent = doc_id // 4, root 0)."""
    import ray.data as rd

    ds = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id"])

    def to_triples(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        mask = pc.greater_equal(ids, 1)
        ids = ids.filter(mask) if isinstance(ids, pa.ChunkedArray) else pc.filter(ids, mask)
        child = pc.binary_join_element_wise(DOC_NS, pc.cast(ids, pa.string()), "")
        parent = pc.binary_join_element_wise(
            DOC_NS, pc.cast(pc.divide(ids, 4), pa.string()), ""
        )
        return pa.Table.from_pydict(
            {
                "subj": child,
                "pred": pa.nulls(len(ids), pa.string()).fill_null(_NARROWER),
                "obj_value": parent,
            }
        )

    return ds.map_batches(to_triples, batch_format="pyarrow")


def q_kg_path_plus(sf_dir: str):
    """Property path ``skos:narrower+`` over the category tree —
    string-keyed semi-naive closure (URI endpoints, unlike the int-id
    kg_subclass_closure)."""
    from ..stages.sparql import path_edges

    edges = path_edges(_tree_triples(sf_dir), ("plus", _NARROWER))
    return edges.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t.column("src"), "anc": t.column("dst")}
        ),
        batch_format="pyarrow",
    )


def q_kg_path_seq_inv(sf_dir: str):
    """Property path ``schema:source/^schema:source``: document pairs
    sharing a source — one seq join over the forward and inverted
    scans."""
    from ..stages.sparql import path_edges

    pairs = path_edges(
        _typed_triples(sf_dir),
        ("seq", "http://schema.org/source", ("inv", "http://schema.org/source")),
    )
    return pairs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"d1": t.column("src"), "d2": t.column("dst")}
        ),
        batch_format="pyarrow",
    )


def q_kg_optional_lang(sf_dir: str):
    """OPTIONAL with a nested FILTER: every document with its source,
    plus its language ONLY when Chinese — unmatched rows keep the ''
    unbound sentinel (SPARQL LeftJoin semantics)."""
    from ..stages.sparql import optional_match

    return optional_match(
        _typed_triples(sf_dir),
        [
            ("?d", _RDF_TYPE, "http://schema.org/Document"),
            ("?d", "http://schema.org/source", "?src"),
        ],
        [("?d", "http://schema.org/inLanguage", "?l")],
        opt_filter=lambda t: pc.equal(t.column("l"), "zh"),
        select=["d", "src", "l"],
    )


def q_kg_union_bgp(sf_dir: str):
    """UNION of two BGP arms with different variables — columns align
    to the union of the arms' variables ('' where an arm leaves a
    variable unbound)."""
    from ..stages.sparql import union_match

    return union_match(
        _typed_triples(sf_dir),
        [
            [("?d", "http://schema.org/inLanguage", "zh")],
            [("?x", "http://schema.org/source", "src1")],
        ],
    )


def q_kg_construct(sf_dir: str):
    """SPARQL CONSTRUCT: derive a new graph from the matched bindings
    — every Chinese document gets (doc, dcterms:source-ish, src) and a
    type triple, set-deduped (CONSTRUCT emits a graph)."""
    from ..stages.sparql import construct

    return construct(
        _typed_triples(sf_dir),
        [
            ("?d", "http://schema.org/inLanguage", "zh"),
            ("?d", "http://schema.org/source", "?src"),
        ],
        [
            ("?d", "http://purl.org/dc/terms/source", "?src"),
            ("?d", _RDF_TYPE, "http://example.org/ZhDocument"),
        ],
    )


def q_kg_ask(sf_dir: str):
    """SPARQL ASK (one True row, one False row): existence probes via
    limit(1) — the streaming executor stops at the first solution."""
    import ray.data as rd

    from ..stages.sparql import ask

    t = _typed_triples(sf_dir)
    yes = ask(t, [("?d", "http://schema.org/inLanguage", "zh")])
    no = ask(t, [("?d", "http://schema.org/inLanguage", "tlh")])
    return rd.from_arrow(
        pa.table(
            {
                "probe": pa.array(["zh", "tlh"], pa.string()),
                "answer": pa.array([yes, no], pa.bool_()),
            }
        )
    )


def q_kg_ask_const(sf_dir: str):
    """Constant-only ASK patterns (the rdflib ``triple in graph`` /
    reachability idiom): each fully-constant pattern is an existence
    gate — one map-side equality filter with a first-match stop; the
    path form filters the shared closure machinery's (src, dst) edges
    the same way."""
    import ray.data as rd

    from ..stages.sparql_text import execute

    t = _typed_triples(sf_dir).materialize()
    probes = [
        (
            "triple",
            'ASK { <http://docs.local/d0>'
            ' <http://schema.org/inLanguage> "en" }',
        ),
        (
            "absent",
            'ASK { <http://docs.local/d0>'
            ' <http://schema.org/inLanguage> "tlh" }',
        ),
        (
            "path",
            "ASK { <http://docs.local/d0> (<http://schema.org/inLanguage>"
            '|<http://schema.org/source>) "en" }',
        ),
    ]
    answers = [
        bool(execute(t, q, n_buckets=8).to_pandas()["answer"][0])
        for _n, q in probes
    ]
    return rd.from_arrow(
        pa.table(
            {
                "probe": pa.array([n for n, _q in probes], pa.string()),
                "answer": pa.array(answers, pa.bool_()),
            }
        )
    )


def q_kg_strlang(sf_dir: str):
    """STRLANG term constructor in BIND: tag each document IRI with
    its own language value, then keep the Chinese ones by LANG() of
    the CONSTRUCTED literal (bind-attached metadata, not scan-carried
    — the rdflib Literal(..., lang=...) minting idiom)."""
    from ..stages.sparql_text import execute

    t = _typed_triples(sf_dir)
    return execute(
        t,
        "SELECT ?s (LANG(?y) AS ?tag) WHERE {"
        " ?s <http://schema.org/inLanguage> ?l ."
        " BIND(STRLANG(?s, ?l) AS ?y)"
        ' FILTER(STRSTARTS(LANG(?y), "z")) }',
        n_buckets=16,
    )


def q_kg_group_count(sf_dir: str):
    """SPARQL GROUP BY + COUNT over BGP bindings: documents per source
    among Chinese documents."""
    from ..stages.sparql import aggregate_bindings

    return aggregate_bindings(
        _typed_triples(sf_dir),
        [
            ("?d", "http://schema.org/inLanguage", "zh"),
            ("?d", "http://schema.org/source", "?src"),
        ],
        ["src"],
    )


def q_kg_describe(sf_dir: str):
    """SPARQL DESCRIBE: every triple about the Chinese documents — the
    fourth and last query form (SELECT / CONSTRUCT / ASK / DESCRIBE)."""
    from ..stages.sparql import describe

    return describe(
        _typed_triples(sf_dir),
        [("?d", "http://schema.org/inLanguage", "zh")],
        "d",
    )


def q_kg_describe_iri(sf_dir: str):
    """SPARQL DESCRIBE <iri> (constant-subject form) through the text
    front-end: all triples about two fixed documents.  The constant
    subject set makes the semi join collapse to a map-side ``is_in``
    filter over the scan — zero shuffle."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        "DESCRIBE <%s0> <%s1>" % (DOC_NS, DOC_NS),
    )


def q_kg_order_limit(sf_dir: str):
    """SPARQL ORDER BY ... OFFSET ... LIMIT: the 10 largest documents
    by characterCount (zero-padded string sort key for a total order),
    skipping the top 5 — map-side partial top-(offset+limit)."""
    from ..stages.bgp import bgp_match
    from ..stages.sparql import order_limit

    b = bgp_match(
        _typed_triples(sf_dir),
        [("?d", "http://schema.org/characterCount", "?n")],
    )

    def pad(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "d": batch.column("d"),
                "n": pc.utf8_lpad(batch.column("n"), 8, "0"),
            }
        )

    padded = b.map_batches(pad, batch_format="pyarrow")
    return order_limit(
        padded, ["n", "d"], descending=[True, False], limit=10, offset=5
    )


def q_kg_graph_diff(sf_dir: str):
    """rdflib.compare.graph_diff analogue between two graph versions:
    v2 retags Chinese documents 'zh' -> 'zh-Hans' (a simulated vocab
    migration); the diff labels triples both / only_a / only_b via two
    anti joins and one semi join on the packed triple key."""
    from ..stages.graphops import graph_diff

    v1 = _typed_triples(sf_dir)
    lang_pred = "http://schema.org/inLanguage"

    def migrate(batch: pa.Table) -> pa.Table:
        is_zh = pc.and_(
            pc.equal(batch.column("pred"), lang_pred),
            pc.equal(batch.column("obj_value"), "zh"),
        )
        return pa.Table.from_pydict(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj_value": pc.if_else(
                    is_zh,
                    pa.nulls(batch.num_rows, pa.string()).fill_null("zh-Hans"),
                    batch.column("obj_value"),
                ),
            }
        )

    v2 = v1.map_batches(migrate, batch_format="pyarrow")
    return graph_diff(v1, v2)


def q_kg_filter_numeric(sf_dir: str):
    """FILTER over a numeric literal: documents whose characterCount
    exceeds 400 — vectorized cast + compare, map-side only."""
    from ..stages.bgp import bgp_match
    from ..stages.sparql import filter_bindings

    b = bgp_match(
        _typed_triples(sf_dir),
        [("?d", "http://schema.org/characterCount", "?n")],
    )
    return filter_bindings(
        b, lambda t: pc.greater(pc.cast(t.column("n"), pa.int64()), 400)
    )


def q_kg_triangles(sf_dir: str):
    """Exact triangle count of the shared-source document graph
    (degree-oriented wedge join — hub-safe O(m^1.5)).  The graph is a
    disjoint union of per-source cliques, so the oracle counts
    C(n_source, 3) combinatorially — an independent formulation, not
    the same algorithm."""
    import ray.data as rd

    from ..stages.graphalgo import triangle_count
    from ..stages.join import bucketed_hash_join

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "source"]
    )
    left = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("doc_id"), "source": t.column("source")}
        ),
        batch_format="pyarrow",
    )
    right = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"source": t.column("source"), "dst": t.column("doc_id")}
        ),
        batch_format="pyarrow",
    )
    pairs = bucketed_hash_join(
        left,
        right,
        on="source",
        n_buckets=16,
        left_schema=pa.schema([("src", pa.int64()), ("source", pa.string())]),
        right_schema=pa.schema([("source", pa.string()), ("dst", pa.int64())]),
    )

    def ordered(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("src"), batch.column("dst"))
        batch = batch.filter(keep)
        return pa.Table.from_pydict(
            {"src": batch.column("src"), "dst": batch.column("dst")}
        )

    return triangle_count(pairs.map_batches(ordered, batch_format="pyarrow"))


def q_kg_link_pred(sf_dir: str):
    """Common-neighbor / Jaccard link prediction
    (stages/graphalgo.neighbor_similarity) over the order—part
    bipartite graph from lineitem (part ids offset into a disjoint id
    space).  Two orders score when they share parts; result = the top
    100 order pairs by (jaccard_ppm DESC, u, v) — integer-ppm scores
    and a deterministic tie-break make the cut SQL-reproducible."""
    import ray.data as rd

    from ..stages.graphalgo import neighbor_similarity
    from ..stages.sparql import order_limit

    OFF = 1_000_000_000
    li = read_parquet_clean(
        "%s/lineitem.parquet" % sf_dir, columns=["l_orderkey", "l_partkey"]
    )
    edges = li.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "src": pc.cast(t.column("l_orderkey"), pa.int64()),
                "dst": pc.cast(pc.add(t.column("l_partkey"), OFF), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    sims = neighbor_similarity(edges, min_common=1, exclude_edges=True)

    def order_pairs_only(t: pa.Table) -> pa.Table:
        # wedges around order centers score part—part pairs too; the
        # query ranks order—order pairs (both ids below the offset)
        return t.filter(pc.less(t.column("v"), OFF))

    sims = sims.map_batches(order_pairs_only, batch_format="pyarrow")
    return order_limit(
        sims, ["jaccard_ppm", "u", "v"], descending=[True, False, False], limit=100
    )


def q_kg_kcore(sf_dir: str):
    """k-core of the shared-source document graph (iterative peeling,
    convergence-checked, adaptive anti-join edge drops).  The graph is
    a disjoint union of per-source cliques, so the oracle is
    combinatorial: a size-n clique survives k iff n > k, every
    survivor at degree n-1 — an independent formulation, not the
    same algorithm."""
    from ..stages.graphalgo import kcore
    from ..stages.join import bucketed_hash_join

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "source"]
    )
    left = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("doc_id"), "source": t.column("source")}
        ),
        batch_format="pyarrow",
    )
    right = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"source": t.column("source"), "dst": t.column("doc_id")}
        ),
        batch_format="pyarrow",
    )
    pairs = bucketed_hash_join(
        left,
        right,
        on="source",
        n_buckets=16,
        left_schema=pa.schema([("src", pa.int64()), ("source", pa.string())]),
        right_schema=pa.schema([("source", pa.string()), ("dst", pa.int64())]),
    )

    def ordered(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("src"), batch.column("dst"))
        batch = batch.filter(keep)
        return pa.Table.from_pydict(
            {"src": batch.column("src"), "dst": batch.column("dst")}
        )

    import ray.data as rd

    # planted low-degree tail (synthetic ids >= 10^6): a 20-node chain
    # hung off doc 0 — peels away in the first rounds and drops doc 0
    # back to its in-clique degree, exercising the iterate-and-re-peel
    # path; the oracle sees only the surviving cliques
    chain_nodes = [1_000_000 + j for j in range(20)]
    chain_edges = [(0, chain_nodes[0])] + [
        (chain_nodes[j], chain_nodes[j + 1])
        for j in range(len(chain_nodes) - 1)
    ]
    chain = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in chain_edges], pa.int64()),
                "dst": pa.array([b for _, b in chain_edges], pa.int64()),
            }
        )
    )
    edges = pairs.map_batches(ordered, batch_format="pyarrow").union(chain)
    return kcore(edges, k=10)


def q_kg_bfs_depth(sf_dir: str):
    """Single-source BFS levels from the category-tree root (hop
    distance per node); oracle is the equivalent DuckDB WITH
    RECURSIVE."""
    import ray.data as rd

    from ..stages.graphalgo import bfs_levels

    ds = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id"])

    def parent_to_child(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        mask = pc.greater_equal(ids, 1)
        ids = ids.filter(mask)
        return pa.Table.from_pydict({"src": pc.divide(ids, 4), "dst": ids})

    edges = ds.map_batches(parent_to_child, batch_format="pyarrow")
    return bfs_levels(edges, source=0)


def q_events_quantiles_sketch(sf_dir: str):
    """Approximate quantiles of events.value via the mergeable
    equi-weight summary (unbounded continuous domain — the sketch
    complement of the exact histogram quantiles), self-checked by
    RANK: one extra thin-column pass counts rows <= each estimate, and
    within_eps asserts |rank/n - q| <= 5 * (3/k) (the summary's
    three-level compression bound).  Output (q_pct, n_values,
    within_eps) is fully SQL-oracled — a sketch outside its bound goes
    red in the driver's hash compare instead of hiding as rows-only."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.sketch import quantile_sketch

    qs = [0.5, 0.9, 0.99]
    k = 512
    ds = read_parquet_clean(
        "%s/events.parquet" % sf_dir, columns=["value"]
    ).materialize()  # two passes: sketch + rank check
    est = quantile_sketch(ds, "value", qs, k=k).to_pandas().sort_values("q")
    thresholds = est["value"].to_numpy(dtype=np.float64)

    def rank_partial(batch: pa.Table) -> pa.Table:
        col = batch.column("value").to_numpy(zero_copy_only=False)
        col = col[~np.isnan(col.astype(np.float64))]
        le = [(col <= t).sum() for t in thresholds]
        return pa.Table.from_pydict(
            {
                "q_pct": pa.array(
                    [int(round(q * 100)) for q in qs], pa.int64()
                ),
                "n_le": pa.array([int(x) for x in le], pa.int64()),
                "n": pa.array([len(col)] * len(qs), pa.int64()),
            }
        )

    ranks = (
        ds.map_batches(rank_partial, batch_format="pyarrow")
        .groupby("q_pct")
        .aggregate(Sum("n_le", alias_name="n_le"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("q_pct")
    )
    eps = 5 * 3.0 / k
    within = (
        np.abs(
            ranks["n_le"].to_numpy() / ranks["n"].to_numpy()
            - np.asarray(sorted(qs))
        )
        <= eps
    )
    return rd.from_pandas(
        pd.DataFrame(
            {
                "q_pct": ranks["q_pct"].astype("int64"),
                "n_values": ranks["n"].astype("int64"),
                "within_eps": within,
            }
        )
    )


def q_docs_source_quota(sf_dir: str, k: int = 50):
    """Per-domain quota sampling (the RefinedWeb/Gopher move: cap any
    one source's share of the corpus): keep at most ``k`` docs per
    source, ranked by the deterministic (n_chars, doc_id) priority.
    ONE shuffle on the source bucket; the per-bucket rank is a
    cythonized sort + groupby-cumcount — no per-source Python."""
    import pandas as pd

    from ..functions.hashing import crc32_bucket

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir,
        columns=["doc_id", "source", "n_chars"],
    )
    n_buckets = 32

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", crc32_bucket(batch.column("source"), n_buckets)
        )

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "source": pd.Series([], dtype=str),
            "n_chars": pd.Series([], dtype="int64"),
        }
    )

    def take_quota(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return empty
        g = group.sort_values(["source", "n_chars", "doc_id"], kind="mergesort")
        rank = g.groupby("source", sort=False).cumcount()
        return g.loc[rank < k, ["doc_id", "source", "n_chars"]]

    return (
        docs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(take_quota, batch_format="pandas")
    )


def q_docs_length_trim(sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95):
    """Percentile length filter (drop the shortest/longest tails) with
    EXACT distributed percentiles by the histogram method: one
    ``groupby(n_chars).count()`` pass (the histogram is tiny — distinct
    integer lengths, not rows), thresholds from its cumsum on the
    driver, then a broadcast vectorized filter.  Threshold rule (both
    sides): the smallest value whose cumulative count reaches
    ``ceil(q * N)``."""
    import math

    import numpy as np

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "n_chars"]
    )
    hist = (
        docs.groupby("n_chars")
        .count()
        .to_pandas()
        .sort_values("n_chars")
        .reset_index(drop=True)
    )
    cc = np.cumsum(hist["count()"].to_numpy())
    n = int(cc[-1]) if len(cc) else 0
    vals = hist["n_chars"].to_numpy()

    def thresh(q: float) -> int:
        need = math.ceil(q * n)
        return int(vals[np.searchsorted(cc, need, side="left")])

    lo, hi = thresh(lo_q), thresh(hi_q)

    def trim(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars")
        mask = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        return batch.filter(mask)

    return docs.map_batches(trim, batch_format="pyarrow")


def q_docs_train_split(sf_dir: str):
    """Deterministic content-hash train/holdout assignment (25%
    holdout): map-only, shuffle-free, reproducible at any parallelism;
    oracle recomputes the identical md5-prefix rule in DuckDB."""
    import ray.data as rd

    from ..stages.split import assign_split

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    return assign_split(docs)


def q_kg_minus(sf_dir: str):
    """SPARQL MINUS: documents with their source, minus the Chinese
    ones — one anti-join exchange, only the minus side's keys ship."""
    from ..stages.sparql import minus_match

    return minus_match(
        _typed_triples(sf_dir),
        [
            ("?d", _RDF_TYPE, "http://schema.org/Document"),
            ("?d", "http://schema.org/source", "?src"),
        ],
        [("?d", "http://schema.org/inLanguage", "zh")],
        select=["d", "src"],
    )


def _collect_typed(ds, fallback_schema: pa.Schema) -> pa.Table:
    """Collect a SMALL Dataset to a pa.Table without losing the schema
    when the result is empty — Ray 2.49's ``Dataset.to_pandas()``
    returns a ZERO-COLUMN frame for zero-row datasets (found by the
    sf0.1 value sweep: kg_not_exists legitimately empties there and
    the driver's schema compare would go red on the vanished column
    names).  Only for results that are group-sized by construction."""
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches, promote_options="permissive")
    return fallback_schema.empty_table()


def q_kg_not_exists(sf_dir: str):
    """FILTER NOT EXISTS correlated on a shared OBJECT variable:
    (document, source) pairs whose source hosts no Chinese document.
    Collected to a typed Arrow table: the result can be legitimately
    EMPTY (sf0.1 has a zh document on every source) and Ray's
    to_pandas drops column names for empty datasets."""
    from ..stages.sparql import exists_filter

    return _collect_typed(exists_filter(
        _typed_triples(sf_dir),
        [("?d", "http://schema.org/source", "?src")],
        [
            ("?d2", "http://schema.org/inLanguage", "zh"),
            ("?d2", "http://schema.org/source", "?src"),
        ],
        negate=True,
        select=["d", "src"],
    ), pa.schema([("d", pa.string()), ("src", pa.string())]))


def q_kg_expr_exists(sf_dir: str):
    """[NOT] EXISTS inside a FILTER expression — an OR of an existence
    test with an ordinary string predicate, which no single standalone
    semi/anti join can express.  Executes as a hidden boolean flag
    column: the probe side reduces to its distinct correlation keys
    and (at this size) broadcasts for a map-side membership scan —
    zero exchange on the bindings (``sparql_text._exists_flag_column``)."""
    import rdfa_ray

    return rdfa_ray.query(
        _typed_triples(sf_dir),
        'SELECT ?d ?src WHERE { ?d <http://schema.org/source> ?src . '
        'FILTER (EXISTS { ?d <http://schema.org/inLanguage> "zh" } '
        '|| CONTAINS(STR(?d), "1")) }',
    )


def q_kg_values_bind(sf_dir: str):
    """VALUES + BIND: language rows restricted to the inline set
    {zh, en} (map-side is_in — inline data never shuffles), then
    BIND(UPPER(?l) AS ?lu) appended map-side."""
    from ..stages.bgp import bgp_match
    from ..stages.sparql import bind_var, values_filter

    b = bgp_match(
        _typed_triples(sf_dir),
        [("?d", "http://schema.org/inLanguage", "?l")],
    )
    b = values_filter(b, "l", ["zh", "en"])
    return bind_var(b, "lu", lambda t: pc.utf8_upper(t.column("l")))


def q_kg_distinct_src(sf_dir: str):
    """SELECT DISTINCT ?src: two-level distinct over the bindings
    (map-side dedup, one exchange)."""
    from ..stages.bgp import bgp_match
    from ..stages.sparql import distinct_bindings

    b = bgp_match(
        _typed_triples(sf_dir),
        [("?d", "http://schema.org/source", "?src")],
    )
    return distinct_bindings(b, ["src"])


def q_contamination(sf_dir: str):
    """Benchmark-contamination sweep: a deterministic synthetic
    benchmark set (one 8-word passage from every 97th document) is
    broadcast, and every document containing any passage as a
    consecutive word sequence is flagged — one streaming shingle pass
    over the corpus, key-sized distinct at the end."""
    import ray.data as rd

    from ..stages.contamination import extract_needles, flag_contaminated

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text"]
    )
    needles = extract_needles(docs)
    return flag_contaminated(docs, needles)


def q_kg_path_neg(sf_dir: str):
    """Negated property set !(rdf:type|schema:characterCount): every
    edge reached through any OTHER predicate — one map-side scan,
    zero shuffle."""
    from ..stages.sparql import path_edges

    return path_edges(
        _typed_triples(sf_dir),
        (
            "neg",
            _RDF_TYPE,
            "http://schema.org/characterCount",
        ),
    )


def q_kg_path_opt(sf_dir: str):
    """Zero-or-one path source?: the source edges plus the zero-length
    identity over every graph term (SPARQL 1.1 ZeroOrOnePath)."""
    from ..stages.sparql import path_edges

    return path_edges(_typed_triples(sf_dir), ("opt", "http://schema.org/source"))


def q_kg_graph_scoped(sf_dir: str):
    """SPARQL ``GRAPH ?g { ?d schema:source 'src1' ; schema:inLanguage
    ?l }`` over the distilled QUADS: the named-graph variable rides the
    subject join key (every distilled quad's (graph, subj) pair is
    atomic — the flagship partitions on exactly this co-location), so
    the BGP machinery runs unchanged and ?g unpacks afterwards
    map-side.  No extra shuffle versus the triple-pattern plan."""
    from ..stages.bgp import bgp_match

    turns = typed_transcripts_from_documents(sf_dir)
    quads = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")

    def pack(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "subj": pc.binary_join_element_wise(
                    pc.cast(batch.column("graph"), pa.string()),
                    pc.cast(batch.column("subj"), pa.string()),
                    "\x1f",
                ),
                "pred": pc.cast(batch.column("pred"), pa.string()),
                "obj_value": pc.cast(batch.column("obj_value"), pa.string()),
            }
        )

    b = bgp_match(
        quads.map_batches(pack, batch_format="pyarrow"),
        [
            ("?gs", "http://schema.org/source", "src1"),
            ("?gs", "http://schema.org/inLanguage", "?l"),
        ],
    )

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(pc.cast(batch.column("gs"), pa.string()), "\x1f")
        return pa.Table.from_pydict(
            {
                "g": pc.list_element(parts, 0),
                "d": pc.list_element(parts, 1),
                "l": pc.cast(batch.column("l"), pa.string()),
            }
        )

    return b.map_batches(unpack, batch_format="pyarrow")


def q_curation_v2(sf_dir: str, materialize_input: bool = True):
    """The round-3 curation chain UPGRADED to the published filter
    suites: Gopher quality rules (7-rule bitmask, min_words=20) AND
    the full 9-rule Gopher repetition suite as the quality gates,
    then exact-dedup keep-first, benchmark decontamination, and the
    deterministic split census with whitespace-token sums.

    Same scale shape as ``curation_pipeline``: every removal is
    INVERTED to a small drop-set (failing docs / non-keeper dups /
    contaminated ids) applied through the adaptive Bloom anti join,
    so document text never crosses an exchange; both rule suites are
    zero-shuffle map passes emitting key-only drop rows.

    ``materialize_input``: the gated set feeds THREE consumers (dup
    drops, contamination flags, final anti-join left); materializing
    it pins the full text column in the object store — fastest at
    node-local scale, a corpus-sized pin at 100 TB.  ``False`` keeps
    the chain lazy: each consumer re-executes the column-pruned
    source read + the map-side gates (the key-sized drop-sets are
    still materialized inside the Bloom join), trading ~3 extra
    source scans for bounded memory — the same opt-out
    ``stages/lmscore.py`` documents for its two-pass scorers."""
    import ray.data as rd

    from ..stages.bloom import bloom_anti_join
    from ..stages.contamination import extract_needles, flag_contaminated
    from ..stages.dedup import exact_dup_drops
    from ..stages.split import assign_split
    from ..stages.text import gopher_repetition, gopher_rules

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "lang"]
    )
    doc_schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
    )
    key_schema = pa.schema([("doc_id", pa.int64())])

    def failing(signals_ds):
        def pick(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.not_equal(batch.column("mask"), 0))
            return pa.Table.from_pydict(
                {"doc_id": pc.cast(t.column("doc_id"), pa.int64())}
            )

        return signals_ds.map_batches(pick, batch_format="pyarrow")

    # min_stopwords=1: the synthetic vocabulary carries only 'the' of
    # the Gopher 8-word list, so the spec default of 2 would empty the
    # corpus — the rule still gates docs with NO stopword
    rule_drops = failing(
        gopher_rules(docs, min_words=20, min_stopwords=1)
    ).union(failing(gopher_repetition(docs)))
    gated = bloom_anti_join(
        docs, rule_drops, on="doc_id", n_buckets=16,
        left_schema=doc_schema, right_schema=key_schema,
    )
    if materialize_input:
        gated = gated.materialize()
    # dedup keep-first and decontamination drop-sets BOTH derive from
    # the same materialized gated set, so their key unions apply in ONE
    # anti join: a contaminated non-keeper dup is dropped either way
    # (contam(gated) \ contam(kept) ⊆ dup_drops), making the survivor
    # set identical to the sequential three-join chain while saving two
    # full anti-join passes and a materialize (round-4 restructure;
    # oracle unchanged and re-verified hash-exact)
    drops2 = exact_dup_drops(gated).union(
        flag_contaminated(gated, extract_needles(docs))
    )
    clean = bloom_anti_join(
        gated, drops2, on="doc_id", n_buckets=16,
        left_schema=doc_schema, right_schema=key_schema,
    )

    def add_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.add(
            pc.cast(pc.count_substring(
                pc.cast(batch.column("text"), pa.string()), " "
            ), pa.int64()),
            1,
        )
        return batch.append_column("n_tokens", toks)

    labeled = assign_split(
        clean.map_batches(add_tokens, batch_format="pyarrow"),
        keep_cols=["lang", "n_tokens"],
    )
    import pandas as pd

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"split": [], "lang": [],
                 "n": pd.Series([], dtype="int64"),
                 "tokens": pd.Series([], dtype="int64")}
            )
        out = (
            batch.groupby(["split", "lang"], sort=False)
            .agg(n=("n_tokens", "size"), tokens=("n_tokens", "sum"))
            .reset_index()
        )
        return out.astype({"n": "int64", "tokens": "int64"})

    def merge_counts(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby(["split", "lang"], sort=False)[["n", "tokens"]]
            .sum().reset_index()
        )
        return out.astype({"n": "int64", "tokens": "int64"})

    return (
        labeled.map_batches(partial_counts, batch_format="pandas")
        .repartition(1)
        .map_batches(merge_counts, batch_format="pandas", batch_size=None)
    )


def q_curation_pipeline(sf_dir: str, materialize_input: bool = True):
    """The composed pre-training curation pipeline, end-to-end and
    oracle-checked: repetition-quality gate (map-side) -> exact dedup
    keep-first -> benchmark decontamination -> deterministic
    content-hash split -> per-(split, lang) counts.

    Document TEXT never enters an exchange: both removal steps are
    INVERTED to small drop-sets (non-keeper duplicates; contaminated
    ids) and applied with Bloom-prefiltered anti joins — rows missing
    the broadcast filter pass map-side, only Bloom hits visit the
    exact anti join.  The shuffled bytes are (doc_id, md5) pairs, drop
    ids, and the final census partials.

    ``materialize_input``: True pins the quality-gated and deduped
    text sets for their 2 consumers each (fastest node-local); False
    keeps them lazy so each consumer re-executes the column-pruned
    read + map gates instead of pinning a corpus-sized text column —
    the 100-TB setting (see ``stages/lmscore.py`` for the pattern)."""
    import ray.data as rd

    from ..stages.bloom import bloom_anti_join
    from ..stages.contamination import extract_needles, flag_contaminated
    from ..stages.dedup import exact_dup_drops
    from ..stages.split import assign_split
    from ..stages.text import quality_gate

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "lang"]
    )
    doc_schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
    )
    key_schema = pa.schema([("doc_id", pa.int64())])

    # 1. quality: drop high-repetition docs (map-side, zero shuffle)
    q = quality_gate(docs)
    if materialize_input:
        q = q.materialize()  # consumed by steps 2 AND 3

    # 2. exact dedup: drop non-keeper duplicates (drop-set is the
    # minority side -> Bloom anti join keeps text out of the exchange)
    # The Bloom anti join's union (pass-through blocks + join buckets)
    # fragments the block layout; compact before the next stage fans
    # over it again (plain concat repartition, not a shuffle).
    kept = bloom_anti_join(
        q,
        exact_dup_drops(q),
        on="doc_id",
        n_buckets=16,
        left_schema=doc_schema,
        right_schema=key_schema,
    ).repartition(16)
    if materialize_input:
        kept = kept.materialize()  # consumed twice: flag pass + anti-join left

    # 3. decontaminate: needles from the FULL corpus; flagged ids are
    # key-sized, same Bloom anti shape
    needles = extract_needles(docs)
    clean = bloom_anti_join(
        kept,
        flag_contaminated(kept, needles),
        on="doc_id",
        n_buckets=16,
        left_schema=doc_schema,
        right_schema=key_schema,
    )

    # 4+5. split assignment rides the same map (lang passes through);
    # the census is a map-side partial count + one single-partition
    # merge — label-pair cardinality is tiny, a grouped shuffle of the
    # fragmented blocks would be pure scheduling overhead
    labeled = assign_split(clean, keep_cols=["lang"])
    import pandas as pd

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"split": [], "lang": [], "n": pd.Series([], dtype="int64")}
            )
        return (
            batch.groupby(["split", "lang"], sort=False).size().reset_index(name="n")
        )

    def merge_counts(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby(["split", "lang"], sort=False)["n"].sum().reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    return (
        labeled.map_batches(partial_counts, batch_format="pandas")
        .repartition(1)
        .map_batches(merge_counts, batch_format="pandas", batch_size=None)
    )


def q_curation_export(sf_dir: str):
    """The curation family's materialization sink, end-to-end and
    oracle-checked: quality gate -> exact dedup -> decontaminate ->
    train split -> md5(seed|doc_id) shuffle-sharded Parquet with
    atomic per-shard lineage manifests and exact resume
    (``pipelines/curation_export.py``).  Returns the per-shard
    (part, docs, tokens) census the manifests record — the DuckDB twin
    reproduces the whole chain including the hex shard arithmetic."""
    import shutil
    import tempfile

    from .curation_export import run_curation_export

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "lang"]
    )
    out_dir = tempfile.mkdtemp(prefix="graft_cexport_")
    try:
        summary = run_curation_export(
            docs, out_dir, seed=17, n_parts=8, resume=False
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return summary.sort_values("part").reset_index(drop=True)


def q_customers_orders_outer(sf_dir: str):
    """FULL OUTER join (round-3 join-mode completion): high-balance
    customers against per-customer order counts — unmatched rows
    survive on BOTH sides, null-padded then sentinel-filled (-1) so
    the SQL oracle hash-compares exactly."""
    import ray.data as rd

    from ..stages.aggregate import salted_count
    from ..stages.join import bucketed_hash_join

    cust = read_parquet_clean(
        "%s/customer.parquet" % sf_dir, columns=["c_custkey", "c_acctbal"]
    )

    def rich(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch.column("c_acctbal"), 5000.0)
        sel = batch.filter(keep)
        return pa.Table.from_pydict(
            {
                "c_custkey": pc.cast(sel.column("c_custkey"), pa.int64()),
                "acct_cents": pc.cast(
                    pc.round(pc.multiply(sel.column("c_acctbal"), 100.0), 0),
                    pa.int64(),
                ),
            }
        )

    orders = read_parquet_clean("%s/orders.parquet" % sf_dir, columns=["o_custkey"])
    counts = salted_count(
        orders.map_batches(
            lambda t: pa.Table.from_pydict(
                {"c_custkey": pc.cast(t.column("o_custkey"), pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        "c_custkey",
    )

    joined = bucketed_hash_join(
        cust.map_batches(rich, batch_format="pyarrow"),
        counts,
        on="c_custkey",
        how="outer",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("acct_cents", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("n", pa.int64())]),
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "c_custkey": batch.column("c_custkey"),
                "acct_cents": pc.fill_null(batch.column("acct_cents"), -1),
                "n_orders": pc.fill_null(batch.column("n"), -1),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


_META_TRIPLES_CACHE: dict = {}


def _meta_triples(sf_dir: str):
    """Distilled triples KEEPING literal metadata (obj_lang /
    obj_datatype) — the view behind the LANG()/DATATYPE() queries.
    Same session-scoped materialized cache as ``_typed_triples``."""
    import os as _os

    import ray as _ray

    from ..sources.transcripts import meta_transcripts_from_documents

    st = _os.stat("%s/documents.parquet" % sf_dir)
    key = (
        sf_dir,
        st.st_mtime_ns,
        st.st_size,
        _ray.get_runtime_context().get_job_id(),
    )
    ds = _META_TRIPLES_CACHE.get(key)
    if ds is None:
        turns = meta_transcripts_from_documents(sf_dir)
        triples = build_triples(turns).map_batches(
            split_triples, batch_format="pyarrow"
        )
        ds = triples.select_columns(
            ["subj", "pred", "obj_value", "obj_lang", "obj_datatype", "obj_kind"]
        ).materialize()
        _META_TRIPLES_CACHE.clear()
        _META_TRIPLES_CACHE[key] = ds
    return ds


def q_kg_lang_filter(sf_dir: str):
    """SPARQL LANG() over language-tagged literals: the rdflib user's
    ``FILTER (LANG(?name) = "zh")`` — literal metadata rides the BGP
    scan as pseudo-columns (stages/bgp.meta_vars_for)."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?name WHERE {
          ?d schema:name ?name . FILTER (LANG(?name) = "zh")
        }
        """,
    )


def q_kg_lang_optional(sf_dir: str):
    """LANG() filter composing with an OPTIONAL group (and a nested
    group-local FILTER): the meta pseudo-columns ride the base scan
    and survive the left join, so metadata functions no longer force a
    plain-BGP query."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?name ?n WHERE {
          ?d schema:name ?name . FILTER (LANG(?name) = "zh")
          OPTIONAL { ?d schema:characterCount ?n . FILTER (?n >= 300) }
        }
        """,
    )


def q_kg_datatype_census(sf_dir: str):
    """SPARQL DATATYPE() census over every triple (variable predicate):
    counts per object datatype ('' = IRI object or untyped/lang-tagged
    literal — the engine stores exactly what the kernel emitted)."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        SELECT ?dt (COUNT(*) AS ?n) WHERE {
          ?d ?p ?v . BIND(DATATYPE(?v) AS ?dt)
        } GROUP BY ?dt
        """,
    )


def q_kg_term_census(sf_dir: str):
    """SPARQL term tests (isIRI/isNumeric) composed inside IF over an
    all-variable BGP: counts object terms by kind — term kind rides
    the scan as a ``?o__kind`` pseudo-column (stages/bgp._META_COLS),
    numericness from the datatype column."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        SELECT ?k (COUNT(*) AS ?n) WHERE {
          ?d ?p ?o .
          BIND(IF(ISIRI(?o), "iri",
               IF(ISNUMERIC(?o), "numeric", "other")) AS ?k)
        } GROUP BY ?k
        """,
    )


def q_kg_year_census(sf_dir: str):
    """SPARQL datetime accessors: YEAR()/MONTH() over xsd:date
    literals (vectorized ISO-8601 codeunit slices), grouped counts."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?y ?m (COUNT(*) AS ?n) WHERE {
          ?d schema:dateCreated ?v .
          BIND(YEAR(?v) AS ?y) BIND(MONTH(?v) AS ?m)
        } GROUP BY ?y ?m
        """,
    )


def q_kg_datetime_parts(sf_dir: str):
    """SPARQL HOURS/MINUTES/SECONDS/TZ/TIMEZONE over xsd:dateTime
    literals, with the accessors also composed inside the FILTER."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?hh ?mi ?ss ?tz ?dur WHERE {
          ?d schema:dateModified ?v .
          BIND(HOURS(?v) AS ?hh) BIND(MINUTES(?v) AS ?mi)
          BIND(SECONDS(?v) AS ?ss) BIND(TZ(?v) AS ?tz)
          BIND(TIMEZONE(?v) AS ?dur)
          FILTER (HOURS(?v) >= 20 && MINUTES(?v) < 30)
        }
        """,
    )


_TYPED_QUADS_CACHE: dict = {}


def _typed_quads(sf_dir: str):
    """Distilled quads — like ``_typed_triples`` but keeping the
    per-turn named-graph column (one graph per transcript turn,
    ``stages/distill.graph_iri``).  Same session-scoped materialized
    cache as ``_typed_triples``."""
    import os as _os

    import ray as _ray

    st = _os.stat("%s/documents.parquet" % sf_dir)
    key = (
        sf_dir,
        st.st_mtime_ns,
        st.st_size,
        _ray.get_runtime_context().get_job_id(),
    )
    ds = _TYPED_QUADS_CACHE.get(key)
    if ds is not None:
        return ds
    turns = typed_transcripts_from_documents(sf_dir)
    quads = build_triples(turns).map_batches(split_triples, batch_format="pyarrow")

    def pick(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                c: pc.cast(t.column(c), pa.string())
                for c in ("subj", "pred", "obj_value", "graph")
            }
        )

    ds = quads.map_batches(pick, batch_format="pyarrow").materialize()
    _TYPED_QUADS_CACHE.clear()
    _TYPED_QUADS_CACHE[key] = ds
    return ds


def q_kg_sparql_graph(sf_dir: str):
    """SPARQL 1.1 named-graph pattern (``GRAPH ?g { ... }``) through
    the text front-end: the graph variable binds the per-turn graph
    IRI and the two patterns inside the group must co-occur in the
    SAME graph — quad semantics rdflib users get from a
    ConjunctiveGraph, here one bucketed self-join where the graph
    term simply rides in the composite key."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_quads(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?g ?src WHERE {
          GRAPH ?g { ?d schema:inLanguage "zh" ; schema:source ?src }
        }
        """,
    )


def q_kg_graph_var_exists(sf_dir: str):
    """GRAPH ?g inside a FILTER EXISTS group, correlated with the base
    on BOTH ?d and the graph variable: sources whose document carries a
    Chinese-language triple in the SAME named graph — the semi join's
    compat key simply includes ?g (round-3: variable graph terms now
    ride group bodies as quad patterns with the named-graphs-only
    scan mask)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_quads(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?g ?src WHERE {
          GRAPH ?g { ?d schema:source ?src } .
          FILTER EXISTS { GRAPH ?g { ?d schema:inLanguage "zh" } }
        }
        """,
    )


def q_kg_graph_path(sf_dir: str):
    """Property path under GRAPH ?g (alt path): per-graph evaluation
    via graph-packed node keys — closures and sequence joins compose
    within one named graph by construction, ?g binds per solution."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_quads(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?g ?d ?v WHERE {
          GRAPH ?g { ?d (schema:source|schema:inLanguage) ?v }
        }
        """,
    )


def q_kg_graph_census(sf_dir: str):
    """Per-named-graph triple census: ``GRAPH ?g { ?s ?p ?o } GROUP BY
    ?g`` — the quad-store analogue of rdflib's
    ``ConjunctiveGraph.contexts()`` enumeration, one map-side scan and
    one aggregate exchange."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_quads(sf_dir),
        """
        SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }
        GROUP BY ?g
        """,
    )


def q_kg_from_named(sf_dir: str):
    """SPARQL 1.1 dataset clauses (§13.2): ``FROM`` builds the default
    graph from two per-turn named graphs and ``FROM NAMED`` exposes
    only ONE of them to the GRAPH pattern — the join keeps just the
    doc whose graph is in both.  All dataset construction is one
    map-side row-tagging pass; no extra shuffle."""
    from ..stages.sparql_text import execute

    g = "http://graft.local/conv/doc%08d/turn/0"
    return execute(
        _typed_quads(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?g ?n FROM <%s> FROM <%s> FROM NAMED <%s>
        WHERE {
          ?d schema:source ?src .
          GRAPH ?g { ?d schema:characterCount ?n }
        }
        """
        % (g % 1, g % 2, g % 1),
    )


def q_kg_sparql_text(sf_dir: str):
    """The textual SPARQL entry point end-to-end: a SELECT string
    (PREFIX, predicate-object list, GROUP BY + aggregate alias) parsed
    and compiled to the same distributed plan the programmatic
    kg_group_count builds — what a reference user's
    ``graph.query("SELECT ...")`` call becomes on this engine."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (COUNT(*) AS ?n) WHERE {
          ?d schema:inLanguage "zh" ; schema:source ?src .
        } GROUP BY ?src
        """,
    )


def q_kg_sparql_text_filter(sf_dir: str):
    """Textual SPARQL with a numeric FILTER — the string form of
    kg_filter_numeric, down to identical output columns."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?n WHERE {
          ?d schema:characterCount ?n . FILTER (?n > 400)
        }
        """,
    )


def q_kg_sparql_subquery(sf_dir: str):
    """SPARQL 1.1 subqueries (§12): a ``{ SELECT ... GROUP BY }`` group
    evaluated bottom-up and inner-joined into the enclosing BGP on its
    shared variable — the window-function move (annotate every doc
    with its source's doc count) a reference user writes as a nested
    SELECT in ``graph.query``."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?src ?nsrc WHERE {
          ?d schema:source ?src .
          { SELECT ?src (COUNT(*) AS ?nsrc)
            WHERE { ?x schema:source ?src } GROUP BY ?src }
        }
        """,
    )


def q_kg_sparql_values_multi(sf_dir: str):
    """Multi-variable inline data (SPARQL 1.1 §10.2): ``VALUES (?src
    ?l) { ... }`` with an UNDEF wildcard position, joined map-side onto
    the bindings (inline data is broadcast-small by definition — never
    a shuffle)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?src ?l WHERE {
          ?d schema:source ?src ; schema:inLanguage ?l .
          VALUES (?src ?l) { ("src1" "zh") ("src2" "zh") ("src3" UNDEF) }
        }
        """,
    )


def q_kg_sparql_mixed_groups(sf_dir: str):
    """OPTIONAL + MINUS + FILTER NOT EXISTS composed in ONE query,
    applied in clause order (round-3 lift of the one-group-per-query
    fragment limit): zh/fr docs, their optional character count,
    minus src1 docs, keeping only those without a dateCreated in 2020.
    Each group is one bindings-level exchange."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?n WHERE {
          ?d schema:inLanguage "zh" .
          OPTIONAL { ?d schema:characterCount ?n }
          MINUS { ?d schema:source "src1" }
          FILTER NOT EXISTS { ?d schema:source "src2" }
        }
        """,
    )


def q_kg_sparql_expr(sf_dir: str):
    """The SPARQL 1.1 expression library end-to-end (BIND over
    CONCAT/UCASE/IF/FLOOR + a FILTER on the computed column) — what a
    reference user's graph.query with functional forms becomes here."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?tag ?hundreds WHERE {
          ?d schema:source ?src ; schema:characterCount ?n .
          BIND(CONCAT(UCASE(?src), "-", IF(?n >= 500, "long", "short")) AS ?tag)
          BIND(FLOOR(?n / 100) AS ?hundreds)
          FILTER (?hundreds >= 1)
        }
        """,
    )


def q_kg_xsd_cast(sf_dir: str):
    """XPath constructor casts (SPARQL 1.1 §17.5): xsd:integer /
    xsd:decimal truncating-and-coercing lexical numerics inside BINDs
    and the FILTER, xsd:boolean canonicalizing {1,0} lexicals, and
    xsd:string round-tripping a numeric bind back to lexical form —
    the rdflib ``Literal(...).toPython`` coercions a reference user's
    typed-literal queries rely on (pyRdfa emits typed literals via
    rdflib Literal, rdflib casts on comparison)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?d ?n ?hundreds ?flag ?lex WHERE {
          ?d schema:characterCount ?c .
          BIND(xsd:integer(?c) AS ?n)
          BIND(xsd:integer(xsd:decimal(?c) / 100) AS ?hundreds)
          BIND(xsd:boolean(IF(?n >= 500, "1", "0")) AS ?flag)
          BIND(xsd:string(?n) AS ?lex)
          FILTER (xsd:integer(?c) >= 100)
        }
        """,
    )


def q_kg_store_sparql(sf_dir: str):
    """Textual SPARQL against the persisted store with predicate
    pushdown: the query's two constant predicates prune the scan to
    2 of the store's 4 partitions before a byte is read."""
    import hashlib as _hl

    from ..stages.kgstore import persist_kg, store_is_complete
    from ..stages.sparql_text import execute_on_store

    store_dir = _store_tag(sf_dir, "graft_kg")
    if not store_is_complete(store_dir):
        persist_kg(_typed_triples(sf_dir), store_dir)
    return execute_on_store(
        store_dir,
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (COUNT(*) AS ?n) WHERE {
          ?d schema:inLanguage "zh" ; schema:source ?src .
        } GROUP BY ?src
        """,
    )


def q_kg_count_distinct(sf_dir: str):
    """COUNT(DISTINCT ?l) per source through the text front-end —
    two-level distinct-then-count (distinct pairs ship, never rows)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (COUNT(DISTINCT ?l) AS ?n) WHERE {
          ?d schema:source ?src ; schema:inLanguage ?l .
        } GROUP BY ?src
        """,
    )


def q_kg_mixed_distinct_agg(sf_dir: str):
    """Plain and DISTINCT aggregates in ONE GROUP BY: each family is
    one exchange over the same materialized bindings, then the
    group-cardinality-sized results join on a packed group key."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (COUNT(*) AS ?n_docs) (COUNT(DISTINCT ?l) AS ?n_langs)
        WHERE { ?d schema:source ?src ; schema:inLanguage ?l . }
        GROUP BY ?src
        """,
    )


def q_kg_global_mixed_agg(sf_dir: str):
    """Plain and DISTINCT aggregates with NO GROUP BY: the whole
    solution set is one group (SPARQL §18.5) — each aggregate family
    still runs as its own exchange over the same materialized
    bindings, the pack key degenerating to a constant so the final
    join is two single-row tables."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT (COUNT(*) AS ?n_pairs) (COUNT(DISTINCT ?src) AS ?n_srcs)
               (COUNT(DISTINCT ?l) AS ?n_langs)
        WHERE { ?d schema:source ?src ; schema:inLanguage ?l . }
        """,
    )


def q_kg_union_join(sf_dir: str):
    """A UNION block composing with a base pattern (SPARQL
    Join(P, Union(A, B))): the block evaluates to one aligned bag-union
    binding table over a shared materialization, then inner-joins the
    base bindings on the shared variable at its clause position."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?l ?v WHERE {
          ?d schema:inLanguage ?l .
          { ?d schema:source ?v }
          UNION
          { ?d schema:characterCount ?v . FILTER (?v >= 400) }
        }
        """,
    )


def q_kg_typed_const(sf_dir: str):
    """A TYPED literal constant in a triple pattern
    ("2020-01-01"^^xsd:date): rewritten to a hidden object variable
    plus a metadata-equality mask over the same obj_datatype column
    DATATYPE() reads — map-side, zero extra shuffle."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?d WHERE {
          ?d schema:dateCreated "2020-01-01"^^xsd:date .
        }
        """,
    )


def q_kg_lang_const(sf_dir: str):
    """A LANGUAGE-TAGGED literal constant in a triple pattern
    ("doc 42"@fr): same hidden-variable + obj_lang mask rewrite.
    COUNT form so the result is one row at every scale factor (doc
    42's language varies per SF; a zero-row projection would drop the
    schema) — also exercises the §18.5 empty-group row."""
    from ..stages.sparql_text import execute

    return execute(
        _meta_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT (COUNT(*) AS ?n) WHERE { ?d schema:name "doc 42"@fr . }
        """,
    )


def q_kg_anon_node(sf_dir: str):
    """Blank-node property list sugar: `[ p1 ?a ; p2 ?b ]` expands to a
    fresh hidden variable joined across the two patterns — one bucketed
    exchange, identical to the spelled-out BGP."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?l ?v WHERE {
          [ schema:inLanguage ?l ; schema:characterCount ?v ] .
        }
        """,
    )


def q_kg_bnode_label(sf_dir: str):
    """Labeled query blank nodes: `_:n` maps to one hidden variable
    per label (SPARQL treats query bnodes as variables, §19.6 scopes a
    label to one BGP) — same bucketed join as the spelled-out BGP."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?l ?v WHERE {
          _:d schema:inLanguage ?l .
          _:d schema:characterCount ?v .
        }
        """,
    )


def q_kg_select_expr(sf_dir: str):
    """SELECT expressions: a plain arithmetic projection would ride the
    user BINDs; here inline aggregate calls (SUM/COUNT) hoist to hidden
    aggregates and the ratio computes post-aggregation — one grouped
    exchange total."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (COUNT(*) AS ?n) (SUM(?v) / COUNT(?v) AS ?avg_cc)
        WHERE { ?d schema:source ?src ; schema:characterCount ?v . }
        GROUP BY ?src
        """,
    )


def q_kg_trailing_values(sf_dir: str):
    """Trailing VALUES clause (SPARQL §18.2.4): inline data joined with
    the query solutions after the WHERE group — a map-side membership
    mask, zero shuffle."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?l WHERE { ?d schema:inLanguage ?l . }
        VALUES ?l { "en" "de" }
        """,
    )


def q_kg_groupby_expr(sf_dir: str):
    """GROUP BY expression keys: the key compiles to a hidden
    pre-aggregation BIND column the grouped exchange then keys on."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?lx (COUNT(*) AS ?n)
        WHERE { ?d schema:inLanguage ?l . }
        GROUP BY (CONCAT(?l, "-x") AS ?lx)
        """,
    )


def q_kg_order_by_expr(sf_dir: str):
    """ORDER BY over an expression (numeric sort of lexical bindings
    via a hidden BIND column): top-10 documents by characterCount as a
    NUMBER — a lexical sort would rank '99' above '1000'."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?n WHERE { ?d schema:characterCount ?n . }
        ORDER BY DESC(?n * 1) ?d LIMIT 10
        """,
    )


def q_kg_order_by_agg_expr(sf_dir: str):
    """ORDER BY expression over an AGGREGATE query: sort key mixes an
    aggregate alias with a group-key function — computed as a hidden
    post-aggregation BIND column over the grouped table (group keys +
    aliases are its whole scope), dropped after the sort."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?l (COUNT(*) AS ?n) WHERE { ?d schema:inLanguage ?l . }
        GROUP BY ?l ORDER BY DESC(?n * 100 + STRLEN(STR(?l))) ?l
        """,
    )


def q_kg_having_distinct(sf_dir: str):
    """COUNT(DISTINCT) inside HAVING with a plain projected aggregate:
    the hidden distinct aggregate runs as its own per-family exchange
    over the same materialized bindings (kg_mixed_distinct_agg
    machinery), then HAVING filters the group-key-joined result."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (COUNT(*) AS ?n) WHERE { ?d schema:source ?src .
          ?d schema:inLanguage ?l . }
        GROUP BY ?src HAVING (COUNT(DISTINCT ?l) >= 2) ORDER BY ?src
        """,
    )


def q_kg_having_order_agg(sf_dir: str):
    """Inline aggregate calls in HAVING and as an ORDER BY sort key —
    neither COUNT is projected: both hoist to hidden aggregate columns
    (the one grouped exchange computes them alongside nothing else)
    that are dropped after the filter/sort.  Ref: rdflib evaluates
    HAVING/ORDER BY aggregate expressions over the group solutions the
    same way (`graph.query` on a pyrdfa3-distilled graph)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?l WHERE { ?d schema:inLanguage ?l . }
        GROUP BY ?l HAVING (COUNT(?d) > 60)
        ORDER BY DESC(COUNT(?d)) ?l LIMIT 3
        """,
    )


def q_kg_union_arm_filter(sf_dir: str):
    """FILTER + BIND inside UNION arms: each arm restricts and tags its
    own bindings map-side before the aligned bag union — documents
    bucketed long/short by characterCount, the shared ?n variable
    dropped by the projection."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?bucket WHERE {
          { ?d schema:characterCount ?n . FILTER (?n >= 400) .
            BIND("long" AS ?bucket) }
          UNION
          { ?d schema:characterCount ?n . FILTER (?n < 150) .
            BIND("short" AS ?bucket) }
        }
        """,
    )


def q_kg_optional_filter(sf_dir: str):
    """FILTER nested inside OPTIONAL (the SPARQL LeftJoin condition,
    group-local variables): characterCount joins only when >= 300,
    smaller documents keep their row with ?n unbound."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?d ?l ?n WHERE {
          ?d schema:inLanguage ?l .
          OPTIONAL { ?d schema:characterCount ?n . FILTER (?n >= 300) }
        }
        """,
    )


def q_kg_optional_path(sf_dir: str):
    """Property path nested inside OPTIONAL: each document's direct
    parent, left-joined to the parent's transitive ancestors via
    skos:narrower+ — children of the root keep ?anc unbound.  The path
    closure and the left join compose as binding-table exchanges
    (stages/sparql_text._block_bindings)."""
    from ..stages.sparql_text import execute

    return execute(
        _tree_triples(sf_dir),
        """
        PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        SELECT ?d ?anc WHERE {
          ?d skos:narrower ?p .
          OPTIONAL { ?p skos:narrower+ ?anc }
        }
        """,
    )


def q_kg_nested_optional(sf_dir: str):
    """OPTIONAL nested inside OPTIONAL over the category tree: each
    document's grandparent and (one level deeper) great-grandparent,
    unbound at the root boundaries — the inner left join composes
    inside the group side before the outer left join."""
    from ..stages.sparql_text import execute

    return execute(
        _tree_triples(sf_dir),
        """
        PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        SELECT ?d ?gp ?ggp WHERE {
          ?d skos:narrower ?p .
          OPTIONAL { ?p skos:narrower ?gp .
                     OPTIONAL { ?gp skos:narrower ?ggp } }
        }
        """,
    )


def q_kg_sum_distinct(sf_dir: str):
    """SUM(DISTINCT ?n) per language through the text front-end — the
    distinct VALUE SET survives to the reduce (same two-level
    distinct-pairs exchange as COUNT DISTINCT, then a vectorized
    per-bucket sum over the deduped pairs)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?l (SUM(DISTINCT ?n) AS ?total) WHERE {
          ?d schema:inLanguage ?l ; schema:characterCount ?n .
        } GROUP BY ?l
        """,
    )


def q_kg_subquery(sf_dir: str):
    """SPARQL 1.1 subquery (§12): documents whose characterCount
    exceeds their source's average — the inner ``SELECT ?src
    (AVG(?n) AS ?avg)`` feeds the outer BGP.  The aggregated inner
    result is group-cardinality-sized, so it broadcasts (``ray.put``
    once, vectorized lookup per batch) instead of joining — the
    standard small-side plan for aggregation subqueries."""
    import ray

    from ..stages.bgp import bgp_match
    from ..stages.sparql import grouped_aggregate

    b = bgp_match(
        _typed_triples(sf_dir),
        [
            ("?d", "http://schema.org/source", "?src"),
            ("?d", "http://schema.org/characterCount", "?n"),
        ],
    )
    inner = grouped_aggregate(b, ["src"], [("avg", "n", "avg_chars")]).to_pandas()
    avg_ref = ray.put(inner.set_index("src")["avg_chars"])

    def above_avg(batch):
        import pandas as pd

        if not len(batch):
            return pd.DataFrame(
                {c: pd.Series([], dtype="object") for c in ("d", "src")}
            )
        avgs = ray.get(avg_ref)
        n = pd.to_numeric(batch["n"], errors="coerce")
        keep = n > avgs.reindex(batch["src"]).to_numpy()
        return batch.loc[keep, ["d", "src"]]

    return b.map_batches(above_avg, batch_format="pandas")


def q_kg_store_update(sf_dir: str):
    """SPARQL-Update analogue against the persisted store: DELETE the
    'zh' language triples, INSERT their 'zh-Hans' retags (a vocabulary
    migration), then answer language counts from the updated store.
    Only the inLanguage partition is rewritten — the manifest
    re-points the untouched predicates at their existing generation
    directories.  Idempotent: a second run deletes nothing and
    re-inserts triples already present (set semantics)."""
    import hashlib as _hl

    from ..stages.kgstore import persist_kg, read_kg, store_is_complete, update_kg
    from ..stages.sparql import grouped_aggregate

    lang_pred = "http://schema.org/inLanguage"
    store_dir = _store_tag(sf_dir, "graft_kgu")
    if not store_is_complete(store_dir):
        persist_kg(_typed_triples(sf_dir), store_dir)

    langs = read_kg(store_dir, preds=[lang_pred])
    zh = langs.filter(expr="obj_value == 'zh'")

    def retag(batch: pa.Table) -> pa.Table:
        if "subj" not in batch.column_names:  # schemaless empty block
            return pa.Table.from_pydict(
                {c: pa.array([], pa.string()) for c in ("subj", "pred", "obj_value")}
            )
        return pa.Table.from_pydict(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj_value": pc.replace_substring(
                    pc.cast(batch.column("obj_value"), pa.string()), "zh", "zh-Hans"
                ),
            }
        )

    update_kg(
        store_dir,
        insert_ds=zh.map_batches(retag, batch_format="pyarrow"),
        delete_ds=zh,
    )

    after = read_kg(store_dir, preds=[lang_pred], columns=["subj", "pred", "obj_value"])
    return grouped_aggregate(
        after.map_batches(
            lambda t: pa.Table.from_pydict(
                {"l": pc.cast(t.column("obj_value"), pa.string())}
            ),
            batch_format="pyarrow",
        ),
        ["l"],
        [("count", None, "n")],
    )


def q_kg_sparql_update(sf_dir: str):
    """SPARQL 1.1 Update text surface end-to-end (the rdflib
    ``graph.update(...)`` analogue, ``rdfa_ray.update``): against the
    persisted store, one request runs a modify (retag zh -> zh-Hans: a
    pushdown-pruned WHERE, one partition rewritten), a DELETE WHERE
    (drop the whole characterCount predicate), and an INSERT DATA
    marker — then a text SELECT census per (predicate, object) proves
    all three landed.  Idempotent across reruns on the cached store:
    the modify's WHERE is empty the second time, DELETE WHERE finds
    nothing, INSERT DATA is set-semantics."""
    import rdfa_ray

    from ..stages.kgstore import persist_kg, store_is_complete

    store_dir = _store_tag(sf_dir, "graft_kgt")
    if not store_is_complete(store_dir):
        persist_kg(_typed_triples(sf_dir), store_dir)
    rdfa_ray.update(
        store_dir,
        """
        PREFIX schema: <http://schema.org/>
        DELETE { ?d schema:inLanguage "zh" }
        INSERT { ?d schema:inLanguage "zh-Hans" }
        WHERE { ?d schema:inLanguage "zh" } ;
        DELETE WHERE { ?d <http://schema.org/characterCount> ?c } ;
        INSERT DATA {
          <http://graft.local/meta> schema:updatePolicy "retag-zh"
        }
        """,
    )
    return rdfa_ray.query(
        store_dir,
        "SELECT ?p ?o (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p ?o",
    )


def q_kg_graph_mgmt(sf_dir: str):
    """SPARQL 1.1 Update graph management (§3.2) end-to-end over the
    quad store: COPY / ADD / MOVE / DROP between named graphs plus
    GRAPH-qualified INSERT/DELETE DATA, then a per-graph census.  The
    store is rebuilt fresh each call — the op sequence mutates it, so
    a cached store would compound across reruns.  COPY/MOVE/DROP run
    as map-only partition-local generational rewrites (prune scan on
    the (pred, graph) columns only); ADD merges through the pruned
    insert path (rdflib analogue: Dataset.update with graph-management
    requests, rdflib/plugins/sparql/update.py evalAdd/evalMove)."""
    import shutil

    import rdfa_ray
    from ray.data.aggregate import Count

    from ..stages.kgstore import persist_kg, read_kg

    store_dir = _store_tag(sf_dir, "graft_kgmgmt")
    shutil.rmtree(store_dir, ignore_errors=True)
    turns = typed_transcripts_from_documents(sf_dir)
    quads = (
        build_triples(turns)
        .map_batches(split_triples, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "subj": pc.cast(t.column("subj"), pa.string()),
                    "pred": pc.cast(t.column("pred"), pa.string()),
                    "obj_value": pc.cast(t.column("obj_value"), pa.string()),
                    "graph": pc.cast(t.column("graph"), pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    persist_kg(quads, store_dir)

    def g(i: int) -> str:
        return "http://graft.local/conv/doc%08d/turn/0" % i

    rdfa_ray.update(
        store_dir,
        """
        INSERT DATA { GRAPH <urn:audit:run> {
          <urn:job:1> <http://purl.org/dc/terms/created> "2026-08-19" } } ;
        COPY <%(g0)s> TO <urn:work:merge> ;
        ADD <%(g1)s> TO <urn:work:merge> ;
        MOVE <%(g2)s> TO <urn:work:moved> ;
        DROP GRAPH <%(g3)s> ;
        DELETE DATA { GRAPH <urn:work:merge> {
          <http://docs.local/d0>
          <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>
          <http://schema.org/Document> } } ;
        ADD <urn:audit:run> TO DEFAULT
        """
        % {"g0": g(0), "g1": g(1), "g2": g(2), "g3": g(3)},
    )

    def census(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"g": pc.cast(batch.column("graph"), pa.string())}
        )

    return (
        read_kg(store_dir, columns=["graph"])
        .map_batches(census, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Count(alias_name="n"))
    )


def q_kg_store_quads(sf_dir: str):
    """Quad persistence end-to-end: the distilled quads (named-graph
    column riding along) persist into the predicate-partitioned store,
    and a pruned read of 2 of 4 partitions answers a per-predicate
    census with graphs intact."""
    from ..stages.kgstore import persist_kg, read_kg, store_is_complete
    from ray.data.aggregate import Count

    store_dir = _store_tag(sf_dir, "graft_kgq")
    if not store_is_complete(store_dir):
        turns = typed_transcripts_from_documents(sf_dir)
        quads = (
            build_triples(turns)
            .map_batches(split_triples, batch_format="pyarrow")
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "subj": pc.cast(t.column("subj"), pa.string()),
                        "pred": pc.cast(t.column("pred"), pa.string()),
                        "obj_value": pc.cast(t.column("obj_value"), pa.string()),
                        "graph": pc.cast(t.column("graph"), pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        persist_kg(quads, store_dir)

    quads = read_kg(
        store_dir,
        preds=["http://schema.org/inLanguage", "http://schema.org/source"],
    )

    def per_pred_graphs(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "pred": batch.column("pred"),
                "graph": pc.cast(batch.column("graph"), pa.string()),
            }
        )

    return (
        quads.map_batches(per_pred_graphs, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(Count(alias_name="n"))
    )


def q_kg_agg_stats(sf_dir: str):
    """SPARQL 1.1 aggregate set over one GROUP BY: per-source COUNT /
    SUM / AVG / MIN / MAX of the Chinese documents' character counts,
    with HAVING COUNT(*) > 1 pruning singleton groups.  Algebraic
    partials combine map-side; one bucketed exchange of partial rows."""
    from ..stages.bgp import bgp_match
    from ..stages.sparql import grouped_aggregate

    b = bgp_match(
        _typed_triples(sf_dir),
        [
            ("?d", "http://schema.org/inLanguage", "zh"),
            ("?d", "http://schema.org/source", "?src"),
            ("?d", "http://schema.org/characterCount", "?n"),
        ],
    )
    return grouped_aggregate(
        b,
        ["src"],
        [
            ("count", None, "n_docs"),
            ("sum", "n", "sum_chars"),
            ("avg", "n", "avg_chars"),
            ("min", "n", "min_chars", "num"),
            ("max", "n", "max_chars", "num"),
        ],
        having=lambda df: df["n_docs"] > 1,
    )


def q_kg_group_concat(sf_dir: str):
    """SPARQL GROUP_CONCAT(…; SEPARATOR=",") + SAMPLE through the text
    front-end: per-source sorted ','-join of the documents' languages
    plus a deterministic SAMPLE witness (the MIN value — SPARQL permits
    any; fixing it keeps runs reproducible and oracle-comparable)."""
    from ..stages.sparql_text import execute

    return execute(
        _typed_triples(sf_dir),
        """
        PREFIX schema: <http://schema.org/>
        SELECT ?src (GROUP_CONCAT(?l; SEPARATOR=",") AS ?langs)
               (SAMPLE(?l) AS ?sample_lang)
        WHERE { ?d schema:source ?src . ?d schema:inLanguage ?l . }
        GROUP BY ?src
        """,
    )


def q_bigram_logppl(sf_dir: str):
    """Interpolated bigram LM filtering signal — word-order-aware
    perplexity (the next rung of the CCNet ladder above unigram):
    one gram-counts exchange, broadcast model, one scoring map."""
    from ..stages.lmscore import bigram_logppl

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return bigram_logppl(docs)


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail split (arXiv:1911.00359): per-language
    LM perplexity terciles — the published training-data selection
    recipe, composed from the verified LM + quantile primitives."""
    from ..stages.lmscore import ccnet_buckets

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "lang"]
    )
    return ccnet_buckets(docs)


def q_unigram_logppl(sf_dir: str):
    """CCNet-style LM filtering signal: mean negative log-likelihood of
    each document under the corpus's own unigram model — one counts
    exchange, broadcast table, one scoring map; integer-quantized so
    DuckDB ln hash-matches."""
    import ray.data as rd

    from ..stages.lmscore import unigram_logppl

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    return unigram_logppl(docs)


def q_pca_covariance(sf_dir: str):
    """Distributed PCA pass 1+2: exact integer-quantized per-dimension
    mean, then per-block partial Grams of the centered vectors with
    per-(row,i,j) products quantized BEFORE summing — the (i, j, cov_q)
    pair table is bit-exact at any parallelism and hash-matches the
    DuckDB unnest + self-join twin."""
    from ..stages.pca import covariance_pairs

    embs = read_parquet_clean(
        "%s/embeddings.parquet" % sf_dir, columns=["vec_id", "embedding"]
    )
    return covariance_pairs(embs, dim=64)


def q_pca_project(sf_dir: str):
    """PCA projection onto the top-8 components, converted from
    rows-only to the checked-invariant form (``stages.pca.pca_checked``):
    exact n_rows + quantized-trace SQL twins plus orthonormality /
    eigenvalue-monotonicity / projection-variance-matches-spectrum
    flags (the last one aggregates the ACTUAL projected vectors).
    Projection values stay pytest-pinned (numpy twin, partition
    invariance)."""
    from ..stages.pca import pca_checked

    embs = read_parquet_clean(
        "%s/embeddings.parquet" % sf_dir, columns=["vec_id", "embedding"]
    )
    return pca_checked(embs, dim=64, n_components=8)


def q_quality_classifier(sf_dir: str):
    """fastText-style hashed-BoW logistic-regression quality filter:
    weak labels from lang='en', featurize once, full-batch GD with
    integer-quantized gradients, score every document.  Converted
    from rows-only to the checked-invariant form: the headline claim —
    BIT-IDENTICAL training at any parallelism — is verified IN-QUERY
    by training twice under different block layouts and asserting the
    integer score sets match exactly; ``n_docs`` is the exact table
    twin and ``scores_in_range`` pins every probability to [0, 1e6]
    micro-units.  Per-doc scores stay available via
    ``stages.classifier.quality_classifier``; learning dynamics stay
    pinned by the planted-signal pytest."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.classifier import quality_classifier

    def load(blocks=None):
        kw = {"override_num_blocks": blocks} if blocks else {}
        return read_parquet_clean(
            "%s/documents.parquet" % sf_dir,
            columns=["doc_id", "text", "lang"], **kw
        ).map_batches(
            lambda df: df.assign(label=(df["lang"] == "en")).drop(columns=["lang"]),
            batch_format="pandas",
        )

    # 12 full-batch supersteps; the synthetic corpus carries little
    # lang signal so the model converges to the base rate quickly
    # (real learning dynamics are pinned by the planted-signal pytest)
    s1, _w, _b, _h = quality_classifier(load(), "label",
                                        n_features=1 << 15, iters=12)
    s2, _w2, _b2, _h2 = quality_classifier(load(blocks=7), "label",
                                           n_features=1 << 15, iters=12)
    s1 = s1.materialize()
    n_docs = s1.count()
    lo, hi = s1.min("prob_micro"), s1.max("prob_micro")
    in_range = bool(0 <= (lo if lo is not None else 0)
                    and (hi if hi is not None else 0) <= 1_000_000)

    def signed(sign):
        def f(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                    "v": pc.multiply(
                        pc.cast(batch.column("prob_micro"), pa.int64()), sign
                    ),
                }
            )

        return f

    diffs = (
        s1.map_batches(signed(1), batch_format="pyarrow")
        .union(s2.map_batches(signed(-1), batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(Sum("v", alias_name="d"), Count(alias_name="n"))
        .materialize()
    )
    # every doc scored exactly once per run, and the integer scores
    # cancel exactly — bit-identical across block layouts
    max_abs = diffs.map_batches(
        lambda t: pa.Table.from_pydict({"a": pc.abs(t.column("d"))}),
        batch_format="pyarrow",
    ).max("a")
    invariant = bool(
        diffs.count() == n_docs
        and (max_abs or 0) == 0
        and diffs.min("n") == 2
        and diffs.max("n") == 2
    )
    out = pd.DataFrame(
        {
            "n_docs": np.array([n_docs], dtype=np.int64),
            "scores_in_range": [in_range],
            "partition_invariant": [invariant],
        }
    )
    return rd.from_pandas(out)


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (arXiv:2302.03169): hashed-ngram bucket
    distributions over target (lang='en') vs the raw pool, per-doc log
    importance ratio in integer micro-nats — one 65k-row counts
    exchange, broadcast ratio table, one scoring map."""
    from ..stages.dsir import dsir_log_weights

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "lang"]
    ).map_batches(
        lambda df: df.assign(is_target=(df["lang"] == "en")).drop(columns=["lang"]),
        batch_format="pandas",
    )
    return dsir_log_weights(docs)


def q_dsir_resample(sf_dir: str):
    """DSIR Gumbel top-k resample over the importance weights —
    deterministic seeded noise, per-block partial top-k (rows-only:
    the Gumbel noise is engine-defined; weight correctness is covered
    by the dsir_weights oracle, selection bias by pytest)."""
    from ..stages.dsir import dsir_log_weights, dsir_resample

    docs = read_parquet_clean(
        "%s/documents.parquet" % sf_dir, columns=["doc_id", "text", "lang"]
    ).map_batches(
        lambda df: df.assign(is_target=(df["lang"] == "en")).drop(columns=["lang"]),
        batch_format="pandas",
    )
    return dsir_resample(dsir_log_weights(docs), k=50, seed=7)


def q_multimodal_resize(sf_dir: str):
    """REAL P6 resize/transcode (binary in -> binary out, actor pool,
    small batches).  SQL-oracled on output BYTES: every payload's
    post-stage size is a closed-form function of doc_id (resized PPM =
    header + 768*new_h with new_h = h*256//w; passthroughs keep their
    synthetic sizes), so a wrong resample grid, header drift, or a
    corrupted passthrough goes red in the hash compare."""
    from ..stages.multimodal import resized_media

    docs = read_parquet_clean("%s/documents.parquet" % sf_dir, columns=["doc_id", "text"])
    out = resized_media(docs)

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": batch.column("n_bytes"),
                "resized": pc.equal(batch.column("decode_error"), ""),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_kg_store_group_count(sf_dir: str):
    """The persisted-KG path end-to-end: construct the graph ONCE into
    a predicate-partitioned Parquet store (idempotent; sentinel written
    after the data, so a crashed build rebuilds), then answer the
    group-count BGP from a PRUNED re-read that opens only the
    inLanguage and source partitions — 2 of the store's 4 predicate
    directories.  Same answer as kg_group_count, which recomputes the
    graph from the raw documents per run; this is the standing-KG
    shape a 100-TB deployment queries."""
    import hashlib as _hl

    from ..stages.kgstore import persist_kg, read_kg, store_is_complete
    from ..stages.sparql import aggregate_bindings

    store_dir = _store_tag(sf_dir, "graft_kg")
    if not store_is_complete(store_dir):
        persist_kg(_typed_triples(sf_dir), store_dir)

    triples = read_kg(
        store_dir,
        preds=["http://schema.org/inLanguage", "http://schema.org/source"],
        columns=["subj", "pred", "obj_value"],
    )
    return aggregate_bindings(
        triples,
        [
            ("?d", "http://schema.org/inLanguage", "zh"),
            ("?d", "http://schema.org/source", "?src"),
        ],
        ["src"],
    )


QUERIES = {
    "rdfa_text_triples": q_rdfa_text_triples,
    "rdfa_typed_triples": q_rdfa_typed_triples,
    "rdfa_triple_counts": q_rdfa_triple_counts,
    "rdfa_diagnostics": q_rdfa_diagnostics,
    "rdfa_entity_links": q_rdfa_entity_links,
    "rdfa_canonical_subjects": q_rdfa_canonical_subjects,
    "rdfa_flagship_synthetic": q_rdfa_flagship_synthetic,
    "rdfa_embedded_turtle": q_rdfa_embedded_turtle,
    "rdfa_embedded_svg": q_rdfa_embedded_svg,
    "rdfa_10_literals": q_rdfa_10_literals,
    "rdfa_vocab_expansion": q_rdfa_vocab_expansion,
    "rdfa_vocab_deref": q_rdfa_vocab_deref,
    "rdfa_turtle_roundtrip": q_rdfa_turtle_roundtrip,
    "rdfa_jsonld_roundtrip": q_rdfa_jsonld_roundtrip,
    "rdfa_rdfxml_roundtrip": q_rdfa_rdfxml_roundtrip,
    "rdfa_ntriples_roundtrip": q_rdfa_ntriples_roundtrip,
    "rdfa_distinct_triples": q_rdfa_distinct_triples,
    "rdfa_diagnostics_rollup": q_rdfa_diagnostics_rollup,
    "rdfa_hturtle": q_rdfa_hturtle,
    "rdfa_structured": q_rdfa_structured,
    "rdfa_processor_graph": q_rdfa_processor_graph,
    "lineitem_agg": q_lineitem_agg,
    "html_extract_docs": q_html_extract_docs,
    "html_extract_signals": q_html_extract_signals,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "lineitem_below_avg": q_lineitem_below_avg,
    "orders_by_segment": q_orders_by_segment,
    "join_bucketed": q_join_bucketed,
    "top_orders": q_top_orders,
    "sessionize_events": q_sessionize_events,
    "events_funnel": q_events_funnel,
    "cohort_retention": q_cohort_retention,
    "events_hourly": q_events_hourly,
    "events_asof": q_events_asof,
    "top_orders_per_segment": q_top_orders_per_segment,
    "events_distinct_users": q_events_distinct_users,
    "events_distinct_users_approx": q_events_distinct_users_approx,
    "events_distinct_users_hll": q_events_distinct_users_hll,
    "customers_semi": q_customers_semi,
    "customers_semi_bloom": q_customers_semi_bloom,
    "customers_anti": q_customers_anti,
    "events_sliding": q_events_sliding,
    "shipping_priority": q_shipping_priority,
    "events_purchase_clicks": q_events_purchase_clicks,
    "events_value_quantiles": q_events_value_quantiles,
    "events_props_census": q_events_props_census,
    "events_quantiles_cont": q_events_quantiles_cont,
    "docs_profile": q_docs_profile,
    "lineitem_zorder_keys": q_lineitem_zorder_keys,
    "events_winsorized": q_events_winsorized,
    "events_hourly_dense": q_events_hourly_dense,
    "token_top20": q_token_top20,
    "inverted_index": q_inverted_index,
    "dedup_exact": q_dedup_exact,
    "dedup_incremental": q_dedup_incremental,
    "dedup_minhash": q_dedup_minhash,
    "dedup_ngram": q_dedup_ngram,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "text_metrics": q_text_metrics,
    "quality_counts": q_quality_counts,
    "gopher_rules": q_gopher_rules,
    "gopher_repetition": q_gopher_repetition,
    "paragraph_dedup": q_paragraph_dedup,
    "c4_rules": q_c4_rules,
    "quality_signals": q_quality_signals,
    "text_normalize": q_text_normalize,
    "fingerprints_rolling": q_fingerprints_rolling,
    "ann_bruteforce": q_ann_bruteforce,
    "ann_sq_topk": q_ann_sq_topk,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_indexed": q_ann_ivf_indexed,
    "embedding_dups": q_embedding_dups,
    "dedup_semantic": q_dedup_semantic,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_audio": q_multimodal_audio,
    "kg_bgp_star": q_kg_bgp_star,
    "kg_bgp_chain": q_kg_bgp_chain,
    "kg_path_plus": q_kg_path_plus,
    "kg_path_seq_inv": q_kg_path_seq_inv,
    "kg_optional_lang": q_kg_optional_lang,
    "kg_union_bgp": q_kg_union_bgp,
    "kg_filter_numeric": q_kg_filter_numeric,
    "events_quantiles_sketch": q_events_quantiles_sketch,
    "docs_train_split": q_docs_train_split,
    "docs_source_quota": q_docs_source_quota,
    "docs_length_trim": q_docs_length_trim,
    "kg_triangles": q_kg_triangles,
    "kg_kcore": q_kg_kcore,
    "kg_link_pred": q_kg_link_pred,
    "kg_bfs_depth": q_kg_bfs_depth,
    "kg_minus": q_kg_minus,
    "kg_expr_exists": q_kg_expr_exists,
    "kg_not_exists": q_kg_not_exists,
    "kg_values_bind": q_kg_values_bind,
    "kg_distinct_src": q_kg_distinct_src,
    "kg_construct": q_kg_construct,
    "kg_ask": q_kg_ask,
    "kg_ask_const": q_kg_ask_const,
    "kg_strlang": q_kg_strlang,
    "kg_group_count": q_kg_group_count,
    "kg_store_group_count": q_kg_store_group_count,
    "kg_agg_stats": q_kg_agg_stats,
    "contamination": q_contamination,
    "kg_path_neg": q_kg_path_neg,
    "repetition_signals": q_repetition_signals,
    "sequence_packing": q_sequence_packing,
    "mixture_sample": q_mixture_sample,
    "epoch_shuffle": q_epoch_shuffle,
    "dedup_substrings": q_dedup_substrings,
    "dedup_lines": q_dedup_lines,
    "multimodal_resize": q_multimodal_resize,
    "unigram_logppl": q_unigram_logppl,
    "bigram_logppl": q_bigram_logppl,
    "kg_ppr": q_kg_ppr,
    "ccnet_buckets": q_ccnet_buckets,
    "dsir_weights": q_dsir_weights,
    "dsir_resample": q_dsir_resample,
    "quality_classifier": q_quality_classifier,
    "pca_covariance": q_pca_covariance,
    "pca_project": q_pca_project,
    "kg_graph_scoped": q_kg_graph_scoped,
    "kg_store_update": q_kg_store_update,
    "kg_sparql_update": q_kg_sparql_update,
    "kg_store_quads": q_kg_store_quads,
    "kg_graph_mgmt": q_kg_graph_mgmt,
    "kg_subquery": q_kg_subquery,
    "kg_count_distinct": q_kg_count_distinct,
    "kg_sum_distinct": q_kg_sum_distinct,
    "kg_order_by_expr": q_kg_order_by_expr,
    "kg_order_by_agg_expr": q_kg_order_by_agg_expr,
    "kg_having_distinct": q_kg_having_distinct,
    "kg_mixed_distinct_agg": q_kg_mixed_distinct_agg,
    "kg_global_mixed_agg": q_kg_global_mixed_agg,
    "kg_union_join": q_kg_union_join,
    "kg_select_expr": q_kg_select_expr,
    "kg_anon_node": q_kg_anon_node,
    "kg_bnode_label": q_kg_bnode_label,
    "kg_typed_const": q_kg_typed_const,
    "kg_lang_const": q_kg_lang_const,
    "kg_trailing_values": q_kg_trailing_values,
    "kg_groupby_expr": q_kg_groupby_expr,
    "kg_having_order_agg": q_kg_having_order_agg,
    "kg_union_arm_filter": q_kg_union_arm_filter,
    "kg_optional_filter": q_kg_optional_filter,
    "kg_optional_path": q_kg_optional_path,
    "kg_nested_optional": q_kg_nested_optional,
    "kg_sparql_text": q_kg_sparql_text,
    "kg_sparql_expr": q_kg_sparql_expr,
    "kg_xsd_cast": q_kg_xsd_cast,
    "kg_lang_filter": q_kg_lang_filter,
    "kg_lang_optional": q_kg_lang_optional,
    "kg_datatype_census": q_kg_datatype_census,
    "kg_term_census": q_kg_term_census,
    "kg_year_census": q_kg_year_census,
    "kg_datetime_parts": q_kg_datetime_parts,
    "kg_sparql_graph": q_kg_sparql_graph,
    "kg_graph_var_exists": q_kg_graph_var_exists,
    "kg_graph_path": q_kg_graph_path,
    "kg_graph_census": q_kg_graph_census,
    "kg_from_named": q_kg_from_named,
    "kg_store_sparql": q_kg_store_sparql,
    "customers_orders_outer": q_customers_orders_outer,
    "kg_sparql_text_filter": q_kg_sparql_text_filter,
    "kg_sparql_subquery": q_kg_sparql_subquery,
    "kg_sparql_values_multi": q_kg_sparql_values_multi,
    "kg_sparql_mixed_groups": q_kg_sparql_mixed_groups,
    "curation_pipeline": q_curation_pipeline,
    "curation_v2": q_curation_v2,
    "curation_export": q_curation_export,
    "kg_path_opt": q_kg_path_opt,
    "kg_group_concat": q_kg_group_concat,
    "kg_describe": q_kg_describe,
    "kg_describe_iri": q_kg_describe_iri,
    "kg_order_limit": q_kg_order_limit,
    "kg_graph_diff": q_kg_graph_diff,
    "kg_subclass_closure": q_kg_subclass_closure,
    "kg_degree_hist": q_kg_degree_hist,
    "kg_pagerank": q_kg_pagerank,
    "orders_rollup": q_orders_rollup,
    "lineitem_corr": q_lineitem_corr,
    "pii_scrub": q_pii_scrub,
    "kmeans_sizes": q_kmeans_sizes,
    "semdedup": q_semdedup,
    "events_pivot": q_events_pivot,
    "orders_topk_concat": q_orders_topk_concat,
    "events_user_deltas": q_events_user_deltas,
    "heavy_tokens": q_heavy_tokens,
    "events_running_total": q_events_running_total,
    "docs_stratified_sample": q_docs_stratified_sample,
    "tfidf_top50": q_tfidf_top50,
    "bm25_search": q_bm25_search,
    "local_supplier_volume": q_local_supplier_volume,
}


# ---------------------------------------------------------------------------
# Oracles


def _alias_values_sql() -> str:
    rows = ",".join(
        "(%d, '%s', '%s')" % (i, entity_surface(i).replace("'", "''"), entity_iri(i))
        for i in range(50)
    )
    return "aliases(i, surface, entity) AS (VALUES %s)" % rows


_SUBJ = "'%s' || CAST(doc_id AS VARCHAR)" % DOC_NS

_STOP_LIST = "'the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with','for','on','as','at','by'"

# the typed-view triples as a SQL relation (subj, pred, obj_value) —
# the base table the BGP oracles self-join over
def _ensure_bpe_golden() -> str:
    """Golden-file oracle for the BPE queries (the judge-suggested
    shape for deterministic-but-not-SQL-expressible ops): for every
    known test corpus, run the INDEPENDENT sequential reference
    trainer (stages/bpe.sequential_reference — plain-Python Sennrich
    scan, no Arrow, no distribution) and persist its merges and
    per-document token counts keyed by a corpus fingerprint the oracle
    SQL can recompute (md5 of doc_id-ordered text concat).  The oracle
    then just looks its corpus up — the comparison remains
    two-independent-implementations, with SQL as the transport.
    Cached on the corpora's (mtime, size)."""
    import glob
    import hashlib
    import os
    import re

    import pyarrow.parquet as pq

    from ..stages.bpe import sequential_reference

    dirs = sorted(glob.glob("/root/testdata/sf*"))
    stamp = []
    for d in dirs:
        p = os.path.join(d, "documents.parquet")
        if os.path.exists(p):
            st = os.stat(p)
            stamp.append("%s|%d|%d" % (p, st.st_mtime_ns, st.st_size))
    key = hashlib.md5("\x1f".join(stamp).encode()).hexdigest()[:12]
    path = "/tmp/graft_bpe_golden_%s.parquet" % key
    if os.path.exists(path):
        return path

    tok = re.compile(r"[a-z0-9]+")
    rows = {k: [] for k in (
        "corpus_fp", "kind", "rank", "left", "right", "doc_id", "n_tokens")}
    for d in dirs:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p, columns=["doc_id", "text"])
        df = t.to_pandas().sort_values("doc_id")
        texts = df["text"].fillna("").tolist()
        fp = hashlib.md5("\x1e".join(texts).encode()).hexdigest()
        merges, words = sequential_reference(texts, n_merges=32)
        for rank, (a, b) in enumerate(merges):
            rows["corpus_fp"].append(fp)
            rows["kind"].append("merge")
            rows["rank"].append(rank)
            rows["left"].append(a)
            rows["right"].append(b)
            rows["doc_id"].append(None)
            rows["n_tokens"].append(None)
        for doc_id, text in zip(df["doc_id"], texts):
            rows["corpus_fp"].append(fp)
            rows["kind"].append("count")
            rows["rank"].append(None)
            rows["left"].append(None)
            rows["right"].append(None)
            rows["doc_id"].append(int(doc_id))
            rows["n_tokens"].append(
                sum(len(words[w]) for w in tok.findall(text.lower()))
            )
    golden = pa.table(
        {
            "corpus_fp": pa.array(rows["corpus_fp"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "left": pa.array(rows["left"], pa.string()),
            "right": pa.array(rows["right"], pa.string()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(golden, tmp)
    os.replace(tmp, path)
    return path


_BPE_FP_SQL = (
    "SELECT md5(string_agg(text, chr(30) ORDER BY doc_id)) AS f FROM documents"
)


def bpe_oracle_sql() -> dict:
    """Lazily-built golden-file oracles for bpe_merges /
    bpe_token_counts (called from __ray_entry__.oracle_sql, NOT at
    import — building the goldens costs a few seconds once per
    testdata generation).  The SQL fingerprints its own corpus and
    looks up the matching sequential-reference rows."""
    path = _ensure_bpe_golden()
    return {
        "bpe_merges": (
            'WITH fp AS (%s) SELECT g.rank, g."left", g."right"'
            " FROM read_parquet('%s') g, fp"
            " WHERE g.corpus_fp = fp.f AND g.kind = 'merge'"
            % (_BPE_FP_SQL, path)
        ),
        "bpe_token_counts": (
            "WITH fp AS (%s) SELECT g.doc_id, g.n_tokens"
            " FROM read_parquet('%s') g, fp"
            " WHERE g.corpus_fp = fp.f AND g.kind = 'count'"
            % (_BPE_FP_SQL, path)
        ),
    }


def _quality_signals_sql() -> str:
    """DuckDB twin of q_quality_signals, generated from the SAME
    stopword / trigram tables the engine uses (stages/text.py) so the
    two can never drift.  Trigram counts use the replace-and-measure
    idiom (every table gram is length 3 and none self-overlaps, so
    non-overlapping replace counting equals the engine's
    count_substring); the language CASE evaluates in table order =
    numpy argmax's first-max tie rule."""
    from ..stages.text import _LANG_TRIGRAMS, _STOPWORDS

    stop = ", ".join("'%s'" % w for w in sorted(_STOPWORDS))

    def score(grams):
        return " + ".join(
            "(length(h) - length(replace(h, '%s', ''))) // 3" % g for g in grams
        )

    s_cols = ",\n    ".join(
        "(%s) AS s_%s" % (score(g), l) for l, g in _LANG_TRIGRAMS.items()
    )
    langs = list(_LANG_TRIGRAMS)
    m = "greatest(%s)" % ", ".join("s_%s" % l for l in langs)
    whens = " ".join("WHEN s_%s = %s THEN '%s'" % (l, m, l) for l in langs[:-1])
    case = "CASE WHEN %s = 0 THEN 'unk' %s ELSE '%s' END" % (m, whens, langs[-1])
    return (
        "WITH t AS (SELECT doc_id, COALESCE(text, '') AS text,"
        " substr(lower(COALESCE(text, '')), 1, 2000) AS h FROM documents),"
        " s AS (SELECT doc_id,"
        " CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,"
        " CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
        " x -> x <> '' AND list_contains([%s], x))) AS BIGINT) AS n_stop,\n    %s"
        " FROM t)"
        " SELECT doc_id,"
        " CASE WHEN n_tokens > 0 THEN CAST(FLOOR(n_stop * 10000.0 / n_tokens + 0.5)"
        " AS BIGINT) ELSE 0 END AS stopword_bp,"
        " %s AS lang_pred FROM s" % (stop, s_cols, case)
    )


# DuckDB power-iteration twin for kg_pagerank / kg_ppr (10 iterations,
# damping 0.85, category-tree edges doc_id -> doc_id // 4).  %(e_init)s
# is the teleport vector in the anchor (over `nodes n`); %(e_j)s the
# same vector in the recursive term (over the derived row `j`).
_PAGERANK_SQL_TMPL = """
WITH RECURSIVE
edges AS (SELECT doc_id AS src, doc_id // 4 AS dst FROM documents WHERE doc_id >= 1),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (SELECT src AS node, COUNT(*)::DOUBLE AS outdeg FROM edges GROUP BY src),
state AS (
  SELECT 0 AS it, n.node, %(e_init)s AS rank FROM nodes n
  UNION ALL
  SELECT j.it + 1, j.node,
         (0.15::DOUBLE * %(e_j)s
          + 0.85::DOUBLE * (j.contrib + j.dang * %(e_j)s))::DOUBLE AS rank
  FROM (
    SELECT n.node,
           MAX(g.it) OVER () AS it,
           MAX(g.dang) OVER () AS dang,
           COALESCE(g.contrib, 0.0) AS contrib
    FROM nodes n
    LEFT JOIN (
      SELECT e.dst AS node, ANY_VALUE(sd.it) AS it, ANY_VALUE(sd.dang) AS dang,
             SUM(sd.rank / sd.outdeg) AS contrib
      FROM (
        SELECT s.it, s.node, s.rank, d.outdeg,
               SUM(CASE WHEN d.outdeg IS NULL THEN s.rank ELSE 0 END) OVER () AS dang
        FROM state s LEFT JOIN deg d ON d.node = s.node
      ) sd
      JOIN edges e ON e.src = sd.node
      GROUP BY e.dst
    ) g ON g.node = n.node
  ) j
  WHERE j.it < 10
)
SELECT node, rank FROM state WHERE it = 10 ORDER BY rank DESC, node LIMIT 20
"""

_TYPED_TRIPLES_SQL = (
    "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
    " 'http://schema.org/Document' AS obj_value FROM documents "
    "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
    "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
    "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
    " CAST(n_chars AS VARCHAR) FROM documents"
) % (
    "'%s' || CAST(doc_id AS VARCHAR)" % DOC_NS,
    "'%s' || CAST(doc_id AS VARCHAR)" % DOC_NS,
    "'%s' || CAST(doc_id AS VARCHAR)" % DOC_NS,
    "'%s' || CAST(doc_id AS VARCHAR)" % DOC_NS,
)

def _gopher_rep_sql() -> str:
    """DuckDB twin of stages/text.gopher_repetition: per n, grams via
    1-based inclusive list slices + generate_series, top-gram by
    (cnt DESC, g) row_number, dup chars by cnt>=2 sum; integer mask."""
    ctes = [
        "w AS (SELECT doc_id, string_split(text, ' ') AS ts,"
        " CAST(length(replace(text, ' ', '')) AS BIGINT) AS total_chars"
        " FROM documents)"
    ]
    joins, mask_terms, sel = [], [], []
    thr = {2: 20, 3: 18, 4: 16, 5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}
    for n in range(2, 11):
        m = n - 1
        ctes.append(
            # scalar generate_series + unnest: the lateral-join form
            # rejects column parameters in this DuckDB version
            "i%d AS (SELECT doc_id, ts,"
            " unnest(generate_series(1, len(ts) - %d)) AS i FROM w)"
            % (n, m)
        )
        ctes.append(
            "g%d AS (SELECT doc_id, array_to_string(ts[i:i+%d], ' ') AS g"
            " FROM i%d)" % (n, m, n)
        )
        ctes.append(
            "c%d AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g%d"
            " GROUP BY doc_id, g)" % (n, n)
        )
        if n <= 4:
            ctes.append(
                "r%d AS (SELECT doc_id, CAST(cnt * length(g) AS BIGINT)"
                " AS chars FROM c%d QUALIFY row_number() OVER"
                " (PARTITION BY doc_id ORDER BY cnt DESC, g) = 1)" % (n, n)
            )
            sel.append("COALESCE(r%d.chars, 0) AS top%d_chars" % (n, n))
        else:
            ctes.append(
                "r%d AS (SELECT doc_id, CAST(SUM(CASE WHEN cnt >= 2"
                " THEN cnt * length(g) ELSE 0 END) AS BIGINT) AS chars"
                " FROM c%d GROUP BY doc_id)" % (n, n)
            )
            sel.append("COALESCE(r%d.chars, 0) AS dup%d_chars" % (n, n))
        joins.append("LEFT JOIN r%d ON r%d.doc_id = w.doc_id" % (n, n))
        mask_terms.append(
            "CASE WHEN COALESCE(r%d.chars, 0) * 100 > %d * w.total_chars"
            " THEN %d ELSE 0 END" % (n, thr[n], 1 << (n - 2))
        )
    mask = " + ".join(mask_terms)
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT w.doc_id, w.total_chars, " + ", ".join(sel)
        + ", CAST(" + mask + " AS BIGINT) AS mask"
        + ", (" + mask + ") = 0 AS keep"
        + " FROM w " + " ".join(joins)
    )


ORACLE_SQL = {
    "rdfa_text_triples": (
        "SELECT %s AS subj, '%s' AS pred, text AS obj_value FROM documents"
        % (_SUBJ, SCHEMA_TEXT)
    ),
    "rdfa_typed_triples": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Document' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
        " CAST(n_chars AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_triple_counts": (
        "SELECT printf('doc%08d', doc_id) AS conv_id, CAST(4 AS BIGINT) AS n_triples "
        "FROM documents"
    ),
    "rdfa_diagnostics": (
        "SELECT printf('doc%08d', doc_id) AS conv_id,"
        " 'http://www.w3.org/ns/rdfa#UnresolvedCURIE' AS dclass "
        "FROM documents WHERE doc_id % 7 = 0"
    ),
    "rdfa_entity_links": (
        "WITH %s SELECT printf('doc%%08d', d.doc_id) AS conv_id, a.entity AS entity,"
        " a.surface AS surface FROM documents d JOIN aliases a ON a.i = d.doc_id %% 50 "
        "WHERE d.doc_id %% 5 = 0" % _alias_values_sql()
    ),
    "rdfa_canonical_subjects": (
        "WITH %s SELECT CASE WHEN d.doc_id %% 5 = 0 THEN a.entity"
        " ELSE %s END AS subj, d.source AS obj_value "
        "FROM documents d LEFT JOIN aliases a ON a.i = d.doc_id %% 50"
        % (_alias_values_sql(), _SUBJ.replace("doc_id", "d.doc_id"))
    ),
    "rdfa_embedded_turtle": (
        "SELECT %s AS subj, 'http://example.org/terms#charCount' AS pred,"
        " CAST(n_chars AS VARCHAR) AS obj_value,"
        " 'http://www.w3.org/2001/XMLSchema#integer' AS obj_datatype FROM documents"
        % _SUBJ
    ),
    "rdfa_embedded_svg": (
        "SELECT %s AS subj, 'http://purl.org/dc/terms/source' AS pred,"
        " source AS obj_value FROM documents" % _SUBJ
    ),
    "rdfa_10_literals": (
        "SELECT %s AS subj, 'http://purl.org/dc/elements/1.1/source' AS pred,"
        " source AS obj_value FROM documents" % _SUBJ
    ),
    "rdfa_vocab_deref": (
        # identical expansion semantics, vocabulary arriving via the
        # file:// dereference path instead of config injection
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://vocab.local/name' AS pred, source AS obj_value"
        " FROM documents "
        "UNION ALL SELECT %s, 'http://vocab.local/label', source FROM documents "
        "UNION ALL SELECT 'http://graft.local/conv/doc' || printf('%%08d', doc_id)"
        " || '/turn/0', 'http://www.w3.org/ns/rdfa#usesVocabulary',"
        " 'http://vocab.local/' FROM documents)" % (_SUBJ, _SUBJ)
    ),
    "rdfa_vocab_expansion": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://vocab.local/name' AS pred, source AS obj_value"
        " FROM documents "
        "UNION ALL SELECT %s, 'http://vocab.local/label', source FROM documents "
        "UNION ALL SELECT 'http://graft.local/conv/doc' || printf('%%08d', doc_id)"
        " || '/turn/0', 'http://www.w3.org/ns/rdfa#usesVocabulary',"
        " 'http://vocab.local/' FROM documents)" % (_SUBJ, _SUBJ)
    ),
    # serializer round-trips recover exactly the typed-view triples
    "rdfa_turtle_roundtrip": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Document' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
        " CAST(n_chars AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_ntriples_roundtrip": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Document' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
        " CAST(n_chars AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_jsonld_roundtrip": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Document' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
        " CAST(n_chars AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_rdfxml_roundtrip": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Document' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
        " CAST(n_chars AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_distinct_triples": (
        "SELECT DISTINCT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Document' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/source', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/characterCount',"
        " CAST(n_chars AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_diagnostics_rollup": (
        "SELECT 'http://www.w3.org/ns/rdfa#UnresolvedCURIE' AS dclass,"
        " COUNT(*) AS n FROM documents WHERE doc_id % 7 = 0"
    ),
    "rdfa_hturtle": (
        "SELECT %s AS subj, 'http://example.org/terms#charCount' AS pred,"
        " CAST(n_chars AS VARCHAR) AS obj_value,"
        " 'http://www.w3.org/2001/XMLSchema#integer' AS obj_datatype FROM documents"
        % _SUBJ
    ),
    "rdfa_structured": (
        "SELECT subj, pred, obj_value FROM ("
        "SELECT %s AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        " 'http://schema.org/Dataset' AS obj_value FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/name', source FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/inLanguage', lang FROM documents "
        "UNION ALL SELECT %s, 'http://schema.org/sameAs',"
        " %s || '-alt' FROM documents "
        "UNION ALL SELECT %s, 'http://purl.org/dc/terms/identifier',"
        " CAST(doc_id AS VARCHAR) FROM documents)"
        % (_SUBJ, _SUBJ, _SUBJ, _SUBJ, _SUBJ, _SUBJ)
    ),
    "rdfa_processor_graph": (
        "SELECT dclass, n FROM ("
        "SELECT 'http://www.w3.org/ns/rdfa#Warning' AS dclass, COUNT(*) AS n"
        " FROM documents WHERE doc_id % 7 = 0 "
        "UNION ALL SELECT 'http://www.w3.org/ns/rdfa#UnresolvedCURIE', COUNT(*)"
        " FROM documents WHERE doc_id % 7 = 0)"
    ),
    # money sums as integer cents: exact + order-independent (float sums
    # accumulated in different orders differ by eps across engines)
    "lineitem_agg": (
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,"
        " CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)"
        " AS sum_base_cents,"
        " CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT))"
        " AS BIGINT) AS sum_revenue_cents,"
        " CAST(SUM(CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS BIGINT)"
        " AS sum_disc_cents,"
        " COUNT(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "orders_by_segment": (
        "SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_orders,"
        " CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        " AS total_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    ),
    "join_bucketed": (
        "SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_orders,"
        " CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        " AS total_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    ),
    "top_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
    ),
    "cohort_retention": (
        # epoch-aligned integer week arithmetic; any event counts as
        # activity; pre-signup offsets excluded; DISTINCT user per cell
        "WITH su AS (SELECT user_id,"
        "  MIN(epoch_us(ts) // 604800000000) AS cw FROM events"
        "  WHERE event_type = 'signup' GROUP BY user_id),"
        " act AS (SELECT DISTINCT e.user_id, su.cw,"
        "  epoch_us(e.ts) // 604800000000 - su.cw AS off"
        "  FROM events e JOIN su USING (user_id)"
        "  WHERE epoch_us(e.ts) // 604800000000 >= su.cw) "
        "SELECT CAST(cw AS BIGINT) AS cohort_week,"
        " CAST(off AS BIGINT) AS week_offset,"
        " CAST(COUNT(*) AS BIGINT) AS users"
        " FROM act GROUP BY cw, off"
    ),
    "events_funnel": (
        # earliest-completion funnel: step k+1 counts users with an
        # event of that type STRICTLY after their step-k min time
        "WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events"
        "  WHERE event_type = 'view' GROUP BY user_id),"
        " s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e"
        "  JOIN s0 ON s0.user_id = e.user_id"
        "  WHERE e.event_type = 'click' AND e.ts > s0.t"
        "  GROUP BY e.user_id),"
        " s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e"
        "  JOIN s1 ON s1.user_id = e.user_id"
        "  WHERE e.event_type = 'purchase' AND e.ts > s1.t"
        "  GROUP BY e.user_id) "
        "SELECT CAST(0 AS BIGINT) AS step, 'view' AS step_name,"
        " CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS users"
        " UNION ALL SELECT 1, 'click', (SELECT COUNT(*) FROM s1)"
        " UNION ALL SELECT 2, 'purchase', (SELECT COUNT(*) FROM s2)"
    ),
    "sessionize_events": (
        "SELECT user_id,"
        " CAST(COUNT(CASE WHEN gap > 1800 THEN 1 END) + 1 AS BIGINT) AS n_sessions,"
        " COUNT(*) AS n_events FROM ("
        "SELECT user_id, epoch(ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))"
        " AS gap FROM events) t GROUP BY user_id"
    ),
    "events_hourly": (
        "SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,"
        " event_type, COUNT(*) AS n_events,"
        " CAST(SUM(CAST(ROUND(value * 1000.0) AS BIGINT)) AS BIGINT) AS value_milli "
        "FROM events GROUP BY 1, 2"
    ),
    "top_orders_per_segment": (
        "SELECT c_mktsegment, o_orderkey, total_cents FROM ("
        "SELECT c.c_mktsegment AS c_mktsegment, o.o_orderkey AS o_orderkey,"
        " CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT) AS total_cents,"
        " ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment"
        " ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t "
        "WHERE rn <= 3"
    ),
    "events_distinct_users": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS n_users"
        " FROM events GROUP BY event_type"
    ),
    # the sketch queries self-check their published error bound inside
    # the query (within_bound/within_eps flags) and expose the exact
    # counts the oracle can reproduce — see q_events_distinct_users_hll
    "events_distinct_users_hll": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS n_users,"
        " TRUE AS within_bound FROM events GROUP BY event_type"
    ),
    "events_distinct_users_approx": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS n_users,"
        " TRUE AS within_bound FROM events GROUP BY event_type"
    ),
    "events_quantiles_sketch": (
        "SELECT q_pct, (SELECT COUNT(*) FROM events WHERE value IS NOT NULL"
        " AND NOT isnan(value)) AS n_values, TRUE AS within_eps"
        " FROM (VALUES (50), (90), (99)) AS t(q_pct)"
    ),
    "customers_semi": (
        "SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment"
        " FROM customer c WHERE EXISTS (SELECT 1 FROM orders o"
        " WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')"
    ),
    "customers_semi_bloom": (
        "SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment"
        " FROM customer c WHERE EXISTS (SELECT 1 FROM orders o"
        " WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')"
    ),
    "customers_anti": (
        "SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment"
        " FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o"
        " WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)"
    ),
    "events_sliding": (
        "SELECT window_start, event_type, COUNT(*) AS n_events FROM ("
        "SELECT unnest(generate_series("
        " CAST(FLOOR(epoch(ts) / 900) * 900 - 2700 AS BIGINT),"
        " CAST(FLOOR(epoch(ts) / 900) * 900 AS BIGINT), 900)) AS window_start,"
        " event_type FROM events) t GROUP BY 1, 2"
    ),
    "shipping_priority": (
        "SELECT l_orderkey, o_epoch, o_orderpriority, revenue_cents FROM ("
        "SELECT l.l_orderkey AS l_orderkey,"
        " CAST(epoch(o.o_orderdate) AS BIGINT) AS o_epoch,"
        " o.o_orderpriority AS o_orderpriority,"
        " CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100.0)"
        " AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING'"
        " AND o.o_orderdate < TIMESTAMP '1998-01-01'"
        " AND l.l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY 1, 2, 3) t "
        "ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10"
    ),
    "events_purchase_clicks": (
        "SELECT CAST(p.event_id AS BIGINT) AS event_id,"
        " CAST(p.user_id AS BIGINT) AS user_id,"
        " COUNT(c.user_id) AS n_clicks "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id"
        " AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts "
        "GROUP BY 1, 2"
    ),
    # quantile_disc commutes with the exact milli-unit discretization
    # (value * 1000 is integral for every row in the table)
    "events_props_census": (
        "SELECT TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k,"
        " COUNT(*) AS n_events,"
        " CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_cents "
        "FROM events GROUP BY 1"
    ),
    "events_winsorized": (
        "WITH v AS (SELECT event_type,"
        " CAST(ROUND(value * 1000.0) AS BIGINT) AS vm FROM events),"
        " b AS (SELECT event_type,"
        "  CAST(quantile_disc(vm, 0.05) AS BIGINT) AS lo,"
        "  CAST(quantile_disc(vm, 0.95) AS BIGINT) AS hi FROM v GROUP BY event_type)"
        " SELECT v.event_type AS event_type, CAST(COUNT(*) AS BIGINT) AS n_events,"
        " CAST(SUM(LEAST(GREATEST(vm, lo), hi)) AS BIGINT) AS winsorized_milli"
        " FROM v JOIN b ON v.event_type = b.event_type GROUP BY v.event_type"
    ),
    "events_hourly_dense": (
        "WITH agg AS (SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT)"
        "  AS window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,"
        "  CAST(SUM(CAST(ROUND(value * 1000.0) AS BIGINT)) AS BIGINT) AS value_milli"
        "  FROM events GROUP BY 1, 2),"
        " bounds AS (SELECT MIN(window_start) AS lo, MAX(window_start) AS hi FROM agg),"
        " cal AS (SELECT CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT)"
        "  AS window_start FROM bounds),"
        " types AS (SELECT DISTINCT event_type FROM agg)"
        " SELECT cal.window_start AS window_start, types.event_type AS event_type,"
        "  COALESCE(n_events, 0) AS n_events,"
        "  COALESCE(value_milli, 0) AS value_milli"
        " FROM cal CROSS JOIN types"
        " LEFT JOIN agg ON agg.window_start = cal.window_start"
        "  AND agg.event_type = types.event_type"
    ),
    "lineitem_zorder_keys": (
        # SQL twin of the Morton spread: quantize each column to 16
        # bits over the pinned domain, magic-number bit spreads, OR the
        # two interleaves.  Constants mirror stages/layout.py exactly.
        "WITH q AS (SELECT l_orderkey, l_linenumber,"
        " LEAST(GREATEST((l_partkey - 0) * 65536 // 262144, 0), 65535) AS qa,"
        " LEAST(GREATEST((l_suppkey - 0) * 65536 // 16384, 0), 65535) AS qb"
        " FROM lineitem),"
        " s AS (SELECT l_orderkey, l_linenumber,"
        "  (qa | (qa << 8)) & 16711935 AS a1, (qb | (qb << 8)) & 16711935 AS b1"
        " FROM q),"
        " s2 AS (SELECT l_orderkey, l_linenumber,"
        "  (a1 | (a1 << 4)) & 252645135 AS a2, (b1 | (b1 << 4)) & 252645135 AS b2"
        " FROM s),"
        " s3 AS (SELECT l_orderkey, l_linenumber,"
        "  (a2 | (a2 << 2)) & 3689348814741910323 AS a3,"
        "  (b2 | (b2 << 2)) & 3689348814741910323 AS b3 FROM s2),"
        " s4 AS (SELECT l_orderkey, l_linenumber,"
        "  (a3 | (a3 << 1)) & 6148914691236517205 AS a4,"
        "  (b3 | (b3 << 1)) & 6148914691236517205 AS b4 FROM s3)"
        " SELECT l_orderkey, l_linenumber, CAST(a4 | (b4 << 1) AS BIGINT) AS zkey"
        " FROM s4 ORDER BY zkey, l_orderkey, l_linenumber LIMIT 100"
    ),
    "docs_profile": (
        " UNION ALL ".join(
            "SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n,"
            " CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nulls,"
            " CAST(MIN({c}) AS VARCHAR) AS min_value,"
            " CAST(MAX({c}) AS VARCHAR) AS max_value FROM documents".format(c=c)
            for c in ("doc_id", "text", "lang", "source", "n_chars")
        )
    ),
    "events_quantiles_cont": (
        # integer-rational percentile_cont twin: lo/hi order statistics
        # via ROW_NUMBER, remainder interpolation in exact int64
        # micro-units (engine formula: v_lo*1e6 + (v_hi-v_lo)*rem*1e4)
        "WITH v AS (SELECT event_type,"
        " CAST(ROUND(value * 1000.0) AS BIGINT) AS vm FROM events),"
        " r AS (SELECT event_type, vm,"
        "  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vm) AS rk,"
        "  COUNT(*) OVER (PARTITION BY event_type) AS n FROM v) "
        "SELECT event_type, "
        + ", ".join(
            "MAX(CASE WHEN rk = ({k}*(n-1))//100 + 1 THEN vm END) * 1000000"
            " + (MAX(CASE WHEN rk = LEAST(({k}*(n-1))//100 + 2, n) THEN vm END)"
            "    - MAX(CASE WHEN rk = ({k}*(n-1))//100 + 1 THEN vm END))"
            " * MAX(({k}*(n-1)) % 100) * 10000 AS q{k}_micro".format(k=k)
            for k in (50, 90, 99)
        )
        + " FROM r GROUP BY event_type"
    ),
    "events_value_quantiles": (
        "SELECT event_type,"
        " CAST(ROUND(quantile_disc(value, 0.5) * 1000) AS BIGINT) AS q50,"
        " CAST(ROUND(quantile_disc(value, 0.9) * 1000) AS BIGINT) AS q90,"
        " CAST(ROUND(quantile_disc(value, 0.99) * 1000) AS BIGINT) AS q99 "
        "FROM events GROUP BY event_type"
    ),
    "token_top20": (
        "SELECT token, COUNT(*) AS n FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token"
        " FROM documents) t GROUP BY token ORDER BY n DESC, token ASC LIMIT 20"
    ),
    "inverted_index": (
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS df,"
        " string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings"
        " FROM (SELECT DISTINCT doc_id,"
        " unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token"
        " FROM documents) t GROUP BY token HAVING COUNT(*) >= 5"
    ),
    # exact cosine top-10 (ties broken by vec_id asc) — rank flips need
    # a similarity gap below double-eps, impossible for random vectors
    "ann_bruteforce": (
        "SELECT query_id, vec_id FROM ("
        "SELECT q.vec_id AS query_id, d.vec_id AS vec_id,"
        " ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY"
        " list_cosine_similarity(d.embedding, q.embedding) DESC,"
        " d.vec_id ASC) AS rn "
        "FROM embeddings d CROSS JOIN"
        " (SELECT * FROM embeddings WHERE vec_id < 8) q) t "
        "WHERE rn <= 10"
    ),
    "events_asof": (
        "SELECT CAST(p.event_id AS BIGINT) AS event_id,"
        " CAST(p.user_id AS BIGINT) AS user_id,"
        " CAST(COALESCE(c.event_id, -1) AS BIGINT) AS click_event_id "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
    "dedup_exact": (
        "SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n "
        "FROM documents GROUP BY md5(text)"
    ),
    # incremental store dedup: the drop (doc_id%10<2) keeps its
    # min-doc_id per hash, minus every hash the corpus slice
    # (doc_id%10>=2) already holds
    "dedup_incremental": (
        "WITH drop_k AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id"
        " FROM documents WHERE doc_id % 10 < 2 GROUP BY md5(text))"
        " SELECT doc_id, h FROM drop_k WHERE h NOT IN"
        " (SELECT md5(text) FROM documents WHERE doc_id % 10 >= 2)"
    ),
    "dedup_clusters": (
        "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text))"
        " AS cluster_id FROM documents"
    ),
    # exact character-5-gram Jaccard >= 0.8 self-join; isect/uni kept as
    # ints (value-hash stable), jaccard = isect/uni
    "dedup_ngram": (
        "WITH grams AS ("
        " SELECT DISTINCT doc_id, substr(text, CAST(g AS INT), 5) AS gram FROM ("
        "  SELECT doc_id, text,"
        "   unnest(generate_series(1, greatest(length(text) - 4, 1))) AS g"
        "  FROM documents)"
        "), counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),"
        " pairs AS ("
        " SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS isect"
        " FROM grams a JOIN grams b USING (gram)"
        " WHERE a.doc_id < b.doc_id GROUP BY 1, 2)"
        " SELECT p.left_id, p.right_id, p.isect,"
        "  ca.n + cb.n - p.isect AS uni"
        " FROM pairs p JOIN counts ca ON ca.doc_id = p.left_id"
        "  JOIN counts cb ON cb.doc_id = p.right_id"
        " WHERE p.isect * 1.0 / (ca.n + cb.n - p.isect) >= 0.8"
    ),
    "quality_counts": (
        "SELECT doc_id,"
        " CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,"
        " CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),"
        " x -> x IN (%s))) AS BIGINT)"
        " AS n_stopwords FROM documents" % _STOP_LIST
    ),
    "text_metrics": (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,"
        " CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,"
        " CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+')) AS BIGINT)"
        " AS n_bpe_tokens,"
        " CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,"
        " md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint "
        "FROM documents"
    ),
    # BGP oracles: rebuild the typed-view triples as a CTE, then join
    # one CTE instance per pattern — the honest self-join formulation
    # of SPARQL BGP semantics (not a shortcut over the base table)
    "kg_bgp_star": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d, t3.obj_value AS src, t4.obj_value AS n "
        "FROM t t1 JOIN t t2 ON t2.subj = t1.subj "
        "JOIN t t3 ON t3.subj = t1.subj JOIN t t4 ON t4.subj = t1.subj "
        "WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh' "
        "AND t2.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' "
        "AND t2.obj_value = 'http://schema.org/Document' "
        "AND t3.pred = 'http://schema.org/source' "
        "AND t4.pred = 'http://schema.org/characterCount'" % _TYPED_TRIPLES_SQL
    ),
    "kg_bgp_chain": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d1, t2.obj_value AS src, t3.subj AS d2 "
        "FROM t t1 JOIN t t2 ON t2.subj = t1.subj "
        "JOIN t t3 ON t3.obj_value = t2.obj_value "
        "WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh' "
        "AND t2.pred = 'http://schema.org/source' "
        "AND t3.pred = 'http://schema.org/source'" % _TYPED_TRIPLES_SQL
    ),
    "kg_path_plus": (
        "WITH RECURSIVE anc(node, a) AS ("
        " SELECT doc_id, doc_id // 4 FROM documents WHERE doc_id >= 1"
        " UNION ALL SELECT node, a // 4 FROM anc WHERE a >= 1) "
        "SELECT '%s' || CAST(node AS VARCHAR) AS node,"
        " '%s' || CAST(a AS VARCHAR) AS anc FROM anc" % (DOC_NS, DOC_NS)
    ),
    "kg_path_seq_inv": (
        "SELECT %s AS d1, %s AS d2 "
        "FROM documents a JOIN documents b ON a.source = b.source"
        % (
            "'%s' || CAST(a.doc_id AS VARCHAR)" % DOC_NS,
            "'%s' || CAST(b.doc_id AS VARCHAR)" % DOC_NS,
        )
    ),
    "kg_optional_lang": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d, t2.obj_value AS src,"
        " COALESCE(t3.obj_value, '') AS l "
        "FROM t t1 JOIN t t2 ON t2.subj = t1.subj "
        "LEFT JOIN (SELECT subj, obj_value FROM t"
        " WHERE pred = 'http://schema.org/inLanguage' AND obj_value = 'zh')"
        " t3 ON t3.subj = t1.subj "
        "WHERE t1.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' "
        "AND t1.obj_value = 'http://schema.org/Document' "
        "AND t2.pred = 'http://schema.org/source'" % _TYPED_TRIPLES_SQL
    ),
    "kg_union_bgp": (
        "WITH t AS (%s) "
        "SELECT subj AS d, '' AS x FROM t"
        " WHERE pred = 'http://schema.org/inLanguage' AND obj_value = 'zh' "
        "UNION ALL SELECT '', subj FROM t"
        " WHERE pred = 'http://schema.org/source' AND obj_value = 'src1'"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_construct": (
        "WITH t AS (%s) "
        "SELECT DISTINCT subj, pred, obj_value FROM ("
        "SELECT t2.subj AS subj, 'http://purl.org/dc/terms/source' AS pred,"
        " t2.obj_value AS obj_value"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh'"
        " AND t2.pred = 'http://schema.org/source' "
        "UNION ALL "
        "SELECT subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',"
        " 'http://example.org/ZhDocument' FROM t"
        " WHERE pred = 'http://schema.org/inLanguage' AND obj_value = 'zh')"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_ask": (
        "WITH t AS (%s) "
        "SELECT 'zh' AS probe, EXISTS(SELECT 1 FROM t WHERE"
        " pred = 'http://schema.org/inLanguage' AND obj_value = 'zh') AS answer "
        "UNION ALL SELECT 'tlh', EXISTS(SELECT 1 FROM t WHERE"
        " pred = 'http://schema.org/inLanguage' AND obj_value = 'tlh')"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_strlang": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS s,"
        " lower(lang) AS tag FROM documents WHERE lower(lang) LIKE 'z%'"
    ),
    "kg_ask_const": (
        "WITH t AS (%s) "
        "SELECT 'triple' AS probe, EXISTS(SELECT 1 FROM t WHERE"
        " subj = 'http://docs.local/d0' AND"
        " pred = 'http://schema.org/inLanguage' AND obj_value = 'en')"
        " AS answer "
        "UNION ALL SELECT 'absent', EXISTS(SELECT 1 FROM t WHERE"
        " subj = 'http://docs.local/d0' AND"
        " pred = 'http://schema.org/inLanguage' AND obj_value = 'tlh') "
        "UNION ALL SELECT 'path', EXISTS(SELECT 1 FROM t WHERE"
        " subj = 'http://docs.local/d0' AND pred IN"
        " ('http://schema.org/inLanguage', 'http://schema.org/source')"
        " AND obj_value = 'en')"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_group_count": (
        "WITH t AS (%s) "
        "SELECT t2.obj_value AS src, COUNT(*) AS n"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh'"
        " AND t2.pred = 'http://schema.org/source' GROUP BY t2.obj_value"
        % _TYPED_TRIPLES_SQL
    ),
    "curation_pipeline": (
        "WITH sig AS ("
        " SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct"
        " FROM (SELECT doc_id,"
        "  array_to_string(array_slice(string_split(text, ' '), i, i + 2), ' ') AS gram"
        "  FROM documents, LATERAL unnest(generate_series(1,"
        "   len(string_split(text, ' ')) - 2)) AS s(i)"
        "  WHERE len(string_split(text, ' ')) >= 3) GROUP BY doc_id),"
        " q AS (SELECT d.doc_id, d.text, d.lang FROM documents d"
        "  JOIN sig USING (doc_id) WHERE sig.n_distinct * 2 > sig.n_grams),"
        " k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),"
        " kept AS (SELECT q.* FROM q JOIN k USING (doc_id)),"
        " needles AS (SELECT array_to_string(array_slice("
        "  string_split(text, ' '), 11, 18), ' ') AS needle FROM documents"
        "  WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 18),"
        " clean AS (SELECT kept.* FROM kept WHERE NOT EXISTS ("
        "  SELECT 1 FROM needles n"
        "  WHERE position(' ' || n.needle || ' ' IN ' ' || kept.text || ' ') > 0)) "
        "SELECT CASE WHEN substr(md5(text), 1, 2) < '40'"
        " THEN 'holdout' ELSE 'train' END AS split, lang, COUNT(*) AS n"
        " FROM clean GROUP BY 1, 2"
    ),
    "curation_export": (
        # same chain as curation_pipeline, then the export's train
        # filter + md5(seed|doc_id) hex shard arithmetic (seed=17,
        # n_parts=8) and the per-shard docs/whitespace-token census
        "WITH sig AS ("
        " SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct"
        " FROM (SELECT doc_id,"
        "  array_to_string(array_slice(string_split(text, ' '), i, i + 2), ' ') AS gram"
        "  FROM documents, LATERAL unnest(generate_series(1,"
        "   len(string_split(text, ' ')) - 2)) AS s(i)"
        "  WHERE len(string_split(text, ' ')) >= 3) GROUP BY doc_id),"
        " q AS (SELECT d.doc_id, d.text, d.lang FROM documents d"
        "  JOIN sig USING (doc_id) WHERE sig.n_distinct * 2 > sig.n_grams),"
        " k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),"
        " kept AS (SELECT q.* FROM q JOIN k USING (doc_id)),"
        " needles AS (SELECT array_to_string(array_slice("
        "  string_split(text, ' '), 11, 18), ' ') AS needle FROM documents"
        "  WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 18),"
        " clean AS (SELECT kept.* FROM kept WHERE NOT EXISTS ("
        "  SELECT 1 FROM needles n"
        "  WHERE position(' ' || n.needle || ' ' IN ' ' || kept.text || ' ') > 0)),"
        " train AS (SELECT doc_id, text FROM clean"
        "  WHERE substr(md5(text), 1, 2) >= '40') "
        "SELECT CAST(CAST(('0x' || substr(md5('17|' ||"
        " CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 8 AS INTEGER) AS part,"
        " CAST(COUNT(*) AS BIGINT) AS docs,"
        " CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens"
        " FROM train GROUP BY 1"
    ),
    "dedup_lines": (
        "WITH broken AS (SELECT doc_id,"
        " regexp_replace(text, '((\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g') AS t"
        " FROM documents),"
        " lines AS (SELECT doc_id, i - 1 AS line_idx,"
        "  string_split(t, chr(10))[i] AS line"
        "  FROM broken, LATERAL unnest(generate_series(1,"
        "   len(string_split(t, chr(10))))) AS s(i)),"
        " kept AS (SELECT doc_id, line_idx, line FROM lines WHERE line <> ''"
        "  QUALIFY ROW_NUMBER() OVER (PARTITION BY line"
        "   ORDER BY doc_id, line_idx) = 1) "
        "SELECT doc_id, string_agg(line, ' | ' ORDER BY line_idx) AS text,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines FROM kept GROUP BY doc_id"
    ),
    "kg_sparql_text": (
        "WITH t AS (%s) "
        "SELECT t2.obj_value AS src, COUNT(*) AS n"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh'"
        " AND t2.pred = 'http://schema.org/source' GROUP BY t2.obj_value"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_lang_filter": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " 'doc ' || CAST(doc_id AS VARCHAR) AS name"
        " FROM documents WHERE lang = 'zh'"
    ),
    "kg_lang_optional": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " 'doc ' || CAST(doc_id AS VARCHAR) AS name,"
        " CASE WHEN n_chars >= 300 THEN CAST(n_chars AS VARCHAR)"
        " ELSE '' END AS n"
        " FROM documents WHERE lang = 'zh'"
    ),
    "kg_datatype_census": (
        # 5 triples/doc: rdf:type (IRI obj -> ''), name@lang (-> ''),
        # characterCount^^xsd:integer, dateCreated^^xsd:date,
        # dateModified^^xsd:dateTime
        "SELECT '' AS dt, CAST(2 * COUNT(*) AS BIGINT) AS n FROM documents "
        "UNION ALL SELECT 'http://www.w3.org/2001/XMLSchema#integer' AS dt,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM documents "
        "UNION ALL SELECT 'http://www.w3.org/2001/XMLSchema#date' AS dt,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM documents "
        "UNION ALL SELECT 'http://www.w3.org/2001/XMLSchema#dateTime' AS dt,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM documents"
    ),
    "kg_term_census": (
        # per doc: 1 IRI object (rdf:type), 1 numeric literal
        # (characterCount^^xsd:integer), 3 other literals (name@lang,
        # dateCreated, dateModified)
        "SELECT 'iri' AS k, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
        "UNION ALL SELECT 'numeric', CAST(COUNT(*) AS BIGINT) FROM documents "
        "UNION ALL SELECT 'other', CAST(3 * COUNT(*) AS BIGINT) FROM documents"
    ),
    "kg_year_census": (
        # dateCreated = DATE '2020-01-01' + (doc_id % 1461) days
        "SELECT CAST(EXTRACT(year FROM d) AS DOUBLE) AS y,"
        " CAST(EXTRACT(month FROM d) AS DOUBLE) AS m,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM ("
        " SELECT DATE '2020-01-01' + CAST(doc_id % 1461 AS INT) AS d"
        " FROM documents) GROUP BY 1, 2"
    ),
    "kg_datetime_parts": (
        # dateModified time parts are doc_id arithmetic (see
        # sources/transcripts.wrap_documents_meta)
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " CAST(doc_id % 24 AS DOUBLE) AS hh,"
        " CAST((doc_id * 7) % 60 AS DOUBLE) AS mi,"
        " CAST((doc_id * 13) % 60 AS DOUBLE) AS ss,"
        " 'Z' AS tz, 'PT0S' AS dur FROM documents"
        " WHERE doc_id % 24 >= 20 AND (doc_id * 7) % 60 < 30"
    ),
    "kg_sparql_expr": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d,"
        " upper(t1.obj_value) || '-' ||"
        " CASE WHEN CAST(t2.obj_value AS DOUBLE) >= 500"
        "  THEN 'long' ELSE 'short' END AS tag,"
        " FLOOR(CAST(t2.obj_value AS DOUBLE) / 100) AS hundreds"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/source'"
        " AND t2.pred = 'http://schema.org/characterCount'"
        " AND FLOOR(CAST(t2.obj_value AS DOUBLE) / 100) >= 1"
        % _TYPED_TRIPLES_SQL
    ),
    "gopher_repetition": _gopher_rep_sql(),
    "paragraph_dedup": (
        # identical planted text; dedup classes via md5(p) windows,
        # keeper = row_number 1 ordered by (doc_id, idx); sub-min_chars
        # paragraphs exempt (their partitions are class-pure, so the
        # CASE override cannot displace a non-exempt keeper)
        "WITH planted AS (SELECT doc_id,"
        " 'subscribe to our newsletter' || chr(10) || chr(10)"
        " || text || chr(10) || chr(10)"
        " || 'footer variant ' || CAST(doc_id % 3 AS VARCHAR) AS text"
        " FROM documents),"
        " ex AS (SELECT doc_id,"
        "  unnest(string_split(text, chr(10) || chr(10))) AS p,"
        "  generate_subscripts(string_split(text, chr(10) || chr(10)), 1)"
        "   - 1 AS idx FROM planted),"
        " ranked AS (SELECT doc_id, p, idx,"
        "  CASE WHEN length(p) >= 1 THEN row_number() OVER"
        "   (PARTITION BY md5(p) ORDER BY doc_id, idx)"
        "  ELSE 1 END AS rn FROM ex),"
        " kept AS (SELECT doc_id, p, idx FROM ranked WHERE rn = 1),"
        " agg AS (SELECT doc_id,"
        "  string_agg(p, chr(10) || chr(10) ORDER BY idx) AS text_clean,"
        "  COUNT(*) AS n_kept FROM kept GROUP BY doc_id),"
        " tot AS (SELECT doc_id, COUNT(*) AS n_paragraphs FROM ex"
        "  GROUP BY doc_id) "
        "SELECT t.doc_id, COALESCE(a.text_clean, '') AS text_clean,"
        " CAST(t.n_paragraphs AS BIGINT) AS n_paragraphs,"
        " CAST(t.n_paragraphs - COALESCE(a.n_kept, 0) AS BIGINT)"
        "  AS n_dropped"
        " FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id"
    ),
    "c4_rules": (
        # identical planted text, then the C4 line filter as
        # list_filter over string_split — same RE2 predicates as the
        # engine's exploded-pandas pass
        "WITH planted AS (SELECT doc_id,"
        " text || '.' || chr(10) || 'short line.' || chr(10)"
        " || text || ' extra javascript line.' || chr(10)"
        " || text"
        " || CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' {' ELSE '' END"
        " || chr(10)"
        " || CASE WHEN doc_id % 7 = 0"
        "     THEN 'this sentence counts. and this. and this too.'"
        "     ELSE 'no punct here at all trailer' END AS text"
        " FROM documents), "
        "cleaned AS (SELECT doc_id, text,"
        " CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,"
        " list_filter(string_split(text, chr(10)), l ->"
        "  regexp_matches(l, '[.!?\"]$')"
        "  AND len(regexp_extract_all(l, '\\S+')) >= 5"
        "  AND NOT contains(lower(l), 'javascript')) AS kept"
        " FROM planted) "
        "SELECT doc_id,"
        " array_to_string(kept, chr(10)) AS text_clean,"
        " n_lines,"
        " CAST(len(kept) AS BIGINT) AS n_lines_kept,"
        " CAST(len(regexp_extract_all(array_to_string(kept, chr(10)),"
        "  '[.!?]')) AS BIGINT) AS n_sentences,"
        " (len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]'))"
        "   >= 3"
        "  AND NOT contains(lower(text), 'lorem ipsum')"
        "  AND NOT contains(text, '{')) AS keep"
        " FROM cleaned"
    ),
    "gopher_rules": (
        # the engine's integer rule arithmetic reproduced verbatim:
        # regexp_extract_all counts = Arrow count_substring_regex
        # (both RE2, both non-overlapping), replace-based '...' count
        # matches the non-overlapping substring count
        "WITH sig AS (SELECT doc_id,"
        " CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,"
        " CAST(length(text) - len(regexp_extract_all(text, '\\s'))"
        "  AS BIGINT) AS n_word_chars,"
        " CAST(len(regexp_extract_all(text, '[^\\s]*[A-Za-z][^\\s]*'))"
        "  AS BIGINT) AS n_alpha_words,"
        " CAST(length(text) - length(replace(text, '#', ''))"
        "  + (length(text) - length(replace(text, '...', ''))) / 3"
        "  AS BIGINT) AS n_symbols,"
        " CAST(length(text) - length(replace(text, chr(10), '')) + 1"
        "  AS BIGINT) AS n_lines,"
        " CAST(len(regexp_extract_all(text, '(?m)^[ \\t]*[-*•]'))"
        "  AS BIGINT) AS n_bullet,"
        " CAST(len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$'))"
        "  AS BIGINT) AS n_ellipsis,"
        " CAST(" + " + ".join(
            "CASE WHEN regexp_matches(lower(text), '\\b%s\\b')"
            " THEN 1 ELSE 0 END" % w
            for w in ("the", "be", "to", "of", "and", "that", "have", "with")
        ) + " AS BIGINT) AS n_stopwords"
        " FROM documents) "
        "SELECT doc_id, n_words, n_word_chars, n_lines, n_stopwords,"
        " (CASE WHEN n_words < 20 OR n_words > 100000 THEN 1 ELSE 0 END"
        " + CASE WHEN n_word_chars < 3 * n_words"
        "    OR n_word_chars > 10 * n_words THEN 2 ELSE 0 END"
        " + CASE WHEN 10 * n_symbols >= n_words THEN 4 ELSE 0 END"
        " + CASE WHEN 10 * n_bullet >= 9 * n_lines THEN 8 ELSE 0 END"
        " + CASE WHEN 10 * n_ellipsis >= 3 * n_lines THEN 16 ELSE 0 END"
        " + CASE WHEN 5 * n_alpha_words < 4 * n_words THEN 32 ELSE 0 END"
        " + CASE WHEN n_stopwords < 2 THEN 64 ELSE 0 END) AS mask,"
        " (CASE WHEN n_words < 20 OR n_words > 100000 THEN 1 ELSE 0 END"
        " + CASE WHEN n_word_chars < 3 * n_words"
        "    OR n_word_chars > 10 * n_words THEN 2 ELSE 0 END"
        " + CASE WHEN 10 * n_symbols >= n_words THEN 4 ELSE 0 END"
        " + CASE WHEN 10 * n_bullet >= 9 * n_lines THEN 8 ELSE 0 END"
        " + CASE WHEN 10 * n_ellipsis >= 3 * n_lines THEN 16 ELSE 0 END"
        " + CASE WHEN 5 * n_alpha_words < 4 * n_words THEN 32 ELSE 0 END"
        " + CASE WHEN n_stopwords < 2 THEN 64 ELSE 0 END) = 0 AS keep"
        " FROM sig"
    ),
    "kg_xsd_cast": (
        # xsd:integer truncates toward zero (XPath xs:integer from
        # numeric) = DuckDB TRUNC; xsd:string of the integer bind is
        # Arrow's shortest float repr = the integral lexical
        "WITH t AS (%s) "
        "SELECT subj AS d,"
        " TRUNC(CAST(obj_value AS DOUBLE)) AS n,"
        " TRUNC(CAST(obj_value AS DOUBLE) / 100) AS hundreds,"
        " CASE WHEN TRUNC(CAST(obj_value AS DOUBLE)) >= 500"
        "  THEN 'true' ELSE 'false' END AS flag,"
        " CAST(CAST(TRUNC(CAST(obj_value AS DOUBLE)) AS BIGINT)"
        "  AS VARCHAR) AS lex"
        " FROM t WHERE pred = 'http://schema.org/characterCount'"
        " AND TRUNC(CAST(obj_value AS DOUBLE)) >= 100"
        % _TYPED_TRIPLES_SQL
    ),
    "customers_orders_outer": (
        "WITH rich AS (SELECT c_custkey,"
        "  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acct_cents"
        "  FROM customer WHERE c_acctbal > 5000),"
        " cnt AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n"
        "  FROM orders GROUP BY o_custkey) "
        "SELECT COALESCE(rich.c_custkey, cnt.c_custkey) AS c_custkey,"
        " COALESCE(acct_cents, -1) AS acct_cents,"
        " CAST(COALESCE(n, -1) AS BIGINT) AS n_orders"
        " FROM rich FULL OUTER JOIN cnt ON rich.c_custkey = cnt.c_custkey"
    ),
    "kg_store_sparql": (
        "WITH t AS (%s) "
        "SELECT t2.obj_value AS src, COUNT(*) AS n"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh'"
        " AND t2.pred = 'http://schema.org/source' GROUP BY t2.obj_value"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_sparql_text_filter": (
        "WITH t AS (%s) "
        "SELECT subj AS d, obj_value AS n FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " AND CAST(obj_value AS BIGINT) > 400" % _TYPED_TRIPLES_SQL
    ),
    "html_extract_docs": (
        "SELECT 'doc' || printf('%08d', doc_id) AS conv_id,"
        " array_to_string(list_filter(list_transform("
        "   string_split(text, chr(10)),"
        "   x -> trim(regexp_replace(x, '\s+', ' ', 'g'))),"
        "  x -> x <> ''), chr(10)) AS clean_text FROM documents"
    ),
    "lineitem_below_avg": (
        "WITH lim AS (SELECT l_partkey, 0.2 * AVG(l_quantity) AS lim"
        " FROM lineitem GROUP BY l_partkey) "
        "SELECT l.l_partkey, COUNT(*) AS n_below"
        " FROM lineitem l JOIN lim USING (l_partkey)"
        " WHERE l.l_quantity < lim.lim GROUP BY l.l_partkey"
    ),
    "kg_sparql_mixed_groups": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " CAST(n_chars AS VARCHAR) AS n FROM documents"
        " WHERE lang = 'zh' AND source <> 'src1' AND source <> 'src2'"
    ),
    "kg_sparql_values_multi": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " source AS src, lang AS l FROM documents"
        " WHERE (source = 'src1' AND lang = 'zh')"
        " OR (source = 'src2' AND lang = 'zh') OR source = 'src3'"
    ),
    # subquery bindings are lexical forms (the engine casts the
    # aggregate to its lexical string before the join), hence VARCHAR
    "kg_sparql_subquery": (
        "WITH t AS (%s),"
        " s AS (SELECT subj AS d, obj_value AS src FROM t"
        "  WHERE pred = 'http://schema.org/source'),"
        " c AS (SELECT src, CAST(COUNT(*) AS VARCHAR) AS nsrc"
        "  FROM s GROUP BY src) "
        "SELECT s.d, s.src, c.nsrc FROM s JOIN c USING (src)"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_sparql_graph": (
        "SELECT 'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        " || '/turn/0' AS g, source AS src FROM documents WHERE lang = 'zh'"
    ),
    "kg_graph_var_exists": (
        "SELECT 'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        " || '/turn/0' AS g, source AS src FROM documents WHERE lang = 'zh'"
    ),
    "kg_graph_path": (
        "SELECT 'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        " || '/turn/0' AS g,"
        " 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d, v"
        " FROM (SELECT doc_id, source AS v FROM documents"
        "       UNION ALL SELECT doc_id, lang AS v FROM documents)"
    ),
    "kg_graph_census": (
        "SELECT 'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        " || '/turn/0' AS g, CAST(4 AS BIGINT) AS n FROM documents"
    ),
    "kg_from_named": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " 'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        " || '/turn/0' AS g, CAST(n_chars AS VARCHAR) AS n"
        " FROM documents WHERE doc_id = 1"
    ),
    "kg_count_distinct": (
        "WITH t AS (%s) "
        "SELECT t1.obj_value AS src, COUNT(DISTINCT t2.obj_value) AS n"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/source'"
        " AND t2.pred = 'http://schema.org/inLanguage'"
        " GROUP BY t1.obj_value" % _TYPED_TRIPLES_SQL
    ),
    "kg_mixed_distinct_agg": (
        "WITH t AS (%s) "
        "SELECT t1.obj_value AS src, COUNT(*) AS n_docs,"
        " COUNT(DISTINCT t2.obj_value) AS n_langs"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/source'"
        " AND t2.pred = 'http://schema.org/inLanguage'"
        " GROUP BY t1.obj_value" % _TYPED_TRIPLES_SQL
    ),
    "kg_typed_const": (
        "SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d"
        " FROM documents WHERE doc_id % 1461 = 0"
    ),
    "kg_lang_const": (
        "SELECT COUNT(*) AS n"
        " FROM documents WHERE doc_id = 42 AND lang = 'fr'"
    ),
    "kg_anon_node": (
        "WITH t AS (%s) "
        "SELECT a.obj_value AS l, b.obj_value AS v"
        " FROM t a JOIN t b ON b.subj = a.subj"
        " WHERE a.pred = 'http://schema.org/inLanguage'"
        " AND b.pred = 'http://schema.org/characterCount'"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_bnode_label": (
        "WITH t AS (%s) "
        "SELECT a.obj_value AS l, b.obj_value AS v"
        " FROM t a JOIN t b ON b.subj = a.subj"
        " WHERE a.pred = 'http://schema.org/inLanguage'"
        " AND b.pred = 'http://schema.org/characterCount'"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_select_expr": (
        "WITH t AS (%s) "
        "SELECT a.obj_value AS src, COUNT(*) AS n,"
        " SUM(CAST(b.obj_value AS DOUBLE)) / COUNT(*) AS avg_cc"
        " FROM t a JOIN t b ON b.subj = a.subj"
        " WHERE a.pred = 'http://schema.org/source'"
        " AND b.pred = 'http://schema.org/characterCount'"
        " GROUP BY a.obj_value" % _TYPED_TRIPLES_SQL
    ),
    "kg_trailing_values": (
        "WITH t AS (%s) "
        "SELECT subj AS d, obj_value AS l FROM t"
        " WHERE pred = 'http://schema.org/inLanguage'"
        " AND obj_value IN ('en', 'de')" % _TYPED_TRIPLES_SQL
    ),
    "kg_groupby_expr": (
        "WITH t AS (%s) "
        "SELECT obj_value || '-x' AS lx, COUNT(*) AS n FROM t"
        " WHERE pred = 'http://schema.org/inLanguage'"
        " GROUP BY obj_value || '-x'" % _TYPED_TRIPLES_SQL
    ),
    "kg_union_join": (
        "WITH t AS (%s) "
        "SELECT a.subj AS d, a.obj_value AS l, u.v AS v"
        " FROM t a JOIN ("
        "SELECT subj, obj_value AS v FROM t"
        " WHERE pred = 'http://schema.org/source'"
        " UNION ALL "
        "SELECT subj, obj_value AS v FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " AND CAST(obj_value AS DOUBLE) >= 400"
        ") u ON u.subj = a.subj"
        " WHERE a.pred = 'http://schema.org/inLanguage'"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_global_mixed_agg": (
        "WITH t AS (%s) "
        "SELECT COUNT(*) AS n_pairs,"
        " COUNT(DISTINCT t1.obj_value) AS n_srcs,"
        " COUNT(DISTINCT t2.obj_value) AS n_langs"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/source'"
        " AND t2.pred = 'http://schema.org/inLanguage'"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_order_by_expr": (
        "WITH t AS (%s) "
        "SELECT subj AS d, obj_value AS n FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " ORDER BY CAST(obj_value AS DOUBLE) DESC, subj ASC LIMIT 10"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_having_distinct": (
        "WITH t AS (%s) "
        "SELECT a.obj_value AS src, COUNT(*) AS n "
        "FROM t a JOIN t b ON b.subj = a.subj "
        "WHERE a.pred = 'http://schema.org/source' "
        "AND b.pred = 'http://schema.org/inLanguage' "
        "GROUP BY a.obj_value HAVING COUNT(DISTINCT b.obj_value) >= 2 "
        "ORDER BY a.obj_value" % _TYPED_TRIPLES_SQL
    ),
    "kg_order_by_agg_expr": (
        "WITH t AS (%s) "
        "SELECT obj_value AS l, COUNT(*) AS n FROM t"
        " WHERE pred = 'http://schema.org/inLanguage'"
        " GROUP BY obj_value"
        " ORDER BY (COUNT(*) * 100 + length(obj_value)) DESC, obj_value ASC"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_nested_optional": (
        "SELECT '%s' || CAST(doc_id AS VARCHAR) AS d,"
        " CASE WHEN doc_id // 4 >= 1"
        "  THEN '%s' || CAST(doc_id // 16 AS VARCHAR) ELSE '' END AS gp,"
        " CASE WHEN doc_id // 16 >= 1"
        "  THEN '%s' || CAST(doc_id // 64 AS VARCHAR) ELSE '' END AS ggp"
        " FROM documents WHERE doc_id >= 1" % (DOC_NS, DOC_NS, DOC_NS)
    ),
    "kg_optional_path": (
        "WITH RECURSIVE anc(node, a) AS ("
        " SELECT doc_id, doc_id // 4 FROM documents WHERE doc_id >= 1"
        " UNION ALL SELECT node, a // 4 FROM anc WHERE a >= 1) "
        "SELECT '%s' || CAST(e.doc_id AS VARCHAR) AS d,"
        " COALESCE('%s' || CAST(c.a AS VARCHAR), '') AS anc"
        " FROM documents e LEFT JOIN anc c ON c.node = e.doc_id // 4"
        " WHERE e.doc_id >= 1" % (DOC_NS, DOC_NS)
    ),
    "kg_optional_filter": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d, t1.obj_value AS l,"
        " COALESCE(t2.obj_value, '') AS n"
        " FROM t t1 LEFT JOIN"
        " (SELECT subj, obj_value FROM t"
        "  WHERE pred = 'http://schema.org/characterCount'"
        "  AND CAST(obj_value AS DOUBLE) >= 300) t2"
        " ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage'"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_union_arm_filter": (
        "WITH t AS (%s) "
        "SELECT subj AS d, 'long' AS bucket FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " AND CAST(obj_value AS DOUBLE) >= 400"
        " UNION ALL "
        "SELECT subj AS d, 'short' AS bucket FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " AND CAST(obj_value AS DOUBLE) < 150"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_having_order_agg": (
        "WITH t AS (%s) "
        "SELECT obj_value AS l FROM t"
        " WHERE pred = 'http://schema.org/inLanguage'"
        " GROUP BY obj_value HAVING COUNT(subj) > 60"
        " ORDER BY COUNT(subj) DESC, obj_value ASC LIMIT 3"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_sum_distinct": (
        "WITH t AS (%s) "
        "SELECT t1.obj_value AS l,"
        " SUM(DISTINCT CAST(t2.obj_value AS DOUBLE)) AS total"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage'"
        " AND t2.pred = 'http://schema.org/characterCount'"
        " GROUP BY t1.obj_value" % _TYPED_TRIPLES_SQL
    ),
    "kg_subquery": (
        "WITH t AS (%s),"
        " b AS (SELECT t1.subj AS d, t1.obj_value AS src,"
        "  CAST(t2.obj_value AS BIGINT) AS n"
        "  FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        "  WHERE t1.pred = 'http://schema.org/source'"
        "  AND t2.pred = 'http://schema.org/characterCount'),"
        " inner_q AS (SELECT src, AVG(n) AS avg_chars FROM b GROUP BY src) "
        "SELECT b.d, b.src FROM b JOIN inner_q USING (src)"
        " WHERE b.n > inner_q.avg_chars" % _TYPED_TRIPLES_SQL
    ),
    "kg_store_update": (
        "SELECT CASE WHEN lang = 'zh' THEN 'zh-Hans' ELSE lang END AS l,"
        " COUNT(*) AS n FROM documents GROUP BY 1"
    ),
    "kg_sparql_update": (
        "WITH t AS ("
        " SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,"
        "  'http://schema.org/Document' AS o FROM documents"
        " UNION ALL SELECT 'http://schema.org/inLanguage',"
        "  CASE WHEN lang = 'zh' THEN 'zh-Hans' ELSE lang END FROM documents"
        " UNION ALL SELECT 'http://schema.org/source', source FROM documents"
        ") "
        "SELECT p, o, COUNT(*) AS n FROM t GROUP BY p, o"
        " UNION ALL SELECT 'http://schema.org/updatePolicy', 'retag-zh',"
        " CAST(1 AS BIGINT)"
    ),
    "kg_graph_scoped": (
        "SELECT 'http://graft.local/conv/' || printf('doc%08d', doc_id)"
        " || '/turn/0' AS g,"
        " 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS d,"
        " lang AS l FROM documents WHERE source = 'src1'"
    ),
    "ccnet_buckets": (
        # per-language unigram LM -> per-doc mean NLL in micro-nats ->
        # per-language tercile thresholds (order statistics) -> census
        "WITH tok AS (SELECT doc_id, lang,"
        "  unnest(string_split(lower(text), ' ')) AS token FROM documents),"
        " freq AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token),"
        " tot AS (SELECT lang, CAST(SUM(n) AS DOUBLE) AS T FROM freq GROUP BY lang),"
        " scored AS (SELECT t.doc_id, t.lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        "   CAST(floor(-AVG(ln(f.n / tt.T)) * 1000000 + 0.5) AS BIGINT) AS ppl"
        "  FROM tok t JOIN freq f ON t.lang = f.lang AND t.token = f.token"
        "   JOIN tot tt ON t.lang = tt.lang GROUP BY t.doc_id, t.lang),"
        " thr AS (SELECT lang, CAST(quantile_disc(ppl, 0.33) AS BIGINT) AS q33,"
        "   CAST(quantile_disc(ppl, 0.67) AS BIGINT) AS q67 FROM scored GROUP BY lang)"
        " SELECT s.lang AS lang,"
        "  CASE WHEN ppl <= q33 THEN 'head' WHEN ppl <= q67 THEN 'middle'"
        "   ELSE 'tail' END AS bucket,"
        "  CAST(COUNT(*) AS BIGINT) AS n_docs,"
        "  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total"
        " FROM scored s JOIN thr ON s.lang = thr.lang GROUP BY 1, 2"
    ),
    "bigram_logppl": (
        # interpolated bigram twin: ML bigram over prefix counts backed
        # off to the unigram, 0.7/0.3 mix identical to the engine's
        # float expression; quantize AFTER the per-doc mean
        "WITH tok AS (SELECT doc_id,"
        "  unnest(string_split(lower(text), ' ')) AS t,"
        "  generate_subscripts(string_split(lower(text), ' '), 1) AS ord"
        "  FROM documents),"
        " uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),"
        " tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS T FROM uni),"
        " big AS (SELECT a.doc_id, a.t AS w1, b.t AS w2 FROM tok a"
        "  JOIN tok b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),"
        " bc AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),"
        " pref AS (SELECT w1, SUM(c) AS cp FROM bc GROUP BY w1),"
        " ll AS (SELECT big.doc_id,"
        "   -ln(0.7 * (bc.c / pref.cp) + 0.3 * (uni.c / tot.T)) AS nll"
        "  FROM big JOIN bc ON big.w1 = bc.w1 AND big.w2 = bc.w2"
        "   JOIN pref ON big.w1 = pref.w1"
        "   JOIN uni ON big.w2 = uni.t CROSS JOIN tot)"
        " SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,"
        "  CAST(floor(AVG(nll) * 1000000 + 0.5) AS BIGINT) AS logppl_micro"
        " FROM ll GROUP BY doc_id"
    ),
    "unigram_logppl": (
        "WITH tok AS (SELECT doc_id,"
        "  unnest(string_split(lower(text), ' ')) AS token FROM documents),"
        " freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),"
        " tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM freq) "
        "SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        " CAST(floor(-AVG(ln(f.n / tot.total)) * 1000000 + 0.5) AS BIGINT)"
        " AS logppl_micro"
        " FROM tok t JOIN freq f USING (token), tot GROUP BY t.doc_id"
    ),
    "html_extract_signals": (
        # invariant form: exactly one signal row per generated turn
        # (2000 — the query's own constant; malformed markup must
        # yield a row, never a crash) + structural flags; the signal
        # VALUES are DOM-parse-derived and the corpus family selector
        # is crc32 (no DuckDB twin) — documented in the query
        "SELECT CAST(2000 AS BIGINT) AS n_turns,"
        " TRUE AS signals_in_range, TRUE AS links_le_tags"
    ),
    "quality_classifier": (
        # checked-invariant form: exact count twin + in-range scores +
        # the bit-identical-at-any-parallelism training claim verified
        # by a second differently-partitioned training run in-query
        "SELECT (SELECT COUNT(*) FROM documents) AS n_docs,"
        " TRUE AS scores_in_range, TRUE AS partition_invariant"
    ),
    "dedup_substrings": (
        # planted coverage lower bound: every doc carrying the planted
        # 40-word span must surface in a fingerprint-sharing pair
        "SELECT doc_id, TRUE AS found_in_pair FROM documents"
        " WHERE doc_id % 101 = 0 AND doc_id > 0"
    ),
    "semdedup": (
        # checked-invariant + planted form: exact planted-input count
        # twins + the guaranteed drop-one-of-each-exact-pair flag
        "SELECT (SELECT COUNT(*) FROM embeddings)"
        " + (SELECT COUNT(*) FROM embeddings WHERE vec_id % 10 = 0)"
        " AS n_vecs,"
        " (SELECT COUNT(*) FROM embeddings WHERE vec_id % 10 = 0)"
        " AS planted_pairs, TRUE AS planted_dedup_ok"
    ),
    "dedup_minhash": (
        # planted-lower-bound form (_dup_pair_coverage): every member
        # of an exact md5-duplicate group (incl. the planted verbatim
        # copies at doc_id+10000000) must appear in a found pair
        "WITH d AS (SELECT doc_id, text FROM documents UNION ALL"
        " SELECT doc_id + 10000000 AS doc_id, text FROM documents"
        " WHERE doc_id % 50 = 0),"
        " hh AS (SELECT doc_id, md5(COALESCE(text, '')) AS h FROM d)"
        " SELECT doc_id, TRUE AS found_in_pair FROM hh WHERE h IN"
        " (SELECT h FROM hh GROUP BY h HAVING COUNT(*) > 1)"
    ),
    "dedup_simhash": (
        "WITH d AS (SELECT doc_id, text FROM documents UNION ALL"
        " SELECT doc_id + 10000000 AS doc_id, text FROM documents"
        " WHERE doc_id % 50 = 0),"
        " hh AS (SELECT doc_id, md5(COALESCE(text, '')) AS h FROM d)"
        " SELECT doc_id, TRUE AS found_in_pair FROM hh WHERE h IN"
        " (SELECT h FROM hh GROUP BY h HAVING COUNT(*) > 1)"
    ),
    "pca_project": (
        # checked-invariant form (stages/pca.pca_checked): n_rows and
        # the quantized covariance TRACE are exact integer twins of the
        # engine's arithmetic (diagonal-only pca_covariance oracle);
        # the three flags assert the eigen/projection algebra in-query
        "WITH v AS (SELECT vec_id,"
        "  CAST(unnest(embedding) AS DOUBLE) AS x,"
        "  generate_subscripts(embedding, 1) AS i FROM embeddings),"
        " m AS (SELECT i, (CAST(SUM(CAST(floor(x * 1000000000.0 + 0.5)"
        "  AS BIGINT)) AS DOUBLE) / 1000000000.0) / COUNT(*) AS mu"
        "  FROM v GROUP BY i),"
        " c AS (SELECT v.i, v.x - m.mu AS cx FROM v JOIN m USING (i)) "
        "SELECT (SELECT COUNT(*) FROM embeddings) AS n_rows,"
        " CAST(SUM(CAST(floor(cx * cx * 1000000000.0 + 0.5) AS BIGINT))"
        "  AS BIGINT) AS trace_q,"
        " TRUE AS orthonormal_ok, TRUE AS var_monotone_ok,"
        " TRUE AS proj_var_ok FROM c"
    ),
    "kmeans_sizes": (
        # checked-invariant form (stages/kmeans.kmeans_checked): exact
        # count twin + assignment-total and Lloyd-descent flags
        "SELECT (SELECT COUNT(*) FROM embeddings) AS n_points,"
        " CAST(8 AS BIGINT) AS k, TRUE AS sizes_sum_ok,"
        " TRUE AS inertia_improved"
    ),
    "ann_ivf": (
        # checked-invariant form (see _ann_checked): exact table-count
        # twin + deterministic TRUE flags; a broken IVF (missed cell,
        # corrupted sims, lost self-hit, recall under the deterministic
        # floor) flips a flag and the hash compare goes red
        "SELECT CAST(qid AS BIGINT) AS query_id,"
        " (SELECT COUNT(*) FROM embeddings) AS n_vecs,"
        " CAST(10 AS BIGINT) AS n_results, TRUE AS self_hit,"
        " TRUE AS sims_exact, TRUE AS recall_ok"
        " FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) t(qid)"
    ),
    "ann_ivf_indexed": (
        "SELECT CAST(qid AS BIGINT) AS query_id,"
        " (SELECT COUNT(*) FROM embeddings) AS n_vecs,"
        " CAST(10 AS BIGINT) AS n_results, TRUE AS self_hit,"
        " TRUE AS sims_exact, TRUE AS recall_ok"
        " FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) t(qid)"
    ),
    "ann_sq_topk": (
        # int8 scalar quantization reproduced verbatim: integer-exact
        # L2 norms (quantize-before-sum), per-dim min/max over the
        # normalized corpus, half-up FLOOR(+0.5) encoding (numpy
        # banker's round would NOT match), quantized affine score
        # weights, exact integer scores, ties broken by vec_id.  CAST
        # to DOUBLE at the source (the DuckDB FLOAT*DOUBLE-stays-FLOAT
        # pitfall, see pca_covariance)
        "WITH v AS (SELECT vec_id,"
        "  CAST(unnest(embedding) AS DOUBLE) AS x,"
        "  generate_subscripts(embedding, 1) AS i FROM embeddings),"
        " nn AS (SELECT vec_id, CAST(SUM(CAST(floor(x * x"
        "   * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS n2q"
        "  FROM v GROUP BY vec_id),"
        " xn AS (SELECT v.vec_id, v.i, v.x / sqrt(CAST(CASE"
        "   WHEN nn.n2q > 0 THEN nn.n2q ELSE 1000000000 END AS DOUBLE)"
        "   / 1000000000.0) AS x FROM v JOIN nn USING (vec_id)),"
        " pr AS (SELECT i, MIN(x) AS mn, CASE WHEN MAX(x) > MIN(x)"
        "   THEN MAX(x) - MIN(x) ELSE 1.0 END AS rng"
        "  FROM xn GROUP BY i),"
        " c AS (SELECT xn.vec_id, xn.i,"
        "  CAST(LEAST(GREATEST(FLOOR((xn.x - pr.mn) * 255.0 / pr.rng"
        "   + 0.5), 0), 255) AS BIGINT) AS code"
        "  FROM xn JOIN pr USING (i)),"
        " wt AS (SELECT i,"
        "  CAST(FLOOR(mn * (rng / 255.0) * 1000000000000.0 + 0.5)"
        "   AS BIGINT) AS u,"
        "  CAST(FLOOR((rng / 255.0) * (rng / 255.0) * 1000000000000.0"
        "   + 0.5) AS BIGINT) AS w FROM pr),"
        " q AS (SELECT c.vec_id AS query_id, c.i,"
        "  c.code * wt.w + wt.u AS qw FROM c JOIN wt USING (i)"
        "  WHERE c.vec_id IN (0,1,2,3,4,5,6,7)),"
        " s AS (SELECT q.query_id, c.vec_id,"
        "  CAST(SUM(q.qw * c.code) AS BIGINT) AS score"
        "  FROM q JOIN c ON c.i = q.i GROUP BY q.query_id, c.vec_id) "
        "SELECT query_id, vec_id, score FROM s"
        " QUALIFY row_number() OVER (PARTITION BY query_id"
        "  ORDER BY score DESC, vec_id) <= 10"
    ),
    "pca_covariance": (
        # quantized-mean then per-pair quantized centered products:
        # every sum is an int64 total, identical to the engine's.
        # CAST to DOUBLE at the source: DuckDB evaluates FLOAT * DOUBLE
        # in FLOAT (typeof = FLOAT), unlike every other engine here
        "WITH v AS (SELECT vec_id,"
        "  CAST(unnest(embedding) AS DOUBLE) AS x,"
        "  generate_subscripts(embedding, 1) AS i FROM embeddings),"
        " m AS (SELECT i, (CAST(SUM(CAST(floor(x * 1000000000.0 + 0.5)"
        "  AS BIGINT)) AS DOUBLE) / 1000000000.0) / COUNT(*) AS mu"
        "  FROM v GROUP BY i),"
        " c AS (SELECT v.vec_id, v.i, v.x - m.mu AS cx"
        "  FROM v JOIN m USING (i)) "
        "SELECT a.i AS i, b.i AS j,"
        " CAST(SUM(CAST(floor(a.cx * b.cx * 1000000000.0 + 0.5)"
        "  AS BIGINT)) AS BIGINT) AS cov_q"
        " FROM c a JOIN c b ON b.vec_id = a.vec_id GROUP BY a.i, b.i"
    ),
    "dsir_weights": (
        # DSIR: hashed-ngram (unigram+bigram) buckets = md5(gram)[:4],
        # Laplace-smoothed target/raw bucket distributions, per-doc sum
        # of per-bucket log ratios quantized to integer micro-nats
        # BEFORE the sum (order-independent int64 totals)
        "WITH docs2 AS (SELECT doc_id, lang = 'en' AS it,"
        "  string_split(lower(text), ' ') AS ts FROM documents),"
        " uni AS (SELECT doc_id, it, unnest(ts) AS g,"
        "  generate_subscripts(ts, 1) AS i FROM docs2),"
        " grams AS ("
        "  SELECT doc_id, it, g FROM uni"
        "  UNION ALL"
        "  SELECT a.doc_id, a.it, a.g || ' ' || b.g AS g"
        "  FROM uni a JOIN uni b ON b.doc_id = a.doc_id AND b.i = a.i + 1),"
        " feat AS (SELECT doc_id, it, substr(md5(g),1,4) AS b FROM grams),"
        " counts AS (SELECT b, COUNT(*) AS n,"
        "  SUM(CASE WHEN it THEN 1 ELSE 0 END) AS nt FROM feat GROUP BY b),"
        " tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS r,"
        "  CAST(SUM(nt) AS DOUBLE) AS t FROM counts),"
        " ratio AS (SELECT b, CAST(floor((ln(nt + 1) - ln(t + 65536)"
        "  - ln(n + 1) + ln(r + 65536)) * 1000000 + 0.5) AS BIGINT) AS rm"
        "  FROM counts, tot) "
        "SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,"
        " CAST(SUM(r.rm) AS BIGINT) AS logw_micro"
        " FROM feat f JOIN ratio r ON r.b = f.b GROUP BY f.doc_id"
    ),
    "epoch_shuffle": (
        "SELECT doc_id, lang, md5(CAST(7 AS VARCHAR) || '|' ||"
        " CAST(doc_id AS VARCHAR)) AS shuffle_key"
        " FROM documents ORDER BY shuffle_key LIMIT 50"
    ),
    "mixture_sample": (
        "WITH f AS (SELECT doc_id, source, substr(md5(text), 1, 4) AS h"
        " FROM documents),"
        " c AS (SELECT doc_id, source,"
        "  (CASE source WHEN 'src1' THEN 1 WHEN 'src2' THEN 0 ELSE 1 END)"
        "  + (CASE WHEN h < (CASE source WHEN 'src1' THEN '8000'"
        "     WHEN 'src2' THEN '4000' ELSE '0000' END)"
        "     THEN 1 ELSE 0 END) AS n FROM f) "
        "SELECT doc_id, source, CAST(i AS BIGINT) AS copy_idx"
        " FROM c, LATERAL unnest(generate_series(0, n - 1)) AS s(i)"
        " WHERE n > 0"
    ),
    "sequence_packing": (
        "SELECT doc_id,"
        " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,"
        " CAST(COALESCE(SUM(len(string_split(text, ' ')))"
        "  OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING"
        "  AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS bin_id"
        " FROM documents"
    ),
    "repetition_signals": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),"
        " g AS (SELECT doc_id,"
        "  array_to_string(array_slice(ws, i, i + 2), ' ') AS gram"
        "  FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS s(i)"
        "  WHERE len(ws) >= 3) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,"
        " CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct"
        " FROM g GROUP BY doc_id"
    ),
    "kg_path_neg": (
        "WITH t AS (%s) "
        "SELECT subj AS src, obj_value AS dst FROM t WHERE pred NOT IN"
        " ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type',"
        " 'http://schema.org/characterCount')" % _TYPED_TRIPLES_SQL
    ),
    "kg_path_opt": (
        "WITH t AS (%s), terms AS ("
        " SELECT subj AS t FROM t UNION SELECT obj_value FROM t) "
        "SELECT subj AS src, obj_value AS dst FROM t"
        " WHERE pred = 'http://schema.org/source'"
        " UNION SELECT t, t FROM terms" % _TYPED_TRIPLES_SQL
    ),
    "contamination": (
        "WITH needles AS ("
        " SELECT array_to_string(array_slice(string_split(text, ' '), 11, 18), ' ')"
        " AS needle FROM documents"
        " WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 18) "
        "SELECT DISTINCT d.doc_id FROM documents d JOIN needles n"
        " ON position(' ' || n.needle || ' ' IN ' ' || d.text || ' ') > 0"
    ),
    "kg_store_quads": (
        "SELECT 'http://schema.org/inLanguage' AS pred,"
        " COUNT(*) AS n FROM documents"
        " UNION ALL SELECT 'http://schema.org/source', COUNT(*) FROM documents"
    ),
    "kg_graph_mgmt": (
        "WITH q AS ("
        " SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR) AS subj,"
        "  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,"
        "  'http://schema.org/Document' AS obj_value,"
        "  'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        "  || '/turn/0' AS graph FROM documents"
        " UNION ALL SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR),"
        "  'http://schema.org/inLanguage', lang,"
        "  'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        "  || '/turn/0' FROM documents"
        " UNION ALL SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR),"
        "  'http://schema.org/source', source,"
        "  'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        "  || '/turn/0' FROM documents"
        " UNION ALL SELECT 'http://docs.local/d' || CAST(doc_id AS VARCHAR),"
        "  'http://schema.org/characterCount', CAST(n_chars AS VARCHAR),"
        "  'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        "  || '/turn/0' FROM documents"
        "), gids AS ("
        " SELECT 'http://graft.local/conv/doc' || printf('%08d', doc_id)"
        " || '/turn/0' AS gid, doc_id FROM documents WHERE doc_id < 4"
        "), final AS ("
        " SELECT subj, pred, obj_value, graph FROM q WHERE graph NOT IN"
        "  (SELECT gid FROM gids WHERE doc_id IN (2, 3))"
        " UNION ALL SELECT subj, pred, obj_value, 'urn:work:moved' FROM q"
        "  WHERE graph = (SELECT gid FROM gids WHERE doc_id = 2)"
        " UNION ALL SELECT subj, pred, obj_value, 'urn:work:merge' FROM q"
        "  WHERE graph IN (SELECT gid FROM gids WHERE doc_id IN (0, 1))"
        "  AND NOT (subj = 'http://docs.local/d0' AND pred ="
        "  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')"
        " UNION ALL SELECT 'urn:job:1',"
        "  'http://purl.org/dc/terms/created', '2026-08-19', 'urn:audit:run'"
        " UNION ALL SELECT 'urn:job:1',"
        "  'http://purl.org/dc/terms/created', '2026-08-19', ''"
        ") SELECT graph AS g, COUNT(*) AS n FROM final GROUP BY graph"
    ),
    "kg_agg_stats": (
        "WITH t AS (%s) "
        "SELECT t2.obj_value AS src, COUNT(*) AS n_docs,"
        " CAST(SUM(CAST(t3.obj_value AS BIGINT)) AS BIGINT) AS sum_chars,"
        " AVG(CAST(t3.obj_value AS BIGINT)) AS avg_chars,"
        " MIN(CAST(t3.obj_value AS BIGINT)) AS min_chars,"
        " MAX(CAST(t3.obj_value AS BIGINT)) AS max_chars"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " JOIN t t3 ON t3.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh'"
        " AND t2.pred = 'http://schema.org/source'"
        " AND t3.pred = 'http://schema.org/characterCount'"
        " GROUP BY t2.obj_value HAVING COUNT(*) > 1" % _TYPED_TRIPLES_SQL
    ),
    "kg_group_concat": (
        "WITH t AS (%s) "
        "SELECT t1.obj_value AS src,"
        " string_agg(t2.obj_value, ',' ORDER BY t2.obj_value) AS langs,"
        " MIN(t2.obj_value) AS sample_lang"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/source'"
        " AND t2.pred = 'http://schema.org/inLanguage'"
        " GROUP BY t1.obj_value" % _TYPED_TRIPLES_SQL
    ),
    # same answer through the persisted predicate-partitioned store
    "kg_store_group_count": (
        "WITH t AS (%s) "
        "SELECT t2.obj_value AS src, COUNT(*) AS n"
        " FROM t t1 JOIN t t2 ON t2.subj = t1.subj"
        " WHERE t1.pred = 'http://schema.org/inLanguage' AND t1.obj_value = 'zh'"
        " AND t2.pred = 'http://schema.org/source' GROUP BY t2.obj_value"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_describe": (
        "WITH t AS (%s) "
        "SELECT DISTINCT t.subj, t.pred, t.obj_value FROM t JOIN"
        " (SELECT DISTINCT subj FROM t WHERE"
        " pred = 'http://schema.org/inLanguage' AND obj_value = 'zh') m"
        " ON m.subj = t.subj" % _TYPED_TRIPLES_SQL
    ),
    "kg_describe_iri": (
        "WITH t AS (%s) "
        "SELECT subj, pred, obj_value FROM t"
        " WHERE subj IN ('%s0', '%s1')" % (_TYPED_TRIPLES_SQL, DOC_NS, DOC_NS)
    ),
    "kg_order_limit": (
        "WITH t AS (%s) "
        "SELECT subj AS d, lpad(obj_value, 8, '0') AS n FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " ORDER BY n DESC, d ASC LIMIT 10 OFFSET 5" % _TYPED_TRIPLES_SQL
    ),
    "kg_graph_diff": (
        "WITH a AS (%s), b AS (SELECT subj, pred,"
        " CASE WHEN pred = 'http://schema.org/inLanguage'"
        " AND obj_value = 'zh' THEN 'zh-Hans' ELSE obj_value END AS obj_value"
        " FROM a) "
        "SELECT *, 'both' AS region FROM (SELECT * FROM a INTERSECT SELECT * FROM b) "
        "UNION ALL SELECT *, 'only_a' FROM (SELECT * FROM a EXCEPT SELECT * FROM b) "
        "UNION ALL SELECT *, 'only_b' FROM (SELECT * FROM b EXCEPT SELECT * FROM a)"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_filter_numeric": (
        "WITH t AS (%s) "
        "SELECT subj AS d, obj_value AS n FROM t"
        " WHERE pred = 'http://schema.org/characterCount'"
        " AND CAST(obj_value AS BIGINT) > 400" % _TYPED_TRIPLES_SQL
    ),
    "docs_train_split": (
        "SELECT doc_id, CASE WHEN substr(md5(text), 1, 2) < '40'"
        " THEN 'holdout' ELSE 'train' END AS split FROM documents"
    ),
    "docs_source_quota": (
        "SELECT doc_id, source, n_chars FROM"
        " (SELECT doc_id, source, n_chars, ROW_NUMBER() OVER"
        "  (PARTITION BY source ORDER BY n_chars, doc_id) AS rn"
        "  FROM documents) WHERE rn <= 50"
    ),
    # ::DOUBLE casts force the same IEEE arithmetic math.ceil(q * n)
    # uses on the engine side (DuckDB decimal literals are exact and
    # would round ceil(0.05 * 1000) differently)
    "docs_length_trim": (
        "WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents"
        "  GROUP BY n_chars),"
        " cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM h),"
        " n AS (SELECT COUNT(*) AS n FROM documents),"
        " lo AS (SELECT MIN(v) AS lo FROM cum, n"
        "  WHERE cc >= CEIL(CAST(0.05 AS DOUBLE) * n)),"
        " hi AS (SELECT MIN(v) AS hi FROM cum, n"
        "  WHERE cc >= CEIL(CAST(0.95 AS DOUBLE) * n)) "
        "SELECT doc_id, n_chars FROM documents, lo, hi"
        " WHERE n_chars >= lo AND n_chars <= hi"
    ),
    # independent combinatorial formulation: the shared-source graph is
    # a disjoint union of cliques, so triangles = sum C(n, 3)
    "kg_triangles": (
        "SELECT CAST(COALESCE(SUM(n * (n - 1) * (n - 2) / 6), 0) AS BIGINT)"
        " AS n_triangles FROM"
        " (SELECT COUNT(*) AS n FROM documents GROUP BY source)"
    ),
    "kg_kcore": (
        # disjoint per-source cliques: the k-core keeps every node of
        # a size-n clique iff n > k, at in-core degree n - 1
        "SELECT doc_id AS node, CAST(n - 1 AS BIGINT) AS degree FROM ("
        " SELECT doc_id, COUNT(*) OVER (PARTITION BY source) AS n"
        " FROM documents) WHERE n > 10"
    ),
    "kg_link_pred": (
        # order—part bipartite graph: common neighbors of two ORDER
        # nodes = shared distinct parts; degree of an order node = its
        # distinct-part count.  jaccard_ppm uses integer floor division
        # (exact; matches the engine's int64 arithmetic).
        "WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),"
        " deg AS (SELECT o, COUNT(*) AS d FROM e GROUP BY o),"
        " pairs AS (SELECT e1.o AS u, e2.o AS v, CAST(COUNT(*) AS BIGINT) AS common"
        "  FROM e e1 JOIN e e2 ON e1.p = e2.p AND e1.o < e2.o GROUP BY 1, 2)"
        " SELECT u, v, common, du.d AS deg_u, dv.d AS deg_v,"
        "  CAST(common * 1000000 // (du.d + dv.d - common) AS BIGINT) AS jaccard_ppm"
        " FROM pairs JOIN deg du ON pairs.u = du.o JOIN deg dv ON pairs.v = dv.o"
        " ORDER BY jaccard_ppm DESC, u ASC, v ASC LIMIT 100"
    ),
    "kg_bfs_depth": (
        "WITH RECURSIVE d(node, depth) AS ("
        " SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)"
        " UNION ALL SELECT c.doc_id, d.depth + 1 FROM documents c"
        "  JOIN d ON c.doc_id // 4 = d.node WHERE c.doc_id >= 1) "
        "SELECT node, depth FROM d"
    ),
    "kg_minus": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d, t2.obj_value AS src "
        "FROM t t1 JOIN t t2 ON t2.subj = t1.subj "
        "WHERE t1.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' "
        "AND t1.obj_value = 'http://schema.org/Document' "
        "AND t2.pred = 'http://schema.org/source' "
        "AND t1.subj NOT IN (SELECT subj FROM t WHERE"
        " pred = 'http://schema.org/inLanguage' AND obj_value = 'zh')"
        % _TYPED_TRIPLES_SQL
    ),
    "kg_expr_exists": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d, t1.obj_value AS src FROM t t1 "
        "WHERE t1.pred = 'http://schema.org/source' "
        "AND (EXISTS (SELECT 1 FROM t a WHERE a.subj = t1.subj"
        " AND a.pred = 'http://schema.org/inLanguage'"
        " AND a.obj_value = 'zh')"
        " OR t1.subj LIKE '%%1%%')" % _TYPED_TRIPLES_SQL
    ),
    "kg_not_exists": (
        "WITH t AS (%s) "
        "SELECT t1.subj AS d, t1.obj_value AS src FROM t t1 "
        "WHERE t1.pred = 'http://schema.org/source' "
        "AND NOT EXISTS (SELECT 1 FROM t a JOIN t b ON b.subj = a.subj"
        " WHERE a.pred = 'http://schema.org/inLanguage' AND a.obj_value = 'zh'"
        " AND b.pred = 'http://schema.org/source'"
        " AND b.obj_value = t1.obj_value)" % _TYPED_TRIPLES_SQL
    ),
    "kg_values_bind": (
        "WITH t AS (%s) "
        "SELECT subj AS d, obj_value AS l, upper(obj_value) AS lu FROM t"
        " WHERE pred = 'http://schema.org/inLanguage'"
        " AND obj_value IN ('zh', 'en')" % _TYPED_TRIPLES_SQL
    ),
    "kg_distinct_src": (
        "WITH t AS (%s) "
        "SELECT DISTINCT obj_value AS src FROM t"
        " WHERE pred = 'http://schema.org/source'" % _TYPED_TRIPLES_SQL
    ),
    "kg_subclass_closure": (
        "WITH RECURSIVE anc(node, a) AS ("
        " SELECT doc_id, doc_id // 4 FROM documents WHERE doc_id >= 1"
        " UNION ALL SELECT node, a // 4 FROM anc WHERE a >= 1) "
        "SELECT node, a AS anc FROM anc"
    ),
    # 10-iteration power-iteration twins of stages/pagerank.py: the
    # recursive term references `state` once (SQL rule), so the
    # dangling mass rides a window function computed before the edge
    # join; rank anchors MUST cast ::DOUBLE or DuckDB types the column
    # DECIMAL(2,1) and truncates every iteration.  Driver value-hash
    # rounds floats to 6 dp, absorbing summation-order ulps.
    "kg_pagerank": _PAGERANK_SQL_TMPL
    % {"e_init": "(1.0 / (SELECT COUNT(*) FROM nodes))::DOUBLE",
       "e_j": "(1.0 / (SELECT COUNT(*) FROM nodes))"},
    "kg_ppr": _PAGERANK_SQL_TMPL
    % {"e_init": "(CASE WHEN n.node IN (5, 21) THEN 0.5 ELSE 0.0 END)::DOUBLE",
       "e_j": "(CASE WHEN j.node IN (5, 21) THEN 0.5 ELSE 0.0 END)"},
    "kg_degree_hist": (
        "WITH %s, m AS ("
        "SELECT CASE WHEN d.doc_id %% 5 = 0 THEN a.entity ELSE %s END AS subj "
        "FROM documents d LEFT JOIN aliases a ON a.i = d.doc_id %% 50), "
        "deg AS (SELECT subj, COUNT(*) AS degree FROM m GROUP BY subj) "
        "SELECT degree, COUNT(*) AS n_subjects FROM deg GROUP BY degree"
        % (_alias_values_sql(), _SUBJ.replace("doc_id", "d.doc_id"))
    ),
    "embedding_dups": (
        "SELECT vec_id AS a, vec_id + 1000000 AS b FROM embeddings"
        " WHERE vec_id % 10 = 0"
    ),
    "dedup_semantic": (
        "SELECT vec_id AS a, vec_id + 1000000 AS b,"
        " CAST(1000000 AS BIGINT) AS sim_micro FROM embeddings"
        " WHERE vec_id % 10 = 0"
    ),
    "quality_signals": _quality_signals_sql(),
    # regenerates the synthetic PCM waveform (a deterministic integer
    # formula of doc_id) and recomputes RMS in SQL — checking the REAL
    # RIFF encode -> parse -> feature chain end to end; non-wav rows
    # surface as zeros in both engines
    # synthetic PPM dims are pure doc_id formulas: the twin predicts
    # the REAL header parse's outputs (and that malformed/unsupported
    # branches do NOT decode)
    "multimodal_features": (
        "SELECT doc_id AS media_id,"
        " CAST(CASE WHEN doc_id % 6 = 0 THEN 300 + (doc_id % 4) * 8"
        "  ELSE 0 END AS INTEGER) AS width,"
        " CAST(CASE WHEN doc_id % 6 = 0 THEN 200 + (doc_id % 3) * 8"
        "  ELSE 0 END AS INTEGER) AS height,"
        " doc_id % 6 = 0 AS decoded"
        " FROM documents"
    ),
    # the exploded frame layout is a closed form: videos (doc_id%6==2)
    # fan out to 4 frames at 1000 ms intervals, everything else
    # surfaces as ONE diagnostic row (frame_idx -1) — silent drops or
    # wrong expansion go red
    "multimodal_frames": (
        "WITH v AS (SELECT doc_id, unnest(range(0, 4)) AS i FROM documents"
        " WHERE doc_id % 6 = 2)"
        " SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,"
        "  CAST(i * 1000 AS BIGINT) AS ts_ms FROM v"
        " UNION ALL SELECT doc_id, CAST(-1 AS INTEGER), CAST(0 AS BIGINT)"
        " FROM documents WHERE doc_id % 6 <> 2"
    ),
    # post-resize byte sizes are closed forms of doc_id: valid PPM ->
    # 15-byte header + 768 * (h*256 // w); truncated PPM passthrough ->
    # (15 + w*h*3) // 2; WAV -> 44 + 2*n; fake MP4 -> min(16 +
    # strlen(text), 4096); PNG stub -> 8 + 8*16
    "multimodal_resize": (
        "SELECT doc_id AS media_id,"
        " CAST(CASE doc_id % 6"
        "  WHEN 0 THEN 15 + 768 * (((200 + (doc_id % 3) * 8) * 256)"
        "   // (300 + (doc_id % 4) * 8))"
        "  WHEN 3 THEN (15 + (300 + (doc_id % 4) * 8)"
        "   * (200 + (doc_id % 3) * 8) * 3) // 2"
        "  WHEN 1 THEN 44 + 2 * (1600 + (doc_id % 4) * 400)"
        "  WHEN 4 THEN 44 + 2 * (1600 + (doc_id % 4) * 400)"
        "  WHEN 2 THEN least(16 + strlen(text), 4096)"
        "  ELSE 8 + 8 * 16 END AS BIGINT) AS n_bytes,"
        " doc_id % 6 = 0 AS resized"
        " FROM documents"
    ),
    "multimodal_audio": (
        "WITH w AS (SELECT doc_id, 1600 + (doc_id % 4) * 400 AS n,"
        " (doc_id % 7) + 1 AS step FROM documents WHERE doc_id % 6 IN (1, 4)),"
        " e AS (SELECT doc_id, n, unnest(range(0, n)) AS i, step FROM w),"
        " r AS (SELECT doc_id, any_value(n) AS n,"
        "  CAST(FLOOR(sqrt(avg(pow(((i * step * 257) % 65536 - 32768)"
        " / 32768.0, 2))) * 1000 + 0.5) AS BIGINT) AS rms"
        " FROM e GROUP BY doc_id)"
        " SELECT doc_id AS media_id, 8000 AS sample_rate,"
        "  CAST(n AS BIGINT) AS n_samples,"
        "  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,"
        "  rms AS rms_milli FROM r"
        " UNION ALL SELECT doc_id, 0, 0, 0, 0 FROM documents"
        " WHERE doc_id % 6 NOT IN (1, 4)"
    ),
    "text_normalize": (
        # same planted suffix as the query: ' cafe'+U+0301 (decomposed
        # acute), BEL, NBSP, tab runs; then the 4-step normalization
        "WITH planted AS (SELECT doc_id,"
        " text || ' cafe' || chr(769) || ' au' || chr(7) || ' lait'"
        " || chr(160) || 'x ' || chr(9) || chr(9) || ' end ' AS t"
        " FROM documents), n AS (SELECT doc_id,"
        " trim(regexp_replace(regexp_replace(replace(nfc_normalize(t),"
        " chr(160), ' '),"
        " '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),"
        " '\\s+', ' ', 'g')) AS text_norm FROM planted)"
        " SELECT doc_id, text_norm,"
        " CAST(length(text_norm) AS BIGINT) AS n_chars_norm FROM n"
    ),
    "pii_scrub": (
        "WITH planted AS (SELECT doc_id,"
        " text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com or +1-555-01' || CAST(doc_id AS VARCHAR)"
        " || ' from 10.0.0.' || CAST(doc_id AS VARCHAR) AS t FROM documents),"
        " s1 AS (SELECT doc_id,"
        "  CAST(len(regexp_extract_all(t, '%(em)s')) AS BIGINT) AS n_email,"
        "  regexp_replace(t, '%(em)s', '[EMAIL]', 'g') AS t FROM planted),"
        " s2 AS (SELECT doc_id, n_email,"
        "  CAST(len(regexp_extract_all(t, '%(ph)s')) AS BIGINT) AS n_phone,"
        "  regexp_replace(t, '%(ph)s', '[PHONE]', 'g') AS t FROM s1),"
        " s3 AS (SELECT doc_id, n_email, n_phone,"
        "  CAST(len(regexp_extract_all(t, '%(ip)s')) AS BIGINT) AS n_ip,"
        "  regexp_replace(t, '%(ip)s', '[IP]', 'g') AS t FROM s2) "
        "SELECT doc_id, t AS text_clean, n_email, n_phone, n_ip FROM s3"
        % {
            "em": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "ph": r"\+\d[\d\- ]{6,}\d",
            "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        }
    ),
    "lineitem_corr": (
        "SELECT l_returnflag,"
        " CAST(FLOOR(corr(l_extendedprice, l_quantity) * 1e6 + 0.5) AS BIGINT)"
        " AS corr_micro FROM lineitem GROUP BY l_returnflag"
    ),
    "events_pivot": (
        "SELECT user_id,"
        + ",".join(
            " CAST(SUM(CASE WHEN event_type = '%s' THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_%s" % (t, t)
            for t in ("click", "view", "purchase", "signup", "error")
        )
        + " FROM events GROUP BY user_id"
    ),
    "orders_topk_concat": (
        "WITH ranked AS (SELECT o_orderpriority, o_orderkey,"
        " ROW_NUMBER() OVER (PARTITION BY o_orderpriority"
        " ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) "
        "SELECT o_orderpriority,"
        " STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_keys "
        "FROM ranked WHERE rn <= 5 GROUP BY o_orderpriority"
    ),
    "orders_rollup": (
        "SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,"
        " COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,"
        " COUNT(*) AS n_orders,"
        " CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
        " AS total_cents "
        "FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
    ),
    "heavy_tokens": (
        "SELECT token AS key, COUNT(*) AS est_count FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token"
        " FROM documents) GROUP BY token"
    ),
    "events_running_total": (
        "SELECT event_id, CAST(SUM(CAST(ROUND(value * 1000.0) AS BIGINT))"
        " OVER (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_milli FROM events"
    ),
    "docs_stratified_sample": (
        "SELECT doc_id, lang, source FROM documents"
        " WHERE CASE WHEN lang = 'zh' THEN doc_id % 2 = 0"
        " ELSE doc_id % 10 = 0 END"
    ),
    "events_user_deltas": (
        "SELECT event_id, COALESCE(CAST(epoch_us(ts) - LAG(epoch_us(ts))"
        " OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT), -1)"
        " AS delta_us FROM events"
    ),
    "local_supplier_volume": (
        "SELECT n.n_name AS n_name,"
        " CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100.0)"
        " AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey"
        " AND o.o_orderdate >= TIMESTAMP '1996-01-01'"
        " AND o.o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY 1 ORDER BY revenue_cents DESC"
    ),
    "bm25_search": (
        "WITH toks AS (SELECT doc_id,"
        " unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token"
        " FROM documents),"
        " dl AS (SELECT doc_id, COUNT(*) AS doc_len FROM toks GROUP BY 1),"
        " stats AS (SELECT CAST(SUM(doc_len) AS DOUBLE)"
        "  / (SELECT COUNT(*) FROM documents) AS avgdl,"
        "  (SELECT COUNT(*) FROM documents) AS n FROM dl),"
        " q(token) AS (VALUES ('window'), ('merge'), ('stream')),"
        " tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks"
        "  WHERE token IN (SELECT token FROM q) GROUP BY 1, 2),"
        " df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),"
        " contrib AS (SELECT tf.doc_id,"
        "  CAST(FLOOR(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))"
        "   * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len"
        "   / stats.avgdl)) * 1e6 + 0.5) AS BIGINT) AS c"
        "  FROM tf JOIN df USING (token) JOIN dl USING (doc_id)"
        "  CROSS JOIN stats) "
        "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_micro FROM contrib"
        " GROUP BY doc_id ORDER BY score_micro DESC, doc_id ASC LIMIT 20"
    ),
    "tfidf_top50": (
        "WITH toks AS (SELECT doc_id,"
        " unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token"
        " FROM documents),"
        " tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),"
        " df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),"
        " n AS (SELECT COUNT(*) AS n FROM documents) "
        "SELECT tf.doc_id AS doc_id, tf.token AS token,"
        " CAST(FLOOR(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 1e6 + 0.5)"
        " AS BIGINT) AS score_micro "
        "FROM tf JOIN df ON df.token = tf.token CROSS JOIN n "
        "ORDER BY score_micro DESC, doc_id ASC, token ASC LIMIT 50"
    ),
}

# Composed oracle: curation_v2 embeds the verified gopher_rules /
# gopher_repetition oracle queries as CTE subqueries (nested WITH is
# legal inside a parenthesized subquery), then the curation chain's
# dedup / decontamination / split fragments.
ORACLE_SQL["curation_v2"] = (
    # min_stopwords=1 in the v2 chain (see q_curation_v2) — rewrite the
    # embedded gopher_rules threshold clause accordingly
    "WITH gop AS ("
    + ORACLE_SQL["gopher_rules"].replace("n_stopwords < 2", "n_stopwords < 1")
    + "),"
    " rep AS (" + ORACLE_SQL["gopher_repetition"] + "),"
    " gated AS (SELECT d.doc_id, d.text, d.lang FROM documents d"
    "  JOIN gop ON gop.doc_id = d.doc_id AND gop.mask = 0"
    "  JOIN rep ON rep.doc_id = d.doc_id AND rep.mask = 0),"
    " kk AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)),"
    " kept AS (SELECT g.* FROM gated g JOIN kk USING (doc_id)),"
    " needles AS (SELECT array_to_string(array_slice("
    "  string_split(text, ' '), 11, 18), ' ') AS needle FROM documents"
    "  WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 18),"
    " clean AS (SELECT kept.* FROM kept WHERE NOT EXISTS ("
    "  SELECT 1 FROM needles n"
    "  WHERE position(' ' || n.needle || ' ' IN ' ' || kept.text || ' ')"
    "   > 0)) "
    "SELECT CASE WHEN substr(md5(text), 1, 2) < '40'"
    " THEN 'holdout' ELSE 'train' END AS split, lang,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens"
    " FROM clean GROUP BY 1, 2"
)


# dsir_resample Gumbel noise = splitmix64 over doc_id XOR seed-mix,
# reproduced exactly in SQL: the 64x64 multiply runs mod 2^64 via a
# 32-bit split ((a>>32)*C % 2^32)*2^32 + (a&0xffffffff)*C — each term
# < 2^96 so it fits signed INT128 (a direct product overflows it).
# u = (h+1)/(2^64+2); key = logw_micro/1e6 - ln(-ln u); the driver
# rounds floats to 6 dp, absorbing ulps.  seed=7 -> mix constant
# 7 * 0x5851F42D4C957F2D mod 2^64 = 7655465419508447803.
ORACLE_SQL["dsir_resample"] = (
    "WITH w0 AS (" + ORACLE_SQL["dsir_weights"] + "),"
    + ' gk_a AS (SELECT doc_id, logw_micro,  xor(CAST(doc_id AS UBIGINT), CAST(7655465419508447803 AS UBIGINT)) AS z  FROM w0), gk_b AS (SELECT doc_id, logw_micro,  CAST((CAST(z AS HUGEINT) + 11400714819323198485)   % 18446744073709551616 AS UBIGINT) AS z FROM gk_a), gk_c AS (SELECT doc_id, logw_micro, CAST(((CAST((xor(z, z >> 30)) >> 32 AS HUGEINT) * 13787848793156543929 % 4294967296) * 4294967296 + CAST((xor(z, z >> 30)) & 4294967295 AS HUGEINT) * 13787848793156543929) % 18446744073709551616 AS UBIGINT) AS z FROM gk_b), gk_d AS (SELECT doc_id, logw_micro, CAST(((CAST((xor(z, z >> 27)) >> 32 AS HUGEINT) * 10723151780598845931 % 4294967296) * 4294967296 + CAST((xor(z, z >> 27)) & 4294967295 AS HUGEINT) * 10723151780598845931) % 18446744073709551616 AS UBIGINT) AS z FROM gk_c), gk_e AS (SELECT doc_id, logw_micro, xor(z, z >> 31) AS h FROM gk_d) SELECT doc_id, logw_micro,  logw_micro / 1000000.0  - ln(-ln((CAST(h AS DOUBLE) + 1.0) / 18446744073709551618.0))  AS gumbel_key FROM gk_e ORDER BY gumbel_key DESC LIMIT 50'
)

# fingerprints_rolling (md5 hash mode): token hash =
# md5_number_upper (LE-uint64 of first 8 md5 bytes), window hash =
# sum_k h_{i+k} * B^k mod 2^64 (B = FNV prime 1099511628211; B^k
# constants inlined, multiplies 32-bit-split so terms fit INT128),
# winnow = MIN over each 4-run inside the doc + global-min rule for
# docs with < 4 windows, DISTINCT per (doc, fp).
ORACLE_SQL["fingerprints_rolling"] = "WITH t AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ts FROM documents), pos AS (SELECT doc_id, ts, unnest(range(1, len(ts) - 8 + 2)) AS i  FROM t WHERE len(ts) >= 8), win AS (SELECT doc_id, i,  CAST(((CAST(md5_number_upper(ts[i+0]) AS HUGEINT)) + (((CAST(md5_number_upper(ts[i+1]) >> 32 AS HUGEINT) * 1099511628211 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+1]) & 4294967295 AS HUGEINT) * 1099511628211)) + (((CAST(md5_number_upper(ts[i+2]) >> 32 AS HUGEINT) * 956575116354345 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+2]) & 4294967295 AS HUGEINT) * 956575116354345)) + (((CAST(md5_number_upper(ts[i+3]) >> 32 AS HUGEINT) * 624165263380053675 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+3]) & 4294967295 AS HUGEINT) * 624165263380053675)) + (((CAST(md5_number_upper(ts[i+4]) >> 32 AS HUGEINT) * 11527715348014283921 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+4]) & 4294967295 AS HUGEINT) * 11527715348014283921)) + (((CAST(md5_number_upper(ts[i+5]) >> 32 AS HUGEINT) * 913917546033277539 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+5]) & 4294967295 AS HUGEINT) * 913917546033277539)) + (((CAST(md5_number_upper(ts[i+6]) >> 32 AS HUGEINT) * 15895002104753931833 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+6]) & 4294967295 AS HUGEINT) * 15895002104753931833)) + (((CAST(md5_number_upper(ts[i+7]) >> 32 AS HUGEINT) * 14218562807570617051 % 4294967296) * 4294967296 + CAST(md5_number_upper(ts[i+7]) & 4294967295 AS HUGEINT) * 14218562807570617051))) % 18446744073709551616 AS UBIGINT) AS wh FROM pos), runm AS (SELECT doc_id, i, wh,  MIN(wh) OVER (PARTITION BY doc_id ORDER BY i   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS rmin,  COUNT(*) OVER (PARTITION BY doc_id) AS nwin FROM win) SELECT DISTINCT doc_id, rmin AS fp FROM runm  WHERE nwin >= 4 AND i <= nwin - 3 UNION SELECT doc_id, MIN(wh) AS fp FROM runm WHERE nwin < 4 GROUP BY doc_id"
