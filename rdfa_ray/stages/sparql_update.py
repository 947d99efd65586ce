"""SPARQL 1.1 Update text front-end over the persisted KG store.

The reference distiller hands its output to an rdflib ``Graph`` whose
public surface includes ``graph.update("DELETE ... INSERT ... WHERE
...")`` alongside ``graph.query(...)`` (the reference's processor
mutates its graphs through exactly this API family — e.g. the
processor-graph bookkeeping in ``/root/reference/pyRdfa/__init__.py``
adds/removes triples on live graphs).  ``rdfa_ray.query`` already
covers the read side; this module completes the write side by
compiling SPARQL *Update* strings onto the store's generational,
partition-pruned rewrite (``stages/kgstore.update_kg``).

Supported fragment (W3C SPARQL 1.1 Update §3):

* ``INSERT DATA { ground triples }``  /  ``DELETE DATA { ... }``
* ``DELETE WHERE { patterns }`` — the pattern doubles as the template
* ``[DELETE { tmpl }] [INSERT { tmpl }] WHERE { group }`` — the full
  modify form; the WHERE group supports everything the SELECT engine
  does (OPTIONAL / FILTER / VALUES / property paths / ...), because it
  is delegated to that engine verbatim
* ``CLEAR DEFAULT`` / ``CLEAR ALL`` — manifest-swap to an empty store
* multiple operations separated by ``;`` run left-to-right, each
  against the store state the previous one produced (§3.1); PREFIX
  prologues accumulate across operations

Execution shape (the 100-TB story): the WHERE group is evaluated by
``execute_on_store`` — so predicate pushdown prunes the scan to the
partitions the pattern names — and the bindings are materialized ONCE
before the store is touched (SPARQL's evaluate-then-mutate contract;
both templates instantiate from the same snapshot).  Template
instantiation is the same vectorized map-side projection CONSTRUCT
uses, and ``update_kg`` rewrites only the partitions whose predicates
appear in a delta, as new generations behind an atomic manifest swap.
A failed update never corrupts: the manifest still points at the old
snapshot.

Deliberate deviations, all raised loudly: blank nodes in templates
(fresh-bnode-per-binding needs row-level id minting — use a skolem IRI
instead), GRAPH-qualified quad blocks (the store's update path is
triple-form), and LOAD/SERVICE (no network in this engine).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .sparql_text import (
    SparqlSyntaxError,
    _Parser,
    _resolve,
    _tokenize,
)

_COLS = ("subj", "pred", "obj_value")


# --------------------------------------------------------------------------
# parsing


def _parse_prefixes(p: _Parser, prefixes: dict) -> None:
    while p.at_kw("PREFIX"):
        p.next()
        kind, pname = p.next()
        if kind != "pname":
            raise SparqlSyntaxError("PREFIX needs a pname:")
        pre = pname.split(":", 1)[0]
        kind, iri = p.next()
        if kind != "iri":
            raise SparqlSyntaxError("PREFIX needs an <iri>")
        prefixes[pre] = iri[1:-1]


def _parse_template_block(p: _Parser, prefixes: dict, ground: bool) -> list:
    """``{ s p o ; p2 o2 . ... }`` with predicate-object lists.  No
    property paths (SPARQL forbids them in templates).  ``ground=True``
    (DATA forms) additionally rejects variables."""
    p.expect_op("{")
    out = []
    while p.peek() != ("op", "}"):
        sk, sv = p.next()
        if sk is None:
            raise SparqlSyntaxError("unterminated { } block")
        subj = _resolve(sk, sv, prefixes)
        while True:
            pk, pv = p.next()
            pred = _resolve(pk, pv, prefixes)
            ok, ov = p.next()
            obj = _resolve(ok, ov, prefixes)
            out.append((subj, pred, obj))
            if p.peek() == ("op", ";"):
                p.next()
                continue
            break
        if p.peek() == ("op", "."):
            p.next()
    p.expect_op("}")
    if ground:
        for t in out:
            for term in t:
                if isinstance(term, str) and term.startswith("?"):
                    raise SparqlSyntaxError(
                        "INSERT/DELETE DATA must be ground (got %s)" % term
                    )
    for t in out:
        for term in t:
            if isinstance(term, str) and term.startswith("_:"):
                raise SparqlSyntaxError(
                    "blank nodes in update templates are not supported;"
                    " mint a skolem IRI instead"
                )
    return out


def _raw_group(p: _Parser) -> str:
    """Capture a ``{ ... }`` group as re-serialized token text (brace
    depth tracked) so the WHERE clause can be delegated verbatim to the
    SELECT engine with its full feature set."""
    p.expect_op("{")
    depth, vals = 1, []
    while depth:
        kind, val = p.next()
        if kind is None:
            raise SparqlSyntaxError("unterminated WHERE group")
        if (kind, val) == ("op", "{"):
            depth += 1
        elif (kind, val) == ("op", "}"):
            depth -= 1
            if not depth:
                break
        vals.append(val)
    return " ".join(vals)


def parse_update(text: str) -> list[dict]:
    """Parse an update request into a list of operation dicts (run
    left-to-right).  Kinds: ``insert_data`` / ``delete_data`` (ground
    ``triples``), ``modify`` (``delete`` / ``insert`` templates +
    ``where`` text + ``prefixes``), ``clear``."""
    p = _Parser(_tokenize(text))
    prefixes: dict = {}
    ops: list[dict] = []
    while p.peek()[0] is not None:
        _parse_prefixes(p, prefixes)
        if p.peek()[0] is None:
            break
        if p.at_kw("INSERT") or p.at_kw("DELETE"):
            first = p.next()[1].upper()
            if p.at_kw("DATA"):
                p.next()
                triples = _parse_template_block(p, prefixes, ground=True)
                ops.append(
                    {
                        "op": "insert_data" if first == "INSERT" else "delete_data",
                        "triples": triples,
                    }
                )
            elif first == "DELETE" and p.at_kw("WHERE"):
                p.next()
                tmpl = _parse_template_block(p, prefixes, ground=False)
                ops.append(
                    {
                        "op": "modify",
                        "delete": tmpl,
                        "insert": [],
                        "where": _tmpl_text(tmpl),
                        "prefixes": dict(prefixes),
                    }
                )
            else:
                delete_tmpl, insert_tmpl = [], []
                if first == "DELETE":
                    delete_tmpl = _parse_template_block(p, prefixes, ground=False)
                    if p.at_kw("INSERT"):
                        p.next()
                        insert_tmpl = _parse_template_block(
                            p, prefixes, ground=False
                        )
                else:
                    insert_tmpl = _parse_template_block(p, prefixes, ground=False)
                p.expect_kw("WHERE")
                where = _raw_group(p)
                ops.append(
                    {
                        "op": "modify",
                        "delete": delete_tmpl,
                        "insert": insert_tmpl,
                        "where": where,
                        "prefixes": dict(prefixes),
                    }
                )
        elif p.at_kw("CLEAR"):
            p.next()
            kind, val = p.next()
            if kind != "kw" or val.upper() not in ("DEFAULT", "ALL"):
                raise SparqlSyntaxError(
                    "only CLEAR DEFAULT / CLEAR ALL are supported"
                )
            ops.append({"op": "clear"})
        elif p.at_kw("LOAD") or p.at_kw("SERVICE"):
            raise SparqlSyntaxError("LOAD/SERVICE need network — unsupported")
        else:
            raise SparqlSyntaxError("unsupported update operation %r" % (p.peek(),))
        if p.peek() == ("op", ";"):
            p.next()
    if not ops:
        raise SparqlSyntaxError("empty update request")
    return ops


def _tmpl_text(tmpl: list) -> str:
    """Render a parsed (already prefix-resolved) template back to
    pattern text for the SELECT engine (DELETE WHERE's pattern doubles
    as its own WHERE group).  The engine's term matching is lexical,
    so subject/object constants round-trip exactly as escaped string
    literals; predicate constants must be ``<iri>`` tokens (that is
    the only constant form the pattern grammar accepts there)."""
    parts = []
    for (s, p_, o) in tmpl:
        parts.append(
            "%s %s %s ."
            % (
                _so_text(s),
                p_ if p_.startswith("?") else "<%s>" % p_,
                _so_text(o),
            )
        )
    return " ".join(parts)


def _so_text(term: str) -> str:
    if term.startswith("?"):
        return term
    return '"%s"' % term.replace("\\", "\\\\").replace('"', '\\"')


# --------------------------------------------------------------------------
# execution


def _ground_ds(triples: list):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_pydict(
            {
                "subj": pa.array([t[0] for t in triples], pa.string()),
                "pred": pa.array([t[1] for t in triples], pa.string()),
                "obj_value": pa.array([t[2] for t in triples], pa.string()),
            }
        )
    )


def _instantiate(bindings, template: list, bound_vars: set):
    """Vectorized template instantiation over a bindings Dataset — the
    CONSTRUCT projection (stages/sparql.construct), plus the Update
    rule that a template variable must be bound by the WHERE group."""
    for t in template:
        for term in t:
            if isinstance(term, str) and term.startswith("?"):
                if term[1:] not in bound_vars:
                    raise SparqlSyntaxError(
                        "template variable %s is not bound by WHERE" % term
                    )

    def project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        outs = []
        for (s, p_, o) in template:
            cols, mask = {}, None
            for name, term in zip(_COLS, (s, p_, o)):
                if isinstance(term, str) and term.startswith("?"):
                    if term[1:] in batch.column_names:
                        col = pc.cast(batch.column(term[1:]), pa.string())
                        # an OPTIONAL-unbound ('' sentinel) variable
                        # skips this template triple for that solution
                        # (same SPARQL §16.2 rule CONSTRUCT applies)
                        m = pc.not_equal(pc.fill_null(col, ""), "")
                        mask = m if mask is None else pc.and_(mask, m)
                        cols[name] = col
                    else:  # schemaless empty block
                        cols[name] = pa.array([""] * n, pa.string())
                else:
                    cols[name] = pa.nulls(n, pa.string()).fill_null(term)
            t = pa.Table.from_pydict(cols)
            outs.append(t if mask is None else t.filter(mask))
        return pa.concat_tables(outs)

    return bindings.map_batches(project, batch_format="pyarrow")


def execute_update(store_dir: str, text: str, n_buckets: int = 64) -> dict:
    """Run a SPARQL Update string against a persisted KG store;
    returns the final store manifest.  Operations run sequentially;
    each modify evaluates its WHERE against the store snapshot the
    previous operation produced (kgstore generations make every
    snapshot consistent), materializes the bindings, then applies
    deletes-before-inserts in ONE generational rewrite."""
    from .kgstore import _read_meta, clear_kg, update_kg
    from .sparql_text import execute_on_store

    ops = parse_update(text)
    meta = None
    for op in ops:
        if op["op"] == "insert_data":
            meta = update_kg(store_dir, insert_ds=_ground_ds(op["triples"]))
        elif op["op"] == "delete_data":
            meta = update_kg(store_dir, delete_ds=_ground_ds(op["triples"]))
        elif op["op"] == "clear":
            meta = clear_kg(store_dir)
        else:  # modify
            prologue = "".join(
                "PREFIX %s: <%s> " % (k, v) for k, v in op["prefixes"].items()
            )
            select = "%sSELECT * WHERE { %s }" % (prologue, op["where"])
            # evaluate-then-mutate: snapshot the bindings BEFORE any
            # partition is rewritten; both templates read the snapshot
            bindings = execute_on_store(
                store_dir, select, n_buckets=n_buckets
            ).materialize()
            # schema() on a materialized dataset is free; its columns
            # ARE the bound variables (SELECT * projects them all).
            # None = zero bindings -> both deltas are empty -> no-op
            schema = bindings.schema()
            if schema is None:
                continue
            bound = set(schema.names)
            delete_ds = (
                _instantiate(bindings, op["delete"], bound)
                if op["delete"]
                else None
            )
            insert_ds = (
                _instantiate(bindings, op["insert"], bound)
                if op["insert"]
                else None
            )
            meta = update_kg(store_dir, insert_ds=insert_ds, delete_ds=delete_ds)
    return meta if meta is not None else _read_meta(store_dir)
