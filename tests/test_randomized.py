"""Seeded randomized structural tests (SURVEY.md §5.2.4, light form):
compose random nestings of known-semantics attribute patterns and
check the kernel against (a) a direct count oracle for a restricted
pattern family, (b) determinism, (c) never-crash."""

import random

from rdfa_ray.kernel import distill
from rdfa_ray.rdf.terms import IRI

BASE = "http://www.example.org/rt"


def _gen_simple(rng, counter, depth=0):
    """Family A: only plain <div> containers and leaf
    <span about=#sN property=ex:p>text</span> with globally unique
    subjects — every leaf yields exactly one distinct triple (the
    graph is a SET, so duplicate subjects would collapse)."""
    if depth > 4 or rng.random() < 0.3:
        n = rng.randrange(1, 4)
        out = []
        for i in range(n):
            counter[0] += 1
            out.append(
                '<span about="#s%d" property="ex:p">t%d</span>' % (counter[0], i)
            )
        return "".join(out), n
    parts, count = [], 0
    for _ in range(rng.randrange(1, 4)):
        inner, c = _gen_simple(rng, counter, depth + 1)
        parts.append("<div>%s</div>" % inner)
        count += c
    return "".join(parts), count


def test_leaf_count_oracle():
    for seed in range(25):
        rng = random.Random(seed)
        body, n_leaves = _gen_simple(rng, [0])
        doc = '<div prefix="ex: http://e/">%s</div>' % body
        triples, diags = distill(doc, base=BASE)
        got = [t for t in triples if t[1] == (IRI, "http://e/p")]
        assert len(got) == n_leaves, (seed, doc)
        assert not diags


_ATTR_POOL = [
    'about="#a%d"',
    'resource="#r%d"',
    'href="#h%d"',
    'property="ex:p%d"',
    'rel="ex:r%d"',
    'rev="ex:v%d"',
    'typeof="ex:T%d"',
    'content="c%d"',
    'datatype="ex:d%d"',
    'inlist=""',
    'lang="en"',
    'vocab="http://v%d.org/"',
    'prefix="q%d: http://q%d/"',
]


def _gen_adversarial(rng, depth=0):
    if depth > 5 or rng.random() < 0.35:
        return "text%d" % rng.randrange(10)
    n_attrs = rng.randrange(0, 4)
    attrs = " ".join(
        a.replace("%d", str(rng.randrange(5))) if "%d" in a else a
        for a in rng.sample(_ATTR_POOL, n_attrs)
    )
    inner = "".join(_gen_adversarial(rng, depth + 1) for _ in range(rng.randrange(1, 3)))
    return "<div %s>%s</div>" % (attrs, inner)


def test_adversarial_determinism_no_crash():
    for seed in range(40):
        rng = random.Random(1000 + seed)
        doc = '<div prefix="ex: http://e/">%s</div>' % _gen_adversarial(rng)
        t1, d1 = distill(doc, base=BASE)
        t2, d2 = distill(doc, base=BASE)
        assert t1 == t2  # bnode labels included: determinism
        for (s, p, o) in t1:
            assert p[0] == IRI  # predicates are never bnodes
            assert s[0] in ("iri", "bnode")


def _gen_rel_chain(rng, counter, depth=0):
    """Family B: rel-chains with incomplete triples — each
    <div about=#X rel=ex:r> containing K direct subject-bearing
    children yields exactly K (X, r, child) triples."""
    counter[0] += 1
    me = counter[0]
    k = rng.randrange(1, 4)
    children = []
    expected = 0
    for _ in range(k):
        if depth < 3 and rng.random() < 0.4:
            inner, c = _gen_rel_chain(rng, counter, depth + 1)
            children.append(inner)
            expected += 1 + c  # the child itself + its own rel triples
        else:
            counter[0] += 1
            children.append('<span about="#s%d">leaf</span>' % counter[0])
            expected += 1
    return (
        '<div about="#s%d" rel="ex:r">%s</div>' % (me, "".join(children)),
        expected,
    )


def test_rel_chain_count_oracle():
    for seed in range(20):
        rng = random.Random(500 + seed)
        body, n_rel = _gen_rel_chain(rng, [0])
        doc = '<div prefix="ex: http://e/">%s</div>' % body
        triples, diags = distill(doc, base=BASE)
        got = [t for t in triples if t[1] == (IRI, "http://e/r")]
        assert len(got) == n_rel, (seed, doc)


def test_randomized_serializer_roundtrip():
    """Property: for ANY kernel output graph, Turtle and JSON-LD
    serializations parse back (engine's own readers) to an isomorphic
    graph — serializer correctness beyond the curated corpus."""
    from rdfa_ray.kernel.embedded import parse_turtle
    from rdfa_ray.kernel.state import BnodeGen
    from rdfa_ray.rdf.isomorphism import isomorphic
    from rdfa_ray.rdf.jsonld import graph_to_jsonld, jsonld_to_graph
    from rdfa_ray.rdf.turtle import graph_to_turtle

    checked = 0
    for seed in range(40):
        rng = random.Random(5000 + seed)
        doc = '<div prefix="ex: http://e/">%s</div>' % _gen_adversarial(rng)
        triples, _ = distill(doc, base=BASE)
        if not triples:
            continue
        checked += 1
        ttl = graph_to_turtle(triples)
        assert isomorphic(parse_turtle(ttl, "", BnodeGen()), triples), (seed, ttl)
        jd = graph_to_jsonld(triples)
        assert isomorphic(jsonld_to_graph(jd, BnodeGen()), triples), (seed, jd)
    assert checked >= 20  # the generator must actually produce graphs
