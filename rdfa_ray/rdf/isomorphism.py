"""Graph isomorphism under blank-node renaming.

This is the equivalence the P/R metric (BASELINE.md) uses: two RDF
graphs are equal iff there is a bijection between their blank nodes
making the triple sets identical.  The reference relies on rdflib's
``isomorphic``; this is an independent implementation: signature-based
partition refinement followed by backtracking over the (tiny)
ambiguous classes.  Intended for test fixtures / per-turn graphs, not
for billion-triple graphs.
"""

from __future__ import annotations

from itertools import permutations

from .terms import BNODE


def _bnodes_of(triples):
    out = set()
    for s, p, o in triples:
        if s[0] == BNODE:
            out.add(s[1])
        if o[0] == BNODE:
            out.add(o[1])
    return out


def _ground(term, mapping):
    if term[0] == BNODE:
        return (BNODE, mapping.get(term[1], None))
    return term


def _signature(triples, label):
    """Structural signature of one bnode: its ground-context triples."""
    sig = []
    for s, p, o in triples:
        s_is = s[0] == BNODE and s[1] == label
        o_is = o[0] == BNODE and o[1] == label
        if not (s_is or o_is):
            continue
        sk = ("*self*",) if s_is else (("?",) if s[0] == BNODE else s)
        ok = ("*self*",) if o_is else (("?",) if o[0] == BNODE else o)
        sig.append((sk, p, ok))
    return tuple(sorted(map(repr, sig)))


def isomorphic(g1, g2) -> bool:
    g1, g2 = set(g1), set(g2)
    ground1 = {t for t in g1 if t[0][0] != BNODE and t[2][0] != BNODE}
    ground2 = {t for t in g2 if t[0][0] != BNODE and t[2][0] != BNODE}
    if ground1 != ground2:
        return False
    b1, b2 = _bnodes_of(g1), _bnodes_of(g2)
    if len(b1) != len(b2):
        return False
    if not b1:
        return True

    sig1: dict[str, list[str]] = {}
    sig2: dict[str, list[str]] = {}
    for lb in b1:
        sig1.setdefault(_signature(g1, lb), []).append(lb)
    for lb in b2:
        sig2.setdefault(_signature(g2, lb), []).append(lb)
    if set(sig1) != set(sig2):
        return False
    for k in sig1:
        if len(sig1[k]) != len(sig2[k]):
            return False

    # Backtrack within signature classes (classes are almost always size 1).
    classes = [(sorted(sig1[k]), sorted(sig2[k])) for k in sorted(sig1)]

    def try_assign(idx, mapping):
        if idx == len(classes):
            mapped = {( _ground(s, mapping), p, _ground(o, mapping)) for s, p, o in g1}
            return mapped == g2
        left, right = classes[idx]
        if len(left) > 6:
            # Degenerate class: fall back to greedy identity-order mapping
            # (fixtures never hit this; avoid factorial blowups).
            m = dict(mapping)
            m.update(zip(left, right))
            return try_assign(idx + 1, m)
        for perm in permutations(right):
            m = dict(mapping)
            m.update(zip(left, perm))
            if try_assign(idx + 1, m):
                return True
        return False

    return try_assign(0, {})


def diff_report(got, expected) -> str:
    """Human-readable diff for test failures (after naive bnode erasure)."""
    from .ntriples import triple_to_ntriples

    def blur(t):
        def b(x):
            return (BNODE, "_") if x[0] == BNODE else x
        return (b(t[0]), t[1], b(t[2]))

    got_b = sorted(triple_to_ntriples(blur(t)) for t in got)
    exp_b = sorted(triple_to_ntriples(blur(t)) for t in expected)
    lines = ["--- got (%d) ---" % len(got_b)]
    lines += got_b
    lines.append("--- expected (%d) ---" % len(exp_b))
    lines += exp_b
    return "\n".join(lines)


def precision_recall(got, expected) -> tuple[float, float]:
    """Triple-set P/R after canonical bnode-signature relabeling.

    Used for the aggregate corpus metric; exact graphs should score 1.0.
    """
    def canon(triples):
        triples = set(triples)
        labels = {}
        for lb in _bnodes_of(triples):
            labels[lb] = _signature(triples, lb)
        out = set()
        for s, p, o in triples:
            s2 = (BNODE, labels[s[1]]) if s[0] == BNODE else s
            o2 = (BNODE, labels[o[1]]) if o[0] == BNODE else o
            out.add((s2, p, o2))
        return out

    cg, ce = canon(got), canon(expected)
    inter = len(cg & ce)
    p = inter / len(cg) if cg else (1.0 if not ce else 0.0)
    r = inter / len(ce) if ce else 1.0
    return p, r
