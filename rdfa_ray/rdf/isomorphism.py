"""Graph isomorphism under blank-node renaming.

This is the equivalence the P/R metric (BASELINE.md) uses: two RDF
graphs are equal iff there is a bijection between their blank nodes
making the triple sets identical.  The reference relies on rdflib's
``isomorphic``; this is an independent implementation:
Weisfeiler-Lehman-style color refinement (iterated neighborhood
signatures, interned in a table shared by both graphs so equal
structure gets equal color ids) followed by backtracking over the
remaining ambiguous classes.  One-hop signatures alone cannot
distinguish positions in long anonymous bnode chains (every interior
node looks alike); refinement propagates the distinguishable ends
inward.  Intended for test fixtures / per-turn graphs, not for
billion-triple graphs.
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


class _Interner:
    """Shared structure->small-int table: identical signatures computed
    from either graph intern to the same color id."""

    def __init__(self):
        self._table: dict = {}

    def __call__(self, key):
        c = self._table.get(key)
        if c is None:
            c = len(self._table)
            self._table[key] = c
        return c


def _refined_colors(triples, bnodes, intern: _Interner) -> dict:
    """WL color refinement over the bnode-adjacency of ``triples``."""
    # initial color: the ground-context one-hop signature
    init_sigs = {lb: [] for lb in bnodes}
    out_edges = {lb: [] for lb in bnodes}  # lb -> [(pred, neighbor)]
    in_edges = {lb: [] for lb in bnodes}
    for s, p, o in triples:
        s_b = s[0] == BNODE
        o_b = o[0] == BNODE
        if s_b:
            sk = "*self*"
            ok = "*self*" if (o_b and o[1] == s[1]) else ("?" if o_b else repr(o))
            init_sigs[s[1]].append((sk, p[1], ok))
            if o_b and o[1] != s[1]:
                out_edges[s[1]].append((p[1], o[1]))
        if o_b and not (s_b and s[1] == o[1]):
            sk = "?" if s_b else repr(s)
            init_sigs[o[1]].append((sk, p[1], "*self*"))
            if s_b:
                in_edges[o[1]].append((p[1], s[1]))

    colors = {lb: intern(tuple(sorted(init_sigs[lb]))) for lb in bnodes}
    n_classes = len(set(colors.values()))
    for _ in range(len(bnodes)):
        if n_classes == len(bnodes):
            break  # fully discrete
        new = {}
        for lb in bnodes:
            ctx = sorted(
                [("out", p, colors[nb]) for (p, nb) in out_edges[lb]]
                + [("in", p, colors[nb]) for (p, nb) in in_edges[lb]]
            )
            new[lb] = intern((colors[lb], tuple(ctx)))
        new_n = len(set(new.values()))
        colors = new
        if new_n == n_classes:
            break  # stable partition (classes only ever split)
        n_classes = new_n
    return colors


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

    intern = _Interner()
    col1 = _refined_colors(g1, b1, intern)
    col2 = _refined_colors(g2, b2, intern)

    sig1: dict[int, list[str]] = {}
    sig2: dict[int, list[str]] = {}
    for lb, c in col1.items():
        sig1.setdefault(c, []).append(lb)
    for lb, c in col2.items():
        sig2.setdefault(c, []).append(lb)
    if set(sig1) != set(sig2):
        return False
    for k in sig1:
        if len(sig1[k]) != len(sig2[k]):
            return False

    # Backtrack within color classes (classes are almost always size 1
    # after refinement).
    classes = [(sorted(sig1[k]), sorted(sig2[k])) for k in sorted(sig1)]

    def try_assign(idx, mapping):
        if idx == len(classes):
            mapped = {( _ground(s, mapping), p, _ground(o, mapping)) for s, p, o in g1}
            return mapped == g2
        left, right = classes[idx]
        if len(left) > 6:
            # Degenerate class survives refinement only for genuinely
            # interchangeable nodes (automorphic, e.g. N identical leaf
            # bnodes); identity-order mapping is then valid.
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
    """Triple-set P/R after canonical bnode relabeling by refined WL
    color (shared intern table, so identical structures in the two
    graphs canonicalize identically).

    Used for the aggregate corpus metric; exact graphs should score 1.0.
    """
    intern = _Interner()

    def canon(triples, colors):
        out = set()
        for s, p, o in triples:
            s2 = (BNODE, colors[s[1]]) if s[0] == BNODE else s
            o2 = (BNODE, colors[o[1]]) if o[0] == BNODE else o
            out.add((s2, p, o2))
        return out

    got, expected = set(got), set(expected)
    cg = canon(got, _refined_colors(got, _bnodes_of(got), intern))
    ce = canon(expected, _refined_colors(expected, _bnodes_of(expected), intern))
    inter = len(cg & ce)
    p = inter / len(cg) if cg else (1.0 if not ce else 0.0)
    r = inter / len(ce) if ce else 1.0
    return p, r
