"""Conformance corpus: every fixture must be graph-isomorphic to its
hand-derived golden (the P/R gate demands >=0.95 in aggregate; the
embedded corpus itself must score 1.0 — SURVEY.md §5.2)."""

import json
import pathlib

import pytest

from rdfa_ray.kernel import KernelOptions, distill
from rdfa_ray.rdf.isomorphism import diff_report, isomorphic, precision_recall
from rdfa_ray.rdf.ntriples import parse_ntriples

CORPUS = pathlib.Path(__file__).parent / "corpus"
NAMES = sorted(p.stem for p in CORPUS.glob("*.html"))


def load(name):
    markup = (CORPUS / f"{name}.html").read_text()
    expected = parse_ntriples((CORPUS / f"{name}.nt").read_text())
    meta = json.loads((CORPUS / f"{name}.json").read_text())
    return markup, expected, meta


def run_fixture(name):
    markup, expected, meta = load(name)
    opt_kwargs = meta.get("options", {})
    vocab_graphs = {
        uri: parse_ntriples(nt) for uri, nt in meta.get("vocab_graphs", {}).items()
    }
    options = KernelOptions(vocab_graphs=vocab_graphs, **opt_kwargs)
    if meta.get("mode") == "structured":
        from rdfa_ray.kernel.walk import distill_structured

        triples, diags = distill_structured(markup, base=meta["base"], options=options)
    else:
        triples, diags = distill(markup, base=meta["base"], options=options)
    return triples, diags, expected, meta


@pytest.mark.parametrize("name", NAMES)
def test_fixture(name):
    triples, diags, expected, meta = run_fixture(name)
    assert isomorphic(triples, expected), "%s:\n%s" % (name, diff_report(triples, expected))
    for suffix in meta.get("expect_diags", []):
        assert any(
            d.dclass is not None and d.dclass.endswith(suffix) for d in diags
        ), "%s: expected diagnostic class *%s, got %s" % (
            name,
            suffix,
            [(d.dclass, d.message) for d in diags],
        )


def test_aggregate_precision_recall():
    """Aggregate corpus P/R must be 1.0 (gate >= 0.95)."""
    total_p = total_r = n = 0
    for name in NAMES:
        triples, _, expected, _ = run_fixture(name)
        p, r = precision_recall(triples, expected)
        total_p += p
        total_r += r
        n += 1
    assert total_p / n >= 0.95 and total_r / n >= 0.95
    assert total_p / n == pytest.approx(1.0) and total_r / n == pytest.approx(1.0)


def test_determinism():
    """Same input -> identical triple sets incl. bnode labels (required
    for idempotent Ray task retries)."""
    for name in NAMES[:10]:
        t1, _, _, _ = run_fixture(name)
        t2, _, _, _ = run_fixture(name)
        assert t1 == t2


def test_corpus_files_match_fixture_defs():
    """The checked-in corpus files must be regenerated whenever
    fixture_defs.py changes (python tests/gen_corpus.py)."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from fixture_defs import BASE, FIXTURES

    assert len(NAMES) == len(FIXTURES)
    for name, markup, nt, meta in FIXTURES:
        assert (CORPUS / f"{name}.html").read_text() == markup, name
        assert (CORPUS / f"{name}.nt").read_text().rstrip("\n") == nt.rstrip("\n"), name
