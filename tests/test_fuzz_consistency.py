"""Self-consistency fuzzing over the composed SPARQL fragment: the
same random deep-composition query (groups nesting groups, VALUES,
group filters) must produce the SAME solution multiset regardless of
bucket count or input partitioning — this catches partitioning and
shuffle bugs that fixed oracles cannot.  Complements the dual-oracle
randomized suite (tests/test_randomized_sparql.py), which checks
VALUES against DuckDB on shallower shapes."""

import random
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.sparql_text import SparqlSyntaxError, execute

PREDS = ["http://ex.org/p%d" % i for i in range(4)]
VALS = ["v%d" % i for i in range(5)]
SUBJ = ["s%d" % i for i in range(7)]


def _random_rows(rng):
    return [
        (rng.choice(SUBJ), rng.choice(PREDS), rng.choice(SUBJ + VALS))
        for _ in range(rng.randrange(8, 50))
    ]


def _gen_block(rng, depth, base_var):
    v1 = "?x%d" % rng.randrange(100)
    parts = ["%s <%s> %s ." % (base_var, rng.choice(PREDS), v1)]
    if rng.random() < 0.4:
        parts.append(
            "%s <%s> %s ." % (v1, rng.choice(PREDS), "?y%d" % rng.randrange(100))
        )
    if rng.random() < 0.35:
        parts.append('FILTER (%s >= "%s") .' % (v1, rng.choice(VALS + SUBJ)))
    if rng.random() < 0.25:
        parts.append(
            "VALUES %s { %s }"
            % (v1, " ".join('"%s"' % v for v in rng.sample(SUBJ + VALS, 3)))
        )
    if depth > 0 and rng.random() < 0.6:
        kind = rng.choice(
            ["OPTIONAL", "MINUS", "FILTER EXISTS", "FILTER NOT EXISTS"]
        )
        parts.append(
            "%s { %s }"
            % (kind, _gen_block(rng, depth - 1, rng.choice([base_var, v1])))
        )
    if depth > 0 and rng.random() < 0.3:
        # a union block nested inside the group body: every arm must
        # bind the join variable (the engine's soundness guard)
        uv = "?u%d" % rng.randrange(100)
        parts.append(
            "{ %s <%s> %s } UNION { %s <%s> %s }"
            % (base_var, rng.choice(PREDS), uv,
               base_var, rng.choice(PREDS), uv)
        )
    return " ".join(parts)


def _gen_query(rng):
    clauses = ["?d <%s> ?a ." % rng.choice(PREDS)]
    for _ in range(rng.randrange(1, 4)):
        kind = rng.choice(
            ["OPTIONAL", "MINUS", "FILTER EXISTS", "FILTER NOT EXISTS"]
        )
        clauses.append("%s { %s }" % (kind, _gen_block(rng, 1, "?d")))
    if rng.random() < 0.35:
        # top-level union block joined with the base pattern
        uv = "?u%d" % rng.randrange(100)
        clauses.append(
            "{ ?d <%s> %s } UNION { ?d <%s> %s . FILTER (%s != \"%s\") }"
            % (rng.choice(PREDS), uv, rng.choice(PREDS), uv, uv,
               rng.choice(VALS))
        )
    if rng.random() < 0.3:
        clauses.append('FILTER (?a != "%s")' % rng.choice(VALS))
    if rng.random() < 0.25:
        clauses.append(
            "VALUES ?d { %s }"
            % " ".join('"%s"' % s for s in rng.sample(SUBJ, 3))
        )
    return "SELECT * WHERE { %s }" % " ".join(clauses)


def _ds(rows, parts):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj_value": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(parts)


def _multiset(df):
    if len(df) == 0:
        return Counter()
    df = df[sorted(df.columns)].astype(str)
    return Counter(map(tuple, df.to_records(index=False).tolist()))


@pytest.mark.parametrize("seed", range(10))
def test_bucket_and_partition_invariance(ray_session, seed):
    rng = random.Random(40000 + seed)
    rows = _random_rows(rng)
    q = _gen_query(rng)
    try:
        a = execute(_ds(rows, 1), q, n_buckets=3).to_pandas()
    except SparqlSyntaxError:
        # generator can produce out-of-fragment shapes (e.g. a nested
        # group sharing no variable) — a loud reject is fine, but both
        # configurations must agree on rejecting
        with pytest.raises(SparqlSyntaxError):
            execute(_ds(rows, 5), q, n_buckets=7)
        return
    b = execute(_ds(rows, 5), q, n_buckets=7).to_pandas()
    assert _multiset(a) == _multiset(b), q
