"""Tests for round-3 curation ops: PII scrubbing and distributed
k-means (plus the relational corr/pivot/string_agg kernels' edge
cases not covered by the driver's SQL oracles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.kmeans import kmeans_assign, kmeans_cluster_sizes, kmeans_fit
from rdfa_ray.stages.scrub import scrub_documents


def test_scrub_planted_pii(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "mail a.b-c%d@sub.example.co.uk or x@y.io now",
                        "call +44 20 7946 0958 and +1-555-0100; ip 192.168.1.1",
                        "clean text without identifiers",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = scrub_documents(docs).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text_clean"] == "mail [EMAIL] or [EMAIL] now"
    assert out.loc[0, "n_email"] == 2
    assert out.loc[1, "text_clean"] == "call [PHONE] and [PHONE]; ip [IP]"
    assert out.loc[1, "n_phone"] == 2 and out.loc[1, "n_ip"] == 1
    assert out.loc[2, "text_clean"] == "clean text without identifiers"
    assert (
        out.loc[2, ["n_email", "n_phone", "n_ip"]].to_numpy() == 0
    ).all()


def _blobs(k=4, per=50, d=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (k, d))
    vecs = np.concatenate(
        [centers[i] + rng.normal(0, 0.1, (per, d)) for i in range(k)]
    )
    ids = np.arange(len(vecs))
    return ids, vecs, centers


def _numpy_seeds(vecs, k):
    """Twin of farthest-point seeding: vecs already id-ordered."""
    chosen = [0]
    mind2 = ((vecs - vecs[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind2))
        chosen.append(nxt)
        np.minimum(mind2, ((vecs - vecs[nxt]) ** 2).sum(axis=1), out=mind2)
    return vecs[np.array(chosen)].astype(np.float64).copy()


def _numpy_lloyd(vecs, k, n_iters):
    """Single-process twin of kmeans_fit: same farthest-point init,
    same empty-cluster rule."""
    cents = _numpy_seeds(vecs, k)
    for _ in range(n_iters):
        d2 = (
            (vecs * vecs).sum(axis=1)[:, None]
            - 2.0 * (vecs @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                new[c] = vecs[m].mean(axis=0)
        if np.allclose(new, cents, rtol=0.0, atol=1e-12):
            return new
        cents = new
    return cents


@pytest.mark.parametrize("local_limit", [200_000, 0])
def test_kmeans_matches_numpy_twin(ray_session, local_limit):
    ids, vecs, _ = _blobs()
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).repartition(8)
    cents = kmeans_fit(ds, k=4, n_iters=15, local_limit=local_limit)
    want = _numpy_lloyd(vecs, 4, 15)
    assert np.allclose(cents, want, atol=1e-8)

    assigns = kmeans_assign(ds, cents).to_pandas().set_index("vec_id")["cluster"]
    d2 = (
        (vecs * vecs).sum(axis=1)[:, None]
        - 2.0 * (vecs @ want.T)
        + (want * want).sum(axis=1)[None, :]
    )
    exp = d2.argmin(axis=1)
    assert (assigns.sort_index().to_numpy() == exp).all()
    # blob structure recovered: each true blob lands in one cluster
    for b in range(4):
        assert len(set(exp[b * 50 : (b + 1) * 50])) == 1


def test_kmeans_sizes_and_k_too_large(ray_session):
    ids, vecs, _ = _blobs(k=3, per=20)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    sizes = kmeans_cluster_sizes(ds, k=3, n_iters=10).to_pandas()
    assert sizes["n_vectors"].sum() == 60
    # smallest-id init seeds all three centroids inside blob 0; Lloyd's
    # may legitimately leave a cluster empty (it keeps its centroid)
    assert 1 <= len(sizes) <= 3
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=100)


def test_heavy_hitters_eviction_bound(ray_session):
    from rdfa_ray.stages.sketch import heavy_hitters

    # zipf-ish stream: value v appears (40 - v) times, v in [0, 40)
    vals = [v for v in range(40) for _ in range(40 - v)]
    rng = np.random.default_rng(5)
    rng.shuffle(vals)
    n = len(vals)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)

    k = 8  # far below the 40 distinct values: eviction fires
    out = heavy_hitters(ds, "v", k=k).to_pandas().set_index("key")["est_count"]
    assert len(out) <= k
    true = {v: 40 - v for v in range(40)}
    # guarantee: never over, under by at most n/(k+1)
    for v, est in out.items():
        assert est <= true[v]
        assert est >= true[v] - n // (k + 1)
    # the undisputed heaviest keys (true count > 2n/(k+1)) must survive
    for v in range(40):
        if true[v] > 2 * n / (k + 1):
            assert v in out.index


def test_heavy_hitters_exact_when_under_k(ray_session):
    from rdfa_ray.stages.sketch import heavy_hitters

    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(4)
    out = heavy_hitters(ds, "v", k=16).to_pandas()
    got = dict(zip(out["key"], out["est_count"]))
    assert got == {"a": 5, "b": 3, "c": 1}


def test_contamination_planted(ray_session):
    """A benchmark passage planted mid-document is flagged; word-
    boundary matching rejects the mid-token lookalike."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.contamination import flag_contaminated

    needle = "alpha beta gamma delta epsilon zeta eta theta"
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "clean words only here nothing shared with anything",
                        "prefix words %s suffix words" % needle,
                        # mid-token: 'xalpha' != word 'alpha'
                        "prefix xalpha beta gamma delta epsilon zeta eta theta tail",
                        needle,  # exact-document match
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(3)

    out = flag_contaminated(docs, [needle]).to_pandas()
    assert sorted(out["doc_id"]) == [2, 4]

    # empty needle set flags nothing
    assert flag_contaminated(docs, []).count() == 0


def test_extract_needles_deterministic(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.contamination import extract_needles

    words = " ".join("w%d" % i for i in range(30))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 5, 97, 194], pa.int64()),
                "text": pa.array([words] * 4, pa.string()),
            }
        )
    )
    needles = extract_needles(docs, every=97, start=10, n_words=8)
    assert needles == [" ".join("w%d" % i for i in range(10, 18))] * 3


def test_repetition_signals(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.text import repetition_signals

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b c a b c a b c",  # 7 grams, 3 distinct
                        "x y z w",            # 2 grams, 2 distinct
                        "q r",                # too short: no grams
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    out = repetition_signals(docs).to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_grams"] == 7 and out.loc[1, "n_distinct"] == 3
    assert out.loc[2, "n_grams"] == 2 and out.loc[2, "n_distinct"] == 2


def test_quality_gate_and_split_keep_cols(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.split import assign_split
    from rdfa_ray.stages.text import quality_gate

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e f g h",   # all grams distinct -> keep
                        "a b a b a b a b",   # 2 distinct of 6 -> drop
                        "x y",               # too short for a 3-gram -> drop
                    ],
                    pa.string(),
                ),
                "lang": pa.array(["en", "en", "zh"], pa.string()),
            }
        )
    )
    kept = quality_gate(docs).to_pandas()
    assert list(kept["doc_id"]) == [1]
    assert list(kept.columns) == ["doc_id", "text", "lang"]  # passthrough

    labeled = assign_split(docs, keep_cols=["lang"]).to_pandas()
    assert sorted(labeled.columns) == ["doc_id", "lang", "split"]
    assert set(labeled["split"]) <= {"train", "holdout"}


def test_sequence_packing_two_level_scan(ray_session):
    """Bin = exclusive global prefix // budget, independent of
    partitioning and exercising multiple ranges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.packing import pack_sequences

    sizes = [5, 7, 3, 10, 2, 8, 6, 4]  # 45 tokens total
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(8)), pa.int64()),
                "text": pa.array([" ".join(["w"] * s) for s in sizes], pa.string()),
            }
        )
    ).repartition(3)
    # range_size=2 -> 4 ranges; budget=10
    out = (
        pack_sequences(docs, budget=10, range_size=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    excl = np.cumsum([0] + sizes[:-1])
    assert list(out["n_tokens"]) == sizes
    assert list(out["bin_id"]) == [int(e // 10) for e in excl]


@pytest.mark.parametrize("seed", range(5))
def test_packing_matches_numpy_reference(ray_session, seed):
    """Random sizes, random partitioning, random budget/range_size:
    bin assignment equals the exclusive-cumsum reference exactly."""
    import random

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.packing import pack_sequences

    rng = random.Random(seed)
    n = rng.randrange(1, 60)
    sizes = [rng.randrange(1, 30) for _ in range(n)]
    budget = rng.randrange(5, 50)
    range_size = rng.choice([1, 2, 5, 100])
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array([" ".join(["w"] * s) for s in sizes], pa.string()),
            }
        )
    ).repartition(rng.randrange(1, 6))
    out = (
        pack_sequences(docs, budget=budget, range_size=range_size)
        .to_pandas()
        .sort_values("doc_id")
    )
    excl = np.cumsum([0] + sizes[:-1])
    assert list(out["bin_id"]) == [int(e // budget) for e in excl]


@pytest.mark.parametrize("seed", range(5))
def test_grouped_aggregate_matches_pandas(ray_session, seed):
    """Random bindings vs a single-node pandas reference for every
    algebraic aggregate."""
    import random

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.sparql import grouped_aggregate

    rng = random.Random(100 + seed)
    n = rng.randrange(3, 80)
    df = pd.DataFrame(
        {
            "g": [rng.choice("abc") for _ in range(n)],
            "v": [str(rng.randrange(0, 50)) for _ in range(n)],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        rng.randrange(1, 5)
    )
    out = (
        grouped_aggregate(
            ds,
            ["g"],
            [
                ("count", None, "n"),
                ("sum", "v", "s"),
                ("avg", "v", "m"),
                ("min", "v", "lo", "num"),
                ("max", "v", "hi", "num"),
            ],
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    nums = df.assign(x=pd.to_numeric(df["v"]))
    ref = nums.groupby("g")["x"].agg(["size", "sum", "mean", "min", "max"])
    for _, row in out.iterrows():
        r = ref.loc[row["g"]]
        assert row["n"] == r["size"] and row["s"] == r["sum"]
        assert row["m"] == pytest.approx(r["mean"])
        assert row["lo"] == r["min"] and row["hi"] == r["max"]
    assert len(out) == len(ref)


def test_unigram_logppl_reference(ray_session):
    """Engine scores match a direct numpy computation; rare-word docs
    score worse (higher -log p), the filtering property CCNet uses."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.lmscore import unigram_logppl

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["common common common", "common rare"], pa.string()
                ),
            }
        )
    ).repartition(2)
    out = unigram_logppl(docs).to_pandas().set_index("doc_id").sort_index()
    # counts: common=4, rare=1, total=5
    lp_common, lp_rare = math.log(4 / 5), math.log(1 / 5)
    exp1 = math.floor(-lp_common * 1e6 + 0.5)
    exp2 = math.floor(-(lp_common + lp_rare) / 2 * 1e6 + 0.5)
    assert list(out["n_tokens"]) == [3, 2]
    assert list(out["logppl_micro"]) == [exp1, exp2]
    assert out.loc[2, "logppl_micro"] > out.loc[1, "logppl_micro"]


def test_mixture_sample_semantics(ray_session):
    """Weights > 1 duplicate deterministically, weights < 1 downsample,
    duplicates of a document sample identically (content-hashed)."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.split import mixture_sample

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["same text", "same text", "other", "third"], pa.string()),
                "source": pa.array(["a", "a", "b", "c"], pa.string()),
            }
        )
    ).repartition(2)
    out = mixture_sample(docs, {"a": 2.0, "b": 0.0}, default=1.0).to_pandas()
    per_doc = out.groupby("doc_id")["copy_idx"].count().to_dict()
    # a @ 2.0 -> exactly 2 copies each; b @ 0.0 -> dropped; default 1.0 -> 1
    assert per_doc == {1: 2, 2: 2, 4: 1}
    assert sorted(out[out["doc_id"] == 1]["copy_idx"]) == [0, 1]

    # identical text -> identical decision at any weight
    out2 = mixture_sample(docs, {"a": 1.5}, default=1.0).to_pandas()
    c1 = (out2["doc_id"] == 1).sum()
    c2 = (out2["doc_id"] == 2).sum()
    assert c1 == c2 and c1 in (1, 2)


def test_kmeans_assign_is_nearest_centroid_not_max_dot(ray_session):
    """Regression: the d2 expansion must include the ||c||^2 term.
    Without it, argmin reduces to max dot product, which co-assigns
    [10,0] and [20,0] even when [10,0] IS a centroid (round-3 bug)."""
    vecs = np.array([[10.0, 0.0], [20.0, 0.0], [0.0, 10.0], [0.0, 20.0]])
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    cents = kmeans_fit(ds, k=4, n_iters=5)
    assigns = (
        kmeans_assign(ds, cents).to_pandas().set_index("vec_id")["cluster"]
    )
    # with correct euclidean assignment every vector is its own cell
    assert assigns.nunique() == 4


def test_epoch_shuffle_determinism_and_independence(ray_session):
    """Same (seed, corpus) -> identical order at any partitioning;
    different seeds -> different permutations; no row lost or duplicated."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.split import epoch_shuffle

    docs = pa.table({"doc_id": pa.array(list(range(200)), pa.int64()),
                     "lang": pa.array(["l%d" % (i % 3) for i in range(200)])})
    a = epoch_shuffle(rd.from_arrow(docs).repartition(2), seed=7,
                      keep_cols=["lang"]).to_pandas()
    b = epoch_shuffle(rd.from_arrow(docs).repartition(9), seed=7,
                      keep_cols=["lang"]).to_pandas()
    c = epoch_shuffle(rd.from_arrow(docs).repartition(4), seed=8).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()  # partition-invariant
    assert sorted(a["doc_id"]) == list(range(200))       # a permutation
    assert sorted(c["doc_id"]) == list(range(200))
    assert a["doc_id"].tolist() != c["doc_id"].tolist()  # seed-independent
    assert a["lang"].tolist() == ["l%d" % (i % 3) for i in a["doc_id"]]


# --------------------------------------------------------------------------
# Gopher quality rules


def _gopher_docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back "
    "home with plenty of energy to spare because that morning walk "
    "gave it confidence that life can be simple and good"
)


def test_gopher_rules_planted(ray_session):
    from rdfa_ray.stages.text import GOPHER_RULE_BITS, gopher_rules

    texts = [
        GOOD,                                          # 0: passes all
        "short words only here",                       # 1: word_count
        GOOD + " " + " ".join(["###"] * 10),           # 2: symbol_ratio
        "\n".join(["- " + GOOD] * 10),                 # 3: bullet_lines
        "\n".join([GOOD + " ..."] * 10),               # 4: ellipsis_lines
        GOOD + " " + " ".join(["12345"] * 40),         # 5: alpha_words
        " ".join(["zork gronk blee"] * 12),            # 6: stopwords
        "supercalifragilisticexpialidocious " * 30,    # 7: mean_word_len
    ]
    out = (
        gopher_rules(_gopher_docs(texts), min_words=20)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "keep"]) and out.loc[0, "mask"] == 0
    expect = {
        1: "word_count",
        2: "symbol_ratio",
        3: "bullet_lines",
        4: "ellipsis_lines",
        5: "alpha_words",
        6: "stopwords",
        7: "mean_word_len",
    }
    for i, rule in expect.items():
        assert not bool(out.loc[i, "keep"]), (i, rule)
        assert out.loc[i, "mask"] & GOPHER_RULE_BITS[rule], (
            i, rule, int(out.loc[i, "mask"]),
        )


def test_gopher_rules_integer_thresholds(ray_session):
    # boundary exactness: exactly 10% symbols FAILS (>=), just under
    # passes — the integer comparison 10*symbols >= words
    from rdfa_ray.stages.text import GOPHER_RULE_BITS, gopher_rules

    base = ("the fox and the dog that have been to all of "
            "those places be with us " * 2).strip()  # 38 alpha words
    at_limit = base + " " + " ".join(["#"] * 2)      # 40 words, 4 symbols? no
    words = len(at_limit.split())
    n_sym = at_limit.count("#")
    out = (
        gopher_rules(_gopher_docs([at_limit]), min_words=5)
        .to_pandas()
        .iloc[0]
    )
    failed = bool(out["mask"] & GOPHER_RULE_BITS["symbol_ratio"])
    assert failed == (10 * n_sym >= words)


def test_gopher_rules_partition_invariance(ray_session):
    from rdfa_ray.stages.text import gopher_rules

    texts = [GOOD + (" extra token%d" % i) * (i % 5) for i in range(64)]
    a = (
        gopher_rules(_gopher_docs(texts).repartition(1), min_words=20)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        gopher_rules(_gopher_docs(texts).repartition(13), min_words=20)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------------
# C4 cleaning rules


def test_c4_rules_line_edit_and_page_gate(ray_session):
    from rdfa_ray.stages.text import c4_rules

    texts = [
        # 0: three good sentences across lines -> kept
        "the quick brown fox jumps over the dog.\n"
        "another fine sentence with enough words here!\n"
        "a third one that also terminates properly?",
        # 1: good lines but page poisoned by lorem ipsum
        "the quick brown fox jumps over the dog.\n"
        "another fine sentence with enough words here.\n"
        "a third one. lorem ipsum makes this page vanish.",
        # 2: curly brace poisons the page
        "function() { return 1; } is code.\n"
        "another fine sentence with enough words here.\n"
        "a third one that also terminates properly.",
        # 3: javascript line removed, leaving too few sentences
        "please enable javascript to view this page.\n"
        "one good sentence with enough words here.",
        # 4: short / unterminated lines dropped
        "too short.\nno terminal punctuation on this line\n"
        "one good sentence with enough words here.",
    ]
    docs = _gopher_docs(texts)
    out = c4_rules(docs).to_pandas().set_index("doc_id").sort_index()
    assert bool(out.loc[0, "keep"]) and out.loc[0, "n_lines_kept"] == 3
    assert not bool(out.loc[1, "keep"])      # lorem ipsum
    assert not bool(out.loc[2, "keep"])      # curly brace
    assert not bool(out.loc[3, "keep"])
    assert out.loc[3, "n_lines_kept"] == 1   # javascript line edited out
    assert "javascript" not in out.loc[3, "text_clean"]
    assert out.loc[4, "n_lines_kept"] == 1 and not bool(out.loc[4, "keep"])
    assert out.loc[4, "text_clean"] == "one good sentence with enough words here."


def test_c4_rules_partition_invariance(ray_session):
    from rdfa_ray.stages.text import c4_rules

    texts = [
        ("sentence number %d has exactly enough words to pass." % i)
        + ("\nshort no" if i % 2 else "\nanother good long sentence right here.")
        for i in range(40)
    ]
    a = (
        c4_rules(_gopher_docs(texts).repartition(1))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        c4_rules(_gopher_docs(texts).repartition(9))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------------
# Gopher repetition suite


def test_gopher_repetition_planted(ray_session):
    from rdfa_ray.stages.text import gopher_repetition

    texts = [
        # 0: "x y" repeated 10x -> top-2-gram covers most chars
        " ".join(["x y"] * 10),
        # 1: varied text, no repetition — long enough that a single
        # unique n-gram stays under every fraction threshold
        " ".join("w%02d" % i for i in range(60)),
        # 2: a duplicated 5-gram ("a b c d e" twice) inside filler
        "a b c d e junk1 junk2 junk3 a b c d e junk4 junk5 junk6",
    ]
    out = (
        gopher_repetition(_gopher_docs(texts))
        .to_pandas().set_index("doc_id").sort_index()
    )
    # doc 0: gram "x y" (3 chars) occurs 10x... windows overlap: "y x"
    # occurs 9x; top2 = 10 * 3 = 30 of 20 chars total -> >20% -> fail
    assert out.loc[0, "top2_chars"] == 30
    assert not bool(out.loc[0, "keep"])
    assert bool(out.loc[1, "keep"]) and out.loc[1, "mask"] == 0
    # doc 2: the 5-gram "a b c d e" (9 chars) occurs twice -> dup5 = 18
    assert out.loc[2, "dup5_chars"] == 18
    total2 = out.loc[2, "total_chars"]
    expect_fail5 = 18 * 100 > 15 * total2
    assert bool(out.loc[2, "mask"] & (1 << 3)) == expect_fail5


def test_gopher_repetition_tie_breaks_lexicographic(ray_session):
    from rdfa_ray.stages.text import gopher_repetition

    # "b c" and "a d" both occur exactly twice; the smaller gram
    # string "a d" must win the top-2 slot (SQL ORDER BY cnt DESC, g)
    text = "b c q a d r b c s a d"
    out = gopher_repetition(_gopher_docs([text])).to_pandas().iloc[0]
    # both candidate grams are 3 chars; chars = 2 * 3 either way, but
    # the rule must be deterministic — pin via a length-asymmetric tie
    text2 = "bb c q a d r bb c s a d"
    out2 = gopher_repetition(_gopher_docs([text2])).to_pandas().iloc[0]
    # candidates: "bb c" (4 chars, 2x) and "a d" (3 chars, 2x);
    # lexicographically "a d" < "bb c" -> chars = 2 * 3 = 6
    assert out2["top2_chars"] == 6
    assert out["top2_chars"] == 6


def test_gopher_repetition_partition_invariance(ray_session):
    import numpy as np

    from rdfa_ray.stages.text import gopher_repetition

    rng = np.random.RandomState(2)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(50)
    ]
    a = (
        gopher_repetition(_gopher_docs(texts).repartition(1))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        gopher_repetition(_gopher_docs(texts).repartition(11))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_gopher_repetition_short_docs(ray_session):
    from rdfa_ray.stages.text import gopher_repetition

    out = (
        gopher_repetition(_gopher_docs(["single", "two words", ""]))
        .to_pandas().set_index("doc_id").sort_index()
    )
    # docs shorter than n words have zero signals for that n
    assert out.loc[0, "top2_chars"] == 0 and bool(out.loc[0, "keep"])
    assert out.loc[1, "dup5_chars"] == 0
    assert out.loc[2, "total_chars"] == 0 and bool(out.loc[2, "keep"])


def test_normalize_text_unicode_and_whitespace(ray_session):
    import ray.data as rd
    from rdfa_ray.stages.text import normalize_text

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "cafe\u0301 du\u00A0parc",  # decomposed acute + NBSP
                "a \t\t b\x07c\r\n d  ",     # controls + ragged whitespace
                None,                          # null passes through as null
                "plain ascii",
            ],
        }
    )
    out = (
        normalize_text(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_norm"][0] == "caf\u00e9 du parc"  # composed, 1 char
    assert out["text_norm"][1] == "a bc d"
    assert out["text_norm"][2] is None or pd.isna(out["text_norm"][2])
    assert out["text_norm"][3] == "plain ascii"
    assert out["n_chars_norm"][0] == len("caf\u00e9 du parc")
    import pytest

    with pytest.raises(ValueError, match="unknown Unicode form"):
        normalize_text(rd.from_pandas(df), form="NFX")


def test_curation_lazy_input_matches_materialized(ray_session):
    """materialize_input=False (the 100-TB setting: no corpus-sized
    text pin; consumers re-execute the column-pruned read) must be
    value-identical to the default materialized path."""
    from rdfa_ray.pipelines.queries import q_curation_pipeline, q_curation_v2

    sf = "/root/testdata/sf0.001"
    for q in (q_curation_pipeline, q_curation_v2):
        a = q(sf).to_pandas()
        b = q(sf, materialize_input=False).to_pandas()
        a = a.sort_values(["split", "lang"]).reset_index(drop=True)
        b = b.sort_values(["split", "lang"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_kmeans_checked_invariants(ray_session):
    from rdfa_ray.stages.kmeans import kmeans_checked

    ids, vecs, _ = _blobs(k=3, per=20)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    row = kmeans_checked(ds, k=3, n_iters=10).to_pandas().iloc[0]
    assert row["n_points"] == 60 and row["k"] == 3
    assert bool(row["sizes_sum_ok"]) and bool(row["inertia_improved"])
