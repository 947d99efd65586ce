"""Exact n-gram Jaccard self-join (prefix filtering) vs brute force."""

import random

import pandas as pd
import pytest

from rdfa_ray.stages.dedup import char_grams, ngram_jaccard_dedup


def brute_force_pairs(texts: dict[int, str], threshold: float, n: int = 5):
    out = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        sa = char_grams(texts[a], n)
        for b in ids[i + 1 :]:
            sb = char_grams(texts[b], n)
            isect = len(sa & sb)
            uni = len(sa) + len(sb) - isect
            if isect * 1.0 / uni >= threshold:
                out.append((a, b, isect, uni))
    return sorted(out)


def _mutate(text: str, rng: random.Random, n_edits: int) -> str:
    chars = list(text)
    for _ in range(n_edits):
        i = rng.randrange(len(chars))
        chars[i] = rng.choice("abcdefgh ")
    return "".join(chars)


def test_char_grams_sql_parity():
    # mirrors substr(text, g, 5) over generate_series(1, greatest(len-4, 1))
    assert char_grams("") == {""}
    assert char_grams("abc") == {"abc"}
    assert char_grams("abcde") == {"abcde"}
    assert char_grams("abcdef") == {"abcde", "bcdef"}


@pytest.mark.parametrize("threshold", [0.8, 0.5])
def test_ngram_jaccard_matches_brute_force(ray_session, threshold):
    import ray.data as rd

    rng = random.Random(42)
    base = [
        "".join(rng.choice("abcdefghij klmnop") for _ in range(rng.randrange(60, 200)))
        for _ in range(12)
    ]
    texts = {}
    doc_id = 0
    for b in base:
        texts[doc_id] = b
        doc_id += 1
        # a couple of near-dup mutations per base doc
        for edits in (1, 3, 8, 30):
            texts[doc_id] = _mutate(b, rng, edits)
            doc_id += 1

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[k] for k in sorted(texts)]}
        )
    ).repartition(8)
    got = ngram_jaccard_dedup(ds, threshold=threshold).to_pandas()
    got_pairs = sorted(
        map(tuple, got[["left_id", "right_id", "isect", "uni"]].to_numpy())
    )
    expected = brute_force_pairs(texts, threshold)
    assert got_pairs == expected
    assert expected, "test corpus must contain near-duplicate pairs"


def test_substring_dup_pairs_planted(ray_session):
    """Docs sharing a long verbatim span pair up; winnowing's guarantee
    (shared span >= window+3 words -> >= 1 shared fingerprint) holds
    across partitions; unrelated docs never pair."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.dedup import substring_dup_pairs

    span = " ".join("shared%d" % i for i in range(40))
    rows = [
        {"doc_id": 1, "text": "alpha beta " + span + " gamma"},
        {"doc_id": 2, "text": span + " delta epsilon"},
        {"doc_id": 3, "text": " ".join("solo%d" % i for i in range(60))},
        {"doc_id": 4, "text": "prefix words " + span},
    ]
    docs = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = substring_dup_pairs(docs, min_shared=2).to_pandas()
    got = {tuple(sorted((r.a, r.b))) for r in out.itertuples()}
    assert got == {(1, 2), (1, 4), (2, 4)}
    assert (out["n_shared"] >= 2).all()


def test_dedup_lines_first_occurrence(ray_session):
    """Global line dedup: first (doc_id, line_idx) occurrence wins,
    empty lines drop, docs reassemble in line order."""
    import ray.data as rd

    from rdfa_ray.stages.dedup import dedup_lines

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha\nbeta\ngamma",
                    "beta\ndelta\n\nalpha",   # beta+alpha dup, empty drops
                    "delta\nepsilon",          # delta dup of (2,1)
                    "alpha\nbeta\ngamma",      # fully duplicate doc -> vanishes
                ],
            }
        )
    )
    out = (
        dedup_lines(docs, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["text"].tolist() == ["alpha\nbeta\ngamma", "delta", "epsilon"]
    assert out["n_lines"].tolist() == [3, 1, 1]


def test_dedup_lines_vs_duckdb(ray_session):
    """Randomized oracle: same semantics in DuckDB window SQL."""
    import duckdb
    import ray.data as rd

    from rdfa_ray.stages.dedup import dedup_lines

    rng = random.Random(11)
    vocab = ["w%d" % i for i in range(12)]
    rows = []
    for d in range(40):
        n_lines = rng.randint(1, 6)
        lines = [
            " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
            for _ in range(n_lines)
        ]
        rows.append((d, "\n".join(lines)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        dedup_lines(rd.from_pandas(df), n_buckets=8, out_sep=" | ")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", df)
    want = con.execute(
        "WITH lines AS (SELECT doc_id, i - 1 AS line_idx,"
        "  string_split(text, chr(10))[i] AS line"
        "  FROM docs, LATERAL unnest(generate_series(1,"
        "   len(string_split(text, chr(10))))) AS s(i)),"
        " kept AS (SELECT * FROM lines WHERE line <> ''"
        "  QUALIFY ROW_NUMBER() OVER (PARTITION BY line"
        "   ORDER BY doc_id, line_idx) = 1) "
        "SELECT doc_id, string_agg(line, ' | ' ORDER BY line_idx) AS text,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines"
        " FROM kept GROUP BY doc_id ORDER BY doc_id"
    ).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["n_lines"].tolist() == want["n_lines"].tolist()


# --------------------------------------------------------------------------
# paragraph-level exact dedup


def test_paragraph_dedup_keeper_and_reassembly(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.dedup import paragraph_dedup

    SEP = "\n\n"
    texts = [
        SEP.join(["shared header", "body zero", "shared footer"]),
        SEP.join(["shared header", "body one", "shared footer"]),
        SEP.join(["body two", "shared header"]),
        # empty slot (len < min_chars) is exempt — kept in both docs
        SEP.join(["", "body three", ""]),
        SEP.join(["", "body four"]),
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = (
        paragraph_dedup(docs)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "text_clean"] == SEP.join(
        ["shared header", "body zero", "shared footer"]
    )
    assert out.loc[0, "n_dropped"] == 0
    assert out.loc[1, "text_clean"] == "body one"
    assert out.loc[1, "n_dropped"] == 2
    assert out.loc[2, "text_clean"] == "body two"
    assert out.loc[2, "n_dropped"] == 1
    # exempt empties survive everywhere
    assert out.loc[3, "text_clean"] == SEP.join(["", "body three", ""])
    assert out.loc[4, "text_clean"] == SEP.join(["", "body four"])
    assert out["n_paragraphs"].tolist() == [3, 3, 2, 3, 2]


def test_paragraph_dedup_partition_invariance(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.dedup import paragraph_dedup

    SEP = "\n\n"
    texts = [
        SEP.join(["boiler", "unique %d" % i] + (["promo"] if i % 3 else []))
        for i in range(40)
    ]

    def run(parts):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(parts)
        return (
            paragraph_dedup(ds)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(9))


def test_paragraph_dedup_refuses_oversized_dropset(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from rdfa_ray.stages.dedup import paragraph_dedup

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(["dup\n\ndup\n\ndup"] * 10, pa.string()),
    }))
    with pytest.raises(ValueError):
        paragraph_dedup(docs, broadcast_limit=3).to_pandas()


def test_rolling_fingerprints_md5_mode_winnowing_guarantee(ray_session):
    # md5 hash mode (the SQL-reproducible one the oracle checks) keeps
    # the Schleimer winnowing guarantee: docs sharing a window+3-word
    # span share >= 1 fingerprint
    import ray.data as rd

    from rdfa_ray.stages.text import rolling_fingerprints

    span = " ".join("planted%d" % i for i in range(11))  # window=8 -> 8+3
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "aaa bbb ccc " + span + " ddd eee"},
            {"doc_id": 2, "text": span + " zzz yyy xxx www vvv uuu"},
            {"doc_id": 3, "text": "totally different words here nine ten eleven twelve"},
        ]
    )
    out = rolling_fingerprints(docs, hash_mode="md5").to_pandas()
    f1 = set(out[out.doc_id == 1]["fp"])
    f2 = set(out[out.doc_id == 2]["fp"])
    f3 = set(out[out.doc_id == 3]["fp"])
    assert f1 & f2
    assert not (f1 & f3)
    import pytest

    with pytest.raises(ValueError, match="hash_mode"):
        rolling_fingerprints(docs, hash_mode="sha1")
