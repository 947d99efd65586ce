"""Curated-training-shards export (pipelines/curation_export.py):
determinism, resume, and the parameter-pin refusals."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rdfa_ray.pipelines.curation_export import run_curation_export


def _docs(n=60):
    # varied lengths; a planted exact-duplicate pair; one degenerate
    # repetition doc the quality gate drops
    rows = []
    for i in range(n):
        words = ["w%d" % ((i * 7 + j) % 23) for j in range(5 + (i % 9))]
        rows.append((i, " ".join(words), "en" if i % 3 else "zh"))
    rows.append((n, rows[4][1], "en"))  # exact dup of doc 4
    rows.append((n + 1, "x x x x x x x x", "en"))  # repetition-gated
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def _read_all(out_dir):
    import glob

    parts = {}
    for path in sorted(glob.glob("%s/shards/shard-*.parquet" % out_dir)):
        parts[os.path.basename(path)] = pq.read_table(path).to_pandas()
    return parts


def test_export_writes_sorted_shards_and_manifests(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    summary = run_curation_export(_docs(), out, seed=17, n_parts=4)
    assert set(summary.columns) == {"part", "docs", "tokens"}
    shards = _read_all(out)
    assert len(shards) == len(summary)
    total = 0
    for name, df in shards.items():
        assert list(df.columns) == ["doc_id", "text", "lang", "shuffle_key"]
        # within-shard order IS the shuffle-key order
        assert (df["shuffle_key"].to_numpy()[:-1] <= df["shuffle_key"].to_numpy()[1:]).all()
        total += len(df)
        part = int(name.split("-")[1].split(".")[0])
        mf = json.load(open("%s/_manifest/part-%05d.json" % (out, part)))
        assert mf["docs"] == len(df)
        assert mf["tokens"] == int(
            df["text"].str.split(" ").str.len().sum()
        )
    assert total == int(summary["docs"].sum())
    # gate + dedup really dropped rows
    assert total < 62


def test_export_partition_invariance(ray_session, tmp_path):
    a = run_curation_export(
        _docs(), str(tmp_path / "a"), seed=17, n_parts=4
    )
    b = run_curation_export(
        _docs().repartition(13), str(tmp_path / "b"), seed=17, n_parts=4
    )
    pd.testing.assert_frame_equal(
        a.sort_values("part").reset_index(drop=True),
        b.sort_values("part").reset_index(drop=True),
    )
    # shard CONTENT (ids in order) is identical, not just the census
    for name, df in _read_all(str(tmp_path / "a")).items():
        df2 = _read_all(str(tmp_path / "b"))[name]
        assert df["doc_id"].tolist() == df2["doc_id"].tolist()


def test_export_resume_rewrites_only_missing_shard(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    first = run_curation_export(_docs(), out, seed=17, n_parts=4)
    victim = int(first["part"].iloc[0])
    os.remove("%s/shards/shard-%05d.parquet" % (out, victim))
    os.remove("%s/_manifest/part-%05d.json" % (out, victim))
    mtimes = {
        p: os.path.getmtime("%s/shards/%s" % (out, p))
        for p in os.listdir("%s/shards" % out)
    }
    again = run_curation_export(_docs(), out, seed=17, n_parts=4)
    pd.testing.assert_frame_equal(
        first.sort_values("part").reset_index(drop=True),
        again.sort_values("part").reset_index(drop=True),
    )
    for p, t in mtimes.items():  # completed shards were not rewritten
        assert os.path.getmtime("%s/shards/%s" % (out, p)) == t
    assert os.path.exists("%s/shards/shard-%05d.parquet" % (out, victim))


def test_export_refuses_param_drift_on_resume(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    run_curation_export(_docs(), out, seed=17, n_parts=4)
    with pytest.raises(RuntimeError, match="seed"):
        run_curation_export(_docs(), out, seed=18, n_parts=4)
    with pytest.raises(RuntimeError, match="seed"):
        run_curation_export(_docs(), out, seed=17, n_parts=4,
                            holdout_bytes=32)


def test_export_refuses_resume_without_meta(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    run_curation_export(_docs(), out, seed=17, n_parts=4)
    os.remove("%s/_manifest/meta.json" % out)
    os.remove(
        "%s/shards/shard-%05d.parquet"
        % (out, int(sorted(os.listdir("%s/_manifest" % out))[0].split("-")[1].split(".")[0]))
    )
    with pytest.raises(RuntimeError, match="meta.json is missing"):
        run_curation_export(_docs(), out, seed=17)
