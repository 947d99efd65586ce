"""Connected-components clustering tests (stages/cluster.py)."""

import pandas as pd


def test_cc_star_and_chain(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.cluster import connected_components

    # two components: star {1,2,3,4} and edge {10,11}; 20 isolated
    edges = rd.from_items(
        [{"a": 1, "b": 2}, {"a": 1, "b": 3}, {"a": 1, "b": 4}, {"a": 10, "b": 11}],
        override_num_blocks=2,
    )
    nodes = rd.from_items([{"node": n} for n in [1, 2, 3, 4, 10, 11, 20]])
    got = connected_components(edges, nodes, iters=2).to_pandas()
    labels = dict(zip(got["node"], got["label"]))
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_cc_chain_needs_diameter_iters(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.cluster import connected_components

    # path 1-2-3-4: diameter 3 -> iters=3 reaches the full component
    edges = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 4}])
    nodes = rd.from_items([{"node": n} for n in [1, 2, 3, 4]])
    got = connected_components(edges, nodes, iters=3).to_pandas()
    assert set(got["label"]) == {1}


def test_cc_converges_on_long_chain(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.cluster import connected_components

    # 10-hop chain with node ids scattered so consecutive nodes hash to
    # DIFFERENT crc32 buckets (the round-2 cross-bucket mislabel case);
    # default convergence loop must find the single component with no
    # iters hint
    ids = [1, 997, 23, 511, 88, 402, 666, 315, 74, 209, 1000]
    edges = rd.from_items(
        [{"a": ids[i], "b": ids[i + 1]} for i in range(len(ids) - 1)],
        override_num_blocks=3,
    )
    nodes = rd.from_items([{"node": n} for n in ids + [5000]])
    got = connected_components(edges, nodes, n_buckets=8).to_pandas()
    labels = dict(zip(got["node"], got["label"]))
    assert all(labels[n] == 1 for n in ids), labels
    assert labels[5000] == 5000


def test_cc_convergence_without_pointer_doubling(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.cluster import connected_components

    # plain propagation (no doubling) must still converge via the
    # changed-row check, just in more supersteps
    ids = list(range(1, 9))
    edges = rd.from_items([{"a": i, "b": i + 1} for i in ids[:-1]])
    nodes = rd.from_items([{"node": n} for n in ids])
    got = connected_components(
        edges, nodes, n_buckets=4, pointer_double=False
    ).to_pandas()
    assert set(got["label"]) == {1}


def test_exact_dup_clusters_match_groups(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.cluster import exact_dup_clusters

    rows = (
        [{"doc_id": i, "text": "dup A"} for i in (5, 2, 9)]
        + [{"doc_id": i, "text": "dup B"} for i in (7, 3)]
        + [{"doc_id": 100, "text": "unique"}]
    )
    ds = rd.from_items(rows, override_num_blocks=3)
    got = exact_dup_clusters(ds).to_pandas()
    labels = dict(zip(got["doc_id"], got["cluster_id"]))
    assert labels == {5: 2, 2: 2, 9: 2, 7: 3, 3: 3, 100: 100}


def test_frame_sampler_explodes_videos_and_diags_rest(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.multimodal import frame_samples

    docs = rd.from_items(
        [{"doc_id": i, "text": "t%d" % i} for i in range(12)], override_num_blocks=2
    )
    got = frame_samples(docs, n_frames=4).to_pandas()
    # doc_id % 6 == 2 -> video/mp4 in the synthetic source; every other
    # media row must surface as ONE diagnostic row, not vanish
    video_ids = {i for i in range(12) if i % 6 == 2}
    assert set(got["media_id"]) == set(range(12))
    for mid in video_ids:
        sub = got[got["media_id"] == mid]
        assert list(sub["frame_idx"]) == [0, 1, 2, 3]
        assert list(sub["ts_ms"]) == [0, 1000, 2000, 3000]
        assert (sub["decode_error"] == "").all()
    diags = got[~got["media_id"].isin(video_ids)]
    assert (diags["frame_idx"] == -1).all()
    assert diags["decode_error"].str.startswith("not a video:").all()
    assert len(diags) == 12 - len(video_ids)


def test_kmv_sketch_accuracy_and_exact_path(ray_session):
    import ray.data as rd

    from rdfa_ray.stages.sketch import kmv_distinct

    # group "small": 40 distinct keys (< K -> exact); "big": 5000 distinct
    rows = [{"g": "small", "key": "s%d" % (i % 40)} for i in range(400)]
    rows += [{"g": "big", "key": "b%d" % i} for i in range(5000)]
    ds = rd.from_items(rows, override_num_blocks=8)
    got = kmv_distinct(ds, "g", "key", k=256).to_pandas().set_index("g")
    assert got.loc["small", "n_distinct_est"] == 40
    assert bool(got.loc["small", "exactish"])
    est = got.loc["big", "n_distinct_est"]
    assert abs(est - 5000) / 5000 < 0.2  # ~1/sqrt(256) error regime
    assert not bool(got.loc["big", "exactish"])


def test_kmv_against_events_exact(ray_session):
    import ray.data as rd

    from rdfa_ray.pipelines.relational import events_distinct_users
    from rdfa_ray.stages.sketch import kmv_distinct

    sf = "/root/testdata/sf0.001"
    exact = events_distinct_users(sf).to_pandas().set_index("event_type")["n_users"]
    ds = rd.read_parquet("%s/events.parquet" % sf, columns=["event_type", "user_id"])
    approx = (
        kmv_distinct(ds, "event_type", "user_id", k=256)
        .to_pandas()
        .set_index("event_type")["n_distinct_est"]
    )
    for et, n in exact.items():
        assert abs(int(approx[et]) - int(n)) <= max(1, int(0.2 * n)), (et, n, approx[et])


def test_resized_media_invariants(ray_session):
    """Images shrink deterministically; non-images pass through
    byte-identical with the error flag set."""
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.multimodal import resized_media, synthesize_media_batch

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(9)), pa.int64()),
                "text": pa.array(["body %d" % i for i in range(9)], pa.string()),
            }
        )
    )
    src = synthesize_media_batch(
        pa.table(
            {
                "doc_id": pa.array(list(range(9)), pa.int64()),
                "text": pa.array(["body %d" % i for i in range(9)], pa.string()),
            }
        )
    ).to_pandas().set_index("media_id")
    out = resized_media(docs, target_px=256).to_pandas().set_index("media_id")
    assert len(out) == 9
    for mid, row in out.iterrows():
        orig = src.loc[mid]
        m = mid % 6
        if m == 0:  # valid PPM: REAL nearest-neighbor downsample
            assert row["decode_error"] == ""
            assert row["n_bytes"] < orig["n_bytes"]  # contraction
            from rdfa_ray.stages.multimodal import decode_ppm

            arr = decode_ppm(bytes(row["payload"]))
            assert max(arr.shape[:2]) == 256  # long edge hit target
        elif m == 3:  # truncated PPM: flagged, payload untouched
            assert "truncated" in row["decode_error"]
            assert bytes(row["payload"]) == bytes(orig["payload"])
        elif m == 5:  # compressed codec: flagged passthrough
            assert row["decode_error"].startswith("unsupported codec")
            assert bytes(row["payload"]) == bytes(orig["payload"])
        else:  # wav / mp4
            assert row["decode_error"].startswith("not an image")
            assert bytes(row["payload"]) == bytes(orig["payload"])  # untouched

    # determinism: second run yields identical payload bytes
    again = resized_media(docs, target_px=256).to_pandas().set_index("media_id")
    assert all(
        bytes(again.loc[m, "payload"]) == bytes(out.loc[m, "payload"])
        for m in out.index
    )


def test_hll_sketch_accuracy(ray_session):
    """HLL estimate within ~5 standard errors of exact at p=12, on
    planted groups of known cardinality (incl. small-range regime)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rdfa_ray.stages.sketch import hll_distinct

    rs = np.random.RandomState(3)
    gs, keys = [], []
    for g, n in (("small", 50), ("mid", 2000), ("big", 40000)):
        vals = rs.randint(0, 1 << 40, size=n * 2)  # dups included
        uniq = np.unique(vals)[:n]
        draw = np.concatenate([uniq, rs.choice(uniq, n)])  # repeats
        gs.extend([g] * len(draw))
        keys.extend(draw.tolist())
    ds = rd.from_arrow(
        pa.table({"g": pa.array(gs), "key": pa.array(keys, pa.int64())})
    ).repartition(8)
    got = hll_distinct(ds, "g", "key", p=12).to_pandas().set_index("g")
    se = 1.04 / np.sqrt(1 << 12)
    for g, n in (("small", 50), ("mid", 2000), ("big", 40000)):
        est = got.loc[g, "n_distinct_est"]
        assert abs(est - n) <= max(5 * se * n, 3), (g, est, n)


def test_hll_against_events_exact(ray_session):
    """Same input as the exact distinct query: estimates within 10%."""
    import ray.data as rd

    from rdfa_ray.pipelines.relational import events_distinct_users
    from rdfa_ray.stages.sketch import hll_distinct

    sf = "/root/testdata/sf0.001"
    exact = events_distinct_users(sf).to_pandas().set_index("event_type")
    ds = rd.read_parquet("%s/events.parquet" % sf, columns=["event_type", "user_id"])
    est = hll_distinct(ds, "event_type", "user_id").to_pandas().set_index("event_type")
    for et, row in exact.iterrows():
        e = est.loc[et, "n_distinct_est"]
        assert abs(e - row.iloc[0]) <= max(0.10 * row.iloc[0], 3), (et, e, row.iloc[0])
