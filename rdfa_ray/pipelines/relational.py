"""Relational operator demonstrations over the TPC-H-ish test tables:
grouped aggregation (with Ray's internal map-side combine), broadcast
hash join, top-k, and session windowing over the events stream.

These exercise the engine's generic dataflow operators; the RDFa
pipelines are built from the same primitives.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped aggregate; columns pruned at the read.

    Money columns are summed as integer CENTS (per-row round to int64
    inside map_batches) so the result is exact and order-independent —
    float sums accumulated in different orders differ by eps and fail
    value-hash comparison against the SQL oracle."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        "%s/lineitem.parquet" % sf_dir,
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice")
        disc = batch.column("l_discount")
        rev = pc.multiply(price, pc.subtract(1.0, disc))
        batch = batch.append_column(
            "base_cents", pc.cast(pc.round(pc.multiply(price, 100.0), 0, round_mode="half_towards_infinity"), pa.int64())
        )
        batch = batch.append_column(
            "revenue_cents", pc.cast(pc.round(pc.multiply(rev, 100.0), 0, round_mode="half_towards_infinity"), pa.int64())
        )
        batch = batch.append_column(
            "disc_cents", pc.cast(pc.round(pc.multiply(disc, 100.0), 0, round_mode="half_towards_infinity"), pa.int64())
        )
        return batch

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("revenue_cents", alias_name="sum_revenue_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )


def orders_by_segment(sf_dir: str):
    """Broadcast hash join: customer (small side) shipped once via
    ray.put, looked up inside map_batches — no shuffle."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = rd.read_parquet(
        "%s/customer.parquet" % sf_dir, columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class SegmentJoiner:
        def __init__(self):
            self.seg = ray.get(seg_map_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            # vectorized broadcast lookup (pandas hash-map join) — the
            # per-row dict.get list-comp this replaces was the only
            # Python inner loop in the plan
            import pandas as pd

            keys = batch.column("o_custkey").to_pandas()
            segs = keys.map(self.seg).fillna("")
            batch = batch.append_column("c_mktsegment", pa.array(segs, pa.string()))
            return batch.append_column(
                "total_cents",
                pc.cast(
                    pc.round(pc.multiply(batch.column("o_totalprice"), 100.0), 0, round_mode="half_towards_infinity"), pa.int64()
                ),
            )

    orders = rd.read_parquet(
        "%s/orders.parquet" % sf_dir, columns=["o_custkey", "o_totalprice"]
    )
    joined = orders.map_batches(
        SegmentJoiner, batch_format="pyarrow", batch_size=8192, concurrency=(2, 4)
    )
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="total_cents")
    )


def top_orders(sf_dir: str, k: int = 10):
    import ray.data as rd

    ds = rd.read_parquet(
        "%s/orders.parquet" % sf_dir, columns=["o_orderkey", "o_totalprice"]
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event type: vectorized window-key
    derivation inside map_batches + grouped aggregate (the engine's
    windowed-aggregate pattern; ordering-free because the window key is
    content-derived)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        "%s/events.parquet" % sf_dir, columns=["ts", "event_type", "value"]
    )

    def window_key(batch: pa.Table) -> pa.Table:
        # floor to hour, expressed as epoch seconds (int64)
        secs = pc.divide(pc.cast(batch.column("ts"), pa.int64()), 1_000_000)
        hour = pc.multiply(pc.divide(secs, 3600), 3600)
        batch = batch.append_column("window_start", pc.cast(hour, pa.int64()))
        return batch.append_column(
            "value_milli",
            pc.cast(
                pc.round(pc.multiply(batch.column("value"), 1000.0), 0,
                         round_mode="half_towards_infinity"),
                pa.int64(),
            ),
        )

    return (
        ds.map_batches(window_key, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value_milli", alias_name="value_milli"))
    )


SESSION_GAP_S = 1800


def sessionize_events(sf_dir: str):
    """Session windows per user: groupby(user).map_groups over
    ts-sorted events; gap > 30 min starts a new session.  Returns
    (user_id, n_sessions, n_events)."""
    import ray.data as rd

    ds = rd.read_parquet("%s/events.parquet" % sf_dir, columns=["user_id", "ts"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        ts = group["ts"].sort_values()
        gaps = ts.diff().dt.total_seconds().fillna(0)
        n_sessions = int((gaps > SESSION_GAP_S).sum()) + (1 if len(ts) else 0)
        return pd.DataFrame(
            {
                "user_id": [group["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(ts)],
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
