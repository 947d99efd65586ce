"""Distributed PageRank over an (src, dst) edge Dataset — the classic
iterative KG-analytics workload (entity importance over the
constructed graph).

Per power-iteration superstep:

    contrib(dst) = sum over in-edges of rank(src) / outdeg(src)
    rank'(v)     = (1-d)/N + d * (contrib(v) + dangling_mass/N)

Two execution modes, chosen by the vertex count:

* **Broadcast iteration** (|V| <= ``broadcast_limit``): the rank
  vector is ``ray.put`` once per superstep and each edge batch
  computes its partial contribution sums with a vectorized pandas
  merge + groupby — per superstep that is ONE read pass over the
  (arbitrarily large) edge set and ZERO all-to-all exchanges.  The
  per-batch partials are |V|-bounded, so the final combine is a tiny
  driver-side groupby.  Graphs whose vertex table fits in a worker
  heap (hundreds of millions of nodes) take this path even when the
  EDGE set is 100 TB — edges never move.

* **Shuffle iteration** (giant vertex tables): the general
  formulation — bucketed join ranks->edges on src, Ray-native
  ``groupby(dst).sum``, bucketed left join back onto the rank table.
  Three exchanges per superstep, all on <=24-byte rows; rank-table
  block counts are re-bounded each superstep because sort exchanges
  otherwise multiply blocks geometrically across supersteps.

* ``outdeg`` is computed once and carried WITH the rank table so the
  per-step join ships a single (node, rank, outdeg) row per vertex.
* dangling mass (nodes with outdeg 0) is folded back uniformly.
* every shuffle superstep materializes ranks (|V| rows — bounded):
  the table is consumed by the join AND the next step, and Ray
  re-executes lineage per consumer.

Ranks are floats; parallel summation order makes low bits
run-dependent, so results are verified by pytest against a dense
numpy reference with tolerance (rows-only at the driver, like the
other iterative/approximate ops).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .join import bucketed_hash_join

_RANK_SCHEMA = pa.schema(
    [("node", pa.int64()), ("rank", pa.float64()), ("outdeg", pa.int64())]
)
_PARTIAL_SCHEMA = pa.schema([("node", pa.int64()), ("c", pa.float64())])
_EMPTY_PARTIAL = _PARTIAL_SCHEMA.empty_table()


def _nodes_and_outdeg(edges) -> "pd.DataFrame | None":
    """Driver-side (node, outdeg) table via distributed partials —
    returns None only if the graph is empty."""
    from ray.data.aggregate import Count

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    def dedup_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["node"])

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .map_batches(dedup_nodes, batch_format="pandas")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    outdeg = edges.groupby("src").aggregate(Count(alias_name="outdeg"))
    nodes_df = nodes.to_pandas()
    if not len(nodes_df):
        return None
    deg_df = outdeg.to_pandas().rename(columns={"src": "node"})
    out = nodes_df.merge(deg_df, on="node", how="left")
    out["outdeg"] = out["outdeg"].fillna(0).astype("int64")
    return out


def _teleport_vector(nodes, seeds):
    """Per-node teleport distribution e: uniform without seeds,
    1/|seeds| on the seed rows otherwise.  Seeds absent from the node
    set would silently leak rank mass — refuse loudly."""
    import numpy as np

    n = len(nodes)
    if seeds is None:
        return np.full(n, 1.0 / n)
    seeds = sorted(set(seeds))
    pos = pd.Series(range(n), index=nodes)
    hit = pos.reindex(seeds)
    if hit.isna().any():
        missing = [s for s, p in zip(seeds, hit) if pd.isna(p)]
        raise ValueError(
            "personalized PageRank seeds not in the graph: %r" % missing[:5]
        )
    e = np.zeros(n)
    e[hit.to_numpy(dtype=np.int64)] = 1.0 / len(seeds)
    return e


def _pagerank_broadcast(edges, state: pd.DataFrame, n_iters: int, damping: float,
                        seeds=None):
    """Rank vector on the driver; per superstep one broadcast + one
    edge-set pass producing |V|-bounded partials."""
    import ray

    n_nodes = len(state)
    state = state.sort_values("node").reset_index(drop=True)
    e = _teleport_vector(state["node"].to_numpy(), seeds)
    state["rank"] = e

    for _ in range(n_iters):
        deg = state["outdeg"].to_numpy()
        shares = state["rank"].to_numpy() / pd.Series(deg).replace(0, 1).to_numpy()
        share_df = pd.DataFrame({"node": state["node"].to_numpy(), "share": shares})
        share_ref = ray.put(share_df)
        dangling = float(state.loc[state["outdeg"] == 0, "rank"].sum())

        def partial(batch: pa.Table) -> pa.Table:
            sh = ray.get(share_ref)
            eb = batch.to_pandas()
            m = eb.merge(sh, left_on="src", right_on="node", how="inner")
            if not len(m):
                return _EMPTY_PARTIAL
            agg = m.groupby("dst", as_index=False)["share"].sum()
            return pa.Table.from_arrays(
                [
                    pa.array(agg["dst"].to_numpy(), pa.int64()),
                    pa.array(agg["share"].to_numpy(), pa.float64()),
                ],
                schema=_PARTIAL_SCHEMA,
            )

        partials = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
        if "node" in partials.columns and len(partials):
            contrib = partials.groupby("node", as_index=False)["c"].sum()
        else:
            contrib = pd.DataFrame({"node": [], "c": []})
        merged = state[["node", "outdeg"]].merge(contrib, on="node", how="left")
        state["rank"] = (
            (1.0 - damping) * e
            + damping * (merged["c"].fillna(0.0).to_numpy() + dangling * e)
        )

    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array(state["node"].to_numpy(), pa.int64()),
                pa.array(state["rank"].to_numpy(), pa.float64()),
            ],
            schema=pa.schema([("node", pa.int64()), ("rank", pa.float64())]),
        )
    )


def _pagerank_shuffle(
    edges, n_nodes: int, n_iters: int, damping: float, n_buckets: int,
    seeds=None,
):
    """The general bucketed-exchange formulation for vertex tables too
    large to broadcast.  ``seeds``: the teleport vector is seed-set
    sized, so it broadcasts and e(v) evaluates map-side (is_in)."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    seed_arr = (
        None if seeds is None else pa.array(sorted(set(seeds)), pa.int64())
    )
    e_seed = 0.0 if seeds is None else 1.0 / len(set(seeds))

    def e_of(node_col):
        """Teleport mass per node, vectorized."""
        import pyarrow.compute as pc

        if seed_arr is None:
            n = len(node_col)
            return pa.array(np.full(n, 1.0 / n_nodes), pa.float64())
        return pc.if_else(
            pc.is_in(node_col, value_set=seed_arr), e_seed, 0.0
        )

    outdeg = edges.groupby("src").aggregate(Count(alias_name="outdeg"))

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    def dedup_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["node"])

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .map_batches(dedup_nodes, batch_format="pandas")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )

    if seed_arr is not None:
        import pyarrow.compute as pc

        found = nodes.map_batches(
            lambda t: t.filter(
                pc.is_in(t.column("node"), value_set=seed_arr)
            ),
            batch_format="pyarrow",
        ).count()
        if found != len(seed_arr):
            raise ValueError(
                "personalized PageRank: %d of %d seeds not in the graph"
                % (len(seed_arr) - found, len(seed_arr))
            )

    ranks = (
        bucketed_hash_join(
            nodes.map_batches(
                lambda t: t.append_column("rank", e_of(t.column("node"))),
                batch_format="pyarrow",
            ),
            outdeg.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"node": t.column("src"), "outdeg": t.column("outdeg")}
                ),
                batch_format="pyarrow",
            ),
            on="node",
            how="left",
            n_buckets=n_buckets,
            left_schema=pa.schema([("node", pa.int64()), ("rank", pa.float64())]),
            right_schema=pa.schema([("node", pa.int64()), ("outdeg", pa.int64())]),
        )
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "node": t.column("node"),
                    "rank": t.column("rank"),
                    "outdeg": pa.compute.fill_null(t.column("outdeg"), 0),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(n_buckets)
        .materialize()
    )

    for _ in range(n_iters):
        def dangling_partial(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.equal(batch.column("outdeg"), 0)
            s = pc.sum(pc.if_else(mask, batch.column("rank"), 0.0)).as_py() or 0.0
            return pa.Table.from_pydict({"m": pa.array([s], pa.float64())})

        dangling = sum(
            row["m"]
            for row in ranks.map_batches(
                dangling_partial, batch_format="pyarrow"
            ).take_all()
        )

        def contribs(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            deg = pc.if_else(
                pc.equal(batch.column("outdeg"), 0),
                pa.scalar(1, pa.int64()),
                batch.column("outdeg"),
            )
            share = pc.divide(batch.column("rank"), pc.cast(deg, pa.float64()))
            return pa.Table.from_pydict(
                {"node": batch.column("node"), "share": share}
            )

        contrib = (
            bucketed_hash_join(
                edges.map_batches(
                    lambda t: pa.Table.from_pydict(
                        {"node": t.column("src"), "dst": t.column("dst")}
                    ),
                    batch_format="pyarrow",
                ),
                ranks.map_batches(contribs, batch_format="pyarrow"),
                on="node",
                n_buckets=n_buckets,
                left_schema=pa.schema([("node", pa.int64()), ("dst", pa.int64())]),
                right_schema=pa.schema(
                    [("node", pa.int64()), ("share", pa.float64())]
                ),
            )
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"node": t.column("dst"), "c": t.column("share")}
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("c", alias_name="contrib"))
        )

        # per-node base: ((1-d) + d*dangling) * e(v) — reduces to the
        # classic scalar when e is uniform
        base_scale = (1.0 - damping) + damping * dangling

        ranks = (
            bucketed_hash_join(
                ranks.map_batches(
                    lambda t: pa.Table.from_pydict(
                        {"node": t.column("node"), "outdeg": t.column("outdeg")}
                    ),
                    batch_format="pyarrow",
                ),
                contrib,
                on="node",
                how="left",
                n_buckets=n_buckets,
                left_schema=pa.schema(
                    [("node", pa.int64()), ("outdeg", pa.int64())]
                ),
                right_schema=pa.schema(
                    [("node", pa.int64()), ("contrib", pa.float64())]
                ),
            )
            .map_batches(
                lambda t, _bs=base_scale: pa.Table.from_pydict(
                    {
                        "node": t.column("node"),
                        "rank": pa.compute.add(
                            pa.compute.multiply(
                                pa.compute.fill_null(t.column("contrib"), 0.0),
                                damping,
                            ),
                            pa.compute.multiply(e_of(t.column("node")), _bs),
                        ),
                        "outdeg": t.column("outdeg"),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(n_buckets)
            .materialize()
        )

    return ranks.drop_columns(["outdeg"])


def _pagerank_local(edges_df: pd.DataFrame, n_iters: int, damping: float,
                    seeds=None):
    """Driver-side power iteration for edge sets that fit in one heap:
    the identical update rule on dense numpy (factorized node ids).
    Spinning distributed supersteps over a few thousand edges pays
    ~0.6 s of orchestration PER ITERATION for microseconds of math
    (measured on the 500-doc category tree: 6.4 s -> <1 s)."""
    import numpy as np

    nodes = pd.unique(pd.concat([edges_df["src"], edges_df["dst"]]))
    nodes = pd.Series(nodes).sort_values().to_numpy()
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    src = edges_df["src"].map(idx).to_numpy()
    dst = edges_df["dst"].map(idx).to_numpy()
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    e = _teleport_vector(nodes, seeds)
    rank = e.copy()
    safe_deg = np.where(outdeg == 0, 1.0, outdeg)
    for _ in range(n_iters):
        shares = rank / safe_deg
        contrib = np.bincount(dst, weights=shares[src], minlength=n)
        dangling = rank[outdeg == 0].sum()
        rank = (1.0 - damping) * e + damping * (contrib + dangling * e)
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(nodes, pa.int64()), pa.array(rank, pa.float64())],
            schema=pa.schema([("node", pa.int64()), ("rank", pa.float64())]),
        )
    )


def pagerank(
    edges_ds,
    n_iters: int = 12,
    damping: float = 0.85,
    n_buckets: int = 32,
    broadcast_limit: int = 2_000_000,
    local_limit: int = 100_000,
    seeds=None,
):
    """Returns a Dataset (node:int64, rank:float64); ranks sum to ~1.
    Nodes = every endpoint appearing in ``edges_ds``.

    ``seeds``: personalized PageRank — teleport lands uniformly on the
    seed set instead of all nodes (random-walk-with-restart proximity:
    "entities related to THESE"), dangling mass redistributes to the
    seeds likewise.  Seeds absent from the graph raise (silent absence
    would leak rank mass).  All three execution modes honor it; the
    teleport vector is seed-set sized, so even the shuffle mode pays
    only a broadcast ``is_in``.

    Adaptive execution: edge sets <= ``local_limit`` rows run ONE
    driver-side dense power iteration (adaptive small-input path, like
    a broadcast join); vertex tables <= ``broadcast_limit`` run the
    zero-shuffle broadcast supersteps; above that, the bucketed
    exchange supersteps."""
    edges = edges_ds.materialize()
    if edges.count() <= local_limit:
        edges_df = edges.to_pandas()
        if not len(edges_df):
            import ray.data as rd

            return rd.from_arrow(
                pa.schema(
                    [("node", pa.int64()), ("rank", pa.float64())]
                ).empty_table()
            )
        return _pagerank_local(edges_df, n_iters, damping, seeds=seeds)
    state = _nodes_and_outdeg(edges)
    if state is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema([("node", pa.int64()), ("rank", pa.float64())]).empty_table()
        )
    if len(state) <= broadcast_limit:
        return _pagerank_broadcast(edges, state, n_iters, damping, seeds=seeds)
    return _pagerank_shuffle(edges, len(state), n_iters, damping, n_buckets, seeds=seeds)
