"""Duplicate-cluster extraction: connected components over near-duplicate
pairs (the step after pair mining in a corpus-dedup pipeline — every doc in
a component keeps one canonical representative).

Distributed CC by iterative min-label propagation (the classic
MapReduce-style algorithm; see Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — public literature): each round every node
takes the minimum label among itself and its neighbours; rounds needed =
graph diameter, and near-dup components are clique-like so a handful of
rounds converges.  Each round is one bucketed reduce-side exchange.

Edges come from the EXACT prefix-filter n-gram Jaccard join, so the whole
operator is reproducible in SQL (recursive CTE) and oracle-checked.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from . import stages


def duplicate_clusters(ds, threshold: float = 0.5, rounds: int = 64,
                       n_buckets: int | None = None,
                       driver_pair_limit: int = 5_000_000):
    """(doc_id, cluster_id) for every document in at least one near-dup
    pair; cluster_id = the minimum doc_id of the component.

    Hybrid execution: the near-dup PAIR set is orders of magnitude smaller
    than the corpus (that is the point of dedup), so when it fits under
    ``driver_pair_limit`` rows a driver-side union-find finishes in one
    pass — only (id_a, id_b) pairs ever reach the driver, never documents.
    Larger pair sets fall back to the distributed min-label propagation
    below (2 bucketed shuffles per round, O(diameter) rounds)."""
    from . import dedup

    pairs = dedup.ngram_jaccard_pairs(ds, threshold=threshold)
    id_type = ds.schema().base_schema.field("doc_id").type

    pairs = pairs.materialize()
    if n_buckets is None:
        n_buckets = dedup._n_buckets_for(pairs.count())
    if pairs.count() <= driver_pair_limit:
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in pairs.iter_rows():
            a, b = find(row["id_a"]), find(row["id_b"])
            if a != b:
                # min id becomes the root so cluster_id = component min
                if b < a:
                    a, b = b, a
                parent[b] = a
        nodes = sorted(parent.keys())
        out = pd.DataFrame(
            {"doc_id": nodes, "cluster_id": [find(x) for x in nodes]}
        )
        import ray.data as rd

        return rd.from_pandas(out)

    # undirected edge list, bucketed by node hash
    edge_schema = pa.schema([("b", pa.int32()), ("node", id_type), ("nbr", id_type)])

    def edges(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_pylist()
        b = t["id_b"].to_pylist()
        nodes = a + b
        nbrs = b + a
        bk = [zlib.crc32(str(x).encode()) % n_buckets for x in nodes]
        return pa.table(
            {"b": pa.array(bk, pa.int32()),
             "node": pa.array(nodes, id_type),
             "nbr": pa.array(nbrs, id_type)},
            schema=edge_schema,
        )

    edges_ds = pairs.map_batches(edges, batch_format="pyarrow").materialize()

    label_schema = pa.schema([("b", pa.int32()), ("node", id_type), ("lbl", id_type)])

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": t["b"].combine_chunks(),
             "node": t["node"].combine_chunks(),
             "lbl": t["node"].combine_chunks()},
            schema=label_schema,
        )

    init_min = lambda g: (  # noqa: E731
        g.sort_values("node").groupby("node", as_index=False)["lbl"].min().assign(
            b=lambda d: [zlib.crc32(str(x).encode()) % n_buckets for x in d["node"]]
        )
    )
    seed = edges_ds.map_batches(init_labels, batch_format="pyarrow")
    labels = stages.gated_groupby(edges_ds, seed, "b", init_min, batch_format="pandas")
    labels = labels.materialize()

    def _label_fingerprint(lds) -> int:
        # order-independent multiset hash of (node, lbl); min-label
        # propagation is monotone, so any change changes the multiset
        def fp(t: pa.Table) -> pa.Table:
            h = [
                zlib.crc32(f"{n}|{l}".encode())
                for n, l in zip(t["node"].to_pylist(), t["lbl"].to_pylist())
            ]
            return pa.table({"h": pa.array(h, pa.int64())})

        s = lds.map_batches(fp, batch_format="pyarrow").sum("h")
        return int(s or 0)

    prev_fp = _label_fingerprint(labels)
    converged = False
    for _ in range(max(1, rounds)):
        # send each node's label to its neighbours: key messages by the
        # RECEIVER's bucket; combine with the receiver's own label
        def msgs(t: pa.Table) -> pa.Table:
            # t: labels (b, node, lbl); join-side handled reduce-side, so we
            # route BOTH the label rows and edge rows through one groupby
            return pa.table(
                {"b": t["b"].combine_chunks(),
                 "node": t["node"].combine_chunks(),
                 "nbr": pa.array([None] * len(t), id_type),
                 "lbl": t["lbl"].combine_chunks()},
                schema=pa.schema([("b", pa.int32()), ("node", id_type),
                                  ("nbr", id_type), ("lbl", id_type)]),
            )

        def edge_rows(t: pa.Table) -> pa.Table:
            return pa.table(
                {"b": t["b"].combine_chunks(),
                 "node": t["node"].combine_chunks(),
                 "nbr": t["nbr"].combine_chunks(),
                 "lbl": pa.array([None] * len(t), id_type)},
                schema=pa.schema([("b", pa.int32()), ("node", id_type),
                                  ("nbr", id_type), ("lbl", id_type)]),
            )

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            # within the bucket: label of `node` flows along its edges to
            # `nbr`; output (nbr, candidate_label) messages + own labels
            lab = g[g["nbr"].isna()][["node", "lbl"]]
            edg = g[g["lbl"].isna()][["node", "nbr"]]
            out = edg.merge(lab, on="node", how="inner")[["nbr", "lbl"]]
            out = out.rename(columns={"nbr": "node"})
            both = pd.concat([lab, out], ignore_index=True)
            both = both.groupby("node", as_index=False)["lbl"].min()
            # NB: messages land in the SENDER's bucket here; re-bucket by
            # receiver for the next grouping round
            both["b"] = [zlib.crc32(str(x).encode()) % n_buckets for x in both["node"]]
            if pa.types.is_integer(id_type) and both["lbl"].dtype.kind == "f":
                # the union table's null-padded lbl arrives as float64;
                # post-min it is NaN-free — restore the id dtype so every
                # group/bucket emits one stable schema
                both["lbl"] = both["lbl"].astype(np.int64)
            return both[["b", "node", "lbl"]]

        tagged = labels.map_batches(msgs, batch_format="pyarrow").union(
            edges_ds.map_batches(edge_rows, batch_format="pyarrow")
        )
        combined = stages.gated_groupby(
            [labels, edges_ds], tagged, "b", propagate, batch_format="pandas"
        )

        # messages may target nodes in other buckets: one more min-combine
        def reduce_labels(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False).agg(b=("b", "first"), lbl=("lbl", "min"))[["b", "node", "lbl"]]

        reduced = stages.gated_groupby(
            None, combined, "b", reduce_labels, batch_format="pandas"
        )
        labels = reduced.materialize()

        fp = _label_fingerprint(labels)
        if fp == prev_fp:  # fixpoint: no label changed this round
            converged = True
            break
        prev_fp = fp

    if not converged:
        import logging

        logging.getLogger(__name__).warning(
            "duplicate_clusters: label propagation did not converge within "
            "%d rounds; components with diameter > rounds may be split",
            rounds,
        )

    def finish(t) -> pd.DataFrame:
        df = t if isinstance(t, pd.DataFrame) else t.to_pandas()
        return df.rename(columns={"node": "doc_id", "lbl": "cluster_id"})[
            ["doc_id", "cluster_id"]
        ]

    return labels.map_batches(finish, batch_format="pandas")


def duplicate_clusters_sql(threshold: float = 0.5) -> str:
    from . import dedup

    pair_sql = dedup.ngram_jaccard_sql(threshold=threshold)
    return f"""
        WITH RECURSIVE prs AS ({pair_sql}),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM prs
          UNION
          SELECT id_b, id_a FROM prs
        ),
        cc(node, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.a, c.lbl FROM edges e JOIN cc c ON c.node = e.b
        )
        SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
        FROM cc GROUP BY node
    """
