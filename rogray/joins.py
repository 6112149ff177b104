"""Distributed equi-joins as reduce-side hash-bucket shuffles.

The reference engine gets joins from PostgreSQL for free; here the same
semantics are expressed Ray-Data-first: both sides are tagged into one
unified schema, bucketed by ``key mod n_buckets``, shuffled ONCE with a
single groupby, and each bucket joins vectorized (pandas hash merge /
np.isin).  One group handles ~4k keys, so group scheduling stays off the
hot path and the largest group stays bounded at 100 TB (same scaling rule
as dedup's `_n_buckets_for`).

Broadcast joins (`ray.put` a dict once, look up inside map_batches) remain
the right tool for SMALL dimension sides — see relational.top_customers.
This module is for fact x fact joins where neither side fits in one heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import stages


def _null_array(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def bucket_join(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    left_cols: list[tuple[str, pa.DataType]],
    right_cols: list[tuple[str, pa.DataType]],
    n_buckets: int,
    how: str = "inner",
):
    """Join two Datasets on an int64 key without materializing either side.

    left_cols / right_cols declare the payload columns (name, arrow type)
    each side contributes (the join keys themselves need not be listed).
    Column names must be disjoint between the two sides.

    how: 'inner'  -> one row per matching pair, key + both payloads
         'semi'   -> left rows with >=1 match, left payload only
         'anti'   -> left rows with NO match, left payload only
    """
    if how not in ("inner", "semi", "anti"):
        raise ValueError(how)
    overlap = {n for n, _ in left_cols} & {n for n, _ in right_cols}
    if overlap:
        raise ValueError(f"overlapping payload columns: {overlap}")

    schema = pa.schema(
        [("jk", pa.int64()), ("bkt", pa.int64()), ("is_r", pa.bool_())]
        + [(n, t) for n, t in left_cols]
        + [(n, t) for n, t in right_cols]
    )

    def _tagger(on: str, is_right: bool):
        def tag(t: pa.Table) -> pa.Table:
            n = len(t)
            jk = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "jk": pa.array(jk, pa.int64()),
                "bkt": pa.array(jk % n_buckets, pa.int64()),
                "is_r": pa.array(np.full(n, is_right), pa.bool_()),
            }
            own = right_cols if is_right else left_cols
            other = left_cols if is_right else right_cols
            for name, typ in own:
                cols[name] = t[name].cast(typ).combine_chunks()
            for name, typ in other:
                cols[name] = _null_array(n, typ)
            return pa.table(cols, schema=schema)

        tag.__name__ = "tag_right" if is_right else "tag_left"
        return tag

    out_fields = (
        [("jk", pa.int64())]
        + [(n, t) for n, t in left_cols]
        + ([(n, t) for n, t in right_cols] if how == "inner" else [])
    )
    out_schema = pa.schema(out_fields)

    def join_bucket(g: pa.Table) -> pa.Table:
        is_r = g["is_r"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(~is_r)
        ri = np.flatnonzero(is_r)
        if len(li) == 0:
            return out_schema.empty_table()
        left = g.take(pa.array(li, pa.int64()))
        ljk = left["jk"].to_numpy()
        rjk = g["jk"].to_numpy()[ri]
        if how in ("semi", "anti"):
            hit = np.isin(ljk, rjk)
            keep = hit if how == "semi" else ~hit
            sel = left.take(pa.array(np.flatnonzero(keep), pa.int64()))
            return pa.table(
                {"jk": sel["jk"]} | {n: sel[n] for n, _ in left_cols},
                schema=out_schema,
            )
        if len(ri) == 0:
            return out_schema.empty_table()
        right = g.take(pa.array(ri, pa.int64()))
        # vectorized pair expansion: sort right once, emit one output row
        # per (left, matching right) pair (duplicate right keys fan out)
        order = np.argsort(rjk, kind="stable")
        rjk_s = rjk[order]
        lo = np.searchsorted(rjk_s, ljk, side="left")
        hi = np.searchsorted(rjk_s, ljk, side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return out_schema.empty_table()
        l_rep = np.repeat(np.arange(len(ljk)), cnt)
        r_pos = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(lo, cnt)
        )
        r_sel = order[r_pos]
        lt = left.take(pa.array(l_rep, pa.int64()))
        rt = right.take(pa.array(r_sel, pa.int64()))
        return pa.table(
            {"jk": lt["jk"]}
            | {n: lt[n] for n, _ in left_cols}
            | {n: rt[n] for n, _ in right_cols},
            schema=out_schema,
        )

    join_bucket.__name__ = f"join_{how}"
    tagged = left_ds.map_batches(_tagger(left_on, False), batch_format="pyarrow").union(
        right_ds.map_batches(_tagger(right_on, True), batch_format="pyarrow")
    )
    return stages.gated_groupby([left_ds, right_ds], tagged, "bkt", join_bucket)

# ---------------------------------------------------------------------------
# join-heavy pipelines with exact DuckDB oracles (TPC-H Q3/Q4/Q10 shapes)
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


def _us(col) -> np.ndarray:
    """timestamp column -> int64 microseconds since epoch."""
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)


def _cut_us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype(np.int64))


def _nb_for(sf_dir: str, table: str) -> int:
    import ray.data as rd

    from .dedup import _n_buckets_for

    return _n_buckets_for(rd.read_parquet(f"{sf_dir}/{table}.parquet").count())


def shipping_priority(sf_dir: str, cutoff: str = "1998-01-01", n: int = 10):
    """TPC-H Q3 shape: BUILDING customers' orders placed before the cutoff,
    revenue from lineitems shipped after it; top-n open orders by revenue.

    customer is broadcast (small side); orders x lineitem is the fact-fact
    bucket join.  Revenue is exact integer cent-hundredths:
    sum(round(extprice*100) * (100 - round(discount*100)))."""
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from .relational import _cents

    cut = _cut_us(cutoff)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = np.asarray(cust["c_mktsegment"].to_pylist(), dtype=object)
    keys_ref = ray.put(
        np.sort(cust["c_custkey"].to_numpy(zero_copy_only=False)[seg == "BUILDING"])
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )

    def f_orders(t: pa.Table) -> pa.Table:
        import ray as _r

        bkeys = _r.get(keys_ref)
        d = _us(t["o_orderdate"])
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(bkeys, ck)
        pos_c = np.minimum(pos, max(len(bkeys) - 1, 0))
        is_b = (len(bkeys) > 0) & (bkeys[pos_c] == ck)
        keep = np.flatnonzero((d < cut) & is_b)
        t = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_date_us": pa.array(_us(t["o_orderdate"]), pa.int64()),
                "o_orderpriority": t["o_orderpriority"].cast(pa.string()).combine_chunks(),
            }
        )

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def f_line(t: pa.Table) -> pa.Table:
        d = _us(t["l_shipdate"])
        keep = np.flatnonzero(d > cut)
        t = t.take(pa.array(keep, pa.int64()))
        rev = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].combine_chunks(),
                "rev_c": pa.array(rev, pa.int64()),
            }
        )

    joined = bucket_join(
        line.map_batches(f_line, batch_format="pyarrow"),
        orders.map_batches(f_orders, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        [("rev_c", pa.int64())],
        [("o_date_us", pa.int64()), ("o_orderpriority", pa.string())],
        n_buckets=_nb_for(sf_dir, "orders"),
        how="inner",
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["jk", "o_date_us", "o_orderpriority", "rev_c"]),
            ["jk", "o_date_us", "o_orderpriority"],
        ).aggregate([("rev_c", "sum")])
        return pa.table(
            {
                "l_orderkey": g["jk"],
                "o_date_us": g["o_date_us"],
                "o_orderpriority": g["o_orderpriority"],
                "revenue_c": g["rev_c_sum"],
            }
        )

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_date_us", "o_orderpriority"])
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .sort(["revenue_c", "l_orderkey"], descending=[True, False])
        .limit(n)
    )


def shipping_priority_sql(cutoff: str = "1998-01-01", n: int = 10) -> str:
    return f"""
        SELECT l_orderkey,
               epoch_us(o_orderdate) AS o_date_us,
               o_orderpriority,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                   AS revenue_c
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '{cutoff}'
          AND l_shipdate  > TIMESTAMP '{cutoff}'
        GROUP BY l_orderkey, o_date_us, o_orderpriority
        ORDER BY revenue_c DESC, l_orderkey
        LIMIT {n}
    """


def order_priority_counts(sf_dir: str, year: int = 1997):
    """TPC-H Q4 shape (adapted: no commitdate column in this layer): count
    orders of the year having at least one RETURNED lineitem, by priority.
    The EXISTS becomes a bucketed SEMI join — only (key) rows shuffle for
    the probe side."""
    import ray.data as rd

    lo, hi = _cut_us(f"{year}-01-01"), _cut_us(f"{year + 1}-01-01")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def f_orders(t: pa.Table) -> pa.Table:
        d = _us(t["o_orderdate"])
        keep = np.flatnonzero((d >= lo) & (d < hi))
        t = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_orderpriority": t["o_orderpriority"].cast(pa.string()).combine_chunks(),
            }
        )

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def f_line(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], "R")
        return pa.table({"l_orderkey": t.filter(keep)["l_orderkey"].combine_chunks()})

    semi = bucket_join(
        orders.map_batches(f_orders, batch_format="pyarrow"),
        line.map_batches(f_line, batch_format="pyarrow"),
        "o_orderkey",
        "l_orderkey",
        [("o_orderpriority", pa.string())],
        [],
        n_buckets=_nb_for(sf_dir, "orders"),
        how="semi",
    )

    from ray.data.aggregate import Count

    return (
        semi.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def order_priority_counts_sql(year: int = 1997) -> str:
    return f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{year}-01-01'
          AND o_orderdate <  TIMESTAMP '{year + 1}-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


def returned_items(sf_dir: str, lo: str = "1997-07-01", hi: str = "1998-01-01", n: int = 20):
    """TPC-H Q10 shape: revenue lost to returned items per customer in a
    half-year of orders; top-n customers with name + nation attached.
    lineitem x orders is the bucket join; customer/nation are broadcast."""
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    from .relational import _cents

    lo_us, hi_us = _cut_us(lo), _cut_us(hi)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def f_orders(t: pa.Table) -> pa.Table:
        d = _us(t["o_orderdate"])
        keep = np.flatnonzero((d >= lo_us) & (d < hi_us))
        t = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_custkey": t["o_custkey"].combine_chunks(),
            }
        )

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def f_line(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].combine_chunks(),
                "rev_c": pa.array(rev, pa.int64()),
            }
        )

    joined = bucket_join(
        line.map_batches(f_line, batch_format="pyarrow"),
        orders.map_batches(f_orders, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        [("rev_c", pa.int64())],
        [("o_custkey", pa.int64())],
        n_buckets=_nb_for(sf_dir, "orders"),
        how="inner",
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    cmap_ref = ray.put(
        dict(
            zip(
                cust["c_custkey"].to_pylist(),
                zip(cust["c_name"].to_pylist(),
                    (nmap.get(k) for k in cust["c_nationkey"].to_pylist())),
            )
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["o_custkey", "rev_c"]), ["o_custkey"]
        ).aggregate([("rev_c", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "revenue_c": g["rev_c_sum"]})

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
    )

    def attach(t: pa.Table) -> pa.Table:
        import ray as _r

        cmap = _r.get(cmap_ref)
        ks = t["o_custkey"].to_pylist()
        names = [cmap.get(k, (None, None))[0] for k in ks]
        nats = [cmap.get(k, (None, None))[1] for k in ks]
        return t.append_column("c_name", pa.array(names, pa.string())).append_column(
            "n_name", pa.array(nats, pa.string())
        )

    return (
        agg.map_batches(attach, batch_format="pyarrow")
        .sort(["revenue_c", "o_custkey"], descending=[True, False])
        .limit(n)
    )


def returned_items_sql(lo: str = "1997-07-01", hi: str = "1998-01-01", n: int = 20) -> str:
    return f"""
        SELECT o_custkey,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                   AS revenue_c,
               any_value(c_name) AS c_name,
               any_value(n_name) AS n_name
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '{lo}'
          AND o_orderdate <  TIMESTAMP '{hi}'
        GROUP BY o_custkey
        ORDER BY revenue_c DESC, o_custkey
        LIMIT {n}
    """


def customers_without_orders(sf_dir: str, since: str = "1999-01-01"):
    """Anti-join: customers with no order on/after the cutoff date (lapsed
    customers), aggregated per market segment (count + total account
    balance in cents).  Only (key) rows shuffle for the probe side."""
    import ray.data as rd

    from .relational import _cents

    since_us = _cut_us(since)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )

    def f_cust(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"].combine_chunks(),
                "c_mktsegment": t["c_mktsegment"].cast(pa.string()).combine_chunks(),
                "acctbal_c": pa.array(
                    _cents(t["c_acctbal"].to_numpy(zero_copy_only=False)), pa.int64()
                ),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def f_orders(t: pa.Table) -> pa.Table:
        keep = np.flatnonzero(_us(t["o_orderdate"]) >= since_us)
        t = t.take(pa.array(keep, pa.int64()))
        return pa.table({"o_custkey": t["o_custkey"].combine_chunks()})

    anti = bucket_join(
        cust.map_batches(f_cust, batch_format="pyarrow"),
        orders.map_batches(f_orders, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        [("c_mktsegment", pa.string()), ("acctbal_c", pa.int64())],
        [],
        n_buckets=_nb_for(sf_dir, "customer"),
        how="anti",
    )

    from ray.data.aggregate import Count, Sum

    return (
        anti.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"), Sum("acctbal_c", alias_name="acctbal_c"))
        .sort("c_mktsegment")
    )


def customers_without_orders_sql(since: str = "1999-01-01") -> str:
    return f"""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_c
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '{since}')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """
