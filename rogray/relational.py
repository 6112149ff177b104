"""Relational operators over the TPC-H-ish test tables.

These prove the engine's aggregate/join/window machinery with exact DuckDB
oracles.  Pattern: pre-aggregate per batch inside map_batches (partials),
then a tiny groupby over partials — the scale-correct shape.  Monetary sums
are carried as integer cents so value-hash comparison is float-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import stages
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(values) -> np.ndarray:
    """money -> integer cents, rounding half AWAY from zero like DuckDB's
    round() (np.round is banker's: round(0.5)=0, which silently diverges
    from the oracle whenever x*100 lands exactly on .5)."""
    x = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _picked(g: pa.Table, **out_to_src: str) -> pa.Table:
    """Select/rename TableGroupBy output by generated name (robust to the
    key/aggregate column order, which varies across pyarrow versions)."""
    return pa.table({out: g[src] for out, src in out_to_src.items()})


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary on lineitem (integer cents)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow combiner (no per-batch pandas round-trip)
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": pa.array(_cents(t["l_quantity"].to_numpy()), pa.int64()),
                "price_c": pa.array(_cents(t["l_extendedprice"].to_numpy()), pa.int64()),
                "disc_c": pa.array(_cents(t["l_discount"].to_numpy()), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_c", "sum"), ([], "count_all")]
        )
        return _picked(
            g,
            l_returnflag="l_returnflag",
            l_linestatus="l_linestatus",
            sum_qty_c="qty_c_sum",
            sum_price_c="price_c_sum",
            sum_disc_c="disc_c_sum",
            n="count_all",
        )

    # driver-bounded fact table: partials as one plain-task wave, final
    # 6-group reduce on the driver — same integer sums, associative either
    # way; at scale the gate pre-screen fails and the exchange runs
    input_refs, ds = stages.small_input_refs(ds)
    if input_refs:
        import ray

        outs = [
            t
            for t in ray.get(stages.block_map_refs(input_refs, partial))
            if t is not None and len(t)
        ]
        if outs:
            whole = pa.concat_tables(outs, promote_options="default")
            g = pa.TableGroupBy(whole, ["l_returnflag", "l_linestatus"]).aggregate(
                [
                    ("sum_qty_c", "sum"),
                    ("sum_price_c", "sum"),
                    ("sum_disc_c", "sum"),
                    ("n", "sum"),
                ]
            )
            return rd.from_arrow(
                _picked(
                    g,
                    l_returnflag="l_returnflag",
                    l_linestatus="l_linestatus",
                    sum_qty_c="sum_qty_c_sum",
                    sum_price_c="sum_price_c_sum",
                    sum_disc_c="sum_disc_c_sum",
                    count_order="n_sum",
                )
            )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_c", alias_name="sum_qty_c"),
            Sum("sum_price_c", alias_name="sum_price_c"),
            Sum("sum_disc_c", alias_name="sum_disc_c"),
            Sum("n", alias_name="count_order"),
        )
    )


def pricing_summary_sql() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
               CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """


def top_customers(sf_dir: str, n: int = 20):
    """Revenue per customer via broadcast dimension join + top-n.

    customer is the small side: broadcast as a dict (ray.put pattern); the
    orders fact table streams.
    """
    import pyarrow.parquet as pq

    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    cmap_ref = ray.put(
        dict(
            zip(
                cust["c_custkey"].to_pylist(),
                zip(cust["c_name"].to_pylist(), cust["c_mktsegment"].to_pylist()),
            )
        )
    )  # ray.put ONCE; tasks read the shared object-store copy instead of
    # re-pickling the dict into every task spec
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "price_c": pa.array(_cents(t["o_totalprice"].to_numpy()), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["o_custkey"]).aggregate(
            [("price_c", "sum"), ([], "count_all")]
        )
        return _picked(g, o_custkey="o_custkey", total_c="price_c_sum", n_orders="count_all")

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("total_c", alias_name="total_c"), Sum("n_orders", alias_name="n_orders"))
    )

    def attach(t: pa.Table) -> pa.Table:
        import ray

        cmap = ray.get(cmap_ref)
        keys = t["o_custkey"].to_pylist()
        names = [cmap.get(k, (None, None))[0] for k in keys]
        segs = [cmap.get(k, (None, None))[1] for k in keys]
        return (
            t.append_column("c_name", pa.array(names, pa.string()))
            .append_column("c_mktsegment", pa.array(segs, pa.string()))
        )

    return (
        agg.map_batches(attach, batch_format="pyarrow")
        .sort(["total_c", "o_custkey"], descending=[True, False])
        .limit(n)
    )


def top_customers_sql(n: int = 20) -> str:
    return f"""
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               any_value(c_name) AS c_name,
               any_value(c_mktsegment) AS c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_custkey
        ORDER BY total_c DESC, o_custkey
        LIMIT {n}
    """


def events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type (streaming-shaped workload as a
    groupby over (type, hour))."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hour = pc.divide(
            pc.cast(
                pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("ns")), unit="hour"),
                pa.int64(),
            ),
            10**9,
        )
        t2 = pa.table(
            {
                "event_type": t["event_type"],
                "hour_epoch": hour,
                "value_c": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["event_type", "hour_epoch"]).aggregate(
            [("value_c", "sum"), ([], "count_all")]
        )
        return _picked(
            g,
            event_type="event_type",
            hour_epoch="hour_epoch",
            n="count_all",
            sum_value_c="value_c_sum",
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c"))
    )


def events_hourly_sql() -> str:
    return """
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    """


def supplier_nation_rollup(sf_dir: str):
    """Join supplier->nation->region with broadcast dims, rollup counts."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["s_nationkey"].to_pylist()
        t2 = pa.table(
            {
                "r_name": pa.array([rmap.get(nmap.get(k)) for k in keys], pa.string()),
                "bal_c": pa.array(_cents(t["s_acctbal"].to_numpy()), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["r_name"]).aggregate([("bal_c", "sum"), ([], "count_all")])
        return _picked(g, r_name="r_name", n_suppliers="count_all", sum_bal_c="bal_c_sum")

    return (
        supp.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("n_suppliers", alias_name="n_suppliers"), Sum("sum_bal_c", alias_name="sum_bal_c"))
    )


def supplier_nation_rollup_sql() -> str:
    return """
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_c
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """


def docs_by_lang(sf_dir: str):
    """Document counts + char sums per (lang, source) — partial-aggregate
    pattern on the documents table."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["lang", "source", "n_chars"]), ["lang", "source"]
        ).aggregate([("n_chars", "sum"), ([], "count_all")])
        return _picked(
            g, lang="lang", source="source", n_docs="count_all", sum_chars="n_chars_sum"
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
    )


def docs_by_lang_sql() -> str:
    return """
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang, source
    """


def part_brand_stats(sf_dir: str):
    """Per-brand part stats: counts, size extrema, retail cents."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand", "p_size", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "p_brand": t["p_brand"],
                "p_size": t["p_size"],
                "price_c": pa.array(_cents(t["p_retailprice"].to_numpy()), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["p_brand"]).aggregate(
            [("p_size", "min"), ("p_size", "max"), ("price_c", "sum"), ([], "count_all")]
        )
        return _picked(
            g,
            p_brand="p_brand",
            n_parts="count_all",
            min_size="p_size_min",
            max_size="p_size_max",
            sum_price_c="price_c_sum",
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n_parts", alias_name="n_parts"),
            Min("min_size", alias_name="min_size"),
            Max("max_size", alias_name="max_size"),
            Sum("sum_price_c", alias_name="sum_price_c"),
        )
    )


def part_brand_stats_sql() -> str:
    return """
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(MIN(p_size) AS BIGINT) AS min_size,
               CAST(MAX(p_size) AS BIGINT) AS max_size,
               CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
        FROM part GROUP BY p_brand
    """


def orders_monthly(sf_dir: str):
    """Orders per (status, month) with total cents — window-by-time rollup."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        month = pc.divide(
            pc.cast(
                pc.floor_temporal(
                    pc.cast(t["o_orderdate"], pa.timestamp("ns")), unit="month"
                ),
                pa.int64(),
            ),
            10**9,
        )
        t2 = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "month_epoch": month,
                "price_c": pa.array(_cents(t["o_totalprice"].to_numpy()), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["o_orderstatus", "month_epoch"]).aggregate(
            [("price_c", "sum"), ([], "count_all")]
        )
        return _picked(
            g,
            o_orderstatus="o_orderstatus",
            month_epoch="month_epoch",
            n="count_all",
            total_c="price_c_sum",
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "month_epoch"])
        .aggregate(Sum("n", alias_name="n"), Sum("total_c", alias_name="total_c"))
    )


def orders_monthly_sql() -> str:
    return """
        SELECT o_orderstatus,
               CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
        FROM orders GROUP BY o_orderstatus, date_trunc('month', o_orderdate)
    """


def events_sessionize(sf_dir: str, gap_seconds: int = 1800):
    """Session windows per user (streaming-shaped stateful operator): a new
    session starts when the gap from the previous event exceeds
    ``gap_seconds``.  One shuffle by user_id; sessionization is a sorted
    scan inside each group.  Output: (user_id, session_start_us, n_events,
    sum_value_c) — exactly reproducible in SQL with lag + running sum."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # group-union-safe over disjoint user sets: sorting puts each
        # user's events contiguous and a user change always starts a new
        # session, so one vectorized pass over a multi-user bucket equals
        # the per-user result (whole_bucket fan-out; also valid per group)
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        t_us = g["ts"].astype("datetime64[us]").astype("int64")
        new_s = (t_us.diff() > gap_seconds * 1_000_000) | g["user_id"].ne(
            g["user_id"].shift()
        )
        sid = new_s.cumsum()
        g = g.assign(t_us=t_us, sid=sid, value_c=_cents(g["value"]))
        out = g.groupby("sid", as_index=False).agg(
            user_id=("user_id", "first"),
            session_start_us=("t_us", "min"),
            n_events=("t_us", "size"),
            sum_value_c=("value_c", "sum"),
        )
        return out[["user_id", "session_start_us", "n_events", "sum_value_c"]]

    return stages.gated_groupby(
        ds, ds, "user_id", sessions, batch_format="pandas", whole_bucket="events_sessionize"
    )


def events_sessionize_sql(gap_seconds: int = 1800) -> str:
    return f"""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS t_us,
                 CAST(round(value * 100) AS BIGINT) AS value_c,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_seconds} * 1000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, t_us, value_c,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM e
        )
        SELECT user_id, CAST(MIN(t_us) AS BIGINT) AS session_start_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(value_c) AS BIGINT) AS sum_value_c
        FROM s GROUP BY user_id, sid
    """


def top_parts_per_brand(sf_dir: str, k: int = 3):
    """Windowed rank operator: top-k parts by retail price per brand
    (row_number analogue via per-group sort inside map_groups)."""
    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_partkey", "p_retailprice"]
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(price_c=_cents(g["p_retailprice"]))
        g = g.sort_values(["price_c", "p_partkey"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1)
        return g[["p_brand", "p_partkey", "price_c", "rnk"]]

    return stages.gated_groupby(ds, ds, "p_brand", topk, batch_format="pandas")


def top_parts_per_brand_sql(k: int = 3) -> str:
    return f"""
        SELECT p_brand, p_partkey,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY CAST(round(p_retailprice * 100) AS BIGINT) DESC, p_partkey
                 ) AS rnk
          FROM part
        ) WHERE rnk <= {k}
    """

def events_asof_join(sf_dir: str):
    """AS-OF join expressed Ray-Data-first: for every 'error' event, the
    most recent 'click' event of the same user strictly earlier in the
    deterministic (ts, event_id) order.  One shuffle by user_id; inside
    each group a sorted scan forward-fills the last click — the
    composition-of-map_groups form of an as-of join (no Dataset.join).
    Errors with no prior click are dropped (keeps the output
    NULL-free for exact value-hash comparison).  Output:
    (event_id, user_id, error_t_us, click_event_id, click_t_us, gap_us).
    """
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    ).filter(expr="event_type == 'click' or event_type == 'error'")

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # group-union-safe over disjoint user sets (whole_bucket fan-out):
        # sort puts each user's events contiguous; the shift is masked at
        # user boundaries and the forward-fill is group-bounded, so the
        # last click never leaks across users
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        t_us = g["ts"].astype("datetime64[us]").astype("int64")
        is_click = (g["event_type"] == "click").to_numpy()
        click_id = pd.Series(np.where(is_click, g["event_id"], np.nan)).shift(1)
        click_t = pd.Series(np.where(is_click, t_us, np.nan)).shift(1)
        new_user = g["user_id"].ne(g["user_id"].shift()).to_numpy()
        click_id[new_user] = np.nan
        click_t[new_user] = np.nan
        uid = g["user_id"].to_numpy()
        click_id = click_id.groupby(uid).ffill()
        click_t = click_t.groupby(uid).ffill()
        err = (g["event_type"] == "error").to_numpy() & click_id.notna().to_numpy()
        out = pd.DataFrame(
            {
                "event_id": g.loc[err, "event_id"].to_numpy(),
                "user_id": g.loc[err, "user_id"].to_numpy(),
                "error_t_us": t_us[err].to_numpy(),
                "click_event_id": click_id[err].astype("int64").to_numpy(),
                "click_t_us": click_t[err].astype("int64").to_numpy(),
            }
        )
        out["gap_us"] = out["error_t_us"] - out["click_t_us"]
        return out

    return stages.gated_groupby(
        ds, ds, "user_id", asof, batch_format="pandas", whole_bucket="events_asof_join"
    )


def events_asof_join_sql() -> str:
    return """
        WITH u AS (
          SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type,
                 CASE WHEN event_type = 'click' THEN event_id END AS cid,
                 CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS ct
          FROM events WHERE event_type IN ('click', 'error')
        ), f AS (
          SELECT event_id, user_id, t_us, event_type,
                 last_value(cid IGNORE NULLS) OVER w AS click_event_id,
                 last_value(ct IGNORE NULLS) OVER w AS click_t_us
          FROM u
          WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, CAST(t_us AS BIGINT) AS error_t_us,
               CAST(click_event_id AS BIGINT) AS click_event_id,
               CAST(click_t_us AS BIGINT) AS click_t_us,
               CAST(t_us - click_t_us AS BIGINT) AS gap_us
        FROM f WHERE event_type = 'error' AND click_event_id IS NOT NULL
    """


def events_window_stats(sf_dir: str, window_seconds: int = 600):
    """Sliding-window aggregate (RANGE frame): for every event, the count
    and value-cents sum of the SAME USER's events in the trailing
    ``window_seconds`` — peers at the exact same timestamp are all
    included (SQL RANGE semantics), which keeps ties deterministic.  One
    shuffle by user_id; inside each group two vectorized searchsorted
    bounds against the sorted timestamp array + a prefix-sum difference.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    w_us = window_seconds * 1_000_000

    def win(g: pd.DataFrame) -> pd.DataFrame:
        # group-union-safe over disjoint user sets (whole_bucket fan-out):
        # after the (user, ts) sort each user occupies one contiguous
        # segment; searchsorted runs on a composite key seg_id*span + t0
        # whose per-segment bands are w_us apart, so a window can never
        # cross a user boundary.  span fits int64 comfortably for any
        # driver-bounded bucket; the per-segment loop is the (equally
        # correct) guard for pathological spans.
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = _cents(g["value"])
        csum = np.concatenate([[0], np.cumsum(v)])
        uid = g["user_id"].to_numpy()
        new_seg = np.concatenate([[True], uid[1:] != uid[:-1]]) if len(uid) else np.empty(0, bool)
        seg_id = np.cumsum(new_seg) - 1 if len(uid) else np.empty(0, np.int64)
        n_seg = int(seg_id[-1]) + 1 if len(uid) else 0
        t0 = t - t.min() if len(t) else t
        span = (int(t0.max()) if len(t0) else 0) + w_us + 2
        if n_seg * span < (1 << 62):
            key = seg_id.astype(np.int64) * span + t0
            hi = np.searchsorted(key, key, side="right")
            lo = np.searchsorted(key, key - w_us, side="left")
        else:
            starts = np.flatnonzero(new_seg)
            ends = np.concatenate([starts[1:], [len(t)]])
            hi = np.empty(len(t), np.int64)
            lo = np.empty(len(t), np.int64)
            for s, e in zip(starts.tolist(), ends.tolist()):
                hi[s:e] = s + np.searchsorted(t[s:e], t[s:e], side="right")
                lo[s:e] = s + np.searchsorted(t[s:e], t[s:e] - w_us, side="left")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "t_us": t,
                "n_window": (hi - lo).astype(np.int64),
                "sum_window_c": (csum[hi] - csum[lo]).astype(np.int64),
            }
        )

    return stages.gated_groupby(
        ds, ds, "user_id", win, batch_format="pandas", whole_bucket="events_window_stats"
    )


def events_window_stats_sql(window_seconds: int = 600) -> str:
    return f"""
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                 AS sum_window_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {window_seconds} * 1000000 PRECEDING
                           AND CURRENT ROW)
    """


def orders_price_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (DuckDB quantile_disc rule:
    sorted[ceil(q*n) - 1]) of order total price in cents, by order
    status.  Partial per batch would change the answer (quantiles don't
    combine), so the group is shuffled whole — the scale path is a
    t-digest/KLL sketch, declared here as the approximate variant."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(_cents(g["o_totalprice"]))
        n = len(c)

        def q(p: float) -> int:
            return int(c[max(int(np.ceil(p * n)) - 1, 0)])

        return pd.DataFrame(
            {
                "o_orderstatus": [g["o_orderstatus"].iloc[0]],
                "n": [np.int64(n)],
                "q25_c": [q(0.25)],
                "q50_c": [q(0.50)],
                "q75_c": [q(0.75)],
                "q90_c": [q(0.90)],
            }
        )

    return stages.gated_groupby(ds, ds, "o_orderstatus", quant, batch_format="pandas")


def orders_price_quantiles_sql() -> str:
    return """
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) AS q25_c,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.50) AS q50_c,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) AS q75_c,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.90) AS q90_c
        FROM orders GROUP BY o_orderstatus
    """


def latest_event_per_user(sf_dir: str):
    """Distributed argmax: each user's most recent event (ties on ts break
    to the smallest event_id).  Per-batch partial argmax first, then one
    small shuffle over <= users x blocks candidate rows — the full event
    payload never moves."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type", "value"]
    )

    def best_rows(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        t_us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        # sort (user asc, ts desc, event_id asc): first row per user wins
        order = np.lexsort((eid, -t_us, uid))
        u_s = uid[order]
        first = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        sel = order[first]
        t = t.take(pa.array(sel, pa.int64()))
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "t_us": pa.array(t_us[sel], pa.int64()),
                "neg_event_id": pa.array(-eid[sel], pa.int64()),
                "event_type": t["event_type"].cast(pa.string()).combine_chunks(),
                "value_c": pa.array(_cents(t["value"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )

    partials = ds.map_batches(best_rows, batch_format="pyarrow")

    def reduce_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t_us", "neg_event_id"], ascending=[True, False, False])
        out = g.drop_duplicates("user_id", keep="first").copy()
        out["event_id"] = -out["neg_event_id"]
        return out[["user_id", "t_us", "event_id", "event_type", "value_c"]]

    # users are bucketed (~4k per group), not grouped one-by-one
    from .dedup import _n_buckets_for

    nb = _n_buckets_for(rd.read_parquet(f"{sf_dir}/events.parquet").count())

    def add_bkt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("ub", pa.array(u % nb, pa.int64()))

    return (
        partials.map_batches(add_bkt, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(
            lambda g: reduce_best(g.drop(columns=["ub"])), batch_format="pandas"
        )
        .sort("user_id")
    )


def latest_event_per_user_sql() -> str:
    return """
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT) AS t_us,
               event_id,
               event_type,
               CAST(round(value * 100) AS BIGINT) AS value_c
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id) AS rn
              FROM events)
        WHERE rn = 1
        ORDER BY user_id
    """


def events_funnel(sf_dir: str):
    """Ordered funnel signup -> click -> purchase per user, reported per
    signup day: of the users whose first signup fell on that day, how many
    later clicked and then purchased (strictly increasing timestamps).
    One shuffle: events of the three types bucket by user hash; the chain
    min-computations inside a bucket are reduceat-vectorized."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    from .dedup import _n_buckets_for

    nb = _n_buckets_for(rd.read_parquet(f"{sf_dir}/events.parquet").count())
    STEPS = ("signup", "click", "purchase")

    def route(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        step = np.full(len(et), -1, np.int64)
        for i, s in enumerate(STEPS):
            step[et == s] = i
        keep = np.flatnonzero(step >= 0)
        u = t["user_id"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        t_us = (
            t["ts"].to_numpy(zero_copy_only=False)[keep].astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "ub": pa.array(u % nb, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "step": pa.array(step[keep], pa.int64()),
                "t_us": pa.array(t_us, pa.int64()),
            }
        )

    BIG = np.int64(2**62)

    def funnel_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy()
        step = g["step"].to_numpy()
        t = g["t_us"].to_numpy()
        users, inv = np.unique(u, return_inverse=True)
        m = len(users)

        def chain_min(level: int, after: np.ndarray) -> np.ndarray:
            """min t over rows of `level` with t > after[user]; +BIG if none."""
            mask = step == level
            tt = np.where(mask & (t > after[inv]), t, BIG)
            order = np.argsort(inv, kind="stable")
            tt_s = tt[order]
            inv_s = inv[order]
            starts = np.flatnonzero(np.r_[True, inv_s[1:] != inv_s[:-1]])
            mins = np.minimum.reduceat(tt_s, starts) if len(tt_s) else np.empty(0, np.int64)
            out = np.full(m, BIG, np.int64)
            out[inv_s[starts]] = mins
            return out

        t1 = chain_min(0, np.full(m, -BIG, np.int64))
        t2 = chain_min(1, t1)
        t3 = chain_min(2, t2)
        sign = np.flatnonzero(t1 < BIG)
        day = t1[sign] // 86_400_000_000
        done = (t3[sign] < BIG).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "n_signups": pa.array(np.ones(len(sign), np.int64), pa.int64()),
                "n_completed": pa.array(done, pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(funnel_bucket, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_signups", alias_name="n_signups"), Sum("n_completed", alias_name="n_completed"))
        .sort("day")
    )


def events_funnel_sql() -> str:
    return """
        WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                   WHERE event_type = 'signup' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
              JOIN s ON e.user_id = s.user_id AND epoch_us(e.ts) > s.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
              JOIN c ON e.user_id = c.user_id AND epoch_us(e.ts) > c.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT s.t1 // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS n_signups,
               CAST(COUNT(p.user_id) AS BIGINT) AS n_completed
        FROM s LEFT JOIN p ON s.user_id = p.user_id
        GROUP BY day
        ORDER BY day
    """
