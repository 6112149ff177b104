"""Bucketed reduce-side joins (rogray/joins.py): the generic
inner/semi/anti bucket_join semantics on hand-built inputs, plus the four
TPC-H-shaped pipelines (Q3/Q4/Q10/anti) and the two event-analytics
operators against their DuckDB oracles at sf0.001 — the driver's own
row-count + sorted-column value-hash rule."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("events", "orders", "lineitem", "customer", "nation")


def _oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    return sorted(tuple(map(str, r)) for r in df.itertuples(index=False))


def _assert_matches_oracle(ds, sql):
    got = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    want = _oracle_con().execute(sql).df()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _norm(got) == _norm(want)


class TestBucketJoinSemantics:
    def _sides(self):
        import ray.data as rd

        left = rd.from_arrow(
            pa.table({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
        )
        right = rd.from_arrow(pa.table({"rk": [2, 2, 3, 4], "rv": [10, 20, 30, 40]}))
        return left, right

    def test_inner_fans_out_duplicates(self, ray_session):
        from rogray.joins import bucket_join

        left, right = self._sides()
        out = bucket_join(
            left, right, "k", "rk", [("lv", pa.string())], [("rv", pa.int64())],
            n_buckets=3, how="inner",
        ).to_pandas()
        got = sorted(map(tuple, out[["jk", "lv", "rv"]].itertuples(index=False)))
        # k=2 matches two right rows for EACH of the two left rows (2x2)
        assert got == [
            (2, "b", 10), (2, "b", 20), (2, "c", 10), (2, "c", 20), (3, "d", 30),
        ]

    def test_semi_and_anti_partition_left(self, ray_session):
        from rogray.joins import bucket_join

        left, right = self._sides()
        semi = bucket_join(
            left, right, "k", "rk", [("lv", pa.string())], [],
            n_buckets=3, how="semi",
        ).to_pandas()
        anti = bucket_join(
            left, right, "k", "rk", [("lv", pa.string())], [],
            n_buckets=3, how="anti",
        ).to_pandas()
        assert sorted(semi["lv"]) == ["b", "c", "d"]
        assert sorted(anti["lv"]) == ["a", "e"]
        assert len(semi) + len(anti) == 5

    def test_bucket_count_invariance(self, ray_session):
        from rogray.joins import bucket_join

        left, right = self._sides()
        outs = [
            sorted(
                map(
                    tuple,
                    bucket_join(
                        left, right, "k", "rk",
                        [("lv", pa.string())], [("rv", pa.int64())],
                        n_buckets=nb, how="inner",
                    )
                    .to_pandas()
                    .itertuples(index=False),
                )
            )
            for nb in (1, 7)
        ]
        assert outs[0] == outs[1]


class TestJoinPipelines:
    def test_shipping_priority(self, ray_session):
        from rogray import joins

        _assert_matches_oracle(joins.shipping_priority(SF), joins.shipping_priority_sql())

    def test_order_priority_counts(self, ray_session):
        from rogray import joins

        _assert_matches_oracle(
            joins.order_priority_counts(SF), joins.order_priority_counts_sql()
        )

    def test_returned_items(self, ray_session):
        from rogray import joins

        _assert_matches_oracle(joins.returned_items(SF), joins.returned_items_sql())

    def test_customers_without_orders(self, ray_session):
        from rogray import joins

        out = joins.customers_without_orders(SF).to_pandas()
        assert len(out) > 0  # non-degenerate at sf0.001 (6 lapsed customers)
        _assert_matches_oracle(out, joins.customers_without_orders_sql())


class TestEventAnalytics:
    def test_latest_event_per_user(self, ray_session):
        from rogray import relational

        out = relational.latest_event_per_user(SF).to_pandas()
        _assert_matches_oracle(out, relational.latest_event_per_user_sql())
        # argmax semantics: one row per user, at that user's max ts
        assert out["user_id"].is_unique

    def test_events_funnel(self, ray_session):
        from rogray import relational

        out = relational.events_funnel(SF).to_pandas()
        _assert_matches_oracle(out, relational.events_funnel_sql())
        assert (out["n_completed"] <= out["n_signups"]).all()
