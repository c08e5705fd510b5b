"""Relational pipelines over the driver's TPC-H-ish tables — the generic
query capabilities (groupby/aggregate, broadcast + hash joins, sort/top-k,
windowed aggregation) expressed Ray-Data-first.

Exactness discipline for oracle comparison: money/double aggregates are
summed as integer cents/millis (``round(x * 100)`` per row — identical
single IEEE multiply+round on both Ray and DuckDB sides, then exact integer
sums), and averages are one division of two exact aggregates. This makes
every result bit-identical to the DuckDB oracle regardless of summation
order.

Shuffle discipline: every groupby is preceded by a per-batch partial
aggregate (map-side combine), so the shuffle moves one row per key per
batch, not the raw table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def _cents(x: pd.Series) -> pd.Series:
    # floor(x*100 + 0.5): identical on the DuckDB side — avoids the
    # banker's-rounding (numpy) vs half-away (DuckDB) divergence
    return np.floor(x * 100 + 0.5).astype("int64")


# ---------------------------------------------------------------------------
# Q1-style pricing summary: groupby two keys, exact sums + avg
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            qty=b["l_quantity"].astype("int64"),
            base_cents=_cents(b["l_extendedprice"]),
            disc_cents=np.floor(b["l_extendedprice"] * (1 - b["l_discount"])
                                * 100 + 0.5).astype("int64"),
            n=1,
        )
        return (b.groupby(["l_returnflag", "l_linestatus"], as_index=False)
                 .agg(sum_qty=("qty", "sum"),
                      sum_base_cents=("base_cents", "sum"),
                      sum_disc_cents=("disc_cents", "sum"),
                      count_order=("n", "sum")))

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = (partials.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_cents", alias_name="sum_base_cents"),
                      Sum("sum_disc_cents", alias_name="sum_disc_cents"),
                      Sum("count_order", alias_name="count_order"))
           .to_pandas())
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Broadcast join chain: customer ⋈ nation ⋈ region → per-region stats
# ---------------------------------------------------------------------------

def region_customer_stats(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    n2r = dict(zip(dim["n_nationkey"], dim["r_name"]))
    ref = ray.put(n2r)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        b = b.assign(r_name=b["c_nationkey"].map(lookup),
                     acctbal_cents=_cents(b["c_acctbal"]), n=1)
        return (b.groupby("r_name", as_index=False)
                 .agg(num_customers=("n", "sum"),
                      sum_acctbal_cents=("acctbal_cents", "sum")))

    out = (cust.map_batches(partial, batch_format="pandas", batch_size=65536)
           .groupby("r_name")
           .aggregate(Sum("num_customers", alias_name="num_customers"),
                      Sum("sum_acctbal_cents", alias_name="sum_acctbal_cents"))
           .to_pandas())
    return out.sort_values("r_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Large-large hash join + top-k: revenue per order joined to orders
# ---------------------------------------------------------------------------

def top_orders_by_revenue(sf_dir: str, k: int = 10) -> pd.DataFrame:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(rev_cents=np.floor(b["l_extendedprice"] * (1 - b["l_discount"])
                                        * 100 + 0.5).astype("int64"))
        return (b.groupby("l_orderkey", as_index=False)
                 .agg(revenue_cents=("rev_cents", "sum")))

    rev = (li.map_batches(partial, batch_format="pandas", batch_size=65536)
           .groupby("l_orderkey")
           .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))

    # per-order top-k first (partial top-k per batch, tiny final merge),
    # then a broadcast join of only the k winners against orders
    partial_top = rev.map_batches(
        lambda b: b.nlargest(k, columns=["revenue_cents"]).sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True]),
        batch_format="pandas").to_pandas()
    top = partial_top.sort_values(["revenue_cents", "l_orderkey"],
                                  ascending=[False, True]).head(k)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    keys = set(top["l_orderkey"])
    hits = orders.map_batches(
        lambda b: b[b["o_orderkey"].isin(keys)], batch_format="pandas"
    ).to_pandas()
    out = top.merge(hits, left_on="l_orderkey", right_on="o_orderkey")
    out = out[["o_orderkey", "revenue_cents", "o_custkey", "o_orderstatus"]]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Windowed aggregate: tumbling 1-hour windows per event_type
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> pd.DataFrame:
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        millis = pc.floor(pc.add(pc.multiply(b.column("value"), 1000.0), 0.5)).cast(pa.int64())
        t = pa.table({"hour": hour, "event_type": b.column("event_type"),
                      "value_millis": millis})
        df = t.to_pandas()
        g = (df.assign(n=1)
             .groupby(["event_type", "hour"], as_index=False)
             .agg(n_events=("n", "sum"),
                  sum_value_millis=("value_millis", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby(["event_type", "hour"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value_millis", alias_name="sum_value_millis"))
           .to_pandas())
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Session windows per user (streaming-shaped: sorted map_groups)
# ---------------------------------------------------------------------------

def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session count + max session length per user: partition by user_id,
    sort by ts within the group, split on gaps > gap_minutes."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        if len(ts) == 0:
            return pd.DataFrame({"user_id": [], "n_sessions": [], "max_session_events": []})
        breaks = np.diff(ts) > gap
        n_sessions = int(breaks.sum()) + 1
        sizes = np.diff(np.concatenate([[0], np.where(breaks)[0] + 1, [len(ts)]]))
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n_sessions],
                             "max_session_events": [int(sizes.max())]})

    out = ev.groupby("user_id").map_groups(sess, batch_format="pandas").to_pandas()
    out = out.astype({"user_id": "int64", "n_sessions": "int64",
                      "max_session_events": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# supplier/part scan + filter + aggregate
# ---------------------------------------------------------------------------

def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    part = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(price_cents=_cents(b["p_retailprice"]), n=1)
        return (b.groupby("p_brand", as_index=False)
                 .agg(n_parts=("n", "sum"),
                      sum_price_cents=("price_cents", "sum"),
                      max_size=("p_size", "max")))

    out = (part.map_batches(partial, batch_format="pandas")
           .groupby("p_brand")
           .aggregate(Sum("n_parts", alias_name="n_parts"),
                      Sum("sum_price_cents", alias_name="sum_price_cents"),
                      Max("max_size", alias_name="max_size"))
           .to_pandas())
    return out.sort_values("p_brand").reset_index(drop=True)
