"""Relational pipelines over the TPC-H-ish testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose
columns are named EXACTLY like the matching oracle SQL in
``__ray_entry__.oracle_sql`` (the driver's compare is by column name +
value hash). Float aggregates are rounded on BOTH sides so summation
order (Ray partial aggregation vs DuckDB sequential) cannot flip the
hash.

Scale patterns demonstrated:
- column pruning at the read (`columns=[...]`),
- partial (combiner-style) aggregation inside map_batches before the
  groupby shuffle (SURVEY.md guide: pre-aggregate, then a small
  groupby),
- broadcast hash joins for small dimension tables (ray.put once,
  lookup per batch) instead of an all-to-all shuffle join.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ------------------------------------------------------------------ Q1-style
def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/avgs/counts with
    partial per-batch aggregation before the (tiny) final groupby."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount",
         "l_shipdate"],
    )

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"))

    def partial(batch: pa.Table) -> pa.Table:
        """Money in exact integer cents (floor(x*100+0.5) per row):
        order-independent and bit-identical to the SQL oracle — a
        float sum's value depends on summation order, which differs
        between Ray partial aggregation and DuckDB."""
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        df = batch.to_pandas()
        qty = df["l_quantity"].to_numpy()
        base_c = np.floor(df["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        disc_c = np.floor(
            df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy()) * 100.0 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": qty.astype(np.int64),
                "sum_base_price_c": base_c,
                "sum_disc_price_c": disc_c,
                "count_order": 1,
            }
        ).groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
    from ray.data.aggregate import Sum

    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price_c", alias_name="sum_base_price_c"),
            Sum("sum_disc_price_c", alias_name="sum_disc_price_c"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty_e4"] = out["sum_qty"] * 10_000 // out["count_order"]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ------------------------------------------------- broadcast-join + top-k
def q3_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """Revenue top-10 for one customer segment: broadcast the qualifying
    order-key set (small side) into the lineitem scan — a semi-join via
    ray.put instead of an all-to-all shuffle join."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    ok = orders[orders["o_custkey"].isin(seg_keys)]
    okey_ref = ray.put(set(ok["o_orderkey"]))

    def revenue_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(okey_ref)
        df = batch.to_pandas()
        df = df[df["l_orderkey"].isin(keys)]
        df["rev_c"] = np.floor(
            df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy()) * 100.0 + 0.5
        ).astype(np.int64)
        g = df.groupby("l_orderkey", as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    partials = ds.map_batches(revenue_partial, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
    from ray.data.aggregate import Sum

    total = partials.groupby("l_orderkey").aggregate(Sum("rev_c", alias_name="revenue_c")).to_pandas()
    out = total.sort_values(["revenue_c", "l_orderkey"], ascending=[False, True]).head(10)
    return out[["l_orderkey", "revenue_c"]].reset_index(drop=True)


# --------------------------------------------------------- events pipelines
def events_by_type(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def to_milli(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "value_mil": pa.array(v)})

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(to_milli, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
        .groupby("event_type")
        .aggregate(Count(alias_name="n_events"), Sum("value_mil", alias_name="total_value_mil"))
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def events_windowed(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """Tumbling 1-hour window per user (Ray Data has no event-time
    windows; the window key is computed vectorized and aggregated by
    key). Key cardinality ≈ row count here, so a combiner buys
    nothing; instead keys are hashed into ``n_buckets`` coarse
    partitions (ONE bounded-group shuffle) and each bucket aggregates
    vectorized in pandas — measured 10x faster than
    groupby([user,win]).aggregate() at 10^5 rows. Scale ``n_buckets``
    with the cluster (a few per core) at larger inputs."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch["ts"], pa.int64())  # microseconds
        win = pc.divide(epoch, pa.scalar(3_600_000_000, pa.int64()))
        v = np.floor(batch["value"].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        bucket = pc.bit_wise_and(
            pc.bit_wise_xor(pc.cast(batch["user_id"], pa.int64()), win),
            pa.scalar(n_buckets - 1, pa.int64()),
        )
        return pa.table(
            {"user_id": batch["user_id"], "win": win,
             "value_mil": pa.array(v), "bucket": bucket}
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "win"], as_index=False).agg(
            n=("value_mil", "size"), v_mil=("value_mil", "sum")
        )

    out = (
        ds.map_batches(add_window, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
        .groupby("bucket")
        .map_groups(agg, batch_format="pandas", runtime_env=_RENV)
        .to_pandas()
    )
    return out.sort_values(["user_id", "win"]).reset_index(drop=True)


# ------------------------------------------------- dimension chain join
def customers_per_region(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation ⋈ region via broadcast dict lookups (all
    dimension tables tiny) — no shuffle at any size of customer."""
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put((n2r, r2name))

    def partial(batch: pa.Table) -> pa.Table:
        n2r_, r2name_ = ray.get(lookup_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        names = [r2name_[n2r_[int(k)]] for k in nk]
        df = pd.DataFrame({"r_name": names})
        g = df.groupby("r_name", as_index=False).size().rename(columns={"size": "n_customers"})
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read(sf_dir, "customer", ["c_nationkey"])
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
        .groupby("r_name")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
    )
    return out.sort_values("r_name").reset_index(drop=True)


def filter_project_lineitem(sf_dir: str) -> rd.Dataset:
    """Vectorized filter + projection (no aggregation): discount band +
    quantity cap, integer/string columns only (hash-robust)."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(batch["l_discount"], 0.05),
                    pc.less_equal(batch["l_discount"], 0.07)),
            pc.less(batch["l_quantity"], 24.0),
        )
        t = batch.filter(m)
        return t.select(["l_orderkey", "l_linenumber", "l_returnflag"])

    return ds.map_batches(f, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
