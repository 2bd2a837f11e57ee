"""Relational operators over the TPC-H-ish fixture tables — the
grouped-aggregate / shuffle-join / filtered-scan patterns a
training-data pipeline needs when its metadata lives in relational
side tables (beyond the reference's scope; the reference has no joins
at all — its only "join" is the linear index scan in
``duplicate_face.py:64-75``).

Monetary measures are summed as CENT-EXACT int64 (``round(x·100)`` per
row, integer sum) so results hash-match the DuckDB twins bit-for-bit:
summing 60k+ doubles in different orders drifts ~1e-3 at TPC-H price
magnitudes, which no output rounding can reliably hide.

Patterns:

* filtered scan    → pyarrow filter expression pushed into
                     ``read_parquet`` (row groups pruned at the read)
* grouped agg      → partial per-block reduce, one small key shuffle
* shuffle join     → both sides hash-partitioned on the key
                     (``keyed_blocks`` over the union), one vectorized
                     in-block pandas merge — the scale path when
                     neither side fits in a broadcast
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

import numpy as np
import pandas as pd

from raydedup.ray_utils import default_partitions, ensure_hash_shuffle, keyed_blocks


def _P() -> int:
    """Hash partitions for the sf-scale query surface — resolved at call
    time from the live Ray session (~1/CPU, floor 8, cap 256; see
    ray_utils.default_partitions).  Partition-count invariance is pinned
    by the determinism tests and DuckDB twins."""
    return default_partitions()


def _cents(x: pd.Series) -> np.ndarray:
    return np.round(x.to_numpy(np.float64) * 100.0).astype(np.int64)


def pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary over ``lineitem`` →
    (l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_cents, n_rows).

    ``sum_disc_cents`` = Σ ⌊round(price·100) · (100 − round(disc·100)) / 100⌋
    — all int64 math with an explicit floor divide, mirrored by DuckDB's
    integer ``//`` on the same operands (both positive, so floor agrees).
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pc = _cents(df["l_extendedprice"])
        disc_pct = np.round(df["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].to_numpy(dtype=object),
                "l_linestatus": df["l_linestatus"].to_numpy(dtype=object),
                "qty": np.round(df["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "base": pc,
                "disc": pc * (100 - disc_pct) // 100,
            }
        )
        g = (
            out.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("qty", "sum"), sum_base_cents=("base", "sum"),
                 sum_disc_cents=("disc", "sum"), n_rows=("qty", "size"))
            .reset_index()
        )
        return g.astype({"sum_qty": np.int64, "sum_base_cents": np.int64,
                         "sum_disc_cents": np.int64, "n_rows": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "l_returnflag": pd.Series([], dtype=object),
                    "l_linestatus": pd.Series([], dtype=object),
                    "sum_qty": pd.Series([], dtype=np.int64),
                    "sum_base_cents": pd.Series([], dtype=np.int64),
                    "sum_disc_cents": pd.Series([], dtype=np.int64),
                    "n_rows": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("sum_qty", "sum"), sum_base_cents=("sum_base_cents", "sum"),
                 sum_disc_cents=("sum_disc_cents", "sum"), n_rows=("n_rows", "sum"))
            .reset_index()
        )
        return g.astype({"sum_qty": np.int64, "sum_base_cents": np.int64,
                         "sum_disc_cents": np.int64, "n_rows": np.int64})

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["l_returnflag", "l_linestatus"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def segment_revenue(sf_dir: str):
    """Shuffle join + rollup: order count and cent-exact revenue per
    customer market segment → (c_mktsegment, n_orders, revenue_cents).

    Both sides are hash-partitioned on ``custkey`` (the same
    ``keyed_blocks`` primitive the dedup shuffles use) over a tagged
    union, then joined with one vectorized in-block merge — the
    co-shuffle join for when neither side fits in a broadcast.  The
    joined rows pre-reduce per block to (segment, partials) before one
    tiny final shuffle.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["c_custkey"].to_numpy(np.int64),
                "seg": df["c_mktsegment"].to_numpy(dtype=object),
                "price_cents": np.zeros(len(df), dtype=np.int64),
                "is_order": np.zeros(len(df), dtype=np.int64),
            }
        )

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["o_custkey"].to_numpy(np.int64),
                "seg": np.full(len(df), "", dtype=object),
                "price_cents": _cents(df["o_totalprice"]),
                "is_order": np.ones(len(df), dtype=np.int64),
            }
        )

    def join_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "seg": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        dim = df[df["is_order"] == 0][["custkey", "seg"]]
        fact = df[df["is_order"] == 1][["custkey", "price_cents"]]
        j = fact.merge(dim, on="custkey", how="inner")
        g = (
            j.groupby("seg", sort=False)
            .agg(n_orders=("price_cents", "size"), revenue_cents=("price_cents", "sum"))
            .reset_index()
        )
        return g.astype({"n_orders": np.int64, "revenue_cents": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "c_mktsegment": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby("seg", sort=False)
            .agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
            .reset_index()
            .rename(columns={"seg": "c_mktsegment"})
        )
        return g.astype({"n_orders": np.int64, "revenue_cents": np.int64})

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pandas")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(order_rows, batch_format="pandas")
    joined = keyed_blocks(cust.union(orders), ["custkey"], _P()).map_batches(
        join_reduce, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(joined, ["seg"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def priority_counts(sf_dir: str, year: int = 1996):
    """Filtered scan + count: orders per priority within one year →
    (o_orderpriority, n_orders).

    The year predicate is a pyarrow dataset expression passed to
    ``read_parquet`` — evaluated against parquet row-group statistics,
    so non-matching row groups never leave storage (prune at the read).
    """
    import datetime

    import pyarrow.dataset as pads
    import ray.data as rd

    ensure_hash_shuffle()
    lo = datetime.datetime(year, 1, 1)
    hi = datetime.datetime(year + 1, 1, 1)
    flt = (pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", sort=False).size().rename("n_orders").reset_index()
        return g.astype({"n_orders": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby("o_orderpriority", sort=False)
            .agg(n_orders=("n_orders", "sum"))
            .reset_index()
        )
        return g.astype({"n_orders": np.int64})

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate"],
        filter=flt,
    ).map_batches(partial, batch_format="pandas")
    return keyed_blocks(ds, ["o_orderpriority"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def customer_order_distribution(sf_dir: str):
    """TPC-H-Q13-style left-outer join + distribution: how many
    customers placed exactly N orders, INCLUDING zero-order customers →
    (n_orders, n_custs).

    The left-outer semantics come from the co-shuffle union itself:
    every customer key is present on the dim side, so customers with no
    matching order rows surface with count 0 in the in-block reduce —
    no driver-side key set, no broadcast.  Orders pre-reduce per block
    to (custkey, partial-count) first, so the join shuffle carries one
    row per (block, customer), not one per order.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def order_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame({"custkey": df["o_custkey"].to_numpy(np.int64)})
            .groupby("custkey", sort=False).size().rename("n").reset_index()
        )
        g["is_cust"] = np.int8(0)
        return g.astype({"n": np.int64})

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"custkey": df["c_custkey"].to_numpy(np.int64),
                             "n": np.zeros(len(df), dtype=np.int64),
                             "is_cust": np.ones(len(df), dtype=np.int8)})

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_orders": pd.Series([], dtype=np.int64),
                                 "n_custs": pd.Series([], dtype=np.int64)})
        # keep only customers that exist in the dim side (orders of
        # unknown customers — impossible in TPC-H — are dropped, matching
        # the LEFT JOIN direction)
        have = df[df["is_cust"] == 1][["custkey"]]
        counts = (
            df.groupby("custkey", sort=False).agg(n_orders=("n", "sum")).reset_index()
        )
        counts = have.merge(counts, on="custkey", how="left")
        g = (
            counts.groupby("n_orders", sort=False).size().rename("n_custs").reset_index()
        )
        return g.astype({"n_orders": np.int64, "n_custs": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_orders": pd.Series([], dtype=np.int64),
                                 "n_custs": pd.Series([], dtype=np.int64)})
        g = df.groupby("n_orders", sort=False).agg(n_custs=("n_custs", "sum")).reset_index()
        return g.astype({"n_orders": np.int64, "n_custs": np.int64})

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(order_partial, batch_format="pandas")
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(cust_rows, batch_format="pandas")
    per = keyed_blocks(cust.union(orders), ["custkey"], _P()).map_batches(
        per_cust, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(per, ["n_orders"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def segment_priority_counts(sf_dir: str):
    """Order counts per (market segment, order priority) →
    (c_mktsegment, o_orderpriority, n_orders) — implemented on Ray
    Data's NATIVE hash join (``Dataset.join``, available since the
    hash-shuffle strategy landed) rather than this module's hand-rolled
    tagged-union co-shuffle, demonstrating both paths side by side.
    The native join hash-partitions both sides on the key across
    aggregator actors — the same physical plan as ``keyed_blocks`` over
    a union, with the join kernel supplied by Ray.  The joined rows
    pre-reduce per block before one tiny final key shuffle.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["c_mktsegment", "o_orderpriority"], sort=False)
            .size().rename("n_orders").reset_index()
        )
        return g.astype({"n_orders": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "c_mktsegment": pd.Series([], dtype=object),
                    "o_orderpriority": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby(["c_mktsegment", "o_orderpriority"], sort=False)
            .agg(n_orders=("n_orders", "sum"))
            .reset_index()
        )
        return g.astype({"n_orders": np.int64})

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=_P(),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    partials = joined.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["c_mktsegment", "o_orderpriority"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def supplier_nation_revenue(sf_dir: str):
    """Map-side broadcast join (TPC-H-Q9-lite): cent-exact discounted
    revenue per supplier NATION → (nation, n_items, revenue_cents).

    The pure broadcast pattern for genuinely tiny dimensions: supplier
    (fixed ~100 rows/SF here) composed with nation (25) into one
    ``suppkey → nation-name`` dict, shipped once via ``ray.put`` and
    read inside every map task — the fact table never shuffles at all;
    each lineitem block reduces straight to (nation, partials) and only
    those ≤ 25-row partials move.  Contrast :func:`brand_revenue`, where
    the dimension scales with the data and must co-shuffle.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    ensure_hash_shuffle()

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    supp_to_nation = {
        int(sk): nmap[int(nk)]
        for sk, nk in zip(supp["s_suppkey"], supp["s_nationkey"])
    }
    lookup_ref = ray.put(supp_to_nation)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        pc = _cents(df["l_extendedprice"])
        disc_pct = np.round(df["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        sk = df["l_suppkey"].to_numpy(np.int64)
        # dense-int dim keys → one numpy take per block, no per-row loop
        table = np.full(max(lookup) + 1, "", dtype=object)
        for key, val in lookup.items():
            table[key] = val
        g = (
            pd.DataFrame(
                {
                    "nation": table[sk],
                    "revenue_cents": pc * (100 - disc_pct) // 100,
                }
            )
            .groupby("nation", sort=False)
            .agg(n_items=("revenue_cents", "size"),
                 revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        return g.astype({"n_items": np.int64, "revenue_cents": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "nation": pd.Series([], dtype=object),
                    "n_items": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby("nation", sort=False)
            .agg(n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        return g.astype({"n_items": np.int64, "revenue_cents": np.int64})

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pandas")
    return keyed_blocks(ds, ["nation"], 2).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def brand_revenue(sf_dir: str):
    """Fact ⋈ scaling-dimension join (TPC-H-Q14-ish by brand):
    cent-exact discounted revenue per part BRAND →
    (p_brand, n_items, revenue_cents).

    Unlike supplier/nation/region, the ``part`` table grows with the
    dataset (200 M rows at TPC-H SF100), so broadcasting it is NOT the
    scale path — both sides hash-partition on ``partkey`` over a tagged
    union (the same ``keyed_blocks`` co-shuffle as
    :func:`segment_revenue`), lineitem pre-reduced per block to one
    (partkey, partials) row per distinct part before the shuffle.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def part_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "partkey": df["p_partkey"].to_numpy(np.int64),
                "brand": df["p_brand"].to_numpy(dtype=object),
                "n_items": np.zeros(len(df), dtype=np.int64),
                "revenue_cents": np.zeros(len(df), dtype=np.int64),
                "is_line": np.zeros(len(df), dtype=np.int64),
            }
        )

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        pc = _cents(df["l_extendedprice"])
        disc_pct = np.round(df["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "partkey": df["l_partkey"].to_numpy(np.int64),
                    "revenue_cents": pc * (100 - disc_pct) // 100,
                }
            )
            .groupby("partkey", sort=False)
            .agg(n_items=("revenue_cents", "size"),
                 revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        g["brand"] = ""
        g["is_line"] = np.int64(1)
        # column order must match part_rows exactly for the tagged union
        g = g[["partkey", "brand", "n_items", "revenue_cents", "is_line"]]
        return g.astype({"n_items": np.int64, "revenue_cents": np.int64})

    def join_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "brand": pd.Series([], dtype=object),
                    "n_items": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        dim = df[df["is_line"] == 0][["partkey", "brand"]]
        fact = df[df["is_line"] == 1][["partkey", "n_items", "revenue_cents"]]
        j = fact.merge(dim, on="partkey", how="inner")
        g = (
            j.groupby("brand", sort=False)
            .agg(n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        return g.astype({"n_items": np.int64, "revenue_cents": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "p_brand": pd.Series([], dtype=object),
                    "n_items": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby("brand", sort=False)
            .agg(n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum"))
            .reset_index()
            .rename(columns={"brand": "p_brand"})
        )
        return g.astype({"n_items": np.int64, "revenue_cents": np.int64})

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(part_rows, batch_format="pandas")
    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pandas")
    joined = keyed_blocks(part.union(lines), ["partkey"], _P()).map_batches(
        join_reduce, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(joined, ["brand"], 2).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H-Q3-style shipping priority: the ``k`` highest-revenue
    orders from one market segment that were placed before ``cutoff``
    but have lineitems still shipping after it →
    (o_orderkey, revenue_cents, rnk).

    The multi-key join chain pattern: two joins on DIFFERENT keys mean
    two co-shuffles, each reusing the same ``keyed_blocks`` primitive —
    no stage ever sees more than its hash partition.

    * shuffle 1 (``custkey``): segment customers ⋉ date-filtered orders
      — a co-shuffled SEMI-join (the customer side carries no payload,
      it only gates order rows), both reads column- and predicate-pruned.
    * lineitem pre-reduces per block to (orderkey, partial
      revenue_cents) before ever shuffling — shuffle 2 carries one row
      per (block, order), not one per lineitem.
    * shuffle 2 (``orderkey``): surviving orders ⋈ lineitem partials,
      exact per-order revenue inside the block.
    * global top-``k``: per-block cut → one tiny block assigns the
      exact rank (same two-level cut as ``docops.longest_docs``) — never
      a global sort.

    Revenue is cent-exact int64 (per-row floor divide, see module
    docstring) with ``o_orderkey`` as the deterministic tie-break, so
    the result hash-matches the DuckDB twin bit-for-bit.
    """
    import datetime

    import pyarrow.dataset as pads
    import ray.data as rd

    ensure_hash_shuffle()
    cut = datetime.datetime.fromisoformat(cutoff)

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["c_custkey"].to_numpy(np.int64),
                "orderkey": np.zeros(len(df), dtype=np.int64),
                "is_order": np.zeros(len(df), dtype=np.int64),
            }
        )

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["o_custkey"].to_numpy(np.int64),
                "orderkey": df["o_orderkey"].to_numpy(np.int64),
                "is_order": np.ones(len(df), dtype=np.int64),
            }
        )

    def semi_join(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"orderkey": pd.Series([], dtype=np.int64),
                                 "revenue_cents": pd.Series([], dtype=np.int64),
                                 "is_line": pd.Series([], dtype=np.int64)})
        keep = np.unique(df.loc[df["is_order"] == 0, "custkey"].to_numpy(np.int64))
        is_ord = (df["is_order"] == 1).to_numpy()
        ords = df[is_ord & np.isin(df["custkey"].to_numpy(np.int64), keep)]
        return pd.DataFrame(
            {
                "orderkey": ords["orderkey"].to_numpy(np.int64),
                "revenue_cents": np.zeros(len(ords), dtype=np.int64),
                "is_line": np.zeros(len(ords), dtype=np.int64),
            }
        )

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        pc = _cents(df["l_extendedprice"])
        disc_pct = np.round(df["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        g = (
            pd.DataFrame({"orderkey": df["l_orderkey"].to_numpy(np.int64),
                          "revenue_cents": pc * (100 - disc_pct) // 100})
            .groupby("orderkey", sort=False)
            .agg(revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        g["is_line"] = np.int64(1)
        return g.astype({"orderkey": np.int64, "revenue_cents": np.int64})

    def join_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "revenue_cents": pd.Series([], dtype=np.int64)})
        keep = np.unique(df.loc[df["is_line"] == 0, "orderkey"].to_numpy(np.int64))
        is_line = (df["is_line"] == 1).to_numpy()
        lines = df[is_line & np.isin(df["orderkey"].to_numpy(np.int64), keep)]
        g = (
            lines.groupby("orderkey", sort=False)
            .agg(revenue_cents=("revenue_cents", "sum"))
            .reset_index()
            .rename(columns={"orderkey": "o_orderkey"})
        )
        g = g.sort_values(["revenue_cents", "o_orderkey"], ascending=[False, True],
                          kind="stable").head(k)
        return g.astype({"o_orderkey": np.int64, "revenue_cents": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "revenue_cents": pd.Series([], dtype=np.int64),
                                 "rnk": pd.Series([], dtype=np.int64)})
        out = df.sort_values(["revenue_cents", "o_orderkey"], ascending=[False, True],
                             kind="stable").head(k).reset_index(drop=True)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out.astype({"o_orderkey": np.int64, "revenue_cents": np.int64,
                           "rnk": np.int64})

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pads.field("c_mktsegment") == segment),
    ).map_batches(cust_rows, batch_format="pandas")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") < cut),
    ).map_batches(order_rows, batch_format="pandas")
    seg_orders = keyed_blocks(cust.union(orders), ["custkey"], _P()).map_batches(
        semi_join, batch_size=None, batch_format="pandas"
    )
    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") > cut),
    ).map_batches(line_partial, batch_format="pandas")
    per_order = keyed_blocks(seg_orders.union(lines), ["orderkey"], _P()).map_batches(
        join_topk, batch_size=None, batch_format="pandas"
    )
    return per_order.repartition(1).map_batches(final, batch_size=None,
                                                batch_format="pandas")


def region_revenue(sf_dir: str):
    """Star-schema join (TPC-H-Q5-lite): order count and cent-exact
    revenue per REGION → (region, n_orders, revenue_cents).

    The canonical star pattern this engine prescribes for 100-TB fact
    tables: the tiny dimensions (nation 25 rows, region 5) are read once
    on the driver, composed into a nationkey → region-name lookup, and
    broadcast via ``ray.put`` into the customer map — never shuffled.
    Only the two large sides (customer, orders) move, co-shuffled on
    ``custkey`` exactly like :func:`segment_revenue`, with per-block
    pre-reduction so the final region shuffle carries a handful of rows.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    ensure_hash_shuffle()

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    rmap = dict(zip(region["r_regionkey"], region["r_name"]))
    nat_to_region = {
        int(nk): rmap[int(rk)]
        for nk, rk in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    lookup_ref = ray.put(nat_to_region)

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        nk = df["c_nationkey"].to_numpy(np.int64)
        table = np.full(max(lookup) + 1, "", dtype=object)
        for key, val in lookup.items():
            table[key] = val
        return pd.DataFrame(
            {
                "custkey": df["c_custkey"].to_numpy(np.int64),
                "region": table[nk],
                "price_cents": np.zeros(len(df), dtype=np.int64),
                "is_order": np.zeros(len(df), dtype=np.int64),
            }
        )

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "custkey": df["o_custkey"].to_numpy(np.int64),
                "region": np.full(len(df), "", dtype=object),
                "price_cents": _cents(df["o_totalprice"]),
                "is_order": np.ones(len(df), dtype=np.int64),
            }
        )

    def join_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "region": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        dim = df[df["is_order"] == 0][["custkey", "region"]]
        fact = df[df["is_order"] == 1][["custkey", "price_cents"]]
        j = fact.merge(dim, on="custkey", how="inner")
        g = (
            j.groupby("region", sort=False)
            .agg(n_orders=("price_cents", "size"), revenue_cents=("price_cents", "sum"))
            .reset_index()
        )
        return g.astype({"n_orders": np.int64, "revenue_cents": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "region": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype=np.int64),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby("region", sort=False)
            .agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        return g.astype({"n_orders": np.int64, "revenue_cents": np.int64})

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_rows, batch_format="pandas")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(order_rows, batch_format="pandas")
    joined = keyed_blocks(cust.union(orders), ["custkey"], _P()).map_batches(
        join_reduce, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(joined, ["region"], 2).map_batches(
        final, batch_size=None, batch_format="pandas"
    )
