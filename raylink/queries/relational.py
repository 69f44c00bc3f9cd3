from __future__ import annotations

import os  # noqa: F401

import numpy as np  # noqa: F401
import pyarrow as pa  # noqa: F401

from raylink.oracles_sql import P  # noqa: F401
from raylink.pipelines import (  # noqa: F401
    cache_key,
    degree_table,
    distinct_edges,
    page_edge_tables,
    page_graph,
)
from raylink.superstep import CKPT_ROOT  # noqa: F401
from raylink.util import pearson_partials, round_half_away  # noqa: F401

from raylink.queries._common import (  # noqa: F401
    PR_ITERS,
    HITS_ITERS,
    KATZ_ITERS,
    EIGEN_ITERS,
    HARMONIC_SEEDS,
    ANF_ROUNDS,
    DENSEST_SQL_ROUNDS,
    PPR_ITERS,
    WL_ROUNDS,
    LPA_COMMUNITY_ROUNDS,
    _SHIP_CUTOFF,
    _Q3_DATE,
    DSIR_TARGET,
    PERC_DIM,
    PERC_ROUNDS,
    MIX_SEED,
    GAP_QS,
    PACK_BUDGET,
    BOILER_MIN_DOCS,
    EGO_SEEDS,
    JP_ROUNDS,
    MATCH_ROUNDS,
    SPLIT_SEED,
    SPLIT_BOUNDS,
    _ckpt,
    _dual_graph,
    _cents,
    _parquet_rows,
    _docs,
    _plant_pii,
    _emb,
    _flatten_media_features,
    _planted_lines,
    _link_host_diversity,
)


def q_pricing_summary(sf_dir: str, lineitem_paths: list[str] | None = None):
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) sums /
    averages over shipped lineitems. Shape: column-pruned read -> per-batch
    integer partial aggregates (one row per group per batch) -> tiny
    groupby -> final division. Nothing bigger than #groups shuffles.
    ``lineitem_paths`` overrides the fact-table read (bench amplification:
    pass the same file N times for an N x scan)."""
    import pyarrow.compute as pc
    import ray.data as rd

    # row filter pushed to the parquet scanner (row-group statistics prune
    # IO before a byte leaves storage — the 100-TB design point); the
    # in-batch filter below stays as the exactness guarantee (pushdown is
    # also exact, so it is a no-op on the surviving rows)
    li = rd.read_parquet(
        lineitem_paths or f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
        filter=pc.field("l_shipdate")
        <= pa.scalar(_SHIP_CUTOFF.item(), type=pa.timestamp("us")),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.less_equal(
                b.column("l_shipdate"),
                pa.scalar(_SHIP_CUTOFF.item(), type=pa.timestamp("us")),
            )
        )
        if t.num_rows == 0:
            return pa.table(
                {"l_returnflag": pa.array([], type=pa.string()),
                 "l_linestatus": pa.array([], type=pa.string()),
                 "qty": pa.array([], type=pa.int64()),
                 "base": pa.array([], type=pa.int64()),
                 "disc_price": pa.array([], type=pa.int64()),
                 "charge": pa.array([], type=pa.int64()),
                 "disc": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        # Arrow-native group keys: dictionary-encode both string columns
        # (no per-row python objects on the fact-table scan), combine the
        # integer codes into one packed key for the per-batch grouping.
        rf = t.column("l_returnflag").combine_chunks().dictionary_encode()
        ls = t.column("l_linestatus").combine_chunks().dictionary_encode()
        rfc = rf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lsc = ls.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nls = len(ls.dictionary)
        uk, inv = np.unique(rfc * nls + lsc, return_inverse=True)
        q = np.rint(t.column("l_quantity").to_numpy(zero_copy_only=False)).astype(np.int64)
        ec = _cents(t.column("l_extendedprice"))
        dc = _cents(t.column("l_discount"))
        tc = _cents(t.column("l_tax"))
        dp = ec * (100 - dc)
        ch = dp * (100 + tc)
        ng = len(uk)

        def gsum(v):  # int64 accumulation end-to-end — exact up to the
            # documented ~1e7 rows/group int64 bound regardless of batch size
            out = np.zeros(ng, dtype=np.int64)
            np.add.at(out, inv, v.astype(np.int64))
            return out

        return pa.table(
            {
                "l_returnflag": rf.dictionary.take(pa.array(uk // nls)),
                "l_linestatus": ls.dictionary.take(pa.array(uk % nls)),
                "qty": pa.array(gsum(q)),
                "base": pa.array(gsum(ec)),
                "disc_price": pa.array(gsum(dp)),
                "charge": pa.array(gsum(ch)),
                "disc": pa.array(gsum(dc)),
                "cnt": pa.array(np.bincount(inv, minlength=ng).astype(np.int64)),
            }
        )

    from raylink.join import tree_groupby_sum

    # 6 groups max: map-only combine tree, not the sort-based Aggregate
    agg = tree_groupby_sum(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["qty", "base", "disc_price", "charge", "disc", "cnt"],
    )

    def finish(b: pa.Table) -> pa.Table:
        qty = b.column("sum(qty)").to_numpy(zero_copy_only=False).astype(np.int64)
        base = b.column("sum(base)").to_numpy(zero_copy_only=False).astype(np.int64)
        dp = b.column("sum(disc_price)").to_numpy(zero_copy_only=False).astype(np.int64)
        ch = b.column("sum(charge)").to_numpy(zero_copy_only=False).astype(np.int64)
        dc = b.column("sum(disc)").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "sum_qty": pa.array(qty.astype(np.float64)),
                "sum_base_price": pa.array(base.astype(np.float64) / 100.0),
                "sum_disc_price": pa.array(dp.astype(np.float64) / 10000.0),
                "sum_charge": pa.array(ch.astype(np.float64) / 1000000.0),
                "avg_qty": pa.array(qty.astype(np.float64) / cnt),
                "avg_price": pa.array(base.astype(np.float64) / 100.0 / cnt),
                "avg_disc": pa.array(dc.astype(np.float64) / 100.0 / cnt),
                "count_order": pa.array(cnt),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def q_shipping_priority(sf_dir: str, broadcast_threshold: int | None = None):
    """TPC-H Q3-shaped shipping priority: top-10 open orders of BUILDING
    customers by pending revenue. Shape: the customer semi-join is
    size-thresholded on the parquet-footer row count — broadcast the
    filtered custkeys (``ray.put``) while the dimension is small, switch to
    the distributed ``hash_join`` semi-join when it is dataset-sized; then
    date-filtered fact reads, large x large ``hash_join`` lineitem x
    orders, per-batch integer revenue partials, multi-key groupby,
    distributed sort + limit."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylink.join import BROADCAST_THRESHOLD, hash_join

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    ).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), pa.scalar("BUILDING")))
        .select(["c_custkey"]),
        batch_format="pyarrow",
    )
    d1 = pa.scalar(_Q3_DATE.item(), type=pa.timestamp("us"))
    orders_raw = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < d1,  # scanner-level row pruning
    )

    if _parquet_rows(sf_dir, "customer") <= broadcast_threshold:
        ckeys = np.sort(cust.to_pandas()["c_custkey"].to_numpy(np.int64))
        cref = ray.put(ckeys)

        def orders_f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less(b.column("o_orderdate"), d1))
            ck = ray.get(cref)
            ok = t.column("o_custkey").to_numpy(zero_copy_only=False)
            if len(ck) == 0:  # empty dimension: nothing can match
                hit = np.zeros(len(ok), dtype=bool)
            else:
                pos = np.searchsorted(ck, ok)
                hit = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == ok)
            t = t.filter(pa.array(hit))
            return pa.table(
                {"okey": t.column("o_orderkey"),
                 "o_orderdate": t.column("o_orderdate")}
            )

        orders = orders_raw.map_batches(orders_f, batch_format="pyarrow")
    else:  # dataset-sized dimension: distributed semi-join (inner hash_join)

        def odate_f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less(b.column("o_orderdate"), d1))
            return pa.table(
                {
                    "ckey": t.column("o_custkey"),
                    "okey": t.column("o_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                }
            )

        odate = orders_raw.map_batches(odate_f, batch_format="pyarrow")
        ckds = cust.map_batches(
            lambda b: pa.table(
                {"ckey": b.column("c_custkey"),
                 "bld": pa.array(np.ones(b.num_rows, dtype=np.int8))}
            ),
            batch_format="pyarrow",
        )
        orders = hash_join(
            odate, ckds, on="ckey",
            left_cols={"okey": pa.int64(), "o_orderdate": pa.timestamp("us")},
            right_cols={"bld": pa.int8()},
            strict=False,
        ).select_columns(["okey", "o_orderdate"])

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column("l_shipdate"), d1))
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        return pa.table({"okey": t.column("l_orderkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > d1,  # scanner-level row pruning
    ).map_batches(li_f, batch_format="pyarrow")

    def rev_final(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False)
        uk, idx, inv = np.unique(ok, return_index=True, return_inverse=True)
        rev = b.column("rev").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)  # int64-exact regardless of batch size
        dates = b.column("o_orderdate").take(pa.array(idx))
        return pa.table(
            {"l_orderkey": pa.array(uk), "rev": pa.array(s), "o_orderdate": dates}
        )

    # revenue groups on the JOIN key, so the aggregation runs inside the
    # join's bucket groups (hash_join post) — each okey's rows are complete
    # there, making the sums globally final with no second shuffle;
    # o_orderdate rides along (functionally dependent on the order key)
    agg = hash_join(
        li, orders, on="okey",
        left_cols={"rev": pa.int64()},
        right_cols={"o_orderdate": pa.timestamp("us")},
        strict=False,
        post=rev_final,
    )
    top = agg.sort(["rev", "l_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "revenue": pa.array(
                    b.column("rev").to_numpy(zero_copy_only=False).astype(np.float64)
                    / 10000.0
                ),
                "o_orderdate": b.column("o_orderdate"),
            }
        ),
        batch_format="pyarrow",
    )


def q_nation_revenue(sf_dir: str, broadcast_threshold: int | None = None):
    """TPC-H Q5-shaped revenue per customer nation: nation (25 rows) is a
    driver map; the customer nationkey attach goes through the thresholded
    ``attach_lookup`` (broadcast while small, distributed hash join when the
    dimension is dataset-sized — decided from the parquet footer row count,
    no execution); then one large x large ``hash_join`` orders x lineitem +
    integer partial aggregation by nation. -> (n_name, revenue), ordered by
    revenue desc, name asc."""
    import ray.data as rd

    from raylink.join import attach_lookup, hash_join

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"),
             "nkey": pa.compute.cast(b.column("c_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    orders_k = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pa.table(
            {"okey": b.column("o_orderkey"), "ckey": b.column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    from raylink.join import BROADCAST_THRESHOLD

    orders = attach_lookup(
        orders_k, cust, on="ckey",
        left_cols={"okey": pa.int64()}, value_cols={"nkey": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
        broadcast_threshold=(
            BROADCAST_THRESHOLD if broadcast_threshold is None
            else broadcast_threshold
        ),
    ).select_columns(["okey", "nkey"])

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table({"okey": b.column("l_orderkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")

    def nat_partial(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(nk, return_inverse=True)
        rev = b.column("rev").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)  # int64-exact regardless of batch size
        return pa.table({"nkey": pa.array(uk), "rev": pa.array(s)})

    from raylink.join import tree_groupby_sum

    # nation partials collapse inside the join's bucket groups (post) —
    # <=25 rows leave each bucket — then a map-only combine tree finishes
    # (nkey is NOT the join key, so per-bucket sums are partials)
    joined = hash_join(
        li, orders, on="okey",
        left_cols={"rev": pa.int64()}, right_cols={"nkey": pa.int64()},
        strict=False,
        post=nat_partial,
    )
    agg = tree_groupby_sum(joined, ["nkey"], ["rev"])

    def finish(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        s = b.column("sum(rev)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array([nmap[int(k)] for k in nk], type=pa.string()),
                "revenue": pa.array(s.astype(np.float64) / 10000.0),
                "rev_i": pa.array(s),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return out.sort(["rev_i", "n_name"], descending=[True, False]).drop_columns(
        ["rev_i"]
    )


def q_order_priority(sf_dir: str):
    """TPC-H Q4 shape: orders in a quarter having at least one discounted
    line item — the EXISTS predicate as a distributed hash SEMI-join
    (lineitem is dataset-sized: no broadcast), with per-priority counting
    fused into the join tasks (post hook -> per-bucket partials -> one
    5-row groupby)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import semi_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_discount"]
    ).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b.filter(pc.greater(b.column("l_discount"), 0.05))
             .column("l_orderkey")}
        ),
        batch_format="pyarrow",
    )
    d0 = pa.scalar(np.datetime64("1996-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1996-04-01", "us").item(), type=pa.timestamp("us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b.column("o_orderdate"), d0),
                    pc.less(b.column("o_orderdate"), d1))
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    def cnt(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("o_orderpriority").combine_chunks())
        return pa.table(
            {"o_orderpriority": vc.field("values"),
             "order_count": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = semi_join(
        orders, li, on="o_orderkey",
        left_cols={"o_orderpriority": pa.string()}, post=cnt,
    )
    out = partials.groupby("o_orderpriority").sum("order_count")
    return out.map_batches(
        lambda b: pa.table(
            {"o_orderpriority": b.column("o_orderpriority"),
             "order_count": b.column("sum(order_count)")}
        ),
        batch_format="pyarrow",
    )


def q_customers_no_urgent(sf_dir: str):
    """NOT EXISTS as a distributed hash ANTI-join: customers who never
    placed a 1-URGENT order. Orders is the big side — keys bucket-shuffle,
    nothing on the driver."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import anti_join

    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": b.filter(
                pc.equal(b.column("o_orderpriority"), pa.scalar("1-URGENT"))
            ).column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    return anti_join(
        cust, urgent, on="c_custkey",
        left_cols={"c_name": pa.string(), "c_acctbal": pa.float64()},
    )


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape ("large volume customers"): orders whose total
    line-item quantity exceeds 300 units, with the customer name attached.
    Shape: per-batch integer quantity partials -> ``bucketed_sum`` per
    order (unbounded key cardinality, coarse buckets) -> distributed
    HAVING filter -> large x large ``hash_join`` against orders ->
    thresholded customer-name attach -> distributed sort + limit 100.
    -> (c_name, o_custkey, o_orderkey, o_orderdate, total_price, sum_qty)
    ordered by total_price desc, orderkey asc."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum, hash_join

    def qty_f(b: pa.Table) -> pa.Table:
        q = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)  # quantities are whole units stored as doubles
        return pa.table({"okey": b.column("l_orderkey"), "qty": pa.array(q)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(qty_f, batch_format="pyarrow")
    sums = bucketed_sum(li, key="okey", val="qty", out_val="sum_qty")
    big = sums.map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"), 300)),
        batch_format="pyarrow",
    )

    def ord_f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": b.column("o_orderkey"),
                "ckey": b.column("o_custkey"),
                "o_orderdate": b.column("o_orderdate"),
                "price": pa.array(_cents(b.column("o_totalprice"))),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(ord_f, batch_format="pyarrow")
    joined = hash_join(
        big, orders, on="okey",
        left_cols={"sum_qty": pa.int64()},
        right_cols={
            "ckey": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "price": pa.int64(),
        },
        strict=False,
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"), "c_name": b.column("c_name")}
        ),
        batch_format="pyarrow",
    )
    named = attach_lookup(
        joined, cust, on="ckey",
        left_cols={
            "okey": pa.int64(),
            "sum_qty": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "price": pa.int64(),
        },
        value_cols={"c_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    )
    top = named.sort(["price", "okey"], descending=[True, False]).limit(100)
    return top.map_batches(
        lambda b: pa.table(
            {
                "c_name": b.column("c_name"),
                "o_custkey": b.column("ckey"),
                "o_orderkey": b.column("okey"),
                "o_orderdate": b.column("o_orderdate"),
                "total_price": pa.array(
                    b.column("price").to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    / 100.0
                ),
                "sum_qty": b.column("sum_qty"),
            }
        ),
        batch_format="pyarrow",
    )


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape ("returned item reporting"): revenue lost to
    returned items per customer over a half-year of orders, top 20.
    Shape: scanner-pruned date filter on orders + returnflag filter on
    lineitem -> large x large ``hash_join`` with per-customer integer
    partials fused into the join tasks (custkey is NOT the join key, so
    they are partials) -> ``bucketed_sum`` per customer -> distributed
    sort + limit 20 -> thresholded name/acctbal attach on the 20 rows.
    -> (c_custkey, c_name, c_acctbal, revenue) ordered by revenue desc."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum, hash_join

    d0 = pa.scalar(np.datetime64("1996-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1996-07-01", "us").item(), type=pa.timestamp("us"))

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        return pa.table({"okey": t.column("l_orderkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",  # scanner-level row pruning
    ).map_batches(li_f, batch_format="pyarrow")

    def ord_f(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.greater_equal(b.column("o_orderdate"), d0),
                    pc.less(b.column("o_orderdate"), d1))
        )
        return pa.table({"okey": t.column("o_orderkey"), "ckey": t.column("o_custkey")})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= d0) & (pc.field("o_orderdate") < d1),
    ).map_batches(ord_f, batch_format="pyarrow")

    def cust_partial(b: pa.Table) -> pa.Table:
        ck = b.column("ckey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        rev = b.column("rev").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"ckey": pa.array(uk), "rev": pa.array(s)})

    joined = hash_join(
        li, orders, on="okey",
        left_cols={"rev": pa.int64()}, right_cols={"ckey": pa.int64()},
        strict=False,
        post=cust_partial,
    )
    agg = bucketed_sum(joined, key="ckey", val="rev", out_val="rev")
    top = agg.sort(["rev", "ckey"], descending=[True, False]).limit(20)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(
        lambda b: pa.table(
            {
                "ckey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "c_acctbal": b.column("c_acctbal"),
            }
        ),
        batch_format="pyarrow",
    )
    named = attach_lookup(
        top, cust, on="ckey",
        left_cols={"rev": pa.int64()},
        value_cols={"c_name": pa.string(), "c_acctbal": pa.float64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    )
    return named.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("ckey"),
                "c_name": b.column("c_name"),
                "c_acctbal": b.column("c_acctbal"),
                "revenue": pa.array(
                    b.column("rev").to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    / 10000.0
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape ("forecasting revenue change"): one column-pruned,
    scanner-filtered pass over lineitem, integer cents partials, a single
    scalar out — the pure-scan baseline of the relational suite.
    -> one row (revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    d0 = pa.scalar(np.datetime64("1996-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1997-01-01", "us").item(), type=pa.timestamp("us"))

    def f(b: pa.Table) -> pa.Table:
        dc = _cents(b.column("l_discount"))
        qty = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        sd = b.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        t = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.datetime64("1996-01-01", "us").astype(np.int64)
        hi = np.datetime64("1997-01-01", "us").astype(np.int64)
        keep = (t >= lo) & (t < hi) & (dc >= 5) & (dc <= 7) & (qty < 24)
        rev = (_cents(b.column("l_extendedprice"))[keep] * dc[keep]).sum()
        return pa.table({"rev": pa.array([int(rev)], type=pa.int64())})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(pc.field("l_shipdate") >= d0) & (pc.field("l_shipdate") < d1),
    ).map_batches(f, batch_format="pyarrow")
    total = int(li.sum("rev"))
    return pa.table(
        {"revenue": pa.array([float(np.int64(total) / np.int64(10000))],
                             type=pa.float64())}
    )


def q_part_profit(sf_dir: str):
    """TPC-H Q9 shape ("product type profit"): PROMO-part revenue per
    (supplier nation, ship year). Shape: promo partkeys -> thresholded
    semi-join filter on the lineitem scan (zero shuffle while the part
    dimension broadcasts, bucketed when dataset-sized), supplier-nation
    attach via thresholded lookup, per-batch integer (nation, year)
    partials, bounded combine tree. -> (n_name, yr, revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, semi_join, tree_groupby_sum

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    promo = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.filter(pc.equal(b.column("p_type"), "PROMO"))
             .column("p_partkey")}
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"skey": b.column("s_suppkey"),
             "nkey": pc.cast(b.column("s_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        yr = pc.cast(pc.year(b.column("l_shipdate")), pa.int64())
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "skey": b.column("l_suppkey"),
                "yr": yr,
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    filtered = semi_join(
        li, promo, on="pkey",
        left_cols={"skey": pa.int64(), "yr": pa.int64(), "rev": pa.int64()},
        n_key_rows=_parquet_rows(sf_dir, "part"),
    )
    attached = attach_lookup(
        filtered, supp, on="skey",
        left_cols={"yr": pa.int64(), "rev": pa.int64()},
        value_cols={"nkey": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )

    def partial(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        yr = b.column("yr").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        key = nk * 10000 + yr
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return pa.table(
            {
                "nkey": pa.array(uk // 10000),
                "yr": pa.array(uk % 10000),
                "rev": pa.array(s),
            }
        )

    agg = tree_groupby_sum(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["nkey", "yr"], ["rev"],
    )

    def finish(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([nmap[k] for k in nk], type=pa.string()),
                "yr": b.column("yr"),
                "revenue": pa.array(
                    b.column("sum(rev)").to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_brand_suppliers(sf_dir: str):
    """TPC-H Q16 shape ("parts/supplier relationship"): distinct supplier
    count per part brand off the fact table. Shape: thresholded brand
    attach on the lineitem scan, per-batch (brand, supplier) pair dedup,
    ONE pair-hash coarse-bucket groupby (all rows of a pair colocate ->
    in-group dedup is global) with per-brand partial counts, bounded
    combine tree. -> (p_brand, supplier_cnt)."""
    import ray.data as rd

    from raylink.join import attach_lookup, tree_groupby_sum
    from raylink.util import splitmix64, text_hash64

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.column("p_partkey"), "p_brand": b.column("p_brand")}
        ),
        batch_format="pyarrow",
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.column("l_partkey"), "skey": b.column("l_suppkey")}
        ),
        batch_format="pyarrow",
    )
    branded = attach_lookup(
        li, part, on="pkey",
        left_cols={"skey": pa.int64()},
        value_cols={"p_brand": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )
    B = np.uint64(64)

    def pair_rows(b: pa.Table) -> pa.Table:
        br = b.column("p_brand")
        if isinstance(br, pa.ChunkedArray):
            br = br.combine_chunks()
        enc = br.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b.column("skey").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, code))
        c, s = code[order], sk[order]
        keep = np.r_[True, (c[1:] != c[:-1]) | (s[1:] != s[:-1])]
        c, s = c[keep], s[keep]
        brand = enc.dictionary.take(pa.array(c))
        h = text_hash64(brand) ^ splitmix64(s.astype(np.uint64))
        return pa.table(
            {
                "b": pa.array((splitmix64(h) % B).astype(np.int32)),
                "p_brand": brand,
                "skey": pa.array(s),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        br = group.column("p_brand")
        if isinstance(br, pa.ChunkedArray):
            br = br.combine_chunks()
        enc = br.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sk = group.column("skey").to_numpy(zero_copy_only=False)
        key = np.unique(code * np.int64(1 << 32) + sk)
        cnt = np.bincount(
            (key >> np.int64(32)).astype(np.int64), minlength=len(enc.dictionary)
        )
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "p_brand": enc.dictionary.take(pa.array(nz)),
                "supplier_cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    partials = (
        branded.map_batches(pair_rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(partials, ["p_brand"], ["supplier_cnt"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "p_brand": b.column("p_brand"),
                "supplier_cnt": b.column("sum(supplier_cnt)"),
            }
        ),
        batch_format="pyarrow",
    )


def q_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by order count (urgent
    orders excluded) INCLUDING the zero-order bin — the classic LEFT OUTER
    JOIN + double GROUP BY, re-expressed join-free: per-customer counts
    from one bucketed sum over the filtered orders scan, the histogram via
    the bounded combine tree, and the zero bin by arithmetic
    (n_customers - customers_with_orders) off the customer parquet FOOTER
    row count — the left side is never scanned at all."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylink.join import bucketed_sum, tree_groupby_sum

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def part(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("o_orderpriority"), "1-URGENT")
        ck = batch.filter(keep).column("o_custkey").to_numpy(zero_copy_only=False)
        uc, c = np.unique(ck, return_counts=True)
        return pa.table(
            {"o_custkey": pa.array(uc), "c": pa.array(c.astype(np.int64))}
        )

    oc = bucketed_sum(
        orders.map_batches(part, batch_format="pyarrow"),
        "o_custkey", "c", out_val="c_count",
    )

    def hist_part(batch: pa.Table) -> pa.Table:
        v, n = np.unique(
            batch.column("c_count").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {"c_count": pa.array(v), "h": pa.array(n.astype(np.int64))}
        )

    hist = tree_groupby_sum(
        oc.map_batches(hist_part, batch_format="pyarrow"), ["c_count"], ["h"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        # tree_groupby_sum ends single-block, so the zero bin appends once
        v = batch.column("c_count").to_numpy(zero_copy_only=False)
        h = batch.column("sum(h)").to_numpy(zero_copy_only=False)
        zero = n_cust - int(h.sum())
        if zero > 0:
            v = np.r_[np.int64(0), v]
            h = np.r_[np.int64(zero), h]
        return pa.table({"c_count": pa.array(v), "custdist": pa.array(h)})

    return hist.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_nation_trade(sf_dir: str):
    """TPC-H Q7 shape ("volume shipping"): revenue between every ordered
    (supplier nation, customer nation) pair per ship year, cross-nation
    only. Shape: thresholded supplier-nation attach on the lineitem scan,
    thresholded customer-nation attach on orders, ONE large x large
    ``hash_join`` on orderkey whose ``post`` hook filters snat != cnat and
    collapses to integer (snat, cnat, yr) partials inside the join's
    bucket groups, bounded combine tree. -> (supp_nation, cust_nation,
    yr, revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, hash_join, tree_groupby_sum

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"skey": b.column("s_suppkey"),
             "snat": pc.cast(b.column("s_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"),
             "cnat": pc.cast(b.column("c_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table(
            {
                "okey": b.column("l_orderkey"),
                "skey": b.column("l_suppkey"),
                "yr": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    li = attach_lookup(
        li, supp, on="skey",
        left_cols={"okey": pa.int64(), "yr": pa.int64(), "rev": pa.int64()},
        value_cols={"snat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )
    orders = attach_lookup(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(
            lambda b: pa.table(
                {"okey": b.column("o_orderkey"), "ckey": b.column("o_custkey")}
            ),
            batch_format="pyarrow",
        ),
        cust, on="ckey",
        left_cols={"okey": pa.int64()}, value_cols={"cnat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    ).select_columns(["okey", "cnat"])

    def pair_partial(b: pa.Table) -> pa.Table:
        sn = b.column("snat").to_numpy(zero_copy_only=False)
        cn = b.column("cnat").to_numpy(zero_copy_only=False)
        keep = sn != cn
        sn, cn = sn[keep], cn[keep]
        yr = b.column("yr").to_numpy(zero_copy_only=False)[keep]
        rev = b.column("rev").to_numpy(zero_copy_only=False)[keep]
        # nations < 2**7, years < 2**12: the packed partial key is tiny
        key = ((sn << np.int64(7)) | cn) * np.int64(4096) + yr
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return pa.table(
            {
                "snat": pa.array((uk // 4096) >> np.int64(7)),
                "cnat": pa.array((uk // 4096) & np.int64(0x7F)),
                "yr": pa.array(uk % 4096),
                "rev": pa.array(s),
            }
        )

    joined = hash_join(
        li.select_columns(["okey", "snat", "yr", "rev"]), orders, on="okey",
        left_cols={"snat": pa.int64(), "yr": pa.int64(), "rev": pa.int64()},
        right_cols={"cnat": pa.int64()},
        strict=False,
        post=pair_partial,
    )
    agg = tree_groupby_sum(joined, ["snat", "cnat", "yr"], ["rev"])

    def finish(b: pa.Table) -> pa.Table:
        sn = b.column("snat").to_pylist()
        cn = b.column("cnat").to_pylist()
        return pa.table(
            {
                "supp_nation": pa.array([nmap[k] for k in sn], pa.string()),
                "cust_nation": pa.array([nmap[k] for k in cn], pa.string()),
                "yr": b.column("yr"),
                "revenue": pa.array(
                    b.column("sum(rev)").to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_market_share(sf_dir: str, region_name: str = "ASIA",
                   part_type: str = "STANDARD"):
    """TPC-H Q8 shape ("national market share"): the target nation's share
    of STANDARD-part revenue among orders of ``region_name`` customers,
    per order year. The target nation is the region's minimum nationkey
    (deterministic; the synthetic schema has no fixed 'BRAZIL'). Shape:
    part-type semi-join on the lineitem scan, thresholded supplier-nation
    attach, region-filtered customer->order attach, ONE large x large
    ``hash_join`` on orderkey with per-(year) integer (num, den) partials
    in its ``post`` hook. -> (yr, mkt_share)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, hash_join, semi_join, tree_groupby_sum

    reg = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region_name, "r_regionkey"].iloc[0])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region_nats = np.sort(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].to_numpy(np.int64)
    )
    target = int(region_nats[0])

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.filter(pc.equal(b.column("p_type"), part_type))
             .column("p_partkey")}
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"skey": b.column("s_suppkey"),
             "snat": pc.cast(b.column("s_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"),
             "cnat": pc.cast(b.column("c_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "okey": b.column("l_orderkey"),
                "skey": b.column("l_suppkey"),
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    li = semi_join(
        li, parts, on="pkey",
        left_cols={"okey": pa.int64(), "skey": pa.int64(), "rev": pa.int64()},
        n_key_rows=_parquet_rows(sf_dir, "part"),
    )
    li = attach_lookup(
        li, supp, on="skey",
        left_cols={"okey": pa.int64(), "rev": pa.int64()},
        value_cols={"snat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )

    rnset = region_nats  # tiny (<=25): closed over, not shuffled

    def ord_f(b: pa.Table) -> pa.Table:
        cn = b.column("cnat").to_numpy(zero_copy_only=False)
        keep = np.isin(cn, rnset)
        t = b.filter(pa.array(keep))
        return pa.table(
            {
                "okey": t.column("okey"),
                "yr": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )

    orders = attach_lookup(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(
            lambda b: pa.table(
                {"okey": b.column("o_orderkey"),
                 "ckey": b.column("o_custkey"),
                 "o_orderdate": b.column("o_orderdate")}
            ),
            batch_format="pyarrow",
        ),
        cust, on="ckey",
        left_cols={"okey": pa.int64(), "o_orderdate": pa.timestamp("us")},
        value_cols={"cnat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    ).map_batches(ord_f, batch_format="pyarrow")

    def share_partial(b: pa.Table) -> pa.Table:
        yr = b.column("yr").to_numpy(zero_copy_only=False)
        sn = b.column("snat").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(yr, return_inverse=True)
        den = np.zeros(len(uk), np.int64)
        num = np.zeros(len(uk), np.int64)
        np.add.at(den, inv, rev)
        np.add.at(num, inv, np.where(sn == target, rev, 0))
        return pa.table(
            {"yr": pa.array(uk), "num": pa.array(num), "den": pa.array(den)}
        )

    joined = hash_join(
        li.select_columns(["okey", "snat", "rev"]), orders, on="okey",
        left_cols={"snat": pa.int64(), "rev": pa.int64()},
        right_cols={"yr": pa.int64()},
        strict=False,
        post=share_partial,
    )
    agg = tree_groupby_sum(joined, ["yr"], ["num", "den"])

    def finish(b: pa.Table) -> pa.Table:
        num = b.column("sum(num)").to_numpy(zero_copy_only=False)
        den = b.column("sum(den)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "yr": b.column("yr"),
                "mkt_share": pa.array(
                    num.astype(np.float64) / den.astype(np.float64)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape ("promotion effect"): per ship (year, month), the
    percentage of revenue from PROMO-type parts. Shape: thresholded
    promo-flag attach on the lineitem scan (0/1 from the part dimension),
    per-batch integer (num, den) month partials, bounded combine tree, one
    float division per group. -> (yr, mo, promo_pct)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, tree_groupby_sum

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table(
            {
                "pkey": b.column("p_partkey"),
                "isp": pc.cast(
                    pc.equal(b.column("p_type"), "PROMO"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        yr = pc.cast(pc.year(b.column("l_shipdate")), pa.int64())
        mo = pc.cast(pc.month(b.column("l_shipdate")), pa.int64())
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "ym": pc.add(pc.multiply(yr, pa.scalar(100, pa.int64())), mo),
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    li = attach_lookup(
        li, parts, on="pkey",
        left_cols={"ym": pa.int64(), "rev": pa.int64()},
        value_cols={"isp": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ym = b.column("ym").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        isp = b.column("isp").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ym, return_inverse=True)
        den = np.zeros(len(uk), np.int64)
        num = np.zeros(len(uk), np.int64)
        np.add.at(den, inv, rev)
        np.add.at(num, inv, rev * isp)
        return pa.table(
            {"ym": pa.array(uk), "num": pa.array(num), "den": pa.array(den)}
        )

    agg = tree_groupby_sum(
        li.map_batches(partial, batch_format="pyarrow"), ["ym"], ["num", "den"]
    )

    def finish(b: pa.Table) -> pa.Table:
        ym = b.column("ym").to_numpy(zero_copy_only=False)
        num = b.column("sum(num)").to_numpy(zero_copy_only=False)
        den = b.column("sum(den)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "yr": pa.array(ym // 100),
                "mo": pa.array(ym % 100),
                "promo_pct": pa.array(
                    100.0 * (num.astype(np.float64) / den.astype(np.float64))
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape ("top supplier"): supplier(s) with the maximum
    quarter revenue (1996Q1 shipments). Shape: date-pruned lineitem scan,
    ``bucketed_sum`` per supplier (unbounded key cardinality), global max
    as a Dataset aggregate (O(1) on the driver), distributed equality
    filter. Ties all surface (same as the SQL mirror). -> (s_suppkey,
    total_revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import bucketed_sum

    lo = np.datetime64("1996-01-01", "us").astype("datetime64[us]")
    hi = np.datetime64("1996-04-01", "us").astype("datetime64[us]")

    def li_f(b: pa.Table) -> pa.Table:
        t = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (t >= lo) & (t < hi)  # residual filter after row-group pruning
        b = b.filter(pa.array(keep))
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table({"skey": b.column("l_suppkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    ).map_batches(li_f, batch_format="pyarrow")
    sums = bucketed_sum(li, key="skey", val="rev", out_val="rev")
    best = int(sums.max("rev"))

    def finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("rev"), pa.scalar(best, pa.int64())))
        return pa.table(
            {
                "s_suppkey": t.column("skey"),
                "total_revenue": pa.array(
                    t.column("rev").to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape ("small-quantity-order revenue"): per part, the
    yearly-average revenue of lineitems whose quantity is below 20% of
    that part's average quantity. The threshold is evaluated in exact
    integers (quantities are whole units): qty < 0.2 * (sumq/cnt) <=>
    5*qty*cnt < sumq — no float boundary, bit-exact on both sides. Shape:
    ONE coarse-bucket per-part (sumq, cnt) groupby, thresholded attach of
    the per-part aggregates back onto the scan, distributed filter,
    ``bucketed_sum`` of the surviving revenue. -> (p_partkey,
    avg_yearly)."""
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum
    from raylink.util import splitmix64

    def li_f(b: pa.Table) -> pa.Table:
        q = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "qty": pa.array(q),
                "price": pa.array(_cents(b.column("l_extendedprice"))),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_f, batch_format="pyarrow")

    B = np.uint64(32)

    def bucket(b: pa.Table) -> pa.Table:
        pk = b.column("pkey").to_numpy(zero_copy_only=False)
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        # per-batch pre-combine before the shuffle
        uk, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        cn = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, qty)
        np.add.at(cn, inv, 1)
        return pa.table(
            {
                "pb": pa.array(
                    (splitmix64(uk.astype(np.uint64)) % B).astype(np.int32)
                ),
                "pkey": pa.array(uk),
                "sumq": pa.array(sq),
                "cnt": pa.array(cn),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        pk = g.column("pkey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        cn = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, g.column("sumq").to_numpy(zero_copy_only=False))
        np.add.at(cn, inv, g.column("cnt").to_numpy(zero_copy_only=False))
        return pa.table(
            {"pkey": pa.array(uk), "sumq": pa.array(sq), "cnt": pa.array(cn)}
        )

    per_part = (
        li.map_batches(bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(combine, batch_format="pyarrow")
    )
    attached = attach_lookup(
        li, per_part, on="pkey",
        left_cols={"qty": pa.int64(), "price": pa.int64()},
        value_cols={"sumq": pa.int64(), "cnt": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )

    def small(b: pa.Table) -> pa.Table:
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        sq = b.column("sumq").to_numpy(zero_copy_only=False)
        cn = b.column("cnt").to_numpy(zero_copy_only=False)
        keep = 5 * qty * cn < sq  # qty < 0.2*avg, exact in integers
        t = b.filter(pa.array(keep))
        return pa.table({"pkey": t.column("pkey"), "price": t.column("price")})

    sums = bucketed_sum(
        attached.map_batches(small, batch_format="pyarrow"),
        key="pkey", val="price", out_val="price",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b.column("pkey"),
                "avg_yearly": pa.array(
                    (b.column("price").to_numpy(zero_copy_only=False)
                     .astype(np.float64) / 100.0) / 7.0
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def q_part_revenue_share(sf_dir: str):
    """TPC-H Q11 shape ("important stock identification", adapted: no
    partsupp table ships with the testdata, so the value measure is
    lineitem revenue per part): parts whose revenue exceeds ``1.25 /
    n_parts`` of TOTAL revenue (1.25x the mean — the testdata's per-part
    revenue tops out near 1.9x mean, so 2.5x would be vacuous) — the
    HAVING-against-a-global-aggregate shape. Per-part ``bucketed_sum`` of
    integer revenue partials, the total as ONE Dataset aggregate (O(1)
    driver-side), the threshold test in exact integers (``4 * rev *
    n_parts > 5 * total`` — no float boundary), distributed filter.
    ``n_parts`` comes from the parquet
    FOOTER (no execution). int64 bound: ``4 * rev * n_parts`` needs
    rev * n_parts < 4.6e18 — holds through TPC-H sf1000.
    -> (p_partkey, part_revenue)."""
    import ray.data as rd

    from raylink.join import bucketed_sum

    def li_f(b: pa.Table) -> pa.Table:
        dc = _cents(b.column("l_discount"))
        rev = _cents(b.column("l_extendedprice")) * (100 - dc)
        return pa.table({"pkey": b.column("l_partkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    sums = bucketed_sum(li, key="pkey", val="rev", out_val="rev")
    total = int(sums.sum("rev"))
    n_parts = _parquet_rows(sf_dir, "part")

    def keep(b: pa.Table) -> pa.Table:
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(4 * rev * n_parts > 5 * total))
        return pa.table(
            {
                "p_partkey": t.column("pkey"),
                "part_revenue": pa.array(
                    t.column("rev").to_numpy(zero_copy_only=False) / 10000.0
                ),
            }
        )

    return sums.map_batches(keep, batch_format="pyarrow")


def q_dormant_customers(sf_dir: str):
    """TPC-H Q22 shape ("global sales opportunity"): per nation, the count
    and total balance of customers with above-average positive balances
    who placed no order since 2001-01-01 (the testdata gives EVERY
    customer historic orders, so Q22's literal "never ordered" is vacuous;
    the dormancy cutoff keeps ~40% of customers at every scale). Shape:
    the global (sum, count) over positive balances as one Dataset
    aggregate (two int64 scalars on the driver), the above-average test
    in exact integers (``bal * n > sum``), distributed ANTI-join against
    the scanner-filtered recent-order custkeys (orders is the big side —
    keys bucket-shuffle), nation-keyed integer partials through the
    bounded combine tree. -> (c_nationkey, numcust, totacctbal)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import anti_join, tree_groupby_sum

    def c_f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "nat": b.column("c_nationkey"),
                "bal": pa.array(_cents(b.column("c_acctbal"))),
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(c_f, batch_format="pyarrow")

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b.column("bal").to_numpy(zero_copy_only=False)
        p = bal[bal > 0]
        return pa.table(
            {
                "s": pa.array([int(p.sum())], type=pa.int64()),
                "n": pa.array([len(p)], type=pa.int64()),
            }
        )

    parts = cust.map_batches(pos_partial, batch_format="pyarrow")
    s_pos, n_pos = int(parts.sum("s")), int(parts.sum("n"))

    def rich(b: pa.Table) -> pa.Table:
        bal = b.column("bal").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bal * n_pos > s_pos))

    cutoff = pa.scalar(
        np.datetime64("2001-01-01", "us").item(), type=pa.timestamp("us")
    )
    okeys = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= cutoff,  # scanner-level pruning
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.filter(
                    pc.greater_equal(b.column("o_orderdate"), cutoff)
                ).column("o_custkey")
            }
        ),
        batch_format="pyarrow",
    )
    dormant = anti_join(
        cust.map_batches(rich, batch_format="pyarrow"),
        okeys,
        on="c_custkey",
        left_cols={"nat": pa.int64(), "bal": pa.int64()},
    )

    def nat_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nat": b.column("nat"),
                "one": pa.array(np.ones(len(b), np.int64)),
                "bal": b.column("bal"),
            }
        )

    sums = tree_groupby_sum(
        dormant.map_batches(nat_rows, batch_format="pyarrow"),
        keys=["nat"], sum_cols=["one", "bal"],
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": b.column("nat"),
                "numcust": b.column("sum(one)"),
                "totacctbal": pa.array(
                    b.column("sum(bal)").to_numpy(zero_copy_only=False) / 100.0
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape ("minimum cost supplier", adapted: unit of cost is
    the minimum lineitem price per part; ties resolve to the smallest
    suppkey): the correlated-MIN-subquery shape as a distributed
    argmin. Per-batch lexicographic (price, suppkey) argmin per part
    pre-combines before ONE coarse-bucket groupby (all rows of a part
    colocate, so the group argmin is global), then the supplier name
    attaches via the thresholded lookup. -> (p_partkey, min_price,
    s_suppkey, s_name)."""
    import ray.data as rd

    from raylink.join import attach_lookup
    from raylink.util import splitmix64

    B = np.uint64(32)

    def argmin_rows(pk, pr, sk) -> pa.Table:
        order = np.lexsort((sk, pr, pk))
        pk, pr, sk = pk[order], pr[order], sk[order]
        first = np.ones(len(pk), bool)
        first[1:] = pk[1:] != pk[:-1]
        return pk[first], pr[first], sk[first]

    def li_f(b: pa.Table) -> pa.Table:
        pk, pr, sk = argmin_rows(
            b.column("l_partkey").to_numpy(zero_copy_only=False),
            _cents(b.column("l_extendedprice")),
            b.column("l_suppkey").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "mb": pa.array(
                    (splitmix64(pk.astype(np.uint64)) % B).astype(np.int32)
                ),
                "pkey": pa.array(pk),
                "price": pa.array(pr),
                "skey": pa.array(sk),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        pk, pr, sk = argmin_rows(
            g.column("pkey").to_numpy(zero_copy_only=False),
            g.column("price").to_numpy(zero_copy_only=False),
            g.column("skey").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"pkey": pa.array(pk), "price": pa.array(pr),
             "s_suppkey": pa.array(sk)}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    mins = (
        li.map_batches(li_f, batch_format="pyarrow")
        .groupby("mb")
        .map_groups(combine, batch_format="pyarrow")
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    out = attach_lookup(
        mins, supp, on="s_suppkey",
        left_cols={"pkey": pa.int64(), "price": pa.int64()},
        value_cols={"s_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b.column("pkey"),
                "min_price": pa.array(
                    b.column("price").to_numpy(zero_copy_only=False) / 100.0
                ),
                "s_suppkey": b.column("s_suppkey"),
                "s_name": b.column("s_name"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_sole_supplier(sf_dir: str):
    """TPC-H Q21 shape ("suppliers who kept orders waiting", adapted to
    the shipped columns: suppliers who were the SOLE supplier on
    multi-line orders, counted per supplier). The same-table
    EXISTS/NOT-EXISTS pair collapses into per-order aggregates inside ONE
    hash(orderkey) bucket group (an order's lines colocate, so line and
    distinct-supplier counts are global); per-supplier counts pre-combine
    in-group before one ``bucketed_sum``, then the supplier name attaches
    via the thresholded lookup. -> (s_suppkey, s_name, numwait)."""
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum
    from raylink.util import splitmix64

    B = np.uint64(64)

    def li_f(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        # per-batch pre-combine: distinct (order, supp) pairs + line counts
        order = np.lexsort((sk, ok))
        ok, sk = ok[order], sk[order]
        first = np.ones(len(ok), bool)
        first[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(ok)))
        return pa.table(
            {
                "ob": pa.array(
                    (splitmix64(ok[starts].astype(np.uint64)) % B).astype(np.int32)
                ),
                "okey": pa.array(ok[starts]),
                "skey": pa.array(sk[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def per_order(g: pa.Table) -> pa.Table:
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        sk = g.column("skey").to_numpy(zero_copy_only=False)
        cn = g.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk, cn = ok[order], sk[order], cn[order]
        # collapse duplicate (okey, skey) partials from different batches
        pf = np.ones(len(ok), bool)
        pf[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pstart = np.flatnonzero(pf)
        pcnt = np.add.reduceat(cn, pstart) if len(ok) else cn[:0]
        pok, psk = ok[pstart], sk[pstart]
        # per-order: number of distinct suppliers + total line count
        of = np.ones(len(pok), bool)
        of[1:] = pok[1:] != pok[:-1]
        ostart = np.flatnonzero(of)
        nsupp = np.diff(np.append(ostart, len(pok)))
        nlines = np.add.reduceat(pcnt, ostart) if len(pok) else pcnt[:0]
        solo = (nsupp == 1) & (nlines >= 2)
        winners = psk[ostart[solo]]
        uk, cts = np.unique(winners, return_counts=True)
        return pa.table(
            {"skey": pa.array(uk), "n": pa.array(cts.astype(np.int64))}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    per_supp = bucketed_sum(
        li.map_batches(li_f, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(per_order, batch_format="pyarrow"),
        key="skey", val="n", out_val="numwait",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    out = attach_lookup(
        per_supp.map_batches(
            lambda b: pa.table(
                {"s_suppkey": b.column("skey"), "numwait": b.column("numwait")}
            ),
            batch_format="pyarrow",
        ),
        supp, on="s_suppkey",
        left_cols={"numwait": pa.int64()},
        value_cols={"s_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )
    return out


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape ("discounted revenue"): revenue under an OR of
    three (brand, size, quantity-window) branch predicates. Shape: the
    part dimension folds into ONE int8 branch code per partkey (branches
    are exclusive — a part has one brand), attached onto the fact scan via
    the thresholded lookup; the disjunction is a vectorized mask over
    (branch, quantity); integer cents partials -> one scalar.
    -> one row (revenue)."""
    import ray.data as rd

    from raylink.join import attach_lookup

    BRANCHES = (  # (brand, max_size, qty_lo, qty_hi)
        ("Brand#12", 15, 1, 11),
        ("Brand#23", 25, 10, 20),
        ("Brand#34", 35, 20, 30),
    )

    def p_f(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand").to_pandas().to_numpy(dtype=object)
        size = b.column("p_size").to_numpy(zero_copy_only=False)
        code = np.zeros(len(b), np.int64)
        for i, (br, mx, _, _) in enumerate(BRANCHES, start=1):
            code[(brand == br) & (size <= mx)] = i
        return pa.table({"p_partkey": b.column("p_partkey"), "branch": pa.array(code)})

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(p_f, batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        dc = _cents(b.column("l_discount"))
        rev = _cents(b.column("l_extendedprice")) * (100 - dc)
        qty = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "p_partkey": b.column("l_partkey"),
                "rev": pa.array(rev),
                "qty": pa.array(qty),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    ).map_batches(li_f, batch_format="pyarrow")
    att = attach_lookup(
        li, part, on="p_partkey",
        left_cols={"rev": pa.int64(), "qty": pa.int64()},
        value_cols={"branch": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )

    def partial(b: pa.Table) -> pa.Table:
        br = b.column("branch").to_numpy(zero_copy_only=False)
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(b), bool)
        for i, (_, _, lo, hi) in enumerate(BRANCHES, start=1):
            keep |= (br == i) & (qty >= lo) & (qty <= hi)
        return pa.table(
            {"s": pa.array([int(rev[keep].sum())], type=pa.int64())}
        )

    total = int(att.map_batches(partial, batch_format="pyarrow").sum("s"))
    return pa.table(
        {"revenue": pa.array([total / 10000.0], type=pa.float64())}
    )


def q_ship_delay_priority(sf_dir: str):
    """TPC-H Q12 shape ("shipping modes and order priority", adapted to
    the shipped columns: no l_shipmode/commitdate/receiptdate, so the
    class attribute is the order->ship latency — 'late' when the line
    shipped more than 90 days after the order, else 'quick'): per class,
    how many lines belong to high-priority (1-URGENT / 2-HIGH) vs
    low-priority orders. Shape: scanner-filtered 1997 fact scan, the order
    dimension folded to TWO int64 columns (epoch-day + priority bit)
    before the thresholded lookup attaches it, per-batch 2x2 bincount
    partials, ONE 4-scalar Dataset aggregate — O(1) on the driver.
    -> (ship_class, high_line_count, low_line_count), 2 rows."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup

    d0 = pa.scalar(np.datetime64("1997-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1998-01-01", "us").item(), type=pa.timestamp("us"))

    def o_f(b: pa.Table) -> pa.Table:
        pri = b.column("o_orderpriority")
        high = pc.or_(
            pc.equal(pri, pa.scalar("1-URGENT")), pc.equal(pri, pa.scalar("2-HIGH"))
        ).to_numpy(zero_copy_only=False)
        odays = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "odays": pa.array(odays),
                "high": pa.array(high.astype(np.int64)),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_f, batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), d0),
                    pc.less(b.column("l_shipdate"), d1))
        )
        sdays = (
            t.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {"o_orderkey": t.column("l_orderkey"), "sdays": pa.array(sdays)}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= d0) & (pc.field("l_shipdate") < d1),
    ).map_batches(li_f, batch_format="pyarrow")
    att = attach_lookup(
        li, orders, on="o_orderkey",
        left_cols={"sdays": pa.int64()},
        value_cols={"odays": pa.int64(), "high": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        late = (
            b.column("sdays").to_numpy(zero_copy_only=False)
            - b.column("odays").to_numpy(zero_copy_only=False)
        ) > 90
        high = b.column("high").to_numpy(zero_copy_only=False).astype(bool)
        c = np.bincount(2 * late.astype(np.int64) + high, minlength=4)
        return pa.table(
            {
                "qh": pa.array([int(c[1])], type=pa.int64()),
                "ql": pa.array([int(c[0])], type=pa.int64()),
                "lh": pa.array([int(c[3])], type=pa.int64()),
                "ll": pa.array([int(c[2])], type=pa.int64()),
            }
        )

    s = att.map_batches(partial, batch_format="pyarrow").sum(
        ["qh", "ql", "lh", "ll"]
    )
    return pa.table(
        {
            "ship_class": pa.array(["late", "quick"]),
            "high_line_count": pa.array(
                [int(s["sum(lh)"]), int(s["sum(qh)"])], type=pa.int64()
            ),
            "low_line_count": pa.array(
                [int(s["sum(ll)"]), int(s["sum(ql)"])], type=pa.int64()
            ),
        }
    )


def q_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape ("potential part promotion", adapted: no partsupp
    availability column, so 'excess' is a fixed shipped-quantity bar):
    suppliers who shipped more than 45 units of some 'small%'-named part
    during 1997, with their nation — the nested-semi-join pyramid. Shape:
    the part-name filter broadcast as a distinct-key SEMI-join onto the
    scanner-filtered fact scan (zero shuffles), per-batch (supp, part)
    qty pre-combine, ONE hash(supp) bucket groupby (a supplier's pairs
    colocate, so the per-pair sums and the per-supplier DISTINCT are both
    global), then supplier + nation names attach via thresholded lookups.
    -> (s_suppkey, s_name, n_name)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, semi_join
    from raylink.util import splitmix64

    B = np.uint64(64)
    d0 = pa.scalar(np.datetime64("1997-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1998-01-01", "us").item(), type=pa.timestamp("us"))

    small = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda b: pa.table(
            {"l_partkey": b.filter(
                pc.starts_with(b.column("p_name"), "small")
            ).column("p_partkey")}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), d0),
                    pc.less(b.column("l_shipdate"), d1))
        )
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = np.rint(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        # per-batch (supp, part) qty pre-combine
        order = np.lexsort((pk, sk))
        sk, pk, qty = sk[order], pk[order], qty[order]
        first = np.ones(len(sk), bool)
        first[1:] = (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])
        starts = np.flatnonzero(first)
        qsum = np.add.reduceat(qty, starts) if len(sk) else qty[:0]
        return pa.table(
            {
                "l_partkey": pa.array(pk[starts]),
                "skey": pa.array(sk[starts]),
                "qty": pa.array(qsum),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") >= d0) & (pc.field("l_shipdate") < d1),
    ).map_batches(li_f, batch_format="pyarrow")
    matched = semi_join(
        li, small, on="l_partkey",
        left_cols={"skey": pa.int64(), "qty": pa.int64()},
        n_key_rows=_parquet_rows(sf_dir, "part"),
    )

    def bucket(b: pa.Table) -> pa.Table:
        sk = b.column("skey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "sb", pa.array((splitmix64(sk.astype(np.uint64)) % B).astype(np.int32))
        )

    def winners(g: pa.Table) -> pa.Table:
        sk = g.column("skey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = g.column("qty").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, sk))
        sk, pk, qty = sk[order], pk[order], qty[order]
        first = np.ones(len(sk), bool)
        first[1:] = (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])
        starts = np.flatnonzero(first)
        qsum = np.add.reduceat(qty, starts) if len(sk) else qty[:0]
        hits = np.unique(sk[starts][qsum > 45])
        return pa.table({"s_suppkey": pa.array(hits)})

    supps = (
        matched.map_batches(bucket, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(winners, batch_format="pyarrow")
    )
    supplier = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).map_batches(
        lambda b: b.rename_columns(["s_suppkey", "s_name", "n_nationkey"]),
        batch_format="pyarrow",
    )
    named = attach_lookup(
        supps, supplier, on="s_suppkey",
        left_cols={},
        value_cols={"s_name": pa.string(), "n_nationkey": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    out = attach_lookup(
        named, nation, on="n_nationkey",
        left_cols={"s_suppkey": pa.int64(), "s_name": pa.string()},
        value_cols={"n_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "nation"),
    )
    return out.map_batches(
        lambda b: b.select(["s_suppkey", "s_name", "n_name"]),
        batch_format="pyarrow",
    )


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape ("suppliers who kept orders waiting", adapted to
    the synthetic schema: no commit/receipt dates, so late :=
    l_shipdate > o_orderdate + 90 days): for finished ('F') orders with
    >= 2 distinct suppliers where EXACTLY ONE supplier shipped late,
    charge that supplier one wait; report (s_name, n_name, numwait) for
    suppliers in region 0, top 100 by (numwait DESC, s_name).

    Shape: both fact tables hash-bucketed by orderkey and COGROUPED in one
    shuffle (orders rows ride tagged alongside lineitem rows — no separate
    hash-join pass); per-bucket vectorized per-order distinct-supplier /
    late-supplier analysis emits one credit row per qualifying order;
    ``bucketed_sum`` per supplier; nation+region names attached from the
    broadcast-sized dimension tables; distributed sort + limit 100."""
    import ray
    import ray.data as rd

    from raylink.join import bucketed_sum
    from raylink.util import splitmix64

    NB = np.uint64(64)
    LATE_US = np.int64(90 * 86400) * np.int64(1_000_000)

    def ord_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = b.filter(pc.equal(b.column("o_orderstatus"), "F"))
        ok = f.column("o_orderkey").to_numpy(zero_copy_only=False)
        od = f.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "bkt": pa.array(
                    (splitmix64(ok.astype(np.uint64)) % NB).astype(np.int32)
                ),
                "okey": pa.array(ok),
                "a": pa.array(od),  # order date (us) on order rows
                "b": pa.array(np.full(len(ok), -1, dtype=np.int64)),
            }
        )

    def li_rows(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        sh = b.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (splitmix64(ok.astype(np.uint64)) % NB).astype(np.int32)
                ),
                "okey": pa.array(ok),
                "a": pa.array(sh),  # ship date (us) on lineitem rows
                "b": pa.array(sk.astype(np.int64)),  # suppkey >= 0 tags li
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_rows, batch_format="pyarrow")

    def per_order(group: pa.Table) -> pa.Table:
        ok = group.column("okey").to_numpy(zero_copy_only=False)
        a = group.column("a").to_numpy(zero_copy_only=False)
        sk = group.column("b").to_numpy(zero_copy_only=False)
        is_ord = sk < 0
        # order-date lookup for this bucket's 'F' orders
        o_keys = ok[is_ord]
        o_sort = np.argsort(o_keys, kind="stable")
        o_keys = o_keys[o_sort]
        o_dates = a[is_ord][o_sort]
        lk, ls, lsk = ok[~is_ord], a[~is_ord], sk[~is_ord]
        if len(o_keys) == 0 or len(lk) == 0:
            return pa.table({"skey": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        pos = np.searchsorted(o_keys, lk)
        hit = (pos < len(o_keys)) & (
            o_keys[np.minimum(pos, len(o_keys) - 1)] == lk
        )
        lk, ls, lsk, pos = lk[hit], ls[hit], lsk[hit], pos[hit]
        if len(lk) == 0:
            return pa.table({"skey": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        late = ls > o_dates[pos] + LATE_US
        # distinct (order, supplier) pairs with any-late flag
        order_ = np.lexsort((lsk, lk))
        lk, lsk, late = lk[order_], lsk[order_], late[order_]
        new = np.r_[True, (lk[1:] != lk[:-1]) | (lsk[1:] != lsk[:-1])]
        seg = np.cumsum(new) - 1
        p_ok = lk[new]
        p_sk = lsk[new]
        p_late = np.zeros(seg[-1] + 1, dtype=bool)
        np.logical_or.at(p_late, seg, late)
        # per order: distinct suppliers + distinct late suppliers
        onew = np.r_[True, p_ok[1:] != p_ok[:-1]]
        oseg = np.cumsum(onew) - 1
        n_ord = oseg[-1] + 1
        ns = np.bincount(oseg, minlength=n_ord)
        nl = np.bincount(oseg, weights=p_late.astype(np.int64),
                         minlength=n_ord).astype(np.int64)
        qual = (ns >= 2) & (nl == 1)
        credit = qual[oseg] & p_late
        w_sk = p_sk[credit]
        uk, cnt = np.unique(w_sk, return_counts=True)
        return pa.table({"skey": pa.array(uk),
                         "w": pa.array(cnt.astype(np.int64))})

    credits = (
        orders.union(li).groupby("bkt").map_groups(
            per_order, batch_format="pyarrow"
        )
    )
    waits = bucketed_sum(credits, key="skey", val="w", out_val="numwait")

    # region-0 supplier dimension (broadcast-sized: 10k rows/SF)
    import pyarrow.parquet as pq

    st = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nt = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    nk = nt.column("n_nationkey").to_numpy(zero_copy_only=False)
    nr = nt.column("n_regionkey").to_numpy(zero_copy_only=False)
    nn = np.asarray(nt.column("n_name").to_pylist(), dtype=object)
    n_sort = np.argsort(nk, kind="stable")
    nk, nr, nn = nk[n_sort], nr[n_sort], nn[n_sort]
    sk_ = st.column("s_suppkey").to_numpy(zero_copy_only=False)
    snk = st.column("s_nationkey").to_numpy(zero_copy_only=False)
    sn = np.asarray(st.column("s_name").to_pylist(), dtype=object)
    npos = np.searchsorted(nk, snk)
    keep = nr[npos] == 0
    s_sort = np.argsort(sk_[keep], kind="stable")
    dim_keys = sk_[keep][s_sort]
    dim_name = sn[keep][s_sort]
    dim_nation = nn[npos[keep]][s_sort]
    dim_ref = ray.put((dim_keys, dim_name, dim_nation))

    def attach(b: pa.Table) -> pa.Table:
        dk, dn, dna = ray.get(dim_ref)
        sk2 = b.column("skey").to_numpy(zero_copy_only=False)
        w = b.column("numwait").to_numpy(zero_copy_only=False)
        if len(dk) == 0:
            hit = np.zeros(len(sk2), dtype=bool)
            pos2 = np.zeros(len(sk2), dtype=np.int64)
        else:
            pos2 = np.searchsorted(dk, sk2)
            hit = (pos2 < len(dk)) & (
                dk[np.minimum(pos2, len(dk) - 1)] == sk2
            )
        pos2 = pos2[hit]
        return pa.table(
            {
                "s_name": pa.array(dn[pos2].tolist(), type=pa.string()),
                "n_name": pa.array(dna[pos2].tolist(), type=pa.string()),
                "numwait": pa.array(w[hit].astype(np.int64)),
            }
        )

    out = waits.map_batches(attach, batch_format="pyarrow")
    return out.sort(["numwait", "s_name"], descending=[True, False]).limit(100)
