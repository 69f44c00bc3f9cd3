from __future__ import annotations

from raylink.ops.textstats import (  # noqa: F401
    CJK_PATTERN,
    STOP_DE,
    STOP_EN,
    STOP_ES,
    STOP_FR,
    TOKEN_PATTERN,
    WORD_PATTERN,
)

from raylink.oracles_sql._common import (  # noqa: F401
    P,
    GRAPH_CTES,
    CC_CTE,
    SG_CTE,
    _STOP,
    PAGE_TEXT_CTES,
    _M64,
    _M32,
    _with,
    _pagerank_ctes,
    _lpa_label_ctes,
    _mul64,
    _add64,
    _sm64,
    _fnv64,
    _perceptron_ctes,
    _matching_ctes,
    _bpe_ctes,
    _kmeans_ctes,
)


def pricing_summary_sql() -> str:
    return """
WITH f AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS ec,
         CAST(ROUND(l_discount*100) AS BIGINT) AS dc,
         CAST(ROUND(l_tax*100) AS BIGINT) AS tc,
         l_returnflag, l_linestatus
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-01-01'
)
SELECT l_returnflag, l_linestatus,
       SUM(q)::DOUBLE AS sum_qty,
       SUM(ec)::DOUBLE / 100.0 AS sum_base_price,
       SUM(ec*(100-dc))::DOUBLE / 10000.0 AS sum_disc_price,
       SUM(ec*(100-dc)*(100+tc))::DOUBLE / 1000000.0 AS sum_charge,
       SUM(q)::DOUBLE / COUNT(*) AS avg_qty,
       SUM(ec)::DOUBLE / 100.0 / COUNT(*) AS avg_price,
       SUM(dc)::DOUBLE / 100.0 / COUNT(*) AS avg_disc,
       COUNT(*)::BIGINT AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def shipping_priority_sql() -> str:
    return """
WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
o AS (
  SELECT o_orderkey, o_orderdate FROM orders
  JOIN c ON o_custkey = c_custkey
  WHERE o_orderdate < TIMESTAMP '2000-03-15'
),
l AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev_i
  FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-03-15'
)
SELECT l.l_orderkey,
       SUM(l.rev_i)::DOUBLE / 10000.0 AS revenue,
       o.o_orderdate
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY SUM(l.rev_i) DESC, l.l_orderkey
LIMIT 10"""


def nation_revenue_sql() -> str:
    return """
WITH l AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev_i
  FROM lineitem
)
SELECT n.n_name,
       SUM(l.rev_i)::DOUBLE / 10000.0 AS revenue
FROM l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY SUM(l.rev_i) DESC, n.n_name"""


def order_priority_sql() -> str:
    """Mirror of q_order_priority (TPC-H Q4 shape, EXISTS semi-join)."""
    return """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY o_orderpriority"""


def customers_no_urgent_sql() -> str:
    """Mirror of q_customers_no_urgent (NOT EXISTS anti-join)."""
    return """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')"""


def customer_distribution_sql() -> str:
    """Mirrors queries.q_customer_distribution (TPC-H Q13 shape): LEFT
    OUTER JOIN customer x filtered order counts, histogram over the count
    including the zero bin."""
    return """
WITH oc AS (SELECT o_custkey, count(*) AS c_count FROM orders
            WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey)
SELECT c_count::BIGINT AS c_count, count(*)::BIGINT AS custdist
FROM (SELECT COALESCE(oc.c_count, 0) AS c_count
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey)
GROUP BY 1"""


def big_orders_sql() -> str:
    """TPC-H Q18 shape (queries.q_big_orders): total_price is the exact
    cents integer divided once by 100.0 (identical IEEE op on both sides);
    the HAVING threshold and the (price DESC, orderkey) top-100 rule match
    the engine's integer sort keys."""
    return """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 300)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice * 100)::BIGINT / 100.0 AS total_price,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY ROUND(o.o_totalprice * 100)::BIGINT DESC, o.o_orderkey
LIMIT 100"""


def returned_revenue_sql() -> str:
    """TPC-H Q10 shape (queries.q_returned_revenue): integer-scaled
    (cents x discount-percent) revenue — exact int64 sums, one final IEEE
    division by 10000.0; deterministic top-20 by (revenue DESC, custkey)."""
    return """
WITH rev AS (
  SELECT o.o_custkey AS ckey,
         SUM(ROUND(l.l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT AS r
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY o.o_custkey),
top AS (SELECT ckey, r FROM rev ORDER BY r DESC, ckey LIMIT 20)
SELECT c.c_custkey, c.c_name, c.c_acctbal, t.r / 10000.0 AS revenue
FROM top t JOIN customer c ON c.c_custkey = t.ckey"""


def part_profit_sql() -> str:
    """TPC-H Q9 shape (queries.q_part_profit): PROMO-part cents revenue per
    (supplier nation, ship year); integer sums, one division by 10000.0."""
    return """
SELECT n.n_name, year(l.l_shipdate)::BIGINT AS yr,
       SUM(ROUND(l.l_extendedprice * 100)::BIGINT
           * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT / 10000.0
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2"""


def brand_suppliers_sql() -> str:
    """TPC-H Q16 shape (queries.q_brand_suppliers): distinct suppliers per
    brand off the fact table."""
    return """
SELECT p.p_brand, count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand"""


def forecast_revenue_sql() -> str:
    """TPC-H Q6 shape (queries.q_forecast_revenue): integer cents x
    discount-percent sum, one division by 10000.0."""
    return """
SELECT SUM(ROUND(l_extendedprice * 100)::BIGINT
           * ROUND(l_discount * 100)::BIGINT)::BIGINT / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND ROUND(l_discount * 100)::BIGINT BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24"""


def nation_trade_sql() -> str:
    """TPC-H Q7 shape (queries.q_nation_trade): cross-nation cents revenue
    per (supplier nation, customer nation, ship year); integer sums, one
    division by 10000.0."""
    return """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS yr,
       SUM(ROUND(l.l_extendedprice * 100)::BIGINT
           * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT / 10000.0
         AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE s.s_nationkey <> c.c_nationkey
GROUP BY 1, 2, 3"""


def market_share_sql(region_name: str = "ASIA",
                     part_type: str = "STANDARD") -> str:
    """TPC-H Q8 shape (queries.q_market_share): target nation = the
    region's minimum nationkey; share = int64 num / int64 den, one double
    division per year (int->double conversion rounds identically on both
    sides)."""
    return f"""
WITH tgt AS (
  SELECT MIN(n_nationkey) AS k FROM nation n
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{region_name}')
SELECT year(o.o_orderdate)::BIGINT AS yr,
       SUM(CASE WHEN s.s_nationkey = (SELECT k FROM tgt)
           THEN ROUND(l.l_extendedprice * 100)::BIGINT
                * (100 - ROUND(l.l_discount * 100)::BIGINT) ELSE 0
           END)::BIGINT
       / SUM(ROUND(l.l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT
         AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{part_type}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region rc ON rc.r_regionkey = nc.n_regionkey
WHERE rc.r_name = '{region_name}'
GROUP BY 1"""


def promo_revenue_sql() -> str:
    """TPC-H Q14 shape (queries.q_promo_revenue): per ship (year, month),
    100.0 * (num / den) with int64 cents sums — the parenthesized int/int
    double division first, then the scale, matching the engine's op
    order."""
    return """
SELECT year(l_shipdate)::BIGINT AS yr, month(l_shipdate)::BIGINT AS mo,
       100.0 * (
         SUM(CASE WHEN p.p_type = 'PROMO'
             THEN ROUND(l.l_extendedprice * 100)::BIGINT
                  * (100 - ROUND(l.l_discount * 100)::BIGINT) ELSE 0
             END)::BIGINT
         / SUM(ROUND(l.l_extendedprice * 100)::BIGINT
               * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT
       ) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1, 2"""


def top_supplier_sql() -> str:
    """TPC-H Q15 shape (queries.q_top_supplier): max 1996Q1 cents revenue
    per supplier, ties surface; one division by 10000.0."""
    return """
WITH sr AS (
  SELECT l_suppkey,
         SUM(ROUND(l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l_discount * 100)::BIGINT))::BIGINT AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey, rev / 10000.0 AS total_revenue
FROM sr WHERE rev = (SELECT MAX(rev) FROM sr)"""


def small_qty_revenue_sql() -> str:
    """TPC-H Q17 shape (queries.q_small_qty_revenue): the 20%-of-average
    quantity threshold evaluated in exact integers (5*qty*cnt < sumq —
    quantities are whole units), then cents/100.0/7.0 per part."""
    return """
WITH pq AS (
  SELECT l_partkey,
         SUM(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sumq,
         COUNT(*)::BIGINT AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT l.l_partkey AS p_partkey,
       (SUM(ROUND(l.l_extendedprice * 100)::BIGINT)::BIGINT / 100.0) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * pq.cnt < pq.sumq
GROUP BY 1"""


def part_revenue_share_sql() -> str:
    """TPC-H Q11 shape (queries.q_part_revenue_share): HAVING against a
    global aggregate, threshold 1.25/n_parts evaluated in exact integers
    (4 * rev * n_parts > 5 * total)."""
    return """
WITH prs AS (
  SELECT l_partkey,
         SUM(ROUND(l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l_discount * 100)::BIGINT))::BIGINT AS rev
  FROM lineitem GROUP BY 1),
prt AS (SELECT SUM(rev)::BIGINT AS t,
               (SELECT COUNT(*) FROM part)::BIGINT AS np
        FROM prs)
SELECT p.l_partkey AS p_partkey, p.rev / 10000.0 AS part_revenue
FROM prs p, prt
WHERE 4 * p.rev * prt.np > 5 * prt.t"""


def dormant_customers_sql() -> str:
    """TPC-H Q22 shape (queries.q_dormant_customers): above-average
    positive balance in exact integers (bal * n > sum), NOT EXISTS
    recent (>= 2001-01-01) orders, per-nation count + total."""
    return """
WITH dcp AS (SELECT SUM(ROUND(c_acctbal * 100)::BIGINT)::BIGINT AS s,
                    COUNT(*)::BIGINT AS n
             FROM customer WHERE ROUND(c_acctbal * 100)::BIGINT > 0),
dcd AS (SELECT c_nationkey, ROUND(c_acctbal * 100)::BIGINT AS bal
        FROM customer c, dcp
        WHERE ROUND(c_acctbal * 100)::BIGINT * dcp.n > dcp.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= DATE '2001-01-01'))
SELECT c_nationkey, COUNT(*)::BIGINT AS numcust,
       SUM(bal)::BIGINT / 100.0 AS totacctbal
FROM dcd GROUP BY 1"""


def cheapest_supplier_sql() -> str:
    """TPC-H Q2 shape (queries.q_cheapest_supplier): per part the
    minimum-price line's supplier, ties to the smallest suppkey."""
    return """
WITH csm AS (
  SELECT l_partkey, MIN(ROUND(l_extendedprice * 100)::BIGINT) AS mc
  FROM lineitem GROUP BY 1),
csw AS (
  SELECT l.l_partkey, m.mc, MIN(l.l_suppkey) AS sk
  FROM lineitem l
  JOIN csm m ON m.l_partkey = l.l_partkey
            AND ROUND(l.l_extendedprice * 100)::BIGINT = m.mc
  GROUP BY 1, 2)
SELECT w.l_partkey AS p_partkey, w.mc / 100.0 AS min_price,
       w.sk AS s_suppkey, s.s_name AS s_name
FROM csw w JOIN supplier s ON s.s_suppkey = w.sk"""


def sole_supplier_sql() -> str:
    """TPC-H Q21 shape (queries.q_sole_supplier): suppliers who were the
    sole supplier on multi-line orders, counted per supplier."""
    return """
WITH sso AS (
  SELECT l_orderkey, MIN(l_suppkey) AS sk
  FROM lineitem GROUP BY 1
  HAVING COUNT(*) >= 2 AND COUNT(DISTINCT l_suppkey) = 1)
SELECT s.s_suppkey AS s_suppkey, COUNT(*)::BIGINT AS numwait,
       s.s_name AS s_name
FROM sso JOIN supplier s ON s.s_suppkey = sso.sk
GROUP BY 1, 3"""


def disjunctive_revenue_sql() -> str:
    """TPC-H Q19 shape (queries.q_disjunctive_revenue): OR of three
    (brand, size, quantity-window) branches, integer cents arithmetic."""
    return """
SELECT COALESCE(SUM(ROUND(l.l_extendedprice * 100)::BIGINT
                    * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT,
                0) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size <= 15
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size <= 25
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size <= 35
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)"""


def ship_delay_priority_sql() -> str:
    """TPC-H Q12 shape (queries.q_ship_delay_priority): lines shipped in
    1997 classed by order->ship latency (late = >90 days), counted by
    order-priority class."""
    return """
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
            THEN 'late' ELSE 'quick' END AS ship_class,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
GROUP BY 1"""


def excess_suppliers_sql() -> str:
    """TPC-H Q20 shape (queries.q_excess_suppliers): suppliers who shipped
    > 45 units of a 'small%'-named part during 1997, with nation."""
    return """
WITH xsp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
xsq AS (SELECT l_suppkey, l_partkey,
               SUM(CAST(round(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM xsp)
        GROUP BY 1, 2),
xss AS (SELECT DISTINCT l_suppkey FROM xsq WHERE qty > 45)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, n.n_name AS n_name
FROM xss
JOIN supplier s ON s.s_suppkey = xss.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey"""


def waiting_suppliers_sql() -> str:
    """Mirrors queries.q_waiting_suppliers (TPC-H Q21 adapted: late :=
    l_shipdate > o_orderdate + 90 days; finished orders; exactly one late
    supplier among >= 2 distinct suppliers; region-0 suppliers; top 100 by
    numwait DESC, s_name — unique supplier names make the cut
    deterministic)."""
    return """
WITH f AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
l AS (
  SELECT li.l_orderkey AS okey, li.l_suppkey AS skey,
         (li.l_shipdate > f.o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem li JOIN f ON li.l_orderkey = f.o_orderkey),
ps AS (SELECT okey, skey, bool_or(late) AS late FROM l GROUP BY okey, skey),
po AS (SELECT okey, count(*) AS ns,
              count(*) FILTER (WHERE late) AS nl
       FROM ps GROUP BY okey),
q AS (SELECT ps.skey FROM ps JOIN po ON po.okey = ps.okey
      WHERE ps.late AND po.ns >= 2 AND po.nl = 1),
agg AS (SELECT skey, count(*)::BIGINT AS numwait FROM q GROUP BY skey)
SELECT s.s_name, n.n_name, agg.numwait
FROM agg
JOIN supplier s ON s.s_suppkey = agg.skey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 0
ORDER BY agg.numwait DESC, s.s_name
LIMIT 100"""
