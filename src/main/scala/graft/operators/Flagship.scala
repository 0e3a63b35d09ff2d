package graft.operators

import graft.{QueryModule, Tables}
import graft.Tables.dec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M0 flagship: TPC-H-Q1-shaped pricing summary — scan → filter → project →
  * hash aggregate (partial+final, map-side combine free from Catalyst) →
  * sort. One shuffle total; aggregates accumulate in DECIMAL(38,4) for
  * cross-engine determinism and surface as DOUBLE (SURVEY.md §2.2 contract).
  */
object Flagship extends QueryModule {

  def q00(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity")))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q03: TPC-H Q3 (shipping priority) on the synthetic tables —
    * customer ⋈ orders ⋈ lineitem with date bracketing, revenue top-10.
    * The optimizer's join-order + pushdown showcase: both date filters
    * and the segment filter reach their scans; customer⋈orders shuffles
    * on custkey, then orders⋈lineitem on orderkey — the exact two
    * exchanges a 100 TB run needs (customer is NOT broadcast: at scale
    * it's tens of GB; AQE may still choose to at test SF). Revenue is
    * decimal-pinned so the DESC sort is on bit-exact doubles; top-10 ties
    * break on l_orderkey. (o_shippriority doesn't exist in the synthetic
    * schema; o_orderpriority carries the same demonstration role.) */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp_ntz")
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .groupBy("l_orderkey", "order_date", "o_orderpriority")
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q05: TPC-H Q5 (local-supplier volume) — the 6-way join: region →
    * nation → (customer ⋈ orders ⋈ lineitem ⋈ supplier) with the
    * colocation predicate c_nationkey = s_nationkey. nation/region are
    * broadcast (5/25 rows at any scale); the fact chain shuffles on its
    * keys. This is the query shape that proves join reordering + dim
    * broadcast + pushdown compose. */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val y0 = lit("1996-01-01").cast("timestamp_ntz")
    val y1 = lit("1997-01-01").cast("timestamp_ntz")
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q06: TPC-H Q6 (forecast revenue) — the pure scan query: three
    * range predicates, no join, one global aggregate. All three filters
    * push into the parquet scan (PlanSpec-style PushedFilters); at
    * 100 TB this is an I/O-bound embarrassingly parallel pass whose
    * wall-clock is the scan, which is the point. */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val y0 = lit("1996-01-01").cast("timestamp_ntz")
    val y1 = lit("1997-01-01").cast("timestamp_ntz")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= y0 && col("l_shipdate") < y1
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice") * col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** q18: TPC-H Q18 (large-volume customer) — the agg-derived IN-subquery
    * torture. Written as SQL so CATALYST does the decorrelation: the
    * HAVING-filtered subquery must rewrite to a left-semi join against
    * the aggregated lineitem (RewritePredicateSubquery), never a per-row
    * subquery execution — PlanSpec pins `Join LeftSemi` in the optimized
    * plan. At 100 TB both the semi-join build side and the outer join
    * chain shuffle once on orderkey and reuse the partitioning. Quantity
    * sums accumulate in DECIMAL(38,4) (the cross-engine contract). */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_q18_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_q18_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q18_lineitem")
    spark.sql(
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM graft_q18_customer
        |JOIN graft_q18_orders ON c_custkey = o_custkey
        |JOIN graft_q18_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM graft_q18_lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
        |         o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  /** q21: TPC-H Q21 (suppliers who kept orders waiting) — the
    * EXISTS + NOT EXISTS self-join chain. The synthetic lineitem has no
    * receipt/commit dates, so "late" is the row-local stand-in
    * l_tax > l_discount; the correlation SHAPE is Q21's exactly: an
    * EXISTS (another supplier touched the order) and a NOT EXISTS (no
    * OTHER supplier was late on it), both correlated on l_orderkey.
    * Catalyst must decorrelate to one left-semi and one left-anti join
    * on orderkey (PlanSpec pins both); all three lineitem sides shuffle
    * on the same key — no per-row subquery, no quadratic re-scan. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_q21_supplier")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_q21_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q21_lineitem")
    spark.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM graft_q21_supplier
        |JOIN graft_q21_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN graft_q21_orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_tax > l1.l_discount
        |  AND EXISTS (
        |    SELECT 1 FROM graft_q21_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM graft_q21_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_tax > l3.l_discount)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin)
  }

  // ---- decorrelation suite (q02/q04/q17/q20/q22) -------------------------
  //
  // One SQL body per query, parameterized on the table-name prefix ("" for
  // the DuckDB oracle, "graft_tpch_" for the Spark temp views) and the
  // timestamp-literal keyword (Spark reads the parquet millis columns as
  // TIMESTAMP_NTZ; DuckDB's plain TIMESTAMP is already ntz) — so both
  // engines run the LITERALLY identical query shape and the hash gate
  // exercises Catalyst's decorrelation, not a transcription.

  private def tpchViews(spark: SparkSession, dir: String): Unit = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_tpch_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_tpch_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_tpch_lineitem")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_tpch_supplier")
    Tables.part(spark, dir).createOrReplaceTempView("graft_tpch_part")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_tpch_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_tpch_region")
  }

  /** q02: TPC-H Q2's correlated-scalar-MIN shape (the synthetic schema has
    * no partsupp, so lineitem plays the supply relation): for each small
    * part, the supplier rows that shipped it at the corpus-minimum price.
    * Catalyst must rewrite the correlated MIN subquery to an aggregate
    * joined back on partkey (RewriteCorrelatedScalarSubquery) — never a
    * per-outer-row rescan; PlanSpec pins zero surviving subquery
    * expressions. At 100 TB both sides shuffle once on partkey and the
    * min-aggregate is partial+final. Double equality on the min is exact:
    * both engines MIN over the identical parquet doubles. */
  private def q02Sql(p: String, ts: String): String =
    s"""SELECT DISTINCT s_name, s_acctbal, p_partkey, p_name,
       |       l_extendedprice AS min_price
       |FROM ${p}part
       |JOIN ${p}lineitem ON p_partkey = l_partkey
       |JOIN ${p}supplier ON s_suppkey = l_suppkey
       |WHERE p_size < 10
       |  AND l_extendedprice = (
       |    SELECT MIN(l2.l_extendedprice) FROM ${p}lineitem l2
       |    WHERE l2.l_partkey = p_partkey)
       |ORDER BY s_acctbal DESC, p_partkey, s_name, min_price
       |LIMIT 100""".stripMargin

  /** q04: TPC-H Q4 (order-priority checking) — the plain-EXISTS shape:
    * orders in a quarter with at least one "late" line ("late" = the
    * row-local l_tax > l_discount stand-in, as in q21), counted by
    * priority. Decorrelates to one left-semi join on orderkey; the
    * lineitem side aggregates nothing, so the semi join IS the query. */
  private def q04Sql(p: String, ts: String): String =
    s"""SELECT o_orderpriority, COUNT(*) AS order_count
       |FROM ${p}orders
       |WHERE o_orderdate >= $ts '1996-01-01'
       |  AND o_orderdate < $ts '1996-04-01'
       |  AND EXISTS (
       |    SELECT 1 FROM ${p}lineitem
       |    WHERE l_orderkey = o_orderkey AND l_tax > l_discount)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** q17: TPC-H Q17 (small-quantity-order revenue) — the correlated-scalar-
    * AVG shape: brand lines whose quantity is under a fifth of that part's
    * corpus-wide average. Written as `l_quantity * 5 < AVG` (exact: the
    * synthetic quantities are integer-valued doubles, so the AVG's sum is
    * exact in IEEE double in both engines and the one division is the same
    * op). Revenue accumulates DECIMAL(38,4) and surfaces as DOUBLE/7.0. */
  private def q17Sql(p: String, ts: String): String =
    s"""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
       |            / 7.0 AS DOUBLE) AS avg_yearly,
       |       COUNT(*) AS n_small
       |FROM ${p}lineitem
       |JOIN ${p}part ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#7'
       |  AND l_quantity * 5 < (
       |    SELECT AVG(l2.l_quantity) FROM ${p}lineitem l2
       |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** q20: TPC-H Q20's nested-IN chain (suppliers who shipped meaningful
    * volume of a named part family in a year): an IN whose subquery GROUPs
    * with a HAVING, itself containing another IN. Catalyst flattens both
    * INs to left-semi joins — part→lineitem semi on partkey, then the
    * aggregated (suppkey,partkey) groups semi into supplier on suppkey —
    * with no ListQuery survivor (PlanSpec). All shuffles are on the join
    * keys; nothing re-executes per outer row. */
  private def q20Sql(p: String, ts: String): String =
    s"""SELECT s_suppkey, s_name, s_acctbal
       |FROM ${p}supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM ${p}lineitem
       |  WHERE l_partkey IN (
       |      SELECT p_partkey FROM ${p}part WHERE p_name LIKE '%ring%')
       |    AND l_shipdate >= $ts '1996-01-01'
       |    AND l_shipdate < $ts '1997-01-01'
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 50)
       |ORDER BY s_suppkey""".stripMargin

  /** q22: TPC-H Q22 (global-sales opportunity) — the uncorrelated-scalar +
    * NOT-EXISTS composite: above-average-balance customers dormant since
    * mid-2000, grouped by the last two digits of the customer name (the
    * cntrycode stand-in). The average-balance comparison is written
    * bal*COUNT > SUM in DECIMAL so it is exact and order-independent in
    * both engines (no double AVG in the predicate). The two scalar
    * subqueries rightly SURVIVE optimization (each executes once and
    * broadcasts — that is the 100 TB plan you want); the NOT EXISTS must
    * decorrelate to a left-anti join on custkey. */
  private def q22Sql(p: String, ts: String): String =
    s"""SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, COUNT(*) AS numcust,
       |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
       |FROM ${p}customer
       |WHERE CAST(c_acctbal AS DECIMAL(38,4))
       |        * (SELECT COUNT(*) FROM ${p}customer c2 WHERE c2.c_acctbal > 0.0)
       |      > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(38,4)))
       |         FROM ${p}customer c2 WHERE c2.c_acctbal > 0.0)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM ${p}orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= $ts '2000-07-01')
       |GROUP BY SUBSTRING(c_name, 17, 2)
       |ORDER BY cntrycode""".stripMargin

  /** q12: TPC-H Q12's shape (shipping modes and order priority) — the
    * two-conditional-sums-over-a-join aggregate. The synthetic lineitem has
    * no l_shipmode, so l_returnflag carries the mode role; the priority
    * CASE pair is Q12's verbatim. One join shuffle on orderkey, then the
    * conditional sums are map-side partial aggregates — at 100 TB the
    * whole query is one exchange plus a 3-row final agg. */
  private def q12Sql(p: String, ts: String): String =
    s"""SELECT l_returnflag AS ship_mode,
       |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM ${p}orders
       |JOIN ${p}lineitem ON o_orderkey = l_orderkey
       |WHERE l_shipdate >= $ts '1996-01-01'
       |  AND l_shipdate < $ts '1997-01-01'
       |GROUP BY l_returnflag
       |ORDER BY ship_mode""".stripMargin

  /** q14: TPC-H Q14 (promo revenue) — the conditional-ratio aggregate.
    * Both branches accumulate DECIMAL(38,4) (ELSE 0 cast to the same type
    * so the unified CASE type is identical in both engines); the ratio is
    * taken AFTER both sums surface as DOUBLE — one IEEE division on
    * bit-identical inputs, never decimal division (whose precision/scale
    * rules differ across engines). Map-side partial sums; zero shuffles
    * beyond the partkey join. */
  private def q14Sql(p: String, ts: String): String =
    s"""SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
       |         THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))
       |         ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
       |       / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
       |                       AS DECIMAL(38,4))) AS DOUBLE)
       |       AS DOUBLE) AS promo_revenue,
       |       COUNT(*) AS n_lines
       |FROM ${p}lineitem
       |JOIN ${p}part ON l_partkey = p_partkey
       |WHERE l_shipdate >= $ts '1996-09-01'
       |  AND l_shipdate < $ts '1996-10-01'""".stripMargin

  /** q16: TPC-H Q16 (parts/supplier relationship) — the NOT-IN torture:
    * a negated membership subquery (suppliers with weak balance stand in
    * for Q16's complaint suppliers; lineitem plays partsupp). NOT IN is
    * null-aware — Catalyst must plan a left-ANTI join whose condition
    * carries the null-check (NAAJ), never a per-row membership probe;
    * PlanSpec pins `Join LeftAnti` with no ListQuery survivor. The
    * COUNT(DISTINCT l_suppkey) expands to the standard two-pass
    * distinct-aggregate — both shuffles on the group keys. */
  private def q16Sql(p: String, ts: String): String =
    s"""SELECT p_brand, p_type, p_size,
       |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM ${p}part
       |JOIN ${p}lineitem ON p_partkey = l_partkey
       |WHERE p_brand <> 'Brand#13'
       |  AND p_type <> 'PROMO'
       |  AND p_size IN (5, 10, 15, 20, 25, 30)
       |  AND l_suppkey NOT IN (
       |    SELECT s_suppkey FROM ${p}supplier WHERE s_acctbal < 2000.0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** q19: TPC-H Q19 (discounted revenue) — the disjunctive-predicate
    * (OR-of-ANDs) join: three brand/size/quantity branches over
    * part ⋈ lineitem. The join itself must stay an EQUI hash join on
    * partkey (PlanSpec pins no nested-loop/cartesian product) with the
    * disjunction evaluated as a codegen'd post-join filter; the
    * branch-local part predicates (brand, size) also exist purely on the
    * part side, so the union bound `p_size <= 15` is checked pushable.
    * At 100 TB the disjunction costs nothing: one partkey shuffle, the
    * filter rides the join's generated code. */
  private def q19Sql(p: String, ts: String): String =
    s"""SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
       |                     AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
       |       COUNT(*) AS n_lines
       |FROM ${p}lineitem
       |JOIN ${p}part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |         AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |         AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       |         AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** q07: TPC-H Q7 (volume shipping) — the two-nation bilateral-flow join:
    * lineitem's supplier nation and order's customer nation constrained to
    * an unordered pair via OR-of-ANDs over two broadcast nation aliases,
    * grouped by (supp_nation, cust_nation, year). Both nation sides are
    * 25-row broadcasts at any scale; the fact chain shuffles once on
    * orderkey and once on custkey — same exchanges Q5 needs. Year is
    * EXTRACTed then CAST BIGINT (Spark yields INT, DuckDB BIGINT — the
    * pin makes the surfaced schema identical). */
  private def q07Sql(p: String, ts: String): String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |       CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       |         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))
       |           AS volume
       |  FROM ${p}supplier
       |  JOIN ${p}lineitem ON s_suppkey = l_suppkey
       |  JOIN ${p}orders ON o_orderkey = l_orderkey
       |  JOIN ${p}customer ON c_custkey = o_custkey
       |  JOIN ${p}nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN ${p}nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_19')
       |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_12'))
       |    AND l_shipdate >= $ts '1996-01-01'
       |    AND l_shipdate < $ts '1998-01-01') shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** q08: TPC-H Q8 (national market share) — the conditional-share-of-total
    * aggregate over the full 8-table join graph (minus partsupp, absent
    * from the synthetic schema): one nation's volume share per order year
    * within a region's market for a part type. Share = DOUBLE ratio of two
    * DECIMAL(38,4) sums (q14's exactness discipline); nation/region are
    * broadcast, the fact chain reuses the q5 exchanges. */
  private def q08Sql(p: String, ts: String): String =
    s"""SELECT o_year,
       |       CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
       |                          ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
       |            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))
       |           AS volume,
       |         n2.n_name AS nation
       |  FROM ${p}part
       |  JOIN ${p}lineitem ON p_partkey = l_partkey
       |  JOIN ${p}supplier ON s_suppkey = l_suppkey
       |  JOIN ${p}orders ON l_orderkey = o_orderkey
       |  JOIN ${p}customer ON o_custkey = c_custkey
       |  JOIN ${p}nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN ${p}region ON n1.n_regionkey = r_regionkey
       |  JOIN ${p}nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'ASIA'
       |    AND p_type = 'ECONOMY'
       |    AND o_orderdate >= $ts '1996-01-01'
       |    AND o_orderdate < $ts '1998-01-01') all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  /** q09: TPC-H Q9 (product-type profit) — profit per supplier nation per
    * year over a part-name LIKE filter. The synthetic schema has no
    * partsupp/ps_supplycost, so cost is proxied by p_retailprice *
    * l_quantity * 0.1 — the SHAPE (5-way join, LIKE-filtered part side,
    * two-key rollup, negative-capable sum) is Q9's. The LIKE filter prunes
    * part before its join (pushed to the scan); amount is computed in
    * IEEE double textually identically in both engines, then accumulated
    * DECIMAL(38,4). */
  private def q09Sql(p: String, ts: String): String =
    s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation,
       |         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |         CAST(l_extendedprice * (1.0 - l_discount)
       |              - p_retailprice * l_quantity * 0.1 AS DECIMAL(38,4))
       |           AS amount
       |  FROM ${p}part
       |  JOIN ${p}lineitem ON p_partkey = l_partkey
       |  JOIN ${p}supplier ON s_suppkey = l_suppkey
       |  JOIN ${p}orders ON o_orderkey = l_orderkey
       |  JOIN ${p}nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%widget%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  /** q10: TPC-H Q10 (returned-item reporting) — quarter of orders, lines
    * restricted to returnflag 'R', revenue per customer, top 20. The
    * canonical "who cost us money" report: one custkey shuffle, one
    * orderkey shuffle, nation broadcast, then a 20-row TakeOrdered —
    * no global sort materializes at any scale. */
  private def q10Sql(p: String, ts: String): String =
    s"""SELECT c_custkey, c_name, $discRevenue AS revenue, c_acctbal, n_name
       |FROM ${p}customer
       |JOIN ${p}orders ON c_custkey = o_custkey
       |JOIN ${p}lineitem ON l_orderkey = o_orderkey
       |JOIN ${p}nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= $ts '1996-01-01'
       |  AND o_orderdate < $ts '1996-04-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** q11: TPC-H Q11 (important stock) — the HAVING-vs-uncorrelated-scalar
    * shape: per-part supply value within a nation group, kept only when it
    * exceeds a fraction of that group's total. lineitem stands in for
    * partsupp (no such table in the synthetic schema); the scalar subquery
    * re-aggregates the SAME filtered join — Catalyst executes it once and
    * broadcasts the threshold into the HAVING filter (it must survive as
    * a scalar-subquery node, q22's discipline, not decorrelate). Fraction
    * compare is DOUBLE-on-DECIMAL-sums: exact inputs, one IEEE multiply. */
  private def q11Sql(p: String, ts: String): String =
    s"""SELECT l_partkey,
       |       CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4)))
       |            AS DOUBLE) AS value
       |FROM ${p}lineitem
       |JOIN ${p}supplier ON s_suppkey = l_suppkey
       |WHERE s_nationkey < 5
       |GROUP BY l_partkey
       |HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4)))
       |            AS DOUBLE) >
       |  (SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4)))
       |               AS DOUBLE) * 0.001
       |   FROM ${p}lineitem
       |   JOIN ${p}supplier ON s_suppkey = l_suppkey
       |   WHERE s_nationkey < 5)
       |ORDER BY value DESC, l_partkey""".stripMargin

  /** q13: TPC-H Q13 (customer order-count distribution) — the
    * outer-join-then-double-aggregate shape: LEFT OUTER customer→orders
    * with a join-side-only predicate (priority stands in for the
    * o_comment NOT LIKE of the original), COUNT(o_orderkey) per customer
    * (NULL-preserving: no-order customers count 0), then the histogram of
    * those counts. The outer join's filter must stay ON the join (pushing
    * it below would turn customers with only-excluded orders into
    * missing rows, not zeros). Two shuffles: custkey join, c_count agg. */
  private def q13Sql(p: String, ts: String): String =
    s"""SELECT c_count, COUNT(*) AS custdist
       |FROM (
       |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
       |  FROM ${p}customer
       |  LEFT OUTER JOIN ${p}orders
       |    ON c_custkey = o_custkey
       |   AND o_orderpriority <> '4-NOT SPECIFIED'
       |  GROUP BY c_custkey) c_orders
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q15: TPC-H Q15 (top supplier) — the view-then-argmax shape: quarterly
    * revenue per supplier (a CTE both engines see identically), joined to
    * supplier and filtered to the MAX via an uncorrelated scalar subquery
    * over the same CTE. The max compare happens on the exact DECIMAL(38,4)
    * sums (ties included, per spec), surfacing as DOUBLE only in the
    * select list. The CTE aggregates once per reference under AQE's
    * exchange reuse; the scalar executes once and broadcasts. */
  private def q15Sql(p: String, ts: String): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |         SUM(CAST(l_extendedprice * (1.0 - l_discount)
       |                  AS DECIMAL(38,4))) AS total_revenue
       |  FROM ${p}lineitem
       |  WHERE l_shipdate >= $ts '1996-01-01'
       |    AND l_shipdate < $ts '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
       |FROM ${p}supplier
       |JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  private def tpchRun(sql: (String, String) => String)
                     (spark: SparkSession, dir: String): DataFrame = {
    tpchViews(spark, dir)
    spark.sql(sql("graft_tpch_", "TIMESTAMP_NTZ"))
  }

  def q02(spark: SparkSession, dir: String): DataFrame = tpchRun(q02Sql)(spark, dir)
  def q04(spark: SparkSession, dir: String): DataFrame = tpchRun(q04Sql)(spark, dir)
  def q07(spark: SparkSession, dir: String): DataFrame = tpchRun(q07Sql)(spark, dir)
  def q08(spark: SparkSession, dir: String): DataFrame = tpchRun(q08Sql)(spark, dir)
  def q09(spark: SparkSession, dir: String): DataFrame = tpchRun(q09Sql)(spark, dir)
  def q10(spark: SparkSession, dir: String): DataFrame = tpchRun(q10Sql)(spark, dir)
  def q11(spark: SparkSession, dir: String): DataFrame = tpchRun(q11Sql)(spark, dir)
  def q13(spark: SparkSession, dir: String): DataFrame = tpchRun(q13Sql)(spark, dir)
  def q15(spark: SparkSession, dir: String): DataFrame = tpchRun(q15Sql)(spark, dir)
  def q12(spark: SparkSession, dir: String): DataFrame = tpchRun(q12Sql)(spark, dir)
  def q14(spark: SparkSession, dir: String): DataFrame = tpchRun(q14Sql)(spark, dir)
  def q16(spark: SparkSession, dir: String): DataFrame = tpchRun(q16Sql)(spark, dir)
  def q17(spark: SparkSession, dir: String): DataFrame = tpchRun(q17Sql)(spark, dir)
  def q19(spark: SparkSession, dir: String): DataFrame = tpchRun(q19Sql)(spark, dir)
  def q20(spark: SparkSession, dir: String): DataFrame = tpchRun(q20Sql)(spark, dir)
  def q22(spark: SparkSession, dir: String): DataFrame = tpchRun(q22Sql)(spark, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_flagship" -> q00,
    "q02_min_cost_supplier" -> q02,
    "q03_shipping_priority" -> q03,
    "q04_priority_check" -> q04,
    "q05_local_supplier" -> q05,
    "q06_forecast_revenue" -> q06,
    "q07_volume_shipping" -> q07,
    "q08_market_share" -> q08,
    "q09_product_profit" -> q09,
    "q10_returned_items" -> q10,
    "q11_important_stock" -> q11,
    "q12_priority_by_mode" -> q12,
    "q13_order_distribution" -> q13,
    "q15_top_supplier" -> q15,
    "q14_promo_revenue" -> q14,
    "q16_supplier_part_count" -> q16,
    "q17_small_qty_revenue" -> q17,
    "q18_large_volume_customer" -> q18,
    "q19_disjunctive_revenue" -> q19,
    "q20_part_volume_suppliers" -> q20,
    "q21_waiting_suppliers" -> q21,
    "q22_dormant_customers" -> q22)

  private val discRevenue =
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q02_min_cost_supplier" -> q02Sql("", "TIMESTAMP"),
    "q04_priority_check" -> q04Sql("", "TIMESTAMP"),
    "q07_volume_shipping" -> q07Sql("", "TIMESTAMP"),
    "q08_market_share" -> q08Sql("", "TIMESTAMP"),
    "q09_product_profit" -> q09Sql("", "TIMESTAMP"),
    "q10_returned_items" -> q10Sql("", "TIMESTAMP"),
    "q11_important_stock" -> q11Sql("", "TIMESTAMP"),
    "q13_order_distribution" -> q13Sql("", "TIMESTAMP"),
    "q15_top_supplier" -> q15Sql("", "TIMESTAMP"),
    "q12_priority_by_mode" -> q12Sql("", "TIMESTAMP"),
    "q14_promo_revenue" -> q14Sql("", "TIMESTAMP"),
    "q16_supplier_part_count" -> q16Sql("", "TIMESTAMP"),
    "q19_disjunctive_revenue" -> q19Sql("", "TIMESTAMP"),
    "q17_small_qty_revenue" -> q17Sql("", "TIMESTAMP"),
    "q20_part_volume_suppliers" -> q20Sql("", "TIMESTAMP"),
    "q22_dormant_customers" -> q22Sql("", "TIMESTAMP"),
    "q18_large_volume_customer" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
        |         o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_tax > l1.l_discount
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_tax > l3.l_discount)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |       o_orderpriority, $discRevenue AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q05_local_supplier" ->
      s"""SELECT n_name, $discRevenue AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q00_flagship" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
