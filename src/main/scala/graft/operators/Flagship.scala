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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_flagship" -> q00,
    "q03_shipping_priority" -> q03,
    "q05_local_supplier" -> q05,
    "q06_forecast_revenue" -> q06,
    "q18_large_volume_customer" -> q18,
    "q21_waiting_suppliers" -> q21)

  private val discRevenue =
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
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
