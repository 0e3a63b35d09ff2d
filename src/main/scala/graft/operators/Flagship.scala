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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_flagship" -> q00,
    "q03_shipping_priority" -> q03,
    "q05_local_supplier" -> q05,
    "q06_forecast_revenue" -> q06)

  private val discRevenue =
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
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
