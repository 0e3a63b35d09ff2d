package graft.operators

import graft.{QueryModule, Tables}
import graft.Tables.dec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Completeness extensions beyond SURVEY §2.2's core list: pivot/unpivot,
  * scalar + correlated subqueries, distribution window functions,
  * ordered string aggregation, generated (range) sources, sampling.
  */
object Pivots extends QueryModule {

  /** a10: pivot — returnflag × linestatus matrix of decimal-summed qty. */
  def a10(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O", "P"))
      .agg(sum(dec(col("l_quantity"))).cast("double"))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o", "P" -> "qty_p"))
      .orderBy("l_returnflag")

  /** a11: unpivot (melt) — the inverse, back to long form. */
  def a11(spark: SparkSession, dir: String): DataFrame =
    a10(spark, dir)
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty_f"), col("qty_o"), col("qty_p")), "status_col", "qty")
      .filter(col("qty").isNotNull)
      .orderBy("l_returnflag", "status_col")

  /** p05: uncorrelated scalar subquery — orders above the global mean. */
  def p05(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_p05_orders")
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM graft_p05_orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
        |                             / COUNT(*) FROM graft_p05_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** p06: correlated scalar subquery — each customer's orders above that
    * customer's own decimal-exact mean (decorrelated by Catalyst into an
    * aggregate + join; no per-row re-execution). */
  def p06(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_p06_orders")
    spark.sql(
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM graft_p06_orders o
        |WHERE o.o_totalprice > (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
        |                               / COUNT(*)
        |                        FROM graft_p06_orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  /** w06: distribution window functions. */
  def w06(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 8).as("pct_rank"),
        round(cume_dist().over(w), 8).as("cume"),
        nth_value(col("o_orderkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** a12: ordered string aggregation (listagg). */
  def a12(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .groupBy("o_orderpriority")
      .agg(concat_ws(",", array_sort(collect_list(col("o_orderkey").cast("string"))))
        .as("keys_csv"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** a13: re-aggregatable distinct-count sketches (DataSketches HLL).
    * Per-nation customer sketches are built in one pass, then MERGED
    * upward to region level with hll_union_agg — no second scan of the
    * base table. This is the 100 TB rollup pattern: a sketch column in a
    * daily/nation-level summary table re-aggregates to any coarser
    * grouping (week, region, global) at summary-table cost, which exact
    * countDistinct fundamentally cannot (distinct does not compose).
    * Engine-specific binary sketches ⇒ no oracle; AggregateSpec bounds
    * the estimates against exact counts. */
  def a13(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey", "n_name")
      .agg(expr("hll_sketch_agg(c_custkey)").as("sk"))
    perNation
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_customers"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_nations"), col("est_customers"))
      .orderBy("r_name")
  }

  /** s08: generated source — spark.range is the scan; no files involved. */
  def s08(spark: SparkSession, dir: String): DataFrame =
    spark.range(1, 1001)
      .select(col("id"),
        (col("id") * col("id")).as("sq"),
        pmod(col("id"), lit(7L)).as("m7"))
      .orderBy("id")

  /** o04: deterministic-seed Bernoulli sample — engine-specific RNG, so
    * no oracle; the smoke suite pins determinism (same seed ⇒ same rows). */
  def o04(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** p10: correlated LATERAL subquery — the per-outer-row derived table
    * (top-2 orders per customer spelled as the SQL-standard LATERAL,
    * the form BI generators emit). Catalyst decorrelates the correlated
    * ORDER BY … LIMIT into a partitioned window rank under the hood, so
    * the physical plan is o03's one-shuffle top-k, not a per-row
    * re-execution — the point of registering it: the declarative text
    * scales because the optimizer rewrites it. Customers with no orders
    * drop out (inner lateral), same in both engines. */
  def p10(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_p10_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_p10_orders")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM graft_p10_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM graft_p10_orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p10_lateral" -> p10,
    "a10_pivot" -> a10,
    "a11_unpivot" -> a11,
    "p05_scalar_subquery" -> p05,
    "p06_correlated_subquery" -> p06,
    "w06_win_distribution" -> w06,
    "a12_string_agg" -> a12,
    "a13_agg_sketch_merge" -> a13,
    "s08_generator" -> s08,
    "o04_sample" -> o04)

  val oracles: Map[String, String] = Map(
    "p10_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "a10_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_o,
        |  CAST(SUM(CASE WHEN l_linestatus='P' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_p
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a11_unpivot" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_f,
        |    CAST(SUM(CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_o,
        |    CAST(SUM(CASE WHEN l_linestatus='P' THEN CAST(l_quantity AS DECIMAL(38,4)) END) AS DOUBLE) AS qty_p
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, status_col, qty FROM (
        |  SELECT l_returnflag, 'qty_f' AS status_col, qty_f AS qty FROM p
        |  UNION ALL SELECT l_returnflag, 'qty_o', qty_o FROM p
        |  UNION ALL SELECT l_returnflag, 'qty_p', qty_p FROM p) u
        |WHERE qty IS NOT NULL ORDER BY l_returnflag, status_col""".stripMargin,
    "p05_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
        |                             / COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "p06_correlated_subquery" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
        |WHERE o.o_totalprice > (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
        |                               / COUNT(*)
        |                        FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    "w06_win_distribution" ->
      """SELECT o_custkey, o_orderkey,
        |       round(percent_rank() OVER w, 8) AS pct_rank,
        |       round(cume_dist() OVER w, 8) AS cume,
        |       nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |         AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "a12_string_agg" ->
      """SELECT o_orderpriority,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR)) AS keys_csv,
        |       COUNT(*) AS n
        |FROM orders WHERE o_totalprice > 400000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "s08_generator" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(range * range AS BIGINT) AS sq,
        |       CAST(((range % 7) + 7) % 7 AS BIGINT) AS m7
        |FROM range(1, 1001) ORDER BY id""".stripMargin)
}
