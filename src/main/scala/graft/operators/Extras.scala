package graft.operators

import graft.{QueryModule, Tables}
import graft.Tables.dec
import graft.functions.{Uuid5, Uuid5Expression, Welford}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UDF/UDAF surface (SURVEY.md §2.2 x01-x02) and scale-pattern operators:
  * partitioned sink with partition pruning (s07) and the salted two-phase
  * aggregation for skewed keys (j13).
  */
object Extras extends QueryModule {

  /** x01: uuid5 as Scala UDF and as native codegen Expression — same
    * values, different execution paths (ScalarsSpec asserts equality;
    * here both are materialized side by side). */
  def x01(spark: SparkSession, dir: String): DataFrame = {
    Uuid5Expression.register(spark)
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        Uuid5.uuid5Udf(lit(Uuid5.NilUuid.toString), col("c_name")).as("id_udf"),
        Uuid5Expression.uuid5Native(lit(Uuid5.NilUuid.toString), col("c_name")).as("id_native"))
      .withColumn("paths_agree", col("id_udf") === col("id_native"))
      .orderBy("c_custkey")
  }

  /** Round 6: Welford accumulates in a different float order than the
    * oracle's avg/var_samp, so agreement holds to ~1e-12 relative — round
    * both sides well inside that (boundary-hit risk is measure-zero for
    * the rational means/variances of this data). */
  def x02(spark: SparkSession, dir: String): DataFrame = {
    Welford.register(spark)
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_x02_lineitem")
    spark.sql(
      """SELECT l_returnflag,
        |       round(welford(l_quantity).mean, 6) AS w_mean,
        |       round(welford(l_quantity).varSamp, 6) AS w_var
        |FROM graft_x02_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** s07: partitioned parquet sink + partition-pruned re-read. At 100 TB
    * the o_year directory layout is what turns a year-filter into reading
    * 1/7th of the data; PlanSpec asserts PartitionFilters is non-empty. */
  def s07Write(spark: SparkSession, dir: String): String = {
    val tmp = Tables.scratchPath("s07_partitioned", dir)
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    tmp
  }

  def s07(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s07Write(spark, dir))
      .filter(col("o_year") === 1997)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_year").cast("int").as("o_year"))
      .orderBy("o_orderkey")

  /** j13: salted two-phase aggregation. events has ~15 user_ids carrying
    * 100k+ rows each at scale — a plain groupBy(user_id) funnels each hot
    * key through one reducer. Phase 1 groups by (user_id, salt) spreading
    * each key over 16 reducers; phase 2 combines the 16 partials. Result
    * is identical to the direct aggregation (the oracle computes it
    * directly). */
  def j13(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
      .groupBy("user_id")
      .agg(sum(col("n")).as("n_events"), sum(col("sv")).cast("double").as("sum_value"))
      .orderBy("user_id")

  /** x03: table-generating surface — built-in posexplode IS the custom
    * UDTF the reference's R7 cascade would otherwise need (SURVEY §2.2
    * documents that no custom Generator is required). */
  def x03(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos1"),
        round(col("v").cast("double"), 6).as("v"))
      .orderBy("vec_id", "pos1")

  /** s17: partition-pruned sink + FILE LINEAGE read-back — the data-lake
    * ingestion audit: write hive-partitioned, then prove from the files
    * alone (the `_metadata.file_path` hidden column) that (a) every
    * partition directory holds exactly ONE file (repartition on the
    * partition key before write — the small-files guard at 100 TB),
    * and (b) every row's directory agrees with its partition value.
    * The oracle states the expected invariant (n_files = 1, all rows
    * path-consistent) against the source table — content survives the
    * partitioned round-trip bit-exactly. */
  def s17Write(spark: SparkSession, dir: String): String = {
    val tmp = Tables.scratchPath("s17_lineage", dir)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .repartition(col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    tmp
  }
  def s17(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s17Write(spark, dir))
      .select(col("event_type"), col("event_id"),
        col("_metadata.file_path").as("fp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("fp")).as("n_files"),
        min("event_id").as("min_event_id"),
        max("event_id").as("max_event_id"),
        sum(when(regexp_extract(col("fp"), "event_type=([^/]+)", 1)
          === col("event_type"), 1L).otherwise(0L)).as("n_path_consistent"))
      .orderBy("event_type")

  override val sinkQueries: Set[String] =
    Set("s07_sink_partitioned", "s17_sink_lineage")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s17_sink_lineage" -> s17,
    "x01_udf_uuid5" -> x01,
    "x03_udtf_generator" -> x03,
    "x02_udaf_welford" -> x02,
    "s07_sink_partitioned" -> s07,
    "j13_join_skew_salted" -> j13)

  val oracles: Map[String, String] = Map(
    "s17_sink_lineage" ->
      """SELECT event_type, COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS n_files,
        |       MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id,
        |       COUNT(*) AS n_path_consistent
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x02_udaf_welford" ->
      """SELECT l_returnflag,
        |       round(avg(l_quantity), 6) AS w_mean,
        |       round(var_samp(l_quantity), 6) AS w_var
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x03_udtf_generator" ->
      """SELECT vec_id, CAST(i AS BIGINT) AS pos1,
        |       round(CAST(embedding[i] AS DOUBLE), 6) AS v
        |FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
        |WHERE vec_id < 50
        |ORDER BY vec_id, pos1""".stripMargin,
    "s07_sink_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year
        |FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        |ORDER BY o_orderkey""".stripMargin,
    "j13_join_skew_salted" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
