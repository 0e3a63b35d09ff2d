package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway triage probe (r16): where does a03's wall go? The job
  * table shows the 3-task partial-HLL pass (~1.1 s) plus TWO sequential
  * single-task ~0.65 s jobs; this A/Bs the aggregate with and without
  * the final orderBy (and with an explicit one-partition final agg) to
  * attribute them. Not part of any query path. */
object ProbeA03 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def agg() = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_parts"))
    def aggOne() = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.005).as("x"))
    def aggWide() = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.05).as("approx_parts"))
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "full(agg+orderBy)" -> (() => agg().orderBy("l_returnflag")),
      "agg_only" -> (() => agg()),
      "agg_ckpt_orderBy" -> (() => agg().localCheckpoint().orderBy("l_returnflag")),
      "agg_c1_sortWithin" -> (() =>
        agg().coalesce(1).sortWithinPartitions("l_returnflag")),
      "agg_rsd005_1col" -> (() => aggOne()),
      "agg_rsd05+orderBy" -> (() => aggWide().orderBy("l_returnflag")))
    for (round <- 1 to 3; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"round $round $n%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
